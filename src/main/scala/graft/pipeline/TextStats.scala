package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: per-document
  * statistics, quality scoring, token counting, stopword-marker language
  * identification, and rolling-hash fingerprinting.
  *
  * Everything is built from codegen'd builtin expressions (regexp /
  * array lambdas) — one narrow projection per doc, no shuffle at all, so
  * the operators stream at parquet-scan speed at any scale and each has
  * an exact DuckDB twin.
  */
object TextStats {

  /** Marker stopwords per language (distinctive function words; the CJK
    * script check handles zh). Deterministic priority en>fr>de>es on
    * ties. */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "dans"),
    "de" -> Seq("der", "die", "und", "das", "mit", "ist"),
    "es" -> Seq("el", "los", "que", "para", "con", "una")
  )

  private def toks(textCol: String): Column =
    expr(s"regexp_extract_all(lower(`$textCol`), '[a-z0-9]+', 0)")

  /** Per-doc statistics: lengths, word counts, character-class ratios,
    * average word length. All ratios double, rounded for oracle
    * stability. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_toks", toks(textCol))
      .select(
        col(idCol).as("doc_id"),
        length(col(textCol)).as("n_chars"),
        size(col("_toks")).as("n_words"),
        length(regexp_replace(col(textCol), "[^0-9]", "")).as("n_digits"),
        length(regexp_replace(col(textCol), "[A-Za-z0-9\\s]", "")).as("n_punct"),
        round(
          expr("aggregate(_toks, 0L, (acc, t) -> acc + length(t))").cast("double") /
            greatest(size(col("_toks")), lit(1)).cast("double"), 4)
          .as("avg_word_len")
      )

  /** Quality score in [0,1]: length saturation × (1 − punctuation ratio)
    * × stopword-coverage bonus. A heuristic filter column, replicated
    * exactly by the oracle. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = Markers("en").map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("_toks", toks(textCol))
      .select(
        col(idCol).as("doc_id"),
        round(
          least(size(col("_toks")).cast("double") / 50.0, lit(1.0)) *
            (lit(1.0) - least(
              length(regexp_replace(col(textCol), "[A-Za-z0-9\\s]", "")).cast("double") /
                greatest(length(col(textCol)), lit(1)).cast("double"),
              lit(1.0))) *
            (lit(0.5) + lit(0.5) * least(
              expr(s"size(filter(_toks, t -> array_contains(array($en), t)))")
                .cast("double") * 10.0 /
                greatest(size(col("_toks")), lit(1)).cast("double"),
              lit(1.0))),
          4).as("quality")
      )
  }

  /** Token counting: whitespace-separated words plus a BPE-ish count
    * (letter runs, single digits, single punctuation marks — the shape of
    * byte-pair pretokenizers). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      expr(s"size(regexp_extract_all(`$textCol`, '[^\\\\s]+', 0))").as("n_ws_tokens"),
      expr(s"size(regexp_extract_all(`$textCol`, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]', 0))")
        .as("n_bpe_tokens")
    )

  /** Language identification: CJK script presence → zh, else the marker
    * list with the most hits (en>fr>de>es priority), else 'und'. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def hits(lang: String): Column = {
      val lst = Markers(lang).map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(_toks, t -> array_contains(array($lst), t)))")
    }
    docs
      .withColumn("_toks", toks(textCol))
      .withColumn("_cjk",
        length(regexp_replace(col(textCol), "[^\\x{4e00}-\\x{9fff}]", "")))
      .withColumn("_en", hits("en")).withColumn("_fr", hits("fr"))
      .withColumn("_de", hits("de")).withColumn("_es", hits("es"))
      .select(
        col(idCol).as("doc_id"),
        when(col("_cjk") > 0, "zh")
          .when(col("_en") >= col("_fr") && col("_en") >= col("_de")
            && col("_en") >= col("_es") && col("_en") > 0, "en")
          .when(col("_fr") >= col("_de") && col("_fr") >= col("_es")
            && col("_fr") > 0, "fr")
          .when(col("_de") >= col("_es") && col("_de") > 0, "de")
          .when(col("_es") > 0, "es")
          .otherwise("und").as("lang_pred")
      )
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1: repeated
    * words and top n-gram mass flag low-quality/boilerplate docs):
    * duplicate-word fraction, and the fraction of all 1/2/3-gram
    * occurrences taken by the single most frequent gram.
    *
    * Scale shape: the three gram streams union into ONE
    * (doc_id, n, gram) groupBy — repeated grams collapse map-side
    * before the only shuffle, and the per-doc rollup rides the same
    * doc_id partitioning; no self-joins, no windows over the corpus. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = docs.select(col(idCol).as("doc_id"), toks(textCol).as("ws"))
    // grams are shuffled as 8-byte xxhash64 of the word tuple, never as
    // materialized strings — the output is COUNTS, so representation is
    // free, and the hash cuts shuffle bytes ~3x at corpus scale (a
    // cross-n-gram hash collision would merge two counts; at 2^64 that
    // needs ~10^9 distinct grams per doc to matter)
    // zip-of-slices explode with the hash POST-explode (codegen'd) —
    // a transform() lambda would run xxhash64 interpreted (NGrams.scala)
    def grams(n: Int): DataFrame =
      if (n == 1)
        w.select(col("doc_id"), lit(1).as("n"), explode(col("ws")).as("t"))
          .select(col("doc_id"), col("n"), xxhash64(col("t")).as("gram"))
      else
        w.select(col("doc_id"), lit(n).as("n"),
            explode(graft.pipeline.NGrams.zipExpr("ws", n)).as("pr"))
          .select(col("doc_id"), col("n"),
            xxhash64(graft.pipeline.NGrams.fields("pr", n): _*).as("gram"))
    val g = (1 to 3).map(grams).reduce(_ unionAll _)
    val agg = g.groupBy("doc_id", "n", "gram").count()
      .groupBy("doc_id", "n")
      .agg(max("count").as("maxc"), sum("count").as("tot"),
        count(lit(1)).as("ndist"))
    def pick(n: Int, c: String): Column = max(when(col("n") === n, col(c)))
    val piv = agg.groupBy("doc_id").agg(
      pick(1, "maxc").as("maxc1"), pick(1, "tot").as("tot1"), pick(1, "ndist").as("ndist1"),
      pick(2, "maxc").as("maxc2"), pick(2, "tot").as("tot2"),
      pick(3, "maxc").as("maxc3"), pick(3, "tot").as("tot3"))
    docs.select(col(idCol).as("doc_id")).join(piv, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(coalesce(lit(1.0) - col("ndist1") / col("tot1"), lit(0.0)), 4)
          .as("dup_word_frac"),
        round(coalesce(col("maxc1") / col("tot1"), lit(0.0)), 4).as("top_word_frac"),
        round(coalesce(col("maxc2") / col("tot2"), lit(0.0)), 4).as("top_bigram_frac"),
        round(coalesce(col("maxc3") / col("tot3"), lit(0.0)), 4).as("top_trigram_frac"))
  }

  /** The Gopher quality-rule battery (Rae et al. 2021 §A1.1) as
    * per-document metrics plus one boolean per rule and the composite
    * verdict — the standard pretraining-corpus admission filter:
    *
    *  - word count in [50, 100,000]
    *  - mean word length in [3, 10]
    *  - ≥ 80% of words contain at least one alphabetic character
    *  - symbol-to-word ratio (`#` and `...`/`…`) ≤ 0.1
    *  - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
    *  - at least 2 of the 8 Gopher stop words present
    *
    * Pure per-row projection of builtin expressions — zero shuffle,
    * whole-stage codegen, scan reads (id, text) only. Thresholds
    * compare the UNROUNDED doubles; rounding is display-only. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopArr = stops.map(s => s"'$s'").mkString(", ")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      .withColumn("_w", expr(
        "CASE WHEN length(trim(_t)) = 0 THEN CAST(array() AS array<string>) " +
          "ELSE split(trim(_t), '\\\\s+') END"))
      .withColumn("_lines", split(col("_t"), "\n"))
      .withColumn("n_words", size(col("_w")).cast("long"))
      .withColumn("_nw", greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("mean_word_len",
        expr("aggregate(_w, 0L, (a, x) -> a + length(x))").cast("double") / col("_nw"))
      .withColumn("alpha_frac",
        expr("size(filter(_w, x -> x rlike '[A-Za-z]'))").cast("double") / col("_nw"))
      .withColumn("symbol_ratio",
        ((length(col("_t")) - length(expr("replace(_t, '#', '')"))).cast("double") +
          (length(col("_t")) - length(expr("replace(_t, '...', '')"))).cast("double") / 3.0 +
          (length(col("_t")) - length(expr("replace(_t, '…', '')"))).cast("double")) /
          col("_nw"))
      .withColumn("bullet_frac",
        expr("size(filter(_lines, x -> x rlike '^\\\\s*[-*•]'))").cast("double") /
          greatest(size(col("_lines")), lit(1)).cast("double"))
      .withColumn("ellipsis_frac",
        expr("size(filter(_lines, x -> x rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$'))")
          .cast("double") /
          greatest(size(col("_lines")), lit(1)).cast("double"))
      .withColumn("stop_hits", expr(
        s"size(filter(array($stopArr), s -> array_contains(transform(_w, x -> lower(x)), s)))")
        .cast("long"))
      .withColumn("r_word_count", col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("r_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("r_bullet", col("bullet_frac") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("r_stop", col("stop_hits") >= 2L)
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha") &&
          col("r_symbol") && col("r_bullet") && col("r_ellipsis") && col("r_stop"))
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 4).as("mean_word_len"),
        round(col("alpha_frac"), 4).as("alpha_frac"),
        round(col("symbol_ratio"), 4).as("symbol_ratio"),
        round(col("bullet_frac"), 4).as("bullet_frac"),
        round(col("ellipsis_frac"), 4).as("ellipsis_frac"),
        col("stop_hits"), col("r_word_count"), col("r_mean_word_len"),
        col("r_alpha"), col("r_symbol"), col("r_bullet"), col("r_ellipsis"),
        col("r_stop"), col("pass"))
  }

  /** CCNet-style corpus-LM perplexity bucketing (Wenzek et al. 2019,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" §4.3): train a unigram language model on the corpus itself
    * (Laplace-smoothed), score each document by its mean per-token
    * negative log-likelihood under that LM, and split the corpus into
    * head / middle / tail buckets at the q25 / q75 score quantiles
    * (head = lowest perplexity = most fluent under the corpus LM).
    * CCNet uses a pretrained KenLM; the corpus-trained unigram LM keeps
    * the same plumbing and bucketing contract with no external model.
    *
    * Determinism: per-token log-probs are quantized to integer
    * micro-nats (round(ln(count+1)*1e6) AS BIGINT) BEFORE the per-doc
    * sum, so aggregation is exact integer arithmetic — order-independent
    * and byte-replayable by the DuckDB twin; doubles appear only in the
    * final displayed division. Quantile probabilities 0.25/0.75 are
    * exact binary fractions, so the interpolated quantile over the
    * 4-dp-rounded scores is bit-identical across engines.
    *
    * Scale shape (100 TB): the (doc,token) rollup and the token-count
    * groupBy both combine map-side; the LM join is 1-row-per-token on
    * the build side (hot stopword keys are AQE skew-splittable, never
    * quadratic); LM totals and the two bucket thresholds are single-row
    * aggregates (a bounded 2-double driver collect). No self-joins, no
    * global sort, no windows. At extreme scale swap the exact
    * `percentile` for `approx_percentile` — the contract is unchanged.
    *
    * `persistScores = true` caches the narrow per-doc score table so the
    * threshold aggregate and the output join are guaranteed one token
    * pass (column pruning can differentiate the two subtrees enough to
    * defeat ReuseExchange — measured 43% at ×1000); the default keeps
    * the operator fully lazy with no cache lifetime for the caller to
    * manage. `persistScores = true` pins one cache entry for the session
    * lifetime — in long-lived sessions / streaming foreachBatch, use
    * [[perplexityBucketsScored]] and unpersist the handle after the
    * output action instead. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      persistScores: Boolean = false): DataFrame =
    perplexityBucketsScored(docs, idCol, textCol, persistScores)._1

  /** [[perplexityBuckets]] plus the persisted score-table handle: when
    * `persistScores`, the second element is the cached per-doc score
    * DataFrame — call `.unpersist()` on it after the output action to
    * release the cache entry (it is `None` otherwise). */
  def perplexityBucketsScored(docs: DataFrame, idCol: String, textCol: String,
      persistScores: Boolean = false): (DataFrame, Option[DataFrame]) = {
    val dt = docs
      .select(col(idCol).as("doc_id"), explode(toks(textCol)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
    val counts = dt.groupBy("tok").agg(sum("m").as("c"))
    val tot = counts.agg(sum("c").as("n_total"), count(lit(1)).as("v"))
    val scored = dt
      .join(counts, "tok")
      .withColumn("_l", expr("CAST(round(ln(c + 1) * 1000000) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_tokens"), sum(col("m") * col("_l")).as("_s"))
      .crossJoin(broadcast(tot))
      .withColumn("_lv", expr("CAST(round(ln(n_total + v) * 1000000) AS BIGINT)"))
      .withColumn("nll", round(
        (col("n_tokens") * col("_lv") - col("_s")).cast("double") /
          lit(1e6) / col("n_tokens").cast("double"), 4))
      .select("doc_id", "n_tokens", "nll")
    val scoredMaybeCached =
      if (persistScores)
        scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else scored
    // thresholds as an in-plan single-row broadcast, NOT a driver
    // collect: the whole operator stays one lazy action, and the scored
    // subtree's doc-rollup exchange is computed once and reused by both
    // the quantile aggregate and the output join (ReuseExchange) — no
    // persist lifetime to manage, nothing driver-side at any scale
    val thresholds = scoredMaybeCached.agg(
      percentile(col("nll"), lit(0.25)).as("_q25"),
      percentile(col("nll"), lit(0.75)).as("_q75"))
    val out = docs.select(col(idCol).as("doc_id"))
      .join(scoredMaybeCached, Seq("doc_id"), "left")
      .crossJoin(broadcast(thresholds))
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"),
        when(col("nll").isNull, lit("tail"))
          .when(col("nll") <= col("_q25"), lit("head"))
          .when(col("nll") > col("_q75"), lit("tail"))
          .otherwise(lit("middle")).as("ppl_bucket"))
    (out, if (persistScores) Some(scoredMaybeCached) else None)
  }

  /** C4-style blocklist page filter (Raffel et al. 2020 §2.2: "removed
    * any page that contained any word on the 'List of Dirty, Naughty,
    * Obscene...'"). Generic over the caller's wordlist — matching is
    * whole-token against the corpus tokenizer (no substring hits:
    * "grass" never matches "ass"), case-insensitive by construction.
    * Returns (doc_id, n_blocked, blocked_terms, pass); `blocked_terms`
    * is the sorted distinct matched subset for auditability.
    *
    * Pure zero-shuffle projection: the wordlist compiles into the
    * expression (sensible to ~thousands of terms; beyond that, switch
    * to a broadcast semi-join on the exploded token stream). */
  def blocklistFilter(
      docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    // column functions, not interpolated SQL text: terms with quotes or
    // backslashes need no escaping convention at all this way
    val terms = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    docs
      .withColumn("_toks", toks(textCol))
      .withColumn("_hits", array_sort(array_intersect(terms, col("_toks"))))
      .select(
        col(idCol).as("doc_id"),
        size(col("_hits")).cast("long").as("n_blocked"),
        array_join(col("_hits"), ",").as("blocked_terms"),
        (size(col("_hits")) === 0).as("pass"))
  }

  /** Train a reusable Laplace unigram LM on a corpus: one row per
    * vocabulary token with its quantized log-count `l` =
    * round(ln(count+1)*1e6) plus the constant normalizer `lv` =
    * round(ln(N+V)*1e6) on every row (per-token nll = (lv − l)/1e6).
    * This is the train-once half of the CCNet deployment shape: fit the
    * LM on a reference corpus, then [[perplexityScoreWithLm]] scores any
    * number of batches — or a stream — against it. */
  def unigramLm(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = corpus
      .select(explode(toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    counts
      .crossJoin(broadcast(counts.agg(sum("c").as("n_total"), count(lit(1)).as("v"))))
      .select(
        col("tok"),
        expr("CAST(round(ln(c + 1) * 1000000) AS BIGINT)").as("l"),
        expr("CAST(round(ln(n_total + v) * 1000000) AS BIGINT)").as("lv"))
  }

  /** Score documents against a pretrained [[unigramLm]]: mean per-token
    * negative log-likelihood, same integer micro-nat arithmetic as
    * [[perplexityBuckets]] (on the training corpus itself the two agree
    * row-for-row — spec-asserted). Out-of-vocabulary tokens score the
    * Laplace floor ln(0+1) = 0 micro-nats. Stateless apart from the
    * stream-static LM join, so it composes with Structured Streaming
    * (foreachBatch or update-mode per-doc aggregation) — the fit LM is
    * the static side. */
  def perplexityScoreWithLm(
      docs: DataFrame, idCol: String, textCol: String, lm: DataFrame): DataFrame = {
    val scored = docs
      .select(col(idCol).as("doc_id"), explode(toks(textCol)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
      .join(lm, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(sum("m").as("n_tokens"),
        sum(col("m") * coalesce(col("l"), lit(0L))).as("_s"),
        max(col("lv")).as("_lv"))
      .crossJoin(broadcast(lm.agg(max("lv").as("_lvAll"))))
      .withColumn("nll", round(
        (col("n_tokens") * coalesce(col("_lv"), col("_lvAll")) - col("_s")).cast("double") /
          lit(1e6) / col("n_tokens").cast("double"), 4))
      .select("doc_id", "n_tokens", "nll")
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("nll"))
  }

  /** Rolling polynomial fingerprint over the word sequence:
    * fold(h_1, (acc, h_i) -> (acc*31 + h_i) mod 1e9+7) where h_i is the
    * 60-bit term hash reduced mod 1e9+7. Matches DuckDB's `list_reduce`
    * no-initial-value fold exactly. Word-order sensitive (unlike the
    * bag-of-words MinHash), so it fingerprints near-identical prose. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_hs",
        expr(s"transform(regexp_extract_all(lower(`$textCol`), '[a-z0-9]+', 0), " +
          "t -> cast(conv(substr(md5(concat(t, '#0')), 1, 15), 16, 10) AS bigint) % 1000000007)"))
      .select(
        col(idCol).as("doc_id"),
        when(size(col("_hs")) === 0, lit(null).cast("long"))
          .otherwise(expr(
            "aggregate(slice(_hs, 2, greatest(size(_hs) - 1, 0)), element_at(_hs, 1), " +
              "(acc, x) -> (acc * 31 + x) % 1000000007)"))
          .as("fingerprint")
      )

  /** Collocation mining via pointwise mutual information — the
    * "discover multi-word units before building the vocab/tokenizer"
    * step: adjacent word pairs ranked by
    * `PMI = ln(p(ab) / (p(a)·p(b)))` with unigram/bigram probabilities
    * from the corpus itself; high-PMI pairs ("new york") co-occur far
    * above chance. `minCount` drops unstable rare bigrams (classic PMI
    * degeneracy: a hapax pair maxes the score).
    *
    * Shape: one bigram rollup ([[NGrams.zipExpr]] — no interpreted
    * lambda), one unigram rollup joined to both bigram slots, and one
    * cheap codegen'd scan for the two totals (driver scalars). PMI is
    * quantized to integer micro-nats (the ln-parity recipe); the top-k
    * cut is `orderBy(...).limit(k)` — a distributed TakeOrdered, never
    * a single-partition sort. Output
    * `(w1, w2, n_ab, n_a, n_b, pmi_micro)`. */
  def collocations(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"bad params $minCount/$topK")
    val base = docs.select(toks(textCol).as("_t"))
    val r = base.agg(
      coalesce(sum(size(col("_t"))), lit(0L)),
      coalesce(sum(greatest(size(col("_t")) - 1, lit(0))), lit(0L))).collect()(0)
    // coalesce: an empty corpus must flow through as an empty result,
    // not an unboxing NPE on the null sums
    val (tTot, bTot) = (r.getLong(0), r.getLong(1))
    val uni = base.select(explode(col("_t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val bi = base.select(explode(NGrams.zipExpr("_t", 2)).as("pr"))
      .select(NGrams.fields("pr", 2).head.as("w1"),
        NGrams.fields("pr", 2)(1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bi
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), "w2")
      .withColumn("pmi_micro", expr(
        s"CAST(round(ln((CAST(n_ab AS DOUBLE) / $bTot) / " +
          s"((CAST(n_a AS DOUBLE) / $tTot) * (CAST(n_b AS DOUBLE) / $tTot))) " +
          "* 1000000) AS BIGINT)"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
      .select("w1", "w2", "n_ab", "n_a", "n_b", "pmi_micro")
  }

  /** Vocabulary construction with contiguous ids — the "build the
    * tokenizer/embedding table" step: document frequency per term,
    * pruned to `df ∈ [minDf, maxDfRatio·nDocs]` (drop hapaxes and
    * stop-like terms), then a CONTIGUOUS 1-based `vocab_id` assigned by
    * (df desc, term asc) via [[graft.operators.GlobalRank]] — the
    * distributed total-order rank, so a 100M-term vocabulary numbers
    * itself without the single-partition `row_number()` window that
    * serializes everything through one task.
    *
    * Output: `(term, df, vocab_id)`. One posting aggregation (map-side
    * combined), one bounded df rollup, one range-partitioned rank. */
  def vocabulary(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, maxDfRatio: Double = 0.5): DataFrame = {
    require(minDf >= 1 && maxDfRatio > 0 && maxDfRatio <= 1.0,
      s"minDf >= 1 and maxDfRatio in (0,1], got $minDf/$maxDfRatio")
    val nDocs = docs.count()
    val dfTbl = graft.fts.Fts.buildPostings(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= lit(maxDfRatio) * nDocs)
    graft.operators.GlobalRank
      .withGlobalRank(dfTbl, Seq(col("df").desc, col("term")), "vocab_id")
  }

  /** Corpus-drift monitor: smoothed Kullback–Leibler divergence (both
    * directions) between the token distributions of two slices of
    * `groupCol` — "did this week's crawl shift vs last week's", "does
    * source A look like source B". Add-one smoothing over the UNION
    * vocabulary, so unseen-in-one-side terms contribute finitely.
    *
    * Determinism: each term's contribution
    * `p·ln(p/q)` is quantized to integer PICO-nats before the sum
    * (double addition is order-dependent; integer addition is not — the
    * micro-nat recipe, 6 more digits since contributions are
    * O(1/vocab)), and the smoothed totals enter as exact integer-derived
    * doubles — the SQL oracle replays the result bit-for-bit.
    *
    * Scale shape: one (term)-keyed count aggregation with map-side
    * combine, a 3-scalar driver collect for the totals, then a bounded
    * vocab-sized projection+sum. The token stream is aggregated twice
    * (totals pass + contribution pass) — persist the upstream corpus
    * slice if it is itself expensive to produce.
    * Output: one row `(n_terms, kl_ab_pico, kl_ba_pico)`. */
  def klDrift(
      docs: DataFrame, groupCol: String, textCol: String,
      a: String, b: String): DataFrame = {
    val cnts = docs.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("_g"),
        explode(toks(textCol)).as("term"))
      .groupBy("term").agg(
        sum(when(col("_g") === a, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("_g") === b, 1L).otherwise(0L)).as("cnt_b"))
    val r = cnts.agg(coalesce(sum("cnt_a"), lit(0L)),
      coalesce(sum("cnt_b"), lit(0L)), count(lit(1))).collect()(0)
    // coalesce: empty vocabularies flow through as empty drift output
    val tA = (r.getLong(0) + r.getLong(2)).toDouble
    val tB = (r.getLong(1) + r.getLong(2)).toDouble
    val pA = (col("cnt_a") + lit(1.0)) / lit(tA)
    val pB = (col("cnt_b") + lit(1.0)) / lit(tB)
    cnts.select(
      round(pA * log(pA / pB) * lit(1e12)).cast("long").as("_ab"),
      round(pB * log(pB / pA) * lit(1e12)).cast("long").as("_ba"))
      .agg(count(lit(1)).as("n_terms"),
        sum("_ab").as("kl_ab_pico"), sum("_ba").as("kl_ba_pico"))
  }

  /** Per-document character entropy — the encoding-noise / gibberish
    * detector (binary-pasted-as-text and base64 blobs sit near the
    * ~log(64) ceiling; natural language around 2.6–3.1 nats; repeated
    * padding near 0): Shannon entropy over the character distribution
    * of the first `maxChars` characters, each term quantized to
    * integer micro-nats before the per-doc sum (order-invariant, the
    * micro-nat recipe). The prefix cap bounds the explode at corpus
    * scale and is standard practice — noise classifiers don't need
    * the tail. Output: `(idCol, n_chars_used, entropy_micro)`.
    *
    * Scale shape: one explode bounded at `maxChars` per doc + two
    * map-side-combined aggregations keyed on the doc id (no corpus-
    * wide state at all). */
  def charEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      maxChars: Int = 512): DataFrame = {
    require(maxChars >= 16 && maxChars <= 65536,
      s"maxChars in [16, 65536], got $maxChars")
    val chars = docs.select(col(idCol),
      explode(expr(s"split(substr(lower(`$textCol`), 1, $maxChars), '')"))
        .as("_ch"))
      .filter(length(col("_ch")) === 1)
    val counts = chars.groupBy(col(idCol), col("_ch"))
      .agg(count(lit(1)).as("_c"))
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("_n", sum("_c").over(Window.partitionBy(idCol)))
      .groupBy(idCol).agg(
        first(col("_n")).as("n_chars_used"),
        sum(expr(
          """CAST(round(CAST(_c AS DOUBLE) / _n *
            |  ln(CAST(_n AS DOUBLE) / _c) * 1000000) AS BIGINT)"""
            .stripMargin)).as("entropy_micro"))
  }

  /** Zipf slope per corpus slice — the rank-frequency power-law fit
    * (Zipf 1949): regress `ln(freq)` on `ln(rank)` over each slice's
    * `topK` most frequent terms. Natural language sits near slope −1;
    * drift toward 0 flags boilerplate/template floods, steeper than
    * −1.5 flags vocabulary collapse — a one-number corpus-health
    * metric per source.
    *
    * Determinism: ln(rank)/ln(freq) quantize to integer micro-nats
    * per term (the established ln-parity recipe), then the OLS runs
    * on exact int64 sums via [[graft.operators.Stats.groupedTrend]].
    *
    * Scale shape: one token aggregation (map-side combine) + a
    * per-slice top-`topK` window + a 5-long-per-slice trend rollup.
    * The window sorts each slice's vocabulary on one task — fine for
    * vocabulary-sized inputs (≤ millions); a single slice with a
    * billion-term vocabulary would use the GlobalRank two-stage rank
    * instead (documented, not needed at any realistic vocabulary).
    * Output: `(srcCol, n, slope_micro, intercept_micro)` — slope in
    * micro units (−1.0 → −1000000). */
  def zipfSlope(
      docs: DataFrame, srcCol: String, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 10, s"topK >= 10, got $topK")
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(srcCol).as("_src"), explode(toks(textCol)).as("term"))
      .groupBy("_src", "term").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("_src").orderBy(col("n").desc, col("term"))
    val ranked = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("_src"),
        expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)").as("y"))
    graft.operators.Stats.groupedTrend(ranked, Seq("_src"), "x", "y")
      .withColumnRenamed("_src", srcCol)
  }
}
