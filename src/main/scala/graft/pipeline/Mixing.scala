package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-mixing operators for LLM training-data pipelines (greenfield,
  * SURVEY §2.9): deterministic stratified sampling, sequence packing
  * into context-window bins, and benchmark-contamination detection.
  * Design rules match `Dedup`: every decision is a pure
  * builtin-function expression over a deterministic hash (DuckDB can
  * replay the exact bytes), and nothing ever shuffles more than the
  * aggregated decision keys.
  */
object Mixing {

  /** Deterministic per-stratum sampling: keep a row iff
    * `hash60(id, seed) mod 1e6 < rate(stratum) * 1e6`. One scan, zero
    * shuffle, reproducible across engines and runs — the hash-threshold
    * idiom the index build uses for k-means doc sampling, applied to
    * dataset mixing ("keep 10% of lang=en, 100% of lang=fr").
    * `rates`: stratum value → keep fraction in [0,1]; strata absent
    * from the map use `defaultRate`. */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val rateCol: Column = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(
      pmod(Dedup.hash60(col(idCol).cast("string"), lit(seed)), lit(1000000L))
        < (rateCol * 1000000.0).cast("long"))
  }

  /** Fixed-SIZE deterministic per-stratum sample: exactly
    * `min(k, |stratum|)` rows per stratum — the "give me 10k eval docs
    * per language" shape [[stratifiedSample]]'s rate threshold cannot
    * express (a rate yields a binomial count, not an exact one). Rows
    * win by md5-hash order (uniform-without-replacement; id tie-break),
    * so the sample is reproducible across engines, runs, and partition
    * layouts, and ADDING rows to a stratum only ever swaps members in/
    * out by hash rank — no reshuffle of the random source.
    *
    * Scale shape: one shuffle on the stratum key + a per-stratum sort
    * (the standard window top-k). A pathologically hot stratum
    * serializes its own sort — for few-strata corpora pre-split the
    * stratum by a hash salt, take k per salt, and re-rank the k×salts
    * survivors (bounded second pass). Returns the sampled rows +
    * `sample_rank` (1..k by hash order). */
  def fixedSizeSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      k: Int,
      salt: String = "#fs"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(expr(s"md5(concat(`$idCol`, '$salt'))"), col(idCol))
    docs.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** [[fixedSizeSample]] with the hot-stratum guard IMPLEMENTED (not
    * just documented): stage 1 splits each stratum into `salts`
    * deterministic sub-strata (hash of the id) and takes the top-k of
    * each in parallel; stage 2 re-ranks the ≤ k·salts survivors per
    * stratum — a bounded second window — and keeps the global top-k.
    * The comparator is IDENTICAL to the unsalted operator (md5-hash
    * order, id tie-break), so the output is row-for-row identical
    * (spec-asserted); the difference is purely physical: a stratum
    * with billions of rows sorts as `salts` parallel top-k's instead
    * of one serialized sort. Use when strata are few and huge. */
  def fixedSizeSampleSalted(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      k: Int,
      salts: Int = 16,
      salt: String = "#fs"): DataFrame = {
    require(k >= 1 && salts >= 2, s"k >= 1 and salts >= 2, got $k/$salts")
    import org.apache.spark.sql.expressions.Window
    val rankKey = expr(s"md5(concat(`$idCol`, '$salt'))")
    val sub = docs.withColumn("_sub",
      pmod(xxhash64(col(idCol).cast("string")), lit(salts)))
    val w1 = Window.partitionBy(col(stratumCol), col("_sub"))
      .orderBy(rankKey, col(idCol))
    val survivors = sub
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= k)
      .drop("_sub", "_r1")
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(rankKey, col(idCol))
    survivors.withColumn("sample_rank", row_number().over(w2).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006
    * order sampling, the A-ES scheme): per stratum, keep the k rows
    * with the largest priority `ln(u) / w`, where
    * `u = (hash60(id·salt) + 1) / 2^60 ∈ (0, 1]` is the row's
    * deterministic uniform draw and `w > 0` its weight (`weightCol`,
    * e.g. a quality score or document length) — inclusion probability
    * proportional to weight, reproducible across engines, runs, and
    * partitionings ("sample 1k docs per language, quality-weighted").
    *
    * Priorities are quantized to integer micro-nats (the ln-parity
    * recipe the BM25/DSIR oracles established) with the id as the
    * final tie-break, so sample MEMBERSHIP is replayable by the SQL
    * oracle, not just approximately similar. Negative weights are a
    * caller error (ln(u) ≤ 0 flips the order); weight 0 divides to
    * -Infinity and correctly never samples.
    *
    * Scale shape: one window top-k per stratum — same single-shuffle
    * cost and hot-stratum caveat (and salting recipe) as
    * [[fixedSizeSample]]. Adds `priority_micro` and `sample_rank`. */
  def weightedSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      weightCol: String,
      k: Int,
      salt: String = "#ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val prio = expr(
      s"""CAST(round(ln((CAST(conv(substr(md5(concat(`$idCol`, '$salt')), 1, 15), 16, 10) AS BIGINT) + 1.0)
         |  / 1152921504606846976.0) / CAST(`$weightCol` AS DOUBLE) * 1000000) AS BIGINT)"""
        .stripMargin)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("priority_micro").desc, col(idCol))
    docs.withColumn("priority_micro", prio)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Token-budgeted source mixing: sample each stratum down to its
    * share of a total token budget. Stratum `s` with mixture weight
    * `w_s` gets a target of `w_s / Σw × totalTokens` tokens; its keep
    * rate is `min(1, target_s / actual_tokens_s)` and rows are kept by
    * the same deterministic hash threshold [[stratifiedSample]] uses
    * (compared as DOUBLES — no double→long cast, whose
    * round-vs-truncate semantics differ between engines).
    *
    * This is the "rebalance the corpus to the paper's mixture table"
    * step (e.g. The Pile / Gopher §A2 sampling proportions): declare
    * weights, get a reproducible subset whose expected token mass
    * matches them. Strata missing from `weights` get weight 0 (dropped).
    *
    * Scale shape: one groupBy(stratum) token-sum (map-side partial over
    * a handful of keys) broadcast back into a scan-shaped filter —
    * the corpus itself never shuffles. Returns
    * (doc_id, stratum, n_tokens, rate). */
  def tokenBudgetMix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      totalTokens: Long,
      seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-empty and non-negative")
    val wsum = weights.values.sum
    val weightCol: Column = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val counted = docs.select(
      col(idCol).as("doc_id"),
      col(stratumCol).as("stratum"),
      expr(s"CASE WHEN length(trim(`$textCol`)) = 0 THEN 0L " +
        s"ELSE size(split(trim(`$textCol`), '\\\\s+')) END").cast("long").as("n_tokens"),
      (weightCol / wsum * totalTokens.toDouble).as("target"))
    val totals = counted.groupBy("stratum").agg(sum("n_tokens").as("src_tokens"))
    counted
      .join(broadcast(totals), Seq("stratum"))
      .withColumn("rate",
        least(lit(1.0), col("target") / col("src_tokens").cast("double")))
      .filter(
        pmod(Dedup.hash60(col("doc_id").cast("string"), lit(seed)), lit(1000000L))
          .cast("double") < col("rate") * 1000000.0)
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        round(col("rate"), 6).as("rate"))
  }

  /** DSIR importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw-corpus
    * document by how target-like its hashed n-gram feature distribution
    * is. Features are unigrams+bigrams hashed into `numBuckets` buckets
    * (the paper's hashed-n-gram generative model); bucket probabilities
    * are Laplace-estimated on the target and raw corpora; a document's
    * score is the MEAN per-feature log-likelihood ratio
    * ln(p_target(b)/p_raw(b)) — the mean (vs the paper's sum) makes the
    * score length-invariant, the same normalization CCNet applies to its
    * LM scores. `selected` flags the top quartile (score ≥ q75), a
    * deterministic stand-in for the paper's Gumbel resampling.
    *
    * Determinism: bucket ids come from the md5-hex hash DuckDB replays
    * byte-exactly; per-bucket log-probs are quantized to integer
    * micro-nats BEFORE the per-doc sum (order-independent exact
    * arithmetic, as in TextStats.perplexityBuckets); the 0.75 quantile
    * is an exact binary fraction; scores are `+ 0.0`-normalized so a
    * negative-zero rounding can never hash-split the engines.
    *
    * Scale shape (100 TB): the only corpus-sized work is ONE hashed-gram
    * explode + (doc,bucket) rollup per corpus. That rollup is persisted
    * and every downstream consumer derives from it: the bucket LMs are
    * collected driver-side (bounded by `numBuckets` — 1024 rows, a
    * driver-known bound) and re-broadcast as literals, and the selection
    * threshold re-aggregates the persisted rollup in-plan. The previous
    * all-in-plan shape was measured re-running the md5 gram explode ~6×
    * (11 scans of the corpus in the physical plan, ReuseExchange
    * defeated by column pruning — the same failure measured 43% on
    * perplexityBuckets at ×1000); this shape runs it once per corpus,
    * 2.4× faster at sf0.1. The persisted rollup pins a cache entry for
    * the session lifetime — long-lived sessions use
    * [[dsirWeightsScored]] and unpersist the handle after the action. */
  @deprecated("runs two collect jobs at call time and pins a cache entry " +
    "the caller can never unpersist; use dsirWeightsScored and unpersist " +
    "the returned rollup handle after the output action", "round-13")
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 1024): DataFrame =
    dsirWeightsScored(raw, target, idCol, textCol, numBuckets)._1

  /** [[dsirWeights]] plus the persisted (doc,bucket) rollup handle —
    * call `.unpersist()` on it after the output action to release the
    * cache entry. */
  def dsirWeightsScored(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 1024): (DataFrame, DataFrame) = {
    // unigram explode union bigram zip-of-slices explode, with the
    // bigram concat and the md5 both POST-explode where they codegen —
    // the transform() lambda shape ran the concat interpreted per gram,
    // measured 8x slower on the same rollup (NGrams.scala)
    def feats(df: DataFrame): DataFrame = {
      val toks = df.select(col(idCol).as("doc_id"),
        expr(s"regexp_extract_all(lower(`$textCol`), '[a-z0-9]+', 0)").as("ws"))
      val uni = toks.select(col("doc_id"), explode(col("ws")).as("gram"))
      val bi = toks
        .select(col("doc_id"), explode(NGrams.zipExpr("ws", 2)).as("pr"))
        .select(col("doc_id"),
          concat(col("pr.0"), lit(" "), col("pr.1")).as("gram"))
      uni.unionAll(bi)
        .withColumn("bucket",
          expr(s"CAST(conv(substr(md5(gram), 1, 15), 16, 10) AS BIGINT) % $numBuckets"))
        .select("doc_id", "bucket")
    }
    // single feature pass per corpus, enforced rather than hoped-for:
    // the (doc,bucket) rollup is persisted, the bounded bucket counts
    // (≤ numBuckets rows each, a driver-known bound) are collected and
    // re-entered as literal DataFrames, and every LM/total derives from
    // those literals — ReuseExchange cannot be defeated by pruning
    // because there is nothing left to re-derive from the corpus
    val micro = "CAST(round(ln(c + 1) * 1000000) AS BIGINT)"
    val spark = raw.sparkSession
    val cntSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType, nullable = false)))
    def literalCounts(rows: Array[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), cntSchema)
    val dbR = feats(raw).groupBy("doc_id", "bucket").agg(count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // micro-nat quantization stays an in-plan expression over the
    // literal counts so the values are computed by the same Spark
    // expression as before (bit-identical; no driver-side reimplementation
    // of Spark's BigDecimal HALF_UP rounding to get subtly wrong)
    val cntR = literalCounts(dbR.groupBy("bucket").agg(sum("m").as("c")).collect())
    val cntT = literalCounts(
      feats(target).groupBy("bucket").agg(count(lit(1)).as("c")).collect())
    val lmT = cntT.select(col("bucket"), expr(micro).as("lt"))
    val lmR = cntR.select(col("bucket"), expr(micro).as("lr"))
    // raw-side buckets always exist in lmR; absent-from-target buckets
    // score ln(0 + 1) = 0 micro-nats exactly
    val lm = lmR.join(lmT, Seq("bucket"), "left")
      .select(col("bucket"), col("lr"), coalesce(col("lt"), lit(0L)).as("lt"))
    val totT = cntT.agg(sum("c").as("n_t"))
    val totR = cntR.agg(sum("c").as("n_r"))
    val scored = dbR
      .join(broadcast(lm), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_feats"),
        sum(col("m") * (col("lt") - col("lr"))).as("_s"))
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .withColumn("logratio",
        round((col("_s") + col("n_feats") *
          (expr(s"CAST(round(ln(n_r + $numBuckets) * 1000000) AS BIGINT)") -
            expr(s"CAST(round(ln(n_t + $numBuckets) * 1000000) AS BIGINT)")))
          .cast("double") / lit(1e6) / col("n_feats").cast("double"), 4) + lit(0.0))
      .select("doc_id", "n_feats", "logratio")
    // threshold as an in-plan single-row broadcast: the quantile
    // aggregate and the output join each re-aggregate the PERSISTED
    // rollup — cheap per-doc sums, never the gram explode
    val threshold = scored.agg(percentile(col("logratio"), lit(0.75)).as("_q75"))
    val out = raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(threshold))
      .select(
        col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("logratio"),
        coalesce(col("logratio") >= col("_q75"), lit(false)).as("selected"))
    (out, dbR)
  }

  /** Sequence packing: assign docs (in id order) to consecutive
    * context-window bins of ~`budgetTokens` whitespace tokens, with the
    * doc's offset inside its bin. bin = floor(exclusive-prefix-sum /
    * budget) — deterministic, never splits a doc, and SQL-expressible
    * (a window cumsum) so the oracle can replay it.
    *
    * Scale shape: the prefix sum runs bucket-partitioned (per-bucket
    * local cumsum + driver-side prefix offsets over numRanges scalars)
    * — no unpartitioned window over the corpus. Buckets are a pure
    * expression over the numeric id (equal-width value ranges from one
    * min/max aggregate), NOT `repartitionByRange` + `spark_partition_id`:
    * range boundaries are sample-based, so two actions over the same
    * plan could see different partition assignments and silently
    * mis-bin (the exact bug a prior round shipped). Equal-width buckets
    * skew if ids are sparse/clustered, but every bucket is still a
    * correct contiguous id range — balance is a perf knob, determinism
    * is the contract. Ids must be non-null: a null id has no position in
    * the id order that defines the packing, so null-id rows are dropped
    * up front (they would otherwise NPE in the bucket-offset collect).
    * Returns `(doc_id, n_tokens, bin, bin_offset)`. */
  def sequencePack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val numRanges = spark.sessionState.conf.numShufflePartitions
    val counted = docs.filter(col(idCol).isNotNull).select(
      col(idCol).as("doc_id"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    val bounds = counted.agg(
      min(col("doc_id").cast("long")), max(col("doc_id").cast("long"))).head()
    if (bounds.isNullAt(0))
      return counted.withColumn("bin", lit(0L)).withColumn("bin_offset", lit(0L))
        .select("doc_id", "n_tokens", "bin", "bin_offset").limit(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo + 1L, 1L)
    // deterministic bucket: floor((id - lo) * numRanges / span) in
    // [0, numRanges). Double math: long multiply overflows for sparse
    // 64-bit id spaces; double is monotone so buckets stay contiguous.
    val partExpr = least(
      ((col("doc_id").cast("long") - lo).cast("double") * numRanges / span).cast("int"),
      lit(numRanges - 1))
    val bucketed = counted.withColumn("_part", partExpr)
    val partSums = bucketed.groupBy("_part")
      .agg(sum("n_tokens").as("_psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partSums.map { case (p, s) => val o = (p, acc); acc += s; o }.toSeq
    import spark.implicits._
    val offsetsDf = offsets.toDF("_part", "_offset")
    val wLocal = Window.partitionBy("_part").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsetsDf), "_part")
      .withColumn("_cum", col("_offset") + sum("n_tokens").over(wLocal))
      .withColumn("bin", ((col("_cum") - col("n_tokens")) / budgetTokens).cast("long"))
      .withColumn("bin_offset", (col("_cum") - col("n_tokens")) % budgetTokens)
      .select("doc_id", "n_tokens", "bin", "bin_offset")
  }

  /** Benchmark-contamination check: training docs sharing at least
    * `minShared` distinct word `shingleSize`-grams with any eval doc.
    * The candidate join is keyed by the shingle value with a document-
    * frequency cap on the EVAL side (stop-shingles never fan out), so
    * the shuffle is bounded by |eval shingles| × df — the same scale
    * guard as the n-gram Jaccard join. Returns
    * `(doc_id, eval_id, n_shared)`. */
  def contamination(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      minShared: Int = 2,
      maxEvalShingleDf: Int = 100): DataFrame = {
    val trainSh = Dedup.shingles(train, idCol, textCol, shingleSize)
    val evalSh = Dedup.shingles(eval_, idCol, textCol, shingleSize)
      .withColumnRenamed("doc_id", "eval_id")
    // drop eval shingles that are common across the eval set itself —
    // boilerplate n-grams create quadratic fan-out, not signal
    val rareEval = evalSh.groupBy("sh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxEvalShingleDf)
      .select("sh")
    evalSh.join(rareEval, "sh")
      .join(trainSh, "sh")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The [[contamination]] APPLY step: drop every training doc flagged
    * against any eval doc, keep the rest — with the per-doc verdict and
    * the worst-offender diagnostics (peak shared-gram count and how many
    * eval docs it hit).
    *
    * One left anti-ish shape expressed as a left join on the per-train
    * rollup: the flagged set is orders of magnitude smaller than the
    * corpus, so the join build side stays tiny; the corpus never
    * shuffles on anything but its own id. Returns
    * `(doc_id, contaminated, n_eval_hits, max_shared)`. */
  def decontaminate(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      minShared: Int = 2,
      maxEvalShingleDf: Int = 100): DataFrame = {
    val hits = contamination(train, eval_, idCol, textCol,
      shingleSize, minShared, maxEvalShingleDf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"), max("n_shared").as("max_shared"))
    train.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_eval_hits").isNotNull.as("contaminated"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"))
  }

  /** Sliding-window document chunking — the context-window preparation
    * step for pretraining (HF `return_overflowing_tokens` semantics):
    * chunk k covers tokens `[k·stride, k·stride + chunkTokens)`; the
    * LAST start is the smallest multiple of `stride` whose window
    * reaches the end of the document, so the tail is covered exactly
    * once with no redundant sub-window of the previous chunk. Documents
    * shorter than `chunkTokens` yield their single (short) chunk;
    * zero-token documents yield no rows.
    *
    * Output: `(doc_id, chunk_id, n_tokens, chunk_text)`.
    *
    * Scale shape: tokenize → `posexplode(sequence(0, K))` (no
    * higher-order lambda — NGrams.scala) → codegen'd `slice` +
    * `concat_ws` post-explode. Zero shuffles: a pure flatMap-shaped
    * projection whose output is ~`1 + overlap` times the corpus. */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got chunk=$chunkTokens stride=$stride")
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"regexp_extract_all(lower(`$textCol`), '[a-z0-9]+', 0)").as("toks"))
      .withColumn("_k", expr(
        s"CASE WHEN size(toks) = 0 THEN -1 WHEN size(toks) <= $chunkTokens THEN 0 " +
          s"ELSE (size(toks) - $chunkTokens + $stride - 1) DIV $stride END"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr("CASE WHEN _k < 0 THEN CAST(array() AS array<int>) " +
          "ELSE sequence(0, _k) END")).as(Seq("chunk_id", "_ignored")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"slice(toks, chunk_id * $stride + 1, $chunkTokens)").as("_c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("_c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_c")).as("chunk_text"))
  }

  /** Deterministic train/validation/test split — the dataset-freeze
    * primitive: assign each row a named split by carving the 60-bit
    * hash space of `(id, salt)` into contiguous ppm ranges
    * (`fractions` in parts-per-million; must sum to ≤ 10^6, any
    * remainder rows get NULL — an explicit "held out entirely"
    * bucket). Membership is a pure projection (zero shuffle, zero
    * state), reproducible across engines/runs/partitionings, and
    * STABLE under corpus growth: a row's split never changes when
    * other rows are added or removed — the property random
    * `randomSplit` does not have and the reason leakage audits insist
    * on hash splits. Adds `split`. */
  def hashSplit(
      docs: DataFrame, idCol: String,
      fractionsPpm: Seq[(String, Long)], salt: String = "#split"): DataFrame = {
    require(fractionsPpm.nonEmpty, "at least one split")
    require(fractionsPpm.map(_._1).distinct.size == fractionsPpm.size,
      "duplicate split names")
    require(fractionsPpm.forall(_._2 > 0), "fractions must be positive")
    require(fractionsPpm.map(_._2).sum <= 1000000L,
      "fractions must sum to <= 1e6 ppm")
    val bounds = fractionsPpm.scanLeft(0L) { case (acc, (_, f)) => acc + f }
    val draw = pmod(Dedup.hash60(col(idCol).cast("string"), lit(salt)),
      lit(1000000L))
    val splitCol = fractionsPpm.zip(bounds.sliding(2).toSeq)
      .foldLeft(lit(null).cast("string")) {
        case (acc, ((name, _), Seq(lo, hi))) =>
          when(draw >= lo && draw < hi, lit(name)).otherwise(acc)
      }
    docs.withColumn("split", splitCol)
  }

  /** Square-root temperature mixing (the α = 0.5 point of the
    * Gopher/LLaMA-style `p_s ∝ tokens_s^α` domain-rebalancing family):
    * each stratum's share of `totalTokens` is proportional to
    * √(its token mass), boosting small domains and damping the head
    * without a hand-written weight table. α is FIXED at 0.5 because
    * `sqrt` is IEEE-correctly-rounded in every engine while `pow` is
    * only ~1-ulp — the gate's bit-exactness bar rules general α out
    * (the general shape is [[tokenBudgetMix]] with caller weights).
    *
    * Scale shape: identical to [[tokenBudgetMix]] — one bounded
    * stratum rollup broadcast back into a scan-shaped hash-threshold
    * filter; the corpus never shuffles. Returns
    * `(doc_id, stratum, n_tokens, rate)`. */
  def sqrtTemperatureMix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: String,
      totalTokens: Long,
      seed: Long = 42L): DataFrame = {
    require(totalTokens > 0, s"totalTokens > 0, got $totalTokens")
    val counted = docs.select(
      col(idCol).as("doc_id"),
      col(stratumCol).as("stratum"),
      expr(s"CASE WHEN length(trim(`$textCol`)) = 0 THEN 0L " +
        s"ELSE size(split(trim(`$textCol`), '\\\\s+')) END")
        .cast("long").as("n_tokens"))
    // √tokens quantized to integer micro BEFORE the cross-stratum sum:
    // a float Σ over strata is partition/engine-order-dependent where
    // an integer Σ is not (the micro-nat recipe)
    val totals = counted.groupBy("stratum")
      .agg(sum("n_tokens").as("src_tokens"))
      .withColumn("sqrt_micro", expr(
        "CAST(round(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000) AS BIGINT)"))
    // Σ over a handful of strata: an in-plan 1-row aggregate
    // cross-joined back (the bounded-literal discipline, no collect)
    val denom = totals.agg(sum("sqrt_micro").as("sqrt_sum_micro"))
    counted
      .join(broadcast(totals), Seq("stratum"))
      .crossJoin(broadcast(denom))
      .withColumn("rate", least(lit(1.0),
        col("sqrt_micro").cast("double") / col("sqrt_sum_micro").cast("double")
          * totalTokens.toDouble / col("src_tokens").cast("double")))
      .filter(
        pmod(Dedup.hash60(col("doc_id").cast("string"), lit(seed)), lit(1000000L))
          .cast("double") < col("rate") * 1000000.0)
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        round(col("rate"), 6).as("rate"))
  }

  /** Deterministic epoch shuffle — the reproducible global training
    * order ("shard N of epoch E sees exactly these rows in exactly
    * this order, on any cluster, re-run years later"): order by the
    * md5 of (id, seed) — a fresh uniform permutation per seed — and
    * assign a CONTIGUOUS 1-based `shuffle_pos` via the distributed
    * [[graft.operators.GlobalRank]] (range-partitioned local ranks +
    * a partition-count-sized offset table — no single-partition
    * window). `shuffle_pos div shardSize` is then the shard
    * assignment, `pmod(shuffle_pos, k)` a round-robin split — both
    * derivable downstream without another shuffle.
    *
    * Scale shape: one range exchange on the hash key (the global-sort
    * shuffle every shuffle of 100 TB costs at minimum); everything
    * else is a projection. Output: input columns + `shuffle_pos`. */
  def epochShuffle(
      docs: DataFrame, idCol: String, seed: Long): DataFrame =
    graft.operators.GlobalRank.withGlobalRank(
      docs.withColumn("_esk",
        expr(s"md5(concat(CAST(`$idCol` AS STRING), '#epoch$seed'))")),
      Seq(col("_esk"), col(idCol)), "shuffle_pos")
      .drop("_esk")
}
