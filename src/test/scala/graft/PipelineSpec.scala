package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Mixing, Multimodal, Similarity, TextStats}

/** LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard), embedding ANN vs brute force, text statistics, and
  * multimodal column plumbing. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ---------- exact dedup ----------

  test("exactDedup collapses whitespace/case variants to the min doc id") {
    val d = docsDf(
      0L -> "Spark  joins  tables",
      1L -> "spark joins tables",
      2L -> "  SPARK JOINS TABLES ",
      3L -> "something else entirely")
    val out = Dedup.exactDedup(d, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("keep_id") === 0L)
    assert(out(0).getAs[Long]("n_docs") === 3L)
    assert(out(1).getAs[Long]("keep_id") === 3L)
    assert(out(1).getAs[Long]("n_docs") === 1L)
  }

  // ---------- MinHash / LSH ----------

  test("identical docs get identical minhash signatures; disjoint docs differ") {
    val d = docsDf(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(d, "doc_id", "text", 3), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 8).foreach { p =>
      assert(sigs((0L, p)) === sigs((1L, p)))
    }
    assert((0 until 8).exists(p => sigs((0L, p)) !== sigs((2L, p))))
  }

  test("LSH pairs find planted near-duplicates and report exact jaccard") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " other"
    val d = docsDf(0L -> base, 1L -> nearDup, 2L -> "totally different content here now")
    val pairs = Dedup.minhashDedupPairs(d, "doc_id", "text",
      shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 0L && pairs(0).getLong(1) === 1L)
    // base has 28 shingles, nearDup has 28, 27 shared -> j = 27/29
    assert(math.abs(pairs(0).getAs[Double]("jaccard") - 27.0 / 29.0) < 1e-9)
  }

  test("ngramJaccardPairs matches LSH-verified jaccard on shared-rare-shingle candidates") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " other"
    val d = docsDf(0L -> base, 1L -> nearDup, 2L -> "totally different content here now")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      shingleSize = 3, maxShingleDf = 20, minJaccard = 0.5).collect()
    assert(pairs.length === 1)
    assert(math.abs(pairs(0).getAs[Double]("jaccard") - 27.0 / 29.0) < 1e-9)
  }

  test("simhash is deterministic, equal for identical docs, different for disjoint docs") {
    val d = docsDf(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma delta",
      2L -> "completely unrelated words appear")
    val out = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === out(1L))
    assert(out(0L) !== out(2L))
    val again = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  // ---------- embedding similarity ----------

  lazy val embeddings: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ANN with full probing equals brute force; partial probing has high recall") {
    val qs = embeddings.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val exact = Similarity.bruteForceTopK(embeddings, qs, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val (cents, assign) = Similarity.buildIvf(spark, embeddings, 64, numCentroids = 16)
    val full = Similarity.annTopK(spark, embeddings, cents, assign, 64, qs,
      k = 10, nProbe = 16)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)

    // measured curve on this seeded build: nProbe 4 -> 0.65, 8 -> 0.84,
    // 12 -> 0.95 (deterministic k-means, stable values)
    val partial = Similarity.annTopK(spark, embeddings, cents, assign, 64, qs,
      k = 10, nProbe = 8)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (partial & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall too low: $recall")
  }

  test("gatherCandidates: hot-cell salting never changes the candidate multiset") {
    import spark.implicits._
    // three seeded skewed corpora: ~40% of the vectors are ONE exact
    // vector, so k-means collapses them into a single hot cell and the
    // guard's nsalt > 1 branch is genuinely exercised (asserted on the
    // realized histogram, not assumed)
    for (seed <- Seq(1L, 7L, 23L)) {
      val rnd = new java.util.Random(seed)
      val blob = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val docs = (0L until 1500L).map { i =>
        val v =
          if (i % 5 < 2) blob.clone()
          else Array.fill(16)(rnd.nextFloat() * 2 - 1)
        (i, v)
      }.toDF("vec_id", "embedding")
      // K = 32 so the mean cell is ~47 docs and the ~600-doc blob sits
      // far above the 4×-mean hot threshold (at K = 8 the mean is 187
      // and a 40% blob can never reach 4× — the guard would never fire)
      val (cents, assign) = Similarity.buildIvf(
        spark, docs, dim = 16, numCentroids = 32, seed = seed)
      val hist = assign.groupBy("code").count()
        .agg(max("count"), avg("count")).head()
      assert(hist.getLong(0) > 4 * hist.getDouble(1),
        s"seed $seed: corpus not skewed enough to engage the guard " +
          s"(max ${hist.getLong(0)} vs mean ${hist.getDouble(1)})")
      val probed = Similarity.probeTopN(
        spark, docs.limit(200).select(col("vec_id").as("query_id"),
          col("embedding").as("qemb")), cents, 16, nProbe = 3)
      def gathered(maxSalt: Int): Seq[(Long, Long)] =
        Similarity.gatherCandidates(assign, probed, maxSalt = maxSalt)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // identity is the guard's whole contract: same multiset, any salt
      val plain = gathered(1)
      assert(gathered(8) === plain, s"seed $seed: maxSalt=8 diverged")
      assert(gathered(32) === plain, s"seed $seed: maxSalt=32 diverged")
    }
  }

  test("cosineDedupPairs finds planted duplicate vectors via bucketed join") {
    import spark.implicits._
    // duplicate vec 0 and 1 under new ids
    val base = embeddings.select("vec_id", "embedding")
    val dups = embeddings.filter(col("vec_id") < 2)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = base.union(dups)
    val pairs = Similarity.cosineDedupPairs(spark, all, 64, numCentroids = 8,
      minCosine = 0.9999).as[(Long, Long, Double)].collect().toSet
    assert(pairs.exists { case (a, b, _) => a === 0L && b === 100000L })
    assert(pairs.exists { case (a, b, _) => a === 1L && b === 100001L })

    // multi-probe (default 2) finds at least everything single-assign
    // finds, without duplicate pair rows
    val single = Similarity.cosineDedupPairs(spark, all, 64, numCentroids = 8,
      minCosine = 0.9999, probes = 1).as[(Long, Long, Double)].collect().toSet
    assert(single.map(p => (p._1, p._2)).subsetOf(pairs.map(p => (p._1, p._2))))
    val keys = pairs.toSeq.map(p => (p._1, p._2))
    assert(keys.distinct.size === keys.size)
  }

  test("semDedup drops planted duplicates, keeps the priority survivor, caps skew") {
    val base = embeddings.select("vec_id", "embedding")
    val dups = embeddings.filter(col("vec_id") < 2)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = base.union(dups)
    val (cents, _) = Similarity.buildIvf(spark, all, 64, numCentroids = 16)
    val out = Similarity.semDedup(spark, all, cents, dim = 64, tau = 0.9999)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    // an exact duplicate ties on centroid cosine, so the tie-break keeps
    // the LOWER vec_id and names it as the survivor of the dropped copy
    assert(out(0L) === ((true, None)))
    assert(out(100000L) === ((false, Some(0L))))
    assert(out(1L) === ((true, None)))
    assert(out(100001L) === ((false, Some(1L))))
    // the rest of the corpus is near-orthogonal — nothing else drops
    assert(out.count(!_._2._1) === 2)
    assert(out.size === all.count())

    // skew guard: cap below every cluster size ⇒ pairing skipped, all kept
    val capped = Similarity.semDedup(spark, all, cents, dim = 64,
      tau = 0.9999, maxClusterSize = 1)
      .filter(!col("kept")).count()
    assert(capped === 0L)
  }

  // ---------- text stats ----------

  test("text stats, token counts, quality, langId, fingerprint behave on fixtures") {
    val d = docsDf(
      0L -> "The quick brown fox jumps over the lazy dog and runs to a hill. It is fast!",
      1L -> "le chat et le chien dans la maison des les arbres",
      2L -> "")
    val st = TextStats.stats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(0L).getAs[Int]("n_words") === 17)
    assert(st(2L).getAs[Int]("n_words") === 0)
    assert(st(0L).getAs[Int]("n_punct") === 2) // '.' and '!'

    val tc = TextStats.tokenCounts(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(tc(0L).getAs[Int]("n_ws_tokens") === 17)
    assert(tc(0L).getAs[Int]("n_bpe_tokens") === 19) // 17 words + '.' + '!'

    val lang = TextStats.langId(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(0L) === "en")
    assert(lang(1L) === "fr")
    assert(lang(2L) === "und")

    val q = TextStats.qualityScore(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(0L) > 0.0 && q(0L) <= 1.0)
    assert(q(2L) === 0.0)

    val fp = TextStats.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fp(0L).isDefined && fp(1L).isDefined)
    assert(fp(2L).isEmpty)
    assert(fp(0L) !== fp(1L))
  }

  test("repetition signals: gopher fractions on hand-checked fixtures") {
    val d = docsDf(
      0L -> "spam spam spam spam",                    // 1 distinct word of 4
      1L -> "alpha beta gamma delta",                 // all distinct
      2L -> "go stop go stop go",                     // top bigram "go stop" 2/4
      3L -> "")                                       // empty -> all zero
    val rep = TextStats.repetition(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rep.size === 4)
    assert(rep(0L).getAs[Double]("dup_word_frac") === 0.75)   // 1 - 1/4
    assert(rep(0L).getAs[Double]("top_word_frac") === 1.0)
    assert(rep(0L).getAs[Double]("top_bigram_frac") === 1.0)  // "spam spam" x3
    assert(rep(1L).getAs[Double]("dup_word_frac") === 0.0)
    assert(rep(1L).getAs[Double]("top_word_frac") === 0.25)
    assert(rep(1L).getAs[Double]("top_trigram_frac") === 0.5) // 2 distinct of 2
    assert(rep(2L).getAs[Double]("top_word_frac") === 0.6)    // go 3/5
    assert(rep(2L).getAs[Double]("top_bigram_frac") === 0.5)  // "go stop" 2/4
    assert(rep(3L).getAs[Double]("dup_word_frac") === 0.0)
    assert(rep(3L).getAs[Double]("top_trigram_frac") === 0.0)
  }

  test("blocklistFilter: whole-token matches only, case-insensitive, audit column") {
    val d = docsDf(
      0L -> "the grass is green",            // "grass" must NOT match "ass"
      1L -> "he fell on his ASS twice Ass",  // case-insensitive, distinct-counted
      2L -> "bad and worse and bad again",   // two distinct hits
      3L -> "perfectly clean prose here",
      4L -> "")
    val out = TextStats.blocklistFilter(d, "doc_id", "text", Seq("ass", "bad", "worse"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("pass") && out(0L).getAs[Long]("n_blocked") === 0L)
    assert(!out(1L).getAs[Boolean]("pass"))
    assert(out(1L).getAs[Long]("n_blocked") === 1L) // distinct terms, not occurrences
    assert(out(1L).getAs[String]("blocked_terms") === "ass")
    assert(out(2L).getAs[Long]("n_blocked") === 2L)
    assert(out(2L).getAs[String]("blocked_terms") === "bad,worse")
    assert(out(3L).getAs[Boolean]("pass") && out(4L).getAs[Boolean]("pass"))
  }

  test("blocklistFilter: terms with quotes and backslashes are plain literals") {
    // regression for the SQL-text interpolation era: an apostrophe term
    // silently parsed as a different literal and a backslash term threw
    val d = docsDf(0L -> "reading o'reilly books", 1L -> "a back\\slash here")
    val out = TextStats
      .blocklistFilter(d, "doc_id", "text", Seq("o'reilly", "back\\slash", "x"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // the corpus tokenizer strips punctuation, so these terms can only
    // ever match if passed through verbatim as literals — no parse, no
    // escape convention; neither should throw and neither should match
    // tokenized corpus words
    assert(out(0L).getAs[Boolean]("pass"))
    assert(out(1L).getAs[Boolean]("pass"))
  }

  test("canonicalizeUrls: case/port/params/fragment/slash rules, urlDedup groups") {
    import graft.pipeline.Scrub
    val d = docsDf(
      0L -> "HTTP://Example.COM:80/A/b/?utm_source=x&z=9&a=1#frag",
      1L -> "http://example.com/A/b?a=1&z=9",          // same canon as 0
      2L -> "https://Host.com:443/",                    // root path survives
      3L -> "https://host.com",                         // empty path -> "/" (same as 2)
      4L -> "https://host.com:8443/x",                  // non-default port kept
      5L -> "ftp://Files.example.com/pub/",             // non-http scheme: port rules skip
      6L -> "no scheme here",                           // unparseable -> null
      7L -> "http://example.com/?fbclid=abc&gclid=1&ref=t") // all params tracked away
    val out = Scrub.canonicalizeUrls(d.withColumnRenamed("text", "url"), "doc_id", "url")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(0L) === Some("http://example.com/A/b?a=1&z=9"))
    assert(out(0L) === out(1L))
    assert(out(2L) === Some("https://host.com/"))
    assert(out(3L) === out(2L))
    assert(out(4L) === Some("https://host.com:8443/x"))
    assert(out(5L) === Some("ftp://files.example.com/pub"))
    assert(out(6L) === None)
    assert(out(7L) === Some("http://example.com/"))
    val groups = Scrub.urlDedup(d.withColumnRenamed("text", "url"), "doc_id", "url")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    // 0+1 merge, 2+3 merge, 4/5/7 singleton, 6 unparseable singleton
    assert(groups.length === 6)
    assert(groups.contains((Some("http://example.com/A/b?a=1&z=9"), 0L, 2L)))
    assert(groups.contains((Some("https://host.com/"), 2L, 2L)))
    assert(groups.contains((None, 6L, 1L)))
  }

  test("end-to-end curation DAG: url-dedup -> near-dedup -> quality -> perplexity -> DSIR compose") {
    import graft.pipeline.{Scrub, TextStats, Mixing}
    // 30 docs: 10 clean prose, 5 url-duplicates of the first 5 (same page,
    // tracking params), a near-dup family of 4, 5 gibberish (off-LM), and
    // 6 singletons; each stratum is detectable by exactly one stage
    // prose/single sentences share VOCABULARY (for the corpus LM) but not
    // 3-gram runs — near-dedup must NOT merge them
    val proseTexts = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "a small grey cat sleeps under the warm sun by the garden wall",
      "the old fisherman walks along the shore as the tide comes in",
      "children play in the park while their parents watch from the bench",
      "the train arrives at the station and the crowd moves to the doors",
      "a gentle rain falls on the quiet town during the early morning",
      "the baker opens his shop and the smell of bread fills the street",
      "two friends share a meal and talk about the events of the week",
      "the teacher writes on the board while the students take their notes",
      "a farmer tends his field as the seasons turn from spring to summer")
    val singleTexts = Seq(
      "the sailor reads a letter from home while the ship waits in the harbor",
      "a painter mixes colors on her palette before the light of day fades",
      "the clockmaker repairs the old tower bell as the town sleeps below",
      "a librarian sorts the returned books and the shelves fill up again",
      "the gardener prunes the roses while the bees move among the flowers",
      "a carpenter measures the oak beam twice before the first careful cut")
    val prose = proseTexts.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"http://site.com/page$i", t) }
    val urlDups = (0 until 5).map(i =>
      (100L + i, s"HTTP://Site.COM:80/page$i?utm_source=x", proseTexts(i)))
    val nearDups = (0 until 4).map(i =>
      (200L + i, s"http://other.com/nd$i", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi " + s"tail$i"))
    val gibberish = (0 until 5).map(i =>
      (300L + i, s"http://junk.com/g$i", s"zzq$i wvx$i kjh$i pqr$i mnb$i vcx$i"))
    val single = singleTexts.zipWithIndex.map { case (t, i) =>
      (400L + i, s"http://solo.com/s$i", t) }
    import spark.implicits._
    val corpus = (prose ++ urlDups ++ nearDups ++ gibberish ++ single)
      .toDF("doc_id", "url", "text")
    // stage 1: URL dedup removes the 5 tracking-param duplicates
    val afterUrl = corpus.join(
      Scrub.urlDedup(corpus, "doc_id", "url").select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "leftsemi")
    assert(afterUrl.count() === 25)
    assert(afterUrl.filter(col("doc_id") >= 100 && col("doc_id") < 200).count() === 0)
    // stage 2: near-dedup collapses the 4-doc family to its best survivor
    val pairs = graft.pipeline.Dedup.minhashDedupPairs(afterUrl, "doc_id", "text",
      shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.5)
    val clusters = graft.pipeline.Dedup.duplicateClusters(afterUrl, "doc_id", pairs)
    val survivors = graft.pipeline.Dedup.clusterSurvivors(clusters,
      TextStats.qualityScore(afterUrl, "doc_id", "text")
        .select(col("doc_id"), col("quality").as("score")))
    val dropIds = survivors.filter(col("doc_id") =!= col("survivor_id"))
      .select("doc_id")
    val afterNear = afterUrl.join(dropIds, Seq("doc_id"), "left_anti")
    assert(afterNear.count() === 22) // 25 - 3 non-survivor family members
    // stage 3: perplexity buckets — gibberish lands in tail, prose doesn't
    val ppl = TextStats.perplexityBuckets(afterNear, "doc_id", "text")
    val tailIds = ppl.filter(col("ppl_bucket") === "tail")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((300L until 305L).toSet.subsetOf(tailIds), s"gibberish not in tail: $tailIds")
    assert(!tailIds.exists(_ < 10L), "clean prose must not land in tail")
    val afterPpl = afterNear.join(ppl.filter(col("ppl_bucket") =!= "tail")
      .select("doc_id"), Seq("doc_id"), "leftsemi")
    // stage 4: DSIR against the prose stratum as target ranks prose-like first
    val (dsir, dsirRollup) = Mixing.dsirWeightsScored(
      afterPpl.filter(col("doc_id") >= 400), afterPpl.filter(col("doc_id") < 10),
      "doc_id", "text", numBuckets = 256)
    val sel = dsir.filter(col("selected")).count()
    assert(sel >= 1 && sel < 6, s"top-quartile selection out of range: $sel")
    // the funnel is monotone and every stage's output feeds the next —
    // the composition itself (schemas, ids, laziness) is what's under test
    assert(afterPpl.count() >= 15)
    dsirRollup.unpersist()
  }

  test("canonicalizeUrls is idempotent: canon(canon(u)) == canon(u)") {
    import graft.pipeline.Scrub
    val d = docsDf(
      0L -> "HTTP://Example.COM:80/A/b/?utm_source=x&z=9&a=1#frag",
      1L -> "https://Host.com:443/",
      2L -> "https://host.com:8443/x/?b=2&a=1",
      3L -> "ftp://Files.example.com/pub/",
      4L -> "http://example.com/?fbclid=abc",
      5L -> "no scheme here").withColumnRenamed("text", "url")
    val once = Scrub.canonicalizeUrls(d, "doc_id", "url")
      .select(col("doc_id"), col("canon_url").as("url"))
      .filter(col("url").isNotNull)
    val twice = Scrub.canonicalizeUrls(once, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val first = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice === first, "canonicalization must be a fixed point")
  }

  test("perplexityBuckets: corpus-LM nll matches brute force, buckets ordered") {
    // common words appear in every doc (low nll → head); doc 3 uses
    // corpus-rare words (high nll → tail); doc 4 is empty (null nll, tail)
    val d = docsDf(
      0L -> "the cat sat on the mat",
      1L -> "the dog sat on the mat",
      2L -> "the cat sat on the rug",
      3L -> "zyx qwv jkl pnm bcd fgh",
      4L -> "")
    val out = TextStats.perplexityBuckets(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5)
    // brute-force nll for doc 0 with the same integer micro-nat quantization
    val toks = d.collect().map(r => r.getLong(0) ->
      "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toMap
    val counts = toks.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val n = counts.values.sum.toLong
    val v = counts.size.toLong
    def q(x: Double): Long = math.round(x * 1e6)
    def nll(id: Long): Double = {
      val ts = toks(id)
      val s = ts.map(t => q(math.log(counts(t) + 1.0))).sum
      val raw = (ts.size * q(math.log((n + v).toDouble)) - s).toDouble / 1e6 / ts.size
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Double]("nll") === nll(id), s"doc $id")
      assert(out(id).getAs[Long]("n_tokens") === toks(id).size.toLong)
    }
    // rare-word doc must score strictly worse than the common-word docs
    assert(nll(3L) > nll(0L) && nll(3L) > nll(1L) && nll(3L) > nll(2L))
    assert(out(3L).getAs[String]("ppl_bucket") === "tail")
    assert(out(0L).getAs[String]("ppl_bucket") === "head")
    // empty doc: no tokens, null score, tail bucket by contract
    assert(out(4L).getAs[Long]("n_tokens") === 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("nll")))
    assert(out(4L).getAs[String]("ppl_bucket") === "tail")
    // bucket thresholds are quantiles: heads score <= every middle/tail
    val byBucket = out.values.filter(!_.isNullAt(2)).toSeq
      .groupBy(_.getAs[String]("ppl_bucket"))
      .view.mapValues(_.map(_.getAs[Double]("nll"))).toMap
    for (h <- byBucket.getOrElse("head", Nil); t <- byBucket.getOrElse("tail", Nil))
      assert(h < t)
  }

  test("perplexityScoreWithLm: agrees with perplexityBuckets on the train corpus, floors OOV") {
    val corpus = docsDf(
      0L -> "the cat sat on the mat",
      1L -> "the dog sat on the mat",
      2L -> "the cat sat on the rug",
      3L -> "zyx qwv jkl pnm bcd fgh",
      4L -> "")
    val lm = TextStats.unigramLm(corpus, "doc_id", "text")
    // train-corpus scoring must equal the fused operator's nll column
    val fused = TextStats.perplexityBuckets(corpus, "doc_id", "text")
      .select("doc_id", "n_tokens", "nll").collect()
      .map(r => r.getLong(0) -> r).toMap
    val split = TextStats.perplexityScoreWithLm(corpus, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(split.size === fused.size)
    fused.foreach { case (id, f) =>
      assert(split(id).getAs[Long]("n_tokens") === f.getAs[Long]("n_tokens"))
      if (f.isNullAt(f.fieldIndex("nll"))) assert(split(id).isNullAt(split(id).fieldIndex("nll")))
      else assert(split(id).getAs[Double]("nll") === f.getAs[Double]("nll"), s"doc $id")
    }
    // held-out docs: in-vocab scores finitely better than all-OOV, which
    // scores the maximum possible nll ln(N+V)/1 (the Laplace floor l=0)
    val held = docsDf(10L -> "the cat sat", 11L -> "qqq www eee")
    val h = TextStats.perplexityScoreWithLm(held, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("nll")).toMap
    assert(h(10L) < h(11L))
    val lv = lm.agg(max("lv")).first().getLong(0)
    assert(h(11L) === BigDecimal(lv.toDouble / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("dsirWeights: target-like docs outrank off-target, brute-force exact") {
    val target = docsDf(
      100L -> "neural networks learn representations",
      101L -> "neural networks generalize well",
      102L -> "deep neural networks learn")
    val raw = docsDf(
      0L -> "neural networks learn fast",        // target-like → high
      1L -> "neural networks learn representations well", // very target-like
      2L -> "stock prices fell sharply today",   // off-target → low
      3L -> "")                                  // no features → null, unselected
    val (outDf, rollup) =
      Mixing.dsirWeightsScored(raw, target, "doc_id", "text", numBuckets = 64)
    val out = outDf.collect().map(r => r.getLong(0) -> r).toMap
    rollup.unpersist()
    assert(out.size === 4)
    val lr = (id: Long) => out(id).getAs[Double]("logratio")
    assert(lr(0L) > lr(2L) && lr(1L) > lr(2L),
      "target-like docs must outscore the off-target doc")
    assert(out(3L).getAs[Long]("n_feats") === 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("logratio")))
    assert(!out(3L).getAs[Boolean]("selected"))
    // exactly the top quartile of the 3 scored docs is selected (q75 of
    // 3 values = the max → only the argmax passes >= q75)
    val scored = Seq(0L, 1L, 2L)
    val best = scored.maxBy(lr)
    scored.foreach(id => assert(out(id).getAs[Boolean]("selected") === (id == best)))
    // brute-force replication with the same hashing + micro-nat quantization
    def toks(s: String) = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toSeq
    def grams(s: String) = { val w = toks(s); w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 64
    }
    def q(x: Double): Long = math.round(x * 1e6)
    val fT = target.collect().flatMap(r => grams(r.getString(1))).map(bucket)
    val fR = raw.collect().flatMap(r => grams(r.getString(1))).map(bucket)
    val cT = fT.groupBy(identity).map { case (k, v) => k -> v.size }
    val cR = fR.groupBy(identity).map { case (k, v) => k -> v.size }
    raw.collect().filter(r => grams(r.getString(1)).nonEmpty).foreach { r =>
      val bs = grams(r.getString(1)).map(bucket)
      val s = bs.map(b => q(math.log(cT.getOrElse(b, 0) + 1.0)) -
        q(math.log(cR(b) + 1.0))).sum
      val micro = s + bs.size * (q(math.log(fR.length + 64.0)) - q(math.log(fT.length + 64.0)))
      val want = BigDecimal(micro.toDouble / 1e6 / bs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(lr(r.getLong(0)) === want, s"doc ${r.getLong(0)}")
      assert(out(r.getLong(0)).getAs[Long]("n_feats") === bs.size.toLong)
    }
  }

  test("crossDocNgramShare flags only spans shared across documents") {
    val d = docsDf(
      0L -> "alpha beta gamma delta epsilon zeta",     // shares 5-gram prefix with 1
      1L -> "alpha beta gamma delta epsilon OTHER",    // ...but not the 2nd 5-gram
      2L -> "totally different words here now indeed", // no sharing
      3L -> "tiny doc")                                // < n words -> zero grams
    val out = Dedup.crossDocNgramShare(d, "doc_id", "text", n = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_grams") === 2)
    assert(out(0L).getAs[Long]("n_shared") === 1)     // "alpha..epsilon" in both
    assert(out(0L).getAs[Double]("dup_span_frac") === 0.5)
    assert(out(1L).getAs[Long]("n_shared") === 1)
    assert(out(2L).getAs[Long]("n_shared") === 0)
    assert(out(3L).getAs[Long]("n_grams") === 0)
    assert(out(3L).getAs[Double]("dup_span_frac") === 0.0)
  }

  test("repetition and crossDocNgramShare match brute force on seeded random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    for (_ <- 0 until 3) {
      val corpus = (0L until 12L).map(i =>
        i -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val d = docsDf(corpus: _*)
      def words(t: String): Seq[String] = t.split("\\s+").filter(_.nonEmpty).toSeq
      def grams(ws: Seq[String], n: Int): Seq[String] =
        if (ws.length < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
      def topFrac(gs: Seq[String]): Double =
        if (gs.isEmpty) 0.0
        else gs.groupBy(identity).values.map(_.size).max.toDouble / gs.size

      val rep = TextStats.repetition(d, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r).toMap
      corpus.foreach { case (id, t) =>
        val ws = words(t)
        val expDup = if (ws.isEmpty) 0.0 else 1.0 - ws.distinct.size.toDouble / ws.size
        assert(math.abs(rep(id).getAs[Double]("dup_word_frac") - expDup) < 6e-5, s"dup doc $id")
        assert(math.abs(rep(id).getAs[Double]("top_word_frac") - topFrac(ws)) < 6e-5)
        assert(math.abs(rep(id).getAs[Double]("top_bigram_frac") - topFrac(grams(ws, 2))) < 6e-5)
        assert(math.abs(rep(id).getAs[Double]("top_trigram_frac") - topFrac(grams(ws, 3))) < 6e-5)
      }

      val gramSets = corpus.map { case (id, t) => id -> grams(words(t), 2).toSet }.toMap
      val share = Dedup.crossDocNgramShare(d, "doc_id", "text", n = 2).collect()
        .map(r => r.getLong(0) -> r).toMap
      corpus.foreach { case (id, _) =>
        val mine = gramSets(id)
        val others = gramSets.filter(_._1 != id).values.flatten.toSet
        val shared = mine.count(others.contains)
        assert(share(id).getAs[Long]("n_grams") === mine.size.toLong, s"n_grams doc $id")
        assert(share(id).getAs[Long]("n_shared") === shared.toLong, s"n_shared doc $id")
      }
    }
  }

  test("scrubPii redacts and counts emails, IPs, phone numbers") {
    import spark.implicits._
    val d = Seq(
      (0L, "mail me at a.b+c@foo-bar.example.com or 192.168.0.1 / 555-123-4567 thanks"),
      (1L, "clean text with no contact details at all"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Scrub.scrubPii(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_emails") === 1)
    assert(out(0L).getAs[Long]("n_ips") === 1)
    assert(out(0L).getAs[Long]("n_phones") === 1)
    assert(out(0L).getAs[String]("clean") ===
      "mail me at <EMAIL> or <IP> / <PHONE> thanks")
    assert(out(1L).getAs[Long]("n_emails") === 0)
    assert(out(1L).getAs[String]("clean") ===
      "clean text with no contact details at all")
  }

  // ---------- multimodal ----------

  test("multimodal plumbing: sniffing, checksums, fake decode, frame sampling") {
    val d = docsDf(0L -> "hello image", 1L -> "hello audio", 2L -> "x")
    val media = Multimodal.synthesizeFromText(d, "doc_id", "text")
    val stats = Multimodal.payloadStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats(0L).getAs[String]("format") === "png")
    assert(stats(1L).getAs[String]("format") === "jpeg")
    assert(stats(0L).getAs[Int]("n_bytes") === 8 + "hello image".length)
    assert(stats(1L).getAs[Int]("n_bytes") === 4 + "hello audio".length)

    val feats = Multimodal.fakeDecodeFeatures(spark, media, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(0L).length === 16)
    val feats2 = Multimodal.fakeDecodeFeatures(spark, media, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === feats2)

    // doc 0: n_frames = 10 -> frames 0,7 ; doc 1: 20 -> 0,7,14 ; doc 2: 30 -> 0,7,14,21,28
    val frames = Multimodal.frameSamplePlan(media, everyK = 7).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getInt(1)).sorted.toSeq }
    assert(frames(0L) === Seq(0, 7))
    assert(frames(1L) === Seq(0, 7, 14))
    assert(frames(2L) === Seq(0, 7, 14, 21, 28))
  }

  test("mixing: stratified sampling is deterministic and rate-respecting; packing bins are stable") {
    import spark.implicits._
    import graft.pipeline.Mixing
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr",
        Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")

    // rates are hit within hash-threshold tolerance, and the same seed
    // reproduces the exact same sample
    val s1 = Mixing.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0), defaultRate = 0.0)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") === docs.filter(col("lang") === "zh").count())
    assert(!byLang.contains("fr"))
    val enRate = byLang("en").toDouble / docs.filter(col("lang") === "en").count()
    assert(math.abs(enRate - 0.5) < 0.1, s"en rate $enRate")
    val s2 = Mixing.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0), defaultRate = 0.0)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet
      === s2.select("doc_id").collect().map(_.getLong(0)).toSet)

    // packing: bins respect the cumulative-budget rule and are invariant
    // to the session's partition count (range-partitioned prefix sum)
    val packed = Mixing.sequencePack(docs, "doc_id", "text", budgetTokens = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var cum = 0L
    packed.foreach { case (_, n, bin, off) =>
      assert(bin === cum / 50, s"bin mismatch at cum=$cum")
      assert(off === cum % 50)
      cum += n
    }
    val one = docs.coalesce(1)
    val packed1 = Mixing.sequencePack(one, "doc_id", "text", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(packed1.toSeq === packed.toSeq)
  }

  test("mixing: packing is deterministic on sparse clustered ids (regression: sampled range bounds)") {
    import spark.implicits._
    import graft.pipeline.Mixing
    // sparse 64-bit-ish ids in two far-apart clusters: equal-width
    // buckets are heavily skewed, and sampled repartitionByRange bounds
    // (the old implementation) would differ between the partSums action
    // and the final join. The bucket must be a pure function of the id.
    val ids = (0L until 500L).map(i => 3_000_000_000L + i * 17) ++
      (0L until 500L).map(i => 9_000_000_000_000L + i * 101)
    val docs = ids.map(i => (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(16)
    val df = Mixing.sequencePack(docs, "doc_id", "text", budgetTokens = 37L)
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val b = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    var cum = 0L
    a.foreach { case (_, n, bin, off) =>
      assert(bin === cum / 37 && off === cum % 37, s"at cum=$cum")
      cum += n
    }
    // empty input keeps the 4-column schema with zero rows
    assert(Mixing.sequencePack(docs.limit(0), "doc_id", "text", 37L).count() === 0L)

    // null-id rows have no position in the id order — dropped up front,
    // never an NPE in the bucket-offset collect; the non-null packing is
    // unchanged by their presence
    val withNulls = docs.unionByName(
      Seq(("x y z"), ("a b")).toDF("text")
        .withColumn("doc_id", lit(null).cast("long"))
        .select("doc_id", "text"))
    val c = Mixing.sequencePack(withNulls, "doc_id", "text", 37L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(c.toSeq === a.toSeq)
  }

  test("mixing: contamination finds planted eval overlap and ignores disjoint docs") {
    import spark.implicits._
    import graft.pipeline.Mixing
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (120L, "completely different evaluation material here entirely now")
    ).toDF("doc_id", "text")
    val trainDocs = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
      (2L, "no overlap with anything in that benchmark set at all"),
      (3L, "the quick brown fox appears but the rest differs completely here")
    ).toDF("doc_id", "text")
    val hits = Mixing.contamination(trainDocs, evalDocs, "doc_id", "text",
      shingleSize = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.exists { case (d, e, n) => d == 1L && e == 100L && n >= 2 })
    assert(!hits.exists(_._1 == 2L))
    assert(!hits.exists(_._1 == 3L)) // one shared 5-gram window < minShared
  }

  test("decontaminate flags exactly the planted-overlap train docs") {
    val evalText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d = docsDf(
      0L -> s"training prose with a verbatim leak $evalText inside the middle of it",
      1L -> "completely clean training document with original words only here now",
      2L -> evalText)  // doc 2 is the eval split below
    val out = graft.pipeline.Mixing.decontaminate(
      d.filter(col("doc_id") < 2), d.filter(col("doc_id") === 2),
      "doc_id", "text", shingleSize = 5, minShared = 2, maxEvalShingleDf = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L)._1 === true, "leaked doc must be flagged")
    assert(out(0L)._2 === 1L && out(0L)._3 >= 2L)
    assert(out(1L) === ((false, 0L, 0L)), "clean doc passes with zeroed diagnostics")
  }

  test("real image decode: 2x2 PNG/JPEG through javax.imageio; stub only as fallback") {
    import spark.implicits._
    def imageBytes(format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x000000) // black
      img.setRGB(1, 0, 0xFFFFFF) // white
      img.setRGB(0, 1, 0x808080) // gray 128
      img.setRGB(1, 1, 0xFF0000) // red
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    val media = Seq(
      (0L, imageBytes("png")),
      (1L, imageBytes("jpg")),
      // PNG magic followed by garbage: undecodable -> stub fallback
      (2L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4, 5))
    ).toDF("doc_id", "payload")

    val out = Multimodal.decodeFeatures(spark, media, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1), r.getString(2))).toMap

    // expected Rec.601 luminances: black=0, white=1, gray=128/255, red=0.299
    val expected = Seq(0.0f, 1.0f, 128.0f / 255.0f, 0.299f)
    val (pngFeats, pngDec) = out(0L)
    assert(pngDec === "imageio")
    pngFeats.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-3, s"png: $got vs $want") }

    val (jpgFeats, jpgDec) = out(1L)
    assert(jpgDec === "imageio")
    // JPEG is lossy: loose tolerance
    jpgFeats.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.15, s"jpeg: $got vs $want") }

    val (stubFeats, stubDec) = out(2L)
    assert(stubDec === "stub")
    val fake = Multimodal.fakeDecodeFeatures(
      spark, media.filter(col("doc_id") === 2), dim = 4).collect()(0).getSeq[Float](1)
    assert(stubFeats === fake)
  }

  test("resizeThumbnails: real decode+scale+re-encode, aspect kept, bad payload flagged") {
    import spark.implicits._
    def gradient(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 255 / math.max(w - 1, 1)) << 16) | (y * 255 / math.max(h - 1, 1)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (0L, gradient(128, 64)),  // landscape 2:1 -> 64x32
      (1L, gradient(16, 48)),   // portrait, over on one side -> 21x64? no: max side 48 <= 64 -> unchanged dims
      (2L, gradient(200, 200)), // square -> 64x64
      (3L, Array[Byte](1, 2, 3))) // garbage
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeThumbnails(spark, media, maxSide = 64).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("thumbnail"), r.getInt(2), r.getInt(3),
          r.getBoolean(4)))).toMap
    assert(out(0L)._2 === 64 && out(0L)._3 === 32 && out(0L)._4)
    assert(out(1L)._2 === 16 && out(1L)._3 === 48) // within bounds: dims kept
    assert(out(2L)._2 === 64 && out(2L)._3 === 64)
    assert(out(3L)._1 === null && !out(3L)._4)
    // thumbnails are valid PNGs that decode to the reported dimensions
    for (id <- Seq(0L, 1L, 2L)) {
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(id)._1))
      assert(back.getWidth === out(id)._2 && back.getHeight === out(id)._3)
    }
  }

  test("chunkDocuments: stride windows, exactly-once tail, short/empty docs") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val d = docsDf(0L -> words, 1L -> "a b c", 2L -> "", 3L -> "!!!")
    val out = Mixing.chunkDocuments(d, "doc_id", "text", chunkTokens = 50, stride = 25)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    // 100 tokens, chunk 50, stride 25 -> starts 0,25,50: tail covered
    // once, no redundant [75,100) sub-window of [50,100)
    assert(out.keys.count(_._1 == 0L) === 3)
    assert(out((0L, 0L))._1 === 50L)
    assert(out((0L, 0L))._2.startsWith("w1 w2 ") && out((0L, 0L))._2.endsWith(" w50"))
    assert(out((0L, 2L))._2.startsWith("w51 ") && out((0L, 2L))._2.endsWith(" w100"))
    // short doc: one short chunk; token-free docs: no rows
    assert(out((1L, 0L)) === ((3L, "a b c")))
    assert(!out.keys.exists(_._1 == 2L) && !out.keys.exists(_._1 == 3L))
  }

  // ---------- exact-substring duplicate spans ----------

  /** Brute-force twin: flag every L-window appearing verbatim in another
    * doc, merge overlapping/adjacent windows. */
  private def bruteSpans(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - L).map(p => (id, p, ts.slice(p, p + L).mkString(" ")))
    }
    val crossDoc = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    wins.filter(w => crossDoc(w._3)).groupBy(_._1).flatMap { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      val islands = ps.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head.head + L =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }
      islands.map(isl => (id, isl.min.toLong, isl.max.toLong + L, isl.size.toLong))
    }.toSet
  }

  test("duplicateSpans: planted shared runs merge into maximal spans, unique docs stay clean") {
    val shared = (1 to 8).map(i => s"common$i").mkString(" ")
    val shared2 = (1 to 8).map(i => s"other$i").mkString(" ")
    val d = docsDf(
      0L -> s"unique zero prefix $shared unique zero suffix tokens here now",
      1L -> s"different one start $shared and also $shared2 trailing words",
      2L -> s"$shared2 leading this time with completely fresh unique middle",
      3L -> "totally unrelated text with no duplicated windows at all present")
    val L = 4
    val out = Dedup.duplicateSpans(d, "doc_id", "text", windowTokens = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = bruteSpans(Seq(
      0L -> s"unique zero prefix $shared unique zero suffix tokens here now",
      1L -> s"different one start $shared and also $shared2 trailing words",
      2L -> s"$shared2 leading this time with completely fresh unique middle",
      3L -> "totally unrelated text with no duplicated windows at all present"), L)
    assert(out === expect)
    assert(!out.exists(_._1 == 3L), "unique doc must have no spans")
    // doc 1 carries two distinct shared runs far enough apart to stay split
    assert(out.count(_._1 == 1L) === 2)
  }

  test("duplicateSpans matches brute force on seeded random corpora with planted overlaps") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val base = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val run = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (0L until 20L).map { i =>
        val body = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // a third of docs get the planted run spliced in
        i -> (if (i % 3 == 0) s"$body $run ${body.take(40)}" else s"$body $base".take(160))
      }
      val L = 5
      val out = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(out === bruteSpans(docs, L), s"trial $trial")
    }
  }

  test("gopherRules: each rule fires on its targeted fixture") {
    val good = (("the be to of and that have with " * 8) + "normal prose words here").trim
    val d = docsDf(
      0L -> good,                                    // passes everything
      1L -> "too short",                             // word count < 50
      2L -> (("a b c d " * 20) + "the be of and"),   // mean word length < 3
      3L -> good.replace("prose", "### ## # ####"),  // symbols (still passes ratio? see below)
      4L -> (Seq.fill(20)("- bullet item").mkString("\n") + "\nthe be to of and that have with " * 3),
      5L -> ("völlig fremde wörter ohne englische stopp " * 10))  // stop_hits < 2
    val out = TextStats.gopherRules(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("pass"), "clean doc must pass")
    assert(!out(1L).getAs[Boolean]("r_word_count"))
    assert(!out(2L).getAs[Boolean]("r_mean_word_len"))
    assert(!out(5L).getAs[Boolean]("r_stop"))
    // doc 4: 20 of its lines are bullets → bullet_frac over 0.9 only if
    // bullets dominate; with the appended prose lines it sits below — the
    // assertion pins the measured fraction rather than the verdict
    val bf = out(4L).getAs[Double]("bullet_frac")
    assert(bf > 0.5 && bf <= 1.0, s"bullet_frac $bf")
    // metric sanity on the clean doc
    val m = out(0L)
    assert(m.getAs[Long]("n_words") >= 50)
    assert(m.getAs[Double]("alpha_frac") >= 0.8)
    assert(m.getAs[Long]("stop_hits") >= 2)
  }

  test("tokenBudgetMix: rates respect weights, cap at 1.0, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (0L until 600L).map { i =>
      val words = Seq.fill(20 + rnd.nextInt(10))(s"w${rnd.nextInt(50)}").mkString(" ")
      (i, s"s${i % 3}", words)
    }.toDF("doc_id", "src", "text")
    val out = Mixing.tokenBudgetMix(docs, "doc_id", "text", "src",
      Map("s0" -> 4.0, "s1" -> 1.0), totalTokens = 6000L, seed = 7L)
    val rows = out.collect()
    // s2 has weight 0 → dropped entirely
    assert(!rows.exists(_.getString(1) == "s2"))
    val rates = rows.map(r => r.getString(1) -> r.getAs[Double]("rate")).toMap
    // s0 target = 4/5*6000 = 4800 > its ~4900+-token mass? rate near 1 or capped;
    // s1 target = 1200 → rate well below s0's
    assert(rates("s0") > rates("s1"), s"rates $rates")
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    // deterministic: second run identical
    val again = Mixing.tokenBudgetMix(docs, "doc_id", "text", "src",
      Map("s0" -> 4.0, "s1" -> 1.0), totalTokens = 6000L, seed = 7L).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
    // expected token mass ≈ target within sampling noise (rates are exact;
    // the hash threshold is the only randomness)
    val s1kept = rows.filter(_.getString(1) == "s1").map(_.getLong(2)).sum
    assert(s1kept > 300 && s1kept < 2400, s"s1 kept tokens $s1kept vs target 1200")
  }

  test("fixedSizeSample: exact per-stratum counts, hash-rank stability") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "stratum")
      // small stratum with fewer members than k
      .unionAll(Seq((9000L, "tiny"), (9001L, "tiny")).toDF("doc_id", "stratum"))
    val out = Mixing.fixedSizeSample(docs, "doc_id", "stratum", k = 30).collect()
    val byStratum = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert((0 until 4).forall(i => byStratum(s"s$i") == 30), s"$byStratum")
    assert(byStratum("tiny") == 2) // min(k, |stratum|)
    // ranks are 1..n by hash order, dense
    val ranks = out.filter(_.getString(1) == "s0")
      .map(_.getAs[Long]("sample_rank")).sorted
    assert(ranks.toSeq === (1L to 30L))
    // growing a stratum only swaps members by hash rank: the survivors
    // of the smaller corpus that keep rank <= k are unchanged
    val grown = docs.unionAll(
      (10000L until 10100L).map(i => (i, "s0")).toDF("doc_id", "stratum"))
    val before = out.filter(_.getString(1) == "s0").map(_.getLong(0)).toSet
    val after = Mixing.fixedSizeSample(grown, "doc_id", "stratum", k = 30)
      .filter(col("stratum") === "s0").collect().map(_.getLong(0)).toSet
    assert(after.subsetOf(before ++ (10000L until 10100L).toSet))
    // determinism across partition layouts
    val rep = Mixing.fixedSizeSample(docs.repartition(13), "doc_id", "stratum", 30)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("sample_rank"))).sorted
    assert(rep.toSeq === out.map(r => (r.getLong(0), r.getAs[Long]("sample_rank"))).sorted.toSeq)
  }

  test("fixedSizeSampleSalted == fixedSizeSample row-for-row (the hot-stratum path)") {
    import spark.implicits._
    // one hot stratum (90% of rows) + several small ones, k > |small|
    val docs = ((0L until 2000L).map(i => (i, "hot")) ++
      (10000L until 10040L).map(i => (i, s"s${i % 3}"))).toDF("doc_id", "stratum")
    val plain = Mixing.fixedSizeSample(docs, "doc_id", "stratum", k = 50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("sample_rank")))
      .sortBy(t => (t._2, t._3))
    val salted = Mixing.fixedSizeSampleSalted(docs, "doc_id", "stratum", k = 50, salts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("sample_rank")))
      .sortBy(t => (t._2, t._3))
    assert(salted.toSeq === plain.toSeq,
      "salted two-stage top-k must be row-identical to the plain sampler")
  }

  test("removeDuplicateSpans cuts exactly the flagged token ranges") {
    val shared = (1 to 8).map(i => s"common$i").mkString(" ")
    val rows = Seq(
      0L -> s"alpha beta gamma $shared delta epsilon",
      1L -> s"$shared zeta eta theta iota kappa lambda",
      2L -> "nothing duplicated in this document at all whatsoever")
    val out = Dedup.removeDuplicateSpans(docsDf(rows: _*), "doc_id", "text", windowTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val spans = bruteSpans(rows, 4)
    rows.foreach { case (id, text) =>
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      val cut = spans.filter(_._1 == id)
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !cut.exists(s => i >= s._2 && i < s._3) => t }
      assert(out(id)._1 === kept.mkString(" "), s"doc $id text")
      assert(out(id)._2 === kept.size.toLong, s"doc $id count")
    }
    assert(out(2L)._1 === "nothing duplicated in this document at all whatsoever")
    assert(out(0L)._2 < 14, "doc 0 must have lost its shared run")
  }

  /** Brute-force union-find twin for duplicateClusters. */
  private def ufClusters(n: Long, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("duplicateClusters: chains, triangles, singletons resolve to min-id components") {
    import spark.implicits._
    val docs = (0L until 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // component {0,1,2,3} as a thin chain (transitive closure required),
    // {4,5,6} as a triangle (redundant edges), {7,8} a pair, 9/10/11 singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (8L, 7L)).toDF("a", "b")
    val out = Dedup.duplicateClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val expect = ufClusters(12L, Seq((0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6), (8, 7)))
    (0L until 12L).foreach { i =>
      assert(out(i)._1 === expect(i), s"cluster of $i")
      assert(out(i)._2 === (expect(i) == i), s"keep of $i")
    }
  }

  test("duplicateClusters matches union-find on seeded random pair graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60L
      val nEdges = 20 + trial * 25
      val pairs = Seq.fill(nEdges)((rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n))
        .filter { case (a, b) => a != b }
      val docs = (0L until n).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val out = Dedup.duplicateClusters(docs, "doc_id", pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = ufClusters(n, pairs)
      (0L until n).foreach(i => assert(out(i) === expect(i), s"trial $trial node $i"))
    }
  }

  test("clusterSurvivors keeps the max-score member, ties break to min id") {
    import spark.implicits._
    val clusters = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),   // family rooted at 0
      (3L, 3L), (4L, 3L),             // family rooted at 3 (tie scores)
      (5L, 5L))                        // singleton
      .toDF("doc_id", "cluster_id")
    val scores = Seq(0L -> 0.2, 1L -> 0.9, 2L -> 0.5, 3L -> 0.7, 4L -> 0.7, 5L -> 0.1)
      .toDF("doc_id", "score")
    val out = Dedup.clusterSurvivors(clusters, scores)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(0L) === (1L, false))
    assert(out(1L) === (1L, true), "highest score wins")
    assert(out(3L) === (3L, true), "tie breaks to min id")
    assert(out(4L) === (3L, false))
    assert(out(5L) === (5L, true), "singleton keeps itself")
  }

  test("duplicateClusters on an empty pair set labels every doc a singleton") {
    import spark.implicits._
    val docs = (0L until 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = Dedup.duplicateClusters(docs, "doc_id", empty).collect()
    assert(out.length === 5)
    assert(out.forall(r => r.getLong(0) == r.getLong(1) && r.getBoolean(2)))
  }

  // ---------- simhash hamming pairs ----------

  test("simhashDedupPairs finds exactly the brute-force hamming<=3 pairs (pigeonhole completeness)") {
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 40).map(i => s"term$i")
    def doc(words: Int) = Seq.fill(words)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // near-identical docs (one word swapped) + unrelated docs
    val bases = (0 until 8).map(_ => doc(40))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      val sw = b.split(" ").toVector.updated(rnd.nextInt(40), vocab(rnd.nextInt(vocab.length)))
      Seq((i * 2L, b), (i * 2L + 1, sw.mkString(" ")))
    } ++ (100L until 110L).map(i => (i, doc(40)))
    val d = docsDf(rows: _*)
    // brute force over the fingerprints themselves
    val fps = Dedup.simhash(d, "doc_id", "text", bits = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      hm = java.lang.Long.bitCount(fps(a) ^ fps(b)) if hm <= 3
    } yield (a, b) -> hm.toLong).toMap
    // default combo tables (6 blocks, C(6,3)=20 tables of 30-bit keys)
    // and the degenerate single-block scheme (4 blocks, comboSize 1)
    // must BOTH find exactly the brute-force set
    Seq(6, 4).foreach { nb =>
      val out = Dedup.simhashDedupPairs(d, "doc_id", "text",
          bits = 60, nBlocks = nb, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(out === brute, s"nBlocks=$nb")
    }
    assert(brute.nonEmpty, "planted near-identical docs must land within hamming 3")
  }

  // ---------- C4 line clean + boilerplate ----------

  test("c4Clean: line rules, corpus boilerplate df, and page poisons each fire") {
    val nav = "sign up for the newsletter right now."
    val good = (i: Int) => s"this sentence number $i has plenty of words in it."
    val d = docsDf(
      // 3 kept sentences + nav line (boilerplate: appears in 3 docs)
      0L -> s"${good(0)}\n${good(1)}\n${good(2)}\n$nav",
      1L -> s"${good(3)}\n${good(4)}\n${good(5)}\n$nav",
      2L -> s"${good(6)}\n${good(7)}\n${good(8)}\n$nav",
      // no terminal punctuation / too short / javascript mention
      3L -> s"no terminal punctuation on this line\nshort one.\nplease enable javascript to continue.\n${good(9)}\n${good(10)}\n${good(11)}",
      // page poisons
      4L -> s"${good(12)}\n${good(13)}\n${good(14)}\nlorem ipsum dolor sit amet.",
      5L -> s"${good(15)}\n${good(16)}\n${good(17)}\nvar f = function() {")
    val out = graft.pipeline.Boilerplate
      .c4Clean(d, "doc_id", "text", minLineWords = 5, maxLineDf = 2, minKeptLines = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // nav line is rule-eligible but recurs in 3 docs > maxLineDf=2
    (0L to 2L).foreach { i =>
      assert(out(i).getAs[Long]("n_kept") === 3L, s"doc $i")
      assert(out(i).getAs[Long]("n_dropped_boiler") === 1L, s"doc $i")
      assert(out(i).getAs[Boolean]("page_pass"), s"doc $i")
      assert(!out(i).getAs[String]("clean_text").contains("newsletter"))
    }
    // doc 3: three rule-dropped lines, three kept, page passes
    assert(out(3L).getAs[Long]("n_dropped_rule") === 3L)
    assert(out(3L).getAs[Long]("n_kept") === 3L)
    assert(out(3L).getAs[Boolean]("page_pass"))
    assert(out(3L).getAs[String]("clean_text") ===
      Seq(9, 10, 11).map(i => s"this sentence number $i has plenty of words in it.").mkString("\n"))
    // page poisons: lorem ipsum / curly brace fail the page regardless of kept count
    assert(!out(4L).getAs[Boolean]("page_pass"))
    assert(!out(5L).getAs[Boolean]("page_pass"))
    assert(out(5L).getAs[Long]("n_kept") === 3L, "brace line itself is rule-dropped")
  }

  test("c4Clean: doc with no surviving lines yields empty text and page_pass false") {
    val d = docsDf(7L -> "all lowercase no punctuation here\nanother bare line")
    val r = graft.pipeline.Boilerplate.c4Clean(d, "doc_id", "text").collect()(0)
    assert(r.getAs[String]("clean_text") === "")
    assert(r.getAs[Long]("n_kept") === 0L)
    assert(!r.getAs[Boolean]("page_pass"))
  }

  // ---------- incremental near-dedup ----------

  test("incrementalDedupPairs equals batch pairs restricted to new-doc endpoints") {
    val rnd = new scala.util.Random(7)
    def mutate(base: Seq[String], k: Int): String = {
      val a = base.toArray
      (0 until k).foreach(_ => a(rnd.nextInt(a.length)) = s"w${rnd.nextInt(50)}")
      a.mkString(" ")
    }
    // 6 families of 4 near-dup docs + 16 unique docs, ids interleaved so
    // both strata hold family members
    val docs = (0 until 6).flatMap { f =>
      val base = Seq.fill(30)(s"tok${rnd.nextInt(40)}f$f")
      (0 until 4).map(r => (f * 10L + r, mutate(base, 2)))
    } ++ (100L until 116L).map(i => (i, Seq.fill(30)(s"u${rnd.nextInt(5000)}i$i").mkString(" ")))
    val d = docsDf(docs: _*)
    val isNew = (id: Long) => id % 10 >= 2 // 2 of each family's 4 are "new"
    val corpus = d.filter(col("doc_id") % 10 < 2)
    val incoming = d.filter(col("doc_id") % 10 >= 2)
    val incr = Dedup.incrementalDedupPairs(corpus, incoming, "doc_id", "text",
        shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashDedupPairs(d, "doc_id", "text",
        shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => isNew(p._1) || isNew(p._2))
    assert(incr === batch)
    assert(incr.nonEmpty, "planted families must collide")
    assert(incr.exists(p => !isNew(p._1) || !isNew(p._2)), "new-vs-corpus pairs present")
  }

  test("collocations and klDrift flow empty corpora through, not an NPE") {
    import spark.implicits._
    import graft.pipeline.TextStats
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.collocations(empty, "doc_id", "text").count() === 0)
    val grouped = Seq.empty[(String, String)].toDF("src", "text")
    val drift = TextStats.klDrift(grouped, "src", "text", "a", "b").collect()(0)
    assert(drift.getLong(0) === 0L) // zero terms, null KL sums — no crash
  }

  test("collocations: planted collocation tops the PMI ranking; min-count guard") {
    import spark.implicits._
    import graft.pipeline.TextStats
    val rnd = new scala.util.Random(11)
    val filler = (0 until 40).map(i => s"f$i")
    // "san francisco" always adjacent; "and"/"the" frequent everywhere
    val docs = (0 until 80).map { i =>
      val words = Seq.fill(12)(filler(rnd.nextInt(filler.size))) ++
        Seq("the", "and") ++ (if (i % 2 == 0) Seq("san", "francisco") else Nil)
      (i.toLong, rnd.shuffle(words.take(14)).mkString(" ") +
        (if (i % 2 == 0) " san francisco" else ""))
    }.toDF("doc_id", "text")
    val top = TextStats.collocations(docs, "doc_id", "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(top.head._1 === "san" && top.head._2 === "francisco",
      s"expected planted collocation first, got ${top.head}")
    assert(top.map(_._3).toSeq === top.map(_._3).sortBy(-_.toDouble).toSeq,
      "rows ordered by pmi desc")
  }

  test("hardNegatives: same-label vectors never rank; agrees with brute force") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val docs = (0 until 100).map(i =>
      (i.toLong, vec(), s"lab${i % 4}")).toDF("vec_id", "embedding", "label")
    val qs = docs.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qemb"), $"label".as("qlabel"))
    val hn = Similarity.hardNegatives(docs, qs, 5).collect()
    assert(hn.length === 15)
    // no result shares its anchor's label (anchor i has label lab{i%4})
    assert(hn.forall(r => r.getString(2) != s"lab${r.getLong(0) % 4}"))
    // subset of the unfiltered brute-force ranking restricted to other labels
    val bf = Similarity.bruteForceTopK(docs, qs.drop("qlabel"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hn.forall(r => bf.contains((r.getLong(0), r.getLong(1)))))
    // index-backed path probing ALL centroids == brute path exactly
    val ann = Similarity.hardNegativesAnn(spark, docs, qs, 5,
        dim = 16, numCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(ann.sortBy(x => (x._1, x._2)) ===
      hn.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(x => (x._1, x._2)),
      "exhaustive-probe ANN hard negatives must equal brute force")
    // dispatcher: a threshold below the corpus size routes to the ANN
    // path and still returns k rows per query with no same-label rows
    val routed = Similarity.hardNegatives(docs, qs, 5, annThresholdDocs = 50L)
      .collect()
    assert(routed.length === 15)
    assert(routed.forall(r => r.getString(2) != s"lab${r.getLong(0) % 4}"))
  }

  test("prefixFilterPairs == brute-force all-pairs Jaccard (exact, no false negatives)") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 60).map(i => s"w$i")
    def seqOf(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    // planted near-dup families (shared word-sequence prefix) + noise
    val dups = (0 until 12).flatMap { f =>
      val base = seqOf(15 + rnd.nextInt(8))
      Seq((f * 10).toLong -> base,
        (f * 10 + 1).toLong -> (base.dropRight(2) ++ seqOf(2)))
    }
    val noise = (500 until 540).map(i => i.toLong -> seqOf(12))
    val docs = (dups ++ noise)
      .map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5)
      .select("a", "b", "jaccard_bp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same 3-shingle sets
    val sets = (dups ++ noise).toMap.view.mapValues(
      ws => ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = sets(a).intersect(sets(b)).size
      bp = inter.toLong * 10000 / (sets(a).size + sets(b).size - inter)
      if bp >= 5000
    } yield (a, b, bp)).toSet
    assert(got === want)
    assert(got.nonEmpty, "planted families must qualify")
  }

  test("prefixFilterPairsAtScale == prefixFilterPairs (mirror families, all columns)") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 50).map(i => s"w$i")
    def seqOf(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    // exact mirror families (the shape that makes the raw form quadratic
    // at corpus scale), incl. case/whitespace variants that normText —
    // but not raw string equality — collapses
    val mirrors = (0 until 5).flatMap { f =>
      val base = seqOf(14 + rnd.nextInt(6)).mkString(" ")
      Seq((f * 100).toLong -> base,
        (f * 100 + 1).toLong -> base,
        (f * 100 + 2).toLong -> ("  " + base.toUpperCase + " "),
        (f * 100 + 3).toLong -> base.replace(" ", "   "))
    }
    // near-dup cross-family pairs: members of one mirror family must pair
    // with members of a DIFFERENT family at 0.5 <= J < 1
    val nears = (0 until 5).map { f =>
      val famBase = mirrors(f * 4)._2
      (f * 100 + 50).toLong ->
        (famBase.split(" ").dropRight(2) ++ seqOf(2)).mkString(" ")
    }
    // a duplicated SHORT family (< shingleSize tokens -> empty shingle
    // set): the raw form never pairs these, so neither may atScale
    val shorts = Seq(9000L -> "tiny doc", 9001L -> "tiny doc", 9002L -> "TINY  DOC")
    val noise = (500 until 530).map(i => i.toLong -> seqOf(12).mkString(" "))
    val docs = (mirrors ++ nears ++ shorts ++ noise).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "n_a", "n_b", "n_shared", "jaccard_bp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val raw = rows(Dedup.prefixFilterPairs(docs, "doc_id", "text",
      shingleSize = 3, minJaccard = 0.5))
    val scaled = rows(Dedup.prefixFilterPairsAtScale(docs, "doc_id", "text",
      shingleSize = 3, minJaccard = 0.5))
    assert(scaled === raw)
    // the planted structure actually exercised every leg
    val within = raw.filter { case (a, b, _, _, _, bp) =>
      a / 100 == b / 100 && bp == 10000L }
    assert(within.size >= 5 * 6, "mirror families must all-pair at J=1")
    assert(raw.exists { case (a, b, _, _, _, bp) =>
      (a % 100 == 50 || b % 100 == 50) && bp < 10000L },
      "near-dup members must cross-pair below J=1")
    assert(!raw.exists { case (a, b, _, _, _, _) => a >= 9000L || b >= 9000L },
      "sub-shingle-length dup family must never pair")
  }

  test("prefixFilterPairsAtScale == raw on randomized corpora (6 seeds)") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // randomized structure: per seed, a corpus mixing random docs,
    // exact-dup families of random size (with whitespace/case
    // mutations), partial-overlap near-dups, and short docs — the
    // closure's edge cases drawn fresh each time instead of from one
    // hand-planted layout
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 1000 + 7)
      val vocab = (0 until 20 + rnd.nextInt(40)).map(i => s"w$i")
      def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      var id = 0L
      def nextId() = { id += 1; id }
      val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      for (_ <- 0 until 6 + rnd.nextInt(6)) {
        rnd.nextInt(4) match {
          case 0 => // exact family, size 2-5, with variants
            val base = words(3 + rnd.nextInt(18)).mkString(" ")
            for (j <- 0 until 2 + rnd.nextInt(4)) {
              val v = rnd.nextInt(3) match {
                case 0 => base
                case 1 => " " + base.toUpperCase + "  "
                case 2 => base.replace(" ", if (j % 2 == 0) "  " else " ")
              }
              docs += nextId() -> v
            }
          case 1 => // near-dup pair (suffix swapped)
            val base = words(8 + rnd.nextInt(12))
            docs += nextId() -> base.mkString(" ")
            docs += nextId() ->
              (base.dropRight(1 + rnd.nextInt(2)) ++ words(2)).mkString(" ")
          case 2 => // short docs (possibly duplicated, < shingle len)
            val s = words(1 + rnd.nextInt(2)).mkString(" ")
            docs += nextId() -> s
            if (rnd.nextBoolean()) docs += nextId() -> s
          case 3 => // noise
            docs += nextId() -> words(5 + rnd.nextInt(10)).mkString(" ")
        }
      }
      val df = docs.toSeq.toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) = d
        .select("a", "b", "n_a", "n_b", "n_shared", "jaccard_bp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val raw = rows(Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 0.5))
      val scaled = rows(Dedup.prefixFilterPairsAtScale(df, "doc_id", "text", 3, 0.5))
      assert(scaled === raw, s"seed $seed diverged (corpus ${docs.size} docs)")
    }
  }

  test("weightedSample: deterministic, k per stratum, weight-proportional inclusion") {
    import spark.implicits._
    import graft.pipeline.Mixing
    // two strata; in "s", docs 0..99 have weight 1 and 100..199 weight 50
    val docs = ((0 until 200).map(i => (i.toLong, "s", if (i < 100) 1 else 50)) ++
      (1000 until 1040).map(i => (i.toLong, "t", 10))).toDF("doc_id", "g", "w")
    val sample = Mixing.weightedSample(docs, "doc_id", "g", "w", k = 30)
    val rows = sample.collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(rows.count(_._1 == "s") === 30)
    assert(rows.count(_._1 == "t") === 30, "k > stratum size keeps everything")
    // the weight-50 half should dominate the weight-1 half decisively
    val heavy = rows.count { case (g, id) => g == "s" && id >= 100 }
    assert(heavy >= 25, s"expected heavy docs to dominate, got $heavy/30")
    // identical across recomputations and partitionings
    val again = Mixing.weightedSample(docs.repartition(7), "doc_id", "g", "w", k = 30)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(rows.sorted === again.sorted)
  }

  test("vocabulary: df pruning and contiguous ids in (df desc, term) order") {
    import spark.implicits._
    import graft.pipeline.TextStats
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "apple banana"), (3L, "apple banana"),
      (4L, "apple date"), (5L, "apple egg egg"), (6L, "apple fig"),
      (7L, "apple grape"), (8L, "apple hat"), (9L, "apple ink"),
      (10L, "apple jam")).toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, "doc_id", "text", minDf = 2L, maxDfRatio = 0.5)
      .orderBy("vocab_id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // apple df=10 > 0.5*10 pruned; banana df=3 kept; hapaxes pruned
    assert(v.toSeq === Seq(("banana", 3L, 1L)))
    val v2 = TextStats.vocabulary(docs, "doc_id", "text", minDf = 1L, maxDfRatio = 1.0)
      .orderBy("vocab_id").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(v2.map(_._2).toSeq === (1L to v2.length).toSeq, "ids contiguous from 1")
    assert(v2.head._1 === "apple", "highest-df term gets id 1")
  }

  test("klDrift: zero for identical slices, positive and asymmetric for shifted ones") {
    import spark.implicits._
    import graft.pipeline.TextStats
    val same = Seq(("a", "x y z x"), ("b", "x y z x")).toDF("src", "text")
    val r0 = TextStats.klDrift(same, "src", "text", "a", "b").collect()(0)
    assert(r0.getLong(1) === 0L && r0.getLong(2) === 0L)
    val shifted = (Seq(("a", "x x x x x x y")) ++ Seq(("b", "y y y y y y x")))
      .toDF("src", "text")
    val r1 = TextStats.klDrift(shifted, "src", "text", "a", "b").collect()(0)
    assert(r1.getLong(1) > 0L && r1.getLong(2) > 0L, "shifted distributions diverge")
  }

  test("hashSplit: ppm-accurate, growth-stable, remainder is NULL") {
    import spark.implicits._
    val docs = (0L until 10000L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    val fr = Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)
    val counts = Mixing.hashSplit(docs, "doc_id", fr)
      .groupBy("split").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(math.abs(counts(Some("train")) - 8000L) < 200L, s"$counts")
    assert(math.abs(counts(Some("val")) - 1000L) < 120L)
    // growth stability: a row's split is identical in a larger corpus
    val small = Mixing.hashSplit(docs.limit(100), "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val large = Mixing.hashSplit(docs, "doc_id", fr)
      .filter(col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(small === large)
    // fractions summing below 1e6 leave a NULL remainder bucket
    val part = Mixing.hashSplit(docs, "doc_id", Seq("x" -> 500000L))
      .groupBy("split").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(part.contains(None) && math.abs(part(None) - 5000L) < 200L)
  }

  test("uniformNegatives: k per user, never an interacted item, in-range, deterministic") {
    import spark.implicits._
    // user 1 interacted with half the universe; user 2 with one item
    val inter = ((0L until 10L).map(i => (1L, i * 2)) ++ Seq((2L, 7L)))
      .toDF("u", "it")
    val got = Similarity.uniformNegatives(inter, "u", "it",
      nItems = 20L, k = 4, overdraw = 5)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val interSet = inter.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (u, item, _) =>
      assert(!interSet((u, item)), s"sampled an interacted item: $u -> $item")
      assert(item >= 0L && item < 20L)
    }
    assert(rows.count(_._1 == 1L) === 4 && rows.count(_._1 == 2L) === 4)
    // per-user items are distinct; rerun is identical
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).distinct.size == rs.size })
    val again = Similarity.uniformNegatives(inter, "u", "it",
      nItems = 20L, k = 4, overdraw = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted === rows.sorted)
  }

  test("popularityNegatives: inclusion tracks popularity, every draw lands once") {
    import spark.implicits._
    // item 1 is 60x more popular than items 2..11
    val inter = ((1 to 600).map(i => (i.toLong % 50, 1L)) ++
      (1 to 100).flatMap(i => (2L to 11L).map(it => ((i % 50).toLong, it))))
      .toDF("u", "it")
    val got = Similarity.popularityNegatives(inter, "u", "it",
      k = 8, overdraw = 4)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    // dominant item appears for almost every user (p_miss per draw 0.625^32)
    val usersWithTop = rows.filter(_._2 == 1L).map(_._1).distinct.length
    assert(usersWithTop >= 45, s"only $usersWithTop/50 users drew the head item")
    // aggregate draw mass: the head item is ~0.375 of all kept negatives'
    // PRE-dedup draws; post-dedup it is capped at 1/user, so just assert
    // every item id is valid and ranks are contiguous from 1
    rows.foreach { case (_, it) => assert(it >= 1L && it <= 11L) }
    got.groupBy("user").agg(min("neg_rank"), max("neg_rank"), count(lit(1)))
      .collect().foreach { r =>
        assert(r.getLong(1) === 1L && r.getLong(2) === r.getLong(3))
      }
    // deterministic across reruns
    val again = Similarity.popularityNegatives(inter, "u", "it",
      k = 8, overdraw = 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted === rows.sorted)
    // the >maxLocalRanges DISTRIBUTED fallback (ranges stay a cached
    // distributed relation instead of a broadcast local one) is
    // byte-identical to the local path — maxLocalRanges = 0 forces it
    val dist = Similarity.popularityNegatives(inter, "u", "it",
      k = 8, overdraw = 4, maxLocalRanges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val loc = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dist.sorted === loc.sorted)
  }

  test("charEntropy: uniform alphabet hits ln|A|, constant text is 0, prefix caps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd" * 50),          // uniform over 4 chars
      (2L, "a" * 100),            // zero entropy
      (3L, "xy" * 600)            // 1200 chars -> capped at 512
    ).toDF("doc_id", "text")
    val got = TextStats.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per-term micro quantization: 4 * round(0.25 * ln 4 * 1e6)
    val ln4Term = math.round(0.25 * math.log(4.0) * 1e6)
    assert(got(1L) === ((200L, 4 * ln4Term)))
    assert(got(2L) === ((100L, 0L)))
    val ln2Term = math.round(0.5 * math.log(2.0) * 1e6)
    assert(got(3L) === ((512L, 2 * ln2Term)))
  }

  test("sqrtTemperatureMix: small strata keep a higher rate; head is damped") {
    import spark.implicits._
    // big: 100 docs × 20 tokens = 2000; small: 10 docs × 20 = 200
    val docs = ((0 until 100).map(i => (i.toLong, "big", ("w " * 20).trim)) ++
      (0 until 10).map(i => (1000L + i, "small", ("w " * 20).trim)))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), col("text"))
    // budget low enough that neither stratum hits the rate cap:
    // small share = √200/(√2000+√200) = 0.2402 → rate 0.6005
    val got = Mixing.sqrtTemperatureMix(docs, "doc_id", "text", "lang",
      totalTokens = 500L)
    val rates = got.select("stratum", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // shares ∝ √2000 : √200 → small's keep RATE is √10× big's
    assert(rates("small") > rates("big") * 2.5,
      s"sqrt temperature must boost the small stratum: $rates")
    // uncapped rates: ratio is exactly √(2000/200) = √10 ≈ 3.162
    assert(math.abs(rates("small") / rates("big") - math.sqrt(10.0)) < 0.01)
  }

  test("epochShuffle: contiguous permutation, seed-fresh, partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Mixing.epochShuffle(df, "doc_id", seed)
        .orderBy("shuffle_pos").collect().map(_.getLong(0)).toSeq
    val e1 = order(docs, 1L)
    // a bijection onto 1..n over the full id set
    assert(e1.sorted === (0L until 500L))
    // same seed, different physical partitioning: identical order
    assert(order(docs.repartition(13), 1L) === e1)
    // a different seed is a genuinely different permutation (and not
    // the identity)
    val e2 = order(docs, 2L)
    assert(e2 !== e1)
    assert(e1 !== (0L until 500L).toSeq)
  }
}
