package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{MetadataOps, Where}

/** Physical-plan invariants the 100-TB design depends on: metadata
  * predicates reach the parquet scan (PushedFilters), narrow operators
  * prune columns at the scan (ReadSchema), and the dedup aggregations
  * combine map-side before their shuffle (partial aggregation). A plan
  * that silently loses one of these still returns correct rows at test
  * scale — these assertions catch the regression that would only show
  * at 1000 executors. */
class PlanAssertionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val tablePath: String = {
    import spark.implicits._
    val p = "/tmp/graft_plan_assert"
    graft.util.Fs.deleteRecursively(p)
    (0L until 1000L).map(i => (i, s"doc text $i", i % 5, i.toDouble / 7))
      .toDF("doc_id", "text", "grp", "score")
      .write.parquet(p)
    p
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("whereCondition predicates push down to the parquet scan") {
    val df = spark.read.parquet(tablePath)
    val filtered = MetadataOps.whereCondition(
      df, "doc_id", "grp = ? AND score > ?",
      Seq(Where.SLong(2), Where.SDouble(10.0)))
    val plan = planOf(filtered)
    assert(plan.contains("PushedFilters:"), "no pushdown section in scan")
    assert(plan.contains("EqualTo(grp,2"), s"grp predicate not pushed:\n$plan")
    assert(plan.contains("GreaterThan(score,10.0"), s"score predicate not pushed:\n$plan")
  }

  test("narrow projections prune the parquet ReadSchema to used columns") {
    val df = spark.read.parquet(tablePath)
    val stats = graft.pipeline.TextStats.tokenCounts(df, "doc_id", "text")
    val plan = planOf(stats)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      plan.split("ReadSchema").lift(1).getOrElse(""))
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("score") && !readSchema.contains("grp"),
      s"unused columns read at the scan: $readSchema")
  }

  test("interval-join gate queries: event_type filter pushed to scan, equi-join shape") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/events.parquet"))
    for (q <- Seq("e_interval_join", "e_overlap_join", "e_multi_touch")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(plan.contains("PushedFilters:") && plan.contains("event_type"),
        s"$q: event_type filter not at the scan:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q: range join degenerated to a product:\n$plan")
    }
  }

  test("exact dedup aggregates map-side before the shuffle") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.Dedup.exactDedup(df, "doc_id", "text"))
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"no partial (map-side) aggregation before the shuffle:\n$plan")
  }

  test("repetition signals aggregate map-side and read only (doc_id, text)") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.TextStats.repetition(df, "doc_id", "text"))
    // the gram count must partial-aggregate before its shuffle (repeated
    // grams collapse map-side — the property the 100 TB claim rests on)
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no partial (map-side) aggregation before the gram shuffle:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("score") && !readSchemas.contains("grp"),
      s"unused columns read at the scan: $readSchemas")
  }

  test("duplicate spans: pruned scan, partial gram agg, semi-join flag lookup") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.Dedup.duplicateSpans(df, "doc_id", "text", 4))
    // the cross-doc gram test must partial-aggregate before its shuffle
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no partial (map-side) aggregation before the gram shuffle:\n$plan")
    // windows join the flagged-gram set as a semi join, never a fan-out join
    assert(plan.contains("LeftSemi"),
      s"cross-doc flag lookup is not a semi join:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("score") && !readSchemas.contains("grp"),
      s"unused columns read at the scan: $readSchemas")
  }

  test("LSH candidate pairs: no self hash-join of the bands relation, no nested-loop join") {
    val df = spark.read.parquet(tablePath)
    val bands = graft.pipeline.Dedup.lshBands(
      graft.pipeline.Dedup.minhashSignatures(
        graft.pipeline.Dedup.shingles(df, "doc_id", "text", 3), 8), 2)
    val plan = planOf(graft.pipeline.Dedup.candidatePairs(bands))
    // the bucket-cap guard joins back as a SEMI join (no row fan-out),
    // pairs come from collect+explode — a second hash join of the bands
    // relation against itself must never reappear
    assert(plan.contains("LeftSemi"),
      s"bucket-cap guard is not a semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop/cartesian join in the pair plan:\n$plan")
    val innerHashJoins = plan.linesIterator
      .filter(l => l.contains("HashJoin") && l.contains("Inner")).size
    assert(innerHashJoins === 0,
      s"pair generation still self-joins the bands relation:\n$plan")
    // the collect_list rollup partial-aggregates map-side like every
    // other shuffle in the chain
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
  }

  test("prefixFilterPairsAtScale: equi-joins only, keyed closure, partial aggs") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.Dedup.prefixFilterPairsAtScale(
      df, "doc_id", "text", shingleSize = 3, minJaccard = 0.5))
    // every stage — dedup window, PPJoin candidate join, verify join,
    // and BOTH closure legs (cross expansion + within-family
    // self-join) — must be keyed; a product here is the 100-TB killer
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop/cartesian join in the atScale plan:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"driver-materialized rows in the atScale plan:\n$plan")
    // df rollup, positional aggregate, intersection counts, family
    // sizes: all must combine map-side before their shuffles
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
  }

  test("c4Clean: boilerplate df joins back on the line hash, unused columns pruned") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.Boilerplate.c4Clean(df, "doc_id", "text"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop/cartesian join in the c4Clean plan:\n$plan")
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("score") && !readSchemas.contains("grp"),
      s"unused columns read at the scan: $readSchemas")
  }

  test("perplexityBuckets: partial aggs, broadcast LM totals, pruned scan") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.pipeline.TextStats.perplexityBuckets(df, "doc_id", "text"))
    // the (doc,tok) and token-count rollups must combine map-side
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
    // the single-row LM-totals join is a broadcast, never a shuffle
    assert(plan.contains("BroadcastExchange"),
      s"LM totals not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian join in the perplexity plan:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("score") && !readSchemas.contains("grp"),
      s"unused columns read at the scan: $readSchemas")
  }

  test("dsirWeights: LM tables broadcast, partial aggs, pruned scan") {
    val df = spark.read.parquet(tablePath)
    val raw = df.filter(col("doc_id") % 10 =!= 0)
    val tgt = df.filter(col("doc_id") % 10 === 0)
    val (dsirDf, dsirRollup) =
      graft.pipeline.Mixing.dsirWeightsScored(raw, tgt, "doc_id", "text", 64)
    val plan = planOf(dsirDf)
    dsirRollup.unpersist()
    // the <=numBuckets-row LM join must broadcast: the raw corpus never
    // shuffles on bucket
    assert(plan.contains("BroadcastExchange"), s"LM table not broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") || plan.contains("BuildRight"),
      s"unexpected nested-loop in dsir plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in dsir plan:\n$plan")
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("score") && !readSchemas.contains("grp"),
      s"unused columns read at the scan: $readSchemas")
  }

  test("canonicalizeUrls is a zero-shuffle projection; urlDedup shuffles once with partial agg") {
    val df = spark.read.parquet(tablePath).withColumnRenamed("text", "url")
    val canonPlan = planOf(graft.pipeline.Scrub.canonicalizeUrls(df, "doc_id", "url"))
    assert(!canonPlan.contains("Exchange"),
      s"canonicalizeUrls must stream at scan speed, found a shuffle:\n$canonPlan")
    val dedupPlan = planOf(graft.pipeline.Scrub.urlDedup(df, "doc_id", "url"))
    assert(dedupPlan.contains("partial"),
      s"urlDedup must combine map-side before its one shuffle:\n$dedupPlan")
    assert(dedupPlan.split("ShuffleExchange|Exchange hashpartitioning").length <= 3,
      s"urlDedup should shuffle exactly once:\n$dedupPlan")
  }

  test("BM25 query terms reach the postings scan as a pushed In filter") {
    import spark.implicits._
    val fts = "/tmp/graft_plan_fts"
    graft.util.Fs.deleteRecursively(fts)
    val docs = (0L until 200L).map(i => (i, s"alpha beta gamma$i"))
      .toDF("doc_id", "text")
    val idx = graft.fts.FtsIndex.build(spark, docs, "doc_id", "text", fts)
    val plan = planOf(graft.fts.Fts.bm25(
      spark, idx.postings, Seq("alpha", "beta"), doclensOpt = Some(idx.doclens)))
    assert(plan.contains("In(term,") || plan.contains("In(term "),
      s"query-term predicate not pushed into the postings scan:\n$plan")
  }

  test("event-family plans: map-side combine, single-shuffle as-of, no products") {
    import spark.implicits._
    val ev = (0L until 500L)
      .map(i => (i, i * 1000L, i % 7, if (i % 3 == 0) "view" else "click", i * 0.5))
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value")
    // OHLC: partial min_by/max_by before the single exchange
    val ohlc = planOf(graft.operators.TimeSeries.ohlcDownsample(
      ev, "ts_ns", Seq("event_type"), "value", 100000L))
    assert(ohlc.contains("partial_min_by"),
      s"OHLC lost its map-side partial aggregation:\n$ohlc")
    assert("Exchange hashpartitioning".r.findAllIn(ohlc).length === 1,
      s"OHLC should shuffle exactly once:\n$ohlc")
    // as-of: ONE shuffle on the key feeds the carry window; no products
    val l = ev.filter(col("event_type") === "view").select("user_id", "ts_ns", "event_id")
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns"), col("value"))
    val asof = planOf(graft.operators.AsOfJoin.asOf(
      l, r, Seq("user_id"), "ts_ns", Seq("value")))
    assert("Exchange hashpartitioning".r.findAllIn(asof).length === 1,
      s"as-of must be the one-shuffle union-window shape:\n$asof")
    assert(!asof.contains("CartesianProduct") && !asof.contains("BroadcastNestedLoop"))
    // retention: first-seen and activity rollups both combine map-side
    val ret = planOf(graft.operators.TimeSeries.retentionCohorts(
      ev, "user_id", "ts_ns", 100000L))
    assert(ret.contains("partial_min") || ret.contains("partial_first"),
      s"retention first-seen rollup lost map-side combine:\n$ret")
    assert(!ret.contains("CartesianProduct"))
  }

  test("q5/q6 OLAP joins: pushed scan filters, broadcast dim, no products") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/lineitem.parquet"))
    // q5 (TPC-H Q3 shape): segment + both date predicates reach the
    // scans; the filtered customer dim broadcasts; the fact join keyed
    // on the groupBy key means the aggregation adds NO extra exchange
    val q5 = planOf(SparkEntry.queries("q5_join_topn")(spark, sfDir))
    assert(q5.contains("PushedFilters:") && q5.contains("c_mktsegment"),
      s"q5: segment filter not at the customer scan:\n$q5")
    assert(q5.contains("l_shipdate") && q5.contains("o_orderdate"),
      s"q5: date filters missing from the scans:\n$q5")
    assert(q5.contains("BroadcastExchange"),
      s"q5: filtered customer dim is not broadcast:\n$q5")
    assert(!q5.contains("CartesianProduct") &&
      !q5.contains("BroadcastNestedLoopJoin"),
      s"q5: join degenerated to a product:\n$q5")
    assert("Exchange hashpartitioning".r.findAllIn(q5).length <= 2,
      s"q5: group-by must reuse the join exchange (≤2 shuffles):\n$q5")
    assert(q5.contains("TakeOrdered"),
      s"q5: top-10 cut is not a distributed TakeOrdered:\n$q5")
    // q6 (TPC-H Q6 shape): all predicates pushed, map-side partial agg,
    // and NO hash-partitioned shuffle anywhere (single-row final agg)
    val q6 = planOf(SparkEntry.queries("q6_filter_agg")(spark, sfDir))
    assert(q6.contains("PushedFilters:") && q6.contains("l_shipdate") &&
      q6.contains("l_quantity") && q6.contains("l_discount"),
      s"q6: predicates not pushed to the lineitem scan:\n$q6")
    assert(q6.contains("partial"), s"q6: no map-side partial agg:\n$q6")
    assert(!q6.contains("Exchange hashpartitioning"),
      s"q6: a selective scan-agg must not hash-shuffle:\n$q6")
  }

  test("e_islands: both windows share the user_id clustering — one wide shuffle") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/events.parquet"))
    val plan = planOf(SparkEntry.queries("e_islands")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      s"e_islands: expected the user_id window shuffle (+ rollup) only:\n$plan")
    assert(plan.contains("partial"),
      s"e_islands: island rollup lost map-side combine:\n$plan")
  }

  test("chunkDocuments is a pure zero-shuffle projection") {
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, ("w " * 200).trim)).toDF("doc_id", "text")
    val plan = planOf(graft.pipeline.Mixing.chunkDocuments(d, "doc_id", "text", 64, 48))
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle — it is a flatMap-shaped projection:\n$plan")
    assert(plan.contains("Generate"), s"expected the explode Generate node:\n$plan")
  }

  test("fingerprint: one shuffle with map-side partial XOR/count") {
    val df = spark.read.parquet(tablePath)
    val plan = planOf(graft.operators.Checks.fingerprint(
      df, Seq("grp"), Seq("doc_id", "text")))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"fingerprint must be a single grouped aggregation:\n$plan")
    assert(plan.contains("partial"),
      s"fingerprint rollup lost map-side combine:\n$plan")
  }

  test("groupedTrend: single grouped aggregation, partial sums, pruned scan") {
    val df = spark.read.parquet(tablePath)
      .withColumn("x", col("doc_id") % 10)
    val plan = planOf(graft.operators.Stats.groupedTrend(
      df, Seq("grp"), "x", "doc_id"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"groupedTrend must aggregate in one pass:\n$plan")
    assert(plan.contains("partial"), s"trend sums lost map-side combine:\n$plan")
    assert(!plan.contains("text"),
      s"unused text column must be pruned from the scan:\n$plan")
  }

  test("hashSplit is a zero-shuffle projection; negative-sampling joins never NL") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    val splitPlan = planOf(graft.pipeline.Mixing.hashSplit(
      docs, "doc_id", Seq("a" -> 500000L, "b" -> 500000L)))
    assert(!splitPlan.contains("Exchange"),
      s"hashSplit must not shuffle:\n$splitPlan")
    val inter = (1L to 50L).flatMap(u => (0L until 20L by 2).map(i => (u, i)))
      .toDF("u", "it")
    val negDf = graft.pipeline.Similarity.popularityNegatives(
      inter, "u", "it", k = 4)
    val negPlan = planOf(negDf)
    assert(!negPlan.contains("NestedLoop") && !negPlan.contains("Cartesian"),
      s"inverse-CDF lookup must stay a bucketed equi-join:\n$negPlan")
    // r15 shape (bounded catalog): the ranges were computed ONCE eagerly
    // (persist + count inside the operator) and re-enter the sampling
    // plan as a broadcast local relation, so the returned plan has NO
    // window at all (the GlobalRank prefix sum ran in the eager pass)
    // and exactly ONE row shuffle — the user-distinct aggregation, whose
    // hashpartitioning(user) clustering satisfies the draw dedup AND the
    // per-user top-k aggs downstream (subset-clustering reuse).
    assert(!negPlan.contains("WindowExec") && !negPlan.contains("Window "),
      s"a window reappeared in the popularityNegatives sampling plan:\n$negPlan")
    assert("Exchange hashpartitioning".r.findAllIn(negPlan).length === 1,
      s"popularityNegatives must shuffle rows exactly once (users " +
        s"distinct); the aggs downstream reuse that clustering:\n$negPlan")
    assert(negPlan.contains("BroadcastExchange"),
      s"catalog-sized ranges must broadcast into the lookup join:\n$negPlan")
    // uniformNegatives is ONE wide op since r14: the per-user
    // interacted-set aggregation is the only shuffle — draw generation,
    // exclusion, dedup, and the top-k cut are narrow array ops. A
    // second Exchange or any Window/Join node means the r13 shape
    // (anti join + two windows) crept back.
    val uniPlan = planOf(graft.pipeline.Similarity.uniformNegatives(
      inter, "u", "it", nItems = 20L, k = 4))
    val nExchanges = "Exchange".r.findAllIn(uniPlan).size
    assert(nExchanges <= 1,
      s"uniformNegatives must shuffle exactly once, found $nExchanges:\n$uniPlan")
    assert(!uniPlan.contains("Window") && !uniPlan.contains("Join"),
      s"uniformNegatives must be aggregation + narrow array ops:\n$uniPlan")
  }

  test("chunkLayout: one corpus shuffle; windows only over the bounded offsets side") {
    import spark.implicits._
    val lens = (0L until 2000L).map(i => (i, 1L + i % 7)).toDF("doc_id", "len")
    val out = graft.index.ChunkLayout.chunkLayout(lens, 128)
    val wins = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected the offsets-prefix window in the layout plan")
    // the corpus-sized relation is never windowed: every window in the
    // plan is the ≤numPartitions-row offsets prefix (order key = pid)
    wins.foreach { w =>
      val orderKeys = w.orderSpec.map(_.child.toString).mkString(",")
      assert(w.partitionSpec.isEmpty && orderKeys.contains("_cl_pid"),
        s"a window over the full relation crept in: $w")
    }
    val plan = planOf(out)
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"chunk-base join must stay an equi-join:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"numChunks-row base table must broadcast back:\n$plan")
    // the ONE corpus shuffle (the range repartition) lives inside the
    // pinned RDD lineage (mapPartitionsWithIndex over the range-sorted
    // partitions — Scan ExistingRDD in this plan); the DataFrame plan on
    // top must add NO corpus-sized exchange of its own: everything above
    // the scan is broadcast joins plus the tiny offsets/bases aggregates
    // (hash exchanges on _cl_pid/chunk_id ride ≤numPartitions/numChunks
    // partial-agg rows, never corpus rows)
    // rdd.toDF plans as ExternalRDD (+SerializeFromObject); a Dataset
    // .rdd round trip would be LogicalRDD — accept either leaf
    val rddScans = out.queryExecution.optimizedPlan.collect {
      case r if r.children.isEmpty && r.nodeName.contains("RDD") => r
    }
    assert(rddScans.nonEmpty,
      s"expected the pinned RDD scan under the layout plan:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"a second range shuffle crept into the DataFrame plan:\n$plan")
    val corpusHash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id"))
    assert(corpusHash === 0,
      s"corpus-keyed hash exchange crept into the layout plan:\n$plan")
  }

  test("ANN probe is distributed: no driver-collected query rows in the plan") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/embeddings.parquet"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val (cents, assign) =
      graft.pipeline.Similarity.buildIvf(spark, emb, 64, numCentroids = 16)
    val ann = graft.pipeline.Similarity.annTopK(
      spark, emb, cents, assign, 64, qs, k = 10, nProbe = 8)
    val plan = planOf(ann)
    // The r14 shape collected the queries to the driver and re-created
    // the probe table with toDF — a LocalTableScan of driver-materialized
    // rows. The distributed shape probes inside mapPartitions over the
    // query scan, so NOTHING in this plan may be a local relation.
    assert(!plan.contains("LocalTableScan"),
      s"driver-collected probe rows back in the ANN plan:\n$plan")
    assert(plan.contains("MapPartitions"),
      s"expected the mapPartitions probe stage:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ANN gather degenerated to a product:\n$plan")
    // the top-k cut must stay PARTIAL per map partition (Spark 4
    // WindowGroupLimit pushdown): at mining scale the scored candidate
    // set is O(queries × nProbe × cellSize) and a full-window plan
    // would shuffle all of it just to keep k rows per query
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k lost the WindowGroupLimit pushdown:\n$plan")
    // same invariants for the mining entry point (label-filtered)
    val qsl = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
        col("label").as("qlabel"))
    val hn = graft.pipeline.Similarity.hardNegativesAnn(
      spark, emb, qsl, k = 10, dim = 64, numCentroids = 16, nProbe = 8)
    val hnPlan = planOf(hn)
    assert(!hnPlan.contains("LocalTableScan"),
      s"driver-collected probe rows in the hard-negative plan:\n$hnPlan")
    assert(hnPlan.contains("MapPartitions"),
      s"expected the mapPartitions probe stage:\n$hnPlan")
  }

  test("q22/q13: broadcast scalar rollup, anti-join shape, pushed date filter") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/orders.parquet"))
    val q22 = planOf(SparkEntry.queries("q22_idle_rich")(spark, sfDir))
    assert(q22.contains("BroadcastHashJoin") || q22.contains("BroadcastNestedLoop"),
      s"q22: segment rollup must broadcast:\n$q22")
    assert(q22.contains("LeftAnti"), s"q22: expected an anti join:\n$q22")
    assert(q22.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate") ||
      q22.contains("GreaterThanOrEqual(o_orderdate"),
      s"q22: date predicate must reach the orders scan:\n$q22")
    val q13 = planOf(SparkEntry.queries("q13_custdist")(spark, sfDir))
    assert(q13.contains("partial_count"),
      s"q13: orders must aggregate (map-side) before the customer join:\n$q13")
  }

  /** r16 verdict item 4: the bench tail logs `WindowExec: No Partition
    * Defined` for a handful of INTENTIONAL driver-known-bounded windows,
    * but only GlobalRank's was plan-asserted — a corpus-sized
    * unpartitioned window introduced by a future change would produce
    * the same warning and nobody would notice. This sweep walks EVERY
    * gate query's optimized logical plan (including subqueries) and
    * requires each empty-partition-spec Window to sit over a
    * structurally bounded input:
    *   - an Aggregate grouped solely on a known-bounded key
    *     (partition-id offset tables: _gr_pid/_gp_pid/_cl_pid; the
    *     K-centroid salt histogram: code; the ≤n_docs FTS doclens
    *     rollup feeding a toy query is NOT listed — it must come in via
    *     a limit or the name whitelist),
    *   - a Limit (TakeOrdered-shaped top-k: the window ranks ≤ k rows),
    *   - or a literal Range / LocalRelation (driver-chosen size).
    * Anything else fails the suite with the offending query + subtree. */
  /** Partition-id offset keys: tables generated per-partition by the
    * GlobalRank/grouping machinery, bounded by construction at
    * spark.sql.shuffle.partitions rows — name-based acceptance is safe
    * because the `_` prefix is repo-internal. */
  private val pidAggKeys = Set("_gr_pid", "_gp_pid", "_cl_pid")

  /** The `code` grouping key (K-centroid salt histogram,
    * Similarity.gatherCandidates) is only bounded because `code` is a
    * nearest-CENTROID assignment — K distinct values — so unlike the
    * pid keys it must NOT be accepted by name (r17 verdict: any future
    * corpus-sized aggregate on a column merely NAMED `code` would slip
    * through). Structural requirement instead: walk to the deepest
    * plan node still carrying the grouping attribute's exprId (alias
    * boundaries stop the exprId chain, so that frontier node OWNS the
    * value's origin) and require the centroid-assignment MapPartitions
    * kernel inside its subtree. A parquet column renamed to `code`
    * has a scan-only origin subtree and fails. */
  private def centroidBounded(
      att: org.apache.spark.sql.catalyst.expressions.Attribute,
      child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MapPartitions}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    // a persisted assignment cuts the logical lineage at an
    // InMemoryRelation leaf — the kernel then lives in the cached
    // PHYSICAL plan (possibly under an AQE wrapper)
    def physKernel(sp: SparkPlan): Boolean =
      sp.find {
        case a: AdaptiveSparkPlanExec => physKernel(a.executedPlan)
        case p => p.nodeName.contains("MapPartitions")
      }.nonEmpty
    def kernelIn(p: LogicalPlan): Boolean =
      p.find {
        case _: MapPartitions => true
        case imr: InMemoryRelation => physKernel(imr.cachedPlan)
        case _ => false
      }.nonEmpty
    if (!child.output.exists(_.exprId == att.exprId)) return false
    val carriers =
      scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
    def walk(p: LogicalPlan): Unit = {
      val kids = p.children.filter(_.output.exists(_.exprId == att.exprId))
      if (kids.isEmpty) carriers += p else kids.foreach(walk)
    }
    walk(child)
    carriers.nonEmpty && carriers.forall(kernelIn)
  }

  private def windowBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case a: Aggregate =>
        a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
          case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
            pidAggKeys.contains(att.name) ||
              (att.name == "code" && centroidBounded(att, a.child))
          case _ => false
        }
      case _: GlobalLimit | _: LocalLimit => true
      case _: Range | _: LocalRelation | _: OneRowRelation => true
      case u: UnaryNode => windowBounded(u.child)
      case _ => false
    }
  }

  /** (#offending subtree strings, #unpartitioned windows seen). */
  private def sweepUnpartitionedWindows(df: org.apache.spark.sql.DataFrame)
      : (Seq[String], Int) = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val ws = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    (ws.filterNot(w => windowBounded(w.child))
      .map(_.treeString.take(2000)), ws.size)
  }

  test("sweep: every unpartitioned window in every gate query is bounded") {
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/documents.parquet"))
    // toy-corpus verify-only queries whose window input is bounded by a
    // literal id filter the structural walk can't prove (each ≤ 300
    // rows by construction)
    val nameWhitelist = Set("f_lifecycle")

    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    var seen = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      val df =
        try fn(spark, sfDir)
        catch { case e: Exception => fail(s"$name failed to plan: $e") }
      val (bad, n) = sweepUnpartitionedWindows(df)
      seen += n
      if (!nameWhitelist.contains(name))
        bad.foreach(s => offenders += s"$name:\n$s")
    }
    assert(offenders.isEmpty,
      s"unbounded unpartitioned windows:\n${offenders.mkString("\n---\n")}")
    // teeth guard: the GlobalRank offset tables and the toy-rebuild
    // window ARE in the gate set — finding zero means the walk went
    // blind (e.g. an optimizer rewrite renamed the node), not that the
    // repo is window-free
    assert(seen >= 2, s"sweep found only $seen unpartitioned windows — walk broken?")
  }

  test("sweep negative: corpus aggregate merely NAMED code must fail") {
    import org.apache.spark.sql.expressions.{Window => W}
    val sfDir = "/root/testdata/sf0.001"
    assume(graft.util.Fs.exists(s"$sfDir/documents.parquet"))
    // a corpus-sized column renamed to `code`, aggregated, under an
    // unpartitioned window — exactly the r17-flagged hole
    val fake = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("code"))
      .groupBy("code").agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(W.partitionBy().orderBy("code")))
    val (bad, n) = sweepUnpartitionedWindows(fake)
    assert(n === 1)
    assert(bad.nonEmpty, "name-alone `code` aggregate must be flagged")
    // and the REAL centroid histogram still passes: the gatherCandidates
    // shape (assignment kernel -> groupBy(code) -> scalar window), in
    // BOTH the raw and the persisted-assignment (InMemoryRelation) form
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val (cents, assign) =
      graft.pipeline.Similarity.buildIvf(spark, emb, 64, numCentroids = 16)
    val ann = graft.pipeline.Similarity.annTopK(
      spark, emb, cents, assign, 64, qs, k = 5, nProbe = 4)
    val (badReal, nReal) = sweepUnpartitionedWindows(ann)
    assert(nReal >= 1, "expected the salt-histogram scalar window in the ANN plan")
    assert(badReal.isEmpty,
      s"centroid-bounded histogram wrongly flagged:\n${badReal.mkString("\n")}")
    val hn = graft.pipeline.Similarity.hardNegativesAnn(
      spark, emb, qs.withColumn("qlabel", col("query_id") % 3),
      k = 5, dim = 64, numCentroids = 16, nProbe = 4)
    val (badHn, nHn) = sweepUnpartitionedWindows(hn)
    assert(nHn >= 1, "expected the salt-histogram window in the mining plan")
    assert(badHn.isEmpty,
      s"persisted-assignment histogram wrongly flagged:\n${badHn.mkString("\n")}")
  }
}
