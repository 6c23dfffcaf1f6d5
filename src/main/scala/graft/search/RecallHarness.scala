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
      params: SearchParams = SearchParams()): Double = {
    val searcher = new Searcher(index)
    def topSets(df: DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "doc_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val ann = topSets(searcher.search(queries, params))
    val exact = topSets(searcher.bruteForce(queries, params.topK))
    val recalls = exact.map { case (q, want) =>
      (ann.getOrElse(q, Set.empty) & want).size.toDouble / want.size
    }
    recalls.sum / recalls.size
  }

  /** Build-and-measure entry used by Bench and the spec: returns
    * recall@10 with reference-default pruned parameters. */
  def measure(
      spark: SparkSession,
      workDir: String,
      numDocs: Long,
      numQueries: Int = 100): Double = {
    graft.util.Fs.deleteRecursively(workDir)
    val corpus = clusteredCorpus(spark, numDocs)
    val idx = MultiVectorIndex.build(spark, corpus, workDir)
    val queries = queriesFrom(spark, numQueries)
    val r = recallAtK(idx, queries, SearchParams()) // reference defaults
    graft.util.Fs.deleteRecursively(workDir)
    r
  }
}
