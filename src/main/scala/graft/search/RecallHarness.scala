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
    * NDCG grades by the exact MaxSim score (the funnel's S7 rerank is
    * already double-precision exact, so the ANN result's own scores ARE
    * the gains); the ideal ranking is the brute-force top-k. Binary
    * recall cannot see funnel-ordering regressions (a funnel that
    * returns the right 10 docs in the wrong order scores recall 1.0);
    * NDCG can — the reference gates on BEIR NDCG@10 the same way
    * (docs/benchmarks/scifact_docker_benchmark.json, 0.7343). */
  def qualityAtK(
      index: MultiVectorIndex,
      queries: DataFrame,
      params: SearchParams = SearchParams()): (Double, Double) = {
    val searcher = new Searcher(index)
    def ranked(df: DataFrame): Map[Long, Seq[(Long, Double)]] = df
      .select("query_id", "doc_id", "score", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    val ann = ranked(searcher.search(queries, params))
    val exact = ranked(searcher.bruteForce(queries, params.topK))
    def dcg(scores: Seq[Double]): Double =
      scores.zipWithIndex.map { case (s, i) =>
        math.max(s, 0.0) / (math.log(i + 2) / math.log(2))
      }.sum
    val perQuery = exact.map { case (q, ideal) =>
      val got = ann.getOrElse(q, Seq.empty)
      val recall = (got.map(_._1).toSet & ideal.map(_._1).toSet).size.toDouble / ideal.size
      val idcg = dcg(ideal.map(_._2))
      val ndcg = if (idcg <= 0) 1.0 else math.min(dcg(got.map(_._2)) / idcg, 1.0)
      (recall, ndcg)
    }
    (perQuery.map(_._1).sum / perQuery.size, perQuery.map(_._2).sum / perQuery.size)
  }

  /** Build-and-measure entry used by Bench and the spec: returns
    * (recall@10, ndcg@10) with reference-default pruned parameters. */
  def measure(
      spark: SparkSession,
      workDir: String,
      numDocs: Long,
      numQueries: Int = 100): (Double, Double) = {
    graft.util.Fs.deleteRecursively(workDir)
    val corpus = clusteredCorpus(spark, numDocs)
    val idx = MultiVectorIndex.build(spark, corpus, workDir)
    val queries = queriesFrom(spark, numQueries)
    val r = qualityAtK(idx, queries, SearchParams()) // reference defaults
    graft.util.Fs.deleteRecursively(workDir)
    r
  }
}
