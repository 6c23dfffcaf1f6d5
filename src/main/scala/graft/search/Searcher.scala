package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.MaxSim
import graft.index.MultiVectorIndex

/** Search parameters — defaults match the reference
  * (next-plaid/src/search.rs:27-69). */
final case class SearchParams(
    topK: Int = 10,
    nIvfProbe: Int = 8,
    nFullScores: Int = 4096,
    centroidScoreThreshold: Option[Float] = Some(0.4f)
)

/** Batch late-interaction search: the reference's per-query funnel
  * (search.rs:327-516) re-expressed as one DataFrame pipeline over ALL
  * queries at once, so per-stage fixed costs amortize (SURVEY §3.1: the
  * only real shuffles are the IVF join, the per-(query,doc) grouping, and
  * the final per-query top-k window).
  *
  * Queries are collected and broadcast (a query batch is small — tens to
  * thousands of rows); the index side stays fully distributed.
  */
final class Searcher(index: MultiVectorIndex) {
  private val spark: SparkSession = index.spark
  import spark.implicits._

  /** doc -> codes array, derived from the tokens table (cached). */
  private lazy val docCodes: DataFrame = index.tokens
    .groupBy("doc_id")
    .agg(
      transform(
        array_sort(collect_list(struct(col("tok"), col("code")))),
        x => x.getField("code")
      ).as("codes"))
    .cache()

  /** Full funnel. `queries(query_id: long, embeddings: array<array<float>>)`;
    * optional `subset(doc_id)` pre-filter (S4). Returns
    * (query_id, doc_id, score, rank). */
  def search(
      queries: DataFrame,
      params: SearchParams = SearchParams(),
      subset: Option[DataFrame] = None
  ): DataFrame = {
    val codec = index.codec
    val dim = codec.dim
    val k = codec.numCentroids

    val queryMap: Map[Long, Array[Array[Float]]] = queries
      .select("query_id", "embeddings")
      .as[(Long, Array[Array[Float]])]
      .collect()
      .toMap
    val queriesBc = spark.sparkContext.broadcast(queryMap)
    val codecBc = spark.sparkContext.broadcast(codec)

    // S4 pre-computation: adaptive probe scaling (search.rs:370-382) —
    // with a subset filter, probe more centroids so recall holds.
    val nProbe = subset match {
      case Some(sub) =>
        val subsetLen = math.max(sub.count(), 1L)
        val scaled = params.nIvfProbe.toLong * math.max(
          index.numDocuments / subsetLen, 1L)
        math.min(scaled, k.toLong).toInt
      case None => params.nIvfProbe
    }

    // S1+S2: per query token, top-nProbe centroids (partial selection),
    // with the max-token-score-per-centroid threshold filter.
    val thresholdLocal = params.centroidScoreThreshold.getOrElse(Float.NegativeInfinity)
    val dimLocal = dim
    val kLocal = k
    val nProbeLocal = nProbe
    val probed: DataFrame = spark.sparkContext
      .parallelize(queryMap.keys.toSeq.sorted, math.min(queryMap.size, 32).max(1))
      .flatMap { qid =>
        val cents = codecBc.value.centroids
        val emb = queriesBc.value(qid)
        // per-centroid max token score (for the threshold), plus per-token
        // top-nProbe partial selection (search.rs:388-428)
        val perToken = emb.map { qvec =>
          val scores = new Array[Float](kLocal)
          var c = 0
          while (c < kLocal) {
            var s = 0.0f
            val off = c * dimLocal
            var i = 0
            while (i < dimLocal) { s += cents(off + i) * qvec(i); i += 1 }
            scores(c) = s
            c += 1
          }
          scores
        }
        val selected = scala.collection.mutable.Map.empty[Int, Float]
        perToken.foreach { scores =>
          Searcher.topNIndices(scores, nProbeLocal).foreach { c =>
            val cur = selected.getOrElse(c, Float.NegativeInfinity)
            if (scores(c) > cur) selected(c) = scores(c)
          }
        }
        selected.iterator
          .filter { case (_, maxScore) => maxScore >= thresholdLocal }
          .map { case (code, _) => (qid, code) }
      }
      .toDF("query_id", "code")

    // S3: gather IVF lists, dedup candidates.
    val candidates0 = probed
      .join(index.ivf.hint("shuffle_hash"), "code")
      .select(col("query_id"), explode(col("doc_ids")).as("doc_id"))
      .distinct()

    // S4: subset restriction.
    val candidates = subset match {
      case Some(sub) => candidates0.join(broadcast(sub.select("doc_id")), Seq("doc_id"), "left_semi")
      case None      => candidates0
    }

    // S5: approximate (codes-only) MaxSim per candidate.
    val approx = candidates
      .join(docCodes, "doc_id")
      .as[(Long, Long, Array[Int])]
      .mapPartitions { rows =>
        val codecV = codecBc.value
        val cents = codecV.centroids
        val kNow = codecV.numCentroids
        val dimNow = codecV.dim
        // memoize per-query centroid-score matrices within the partition
        val memo = scala.collection.mutable.Map.empty[Long, Array[Array[Float]]]
        rows.map { case (docId, qid, codes) =>
          val scores = memo.getOrElseUpdate(qid, {
            queriesBc.value(qid).map { qvec =>
              val row = new Array[Float](kNow)
              var c = 0
              while (c < kNow) {
                var s = 0.0f
                val off = c * dimNow
                var i = 0
                while (i < dimNow) { s += cents(off + i) * qvec(i); i += 1 }
                row(c) = s
                c += 1
              }
              row
            }
          })
          (qid, docId, MaxSim.approxScore(scores, codes))
        }
      }
      .toDF("query_id", "doc_id", "approx_score")

    // S6: funnel cut — top n_full_scores by approx, then n_full/4 (>= topK)
    // go to decompression (search.rs:460-469).
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_score").desc, col("doc_id").asc)
    val nDecompress = math.max(params.nFullScores / 4, params.topK)
    val survivors = approx
      .withColumn("_r", row_number().over(wApprox))
      .filter(col("_r") <= math.max(params.nFullScores, nDecompress))
      .filter(col("_r") <= nDecompress)
      .drop("_r", "approx_score")

    // S7: exact MaxSim on decompressed survivors.
    val exact = survivors
      .join(index.tokens, "doc_id")
      .groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("tok"), col("code"), col("residual"))).as("toks"))
      .as[(Long, Long, Array[(Int, Int, Array[Byte])])]
      .mapPartitions { rows =>
        val codecV = codecBc.value
        rows.map { case (qid, docId, toks) =>
          val docEmb = toks.sortBy(_._1).map { case (_, code, packed) =>
            codecV.decode(code, packed)
          }
          (qid, docId, MaxSim.score(queriesBc.value(qid), docEmb))
        }
      }
      .toDF("query_id", "doc_id", "score")

    // S8: final top-k.
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    exact
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= params.topK)
  }

  /** S10 reconstruction: decompressed embeddings for given doc ids. */
  def reconstruct(docIds: DataFrame): DataFrame = {
    val codecBc = spark.sparkContext.broadcast(index.codec)
    index.tokens
      .join(broadcast(docIds.select("doc_id")), Seq("doc_id"), "left_semi")
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        val c = codecBc.value
        rows.map { case (docId, tok, code, packed) =>
          (docId, tok, c.decode(code, packed))
        }
      }
      .toDF("doc_id", "tok", "vec")
  }

  /** S11 rerank: exact MaxSim of one query against supplied docs
    * (ad-hoc, no index probing). `docs(doc_id, embeddings)`. */
  def rerank(query: Array[Array[Float]], docs: DataFrame, topK: Int): DataFrame = {
    val qBc = spark.sparkContext.broadcast(query)
    val scored = docs
      .select("doc_id", "embeddings")
      .as[(Long, Array[Array[Float]])]
      .map { case (docId, emb) => (docId, MaxSim.score(qBc.value, emb)) }
      .toDF("doc_id", "score")
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** Brute-force exact search (the in-repo oracle for funnel recall —
    * mirrors the reference's exact n_full_scores path). */
  def bruteForce(queries: DataFrame, topK: Int): DataFrame = {
    val codecBc = spark.sparkContext.broadcast(index.codec)
    val queryMap = queries
      .select("query_id", "embeddings")
      .as[(Long, Array[Array[Float]])]
      .collect().toMap
    val queriesBc = spark.sparkContext.broadcast(queryMap)
    val exact = index.tokens
      .groupBy("doc_id")
      .agg(collect_list(struct(col("tok"), col("code"), col("residual"))).as("toks"))
      .as[(Long, Array[(Int, Int, Array[Byte])])]
      .mapPartitions { rows =>
        val c = codecBc.value
        val qs = queriesBc.value
        rows.flatMap { case (docId, toks) =>
          val docEmb = toks.sortBy(_._1).map { case (_, code, packed) =>
            c.decode(code, packed)
          }
          qs.iterator.map { case (qid, q) => (qid, docId, MaxSim.score(q, docEmb)) }
        }
      }
      .toDF("query_id", "doc_id", "score")
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

}

object Searcher {
  private[search] def topNIndices(scores: Array[Float], n: Int): Array[Int] = {
    if (n >= scores.length) return scores.indices.toArray
    // bounded selection: maintain a small min-heap of (score, idx)
    val heap = new java.util.PriorityQueue[(Float, Int)](
      n, (a: (Float, Int), b: (Float, Int)) => java.lang.Float.compare(a._1, b._1))
    var i = 0
    while (i < scores.length) {
      if (heap.size < n) heap.add((scores(i), i))
      else if (scores(i) > heap.peek()._1) { heap.poll(); heap.add((scores(i), i)) }
      i += 1
    }
    val out = new Array[Int](heap.size)
    var j = 0
    while (!heap.isEmpty) { out(j) = heap.poll()._2; j += 1 }
    out
  }
}
