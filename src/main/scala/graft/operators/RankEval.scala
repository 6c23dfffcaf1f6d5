package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline ranking-quality evaluation — the recall@k / MRR / NDCG@k
  * scorecard every search/recsys pipeline runs against a qrels table
  * (Järvelin & Kekäläinen 2002 for NDCG; binary relevance grades).
  *
  * Determinism contract: every metric is INTEGER arithmetic. DCG terms
  * are quantized per RANK to micro-units BEFORE summing
  * (`gain(i) = round(10^6 / ln(i+1))` — an integer sum is
  * partition-order-invariant where a float sum is not), and NDCG uses
  * the same ln-based gains in numerator and denominator, so the
  * log-base constant cancels exactly as it does for log2:
  * `ndcg_ppm = (10^6·dcg) div idcg`,
  * `recall_ppm = (10^6·n_hits) div n_rel`,
  * `rr_micro = 10^6 div first_hit_rank` — positive floor division
  * only, replayable bit-for-bit by an independent SQL engine.
  *
  * Scale shape: one equi-join of the top-k slice against qrels on
  * (query, doc) + two bounded aggregations; the ideal-DCG lookup is a
  * k-row broadcast prefix table, never a per-query loop. Queries with
  * no relevant documents are dropped (standard IR practice — every
  * metric is undefined there). */
object RankEval {

  /** Score `rankings(qCol, docCol, rankCol)` (rank 1-based, dense per
    * query) against binary `qrels(qCol, docCol)` at cutoff `k`.
    * Output per query: `(qCol, n_rel, n_hits, recall_ppm, rr_micro,
    * ndcg_ppm)`; `rr_micro`/`ndcg_ppm` are 0 when no relevant doc is
    * retrieved in the top k. */
  def evalRanking(
      rankings: DataFrame, qrels: DataFrame,
      qCol: String, docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k in [1, 1000], got $k")
    val spark = rankings.sparkSession
    val rel = qrels.select(col(qCol), col(docCol)).distinct()
    val nRel = rel.groupBy(qCol).agg(count(lit(1)).as("n_rel"))
    // per-rank integer gain and its running (ideal) prefix sum: k rows,
    // broadcast — gain(i) = round(1e6 / ln(i+1))
    val gains = spark.range(1, k + 1).select(
      col("id").as("_i"),
      expr("CAST(round(1000000.0 / ln(CAST(id AS DOUBLE) + 1.0)) AS BIGINT)")
        .as("_gain"))
    val ideal = gains.select(col("_i"), col("_gain"),
      sum("_gain").over(
        org.apache.spark.sql.expressions.Window.orderBy("_i")
          .rowsBetween(Long.MinValue, 0)).as("_idcg_at"))
    val hits = rankings.filter(col(rankCol) <= k)
      .join(rel, Seq(qCol, docCol))
      .join(broadcast(gains), col(rankCol) === col("_i"))
      .groupBy(qCol).agg(
        count(lit(1)).as("n_hits"),
        sum("_gain").as("dcg"),
        min(col(rankCol)).cast("long").as("first_rank"))
    nRel
      .join(hits, Seq(qCol), "left")
      .withColumn("_cut", least(col("n_rel"), lit(k.toLong)))
      .join(broadcast(ideal.select(col("_i"), col("_idcg_at"))),
        col("_cut") === col("_i"))
      .select(col(qCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("CAST((1000000L * coalesce(n_hits, 0L)) div n_rel AS BIGINT)")
          .as("recall_ppm"),
        coalesce(expr("CAST(1000000L div first_rank AS BIGINT)"), lit(0L))
          .as("rr_micro"),
        coalesce(expr("CAST((1000000L * dcg) div _idcg_at AS BIGINT)"), lit(0L))
          .as("ndcg_ppm"))
  }
}
