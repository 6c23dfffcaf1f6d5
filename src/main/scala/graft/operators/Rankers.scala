package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranking / top-k operators shared by the search funnel (S2/S6/S8), the
  * colgrep ranking layer (C6), and the fusion pipeline.
  *
  * All per-group top-k cuts are window `row_number()` with a deterministic
  * tie-break — Catalyst plans these as partial top-k per partition (window
  * group limit pushdown in Spark 4), so no global sort materializes.
  */
object Rankers {

  /** Per-group top-k with deterministic tie-break columns. Emits `rankCol`
    * (1-based). Mirrors the reference's partial-sort selection
    * (search.rs:405-409, select_nth_unstable semantics). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** The reference's two-stage score funnel (S6, search.rs:460-469): cut to
    * `nFull` candidates by approximate score, then rerank the survivors by
    * exact score and keep `topK`. */
  def funnel(
      df: DataFrame,
      groupCols: Seq[Column],
      approxOrder: Seq[Column],
      exactOrder: Seq[Column],
      nFull: Int,
      topK: Int
  ): DataFrame = {
    val stage1 = topKPerGroup(df, groupCols, approxOrder, nFull, "_approx_rank")
    topKPerGroup(stage1.drop("_approx_rank"), groupCols, exactOrder, topK)
  }

  /** Global top-k with a 1-based `rank` column. `orderBy().limit(k)` plans
    * as TakeOrderedAndProject (bounded per-partition priority queues — no
    * single-partition sort of the full input); the rank window then runs
    * over ≤ k rows only. Replaces round 1's unpartitioned-window
    * anti-pattern (`WindowExec: No Partition Defined` over the corpus). */
  def topKGlobal(
      df: DataFrame,
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    val top = df.orderBy(orderCols: _*).limit(k)
    // rank via zipWithIndex over the already-globally-sorted ≤k rows — a
    // window would need a partition spec ({} = the round-1 warning;
    // lit(0) folds away to the same), and zipWithIndex preserves
    // partition-then-row order, which after orderBy+limit IS the rank.
    val spark = top.sparkSession
    val schema = top.schema.add(rankCol, org.apache.spark.sql.types.IntegerType, nullable = false)
    val ranked = top.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i.toInt + 1))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** C6 path-noise penalty (colgrep/src/ranking.rs:32-39): multiplicative
    * score penalty by path class — tests 0.30, compat 0.50, examples 0.70. */
  def pathPenalty(pathCol: Column): Column =
    when(pathCol.rlike("(^|/)(tests?|__tests__|testing)(/|_|\\.|$)|_test\\.|\\.test\\."), lit(0.30))
      .when(pathCol.rlike("(^|/)(compat|legacy|deprecated)(/|_|\\.|$)"), lit(0.50))
      .when(pathCol.rlike("(^|/)(examples?|samples?|demos?)(/|_|\\.|$)"), lit(0.70))
      .otherwise(lit(1.0))
}
