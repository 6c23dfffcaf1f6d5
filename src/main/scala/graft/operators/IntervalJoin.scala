package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-overlap) join: pair every left interval
  * `[lStart, lEnd]` with every right interval `[rStart, rEnd]` that
  * overlaps it (`lStart <= rEnd AND rStart <= lEnd`), optionally under
  * equi-keys — the other time join Spark has no operator for (DuckDB
  * plans it as IEJoin, Postgres as `&&` over range types; Spark plans
  * the naive inequality join as BroadcastNestedLoopJoin or
  * CartesianProduct, which dies at any real scale).
  *
  * Spark-first shape — the classic BUCKETED range join (the same
  * technique Databricks exposes as a range-join hint): quantize the
  * axis into fixed-width buckets, explode each interval into every
  * bucket it touches, equi-join on (keys…, bucket), then apply the
  * exact overlap predicate. Every stage is a plain shuffle/equi-join
  * Catalyst already plans well (SortMergeJoin or broadcast), so it
  * scales like any other keyed join — NO pair product anywhere.
  *
  * Duplicate elimination is ARITHMETIC, not a distinct: a pair that
  * overlaps may meet in several buckets, so the join keeps it only in
  * the single bucket containing `greatest(lStart, rStart)` (the start
  * of the overlap region). Each qualifying pair therefore survives in
  * EXACTLY one bucket — no post-join dedup shuffle.
  *
  * Choosing `bucketWidth`: fan-out per row is
  * `(len / bucketWidth) + 1`, so pick a width near the typical
  * interval length (a session-length join at width = max session
  * length explodes ≤ 2 buckets/row). A width far below the longest
  * interval multiplies the exploded row count — that is the operator's
  * only scale knob, and it is enforced: an interval spanning more than
  * `maxBucketsPerRow` buckets fails the job loudly via an in-plan
  * `raise_error` (silent overflow would quadratic the join).
  *
  * Point-in-interval is the `rStart == rEnd` special case —
  * [[pointInInterval]] skips the right-side explode entirely (a point
  * touches exactly one bucket).
  *
  * All bucket arithmetic is exact int64 floor division (truncating DIV
  * corrected for negatives) — no double rounding at epoch-microsecond
  * magnitudes. Bounds are inclusive on both ends, matching SQL
  * `BETWEEN` semantics.
  */
object IntervalJoin {

  /** Exact floor(x / w) for an int64 SQL expression (DIV truncates
    * toward zero; correct downward when signs disagree and there is a
    * remainder). Takes SQL text so the arithmetic stays pure-integer —
    * `floor(col / w)` would round through double at epoch magnitudes. */
  private def floorDiv(xSql: String, w: Long): Column =
    expr(s"CASE WHEN ($xSql) % ${w}L < 0 THEN ($xSql) DIV ${w}L - 1 " +
      s"ELSE ($xSql) DIV ${w}L END")

  /** General interval × interval overlap join.
    *
    * @param keys            equi-join key columns (present both sides);
    *                        may be empty (pure range join — only sane
    *                        when one side is small enough to broadcast)
    * @param bucketWidth     bucket width in the bound columns' native
    *                        integer unit
    * @param maxBucketsPerRow fan-out cap per interval; exceeded → error
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long,
      maxBucketsPerRow: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(Set(lStart, lEnd, rStart, rEnd).size == 4,
      "bound column names must be distinct across the two sides")
    val l = explodeBuckets(left, lStart, lEnd, bucketWidth, maxBucketsPerRow)
    val r = explodeBuckets(right, rStart, rEnd, bucketWidth, maxBucketsPerRow)
    l.join(r, keys :+ "_bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // arithmetic dedup: keep the pair only in the overlap-start bucket
      .filter(col("_bucket") ===
        floorDiv(s"greatest(`$lStart`, `$rStart`)", bucketWidth))
      .drop("_bucket")
  }

  /** Point-in-interval join: every right row whose `rTs` lies inside a
    * left `[lStart, lEnd]` (inclusive). The point side's bucket is a
    * pure projection — no explode, no fan-out. */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rTs: String,
      bucketWidth: Long,
      maxBucketsPerRow: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(lStart != rTs && lEnd != rTs, "bound column names must differ")
    val l = explodeBuckets(left, lStart, lEnd, bucketWidth, maxBucketsPerRow)
    val r = right.withColumn("_bucket", floorDiv(s"`$rTs`", bucketWidth))
    // a point meets an interval in exactly the point's own bucket —
    // no arithmetic dedup needed
    l.join(r, keys :+ "_bucket")
      .filter(col(lStart) <= col(rTs) && col(rTs) <= col(lEnd))
      .drop("_bucket")
  }

  private def explodeBuckets(
      df: DataFrame, start: String, end: String,
      width: Long, cap: Int): DataFrame = {
    val lo = floorDiv(s"`$start`", width)
    val hi = floorDiv(s"`$end`", width)
    df.filter(col(start) <= col(end))
      .withColumn("_bucket", explode(
        when(hi - lo < cap, sequence(lo, hi))
          .otherwise(raise_error(lit(
            s"IntervalJoin: interval spans >= $cap buckets of width " +
              s"$width — raise bucketWidth or maxBucketsPerRow")))))
  }
}
