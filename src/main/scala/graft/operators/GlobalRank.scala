package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — `row_number()`/`NTILE()` over a
  * TOTAL order without the single-partition window Spark plans for an
  * un-partitioned `Window.orderBy` (which serializes the whole relation
  * through one task and dies at warehouse scale).
  *
  * Shape: range-repartition on the sort key (equal keys land in one
  * partition; RangePartitioner's boundary sampling is deterministic per
  * input split), rank locally per partition with an ordinary window,
  * then add the exclusive prefix-sum of per-partition counts — a
  * ≤numPartitions-row side table computed with one tiny window and
  * broadcast back. Every step is either partition-local or bounded by
  * the partition count, so the sort is the only global cost — exactly
  * the distributed sort Spark already does for `ORDER BY`.
  *
  * `sortCols` must be a TOTAL order (append a unique id as the last
  * key); with ties the rank would be nondeterministic, same as SQL
  * `row_number()` over a non-total order.
  *
  * Coalesce-safety invariant (do NOT "optimize" the pid window away):
  * `spark_partition_id()` reads the TASK partition id, so it is only
  * correct while the pid-stamping projection runs in the shuffle-read
  * stage of the range exchange itself. Here the pid-partitioned window
  * forces a hash exchange directly above it, which PINS that stage — a
  * downstream `coalesce()` cannot cross the exchange. Replacing the
  * window with a narrow mapPartitions (as `index/ChunkLayout` does)
  * requires RDD `mapPartitionsWithIndex`, whose index is the true
  * parent partition even when a CoalescedRDD merges several parents
  * into one task — `TaskContext.getPartitionId()` there stamps every
  * parent with the merged task id while the local rank resets,
  * silently corrupting the global sequence (caught by the b9 gate
  * under Verify's coalesce(1) dump, round 15).
  */
object GlobalRank {

  /** Adds a 1-based dense global rank column under the total order
    * `sortCols`. Row identity and all existing columns are preserved. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "global_rank", numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, sortCols: _*)
      .withColumn("_gr_pid", spark_partition_id())
    val local = parted.withColumn("_gr_local",
      row_number().over(
        Window.partitionBy("_gr_pid").orderBy(sortCols: _*)).cast("long"))
    // exclusive prefix sum of per-partition counts: ≤ n rows, one tiny
    // single-partition window — bounded by the partition count, not N
    val offsets = local.groupBy("_gr_pid").agg(count(lit(1)).as("_gr_n"))
      .withColumn("_gr_off",
        coalesce(sum("_gr_n").over(Window.orderBy("_gr_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_gr_pid", "_gr_off")
    local.join(broadcast(offsets), Seq("_gr_pid"))
      .withColumn(rankCol, col("_gr_off") + col("_gr_local"))
      .drop("_gr_pid", "_gr_local", "_gr_off")
  }

  /** Adds the EXCLUSIVE global prefix sum of `valueCol` (a long) under
    * the total order `sortCols` — `sum(value) OVER (ORDER BY sortCols
    * ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)` without the
    * single-partition window. Same two-stage shape as
    * [[withGlobalRank]]: range-repartition on the sort keys, local
    * exclusive cumsum per partition, then add the exclusive prefix sum
    * of per-partition totals (a ≤numPartitions-row broadcast side).
    * The result is the unique exclusive prefix sum of the total order,
    * independent of how the range partitioner drew its boundaries. */
  def withGlobalPrefixSum(df: DataFrame, valueCol: Column,
      sortCols: Seq[Column], outCol: String = "prefix_sum",
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, sortCols: _*)
      .withColumn("_gp_pid", spark_partition_id())
      .withColumn("_gp_v", valueCol.cast("long"))
    val local = parted.withColumn("_gp_local",
      coalesce(sum("_gp_v").over(
        Window.partitionBy("_gp_pid").orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = local.groupBy("_gp_pid").agg(sum("_gp_v").as("_gp_n"))
      .withColumn("_gp_off",
        coalesce(sum("_gp_n").over(Window.orderBy("_gp_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_gp_pid", "_gp_off")
    local.join(broadcast(offsets), Seq("_gp_pid"))
      .withColumn(outCol, col("_gp_off") + col("_gp_local"))
      .drop("_gp_pid", "_gp_v", "_gp_local", "_gp_off")
  }

  /** SQL-standard NTILE(k) from the global rank, all-integer arithmetic:
    * with N rows, q = N div k, m = N mod k, the first m buckets hold
    * q+1 rows and the rest hold q. Matches `ntile(k) OVER (ORDER BY
    * sortCols)` bit-for-bit under a total order. One extra count job
    * (driver-known scalar) supplies N. */
  def ntileByRange(df: DataFrame, k: Int, sortCols: Seq[Column],
      bucketCol: String = "bucket", rankCol: String = "global_rank",
      numPartitions: Int = 0): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val total = df.count()
    val ranked = withGlobalRank(df, sortCols, rankCol, numPartitions)
    val q = total / k
    val m = total % k
    // integer ceil-division via DIV: ceil(a/b) = (a + b - 1) DIV b
    val bucket = if (q == 0L) col(rankCol)
      else when(col(rankCol) <= lit(m * (q + 1)),
          expr(s"($rankCol + $q) DIV ${q + 1}"))
        .otherwise(
          expr(s"$m + (($rankCol - ${m * (q + 1)} + ${q - 1}) DIV $q)"))
    ranked.withColumn(bucketCol, bucket.cast("long"))
  }
}
