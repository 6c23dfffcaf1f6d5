package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the lakehouse clustering feature
  * (Delta `OPTIMIZE ZORDER BY`, Iceberg sort orders): interleave the
  * bits of several quantized columns into one sort key so that sorting
  * by it co-locates rows close in EVERY dimension, and parquet
  * row-group min/max stats prune multi-dimensional predicates instead
  * of only the leading sort column's.
  *
  * Everything is exact integer arithmetic so a SQL oracle replays the
  * key bit-for-bit: per column, `u = (v − min) div step` with
  * `step = range div 2^bits + 1` (so `u < 2^bits`; the range is
  * computed in BigInt and the quantizer switches to a shifted-grid
  * form when `max − min` would overflow int64), then
  * `zval = Σ bit_b(u_i) << (b·k + i)`. `bits·k` must stay ≤ 62.
  *
  * Scale shape: one bounded stats aggregate (2 longs per column,
  * driver-known bound) + a pure projection for the key;
  * [[zorderRepartition]] adds the `repartitionByRange(zval)` +
  * in-partition sort that makes the write clustered. The range
  * exchange samples the key — the standard global-sort shuffle, the
  * same cost OPTIMIZE pays. */
object Layout {

  /** Append `zval` computed over `cols` (integer-typed columns). */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a signed long: $bits x ${cols.size}")
    // bounded collect: 2 longs per column — the quantization grid
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val k = cols.size
    val terms = cols.zipWithIndex.map { case (c, i) =>
      require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
        s"zValue: column `$c` has no non-null values (empty input?)")
      val lo = stats.getLong(2 * i)
      val hi = stats.getLong(2 * i + 1)
      // range as BigInt: hi - lo overflows Long when the column spans
      // more than Long.MaxValue (e.g. min<0, max near Long.MaxValue)
      val range = BigInt(hi) - BigInt(lo)
      val step = (range / (BigInt(1) << bits) + 1).toLong
      // When the range fits a Long the exact (v - lo) DIV step grid is
      // safe; beyond that the SQL subtraction itself would wrap, so fall
      // back to (v DIV step) - (lo DIV step) — same step, bins can shift
      // by at most one vs the exact grid, every intermediate stays in
      // int64 (|v DIV step| <= Long.Max/step).
      val u =
        if (range <= BigInt(Long.MaxValue))
          s"((CAST(`$c` AS BIGINT) - ${lo}L) DIV ${step}L)"
        else
          s"((CAST(`$c` AS BIGINT) DIV ${step}L) - ${lo / step}L)"
      (0 until bits).map(b =>
        s"(shiftleft(shiftright($u, $b) & 1L, ${b * k + i}))").mkString(" + ")
    }
    df.withColumn("zval", expr(terms.mkString(" + ")))
  }

  /** Range-partition and sort by the Z key — the clustered-write step.
    * `numPartitions` becomes the output file count; each file's
    * min/max envelope in every Z-ordered dimension shrinks by ~the
    * partition count's appropriate root, which is what row-group
    * pruning converts into skipped IO. */
  def zorderRepartition(
      df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 16): DataFrame =
    zValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")

  /** Bucketed + sorted table write — the co-located-join layout: two
    * tables bucketed the same way on their join key SortMergeJoin with
    * ZERO exchanges and zero sorts (the bucket files ARE the shuffle
    * output, persisted once at write time and amortized over every
    * future join/aggregation on that key — the classic warehouse
    * fact-table discipline, and the right call at 100 TB whenever a key
    * is joined more than once). LayoutSpec asserts the exchange-free
    * plan. Requires a table catalog (`saveAsTable`); plain
    * `.parquet(path)` writes cannot carry bucket metadata. */
  def bucketedWrite(
      df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key).sortBy(key).saveAsTable(table)

  /** Hive-style partitioned layout — the FIRST-order 100 TB lever:
    * `partitionBy` low-cardinality filter columns (day, source, lang)
    * so a predicate on them prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan — files outside the matching
    * partitions are never listed, let alone read). Z-order/row-group
    * pruning refines WITHIN a partition; this skips partitions
    * entirely. Keep partition cardinality in the hundreds-to-thousands
    * (a per-user partition layout is a small-file catastrophe — that's
    * what bucketing is for). LayoutSpec asserts the pruned scan. */
  def partitionedWrite(
      df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Small-file compaction — the table-maintenance pass every
    * streaming/incremental writer eventually owes (a micro-batch
    * sink emits files per trigger; a year later the table is a
    * million 200 KB files and every scan pays a million opens):
    * rewrite `inPath` to `outPath` sized so each output file targets
    * `targetBytes` of INPUT footprint. File count comes from the
    * actual on-disk byte sum (Hadoop FS listing — works on any
    * FileSystem impl), not a row-count guess, so compression ratio
    * changes don't skew it. Uses coalesce (no shuffle) — partition
    * mixing is acceptable for compaction; use [[zorderRepartition]]
    * first when clustering matters. Returns the ACTUAL output file
    * count (an FS listing of `outPath`, not the planned n — coalesce
    * cannot raise the partition count, so when the input has fewer
    * partitions than the plan the write emits fewer files). */
  def compactTo(
      spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes >= 1024 * 1024, "targetBytes >= 1 MiB")
    val bytes = graft.util.Fs.sizeBytes(inPath)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    graft.util.Fs.countDataFiles(outPath)
  }
}
