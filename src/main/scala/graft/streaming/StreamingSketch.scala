package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HyperLogLog maintenance — the stateful counterpart of
  * `Sketches.hllRegisters`: registers are max-monotone, so a stream
  * keyed on the bucket id carries ONE long of state per bucket (total
  * state = m longs, constant for the stream's lifetime) and emits a
  * row only when a bucket's register RISES. The emitted change-log
  * compacts to the batch sketch: last-emitted register per bucket
  * (0 for never-emitted buckets) equals `hllRegisters` over everything
  * the stream has seen — the merge law (per-bucket max) IS the update
  * rule, which is what makes the sketch streaming-native where an
  * exact distinct-count's state grows with the distinct cardinality.
  *
  * The hash/bucket/rho math is byte-identical to the batch operator
  * (same md5→60-bit recipe, JVM-side this time), so a streamed sketch
  * and a batch sketch of the same rows are interchangeable —
  * StreamingSketchSpec asserts equality across multi-batch runs.
  */
object StreamingSketch {

  final case class RegisterRow(bucket: Long, register: Long)
  final case class RegState(register: Long)

  /** `values(valueCol)` (streaming) → change-log of
    * `(bucket, register)` rows, emitted when a register rises. */
  def hllUpdates(
      values: DataFrame, valueCol: String, m: Int = 128): Dataset[RegisterRow] = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [2, 4096], got $m")
    val w = 60 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
    val spark = values.sparkSession
    import spark.implicits._
    values.select(col(valueCol).cast("string").as("v")).as[String]
      .mapPartitions { it =>
        // one digest per partition, not per row (MessageDigest.digest
        // resets the instance, so reuse is safe); the hash bytes and
        // bucket/rho math stay byte-identical to the per-row version
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { v =>
          val digest = md.digest(v.getBytes("UTF-8"))
          // 60-bit prefix = first 7.5 bytes, matching
          // parseLong(hexString.take(15), 16) of the old formulation
          var h = 0L
          var i = 0
          while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
          h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
          val rest = h / m
          val rho =
            if (rest == 0L) (w + 1).toLong
            else (w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))).toLong
          RegisterRow(h % m, rho)
        }
      }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[RegState, RegisterRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[RegisterRow], state: GroupState[RegState]) =>
          val incoming = rows.map(_.register).max
          val current = state.getOption.map(_.register).getOrElse(0L)
          if (incoming > current) {
            state.update(RegState(incoming))
            Iterator.single(RegisterRow(bucket, incoming))
          } else Iterator.empty
      }
  }

  // -------------------------------------------- histogram maintenance

  /** Incremental HISTOGRAM maintenance (the sum-monoid sibling of the
    * max-monoid HLL above), run from `foreachBatch`: each micro-batch
    * builds its own fixed-domain sketch
    * ([[graft.pipeline.Sketches.histSketchBy]]) and merges (per-bin
    * sum) into a versioned state table — "p99 of everything seen so
    * far" at stream speed with bounded state (|groups| × bins
    * integers), never re-reading history.
    *
    * Exactly-once: state versions are keyed by batchId
    * (`statePath/v{batchId}`); a replayed batch (foreachBatch is
    * at-least-once after recovery) finds its version present and
    * skips — the [[StreamingIngest]] replay-guard discipline. Versions
    * chain: v_i = merge(v_{latest<i}, sketch(batch_i)). */
  def mergeHistBatch(
      batch: DataFrame, batchId: Long, statePath: String,
      groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): Unit = {
    val vdir = s"$statePath/v$batchId"
    if (!graft.util.Fs.exists(s"$vdir/_SUCCESS")) {
      val cur = graft.pipeline.Sketches
        .histSketchBy(batch, groupCols, valueCol, lo, hi, bins)
      val merged = latestBefore(batch.sparkSession, statePath, batchId)
        .map(prev => graft.pipeline.Sketches.histMerge(Seq(prev, cur), groupCols))
        .getOrElse(cur)
      merged.write.mode("overwrite").parquet(vdir)
    }
  }

  /** The current merged histogram (latest committed version), or None
    * before any batch committed. */
  def currentState(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      maxBatches: Long = 10000L): Option[DataFrame] =
    latestBefore(spark, statePath, maxBatches)

  private def latestBefore(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      batchId: Long): Option[DataFrame] =
    (0L until batchId).reverse
      .find(i => graft.util.Fs.exists(s"$statePath/v$i/_SUCCESS"))
      .map(i => spark.read.parquet(s"$statePath/v$i"))
}
