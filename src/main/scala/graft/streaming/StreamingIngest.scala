package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.index.{UpdateConfig, Updater}

/** Structured Streaming ingestion — the reference's "streaming" is
  * incremental batch appends behind `POST /update` (SURVEY §1.1, §3.2:
  * per-index semaphore serializes updates; no true stream engine). The
  * Spark-native equivalent: a `foreachBatch` sink that funnels every
  * micro-batch through the U1 update dispatcher, so the buffer /
  * centroid-expansion / rebuild thresholds apply to streams unchanged.
  * Micro-batches arrive serially per query — the same serialization
  * guarantee as the reference's update semaphore.
  */
object StreamingIngest {

  /** Wrap a streaming `docs(doc_id, embeddings)` source into an index
    * updater sink. `doc_id` is the id LOCAL to each micro-batch
    * (0..n-1); the dispatcher offsets it into the global dense space.
    * Call `.start()` on the result (optionally after `.trigger(...)`). */
  def indexSink(
      docs: DataFrame,
      indexPath: String,
      cfg: UpdateConfig = UpdateConfig(),
      checkpoint: Option[String] = None
  ): DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // re-densify the batch's local ids (a stream micro-batch has
          // no id contract) then hand off to the U1 dispatcher
          val local = batch.select("doc_id", "embeddings")
            .orderBy("doc_id")
          val withLocal = graft.meta.MetadataOps.denseResequenceScalable(
            local, "doc_id", spark.sessionState.conf.numShufflePartitions)
            .select(col("new_id").as("doc_id"), col("embeddings"))
          Updater.update(spark, indexPath, withLocal, cfg): Unit
        }
      }
    checkpoint.map(c => w.option("checkpointLocation", c)).getOrElse(w)
  }

  /** Event-time tumbling-window aggregation with a watermark — the
    * streaming twin of the `st_window_agg` declared query. Input needs
    * `ts: timestamp`, `event_type`, `value`. */
  def windowedAgg(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a bounded ingestion stream to completion (tests / backfills):
    * processes all available data then stops. */
  def runOnce(writer: DataStreamWriter[org.apache.spark.sql.Row]): StreamingQuery = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
