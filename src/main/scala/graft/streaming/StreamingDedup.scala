package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Dedup

/** Streaming exact dedup — the stateful-stream counterpart of
  * `Dedup.exactDedup`: keyed by normalized-text hash via
  * `flatMapGroupsWithState`, only the FIRST document ever seen with a
  * given hash passes through; later duplicates (same batch or any later
  * batch) are dropped. State per key is one boolean — at 100 TB the
  * state store scales with the number of DISTINCT documents, and the
  * shuffle is the same hash key the batch operator groups on.
  */
object StreamingDedup {

  final case class DocRow(doc_id: Long, text: String, text_hash: String)
  final case class SeenState(seen: Boolean)

  /** `docs(doc_id, text)` (streaming) → first-seen rows
    * `(doc_id, text, text_hash)`. */
  def firstSeen(docs: DataFrame): Dataset[DocRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("text_hash", md5(Dedup.normText(col("text"))))
      .select("doc_id", "text", "text_hash")
      .as[DocRow]
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState[SeenState, DocRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocRow], state: GroupState[SeenState]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(SeenState(seen = true))
            // within-batch duplicates collapse to the smallest doc_id
            // (exactDedup's keep-min rule)
            val first = rows.minBy(_.doc_id)
            Iterator.single(first)
          }
      }
  }
}
