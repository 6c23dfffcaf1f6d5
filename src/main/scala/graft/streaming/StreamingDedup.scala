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

  final case class BandRow(doc_id: Long, band: Int, band_sig: Long)
  final case class PairRow(a: Long, b: Long, band: Int, band_sig: Long)
  final case class BucketState(ids: List[Long], poisoned: Boolean)

  /** Streaming MinHash-LSH near-duplicate candidates — the stateful
    * counterpart of `Dedup.{shingles,minhashSignatures,lshBands,
    * candidatePairs}`. Per-doc band signatures are computed locally in a
    * map ([[Dedup.localBandSigs]], the byte-identical twin of the batch
    * pipeline — zero extra shuffle), rows are keyed by (band, band_sig)
    * — the SAME key the batch bucket join shuffles on — and bucket state
    * holds the doc ids seen so far: each arriving doc emits one
    * candidate pair against every doc already resident in its bucket.
    *
    * Skew guard, streamed: the batch drops over-`maxBucketSize` buckets
    * retroactively; a stream cannot retract emitted pairs, so a bucket
    * that crosses the cap is POISONED — it stops emitting and stays
    * silent forever (prefix-of-batch semantics; on corpora where no
    * bucket exceeds the cap the candidate-pair SET is identical to the
    * batch operator, which the spec asserts). State per bucket is the id
    * list (≤ cap) — at 100 TB the store scales with distinct occupied
    * buckets, the same cardinality the batch shuffle materializes.
    *
    * Emitted pairs carry (band, band_sig); distinct (a, b) — the batch
    * output contract — is one `dropDuplicates` in the consumer's
    * `foreachBatch`, where cross-band duplicates collapse. */
  def lshCandidates(docs: DataFrame, shingleSize: Int = 3, numPerm: Int = 8,
      rowsPerBand: Int = 2, maxBucketSize: Int = 10000): Dataset[PairRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Dedup.localBandSigs(text, shingleSize, numPerm, rowsPerBand)
          .map { case (band, sig) => BandRow(id, band, sig) }
      }
      .groupByKey(r => (r.band, r.band_sig))
      .flatMapGroupsWithState[BucketState, PairRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Nil, poisoned = false))
          if (st.poisoned) Iterator.empty
          else {
            val incoming = rows.map(_.doc_id).toSeq.distinct.sorted
              .filterNot(st.ids.contains)
            var resident = st.ids
            var poisoned = false
            val out = scala.collection.mutable.ArrayBuffer.empty[PairRow]
            incoming.foreach { d =>
              if (!poisoned) {
                if (resident.size + 1 > maxBucketSize) poisoned = true
                else {
                  resident.foreach { r =>
                    out += PairRow(math.min(r, d), math.max(r, d), key._1, key._2)
                  }
                  resident = d :: resident
                }
              }
            }
            state.update(BucketState(resident, poisoned))
            out.iterator
          }
      }
  }

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
