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
            // Set membership + an explicit size counter: a near-cap hot
            // bucket (the exact bucket the poison guard exists for) would
            // otherwise pay O(|bucket|) List.contains per arriving doc
            // and O(|bucket|) List.size per admission — O(n·m + n²) per
            // trigger at cap 10k. Emission order and state layout are
            // unchanged (byte-identical output).
            val residentSet = st.ids.toSet
            val incoming = rows.map(_.doc_id).toSeq.distinct.sorted
              .filterNot(residentSet.contains)
            var resident = st.ids
            var residentN = residentSet.size
            var poisoned = false
            val out = scala.collection.mutable.ArrayBuffer.empty[PairRow]
            incoming.foreach { d =>
              if (!poisoned) {
                if (residentN + 1 > maxBucketSize) poisoned = true
                else {
                  resident.foreach { r =>
                    out += PairRow(math.min(r, d), math.max(r, d), key._1, key._2)
                  }
                  resident = d :: resident
                  residentN += 1
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

  final case class BloomState(bits: Array[Byte])

  /** BOUNDED-MEMORY approximate first-seen — the 100 TB answer to
    * [[firstSeen]]'s one honest scale limit: exact state grows with the
    * number of DISTINCT documents forever (billions of keys → the state
    * store itself becomes the big table). Here the stream shuffles on
    * `pmod(hash, numBuckets)` and each bucket's state is a fixed Bloom
    * bitset (double hashing, `numHashes` probes derived from the 60-bit
    * content hash), so TOTAL state is `numBuckets × bitsPerBucket/8`
    * bytes — constant for the stream's lifetime regardless of corpus
    * size.
    *
    * Semantics: a true duplicate is ALWAYS suppressed (Bloom filters
    * have no false negatives), and a novel document is dropped with
    * probability ≈ (1−e^(−kn/m))^k — the classic trade: with the
    * defaults and 1M distinct docs/bucket that is <1% loss. Use the
    * exact operator while the distinct count fits the state store;
    * switch to this when it doesn't. Within-batch duplicates collapse
    * to the smallest doc_id (the keep-min rule), matching exactDedup. */
  def firstSeenApprox(
      docs: DataFrame,
      numBuckets: Int = 1024,
      bitsPerBucket: Int = 1 << 23, // 1 MiB/bucket → 1 GiB total at defaults
      numHashes: Int = 7): Dataset[DocRow] = {
    require(Integer.bitCount(bitsPerBucket) == 1,
      s"bitsPerBucket must be a power of two, got $bitsPerBucket")
    require(numHashes >= 1 && numBuckets >= 1, "need k >= 1, buckets >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("text_hash", md5(Dedup.normText(col("text"))))
      .select("doc_id", "text", "text_hash")
      .as[DocRow]
      .groupByKey(r =>
        (java.lang.Long.parseLong(r.text_hash.take(15), 16) % numBuckets).toInt)
      .flatMapGroupsWithState[BloomState, DocRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[DocRow], state: GroupState[BloomState]) =>
          val bits = state.getOption.map(_.bits)
            .getOrElse(new Array[Byte](bitsPerBucket / 8))
          def probes(hashHex: String): Array[Int] = {
            // double hashing over the two md5 halves: p_i = h1 + i*h2
            val h1 = java.lang.Long.parseLong(hashHex.substring(0, 15), 16)
            val h2 = java.lang.Long.parseLong(hashHex.substring(15, 30), 16) | 1L
            Array.tabulate(numHashes)(i =>
              (((h1 + i * h2) % bitsPerBucket + bitsPerBucket) % bitsPerBucket).toInt)
          }
          def maybeNew(ps: Array[Int]): Boolean =
            ps.exists(p => (bits(p >> 3) & (1 << (p & 7))) == 0)
          def setAll(ps: Array[Int]): Unit =
            ps.foreach(p => bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte)
          val out = rows.toSeq
            .groupBy(_.text_hash).valuesIterator
            .map(_.minBy(_.doc_id)) // keep-min within the batch
            .toSeq.sortBy(_.doc_id)
            .flatMap { r =>
              val ps = probes(r.text_hash)
              if (maybeNew(ps)) { setAll(ps); Some(r) } else None
            }
          state.update(BloomState(bits))
          out.iterator
      }
  }
}
