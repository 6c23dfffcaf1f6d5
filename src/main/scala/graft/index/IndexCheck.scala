package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index fsck — cross-table invariant validation for a
  * [[MultiVectorIndex]] directory.
  *
  * The write path follows the reference's temp-file + atomic-rename
  * discipline PER TABLE (utils.rs:16-60), but an append/delete spans
  * five tables plus the manifest, and a crash between table writes
  * leaves the set mutually inconsistent (documented non-atomic windows
  * in [[Updater.append]]/[[Updater.deleteFrom]]/mode-3 update — callers
  * needing atomicity snapshot the directory). At 100 TB "restore the
  * snapshot" needs a cheap way to decide WHETHER the index is
  * consistent first; this is that tool. Every check is one aggregate
  * over a table (or one equi-join for cross-table containment) — no
  * collect beyond a scalar row per check, so it runs at corpus scale.
  *
  * Checks (the dense-id invariant is the reference's `_subset_`/FTS
  * alignment contract, index.rs:1826-1843):
  *   - `manifest_docs`:      manifest num_documents == doclens rows
  *   - `dense_ids`:          doclens ids are exactly 0..N-1
  *   - `manifest_embeddings`: manifest num_embeddings == tokens rows
  *   - `doc_codes_rows`:     doc_codes rows == doclens rows
  *   - `tokens_vs_doclens`:  per-doc token count == len for every doc,
  *                           and no token row for an unknown doc
  *   - `codes_vs_doclens`:   size(codes) == len for every doc
  *   - `code_range`:         every token/IVF code in [0, numCentroids)
  *   - `ivf_pairs`:          IVF (code, doc) postings == the distinct
  *                           (code, doc) pairs of the tokens table
  *
  * Returns `(check, ok, expected, actual)` — one row per check;
  * `ok = false` rows carry the mismatching counts. [[isConsistent]]
  * reduces it to a Boolean for scripting.
  */
object IndexCheck {

  def validate(spark: SparkSession, idx: MultiVectorIndex): DataFrame = {
    import spark.implicits._
    val doclens = idx.doclens.select(col("doc_id"), col("len").cast("long").as("len"))
    val tokens = idx.tokens.select("doc_id", "tok", "code")
    val docCodes = idx.docCodes.select(col("doc_id"), size(col("codes")).cast("long").as("ncodes"))
    val ivf = idx.ivf.select("code", "doc_ids")
    val k = idx.codec.numCentroids.toLong

    val nDocsManifest = idx.numDocuments
    val nEmbManifest = idx.manifest("num_embeddings").toLong

    val dl = doclens.agg(
      count(lit(1)).as("n"),
      coalesce(min("doc_id"), lit(-1L)).as("lo"),
      coalesce(max("doc_id"), lit(-1L)).as("hi"),
      countDistinct("doc_id").as("nd")).head()
    val nDocs = dl.getLong(0)
    val (dlLo, dlHi, dlNd) = (dl.getLong(1), dl.getLong(2), dl.getLong(3))
    val denseOk = nDocs == 0 ||
      (dlLo == 0L && dlHi == nDocs - 1 && dlNd == nDocs)
    // report the bound that actually violated density: a gapped range
    // with a matching distinct count would otherwise print
    // expected == actual on a failing row, hiding the cause
    val (denseExp, denseAct) =
      if (denseOk || dlNd != nDocs) (nDocs, dlNd)
      else if (dlLo != 0L) (0L, dlLo)
      else (nDocs - 1, dlHi)

    val nTok = tokens.count()
    val nDocCodes = docCodes.count()

    // per-doc token count vs len in one outer join; a doc missing from
    // either side or with a count mismatch is a violation
    val tokPerDoc = tokens.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
    val tokMismatch = doclens.join(tokPerDoc, Seq("doc_id"), "full_outer")
      .filter(col("len").isNull || col("ntok").isNull || col("len") =!= col("ntok"))
      .count()

    val codesMismatch = doclens.join(docCodes, Seq("doc_id"), "full_outer")
      .filter(col("len").isNull || col("ncodes").isNull || col("len") =!= col("ncodes"))
      .count()

    val badTokenCodes = tokens.filter(col("code") < 0 || col("code") >= k).count()
    val badIvfCodes = ivf.filter(col("code") < 0 || col("code") >= k).count()

    // IVF postings == distinct (code, doc) pairs of the tokens table
    val tokenPairs = tokens.select("code", "doc_id").distinct()
    val ivfPairs = ivf.select(col("code"), explode(col("doc_ids")).as("doc_id"))
    val pairDiff = ivfPairs.except(tokenPairs).count() +
      tokenPairs.except(ivfPairs).count()

    Seq(
      ("manifest_docs", nDocsManifest == nDocs, nDocsManifest, nDocs),
      ("dense_ids", denseOk, denseExp, denseAct),
      ("manifest_embeddings", nEmbManifest == nTok, nEmbManifest, nTok),
      ("doc_codes_rows", nDocCodes == nDocs, nDocs, nDocCodes),
      ("tokens_vs_doclens", tokMismatch == 0L, 0L, tokMismatch),
      ("codes_vs_doclens", codesMismatch == 0L, 0L, codesMismatch),
      ("code_range", badTokenCodes + badIvfCodes == 0L, 0L, badTokenCodes + badIvfCodes),
      ("ivf_pairs", pairDiff == 0L, 0L, pairDiff)
    ).toDF("check", "ok", "expected", "actual")
  }

  /** True iff every [[validate]] check passes. */
  def isConsistent(spark: SparkSession, idx: MultiVectorIndex): Boolean =
    validate(spark, idx).filter(!col("ok")).isEmpty

  /** FTS-side fsck over a [[graft.fts.FtsIndex]]'s two tables (the F3
    * lifecycle spans postings + doclens + fts.json — same per-table
    * atomicity, same cross-table windows):
    *   - `postings_keys`: (term, doc_id) is a key (no duplicate rows)
    *   - `tf_positive` / `dl_positive`: counts are ≥ 1
    *   - `dl_vs_postings`: per-doc Σtf == dl for EVERY doc, both ways
    *     (a doc in one table and not the other is a violation)
    *   - `ids_in_range` (when `numDocs` is given, e.g. the paired
    *     [[MultiVectorIndex.numDocuments]]): doc ids sit in [0, N) —
    *     the `_subset_` ≡ doc_id alignment invariant after delete-sync.
    */
  def validateFts(spark: SparkSession, fts: graft.fts.FtsIndex,
      numDocs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val p = fts.postings.select(col("term"), col("doc_id"),
      col("tf").cast("long").as("tf"))
    val dl = fts.doclens.select(col("doc_id"), col("dl").cast("long").as("dl"))
    val nP = p.count()
    val nKeys = p.select("term", "doc_id").distinct().count()
    val badTf = p.filter(col("tf") < 1).count()
    val badDl = dl.filter(col("dl") < 1).count()
    val sums = p.groupBy("doc_id").agg(sum("tf").as("stf"))
    val dlMismatch = dl.join(sums, Seq("doc_id"), "full_outer")
      .filter(col("dl").isNull || col("stf").isNull || col("dl") =!= col("stf"))
      .count()
    val outOfRange = numDocs.map { n =>
      p.select("doc_id").union(dl.select("doc_id"))
        .filter(col("doc_id") < 0 || col("doc_id") >= n).count()
    }
    val base = Seq(
      ("postings_keys", nKeys == nP, nP, nKeys),
      ("tf_positive", badTf == 0L, 0L, badTf),
      ("dl_positive", badDl == 0L, 0L, badDl),
      ("dl_vs_postings", dlMismatch == 0L, 0L, dlMismatch)) ++
      outOfRange.map(o => ("ids_in_range", o == 0L, 0L, o))
    base.toDF("check", "ok", "expected", "actual")
  }
}
