package graft.fts

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Fs

/** Persisted full-text index — the F3 lifecycle the round-1 engine
  * lacked (reference text_search.rs: index :463-502, delete :503-578,
  * update_rows :579-686, rebuild :839-948; FTS5 content-sync replaced by
  * parquet posting/doclen tables):
  *
  * {{{
  * <path>/postings/   (term, doc_id, tf)    partitioned by term hash
  * <path>/doclens/    (doc_id, dl)
  * <path>/fts.json    {tokenizer}
  * }}}
  *
  * Searches read the persisted postings (no per-query re-tokenization of
  * the corpus); maintenance ops are bounded by the touched docs — delete
  * is an anti-join, update_rows re-tokenizes only the changed rows.
  */
final class FtsIndex(val spark: SparkSession, val path: String) {
  lazy val postings: DataFrame = spark.read.parquet(s"$path/postings")
  lazy val doclens: DataFrame = spark.read.parquet(s"$path/doclens")

  lazy val tokenizerName: String = {
    val node = graft.index.MultiVectorIndex.jsonMapper.readTree(
      Fs.readBytes(s"$path/fts.json"))
    node.get("tokenizer").asText()
  }

  /** F4/F5 search over the persisted postings + doclens. */
  def search(query: String, topK: Int, subset: Option[DataFrame] = None): DataFrame =
    Fts.search(spark, postings, query, topK, tokenizerName, subset,
      doclensOpt = Some(doclens))
}

object FtsIndex {

  /** Postings files are sorted by term (partition-local — no extra
    * shuffle beyond the build aggregation), so a term-filtered scan
    * (every BM25 query) prunes parquet row groups via min/max term
    * stats instead of reading the whole table. */
  private def writePostings(spark: SparkSession, postings: DataFrame, path: String): Unit =
    Fs.rewrite(postings.sortWithinPartitions("term", "doc_id"), s"$path/postings")

  def build(
      spark: SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      path: String,
      tokenizerName: String = "unicode61"): FtsIndex = {
    writePostings(spark, Fts.buildPostings(docs, idCol, textCol, tokenizerName), path)
    // doclens from the source text (one narrow scan), not a second
    // aggregation over the exploded postings
    Fs.rewrite(Fts.docLengthsOf(docs, idCol, textCol, tokenizerName), s"$path/doclens")
    val node = graft.index.MultiVectorIndex.jsonMapper.createObjectNode()
    node.put("tokenizer", tokenizerName)
    Fs.writeBytes(s"$path/fts.json",
      graft.index.MultiVectorIndex.jsonMapper.writeValueAsBytes(node))
    new FtsIndex(spark, path)
  }

  /** Reuse an existing artifact if present (declared queries share one
    * build per scale factor within a run). `sourceFp` — when non-empty —
    * keys the reuse on the SOURCE DATA's content fingerprint
    * (`Fs.fingerprint` of the parquet the docs came from), not just the
    * cache path: regenerated testdata under the same path forces a
    * rebuild instead of silently serving a stale index. */
  def buildIfMissing(
      spark: SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      path: String,
      tokenizerName: String = "unicode61",
      sourceFp: String = ""): FtsIndex =
    if (Fs.exists(s"$path/fts.json") &&
        (sourceFp.isEmpty || Fs.cacheFresh(path, sourceFp)))
      new FtsIndex(spark, path)
    else {
      Fs.deleteRecursively(path)
      val idx = build(spark, docs, idCol, textCol, path, tokenizerName)
      if (sourceFp.nonEmpty) Fs.stampCache(path, sourceFp)
      idx
    }

  /** F3 delete with optional dense re-sequencing of surviving doc ids
    * (the index.rs:1826-1843 alignment invariant — pass the same ids the
    * vector index deleted). */
  def delete(idx: FtsIndex, deleteIds: Seq[Long], renumber: Boolean = true): FtsIndex = {
    import idx.spark.implicits._
    deleteFrom(idx, deleteIds.toDF("doc_id"), renumber)
  }

  /** DataFrame-native delete (deletion set never passes through the
    * driver; mapping joins planned by size from the parquet stats). */
  def deleteFrom(idx: FtsIndex, del: DataFrame, renumber: Boolean = true): FtsIndex = {
    val spark = idx.spark
    val survivors = idx.doclens.select("doc_id")
      .join(del.select("doc_id"), Seq("doc_id"), "left_anti")
    val mapping =
      if (renumber)
        graft.meta.MetadataOps.denseResequenceScalable(
          survivors, "doc_id", spark.sessionState.conf.numShufflePartitions)
          .select(col("doc_id"), col("new_id"))
      else survivors.select(col("doc_id"), col("doc_id").as("new_id"))
    Fs.rewrite(mapping, s"${idx.path}/delete_map")
    val mapDf = spark.read.parquet(s"${idx.path}/delete_map")
    writePostings(spark, idx.postings.join(mapDf, "doc_id")
      .select(col("term"), col("new_id").as("doc_id"), col("tf")),
      idx.path)
    Fs.rewrite(idx.doclens.join(mapDf, "doc_id")
      .select(col("new_id").as("doc_id"), col("dl")), s"${idx.path}/doclens")
    new FtsIndex(spark, idx.path)
  }

  /** Append postings for NEW doc ids (no collision with existing ids —
    * the caller guarantees freshness, e.g. an `addDocuments` batch).
    * Pure parquet file additions: postings and doclens of untouched docs
    * are byte-identical afterwards, so ingest cost is O(batch), not
    * O(corpus) (the reference's incremental FTS5 update_rows contract,
    * text_search.rs:579-686). */
  def appendRows(idx: FtsIndex, docs: DataFrame, idCol: String, textCol: String): FtsIndex = {
    val fresh = Fts.buildPostings(docs, idCol, textCol, idx.tokenizerName)
    Fs.appendTable(fresh.sortWithinPartitions("term", "doc_id"),
      s"${idx.path}/postings")
    Fs.appendTable(Fts.docLengthsOf(docs, idCol, textCol, idx.tokenizerName),
      s"${idx.path}/doclens")
    new FtsIndex(idx.spark, idx.path)
  }

  /** Apply an externally-computed old→new doc-id mapping (inner join:
    * unmapped docs are dropped). This is how the FTS follows the vector
    * index's delete re-sequencing EXACTLY — renumbering the FTS's own id
    * set independently diverges as soon as some docs have no metadata
    * (the FTS id set is then a strict subset of the index ids).
    * `mapping(doc_id, new_id)`. */
  def applyDeleteMapping(idx: FtsIndex, mapping: DataFrame): FtsIndex = {
    val spark = idx.spark
    val mapDf = mapping.select(col("doc_id"), col("new_id"))
    writePostings(spark, idx.postings.join(mapDf, "doc_id")
      .select(col("term"), col("new_id").as("doc_id"), col("tf")),
      idx.path)
    Fs.rewrite(idx.doclens.join(mapDf, "doc_id")
      .select(col("new_id").as("doc_id"), col("dl")), s"${idx.path}/doclens")
    new FtsIndex(spark, idx.path)
  }

  /** F3 update_rows: replace the postings of the given docs with their
    * new text — cost bounded by the changed rows only. `docs(doc_id,
    * text)`. */
  def updateRows(idx: FtsIndex, docs: DataFrame, idCol: String, textCol: String): FtsIndex = {
    val spark = idx.spark
    val changed = docs.select(col(idCol).as("doc_id")).distinct()
    val fresh = Fts.buildPostings(docs, idCol, textCol, idx.tokenizerName)
    val kept = idx.postings.join(broadcast(changed), Seq("doc_id"), "left_anti")
    writePostings(spark, kept.unionByName(fresh), idx.path)
    // doclens patched the same way: untouched rows kept, changed docs
    // recomputed from their text — O(changed), not a full postings re-agg
    Fs.rewrite(idx.doclens.join(broadcast(changed), Seq("doc_id"), "left_anti")
      .unionByName(Fts.docLengthsOf(docs, idCol, textCol, idx.tokenizerName)),
      s"${idx.path}/doclens")
    new FtsIndex(spark, idx.path)
  }

  /** F3 rebuild: full re-tokenization from the source table. */
  def rebuild(idx: FtsIndex, docs: DataFrame, idCol: String, textCol: String): FtsIndex =
    build(idx.spark, docs, idCol, textCol, idx.path, idx.tokenizerName)

  /** F1 metadata_to_text (text_search.rs:269-305): concatenate every
    * string and number leaf of a JSON document, recursively, in field
    * order. */
  def metadataToText(json: String): String = {
    if (json == null) return null
    val node =
      try graft.index.MultiVectorIndex.jsonMapper.readTree(json)
      catch { case _: Exception => return "" }
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.isTextual) parts += n.asText()
      else if (n.isNumber) parts += n.numberValue().toString
      else if (n.isArray) { val it = n.elements(); while (it.hasNext) walk(it.next()) }
      else if (n.isObject) { val it = n.properties().iterator(); while (it.hasNext) walk(it.next().getValue) }
    }
    walk(node)
    parts.mkString(" ")
  }

  val metadataToTextUdf = udf((json: String) => metadataToText(json))
}
