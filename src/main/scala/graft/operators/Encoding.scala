package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E1/E2: the encoding pre-processing contract (next-plaid-onnx
  * ColbertConfig lib.rs:559-668; query encode :1501-1511, document
  * encode :1118-1140). ONNX inference itself is out of scope (the engine
  * accepts precomputed embeddings — SURVEY §2.6); these operators
  * reproduce the text-side semantics the embeddings must have been
  * produced under, so a mapPartitions ONNX stage can slot in after them
  * unchanged:
  *
  *  - queries: `[Q]` marker prefix, then PAD/EXPAND with `[MASK]` tokens
  *    to `queryLength` (default 48, do_query_expansion=true);
  *  - documents: `[D]` marker prefix, TRUNCATE at `documentLength`
  *    (default 300), punctuation-only tokens dropped (the skiplist).
  */
object Encoding {

  val QueryMarker = "[Q]"
  val DocMarker = "[D]"
  val MaskToken = "[MASK]"
  val DefaultQueryLength = 48
  val DefaultDocumentLength = 300

  /** Whitespace pre-tokenization with punctuation-only tokens dropped
    * (the skiplist filter of encode_documents). */
  private[operators] def preTokenize(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.split("\\s+").toSeq
      .filter(t => t.nonEmpty && t.exists(_.isLetterOrDigit))

  /** E1: `[Q] text` expanded with [MASK] to exactly `queryLength`
    * tokens (truncated if longer). */
  def prepareQuery(text: String, queryLength: Int = DefaultQueryLength,
      expand: Boolean = true): Seq[String] = {
    val base = (QueryMarker +: preTokenize(text)).take(queryLength)
    if (expand && base.length < queryLength)
      base ++ Seq.fill(queryLength - base.length)(MaskToken)
    else base
  }

  /** E2: `[D] text` truncated at `documentLength` tokens. */
  def prepareDocument(text: String, documentLength: Int = DefaultDocumentLength): Seq[String] =
    (DocMarker +: preTokenize(text)).take(documentLength)

  /** Column forms (codegen'd, for bulk pre-processing). */
  def prepareQueryCol(textCol: Column, queryLength: Int = DefaultQueryLength): Column =
    slice(concat(
      array(lit(QueryMarker)),
      filter(split(textCol, "\\s+"), t => t.rlike("[\\p{L}\\p{N}]")),
      array_repeat(lit(MaskToken), queryLength)
    ), 1, queryLength)

  def prepareDocumentCol(textCol: Column, documentLength: Int = DefaultDocumentLength): Column =
    slice(concat(
      array(lit(DocMarker)),
      filter(split(textCol, "\\s+"), t => t.rlike("[\\p{L}\\p{N}]"))
    ), 1, documentLength)
}
