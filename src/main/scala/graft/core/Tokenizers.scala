package graft.core

import scala.collection.mutable.ArrayBuffer

/** Text tokenizers with the semantics of the reference FTS layer
  * (next-plaid/src/text_search.rs:68-267):
  *
  *  - `unicode61`: lowercase word tokens split on non-alphanumeric
  *    (FTS5 unicode61 default segmentation, ASCII-folded here);
  *  - `trigram`: sliding character 3-grams over the lowercased text;
  *  - `identifierAware`: unicode61 over identifiers pre-split on
  *    camelCase / PascalCase / snake_case boundaries, emitting the
  *    compound, each sub-part, and adjacent-pair `a_b` bigrams
  *    (text_search.rs:118-251).
  *
  * Pure functions, shared by the Spark UDFs and the unit tests.
  */
object Tokenizers {

  /** unicode61-style word tokenizer: maximal runs of letters/digits
    * (unicode-aware), lowercased. */
  def unicode61(text: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      if (Character.isLetterOrDigit(text.charAt(i))) {
        val start = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
        out += text.substring(start, i).toLowerCase
      } else i += 1
    }
    out.toSeq
  }

  /** Character trigrams over the lowercased raw text (FTS5 trigram
    * tokenizer: includes spaces/punctuation inside grams). */
  def trigram(text: String): Seq[String] = {
    val lower = text.toLowerCase
    if (lower.length < 3) Seq.empty
    else (0 to lower.length - 3).map(i => lower.substring(i, i + 3))
  }

  /** Split one identifier into [compound, parts..., adjacent-pair bigrams]
    * per text_search.rs:118-147. */
  def splitIdentifier(token: String): Seq[String] = {
    val lower = token.toLowerCase
    val parts: Seq[String] =
      if (token.contains('_')) lower.split('_').filter(_.nonEmpty).toSeq
      else camelSplit(token)
    if (parts.length >= 2) {
      val out = ArrayBuffer[String](lower)
      out ++= parts
      parts.sliding(2).foreach(w => out += s"${w(0)}_${w(1)}")
      out.toSeq
    } else Seq(lower)
  }

  /** camelCase / PascalCase / acronym / digit-run splitter
    * (text_search.rs:155-218). ASCII-only by design. */
  def camelSplit(token: String): Seq[String] = {
    val parts = ArrayBuffer.empty[String]
    val n = token.length
    var i = 0
    while (i < n) {
      val c = token.charAt(i)
      if (c.isDigit) {
        val start = i
        while (i < n && token.charAt(i).isDigit) i += 1
        parts += token.substring(start, i)
      } else if (!isAsciiAlpha(c)) {
        i += 1
      } else if (isAsciiUpper(c)) {
        val start = i
        while (i + 1 < n && isAsciiUpper(token.charAt(i + 1))) i += 1
        if (i + 1 < n && isAsciiUpper(token.charAt(i)) &&
            isAsciiLower(token.charAt(i + 1)) && i > start) {
          // HTTPResponse: the last uppercase belongs to the next word.
          parts += token.substring(start, i).toLowerCase
        } else {
          i += 1
          while (i < n && isAsciiLower(token.charAt(i))) i += 1
          parts += token.substring(start, i).toLowerCase
        }
      } else {
        val start = i
        while (i < n && isAsciiLower(token.charAt(i))) i += 1
        parts += token.substring(start, i).toLowerCase
      }
    }
    parts.toSeq
  }

  /** Identifier-aware tokenization of free text (text_search.rs:220-251):
    * identifiers = ASCII [A-Za-z_][A-Za-z0-9_]*, each expanded via
    * splitIdentifier; everything else is a separator. */
  def tokenizeIdentifiers(text: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isAsciiAlpha(c) || c == '_') {
        val start = i
        i += 1
        while (i < n && (isAsciiAlphaNum(text.charAt(i)) || text.charAt(i) == '_')) i += 1
        out ++= splitIdentifier(text.substring(start, i))
      } else i += 1
    }
    out.toSeq
  }

  /** FTS5 operator words stripped by the reference's sanitizer. */
  private val Fts5Operators = Set("and", "or", "not", "near")

  /** FTS5 query sanitization: each term double-quoted, implicit AND;
    * bare operator words (AND/OR/NOT/NEAR) are dropped so they are never
    * required as literal terms (text_search.rs:949-969). We return the
    * term list; AND/OR policy is applied by the BM25 search operator. */
  def sanitizeQueryTerms(query: String): Seq[String] =
    unicode61(query).filterNot(Fts5Operators.contains)

  /** Identifier-aware query terms, OR semantics (text_search.rs:982-993). */
  def sanitizeQueryTermsOr(query: String): Seq[String] =
    tokenizeIdentifiers(query).distinct

  @inline private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isAsciiUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isAsciiLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isAsciiAlphaNum(c: Char): Boolean =
    isAsciiAlpha(c) || (c >= '0' && c <= '9')
}
