package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.SearchParams

/** colgrep application layer: code-unit extraction (C1, simplified),
  * structured embedding text (C2), incremental reindex state (C7), and
  * env-tunable search parameters (C8).
  *
  * C1 note: the reference parses 25 languages with tree-sitter
  * (colgrep/src/parser/). Tree-sitter JNI is not available in this
  * environment, so extraction here is a regex-based structural parser
  * covering function/class/constant definitions for the common
  * brace/def languages — the `CodeUnit` schema, partition-local
  * extraction plumbing, and downstream pipeline (C2 text → E2 encode →
  * index) are the real, swappable contract.
  */
object CodeUnits {

  final case class CodeUnit(
      file: String,
      language: String,
      kind: String,       // function | class | constant | raw_code
      name: String,
      signature: String,
      startLine: Int,
      endLine: Int,
      code: String,
      calls: Seq[String])

  private val ExtLang = Map(
    "py" -> "python", "scala" -> "scala", "rs" -> "rust", "go" -> "go",
    "js" -> "javascript", "ts" -> "typescript", "java" -> "java",
    "c" -> "c", "h" -> "c", "cpp" -> "cpp", "rb" -> "ruby")

  def languageOf(path: String): String =
    ExtLang.getOrElse(path.reverse.takeWhile(_ != '.').reverse.toLowerCase, "text")

  private val DefRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:pub|export|public|private|protected|static|async|final|override)\s+)*""" +
      """(?:def|fn|func|function)\s+([A-Za-z_][A-Za-z0-9_]*)|""" +
      """^[ \t]*(?:(?:pub|export|public|final|abstract|case|sealed)\s+)*(?:class|trait|object|struct|interface|impl)\s+([A-Za-z_][A-Za-z0-9_]*)|""" +
      """^[ \t]*(?:(?:val|const|let|static)\s+)?([A-Z_][A-Z0-9_]{2,})\s*[:=]""",
    java.util.regex.Pattern.MULTILINE)

  private val CallRe = java.util.regex.Pattern.compile("""([a-z_][A-Za-z0-9_]*)\s*\(""")

  /** Extract code units from one file's source: each definition spans to
    * the line before the next definition (or EOF); a file with no
    * definitions becomes a single raw_code unit. */
  def extractUnits(path: String, source: String): Seq[CodeUnit] = {
    if (source == null || source.isEmpty) return Seq.empty
    val lang = languageOf(path)
    val lines = source.split("\n", -1)
    val lineStart = lines.scanLeft(0)((acc, l) => acc + l.length + 1)
    val m = DefRe.matcher(source)
    val defs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    while (m.find()) {
      val name = Seq(m.group(1), m.group(2), m.group(3)).find(_ != null).getOrElse("")
      val kind =
        if (m.group(1) != null) "function"
        else if (m.group(2) != null) "class"
        else "constant"
      defs += ((m.start(), name, kind))
    }
    if (defs.isEmpty)
      return Seq(CodeUnit(path, lang, "raw_code", "", lines.headOption.getOrElse("").trim,
        1, lines.length, source, Seq.empty))
    def lineOf(off: Int): Int = {
      var lo = 0; var hi = lines.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (lineStart(mid) <= off) lo = mid else hi = mid - 1
      }
      lo
    }
    defs.toSeq.zipWithIndex.map { case ((off, name, kind), i) =>
      val start = lineOf(off)
      val end = if (i + 1 < defs.length) lineOf(defs(i + 1)._1) - 1 else lines.length - 1
      val code = lines.slice(start, end + 1).mkString("\n")
      val cm = CallRe.matcher(code)
      val calls = scala.collection.mutable.LinkedHashSet.empty[String]
      while (cm.find()) { if (cm.group(1) != name) calls += cm.group(1) }
      CodeUnit(path, lang, kind, name, lines(start).trim, start + 1, end + 1,
        code, calls.toSeq.take(16))
    }
  }

  /** C1 plumbing: `files(path, source)` → exploded `Dataset[CodeUnit]`
    * rows, extracted partition-locally (no shuffle). */
  def extract(spark: SparkSession, files: DataFrame,
      pathCol: String = "path", sourceCol: String = "source"): DataFrame = {
    import spark.implicits._
    files.select(col(pathCol), col(sourceCol))
      .as[(String, String)]
      .flatMap { case (p, s) => extractUnits(p, s) }
      .toDF()
  }

  /** C2 structured embedding text (colgrep/src/embed.rs:115-200): a
    * header of analysis fields over the raw code, path CamelCase/
    * underscore-normalized, capped at 8 KiB. */
  val EmbedTextCap = 8192

  def embedText(u: CodeUnit): String = {
    if (u.kind == "raw_code" || u.kind == "constant")
      return u.code.take(EmbedTextCap)
    val pathWords = u.file
      .replaceAll("[/_.]", " ")
      .replaceAll("([a-z0-9])([A-Z])", "$1 $2")
    val sb = new StringBuilder
    sb.append(s"# ${u.kind.capitalize}: ${u.name}\n")
    sb.append(s"Signature: ${u.signature}\n")
    if (u.calls.nonEmpty) sb.append(s"Calls: ${u.calls.mkString(", ")}\n")
    sb.append(s"File: $pathWords\n\n")
    sb.append(u.code)
    sb.toString.take(EmbedTextCap)
  }

  val embedTextUdf = udf((file: String, language: String, kind: String, name: String,
      signature: String, startLine: Int, endLine: Int, code: String, calls: Seq[String]) =>
    embedText(CodeUnit(file, language, kind, name, signature, startLine, endLine,
      code, if (calls == null) Seq.empty else calls)))

  /** C7 incremental reindex (colgrep/src/index/mod.rs:1615-1956): diff
    * the current files' content hashes against the persisted state.
    * Returns (changed ∪ new, deleted) path sets as DataFrames — the
    * caller feeds them to FtsIndex.updateRows/delete + Updater. State is
    * `(path, content_hash)`; hashing is a content xxhash64 column, so
    * detection is one broadcast-able join, no full re-parse. */
  def diffState(files: DataFrame, state: DataFrame,
      pathCol: String = "path", sourceCol: String = "source"): (DataFrame, DataFrame) = {
    val cur = files.select(col(pathCol).as("path"),
      xxhash64(col(sourceCol)).as("content_hash"))
    val changed = cur.join(state.withColumnRenamed("content_hash", "old_hash"),
        Seq("path"), "left_outer")
      .filter(col("old_hash").isNull || col("old_hash") =!= col("content_hash"))
      .select("path", "content_hash")
    val deleted = state.join(cur.select("path"), Seq("path"), "left_anti")
      .select("path")
    (changed, deleted)
  }

  /** C8 env-tunable search parameters (colgrep/src/index/mod.rs:792-815):
    * COLGREP_N_IVF_PROBE, COLGREP_N_FULL_SCORES,
    * COLGREP_CENTROID_SCORE_THRESHOLD override the defaults. */
  def envSearchParams(base: SearchParams = SearchParams(),
      env: Map[String, String] = sys.env): SearchParams = {
    def intOf(k: String, d: Int) = env.get(k).flatMap(_.toIntOption).getOrElse(d)
    val threshold = env.get("COLGREP_CENTROID_SCORE_THRESHOLD")
      .flatMap(_.toFloatOption).map(Some(_)).getOrElse(base.centroidScoreThreshold)
    base.copy(
      nIvfProbe = intOf("COLGREP_N_IVF_PROBE", base.nIvfProbe),
      nFullScores = intOf("COLGREP_N_FULL_SCORES", base.nFullScores),
      centroidScoreThreshold = threshold)
  }
}
