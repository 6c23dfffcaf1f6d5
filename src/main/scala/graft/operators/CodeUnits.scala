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

  /** Code unit carrying the reference's five analysis layers
    * (colgrep/src/parser/types.rs:117-153) within the regex framework:
    * layer 1 AST (signature, docstring, parameters, returnType), layer
    * 2 call graph (calls, calledBy — file-local reverse edges), layer 3
    * control flow (complexity, hasLoops/Branches/ErrorHandling), layer
    * 4 data flow (variables), layer 5 dependencies (imports). */
  final case class CodeUnit(
      file: String,
      language: String,
      kind: String,       // function | class | constant | raw_code
      name: String,
      signature: String,
      startLine: Int,
      endLine: Int,
      code: String,
      calls: Seq[String],
      docstring: String = "",
      parameters: Seq[String] = Seq.empty,
      returnType: String = "",
      /** Containing class (indentation-scoped); kind becomes "method". */
      parentClass: String = "",
      /** parentClass-qualified name, or the bare name at top level. */
      qualifiedName: String = "",
      /** Parent class for inheritance (`class X(Base)` / `extends Base`). */
      extendsClass: String = "",
      calledBy: Seq[String] = Seq.empty,
      complexity: Int = 1,
      hasLoops: Boolean = false,
      hasBranches: Boolean = false,
      hasErrorHandling: Boolean = false,
      variables: Seq[String] = Seq.empty,
      imports: Seq[String] = Seq.empty)

  private val ExtLang = Map(
    "py" -> "python", "scala" -> "scala", "rs" -> "rust", "go" -> "go",
    "js" -> "javascript", "ts" -> "typescript", "java" -> "java",
    "c" -> "c", "h" -> "c", "cpp" -> "cpp", "rb" -> "ruby",
    "cs" -> "csharp", "php" -> "php", "kt" -> "kotlin", "kts" -> "kotlin",
    "swift" -> "swift")

  def languageOf(path: String): String =
    ExtLang.getOrElse(path.reverse.takeWhile(_ != '.').reverse.toLowerCase, "text")

  private val Mods =
    """(?:(?:pub(?:\([^)\n]{0,40}\))?|export|public|private(?:\[[^\]\n]*\])?|protected(?:\[[^\]\n]*\])?|internal|static|async|final|override|open|suspend|mutating|abstract|default|inline|sealed|data|case|annotation|lateinit|operator|tailrec)\s+)*"""

  /** Keyword-introduced function defs; group 1 = Go receiver (if any),
    * group 2 = name. `fun` is Kotlin, `func` Go/Swift, `fn` Rust,
    * `function` JS/PHP. */
  private val FuncRe = java.util.regex.Pattern.compile(
    "^[ \\t]*" + Mods +
      """(?:def|fn|func|fun|function)\s+(?:\(([^)\n]*)\)\s*|self\.)?([A-Za-z_][A-Za-z0-9_]*)""",
    java.util.regex.Pattern.MULTILINE)

  private val ClassRe = java.util.regex.Pattern.compile(
    "^[ \\t]*" + Mods +
      """(?:class|trait|object|struct|interface|impl|enum|protocol|extension)\s+([A-Za-z_][A-Za-z0-9_]*)""",
    java.util.regex.Pattern.MULTILINE)

  /** C-family methods declared modifier-first with the return type before
    * the name (`public static void main(`). Gated to java/csharp where at
    * least one modifier is idiomatic — in C/C++ free functions carry none
    * and the pattern would false-positive on calls. Group 1 = return
    * type, group 2 = name. */
  private val CMethodRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:public|private|protected|internal|static|async|override|virtual|sealed|abstract|final|synchronized|unsafe)\s+)+""" +
      """([A-Za-z_][\w.]*(?:<[^(\n]{0,80}>)?(?:\[\])*)\s+([A-Za-z_][A-Za-z0-9_]*)(?=\s*\()""",
    java.util.regex.Pattern.MULTILINE)

  private val ConstRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:val|const|let|static|final)\s+)?([A-Z_][A-Z0-9_]{2,})\s*[:=]""",
    java.util.regex.Pattern.MULTILINE)

  /** Leading `(?<![A-Za-z0-9_])` word guard keeps a blocked keyword
    * position from re-matching one char into the identifier (`def foo(`
    * must not yield call `oo`); keyword lookbehinds allow 1-4 spaces. */
  private val CallRe = java.util.regex.Pattern.compile(
    """(?<![A-Za-z0-9_])(?<!\bdef[ \t]{1,4})(?<!\bfn[ \t]{1,4})(?<!\bfun[ \t]{1,4})(?<!\bfunc[ \t]{1,4})(?<!\bfunction[ \t]{1,4})([a-z_][A-Za-z0-9_]*)\s*\(""")

  /** Control-flow keywords that read as `name(` to the regex but are
    * never call expressions under a real grammar. */
  private val CallStop = Set(
    "if", "for", "while", "switch", "match", "catch", "return", "when",
    "unless", "until", "elif", "except", "raise", "throw", "case", "do",
    "not", "and", "or", "in", "defer", "loop", "foreach")
  private val VarRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:val|var|let|const|mut)\s+)?([a-z_][A-Za-z0-9_]*)(?:\s*:\s*[^=\n]+)?\s*=[^=]""",
    java.util.regex.Pattern.MULTILINE)
  private val ImportRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:import\s+([\w.{}, ]+)|from\s+([\w.]+)\s+import|use\s+([\w:{}, ]+);|#include\s+[<"]([^>"]+)[>"]|(?:const\s+\w+\s*=\s*)?require\(['"]([^'"]+)['"]\))""",
    java.util.regex.Pattern.MULTILINE)
  private val LoopRe = java.util.regex.Pattern.compile("""\b(for|while|loop)\b""")
  private val BranchRe = java.util.regex.Pattern.compile("""\b(if|else|match|switch|when)\b|\bcase\s""")
  private val ErrRe = java.util.regex.Pattern.compile("""\b(try|catch|except|finally|rescue|panic|raise|throw)\b""")
  private val ComplexityRe = java.util.regex.Pattern.compile(
    """\b(if|for|while|case|catch|except|when)\b|&&|\|\|""")

  /** Layer-1 helper: parameters + return type from the text following a
    * definition's name (balanced-paren scan, top-level comma split). */
  private[operators] def paramsAndReturn(afterName: String): (Seq[String], String) = {
    val open = afterName.indexOf('(')
    val nl = afterName.indexOf('\n')
    if (open < 0 || (nl >= 0 && nl < open)) return (Seq.empty, "")
    var depth = 0
    var i = open
    var close = -1
    val paramSplits = scala.collection.mutable.ArrayBuffer(open + 1)
    while (i < afterName.length && close < 0) {
      afterName.charAt(i) match {
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' =>
          depth -= 1
          if (depth == 0) close = i
        case ',' if depth == 1 => paramSplits += i + 1
        case _ =>
      }
      i += 1
    }
    if (close < 0) return (Seq.empty, "")
    val bounds = paramSplits.toSeq :+ (close + 1)
    val params = bounds.sliding(2).flatMap { case Seq(a, b) =>
      val piece = afterName.substring(a, math.max(a, b - 1))
      val pm = java.util.regex.Pattern
        .compile("""[&*]?\s*(?:mut\s+)?([A-Za-z_][A-Za-z0-9_]*)""").matcher(piece)
      if (pm.find()) Some(pm.group(1)) else None
    }.toSeq
    val retM = java.util.regex.Pattern
      .compile("""^\s*(?:->|:)\s*([^={\n]+)""")
      .matcher(afterName.substring(close + 1))
    val ret = if (retM.find()) retM.group(1).trim else ""
    (params, ret)
  }

  /** Layer-1 helper: docstring — a Python-style triple-quoted string in
    * the body, or the contiguous comment block immediately above. */
  private[operators] def docstringOf(lines: Array[String], startLine: Int, code: String): String = {
    val dsM = java.util.regex.Pattern
      .compile("\"\"\"([\\s\\S]*?)\"\"\"|'''([\\s\\S]*?)'''").matcher(code)
    if (dsM.find()) {
      val raw = Option(dsM.group(1)).getOrElse(dsM.group(2))
      return raw.trim.take(512)
    }
    // comment block immediately above the definition
    val block = scala.collection.mutable.ArrayBuffer.empty[String]
    var li = startLine - 1
    while (li >= 0 && lines(li).trim.matches("""^(///|//|#|\*|/\*\*?|\*/).*|^\s*$""") &&
        lines(li).trim.nonEmpty) {
      block += lines(li).trim
        .replaceAll("""^(///|//|#|\*+/?|/\*+)\s?""", "")
        .replaceAll("""\s*\*+/\s*$""", "")
      li -= 1
    }
    block.reverse.mkString(" ").trim.take(512)
  }

  /** Extract code units from one file's source: each definition spans to
    * the line before the next definition (or EOF); a file with no
    * definitions becomes a single raw_code unit. All five analysis
    * layers are populated; calledBy holds the file-local reverse call
    * edges (cross-file edges would need the index-wide graph — see
    * [[extract]]). */
  def extractUnits(path: String, source: String): Seq[CodeUnit] = {
    if (source == null || source.isEmpty) return Seq.empty
    val lang = languageOf(path)
    val lines = source.split("\n", -1)
    val lineStart = lines.scanLeft(0)((acc, l) => acc + l.length + 1)
    val imports = {
      val im = ImportRe.matcher(source)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (im.find()) {
        (1 to 5).map(im.group).find(_ != null).foreach(g => out += g.trim)
      }
      out.toSeq.take(24)
    }
    def lineOf(off: Int): Int = {
      var lo = 0; var hi = lines.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (lineStart(mid) <= off) lo = mid else hi = mid - 1
      }
      lo
    }
    // scan the four definition shapes and merge by offset; overlapping
    // matches (all four patterns anchor at line start, so overlaps share
    // a start offset) keep the highest-priority reading
    // (class > function > constant)
    val defs0 = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, String, String)]
    def receiverType(recv: String): String = {
      val rm = java.util.regex.Pattern
        .compile("""([A-Za-z_][A-Za-z0-9_]*)\s*$""").matcher(recv.trim)
      if (rm.find()) rm.group(1) else ""
    }
    def scan(p: java.util.regex.Pattern, kind: String,
        name: java.util.regex.Matcher => String,
        recv: java.util.regex.Matcher => String = _ => "",
        retHint: java.util.regex.Matcher => String = _ => ""): Unit = {
      val m = p.matcher(source)
      while (m.find()) {
        val n = name(m)
        if (n != null && n.nonEmpty)
          defs0 += ((m.start(), m.end(), n, kind, recv(m), retHint(m)))
      }
    }
    scan(FuncRe, "function", _.group(2),
      m => Option(m.group(1)).map(receiverType).getOrElse(""))
    scan(ClassRe, "class", _.group(1))
    if (lang == "java" || lang == "csharp")
      scan(CMethodRe, "function", _.group(2), retHint = _.group(1))
    scan(ConstRe, "constant", _.group(1))
    val kindPrio = Map("class" -> 3, "function" -> 2, "constant" -> 1)
    val defs = defs0.toSeq.groupBy(_._1).valuesIterator
      .map(ds => ds.maxBy(d => kindPrio(d._4)))
      .toSeq.sortBy(_._1)
    if (defs.isEmpty)
      return Seq(CodeUnit(path, lang, "raw_code", "", lines.headOption.getOrElse("").trim,
        1, lines.length, source, Seq.empty, imports = imports))
    // class nesting. Indentation languages (python/ruby/text): a stack of
    // (indent, className) — defs at or left of a class's indent close its
    // scope. Brace languages: a single char walk tracking brace depth, so
    // a def inside `class X { ... }` gets parent X regardless of
    // indentation (the regex twin of tree-sitter's node nesting).
    val indentScoped = Set("python", "ruby", "text")
    val parentOf: IndexedSeq[String] =
      if (indentScoped(lang)) {
        val classStack = scala.collection.mutable.Stack.empty[(Int, String)]
        defs.map { case (off, _, name, kind, _, _) =>
          val indent = {
            val ls = lineStart(lineOf(off))
            var j = ls
            while (j < source.length && (source.charAt(j) == ' ' || source.charAt(j) == '\t')) j += 1
            j - ls
          }
          while (classStack.nonEmpty && classStack.top._1 >= indent) classStack.pop()
          val parent = if (classStack.nonEmpty) classStack.top._2 else ""
          if (kind == "class") classStack.push((indent, name))
          parent
        }.toIndexedSeq
      } else {
        val parents = Array.fill(defs.length)("")
        val stack = scala.collection.mutable.Stack.empty[(String, Int)]
        var pending: String = null
        var depth = 0
        var di = 0
        var i = 0
        // lexer states so braces inside string literals and comments
        // don't skew depth (`const open = "{";` must not open a scope)
        val S_CODE = 0; val S_STR = 1; val S_LINE = 2; val S_BLOCK = 3
        var state = S_CODE
        var strQuote = ' '
        while (i < source.length) {
          val ch = source.charAt(i)
          if (di < defs.length && i == defs(di)._1) {
            parents(di) = if (stack.nonEmpty) stack.top._1 else ""
            // a class whose body brace never arrived before the next def
            // (Rust `struct P(f32);`, Kotlin `data class P(x: Int)`) must
            // not capture the next unrelated '{'
            pending = null
            if (defs(di)._4 == "class") pending = defs(di)._3
            di += 1
          }
          state match {
            case S_STR =>
              if (ch == '\\') i += 1 // skip escaped char
              else if (ch == strQuote || ch == '\n') state = S_CODE
            case S_LINE =>
              if (ch == '\n') state = S_CODE
            case S_BLOCK =>
              if (ch == '*' && i + 1 < source.length && source.charAt(i + 1) == '/') {
                state = S_CODE; i += 1
              }
            case _ => ch match {
              case '"' | '`' => state = S_STR; strQuote = ch
              case '\'' =>
                // only a char literal if it closes within a few chars —
                // a Rust lifetime (`'a`) must not open a string span
                val lookEnd = math.min(i + 4, source.length)
                var j = i + 1
                if (j < lookEnd && source.charAt(j) == '\\') j += 1
                var closes = false
                while (j < lookEnd && !closes) {
                  if (source.charAt(j) == '\'') closes = true
                  j += 1
                }
                if (closes) { state = S_STR; strQuote = '\'' }
              case '/' if i + 1 < source.length && source.charAt(i + 1) == '/' =>
                state = S_LINE; i += 1
              case '/' if i + 1 < source.length && source.charAt(i + 1) == '*' =>
                state = S_BLOCK; i += 1
              case ';' => pending = null // statement end before any body brace
              case '{' =>
                depth += 1
                if (pending != null) { stack.push((pending, depth)); pending = null }
              case '}' =>
                if (stack.nonEmpty && stack.top._2 == depth) stack.pop()
                depth -= 1
              case _ =>
            }
          }
          i += 1
        }
        parents.toIndexedSeq
      }
    val ExtendsRe = java.util.regex.Pattern.compile(
      """(?:extends|implements)\s+([A-Za-z_][\w.]*)|class\s+\w+\s*\(\s*([A-Za-z_][\w.]*)""")

    val units = defs.zipWithIndex.map { case ((off, endOff, name, kind0, recv, retHint), i) =>
      val start = lineOf(off)
      val end = if (i + 1 < defs.length) lineOf(defs(i + 1)._1) - 1 else lines.length - 1
      val code = lines.slice(start, end + 1).mkString("\n")
      val parent = if (recv.nonEmpty) recv else parentOf(i)
      val kind = if (kind0 == "function" && parent.nonEmpty) "method" else kind0
      val cm = CallRe.matcher(code)
      val calls = scala.collection.mutable.LinkedHashSet.empty[String]
      while (cm.find()) {
        if (cm.group(1) != name && !CallStop(cm.group(1))) calls += cm.group(1)
      }
      val unitEndOff = lineStart(end) + lines(end).length
      val (params, ret0) =
        if (kind == "function" || kind == "method")
          paramsAndReturn(source.substring(endOff, unitEndOff))
        else (Seq.empty[String], "")
      // Java/C# declare the return type BEFORE the name — take it from
      // the CMethodRe capture when the suffix scan found none
      val ret = if (ret0.nonEmpty) ret0 else retHint
      val extendsClass =
        if (kind == "class") {
          val em = ExtendsRe.matcher(lines(start))
          if (em.find()) Option(em.group(1)).getOrElse(em.group(2)) else ""
        } else ""
      val vm = VarRe.matcher(code)
      val vars = scala.collection.mutable.LinkedHashSet.empty[String]
      while (vm.find()) vars += vm.group(1)
      var complexity = 1
      val cxm = ComplexityRe.matcher(code)
      while (cxm.find()) complexity += 1
      CodeUnit(path, lang, kind, name, lines(start).trim, start + 1, end + 1,
        code, calls.toSeq.take(16),
        docstring = docstringOf(lines, start, code),
        parameters = params.take(16),
        returnType = ret,
        parentClass = parent,
        qualifiedName = if (parent.nonEmpty) s"$parent.$name" else name,
        extendsClass = extendsClass,
        complexity = complexity,
        hasLoops = LoopRe.matcher(code).find(),
        hasBranches = BranchRe.matcher(code).find(),
        hasErrorHandling = ErrRe.matcher(code).find(),
        variables = vars.toSeq.take(16),
        imports = imports)
    }
    // layer 2 reverse edges, file-local: A ∈ calledBy(B) iff A calls B
    val names = units.map(_.name).toSet
    val reverse = units.flatMap(u => u.calls.filter(names.contains).map(c => c -> u.name))
      .groupBy(_._1).map { case (callee, edges) => callee -> edges.map(_._2).distinct.take(16) }
    units.map(u => u.copy(calledBy = reverse.getOrElse(u.name, Seq.empty)))
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
    sb.append(s"# ${u.kind.capitalize}: ${if (u.qualifiedName.nonEmpty) u.qualifiedName else u.name}\n")
    sb.append(s"Signature: ${u.signature}\n")
    if (u.parentClass.nonEmpty) sb.append(s"In class: ${u.parentClass}\n")
    if (u.extendsClass.nonEmpty) sb.append(s"Extends: ${u.extendsClass}\n")
    if (u.docstring.nonEmpty) sb.append(s"Doc: ${u.docstring}\n")
    if (u.parameters.nonEmpty) sb.append(s"Params: ${u.parameters.mkString(", ")}\n")
    if (u.returnType.nonEmpty) sb.append(s"Returns: ${u.returnType}\n")
    if (u.calls.nonEmpty) sb.append(s"Calls: ${u.calls.mkString(", ")}\n")
    if (u.calledBy.nonEmpty) sb.append(s"Called by: ${u.calledBy.mkString(", ")}\n")
    if (u.variables.nonEmpty) sb.append(s"Vars: ${u.variables.mkString(", ")}\n")
    if (u.imports.nonEmpty) sb.append(s"Imports: ${u.imports.mkString(", ")}\n")
    sb.append(s"Flow: complexity ${u.complexity}" +
      (if (u.hasLoops) ", loops" else "") +
      (if (u.hasBranches) ", branches" else "") +
      (if (u.hasErrorHandling) ", error-handling" else "") + "\n")
    sb.append(s"File: $pathWords\n\n")
    sb.append(u.code)
    sb.toString.take(EmbedTextCap)
  }


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
