package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.SearchParams

/** colgrep application layer: code-unit extraction (C1, simplified),
  * structured embedding text (C2), incremental reindex state (C7), and
  * env-tunable search parameters (C8).
  *
  * C1 note: the reference parses 26 code languages with tree-sitter and
  * indexes 11 text/config formats as whole-file documents
  * (colgrep/src/parser/). Tree-sitter JNI is not available in this
  * environment, so code extraction here is a regex-based structural
  * parser over the same language set (function/class/constant shapes,
  * plus language-gated forms: Haskell type signatures, OCaml let,
  * R `<- function`, Zig container consts, SQL DDL, CSS rules, and
  * Vue/Svelte/HTML script-block extraction); text formats get the
  * reference's one-document-per-file treatment. The `CodeUnit` schema,
  * partition-local extraction plumbing, and downstream pipeline (C2
  * text → E2 encode → index) are the real, swappable contract.
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
      kind: String,       // function | method | class | constant | raw_code | document | section
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

  /** Extension → language, mirroring the reference's detection table
    * (colgrep/src/parser/language.rs:8-63) — 26 code languages plus the
    * text/config formats below. */
  private val ExtLang = Map(
    "py" -> "python", "scala" -> "scala", "sc" -> "scala",
    "rs" -> "rust", "go" -> "go",
    "js" -> "javascript", "jsx" -> "javascript", "mjs" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "java" -> "java",
    "c" -> "c", "h" -> "c",
    "cpp" -> "cpp", "cc" -> "cpp", "cxx" -> "cpp", "hpp" -> "cpp", "hxx" -> "cpp",
    "rb" -> "ruby",
    "cs" -> "csharp", "php" -> "php", "kt" -> "kotlin", "kts" -> "kotlin",
    "swift" -> "swift",
    "lua" -> "lua", "ex" -> "elixir", "exs" -> "elixir", "hs" -> "haskell",
    "ml" -> "ocaml", "mli" -> "ocaml", "r" -> "r", "rmd" -> "r",
    "zig" -> "zig", "jl" -> "julia", "sql" -> "sql",
    "vue" -> "vue", "svelte" -> "svelte", "css" -> "css", "qml" -> "qml",
    "html" -> "html", "htm" -> "html",
    "md" -> "markdown", "markdown" -> "markdown",
    "txt" -> "text", "text" -> "text", "rst" -> "text",
    "adoc" -> "asciidoc", "asciidoc" -> "asciidoc", "org" -> "org",
    "yaml" -> "yaml", "yml" -> "yaml", "toml" -> "toml", "json" -> "json",
    "sh" -> "shell", "bash" -> "shell", "zsh" -> "shell",
    "ps1" -> "powershell")

  /** Formats indexed as whole-file documents, not parsed as code
    * (colgrep/src/parser/language.rs:67-83 `is_text_format`). */
  private[operators] val TextFormats = Set(
    "markdown", "text", "yaml", "toml", "json", "dockerfile", "makefile",
    "shell", "powershell", "asciidoc", "org")

  /** `None` for unknown extensions and extensionless files (other than
    * the Dockerfile/Makefile filename forms) — the reference's
    * detect_language returns None and the file is skipped entirely
    * (colgrep/src/parser/language.rs:8-63), so arbitrary binary or
    * unrecognized files are never indexed as text. */
  def languageOf(path: String): Option[String] = {
    val fname = path.substring(path.lastIndexOf('/') + 1).toLowerCase
    if (fname == "dockerfile") Some("dockerfile")
    else if (fname == "makefile" || fname == "gnumakefile") Some("makefile")
    else if (!fname.contains('.')) None
    else ExtLang.get(fname.reverse.takeWhile(_ != '.').reverse)
  }

  private val Mods =
    """(?:(?:pub(?:\([^)\n]{0,40}\))?|export|declare|public|private(?:\[[^\]\n]*\])?|protected(?:\[[^\]\n]*\])?|internal|static|async|final|override|open|suspend|mutating|mutable|abstract|default|inline|sealed|data|case|annotation|lateinit|operator|tailrec|local|implicit)\s+)*"""

  /** Definition anchor: line start OR just after a statement-ending `;`,
    * so co-located defs on one line (`def a = 1; def b = 2`, minified JS)
    * each match — tree-sitter keeps co-located defs
    * (colgrep/src/parser/ast.rs); a pure `^` anchor would collapse them
    * to the first. The `;` form is a lookbehind so match start (used for
    * offset-dedup and span math) stays at the definition itself. */
  private val DefAnchor = """(?:^|(?<=;))[ \t]*"""

  /** Keyword-introduced function defs; group 1 = Go receiver (if any),
    * group 2 = name. `fun` is Kotlin, `func` Go/Swift, `fn` Rust,
    * `function` JS/PHP/Lua, `defp`/`defmacro` Elixir, `macro` Julia.
    * Dotted/colon names (`function M.insert(`, Lua method sugar
    * `function M:get(`) capture whole; [[extractUnits]] splits the last
    * segment off as the name and the prefix as the receiver. */
  private val FuncRe = java.util.regex.Pattern.compile(
    DefAnchor + Mods +
      """(?:defmacrop?|defp?|fn|func|fun|function|macro)\s+(?:<[^>\n]{0,40}>\s+)?(?:\(([^)\n]*)\)\s*|self\.)?([A-Za-z_][A-Za-z0-9_]*(?:[.:][A-Za-z_][A-Za-z0-9_]*)*)""",
    java.util.regex.Pattern.MULTILINE)

  private val ClassRe = java.util.regex.Pattern.compile(
    DefAnchor + Mods +
      """(?:class|trait|object|struct|interface|impl|enum|protocol|extension|defmodule|defprotocol|defimpl|module|type|newtype)\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*)""",
    java.util.regex.Pattern.MULTILINE)

  /** C-family methods declared modifier-first with the return type before
    * the name (`public static void main(`). Gated to java/csharp where at
    * least one modifier is idiomatic — in C/C++ free functions carry none
    * and the pattern would false-positive on calls. Group 1 = return
    * type, group 2 = name. */
  private val CMethodRe = java.util.regex.Pattern.compile(
    DefAnchor + """(?:(?:public|private|protected|internal|static|async|override|virtual|sealed|abstract|final|synchronized|unsafe)\s+)+""" +
      """([A-Za-z_][\w.]*(?:<[^(\n]{0,80}>)?(?:\[\])*)\s+([A-Za-z_][A-Za-z0-9_]*)(?=\s*\()""",
    java.util.regex.Pattern.MULTILINE)

  /** C/C++ free functions and out-of-line methods: return type first,
    * NO modifier required (`int add(int a, int b) {`,
    * `void Shape::draw() const {`). Gated to c/cpp — elsewhere the
    * two-identifiers-then-paren shape false-positives. The opening `{`
    * is required after the parameter list (params may span lines but
    * contain no `;{}`), so prototypes and call statements never match.
    * Group 1 = return type, group 2 = possibly-qualified name. */
  private val CFuncRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:static|inline|extern|virtual|constexpr|explicit|friend|const|unsigned|signed|long|short|struct|enum)\s+)*([A-Za-z_]\w*(?:::\w+)*(?:<[^>\n]{0,60}>)?(?:\s*[*&]+)?)\s+[*&]*((?:[A-Za-z_]\w*::)*operator\s*[^\s(]{1,3}|[A-Za-z_]\w*(?:::~?\w+)*)\s*\(([^;{}]*)\)\s*(?:const\s*|override\s*|final\s*|noexcept\s*)*(?:->\s*[\w:<>*&\s]{1,40})?\{""",
    java.util.regex.Pattern.MULTILINE)

  /** Keywords that read as the type/name tokens of [[CFuncRe]] but are
    * control flow (`else if (x) {`) or operators, never definitions. */
  private val CFuncStop = Set(
    "if", "else", "while", "for", "switch", "return", "do", "case",
    "sizeof", "catch", "new", "delete", "throw", "goto", "defined")

  /** Go `const Name [type] = ...` — CamelCase consts are idiomatic, so
    * the all-caps ConstRe heuristic misses them (tree-sitter extracts
    * any const_declaration). Gated to go. Group 1 = name. */
  private val GoConstRe = java.util.regex.Pattern.compile(
    """^[ \t]*const\s+([A-Za-z_]\w*)(?:\s+[\w\[\]*.]+)?\s*=""",
    java.util.regex.Pattern.MULTILINE)

  /** C++ destructors with a body or `= default` (`virtual ~Shape() =
    * default;` parses as function_definition under tree-sitter; a bare
    * declaration `~Shape();` does not and is not matched here). */
  private val CppDtorRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:virtual\s+)?((?:\w+::)*~\w+)\s*\(\s*(?:void)?\s*\)\s*(?:=\s*default\s*;|(?:noexcept\s*)?\{)""",
    java.util.regex.Pattern.MULTILINE)

  /** JS/TS class-body methods: `name(args) {` with no `function`
    * keyword (incl. `constructor`, `get`/`set`/`static`/`async`
    * accessors). A real call followed by a block is invalid JS at
    * statement level, so the main false-positive risk is control-flow
    * keywords — stopped via [[CFuncStop]]-style filtering at the scan
    * site. Params must not contain `;{})` so multi-line calls with
    * function arguments never match. Group 1 = name. */
  private val JsMethodRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:public|private|protected|static|async|readonly|override|get|set)\s+)*([A-Za-z_$][\w$]*)\s*(?:<[^>\n]{0,40}>)?\s*\(([^;{})]*)\)\s*(?::\s*[\w\[\]<>,.|&\s]{1,60})?\{""",
    java.util.regex.Pattern.MULTILINE)

  /** JS/TS arrow-function bindings: `const f = (a, b) => ...` (optional
    * type annotations, async, single bare param). Group 1 = name. */
  private val JsArrowRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*(?::[^=\n]{0,80})?=\s*(?:async\s+)?(?:\([^)\n]*\)|[A-Za-z_$][\w$]*)\s*(?::\s*[\w\[\]<>,.|&\s]{1,60})?=>""",
    java.util.regex.Pattern.MULTILINE)

  private val JsMethodStop = Set(
    "if", "else", "while", "for", "switch", "return", "catch", "do",
    "function", "typeof", "new", "delete", "in", "of", "yield", "await",
    "case", "with", "super")

  /** QML shapes: component instantiation (`Rectangle {`), `signal
    * name(...)`, handler bindings (`onTriggered: {`), `property <type>
    * name`, and `id: name`. */
  private val QmlComponentRe = java.util.regex.Pattern.compile(
    """^[ \t]*([A-Z]\w*(?:\.[A-Z]\w*)*)\s*\{""", java.util.regex.Pattern.MULTILINE)
  private val QmlSignalRe = java.util.regex.Pattern.compile(
    """^[ \t]*signal\s+([a-z]\w*)""", java.util.regex.Pattern.MULTILINE)
  private val QmlHandlerRe = java.util.regex.Pattern.compile(
    """^[ \t]*(on[A-Z]\w*)\s*:""", java.util.regex.Pattern.MULTILINE)
  private val QmlPropertyRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:required\s+|readonly\s+|default\s+)*property\s+[\w<>.]+\s+(\w+)""",
    java.util.regex.Pattern.MULTILINE)
  /** Inline component declaration `component FancyChip: Rectangle {` —
    * the declared NAME is the unit; the base type after `:` is its
    * `extends`, not a second instantiated object (colgrep
    * test_qml.rs:50-74 asserts no duplicate base-type unit — satisfied
    * here because QmlComponentRe is line-anchored and the base type sits
    * mid-line). */
  private val QmlInlineComponentRe = java.util.regex.Pattern.compile(
    """^[ \t]*component\s+([A-Z]\w*)\s*:\s*[A-Z][\w.]*\s*\{""",
    java.util.regex.Pattern.MULTILINE)
  /** Grouped-binding notation `icon { source: ...; color: ... }` — a
    * lowercase identifier directly opening a brace block is a nested
    * attached object (colgrep test_qml.rs:125-143), not a JS statement;
    * JS keyword blocks inside inline functions are excluded by name. */
  private val QmlGroupedBindingRe = java.util.regex.Pattern.compile(
    """^[ \t]*([a-z]\w*)\s*\{[ \t]*$""", java.util.regex.Pattern.MULTILINE)
  private val QmlGroupStop = Set("else", "try", "do", "finally", "catch",
    "switch", "function", "return", "export", "import", "default")

  private val ConstRe = java.util.regex.Pattern.compile(
    DefAnchor + """(?:(?:val|const|let|static|final)\s+)?([A-Z_][A-Z0-9_]{2,})\s*[:=]""",
    java.util.regex.Pattern.MULTILINE)

  // --- language-gated definition shapes (no shared-keyword form) ---

  /** Haskell top-level type signature `name :: Type`. */
  private val HsSigRe = java.util.regex.Pattern.compile(
    """^([a-z_][A-Za-z0-9_']*)\s*::""", java.util.regex.Pattern.MULTILINE)

  /** OCaml `let [rec] name` (gated: `let` is a variable elsewhere). */
  private val OcamlLetRe = java.util.regex.Pattern.compile(
    """^let\s+(?:rec\s+)?([a-z_][A-Za-z0-9_']*)""",
    java.util.regex.Pattern.MULTILINE)

  /** R `name <- function(...)`. */
  private val RFuncRe = java.util.regex.Pattern.compile(
    """^[ \t]*([A-Za-z_.][\w.]*)\s*(?:<-|=)\s*function\s*\(""",
    java.util.regex.Pattern.MULTILINE)

  /** Zig container type `const Name = struct/enum/union/opaque`. */
  private val ZigTypeRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:pub\s+)?const\s+([A-Za-z_]\w*)\s*=\s*(?:extern\s+|packed\s+)?(?:struct|enum|union|opaque)""",
    java.util.regex.Pattern.MULTILINE)

  /** SQL DDL: `CREATE [OR REPLACE] <kind> [IF NOT EXISTS] name`; group 1
    * is the object kind (function/procedure → function, else class). */
  private val SqlCreateRe = java.util.regex.Pattern.compile(
    """^\s*create\s+(?:or\s+replace\s+)?(?:temp(?:orary)?\s+)?(table|view|materialized\s+view|function|procedure|index|trigger|schema)\s+(?:if\s+not\s+exists\s+)?[`"\[]?([A-Za-z_][\w.$]*)""",
    java.util.regex.Pattern.MULTILINE | java.util.regex.Pattern.CASE_INSENSITIVE)

  /** Leading `(?<![A-Za-z0-9_])` word guard keeps a blocked keyword
    * position from re-matching one char into the identifier (`def foo(`
    * must not yield call `oo`); keyword lookbehinds allow 1-4 spaces.
    * Uppercase-initial names are calls too (constructors, `Some(x)`,
    * Scala `apply` sugar — tree-sitter's call_expression casts the same
    * wide net); definition keywords and `@decorator(` are excluded. */
  private val CallRe = java.util.regex.Pattern.compile(
    """(?<![A-Za-z0-9_])(?<!\bdef[ \t]{1,4})(?<!\bdefp[ \t]{1,4})(?<!\bfn[ \t]{1,4})(?<!\bfun[ \t]{1,4})(?<!\bfunc[ \t]{1,4})(?<!\bfunction[ \t]{1,4})(?<!\bmacro[ \t]{1,4})(?<!\bclass[ \t]{1,4})(?<!\bstruct[ \t]{1,4})(?<!\bimpl[ \t]{1,4})(?<!\benum[ \t]{1,4})(?<!\btrait[ \t]{1,4})(?<!\binterface[ \t]{1,4})(?<!\bextension[ \t]{1,4})(?<!@)([A-Za-z_][A-Za-z0-9_]*)\s*\(""")

  /** Control-flow and definition keywords that read as `name(` to the
    * regex but are never call expressions under a real grammar, plus
    * the binding keywords (`let (a, b) =` destructuring). */
  private val CallStop = Set(
    "if", "for", "while", "switch", "match", "catch", "return", "when",
    "unless", "until", "elif", "except", "raise", "throw", "case", "do",
    "not", "and", "or", "in", "defer", "loop", "function",
    "new", "assert", "yield", "typeof", "sizeof", "await",
    "let", "var", "val")
  /** Per-language call stops — a word is only a keyword where its
    * grammar says so (`func(` is go's anonymous-fn keyword but a real
    * function-pointer CALL in C; `fn(` is php's arrow keyword; `init`
    * heads a swift/kotlin initializer DECLARATION; C primitive types
    * appear as casts and function-pointer params). */
  private val CPrimitives = Set(
    "int", "float", "double", "char", "long", "short", "unsigned",
    "signed", "bool", "void")
  private val LangCallStop: Map[String, Set[String]] = Map(
    "go" -> Set("func"),
    // `foreach (` is a statement keyword in php/C#/java-adjacent code,
    // but a real higher-order METHOD in scala/ruby/kotlin
    "php" -> Set("use", "fn", "foreach"),
    "rust" -> Set("fn"),
    "swift" -> Set("init"),
    // kotlin no longer consults this map — kotlinChainCalls (its own
    // KotlinChainStop set) replaced the generic CallRe path entirely
    "c" -> CPrimitives, "cpp" -> CPrimitives,
    "java" -> (CPrimitives + "foreach"),
    "csharp" -> (CPrimitives + "foreach"))
  /** Rust macro invocations (`println!(..)`, `vec![..]`) — tree-sitter's
    * macro_invocation nodes score as calls under the bare macro name. */
  private val RustMacroRe = java.util.regex.Pattern.compile(
    """(?<![A-Za-z0-9_])([A-Za-z_][A-Za-z0-9_]*)!\s*[(\[{]""")
  /** Ruby parenless command calls (`puts "hi"`) — real method calls in
    * ruby's grammar; allowlisted to the idiomatic IO commands. */
  private val RubyCommandRe = java.util.regex.Pattern.compile(
    """(?<![\w.:])(puts|print|pp)[ \t]+[^=\s]""")
  /** Kotlin statement/soft keywords that can never BASE a postfix call
    * chain (their grammar nodes are if/when/loop/accessor/initializer
    * forms, not call_expressions). `this`/`it`/`super` are NOT stopped:
    * tree-sitter scores `this.x` as a navigation_expression whose
    * child(0) text is `this`. */
  private val KotlinChainStop = Set(
    "if", "when", "for", "while", "do", "else", "try", "catch",
    "finally", "return", "throw", "is", "in", "as", "package", "import",
    "typealias", "init", "val", "var", "by", "get", "set", "where")
  /** Kotlin declaration heads — no call nodes until the body opens. */
  private val KotlinDeclKw = Set(
    "fun", "class", "object", "interface", "constructor", "enum",
    "annotation")

  /** Kotlin call extraction with tree-sitter NODE-TEXT parity
    * (analysis.rs:600 call_types = [call_expression,
    * navigation_expression]; :612-641 scored name = raw text of the
    * node's FIRST CHILD reduced to its last `.` segment then last `::`
    * segment, first char must be alphabetic). Tree-sitter parses a
    * trailing lambda as a SECOND nested call node, so
    * `withContext(Dispatchers.IO) { ... }` genuinely scores `IO)` (the
    * parenthesized prefix's last dot segment) and
    * `Gson().fromJson(...)` scores `Gson()` — raw-node-text artifacts
    * the reference's own fixtures pin (test_kotlin.rs:114,261).
    *
    * Simulated as a postfix-chain scan over masked source: a chain is
    * `base (suffix)*`, suffix ∈ `.name` | `::name` | `(args)` |
    * `{lambda}` | `<typeargs>` before `(`; a newline continues a chain
    * only when the next line starts with `.`/`::` (kotlin's
    * leading-dot continuation rule); every node-creating suffix emits
    * lastSegment(prefix-text) — exactly the child(0) text of the node
    * that suffix creates. Declaration headers (fun/class/object/
    * interface/constructor — bracket groups consumed as units, so
    * multi-line signatures and delegation-ctor args emit nothing)
    * produce no call nodes; strings and comments are masked EXCEPT
    * `${…}` template interiors, which tree-sitter scores as code.
    * Documented residual: enum entries with ctor args/bodies
    * (`RED("x") { … }`) read as calls textually though tree-sitter
    * types them enum_entry — same behavior as the regex path this
    * replaced, and no fixture pins it. */
  private[operators] def kotlinChainCalls(code: String): Seq[String] = {
    // strings/comments only — argument text must stay scannable
    val masked = maskedOffsets(code, "kotlin", maskParens = false)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val n = code.length
    // `${ expr }` template interiors are CODE — tree-sitter scores the
    // call/navigation nodes inside them. Unmask each block; string
    // segments nested INSIDE the interpolation stay masked (depth-1
    // approximation: a `${…}` inside such a nested string stays dark).
    locally {
      var i = 0
      while (i < n - 1) {
        if (masked.get(i) && code.charAt(i) == '$' && code.charAt(i + 1) == '{') {
          var depth = 0
          var j = i + 1
          var inStr = false
          var strCh = ' '
          var done = false
          while (j < n && !done) {
            val cj = code.charAt(j)
            if (inStr) {
              if (cj == '\\') j += 1
              else if (cj == strCh) inStr = false
            } else cj match {
              case '{' => depth += 1; masked.clear(j)
              case '}' =>
                depth -= 1
                if (depth == 0) done = true else masked.clear(j)
              case '"' | '\'' => inStr = true; strCh = cj
              case _ => masked.clear(j)
            }
            j += 1
          }
          i = j
        } else i += 1
      }
    }
    def isIdStart(c: Char) = c.isLetter || c == '_'
    def isIdPart(c: Char) = c.isLetterOrDigit || c == '_'
    def emit(prefix: String): Unit = {
      val a = prefix.substring(prefix.lastIndexOf('.') + 1)
      val di = a.lastIndexOf("::")
      val b = if (di >= 0) a.substring(di + 2) else a
      val name = b.reverse.dropWhile(_ == '!').reverse
      if (name.nonEmpty && name.charAt(0).isLetter) out += name
    }
    def readIdent(i0: Int): Int = {
      var i = i0; while (i < n && isIdPart(code.charAt(i))) i += 1; i
    }
    def skipWs(i0: Int, to: Int): Int = {
      var i = i0
      while (i < to && (code.charAt(i) == ' ' || code.charAt(i) == '\t')) i += 1
      i
    }
    def matchClose(i0: Int, open: Char, close: Char, to: Int): Int = {
      var depth = 0; var i = i0
      while (i < to) {
        if (!masked.get(i)) {
          val c = code.charAt(i)
          if (c == open) depth += 1
          else if (c == close) { depth -= 1; if (depth == 0) return i + 1 }
        }
        i += 1
      }
      to
    }
    def scanRange(from: Int, to: Int): Unit = {
      var i = from
      while (i < to) {
        val c = code.charAt(i)
        if (masked.get(i)) i += 1
        else if (isIdStart(c) && (i == 0 || {
          val p = code.charAt(i - 1)
          !isIdPart(p) && p != '.' && p != ':' && p != '@' && p != '$'
        })) i = chain(i, to)
        else i += 1
      }
    }
    def chain(start: Int, to: Int): Int = {
      var i = readIdent(start)
      val base = code.substring(start, i)
      if (KotlinDeclKw(base)) {
        // Skip the WHOLE declaration header: consume bracket groups
        // (parameter lists, type arguments, delegation-ctor args) as
        // units so multi-line signatures don't leak `): Int {` into the
        // expression scanner, and stop at the body `{`, an
        // expression-body `=`, or a top-level newline (brace-less
        // declarations like `data class S(...) : R<T>()`).
        var done = false
        while (!done && i < to) {
          code.charAt(i) match {
            case '{' | '=' => done = true
            case '\n' => done = true
            case '(' => i = matchClose(i, '(', ')', to)
            case '<' => i = matchClose(i, '<', '>', to)
            case _ => i += 1
          }
        }
        return i
      }
      if (KotlinChainStop(base)) return i
      var loop = true
      while (loop && i < to) {
        // kotlin newline continuation: an expression continues past a
        // line break iff the next line starts with a navigation
        // operator (`items\n  .filter {…}\n  .map(f)` — the idiomatic
        // leading-dot chain); any other token after a newline ends the
        // chain (a `{` on a fresh line is a block, never a trailing
        // lambda)
        val j0 = skipWs(i, to)
        val j =
          if (j0 < to && code.charAt(j0) == '\n') {
            var k = j0
            while (k < to && (code.charAt(k) == '\n' || code.charAt(k) == '\r' ||
              code.charAt(k) == ' ' || code.charAt(k) == '\t')) k += 1
            if (k < to && (code.charAt(k) == '.' ||
                (code.charAt(k) == ':' && k + 1 < to && code.charAt(k + 1) == ':')))
              k
            else j0
          } else j0
        if (j >= to) loop = false
        else code.charAt(j) match {
          case '.' if j + 1 < to && isIdStart(code.charAt(j + 1)) =>
            emit(code.substring(start, i)) // navigation node child(0)
            i = readIdent(j + 1)
          case ':' if j + 1 < to && code.charAt(j + 1) == ':' &&
              j + 2 < to && isIdStart(code.charAt(j + 2)) =>
            emit(code.substring(start, i)) // `::` navigation child(0)
            i = readIdent(j + 2)
          case '(' =>
            emit(code.substring(start, i)) // call node child(0)
            val e = matchClose(j, '(', ')', to)
            scanRange(j + 1, e - 1)
            i = e
          case '{' =>
            emit(code.substring(start, i)) // trailing-lambda call node
            val e = matchClose(j, '{', '}', to)
            scanRange(j + 1, e - 1)
            i = e
          case '<' =>
            // call-site type arguments: `<...>` directly followed by
            // `(`/`{` belongs to the call_suffix — child(0) stays the
            // pre-`<` prefix. Anything else is a comparison: chain ends.
            var k = j + 1
            var ok = true
            var depth = 1
            while (ok && k < to && depth > 0) {
              val ck = code.charAt(k)
              if (ck == '<') depth += 1
              else if (ck == '>') depth -= 1
              else if (ck == '\n' || ck == ';' || ck == '=' || ck == '{') ok = false
              k += 1
            }
            val after = if (ok && depth == 0) skipWs(k, to) else to
            if (ok && depth == 0 && after < to &&
                (code.charAt(after) == '(' || code.charAt(after) == '{')) {
              emit(code.substring(start, i)) // callee before type args
              val open = code.charAt(after)
              val e =
                if (open == '(') matchClose(after, '(', ')', to)
                else matchClose(after, '{', '}', to)
              scanRange(after + 1, e - 1)
              i = e
            } else loop = false
          case _ => loop = false
        }
      }
      i
    }
    scanRange(0, n)
    out.toSeq
  }

  /** Abstract type containers (interface/protocol/enum headers) carry
    * member DECLARATIONS that read as `name(` — tree-sitter emits no
    * calls for them (no call_expression under a declaration node). */
  private val AbstractContainerRe = java.util.regex.Pattern.compile(
    """(?:^|\s)(interface|protocol|enum)\s""")
  private val VarRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:val|var|let|const|mut)\s+)?([a-z_][A-Za-z0-9_]*)(?:\s*:\s*[^=\n]+)?\s*=[^=]""",
    java.util.regex.Pattern.MULTILINE)
  /** go short declarations — the FIRST binding of the list (`a, b :=`
    * → a; a leading `_` blank means tree-sitter surfaces nothing). */
  private val GoShortVarRe = java.util.regex.Pattern.compile(
    """(?<![\w.])([a-z_]\w*)(?:\s*,\s*[a-z_]\w*)*\s*:=""")
  /** C-family typed locals: `int temp = *a;`, `Point p = {..};`,
    * `for (int i = 0; ...`, and uninitialized `std::vector<int> r;`.
    * Keyword-led statements (`return x;`) are excluded up front. */
  private val CVarRe = java.util.regex.Pattern.compile(
    """(?:^[ \t]*|\(\s*)(?!(?:return|delete|throw|new|else|typedef|using|case|goto|break|continue)\b)(?:(?:const|static|unsigned|signed|struct|auto|final|private|public|protected)\s+)*[A-Za-z_][\w:]*(?:<[^>\n]{0,40}>)?(?:\s*[*&]+\s*|\s+)([a-z_]\w*)(?:\s*\[\w*\])?\s*(?:=[^=]|;)""",
    java.util.regex.Pattern.MULTILINE)
  /** swift property/constant declarations — tree-sitter counts ONLY
    * `let`/`var`-introduced names (bare reassignments aren't
    * declarations), with or without an initializer. */
  private val SwiftVarRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:(?:public|private|internal|fileprivate|static|lazy|weak)\s+)*(?:let|var)\s+([a-z_]\w*)""",
    java.util.regex.Pattern.MULTILINE)
  private val ImportRe = java.util.regex.Pattern.compile(
    """^[ \t]*(?:import\s+([\w.{}, ]+)|from\s+([\w.]+)\s+import|use\s+([\w:{}, ]+);|#include\s+[<"]([^>"]+)[>"]|(?:(?:const|local|var|let)\s+\w+\s*=\s*)?require\(['"]([^'"]+)['"]\)|require(?:_relative)?[ \t]+['"]([^'"]+)['"])""",
    java.util.regex.Pattern.MULTILINE)
  private val LoopRe = java.util.regex.Pattern.compile("""\b(for|while|loop)\b""")
  private val BranchRe = java.util.regex.Pattern.compile("""\b(if|else|match|switch|when)\b|\bcase\s""")
  private val ErrRe = java.util.regex.Pattern.compile("""\b(try|catch|except|finally|rescue|panic|raise|throw)\b""")
  private val ComplexityRe = java.util.regex.Pattern.compile(
    """\b(if|for|while|case|catch|except|when)\b|&&|\|\|""")

  /** Layer-1 helper: parameters + return type from the text following a
    * definition's name (balanced-paren scan, top-level comma split). */
  /** Parse `(params) [-> ret | : ret | ret]` from the text following a
    * definition's name, with per-language conventions (tree-sitter
    * parity throughout): C family = type-before-name params (`int a` →
    * a, function pointers `int (*func)(int)` → func); go = bare return
    * type between `)` and `{` (`(int, error)` kept as written); python
    * = only `->` marks a return (the def colon is the block opener);
    * php = parameter names keep their `$` sigil. */
  private[operators] def paramsAndReturn(afterName: String,
      lang: String = ""): (Seq[String], String) = {
    val typedFirst = lang == "c" || lang == "cpp" ||
      lang == "java" || lang == "csharp"
    val trailingReturn = lang == "go"
    val arrowOnlyReturn = lang == "python" || lang == "ruby"
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
    val identRe = java.util.regex.Pattern.compile("""([A-Za-z_][A-Za-z0-9_]*)""")
    val fnPtrRe = java.util.regex.Pattern.compile("""\(\s*\*\s*([A-Za-z_]\w*)\s*\)""")
    val params = bounds.sliding(2).flatMap { case Seq(a, b) =>
      val piece0 = afterName.substring(a, math.max(a, b - 1))
      val piece = piece0.takeWhile(_ != '=') // strip default values
      if (lang == "php") {
        // php parameter names keep the sigil (`int $a` → $a)
        val dm = java.util.regex.Pattern
          .compile("""(\$[A-Za-z_]\w*)""").matcher(piece)
        if (dm.find()) Some(dm.group(1)) else None
      } else if (typedFirst) {
        // C family: the NAME is the last identifier of the declarator
        // (`const std::vector<int>& nums` → nums, `char *argv[]` →
        // argv); function-pointer params carry it inside `(*name)`;
        // a bare `void` parameter list declares NO parameters
        val fp = fnPtrRe.matcher(piece)
        if (piece.trim == "void") None
        else if (fp.find()) Some(fp.group(1))
        else {
          val it = identRe.matcher(piece)
          var last: String = null
          while (it.find()) last = it.group(1)
          Option(last)
        }
      } else if (lang == "javascript" || lang == "vue" || lang == "svelte") {
        // tree-sitter JS formal_parameters (analysis.rs:454-459,493-497):
        // only a BARE identifier child is a parameter — assignment_pattern
        // (defaults), rest_pattern (...rest), and object/array_pattern
        // (destructuring) extract NOTHING (their kinds match neither
        // "parameter" nor "identifier")
        val t = piece0.trim
        if (t.matches("[A-Za-z_$][A-Za-z0-9_$]*")) Some(t) else None
      } else if (lang == "typescript" && {
        val t = piece0.trim
        t.startsWith("...") || t.startsWith("{") || t.startsWith("[")
      }) {
        // TS wraps params in required_parameter nodes whose `pattern`
        // field must be an identifier — defaults qualify (the pattern is
        // still the identifier), rest/destructuring patterns do not
        None
      } else {
        val pm = java.util.regex.Pattern
          .compile("""[&*]?\s*(?:mut\s+)?([A-Za-z_][A-Za-z0-9_]*)""").matcher(piece)
        if (pm.find()) {
          // swift's wildcard external label: `_ date: Date` names the
          // INTERNAL identifier (tree-sitter scores `date`). Capture the
          // first group BEFORE re-finding: group() on a failed find()
          // throws IllegalStateException (crashed on python stdlib's
          // bare-`_` parameters — `def f(self, _)` — r15 corpus sweep).
          // A LONE `_` is a real identifier in python/ruby (the
          // reference's identifier-node path emits it); elsewhere it is
          // a wildcard pattern tree-sitter never names.
          val g1 = pm.group(1)
          if (g1 != "_") Some(g1)
          else if (pm.find()) Some(pm.group(1))
          else if (lang == "python" || lang == "ruby") Some("_")
          else None
        } else None
      }
    }.toSeq
    val after = afterName.substring(close + 1)
    val retPat = if (arrowOnlyReturn) """^\s*(?:->)\s*([^={:\n]+)"""
      else """^\s*(?:->|:)\s*([^={\n]+)"""
    val retM = java.util.regex.Pattern.compile(retPat).matcher(after)
    val ret =
      if (retM.find()) retM.group(1).trim
      else if (trailingReturn)
        after.takeWhile(c => c != '{' && c != '\n').trim
      else ""
    (params, ret)
  }

  /** Layer-1 helper: docstring — a Python-style triple-quoted string in
    * the body, or the contiguous comment block immediately above. */
  /** Languages whose doc comments the reference processes with the
    * JSDoc branch (analysis.rs:143-180): per line, trim, strip a
    * leading slash-star-star or slash-star, strip leading stars, strip
    * a trailing star-slash, trim; EMPTY lines dropped, the rest joined
    * with one space. A closing star-slash alone on a line therefore
    * survives as `/` — replicated for byte parity. */
  private val JsDocLangs = Set("javascript", "typescript", "vue", "svelte",
    "java", "csharp", "kotlin", "scala", "php", "c", "cpp")

  private[operators] def docstringOf(lines: Array[String], startLine: Int,
      code: String, lang: String = ""): String = {
    val dsM = java.util.regex.Pattern
      .compile("\"\"\"([\\s\\S]*?)\"\"\"|'''([\\s\\S]*?)'''").matcher(code)
    if (dsM.find()) {
      if (lang == "python") {
        // reference parity (analysis.rs:102-121): the string node's FULL
        // physical lines, quote chars trimmed from the STRING ends only
        // — an indented docstring's leading quotes are shielded by the
        // indent and survive the whitespace trim
        val ls = code.lastIndexOf('\n', dsM.start) + 1
        val le0 = code.indexOf('\n', dsM.end)
        val le = if (le0 < 0) code.length else le0
        val joined = code.substring(ls, le)
        val noTrail = joined.reverse.dropWhile(c => c == '"' || c == '\'').reverse
        return noTrail.dropWhile(c => c == '"' || c == '\'').trim.take(512)
      }
      val raw = Option(dsM.group(1)).getOrElse(dsM.group(2))
      return raw.trim.take(512)
    }
    if (lang == "ocaml" && startLine >= 1) {
      // OCamldoc parity (analysis.rs:338-364): a `(** ... *)` comment
      // directly above the binding
      val am = java.util.regex.Pattern
        .compile("""^\(\*\*\s*(.*?)\s*\*+\)$""")
        .matcher(lines(startLine - 1).trim)
      if (am.find()) return am.group(1).trim.take(512)
    }
    if (lang == "haskell") {
      // Haddock parity (analysis.rs:181-207): only a `-- |`/`-- ^` line
      // anchors a docstring; plain `--` lines extend an anchored one
      // upward; any other nonempty line stops the scan
      val doc = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = startLine - 1
      var stop = false
      while (i >= 0 && !stop) {
        val line = lines(i).trim
        if (line.startsWith("-- |") || line.startsWith("-- ^"))
          doc.insert(0, line.stripPrefix("-- |").stripPrefix("-- ^").trim)
        else if (line.startsWith("--") && doc.nonEmpty)
          doc.insert(0, line.stripPrefix("--").trim)
        else if (line.nonEmpty) stop = true
        i -= 1
      }
      return doc.mkString(" ").take(512)
    }
    if (lang == "lua") {
      // LuaDoc parity (analysis.rs:366-397): `--` lines collect, but the
      // block only counts as a docstring when at least one line opened
      // with `---`
      val doc = scala.collection.mutable.ArrayBuffer.empty[String]
      var found = false
      var i = startLine - 1
      var stop = false
      while (i >= 0 && !stop) {
        val line = lines(i).trim
        if (line.startsWith("---")) {
          doc.insert(0, line.dropWhile(_ == '-').trim)
          found = true
        } else if (line.startsWith("--"))
          doc.insert(0, line.stripPrefix("--").trim)
        else if (line.nonEmpty) stop = true
        i -= 1
      }
      return (if (found) doc.mkString(" ") else "").take(512)
    }
    if (JsDocLangs(lang) && startLine >= 1 &&
        lines(startLine - 1).trim.endsWith("*/")) {
      var i = startLine - 1
      while (i >= 0 && !(lines(i).trim.startsWith("/**") ||
          lines(i).trim.startsWith("/*"))) i -= 1
      if (i >= 0) {
        val doc = (i until startLine).map { j =>
          lines(j).trim
            .stripPrefix("/**").stripPrefix("/*")
            .dropWhile(_ == '*')
            .stripSuffix("*/")
            .trim
        }.filter(_.nonEmpty).mkString(" ")
        return doc.take(512)
      }
    }
    // comment block immediately above the definition (`--` covers
    // Lua/Haskell/SQL line comments; `@doc "..."` is Elixir's attribute)
    val block = scala.collection.mutable.ArrayBuffer.empty[String]
    var li = startLine - 1
    while (li >= 0 && lines(li).trim.matches("""^(///|//|#|\*|/\*\*?|\*/|--).*|^\s*$""") &&
        lines(li).trim.nonEmpty) {
      // full trim after the marker strip (reference joins TRIMMED lines
      // with one space — `///   - a` must not keep its inner indent)
      block += lines(li).trim
        .replaceAll("""^(///|//|--(?: ?\|)?|#|\*+/?|/\*+)\s?""", "")
        .replaceAll("""\s*\*+/\s*$""", "")
        .trim
      li -= 1
    }
    if (block.isEmpty && startLine >= 1) {
      // Elixir: @doc "..." / @doc """...""" directly above the def
      val above = lines(startLine - 1).trim
      val am = java.util.regex.Pattern
        .compile("""^@doc\s+"{1,3}(.*?)"{0,3}\s*$""").matcher(above)
      if (am.find() && am.group(1).nonEmpty) block += am.group(1)
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
    languageOf(path) match {
      case None => Seq.empty // unknown extension: file skipped entirely
      case Some(l) if TextFormats(l) => documentUnits(path, l, source)
      case Some(l @ ("vue" | "svelte")) => sfcUnits(path, l, source)
      case Some("html") => htmlUnits(path, source)
      case Some("css") => cssUnits(path, source)
      case Some(l) => codeUnits(path, l, source, 0)
    }
  }

  /** Text/config formats: ONE document unit per file — name = file stem,
    * signature = first non-empty line, docstring = first paragraph (≤5
    * lines), matching colgrep/src/parser/text.rs:18-123. Blank files
    * yield nothing. */
  private[operators] def documentUnits(path: String, lang: String, source: String): Seq[CodeUnit] = {
    val lines = source.split("\n", -1)
    if (lines.forall(_.trim.isEmpty)) return Seq.empty
    val fname = path.substring(path.lastIndexOf('/') + 1)
    val dot = fname.lastIndexOf('.')
    val stem = if (dot > 0) fname.substring(0, dot) else fname
    val signature = lines.find(_.trim.nonEmpty).map(_.trim).getOrElse("")
    val doc = lines.iterator.map(_.trim).takeWhile(_.nonEmpty).take(5).mkString(" ")
    // endLine counts like Rust's `source.lines()`: a file ending in '\n'
    // contributes no trailing empty line (text.rs end_line = lines.len())
    val endLine = if (lines.last.isEmpty) lines.length - 1 else lines.length
    Seq(CodeUnit(path, lang, "document", stem, signature, 1, endLine,
      source, Seq.empty, docstring = doc.take(512), qualifiedName = s"$path::$stem"))
  }

  /** `<script>` blocks of an HTML-ish file as (0-indexed start line,
    * content); external scripts (`src=`) skipped
    * (colgrep/src/parser/html.rs:25-88, vue.rs:26-74). */
  private[operators] def scriptBlocks(source: String): Seq[(Int, String)] = {
    val lines = source.split("\n", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var inScript = false
    // open tag seen but its '>' not yet (attributes span lines): collect
    // the attribute text so the src= check covers the whole tag region
    var inOpenTag = false
    var attrBuf = new StringBuilder
    var start = 0
    var i = 0
    while (i < lines.length) {
      val t = lines(i).trim
      if (inOpenTag) {
        val gt = lines(i).indexOf('>')
        if (gt < 0) attrBuf.append(' ').append(lines(i))
        else {
          attrBuf.append(' ').append(lines(i).substring(0, gt))
          inOpenTag = false
          // src= only counts inside the attribute region of the tag
          if (!attrBuf.toString.contains("src=")) {
            val after = lines(i).substring(gt + 1)
            val close = after.indexOf("</script")
            if (close >= 0) {
              if (after.substring(0, close).trim.nonEmpty)
                out += ((i, after.substring(0, close)))
            } else {
              inScript = true
              buf.clear()
              if (after.trim.nonEmpty) { buf += after; start = i }
              else start = i + 1
            }
          }
        }
      } else if (!inScript) {
        if (t.startsWith("<script")) {
          val gt = t.indexOf('>')
          if (gt < 0) { // open tag continues on later lines
            inOpenTag = true
            attrBuf = new StringBuilder(t)
          } else if (!t.substring(0, gt).contains("src=")) {
            val after = t.substring(gt + 1)
            val close = after.indexOf("</script")
            if (close >= 0) { // one-line <script>…</script>
              if (after.substring(0, close).trim.nonEmpty)
                out += ((i, after.substring(0, close)))
            } else {
              inScript = true
              buf.clear()
              if (after.trim.nonEmpty) { buf += after; start = i }
              else start = i + 1
            }
          }
        }
      } else {
        val close = lines(i).indexOf("</script")
        if (close >= 0) {
          if (lines(i).substring(0, close).trim.nonEmpty)
            buf += lines(i).substring(0, close)
          if (buf.nonEmpty) out += ((start, buf.mkString("\n")))
          inScript = false
        } else buf += lines(i)
      }
      i += 1
    }
    out.toSeq
  }

  /** Vue/Svelte SFC: script blocks parsed with the TS/JS rules (line
    * numbers shifted to file positions), plus the template markup as one
    * raw_code unit named "template" — Vue: lines inside `<template>`;
    * Svelte: non-empty lines outside `<script>`/`<style>`
    * (colgrep/src/parser/vue.rs:165-196, svelte.rs:82-133). */
  private[operators] def sfcUnits(path: String, lang: String, source: String): Seq[CodeUnit] = {
    val scriptUnits = scriptBlocks(source).flatMap { case (off, content) =>
      val units = codeUnits(path, "typescript", content, off)
        .filterNot(_.kind == "raw_code")
        .map(u => u.copy(language = lang))
      // Svelte props (`export let name = ...`) are units under
      // tree-sitter-svelte (svelte.rs prop extraction)
      val props =
        if (lang != "svelte") Seq.empty
        else {
          val pm = java.util.regex.Pattern
            .compile("""^[ \t]*export\s+let\s+(\w+)""", java.util.regex.Pattern.MULTILINE)
            .matcher(content)
          val contentLines = content.split("\n", -1)
          val starts = contentLines.scanLeft(0)((a, l) => a + l.length + 1)
          val out = scala.collection.mutable.ArrayBuffer.empty[CodeUnit]
          while (pm.find()) {
            val line = starts.lastIndexWhere(_ <= pm.start())
            out += CodeUnit(path, lang, "constant", pm.group(1),
              contentLines(line).trim, off + line + 1, off + line + 1,
              contentLines(line).trim, Seq.empty, qualifiedName = pm.group(1))
          }
          out.toSeq
        }
      units ++ props
    }
    val lines = source.split("\n", -1)
    val template: Option[(Int, String)] =
      if (lang == "vue") {
        val s = lines.indexWhere(l => l.trim.startsWith("<template"))
        val e = lines.indexWhere(l => l.trim.startsWith("</template"))
        if (s >= 0 && e > s + 1) Some((s + 1, lines.slice(s + 1, e).mkString("\n")))
        else None
      } else {
        var inBlock = false
        val kept = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        lines.zipWithIndex.foreach { case (l, i) =>
          val t = l.trim
          if (t.startsWith("<script") || t.startsWith("<style")) inBlock = true
          else if (t.startsWith("</script") || t.startsWith("</style")) inBlock = false
          else if (!inBlock && t.nonEmpty) kept += ((i, l))
        }
        if (kept.isEmpty) None
        else Some((kept.head._1, kept.map(_._2).mkString("\n")))
      }
    val templateUnit = template.map { case (startLine0, content) =>
      val sig = content.split("\n").find(_.trim.nonEmpty).map(_.trim).getOrElse("")
      CodeUnit(path, lang, "raw_code", "template", sig, startLine0 + 1,
        startLine0 + math.max(1, content.split("\n", -1).length), content,
        Seq.empty, qualifiedName = s"$path::template")
    }
    scriptUnits ++ templateUnit
  }

  /** HTML: script blocks parsed as JavaScript + the whole markup as one
    * raw_code `html_structure` unit (colgrep/src/parser/html.rs:130-196). */
  private[operators] def htmlUnits(path: String, source: String): Seq[CodeUnit] = {
    val scriptUnits = scriptBlocks(source).flatMap { case (off, content) =>
      codeUnits(path, "javascript", content, off)
        .filterNot(_.kind == "raw_code")
        .map(u => u.copy(language = "html"))
    }
    val lines = source.split("\n", -1)
    val structure =
      if (lines.forall(_.trim.isEmpty)) None
      else {
        val sig = lines.find(_.trim.nonEmpty).map(_.trim).getOrElse("")
        Some(CodeUnit(path, "html", "raw_code", "html_structure", sig, 1,
          lines.length, source, Seq.empty,
          qualifiedName = s"$path::html_structure"))
      }
    scriptUnits ++ structure
  }

  /** CSS: each top-level rule (`selector { … }`, including at-rules)
    * becomes a section unit named by its selector. The reference parses
    * CSS with tree-sitter (colgrep/src/parser/language.rs:118); a
    * selector-per-rule split is the regex-framework equivalent. */
  private[operators] def cssUnits(path: String, source: String): Seq[CodeUnit] = {
    val lines = source.split("\n", -1)
    val lineStarts = lines.scanLeft(0)((acc, l) => acc + l.length + 1)
    def lineOf(off: Int): Int = {
      var lo = 0; var hi = lines.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (lineStarts(mid) <= off) lo = mid else hi = mid - 1
      }
      lo
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[CodeUnit]
    var depth = 0
    var segStart = 0 // where the pending selector text begins
    var ruleStart = -1
    var ruleSel = ""
    var i = 0
    while (i < source.length) {
      val ch = source.charAt(i)
      if (ch == '/' && i + 1 < source.length && source.charAt(i + 1) == '*') {
        val end = source.indexOf("*/", i + 2)
        val after = if (end < 0) source.length else end + 2
        // a comment before any selector text must not leak into the name
        if (depth == 0 && source.substring(segStart, i).trim.isEmpty) segStart = after
        i = after - 1
      } else ch match {
        case '{' =>
          if (depth == 0) {
            ruleSel = source.substring(segStart, i).trim.replaceAll("\\s+", " ")
            ruleStart = segStart
          }
          depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && ruleSel.nonEmpty) {
            var rs = ruleStart
            while (rs < i && source.charAt(rs).isWhitespace) rs += 1
            val s = lineOf(rs)
            val e = lineOf(i)
            out += CodeUnit(path, "css", "section", ruleSel.take(80), ruleSel,
              s + 1, e + 1, lines.slice(s, e + 1).mkString("\n"), Seq.empty,
              qualifiedName = ruleSel.take(80))
            ruleSel = ""
            segStart = i + 1
          }
        case ';' if depth == 0 => segStart = i + 1
        case _ =>
      }
      i += 1
    }
    if (out.isEmpty && lines.exists(_.trim.nonEmpty))
      out += CodeUnit(path, "css", "raw_code", "", lines.find(_.trim.nonEmpty).map(_.trim).getOrElse(""),
        1, lines.length, source, Seq.empty)
    out.toSeq
  }

  /** Offsets that sit inside string literals, comments, or parenthesized
    * headers — positions where a `;` is not a statement boundary. Same
    * lexer approximation as the brace-depth walk in [[codeUnits]], plus
    * `#`/`--` line comments for the languages that use them, plus paren
    * depth (so `for(;;)` separators don't anchor definitions). */
  private[graft] def maskedOffsets(source: String, lang: String,
      maskParens: Boolean = true): java.util.BitSet = {
    val masked = new java.util.BitSet(source.length)
    val hashComment =
      Set("python", "ruby", "elixir", "r", "julia", "perl", "shell")(lang)
    val dashComment = Set("lua", "sql", "haskell")(lang)
    // languages where ' delimits full strings (vs char literals /
    // lifetimes, which keep the short-lookahead heuristic below)
    val sqStringLang = Set("python", "javascript", "typescript", "ruby",
      "php", "shell", "sql", "lua", "r", "elixir")(lang)
    // languages with triple-quoted strings ("""..""" / '''..''') that
    // span newlines — a ';' on line 2+ of a docstring must stay masked
    val tripleLang = Set("python", "elixir", "julia")(lang)
    val S_CODE = 0; val S_STR = 1; val S_LINE = 2; val S_BLOCK = 3
    val S_TRIPLE = 4
    var state = S_CODE
    var strQuote = ' '
    var paren = 0
    def tripleAt(idx: Int, q: Char): Boolean =
      idx + 2 < source.length &&
        source.charAt(idx) == q && source.charAt(idx + 1) == q &&
        source.charAt(idx + 2) == q
    var i = 0
    while (i < source.length) {
      val ch = source.charAt(i)
      state match {
        case S_STR =>
          masked.set(i)
          if (ch == '\\') { if (i + 1 < source.length) masked.set(i + 1); i += 1 }
          // backtick strings (JS/TS templates, Go raw strings) span
          // newlines; the newline bailout stays for '/"' strings only
          // (an unterminated one must not swallow the rest of the file)
          else if (ch == strQuote || (ch == '\n' && strQuote != '`')) state = S_CODE
        case S_TRIPLE =>
          masked.set(i)
          if (ch == '\\') { if (i + 1 < source.length) masked.set(i + 1); i += 1 }
          else if (tripleAt(i, strQuote)) {
            masked.set(i + 1); masked.set(i + 2); i += 2; state = S_CODE
          }
        case S_LINE =>
          if (ch == '\n') state = S_CODE else masked.set(i)
        case S_BLOCK =>
          masked.set(i)
          if (ch == '*' && i + 1 < source.length && source.charAt(i + 1) == '/') {
            masked.set(i + 1); state = S_CODE; i += 1
          }
        case _ => ch match {
          case '"' | '`' =>
            if (ch == '"' && tripleLang && tripleAt(i, '"')) {
              state = S_TRIPLE; strQuote = '"'
              masked.set(i); masked.set(i + 1); masked.set(i + 2); i += 2
            } else { state = S_STR; strQuote = ch; masked.set(i) }
          case '\'' if sqStringLang =>
            // full string delimiter (python/js/ruby/...): an apostrophe
            // cannot appear in code outside strings/comments in these
            // languages, so no lookahead heuristic is needed
            if (tripleLang && tripleAt(i, '\'')) {
              state = S_TRIPLE; strQuote = '\''
              masked.set(i); masked.set(i + 1); masked.set(i + 2); i += 2
            } else { state = S_STR; strQuote = '\''; masked.set(i) }
          case '\'' =>
            // char-literal languages (rust lifetimes, C/Java chars):
            // only mask when a closing quote sits within 3 chars, so a
            // lifetime `'a` or an apostrophe in prose is not a string
            val lookEnd = math.min(i + 4, source.length)
            var j = i + 1
            if (j < lookEnd && source.charAt(j) == '\\') j += 1
            var closes = false
            while (j < lookEnd && !closes) {
              if (source.charAt(j) == '\'') closes = true
              j += 1
            }
            if (closes) { state = S_STR; strQuote = '\''; masked.set(i) }
          case '#' if hashComment => state = S_LINE; masked.set(i)
          case '-' if dashComment && i + 1 < source.length && source.charAt(i + 1) == '-' =>
            state = S_LINE; masked.set(i); masked.set(i + 1); i += 1
          case '/' if i + 1 < source.length && source.charAt(i + 1) == '/' =>
            state = S_LINE; masked.set(i); masked.set(i + 1); i += 1
          case '/' if i + 1 < source.length && source.charAt(i + 1) == '*' =>
            state = S_BLOCK; masked.set(i); masked.set(i + 1); i += 1
          case '(' => if (maskParens && paren > 0) masked.set(i); paren += 1
          case ')' => paren = math.max(0, paren - 1); if (maskParens && paren > 0) masked.set(i)
          case _ => if (maskParens && paren > 0) masked.set(i)
        }
      }
      i += 1
    }
    masked
  }

  /** Code-language extraction (the regex parser proper). `lineOffset`
    * shifts reported line numbers — used when the source is an embedded
    * script block of a larger file. */
  private[operators] def codeUnits(path: String, lang: String, source: String,
      lineOffset: Int): Seq[CodeUnit] = {
    val lines = source.split("\n", -1)
    val lineStart = lines.scanLeft(0)((acc, l) => acc + l.length + 1)
    // Uses/imports — module-NAME normalization per the reference
    // (analysis.rs:763-1000): qualified-import langs keep the LAST dot
    // component, others the FIRST; go/ruby keep the last `/` segment;
    // python counts only plain `import X` (from-imports don't surface);
    // ocaml modules come from `open` AND dotted references.
    val imports = {
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      def add(m: String): Unit = if (m.nonEmpty) out += m
      val lastDot = Set("java", "kotlin", "scala", "csharp")
      val jsFamily = Set("javascript", "typescript", "vue", "svelte")
      if (lang == "go") {
        val single = java.util.regex.Pattern
          .compile("(?m)^import\\s+(?:\\w+\\s+)?\"([^\"]+)\"").matcher(source)
        while (single.find()) add(single.group(1).split('/').last)
        val block = java.util.regex.Pattern
          .compile("(?s)import\\s*\\(([^)]*)\\)").matcher(source)
        while (block.find()) {
          val qm = java.util.regex.Pattern
            .compile("\"([^\"]+)\"").matcher(block.group(1))
          while (qm.find()) add(qm.group(1).split('/').last)
        }
      } else if (lang == "ocaml") {
        val om = java.util.regex.Pattern
          .compile("(?m)^\\s*open\\s+([A-Z][\\w.]*)").matcher(source)
        while (om.find()) add(om.group(1))
        val dm = java.util.regex.Pattern
          .compile("(?<![\\w.'])([A-Z]\\w*)\\.\\w").matcher(source)
        while (dm.find()) add(dm.group(1))
      } else {
        val im = ImportRe.matcher(source)
        while (im.find()) {
          val groups = (1 to 6).map(i => i -> im.group(i))
            .collectFirst { case (i, g) if g != null => (i, g.trim) }
          groups.foreach { case (gi, g0) =>
            if (gi == 2 && lang == "python") () // from-import: not surfaced
            else {
              val g =
                if (jsFamily(lang) && g0.contains(" from"))
                  g0.substring(0, g0.indexOf(" from")).trim
                else g0
              if (g.nonEmpty && !g.startsWith("{")) {
                val path = g.takeWhile(c => c != '{' && c != ';').trim
                  .split("\\s+").headOption.getOrElse("")
                val comps = path.split('.').filter(_.nonEmpty)
                if (comps.nonEmpty) {
                  if (gi == 4 || gi == 5 || gi == 6)
                    add(path.split('/').last) // include/require: basename
                  else if (lastDot(lang)) add(comps.last)
                  else add(comps.head.split("::").head)
                }
              }
            }
          }
        }
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
    // dotted/colon function names: in Lua the WHOLE dotted/colon text
    // IS the unit name ("M.greet", "obj:method" — tree-sitter-lua's
    // name node spans it; test_lua.rs:107,164,254,270), kind Function,
    // no parent. Elsewhere the last dot segment is the name and the
    // prefix the receiver; a ':' is a type ascription (`def foo: Int`)
    // — strip, don't split.
    def splitDotted(raw: String): (String, String) = {
      if (lang == "lua") return ("", raw)
      val base = raw.takeWhile(_ != ':')
      val cut = base.lastIndexOf('.')
      if (cut >= 0) (base.substring(0, cut), base.substring(cut + 1)) else ("", base)
    }
    scan(FuncRe, "function", m => splitDotted(m.group(2))._2,
      m => {
        val pre = splitDotted(m.group(2))._1
        if (pre.nonEmpty) receiverType(pre)
        else Option(m.group(1)).map(receiverType).getOrElse("")
      })
    scan(ClassRe, "class", _.group(1))
    if (lang == "java" || lang == "csharp")
      scan(CMethodRe, "function", _.group(2), retHint = _.group(1))
    if (lang == "c" || lang == "cpp") {
      // qualified names (`Shape::draw`, `Ns::Cls::~Cls`): last segment
      // is the name, the segment before it the receiver type
      def cqName(raw: String): (String, String) = {
        val parts = raw.split("::")
        if (parts.length > 1) (parts(parts.length - 2), parts.last)
        else ("", raw)
      }
      scan(CFuncRe, "function",
        m => {
          val (_, n) = cqName(m.group(2))
          val t = m.group(1).takeWhile(c => c.isLetterOrDigit || c == '_')
          if (CFuncStop(n) || CFuncStop(t)) "" else n
        },
        recv = m => cqName(m.group(2))._1,
        retHint = _.group(1))
      scan(CppDtorRe, "function",
        m => m.group(1).split("::").last,
        recv = m => { val p = m.group(1).split("::"); if (p.length > 1) p(p.length - 2) else "" })
    }
    if (lang == "go") scan(GoConstRe, "constant", _.group(1))
    if (lang == "javascript" || lang == "typescript") {
      scan(JsMethodRe, "function",
        m => { val n = m.group(1); if (JsMethodStop(n)) "" else n })
      scan(JsArrowRe, "function", _.group(1))
    }
    if (lang == "qml") {
      scan(QmlComponentRe, "class", _.group(1))
      scan(QmlInlineComponentRe, "class", _.group(1))
      scan(QmlSignalRe, "function", _.group(1))
      scan(QmlHandlerRe, "function", _.group(1))
      scan(QmlPropertyRe, "constant", _.group(1))
      scan(QmlGroupedBindingRe, "class",
        m => { val n = m.group(1); if (QmlGroupStop(n)) "" else n })
    }
    scan(ConstRe, "constant", _.group(1))
    lang match {
      case "haskell" => scan(HsSigRe, "function", _.group(1))
      case "ocaml" => scan(OcamlLetRe, "function", _.group(1))
      case "r" => scan(RFuncRe, "function", _.group(1))
      case "zig" => scan(ZigTypeRe, "class", _.group(1))
      case "sql" =>
        val m = SqlCreateRe.matcher(source)
        while (m.find()) {
          val kind =
            if (m.group(1).toLowerCase.startsWith("function") ||
                m.group(1).toLowerCase.startsWith("procedure")) "function"
            else "class"
          defs0 += ((m.start(), m.end(), m.group(2), kind, "", ""))
        }
      case _ =>
    }
    // tree-sitter-haskell's `function` node is the FIRST EQUATION only —
    // the `name :: ...` type signature is a sibling `signature` node, and
    // later equations are separate nodes (test_haskell.rs: `length`'s
    // code is exactly `length [] = 0`, excluding the signature line and
    // the cons equation). Shift each sig-anchored def to its first
    // equation line; the equation block spans its indented guard lines.
    val hsEqEnds = scala.collection.mutable.HashMap.empty[Int, Int]
    // equation offset → original `::` signature line, so doc comments
    // above the signature still attach as the unit's docstring
    val hsSigLine = scala.collection.mutable.HashMap.empty[Int, Int]
    if (lang == "haskell") {
      val adjusted = defs0.map { case d @ (off, _, name, kind, recv, ret) =>
        if (kind != "function") d
        else {
          var eq = -1
          var li = lineOf(off) + 1
          while (eq < 0 && li < lines.length) {
            val l = lines(li)
            val ok = l.startsWith(name) && (l.length == name.length || {
              val c = l.charAt(name.length)
              !c.isLetterOrDigit && c != '\'' && c != '_'
            })
            if (ok) eq = li else li += 1
          }
          if (eq < 0) d
          else {
            var endLi = eq
            var mi = eq + 1
            while (mi < lines.length && lines(mi).nonEmpty &&
                (lines(mi).charAt(0) == ' ' || lines(mi).charAt(0) == '\t')) {
              endLi = mi; mi += 1
            }
            val eqOff = lineStart(eq)
            val eqEnd = lineStart(endLi) + lines(endLi).length
            hsEqEnds(eqOff) = eqEnd
            hsSigLine(eqOff) = lineOf(off)
            (eqOff, math.min(eqEnd, eqOff + name.length), name, kind, recv, ret)
          }
        }
      }
      defs0.clear(); defs0 ++= adjusted
    }
    val kindPrio = Map("class" -> 3, "function" -> 2, "constant" -> 1)
    // a `;`-anchored match whose `;` sits inside a string literal, a
    // comment, or a paren header (`for(;;)`) is not a statement boundary —
    // drop it before span math (line-anchored matches are untouched)
    lazy val masked = maskedOffsets(source, lang)
    // Go for-headers carry no parens (`for i := 0; cond; i++`), so their
    // `;`s sit at depth 0 unmasked. Go-only: in paren-header languages a
    // line CAN legitimately host `for(...);function f(){}` (minified JS)
    // and the header `;`s are already paren-masked there.
    def forHeaderLine(off: Int): Boolean = lang == "go" && {
      val t = lines(lineOf(off)).dropWhile(c => c == ' ' || c == '\t')
      t.startsWith("for") && (t.length == 3 || !Character.isLetterOrDigit(t.charAt(3)))
    }
    val defs = defs0.toSeq
      .filter { case (off, _, _, _, _, _) =>
        off == 0 || source.charAt(off - 1) != ';' ||
          (!masked.get(off - 1) && !forHeaderLine(off)) }
      .groupBy(_._1).valuesIterator
      .map(ds => ds.maxBy(d => kindPrio(d._4)))
      .toSeq.sortBy(_._1)
    if (defs.isEmpty)
      return Seq(CodeUnit(path, lang, "raw_code", "", lines.headOption.getOrElse("").trim,
        1 + lineOffset, lines.length + lineOffset, source, Seq.empty, imports = imports))
    // class nesting. Indentation languages (python/ruby/text): a stack of
    // (indent, className) — defs at or left of a class's indent close its
    // scope. Brace languages: a single char walk tracking brace depth, so
    // a def inside `class X { ... }` gets parent X regardless of
    // indentation (the regex twin of tree-sitter's node nesting).
    val indentScoped = Set("python", "ruby", "text", "elixir", "lua",
      "julia", "haskell", "ocaml", "sql")
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

    // Abstract type containers stay SINGLE units — members are never
    // split out, and the container's span runs over its whole body
    // (colgrep mod.rs:51-71 `is_abstract_type_container`: recursion is
    // skipped for these kinds). Dropping member defs BEFORE span math
    // makes the container's span extend to the next surviving def.
    val containerKws: Set[String] = lang match {
      case "rust" | "scala" => Set("trait")
      case "typescript" | "vue" | "svelte" => Set("interface", "type", "enum")
      case "java" | "csharp" => Set("interface", "enum")
      case "swift" => Set("protocol", "enum")
      case "kotlin" => Set("interface")
      case "php" => Set("interface", "trait", "enum")
      case "cpp" => Set("enum")
      case _ => Set.empty
    }
    val (fdefs, fparents) =
      if (containerKws.isEmpty || indentScoped(lang)) (defs, parentOf)
      else {
        val kwRe = java.util.regex.Pattern.compile(
          """(?:^|\s)(""" + containerKws.mkString("|") + """)\s""")
        // names whose lexical children are suppressed; grows transitively
        // so a class nested in an interface drops its own members too
        val suppressed = scala.collection.mutable.HashSet.empty[String]
        val keep = Array.fill(defs.length)(true)
        defs.indices.foreach { i =>
          val (off, endOff, name, kind, _, _) = defs(i)
          if (suppressed.contains(parentOf(i))) {
            keep(i) = false
            if (kind == "class") suppressed += name
          } else if (kind == "class" &&
              kwRe.matcher(source.substring(off, endOff)).find())
            suppressed += name // container itself is kept, children dropped
        }
        (defs.indices.filter(keep).map(defs),
          defs.indices.filter(keep).map(parentOf))
      }

    val units = fdefs.zipWithIndex.map { case ((off, endOff, name, kind0, recv, retHint), i) =>
      val start = lineOf(off)
      val coloc = i > 0 && lineOf(fdefs(i - 1)._1) == start
      val nextOff = if (i + 1 < fdefs.length) fdefs(i + 1)._1 else source.length
      // Brace-balanced span (tree-sitter node equivalence): the unit runs
      // to the matching '}' of its first unmasked '{', so a container
      // covers its whole body — member units OVERLAP it, as in the
      // reference (colgrep test_cpp.rs:293-311 asserts Point includes its
      // methods AND distance is its own unit) — and a block's last
      // function no longer swallows the enclosing closer. The '{' search
      // stops at an unmasked ';' (prototype/statement end) or the next
      // def (expression-bodied defs keep the line-based fallback).
      val balancedEnd: Int = if (indentScoped(lang)) -1 else {
        var j = off; var open = -1
        while (j < math.min(nextOff, source.length) && open < 0) {
          val c = source.charAt(j)
          if (!masked.get(j)) {
            if (c == '{') open = j
            else if (c == ';') j = source.length // statement ends before any body brace
          }
          j += 1
        }
        if (open < 0) -1 else {
          var depth = 0; var k = open; var close = -1
          while (k < source.length && close < 0) {
            val c = source.charAt(k)
            if (!masked.get(k)) {
              if (c == '{') depth += 1
              else if (c == '}') { depth -= 1; if (depth == 0) close = k }
            }
            k += 1
          }
          if (close < 0) -1
          else if (close + 1 < source.length && source.charAt(close + 1) == ';') close + 2
          else close + 1
        }
      }
      val (end, unitEndOff) =
        if (balancedEnd > 0) (lineOf(balancedEnd - 1), math.max(endOff, balancedEnd))
        else if (lang == "haskell" && hsEqEnds.contains(off)) {
          val e = hsEqEnds(off); (lineOf(e - 1), e)
        } else {
          // next def on the SAME line (co-located `def a = 1; def b = 2`)
          // would otherwise give end = start - 1: clamp, and truncate this
          // unit's text at the next def's offset instead of the line end
          val e = math.max(start,
            if (i + 1 < fdefs.length) lineOf(fdefs(i + 1)._1) - 1 else lines.length - 1)
          val le = lineStart(e) + lines(e).length
          (e, math.max(endOff,
            if (i + 1 < fdefs.length) math.min(le, fdefs(i + 1)._1) else le))
        }
      // Preceding attributes/decorators/doc comments fold into the code
      // span — colgrep ast.rs:362-408 `find_start_with_attributes`
      // replicated per language (blank lines between attributes are
      // skipped there too, and the signature stays the declaration line).
      // Swift attributes are part of the tree-sitter NODE, so they also
      // become the signature line (test_swift.rs '@propertyWrapper').
      val prevLine = if (i > 0) lineOf(fdefs(i - 1)._1) else -1
      def isAttr(l: String): Boolean = lang match {
        case "rust" => l.startsWith("#[") || l.startsWith("#![") || l.startsWith("///")
        case "python" | "java" | "kotlin" | "scala" => l.startsWith("@")
        case "csharp" => l.startsWith("[") && l.endsWith("]")
        case "javascript" | "typescript" | "vue" | "svelte" =>
          l.startsWith("@") || l.startsWith("/**") || l.startsWith("*")
        case "go" => l.startsWith("//")
        case "swift" => l.startsWith("@")
        case _ => false
      }
      val prefixLine: Int = if (coloc) start else {
        var first = start
        var li = start - 1
        var walking = true
        while (walking && li > prevLine && li >= 0) {
          val l = lines(li).trim
          if (l.isEmpty) li -= 1 // blank lines between attributes: skip
          else if (isAttr(l)) { first = li; li -= 1 }
          else walking = false
        }
        first
      }
      val codeStart = if (coloc) off else lineStart(prefixLine)
      val code = source.substring(codeStart, unitEndOff)
      val defLineStart = if (coloc) off else lineStart(start)
      val defLineEnd = math.min(lineStart(start) + lines(start).length, unitEndOff)
      val sigText =
        if (lang == "swift" && prefixLine < start) lines(prefixLine).trim
        else source.substring(defLineStart, math.max(defLineStart, defLineEnd)).trim
      // kotlin EXTENSION functions (`fun String.addExclamation()`) stay
      // top-level Functions with no parent class (tree-sitter parity:
      // the receiver type is part of the signature, not an enclosing
      // class); nesting-derived parents still make methods
      val parent =
        if (lang == "kotlin" && recv.nonEmpty) fparents(i)
        else if (recv.nonEmpty) recv else fparents(i)
      val kind = if (kind0 == "function" && parent.nonEmpty) "method" else kind0
      // Calls: tree-sitter parity — names SORTED (the reference joins a
      // BTreeSet), self-calls INCLUDED (recursion is a real call edge)
      // except when the match sits on the unit's own definition line
      // (that's the declaration, not a call), and abstract containers
      // (interface/protocol/enum) emit none (member declarations are
      // not call_expressions).
      val calls = scala.collection.mutable.HashSet.empty[String]
      if (lang == "kotlin") {
        // node-text parity scanner (call_expression + navigation_
        // expression, child(0) raw text) — replaces the generic regex
        // for kotlin entirely; declarations are skipped structurally
        if (!AbstractContainerRe.matcher(sigText).find())
          kotlinChainCalls(code).foreach(calls += _)
      } else if (!AbstractContainerRe.matcher(sigText).find()) {
        val callStop = CallStop ++ LangCallStop.getOrElse(lang, Set.empty)
        val sigStartInCode = defLineStart - codeStart
        val sigEndInCode = defLineEnd - codeStart
        // lua keeps the full dotted/colon text as the unit name
        // ("obj:method") — the def-line suppression must also match the
        // regex-visible tail segment ("method"), or the declaration
        // line reads as a self-call (tree-sitter emits none there)
        val defTail =
          if (lang == "lua")
            name.substring(
              math.max(name.lastIndexOf(':'), name.lastIndexOf('.')) + 1)
          else name
        val cm = CallRe.matcher(code)
        while (cm.find()) {
          val onOwnDefLine = (cm.group(1) == name || cm.group(1) == defTail) &&
            cm.start >= sigStartInCode && cm.start < sigEndInCode
          // php `->method(` and `new X(` aren't call_expressions in the
          // reference's php grammar; ts `new X(` is a new_expression
          val pre2 = code.substring(math.max(0, cm.start - 2), cm.start)
          val pre4 = code.substring(math.max(0, cm.start - 4), cm.start)
          val grammarSkip =
            (lang == "php" && (pre2 == "->" || pre4 == "new ")) ||
              (lang == "typescript" && pre4 == "new ")
          // C/C++ method PROTOTYPES inside a class body read as `name(`
          // but declare, not call (`double distance(...) const;`)
          val protoSkip = (lang == "c" || lang == "cpp") &&
            kind == "class" && {
              val ls = code.lastIndexOf('\n', cm.start) + 1
              val le0 = code.indexOf('\n', cm.start)
              val line = code.substring(ls, if (le0 < 0) code.length else le0)
              // a member declaration/definition HEADER is
              // type-then-name(params) ending in `;` or `{` — never a
              // statement (possessive \s*+ so the keyword lookahead
              // can't be backtracked away)
              !line.contains('=') &&
                line.matches("""\s*+(?!(?:return|if|while|for|switch|throw|delete)\b)[\w:~<>,*&\s]+\([^)]*\)\s*(?:const\s*|override\s*|final\s*|noexcept\s*)*[;{]\s*""")
            }
          if (!onOwnDefLine && !grammarSkip && !protoSkip &&
              !callStop(cm.group(1)))
            calls += cm.group(1)
        }
        if (lang == "rust") {
          // no CallStop here: `assert!`/`match!`-style names ARE calls
          // when the bang is present (macro_invocation nodes)
          val mm = RustMacroRe.matcher(code)
          while (mm.find()) calls += mm.group(1)
        }
        if (lang == "ruby") {
          // parenless command calls tree-sitter scores (identifier
          // call nodes); conservative allowlist to avoid regex noise
          val rm = RubyCommandRe.matcher(code)
          while (rm.find()) calls += rm.group(1)
        }
        if (lang == "ocaml") {
          // dotted module application is parenless (`Printf.printf x`):
          // the method segment is the call
          val om = java.util.regex.Pattern
            .compile("""[A-Z]\w*\.([a-z_]\w*)""").matcher(code)
          while (om.find()) calls += om.group(1)
        }
        if (lang == "scala") {
          // brace-block application (`items.foreach { ... }`) is a call
          // with a function-literal argument — no parens involved
          val bm = java.util.regex.Pattern
            .compile("""\.([a-z_]\w*)\s*\{""").matcher(code)
          while (bm.find()) if (!callStop(bm.group(1))) calls += bm.group(1)
        }
      }
      val (params1, ret1) =
        if (kind == "function" || kind == "method")
          paramsAndReturn(source.substring(endOff, unitEndOff), lang)
        else (Seq.empty[String], "")
      // C-style and JS-method defs consume the whole header (CFuncRe /
      // JsMethodRe match past the parameter list), leaving nothing for
      // the suffix scan — fall back to the definition line after the
      // name ("const add = function(a, b) {" works too: the first
      // paren before the newline is the parameter list)
      val (params2, ret0) =
        if (params1.isEmpty && (kind == "function" || kind == "method")) {
          val defLine = source.substring(defLineStart,
            math.max(defLineStart, defLineEnd))
          val at = defLine.indexOf(name)
          if (at >= 0) {
            val (p, r) = paramsAndReturn(defLine.substring(at + name.length), lang)
            (p, if (ret1.nonEmpty) ret1 else r)
          } else (params1, ret1)
        } else (params1, ret1)
      // ocaml: parenless curried params (`let greet name =`, typed
      // `let add (a : int) (b : int) : int =` → a, b)
      val params =
        if (params2.isEmpty && lang == "ocaml" &&
            (kind == "function" || kind == "method")) {
          val defLine = source.substring(defLineStart,
            math.max(defLineStart, defLineEnd))
          val at = defLine.indexOf(name)
          if (at >= 0) {
            val rest = defLine.substring(at + name.length).takeWhile(_ != '=')
              .replaceAll("""\(\s*([a-z_]\w*)\s*:[^)]*\)""", " $1 ")
              .replaceAll(""":\s*[A-Za-z_][\w.]*""", " ")
            val pm = java.util.regex.Pattern
              .compile("""([a-z_]\w*)""").matcher(rest)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (pm.find())
              if (!Set("rec", "function", "fun")(pm.group(1))) buf += pm.group(1)
            buf.toSeq
          } else params2
        } else if (lang == "scala" && kind == "class") {
          // scala type parameters render as Parameters (the reference's
          // scala grammar shares the field): `Result[+T]` → T
          val defLine = source.substring(defLineStart,
            math.max(defLineStart, defLineEnd))
          val m = java.util.regex.Pattern
            .compile(java.util.regex.Pattern.quote(name) + """\[([^\]]+)\]""")
            .matcher(defLine)
          if (m.find())
            m.group(1).split(',').toSeq
              .map(_.trim.stripPrefix("+").stripPrefix("-")
                .takeWhile(c => c.isLetterOrDigit || c == '_'))
              .filter(_.nonEmpty)
          else params2
        } else params2
      // Java/C# declare the return type BEFORE the name — take it from
      // the CMethodRe capture when the suffix scan found none
      val ret = if (ret0.nonEmpty) ret0 else retHint
      val extendsClass =
        if (kind == "class") {
          // prefer an explicit `extends X` anywhere on the line over the
          // base-in-parens rule: `case class Failure(message: ...)
          // extends Result` must yield Result, not the first field name.
          // The parens rule is PYTHON's inheritance syntax — elsewhere
          // `class Person(val name: String)` parens hold constructor
          // params, never a base
          val em = ExtendsRe.matcher(lines(start))
          var byKeyword = ""
          var byParens = ""
          while (em.find() && byKeyword.isEmpty) {
            if (em.group(1) != null) byKeyword = em.group(1)
            else if (byParens.isEmpty && em.group(2) != null) byParens = em.group(2)
          }
          if (byKeyword.nonEmpty) byKeyword
          else if (lang == "python") byParens else ""
        } else ""
      val vars = scala.collection.mutable.LinkedHashSet.empty[String]
      if (lang == "swift") {
        // only let/var declarations count (reference: property/constant
        // declaration nodes; bare reassignments are not declarations);
        // protocol requirement vars are declarations of the CONFORMER,
        // not the protocol — none surface
        if (!AbstractContainerRe.matcher(sigText).find() ||
            sigText.contains("enum ") || sigText.contains("class ") ||
            sigText.contains("struct ")) {
          val sm = SwiftVarRe.matcher(code)
          while (sm.find()) if (sm.group(1) != name) vars += sm.group(1)
        }
      } else {
        val vm = VarRe.matcher(code)
        // a `const add = function(...)` binding is the unit itself, not
        // one of its locals
        while (vm.find()) if (vm.group(1) != name) vars += vm.group(1)
      }
      if (lang == "go") {
        val gm = GoShortVarRe.matcher(code)
        while (gm.find())
          if (gm.group(1) != name && gm.group(1) != "_") vars += gm.group(1)
      }
      // typed declarations: c/cpp locals (struct/class FIELDS are
      // field_declarations, not variables — skip class-kind units);
      // java/csharp count fields too (variable_declarator)
      if (((lang == "c" || lang == "cpp") && kind != "class") ||
          lang == "java" || lang == "csharp") {
        val cv = CVarRe.matcher(code)
        while (cv.find()) if (cv.group(1) != name) vars += cv.group(1)
      }
      // js/ts lexical_declaration parity: tree-sitter's declaration node
      // surfaces the KEYWORD itself as a variable alongside the binding
      if ((lang == "javascript" || lang == "typescript" ||
          lang == "vue" || lang == "svelte") && vars.nonEmpty) {
        val kw = java.util.regex.Pattern
          .compile("""^[ \t]*(const|let|var)\s""", java.util.regex.Pattern.MULTILINE)
          .matcher(code)
        while (kw.find()) vars += kw.group(1)
      }
      var complexity = 1
      val cxm = ComplexityRe.matcher(code)
      while (cxm.find()) complexity += 1
      CodeUnit(path, lang, kind, name, sigText,
        start + 1 + lineOffset, end + 1 + lineOffset,
        code, calls.toSeq.sorted.take(16),
        // haskell scans from the BINDING line (reference parity: the
        // `::` type signature between a haddock and the binding blocks
        // the docstring — analysis.rs:181-207 breaks on any nonempty
        // non-comment line)
        docstring = docstringOf(lines, start, code, lang),
        parameters = params.take(16),
        returnType = ret,
        parentClass = parent,
        // Lua method sugar keeps its ':' in the qualified form
        // (tree-sitter-lua names `function obj:method` "obj:method",
        // but dot-defined module functions stay "M.greet")
        qualifiedName =
          if (parent.nonEmpty && lang == "lua" &&
              lines(start).matches(""".*:\s*""" +
                java.util.regex.Pattern.quote(name) + """\s*\(.*"""))
            s"$parent:$name"
          else if (parent.nonEmpty) s"$parent.$name" else name,
        extendsClass = extendsClass,
        complexity = complexity,
        hasLoops = LoopRe.matcher(code).find(),
        hasBranches = BranchRe.matcher(code).find(),
        hasErrorHandling = ErrRe.matcher(code).find(),
        // sorted + deduped like the reference (analysis.rs:757-758)
        variables = vars.toSeq.sorted.take(16),
        imports = imports)
    }
    // layer 2 reverse edges, file-local: A ∈ calledBy(B) iff A calls B;
    // self-recursion stays a `calls` edge only (tree-sitter emits no
    // called_by line for a function that only calls itself)
    val names = units.map(_.name).toSet
    val reverse = units
      .flatMap(u => u.calls.filter(c => names.contains(c) && c != u.name)
        .map(c => c -> u.name))
      .groupBy(_._1)
      .map { case (callee, edges) => callee -> edges.map(_._2).distinct.take(16) }
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

  /** C2 structured embedding text — byte-for-byte the reference's
    * build_embedding_text (colgrep/src/embed.rs:115-208, aligned in
    * round 14; previously a same-fields different-labels rendering):
    * bare-name typed header, then Signature / Extends / Class /
    * Description / Parameters / Returns, the call-graph lines, the
    * data-flow `Variables:` line, `Uses:` (imports), the normalized
    * `File:` line, and `Code:` with the raw span — each field skipped
    * when empty, parts joined with single newlines, truncated at 8 KiB
    * with the reference's marker. raw_code/constant units are
    * code-only (embed.rs:116-119). The Flow layer (complexity/loops/
    * branches) stays on the CodeUnit row; the reference does not
    * render it into the embedding text. */
  val EmbedTextCap = 8192
  private val TruncationMarker = "\n[...truncated...]\n"

  /** Unicode White_Space property — Rust's `char::is_whitespace`, which
    * `trim_end()` uses. NOT Java's `Character.isWhitespace` (that one
    * excludes NBSP/NNBSP and NEL) and NOT regex `\s` (ASCII-only). */
  private def isUnicodeWhitespace(cp: Int): Boolean = cp match {
    case 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x20 | 0x85 | 0xA0 |
         0x1680 | 0x2028 | 0x2029 | 0x202F | 0x205F | 0x3000 => true
    case c => c >= 0x2000 && c <= 0x200A
  }

  /** embed.rs:99-111 `truncate_text`: lengths count Unicode SCALAR
    * chars (code points — a non-BMP char is one, not two UTF-16 units,
    * and a cut can never split a surrogate pair) and the trailing trim
    * is Rust `trim_end` = Unicode White_Space (see above). */
  private def truncateText(s: String, cap: Int = EmbedTextCap): String = {
    val n = s.codePointCount(0, s.length)
    if (n <= cap) return s
    if (cap <= TruncationMarker.length) return TruncationMarker.take(cap)
    var e = s.offsetByCodePoints(0, cap - TruncationMarker.length)
    var trimming = true
    while (trimming && e > 0) {
      val cp = s.codePointBefore(e)
      if (isUnicodeWhitespace(cp)) e -= Character.charCount(cp)
      else trimming = false
    }
    s.substring(0, e) + TruncationMarker
  }

  /** `File:` line body (embed.rs:14-82): keep the last ≤4 path
    * components, replace separators/underscores/hyphens/dots with
    * spaces, split CamelCase (space before an uppercase whose previous
    * char is lowercase), collapse whitespace, lowercase, then append
    * the ORIGINAL filename (extension intact) for exact-match recall. */
  private[graft] def normalizePathForEmbedding(path: String): String = {
    val comps = path.split("[/\\\\]").filter(_.nonEmpty)
    val short = comps.takeRight(4).mkString("/")
    val originalFilename = if (comps.nonEmpty) comps.last else path
    val dot = short.lastIndexOf('.')
    val withoutExt = if (dot >= 0) short.substring(0, dot) else short
    val sb = new StringBuilder
    var i = 0
    while (i < withoutExt.length) {
      val c = withoutExt.charAt(i)
      if (c == '/' || c == '\\' || c == '_' || c == '-' || c == '.') {
        if (sb.nonEmpty && sb.last != ' ') sb += ' '
      } else if (c.isUpper) {
        if (i > 0 && withoutExt.charAt(i - 1).isLower) sb += ' '
        sb += c
      } else sb += c
      i += 1
    }
    val normalized = sb.toString.split("\\s+").filter(_.nonEmpty)
      .mkString(" ").toLowerCase
    s"$normalized $originalFilename"
  }

  def embedText(u: CodeUnit): String = {
    if (u.kind == "raw_code" || u.kind == "constant")
      return truncateText(u.code)
    val typeStr = u.kind match {
      case "function" => "Function"
      case "method"   => "Method"
      case "class"    => "Class"
      case "document" => "Document"
      case "section"  => "Section"
      case k          => k.capitalize
    }
    val parts = scala.collection.mutable.ArrayBuffer[String](
      s"$typeStr: ${u.name}")
    if (u.signature.nonEmpty) parts += s"Signature: ${u.signature}"
    if (u.extendsClass.nonEmpty) parts += s"Extends: ${u.extendsClass}"
    if (u.parentClass.nonEmpty) parts += s"Class: ${u.parentClass}"
    if (u.docstring.nonEmpty) parts += s"Description: ${u.docstring}"
    if (u.parameters.nonEmpty) parts += s"Parameters: ${u.parameters.mkString(", ")}"
    // typescript return types render as the raw type_annotation text,
    // leading colon included ("Returns: : number"); php return types
    // never render (the reference's php layer doesn't extract them) —
    // tree-sitter parity, the FIELD stays populated either way
    if (u.returnType.nonEmpty && u.language != "php" &&
        u.language != "scala" && u.language != "kotlin" &&
        u.language != "swift") parts += (
      if (u.language == "typescript") s"Returns: : ${u.returnType}"
      else s"Returns: ${u.returnType}")
    if (u.calls.nonEmpty) parts += s"Calls: ${u.calls.mkString(", ")}"
    if (u.calledBy.nonEmpty) parts += s"Called by: ${u.calledBy.mkString(", ")}"
    if (u.variables.nonEmpty) parts += s"Variables: ${u.variables.mkString(", ")}"
    // rust `use` paths, C/C++ `#include`s, swift and haskell imports
    // never render as Uses in the reference (those import layers don't
    // feed the embed text) — the imports FIELD stays populated either way
    if (u.imports.nonEmpty && u.language != "rust" &&
        u.language != "c" && u.language != "cpp" &&
        u.language != "swift" && u.language != "haskell")
      parts += s"Uses: ${u.imports.mkString(", ")}"
    parts += s"File: ${normalizePathForEmbedding(u.file)}"
    // the reference's code span is the node text — no trailing newline
    val codeBody = u.code.replaceAll("\\s+$", "")
    if (codeBody.nonEmpty) parts += s"Code:\n$codeBody"
    truncateText(parts.mkString("\n"))
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
