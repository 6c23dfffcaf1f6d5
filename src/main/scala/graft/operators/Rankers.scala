package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranking / top-k operators shared by the search funnel (S2/S6/S8), the
  * colgrep ranking layer (C6), and the fusion pipeline.
  *
  * All per-group top-k cuts are window `row_number()` with a deterministic
  * tie-break — Catalyst plans these as partial top-k per partition (window
  * group limit pushdown in Spark 4), so no global sort materializes.
  */
object Rankers {

  /** Per-group top-k with deterministic tie-break columns. Emits `rankCol`
    * (1-based). Mirrors the reference's partial-sort selection
    * (search.rs:405-409, select_nth_unstable semantics). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** The reference's two-stage score funnel (S6, search.rs:460-469): cut to
    * `nFull` candidates by approximate score, then rerank the survivors by
    * exact score and keep `topK`. */
  def funnel(
      df: DataFrame,
      groupCols: Seq[Column],
      approxOrder: Seq[Column],
      exactOrder: Seq[Column],
      nFull: Int,
      topK: Int
  ): DataFrame = {
    val stage1 = topKPerGroup(df, groupCols, approxOrder, nFull, "_approx_rank")
    topKPerGroup(stage1.drop("_approx_rank"), groupCols, exactOrder, topK)
  }

  /** Global top-k with a 1-based `rank` column. `orderBy().limit(k)` plans
    * as TakeOrderedAndProject (bounded per-partition priority queues — no
    * single-partition sort of the full input); the rank window then runs
    * over ≤ k rows only. Replaces round 1's unpartitioned-window
    * anti-pattern (`WindowExec: No Partition Defined` over the corpus). */
  def topKGlobal(
      df: DataFrame,
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank"
  ): DataFrame = {
    // rank via monotonically_increasing_id over the already-sorted ≤k
    // rows coalesced to one partition (ids are then consecutive from 0
    // in row order, which after the global sort IS the rank) — stays in
    // the DataFrame plan, no RDD round-trip/codegen break, and no
    // unpartitioned window.
    df.orderBy(orderCols: _*).limit(k)
      .coalesce(1)
      .withColumn(rankCol, (monotonically_increasing_id() + 1).cast("int"))
  }

  /** C6 path-noise penalty (colgrep/src/ranking.rs:32-39): multiplicative
    * score penalty by path class — tests 0.30, compat 0.50, examples 0.70. */
  def pathPenalty(pathCol: Column): Column =
    when(pathCol.rlike("(^|/)(tests?|__tests__|testing)(/|_|\\.|$)|_test\\.|\\.test\\."), lit(0.30))
      .when(pathCol.rlike("(^|/)(compat|legacy|deprecated)(/|_|\\.|$)"), lit(0.50))
      .when(pathCol.rlike("(^|/)(examples?|samples?|demos?)(/|_|\\.|$)"), lit(0.70))
      .otherwise(lit(1.0))

  /** C6: the path penalty is skipped when the query itself is about
    * tests (colgrep/src/ranking.rs:161). */
  def shouldApplyPathPenalty(query: String): Boolean =
    !query.toLowerCase.split("[^a-z0-9]+")
      .exists(Set("test", "tests", "testing", "spec", "specs"))

  /** C6 definition-name boost (ranking.rs:191-243): a result whose unit
    * name matches a query term gets a multiplicative boost. */
  def definitionNameBoost(queryTerms: Seq[String], nameCol: Column,
      factor: Double = 1.5): Column = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    if (terms.isEmpty) lit(1.0)
    else when(lower(nameCol).isin(terms: _*), lit(factor)).otherwise(lit(1.0))
  }

  /** C6 path-stem boost (ranking.rs:280-384): file stem matching a query
    * term boosts the result. */
  def pathStemBoost(queryTerms: Seq[String], pathCol: Column,
      factor: Double = 1.25): Column = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    if (terms.isEmpty) lit(1.0)
    else when(
      lower(regexp_extract(pathCol, "([^/]+?)(\\.[^./]+)?$", 1)).isin(terms: _*),
      lit(factor)).otherwise(lit(1.0))
  }

  /** C6 file-coherence boost (ranking.rs:396+): results from a file with
    * multiple hits get a small multiplicative lift (+5% per extra hit,
    * capped at +25%). Window partitioned by file — no global shuffle. */
  def withFileCoherenceBoost(df: DataFrame, fileCol: Column,
      scoreCol: Column): Column = {
    val n = count(lit(1)).over(Window.partitionBy(fileCol))
    scoreCol * least(lit(1.0) + (n - 1).cast("double") * 0.05, lit(1.25))
  }

  /** C4 path scoping (colgrep/src/index/mod.rs:3751-3860): prefix,
    * include globs, excluded directories. */
  def pathScope(
      df: DataFrame,
      pathCol: Column,
      prefix: Option[String] = None,
      includeGlobs: Seq[String] = Nil,
      excludeDirs: Seq[String] = Nil): DataFrame = {
    var out = df
    prefix.foreach(p => out = out.filter(pathCol.startsWith(p)))
    if (includeGlobs.nonEmpty) {
      val rx = includeGlobs.map(globToRegex).mkString("|")
      out = out.filter(pathCol.rlike(s"^($rx)$$"))
    }
    excludeDirs.foreach { d =>
      out = out.filter(!pathCol.rlike(s"(^|/)${java.util.regex.Pattern.quote(d)}(/|$$)"))
    }
    out
  }

  /** Glob → anchored Java regex: `**` any path, `*` within a segment,
    * `?` one char; everything else quoted. */
  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        // one NON-separator char (glob semantics; `.` would match '/' —
        // latent bug caught by the KernelProperties fuzz when the
        // generator finally drew a bare "?", r20 continuation)
        case '?' => sb.append("[^/]")
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append("\\").append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** C3 regex pre-filter (`colgrep -e`): braces that do not form a valid
    * quantifier are literalized (index/mod.rs:3281), then the pattern
    * restricts the doc subset via rlike — feeding S4's subset pushdown. */
  def regexPrefilter(df: DataFrame, textCol: Column, pattern: String): DataFrame = {
    val fixed = pattern.replaceAll("(?<!\\\\)\\{(?![0-9]+(,[0-9]*)?\\})", "\\\\{")
    df.filter(textCol.rlike(fixed))
  }
}
