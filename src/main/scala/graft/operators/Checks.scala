package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule evaluation — the dbt-test/Deequ-style
  * constraint gate (both public designs): a rule set is DATA, the
  * evaluation is ONE aggregation pass, the result is a small
  * per-rule violation table a pipeline can alert or branch on.
  *
  * Scale shape: every row-level rule compiles to a
  * `sum(CASE WHEN violated THEN 1 END)` aggregate over the SAME single
  * scan — adding rules adds projection columns, never passes; the
  * one shuffle is the global aggregation's 1-row exchange. `Unique`
  * rules need distinct counts, which Spark evaluates in the same
  * aggregation via expand (one wide shuffle for all unique rules
  * together, keyed on the grouping expansion — the [[Profile]]
  * multi-distinct note applies: at extreme column counts split unique
  * rules into batches).
  *
  * Output: `(rule_name, column, n_rows, n_violations, passed)` — one
  * row per rule, integers + bool only (oracle-replayable).
  */
object Checks {

  sealed trait Rule {
    def name: String
    def column: String
  }
  /** Violation: the column IS NULL. */
  case class NotNull(column: String) extends Rule {
    val name = s"not_null_$column"
  }
  /** Violation count: n_rows − n_distinct (0 ⇔ the column is a key).
    * NULLs count as one shared value (SQL DISTINCT semantics). */
  case class Unique(column: String) extends Rule {
    val name = s"unique_$column"
  }
  /** Violation: value outside `[lo, hi]` (NULL is NOT a violation —
    * compose with [[NotNull]] to require presence). */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range_$column"
  }
  /** Violation: non-NULL value not in the accepted set. */
  case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    val name = s"accepted_values_$column"
  }
  /** Violation: non-NULL value has no match of `pattern` (search
    * semantics, like SQL REGEXP — anchor with ^…$ for a full match). */
  case class MatchesRegex(column: String, pattern: String) extends Rule {
    val name = s"matches_regex_$column"
  }
  /** Violation: the SQL predicate is false or NULL for the row.
    * `column` is documentation only (which field the rule guards). */
  case class Predicate(name: String, column: String, sqlExpr: String) extends Rule

  private def violation(r: Rule): Column = r match {
    case NotNull(c)           => col(c).isNull
    case InRange(c, lo, hi)   => col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case AcceptedValues(c, v) => col(c).isNotNull && !col(c).isin(v: _*)
    case MatchesRegex(c, p)   => col(c).isNotNull && !col(c).rlike(p)
    case Predicate(_, _, e)   => !coalesce(expr(e), lit(false))
    case u: Unique => throw new IllegalStateException(s"not row-level: $u")
  }

  /** Evaluate every rule in one aggregation pass over `df`. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    evaluateBy(df, Nil, rules)

  /** Grouped [[evaluate]] — per-slice data quality ("each ingestion
    * day must pass independently"): the same one-pass compilation,
    * aggregated per `groupCols`; the unpivot is a projection, so the
    * cost is still the single grouped aggregation. Output prepends
    * the group columns. */
  def evaluateBy(
      df: DataFrame, groupCols: Seq[String], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names (two rules of the same kind on one column?)")
    val aggs = count(lit(1)).as("_n") +: rules.map {
      case u: Unique =>
        (count(lit(1)) - countDistinct(col(u.column)) -
          // countDistinct ignores NULLs; treat all NULLs as ONE shared
          // distinct value, so subtract one more distinct when present
          when(sum(when(col(u.column).isNull, 1L).otherwise(0L)) > 0, 1L)
            .otherwise(0L)).as(u.name)
      case r => sum(when(violation(r), 1L).otherwise(0L)).as(r.name)
    }
    val wide =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // unpivot the wide per-group result to (group…, rule_name, n_violations)
    val long = wide.unpivot((groupCols :+ "_n").map(col).toArray,
      rules.map(r => col(r.name)).toArray, "rule_name", "n_violations")
    val spark = df.sparkSession
    import spark.implicits._
    val meta = rules.map(r => (r.name, r.column)).toDF("rule_name", "column")
    long
      .join(broadcast(meta), "rule_name")
      .select(groupCols.map(col) ++ Seq(
        col("rule_name"), col("column"), col("_n").as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("passed")): _*)
  }

  /** Order-invariant grouped table fingerprint — the cross-engine /
    * cross-snapshot reconciliation primitive ("do these two copies
    * hold the same rows?") that never sorts or co-locates the corpus:
    * per row, hash the NULL-explicit `#`-joined `cols` to 60 bits
    * (the md5 recipe an independent engine replays byte-identically),
    * then XOR-fold per group. XOR is a commutative, associative,
    * overflow-free monoid, so partition-local folds merge losslessly
    * in any order — one map-side-combined aggregation at any scale.
    *
    * Caveat (by construction): XOR is blind to rows repeated an EVEN
    * number of times; `n_rows` travels alongside so a doubled row
    * still shifts the count. Output:
    * `(groupCols…, n_rows, fingerprint)`. */
  def fingerprint(
      df: DataFrame, groupCols: Seq[String], cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one value column")
    val rowHash = expr(
      s"""CAST(conv(substr(md5(concat_ws('#', ${cols.map(c =>
        s"coalesce(CAST(`$c` AS STRING), '<null>')").mkString(", ")})),
         | 1, 15), 16, 10) AS BIGINT)""".stripMargin.replaceAll("\n", ""))
    val base = df.withColumn("_rh", rowHash)
    val aggs = Seq(count(lit(1)).as("n_rows"),
      expr("bit_xor(_rh)").as("fingerprint"))
    if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
