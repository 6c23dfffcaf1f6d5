package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right row
  * with the greatest `tsCol` ≤ the left row's (backward direction; ≥ and
  * smallest for forward), per join key — the time-series join Spark has
  * no built-in operator for (pandas `merge_asof`, QuestDB/kdb `asof`,
  * DuckDB `ASOF JOIN`).
  *
  * Spark-first shape — NOT a range self-join: both sides are tagged and
  * UNIONED, shuffled ONCE by the join key, and each key's timeline is
  * sorted so a running `last(payload, ignoreNulls)` window carries the
  * most recent right-side payload forward onto every left row (`first`
  * over the following frame for the forward direction). Cost is one
  * shuffle + one per-key sort — identical to any windowed aggregation —
  * versus the O(|L|·|R|) per-key blow-up of the naive
  * `l JOIN r ON key AND r.ts <= l.ts` + argmax shape, which Catalyst
  * can only plan as a range join. At 100 TB the shuffle is keyed on the
  * join key; a pathologically hot key serializes its own sort (the
  * standard windowed-op skew caveat — pre-split hot keys by coarse time
  * bucket and stitch bucket boundaries if that ever bites).
  *
  * Ties: a right row at exactly the left row's timestamp matches in
  * BOTH directions (inclusive, like DuckDB ASOF `>=`). Right rows must
  * be unique per (key, ts) for deterministic output — two states
  * recorded at the same instant have no defined winner (same contract
  * as DuckDB ASOF JOIN).
  *
  * `tolerance`: optional maximum |left.ts − right.ts| in the ordering
  * column's native unit (seconds when it is a timestamp — both sides
  * are cast to double epoch seconds for the distance test); matches
  * farther away than that yield NULLs (pandas
  * `merge_asof(tolerance=...)` semantics).
  *
  * Output: every left row + `asof_<payload>` columns (NULL when no
  * right row qualifies) + `asof_ts` (the matched right timestamp).
  */
object AsOfJoin {

  /** @param left       probe side (every row preserved)
    * @param right      reference side supplying payloads
    * @param keys       equi-join key columns (present on both sides)
    * @param tsCol      timestamp/ordering column name (both sides; any
    *                   orderable type — timestamp, long, …)
    * @param payloads   right-side columns to carry onto left rows
    * @param forward    false = backward (latest right ≤ left, default),
    *                    true = forward (earliest right ≥ left)
    * @param tolerance  optional max distance as a Column-compatible
    *                    expression over `abs(left.ts − right.ts)` in
    *                    native units (e.g. `lit(3600)` with unix-second
    *                    longs); None = unbounded */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payloads: Seq[String],
      forward: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one join key")
    require(payloads.nonEmpty, "asOf needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("asof_") || c == "_side"),
      "left side must not already contain asof_*/_side columns")
    // side tag orders right rows before (backward) / after (forward)
    // left rows at equal ts, making the at-or-before match inclusive
    val lTagged = left
      .withColumn("_side", lit(1))
      .select((keys :+ tsCol).map(col) ++
        Seq(col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => col(c).as(s"_l_$c")) ++
        payloads.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++
        Seq(lit(null).cast(right.schema(tsCol).dataType).as("_r_ts")): _*)
    val rTagged = right
      .withColumn("_side", lit(if (forward) 2 else 0))
      .select((keys :+ tsCol).map(col) ++
        Seq(col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        payloads.map(c => col(c).as(s"_r_$c")) ++
        Seq(col(tsCol).as("_r_ts")): _*)
    val ordered =
      if (forward) Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).asc, col("_side").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).asc, col("_side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(c: Column): Column =
      if (forward) first(c, ignoreNulls = true).over(ordered)
      else last(c, ignoreNulls = true).over(ordered)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("asof_ts", carry(col("_r_ts")))
      .select(Seq(col("*")) ++
        payloads.map(c => carry(col(s"_r_$c")).as(s"asof_$c")): _*)
      .filter(col("_side") === 1)
    val withinTol = tolerance match {
      case None => carried
      case Some(tol) =>
        // out-of-tolerance match → all asof_ columns null (row kept)
        val ok = col("asof_ts").isNotNull &&
          abs(col(tsCol).cast("double") - col("asof_ts").cast("double")) <= tol
        payloads.foldLeft(
          carried.withColumn("asof_ts", when(ok, col("asof_ts")))) {
          case (df, c) => df.withColumn(s"asof_$c", when(ok, col(s"asof_$c")))
        }
    }
    withinTol.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => col(s"_l_$c").as(c)) ++
        Seq(col("asof_ts")) ++ payloads.map(c => col(s"asof_$c")): _*)
  }
}
