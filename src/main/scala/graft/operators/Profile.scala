package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling (the ANALYZE/data-quality primitive):
  * per column — row count, null count, exact distinct count — emitted
  * as one long-format row per column.
  *
  * One `agg` computes every statistic in a single scan. Spark plans the
  * multi-column DISTINCT aggregation with an Expand (one duplicated
  * stream per distinct aggregate), so cost grows with the column count:
  * fine for the tens-of-columns tables this profiles; for very wide
  * tables at 100 TB, split the column list across parallel profile
  * calls (each its own job) or swap `countDistinct` for
  * `approx_count_distinct` — the operator takes the exact path because
  * the correctness gate replays it bit-for-bit in the oracle.
  */
object Profile {

  /** `(col_name, n_rows, n_nulls, n_distinct)` for every column of
    * `df` (or `cols` when given), in one scan. `countDistinct` skips
    * nulls, matching SQL `count(DISTINCT c)`. */
  def tableProfile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("_n_rows")) ++ names.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = names.map { c =>
      struct(lit(c).as("col_name"), col("_n_rows").as("n_rows"),
        col(s"_nn_$c").as("n_nulls"), col(s"_nd_$c").as("n_distinct"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
