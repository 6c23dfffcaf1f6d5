package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical-test operators over categorical rollups. */
object Stats {

  /** Pearson chi-square test of independence between two categorical
    * columns ("is language independent of source?") — the classic
    * contingency-table statistic `Σ (o − e)² / e` with
    * `e = rowTotal·colTotal / n`, over the FULL |A|×|B| spine
    * (unobserved cells contribute `e`, as the statistic requires).
    *
    * Scale shape: ONE corpus aggregation (the (a,b) cell rollup,
    * map-side combined); the cell table is bounded by the categorical
    * cardinality product, so it is collected to a literal DataFrame
    * (the bounded literal-collect recipe — re-aggregating the plan
    * in 4 consumers would re-scan the corpus each time) and every
    * marginal/spine/contribution step runs over literals. Per-cell
    * contributions are quantized to integer micro-units before the
    * sum, so the SQL oracle replays the statistic bit-for-bit.
    *
    * NULL categories are excluded (a NULL key never equi-joins its
    * own marginal). Output: one row
    * `(n_rows, n_cells, dof, chi2_micro)`, all integers. */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bounded by |A|×|B| observed cells — categorical columns by
    // contract (this is the documented driver-known bound)
    val raw = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).cast("string").as("_a"), col(b).cast("string").as("_b"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(raw.nonEmpty, "no non-null (a, b) observations")
    val n = raw.map(_._3).sum
    val nA = raw.map(_._1).distinct.length
    val nB = raw.map(_._2).distinct.length
    val cells = raw.toSeq.toDF("_a", "_b", "o")
    val rts = cells.groupBy("_a").agg(sum("o").as("rt"))
    val cts = cells.groupBy("_b").agg(sum("o").as("ct"))
    val contrib = expr(
      "CAST(round((o - CAST(rt AS DOUBLE) * ct / n) * " +
        "(o - CAST(rt AS DOUBLE) * ct / n) / " +
        "(CAST(rt AS DOUBLE) * ct / n) * 1000000) AS BIGINT)")
    rts.crossJoin(cts)
      .join(cells, Seq("_a", "_b"), "left")
      .select(col("rt"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"), lit(n).as("n"))
      .agg(count(lit(1)).as("n_cells"), sum(contrib).as("chi2_micro"))
      .select(lit(n).as("n_rows"), col("n_cells"),
        lit(((nA - 1) * (nB - 1)).toLong).as("dof"), col("chi2_micro"))
  }
}
