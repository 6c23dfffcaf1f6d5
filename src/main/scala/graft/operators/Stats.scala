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
    * `(n_rows, n_cells, dof, chi2_micro)`, all integers.
    *
    * `maxCells` bounds BOTH the observed-cell collect and the full
    * |A|×|B| spine: a high-cardinality pair (ids, timestamps, free
    * text) fails loudly with the offending cardinalities instead of
    * OOMing the driver — chi-square over such a pair is statistically
    * meaningless anyway (dof ≈ n). */
  def chiSquare(df: DataFrame, a: String, b: String,
      maxCells: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bounded by |A|×|B| observed cells — categorical columns by
    // contract, ENFORCED by the limit+length guard before anything
    // is materialized on the driver
    val raw = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).cast("string").as("_a"), col(b).cast("string").as("_b"))
      .agg(count(lit(1)).as("o"))
      .limit(maxCells + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(raw.nonEmpty, "no non-null (a, b) observations")
    require(raw.length <= maxCells,
      s"chiSquare($a, $b): more than $maxCells observed category pairs — " +
        "these columns are not categorical; quantize or bucket them first")
    val n = raw.map(_._3).sum
    val nA = raw.map(_._1).distinct.length
    val nB = raw.map(_._2).distinct.length
    require(nA.toLong * nB <= maxCells,
      s"chiSquare($a, $b): contingency spine |A|x|B| = $nA x $nB exceeds " +
        s"$maxCells cells — quantize or bucket the columns first")
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

  /** Per-group Pearson correlation between two INTEGER columns
    * (quantize floats to cents/micro first — the integer-sums recipe):
    * all five sums aggregate exactly in int64 (map-side combined, one
    * shuffle on the group key), and the final
    * `r = (n·Σxy − Σx·Σy) / √((n·Σxx − Σx²)(n·Σyy − Σy²))`
    * combines them in DOUBLE — scalar IEEE with a fixed operation
    * order, so the SQL oracle replays `corr_bp` bit-for-bit. The
    * double combine also dodges the int64 overflow of `n·Σxx` at
    * billion-row groups, where an engine-private HUGEINT would
    * silently diverge from JVM arithmetic.
    *
    * Output: `(groupCols…, n, corr_bp)` with corr in basis points;
    * NULL when a column is constant (zero variance). */
  def pearsonCorr(
      df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val sums = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
      sum(col(xCol) * col(xCol)).as("sxx"),
      sum(col(yCol) * col(yCol)).as("syy"),
      sum(col(xCol) * col(yCol)).as("sxy"))
    sums.select(groupCols.map(col) ++ Seq(col("n"), expr(
      """CAST(round(
        |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |  nullif(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |       (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0.0)
        |  * 10000) AS BIGINT)""".stripMargin).as("corr_bp")): _*)
  }

  /** Welch's unequal-variance t-test between two slices of `groupCol`
    * — the A/B experimentation primitive ("did the treatment move the
    * metric?"). `valueCol` must be INTEGER (cents/micro). Sums
    * aggregate exactly; the t statistic and the Welch–Satterthwaite
    * degrees of freedom combine in fixed-order DOUBLE, quantized to
    * integer micro-units for the oracle. One aggregation pass over
    * both slices together. Output: one row
    * `(n_a, n_b, mean_a_micro, mean_b_micro, t_micro, dof_micro)`. */
  def welchTTest(
      df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val sums = df.filter(col(groupCol).isin(a, b)).agg(
      sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("na"),
      sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("nb"),
      sum(when(col(groupCol) === a, col(valueCol)).otherwise(0L)).as("sa"),
      sum(when(col(groupCol) === b, col(valueCol)).otherwise(0L)).as("sb"),
      sum(when(col(groupCol) === a, col(valueCol) * col(valueCol))
        .otherwise(0L)).as("qa"),
      sum(when(col(groupCol) === b, col(valueCol) * col(valueCol))
        .otherwise(0L)).as("qb"))
    // va/na and vb/nb (the two standard-error components) as named
    // intermediates: squaring is explicit multiplication, never pow()
    // (pow is ~1-ulp in BOTH engines but not identically so)
    sums
      .withColumn("_ea", expr(
        "(CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na"))
      .withColumn("_eb", expr(
        "(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb"))
      .selectExpr(
        "na AS n_a", "nb AS n_b",
        "CAST(round(CAST(sa AS DOUBLE) / na * 1000000) AS BIGINT) AS mean_a_micro",
        "CAST(round(CAST(sb AS DOUBLE) / nb * 1000000) AS BIGINT) AS mean_b_micro",
        """CAST(round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
          |  sqrt(_ea + _eb) * 1000000) AS BIGINT) AS t_micro""".stripMargin,
        """CAST(round((_ea + _eb) * (_ea + _eb) /
          |  (_ea * _ea / (na - 1) + _eb * _eb / (nb - 1))
          |  * 1000000) AS BIGINT) AS dof_micro""".stripMargin)
  }

  /** Pairwise Pearson correlation matrix over k INTEGER columns in ONE
    * corpus aggregation — the EDA "which measures move together" pass
    * (k + k·(k+1)/2 exact int64 sums, map-side combined; a per-pair
    * [[pearsonCorr]] loop would scan the corpus k²/2 times). The
    * bounded 1-row rollup is collected and each pair's statistic is
    * computed over LITERALS with the exact fixed-order f64 expression
    * [[pearsonCorr]] uses (the bounded-literal bit-parity recipe).
    * Callers pre-quantize: products must fit int64
    * (`Σ max(|x|)·max(|y|) · rows < 2^63`). Output one row per
    * unordered pair: `(col_a, col_b, n, corr_bp)`. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"corrMatrix takes 2..16 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "duplicate columns")
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (i, j)
    val aggs = (count(lit(1)).cast("long").as("n") +:
      cols.zipWithIndex.map { case (c, i) => sum(col(c)).as(s"s_$i") }) ++
      pairs.map { case (i, j) =>
        sum(col(cols(i)) * col(cols(j))).as(s"q_${i}_$j") }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("n")
    // fail loudly, not with an unboxing NPE on the null sums
    require(n > 0, "corrMatrix over an empty relation (0 rows)")
    def s(i: Int) = r.getAs[Long](s"s_$i")
    def q(i: Int, j: Int) =
      if (i <= j) r.getAs[Long](s"q_${i}_$j") else r.getAs[Long](s"q_${j}_$i")
    val spark = df.sparkSession
    import spark.implicits._
    pairs.filter { case (i, j) => i < j }
      .map { case (i, j) =>
        (cols(i), cols(j), n, s(i), s(j), q(i, i), q(j, j), q(i, j)) }
      .toDF("col_a", "col_b", "n", "sx", "sy", "sxx", "syy", "sxy")
      .select(col("col_a"), col("col_b"), col("n"), expr(
        """CAST(round(
          |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
          |  nullif(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
          |       (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0.0)
          |  * 10000) AS BIGINT)""".stripMargin).as("corr_bp"))
  }

  /** Per-group ordinary-least-squares trend line — the "is this metric
    * drifting?" primitive (daily revenue slope per segment, token-count
    * trend per source). `xCol`/`yCol` must be INTEGER (day index,
    * cents): the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * aggregate exactly in int64, then slope/intercept combine in
    * fixed-order DOUBLE and quantize to integer micro-units — the
    * [[welchTTest]] determinism recipe. Degenerate groups (n < 2 or
    * zero x-variance) yield NULL slope/intercept rather than a
    * division blow-up.
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus
    * (5 longs per group), then per-group scalar math — no second pass,
    * no window, no collect. Output: group cols +
    * `(n, slope_micro, intercept_micro)`. */
  def groupedTrend(
      df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val sums = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
      sum(col(xCol) * col(yCol)).as("sxy"),
      sum(col(xCol) * col(xCol)).as("sxx"))
    sums
      .withColumn("_den",
        expr("CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        expr(
          """CAST(round(
            |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
            |  nullif(_den, 0.0) * 1000000) AS BIGINT)""".stripMargin)
          .as("slope_micro"),
        expr(
          """CAST(round(
            |  (CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) /
            |  nullif(_den, 0.0) * 1000000) AS BIGINT)""".stripMargin)
          .as("intercept_micro")): _*)
  }
}
