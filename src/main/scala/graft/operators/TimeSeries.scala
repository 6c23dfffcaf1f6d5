package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series rollups over an event stream with integer-nanos
  * timestamps — the downsampling / cohort shapes every telemetry or
  * product-analytics pipeline needs, built as single map-side-combined
  * aggregations (one shuffle each, no windows over the corpus).
  *
  * Determinism: buckets are integer division of epoch nanos (exact both
  * engines); OHLC open/close pick STORED values via min_by/max_by on
  * the timestamp (pure passthrough — no float arithmetic enters the
  * compared output), relying on unique timestamps per series for the
  * tie (the driver corpus is globally unique; callers with colliding
  * timestamps should pre-disambiguate the order column). */
object TimeSeries {

  /** OHLC downsample: per (`keyCols`, bucket) — open = value at the
    * earliest ts, close = at the latest, high/low = max/min, plus the
    * event count. `bucketNs` is the bucket width in tsCol's unit. */
  def ohlcDownsample(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    events
      .withColumn("bucket", expr(s"$tsCol div $bucketNs"))
      .groupBy((col("bucket") +: keyCols.map(col)): _*)
      .agg(
        min_by(col(valueCol), col(tsCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(tsCol)).as("close"),
        count(lit(1)).as("n_events"))
  }

  /** Percentile latency/size profile per key: p50/p90/p99 + count —
    * the observability rollup (SLO dashboards, token-length audits).
    * One exact-percentile aggregation, map-side partial; the quantile
    * interpolation formula is cross-engine deterministic (the b3_codec
    * twin hashes raw interpolated quantiles green), and
    * approx_percentile is the documented swap at extreme cardinality
    * with the same output contract. */
  def percentileProfile(
      events: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      approx: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "percentileProfile needs at least one key column")
    def q(p: Double): org.apache.spark.sql.Column =
      if (approx) approx_percentile(col(valueCol), lit(p), lit(10000))
      else percentile(col(valueCol), lit(p))
    events.groupBy(keyCols.map(col): _*)
      .agg(q(0.5).as("p50"), q(0.9).as("p90"), q(0.99).as("p99"),
        count(lit(1)).as("n"))
  }

  /** Per-key winsorization (percentile clipping): cap `valueCol` into
    * `[p(loQ), p(hiQ)]` of its own key group — the standard
    * outlier-taming transform before averaging/training (unlike the
    * Hampel FLAG below, this REPAIRS the value). Adds
    * `<valueCol>_w` (clipped) and keeps the original.
    *
    * Shape: one exact-percentile rollup (|groups| rows, map-side
    * partial) broadcast back into a scan-shaped projection — the corpus
    * never shuffles. Groups are assumed bounded (dashboard/feature
    * keys); at extreme group cardinality swap the broadcast for a plain
    * equi-join and `approx = true` (same contract as
    * [[percentileProfile]]). */
  def winsorize(
      events: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      loQ: Double = 0.01,
      hiQ: Double = 0.99,
      approx: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "winsorize needs at least one key column")
    require(0 <= loQ && loQ < hiQ && hiQ <= 1, s"need 0<=loQ<hiQ<=1, got $loQ/$hiQ")
    def q(p: Double): org.apache.spark.sql.Column =
      if (approx) approx_percentile(col(valueCol), lit(p), lit(10000))
      else percentile(col(valueCol), lit(p))
    val bounds = events.groupBy(keyCols.map(col): _*)
      .agg(q(loQ).as("_lo"), q(hiQ).as("_hi"))
    events.join(broadcast(bounds), keyCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Robust per-key outlier detection: flag rows whose value deviates
    * from the key's median by more than `k` × MAD (median absolute
    * deviation) — the Hampel filter, the standard telemetry anomaly
    * gate that a mean/stddev z-score can't do safely because outliers
    * poison the mean itself.
    *
    * Shape: two exact-percentile rollups (median, then MAD over the
    * re-joined deviations) with the ≤|keys|-row aggregate broadcast
    * back — shuffles are keyed on the series key only. Exact
    * `percentile` is deterministic cross-engine at q = 0.5 (the
    * interpolation fraction is an exact binary value — the same recipe
    * as the perplexity q25/q75 thresholds); swap in approx_percentile
    * at extreme cardinality, the contract is unchanged. A constant
    * series has MAD 0, so ANY deviation from its median is flagged —
    * the standard Hampel edge, kept rather than fudged with an
    * epsilon.
    *
    * Output: `(idCol, keyCols…, valueCol, is_anomaly)` — the medians
    * stay internal so the compared surface adds only a bool. */
  def robustAnomalies(
      events: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "robustAnomalies needs at least one key column")
    val keyCs = keyCols.map(col)
    val med = events.groupBy(keyCs: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("_med"))
    val withMed = events.join(broadcast(med), keyCols)
    val mad = withMed
      .groupBy(keyCs: _*)
      .agg(percentile(abs(col(valueCol) - col("_med")), lit(0.5)).as("_mad"))
    withMed.join(broadcast(mad), keyCols)
      .select(
        (col(idCol) +: keyCs) ++ Seq(
          col(valueCol),
          (abs(col(valueCol) - col("_med")) > lit(k) * col("_mad"))
            .as("is_anomaly")): _*)
  }

  /** SCD type-2 dimension build: turn a change-event stream
    * `(key, ts, attrs…)` into validity intervals — `valid_from` = the
    * change's timestamp, `valid_to` = the NEXT change's (NULL while
    * current) — the slowly-changing-dimension table every warehouse
    * join-as-of-load depends on (and the natural right side for
    * [[AsOfJoin]]). One per-key window, shuffle keyed on the dimension
    * key; ties on (key, ts) are rejected upstream by the same
    * unique-per-(key,ts) contract as the as-of join. */
  def scd2(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    events
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Retention cohort matrix: cohort = the bucket of a user's FIRST
    * event; one output row per (cohort, offset) with the number of
    * distinct cohort users active in cohort+offset and the cohort's
    * size (offset 0 row always equals `n_cohort`).
    *
    * Shape: first-seen rollup (map-side combined) + distinct activity
    * rollup + one keyed join — all shuffles on the user column, then a
    * bounded (cohort × offset) aggregation. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    val bucketed = events.select(
      col(userCol).as("_u"), expr(s"$tsCol div $bucketNs").as("_b"))
    val firstSeen = bucketed.groupBy("_u").agg(min("_b").as("cohort"))
    val active = bucketed.distinct()
    val matrix = active.join(firstSeen, "_u")
      .groupBy(col("cohort"), (col("_b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firstSeen.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    matrix.join(sizes, "cohort")
      .select("cohort", "offset", "n_active", "n_cohort")
  }

  /** Out-of-order arrival audit per key — the stream-quality check
    * that sizes watermarks ("what lateness budget does this source
    * actually need?"): an event is LATE when its event time precedes
    * the running max event time of everything that arrived before it
    * (arrival order = `arrivalCol`, e.g. an ingest sequence or
    * event_id). Per key: count, late count/ppm, and the worst
    * observed lag — the max watermark delay that would have been
    * needed. One per-key window (running max over arrival order) +
    * one rollup; shuffle keyed on `keyCol` only.
    * Output: `(keyCol, n_events, n_late, late_ppm, max_lag)` with
    * `max_lag` in `tsCol` units (0 when never late). */
  def disorderAudit(
      events: DataFrame, keyCol: String, arrivalCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("_hwm", max(col(tsCol)).over(w))
      .groupBy(keyCol).agg(
        count(lit(1)).as("n_events"),
        sum(when(col(tsCol) < col("_hwm"), 1L).otherwise(0L)).as("n_late"),
        max(when(col(tsCol) < col("_hwm"), col("_hwm") - col(tsCol))
          .otherwise(lit(0L))).as("max_lag"))
      .withColumn("late_ppm",
        expr("CAST((1000000L * n_late) div n_events AS BIGINT)"))
      .select(col(keyCol), col("n_events"), col("n_late"),
        col("late_ppm"), coalesce(col("max_lag"), lit(0L)).as("max_lag"))
  }
}
