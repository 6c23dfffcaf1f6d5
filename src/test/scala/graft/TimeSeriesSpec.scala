package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("ohlcDownsample: open/close by timestamp, high/low by value, bucketing") {
    import spark.implicits._
    val rows = Seq( // (ts, key, value) — bucket width 100
      (10L, "x", 5.0), (50L, "x", 9.0), (90L, "x", 1.0), // bucket 0
      (110L, "x", 7.0),                                   // bucket 1
      (20L, "y", 3.0))
    val out = TimeSeries.ohlcDownsample(
        rows.toDF("ts", "key", "value"), "ts", Seq("key"), "value", 100L)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("key")) ->
        ((r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events"))))
      .toMap
    assert(out((0L, "x")) === ((5.0, 9.0, 1.0, 1.0, 3L)))
    assert(out((1L, "x")) === ((7.0, 7.0, 7.0, 7.0, 1L)))
    assert(out((0L, "y")) === ((3.0, 3.0, 3.0, 3.0, 1L)))
  }

  test("percentileProfile: exact quantiles; approx variant stays within bounds") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("k", i.toDouble))
    val exact = TimeSeries.percentileProfile(
        rows.toDF("key", "v"), Seq("key"), "v").collect()(0)
    assert(exact.getAs[Double]("p50") === 50.5)
    assert(exact.getAs[Long]("n") === 100L)
    val approx = TimeSeries.percentileProfile(
        rows.toDF("key", "v"), Seq("key"), "v", approx = true).collect()(0)
    assert(math.abs(approx.getAs[Double]("p50") - 50.5) <= 1.5)
    assert(math.abs(approx.getAs[Double]("p99") - exact.getAs[Double]("p99")) <= 2.0)
  }

  test("winsorize: clips into [p(lo), p(hi)] per key, interior values untouched") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("k", i.toDouble)) ++
      Seq(("k", -1000.0), ("k", 1000.0), ("q", 5.0))
    val w = TimeSeries.winsorize(rows.toDF("key", "v"), Seq("key"), "v", 0.05, 0.95)
    val byV = w.collect().map(r =>
      (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(byV(("k", -1000.0)) > -1000.0, "low outlier clipped up")
    assert(byV(("k", 1000.0)) < 1000.0, "high outlier clipped down")
    assert(byV(("k", 50.0)) === 50.0, "interior value untouched")
    assert(byV(("q", 5.0)) === 5.0, "singleton group maps to itself")
    // clipped column never escapes the bounds
    import org.apache.spark.sql.functions.{min, max}
    val mm = w.groupBy("key").agg(min("v_w"), max("v_w"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(mm("k")._1 >= 1.0 && mm("k")._2 <= 100.0)
  }

  test("robustAnomalies: Hampel flags the planted spike, constant series edge") {
    import spark.implicits._
    // key "a": 9 values near 10 plus one spike at 100 -> only the spike
    // flags (a mean/stddev z-score at the same k would be poisoned);
    // key "b": constant -> MAD 0, any deviation flags
    val rows = (0L until 9L).map(i => (i, "a", 10.0 + (i % 3) * 0.5)) ++
      Seq((9L, "a", 100.0), (10L, "b", 5.0), (11L, "b", 5.0), (12L, "b", 5.1))
    val out = TimeSeries.robustAnomalies(
        rows.toDF("id", "key", "value"), "id", Seq("key"), "value", k = 3.0)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(out(9L) === true)
    assert((0L until 9L).forall(i => !out(i)))
    assert(!out(10L) && !out(11L) && out(12L))
  }

  test("scd2: change events become contiguous validity intervals, last is current") {
    import spark.implicits._
    val rows = Seq((1L, 10L, "bronze"), (1L, 20L, "silver"), (1L, 35L, "gold"),
      (2L, 5L, "bronze"))
    val out = TimeSeries.scd2(rows.toDF("key", "ts", "tier"), Seq("key"), "ts")
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("tier")) ->
        ((r.getAs[Long]("valid_from"), Option(r.get(r.fieldIndex("valid_to"))),
          r.getAs[Boolean]("is_current"))))
      .toMap
    assert(out((1L, "bronze")) === ((10L, Some(20L), false)))
    assert(out((1L, "silver")) === ((20L, Some(35L), false)))
    assert(out((1L, "gold")) === ((35L, None, true)))
    assert(out((2L, "bronze")) === ((5L, None, true)))
    // intervals tile: as-of join at ts 25 lands on silver
    val dim = TimeSeries.scd2(rows.toDF("key", "ts", "tier"), Seq("key"), "ts")
      .select(col("key"), col("valid_from").as("ts"), col("tier"))
    val probe = Seq((100L, 1L, 25L)).toDF("pid", "key", "ts")
    val asof = graft.operators.AsOfJoin.asOf(probe, dim, Seq("key"), "ts", Seq("tier"))
      .collect()(0)
    assert(asof.getAs[String]("asof_tier") === "silver")
  }

  test("retentionCohorts: first-seen cohorts, distinct activity, sizes") {
    import spark.implicits._
    val rows = Seq( // (user, ts) — day width 10
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 25L), // cohort 0, active d0 d1 d2
      (2L, 3L), (2L, 23L),                       // cohort 0, active d0 d2
      (3L, 11L))                                 // cohort 1, active d1 only
    val out = TimeSeries.retentionCohorts(
        rows.toDF("u", "ts"), "u", "ts", 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out((0L, 0L)) === ((2L, 2L))) // both cohort-0 users active day 0
    assert(out((0L, 1L)) === ((1L, 2L))) // only user 1 active day 1
    assert(out((0L, 2L)) === ((2L, 2L)))
    assert(out((1L, 0L)) === ((1L, 1L)))
    assert(out.size === 4)
  }

  test("disorderAudit: late events counted against the running high-water mark") {
    import spark.implicits._
    // u1 arrivals (seq, ts): 10, 20, 15 (late by 5), 30, 12 (late by 18)
    // u2 perfectly ordered; u3 single event (never late)
    val ev = Seq(
      ("u1", 1L, 10L), ("u1", 2L, 20L), ("u1", 3L, 15L),
      ("u1", 4L, 30L), ("u1", 5L, 12L),
      ("u2", 1L, 5L), ("u2", 2L, 6L), ("u2", 3L, 7L),
      ("u3", 1L, 99L)).toDF("k", "seq", "ts")
    val got = graft.operators.TimeSeries.disorderAudit(ev, "k", "seq", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("u1") === ((5L, 2L, 400000L, 18L)))
    assert(got("u2") === ((3L, 0L, 0L, 0L)))
    assert(got("u3") === ((1L, 0L, 0L, 0L)))
  }
}
