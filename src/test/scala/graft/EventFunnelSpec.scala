package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventFunnel

class EventFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def run(rows: Seq[(Long, Long, String)], within: Option[Long]) = {
    import spark.implicits._
    EventFunnel.funnel(rows.toDF("u", "ts", "ty"), "u", "ts", "ty",
        steps = Seq("a", "b", "c"), withinNs = within)
      .collect()
      .map(r => r.getAs[Long]("u") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("n_steps"))))
      .toMap
  }

  test("greedy-earliest matching, strict ordering, broken-chain nulls") {
    val out = run(Seq(
      // user 0: clean a(10) b(20) c(30)
      (0L, 10L, "a"), (0L, 20L, "b"), (0L, 30L, "c"),
      // user 1: b BEFORE a never matches; chain stops at a
      (1L, 5L, "b"), (1L, 10L, "a"), (1L, 10L, "b"), // b at SAME ts as a: strict > fails
      // user 2: a then c (no b): n_steps 1, c not counted out of order
      (2L, 10L, "a"), (2L, 30L, "c"),
      // user 3: no step-a at all -> absent from output
      (3L, 10L, "b"), (3L, 20L, "c"),
      // user 4: greedy under-count — earliest a(10) has no b after it
      // within anything, because the only b(5) precedes it
      (4L, 5L, "b"), (4L, 10L, "a")), within = None)
    assert(out(0L) === ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(1L) === ((Some(10L), None, None, 1L)))
    assert(out(2L) === ((Some(10L), None, None, 1L)))
    assert(!out.contains(3L))
    assert(out(4L) === ((Some(10L), None, None, 1L)))
  }

  test("completion window measured from t0, inclusive bound") {
    val rows = Seq(
      (0L, 0L, "a"), (0L, 50L, "b"), (0L, 100L, "c"),   // c exactly at bound
      (1L, 0L, "a"), (1L, 50L, "b"), (1L, 101L, "c"))   // c just past it
    val out = run(rows, within = Some(100L))
    assert(out(0L) === ((Some(0L), Some(50L), Some(100L), 3L)))
    assert(out(1L) === ((Some(0L), Some(50L), None, 2L)))
  }

  test("no product joins in the funnel plan") {
    import spark.implicits._
    val plan = EventFunnel.funnel(
        Seq((0L, 1L, "a")).toDF("u", "ts", "ty"), "u", "ts", "ty",
        Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"funnel must stay keyed-join shaped:\n$plan")
  }
}
