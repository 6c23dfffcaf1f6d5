package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // seeded fixture: intervals of wildly varying widths (0 to ~40 buckets
  // worth at width=100) over 4 keys, INCLUDING negative coordinates (the
  // exact-floor-div path) and shared endpoints (boundary inclusivity)
  private def randomIntervals(
      seed: Int, n: Int, idBase: Long): Seq[(Long, Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val start = rnd.nextInt(8000).toLong - 4000L
      val len = rnd.nextInt(4) match {
        case 0 => 0L                        // degenerate point interval
        case 1 => rnd.nextInt(50).toLong    // sub-bucket
        case 2 => rnd.nextInt(400).toLong   // a few buckets
        case _ => rnd.nextInt(3000).toLong  // many buckets
      }
      (idBase + i, (i % 4).toLong, start, start + len)
    }
  }

  private def bruteOverlap(
      ls: Seq[(Long, Long, Long, Long)],
      rs: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      l <- ls; r <- rs
      if l._2 == r._2 && l._3 <= r._4 && r._3 <= l._4
    } yield (l._1, r._1)).toSet

  test("overlapJoin equals brute force — no dupes, no misses, negatives") {
    import spark.implicits._
    val ls = randomIntervals(7, 120, 0L)
    val rs = randomIntervals(13, 90, 10000L)
    val l = ls.toDF("l_id", "key", "ls", "le")
    val r = rs.toDF("r_id", "key", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, r, Seq("key"),
        "ls", "le", "rs", "re", bucketWidth = 100L)
      .select("l_id", "r_id").collect()
    val pairs = got.map(x => (x.getLong(0), x.getLong(1)))
    // the arithmetic dedup must leave each pair exactly once
    assert(pairs.length === pairs.distinct.length,
      "a pair surfaced in more than one bucket")
    assert(pairs.toSet === bruteOverlap(ls, rs))
  }

  test("overlapJoin boundary: touching endpoints match (inclusive)") {
    import spark.implicits._
    val l = Seq((1L, 0L, 0L, 100L)).toDF("l_id", "key", "ls", "le")
    val r = Seq(
      (10L, 0L, 100L, 200L),  // starts exactly at left's end → match
      (11L, 0L, -50L, 0L),    // ends exactly at left's start → match
      (12L, 0L, 101L, 200L),  // one past → no match
      (13L, 1L, 0L, 100L)     // wrong key → no match
    ).toDF("r_id", "key", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, r, Seq("key"),
        "ls", "le", "rs", "re", bucketWidth = 64L)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 11L))
  }

  test("pointInInterval equals brute force") {
    import spark.implicits._
    val ls = randomIntervals(21, 100, 0L)
    val pts = randomIntervals(31, 150, 20000L)
      .map(p => (p._1, p._2, p._3)) // reuse starts as points
    val l = ls.toDF("l_id", "key", "ls", "le")
    val r = pts.toDF("p_id", "key", "ts")
    val got = IntervalJoin.pointInInterval(l, r, Seq("key"),
        "ls", "le", "ts", bucketWidth = 100L)
      .select("l_id", "p_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length === got.distinct.length)
    val want = (for {
      i <- ls; p <- pts
      if i._2 == p._2 && i._3 <= p._3 && p._3 <= i._4
    } yield (i._1, p._1)).toSet
    assert(got.toSet === want)
  }

  test("fan-out cap raises a loud error instead of exploding") {
    import spark.implicits._
    val l = Seq((1L, 0L, 0L, 1000000L)).toDF("l_id", "key", "ls", "le")
    val r = Seq((10L, 0L, 5L)).toDF("p_id", "key", "ts")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(l, r, Seq("key"),
        "ls", "le", "ts", bucketWidth = 10L, maxBucketsPerRow = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("IntervalJoin")),
      s"expected the cap error, got: $ex")
  }

  test("plan: equi-join shape — no cartesian, no nested-loop join") {
    import spark.implicits._
    val l = randomIntervals(7, 50, 0L).toDF("l_id", "key", "ls", "le")
    val r = randomIntervals(13, 50, 1000L).toDF("r_id", "key", "rs", "re")
    val plan = IntervalJoin.overlapJoin(l, r, Seq("key"),
      "ls", "le", "rs", "re", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }
}
