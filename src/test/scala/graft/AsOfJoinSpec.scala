package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // seeded fixture: 40 left probes + 25 right states over 4 keys, with
  // deliberate ts collisions between sides (equal-ts inclusivity) and
  // one key (99) that exists only on the left (no-match nulls)
  private lazy val fixture: (Seq[(Long, Long, Long)], Seq[(Long, Long, Long, Double)]) = {
    val rnd = new scala.util.Random(42)
    val lefts = (0 until 40).map(i =>
      (i.toLong, (i % 4).toLong, (rnd.nextInt(50) * 10).toLong)) :+
      ((40L, 99L, 100L))
    val rights = (0 until 25).map(i =>
        (1000L + i, (i % 4).toLong, (rnd.nextInt(50) * 10 + (i % 2) * 5).toLong,
          i * 1.5))
      // the operator's contract requires right rows unique per (key, ts)
      .groupBy(r => (r._2, r._3)).map(_._2.head).toSeq
    (lefts.map(l => (l._1, l._2, l._3)), rights)
  }

  private def bruteForce(
      lefts: Seq[(Long, Long, Long)],
      rights: Seq[(Long, Long, Long, Double)],
      forward: Boolean,
      tol: Option[Long]): Map[Long, Option[(Long, Long, Double)]] =
    lefts.map { case (lid, key, lts) =>
      val cand = rights.filter(r => r._2 == key &&
        (if (forward) r._3 >= lts else r._3 <= lts) &&
        tol.forall(t => math.abs(r._3 - lts) <= t))
      val best =
        if (cand.isEmpty) None
        else Some(if (forward) cand.minBy(_._3) else cand.maxBy(_._3))
      lid -> best.map(r => (r._3, r._1, r._4))
    }.toMap

  private def run(forward: Boolean, tol: Option[Long]): Map[Long, Option[(Long, Long, Double)]] = {
    import spark.implicits._
    val (lefts, rights) = fixture
    val l = lefts.toDF("probe_id", "key", "ts")
    val r = rights.toDF("state_id", "key", "ts", "reading")
    AsOfJoin.asOf(l, r, keys = Seq("key"), tsCol = "ts",
        payloads = Seq("state_id", "reading"),
        forward = forward, tolerance = tol.map(t => lit(t.toDouble)))
      .collect()
      .map(row => row.getAs[Long]("probe_id") ->
        Option(row.get(row.fieldIndex("asof_ts"))).map(_ =>
          (row.getAs[Long]("asof_ts"), row.getAs[Long]("asof_state_id"),
            row.getAs[Double]("asof_reading"))))
      .toMap
  }

  test("backward as-of equals brute force (inclusive ties, no-match nulls)") {
    val (lefts, rights) = fixture
    val got = run(forward = false, tol = None)
    assert(got.size === lefts.size) // every left row preserved
    assert(got === bruteForce(lefts, rights, forward = false, tol = None))
    assert(got(40L).isEmpty) // key 99 has no right side
    // at least one exact-ts tie exists in the fixture and matches
    val ties = lefts.exists { case (lid, key, lts) =>
      rights.exists(r => r._2 == key && r._3 == lts) &&
        got(lid).exists(_._1 == lts)
    }
    assert(ties, "fixture should exercise an equal-ts inclusive match")
  }

  test("forward as-of equals brute force") {
    val (lefts, rights) = fixture
    assert(run(forward = true, tol = None) ===
      bruteForce(lefts, rights, forward = true, tol = None))
  }

  test("tolerance nulls out matches farther than the bound, keeps rows") {
    val (lefts, rights) = fixture
    val tol = Some(30L)
    val got = run(forward = false, tol = tol)
    assert(got.size === lefts.size)
    assert(got === bruteForce(lefts, rights, forward = false, tol = tol))
    // the tolerance must actually have nulled something the unbounded
    // join matched, or the test proves nothing
    val unbounded = run(forward = false, tol = None)
    assert(lefts.exists { case (lid, _, _) =>
      unbounded(lid).isDefined && got(lid).isEmpty })
  }

  test("randomized sweep: 8 seeds x both directions x random tolerance vs brute force") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(5)
      val lefts = (0 until 30 + rnd.nextInt(40)).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(200).toLong))
      val rights = (0 until 10 + rnd.nextInt(40)).map(i =>
          (2000L + i, rnd.nextInt(nKeys).toLong, rnd.nextInt(200).toLong, i * 0.25))
        .groupBy(r => (r._2, r._3)).map(_._2.head).toSeq // unique (key, ts)
      val forward = rnd.nextBoolean()
      val tol = if (rnd.nextBoolean()) Some(5L + rnd.nextInt(60)) else None
      val got = AsOfJoin.asOf(
          lefts.toDF("probe_id", "key", "ts"),
          rights.toDF("state_id", "key", "ts", "reading"),
          Seq("key"), "ts", Seq("state_id"),
          forward = forward, tolerance = tol.map(t => lit(t.toDouble)))
        .collect()
        .map(r => r.getAs[Long]("probe_id") ->
          Option(r.get(r.fieldIndex("asof_state_id"))).map(_.asInstanceOf[Long]))
        .toMap
      val want = bruteForce(lefts, rights, forward, tol)
        .map { case (k, v) => k -> v.map(_._2) }
      assert(got === want, s"seed=$seed forward=$forward tol=$tol")
    }
  }

  test("one shuffle, no cartesian/range join in the plan") {
    import spark.implicits._
    val (lefts, rights) = fixture
    val plan = AsOfJoin.asOf(lefts.toDF("probe_id", "key", "ts"),
      rights.toDF("state_id", "key", "ts", "reading"),
      Seq("key"), "ts", Seq("reading"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not plan a product join:\n$plan")
  }
}
