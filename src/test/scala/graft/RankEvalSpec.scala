package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankEval

class RankEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def gain(i: Int): Long = math.round(1e6 / math.log(i + 1.0))

  test("evalRanking: hand-checked recall/MRR/NDCG at k=3") {
    import spark.implicits._
    val rankings = Seq(
      // q1: relevant at ranks 1 and 3
      ("q1", "d1", 1L), ("q1", "d2", 2L), ("q1", "d3", 3L), ("q1", "d4", 4L),
      // q2: single relevant at rank 2
      ("q2", "e1", 1L), ("q2", "e2", 2L), ("q2", "e3", 3L),
      // q3: relevant exists but only at rank 5 (outside k)
      ("q3", "f1", 1L), ("q3", "f2", 2L), ("q3", "f3", 3L),
      ("q3", "f4", 4L), ("q3", "f5", 5L)).toDF("q", "doc", "rank")
    val qrels = Seq(
      ("q1", "d1"), ("q1", "d3"), ("q2", "e2"), ("q3", "f5"),
      ("q2", "e2") // duplicate qrel row must not double-count
    ).toDF("q", "doc")
    val got = RankEval.evalRanking(rankings, qrels, "q", "doc", "rank", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val (g1, g2, g3) = (gain(1), gain(2), gain(3))
    assert(got("q1") === ((2L, 2L, 1000000L,
      1000000L, 1000000L * (g1 + g3) / (g1 + g2))))
    assert(got("q2") === ((1L, 1L, 1000000L, 500000L, 1000000L * g2 / g1)))
    // relevant doc outside the cutoff: all rank metrics zero
    assert(got("q3") === ((1L, 0L, 0L, 0L, 0L)))
    assert(got.size === 3, "queries without qrels are dropped")
  }

  test("evalRanking: perfect ranking scores 10^6 across the board") {
    import spark.implicits._
    val rankings = (1 to 8).map(i => ("q", s"d$i", i.toLong))
      .toDF("q", "doc", "rank")
    val qrels = (1 to 4).map(i => ("q", s"d$i")).toDF("q", "doc")
    val r = RankEval.evalRanking(rankings, qrels, "q", "doc", "rank", k = 4)
      .collect()(0)
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((1000000L, 1000000L, 1000000L)))
  }
}
