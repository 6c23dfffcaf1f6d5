package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference implementation of the exact integer update rule. */
  private def refRank(
      edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (1000000000000L * 15L / 100L) / nodes.size
    var r = nodes.map(_ -> 1000000000000L / nodes.size).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        (r(u) * 85L / 100L) / outdeg(u)
      }.sum).toMap
      r = nodes.map(n => n -> (base + inflow.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRank matches the integer reference on an asymmetric graph") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    val got = Graph.pageRank(spark, edges.toDF("src", "dst"), iterations = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refRank(edges, 7))
    // c receives from three nodes, d from none: strict ordering
    assert(got("c") > got("a") && got("a") > got("d"))
  }

  test("pageRank: symmetric 2-cycle stays symmetric; mass never exceeds budget") {
    import spark.implicits._
    val got = Graph.pageRank(spark,
      Seq(("x", "y"), ("y", "x")).toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("x") === got("y"))
    assert(got.values.sum <= 1000000000000L)
  }
}
