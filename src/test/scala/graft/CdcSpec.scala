package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("applyChanges: upsert, delete, insert, and ordering semantics") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val changes = Seq(
      (1L, "a2", 1L, "U"),  // update
      (1L, "a3", 2L, "U"),  // later update wins
      (2L, "x", 1L, "U"),   // update then delete
      (2L, "x", 2L, "D"),
      (3L, "y", 2L, "D"),   // delete then LATER re-insert wins
      (3L, "c2", 3L, "I"),
      (5L, "e", 1L, "I"),   // brand-new key
      (9L, "z", 1L, "D")    // delete of unknown key → no row, no error
    ).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "a3", // latest update
      3L -> "c2", // re-inserted after delete
      4L -> "d",  // untouched base row survives
      5L -> "e")) // new insert
    // 2 deleted, 9 never existed
  }

  test("applyChanges: schema preserved, base-only input is identity") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L)).toDF("k", "v", "n")
    val noChanges = Seq.empty[(Long, String, Long, Long, String)]
      .toDF("k", "v", "n", "seq", "op")
    val out = Cdc.applyChanges(base, noChanges, Seq("k"), "seq", "op")
    assert(out.columns.toSeq === Seq("k", "v", "n"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq((1L, "a", 10L)))
  }

  test("applyChanges plan: one shuffle on the key, no product") {
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val changes = (0L until 50L).map(i => (i, s"u$i", 1L, "U"))
      .toDF("k", "v", "seq", "op")
    val plan = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in CDC plan:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"CDC apply should shuffle once, saw $shuffles:\n$plan")
  }
}
