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

  test("diffSnapshots: insert/delete/update classified, unchanged dropped, NULL-safe") {
    import spark.implicits._
    val old = Seq((1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "b", java.lang.Long.valueOf(20L)),
      (3L, "c", null.asInstanceOf[java.lang.Long]),
      (4L, "d", java.lang.Long.valueOf(40L))).toDF("k", "s", "v")
    val neu = Seq((1L, "a", java.lang.Long.valueOf(10L)),       // unchanged
      (2L, "b", java.lang.Long.valueOf(99L)),                   // update
      (3L, "c", null.asInstanceOf[java.lang.Long]),             // unchanged (null == null)
      (5L, "e", java.lang.Long.valueOf(50L))).toDF("k", "s", "v") // insert; 4 deleted
    val d = Cdc.diffSnapshots(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("diffSnapshots: round-trips through applyChanges (diff then apply == new)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val old = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val neu = Seq((1L, 10L), (2L, 25L), (4L, 40L)).toDF("k", "v")
    // rebuild a change log from the diff: new values for upserts
    val log = Cdc.diffSnapshots(old, neu, Seq("k"))
      .join(neu, Seq("k"), "left")
      .select(col("k"), coalesce(col("v"), lit(0L)).as("v"),
        lit(1L).as("seq"),
        when(col("change_type") === "delete", "D").otherwise("U").as("op"))
    val rebuilt = Cdc.applyChanges(old, log, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rebuilt === neu.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
