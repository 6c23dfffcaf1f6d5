package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

class JsonlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema =
    StructType.fromDDL("id LONG, txt STRING, score LONG")

  test("read: malformed lines become quarantine rows, never failures") {
    import spark.implicits._
    val path = "/tmp/graft_jsonl_spec1"
    Seq(
      """{"id": 1, "txt": "hello\nworld", "score": 10}""",
      """{"id": 2, "txt": "tabs\tand \"quotes\"", "score": 20}""",
      """not json at all""",
      """{"id": 4, "txt": null}""",
      """{"truncated": """).toDF("value").repartition(2)
      .write.mode("overwrite").text(path)
    val got = Jsonl.read(spark, path, schema)
    assert(got.count() === 5)
    // corrupt-only projections are rejected by Spark's JSON scan
    // (documented in Jsonl.read) — materialize the full rows instead
    val rows = got.collect()
    assert(rows.count(!_.isNullAt(3)) === 2)
    val byId = rows.filter(_.isNullAt(3))
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.get(2))))).toMap
    // escapes round-trip; missing/null fields parse to NULL
    assert(byId(1L) === ((Some("hello\nworld"), Some(10L))))
    assert(byId(2L) === ((Some("tabs\tand \"quotes\""), Some(20L))))
    assert(byId(4L) === ((None, None)))
  }

  test("ingestSummary counts quarantine separately; toParquet drops it") {
    import spark.implicits._
    val path = "/tmp/graft_jsonl_spec2"
    Seq(
      """{"id": 1, "txt": "a", "score": 1}""",
      """{"id": 2, "txt": "b", "score": 2}""",
      """broken""").toDF("value")
      .write.mode("overwrite").text(path)
    val parsed = Jsonl.read(spark, path, schema)
    val sum = Jsonl.ingestSummary(parsed, "txt", Seq("id", "score"))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(sum(Some("a")) === ((1L, 0L)) && sum(None) === ((1L, 1L)))
    val out = "/tmp/graft_jsonl_spec2_pq"
    Jsonl.toParquet(parsed, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 2 && !back.columns.contains("_corrupt"))
  }
}
