package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fts.FtsIndex
import graft.meta.JsonMeta

/** F3 persisted-FTS lifecycle (build/search/delete/update_rows/rebuild,
  * mirroring fts_integration.rs:45-425), F1 metadata_to_text, and M1/M2
  * JSON metadata create/append with schema evolution. */
class FtsJsonMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_fts_test_$name"
    graft.util.Fs.deleteRecursively(p)
    p
  }

  test("FTS lifecycle: build, search, delete+renumber, update_rows, rebuild") {
    val d = docsDf(
      0L -> "spark joins big tables",
      1L -> "duck ponds and rivers",
      2L -> "spark streams and rivers",
      3L -> "unrelated words entirely")
    val path = fresh("life")
    val idx = FtsIndex.build(spark, d, "doc_id", "text", path)
    assert(graft.util.Fs.exists(s"$path/postings"))

    val hits = idx.search("spark", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits === Set(0L, 2L))

    // delete doc 1 -> ids renumber densely (2->1, 3->2)
    val idx2 = FtsIndex.delete(idx, Seq(1L))
    val ids = idx2.doclens.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(0L, 1L, 2L))
    val hits2 = idx2.search("rivers", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits2 === Set(1L)) // old doc 2 under its new id

    // update_rows: rewrite doc 0's text; old terms gone, new terms found
    val idx3 = FtsIndex.updateRows(idx2, docsDf(0L -> "completely fresh content"), "doc_id", "text")
    assert(idx3.search("joins", topK = 10).count() === 0)
    assert(idx3.search("fresh", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L))

    // rebuild from source equals a fresh build
    val src = docsDf(0L -> "completely fresh content", 1L -> "spark streams and rivers",
      2L -> "unrelated words entirely")
    val idx4 = FtsIndex.rebuild(idx3, src, "doc_id", "text")
    val fresh2 = FtsIndex.build(spark, src, "doc_id", "text", fresh("life_b"))
    val p1 = idx4.postings.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val p2 = fresh2.postings.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(p1 === p2)
  }

  test("trigram FTS end-to-end: substring queries match inside words (text_search.rs:68-104)") {
    val d = docsDf(
      0L -> "configuration parsing for the engine",
      1L -> "spark joins big tables",
      2L -> "reconfigure the parser quickly")
    val tri = FtsIndex.build(spark, d, "doc_id", "text", fresh("tri"), "trigram")
    assert(tri.tokenizerName === "trigram")

    // "figur" appears only INSIDE configuration/reconfigure — a word
    // tokenizer can never match it
    val word = FtsIndex.build(spark, d, "doc_id", "text", fresh("tri_word"))
    assert(word.search("figur", topK = 10).count() === 0)
    val sub = tri.search("figur", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub === Set(0L, 2L), s"got: $sub")

    // a substring spanning a word boundary (space inside the trigrams)
    val span = tri.search("tion pars", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(span === Set(0L), s"got: $span")

    // exact-word queries still work on the trigram index
    val joins = tri.search("joins", topK = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(joins === Set(1L), s"got: $joins")

    // sub-3-char query: no trigrams, empty result (FTS5 trigram minimum)
    assert(tri.search("pa", topK = 10).count() === 0)
  }

  test("metadataToText concatenates string/number leaves recursively in field order") {
    assert(FtsIndex.metadataToText("""{"a": "x", "b": {"c": 2, "d": [3, "y"]}}""") === "x 2 3 y")
    assert(FtsIndex.metadataToText("""{"k": 69}""") === "69")
    assert(FtsIndex.metadataToText("""{"flag": true, "n": null, "s": "hi"}""") === "hi")
    assert(FtsIndex.metadataToText(null) === null)
    assert(FtsIndex.metadataToText("not json") === "")
  }

  test("JsonMeta.create infers types per the reference mapping and assigns dense ids") {
    import spark.implicits._
    val rows = Seq(
      (10L, """{"name": "a", "n": 1, "x": 1.5, "ok": true, "nested": {"k": 1}}"""),
      (20L, """{"name": "b", "n": 2, "x": 2.5, "ok": false, "nested": {"k": 2}}""")
    ).toDF("order", "json")
    val out = JsonMeta.create(spark, rows)
    val schema = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("n") === "long")
    assert(schema("x") === "double")
    assert(schema("ok") === "long")     // bool -> INTEGER per filtering.rs:634-650
    assert(schema("nested") === "string") // object -> JSON text
    assert(schema("_subset_") === "long")
    val r = out.orderBy("_subset_").collect()
    assert(r.map(_.getAs[Long]("_subset_")).toSeq === Seq(0L, 1L))
    assert(r(0).getAs[Long]("ok") === 1L)
    assert(r(1).getAs[Long]("ok") === 0L)
    assert(r(0).getAs[String]("nested") === """{"k":1}""")
  }

  test("JsonMeta.append auto-adds new columns and widens long to double") {
    import spark.implicits._
    val base = JsonMeta.create(spark,
      Seq((1L, """{"a": 1, "b": "x"}"""), (2L, """{"a": 2, "b": "y"}""")).toDF("order", "json"))
    val appended = JsonMeta.append(spark, base,
      Seq((3L, """{"a": 2.5, "b": "z", "c": 7}""")).toDF("order", "json"))
    val schema = appended.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("a") === "double") // long widened to double
    assert(schema("c") === "long")   // auto-added column
    val rows = appended.orderBy("_subset_").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("_subset_")).toSeq === Seq(0L, 1L, 2L))
    assert(rows(0).isNullAt(rows(0).fieldIndex("c"))) // null for pre-existing rows
    assert(rows(2).getAs[Long]("c") === 7L)
    assert(rows(2).getAs[Double]("a") === 2.5)
  }

  test("REGEXP failure-as-no-match: invalid and catastrophic patterns return 0 rows") {
    import spark.implicits._
    import graft.meta.{MetadataOps, SafeRegex, Where}
    val df = Seq(
      (0L, "spark joins big tables"),
      (1L, "a" * 200 + "b") // long non-matching tail for the backtracker
    ).toDF("doc_id", "text")

    // valid pattern still matches (RLIKE-equivalent unanchored search)
    val ok = MetadataOps.whereCondition(df, "doc_id", "text REGEXP ?",
      Seq(Where.SStr("joins? big")))
    assert(ok.collect().map(_.getLong(0)).toSet === Set(0L))

    // invalid pattern: fancy-regex error -> no match, not an exception
    // (filtering.rs:2026-2031)
    val bad = MetadataOps.whereCondition(df, "doc_id", "text REGEXP ?",
      Seq(Where.SStr("(unclosed[")))
    assert(bad.count() === 0L)

    // catastrophic backtracking: budget overrun -> no match for that row,
    // and the query completes instead of hanging
    val boom = MetadataOps.whereCondition(df, "doc_id", "text REGEXP ?",
      Seq(Where.SStr("(a+)+$")))
    assert(boom.count() === 0L)

    // kernel-level checks
    assert(SafeRegex.matches("hello world", "wor.d"))
    assert(!SafeRegex.matches("hello", "(((("))
    assert(!SafeRegex.matches(null, "x"))
  }

  test("validateFts: clean build green; a doclens drift is pinpointed") {
    import graft.index.IndexCheck
    val d = docsDf(
      0L -> "spark joins big tables",
      1L -> "duck ponds and rivers",
      2L -> "spark streams and rivers")
    val path = fresh("fsck")
    val idx = FtsIndex.build(spark, d, "doc_id", "text", path)
    val clean = IndexCheck.validateFts(spark, idx, numDocs = Some(3L))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(clean.size === 5 && clean.values.forall(identity), s"clean: $clean")
    // plant a crash-window drift: one doc's dl off by one, one dropped
    import org.apache.spark.sql.functions._
    graft.util.Fs.rewrite(
      idx.doclens.filter(col("doc_id") =!= 1)
        .withColumn("dl", when(col("doc_id") === 0, col("dl") + 1)
          .otherwise(col("dl"))), s"$path/doclens")
    val bad = IndexCheck.validateFts(spark, new FtsIndex(spark, path), Some(3L))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(3))).toList
    val byName = bad.map(t => t._1 -> t).toMap
    assert(!byName("dl_vs_postings")._2 && byName("dl_vs_postings")._3 === 2L,
      s"expected exactly the two planted drifts: $bad")
    assert(byName("postings_keys")._2 && byName("tf_positive")._2 &&
      byName("dl_positive")._2 && byName("ids_in_range")._2, s"others green: $bad")
  }
}
