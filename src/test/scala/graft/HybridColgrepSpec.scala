package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fts.FtsIndex
import graft.index.MultiVectorIndex
import graft.meta.{MetadataOps, Where}
import graft.operators.{Encoding, Rankers}
import graft.search.{HybridParams, HybridSearch, SearchParams, Searcher}

/** F9 hybrid driver API (modes, fusion, filter pushdown), C3/C4/C6
  * colgrep scoping and ranking operators, M5 JSON hydration, E1/E2
  * encoding pre-processing. */
class HybridColgrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** 20 docs with aligned embeddings (sf0.001 fixture) and texts. */
  lazy val (vecIndex, ftsIndex, queries, texts) = {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") / 5).cast("long").as("doc_id"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (d, v, e) => (d, v, graft.core.MaxSim.l2Normalize(e)) }
      .toDF("doc_id", "vec_id", "embedding")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x.getField("embedding")).as("embeddings"))
      .filter(col("doc_id") < 20)
    val vPath = "/tmp/graft_hybrid_v"
    val fPath = "/tmp/graft_hybrid_f"
    graft.util.Fs.deleteRecursively(vPath)
    graft.util.Fs.deleteRecursively(fPath)
    val vIdx = MultiVectorIndex.build(spark, docs, vPath)
    val txt = (0L until 20L).map(i =>
      (i, if (i % 3 == 0) s"spark join doc number $i" else s"plain filler text number $i"))
      .toDF("doc_id", "text")
    val fIdx = FtsIndex.build(spark, txt, "doc_id", "text", fPath)
    val qs = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    (vIdx, fIdx, qs, txt)
  }

  private def exhaustive = SearchParams(
    nIvfProbe = Int.MaxValue, nFullScores = 1 << 22, centroidScoreThreshold = None)

  test("hybrid API: semantic mode equals the raw funnel; keyword mode equals FTS ranks") {
    val sem = HybridSearch.search(spark, vecIndex, ftsIndex, queries, "spark join",
      HybridParams(mode = "semantic", topK = 5, searchParams = exhaustive))
    val direct = new Searcher(vecIndex).search(queries, exhaustive.copy(topK = 5))
    assert(sem.select("query_id", "doc_id", "rank").collect().toSet ===
      direct.select("query_id", "doc_id", "rank").collect().toSet)

    val kw = HybridSearch.search(spark, vecIndex, ftsIndex, queries, "spark join",
      HybridParams(mode = "keyword", topK = 5))
    val kwRows = kw.collect()
    assert(kwRows.map(_.getLong(0)).toSet === Set(0L, 1L)) // per query
    // only docs with i % 3 == 0 contain 'spark join'
    assert(kwRows.map(_.getLong(1)).forall(_ % 3 === 0))
  }

  test("hybrid API: both fusions return top-k per query and respect a metadata filter") {
    for (fusion <- Seq("rrf", "relative_score")) {
      val out = HybridSearch.search(spark, vecIndex, ftsIndex, queries, "spark join",
        HybridParams(mode = "hybrid", fusion = fusion, topK = 4, searchParams = exhaustive))
      val byQ = out.collect().groupBy(_.getLong(0))
      assert(byQ.keySet === Set(0L, 1L))
      byQ.values.foreach(rows => assert(rows.length === 4))
    }
    // filter: restrict to doc_id < 6 via the WHERE surface
    val meta = texts.withColumnRenamed("text", "body")
    val filtered = HybridSearch.search(spark, vecIndex, ftsIndex, queries, "spark join",
      HybridParams(mode = "hybrid", topK = 4, searchParams = exhaustive),
      filter = Some((meta, "doc_id < ?", Seq(Where.SLong(6)))))
    assert(filtered.select("doc_id").collect().map(_.getLong(0)).forall(_ < 6))
  }

  test("C4 path scoping and glob conversion") {
    import spark.implicits._
    val files = Seq("src/a/main.py", "src/b/util.py", "tests/a/test_main.py",
      "docs/readme.md", "src/a/deep/x.scala")
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "path")
    assert(Rankers.pathScope(files, col("path"), prefix = Some("src/")).count() === 3)
    assert(Rankers.pathScope(files, col("path"), includeGlobs = Seq("src/**/*.py"))
      .collect().map(_.getString(1)).toSet === Set("src/a/main.py", "src/b/util.py"))
    assert(Rankers.pathScope(files, col("path"), excludeDirs = Seq("tests"))
      .count() === 4)
    assert(Rankers.globToRegex("a/*.py") === "a/[^/]*\\.py")
    // `?` is one NON-separator char (fixed r20 — `.` matched '/')
    assert(Rankers.globToRegex("**/x?.md") === ".*/x[^/]\\.md")
  }

  test("C3 regex prefilter literalizes non-quantifier braces; C6 helpers") {
    import spark.implicits._
    val d = Seq((0L, "fn foo() { bar(); }"), (1L, "aaa"), (2L, "aa")).toDF("id", "text")
    assert(Rankers.regexPrefilter(d, col("text"), "foo\\(\\) \\{").count() === 1)
    assert(Rankers.regexPrefilter(d, col("text"), "a{3}").count() === 1) // quantifier kept
    assert(Rankers.regexPrefilter(d, col("text"), "\\) {").count() === 1) // brace literalized

    assert(Rankers.shouldApplyPathPenalty("find the parser"))
    assert(!Rankers.shouldApplyPathPenalty("where are the tests for parser"))
  }

  test("M5 getJson hydrates rows with base64 binary") {
    import spark.implicits._
    val d = Seq((0L, "alpha", Array[Byte](1, 2, 3)), (1L, "beta", Array[Byte](4)))
      .toDF("doc_id", "name", "blob")
    val out = MetadataOps.getJson(d, "doc_id",
      cond = Some(("name = ?", Seq(Where.SStr("alpha")))), ids = None, limit = None)
      .collect()
    assert(out.length === 1)
    val json = out(0).getString(1)
    assert(json.contains(""""name":"alpha""""))
    assert(json.contains(java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3))))
  }

  test("E1/E2 encoding pre-processing semantics") {
    val q = Encoding.prepareQuery("what is spark", queryLength = 8)
    assert(q.length === 8)
    assert(q.take(4) === Seq("[Q]", "what", "is", "spark"))
    assert(q.drop(4).forall(_ === "[MASK]"))
    val dcol = Encoding.prepareDocument("hello - world ! " + ("x " * 500), documentLength = 10)
    assert(dcol.length === 10)
    assert(dcol.take(3) === Seq("[D]", "hello", "world")) // punctuation-only dropped
    // column forms agree with the scalar forms
    import spark.implicits._
    val df = Seq((0L, "what is spark")).toDF("id", "text")
    val viaCol = df.select(Encoding.prepareQueryCol(col("text"), 8)).collect()(0).getSeq[String](0)
    assert(viaCol === q)
  }
}
