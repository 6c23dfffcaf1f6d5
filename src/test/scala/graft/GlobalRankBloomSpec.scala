package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank
import graft.pipeline.BloomPrune

/** Equivalence specs for the two distributed-exact primitives:
  * GlobalRank (rank/NTILE without a single-partition window) must match
  * Spark's own `row_number`/`ntile` over the same total order, and
  * BloomPrune's pre-filtered joins must be row-identical to the exact
  * semi/anti joins they accelerate. */
class GlobalRankBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def rankFixture(n: Long) = {
    import spark.implicits._
    // deliberate ties in the value column; (value, id) is a total order
    (0L until n).map(i => (i, (i * 2654435761L % 97) / 3))
      .toDF("id", "value")
  }

  test("withGlobalRank matches row_number over the same total order") {
    val df = rankFixture(1000)
    val sort = Seq(col("value").desc, col("id"))
    val got = GlobalRank.withGlobalRank(df, sort)
      .select("id", "global_rank")
    val want = df.withColumn("global_rank",
        row_number().over(Window.orderBy(sort: _*)).cast("long"))
      .select("id", "global_rank")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("ntileByRange is bit-identical to SQL NTILE for N%k, N<k, k=1") {
    for ((n, k) <- Seq((1000L, 4), (1000L, 7), (7L, 10), (50L, 1), (96L, 8))) {
      val df = rankFixture(n)
      val sort = Seq(col("value").desc, col("id"))
      val got = GlobalRank.ntileByRange(df, k, sort)
        .select("id", "global_rank", "bucket")
      val w = Window.orderBy(sort: _*)
      val want = df.withColumn("global_rank", row_number().over(w).cast("long"))
        .withColumn("bucket", ntile(k).over(w).cast("long"))
        .select("id", "global_rank", "bucket")
      assert(got.except(want).count() === 0 && want.except(got).count() === 0,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("bloom-pruned semi/anti joins are row-identical to exact joins (Long keys)") {
    import spark.implicits._
    val big = (0L until 5000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val keys = (0L until 5000L by 7).map(i => Tuple1(i)).toDF("kk")
    val semiGot = BloomPrune.semiJoinPruned(big, keys, "k", "kk", 1000L)
    val semiWant = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_semi")
    assert(semiGot.except(semiWant).count() === 0 &&
      semiWant.except(semiGot).count() === 0)
    val antiGot = BloomPrune.antiJoinPruned(big, keys, "k", "kk", 1000L)
    val antiWant = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_anti")
    assert(antiGot.except(antiWant).count() === 0 &&
      antiWant.except(antiGot).count() === 0)
  }

  test("bloom-pruned joins handle String keys and null keys exactly") {
    import spark.implicits._
    val big = ((0 until 500).map(i => (s"u$i", i)) :+ (null.asInstanceOf[String], -1))
      .toDF("k", "payload")
    val keys = (0 until 500 by 3).map(i => Tuple1(s"u$i")).toDF("kk")
    val semiGot = BloomPrune.semiJoinPruned(big, keys, "k", "kk", 500L)
    val semiWant = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_semi")
    assert(semiGot.except(semiWant).count() === 0 &&
      semiWant.except(semiGot).count() === 0)
    val antiGot = BloomPrune.antiJoinPruned(big, keys, "k", "kk", 500L)
    val antiWant = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_anti")
    // null-keyed row never equi-matches: dropped by semi, kept by anti
    assert(antiGot.filter(col("k").isNull).count() === 1)
    assert(antiGot.except(antiWant).count() === 0 &&
      antiWant.except(antiGot).count() === 0)
  }

  test("chunkLayout matches the single-partition-window reference layout") {
    import spark.implicits._
    // ragged doc lengths, ids deliberately non-contiguous, a zero-length
    // doc planted every 97th (empty docs must hold the cumsum, not break
    // it); second fixture has FEWER docs than shuffle partitions (empty
    // range partitions in the offsets side)
    val big = (0L until 537L).map(i =>
      (i * 3 + (i % 2), if (i % 97 == 0) 0L else 1L + (i * 2654435761L % 7)))
    val tiny = (0L until 3L).map(i => (i * 5, 2L + i))
    for ((rows, batches) <- Seq(
        (big, Seq(1, 7, 50, 1000)), (tiny, Seq(1, 2, 10)))) {
      val lens = rows.toDF("doc_id", "len")
      for (batch <- batches) {
        val got = graft.index.ChunkLayout.chunkLayout(lens, batch)
          .select("doc_id", "doc_seq", "chunk_id", "doc_offset", "token_start")
        val w = Window.orderBy("doc_id")
        val want = lens
          .withColumn("doc_seq", row_number().over(w).cast("long") - 1)
          .withColumn("chunk_id", expr(s"doc_seq DIV $batch"))
          .withColumn("gsum", coalesce(sum("len").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("doc_offset", col("doc_seq") % batch)
          .withColumn("token_start",
            col("gsum") - min("gsum").over(Window.partitionBy("chunk_id")))
          .select("doc_id", "doc_seq", "chunk_id", "doc_offset", "token_start")
        assert(got.except(want).count() === 0 && want.except(got).count() === 0,
          s"chunk layout mismatch at batch=$batch n=${rows.length}")
      }
    }
    val lens = big.toDF("doc_id", "len")
    // invariants: every chunk except the last holds exactly batch docs,
    // and token_start is the contiguous cumsum within each chunk
    val out = graft.index.ChunkLayout.chunkLayout(lens, 50).cache()
    val sizes = out.groupBy("chunk_id").count().orderBy("chunk_id").collect()
    assert(sizes.dropRight(1).forall(_.getLong(1) === 50L))
    val perChunk = out.groupBy("chunk_id")
      .agg(sum("len").as("toks"), max(col("token_start") + col("len")).as("hi"),
        min("token_start").as("lo"))
    assert(perChunk.filter(col("lo") =!= 0L || col("hi") =!= col("toks")).count() === 0)
    out.unpersist()
  }

  test("chunkLayout survives a downstream coalesce(1) (the Verify dump shape)") {
    import spark.implicits._
    // regression: a coalesce merges several range partitions into one
    // task that runs the local-rank closure once per PARENT partition; a
    // TaskContext-derived pid stamps them all with the task id while the
    // rank resets, silently zeroing the global offsets (caught by the b9
    // gate under Verify's coalesce(1) parquet dump)
    val lens = (0L until 537L).map(i => (i, 1L + (i * 2654435761L % 7)))
      .toDF("doc_id", "len")
    val direct = graft.index.ChunkLayout.chunkLayout(lens, 16)
      .select("doc_id", "doc_seq", "chunk_id", "doc_offset", "token_start")
    val coalesced = graft.index.ChunkLayout.chunkLayout(lens, 16).coalesce(1)
      .select("doc_id", "doc_seq", "chunk_id", "doc_offset", "token_start")
    assert(coalesced.except(direct).count() === 0 &&
      direct.except(coalesced).count() === 0)
    // doc_seq must be the contiguous 0..N-1 sequence even under coalesce
    assert(coalesced.agg(max("doc_seq")).head().getLong(0) === 536L)
    assert(coalesced.select("doc_seq").distinct().count() === 537L)
  }

  test("writeChunked produces one bounded self-contained directory per chunk") {
    import spark.implicits._
    val rows = (0L until 537L).map(i => (i, s"payload$i")).toDF("doc_id", "v")
    val lens = rows.select(col("doc_id"), lit(3L).as("len"))
    val layout = graft.index.ChunkLayout.chunkLayout(lens, 50)
    val path = "/tmp/graft_chunk_write_spec"
    graft.util.Fs.deleteRecursively(path)
    val n = graft.index.ChunkLayout.writeChunked(rows, layout, path)
    assert(n === 11) // ceil(537/50)
    val back = spark.read.parquet(path)
    assert(back.count() === 537)
    // every chunk holds <= batch docs, exactly batch except the last
    val sizes = back.groupBy("chunk_id").agg(countDistinct("doc_id").as("n"))
    assert(sizes.filter(col("n") > 50).count() === 0)
    assert(sizes.filter(col("n") === 50).count() === 10)
    // round-trip identity of the payload
    assert(back.select("doc_id", "v").except(rows).count() === 0 &&
      rows.except(back.select("doc_id", "v")).count() === 0)
    // one writer per chunk: each chunk directory holds a single parquet part
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("chunk_id="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(parts.length === 11 && parts.forall(_ === 1),
      s"expected 1 part file per chunk dir, got ${parts.mkString(",")}")
    graft.util.Fs.deleteRecursively(path)
  }
}
