package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{MultiVectorIndex, UpdateConfig}
import graft.search.{SearchParams, Searcher}
import graft.streaming.StreamingIngest

/** Structured Streaming ingestion: micro-batches flow through the U1
  * dispatcher; windowed aggregation with watermark compiles to a valid
  * streaming plan. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val docs: DataFrame = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") / 5).cast("long").as("doc_id"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (d, v, e) => (d, v, graft.core.MaxSim.l2Normalize(e)) }
      .toDF("doc_id", "vec_id", "embedding")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x.getField("embedding")).as("embeddings"))
  }

  test("streamed micro-batches build the same searchable index via the dispatcher") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val path = "/tmp/graft_stream_idx"
    val ckpt = "/tmp/graft_stream_ckpt"
    graft.util.Fs.deleteRecursively(path)
    graft.util.Fs.deleteRecursively(ckpt)

    val rows = docs.filter(col("doc_id") < 30)
      .as[(Long, Array[Array[Float]])].collect().sortBy(_._1)
    val stream = MemoryStream[(Long, Array[Array[Float]])]
    // two micro-batches: docs 0..19, then 20..29 (local ids in each batch)
    stream.addData(rows.take(20).toSeq)
    val writer = StreamingIngest.indexSink(
      stream.toDF().toDF("doc_id", "embeddings"), path,
      UpdateConfig(), checkpoint = Some(ckpt))
    StreamingIngest.runOnce(writer)
    stream.addData(rows.drop(20).map { case (id, e) => (id - 20, e) }.toSeq)
    StreamingIngest.runOnce(StreamingIngest.indexSink(
      stream.toDF().toDF("doc_id", "embeddings"), path,
      UpdateConfig(), checkpoint = Some(ckpt)))

    val idx = new MultiVectorIndex(spark, path)
    assert(idx.numDocuments === 30L)
    // every doc searchable under its arrival-order id
    val qs = docs.filter(col("doc_id") === 25)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    val hit = new Searcher(idx).search(qs, SearchParams(
      topK = 1, nIvfProbe = Int.MaxValue, nFullScores = 1 << 22,
      centroidScoreThreshold = None)).collect()
    assert(hit.head.getAs[Long]("doc_id") === 25L)
  }

  test("replayed micro-batches are skipped (at-least-once -> effectively-once)") {
    import graft.index.UpdateConfig
    import graft.streaming.StreamingIngest
    val path = "/tmp/graft_stream_idem"
    graft.util.Fs.deleteRecursively(path)
    val cfg = UpdateConfig(startFromScratch = 0, bufferSize = 1000)

    val b0 = docs.filter(col("doc_id") < 10)
    val b1 = docs.filter(col("doc_id") >= 10 && col("doc_id") < 15)
      .withColumn("doc_id", col("doc_id") - 10)

    assert(StreamingIngest.applyBatch(b0, 0L, path, cfg))
    val n0 = new graft.index.MultiVectorIndex(spark, path).numDocuments
    assert(n0 === 10L)
    assert(StreamingIngest.lastAppliedBatchId(path) === Some(0L))

    // replay of batch 0 (foreachBatch at-least-once): must be a no-op
    assert(!StreamingIngest.applyBatch(b0, 0L, path, cfg))
    assert(new graft.index.MultiVectorIndex(spark, path).numDocuments === 10L)

    // next batch applies normally
    assert(StreamingIngest.applyBatch(b1, 1L, path, cfg))
    assert(new graft.index.MultiVectorIndex(spark, path).numDocuments === 15L)
    assert(StreamingIngest.lastAppliedBatchId(path) === Some(1L))

    // a crash between marker and record must fail loudly on replay, not
    // double-append
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/stream_inflight"), "2")
    assertThrows[IllegalStateException](StreamingIngest.applyBatch(b1, 2L, path, cfg))
    graft.util.Fs.deleteRecursively(s"$path/stream_inflight")

    // crash AFTER the manifest record but BEFORE marker removal: replay
    // of the recorded batch skips AND self-heals the stale marker, so
    // the following batch is not poisoned
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/stream_inflight"), "1")
    assert(!StreamingIngest.applyBatch(b1, 1L, path, cfg))
    assert(!graft.util.Fs.exists(s"$path/stream_inflight"))
    val b2 = docs.filter(col("doc_id") >= 15 && col("doc_id") < 18)
      .withColumn("doc_id", col("doc_id") - 15)
    assert(StreamingIngest.applyBatch(b2, 2L, path, cfg))
    assert(new graft.index.MultiVectorIndex(spark, path).numDocuments === 18L)

    // a CORRUPT marker (unparsable batchId) must not NFE in the skip
    // path: the replay of a recorded batch still skips, the marker stays
    // put, and the next unapplied batch fails loudly with the
    // descriptive recovery guidance
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/stream_inflight"), "not-a-number")
    assert(!StreamingIngest.applyBatch(b2, 2L, path, cfg))
    assert(graft.util.Fs.exists(s"$path/stream_inflight"))
    val b3 = docs.filter(col("doc_id") >= 18 && col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") - 18)
    assertThrows[IllegalStateException](StreamingIngest.applyBatch(b3, 3L, path, cfg))
    graft.util.Fs.deleteRecursively(s"$path/stream_inflight")
  }

  test("streaming exact dedup passes only the first-seen text across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingDedup.firstSeen(
      stream.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", "/tmp/graft_sdedup_ckpt_" + System.nanoTime())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    stream.addData(Seq(
      (0L, "alpha beta"), (1L, "Alpha  Beta"), (2L, "unique one")))
    q.awaitTermination()
    // batch 2: a repeat of batch 1's text plus a new one
    stream.addData(Seq((3L, "ALPHA BETA"), (4L, "another text")))
    val q2 = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out2")
      .option("checkpointLocation", "/tmp/graft_sdedup_ckpt2_" + System.nanoTime())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val all = spark.table("dedup_out2").select("doc_id").collect().map(_.getLong(0)).toSet
    // fresh checkpoint replays everything: 0 wins over 1 and 3 (same
    // normalized text), 2 and 4 pass
    assert(all === Set(0L, 2L, 4L))
  }

  test("bounded-memory approximate dedup: duplicates always suppressed, novels pass") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // 64 KiB per bucket, 16 buckets: ~200 distinct docs -> FP odds ~0
    val out = graft.streaming.StreamingDedup.firstSeenApprox(
      stream.toDF().toDF("doc_id", "text"),
      numBuckets = 16, bitsPerBucket = 1 << 19, numHashes = 7)
    stream.addData((0L until 100L).map(i => (i, s"document number $i")))
    // batch 2: 50 exact repeats (difformatted) + 50 novel
    stream.addData((0L until 50L).map(i => (1000L + i, s"  DOCUMENT   NUMBER $i ")) ++
      (0L until 50L).map(i => (2000L + i, s"fresh text $i")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bloom_out")
      .option("checkpointLocation", "/tmp/graft_bloom_ckpt_" + System.nanoTime())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bloom_out").select("doc_id").collect().map(_.getLong(0)).toSet
    // no false negatives: every re-formatted repeat is suppressed
    assert(got.intersect((1000L until 1050L).toSet).isEmpty)
    // at this filter size nothing novel should be lost either
    assert(got === ((0L until 100L) ++ (2000L until 2050L)).toSet)
  }

  test("streaming HLL: compacted change-log equals the batch sketch of everything seen") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[String]
    val out = graft.streaming.StreamingSketch.hllUpdates(
      stream.toDF().toDF("v"), "v", m = 64)
    // three batches with overlap: repeats must not re-emit
    stream.addData((0 until 500).map(i => s"u$i"))
    stream.addData((250 until 900).map(i => s"u$i"))
    stream.addData((0 until 100).map(i => s"u$i")) // pure repeats
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hll_out")
      .option("checkpointLocation", "/tmp/graft_shll_ckpt_" + System.nanoTime())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val log = spark.table("hll_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // compact: max emitted register per bucket (emission is monotone so
    // max == last), absent buckets = 0
    val compacted = (0L until 64L).map(b =>
      b -> log.filter(_._1 == b).map(_._2).maxOption.getOrElse(0L)).toMap
    val batch = graft.pipeline.Sketches.hllRegisters(
      (0 until 900).map(i => s"u$i").toDF("v"), "v", m = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compacted === batch,
      "streamed sketch must equal the batch sketch of the union")
    // rise-only change-log: a register value is never emitted twice for
    // the same bucket (collect order is arbitrary, so assert distinctness
    // — with max == batch register above, that pins strict monotonicity)
    log.groupBy(_._1).values.foreach { es =>
      val regs = es.map(_._2).toSeq
      assert(regs.distinct.size == regs.size, s"re-emitted register: $regs")
    }
  }

  test("streaming point-in-time enrichment: stream-static interval join on the scd2 dimension") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // batch as-of joins need a per-key ordered window (not streaming-
    // legal); the streaming equivalent is a stream-static INTERVAL join
    // against the scd2-built validity table — same point-in-time result
    val changes = Seq((1L, 10L, "bronze"), (1L, 20L, "silver"), (1L, 35L, "gold"))
      .toDF("key", "ts", "tier")
    val dim = graft.operators.TimeSeries.scd2(changes, Seq("key"), "ts")
    val stream = MemoryStream[(Long, Long, Long)]
    val probes = stream.toDF().toDF("pid", "key", "ts")
    val enriched = probes.join(dim,
      probes("key") === dim("key") && col("ts") >= col("valid_from") &&
        (col("ts") < col("valid_to") || col("valid_to").isNull),
      "left")
      .select(col("pid"), col("tier"))
    assert(enriched.isStreaming)
    stream.addData(Seq((100L, 1L, 25L), (101L, 1L, 5L), (102L, 1L, 99L)))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("pit_enrich")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("pit_enrich").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(100L) === Some("silver")) // mid-interval
    assert(got(101L) === None)           // before any change
    assert(got(102L) === Some("gold"))   // open current interval
  }

  test("localBandSigs is the byte-identical twin of the batch shingle->minhash->band pipeline") {
    import spark.implicits._
    val corpus = Seq(
      0L -> "spark joins tables with keys and hashes fast",
      1L -> "spark joins tables with keys and hashes quickly",
      2L -> "a completely different document about streaming state",
      3L -> "tiny",
      4L -> "spark joins tables with keys and hashes fast") // exact dup of 0
    val d = corpus.toDF("doc_id", "text")
    val batch = graft.pipeline.Dedup.lshBands(
      graft.pipeline.Dedup.minhashSignatures(
        graft.pipeline.Dedup.shingles(d, "doc_id", "text", 3), 8), 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Any]("band").toString.toLong,
        r.getAs[String]("band_sig"))).toSet
    // batch's `band` is `perm div rowsPerBand` (long via div); normalize
    val local = corpus.flatMap { case (id, t) =>
      graft.pipeline.Dedup.localBandSigs(t, 3, 8, 2)
        .map { case (band, sig) => (id, band.toLong, sig) }
    }.toSet
    assert(local === batch)
    assert(!local.exists(_._1 == 3L)) // sub-shingle doc yields no bands
  }

  test("streaming LSH candidates equal the batch operator on an uncapped corpus") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // planted near-dup families + noise, split across two micro-batches
    val corpus = (0L until 30L).map { i =>
      val fam = i % 10
      if (fam < 3) // three 3-doc near-dup families (i, i+10, i+20 share text)
        i -> s"family $fam shares this exact long sentence about spark shuffles and state stores verbatim"
      else
        i -> s"noise document $i with its own words ${(i * 7) % 97} ${(i * 13) % 89} nothing shared here"
    }
    val stream = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingDedup.lshCandidates(
      stream.toDF().toDF("doc_id", "text"))
    val ckpt = "/tmp/graft_slsh_ckpt_" + System.nanoTime()
    stream.addData(corpus.take(15))
    stream.addData(corpus.drop(15))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("slsh_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("slsh_out").select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = graft.pipeline.Dedup.shingles(corpus.toDF("doc_id", "text"), "doc_id", "text", 3)
    val batch = graft.pipeline.Dedup.candidatePairs(
      graft.pipeline.Dedup.lshBands(
        graft.pipeline.Dedup.minhashSignatures(sh, 8), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    // the families must actually be in there (the test isn't vacuous)
    assert(batch.contains((0L, 10L)) && batch.contains((10L, 20L)))
  }

  test("stateless pipeline projections (Gopher rules, PII scrub) run unchanged on streams") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (0L, ("the be to of and that have with normal words " * 6).trim),
      (1L, "short"),
      (2L, "mail me at a.b@example.com or 10.0.0.1 works too " * 5))
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    // the SAME operator code compiles to a streaming plan — zero changes
    val g = graft.pipeline.TextStats.gopherRules(sdf, "doc_id", "text")
    val s = graft.pipeline.Scrub.scrubPii(sdf, "doc_id", "text")
    val bl = graft.pipeline.TextStats.blocklistFilter(sdf, "doc_id", "text",
      Seq("short", "normal"))
    assert(g.isStreaming && s.isStreaming && bl.isStreaming)
    stream.addData(rows)
    for ((df, name) <- Seq(g -> "gopher_stream", s -> "scrub_stream", bl -> "bl_stream")) {
      val q = df.writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val batchDf = rows.toDF("doc_id", "text")
    // per-row results are identical to the batch twin
    val gb = graft.pipeline.TextStats.gopherRules(batchDf, "doc_id", "text")
    assert(spark.table("gopher_stream").collect().map(_.toString).sorted
      .sameElements(gb.collect().map(_.toString).sorted))
    val sb = graft.pipeline.Scrub.scrubPii(batchDf, "doc_id", "text")
    assert(spark.table("scrub_stream").collect().map(_.toString).sorted
      .sameElements(sb.collect().map(_.toString).sorted))
    val blb = graft.pipeline.TextStats.blocklistFilter(batchDf, "doc_id", "text",
      Seq("short", "normal"))
    assert(spark.table("bl_stream").collect().map(_.toString).sorted
      .sameElements(blb.collect().map(_.toString).sorted))
  }

  test("perplexity scoring against a static LM is batch-boundary invariant on streams") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // fit the LM once on a reference corpus (the CCNet deployment shape)
    val ref = Seq(
      (100L, "the cat sat on the mat"), (101L, "the dog sat on the mat"),
      (102L, "the cat sat on the rug")).toDF("doc_id", "text")
    val lm = graft.pipeline.TextStats.unigramLm(ref, "doc_id", "text").cache()
    val rows = Seq(
      (0L, "the cat sat"), (1L, "qqq www eee"), (2L, "the dog on the rug"),
      (3L, ""), (4L, "mat mat mat the"))
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val ckpt = "/tmp/graft_stream_ppl_ckpt"
    graft.util.Fs.deleteRecursively(ckpt)
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.pipeline.TextStats
          .perplexityScoreWithLm(batch, "doc_id", "text", lm)
          .collect().map(_.toString)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // two micro-batches split mid-corpus: per-doc scores depend only on
    // (doc, LM), so the split must not change a single row
    stream.addData(rows.take(2)); val q1 = q.start(); q1.awaitTermination()
    stream.addData(rows.drop(2)); val q2 = q.start(); q2.awaitTermination()
    val batchTwin = graft.pipeline.TextStats
      .perplexityScoreWithLm(rows.toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().map(_.toString)
    assert(got.sorted.sameElements(batchTwin.sorted))
    lm.unpersist()
  }

  test("per-batch incremental near-dedup over an accumulating corpus replays the batch pair set") {
    import spark.implicits._
    // the foreachBatch ingest shape: batch i dedups against everything
    // already ingested, then joins the corpus — a pair is emitted exactly
    // once, when its LATER member arrives
    val rnd = new scala.util.Random(11)
    def mutate(base: Seq[String]): String = {
      val a = base.toArray
      a(rnd.nextInt(a.length)) = s"w${rnd.nextInt(50)}"
      a.mkString(" ")
    }
    val fams = (0 until 5).map(f => Seq.fill(25)(s"tok${rnd.nextInt(30)}f$f"))
    // 3 micro-batches; each family contributes one member per batch
    val batches = (0 until 3).map { b =>
      fams.zipWithIndex.map { case (base, f) => (f * 10L + b, mutate(base)) } ++
        Seq((100L + b, Seq.fill(25)(s"u${rnd.nextInt(9999)}b$b").mkString(" ")))
    }
    var corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emitted = scala.collection.mutable.Set.empty[(Long, Long)]
    batches.foreach { rows =>
      val incoming = rows.toDF("doc_id", "text")
      if (corpus.isEmpty) {
        emitted ++= graft.pipeline.Dedup.minhashDedupPairs(incoming, "doc_id", "text",
            shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.3)
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      } else {
        emitted ++= graft.pipeline.Dedup.incrementalDedupPairs(corpus, incoming, "doc_id", "text",
            shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.3)
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      corpus = corpus.union(incoming)
    }
    val batchAll = graft.pipeline.Dedup.minhashDedupPairs(corpus, "doc_id", "text",
        shingleSize = 3, numPerm = 16, rowsPerBand = 4, minJaccard = 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted.toSet === batchAll,
      "cumulative per-batch pairs must equal the one-shot batch pair set")
    assert(batchAll.nonEmpty, "planted families must collide")
  }

  test("stream-stream time-range join: the e_multi_touch window shape, streaming-native") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // batch IntervalJoin's bucketed explode is not needed in streaming:
    // Structured Streaming plans a watermarked time-range condition as a
    // stream-stream join with bounded state — the idiomatic counterpart
    // of pointInInterval (same contract scd2's interval join spec pins
    // for the batch side)
    val clickS = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val buyS = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clicks = clickS.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "1 hour")
    val buys = buyS.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "1 hour")
    val joined = buys.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("c_ts") <= col("p_ts"))
    assert(joined.isStreaming)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two clicks inside the window, one ancient click outside;
    // user 2: purchase with no clicks → no row (inner join)
    clickS.addData(Seq(
      (ts("2026-01-01 09:00:00"), 1L, 100L),
      (ts("2026-01-01 18:00:00"), 1L, 101L),
      (ts("2025-12-25 09:00:00"), 1L, 102L)))
    buyS.addData(Seq(
      (ts("2026-01-02 08:00:00"), 1L, 500L),
      (ts("2026-01-02 08:00:00"), 2L, 501L)))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", "/tmp/graft_ssj_ckpt_" + System.nanoTime())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((500L, 100L), (500L, 101L)),
      s"stream-stream range join produced $got")
  }

  test("stream-stream range join keeps BOUNDED state under a tight watermark (eviction + late drop)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // join window 24h, watermark 1h: state must hold ~one window of
    // rows per side, NOT the whole history — the production-scale
    // contract the st_range_join gate's 90-day gate-parity watermark
    // deliberately suspends (update.rs:75-108 is the reference's
    // bounded-buffer analogue)
    val clickS = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val buyS = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clicks = clickS.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "1 hour")
    val buys = buyS.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "1 hour")
    val joined = buys.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("c_ts") <= col("p_ts"))
      .select("purchase_id", "click_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_state_out")
      .option("checkpointLocation", "/tmp/graft_ssjst_ckpt_" + System.nanoTime())
      .start()
    val B = 200
    def day(d: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-$d%02d 10:${i % 60}%02d:00")
    def feed(d: Int): Unit = {
      clickS.addData((0 until B).map(i => (day(d, i), (i % 50).toLong, d * 1000L + i)))
      buyS.addData((0 until B).map(i => (day(d, i), (i % 50).toLong, d * 100000L + i)))
      q.processAllAvailable()
    }
    try {
      feed(1); feed(10); feed(20)
      // batch N evicts with the watermark derived from batch N-1, so
      // push one more tiny batch to apply day-20's watermark
      clickS.addData(Seq((day(21, 0), 999L, 1L)))
      buyS.addData(Seq((day(21, 0), 999L, 2L)))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      val fed = 3L * 2L * B + 2L
      // bounded: at most the last in-window day's rows (+ the probe
      // pair and eviction-lag slack), never the 1202-row history
      assert(stateRows <= 2L * B + 2L,
        s"state holds $stateRows rows — watermark eviction not bounding it")
      assert(stateRows < fed / 2,
        s"state ($stateRows) tracks history ($fed), not the window")
      // late row far behind the watermark joins nothing and adds no state
      val before = spark.table("ssj_state_out").count()
      clickS.addData(Seq((day(1, 1), 1L, 424242L)))
      q.processAllAvailable()
      val afterState = q.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(spark.table("ssj_state_out").count() === before,
        "a click 19 days behind the watermark produced output")
      assert(afterState <= stateRows,
        s"late row grew the state: $stateRows -> $afterState")
    } finally q.stop()
  }

  test("windowed aggregation with watermark is a valid streaming plan matching the batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = stream.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingIngest.windowedAgg(streamDf)
    assert(agg.isStreaming)

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:45:00")
    val t2 = java.sql.Timestamp.valueOf("2026-01-01 11:05:00")
    stream.addData(Seq((t0, "a", 1.0), (t1, "a", 2.0), (t2, "b", 5.0)))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("win_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("2026-01-01 10:00:00.0", "a", 2L, 3.0),
      ("2026-01-01 11:00:00.0", "b", 1L, 5.0)))
  }

  test("session windows: the st_session_agg shape runs as a watermarked stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sdf = stream.toDF().toDF("ts", "user_id", "value")
    // same aggregation as the batch gate query, made streaming-legal
    // with a watermark; sessions split only at STRICTLY > 30 min gaps
    // (an event exactly at the session end merges — pinned below)
    val agg = sdf.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"), col("value_cents"))
    assert(agg.isStreaming)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(Seq(
      (t("2026-01-01 10:00:00"), 1L, 1.25), // session A: 10:00 + 10:20
      (t("2026-01-01 10:20:00"), 1L, 2.50),
      (t("2026-01-01 10:50:00"), 1L, 4.00), // exactly at A's end -> MERGES
      (t("2026-01-01 11:20:01"), 1L, 0.75), // 1 s past the end -> new session
      (t("2026-01-01 10:05:00"), 2L, 8.00)))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_agg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sess_agg").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getLong(4))).toSet
    assert(out === Set(
      (1L, "2026-01-01 10:00:00.0", "2026-01-01 11:20:00.0", 3L, 775L),
      (1L, "2026-01-01 11:20:01.0", "2026-01-01 11:50:01.0", 1L, 75L),
      (2L, "2026-01-01 10:05:00.0", "2026-01-01 10:35:00.0", 1L, 800L)))
  }

  test("StreamingSketch: batch-merged state == whole-corpus sketch; replay is idempotent") {
    import spark.implicits._
    import graft.streaming.StreamingSketch
    val statePath = "/tmp/graft_sthist_spec"
    graft.util.Fs.deleteRecursively(statePath)
    val rnd = new scala.util.Random(17)
    val rows = (0 until 3000).map(i => (s"g${i % 3}", rnd.nextDouble() * 80))
    val parts = Seq(rows.slice(0, 1000), rows.slice(1000, 2000), rows.slice(2000, 3000))
    parts.zipWithIndex.foreach { case (p, i) =>
      StreamingSketch.mergeHistBatch(
        p.toDF("g", "v"), i.toLong, statePath, Seq("g"), "v", 0.0, 80.0, 32)
    }
    // replaying batch 1 must not change the final state chain
    StreamingSketch.mergeHistBatch(
      parts(1).toDF("g", "v"), 1L, statePath, Seq("g"), "v", 0.0, 80.0, 32)
    val got = StreamingSketch.currentState(spark, statePath).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = graft.pipeline.Sketches
      .histSketchBy(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 80.0, 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === want)
    assert(got.map(_._3).sum === 3000L)
  }
}
