package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Encode, EncoderPool, HashTokenEncoder, TokenEncoder}
import graft.search.SearchParams

/** E4 session-pool encode: chunk round-robin, per-session locking, strict
  * model-file selection, and the text-in → index → results-out path with
  * the deterministic stand-in encoder
  * (next-plaid-onnx/src/lib.rs:1562-1695). */
class EncoderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("hash encoder is deterministic, L2-normalized, dim-shaped") {
    val e = HashTokenEncoder(16)
    val a = e.encode(Seq("[D]", "spark", "joins"))
    val b = e.encode(Seq("[D]", "spark", "joins"))
    assert(a.length === 3 && a.forall(_.length === 16))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    for (row <- a) {
      val n = math.sqrt(row.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // different tokens -> different vectors
    assert(a(1).toSeq !== a(2).toSeq)
  }

  test("pool instantiates at most numSessions sessions and preserves chunk order") {
    val built = new AtomicInteger(0)
    val mk: () => TokenEncoder = () => { built.incrementAndGet(); HashTokenEncoder(4) }
    val chunks = (0 until 24).map(i => Seq(Seq(s"tok$i")))
    val out = EncoderPool.encodeChunks("spec_pool_3", mk, numSessions = 3, chunks)
    assert(EncoderPool.sessionCount("spec_pool_3") === 3)
    assert(built.get() === 3)
    // order-preserving reassembly: result i must be the encoding of tok_i
    val direct = HashTokenEncoder(4)
    out.zipWithIndex.foreach { case (emb, i) =>
      assert(emb.map(_.toSeq).toSeq === direct.encode(Seq(s"tok$i")).map(_.toSeq).toSeq)
    }
    // the pool is per-key: a second key builds its own sessions
    EncoderPool.encodeChunks("spec_pool_other", mk, 2, chunks.take(2))
    assert(built.get() === 5)
  }

  test("sessions are never used concurrently (the reference's Mutex<Session>)") {
    val inUse = new AtomicInteger(0)
    val maxConcurrentPerSession = new AtomicInteger(0)
    final class GuardedEncoder extends TokenEncoder {
      val dim = 4
      private val delegate = HashTokenEncoder(4)
      def encode(tokens: Seq[String]): Array[Array[Float]] = {
        val now = inUse.incrementAndGet()
        maxConcurrentPerSession.updateAndGet(m => math.max(m, now))
        try { Thread.sleep(1); delegate.encode(tokens) }
        finally inUse.decrementAndGet()
      }
    }
    // ONE session: even with many parallel chunks, the lock must serialize
    val chunks = (0 until 16).map(i => Seq(Seq(s"t$i")))
    EncoderPool.encodeChunks("spec_pool_1sess", () => new GuardedEncoder, 1, chunks)
    assert(maxConcurrentPerSession.get() === 1)
  }

  test("selectOnnxFile is strict both ways (lib.rs:1668-1695)") {
    val dir = Files.createTempDirectory("graft_model").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    // empty dir: both modes fail with mode-specific guidance
    assert(Encode.selectOnnxFile(d, quantized = false).isLeft)
    assert(Encode.selectOnnxFile(d, quantized = true).isLeft)
    Files.write(new java.io.File(dir, "model_int8.onnx").toPath, Array[Byte](1))
    // int8 present: quantized loads it, non-quantized must NOT fall back
    assert(Encode.selectOnnxFile(d, quantized = true)
      .toOption.get.getFileName.toString === "model_int8.onnx")
    assert(Encode.selectOnnxFile(d, quantized = false).isLeft)
    Files.write(new java.io.File(dir, "model.onnx").toPath, Array[Byte](1))
    assert(Encode.selectOnnxFile(d, quantized = false)
      .toOption.get.getFileName.toString === "model.onnx")
  }

  test("text-in results-out: encode documents + queries, self-search top-1") {
    import spark.implicits._
    val texts = Seq(
      0L -> "spark shuffles data between executors during wide transformations",
      1L -> "the quick brown fox jumps over the lazy dog repeatedly",
      2L -> "columnar parquet storage enables predicate pushdown and pruning",
      3L -> "streaming watermarks bound state for windowed aggregations")
    val docsDf = texts.toDF("doc_id", "text")
    val mk: () => TokenEncoder = () => HashTokenEncoder(16)
    val docEmb = Encode.documents(docsDf, "doc_id", "text", mk, "spec_e2e",
      documentLength = 32, batchSize = 2, numSessions = 2)
    // one row per doc, tokens = min([D]+words, 32), dim = 16
    val rows = docEmb.collect()
    assert(rows.length === 4)
    for (r <- rows) {
      val emb = r.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("embeddings")
      assert(emb.nonEmpty && emb.forall(_.length === 16))
    }
    // queries re-use the same texts: [Q]/[MASK] prep differs from [D] prep
    // but content tokens hash identically, so MaxSim must rank self first
    val qEmb = Encode.queries(docsDf.withColumnRenamed("doc_id", "query_id"),
      "query_id", "text", mk, "spec_e2e", queryLength = 16)
    val q = qEmb.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("embeddings").map(_.toArray).toArray).toMap
    val d = rows.map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("embeddings").map(_.toArray).toArray).toMap
    for (qid <- texts.map(_._1)) {
      val best = d.map { case (did, emb) =>
        did -> graft.core.MaxSim.score(q(qid), emb) }.maxBy(_._2)
      assert(best._1 === qid, s"query $qid should retrieve its own document")
    }
  }

  test("API with_encoding routes: text-only create, search, rerank round-trip") {
    import spark.implicits._
    val texts = Seq(
      0L -> "spark shuffles data between executors during wide transformations",
      1L -> "the quick brown fox jumps over the lazy dog repeatedly",
      2L -> "columnar parquet storage enables predicate pushdown and pruning",
      3L -> "streaming watermarks bound state for windowed aggregations",
      4L -> "broadcast joins avoid shuffles when one side is small",
      5L -> "tokenizers split text into subword units for the encoder")
    val path = "/tmp/graft_enc_api"
    graft.util.Fs.deleteRecursively(path)
    val gi = GraftIndex.createWithEncoding(spark, path,
      texts.toDF("doc_id", "text"), encoderDim = 64)
    assert(gi.count === 6L)
    // text-in search: each doc's own text as query -> itself at rank 1
    val qdf = texts.toDF("query_id", "text")
    val hits = gi.searchWithEncoding(qdf,
        SearchParams(topK = 1, nIvfProbe = Int.MaxValue,
          nFullScores = 1 << 20, centroidScoreThreshold = None))
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("doc_id")).toMap
    texts.foreach { case (id, _) => assert(hits(id) === id, s"query $id") }
    // text-in add crosses nothing (no limit) and lands searchable
    gi.addDocumentsWithEncoding(
      Seq(0L -> "catalyst optimizes logical plans before execution").toDF("doc_id", "text"))
    assert(gi.count === 7L)
    // text-in rerank: both sides encoded from raw text
    val rr = gi.rerankWithEncoding(
      "spark shuffles data between executors during wide transformations",
      texts.toDF("doc_id", "text"), topK = 3).collect()
    assert(rr.nonEmpty && rr.head.getAs[Long]("doc_id") === 0L)
  }

  test("ward pooling hook: poolFactor shrinks token count per document") {
    import spark.implicits._
    val docsDf = Seq((0L, ("tok " * 24).trim)).toDF("doc_id", "text")
    val full = Encode.documents(docsDf, "doc_id", "text",
      () => HashTokenEncoder(8), "spec_pool_ward", documentLength = 32)
      .collect()(0).getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("embeddings")
    val pooled = Encode.documents(docsDf, "doc_id", "text",
      () => HashTokenEncoder(8), "spec_pool_ward", documentLength = 32,
      poolFactor = 2)
      .collect()(0).getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("embeddings")
    assert(full.length === 25) // [D] + 24 toks
    assert(pooled.length < full.length && pooled.nonEmpty)
  }
}
