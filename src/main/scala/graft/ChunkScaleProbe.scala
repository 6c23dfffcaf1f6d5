package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale point for the B9 chunk layout (`index/ChunkLayout`): the
  * operator's cost model is one range shuffle of the doclens table plus
  * bounded sides, so the probe runs it at real doclens cardinality —
  * default 100M docs (the doclens table of a ~100 TB corpus at ~1 MB/doc)
  * with ragged deterministic lengths — and verifies the invariants with
  * aggregations only (nothing collects beyond a handful of scalars):
  * contiguous 0..N-1 doc_seq, every chunk exactly batchSize docs except
  * the last, per-chunk token_start cumsum closed under sum(len).
  *
  * Usage: `sbt "runMain graft.ChunkScaleProbe [numDocs] [batchSize]"`
  * Prints one JSON line `{"metric":"chunk_scale","docs":N,...}`.
  */
object ChunkScaleProbe {
  def main(args: Array[String]): Unit = {
    val numDocs = if (args.length > 0) args(0).toLong else 100000000L
    val batch = if (args.length > 1) args(1).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibPre = Bench.calibrate(spark)

    // ragged lens 1..96, skewed-ish via a hash mix; doc ids NON-contiguous
    // (×3 + parity) so the rank is doing real work, not an identity
    val lens = spark.range(numDocs)
      .select((col("id") * 3 + col("id") % 2).as("doc_id"),
        (abs(xxhash64(col("id"))) % 96 + 1).as("len"))

    val t0 = System.nanoTime()
    val out = graft.index.ChunkLayout.chunkLayout(lens, batch)
    val agg = out.agg(
      count(lit(1)).as("n"),
      max("doc_seq").as("max_seq"),
      countDistinct("doc_seq").as("n_seq"),
      countDistinct("chunk_id").as("n_chunks"),
      sum("len").as("total_tokens")).head()
    val perChunkBad = out.groupBy("chunk_id")
      .agg(count(lit(1)).as("docs"), sum("len").as("toks"),
        min("token_start").as("lo"),
        max(col("token_start") + col("len")).as("hi"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("toks") ||
        (col("docs") =!= batch && col("chunk_id") =!= (numDocs - 1) / batch))
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    val n = agg.getLong(0)
    val ok = n == numDocs && agg.getLong(1) == numDocs - 1 &&
      agg.getLong(2) == numDocs && perChunkBad == 0L

    // optional arg 3 "write": the PHYSICAL bounded-chunk write
    // (ChunkLayout.writeChunked) over the same rows — one directory per
    // chunk, one part file each, verified by directory census
    val writeField = if (args.length > 2 && args(2) == "write") {
      val outPath = "/tmp/graft_chunk_probe_write"
      graft.util.Fs.deleteRecursively(outPath)
      val tw0 = System.nanoTime()
      val nChunks = graft.index.ChunkLayout.writeChunked(
        lens, graft.index.ChunkLayout.chunkLayout(lens, batch), outPath)
      val wSec = (System.nanoTime() - tw0) / 1e9
      val dirs = new java.io.File(outPath).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("chunk_id="))
      val nBack = spark.read.parquet(outPath).count()
      s""","write_sec":${math.round(wSec * 10) / 10.0},"write_chunks":$nChunks,""" +
        s""""write_dirs":$dirs,"write_rows":$nBack"""
    } else ""
    val calibPost = Bench.calibrate(spark)
    println(s"""{"metric":"chunk_scale","docs":$numDocs,"batch":$batch,""" +
      s""""chunks":${agg.getLong(3)},"total_tokens":${agg.getLong(4)},""" +
      s""""sec":${math.round(sec * 10) / 10.0},"invariants_ok":$ok$writeField,""" +
      Bench.calibJson(calibPre, calibPost) + "}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
