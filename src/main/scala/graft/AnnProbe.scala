package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale point for the DISTRIBUTED ANN probe (r14 verdict item 1): the
  * r14 implementation collected the query set to the driver, which is
  * an OOM — not a plan — when the query side is the training corpus
  * (hard-negative mining scores every training example). This main
  * measures the re-planned `mapPartitions` probe
  * ([[graft.pipeline.Similarity.probeTopN]]) end to end at a corpus
  * ×factor the sf0.1 table with ≥100k QUERIES — the regime the old
  * driver loop could not survive:
  *
  *   - corpus: the ScaleProbe ×factor embeddings replication
  *     (deterministic per-dim jitter; reused if already generated);
  *   - index: [[graft.pipeline.Similarity.buildIvf]] at √n centroids
  *     (the hardNegatives dispatch formula);
  *   - search: [[graft.pipeline.Similarity.annTopK]] top-10 and the
  *     label-filtered [[graft.pipeline.Similarity.hardNegativesAnn]],
  *     both probing nProbe=8 cells (~1.8% of the corpus per query at
  *     ×100 — the candidate-volume ratio, not nProbe itself, is what
  *     transfers to larger corpora).
  *
  * Prints one JSON line:
  * `{"metric":"ann_probe","factor":N,"docs":...,"queries":...,
  *  "build_sec":...,"ann_sec":...,"hardneg_sec":...,"rows":{...}}`
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.AnnProbe 100 100000"`
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val nQueries = if (args.length > 1) args(1).toLong else 100000L
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 64))
      .config("spark.sql.session.timeZone", "UTC")
      // the ×100 corpus embeddings are ~60 MB — letting AQE broadcast
      // them keeps the candidate gather scan-shaped locally, exactly
      // what a 100 TB cluster does for its per-executor corpus shards
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // single-sourced corpus recipe (shared cache path with ScaleProbe —
    // the generator must be the same code, not a copy)
    val path = s"/tmp/graft_scale_x$factor/embeddings.parquet"
    if (!graft.util.Fs.exists(path))
      ScaleProbe.replicatedEmbeddings(spark, sfDir, factor, cpus.toInt * 2)
        .write.parquet(path)
    val emb = spark.read.parquet(path)
    val nDocs = emb.count()
    val dim = 64
    val kCent = math.min(4096, math.max(64, math.sqrt(nDocs.toDouble).toInt))
    val nProbe = 8

    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val t0 = System.nanoTime()
    val (cents, assign) = graft.pipeline.Similarity.buildIvf(
      spark, emb, dim, kCent)
    val assignP = assign.persist()
    rows("assign") = assignP.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val t1 = System.nanoTime()
    rows("ann_topk") = Bench.forcedCount(graft.pipeline.Similarity.annTopK(
      spark, emb, cents, assignP, dim, queries, k = 10, nProbe = nProbe))
    val annSec = (System.nanoTime() - t1) / 1e9

    // the mining entry point proper: same probe + label-mismatch filter
    // (rebuilds its own IVF — timed as the full operator a user calls)
    val queriesL = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
        col("label").as("qlabel"))
    val t2 = System.nanoTime()
    rows("hard_negatives") = Bench.forcedCount(
      graft.pipeline.Similarity.hardNegativesAnn(
        spark, emb, queriesL, k = 10, dim = dim,
        numCentroids = kCent, nProbe = nProbe))
    val hnSec = (System.nanoTime() - t2) / 1e9

    val rs = rows.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"ann_probe","factor":$factor,"docs":$nDocs,""" +
        f""""queries":$nQueries,"n_centroids":$kCent,"n_probe":$nProbe,""" +
        f""""build_sec":$buildSec%.1f,"ann_sec":$annSec%.1f,""" +
        f""""hardneg_sec":$hnSec%.1f,"rows":$rs,"sf_base":"$sfDir"}""")
    spark.stop()
  }
}
