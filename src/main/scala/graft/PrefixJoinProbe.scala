package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ×N timing for the EXACT set-similarity self-join
  * (`Dedup.prefixFilterPairs`) — the r16 triage found the exact path at
  * 342 s vs LSH's 22.5 s at ×100 because only the prefix filter of the
  * PPJoin family was implemented; this probe records the effect of the
  * r17 positional + index-prefix filters. The pair multiset is the
  * correctness contract: count AND bit_xor content hash ride the
  * record, and any change there would also flip the `p_prefix_join`
  * gate and the brute-force spec.
  *
  * Second arg `dedup` runs the operator in its DEPLOYED position —
  * after exact dedup (the pl_e2e/PipelineScaleProbe stage order). The
  * raw form at ×1000 is disk-infeasible BY THE PROBLEM'S SHAPE, not
  * the plan's: the ScaleProbe corpus carries corpus-scaled exact
  * mirror families (~1000 copies at ×1000), identical docs have
  * identical prefixes, so every family is one giant join bucket and
  * the TRUE all-pairs output itself is quadratic in family size
  * (measured: the ×1000 raw run aborted at >74 GB of shuffle spill).
  * Exact dedup first collapses each family to one member, after which
  * within-family pairs are recoverable by closure over the dedup
  * groups — the correct decomposition at any scale.
  *
  * Third mode `atscale` runs `Dedup.prefixFilterPairsAtScale` — the
  * r18 first-class operator form of the dedup-first decomposition,
  * which additionally reconstitutes the within-family closure pairs
  * the hand-composition (`dedup` mode) leaves implicit, so its pair
  * count is the TRUE raw-form multiset (quadratic per mirror family —
  * ~C(100,2) per base doc at ×1000) where `dedup` mode records only
  * the representative pairs.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.PrefixJoinProbe 100"`
  * (expects /tmp/graft_scale_x<factor>/documents.parquet from ScaleProbe).
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val mode = if (args.length > 1) args(1) else "raw"
    val dedupFirst = mode == "dedup"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 64))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibPre = Bench.calibrate(spark)

    val base = s"/tmp/graft_scale_x$factor"
    if (!graft.util.Fs.exists(s"$base/documents.parquet"))
      ScaleProbe.replicatedDocuments(spark, sfDir, factor, cpus.toInt * 2)
        .write.parquet(s"$base/documents.parquet")
    val raw = spark.read.parquet(s"$base/documents.parquet")
    val nRaw = raw.count()
    val t0 = System.nanoTime()
    val (docs, nDocs) =
      if (!dedupFirst) (raw, nRaw)
      else {
        val keep = graft.pipeline.Dedup.exactDedup(raw, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val d = raw.join(keep, Seq("doc_id"), "left_semi").persist()
        (d, d.count())
      }
    val dedupSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val pairsDf =
      if (mode == "atscale")
        graft.pipeline.Dedup.prefixFilterPairsAtScale(
          docs, "doc_id", "text", shingleSize = 3, minJaccard = 0.5)
      else
        graft.pipeline.Dedup.prefixFilterPairs(
          docs, "doc_id", "text", shingleSize = 3, minJaccard = 0.5)
    val (nPairs, hPairs) = Bench.forcedCountHash(pairsDf)
    val sec = (System.nanoTime() - t1) / 1e9

    val calibPost = Bench.calibrate(spark)
    println(
      f"""{"metric":"prefix_join_probe","factor":$factor,"mode":"$mode",""" +
        f""""dedup_first":$dedupFirst,"docs_raw":$nRaw,"docs_in":$nDocs,""" +
        f""""dedup_sec":$dedupSec%.1f,""" +
        f""""pairs":$nPairs,"pairs_hash":$hPairs,"sec":$sec%.1f,""" +
        Bench.calibJson(calibPre, calibPost) + s""","sf_base":"$sfDir"}""")
    spark.stop()
  }
}
