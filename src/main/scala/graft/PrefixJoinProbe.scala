package graft

import org.apache.spark.sql.SparkSession

/** ×N timing for the EXACT set-similarity self-join
  * (`Dedup.prefixFilterPairs`) — the r16 triage found the exact path at
  * 342 s vs LSH's 22.5 s at ×100 because only the prefix filter of the
  * PPJoin family was implemented; this probe records the effect of the
  * r17 positional + index-prefix filters. The pair multiset is the
  * correctness contract: count AND bit_xor content hash ride the
  * record, and any change there would also flip the `p_prefix_join`
  * gate and the brute-force spec.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.PrefixJoinProbe 100"`
  * (expects /tmp/graft_scale_x<factor>/documents.parquet from ScaleProbe).
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
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
    val docs = spark.read.parquet(s"$base/documents.parquet")

    val t0 = System.nanoTime()
    val (nPairs, hPairs) = Bench.forcedCountHash(
      graft.pipeline.Dedup.prefixFilterPairs(
        docs, "doc_id", "text", shingleSize = 3, minJaccard = 0.5))
    val sec = (System.nanoTime() - t0) / 1e9

    val calibPost = Bench.calibrate(spark)
    println(
      f"""{"metric":"prefix_join_probe","factor":$factor,""" +
        f""""pairs":$nPairs,"pairs_hash":$hPairs,"sec":$sec%.1f,""" +
        Bench.calibJson(calibPre, calibPost) + s""","sf_base":"$sfDir"}""")
    spark.stop()
  }
}
