package graft

import org.apache.spark.sql.SparkSession

/** Full pipeline-family scale sweep (r18 verdict item 4): run EVERY
  * `p_*` and `st_*` gate from [[SparkEntry.queries]] — the UNCHANGED
  * gate code — against the ×factor replicated tables, recording per-
  * query wall, row count, and content hash ([[Bench.forcedCountHash]]:
  * rows + xxhash64 bit_xor). The headline ×100 sweep (ScaleProbe)
  * measures 12 representative queries; this turns the remaining
  * operators' "the plan is right" into "the plan ran", with hashes a
  * future round can diff for bit-stability.
  *
  * Table generation is [[ScaleProbe.generateTables]] — the single-
  * sourced replication recipes — cached under /tmp per factor.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.SweepProbe 100"`
  * (optional second arg: comma-separated query subset). Prints one
  * JSON line `{"metric":"sweep_probe","factor":N,"queries":{name:
  * {"sec":…,"rows":…,"hash":…}},"errors":{…},"calib":{…}}`. */
object SweepProbe {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = s"/tmp/graft_scale_x$factor"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 64))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibPre = Bench.calibrate(spark)

    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq
        .filter(k => k.startsWith("p_") || k.startsWith("st_")).sorted

    val genSec = ScaleProbe.generateTables(spark, sfDir, factor, base,
      Set("documents", "embeddings", "events", "lineitem", "orders",
        "customer", "supplier", "nation", "region", "part"))

    // same warm-up as Bench so first-query numbers are comparable
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(100L).write.mode("overwrite").parquet("/tmp/graft_bench_warmup")

    val recs = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long, Long)]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      try {
        val (rows, hash) = Bench.forcedCountHash(fn(spark, base))
        recs(name) = ((System.nanoTime() - t0) / 1e9, rows, hash)
        System.err.println(f"[sweep] $name%-24s ${recs(name)._1}%8.1fs rows=$rows")
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
          System.err.println(s"[sweep] $name ERROR ${errors(name)}")
      }
    }

    val qs = recs.map { case (k, (sec, rows, hash)) =>
      f""""$k":{"sec":$sec%.2f,"rows":$rows,"hash":$hash}"""
    }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val calibPost = Bench.calibrate(spark)
    val line =
      f"""{"metric":"sweep_probe","factor":$factor,"gen_sec":$genSec%.1f,""" +
        s""""queries":$qs,"errors":$es,""" +
        Bench.calibJson(calibPre, calibPost) + s""","sf_base":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
