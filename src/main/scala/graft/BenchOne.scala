package graft

import org.apache.spark.sql.SparkSession

/** Isolated single-query bench: runs ONE named query from
  * [[SparkEntry.queries]] `reps` times in this JVM and prints each
  * time plus the best — the drift-triage method from the round-8
  * verdict (suite-interference vs real plan regression can only be
  * told apart by a fresh-JVM isolated measurement).
  *
  * Usage: sbt "runMain graft.BenchOne <query> [reps]"
  * (SPARK_GRAFT_SF_DIR selects the data, default sf0.1)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // 10 MB default is sized for small executors; at local[32]/128 GiB a
      // 64 MB broadcast beats shuffling a 10^8-row probe side (and AQE
      // still falls back from stats at runtime)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench so times are comparable to a bench line-item
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(100L).write.mode("overwrite").parquet("/tmp/graft_bench_warmup")

    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"BENCH_ONE $name reps=$reps times=${times.map(t => f"$t%.2f").mkString(",")} best=${times.min}%.3f sf=$sfDir")
    spark.stop()
  }
}
