package graft

import org.apache.spark.sql.SparkSession

import graft.search.{RecallHarness, SearchParams}

/** Calibration driver for the hard retrieval-quality gate: builds the
  * hard corpus once and prints (recall@10, NDCG@10) for the default
  * pruned parameters plus degraded settings, so the stored baseline in
  * [[RecallHarness.HardNdcgBaseline]] is a measured number and the
  * degraded rows document the gate's dynamic range (a gate that cannot
  * fail detects nothing — round-8 verdict #1).
  *
  * Usage: sbt "runMain graft.RecallCalibrate [numDocs]"
  */
object RecallCalibrate {
  def main(args: Array[String]): Unit = {
    val numDocs = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sets = Seq(
      "default(probe=8,thr=0.4)" -> SearchParams(),
      "probe=1" -> SearchParams(nIvfProbe = 1),
      "probe=2" -> SearchParams(nIvfProbe = 2),
      "probe=16" -> SearchParams(nIvfProbe = 16),
      "thr=0.6" -> SearchParams(centroidScoreThreshold = Some(0.6f)))
    val results = RecallHarness.hardQuality(
      spark, "/tmp/graft_recall_calibrate", numDocs, 200, sets.map(_._2))
    println(s"RECALL_CALIBRATE docs=$numDocs")
    sets.zip(results).foreach { case ((name, _), (r, n)) =>
      println(f"RECALL_CALIBRATE $name%-24s recall@10=$r%.4f ndcg@10=$n%.4f")
    }
    spark.stop()
  }
}
