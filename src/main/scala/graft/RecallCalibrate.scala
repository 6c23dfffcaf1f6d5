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

    // the full serving-parameter curve (r15 verdict item 5): nProbe
    // sweep at the default 0.4 threshold, the threshold's own effect,
    // and the exhaustive point (all centroids, no threshold, cut wide)
    // which must reach recall = 1.0 — asserted in RecallSpec
    val nQ = 200
    val sets = Seq(
      "probe=1" -> SearchParams(nIvfProbe = 1),
      "probe=2" -> SearchParams(nIvfProbe = 2),
      "probe=4" -> SearchParams(nIvfProbe = 4),
      "default(probe=8,thr=0.4)" -> SearchParams(),
      "probe=16" -> SearchParams(nIvfProbe = 16),
      "probe=32" -> SearchParams(nIvfProbe = 32),
      "probe=64" -> SearchParams(nIvfProbe = 64),
      "thr=0.6" -> SearchParams(centroidScoreThreshold = Some(0.6f)),
      "full(all-cent,no-thr)" -> SearchParams(nIvfProbe = Int.MaxValue,
        nFullScores = 1 << 22, centroidScoreThreshold = None))
    val results = RecallHarness.hardQualityTimed(
      spark, "/tmp/graft_recall_calibrate", numDocs, nQ, sets.map(_._2))
    println(s"RECALL_CALIBRATE docs=$numDocs queries=$nQ")
    sets.zip(results).foreach { case ((name, _), (r, n, sec)) =>
      println(f"RECALL_CALIBRATE $name%-26s recall@10=$r%.4f ndcg@10=$n%.4f " +
        f"sec=$sec%.2f qps=${nQ / sec}%.1f")
    }
    spark.stop()
  }
}
