package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{RecallHarness, SearchParams}

/** Retrieval-quality gate, hard mode: the pruned funnel (top_k=10,
  * n_ivf_probe=8, threshold=0.4 — search.rs:58-69) is measured against
  * brute force on a corpus designed to be genuinely lossy (overlapping
  * clusters + near-duplicate families), and gated on drift from a
  * STORED baseline — the Spark twin of the reference's stored SciFact
  * NDCG gate (Makefile `compare-scifact`,
  * docs/benchmarks/scifact_docker_benchmark.json). The previous
  * separable corpus saturated at recall = NDCG = 1.0 and could never
  * fail; this one proves it can by also measuring nIvfProbe=1, which
  * must land far below the gate window. */
class RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("hard corpus: default-params NDCG@10 within stored gate window; probe=1 fails it") {
    import RecallHarness._
    val Seq((recall, ndcg), (recall1, ndcg1)) = hardQuality(
      spark, "/tmp/graft_recall_idx", numDocs = 50000L,
      paramSets = Seq(SearchParams(), SearchParams(nIvfProbe = 1)))
    info(f"default: recall@10 = $recall%.4f, ndcg@10 = $ndcg%.4f (baseline $HardNdcgBaseline ± $HardGateDrift)")
    info(f"probe=1: recall@10 = $recall1%.4f, ndcg@10 = $ndcg1%.4f")
    // the gate itself: drift in either direction is a regression (upward
    // drift means the corpus or funnel changed and the stored baseline
    // is stale)
    assert(math.abs(ndcg - HardNdcgBaseline) <= HardGateDrift,
      f"hard ndcg@10 $ndcg%.4f drifted >±$HardGateDrift from stored baseline $HardNdcgBaseline")
    assert(math.abs(recall - HardRecallBaseline) <= 2 * HardGateDrift,
      f"hard recall@10 $recall%.4f drifted from stored baseline $HardRecallBaseline")
    // liveness proof: crippling the prober must land OUTSIDE the gate
    // window (i.e. the gate would catch it)
    assert(ndcg1 < HardNdcgBaseline - HardGateDrift,
      f"probe=1 ndcg@10 $ndcg1%.4f did not degrade — the gate is not sensitive to pruning")
  }

  test("recall-vs-nProbe curve is monotone-ish and exact at the exhaustive point") {
    import RecallHarness._
    // smaller corpus than the gate (spec budget); the curve SHAPE is
    // what's pinned — the committed 50k curve lives in SCALE.md via
    // RecallCalibrate. Strict per-step monotonicity is NOT guaranteed
    // mid-curve (a larger probe set can push a true hit below the
    // nFullScores cut on approx scores), so the assertion allows a
    // small epsilon per step; end-to-end the curve must rise, and the
    // exhaustive point (all centroids, no threshold, cut wider than
    // the corpus) must equal brute force exactly.
    val probes = Seq(
      SearchParams(nIvfProbe = 1),
      SearchParams(nIvfProbe = 4),
      SearchParams(), // probe=8 default
      SearchParams(nIvfProbe = 16),
      SearchParams(nIvfProbe = Int.MaxValue, nFullScores = 1 << 22,
        centroidScoreThreshold = None))
    val rs = hardQuality(spark, "/tmp/graft_recall_curve",
      numDocs = 8000L, numQueries = 60, paramSets = probes).map(_._1)
    info(s"recall curve (probe 1,4,8,16,full): " +
      rs.map(r => f"$r%.4f").mkString(", "))
    rs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 0.02,
        f"recall dropped along the probe curve: $a%.4f -> $b%.4f")
    }
    assert(rs.last > rs.head,
      s"curve is flat: widening the probe from 1 to full changed nothing")
    assert(rs.last == 1.0,
      f"exhaustive funnel recall ${rs.last}%.4f != 1.0 — the full-probe " +
        "path is not exact")
  }
}
