package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.search.RecallHarness

/** Retrieval-quality gate: default pruned parameters (top_k=10,
  * n_ivf_probe=8, threshold=0.4 — search.rs:58-69) must reach
  * recall@10 ≥ 0.95 vs brute force on a 50k-doc clustered corpus. The
  * Spark twin of the reference's SciFact NDCG/recall regression gate. */
class RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("recall@10 and ndcg@10 >= 0.95 with default pruned params on a 50k-doc clustered corpus") {
    val (recall, ndcg) = RecallHarness.measure(spark, "/tmp/graft_recall_idx", numDocs = 50000L)
    info(f"recall@10 = $recall%.4f, ndcg@10 = $ndcg%.4f")
    assert(recall >= 0.95, f"default-parameter recall@10 too low: $recall%.4f")
    assert(ndcg >= 0.95, f"default-parameter ndcg@10 too low: $ndcg%.4f")
  }
}
