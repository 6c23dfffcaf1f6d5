package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.MultiVectorIndex

/** Warm search-throughput harness — the QPS twin of the reference's
  * SciFact docker benchmark (55.3 QPS CPU over 5,183 docs,
  * docs/benchmarks/scifact_docker_benchmark.json).
  *
  * Round-8 verdict #4: the old `v_search_qps` line searched a 400-doc
  * index (sf0.1 embeddings = 2,000 vectors / 5 per doc) and its bench
  * time was dominated by index build + open, so the headline QPS was
  * not comparable to the baseline. This harness builds a SciFact-SIZED
  * corpus — ≥5,183 docs at ColBERT dim 128, 32 tokens per doc (the
  * reference's padded QUERY length; its docs average longer, which is
  * the documented caveat) — runs one untimed warm pass, then times
  * `reps` full batch-search passes and reports the best, so the number
  * is warm search-only throughput. */
object QpsHarness {

  val NumDocs = 5200L
  val NumQueries = 64
  val Dim = 128
  val TokensPerDoc = 32

  /** Build (or reuse) the QPS index at `workDir`, run the warm +
    * timed passes. Returns (bestSeconds, qps, buildSeconds). */
  def measure(
      spark: SparkSession,
      workDir: String,
      numDocs: Long = NumDocs,
      numQueries: Int = NumQueries,
      reps: Int = 3): (Double, Double, Double) = {
    val tB0 = System.nanoTime()
    // a cached index is only reused when its shape matches the requested
    // corpus — otherwise the reported qps_docs/qps_dim metadata would
    // describe a corpus that was not the one measured
    val cached =
      if (graft.util.Fs.exists(s"$workDir/manifest.json"))
        Some(new MultiVectorIndex(spark, workDir))
          .filter(i => i.numDocuments == numDocs && i.dim == Dim)
      else None
    val idx = cached.getOrElse {
      graft.util.Fs.deleteRecursively(workDir)
      val corpus = RecallHarness.clusteredCorpus(
        spark, numDocs, tokensPerDoc = TokensPerDoc, dim = Dim)
      MultiVectorIndex.build(spark, corpus, workDir)
    }
    val buildSec = (System.nanoTime() - tB0) / 1e9
    val queries: DataFrame = RecallHarness.queriesFrom(
      spark, numQueries, tokensPerDoc = TokensPerDoc, dim = Dim).cache()
    queries.count()
    val searcher = new Searcher(idx)
    def once(): Unit = searcher.search(queries, SearchParams()).count()
    once() // warm: codegen, broadcasts, page cache
    // after a COLD index build the first warm call still pays JIT and
    // page-cache effects of the build's own allocations (round-10's
    // recorded qps_warm was 5x below the isolated number for exactly
    // this reason) — re-establish warm-up with a second call
    if (cached.isEmpty) once()
    val best = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      once()
      (System.nanoTime() - t0) / 1e9
    }.min
    queries.unpersist()
    (best, numQueries / best, buildSec)
  }
}
