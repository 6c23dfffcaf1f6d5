package graft

import org.apache.spark.sql.SparkSession

import graft.index.{GraftKMeans, MultiVectorIndex, NearestKernel}
import graft.search.RecallHarness

/** Index-build throughput probe: (a) micro-times the nearest-centroid
  * assignment kernels — the scalar sequential loops vs the
  * filter-and-refine SIMD [[NearestKernel]] that replaced them on the
  * build paths — at the index shapes the round's corpora actually use;
  * (b) end-to-end builds a 52k-doc index and reports docs/s, the number
  * comparable to the reference's published "Index docs/s" column
  * (BASELINE.md: 41-106 docs/s across BEIR corpora, 137 docs/s was our
  * pre-SIMD quora measurement). */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)

    // ---- kernel micro-bench: K x dim assignment, N vectors ----
    for ((k, dim, n) <- Seq((4096, 128, 20000), (16384, 128, 20000), (32768, 128, 10000))) {
      val cents = Array.fill(k * dim)(rnd.nextFloat() * 2 - 1)
      val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val kern = new NearestKernel(cents, k, dim)

      def time(f: () => Unit): Double = {
        f(); f() // warm
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      var sink = 0
      val tScalarEuc = time(() => vecs.foreach(v => sink ^= GraftKMeans.nearestEuclidean(cents, k, dim, v)))
      val tKernEuc = time(() => vecs.foreach(v => sink ^= kern.nearestEuclideanF32(v)))
      val tScalarDot = time(() => vecs.foreach(v => sink ^= MultiVectorIndex.bestDot(cents, k, dim, v)))
      val tKernDot = time(() => vecs.foreach(v => sink ^= kern.nearestDotF32(v)))
      println(f"BUILD_PROBE K=$k%-6d dim=$dim  euclidean: scalar=${n / tScalarEuc}%,.0f/s simd=${n / tKernEuc}%,.0f/s (${tScalarEuc / tKernEuc}%.1fx)" +
        f"  dot: scalar=${n / tScalarDot}%,.0f/s simd=${n / tKernDot}%,.0f/s (${tScalarDot / tKernDot}%.1fx)  [$sink]")
    }

    // ---- end-to-end build: 52k docs, 32 tok/doc, dim 128 ----
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val workDir = "/tmp/graft_build_probe"
    graft.util.Fs.deleteRecursively(workDir)
    val corpus = RecallHarness.clusteredCorpus(spark, 52000L, tokensPerDoc = 32, dim = 128).cache()
    corpus.count()
    val t0 = System.nanoTime()
    val idx = MultiVectorIndex.build(spark, corpus, workDir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BUILD_PROBE e2e docs=${idx.numDocuments} K=${idx.codec.numCentroids} " +
      f"build=${sec}%.1f s  -> ${idx.numDocuments / sec}%.1f docs/s")
    spark.stop()
  }
}
