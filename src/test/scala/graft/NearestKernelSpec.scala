package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{GraftKMeans, MultiVectorIndex, NearestKernel}

/** Bit-identity of the filter-and-refine SIMD kernels against the
  * sequential scalar kernels they replace — including adversarial
  * near-ties (centroids 1 ulp apart), NaN rows, zero vectors, ragged
  * dims, and the k<64 fallback. The argument for identity is in
  * NearestKernel's Scaladoc; this spec is the empirical margin check. */
class NearestKernelSpec extends AnyFunSuite {

  // the original sequential kernels, kept verbatim as the spec's oracle
  private def assignF64Ref(cents: Array[Float], k: Int, dim: Int, vec: Array[Float]): Int = {
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) { s += cents(off + i).toDouble * vec(i); i += 1 }
      if (!s.isNaN && (best < 0 || s > bestScore)) { best = c; bestScore = s }
      c += 1
    }
    if (best < 0) 0 else best
  }

  private def nearestDotRef(cents: Array[Float], k: Int, dim: Int, vec: Array[Float]): Int =
    GraftKMeans.nearestCosine(cents, k, dim, vec)

  private def euclideanRef(cents: Array[Float], k: Int, dim: Int, vec: Array[Float]): Int = {
    var best = 0
    var bestDist = Float.PositiveInfinity
    var c = 0
    while (c < k) {
      var s = 0.0f
      val off = c * dim
      var i = 0
      while (i < dim) { val d = vec(i) - cents(off + i); s += d * d; i += 1 }
      if (s < bestDist) { best = c; bestDist = s }
      c += 1
    }
    best
  }

  private def normalize(v: Array[Float]): Array[Float] = graft.core.MaxSim.l2Normalize(v)

  test("filter-and-refine ≡ sequential kernels on random normalized data") {
    val rnd = new scala.util.Random(11)
    for (dim <- Seq(7, 64, 128); k <- Seq(64, 257, 1024)) {
      val cents = Array.fill(k * dim)(rnd.nextFloat() - 0.5f)
      // normalize rows (the production shape)
      for (c <- 0 until k) {
        val row = normalize(java.util.Arrays.copyOfRange(cents, c * dim, (c + 1) * dim))
        System.arraycopy(row, 0, cents, c * dim, dim)
      }
      val kern = new NearestKernel(cents, k, dim)
      for (_ <- 1 to 200) {
        val v = normalize(Array.fill(dim)(rnd.nextFloat() - 0.5f))
        assert(kern.assignF64(v) === assignF64Ref(cents, k, dim, v))
        assert(kern.nearestDotF32(v) === nearestDotRef(cents, k, dim, v))
        assert(kern.nearestEuclideanF32(v) === euclideanRef(cents, k, dim, v))
      }
    }
  }

  test("adversarial near-ties: ulp-apart centroids resolve identically") {
    val dim = 128
    val k = 256
    val rnd = new scala.util.Random(13)
    val base = normalize(Array.fill(dim)(rnd.nextFloat() - 0.5f))
    val cents = new Array[Float](k * dim)
    for (c <- 0 until k) {
      // every row is the base vector with ONE component nudged by 1 ulp
      // in alternating direction — the maximally tie-dense codebook
      val row = base.clone()
      val j = c % dim
      row(j) = java.lang.Math.nextAfter(row(j), if (c % 2 == 0) 1.0 else -1.0)
      System.arraycopy(row, 0, cents, c * dim, dim)
    }
    val kern = new NearestKernel(cents, k, dim)
    for (_ <- 1 to 300) {
      val v = normalize(Array.fill(dim)(rnd.nextFloat() - 0.5f))
      assert(kern.assignF64(v) === assignF64Ref(cents, k, dim, v))
      assert(kern.nearestDotF32(v) === nearestDotRef(cents, k, dim, v))
      assert(kern.nearestEuclideanF32(v) === euclideanRef(cents, k, dim, v))
      // the query itself near a centroid: distance ~0 (relative-delta edge)
      val near = cents.slice(0, dim).clone()
      near(3) = java.lang.Math.nextAfter(near(3), 2.0)
      assert(kern.nearestEuclideanF32(near) === euclideanRef(cents, k, dim, near))
    }
    // exact-duplicate rows: first index must win in every kernel
    val dup = new Array[Float](k * dim)
    for (c <- 0 until k) System.arraycopy(base, 0, dup, c * dim, dim)
    val kd = new NearestKernel(dup, k, dim)
    assert(kd.assignF64(base) === 0)
    assert(kd.nearestDotF32(base) === 0)
    assert(kd.nearestEuclideanF32(base) === 0)
  }

  test("NaN rows, zero vectors, small-k fallback") {
    val dim = 16
    val k = 128
    val rnd = new scala.util.Random(17)
    val cents = Array.fill(k * dim)(rnd.nextFloat() - 0.5f)
    java.util.Arrays.fill(cents, 0, dim, Float.NaN) // row 0 all-NaN
    val kern = new NearestKernel(cents, k, dim)
    for (_ <- 1 to 50) {
      val v = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      assert(kern.assignF64(v) === assignF64Ref(cents, k, dim, v))
      assert(kern.nearestDotF32(v) === nearestDotRef(cents, k, dim, v))
    }
    val zero = new Array[Float](dim)
    assert(kern.assignF64(zero) === assignF64Ref(cents, k, dim, zero))
    assert(kern.nearestEuclideanF32(zero) === euclideanRef(cents, k, dim, zero))
    // all-NaN query: every dot NaN -> reference returns 0
    val nanV = Array.fill(dim)(Float.NaN)
    assert(kern.assignF64(nanV) === assignF64Ref(cents, k, dim, nanV))
    // k below the SIMD threshold takes the scalar path outright
    val small = new NearestKernel(cents.slice(0, 8 * dim), 8, dim)
    for (_ <- 1 to 20) {
      val v = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      assert(small.assignF64(v) === assignF64Ref(cents.slice(0, 8 * dim), 8, dim, v))
    }
  }

  test("bestDot wrapper still matches the kernel (shared API)") {
    val dim = 32
    val k = 200
    val rnd = new scala.util.Random(19)
    val cents = Array.fill(k * dim)(rnd.nextFloat() - 0.5f)
    for (_ <- 1 to 50) {
      val v = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      assert(MultiVectorIndex.bestDot(cents, k, dim, v) ===
        nearestDotRef(cents, k, dim, v))
    }
  }
}
