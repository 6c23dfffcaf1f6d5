package graft.core

/** Exact sorted-interpolation quantiles (numpy "linear" method).
  *
  * Behavior mirrors the reference engine's quantile helpers
  * (next-plaid/src/utils.rs:94-157): sort ascending, index `q*(n-1)`,
  * linear interpolation between floor/ceil neighbours, interpolation
  * weight computed in f64 then cast to f32. Exact (not approximate)
  * because codec training must be bit-reproducible across runs.
  */
object Quantiles {

  /** Quantile of `arr` at `q` in [0,1]; 0.0 for an empty array. */
  def quantile(arr: Array[Float], q: Double): Float = {
    if (arr.isEmpty) return 0.0f
    val sorted = arr.clone()
    java.util.Arrays.sort(sorted)
    interp(sorted, q)
  }

  /** Multiple quantiles over one sort. */
  def quantiles(arr: Array[Float], qs: Array[Double]): Array[Float] = {
    if (arr.isEmpty) return Array.fill(qs.length)(0.0f)
    val sorted = arr.clone()
    java.util.Arrays.sort(sorted)
    qs.map(interp(sorted, _))
  }

  private def interp(sorted: Array[Float], q: Double): Float = {
    val n = sorted.length
    val idx = q * (n - 1).toDouble
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo)
    else {
      val w = (idx - lo).toFloat
      sorted(lo) * (1.0f - w) + sorted(hi) * w
    }
  }

  /** Full-double quantiles over the same sorted-interpolation definition,
    * with DuckDB `quantile_cont`'s exact arithmetic: `lo + (hi - lo) * frac`
    * all in f64 (empirically bit-identical to DuckDB 1.0 over f32 inputs —
    * the two-sided `lo*(1-w)+hi*w` form is NOT). Used by the b3_codec
    * oracle twin so the hashed output compares identical arithmetic; the
    * engine's f32 `quantiles` stays the codec-training kernel (it mirrors
    * the reference's f32 cast, utils.rs:94-157) and is asserted within
    * 1e-4 of this twin in-query. */
  def quantilesDouble(arr: Array[Float], qs: Array[Double]): Array[Double] = {
    if (arr.isEmpty) return Array.fill(qs.length)(0.0)
    val sorted = arr.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length
    qs.map { q =>
      val idx = q * (n - 1).toDouble
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      if (lo == hi) sorted(lo).toDouble
      else {
        val l = sorted(lo).toDouble
        l + (sorted(hi).toDouble - l) * (idx - lo)
      }
    }
  }
}
