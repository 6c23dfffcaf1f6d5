package graft.core

/** Late-interaction (ColBERT / PLAID) scoring kernels.
  *
  * `maxsim(q, d) = sum over query tokens of max over doc tokens of q·d`,
  * with non-finite per-token maxima dropped from the sum — semantics of
  * next-plaid/src/maxsim.rs:270-314 (f32 accumulation, NaN-safe max).
  *
  * Pure JVM; used inside Aggregators / mapPartitions on grouped
  * `Array[Array[Float]]` columns so multi-vector docs never need a full
  * token-level explode+shuffle on the exact-rerank path.
  */
object MaxSim {

  @inline def dot(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** NaN-safe "better" comparison: a candidate NaN never replaces a finite
    * max (maxsim.rs is_score_better semantics). */
  @inline private[graft] def better(cand: Float, cur: Float): Boolean =
    !cand.isNaN && (cur.isNaN || cand > cur)

  def score(query: Array[Array[Float]], doc: Array[Array[Float]]): Float = {
    var total = 0.0f
    var qi = 0
    while (qi < query.length) {
      var maxSim = Float.NegativeInfinity
      var di = 0
      while (di < doc.length) {
        val sim = dot(query(qi), doc(di))
        if (better(sim, maxSim)) maxSim = sim
        di += 1
      }
      if (!maxSim.isInfinite && !maxSim.isNaN) total += maxSim
      qi += 1
    }
    total
  }

  /** MaxSim with double-precision dot products and sum — used on the exact
    * rerank path so the declared queries hash-match the DuckDB oracle's
    * double arithmetic (sequential fold in token order on both sides). */
  def scoreDouble(query: Array[Array[Float]], doc: Array[Array[Float]]): Double = {
    var total = 0.0
    var qi = 0
    while (qi < query.length) {
      var maxSim = Double.NegativeInfinity
      var di = 0
      while (di < doc.length) {
        val q = query(qi); val d = doc(di)
        var s = 0.0
        var i = 0
        val n = math.min(q.length, d.length)
        while (i < n) { s += q(i).toDouble * d(i).toDouble; i += 1 }
        if (!s.isNaN && (maxSim.isNaN || s > maxSim)) maxSim = s
        di += 1
      }
      if (!maxSim.isInfinite && !maxSim.isNaN) total += maxSim
      qi += 1
    }
    total
  }

  /** True when the JDK Vector API module is loadable at runtime — the
    * [[scoreFast]] serving kernel then runs lane-parallel
    * ([[SimdMaxSim]], AVX2/AVX-512 via `jdk.incubator.vector`); without
    * the module (a caller embedding the jar without
    * `--add-modules=jdk.incubator.vector`) it falls back to the scalar
    * unrolled kernel below. Probed once per JVM. */
  val simdAvailable: Boolean =
    try { SimdMaxSim.selfTest(); true }
    catch { case _: Throwable => false }

  /** f32 MaxSim — the serving-mode rerank kernel
    * (SearchParams.rerankFloat32): SIMD ([[SimdMaxSim.score]]) when the
    * Vector API is present, else the 8-way-unrolled scalar kernel. Same
    * NaN-safe max/sum semantics as [[score]]. Summation order differs
    * from [[score]]/[[scoreDouble]], which is exactly the reference's
    * own situation: its kernel is SIMD f32 (maxsim.rs:270-314), so no
    * sequential order is canonical. NOT used by the declared oracle
    * queries — those keep [[scoreDouble]]'s fixed order for DuckDB
    * bit-parity. */
  def scoreFast(query: Array[Array[Float]], doc: Array[Array[Float]]): Float =
    if (simdAvailable) SimdMaxSim.score(query, doc)
    else scoreFastScalar(query, doc)

  /** Scalar 8-way-unrolled f32 MaxSim — [[scoreFast]]'s fallback when
    * the Vector API module is absent; the unroll breaks the add-chain
    * latency that binds the sequential kernels. */
  def scoreFastScalar(query: Array[Array[Float]], doc: Array[Array[Float]]): Float = {
    var total = 0.0f
    var qi = 0
    while (qi < query.length) {
      var maxSim = Float.NegativeInfinity
      val q = query(qi)
      var di = 0
      while (di < doc.length) {
        val d = doc(di)
        val n = math.min(q.length, d.length)
        val n8 = n & ~7
        var s0 = 0.0f; var s1 = 0.0f; var s2 = 0.0f; var s3 = 0.0f
        var s4 = 0.0f; var s5 = 0.0f; var s6 = 0.0f; var s7 = 0.0f
        var i = 0
        while (i < n8) {
          s0 += q(i) * d(i); s1 += q(i + 1) * d(i + 1)
          s2 += q(i + 2) * d(i + 2); s3 += q(i + 3) * d(i + 3)
          s4 += q(i + 4) * d(i + 4); s5 += q(i + 5) * d(i + 5)
          s6 += q(i + 6) * d(i + 6); s7 += q(i + 7) * d(i + 7)
          i += 8
        }
        var s = ((s0 + s1) + (s2 + s3)) + ((s4 + s5) + (s6 + s7))
        while (i < n) { s += q(i) * d(i); i += 1 }
        if (better(s, maxSim)) maxSim = s
        di += 1
      }
      if (!maxSim.isInfinite && !maxSim.isNaN) total += maxSim
      qi += 1
    }
    total
  }

  /** Approximate (codes-only) MaxSim: per query token take the max centroid
    * score over the doc's code set (search.rs:305-324). `centroidScores` is
    * the per-query-token score row indexed by centroid code. */
  def approxScore(centroidScores: Array[Array[Float]], docCodes: Array[Int]): Float = {
    var total = 0.0f
    var qi = 0
    while (qi < centroidScores.length) {
      val row = centroidScores(qi)
      var maxSim = Float.NegativeInfinity
      var ci = 0
      while (ci < docCodes.length) {
        val sim = row(docCodes(ci))
        if (better(sim, maxSim)) maxSim = sim
        ci += 1
      }
      if (!maxSim.isInfinite && !maxSim.isNaN) total += maxSim
      qi += 1
    }
    total
  }

  def l2Normalize(v: Array[Float]): Array[Float] = {
    var sumSq = 0.0f
    var i = 0
    while (i < v.length) { sumSq += v(i) * v(i); i += 1 }
    val norm = math.max(math.sqrt(sumSq.toDouble).toFloat, 1e-12f)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) / norm; i += 1 }
    out
  }

  /** Cosine similarity in double precision (deterministic sequential sum). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dotD = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dotD += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dotD / (math.sqrt(na) * math.sqrt(nb))
  }
}
