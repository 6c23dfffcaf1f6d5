package graft.core;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Vector-API (SIMD) late-interaction kernels for the serving-mode f32
 * rerank path. Same semantics as {@code MaxSim.score}: per query token
 * take the NaN-safe max dot over doc tokens, drop non-finite maxima from
 * the sum. The reference's kernel is SIMD f32 (next-plaid/src/maxsim.rs:
 * 270-314), so no sequential summation order is canonical for this path
 * — lane-parallel accumulation is exactly the reference's own arithmetic
 * shape. NOT used by declared oracle queries (those pin the fixed-order
 * double kernel for DuckDB bit-parity).
 *
 * <p>Kept in Java because javac compiles against the incubator module
 * directly ({@code --add-modules jdk.incubator.vector}); callers reach it
 * through {@code MaxSim}'s availability-probed dispatch, which falls back
 * to the scalar unrolled kernel when the module is absent at runtime.
 */
public final class SimdMaxSim {

  private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

  private SimdMaxSim() {}

  /** Availability probe: touches the Vector API so class-loading fails
   * fast (NoClassDefFoundError) when the module isn't on the runtime
   * module path. Returns the lane count so the call can't be folded away. */
  public static int selfTest() {
    float[] a = {1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f};
    float s = dot(a, a, a.length);
    if (s != 285f) throw new IllegalStateException("simd dot self-test: " + s);
    return S.length();
  }

  /** SIMD dot over the first {@code n} elements (2-way unrolled FMA). */
  public static float dot(float[] a, float[] b, int n) {
    int lanes = S.length();
    int step = lanes * 2;
    int i = 0;
    FloatVector acc0 = FloatVector.zero(S);
    FloatVector acc1 = FloatVector.zero(S);
    int bound = n - (n % step);
    for (; i < bound; i += step) {
      acc0 = FloatVector.fromArray(S, a, i).fma(FloatVector.fromArray(S, b, i), acc0);
      acc1 = FloatVector.fromArray(S, a, i + lanes)
          .fma(FloatVector.fromArray(S, b, i + lanes), acc1);
    }
    for (; i + lanes <= n; i += lanes) {
      acc0 = FloatVector.fromArray(S, a, i).fma(FloatVector.fromArray(S, b, i), acc0);
    }
    float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) s += a[i] * b[i];
    return s;
  }

  /** out[c] = dot(cents[c*dim .. c*dim+dim), q) for all k rows — the
   * SIMD scoring pass of the filter-and-refine nearest-centroid
   * kernels. 4 rows per block share each q-vector load. */
  public static void rowDots(float[] cents, int k, int dim, float[] q, float[] out) {
    int lanes = S.length();
    int bound = dim - (dim % lanes);
    int c = 0;
    for (; c + 3 < k; c += 4) {
      int o0 = c * dim, o1 = o0 + dim, o2 = o1 + dim, o3 = o2 + dim;
      FloatVector a0 = FloatVector.zero(S), a1 = FloatVector.zero(S);
      FloatVector a2 = FloatVector.zero(S), a3 = FloatVector.zero(S);
      int i = 0;
      for (; i < bound; i += lanes) {
        FloatVector qv = FloatVector.fromArray(S, q, i);
        a0 = qv.fma(FloatVector.fromArray(S, cents, o0 + i), a0);
        a1 = qv.fma(FloatVector.fromArray(S, cents, o1 + i), a1);
        a2 = qv.fma(FloatVector.fromArray(S, cents, o2 + i), a2);
        a3 = qv.fma(FloatVector.fromArray(S, cents, o3 + i), a3);
      }
      float s0 = a0.reduceLanes(VectorOperators.ADD);
      float s1 = a1.reduceLanes(VectorOperators.ADD);
      float s2 = a2.reduceLanes(VectorOperators.ADD);
      float s3 = a3.reduceLanes(VectorOperators.ADD);
      for (; i < dim; i++) {
        float qi = q[i];
        s0 += qi * cents[o0 + i];
        s1 += qi * cents[o1 + i];
        s2 += qi * cents[o2 + i];
        s3 += qi * cents[o3 + i];
      }
      out[c] = s0; out[c + 1] = s1; out[c + 2] = s2; out[c + 3] = s3;
    }
    for (; c < k; c++) {
      int off = c * dim;
      FloatVector acc = FloatVector.zero(S);
      int i = 0;
      for (; i < bound; i += lanes) {
        acc = FloatVector.fromArray(S, q, i)
            .fma(FloatVector.fromArray(S, cents, off + i), acc);
      }
      float s = acc.reduceLanes(VectorOperators.ADD);
      for (; i < dim; i++) s += q[i] * cents[off + i];
      out[c] = s;
    }
  }

  /** out[c] = squared L2 distance from q to row c. Same blocking as
   * {@link #rowDots}; all summands are non-negative, so the f32 error
   * is bounded by a small multiple of the value itself. */
  public static void rowDistSq(float[] cents, int k, int dim, float[] q, float[] out) {
    int lanes = S.length();
    int bound = dim - (dim % lanes);
    int c = 0;
    for (; c + 3 < k; c += 4) {
      int o0 = c * dim, o1 = o0 + dim, o2 = o1 + dim, o3 = o2 + dim;
      FloatVector a0 = FloatVector.zero(S), a1 = FloatVector.zero(S);
      FloatVector a2 = FloatVector.zero(S), a3 = FloatVector.zero(S);
      int i = 0;
      for (; i < bound; i += lanes) {
        FloatVector qv = FloatVector.fromArray(S, q, i);
        FloatVector d0 = qv.sub(FloatVector.fromArray(S, cents, o0 + i));
        FloatVector d1 = qv.sub(FloatVector.fromArray(S, cents, o1 + i));
        FloatVector d2 = qv.sub(FloatVector.fromArray(S, cents, o2 + i));
        FloatVector d3 = qv.sub(FloatVector.fromArray(S, cents, o3 + i));
        a0 = d0.fma(d0, a0);
        a1 = d1.fma(d1, a1);
        a2 = d2.fma(d2, a2);
        a3 = d3.fma(d3, a3);
      }
      float s0 = a0.reduceLanes(VectorOperators.ADD);
      float s1 = a1.reduceLanes(VectorOperators.ADD);
      float s2 = a2.reduceLanes(VectorOperators.ADD);
      float s3 = a3.reduceLanes(VectorOperators.ADD);
      for (; i < dim; i++) {
        float qi = q[i];
        float d0 = qi - cents[o0 + i]; s0 += d0 * d0;
        float d1 = qi - cents[o1 + i]; s1 += d1 * d1;
        float d2 = qi - cents[o2 + i]; s2 += d2 * d2;
        float d3 = qi - cents[o3 + i]; s3 += d3 * d3;
      }
      out[c] = s0; out[c + 1] = s1; out[c + 2] = s2; out[c + 3] = s3;
    }
    for (; c < k; c++) {
      int off = c * dim;
      FloatVector acc = FloatVector.zero(S);
      int i = 0;
      for (; i < bound; i += lanes) {
        FloatVector d = FloatVector.fromArray(S, q, i)
            .sub(FloatVector.fromArray(S, cents, off + i));
        acc = d.fma(d, acc);
      }
      float s = acc.reduceLanes(VectorOperators.ADD);
      for (; i < dim; i++) { float d = q[i] - cents[off + i]; s += d * d; }
      out[c] = s;
    }
  }

  /** NaN-safe "better": a candidate NaN never replaces a finite max
   * (maxsim.rs is_score_better). maxCur starts at -inf and only ever
   * takes non-NaN candidates, so the cur-isNaN arm never fires. */
  private static boolean better(float cand, float cur) {
    return !Float.isNaN(cand) && (Float.isNaN(cur) || cand > cur);
  }

  /**
   * MaxSim(query, doc): doc tokens blocked 4-wide so each query-vector
   * lane load feeds four FMA chains (the dot's add-chain latency no
   * longer binds). The 4-block requires uniform doc-token length (the
   * index stores fixed-dim embeddings; mixed lengths fall back to the
   * per-pair dot, same result).
   */
  public static float score(float[][] query, float[][] doc) {
    float total = 0f;
    int lanes = S.length();
    for (float[] q : query) {
      float maxSim = Float.NEGATIVE_INFINITY;
      int di = 0;
      int dBlock = doc.length - 3;
      while (di < dBlock) {
        float[] d0 = doc[di], d1 = doc[di + 1], d2 = doc[di + 2], d3 = doc[di + 3];
        if (d0.length == d1.length && d1.length == d2.length && d2.length == d3.length) {
          int n = Math.min(q.length, d0.length);
          FloatVector a0 = FloatVector.zero(S), a1 = FloatVector.zero(S);
          FloatVector a2 = FloatVector.zero(S), a3 = FloatVector.zero(S);
          int i = 0;
          int bound = n - (n % lanes);
          for (; i < bound; i += lanes) {
            FloatVector qv = FloatVector.fromArray(S, q, i);
            a0 = qv.fma(FloatVector.fromArray(S, d0, i), a0);
            a1 = qv.fma(FloatVector.fromArray(S, d1, i), a1);
            a2 = qv.fma(FloatVector.fromArray(S, d2, i), a2);
            a3 = qv.fma(FloatVector.fromArray(S, d3, i), a3);
          }
          float s0 = a0.reduceLanes(VectorOperators.ADD);
          float s1 = a1.reduceLanes(VectorOperators.ADD);
          float s2 = a2.reduceLanes(VectorOperators.ADD);
          float s3 = a3.reduceLanes(VectorOperators.ADD);
          for (; i < n; i++) {
            float qi = q[i];
            s0 += qi * d0[i];
            s1 += qi * d1[i];
            s2 += qi * d2[i];
            s3 += qi * d3[i];
          }
          if (better(s0, maxSim)) maxSim = s0;
          if (better(s1, maxSim)) maxSim = s1;
          if (better(s2, maxSim)) maxSim = s2;
          if (better(s3, maxSim)) maxSim = s3;
          di += 4;
        } else {
          float s = dot(q, doc[di], Math.min(q.length, doc[di].length));
          if (better(s, maxSim)) maxSim = s;
          di += 1;
        }
      }
      for (; di < doc.length; di++) {
        float s = dot(q, doc[di], Math.min(q.length, doc[di].length));
        if (better(s, maxSim)) maxSim = s;
      }
      if (!Float.isInfinite(maxSim) && !Float.isNaN(maxSim)) total += maxSim;
    }
    return total;
  }
}
