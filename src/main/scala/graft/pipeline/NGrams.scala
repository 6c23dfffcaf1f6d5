package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lambda-free word n-gram explosion.
  *
  * The obvious `transform(sequence(1, size(toks) - n + 1), i -> f(...))`
  * shape evaluates `f` INTERPRETED — Catalyst does not codegen
  * higher-order-function lambda bodies — and was measured ~8× slower
  * than the whole rest of the gram pipeline at sf0.1 (7.2 s vs 0.9 s
  * for the same rollup). The fix: `arrays_zip` of `n` parallel
  * `slice`s (both codegen'd, no lambda anywhere), explode the zipped
  * structs, and apply concat / xxhash64 / md5 POST-explode where they
  * run codegen'd. Element `i` of the zip holds tokens `i..i+n-1`, so
  * the gram multiset — and any hash of it — is identical to the
  * transform shape's.
  */
private[graft] object NGrams {

  /** `arrays_zip` of `n` parallel slices of `toksCol` (a SQL-visible
    * array<string> column name): element i = (toks[i+1], …, toks[i+n])
    * in 1-based slice terms. Arrays shorter than `n` produce an empty
    * zip (`greatest(…, 0)` keeps the slice length non-negative). */
  def zipExpr(toksCol: String, n: Int): Column = {
    require(n >= 2, s"zipExpr needs n >= 2, got $n (explode the array directly for n = 1)")
    expr("arrays_zip(" + (1 to n).map(k =>
      s"slice($toksCol, $k, greatest(size($toksCol) - ${n - 1}, 0))")
      .mkString(", ") + ")")
  }

  /** The `n` token fields of an exploded zip struct column (arrays_zip
    * names unnamed inputs positionally: "0", "1", …). */
  def fields(prCol: String, n: Int): Seq[Column] =
    (0 until n).map(i => col(s"$prCol.$i"))
}
