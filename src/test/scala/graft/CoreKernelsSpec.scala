package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.Where

/** Unit parity tests for the pure kernels; fixture values ported from the
  * reference's own unit tests (next-plaid/src/{search,codec,maxsim}.rs). */
class CoreKernelsSpec extends AnyFunSuite {

  test("maxsim matches reference colbert_score fixture (1.7)") {
    val query = Array(Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f))
    val doc = Array(
      Array(0.5f, 0.5f, 0f, 0f),
      Array(0.8f, 0.2f, 0f, 0f),
      Array(0f, 0.9f, 0.1f, 0f)
    )
    assert(math.abs(MaxSim.score(query, doc) - 1.7f) < 1e-5)
  }

  test("maxsim NaN/Inf robustness: non-finite maxima dropped") {
    val query = Array(Array(Float.NaN, 0f), Array(1.0f, 0f))
    val doc = Array(Array(1.0f, 0f))
    // q0 dot = NaN -> never better than -inf after NaN guard... NaN max is
    // skipped from the total; q1 contributes 1.0
    val s = MaxSim.score(query, doc)
    assert(s == 1.0f)
    // the serving f32 kernel shares the NaN semantics
    assert(MaxSim.scoreFast(query, doc) == 1.0f)
  }

  test("serving f32 rerank kernel agrees with the oracle f64 kernel") {
    // deterministic pseudo-random multi-vector fixtures (incl. a
    // non-multiple-of-4 dim for the unroll tail)
    val rnd = new scala.util.Random(42)
    for (dim <- Seq(7, 64, 128)) {
      def vecs(n: Int) = Array.fill(n)(
        MaxSim.l2Normalize(Array.fill(dim)(rnd.nextFloat() - 0.5f)))
      val query = vecs(13)
      val docs = Array.fill(50)(vecs(37))
      val f64 = docs.map(d => MaxSim.scoreDouble(query, d))
      val f32 = docs.map(d => MaxSim.scoreFast(query, d).toDouble)
      // per-score relative agreement within float precision
      f64.zip(f32).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4 * math.max(1.0, math.abs(a)),
          s"dim=$dim: $a vs $b")
      }
      // ranking agreement (the property search actually depends on)
      assert(f64.zipWithIndex.sortBy(-_._1).map(_._2).toSeq ===
        f32.zipWithIndex.sortBy(-_._1).map(_._2).toSeq)
    }
  }

  test("SIMD f32 kernel active and equivalent to the scalar fallback") {
    // build.sbt forks test JVMs with --add-modules=jdk.incubator.vector,
    // so the Vector API path must be live here — a regression to the
    // scalar fallback would silently forfeit the serving-QPS headline
    assert(MaxSim.simdAvailable, "Vector API kernel not active under sbt test")
    val rnd = new scala.util.Random(7)
    // dims exercise the vector body + scalar tail (17 = 16-lane + 1);
    // doc counts exercise the 4-wide block + remainder (5 = 1 block + 1)
    for (dim <- Seq(3, 17, 128); nDocs <- Seq(1, 5, 12)) {
      def vecs(n: Int) = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() - 0.5f))
      val query = vecs(9)
      val doc = vecs(nDocs)
      val simd = SimdMaxSim.score(query, doc).toDouble
      val scalar = MaxSim.scoreFastScalar(query, doc).toDouble
      assert(math.abs(simd - scalar) <= 1e-4 * math.max(1.0, math.abs(scalar)),
        s"dim=$dim nDocs=$nDocs: simd=$simd scalar=$scalar")
    }
    // ragged doc-token lengths force the blocked path's per-pair fallback
    val q = Array(Array.fill(16)(0.5f))
    val ragged = Array(Array.fill(16)(0.25f), Array.fill(8)(1.0f),
      Array.fill(16)(0.1f), Array.fill(3)(2.0f), Array.fill(16)(0.0f))
    assert(math.abs(SimdMaxSim.score(q, ragged) -
      MaxSim.scoreFastScalar(q, ragged)) < 1e-4f)
    // NaN doc token never wins; -inf stays dropped when doc set is empty
    val nanDoc = Array(Array.fill(16)(Float.NaN), Array.fill(16)(0.5f))
    assert(SimdMaxSim.score(q, nanDoc) == MaxSim.scoreFastScalar(q, nanDoc))
    assert(SimdMaxSim.score(q, Array.empty[Array[Float]]) == 0.0f)
  }

  test("quantile matches numpy linear interpolation") {
    val arr = Array(1.0f, 2.0f, 3.0f, 4.0f)
    assert(Quantiles.quantile(arr, 0.0) == 1.0f)
    assert(Quantiles.quantile(arr, 1.0) == 4.0f)
    assert(Quantiles.quantile(arr, 0.5) == 2.5f)
    assert(math.abs(Quantiles.quantile(arr, 0.25) - 1.75f) < 1e-6)
  }

  test("quantizer 4-bit round trip: packed width + sign preservation") {
    val dim = 8
    val cutoffs = (1 until 16).map(i => (i / 16.0f - 0.5f) * 2.0f).toArray
    val weights = (0 until 16).map(i => ((i + 0.5f) / 16.0f - 0.5f) * 2.0f).toArray
    val qz = new Quantizer(4, cutoffs, weights)
    val zeros = Array.fill(dim)(0.0f)
    val rows = Array(
      Array(-0.9f, -0.7f, -0.5f, -0.3f, 0.0f, 0.3f, 0.5f, 0.9f),
      Array(-0.8f, -0.4f, 0.0f, 0.4f, 0.8f, -0.6f, 0.2f, 0.6f)
    )
    for (r <- rows) {
      val packed = qz.quantize(r)
      assert(packed.length == dim * 4 / 8)
      val recon = qz.decompress(packed, zeros)
      for (j <- 0 until dim if math.abs(r(j)) > 0.2f) {
        assert(
          (r(j) > 0) == (recon(j) > 0) || math.abs(recon(j)) < 0.1f,
          s"sign mismatch at $j: orig=${r(j)} recon=${recon(j)}"
        )
      }
    }
  }

  test("quantizer 2-bit bucket boundaries (strict greater-than)") {
    val qz = new Quantizer(2, Array(-0.5f, 0.0f, 0.5f), Array(-0.75f, -0.25f, 0.25f, 0.75f))
    assert(qz.bucketOf(-1.0f) == 0)
    assert(qz.bucketOf(-0.5f) == 0) // equal to cutoff -> not strictly greater
    assert(qz.bucketOf(-0.4f) == 1)
    assert(qz.bucketOf(0.0f) == 1)
    assert(qz.bucketOf(0.1f) == 2)
    assert(qz.bucketOf(0.6f) == 3)
    assert(qz.bucketOf(Float.NaN) == 0)
  }

  test("quantizer trained cutoffs/weights at reference quantile positions") {
    val vals = (0 until 160).map(i => i / 159.0f - 0.5f).toArray
    val qz = Quantizer.train(vals, 2)
    assert(qz.bucketCutoffs.length == 3 && qz.bucketWeights.length == 4)
    assert(math.abs(qz.bucketCutoffs(1) - 0.0f) < 0.01f) // median ~ 0
  }

  test("unicode61 tokenizer") {
    assert(Tokenizers.unicode61("Hello, World9 foo") == Seq("hello", "world9", "foo"))
    assert(Tokenizers.unicode61("") == Seq())
  }

  test("trigram tokenizer") {
    assert(Tokenizers.trigram("AbCd") == Seq("abc", "bcd"))
    assert(Tokenizers.trigram("ab") == Seq())
  }

  test("identifier splitting matches reference examples") {
    assert(Tokenizers.splitIdentifier("HandlerStack") ==
      Seq("handlerstack", "handler", "stack", "handler_stack"))
    assert(Tokenizers.splitIdentifier("getHTTPResponse") ==
      Seq("gethttpresponse", "get", "http", "response", "get_http", "http_response"))
    assert(Tokenizers.splitIdentifier("my_func") ==
      Seq("my_func", "my", "func", "my_func"))
    assert(Tokenizers.splitIdentifier("simple") == Seq("simple"))
    assert(Tokenizers.camelSplit("HTTPResponse") == Seq("http", "response"))
    assert(Tokenizers.camelSplit("Foo2Bar") == Seq("foo", "2", "bar"))
  }

  test("rrf fusion matches reference math") {
    val fused = Fusion.rrf(Seq(1L, 2L), Seq(2L, 3L), 0.5f, 10)
    val m = fused.toMap
    assert(math.abs(m(2L) - (0.5f / 62 + 0.5f / 61)) < 1e-6)
    assert(math.abs(m(1L) - 0.5f / 61) < 1e-6)
    assert(fused.head._1 == 2L)
  }

  test("relative score fusion: constant list normalizes to 1.0") {
    val fused = Fusion.relativeScore(
      Seq((1L, 5.0f), (2L, 5.0f)), Seq((1L, 1.0f), (2L, 0.0f)), 0.75f, 10)
    val m = fused.toMap
    assert(math.abs(m(1L) - (0.75f + 0.25f)) < 1e-6)
    assert(math.abs(m(2L) - 0.75f) < 1e-6)
  }

  test("where validator: grammar + binding") {
    import Where._
    val cols = Seq("c_mktsegment", "c_acctbal", "c_name")
    val sql = toSparkSql(
      "c_mktsegment = ? AND (c_acctbal > ? OR c_name LIKE ?) AND c_acctbal BETWEEN ? AND ?",
      Seq(SStr("BUILDING"), SDouble(100.5), SStr("Cust%"), SLong(0), SLong(500)),
      cols
    )
    assert(sql.contains("`c_mktsegment` = 'BUILDING'"))
    assert(sql.contains("RLIKE") == false)
    assert(sql.contains("`c_acctbal` BETWEEN 0 AND 500"))
  }

  test("where validator: rejections") {
    import Where._
    val cols = Seq("a")
    def fails(cond: String, params: Seq[Param] = Seq(SLong(1))): Unit =
      assertThrows[WhereError](toSparkSql(cond, params, cols))
    fails("a = ?; DROP TABLE x", Seq(SLong(1)))
    fails("a = ? -- comment")
    fails("b = ?") // unknown column
    fails("a = 5", Seq()) // literal not allowed
    fails("a = ? OR", Seq(SLong(1)))
    fails("a = ?", Seq(SLong(1), SLong(2))) // too many params
    // the n=n idiom IS allowed
    assert(toSparkSql("1=1", Seq(), cols) == "(((1 = 1)))")
  }

  test("where validator: case-insensitive columns, quoted idents, IN, IS NULL") {
    import Where._
    val sql = toSparkSql(
      """"C_NAME" IN (?, ?) AND c_acctbal IS NOT NULL""",
      Seq(SStr("a"), SStr("b")),
      Seq("c_name", "c_acctbal")
    )
    assert(sql.contains("`c_name` IN ('a', 'b')"))
    assert(sql.contains("`c_acctbal` IS NOT NULL"))
  }

  test("cosine kernel") {
    val a = Array(1.0f, 0f); val b = Array(1.0f, 0f); val c = Array(0f, 2.0f)
    assert(math.abs(MaxSim.cosine(a, b) - 1.0) < 1e-12)
    assert(math.abs(MaxSim.cosine(a, c)) < 1e-12)
  }
}
