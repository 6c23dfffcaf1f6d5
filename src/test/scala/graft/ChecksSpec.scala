package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checks._

class ChecksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def results(rows: Seq[(java.lang.Long, String, String)], rules: Seq[Rule]) = {
    import spark.implicits._
    evaluate(rows.toDF("id", "name", "seg"), rules)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
  }

  test("each rule kind counts exactly its violations in one pass") {
    val rows: Seq[(java.lang.Long, String, String)] = Seq(
      (1L, "alpha", "A"), (2L, "beta", "B"), (2L, null, "C"),
      (null, "delta9", "A"), (5L, "epsilon", "A"))
    val r = results(rows, Seq(
      NotNull("name"),
      Unique("id"),
      InRange("id", 1.0, 4.0),
      AcceptedValues("seg", Seq("A", "B")),
      MatchesRegex("name", "^[a-z]+$"),
      Predicate("id_small", "id", "id < 3")))
    assert(r("not_null_name") === ((5L, 1L, false)))
    // ids: 1,2,2,null,5 -> distinct incl null = 4 -> one duplicate row
    assert(r("unique_id") === ((5L, 1L, false)))
    // 5 out of range; null id is not a range violation
    assert(r("in_range_id") === ((5L, 1L, false)))
    assert(r("accepted_values_seg") === ((5L, 1L, false)))
    // "delta9" breaks the all-letters anchor; null name not counted
    assert(r("matches_regex_name") === ((5L, 1L, false)))
    // violations: id=5 and id=null (predicate NULL counts as failed)
    assert(r("id_small") === ((5L, 2L, false)))
  }

  test("all-nulls and clean columns: unique treats NULLs as one value; passes pass") {
    val rows: Seq[(java.lang.Long, String, String)] = Seq(
      (1L, "a", "A"), (2L, "b", "A"), (3L, "c", "B"))
    val r = results(rows, Seq(NotNull("name"), Unique("id"),
      AcceptedValues("seg", Seq("A", "B"))))
    assert(r.values.forall { case (n, v, p) => n == 3L && v == 0L && p })
    val rows2: Seq[(java.lang.Long, String, String)] =
      Seq((null, "a", "A"), (null, "b", "A"))
    val r2 = results(rows2, Seq(Unique("id")))
    // two NULLs = one shared distinct value -> 1 duplicate row
    assert(r2("unique_id") === ((2L, 1L, false)))
  }

  test("evaluateBy: per-group violation counts in one grouped pass") {
    import spark.implicits._
    val df = Seq(("d1", 1L, "a"), ("d1", 2L, "a"), ("d1", 2L, "b"),
      ("d2", 5L, "a"), ("d2", 6L, "a")).toDF("day", "id", "name")
    val r = evaluateBy(df, Seq("day"), Seq(Unique("id"), InRange("id", 1.0, 5.0)))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    assert(r(("d1", "unique_id")) === ((3L, 1L, false)))
    assert(r(("d2", "unique_id")) === ((2L, 0L, true)))
    assert(r(("d1", "in_range_id")) === ((3L, 0L, true)))
    assert(r(("d2", "in_range_id")) === ((2L, 1L, false)))
  }

  test("chiSquare: zero for exactly independent table, positive for dependent; dof") {
    import spark.implicits._
    import graft.operators.Stats
    // perfectly independent 2x3 grid: every (a,b) cell count = rowShare*colShare
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 4 }
      yield (a, b)).toDF("a", "b")
    val r0 = Stats.chiSquare(indep, "a", "b").collect()(0)
    assert(r0.getLong(0) === 24L && r0.getLong(1) === 6L && r0.getLong(2) === 2L)
    assert(r0.getLong(3) === 0L, "independent table has chi2 = 0")
    // fully dependent: b determined by a
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val r1 = Stats.chiSquare(dep, "a", "b").collect()(0)
    // chi2 for perfect association of a 2x2 = n -> 20 in micro units
    assert(r1.getLong(3) === 20000000L)
  }

  test("chiSquare: high-cardinality pair fails loudly, never OOMs the driver") {
    import spark.implicits._
    import graft.operators.Stats
    // 60 observed pairs under maxCells=50: the limit+length guard trips
    // BEFORE any unbounded driver materialization
    val wide = (1L to 60L).map(i => (s"a$i", s"b$i")).toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      Stats.chiSquare(wide, "a", "b", maxCells = 50)
    }
    assert(e1.getMessage.contains("not categorical"), e1.getMessage)
    // observed cells fit (diagonal = 30) but the full |A|x|B| spine
    // (30x30 = 900 > 800) would blow the crossJoin — second guard
    val diag = (1L to 30L).map(i => (s"a$i", s"b$i")).toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      Stats.chiSquare(diag, "a", "b", maxCells = 800)
    }
    assert(e2.getMessage.contains("contingency spine"), e2.getMessage)
  }

  test("pearsonCorr: +-1 for linear data, ~0 for designed-orthogonal, NULL for constant") {
    import spark.implicits._
    import graft.operators.Stats
    val lin = (1L to 50L).flatMap(i => Seq(("up", i, 3 * i + 7), ("dn", i, -2 * i)))
      .toDF("g", "x", "y")
    val r = Stats.pearsonCorr(lin, Seq("g"), "x", "y")
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r("up") === 10000L && r("dn") === -10000L)
    // x symmetric around 0 paired with x*x: exactly zero covariance
    val orth = Seq(-2L, -1L, 0L, 1L, 2L).map(x => ("g", x, x * x)).toDF("g", "x", "y")
    assert(Stats.pearsonCorr(orth, Seq("g"), "x", "y").collect()(0).getLong(2) === 0L)
    val const = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "x", "y")
    assert(Stats.pearsonCorr(const, Seq("g"), "x", "y").collect()(0).isNullAt(2))
  }

  test("welchTTest: zero for identical slices, sign tracks the mean shift") {
    import spark.implicits._
    import graft.operators.Stats
    val same = (1L to 30L).flatMap(i => Seq(("a", i % 7), ("b", i % 7)))
      .toDF("g", "v")
    val r0 = Stats.welchTTest(same, "g", "v", "a", "b").collect()(0)
    assert(r0.getLong(0) === 30L && r0.getLong(1) === 30L)
    assert(r0.getLong(4) === 0L, "identical slices: t = 0")
    val shifted = ((1L to 30L).map(i => ("a", i % 7 + 100)) ++
      (1L to 30L).map(i => ("b", i % 7))).toDF("g", "v")
    val r1 = Stats.welchTTest(shifted, "g", "v", "a", "b").collect()(0)
    assert(r1.getLong(4) > 100000000L, s"big shift -> huge t, got ${r1.getLong(4)}")
    assert(r1.getLong(2) - r1.getLong(3) === 100000000L, "means differ by the shift")
  }

  test("corrMatrix fails loudly on an empty relation, not with an NPE") {
    import spark.implicits._
    import graft.operators.Stats
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Stats.corrMatrix(empty, Seq("a", "b"))
    }
    assert(e.getMessage.contains("empty relation"))
  }

  test("corrMatrix: one pass matches per-pair pearsonCorr on every pair") {
    import spark.implicits._
    import graft.operators.Stats
    val df = (1L to 200L).map(i => (i, 3 * i + 7, i % 13, 200L - i))
      .toDF("a", "b", "c", "d")
    val cols = Seq("a", "b", "c", "d")
    val got = Stats.corrMatrix(df, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got.size === 6)
    for (i <- cols.indices; j <- (i + 1) until cols.size) {
      val single = Stats.pearsonCorr(
        df.withColumn("g", org.apache.spark.sql.functions.lit("g")),
        Seq("g"), cols(i), cols(j)).collect()(0).getLong(2)
      assert(got((cols(i), cols(j))) === single,
        s"pair ${cols(i)},${cols(j)}")
    }
    // known values: perfect positive and negative linear pairs
    assert(got(("a", "b")) === 10000L && got(("a", "d")) === -10000L)
  }

  test("zipfSlope: ~-1 on a 1/rank corpus, exactly 0 on a uniform corpus") {
    import spark.implicits._
    import graft.pipeline.TextStats
    // freq(w_i) = floor(600/i): ln f = ln 600 - ln rank -> slope -1
    val zipfText = (1 to 60).flatMap(i => Seq.fill(600 / i)(f"w$i%03d"))
      .mkString(" ")
    val flatText = (1 to 40).flatMap(i => Seq.fill(10)(f"u$i%03d")).mkString(" ")
    val docs = Seq(("zipf", zipfText), ("flat", flatText)).toDF("src", "text")
    val got = TextStats.zipfSlope(docs, "src", "text", topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(got("zipf") + 1000000L) < 100000L,
      s"zipf slope ${got("zipf")} not near -1e6")
    assert(got("flat") === 0L, "uniform corpus: exactly zero slope")
  }

  test("fingerprint: order/partitioning-invariant, row-sensitive, NULL-explicit") {
    import spark.implicits._
    import graft.operators.Checks
    val base = Seq(("g1", 1L, "a"), ("g1", 2L, "b"), ("g2", 3L, null))
      .toDF("g", "k", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Checks.fingerprint(df, Seq("g"), Seq("k", "v"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val a = fp(base)
    // reordered + repartitioned input: identical fingerprints
    assert(fp(base.orderBy(org.apache.spark.sql.functions.col("k").desc)
      .repartition(7)) === a)
    // a changed value flips its group's fingerprint only
    val b = fp(Seq(("g1", 1L, "a"), ("g1", 2L, "B"), ("g2", 3L, null))
      .toDF("g", "k", "v"))
    assert(b("g1") !== a("g1"))
    assert(b("g2") === a("g2"))
    // NULL is explicit, not an empty string
    val c = fp(Seq(("g1", 1L, "a"), ("g1", 2L, "b"), ("g2", 3L, ""))
      .toDF("g", "k", "v"))
    assert(c("g2") !== a("g2"))
    // ungrouped variant returns one row
    assert(Checks.fingerprint(base, Nil, Seq("k", "v")).count() === 1L)
  }

  test("groupedTrend: exact slope/intercept on linear data, NULL on degenerate groups") {
    import spark.implicits._
    import graft.operators.Stats
    val lin = (0L to 20L).flatMap(x =>
      Seq(("up", x, 5 * x + 11), ("dn", x, -3 * x + 100))) ++
      Seq(("one", 4L, 9L), ("flat", 2L, 1L), ("flat", 2L, 3L))
    val r = Stats.groupedTrend(lin.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), Option(x.get(2)), Option(x.get(3))))).toMap
    assert(r("up") === ((21L, Some(5000000L), Some(11000000L))))
    assert(r("dn") === ((21L, Some(-3000000L), Some(100000000L))))
    // single point and zero x-variance: both have _den = 0 -> NULLs
    assert(r("one") === ((1L, None, None)))
    assert(r("flat") === ((2L, None, None)))
  }
}
