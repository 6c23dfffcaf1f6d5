package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Sketches

class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def values(n: Int, distinct: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"v${rnd.nextInt(distinct)}").toDF("v")
  }

  test("HLL estimate within 25% of exact across cardinalities (m=128 → ~9% stderr)") {
    for ((distinct, seed) <- Seq((500, 1), (5000, 2), (40000, 3))) {
      val df = values(distinct * 3, distinct, seed)
      val exact = df.select("v").distinct().count()
      val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "v", 128), 128)
      assert(math.abs(est - exact) / exact < 0.25,
        s"distinct=$distinct exact=$exact est=$est")
    }
  }

  test("HLL small-range correction: tiny cardinalities stay accurate") {
    val df = values(200, 12, 7)
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "v", 128), 128)
    assert(math.abs(est - 12.0) < 3.0, s"est=$est for 12 distinct")
  }

  test("HLL registers: complete m-row table, duplicates don't move registers") {
    val once = Sketches.hllRegisters(values(1000, 300, 5), "v", 128)
    import spark.implicits._
    val dup = values(1000, 300, 5)
    val thrice = Sketches.hllRegisters(
      dup.unionAll(dup).unionAll(dup), "v", 128)
    assert(once.count() === 128L && thrice.count() === 128L)
    assert(once.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      thrice.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("HLL merge of disjoint halves == sketch of the union") {
    import spark.implicits._
    val a = (0 until 4000).map(i => s"a$i").toDF("v")
    val b = (0 until 4000).map(i => s"b$i").toDF("v")
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllRegisters(a, "v", 128), Sketches.hllRegisters(b, "v", 128)))
    val whole = Sketches.hllRegisters(a.unionAll(b), "v", 128)
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      whole.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("grouped HLL: per-group registers == per-group ungrouped sketches; estimates track exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (0 until 30000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val card = Map("g0" -> 200, "g1" -> 3000, "g2" -> 15000)(g)
      (g, (rnd.nextInt(card) + 1).toLong)
    }.toDF("grp", "uid")
    val grouped = Sketches.hllRegistersBy(df, Seq("grp"), "uid", m = 64)
    assert(grouped.count() === 3L * 64)
    // slicing the grouped sketch == sketching the slice
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = grouped.filter(col("grp") === g)
        .select("bucket", "register").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val solo = Sketches.hllRegisters(
        df.filter(col("grp") === g).select(col("uid").cast("string").as("v")),
        "v", 64).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(slice === solo, s"group $g sketch differs from its solo sketch")
    }
    // in-plan estimates within 35% (m=64 → ~13% stderr)
    val exact = df.groupBy("grp").agg(countDistinct("uid").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.hllEstimateBy(grouped, Seq("grp"), 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((g, n) <- exact)
      assert(math.abs(est(g) - n) / n < 0.35, s"$g exact=$n est=${est(g)}")
  }

  test("CMS: estimates are one-sided (est >= true) and exact for heavy hitters") {
    import spark.implicits._
    // 1 token at 5000, the rest a long tail
    val heavy = Seq.fill(5000)("heavy")
    val tail = (0 until 20000).map(i => s"t${i % 4000}")
    val df = (heavy ++ tail).toDF("v")
    val sk = Sketches.cmsSketch(df, "v", depth = 4, width = 256)
    val trueCnt = df.groupBy("v").agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmsEstimate(sk, trueCnt, "v", 4, 256)
      .join(trueCnt, "v").collect()
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("true_cnt"),
        s"CMS under-counted ${r.getString(0)}")
    }
    val h = est.find(_.getString(0) == "heavy").get
    // collision mass is ~N/width per row; min over 4 rows keeps the
    // heavy hitter's relative error small
    assert(h.getAs[Long]("est") - h.getAs[Long]("true_cnt") <= 1000,
      s"heavy-hitter estimate too loose: $h")
  }

  test("KMV: cardinality estimate, exact-below-k, and set algebra track exact") {
    import spark.implicits._
    // segment A: users 0..6000; segment B: users 4000..12000 → overlap 2000
    val a = (0 until 6000).map(i => s"u$i").toDF("v")
    val b = (4000 until 12000).map(i => s"u$i").toDF("v")
    val k = 256
    def hashes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sketches.kmvSketch(df, "v", k).select("h").collect().map(_.getLong(0)).toSeq
    val (ha, hb) = (hashes(a), hashes(b))
    assert(ha.size === k && hb.size === k)
    val estA = Sketches.kmvEstimate(ha, k)
    assert(math.abs(estA - 6000) / 6000 < 0.25, s"estA=$estA")
    // below-k sketches are exact
    val tiny = (0 until 40).map(i => s"t$i").toDF("v")
    assert(Sketches.kmvEstimate(hashes(tiny), k) === 40.0)
    // set ops: union 12000, jaccard 2000/12000 ≈ 0.167, intersect 2000
    val (unionEst, jac, interEst) = Sketches.kmvSetOps(ha, hb, k)
    assert(math.abs(unionEst - 12000) / 12000 < 0.25, s"union=$unionEst")
    assert(math.abs(interEst - 2000) / 2000 < 0.6,
      s"intersect=$interEst (k=256 → coarse but unbiased)")
    assert(jac > 0.05 && jac < 0.35, s"jaccard=$jac")
  }

  test("KMV grouped: slicing the grouped sketch == sketching the slice") {
    import spark.implicits._
    val df = ((0 until 3000).map(i => ("g0", s"u${i % 800}")) ++
      (0 until 3000).map(i => ("g1", s"w${i % 50}"))).toDF("grp", "v")
    val grouped = Sketches.kmvSketch(df, "v", 64, Seq("grp"))
    for (g <- Seq("g0", "g1")) {
      val slice = grouped.filter(col("grp") === g)
        .select("rank", "h").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val solo = Sketches.kmvSketch(
        df.filter(col("grp") === g).select("v"), "v", 64)
        .select("rank", "h").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(slice === solo, s"group $g differs")
    }
    // g1 has only 50 distinct → sketch is the full exact set
    assert(grouped.filter(col("grp") === "g1").count() === 50L)
  }

  test("grouped CMS: slicing the grouped sketch == sketching the slice") {
    import spark.implicits._
    val df = ((0 until 2000).map(i => ("g0", s"x${i % 300}")) ++
      (0 until 2000).map(i => ("g1", s"y${i % 40}"))).toDF("grp", "v")
    val grouped = Sketches.cmsSketchBy(df, Seq("grp"), "v", 4, 64)
    assert(grouped.count() === 2L * 4 * 64)
    for (g <- Seq("g0", "g1")) {
      val slice = grouped.filter(col("grp") === g)
        .select("r", "c", "cnt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val solo = Sketches.cmsSketch(
        df.filter(col("grp") === g).select("v"), "v", 4, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(slice === solo, s"group $g sketch differs from its solo sketch")
    }
  }

  test("CMS merge of two shards == sketch of the union") {
    import spark.implicits._
    val a = (0 until 5000).map(i => s"x${i % 700}").toDF("v")
    val b = (0 until 5000).map(i => s"x${i % 900}").toDF("v")
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsSketch(a, "v", 4, 256), Sketches.cmsSketch(b, "v", 4, 256)))
    val whole = Sketches.cmsSketch(a.unionAll(b), "v", 4, 256)
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq ===
      whole.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq)
  }

  test("histogram sketch: complete spine, merge of shards == sketch of union") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = (0 until 4000).map(i => ("g" + i % 3, rnd.nextDouble() * 100)).toDF("g", "v")
    val b = (0 until 4000).map(i => ("g" + i % 3, rnd.nextDouble() * 100)).toDF("g", "v")
    val sa = Sketches.histSketchBy(a, Seq("g"), "v", 0.0, 100.0, 64)
    val sb = Sketches.histSketchBy(b, Seq("g"), "v", 0.0, 100.0, 64)
    assert(sa.count() === 3 * 64L)
    val merged = Sketches.histMerge(Seq(sa, sb), Seq("g"))
    val whole = Sketches.histSketchBy(a.unionAll(b), Seq("g"), "v", 0.0, 100.0, 64)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq ===
      whole.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq)
  }

  test("histogram quantiles within one bin width of exact; clamping is total") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 20000).map(_ => ("k", rnd.nextDouble() * 50))
    // out-of-domain values clamp into the edge bins instead of vanishing
    val df = (rows :+ (("k", -5.0)) :+ (("k", 99.0))).toDF("g", "v")
    val (lo, hi, bins) = (0.0, 50.0, 64)
    val sk = Sketches.histSketchBy(df, Seq("g"), "v", lo, hi, bins)
    assert(sk.agg(sum("cnt")).collect()(0).getLong(0) === df.count())
    val qs = Sketches.histQuantiles(sk, Seq("g"), Seq(5000, 9000, 9900), lo, hi, bins)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.9, 0.99), 0.0)
    val binW = (hi - lo) / bins
    for ((bp, e) <- Seq(5000 -> exact(0), 9000 -> exact(1), 9900 -> exact(2)))
      assert(math.abs(qs(bp) - e) <= binW,
        s"p$bp est=${qs(bp)} exact=$e (> one bin width $binW)")
  }

  test("plan: sketch builds are partial-agg shuffles, no cartesian on data") {
    val df = values(2000, 500, 11)
    val hllPlan = Sketches.hllRegisters(df, "v", 128)
      .queryExecution.executedPlan.toString
    assert(hllPlan.contains("partial_max") || hllPlan.contains("partial"),
      s"no map-side combine in HLL build:\n$hllPlan")
    // (the depth×width spine crossJoin is a deliberate 4×256 cartesian
    // of two range() relations — constant-size, never data-dependent)
    val cmsPlan = Sketches.cmsSketch(df, "v", 4, 256)
      .queryExecution.executedPlan.toString
    assert(cmsPlan.contains("partial_count") || cmsPlan.contains("partial"),
      s"no map-side combine in CMS value rollup:\n$cmsPlan")
  }

  test("hllRollingDistinct: full-window day equals the whole-corpus sketch; window=1 equals per-day") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (1L, s"u$i")) ++
      (201 to 500).map(i => (2L, s"u$i")) ++
      (401 to 700).map(i => (3L, s"u$i"))
    val df = rows.toDF("day", "v")
    val byDay = Sketches.hllRegistersBy(df, Seq("day"), "v", m = 128)
    val rolled = Sketches.hllRollingDistinct(byDay, "day", 128, windowDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // day 3's trailing-7 window covers everything: its (zeros, s55) must
    // equal the ungrouped whole-corpus sketch's rollup
    val all = Sketches.hllRegisters(df, "v", m = 128)
      .collect().map(_.getLong(1))
    val s55All = all.map(r => 1L << (55 - r.toInt)).sum
    val zerosAll = all.count(_ == 0L).toLong
    assert((rolled(3L)._1, rolled(3L)._2) === ((zerosAll, s55All)))
    // window=1 degenerates to per-day sketches
    val solo = Sketches.hllRollingDistinct(byDay, "day", 128, windowDays = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // each day holds 300 distinct values; m=128 → ~9% stderr
    solo.values.foreach(est =>
      assert(math.abs(est / 1000.0 - 300.0) / 300.0 < 0.3, s"day est $est vs 300"))
    // the 700-distinct cumulative estimate tracks truth too
    assert(math.abs(rolled(3L)._3 / 1000.0 - 700.0) / 700.0 < 0.3,
      s"cumulative est ${rolled(3L)._3} vs 700")
  }

  test("kmvPairOverlap: unsaturated sketches give exact union/jaccard/intersection") {
    import spark.implicits._
    // A = 1..40, B = 21..60 (|∩| = 20, |∪| = 60), C = 100..109 disjoint
    val rows = (1 to 40).map(i => ("A", i.toLong)) ++
      (21 to 60).map(i => ("B", i.toLong)) ++
      (100 to 109).map(i => ("C", i.toLong))
    val sk = Sketches.kmvSketch(rows.toDF("g", "v"), "v",
      k = 64, groupCols = Seq("g"))
    val got = Sketches.kmvPairOverlap(sk, "g", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // all sketches unsaturated (<= 40 < 64): estimates are exact counts
    assert(got(("A", "B")) ===
      ((60L, 20L, 1000000L * 20 / 60, 60L, 20L)))
    assert(got(("A", "C")) === ((50L, 0L, 0L, 50L, 0L)))
    assert(got(("B", "C")) === ((50L, 0L, 0L, 50L, 0L)))
  }

  test("kmvPairOverlap: saturated pair estimates within 25% of truth (k=256)") {
    import spark.implicits._
    // A = 1..800, B = 401..1600: |∪| = 1600, |∩| = 400
    val rows = (1 to 800).map(i => ("A", i.toLong)) ++
      (401 to 1600).map(i => ("B", i.toLong))
    val sk = Sketches.kmvSketch(rows.toDF("g", "v"), "v",
      k = 256, groupCols = Seq("g"))
    val r = Sketches.kmvPairOverlap(sk, "g", 256).collect()(0)
    val (unionEst, interEst) = (r.getLong(5), r.getLong(6))
    // k=256 → ~6% stderr on the union, ~11% on the intersection
    assert(math.abs(unionEst - 1600.0) / 1600.0 < 0.25,
      s"union estimate $unionEst vs 1600")
    assert(math.abs(interEst - 400.0) / 400.0 < 0.35,
      s"intersection estimate $interEst vs 400")
  }
}
