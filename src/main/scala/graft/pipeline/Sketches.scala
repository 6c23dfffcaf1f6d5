package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency/cardinality sketches — HyperLogLog registers
  * (Flajolet et al. 2007) and Count-Min cells (Cormode & Muthukrishnan
  * 2005) — built as plain aggregations so they are (a) distributed by
  * construction (map-side partial max/sum, one shuffle keyed on the
  * bounded register/cell id), and (b) bit-replayable by the SQL oracle:
  * every hash is the md5-hex→60-bit-integer recipe both engines compute
  * byte-identically, and the sketch state is pure integers.
  *
  * Why not `approx_count_distinct`/datasketches: their hash (xxhash/
  * murmur) and register encodings are engine-private — fine in
  * production, untestable against an independent oracle. These sketches
  * trade a slower hash (md5) for a state the gate can verify cell by
  * cell; the ALGORITHM (and its scale shape) is exactly the production
  * one.
  *
  * The 100 TB story is mergeability: each sketch is a fixed-size
  * integer table (m registers / depth×width cells) aggregated with
  * max/sum — both commutative monoids, so partition-local sketches
  * merge losslessly ([[hllMerge]], [[cmsMerge]]) and a day×shard sketch
  * matrix rolls up to any slice without touching raw data again.
  */
object Sketches {

  /** 60-bit non-negative deterministic hash of a string SQL expression,
    * identical in Spark and DuckDB (`('0x' || substr(md5(x),1,15))::BIGINT`). */
  private def h60(xSql: String): Column =
    expr(s"CAST(conv(substr(md5($xSql), 1, 15), 16, 10) AS BIGINT)")

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog register table over the values of `valueCol`:
    * exactly `m` rows `(bucket, register)`, both integers; empty
    * buckets surface with register 0 (a complete, merge-ready sketch).
    *
    * Register math on the 60-bit hash: `bucket = h % m`,
    * `rest = h div m` (a `60 − log2(m)`-bit value), and the register
    * candidate is the position of `rest`'s highest set bit counted
    * from the top — `W − bitlength(rest) + 1`, with `rest = 0 → W+1`.
    * `bitlength` is `length(bin(x))` in both engines (no padding,
    * `bin(0) = "0"`).
    *
    * One explode-free aggregation: map-side partial max per bucket,
    * shuffle bounded by m rows. */
  def hllRegisters(df: DataFrame, valueCol: String, m: Int = 128): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [2, 4096], got $m")
    val w = 60 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
    val spark = df.sparkSession
    val hashed = rhoPerRow(df, valueCol, m, w)
      .groupBy("bucket").agg(max(col("_rho")).cast("long").as("register"))
    spark.range(m).select(col("id").as("bucket"))
      .join(hashed, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
  }

  /** Grouped HLL — one register table PER KEY (`distinct users per
    * event_type/day`, the production shape): `|groups| × m` rows
    * `(groupCols…, bucket, register)`, empty buckets included per
    * group. Same merge law per group. Shuffle is keyed on
    * (group, bucket) with map-side partial max — per-key sketches of a
    * 100 TB stream cost one bounded aggregation. */
  def hllRegistersBy(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      m: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "use hllRegisters for the ungrouped sketch")
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [2, 4096], got $m")
    val w = 60 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
    val spark = df.sparkSession
    val hashed = rhoPerRow(df, valueCol, m, w, groupCols)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("_rho")).cast("long").as("register"))
    val spine = df.select(groupCols.map(col): _*).distinct()
      .crossJoin(spark.range(m).select(col("id").as("bucket")))
    spine.join(hashed, groupCols :+ "bucket", "left")
      .select((groupCols :+ "bucket").map(col) :+
        coalesce(col("register"), lit(0L)).as("register"): _*)
  }

  /** In-plan per-group cardinality estimates from a grouped register
    * table: `(groupCols…, est)` with the same bias-corrected harmonic
    * mean + linear-counting correction as [[hllEstimate]]. Float output
    * — diagnostics, not a hash-compared surface. */
  def hllEstimateBy(
      registers: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr("power(2.0, -CAST(register AS DOUBLE))")).as("_s"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("_zeros"))
      .select(groupCols.map(col) :+
        when(lit(alpha * m * m) / col("_s") <= lit(2.5 * m) && col("_zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("_zeros")))
          .otherwise(lit(alpha * m * m) / col("_s")).as("est"): _*)
  }

  // ------------------------------------------------------------- KMV

  /** K-minimum-values sketch (Bar-Yossef et al. 2002): the k smallest
    * 60-bit hashes of the DISTINCT values, per group — the
    * set-operation sketch HLL isn't: two KMVs intersect/union by plain
    * set algebra on their hash lists, so distinct-overlap questions
    * ("how many users do segment A and B share?") run on k-row
    * sketches instead of corpus joins.
    *
    * Output: `(groupCols…, rank, h)` with rank 1..k by hash order —
    * pure integers, oracle-replayable as a row_number over distinct
    * hashes. Build = distinct + window top-k per group (one shuffle on
    * the group key; ungrouped uses a single constant key — fine because
    * the post-distinct hash stream is tiny relative to the corpus). */
  def kmvSketch(
      df: DataFrame, valueCol: String, k: Int = 256,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(k >= 8, s"k must be >= 8, got $k")
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .select(groupCols.map(col) :+
        h60(s"CAST(`$valueCol` AS STRING)").as("h"): _*)
      .distinct()
    if (groupCols.isEmpty) {
      // orderBy+limit plans as TakeOrderedAndProject — per-partition
      // partial top-k, NOT a global single-partition sort; the rank
      // window then runs over ≤ k rows
      hashed.orderBy(col("h")).limit(k)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("h"))).cast("long"))
    } else {
      // per-group window top-k (one shuffle on the group key; a hot
      // group sorts its own distinct-hash stream — same caveat and
      // salting recipe as Mixing.fixedSizeSample)
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
      hashed.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    }
  }

  /** Distinct-cardinality estimate from a KMV hash list: if the sketch
    * saturated (n == k), `(k-1) · 2^60 / h_(k)`; otherwise the distinct
    * count is exact (= n). */
  def kmvEstimate(hashes: Seq[Long], k: Int): Double = {
    require(hashes.size <= k, s"sketch larger than k: ${hashes.size} > $k")
    if (hashes.size < k) hashes.size.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / hashes.max.toDouble
  }

  /** Union/intersection estimates for two KMV sketches (driver-side —
    * inputs are ≤ k longs each): combine to the k smallest of the
    * union; Jaccard = |shared ∩ combined| / k; intersection =
    * Jaccard × union estimate. The standard KMV set algebra. */
  def kmvSetOps(a: Seq[Long], b: Seq[Long], k: Int): (Double, Double, Double) = {
    val union = (a ++ b).distinct.sorted.take(k)
    val unionEst = kmvEstimate(union, k)
    val shared = a.toSet.intersect(b.toSet)
    val jaccard =
      if (union.isEmpty) 0.0
      else shared.count(union.toSet).toDouble / union.size
    (unionEst, jaccard, jaccard * unionEst)
  }

  /** Rolling-window distinct cardinality — "distinct users per day,
    * trailing 7 days" — computed ENTIRELY from per-day HLL register
    * tables: the per-bucket rolling max over a day RANGE window IS the
    * sliding-union sketch (max is the HLL merge law), so a 100 TB
    * stream pays one corpus aggregation ([[hllRegistersBy]] keyed on
    * day) and the rolling merge runs over `days × m` integers.
    *
    * Determinism contract: outputs are integers. The harmonic sum is
    * kept EXACT by scaling — `s55 = Σ 2^(55−register)` (register ≤ 54
    * for m ≥ 128's 53-bit rest-width, so terms are exact int64 and the
    * 128-term sum stays < 2^63) — and the estimate is quantized to
    * milli-units with the alpha constant written as the same literal
    * expression in both engines:
    * `est = α·m²·2^55 / s55`, small-range-corrected to
    * `m·ln(m / zeros)` when `est ≤ 2.5m` and zeros > 0 (the standard
    * Flajolet correction; ln replays per the established ln-parity
    * recipe). Output: `(dayCol, n_zeros, s55, est_milli)`.
    *
    * `registersByDay` must be a complete (day, bucket, register) spine
    * — exactly what [[hllRegistersBy]] grouped on the day column
    * emits. `windowDays` is the trailing-window width in days
    * (RANGE-based: missing days simply contribute nothing). */
  def hllRollingDistinct(
      registersByDay: DataFrame, dayCol: String, m: Int,
      windowDays: Int): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [128, 4096], got $m")
    require(windowDays >= 1, s"windowDays >= 1, got $windowDays")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket").orderBy(col(dayCol))
      .rangeBetween(-(windowDays - 1), 0)
    val alpha = s"(0.7213 / (1.0 + 1.079 / $m.0))"
    val raw = s"$alpha * $m.0 * $m.0 * 36028797018963968.0 / s55"
    registersByDay
      .withColumn("_rr", max("register").over(w))
      .groupBy(dayCol).agg(
        sum(when(col("_rr") === 0, 1L).otherwise(0L)).as("n_zeros"),
        sum(expr("shiftleft(1L, 55 - CAST(_rr AS INT))")).as("s55"))
      .withColumn("est_milli", expr(
        s"""CASE WHEN $raw <= ${5 * m / 2}.0 AND n_zeros > 0
           |THEN CAST(round($m.0 * ln($m.0 / n_zeros) * 1000) AS BIGINT)
           |ELSE CAST(round($raw * 1000) AS BIGINT) END""".stripMargin))
  }

  /** Distributed pairwise set algebra over grouped KMV sketches — the
    * "audience overlap matrix" ("how many distinct users do every two
    * segments share?") computed entirely from `|groups|·k`-row
    * sketches, never a corpus self-join. For every unordered group
    * pair (a < b): combine both hash lists, keep the k smallest of
    * the union, count how many of those appear in BOTH sketches, and
    * turn the counts into integer estimates:
    * `jaccard_ppm = (10^6·n_shared) div n_union_k`,
    * `union_est  = n` exact while unsaturated, else
    * `round((k−1)·2^60 / h_(k))` (one f64 multiply + divide of exact
    * integers — deterministic in any IEEE engine; 2^60 is an exact
    * double literal, no pow()),
    * `inter_est  = (n_shared·union_est) div n_union_k`.
    *
    * Scale shape: sketches are group-bounded (≤ k rows each), so the
    * pair fan-out is |pairs|·2k rows — driver-independent DataFrame
    * algebra with one window per pair key; the corpus is touched only
    * by [[kmvSketch]]'s single distinct pass. Output:
    * `(group_a, group_b, n_union_k, n_shared, jaccard_ppm, union_est,
    * inter_est)`. */
  def kmvPairOverlap(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = sketch.select(col(groupCol).cast("string").as("g"), col("h"))
    val groups = sk.select("g").distinct()
    val pairs = groups.select(col("g").as("group_a"))
      .join(groups.select(col("g").as("group_b")),
        col("group_a") < col("group_b"))
    // tag each hash with which side(s) it came from, per pair
    val streamA = pairs.join(sk, col("group_a") === col("g"))
      .select(col("group_a"), col("group_b"), col("h"), lit(1).as("_a"), lit(0).as("_b"))
    val streamB = pairs.join(sk, col("group_b") === col("g"))
      .select(col("group_a"), col("group_b"), col("h"), lit(0).as("_a"), lit(1).as("_b"))
    val merged = streamA.union(streamB)
      .groupBy("group_a", "group_b", "h")
      .agg(max("_a").as("in_a"), max("_b").as("in_b"))
    val w = Window.partitionBy("group_a", "group_b").orderBy(col("h"))
    val topk = merged.withColumn("_r", row_number().over(w)).filter(col("_r") <= k)
    topk.groupBy("group_a", "group_b").agg(
      count(lit(1)).as("n_union_k"),
      sum((col("in_a") * col("in_b")).cast("long")).as("n_shared"),
      max(col("h")).as("_hk"))
      .select(col("group_a"), col("group_b"), col("n_union_k"),
        col("n_shared"),
        expr("CAST((1000000L * n_shared) div n_union_k AS BIGINT)")
          .as("jaccard_ppm"),
        when(col("n_union_k") < k, col("n_union_k")).otherwise(
          expr(s"CAST(round((${k - 1}.0 * 1152921504606846976.0) / _hk) AS BIGINT)"))
          .as("union_est"))
      .withColumn("inter_est",
        expr("CAST((n_shared * union_est) div n_union_k AS BIGINT)"))
  }

  /** Per-row (groupCols…, bucket, _rho) — the shared HLL map phase.
    * `valueCol` is cast to string so any hashable column type works. */
  private def rhoPerRow(
      df: DataFrame, valueCol: String, m: Int, w: Int,
      groupCols: Seq[String] = Nil): DataFrame =
    df.select(groupCols.map(col) :+
        h60(s"CAST(`$valueCol` AS STRING)").as("_h"): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("_h") % m).as("bucket"), expr(s"_h DIV $m").as("_rest")): _*)
      .select(groupCols.map(col) ++ Seq(col("bucket"),
        when(col("_rest") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(expr("bin(_rest)"))).as("_rho")): _*)

  /** Merge register tables (same m): per-bucket max — the lossless HLL
    * union that makes per-partition/per-day sketches roll up. */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("bucket").agg(max("register").as("register"))

  /** Cardinality estimate from a register table (driver-side: the
    * input is m rows — a driver-known bound). Standard HLL bias-corrected
    * harmonic mean + linear-counting small-range correction. */
  def hllEstimate(registers: DataFrame, m: Int): Double = {
    val regs = registers.select("register").collect().map(_.getLong(0))
    require(regs.length == m, s"expected $m registers, got ${regs.length}")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val zeros = regs.count(_ == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  // ---------------------------------------------------------- Count-Min

  /** Count-Min cell table over the values of `valueCol`: exactly
    * `depth × width` rows `(r, c, cnt)`, all integers; empty cells
    * surface with cnt 0. Row-r hash salts the value with `#cms{r}`.
    *
    * Build shape: exact per-value rollup first (one shuffle over
    * values, map-side combine), THEN the depth-explode over the
    * (much smaller) distinct-value table, then the bounded (r,c)
    * rollup — the explode never touches raw-corpus cardinality. */
  def cmsSketch(
      df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2 && width <= 65536, s"width in [2,65536], got $width")
    val spark = df.sparkSession
    val counts = df.groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_cnt"))
    val cells = counts
      .select(col("_v"), col("_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        (h60(s"concat(_v, '#cms', r)") % width).as("c"), col("_cnt"))
      .groupBy("r", "c").agg(sum("_cnt").as("cnt"))
    spark.range(depth).select(col("id").as("r"))
      .crossJoin(spark.range(width).select(col("id").as("c")))
      .join(cells, Seq("r", "c"), "left")
      .select(col("r"), col("c"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Grouped Count-Min — one cell table PER KEY (heavy hitters per
    * day/language, the production shape): `|groups| × depth × width`
    * rows. Same build discipline: per-(group, value) exact rollup
    * first, depth-explode over the distinct table only. */
  def cmsSketchBy(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(groupCols.nonEmpty, "use cmsSketch for the ungrouped sketch")
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2 && width <= 65536, s"width in [2,65536], got $width")
    val spark = df.sparkSession
    val counts = df.groupBy(groupCols.map(col) :+ col(valueCol).as("_v"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val cells = counts
      .select(groupCols.map(col) ++ Seq(col("_v"), col("_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("r")): _*)
      .select(groupCols.map(col) ++ Seq(col("r"),
        (h60(s"concat(_v, '#cms', r)") % width).as("c"), col("_cnt")): _*)
      .groupBy((groupCols ++ Seq("r", "c")).map(col): _*)
      .agg(sum("_cnt").as("cnt"))
    val spine = df.select(groupCols.map(col): _*).distinct()
      .crossJoin(spark.range(depth).select(col("id").as("r")))
      .crossJoin(spark.range(width).select(col("id").as("c")))
    spine.join(cells, groupCols ++ Seq("r", "c"), "left")
      .select((groupCols ++ Seq("r", "c")).map(col) :+
        coalesce(col("cnt"), lit(0L)).as("cnt"): _*)
  }

  /** Merge cell tables (same depth/width): per-cell sum. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `probes(probeCol)` against a cell
    * table: `est = min_r sketch[r][h_r(v)]` — the one-sided CMS read
    * (never under-counts; over-counts by collision mass). The probe
    * side fans out `depth` rows per probe and equi-joins the sketch on
    * (r, c); with the sketch's `depth × width` bound it broadcasts. */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, probeCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val keyed = probes
      .select(col(probeCol),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col(probeCol), col("r"),
        (h60(s"concat(`$probeCol`, '#cms', r)") % width).as("c"))
    keyed.join(broadcast(sketch), Seq("r", "c"))
      .groupBy(probeCol).agg(min("cnt").as("est"))
  }

  // ------------------------------------------------- Histogram quantiles

  /** Equi-width histogram sketch — the mergeable QUANTILE member of the
    * family (HLL = cardinality, CMS = frequency, KMV = set algebra,
    * this = distribution): per group, exactly `bins` rows
    * `(groupCols…, bin, cnt)` over a FIXED `[lo, hi)` domain shared by
    * every group and partition, so sketches merge by per-bin sum
    * ([[histMerge]]) — a day×shard histogram matrix rolls up to any
    * slice without re-reading raw data, and quantile reads run on
    * `|groups| × bins` integers instead of a corpus sort.
    *
    * `lo`/`hi` are explicit (domain knowledge, or one bounded min/max
    * pass) rather than derived per call: at 100 TB the fixed domain is
    * what MAKES the sketch mergeable across days — per-batch min/max
    * would give every batch different bin edges. Values outside
    * `[lo, hi)` clamp into the edge bins (the standard fixed-domain
    * histogram convention), so the sketch is total.
    *
    * State is pure integers; the bin rule
    * `least(greatest(floor((v - lo) / step), 0), bins-1)` is the same
    * expression the SQL oracle computes, so the gate verifies the
    * sketch cell by cell. One shuffle, map-side combine, spine-joined
    * so empty bins surface with cnt 0 (a complete, merge-ready sketch). */
  def histSketchBy(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins in [2,4096], got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val spark = df.sparkSession
    val step = (hi - lo) / bins
    val binCol = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(step)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long").as("bin")
    val counts = df.select(groupCols.map(col) :+ binCol: _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val spine0 = spark.range(bins).select(col("id").as("bin"))
    val spine =
      if (groupCols.isEmpty) spine0
      else df.select(groupCols.map(col): _*).distinct().crossJoin(spine0)
    spine.join(counts, groupCols :+ "bin", "left")
      .select((groupCols :+ "bin").map(col) :+
        coalesce(col("cnt"), lit(0L)).as("cnt"): _*)
  }

  /** Merge histogram sketches built on the SAME `[lo, hi)` / bins
    * domain: per-(group, bin) sum — the lossless union. */
  def histMerge(sketches: Seq[DataFrame], groupCols: Seq[String] = Nil): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Interpolated quantile read from a histogram sketch: for each group
    * and each requested quantile (basis points, e.g. 5000 = p50), find
    * the bin holding rank `ceil(q·n)` of the per-group cumulative
    * counts and interpolate linearly inside it:
    * `lo + step · (bin + (target − cum_before) / cnt)`.
    *
    * Every intermediate is an integer except the final scalar
    * expression, whose operation order is fixed — so an independent SQL
    * engine replays the estimate bit-for-bit (the gate compares it in
    * integer micro-units). The read costs a window over
    * `|groups| × bins` rows — sketch-sized, never corpus-sized. */
  def histQuantiles(
      sketch: DataFrame, groupCols: Seq[String], qBasisPoints: Seq[Int],
      lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    require(qBasisPoints.nonEmpty && qBasisPoints.forall(q => q > 0 && q <= 10000),
      "quantiles are basis points in (0, 10000]")
    import org.apache.spark.sql.expressions.Window
    val step = (hi - lo) / bins
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum_before", col("cum") - col("cnt"))
    cum
      .select(cum.columns.toIndexedSeq.map(col) :+
        explode(array(qBasisPoints.map(lit): _*)).as("q_bp"): _*)
      .withColumn("target",
        ceil(col("q_bp") / lit(10000.0) * col("n")))
      .filter(col("cum") >= col("target") && col("cum_before") < col("target"))
      .withColumn("est",
        lit(lo) + lit(step) * (col("bin") +
          (col("target") - col("cum_before")).cast("double") /
            col("cnt").cast("double")))
      .select((groupCols :+ "q_bp").map(col) :+ col("bin") :+ col("est"): _*)
  }
}
