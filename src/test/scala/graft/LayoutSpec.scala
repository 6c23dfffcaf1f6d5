package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("zValue is the Morton interleave on a hand-checked grid") {
    import spark.implicits._
    // 4x4 grid, 2 bits/dim: zval must follow the classic Z curve
    val d = (for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y))
      .toDF("x", "y")
    val out = Layout.zValue(d, Seq("x", "y"), bits = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("zval")).toMap
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L) // x is bit 0
    assert(out((0L, 1L)) === 2L) // y is bit 1
    assert(out((1L, 1L)) === 3L)
    assert(out((2L, 0L)) === 4L)
    assert(out((3L, 3L)) === 15L)
    // bijective on the grid
    assert(out.values.toSeq.sorted === (0L until 16L).toSeq)
  }

  test("co-bucketed tables join with zero exchanges and zero sorts") {
    import spark.implicits._
    val orders = (0L until 2000L).map(i => (i, s"o$i")).toDF("key", "o")
    val items = (0L until 6000L).map(i => (i % 2000L, i * 1.5)).toDF("key", "v")
    Layout.bucketedWrite(orders, "graft_bkt_orders", "key", 8)
    Layout.bucketedWrite(items, "graft_bkt_items", "key", 8)
    // force the merge join (the broadcast path would hide the bucket
    // benefit this spec is about); planning happens at executedPlan
    // access, so the conf must be set around it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("graft_bkt_orders")
          .join(spark.table("graft_bkt_items"), "key")
        (j, j.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // the bucket files ARE the shuffle output: no Exchange anywhere,
    // and the sortBy metadata also removes the SMJ's sorts
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() === 6000L)
    spark.sql("DROP TABLE graft_bkt_orders")
    spark.sql("DROP TABLE graft_bkt_items")
  }

  test("zorderRepartition prunes band predicates on BOTH dimensions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val side = 1 << 14
    val d = (0 until 20000).map(_ => (rnd.nextInt(side).toLong,
      rnd.nextInt(side).toLong)).toDF("x", "y")
    // per-partition min/max envelopes = what parquet row-group stats
    // would expose to a scan's predicate pruning
    def envelopes(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // avg partitions touched by a 1/16-wide band on one dimension: the
    // skipping a `WHERE dim BETWEEN a AND b` scan achieves
    def touched(env: Array[(Long, Long, Long, Long)], onX: Boolean): Double = {
      val bands = (0 until 20).map(_ => rnd.nextInt(side - side / 16).toLong)
      bands.map { a =>
        env.count { case (x0, x1, y0, y1) =>
          val (lo, hi) = if (onX) (x0, x1) else (y0, y1)
          hi >= a && lo <= a + side / 16
        }
      }.sum.toDouble / bands.size
    }
    val zEnv = envelopes(Layout.zorderRepartition(d, Seq("x", "y"), 16, bits = 10)
      .select("x", "y"))
    val linEnv = envelopes(d.repartitionByRange(16, col("x")))
    // linear: optimal on x (~2 of 16) but a y-band touches ALL 16.
    // z-order: both dimensions prune — its WORST dimension must beat
    // linear's worst by 2x (envelope area is conserved by any layout;
    // balanced pruning is the whole point of the Z curve)
    val zWorst = math.max(touched(zEnv, onX = true), touched(zEnv, onX = false))
    val linWorst = math.max(touched(linEnv, onX = true), touched(linEnv, onX = false))
    assert(linWorst > 15.0, s"sanity: linear's y-band should touch ~all: $linWorst")
    assert(zWorst < linWorst / 2.0,
      s"z-order worst-dimension pruning $zWorst not better than linear $linWorst")
  }

  test("partitionedWrite: partition predicates prune at planning time") {
    import spark.implicits._
    val path = "/tmp/graft_layout_partwrite"
    graft.util.Fs.deleteRecursively(path)
    val df = (0L until 2000L)
      .map(i => (i, s"src${i % 8}", i * 3))
      .toDF("id", "source", "v")
    Layout.partitionedWrite(df, path, Seq("source"))
    val read = spark.read.parquet(path).filter(col("source") === "src3")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src3"),
      s"source predicate must prune partitions at planning time:\n$plan")
    // the pruned scan must not carry the predicate as a data filter —
    // partition columns aren't in the data files at all
    assert(!plan.contains("PushedFilters: [IsNotNull(source)"),
      s"partition predicate leaked into data-filter pushdown:\n$plan")
    assert(read.count() === 250L)
  }

  test("compactTo collapses a many-file table to the byte-planned count") {
    import spark.implicits._
    val in = "/tmp/graft_layout_compact_in"
    val out = "/tmp/graft_layout_compact_out"
    graft.util.Fs.deleteRecursively(in)
    graft.util.Fs.deleteRecursively(out)
    // 64 tiny files
    (0L until 10000L).map(i => (i, s"payload $i")).toDF("id", "v")
      .repartition(64).write.parquet(in)
    val inBytes = graft.util.Fs.sizeBytes(in)
    assert(inBytes > 0L)
    val n = graft.operators.Layout.compactTo(spark, in, out,
      targetBytes = 1024 * 1024)
    assert(n === math.max(1, math.ceil(inBytes / (1024.0 * 1024))).toInt)
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files === n, s"expected $n output files, got $files")
    // row fidelity
    assert(spark.read.parquet(out).count() === 10000L)
    // coalesce cannot RAISE the partition count: with a 1-partition
    // input and a tiny targetBytes the plan wants many files but the
    // write emits one — the return value must report the actual count
    val in1 = "/tmp/graft_layout_compact_in1"
    val out1 = "/tmp/graft_layout_compact_out1"
    graft.util.Fs.deleteRecursively(in1)
    graft.util.Fs.deleteRecursively(out1)
    (0L until 200000L).map(i => (i, s"padded payload string $i"))
      .toDF("id", "v").coalesce(1).write.parquet(in1)
    val n1 = graft.operators.Layout.compactTo(spark, in1, out1,
      targetBytes = 1024 * 1024)
    val files1 = new java.io.File(out1).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(n1 === files1, s"returned $n1 but wrote $files1 files")
  }
}
