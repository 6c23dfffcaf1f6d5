package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 optimization A/B probe: times CURRENT operator forms against
  * candidate restructures on the bench corpus, asserting output
  * identity via [[Bench.forcedCountHash]] (rows + bit_xor content
  * hash) before any timing is trusted. Each experiment prints one
  * line: `OPT <name> current=<s> variant=<s> rows=<n> hash_ok=<bool>`.
  *
  * Usage: sbt "runMain graft.OptProbe <exp1,exp2,...|all> [reps]"
  * (SPARK_GRAFT_SF_DIR selects the data, default sf0.1)
  */
object OptProbe {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** kCore with the u-side degree decided by a window over the
    * repartitioned adjacency (no u-side semi join, one scan per peel)
    * — candidate for Graph.kCore. */
  def kCoreWindowed(edges: DataFrame, k: Int, peels: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und0 = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    var adj = und0.select(col("a").as("u"), col("b").as("v"))
      .union(und0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    val n0 = adj.select("u").distinct().count()
    var prevEdges = adj.count()
    var continue = true
    for (_ <- 1 to peels if continue) {
      val wu = Window.partitionBy("u")
      val kept = adj
        .withColumn("_d", count(lit(1)).over(wu))
        .filter(col("_d") >= k)
        .select("u", "v")
      val alive = graft.util.Plan.broadcastIfBounded(
        kept.select("u").distinct(), n0)
      adj = kept
        .join(alive.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      val cur = adj.count()
      if (cur == prevEdges) continue = false
      prevEdges = cur
    }
    adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** pageRank with the per-iteration rank refresh as a broadcast hash
    * join (contrib is node-sized and already aggregated) instead of a
    * sort-merge left join that exchanges `nodes` every iteration. */
  def pageRankBcast(
      spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val base = (1000000000000L * 15L / 100L) / n
    var rank = nodes.withColumn("rank_micro", lit(1000000000000L / n))
    for (_ <- 1 to iterations) {
      val shares = graft.util.Plan.broadcastIfBounded(
        rank.join(outdeg, rank("node") === outdeg("src"))
          .select(col("src"),
            expr("(rank_micro * 85 div 100) div outdeg").as("share")),
        n, 32L)
      val contrib = e.join(shares, "src")
        .select(col("dst").as("node"), col("share"))
        .groupBy("node").agg(sum("share").as("inflow"))
      rank = nodes
        .join(graft.util.Plan.broadcastIfBounded(contrib, n, 16L),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_micro"))
    }
    rank
  }

  /** Assoc.rules with ONE shared exchange: the capped item set is
    * repartitioned by basket right after the checkpoint so the size
    * rollup and both self-join sides reuse a single exchange. */
  def assocRulesShared(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long, maxBasketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val it = baskets
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    // one exchange on basket; the window size-cap replaces the
    // aggregate+join of cappedItems and leaves the data
    // basket-partitioned for the pair self-join
    val ok = it
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("basket")))
      .filter(col("bsize") <= maxBasketSize)
      .select("basket", "item")
      .localCheckpoint()
    val nb = ok.agg(countDistinct("basket").as("n_baskets"))
    val ic = ok.groupBy("item").agg(count(lit(1)).as("n"))
    val pc = ok.select(col("basket"), col("item").as("item_a"))
      .join(ok.select(col("basket"), col("item").as("item_b")), "basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pc
      .join(ic.select(col("item").as("item_a"), col("n").as("n_a")), "item_a")
      .join(ic.select(col("item").as("item_b"), col("n").as("n_b")), "item_b")
      .crossJoin(broadcast(nb))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("CAST((1000000L * n_ab) div n_baskets AS BIGINT)").as("support_ppm"),
        expr("CAST((1000000L * n_ab) div n_a AS BIGINT)").as("conf_ab_ppm"),
        expr("CAST((1000000L * n_ab) div n_b AS BIGINT)").as("conf_ba_ppm"),
        expr("CAST((1000000L * n_ab * n_baskets) div (n_a * n_b) AS BIGINT)")
          .as("lift_micro"))
  }

  /** prefixFilterPairs with the shingle table localCheckpointed so the
    * tokenize+explode+hash pipeline runs once instead of per consumer
    * (probe/index legs, sizes, both verify joins). */
  def prefixPairsCkpt(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minJaccard: Double = 0.5,
      ckptOrdered: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.Dedup
    val toks = Dedup.shingles(docs, idCol, textCol, shingleSize)
      .select(col("doc_id"), col("sh").as("tok")).localCheckpoint()
    val dfTbl = toks.groupBy("tok").agg(count(lit(1)).as("tdf"))
    val wPos = Window.partitionBy("doc_id").orderBy(col("tdf"), col("tok"))
    val wSz = Window.partitionBy("doc_id")
    val ordered0 = toks.join(dfTbl, "tok")
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .withColumn("sz", count(lit(1)).over(wSz))
    val ordered = if (ckptOrdered) ordered0.localCheckpoint() else ordered0
    val jt = minJaccard
    val probe = ordered.filter(
      col("pos") <= col("sz") - ceil(lit(jt) * col("sz") - lit(1e-6)) + lit(1L))
    val index = ordered.filter(
      col("pos") <= col("sz") -
        ceil(lit(2.0 * jt / (1.0 + jt)) * col("sz") - lit(1e-6)) + lit(1L))
    val cand = index.select(col("doc_id").as("a0"), col("sz").as("_n0"),
        col("pos").as("_p0"), col("tok"))
      .join(probe.select(col("doc_id").as("b0"), col("sz").as("_n1"),
        col("pos").as("_p1"), col("tok")), "tok")
      .filter(col("_n0") < col("_n1") ||
        (col("_n0") === col("_n1") && col("a0") < col("b0")))
      .filter(col("_n0") >= ceil(lit(jt) * col("_n1") - lit(1e-6)))
      .groupBy("a0", "b0")
      .agg(count(lit(1)).as("_m"),
        max("_p0").as("_mp0"), max("_p1").as("_mp1"),
        first("_n0").as("_fn0"), first("_n1").as("_fn1"))
      .filter(col("_m") +
        least(col("_fn0") - col("_mp0"), col("_fn1") - col("_mp1")) >=
        ceil(lit(jt / (1.0 + jt)) * (col("_fn0") + col("_fn1")) - lit(1e-6)))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(toks.select(col("doc_id").as("a"), col("tok")), "a")
      .join(toks.select(col("doc_id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("n_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("n_b")), "b")
      .withColumn("jaccard_bp",
        expr("n_shared * 10000 div (n_a + n_b - n_shared)"))
      .filter(col("jaccard_bp") >= (minJaccard * 10000).toLong)
      .select("a", "b", "n_a", "n_b", "n_shared", "jaccard_bp")
  }

  /** Co-occurrence pair edges by per-group collect+zip-explode instead
    * of the groupwise self-join (the candidatePairs finding applied to
    * the co-purchase edge build): one exchange on the group key, pairs
    * enumerated from the sorted in-group array. Emits src < dst with
    * the same multiset as the self-join form. */
  def pairsByGroup(items: DataFrame, grpCol: String, itemCol: String): DataFrame =
    items
      .groupBy(col(grpCol).as("_g"))
      .agg(sort_array(collect_set(col(itemCol))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ps) - 2), i -> struct(ps[i] AS src, slice(ps, i + 2, size(ps)) AS rest))")).as("e"))
      .select(col("e.src").as("src"), explode(col("e.rest")).as("dst"))

  def main(args: Array[String]): Unit = {
    val exps = args.headOption.getOrElse("all")
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def want(e: String) = exps == "all" || exps.split(",").contains(e)

    def lineitemEdges(): DataFrame = {
      val lp = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      lp.select(col("ok"), col("pk").as("src"))
        .join(lp.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") < col("dst")).select("src", "dst")
    }

    def ab(name: String, current: () => DataFrame, variant: () => DataFrame): Unit = {
      // interleave current/variant reps so ambient drift hits both
      val cur = scala.collection.mutable.ListBuffer.empty[Double]
      val vr = scala.collection.mutable.ListBuffer.empty[Double]
      var ch: (Long, Long) = null
      var vh: (Long, Long) = null
      for (_ <- 1 to reps) {
        val (tc, hc) = time(Bench.forcedCountHash(current()))
        val (tv, hv) = time(Bench.forcedCountHash(variant()))
        cur += tc; vr += tv; ch = hc; vh = hv
      }
      println(f"OPT $name current=${cur.min}%.3f variant=${vr.min}%.3f " +
        f"cur_all=${cur.map(t => f"$t%.2f").mkString(",")} var_all=${vr.map(t => f"$t%.2f").mkString(",")} " +
        s"rows=${ch._1} hash_ok=${ch == vh}")
    }

    if (want("kcore")) ab("kcore",
      () => graft.operators.Graph.kCore(lineitemEdges(), k = 80, peels = 8),
      () => kCoreWindowed(lineitemEdges(), k = 80, peels = 8))

    if (want("pagerank")) {
      def edges = {
        val pairs = Tables(spark, sfDir, "lineitem").select(
          concat(lit("p"), col("l_partkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        pairs.select(col("a").as("src"), col("b").as("dst"))
          .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      }
      ab("pagerank",
        () => graft.operators.Graph.pageRank(spark, edges, iterations = 5),
        () => pageRankBcast(spark, edges, iterations = 5))
    }

    // phase:<query> — run one declared query with a job listener that
    // prints per-job wall time + call site, and split construction
    // (eager work inside the query fn) from the final forced action.
    args.headOption.filter(_.startsWith("phase:")).foreach { a =>
      val name = a.stripPrefix("phase:")
      val fn = SparkEntry.queries(name)
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val done = scala.collection.mutable.ListBuffer.empty[(Int, Double, String)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(je.jobId)).foreach { case (t0, site) =>
            done.synchronized {
              done += ((je.jobId, (System.nanoTime() - t0) / 1e9, site))
            }
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      for (r <- 1 to reps) {
        done.synchronized(done.clear())
        val (tc, df) = time(fn(spark, sfDir))
        val (ta, _) = time(Bench.forcedCount(df))
        Thread.sleep(300) // let listener events drain
        println(f"PHASE $name rep=$r construct=$tc%.3f action=$ta%.3f total=${tc + ta}%.3f")
        done.synchronized(done.toList).sortBy(_._1).foreach { case (id, sec, site) =>
          println(f"  job=$id%-4d ${sec}%7.3f s  $site")
        }
      }
      spark.sparkContext.removeSparkListener(listener)
      spark.stop()
      return
    }

    if (want("prefix1")) ab("prefix1",
      () => graft.pipeline.Dedup.prefixFilterPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text", 3, 0.5),
      () => prefixPairsCkpt(
        Tables(spark, sfDir, "documents"), "doc_id", "text", 3, 0.5))

    if (want("prefix2")) ab("prefix2",
      () => graft.pipeline.Dedup.prefixFilterPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text", 3, 0.5),
      () => prefixPairsCkpt(
        Tables(spark, sfDir, "documents"), "doc_id", "text", 3, 0.5,
        ckptOrdered = true))

    if (want("triedge")) ab("triedge",
      () => {
        val lp = Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        val e = lp.select(col("ok"), col("pk").as("src"))
          .join(lp.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst")).select("src", "dst")
        graft.operators.Graph.clusteringCoeff(e)
      },
      () => graft.operators.Graph.clusteringCoeff(
        pairsByGroup(Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")), "l_orderkey", "l_partkey")))

    if (want("kcoreedge")) ab("kcoreedge",
      () => {
        val lp = Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        val e = lp.select(col("ok"), col("pk").as("src"))
          .join(lp.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst")).select("src", "dst")
        graft.operators.Graph.kCore(e, k = 80, peels = 8)
      },
      () => graft.operators.Graph.kCore(
        pairsByGroup(Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")), "l_orderkey", "l_partkey"),
        k = 80, peels = 8))

    if (want("assoc")) ab("assoc",
      () => graft.operators.Assoc.rules(
        Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
        "basket", "item", minPairCount = 2L, maxBasketSize = 8),
      () => assocRulesShared(
        Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
        "basket", "item", minPairCount = 2L, maxBasketSize = 8))

    spark.stop()
  }
}
