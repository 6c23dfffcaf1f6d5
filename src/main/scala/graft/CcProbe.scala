package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated micro-bench for [[graft.pipeline.Dedup.duplicateClusters]]:
  * times ONLY the star-contraction rounds on a synthetic pair graph
  * shaped like the ×100 ScaleProbe worst case (dense cliques from
  * planted duplicate families) PLUS the long-thin-chain worst case the
  * O(log n) algorithm exists for — without paying the ~130 s LSH pair
  * chain that dominates the end-to-end `p_dedup_groups` number.
  *
  * Usage: sbt "runMain graft.CcProbe [nFamilies] [chainLen] [reps]"
  * (defaults 5000 / 10000 / 3 → 225k clique edges + 10k chain edges
  * over 500k docs, the ×100 shape).
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nFam = args.headOption.map(_.toInt).getOrElse(5000)
    val chainLen = if (args.length > 1) args(1).toInt else 10000
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val nDocs = 500000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
    // 10-cliques rooted at family*100 (the ScaleProbe planted shape)
    val cliques = spark.range(nFam)
      .select(explode(expr(
        """flatten(transform(sequence(0, 8), i ->
          |  transform(sequence(cast(i as int) + 1, 9), j ->
          |    struct(id * 100 + i * 10 AS a, id * 100 + j * 10 AS b))))"""
          .stripMargin)).as("e"))
      .select(col("e.a"), col("e.b"))
    // one long thin chain through the upper id range: the O(diameter)
    // killer for naive label propagation
    val chain = spark.range(chainLen)
      .select((lit(nDocs - chainLen - 1) + col("id")).as("a"),
        (lit(nDocs - chainLen) + col("id")).as("b"))
    val pairs = cliques.union(chain)

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.duplicateClusters(docs, "doc_id", pairs)
        .filter(col("keep")).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"CC_PROBE survivors=$n t=$t%.2f " +
        s"rounds=${graft.pipeline.Dedup.lastClusterRounds}")
      t
    }
    println(f"CC_PROBE nFam=$nFam chain=$chainLen best=${times.min}%.3f " +
      f"rounds=${graft.pipeline.Dedup.lastClusterRounds} " +
      f"times=${times.map(t => f"$t%.2f").mkString(",")}")

    // chain-scaling sweep: pin the claimed O(log diameter) round growth
    // with the clique load held fixed — rounds should step by ~1 per 2×
    // chain length, not double
    if (args.isEmpty) {
      Seq(100, 1000, 10000, 100000).foreach { cl =>
        val ch = spark.range(cl.toLong)
          .select((lit(nDocs - cl - 1) + col("id")).as("a"),
            (lit(nDocs - cl) + col("id")).as("b"))
        val t0 = System.nanoTime()
        graft.pipeline.Dedup
          .duplicateClusters(docs, "doc_id", cliques.union(ch), maxIters = 60)
          .filter(col("keep")).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"CC_SWEEP chain=$cl rounds=" +
          f"${graft.pipeline.Dedup.lastClusterRounds} t=$t%.2f")
      }
    }
    spark.stop()
  }
}
