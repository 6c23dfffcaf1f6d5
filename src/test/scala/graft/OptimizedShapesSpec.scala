package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization-round shape pins: each test guards one restructure
  * that was proven output-identical by interleaved A/B
  * (OPTIMIZATION_r19.md) — identity against the straightforward form
  * on randomized data, plus plan assertions that the removed shuffles
  * and payload-carrying exchanges never silently reappear. */
class OptimizedShapesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "4m")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("coOccurrenceEdges == groupwise self-join on randomized baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // baskets of size 0..6 with duplicate item rows (collect_set must
    // match the distinct the join form applied)
    val items = (1 to 400).flatMap { g =>
      val sz = rnd.nextInt(7)
      (0 until sz).flatMap { _ =>
        val it = rnd.nextInt(40).toLong
        Seq.fill(1 + rnd.nextInt(2))((g.toLong, it))
      }
    }
    val df = items.toDF("grp", "item")
    val lp = df.select(col("grp").as("ok"), col("item").as("pk")).distinct()
    val joinForm = lp.select(col("ok"), col("pk").as("src"))
      .join(lp.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") < col("dst")).select("src", "dst")
    val got = graft.operators.Graph.coOccurrenceEdges(df, "grp", "item")
    // multiset identity: same pairs with the same per-group multiplicity
    val a = joinForm.groupBy("src", "dst").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = got.groupBy("src", "dst").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("ed1Pairs: bucket self-join must not reappear (collect+explode shape)") {
    import spark.implicits._
    val words = Seq("graft", "craft", "crate", "spark", "spork", "spoon")
    val plan = planOf(graft.pipeline.Fuzzy.ed1Pairs(words.toDF("tok"), "tok"))
    val innerHashJoins = plan.linesIterator
      .filter(l => l.contains("HashJoin") && l.contains("Inner")).size
    val smj = plan.linesIterator
      .filter(l => l.contains("SortMergeJoin") && l.contains("Inner")).size
    assert(innerHashJoins + smj === 0,
      s"deletion-neighborhood pair generation self-joins again:\n$plan")
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
  }

  test("cosineDedupPairsWith: pair-gen/dedup exchanges carry no embedding payload") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 8
    val docs = (0 until 64).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val centroids = Array.fill(4 * dim)(rnd.nextFloat() - 0.5f)
    val df = graft.pipeline.Similarity.cosineDedupPairsWith(
      spark, docs, centroids, singleAssign = None, dim = dim,
      minCosine = 0.5, probes = 2)
    val plan = df.queryExecution.executedPlan.toString
    // every pre-attach exchange (hashpartitioning on code or the (a,b)
    // dedup) must move ids only — an embedding column inside an
    // Exchange's output means the payload rides the shuffle again
    val badExchanges = plan.linesIterator.filter { l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("embedding") || l.contains("qemb"))
    }.toList
    assert(badExchanges.isEmpty,
      s"embedding payload re-entered a pair-gen exchange:\n${badExchanges.mkString("\n")}")
  }

  test("pageRank rank refresh broadcasts when the node count is bounded") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val df = graft.operators.Graph.pageRank(spark, edges, iterations = 3)
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"),
      s"rank refresh fell back to sort-merge on a bounded graph:\n$plan")
  }
}
