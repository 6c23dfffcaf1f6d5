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

  // ---- r20 pins ----

  test("jaccardVerify: array-intersect form == join-form verify on randomized sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // distinct (doc_id, sh) rows — the shingles() contract — with
    // overlapping sets so intersections are non-trivial
    val sh = (0L until 30L).flatMap { d =>
      (0 until 3 + rnd.nextInt(8)).map(_ => (d, rnd.nextInt(25).toLong))
    }.distinct.toDF("doc_id", "sh")
    val pairs = (0L until 30L).flatMap(a => (a + 1 until 30L).map(b => (a, b)))
      .toDF("a", "b")
    // the r1-r19 join-based verify, inlined as the independent spec
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("a"), col("sh")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val joinForm = inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .select("a", "b", "jaccard")
    val got = graft.pipeline.Dedup.jaccardVerify(pairs, sh)
      // the join form only emits pairs with inter >= 1; restrict the
      // array form the same way for the comparison
      .filter(col("jaccard") > 0.0)
    assert(rows(got) === rows(joinForm.filter(col("jaccard") > 0.0)))
    assert(rows(got).nonEmpty)
    val plan = planOf(graft.pipeline.Dedup.jaccardVerify(pairs, sh))
    assert(plan.contains("array_intersect"),
      s"jaccardVerify lost the array-intersect projection:\n$plan")
  }

  test("prefixFilterPairs: verify tail is the array-intersect projection") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "completely different text with other words entirely here"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val plan = planOf(
      graft.pipeline.Dedup.prefixFilterPairs(docs, "doc_id", "text", 3, 0.5))
    assert(plan.contains("array_intersect"),
      s"PPJoin verify lost the array-intersect projection:\n$plan")
  }

  test("ed1Pairs: occupancy guard is a window count on ONE variant derivation") {
    import spark.implicits._
    val words = Seq("graft", "craft", "crate", "spark", "spork", "spoon")
    val plan = planOf(graft.pipeline.Fuzzy.ed1Pairs(words.toDF("tok"), "tok"))
    assert(plan.contains("Window"),
      s"occupancy guard is no longer a window count:\n$plan")
    // exactly one deletion-variant explode: the count-prepass semi-join
    // shape re-derived the whole variant subtree on its build side
    val variantDerivations = plan.linesIterator
      .count(l => l.contains("sequence(0, length"))
    assert(variantDerivations === 1,
      s"deletion-variant subtree derived $variantDerivations times:\n$plan")
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
