package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val builtinDot =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  // parquet round-trip: a LocalRelation would be fully pre-computed by
  // ConvertToLocalRelation before any user optimizer rule ever runs
  private def viaParquet(df: org.apache.spark.sql.DataFrame, name: String) = {
    val p = s"/tmp/graft_extspec_$name"
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ graft.plans.DotProductRewrite
    try f finally spark.experimental.extraOptimizations = before
  }

  test("DotProductRewrite: builtin aggregate(zip_with) plans through DotF, bit-equal") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = viaParquet((0 until 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("a", "b"), "main")
    val want = df.selectExpr(s"$builtinDot AS d").collect().map(_.getDouble(0))
    withRule {
      val q = df.selectExpr(s"$builtinDot AS d")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("dot_f"), s"rewrite did not fire:\n$opt")
      assert(!opt.contains("aggregate(zip_with"), s"builtin shape survived:\n$opt")
      val got = q.collect().map(_.getDouble(0))
      // identical accumulation order -> bit-equal, not approximately equal
      assert(got.toSeq === want.toSeq)
    }
  }

  test("DotProductRewrite: ragged arrays and null elements keep the builtin NULL contract") {
    val df = viaParquet(spark.range(1).selectExpr(
      "array(cast(1.0 as float), cast(2.0 as float)) AS ok_a",
      "array(cast(3.0 as float), cast(4.0 as float)) AS ok_b",
      "array(cast(1.0 as float), cast(2.0 as float), cast(9.0 as float)) AS long_a",
      "array(cast(1.0 as float), cast(null as float)) AS null_b"), "edge")
    withRule {
      val r = df.selectExpr(
        s"${builtinDot.replace("a,", "ok_a,").replace("b,", "ok_b,")} AS ok",
        s"${builtinDot.replace("a,", "long_a,").replace("b,", "ok_b,")} AS ragged",
        s"${builtinDot.replace("a,", "ok_a,").replace("b,", "null_b,")} AS withnull")
        .collect()(0)
      assert(r.getDouble(0) === 11.0)
      assert(r.isNullAt(1), "length mismatch must stay NULL after rewrite")
      assert(r.isNullAt(2), "null element must stay NULL after rewrite")
    }
  }

  test("GraftExtensions wires the function and the rule without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }
}
