package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the two line-synthesis shapes over the
  * ×N replicated corpus: the original in-row
  * `transform(sequence(...))` lambda (its body — concat_ws over a
  * slice, per chunk — runs INTERPRETED: Catalyst does not codegen
  * higher-order-function lambda bodies) vs the r18 lambda-free
  * `CurationPipeline.synthLines` (posexplode → bounded-group rollups →
  * struct-field projection, all codegen'd, two token-bounded
  * exchanges). Both are forced through the same count+hash sink;
  * content identity is asserted, so the timing comparison is between
  * provably-equivalent outputs. Interleaved A/B/A/B so ambient drift
  * shows up as within-pair spread, not as a systematic bias.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.SynthProbe 100"`.
  */
object SynthProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 64))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibPre = Bench.calibrate(spark)

    val base = s"/tmp/graft_scale_x$factor"
    if (!graft.util.Fs.exists(s"$base/documents.parquet"))
      ScaleProbe.replicatedDocuments(spark, sfDir, factor, cpus.toInt * 2)
        .write.parquet(s"$base/documents.parquet")
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select("doc_id", "text")

    // A: the DEPLOYED shape (CurationPipeline.synthLines — the in-row
    // chunk lambda)
    def lambdaSynth =
      graft.pipeline.CurationPipeline.synthLines(docs, "doc_id", "text")
    // B: the "codegen-clean" alternative this probe exists to judge —
    // no lambda anywhere, but an explode of every token, two
    // token-keyed exchanges, and two struct sorts
    def codegenSynth = {
      val toks = docs
        .withColumn("_tk", expr(
          "regexp_extract_all(lower(concat(text, ' ', text, ' ', text)), '[a-z0-9]+', 0)"))
        .select(col("doc_id"), posexplode(col("_tk")).as(Seq("p", "w")))
      val synth = toks
        .groupBy(col("doc_id"), floor(col("p") / 8).as("ln"))
        .agg(array_sort(collect_list(struct(col("p"), col("w")))).as("sw"))
        .select(col("doc_id"), col("ln"),
          concat(concat_ws(" ", col("sw.w")),
            when(col("ln") % 2 === 0, lit(".")).otherwise(lit(""))).as("line"))
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("ln"), col("line")))).as("sl"))
        .select(col("doc_id"), concat_ws("\n", col("sl.line")).as("text2"))
      docs.select(col("doc_id"))
        .join(synth, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("text2"), lit("")).as("text2"))
    }

    def timed(df: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val (n, h) = Bench.forcedCountHash(df)
      ((System.nanoTime() - t0) / 1e9, n, h)
    }
    // warm both plans once (codegen + scan cache on equal footing)
    timed(lambdaSynth); timed(codegenSynth)
    val rounds = (1 to 3).map { _ => (timed(lambdaSynth), timed(codegenSynth)) }
    val calibPost = Bench.calibrate(spark)
    val (l0, cg0) = rounds.head
    require(rounds.forall { case (l, c) => l._2 == c._2 && l._3 == c._3 },
      "synth shapes diverged in content")
    val ls = rounds.map(_._1._1)
    val cs = rounds.map(_._2._1)
    println(
      f"""{"metric":"synth_probe","factor":$factor,"rows":${l0._2},"hash":${l0._3},""" +
        s""""lambda_sec":[${ls.map(v => f"$v%.1f").mkString(",")}],""" +
        s""""codegen_sec":[${cs.map(v => f"$v%.1f").mkString(",")}],""" +
        Bench.calibJson(calibPre, calibPost) + "}")
    spark.stop()
  }
}
