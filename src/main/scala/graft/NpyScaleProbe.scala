package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ×factor physical roundtrip of the npy interchange layout (r15
  * verdict item 6): the npy/json directory format (B11, the
  * reference's fast-plaid conversion surface) is the one remaining
  * byte-layout contract, and until this probe its roundtrip gate ran
  * only at fixture scale (`b11_npy_roundtrip`, 30 docs). This main
  * closes it physically at ×factor the sf0.1 embeddings corpus:
  *
  *   1. build a [[graft.index.MultiVectorIndex]] over the ×factor
  *      corpus (the ScaleProbe replication — shared recipe);
  *   2. `exportIndex` → the reference's npy directory layout;
  *   3. `importIndex` → a SECOND index directory;
  *   4. prove equivalence where it matters: the per-table content
  *      hashes (tokens with codes+residuals, doclens, doc_codes, IVF)
  *      must be IDENTICAL, and a 100-query funnel search against both
  *      indexes must return hash-identical results.
  *
  * Prints one JSON line with export/import wall times, per-table hash
  * equality, search hash equality, and calib stamps.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.NpyScaleProbe 100"`
  */
object NpyScaleProbe {

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
    if (!graft.util.Fs.exists(s"$base/embeddings.parquet"))
      ScaleProbe.replicatedEmbeddings(spark, sfDir, factor, cpus.toInt * 2)
        .write.parquet(s"$base/embeddings.parquet")
    import spark.implicits._
    val docs = spark.read.parquet(s"$base/embeddings.parquet")
      .select((col("vec_id") / 5).cast("long").as("doc_id"),
        col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (d, v, e) => (d, v, graft.core.MaxSim.l2Normalize(e)) }
      .toDF("doc_id", "vec_id", "embedding")
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x.getField("embedding")).as("embeddings"))

    val work = s"/tmp/graft_npy_x$factor"
    graft.util.Fs.deleteRecursively(work)
    val t0 = System.nanoTime()
    val idxA = graft.index.MultiVectorIndex.build(spark, docs, s"$work/a")
    val buildSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    graft.sources.NpyImport.exportIndex(idxA, s"$work/npy")
    val exportSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val idxB = graft.sources.NpyImport.importIndex(spark, s"$work/npy", s"$work/b")
    val importSec = (System.nanoTime() - t2) / 1e9

    // content equality per table: (row count, column-order-insensitive
    // xor CONTENT hash). r16 advice caught that forcedCount alone only
    // proved equal cardinality — a roundtrip corrupting every residual
    // byte would still have "passed". forcedCountHash closes that.
    def tableHash(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      Bench.forcedCountHash(
        df.select(df.columns.sorted.map(col).toIndexedSeq: _*))
    val tables = Seq(
      "tokens" -> ((i: graft.index.MultiVectorIndex) =>
        i.tokens.select("doc_id", "tok", "code", "residual")),
      "doclens" -> ((i: graft.index.MultiVectorIndex) => i.doclens),
      "doc_codes" -> ((i: graft.index.MultiVectorIndex) => i.docCodes),
      "ivf" -> ((i: graft.index.MultiVectorIndex) =>
        i.ivf.select(col("code"), explode(col("doc_ids")).as("doc_id"))))
    val tableEq = tables.map { case (name, f) =>
      name -> (tableHash(f(idxA)) == tableHash(f(idxB)))
    }

    // 100-query funnel search against both indexes, identical params
    val queries = docs.filter(col("doc_id") < 100)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    val params = graft.search.SearchParams(topK = 10)
    def searchHash(idx: graft.index.MultiVectorIndex): (Long, Long) =
      Bench.forcedCountHash(
        new graft.search.Searcher(idx).search(queries, params))
    val hA = searchHash(idxA)
    val hB = searchHash(idxB)

    val calibPost = Bench.calibrate(spark)
    val te = tableEq.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"npy_roundtrip","factor":$factor,"docs":${idxA.numDocuments},""" +
        f""""build_sec":$buildSec%.1f,"export_sec":$exportSec%.1f,""" +
        f""""import_sec":$importSec%.1f,"tables_equal":$te,""" +
        s""""search_hash_equal":${hA == hB},""" +
        Bench.calibJson(calibPre, calibPost) + s""","sf_base":"$sfDir"}""")
    require(tableEq.forall(_._2) && hA == hB,
      s"npy roundtrip diverged: tables=$tableEq search=${hA == hB}")
    spark.stop()
  }
}
