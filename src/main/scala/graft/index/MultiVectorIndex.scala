package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Quantizer, Quantiles}

/** Index build config — defaults match the reference
  * (next-plaid/src/index.rs:88-102). */
final case class IndexConfig(
    nbits: Int = 4,
    kmeansIters: Int = 4,
    maxPointsPerCentroid: Int = 256,
    seed: Long = 42L,
    numPartitionsOverride: Option[Int] = None,
    heldoutMax: Int = 50000
)

/** A multi-vector (late-interaction) index as a set of parquet tables:
  *
  * {{{
  * <path>/tokens/    (doc_id, tok, code, residual: binary)   sorted by doc_id
  * <path>/ivf/       (code, doc_ids: array<long>)            sorted+distinct
  * <path>/doclens/   (doc_id, len)
  * <path>/codec/     (code, vec)  — centroid codebook
  * <path>/manifest.json
  * }}}
  *
  * The on-disk layout replaces the reference's npy/SQLite directory
  * (index.rs:373-528): parquet is splittable/column-pruned, so the
  * merged-file machinery (mmap.rs:1266-1712) is unnecessary. At 100 TB the
  * tokens table is the big one — it is written sorted by doc_id so the
  * exact-rerank gather is a range read, and IVF stays small (K rows).
  */
final class MultiVectorIndex(val spark: SparkSession, val path: String) {
  lazy val tokens: DataFrame = spark.read.parquet(s"$path/tokens")
  lazy val ivf: DataFrame = spark.read.parquet(s"$path/ivf")
  lazy val doclens: DataFrame = spark.read.parquet(s"$path/doclens")

  lazy val manifest: Map[String, String] = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$path/manifest.json")),
      "UTF-8")
    txt.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.stripPrefix("\"").stripSuffix("\"")
    }.toMap
  }

  lazy val codec: Codec = MultiVectorIndex.loadCodec(spark, path)

  def numDocuments: Long = manifest("num_documents").toLong
  def dim: Int = manifest("embedding_dim").toInt
}

object MultiVectorIndex {

  /** Build an index from `docs(doc_id: long, embeddings: array<array<float>>)`.
    * The full B1→B8 pipeline: sample → k-means → codec training → encode →
    * IVF/doclens → manifest. */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      path: String,
      cfg: IndexConfig = IndexConfig()
  ): MultiVectorIndex = {
    import spark.implicits._

    val numDocs = docs.count()
    require(numDocs > 0, "empty document set")
    val dim = docs
      .select(element_at(col("embeddings"), 1).as("v"))
      .limit(1).as[Array[Float]].collect()(0).length

    // Token table (narrow explode; no shuffle).
    val tokens = docs
      .select(col("doc_id"), posexplode(col("embeddings")).as(Seq("tok", "vec")))
      .cache()
    val numTokens = tokens.count()

    // --- B1: sample docs, estimate K, train centroids -------------------
    val nSampleDocs = GraftKMeans.numSampleDocs(numDocs)
    val sampledDocIds = docs
      .select(col("doc_id"), xxhash64(col("doc_id"), lit(cfg.seed)).as("_h"))
      .orderBy("_h", "doc_id")
      .limit(nSampleDocs.toInt)
      .select("doc_id")
    val sampleTokens = tokens.join(broadcast(sampledDocIds), "doc_id")
      .select("doc_id", "tok", "vec")
    val totalSampleTokens = sampleTokens.count()
    val avgTokensPerDoc = totalSampleTokens.toDouble / nSampleDocs
    val estTotalTokens = avgTokensPerDoc * numDocs
    val k = math.min(
      cfg.numPartitionsOverride.getOrElse(GraftKMeans.numPartitions(estTotalTokens)).toLong,
      totalSampleTokens
    ).toInt

    val centroids = GraftKMeans.train(
      spark, sampleTokens, dim, k, cfg.kmeansIters, cfg.seed, cfg.maxPointsPerCentroid)

    // --- B3: codec training on a heldout token sample -------------------
    // heldout = min(5% of tokens, 50k) (index.rs:182-287)
    val heldoutN = math.min((numTokens * 0.05).toLong.max(1L), cfg.heldoutMax.toLong).toInt
    val centBc = spark.sparkContext.broadcast(centroids)
    val heldoutResiduals: Array[Array[Float]] = tokens
      .withColumn("_h", xxhash64(col("doc_id"), col("tok"), lit(cfg.seed + 2)))
      .orderBy("_h", "doc_id", "tok")
      .limit(heldoutN)
      .select("vec").as[Array[Float]]
      .mapPartitions { vecs =>
        val cents = centBc.value
        val kNow = cents.length / dim
        vecs.map { vec =>
          val code = bestDot(cents, kNow, dim, vec)
          val r = new Array[Float](dim)
          var i = 0
          while (i < dim) { r(i) = vec(i) - cents(code * dim + i); i += 1 }
          r
        }
      }
      .collect()

    val flatResiduals = heldoutResiduals.flatten
    val quantizer = Quantizer.train(flatResiduals, cfg.nbits)
    val avgResidual = {
      val acc = new Array[Double](dim)
      heldoutResiduals.foreach { r =>
        var i = 0
        while (i < dim) { acc(i) += math.abs(r(i)); i += 1 }
      }
      acc.map(v => (v / heldoutResiduals.length).toFloat)
    }
    val norms = heldoutResiduals.map { r =>
      var s = 0.0
      var i = 0
      while (i < dim) { s += r(i).toDouble * r(i); i += 1 }
      math.sqrt(s).toFloat
    }
    val clusterThreshold = Quantiles.quantile(norms, 0.75)
    val codec = Codec(dim, centroids, quantizer, avgResidual, clusterThreshold)

    // --- B4/B5/B6: encode every token ------------------------------------
    val codecBc = spark.sparkContext.broadcast(codec)
    val encoded = tokens
      .as[(Long, Int, Array[Float])]
      .mapPartitions { rows =>
        val c = codecBc.value
        rows.map { case (docId, tok, vec) =>
          val (code, packed) = c.encode(vec)
          (docId, tok, code, packed)
        }
      }
      .toDF("doc_id", "tok", "code", "residual")

    encoded
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .sortWithinPartitions("doc_id", "tok")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/tokens")

    val tokensOut = spark.read.parquet(s"$path/tokens")

    // --- B8: IVF posting lists (sort+dedup, index.rs:479-508) ------------
    tokensOut
      .groupBy("code")
      .agg(sort_array(collect_set("doc_id")).as("doc_ids"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/ivf")

    // --- doclens ----------------------------------------------------------
    tokensOut
      .groupBy("doc_id")
      .agg(count(lit(1)).as("len"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/doclens")

    // --- codec + manifest -------------------------------------------------
    saveCodec(spark, path, codec)
    val manifest = Seq(
      "nbits" -> cfg.nbits.toString,
      "embedding_dim" -> dim.toString,
      "num_documents" -> numDocs.toString,
      "num_embeddings" -> numTokens.toString,
      "num_partitions" -> k.toString,
      "avg_doclen" -> (numTokens.toDouble / numDocs).toString,
      "seed" -> cfg.seed.toString
    ).map { case (a, b) => s""""$a": "$b"""" }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/manifest.json"),
      manifest.getBytes("UTF-8"))

    tokens.unpersist()
    centBc.destroy()
    new MultiVectorIndex(spark, path)
  }

  private[index] def bestDot(
      cents: Array[Float], k: Int, dim: Int, vec: Array[Float]): Int = {
    var best = -1
    var bestScore = Float.NegativeInfinity
    var c = 0
    while (c < k) {
      var s = 0.0f
      val off = c * dim
      var i = 0
      while (i < dim) { s += cents(off + i) * vec(i); i += 1 }
      if (!s.isNaN && (best < 0 || s > bestScore || bestScore.isNaN)) {
        best = c; bestScore = s
      }
      c += 1
    }
    if (best < 0) 0 else best
  }

  def saveCodec(spark: SparkSession, path: String, codec: Codec): Unit = {
    import spark.implicits._
    val k = codec.numCentroids
    (0 until k)
      .map(c => (c, codec.centroid(c)))
      .toDF("code", "vec")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/codec")
    val q = codec.quantizer
    val json = Seq(
      s""""nbits": ${q.nbits}""",
      s""""dim": ${codec.dim}""",
      s""""cluster_threshold": ${codec.clusterThreshold}""",
      s""""bucket_cutoffs": [${q.bucketCutoffs.mkString(",")}]""",
      s""""bucket_weights": [${q.bucketWeights.mkString(",")}]""",
      s""""avg_residual": [${codec.avgResidual.mkString(",")}]"""
    ).mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/codec.json"), json.getBytes("UTF-8"))
  }

  def loadCodec(spark: SparkSession, path: String): Codec = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codec")
      .orderBy("code").select("vec").as[Array[Float]].collect()
    val dim = rows(0).length
    val flat = new Array[Float](rows.length * dim)
    rows.zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(v, 0, flat, i * dim, dim)
    }
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$path/codec.json")),
      "UTF-8")
    def arr(key: String): Array[Float] = {
      val m = s""""$key": \\[([^\\]]*)\\]""".r.findFirstMatchIn(txt).get
      m.group(1).split(",").filter(_.nonEmpty).map(_.toFloat)
    }
    def scalar(key: String): String =
      s""""$key": ([^,}]+)""".r.findFirstMatchIn(txt).get.group(1).trim
    Codec(
      dim, flat,
      new Quantizer(scalar("nbits").toInt, arr("bucket_cutoffs"), arr("bucket_weights")),
      arr("avg_residual"),
      scalar("cluster_threshold").toFloat
    )
  }
}
