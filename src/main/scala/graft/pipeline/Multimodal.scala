package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns carried next to typed metadata, exactly like a
  * production training-data lake. The Spark-side plumbing — schemas,
  * format sniffing, partition-local batch decode, frame sampling — is
  * real and tested; the pixel/sample decode itself is a clearly marked
  * deterministic STUB (no image/audio codecs in this environment) to be
  * swapped for a real decoder (ImageIO / JNI ffmpeg) without touching
  * the plan shape.
  */
object Multimodal {

  /** Canonical media schema: `(doc_id, kind, payload, meta)`. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true)
    )), nullable = true)
  ))

  /** Magic-byte format sniffing as a pure column expression (first bytes
    * of the payload in hex — PNG / JPEG / RIFF-WAV / MP4 ftyp). */
  def sniffFormat(payloadCol: String): org.apache.spark.sql.Column =
    when(substring(hex(col(payloadCol)), 1, 8) === "89504E47", "png")
      .when(substring(hex(col(payloadCol)), 1, 6) === "FFD8FF", "jpeg")
      .when(substring(hex(col(payloadCol)), 1, 8) === "52494646", "wav")
      .when(substring(hex(col(payloadCol)), 9, 8) === "66747970", "mp4")
      .otherwise("unknown")

  /** Payload statistics: byte length, sniffed format, hex-md5 checksum —
    * scan-speed column math, no shuffle. */
  def payloadStats(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).as("doc_id"),
      octet_length(col(payloadCol)).as("n_bytes"),
      sniffFormat(payloadCol).as("format"),
      md5(hex(col(payloadCol))).as("checksum")
    )

  /** Deterministic fake feature extraction — THE DECODE STUB. Groups the
    * payload bytes into `dim` buckets and averages them; replace the body
    * of `decodeOne` with a real decoder. Runs partition-local in batches
    * (mapPartitions), which is the production plan shape: one decoder
    * instance per partition, vectorized batches, no shuffle. */
  def fakeDecodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      // STUB: real implementation decodes pixels/samples here.
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < payload.length) {
        val b = i % dim
        out(b) += (payload(i) & 0xff).toFloat
        counts(b) += 1
        i += 1
      }
      var b = 0
      while (b < dim) {
        if (counts(b) > 0) out(b) /= counts(b)
        b += 1
      }
      out
    }
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          (id, if (payload == null) null else decodeOne(payload))
        }
      }
      .toDF("doc_id", "features")
  }

  /** Video frame-sampling plan: emit `(doc_id, frame_idx)` for every
    * `everyK`-th frame from `meta.n_frames` — the fan-out stage that
    * precedes per-frame decode in a video pipeline. Pure `sequence()`
    * explode, no shuffle; downstream decode is partition-local. */
  def frameSamplePlan(media: DataFrame, everyK: Int,
      idCol: String = "doc_id"): DataFrame =
    media
      .filter(col("meta.n_frames").isNotNull && col("meta.n_frames") > 0)
      .select(col(idCol).as("doc_id"),
        explode(expr(s"sequence(0, meta.n_frames - 1, $everyK)")).as("frame_idx"))

  /** Synthesizes a deterministic media table from any text table — test
    * fixture helper: even ids get a PNG magic, odd ids a JPEG magic,
    * payload body is the utf-8 text. */
  def synthesizeFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      when(pmod(col(idCol), lit(2)) === 0, lit("image/png"))
        .otherwise(lit("image/jpeg")).as("kind"),
      concat(
        when(pmod(col(idCol), lit(2)) === 0,
          unhex(lit("89504E470D0A1A0A"))).otherwise(unhex(lit("FFD8FFE0"))),
        encode(col(textCol), "UTF-8")
      ).as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        (pmod(col(idCol), lit(10)) * 10 + 10).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")
      ).as("meta")
    )
}
