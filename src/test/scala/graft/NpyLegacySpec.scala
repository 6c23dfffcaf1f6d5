package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.NpyImport

/** B11 tail — fast-plaid legacy format (mmap.rs:1757-1812): f2 float
  * side files, i8 ivf_lengths, `<u1` residual descriptors. Two
  * contracts: (1) [[NpyImport.importIndex]] reads the legacy dtypes
  * DIRECTLY, producing the identical index as the converted form;
  * (2) [[NpyImport.convertFastPlaid]] rewrites a legacy directory
  * in place to the nextplaid dtype contract, like the reference's
  * convert_fastplaid_to_nextplaid. */
class NpyLegacySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("half<->float roundtrip is the identity on every non-nan half") {
    var h = 0
    var checked = 0
    while (h < 0x10000) {
      val s = h.toShort
      val f = {
        // replicate the public halfToFloat contract through a write/read
        val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(s)
        NpyImport.writeNpy("/tmp/graft_half_probe.npy", "f2", Seq(1), b.array())
        NpyImport.floats(NpyImport.readNpy("/tmp/graft_half_probe.npy"))(0)
      }
      if (!f.isNaN) {
        assert(NpyImport.floatToHalf(f) === s,
          f"half 0x$h%04x -> $f -> 0x${NpyImport.floatToHalf(f)}%04x")
        checked += 1
      }
      // sweep the interesting regions densely, the rest in strides
      h += (if (h < 0x0c00 || (h >= 0x7a00 && h < 0x8c00) || h >= 0xfa00) 1 else 37)
    }
    assert(checked > 2000)
    // rounding: values between two halves land on nearest-even
    assert(NpyImport.floatToHalf(1.0f) === 0x3c00.toShort)
    assert(NpyImport.floatToHalf(-2.0f) === 0xc000.toShort)
    assert(NpyImport.floatToHalf(0.0f) === 0x0000.toShort)
    assert(NpyImport.floatToHalf(-0.0f) === 0x8000.toShort)
    assert(NpyImport.floatToHalf(Float.PositiveInfinity) === 0x7c00.toShort)
    assert(NpyImport.floatToHalf(65504.0f) === 0x7bff.toShort) // f16 max
    assert(NpyImport.floatToHalf(65520.0f) === 0x7c00.toShort) // overflow -> inf
    assert(NpyImport.floatToHalf(1.00048828125f + 0.000244140625f) === 0x3c01.toShort)
  }

  /** Build a tiny real index, export it, and derive the two fixture
    * dirs: `f4snap` (float files f16-rounded, kept f4) and `legacy`
    * (same values as f2, codes i4, residual descr `<u1`, plus the
    * fast-plaid-only ivf_lengths.npy i8). Same logical content, two
    * physical formats. */
  private def fixtures(): (String, String) = {
    import spark.implicits._
    val docs = (0L until 24L).map { d =>
      (d, Array.tabulate(3)(t =>
        graft.core.MaxSim.l2Normalize(Array.tabulate(8)(i =>
          (math.sin(d * 31 + t * 7 + i) * 0.9).toFloat))))
    }.toDF("doc_id", "embeddings")
    val path = "/tmp/graft_npylegacy"
    graft.util.Fs.deleteRecursively(path)
    val idx = graft.index.MultiVectorIndex.build(spark, docs, s"$path/idx")
    NpyImport.exportIndex(idx, s"$path/f4snap")
    // snap: round every float side file through f16 so both fixture
    // dirs carry bit-identical logical values
    val floatFiles = Seq("centroids.npy", "avg_residual.npy",
      "bucket_cutoffs.npy", "bucket_weights.npy", "cluster_threshold.npy")
    floatFiles.foreach { f =>
      val npy = NpyImport.readNpy(s"$path/f4snap/$f")
      val snapped = NpyImport.floats(npy).map(x =>
        java.lang.Float.intBitsToFloat(java.lang.Float.floatToIntBits(x)) match {
          case v => // f32 -> f16 -> f32
            val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
            b.putShort(NpyImport.floatToHalf(v))
            // re-read through the reader's half decode for bit-parity
            NpyImport.floatToHalf(v)
        })
      // write the f4snap dir with the decoded-f16 values
      val decoded = snapped.map { s16 =>
        val tmp = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        tmp.putShort(s16)
        NpyImport.writeNpy("/tmp/graft_half_tmp.npy", "f2", Seq(1), tmp.array())
        NpyImport.floats(NpyImport.readNpy("/tmp/graft_half_tmp.npy"))(0)
      }
      val fb = ByteBuffer.allocate(decoded.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      decoded.foreach(fb.putFloat)
      NpyImport.writeNpy(s"$path/f4snap/$f", "f4", npy.shape, fb.array())
    }
    // legacy dir: f2 float files, i4 codes, <u1 residuals, i8 ivf_lengths
    val legacy = s"$path/legacy"
    graft.util.Fs.deleteRecursively(legacy)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(legacy))
    floatFiles.foreach { f =>
      val npy = NpyImport.readNpy(s"$path/f4snap/$f")
      val xs = NpyImport.floats(npy)
      val b = ByteBuffer.allocate(xs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      xs.foreach(x => b.putShort(NpyImport.floatToHalf(x)))
      NpyImport.writeNpy(s"$legacy/$f", "f2", npy.shape, b.array())
    }
    val plan = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/f4snap/plan.json")), "UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$legacy/plan.json"),
      plan.getBytes("UTF-8"))
    val nChunks = "\"num_chunks\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(plan).get.group(1).toInt
    (0 until nChunks).foreach { k =>
      val codes = NpyImport.longs(NpyImport.readNpy(s"$path/f4snap/$k.codes.npy"))
      val cb = ByteBuffer.allocate(codes.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      codes.foreach(c => cb.putInt(c.toInt))
      NpyImport.writeNpy(s"$legacy/$k.codes.npy", "i4", Seq(codes.length), cb.array())
      val res = NpyImport.readNpy(s"$path/f4snap/$k.residuals.npy")
      val payload = new Array[Byte](res.data.remaining())
      res.data.duplicate().get(payload)
      NpyImport.writeNpy(s"$legacy/$k.residuals.npy", "<u1", res.shape, payload)
      val dl = java.nio.file.Paths.get(s"$path/f4snap/doclens.$k.json")
      java.nio.file.Files.copy(dl,
        java.nio.file.Paths.get(s"$legacy/doclens.$k.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // fast-plaid-only side file the importer must tolerate
    val ib = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(i => ib.putLong(i * 3L))
    NpyImport.writeNpy(s"$legacy/ivf_lengths.npy", "i8", Seq(4), ib.array())
    (s"$path/f4snap", legacy)
  }

  private def recon(dir: String, out: String) = {
    val idx = NpyImport.importIndex(spark, dir, out)
    new graft.search.Searcher(idx)
      .reconstruct(spark.range(24).select(col("id").as("doc_id")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]]("vec").toSeq))
      .sortBy(x => (x._1, x._2))
  }

  test("legacy fixture (f2/i4/<u1) imports to the identical index as the f4 form") {
    val (f4, legacy) = fixtures()
    val a = recon(f4, "/tmp/graft_npylegacy/imp_f4")
    val b = recon(legacy, "/tmp/graft_npylegacy/imp_legacy")
    assert(a.length === b.length && a.nonEmpty)
    assert(a === b, "f2-read index diverged from the f4-read index")
  }

  test("convertFastPlaid rewrites dtypes in place; the converted dir imports identically") {
    val (f4, legacy) = fixtures()
    assert(NpyImport.npyDescr(s"$legacy/centroids.npy") === "<f2")
    assert(NpyImport.npyDescr(s"$legacy/0.residuals.npy") === "<u1")
    assert(NpyImport.npyDescr(s"$legacy/ivf_lengths.npy") === "<i8")
    val before = recon(legacy, "/tmp/graft_npylegacy/imp_before")
    assert(NpyImport.convertFastPlaid(legacy) === true)
    assert(NpyImport.npyDescr(s"$legacy/centroids.npy") === "<f4")
    assert(NpyImport.npyDescr(s"$legacy/0.residuals.npy") === "|u1")
    assert(NpyImport.npyDescr(s"$legacy/ivf_lengths.npy") === "<i4")
    // idempotent: a second pass finds nothing to rewrite
    assert(NpyImport.convertFastPlaid(legacy) === false)
    val after = recon(legacy, "/tmp/graft_npylegacy/imp_after")
    assert(before === after, "conversion changed the imported index")
    val f4r = recon(f4, "/tmp/graft_npylegacy/imp_f4b")
    assert(after === f4r, "converted legacy dir diverged from the f4 form")
  }
}
