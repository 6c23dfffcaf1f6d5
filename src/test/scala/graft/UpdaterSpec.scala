package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{MultiVectorIndex, UpdateConfig, Updater}
import graft.search.{SearchParams, Searcher}

/** Incremental update lifecycle (U1-U5, U7), mirroring the reference's
  * add → search → delete → re-add integration workflows
  * (next-plaid/tests/filtering_integration.rs). */
class UpdaterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** 100 multi-vector docs (5 normalized tokens each) from the sf0.001
    * embeddings fixture. */
  lazy val docs: DataFrame = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") / 5).cast("long").as("doc_id"),
        col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (d, v, e) => (d, v, graft.core.MaxSim.l2Normalize(e)) }
      .toDF("doc_id", "vec_id", "embedding")
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x.getField("embedding")).as("embeddings"))
      .cache()
  }

  private def freshPath(name: String): String = {
    val p = s"/tmp/graft_upd_$name"
    val dir = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    p
  }

  private def exhaustive = SearchParams(
    topK = 1, nIvfProbe = Int.MaxValue, nFullScores = 1 << 22,
    centroidScoreThreshold = None)

  private def top1(idx: MultiVectorIndex, queryDocs: DataFrame): Map[Long, Long] =
    new Searcher(idx).search(queryDocs, exhaustive)
      .select("query_id", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def tokenSet(idx: MultiVectorIndex): Set[(Long, Int, Int, Seq[Byte])] =
    idx.tokens.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq))
      .toSet

  private def ivfMatchesTokens(idx: MultiVectorIndex): Unit = {
    val expect = idx.tokens.groupBy("code")
      .agg(sort_array(collect_set("doc_id")).as("doc_ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val got = idx.ivf.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got === expect)
  }

  test("U1 rebuild mode: updating a small index equals building the union directly") {
    val pathA = freshPath("rebuild_a")
    val pathB = freshPath("rebuild_b")
    val d90 = docs.filter(col("doc_id") < 90)
    val d10 = docs.filter(col("doc_id") >= 90)
      .withColumn("doc_id", col("doc_id") - 90)
    MultiVectorIndex.build(spark, d90, pathA)
    val updated = Updater.update(spark, pathA, d10)
    val direct = MultiVectorIndex.build(spark, docs, pathB)
    assert(updated.numDocuments === 100L)
    assert(tokenSet(updated) === tokenSet(direct))
    ivfMatchesTokens(updated)
  }

  test("U1 append+buffer then expansion: docs stay searchable through both modes") {
    val path = freshPath("buffer")
    val cfg = UpdateConfig(startFromScratch = 0, bufferSize = 6)
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 50), path)

    // mode 2: cheap append (4 < bufferSize)
    val batch1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 54)
      .withColumn("doc_id", col("doc_id") - 50)
    val idx1 = Updater.update(spark, path, batch1, cfg)
    assert(idx1.numDocuments === 54L)
    assert(spark.read.parquet(s"$path/buffer").count() === 4L)
    // appended docs are immediately searchable under their global ids
    val q1 = docs.filter(col("doc_id") === 52)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx1, q1) === Map(52L -> 52L))
    ivfMatchesTokens(idx1)

    // mode 3: buffer full (4 + 4 >= 6) -> delete buffered, expand, re-append
    val batch2 = docs.filter(col("doc_id") >= 54 && col("doc_id") < 58)
      .withColumn("doc_id", col("doc_id") - 54)
    val idx2 = Updater.update(spark, path, batch2, cfg)
    assert(idx2.numDocuments === 58L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/buffer")))
    val q2 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 58)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx2, q2) === (50L until 58L).map(i => i -> i).toMap)
    ivfMatchesTokens(idx2)
  }

  test("mode-3 flush keeps tombstones on buffered docs (regression: flush resurrection)") {
    import spark.implicits._
    val path = freshPath("tomb_flush")
    val cfg = UpdateConfig(startFromScratch = 0, bufferSize = 6)
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 50), path)

    // mode 2: docs 50..53 land in the buffer
    val batch1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 54)
      .withColumn("doc_id", col("doc_id") - 50)
    Updater.update(spark, path, batch1, cfg)

    // tombstone one buffered doc (52) and one non-buffered doc (10)
    val idx1 = new MultiVectorIndex(spark, path)
    Updater.deleteDeferred(spark, idx1, Seq(52L, 10L).toDF("doc_id"))

    // mode 3 flush: delete buffered, expand, re-append
    val batch2 = docs.filter(col("doc_id") >= 54 && col("doc_id") < 58)
      .withColumn("doc_id", col("doc_id") - 54)
    val idx2 = Updater.update(spark, path, batch2, cfg)
    assert(idx2.numDocuments === 58L)

    // both tombstones survive the flush at their (unchanged) ids
    val tombs = idx2.tombstonesOpt.get.collect().map(_.getLong(0)).toSet
    assert(tombs === Set(52L, 10L), s"tombstones after flush: $tombs")

    // the tombstoned buffered doc stays invisible to search: its own
    // embedding must retrieve some other doc
    val q = docs.filter(col("doc_id") === 52)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx2, q)(52L) !== 52L)

    // compact settles both; survivors renumber densely
    val idx3 = Updater.compact(spark, idx2)
    assert(idx3.numDocuments === 56L)
    assert(idx3.tombstonesOpt.isEmpty)
    ivfMatchesTokens(idx3)
  }

  test("U2/U3: outliers of far-away vectors trigger centroid expansion") {
    val path = freshPath("expand")
    import spark.implicits._
    val idx = MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 50), path)
    val k0 = idx.codec.numCentroids
    // a token orthogonal-ish to the corpus: one-hot on the last dim
    val far = Array.fill(64)(0.0f); far(63) = 1.0f
    val farTokens = Seq((0L, 0, far)).toDF("doc_id", "tok", "vec")
    val outliers = Updater.findOutliers(spark, farTokens, idx.codec)
    val expanded = Updater.expandCentroids(spark, outliers, idx.codec, UpdateConfig())
    if (outliers.count() > 0) {
      assert(expanded.numCentroids > k0)
      // old prefix unchanged — existing codes stay valid
      assert(expanded.centroids.take(k0 * 64).toSeq === idx.codec.centroids.toSeq)
    } else {
      assert(expanded.numCentroids === k0)
    }
  }

  test("U5 delete renumbers densely and keeps search + IVF consistent; U7 syncs metadata") {
    import spark.implicits._
    val path = freshPath("delete")
    val idx0 = MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 20), path)
    val idx1 = Updater.delete(spark, idx0, Seq(3L, 7L, 15L))
    assert(idx1.numDocuments === 17L)
    val ids = idx1.doclens.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 17L))
    ivfMatchesTokens(idx1)

    // old doc 4 is new doc 3 (one deleted id below it)
    val q = docs.filter(col("doc_id") === 4)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx1, q) === Map(4L -> 3L))

    // U7: metadata follows the same mapping
    val meta = (0L until 20L).map(i => (i, s"title_$i")).toDF("doc_id", "title")
    val synced = Updater.syncMetadataDelete(spark, idx1, meta, "doc_id")
    assert(synced.count() === 17L)
    val m = synced.collect().map(r => r.getAs[String]("title") -> r.getAs[Long]("doc_id")).toMap
    assert(m("title_4") === 3L)
    assert(m("title_19") === 16L)
    assert(!m.contains("title_3") && !m.contains("title_7") && !m.contains("title_15"))
  }

  test("append keeps raw_docs in sync so a later rebuild loses nothing") {
    val path = freshPath("rawsync")
    // force the append path despite a small corpus, then rebuild with
    // default thresholds — the appended docs must survive the rebuild
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 10), path)
    val idx1 = Updater.update(spark, path,
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 12)
        .withColumn("doc_id", col("doc_id") - 10),
      UpdateConfig(startFromScratch = 0, bufferSize = 1000))
    assert(idx1.numDocuments === 12L)
    assert(spark.read.parquet(s"$path/raw_docs").count() === 12L)
    val idx2 = Updater.update(spark, path,
      docs.filter(col("doc_id") === 12).withColumn("doc_id", lit(0L)))
    assert(idx2.numDocuments === 13L)
    val q = docs.filter(col("doc_id") === 11)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx2, q) === Map(11L -> 11L)) // appended doc survived the rebuild
    ivfMatchesTokens(idx2)
  }

  test("U1 rebuild preserves manifest nbits/seed/pool_factor (no silent config reset)") {
    import graft.index.IndexConfig
    val path = freshPath("cfgkeep")
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 40), path,
      IndexConfig(nbits = 2, seed = 7L, poolFactor = 2))
    val idx0 = new MultiVectorIndex(spark, path)
    assert(idx0.codec.quantizer.nbits === 2)
    // docs have 5 tokens; poolFactor=2 pools to ceil(5/2)=3
    assert(idx0.doclens.agg(max("len")).collect()(0).getLong(0) === 3L)

    // default UpdateConfig would rebuild with nbits=4/no pooling if the
    // manifest were ignored
    val idx1 = Updater.update(spark, path,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 45)
        .withColumn("doc_id", col("doc_id") - 40))
    assert(idx1.numDocuments === 45L)
    assert(idx1.manifest("nbits") === "2")
    assert(idx1.manifest("seed") === "7")
    assert(idx1.manifest("pool_factor") === "2")
    assert(idx1.codec.quantizer.nbits === 2)
    // every doc (old and newly appended) is pooled exactly once
    assert(idx1.doclens.agg(max("len")).collect()(0).getLong(0) === 3L)
    ivfMatchesTokens(idx1)

    // append path (mode 2) also pools incoming docs by the manifest factor
    val idx2 = Updater.update(spark, path,
      docs.filter(col("doc_id") === 45).withColumn("doc_id", lit(0L)),
      UpdateConfig(startFromScratch = 0, bufferSize = 1000))
    assert(idx2.doclens.filter(col("doc_id") === 45).collect()(0).getLong(1) === 3L)
  }

  test("cluster threshold refreshes as a count-weighted blend on expansion appends") {
    val path = freshPath("threfresh")
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 50), path)
    val idx0 = new MultiVectorIndex(spark, path)
    val t0 = idx0.codec.clusterThreshold
    val oldTotal = idx0.manifest("num_embeddings").toLong

    // drifted batch: far from every centroid -> large residual norms
    import spark.implicits._
    val dim = idx0.dim
    val drifted = (0L until 4L).map { d =>
      val emb = Array.tabulate(3) { t =>
        val v = Array.fill(dim)(0.0f); v(dim - 1 - t.toInt) = 1.0f; v
      }
      (d, emb)
    }.toDF("doc_id", "embeddings")

    val idx1 = Updater.append(spark, idx0, drifted, refreshThreshold = true)
    val t1 = idx1.codec.clusterThreshold

    // expected: weighted blend of old threshold and the new batch's
    // 0.75-quantile of residual norms (update.rs:385-427)
    val codec = idx0.codec
    val norms = drifted.select(posexplode(col("embeddings")).as(Seq("tok", "vec")))
      .select("vec").as[Array[Float]].collect()
      .map { vec =>
        val code = codec.assign(vec)
        var s = 0.0
        var i = 0
        while (i < dim) {
          val r = vec(i) - codec.centroids(code * dim + i); s += r * r; i += 1
        }
        math.sqrt(s).toFloat
      }
    val newQ = graft.core.Quantiles.quantile(norms, 0.75)
    val nNew = norms.length
    val expected = (t0 * oldTotal + newQ * nNew) / (oldTotal + nNew)
    assert(math.abs(t1 - expected) / expected < 1e-4,
      s"threshold $t1 != expected $expected (t0=$t0)")
    assert(t1 > t0) // drifted batch must raise the outlier threshold

    // cheap appends (mode 2) leave the threshold untouched
    val idx2 = Updater.append(spark, idx1,
      docs.filter(col("doc_id") === 50).withColumn("doc_id", lit(0L)))
    assert(idx2.codec.clusterThreshold === t1)
  }

  test("deferred delete hides docs from search; compaction equals an eager delete") {
    val pathA = freshPath("tomb_eager")
    val pathB = freshPath("tomb_defer")
    val d20 = docs.filter(col("doc_id") < 20)
    val delIds = Seq(3L, 7L, 15L)
    import spark.implicits._

    // eager reference
    MultiVectorIndex.build(spark, d20, pathA)
    val eager = Updater.delete(spark, new MultiVectorIndex(spark, pathA), delIds)

    // deferred: tombstone, search must exclude immediately, tables untouched
    MultiVectorIndex.build(spark, d20, pathB)
    val idxB0 = new MultiVectorIndex(spark, pathB)
    val tokensBefore = tokenSet(idxB0)
    Updater.deleteDeferred(spark, idxB0, delIds.toDF("doc_id"))
    val idxB1 = new MultiVectorIndex(spark, pathB)
    assert(tokenSet(idxB1) === tokensBefore) // no rewrite happened
    val q = docs.filter(col("doc_id") === 3)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    val hit = top1(idxB1, q)
    assert(hit(3L) !== 3L, "tombstoned doc still reachable by search")

    // compaction: state identical to the eager delete
    val compacted = Updater.compact(spark, idxB1)
    assert(compacted.numDocuments === eager.numDocuments)
    assert(tokenSet(compacted) === tokenSet(eager))
    assert(compacted.doclens.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === eager.doclens.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    ivfMatchesTokens(compacted)
    assert(!graft.util.Fs.exists(s"$pathB/tombstones"))
    // compact is idempotent
    assert(Updater.compact(spark, compacted).numDocuments === eager.numDocuments)
  }

  test("leftover pending_tomb (mode-3 crash artifact) is folded into tombstones at next entry") {
    val path = freshPath("tomb_recover")
    val d20 = docs.filter(col("doc_id") < 20)
    import spark.implicits._
    MultiVectorIndex.build(spark, d20, path)
    // simulate a mode-3 crash in the silent-loss window: the buffered
    // docs were re-appended (they're live in the index) but the staged
    // tombstone restore never ran — pending_tomb is the only copy
    Seq(5L, 11L).toDF("doc_id").write.parquet(s"$path/pending_tomb")
    // the next update() entry self-heals before doing its own work
    val idx1 = Updater.update(spark, path,
      docs.filter(col("doc_id") === 20)
        .select(lit(0L).as("doc_id"), col("embeddings")),
      UpdateConfig(startFromScratch = 0, bufferSize = 1000))
    assert(!graft.util.Fs.exists(s"$path/pending_tomb"))
    assert(idx1.tombstonesOpt.get.collect().map(_.getLong(0)).toSet === Set(5L, 11L))
    val q = docs.filter(col("doc_id") === 5)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    assert(top1(idx1, q)(5L) !== 5L, "recovered tombstone not hidden from search")
    // a stale artifact that DUPLICATES a live tombstone (crash before
    // the delete) stays harmless: consumers read the set distinct
    Seq(5L).toDF("doc_id").write.parquet(s"$path/pending_tomb")
    val idx2 = Updater.deleteDeferred(spark, idx1, Seq(7L).toDF("doc_id"))
    assert(!graft.util.Fs.exists(s"$path/pending_tomb"))
    assert(idx2.tombstonesOpt.get.collect().map(_.getLong(0)).toSet === Set(5L, 7L, 11L))
    // compaction applies all recovered tombstones physically
    val compacted = Updater.compact(spark, new MultiVectorIndex(spark, path))
    assert(compacted.numDocuments === 21L - 3L)
    ivfMatchesTokens(compacted)
  }

  test("stress: cyclic add/delete keeps counts, dense ids, and IVF consistency at every step") {
    // scaled twin of the reference's scifact stress baseline (75 cycles,
    // expected == actual doc count at every step): interleaved appends,
    // buffer-overflow expansions, deletes, and one deferred+compact
    import spark.implicits._
    val path = freshPath("stress")
    val cfg = UpdateConfig(startFromScratch = 0, bufferSize = 7)
    val rng = new scala.util.Random(7L)
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 10), path)
    var expected = 10L
    for (cycle <- 0 until 15) {
      // add 2-5 docs (cycling through the fixture corpus)
      val nAdd = 2 + rng.nextInt(4)
      val lo = (cycle * 7) % 80
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < lo + nAdd)
        .withColumn("doc_id", col("doc_id") - lo)
      Updater.update(spark, path, batch, cfg)
      expected += nAdd
      // delete 1-3 ids spread across the current id space
      val idx = new MultiVectorIndex(spark, path)
      assert(idx.numDocuments === expected, s"cycle $cycle post-add")
      val nDel = 1 + rng.nextInt(3)
      val delIds = (0 until nDel).map(i => (expected / (nDel + 1)) * (i + 1)).distinct
      if (cycle == 7) {
        // one deferred round: tombstone now, compact next statement
        Updater.deleteDeferred(spark, idx, delIds.toDF("doc_id"))
        Updater.compact(spark, new MultiVectorIndex(spark, path))
      } else {
        Updater.delete(spark, idx, delIds)
      }
      expected -= delIds.size
      val idx2 = new MultiVectorIndex(spark, path)
      assert(idx2.numDocuments === expected, s"cycle $cycle post-delete")
      val ids = idx2.doclens.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === (0L until expected), s"cycle $cycle dense-id invariant")
      if (cycle % 5 == 4) ivfMatchesTokens(idx2)
    }
    // the index is still fully searchable after the churn
    val idxF = new MultiVectorIndex(spark, path)
    val q = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"), col("embeddings"))
    val hits = new Searcher(idxF).search(q, exhaustive)
    assert(hits.groupBy("query_id").count().collect().forall(_.getLong(1) === 1L))
  }

  test("delete then re-add keeps the dense-id invariant (integration cycle)") {
    val path = freshPath("cycle")
    val cfg = UpdateConfig(startFromScratch = 0, bufferSize = 1000)
    MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 30), path)
    val idx1 = Updater.delete(spark, new MultiVectorIndex(spark, path), Seq(0L, 29L))
    assert(idx1.numDocuments === 28L)
    val readd = docs.filter(col("doc_id") < 2) // any two docs, local ids 0,1
    val idx2 = Updater.update(spark, path, readd, cfg)
    assert(idx2.numDocuments === 30L)
    val ids = idx2.doclens.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 30L))
    ivfMatchesTokens(idx2)
  }

  test("IndexCheck: consistent through the lifecycle; pinpoints a planted corruption") {
    import graft.index.IndexCheck
    val path = freshPath("fsck")
    val idx0 = MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 25), path)
    assert(IndexCheck.isConsistent(spark, idx0), "fresh build must validate clean")
    // stays consistent across append and delete (the documented crash
    // windows are BETWEEN table writes — completed ops must be green)
    val idx1 = Updater.append(spark, idx0,
      docs.filter(col("doc_id") >= 25 && col("doc_id") < 30)
        .select((col("doc_id") - 25).as("doc_id"), col("embeddings")))
    assert(IndexCheck.isConsistent(spark, idx1), "post-append must validate clean")
    val idx2 = Updater.delete(spark, idx1, Seq(2L, 17L))
    assert(IndexCheck.isConsistent(spark, idx2), "post-delete must validate clean")
    // plant a crash-window corruption: doclens loses one doc, manifest
    // and every other table untouched (the append-interrupted shape)
    graft.util.Fs.rewrite(idx2.doclens.filter(col("doc_id") =!= 5), s"$path/doclens")
    val bad = new MultiVectorIndex(spark, path)
    val rows = IndexCheck.validate(spark, bad).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!rows("manifest_docs") && !rows("dense_ids") &&
      !rows("doc_codes_rows") && !rows("tokens_vs_doclens") &&
      !rows("codes_vs_doclens"),
      s"corruption must trip the count checks: $rows")
    assert(rows("manifest_embeddings") && rows("code_range") && rows("ivf_pairs"),
      s"untouched tables must stay green: $rows")
    assert(!IndexCheck.isConsistent(spark, bad))
  }

  test("fsck dense_ids reports the violated bound, not a matching pair") {
    import graft.index.IndexCheck
    val path = freshPath("fsck_bound")
    val idx0 = MultiVectorIndex.build(spark, docs.filter(col("doc_id") < 10), path)
    // shift every id +1: count and distinct both still equal nDocs, so
    // the pre-r16 report printed expected == actual on the FAILING row
    // (the advisor finding); the row must now carry (0, lo)
    graft.util.Fs.rewrite(
      idx0.doclens.withColumn("doc_id", col("doc_id") + 1), s"$path/doclens")
    val bad = new MultiVectorIndex(spark, path)
    val dense = IndexCheck.validate(spark, bad).collect()
      .find(_.getString(0) == "dense_ids").get
    assert(!dense.getBoolean(1), "shifted range must fail density")
    assert(dense.getLong(2) === 0L && dense.getLong(3) === 1L,
      s"failing dense_ids row must name the violated lower bound, got " +
        s"(${dense.getLong(2)}, ${dense.getLong(3)})")
  }
}
