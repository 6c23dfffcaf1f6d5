package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation chain (pl_e2e operator). The load-bearing
  * assertion is the STAGE ORDER one: a 4-copy mirror family must come
  * out as exactly its min-id member. With the reversed (clean-first)
  * order the C4 line-df rule sees every line of the family as
  * recurring boilerplate (df = 4 > 2), drops them all, page_pass
  * fails, and the WHOLE family dies — the cross-operator bug the ×100
  * rehearsal caught (SCALE.md:327). This spec pins it at unit scale. */
class CurationPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val vocab = Vector(
    "spark", "join", "table", "query", "merge", "filter", "reduce",
    "window", "stream", "batch", "vector", "index", "search", "token",
    "corpus", "model", "train", "weight", "layer", "shard", "codec",
    "plan", "scan", "probe", "bucket", "hash", "score", "rank")

  // seeded RNG, not f(seed)+g(i) arithmetic: an additive generator
  // makes seeds congruent mod vocab-size produce IDENTICAL texts, and
  // C4's line-df rule then (correctly) nukes the accidental mirrors
  private def words(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => vocab(r.nextInt(vocab.length))).mkString(" ")
  }

  // a 24-word verbatim run: longer than one kept-line period (8 kept +
  // 8 dropped tokens), so at least one kept 8-word line lands fully
  // inside it regardless of alignment — guaranteeing >= 4 shared
  // 5-grams between doc 9's CLEANED text and eval doc 20's RAW text
  private val run = words(40, 24)

  private def docs(): DataFrame = {
    import spark.implicits._
    val mirror = words(1, 36)
    val near = words(6, 36)
    val base: Seq[(Long, String)] =
      Seq(
        0L -> words(0, 36), // eval split (0 % 20 == 0)
        1L -> mirror, 2L -> mirror, 3L -> mirror, 4L -> mirror,
        5L -> (words(5, 30) + " spark join table query merge"),
        6L -> near,
        // near-dup of 6 by SUBSTITUTION (same word count): an inserted
        // word would shift every later 8-word C4 chunk boundary and the
        // cleaned texts would diverge entirely
        7L -> near.split(" ").updated(17, "extra").mkString(" "),
        8L -> (words(8, 30) + " spark join vector index search"),
        9L -> (words(9, 10) + " " + run), // contaminated by eval 20
        20L -> (words(20, 12) + " " + run) // eval split
      ) ++ (10L to 19L).map(i => i -> words(i.toInt, 36))
    base.toDF("doc_id", "text")
  }

  private def embeddings(): DataFrame = {
    import spark.implicits._
    // 5 token-vectors per doc for docs 0..19; doc 8's vectors equal the
    // query's (doc 0) so it MaxSim-dominates
    val rows = (0L until 100L).map { v =>
      val d = v / 5
      val src = if (d == 8L) v % 5 else v
      val e = Array.tabulate(4)(j =>
        (math.sin(src * 13.0 + j * 7.0) * 100).round / 100.0f)
      (v, e.map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("no-fingerprint run is side-effect free: zero filesystem writes, ever") {
    val dir = "/tmp/graft_curation_spec_pure_fts"
    graft.util.Fs.deleteRecursively(dir)
    // constructing the DataFrame must not touch disk (r18 verdict item
    // 2: the old bare path deleted + rebuilt the FTS dir at PLAN time)
    val out = graft.pipeline.CurationPipeline.run(spark, docs(), embeddings(), dir)
    assert(!graft.util.Fs.exists(dir),
      "plan construction wrote the FTS dir")
    // ...and the in-memory BM25 leg never writes it at ACTION time
    // either — the no-reuse-key path scores postings frames directly
    assert(out.count() > 0)
    assert(!graft.util.Fs.exists(dir),
      "materialization wrote the FTS dir in the no-fingerprint path")
    // a pre-existing artifact at the path is left untouched
    graft.util.Fs.writeBytes(s"$dir/sentinel", "keep".getBytes("UTF-8"))
    val fpBefore = graft.util.Fs.fingerprint(dir)
    graft.pipeline.CurationPipeline.run(spark, docs(), embeddings(), dir).count()
    assert(graft.util.Fs.fingerprint(dir) === fpBefore,
      "no-fingerprint run mutated a pre-existing dir")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("fingerprint vs bare path: identical output, fingerprint path builds once") {
    val dir = "/tmp/graft_curation_spec_fp_fts"
    graft.util.Fs.deleteRecursively(dir)
    val bare = graft.pipeline.CurationPipeline
      .run(spark, docs(), embeddings(), s"$dir/unused")
      .collect().map(_.toString).sorted.toSeq
    val keyed = graft.pipeline.CurationPipeline
      .run(spark, docs(), embeddings(), dir, sourceFp = "spec-fp-1")
      .collect().map(_.toString).sorted.toSeq
    // the in-memory BM25 leg and the persisted-index leg are the same
    // Fts.search math over the same tf/dl integers — bit-identical rows
    assert(bare === keyed)
    assert(graft.util.Fs.exists(s"$dir/fts.json"))
    // re-run with the same key reuses the artifact (fingerprint stable)
    val fp1 = graft.util.Fs.fingerprint(dir)
    graft.pipeline.CurationPipeline
      .run(spark, docs(), embeddings(), dir, sourceFp = "spec-fp-1").count()
    assert(graft.util.Fs.fingerprint(dir) === fp1, "keyed re-run rebuilt the index")
    graft.util.Fs.deleteRecursively(dir)
  }

  test("composed chain: dedup-first order, near-dup collapse, decontamination, hybrid topk") {
    val out = graft.pipeline.CurationPipeline
      .run(spark, docs(), embeddings(), "/tmp/graft_curation_spec_fts")
      .collect()
    val survivors = out.filter(_.getString(0) == "survivor")
      .map(_.getLong(1)).toSet
    val topk = out.filter(_.getString(0) == "topk")

    // stage-order pin: the mirror family survives as exactly doc 1
    assert(survivors.intersect(Set(1L, 2L, 3L, 4L)) === Set(1L),
      s"mirror family mishandled; survivors=$survivors")
    // near-dup pair collapses to its min id
    assert(survivors.intersect(Set(6L, 7L)) === Set(6L))
    // decontamination: doc 9 shares the run with eval doc 20; doc 11 is
    // the clean control
    assert(!survivors.contains(9L))
    assert(survivors.contains(11L))
    // the eval split is never in the training output
    assert(survivors.forall(_ % 20 != 0))
    // survivor rows carry null score/rank
    assert(out.filter(_.getString(0) == "survivor")
      .forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // hybrid topk: non-empty, ranks contiguous from 1, all ranked docs
    // are survivors, and the planted MaxSim twin (doc 8) is ranked
    val ranks = topk.map(_.getLong(3)).sorted
    assert(ranks.nonEmpty && ranks.length <= 10)
    assert(ranks.toSeq === (1L to ranks.length).toSeq)
    assert(topk.map(_.getLong(1)).toSet.subsetOf(survivors))
    assert(topk.map(_.getLong(1)).contains(8L))
  }
}
