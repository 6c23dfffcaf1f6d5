package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Ward

/** E3 hierarchical Ward pooling: linkage math (hand-computed
  * Lance-Williams fixture), maxclust cuts, and document pooling. */
class WardSpec extends AnyFunSuite {

  test("linkage merges the closest pair first with hand-computed Ward height") {
    // condensed distances for 3 points: d(0,1)=0.1, d(0,2)=0.5, d(1,2)=0.45
    val merges = Ward.linkage(Array(0.1, 0.5, 0.45), 3)
    assert(merges.length === 2)
    assert((merges(0).a, merges(0).b) === (0, 1))
    assert(math.abs(merges(0).dist - 0.1) < 1e-12)
    assert(merges(0).size === 2)
    // Lance-Williams: d²(2,{01}) = (2·0.5² + 2·0.45² − 1·0.1²)/3
    val expected = math.sqrt((2 * 0.25 + 2 * 0.2025 - 0.01) / 3.0)
    assert((merges(1).a, merges(1).b) === (2, 3))
    assert(math.abs(merges(1).dist - expected) < 1e-12)
    assert(merges(1).size === 3)
  }

  test("linkage heights are monotone non-decreasing on random-ish input") {
    val vecs = Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.9f, 0.1f, 0.0f), Array(0.0f, 1.0f, 0.1f),
      Array(0.1f, 0.9f, 0.0f), Array(0.5f, 0.5f, 0.7f), Array(0.0f, 0.0f, 1.0f))
    val merges = Ward.linkage(Ward.pdistCosine(vecs), vecs.length)
    assert(merges.length === 5)
    merges.sliding(2).foreach { w =>
      assert(w(0).dist <= w(1).dist + 1e-12)
    }
    assert(merges.last.size === 6)
  }

  test("fclusterMaxclust separates two obvious groups") {
    val vecs = Array(
      Array(1.0f, 0.0f), Array(0.99f, 0.05f), Array(0.98f, 0.02f),
      Array(0.0f, 1.0f), Array(0.05f, 0.99f), Array(0.02f, 0.98f))
    val labels = Ward.fclusterMaxclust(
      Ward.linkage(Ward.pdistCosine(vecs), 6), 6, maxclust = 2)
    assert(labels.distinct.sorted.toSeq === Seq(0, 1))
    assert(labels.take(3).distinct.length === 1)
    assert(labels.drop(3).distinct.length === 1)
    assert(labels(0) !== labels(3))
  }

  test("poolDocument pools to ceil(n/poolFactor) cluster means; factor 1 is identity") {
    val a = Array(1.0f, 0.0f); val b = Array(0.0f, 1.0f)
    val emb = Array(a, a, a, b, b, b)
    assert(Ward.poolDocument(emb, 1) === emb)
    val pooled = Ward.poolDocument(emb, 3)
    assert(pooled.length === 2)
    // first-leaf-order labels: cluster of leaf 0 (the a's) comes first
    assert(pooled(0).toSeq === Seq(1.0f, 0.0f))
    assert(pooled(1).toSeq === Seq(0.0f, 1.0f))
  }

  test("pooled index build keeps doc count and shrinks token count") {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") / 5).cast("long").as("doc_id"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (d, v, e) => (d, v, graft.core.MaxSim.l2Normalize(e)) }
      .toDF("doc_id", "vec_id", "embedding")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("embedding")))),
        x => x.getField("embedding")).as("embeddings"))
      .filter(col("doc_id") < 20)
    val path = "/tmp/graft_ward_idx"
    graft.util.Fs.deleteRecursively(path)
    val idx = graft.index.MultiVectorIndex.build(spark, docs, path,
      graft.index.IndexConfig(poolFactor = 2))
    assert(idx.numDocuments === 20L)
    // 5 tokens per doc pooled to ceil(5/2)=3
    assert(idx.manifest("num_embeddings").toLong === 20L * 3)
  }
}
