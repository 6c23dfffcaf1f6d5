package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the MinHash-LSH chain at a ScaleProbe-scaled
  * corpus: times each prefix of the chain in isolation (fresh action per
  * prefix, no caching) so the end-to-end `p_lsh_pairs` number decomposes
  * into shingle/sign/band/bucket/verify costs. Prefix timings OVERLAP
  * (each includes its predecessors — exchange reuse inside one action
  * mirrors what the real query pays), so read deltas, not sums.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.DedupStageProbe 100"`
  * (expects /tmp/graft_scale_x<factor>/documents.parquet from ScaleProbe).
  */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 64))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"/tmp/graft_scale_x$factor/documents.parquet")
    import graft.pipeline.Dedup._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.1f")
    }

    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    def want(n: String) = only.isEmpty || only.contains(n)

    val sh = shingles(docs, "doc_id", "text", 3)
    if (want("base")) {
    time("shingles_distinct") { sh.count() }
    time("signatures") { minhashSignatures(sh, 16).count() }
    time("bands") { lshBands(minhashSignatures(sh, 16), 4).count() }
    time("candidate_pairs") {
      candidatePairs(lshBands(minhashSignatures(sh, 16), 4)).count()
    }
    time("full_verify") {
      minhashDedupPairs(docs, "doc_id", "text", 3, 16, 4, 0.5).count()
    }
    }

    // ---- EXPERIMENT A: shingles as 60-bit md5 longs (8-byte shuffle
    // keys instead of ~20-byte strings) through the whole chain ----
    val shH = docs
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .select(col("doc_id"),
        explode(expr(
          "CASE WHEN size(toks) < 3 THEN array() " +
            "ELSE transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3))) END"
        )).as("shs"))
      .select(col("doc_id"), hash60(col("shs"), lit(0)).as("sh"))
      .distinct()
    if (want("A")) time("A_shingles_hashed") { shH.count() }
    def sigsH = {
      val (as, bs) = permConsts(16)
      val aLit = s"array(${as.mkString("L,")}L)"
      val bLit = s"array(${bs.mkString("L,")}L)"
      shH
        .withColumn("base", pmod(col("sh"), lit(MinhashP)))
        .select(col("doc_id"), col("base"),
          explode(expr("sequence(0, 15)")).as("perm"))
        .withColumn("h", expr(
          s"(element_at($aLit, perm + 1) * base + element_at($bLit, perm + 1)) % $MinhashP"))
        .groupBy("doc_id", "perm")
        .agg(min("h").as("minhash"))
    }
    def bandsH = sigsH
      .withColumn("band", expr("perm div 4"))
      .groupBy("doc_id", "band")
      .agg(hash60(concat_ws(",",
        expr("transform(array_sort(collect_list(struct(perm, minhash))), x -> cast(x.minhash AS string))")
      ), lit(0)).as("band_sig"))
    // EXPERIMENT B: pair generation via collect_list + double explode
    // (one shuffle of the bands relation instead of ok-join + self-join)
    def pairsB = bandsH
      .groupBy("band", "band_sig")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")).between(2, 10000))
      .select(array_sort(col("ids")).as("sids"))
      .select(explode(expr(
        "transform(sequence(0, size(sids) - 2), i -> struct(sids[i] AS x, slice(sids, i + 2, size(sids)) AS rest))")).as("e"))
      .select(col("e.x").as("a"), explode(col("e.rest")).as("b"))
      .distinct()
    if (want("B")) time("B_pairs_collect") { pairsB.count() }
    // EXPERIMENT C: classic self-join pairs but on hashed keys
    def pairsC = {
      val ok = bandsH.groupBy("band", "band_sig")
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") <= 10000 && col("_n") >= 2)
        .select("band", "band_sig")
      val inOk = bandsH.join(ok, Seq("band", "band_sig"))
      val a = inOk.select(col("band"), col("band_sig"), col("doc_id").as("a"))
      val b = inOk.select(col("band"), col("band_sig"), col("doc_id").as("b"))
      a.join(b, Seq("band", "band_sig"))
        .filter(col("a") < col("b"))
        .select("a", "b")
        .distinct()
    }
    if (want("C")) time("C_pairs_selfjoin_hashed") { pairsC.count() }
    // EXPERIMENT F: like B but with a count prepass + semi-join so a
    // degenerate hot bucket never materializes a collect_list buffer
    def pairsF = {
      val ok = bandsH.groupBy("band", "band_sig")
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") <= 10000 && col("_n") >= 2)
        .select("band", "band_sig")
      bandsH.join(ok, Seq("band", "band_sig"), "left_semi")
        .groupBy("band", "band_sig")
        .agg(collect_list("doc_id").as("ids"))
        .select(array_sort(col("ids")).as("sids"))
        .select(explode(expr(
          "transform(sequence(0, size(sids) - 2), i -> struct(sids[i] AS x, slice(sids, i + 2, size(sids)) AS rest))")).as("e"))
        .select(col("e.x").as("a"), explode(col("e.rest")).as("b"))
        .distinct()
    }
    if (want("F")) time("F_pairs_guarded_collect") { pairsF.count() }
    // EXPERIMENT G: signatures via ONE wide groupBy (16 min columns)
    // instead of the x16 row explode + (doc, perm) groupBy
    def sigsG = {
      val (as, bs) = permConsts(16)
      val aggs = (0 until 16).map(p =>
        min(expr(s"(${as(p)}L * base + ${bs(p)}L) % $MinhashP")).as(s"h$p"))
      shH.withColumn("base", pmod(col("sh"), lit(MinhashP)))
        .groupBy("doc_id")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"),
          posexplode(array((0 until 16).map(i => col(s"h$i")): _*)))
        .withColumnRenamed("pos", "perm").withColumnRenamed("col", "minhash")
    }
    if (want("G")) {
      time("G_sigs_wide") { sigsG.count() }
      time("G2_sigs_explode") { sigsH.count() }
    }
    // EXPERIMENT H: ngram-jaccard candidate pairs — rare-shingle bucket
    // self-join (current) vs collect+double-explode
    if (want("H")) {
      def rareSh = {
        val rare = shH.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20 && col("df") >= 2)
          .select("sh")
        shH.join(rare, "sh")
      }
      time("H1_ngram_pairs_selfjoin") {
        rareSh.select(col("sh"), col("doc_id").as("a"))
          .join(rareSh.select(col("sh"), col("doc_id").as("b")), "sh")
          .filter(col("a") < col("b"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("_shared"))
          .filter(col("_shared") >= 2)
          .count()
      }
      time("H2_ngram_pairs_collect") {
        rareSh.groupBy("sh")
          .agg(array_sort(collect_list("doc_id")).as("sids"))
          .select(explode(expr(
            "transform(sequence(0, size(sids) - 2), i -> struct(sids[i] AS x, slice(sids, i + 2, size(sids)) AS rest))")).as("e"))
          .select(col("e.x").as("a"), explode(col("e.rest")).as("b"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("_shared"))
          .filter(col("_shared") >= 2)
          .count()
      }
    }
    // full verify on hashed shingles, pairs from B
    if (want("D")) time("D_full_verify_hashed") {
      val sizes = shH.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairsB
        .join(shH.select(col("doc_id").as("a"), col("sh")), "a")
        .join(shH.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5).count()
    }
    // EXPERIMENT E: verify via per-doc sorted shingle arrays + local
    // array_intersect — two 500k-row array joins instead of two 26M-row
    // shingle joins
    if (want("E")) time("E_verify_arrays") {
      val docSets = shH.groupBy("doc_id")
        .agg(array_sort(collect_list("sh")).as("shs"), count(lit(1)).as("n"))
      pairsB
        .join(docSets.select(col("doc_id").as("a"), col("shs").as("sha"),
          col("n").as("na")), "a")
        .join(docSets.select(col("doc_id").as("b"), col("shs").as("shb"),
          col("n").as("nb")), "b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5).count()
    }
    spark.stop()
  }
}
