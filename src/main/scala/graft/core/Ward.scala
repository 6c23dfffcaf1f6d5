package graft.core

import scala.collection.mutable.ArrayBuffer

/** Hierarchical (Ward) pooling of multi-vector documents — E3 in the
  * reference (next-plaid-onnx/src/hierarchy.rs:90-128 linkage,
  * :404-598 fcluster, :599-665 cosine pdist; driven by
  * `pool_document_embeddings` lib.rs:1632-1643).
  *
  * Algorithm (public knowledge): cosine pdist → Ward linkage via the
  * NN-chain algorithm with the Lance-Williams update on squared
  * distances (O(n²), scipy-compatible merge tree) → `fcluster`
  * maxclust cut → mean-pool each cluster. Pure JVM kernel; applied per
  * document inside mapPartitions, so pooling is embarrassingly parallel
  * and shuffle-free.
  */
object Ward {

  /** Condensed cosine distance matrix: d(i,j) = 1 − cos(v_i, v_j). */
  def pdistCosine(vecs: Array[Array[Float]]): Array[Double] = {
    val n = vecs.length
    val out = new Array[Double]((n * (n - 1)) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = 1.0 - MaxSim.cosine(vecs(i), vecs(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** One linkage merge: clusters `a` and `b` (scipy ids: leaves 0..n-1,
    * merged cluster i gets id n+i) joined at height `dist` into a cluster
    * of `size` leaves. */
  final case class Merge(a: Int, b: Int, dist: Double, size: Int)

  /** Ward linkage by NN-chain over the condensed distance matrix.
    * Returns n−1 merges sorted by height (scipy `linkage` order). */
  def linkage(condensed: Array[Double], n: Int): Array[Merge] = {
    if (n <= 1) return Array.empty
    // working squared-distance matrix between active clusters
    val d2 = Array.ofDim[Double](n, n)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = condensed(idx)
        d2(i)(j) = d * d; d2(j)(i) = d * d
        idx += 1
        j += 1
      }
      i += 1
    }
    val size = Array.fill(n)(1)
    val active = Array.fill(n)(true)
    // cluster slot -> scipy id (slot reused for the merged cluster)
    val scipyId = Array.tabulate(n)(identity)
    var nextId = n
    val merges = ArrayBuffer.empty[Merge]
    val chain = new ArrayBuffer[Int]

    while (merges.length < n - 1) {
      if (chain.isEmpty) {
        var s = 0
        while (!active(s)) s += 1
        chain += s
      }
      var done = false
      while (!done) {
        val x = chain.last
        // nearest active neighbor of x (smallest d², tie → smaller slot)
        var best = -1
        var bestD = Double.PositiveInfinity
        var y = 0
        while (y < n) {
          if (active(y) && y != x && d2(x)(y) < bestD) { bestD = d2(x)(y); best = y }
          y += 1
        }
        if (chain.length > 1 && chain(chain.length - 2) == best) {
          // reciprocal nearest neighbors -> merge x and best
          val a = math.min(x, best); val b = math.max(x, best)
          val na = size(a); val nb = size(b)
          val height = math.sqrt(d2(a)(b))
          merges += Merge(
            math.min(scipyId(a), scipyId(b)), math.max(scipyId(a), scipyId(b)),
            height, na + nb)
          // Lance-Williams Ward update into slot a
          var k = 0
          while (k < n) {
            if (active(k) && k != a && k != b) {
              val nk = size(k)
              val tot = (na + nb + nk).toDouble
              val upd = ((na + nk) * d2(a)(k) + (nb + nk) * d2(b)(k) - nk * d2(a)(b)) / tot
              d2(a)(k) = upd; d2(k)(a) = upd
            }
            k += 1
          }
          active(b) = false
          size(a) = na + nb
          scipyId(a) = nextId
          nextId += 1
          chain.remove(chain.length - 1)
          if (chain.nonEmpty && (chain.last == a || chain.last == b))
            chain.remove(chain.length - 1)
          done = true
        } else {
          chain += best
        }
      }
    }
    // scipy emits rows sorted by height; renumber merged ids accordingly
    // stable sort by height only — Ward is monotone, so references to
    // merged ids never cross forward even when ties reorder
    val sorted = merges.sortBy(_.dist).toArray
    val remap = new Array[Int](2 * n - 1)
    var s = 0
    while (s < n) { remap(s) = s; s += 1 }
    // old id (n + position-in-merge-order) -> new id (n + position-in-sorted)
    val oldOrder = merges.toArray
    val posOf = oldOrder.zipWithIndex.map { case (m, p) => m -> p }.toMap
    sorted.zipWithIndex.foreach { case (m, p) => remap(n + posOf(m)) = n + p }
    sorted.map(m => Merge(
      math.min(remap(m.a), remap(m.b)), math.max(remap(m.a), remap(m.b)),
      m.dist, m.size))
  }

  /** `fcluster(Z, maxclust)`: apply merges in height order until exactly
    * `maxclust` clusters remain; returns a dense 0-based label per leaf
    * (labels ordered by smallest leaf index in the cluster). */
  def fclusterMaxclust(merges: Array[Merge], n: Int, maxclust: Int): Array[Int] = {
    val parent = Array.tabulate(2 * n - 1)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    val toApply = math.max(n - math.max(maxclust, 1), 0)
    var i = 0
    while (i < toApply && i < merges.length) {
      val m = merges(i)
      parent(find(m.a)) = n + i
      parent(find(m.b)) = n + i
      i += 1
    }
    val roots = (0 until n).map(find)
    val order = roots.distinct.sortBy(r => (0 until n).find(l => find(l) == r).get)
    val labelOf = order.zipWithIndex.toMap
    roots.map(labelOf).toArray
  }

  /** E3 entry: pool a document's token embeddings down to
    * `ceil(n / poolFactor)` cluster means. poolFactor ≤ 1 → unchanged.
    * Cluster means are emitted in first-leaf order (stable). */
  def poolDocument(emb: Array[Array[Float]], poolFactor: Int): Array[Array[Float]] = {
    val n = emb.length
    if (poolFactor <= 1 || n <= 1) return emb
    val maxclust = math.max(1, (n + poolFactor - 1) / poolFactor)
    if (maxclust >= n) return emb
    val labels = fclusterMaxclust(linkage(pdistCosine(emb), n), n, maxclust)
    val dim = emb(0).length
    val k = labels.max + 1
    val sums = Array.ofDim[Double](k, dim)
    val counts = new Array[Int](k)
    var i = 0
    while (i < n) {
      val c = labels(i)
      var d = 0
      while (d < dim) { sums(c)(d) += emb(i)(d); d += 1 }
      counts(c) += 1
      i += 1
    }
    Array.tabulate(k) { c =>
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) { out(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
      out
    }
  }
}
