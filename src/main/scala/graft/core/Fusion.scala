package graft.core

/** Rank-fusion kernels for hybrid (semantic + keyword) search, mirroring
  * next-plaid/src/text_search.rs:1000-1075.
  *
  * Pure driver-side forms used for unit parity tests; the distributed
  * forms live in graft.fts.Hybrid as DataFrame column math.
  */
object Fusion {
  val RrfK: Float = 60.0f

  /** Reciprocal Rank Fusion: score(d) = alpha/(60+rank_sem) + (1-alpha)/(60+rank_kw),
    * ranks 1-based, missing list contributes 0. Sorted desc, truncated. */
  def rrf(semIds: Seq[Long], kwIds: Seq[Long], alpha: Float, topK: Int): Seq[(Long, Float)] = {
    val scores = scala.collection.mutable.LinkedHashMap.empty[Long, Float]
    semIds.zipWithIndex.foreach { case (id, r) =>
      scores(id) = scores.getOrElse(id, 0.0f) + alpha / (RrfK + r + 1.0f)
    }
    kwIds.zipWithIndex.foreach { case (id, r) =>
      scores(id) = scores.getOrElse(id, 0.0f) + (1.0f - alpha) / (RrfK + r + 1.0f)
    }
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(topK)
  }

  /** Relative-score fusion: min-max normalize each list to [0,1] (constant
    * list maps to all-1.0), weighted sum, sorted desc, truncated. */
  def relativeScore(
      sem: Seq[(Long, Float)],
      kw: Seq[(Long, Float)],
      alpha: Float,
      topK: Int
  ): Seq[(Long, Float)] = {
    def norm(xs: Seq[(Long, Float)]): Seq[(Long, Float)] = {
      if (xs.isEmpty) return Seq.empty
      val min = xs.map(_._2).min
      val max = xs.map(_._2).max
      if (max - min == 0.0f) xs.map { case (id, _) => (id, 1.0f) }
      else xs.map { case (id, s) => (id, (s - min) / (max - min)) }
    }
    val scores = scala.collection.mutable.LinkedHashMap.empty[Long, Float]
    norm(sem).foreach { case (id, s) =>
      scores(id) = scores.getOrElse(id, 0.0f) + alpha * s
    }
    norm(kw).foreach { case (id, s) =>
      scores(id) = scores.getOrElse(id, 0.0f) + (1.0f - alpha) * s
    }
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(topK)
  }
}
