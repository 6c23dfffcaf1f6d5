package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fts.{FtsIndex, Hybrid}
import graft.index.MultiVectorIndex
import graft.meta.{MetadataOps, Where}

/** F9: the full hybrid-search driver API — the reference's
  * `POST /indices/{name}/search` orchestration
  * (next-plaid-api/src/handlers/search.rs:124-413): mode ∈
  * {semantic, keyword, hybrid}, α ∈ [0,1] (default 0.75), fusion ∈
  * {rrf, relative_score} (default relative_score), optional
  * filter_condition resolved to a doc-id subset FIRST (so both retrieval
  * legs prune), hybrid over-fetch fetch_k = 3·top_k.
  */
final case class HybridParams(
    mode: String = "hybrid",
    alpha: Double = Hybrid.DefaultAlpha,
    fusion: String = "relative_score",
    topK: Int = 10,
    searchParams: SearchParams = SearchParams()
)

object HybridSearch {

  /** Batched hybrid search. `queries(query_id, embeddings)` (ignored in
    * keyword mode), one `textQuery` fused against every vector query
    * (the request shape of the reference API), optional metadata filter
    * `(metaTable, cond, params)` with `_subset_` ≡ doc_id. Returns
    * `(query_id, doc_id, score, rank)`. */
  def search(
      spark: SparkSession,
      index: MultiVectorIndex,
      fts: FtsIndex,
      queries: DataFrame,
      textQuery: String,
      params: HybridParams = HybridParams(),
      filter: Option[(DataFrame, String, Seq[Where.Param])] = None,
      /** Caller-cached Searcher (GraftIndex reuses one across calls so
        * the serving fast path's image stays warm); a fresh one is
        * built when absent. */
      searcherOpt: Option[Searcher] = None
  ): DataFrame = {
    require(params.alpha >= 0.0 && params.alpha <= 1.0, s"alpha out of range: ${params.alpha}")
    require(Set("semantic", "keyword", "hybrid")(params.mode), s"bad mode: ${params.mode}")
    require(Set("rrf", "relative_score")(params.fusion), s"bad fusion: ${params.fusion}")

    // filter_condition first (handlers/search.rs:181-189)
    val subset: Option[DataFrame] = filter.map { case (meta, cond, ps) =>
      MetadataOps.whereCondition(meta, "doc_id", cond, ps).select("doc_id")
    }
    // the FTS leg must not resurface tombstoned docs (the vector leg
    // excludes them inside Searcher); fold the tombstones into the FTS
    // subset as an anti-join
    val ftsSubset: Option[DataFrame] = (subset, index.tombstonesOpt) match {
      case (s, None) => s
      case (Some(s), Some(tomb)) => Some(s.join(tomb, Seq("doc_id"), "left_anti"))
      case (None, Some(tomb)) =>
        Some(fts.doclens.select("doc_id").join(tomb, Seq("doc_id"), "left_anti"))
    }
    val fetchK = if (params.mode == "hybrid") Hybrid.fetchK(params.topK) else params.topK

    def semList: DataFrame = searcherOpt.getOrElse(new Searcher(index))
      .search(queries, params.searchParams.copy(topK = fetchK), subset)
      .select("query_id", "doc_id", "score", "rank")

    def kwList: DataFrame = {
      val hits = fts.search(textQuery, fetchK, ftsSubset)
        .select("doc_id", "score", "rank")
      // the single keyword list pairs with every vector query
      queries.select("query_id").distinct().crossJoin(broadcast(hits))
    }

    params.mode match {
      case "semantic" => semList
      case "keyword" =>
        // fetchK == params.topK outside hybrid mode, so the shared
        // kwList IS the keyword result — one retrieval code path to
        // keep tombstone/subset wiring in sync
        kwList.select("query_id", "doc_id", "score", "rank")
      case "hybrid" =>
        val fused =
          if (params.fusion == "rrf")
            Hybrid.rrfGrouped(
              semList.select("query_id", "doc_id", "rank"),
              kwList.select("query_id", "doc_id", "rank"),
              params.alpha, params.topK)
          else
            Hybrid.relativeScoreGrouped(
              semList.select("query_id", "doc_id", "score"),
              kwList.select("query_id", "doc_id", "score"),
              params.alpha, params.topK)
        fused.select("query_id", "doc_id", "score", "rank")
    }
  }
}
