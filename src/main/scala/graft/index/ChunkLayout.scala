package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** B9 — the reference's chunked encode+write layout
  * (next-plaid/src/index.rs:289-371 `encode_index_chunk`, :551-911
  * `create_index_files`): documents are processed in doc_id order in
  * chunks of `batch_size` (IndexConfig default 50_000, index.rs:88-102);
  * each chunk's embedding file stores its docs' token rows contiguously,
  * so a doc's rows live at `[token_start, token_start + len)` WITHIN its
  * chunk file.
  *
  * In this engine the physical chunk files are unnecessary — parquet is
  * splittable and column-pruned (SURVEY §2 B9/B10 fence) — but the layout
  * computation itself is the useful scale operator: assigning rows to
  * bounded-size output files with deterministic in-file offsets is how a
  * 100 TB export job bounds its writers. Computed with the two-stage
  * [[GlobalRank]] prefix sums (range repartition + partition-local
  * cumsum + a ≤numPartitions-row broadcast offset side), never a
  * single-partition window; the only per-chunk state is a numChunks-row
  * aggregate joined back by size.
  */
object ChunkLayout {

  /** From `doclens(doc_id: long, len: long-castable)` compute the chunked
    * layout under doc_id order:
    *
    *   - `doc_seq`     0-based global position of the doc,
    *   - `chunk_id`    doc_seq DIV batchSize,
    *   - `doc_offset`  doc_seq MOD batchSize (position within the chunk),
    *   - `token_start` exclusive cumsum of `len` WITHIN the chunk — the
    *                   doc's first row in its chunk file, as in the
    *                   reference's per-chunk npy offsets.
    *
    * All existing columns are preserved. Deterministic for a given input
    * (total order on doc_id). */
  def chunkLayout(doclens: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val ranked = GlobalRank.withGlobalRank(
      doclens, Seq(col("doc_id")), rankCol = "_cl_rank1")
    val summed = GlobalRank.withGlobalPrefixSum(
      ranked, col("len"), Seq(col("doc_id")), outCol = "_cl_gsum")
    val withChunk = summed
      .withColumn("doc_seq", col("_cl_rank1") - 1)
      .withColumn("chunk_id", expr(s"doc_seq DIV $batchSize"))
      .withColumn("doc_offset", col("doc_seq") % batchSize)
    // chunk base = global token offset of the chunk's first doc; one
    // numChunks-row aggregate, broadcast back (chunks ≈ N/batchSize)
    val bases = withChunk.groupBy("chunk_id")
      .agg(min(col("_cl_gsum")).as("_cl_base"))
    withChunk.join(broadcast(bases), Seq("chunk_id"))
      .withColumn("token_start", col("_cl_gsum") - col("_cl_base"))
      .drop("_cl_rank1", "_cl_gsum", "_cl_base")
  }

  /** Physically write a doc-keyed table in bounded chunks: tag each row
    * with its doc's `chunk_id` from [[chunkLayout]], cluster one writer
    * per chunk (`repartition(chunk_id)` — without it every input
    * partition would spray a small file into every chunk directory),
    * and `partitionBy("chunk_id")` so each chunk is a self-contained
    * directory — the Spark analogue of the reference's per-chunk npy
    * files (index.rs:551-911): bounded writer memory and atomic
    * per-chunk replace, the shape a 100 TB export needs. Returns the
    * chunk count. `rows` must carry a `doc_id` column; docs absent from
    * `layout` are dropped (inner join), same as the reference writing
    * only the docs in the build set. */
  def writeChunked(rows: DataFrame, layout: DataFrame, path: String): Long = {
    val keyed = rows.join(layout.select("doc_id", "chunk_id"), "doc_id")
    val nChunks = keyed.agg(countDistinct("chunk_id")).head().getLong(0)
    keyed
      .repartition(math.max(1, nChunks).toInt, col("chunk_id"))
      .write.mode("overwrite").partitionBy("chunk_id").parquet(path)
    nChunks
  }
}
