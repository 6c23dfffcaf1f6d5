package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * 100 TB export job bounds its writers. Computed with the
  * [[graft.operators.GlobalRank]] two-stage shape (range repartition +
  * partition-local rank/cumsum + a ≤numPartitions-row broadcast offset
  * side), with the partition-local pass as one narrow mapPartitions so
  * the corpus shuffles exactly ONCE — never a single-partition window
  * over the corpus; the only per-chunk state is a numChunks-row
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
    * Output carries exactly `(doc_id, len)` plus the four layout columns
    * (extra input columns are dropped — join them back on doc_id, or use
    * [[writeChunked]] which does). Deterministic for a given input
    * (total order on doc_id). */
  def chunkLayout(doclens: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import org.apache.spark.sql.expressions.Window
    import doclens.sparkSession.implicits._
    // ONE corpus shuffle total: range-repartition once, sort within
    // partitions, then a NARROW mapPartitions pass emits the local rank
    // and local token cumsum together (the first cut composed
    // GlobalRank.withGlobalRank + withGlobalPrefixSum — correct, but it
    // shuffled the corpus once per stage, and a pid-partitioned window
    // adds a corpus-sized hash exchange on top of the range exchange
    // because Catalyst can't know range-by-doc_id already clusters the
    // pid). AQE's ReuseExchange serves the one range shuffle to all
    // downstream consumers; everything above it is partition-local or
    // bounded by the partition/chunk count.
    val n = doclens.sparkSession.sessionState.conf.numShufflePartitions
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): a
    // downstream coalesce() merges several range partitions into one
    // task that still runs this closure once per PARENT partition — the
    // task id would stamp every parent with the same pid while the rank
    // reset per parent, silently corrupting the global sequence (found
    // by the b9 gate under Verify's coalesce(1) dump). The WithIndex
    // variant receives the true parent partition index in both worlds.
    val local = doclens
      .select(col("doc_id").cast("long"), col("len").cast("long"))
      .repartitionByRange(n, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var rank = 0L
        var cum = 0L
        it.map { case (d, l) =>
          val r = (d, l, pid, rank, cum); rank += 1L; cum += l; r
        }
      }
      .toDF("doc_id", "len", "_cl_pid", "_cl_lrank0", "_cl_lsum")
    // exclusive prefix sums of per-partition (count, token) totals:
    // ≤ numPartitions rows, one tiny single-partition window
    val wOff = Window.orderBy("_cl_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("_cl_pid")
      .agg(count(lit(1)).as("_cl_cnt"), sum("len").as("_cl_tok"))
      .withColumn("_cl_rankoff", coalesce(sum("_cl_cnt").over(wOff), lit(0L)))
      .withColumn("_cl_sumoff", coalesce(sum("_cl_tok").over(wOff), lit(0L)))
      .select("_cl_pid", "_cl_rankoff", "_cl_sumoff")
    val withChunk = local.join(broadcast(offsets), Seq("_cl_pid"))
      .withColumn("doc_seq", col("_cl_rankoff") + col("_cl_lrank0"))
      .withColumn("_cl_gsum", col("_cl_sumoff") + col("_cl_lsum"))
      .withColumn("chunk_id", expr(s"doc_seq DIV $batchSize"))
      .withColumn("doc_offset", col("doc_seq") % batchSize)
    // chunk base = global token offset of the chunk's first doc — a
    // numChunks-row aggregate joined back by chunk_id. NO forced
    // broadcast hint here: numChunks = N/batchSize is unbounded (a
    // degenerate batchSize at 100M docs makes bases corpus-sized), so
    // the hint would bypass Catalyst's size guard; AQE broadcasts it
    // whenever it actually fits and falls back to a shuffle join when
    // it doesn't. The offsets join above keeps its hint — that side is
    // ≤ numShufflePartitions rows by construction.
    val bases = withChunk.groupBy("chunk_id")
      .agg(min(col("_cl_gsum")).as("_cl_base"))
    withChunk.join(bases, Seq("chunk_id"))
      .withColumn("token_start", col("_cl_gsum") - col("_cl_base"))
      .drop("_cl_pid", "_cl_lrank0", "_cl_lsum", "_cl_rankoff",
        "_cl_sumoff", "_cl_gsum", "_cl_base")
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
    // cap the writer-task count: one-file-per-chunk needs only that a
    // chunk's rows land in ONE partition (hash clustering on chunk_id
    // gives that at any partition count — a task just writes one file
    // per chunk directory it holds); a degenerate batchSize (chunk
    // count ~ doc count) must not explode into millions of tasks
    val writers = math.max(1L, math.min(nChunks, 10000L)).toInt
    keyed
      .repartition(writers, col("chunk_id"))
      .write.mode("overwrite").partitionBy("chunk_id").parquet(path)
    nChunks
  }
}
