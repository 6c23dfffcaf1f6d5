package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** The metadata-store surface (reference filtering.rs public API M1-M9),
  * re-expressed as pure DataFrame transformations over an arbitrary
  * metadata table with a dense id column (`_subset_` ≡ `idCol`).
  *
  * Everything here is declarative so Catalyst pushes filters/pruning into
  * the parquet scan; nothing shuffles except the operations whose
  * semantics require it (dense re-sequencing).
  */
object MetadataOps {

  /** M3/M4 `where_condition`: validated-grammar condition + params →
    * filtered ids. The grammar validator runs first (API-parity security
    * semantics, filtering.rs:107-614); the rendered predicate is handed
    * to Catalyst, which pushes it down to the scan. */
  def whereCondition(
      df: DataFrame,
      idCol: String,
      cond: String,
      params: Seq[Where.Param]
  ): DataFrame = {
    Where.ensureUdfs(df.sparkSession)
    val pred = Where.toSparkSql(cond, params, df.columns.toSeq)
    df.filter(expr(pred)).select(col(idCol))
  }

  /** M5 `get`: full rows by condition and/or id list with LIMIT. */
  def get(
      df: DataFrame,
      idCol: String,
      cond: Option[(String, Seq[Where.Param])],
      ids: Option[Seq[Long]],
      limit: Option[Int]
  ): DataFrame = {
    Where.ensureUdfs(df.sparkSession)
    var out = df
    cond.foreach { case (c, ps) =>
      out = out.filter(expr(Where.toSparkSql(c, ps, df.columns.toSeq)))
    }
    ids.foreach(list => out = out.filter(col(idCol).isin(list: _*)))
    limit.map(out.limit).getOrElse(out)
  }

  /** M5 hydration (`get` with row_to_json_value, filtering.rs:2374-2425):
    * rows rendered as JSON objects — binary columns become base64 (Spark's
    * JSON writer does exactly the reference's BLOB→base64), nested values
    * stay JSON. Returns `(idCol, json)`. */
  def getJson(
      df: DataFrame,
      idCol: String,
      cond: Option[(String, Seq[Where.Param])],
      ids: Option[Seq[Long]],
      limit: Option[Int]
  ): DataFrame = {
    val rows = get(df, idCol, cond, ids, limit)
    rows.select(col(idCol),
      to_json(struct(rows.columns.map(col).toIndexedSeq: _*)).as("json"))
  }

  /** M6 `get_distinct_strings`: distinct non-null values of a column. */
  def distinctStrings(df: DataFrame, column: String): DataFrame =
    df.select(col(column)).where(col(column).isNotNull).distinct()

  /** M9 `count`. */
  def count(df: DataFrame): DataFrame =
    df.agg(F.count(lit(1)).as("n"))

  /** M7 `update_where`: SET assignments where condition holds; pure
    * column math (Delta UPDATE at storage level, projection here). */
  def updateWhere(
      df: DataFrame,
      cond: String,
      params: Seq[Where.Param],
      assignments: Map[String, Column]
  ): DataFrame = {
    Where.ensureUdfs(df.sparkSession)
    val pred = expr(Where.toSparkSql(cond, params, df.columns.toSeq))
    assignments.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, when(pred, v).otherwise(col(c)))
    }
  }

  /** M8/U5 delete + dense re-sequencing: drop rows matching `deletePred`,
    * renumber survivors 0..N-1 by old id order. The dense-id invariant is
    * core to the reference (metadata `_subset_`/FTS alignment,
    * index.rs:1826-1843). Runs on the range-partitioned scalable path —
    * no single global row_number() sort. */
  def deleteAndResequence(df: DataFrame, idCol: String, deletePred: Column): DataFrame = {
    val survivors = df.filter(!deletePred)
    val numRanges = df.sparkSession.sessionState.conf.numShufflePartitions
    denseResequenceScalable(survivors, idCol, numRanges)
      .withColumnRenamed(idCol, s"old_$idCol")
  }

  /** Scalable dense re-sequencing: per-range counts are collected
    * (numRanges scalars) and prefix-summed on the driver, then
    * broadcast-joined back as offsets. new_id = #survivors with smaller
    * old id — identical to `row_number()-1` ordered by old id, but the
    * only data-scale shuffle is the window's hash exchange on the range
    * id, and every window is range-local.
    *
    * The range id is derived from the DATA (approx-quantile boundaries
    * of `idCol`, a deterministic GK sketch), NOT `spark_partition_id()`
    * after repartitionByRange: the counts job and the assignment job are
    * separate Spark jobs, and AQE may coalesce the range shuffle
    * differently in each — partition ids then disagree between the two
    * passes and the offsets land on the wrong rows. Data-derived buckets
    * are consistent across jobs by construction; quantile boundaries
    * keep them balanced under any id distribution (correctness needs
    * only determinism + monotonicity of the bucket function). */
  def denseResequenceScalable(df: DataFrame, idCol: String, numRanges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probs = (1 until numRanges).map(_.toDouble / numRanges).toArray
    val bounds =
      if (numRanges <= 1) Array.empty[Double]
      else df.stat.approxQuantile(idCol, probs, 0.01).distinct.sorted
    val partCol =
      if (bounds.isEmpty) lit(0)
      else aggregate(array(bounds.map(lit).toIndexedSeq: _*), lit(0),
        (acc, b) => acc + when(col(idCol).cast("double") > b, 1).otherwise(0))
    val withPart = df.withColumn("_part", partCol)
    val counts = withPart.groupBy("_part").agg(F.count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toSeq
      .toDF("_part", "_offset")
    val wLocal = Window.partitionBy(col("_part")).orderBy(col(idCol))
    withPart
      .join(broadcast(offsets), "_part")
      .withColumn("new_id", col("_offset") + row_number().over(wLocal).cast("long") - 1)
      .drop("_part", "_offset")
  }

  /** U6 FIFO eviction: if count > maxDocuments, drop the oldest ids
    * 0..n_evict-1 and shift survivors down by n_evict (ids stay dense).
    * The evict count is a scalar aggregate, not a collect-over-rows. */
  def evictOldest(df: DataFrame, idCol: String, maxDocuments: Long): DataFrame = {
    val n = df.agg(
      greatest(F.count(lit(1)) - lit(maxDocuments), lit(0L)).as("_evict")
    )
    df.crossJoin(broadcast(n))
      .filter(col(idCol) >= col("_evict"))
      .withColumn("new_id", col(idCol) - col("_evict"))
      .drop("_evict")
  }
}
