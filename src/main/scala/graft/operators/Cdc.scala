package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the MERGE/upsert primitive (Delta
  * `APPLY CHANGES`, Iceberg `MERGE INTO`, Hudi upsert) expressed as a
  * plain Spark plan: union the base snapshot with the change log, keep
  * the LATEST row per key (change-log sequence order, base rows rank
  * below every change), drop keys whose latest change is a delete.
  *
  * One shuffle on the key + a per-key top-1 window — the same cost as
  * any keyed aggregation, and the idiomatic way to compact a CDC log
  * without a mutable table format. At 100 TB the base never rewrites:
  * this IS the compaction job a lakehouse runs to publish the next
  * snapshot, and it composes with [[graft.operators.TimeSeries]]'s
  * scd2 (the history-keeping variant) — applyChanges keeps ONLY the
  * current row per key, scd2 keeps every validity interval.
  *
  * Contract: `seqCol` orders changes per key and must be unique per
  * (key, seq) — two changes to one key at the same sequence have no
  * defined winner (the same contract as Delta's `__sequence_by`).
  * `opCol` values: `I`/`U` upsert (identical here, as in Delta), `D`
  * deletes the key. Base rows need no op/seq columns.
  */
object Cdc {

  /** @param base    current snapshot (keys… + payload columns)
    * @param changes CDC log: same columns as base + `seqCol` + `opCol`
    * @param keys    primary-key columns
    * @param seqCol  per-key change ordering (unique per key)
    * @param opCol   I/U/D marker column
    * @return the next snapshot, schema identical to `base` */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val payload = base.columns.toSeq
    require(!payload.contains(seqCol) && !payload.contains(opCol),
      s"base must not already carry $seqCol/$opCol")
    import org.apache.spark.sql.expressions.Window
    // base ranks below every change: seq = null, and the window orders
    // nulls last under desc — explicit nulls_last keeps that contract
    // independent of defaults
    val taggedBase = base
      .withColumn(seqCol, lit(null).cast(changes.schema(seqCol).dataType))
      .withColumn(opCol, lit("I"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc_nulls_last)
    taggedBase.unionByName(changes.select(taggedBase.columns.map(col).toIndexedSeq: _*))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .select(payload.map(col): _*)
  }

  /** Snapshot reconciliation — the INVERSE of [[applyChanges]]: diff
    * two versions of a table into a change log
    * `(keys…, change_type ∈ insert|delete|update)`, the "what changed
    * between yesterday's and today's extract" primitive (anti-entropy
    * auditing, CDC bootstrap for sources that only give full dumps).
    *
    * Rows are compared by an md5 fingerprint of `valueCols` (default:
    * every non-key column, name-sorted) with NULLs made explicit —
    * identical rows drop out, so the output is change-sized, not
    * table-sized. Pre-quantize float columns (e.g. to cents) before
    * diffing: raw double→string rendering is engine/locale-shaped and
    * belongs outside a portable fingerprint.
    *
    * Shape: one full-outer equi-join on the key (both sides shuffle
    * once on the same key — co-partitioned/bucketed snapshots join
    * with no exchange at all), fingerprints computed scan-side. */
  def diffSnapshots(
      oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      valueCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "diffSnapshots needs at least one key column")
    val vals =
      if (valueCols.nonEmpty) valueCols
      else (oldDf.columns.toSet -- keys).toSeq.sorted
    require(vals.nonEmpty, "no value columns to compare")
    def fp(df: DataFrame, name: String) = df.select(
      keys.map(col) :+ md5(concat_ws("#",
        vals.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*))
        .as(name): _*)
    fp(oldDf, "_fp_old")
      .join(fp(newDf, "_fp_new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_fp_old").isNull, lit("insert"))
          .when(col("_fp_new").isNull, lit("delete"))
          .when(col("_fp_old") =!= col("_fp_new"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
