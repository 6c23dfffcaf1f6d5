package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fts.FtsIndex
import graft.util.Fs

/** C7: the incremental code-reindex loop (colgrep/src/index/mod.rs:
  * 1615-1956, state.rs) — detect changed/deleted files against the
  * persisted content-hash state, re-extract only those files' code
  * units, and patch the units table + FTS postings per file. Cost is
  * bounded by the touched files; unchanged files are never re-parsed.
  *
  * Artifacts under `dir`:
  * {{{
  * state/      (path, content_hash)
  * units/      (unit_id, file, language, kind, name, signature,
  *              start_line, end_line, text, calls) — C2 embed text per unit
  * called_by/  (unit_id, called_by)  — INDEX-WIDE reverse call edges
  * fts/        persisted postings over unit text (identifier-aware)
  * }}}
  *
  * `called_by` resolves each unit's file-local call list against the
  * index-wide definition table (the cross-file layer-2 graph the
  * per-file extractor can't see — colgrep resolves the same way after
  * parsing, mod.rs:1615-1956). It is recomputed on any sync that
  * touches files: one name-equi-join plus an aggregation over the units
  * table — a new caller in ANY file may add edges to defs anywhere, so
  * the reverse table is global by nature.
  *
  * Unit ids are stable content-independent hashes of
  * (file, kind, name, start_line) — no dense renumber needed, so file
  * patches never touch other files' rows.
  */
object CodeIndexer {

  final case class SyncStats(changed: Long, deleted: Long, totalUnits: Long)

  private def unitRows(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select("path", "source")
      .as[(String, String)]
      .flatMap { case (p, s) =>
        CodeUnits.extractUnits(p, s).map { u =>
          (DedupId.of(u), u.file, u.language, u.kind, u.name, u.signature,
            u.startLine, u.endLine, CodeUnits.embedText(u), u.calls)
        }
      }
      .toDF("unit_id", "file", "language", "kind", "name", "signature",
        "start_line", "end_line", "text", "calls")
  }

  private object DedupId {
    def of(u: CodeUnits.CodeUnit): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${u.file}#${u.kind}#${u.name}#${u.startLine}".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
  }

  /** Read a source tree into `(path, source)` rows — the colgrep CLI's
    * directory walk as a Spark scan. Built on the `binaryFile` source
    * (recursive, glob-filterable, distributed) with an oversize cap
    * mirroring colgrep's skip of generated/vendored megafiles; decoding
    * is UTF-8 with replacement, matching String(bytes) semantics. */
  def readTree(
      spark: SparkSession, root: String,
      glob: Option[String] = None,
      maxBytes: Long = 2L * 1024 * 1024): DataFrame = {
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(root)
      .filter(col("length") <= maxBytes)
      .select(col("path"), col("content").cast("string").as("source"))
  }

  def units(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/units")

  /** Index-wide reverse call edges `(unit_id, called_by: array<string>)`
    * — a def's callers across ALL indexed files. */
  def calledBy(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/called_by")

  def ftsIndex(spark: SparkSession, dir: String): FtsIndex =
    new FtsIndex(spark, s"$dir/fts")

  /** Bring the index in sync with `files(path, source)`. */
  def sync(spark: SparkSession, files: DataFrame, dir: String): SyncStats = {
    val hasState = Fs.exists(s"$dir/state")
    val state =
      if (hasState) spark.read.parquet(s"$dir/state")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("content_hash",
            org.apache.spark.sql.types.LongType))))
    val (changed, deleted) = CodeUnits.diffState(files, state)
    val nChanged = changed.count()
    val nDeleted = deleted.count()

    if (nChanged + nDeleted > 0) {
      val affectedPaths = changed.select("path")
        .unionByName(deleted.select("path"))
      val changedFiles = files.join(changed.select("path"), "path")
      val fresh = unitRows(spark, changedFiles)

      val merged =
        if (Fs.exists(s"$dir/units")) {
          val kept = units(spark, dir)
            .join(broadcast(affectedPaths.withColumnRenamed("path", "file")),
              Seq("file"), "left_anti")
          kept.unionByName(fresh.select(kept.columns.map(col).toIndexedSeq: _*))
        } else fresh
      Fs.rewrite(merged, s"$dir/units")

      // FTS over the unit embed text follows per-file: delete affected
      // unit postings (ids are stable — no renumber), add fresh ones
      val allUnits = units(spark, dir)
      if (Fs.exists(s"$dir/fts/fts.json")) {
        val oldAffected = ftsIndex(spark, dir).doclens
          .join(allUnits.select(col("unit_id").as("doc_id")), Seq("doc_id"), "left_anti")
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        val afterDelete =
          if (oldAffected.nonEmpty)
            FtsIndex.delete(ftsIndex(spark, dir), oldAffected, renumber = false)
          else ftsIndex(spark, dir)
        FtsIndex.updateRows(afterDelete,
          fresh.select(col("unit_id"), col("text")), "unit_id", "text")
      } else {
        FtsIndex.build(spark, allUnits.select(col("unit_id"), col("text")),
          "unit_id", "text", s"$dir/fts", "identifier_aware")
      }

      // layer-2 cross-file resolution: every unit's call list against
      // the full definition table (name equi-join + per-def aggregation)
      val all = units(spark, dir)
      val edges = all
        .select(col("name").as("caller"), explode(col("calls")).as("callee"))
        .filter(col("caller") =!= col("callee"))
      Fs.rewrite(
        all.select(col("unit_id"), col("name").as("callee"))
          .join(edges, "callee")
          .groupBy("unit_id")
          .agg(sort_array(collect_set("caller")).as("called_by")),
        s"$dir/called_by")

      Fs.rewrite(files.select(col("path"), xxhash64(col("source")).as("content_hash")),
        s"$dir/state")
    }
    SyncStats(nChanged, nDeleted, units(spark, dir).count())
  }
}
