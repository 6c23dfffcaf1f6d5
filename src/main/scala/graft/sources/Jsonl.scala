package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) ingestion — the dump format web-scale
  * text corpora actually arrive in (Common Crawl derivatives, API
  * exports). The production concerns this wraps:
  *
  *   - **Schema-on-read, declared not inferred**: inference is a full
  *     extra pass over 100 TB and silently widens types on dirty data;
  *     production readers pass the schema.
  *   - **Corrupt-record capture**: a malformed line must become a ROW
  *     (with the raw text in a quarantine column), never a job
  *     failure — at billions of lines there is always a malformed
  *     line. Spark's PERMISSIVE mode + columnNameOfCorruptRecord is
  *     exactly this; we pin the contract here.
  *   - **Splittability**: uncompressed/zstd JSONL splits by line, so
  *     read parallelism is file-size-shaped like parquet; the reader
  *     itself is the standard DataSource scan (predicate pushdown on
  *     the corrupt column aside, JSON scans are CPU-bound — convert to
  *     parquet once, query many times; [[toParquet]] is that step).
  */
object Jsonl {

  /** Read JSONL at `path` with the declared `schema`; malformed lines
    * surface as rows with every data column NULL and the raw line in
    * `_corrupt`.
    *
    * Spark contract pin: a query that references ONLY `_corrupt` from
    * the raw scan is rejected ([UNSUPPORTED_FEATURE.
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN]) — always project at least one
    * data column alongside it (as [[ingestSummary]] does), or persist
    * the parsed frame first. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The ingest-side summary every dump pipeline runs first: per
    * `groupCol` (NULL = the corrupt-quarantine bucket), row count,
    * corrupt count, and an order-invariant XOR fingerprint of the
    * parsed rows (`fpCols`, NULL-explicit md5 recipe) for
    * reconciliation against the upstream system. */
  def ingestSummary(
      parsed: DataFrame, groupCol: String, fpCols: Seq[String]): DataFrame = {
    val rowHash =
      s"""CAST(conv(substr(md5(concat_ws('#', ${fpCols.map(c =>
        s"coalesce(CAST(`$c` AS STRING), '<null>')").mkString(", ")})),
         | 1, 15), 16, 10) AS BIGINT)""".stripMargin.replaceAll("\n", "")
    parsed.groupBy(groupCol).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
      expr(s"bit_xor(CASE WHEN _corrupt IS NULL THEN $rowHash ELSE 0L END)")
        .as("fingerprint"))
  }

  /** One-time conversion of a JSONL drop to parquet (drops the
    * quarantine column after the caller has inspected it) — JSON scans
    * re-parse text every query; at 100 TB you pay that once. */
  def toParquet(parsed: DataFrame, path: String): Unit =
    parsed.filter(col("_corrupt").isNull).drop("_corrupt")
      .write.mode("overwrite").parquet(path)
}
