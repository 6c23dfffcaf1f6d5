package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** The generator has written `events.ts` as either int64 nanos (older
    * rounds; Spark's parquet reader rejects nano timestamps with
    * [PARQUET_TYPE_ILLEGAL], hence `nanosAsLong`) or as `timestamp[us]`
    * (current testdata). Branch on the read schema and normalize to the
    * same two columns either way: `ts` TIMESTAMP (UTC) + `ts_ns` BIGINT
    * (epoch nanos, matching DuckDB's `epoch_ns(ts)`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          // integer division: `/` would promote the ~1.7e18 nanos to double
          // (2^53-exact range exceeded) and can shift a row across an hour
          // bucket boundary vs the oracle's exact arithmetic
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType =>
        // pyarrow writes tz-naive micros; session TZ is pinned to UTC, so
        // the cast reinterprets the wall-clock as UTC — same instants the
        // oracle sees
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
}
