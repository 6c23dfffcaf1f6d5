package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables. */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events.ts` is written with nanosecond precision, which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert
    * to a microsecond timestamp (UTC), keeping the raw nanos in `ts_ns`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000).cast("long")))
  }
}
