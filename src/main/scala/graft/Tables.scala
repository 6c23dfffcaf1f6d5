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
      // integer division: `/` would promote the ~1.7e18 nanos to double
      // (2^53-exact range exceeded) and can shift a row across an hour
      // bucket boundary vs the oracle's exact arithmetic
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
