package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loads the synthetic star-schema fixture tables (TESTDATA.md) from a
  * scale-factor directory and canonicalizes engine-specific wrinkles.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so every downstream query composes with
  * `PushedFilters`/`ReadSchema` intact. On a real cluster the same paths are
  * directories of many files; nothing here assumes a single file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** `events` with event time canonicalized to epoch **microseconds**
    * (`ts_us` BIGINT). The fixture stores nanosecond timestamps, and engines
    * disagree on nanos (DuckDB truncates to µs on read; Spark needs
    * `spark.sql.legacy.parquet.nanosAsLong`), so µs-since-epoch is the
    * portable event-time representation. Works whatever type Spark read:
    * long nanos, timestamp, or timestamp_ntz.
    */
  def eventsUs: DataFrame = {
    val raw = table("events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType          => expr("ts div 1000")
      case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
      case _                 => unix_micros(col("ts"))
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }
}
