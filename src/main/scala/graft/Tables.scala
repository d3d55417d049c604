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
  /** One DataFrame per (session, dir, table): `spark.read.parquet` builds a
    * fresh file index + schema read every call, a fixed per-query driver cost
    * that dominates sub-second queries. The logical plan is immutable, so
    * reusing it is free — and repeated queries share Catalyst plan fragments
    * (exchange reuse) instead of rebuilding them.
    */
  def table(name: String): DataFrame =
    Tables.cache.computeIfAbsent((System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

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

object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()
}
