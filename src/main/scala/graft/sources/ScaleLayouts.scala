package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layouts that make the reference's conventions scale (SURVEY §1.4):
  *
  *  - '''Snapshot partitioning''': the reference's dated folders become a
  *    `snapshot_date` partition column, so "latest version" resolution
  *    (gcpl.py:93-96) is a partition-pruned scan — the query touches only
  *    the newest partition's files, never the history.
  *  - '''Bucketed co-location''': fact tables bucketed and sorted by their
  *    join key join with zero exchange — at 100 TB the shuffle IS the cost,
  *    and bucketing moves it to write time, amortized over every later join.
  */
object ScaleLayouts {
  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Appends one dated snapshot of `df` under `root`. */
  def writeSnapshot(df: DataFrame, root: String, date: LocalDate): Unit =
    df.withColumn("snapshot_date", lit(date.format(fmt)))
      .write.partitionBy("snapshot_date").mode(SaveMode.Append).parquet(root)

  /** Latest snapshot via partition pruning: the date comes from a bounded
    * filesystem listing of partition directories (metadata, not data), and
    * the filter on the partition column prunes every older snapshot out of
    * the scan — check `df.inputFiles`.
    */
  def readLatestSnapshot(spark: SparkSession, root: String): DataFrame = {
    val all = spark.read.parquet(root)
    val dates = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snapshot_date="))
      .map(_.getName.stripPrefix("snapshot_date="))
    val latest = StatlineLayout.latestFolder(dates.toIndexedSeq)
      .getOrElse(throw new NoSuchElementException(s"no snapshots under $root"))
    all.filter(col("snapshot_date") === latest)
  }

  /** Writes `df` bucketed+sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Joins two same-bucketed tables on their bucket key — planned with no
    * shuffle exchange on either side.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
}
