package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch: replicates the driver's entry() smoke check (rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    spark.stop()
  }
}
