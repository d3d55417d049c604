package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: actual scan partition counts of staged tables. */
object ScanPartsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, "/root/testdata/sf0.1")
    Seq("lineitem", "orders", "events", "documents", "embeddings", "customer")
      .foreach { n =>
        val df = t.table(n)
        println(f"SCANPARTS $n%-12s rddParts=${df.rdd.getNumPartitions}")
      }
    spark.stop()
  }
}
