package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 13): where do q100/q103's 2.5 s at sf1 go — the
  * window shuffle+sort, the presentation range sort, or the 450k-row driver
  * collect? Times each suffix of the pipeline, interleaved reps.
  */
object TopKShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables(spark, dir).orders
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def topk = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    import graft.Present._
    def t(name: String)(work: => Unit): Unit = {
      work
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"TOPKPROBE $name%-24s min=${xs.min}%.3f med=${xs.sorted.apply(2)}%.3f")
    }
    t("window_noop")(topk.write.mode("overwrite").format("noop").save())
    t("window_collect")(topk.collect())
    t("presented_collect")(topk.presented("o_custkey", "rn").collect())
    t("noop_aqe_off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try topk.write.mode("overwrite").format("noop").save()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    t("noop_advisory8m") {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      try topk.write.mode("overwrite").format("noop").save()
      finally spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    }
    val rows = topk.count()
    println(s"TOPKPROBE rows=$rows")
    println(topk.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
