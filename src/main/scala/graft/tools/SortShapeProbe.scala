package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.expressions.TextStats

/** Scratch probe: project-then-sort vs sort-then-project — the range
  * partitioner samples its child, re-executing heavy projections.
  */
object SortShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def med(name: String, reps: Int = 7)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SORTSHAPE $name%-44s med=${ts(ts.size / 2)}%.4f min=${ts.head}%.4f")
    }

    def projThenSort = t.documents
      .select(col("doc_id"), TextStats.fingerprintCol(spark)(col("text")).as("fp"))
      .orderBy("doc_id")
    def sortThenProj = t.documents
      .select("doc_id", "text").orderBy("doc_id")
      .select(col("doc_id"), TextStats.fingerprintCol(spark)(col("text")).as("fp"))

    med("project-then-orderBy (current)") { projThenSort.collect() }
    med("orderBy-then-project") { sortThenProj.collect() }
    println(sortThenProj.queryExecution.executedPlan.toString.linesIterator
      .take(12).mkString("\n"))
    spark.stop()
  }
}
