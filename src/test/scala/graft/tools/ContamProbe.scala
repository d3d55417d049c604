package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.Tables
import graft.operators.{Curation, TextAnalysis}

/** Scratch probe: same-process interleaved A/B of the contamination
  * formulations (explode+count_distinct vs per-doc array_distinct+count).
  * Interleaving cancels host noise; medians over reps.
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3
    def holdoutPred = col("doc_id") % 37 === 0

    def vDistinctAgg(): DataFrame = {
      val docs = Tables(spark, sfDir).documents
      val minTok = TextAnalysis.wsTokenCount(col("text")) >= n
      val trainGrams = docs.filter(!holdoutPred).filter(minTok)
        .select(col("doc_id"), explode(Curation.wordNgrams("text", n)).as("gram"))
      val holdGrams = docs.filter(holdoutPred).filter(minTok)
        .select(explode(Curation.wordNgrams("text", n)).as("gram")).distinct()
      trainGrams.join(broadcast(holdGrams), "gram")
        .groupBy("doc_id")
        .agg(count_distinct(col("gram")).as("shared_grams"))
    }
    def vPreDistinct(): DataFrame = {
      val docs = Tables(spark, sfDir).documents
      Curation.contamination(docs.filter(!holdoutPred), docs.filter(holdoutPred),
        "doc_id", "text", n)
    }

    val variants = Seq("distinct_agg" -> (() => vDistinctAgg()),
                       "pre_distinct" -> (() => vPreDistinct()))
    // warm both
    variants.foreach(_._2().collect())
    val times = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().collect()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"CONTAM $name%-14s med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
