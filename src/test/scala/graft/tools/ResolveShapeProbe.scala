package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.{Dedup, TextAnalysis}

/** Scratch probe (round 13): resolveDuplicates' scoring scope A/B — score
  * the whole corpus (r12 shape) vs semi-join the docs to the clustered key
  * set first. Interleaved reps, same rows asserted.
  */
object ResolveShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir).documents
    def pairs = Dedup.ngramJaccardPairs(
      docs.filter(col("doc_id") <= 40), "doc_id", 3).filter(col("jaccard") >= 0.1)
    def fullScore() = {
      val clusters = Dedup.duplicateClusters(pairs)
        .select(col("doc_id"), col("canonical").as("cluster"))
      val st = graft.expressions.TextStats.statsCol(spark)(col("text"))
      val scored = docs.withColumn("_st", st)
        .select(col("doc_id"),
          TextAnalysis.qualityScoreFromStats(col("_st")).as("quality_score"))
      val w = Window.partitionBy("cluster").orderBy(col("quality_score").desc, col("doc_id"))
      clusters.join(scored, Seq("doc_id"))
        .withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster"), col("quality_score"), col("keep"))
    }
    def semiScore() = Dedup.resolveDuplicates(docs, pairs, "doc_id", "text")
    def once(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    require(fullScore().orderBy("doc_id").collect().toSeq ==
      semiScore().orderBy("doc_id").collect().toSeq, "rows differ")
    once(fullScore _); once(semiScore _)
    val (fs, ss) = (1 to 5).map(_ => (once(fullScore _), once(semiScore _))).unzip
    println(f"RESOLVE full min=${fs.min}%.3f med=${fs.sorted.apply(2)}%.3f")
    println(f"RESOLVE semi min=${ss.min}%.3f med=${ss.sorted.apply(2)}%.3f")
    spark.stop()
  }
}
