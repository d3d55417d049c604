package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 14): q115 gram-source A/B in ONE window — composed
  * split+transform/slice/concat_ws+array_distinct vs the native
  * graft_word_ngrams — through the FULL containmentPairs pipeline is not
  * needed: only the persisted gram projection differs, so time that
  * projection's materialization (count over the persisted frame, fresh
  * persist per rep), interleaved.
  */
object ContainGramAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir).documents
    val n = 3
    val base = docs.filter(graft.operators.TextAnalysis.wsTokenCount(col("text")) >= n)

    def composed() = base
      .select(col("doc_id"), split(trim(col("text")), " +").as("_toks"))
      .select(col("doc_id"),
        array_distinct(graft.operators.Curation.wordNgramsOfTokens(col("_toks"), n)).as("g"))
    def native() = base
      .select(col("doc_id"),
        graft.expressions.TextSignatures.wordNgramsCol(spark)(
          col("text"), n, distinct = true).as("g"))

    def once(f: () => org.apache.spark.sql.DataFrame): Double = {
      val d = f().persist()
      val t0 = System.nanoTime()
      d.select(count(lit(1))).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      d.unpersist(true)
      dt
    }
    once(composed _); once(native _)
    val cs = collection.mutable.Buffer[Double]()
    val ns = collection.mutable.Buffer[Double]()
    (1 to 5).foreach { _ => cs += once(composed _); ns += once(native _) }
    println(f"CONTAINGRAM composed min=${cs.min}%.3f med=${cs.sorted.apply(2)}%.3f")
    println(f"CONTAINGRAM native   min=${ns.min}%.3f med=${ns.sorted.apply(2)}%.3f")
    spark.stop()
  }
}
