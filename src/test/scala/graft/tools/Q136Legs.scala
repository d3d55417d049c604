package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.{Cleaning, Dedup, TextAnalysis}

/** Scratch probe (r19): leg decomposition of q136_pipeline_curate — where
  * does the ~1.5 s wall go?
  *   scrub-pass : one full corpus pass of plantPII+langid+scrub+stats+score
  *                (noop-sink collect of the scored frame)
  *   pairs      : bounded (doc_id <= Pipeline.PairBound) n-gram pair generation, collected
  *   clusters   : duplicateClusters' eager pointer-jump loop over the pairs
  *   full       : the declared query end-to-end (presented + collect)
  * Args: [reps].
  */
object Q136Legs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val docs = graft.Tables(spark, sfDir).documents
      val aug = docs.select(col("doc_id"),
        Cleaning.plantPiiCol("doc_id", "text").as("text"))
      val (lang, _) = TextAnalysis.langId(col("text"))
      val en = aug.withColumn("pred_lang", lang)
        .filter(col("pred_lang") === "en").select("doc_id", "text")
      val scrub = Cleaning.piiScrub(en, "doc_id", "text")
        .select(col("doc_id"),
          (col("n_emails") + col("n_ips") + col("n_phones")).as("n_pii"),
          col("clean_text"))
      val st = graft.expressions.TextStats.statsCol(spark)(col("clean_text"))
      val scored = scrub.withColumn("q",
        TextAnalysis.qualityScoreFromStats(st))
      val tScrub = t {
        scored.write.format("noop").mode("overwrite").save()
      }
      val pairSrc = scrub.filter(col("doc_id") <= graft.operators.Pipeline.PairBound)
        .select(col("doc_id"), col("clean_text").as("text"))
      var pairs: org.apache.spark.sql.DataFrame = null
      val tPairs = t {
        pairs = Dedup.ngramJaccardPairs(pairSrc, "doc_id", 3)
          .filter(col("jaccard") >= 0.1).localCheckpoint(true)
      }
      val tClusters = t {
        Dedup.duplicateClusters(pairs).collect()
      }
      val tFull = t {
        SparkEntry.freshQueries("q136_pipeline_curate")(spark, sfDir).collect()
      }
      println(f"Q136LEGS rep=$i scrub=$tScrub%.3f pairs=$tPairs%.3f " +
        f"clusters=$tClusters%.3f full=$tFull%.3f")
    }
    spark.stop()
  }
}
