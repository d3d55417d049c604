package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Dedup

/** Scratch probe (r19): leg decomposition of q114 — the suite's most
  * expensive batch query (2.6–4.3 s at sf0.1). Times each stage of
  * [[Dedup.incrementalGateOverPersistedArtifacts]] separately so the
  * optimization targets the dominant leg:
  *   bands-write : corpus minhash banding + bucketed/sorted saveAsTable
  *   texts-write : corpus text projection saveAsTable
  *   gate        : bucketed-read band join + cap + verify (the deployment
  *                 submetric)
  *   append      : increment banding + two bucketed appends
  * Args: [reps].
  */
object Q114Legs {
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
    val docs = graft.Tables(spark, sfDir).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val tag = "q114legs"
    val (bandsTbl, textsTbl) = Dedup.incrementalArtifactNames(tag)
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      Seq(bandsTbl, textsTbl).foreach(graft.StageDir.dropManagedTable(spark, _))
      val tBands = t {
        Dedup.minhashBandTable(corpus, "doc_id", 5).withColumnRenamed("doc_id", "old_id")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "band", "bh").sortBy("band", "bh").saveAsTable(bandsTbl)
      }
      val tTexts = t {
        corpus.select(col("doc_id").as("old_id"), col("text").as("ta"))
          .write.mode("overwrite").format("parquet").saveAsTable(textsTbl)
      }
      val tGate = t {
        Dedup.incrementalMinhashMatchesPrebanded(
          spark.table(bandsTbl), spark.table(textsTbl), incoming, "doc_id", 5, 0.5)
          .localCheckpoint(true)
      }
      val tAppend = t {
        Dedup.minhashBandTable(incoming, "doc_id", 5).withColumnRenamed("doc_id", "old_id")
          .write.mode("append").format("parquet")
          .bucketBy(8, "band", "bh").sortBy("band", "bh").saveAsTable(bandsTbl)
        incoming.select(col("doc_id").as("old_id"), col("text").as("ta"))
          .write.mode("append").format("parquet").saveAsTable(textsTbl)
      }
      println(f"Q114LEGS rep=$i bands=$tBands%.3f texts=$tTexts%.3f gate=$tGate%.3f append=$tAppend%.3f total=${tBands + tTexts + tGate + tAppend}%.3f")
    }
    Seq(bandsTbl, textsTbl).foreach(graft.StageDir.dropManagedTable(spark, _))
    spark.stop()
  }
}
