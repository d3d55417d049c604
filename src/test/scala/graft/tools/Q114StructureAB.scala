package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Dedup

/** Scratch A/B (r19): q114's OLD serial artifact orchestration (serial
  * bands→texts writes, increment banded twice) vs the SHIPPED restructure
  * (concurrent independent writes, increment banded once) — both arms in
  * one JVM, alternating, min-of-N per arm so the comparison shares one
  * interference window. Results asserted identical between arms.
  */
object Q114StructureAB {
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

    // OLD arm: the exact pre-r19 body (serial writes, increment banded in
    // the candidate join and again for the append)
    def oldArm(): Long = {
      val tag = "abold"
      val (bandsTbl, textsTbl) = Dedup.incrementalArtifactNames(tag)
      Seq(bandsTbl, textsTbl).foreach(graft.StageDir.dropManagedTable(spark, _))
      Dedup.minhashBandTable(corpus, "doc_id", 5).withColumnRenamed("doc_id", "old_id")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "band", "bh").sortBy("band", "bh").saveAsTable(bandsTbl)
      corpus.select(col("doc_id").as("old_id"), col("text").as("ta"))
        .write.mode("overwrite").format("parquet").saveAsTable(textsTbl)
      val out = Dedup.incrementalMinhashMatchesPrebanded(
        spark.table(bandsTbl), spark.table(textsTbl), incoming, "doc_id", 5, 0.5)
        .localCheckpoint(true)
      Dedup.minhashBandTable(incoming, "doc_id", 5).withColumnRenamed("doc_id", "old_id")
        .write.mode("append").format("parquet")
        .bucketBy(8, "band", "bh").sortBy("band", "bh").saveAsTable(bandsTbl)
      incoming.select(col("doc_id").as("old_id"), col("text").as("ta"))
        .write.mode("append").format("parquet").saveAsTable(textsTbl)
      out.count()
    }

    // NEW arm: the shipped method
    def newArm(): Long =
      Dedup.incrementalGateOverPersistedArtifacts(spark, corpus, incoming,
        "doc_id", "abnew", k = 5, jaccardThreshold = 0.5).count()

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    oldArm(); newArm() // warm
    val olds = collection.mutable.Buffer[Double]()
    val news = collection.mutable.Buffer[Double]()
    (1 to reps).foreach { i =>
      val (to, no) = t(oldArm())
      val (tn, nn) = t(newArm())
      require(no == nn, s"arm results diverge: old=$no new=$nn")
      olds += to; news += tn
      println(f"Q114AB rep=$i old=$to%.3f new=$tn%.3f rows=$no")
    }
    println(f"Q114AB-SUMMARY old_min=${olds.min}%.3f old_med=${olds.sorted.apply(reps / 2)}%.3f " +
      f"new_min=${news.min}%.3f new_med=${news.sorted.apply(reps / 2)}%.3f")
    spark.stop()
  }
}
