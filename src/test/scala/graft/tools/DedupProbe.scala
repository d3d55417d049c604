package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.expressions.TextSignatures

/** Scratch probe: stage-by-stage timings of the MinHash/SimHash dedup
  * pipelines (not part of the declared surface).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents

    def time(name: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    time("minhash signatures only") {
      docs.select(col("doc_id"),
        posexplode(TextSignatures.minhashBandsCol(spark)(col("text"), 5)).as(Seq("band", "bh")))
        .count()
    }
    val bands = docs.select(col("doc_id"),
      posexplode(TextSignatures.minhashBandsCol(spark)(col("text"), 5)).as(Seq("band", "bh")))
    val a = bands.select(col("doc_id").as("a"), col("band"), col("bh"))
    val b = bands.select(col("doc_id").as("b"), col("band"), col("bh"))
    time("minhash candidates (join+dedup)") {
      a.join(b, Seq("band", "bh")).filter(col("a") < col("b"))
        .select("a", "b").dropDuplicates("a", "b").count()
    }
    time("q41 full") {
      graft.operators.Dedup.minhashPairs(docs, "doc_id", 5, 0.5).count()
    }

    time("simhash signatures only") {
      graft.operators.Dedup.withSimhash(docs, "text").select("doc_id", "simhash").count()
    }
    val sigs = graft.operators.Dedup.withSimhash(docs, "text").select(col("doc_id"), col("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk", "cv")))
    val ca = chunks.select(col("doc_id").as("a"), col("simhash").as("siga"), col("chunk"), col("cv"))
    val cb = chunks.select(col("doc_id").as("b"), col("simhash").as("sigb"), col("chunk"), col("cv"))
    time("simhash candidates (join only)") {
      ca.join(cb, Seq("chunk", "cv")).filter(col("a") < col("b")).count()
    }
    time("simhash candidates (join+dedup)") {
      ca.join(cb, Seq("chunk", "cv")).filter(col("a") < col("b"))
        .dropDuplicates("a", "b").count()
    }
    time("q42 full") {
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
