package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch probe: stage timings of the TF-IDF pipeline (q53). */
object TfidfProbe {
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

    val tok = docs.select(col("doc_id"),
      explode(split(trim(col("text")), " +")).as("token"))
    time("tokenize+count") { tok.count() }
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    time("tf agg") { tf.count() }
    time("tf + df window") {
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token"))).count()
    }
    val n = docs.count()
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .withColumn("score", round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    time("scored + top-1 window") {
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    time("q53 full (with orderBy)") {
      SparkEntry.queries("q53_text_tfidf")(spark, sfDir).count()
    }
    // alternative: aggregate top-1 via max_by struct instead of a rank window
    time("alt: max_by top-1") {
      scored.groupBy("doc_id")
        .agg(max_by(struct(col("token")), struct(col("score"), col("token"))).as("t"))
        .count()
    }
    spark.stop()
  }
}
