package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Interleaved A/B for the q91 shape: re-split per branch (plain) vs
  * persisted split arrays feeding both branches (the q123 rule).
  */
object VocabOovShapeProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def finish(tok: DataFrame): DataFrame = {
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(1000)
        .select(col("token"), lit(1).as("_in"))
      tok.join(broadcast(vocab), Seq("token"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("_in").isNull, 1)).as("n_oov"))
        .orderBy("doc_id")
    }
    def plain(): Unit = {
      val tok = graft.Tables(spark, sfDir).documents
        .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("token"))
      finish(tok).collect()
    }
    def persisted(): Unit = {
      val base = graft.Tables(spark, sfDir).documents
        .select(col("doc_id"), split(trim(col("text")), " +").as("_toks"))
        .persist()
      try finish(base.select(col("doc_id"), explode(col("_toks")).as("token"))).collect()
      finally base.unpersist()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    time(plain _); time(persisted _)
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ => a += time(plain _); b += time(persisted _) }
    def stats(xs: Seq[Double]) = f"med=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f"
    println(s"VOCABOOV plain     ${stats(a.toSeq)}")
    println(s"VOCABOOV persisted ${stats(b.toSeq)}")
    spark.stop()
  }
}
