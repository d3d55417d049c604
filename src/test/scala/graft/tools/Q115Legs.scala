package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Cumulative leg timing of q115's containment pipeline (r15 bottleneck
  * hunt after the posting-cap swap measured wall-neutral): each leg drains
  * through an aggregate that forces its stage's real work. Prints only —
  * a scratch probe; the committed artifact for q115 decisions is
  * Q115_POSTINGS_AB.json / ContainGramAB.
  */
object Q115Legs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.CollectSmallestK.register(spark)
    val n = 3

    def fresh() = {
      val docs = graft.Tables(spark, sfDir).documents
      docs.filter(graft.operators.TextAnalysis.wsTokenCount(col("text")) >= n)
        .select(col("doc_id"),
          graft.expressions.TextSignatures.wordNgramsCol(spark)(
            col("text"), n, distinct = true).as("g"))
    }
    def time(name: String)(f: => Any): Unit = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"Q115LEG $name%-28s med ${ts(ts.size / 2)}%.3f s")
    }
    time("gram_build")(fresh().agg(sum(size(col("g")))).collect())
    time("explode_count")(fresh().select(col("doc_id"), explode(col("g")).as("sh"))
      .agg(count(lit(1)), sum(length(col("sh")))).collect())
    time("dfreq")(fresh().select(explode(col("g")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(sum(col("df"))).collect())
    time("withDf_join") {
      val g = fresh()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      ex.join(dfreq, "sh").agg(sum(col("df"))).collect()
    }
    time("rare_window") {
      val g = fresh()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      ex.join(dfreq, "sh")
        .withColumn("_rr", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        .filter(col("_rr") <= 4)
        .agg(count(lit(1))).collect()
    }
    time("postings_agg") {
      val g = fresh()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      ex.join(dfreq, "sh")
        .groupBy("sh").agg(expr("graft_smallest_k(doc_id, 1024)").as("_bs"))
        .agg(sum(size(col("_bs")))).collect()
    }
    time("full_q115")(SparkEntry.freshQueries("q115_dedup_containment")(spark, sfDir).collect())
    spark.stop()
  }
}
