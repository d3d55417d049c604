package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch probe: same-process interleaved A/B of the q53 df computation —
  * window over token partitions (needs a sort) vs a second hash agg plus a
  * same-partitioning shuffled-hash join (no sort, exchange reused).
  */
object TfidfJoinProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base(): (DataFrame, DataFrame) = {
      val docs = Tables(spark, sfDir).documents
      val tok = docs.select(col("doc_id"),
        explode(split(trim(col("text")), " +")).as("token"))
      val tf = tok.repartition(col("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).cast("double").as("_n"))
      (tf, n)
    }
    def finish(scored: DataFrame): DataFrame =
      scored.groupBy("doc_id")
        .agg(graft.expressions.ArgMaxText.argMaxTextCol(spark)(
          struct(col("score"), col("token"))).as("_top"))
        .select(col("doc_id"), col("_top.token").as("top_token"), col("_top.score").as("score"))

    def vWindow(): DataFrame = {
      val (tf, n) = base()
      finish(tf.crossJoin(broadcast(n))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
        .withColumn("score", round(col("tf") * log((col("_n") + 1.0) / (col("df") + 1.0)), 6)))
    }
    def vJoin(): DataFrame = {
      val (tf, n) = base()
      val dfTab = tf.groupBy("token").agg(count(lit(1)).as("df"))
      finish(tf.hint("shuffle_hash").join(dfTab.hint("shuffle_hash"), "token")
        .crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") * log((col("_n") + 1.0) / (col("df") + 1.0)), 6)))
    }

    val variants = Seq("window" -> (() => vWindow()), "join" -> (() => vJoin()))
    variants.foreach(_._2().collect()) // warm
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
      println(f"TFIDF $name%-8s med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    }
    println("JOIN PLAN:\n" + vJoin().queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
