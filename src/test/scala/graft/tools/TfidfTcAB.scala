package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 14): q53 TF-source A/B in ONE window — the r13
  * token-major shuffle aggregate vs the native row-local
  * graft_token_counts explode. Full pipeline both arms (df window +
  * ArgMaxText + presentation), fresh plans per rep, interleaved.
  */
object TfidfTcAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Present.PresentationOrdering

    def finish(tf: DataFrame, docs: DataFrame): DataFrame = {
      val n = docs.agg(count(lit(1)).cast("double").as("_n"))
      val scored = tf
        .crossJoin(broadcast(n))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
        .withColumn("score", graft.functions.VectorFunctions.roundNative(
          col("tf") * log((col("_n") + 1.0) / (col("df") + 1.0)), 6))
      scored.groupBy("doc_id")
        .agg(graft.expressions.ArgMaxText.argMaxTextCol(spark)(
          struct(col("score"), col("token"))).as("_top"))
        .select(col("doc_id"), col("_top.token").as("top_token"), col("_top.score").as("score"))
        .presented("doc_id")
    }
    def docs() = graft.Tables(spark, dir).documents
    def oldShape() = {
      val d = docs()
      val tok = d.select(col("doc_id"), explode(split(trim(col("text")), " +")).as("token"))
      finish(tok.repartition(col("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")), d)
    }
    def newShape() = {
      val d = docs()
      finish(d.select(col("doc_id"),
          explode(graft.expressions.TextSignatures.tokenCountsCol(spark)(col("text"))).as("e"))
        .select(col("doc_id"), col("e.t").as("token"), col("e.c").cast("long").as("tf")), d)
    }
    def once(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    // third arm: df as an aggregate + AQE-decided join (broadcast at this
    // vocab, shuffle join at corpus vocab) — no window sort at all
    def joinShape() = {
      val d = docs()
      val tf = d.select(col("doc_id"),
          explode(graft.expressions.TextSignatures.tokenCountsCol(spark)(col("text"))).as("e"))
        .select(col("doc_id"), col("e.t").as("token"), col("e.c").cast("long").as("tf"))
      val n = d.agg(count(lit(1)).cast("double").as("_n"))
      val dfTab = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfTab, "token")
        .crossJoin(broadcast(n))
        .withColumn("score", graft.functions.VectorFunctions.roundNative(
          col("tf") * log((col("_n") + 1.0) / (col("df") + 1.0)), 6))
      scored.groupBy("doc_id")
        .agg(graft.expressions.ArgMaxText.argMaxTextCol(spark)(
          struct(col("score"), col("token"))).as("_top"))
        .select(col("doc_id"), col("_top.token").as("top_token"), col("_top.score").as("score"))
        .presented("doc_id")
    }
    once(oldShape _); once(newShape _); once(joinShape _)
    val os = collection.mutable.Buffer[Double]()
    val ns = collection.mutable.Buffer[Double]()
    val js = collection.mutable.Buffer[Double]()
    (1 to 5).foreach { _ => os += once(oldShape _); ns += once(newShape _); js += once(joinShape _) }
    println(f"TFIDFTC old(shuffle-agg tf) min=${os.min}%.3f med=${os.sorted.apply(2)}%.3f")
    println(f"TFIDFTC new(row-local tf)   min=${ns.min}%.3f med=${ns.sorted.apply(2)}%.3f")
    println(f"TFIDFTC join(df agg + AQE)  min=${js.min}%.3f med=${js.sorted.apply(2)}%.3f")
    spark.stop()
  }
}
