package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 12): where does q129's 16M-candidate scoring wall
  * go — the dot itself, the per-pair `round(_, 6)` (Spark's double round is
  * a BigDecimal round-trip per row), or the join/aggregate machinery?
  * Times the identical expanded candidate stream with each projection.
  */
object RoundCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dot = graft.functions.VectorFunctions.dotNative(spark) _
    val nrm = graft.functions.VectorFunctions.normNative(spark)(_)
    val emb = graft.Tables(spark, dir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("c_id"), (col("vec_id") % 16).as("cell"),
        col("embedding").as("nv"), nrm(col("embedding")).as("nn"))
      .localCheckpoint(true)
    val probes = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q_id"), explode(sequence(lit(0L), lit(3L))).as("pn"),
        col("embedding").as("qv"), nrm(col("embedding")).as("qn"))
      .withColumn("cell", (col("q_id") + col("pn")) % 16).drop("pn")
      .localCheckpoint(true)
    println(s"corpus=${corpus.count()} probes=${probes.count()}")
    val joined = probes.join(corpus, "cell").filter(col("q_id") =!= col("c_id"))
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ROUNDPROBE $name%-28s min=${runs.min}%.3f med=${runs.sorted.apply(1)}%.3f")
    }
    t("pairs_only")(joined.select(col("q_id"), col("c_id")))
    t("dot_raw")(joined.select(col("q_id"), col("c_id"),
      (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("sim")))
    t("dot_round6")(joined.select(col("q_id"), col("c_id"),
      round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("sim")))
    spark.stop()
  }
}
