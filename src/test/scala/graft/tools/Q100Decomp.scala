package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Per-stage decomposition of q100_window_topk's sf1 wall (round 17,
  * VERDICT r16 Missing #2: the only weak entry whose committed verdict was
  * narrative, not arithmetic). Stages: (1) orders scan + 3-column project,
  * (2) + the o_custkey exchange and WindowGroupLimit top-3 rank filter —
  * the query's entire engine work, (3) the full query (adds presentation
  * ordering + the result fetch the bench pays by contract). Cumulative
  * plans drained through aggregates over derived columns (a bare count()
  * lets Catalyst prune the rank — the Q134Decomp lesson); interleaved
  * reps, medians. Writes Q100_DECOMP.json.
  */
object Q100Decomp {
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

    def proj = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    def ranked = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      proj.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    def full = SparkEntry.freshQueries("q100_window_topk")(spark, sfDir)

    def time(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }
    val nRows = full.count()
    val legs = Seq(
      "scan_project" -> (() =>
        proj.agg(sum(col("o_totalprice")), count(lit(1))).collect(): Unit),
      "plus_window_topk" -> (() =>
        ranked.agg(sum(col("rn")), count(lit(1))).collect(): Unit),
      "full_query" -> (() => full.collect(): Unit))
    val out = legs.map { case (n, f) => n -> time(f()) }
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps, \"result_rows\": $nRows,\n" +
      out.map { case (n, t) => f""" "$n%s": $t%.3f""" }.mkString(",\n") +
      ",\n \"note\": \"cumulative plans drained via aggregates over the " +
      "derived rank column, med-of-" + reps + "; full_query adds the " +
      "presentation ordering + result fetch. plus_window_topk minus " +
      "scan_project is the exchange + WindowGroupLimit rank - the only " +
      "engine work the 2.58x weak-entry ratio can measure\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q100_DECOMP.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.foreach { case (n, t) => println(f"Q100DECOMP $n%-20s $t%.3f s") }
    spark.stop()
  }
}
