package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Present.PresentationOrdering
import graft.SparkEntry

/** Scratch probe (round 12): q08/q09 semi/anti-join shapes at the sf1 point.
  *
  * The committed shape joins customer against RAW orders keys; the planner
  * broadcasts the 1.5M-row fact-side key column and builds the hashed
  * relation single-threaded on the driver. Candidate shapes:
  *   raw        — committed baseline
  *   distinct   — pre-aggregate orders to DISTINCT custkeys first (the
  *                build side shrinks to customer cardinality; the distinct
  *                itself is a distributed partial aggregate)
  *   dist_hash  — distinct + shuffle_hash hint (no broadcast: the
  *                always-scalable posture)
  * Median-of-N fresh-plan collect, the bench discipline.
  */
object SemiJoinProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cust = graft.Tables(spark, sfDir).customer
    def ords = graft.Tables(spark, sfDir).orders

    val variants: Seq[(String, String => DataFrame)] = Seq(
      "raw" -> ((jt: String) =>
        cust.join(ords, col("c_custkey") === col("o_custkey"), jt)
          .select("c_custkey").presented("c_custkey")),
      "distinct" -> ((jt: String) =>
        cust.join(ords.select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), jt)
          .select("c_custkey").presented("c_custkey")),
      "dist_hash" -> ((jt: String) =>
        cust.join(ords.select(col("o_custkey")).distinct().hint("shuffle_hash"),
            col("c_custkey") === col("o_custkey"), jt)
          .select("c_custkey").presented("c_custkey")))

    for (jt <- Seq("left_semi", "left_anti"); (vn, fn) <- variants) {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime()
        fn(jt).collect()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"SEMIPROBE $jt%-10s $vn%-10s med=${ts(ts.size / 2)}%.3f " +
        f"min=${ts.head}%.3f max=${ts.last}%.3f")
    }
    spark.stop()
  }
}
