package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: median-of-N per-query latency in the BENCH's measurement
  * mode (fresh plan + collect per rep) — medians over more reps than the
  * bench's min-of-3 make optimization deltas trustworthy on a noisy host.
  * Args: [reps] [substring filters...].
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val filters = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        // match the bench posture (r20): probe deltas must track bench deltas
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.sql.warehouse.dir",
          sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
            graft.StageDir.scratchBase + "/graft_warehouse"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.freshQueries.keys.toSeq.sorted
      .filter(n => filters.isEmpty || filters.exists(n.contains))
    val all = names.map { n =>
      val fn = SparkEntry.freshQueries(n)
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // drop warmup
      val med = ts(ts.size / 2)
      println(f"QPROBE $n%-32s med=$med%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
      n -> med
    }
    println(f"QPROBE-TOTAL median-sum=${all.map(_._2).sum}%.2f over ${all.size} queries")
    spark.stop()
  }
}
