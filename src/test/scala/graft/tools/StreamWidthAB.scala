package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch sweep (r20): replay shuffle width (state-store partition count,
  * `spark.graft.stream.partitions`) re-measured per heavy replay on the
  * current tree — the r14 global knee (p4, STREAM_SWEEP_r14.json) predates
  * three rounds of machinery changes. Arms alternate within one window.
  * Args: [reps-per-arm] [widths csv] [substring filters...].
  */
object StreamWidthAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val widths = args.lift(1).getOrElse("2,4,8").split(",").toSeq
    val filters = if (args.length > 2) args.drop(2).toSeq
      else Seq("q62", "q73", "q80", "q125", "q130", "q70")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.sql.warehouse.dir",
          sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
            graft.StageDir.scratchBase + "/graft_warehouse"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.freshQueries.filter { case (n, _) =>
      n.contains("_stream_") && filters.exists(n.contains)
    }.toSeq.sortBy(_._1)
    for (w <- widths; (n, fn) <- qs) { // warmup each arm
      spark.conf.set("spark.graft.stream.partitions", w)
      fn(spark, sfDir).collect()
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; w <- widths; (n, fn) <- qs) {
      spark.conf.set("spark.graft.stream.partitions", w)
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      acc((n, w)) = (System.nanoTime() - t0) / 1e9 :: acc((n, w))
    }
    for (((n, w), ts0) <- acc.toSeq.sortBy(t => (t._1._1, t._1._2.toInt))) {
      val ts = ts0.sorted
      println(f"WIDTHAB $n p=$w med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
