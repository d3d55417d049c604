package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch A/B (r20): any caller-conf knob the replay machinery reads
  * through, alternated within one window over named streaming queries.
  * Args: <confKey> <valA,valB> [reps] [substring filters...].
  */
object StreamConfAB {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val vals = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(7)
    val filters = if (args.length > 3) args.drop(3).toSeq else Seq("q98")
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
    for (v <- vals; (n, fn) <- qs) { // warmup each arm
      spark.conf.set(key, v)
      fn(spark, sfDir).collect()
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; v <- vals; (n, fn) <- qs) {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      acc((n, v)) = (System.nanoTime() - t0) / 1e9 :: acc((n, v))
    }
    for (((n, v), ts0) <- acc.toSeq.sortBy(t => (t._1._1, t._1._2))) {
      val ts = ts0.sorted
      println(f"CONFAB $n $key=$v med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
