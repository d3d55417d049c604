package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch A/B (r20): shared-source stream self-join (q73/q80) vs the old
  * two-independent-sources shape, alternated within ONE window so host
  * phase noise hits both arms. Args: [reps-per-arm] [substring filters...].
  */
object StreamSourceAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val filters = if (args.length > 1) args.drop(1).toSeq else Seq("q73", "q80")
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
    // one warmup each arm
    for (two <- Seq("false", "true"); (n, fn) <- qs) {
      spark.conf.set("spark.graft.stream.twoSourceJoin", two)
      fn(spark, sfDir).collect()
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; two <- Seq("true", "false"); (n, fn) <- qs) {
      spark.conf.set("spark.graft.stream.twoSourceJoin", two)
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      acc((n, two)) = dt :: acc((n, two))
    }
    for (((n, two), ts0) <- acc.toSeq.sortBy(t => (t._1._1, t._1._2))) {
      val ts = ts0.sorted
      println(f"SRCAB $n twoSource=$two med=${ts(ts.size / 2)}%.3f " +
        f"min=${ts.head}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
