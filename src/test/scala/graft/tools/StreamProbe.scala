package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.streaming.EventStreams

/** Scratch probe: per-config streaming replay timings (not part of the
  * declared surface; used to size the microbatch floor).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", EventStreams.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the FULL streaming-replay class (16 queries): EventStreams + the
    // DocPipeline replays
    val all = SparkEntry.freshQueries.filter(_._1.contains("_stream_"))
    val names = all.keys.toSeq.sorted

    def runAll(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      all(n)(spark, sfDir).collect()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap

    runAll() // warm codegen + staging

    // round-14 re-sweep (r13 verdict Missing #4): the staging fix changed
    // input layouts, so the knee (replay partitions) and the state-store
    // provider choice are re-measured on the current tree. min-of-2 per
    // (partitions, provider) arm; artifact STREAM_SWEEP_r14.json.
    val results = collection.mutable.Map[String, Map[String, Double]]()
    for (p <- Seq("1", "2", "4", "8", "16")) {
      spark.conf.set("spark.graft.stream.partitions", p)
      val a = runAll(); val b = runAll()
      val best = names.map(n => n -> math.min(a(n), b(n))).toMap
      results(s"hdfs_p$p") = best
      println(f"PROBE p=$p%-3s provider=hdfs total(min2)=${best.values.sum}%6.2f")
    }
    val knee = results.minBy(_._2.values.sum)._1.stripPrefix("hdfs_p")
    for (p <- Seq(knee)) {
      spark.conf.set("spark.graft.stream.partitions", p)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val a = runAll(); val b = runAll()
        val best = names.map(n => n -> math.min(a(n), b(n))).toMap
        results(s"rocksdb_p$p") = best
        println(f"PROBE p=$p%-3s provider=rocksdb total(min2)=${best.values.sum}%6.2f")
      } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val json = results.toSeq.sortBy(_._1).map { case (arm, m) =>
      s""""$arm":{${m.toSeq.sorted.map { case (n, v) => f""""$n":$v%.3f""" }.mkString(",")},"total":${f"${m.values.sum}%.3f"}}"""
    }.mkString("{", ",", s""","knee_partitions":$knee,"sf":"$sfDir","note":"round-14 re-sweep post staging fix; min-of-2 full-class replays per arm"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("STREAM_SWEEP_r14.json"),
      (json + "\n").getBytes)
    println(s"knee=$knee  -> STREAM_SWEEP_r14.json")
    spark.stop()
  }
}
