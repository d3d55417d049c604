package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe (r19): per-phase breakdown of the streaming replays via
  * the engine's own StreamingQueryProgress (`durationMs`: addBatch /
  * getBatch / latestOffset / queryPlanning / walCommit / commitOffsets /
  * triggerExecution), surfaced through the `spark.graft.stream.debugProgress`
  * hook. Answers "where does a ~1–2 s bounded replay actually spend its
  * wall" so optimization attacks the dominant phase instead of guessing.
  * Args: [reps] [substring filters...] (defaults: 3, the heavy replays).
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val filters =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q80", "q98", "q73", "q125", "q130", "q70", "q83", "q62")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        // match the bench posture (r20): q83/q98/q137 write warehouse artifacts
        .config("spark.sql.warehouse.dir",
          sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
            graft.StageDir.scratchBase + "/graft_warehouse"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.stream.debugProgress", "true")
    spark.conf.set("spark.graft.stream.debugPhases", "true")
    val qs = SparkEntry.freshQueries.filter { case (n, _) =>
      n.contains("_stream_") && filters.exists(n.contains)
    }
    qs.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuilt = System.nanoTime()
        df.collect()
        val t1 = System.nanoTime()
        println(f"PHASEPROBE $n rep=$i wall=${(t1 - t0) / 1e9}%.3f " +
          f"build=${(tBuilt - t0) / 1e9}%.3f collect=${(t1 - tBuilt) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
