package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: jobs + tasks per query — the scheduling floor multiplier. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(); val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q03_project", "q05_join_inner", "q07_join_outer", "q19_window_frame",
      "q37_asof_join", "q53_text_tfidf", "q39_correlated_subquery", "q24_string_fns")
    names.foreach { n =>
      val fn = SparkEntry.freshQueries(n)
      fn(spark, sfDir).collect() // warm
      Thread.sleep(200); jobs.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"JOBS $n%-28s ${dt}%.3f s  jobs=${jobs.get()} tasks=${tasks.get()}")
    }
    spark.stop()
  }
}
