package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 13): decompose q85's wall — pair source vs edge
  * checkpoint vs the label-propagation loop — and count the Spark JOBS each
  * phase schedules (the loop's cost at tiny pair volume IS the per-job
  * scheduling floor times the job count).
  */
object ClusterRoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    val docs = graft.Tables(spark, dir).documents.filter(col("doc_id") <= 40)
    def phase(name: String)(work: => Unit): Unit = {
      work // warm
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime()
      work
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"CLUSTERPROBE $name%-22s ${dt}%.3f s  jobs=${jobs.get()}")
    }
    val pairs = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", 3).filter(col("jaccard") >= 0.1)
    phase("pair_source")(pairs.collect())
    phase("pairs_checkpointed") {
      val p = pairs.localCheckpoint(true)
      graft.operators.Dedup.duplicateClusters(p).collect()
    }
    phase("full_q85") {
      graft.operators.Dedup.duplicateClusters(pairs).collect()
    }
    phase("full_q85_aqe_off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try graft.operators.Dedup.duplicateClusters(pairs).collect()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    phase("full_q85_aqe_off_bc_off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try graft.operators.Dedup.duplicateClusters(pairs).collect()
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    }
    spark.stop()
  }
}
