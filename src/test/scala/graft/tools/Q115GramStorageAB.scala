package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch A/B (r19): q115's gram-table reuse mechanism — the committed
  * MEMORY_AND_DISK persist (Q115_PERSIST_AB.json, r16) vs an eager
  * localCheckpoint (the mechanism that won the candidate-input A/B,
  * Q124_CANDCACHE_AB.json) vs no reuse. Honest protocol: cache cleared
  * after every run, row counts asserted equal. Args: [reps].
  */
object Q115GramStorageAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.freshQueries("q115_dedup_containment")
    def run(mode: String): (Double, Int) = {
      spark.conf.set("spark.graft.containmentGramStorage", mode)
      try {
        val t0 = System.nanoTime()
        val r = fn(spark, sfDir).collect()
        ((System.nanoTime() - t0) / 1e9, r.length)
      } finally {
        spark.conf.unset("spark.graft.containmentGramStorage")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    val modes = Seq("NONE", "MEMORY_AND_DISK", "LOCALCKPT")
    modes.foreach(run) // warm
    val t = collection.mutable.Map[String, collection.mutable.Buffer[Double]]()
    (1 to reps).foreach { _ =>
      var n = -1
      modes.foreach { m =>
        val (dt, rows) = run(m)
        t.getOrElseUpdate(m, collection.mutable.Buffer()) += dt
        if (n < 0) n = rows else require(n == rows, s"rows diverge at $m")
      }
    }
    modes.foreach { m =>
      val xs = t(m)
      println(f"Q115GRAM $m%-16s min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
