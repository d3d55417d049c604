package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: the six streaming replays under the default (HDFS-backed)
  * vs the RocksDB state-store provider — the one untried lever for the
  * ~5.8 s streaming share of the bench (round-4 verdict item 5). Each rep
  * runs the full replay (fresh checkpoint per run by construction), so the
  * provider takes effect at every stream start.
  */
object StateStoreProbe {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", graft.StageDir.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.streaming.EventStreams.queries.keys.toSeq.sorted
    val providers = Seq("default" -> None, "rocksdb" -> Some(RocksDb))
    val totals = providers.map { case (label, cls) =>
      cls match {
        case Some(c) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", c)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      val perQ = names.map { n =>
        val fn = graft.streaming.EventStreams.queries(n)
        val ts = (1 to (reps + 1)).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).collect()
          (System.nanoTime() - t0) / 1e9
        }.drop(1)
        println(f"SSPROBE $label%-8s $n%-28s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
        n -> ts.min
      }
      val tot = perQ.map(_._2).sum
      println(f"SSPROBE $label%-8s TOTAL min-sum=$tot%.3f")
      label -> tot
    }
    val Seq((_, d), (_, r)) = totals
    println(f"SSPROBE VERDICT rocksdb/default = ${r / d}%.3f (adopt if <= 0.80)")
    spark.stop()
  }
}
