package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Bench, SparkEntry}

/** Dev tool: write the SCRUBBED optimized-plan text (the exact string
  * `Bench.planFingerprint` hashes) for named queries to a file — run it
  * twice in two JVMs and diff to find window-unstable tokens the scrubber
  * misses (r18: q54/q74/q94/q95 fingerprinted differently in every bench
  * window, so neither the per-query envelope rule nor the suite
  * fingerprint-set gate could ever match them).
  *
  * Usage: Test/runMain graft.tools.PlanDump /tmp/plans_a.txt q54 q74
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args.head
    val filters = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filters.isEmpty || filters.exists(n.contains))
    val text = names.map { n =>
      s"========== $n ==========\n" +
        Bench.scrubbedPlan(SparkEntry.queries(n)(spark, sfDir), sfDir)
    }.mkString("\n")
    Files.write(Paths.get(out), text.getBytes(StandardCharsets.UTF_8))
    println(s"PlanDump: ${names.size} plans -> $out")
    spark.stop()
  }
}
