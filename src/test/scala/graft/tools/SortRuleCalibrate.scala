package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, Sort}

import graft.{Present, SparkEntry}

/** Calibration table behind `Present.RangeSortRows` (round 15): for every
  * declared query at a given SF dir, print the un-reduced fan-in rows
  * ([[Present.fanInRows]]) next to the sort mode the rule derives from it,
  * so the threshold's separation of the two measured clusters (SortModeProbe
  * range-winners vs single-partition winners) is committed as an artifact
  * (`SORT_THRESHOLD.json`), not an assertion. Args: [query substrings...].
  *
  * Modes printed: `range` (global Sort in the optimized plan), `single`
  * (repartition(1) + in-partition sort), `none` (no presentation sort —
  * e.g. TakeOrdered top-N or a non-presented replay read-back).
  */
object SortRuleCalibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.freshQueries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.contains))
    val rows = names.flatMap { name =>
      try {
        val df = SparkEntry.freshQueries(name)(spark, sfDir)
        val plan = df.queryExecution.optimizedPlan
        val fan = Present.fanInRows(plan)
        def hasGlobalSort(p: LogicalPlan): Boolean = p match {
          case s: Sort if s.global => true
          case other => other.children.exists(hasGlobalSort)
        }
        def hasMergeTo1(p: LogicalPlan): Boolean = p match {
          case r: Repartition if r.numPartitions == 1 => true
          case other => other.children.exists(hasMergeTo1)
        }
        val mode =
          if (hasGlobalSort(plan)) "range"
          else if (hasMergeTo1(plan)) "single"
          else "none"
        println(f"SORTCAL $name%-30s fan=${fan}%12s mode=$mode")
        Some((name, fan, mode))
      } catch {
        case e: Throwable =>
          println(s"SORTCAL $name FAIL ${e.getClass.getSimpleName}")
          None
      }
    }
    val json = rows.map { case (n, f, m) =>
      s"""  "$n": {"fan_in_rows": $f, "mode": "$m"}"""
    }.mkString(",\n")
    val art =
      s"""{
         | "sf": "$sfDir",
         | "threshold_rows": ${Present.RangeSortRows},
         | "rule": "range sort iff un-reduced fan-in ROWS > threshold (Present.fanInRows: parquet-footer leaf row counts reaching the root without crossing Aggregate/Limit/Distinct/WindowGroupLimit; joins take the larger side, semi/anti the probe side, unions add; filters deliberately do NOT reduce the bound - selectivity is unknowable without CBO stats and the measured cost asymmetry says guess big: q10 merged 13.1s vs ranged 2.3s, while a needless range sort costs one flat ~0.1-0.2s sampling job)",
         | "derivation": "r15 two-mode measurement (SortModeProbe, 22 frontier queries at sf1, med-of-3): range-better = q03 1.34->0.83, q05 1.21->0.72, q07 2.46->2.06, q10 13.12->2.26, q18 1.14->0.94, q19 1.05->0.84, q27 1.26->0.72, q29 1.03->0.84, q37 1.31->1.21, q90 1.66->1.04 (all fan >= 1.0M rows: events/orders/lineitem); single-better = q24 0.17 vs 0.34, q26 0.13 vs 0.25, q28, q33, q39 0.70 vs 0.79, q44, q56, q82 0.32 vs 0.43, q87 0.90 vs 1.19, q124 2.10 vs 2.83, q135 1.81 vs 2.19 (all true fan <= 150k except the documented upper-bound misroutes: q26 +0.12s, q39 -0.09s, q04 noise-even 0.58 vs 0.65 this window after r14 read range-better by 0.07). 500k splits the clusters with >=2x margin on both sides",
         | "queries": {
         |$json
         | }
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("SORT_THRESHOLD.json"),
      art.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SORTCAL wrote SORT_THRESHOLD.json (${rows.size} queries, " +
      s"threshold ${Present.RangeSortRows})")
    spark.stop()
  }
}
