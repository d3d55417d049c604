package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: V1 parquet source (current) vs V2 + parquet aggregate
  * pushdown (`spark.sql.parquet.aggregatePushDown`), which can answer
  * filter-less count/min/max scans from footer metadata — DuckDB's trick
  * for q01-class queries. Measures a representative shape set to check the
  * V2 scan path doesn't regress anything else before any adoption.
  */
object AggPushProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", graft.StageDir.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q01_scan_count", "q03_project", "q04_filter", "q10_join_range",
      "q13_agg_hash", "q14_agg_distinct", "q20_sort", "q27_case_when",
      "q41_dedup_minhash", "q47_text_langid")
    def run(label: String, s: SparkSession): Map[String, Double] = {
      val out = names.map { n =>
        val fn = graft.SparkEntry.freshQueries(n)
        val ts = (1 to (reps + 1)).map { _ =>
          val t0 = System.nanoTime()
          fn(s, sfDir).collect()
          (System.nanoTime() - t0) / 1e9
        }.drop(1)
        println(f"APPROBE $label%-4s $n%-22s min=${ts.min}%.3f")
        n -> ts.min
      }.toMap
      println(f"APPROBE $label%-4s TOTAL ${out.values.sum}%.3f")
      out
    }
    val v1 = run("v1", spark)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushDown", "true")
    val v2 = run("v2", s2)
    names.foreach { n =>
      println(f"APPROBE DELTA $n%-22s ${v2(n) / v1(n)}%.2fx")
    }
    spark.stop()
  }
}
