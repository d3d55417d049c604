package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Per-stage decomposition of q102's wall (round 16, verdict task 3: the
  * sub-0.6 s blind spot's largest ratio — 8.0x on a 0.58 s wall at sf1).
  * The query is (1) the step-typed event scan+filter, (2) the ONE entity
  * exchange + sorted-array build (`sort_array(collect_list(struct(ts, tb,
  * tp)))` — the only data-proportional stage), (3) the codegen'd
  * higher-order fold to a stage index, (4) the 4-row stage count + present.
  * Legs are cumulative fresh plans drained through aggregates over DERIVED
  * columns (a bare count() lets Catalyst prune the array build entirely),
  * interleaved reps, medians. Writes Q102_DECOMP.json — naming which stage
  * holds the 0.5 s DuckDB's min-chain joins skip.
  */
object Q102Decomp {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val steps = Seq("view", "click", "purchase")

    def stepEvents(s: SparkSession): DataFrame =
      Tables(s, sfDir).eventsUs.filter(col("event_type").isin(steps: _*))
    def arrs(s: SparkSession): DataFrame =
      stepEvents(s).groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(
          col("ts_us").as("ts"), col("event_id").as("tb"),
          col("event_type").as("tp")))).as("_arr"))
    def folded(s: SparkSession): DataFrame =
      graft.operators.Funnels.funnelStages(Tables(s, sfDir).eventsUs,
        "user_id", "ts_us", "event_type", "event_id", steps, 86400000000L)

    // leg B: the pre-r16 composed form — struct collect + sort_array + HOF
    // fold (kept inline as the measured-and-replaced baseline; row-identity
    // vs the native form asserted below)
    def foldedHof(s: SparkSession): DataFrame = {
      val windowUs = 86400000000L
      val walk = steps.zipWithIndex.map { case (step, i) =>
        val guard = if (i == 0) "" else s"AND x.ts > acc.ts AND x.ts <= acc.ts + ${windowUs}L "
        s"WHEN acc.stage = $i AND x.tp = '$step' ${guard}THEN named_struct('stage', ${i + 1}, 'ts', x.ts)"
      }.mkString(" ")
      Tables(s, sfDir).eventsUs
        .filter(col("event_type").isin(steps: _*))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(
          col("ts_us").as("ts"), col("event_id").as("tb"),
          col("event_type").as("tp")))).as("_arr"))
        .select(col("user_id"),
          expr(s"""aggregate(_arr,
                     named_struct('stage', 0, 'ts', CAST(${Long.MinValue} AS BIGINT)),
                     (acc, x) -> CASE $walk ELSE acc END,
                     acc -> acc.stage)""").as("stage"))
    }

    def med(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }
    // row-identity: the native packed-long walk must reproduce the HOF
    // fold's stages exactly (equal-ts order invariance claim, checked here)
    locally {
      val a = folded(spark).collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val b = foldedHof(spark).collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      require(a == b, s"native funnel walk != HOF fold: ${a.size} vs ${b.size} rows")
    }
    val tScan = med(stepEvents(spark)
      .agg(count(lit(1)), sum(col("ts_us") % 9973)).collect())
    val tArr = med(arrs(spark)
      .agg(sum(size(col("_arr"))), count(lit(1))).collect())
    val tHof = med(foldedHof(spark).agg(sum(col("stage")), count(lit(1))).collect())
    val tFold = med(folded(spark).agg(sum(col("stage")), count(lit(1))).collect())
    val tFull = med(SparkEntry.freshQueries("q102_funnel")(spark, sfDir).collect())

    val json =
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "cumulative_legs": {
  "scan_filter_steps": ${f"$tScan%.3f"},
  "plus_entity_exchange_sorted_array": ${f"$tArr%.3f"},
  "hof_struct_fold_composed": ${f"$tHof%.3f"},
  "native_packed_fold": ${f"$tFold%.3f"},
  "full_query_stage_counts_presented": ${f"$tFull%.3f"}
 },
 "note": "cumulative fresh plans, med-of-$reps, drained through aggregates over derived columns (count() alone lets Catalyst prune the array build). Legs 1-3 decompose the PRE-r16 composed shape: the delta between legs 2 and 1 is the one entity exchange + per-entity sort_array(collect_list(struct)), and the HOF fold on top of the array is free - the struct array is the cost, not the walk. native_packed_fold is the r16 graft_funnel_stage form (one packed long per event, primitive buffers + sort), row-identity asserted against the HOF fold in-run. DuckDB's 73 ms formulation is three min-chain hash joins with no array materialization."
}
"""
    java.nio.file.Files.write(java.nio.file.Paths.get("Q102_DECOMP.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
