package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Per-stage decomposition for q37 as-of join — the one r16 weak-list entry
  * (2.4× at sf1, ~1.2 s) without committed stage arithmetic; it sat at
  * 1.96× (off-list) in the r15 window and re-entered on the slower r16
  * host. Cumulative fresh plans drained through aggregates over DERIVED
  * columns, medians. Writes Q37_DECOMP.json.
  *
  * Legs mirror leftAsOf's shape (`AsOfJoin.scala`): (1) the deduped signup
  * side (small groupBy), (2) + the union and the single user_id exchange +
  * (ts, side) sort + running last(ignoreNulls) window — the operator core,
  * events-sized, (3) the full presented query (adds the event_id range
  * sort and the events-sized row fetch the bench pays by contract).
  */
object Q37Decomp {
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

    def med(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }

    val e = Tables(spark, sfDir).eventsUs
    def signups = e.filter(col("event_type") === "signup")
      .select("user_id", "ts_us", "value", "event_id")
      .groupBy("user_id", "ts_us")
      .agg(max_by(col("value"), col("event_id")).as("_asof_v"))
    def core = {
      val l = e.withColumn("_side", lit(1))
      val r = signups.withColumn("_side", lit(0))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.unionByName(r, allowMissingColumns = true)
        .withColumn("asof_value", last(col("_asof_v"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1)
        .select(col("event_id"), col("asof_value"))
    }
    val t1 = med(signups.agg(count(lit(1)), sum(col("_asof_v"))).collect())
    val t2 = med(core.agg(count(lit(1)), sum(col("asof_value")),
      sum(col("event_id") % 97)).collect())
    val t3 = med(SparkEntry.freshQueries("q37_asof_join")(spark, sfDir).collect())
    val nOut = core.count()
    println(f"Q37DECOMP signups=$t1%.3f core=$t2%.3f full=$t3%.3f rows=$nOut")

    java.nio.file.Files.write(java.nio.file.Paths.get("Q37_DECOMP.json"),
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "cumulative_legs": {
  "signup_side_dedup": ${f"$t1%.3f"},
  "plus_union_key_window": ${f"$t2%.3f"},
  "full_query_presented": ${f"$t3%.3f"},
  "result_rows": $nOut
 },
 "note": "cumulative fresh plans, med-of-$reps, drained through aggregates over derived columns. Leg 1 is the deduped right side (one small groupBy). Leg 2 is the operator core: union + ONE events-sized user_id exchange + per-key (ts, side) sort + running last(ignoreNulls) window - the only shape that survives 100 TB (cost independent of how many left rows each right row serves; a range join would enumerate pairs). Leg 3 adds the event_id range-sort presentation AND the events-sized result fetch the bench pays by contract (every output row collected). The full-minus-core delta is presentation+fetch of ~result_rows rows, not join work; DuckDB's native ASOF join answers the same semantics in-process with no second sort visible to the client. Alternatives measured-and-rejected: single-partition presentation merge (SortModeProbe r15, 1.99 vs 1.59 s med - the fan-in rule now derives the range shape), broadcast signup array (right side is fact-proportional, does not survive a scale-up)."
}
""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
