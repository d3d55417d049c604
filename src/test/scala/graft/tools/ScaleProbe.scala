package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.functions.Exact
import scala.util.chaining._

/** Dev tool: scale-up experiment. Builds a 10× lineitem (offset order keys,
  * multi-file parquet) under /tmp and times headline aggregations — the
  * counterpoint to the sf0.1 bench, where per-query scheduling floor
  * dominates. Prints second-run timings.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "/tmp/graft_scale10/lineitem"
    if (!new java.io.File(out).exists()) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val ten = (0 until 10).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
      ten.repartition(32).write.mode("overwrite").parquet(out)
    }
    val li = spark.read.parquet(out)
    // force FULL evaluation via the noop sink: a trailing .count() lets
    // Catalyst column-prune the aggregate values (and for per-row exprs the
    // whole computation) out of the timed plan — the noop write consumes
    // every output column of every row. (The old one-row "consumption"
    // aggregates are gone for the same reason: sum-of-hash even overflowed
    // once it actually executed, proving those timings were vacuous.)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"SCALE10 $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("count") { li.count(); () }
    time("q1_agg_6m") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(Exact.dsum(col("l_quantity")).as("sq"),
          Exact.dsum(col("l_extendedprice")).as("se"),
          count(lit(1)).as("c"))
        .pipe(run)
    }
    time("rev_per_order_6m") {
      li.groupBy("l_orderkey")
        .agg(Exact.drevenueSum(col("l_extendedprice"), col("l_discount")).as("rev"))
        .pipe(run)
    }
    time("topk_6m") {
      li.select("l_orderkey", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc).limit(10).pipe(run)
    }

    // 10x documents (50k docs): the text-analysis family's scale-up — one
    // fused TextStats pass + marker scan per doc, aggregated to one row so
    // collect cost can't mask the scan cost.
    val docsOut = "/tmp/graft_scale10/documents"
    if (!new java.io.File(docsOut).exists()) {
      val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      (0 until 10).map(i => d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(docsOut)
    }
    val docs = spark.read.parquet(docsOut)
    time("text_stats_50k_docs") {
      val st = graft.expressions.TextStats.statsCol(spark)(col("text"))
      val mh = graft.expressions.TextStats.markerHitsCol(spark)(col("text"))
      docs.select(st.as("st"), mh.as("mh")).pipe(run)
    }
    time("minhash_bands_50k_docs") {
      docs.select(graft.expressions.TextSignatures
          .minhashBandsCol(spark)(col("text"), 5).as("b")).pipe(run)
    }
    // curation family at 50k docs: the shapes must stay one-shuffle-or-less
    // as the corpus grows (packing: by shard; contamination: broadcast
    // holdout; repetition: scan-only; gate: by stratum)
    time("pack_50k_docs") {
      graft.operators.Curation.packSequences(docs, "doc_id", "text", 500L, 64).pipe(run)
    }
    time("contamination_50k_docs") {
      graft.operators.Curation.contamination(
        docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", 3).pipe(run)
    }
    time("repetition_50k_docs") {
      graft.operators.Curation.repetitionRatios(docs, "doc_id", "text").pipe(run)
    }
    time("quality_gate_50k_docs") {
      graft.operators.Curation.qualityGateTopHalf(docs, "doc_id", "text").pipe(run)
    }

    // 10x events (6M rows, 15k users via offset user ids): the round-5
    // behavioral/time-series operators — their one-entity-exchange shapes
    // must grow linearly in rows, not in entities × span
    val evOut = "/tmp/graft_scale10/events"
    if (!new java.io.File(evOut).exists()) {
      val e = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      (0 until 10).map(i => e
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
          .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
        .reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(evOut)
    }
    val ev = graft.Tables.withTsUs(spark.read.parquet(evOut))
    time("resample_6m_events") {
      graft.operators.Resample.gapFillResample(
        ev.filter(col("user_id") % 7 === 0), "user_id", "ts_us", "value",
        "event_id", 3600000000L).pipe(run)
    }
    time("retention_6m_events") {
      graft.operators.Funnels.cohortRetention(ev, "user_id", "ts_us").pipe(run)
    }
    time("funnel_6m_events") {
      graft.operators.Funnels.funnelStages(ev, "user_id", "ts_us", "event_type",
        "event_id", Seq("view", "click", "purchase"), 86400000000L).pipe(run)
    }
    time("variant_6m_events") {
      ev.withColumn("_v", expr("parse_json(props)"))
        .select(expr("variant_get(_v, '$.k', 'long')").as("k")).pipe(run)
    }
    spark.stop()
  }
}
