package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Per-stage decompositions for the two remaining weak/outlier queries
  * without committed stage arithmetic (round 16): q53 TF-IDF (2.4× at sf1,
  * 0.64 s) and q11 star join (4.4× on a 0.54 s wall — sub-wall outlier).
  * Cumulative fresh plans drained through aggregates over DERIVED columns,
  * interleaved reps, medians. Writes Q53_DECOMP.json + Q11_DECOMP.json.
  *
  * q53 legs mirror tfidfTopTerm's shape: (1) the row-local
  * graft_token_counts explode (NO shuffle — consumed twice by design,
  * measured cheaper than materializing), (2) + the vocab-sized df
  * aggregate, (3) + the AQE df join + score, (4) + the ArgMaxText doc
  * aggregate, (5) the full presented query.
  *
  * q11 legs: (1) the filtered customer⋈orders key side, (2) + the
  * SHUFFLE_HASH semi-join into lineitem, (3) + the per-order revenue
  * aggregate (reuses the semi join's partitioning), (4) the full top-10.
  */
object Q53Q11Decomp {
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
    def writeJson(path: String, body: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // ---------------- q53 ----------------
    locally {
      val docs = Tables(spark, sfDir).documents
      def tf(s: SparkSession) = docs.select(col("doc_id"),
          explode(graft.expressions.TextSignatures
            .tokenCountsCol(s)(col("text"))).as("e"))
        .select(col("doc_id"), col("e.t").as("token"), col("e.c").cast("long").as("tf"))
      def dfTab(s: SparkSession) = tf(s).groupBy("token").agg(count(lit(1)).as("df"))
      def scored(s: SparkSession) = {
        val n = docs.agg(count(lit(1)).cast("double").as("_n"))
        tf(s).join(dfTab(s), "token").crossJoin(broadcast(n))
          .withColumn("score", graft.functions.VectorFunctions.roundNative(
            col("tf") * log((col("_n") + 1.0) / (col("df") + 1.0)), 6))
      }
      val t1 = med(tf(spark).agg(count(lit(1)), sum(col("tf"))).collect())
      val t2 = med(dfTab(spark).agg(count(lit(1)), sum(col("df"))).collect())
      val t3 = med(scored(spark).agg(count(lit(1)), sum(col("score"))).collect())
      val t4 = med(graft.operators.TextAnalysis
        .tfidfTopTerm(docs, "doc_id", "text")
        .agg(count(lit(1)), sum(col("score"))).collect())
      val t5 = med(SparkEntry.freshQueries("q53_text_tfidf")(spark, sfDir).collect())
      writeJson("Q53_DECOMP.json",
        s"""{
 "sf": "$sfDir", "reps": $reps,
 "cumulative_legs": {
  "tf_stream_rowlocal": ${f"$t1%.3f"},
  "plus_df_aggregate": ${f"$t2%.3f"},
  "plus_df_join_score": ${f"$t3%.3f"},
  "plus_argmax_per_doc": ${f"$t4%.3f"},
  "full_query_presented": ${f"$t5%.3f"}
 },
 "note": "fresh plans, med-of-$reps, drained through aggregates over derived columns. Leg 1 is the native graft_token_counts explode (scan-local, no shuffle); it is consumed TWICE from leg 3 on (df side and score side) by measured design, so the irreducible shape is: two tf evaluations + the vocab-sized df exchange + the AQE df join + the ArgMaxText doc exchange. CAVEAT: leg 3's scalar-aggregate drain plans DIFFERENTLY than the real query consumes the join (it can read slower than leg 4/5 - the drain materializes every joined row into a global agg while ArgMaxText collapses per doc map-side), so legs 3-5 are alternative drains of the same subtree, not a monotone cumulative chain; read leg1/leg2 vs full for the arithmetic. Alternatives already measured-and-rejected: tokenize-once persist (r13), df as a token window (r14, TfidfTcAB 1.32 vs 0.93 s), capped token-major postings (unbounded per token at scale). DuckDB's oracle pays the same two logical passes inside one process."
}
""")
      println(f"Q53DECOMP tf=$t1%.3f df=$t2%.3f join=$t3%.3f argmax=$t4%.3f full=$t5%.3f")
    }

    // ---------------- q11 ----------------
    locally {
      val t = Tables(spark, sfDir)
      def keys(s: SparkSession) = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .select("o_orderkey")
      def semi(s: SparkSession) = t.lineitem
        .join(keys(s).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      def agg(s: SparkSession) = semi(s)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(graft.functions.Exact.drevenueSum(col("l_extendedprice"), col("l_discount")).as("rev"))
      val t1 = med(keys(spark).agg(count(lit(1)), sum(col("o_orderkey") % 97)).collect())
      val t2 = med(semi(spark).agg(count(lit(1)), sum(col("l_orderkey") % 97)).collect())
      val t3 = med(agg(spark).agg(count(lit(1)), sum(col("rev"))).collect())
      val t4 = med(SparkEntry.freshQueries("q11_star_join")(spark, sfDir).collect())
      writeJson("Q11_DECOMP.json",
        s"""{
 "sf": "$sfDir", "reps": $reps,
 "cumulative_legs": {
  "building_order_keys": ${f"$t1%.3f"},
  "plus_lineitem_semi_join": ${f"$t2%.3f"},
  "plus_revenue_aggregate": ${f"$t3%.3f"},
  "full_query_top10": ${f"$t4%.3f"}
 },
 "note": "cumulative fresh plans, med-of-$reps. Leg 1 is the filtered customer-orders key join (two dim exchanges or an AQE broadcast); leg 2 adds the SHUFFLE_HASH semi-join (one full lineitem exchange - the scale-safe shape: the key side is orders-derived, fact-proportional, so broadcasting it does not survive a scale-up); leg 3's revenue aggregate reuses the semi-join's l_orderkey partitioning (no extra exchange); leg 4 is TakeOrdered top-10 + presentation. DuckDB's 0.12 s formulation pays the same joins in-process without per-stage scheduling."
}
""")
      println(f"Q11DECOMP keys=$t1%.3f semi=$t2%.3f agg=$t3%.3f full=$t4%.3f")
    }
    spark.stop()
  }
}
