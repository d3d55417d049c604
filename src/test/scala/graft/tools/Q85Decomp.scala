package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.Dedup

/** Per-stage decomposition of q85's wall (round 16, verdict task 1): the
  * query is (1) the n-gram Jaccard pair source over the 40-doc fixture,
  * (2) the symmetric edge list's eager localCheckpoint, (3) the min-label
  * pointer-jumping loop (one localCheckpoint job per materialized round),
  * (4) the cross-session label handoff + presentation. Legs are cumulative
  * plans drained the way Bench drains (collect), interleaved reps, medians.
  *
  * Beyond the cumulative legs, an INSTRUMENTED copy of the
  * [[Dedup.duplicateClusters]] loop (row-identity asserted against the
  * public API every run) times each materialized round individually, so the
  * committed artifact carries the verdict's asked-for arithmetic: per-round
  * materialization cost x round count vs the relax/compose work. Two
  * variants answer the follow-up directly:
  *   - relax2: TWO relaxations + jump per materialized round (same
  *     fixpoint, fewer checkpoints) — the verdict's suggested probe;
  *   - no_clone: the loop run on the caller session (AQE posture inherited,
  *     no PostureSessions clone, no global-temp-view handoff) — prices the
  *     small-loop isolation machinery itself.
  * Writes Q85_DECOMP.json.
  */
object Q85Decomp {
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

    def pairs(s: SparkSession): DataFrame =
      Dedup.ngramJaccardPairs(
        Tables(s, sfDir).documents.filter(col("doc_id") <= 40), "doc_id", 3)
        .filter(col("jaccard") >= 0.1)

    // the expected labels, computed once through the public API — every
    // instrumented/variant run below must reproduce them exactly
    val expected = Dedup.duplicateClusters(pairs(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def assertLabels(df: DataFrame): Unit = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      require(got == expected,
        s"instrumented loop diverged from Dedup.duplicateClusters: " +
          s"${got.size} rows vs ${expected.size}")
    }

    /** Instrumented replica of the duplicateClusters loop. relaxations = 1
      * is the shipped shape; 2 composes two neighbor-min passes per
      * materialized round. clone = false skips the PostureSessions/global
      * temp view isolation (loop planned on the caller session, AQE on).
      * Returns (edges_s, per-round walls, handoff_s, result df). */
    def instrumented(relaxations: Int, clone: Boolean):
        (Double, Seq[Double], Double, DataFrame) = {
      val t0 = System.nanoTime()
      val p = pairs(spark)
      val fwd = p.select(col("a").as("src"), col("b").as("dst"))
      val eObs = org.apache.spark.sql.Observation()
      val edges = fwd.union(p.select(col("b").as("src"), col("a").as("dst")))
        .observe(eObs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      eObs.get("n").asInstanceOf[Long]
      val tEdges = (System.nanoTime() - t0) / 1e9
      val (loopEdges, loopSession, unview) =
        if (!clone) (edges, spark, () => ())
        else {
          val vn = s"graft_q85probe_${java.util.UUID.randomUUID().toString.replace("-", "")}"
          edges.createOrReplaceGlobalTempView(vn)
          val ls = graft.PostureSessions(spark,
            Map("spark.sql.adaptive.enabled" -> "false"))
          (ls.table(s"global_temp.$vn"), ls,
            () => { spark.catalog.dropGlobalTempView(vn); () })
        }
      try {
        var labels: DataFrame = null
        var converged = false
        val roundWalls = scala.collection.mutable.ArrayBuffer[Double]()
        while (!converged) {
          val r0 = System.nanoTime()
          def relaxOnce(cur: DataFrame): DataFrame =
            if (cur == null)
              loopEdges.groupBy(col("src").as("node")).agg(min("dst").as("nbr_lbl"))
                .select(col("node"), col("node").as("orig"),
                  least(col("node"), col("nbr_lbl")).as("lbl"))
            else {
              val nbrMin = loopEdges.join(cur, loopEdges("dst") === cur("node"))
                .groupBy(col("src").as("node2")).agg(min("lbl").as("nbr_lbl"))
              cur.join(nbrMin, cur("node") === nbrMin("node2"), "left")
                .select(col("node"), col("orig"),
                  least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
            }
          // the shipped round-1 shape has no label table yet: orig is the
          // node id itself; later relaxations see (node, orig, lbl)
          var relaxed =
            if (labels == null) relaxOnce(null)
            else relaxOnce(labels.select(col("node"), col("lbl").as("orig"),
              col("lbl")))
          var k = 1
          while (k < relaxations) {
            relaxed = relaxOnce(relaxed.select(col("node"),
              col("orig"), col("lbl")))
            k += 1
          }
          val hop = relaxed.select(col("node").as("p_node"), col("lbl").as("p_lbl"))
          val jumpedLbl = least(col("lbl"), coalesce(col("p_lbl"), col("lbl")))
          val next0 = relaxed.join(hop, relaxed("lbl") === hop("p_node"), "left")
            .select(col("node"), jumpedLbl.as("lbl"),
              (jumpedLbl < col("orig")).as("changed"))
          val obs = org.apache.spark.sql.Observation()
          val counted = next0.observe(obs,
            count(when(col("changed"), lit(1))).as("changed"))
          val next = counted.select("node", "lbl").localCheckpoint(true)
          converged = obs.get("changed").asInstanceOf[Long] == 0L
          labels = next
          roundWalls += (System.nanoTime() - r0) / 1e9
        }
        val h0 = System.nanoTime()
        val res0 = labels.select(col("node").as("doc_id"), col("lbl").as("canonical"))
        val result =
          if (!clone) res0
          else {
            val vn = s"graft_q85probe_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
            res0.createOrReplaceGlobalTempView(vn)
            try spark.table(s"global_temp.$vn")
            finally spark.catalog.dropGlobalTempView(vn)
          }
        val tHandoff = (System.nanoTime() - h0) / 1e9
        (tEdges, roundWalls.toSeq, tHandoff, result)
      } finally unview()
    }

    def med(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }

    // cumulative legs, drained the Bench way (collect)
    val tPairs = med(pairs(spark).collect())
    val tEdgesCk = med {
      val p = pairs(spark)
      val fwd = p.select(col("a").as("src"), col("b").as("dst"))
      fwd.union(p.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true)
      ()
    }
    val tCluster = med(Dedup.duplicateClusters(pairs(spark)).collect())
    val tFull = med(SparkEntry.freshQueries("q85_dedup_cluster")(spark, sfDir).collect())

    // instrumented arithmetic: median over reps of each component
    def runInstr(relaxations: Int, clone: Boolean) = {
      val runs = (1 to (reps + 1)).map { _ =>
        val (e, rw, h, res) = instrumented(relaxations, clone)
        assertLabels(res)
        (e, rw, h)
      }.drop(1)
      val medOf = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
      val rounds = runs.head._2.size
      require(runs.forall(_._2.size == rounds), "round count varied across reps")
      (medOf(runs.map(_._1)),
        (0 until rounds).map(i => medOf(runs.map(_._2(i)))),
        medOf(runs.map(_._3)))
    }
    val (e1, rw1, h1) = runInstr(1, clone = true)
    val (e2, rw2, h2) = runInstr(2, clone = true)
    val (e3, rw3, h3) = runInstr(1, clone = false)

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ", ", "]")
    val json =
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "cumulative_legs_collect_drained": {
  "pair_source": ${f"$tPairs%.3f"},
  "plus_edges_checkpoint": ${f"$tEdgesCk%.3f"},
  "full_cluster_api": ${f"$tCluster%.3f"},
  "full_query_presented": ${f"$tFull%.3f"}
 },
 "instrumented_shipped_shape": {
  "edges_checkpoint": ${f"$e1%.3f"}, "rounds": ${rw1.size},
  "round_walls": ${arr(rw1)}, "loop_total": ${f"${rw1.sum}%.3f"},
  "handoff_present": ${f"$h1%.3f"}
 },
 "variant_relax2_per_round": {
  "edges_checkpoint": ${f"$e2%.3f"}, "rounds": ${rw2.size},
  "round_walls": ${arr(rw2)}, "loop_total": ${f"${rw2.sum}%.3f"},
  "handoff_present": ${f"$h2%.3f"}
 },
 "variant_no_clone_caller_session_aqe_on": {
  "edges_checkpoint": ${f"$e3%.3f"}, "rounds": ${rw3.size},
  "round_walls": ${arr(rw3)}, "loop_total": ${f"${rw3.sum}%.3f"},
  "handoff_present": ${f"$h3%.3f"}
 },
 "note": "cumulative legs are medians of fresh-plan collect() runs (the Bench drain); instrumented rows are an in-probe replica of the DISTRIBUTED duplicateClusters loop with row-identity asserted against the public API on every run - since round 16 the API closes this measured-tiny edge set on the driver (union-find, one bounded collect job, spark.graft.ccDriverEdges gate), so the assert doubles as the loop-vs-union-find equivalence check. round_walls[i] includes that round's relax+jump plan build AND its localCheckpoint job; 2 rounds is the algorithmic minimum (one that changes + one that confirms). relax2 = two neighbor-min passes per materialized round (same fixpoint, LOSES: deeper plans, same round count); no_clone = loop planned on the caller session, AQE inherited, no global-temp-view handoff (no better). Verdict arithmetic: the pre-r16 wall was pair_source + edges_checkpoint + loop_total + handoff; the loop was floor (2 jobs over <1k rows), now paid only past the driver gate."
}
"""
    java.nio.file.Files.write(java.nio.file.Paths.get("Q85_DECOMP.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
