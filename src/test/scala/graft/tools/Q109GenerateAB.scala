package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B leg for q109's r16 plan-fingerprint change (VERDICT r16 Missing #4):
  * the derived presentation-sort rule deliberately saturates Generate's
  * fan-in bound (generator output is unbounded by leaf row counts — an
  * exploding chunker at 100 TB must never be funneled into a
  * single-partition presentation sort), which flipped q109_chunk_docs from
  * the single-partition arm to the range-sort arm and moved its sf0.1 wall
  * ~+0.1 s. Every other r16 plan change shipped with its own measurement;
  * this one's leg. Both arms run on session CLONES via the
  * `spark.graft.presentationSort` override (zero caller-conf mutation —
  * the r16 ScaleLayouts rule), interleaved, med-of-reps, at whatever SF dir
  * is given. Writes Q109_GENERATE_AB.json: the measured sf-local cost of
  * the range arm, recorded against the scale hazard the rule buys out of
  * (the q37 SortModeProbe asymmetry — 13.1 s vs 2.3 s at sf1 — is what a
  * wrong single-partition choice costs when the fan-in bound lies).
  */
object Q109GenerateAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def arm(single: Boolean): () => Unit = { () =>
      val s = spark.newSession()
      s.conf.set("spark.graft.presentationSort", single.toString)
      SparkEntry.freshQueries("q109_chunk_docs")(s, sfDir).collect()
      ()
    }
    val (runSingle, runRange) = (arm(single = true), arm(single = false))
    // row identity across arms (sort mode must not change content)
    val a = {
      val s = spark.newSession()
      s.conf.set("spark.graft.presentationSort", "true")
      SparkEntry.freshQueries("q109_chunk_docs")(s, sfDir)
        .collect().map(_.toString).sorted
    }
    val b = {
      val s = spark.newSession()
      s.conf.set("spark.graft.presentationSort", "false")
      SparkEntry.freshQueries("q109_chunk_docs")(s, sfDir)
        .collect().map(_.toString).sorted
    }
    require(a.length == b.length && a.sameElements(b),
      s"arms differ: single ${a.length} rows vs range ${b.length} rows")
    println(s"Q109GEN rows identical: ${a.length}")

    runSingle(); runRange() // warm both plans
    val (tsS, tsR) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    var i = 0
    while (i < reps) {
      val t0 = System.nanoTime(); runSingle(); tsS(i) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); runRange(); tsR(i) = (System.nanoTime() - t1) / 1e9
      i += 1
    }
    def med(ts: Array[Double]): Double = { val s = ts.sorted; s(s.length / 2) }
    val (ms, mr) = (med(tsS), med(tsR))
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps, \"rows\": ${a.length},\n" +
      f""" "single_partition_sort_sec": $ms%.3f, "range_sort_shipped_sec": $mr%.3f,%n""" +
      f""" "range_cost_sec": ${mr - ms}%.3f,%n""" +
      " \"note\": \"interleaved med-of-" + reps + " on presentationSort " +
      "session clones; the shipped arm is RANGE because the derived rule " +
      "saturates Generate fan-in (generator output is unbounded by leaf " +
      "counts - PlanShapeSpec pins the arm); the recorded delta is the " +
      "deliberate sf-local price of buying out of the single-partition " +
      "serial-merge hazard (q37 SortModeProbe: 13.1 vs 2.3 s at sf1 when " +
      "the bound lies)\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q109_GENERATE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(f"Q109GEN single $ms%.3f s  range $mr%.3f s  range cost ${mr - ms}%+.3f s")
    spark.stop()
  }
}
