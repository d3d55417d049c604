package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** A/B of q115's df join physical form (r15): the pair stream joined back
  * to the per-shingle document frequencies is the measured bulk of the
  * containment wall (Q115Legs: 3.0 s of 4.8 s). Sort-merge sorts BOTH
  * ~12M-row sides by the shingle STRING; shuffle-hash builds a table from
  * the dfreq side (distinct shingles, bounded by vocabulary not pairs) and
  * never sorts. Writes Q115_JOIN_AB.json.
  */
object Q115JoinAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def legs(hint: Option[String]) = {
      val g = graft.Tables(spark, sfDir).documents
        .filter(graft.operators.TextAnalysis.wsTokenCount(col("text")) >= 3)
        .select(col("doc_id"),
          graft.expressions.TextSignatures.wordNgramsCol(spark)(
            col("text"), 3, distinct = true).as("g"))
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq0 = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val dfreq = hint.map(dfreq0.hint(_)).getOrElse(dfreq0)
      ex.join(dfreq, "sh").agg(sum(col("df")), count(lit(1))).collect()(0)
    }
    val a = legs(None)
    val b = legs(Some("shuffle_hash"))
    require(a == b, s"join variants disagree: $a vs $b")
    def time(f: => Any): (Double, Double) = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (ts(ts.size / 2), ts.head)
    }
    val (smjMed, smjMin) = time(legs(None))
    val (shMed, shMin) = time(legs(Some("shuffle_hash")))
    val json =
      f"""{
         | "sf": "$sfDir", "reps": $reps,
         | "default_join_med_s": $smjMed%.3f, "default_join_min_s": $smjMin%.3f,
         | "shuffle_hash_med_s": $shMed%.3f, "shuffle_hash_min_s": $shMin%.3f,
         | "speedup_med": ${smjMed / shMed}%.2f,
         | "note": "pair-stream x dfreq join drained through sum/count; values asserted equal; build side = dfreq (vocabulary-sized, bounded independently of pair volume)"
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("Q115_JOIN_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
