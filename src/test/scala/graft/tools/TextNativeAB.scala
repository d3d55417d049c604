package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** A/B measurement behind the r15 native text expressions (the committed
  * justification, per the three-for-three r14 rule "profile first, then
  * fold the HOF into a codegen expression"):
  *
  *  - q119/q117 lines leg: graft_word_lines(text, n) vs the
  *    transform(sequence)/slice/array_join composition it replaced —
  *    both drained through the same distinct-explode + count aggregate
  *    (lineDocFrequencies' shape), so the delta isolates the per-row
  *    window generation.
  *  - q111 tf leg: graft_term_tfs + posexplode/filter vs the
  *    explode-all-tokens + isin + (doc, dl, tok) count-exchange shape —
  *    drained through a count() of tf rows, so the delta includes the
  *    exchange the native shape removes.
  *
  * Writes TEXT_NATIVE_AB.json. Interleaved reps, median + min committed.
  */
object TextNativeAB {
  private def time(reps: Int)(f: => Long): (Double, Double, Long) = {
    var out = 0L
    val ts = (1 to (reps + 1)).map { _ =>
      val t0 = System.nanoTime()
      out = f
      (System.nanoTime() - t0) / 1e9
    }.drop(1).sorted
    (ts(ts.size / 2), ts.head, out)
  }

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
    graft.expressions.TextSignatures.register(spark)
    val docs = graft.Tables(spark, sfDir).documents.select("doc_id", "text")
    val n = 10 // q119's lineTokens
    val terms = Seq("data", "model", "training", "quality") // q111's term set shape

    def drainLines(lines: DataFrame): Long =
      lines.select(explode(array_distinct(col("_lines"))).as("line"))
        .groupBy("line").agg(count(lit(1)).as("df")).count()

    val composedLines = docs
      .withColumn("_t", split(trim(col("text")), " +"))
      .selectExpr("doc_id",
        s"""transform(
              sequence(0, greatest(CAST(ceil((size(_t) - $n) / CAST($n AS DOUBLE)) AS INT), 0)),
              i -> array_join(slice(_t, i * $n + 1, $n), ' ')) AS _lines""")
    val nativeLines = docs.selectExpr("doc_id", s"graft_word_lines(text, $n) AS _lines")

    def drainTf(tf: DataFrame): Long = tf.count()
    val termsArr = array(terms.map(lit): _*)
    val composedTf = docs
      .select(col("doc_id"), split(trim(col("text")), " +").as("_t"),
        graft.operators.TextAnalysis.wsTokenCount(col("text")).as("dl"))
      .select(col("doc_id"), col("dl"), explode(col("_t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val nativeTf = docs
      .select(col("doc_id"), call_function("graft_term_tfs", col("text"), termsArr).as("_tt"))
      .select(col("doc_id"), col("_tt.dl").as("dl"),
        posexplode(col("_tt.tfs")).as(Seq("_i", "tf")))
      .filter(col("tf") > 0)

    // interleave A/B within the window so both legs sample the same noise
    val (clMed, clMin, clN) = time(reps)(drainLines(composedLines))
    val (nlMed, nlMin, nlN) = time(reps)(drainLines(nativeLines))
    val (ctMed, ctMin, ctN) = time(reps)(drainTf(composedTf))
    val (ntMed, ntMin, ntN) = time(reps)(drainTf(nativeTf))
    require(clN == nlN, s"lines row mismatch: composed $clN vs native $nlN")
    require(ctN == ntN, s"tf row mismatch: composed $ctN vs native $ntN")

    val json =
      f"""{
         | "sf": "$sfDir", "reps": $reps,
         | "lines_leg": {"rows": $clN,
         |   "composed_med_s": $clMed%.3f, "composed_min_s": $clMin%.3f,
         |   "native_med_s": $nlMed%.3f, "native_min_s": $nlMin%.3f,
         |   "speedup_med": ${clMed / nlMed}%.2f},
         | "term_tf_leg": {"rows": $ctN,
         |   "composed_med_s": $ctMed%.3f, "composed_min_s": $ctMin%.3f,
         |   "native_med_s": $ntMed%.3f, "native_min_s": $ntMin%.3f,
         |   "speedup_med": ${ctMed / ntMed}%.2f},
         | "note": "same-window interleaved legs; both drained through the consuming aggregate so the composed tf leg pays its (doc,dl,tok) exchange and the native leg shows it removed; row equality asserted in-run"
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("TEXT_NATIVE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"TEXTAB lines composed $clMed%.3f native $nlMed native_min $nlMin")
    println(json)
    spark.stop()
  }
}
