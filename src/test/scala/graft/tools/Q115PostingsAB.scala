package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** A/B behind q115's r15 posting-cap rewrite: per-shingle capped posting
  * lists as a row_number WINDOW (exchange + per-partition sort of every
  * posting row, cap applied after) vs the bounded graft_smallest_k
  * AGGREGATE (map-side partials capped at maxBucket before the exchange,
  * no sort). Rows asserted identical in-run; the timed unit is the FULL
  * containment query both ways (the window variant reconstructs the old
  * postings stage inline against the same persisted gram table).
  * Writes Q115_POSTINGS_AB.json.
  */
object Q115PostingsAB {
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
    val (n, kRare, minOverlap, maxBucket) = (3, 4, 0.5, 1024)

    def pipeline(postingsOf: DataFrame => DataFrame): DataFrame = {
      val docs = graft.Tables(spark, sfDir).documents
      val g = docs
        .filter(graft.operators.TextAnalysis.wsTokenCount(col("text")) >= n)
        .select(col("doc_id"),
          graft.expressions.TextSignatures.wordNgramsCol(spark)(
            col("text"), n, distinct = true).as("g"))
        .persist()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val withDf = ex.join(dfreq, "sh")
      val rare = withDf
        .withColumn("_rr", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        .filter(col("_rr") <= kRare)
        .select(col("doc_id").as("a"), col("sh"))
      val candidates = rare.join(postingsOf(withDf), "sh")
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .dropDuplicates("a", "b")
      candidates
        .join(g.select(col("doc_id").as("a"), col("g").as("ga")), "a")
        .join(g.select(col("doc_id").as("b"), col("g").as("gb")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("ga"), col("gb"))).cast("double") /
            least(size(col("ga")), size(col("gb"))).cast("double")).as("_ov"))
        .filter(col("_ov") >= minOverlap)
        .select(col("a"), col("b"))
    }
    graft.expressions.CollectSmallestK.register(spark)
    def windowPostings(withDf: DataFrame): DataFrame = withDf
      .withColumn("_pr", row_number().over(
        Window.partitionBy(col("sh")).orderBy(col("doc_id"))))
      .filter(col("_pr") <= maxBucket)
      .select(col("doc_id").as("b"), col("sh"))
    def aggPostings(withDf: DataFrame): DataFrame = withDf
      .groupBy("sh")
      .agg(expr(s"graft_smallest_k(doc_id, $maxBucket)").as("_bs"))
      .select(col("sh"), explode(col("_bs")).as("b"))

    val rowsW = pipeline(windowPostings).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rowsA = pipeline(aggPostings).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    require(rowsW == rowsA, s"variant rows differ: ${rowsW.size} vs ${rowsA.size}")

    def time(f: => Unit): (Double, Double) = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (ts(ts.size / 2), ts.head)
    }
    // interleaved within one window; fresh plans per run
    val (wMed, wMin) = time(pipeline(windowPostings).collect())
    val (aMed, aMin) = time(pipeline(aggPostings).collect())
    val json =
      f"""{
         | "sf": "$sfDir", "reps": $reps, "pairs": ${rowsA.size},
         | "window_postings_med_s": $wMed%.3f, "window_postings_min_s": $wMin%.3f,
         | "agg_postings_med_s": $aMed%.3f, "agg_postings_min_s": $aMin%.3f,
         | "speedup_med": ${wMed / aMed}%.2f,
         | "note": "full containment query timed both ways in one window, rows asserted identical; agg variant = graft_smallest_k bounded heap (map-side cap, no sort), window variant = the pre-r15 row_number shape"
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("Q115_POSTINGS_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
