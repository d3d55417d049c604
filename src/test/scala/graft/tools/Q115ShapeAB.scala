package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Three-way shape A/B for q115's candidate stage (r15, after Q115Legs
  * blamed the df join and the bounded aggregates alone measured
  * wall-neutral because the join evaluates once per consumer):
  *   A current   — withDf (hinted) feeds rare AND postings (join ×2)
  *   B persist   — withDf persisted, join evaluated once
  *   C combined  — ONE shingle aggregate emits (df, capped postings);
  *                 the join (hinted) only feeds rare, postings come from
  *                 the aggregate directly (join ×1, dfreq agg folded)
  * Rows asserted identical; full candidate+verify pipeline timed.
  * Writes Q115_SHAPE_AB.json.
  */
object Q115ShapeAB {
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
    graft.expressions.GraftFunctions.registerAll(spark)
    val (kRare, maxBucket, minOverlap) = (4, 1024, 0.5)

    def grams() = graft.Tables(spark, sfDir).documents
      .filter(graft.operators.TextAnalysis.wsTokenCount(col("text")) >= 3)
      .select(col("doc_id"),
        graft.expressions.TextSignatures.wordNgramsCol(spark)(
          col("text"), 3, distinct = true).as("g"))
      .persist()

    def verifyStage(g: DataFrame, candidates: DataFrame): DataFrame =
      candidates
        .join(g.select(col("doc_id").as("a"), col("g").as("ga")), "a")
        .join(g.select(col("doc_id").as("b"), col("g").as("gb")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("ga"), col("gb"))).cast("double") /
            least(size(col("ga")), size(col("gb"))).cast("double")).as("_ov"))
        .filter(col("_ov") >= minOverlap)
        .select(col("a"), col("b"))

    def variantA(): DataFrame = {
      val g = grams()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val withDf = ex.join(dfreq.hint("shuffle_hash"), "sh")
      val rare = withDf.groupBy(col("doc_id"))
        .agg(expr(s"graft_smallest_k_pairs(df, sh, $kRare)").as("_rs"))
        .select(col("doc_id").as("a"), explode(col("_rs.s")).as("sh"))
      val postings = withDf.groupBy("sh")
        .agg(expr(s"graft_smallest_k(doc_id, $maxBucket)").as("_bs"))
        .select(col("sh"), explode(col("_bs")).as("b"))
      val candidates = rare.join(postings, "sh")
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .dropDuplicates("a", "b")
      verifyStage(g, candidates)
    }

    def variantB(): (DataFrame, DataFrame) = {
      val g = grams()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfreq = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val withDf = ex.join(dfreq.hint("shuffle_hash"), "sh")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rare = withDf.groupBy(col("doc_id"))
        .agg(expr(s"graft_smallest_k_pairs(df, sh, $kRare)").as("_rs"))
        .select(col("doc_id").as("a"), explode(col("_rs.s")).as("sh"))
      val postings = withDf.groupBy("sh")
        .agg(expr(s"graft_smallest_k(doc_id, $maxBucket)").as("_bs"))
        .select(col("sh"), explode(col("_bs")).as("b"))
      val candidates = rare.join(postings, "sh")
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .dropDuplicates("a", "b")
      (verifyStage(g, candidates), withDf)
    }

    def variantC(): DataFrame = {
      val g = grams()
      val ex = g.select(col("doc_id"), explode(col("g")).as("sh"))
      val dfPost = ex.groupBy("sh")
        .agg(count(lit(1)).as("df"),
          expr(s"graft_smallest_k(doc_id, $maxBucket)").as("_bs"))
      val rare = ex.join(dfPost.select(col("sh"), col("df")).hint("shuffle_hash"), "sh")
        .groupBy(col("doc_id"))
        .agg(expr(s"graft_smallest_k_pairs(df, sh, $kRare)").as("_rs"))
        .select(col("doc_id").as("a"), explode(col("_rs.s")).as("sh"))
      val postings = dfPost.select(col("sh"), explode(col("_bs")).as("b"))
      val candidates = rare.join(postings, "sh")
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .dropDuplicates("a", "b")
      verifyStage(g, candidates)
    }

    def rows(df: DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ra = rows(variantA())
    val (vb, cached) = variantB()
    val rb = rows(vb); cached.unpersist(true)
    val rc = rows(variantC())
    require(ra == rb && ra == rc, s"variants differ: ${ra.size}/${rb.size}/${rc.size}")

    def time(f: => Unit): (Double, Double) = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (ts(ts.size / 2), ts.head)
    }
    val (aMed, aMin) = time(variantA().collect())
    val (bMed, bMin) = time { val (df, c) = variantB(); df.collect(); c.unpersist(true) }
    val (cMed, cMin) = time(variantC().collect())
    val json =
      f"""{
         | "sf": "$sfDir", "reps": $reps, "pairs": ${ra.size},
         | "A_join_twice_med_s": $aMed%.3f, "A_min_s": $aMin%.3f,
         | "B_persist_withdf_med_s": $bMed%.3f, "B_min_s": $bMin%.3f,
         | "C_combined_agg_med_s": $cMed%.3f, "C_min_s": $cMin%.3f,
         | "note": "full candidate+verify pipeline per variant, rows asserted identical; C folds dfreq + capped postings into one shingle aggregate so the hinted df join evaluates once (rare only)"
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("Q115_SHAPE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
