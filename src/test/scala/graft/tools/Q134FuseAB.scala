package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.Present.PresentationOrdering

/** A/B for q134's posting stage fusion (round 17, verdict task #2):
  * `Q134_DECOMP.json` puts 0.32 s of the 0.61 s sf1 wall in the posting
  * aggregate + pair emission over ~10⁵ tiny rows — the per-stage machinery
  * the q102 packed-long fold eliminated for an identical exchange+fold
  * shape. Arm A is the shipped query (graft_smallest_k → size filter →
  * nested HOF combination transforms → struct explode → two-column pair
  * aggregate). Arm B fuses heap + filter + combination emission into ONE
  * aggregate eval (`graft_posting_pairs`) emitting packed `(a<<32)|b`
  * longs, so the pair-count exchange keys on a single primitive long and
  * the HOF/struct stages disappear. Row identity asserted once via full
  * sorted-collect equality, then interleaved timed reps, medians.
  * Writes Q134_FUSE_AB.json — ship on a win, or commit the rejection and
  * q134 is floor-classified for good.
  */
object Q134FuseAB {
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

    def armA: DataFrame =
      SparkEntry.freshQueries("q134_multimodal_frame_dedup")(spark, sfDir)

    // arm B: same corpus + fp derivation as frameDupPairsMeta, fused pairs
    def armB: DataFrame = {
      val docs0 = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
      val docs = docs0.unionByName(docs0.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      val fp = graft.expressions.TextStats.fingerprintCol(spark)(col("text"))
      val meta = docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
      val fps = meta.select(col("doc_id"),
        explode(expr(
          "array_distinct(transform(sequence(0, n_frames - 1, 2), " +
            "i -> (checksum * 131L + CAST(i AS BIGINT) * 2654435761L) % 1048576))")).as("fp"))
      graft.expressions.PostingPairs.register(spark)
      fps.groupBy("fp")
        .agg(expr("graft_posting_pairs(doc_id, 1024)").as("pp"))
        .select(explode(col("pp")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(shiftright(col("p"), 32).as("a"),
          col("p").bitwiseAND(lit(4294967295L)).as("b"), col("shared"))
        .presented("a", "b")
    }

    // row identity: full sorted-collect equality, once
    val ra = armA.orderBy("a", "b").collect().map(_.toString)
    val rb = armB.orderBy("a", "b").collect().map(_.toString)
    require(ra.length == rb.length && ra.sameElements(rb),
      s"arm rows differ: A ${ra.length} rows vs B ${rb.length} rows")
    println(s"Q134FUSE rows identical: ${ra.length}")

    // interleaved timed reps (host-phase fairness), med-of-reps
    val (tsA, tsB) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    armA.count(); armB.count() // warm both plans
    var i = 0
    while (i < reps) {
      val a0 = System.nanoTime(); armA.count(); tsA(i) = (System.nanoTime() - a0) / 1e9
      val b0 = System.nanoTime(); armB.count(); tsB(i) = (System.nanoTime() - b0) / 1e9
      i += 1
    }
    def med(ts: Array[Double]): Double = { val s = ts.sorted; s(s.length / 2) }
    val (ma, mb) = (med(tsA), med(tsB))
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps, \"rows\": ${ra.length},\n" +
      f""" "armA_shipped_hof_sec": $ma%.3f, "armB_fused_packed_sec": $mb%.3f,%n""" +
      f""" "speedup": ${ma / mb}%.3f,%n""" +
      " \"note\": \"interleaved med-of-" + reps + "; A = graft_smallest_k + " +
      "size filter + nested HOF combos + struct pair agg; B = graft_posting_pairs " +
      "fused eval emitting packed (a<<32)|b longs, single-long pair-count key; " +
      "rows asserted identical by full sorted collect\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q134_FUSE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(f"Q134FUSE armA $ma%.3f s  armB $mb%.3f s  speedup ${ma / mb}%.3f")
    spark.stop()
  }
}
