package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{SparkEntry, Tables}

/** q134 singleton-fingerprint prefilter probe (r17 verdict What's-wrong
  * #2): after the r17 fusion, `Q134_DECOMP.json` puts the remaining wall
  * in the text-fold scan plus the posting exchange over ~10⁶
  * singleton-dominated fp cells — k=1 posting partials that cross the
  * exchange and produce zero pairs. The one unprobed idea: a narrow
  * per-fp count pass first, keep only fps with ≥2 docs (pairs can only
  * arise there — exact, not approximate), and posting-aggregate the
  * survivors.
  *
  * Arms (interleaved med-of-reps, rows asserted identical to shipped):
  *  A `shipped`          — committed single-exchange fused posting plan.
  *  B `prefilter`        — count pass → BROADCAST the multi-doc fp set
  *                         back as an inner join on the re-derived fps →
  *                         posting aggregate on survivors. Recomputes the
  *                         text fold twice (the honest cost of a second
  *                         pass without a persist). The broadcast-back is
  *                         the BEST CASE for the prefilter: at 100 TB the
  *                         multi-fp set is corpus-proportional and would
  *                         need a shuffled semi or a capped bloom, both
  *                         strictly worse — so a loss here is a loss
  *                         everywhere.
  *  C `prefilter_cached` — B with the (doc_id, fp) intermediate persisted
  *                         (MEMORY_AND_DISK) so the text fold runs once;
  *                         pays the materialization + eviction risk the
  *                         q117 persist probe measured instead.
  *
  * Writes Q134_PREFILTER_AB.json with a self-adjudicating conclusion.
  */
object Q134PrefilterAB {
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

    val buckets = 1 << 20
    val maxPosting = 1024
    val minShared = 2

    // the q134 derivation up to the exploded (doc_id, fp) frame — same
    // rekey + fingerprint fold the committed query runs
    def fps(s: SparkSession): DataFrame = {
      val docs0 = Tables(s, sfDir).documents.select(col("doc_id"), col("text"))
      val docs = docs0.unionByName(docs0.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      val fp = graft.expressions.TextStats.fingerprintCol(s)(col("text"))
      docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
        .select(col("doc_id"),
          explode(expr(
            s"array_distinct(transform(sequence(0, n_frames - 1, 2), " +
              s"i -> (checksum * 131L + CAST(i AS BIGINT) * 2654435761L) % $buckets))"))
            .as("fp"))
    }

    def pairsOf(survivors: DataFrame, s: SparkSession): DataFrame = {
      graft.expressions.PostingPairs.register(s)
      survivors.groupBy("fp")
        .agg(expr(s"graft_posting_pairs(doc_id, $maxPosting)").as("pp"))
        .select(explode(col("pp")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .select(shiftright(col("p"), 32).as("a"),
          col("p").bitwiseAND(lit(4294967295L)).as("b"), col("shared"))
        .orderBy("a", "b")
    }

    def prefilter(cached: Boolean): DataFrame = {
      val s = spark.newSession()
      val base = fps(s)
      val f = if (cached) base.persist(StorageLevel.MEMORY_AND_DISK) else base
      val multi = f.groupBy("fp").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("fp")
      pairsOf(f.join(broadcast(multi), Seq("fp")), s)
    }

    val shipped = SparkEntry.queries("q134_multimodal_frame_dedup")
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "shipped" -> (() => shipped(spark.newSession(), sfDir)),
      "prefilter" -> (() => prefilter(cached = false)),
      "prefilter_cached" -> (() => prefilter(cached = true)))

    def drain(name: String, df: DataFrame): Array[String] = {
      val out = df.collect().map(_.toString)
      // cached arm: drop the persisted intermediate so the next fresh plan
      // re-pays materialization like a real one-shot run
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      out
    }

    val rows = arms.map { case (n, f) => n -> drain(n, f()).sorted.toSeq }
    val ref = rows.head._2
    rows.foreach { case (n, r) =>
      require(r == ref, s"arm $n rows differ: ${r.size} vs ${ref.size}")
    }
    println(s"Q134PF rows identical across ${arms.size} arms: ${ref.size}")

    arms.foreach { case (n, f) => drain(n, f()) } // warm the plan shapes
    val ts = Array.fill(arms.size)(Vector.newBuilder[Double])
    var i = 0
    while (i < reps) {
      var j = 0
      while (j < arms.size) {
        val t0 = System.nanoTime()
        drain(arms(j)._1, arms(j)._2())
        ts(j) += (System.nanoTime() - t0) / 1e9
        j += 1
      }
      i += 1
    }
    def med(v: Vector[Double]): Double = { val s = v.sorted; s(s.length / 2) }
    val meds = arms.map(_._1).zip(ts.map(b => med(b.result())))
    val m = meds.toMap
    val conclusion =
      if (m("prefilter") >= m("shipped") && m("prefilter_cached") >= m("shipped"))
        f"REJECTION: the singleton prefilter loses in both forms " +
          f"(uncached ${m("prefilter") - m("shipped")}%+.3f s, cached " +
          f"${m("prefilter_cached") - m("shipped")}%+.3f s vs shipped) — " +
          "the fp column is narrow enough that the count pass costs more " +
          "than the singleton partials it removes; q134 is floor-" +
          "classified for good with every avenue measured"
      else "a prefilter form beat shipped — promote it"
    val body = meds.map { case (n, t) => f""" "${n}_sec": $t%.3f""" }
      .mkString(",\n")
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps," +
      s" \"rows\": ${ref.size},\n" + body + ",\n" +
      s""" "conclusion": "$conclusion",""" + "\n" +
      " \"note\": \"interleaved med-of-" + reps + " fresh plans, rows " +
      "asserted identical; cached arm unpersists between runs so every " +
      "sample re-pays materialization. The prefilter keeps only fps with " +
      ">=2 docs (exact: pairs arise only there) via a narrow count pass " +
      "and a broadcast-back inner join - the prefilter's BEST case; at " +
      "100TB the multi-fp set is corpus-proportional and needs a shuffled " +
      "semi or capped bloom, both strictly worse, so a loss here closes " +
      "the idea at all scales.\"\n}\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("Q134_PREFILTER_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    meds.foreach { case (n, t) => println(f"Q134PF $n%-18s $t%.3f s") }
    spark.stop()
  }
}
