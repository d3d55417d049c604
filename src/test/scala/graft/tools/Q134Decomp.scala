package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Per-stage decomposition of q134's wall (round 15, What's-wrong #1
  * follow-through): the query is (1) corpus scan + planted-dup union +
  * native graft_fingerprint fold + n_frames derivation, (2) frame-fp
  * explode + per-fp bounded posting aggregate emitting (a<b) combos,
  * (3) pair count + threshold + presentation. Legs are cumulative plans
  * drained through count() so each adds exactly one stage's work on top
  * of the previous; interleaved reps, medians. Writes Q134_DECOMP.json —
  * the committed evidence for whether the wall is the text-fold scan both
  * engines pay (floor-like) or the pair machinery (plan work to shave).
  */
object Q134Decomp {
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

    def meta(s: SparkSession) = {
      val docs0 = Tables(s, sfDir).documents.select(col("doc_id"), col("text"))
      val docs = docs0.unionByName(docs0.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      val fp = graft.expressions.TextStats.fingerprintCol(s)(col("text"))
      docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
    }
    def fps(s: SparkSession) = meta(s).select(col("doc_id"),
      explode(expr(
        "array_distinct(transform(sequence(0, n_frames - 1, 2), " +
          "i -> (checksum * 131L + CAST(i AS BIGINT) * 2654435761L) % 1048576))")).as("fp"))
    // r17: the shipped posting stage is the FUSED pair emitter
    // (graft_posting_pairs — heap + size filter + combination HOFs in one
    // eval; Q134_FUSE_AB.json), so the cumulative leg measures that
    def postings(s: SparkSession) = {
      graft.expressions.PostingPairs.register(s)
      fps(s).groupBy("fp").agg(expr("graft_posting_pairs(doc_id, 1024)").as("ds"))
    }
    def full(s: SparkSession) =
      SparkEntry.freshQueries("q134_multimodal_frame_dedup")(s, sfDir)

    def time(f: => Long): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }
    // drain through aggregates over the DERIVED columns — a bare count()
    // lets Catalyst prune the fingerprint fold entirely (the round-5
    // scale-probe lesson), which inverted the legs on first run
    val legs = Seq(
      "scan_fingerprint_meta" -> (() =>
        meta(spark).agg(sum(col("checksum"))).collect()(0).getLong(0)),
      "plus_fp_explode" -> (() =>
        fps(spark).agg(sum(col("fp")), count(lit(1))).collect()(0).getLong(1)),
      "plus_posting_agg" -> (() =>
        postings(spark).agg(sum(size(col("ds")))).collect()(0).getLong(0)),
      "full_query" -> (() => full(spark).count()))
    val out = legs.map { case (n, f) => n -> time(f()) }
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps,\n" +
      out.map { case (n, t) => f""" "$n%s": $t%.3f""" }.mkString(",\n") +
      ",\n \"note\": \"cumulative plans drained via count(), med-of-" +
      reps + "; full_query includes the pair aggregate + threshold + " +
      "presentation merge\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q134_DECOMP.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.foreach { case (n, t) => println(f"Q134DECOMP $n%-24s $t%.3f s") }
    spark.stop()
  }
}
