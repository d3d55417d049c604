package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measured storage posture for q115's gram-table persist (round 16,
  * verdict Missing #3): `containmentPairs` holds the dedup family's only
  * input-sized cache (docs × one distinct-gram array, five consumers the
  * exchange-reuse rule can't unify). Sweep the three postures through the
  * PUBLIC operator (conf `spark.graft.containmentGramStorage`) at the
  * sf1-scale corpus and the 10× point:
  *   - MEMORY_AND_DISK — the shipped default
  *   - DISK_ONLY       — the executor-memory-relief posture
  *   - NONE            — no cache: the gram expression recomputes per
  *                       consumer (what persist degrades to under total
  *                       memory pressure, so its cost bounds the downside)
  * Interleaved reps, medians + mins; pair counts asserted identical across
  * postures per corpus. Writes Q115_PERSIST_AB.json — the committed
  * arithmetic behind the 100 TB stance.
  */
object Q115PersistAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/tmp/graft_scale100"
    def ensure(path: String)(build: => DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val postures = Seq("MEMORY_AND_DISK", "DISK_ONLY", "NONE")

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    for (mult <- Seq(10, 100)) {
      val docs = ensure(s"$base/docs_$mult")(ProbeFixtures.cipheredDocs(spark, mult))
      val nDocs = docs.count()
      // one warm pass per posture first (staging + JIT), then interleave
      val counts = scala.collection.mutable.Map[String, Long]()
      def once(p: String): Double = {
        spark.conf.set("spark.graft.containmentGramStorage", p)
        try {
          val t0 = System.nanoTime()
          val n = Dedup.containmentPairs(docs, "doc_id", n = 3,
            kRare = 4, minOverlap = 0.5).count()
          val dt = (System.nanoTime() - t0) / 1e9
          counts.get(p) match {
            case Some(prev) => require(prev == n, s"pair count moved: $prev vs $n")
            case None =>
              counts(p) = n
              counts.values.toSet.toList match {
                case all if all.toSet.size > 1 =>
                  throw new IllegalStateException(
                    s"postures disagree on pair count: $counts")
                case _ =>
              }
          }
          dt
        } finally {
          spark.conf.unset("spark.graft.containmentGramStorage")
          spark.sharedState.cacheManager.clearCache()
          System.gc()
        }
      }
      postures.foreach(once) // warm
      val samples = postures.map(_ -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
      for (_ <- 1 to reps; p <- postures) samples(p) += once(p)
      for (p <- postures) {
        val ts = samples(p).sorted
        val med = ts(ts.size / 2)
        out(s"x${mult}_${p}") =
          f"""{"med": $med%.3f, "min": ${ts.head}%.3f, "pairs": ${counts(p)}, "docs": $nDocs}"""
        println(f"Q115PERSIST x$mult%-4d $p%-16s med=$med%.3f min=${ts.head}%.3f pairs=${counts(p)}")
      }
    }
    val json = "{\n \"reps\": " + reps + ",\n" +
      out.map { case (k, v) => s""" "$k": $v""" }.mkString(",\n") +
      ",\n \"note\": \"containmentPairs end-to-end (count-drained) through the public operator with spark.graft.containmentGramStorage swept; corpora are the Scale100 ciphered-docs decades (x10 = sf1-scale, x100 = 10x that). Interleaved reps, cache cleared + GC between runs, pair counts asserted identical across postures. NONE bounds the degrade-to-recompute downside persist carries under memory pressure.\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q115_PERSIST_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
