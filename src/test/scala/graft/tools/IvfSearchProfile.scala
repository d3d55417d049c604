package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Similarity

/** Decomposes the persisted-IVF search wall at a given SF: builds the index
  * once, then times (a) the full searchIvfIndex, (b) the candidate-count
  * variant (expansion without vectors/scoring), to locate the cost between
  * "candidate plumbing" and "scoring + top-k".
  */
object IvfSearchProfile {
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
    val emb = graft.Tables(spark, sfDir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val queries = emb.filter(col("vec_id") % 5 === 0)
    val tag = "profile_" + Integer.toHexString(sfDir.hashCode)

    def t(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"IVFPROF $label%-24s med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f")
    }

    val tb0 = System.nanoTime()
    Similarity.buildIvfIndex(spark, corpus, "vec_id", "embedding", tag)
    println(f"IVFPROF build once          ${(System.nanoTime() - tb0) / 1e9}%.3f")

    println("IVFPROF n_candidates = " +
      Similarity.searchCandidateCount(spark, queries, "vec_id", "embedding", tag))
    t("candidates count") {
      Similarity.searchCandidateCount(spark, queries, "vec_id", "embedding", tag)
    }
    t("full search") {
      Similarity.searchIvfIndex(spark, queries, "vec_id", "embedding", tag).collect()
    }
    // scoring without the top-k heap: force every pair's dot through a
    // plain sum so column pruning can't skip it
    t("scored sum (no heap)") {
      Similarity.scoredPairsForProfile(spark, queries, "vec_id", "embedding", tag)
        .agg(sum("sim")).collect()
    }
    // the rank-window alternative: Spark 4 plans rn<=k as a PARTIAL
    // WindowGroupLimit before the shuffle, so the wire payload matches the
    // heap's — the question is per-row cost (Tungsten sort vs object heap)
    t("window top-k") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      Similarity.scoredPairsForProfile(spark, queries, "vec_id", "embedding", tag)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .collect()
    }
    spark.stop()
  }
}
