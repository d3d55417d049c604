package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Similarity

/** Scratch probe (r19): leg decomposition of q137 (stream IVF append) and
  * q129 (persisted IVF search) — splits index build (centroid + cells
  * writes), the streamed/batch append, and the search so optimization
  * targets the dominant leg. Args: [reps].
  */
object Q137Legs {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, sfDir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val queries = emb.filter(col("vec_id") <= 5)
    val incr = emb.filter(col("vec_id") % 5 === 0)
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm everything once through the declared paths
    SparkEntry.freshQueries("q137_stream_ivf_append")(spark, sfDir).collect()
    SparkEntry.freshQueries("q129_similarity_ivf_persisted")(spark, sfDir).collect()
    (1 to reps).foreach { i =>
      val tBuild = t(Similarity.buildIvfIndex(spark, corpus, "vec_id", "embedding", "legs"))
      val tAppend = t(Similarity.appendIvfSegment(spark, incr, "vec_id", "embedding", "legs", 0L))
      val tSearch = t(Similarity.searchIvfIndex(spark, queries, "vec_id", "embedding",
        "legs", k = 3, nprobe = 4).collect())
      val tQ137 = t(SparkEntry.freshQueries("q137_stream_ivf_append")(spark, sfDir).collect())
      val tQ129 = t(SparkEntry.freshQueries("q129_similarity_ivf_persisted")(spark, sfDir).collect())
      println(f"Q137LEGS rep=$i build=$tBuild%.3f segappend=$tAppend%.3f search=$tSearch%.3f q137=$tQ137%.3f q129=$tQ129%.3f")
    }
    spark.stop()
  }
}
