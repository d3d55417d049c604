package graft.operators
// (in graft.operators for topKPerGroup access — a scratch probe)

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe: phase breakdown of q129 (persisted-IVF deployment form)
  * at a given SF dir — train/write-centroids, corpus cell write, search,
  * append — to locate where the sf1 wall goes. Args: [sfDir].
  */
object IvfPersistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, dir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val queries = emb.filter(col("vec_id") % 5 === 0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"IVFPHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd")
      val full = t("full_query") {
        Similarity.ivfSearchOverPersistedIndex(spark, corpus, queries,
          "vec_id", "embedding", "probe129", k = 3).collect()
      }
      println(s"rows=${full.length}")
      // operator-faithful decomposition with the round-11 join order
      val cos = graft.functions.VectorFunctions.cosineNative(spark) _
      val dot = graft.functions.VectorFunctions.dotNative(spark) _
      val nrm = graft.functions.VectorFunctions.normNative(spark)(_)
      val rnd6 = graft.functions.VectorFunctions.roundNative(spark) _
      val cent = t("kmeans_cached") {
        Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 16, 2)
      }
      def assignTo(df: DataFrame, idAs: String): DataFrame =
        Similarity.topKPerGroup(
          df.select(col("vec_id").as(idAs), col("embedding"))
            .join(broadcast(cent))
            .select(col(idAs), col("cent_id"),
              rnd6(cos(col("embedding"), col("cvec")), 6).as("s")),
          idAs, "s", "cent_id", 1)
          .select(col(idAs), col("cent_id"))
      val cellsDf = t("cells_build_checkpoint") {
        assignTo(corpus, "c_id")
          .join(corpus.select(col("vec_id").as("c_id"), col("embedding").as("nv"),
            nrm(col("embedding")).as("nn")), "c_id")
          .localCheckpoint(true)
      }
      val probes = t("probes_checkpoint") {
        Similarity.topKPerGroup(
          queries.select(col("vec_id").as("q_id"), col("embedding"))
            .join(broadcast(cent))
            .select(col("q_id"), col("cent_id"),
              rnd6(cos(col("embedding"), col("cvec")), 6).as("s")),
          "q_id", "s", "cent_id", 4)
          .select(col("q_id"), col("cent_id"))
          .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
            nrm(col("embedding")).as("qn")), "q_id")
          .localCheckpoint(true)
      }
      val scoredDf = probes.join(cellsDf, "cent_id")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id").as("n_id"),
          rnd6(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("sim"))
      t("scored_noop") { scoredDf.write.mode("overwrite").format("noop").save() }
      val topk = t("topk_collect") {
        Similarity.topKPerGroup(scoredDf, "q_id", "sim", "n_id", 3).collect()
      }
      println(s"topk rows=${topk.length}")
      // table-backed legs: what saveAsTable/bucketed-read add over checkpoints
      t("cells_saveAsTable") {
        graft.StageDir.dropManagedTable(spark, "probe129_cells")
        cellsDf.write.mode("overwrite").format("parquet")
          .bucketBy(8, "cent_id").sortBy("cent_id").saveAsTable("probe129_cells")
      }
      val scoredTbl = probes.join(spark.table("probe129_cells"), "cent_id")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id").as("n_id"),
          rnd6(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("sim"))
      t("scored_from_table_noop") { scoredTbl.write.mode("overwrite").format("noop").save() }
      t("topk_from_table") {
        Similarity.topKPerGroup(scoredTbl, "q_id", "sim", "n_id", 3).collect()
      }
      t("append_increment") {
        assignTo(queries, "c_id")
          .join(queries.select(col("vec_id").as("c_id"), col("embedding").as("nv"),
            nrm(col("embedding")).as("nn")), "c_id")
          .write.mode("append").format("parquet")
          .bucketBy(8, "cent_id").sortBy("cent_id").saveAsTable("probe129_cells")
      }
      if (rnd == 2) println(Similarity.topKPerGroup(scoredDf, "q_id", "sim", "n_id", 3)
        .queryExecution.executedPlan.toString.take(4000))
      
    }
    spark.stop()
  }
}
