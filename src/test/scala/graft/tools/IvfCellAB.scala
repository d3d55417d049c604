package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.Similarity
import graft.functions.VectorFunctions

/** Scratch A/B (r20): IVF cell-assignment shape — OLD heap-topK(k=1) +
  * join-back vs NEW single max_by aggregation (the shipped
  * `Similarity.ivfCellRowsFrom`). Arms alternate in one window over the
  * same trained centroids; row-identity asserted each rep. Args: [reps].
  */
object IvfCellAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.sql.warehouse.dir",
          sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
            graft.StageDir.scratchBase + "/graft_warehouse"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val cent = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 16, 2)
    val cos = VectorFunctions.cosineNative(spark) _
    val nrm = VectorFunctions.normNative(spark)(_)
    val rnd = VectorFunctions.roundNative(spark) _

    def oldShape(df: DataFrame): DataFrame =
      Similarity.topKPerGroup(
        df.select(col("vec_id").as("c_id"), col("embedding"))
          .join(broadcast(cent))
          .select(col("c_id"), col("cent_id"),
            rnd(cos(col("embedding"), col("cvec")), 6).as("s")),
        "c_id", "s", "cent_id", 1)
        .select(col("c_id"), col("cent_id"))
        .join(df.select(col("vec_id").as("c_id"), col("embedding").as("nv"),
          nrm(col("embedding")).as("nn")), "c_id")

    def newShape(df: DataFrame): DataFrame =
      Similarity.ivfCellRowsFrom(spark, df, "vec_id", "embedding", cent)

    // plans-only mode: write the two shapes' formatted physical plans for
    // the round's plan-evidence deliverable, then exit
    if (args.contains("plans")) {
      val dir = java.nio.file.Paths.get("plans/r20")
      java.nio.file.Files.createDirectories(dir)
      def planOf(df: DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "\n"
      java.nio.file.Files.write(dir.resolve("q129_cellrows_before.txt"),
        planOf(oldShape(corpus)).getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("q129_cellrows_after.txt"),
        planOf(newShape(corpus)).getBytes("UTF-8"))
      println("IVFCELLAB plans written")
      spark.stop(); return
    }
    // row identity (sorted collect compare on (c_id, cent_id))
    val a = oldShape(corpus).select("c_id", "cent_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = newShape(corpus).select("c_id", "cent_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    require(a.sameElements(b), s"cell assignment diverged: old=${a.length} new=${b.length}")
    println(s"IVFCELLAB identity ok over ${a.length} rows")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(oldShape(corpus)); noop(newShape(corpus)) // warm
    val acc = scala.collection.mutable.Map("old" -> List.empty[Double],
      "new" -> List.empty[Double])
    for (_ <- 1 to reps; arm <- Seq("old", "new")) {
      val t0 = System.nanoTime()
      noop(if (arm == "old") oldShape(corpus) else newShape(corpus))
      acc(arm) = (System.nanoTime() - t0) / 1e9 :: acc(arm)
    }
    for ((arm, ts0) <- acc.toSeq.sortBy(_._1)) {
      val ts = ts0.sorted
      println(f"IVFCELLAB $arm med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
