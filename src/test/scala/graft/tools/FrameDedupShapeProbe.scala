package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Multimodal

/** Scratch probe (round 13): q134 shape A/B in ONE window — the typed
  * mapPartitions-decode + persist path (r12) vs the native-fingerprint meta
  * + localCheckpoint path. Interleaved reps so host drift hits both.
  */
object FrameDedupShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir).documents
    def typedPath() = Multimodal.frameDupPairs(Multimodal.decodeAssets(spark, docs))
    def metaPath() = {
      val fp = graft.expressions.TextStats.fingerprintCol(spark)(col("text"))
      val meta = docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
      Multimodal.frameDupPairsMeta(meta, 2, 2048, 2, 1024)
    }
    def once(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().collect()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache(); System.gc()
      dt
    }
    def metaWide() = {
      val fp = graft.expressions.TextStats.fingerprintCol(spark)(col("text"))
      val meta = docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
      Multimodal.frameDupPairsMeta(meta, 2, 1 << 20, 2, 1024)
    }
    // decomposition of the wide-space path: fold, +explode+distinct,
    // +window cap, full (checkpoint + self-join + agg)
    def meta0 = {
      val fp = graft.expressions.TextStats.fingerprintCol(spark)(col("text"))
      docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
    }
    def foldOnly() = meta0.groupBy().agg(sum("checksum").as("s"))
    def postings() = meta0
      .select(col("doc_id"), col("checksum"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_idx"))
      .select(col("doc_id"),
        ((col("checksum") * 131L + col("frame_idx").cast("long") * 2654435761L)
          % (1 << 20)).as("fp"))
      .distinct()
    def capped() = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")
      postings().withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 1024)
        .groupBy().agg(count(lit(1)).as("n"))
    }
    once(typedPath _); once(metaPath _); once(metaWide _) // warm
    val rows = (1 to 5).map(_ => (once(typedPath _), once(metaPath _), once(metaWide _)))
    val (ts, ms, ws) = rows.unzip3
    println(f"FRAMEPROBE typed    min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    println(f"FRAMEPROBE meta     min=${ms.min}%.3f med=${ms.sorted.apply(2)}%.3f")
    println(f"FRAMEPROBE metaWide min=${ws.min}%.3f med=${ws.sorted.apply(2)}%.3f  rows=${metaWide().count()}")
    for ((n, f) <- Seq(("fold", foldOnly _), ("postings", postings _), ("capped", capped _))) {
      once(f)
      val xs = (1 to 5).map(_ => once(f))
      println(f"FRAMEPROBE $n%-9s min=${xs.min}%.3f med=${xs.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
