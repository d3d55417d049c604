package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for q122's quantization claims, writing
  * `SCALE_QUANT.json`. Two measurements at 5k → 50k → 500k vectors
  * (embeddings ×1/×10/×100, disjoint ids):
  *
  *  - `quantize_codes`: the int8 code projection evaluated through the
  *    noop sink — the claim is MAP-ONLY (zero shuffle) and linear wall;
  *  - `quantized_lsh_topk`: the composition claim ("quantization changes
  *    the payload, not the search strategy") made concrete — LSH-bucketed
  *    candidate generation over the quantized codes, integer dots, top-k.
  *    Shuffle should scale with the bucket-join row volume exactly as the
  *    float path does, with the 8-byte-code payload in place of floats.
  *
  * Same protocol as Scale100Probe: cold fresh plan per point, wall +
  * total/peak-stage shuffle bytes from a stage listener, exponents over
  * the two-decade span.
  */
object QuantScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0)
    val peakStage = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        totalShuffle.addAndGet(w)
        peakStage.getAndUpdate(p => math.max(p, w))
      }
    })

    val base = "/tmp/graft_scale_quant"
    def ensure(path: String)(build: => DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    // disjoint ids per copy; values perturbed per copy by a per-dimension
    // rotation so copies are not bitwise duplicates (a 500k-corpus of 100
    // identical slabs would make every bucket 100x denser than organic)
    def multEmb(mult: Int): DataFrame =
      spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
        .withColumn("vec_id", col("vec_id") + col("_i") * 10000000L)
        .withColumn("embedding", expr(
          """transform(embedding, (x, j) ->
               CAST(x + CAST(_i % 7 AS FLOAT) * 0.01 * CAST(CASE WHEN j % 2 = 0 THEN 1 ELSE -1 END AS FLOAT) AS FLOAT))"""))
        .drop("_i").repartition(32)

    final case class M(op: String, mult: Int, rows: Long,
                       wallS: Double, shuffleMb: Double, peakStageMb: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]
    def time(op: String, mult: Int, rows: Long)(f: => Unit): Unit = {
      Thread.sleep(300)
      totalShuffle.set(0); peakStage.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val m = M(op, mult, rows, wall, totalShuffle.get() / 1e6, peakStage.get() / 1e6)
      results += m
      println(f"SCALEQUANT ${m.op}%-20s x${m.mult}%-4d rows=${m.rows}%-9d " +
        f"wall=${m.wallS}%7.2f s shuffle=${m.shuffleMb}%9.1f MB peakStage=${m.peakStageMb}%9.1f MB")
    }
    def run(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    // warm-up (JIT, codegen, noop path) — not measured
    run(spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(size(col("embedding"))))

    val dim = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    def codes(df: DataFrame): DataFrame = df
      .select(col("vec_id"), col("embedding"),
        expr("""sqrt(aggregate(embedding, 0.0D,
                  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))""").as("_rawnm"))
      .select(col("vec_id"), col("embedding"),
        when(col("_rawnm") === 0.0d, 1.0d).otherwise(col("_rawnm")).as("_nm"))
      .select(col("vec_id"), expr(
        s"""transform(sequence(1, $dim), i ->
              CAST(floor(least(greatest(
                     CAST(element_at(embedding, i) AS DOUBLE) / _nm,
                     -1.0D), 1.0D) * 127.0D + 0.5D) AS BIGINT))""").as("c"),
        col("embedding"))

    for (mult <- Seq(1, 10, 100)) {
      val emb = ensure(s"$base/emb_$mult")(multEmb(mult))
      val n = emb.count()
      time("quantize_codes", mult, n) {
        run(codes(emb).select("vec_id", "c"))
      }
      // LSH buckets from the ORIGINAL floats (bucketing is sign-based and
      // quantization-agnostic), candidates joined on the bucket id, scored
      // with the integer dot over codes, bounded-heap top-k per query.
      time("quantized_lsh_topk", mult, n) {
        val withB = graft.operators.Similarity.withLshBucket(
          codes(emb), "embedding", 8, dim).select("vec_id", "c", "bucket")
        val q = withB.filter(col("vec_id") % 1000000 <= 5)
          .select(col("vec_id").as("q_id"), col("c").as("qc"), col("bucket"))
        val scored = withB.select(col("vec_id").as("n_id"), col("c").as("nc"), col("bucket"))
          .join(q, "bucket")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            expr("aggregate(zip_with(qc, nc, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
              .as("score"))
        // measurement-only rank (the certified path uses the bounded-heap
        // TopKByScore; a window is fine for a wall/shuffle probe)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
        run(scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3))
      }
    }

    def j(d: Double) = f"$d%.3f"
    val rows = results.map(m =>
      s"""{"op":"${m.op}","mult":${m.mult},"rows":${m.rows},"wall_s":${j(m.wallS)},""" +
        s""""shuffle_mb":${j(m.shuffleMb)},"peak_stage_mb":${j(m.peakStageMb)}}""")
    val exps = results.map(_.op).distinct.map { op =>
      val ms = results.filter(_.op == op).sortBy(_.mult)
      val (f0, l) = (ms.head, ms.last)
      val span = math.log(l.rows.toDouble / f0.rows)
      val aW = math.log(l.wallS / f0.wallS) / span
      val aS = math.log(math.max(l.shuffleMb, 0.1) / math.max(f0.shuffleMb, 0.1)) / span
      s""""$op":{"wall":${j(aW)},"shuffle":${j(aS)}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_QUANT.json"),
      (s"""{"measurements":[${rows.mkString(",")}],"exponents":{${exps.mkString(",")}}}\n""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("SCALEQUANT written SCALE_QUANT.json")
    spark.stop()
  }
}
