package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dev tool: scale evidence for q124's semantic-dedup claims, writing
  * `SCALE_SEMANTIC.json`. Measures the PRODUCTION operator
  * ([[Dedup.semanticDedupPairs]]) at 2k → 20k → 200k vectors (embeddings
  * ×1/×10/×100, disjoint ids, per-copy value perturbation so copies are
  * not bitwise slabs) under the operator's documented at-scale discipline:
  *
  *  - `nlist` ∝ corpus (16 per 2k vectors) so mean CELL SIZE stays
  *    constant — the within-cell pair term is then linear in corpus size
  *    ((N/nlist)²·nlist with N/nlist fixed);
  *  - k-means trains on the deterministic hash SAMPLE
  *    (`trainSampleMod`, ~8 training vectors per centroid) so the
  *    training term is sample × nlist, not corpus × nlist.
  *
  * What's measured per point: wall (cold fresh plan, includes training),
  * total/peak-stage shuffle bytes, emitted pair count, and the post-hoc
  * cell-population histogram (max/mean — the hot-cell-bound context; the
  * assignment re-run for the histogram reuses the cached centroids and is
  * NOT in the timed window). The one term that is intentionally
  * super-linear is centroid ASSIGNMENT (corpus × nlist cosines — flat-IVF's
  * index-build cost, map-only, zero shuffle); the shuffle exponent is the
  * claim that the DATA-MOVEMENT cost stays linear.
  */
object SemanticScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
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

    val base = "/tmp/graft_scale_semantic"
    def ensure(path: String)(build: => DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    // Every ROW gets a hash-keyed per-(vector, dim) offset: no bitwise
    // slabs, no common per-copy component inflating within-copy
    // similarity, no cross-copy near-dup chains. The densified corpus is
    // then organically diverse, and — because nlist grows with the corpus
    // so cell population stays ~125 — the within-cell pair count scales
    // with the CELL COUNT, i.e. linearly, the pair structure a genuinely
    // grown corpus would have.
    def multEmb(mult: Int): DataFrame =
      spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
        .withColumn("vec_id", col("vec_id") + col("_i") * 10000000L)
        .withColumn("embedding", expr(
          """transform(embedding, (x, j) ->
               CAST(x + 0.05 * CAST(((vec_id % 1000003 + 1) * (CAST(j AS BIGINT) + 3) * 2654435761) % 13 - 6 AS FLOAT) AS FLOAT))"""))
        .drop("_i").repartition(32)

    final case class M(mult: Int, rows: Long, nlist: Int, trainMod: Int,
                       pairs: Long, wallS: Double, shuffleMb: Double,
                       peakStageMb: Double, cellMax: Long, cellMean: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]

    val mults = {
      val ns = args.filter(_.forall(_.isDigit)).map(_.toInt).toSeq
      if (ns.isEmpty) Seq(1, 10, 100) else ns
    }
    for (mult <- mults) {
      val emb = ensure(s"$base/emb_$mult")(multEmb(mult))
      val rows = emb.count()
      val nlist = 16 * mult
      // constant mod: every point trains on its 1/15 hash sample, ~8
      // training vectors per centroid at every scale (2000·mult/15 vectors
      // for 16·mult centroids) — the protocol string's claim holds for ALL
      // points, not just the largest
      val trainMod = 15
      Thread.sleep(300)
      totalShuffle.set(0); peakStage.set(0)
      val t0 = System.nanoTime()
      val pairs = Dedup.semanticDedupPairs(emb, "vec_id", "embedding",
        minSim = 0.35, nlist = nlist, kmeansIters = 2, maxCell = 4096,
        trainSampleMod = trainMod).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // post-hoc histogram over the CACHED centroids (untimed): the
      // hot-cell-bound context for the measured point
      val trainSet =
        if (trainMod <= 1) emb
        else emb.filter(graft.operators.Curation.portableHash(col("vec_id")) % trainMod === 0)
      val cent = Similarity.kmeansCentroids(trainSet, "vec_id", "embedding", nlist, 2)
      val cos = graft.functions.VectorFunctions.cosineNative(spark) _
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_vid").orderBy(col("_s").desc, col("cent_id"))
      val hist = emb.select(col("vec_id").as("_vid"), col("embedding").as("_v"))
        .join(broadcast(cent))
        .select(col("_vid"), col("cent_id"), round(cos(col("_v"), col("cvec")), 6).as("_s"))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .groupBy("cent_id").count()
        .agg(max("count").as("mx"), avg("count").as("mean")).head()
      val m = M(mult, rows, nlist, trainMod, pairs, wall,
        totalShuffle.get() / 1e6, peakStage.get() / 1e6,
        hist.getLong(0), hist.getDouble(1))
      results += m
      println(f"SEMSCALE x$mult%-4d rows=$rows%-8d nlist=$nlist%-5d trainMod=$trainMod%-3d " +
        f"pairs=${m.pairs}%-8d wall=${m.wallS}%7.2f s shuffleMb=${m.shuffleMb}%8.1f " +
        f"cellMax=${m.cellMax}%-6d cellMean=${m.cellMean}%7.1f")
    }

    def j(d: Double) = f"$d%.3f"
    val exps = if (results.size >= 2) {
      val (f, l) = (results.head, results.last)
      val span = math.log(l.rows.toDouble / f.rows)
      s""""wall":${j(math.log(l.wallS / f.wallS) / span)},""" +
        s""""shuffle":${j(math.log(math.max(l.shuffleMb, 0.1) / math.max(f.shuffleMb, 0.1)) / span)}"""
    } else """"wall":null,"shuffle":null"""
    val rowsJson = results.map(m =>
      s"""{"mult":${m.mult},"rows":${m.rows},"nlist":${m.nlist},"train_mod":${m.trainMod},""" +
        s""""pairs":${m.pairs},"wall_s":${j(m.wallS)},"shuffle_mb":${j(m.shuffleMb)},""" +
        s""""peak_stage_mb":${j(m.peakStageMb)},"cell_max":${m.cellMax},"cell_mean":${j(m.cellMean)}}""")
    val artifact =
      s"""{"probe":"semantic_dedup_scale","base":"sf0.1 embeddings x mult","cores":32,""" +
        s""""protocol":"cold fresh plan per point incl. sampled k-means training (nlist = 16*mult so cell size is constant; train_mod keeps ~8 training vectors per centroid); wall+shuffle from stage listener; cell histogram post-hoc over cached centroids, untimed",""" +
        s""""measurements":[${rowsJson.mkString(",")}],""" +
        s""""exponents":{$exps}}"""
    if (mults == Seq(1, 10, 100) && results.nonEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_SEMANTIC.json"),
        (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(artifact)
    spark.stop()
  }
}
