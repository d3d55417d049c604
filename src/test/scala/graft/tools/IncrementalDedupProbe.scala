package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev tool: measures the q113 incremental-dedup claim directly — per-run
  * cost is proportional to the INCREMENT, not the corpus. A FIXED 500-doc
  * increment is gated against corpora of 5k / 50k / 500k docs whose band
  * tables and text projections are PRE-STAGED parquet (the deployment's
  * persisted artifacts, built once when docs enter the corpus — unmeasured
  * here, exactly as a daily pipeline never re-bands its corpus).
  *
  * The increment reuses copy 0's texts under fresh ids, so every increment
  * doc has exactly its planted counterparts in the corpus at ANY scale
  * (the substitution-cipher copies share no shingles — see
  * [[ProbeFixtures.cipheredDocs]]), keeping the verify tier
  * increment-sized and making match count a scale-invariant correctness
  * check (printed per point).
  *
  * Unlike [[Scale100Probe]], auto-broadcast stays ON: broadcasting the
  * (tiny) increment band table IS the design point — the corpus side is
  * then scanned and hash-probed but never shuffled, so shuffle bytes stay
  * flat as the corpus grows 100×. Wall grows with the (columnar, cheap)
  * corpus scan; the artifact records both so the claim is auditable:
  * shuffle exponent ≈ 0 is the headline, the wall exponent prices the
  * scan. Writes `SCALE_INCR_DEDUP.json`.
  */
object IncrementalDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        totalShuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val base = "/tmp/graft_scale100"
    def ensure(path: String)(build: => org.apache.spark.sql.DataFrame) = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    // fixed increment: copy 0's first 500 texts under fresh ids ≥ 2e9
    val increment = ensure(s"$base/incr_500") {
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(col("doc_id") < 500)
        .withColumn("doc_id", col("doc_id") + lit(2000000000L))
    }
    increment.count() // materialize outside timing

    final case class M(mult: Int, corpusRows: Long, wallS: Double,
                       matches: Long, shuffleMb: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]

    // warm-up (JIT + codegen) on the smallest corpus — not measured
    var warm = true
    for (mult <- Seq(1, 1, 10, 100)) {
      val docs = ensure(s"$base/docs_$mult")(ProbeFixtures.cipheredDocs(spark, mult))
      val bands = ensure(s"$base/docs_${mult}_bands")(
        graft.operators.Dedup.minhashBandTable(docs, "doc_id")
          .withColumnRenamed("doc_id", "old_id"))
      val texts = ensure(s"$base/docs_${mult}_texts")(
        docs.select(col("doc_id").as("old_id"), col("text").as("ta")))
      val corpusRows = docs.count()
      Thread.sleep(300)
      totalShuffle.set(0)
      val t0 = System.nanoTime()
      val matches = graft.operators.Dedup.incrementalMinhashMatchesPrebanded(
        bands, texts, increment, "doc_id", jaccardThreshold = 0.5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      if (warm) { warm = false }
      else {
        val m = M(mult, corpusRows, wall, matches, totalShuffle.get() / 1e6)
        results += m
        println(f"INCRDEDUP x${m.mult}%-4d corpus=${m.corpusRows}%-8d wall=${m.wallS}%6.2f s " +
          f"matches=${m.matches}%-6d shuffleMb=${m.shuffleMb}%8.2f")
      }
    }

    def j(d: Double) = f"$d%.3f"
    val (f0, l0) = (results.head, results.last)
    val span = math.log(l0.corpusRows.toDouble / f0.corpusRows)
    val artifact =
      s"""{"probe":"incremental_dedup","base_sf":"sf0.1","cores":32,"increment_docs":500,""" +
        s""""protocol":"fixed 500-doc increment vs pre-banded persisted corpus (bands+texts parquet, built unmeasured); auto-broadcast ON (the design point); one run per point after a warm-up",""" +
        s""""measurements":[${results.map(m =>
          s"""{"mult":${m.mult},"corpus_rows":${m.corpusRows},"wall_s":${j(m.wallS)},""" +
            s""""matches":${m.matches},"shuffle_mb":${j(m.shuffleMb)}}""").mkString(",")}],""" +
        s""""exponents":{"wall":${j(math.log(l0.wallS / f0.wallS) / span)},""" +
        s""""shuffle":${j(math.log(math.max(l0.shuffleMb, 0.01) / math.max(f0.shuffleMb, 0.01)) / span)}}}"""
    Files.write(Paths.get("SCALE_INCR_DEDUP.json"),
      (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(artifact)
    spark.stop()
  }
}
