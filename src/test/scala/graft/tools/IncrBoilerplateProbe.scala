package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cleaning

/** Dev tool: the q119 incremental-boilerplate scale claim, measured —
  * writes `SCALE_INCR_BP.json` (the `SCALE_INCR_DEDUP.json` discipline
  * applied to cleaning). A FIXED 5k-doc increment (cipher copy index 100,
  * disjoint from every corpus copy) is gated against maintained `(line,
  * df)` tables built from 5k → 50k → 500k corpus docs and persisted as
  * parquet, exactly as a deployment would read them. The claim: per-batch
  * work is the increment's lines plus one DICTIONARY-sized merge — wall
  * and shuffle grow with the distinct-line table, never with corpus TEXT
  * (which is not even readable from this probe's inputs: the corpus is
  * present only as its counts artifact).
  */
object IncrBoilerplateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
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

    val base = "/tmp/graft_incr_bp"
    def ensure(path: String)(build: => DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    // the increment: one cipher copy no corpus point contains (index 100+)
    val increment = ensure(s"$base/inc")(
      ProbeFixtures.cipheredDocs(spark, 101).filter(col("doc_id") >= 100L * 10000000L))

    final case class M(mult: Int, corpusDocs: Long, dictLines: Long,
                       wallS: Double, shuffleMb: Double, outRows: Long)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]

    // warm-up
    Cleaning.boilerplateStrip(increment, "doc_id", "text", 16, 2L).count()

    for (mult <- Seq(1, 10, 100)) {
      val docs = ensure(s"/tmp/graft_scale100/docs_$mult")(
        ProbeFixtures.cipheredDocs(spark, mult))
      val nDocs = docs.count()
      // maintained artifact: built once per corpus, read back from parquet —
      // the corpus TEXT is never an input to the timed gate below
      val counts = ensure(s"$base/counts_$mult")(
        Cleaning.lineDocFrequencies(docs, "doc_id", "text", 16))
      val dictLines = counts.count()
      Thread.sleep(300)
      totalShuffle.set(0)
      val t0 = System.nanoTime()
      val out = Cleaning.boilerplateStripIncrement(
        counts, increment, "doc_id", "text", 16, 2L).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val m = M(mult, nDocs, dictLines, wall, totalShuffle.get() / 1e6, out)
      results += m
      println(f"INCRBP x${m.mult}%-4d corpus=${m.corpusDocs}%-8d dictLines=${m.dictLines}%-9d " +
        f"wall=${m.wallS}%6.2f s shuffle=${m.shuffleMb}%8.2f MB outRows=${m.outRows}")
    }

    def j(d: Double) = f"$d%.3f"
    val rows = results.map(m =>
      s"""{"mult":${m.mult},"corpus_docs":${m.corpusDocs},"dict_lines":${m.dictLines},""" +
        s""""wall_s":${j(m.wallS)},"shuffle_mb":${j(m.shuffleMb)},"out_rows":${m.outRows}}""")
    val (f0, l) = (results.head, results.last)
    val span = math.log(l.corpusDocs.toDouble / f0.corpusDocs)
    val aW = math.log(l.wallS / f0.wallS) / span
    val aS = math.log(math.max(l.shuffleMb, 0.01) / math.max(f0.shuffleMb, 0.01)) / span
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_INCR_BP.json"),
      (s"""{"measurements":[${rows.mkString(",")}],""" +
        s""""exponents_vs_corpus":{"wall":${j(aW)},"shuffle":${j(aS)}}}\n""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("INCRBP written SCALE_INCR_BP.json")
    spark.stop()
  }
}
