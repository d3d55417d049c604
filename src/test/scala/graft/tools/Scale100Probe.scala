package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev tool: TWO-DECADE scale probe for the operator families whose
  * 100 TB story rests on linearity claims:
  *
  *  - dedup family, 5k → 50k → 500k documents (×1/×10/×100 of sf0.1):
  *    minhash candidate pairs, and the full minhash → label-propagation
  *    cluster chain;
  *  - buckets: LSH bucket-population histograms at the same three scales
  *    (the hot-bucket-cap sizing evidence, own artifact
  *    `SCALE100_buckets.json`);
  *  - cleaning family, same 5k → 50k → 500k documents: PII scrub,
  *    boilerplate strip (join shape pinned), mixture rebalance;
  *  - events family, 600k → 6M → 60M rows (×6/×60/×600 of sf0.1):
  *    retention / funnel / gap-fill resample.
  *
  * Replicated doc copies are made DISJOINT by a per-copy SUBSTITUTION
  * CIPHER (letters rotated by i mod 26, digits by i/26 mod 10): a bijective
  * char map is bijective on the character-shingle space, so within-copy
  * Jaccard — and the planted near-dup structure — is preserved EXACTLY,
  * while cross-copy shingles share nothing. (A first attempt suffixed every
  * token with the copy index; with character shingles that plants the same
  * `_N ` fragments in every doc, estimated Jaccard rises corpus-wide, and
  * LSH candidate generation explodes ~10× — measuring the salt, not the
  * operator.) Duplicate-cluster size thus stays constant as the corpus
  * grows, which is the regime the linearity claim is about.
  *
  * Protocol: every measurement is a COLD fresh plan, fully evaluated
  * through the noop sink, one run per (op, scale) — uniform across scales,
  * so ratios are comparable (a JVM-warming throwaway op runs first). Wall
  * clock plus TOTAL and PEAK-STAGE shuffle-write bytes are logged from a
  * stage listener: the scale-out cost model is "bytes through the
  * exchange", not CPU seconds. alpha = ln(t_last/t_first)/ln(rows ratio),
  * computed for wall AND shuffle — alpha ≈ 1 is linear growth.
  *
  * One family per invocation (args: `dedup` | `buckets` | `cleaning` |
  * `events`; default all four) so a
  * leg fits a bounded runner; each leg writes `SCALE100_<family>.json` and
  * the merged committed artifact `SCALE100.json` is rebuilt from all part
  * files present.
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val families = if (args.isEmpty) Seq("dedup", "buckets", "cleaning", "events") else args.toSeq
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        // Pin the SHUFFLING regime at every scale: at small corpora the
        // planner broadcasts the band/label sides and the small-scale points
        // measure a zero-exchange plan — the 10×→100× jump then reads as a
        // strategy crossover, not operator scaling. The 100 TB regime is the
        // shuffling one, so the probe holds that plan shape constant.
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

    val base = "/tmp/graft_scale100"
    def ensure(path: String)(build: => DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    // 104 distinct bijections (26 rotations × reverse × case-swap): a
    // rotation-only cipher repeats at i≥26 and plants ~4-member cross-copy
    // twin classes, which showed up as a 2.3× superlinear candidate-pair
    // jump in the 100× decade — shared with IncrementalDedupProbe
    def cipheredDocs(mult: Int): DataFrame = ProbeFixtures.cipheredDocs(spark, mult)
    def multEvents(mult: Int): DataFrame =
      spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        .select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
        .withColumn("user_id", col("user_id") + col("_i") * 10000000L)
        .withColumn("event_id", col("event_id") + col("_i") * 1000000000L)
        .drop("_i")
        .repartition(math.max(32, mult / 4))

    def run(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    final case class M(family: String, op: String, mult: Int, rows: Long,
                       wallS: Double, shuffleMb: Double, peakStageMb: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]
    def time(family: String, op: String, mult: Int, rows: Long)(f: => Unit): Unit = {
      Thread.sleep(300) // let straggling stage events land before reset
      totalShuffle.set(0); peakStage.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val m = M(family, op, mult, rows, wall,
        totalShuffle.get() / 1e6, peakStage.get() / 1e6)
      results += m
      println(f"SCALE100 ${m.family}%-7s ${m.op}%-18s x${m.mult}%-4d rows=${m.rows}%-9d " +
        f"wall=${m.wallS}%7.2f s shuffle=${m.shuffleMb}%9.1f MB peakStage=${m.peakStageMb}%9.1f MB")
    }

    // JVM warm-up (JIT, codegen, noop write path) — not measured
    run(graft.operators.Funnels.cohortRetention(
      graft.Tables.withTsUs(
        spark.read.parquet("/root/testdata/sf0.1/events.parquet")), "user_id", "ts_us"))

    if (families.contains("dedup")) for (mult <- Seq(1, 10, 100)) {
      val docs = ensure(s"$base/docs_$mult")(cipheredDocs(mult))
      val nDocs = docs.count()
      time("dedup", "minhash_pairs", mult, nDocs) {
        run(graft.operators.Dedup.minhashPairs(docs, "doc_id"))
      }
      time("dedup", "minhash_cluster", mult, nDocs) {
        run(graft.operators.Dedup.duplicateClusters(
          graft.operators.Dedup.minhashPairs(docs, "doc_id")))
      }
    }
    // Bucket-population audit for the LSH families: the hot-bucket skew
    // evidence behind Dedup's boundedCandidates caps. Per signature table,
    // the bucket count, the MAX population, and a log2 histogram
    // (size-class 2^k -> buckets in class) — organic maxima must sit far
    // under the maxBucket default (1024) for the bound to be inert on
    // certified outputs, and the histogram shows how much headroom exists.
    val bucketStats = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def auditBuckets(tag: String, table: DataFrame, keys: Seq[String]): Unit = {
      val sizes = table.groupBy(keys.map(col): _*).count()
      val hist = sizes
        .groupBy(floor(log(2.0, col("count"))).cast("long").as("c2"))
        .agg(count(lit(1)).as("n"), max("count").as("mx"))
        .orderBy("c2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val total = hist.map(_._2).sum
      val mx = if (hist.isEmpty) 0L else hist.map(_._3).max
      bucketStats(tag) =
        s"""{"buckets":$total,"max_population":$mx,"log2_hist":{${
          hist.map { case (c, n, _) => s""""${1L << c}":$n""" }.mkString(",")}}}"""
      println(s"SCALE100 buckets $tag: buckets=$total max=$mx " +
        hist.map { case (c, n, _) => s"2^$c:$n" }.mkString(" "))
    }
    if (families.contains("buckets")) {
      for (mult <- Seq(1, 10, 100)) {
        val docs = ensure(s"$base/docs_$mult")(cipheredDocs(mult))
        auditBuckets(s"minhash_bands_x$mult",
          graft.operators.Dedup.minhashBandTable(docs, "doc_id"), Seq("band", "bh"))
        auditBuckets(s"simhash_chunks_x$mult",
          graft.operators.Dedup.simhashChunkTable(docs, "doc_id", "text"),
          Seq("chunk", "cv"))
      }
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      auditBuckets("embedding_buckets_sf01",
        graft.operators.Similarity.withLshBucket(emb, "embedding", 8, dim),
        Seq("bucket"))
      java.nio.file.Files.write(java.nio.file.Paths.get("SCALE100_buckets.json"),
        (s"{${bucketStats.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // Cleaning trio, same 5k → 50k → 500k docs: the ciphered copies have
    // DISJOINT line sets across copies (a bijective char map is bijective
    // on 16-token lines) while within-copy duplicate classes are preserved,
    // so the boilerplate dictionary stays FIXED-SIZE as the corpus grows —
    // exactly the regime the broadcast-dictionary rewrite claims to scale
    // in. piiScrub and mixtureRebalance must show ~zero corpus shuffle at
    // every scale (map-only / broadcast-rates contracts).
    if (families.contains("cleaning")) for (mult <- Seq(1, 10, 100)) {
      val docs = ensure(s"$base/docs_$mult")(cipheredDocs(mult))
      val nDocs = docs.count()
      time("cleaning", "pii_scrub", mult, nDocs) {
        run(graft.operators.Cleaning.piiScrub(docs, "doc_id", "text"))
      }
      // smallDictLimit=0 pins the JOIN shape at every scale (the dedup-leg
      // precedent of disabling auto-broadcast): the dictionary grows with
      // corpus diversity, so the array-ride fast path only covers the small
      // points and a shape crossover mid-sweep would read as superlinearity.
      time("cleaning", "boilerplate_strip", mult, nDocs) {
        run(graft.operators.Cleaning.boilerplateStrip(docs, "doc_id", "text", 16, 2L,
          smallDictLimit = 0L))
      }
      time("cleaning", "mixture_rebalance", mult, nDocs) {
        run(graft.operators.Cleaning.mixtureRebalance(docs, "doc_id", "lang"))
      }
    }

    if (families.contains("events")) for (mult <- Seq(6, 60, 600)) {
      val ev = graft.Tables.withTsUs(ensure(s"$base/events_$mult")(multEvents(mult)))
      val nEv = ev.count()
      time("events", "retention", mult, nEv) {
        run(graft.operators.Funnels.cohortRetention(ev, "user_id", "ts_us"))
      }
      time("events", "funnel", mult, nEv) {
        run(graft.operators.Funnels.funnelStages(ev, "user_id", "ts_us",
          "event_type", "event_id", Seq("view", "click", "purchase"), 86400000000L))
      }
      time("events", "resample", mult, nEv) {
        run(graft.operators.Resample.gapFillResample(
          ev.filter(col("user_id") % 7 === 0), "user_id", "ts_us", "value",
          "event_id", 3600000000L))
      }
    }

    def j(d: Double) = f"$d%.3f"
    def rowsJson(ms: Seq[M]) = ms.map(m =>
      s"""{"family":"${m.family}","op":"${m.op}","mult":${m.mult},"rows":${m.rows},""" +
        s""""wall_s":${j(m.wallS)},"shuffle_mb":${j(m.shuffleMb)},"peak_stage_mb":${j(m.peakStageMb)}}""")
    def write(path: String, content: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (content + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    families.foreach { fam =>
      val ms = results.filter(_.family == fam)
      if (ms.nonEmpty) write(s"SCALE100_$fam.json", s"[${rowsJson(ms.toSeq).mkString(",")}]")
    }
    // merge every part present into the committed artifact + exponents
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val merged = Seq("dedup", "cleaning", "events").flatMap { fam =>
      val p = java.nio.file.Paths.get(s"SCALE100_$fam.json")
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        mapper.readTree(p.toFile).elements().asScala.map { n =>
          M(n.get("family").asText(), n.get("op").asText(), n.get("mult").asInt(),
            n.get("rows").asLong(), n.get("wall_s").asDouble(),
            n.get("shuffle_mb").asDouble(), n.get("peak_stage_mb").asDouble())
        }.toSeq
      }
    }
    val exponents = merged.map(_.op).distinct.map { op =>
      val ms = merged.filter(_.op == op).sortBy(_.mult)
      val (f, l) = (ms.head, ms.last)
      val span = math.log(l.rows.toDouble / f.rows)
      val aWall = math.log(l.wallS / f.wallS) / span
      val aShuf = math.log(math.max(l.shuffleMb, 0.1) / math.max(f.shuffleMb, 0.1)) / span
      s""""$op":{"wall":${j(aWall)},"shuffle":${j(aShuf)}}"""
    }
    val bucketsPart = java.nio.file.Paths.get("SCALE100_buckets.json")
    val bucketsJson =
      if (java.nio.file.Files.exists(bucketsPart))
        s""","bucket_histograms":${java.nio.file.Files.readString(bucketsPart).trim}"""
      else ""
    val artifact =
      s"""{"probe":"scale100","base_sf":"sf0.1","cores":32,"protocol":"cold fresh plan, noop sink, single run per point",""" +
        s""""measurements":[${rowsJson(merged).mkString(",")}],""" +
        s""""exponents":{${exponents.mkString(",")}}$bucketsJson}"""
    write("SCALE100.json", artifact)
    println(artifact)
    spark.stop()
  }
}
