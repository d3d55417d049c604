package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Same-window A/B for the r16 `graft_word_bigrams` kernel: the
  * split + transform(sequence(...)) HOF composition q108/q110 shipped
  * through r15 versus the fused native bigram expression, measured on the
  * row-local bigram stream AND end-to-end on both consumers, row
  * checksums asserted identical. Writes BIGRAM_NATIVE_AB.json.
  */
object BigramNativeAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.TextSignatures.register(spark)

    def med(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }

    val docs = Tables(spark, sfDir).documents
    def guard = docs.filter(
      graft.operators.TextAnalysis.wsTokenCount(col("text")) >= 2)
    def composedStream = guard
      .select(split(trim(col("text")), " +").as("_t"))
      .select(explode(expr(
        "transform(sequence(0, size(_t) - 2), i -> struct(_t[i] AS w1, _t[i + 1] AS w2))")).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))
    def nativeStream = guard
      .select(explode(call_function("graft_word_bigrams", col("text"))).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))

    def checksum(df: org.apache.spark.sql.DataFrame) = df.agg(count(lit(1)),
      sum(length(col("w1")) + length(col("w2"))),
      sum(hash(col("w1"), col("w2")).cast("long"))).collect()(0).toString
    require(checksum(composedStream) == checksum(nativeStream), "streams diverge")

    val drain = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum(length(col("w1")) + length(col("w2")))).collect()
    val tComposed = med(drain(composedStream))
    val tNative = med(drain(nativeStream))
    val tQ108 = med(SparkEntry.freshQueries("q108_ngram_lm")(spark, sfDir).collect())
    val tQ110 = med(SparkEntry.freshQueries("q110_pmi_collocations")(spark, sfDir).collect())
    println(f"BIGRAMAB composed=$tComposed%.3f native=$tNative%.3f q108=$tQ108%.3f q110=$tQ110%.3f")

    java.nio.file.Files.write(java.nio.file.Paths.get("BIGRAM_NATIVE_AB.json"),
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "bigram_stream_composed_hof": ${f"$tComposed%.3f"},
 "bigram_stream_native": ${f"$tNative%.3f"},
 "q108_full_on_native": ${f"$tQ108%.3f"},
 "q110_full_on_native": ${f"$tQ110%.3f"},
 "note": "row-local bigram stream drained through count+length aggregates (fresh plans, med-of-$reps, stream checksums asserted identical incl. a pairwise hash). Leg A is the r15 split + transform(sequence) HOF composition, leg B the fused graft_word_bigrams expression both consumers (q108 n-gram LM, q110 PMI) now ride; parity pinned in WordLinesTermTfsSpec incl. the short-doc no-pairs contract behind the >=2-token guard."
}
""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
