package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{SparkEntry, Tables}
import graft.operators.Cleaning

/** Same-window A/B for the r16 `graft_pii_scrub` kernel: the six-pass
  * regex composition q116 shipped through r15 (three regexp_counts on the
  * original + the three-deep regexp_replace chain) versus the fused
  * single-fold native expression, over the same planted-PII corpus with
  * row checksums asserted identical. Writes PII_NATIVE_AB.json.
  */
object PiiNativeAB {
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

    def med(f: => Unit): Double = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      ts(ts.size / 2)
    }

    // q116's own corpus: the planted-PII derivation over documents
    def planted = SparkEntry.freshQueries("q116_pii_scrub")(spark, sfDir)

    // leg A: the r15 six-pass regex composition, same planted corpus —
    // reconstructed against the operator's contract patterns
    def regexLeg = {
      val planted = Tables(spark, sfDir).documents
        .select(col("doc_id"), Cleaning.plantPiiCol("doc_id", "text").as("text"))
      val t = col("text")
      planted.select(col("doc_id"),
        regexp_count(t, lit(Cleaning.EmailPattern)).cast(LongType).as("n_emails"),
        regexp_count(t, lit(Cleaning.Ipv4Pattern)).cast(LongType).as("n_ips"),
        regexp_count(t, lit(Cleaning.PhonePattern)).cast(LongType).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(t, Cleaning.EmailPattern, "<EMAIL>"),
            Cleaning.Ipv4Pattern, "<IP>"),
          Cleaning.PhonePattern, "<PHONE>").as("clean_text"))
        .orderBy("doc_id")
    }

    def checksum(df: org.apache.spark.sql.DataFrame) = df.agg(count(lit(1)),
      sum(col("n_emails")), sum(col("n_ips")), sum(col("n_phones")),
      sum(length(col("clean_text")))).collect()(0).toString
    val (ca, cb) = (checksum(regexLeg), checksum(planted))
    require(ca == cb, s"legs diverge: $ca vs $cb")

    val tRegex = med(regexLeg.collect())
    val tNative = med(planted.collect())
    println(f"PIIAB regex_six_pass=$tRegex%.3f native_fused=$tNative%.3f")

    java.nio.file.Files.write(java.nio.file.Paths.get("PII_NATIVE_AB.json"),
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "regex_six_pass": ${f"$tRegex%.3f"},
 "native_fused_kernel": ${f"$tNative%.3f"},
 "note": "q116 end-to-end over the same planted-PII corpus (collect-drained fresh plans, med-of-$reps, row checksums asserted identical). Leg A composes the r15 shape: three regexp_counts on the original text plus the three-deep regexp_replace chain - six java.util.regex passes per row. Leg B is the shipped graft_pii_scrub codegen kernel: hand-rolled linear scanners with exact java.util.regex semantics (PiiScrubSpec pins the equivalence adversarially and property-wise), counts and the chained redaction in one expression evaluation."
}
""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
