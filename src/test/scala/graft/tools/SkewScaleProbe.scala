package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Dev tool: the q88 adaptive-skew-join claim, measured — writes
  * `SCALE_SKEW.json`. A fact frame where ONE key holds half the rows is
  * joined to a 100k-key dimension at 1M → 10M → 100M fact rows, in the
  * shuffle-join regime the operator targets (broadcast disabled: at the
  * scale where salting matters, the dim does not broadcast — and AQE's
  * runtime skew split, the shipped first line of defense, also only
  * applies to shuffle joins). Arms per scale point:
  *
  *  - plain join, AQE on — the adaptive operator's choice when the probe
  *    says "not skewed", and the baseline AQE skew-split protects;
  *  - plain join, AQE off — the unprotected straggler a static planner
  *    would schedule (one partition carries 50% of the fact);
  *  - salted join (8 salts), AQE on — the operator's skewed-path choice;
  *  - adaptive — what [[SkewJoin.adaptiveInnerJoin]] actually picks after
  *    its bounded key-share sample (expected: the salted path here).
  *
  * The claim certified by the artifact: the salted path's advantage over
  * the unprotected plain join GROWS with scale, and the adaptive wall
  * tracks the salted wall (sample probe cost amortized), while on a
  * uniform control frame the adaptive wall tracks the plain wall.
  */
object SkewScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val nDimKeys = 100000L
    val dim = spark.range(nDimKeys)
      .select(col("id").as("dk"), (col("id") * 31L % 997L).as("dv"))

    def skewedFact(n: Long): DataFrame = spark.range(n)
      .select(
        when(col("id") % 2 === 0, lit(7L))
          .otherwise(pmod(col("id"), lit(nDimKeys))).as("k"),
        col("id").as("v"))
    def uniformFact(n: Long): DataFrame = spark.range(n)
      .select(pmod(col("id"), lit(nDimKeys)).as("k"), col("id").as("v"))

    def run(joined: DataFrame): Double = {
      val t0 = System.nanoTime()
      joined.agg(count(lit(1)), sum(col("v") + col("dv"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def withAqe[T](on: Boolean)(f: => T): T = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // warm-up
    run(skewedFact(100000L).join(dim, col("k") === col("dk")))

    final case class M(mult: Int, rows: Long, plainAqe: Double, plainNoAqe: Double,
                       salted: Double, adaptive: Double, adaptiveUniform: Double,
                       plainUniform: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]
    for (mult <- Seq(1, 10, 100)) {
      val n = 1000000L * mult
      val f = skewedFact(n)
      val u = uniformFact(n)
      val plainAqe = run(f.join(dim, col("k") === col("dk")))
      val plainNoAqe = withAqe(false)(run(f.join(dim, col("k") === col("dk"))))
      val salted = run(SkewJoin.saltedInnerJoin(f, dim, "k", "dk", nSalts = 8))
      val adaptive = run(SkewJoin.adaptiveInnerJoin(f, dim, "k", "dk", nSalts = 8))
      val plainUniform = run(u.join(dim, col("k") === col("dk")))
      val adaptiveUniform = run(SkewJoin.adaptiveInnerJoin(u, dim, "k", "dk", nSalts = 8))
      val m = M(mult, n, plainAqe, plainNoAqe, salted, adaptive, adaptiveUniform, plainUniform)
      results += m
      println(f"SKEWSCALE x${m.mult}%-4d rows=${m.rows}%-10d plainAQE=${m.plainAqe}%6.2f " +
        f"plainNoAQE=${m.plainNoAqe}%6.2f salted=${m.salted}%6.2f adaptive=${m.adaptive}%6.2f " +
        f"uniformPlain=${m.plainUniform}%6.2f uniformAdaptive=${m.adaptiveUniform}%6.2f")
    }

    def j(d: Double) = f"$d%.3f"
    val rows = results.map(m =>
      s"""{"mult":${m.mult},"fact_rows":${m.rows},"plain_aqe_s":${j(m.plainAqe)},""" +
        s""""plain_noaqe_s":${j(m.plainNoAqe)},"salted_s":${j(m.salted)},""" +
        s""""adaptive_s":${j(m.adaptive)},"uniform_plain_s":${j(m.plainUniform)},""" +
        s""""uniform_adaptive_s":${j(m.adaptiveUniform)}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_SKEW.json"),
      (s"""{"hot_key_share":0.5,"dim_keys":$nDimKeys,"n_salts":8,""" +
        s""""broadcast":"disabled (the shuffle-join regime the operator targets)",""" +
        s""""measurements":[${rows.mkString(",")}]}\n""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("SKEWSCALE written SCALE_SKEW.json")
    spark.stop()
  }
}
