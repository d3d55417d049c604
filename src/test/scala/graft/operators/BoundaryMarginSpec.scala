package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audits the INTEGER-CERTIFICATION contract behind q111 (BM25 micro-units)
  * and q112 (KL nano-nats): both queries round each bounded per-row float
  * contribution to an integer BEFORE any aggregation-order-sensitive use,
  * which makes the cross-engine compare exact — but ONLY while every
  * contribution keeps a safe distance from a .5 rounding boundary. A
  * contribution landing within accumulated-double-error of a boundary could
  * round differently in Spark vs the DuckDB oracle and flake the hash
  * compare with no local signal. This spec makes that failure loud: it
  * asserts the minimum distance-to-boundary across every corpus fixture
  * exceeds a floor ~1e4× the accumulated ulp of the expression trees, so a
  * REGENERATED fixture that happens to land a contribution on a boundary
  * fails ScalaTest instead of flaking cross-engine.
  *
  * Floor calibration: the deepest expression tree here (BM25's idf·tfn
  * product chain) accumulates ≲20 IEEE ops of relative error on values
  * ≤ ~1e7 micro-units → absolute error ≲ 20 · 1e7 · 2⁻⁵³ ≈ 2e-8. The floor
  * of 1e-6 is ~50× that; the measured corpus minimum is ~3.4e-6.
  */
class BoundaryMarginSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val Floor = 1e-6

  /** Minimum distance from any value in `c` to its nearest .5 rounding
    * boundary (the points where HALF_UP rounding is decided).
    */
  private def minBoundaryMargin(raw: DataFrame, c: String): Double =
    raw.select(abs(abs(col(c)) % lit(1.0) - lit(0.5)).as("d"))
      .agg(min("d")).head().getDouble(0)

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")

  test("q111: BM25 micro-unit contributions stay clear of rounding boundaries at every SF") {
    for (sf <- sfs) {
      val docs = graft.Tables(spark, s"/root/testdata/$sf").documents
      val raw = TextAnalysis.bm25RawContribs(docs, "doc_id", "text",
        Seq("table", "hash", "spark", "window"))
      val margin = minBoundaryMargin(raw, "raw_micro")
      assert(margin > Floor,
        s"$sf: BM25 contribution within $margin of a .5 micro-unit boundary " +
          s"(floor $Floor) — the q111 integer certification is no longer safe " +
          "for this fixture; re-derive the unit scale or the fixture")
    }
  }

  test("q112: KL nano-nat contributions stay clear of rounding boundaries at every SF") {
    for (sf <- sfs) {
      val docs = graft.Tables(spark, s"/root/testdata/$sf").documents
      val raw = TextAnalysis.klRawContribs(docs, "text", col("doc_id") % 2 === 0)
      val margin = minBoundaryMargin(raw, "raw_nano")
      assert(margin > Floor,
        s"$sf: KL contribution within $margin of a .5 nano-nat boundary " +
          s"(floor $Floor) — the q112 integer certification is no longer safe " +
          "for this fixture")
    }
  }

  test("q128/q133: log-bucket index and round-4 estimate stay clear of their boundaries at every SF") {
    // Two cross-engine float functions feed q128: ln (bucket index, ceil
    // decided at INTEGERS) and pow (estimate, round-4 decided at .5 of the
    // 1e4-scaled value). Both engines' libm implementations may differ in
    // the last ulps, so the fixture must keep every value clear of its
    // decision boundary. ln values are ≤ ~700 (≈4e-13 accumulated error —
    // floor 1e-9 is ~2500×); pow·1e4 values reach ~1e9 (≈2.4e-7 error —
    // floor 1e-5 is ~40×).
    for (sf <- sfs; (tbl, vc) <- Seq(("lineitem", "l_extendedprice"),
                                     ("events", "value"))) {
      val li = graft.Tables(spark, s"/root/testdata/$sf").table(tbl)
      // Two values sit EXACTLY on a boundary but are safe by construction,
      // in any engine: x = 1.0 (ln 1 is exactly 0.0 in every conforming
      // libm → v = 0) and x = γ itself (v = ln(γ)/ln(γ), a self-ratio that
      // is exactly 1.0 whatever the engine's ln(γ) bits are). The hazard is
      // only NEAR-boundary values whose last-ulp ln could differ — the
      // events fixture carries literal 1.0 and 1.02 values, and q133
      // certifies green with them present.
      val v = li.filter(col(vc) > 0 && col(vc) =!= 1.0 && col(vc) =!= 1.02)
        .select((log(col(vc)) / lit(math.log(1.02))).as("v"))
      val lnMargin = v
        .select(least(col("v") - floor(col("v")), ceil(col("v")) - col("v")).as("d"))
        .agg(min("d")).head().getDouble(0)
      assert(lnMargin > 1e-9,
        s"$sf: a log-bucket index sits $lnMargin from an integer — ceil may " +
          "flip across engines; re-derive gamma or the fixture")
      val powMargin = v.select(ceil(col("v")).cast("long").as("b")).distinct()
        .select((pow(lit(1.02), col("b")) * 1e4).as("e"))
        .select(abs(col("e") % lit(1.0) - lit(0.5)).as("d"))
        .agg(min("d")).head().getDouble(0)
      assert(powMargin > 1e-5,
        s"$sf: a round-4 estimate sits $powMargin from a .5 boundary — " +
          "rounding may flip across engines; coarsen the estimate rounding")
    }
  }

  test("q127: correlation values stay clear of their round-6 boundaries at every SF") {
    // q127 certifies on round-6 doubles produced from exact decimal moments;
    // Spark (BigDecimal.doubleValue) and DuckDB (hugeint-then-divide) may
    // disagree by ~1 ulp once the unscaled sums pass 2^53 (sf1 sum-of-
    // squares reaches ~1e20 unscaled), so the round-6 compare is only safe
    // while each corr value keeps a wide margin from a .5e-6 boundary.
    // Corr values are ≤1, so a 1-ulp moment divergence moves the 1e6-scaled
    // value by ≲1e-6·1e6·ulp-factor ≈ 1e-6; the 1e-4 floor is ~100× that.
    for (sf <- sfs) {
      val li = graft.Tables(spark, s"/root/testdata/$sf").lineitem
      val raw = Profile.correlationMatrixAt(li,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), scale = None)
      val margin = minBoundaryMargin(raw.select((col("corr") * 1e6).as("c6")), "c6")
      assert(margin > 1e-4,
        s"$sf: a corr value sits $margin (1e6-scaled) from its round-6 " +
          ".5 boundary — the q127 cross-engine round-6 compare is no longer " +
          "safe for this fixture")
    }
  }

  test("the margin check fires on a boundary corpus") {
    val s = spark
    import s.implicits._
    // Synthetic contributions standing in for a regenerated fixture whose
    // value lands ON (2.5) and NEAR (17.4999997) a boundary — both must
    // trip the floor; a clear value (17.3) must not. (An exact end-to-end
    // boundary CORPUS cannot be constructed in closed form: both
    // contributions pass through a transcendental log, so the guard is
    // exercised at the raw-contribution layer the production queries
    // feed through minBoundaryMargin.)
    assert(minBoundaryMargin(Seq(2.5).toDF("raw"), "raw") < Floor)
    assert(minBoundaryMargin(Seq(17.4999997, 42.1).toDF("raw"), "raw") < Floor)
    assert(minBoundaryMargin(Seq(17.3, -3.25).toDF("raw"), "raw") > Floor)
    // negative contributions (KL has them) measure against their own
    // boundary, not 0.5 absolute
    assert(minBoundaryMargin(Seq(-2.5000001).toDF("raw"), "raw") < Floor)
  }
}
