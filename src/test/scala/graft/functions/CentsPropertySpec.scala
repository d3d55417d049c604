package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check over ARBITRARY 2-decimal values (not just the fixtures):
  * the long-cents path reproduces the DECIMAL(18,2) formulation's doubles
  * bit-for-bit — sum, avg, and the scale-4 revenue product — for any
  * money-like corpus within the documented magnitude contract
  * (`Exact.scala`: exact cent recovery for |x| ≤ 10¹³ cents per value).
  * The third test pins the CLIFF the first drafts of this spec found:
  * beyond ~3.5×10¹⁵ cents the double spacing at x·100 reaches the ±0.5
  * budget and the round-trip genuinely breaks — the contract bound sits
  * 300× inside it.
  */
class CentsPropertySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  // cents drawn across the full documented magnitude range, sign-mixed,
  // with boundary-heavy cases (x.x5 / .005 shapes that decide HALF_UP)
  private val centsGen: Gen[Long] = Gen.frequency(
    (4, Gen.chooseNum(-99999L, 99999L)),
    (3, Gen.chooseNum(-9999999999L, 9999999999L)),
    (1, Gen.chooseNum(-10000000000000L, 10000000000000L)), // contract bound
    (1, Gen.oneOf(Seq(0L, 1L, -1L, 5L, -5L, 50L, -50L, 105L, -105L,
      28499L, 28500L, 28501L, -28500L))))

  test("cents sum/avg/revenue == decimal formulation bitwise on random 2-decimal corpora") {
    val s = spark
    import s.implicits._
    val d = org.apache.spark.sql.types.DecimalType(18, 2)
    val params = Gen.Parameters.default
    (0 until 30).foreach { i =>
      val seed = Seed(0xC0FFEE + i)
      // per-value cap $1e9: keeps every GROUP's scale-4 revenue sum under
      // 2^53, where (double)S/1e4 and BigDecimal(S,4).doubleValue provably
      // coincide — past 2^53 the two final conversions double-round
      // differently by design (the cents path matches DuckDB's
      // hugeint-then-divide shape, the richer contract for the oracle)
      val rows = Gen.listOfN(200, Gen.zip(centsGen, Gen.chooseNum(0, 4),
          Gen.chooseNum(0L, 100L)))
        .apply(params, seed).get
        .map { case (c, g, disc) => (g, (c % 100000000000L) / 100.0, disc / 100.0) }
      val df = rows.toDF("g", "x", "disc")
      val cents = df.groupBy("g")
        .agg(Exact.dsum(col("x")).as("s"), Exact.davg(col("x")).as("a"),
          Exact.drevenueSum(col("x"), col("disc")).as("rev"))
        .orderBy("g").collect().toSeq
      val dec = df.groupBy("g")
        .agg(sum(col("x").cast(d)).cast("double").as("s"),
          (sum(col("x").cast(d)).cast("double") / count(lit(1))).as("a"),
          sum(col("x").cast(d) * (lit(1) - col("disc").cast(d)))
            .cast("double").as("rev"))
        .orderBy("g").collect().toSeq
      assert(cents == dec, s"iteration $i: cents vs decimal differ")
    }
  }

  test("the conversion recovers the exact cent for every sample within the contract") {
    val s = spark
    import s.implicits._
    val params = Gen.Parameters.default
    val ns = (0 until 8).flatMap { i =>
      Gen.listOfN(500, centsGen).apply(params, Seed(0xBEEF + i)).get
    }
    val df = ns.toDF("n")
    val bad = df.select(col("n"),
        ((col("n") / 100.0) * 100 + when(col("n") / 100.0 < 0, -0.5).otherwise(0.5))
          .cast("long").as("back"))
      .filter(col("n") =!= col("back")).collect()
    assert(bad.isEmpty, s"cent round-trip failed for: ${bad.take(5).mkString(", ")}")
  }

  test("the cliff is where the scaladoc says: round-trip genuinely breaks past ~3.5e15") {
    val s = spark
    import s.implicits._
    // far side of the documented onset — if THIS starts passing, double
    // arithmetic changed and the contract margin should be re-derived
    val far = Seq(3561866551555309L, -3689574093947077L, 3814415320016020L)
    val df = far.toDF("n")
    val broken = df.select(col("n"),
        ((col("n") / 100.0) * 100 + when(col("n") / 100.0 < 0, -0.5).otherwise(0.5))
          .cast("long").as("back"))
      .filter(col("n") =!= col("back")).count()
    assert(broken == far.size, "expected every far-side sample to break")
  }
}
