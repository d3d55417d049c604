package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the round-11 long-cents exact-aggregation path (Exact.scala).
  *
  * The pure-double `x·100 ± 0.5 → truncate` conversion equals the oracle's
  * `CAST(x AS DECIMAL(…,2))` for every double that REPRESENTS a 2-decimal
  * value — and can diverge (half-away vs string-repr HALF_UP) only on
  * genuinely ≥3-decimal inputs. This spec pins the precondition on every
  * money column at every SF (a regenerated fixture with real 3-decimal
  * values fails HERE, loudly, instead of flaking a cross-engine hash), and
  * pins cross-path equality: the cents formulation reproduces the decimal
  * formulation's doubles bit-for-bit on the fixtures.
  */
class CentsMarginSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val moneyCols = Seq(
    ("lineitem", Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    ("orders", Seq("o_totalprice")),
    ("customer", Seq("c_acctbal")),
    ("events", Seq("value")))

  test("every money column is 2-decimal-representable with wide margin at every SF") {
    // measured corpus max deviation is 3.7e-9; floor 1e-3 is ~270,000×
    // that and still 500× under the 0.5 budget the conversion needs
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); (tbl, cols) <- moneyCols) {
      val t = graft.Tables(spark, s"/root/testdata/$sf").table(tbl)
      for (c <- cols) {
        val dev = t.select(abs(col(c) * 100 - round(col(c) * 100)).as("d"))
          .agg(max("d")).head().getDouble(0)
        assert(dev < 1e-3,
          s"$sf $tbl.$c deviates $dev from the cent grid — the long-cents " +
            "exact-sum contract no longer holds for this fixture")
      }
    }
  }

  test("cents formulation reproduces the decimal formulation bit-for-bit") {
    val d = org.apache.spark.sql.types.DecimalType(18, 2)
    def decSum(c: org.apache.spark.sql.Column) = sum(c.cast(d)).cast("double")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val li = graft.Tables(spark, s"/root/testdata/$sf").lineitem
      val cents = li.groupBy("l_returnflag", "l_linestatus")
        .agg(Exact.dsum(col("l_quantity")).as("sq"),
          Exact.dsum(col("l_extendedprice")).as("se"),
          Exact.davg(col("l_discount")).as("ad"),
          Exact.drevenueSum(col("l_extendedprice"), col("l_discount")).as("rev"))
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
      val dec = li.groupBy("l_returnflag", "l_linestatus")
        .agg(decSum(col("l_quantity")).as("sq"),
          decSum(col("l_extendedprice")).as("se"),
          (decSum(col("l_discount")) / count(lit(1))).as("ad"),
          sum(col("l_extendedprice").cast(d) * (lit(1) - col("l_discount").cast(d)))
            .cast("double").as("rev"))
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
      assert(cents == dec, s"$sf: cents vs decimal rows differ")
    }
  }

  test("the conversion itself: signs, nulls, empty groups") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1.01), Some(-2.99), Some(0.0), None).toDF("v")
    val r = df.agg(Exact.dsum(col("v")).as("s"), Exact.davg(col("v")).as("a")).head()
    assert(r.getDouble(0) == -1.98)
    assert(r.getDouble(1) == -1.98 / 4) // davg counts all rows, incl. null measure
    val empty = df.limit(0).agg(Exact.dsum(col("v")).as("s")).head()
    assert(empty.isNullAt(0)) // sum over zero rows stays SQL NULL
  }
}
