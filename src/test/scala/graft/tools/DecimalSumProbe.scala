package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.functions.Exact

/** Scratch probe: same-process A/B of exact-money-sum strategies over the
  * 10x lineitem — DECIMAL(18,2) cast+sum (Exact.dsum today) vs long-cents
  * (round(x*100) cast long, integer sum, /100.0) vs plain double sum (the
  * non-exact floor). Forces evaluation through the noop sink.
  */
object DecimalSumProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val path = args.drop(1).headOption.getOrElse("/tmp/graft_scale10/lineitem")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(path)
    def run(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    // round() goes through BigDecimal per row — the pure-double half-away
    // conversion is the codegen-friendly candidate (exact for any double
    // that REPRESENTS a 2-decimal value; see Exact.scala)
    def cents(c: org.apache.spark.sql.Column) =
      (c * 100 + when(c < 0, -0.5).otherwise(0.5)).cast("long")
    def centsSum(c: org.apache.spark.sql.Column) =
      (sum(cents(c)).cast("double") / 100.0)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "count_floor" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)))),
      // the pre-round-11 Exact formulation, inlined: DECIMAL(18,2) cast +
      // sum (widens to decimal(28,2) -> java BigDecimal accumulation)
      "decimal_grouped" -> (() => {
        val d = org.apache.spark.sql.types.DecimalType(18, 2)
        def dec(c: org.apache.spark.sql.Column) = sum(c.cast(d)).cast("double")
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(dec(col("l_quantity")), dec(col("l_extendedprice")),
            dec(col("l_discount")) / count(lit(1)), count(lit(1)))
      }),
      "cents_grouped" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(centsSum(col("l_quantity")), centsSum(col("l_extendedprice")),
          centsSum(col("l_discount")) / count(lit(1)), count(lit(1)))),
      "double_grouped" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          avg(col("l_discount")), count(lit(1)))),
      "decimal_perorder" -> (() => {
        val d = org.apache.spark.sql.types.DecimalType(18, 2)
        li.groupBy("l_orderkey")
          .agg(sum(col("l_extendedprice").cast(d) *
            (lit(1) - col("l_discount").cast(d))).cast("double"))
      }),
      "cents_perorder" -> (() => li.groupBy("l_orderkey")
        .agg((sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).cast("double") / 10000.0))),
    )
    variants.foreach(v => run(v._2())) // warm
    val times = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        run(f())
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"DSUM $name%-18s med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f")
    }
    spark.stop()
  }
}
