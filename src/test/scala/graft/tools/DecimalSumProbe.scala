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
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/graft_scale10/lineitem")
    def run(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    def centsSum(c: org.apache.spark.sql.Column) =
      (sum(round(c * 100).cast("long")) / 100.0)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "decimal_grouped" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(Exact.dsum(col("l_quantity")), Exact.dsum(col("l_extendedprice")))),
      "cents_grouped" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(centsSum(col("l_quantity")), centsSum(col("l_extendedprice")))),
      "double_grouped" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))),
      "decimal_perorder" -> (() => li.groupBy("l_orderkey")
        .agg(sum(Exact.revenueTerm(col("l_extendedprice"), col("l_discount"))))),
      "cents_perorder" -> (() => li.groupBy("l_orderkey")
        .agg((sum((round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))) / 10000.0))),
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
