package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent exact aggregation over money-like (2-decimal) doubles.
  *
  * Floating SUM/AVG accumulate in shuffle/partition order, so two engines (or
  * two runs at different parallelism) legitimately disagree in the last ULPs —
  * at 100 TB the error of a double sum over billions of rows is far above any
  * rounding you could "fix" afterwards. The engine therefore sums 2-decimal
  * measures as DECIMAL (exact, associative, order-independent) and converts
  * the final result to double (exact for |v| < 2^53 cents). The identical
  * formulation runs on any SQL engine, which is what makes cross-engine
  * result hashing (the DuckDB oracle) meaningful.
  */
object Exact {
  private val Cents = DecimalType(18, 2)

  /** Exact, order-independent sum of a 2-decimal double column → double. */
  def dsum(c: Column): Column = sum(c.cast(Cents)).cast(DoubleType)

  /** Exact mean: decimal sum ÷ count, both sides evaluated identically. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Windowed variants (frame-bound moving aggregates). */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(Cents)).over(w).cast(DoubleType)
  def davgOver(c: Column, w: WindowSpec): Column =
    dsumOver(c, w) / count(lit(1)).over(w)

  /** Exact revenue term `price * (1 - discount)` as DECIMAL (for summing). */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(Cents) * (lit(1) - discount.cast(Cents))
}
