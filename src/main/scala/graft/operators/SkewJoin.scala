package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so badly that even split
  * partitions hot-spot (or when AQE is unavailable, e.g. inside some
  * streaming joins). The big side scatters each row into one of `nSalts`
  * sub-keys derived from a hash of the whole row; the small side replicates
  * `nSalts`×. Result set is identical to the plain join — only the shuffle
  * distribution changes.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `bigKey === smallKey`, salted.
    *
    * @param nSalts fan-out per key (executor-count-sized at scale)
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, bigKey: String,
                      smallKey: String, nSalts: Int): DataFrame = {
    // deterministic scatter: hash all of the big side's columns
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") && col(bigKey) === col(smallKey))
      .drop("_salt")
  }

  // ------------------------------------------------------- declared queries

  /** q88: the salted join's result identity, certified against the plain
    * SQL join — lineitem ⋈ part salted 8 ways, aggregated per brand. The
    * salt must change only the shuffle distribution, never the result set.
    */
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q88_skew_join" -> ((s, dir) => {
      import graft.Present._
      val t = graft.Tables(s, dir)
      saltedInnerJoin(t.lineitem, t.part, "l_partkey", "p_partkey", nSalts = 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("l_quantity")).as("sum_qty"))
        .presented("p_brand")
    }))

  val oracles: Map[String, String] = Map(
    "q88_skew_join" ->
      """SELECT p_brand, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""")
}
