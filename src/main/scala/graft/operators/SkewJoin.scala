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
}
