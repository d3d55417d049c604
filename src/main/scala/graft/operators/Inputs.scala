package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-shape helpers shared by the operator family. */
private[graft] object Inputs {

  /** Ensures CPU-bound per-row passes (signature hashing, tokenization) see
    * at least the cluster's parallelism: a corpus that arrives in fewer
    * splits than cores (one small file; a filtered partition) would
    * otherwise run on one thread. At scale the input already has thousands
    * of splits and this is a no-op; when it does fire, it shuffles only the
    * raw inputs once.
    *
    * Caveat: the split count comes from `df.rdd`, which EXECUTES any
    * shuffle stages already in the plan (AQE materializes stages when the
    * RDD is built). Callers pass scan/filter/project inputs — exchange-free
    * by construction; keep it that way.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
