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

  /** Best-effort signature of a plan's file inputs (sorted `path:size:mtime`
    * FNV hash). A source file regenerated IN PLACE keeps the same logical
    * plan (same path ⇒ same `semanticHash`), so any cache keyed purely on
    * the plan would serve stale results — folding the on-disk signature into
    * the key makes such caches self-invalidating. Non-file inputs contribute
    * just their path string; stat failures degrade to the path too.
    */
  def dataSignature(df: DataFrame): Long =
    df.inputFiles.sorted.foldLeft(1469598103934665603L) { (h, f) =>
      val entry = try {
        val p = java.nio.file.Paths.get(new java.net.URI(f))
        s"$f:${java.nio.file.Files.size(p)}:${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      } catch { case _: Exception => f }
      entry.foldLeft(h)((a, c) => (a ^ c) * 1099511628211L)
    }
}
