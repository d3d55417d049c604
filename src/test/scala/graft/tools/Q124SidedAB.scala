package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch A/B (r19): does q124 (semantic dedup) actually recompute the
  * cell-assignment subtree once per boundedCandidates consumer (the static
  * plan shows it four times), or does AQE stage reuse already dedupe the
  * identical exchanges at runtime? Arms:
  *   shipped — the declared q124 builder as-is;
  *   ckpt    — same pipeline with the `sided` frame (cells + vector +
  *             norm) eagerly localCheckpointed before boundedCandidates.
  * Alternating min-of-N in one window; row counts asserted equal. Also
  * prints the executed plan's ReusedExchange count for the shipped arm.
  */
object Q124SidedAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shipped = SparkEntry.freshQueries("q124_dedup_semantic")
    // executed-plan reuse audit
    val df0 = shipped(spark, sfDir)
    df0.collect()
    val ep = df0.queryExecution.executedPlan.toString
    println(s"Q124AB shipped executedPlan: Exchange=${"Exchange".r.findAllIn(ep).size} " +
      s"ReusedExchange=${"ReusedExchange".r.findAllIn(ep).size} " +
      s"(note: AQE final plan reuse shows per-stage)")

    // ckpt arm: replicate semanticDedupPairs with sided checkpointed
    import graft.Present._
    import graft.operators.Dedup
    def ckptArm(): Array[org.apache.spark.sql.Row] = {
      val emb = graft.Tables(spark, sfDir).embeddings
      Dedup.semanticDedupPairsCkpt(emb, "vec_id", "embedding", 0.35)
        .presented("a", "b").collect()
    }
    // baseline arm = the pre-r19 behavior (no sided persist), via the conf
    def shippedArm(): Array[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.graft.semanticSidedStorage", "NONE")
      try shipped(spark, sfDir).collect()
      finally spark.conf.unset("spark.graft.semanticSidedStorage")
    }

    def t(f: => Array[org.apache.spark.sql.Row]): (Double, Int) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r.length)
    }
    // third arm: lazy MEMORY_AND_DISK persist (the shipped AUTO gate path)
    def persistArm(): Array[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.graft.semanticSidedStorage", "MEMORY_AND_DISK")
      try shipped(spark, sfDir).collect()
      finally spark.conf.unset("spark.graft.semanticSidedStorage")
    }
    ckptArm(); persistArm() // warm
    val a = collection.mutable.Buffer[Double]()
    val b = collection.mutable.Buffer[Double]()
    val c = collection.mutable.Buffer[Double]()
    (1 to reps).foreach { i =>
      val (ts, ns) = t(shippedArm())
      val (tc, nc) = t(ckptArm())
      val (tp, np) = t(persistArm())
      require(ns == nc && ns == np, s"row counts diverge none=$ns ckpt=$nc persist=$np")
      spark.sharedState.cacheManager.clearCache()
      a += ts; b += tc; c += tp
      println(f"Q124AB rep=$i none=$ts%.3f localckpt=$tc%.3f persist=$tp%.3f rows=$ns")
    }
    def s(x: collection.mutable.Buffer[Double]) =
      f"min=${x.min}%.3f med=${x.sorted.apply(reps / 2)}%.3f"
    println(s"Q124AB-SUMMARY none ${s(a)} | localckpt ${s(b)} | persist ${s(c)}")
    spark.stop()
  }
}
