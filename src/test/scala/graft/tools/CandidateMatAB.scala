package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch A/B (r19): the candidate-input eager-checkpoint gate
  * (Dedup.materializeCandidateInput) at the declared-query level across
  * its five consumers — q41 minhash, q42 simhash, q56 embedding LSH,
  * q124/q135 semantic. Arms alternate in one window, cache cleared after
  * EVERY run so each sample pays its own materialization (the honest
  * protocol — see CandidateCacheAB for why lazy persist's apparent win
  * under a cross-rep-reuse protocol was a measurement artifact).
  * Args: [reps] [query substrings...].
  */
object CandidateMatAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val filters =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q41", "q42", "q56", "q124", "q135")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.freshQueries.keys.toSeq.sorted
      .filter(n => filters.exists(n.contains))
    names.foreach { n =>
      val fn = SparkEntry.freshQueries(n)
      def run(mode: String): (Double, Int) = {
        spark.conf.set("spark.graft.candidateInputMaterialize", mode)
        try {
          val t0 = System.nanoTime()
          val r = fn(spark, sfDir).collect()
          ((System.nanoTime() - t0) / 1e9, r.length)
        } finally {
          spark.conf.unset("spark.graft.candidateInputMaterialize")
          spark.sharedState.cacheManager.clearCache()
        }
      }
      run("NONE"); run("AUTO") // warm
      val a = collection.mutable.Buffer[Double]()
      val b = collection.mutable.Buffer[Double]()
      (1 to reps).foreach { _ =>
        val (tn, nn) = run("NONE")
        val (ta, na) = run("AUTO")
        require(nn == na, s"$n row counts diverge none=$nn auto=$na")
        a += tn; b += ta
      }
      def s(x: collection.mutable.Buffer[Double]) =
        f"min=${x.min}%.3f med=${x.sorted.apply(reps / 2)}%.3f"
      println(s"CANDMAT $n none ${s(a)} | ckpt ${s(b)}")
    }
    spark.stop()
  }
}
