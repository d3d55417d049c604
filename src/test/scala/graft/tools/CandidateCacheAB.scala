package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch A/B (r19, committed rejection — Q124_CANDCACHE_AB.json): cache
  * the candidate-stage input of the LSH/semantic dedup family?
  *
  * boundedCandidates consumes its signature table four times (a/b sides of
  * the in-cap self-join + a/b sides of the chain leg) and the static plan
  * shows the signature subtree four times with zero ReusedExchange, so a
  * MEMORY_AND_DISK persist of that input looked like an obvious win — and
  * a FLAWED protocol confirmed it: with the centroid frame memoized across
  * reps, a re-built identical plan HIT THE PRIOR REP'S CACHE (CacheManager
  * matches canonicalized plans), so the persist arm measured cross-run
  * cache reuse, not the within-run benefit (med 0.59 s vs 0.86 s — the
  * exact flattery the bench's fresh-plan + clearCache methodology exists
  * to prevent).
  *
  * Under the honest protocol — clearCache after EVERY run, so each sample
  * pays its own cache build — the persist LOSES on every family member at
  * sf0.1 (hook-based sweep before the hook was reverted, min/med of 6-10):
  *   q41  minhash   none 0.790/0.813  persist 1.058/1.277
  *   q42  simhash   none 0.595/0.614  persist 0.955/1.012
  *   q56  emb LSH   none 0.319/0.332  persist 0.422/0.466
  *   q124 semantic  none 0.777/0.884  persist 0.869/0.969
  *   q135 sampled   none 0.789/0.830  persist 0.935/0.955
  * The columnar cache build + InMemoryTableScan reads cost more than the
  * four recomputes of a scan-side codegen kernel at any gate-eligible
  * scale, and at 100 TB an input-sized cache is unholdable anyway (the
  * q115 containment-gram lesson) — REJECTED at all scales, shipped shape
  * unchanged (recompute per consumer).
  *
  * This probe keeps the rejection reproducible without prod hooks: it
  * replicates the q124 pipeline inline (same operators) and races
  * none vs persist vs eager localCheckpoint with per-run cache clears.
  * Args: [reps].
  */
object CandidateCacheAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Present._
    val cosF = graft.functions.VectorFunctions.cosineNative(spark) _
    val dotF = graft.functions.VectorFunctions.dotNative(spark) _
    val nrmF = graft.functions.VectorFunctions.normNative(spark)(_)
    val rndF = graft.functions.VectorFunctions.roundNative(spark) _

    // inline replica of the q124 pipeline (cells -> sided -> bounded
    // candidates -> cosine verify), parameterized on how `sided` is reused
    def q124Like(mode: String): Array[org.apache.spark.sql.Row] = {
      val emb = graft.Tables(spark, sfDir).embeddings
      val cent = graft.operators.Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
      val assigned = emb.select(col("vec_id").as("_id"), col("embedding").as("_v"))
        .join(broadcast(cent))
        .select(col("_id"), col("cent_id"), rndF(cosF(col("_v"), col("cvec")), 6).as("_s"))
      val cells = graft.operators.Similarity.topKPerGroup(assigned, "_id", "_s", "cent_id", 1)
        .select(col("_id"), col("cent_id"))
      val sided0 = cells.join(emb.select(col("vec_id").as("_id"), col("embedding").as("_v"),
        nrmF(col("embedding")).as("_n")), "_id")
      val sided = mode match {
        case "persist" => sided0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        case "ckpt" => sided0.localCheckpoint(true)
        case _ => sided0
      }
      // boundedCandidates replica (maxCell 4096): in-cap exhaustive pairs
      // + chain pairs for over-cap buckets
      val w = Window.partitionBy(col("cent_id"))
      val ranked = sided.withColumn("_rn", row_number().over(w.orderBy(col("_id"))))
        .withColumn("_bsz", count(lit(1)).over(w))
      def side(df: DataFrame, tag: String, rn: Option[org.apache.spark.sql.Column]) =
        df.select(col("_id").as(tag) +: Seq(col("_v").as(s"_v_$tag"), col("_n").as(s"_n_$tag")) ++:
          Seq(col("cent_id")) ++: rn.map(_.as("_rnk")).toSeq: _*)
      val small = ranked.filter(col("_bsz") <= 4096)
      val big = ranked.filter(col("_bsz") > 4096)
      val outCols = Seq(col("a"), col("b"), col("_v_a"), col("_v_b"), col("_n_a"), col("_n_b"))
      val cands = side(small, "a", None).join(side(small, "b", None), "cent_id")
        .filter(col("a") < col("b")).select(outCols: _*)
        .unionByName(side(big, "a", Some(col("_rn")))
          .join(side(big, "b", Some(col("_rn") - 1)), Seq("cent_id", "_rnk"))
          .select(outCols: _*))
      val res = cands.select(col("a"), col("b"),
        rndF(dotF(col("_v_a"), col("_v_b")) / (col("_n_a") * col("_n_b")), 6).as("sim"))
        .filter(col("sim") >= 0.35)
        .presented("a", "b").collect()
      spark.sharedState.cacheManager.clearCache()
      res
    }
    Seq("none", "persist", "ckpt").foreach(q124Like) // warm
    val t = collection.mutable.Map[String, collection.mutable.Buffer[Double]]()
    (1 to reps).foreach { _ =>
      var n = -1
      Seq("none", "persist", "ckpt").foreach { m =>
        val t0 = System.nanoTime()
        val r = q124Like(m)
        t.getOrElseUpdate(m, collection.mutable.Buffer()) +=
          (System.nanoTime() - t0) / 1e9
        if (n < 0) n = r.length else require(n == r.length, s"rows diverge at $m")
      }
    }
    t.toSeq.sortBy(_._1).foreach { case (m, xs) =>
      println(f"CANDCACHE $m%-8s min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
