package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.Present._

/** A/B of q07's join strategy (r15): LEFT OUTER preserves customer, so
  * BuildRight is forced and Catalyst broadcasts the ORDERS side (under
  * the 10 MB at-rest threshold) — probing the single-split customer scan
  * means the fact-sized join output materializes on ONE task, and the
  * range sort's sampling pass re-executes that serial join. The shuffled
  * variants exchange both sides and join 32-wide. Rows asserted
  * identical. Writes Q07_JOIN_AB.json.
  */
object Q07JoinAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q07(hint: Option[String]): DataFrame = {
      val t = Tables(spark, sfDir)
      val orders = hint.map(t.orders.hint(_)).getOrElse(t.orders)
      t.customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
        .presented("c_custkey", "ok")
    }
    def rows(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val base = rows(q07(None))
    for (h <- Seq("shuffle_hash", "merge"))
      require(rows(q07(Some(h))) == base, s"$h rows differ")

    def time(f: => Unit): (Double, Double) = {
      val ts = (1 to (reps + 1)).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      (ts(ts.size / 2), ts.head)
    }
    val (bMed, bMin) = time(q07(None).collect())
    val (hMed, hMin) = time(q07(Some("shuffle_hash")).collect())
    val (mMed, mMin) = time(q07(Some("merge")).collect())
    val json =
      f"""{
         | "sf": "$sfDir", "reps": $reps, "rows": ${base.size},
         | "default_broadcast_orders_med_s": $bMed%.3f, "default_min_s": $bMin%.3f,
         | "shuffle_hash_med_s": $hMed%.3f, "shuffle_hash_min_s": $hMin%.3f,
         | "sort_merge_med_s": $mMed%.3f, "sort_merge_min_s": $mMin%.3f,
         | "note": "rows asserted identical across strategies, full query incl. the derived range presentation sort"
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("Q07_JOIN_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
