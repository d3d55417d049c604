package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.MergeUpsert

/** Scratch A/B (r20, verdict item 5): the q90/q107 changeset is a 3-leg
  * union (three filter-pruned scans of orders); probe the one-scan rewrite
  * (single scan + explode of up-to-3 op structs per row) the r19 notes
  * called job-floor-ruled. Row identity asserted; arms alternate. Args:
  * [reps].
  */
object ChangesetShapeAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.sql.warehouse.dir",
          sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
            graft.StageDir.scratchBase + "/graft_warehouse"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def orders = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")

    // OLD 3-leg-union shape, reconstructed inline (the shipped
    // MergeUpsert.changeset is the one-scan form since r20)
    def changesetUnion(o: DataFrame): DataFrame = {
      val k = col("o_orderkey")
      o.filter(k % 7 === 0 && k % 11 =!= 0)
        .select(k, lit("U").as("op"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
        .unionByName(o.filter(k % 11 === 0)
          .select(k, lit("D").as("op"), col("o_custkey"),
            lit(null).cast("double").as("o_totalprice")))
        .unionByName(o.filter(k % 13 === 0)
          .select((-k - 1).as("o_orderkey"), lit("I").as("op"),
            col("o_custkey"), col("o_totalprice")))
    }

    // one-scan changeset: per row, up to three op structs, exploded
    def changesetOneScan(o: DataFrame): DataFrame = {
      val k = col("o_orderkey")
      o.select(explode(array(
        when(k % 7 === 0 && k % 11 =!= 0, struct(
          k.as("o_orderkey"), lit("U").as("op"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))),
        when(k % 11 === 0, struct(
          k.as("o_orderkey"), lit("D").as("op"), col("o_custkey"),
          lit(null).cast("double").as("o_totalprice"))),
        when(k % 13 === 0, struct(
          (-k - 1).as("o_orderkey"), lit("I").as("op"), col("o_custkey"),
          col("o_totalprice").as("o_totalprice")))
      )).as("r")).filter(col("r").isNotNull).select(col("r.*"))
    }

    def q90Old() = MergeUpsert.merge(orders, changesetUnion(orders), "o_orderkey")
    def q90New() = MergeUpsert.merge(orders, changesetOneScan(orders), "o_orderkey")
    def q107Old() = {
      val o = orders
      MergeUpsert.maintainCounts(
        o.groupBy("o_custkey").agg(count(lit(1)).as("n")),
        changesetUnion(o), "o_custkey")
    }
    def q107New() = {
      val o = orders
      MergeUpsert.maintainCounts(
        o.groupBy("o_custkey").agg(count(lit(1)).as("n")),
        changesetOneScan(o), "o_custkey")
    }

    // plans-only mode: the changeset subtree's formatted plans (the
    // declared q90/q107 plans hide it behind merge's localCheckpoint RDD)
    if (args.contains("plans")) {
      val dir = java.nio.file.Paths.get("plans/r20")
      java.nio.file.Files.createDirectories(dir)
      def planOf(df: DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "\n"
      java.nio.file.Files.write(dir.resolve("q90_changeset_before.txt"),
        planOf(changesetUnion(orders)).getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("q90_changeset_after.txt"),
        planOf(MergeUpsert.changeset(orders)).getBytes("UTF-8"))
      println("CSAB plans written")
      spark.stop(); return
    }
    // row identity on the changeset itself and on both query outputs
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    require(rows(changesetUnion(orders)) == rows(changesetOneScan(orders)),
      "changeset rows diverged")
    require(rows(q90Old()) == rows(q90New()), "q90 rows diverged")
    require(rows(q107Old()) == rows(q107New()), "q107 rows diverged")
    println("CSAB identity ok")

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    Seq(() => q90Old(), () => q90New(), () => q107Old(), () => q107New())
      .foreach(f => noop(f())) // warm
    val arms = Seq("q90_old" -> (() => q90Old()), "q90_new" -> (() => q90New()),
      "q107_old" -> (() => q107Old()), "q107_new" -> (() => q107New()))
    val acc = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to reps; (n, f) <- arms) {
      val t0 = System.nanoTime()
      noop(f())
      acc(n) = (System.nanoTime() - t0) / 1e9 :: acc(n)
    }
    for ((n, ts0) <- acc.toSeq.sortBy(_._1)) {
      val ts = ts0.sorted
      println(f"CSAB $n med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
