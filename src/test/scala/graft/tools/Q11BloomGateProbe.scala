package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** One-off diagnostic: which size gate keeps InjectRuntimeFilter from
  * planting `might_contain` on q11's lineitem side at bench scale? Sweeps
  * conf combos on session clones and reports whether the optimized plan
  * carries the filter. (r18, verdict Missing #3 precheck.)
  */
object Q11BloomGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val combos: Seq[(String, Map[String, String])] = Seq(
      "defaults" -> Map(),
      "appThresh0" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"),
      "appThresh0+create256m" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "256MB"),
      "appThresh0+create10t" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10TB"),
      "appThresh0+create10t+items1e9" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10TB",
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> "1000000000"),
      // isProbablyShuffleJoin = !canPlanAsBroadcastHashJoin: at bench scale
      // the filtered key side is broadcastable-by-size, so the rule sees no
      // shuffle worth saving — disabling auto-broadcast emulates the size
      // relationship a 100 TB run has
      "appThresh0+noBroadcast" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1"),
      "appThresh0+noBroadcast+create10t" -> Map(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10TB"))
    // (spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled was
    // REMOVED in Spark 4 — setting it raises configRemovedInVersionError)
    for ((name, confs) <- combos) {
      val s = spark.newSession()
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val plan = SparkEntry.queries("q11_star_join")(s, sfDir)
        .queryExecution.optimizedPlan.toString
      val bloom = plan.contains("might_contain")
      val semi = plan.contains("dynamicpruning") ||
        plan.toLowerCase.contains("in (list") || plan.contains("IN subquery")
      println(f"GATE $name%-32s bloom=$bloom semiRed=$semi")
    }
    // control: the same fact-side semi-join shape but with the selective
    // filter ON the key's own lineage table (orders) instead of on the
    // OTHER dimension (customer). If injection fires here and not above,
    // the blocker is structural: InjectRuntimeFilter's
    // extractSelectiveFilterOverScan tracks the creation-side key
    // (o_orderkey) down to the orders scan and requires a selective
    // predicate THERE — selectivity arriving through a join from another
    // dimension is invisible to it.
    {
      import org.apache.spark.sql.functions._
      val s = spark.newSession()
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = graft.Tables(s, sfDir)
      val keys = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val plan = t.lineitem
        .join(keys.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey")).agg(count(lit(1)))
        .queryExecution.optimizedPlan.toString
      println(s"GATE control-filter-on-key-lineage bloom=" +
        plan.contains("might_contain"))
    }
    spark.stop()
  }
}
