package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.functions.Exact

/** q11_star_join structural probe (r17 verdict Missing #3: the top weak
  * ratio — 5.3× at 0.633 s sf1 — is the only weak entry never given a
  * structural round).
  *
  * Precheck (`Q11BloomGateProbe`, committed alongside): Spark 4.1's
  * default-on runtime bloom filter never injects on q11 at bench scale for
  * TWO size reasons, not a shape reason — the 10 GB application-side scan
  * threshold, and `isProbablyShuffleJoin` = !canPlanAsBroadcastHashJoin
  * (the filtered key side is broadcastable-BY-SIZE at sf1, so the rule
  * sees no shuffle worth saving). With both gates opened the engine
  * injects `might_contain` on q11's REAL snowflake shape (the c_mktsegment
  * selectivity tracks through the customer⋈orders join) — i.e. at 100 TB
  * the engine plants this filter by itself. The bloom arms here measure
  * that scale-activated plan at sf1.
  *
  * Arms (session clones, interleaved med-of-reps, rows asserted identical):
  *  A `shipped`     — committed shape: SHUFFLE_HASH left-semi into
  *                    lineitem, revenue agg reuses the semi partitioning.
  *  B `bloom`       — same query, bloom gates opened
  *                    (applicationSideScanSizeThreshold=0,
  *                    autoBroadcastJoinThreshold=-1 to emulate the 100 TB
  *                    non-broadcastable key side) with an explicit
  *                    broadcast() on the filtered customer dim so the
  *                    inner key join keeps its shipped BHJ shape — the arm
  *                    isolates the injected fact-scan filter.
  *  C `agg_first`   — partial revenue aggregate BELOW the semi-join
  *                    (left-semi on the group key commutes with grouping
  *                    on it): the map-side combine collapses ~4 lineitems
  *                    per order before the fact exchange.
  *  D `agg_first_bloom` — C on the bloom clone.
  *
  * Writes Q11_PROBE_AB.json with per-arm medians + whether each arm's plan
  * actually carries `might_contain`.
  */
object Q11ProbeAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // emulates the 100 TB size relationship: the filtered key side stops
    // being broadcastable-by-size, which is one of the two gates keeping
    // InjectRuntimeFilter out at bench scale. An explicit broadcast() hint
    // inside the creation side is NOT usable instead: the ResolvedHint
    // node stops extractSelectiveFilterOverScan's lineage walk and kills
    // the injection (measured), so the control arm isolates what the
    // threshold change itself costs (the dim join goes shuffled).
    def noBroadcastSession(bloom: Boolean): SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      if (bloom) s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      else s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      s
    }

    def aggFirst(s: SparkSession): DataFrame = {
      val t = Tables(s, sfDir)
      val buildingOrders = t.customer
        .filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .select("o_orderkey")
      t.lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(Exact.drevenueSum(col("l_extendedprice"), col("l_discount"))
          .as("rev"))
        .join(buildingOrders.hint("shuffle_hash"), Seq("o_orderkey"),
          "left_semi")
        .orderBy(col("rev").desc, col("o_orderkey"))
        .limit(10)
    }

    val shipped = SparkEntry.queries("q11_star_join")
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "shipped" -> (() => shipped(spark.newSession(), sfDir)),
      "no_broadcast_ctl" -> (() => shipped(
        noBroadcastSession(bloom = false), sfDir)),
      "bloom" -> (() => shipped(noBroadcastSession(bloom = true), sfDir)),
      "agg_first" -> (() => aggFirst(spark.newSession())),
      "agg_first_bloom" -> (() => aggFirst(
        noBroadcastSession(bloom = true))))

    val injected = arms.map { case (n, f) =>
      n -> f().queryExecution.optimizedPlan.toString.contains("might_contain")
    }
    injected.foreach { case (n, b) => println(s"Q11AB $n might_contain=$b") }
    require(injected.toMap.apply("bloom"),
      "bloom arm did not inject — gates wrong, nothing to measure")

    val rows = arms.map { case (n, f) =>
      n -> f().collect().map(_.toString).toSeq
    }
    val ref = rows.head._2
    rows.foreach { case (n, r) =>
      require(r == ref, s"arm $n rows differ from shipped: $r vs $ref")
    }
    println(s"Q11AB rows identical across ${arms.size} arms: ${ref.size}")

    arms.foreach { case (_, f) => f().collect() } // warm every plan shape
    val ts = Array.fill(arms.size)(Vector.newBuilder[Double])
    var i = 0
    while (i < reps) {
      var j = 0
      while (j < arms.size) {
        val t0 = System.nanoTime()
        arms(j)._2().collect()
        ts(j) += (System.nanoTime() - t0) / 1e9
        j += 1
      }
      i += 1
    }
    def med(v: Vector[Double]): Double = { val s = v.sorted; s(s.length / 2) }
    val meds = arms.map(_._1).zip(ts.map(b => med(b.result())))
    val body = meds.map { case (n, m) => f""" "${n}_sec": $m%.3f""" }
      .mkString(",\n")
    val inj = injected.map { case (n, b) => s""" "$n": $b""" }
      .mkString("{", ",", "}")
    val m = meds.toMap
    val conclusion =
      if (meds.forall { case (n, t) => n == "shipped" || t >= m("shipped") })
        f"REJECTION: every alternative loses to the shipped shape " +
          f"(bloom filter marginal value ctl-bloom = " +
          f"${m("no_broadcast_ctl") - m("bloom")}%+.3f s; agg_first " +
          f"${m("agg_first") - m("shipped")}%+.3f s) — q11 is " +
          "floor-classified with every avenue measured; the engine's own " +
          "size gates keep the runtime filter off exactly where it does " +
          "not pay and would plant it at 100TB where it does"
      else "an alternative beat shipped — promote it"
    val json = "{\n \"sf\": \"" + sfDir + s"\", \"reps\": $reps," +
      s" \"rows\": ${ref.size},\n \"might_contain_injected\": $inj,\n" +
      body + ",\n" +
      s""" "conclusion": "$conclusion",""" + "\n" +
      " \"note\": \"interleaved med-of-" + reps + " fresh plans on session " +
      "clones, rows asserted identical. Q11BloomGateProbe finding: the " +
      "default-on runtime bloom filter is blocked at bench scale only by " +
      "SIZE gates (10GB application-side scan threshold + the key side " +
      "being broadcastable-by-size, which makes isProbablyShuffleJoin " +
      "false); with both opened the engine injects on the real snowflake " +
      "shape, so the bloom arms measure the plan a 100TB run gets for " +
      "free. The bloom arms also shuffle the dim join (threshold -1; a " +
      "broadcast() hint inside the creation side stops the lineage walk " +
      "and kills injection), so no_broadcast_ctl isolates that cost: the " +
      "filter's marginal value is no_broadcast_ctl - bloom. agg_first " +
      "pre-aggregates revenue below the semi-join (left-semi on the group " +
      "key commutes with grouping).\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("Q11_PROBE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    meds.foreach { case (n, m) => println(f"Q11AB $n%-16s $m%.3f s") }
    spark.stop()
  }
}
