package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{PostureSessions, SparkEntry, Tables}

/** q81 stride-2 probe (round 16, verdict task 7): the recursion is
  * depth-bounded (pos < 4), and the r14 posture work established that its
  * wall is per-iteration machinery, not data. Two hops per materialized
  * iteration — iterate `next2` (positions 1, 3), then fill the even
  * positions with ONE static 1-hop join — reaches the same fixpoint with
  * half the recursion rounds. Both forms run on the same memoized posture
  * clone (AQE off, 8-wide) with the same eager-sort handoff; rows asserted
  * identical. Writes Q81_STRIDE_AB.json.
  */
object Q81StrideProbe {
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

    def strideChain(s: SparkSession): DataFrame = {
      val sess = PostureSessions(s, Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"))
      Tables(sess, sfDir).orders.createOrReplaceTempView("orders")
      val edges2 = sess.sql(
        """SELECT o_custkey, o_orderkey,
                  LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next1,
                  LEAD(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2
           FROM orders""").localCheckpoint(true)
      edges2.createOrReplaceTempView("order_edges2")
      val chain = sess.sql(
        """WITH RECURSIVE codd AS (
             SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT) AS pos
             FROM (SELECT o_custkey, MIN(o_orderkey) AS o_orderkey FROM orders GROUP BY o_custkey) heads
             UNION ALL
             SELECT /*+ BROADCAST(c) */ c.o_custkey, n.next2 AS o_orderkey, c.pos + 2 AS pos
             FROM codd c JOIN order_edges2 n
               ON n.o_custkey = c.o_custkey AND n.o_orderkey = c.o_orderkey
             WHERE n.next2 IS NOT NULL AND c.pos < 3)
           SELECT o_custkey, o_orderkey, pos FROM codd
           UNION ALL
           SELECT /*+ BROADCAST(c) */ c.o_custkey, n.next1 AS o_orderkey, c.pos + 1 AS pos
           FROM codd c JOIN order_edges2 n
             ON n.o_custkey = c.o_custkey AND n.o_orderkey = c.o_orderkey
           WHERE n.next1 IS NOT NULL AND c.pos + 1 <= 4""")
      val done = chain.orderBy("o_custkey", "pos").localCheckpoint(true)
      val vn = s"graft_q81s_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      done.createOrReplaceGlobalTempView(vn)
      val back = try s.table(s"global_temp.$vn")
        finally s.catalog.dropGlobalTempView(vn)
      back.orderBy("o_custkey", "pos")
    }

    def shipped(s: SparkSession): DataFrame =
      SparkEntry.freshQueries("q81_recursive_cte")(s, sfDir)

    // row identity first
    val a = shipped(spark).collect().map(_.toString).sorted.toSeq
    val b = strideChain(spark).collect().map(_.toString).sorted.toSeq
    require(a == b, s"stride-2 chain != shipped chain: ${a.size} vs ${b.size} rows")
    println(s"Q81STRIDE identity ok over ${a.size} rows")

    def stats(f: => Unit): (Double, Double) = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(ts.size / 2), ts.head)
    }
    val (shipMed, shipMin) = stats(shipped(spark).collect())
    val (strMed, strMin) = stats(strideChain(spark).collect())
    println(f"Q81STRIDE shipped med=$shipMed%.3f min=$shipMin%.3f  stride2 med=$strMed%.3f min=$strMin%.3f")
    val json =
      s"""{
 "sf": "$sfDir", "reps": $reps,
 "shipped_3_iterations": {"med": ${f"$shipMed%.3f"}, "min": ${f"$shipMin%.3f"}},
 "stride2_2_iterations_plus_static_join": {"med": ${f"$strMed%.3f"}, "min": ${f"$strMin%.3f"}},
 "note": "q81 end-to-end (collect-drained, fresh plans, same posture clone + eager-sort handoff both sides, rows asserted identical). stride2 iterates LEAD(.,2) edges (positions 1,3 - two recursion rounds instead of three) and fills even positions with one static 1-hop join unioned outside the recursion; the edge checkpoint carries both LEADs in the same window (one extra column, same exchange)."
}
"""
    java.nio.file.Files.write(java.nio.file.Paths.get("Q81_STRIDE_AB.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
