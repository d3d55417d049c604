package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Scratch probe (round 14): q81's recursive-CTE posture — the verdict's
  * standing question. The UnionLoop schedules one-or-more jobs per
  * iteration; under AQE every tiny per-iteration stage materializes as its
  * own job (the q85 finding). Times the SAME recursion under (a) the
  * current posture, (b) an AQE-off session clone, (c) AQE-off without the
  * frontier broadcast hint — min-of-5 fresh plans each, job counts.
  */
object Q81ShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    def run(name: String, sess: SparkSession, sql: String,
            edgeShape: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      def once(): Double = {
        Tables(sess, sfDir).orders.createOrReplaceTempView("orders")
        val edges = edgeShape(sess.sql(
          """SELECT o_custkey, o_orderkey,
                    LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next1,
                    LEAD(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2
             FROM orders""")).localCheckpoint(true)
        edges.createOrReplaceTempView("order_edges")
        val t0 = System.nanoTime()
        sess.sql(sql).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      Thread.sleep(200); jobs.set(0)
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"Q81SHAPE $name%-28s min=${ts.head}%.3f med=${ts(2)}%.3f  jobs/5=${jobs.get()}")
    }

    val body = Relational.recursiveChainBody
    run("current (aqe on)", spark, body)
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe off", off, body)
    run("aqe off, no bc hint", off, body.replace("/*+ BROADCAST(c) */ ", ""))
    run("aqe on, no bc hint", spark, body.replace("/*+ BROADCAST(c) */ ", ""))
    import org.apache.spark.sql.functions.col
    run("aqe on, edges coalesce 8", spark, body, _.coalesce(8))
    run("aqe off, edges coalesce 8", off, body, _.coalesce(8))
    run("aqe on, edges coalesce 4", spark, body, _.coalesce(4))
    run("aqe off, keyed 32 + shj", off,
      body.replace("BROADCAST(c)", "SHUFFLE_HASH(c)"),
      _.repartition(32, col("o_custkey"), col("o_orderkey")))
    run("aqe off, keyed 8 + shj", off,
      body.replace("BROADCAST(c)", "SHUFFLE_HASH(c)"),
      _.repartition(8, col("o_custkey"), col("o_orderkey")))
    // ---- end-to-end variants: edges build INSIDE the timed region (what
    // Bench actually measures), conf-scoped sessions
    def runE2e(name: String, sess: SparkSession, sql: String,
               edgeShape: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Tables(sess, sfDir).orders.createOrReplaceTempView("orders")
        val edges = edgeShape(sess.sql(
          """SELECT o_custkey, o_orderkey,
                    LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next1,
                    LEAD(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2
             FROM orders""")).localCheckpoint(true)
        edges.createOrReplaceTempView("order_edges")
        sess.sql(sql).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      Thread.sleep(200); jobs.set(0)
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"Q81E2E $name%-30s min=${ts.head}%.3f med=${ts(2)}%.3f  jobs/5=${jobs.get()}")
    }
    runE2e("current (aqe on, 32)", spark, body)
    val p8 = spark.newSession()
    p8.conf.set("spark.sql.adaptive.enabled", "false")
    p8.conf.set("spark.sql.shuffle.partitions", "8")
    runE2e("aqe off, sp=8, bc", p8, body)
    runE2e("aqe off, sp=8, shj", p8, body.replace("BROADCAST(c)", "SHUFFLE_HASH(c)"))
    runE2e("aqe off, sp=32, coalesce8 bc", off, body, _.coalesce(8))
    // pre-shaping the WINDOW INPUT at 8 by the window's own partition key:
    // the window then needs no second exchange and edges land 8-wide with
    // no session conf involved
    def preShaped(sess: SparkSession): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val o8 = Tables(sess, sfDir).orders.repartition(8, col("o_custkey"))
        o8.createOrReplaceTempView("orders")
        val edges = sess.sql(
          """SELECT o_custkey, o_orderkey,
                    LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next1,
                    LEAD(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2
             FROM orders""").localCheckpoint(true)
        edges.createOrReplaceTempView("order_edges")
        sess.sql(body).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); Thread.sleep(200); jobs.set(0)
      val ts = (1 to 5).map(_ => once()).sorted
      val tag = if (sess eq spark) "aqe on" else "aqe off"
      println(f"Q81E2E pre-shaped rep8 $tag%-8s min=${ts.head}%.3f med=${ts(2)}%.3f  jobs/5=${jobs.get()}")
    }
    preShaped(spark)
    preShaped(off)
    // the REAL query fn (clone per call + checkpoint handoff + final sort)
    def runFn(name: String): Unit = {
      val fn = graft.SparkEntry.freshQueries("q81_recursive_cte")
      fn(spark, sfDir).collect(); Thread.sleep(200)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"Q81E2E $name%-30s min=${ts.head}%.3f med=${ts(2)}%.3f")
    }
    runFn("real fn (clone per call)")
    // isolate: clone per call, but collect IN the clone (no handoff/sort)
    def runClonePerCall(): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.adaptive.enabled", "false")
        s2.conf.set("spark.sql.shuffle.partitions", "8")
        Tables(s2, sfDir).orders.createOrReplaceTempView("orders")
        val edges = s2.sql(
          """SELECT o_custkey, o_orderkey,
                    LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next1,
                    LEAD(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2
             FROM orders""").localCheckpoint(true)
        edges.createOrReplaceTempView("order_edges")
        s2.sql(body).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); Thread.sleep(200)
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"Q81E2E clone-per-call, no handoff    min=${ts.head}%.3f med=${ts(2)}%.3f")
    }
    runClonePerCall()
    spark.stop()
  }
}
