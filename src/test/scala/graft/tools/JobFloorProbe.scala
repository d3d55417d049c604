package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: raw RDD job vs SQL job floor. */
object JobFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def med(name: String, reps: Int = 15)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"JFLOOR $name%-40s med=${ts(ts.size / 2)}%.4f min=${ts.head}%.4f max=${ts.last}%.4f")
    }

    val one = sc.parallelize(Seq(1), 1)
    med("rdd 1-task count (reused RDD)") { one.count() }
    med("rdd 1-task count (fresh RDD)") { sc.parallelize(Seq(1), 1).count() }
    val thirtyTwo = sc.parallelize(1 to 32, 32)
    med("rdd 32-task count (reused RDD)") { thirtyTwo.count() }
    val df = spark.range(1)
    med("sql range(1) count (reused DF)") { df.count() }
    med("sql range(1) count (fresh DF)") { spark.range(1).count() }
    med("sql range(1) collect (reused DF)") { df.collect() }
    spark.stop()
  }
}
