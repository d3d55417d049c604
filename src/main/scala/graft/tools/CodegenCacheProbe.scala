package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: is the 1s fresh-plan cost of big-expression queries a
  * per-plan codegen recompile (Janino cache miss), and does the generated
  * source differ across plan instances?
  */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.freshQueries(args.headOption.getOrElse("q47_text_langid"))
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      println(f"RUN $i fresh collect ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // compare generated source of two fresh plans
    def src(): String = {
      val df = fn(spark, sfDir)
      org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    }
    val s1 = src(); val s2 = src()
    println(s"SOURCE equal=${s1 == s2} len=${s1.length}")
    if (s1 != s2) {
      val diffAt = s1.zip(s2).indexWhere { case (a, b) => a != b }
      println(s"first diff at $diffAt:")
      println("A: " + s1.slice(math.max(0, diffAt - 120), diffAt + 120).replaceAll("\n", "\\\\n"))
      println("B: " + s2.slice(math.max(0, diffAt - 120), diffAt + 120).replaceAll("\n", "\\\\n"))
    }
    spark.stop()
  }
}
