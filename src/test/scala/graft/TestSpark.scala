package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Test / fork gives the JVM
  * a single lifetime; suites must not stop it).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkEntry.configure(
      SparkSession.builder()
        .master("local[4]")
        // the deployment path for the native functions — every suite runs
        // against a session where graft_* resolves from pure SQL
        .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
          s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
