package graft.tools
import org.apache.spark.sql.SparkSession
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = spark.sql("""SELECT variant_get(parse_json('{"a": {"b": [1, 2, 3]}}'), '$.a.b[1]', 'int') AS x""").collect()(0)
      println(s"VARIANT_OK x=${r.get(0)}")
      val s = spark.sql("""SELECT CAST(variant_get(parse_json('{"k": "v"}'), '$.k') AS STRING) AS x""").collect()(0)
      println(s"VARIANT_STR x=${s.get(0)}")
    } catch { case e: Throwable => println(s"VARIANT_FAIL ${e.getMessage.take(150)}") }
    spark.stop()
  }
}
