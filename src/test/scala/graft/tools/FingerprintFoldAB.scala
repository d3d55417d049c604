package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

import graft.{SparkEntry, Tables}

/** In-process A/B of the two fingerprint fold implementations over the
  * actual corpus text (r16): the UTF-8 byte fast-path versus the
  * String-allocating code-point loop it replaced. Values asserted equal
  * per row. Prints throughput; interleaved rounds so a host phase hits
  * both arms.
  */
object FingerprintFoldAB {
  private def foldCodePoints(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = Tables(spark, sfDir).documents
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    println(s"docs=${texts.length}")
    // equality
    texts.foreach { t =>
      require(graft.expressions.TextStats.fingerprint(t) == foldCodePoints(t))
    }
    var sink = 0L
    def time(f: UTF8String => Long): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < texts.length) { sink ^= f(texts(i)); i += 1 }
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 5).foreach { r =>
      val b = time(graft.expressions.TextStats.fingerprint)
      val c = time(foldCodePoints)
      println(f"FPAB round $r byte_path=$b%.3f codepoint_path=$c%.3f (sink=${sink % 10})")
    }
    spark.stop()
  }
}
