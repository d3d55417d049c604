package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.operators.TextAnalysis

/** Throwaway A/B: PMI with corpus re-scanned per aggregate (3 scans) vs
  * folded from the bigram table (1 corpus exchange) at 5k and 500k docs. */
object PmiProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def bigrams(docs: DataFrame) =
      docs.filter(TextAnalysis.wsTokenCount(col("text")) >= 2)
        .select(split(trim(col("text")), " +").as("_t"))
        .select(explode(expr(
          "transform(sequence(0, size(_t) - 2), i -> struct(_t[i] AS w1, _t[i + 1] AS w2))")).as("_p"))
        .select(col("_p.w1"), col("_p.w2"))
    def oldForm(docs: DataFrame): DataFrame = {
      val bg = bigrams(docs)
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val uni = bg.select(col("w1").as("w")).unionAll(bg.select(col("w2").as("w")))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val n = bg.count()
      c12.filter(col("c12") >= 5)
        .join(uni.select(col("w").as("w1"), col("c1").as("_ca")), "w1")
        .join(uni.select(col("w").as("w2"), col("c1").as("_cb")), "w2")
        .select(col("w1"), col("w2"), col("c12"),
          round(log((col("c12").cast("double") * n) /
            (col("_ca").cast("double") * col("_cb"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
    }
    def time(name: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f; val t1 = System.nanoTime(); f
      println(f"PMIPROBE $name%-18s ${(t1 - t0) / 1e9}%6.2f ${(System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    for ((tag, path) <- Seq("5k" -> "/root/testdata/sf0.1/documents.parquet",
                            "500k" -> "/tmp/graft_scale100/docs_100")) {
      val docs = spark.read.parquet(path)
      time(s"old_3scan_$tag") { oldForm(docs).collect() }
      time(s"new_1exch_$tag") { TextAnalysis.pmiCollocations(docs, "text", 20).collect() }
    }
    spark.stop()
  }
}
