package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.Present._

/** Scratch probe (round 14): q134 pair-stage A/B in ONE window on the real
  * q134 corpus (planted dups at +1e9) — the r13 window-cap + checkpoint +
  * posting self-join vs the r14 single bucket-aggregate pair generator.
  * Interleaved reps so host drift hits both.
  */
object Q134AB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val docs = docs0.unionByName(docs0.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))

    def fps() = {
      val fp = graft.expressions.TextStats.fingerprintCol(spark)(col("text"))
      docs.select(col("doc_id"), fp.as("checksum"))
        .withColumn("n_frames", (lit(1) + col("checksum") % 7).cast("int"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(sequence(0, n_frames - 1, 2), " +
              "i -> (checksum * 131L + CAST(i AS BIGINT) * 2654435761L) % 1048576))"))
            .as("fp"))
    }
    def oldShape() = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")
      val capped = fps()
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 1024)
        .drop("_rn").localCheckpoint(true)
      capped.select(col("doc_id").as("a"), col("fp"))
        .join(capped.select(col("doc_id").as("b"), col("fp")), "fp")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .presented("a", "b")
    }
    def newShape() = {
      fps().groupBy("fp")
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 1024).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> " +
            "transform(slice(ds, i + 2, size(ds) - i - 1), " +
            "y -> struct(x AS a, y AS b))))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .presented("a", "b")
    }
    def once(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    once(oldShape _); once(newShape _) // warm
    val olds = collection.mutable.Buffer[Double]()
    val news = collection.mutable.Buffer[Double]()
    (1 to 5).foreach { _ => olds += once(oldShape _); news += once(newShape _) }
    println(f"Q134AB old(window+join)  min=${olds.min}%.3f med=${olds.sorted.apply(2)}%.3f")
    println(f"Q134AB new(bucket-agg)   min=${news.min}%.3f med=${news.sorted.apply(2)}%.3f")
    spark.stop()
  }
}
