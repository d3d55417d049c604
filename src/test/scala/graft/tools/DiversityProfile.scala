package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.{Curation, TextAnalysis}

/** Scratch probe (round 14): where does q123's sf1 wall actually go?
  * The verdict's standing question — the one corpus-wide exchange vs the
  * gram generation (split + explode + array_distinct) vs the final
  * sources-sized aggregate. Stages are timed cumulatively so the deltas
  * isolate each component.
  */
object DiversityProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents

    def time(name: String)(f: => Long): Unit = {
      f; f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-34s min=${ts.min}%6.3f s med=${ts.sorted.apply(1)}%6.3f s")
    }

    val base = docs.filter(length(trim(col("text"))) > 0)
      .select(col("source"), split(trim(col("text")), " +").as("_toks"))
    time("scan+split only") {
      base.select(count(lit(1))).collect()(0).getLong(0)
    }
    time("scan+split+size-sum") {
      base.select(sum(size(col("_toks")))).collect()(0).getLong(0)
    }
    val tokOnly = base.select(col("source"), explode(col("_toks")).as("g"))
    time("explode tokens, no agg") {
      tokOnly.select(count(lit(1))).collect()(0).getLong(0)
    }
    val grams = base.select(col("source"),
      explode(concat(col("_toks"),
        array_distinct(Curation.wordNgramsOfTokens(col("_toks"), 2)))).as("g"))
    time("explode tok+bigram, no agg") {
      grams.select(count(lit(1))).collect()(0).getLong(0)
    }
    val perGram = grams
      .groupBy(col("source"), col("g"))
      .agg(count(when(!col("g").contains(" "), lit(1))).as("tok_occ"))
    time("perGram distinct agg") {
      perGram.select(count(lit(1))).collect()(0).getLong(0)
    }
    // round-14 shape: the native tagged gram stream replacing the
    // higher-order-function composition above (each stage builds a FRESH
    // Dataset inside the timed thunk — re-collecting the same instance
    // reuses its shuffle files and reads ~0.04 s, an artifact)
    def gramsNative() = docs
      .select(col("source"),
        explode(graft.expressions.TextSignatures
          .gramStreamCol(spark)(coalesce(col("text"), lit("")))).as("e"))
    time("explode native gramStream") {
      gramsNative().select(count(lit(1))).collect()(0).getLong(0)
    }
    def perGramNative() = gramsNative()
      .select(col("source"), col("e.fam").as("fam"), col("e.g").as("g"))
      .groupBy("source", "fam", "g")
      .agg(count(lit(1)).as("occ"))
    time("native perGram agg") {
      perGramNative().select(count(lit(1))).collect()(0).getLong(0)
    }
    time("native toks agg") {
      perGramNative().groupBy("source")
        .agg(sum(when(col("fam") === 2, col("occ")).otherwise(lit(0L))).as("n_docs"),
          sum(when(col("fam") === 0, col("occ")).otherwise(lit(0L))).as("total_tokens"),
          count(when(col("fam") === 0, 1)).as("distinct_tokens"),
          count(when(col("fam") === 1, 1)).as("distinct_bigrams"))
        .collect().length.toLong
    }
    time("full q123") {
      TextAnalysis.corpusDiversity(docs, "source", "text").collect().length.toLong
    }
    spark.stop()
  }
}
