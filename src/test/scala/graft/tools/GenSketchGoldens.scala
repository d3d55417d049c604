package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Generates the ENGINE-SEEDED goldens for the two approximate-sketch
  * queries (q15 HLL approx-distinct, q69 CMS point estimates), upgrading
  * them from rows-only to value-exact certification.
  *
  * Unlike the LSH goldens (independent Python recompute of published
  * algorithms), a faithful independent HLL++/CMS reimplementation IS the
  * engine's own algorithm — so these goldens pin the engine's current,
  * seed-deterministic output instead (a regression pin, declared as such).
  * Determinism holds because both sketches are merge-order-independent
  * (HLL registers take per-register max; CMS counters add), so the value
  * is a pure function of the corpus + seed, not of partitioning.
  *
  * One golden file serves every scale factor: each row carries exact
  * integer `corpus_tag`/`corpus_n` checksums of its input table and the
  * oracle selects rows whose checksums match the corpus at hand — the
  * same pattern as `tools/gen_lsh_goldens.py`.
  *
  * Emits one JSON line per query on stdout; `tools/gen_sketch_goldens.py`
  * turns them into the committed single-file parquet goldens.
  */
object GenSketchGoldens {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

    val q15 = sfs.map { dir =>
      val tag = Tables(spark, dir).orders
        .agg(sum("o_custkey").as("t"), count(lit(1)).as("n")).head
      val v = SparkEntry.queries("q15_approx_distinct")(spark, dir).head.getLong(0)
      s"""{"corpus_tag":${tag.getLong(0)},"corpus_n":${tag.getLong(1)},"u_approx":$v}"""
    }
    println(s"""GOLDEN q15_approx_distinct [${q15.mkString(",")}]""")

    val q69 = sfs.flatMap { dir =>
      val tag = Tables(spark, dir).lineitem
        .agg(sum("l_suppkey").as("t"), count(lit(1)).as("n")).head
      SparkEntry.queries("q69_sketch_cms")(spark, dir).collect().map { r =>
        s"""{"corpus_tag":${tag.getLong(0)},"corpus_n":${tag.getLong(1)},""" +
          s""""l_suppkey":${r.getLong(0)},"est":${r.getLong(1)}}"""
      }
    }
    println(s"""GOLDEN q69_sketch_cms [${q69.mkString(",")}]""")
    spark.stop()
  }
}
