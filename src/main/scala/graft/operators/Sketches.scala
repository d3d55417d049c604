package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.Present._
import graft.Tables

/** Sketch aggregates: sublinear-state summaries for heavy-hitter style
  * questions over unbounded key domains (SURVEY §2.C's sketch tier next to
  * HLL `approx_count_distinct`, q15).
  *
  * The count-min sketch aggregates distributively — per-partition sketches
  * merge associatively on the reduce side, so the shuffle carries one
  * `depth × width` counter grid per partition no matter how many rows or
  * distinct keys flow in. Probing the merged sketch is a driver-side read
  * of a BOUNDED candidate list (the same shape as catalog metadata reads) —
  * the sketch itself never exceeds `depth × width × 8` bytes.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** Point estimates from a count-min sketch over `keyCol` (long) for a
    * bounded probe list. Estimates are deterministic for a fixed `seed` and
    * always over-count: `true ≤ est ≤ true + eps · N` with confidence
    * `1 - (1 - confidence)`.
    */
  def cmsEstimates(df: DataFrame, keyCol: String, probes: Seq[Long],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bin = df.agg(
      count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)).as("s"))
      .head.getAs[Array[Byte]]("s")
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bin))
    probes.sorted.map(k => (k, cms.estimateCount(java.lang.Long.valueOf(k))))
      .toDF(keyCol, "est")
  }

  // ------------------------------------------------------- declared queries

  /** Seed-deterministic counters, value-certified against a committed
    * ENGINE-SEEDED golden (tools/gen_sketch_goldens.py): CMS cells are
    * additive, so estimates are partition-order-independent — a regression
    * pin, declared as such. The over-count bound stays in `SketchesSpec`.
    */
  val queries: Map[String, Q] = Map(
    "q69_sketch_cms" -> ((s, dir) =>
      cmsEstimates(Tables(s, dir).lineitem, "l_suppkey", (1L to 20L).toSeq)
        .presented("l_suppkey")),
  )

  val oracles: Map[String, String] = Map(
    // corpus checksums select the scale factor's rows from the one golden
    "q69_sketch_cms" ->
      """SELECT l_suppkey, est FROM read_parquet('/root/repo/goldens/q69_sketch_cms.parquet')
         WHERE corpus_tag = (SELECT SUM(l_suppkey) FROM lineitem)
           AND corpus_n = (SELECT COUNT(*) FROM lineitem)
         ORDER BY l_suppkey""",
  )
}
