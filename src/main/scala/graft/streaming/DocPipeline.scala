package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.TextStats

/** The training-data cleaning pipeline as a STREAM (SURVEY §2.C meets
  * B31-B34): documents arrive unbounded, each gets single-pass quality
  * features, low-quality documents are dropped, and exact duplicates are
  * removed by content fingerprint with bounded streaming state.
  *
  * The same transformation graph runs batch and streaming unchanged — the
  * spec pins the streaming result to the batch identity. At 100 TB this is
  * the shape of a continuous ingestion filter: per-document work is
  * shuffle-free (TextStats is one fused scan-side pass), and the only
  * stateful operator keys on the 8-byte fingerprint, so dedup state is
  * bounded by distinct *content*, not stream length (add a watermark to
  * bound it by time instead, as q61's event dedup demonstrates).
  */
object DocPipeline {

  /** The pipeline body — identical for batch and streaming inputs. The
    * quality gate is THE engine quality definition
    * ([[graft.operators.TextAnalysis.qualityScoreFromStats]]), not a copy.
    */
  def cleanDocs(docs: DataFrame, minQuality: Double): DataFrame = {
    val spark = docs.sparkSession
    docs
      .withColumn("_st", TextStats.statsCol(spark)(col("text")))
      .withColumn("quality_score",
        graft.operators.TextAnalysis.qualityScoreFromStats(col("_st")))
      .filter(col("quality_score") >= minQuality)
      .withColumn("fp", TextStats.fingerprintCol(spark)(col("text")))
      // keep ONE representative per distinct content; state is keyed by the
      // 8-byte fingerprint only (projection decides state row width)
      .select(col("doc_id"), col("fp"), col("quality_score"))
      .dropDuplicates("fp")
  }

  /** Streaming run over a staged replay of the documents table; returns the
    * materialized survivors. Batch identity: `cleanDocs(docs, q)` modulo
    * which doc_id represents each duplicate-content group (streaming keeps
    * the first *arrival*; batch keeps an arbitrary member — compare on the
    * content fingerprint set, which is deterministic for both).
    */
  /** The staged documents table as a file-source stream — the ONE place
    * the stage name, signature scheme, and replay partitioning (n=4) live;
    * both streaming document queries read through it.
    */
  private def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables(spark, dir).table("documents").schema
    val stageDir = ReplayStage.stage(spark, s"$dir/documents.parquet",
      s"graft_docs_stage_${Integer.toHexString(dir.hashCode)}", n = 4)
    spark.readStream.schema(schema).parquet(stageDir)
  }

  def cleanDocsStream(spark: SparkSession, dir: String, minQuality: Double): DataFrame =
    EventStreams.runToMemory(spark,
      s => cleanDocs(documentsStream(s, dir), minQuality), "append")

  // ------------------------------------------------------- declared queries

  /** q86: the streaming cleaning pipeline END-TO-END with a DuckDB oracle.
    * Streaming dedup keeps the first ARRIVAL per fingerprint, so doc_id is
    * replay-order-dependent — but the surviving `(fp, quality_score)` SET
    * is content-determined, and that is the certified output (both columns
    * come from the established portable formulations: q50's rolling hash,
    * q48's scaled-integer quality round).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_stream_doc_clean" -> ((s, dir) => {
      import graft.Present._
      cleanDocsStream(s, dir, minQuality = 0.5)
        .select(col("fp"), col("quality_score"))
        .presented("fp")
    }),
    // q121: the PII scrub as a STREAM — the batch operator composes with
    // readStream unchanged (map-only, stateless, append mode), so the
    // certified rows are exactly q116's and the oracle is shared verbatim.
    // This is the continuous-ingestion form of the cleaning stage: each
    // arriving document is scrubbed in its micro-batch with zero state.
    "q121_stream_pii_scrub" -> ((s, dir) => {
      import graft.Present._
      import graft.operators.Cleaning
      val scrubbed = (s2: SparkSession) => Cleaning.piiScrub(
        documentsStream(s2, dir).select(col("doc_id"),
          Cleaning.plantPiiCol("doc_id", "text").as("text")),
        "doc_id", "text")
      EventStreams.runToMemory(s, scrubbed, "append")
        .presented("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    // identical rows to q116 (map-only operator, append mode): share its SQL
    "q121_stream_pii_scrub" -> graft.operators.Cleaning.oracles("q116_pii_scrub"),
    "q86_stream_doc_clean" ->
      """WITH f AS (
           SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007) AS fp,
                  ROUND(CAST(least(n_words, 50) * alpha AS DOUBLE) * 10000 / (50 * greatest(n_chars, 1))) / 10000 AS quality_score
           FROM (SELECT text,
                        CAST(length(text) AS BIGINT) AS n_chars,
                        CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) END AS n_words,
                        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha
                 FROM documents) x)
         SELECT DISTINCT fp, quality_score FROM f
         WHERE quality_score >= 0.5 ORDER BY fp""")
}
