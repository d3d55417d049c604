package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming cleaning pipeline must agree with its batch identity:
  * same survivors by content (fingerprint set), same quality filtering,
  * exactly one representative per distinct content.
  */
class DocPipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = graft.TestSpark.Sf0001

  test("streaming clean == batch clean by content fingerprint") {
    val minQ = 0.5
    val batch = DocPipeline.cleanDocs(
      graft.Tables(spark, dir).documents, minQ)
    val stream = DocPipeline.cleanDocsStream(spark, dir, minQ)

    val batchFps = batch.select("fp").collect().map(_.getLong(0)).toSet
    val streamRows = stream.collect()
    val streamFps = streamRows.map(_.getAs[Long]("fp")).toSet

    assert(streamFps == batchFps, "survivor content differs between modes")
    // exactly one representative per distinct content
    assert(streamRows.length == streamFps.size)
    // something was actually filtered and something survived
    val total = graft.Tables(spark, dir).documents.count()
    assert(streamFps.nonEmpty && streamFps.size < total)
  }

  test("quality gate drops exactly the below-threshold documents") {
    val minQ = 0.5
    val cleaned = DocPipeline.cleanDocs(graft.Tables(spark, dir).documents, minQ)
    assert(cleaned.filter(col("quality_score") < minQ).isEmpty)
    // and the gate is consistent with TextAnalysis's composite score
    val scored = graft.operators.TextAnalysis
      .qualityFeatures(graft.Tables(spark, dir).documents, "text")
    val survivors = scored.filter(col("quality_score") >= minQ)
    assert(survivors.count() > 0, "fixture/threshold leaves no survivors — gate untestable")
    val expected = survivors
      .select(min(col("quality_score"))).collect().head.getDouble(0)
    val got = cleaned.select(min(col("quality_score"))).collect().head.getDouble(0)
    assert(got == expected)
  }
}
