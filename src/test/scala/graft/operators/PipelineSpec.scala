package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Invariants of the composed curation pipeline (q136) that the per-stage
  * oracles cannot see: stage containment and that each gate actually FIRES
  * on the fixture (a pipeline whose stages are vacuous would still
  * hash-match a vacuous oracle).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every stage of the q136 composition fires, and the output is stage-contained") {
    val docs = Tables(spark, TestSpark.Sf0001).documents
    val out = Pipeline.curate(docs).collect()
    assert(out.nonEmpty)
    val outIds = out.map(_.getLong(0)).toSet

    // stage 1 containment + firing: output ⊆ en-classified; some doc is NOT en
    val (lang, _) = TextAnalysis.langId(col("text"))
    val aug = docs.select(col("doc_id"),
      Cleaning.plantPiiCol("doc_id", "text").as("text"))
    val langs = aug.select(col("doc_id"), lang.as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(outIds.forall(langs(_) == "en"))
    assert(langs.values.exists(_ != "en"), "language gate never fired")

    // stage 2 firing: the planted PII is really scrubbed — every kept doc
    // reports its plant count (doc_id%2==0 plants at least an email)
    val plantCounts = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plantCounts.filter(_._1 % 2 == 0).values.forall(_ >= 1L),
      "PII scrub found nothing on docs that provably carry a planted email")

    // stage 3 firing: at least one en doc was dropped as a losing duplicate
    // OR by the quality gate — the composition must not be the identity
    val enIds = langs.collect { case (id, "en") => id }.toSet
    assert(outIds.subsetOf(enIds) && outIds.size < enIds.size,
      s"no doc dropped after the language gate (${outIds.size} of ${enIds.size})")

    // stage 4 containment: every survivor meets the quality bar
    assert(out.map(_.getDouble(2)).forall(_ >= 0.15))
  }
}
