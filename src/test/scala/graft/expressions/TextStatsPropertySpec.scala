package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Property check: the native single-pass TextStats expressions agree with
  * the regex-composed legacy formulations on ARBITRARY printable-ASCII
  * strings (not just the fixture's shapes). ASCII is the domain where
  * Java-regex (legacy Spark), RE2 (DuckDB oracle), and the native
  * code-point scan all provably coincide; the deliberate divergence outside
  * the BMP (native counts code points like DuckDB, Java regex counts UTF-16
  * units) is documented in TextStats' scaladoc.
  */
class TextStatsPropertySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  // Marker-word-rich alphabet: plain asciiPrintableStr almost never forms
  // "the "/"de " patterns, so half the samples are built from a vocabulary
  // that stresses the marker scanner (overlaps, shared prefixes, "de" vs
  // "der", trailing-space boundaries).
  private val vocabGen: Gen[String] = Gen.listOfN(12, Gen.oneOf(
    "the", "and", "of", "with", "der", "die", "das", "und", "le", "la",
    "les", "et", "el", "los", "las", "y", "de", "het", "een", "en",
    "breathe", "bathe", "t", " ", "  ", ".", ",", "!", "12", "a1b",
  )).map(_.mkString(" "))

  private def samples: Seq[String] = {
    val ascii = (0 until 400).flatMap(i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(i.toLong)))
    val vocab = (0 until 400).flatMap(i =>
      vocabGen.apply(Gen.Parameters.default, Seed(1000L + i)))
    ascii ++ vocab
  }

  test("native stats/markers/fingerprint == regex formulations on random ASCII") {
    val s = spark
    import s.implicits._
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val st = TextStats.statsCol(spark)(col("text"))
    val mh = TextStats.markerHitsCol(spark)(col("text"))
    val markerPatterns = Seq("(the|and|of|with) ", "(der|die|das|und) ",
      "(le|la|les|et) ", "(el|los|las|y) ", "(de|het|een|en) ")
    var cmp = df
      .withColumn("_st", st).withColumn("_h", mh)
      .withColumn("bad_nchars", col("_st")(0) =!= length(col("text")).cast("long"))
      .withColumn("bad_ws", col("_st")(1) =!= TextAnalysis.wsTokenCount(col("text")))
      .withColumn("bad_bpe", col("_st")(2) =!= TextAnalysis.bpeishTokenCount(col("text")))
      .withColumn("bad_alpha",
        col("_st")(3) =!= length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"))
      .withColumn("bad_punct",
        col("_st")(4) =!= length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long"))
      .withColumn("bad_fp",
        TextStats.fingerprintCol(spark)(col("text")) =!= TextAnalysis.fingerprint("text"))
    markerPatterns.zipWithIndex.foreach { case (p, i) =>
      cmp = cmp.withColumn(s"bad_m$i",
        col("_h")(i) =!= TextAnalysis.markerHits(col("text"), p))
    }
    val badCols = cmp.columns.filter(_.startsWith("bad_"))
    val bad = cmp.filter(badCols.map(col).reduce(_ || _))
      .select((Seq(col("text")) ++ badCols.map(col)): _*)
      .collect()
    assert(bad.isEmpty, s"native != legacy on ${bad.length} samples, e.g. ${bad.take(3).mkString("; ")}")
  }
}
