package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The native single-pass TextStats expressions must be value-identical to
  * the composed-builtin regex formulations they replaced (which are what the
  * DuckDB oracles still express). Checked on crafted edge cases AND the real
  * documents fixture.
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val edgeCases = Seq(
    "",
    " ",
    "    ",
    "a",
    "the ",            // marker at end with trailing space
    "the",             // marker at end without trailing space
    " the and of with ",
    "the the the ",    // overlapping repeats
    "breathe easy",    // marker as substring inside a word ("the " not present)
    "bathe the cat",   // "the " appears inside "bathe the"
    "of with y el los las ",
    "de het een en de ",
    "a1b2c3",
    "hello, world! how; are: you? fine.",
    "  multiple   spaces   between   tokens  ",
    "123 456 abc 789",
    "!@#$%^&*()",
    "word",
    "ab".repeat(300),
    "the quick brown fox jumps over the lazy dog and then naps",
    // multibyte: exercise the fingerprint byte-fast-path's full-decode
    // fallback (r16) — leading/trailing/mid non-ASCII, 2- and 3-byte chars
    "café au lait",
    "über alles élève",
    "ascii prefix then 世界 and back",
    "世界",
  )

  private def edgeDf = {
    val s = spark
    import s.implicits._
    edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def fixtureDf =
    graft.Tables(spark, "/root/testdata/sf0.01").documents

  /** Legacy (regex-composed) formulations — the oracle semantics. */
  private def legacyAlpha(t: Column) = length(regexp_replace(t, "[^a-zA-Z]", "")).cast(LongType)
  private def legacyPunct(t: Column) = length(regexp_replace(t, "[^.,;:!?]", "")).cast(LongType)
  private val markerPatterns = Seq(
    "(the|and|of|with) ", "(der|die|das|und) ", "(le|la|les|et) ",
    "(el|los|las|y) ", "(de|het|een|en) ")

  private def assertAllEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    df.columns.filter(_.endsWith("_native")).foreach { nc =>
      val lc = nc.stripSuffix("_native") + "_legacy"
      val bad = df.filter(not(col(nc) <=> col(lc)))
        .select(col("text"), col(nc), col(lc)).collect()
      assert(bad.isEmpty, s"$nc != $lc on: ${bad.take(5).mkString("; ")}")
    }
  }

  private def statsComparison(df: org.apache.spark.sql.DataFrame) = {
    val st = TextStats.statsCol(spark)(col("text"))
    df.withColumn("_st", st)
      .withColumn("nchars_native", col("_st")(TextStats.NChars))
      .withColumn("nchars_legacy", length(col("text")).cast(LongType))
      .withColumn("ws_native", col("_st")(TextStats.WsTokens))
      .withColumn("ws_legacy", TextAnalysis.wsTokenCount(col("text")))
      .withColumn("bpeish_native", col("_st")(TextStats.BpeishTokens))
      .withColumn("bpeish_legacy", TextAnalysis.bpeishTokenCount(col("text")))
      .withColumn("alpha_native", col("_st")(TextStats.Alpha))
      .withColumn("alpha_legacy", legacyAlpha(col("text")))
      .withColumn("punct_native", col("_st")(TextStats.Punct))
      .withColumn("punct_legacy", legacyPunct(col("text")))
  }

  test("text stats match the regex formulations on edge cases") {
    assertAllEqual(statsComparison(edgeDf))
  }

  test("text stats match the regex formulations on the documents fixture") {
    assertAllEqual(statsComparison(fixtureDf))
  }

  private def markerComparison(df: org.apache.spark.sql.DataFrame) = {
    val hits = TextStats.markerHitsCol(spark)(col("text"))
    markerPatterns.zipWithIndex.foldLeft(df.withColumn("_h", hits)) {
      case (d, (p, i)) =>
        d.withColumn(s"m${i}_native", col("_h")(i))
          .withColumn(s"m${i}_legacy", TextAnalysis.markerHits(col("text"), p))
    }
  }

  test("marker hits match the regex scans on edge cases") {
    assertAllEqual(markerComparison(edgeDf))
  }

  test("marker hits match the regex scans on the documents fixture") {
    assertAllEqual(markerComparison(fixtureDf))
  }

  test("fingerprint matches the aggregate-fold formulation") {
    Seq(edgeDf, fixtureDf).foreach { df =>
      val cmp = df
        .withColumn("fp_native", TextStats.fingerprintCol(spark)(col("text")))
        .withColumn("fp_legacy", TextAnalysis.fingerprint("text"))
      assertAllEqual(cmp)
    }
  }
}
