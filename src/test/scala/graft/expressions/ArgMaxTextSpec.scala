package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArgMaxText must agree with the declarative formulation it replaces
  * (`min_by(struct(token, score), struct(-score, token))`) — including
  * score ties (smaller string wins), null inputs (skipped), and the
  * merge path across partitions.
  */
class ArgMaxTextSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def argMax = ArgMaxText.argMaxTextCol(spark) _

  test("matches min_by on ties, negatives, and repeated groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "b", 2.0), (1L, "a", 2.0), (1L, "z", 1.5),   // tie on 2.0 → "a"
      (2L, "only", -3.0),                                // single negative
      (3L, "x", 0.0), (3L, "y", 0.0), (3L, "w", -0.0),  // 0.0 vs -0.0
      (4L, "", 1.0), (4L, "nonempty", 1.0),              // empty string wins tie
    ).toDF("g", "token", "score").repartition(4) // exercise partial + merge
    val native = df.groupBy("g")
      .agg(argMax(struct(col("score"), col("token"))).as("t"))
      .select(col("g"), col("t.token"), col("t.score"))
    val legacy = df.groupBy("g")
      .agg(min_by(struct(col("token"), col("score")),
        struct(negate(col("score")), col("token"))).as("t"))
      .select(col("g"), col("t.token"), col("t.score"))
    assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty,
      s"native=${native.collect().toSeq} legacy=${legacy.collect().toSeq}")
  }

  test("NaN scores are skipped deterministically regardless of arrival order") {
    val s = spark
    import s.implicits._
    // both arrival orders: a NaN row must never shadow a real score
    Seq(
      Seq((1L, "nanrow", Double.NaN), (1L, "real", 2.0)),
      Seq((1L, "real", 2.0), (1L, "nanrow", Double.NaN)),
    ).foreach { rows =>
      val out = rows.toDF("g", "token", "score").coalesce(1)
        .groupBy("g").agg(argMax(struct(col("score"), col("token"))).as("t"))
        .select(col("t.token")).collect().head.getString(0)
      assert(out == "real", s"order $rows gave $out")
    }
    // all-NaN group = no scores at all
    val allNaN = Seq((1L, "x", Double.NaN)).toDF("g", "token", "score")
      .groupBy("g").agg(argMax(struct(col("score"), col("token"))).as("t"))
      .select(col("t.token")).collect().head
    assert(allNaN.isNullAt(0))
  }

  test("skips null fields and yields null for empty groups") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[String], Option[Double])](
      (1L, Some("kept"), Some(1.0)), (1L, None, Some(9.0)), (1L, Some("nope"), None),
      (2L, None, None),
    ).toDF("g", "token", "score")
    val out = df.groupBy("g")
      .agg(argMax(struct(col("score"), col("token"))).as("t"))
      .select(col("g"), col("t.token").as("tok"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("kept"))
    assert(out(2L).isEmpty)
  }

  test("agrees with min_by on the full documents fixture scoring") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01").documents
    val tok = docs.select(col("doc_id"),
      explode(split(trim(col("text")), " +")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).cast("double").as("score"))
    val native = tok.groupBy("doc_id")
      .agg(argMax(struct(col("score"), col("token"))).as("t"))
      .select(col("doc_id"), col("t.token"), col("t.score"))
    val legacy = tok.groupBy("doc_id")
      .agg(min_by(struct(col("token"), col("score")),
        struct(negate(col("score")), col("token"))).as("t"))
      .select(col("doc_id"), col("t.token"), col("t.score"))
    assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty)
  }
}
