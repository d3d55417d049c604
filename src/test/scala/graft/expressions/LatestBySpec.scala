package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LatestBy must agree with the declarative `max_by(payload, struct(ts,
  * seq))` it replaces — ties to the larger seq, null keys skipped, payload
  * nulls preserved, merge across partitions — and with the rank-window
  * formulation on the real events fixture.
  */
class LatestBySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def latest = LatestBy.latestByCol(spark) _

  test("matches max_by incl. ties, null keys, and null payload fields") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Long], Option[Long], Option[String], Option[Double])](
      (1L, Some(10L), Some(1L), Some("old"), Some(1.0)),
      (1L, Some(10L), Some(2L), Some("tie-wins"), Some(2.0)),  // ts tie → bigger seq
      (1L, Some(9L), Some(99L), Some("older"), Some(3.0)),
      (2L, Some(5L), Some(1L), None, None),                    // null payload kept
      (2L, None, Some(7L), Some("null-ts-skipped"), Some(4.0)),
      (3L, None, None, Some("all-null-keys"), Some(5.0)),      // group → null
    ).toDF("g", "ts", "seq", "a", "b").repartition(3)
    val payload = struct(col("a"), col("b"))
    val native = df.groupBy("g")
      .agg(latest(struct(col("ts"), col("seq"), payload)).as("p"))
      .select(col("g"), col("p.a"), col("p.b"))
    val legacy = df.filter(col("ts").isNotNull && col("seq").isNotNull)
      .groupBy("g")
      .agg(max_by(payload, struct(col("ts"), col("seq"))).as("p"))
      .select(col("g"), col("p.a"), col("p.b"))
      // group 3 has no non-null-key rows: native yields a null payload row
      .unionByName(Seq((3L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
        .toDF("g", "a", "b"))
    assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty,
      s"native=${native.collect().toSeq} legacy=${legacy.collect().toSeq}")
  }

  test("a null payload struct on the winning row is kept as null, not a crash") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1L, 1L, Some("older-real")),
      (1L, 9L, 1L, None), // latest row carries a NULL payload → result null
      (2L, 5L, 1L, Some("kept")),
    ).toDF("g", "ts", "seq", "a")
    val out = df.groupBy("g")
      .agg(latest(struct(col("ts"), col("seq"),
        when(col("a").isNotNull, struct(col("a"))).otherwise(lit(null)))).as("p"))
      .select(col("g"), col("p.a").as("a"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty, "null payload on the latest row must win as null")
    assert(out(2L).contains("kept"))
  }

  test("matches the rank-window latest on the events fixture") {
    val e = graft.Tables(spark, graft.TestSpark.Sf0001).eventsUs
    val native = e.groupBy("user_id")
      .agg(latest(struct(col("ts_us"), col("event_id"),
        struct(col("event_type"), col("value")))).as("p"))
      .select(col("user_id"), col("p.event_type"), col("p.value"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val legacy = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "value")
    assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty)
  }
}
