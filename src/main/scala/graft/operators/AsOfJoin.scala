package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Present._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key — the temporal-lookup operator
  * the reference's "latest snapshot" resolution (gcpl.py:93-96) generalizes
  * to, and a staple of time-series/feature-store pipelines.
  *
  * Implementation is the union + running `last(ignoreNulls)` window — NOT a
  * range join: both inputs shuffle once by key, the per-key merge is a
  * single ordered pass, and no pair enumeration ever materializes. At 100 TB
  * this is the only shape that survives: cost is one shuffle of each side
  * plus a sort, independent of how many left rows each right row serves.
  *
  * Within-key ordering is (ts, side): right rows sort before left rows at
  * equal timestamps (inclusive `>=` semantics). Right rows are first deduped
  * to ONE row per (key, ts) — the max-tiebreak row — so the operator's
  * choice under duplicate right timestamps is part of its contract rather
  * than an ordering accident (engines' native ASOF joins leave that case
  * unspecified).
  */
object AsOfJoin {
  type Q = (SparkSession, String) => DataFrame

  /** @param right      must contain `keyCol`, `tsCol`, `valueCol`, `tiebreakCol`
    * @param valueCol   the right-side payload carried to left rows (as `asof_value`)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, tiebreakCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
        col(keyCol), col(tsCol),
        col(valueCol).as("_asof_v"), col(tiebreakCol).as("_asof_tb"))
      // one right row per (key, ts): max-tiebreak wins (see scaladoc). The
      // extra aggregation shuffles only the (small) right side.
      .groupBy(keyCol, tsCol)
      .agg(max_by(col("_asof_v"), col("_asof_tb")).as("_asof_v"))
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_value", last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_asof_v", "_asof_tb")
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    // B13 generalized: every event looks up the value of the user's most
    // recent signup event at-or-before its own timestamp.
    "q37_asof_join" -> ((s, dir) => {
      val e = Tables(s, dir).eventsUs
      val signups = e.filter(col("event_type") === "signup")
        .select("user_id", "ts_us", "value", "event_id")
      // EVENTS-sized output through the as-of join's shuffled stages — the
      // fan-in rule in Present.presented derives the distributed range
      // shape (r15; hand pin was SortModeProbe at sf1: 1.99 -> 1.59 s med
      // vs the single-partition presentation merge)
      leftAsOf(e, signups, "user_id", "ts_us", "value", "event_id")
        .select(col("event_id"), col("asof_value"))
        .presented("event_id")
    }),
  )

  /** DuckDB has a native ASOF JOIN — a genuinely independent implementation
    * of the same semantics to check against.
    */
  val oracles: Map[String, String] = Map(
    // right side deduped to one row per (user_id, ts) with arg_max — the
    // same max-tiebreak contract as leftAsOf, so neither engine's behavior
    // under duplicate right timestamps is left unspecified.
    "q37_asof_join" ->
      """SELECT e.event_id, s.value AS asof_value
         FROM events e ASOF LEFT JOIN (
           SELECT user_id, ts, arg_max(value, event_id) AS value
           FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) s
           ON e.user_id = s.user_id AND e.ts >= s.ts
         ORDER BY e.event_id""",
  )
}
