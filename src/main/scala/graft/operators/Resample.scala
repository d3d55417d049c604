package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Present._
import graft.Tables

/** Time-series resampling with gap fill: bucket an event stream onto a
  * fixed time grid per entity (each entity's own [min, max] span), emit
  * EVERY grid cell — observed or not — and forward-fill the last observed
  * value across the gaps. The feature-store / metrics staple that turns an
  * irregular event log into a regular training matrix.
  *
  * Scale shape: ONE data exchange total, and NO join. Each observed cell
  * generates itself plus the gap cells up to the entity's NEXT observed
  * cell (a `lead` window over the per-cell aggregate), so the forward fill
  * falls out of adjacency — every generated gap row simply carries its
  * generating cell's last value. The naive grid-build-then-join-then-
  * ignoreNulls-window formulation needs a second pass over the input and a
  * grid↔cells join; this shape replaces both with one generator. The
  * explicit entity repartition is the only exchange: the cell aggregate and
  * the lead window both need only entity clustering, which
  * `HashPartitioning(entity)` satisfies, and the explode is generator-
  * shaped (no shuffle), span-bounded per entity.
  */
object Resample {
  type Q = (SparkSession, String) => DataFrame

  /** @param tsCol  epoch-µs long column
    * @param bucketUs grid cell width in µs
    * @return one row per (entity, cell) of the entity's span:
    *         `n_events` observed in the cell (0 for gaps) and `ff_value` —
    *         the value of the latest event at-or-before the cell's end
    *         (ties on ts broken by greatest `tiebreakCol`).
    */
  def gapFillResample(events: DataFrame, entityCol: String, tsCol: String,
                      valueCol: String, tiebreakCol: String,
                      bucketUs: Long): DataFrame = {
    val byEntity = events.repartition(col(entityCol))
      .withColumn("_cell", expr(s"$tsCol div $bucketUs"))
    val cells = byEntity.groupBy(entityCol, "_cell")
      .agg(count(lit(1)).as("_n"),
        max_by(col(valueCol), struct(col(tsCol), col(tiebreakCol))).as("_last_v"))
    val nextCell = lead(col("_cell"), 1)
      .over(Window.partitionBy(entityCol).orderBy("_cell"))
    cells
      .withColumn("_until", coalesce(nextCell - 1, col("_cell")))
      .select(col(entityCol), col("_cell"), col("_n"), col("_last_v"),
        explode(sequence(col("_cell"), col("_until"))).as("cell"))
      .select(col(entityCol), col("cell"),
        when(col("cell") === col("_cell"), col("_n")).otherwise(lit(0L)).as("n_events"),
        col("_last_v").as("ff_value"))
  }

  // ------------------------------------------------------- declared queries

  private val HourUs = 3600000000L

  val queries: Map[String, Q] = Map(
    // Hourly grid over a 1-in-7 entity slice (keeps the grid output
    // span×entities-bounded at bench scale; the operator itself is
    // slice-agnostic).
    "q96_gapfill_resample" -> ((s, dir) =>
      gapFillResample(
        Tables(s, dir).eventsUs.filter(col("user_id") % 7 === 0),
        "user_id", "ts_us", "value", "event_id", HourUs)
        .presented("user_id", "cell")),
  )

  val oracles: Map[String, String] = Map(
    // Same grid derivation; the per-cell "last value" pick is spelled as a
    // rank window (DuckDB's arg_max over a composite orderings is less
    // portable), and the forward fill is last_value IGNORE NULLS. ff_value
    // copies input doubles verbatim (no arithmetic), so hashes agree.
    "q96_gapfill_resample" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
           FROM events WHERE user_id % 7 = 0),
         cells AS (
           SELECT user_id, ts_us // 3600000000 AS cell, COUNT(*) AS n_events
           FROM ev GROUP BY user_id, cell),
         lastv AS (
           SELECT user_id, cell, value FROM (
             SELECT user_id, ts_us // 3600000000 AS cell, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id, ts_us // 3600000000
                                       ORDER BY ts_us DESC, event_id DESC) AS rn
             FROM ev) r WHERE rn = 1),
         grid AS (
           SELECT user_id, unnest(generate_series(MIN(cell), MAX(cell))) AS cell
           FROM cells GROUP BY user_id)
         SELECT g.user_id, g.cell, COALESCE(c.n_events, 0) AS n_events,
                last_value(l.value IGNORE NULLS)
                  OVER (PARTITION BY g.user_id ORDER BY g.cell) AS ff_value
         FROM grid g
         LEFT JOIN cells c ON g.user_id = c.user_id AND g.cell = c.cell
         LEFT JOIN lastv l ON g.user_id = l.user_id AND g.cell = l.cell
         ORDER BY g.user_id, g.cell""",
  )
}
