package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Present._
import graft.Tables

/** Column profiling: per-column null and distinct-value counts in ONE pass
  * over the table — the data-quality / schema-drift primitive a pipeline
  * runs before trusting a new drop of data.
  *
  * Scale shape: a single global aggregate; Spark plans the N exact
  * `count_distinct`s as one Expand (N passes' worth of rows, one scan, one
  * partial+final agg pair). Exact distincts are the ORACLE's requirement —
  * at 100 TB the same operator runs with `approx_count_distinct` (HLL,
  * q15's machinery) and the Expand disappears; nothing else changes.
  */
object Profile {
  type Q = (SparkSession, String) => DataFrame

  /** One output row per profiled column: (col_name, n_nulls, n_distinct). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("_total") +:
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"_nn_$c"), count_distinct(col(c)).as(s"_nd_$c"))
      }
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("_total") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("_p"))
      .select(col("_p.col_name"), col("_p.n_nulls"), col("_p.n_distinct"))
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    "q97_column_profile" -> ((s, dir) =>
      profile(Tables(s, dir).eventsUs,
        Seq("event_id", "user_id", "event_type", "props"))
        .presented("col_name")),
  )

  val oracles: Map[String, String] = Map(
    "q97_column_profile" ->
      """SELECT col_name, n_nulls, n_distinct FROM (
           SELECT 'event_id' AS col_name, COUNT(*) - COUNT(event_id) AS n_nulls,
                  COUNT(DISTINCT event_id) AS n_distinct FROM events
           UNION ALL
           SELECT 'user_id', COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id) FROM events
           UNION ALL
           SELECT 'event_type', COUNT(*) - COUNT(event_type), COUNT(DISTINCT event_type) FROM events
           UNION ALL
           SELECT 'props', COUNT(*) - COUNT(props), COUNT(DISTINCT props) FROM events)
         ORDER BY col_name""",
  )
}
