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

  /** Pairwise Pearson correlation of numeric columns in ONE pass — the
    * feature-redundancy / drift profile over a table's measures.
    *
    * Order-independence discipline: built-in `corr` accumulates double
    * co-moments in partition order, so two engines (or two partitionings)
    * disagree in the last ULPs. Here every moment (Σx, Σx², Σxy, n) is an
    * EXACT decimal sum over cents-cast values — associative, so identical
    * on any engine at any parallelism — and only the final closed-form
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))` runs in double, an
    * identical expression tree over identical inputs on both engines.
    *
    * Scale shape: a single global aggregate (k + k(k−1)/2 decimal sums),
    * map-side partials collapse everything before one 1-row exchange — the
    * q97 profile shape, nothing quadratic in rows.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(12, 2)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).as("_n") +:
      (cols.flatMap { c =>
        Seq(sum(col(c).cast(d)).as(s"_s_$c"),
          sum(col(c).cast(d) * col(c).cast(d)).as(s"_ss_$c"))
      } ++ pairs.map { case (a, b) =>
        sum(col(a).cast(d) * col(b).cast(d)).as(s"_sp_${a}_$b")
      })
    def dbl(n: String) = col(n).cast("double")
    val structs = pairs.map { case (a, b) =>
      val n = dbl("_n")
      val num = n * dbl(s"_sp_${a}_$b") - dbl(s"_s_$a") * dbl(s"_s_$b")
      val den = sqrt(n * dbl(s"_ss_$a") - dbl(s"_s_$a") * dbl(s"_s_$a")) *
        sqrt(n * dbl(s"_ss_$b") - dbl(s"_s_$b") * dbl(s"_s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(num / den, 6).as("corr"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("_p"))
      .select(col("_p.col_a"), col("_p.col_b"), col("_p.corr"))
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    "q97_column_profile" -> ((s, dir) =>
      profile(Tables(s, dir).eventsUs,
        Seq("event_id", "user_id", "event_type", "props"))
        .presented("col_name")),
    "q127_correlation_profile" -> ((s, dir) =>
      correlationMatrix(Tables(s, dir).lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .presented("col_a", "col_b")),
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
    // mirrors correlationMatrix: exact decimal moments (order-independent on
    // both engines), then the SAME closed-form double expression per pair
    "q127_correlation_profile" ->
      """WITH t AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS c1,
                           CAST(l_extendedprice AS DECIMAL(12,2)) AS c2,
                           CAST(l_discount AS DECIMAL(12,2)) AS c3,
                           CAST(l_tax AS DECIMAL(12,2)) AS c4
                    FROM lineitem),
              a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                           CAST(SUM(c1) AS DOUBLE) AS s1, CAST(SUM(c1*c1) AS DOUBLE) AS ss1,
                           CAST(SUM(c2) AS DOUBLE) AS s2, CAST(SUM(c2*c2) AS DOUBLE) AS ss2,
                           CAST(SUM(c3) AS DOUBLE) AS s3, CAST(SUM(c3*c3) AS DOUBLE) AS ss3,
                           CAST(SUM(c4) AS DOUBLE) AS s4, CAST(SUM(c4*c4) AS DOUBLE) AS ss4,
                           CAST(SUM(c1*c2) AS DOUBLE) AS p12, CAST(SUM(c1*c3) AS DOUBLE) AS p13,
                           CAST(SUM(c1*c4) AS DOUBLE) AS p14, CAST(SUM(c2*c3) AS DOUBLE) AS p23,
                           CAST(SUM(c2*c4) AS DOUBLE) AS p24, CAST(SUM(c3*c4) AS DOUBLE) AS p34
                    FROM t)
         SELECT col_a, col_b, corr FROM (
           SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                  ROUND((n*p12 - s1*s2) / (sqrt(n*ss1 - s1*s1) * sqrt(n*ss2 - s2*s2)), 6) AS corr FROM a
           UNION ALL
           SELECT 'l_quantity', 'l_discount',
                  ROUND((n*p13 - s1*s3) / (sqrt(n*ss1 - s1*s1) * sqrt(n*ss3 - s3*s3)), 6) FROM a
           UNION ALL
           SELECT 'l_quantity', 'l_tax',
                  ROUND((n*p14 - s1*s4) / (sqrt(n*ss1 - s1*s1) * sqrt(n*ss4 - s4*s4)), 6) FROM a
           UNION ALL
           SELECT 'l_extendedprice', 'l_discount',
                  ROUND((n*p23 - s2*s3) / (sqrt(n*ss2 - s2*s2) * sqrt(n*ss3 - s3*s3)), 6) FROM a
           UNION ALL
           SELECT 'l_extendedprice', 'l_tax',
                  ROUND((n*p24 - s2*s4) / (sqrt(n*ss2 - s2*s2) * sqrt(n*ss4 - s4*s4)), 6) FROM a
           UNION ALL
           SELECT 'l_discount', 'l_tax',
                  ROUND((n*p34 - s3*s4) / (sqrt(n*ss3 - s3*s3) * sqrt(n*ss4 - s4*s4)), 6) FROM a)
         ORDER BY col_a, col_b""",
  )
}
