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
    *
    * NULL contract: LISTWISE deletion — a row with a NULL in ANY profiled
    * column is excluded from n and every moment, so the count and the sums
    * always describe the same row set. (Without the filter, `count(1)`
    * would count rows whose NULLs the null-skipping sums dropped, silently
    * corrupting every correlation involving a nullable column.)
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame =
    correlationMatrixAt(df, cols, scale = Some(6))

  /** [[correlationMatrix]] with the output rounding exposed — `scale = None`
    * emits the RAW closed-form double, which is what the boundary-margin
    * audit needs (the round-6 cross-engine compare is only safe while every
    * corr value keeps a measured distance from its .5e-6 decision boundary).
    */
  private[operators] def correlationMatrixAt(df: DataFrame, cols: Seq[String],
                                             scale: Option[Int]): DataFrame = {
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
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
        scale.fold(num / den)(s => round(num / den, s)).as("corr"))
    }
    complete.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("_p"))
      .select(col("_p.col_a"), col("_p.col_b"), col("_p.corr"))
  }

  /** Declarative data-quality constraints, one violation-count row each —
    * the audit a pipeline runs before promoting a new drop of data (the
    * Deequ/dbt-test shape). Four constraint kinds cover the families:
    *
    *  - `not_null(col)` — null count;
    *  - `unique(col)` — rows carrying a duplicated value (count − distinct
    *    keys is NOT it: every row of a dup class is a violation);
    *  - `range(col, lo, hi)` — out-of-bounds count;
    *  - `ref(col ⊆ parent.key)` — orphaned foreign keys via LEFT ANTI join.
    *
    * Scale shape: the row-local constraints (`not_null`, `range`) fold
    * into ONE conditional-sum aggregate over a single scan; `unique` is a
    * key-grouped count (one exchange on the audited key); `ref` is an
    * anti-join that broadcasts the parent KEY SET when small and shuffles
    * otherwise — Catalyst's choice, not ours. Violation counts, not
    * violating rows, leave the executors.
    */
  def constraintAudit(df: DataFrame, notNull: Seq[String],
                      unique: Seq[String],
                      ranges: Seq[(String, Double, Double)],
                      refs: Seq[(String, DataFrame, String)]): DataFrame = {
    // row-local constraints: one pass, one conditional sum each (coalesced:
    // sum over ZERO rows is SQL NULL, and the audit's contract is explicit
    // zeros — an empty "new drop of data" must read as all-passing)
    val rowLocal =
      notNull.map(c => (s"not_null($c)",
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)))) ++
        ranges.map { case (c, lo, hi) => (s"range($c,$lo,$hi)",
          coalesce(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)), lit(0L)))
        }
    // unique/ref-only audits are legitimate: only build the one-pass frame
    // when a row-local constraint exists (rowLocal.head would throw bare)
    val onePass =
      if (rowLocal.isEmpty) Nil
      else Seq(df.agg(rowLocal.head._2.as("_0"),
          rowLocal.tail.zipWithIndex.map { case ((_, a), i) => a.as(s"_${i + 1}") }: _*)
        .select(explode(array(rowLocal.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("check_name"), col(s"_$i").as("violations"))
        }: _*)).as("_c"))
        .select(col("_c.check_name"), col("_c.violations")))
    // unique: every member of a duplicated class violates
    val uniques = unique.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1)
        .agg(coalesce(sum("_n"), lit(0L)).as("violations"))
        .select(lit(s"unique($c)").as("check_name"), col("violations"))
    }
    // referential: orphaned children via LEFT ANTI
    val refChecks = refs.map { case (c, parent, pk) =>
      df.select(col(c)).filter(col(c).isNotNull)
        .join(parent.select(col(pk).as(c)), Seq(c), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"ref($c)").as("check_name"), col("violations"))
    }
    val frames = onePass ++ uniques ++ refChecks
    require(frames.nonEmpty, "constraintAudit needs at least one constraint")
    frames.reduce(_.unionByName(_))
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
    // constraints chosen so PASSING and FAILING checks both occur at every
    // SF: l_quantity's true range is [0,50] (range(10,40) violates),
    // l_orderkey repeats per line (unique violates), while the not-null
    // and referential checks hold (0 violations) — a useful audit reports
    // both states, and the oracle certifies the zeros too
    "q132_constraint_audit" -> ((s, dir) => {
      val t = Tables(s, dir)
      constraintAudit(t.lineitem,
        notNull = Seq("l_orderkey", "l_shipdate"),
        unique = Seq("l_orderkey"),
        ranges = Seq(("l_quantity", 10.0, 40.0), ("l_discount", 0.0, 1.0)),
        refs = Seq(("l_orderkey", t.orders, "o_orderkey")))
        .presented("check_name")
    }),
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
    // both engines), then the SAME closed-form double expression per pair;
    // the WHERE mirrors the operator's listwise-deletion NULL contract
    // (no-op on this data — lineitem measures are non-null at every SF)
    "q127_correlation_profile" ->
      """WITH t AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS c1,
                           CAST(l_extendedprice AS DECIMAL(12,2)) AS c2,
                           CAST(l_discount AS DECIMAL(12,2)) AS c3,
                           CAST(l_tax AS DECIMAL(12,2)) AS c4
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                      AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
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
    // mirrors constraintAudit constraint by constraint
    "q132_constraint_audit" ->
      """SELECT check_name, violations FROM (
           SELECT 'not_null(l_orderkey)' AS check_name,
                  CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS violations FROM lineitem
           UNION ALL
           SELECT 'not_null(l_shipdate)', CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'range(l_quantity,10.0,40.0)',
                  CAST(COALESCE(SUM(CASE WHEN l_quantity < 10.0 OR l_quantity > 40.0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'range(l_discount,0.0,1.0)',
                  CAST(COALESCE(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'unique(l_orderkey)', CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM
             (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1)
           UNION ALL
           SELECT 'ref(l_orderkey)', CAST(COUNT(*) AS BIGINT) FROM lineitem l
           WHERE l.l_orderkey IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
         ORDER BY check_name""",
  )
}
