package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * EXACT integer sum over cents-cast values — associative, so identical
    * on any engine at any parallelism — and only the final closed-form
    * `(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))` runs in double, an
    * identical expression tree over identical inputs on both engines.
    * (Pearson is scale-invariant, so cents-scaled moments give the same
    * correlation as dollar-scaled ones; the oracle states the identical
    * cents formulation.)
    *
    * Representation (round 13, the q13/`Exact` treatment): SCALED-LONG
    * moments, not DECIMAL accumulation. `sum(decimal(25,4))` exceeds
    * Spark's compact-decimal range and pays a java.math.BigDecimal
    * multiply + add per row per pair — measured 7.8× DuckDB at sf1 on a
    * single-aggregate plan. Per row everything is now long arithmetic
    * inside whole-stage codegen: `cents(x)·cents(y)` (one long multiply),
    * split into THREE long sums (`p div 10¹²`, `(p div 10⁶) mod 10⁶`,
    * `p mod 10⁶` — truncating div/mod, so the decomposition is exact for
    * either sign) because a single long sum of 10¹⁴-magnitude products
    * overflows at ~10⁵ rows. The final 1-row projection recombines the
    * three sums EXACTLY in decimal(38,0) and casts once to double —
    * correctly rounded, the same value DuckDB's `CAST(SUM(c·c) AS DOUBLE)`
    * (hugeint sum) produces.
    *
    * Documented magnitude bounds (cf. `Exact`): per VALUE |x| ≤ 10⁷
    * dollars (10⁹ cents ⇒ |p| ≤ 10¹⁸ fits a long per row); per
    * AGGREGATION the split sums stay exact while `N·max|c| < 2⁶³` and
    * `N·max|p|/10⁶ < 2⁶³` — for this fixture's ≤10⁷-cent measures that is
    * N ≤ ~9×10¹¹ rows, two orders past a 100 TB lineitem. A corpus of
    * genuinely wider values re-bases the split, it does not change shape.
    *
    * Scale shape: a single global aggregate (k + 3·(k(k+1)/2) long sums),
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
    // cents once per column, then pure long arithmetic per row
    val withCents = complete.select(cols.zipWithIndex.map { case (c, i) =>
      graft.functions.Exact.cents(col(c)).as(s"_c$i")
    }: _*)
    // moments for every i <= j (i == j are the Σx² terms), each as a 3-way
    // split of exact long sums (see the scaladoc's overflow arithmetic);
    // `div` is Spark SQL's truncating integral divide
    val ij = for { i <- cols.indices; j <- i until cols.length } yield (i, j)
    val aggs = count(lit(1)).as("_n") +:
      (cols.indices.map(i => sum(col(s"_c$i")).as(s"_s$i")) ++
        ij.flatMap { case (i, j) =>
          val p = s"(_c$i * _c$j)"
          Seq(expr(s"sum($p div 1000000000000)").as(s"_hi_${i}_$j"),
            expr(s"sum(($p div 1000000) % 1000000)").as(s"_mid_${i}_$j"),
            expr(s"sum($p % 1000000)").as(s"_lo_${i}_$j"))
        })
    // exact recombination on the single result row: decimal(38,0) carries
    // the full integer moment, one correctly-rounded cast to double
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def moment(i: Int, j: Int): Column =
      (col(s"_hi_${i}_$j").cast(dec) * lit(1000000000000L) +
        col(s"_mid_${i}_$j").cast(dec) * lit(1000000L) +
        col(s"_lo_${i}_$j").cast(dec)).cast("double")
    def s(i: Int) = col(s"_s$i").cast("double")
    val n = col("_n").cast("double")
    val structs = ij.collect { case (i, j) if i != j =>
      val num = n * moment(i, j) - s(i) * s(j)
      val den = sqrt(n * moment(i, i) - s(i) * s(i)) *
        sqrt(n * moment(j, j) - s(j) * s(j))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        scale.fold(num / den)(sc => round(num / den, sc)).as("corr"))
    }
    withCents.agg(aggs.head, aggs.tail: _*)
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
    // mirrors correlationMatrix: exact CENTS-long moments (order-independent
    // on both engines — DuckDB's SUM(BIGINT) accumulates in exact hugeint,
    // Spark recombines its split long sums in exact decimal; both cast the
    // identical integer once to double), then the SAME closed-form double
    // expression per pair. ROUND(x*100) is DuckDB's half-away double round —
    // the same cent every 2-decimal-representable value lands on under
    // Exact.cents' x·100±0.5 truncation. The WHERE mirrors the operator's
    // listwise-deletion NULL contract (no-op on this data — lineitem
    // measures are non-null at every SF)
    "q127_correlation_profile" ->
      """WITH t AS (SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS c1,
                           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c2,
                           CAST(ROUND(l_discount * 100) AS BIGINT) AS c3,
                           CAST(ROUND(l_tax * 100) AS BIGINT) AS c4
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
