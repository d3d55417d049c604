package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

import graft.SparkEntry

/** Scratch probe (round 16, ADVICE fanInRows/Generate fix): for every
  * declared query, compare the presentation-sort mode under the OLD rule
  * (Generate passes its child bound through) vs the NEW rule (Generate over
  * un-reduced fan-in saturates to large) and print the queries that flip —
  * the candidate set for a two-mode wall measurement before committing.
  */
object GenerateFanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the OLD walk (pre-r16): Generate and every other non-reducing node
    // pass the max child bound through
    def oldFan(p: LogicalPlan): Long = p match {
      case _: Aggregate | _: Distinct | _: Deduplicate | _: GlobalLimit |
           _: LocalLimit | _: WindowGroupLimit => 0L
      case j: Join => j.joinType match {
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti => oldFan(j.left)
        case _ => math.max(oldFan(j.left), oldFan(j.right))
      }
      case u: Union => u.children.map(oldFan).sum
      case leaf: LeafNode =>
        // reuse the NEW leaf counter via fanInRows on the leaf itself
        graft.Present.fanInRows(leaf)
      case other if other.children.nonEmpty => other.children.map(oldFan).max
      case _ => 0L
    }

    val thr = 500000L
    for (name <- SparkEntry.freshQueries.keys.toSeq.sorted
         if !name.contains("_stream_")) {
      try {
        val plan = SparkEntry.freshQueries(name)(spark, sfDir)
          .queryExecution.optimizedPlan
        // presented() wraps the query in its own sort; walk the whole plan
        val o = oldFan(plan)
        val n = graft.Present.fanInRows(plan)
        val oldMode = if (o <= thr) "single" else "range"
        val newMode = if (n <= thr) "single" else "range"
        val hasGen = plan.collectFirst { case g: Generate => g }.nonEmpty
        if (oldMode != newMode || (hasGen && n == Long.MaxValue))
          println(f"FANFLIP $name%-34s old=$o%12d ($oldMode) new=$n%20d ($newMode) gen=$hasGen")
      } catch {
        case e: Throwable => println(s"FANERR $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
