package graft.tools

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** A/B probe for the q87 snapshot-diff physical shape: the full-outer
  * sort-merge join of the two dated sides vs the tag-union single hash
  * aggregate. Interleaved reps in one JVM so host drift hits both arms.
  */
object SnapDiffShapeProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
    // stage the same snapshots the q87 query uses
    val src = java.nio.file.Paths.get(s"$sfDir/orders.parquet")
    val sig = s"snapdiff-v1:${java.nio.file.Files.size(src)}:${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
    val root = graft.StageDir.publish(
      s"graft_snapdiff_${Integer.toHexString(sfDir.hashCode)}", sig) { tmp =>
      val orders = spark.read.parquet(src.toString)
      graft.sources.ScaleLayouts.writeSnapshot(
        orders.filter(col("o_orderkey") % 97 =!= 0), tmp.toString, LocalDate.of(2026, 1, 1))
      graft.sources.ScaleLayouts.writeSnapshot(
        orders.filter(col("o_orderkey") % 101 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice"))),
        tmp.toString, LocalDate.of(2026, 1, 2))
    }.toString
    val oldD = LocalDate.of(2026, 1, 1); val newD = LocalDate.of(2026, 1, 2)
    val keyCols = Seq("o_orderkey")

    def fullOuter() = {
      val all = spark.read.parquet(root)
      val dataCols = all.columns.filterNot(_ == "snapshot_date").toSeq
      def side(d: LocalDate, tag: String) =
        all.filter(col("snapshot_date") === d.format(fmt))
          .select(keyCols.map(col) :+ xxhash64(dataCols.map(col): _*).as(s"_h_$tag"): _*)
      side(oldD, "old").join(side(newD, "new"), keyCols, "full_outer")
        .withColumn("change",
          when(col("_h_old").isNull, "added")
            .when(col("_h_new").isNull, "removed")
            .when(col("_h_old") =!= col("_h_new"), "changed"))
        .filter(col("change").isNotNull)
        .select(keyCols.map(col) :+ col("change"): _*)
        .orderBy("o_orderkey")
    }
    def unionAgg() =
      graft.sources.ScaleLayouts.snapshotDiff(spark, root, oldD, newD, keyCols)
        .orderBy("o_orderkey")

    def fullOuterHash() = {
      val all = spark.read.parquet(root)
      val dataCols = all.columns.filterNot(_ == "snapshot_date").toSeq
      def side(d: LocalDate, tag: String) =
        all.filter(col("snapshot_date") === d.format(fmt))
          .select(keyCols.map(col) :+ xxhash64(dataCols.map(col): _*).as(s"_h_$tag"): _*)
      side(oldD, "old").join(side(newD, "new").hint("shuffle_hash"), keyCols, "full_outer")
        .withColumn("change",
          when(col("_h_old").isNull, "added")
            .when(col("_h_new").isNull, "removed")
            .when(col("_h_old") =!= col("_h_new"), "changed"))
        .filter(col("change").isNotNull)
        .select(keyCols.map(col) :+ col("change"): _*)
        .orderBy("o_orderkey")
    }

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    // warmup all
    time(fullOuter _); time(unionAgg _); time(fullOuterHash _)
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    val c = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      a += time(fullOuter _); b += time(unionAgg _); c += time(fullOuterHash _)
    }
    def stats(xs: Seq[Double]) = f"med=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f"
    println(s"SNAPDIFF full_outer      ${stats(a.toSeq)}")
    println(s"SNAPDIFF union_agg       ${stats(b.toSeq)}")
    println(s"SNAPDIFF full_outer_hash ${stats(c.toSeq)}")
    spark.stop()
  }
}
