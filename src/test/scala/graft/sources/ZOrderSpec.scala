package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("morton16 interleaves bits") {
    val s = spark
    import s.implicits._
    val out = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535))
      .toDF("a", "b")
      .select(ScaleLayouts.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,5): a-bits 1,1 at even positions 0,2; b-bits 1,0,1 at odd 1,3,5 →
    // 0b100111 = 39
    assert(out == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-ordered layout keeps rows and clusters BOTH dimensions per file") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val orders = t.orders
      .withColumn("d1", (col("o_custkey") % 4096).cast("int"))
      .withColumn("d2", (dayofyear(col("o_orderdate")) * 11 % 4096).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val nFiles = 16
    ScaleLayouts.writeZOrdered(orders, "d1", "d2", nFiles, dir)
    val back = spark.read.parquet(dir)
    // lossless: same multiset of orders
    assert(back.count() == orders.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      orders.agg(sum("o_orderkey")).head.getLong(0))
    // per-file rectangles: on the z-curve, each of the 16 files covers a
    // bounded rectangle in (d1, d2) — the mean per-file span of EACH
    // dimension must be well under the global span (a single-key range
    // layout would show a near-global span on the other dimension)
    val files = back.inputFiles
    assert(files.length >= nFiles / 2, s"expected a multi-file layout: ${files.length}")
    def meanSpan(dim: String): Double = {
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi")).head
        (r.getInt(1) - r.getInt(0)).toDouble
      }
      spans.sum / spans.length
    }
    val globalSpan = 4096.0
    val s1 = meanSpan("d1")
    val s2 = meanSpan("d2")
    assert(s1 < globalSpan / 2, s"d1 not clustered: mean file span $s1")
    assert(s2 < globalSpan / 2, s"d2 not clustered: mean file span $s2")
  }

  /** Parquet footer min/max ranges of `cols`, one entry per rowgroup. */
  private def rowGroupRanges(dir: String, cols: Seq[String]): Seq[Map[String, (Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        cols.map { c =>
          val cc = b.getColumns.asScala.find(_.getPath.toDotString == c)
            .getOrElse(sys.error(s"column $c missing from footer of $f"))
          val st = cc.getStatistics
          c -> (st.genericGetMin.toString.toLong, st.genericGetMax.toString.toLong)
        }.toMap
      } finally r.close()
    }
  }

  test("z-order rowgroup stats exclude most of a rectangle scan; an unclustered layout excludes nothing") {
    // The at-scale claim behind q126, measured at the STORAGE level: every
    // rowgroup's footer min/max either overlaps the query rectangle (must
    // be read) or excludes it (pruned before any page IO). A dense 256×256
    // grid makes the arithmetic exact: the x<64 ∧ y<64 quadrant is the
    // first 1/16 of the Morton curve, so of 8 equal z-range files at most
    // one overlaps — while a round-robin layout spans the full domain in
    // every file and can prune NONE.
    val s = spark
    import s.implicits._
    val grid = s.range(65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft_rprune").toString
    ScaleLayouts.writeZOrdered(grid, "x", "y", 8, zdir)
    grid.repartition(8).write.mode("overwrite").parquet(rdir)
    def overlapping(dir: String): (Int, Int) = {
      val rgs = rowGroupRanges(dir, Seq("x", "y"))
      val hit = rgs.count { rg =>
        val (xlo, xhi) = rg("x"); val (ylo, yhi) = rg("y")
        xlo <= 63 && xhi >= 0 && ylo <= 63 && yhi >= 0
      }
      (hit, rgs.size)
    }
    val (zHit, zTotal) = overlapping(zdir)
    val (rHit, rTotal) = overlapping(rdir)
    assert(zTotal >= 8 && zHit <= 2,
      s"z-ordered layout must confine the rectangle to ~1 of $zTotal rowgroups, hit $zHit")
    assert(rHit == rTotal,
      s"round-robin layout should overlap everywhere ($rHit of $rTotal) — baseline invalid")
    // and the engine pushes the rectangle to the scan, where those stats
    // are actually consulted
    val plan = s.read.parquet(zdir)
      .filter(col("x").between(0, 63) && col("y").between(0, 63))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(x,63)"),
      s"rectangle not pushed to the parquet scan:\n$plan")
  }

  test("wide domains past 16 bits must be tiled: raw keys alias, tile16 preserves the rectangles") {
    // morton16 interleaves only the low 16 bits. A domain past 65,535 fed
    // RAW wraps mod 2^16 — distant key bands alias onto the same curve
    // positions and every file's min/max spans the whole domain (pruning
    // dissolves, which is exactly the sf1 l_partkey regime). tile16 maps
    // the domain order-preservingly into tile space first.
    val s = spark
    import s.implicits._
    // 2^18-wide x domain (raw x mod 2^16 cycles 4 times), 4-value y. With
    // 16 files the curve's top 4 interleaved bits split x twice and y
    // twice, so a correct layout bounds per-file x-spans near global/4;
    // the aliased raw layout mixes all 4 x-bands into every file.
    val grid = s.range(1 << 18).select(
      col("id").cast("long").as("x"),
      (col("id") % 4).cast("long").as("y"))
    def meanXSpan(dir: String): Double = {
      val back = s.read.parquet(dir)
      val files = back.inputFiles
      val spans = files.map { f =>
        val r = s.read.parquet(f).agg(min("x"), max("x")).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    val rawDir = java.nio.file.Files.createTempDirectory("graft_zraw").toString
    val tiledDir = java.nio.file.Files.createTempDirectory("graft_ztiled").toString
    ScaleLayouts.writeZOrderedBy(grid, col("x"), col("y"), 16, rawDir)
    ScaleLayouts.writeZOrderedBy(grid,
      ScaleLayouts.tile16(col("x"), (1 << 18) - 1),
      ScaleLayouts.tile16(col("y"), 3), 16, tiledDir)
    val rawSpan = meanXSpan(rawDir)
    val tiledSpan = meanXSpan(tiledDir)
    val global = (1 << 18).toDouble
    assert(rawSpan > global * 0.7,
      s"expected RAW wide keys to alias (near-global file spans), got $rawSpan")
    // ideal is ~global/4; range-partition file boundaries that straddle an
    // x-split bit raise the mean, so assert the claim that matters: tiled
    // files cover bounded rectangles where aliased files cover everything
    assert(tiledSpan < global / 2.5 && tiledSpan < rawSpan * 0.6,
      s"tiled layout must keep per-file x-rectangles bounded, got $tiledSpan (raw $rawSpan)")
  }
}
