package graft.sources.odata

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end parity against the reference's own golden outputs
  * (`/root/reference/tests/data/83583NED`, produced by the real pipeline
  * from live CBS) — the offline analog of the reference's golden test
  * (tests/test_statline_bq.py:151-219).
  *
  * The golden parquet is turned back into the OData wire responses (rows →
  * `value` pages with explicit nulls, DataProperties keys un-dot-renamed,
  * CSDL reconstructed from the golden main-table schema, the checked-in
  * Metadata.json as the catalog response), replayed through the Spark
  * pipeline, and the outputs compared to the golden files: full content
  * equality per table, exact declared schema on the main table, and
  * structurally-equal sidecars.
  */
class GoldenReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  private val goldenDir = "/root/reference/tests/data/83583NED"
  private val id = "83583NED"
  private val base = s"https://opendata.cbs.nl/ODataFeed/odata/$id"
  private val tables = Seq("TypedDataSet", "DataProperties", "CategoryGroups",
    "BedrijfstakkenBranchesSBI2008", "Bedrijfsgrootte", "Perioden")

  private def golden(name: String): DataFrame =
    spark.read.parquet(s"$goldenDir/cbs.v3.${id}_$name.parquet")

  /** Rows → wire page with explicit nulls (toJSON would drop them, but the
    * real CBS responses carry them — that's how all-null columns exist in
    * the golden parquet at all).
    */
  private def pageOf(df: DataFrame, renameKeys: Map[String, String]): String = {
    val schema = df.schema
    val arr = mapper.createArrayNode()
    df.collect().foreach { row =>
      val o: ObjectNode = mapper.createObjectNode()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val name = renameKeys.getOrElse(f.name, f.name)
        if (row.isNullAt(i)) o.putNull(name)
        else f.dataType match {
          case StringType  => o.put(name, row.getString(i))
          case IntegerType => o.put(name, row.getInt(i))
          case LongType    => o.put(name, row.getLong(i))
          case DoubleType  => o.put(name, row.getDouble(i))
          case FloatType   => o.put(name, row.getFloat(i))
          case BooleanType => o.put(name, row.getBoolean(i))
          case other       => fail(s"unhandled golden type $other for ${f.name}")
        }
      }
      arr.add(o)
    }
    val root = mapper.createObjectNode()
    root.set[ObjectNode]("value", arr)
    mapper.writeValueAsString(root)
  }

  /** CSDL reconstructed from the golden main-table schema (reverse EDM map). */
  private def csdlFor(schema: StructType): String = {
    val props = schema.fields.map { f =>
      val edm = f.dataType match {
        case IntegerType => "Edm.Int32"
        case LongType    => "Edm.Int64"
        case FloatType   => "Edm.Single"
        case DoubleType  => "Edm.Double"
        case BooleanType => "Edm.Boolean"
        case _           => "Edm.String"
      }
      s"""<Property Name="${f.name}" Type="$edm"/>"""
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<edmx:Edmx xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx" Version="1.0">
       |<edmx:DataServices><Schema xmlns="http://schemas.microsoft.com/ado/2009/11/edm" Namespace="Cbs">
       |<EntityType Name="TData">
       |$props
       |</EntityType></Schema></edmx:DataServices></edmx:Edmx>""".stripMargin
  }

  private def buildReplay(): ReplayClient = {
    val metaRaw = Files.readString(Paths.get(s"$goldenDir/cbs.v3.${id}_Metadata.json"))
    val serviceEntries = (tables ++ Seq("TableInfos", "UntypedDataSet"))
      .map(n => s"""{"name":"$n","url":"$base/$n"}""").mkString(",")
    val pages = tables.map { name =>
      val rename = if (name == "DataProperties") Map("odata_type" -> "odata.type")
        else Map.empty[String, String]
      s"$base/$name?$$format=json" -> pageOf(golden(name), rename)
    }.toMap
    ReplayClient(pages ++ Map(
      ODataUrls.v3CatalogUrl(id, thirdParty = false) -> s"""{"value":[$metaRaw]}""",
      s"$base?$$format=json" -> s"""{"value":[$serviceEntries]}""",
      s"$base/$$metadata" -> csdlFor(golden("TypedDataSet").schema),
    ))
  }

  test("replaying the golden dataset reproduces the reference's outputs") {
    val root = Files.createTempDirectory("graft_golden").toString
    val ingest = new StatlineIngest(spark, buildReplay())
    val res = ingest.run(id, root, date = LocalDate.of(2024, 3, 1))
    assert(!res.skipped)
    assert(res.parquetPaths.map(_.split('/').last).toSet ==
      tables.map(n => s"cbs.v3.${id}_$n.parquet").toSet)

    // main table: exact declared schema (int32/float preserved) + full content
    val mainMine = spark.read.parquet(s"${res.snapshotDir}/cbs.v3.${id}_TypedDataSet.parquet")
    val mainGold = golden("TypedDataSet")
    assert(mainMine.schema.map(f => (f.name, f.dataType)) ==
      mainGold.schema.map(f => (f.name, f.dataType)))
    assert(mainMine.count() == 7440)
    assert(mainMine.exceptAll(mainGold).isEmpty && mainGold.exceptAll(mainMine).isEmpty)

    // every other table: content equality on all columns; schema equality
    // except all-null columns (pyarrow types them null, Spark's json
    // inference types them string — both carry only nulls)
    tables.filterNot(_ == "TypedDataSet").foreach { name =>
      val mine = spark.read.parquet(s"${res.snapshotDir}/cbs.v3.${id}_$name.parquet")
      val gold = golden(name)
      assert(mine.columns.toSeq == gold.columns.toSeq, s"$name columns")
      val allNull = gold.columns.filter(c => gold.filter(gold(c).isNotNull).isEmpty).toSet
      gold.schema.fields.filterNot(f => allNull(f.name)).foreach { f =>
        assert(mine.schema(f.name).dataType == f.dataType, s"$name.${f.name} type")
      }
      val cmpCols = gold.columns.filterNot(allNull).toSeq
      val m = mine.select(cmpCols.head, cmpCols.tail: _*)
      val g = gold.select(cmpCols.head, cmpCols.tail: _*)
      assert(m.exceptAll(g).isEmpty && g.exceptAll(m).isEmpty, s"$name content")
      allNull.foreach { c => assert(mine.filter(mine(c).isNotNull).isEmpty, s"$name.$c nulls") }
    }

    // sidecars: structural equality with the checked-in files
    val goldMeta = mapper.readTree(Files.readString(Paths.get(s"$goldenDir/cbs.v3.${id}_Metadata.json")))
    val mineMeta = mapper.readTree(Files.readString(Paths.get(s"${res.snapshotDir}/cbs.v3.${id}_Metadata.json")))
    assert(mineMeta == goldMeta)
    val goldDesc = mapper.readTree(Files.readString(Paths.get(s"$goldenDir/cbs.v3.${id}_ColDescriptions.json")))
    val mineDesc = mapper.readTree(Files.readString(Paths.get(s"${res.snapshotDir}/cbs.v3.${id}_ColDescriptions.json")))
    assert(mineDesc == goldDesc)
  }
}
