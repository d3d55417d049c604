package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class EdmSchemaSpec extends AnyFunSuite {

  test("EDM primitive map matches the reference's hash plus finished TODOs") {
    assert(EdmSchema.edmToSpark("Edm.Binary") == BinaryType)
    assert(EdmSchema.edmToSpark("Edm.Boolean") == BooleanType)
    assert(EdmSchema.edmToSpark("Edm.SByte") == ByteType)
    assert(EdmSchema.edmToSpark("Edm.Int16") == ShortType)
    assert(EdmSchema.edmToSpark("Edm.Int32") == IntegerType)
    assert(EdmSchema.edmToSpark("Edm.Int64") == LongType)
    assert(EdmSchema.edmToSpark("Edm.Single") == FloatType)
    assert(EdmSchema.edmToSpark("Edm.Double") == DoubleType)
    assert(EdmSchema.edmToSpark("Edm.String") == StringType)
    // the reference's TODO list, finished here:
    assert(EdmSchema.edmToSpark("Edm.Date") == DateType)
    assert(EdmSchema.edmToSpark("Edm.DateTimeOffset") == TimestampType)
    assert(EdmSchema.edmToSpark("Edm.Decimal", Some(10), Some(2)) == DecimalType(10, 2))
    assert(EdmSchema.edmToSpark("Edm.GeographyPoint") == StringType)
    // unknown ⇒ string (reference default, statline.py:304-306)
    assert(EdmSchema.edmToSpark("Edm.Whatever") == StringType)
  }

  test("CSDL parse finds the TData entity and builds a nullable StructType") {
    val csdl =
      """<?xml version="1.0" encoding="utf-8"?>
        |<edmx:Edmx xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx" Version="1.0">
        |  <edmx:DataServices>
        |    <Schema xmlns="http://schemas.microsoft.com/ado/2009/11/edm" Namespace="Cbs">
        |      <EntityType Name="TData">
        |        <Property Name="ID" Type="Edm.Int32" Nullable="false"/>
        |        <Property Name="Perioden" Type="Edm.String"/>
        |        <Property Name="Banen_1" Type="Edm.Double"/>
        |        <Property Name="Prijs" Type="Edm.Decimal" Precision="12" Scale="4"/>
        |      </EntityType>
        |      <EntityType Name="Other">
        |        <Property Name="X" Type="Edm.Int64"/>
        |      </EntityType>
        |    </Schema>
        |  </edmx:DataServices>
        |</edmx:Edmx>""".stripMargin
    val st = EdmSchema.fromCsdl(csdl, "TData").get
    assert(st == StructType(Seq(
      StructField("ID", IntegerType),
      StructField("Perioden", StringType),
      StructField("Banen_1", DoubleType),
      StructField("Prijs", DecimalType(12, 4)))))
    assert(st.fields.forall(_.nullable))
    assert(EdmSchema.fromCsdl(csdl, "Missing").isEmpty)
  }
}
