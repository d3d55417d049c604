package graft.sources

import org.apache.spark.sql.types._

import scala.xml.XML

/** OData EDM (CSDL `$metadata` XML) → Spark `StructType`.
  *
  * Reference semantics: `/root/reference/statline_bq/statline.py:241-308`
  * maps `Edm.*` → Arrow types for the v3 main table's declared schema and
  * defaults every unknown type to string. We keep that default but finish
  * the reference's TODO list (statline.py:263-293): Date, DateTimeOffset,
  * Decimal (precision/scale facets), Duration, Guid, TimeOfDay, and the
  * geography/geometry family — carried as WKT strings PERMANENTLY (SURVEY
  * §1.4): the reference never ships geometry data (all 16 mappings are
  * commented-out TODOs, statline.py:280-293), Spark has no native geometry
  * type, and WKT is the interop representation geospatial Spark libraries
  * parse directly, so a bespoke struct encoding would have no producer and
  * no consumer.
  *
  * Declared-schema-first matters at scale: schema inference re-reads data
  * and can't widen later pages (reference utils.py:123-129 pins the first
  * page's inferred schema); a declared StructType makes every executor parse
  * with FAILFAST consistency and enables vectorized readers downstream.
  */
object EdmSchema {

  /** EDM primitive type → Spark type (see class doc for provenance). */
  def edmToSpark(edmType: String, precision: Option[Int] = None,
                 scale: Option[Int] = None): DataType = edmType match {
    case "Edm.Binary"         => BinaryType
    case "Edm.Boolean"        => BooleanType
    case "Edm.Byte"           => ShortType // unsigned 8-bit needs 16 bits
    case "Edm.SByte"          => ByteType
    case "Edm.Date"           => DateType
    case "Edm.DateTime"       => TimestampType
    case "Edm.DateTimeOffset" => TimestampType
    // OData defaults an omitted Scale facet to 0 (not Spark's 18 — a scale
    // larger than a small explicit precision would throw)
    case "Edm.Decimal" =>
      val p = precision.getOrElse(38)
      DecimalType(p, scale.getOrElse(0).min(p))
    case "Edm.Double"         => DoubleType
    case "Edm.Duration"       => DayTimeIntervalType()
    case "Edm.Guid"           => StringType
    case "Edm.Int16"          => ShortType
    case "Edm.Int32"          => IntegerType
    case "Edm.Int64"          => LongType
    case "Edm.Single"         => FloatType
    case "Edm.String"         => StringType
    case "Edm.TimeOfDay"      => StringType
    case t if t.startsWith("Edm.Geography") || t.startsWith("Edm.Geometry") =>
      StringType // WKT passthrough — permanent by design, see class doc
    case _ => StringType // reference default: unknown ⇒ string (statline.py:304-306)
  }

  /** Parses a CSDL `$metadata` document and returns the schema of the entity
    * named `entityName` (the v3 main table is `TData`, statline.py:295-303).
    * All fields nullable (Arrow-JSON parity, SURVEY §1.2).
    */
  def fromCsdl(csdlXml: String, entityName: String = "TData"): Option[StructType] = {
    val root = XML.loadString(csdlXml)
    val entities = (root \\ "EntityType").filter(e => (e \@ "Name") == entityName)
    entities.headOption.map { e =>
      val fields = (e \ "Property").map { p =>
        val name = p \@ "Name"
        val edm = p \@ "Type"
        val precision = Option(p \@ "Precision").filter(_.nonEmpty).map(_.toInt)
        val scale = Option(p \@ "Scale").filter(_.nonEmpty).flatMap(s => s.toIntOption)
        StructField(name, edmToSpark(edm, precision, scale), nullable = true)
      }
      StructType(fields)
    }
  }
}
