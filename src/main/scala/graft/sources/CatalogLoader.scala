package graft.sources

import org.apache.spark.sql.SparkSession

import graft.functions.NameRules

/** Catalog registration (reference A20–A24, gcpl.py:340-603) on the Spark
  * catalog: external-location parquet tables inside a per-dataset database,
  * with column descriptions as column comments (truncated per the
  * reference's 1023-char warehouse limit, statline.py:370-376).
  */
object CatalogLoader {

  /** Idempotent database create (A20): `CREATE DATABASE IF NOT EXISTS`. */
  def createNamespace(spark: SparkSession, namespace: String, description: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$namespace` COMMENT '${sqlEscape(description)}'")

  /** A21. */
  def namespaceExists(spark: SparkSession, namespace: String): Boolean =
    spark.catalog.databaseExists(namespace)

  /** Drop-cascade (A22) — the reference's always-drop-then-recreate flow. */
  def dropNamespace(spark: SparkSession, namespace: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$namespace` CASCADE")

  /** External parquet table over a location (A23): the Spark analog of a
    * BigQuery external table — `USING parquet LOCATION`.
    */
  def linkExternalTable(spark: SparkSession, namespace: String, table: String,
                        location: String): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$namespace`.`$table` USING parquet LOCATION '${sqlEscape(location)}'")

  /** Column-comment patch (A24): description per column, cleaned/truncated
    * with the reference's exact rule.
    */
  def applyColumnDescriptions(spark: SparkSession, namespace: String, table: String,
                              descriptions: Map[String, String]): Unit = {
    val existing = spark.catalog.listColumns(s"$namespace.$table").collect().map(_.name).toSet
    descriptions.foreach { case (column, desc) =>
      if (existing.contains(column) && desc != null) {
        val clean = NameRules.cleanDescription(desc)
        spark.sql(
          s"ALTER TABLE `$namespace`.`$table` ALTER COLUMN `$column` COMMENT '${sqlEscape(clean)}'")
      }
    }
  }

  private def sqlEscape(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")
}
