package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Naming and storage-layout contract of the reference pipeline
  * (SURVEY §1.3), kept byte-compatible:
  *
  *  - table file name `{source}.{v3|v4}.{id}_{key}` (statline.py:434),
  *    sidecars `…_{suffix}.json` (utils.py:91)
  *  - store layout `{source}/{vN}/{id}/{YYYYMMDD}/{name}` (gcpl.py:219-221)
  *  - "latest version" = lexicographic max of date folders (gcpl.py:93-96)
  *  - warehouse namespace `{source}_{vN}_{id}` (gcpl.py:374)
  *
  * At scale the dated folder becomes a `snapshot_date` partition column, so
  * "latest" resolves by partition pruning instead of listing (SURVEY §1.4).
  */
object StatlineLayout {
  private val dateFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  def tableName(source: String, odataVersion: String, id: String, key: String): String =
    s"$source.$odataVersion.${id}_$key"

  def sidecarName(source: String, odataVersion: String, id: String, suffix: String): String =
    s"$source.$odataVersion.${id}_$suffix.json"

  def datasetPath(root: String, source: String, odataVersion: String, id: String,
                  date: LocalDate): String =
    s"$root/$source/$odataVersion/$id/${date.format(dateFmt)}"

  /** Partitioned layout variant: snapshot date as a partition column. */
  def partitionedPath(root: String, source: String, odataVersion: String, id: String): String =
    s"$root/$source/$odataVersion/$id"

  def namespace(source: String, odataVersion: String, id: String): String =
    s"${source}_${odataVersion}_$id"

  /** Latest snapshot folder = lexicographic max (gcpl.py:93-96); YYYYMMDD
    * sorts lexicographically = chronologically.
    */
  def latestFolder(folders: Seq[String]): Option[String] =
    folders.distinct.sorted.lastOption

  /** Warehouse table id = third dot-segment of the file name (gcpl.py:589). */
  def warehouseTableId(fileName: String): String =
    fileName.stripSuffix(".parquet").split("\\.", 3).last
}
