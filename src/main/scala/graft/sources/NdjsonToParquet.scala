package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** ndjson → Parquet conversion (reference A7, utils.py:119-132), Spark-first.
  *
  * The reference streams page files through a single ParquetWriter with a
  * schema fixed up-front. Here the same contract is one declarative read:
  * the declared schema parses every page identically (schema-once,
  * parse-many), executors convert partitions in parallel, and the Parquet
  * writer handles memory/spill. `FAILFAST` preserves the reference's
  * behavior of surfacing malformed pages instead of nulling them.
  */
object NdjsonToParquet {

  /** Reads ndjson with a declared schema (or first-page inference when no
    * schema is known — reference utils.py:123-124 semantics).
    */
  def read(spark: SparkSession, path: String, schema: Option[StructType]): DataFrame =
    schema match {
      case Some(st) => spark.read.schema(st).option("mode", "FAILFAST").json(path)
      case None     => spark.read.json(path)
    }

  /** Converts an ndjson directory/file to Parquet at `outPath`.
    *
    * @param coalesceTo optional file-count bound — the reference emits one
    *   file per table (single-writer parity); leave None at scale so each
    *   task writes its own file.
    */
  def convert(spark: SparkSession, inPath: String, outPath: String,
              schema: Option[StructType], coalesceTo: Option[Int] = None): Unit = {
    val df = read(spark, inPath, schema)
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    out.write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
