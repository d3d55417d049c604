package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.StageDir

/** Stages a single-file fixture into a multi-file directory for file-stream
  * replays — the parquet-repartition payload over [[StageDir]]'s shared
  * publish discipline (sig-dir naming, atomic rename, superseded sweep).
  * Tables has its own richer payload with range-cluster keys; both publish
  * through the same [[StageDir]].
  */
private[streaming] object ReplayStage {

  def stage(spark: SparkSession, sourceFile: String, stageName: String, n: Int): String = {
    val source = Paths.get(sourceFile)
    require(Files.exists(source), s"replay source missing: $sourceFile")
    val sig = s"${Files.size(source)}:${Files.getLastModifiedTime(source).toMillis}:$n"
    StageDir.publish(stageName, sig) { tmp =>
      spark.read.parquet(source.toString).repartition(n)
        .write.mode("overwrite").parquet(tmp.toString)
    }.toString
  }
}
