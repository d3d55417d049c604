package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Stages a single-file fixture into a multi-file directory for file-stream
  * replays — the one stager behind EventStreams and DocPipeline (Tables has
  * its own richer variant with range-cluster keys).
  *
  * Publication is ATOMIC (write to a private pid-suffixed temp dir, then
  * rename): concurrent JVMs — spec runs racing a verify/bench run — must
  * never list a half-written layout; a racing writer that loses the rename
  * simply uses the winner's copy. The marker records `size:mtime:n`, so a
  * regenerated fixture restages automatically.
  */
private[streaming] object ReplayStage {

  def stage(spark: SparkSession, sourceFile: String, stageName: String, n: Int): String = {
    val source = Paths.get(sourceFile)
    require(Files.exists(source), s"replay source missing: $sourceFile")
    val stageDir = Paths.get(EventStreams.scratchBase, stageName)
    val marker = stageDir.resolve("_graft_stage_marker")
    val sig = s"${Files.size(source)}:${Files.getLastModifiedTime(source).toMillis}:$n"
    if (!Files.exists(marker) || Files.readString(marker) != sig) {
      val tmp = Paths.get(s"$stageDir.tmp.${ProcessHandle.current().pid()}")
      spark.read.parquet(source.toString).repartition(n)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.writeString(tmp.resolve(marker.getFileName), sig)
      try {
        if (Files.exists(stageDir)) deleteRecursively(stageDir)
        Files.move(tmp, stageDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          deleteRecursively(tmp) // a racing writer published first — use theirs
      }
    }
    stageDir.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }
}
