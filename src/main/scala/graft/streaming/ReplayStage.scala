package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Stages a single-file fixture into a multi-file directory for file-stream
  * replays — the one stager behind EventStreams and DocPipeline (Tables has
  * its own richer variant with range-cluster keys).
  *
  * The published directory name embeds the source signature
  * (`size:mtime:n`), so publication NEVER deletes a live layout: a new
  * signature lands in a new directory, and concurrent readers of the old one
  * are untouched. Within one signature, publication is atomic (write to a
  * private pid-suffixed temp dir, then rename); a racing writer that loses
  * the rename simply uses the winner's copy. Superseded signatures are
  * cleaned up best-effort AFTER the new one is live — that only happens when
  * the fixture itself was regenerated, not on every publish.
  */
private[streaming] object ReplayStage {

  def stage(spark: SparkSession, sourceFile: String, stageName: String, n: Int): String = {
    val source = Paths.get(sourceFile)
    require(Files.exists(source), s"replay source missing: $sourceFile")
    val sig = s"${Files.size(source)}:${Files.getLastModifiedTime(source).toMillis}:$n"
    val stageDir = Paths.get(EventStreams.scratchBase,
      s"$stageName.${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))}")
    if (!Files.exists(stageDir)) {
      val tmp = Paths.get(s"$stageDir.tmp.${ProcessHandle.current().pid()}")
      spark.read.parquet(source.toString).repartition(n)
        .write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, stageDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          deleteRecursively(tmp) // a racing writer published first — use theirs
      }
      dropSupersededSignatures(stageName, stageDir)
    }
    stageDir.toString
  }

  /** Removes stale sig-dirs of the same stage name (the fixture was
    * regenerated in place). Best effort: a still-running reader of a stale
    * layout only exists if the fixture changed mid-run.
    */
  private def dropSupersededSignatures(stageName: String, keep: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(EventStreams.scratchBase)
    val s = Files.list(base)
    try s.iterator().asScala
      .filter { p =>
        val fn = p.getFileName.toString
        // never touch in-flight ".tmp.<pid>" dirs — they belong to a writer
        fn.startsWith(s"$stageName.") && !fn.contains(".tmp.") && p != keep
      }
      .foreach(p => try deleteRecursively(p) catch { case _: Exception => () })
    finally s.close()
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
