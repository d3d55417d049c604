package graft

import java.nio.file.{Files, Path, Paths}

/** The ONE staging/publish discipline for derived on-disk layouts (staged
  * table copies, streaming replay directories, connector replay fixtures).
  * Four call sites parameterize it with their payload-writing step:
  * [[Tables]] staged layouts, [[graft.streaming.ReplayStage]],
  * [[graft.streaming.EventStreams]] late-drop replay, and
  * [[graft.sources.odata.ConnectorReplay]].
  *
  * Discipline (shared so a fix lands everywhere at once):
  *
  *  - the published directory name embeds the source signature VERBATIM
  *    (sanitized), so identity is the signature itself — not a 32-bit hash
  *    of it, whose collision between two fixture signatures would silently
  *    serve a stale layout as current. Publishing therefore NEVER deletes a
  *    layout another JVM may be mid-scan on: a regenerated fixture lands in
  *    a NEW directory.
  *  - within one signature, publication is atomic: the payload is written
  *    to a private pid-suffixed temp dir, then renamed into place; a racing
  *    writer that loses the rename discards its temp copy and reads the
  *    winner's.
  *  - superseded signatures of the same base name are dropped best-effort
  *    only AFTER the new one is live (that only happens when the fixture
  *    itself was regenerated, not on every publish); in-flight
  *    ".tmp.<pid>" dirs are never touched — they belong to a racing writer.
  */
private[graft] object StageDir {

  /** Scratch root for staged layouts: a tmpfs when the host has one, else
    * the JVM tmp dir. Staged copies are derived data — rebuildable from the
    * source fixture at any time.
    */
  lazy val scratchBase: String = {
    val shm = Paths.get("/dev/shm")
    if (Files.isWritable(shm)) shm.toString
    else System.getProperty("java.io.tmpdir")
  }

  /** Process-local registry of IN-FLIGHT run-scratch dirs. The pid guard in
    * [[sweepRunScratch]] only protects OTHER live processes; two concurrent
    * runs in the SAME JVM (sbt parallel suites both invoking a streaming
    * query) share a pid, so run N+1's sweep would delete run N's in-flight
    * checkpoint/output dirs. A dir acquired here is sweep-exempt until
    * released; callers release in a `finally` once the run's results are
    * published out of scratch.
    */
  private val liveRuns = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val runCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Allocates a fresh run-scratch dir name `<prefix><pid>_<n>` (the shape
    * [[sweepRunScratch]] recognizes), registers it live, and returns its
    * path under [[scratchBase]]. The dir itself is NOT created — streaming
    * sinks insist on creating their own output/checkpoint dirs.
    */
  def acquireRunDir(prefix: String): Path = {
    val name = s"$prefix${ProcessHandle.current().pid()}_${runCounter.incrementAndGet()}"
    liveRuns.add(name)
    Paths.get(scratchBase, name)
  }

  /** Marks a run-scratch dir as no longer in flight: the NEXT sweep of its
    * prefix may reclaim it. Idempotent.
    */
  def releaseRunDir(dir: Path): Unit = liveRuns.remove(dir.getFileName.toString)

  /** The signature, embedded verbatim with filesystem-hostile chars mapped
    * to '-'. The mapping keeps ':'-separated size/mtime digits distinct, so
    * two different signatures can only collide if they differ exactly in
    * the sanitized characters — which the callers' `size:mtime:...` shapes
    * never do.
    */
  private def sigToken(sig: String): String =
    sig.map(c => if (c.isLetterOrDigit || c == '.' || c == '-' || c == '_') c else '-')

  /** Returns the published dir for (baseName, sig), staging it via
    * `writePayload(tmpDir)` first if no layout with this signature is live.
    * `writePayload` may create the temp dir itself (Spark's parquet writer
    * does) or rely on it existing — it is created up front.
    */
  def publish(baseName: String, sig: String)(writePayload: Path => Unit): Path = {
    val stage = Paths.get(scratchBase, s"$baseName.${sigToken(sig)}")
    if (!Files.exists(stage)) {
      // Unique per ATTEMPT (pid + process-local counter), not just per pid:
      // two threads of one process staging the same signature must not
      // interleave writes into a shared temp dir, and a failed attempt's
      // leftovers must not feed a later attempt's move-based payload
      // (writeOne-style payloads fail on pre-existing batch files).
      val tmp = Paths.get(
        s"$stage.tmp.${ProcessHandle.current().pid()}_${runCounter.incrementAndGet()}")
      Files.createDirectories(tmp)
      try {
        writePayload(tmp)
        try Files.move(tmp, stage, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // A racing writer published first — discard ours, read theirs. The
          // typed subclasses are NOT enough: on Linux rename(2) onto an
          // existing non-empty dir surfaces as the GENERIC FileSystemException
          // ("Directory not empty"), which the old per-site catch lists missed
          // (pinned by StageDirSpec's lost-race test). All the typed variants
          // extend FileSystemException, so one guarded catch covers them —
          // guarded on the target now existing, else the failure is real.
          case e: java.nio.file.FileSystemException =>
            if (Files.exists(stage)) deleteRecursively(tmp) else throw e
        }
      } catch {
        // A failed attempt must not leave its temp payload accumulating in a
        // RAM-backed tmpfs; the published dir (if any) is untouched.
        case e: Throwable => deleteRecursively(tmp); throw e
      }
      dropSuperseded(baseName, stage)
    }
    stage
  }

  /** Removes stale sig-dirs of the same base name (the fixture was
    * regenerated in place). Best effort: a still-running reader of a stale
    * layout only exists if the fixture changed mid-run.
    */
  private def dropSuperseded(baseName: String, keep: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val siblings = Files.list(Paths.get(scratchBase))
    try siblings.iterator().asScala
      .filter { p =>
        val fn = p.getFileName.toString
        fn.startsWith(s"$baseName.") && !fn.contains(".tmp.") && p != keep
      }
      .foreach(p => try deleteRecursively(p) catch { case _: Exception => () })
    finally siblings.close()
  }

  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** Sweeps per-process run scratch under the scratch root: dirs named
    * `<prefix><pid>_<anything>`. Deletes THIS process's previous runs, and
    * — so exited JVMs' leftovers don't accumulate in a RAM-backed tmpfs
    * forever — any sibling whose embedded pid no longer has a live
    * process. A LIVE other process's dirs are never touched, and the pid
    * is matched up to its '_' delimiter (a bare prefix match would let pid
    * 123 sweep pid 1234's live run). Own-pid dirs registered via
    * [[acquireRunDir]] and not yet released are IN FLIGHT in this process
    * (a concurrent run on another thread) and are never touched.
    */
  def sweepRunScratch(prefixes: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val self = ProcessHandle.current().pid()
    def sweepable(name: String): Boolean = prefixes.exists { prefix =>
      name.startsWith(prefix) && {
        val rest = name.substring(prefix.length)
        val pidTok = rest.takeWhile(_ != '_')
        pidTok.nonEmpty && pidTok.forall(_.isDigit) && {
          val pid = pidTok.toLong
          (pid == self && !liveRuns.contains(name)) ||
            (pid != self && ProcessHandle.of(pid).isEmpty)
        }
      }
    }
    val listing = Files.list(Paths.get(scratchBase))
    try listing.iterator().asScala
      .filter(p => sweepable(p.getFileName.toString))
      .foreach(p => try deleteRecursively(p) catch { case _: Exception => () })
    finally listing.close()
  }

  /** Drops a managed table AND clears its default warehouse location: a
    * previous JVM can leave the location populated while this JVM's
    * in-memory catalog is empty, and creating a managed table over a
    * non-empty existing location is refused. The one catalog-hygiene
    * sequence behind every rebuilt managed artifact (q89 bucketed tables,
    * the q114 band/text tables, the q129 IVF index halves).
    */
  def dropManagedTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    deleteRecursively(Paths.get(loc))
  }
}
