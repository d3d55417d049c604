package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared staging/publish discipline behind every derived layout
  * (Tables staged copies, ReplayStage, the late-drop replay, the connector
  * replay): signature-verbatim dir identity, publish-once, the
  * superseded-signature sweep on regeneration, and non-interference with
  * in-flight writers.
  */
class StageDirSpec extends AnyFunSuite {

  private def freshBase(): String =
    s"graft_stagespec_${java.util.UUID.randomUUID().toString.take(8)}"

  private def sweep(base: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(StageDir.scratchBase))
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith(base))
      .foreach(StageDir.deleteRecursively)
    finally s.close()
  }

  test("publish embeds the signature verbatim (sanitized) — no lossy hash identity") {
    val base = freshBase()
    try {
      val dir = StageDir.publish(base, "v1:12345:67890:9") { tmp =>
        Files.writeString(tmp.resolve("payload.txt"), "x")
      }
      assert(dir.getFileName.toString == s"$base.v1-12345-67890-9")
      assert(Files.readString(dir.resolve("payload.txt")) == "x")
    } finally sweep(base)
  }

  test("same signature publishes once; a regenerated signature supersedes the old layout") {
    val base = freshBase()
    try {
      var writes = 0
      def put(sig: String, content: String) = StageDir.publish(base, sig) { tmp =>
        writes += 1
        Files.writeString(tmp.resolve("payload.txt"), content)
      }
      val first = put("100:1", "one")
      assert(put("100:1", "one-again") == first && writes == 1,
        "re-publishing a live signature must be a no-op")

      // the fixture was regenerated in place: new sig => NEW dir, old swept
      val second = put("100:2", "two")
      assert(second != first)
      assert(Files.readString(second.resolve("payload.txt")) == "two")
      assert(!Files.exists(first), "superseded signature must be dropped after publish")
    } finally sweep(base)
  }

  test("the superseded sweep never touches a racing writer's in-flight tmp dir") {
    val base = freshBase()
    try {
      val inflight = Paths.get(StageDir.scratchBase, s"$base.999-9.tmp.4242")
      Files.createDirectories(inflight)
      val dir = StageDir.publish(base, "1:1") { tmp =>
        Files.writeString(tmp.resolve("p"), "x")
      }
      assert(Files.exists(inflight), "in-flight .tmp.<pid> dirs belong to their writer")
      assert(Files.exists(dir))
    } finally sweep(base)
  }

  test("a writer losing the publish race discards its copy and reads the winner's") {
    val base = freshBase()
    try {
      // the loser passed the exists-check first, but the winner's rename
      // lands while the loser is still writing its payload — the loser's
      // move must fail, its tmp be discarded, and the winner's copy win
      val expected = Paths.get(StageDir.scratchBase, s"$base.5-5")
      val result = StageDir.publish(base, "5:5") { tmp =>
        Files.writeString(tmp.resolve("payload.txt"), "loser")
        Files.createDirectories(expected)
        Files.writeString(expected.resolve("payload.txt"), "winner")
      }
      assert(result == expected)
      assert(Files.readString(result.resolve("payload.txt")) == "winner")
      import scala.jdk.CollectionConverters._
      val leftovers = {
        val s = Files.list(Paths.get(StageDir.scratchBase))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(fn => fn.startsWith(base) && fn.contains(".tmp.")).toList
        finally s.close()
      }
      assert(leftovers.isEmpty, s"loser's tmp dirs must be discarded: $leftovers")
    } finally sweep(base)
  }

  test("sweepRunScratch spares a live own-pid run dir; reclaims it after release") {
    val prefix = s"${freshBase()}_"
    try {
      // stale own-pid dir from a previous (released) run
      val stale = Paths.get(StageDir.scratchBase,
        s"$prefix${ProcessHandle.current().pid()}_0")
      Files.createDirectories(stale)
      val live = StageDir.acquireRunDir(prefix)
      Files.createDirectories(live)
      StageDir.sweepRunScratch(Seq(prefix))
      assert(!Files.exists(stale), "released/previous runs are reclaimed")
      assert(Files.exists(live), "an in-flight (acquired, unreleased) run dir must survive the sweep")
      StageDir.releaseRunDir(live)
      StageDir.sweepRunScratch(Seq(prefix))
      assert(!Files.exists(live), "after release the next sweep reclaims the dir")
    } finally sweep(prefix.stripSuffix("_"))
  }

  test("a throwing payload leaves no tmp behind and the next attempt gets a fresh dir") {
    val base = freshBase()
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      intercept[RuntimeException](StageDir.publish(base, "7:7") { tmp =>
        seen += tmp.getFileName.toString
        Files.writeString(tmp.resolve("partial.bin"), "junk")
        sys.error("payload write failed")
      })
      import scala.jdk.CollectionConverters._
      def leftovers = {
        val s = Files.list(Paths.get(StageDir.scratchBase))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(fn => fn.startsWith(base) && fn.contains(".tmp.")).toList
        finally s.close()
      }
      assert(leftovers.isEmpty, s"failed attempt's tmp must not accumulate in tmpfs: $leftovers")
      // retry succeeds, in a DIFFERENT per-attempt tmp dir — a move-based
      // payload must never find the failed attempt's files in its way
      val out = StageDir.publish(base, "7:7") { tmp =>
        seen += tmp.getFileName.toString
        assert(!Files.exists(tmp.resolve("partial.bin")),
          "retry must not see the failed attempt's partial payload")
        Files.writeString(tmp.resolve("payload.txt"), "ok")
      }
      assert(seen.distinct.size == 2, s"tmp dirs must be unique per attempt: $seen")
      assert(Files.readString(out.resolve("payload.txt")) == "ok")
    } finally sweep(base)
  }
}
