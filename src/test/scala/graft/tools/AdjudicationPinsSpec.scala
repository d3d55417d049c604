package graft.tools

import java.io.File

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Runs the Python adjudication regression suite
  * (`tools/test_adjudication.py`, 16 unittest cases) from `sbt test`, so
  * the machinery pins — contested-sample exclusion and the q107-history
  * circularity replay, the suite-total drift gate's verdict paths, and
  * bench_sf1's fp-gated UNCONFIRMED close — run whenever the ScalaTest
  * suite does, not only when someone remembers the Python file (r18).
  * Cancels (does not fail) when python3 is unavailable, matching how the
  * bench itself degrades without it.
  */
class AdjudicationPinsSpec extends AnyFunSuite {

  private def repoRoot: Option[File] = {
    def up(f: File, n: Int): Option[File] =
      if (f == null || n < 0) None
      else if (new File(f, "tools/test_adjudication.py").isFile) Some(f)
      else up(f.getParentFile, n - 1)
    up(new File(sys.props("user.dir")).getAbsoluteFile, 3)
  }

  test("python adjudication regression suite passes") {
    val root = repoRoot
    assume(root.isDefined, "tools/test_adjudication.py not found from cwd")
    val havePython = try {
      Process(Seq("python3", "--version")).!(ProcessLogger(_ => ())) == 0
    } catch { case _: Exception => false }
    assume(havePython, "python3 unavailable")
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/test_adjudication.py"),
      root.get).!(ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n')))
    assert(code == 0, s"test_adjudication.py exited $code:\n$out")
    assert(out.toString.contains("OK"), out.toString.takeRight(500))
  }
}
