package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.odata.ODataUrls

/** CLI parity with the reference's config-file flow (cli.py:56-86 +
  * config.py:30-54): a `datasets.toml`-shaped file drives multiple dataset
  * ingests in one invocation, fully offline via `--replay`.
  */
class IngestCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Minimal single-page v4 dataset replay fixture. */
  private def v4Payloads(id: String, value: Double): Map[String, String] = {
    val base = ODataUrls.v4Base(id)
    Map(
      base ->
        """{"value":[{"name":"Properties","url":"Properties"},{"name":"Observations","url":"Observations"}]}""",
      s"$base/Properties" ->
        s"""{"Identifier":"$id","Description":"cli test","Modified":"2024-01-01","ObservationCount":1}""",
      s"$base/Observations" ->
        s"""{"value":[{"Id":0,"Measure":"M1","Value":$value}]}""",
    )
  }

  test("datasets.toml parsing: ids array, comments, missing key") {
    val f = Files.createTempFile("graft_datasets", ".toml")
    Files.writeString(f,
      """# reference datasets.toml shape
        |ids = ["11111TST", "22222TST"]
        |# ids = ["99999XXX"]
        |""".stripMargin)
    assert(IngestCli.datasetIds(f.toString) == Seq("11111TST", "22222TST"))
    val empty = Files.createTempFile("graft_datasets_empty", ".toml")
    Files.writeString(empty, "# nothing here\n")
    assert(IngestCli.datasetIds(empty.toString).isEmpty)
  }

  test("CLI drives two ids from one config file, offline") {
    val dir = Files.createTempDirectory("graft_cli")
    val payloads = v4Payloads("11111TST", 1.5) ++ v4Payloads("22222TST", 2.5)
    var i = 0
    val index = payloads.map { case (url, content) =>
      val fn = s"c$i.json"; i += 1
      Files.writeString(dir.resolve(fn), content)
      s""""${url.replace("\"", "\\\"")}": "$fn""""
    }.mkString("{", ",", "}")
    Files.writeString(dir.resolve("index.json"), index)
    val toml = dir.resolve("datasets.toml")
    Files.writeString(toml, """ids = ["11111TST", "22222TST"]""" + "\n")

    val root = Files.createTempDirectory("graft_cli_root").toString
    spark // ensure the shared session exists so the CLI reuses it
    IngestCli.main(Array(
      "--config", toml.toString, "--root", root,
      "--replay", dir.resolve("index.json").toString))

    Seq("11111TST" -> 1.5, "22222TST" -> 2.5).foreach { case (id, v) =>
      val snaps = Files.list(java.nio.file.Paths.get(s"$root/cbs/v4/$id"))
      val snap = try snaps.iterator().next() finally snaps.close()
      val obs = spark.read.parquet(s"$snap/cbs.v4.${id}_Observations.parquet")
      assert(obs.count() == 1)
      assert(obs.select("Value").head().getDouble(0) == v)
    }
  }
}
