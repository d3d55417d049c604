package graft

import org.apache.spark.sql.SparkSession

import graft.sources.odata.{HttpClient, ReplayClient, StatlineIngest}

/** CLI entry point (reference `statline-bq` command, cli.py:12-87).
  *
  * {{{
  * spark-submit --class graft.IngestCli app.jar \
  *   --id 83583NED [--id 84799NED ...] --root /data/statline \
  *   [--endpoint local|store|catalog] [--source cbs] [--third-party]
  *   [--force] [--replay index.json]
  * }}}
  *
  * `--replay` points at a JSON object of url → payload-file path and swaps
  * the network client for an offline replay (CI / air-gapped runs).
  */
object IngestCli {
  def main(args: Array[String]): Unit = {
    var ids = List.empty[String]
    var root = ""
    var endpoint = "local"
    var source = "cbs"
    var thirdParty = false
    var force = false
    var replay: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--id" => ids ::= args(i + 1); i += 2
        case "--root" => root = args(i + 1); i += 2
        case "--endpoint" => endpoint = args(i + 1); i += 2
        case "--source" => source = args(i + 1); i += 2
        case "--third-party" => thirdParty = true; i += 1
        case "--force" => force = true; i += 1
        case "--replay" => replay = Some(args(i + 1)); i += 2
        case other => sys.error(s"unknown argument: $other (expected --id/--root/--endpoint/--source/--third-party/--force/--replay)")
      }
    }
    require(ids.nonEmpty, "at least one --id is required")
    require(root.nonEmpty, "--root is required")

    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val client = replay match {
      case Some(indexPath) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(indexPath)))
        val base = java.nio.file.Paths.get(indexPath).toAbsolutePath.getParent
        val m = Map.newBuilder[String, String]
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          m += (e.getKey -> java.nio.file.Files.readString(base.resolve(e.getValue.asText())))
        }
        ReplayClient(m.result())
      case None => new HttpClient()
    }

    val ingest = new StatlineIngest(spark, client, source)
    ids.reverse.foreach { id =>
      val res = ingest.run(id, root, endpoint, thirdParty, force)
      if (res.skipped)
        println(s"[ingest] $id: up to date, skipped")
      else
        println(s"[ingest] $id: ${res.parquetPaths.size} tables -> ${res.snapshotDir}")
    }
    spark.stop()
  }
}
