package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators.Similarity

/** Measures the persisted-IVF search contract across two decades of corpus
  * (→ `SCALE_IVF.json`): search wall + candidate volume for a FIXED 1000-
  * query increment against N ∈ {20k, 80k, 320k} vectors, under
  *
  *  - `nlist = 16` — the certification fixture's config held fixed:
  *    candidates/query = nprobe·N/nlist grows LINEARLY with the corpus
  *    (the shape q129's sf1 wall shows); and
  *  - `nlist = ⌈√N⌉` — the documented at-scale posture (cell size ~√N,
  *    sampled training, nlist-proportional parallelism): candidate volume
  *    grows as √N, so the search-wall exponent should drop by ~half.
  *
  * Build wall is reported separately — it is the once-per-corpus cost a
  * deployment amortizes (exactly what [[Similarity.buildIvfIndex]] /
  * [[Similarity.searchIvfIndex]] split apart).
  *
  * Corpus: sf0.1 embeddings tiled with disjoint vec_ids (repeated vectors
  * are legitimate ANN structure); queries are the first 1000 vectors of
  * copy 0, so the query workload is IDENTICAL at every point.
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()
    val queries = base.filter(col("vec_id") < 1000).localCheckpoint(true)

    def corpusOf(mult: Int): DataFrame = {
      val off = baseN + 1
      base.select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
        .withColumn("vec_id", col("vec_id") + col("_i") * off).drop("_i")
        .repartition(32).localCheckpoint(true)
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val points = for {
      mult <- Seq(10, 40, 160)
      n = baseN * mult
      (cfg, nlist) <- Seq(
        ("fixed16", 16),
        ("sqrtN", math.ceil(math.sqrt(n.toDouble)).toInt))
    } yield {
      val corpus = corpusOf(mult)
      val tag = s"ivfscale_${mult}_$cfg"
      // sampled training keeps the Lloyd passes ~8·nlist vectors wide
      val mod = math.max(1L, n / (nlist * 8L)).toInt
      val (_, buildS) = timed {
        Similarity.buildIvfIndex(spark, corpus, "vec_id", "embedding", tag,
          nlist = nlist, trainSampleMod = mod)
      }
      val searchRuns = (1 to 3).map { _ =>
        timed(Similarity.searchIvfIndex(spark, queries, "vec_id", "embedding",
          tag, k = 3).collect())._2
      }.sorted
      // candidate volume: the probe-expansion row count the search scores
      val cand = Similarity.searchCandidateCount(spark, queries, "vec_id",
        "embedding", tag, nprobe = 4)
      corpus.unpersist()
      println(f"IVFSCALE n=$n%8d $cfg%-8s nlist=$nlist%4d build=$buildS%7.2f " +
        f"search_med=${searchRuns(1)}%7.3f cand=$cand%10d")
      (n, cfg, nlist, buildS, searchRuns(1), cand)
    }

    def exponent(cfg: String): Double = {
      val ps = points.filter(_._2 == cfg).sortBy(_._1)
      val (n0, _, _, _, s0, _) = ps.head
      val (n1, _, _, _, s1, _) = ps.last
      math.log(s1 / s0) / math.log(n1.toDouble / n0)
    }
    val json =
      s"""{"queries":1000,"nprobe":4,"k":3,
         |"points":[${points.map { case (n, cfg, nl, b, s, c) =>
          s"""{"n":$n,"config":"$cfg","nlist":$nl,"build_s":${f"$b%.3f"},"search_s":${f"$s%.3f"},"candidates":$c}"""
        }.mkString(",\n ")}],
         |"search_wall_exponent":{"fixed16":${f"${exponent("fixed16")}%.3f"},"sqrtN":${f"${exponent("sqrtN")}%.3f"}}}
         |""".stripMargin
    Files.write(Paths.get("SCALE_IVF.json"), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
