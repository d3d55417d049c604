package graft.tools

/** Writes `tools/hllpp_constants.json`: the HLL++ empirical constants the
  * q15 independent recompute needs — THRESHOLDS, and the
  * RAW_ESTIMATE_DATA / BIAS_DATA rows for the precision
  * `approx_count_distinct`'s default rsd (0.05 → p = 9) uses.
  *
  * These are the published appendix constants of the HLL++ paper (Heule,
  * Nunkesser, Hall: "HyperLogLog in Practice", EDBT'13 — the empirical
  * bias-correction dataset Google released with the paper). They are
  * ALGORITHM constants, identical in every faithful implementation, not
  * engine output over our corpus — sharing them with the Python recompute
  * is the same footing as sharing the hash seed (the gen_lsh_goldens.py
  * pattern). Sourced here from Spark's public implementation
  * (`org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper`), which
  * embeds the published tables verbatim.
  */
object DumpHllConstants {
  def main(args: Array[String]): Unit = {
    val p = math.ceil(2.0d * math.log(1.106d / 0.05d) / math.log(2.0d)).toInt
    require(p == 9, s"default-rsd precision changed: $p")
    val cls = org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
    def arr(a: Array[Double]) = a.map(d => java.lang.Double.toString(d)).mkString("[", ",", "]")
    val json =
      s"""{"p":$p,
         |"thresholds":${arr(cls.THRESHOLDS)},
         |"raw_estimate":${arr(cls.RAW_ESTIMATE_DATA(p - 4))},
         |"bias":${arr(cls.BIAS_DATA(p - 4))},
         |"k":${cls.K}}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("tools/hllpp_constants.json"),
      json.getBytes("UTF-8"))
    println(s"wrote tools/hllpp_constants.json (p=$p, " +
      s"raw=${cls.RAW_ESTIMATE_DATA(p - 4).length} bias=${cls.BIAS_DATA(p - 4).length})")
  }
}
