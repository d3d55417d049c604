package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class NameRulesSpec extends AnyFunSuite {

  test("cleanPythonName matches reference examples") {
    assert(NameRules.cleanPythonName("9src0 name!") == "src0_name_")
    assert(NameRules.cleanPythonName("  1stePlaatsing") == "stePlaatsing")
    assert(NameRules.cleanPythonName("odata.type") == "odata_type")
    assert(NameRules.cleanPythonName("_already_ok") == "_already_ok")
    assert(NameRules.cleanPythonName("123") == "")
  }

  test("cleanPythonName output is a valid identifier (or empty) and idempotent") {
    val gen = Gen.asciiPrintableStr
    val samples = (0 until 500).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.size > 400)
    samples.foreach { s =>
      val c = NameRules.cleanPythonName(s)
      assert(c.isEmpty || c.matches("^[a-zA-Z_][0-9a-zA-Z_]*$"), s"input=$s out=$c")
      assert(NameRules.cleanPythonName(c) == c, s"not idempotent on $s")
    }
  }

  test("cleanDescription strips CR/LF and truncates to 1023 with ellipsis") {
    assert(NameRules.cleanDescription("a\nb\rc") == "abc")
    val long = "x" * 2000
    val out = NameRules.cleanDescription(long)
    assert(out.length == 1023)
    assert(out == "x" * 1020 + "...")
    // boundary: exactly 1023 chars survives untouched
    assert(NameRules.cleanDescription("y" * 1023) == "y" * 1023)
  }

  test("cleanDescription column expression agrees with the pure function") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val inputs = Seq("a\nb\rc", "x" * 2000, "y" * 1023, "short")
    val got = inputs.toDF("s")
      .select(NameRules.cleanDescriptionCol(col("s")).as("c"))
      .as[String].collect().toSeq
    assert(got == inputs.map(NameRules.cleanDescription))
  }

  test("renameDots renames only dots") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "a")).toDF("odata.type", "Key")
    assert(NameRules.renameDots(df).columns.toSeq == Seq("odata_type", "Key"))
  }
}
