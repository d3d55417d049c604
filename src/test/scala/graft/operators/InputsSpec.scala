package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InputsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def docs = {
    val s = spark
    import s.implicits._
    (0L to 63L).map(i => (i, s"document number $i with some text")).toDF("doc_id", "text")
  }

  test("spread widens a narrow exchange-free input to the default parallelism") {
    val out = Inputs.spread(docs.filter(length(col("text")) > 0))
    assert(out.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    assert(out.count() == 64)
  }

  test("spread fails fast on an input whose plan already contains an Exchange") {
    val shuffled = docs.repartition(2)
    val e = intercept[IllegalArgumentException](Inputs.spread(shuffled))
    assert(e.getMessage.contains("Exchange"))

    val aggregated = docs.groupBy("text").count()
    intercept[IllegalArgumentException](Inputs.spread(aggregated))
  }
}
