package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Pins the load-bearing claim behind the norm-factored cosine (q129 index,
  * q124/q135 verify): `dot(a,b) / (l2norm(a) * l2norm(b))` is BIT-identical
  * to the inline `CosineSimilarity` over real fixture vectors — same fold
  * order, same division shape, IEEE multiply commutative — so every round-6
  * certified score is unchanged by precomputing norms.
  */
class VecPrimitivesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("norm-factored cosine equals inline cosine bit-for-bit on fixture pairs") {
    val emb = graft.Tables(spark, graft.TestSpark.Sf0001).embeddings
    val cos = VectorFunctions.cosineNative(spark) _
    val dot = VectorFunctions.dotNative(spark) _
    val nrm = VectorFunctions.normNative(spark)(_)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"),
      nrm(col("embedding")).as("na")).filter(col("ia") <= 60)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      nrm(col("embedding")).as("nb")).filter(col("ib") <= 60)
    val diff = a.join(b, col("ia") < col("ib"))
      .select(cos(col("va"), col("vb")).as("inline"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("factored"))
      // bitwise compare: NaN-safe eqNullSafe over doubles produced both ways
      .filter(!(col("inline") <=> col("factored")))
      .count()
    assert(diff == 0L, s"$diff of 1770 pairs differ bitwise")
  }

  test("dot/norm interpreted path matches codegen and the zip_with fold") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f)))
      .toDF("x", "y")
    val dot = VectorFunctions.dotNative(spark) _
    val nrm = VectorFunctions.normNative(spark)(_)
    val r = df.select(dot(col("x"), col("y")).as("d"), nrm(col("x")).as("n")).head()
    assert(r.getDouble(0) == 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0)
    assert(r.getDouble(1) == math.sqrt(1.5 * 1.5 + 2.25 * 2.25 + 3.0 * 3.0))
  }
}
