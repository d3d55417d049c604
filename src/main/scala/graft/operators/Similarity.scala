package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, per SURVEY §2.C:
  *
  *  - '''Brute force''' (the correctness baseline): broadcast the (small)
  *    query set against the corpus — one scan of the corpus, no corpus
  *    shuffle, per-partition local work, then a global top-k. Ranking uses
  *    the 6-decimal-rounded similarity with the neighbor id as tiebreak so
  *    results are reproducible across engines and partitionings.
  *  - '''LSH-bucketed''' (the scale path): sign-random-projection buckets —
  *    each vector hashes to a bucket id from the signs of `nPlanes` fixed
  *    random hyperplane projections; candidate neighbors come from an
  *    equi-join on the bucket id (a plain shuffle/broadcast hash join), so
  *    the 100 TB cost is one join on a dense int key instead of a cross
  *    join. Recall is tuned by `nPlanes` (fewer planes ⇒ bigger buckets).
  *
  * Hyperplanes are generated from a fixed seed (java.util.Random is
  * specified deterministically), so bucket assignment is reproducible.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Exact top-k neighbors for each query vector (brute force baseline). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, keyCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(keyCol).as("q_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(keyCol).as("n_id"), col(vecCol).as("nv"))
    val cos = VectorFunctions.cosineNative(corpus.sparkSession) _
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cos(col("qv"), col("nv")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
  }

  /** Fixed random hyperplanes: nPlanes × dim, seed-deterministic. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Adds `bucket`: the sign-pattern integer of the vector's projections. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Array[Array[Double]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val lit_p = array(p.map(lit(_)).toIndexedSeq: _*)
      when(aggregate(zip_with(col(vecCol), lit_p, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** ANN top-k via LSH buckets: candidates share the query's bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, keyCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val dim = 64 // fixture embedding dimensionality (FIXTURES.md §B)
    val planes = hyperplanes(nPlanes, dim)
    val q = withLshBucket(queries, vecCol, planes)
      .select(col(keyCol).as("q_id"), col(vecCol).as("qv"), col("bucket"))
    val c = withLshBucket(corpus, vecCol, planes)
      .select(col(keyCol).as("n_id"), col(vecCol).as("nv"), col("bucket"))
    val cos = VectorFunctions.cosineNative(corpus.sparkSession) _
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cos(col("qv"), col("nv")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
  }

  /** IVF-flat ANN: the corpus is partitioned into `nlist` cells by nearest
    * centroid; a query scores only vectors in its `nprobe` nearest cells.
    *
    * Centroids are data vectors picked deterministically (lowest ids) — at
    * scale they'd come from a k-means sample, but the *query shape* is the
    * point: cell assignment is one broadcast-join + per-key argmax, the
    * probe is an equi-join on the dense `cent_id` key, and the corpus never
    * cross-joins the query set. All ranking happens on 6-decimal-rounded
    * scores with id tiebreaks, so the whole pipeline is reproducible (and
    * DuckDB-oracled, unusually for an ANN index).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, keyCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cos = VectorFunctions.cosineNative(corpus.sparkSession) _
    val cent = corpus.filter(col(keyCol) < nlist)
      .select(col(keyCol).as("cent_id"), col(vecCol).as("cvec"))
    def assignments(df: DataFrame, idAs: String): DataFrame =
      df.select(col(keyCol).as(idAs), col(vecCol))
        .join(broadcast(cent))
        .select(col(idAs), col("cent_id"),
          round(cos(col(vecCol), col("cvec")), 6).as("s"))
    val wCell = Window.partitionBy("c_id").orderBy(col("s").desc, col("cent_id"))
    val cells = assignments(corpus, "c_id")
      .withColumn("rn", row_number().over(wCell)).filter(col("rn") === 1)
      .select(col("c_id"), col("cent_id"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("s").desc, col("cent_id"))
    val probes = assignments(queries, "q_id")
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("cent_id"))
    val candidates = probes.join(cells, "cent_id")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id").as("n_id"))
    // query vectors come from the QUERIES input — they need not exist in the
    // corpus (and a colliding corpus id must not shadow them)
    val scored = candidates
      .join(queries.select(col(keyCol).as("q_id"), col(vecCol).as("qv")), "q_id")
      .join(corpus.select(col(keyCol).as("n_id"), col(vecCol).as("nv")), "n_id")
      .select(col("q_id"), col("n_id"), round(cos(col("qv"), col("nv")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("sim"))
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    "q45_similarity_topk" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      bruteForceTopK(emb.filter(col("vec_id") <= 5), emb, "vec_id", "embedding", k = 3)
        .orderBy("q_id", "rnk")
    }),
    // Engine-seeded bucketing → rows-only check; recall asserted in specs.
    "q46_similarity_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      lshTopK(emb.filter(col("vec_id") <= 5), emb, "vec_id", "embedding", k = 3)
        .orderBy("q_id", "rnk")
    }),
    "q55_similarity_ivf" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      ivfTopK(emb.filter(col("vec_id") <= 5), emb, "vec_id", "embedding", k = 3)
        .orderBy("q_id", "rnk")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q45_similarity_topk" ->
      """SELECT q_id, rnk, n_id, sim FROM (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                  ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rnk
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id <= 5) t
         WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "q55_similarity_ivf" ->
      """WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
              ca AS (SELECT e.vec_id, cent_id,
                            ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(cvec AS DOUBLE[])), 6) AS s
                     FROM embeddings e CROSS JOIN cent),
              cells AS (SELECT vec_id AS c_id, cent_id FROM
                          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn FROM ca) x
                        WHERE rn = 1),
              probes AS (SELECT vec_id AS q_id, cent_id FROM
                           (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn
                            FROM ca WHERE vec_id <= 5) y
                         WHERE rn <= 4),
              cand AS (SELECT q_id, c_id AS n_id FROM probes JOIN cells USING (cent_id) WHERE c_id <> q_id),
              scored AS (SELECT q_id, n_id,
                                ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
                         FROM cand JOIN embeddings a ON a.vec_id = q_id JOIN embeddings b ON b.vec_id = n_id)
         SELECT q_id, rnk, n_id, sim FROM
           (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM scored) z
         WHERE rnk <= 3 ORDER BY q_id, rnk""",
  )
}
