package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degenerate-input behavior across the operator families: empty inputs,
  * null/empty text, right-side-less as-of lookups. These shapes appear
  * constantly in real corpora and must degrade to empty/null results, never
  * to exceptions or fabricated rows.
  */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ngram LM top-k: counts, tie order, and the two-token floor") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "a b c", "a b d", "a c",  // bigrams: (a,b)x2 (b,c) (b,d) (a,c)
      "solo",                    // < 2 tokens: contributes nothing
      "  ", "",                  // degenerate: filtered by the token floor
    ).toDF("text")
    val out = TextAnalysis.ngramLmTopK(docs, "text", k = 2)
      .orderBy("w1", "rnk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    // (a,b) outranks (a,c) by count; (b,c)/(b,d) tie on count → w2 order
    assert(out == Seq(
      ("a", 1, "b", 2L), ("a", 2, "c", 1L),
      ("b", 1, "c", 1L), ("b", 2, "d", 1L)))
  }

  test("klDriftTopK: known-value smoothed contributions in exact nano-nats") {
    val s = spark
    import s.implicits._
    // slice A (doc 0): "x x y"; slice B (doc 1): "x z"
    // NA=3, NB=2, V=3; pA=(c+1)/(NA+V), pB=(c+1)/(NB+V)
    val docs = Seq((0L, "x x y"), (1L, "x z")).toDF("doc_id", "text")
    def nano(ca: Long, cb: Long) = {
      val (pa, pb) = ((ca + 1.0) / 6, (cb + 1.0) / 5)
      math.rint(pa * math.log(pa / pb) * 1e9).toLong
    }
    val out = TextAnalysis.klDriftTopK(docs, "text", col("doc_id") % 2 === 0, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // y over-represented in A, z under-represented (negative), x mildly over
    assert(out == Seq(
      ("y", 1L, 0L, nano(1, 0)),
      ("x", 2L, 1L, nano(2, 1)),
      ("z", 0L, 1L, nano(0, 1))))
    assert(out(0)._4 > out(1)._4 && out(2)._4 < 0)
  }

  test("bm25TopK: known-value scores in exact micro-units; term-less docs absent") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x x y"), (2L, "y z"), (3L, "z z z z")).toDF("doc_id", "text")
    // N=3, sum dl=9, avgdl=3; df(x)=1, df(y)=2 — mirrored op-for-op below
    def idf(df: Long) = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
    def tfn(tf: Long, dl: Long) =
      (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (9.0 / 3))))
    def c(df: Long, tf: Long, dl: Long) = math.rint(idf(df) * tfn(tf, dl) * 1000000.0).toLong
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x", "y"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> (c(1, 2, 3) + c(2, 1, 3)), // x twice + y once, dl=3
      2L -> c(2, 1, 2)))               // y once, dl=2; doc 3 has no term
  }

  test("pmiCollocations: known-value PMI over bigram-endpoint marginals") {
    val s = spark
    import s.implicits._
    // bigrams: (a,b)x3, (b,a)x2 → N=5; endpoint counts a=5, b=5
    val docs = Seq("a b a b a b").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", k = 3, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      ("a", "b", 3L, math.rint(math.log(3.0 * 5 / 25) * 1e6) / 1e6),
      ("b", "a", 2L, math.rint(math.log(2.0 * 5 / 25) * 1e6) / 1e6)))
  }

  test("chunkDocuments: boundary sizes, overlap coverage, short tail") {
    val s = spark
    import s.implicits._
    def toksOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toksOf(4)),  // == chunk → exactly one chunk
      (2L, toksOf(5)),  // chunk+1 → two chunks, strided overlap
      (3L, "solo"),     // shorter than one chunk → itself
      (4L, "  "),       // whitespace-only → filtered
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, strideTokens = 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 0, "t1 t2 t3 t4", 4L),
      (2L, 0, "t1 t2 t3 t4", 4L), (2L, 1, "t3 t4 t5", 3L),
      (3L, 0, "solo", 1L)))
    // every token of every kept doc appears in at least one chunk
    assert(out.filter(_._1 == 2L).flatMap(_._3.split(" ")).toSet == (1 to 5).map(i => s"t$i").toSet)
  }

  test("corpusDiversity: known values — within-source duplication shrinks ttr, not volume") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a", "one two three four"),   // 4 tokens, all distinct, 3 bigrams
      (1L, "a", "one two three four"),   // exact dup: volume doubles, vocab doesn't
      (2L, "b", "five five five"),       // 3 tokens, 1 distinct, 1 distinct bigram
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.corpusDiversity(docs, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(out(0) == (("a", 2L, 8L, 4L, 0.5, 3L)), s"source a: ${out.toSeq}")
    assert(out(1) == (("b", 1L, 3L, 1L, 0.3333, 1L)), s"source b: ${out.toSeq}")
  }

  test("corpusDiversity: a single-token doc's degenerate bigram is a bigram, not a token") {
    // The greatest(n-1, 1) bigram-window contract (shared with the q123
    // oracle) makes a one-token doc emit its lone token as the degenerate
    // bigram. The r13 'family by contains-a-space' inference filed that
    // spaceless gram as a token occurrence — inflating total_tokens and
    // dropping it from distinct_bigrams (ADVICE r13). The tagged
    // GramStream families must match the oracle: 1 token, 1 bigram.
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a", "solo"),             // 1 token; degenerate bigram "solo"
      (1L, "a", "alpha beta"),       // 2 tokens; bigram "alpha beta"
      (2L, "b", "solo"),             // all-single-token source
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.corpusDiversity(docs, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    // source a: 3 token occurrences (solo, alpha, beta — all distinct),
    // bigrams {"solo", "alpha beta"}; the degenerate "solo" bigram must not
    // leak into the token counts even though the string also IS a token
    assert(out(0) == (("a", 2L, 3L, 3L, 1.0, 2L)), s"source a: ${out.toSeq}")
    assert(out(1) == (("b", 1L, 1L, 1L, 1.0, 1L)), s"source b: ${out.toSeq}")
  }

  test("dedup pipelines return no pairs on an empty corpus") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashPairs(empty, "doc_id").count() == 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", 3).count() == 0)
    assert(Dedup.levenshteinPairs(empty, "doc_id", "text").count() == 0)
  }

  test("a single-document corpus yields no pairs") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(one, "doc_id").count() == 0)
    assert(Dedup.simhashPairs(one, "doc_id", "text").count() == 0)
  }

  test("empty and whitespace-only texts flow through text analysis without error") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real text here")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFeatures(docs, "text").collect()
    assert(out.length == 3)
    val tok = docs.select(TextAnalysis.wsTokenCount(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    // empty/blank text = zero tokens, not one empty token
    assert(tok.take(2) == Seq(0L, 0L) && tok(2) == 3L, s"token counts: $tok")
  }

  test("curation operators degrade to empty results on an empty corpus") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.packSequences(empty, "doc_id", "text", 100L, 4).count() == 0)
    assert(Curation.stratifiedSample(empty, "doc_id", "text").count() == 0)
    assert(Curation.sampleFixedK(empty, "doc_id", "text", 5).count() == 0)
    assert(Curation.qualityGateTopHalf(empty, "doc_id", "text").count() == 0)
    assert(Curation.repetitionRatios(empty, "doc_id", "text").count() == 0)
    val one = Seq((1L, "single doc")).toDF("doc_id", "text")
    assert(Curation.contamination(one, empty, "doc_id", "text", 3).count() == 0,
      "an empty holdout set can contaminate nothing")
  }

  test("duplicate clustering of an empty pair set is empty; self-contained pairs work") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.duplicateClusters(empty).count() == 0)
  }

  test("as-of join with an empty right side keeps left rows with null value") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L), (2L, 200L)).toDF("k", "ts")
    val right = Seq.empty[(Long, Long, Double, Long)].toDF("k", "ts", "v", "tb")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", "v", "tb")
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("asof_value"))))
  }

  test("embedding LSH pairs on an empty corpus return empty without a dim probe error") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // dim discovery has no first row to inspect — must degrade to empty, not throw
    assert(Dedup.embeddingLshPairs(empty, "vec_id", "embedding").count() == 0)
  }

  test("round-5 operators degrade to empty results on empty inputs") {
    val s = spark
    import s.implicits._
    val emptyEv = Seq.empty[(Long, Long, Double, Long)].toDF("user_id", "ts_us", "value", "event_id")
    assert(Resample.gapFillResample(emptyEv, "user_id", "ts_us", "value", "event_id", 10L)
      .count() == 0)
    assert(Funnels.cohortRetention(
      emptyEv.withColumnRenamed("value", "v"), "user_id", "ts_us").count() == 0)
    val emptyTyped = Seq.empty[(Long, Long, String, Long)].toDF("user_id", "ts_us", "event_type", "event_id")
    assert(Funnels.funnelStages(emptyTyped, "user_id", "ts_us", "event_type",
      "event_id", Seq("view", "click"), windowUs = 10L).count() == 0)
    // profiling an empty table still yields one row per profiled column —
    // all zeros, never an empty or failed result
    val emptyDocs = Seq.empty[(Option[Long], Option[String])].toDF("k", "v")
    val prof = Profile.profile(emptyDocs, Seq("k", "v")).orderBy("col_name").collect()
    assert(prof.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("k", 0L, 0L), ("v", 0L, 0L)))
  }

  test("merge with an empty changeset payload set vs an empty base") {
    val s = spark
    import s.implicits._
    val base = Seq.empty[(Long, Double)].toDF("k", "price")
    val ch = Seq((5L, "I", 50.0)).toDF("k", "op", "price")
    // inserting into an empty base yields exactly the inserts
    val out = MergeUpsert.merge(base, ch, "k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((5L, 50.0)))
    // and an all-delete changeset empties the base
    val base2 = Seq((1L, 10.0)).toDF("k", "price")
    val ch2 = Seq((1L, "D", 0.0)).toDF("k", "op", "price")
    assert(MergeUpsert.merge(base2, ch2, "k").count() == 0)
  }

  test("frame dedup: identical payloads always pair, posting cap bounds a fingerprint flood") {
    val s = spark
    import s.implicits._
    // payload with ≥3 decoded frames (checksum % 7 >= 2) so stride-2
    // sampling yields ≥2 fingerprints — identical payloads then share ALL
    // of them and must pair with shared ≥ 2
    val text = "a video stand-in payload that decodes into many sampled frames for the spec"
    val base = graft.Tables(s, graft.TestSpark.Sf0001).documents
      .select("doc_id", "text").filter(col("doc_id") <= 20)
    val docs = base.unionByName(
      Seq((9000L, text), (9001L, text)).toDF("doc_id", "text"))
    val assets = Multimodal.decodeAssets(s, docs)
    val nf = assets.filter(col("doc_id") === 9000L).head().n_frames
    assert(nf >= 3, s"fixture text must decode to >=3 frames, got $nf")
    val pairs = Multimodal.frameDupPairs(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.find(p => p._1 == 9000L && p._2 == 9001L)
    assert(planted.exists(_._3 == ((nf + 1) / 2).toLong),
      s"identical payloads must share every sampled fingerprint: ${pairs.toSeq}")
    // a fingerprint flood (many identical payloads) stays bounded by the
    // posting cap: with cap=4, the flood contributes at most C(4,2) pairs
    // per fingerprint, never quadratic in the flood size
    val flood = (100L until 160L).map(i => (i, text)).toDF("doc_id", "text")
    val capped = Multimodal.frameDupPairs(
      Multimodal.decodeAssets(s, flood), maxPosting = 4)
      .collect()
    assert(capped.length <= 4 * 3 / 2,
      s"cap=4 must bound the flood to C(4,2) pairs, got ${capped.length}")
  }
}
