package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def docsOf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("greedy packing: budget boundary, oversized doc, per-shard restart") {
    // one shard (ids all ≡ 1 mod 8… keep ids in one shard by using nShards=1)
    val docs = docsOf(
      (0L, "a b c"),          // 3 tokens → pack 0 (acc 3)
      (1L, "d e"),            // +2 = 5 ≤ 5 → pack 0 (acc 5)
      (2L, "f"),              // 5+1 > 5 → pack 1 (acc 1)
      (3L, "w x y z q r s"),  // 7 tokens oversized: 1+7 > 5 → pack 2 alone
      (4L, "t u"),            // 7+2 > 5 → pack 3
    )
    val out = Curation.packSequences(docs, "doc_id", "text", budget = 5L, nShards = 1)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
      Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("greedy packing is deterministic under input partitioning") {
    val docs = docsOf((0L to 40L).map(i => (i, s"tok ${"x " * (i % 7).toInt}trail")): _*)
    val a = Curation.packSequences(docs, "doc_id", "text", 10L, 4)
      .orderBy("shard", "doc_id").collect().toSeq
    val b = Curation.packSequences(docs.repartition(7), "doc_id", "text", 10L, 4)
      .orderBy("shard", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("contamination: planted overlap found, clean docs absent, holdout side broadcast") {
    val train = docsOf(
      (1L, "the quick brown fox jumps high"), // shares "the quick brown"+"quick brown fox" (benchmark trigram)
      (2L, "completely novel training text here"),
    )
    val holdout = docsOf((100L, "the quick brown fox runs"))
    val df = Curation.contamination(train, holdout, "doc_id", "text", 3)
    val rows = df.orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // scale shape: the holdout gram set must be the BROADCAST side, and the
    // training corpus must not shuffle on the way to the join
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(plan.collect { case b: BroadcastExchangeLike => b }.nonEmpty, plan.toString)
    val streamedSideClean = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        // streamed child = the one without a BroadcastExchange in its subtree
        // (the holdout side may legitimately shuffle for its distinct)
        val streamed = j.children.filter(
          _.collect { case b: BroadcastExchangeLike => b }.isEmpty)
        streamed.nonEmpty &&
          streamed.forall(_.collect { case s: ShuffleExchangeLike => s }.isEmpty)
    }
    assert(streamedSideClean.nonEmpty && streamedSideClean.forall(identity), plan.toString)
  }

  test("stratified sampling is a pure filter (no shuffle, no nondeterminism)") {
    val docs = docsOf((0L to 200L).map(i => (i, "y " * (i % 60).toInt + "end")): _*)
    val df = Curation.stratifiedSample(docs, "doc_id", "text")
    val a = df.collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.stratifiedSample(docs.repartition(5), "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "sample must be independent of partitioning")
    val plan = df.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.initialPlan
      case p => p
    }
    assert(plan.collect { case s: ShuffleExchangeLike => s }.isEmpty, plan.toString)
  }

  test("fixed-k sampling: exact per-stratum budgets, deterministic under partitioning") {
    val docs = docsOf((0L to 100L).map(i => (i, "z " * (i % 60).toInt + "end")): _*)
    val out = Curation.sampleFixedK(docs, "doc_id", "text", k = 7)
    val sizes = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 7) && sizes.values.exists(_ == 7), sizes.toString)
    val again = Curation.sampleFixedK(docs.repartition(9), "doc_id", "text", k = 7)
      .orderBy("doc_id").collect().toSeq
    assert(out.orderBy("doc_id").collect().toSeq == again)
  }

  test("quality gate keeps exactly the top ceil(n/2) of each stratum") {
    val docs = docsOf((0L to 50L).map(i =>
      (i, ("w " * (i % 9).toInt) + ("!!! " * (i % 4).toInt) + "tail")): _*)
    val kept = Curation.qualityGateTopHalf(docs, "doc_id", "text")
    val keptByStratum = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.select(
        when(length(col("text")) < 200, "short")
          .when(length(col("text")) < 400, "medium").otherwise("long").as("stratum"))
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (s, n) =>
      assert(keptByStratum.getOrElse(s, 0L) == n - n / 2,
        s"stratum $s: kept ${keptByStratum.get(s)} of $n")
    }
  }

  test("native graft_word_ngrams ≡ composed transform/slice/concat_ws, both flags") {
    // the native one-pass generator must be value- AND order-identical to
    // the composed form it replaced (round 14) — including the degenerate
    // contract: fewer than n tokens yields ONE gram joining all tokens,
    // empty/blank text behaves like Spark's split('') single empty token,
    // and distinct=true matches array_distinct's first-occurrence order
    val docs = docsOf(
      (0L, "a b c d e"),
      (1L, "a b a b a b"),     // repeats: distinct path must dedup in order
      (2L, "one"),             // < n tokens → one degenerate gram
      (3L, "two words"),
      (4L, ""),                // empty → [""] token contract
      (5L, "   "),             // blank → same
      (6L, "  padded   runs  of    spaces "),
    )
    for (n <- Seq(2, 3, 5)) {
      val native = docs.select(col("doc_id"),
        graft.expressions.TextSignatures.wordNgramsCol(spark)(col("text"), n, false).as("g"))
      val composed = docs.select(col("doc_id"), Curation.wordNgrams("text", n).as("g"))
      assert(native.orderBy("doc_id").collect().toSeq ==
        composed.orderBy("doc_id").collect().toSeq, s"plain n=$n")
      val nativeD = docs.select(col("doc_id"),
        graft.expressions.TextSignatures.wordNgramsCol(spark)(col("text"), n, true).as("g"))
      val composedD = docs.select(col("doc_id"),
        array_distinct(Curation.wordNgrams("text", n)).as("g"))
      assert(nativeD.orderBy("doc_id").collect().toSeq ==
        composedD.orderBy("doc_id").collect().toSeq, s"distinct n=$n")
    }
  }

  test("native repStats ≡ composed formulation on the fixture corpus + edge cases") {
    val fixture = graft.Tables(spark, graft.TestSpark.Sf0001).documents
      .select(col("doc_id"), col("text"))
    val edge = docsOf(
      (100001L, ""), (100002L, "   "), (100003L, "one"),
      (100004L, "ab"), (100005L, "a b"), (100006L, "x y z x y z x y"),
      (100007L, "abcd"), (100008L, "aaaaaaa"))
    val corpus = fixture.union(edge)
    val native = Curation.repetitionRatios(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val composed = Curation.repetitionRatiosComposed(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(native == composed)
  }

  test("repetition ratios: planted duplicate bigrams and char grams score high") {
    val rows = Curation.repetitionRatios(docsOf(
      (1L, "spam spam spam spam spam"), // every bigram identical
      (2L, "all words here are unique today"),
    ), "doc_id", "text").orderBy("doc_id").collect()
    val spam = rows(0)
    // 4 bigrams, all "spam spam" → 3 duplicates / 4
    assert(spam.getLong(1) == 4L && spam.getDouble(2) == 0.75)
    assert(spam.getDouble(3) > 0.5, "char 4-grams of repeated text must be mostly dupes")
    val uniq = rows(1)
    assert(uniq.getDouble(2) == 0.0)
  }
}
