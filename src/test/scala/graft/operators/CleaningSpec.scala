package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleaningSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  // ---------------------------------------------------------------- PII

  test("pii scrub: known values — counts on the original, typed placeholders") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "mail me at alice.smith+spam@sub.example.org or bob@x.io today"),
      (1L, "server 192.168.0.1 talked to 10.255.3.77 over the vpn"),
      (2L, "call +31-20-5551234 about the invoice"),
      (3L, "no pii here at all just words"),
      (4L, "mixed: c@d.nl from 8.8.8.8 dial +49-30-1234567 now"),
    ).toDF("doc_id", "text")
    val out = Cleaning.piiScrub(docs, "doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((0L, 2L, 0L, 0L, "mail me at <EMAIL> or <EMAIL> today")))
    assert(out(1) == ((1L, 0L, 2L, 0L, "server <IP> talked to <IP> over the vpn")))
    assert(out(2) == ((2L, 0L, 0L, 1L, "call <PHONE> about the invoice")))
    assert(out(3) == ((3L, 0L, 0L, 0L, "no pii here at all just words")))
    assert(out(4) == ((4L, 1L, 1L, 1L, "mixed: <EMAIL> from <IP> dial <PHONE> now")))
  }

  test("pii scrub: idempotent — re-scrubbing scrubbed text is a no-op") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a@b.com and 1.2.3.4 and +31-20-1234567 walk into a bar"),
      (1L, "clean text stays clean"),
    ).toDF("doc_id", "text")
    val once = Cleaning.piiScrub(docs, "doc_id", "text")
    val twice = Cleaning.piiScrub(
      once.select(col("doc_id"), col("clean_text").as("text")), "doc_id", "text")
    val t = twice.orderBy("doc_id").collect()
    assert(t.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L))
    assert(t.map(_.getString(4)).toSeq ==
      once.orderBy("doc_id").collect().map(_.getString(4)).toSeq)
  }

  test("pii scrub: map-only plan — no exchange anywhere") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val plan = Cleaning.piiScrub(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scrub grew a shuffle:\n$plan")
  }

  // -------------------------------------------------------- boilerplate

  /** 4-token lines; "shared header line here" planted across docs 0/1/2. */
  private def bpDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "shared header line here unique tail for zero"),
      (1L, "shared header line here another tail entirely one"),
      (2L, "shared header line here"), // ALL boilerplate
      (3L, "totally original content that repeats nowhere else"),
    ).toDF("doc_id", "text")
  }

  test("boilerplate strip: planted shared line drops everywhere, order kept") {
    val out = Cleaning.boilerplateStrip(bpDocs, "doc_id", "text", lineTokens = 4, minDf = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((0L, 2L, 1L, "unique tail for zero")))
    assert(out(1) == ((1L, 2L, 1L, "another tail entirely one")))
    // the all-boilerplate doc SURVIVES with empty text — dropping the row
    // would silently change corpus counts downstream
    assert(out(2) == ((2L, 1L, 1L, "")))
    assert(out(3) == ((3L, 2L, 0L, "totally original content that repeats nowhere else")))
  }

  test("boilerplate strip: within-doc repetition does not reach minDf") {
    val s = spark
    import s.implicits._
    // doc 0 repeats its line internally; df counts DOCUMENTS, so df=1 < 2
    val docs = Seq(
      (0L, "again and again now again and again now"),
      (1L, "some other words making one line"),
    ).toDF("doc_id", "text")
    val out = Cleaning.boilerplateStrip(docs, "doc_id", "text", lineTokens = 4, minDf = 2L)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L), "nothing crosses minDf across docs")
  }

  test("boilerplate strip: rewrite side is map-only (one corpus shuffle total)") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val plan = Cleaning.boilerplateStrip(docs, "doc_id", "text", 16, 2L)
      .queryExecution.executedPlan
    val planStr = plan.toString
    // the dictionary rides back as a broadcast, never a join that would
    // shuffle the corpus by line or re-group it by doc
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      s"dictionary stopped broadcasting:\n$planStr")
    assert(!planStr.contains("SortMergeJoin"), s"corpus-side join regressed:\n$planStr")
    // the document side is never exchanged: the only hash exchange in the
    // whole tree is the line-frequency aggregate's, keyed by line — any
    // doc-keyed repartition means the re-group shape came back
    assert(!planStr.contains("Exchange hashpartitioning(doc_id"),
      s"corpus re-grouped by doc:\n$planStr")
    val hashEx = planStr.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("line#")),
      s"every hash exchange must be line-keyed (the frequency agg):\n$planStr")
  }

  test("boilerplate strip: over-limit dictionary switches to the join shape with identical rows") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val viaBroadcast = Cleaning.boilerplateStrip(docs, "doc_id", "text", 16, 2L)
    // limit 0 forces the join shape for ANY non-empty dictionary
    val viaJoin = Cleaning.boilerplateStrip(docs, "doc_id", "text", 16, 2L,
      smallDictLimit = 0L)
    val joinPlan = viaJoin.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("BroadcastNestedLoopJoin"),
      s"fallback must not broadcast the dictionary array:\n$joinPlan")
    val a = viaBroadcast.orderBy("doc_id").collect().toSeq
    val b = viaJoin.orderBy("doc_id").collect().toSeq
    assert(a == b, "the two shapes must produce identical rows")
    assert(a.exists(_.getLong(2) > 0L), "fixture must exercise actual drops")
  }

  test("incremental boilerplate: maintained counts equal a from-scratch recompute") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val maintained = Cleaning.mergeLineFrequencies(
      Cleaning.lineDocFrequencies(corpus, "doc_id", "text", 16),
      Cleaning.lineDocFrequencies(inc, "doc_id", "text", 16))
      .orderBy("line").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val scratch = Cleaning.lineDocFrequencies(docs, "doc_id", "text", 16)
      .orderBy("line").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(maintained == scratch, "df additivity over disjoint doc sets broke")
  }

  test("incremental boilerplate: a line crossing minDf only across the slices is caught") {
    val s = spark
    import s.implicits._
    // the shared line appears ONCE in the corpus and ONCE in the increment:
    // neither slice alone reaches minDf=2 — only the merged dictionary does
    val corpus = Seq((1L, "shared header line here corpus body text")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "shared header line here fresh tail words"),
      (11L, "wholly original increment content words here")).toDF("doc_id", "text")
    val out = Cleaning.boilerplateStripIncrement(
      Cleaning.lineDocFrequencies(corpus, "doc_id", "text", 4),
      inc, "doc_id", "text", 4, 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((10L, 2L, 1L, "fresh tail words")),
      s"cross-slice boilerplate must be caught: ${out.toSeq}")
    assert(out(1) == ((11L, 2L, 0L, "wholly original increment content words here")))
  }

  test("incremental boilerplate: the corpus text is never re-scanned") {
    // deployment layout: the maintained counts and today's batch are their
    // own parquet artifacts; the corpus DOCUMENTS table must not appear
    // anywhere in the gate's plan — its only representative is the counts
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val tmp = java.nio.file.Files.createTempDirectory("graft_incbp").toString
    Cleaning.lineDocFrequencies(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", 16).write.mode("overwrite").parquet(s"$tmp/counts")
    docs.filter(col("doc_id") % 5 === 0)
      .write.mode("overwrite").parquet(s"$tmp/inc")
    val out = Cleaning.boilerplateStripIncrement(
      spark.read.parquet(s"$tmp/counts"), spark.read.parquet(s"$tmp/inc"),
      "doc_id", "text", 16, 2L)
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains("documents"),
      s"corpus text snuck back into the incremental gate:\n$planStr")
    assert(out.count() > 0)
  }

  // ----------------------------------------------------------- mixture

  test("mixture rebalance: rates hit the minority share and cap at 1000") {
    val s = spark
    import s.implicits._
    // 40 'en', 10 'fr' docs: fr keeps everything (permille 1000), en 250
    val docs = (0L until 40L).map(i => (i, "en")) ++ (100L until 110L).map(i => (i, "fr"))
    val df = docs.toDF("doc_id", "lang")
    val out = Cleaning.mixtureRebalance(df, "doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byStratum = out.groupBy(_._2)
    assert(byStratum("fr").size == 10, "minority stratum keeps every doc")
    assert(byStratum("fr").forall(_._3 == 1000L))
    assert(byStratum("en").forall(_._3 == 250L))
    // membership is exactly the portable-hash rule — recompute independently
    def keep(id: Long) = ((id % 2147483648L) * 2654435761L) % 4294967296L % 1000L < 250L
    assert(byStratum("en").map(_._1).toSet == (0L until 40L).filter(keep).toSet)
  }

  test("mixture rebalance: corpus is never shuffled — broadcast rate table only") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val plan = Cleaning.mixtureRebalance(docs, "doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rate table stopped broadcasting:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side exchange regressed:\n$plan")
  }

  test("mixture rebalance: over-limit strata fall back to the shuffle join with identical rows") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val a = Cleaning.mixtureRebalance(docs, "doc_id", "lang")
      .orderBy("doc_id").collect().toSeq
    // limit 0 drops OUR broadcast hint; auto-broadcast must also be off to
    // see the fallback shape (Catalyst still broadcasts any tiny table by
    // size, which is exactly the intended post-guard behavior)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = Cleaning.mixtureRebalance(docs, "doc_id", "lang",
        broadcastStrataLimit = 0L)
      assert(!forced.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "limit 0 + no auto-broadcast must yield the shuffle join")
      assert(forced.orderBy("doc_id").collect().toSeq == a)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
    }
  }

  test("mixture rebalance: deterministic under repartitioning") {
    val docs = graft.Tables(spark, graft.TestSpark.Sf0001).documents
    val a = Cleaning.mixtureRebalance(docs, "doc_id", "lang")
      .orderBy("doc_id").collect().toSeq
    val b = Cleaning.mixtureRebalance(docs.repartition(7), "doc_id", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
