package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Present._
import graft.Tables
import graft.expressions.TextSignatures
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, designed shuffle-first
  * for 100 TB:
  *
  *  - '''exact''': one hash-partitioned aggregation on the content key — the
  *    only shuffle is by `text` hash, with map-side partial aggregation.
  *  - '''MinHash + LSH''': signatures are computed scan-side by the native
  *    codegen expression [[graft.expressions.MinHashBands]] (no UDF, no
  *    materialized shingle arrays), then candidates come from a self-join
  *    on (band, band-hash) buckets — the classic band trick keeps the join
  *    key space dense and bounded instead of an O(n²) cross join; verification
  *    (exact Jaccard) touches only candidate pairs.
  *  - '''SimHash''': 64-bit signature from per-token hashed bit votes;
  *    near-dup pairs share at least one of 4 16-bit chunks (Hamming ≤ 3 over
  *    64 bits ⇒ pigeonhole guarantees a shared chunk), again a bucket join.
  *  - '''n-gram Jaccard''': exact character-shingle similarity for a bounded
  *    candidate set (here keyed small; at scale fed by the LSH candidates).
  *  - '''embedding cosine''': near-dup by cosine ≥ τ over a bounded/blocked
  *    pair set; at scale the blocking comes from [[Similarity]] LSH buckets.
  *
  * All signature math uses explicit modular arithmetic on 31-bit hashes so
  * results are deterministic and independent of partitioning.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ exact

  /** Exact dedup on a content column: representative = min key per content.
    * Scale: single shuffle by content hash; AQE handles skewed hot texts.
    */
  def exact(df: DataFrame, contentCol: String, keyCol: String): DataFrame =
    df.groupBy(contentCol)
      .agg(min(col(keyCol)).as(keyCol), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------- minhash

  /** Distinct character k-shingles of column `textCol` (codegen'd, no UDF).
    * `sequence(1, greatest(len-k+1, 1))` guards the descending-sequence trap
    * for texts shorter than k (callers should also filter those out).
    */
  def shingles(textCol: String, k: Int): Column =
    array_distinct(expr(s"transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), i -> substring($textCol, i, $k))"))

  private def shinglesExpr(k: Int): Column = shingles("text", k)

  private def spread(df: DataFrame): DataFrame = Inputs.spread(df)

  // ------------------------------------------------ hot-bucket bounding

  /** Adds per-bucket rank (`_rn`, by ascending key) and population
    * (`_bsz`) to a bucketed signature table — the bookkeeping
    * [[boundedCandidates]] needs to bound hot buckets. One exchange on the
    * bucket key, the same partitioning the candidate self-join uses.
    */
  private def withBucketRank(df: DataFrame, keyCol: String,
                             bucketCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w.orderBy(col(keyCol))))
      .withColumn("_bsz", count(lit(1)).over(w))
  }

  /** Candidate-stage input materialization (r19). [[boundedCandidates]]
    * consumes its signature table FOUR times (a/b sides of the in-cap
    * self-join + a/b sides of the chain leg), and neither exchange reuse
    * nor AQE stage reuse unifies the four identical subtrees at runtime
    * (measured on q124: zero reused exchanges — the scan + signature
    * kernel ran once per consumer). An EAGER localCheckpoint collapses
    * them to one computation and wins (q124 med 0.647 → 0.452 s at sf0.1,
    * CandidateCacheAB); a LAZY MEMORY_AND_DISK persist of the same frame
    * LOSES (med 0.734 — columnar encode/decode of the payload plus the
    * cache boundary's AQE restrictions cost more than the recomputes), so
    * the checkpoint is the shipped form. An input-sized materialization
    * is still exactly what a 100 TB run cannot hold (the q115
    * containment-gram lesson), so AUTO materializes only when the
    * SOURCE's at-rest size estimate is at or under
    * `spark.graft.candidateMaterializeMaxBytes` (default 64 MB) and
    * recomputes otherwise; `spark.graft.candidateInputMaterialize` forces
    * NONE/FORCE explicitly. Gate stats come from the raw source scan
    * (reliable file-size stats), never the derived frame (a join estimate
    * without CBO is a size product — useless as a gate).
    */
  private def materializeCandidateInput(input: DataFrame,
                                        source: DataFrame): DataFrame = {
    val conf = input.sparkSession.conf
    val doIt = conf.getOption("spark.graft.candidateInputMaterialize")
      .getOrElse("AUTO") match {
      case "NONE" => false
      case "AUTO" =>
        val atRest = source.queryExecution.optimizedPlan.stats.sizeInBytes
        val gate = conf.getOption("spark.graft.candidateMaterializeMaxBytes")
          .map(_.toLong).getOrElse(64L << 20)
        atRest <= gate
      case _ => true
    }
    if (doIt) input.localCheckpoint(true) else input
  }

  /** Within-bucket candidate pairs with a HOT-BUCKET bound. Buckets at or
    * under `maxBucket` pair exhaustively (`a < b`) exactly as before; an
    * OVER-cap bucket — a degenerate signature flood: empty/boilerplate
    * text, an identical-vector pile — emits CHAIN pairs instead (each key
    * with its successor in key order): `m−1` pairs rather than
    * `m(m−1)/2`, so one bad bucket costs linear work instead of going
    * quadratic, while the flood class stays fully CONNECTED for the
    * clustering/gate step (successive members of a same-content class
    * verify against each other like any other pairing; `duplicateClusters`
    * closes the chain transitively). The caps default far above any
    * organically-occurring bucket (measured at 500k ciphered docs —
    * `SCALE100.json` `bucket_histograms`: minhash band max 26, simhash
    * chunk max 752 and flattening, embedding bucket max 20 at sf0.1 —
    * hence 1024 defaults, 4096 for the deliberately-dense simhash
    * chunks), so certified outputs are unchanged — the bound exists for
    * the 100 TB failure mode, where a boilerplate class of 10⁶ docs must
    * not cost 10¹² joined rows.
    *
    * Join-input restriction, not post-filter: the chain side joins on
    * `bucket ∪ rank`, so the quadratic row set is never materialized
    * inside the join.
    *
    * @param payload signature/vector columns carried to both sides
    *   (emitted as `<c>_a` / `<c>_b`)
    */
  private def boundedCandidates(bucketed: DataFrame, keyCol: String,
                                bucketCols: Seq[String],
                                payload: Seq[String],
                                maxBucket: Int): DataFrame = {
    val ranked = withBucketRank(bucketed, keyCol, bucketCols)
    def side(df: DataFrame, tag: String, rn: Option[Column]) =
      df.select(col(keyCol).as(tag) +:
        payload.map(c => col(c).as(s"${c}_$tag")) ++:
        bucketCols.map(col) ++:
        rn.map(_.as("_rn")).toSeq: _*)
    val small = ranked.filter(col("_bsz") <= maxBucket)
    val big = ranked.filter(col("_bsz") > maxBucket)
    val out = Seq(col("a"), col("b")) ++ payload.flatMap(c =>
      Seq(col(s"${c}_a"), col(s"${c}_b")))
    side(small, "a", None).join(side(small, "b", None), bucketCols)
      .filter(col("a") < col("b"))
      .select(out: _*)
      .unionByName(
        side(big, "a", Some(col("_rn")))
          .join(side(big, "b", Some(col("_rn") - 1)), bucketCols :+ "_rn")
          .select(out: _*))
  }

  /** Candidate near-duplicate pairs via banded LSH + exact Jaccard verify.
    *
    * Scale shape: signatures come from the native
    * [[graft.expressions.MinHashBands]] codegen expression — one scan-side
    * pass per document, no shingle arrays materialized, no UDF boxing. The
    * band table is just `(key, band, hash)`, so candidate generation is an
    * equi-join on dense keys with nothing wide shuffled; verification
    * re-reads only the *texts* of surviving candidate pairs and computes
    * exact Jaccard directly ([[graft.expressions.ShingleJaccard]]).
    *
    * @param jaccardThreshold verification threshold on exact shingle Jaccard
    * @param maxBucket hot-bucket bound — see [[boundedCandidates]]
    */
  def minhashPairs(docs: DataFrame, keyCol: String, k: Int = 5,
                   jaccardThreshold: Double = 0.8,
                   maxBucket: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    val d = spread(docs)
    val bands = materializeCandidateInput(
      d.select(col(keyCol),
        posexplode(TextSignatures.minhashBandsCol(spark)(col("text"), k)).as(Seq("band", "bh"))),
      docs)
    val candidates = boundedCandidates(bands, keyCol, Seq("band", "bh"), Nil, maxBucket)
      .dropDuplicates("a", "b")
    candidates
      .join(d.select(col(keyCol).as("a"), col("text").as("ta")), "a")
      .join(d.select(col(keyCol).as("b"), col("text").as("tb")), "b")
      .withColumn("jaccard", TextSignatures.shingleJaccardCol(spark)(col("ta"), col("tb"), k))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.roundNative(spark)(col("jaccard"), 4).as("jaccard"))
  }

  /** Incremental near-dup gate — [[minhashPairs]]' banding applied to the
    * 100 TB OPERATING MODE: dedup an INCOMING increment (today's crawl)
    * against the EXISTING corpus without ever re-pairing corpus×corpus.
    * Returns `(old_id, new_id, jaccard)` for every incoming doc that
    * verifies (exact shingle Jaccard ≥ threshold) against a corpus doc;
    * the caller drops or links the matched incoming keys.
    *
    * Scale shape: candidate generation is the corpus band table joined to
    * the increment band table on `(band, hash)` — the corpus side is
    * banded once (in a deployment, persisted/bucketed by `(band, hash)`),
    * and only buckets the increment actually hits are touched, so work is
    * proportional to the INCREMENT, not the corpus. A small increment's
    * band table broadcasts (daily-batch case); verification re-reads only
    * surviving pairs' texts, exactly like the full-corpus path. Crucially
    * there is no corpus self-join anywhere — at 100 TB the corpus×corpus
    * pairing is the term that must never be re-paid per increment.
    */
  def incrementalMinhashMatches(existing: DataFrame, incoming: DataFrame,
                                keyCol: String, k: Int = 5,
                                jaccardThreshold: Double = 0.8,
                                maxCandidatesPerNewId: Int = 1024,
                                broadcastPairLimit: Long = 4000000L): DataFrame =
    incrementalMinhashMatchesPrebanded(
      minhashBandTable(existing, keyCol, k).withColumnRenamed(keyCol, "old_id"),
      spread(existing).select(col(keyCol).as("old_id"), col("text").as("ta")),
      incoming, keyCol, k, jaccardThreshold, maxCandidatesPerNewId, broadcastPairLimit)

  /** The corpus band table `(keyCol, band, bh)` — in a deployment this is
    * a PERSISTED artifact (banded once when a doc enters the corpus,
    * stored bucketed by `(band, bh)`), which is what makes the incremental
    * gate's per-run cost proportional to the increment.
    */
  def minhashBandTable(docs: DataFrame, keyCol: String, k: Int = 5): DataFrame =
    spread(docs).select(col(keyCol),
      posexplode(TextSignatures.minhashBandsCol(docs.sparkSession)(col("text"), k))
        .as(Seq("band", "bh")))

  /** Capped candidate pairs of the incremental gate: the corpus band table
    * joined to the increment band table on `(band, bh)`, deduped, then
    * bounded to the `maxCandidatesPerNewId` SMALLEST `old_id`s per
    * increment doc (deterministic top-N). The cap is what turns the
    * "candidates are increment-bounded" ASSUMPTION into an enforced
    * invariant: a boilerplate/template increment doc legitimately
    * band-collides with an entire duplicate class — millions of corpus
    * docs at web scale — and without the cap that one doc makes the
    * candidate set corpus-sized. A doc with 10⁶ matches needs only one
    * surviving match to be gated, so truncating its candidate list loses
    * nothing the caller acts on (the pair LIST for such a doc is
    * explicitly partial — it is a dedup gate, not an exhaustive pair
    * enumeration, which for a template doc would be the corpus itself).
    * Keeping the smallest `old_id`s is safe because an over-cap candidate
    * list is near-always one duplicate class, not an accidental pile-up:
    * unrelated content co-hashing into the same `(band, bh)` bucket is a
    * ~2⁻³¹ per-band event, so a doc whose candidates exceed any sane cap
    * got there by sharing shingles with all of them — any kept candidate
    * verifies as well as a dropped one.
    *
    * Scale shape: the band join streams the corpus side (the increment
    * band table is the small/build side — never the corpus), and the cap
    * is a windowed rank over `(new_id)`-partitioned PAIRS, so even a
    * pathological doc's corpus-sized candidate list is sorted/spilled
    * distributed on executors, never collected.
    */
  def incrementalCandidates(existingBands: DataFrame, incoming: DataFrame,
                            keyCol: String, k: Int = 5,
                            maxCandidatesPerNewId: Int = 1024): DataFrame =
    incrementalCandidatesFromBands(existingBands,
      minhashBandTable(incoming, keyCol, k).withColumnRenamed(keyCol, "new_id"),
      maxCandidatesPerNewId)

  /** [[incrementalCandidates]] with the increment's band table supplied by
    * the caller — lets a gate that also APPENDS the increment's bands to a
    * persisted artifact (q114) band the increment exactly once per call
    * instead of once for the candidate join and again for the append.
    */
  def incrementalCandidatesFromBands(existingBands: DataFrame,
                                     newBands: DataFrame,
                                     maxCandidatesPerNewId: Int = 1024): DataFrame = {
    existingBands
      .join(newBands, Seq("band", "bh"))
      .select("old_id", "new_id")
      .dropDuplicates("old_id", "new_id")
      .withColumn("cand_rank",
        row_number().over(Window.partitionBy("new_id").orderBy("old_id")))
      .filter(col("cand_rank") <= maxCandidatesPerNewId)
      .drop("cand_rank")
  }

  /** Deployment form of [[incrementalMinhashMatches]]: the corpus side
    * arrives as its two persisted artifacts — `existingBands(old_id, band,
    * bh)` and `existingTexts(old_id, ta)` — so the only per-run banding
    * work is the increment's. With a small increment Catalyst broadcasts
    * its band table and the corpus is never shuffled (scan + hash-probe
    * only); a corpus persisted bucketed by `(band, bh)` avoids even that
    * shuffle for TB-scale increments.
    *
    * The candidate set is BOUNDED, then SIZE-CHECKED, then joined:
    * [[incrementalCandidates]] caps candidates per increment doc (the
    * template-doc hazard — see its doc), the capped set is materialized
    * once (`localCheckpoint`) and counted EXACTLY, and only a set at or
    * under `broadcastPairLimit` rows is broadcast onto the corpus text
    * projection (corpus scanned + hash-probed, never shuffled — without
    * the hint Catalyst's size estimate picked a sort-merge join that
    * shuffled 93 MB of corpus texts at 500k docs for a 500-doc
    * increment). Past the limit — a TB-scale increment, or a
    * contract-violating flood the cap alone can't shrink below it — the
    * verify join degrades to a shuffle join: slower, but distributed and
    * OOM-free, instead of force-broadcasting an unbounded set into the
    * driver. The count is exact and free: the checkpoint already
    * materialized the capped set, and everything downstream reuses it.
    */
  def incrementalMinhashMatchesPrebanded(existingBands: DataFrame,
                                         existingTexts: DataFrame,
                                         incoming: DataFrame, keyCol: String,
                                         k: Int = 5,
                                         jaccardThreshold: Double = 0.8,
                                         maxCandidatesPerNewId: Int = 1024,
                                         broadcastPairLimit: Long = 4000000L,
                                         incomingBands: Option[DataFrame] = None): DataFrame = {
    val spark = incoming.sparkSession
    val candidates =
      incomingBands.map(incrementalCandidatesFromBands(existingBands, _, maxCandidatesPerNewId))
        .getOrElse(incrementalCandidates(existingBands, incoming, keyCol, k, maxCandidatesPerNewId))
        .localCheckpoint(true)
    val candSide =
      if (candidates.count() <= broadcastPairLimit) broadcast(candidates)
      else candidates
    existingTexts.join(candSide, "old_id")
      .join(spread(incoming).select(col(keyCol).as("new_id"), col("text").as("tb")), "new_id")
      .withColumn("jaccard", TextSignatures.shingleJaccardCol(spark)(col("ta"), col("tb"), k))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("old_id"), col("new_id"),
        graft.functions.VectorFunctions.roundNative(spark)(col("jaccard"), 4).as("jaccard"))
  }

  /** Managed-table names of the persisted incremental-dedup artifacts for a
    * fixture tag — exposed so specs can read/plan against the same tables
    * the gate maintains.
    */
  def incrementalArtifactNames(tag: String): (String, String) =
    (s"graft_incr_bands_x$tag", s"graft_incr_texts_x$tag")

  /** The incremental gate run the way a DEPLOYMENT runs it (q114): corpus
    * artifacts are PERSISTED managed tables — the band table bucketed AND
    * sorted by `(band, bh)`, plus the text projection — the increment is
    * gated against the BUCKETED READ, and the increment's bands + texts are
    * APPENDED afterward so the next increment's gate sees a corpus that
    * already contains this one (the corpus-grows step; the reference's
    * Modified-date skip is the analogous build-once/maintain-forever
    * contract, `statline_bq/main.py:39-95`).
    *
    * Scale shape: bucketing moves the corpus-side band shuffle to WRITE
    * time, paid once per doc when it enters the corpus — after that every
    * gate reads `(band, bh)`-clustered buckets directly, so even when the
    * increment is too large to broadcast (the shuffle-join fallback of
    * [[incrementalMinhashMatchesPrebanded]]) the corpus side still joins
    * with zero exchange; only the increment's bands move. Certification
    * rebuilds the artifacts from the corpus slice on every call so the
    * result is a pure function of the fixture (a deployment builds once);
    * the gate result is materialized BEFORE the append so the returned
    * frame is stable against the artifact mutation behind it.
    */
  def incrementalGateOverPersistedArtifacts(spark: SparkSession,
                                            corpus: DataFrame,
                                            incoming: DataFrame,
                                            keyCol: String, tag: String,
                                            k: Int = 5,
                                            jaccardThreshold: Double = 0.8,
                                            nBuckets: Int = 8): DataFrame = {
    val (bandsTbl, textsTbl) = incrementalArtifactNames(tag)
    Seq(bandsTbl, textsTbl).foreach(graft.StageDir.dropManagedTable(spark, _))
    // r19 (guide §2.6, overlap independent jobs): the band table and the
    // text projection are INDEPENDENT artifacts of the same corpus slice —
    // two writes with no data dependency. Submitting them concurrently
    // lets the cheap projection write back-fill the bucketed write's
    // shuffle/sort tail instead of queueing a whole job behind it; same
    // again for the two appends below. Measured at sf0.1 (Q114Legs): the
    // serial chain paid bands+texts+append as a straight sum.
    inParallel(
      () => minhashBandTable(corpus, keyCol, k).withColumnRenamed(keyCol, "old_id")
        .write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, "band", "bh").sortBy("band", "bh")
        .saveAsTable(bandsTbl),
      () => corpus.select(col(keyCol).as("old_id"), col("text").as("ta"))
        .write.mode("overwrite").format("parquet").saveAsTable(textsTbl))
    // r19: band the increment ONCE per call — the same rows feed the
    // candidate join and the corpus-grows append (it used to be banded
    // twice, once in each). Eager localCheckpoint: increment-sized by the
    // gate's contract, materialized before either consumer runs.
    val incBands = minhashBandTable(incoming, keyCol, k)
      .withColumnRenamed(keyCol, "new_id")
      .localCheckpoint(true)
    val out = incrementalMinhashMatchesPrebanded(
      spark.table(bandsTbl), spark.table(textsTbl), incoming, keyCol, k,
      jaccardThreshold, incomingBands = Some(incBands))
      .localCheckpoint(true)
    // corpus-grows: the increment's banding was paid above, exactly once —
    // the next increment gates against these rows without re-banding them
    inParallel(
      () => incBands.withColumnRenamed("new_id", "old_id")
        .write.mode("append").format("parquet")
        .bucketBy(nBuckets, "band", "bh").sortBy("band", "bh")
        .saveAsTable(bandsTbl),
      () => incoming.select(col(keyCol).as("old_id"), col("text").as("ta"))
        .write.mode("append").format("parquet").saveAsTable(textsTbl))
    out
  }

  private def inParallel(fs: (() => Unit)*): Unit = Inputs.runConcurrently(fs: _*)

  // ------------------------------------------- containment (excerpt dedup)

  /** Excerpt/containment near-dup pairs: the duplicate class symmetric
    * Jaccard MISSES. A 100-word quote inside a 10k-word document shares
    * almost all of its shingles with the host but has near-zero Jaccard
    * (the union is host-sized), so MinHash banding never surfaces it. The
    * right measure is the OVERLAP COEFFICIENT
    * `|S(a) ∩ S(b)| / min(|S(a)|, |S(b)|)` — ≈1 whenever the smaller doc
    * is contained in the larger, whatever their size ratio.
    *
    * Shingles are WORD `n`-grams (Broder's w-shingling), not the char
    * k-grams of the Jaccard family: containment is a phrase-reuse
    * question, and char shingles over a shared vocabulary are so dense
    * that blocking degenerates — measured on the sf0.1 fixture, char-5
    * shingles produced ~2M candidates and a 335k-pair answer (the verify
    * tier, not the operator, became the cost), where word 3-grams give
    * ~67k candidates and an answer of a few hundred genuine excerpt
    * pairs. Low-entropy corpora make char-gram blocking quadratic-ish at
    * ANY scale; word shingles keep the rare-key premise true.
    *
    * Scale shape — rare-shingle inverted-index blocking:
    *  1. one pass computes global shingle document frequencies (one
    *     aggregation on the exploded shingle table);
    *  2. each doc keeps its `kRare` RAREST shingles (window per doc,
    *     rarest-first, deterministic `(df, shingle)` order) — rare keys
    *     make bucket sizes small BY CONSTRUCTION, the opposite of hashing
    *     blindly;
    *  3. candidates come from joining those rare keys against the full
    *     inverted index (any doc containing one of a's rare shingles is a
    *     containment candidate for a — one equi-join, probe side
    *     proportional to `kRare × docs`);
    *  4. exact overlap verifies only candidates.
    * The inverted-index side caps each shingle's posting list at
    * `maxBucket` smallest doc ids (a doc made entirely of ultra-common
    * shingles would otherwise pull a corpus-sized posting list — the same
    * boilerplate hazard as [[boundedCandidates]]; the cap is mirrored in
    * the DuckDB oracle so certification is exact).
    */
  def containmentPairs(docs: DataFrame, keyCol: String, n: Int = 3,
                       kRare: Int = 4, minOverlap: Double = 0.5,
                       maxBucket: Int = 1024): DataFrame = {
    // The gram table feeds FIVE consumers (the df aggregate, both window
    // inputs, and the two verify sides), and Spark's exchange reuse cannot
    // unify them (different partitioning keys), so without a cache the
    // ngram computation — the single most expensive expression here,
    // measured 0.77 s of a 3.9 s total at sf0.1 — re-runs per consumer.
    // Persist it once (docs × one gram array ≈ input-sized, the q113
    // candidate-persist precedent); the whole query drops to ~1/3 the wall.
    // round 14: the native one-pass graft_word_ngrams (distinct folded in)
    // replaces the transform/slice/concat_ws composition — the q123/q75
    // higher-order-function finding applied here too
    // Storage posture is MEASURED, gated, and conf-overridable
    // (Q115_PERSIST_AB.json, r16): the gram cache is the dedup family's
    // only input-sized persist, and the sweep shows it is scale-LOCAL —
    // at the sf1-scale corpus (5.9 MB at rest) MEMORY_AND_DISK wins ~9%
    // over recompute (4.46 vs 4.86 s med), but at the 10× decade (57 MB
    // at rest) the memory posture's median degrades 45% (37.3 s vs NONE's
    // 25.8, mins all ~22-23 s): the distinct-gram string arrays inflate
    // ~2 orders of magnitude off at-rest bytes and thrash the storage
    // region, while recomputing the codegen'd ngram expression per
    // consumer rides the (page-cached) scan. AUTO therefore persists only
    // when the input's Catalyst size estimate is measurably small
    // (default gate 16 MB at rest — between the measured win and loss
    // points, conf `spark.graft.containmentPersistMaxBytes`), and
    // otherwise recomputes — the posture a 100 TB run needs, arrived at
    // without configuration. `spark.graft.containmentGramStorage` forces
    // MEMORY_AND_DISK / DISK_ONLY / NONE explicitly.
    val g0 = spread(docs).filter(TextAnalysis.wsTokenCount(col("text")) >= n)
      .select(col(keyCol),
        graft.expressions.TextSignatures.wordNgramsCol(docs.sparkSession)(
          col("text"), n, distinct = true).as("g"))
    val conf = docs.sparkSession.conf
    val g = conf.getOption("spark.graft.containmentGramStorage").getOrElse("AUTO") match {
      case "NONE" => g0
      case "AUTO" =>
        val atRest = docs.queryExecution.optimizedPlan.stats.sizeInBytes
        val gate = conf.getOption("spark.graft.containmentPersistMaxBytes")
          .map(_.toLong).getOrElse(16L << 20)
        // r19 (Q115GramStorageAB, honest per-run-clear protocol): the
        // eager localCheckpoint beats the r16 MEMORY_AND_DISK persist on
        // the gated small side too (med 1.996 -> 1.893, min 1.926 ->
        // 1.705 at sf0.1) — no columnar encode/decode, no cache-boundary
        // AQE restrictions. The 16 MB at-rest gate is unchanged: the r16
        // 10x-decade loss (string-array inflation thrashing storage) is a
        // property of materializing gram arrays at all, so the big side
        // still recomputes.
        if (atRest <= gate) g0.localCheckpoint(true)
        else g0
      case "LOCALCKPT" => g0.localCheckpoint(true) // explicit probe arm
      case lvl => g0.persist(org.apache.spark.storage.StorageLevel.fromString(lvl))
    }
    val ex = g.select(col(keyCol), explode(col("g")).as("sh"))
    // r15 candidate-stage reshape, each step measured (Q115Legs /
    // Q115_JOIN_AB.json / Q115_SHAPE_AB.json, rows asserted identical
    // throughout):
    //  - ONE shingle aggregate emits BOTH the document frequency and the
    //    capped posting list (graft_smallest_k bounded heap — map-side
    //    partials cap at maxBucket per shingle before the exchange,
    //    nothing sorts; the row_number window it replaces shuffled and
    //    per-partition-sorted every posting row and buffered a flooded
    //    shingle's full run, the ADVICE-r14 unbounded-buffer hazard);
    //  - the df joins back to the pair stream ONCE, for the rare ranking
    //    only, as a SHUFFLE_HASH join (sort-merge sorted both
    //    ~pair-stream-sized sides by the shingle STRING — measured as the
    //    bulk of the containment wall: 2.92 s -> 0.93 s hinted, values
    //    asserted equal; build side = vocabulary-sized df table,
    //    hash-partitioned, so per-task build memory is vocab/partitions —
    //    the q11 contract, no broadcast cliff);
    //  - per-doc k-rarest shingles are a BOUNDED AGGREGATE too
    //    (graft_smallest_k_pairs: k-bounded (df, sh) heap under the same
    //    (df asc, sh binary-asc) order as the replaced rank window — at
    //    most kRare pairs per doc cross the shuffle).
    // Shape A/B at sf1 (full pipeline, med-of-5): join-feeds-both 3.86 s,
    // persist-the-pair-stream 3.42 s, this combined-aggregate shape
    // 3.56 s (3.22 s min) — chosen over the persist because a corpus ×
    // grams pair-stream cache is exactly what a 100 TB run cannot hold,
    // while this shape's only state is the vocabulary-sized aggregate.
    graft.expressions.CollectSmallestK.register(docs.sparkSession)
    graft.expressions.SmallestKPairs.register(docs.sparkSession)
    val dfPost = ex.groupBy("sh")
      .agg(count(lit(1)).as("df"),
        expr(s"graft_smallest_k(${keyCol}, $maxBucket)").as("_bs"))
    val rare = ex
      .join(dfPost.select(col("sh"), col("df")).hint("shuffle_hash"), "sh")
      .groupBy(col(keyCol))
      .agg(expr(s"graft_smallest_k_pairs(df, sh, $kRare)").as("_rs"))
      .select(col(keyCol).as("a"), explode(col("_rs.s")).as("sh"))
    val postings = dfPost.select(col("sh"), explode(col("_bs")).as("b"))
    val candidates = rare.join(postings, "sh")
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .dropDuplicates("a", "b")
    // threshold on the RAW ratio, round only for presentation — the oracle
    // does the same, so certification stays exact at the boundary (a raw
    // value in [minOverlap - 5e-5, minOverlap) must not round its way in)
    candidates
      .join(g.select(col(keyCol).as("a"), col("g").as("ga")), "a")
      .join(g.select(col(keyCol).as("b"), col("g").as("gb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          least(size(col("ga")), size(col("gb"))).cast("double")).as("_ov"))
      .filter(col("_ov") >= minOverlap)
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.roundNative(docs.sparkSession)(col("_ov"), 4).as("overlap"))
  }

  // ---------------------------------------------------------------- simhash

  /** Adds a 64-bit `simhash` column from whitespace tokens of `text`:
    * per-bit vote sum over a 64-bit token hash (two murmur3 passes), bit set
    * iff vote > 0 — the native [[graft.expressions.SimHash64]] codegen
    * expression, inlined into the scan's whole-stage codegen.
    */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    // ' +' (not \s+) keeps the pattern free of backslash-escape ambiguity
    // across Scala interpolation and SQL literal parsing.
    df.withColumn("simhash",
      TextSignatures.simhashCol(df.sparkSession)(split(trim(col(textCol)), " +")))

  /** SimHash near-dup pairs: bucket by 16-bit chunks, verify Hamming ≤ maxDist.
    *
    * The Hamming check runs BEFORE the pair dedup: on real text the 16-bit
    * buckets are dense (shared vocabulary pulls signatures together), so the
    * bucket join emits orders of magnitude more candidates than survivors —
    * a one-instruction popcount per joined row is far cheaper than shuffling
    * every candidate pair into `dropDuplicates`.
    */
  def simhashPairs(docs: DataFrame, keyCol: String, textCol: String,
                   maxDist: Int = 3, maxBucket: Int = 4096): DataFrame = {
    boundedCandidates(
      materializeCandidateInput(simhashChunkTable(docs, keyCol, textCol), docs),
      keyCol, Seq("chunk", "cv"), Seq("simhash"), maxBucket)
      .withColumn("hamming", bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))))
      .filter(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
      .dropDuplicates("a", "b")
  }

  /** The exploded 16-bit-chunk bucket table `(keyCol, simhash, chunk, cv)`
    * behind [[simhashPairs]] — exposed for the bucket-population audit.
    */
  private[graft] def simhashChunkTable(docs: DataFrame, keyCol: String,
                                       textCol: String): DataFrame =
    withSimhash(spread(docs), textCol).select(col(keyCol), col("simhash"))
      .select(col(keyCol), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
          .as(Seq("chunk", "cv")))

  // ---------------------------------------------------- n-gram Jaccard

  /** Exact character-n-gram Jaccard over all pairs of a *bounded* doc subset.
    * At scale the pair source is LSH candidates, never a full cross join.
    */
  def ngramJaccardPairs(docs: DataFrame, keyCol: String, n: Int): DataFrame = {
    val g = docs
      .filter(length(col("text")) >= n)
      .select(col(keyCol), shinglesExpr(n).as("g"))
    // spread the streamed side: a filtered candidate set usually occupies a
    // few input splits, which would serialize the O(pairs) verify work onto
    // one or two tasks while the rest of the cluster idles
    val a = spread(g.select(col(keyCol).as("a"), col("g").as("ga")))
    val b = g.select(col(keyCol).as("b"), col("g").as("gb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
         size(array_union(col("ga"), col("gb"))).cast("double")).as("jaccard"))
  }

  // ------------------------------------------------------- edit distance

  /** Exact Levenshtein distance over a *bounded* candidate pair set — the
    * character-level verification primitive of the fuzzy-dedup family
    * (MinHash/SimHash block, edit distance verifies). All-pairs by
    * construction, O(len²) per pair: at scale the pair source is LSH
    * candidates, never a full cross join.
    */
  def levenshteinPairs(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    // spread: each pair costs O(len²) DP — see ngramJaccardPairs
    val a = spread(docs.select(col(keyCol).as("a"), col(textCol).as("ta")))
    val b = docs.select(col(keyCol).as("b"), col(textCol).as("tb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), levenshtein(col("ta"), col("tb")).as("dist"))
  }

  // ------------------------------------------------ embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine over a bounded/blocked id set.
    * All-pairs by construction — the candidate-VERIFICATION primitive. At
    * scale the pair source is [[embeddingLshPairs]]' buckets, never a full
    * cross join.
    */
  def embeddingCosinePairs(emb: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val cos = VectorFunctions.cosineNative(emb.sparkSession) _
    val rnd = VectorFunctions.roundNative(emb.sparkSession) _
    val a = spread(emb.select(col(keyCol).as("a"), col(vecCol).as("va")))
    val b = emb.select(col(keyCol).as("b"), col(vecCol).as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        rnd(cos(col("va"), col("vb")), 6).as("sim"))
  }

  /** Embedding near-dup at corpus scale: sign-projection LSH buckets provide
    * the blocking — candidate generation is an EQUI-join on the dense bucket
    * id (hash join, never a cross join) — and cosine ≥ `minSim` verifies
    * only within-bucket pairs. Each vector lands in exactly one bucket, so
    * pairs are already unique (no dedup shuffle). Identical vectors always
    * share a bucket, so exact duplicates have recall 1; near-dup recall is
    * tuned by `nPlanes` (fewer planes ⇒ bigger buckets ⇒ more recall, more
    * verify work).
    */
  def embeddingLshPairs(emb: DataFrame, keyCol: String, vecCol: String,
                        minSim: Double = 0.9, nPlanes: Int = 8,
                        maxBucket: Int = 1024): DataFrame = {
    val cos = VectorFunctions.cosineNative(emb.sparkSession) _
    val rnd = VectorFunctions.roundNative(emb.sparkSession) _
    // dim discovery has no row to inspect on an empty corpus — degrade to
    // the (empty) result rather than erroring the pipeline
    val dim = emb.select(size(col(vecCol))).limit(1).collect().headOption match {
      case Some(r) => r.getInt(0)
      case None => return emb.select(col(keyCol).as("a"), col(keyCol).as("b"),
        lit(0.0).as("sim")).limit(0)
    }
    val bucketed = materializeCandidateInput(
      graft.operators.Similarity.withLshBucket(emb, vecCol, nPlanes, dim)
        .select(col(keyCol), col(vecCol), col("bucket")),
      emb)
    boundedCandidates(bucketed, keyCol, Seq("bucket"), Seq(vecCol), maxBucket)
      .select(col("a"), col("b"),
        rnd(cos(col(s"${vecCol}_a"), col(s"${vecCol}_b")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Semantic dedup (the SemDeDup shape): block by TRAINED k-means cell
    * instead of random hyperplanes — each vector is assigned to its nearest
    * [[Similarity.kmeansCentroids]] centroid, and cosine ≥ `minSim`
    * verifies only within-cell pairs. Where [[embeddingLshPairs]]' buckets
    * are data-oblivious (fixed seeded planes), the cells here FOLLOW the
    * corpus' density: semantically clustered near-dups land in the same
    * cell by construction, which is why the published semantic-dedup
    * pipelines (SemDeDup-family) block on learned clusters.
    *
    * Scale shape: centroid training is the amortized IVF index build (one
    * broadcast + argmax + bounded shuffle per Lloyd iteration); assignment
    * is one broadcast join; pairing is an EQUI-join on the dense `cent_id`
    * key through [[boundedCandidates]], so a degenerate cell (an
    * identical-vector pile) costs linear chain pairs, never quadratic. At
    * 100 TB, `nlist` scales with the corpus (target cell size stays
    * bounded, e.g. √N cells) — the per-cell pair cost is (N/nlist)²·nlist,
    * so doubling `nlist` halves total verify work; nothing else changes.
    *
    * Blocking tradeoff (documented, same as LSH): a near-dup pair split
    * across a cell boundary is missed — recall against the exhaustive
    * [[embeddingCosinePairs]] baseline is pinned by spec, and identical
    * vectors always share a cell (identical round-6 cosines to every
    * centroid ⇒ identical argmax), so exact duplicates have recall 1.
    *
    * Training, assignment, and verify all rank on 6-decimal-rounded
    * cosines with id tiebreaks (the q55 reproducibility contract), so the
    * whole pipeline — trained centroids included — is DuckDB-oracled.
    */
  /** @param trainSampleMod when > 1, k-means trains on the deterministic
    *   `portableHash(key) % mod == 0` corpus slice instead of the full
    *   corpus — the documented 100 TB posture (training cost is
    *   sample × nlist per iteration instead of corpus × nlist; assignment
    *   and pairing still cover the full corpus). 1 = train on everything
    *   (the certified q124 configuration).
    */
  def semanticDedupPairs(emb: DataFrame, keyCol: String, vecCol: String,
                         minSim: Double = 0.9, nlist: Int = 16,
                         kmeansIters: Int = 2, maxCell: Int = 4096,
                         trainSampleMod: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    val cos = graft.functions.VectorFunctions.cosineNative(spark) _
    val trainSet =
      if (trainSampleMod <= 1) emb
      else emb.filter(Curation.portableHash(col(keyCol)) % trainSampleMod === 0)
    val cent = Similarity.kmeansCentroids(trainSet, keyCol, vecCol, nlist, kmeansIters)
    val assigned = spread(emb.select(col(keyCol).as("_id"), col(vecCol).as("_v")))
      .join(broadcast(cent))
      .select(col("_id"), col("cent_id"),
        graft.functions.VectorFunctions.roundNative(spark)(cos(col("_v"), col("cvec")), 6).as("_s"))
    val cells = Similarity.topKPerGroup(assigned, "_id", "_s", "cent_id", 1)
      .select(col("_id"), col("cent_id"))
    // each side carries its vector's norm, computed once per VECTOR before
    // pairing — the per-pair verify then runs norm-factored (dot/(na·nb),
    // bit-identical to the inline cosine; see expressions.VecPrimitives)
    val dot = graft.functions.VectorFunctions.dotNative(spark) _
    val nrm = graft.functions.VectorFunctions.normNative(spark)(_)
    val sided = materializeCandidateInput(
      cells.join(emb.select(col(keyCol).as("_id"), col(vecCol).as("_v"),
        nrm(col(vecCol)).as("_n")), "_id"),
      emb)
    boundedCandidates(sided, "_id", Seq("cent_id"), Seq("_v", "_n"), maxCell)
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.roundNative(spark)(
          dot(col("_v_a"), col("_v_b")) / (col("_n_a") * col("_n_b")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  // --------------------------------------------- duplicate clustering

  /** Connected components over a near-duplicate pair set + canonical
    * selection (min key per component) — the step that turns pair-finding
    * into a usable dedup: every member of a transitive duplicate cluster
    * maps to one canonical document.
    *
    * Algorithm: min-label propagation WITH POINTER JUMPING. Labels start as
    * each node's own key; every materialized round each node (1) RELAXES —
    * takes the min of its own and its neighbors' labels — and then
    * (2) JUMPS — takes the min of its label and its LABEL'S label (labels
    * are always node ids inside the same component, so label-of-label
    * composes two pointer hops into one). Relax alone converges in
    * DIAMETER rounds; the jump doubles the covered distance per round, so
    * convergence is LOG(diameter) materialized rounds — and at corpus
    * scale the wall of this loop is the per-round scheduling floor times
    * the round count, not the per-round data (everything shuffled is
    * edge-list-sized). Round 13: the r12 form paid one job per diameter
    * hop plus a label-init job; the init is now FUSED into round 1 (with
    * all-self labels the first neighbor-min is just `min(dst)` per `src` —
    * no label join), so a clique converges in two jobs total (one that
    * changes, one that confirms).
    *
    * Correctness of the combined stop test: labels only ever decrease, so
    * a round whose relax+jump changed nothing had a no-op relax — and a
    * relax fixpoint over symmetric edges means labels are constant per
    * component (= the component min, since every label is a reachable
    * node's id). The jump can therefore never stop the loop early.
    *
    * ONE driver job per round: the changed-row count rides a
    * `Dataset.observe` metric (`CollectMetrics` plan node) computed by the
    * SAME job that materializes the round's labels (eager
    * `localCheckpoint`), so convergence costs no second scheduling
    * round-trip — and the count stays inside the declarative plan
    * (whole-stage codegen, no `ExistingRDD` Row-serialization round-trip).
    * The relax subplan feeds both sides of the jump self-join; the two
    * occurrences are identical, so the exchange under the aggregate is
    * planned once and REUSED (`ReusedExchange`), not recomputed. Observed
    * metrics are computed exactly-once per action (Spark re-computes them
    * on task retry), and the test is `== 0`, never a threshold.
    */
  def duplicateClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val fwd = pairs.select(col("a").as("src"), col("b").as("dst"))
    // edge count rides the checkpoint's own job (the q85 observe pattern) —
    // it decides the loop's AQE posture below at zero extra scheduling cost
    val eObs = org.apache.spark.sql.Observation()
    val edges = fwd.union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .observe(eObs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val edgeCount = eObs.get("n").asInstanceOf[Long]
    // Tier 0 (round 16, Q85_DECOMP.json): a MEASURED-tiny edge list is
    // closed on the driver with union-find — the broadcast-join move
    // (Spark itself collects a measured-small join side to the driver).
    // The decomposition showed the loop below is already at its algorithmic
    // minimum for small inputs (2 materialized rounds: one that changes,
    // one that confirms; two-relaxations-per-round LOSES, 1.04 s vs 0.45 s)
    // so its remaining wall is pure per-stage scheduling floor — while the
    // whole component structure fits in one bounded collect. The bound is
    // the edge count the checkpoint's own Observation already measured:
    // <= 1M symmetric (long, long) edges ~ a few tens of MB on a driver
    // sized like any Spark driver that broadcasts a dimension table. At
    // 100 TB the pair volume of a real near-dup corpus blows past the gate
    // and the distributed loop below owns the work — this tier exists so
    // measured-tiny cluster sets (the common case after LSH banding caps)
    // stop paying 5+ scheduling rounds for sub-millisecond math.
    val driverMaxEdges = spark.conf.getOption("spark.graft.ccDriverEdges")
      .map(_.toLong).getOrElse(1000000L)
    val keysAreLong = fwd.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (keysAreLong && edgeCount <= driverMaxEdges) {
      import spark.implicits._
      // ONE job: pull the checkpointed edge list (bounded by the measured
      // count). Union-find with path-halving + union by rank, then label
      // every node with its component MIN (the loop's exact contract).
      val es = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
      val idx = new java.util.HashMap[Long, Int](es.length * 2)
      def id(k: Long): Int = {
        var i = idx.getOrDefault(k, -1)
        if (i < 0) { i = idx.size(); idx.put(k, i) }
        i
      }
      es.foreach { case (s, d) => id(s); id(d) }
      val n = idx.size()
      val parent = Array.tabulate(n)(identity)
      val rank = new Array[Byte](n)
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      es.foreach { case (s, d) =>
        val (rs, rd) = (find(id(s)), find(id(d)))
        if (rs != rd) {
          if (rank(rs) < rank(rd)) parent(rs) = rd
          else if (rank(rd) < rank(rs)) parent(rd) = rs
          else { parent(rd) = rs; rank(rs) = (rank(rs) + 1).toByte }
        }
      }
      val keys = new Array[Long](n)
      idx.forEach((k, i) => keys(i) = k)
      val minOfRoot = new Array[Long](n)
      java.util.Arrays.fill(minOfRoot, Long.MaxValue)
      (0 until n).foreach { i =>
        val r = find(i)
        if (keys(i) < minOfRoot(r)) minOfRoot(r) = keys(i)
      }
      return (0 until n).map(i => (keys(i), minOfRoot(find(i))))
        .toDF("doc_id", "canonical")
    }
    // AQE posture, decided by the MEASURED edge volume: every round's plan
    // is join + aggregate + self-join over edge-list-sized data, and under
    // AQE each of those tiny stages materializes as its own Spark job — at
    // fixture scale that floor is the whole wall (13 jobs vs 5, 1.15 s vs
    // 0.94 s at the sf1 point, ClusterRoundProbe). Past the threshold the
    // per-round shuffles are real work and AQE's runtime re-planning (skew
    // split, coalesce) earns its stage jobs, so it stays on.
    //
    // SCOPING (round 14, r13 verdict finding #2): the posture must not
    // touch the CALLER's session conf — a concurrent query planned on the
    // same session during the loop would silently lose AQE. The loop runs
    // in its own `newSession()` clone (same SparkContext, shared state,
    // isolated runtime conf — builder-time configs carry over via
    // initialSessionOptions) with AQE off; the materialized edge list
    // crosses sessions through a GLOBAL temp view (cross-session by
    // definition, resolved EAGERLY at Dataset creation so the view can be
    // dropped as soon as both handoffs are done). The edges are already a
    // localCheckpoint'ed LogicalRDD, so re-reading them from either
    // session is plan-only work, and the final labels cross back the same
    // way. Cost when the loop is NOT small: zero (no clone, no views).
    val smallLoop = edgeCount <= 4000000L
    val (loopEdges, unview) =
      if (!smallLoop) (edges, () => ())
      else {
        val vn = s"graft_cc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        edges.createOrReplaceGlobalTempView(vn)
        // memoized per-caller clone — newSession() per call costs ~1.3 s
        // cold (fresh SessionState + cold Tables cache; PostureSessions)
        val loopSession = graft.PostureSessions(spark,
          Map("spark.sql.adaptive.enabled" -> "false"))
        (loopSession.table(s"global_temp.$vn"),
          () => { spark.catalog.dropGlobalTempView(vn); () })
      }
    try {
      val edges2 = loopEdges
      var labels: DataFrame = null
      var converged = false
      while (!converged) {
        // relax: lbl ← min(lbl, neighbors' lbl); round 1 needs no label join
        // (initial labels ARE the node ids, so the neighbor min is min(dst))
        val relaxed =
          if (labels == null)
            edges2.groupBy(col("src").as("node")).agg(min("dst").as("nbr_lbl"))
              .select(col("node"), col("node").as("orig"),
                least(col("node"), col("nbr_lbl")).as("lbl"))
          else {
            val nbrMin = edges2.join(labels, edges2("dst") === labels("node"))
              .groupBy(col("src").as("node2")).agg(min("lbl").as("nbr_lbl"))
            labels.join(nbrMin, labels("node") === nbrMin("node2"), "left")
              .select(col("node"), col("lbl").as("orig"),
                least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
          }
        // jump: lbl ← min(lbl, lbl's lbl) — pointer doubling in the same job
        val hop = relaxed.select(col("node").as("p_node"), col("lbl").as("p_lbl"))
        val jumpedLbl =
          least(col("lbl"), coalesce(col("p_lbl"), col("lbl")))
        val next0 = relaxed.join(hop, relaxed("lbl") === hop("p_node"), "left")
          .select(col("node"), jumpedLbl.as("lbl"),
            (jumpedLbl < col("orig")).as("changed"))
        // count(when(...)) not sum(when(...)): count is 0 on an empty round,
        // sum is null — an empty label table must converge, not NPE
        val obs = org.apache.spark.sql.Observation()
        val counted = next0.observe(obs,
          count(when(col("changed"), lit(1))).as("changed"))
        val next = counted.select("node", "lbl").localCheckpoint(true) // ← the round's ONLY job
        converged = obs.get("changed").asInstanceOf[Long] == 0L
        labels = next
      }
      val result = labels.select(col("node").as("doc_id"), col("lbl").as("canonical"))
      if (!smallLoop) result
      else {
        // hand the converged (checkpointed) labels back to the CALLER's
        // session — analysis is eager, so the view is inlined into the
        // returned Dataset's plan and can be dropped immediately
        val vn = s"graft_cc_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        result.createOrReplaceGlobalTempView(vn)
        try spark.table(s"global_temp.$vn")
        finally spark.catalog.dropGlobalTempView(vn)
      }
    } finally unview()
  }

  /** Duplicate RESOLUTION — the step that actually applies dedup: given the
    * corpus and a near-dup pair source, cluster the pairs
    * ([[duplicateClusters]]) and, per cluster, KEEP the best document by
    * quality score ([[TextAnalysis.qualityScoreFromStats]], ties to the
    * smallest key) and mark the rest dropped. Emits
    * `(key, cluster, quality_score, keep)` for every clustered document —
    * the keep/drop decision list a pipeline applies (unclustered docs are
    * unique and never at risk).
    *
    * Scale shape: the cluster table holds only documents that appeared in a
    * pair — the duplicate fraction of the corpus, not the corpus — so the
    * quality join and the per-cluster rank window move duplicate-sized
    * data; the corpus contributes one text scan for the quality scores
    * (scoring scope is a measured decision — see the inline note).
    */
  def resolveDuplicates(docs: DataFrame, pairs: DataFrame,
                        keyCol: String, textCol: String): DataFrame = {
    // Scoring scope, MEASURED not assumed (ResolveShapeProbe, sf1,
    // interleaved min-of-5): a semi-join that pre-filters docs to the
    // clustered keys before the TextStats projection LOSES (1.37 s vs
    // 1.25 s) — the text scan dominates and is unavoidable either way
    // (the key filter prunes rows, not file IO), while the extra join
    // stage costs more than the saved stat evaluations. Keep the plain
    // projection; the final inner join drops unclustered rows.
    val st = graft.expressions.TextStats.statsCol(docs.sparkSession)(col(textCol))
    val scored = docs.withColumn("_st", st)
      .select(col(keyCol),
        TextAnalysis.qualityScoreFromStats(col("_st")).as("quality_score"))
    resolveWithScores(scored, pairs, keyCol)
  }

  /** Deployment form of duplicate resolution (round 14, the
    * topVocab/vocabOovScore split pattern): in a steady-state pipeline the
    * per-doc quality score is a MAINTAINED artifact (scored once when the
    * doc is ingested — the q119 incremental pattern), so a resolution run
    * pays only cluster the pairs + join scores + per-cluster keep window,
    * never the corpus text scan. `scored` must carry `(keyCol,
    * quality_score)`; [[resolveDuplicates]] is this plus the score
    * projection. Data moved is duplicate-fraction-sized throughout.
    */
  def resolveWithScores(scored: DataFrame, pairs: DataFrame,
                        keyCol: String): DataFrame = {
    // duplicateClusters emits fixed (doc_id, canonical) names — re-key to
    // the caller's keyCol so a non-doc_id key (e.g. a fingerprint) joins
    val clusters = duplicateClusters(pairs)
      .select(col("doc_id").as(keyCol), col("canonical").as("cluster"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("quality_score").desc, col(keyCol))
    clusters.join(scored, Seq(keyCol))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(keyCol), col("cluster"), col("quality_score"), col("keep"))
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    "q40_dedup_exact" -> ((s, dir) =>
      exact(Tables(s, dir).documents, "text", "doc_id")
        .select("doc_id", "dup_count").presented("doc_id")),
    "q41_dedup_minhash" -> ((s, dir) =>
      minhashPairs(Tables(s, dir).documents, "doc_id", k = 5, jaccardThreshold = 0.5)
        .presented("a", "b")),
    "q42_dedup_simhash" -> ((s, dir) =>
      simhashPairs(Tables(s, dir).documents, "doc_id", "text", maxDist = 3)
        .presented("a", "b")),
    // the incremental operating mode: corpus = doc_id % 5 != 0, increment =
    // doc_id % 5 == 0 (a deterministic 20% slice), banded-join across
    // slices only — certified against a committed independent-recompute
    // golden like the other hash-seeded dedup queries
    "q113_dedup_incremental" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      incrementalMinhashMatches(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", k = 5, jaccardThreshold = 0.5)
        .presented("old_id", "new_id")
    }),
    // q113's semantics through the DEPLOYMENT path: persisted bucketed band
    // table + text projection, gate against the bucketed read, append the
    // increment afterward — same slices, same golden (the result must be
    // identical to q113's in-memory-prebanded run)
    "q114_dedup_incremental_persisted" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      incrementalGateOverPersistedArtifacts(s,
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", Integer.toHexString(dir.hashCode), k = 5,
        jaccardThreshold = 0.5)
        .presented("old_id", "new_id")
    }),
    // excerpt/containment dedup over the full table: rare word-shingle
    // blocking + overlap-coefficient verify, fully SQL-mirrored in the
    // oracle (including the posting-list cap, so certification is exact)
    "q115_dedup_containment" -> ((s, dir) =>
      containmentPairs(Tables(s, dir).documents, "doc_id", n = 3,
        kRare = 4, minOverlap = 0.5)
        .presented("a", "b")),
    "q43_dedup_ngram_jaccard" -> ((s, dir) =>
      ngramJaccardPairs(Tables(s, dir).documents.filter(col("doc_id") <= 40), "doc_id", 3)
        .filter(col("jaccard") >= 0.1)
        .select(col("a"), col("b"),
          graft.functions.VectorFunctions.roundNative(s)(col("jaccard"), 4).as("jaccard"))
        .presented("a", "b")),
    "q44_dedup_embedding_cosine" -> ((s, dir) =>
      embeddingCosinePairs(Tables(s, dir).embeddings.filter(col("vec_id") <= 20), "vec_id", "embedding")
        .presented("a", "b")),
    // full corpus, LSH-blocked (the 100 TB shape): engine-seeded buckets,
    // certified against a committed independent-recompute golden (see
    // oracles below); recall + plan-shape invariants in DedupSpec.
    "q56_dedup_embedding_lsh" -> ((s, dir) =>
      embeddingLshPairs(Tables(s, dir).embeddings, "vec_id", "embedding", minSim = 0.3)
        .presented("a", "b")),
    // semantic dedup over the full corpus: TRAINED-cell blocking (SemDeDup
    // shape) + within-cell cosine verify — value-certified through the
    // training because every ranking step rounds to 6 decimals (the q55
    // k-means replay provides the oracle's cell assignment)
    "q124_dedup_semantic" -> ((s, dir) =>
      semanticDedupPairs(Tables(s, dir).embeddings, "vec_id", "embedding",
        minSim = 0.35)
        .presented("a", "b")),
    // the 100 TB OPERATING configuration of q124: k-means trains on the
    // deterministic portable-hash 1-in-4 corpus slice (training cost is
    // sample × nlist, not corpus × nlist); assignment and pairing still
    // cover the full corpus. Value-certified through the SAMPLED training:
    // the oracle's seed + Lloyd CTEs run over the same slice.
    "q135_dedup_semantic_sampled" -> ((s, dir) =>
      semanticDedupPairs(Tables(s, dir).embeddings, "vec_id", "embedding",
        minSim = 0.35, trainSampleMod = 4)
        .presented("a", "b")),
    "q68_dedup_levenshtein" -> ((s, dir) =>
      levenshteinPairs(Tables(s, dir).documents.filter(col("doc_id") <= 30), "doc_id", "text")
        .presented("a", "b")),
    // transitive clustering of the (SQL-expressible) n-gram pair source, so
    // the DuckDB oracle can close the same pairs with a recursive CTE
    "q85_dedup_cluster" -> ((s, dir) =>
      duplicateClusters(
        ngramJaccardPairs(Tables(s, dir).documents.filter(col("doc_id") <= 40), "doc_id", 3)
          .filter(col("jaccard") >= 0.1))
        .presented("doc_id")),
    // dedup applied end-to-end: same pair source as q85, clustered, then
    // per-cluster keep-the-best-quality (the decision list a pipeline acts on)
    "q120_dedup_resolve" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      resolveDuplicates(docs,
        ngramJaccardPairs(docs.filter(col("doc_id") <= 40), "doc_id", 3)
          .filter(col("jaccard") >= 0.1),
        "doc_id", "text")
        .presented("doc_id")
    }),
  )

  /** Oracles: the SQL-expressible semantics run directly in DuckDB; the
    * hash-seeded variants (q41, q42, q56) compare against COMMITTED GOLDENS
    * recomputed by an independent plain-Python implementation of the same
    * published algorithms (`tools/gen_lsh_goldens.py` — murmur3,
    * java.util.Random, banding, sign-projection; the reference repo's
    * golden-fixture pattern). One golden file serves every scale factor:
    * each row carries an exact integer `corpus_tag` of its input table and
    * the oracle selects the rows whose tag matches the corpus at hand.
    */
  val oracles: Map[String, String] = Map(
    "q113_dedup_incremental" ->
      """SELECT old_id, new_id, jaccard FROM read_parquet('/root/repo/goldens/q113_dedup_incremental.parquet')
         WHERE corpus_tag = (SELECT SUM(strlen(text) * (doc_id + 1)) FROM documents)
         ORDER BY old_id, new_id""",
    // identical semantics to q113 (the deployment path must reproduce the
    // in-memory path bit-for-bit), so it certifies against the same golden
    "q114_dedup_incremental_persisted" ->
      """SELECT old_id, new_id, jaccard FROM read_parquet('/root/repo/goldens/q113_dedup_incremental.parquet')
         WHERE corpus_tag = (SELECT SUM(strlen(text) * (doc_id + 1)) FROM documents)
         ORDER BY old_id, new_id""",
    "q41_dedup_minhash" ->
      """SELECT a, b, jaccard FROM read_parquet('/root/repo/goldens/q41_dedup_minhash.parquet')
         WHERE corpus_tag = (SELECT SUM(strlen(text) * (doc_id + 1)) FROM documents)
         ORDER BY a, b""",
    "q42_dedup_simhash" ->
      """SELECT a, b, hamming FROM read_parquet('/root/repo/goldens/q42_dedup_simhash.parquet')
         WHERE corpus_tag = (SELECT SUM(strlen(text) * (doc_id + 1)) FROM documents)
         ORDER BY a, b""",
    "q56_dedup_embedding_lsh" ->
      """SELECT a, b, sim FROM read_parquet('/root/repo/goldens/q56_dedup_embedding_lsh.parquet')
         WHERE corpus_tag = (SELECT SUM((vec_id + 1) * CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1048576) AS BIGINT)) FROM embeddings)
         ORDER BY a, b""",
    "q40_dedup_exact" ->
      "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents GROUP BY text ORDER BY doc_id",
    // the same rare word-shingle blocking + overlap-coefficient
    // construction, spelled relationally (posting-list cap mirrored at
    // 1024; same ' +' tokenization and short-doc-gram formula as q75/q109)
    "q115_dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
                    WHERE CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), ' +')) END >= 3),
         g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1), i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
               FROM t),
         ex AS (SELECT doc_id, unnest(g) AS sh FROM g),
         dfreq AS (SELECT sh, COUNT(*) AS df FROM ex GROUP BY sh),
         wd AS (SELECT ex.doc_id, ex.sh, dfreq.df FROM ex JOIN dfreq USING (sh)),
         rare AS (SELECT doc_id AS a, sh FROM (
                    SELECT doc_id, sh, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY df, sh) AS rr FROM wd)
                  WHERE rr <= 4),
         postings AS (SELECT doc_id AS b, sh FROM (
                    SELECT doc_id, sh, ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id) AS pr FROM wd)
                  WHERE pr <= 1024),
         cand AS (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
                  FROM rare JOIN postings USING (sh) WHERE a <> b)
         SELECT cand.a, cand.b,
                ROUND(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) / LEAST(len(ga.g), len(gb.g)), 4) AS overlap
         FROM cand JOIN g ga ON ga.doc_id = cand.a JOIN g gb ON gb.doc_id = cand.b
         WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) / LEAST(len(ga.g), len(gb.g)) >= 0.5
         ORDER BY a, b""",
    "q43_dedup_ngram_jaccard" ->
      """SELECT a.doc_id AS a, b.doc_id AS b, ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)), 4) AS jaccard
         FROM (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) a
         JOIN (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) b
         ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.1
         ORDER BY a, b""",
    "q44_dedup_embedding_cosine" ->
      """SELECT a.vec_id AS a, b.vec_id AS b, ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE a.vec_id <= 20 AND b.vec_id <= 20
         ORDER BY a, b""",
    // mirrors semanticDedupPairs end to end: the q55 k-means replay (same
    // seeds, same two round-6 Lloyd iterations, same round-6 argmax cells)
    // followed by within-cell pairwise round-6 cosine ≥ 0.35. The Scala
    // side's hot-cell cap (4096) cannot bind at ≤2000 corpus vectors, so
    // the uncapped SQL is exact.
    "q124_dedup_semantic" ->
      """WITH c0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cent_id, cvec FROM (
                       SELECT ROW_NUMBER() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) AS rn,
                              CAST(embedding AS DOUBLE[]) AS cvec
                       FROM embeddings) s
                     WHERE rn <= 16),
              a1 AS (SELECT vec_id, cent_id FROM (
                       SELECT e.vec_id, c.cent_id,
                              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, c.cent_id) AS rn
                       FROM embeddings e CROSS JOIN c0 c) x WHERE rn = 1),
              m1 AS (SELECT a1.cent_id, t.pos, ROUND(AVG(CAST(e.embedding[t.pos] AS DOUBLE)), 6) AS v
                     FROM a1 JOIN embeddings e USING (vec_id), LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS pos) t
                     GROUP BY a1.cent_id, t.pos),
              c1 AS (SELECT s.cent_id, COALESCE(r.cvec, s.cvec) AS cvec
                     FROM c0 s LEFT JOIN (SELECT cent_id, list(v ORDER BY pos) AS cvec FROM m1 GROUP BY cent_id) r USING (cent_id)),
              a2 AS (SELECT vec_id, cent_id FROM (
                       SELECT e.vec_id, c.cent_id,
                              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, c.cent_id) AS rn
                       FROM embeddings e CROSS JOIN c1 c) x WHERE rn = 1),
              m2 AS (SELECT a2.cent_id, t.pos, ROUND(AVG(CAST(e.embedding[t.pos] AS DOUBLE)), 6) AS v
                     FROM a2 JOIN embeddings e USING (vec_id), LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS pos) t
                     GROUP BY a2.cent_id, t.pos),
              c2 AS (SELECT s.cent_id, COALESCE(r.cvec, s.cvec) AS cvec
                     FROM c1 s LEFT JOIN (SELECT cent_id, list(v ORDER BY pos) AS cvec FROM m2 GROUP BY cent_id) r USING (cent_id)),
              ca AS (SELECT e.vec_id, c.cent_id,
                            ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS s
                     FROM embeddings e CROSS JOIN c2 c),
              cells AS (SELECT vec_id AS c_id, cent_id FROM
                          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn FROM ca) x
                        WHERE rn = 1),
              sided AS (SELECT c.c_id, c.cent_id, CAST(e.embedding AS DOUBLE[]) AS v
                        FROM cells c JOIN embeddings e ON e.vec_id = c.c_id)
         SELECT a, b, sim FROM (
           SELECT x.c_id AS a, y.c_id AS b, ROUND(list_cosine_similarity(x.v, y.v), 6) AS sim
           FROM sided x JOIN sided y ON x.cent_id = y.cent_id AND x.c_id < y.c_id) p
         WHERE sim >= 0.35 ORDER BY a, b""",
    // q124 in its 100 TB OPERATING form: every TRAINING read (seeds, both
    // Lloyd assignment+refinement passes) runs over the deterministic
    // portable-hash 1-in-4 slice `tr`; the final assignment (ca) and the
    // within-cell pairing still cover the full corpus — exactly
    // semanticDedupPairs(trainSampleMod = 4)
    "q135_dedup_semantic_sampled" ->
      """WITH tr AS (SELECT vec_id, embedding FROM embeddings
                     WHERE ((vec_id % 2147483648) * 2654435761) % 4294967296 % 4 = 0),
              c0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cent_id, cvec FROM (
                       SELECT ROW_NUMBER() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) AS rn,
                              CAST(embedding AS DOUBLE[]) AS cvec
                       FROM tr) s
                     WHERE rn <= 16),
              a1 AS (SELECT vec_id, cent_id FROM (
                       SELECT e.vec_id, c.cent_id,
                              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, c.cent_id) AS rn
                       FROM tr e CROSS JOIN c0 c) x WHERE rn = 1),
              m1 AS (SELECT a1.cent_id, t.pos, ROUND(AVG(CAST(e.embedding[t.pos] AS DOUBLE)), 6) AS v
                     FROM a1 JOIN tr e USING (vec_id), LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS pos) t
                     GROUP BY a1.cent_id, t.pos),
              c1 AS (SELECT s.cent_id, COALESCE(r.cvec, s.cvec) AS cvec
                     FROM c0 s LEFT JOIN (SELECT cent_id, list(v ORDER BY pos) AS cvec FROM m1 GROUP BY cent_id) r USING (cent_id)),
              a2 AS (SELECT vec_id, cent_id FROM (
                       SELECT e.vec_id, c.cent_id,
                              ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, c.cent_id) AS rn
                       FROM tr e CROSS JOIN c1 c) x WHERE rn = 1),
              m2 AS (SELECT a2.cent_id, t.pos, ROUND(AVG(CAST(e.embedding[t.pos] AS DOUBLE)), 6) AS v
                     FROM a2 JOIN tr e USING (vec_id), LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS pos) t
                     GROUP BY a2.cent_id, t.pos),
              c2 AS (SELECT s.cent_id, COALESCE(r.cvec, s.cvec) AS cvec
                     FROM c1 s LEFT JOIN (SELECT cent_id, list(v ORDER BY pos) AS cvec FROM m2 GROUP BY cent_id) r USING (cent_id)),
              ca AS (SELECT e.vec_id, c.cent_id,
                            ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS s
                     FROM embeddings e CROSS JOIN c2 c),
              cells AS (SELECT vec_id AS c_id, cent_id FROM
                          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id) AS rn FROM ca) x
                        WHERE rn = 1),
              sided AS (SELECT c.c_id, c.cent_id, CAST(e.embedding AS DOUBLE[]) AS v
                        FROM cells c JOIN embeddings e ON e.vec_id = c.c_id)
         SELECT a, b, sim FROM (
           SELECT x.c_id AS a, y.c_id AS b, ROUND(list_cosine_similarity(x.v, y.v), 6) AS sim
           FROM sided x JOIN sided y ON x.cent_id = y.cent_id AND x.c_id < y.c_id) p
         WHERE sim >= 0.35 ORDER BY a, b""",
    "q68_dedup_levenshtein" ->
      """SELECT a.doc_id AS a, b.doc_id AS b, levenshtein(a.text, b.text) AS dist
         FROM documents a JOIN documents b ON a.doc_id < b.doc_id
         WHERE a.doc_id <= 30 AND b.doc_id <= 30
         ORDER BY a, b""",
    // same pair source as q43, closed transitively (UNION dedups, so the
    // recursion reaches a fixpoint), then min reachable id per node
    "q85_dedup_cluster" ->
      """WITH RECURSIVE pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b
           FROM (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) a
           JOIN (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) b
           ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.1),
         edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM edges
           UNION
           SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r)
         SELECT node AS doc_id, MIN(r) AS canonical FROM reach GROUP BY node ORDER BY doc_id""",
    // q85's transitive closure + q79's quality formula + per-cluster argmax
    "q120_dedup_resolve" ->
      """WITH RECURSIVE pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b
           FROM (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) a
           JOIN (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1), i -> substring(text, i, 3))) AS g FROM documents WHERE doc_id <= 40 AND length(text) >= 3) b
           ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.1),
         edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
         reach AS (
           SELECT DISTINCT src AS node, src AS r FROM edges
           UNION
           SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r),
         clusters AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node),
         scored AS (
           SELECT doc_id, ROUND(CAST(least(n_words, 50) * alpha AS DOUBLE) * 10000 / (50 * greatest(n_chars, 1))) / 10000 AS quality_score
           FROM (SELECT doc_id,
                        CAST(length(text) AS BIGINT) AS n_chars,
                        CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) END AS n_words,
                        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha
                 FROM documents) f),
         ranked AS (
           SELECT c.doc_id, c.cluster, s.quality_score,
                  ROW_NUMBER() OVER (PARTITION BY c.cluster ORDER BY s.quality_score DESC, c.doc_id) AS rk
           FROM clusters c JOIN scored s USING (doc_id))
         SELECT doc_id, cluster, quality_score, (rk = 1) AS keep FROM ranked ORDER BY doc_id""",
  )
}
