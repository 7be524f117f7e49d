package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — each designed around ONE bounded shuffle.
  *
  * Scale notes (the 100 TB story):
  *   - exact: hash-aggregate on the text (or a digest of it) — map-side
  *     partial aggregation collapses duplicates before the shuffle; shuffling
  *     xxhash64 digests instead of full text keeps shuffle bytes tiny.
  *   - minhashLsh: per-row signature computation is embarrassingly parallel
  *     (array expressions, codegen'd); the only shuffle is the band-bucket
  *     groupBy, whose cardinality is ~rows×bands but each record is
  *     (bucket, id) — small. Candidate verification joins are per-bucket.
  *   - simHash: per-row 64-bit fingerprint, duplicates = equal fingerprints
  *     (or Hamming-close via the pigeonhole block-candidate join) — one
  *     digest shuffle.
  */
object Dedup {

  /** Exact dedup: deterministic representative (min id) per distinct text. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))

  /** Exact dedup shuffling 8-byte digests instead of full documents: at
    * 100 TB the shuffle carries ~16 B/row rather than the text. xxhash64
    * collisions (~N²/2⁶⁵) are acceptable for dedup; use [[exact]] when
    * byte-exact text grouping is required. */
  def exactByDigest(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(xxhash64(col(textCol)).as("digest"), col(idCol))
      .groupBy(col("digest")).agg(min(col(idCol)).as(idCol))

  /** Exact-dup statistics: total rows, distinct texts, duplicate rows. */
  def exactStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("total"),
      countDistinct(col(textCol)).as("distinct_texts"),
      (count(lit(1)) - countDistinct(col(textCol))).as("dup_rows")
    )

  /** Word k-shingles of a document as an array column. Prefer [[shinglesOf]]
    * over a materialized token column in per-row hot paths. */
  def shingles(text: Column, k: Int): Column = shinglesOf(TextAnalysis.tokens(text), k)

  /** k-shingles from an already-materialized token ARRAY column. The token
    * expression is referenced once per produced shingle (`slice` per index),
    * so passing an inline tokenizer here re-tokenizes O(#tokens) times per
    * row — callers should `select` the tokens into a real column first. */
  def shinglesOf(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))
      ))

  /** MinHash signature: for each of `numHashes` seeds, min over shingles of
    * xxhash64(shingle, seed-salt). Pure per-row array math.
    *
    * Shaped as ONE `aggregate` pass over the shingle array carrying a
    * running per-seed minimum — the shingle subtree is evaluated exactly
    * once per row. The naive per-seed form duplicates (and re-evaluates)
    * the whole shingle-construction subtree `numHashes` times; that cost
    * 18s vs ~1s on the sf0.01 documents table. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    aggregate(
      array_distinct(sh),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, x) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), s => xxhash64(x, s)),
        (a, h) => least(a, h))
    )

  /** MinHash + LSH banding: docs whose signature agrees on ALL rows of some
    * band land in the same bucket → candidate pair → verified by estimated
    * Jaccard (signature agreement rate) >= threshold.
    *
    * Candidate volume per (band, bucket) is frequency² — hot buckets (near-
    * identical boilerplate, and above all EXACT duplicates, which share
    * every band's bucket) dominate the join. `maxBucketFreq` drops bucket
    * values shared by more than that many docs before the self-join (the
    * [[simhashNearDup64]] `maxBlockFreq` trade: bounded fan-out for recall
    * on the hottest clusters).
    *
    * WARNING — on a corpus with exact duplicates the candidate join grows
    * with the SQUARE of the duplication factor, and the cap prunes whole
    * clusters rather than fixing that. Call [[minhashLshDeduped]] — the
    * exact-dedup-FIRST composition with provably identical output — unless
    * the corpus is already exact-deduped (same guidance as
    * [[ngramJaccardDeduped]], measured in SCALE.md's cap-trade triangle).
    *
    * Cap guidance, MEASURED ([[minhashBucketStats]] at documents ×30,
    * SCALE.md r12): raw banding put 1,680 buckets over the default cap 50
    * (max frequency 120 = the duplication factor × the hottest text's
    * natural copies; candidate mass 19.0M pairs), and every over-cap
    * bucket was duplication-driven — capping there trades RECALL on
    * exactly the clusters a dedup most wants. After exact-dedup
    * pre-collapse the same corpus's distribution collapsed to max bucket
    * frequency 4, zero buckets over cap, 1,710 candidate pairs: the
    * residual NATURAL skew is tiny, and the cap's real job is guarding
    * against pathological shared-shingle boilerplate, not duplication.
    * Order of defenses: dedup first; keep the cap as the backstop.
    *
    * Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b.
    */
  def minhashLsh(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = None
  ): DataFrame = {
    // native one-pass signature (graft.plans.MinHashSig / Poly64MinHash)
    // when the session carries GraftExtensions; HOF formulation otherwise —
    // xxhash and HOF variants produce different (internal) hash values but
    // identical agreement semantics, which is all LSH banding observes.
    // portableHash=true swaps in the Poly64 family, whose signatures a
    // DuckDB oracle can recompute value-for-value (native ≡ HOF there).
    minhashPairsFromSignatures(
      minhashSignatures(docs, textCol, idCol, shingleK, numHashes, portableHash),
      idCol, numHashes, bands, threshold, maxBucketFreq)
  }

  /** The MinHash BUILD artifact: one row per document with its text digest
    * and its `numHashes`-long signature — the ~260 B/row table a 100 TB
    * dedup deployment materializes once per corpus snapshot (the
    * "materialized digest + fingerprint columns" the [[dedupAgainst]]
    * scaladoc promises, for the Jaccard family). Everything downstream —
    * within-corpus pairs ([[minhashPairsFromSignatures]]) and
    * shard-vs-corpus incremental dedup ([[minhashAgainst]]) — reads this
    * table instead of re-tokenizing text; band buckets are NOT stored
    * because they re-derive from the signature as a cheap projection
    * (storing them would ×bands the artifact for work the scan does in
    * codegen). Output: (idCol, dg = xxhash64(text), sig array<long>). */
  def minhashSignatures(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      portableHash: Boolean = false
  ): DataFrame = {
    val sigExpr: Column = sessionSig(docs.sparkSession, portableHash, shingleK, numHashes)
    docs
      .select(col(idCol), xxhash64(col(textCol)).as("dg"),
        TextAnalysis.tokensIn(docs.sparkSession)(col(textCol)).as("__toks"))
      .select(col(idCol), col("dg"), sigExpr.as("sig"))
  }

  /** RETRACT a document set from a materialized [[minhashSignatures]]
    * artifact — the deletion path completing the artifact trio with
    * [[graft.ops.TextAnalysis.bm25IndexRetract]] and
    * [[graft.ops.Similarity.ivfRetract]]: signature rows are per-doc with
    * no cross-row terms (band buckets re-derive per row), so dropping the
    * ids' rows IS `minhashSignatures(W ∖ D)` exactly; every downstream
    * consumer ([[minhashPairsFromSignatures]], [[minhashAgainst]]) then
    * behaves as if the docs never existed — incl. the hot-bucket cap,
    * whose frequencies re-count from surviving rows only (a deleted doc
    * can neither form pairs nor push a bucket over the cap). D
    * broadcasts; nothing corpus-sized. */
  def minhashSignaturesRetract(sigs: DataFrame, docIds: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    sigs.join(broadcast(docIds.select(col(idCol)).distinct()), Seq(idCol), "left_anti")

  /** [[minhashLsh]]'s banding + candidate-join + verify tail over an
    * already-built signature table — the SERVE half of the build/serve
    * split (q_minhash_pairs_served pins served ≡ direct ≡ oracle through
    * a parquet round-trip of [[minhashSignatures]]'s output). */
  def minhashPairsFromSignatures(
      sigs: DataFrame,
      idCol: String = "doc_id",
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucketFreq: Option[Int] = None
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val banded = bandedFromSig(sigs.select(col(idCol), col("sig")), bands, rowsPerBand)
    val pruned = maxBucketFreq match {
      case Some(m) =>
        // repartition on the join keys first, so the frequency window reuses
        // that exchange AND both self-join sides reference the same shuffle
        // subtree (the simhashNearDupFromFp ReusedExchange recipe); the
        // uncapped path keeps its original (measured) plan untouched
        import org.apache.spark.sql.expressions.Window
        banded.repartition(col("band"), col("bucket"))
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
          .where(col("__df") <= m).drop("__df")
      case None => banded
    }
    val a = pruned.select(col(idCol).as("doc_a"), col("sig").as("sig_a"), col("band"), col("bucket"))
    val b = pruned.select(col(idCol).as("doc_b"), col("sig").as("sig_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")), v => v === 1))
          .cast("double") / lit(rowsPerBand * bands).cast("double")).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(first("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** (id, sig, band, bucket) from a signature frame — bucket is a hash of
    * the band's signature slice. Shared by the pair tail and the
    * incremental form, so bucket identity can never drift between them. */
  private def bandedFromSig(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig
      .select(col("*"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"),
        concat_ws(",", transform(
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))

  /** DIAGNOSTIC: the (band, bucket) frequency distribution of a corpus's
    * MinHash banding — the skew surface of every band-bucket join
    * ([[minhashPairsFromSignatures]], [[minhashAgainst]]). A bucket of
    * frequency f contributes f·(f−1)/2 candidate pairs, all landing in
    * ONE join task's hash group, so the distribution's tail IS the
    * band-join's p99-task-size story; `maxBucketFreq` prunes buckets
    * above the cap before the join. One row per (band, bucket) with its
    * row frequency — aggregate max/percentiles/Σf² caller-side (the
    * frame is ≤ bands × corpus rows, pre-aggregated by the groupBy).
    * Run over the RAW corpus to see duplication-driven skew, or over
    * exact-dedup representatives to see the residual natural skew
    * ([[minhashLshDeduped]]'s pre-collapse is exactly this defense). */
  def minhashBucketStats(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      portableHash: Boolean = false
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    bandedFromSig(
      minhashSignatures(docs, textCol, idCol, shingleK, numHashes, portableHash)
        .select(col(idCol), col("sig")),
      bands, numHashes / bands)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("freq"))
  }

  /** [[dedupAgainst]]'s Jaccard-estimate sibling: clean a newly-landed
    * shard against the standing corpus using its materialized
    * [[minhashSignatures]] artifact — the MinHash variant of the
    * ingestion-time shape, for deployments whose near-dup criterion is
    * shingle overlap rather than Hamming distance. Same three stages:
    *
    *   1. exact-vs-existing — digest anti-join against the artifact's
    *      `dg` column (8 B/row, no text touch);
    *   2. exact-within-shard — min-id representative per digest;
    *   3. fuzzy-vs-existing — band-bucket join of the shard's fresh
    *      signatures against the artifact's, signature-agreement
    *      estimate ≥ threshold drops the incoming doc. `maxBucketFreq`
    *      caps hot buckets on the EXISTING side (where frequency skew
    *      lives — the [[dedupAgainst]] convention), bounding the
    *      candidate fan-in a pathological standing bucket can cause.
    *
    * The standing corpus contributes ONLY its signature table —
    * per-shard cost is independent of corpus text re-reads, and stage 1
    * gives the same duplication defense the ×10 probes measured for
    * [[dedupAgainst]]: copies of standing docs die before any banding.
    * Fuzzy pairs WITHIN the shard are out of scope — compose with
    * [[minhashLshDeduped]] over the shard when that matters.
    *
    * `shingleK`/`numHashes`/`portableHash` must match the artifact's
    * build parameters (a mismatch silently estimates garbage — the same
    * contract as serving any index with the wrong analyzer).
    * Output: the surviving incoming rows, all columns intact. */
  def minhashAgainst(
      existingSigs: DataFrame,
      incoming: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = Some(50)
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val exDig = existingSigs.select(col("dg").as("__dg")).distinct()
    val in1 = incoming.withColumn("__dg", xxhash64(col(textCol)))
      .join(exDig, Seq("__dg"), "left_anti")
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("__dg"))
    val in2 = in1.withColumn("__m", min(col(idCol)).over(wd))
      .where(col(idCol) === col("__m")).drop("__m", "__dg")
    val exB0 = bandedFromSig(
      existingSigs.select(col(idCol).as("id"), col("sig")), bands, rowsPerBand)
    val exB = maxBucketFreq match {
      case Some(m) =>
        import org.apache.spark.sql.expressions.Window
        exB0.withColumn("__df", count(lit(1)).over(
            Window.partitionBy(col("band"), col("bucket"))))
          .where(col("__df") <= m).drop("__df")
      case None => exB0
    }
    val inB = bandedFromSig(
      minhashSignatures(in2, textCol, idCol, shingleK, numHashes, portableHash)
        .select(col(idCol).as("id"), col("sig")), bands, rowsPerBand)
    val dropped = inB
      .join(exB.select(col("sig").as("__sx"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where((size(filter(zip_with(col("sig"), col("__sx"),
          (x, y) => (x === y).cast("int")), v => v === 1))
          .cast("double") / lit(numHashes).cast("double")) >= threshold)
      .select(col("id").as(idCol)).distinct()
    in2.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[minhashLsh]] with the exact-dedup-FIRST ordering built in — the
    * MinHash member of the composed family ([[ngramJaccardDeduped]],
    * [[simhashNearDup64Deduped]]), closing the last pairwise op exposed to
    * the duplication² trap: identical texts have identical signatures,
    * hence identical buckets in EVERY band, so a duplication-factor-d
    * corpus does d² candidate work in the direct form. Output is PROVABLY
    * identical to [[minhashLsh]] with the same knobs:
    *
    *   - identical texts → identical signatures → a (band, bucket) value's
    *     corpus frequency = Σ group sizes over the representatives carrying
    *     it; the cap window here sums group sizes, pruning exactly the
    *     buckets the direct form's row count prunes;
    *   - a cross-group member pair shares its representatives' signatures:
    *     candidate-hood (≥1 surviving shared bucket) and the agreement-rate
    *     estimate both transfer unchanged;
    *   - a within-group pair agrees on every signature position
    *     (est_jaccard = 1.0) and is a candidate iff ANY of the group's
    *     (common) buckets survives the cap — one semi-join. The estimate is
    *     derived from the representative's signature, NOT a literal 1.0:
    *     a null-signature group (null text) yields a null estimate in the
    *     direct form and its pairs are dropped by the threshold filter —
    *     the null-propagating self-agreement here reproduces that.
    *
    * Exact groups keyed by xxhash64(text), same collision trade as
    * [[exactByDigest]]. */
  def minhashLshDeduped(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = None
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    import org.apache.spark.sql.expressions.Window
    val rowsPerBand = numHashes / bands
    val mapping = exactGroupMapping(docs, textCol, idCol)
    val reps = mapping.where(col("__m_id") === col("__rep"))
      .select(col("__rep").as(idCol), col("__gsz"))
    val repDocs = docs.join(reps, Seq(idCol))
    val sigExpr: Column = sessionSig(docs.sparkSession, portableHash, shingleK, numHashes)
    val sig = repDocs
      .select(col(idCol), col("__gsz"),
        TextAnalysis.tokensIn(docs.sparkSession)(col(textCol)).as("__toks"))
      .select(col(idCol), col("__gsz"), sigExpr.as("sig"))
    val banded = sig
      .select(col(idCol), col("__gsz"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"),
        concat_ws(",", transform(
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))
    val pruned = maxBucketFreq match {
      case Some(m) =>
        // duplication-weighted frequency: Σ group sizes = the direct form's
        // per-(band, bucket) row count; window reuses the repartition
        banded.repartition(col("band"), col("bucket"))
          .withColumn("__df", sum(col("__gsz")).over(Window.partitionBy(col("band"), col("bucket"))))
          .where(col("__df") <= m).drop("__df")
      case None => banded
    }
    val a = pruned.select(col(idCol).as("doc_a"), col("sig").as("sig_a"), col("band"), col("bucket"))
    val b = pruned.select(col(idCol).as("doc_b"), col("sig").as("sig_b"), col("band"), col("bucket"))
    val repPairs = a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")), v => v === 1))
          .cast("double") / lit(rowsPerBand * bands).cast("double")).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(first("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
    val memb = mapping.select(col("__m_id"), col("__rep"))
    val cross = repPairs
      .join(memb.select(col("__rep").as("doc_a"), col("__m_id").as("ia")), Seq("doc_a"))
      .join(memb.select(col("__rep").as("doc_b"), col("__m_id").as("ib")), Seq("doc_b"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("est_jaccard"))
    // within-group pairs: self-agreement of the rep's signature (1.0, or
    // null for a null signature — matching the direct form's dropped null
    // estimates), gated on ≥1 surviving bucket
    val surv = pruned.select(col(idCol).as("id")).distinct()
    val selfEst = sig.select(col(idCol).as("id"),
      (size(filter(zip_with(col("sig"), col("sig"), (x, y) => (x === y).cast("int")), v => v === 1))
        .cast("double") / lit(rowsPerBand * bands).cast("double")).as("est_jaccard"))
    val within = memb.as("p")
      .join(memb.as("q"),
        col("p.__rep") === col("q.__rep") && col("p.__m_id") < col("q.__m_id"))
      .select(col("p.__rep").as("id"), col("p.__m_id").as("doc_a"), col("q.__m_id").as("doc_b"))
      .join(surv, Seq("id"), "left_semi")
      .join(selfEst, Seq("id"))
      .where(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    cross.unionByName(within)
  }

  /** SimHash: 64-bit fingerprint — per bit, sign of the sum of ±1 votes from
    * each distinct token's xxhash64. Near-dups share fingerprints (exact
    * match here; [[simhashNearDup]] finds Hamming-close pairs via the
    * block-candidate join).
    *
    * Bit plumbing goes through `bin()` (two's-complement bit-string of the
    * token hash) because the Column API has no variable-shift operator, and
    * the result is a 16-char hex string via `conv` — avoids ANSI-mode long
    * overflow on the top bit while staying fully codegen'd.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(
        acc,
        // slice to exactly 64: split("") appends a trailing "" which would
        // zip_with-pad the vote array to 65 elements and skew the fingerprint
        slice(split(lpad(bin(xxhash64(t)), 64, "0"), ""), 1, 64),
        (a, bitCh) => a + when(bitCh === "1", 1).otherwise(-1)
      )
    )
    conv(concat_ws("", transform(votes, v => when(v > 0, "1").otherwise("0"))), 2, 16)
  }

  /** Session-appropriate MinHash signature over the `__toks` column:
    * native expression when registered, HOF twin otherwise; xxhash64 family
    * by default, [[graft.plans.Poly64]] family when `portable`. */
  private def sessionSig(s: org.apache.spark.sql.SparkSession, portable: Boolean,
      shingleK: Int, numHashes: Int): Column =
    if (portable) {
      if (s.catalog.functionExists("graft_minhash_poly"))
        call_function("graft_minhash_poly", col("__toks"), lit(shingleK), lit(numHashes))
      else minhashSignature64(shinglesOf(col("__toks"), shingleK), numHashes)
    } else {
      if (s.catalog.functionExists("graft_minhash"))
        call_function("graft_minhash", col("__toks"), lit(shingleK), lit(numHashes))
      else minhashSignature(shinglesOf(col("__toks"), shingleK), numHashes)
    }

  /** Session-aware SimHash: the native `graft_simhash` expression (tight
    * bit-vote loop) when the session carries GraftExtensions, else the
    * portable HOF form. Bit-identical outputs (spec-enforced), so callers
    * and persisted fingerprints never observe which one ran. */
  def simhashOf(s: org.apache.spark.sql.SparkSession): Column => Column =
    if (s.catalog.functionExists("graft_simhash"))
      text => call_function("graft_simhash", TextAnalysis.tokensIn(s)(text))
    else simhash

  /** SimHash dedup groups: fingerprint per doc + group id (min doc id sharing
    * the fingerprint). */
  def simhashGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = docs.select(col(idCol), simhashOf(docs.sparkSession)(col(textCol)).as("simhash"))
    fp.withColumn("group_id", min(col(idCol)).over(Window.partitionBy(col("simhash"))))
  }

  /** Near-duplicate pairs by SimHash Hamming distance, from a fingerprint
    * frame (id, fp) where fp is [[simhash]]'s 16-hex-char string.
    *
    * Standard block-candidate scheme: the 64-bit fingerprint splits into
    * `nBlocks` equal hex blocks; by pigeonhole, any pair within Hamming
    * distance `nBlocks - 1` agrees exactly on ≥1 block, so candidates are
    * found by a per-block equi-join (shuffle carries (block, id, fp) — no
    * all-pairs scan), then verified with an exact popcount. nBlocks ∈
    * {2,4,8,16} so blocks divide the 16 hex chars evenly.
    *
    * Candidate volume is Σ (per-block-value frequency)² — quadratic in hot
    * block values when fingerprints cluster. `maxBlockFreq` drops block
    * values shared by more than that many fingerprints before the join
    * (the [[ngramJaccard]] `maxNgramFreq` trade: bounded join fan-out for
    * recall on the hottest clusters) — optional at test SF, the knob to
    * reach for at 100 TB.
    *
    * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ nBlocks-1. */
  def simhashNearDupFromFp(fps: DataFrame, nBlocks: Int = 4,
      idCol: String = "doc_id", fpCol: String = "fp",
      maxBlockFreq: Option[Int] = None): DataFrame = {
    require(Set(2, 4, 8, 16).contains(nBlocks), "nBlocks must divide the 16 hex chars")
    val width = 16 / nBlocks
    // conv() dropped leading zeros when the fingerprint was built — pad back.
    // The coalesce makes the column NON-nullable (null fp ≡ the empty-doc
    // "0" fingerprint): without it the join infers isnotnull(block) filters
    // and predicate pushdown re-inlines the whole fingerprint expression
    // into the scan-level Filter — the fingerprint then computes TWICE per
    // row per side (SCALE.md pitfall #1 in pushdown clothing).
    val padded = lpad(coalesce(col(fpCol), lit("0")), 16, "0")
    val blocked = fps
      .select(col(idCol).as("id"), padded.as("fp"),
        explode(array((0 until nBlocks).map(i =>
          struct(lit(i).as("bi"), substring(padded, 1 + i * width, width).as("bv"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      // shuffle by the join keys BEFORE the per-side renames: both join
      // sides then reference the SAME exchange subtree, so Spark reuses one
      // shuffle and the (expensive) fingerprint lineage is computed once —
      // renaming first would make the canonical plans differ and double the
      // simhash work (measured ~2× on this operator's hot path)
      .repartition(col("bi"), col("bv"))
    val pruned = maxBlockFreq match {
      case Some(m) =>
        // per-(bi,bv) frequency over the already-shuffled blocks: the window
        // reuses the repartition's distribution, no extra exchange
        import org.apache.spark.sql.expressions.Window
        blocked
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("bi"), col("bv"))))
          .where(col("__df") <= m).drop("__df")
      case None => blocked
    }
    val a = pruned.select(col("id").as("id_a"), col("fp").as("fp_a"), col("bi"), col("bv"))
    val b = pruned.select(col("id").as("id_b"), col("fp").as("fp_b"), col("bi"), col("bv"))
    def half(c: Column, from: Int): Column =
      conv(substring(c, from, 8), 16, 10).cast("long")
    // merge-join hint: a broadcast of either side would RE-COMPUTE the
    // fingerprint lineage into the broadcast relation (small-stats plans do
    // exactly that), while the SMJ's two (bi, bv) exchanges canonicalize
    // identically → ReusedExchange, one simhash pass (PlanSpec pins this).
    // SMJ is also the only join shape that survives corpus-sized sides.
    a.join(b.hint("merge"), Seq("bi", "bv"))
      .where(col("id_a") < col("id_b"))
      // exact popcount of the XOR, in two 32-bit halves (conv of 8 hex
      // chars fits a long; a single 64-bit conv would overflow on the
      // top bit under ANSI). Computed BEFORE the pair dedup and the radius
      // filter, so the distinct() shuffle carries (id, id, int) rows — not
      // fingerprint strings — and only surviving pairs at that
      .withColumn("hamming", (
        bit_count(half(col("fp_a"), 1).bitwiseXOR(half(col("fp_b"), 1))) +
          bit_count(half(col("fp_a"), 9).bitwiseXOR(half(col("fp_b"), 9)))).cast("int"))
      .where(col("hamming") <= nBlocks - 1)
      // a pair sharing multiple blocks matches once per block — dedup last
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** [[simhashNearDupFromFp]] over raw documents: fingerprint, then the
    * block-candidate join. Radius = nBlocks - 1 bits. */
  def simhashNearDup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      nBlocks: Int = 4, maxBlockFreq: Option[Int] = None): DataFrame =
    simhashNearDupFromFp(
      docs.select(col(idCol), simhashOf(docs.sparkSession)(col(textCol)).as("fp")),
      nBlocks, idCol, "fp", maxBlockFreq)

  /** Group-vs-group content overlap via MinHash-union sketches: one
    * signature per group (the signature of the UNION of member shingle
    * sets — exact for MinHash, since min over a union is the min of mins),
    * then pairwise agreement rate ≈ Jaccard between the groups' content.
    * Never materializes the shingle sets; the shuffle carries one
    * 8·numHashes-byte sketch per (partition, group).
    *
    * Output: (group_a, group_b, est_jaccard), group_a < group_b. */
  def groupOverlap(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 32,
      portableHash: Boolean = false
  ): DataFrame = {
    val spark = docs.sparkSession
    val sigExpr: Column = sessionSig(spark, portableHash, shingleK, numHashes)
    val perDoc = docs
      .select(col(groupCol).as("grp"), TextAnalysis.tokensIn(spark)(col(textCol)).as("__toks"))
      .select(col("grp"), sigExpr.as("sig"))
    val perGroup =
      if (spark.catalog.functionExists("graft_minhash_union"))
        perDoc.groupBy("grp").agg(call_function("graft_minhash_union", col("sig")).as("usig"))
      else unionSigFallback(perDoc)
    val a = perGroup.select(col("grp").as("group_a"), col("usig").as("sig_a"))
    val b = perGroup.select(col("grp").as("group_b"), col("usig").as("sig_b"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")), v => v === 1))
          .cast("double") / lit(numHashes).cast("double")).as("est_jaccard"))
  }

  /** Portable union-signature fallback (positional min across member
    * signatures) for sessions without the graft_minhash_union aggregate.
    * Input: (grp, sig array<long>) → (grp, usig). Must agree exactly with
    * the native aggregate (spec-tested). */
  private[graft] def unionSigFallback(perDoc: DataFrame): DataFrame =
    perDoc.select(col("grp"), posexplode(col("sig")))
      .groupBy("grp", "pos").agg(min("col").as("h"))
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("h")))),
        s => s.getField("h")).as("usig"))

  // ------------------------------------------------------------------ Poly64
  // Portable polynomial-hash twins of the xxhash64 sketches. Same operator
  // shapes, but every fingerprint is recomputable in DuckDB HUGEINT SQL
  // (graft.plans.Poly64), so the whole family carries a hard oracle. The
  // xxhash64 variants above remain the avalanche-quality path; these trade
  // some bit mixing for cross-engine checkability.

  import graft.plans.Poly64

  /** ANSI-safe wrapping Poly64 base hash of a string column: the 64-bit
    * state rides as a (hi, lo) 32-bit pair so no Column op can overflow
    * (lo·MUL < 2^52), then reassembles via shift/or (bitwise, wrapping).
    * Bit-identical to [[Poly64.baseHash]] (spec-enforced). */
  def poly64Base(str: Column): Column = {
    val folded = aggregate(
      transform(filter(split(str, ""), ch => length(ch) > 0), ch => ascii(ch).cast("long")),
      struct(lit(Poly64.SeedHi).as("hi"), lit(Poly64.SeedLo).as("lo")),
      (acc, cp) => {
        val lo1 = acc.getField("lo") * Poly64.Mul + cp
        val hi1 = acc.getField("hi") * Poly64.Mul + shiftrightunsigned(lo1, 32)
        struct(hi1.bitwiseAND(lit(0xFFFFFFFFL)).as("hi"),
          lo1.bitwiseAND(lit(0xFFFFFFFFL)).as("lo"))
      })
    shiftleft(folded.getField("hi"), 32).bitwiseOR(folded.getField("lo"))
  }

  /** Wrapping h·a + b (mod 2^64) for a 64-bit Column `h` with a < 2^20:
    * the same 32-bit-split trick (hLo·a + bLo < 2^53 — overflow-free). */
  private[graft] def mulAdd64(h: Column, a: Column, b: Column): Column = {
    val mask = lit(0xFFFFFFFFL)
    val lo1 = h.bitwiseAND(mask) * a + b.bitwiseAND(mask)
    val hi1 = shiftrightunsigned(h, 32) * a + shiftrightunsigned(b, 32) +
      shiftrightunsigned(lo1, 32)
    shiftleft(hi1.bitwiseAND(mask), 32).bitwiseOR(lo1.bitwiseAND(mask))
  }

  /** Portable SimHash fingerprint as a signed long — HOF twin of the native
    * `graft_simhash64` expression. Token hashes are materialized into an
    * array FIRST (lambda variables bind once), then votes fold over them. */
  def simhash64(text: Column): Column = {
    val hashes = transform(array_distinct(TextAnalysis.tokens(text)), t => poly64Base(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          p => call_function("shiftrightunsigned", h, lit(63) - p).bitwiseAND(lit(1L))),
        (a, bit) => a + when(bit === 1L, 1).otherwise(-1))
    )
    aggregate(votes, lit(0L),
      (acc, v) => shiftleft(acc, 1).bitwiseOR(when(v > 0, lit(1L)).otherwise(lit(0L))))
  }

  /** Session-aware portable SimHash (native expression when registered). */
  def simhash64Of(s: org.apache.spark.sql.SparkSession): Column => Column =
    if (s.catalog.functionExists("graft_simhash64"))
      text => call_function("graft_simhash64", TextAnalysis.tokensIn(s)(text))
    else simhash64

  /** Portable MinHash signature (signed-min semantics) — HOF twin of the
    * native `graft_minhash_poly`. Per-shingle base hashes are materialized
    * once; the per-seed h = base·A_s + B_s values fold into running minima
    * via a (mins, seed-index) zip. */
  def minhashSignature64(sh: Column, numHashes: Int): Column = {
    val seeds = Poly64.seeds(numHashes)
    val as = lit(seeds.map(_._1))
    val bs = lit(seeds.map(_._2))
    val bases = transform(array_distinct(sh), x => poly64Base(x))
    aggregate(
      bases,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, base) => zip_with(
        acc,
        sequence(lit(0), lit(numHashes - 1)),
        (m, s) => least(m, mulAdd64(base, element_at(as, s + 1), element_at(bs, s + 1))))
    )
  }

  /** SimHash dedup groups over the portable long fingerprint (oracle-checked
    * sibling of [[simhashGroups]]). Output: (id, simhash long, group_id). */
  def simhashGroups64(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = docs.select(col(idCol), simhash64Of(docs.sparkSession)(col(textCol)).as("simhash"))
    fp.withColumn("group_id", min(col(idCol)).over(Window.partitionBy(col("simhash"))))
  }

  /** [[simhashNearDupFromFp]] on the portable LONG fingerprint: identical
    * pigeonhole block-candidate scheme, but blocks/popcounts are integer
    * bit ops on an 8-byte key instead of hex-string slices — smaller
    * shuffle rows AND a DuckDB-recomputable fingerprint. Radius =
    * nBlocks - 1 bits; 64 must divide evenly by nBlocks.
    *
    * ACCURACY (measure before adopting — [[simhashAccuracy]] /
    * q_simhash_recall / q_simhash_recall_fmt): a 64-bit unigram simhash
    * sees token SETS, and BOTH measured profiles condemn it as a
    * 3-gram-similarity surrogate on this corpus family:
    *
    *   - changed-token profile (r11): Hamming ≤ 3 caught 32% of exact-
    *     Jaccard-≥0.5 truth at ~1% precision (capped and uncapped alike)
    *     — one token edit flips many near-tied vote bits;
    *   - format-variant profile (r12, token-preserving whitespace twins
    *     at sf0.1): radius 0 UNCAPPED measured recall 0.84 at precision
    *     0.010 — the corpus carries ~488k equal-FINGERPRINT pairs of
    *     which only ~5k are 3-gram-true, because bag-of-words-equal but
    *     sequence-different docs collide on the token-set fingerprint.
    *     The capped default (maxBlockFreq=50) inverts the failure:
    *     precision 0.97 but recall 0.50, the cap pruning exactly the
    *     duplication-hot blocks (the [[minhashBucketStats]] story).
    *
    * The r11 theory "fingerprint equality is sound for format variants"
    * is therefore measured as WRONG whenever the dedup criterion is
    * shingle overlap: default to [[minhashLshDeduped]], which measured
    * P/R 1.0/1.0 on BOTH profiles. Fingerprint equality
    * ([[simhashGroups64]], [[graft.streaming.OnlineRefresh
    * .dedupStreamBySimhash]]) is a different CRITERION — bag-of-words
    * equality — safe only where that semantics is the actual target. */
  def simhashNearDup64(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      nBlocks: Int = 4, maxBlockFreq: Option[Int] = None): DataFrame = {
    require(nBlocks > 1 && 64 % nBlocks == 0, "nBlocks must divide 64")
    val width = 64 / nBlocks
    val blockMask = (1L << width) - 1
    // coalesce → non-nullable (null text ≡ empty-doc fingerprint 0): see
    // simhashNearDupFromFp — keeps pushdown from double-evaluating the
    // fingerprint lineage into scan-level isnotnull filters.
    val fp = coalesce(simhash64Of(docs.sparkSession)(col(textCol)), lit(0L))
    val blocked = docs
      .select(col(idCol).as("id"), fp.as("fp"))
      .select(col("id"), col("fp"),
        explode(array((0 until nBlocks).map(i =>
          struct(lit(i).as("bi"),
            shiftrightunsigned(col("fp"), 64 - width * (i + 1)).bitwiseAND(lit(blockMask)).as("bv"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      // one exchange reused by both self-join sides (see simhashNearDupFromFp)
      .repartition(col("bi"), col("bv"))
    val pruned = maxBlockFreq match {
      case Some(m) =>
        import org.apache.spark.sql.expressions.Window
        blocked
          .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("bi"), col("bv"))))
          .where(col("__df") <= m).drop("__df")
      case None => blocked
    }
    val a = pruned.select(col("id").as("id_a"), col("fp").as("fp_a"), col("bi"), col("bv"))
    val b = pruned.select(col("id").as("id_b"), col("fp").as("fp_b"), col("bi"), col("bv"))
    a.join(b.hint("merge"), Seq("bi", "bv"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .where(col("hamming") <= nBlocks - 1)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** INCREMENTAL dedup: clean a newly-landed shard against the STANDING
    * already-deduped corpus — the ingestion-time shape at 100 TB (per-day
    * shards land continuously; yesterday's corpus was already deduped, so
    * re-running corpus×corpus work per shard is the thing to avoid; the
    * fuzzy generalization of the reference's per-key overwrite-on-rewrite
    * ingest, load.py:139-148). Three stages, each the cross-corpus form
    * of a standing operator:
    *
    *   1. exact-vs-existing — drop incoming docs whose text digest occurs
    *      anywhere in `existing` (8-byte xxhash64 anti join; the existing
    *      side collapses to distinct digests with map-side partials);
    *   2. exact-within-shard — keep the min-id representative per digest
    *      (one window, the [[exactByDigest]] semantics);
    *   3. fuzzy-vs-existing — simhash64 block-candidate join of the
    *      survivors against the existing fingerprints, dropping incoming
    *      docs within Hamming ≤ nBlocks−1 of ANY existing doc (the
    *      [[simhashNearDup64]] machinery in cross-corpus form;
    *      `maxBlockFreq` caps hot blocks on the EXISTING side, where the
    *      frequency skew lives).
    *
    * Existing contributes only digests and fingerprints (8 B/row streams,
    * both rebuildable from a materialized fingerprint column at zero
    * cost); there is NO existing×existing work, and the shard-side cost
    * is a within-shard dedup's. Fuzzy pairs WITHIN the shard are
    * deliberately out of scope — compose with
    * [[simhashNearDup64Deduped]]/[[dropNearDuplicates]] over the shard
    * when that matters (a daily shard is usually small enough to pay it).
    *
    * Null-text docs carry the digest-of-null convention: if `existing`
    * has one, every incoming null-text doc drops in stage 1; otherwise
    * stage 2 keeps exactly one. Fingerprints coalesce null to 0 (the
    * empty-doc fingerprint, [[simhashNearDup64]]'s contract).
    *
    * Output: the surviving incoming rows, all columns intact. */
  def dedupAgainst(
      existing: DataFrame,
      incoming: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBlocks: Int = 4,
      maxBlockFreq: Option[Int] = Some(50)
  ): DataFrame = {
    require(nBlocks > 1 && 64 % nBlocks == 0, "nBlocks must divide 64")
    val width = 64 / nBlocks
    val blockMask = (1L << width) - 1
    val s = incoming.sparkSession
    val exDig = existing.select(xxhash64(col(textCol)).as("__dg")).distinct()
    val in1 = incoming.withColumn("__dg", xxhash64(col(textCol)))
      .join(exDig, Seq("__dg"), "left_anti")
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("__dg"))
    val in2 = in1.withColumn("__m", min(col(idCol)).over(wd))
      .where(col(idCol) === col("__m")).drop("__m", "__dg")
    def blocked(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"),
          coalesce(simhash64Of(s)(col(textCol)), lit(0L)).as("fp"))
        .select(col("id"), col("fp"),
          explode(array((0 until nBlocks).map(i =>
            struct(lit(i).as("bi"),
              shiftrightunsigned(col("fp"), 64 - width * (i + 1))
                .bitwiseAND(lit(blockMask)).as("bv"))): _*)).as("b"))
        .select(col("fp"), col("b.bi").as("bi"), col("b.bv").as("bv"), col("id"))
    val exB0 = blocked(existing)
    val exB = maxBlockFreq match {
      case Some(m) =>
        val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("bi"), col("bv"))
        exB0.withColumn("__df", count(lit(1)).over(wb)).where(col("__df") <= m).drop("__df")
      case None => exB0
    }
    val dropped = blocked(in2)
      .join(exB.select(col("fp").as("__fpe"), col("bi"), col("bv")), Seq("bi", "bv"))
      .where(bit_count(col("fp").bitwiseXOR(col("__fpe"))).cast("int") <= nBlocks - 1)
      .select(col("id").as(idCol)).distinct()
    in2.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[simhashNearDup64]] with the exact-dedup-FIRST ordering built in —
    * the simhash twin of [[ngramJaccardDeduped]], closing the same measured
    * scale corner (candidate blowup quadratic in the duplication factor;
    * SCALE.md ×3 probe: 15.2 s uncapped direct vs 1.48 s capped — and the
    * cap itself prunes the wrong things when duplication inflates block
    * frequencies). Output is PROVABLY identical to the direct form with
    * the same knobs:
    *
    *   - identical texts have identical fingerprints, hence identical
    *     (block index, block value) rows, so a block value's corpus
    *     frequency = Σ group sizes over representatives carrying it — the
    *     cap window here sums group sizes, pruning exactly what the direct
    *     form's row count prunes;
    *   - a cross-group member pair shares its representatives' fingerprints:
    *     candidate-hood (≥1 surviving shared block) and the XOR popcount
    *     both transfer unchanged;
    *   - a within-group pair has hamming 0 and exists iff ANY of the
    *     group's blocks survives the cap (the blocks are common to both
    *     members), reproduced by one semi-join against the pruned blocks.
    *
    * Exact groups keyed by xxhash64(text), same collision trade as
    * [[exactByDigest]]. Radius = nBlocks − 1 bits, as in the direct form. */
  def simhashNearDup64Deduped(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", nBlocks: Int = 4,
      maxBlockFreq: Option[Int] = None): DataFrame = {
    require(nBlocks > 1 && 64 % nBlocks == 0, "nBlocks must divide 64")
    import org.apache.spark.sql.expressions.Window
    val width = 64 / nBlocks
    val blockMask = (1L << width) - 1
    val mapping = exactGroupMapping(docs, textCol, idCol)
    val reps = mapping.where(col("__m_id") === col("__rep"))
      .select(col("__rep").as(idCol), col("__gsz"))
    val repDocs = docs.join(reps, Seq(idCol))
    val fp = coalesce(simhash64Of(docs.sparkSession)(col(textCol)), lit(0L))
    val blocked = repDocs
      .select(col(idCol).as("id"), fp.as("fp"), col("__gsz"))
      .select(col("id"), col("fp"), col("__gsz"),
        explode(array((0 until nBlocks).map(i =>
          struct(lit(i).as("bi"),
            shiftrightunsigned(col("fp"), 64 - width * (i + 1)).bitwiseAND(lit(blockMask)).as("bv"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("__gsz"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      .repartition(col("bi"), col("bv"))
    val pruned = maxBlockFreq match {
      case Some(m) =>
        // duplication-weighted frequency: Σ group sizes = the direct form's
        // per-(bi,bv) row count; window reuses the repartition distribution
        blocked
          .withColumn("__df", sum(col("__gsz")).over(Window.partitionBy(col("bi"), col("bv"))))
          .where(col("__df") <= m).drop("__df")
      case None => blocked
    }
    val a = pruned.select(col("id").as("id_a"), col("fp").as("fp_a"), col("bi"), col("bv"))
    val b = pruned.select(col("id").as("id_b"), col("fp").as("fp_b"), col("bi"), col("bv"))
    val repPairs = a.join(b.hint("merge"), Seq("bi", "bv"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .where(col("hamming") <= nBlocks - 1)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
    val memb = mapping.select(col("__m_id"), col("__rep"))
    val cross = repPairs
      .join(memb.select(col("__rep").as("id_a"), col("__m_id").as("ia")), Seq("id_a"))
      .join(memb.select(col("__rep").as("id_b"), col("__m_id").as("ib")), Seq("id_b"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    // a within-group pair exists iff any of the group's (common) blocks
    // survived the cap; its hamming is 0 by fingerprint identity
    val surv = pruned.select(col("id")).distinct()
    val within = memb.as("p")
      .join(memb.as("q"),
        col("p.__rep") === col("q.__rep") && col("p.__m_id") < col("q.__m_id"))
      .select(col("p.__rep").as("id"), col("p.__m_id").as("id_a"), col("q.__m_id").as("id_b"))
      .join(surv, Seq("id"), "left_semi")
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share at least
    * one n-gram: explode distinct n-grams, self-join on an 8-byte n-gram
    * digest, count intersections, derive |A∪B| = |A|+|B|−|A∩B|.
    *
    * The self-join keys on `xxhash64(gram)` rather than the gram string:
    * the shuffle carries 16 B/row instead of the text, and the join
    * compares longs — measured ~25% faster at sf0.1 and the dominant win
    * at 100 TB where gram strings dwarf ids. A digest collision
    * (~|grams|²/2⁶⁵) could overcount one intersection; acceptable for
    * dedup semantics.
    *
    * At scale the join is bounded by n-gram-frequency skew: `maxNgramFreq`
    * drops stop-n-grams (present in too many docs) before the self-join —
    * standard candidate-pair pruning that keeps the join near-linear.
    */
  /** Explode a `__toks` frame into one row per DISTINCT word-n-gram digest
    * (passthrough columns kept). Native one-pass path (`graft_grams`:
    * builds each shingle once, dedups 8-byte digests) when the session
    * carries GraftExtensions; the HOF chain (shinglesOf → array_distinct →
    * xxhash64) otherwise — digest values are identical (XXH64 seed 42 both
    * ways, Poly64Spec-pinned). */
  private def explodedGrams(withToks: DataFrame, n: Int): DataFrame = {
    val spark = withToks.sparkSession
    if (spark.catalog.functionExists("graft_grams"))
      withToks
        .select(col("*"), explode(call_function("graft_grams", col("__toks"), lit(n))).as("gram"))
        .drop("__toks")
    else withToks
      .select(col("*"), explode(array_distinct(shinglesOf(col("__toks"), n))).as("gram"))
      .drop("__toks")
      .withColumn("gram", xxhash64(col("gram")))
  }

  /** One (id, gram-digest) row per distinct word n-gram of each document. */
  private def gramDigestsOf(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    explodedGrams(
      docs.select(col(idCol).as("id"),
        TextAnalysis.tokensIn(docs.sparkSession)(col(textCol)).as("__toks")), n)

  /** Per-document n-gram contamination of `docs` against a reference corpus
    * (benchmark decontamination): the fraction of each doc's distinct
    * n-gram digests that occur ANYWHERE in `reference`. Scale shape: one
    * left-semi join on 8-byte gram digests (the reference side collapses to
    * distinct digests with map-side partial aggregation first), per-doc
    * counts via partial-agg groupBys — no row explosion anywhere. Output:
    * (idCol, n_grams, n_hit, contamination). */
  def contamination(
      docs: DataFrame,
      reference: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3
  ): DataFrame = {
    // NULL text must still appear in the report: tokensIn(null) propagates
    // null through the gram array and explode() would silently drop the
    // doc — and a doc ABSENT from a decontamination report reads as "not
    // contaminated" downstream. Coalescing to '' gives it the empty-token
    // whole-list shingle like any other short doc (n_grams=1). On the
    // reference side a null text contributes no grams, so those rows are
    // filtered instead of coalesced — '' there would otherwise mark every
    // empty train doc as contaminated. Both mirrored in the DuckDB oracle.
    contaminationAgainstGrams(docs, referenceGrams(reference, textCol, n),
      textCol, idCol, n)
  }

  /** The reference side's DISTINCT gram-digest set — split out of
    * [[contamination]] so a caller scoring MANY batches against one
    * static reference (the decontamination stream) derives and caches it
    * once instead of re-tokenizing the reference per batch. The
    * reference needs only a text column — no id projection required. */
  private[graft] def referenceGrams(reference: DataFrame, textCol: String,
      n: Int): DataFrame =
    explodedGrams(
      reference.where(col(textCol).isNotNull)
        .select(TextAnalysis.tokensIn(reference.sparkSession)(col(textCol)).as("__toks")), n)
      .distinct()

  /** The docs-side half of [[contamination]] over an already-derived
    * (and possibly cached) [[referenceGrams]] frame. */
  private[graft] def contaminationAgainstGrams(docs: DataFrame,
      refGrams: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val ga = gramDigestsOf(
      docs.withColumn(textCol, coalesce(col(textCol), lit(""))), textCol, idCol, n)
    // ONE pass over the exploded grams: refGrams is distinct, so the left
    // join cannot fan out, and sizes + hits fall out of the same aggregate
    // (two separate aggregations over `ga` would evaluate the expensive
    // explosion subtree twice and add a third shuffle to re-join them)
    ga.join(refGrams.withColumn("__hit", lit(1)), Seq("gram"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .select(col("id").as(idCol), col("n_grams"), col("n_hit"),
        // n_grams >= 1 always: short docs yield one whole-list shingle
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 6)
          .as("contamination"))
  }

  /** [[contamination]] with a LITERAL-BLOOM prefilter on the corpus gram
    * stream — identical output (the exact semi-join still confirms every
    * hit, so bloom false positives cannot leak into `n_hit`; misses only
    * skip grams that cannot match), different 100 TB shape: the corpus
    * side tests each gram digest against a broadcast-free bit-array
    * LITERAL inside whole-stage codegen, so only true hits plus the FP
    * rate ever reach the reference join's shuffle/probe — the runtime-
    * filter pattern, spelled portably. The trade vs the one-pass direct
    * form: one extra tokenize pass (n_grams is re-counted in its own
    * id-keyed partial aggregate — no wide shuffle), bought back by the
    * gram stream never carrying non-matching grams into the join; the
    * direct form must present EVERY corpus gram to the probe.
    *
    * Geometry: m = next power of two ≥ |ref grams|·bitsPerGram (k=2
    * probes: the digest's low bits and a re-avalanched xxhash64 of it —
    * FP rate ≈ (2/bitsPerGram·ln2)² ≈ 0.8% at the default 16). The bit
    * array lives in the PLAN as an array<long> literal (|ref|·2 bytes at
    * the default — benchmark-sized references by contract, the same bound
    * the reference-side collect of [[graft.ops.Similarity]] centroids
    * rides); the guard caps it at 16 MiB. Probe positions are computed by
    * the same Spark expressions on both the build collect and the test
    * side, so there is no cross-implementation hash to keep in sync. */
  def contaminationBloom(
      docs: DataFrame,
      reference: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      bitsPerGram: Int = 16
  ): DataFrame = {
    require(bitsPerGram >= 2, s"bitsPerGram must be >= 2, got $bitsPerGram")
    val ga = gramDigestsOf(
      docs.withColumn(textCol, coalesce(col(textCol), lit(""))), textCol, idCol, n)
    val refGrams = explodedGrams(
      reference.where(col(textCol).isNotNull)
        .select(TextAnalysis.tokensIn(reference.sparkSession)(col(textCol)).as("__toks")), n)
      .distinct()
    // The size guard fires BEFORE any driver-side materialization: a
    // count-only action sizes the gram set first, so an oversized
    // reference fails with the sharding guidance below instead of OOMing
    // the driver inside collect() (the guard used to bound only the bit
    // array, after the collect had already happened). The extra action
    // re-evaluates the benchmark-sized reference lineage once more — the
    // cheap side by contract — and, deliberately, refGrams is NOT
    // persisted: a persist here would substitute an InMemoryRelation
    // into every OTHER query sharing the reference-gram lineage via the
    // session cache (the direct contamination's pinned plan included).
    val nRef = refGrams.count()
    var mBits = 64L
    while (mBits < nRef * bitsPerGram) mBits <<= 1
    require(mBits <= (1L << 27),
      s"bloom of $mBits bits exceeds the 16 MiB plan-literal bound; " +
        "hash-partition the reference GRAM set into disjoint shards and sum " +
        "per-shard n_hit (disjointness makes the counts exactly additive)")
    // ONE collect action gathers each gram with its second hash
    // pre-computed by the SAME Spark xxhash64 the test side evaluates.
    val collected = refGrams
      .select(col("gram"), xxhash64(col("gram")).as("__h2"))
      .collect()
    val mask = lit(mBits - 1)
    def p1(g: Column) = g.bitwiseAND(mask)
    def p2(g: Column) = xxhash64(g).bitwiseAND(mask)
    val bits = new Array[Long]((mBits / 64).toInt)
    collected.foreach { r =>
      Seq(r.getLong(0) & (mBits - 1), r.getLong(1) & (mBits - 1)).foreach(p =>
        bits((p >>> 6).toInt) |= (1L << (p & 63).toInt))
    }
    val bitsLit = lit(bits)
    def testBit(pos: Column): Column =
      call_function("shiftrightunsigned",
        element_at(bitsLit, shiftrightunsigned(pos, 6).cast("int") + 1),
        pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    val maybe = testBit(p1(col("gram"))) && testBit(p2(col("gram")))
    val counts = ga.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val hits = ga.where(maybe)
      .join(refGrams, Seq("gram"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hit"))
    counts.join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_grams").cast("double"), 6).as("contamination"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): score
    * every `raw` document by the log-likelihood ratio of its n-grams under
    * the `target` corpus vs the raw pool itself — the standard "select raw
    * web data that looks like the high-quality target" step. Uses document
    * frequencies of distinct word n-grams (the same gram machinery as
    * [[contamination]]) with add-1 smoothing over the union vocabulary V:
    *
    *   llr(doc) = Σ_{g ∈ grams(doc)} ln( ((df_t(g)+1)·(Nq+V)) /
    *                                     ((df_q(g)+1)·(Nt+V)) )
    *
    * Cross-engine determinism: the per-gram log-ratio is quantized to an
    * integer (round(ln·1000) — "milli-nats") BEFORE the per-doc sum, so the
    * aggregation is exact integer arithmetic in any order; the ratio inside
    * ln is one division of two pinned double products of exact integers.
    * (ln itself is the one transcendental — a cross-engine ulp flip exactly
    * on a 0.0005 quantization boundary is the ~1e-13-per-gram residual risk
    * the fixed-point form reduces it to.)
    *
    * Scale shape: one aggregate over tagged gram streams (map-side partial
    * sums), a 3-scalar broadcast, the per-gram score table joined back on
    * 8-byte digests, one per-doc sum. Nothing quadratic, no driver data
    * paths. The gram stream and score table are persisted — both feed two
    * consumers. NULL raw text scores like an empty doc (the
    * [[contamination]] convention: absent-from-report reads as a decision).
    *
    * Output: (idCol, n_grams, llr) for every raw doc; select by llr rank. */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val rawGrams = gramDigestsOf(
      raw.withColumn(textCol, coalesce(col(textCol), lit(""))), textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtGrams = explodedGrams(
      target.where(col(textCol).isNotNull)
        .select(TextAnalysis.tokensIn(target.sparkSession)(col(textCol)).as("__toks")), n)
    val perGram = rawGrams.select(col("gram"), lit(0L).as("__t"), lit(1L).as("__q"))
      .unionByName(tgtGrams.select(col("gram"), lit(1L).as("__t"), lit(0L).as("__q")))
      .groupBy(col("gram")).agg(sum(col("__t")).as("ct"), sum(col("__q")).as("cq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = perGram.agg(sum(col("ct")).as("nt"), sum(col("cq")).as("nq"),
      count(lit(1)).as("v"))
    val milli = perGram.crossJoin(broadcast(tot)).select(col("gram"),
      round(log((col("ct") + 1).cast("double") * (col("nq") + col("v")).cast("double")
          / ((col("cq") + 1).cast("double") * (col("nt") + col("v")).cast("double")))
        * 1000, 0).cast("long").as("__milli"))
    rawGrams.join(milli, Seq("gram"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__milli")).as("__ms"))
      .select(col("id").as(idCol), col("n_grams"),
        (col("__ms").cast("double") / 1000.0).as("llr"))
  }

  /** Connected components over an undirected pair graph — the step that
    * turns near-dup PAIRS into dedup CLUSTERS. Min-label propagation: every
    * node starts labeled with its own id; each round a node adopts the
    * minimum of its own and its neighbors' labels; at fixpoint every node
    * carries the smallest id reachable from it (the cluster id).
    *
    * Scale shape: the (symmetrized, distinct) edge list is computed once,
    * pre-partitioned on the per-round join key, and persisted — every round
    * reuses that layout, so only the labels side shuffles. A round is ONE
    * Spark action: the propagation (edges⋈labels → union with the old
    * labels → min per node) materializes through checkpoint, and the
    * convergence witness (count of labels that strictly decreased — labels
    * are monotone non-increasing, so zero changes IS the fixpoint) rides
    * the same job as a [[org.apache.spark.sql.Observation]] metric rather
    * than a second collect. Labels are checkpointed per round because
    * iterative lineage otherwise grows a plan per round and re-executes the
    * whole history: reliable `checkpoint()` when the session has a
    * checkpoint dir (`spark.sparkContext.setCheckpointDir` — survives
    * executor loss, the cluster-grade path), `localCheckpoint()` otherwise
    * (fastest, but pins executors; fine on local mode).
    * Rounds needed = graph diameter; near-dup graphs are clique-ish
    * (diameter 2-4), and `maxIter` bounds the pathological chain — on
    * exhaustion without convergence a warning is logged (silent under-dedup
    * is hard to diagnose downstream). At extreme scale swap in Hash-to-Min
    * (Rastogi et al. 2013 — propagate neighbor SETS, O(log d) rounds) —
    * same driver loop, heavier rounds; min-label is the right default.
    *
    * Small-graph path — the broadcast-join analog for iterative graphs: the
    * near-dup pair graph is SPARSE relative to the corpus (edges exist only
    * between near-duplicates), so even a 100 TB corpus commonly yields a
    * pair list that fits on the driver. When the (persisted, so counted for
    * free relative to the passes the loop would make anyway) edge count is
    * ≤ `driverEdgeCap`, the edges are collected and resolved with a
    * path-compressed union-find in milliseconds — the distributed loop's
    * per-round job overhead (join + agg + checkpoint × diameter rounds)
    * dwarfs the data at this size, exactly like shuffling a 1 KB dim table
    * instead of broadcasting it. Above the cap the distributed min-label
    * loop runs unchanged. Both paths produce identical minimal labels
    * (differential-tested); set `driverEdgeCap = 0` to force the loop.
    * Default 4M edges: the collected Row[] is transient (~100-200 MB peak
    * during the collect), and the union-find itself is a primitive-long
    * open-addressing table (~16 B/slot at ≤50% load, zero boxing — ≤8M
    * nodes ≈ 256 MB). Well inside a normally-sized driver; size the cap
    * down if the driver is shared and tight.
    *
    * Output: (id long, cluster_id long), one row per node WITH an edge —
    * singletons are the caller's join-back (see [[neardupClusters]]). */
  def connectedComponents(pairs: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 20,
      driverEdgeCap: Long = 4000000L): DataFrame = {
    val spark = pairs.sparkSession
    val fwd0 = pairs
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    if (driverEdgeCap > 0) {
      val fwd = fwd0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = fwd.count() // materializes the cache either path reuses
      if (n <= driverEdgeCap) {
        val out = driverUnionFind(fwd)
        fwd.unpersist()
        return out
      }
      // cache reused by the loop's symmetrize+distinct; the loop's result is
      // checkpoint-materialized eagerly, so the cache can drop right after
      val out = ccLoop(fwd, maxIter)
      fwd.unpersist()
      return out
    }
    ccLoop(fwd0, maxIter)
  }

  /** Path-compressed union-find over a driver-collected edge list; roots are
    * kept minimal by always attaching the larger root under the smaller, so
    * `find(x)` IS the min-label cluster id. Result returns to the cluster
    * via parallelize (not a LocalRelation — keeps the driver plan small).
    *
    * The parent map is a primitive-long open-addressing hash table
    * ([[LongLongMap]] — ~16 B per slot at ≤50% load factor, zero boxing),
    * NOT a boxed java.util.HashMap (~40-60 B/entry with Long boxes +
    * node overhead): at the 4M-edge default cap the difference is ~130 MB
    * vs ~400+ MB of driver heap. */
  private def driverUnionFind(fwd: DataFrame): DataFrame = {
    val spark = fwd.sparkSession
    val edges = fwd.collect()
    // ≤2 distinct nodes per edge; the table grows to the next power of two
    // keeping load ≤0.5, so lookups stay a short linear probe
    val parent = new LongLongMap(math.max(16, edges.length * 2))
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val nx = parent(c); parent.put(c, r); c = nx }
      r
    }
    edges.foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      if (!parent.contains(a)) parent.put(a, a)
      if (!parent.contains(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
    }
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size)
    parent.foreachKey(id => rows += org.apache.spark.sql.Row(id, find(id)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.LongType, false)))
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, rows.size / 50000 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, parts), schema)
  }

  /** Minimal primitive long→long open-addressing map (linear probing,
    * power-of-two capacity, ≤50% load) for the driver union-find hot path.
    * Keys are doc ids; the empty slot sentinel is Long.MinValue, which is
    * not a valid parquet-sourced id in practice — asserted on put. */
  private[graft] final class LongLongMap(expected: Int) {
    private val Empty = Long.MinValue
    private var cap = java.lang.Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
    private var keys = Array.fill[Long](cap)(Empty)
    private var vals = new Array[Long](cap)
    private var n = 0
    def size: Int = n
    private def slot(k: Long): Int = {
      // finalizer from splitmix64 — spreads sequential ids across the table
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      var i = (h & (cap - 1)).toInt
      while (keys(i) != Empty && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    def contains(k: Long): Boolean = keys(slot(k)) != Empty
    /** Value for `k`; `k` itself when absent (the union-find's identity
      * default — callers always put before structural reads). */
    def apply(k: Long): Long = {
      val i = slot(k)
      if (keys(i) == Empty) k else vals(i)
    }
    def put(k: Long, v: Long): Unit = {
      require(k != Empty, "Long.MinValue is the empty-slot sentinel")
      val i = slot(k)
      if (keys(i) == Empty) {
        keys(i) = k; vals(i) = v; n += 1
        if (n * 2 > cap) grow()
      } else vals(i) = v
    }
    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < cap) { if (keys(i) != Empty) f(keys(i)); i += 1 }
    }
    private def grow(): Unit = {
      val (ok, ov) = (keys, vals)
      cap <<= 1
      keys = Array.fill[Long](cap)(Empty)
      vals = new Array[Long](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Empty) { val j = slot(ok(i)); keys(j) = ok(i); vals(j) = ov(i) }
        i += 1
      }
    }
  }

  /** The distributed min-label loop (see [[connectedComponents]] scaladoc). */
  private def ccLoop(fwd: DataFrame, maxIter: Int): DataFrame = {
    val spark = fwd.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = materialize(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster_id")))
    var done = labels.isEmpty // empty pair set -> empty result, no rounds
    var i = 0
    while (i < maxIter && !done) {
      // neighbor labels propagate across edges; unioning the old labels in
      // lets one min-aggregate produce the new label AND keep the old one
      // (max(own) — exactly one self row per id) for the change flag
      val nbr = edges
        .join(labels.select(col("id").as("dst"), col("cluster_id").as("dl")), Seq("dst"))
        .select(col("src").as("id"), col("dl").as("lbl"), lit(null).cast("long").as("own"))
      val merged = labels
        .select(col("id"), col("cluster_id").as("lbl"), col("cluster_id").as("own"))
        .unionByName(nbr)
        .groupBy("id")
        .agg(min(col("lbl")).as("cluster_id"), max(col("own")).as("own"))
      // pointer doubling: follow the label ONE more hop (label := label's
      // label). Propagation alone moves the min ONE edge per round —
      // O(diameter) rounds — and a capped pair graph grows long thin
      // chains precisely because its hub edges were pruned (measured: the
      // sf0.1 capped graph exceeds 20 rounds and under-converges).
      // Compression doubles reach per round → O(log diameter). Safe
      // because a label is always the id of a node in the same component,
      // labels only decrease, and the parent side is unique per id (an
      // inner 1:1 join — every label IS a node id, so nothing drops).
      val parent = merged.select(col("id").as("cluster_id"), col("cluster_id").as("__pl"))
      val compressed = merged.join(parent, Seq("cluster_id"))
        .select(col("id"), col("__pl").as("cluster_id"), col("own"))
      val obs = new org.apache.spark.sql.Observation(s"graft_cc_$i")
      val next = compressed
        .observe(obs, coalesce(sum(when(col("cluster_id") < col("own"), 1L)
          .otherwise(0L)), lit(0L)).as("changed"))
        .select(col("id"), col("cluster_id"))
      val prev = labels
      labels = materialize(next) // the one action; obs resolves with it
      // the previous round's checkpoint blocks are dead the moment the
      // next round is materialized — release them NOW instead of leaving
      // one round's blocks per iteration to the ContextCleaner's GC-paced
      // sweep (a long-lived session runs many loops between GCs; the
      // storage pool should stay ∝ one round, not ∝ rounds)
      org.apache.spark.sql.graft.GraftStreamBridge.unpersistCheckpoint(prev)
      done = obs.get("changed").asInstanceOf[Long] == 0L
      i += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge in $maxIter rounds; " +
          "some cluster ids may be non-minimal (under-dedup) — raise maxIter")
    else
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"connectedComponents converged in $i rounds") // ≈ log2(diameter)
    edges.unpersist()
    labels
  }

  /** Near-dup cluster assignment for EVERY document: SimHash Hamming pairs
    * ([[simhashNearDup64]], portable fingerprint) → [[connectedComponents]]
    * → join back so docs with no near-dup keep themselves as a singleton
    * cluster. Output: (idCol, cluster_id).
    *
    * `maxBlockFreq` defaults to CAPPED (50): the candidate join's cost is
    * Σ (per-block-value frequency)², and the repo's ×10 duplication probe
    * measured 102.6 s uncapped vs 1.6 s capped on the same corpus
    * (SCALE.md) — at real scale the cap is mandatory, so the safe form is
    * the default and exact-radius semantics are the explicit opt-in
    * (`maxBlockFreq = None`). The trade is recall on block values hotter
    * than the cap — precisely the clusters exact dedup or a tighter
    * fingerprint should collapse first. */
  def neardupClusters(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      nBlocks: Int = 4, maxBlockFreq: Option[Int] = Some(50), maxIter: Int = 20,
      driverEdgeCap: Long = 4000000L): DataFrame = {
    val pairs = simhashNearDup64(docs, textCol, idCol, nBlocks, maxBlockFreq)
    val cc = connectedComponents(pairs, "id_a", "id_b", maxIter, driverEdgeCap)
    docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }

  /** The actual DROP step of fuzzy dedup: keep exactly one representative
    * per near-dup cluster — the best by `scoreCol`, ties to the lowest id
    * (max_by on a (score, −id) struct: deterministic on any engine). The
    * generalization of the reference's latest-per-key overwrite
    * (load.py:139-148) from exact keys to fuzzy clusters. Returns the
    * surviving docs with their original columns.
    *
    * The input is persisted for the call's lifetime (unless the caller
    * already cached it): the docs feed THREE passes — fingerprinting (via
    * [[neardupClusters]], whose CC loop runs eagerly right here), the
    * keep-best score join, and the final semi-join — and without a cache
    * each pass re-derives the caller's whole upstream lineage (measured ~4×
    * recompute on the composed pipeline). The ContextCleaner reclaims the
    * blocks once the result frame is unreachable.
    *
    * Like [[neardupClusters]], `maxBlockFreq` defaults to the scale-safe
    * cap (50): the ×10 probe measured 114.6 s uncapped vs 1.8 s capped
    * through this full keep-best path (SCALE.md). Pass `None` for the
    * exact-radius (unbounded candidate join) semantics. */
  def dropNearDuplicates(docs: DataFrame, scoreCol: String, textCol: String = "text",
      idCol: String = "doc_id", nBlocks: Int = 4, maxBlockFreq: Option[Int] = Some(50),
      maxIter: Int = 20): DataFrame = {
    val cached =
      if (docs.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docs
    val clusters = neardupClusters(cached, textCol, idCol, nBlocks, maxBlockFreq, maxIter)
    val keep = cached.select(col(idCol), col(scoreCol))
      .join(clusters, Seq(idCol))
      .groupBy(col("cluster_id"))
      .agg(max_by(col(idCol), struct(col(scoreCol), (-col(idCol)).as("nid"))).as(idCol))
    cached.join(keep.select(idCol), Seq(idCol), "left_semi")
  }

  /** `maxNgramFreq` is an ABSOLUTE document-frequency cap — a per-corpus
    * constant. The ×10 probe measured its failure mode: duplication lifts
    * every gram's df past the cap and the candidate set collapses to zero
    * (SCALE.md). `maxNgramFreqFraction` is the sf-invariant form: the cap
    * is ceil(fraction · corpus size), derived lazily in-plan from a 1-row
    * count broadcast, so the same pipeline code prunes the same RELATIVE
    * stop-gram mass at any scale. Absolute wins if both are set.
    *
    * WARNING — ordering matters more than either cap: on a corpus with
    * exact duplicates, the candidate join's Σdf² term grows with the
    * SQUARE of the duplication factor, and neither cap fixes that
    * (SCALE.md's cap-trade triangle measured relative-cap-alone at ×10
    * duplication = 319 s vs exact-dedup-then-cap = 3.2 s, full recall).
    * Call [[ngramJaccardDeduped]] — the exact-dedup-FIRST composition with
    * provably identical output — unless the corpus is already exact-deduped. */
  def ngramJaccard(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5,
      maxNgramFreq: Option[Int] = None,
      maxNgramFreqFraction: Option[Double] = None
  ): DataFrame = {
    // Set sizes are joined back onto the (doc_a, doc_b) pair counts from a
    // tiny per-doc aggregate (auto-broadcast). Three rejected variants, all
    // measured at sf0.1: carrying n_grams through the exploded self-join
    // (wider shuffle rows + heavier pair-aggregate: 2.5× slower);
    // collect_list-per-gram pair explosion (single shuffle but materializes
    // every candidate pair pre-filter: ~2× slower); and computing sizes as
    // a zero-shuffle size(array_distinct(...)) projection — fewer exchanges
    // on paper, but materializing the gram array into a column inflates the
    // self-join side's size estimate, the pair join loses its
    // auto-broadcast, and the whole query runs ~2× slower.
    val grams = gramDigestsOf(docs, textCol, idCol, n)
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val pruned = (maxNgramFreq, maxNgramFreqFraction) match {
      case (Some(m), _) =>
        val freq = grams.groupBy("gram").agg(count(lit(1)).as("df")).where(col("df") <= m)
        grams.join(freq.select("gram"), Seq("gram"))
      case (None, Some(f)) =>
        // cap = ceil(f · nDocs), derived in-plan: the 1-row count broadcasts
        // onto the df filter, so the prune threshold scales with the corpus
        val nDocs = docs.agg(count(lit(1)).as("__nd"))
        val freq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .where(col("df") <= ceil(lit(f) * col("__nd").cast("double")))
        grams.join(freq.select("gram"), Seq("gram"))
      case _ => grams
    }
    val inter = pruned.as("x")
      .join(pruned.as("y"), col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("n_grams", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("n_grams", "nb"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact-duplicate group mapping under the min-id representative — the
    * shared head of every exact-dedup-first composition
    * ([[ngramJaccardDeduped]], [[simhashNearDup64Deduped]],
    * [[minhashLshDeduped]]): ONE digest window pass producing
    * (__m_id, __rep = min id sharing the text digest, __gsz = group size).
    * Groups keyed by xxhash64(text), the [[exactByDigest]] collision
    * trade. */
  private def exactGroupMapping(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("__dg"))
    docs
      .select(xxhash64(col(textCol)).as("__dg"), col(idCol).as("__m_id"))
      .select(col("__m_id"),
        min(col("__m_id")).over(wg).as("__rep"),
        count(lit(1)).over(wg).as("__gsz"))
  }

  /** Shared plumbing of the exact-dedup-first pairwise compositions
    * ([[ngramJaccardDeduped]], [[ngramContainmentDeduped]]): collapse
    * identical texts under a min-id representative (one digest window),
    * gram the representatives once, prune by DUPLICATION-WEIGHTED df (so
    * both cap knobs keep the direct forms' semantics), and size-join the
    * representative-pair intersection counts. Returns
    * (memb(__m_id, __rep), sizes(id, n_grams), surviving(id, __s),
    * interSized(ra, rb, inter, na, nb)). */
  private def dedupedPairCore(
      docs: DataFrame, textCol: String, idCol: String, n: Int,
      maxNgramFreq: Option[Int], maxNgramFreqFraction: Option[Double]
  ): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // one digest shuffle: member -> (representative = min id, group size)
    val mapping = exactGroupMapping(docs, textCol, idCol)
    val reps = mapping.where(col("__m_id") === col("__rep"))
      .select(col("__rep").as("id"), col("__gsz"))
    val repDocs = docs.join(reps.select(col("id").as(idCol)), Seq(idCol), "left_semi")
    val grams = gramDigestsOf(repDocs, textCol, idCol, n)
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    // corpus df (duplication-weighted) — identical to the direct form's df
    val dfW = grams.join(reps, Seq("id"))
      .groupBy("gram").agg(sum(col("__gsz")).as("df"))
    val pruned = (maxNgramFreq, maxNgramFreqFraction) match {
      case (Some(m), _) =>
        grams.join(dfW.where(col("df") <= m).select("gram"), Seq("gram"))
      case (None, Some(f)) =>
        val nDocs = docs.agg(count(lit(1)).as("__nd"))
        grams.join(
          dfW.crossJoin(broadcast(nDocs))
            .where(col("df") <= ceil(lit(f) * col("__nd").cast("double")))
            .select("gram"), Seq("gram"))
      case _ => grams
    }
    val surviving = pruned.groupBy("id").agg(count(lit(1)).as("__s"))
    val inter = pruned.as("x")
      .join(pruned.as("y"), col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("ra"), col("y.id").as("rb"))
      .agg(count(lit(1)).as("inter"))
    val interSized = inter
      .join(sizes.withColumnRenamed("id", "ra").withColumnRenamed("n_grams", "na"), Seq("ra"))
      .join(sizes.withColumnRenamed("id", "rb").withColumnRenamed("n_grams", "nb"), Seq("rb"))
    (mapping.select(col("__m_id"), col("__rep")), sizes, surviving, interSized)
  }

  /** [[ngramJaccard]] with the exact-dedup-FIRST ordering built in — the
    * composed entry point SCALE.md's cap-trade triangle measured as the
    * only defaultable answer to duplicated corpora (relative cap alone at
    * ×10 duplication: 319 s; exact dedup then cap: 3.2 s, full recall).
    * Output is PROVABLY identical to calling [[ngramJaccard]] directly with
    * the same knobs (and q_ngram_jaccard_deduped pins it against the same
    * DuckDB oracle), because every quantity the direct form computes is
    * recoverable from the collapsed corpus:
    *
    *   - identical texts have identical gram sets, so a gram's corpus df =
    *     Σ over exact-dup groups of (group size × [gram ∈ representative]) —
    *     the df aggregate here weights each representative's grams by group
    *     size, making both cap knobs prune the SAME grams the direct form
    *     prunes;
    *   - a cross-group member pair (x, y) has the same (inter, na, nb) as
    *     its representative pair, so rep-level pairs expand to member pairs
    *     carrying the rep jaccard unchanged;
    *   - a within-group pair shares ALL grams, of which only the surviving
    *     `s` of `g` meet in the candidate join: jaccard = s/(2g − s)
    *     (= 1.0 uncapped), and the pair exists only if s ≥ 1 — both
    *     reproduced from two per-rep counts, no pairwise work.
    *
    * The candidate join's Σdf² cost thus shrinks by the SQUARE of the
    * duplication factor while the pairwise stage sees each distinct text
    * once; the expansion joins are linear in output size. Exact groups are
    * keyed by xxhash64(text) — same collision trade as [[exactByDigest]]. */
  def ngramJaccardDeduped(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5,
      maxNgramFreq: Option[Int] = None,
      maxNgramFreqFraction: Option[Double] = None
  ): DataFrame = {
    val (memb, sizes, surviving, interSized) =
      dedupedPairCore(docs, textCol, idCol, n, maxNgramFreq, maxNgramFreqFraction)
    val repPairs = interSized
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("ra", "rb", "jaccard")
    // rep pair -> all member pairs; groups are disjoint and ra < rb, so
    // least/greatest restores the doc_a < doc_b contract
    val cross = repPairs
      .join(memb.select(col("__rep").as("ra"), col("__m_id").as("ia")), Seq("ra"))
      .join(memb.select(col("__rep").as("rb"), col("__m_id").as("ib")), Seq("rb"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("jaccard"))
    // within-group pairs: jaccard = s/(2g − s); inner joins drop 0-gram and
    // all-grams-pruned groups, exactly the pairs the direct form never forms
    val within = memb.as("p")
      .join(memb.as("q"),
        col("p.__rep") === col("q.__rep") && col("p.__m_id") < col("q.__m_id"))
      .select(col("p.__rep").as("id"), col("p.__m_id").as("doc_a"), col("q.__m_id").as("doc_b"))
      .join(sizes, Seq("id")).join(surviving, Seq("id"))
      .withColumn("jaccard", round(
        col("__s").cast("double") / (lit(2) * col("n_grams") - col("__s")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    cross.unionByName(within)
  }

  /** [[ngramContainment]] with the exact-dedup-FIRST ordering built in —
    * the directed third member of the composed family
    * ([[ngramJaccardDeduped]], [[simhashNearDup64Deduped]]), same
    * output-identity argument via [[dedupedPairCore]]'s duplication-
    * weighted prune. Directed transfers: containment(x→y) for members
    * (x ∈ A, y ∈ B) equals containment(repA→repB) = inter/na (and
    * inter/nb the other way); a within-group directed pair scores
    * s/g in BOTH directions and exists iff s ≥ 1. Output matches the
    * direct form row-for-row: (idCol, container_id, containment). */
  def ngramContainmentDeduped(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5,
      maxNgramFreq: Option[Int] = None,
      maxNgramFreqFraction: Option[Double] = None
  ): DataFrame = {
    val (memb, sizes, surviving, interSized) =
      dedupedPairCore(docs, textCol, idCol, n, maxNgramFreq, maxNgramFreqFraction)
    containedDirectedPairs(memb, sizes, surviving, interSized, idCol, threshold)
  }

  /** Member-level directed containment pairs from [[dedupedPairCore]]'s
    * collapsed frames — the shared tail of [[ngramContainmentDeduped]] and
    * [[dropContained]]. Returns (idCol, container_id, containment). */
  private def containedDirectedPairs(
      memb: DataFrame, sizes: DataFrame, surviving: DataFrame,
      interSized: DataFrame, idCol: String, threshold: Double): DataFrame = {
    // directed rep pairs: both directions from one intersection count
    val dirRep = interSized.select(col("ra").as("dr"), col("rb").as("cr"),
        round(col("inter").cast("double") / col("na").cast("double"), 6).as("containment"))
      .unionByName(interSized.select(col("rb").as("dr"), col("ra").as("cr"),
        round(col("inter").cast("double") / col("nb").cast("double"), 6).as("containment")))
      .where(col("containment") >= threshold)
    val cross = dirRep
      .join(memb.select(col("__rep").as("dr"), col("__m_id").as("__doc")), Seq("dr"))
      .join(memb.select(col("__rep").as("cr"), col("__m_id").as("container_id")), Seq("cr"))
      .select(col("__doc").as(idCol), col("container_id"), col("containment"))
    // within-group: both directed orders, containment = s/g each way
    val within = memb.as("p")
      .join(memb.as("q"),
        col("p.__rep") === col("q.__rep") && col("p.__m_id") =!= col("q.__m_id"))
      .select(col("p.__rep").as("id"), col("p.__m_id").as(idCol),
        col("q.__m_id").as("container_id"))
      .join(sizes, Seq("id")).join(surviving, Seq("id"))
      .withColumn("containment",
        round(col("__s").cast("double") / col("n_grams").cast("double"), 6))
      .where(col("containment") >= threshold)
      .select(col(idCol), col("container_id"), col("containment"))
    cross.unionByName(within)
  }

  /** The containment KILL step — the pipeline consumer of
    * [[ngramContainment]]'s directed pairs: DROP every document that is
    * ≥ `threshold` contained in a strictly LONGER container (more distinct
    * n-grams), the standard quote/boilerplate removal pass of web-corpus
    * pipelines. Ties (equal gram counts — e.g. exact duplicates, whose
    * mutual containment is 1.0 uncapped) break deterministically by id:
    * the LOWEST id among mutually-containing equal-size documents
    * survives, so the step subsumes exact dedup as a side effect.
    *
    * Single-pass semantics, deliberately non-transitive: a document is
    * judged against the ORIGINAL corpus, not the survivor set (if A ⊂ B
    * ⊂ C, both A and B drop even though B's own container C also drops).
    * Judging against survivors would need an iterated fixpoint whose
    * result depends on removal order; the one-pass rule is order-free,
    * embarrassingly parallel, and what production pipelines run.
    *
    * Built on the exact-dedup-first composition ([[dedupedPairCore]]), so
    * a duplicated corpus pays distinct-text pairwise cost — and unlike
    * the pair-LISTING ops, the kill never expands rep pairs to member
    * pairs at all: the drop SET is derived member-LINEARLY (r13, closing
    * SCALE.md r12's ×30 super-linearity — the old member-pair expansion
    * cost d² per rep pair and g² per exact group at duplication d). The
    * linear form leans on one invariant: a group's representative IS its
    * minimum member id ([[exactGroupMapping]]), so the member-level
    * equal-size tie-break "∃ container member with lower id than m"
    * collapses to `container rep < m`, and the within-group drop set is
    * exactly "every non-representative member" (gated by the group's
    * surviving-gram containment s/g ≥ threshold, as before). Survivor
    * set PROVABLY unchanged — q_drop_contained / q_pipeline_full pin it
    * against the member-pair oracle. Output: the surviving rows of
    * `docs`, all columns intact. */
  def dropContained(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5,
      maxNgramFreq: Option[Int] = None,
      maxNgramFreqFraction: Option[Double] = None
  ): DataFrame = {
    // The input lineage is consumed 4× (group mapping, rep gramming, the
    // anti join, a cap's corpus count). Persisting it was A/B'd and LOSES:
    // op-side persist 15.2 s / caller-side 8.4 s vs 7.6 s unpersisted for
    // the composed pipeline stage at sf0.1 (and the window+semi-join input
    // there recomputes in ~1.8 s — cache materialization of full text rows
    // costs more than re-running it). Re-measure before "fixing" this.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = docs
    val (memb0, sizes0, surviving, interSized0) =
      dedupedPairCore(cached, textCol, idCol, n, maxNgramFreq, maxNgramFreqFraction)
    // unlike the pair-list ops (2-3 consumers, runtime stage reuse), the
    // drop step fans the core frames into FIVE+ consumers (both pair
    // branches, two size joins, the anti-join key set) — unpersisted, the
    // digest window and the candidate join re-derive per consumer (a
    // measured 31-scan / 18-window plan, 7.7 s at sf0.1 vs 2.4 for the
    // pair op). Persist at the fan-out points: memb is id-pair-width,
    // sizes rep-count rows, interSized candidate-pair rows — all tiny
    // relative to the gram streams they cut off.
    val memb = memb0.persist(lvl)
    val sizes = sizes0.persist(lvl)
    val interSized = interSized0.persist(lvl)
    // rep-level directed pairs clearing the threshold, sizes carried —
    // the same arithmetic containedDirectedPairs runs, minus the member
    // expansion (round BEFORE the threshold, as the pair ops and their
    // oracles do)
    val dirRep = interSized.select(col("ra").as("__dr"), col("rb").as("__cr"),
        col("na").as("__nd"), col("nb").as("__nc"),
        round(col("inter").cast("double") / col("na").cast("double"), 6).as("containment"))
      .unionByName(interSized.select(col("rb").as("__dr"), col("ra").as("__cr"),
        col("nb").as("__nd"), col("na").as("__nc"),
        round(col("inter").cast("double") / col("nb").cast("double"), 6).as("containment")))
      .where(col("containment") >= threshold)
    // cross-group drops, member-linearly: member m of the contained rep's
    // group drops when the container's gram set is strictly larger, or on
    // the equal-size tie when SOME container member has a lower id — and
    // the container group's minimum id is its rep, so that is `__cr < m`
    val crossDropped = memb
      .join(dirRep.select(col("__dr").as("__rep"), col("__cr"), col("__nd"), col("__nc")),
        Seq("__rep"))
      .where(col("__nc") > col("__nd") ||
        (col("__nc") === col("__nd") && col("__cr") < col("__m_id")))
      .select(col("__m_id").as(idCol))
    // within-group drops: equal sizes by construction, so the tie-break
    // keeps exactly the minimum member id — the rep; every other member
    // drops, provided the group's surviving-gram containment clears the
    // threshold (s ≥ 1 via the `surviving` join, as the pair form gates)
    val withinDropped = memb.where(col("__m_id") =!= col("__rep"))
      .join(sizes.withColumnRenamed("id", "__rep"), Seq("__rep"))
      .join(surviving.withColumnRenamed("id", "__rep"), Seq("__rep"))
      .where(round(col("__s").cast("double") / col("n_grams").cast("double"), 6)
        >= threshold)
      .select(col("__m_id").as(idCol))
    val dropped = crossDropped.unionByName(withinDropped).distinct()
    cached.join(dropped, Seq(idCol), "left_anti")
  }

  /** Asymmetric n-gram CONTAINMENT — the quote-inclusion/subset detector
    * symmetric Jaccard misses: containment(a→b) = |grams(a)∩grams(b)| /
    * |grams(a)| is high when a is largely quoted inside b even if b is much
    * longer (jaccard ≈ |a|/|b| → small). Standard companion to pairwise
    * dedup in web pipelines: drop documents mostly contained in a longer
    * container.
    *
    * Same candidate machinery as [[ngramJaccard]] (digest self-join, both
    * stop-gram caps — and the same WARNING: on duplicated corpora run
    * exact dedup first); each unordered candidate pair is evaluated in
    * BOTH directions from one intersection count. Output:
    * (idCol, container_id, containment) — one row per direction that
    * clears the threshold. */
  def ngramContainment(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.5,
      maxNgramFreq: Option[Int] = None,
      maxNgramFreqFraction: Option[Double] = None
  ): DataFrame = {
    val grams = gramDigestsOf(docs, textCol, idCol, n)
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val pruned = (maxNgramFreq, maxNgramFreqFraction) match {
      case (Some(m), _) =>
        val freq = grams.groupBy("gram").agg(count(lit(1)).as("df")).where(col("df") <= m)
        grams.join(freq.select("gram"), Seq("gram"))
      case (None, Some(f)) =>
        val nDocs = docs.agg(count(lit(1)).as("__nd"))
        val freq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .where(col("df") <= ceil(lit(f) * col("__nd").cast("double")))
        grams.join(freq.select("gram"), Seq("gram"))
      case _ => grams
    }
    val inter = pruned.as("x")
      .join(pruned.as("y"), col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val sized = inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("n_grams", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("n_grams", "nb"), Seq("doc_b"))
    // two-branch union, deliberately NOT a single-pass explode: the
    // branches share the candidate-join stage at runtime (ReusedExchange),
    // and each pushes the threshold filter below its projection — the
    // explode-of-structs form measured 29% slower at sf0.1 (BASELINE.md r9)
    val aInB = sized.select(col("doc_a").as(idCol), col("doc_b").as("container_id"),
      round(col("inter").cast("double") / col("na").cast("double"), 6).as("containment"))
    val bInA = sized.select(col("doc_b").as(idCol), col("doc_a").as("container_id"),
      round(col("inter").cast("double") / col("nb").cast("double"), 6).as("containment"))
    aInB.unionByName(bInA).where(col("containment") >= threshold)
  }

  /** Sub-document (chunk-level) dedup: the corpus-wide removal of repeated
    * SPANS that document-level dedup can't see — boilerplate headers,
    * license blocks, quoted passages duplicated across otherwise-distinct
    * documents (the line/paragraph dedup step of web-corpus pipelines,
    * generalized to fixed-size word windows because "line" is a formatting
    * accident). Each document is split into consecutive `chunkWords`-word
    * chunks; a chunk survives only at its globally FIRST occurrence
    * (lowest (id, position) — total order, engine-independent), and each
    * document is reassembled from its surviving chunks in original order.
    *
    * Plan shape: posexplode → ONE shuffle on chunk text (row_number picks
    * the winner inside the sorted partition — no join back needed, the
    * winner flag falls out of the same window pass) → one shuffle on id to
    * reassemble. Shuffle bytes carry each chunk once per occurrence; at
    * 100 TB swap the window key for `xxhash64(chunk)` to shuffle 8-byte
    * digests (same one-liner trade as [[exactByDigest]] — kept as text
    * here so the oracle can replay the key).
    *
    * Output: (idCol, dedup_text, kept_chunks, total_chunks) — documents
    * whose every chunk was seen earlier elsewhere keep an empty
    * dedup_text (kept_chunks = 0), mirroring what a pipeline would then
    * drop with a trivial filter. */
  def chunkDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      chunkWords: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk")).orderBy(col(idCol).asc, col("pos").asc)
    val chunks = docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, (size(toks) - 1) div $chunkWords)," +
          s" i -> array_join(slice(toks, i * $chunkWords + 1, $chunkWords), ' '))"))
        .as(Seq("pos", "chunk")))
    val kept = chunks
      .withColumn("__rn", row_number().over(w))
      .withColumn("__keep", col("__rn") === 1)
    docs.select(col(idCol))
      .join(
        kept.groupBy(col(idCol)).agg(
          array_join(expr("transform(array_sort(collect_list(CASE WHEN __keep THEN " +
            "struct(pos, chunk) END)), s -> s.chunk)"), " ").as("dedup_text"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("kept_chunks"),
          count(lit(1)).as("total_chunks")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("dedup_text"), lit("")).as("dedup_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("total_chunks"), lit(0L)).as("total_chunks"))
  }

  // --------------------------------------------------------- accuracy gates
  // The ANN family earned measured recall gates (q_ann_recall*) because an
  // approximate index without a measured accuracy number is a knob nobody
  // can trust. The sketch-dedup family has the same structure: at 100 TB
  // only the sketch form is runnable, so the hash-count/band/radius knobs
  // must be validated at a scale where the EXACT pairwise truth
  // ([[ngramJaccard]]) is still computable — these gates are that
  // measurement, shaped as registered queries so the numbers live under
  // the oracle instead of in a notebook.

  /** Per-threshold precision/recall of [[minhashLsh]]'s pairs against the
    * exact n-gram Jaccard ground truth on the same corpus.
    *
    * Both sides are computed ONCE at `thresholds.min` and re-filtered per
    * threshold — valid because banding is threshold-independent, so
    * `minhashLsh(t)` ≡ `minhashLsh(tmin).where(est_jaccard >= t)`, and
    * likewise for [[ngramJaccard]]; the sweep therefore costs one truth
    * pass + one sketch pass regardless of |thresholds|. The gram
    * definition is shared by construction (`n = shingleK`, both distinct
    * word k-grams), so the truth is exactly the quantity the signature
    * estimates.
    *
    * A pair can miss in TWO ways the sweep separates implicitly: never a
    * band candidate (an LSH miss — lost before any estimate), or a
    * candidate whose agreement estimate fell below t (an estimator miss).
    * Both read as recall < 1; precision < 1 means est ≥ t pairs whose true
    * Jaccard is < t (estimator variance ~1/sqrt(numHashes)).
    *
    * Scale shape: the expensive inputs are the two existing operators
    * unchanged; the sweep itself is pair-list-sized (a broadcast cross
    * join against |thresholds| literals, one aggregate). Run it per corpus
    * SAMPLE at deployment scale — the knobs validated on an exchangeable
    * sample transfer, the full-corpus exact truth never being computable
    * there (which is the point of this gate existing).
    *
    * Empty denominators yield NULL (no predictions ⇒ precision undefined,
    * not 0 — the [[contamination]] absence-is-a-decision convention); a
    * corpus with NO pairs on either side yields an EMPTY report (the
    * group-by has no pair rows — nothing to measure is distinguishable
    * from measured-zero).
    * Output: (threshold, n_true, n_pred, n_hit, precision, recall). */
  def minhashAccuracy(
      docs: DataFrame,
      thresholds: Seq[Double] = Seq(0.35, 0.5, 0.7),
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = None
  ): DataFrame = {
    require(thresholds.nonEmpty, "minhashAccuracy needs at least one threshold")
    val tmin = thresholds.min
    // the gate runs TWO full pipelines (exact truth + sketch prediction)
    // over the same input; a caller whose docs lineage is expensive (the
    // fmt fixtures' regex-mutated union) should persist it BEFORE calling.
    // Persisting here was tried and reverted: the gate also runs over
    // shared long-lived frames (the memoized base corpus), and caching
    // those swaps every downstream query's parquet pushdown/exchange
    // reuse for an InMemoryRelation that outlives this call.
    val truth = ngramJaccard(docs, textCol, idCol, shingleK, tmin)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val pred = minhashLsh(docs, textCol, idCol, shingleK, numHashes, bands,
        tmin, portableHash, maxBucketFreq)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    val joined = truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
    val th = joined.sparkSession.range(1)
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"))
    accuracyTail(
      joined.crossJoin(broadcast(th)), col("threshold"),
      col("jaccard") >= col("threshold"),
      col("est_jaccard") >= col("threshold"))
  }

  /** Per-radius precision/recall of [[simhashNearDup64]]'s Hamming-ball
    * pairs against the exact n-gram Jaccard truth at `jaccardThreshold` —
    * the [[minhashAccuracy]] gate for the OTHER sketch family. SimHash
    * approximates angular similarity of token-frequency vectors, not
    * Jaccard, so this measures the question a deployment actually asks —
    * "of the pairs my exact criterion would dedup, what does the Hamming
    * radius catch, and how much noise rides along" — with the radius swept
    * 0..nBlocks−1 from ONE pair pass (the pigeonhole join already yields
    * every pair at distance ≤ nBlocks−1 with its exact popcount; radius r
    * is a filter over it). n_true is constant across rows (the truth set
    * doesn't move with the radius); rising n_pred vs flat n_hit is the
    * precision cliff that says the radius outran the similarity the
    * fingerprint can see. Output: (radius, n_true, n_pred, n_hit,
    * precision, recall). */
  def simhashAccuracy(
      docs: DataFrame,
      jaccardThreshold: Double = 0.5,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      nBlocks: Int = 4,
      maxBlockFreq: Option[Int] = None
  ): DataFrame = {
    // truth + prediction share the input — callers with expensive lineage
    // persist it first (see [[minhashAccuracy]]'s rejected-persist note)
    val truth = ngramJaccard(docs, textCol, idCol, n, jaccardThreshold)
      .select(col(s"doc_a").as("id_a"), col("doc_b").as("id_b"), col("jaccard"))
    val pred = simhashNearDup64(docs, textCol, idCol, nBlocks, maxBlockFreq)
    val joined = truth.join(pred, Seq("id_a", "id_b"), "full_outer")
    val radii = joined.sparkSession.range(1)
      .select(explode(sequence(lit(0), lit(nBlocks - 1))).as("radius"))
    accuracyTail(
      joined.crossJoin(broadcast(radii)), col("radius"),
      col("jaccard").isNotNull,
      col("hamming") <= col("radius"))
  }

  /** Per-doc token-hash array + width-w window fingerprints, the shared
    * front half of the duplicate-span family: tokenize once, Poly64-hash
    * each token once, then every window fingerprint is a w-step wrapping
    * fold over the hash ARRAY (h = h·MUL + tokenHash mod 2^64 from the
    * full-width seed) — slices of one materialized array, not re-hashed
    * text. Docs shorter than `width` tokens get an empty fingerprint list
    * (null text included: a null size fails the `when` guard). */
  private def spanFingerprints(docs: DataFrame, width: Int,
      textCol: String, idCol: String): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val s = docs.sparkSession
    if (s.catalog.functionExists("graft_span_fps")) {
      // native path: one codegen'd loop — tokens hashed once, windows
      // folded without per-window slice arrays; null tokens → empty
      docs.select(col(idCol),
        coalesce(
          call_function("graft_span_fps",
            TextAnalysis.tokensIn(s)(col(textCol)), lit(width)),
          array().cast("array<bigint>")).as("__fps"))
    } else {
      docs
        .withColumn("__th", transform(TextAnalysis.tokens(col(textCol)),
          t => poly64Base(t)))
        .select(col(idCol),
          when(size(col("__th")) >= width,
            transform(sequence(lit(0), size(col("__th")) - width),
              i => aggregate(slice(col("__th"), i + 1, lit(width)), lit(Poly64.Seed),
                (acc, h) => mulAdd64(acc, lit(Poly64.Mul), h))))
            .otherwise(array().cast("array<bigint>")).as("__fps"))
    }
  }

  /** Exact duplicate-SPAN detection — the distributed form of
    * exact-substring training-data dedup: the near-dup operators above
    * score whole documents, but repeated BOILERPLATE (licenses, templated
    * headers, navigation chrome) hides inside otherwise-unique docs, and
    * the published result is that stripping repeated spans beats dropping
    * docs. A width-w token window whose [[spanFingerprints]] fingerprint
    * appears in ≥ `minDocs` DISTINCT docs is "duplicated"; the output is
    * each doc's span-duplication coverage — the per-doc strip/keep signal.
    *
    * Scale shape: the shuffle carries one (doc_id, long) per window —
    * never text; windows per doc = tokens − w + 1 (linear); the exploded
    * hash frame is persisted ONCE and fans into the dup-set groupBy, the
    * per-doc window count, and the coverage rejoin (whose dup side the
    * minDocs filter shrinks to genuinely-repeated fingerprints BEFORE it
    * travels); the harness's per-query release frees it. Fingerprint
    * collisions (~n²/2^64) can only over-count duplication — acceptable
    * for a strip-signal, and the oracle re-derives identical fingerprints.
    *
    * Output: (doc_id, n_windows, dup_windows, dup_ratio); docs shorter
    * than `width` tokens surface with n_windows = 0. */
  def duplicateSpans(
      docs: DataFrame,
      width: Int = 8,
      minDocs: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // ONE hashing pass feeds all three consumers (dup set, per-doc dup
    // count, per-doc window count) — the persisted frame is two longs per
    // window; released by the harness's per-query cache release
    val ex = spanFingerprints(docs, width, textCol, idCol)
      .select(col(idCol), explode(col("__fps")).as("span_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = ex.groupBy("span_fp")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("span_fp")
    val nw = ex.groupBy(col(idCol)).agg(count(lit(1)).as("__nw"))
    val dw = ex.join(dup, Seq("span_fp"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__dw"))
    spanCoverageTail(docs, nw, dw, idCol)
  }

  /** Shared assembly of the per-doc coverage report: every input doc row
    * left-joined against its window count and dup-window count, zeros for
    * absent docs, ratio rounded 6. */
  private def spanCoverageTail(docs: DataFrame, nw: DataFrame, dw: DataFrame,
      idCol: String): DataFrame =
    docs.select(col(idCol))
      .join(nw, Seq(idCol), "left")
      .join(dw, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nw"), lit(0L)).cast("int").as("n_windows"),
        coalesce(col("__dw"), lit(0L)).as("dup_windows"),
        round(when(coalesce(col("__nw"), lit(0L)) > 0,
          coalesce(col("__dw"), lit(0L)).cast("double") /
            col("__nw").cast("double"))
          .otherwise(lit(0.0)), 6).as("dup_ratio"))

  /** The standing span-fingerprint BANK: distinct window fingerprints of a
    * corpus — the 8-byte-per-row artifact the incremental form
    * ([[duplicateSpansAgainst]]) scores against. Build once per corpus
    * snapshot (or append per ingestion epoch and distinct at read); the
    * corpus text never needs re-reading afterwards. */
  def spanFingerprintBank(
      docs: DataFrame,
      width: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    spanFingerprints(docs, width, textCol, idCol)
      .select(explode(col("__fps")).as("span_fp"))
      .distinct()

  /** Ingestion-time span coverage vs a STANDING bank — the incremental
    * form of [[duplicateSpans]] (the [[dedupAgainst]] shape applied to
    * spans): the standing corpus contributes only [[spanFingerprintBank]]
    * (8 B/row, text never re-read), each incoming doc is scored by how
    * much of it is standing boilerplate. Deliberately NO minDocs (one
    * standing occurrence makes a window boilerplate) and NO
    * incoming×incoming work — a batch that only repeats ITSELF scores
    * clean here; run [[duplicateSpans]] within the batch for that half.
    * Output: (doc_id, n_windows, dup_windows, dup_ratio). */
  def duplicateSpansAgainst(
      incoming: DataFrame,
      standingFps: DataFrame,
      width: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ex = spanFingerprints(incoming, width, textCol, idCol)
      .select(col(idCol), explode(col("__fps")).as("span_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nw = ex.groupBy(col(idCol)).agg(count(lit(1)).as("__nw"))
    val dw = ex.join(standingFps.select(col("span_fp")), Seq("span_fp"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__dw"))
    spanCoverageTail(incoming, nw, dw, idCol)
  }

  /** Maximal duplicated REGIONS per doc — the strip planner's actual
    * output: [[duplicateSpans]] says how much of a doc repeats,
    * this says WHERE. Duplicated width-w windows (cross-doc reach ≥
    * minDocs) are merged into islands wherever consecutive window starts
    * are ≤ w apart (their [pos, pos+w) extents overlap or touch), so each
    * island is one contiguous region a pipeline would cut. Coverage per
    * island = last_start − first_start + w tokens.
    *
    * Scale shape: the island merge is a per-doc window function over the
    * doc's DUPLICATED window positions only (already minDocs-filtered —
    * on a mostly-clean corpus that frame is tiny), partitioned by doc:
    * no pairwise work, one extra shuffle on doc_id.
    *
    * Output: (doc_id, n_tokens, n_spans, covered_tokens, covered_ratio);
    * clean/short/null docs surface with zeros. */
  def duplicateSpanIntervals(
      docs: DataFrame,
      width: Int = 8,
      minDocs: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = spanFingerprints(docs, width, textCol, idCol)
      .select(col(idCol), posexplode(col("__fps")).as(Seq("pos", "span_fp")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = ex.groupBy("span_fp")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("span_fp")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = ex.join(dup, Seq("span_fp"), "left_semi")
      .select(col(idCol), col("pos"))
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= width, 0).otherwise(1))
      .withColumn("__isl", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perDoc = islands.groupBy(col(idCol), col("__isl"))
      .agg((max(col("pos")) - min(col("pos")) + width).as("__cov"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("__ns"), sum(col("__cov")).as("__ct"))
    val s = docs.sparkSession
    docs.select(col(idCol),
        coalesce(size(TextAnalysis.tokensIn(s)(col(textCol))), lit(0)).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__ns"), lit(0)).as("n_spans"),
        coalesce(col("__ct"), lit(0L)).as("covered_tokens"),
        round(when(col("n_tokens") > 0,
          coalesce(col("__ct"), lit(0L)).cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)), 6).as("covered_ratio"))
  }

  /** The duplicated spans THEMSELVES, ranked — the "what is this
    * boilerplate" companion to [[duplicateSpans]]: top-N cross-doc window
    * fingerprints by distinct-doc reach, with one example occurrence's
    * text. The ranking pass is hash-only (the wide text never rides the
    * ranking shuffle); the example text is re-sliced from the ORIGINAL
    * docs for just the N survivors via a broadcast key-join — at 100 TB
    * that is N point lookups, not a corpus rescan. Fully deterministic:
    * ties break on span_fp, the example is the (min doc, min pos)
    * occurrence. Output: (span_fp, n_docs, n_occurrences, example_doc,
    * example_pos, span_text). */
  def topDuplicateSpans(
      docs: DataFrame,
      width: Int = 8,
      topN: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val s = docs.sparkSession
    val ex = spanFingerprints(docs, width, textCol, idCol)
      .select(col(idCol), posexplode(col("__fps")).as(Seq("pos", "span_fp")))
    // the (min doc, min pos) example rides the aggregation as ONE long
    // (doc·2^32 + pos — lexicographic-equivalent since both components are
    // non-negative, pos < 2^32 and doc < 2^31): a struct min would force
    // SortAggregate over every window row, the composite key keeps the
    // hash aggregate. The doc-id precondition is ENFORCED in-plan: an id
    // in [2^31, 2^32) would corrupt the min-ordering (and ≥ 2^32 hit an
    // opaque ANSI overflow), so out-of-range ids raise a named error
    // instead — the branch is codegen'd and costs nothing on valid data.
    val idOk = col(idCol).between(0L, (1L << 31) - 1)
    val checkedId = when(idOk, col(idCol)).otherwise(raise_error(concat(
      lit(s"topDuplicateSpans: $idCol must be in [0, 2^31) for the "),
      lit("example pack, got "), col(idCol).cast("string"))))
    val top = ex.groupBy("span_fp")
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(checkedId * lit(4294967296L) + col("pos")).as("__k"))
      .where(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("span_fp").asc)
      .limit(topN)
      .select(col("span_fp"), col("n_docs"), col("n_occurrences"),
        shiftrightunsigned(col("__k"), 32).as("example_doc"),
        col("__k").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("example_pos"))
    docs.select(col(idCol).as("example_doc"), col(textCol).as("__t"))
      .join(broadcast(top), "example_doc")
      .select(col("span_fp"), col("n_docs"), col("n_occurrences"),
        col("example_doc"), col("example_pos"),
        concat_ws(" ", slice(TextAnalysis.tokensIn(s)(col("__t")),
          col("example_pos") + 1, lit(width))).as("span_text"))
  }

  /** Shared precision/recall aggregate over a (pair × sweep-point) frame:
    * count truth/predicted/hit per sweep value, NULL-denominator-safe.
    * `isTrue`/`isPred` must be null-rejecting on the respective side's
    * absence (a full-outer miss leaves its columns null). */
  private def accuracyTail(pairsBySweep: DataFrame, sweep: Column,
      isTrue: Column, isPred: Column): DataFrame =
    pairsBySweep
      .groupBy(sweep)
      .agg(
        sum(when(isTrue, 1L).otherwise(0L)).as("n_true"),
        sum(when(isPred, 1L).otherwise(0L)).as("n_pred"),
        sum(when(isTrue && isPred, 1L).otherwise(0L)).as("n_hit"))
      .select(sweep, col("n_true"), col("n_pred"), col("n_hit"),
        when(col("n_pred") > 0,
          round(col("n_hit").cast("double") / col("n_pred").cast("double"), 6))
          .as("precision"),
        when(col("n_true") > 0,
          round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"))
}
