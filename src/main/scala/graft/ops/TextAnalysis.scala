package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language ID, token counting, fingerprinting.
  *
  * Everything is built from codegen'd `functions._` array/string expressions —
  * per-row compute, no shuffles, scales linearly with input splits. Designed
  * for the `documents` table (doc_id, text, lang, source, n_chars).
  */
object TextAnalysis {

  /** Whitespace tokenizer (single-space split to stay dialect-portable with
    * the DuckDB oracle; empty tokens filtered). This is the portable HOF
    * form; operators that hold a SparkSession use [[tokensIn]] to get the
    * native byte-scan expression when GraftExtensions is loaded. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Session-aware tokenizer: native `graft_tokens` (single byte scan,
    * no regex, no HOF — whole-stage-codegen-friendly) when registered,
    * the HOF twin otherwise. Identical outputs (spec-enforced). */
  def tokensIn(s: org.apache.spark.sql.SparkSession): Column => Column =
    if (s.catalog.functionExists("graft_tokens"))
      text => call_function("graft_tokens", text)
    else tokens

  /** Tiny embedded stopword set for quality ratios. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-document stats: lengths, token counts, ratios, quality score.
    * Output columns: doc_id, n_chars_m, n_tokens, avg_token_len,
    * stopword_ratio, distinct_ratio, quality_score. */
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Tokenize ONCE into a real column: five downstream expressions reference
    // it, and >1 reference to a non-cheap expression stops CollapseProject
    // from re-inlining the tokenizer into every derived column (measured
    // 4.4s → ~0.6s on sf0.01 documents). Namespaced temp column so a caller
    // column of the same name can't be silently clobbered-then-dropped.
    val t = col("__graft_ts_toks")
    // greatest(...,1) guards ANSI-mode DIVIDE_BY_ZERO for empty/whitespace-only
    // docs (ratios degrade to 0, matching langId's convention).
    val nTok = greatest(size(t), lit(1)).cast("double")
    val stopHits = size(filter(t, x => x.isin(Stopwords: _*))).cast("double")
    val distinctTok = size(array_distinct(t)).cast("double")
    val tokLenSum = aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
    docs
      .withColumn("__graft_ts_toks", tokensIn(docs.sparkSession)(col(textCol)))
      .withColumn("n_chars_m", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("avg_token_len", round(tokLenSum / nTok, 6))
      .withColumn("stopword_ratio", round(stopHits / nTok, 6))
      .withColumn("distinct_ratio", round(distinctTok / nTok, 6))
      // Quality: long-enough docs with diverse vocabulary and sane stopword mass
      .withColumn("quality_score",
        round(
          least(lit(1.0), col("n_tokens") / lit(50.0)) * lit(0.4)
            + col("distinct_ratio") * lit(0.4)
            + least(lit(1.0), col("stopword_ratio") * lit(5.0)) * lit(0.2), 6))
      .drop("__graft_ts_toks")
  }

  /** Language lexicons for the n-gram/stopword language-ID heuristic. */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "que", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "una", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人")
  )

  /** Language ID: score = fraction of tokens found in each language's lexicon;
    * argmax wins, ties broken by lexicon order, all-zero → "und".
    * Output adds `lang_pred` (+ per-language `score_xx` when keepScores). */
  def langId(docs: DataFrame, textCol: String = "text", keepScores: Boolean = false): DataFrame = {
    // Tokenize once (see textStats): each language score references the
    // token array, which would otherwise be re-tokenized per language.
    val t = col("__graft_li_toks")
    val scored = LangLexicons.foldLeft(docs.withColumn("__graft_li_toks", tokensIn(docs.sparkSession)(lower(col(textCol))))) {
      case (d, (lang, lex)) =>
        d.withColumn(s"score_$lang",
          size(filter(t, x => x.isin(lex: _*))).cast("double") / greatest(size(t), lit(1)).cast("double"))
    }
    val best = LangLexicons.map { case (lang, _) => col(s"score_$lang") }
    val maxScore = greatest(best: _*)
    val pred = LangLexicons.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    val out = scored.withColumn("lang_pred", pred).drop("__graft_li_toks")
    if (keepScores) out else out.drop(LangLexicons.map { case (l, _) => s"score_$l" }: _*)
  }

  /** Token count under a BPE-ish regex (words / numbers / single punct).
    * Uses `regexp_count`, portable to the oracle's regexp_extract_all. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Rolling polynomial fingerprint over characters: acc = (acc*31 + cp) mod
    * 1e9+7 — a stable document hash independent of any engine hash function,
    * so differential-testable across engines. Per-row, codegen'd. */
  def fingerprint(text: Column): Column =
    aggregate(
      // split("") leaves a trailing "" element (Java split limit -1) — filter
      // it or the hash absorbs a spurious *31 step.
      transform(filter(split(text, ""), ch => length(ch) > 0), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, cp) => (acc * 31L + cp) % 1000000007L
    )

  /** Gopher-style repetition signals per document: word-2-gram counts,
    * distinct ratio, and the mass of the single most frequent 2-gram —
    * repetitious machine-generated text shows a high `top_2gram_frac` /
    * low `distinct_2gram_ratio`, the standard filter signal. Zero-shuffle
    * per-row array math: sort the gram array once, then ONE fold counts
    * the longest equal-run (ANSI-safe). Docs with <2 tokens — including
    * empty ones — yield a single whole-list gram, so n_2grams = 1 and both
    * ratios are 1.0 (degenerate "fully repetitious"); pre-filter empties
    * if a top_2gram_frac threshold must not drop them.
    * Output: doc_id, n_2grams, distinct_2gram_ratio, top_2gram_frac. */
  def repetitionStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = col("__graft_rep_grams")
    val n = size(grams)
    val nd = greatest(n, lit(1)).cast("double")
    // longest run of equal adjacent elements in the SORTED gram array ==
    // the max frequency of any gram; struct acc carries (prev, run, best)
    val maxRun = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs
      // tokens into a real column first (shinglesOf references it per
      // produced shingle — see its scaladoc), grams likewise (3 references
      // below; both multi-referenced, so CollapseProject keeps them
      // materialized — the textStats lesson)
      .withColumn("__graft_rep_toks", tokensIn(docs.sparkSession)(col(textCol)))
      .withColumn("__graft_rep_grams", Dedup.shinglesOf(col("__graft_rep_toks"), 2))
      .select(col(idCol),
        n.cast("long").as("n_2grams"),
        round(size(array_distinct(grams)).cast("double") / nd, 6).as("distinct_2gram_ratio"),
        round(maxRun.cast("double") / nd, 6).as("top_2gram_frac"))
  }

  /** PII scrub: redact email addresses, long digit runs (phone/account
    * numbers), and IPv4 literals — the standard pre-training redaction
    * pass, as a pure per-row projection (regex only; a production pass
    * swaps in NER the same way the multimodal codec swaps in a decoder).
    * Order matters: emails first (their local parts may contain digits),
    * then IPs (dotted digit runs), then bare digit runs. */
  def piiScrub(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email, "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\d{7,}", "<NUM>")
  }

  /** Inverted-index build: token → document frequency + a CAPPED posting
    * list (the `maxPostings` lowest doc ids, a deterministic total order) —
    * the construction step of a retrieval index, shaped for scale: one
    * token explosion, then the cap window and the df aggregate share ONE
    * shuffle on token (the window's hash clustering satisfies the
    * groupBy). Output rows ∝ vocabulary (bounded by the language, not the
    * corpus) and each carries ≤ maxPostings ids — the full posting lists
    * of hot tokens are exactly what must NOT be materialized per row at
    * 100 TB; a real index spills them to a posting store, the capped head
    * is the sample/debug surface. Tokens are distinct per doc; `minDf`
    * prunes the singleton tail. Postings render as a comma-joined sorted
    * string (engine-portable; arrays don't survive the driver compare). */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxPostings: Int = 5, minDf: Long = 1L)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksFn = tokensIn(docs.sparkSession)
    val posting = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), explode(array_distinct(toksFn(col(textCol)))).as("token"))
    posting
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col("__id").asc)))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        array_join(transform(sort_array(collect_list(
          when(col("__rn") <= maxPostings, col("__id")))),
          x => x.cast("string")), ",").as("postings"))
      .where(col("df") >= minDf)
  }

  /** Sliding-window text chunking (retrieval/RAG prep): split each document
    * into `chunkWords`-word windows advancing by `strideWords` (stride <
    * width → overlapping context windows; stride = width → the disjoint
    * chunking of [[graft.ops.Dedup.chunkDedup]]). Deterministic layout:
    * chunk i covers tokens [i·stride, i·stride + width); the last window
    * may be shorter; every document emits ≥ 1 chunk (an empty/null text
    * yields one empty chunk — a doc absent from chunk output silently
    * vanishes from the downstream index, the [[graft.ops.Dedup.contamination]]
    * absence-is-a-decision convention).
    *
    * Zero-shuffle: pure per-row explode; chunk count per doc is
    * ceil((len − width)/stride) + 1 — output size is input size ×
    * ~width/stride, decided by the caller's knobs, never by skew.
    *
    * Output: (idCol, chunk_id, chunk_text, n_words). */
  def chunkText(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
      idCol: String = "doc_id", chunkWords: Int = 64, strideWords: Int = 48)
      : org.apache.spark.sql.DataFrame = {
    require(chunkWords > 0 && strideWords > 0 && strideWords <= chunkWords,
      "need 0 < strideWords <= chunkWords")
    val toksFn = tokensIn(docs.sparkSession)
    docs
      .select(col(idCol), toksFn(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col(idCol), posexplode(expr(
        s"""transform(
           |  sequence(0, CASE WHEN size(__toks) <= $chunkWords THEN 0
           |    ELSE (size(__toks) - $chunkWords + $strideWords - 1) div $strideWords END),
           |  i -> struct(
           |    array_join(slice(__toks, i * $strideWords + 1, $chunkWords), ' ') AS t,
           |    size(slice(__toks, i * $strideWords + 1, $chunkWords)) AS n))""".stripMargin))
        .as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("__c.t").as("chunk_text"), col("__c.n").cast("long").as("n_words"))
  }

  /** Distinctive vocabulary per group — the "what is source X actually
    * full of" corpus-profiling step (source auditing, contamination
    * triage, mixture debugging): for every (group, token), pointwise
    * mutual information between group and token,
    *
    *   pmi = ln( (cnt_gt · N) / (N_g · n_t) )
    *
    * with cnt_gt the token's count in the group, N_g the group's token
    * total, n_t the token's corpus total, N the corpus token total. The
    * top-k tokens per group by PMI (min-count-filtered — PMI without a
    * support floor surfaces hapax noise) are the group's signature terms.
    *
    * Scale shape: ONE token explosion feeds a (group, token) aggregate
    * that is persisted and re-aggregated two ways (group totals, token
    * totals) — everything downstream of the first aggregate is
    * vocabulary×groups-sized, not corpus-sized; the 1-row corpus total
    * broadcasts. PMI is milli-nat-quantized (the
    * [[graft.ops.Dedup.importanceWeights]] fixed-point recipe) so ranking
    * is exact integer comparison cross-engine; ties → token ascending.
    *
    * Output: (groupCol, token, cnt, pmi, rank), rank ≤ k per group. */
  def topTermsPerGroup(docs: org.apache.spark.sql.DataFrame, groupCol: String = "source",
      textCol: String = "text", k: Int = 10, minCount: Long = 5L)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksFn = tokensIn(docs.sparkSession)
    val gt = docs.where(col(textCol).isNotNull)
      .select(col(groupCol).as("__g"), explode(toksFn(col(textCol))).as("token"))
      .groupBy(col("__g"), col("token")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ng = gt.groupBy(col("__g")).agg(sum(col("cnt")).as("__ng"))
    val nt = gt.groupBy(col("token")).agg(sum(col("cnt")).as("__nt"))
    val tot = gt.agg(sum(col("cnt")).as("__nn"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__pmi_m").desc, col("token").asc)
    gt.where(col("cnt") >= minCount)
      .join(ng, Seq("__g"))
      .join(nt, Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("__pmi_m", round(log(
        (col("cnt").cast("double") * col("__nn").cast("double")) /
          (col("__ng").cast("double") * col("__nt").cast("double"))) * 1000d, 0).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__g").as(groupCol), col("token"), col("cnt"),
        (col("__pmi_m").cast("double") / 1000d).as("pmi"), col("rank"))
  }

  /** BM25 top-k retrieval — the ranked-search consumer of the
    * [[invertedIndex]] machinery (Robertson/Sparck Jones; the Lucene
    * `+1`-inside-the-log idf variant, which keeps idf positive for
    * df > N/2 tokens):
    *
    *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t) = ln( (N − df + 0.5)/(df + 0.5) + 1 )
    *
    * Scale shape: ONE token explosion over the corpus feeds (doc, token)
    * term frequencies; doc lengths fold out of the same tf aggregate (no
    * second pass); the query side is tiny and BROADCAST twice — first the
    * distinct query-term set semi-prunes the posting table (only postings
    * of query terms flow anywhere), then the (query, term) pairs fan the
    * pruned postings out per query. df is aggregated AFTER the term prune
    * but over all docs (pruning is by token, so counts are corpus-exact)
    * and is ≤ query-vocabulary rows → broadcast. The only corpus-sized
    * shuffles: the tf groupBy and the dl join.
    *
    * Cross-engine determinism, the [[graft.ops.Dedup.importanceWeights]]
    * recipe: idf is quantized to milli-nat integers (one ln per distinct
    * query term), each per-term score to an integer milli-score, and the
    * per-(query, doc) sum is exact integer arithmetic in any order;
    * `score` = that sum / 1000. Ties rank by doc id ascending.
    *
    * Output: (query_id, doc_id, score, rn), rn ≤ k per query. */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int = 10,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query",
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksFn = tokensIn(docs.sparkSession)
    // NOT persisted, deliberately: tf feeds both the doc-length
    // re-aggregate and the query-term prune, but its two consumers share
    // the (doc, token) exchange via ReusedExchange, so caching only adds
    // the materialization cost — measured qmin 1.17 s unpersisted vs
    // 1.52 s persisted at sf0.1 (the inverse of the pitfall-#1 shape:
    // reuse already happens at the exchange level here)
    val tf = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"), explode(toksFn(col(textCol))).as("token"))
      .groupBy(col("__doc"), col("token")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("__doc")).agg(sum(col("tf")).as("dl"))
    // N counts ALL docs (null/empty included — they just can't match);
    // avgdl over token-bearing docs' lengths, zero-corpus guarded
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(dl.agg(coalesce(sum(col("dl")), lit(0L)).as("sdl"))))
      .select(col("n"), when(col("n") > 0,
        col("sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"))
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(toksFn(col(queryTextCol)))).as("token"))
    val prunedTf = tf.join(broadcast(qTerms.select("token").distinct()), Seq("token"))
    val idf = prunedTf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("token"), idfMilli(col("n"), col("df")).as("__idf_m"))
    val perTerm = prunedTf
      .join(dl, Seq("__doc"))
      .join(broadcast(idf), Seq("token"))
      .join(broadcast(qTerms), Seq("token"))
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .select(col("query_id"), col("__doc"),
        scoreMilli(col("tf"), col("dl"), col("__idf_m"), col("avgdl"), k1, b).as("__s_m"))
    bm25Rank(perTerm, k, idCol)
  }

  /** Lucene-variant idf, milli-nat-quantized — the one `ln` both the direct
    * and the index-served BM25 paths must spell identically. */
  private def idfMilli(n: Column, df: Column): Column =
    round(log((n.cast("double") - df + 0.5d) / (df + 0.5d) + 1d) * 1000d, 0).cast("long")

  /** Per-(query, doc, term) BM25 partial score as an integer milli-score —
    * shared by [[bm25TopK]] and [[bm25TopKFromIndex]] so the two paths can
    * never drift arithmetically. */
  private def scoreMilli(tf: Column, dl: Column, idfM: Column, avgdl: Column,
      k1: Double, b: Double): Column =
    round(idfM * (tf.cast("double") * (k1 + 1d)) /
      (tf.cast("double") + lit(k1) * (lit(1d - b) +
        when(avgdl > 0, lit(b) * dl.cast("double") / avgdl)
          .otherwise(lit(0d)))), 0).cast("long")

  /** Shared ranking tail: exact integer per-(query, doc) sum → top-k window. */
  private def bm25Rank(perTerm: org.apache.spark.sql.DataFrame, k: Int,
      idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__score_m").desc, col("__doc").asc)
    perTerm.groupBy(col("query_id"), col("__doc"))
      .agg(sum(col("__s_m")).as("__score_m"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("__doc").as(idCol),
        (col("__score_m").cast("double") / 1000d).as("score"), col("rn"))
  }

  /** A materialized BM25 index: `postings` (token, idCol, tf, dl — one row
    * per (doc, distinct token), doc length denormalized in) and `stats`
    * (one row: n = total docs, avgdl, sdl = total corpus token count —
    * carried so two indexes MERGE exactly: avgdl alone loses the ulps).
    * Both are plain DataFrames so they write/read as parquet tables — the
    * build artifact of the build-once / serve-many split. */
  final case class Bm25Index(postings: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)

  /** BUILD the BM25 index once: the corpus-sized work of [[bm25TopK]] (the
    * token explosion, tf aggregate, doc-length re-aggregate, corpus stats)
    * with no query in sight. At 100 TB this runs once per corpus snapshot
    * and lands in parquet (partition `postings` by a token hash for serve-
    * side pruning); [[bm25TopKFromIndex]] then answers every query batch
    * from the artifact — the serve path never re-tokenizes the corpus.
    *
    * df is deliberately NOT precomputed per token: it equals the postings
    * row count per token, which the serve path aggregates AFTER its query-
    * term prune — a vocabulary-sized aggregate over only the pruned
    * postings, cheaper than materializing (and keeping consistent) a
    * second table. */
  def bm25Index(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Bm25Index = {
    val toksFn = tokensIn(docs.sparkSession)
    val tf = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"), explode(toksFn(col(textCol))).as("token"))
      .groupBy(col("__doc"), col("token")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("__doc")).agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dl, Seq("__doc"))
      .select(col("token"), col("__doc").as(idCol), col("tf"), col("dl"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(dl.agg(coalesce(sum(col("dl")), lit(0L)).as("__sdl"))))
      .select(col("n"), when(col("n") > 0,
        col("__sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"),
        col("__sdl").as("sdl"))
    Bm25Index(postings, stats)
  }

  /** The stats row derived from ALREADY-MATERIALIZED postings plus the
    * corpus doc count — so an index BUILD tokenizes the corpus exactly
    * once: materialize [[bm25Index]].postings, then derive stats from the
    * landed artifact instead of re-running the tokenize→tf→dl chain a
    * second time (writing `ix.postings` and `ix.stats` as two actions
    * re-evaluates that chain per action — at 100 TB that is a second full
    * pass over the corpus text for one 1-row table).
    *
    * Exactness (bit-identical to [[bm25Index]].stats): sdl there is
    * Σ over docs of dl where dl = Σ of that doc's tf rows — regrouping,
    * Σ tf over ALL postings rows, which is what this aggregates (exact
    * integer sum in any order); n is the caller's count of ALL corpus
    * docs (null-text docs own no postings rows but count toward n, which
    * is why n cannot be derived from the postings); avgdl is the same
    * single n>0-guarded double division. OpsSpec pins the identity. */
  def bm25StatsFromPostings(postings: org.apache.spark.sql.DataFrame,
      nDocs: Long): org.apache.spark.sql.DataFrame =
    postings.agg(coalesce(sum(col("tf")), lit(0L)).as("__sdl"))
      .select(lit(nDocs).as("n"), when(lit(nDocs) > 0,
        col("__sdl").cast("double") / lit(nDocs).cast("double"))
        .otherwise(lit(0d)).as("avgdl"),
        col("__sdl").as("sdl"))

  /** MERGE per-shard BM25 indexes over DISJOINT document sets into the
    * whole-corpus index — the distributed-build story: at 100 TB each
    * shard/day builds its own [[bm25Index]] (an embarrassingly parallel,
    * failure-isolated unit), and the merged artifact is EXACTLY the index
    * a monolithic build would produce. Postings rows are per-(doc, token),
    * so disjoint doc sets union without conflict; stats re-derive from the
    * exact integer sums (n = Σnᵢ, sdl = Σsdlᵢ, avgdl = sdl/n — one double
    * division, bit-identical to the whole-corpus build; merging the
    * already-divided avgdl values instead would drift ulps). df needs no
    * merge bookkeeping at all: the serve path counts it from the unioned
    * postings. Associative — shard → day → corpus rollups compose.
    *
    * PRECONDITION: document sets disjoint across the inputs (same contract
    * as any partitioned build; a doc split across shards would double its
    * postings). q_bm25_topk_sharded pins merge(half₁, half₂) against the
    * direct query's own oracle; OpsSpec covers 2-way and 3-way splits. */
  def bm25IndexMerge(parts: Seq[Bm25Index]): Bm25Index = {
    require(parts.nonEmpty, "bm25IndexMerge needs at least one part")
    val postings = parts.map(_.postings).reduce(_ unionByName _)
    val stats = parts.map(_.stats).reduce(_ unionByName _)
      .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
      .select(col("n"), when(col("n") > 0,
        col("sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"),
        col("sdl"))
    Bm25Index(postings, stats)
  }

  /** RETRACT a document set from a materialized [[Bm25Index]] — the
    * deletion-request path (user takedowns, licence expiry, contamination
    * discoveries) every month-one deployment needs, run WITHOUT touching
    * the corpus text: drop the docs' postings rows (per-(doc, token), so
    * an anti-join removes exactly their contribution) and subtract their
    * exact integer sums from the stats row (n −= |D|, sdl −= Σ their dl;
    * avgdl re-derives from the one double division the build also does).
    * Because every stored quantity is a per-doc sum, subtraction is
    * EXACT: `retract(build(W), D) ≡ build(W ∖ D)` bit-for-bit — the
    * [[bm25IndexMerge]] disjoint-union argument run backwards
    * (q_bm25_topk_retracted pins it against a direct build over the
    * survivors' own oracle; OpsSpec covers the algebra incl. null-text
    * members of D). df needs no bookkeeping either direction: the serve
    * path re-counts it from surviving postings.
    *
    * PRECONDITION: `docIds` ⊆ the indexed corpus's ids (the deletion
    * request names indexed docs — the merge precondition's mirror). Ids
    * outside the corpus would decrement `n` for docs never counted;
    * duplicates in `docIds` are collapsed here. NULL-text members of D
    * are handled exactly: they have no postings rows (nothing to drop,
    * zero dl) but were counted in n — the n subtraction covers them.
    *
    * NOT idempotent: apply a given deletion batch to a given artifact
    * EXACTLY ONCE. On a re-applied (or partially-overlapping) batch the
    * postings anti-join is a harmless no-op, but the stats subtraction is
    * NOT — n loses |D| again and sdl loses a now-zero rsdl, skewing
    * avgdl/idf for every subsequent serve. `n` cannot be re-derived from
    * surviving postings (null/empty-text docs are counted in n but own no
    * postings rows), so the exactly-once duty is the CALLER's: version the
    * artifact per deletion batch (the `batch=<id>` overwrite recipe the
    * streaming loops use) or record applied batch ids next to it.
    *
    * Scale shape: one anti-join + one semi-join aggregate over postings,
    * both keyed on the id the postings can be bucketed by; D broadcasts
    * (deletion batches are small by nature). Nothing corpus-text-sized. */
  def bm25IndexRetract(index: Bm25Index,
      docIds: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id"): Bm25Index = {
    val ids = docIds.select(col(idCol)).distinct()
    // re-project to the build's column order (the join moves its key first)
    // so the retracted artifact's schema is indistinguishable from a build's
    val postings = index.postings.join(broadcast(ids), Seq(idCol), "left_anti")
      .select(col("token"), col(idCol), col("tf"), col("dl"))
    // Σ tf over the removed docs' postings = Σ of their dl (dl is that
    // sum denormalized) — read from the index itself, no corpus access
    val removed = index.postings.join(broadcast(ids), Seq(idCol), "left_semi")
      .agg(coalesce(sum(col("tf")), lit(0L)).as("__rsdl"))
    val nRemoved = ids.agg(count(lit(1)).as("__rn"))
    val stats = index.stats
      .crossJoin(broadcast(removed))
      .crossJoin(broadcast(nRemoved))
      .select((col("n") - col("__rn")).as("n"), (col("sdl") - col("__rsdl")).as("sdl"))
      .select(col("n"), when(col("n") > 0,
        col("sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"),
        col("sdl"))
    Bm25Index(postings, stats)
  }

  /** SERVE BM25 from a materialized [[Bm25Index]]: same scoring arithmetic
    * as [[bm25TopK]] ([[idfMilli]]/[[scoreMilli]] are shared), but the
    * corpus side is the postings table — already tokenized, tf'd, and
    * length-joined at build time. The only corpus-sized operation left is
    * the broadcast-semi prune of postings down to query-term rows; df is
    * re-aggregated from the pruned postings (corpus-exact, since pruning
    * is by token), everything after is query-vocabulary-sized.
    * q_bm25_topk_served pins served ≡ direct ≡ oracle through a parquet
    * round-trip of the index. Output: (query_id, idCol, score, rn). */
  def bm25TopKFromIndex(index: Bm25Index,
      queries: org.apache.spark.sql.DataFrame, k: Int = 10,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query",
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val toksFn = tokensIn(queries.sparkSession)
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(toksFn(col(queryTextCol)))).as("token"))
    // NOT persisted (a persist here was tried and REVERTED): `pruned`
    // feeds both the idf side and the perTerm side, but caching it keys
    // the CacheManager on the canonicalized plan — two serves over the
    // SAME artifact path (the postings parquet) canonicalize identically
    // even after the artifact was compacted/retracted/resumed in between,
    // so the second serve silently returns the FIRST serve's rows
    // (StreamingSpec's resume-after-compaction scenarios caught exactly
    // that). Instead the two consumers share ONE execution of the
    // postings lineage through an explicit token shuffle seam: both
    // subtrees start at the same repartition Exchange, so ReusedExchange
    // runs the scan+prune once (the q_simhash_neardup pattern); the df
    // aggregate needs no second exchange on token-partitioned input, and
    // the shuffle itself is query-term-pruned — never corpus-sized.
    val pruned = index.postings
      .select(col("token"), col(idCol).as("__doc"), col("tf"), col("dl"))
      .join(broadcast(qTerms.select("token").distinct()), Seq("token"))
      .repartition(col("token"))
    val idf = pruned.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(index.stats))
      .select(col("token"), idfMilli(col("n"), col("df")).as("__idf_m"))
    val perTerm = pruned
      .join(broadcast(idf), Seq("token"))
      .join(broadcast(qTerms), Seq("token"))
      .crossJoin(broadcast(index.stats.select(col("avgdl"))))
      .select(col("query_id"), col("__doc"),
        scoreMilli(col("tf"), col("dl"), col("__idf_m"), col("avgdl"), k1, b).as("__s_m"))
    bm25Rank(perTerm, k, idCol)
  }

  /** Positional bigram stream WITH multiplicity — an LM scores the token
    * SEQUENCE, so the distinct-gram machinery of the dedup family is the
    * wrong tool. One row per consecutive token pair of each doc. */
  private def bigramStream(df: org.apache.spark.sql.DataFrame, textCol: String,
      passthrough: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withColumn("__t", tokensIn(df.sparkSession)(col(textCol)))
      .where(size(col("__t")) >= 2)
      .select(passthrough.map(col) :+ explode(expr(
        "transform(sequence(1, size(__t) - 1), " +
          "i -> struct(element_at(__t, i) AS p, element_at(__t, i + 1) AS c))"))
        .as("__bg"): _*)
      .select(passthrough.map(col) :+ col("__bg.p").as("p") :+ col("__bg.c").as("c"): _*)

  /** CCNet-style LM quality scoring (Wenzek et al. 2020: rank a web corpus
    * by perplexity under a language model trained on a clean TARGET
    * corpus; low cross-entropy ≈ target-like text). The model here is a
    * bigram LM with add-1 smoothing over the target vocabulary V:
    *
    *   P(c | p) = (count(p,c) + 1) / (count(p,·) + V)
    *   xent(doc) = −(1/n) Σ over the doc's n token transitions of ln P
    *
    * (nats per transition; perplexity = e^xent, monotone — rank on xent).
    * Unseen transitions fall back to the same formula with count 0; an
    * unseen predecessor degrades to 1/V.
    *
    * Cross-engine determinism is the DSIR recipe ([[graft.ops.Dedup
    * .importanceWeights]]): each transition's ln is quantized to integer
    * MILLI-NATS before the per-doc sum (order-free integer aggregation),
    * and the final xent is a chain of two IEEE divisions of exact
    * integers — bit-identical in any engine.
    *
    * Scale shape: LM counts are two partial-agg aggregates over the
    * target's transition stream (shuffle ∝ distinct bigrams); docs'
    * transitions join the count tables on 8-byte xxhash64 digests (the
    * [[graft.ops.Dedup.ngramJaccard]] trade — the oracle replays string
    * keys; a digest collision perturbs one transition's count), then ONE
    * per-doc integer sum. V and the smoothing totals ride a broadcast
    * 1-row frame. Nothing quadratic, no driver data paths. Docs with < 2
    * tokens (or null text) stay in the report with n_bigrams = 0 and a
    * null score — the [[graft.ops.Dedup.contamination]] convention that
    * absence reads as a decision downstream.
    *
    * Output: (idCol, n_bigrams, xent) for EVERY doc; filter/rank on xent. */
  def lmPerplexity(docs: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val tgtBg = bigramStream(target.where(col(textCol).isNotNull), textCol, Nil)
    val c2 = tgtBg.groupBy(col("p"), col("c")).agg(count(lit(1)).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = c2.groupBy(col("p")).agg(sum(col("c2")).as("c1"))
    val vocab = target.where(col(textCol).isNotNull)
      .select(explode(tokensIn(target.sparkSession)(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    // per-SEEN-bigram milli-nat score: ln((c2+1)/(c1+V))·1000, rounded
    val milli2 = c2.join(c1, Seq("p")).crossJoin(broadcast(vocab))
      .select(xxhash64(col("p"), col("c")).as("__k2"),
        round(log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
          * 1000, 0).cast("long").as("__m2"))
    // per-predecessor fallback: ln(1/(c1+V))·1000 for unseen transitions
    val milli1 = c1.crossJoin(broadcast(vocab))
      .select(xxhash64(col("p")).as("__k1"),
        round(log(lit(1.0) / (col("c1") + col("v")).cast("double")) * 1000, 0)
          .cast("long").as("__m1"))
    val docBg = bigramStream(
      docs.where(col(textCol).isNotNull)
        .select(col(idCol).as("__id"), col(textCol)), textCol, Seq("__id"))
    val scored = docBg
      .select(col("__id"), xxhash64(col("p"), col("c")).as("__k2"), xxhash64(col("p")).as("__k1"))
      .join(milli2, Seq("__k2"), "left")
      .join(milli1, Seq("__k1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("__id"), coalesce(col("__m2"), col("__m1"),
        // predecessor unseen in the target: P = 1/V
        round(log(lit(1.0) / col("v").cast("double")) * 1000, 0).cast("long")).as("__m"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__m")).as("__ms"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        ((lit(0L) - col("__ms")).cast("double") / lit(1000.0)
          / col("n_bigrams").cast("double")).as("xent"))
  }
}
