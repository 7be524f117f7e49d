package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Extension operators: dedup families, similarity search, text analysis. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L), // exact dup of 0
    (2L, "the quick brown fox jumps over a lazy dog", "en", "s", 41L),   // near-dup
    (3L, "completely different words entirely here now", "en", "s", 44L),
    (4L, "", "en", "s", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts under the min id") {
    val got = Dedup.exact(docs, "text", "doc_id").as[(String, Long)].collect().toMap
    assert(got("the quick brown fox jumps over the lazy dog") == 0L)
    assert(got.size == 4)
    val stats = Dedup.exactStats(docs, "text").as[(Long, Long, Long)].collect().head
    assert(stats == ((5L, 4L, 1L)))
  }

  test("chunkDedup: repeated spans survive only at first occurrence, docs reassemble in order") {
    // 2-word chunks: doc 0 = ["a b", "c d"], doc 1 = ["a b", "x y"],
    // doc 2 = ["c d", "a b"], doc 3 repeats doc 0 exactly -> fully emptied
    val d = Seq(
      (0L, "a b c d"), (1L, "a b x y"), (2L, "c d a b"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(d, chunkWords = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == (("a b c d", 2L, 2L)))  // first occurrence of both chunks
    assert(got(1L) == (("x y", 1L, 2L)))      // "a b" seen in doc 0
    assert(got(2L) == (("", 0L, 2L)))         // both chunks seen earlier
    assert(got(3L) == (("", 0L, 2L)))         // exact dup fully removed
  }

  test("shingles: k-grams, degenerate short docs collapse to one shingle") {
    val got = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b")) // fewer tokens than k
  }

  test("minhashLsh finds exact and near duplicates, est_jaccard ordered sanely") {
    // near-dup pair needs HIGH true jaccard for band collision to be
    // near-certain (one word changed in 18 → shingle jaccard ~0.84);
    // a ~0.5-jaccard pair makes the test a coin flip on hash seeds
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo"
    val d = Seq(
      (0L, base), (1L, base), // exact dups
      (2L, base.replace("india", "xray")), // near-dup of 0/1
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(d, shingleK = 2, numHashes = 32, bands = 8, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) == 1.0) // identical docs: all signature rows agree
    assert(pairs.contains((0L, 2L))) // near-dup surfaces
    assert(pairs((0L, 2L)) < 1.0 && pairs((0L, 2L)) >= 0.3)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs share fingerprints, disjoint docs don't") {
    val fps = Dedup.simhashGroups(docs, "text", "doc_id")
      .select("doc_id", "simhash").as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(3L))
    val groups = Dedup.simhashGroups(docs, "text", "doc_id")
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap
    assert(groups(1L) == 0L)
  }

  test("ngramJaccard: exact dup scores 1.0, disjoint doc pairs absent") {
    val got = Dedup.ngramJaccard(docs, n = 2, threshold = 0.1)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(got((0L, 1L)) == 1.0)
    assert(!got.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("ngramJaccardDeduped equals the direct form under every cap mode") {
    // duplicated corpus exercising every expansion branch: a 3-member exact
    // group (within-group pairs), a near-dup of it (cross-group pairs), a
    // duplicated SHORT text (0-gram group — must produce no pairs), hot
    // grams shared corpus-wide (cap pruning must use duplication-weighted
    // df), and a disjoint doc
    val d = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "the quick brown fox jumps over the lazy dog today"),
      (13L, "the quick brown fox jumps over a lazy dog today"),
      (14L, "tiny doc"), (15L, "tiny doc"),
      (16L, "the quick brown cat sits under the lazy dog today"),
      (17L, "completely different words entirely in this one here")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sorted.toSeq
    for ((abs, frac) <- Seq((None, None), (Some(3), None), (None, Some(0.5)))) {
      val direct = canon(Dedup.ngramJaccard(d, n = 2, threshold = 0.1,
        maxNgramFreq = abs.asInstanceOf[Option[Int]], maxNgramFreqFraction = frac))
      val composed = canon(Dedup.ngramJaccardDeduped(d, n = 2, threshold = 0.1,
        maxNgramFreq = abs.asInstanceOf[Option[Int]], maxNgramFreqFraction = frac))
      assert(composed == direct, s"cap mode (abs=$abs, frac=$frac)")
      if (abs.isEmpty && frac.isEmpty)
        assert(direct.exists { case (a, b, j) => a == 10L && b == 11L && j == 1.0 })
    }
  }

  test("ngramContainment: quoted short doc scores 1.0 one-way where jaccard stays low") {
    // doc 1 is doc 0's opening quoted verbatim: every 2-gram of 1 occurs
    // in 0, so containment(1 -> 0) = 1.0 while jaccard is ~len1/len0
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta"),
      (2L, "totally unrelated content lives here")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(d, n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cont((1L, 0L)) == 1.0, "the quote is fully contained in its source")
    assert(!cont.contains((0L, 1L)), "the long doc is NOT contained in the quote (3/9 < 0.5)")
    assert(!cont.keys.exists { case (a, b) => a == 2L || b == 2L })
    val jac = Dedup.ngramJaccard(d, n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => p._1 == 1L || p._2 == 1L),
      "symmetric jaccard misses the quote-inclusion pair at the same threshold")
  }

  test("ngramContainmentDeduped equals the direct form under every cap mode") {
    // same branch-covering corpus as the jaccard twin: 3-member exact
    // group, near-dup, duplicated short texts, hot grams, disjoint doc
    val d = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "the quick brown fox jumps over the lazy dog today"),
      (13L, "the quick brown fox jumps over a lazy dog today"),
      (14L, "tiny doc"), (15L, "tiny doc"),
      (16L, "the quick brown cat sits under the lazy dog today"),
      (17L, "completely different words entirely in this one here")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sorted.toSeq
    for ((abs, frac) <- Seq((None, None), (Some(3), None), (None, Some(0.5)))) {
      val direct = canon(Dedup.ngramContainment(d, n = 2, threshold = 0.1,
        maxNgramFreq = abs.asInstanceOf[Option[Int]], maxNgramFreqFraction = frac))
      val composed = canon(Dedup.ngramContainmentDeduped(d, n = 2, threshold = 0.1,
        maxNgramFreq = abs.asInstanceOf[Option[Int]], maxNgramFreqFraction = frac))
      assert(composed == direct, s"cap mode (abs=$abs, frac=$frac)")
      if (abs.isEmpty && frac.isEmpty) {
        assert(direct.contains((10L, 11L, 1.0)) && direct.contains((11L, 10L, 1.0)),
          "within-group containment is 1.0 in BOTH directions uncapped")
      }
    }
  }

  test("dropContained: longer container kills, equal-size ties keep min id, single-pass chain") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // 9 bigrams
      (1L, "alpha beta gamma delta"),               // quote of 0 AND of 5 -> dropped
      (5L, "alpha beta gamma delta epsilon zeta"),  // middle of the chain: in 0 -> dropped
      (2L, "totally unrelated content lives here"), // no qualifying container -> kept
      (3L, "tiny doc copy here"),                   // exact dup pair: mutual 1.0,
      (4L, "tiny doc copy here")                    //   equal size -> 4 drops, 3 keeps
    ).toDF("doc_id", "text")
    val kept = Dedup.dropContained(d, n = 2, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L))
    // the keep-longest guard: 0 is 5/9 ≈ 0.56-contained in 5 (over the
    // threshold!) but 5 is SHORTER, so 0 must survive — and 5 drops via 0
    // even though its own container 1-level up also dropped (single pass,
    // judged against the ORIGINAL corpus, not the survivor set)
    val pairs = Dedup.ngramContainment(d, n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains((0L, 5L)), "0 IS threshold-contained in shorter 5")
  }

  test("dedupAgainst: exact-vs-existing, within-shard collapse, fuzzy-vs-existing") {
    val existing = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (2L, "totally different text here now")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "alpha beta gamma delta epsilon"),       // exact dup of existing -> stage 1
      (13L, "new unique content in this shard"),     // survives
      (15L, "new unique content in this shard"),     // within-shard dup -> stage 2
      // repeated token: different TEXT than existing 0 (digest differs) but the
      // same distinct-token set => identical simhash, Hamming 0 -> stage 3
      (17L, "alpha alpha beta gamma delta epsilon"),
      (19L, "zzz qqq www eee rrr")                   // survives
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(existing, incoming)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(13L, 19L))
  }

  test("minhashAgainst: three stages from the signature artifact; served pairs ≡ direct") {
    // the artifact is what the standing corpus contributes — build it,
    // then clean the shard against it (no existing text in sight)
    val existing = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different text here now with words")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup -> stage 1
      (13L, "new unique content in this shard today"),        // survives
      (15L, "new unique content in this shard today"),        // within-shard dup -> stage 2
      // shares all but one shingle with existing 0: est_jaccard over the
      // 32-hash signature clears 0.5 -> stage 3 fuzzy kill
      (17L, "alpha beta gamma delta epsilon zeta eta iota"),
      (19L, "zzz qqq www eee rrr ttt yyy uuu")                // survives
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(existing)
    val kept = Dedup.minhashAgainst(sigs, incoming, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(13L, 19L), s"stage fold broke: $kept")
    // build/serve identity: pairs from the round-trippable signature
    // table equal the direct minhashLsh over the same corpus
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sorted.toSeq
    val direct = canon(Dedup.minhashLsh(corpus, threshold = 0.35))
    val served = canon(Dedup.minhashPairsFromSignatures(
      Dedup.minhashSignatures(corpus), threshold = 0.35))
    assert(served == direct, "served pairs diverged from the direct form")
  }

  test("prototypicalityPrune: per-cell hardness quota, orderings, zero-norm last") {
    val emb = Seq(
      (0L, Array(1f, 0f)),      // cell-0 centroid (proto 1.0)
      (1L, Array(0f, 1f)),      // cell-1 centroid (proto 1.0)
      (2L, Array(1f, 0.1f)),    // cell 0, near-prototypical
      (3L, Array(0.5f, 0.45f)), // cell 0, hard (lowest cosine)
      (4L, Array(0f, 0f))       // zero-norm: dot ties -> higher cell (1), null proto
    ).toDF("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell", "rn").as[(Long, Int, Int)].collect()
        .map(r => (r._2, r._3) -> r._1).toMap
    val hard = ids(Similarity.prototypicalityPrune(emb, nLists = 2, perCell = 2))
    assert(hard((0, 1)) == 3L && hard((0, 2)) == 2L,
      "keepHardest ranks the farthest-from-centroid members first")
    assert(hard((1, 1)) == 1L && hard((1, 2)) == 4L,
      "zero-norm vector lands in the tie-break cell with a null proto ranked LAST")
    val easy = ids(Similarity.prototypicalityPrune(emb, nLists = 2, perCell = 2,
      keepHardest = false))
    assert(easy((0, 1)) == 0L && easy((0, 2)) == 2L,
      "keepHardest=false flips to most-prototypical-first")
  }

  test("lmPerplexity: hand-computed add-1 bigram scores incl. every fallback rung") {
    // target "a b a b c": c2 = {(a,b):2, (b,a):1, (b,c):1}, c1 = {a:2, b:2}, V=3
    val target = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),  // seen transitions: ln(3/5) + ln(2/5) -> (-511) + (-916)
      (2L, "b z"),    // unseen bigram, seen prev: ln(1/(2+3)) -> -1609
      (3L, "c a"),    // unseen prev: ln(1/V) = ln(1/3) -> -1099
      (4L, "x"),      // single token: no transitions
      (5L, null.asInstanceOf[String]) // null text: stays in the report
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmPerplexity(docs, target)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(math.rint(r.getDouble(2) * 10000) / 10000)))).toMap
    assert(got(1L) == ((2L, Some(0.7135))), s"seen-transition doc: ${got(1L)}")
    assert(got(2L) == ((1L, Some(1.609))), "unseen bigram falls back to 1/(c1+V)")
    assert(got(3L) == ((1L, Some(1.099))), "unseen predecessor falls back to 1/V")
    assert(got(4L) == ((0L, None)), "short doc reports n_bigrams=0, null score")
    assert(got(5L) == ((0L, None)), "null text stays in the report")
  }

  test("chunkText: overlapping windows, short-doc single chunk, empty doc kept") {
    val d = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7"),  // 7 words, width 4 stride 2 -> chunks at 0,2,4
      (1L, "a b"),                   // short: one chunk
      (2L, "")                       // empty: one empty chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkText(d, chunkWords = 4, strideWords = 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2).map(c => (c._3, c._4)).toSeq }
    assert(got(0L) == Seq(("w1 w2 w3 w4", 4L), ("w3 w4 w5 w6", 4L), ("w5 w6 w7", 3L)))
    assert(got(1L) == Seq(("a b", 2L)))
    assert(got(2L) == Seq(("", 0L)))
  }

  test("weightedSample: matches a JVM replay of the A-ES priorities; zero weights dropped") {
    import graft.ops.Sampling
    val rows = (0L until 40L).map(i => (i, if (i % 2 == 0) "a" else "b",
      if (i == 13L) 0L else (i % 7) + 1L))
    val df = rows.toDF("doc_id", "grp", "w").repartition(5)
    def md5u(key: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 1d) / 1152921504606846976.0
    }
    val expect = rows.filter(_._3 > 0)
      .map { case (id, g, w) => (g, id, math.rint(math.log(md5u(id)) / w * 1e6).toLong) }
      .groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, id, _), i) => (g, id, i + 1) }
      }.toSet
    val got = Sampling.weightedSample(df, "w", "doc_id", 3, Some("grp"))
      .select("grp", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(got == expect)
    assert(!got.exists(_._2 == 13L), "zero-weight rows can never be sampled")
    // global form: top-3 overall, ranked 1..3, same priority order
    val globalExpect = rows.filter(_._3 > 0)
      .map { case (id, _, w) => (id, math.rint(math.log(md5u(id)) / w * 1e6).toLong) }
      .sortBy(r => (-r._2, r._1)).take(3).map(_._1)
    val globalGot = Sampling.weightedSample(df, "w", "doc_id", 3, None)
      .orderBy("sample_rank").select("doc_id").as[Long].collect().toSeq
    assert(globalGot == globalExpect)
  }

  test("topTermsPerGroup: distinctive tokens rank first, min-count floors hapax noise") {
    val d = Seq(
      (0L, "a", "alpha alpha alpha alpha alpha common common common"),
      (1L, "a", "alpha alpha alpha common common rare"),
      (2L, "b", "beta beta beta beta beta common common common"),
      (3L, "b", "beta beta beta common common")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.topTermsPerGroup(d, "source", "text", k = 3, minCount = 3L)
      .as[(String, String, Long, Double, Int)].collect()
    val byGroup = got.groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._5).map(_._2).toSeq }
    // "alpha" occurs only in a, "beta" only in b -> maximal PMI in each
    assert(byGroup("a").head == "alpha")
    assert(byGroup("b").head == "beta")
    // "rare" (count 1 < minCount) never appears
    assert(!got.exists(_._2 == "rare"))
    // "common" has near-zero PMI in both groups (present everywhere)
    assert(got.filter(_._2 == "common").forall(r => math.abs(r._4) < 0.2))
  }

  test("bm25TopK: hand-computed scores, idf ordering, tie-break, empty query terms absent") {
    val corpus = Seq(
      (0L, "apple banana apple"),        // tf(apple)=2, dl=3
      (1L, "apple cherry"),              // tf(apple)=1, dl=2
      (2L, "banana banana banana"),      // no apple
      (3L, "durian")
    ).toDF("doc_id", "text")
    val qs = Seq(("qa", "apple"), ("qb", "apple banana"), ("qc", "missingword"))
      .toDF("query_id", "query")
    val got = TextAnalysis.bm25TopK(corpus, qs, k = 10)
      .as[(String, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._4).map(r => (r._2, r._3)) }
    // hand-computed qa: N=4, df(apple)=2, idf=ln((4-2+.5)/(2+.5)+1)=ln(2)
    // → idf_m=693; avgdl=(3+2+3+1)/4=2.25
    // doc0: tf=2, dl=3 → 693*(2*2.2)/(2+1.2*(0.25+0.75*3/2.25)) = 693*4.4/3.5
    // doc1: tf=1, dl=2 → 693*2.2/(1+1.2*(0.25+0.75*2/2.25)) = 693*2.2/2.1
    val qa = got("qa")
    assert(qa.map(_._1).toSeq == Seq(0L, 1L))
    assert(qa.head._2 == math.rint(693 * (2 * (1.2 + 1)) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.25))) / 1000)
    assert(qa(1)._2 == math.rint(693 * (1 * (1.2 + 1)) / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2.25))) / 1000)
    // qb: banana adds doc2 (tf=3); all three docs rank, scores positive
    assert(got("qb").map(_._1).toSet == Set(0L, 1L, 2L))
    assert(got("qb").forall(_._2 > 0))
    // qc: term absent from the corpus -> no rows at all
    assert(!got.contains("qc"))
  }

  test("bm25TopKFromIndex over a parquet round-trip equals the direct bm25TopK") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs = Seq(("qa", "apple spark table"), ("qb", "stream merge window query"))
      .toDF("query_id", "query")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Double, Int)].collect().sorted.toSeq
    val direct = canon(TextAnalysis.bm25TopK(corpus, qs, k = 7))
    val built = TextAnalysis.bm25Index(corpus)
    // in-plan serve
    assert(canon(TextAnalysis.bm25TopKFromIndex(built, qs, k = 7)) == direct)
    // materialized serve: the index must survive parquet as a plain table
    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    try {
      built.postings.write.mode("overwrite").parquet(s"$dir/postings")
      built.stats.write.mode("overwrite").parquet(s"$dir/stats")
      val stored = TextAnalysis.Bm25Index(
        spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/stats"))
      assert(canon(TextAnalysis.bm25TopKFromIndex(stored, qs, k = 7)) == direct)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("bm25StatsFromPostings equals bm25Index.stats (null-text docs, empty corpus)") {
    // the r18 single-tokenize build path: stats derived from materialized
    // postings + the corpus count must be BIT-identical to the build's own
    // stats plan — including docs with null/empty text (counted in n, no
    // postings rows) and the empty corpus (n=0 guard)
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, null: String), (90002L, ""))
        .toDF("doc_id", "text"))
    val built = TextAnalysis.bm25Index(corpus)
    val fromBuild = built.stats.as[(Long, Double, Long)].collect().head
    val dir = java.nio.file.Files.createTempDirectory("bm25sfp").toString
    try {
      built.postings.write.mode("overwrite").parquet(s"$dir/p")
      val derived = TextAnalysis.bm25StatsFromPostings(
        spark.read.parquet(s"$dir/p"), corpus.count())
        .as[(Long, Double, Long)].collect().head
      assert(derived == fromBuild, "derived stats diverged from the build's")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
    val empty = corpus.where(lit(false))
    val emptyStats = TextAnalysis.bm25StatsFromPostings(
      TextAnalysis.bm25Index(empty).postings, 0L)
      .as[(Long, Double, Long)].collect().head
    assert(emptyStats == ((0L, 0d, 0L)), "empty-corpus stats must be the zero row")
  }

  test("bm25IndexMerge: per-shard builds merge into the whole-corpus index exactly") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs = Seq(("qa", "spark table window"), ("qb", "fast stream customer"))
      .toDF("query_id", "query")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Double, Int)].collect().sorted.toSeq
    val whole = canon(TextAnalysis.bm25TopKFromIndex(TextAnalysis.bm25Index(corpus), qs, k = 6))
    // 2-way parity split and a skewed 3-way split — both must reproduce the
    // monolithic build bit-for-bit (postings disjoint, stats from exact sums)
    val splits = Seq(
      Seq(pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1),
      Seq(col("doc_id") < 50, col("doc_id") >= 50 && col("doc_id") < 400, col("doc_id") >= 400))
    for ((preds, i) <- splits.zipWithIndex) {
      val merged = TextAnalysis.bm25IndexMerge(
        preds.map(p => TextAnalysis.bm25Index(corpus.where(p))))
      assert(canon(TextAnalysis.bm25TopKFromIndex(merged, qs, k = 6)) == whole,
        s"split #$i diverged from the monolithic build")
      // the merged stats row itself must match the whole-corpus one
      val w = TextAnalysis.bm25Index(corpus).stats.as[(Long, Double, Long)].collect().head
      assert(merged.stats.as[(Long, Double, Long)].collect().head == w)
    }
  }

  test("ivfTopKFromIndex equals the direct search, bootstrap and refined") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val probes = emb.where(col("vec_id") < 8)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val direct = canon(Similarity.ivfTopK(emb, probes, k = 4, nLists = 8, nProbe = 3))
    val served = canon(Similarity.ivfTopKFromIndex(
      Similarity.ivfIndex(emb, nLists = 8), emb, probes, k = 4, nProbe = 3))
    assert(served == direct, "bootstrap index serve diverged")
    val directRef = canon(Similarity.ivfRefinedTopK(emb, probes, k = 4,
      nLists = 8, nProbe = 3, iters = 2))
    val servedRef = canon(Similarity.ivfTopKFromIndex(
      Similarity.ivfIndex(emb, nLists = 8, iters = 2), emb, probes, k = 4, nProbe = 3))
    assert(servedRef == directRef, "refined index serve diverged")
    // the sharded/incremental build: per-shard ivfAssign against the SAME
    // centroids unions into exactly the monolithic assignment table
    val ix = Similarity.ivfIndex(emb, nLists = 8)
    val whole = ix.assignments.as[(Long, Int)].collect().sorted.toSeq
    val halves = Seq(col("vec_id") % 2 === 0, col("vec_id") % 2 === 1)
      .map(p => Similarity.ivfAssign(emb.where(p), ix.centroids))
      .reduce(_ unionByName _).as[(Long, Int)].collect().sorted.toSeq
    assert(halves == whole, "shard-wise assignment diverged from the monolithic build")
    // ...and serving from the shard-built assignment equals the direct serve
    val servedSharded = canon(Similarity.ivfTopKFromIndex(
      Similarity.IvfIndex(ix.centroids,
        Seq(col("vec_id") % 2 === 0, col("vec_id") % 2 === 1)
          .map(p => Similarity.ivfAssign(emb.where(p), ix.centroids))
          .reduce(_ unionByName _)),
      emb, probes, k = 4, nProbe = 3))
    assert(servedSharded == direct, "sharded-assignment serve diverged")
  }

  test("simhashNearDup64Deduped equals the direct form, capped and uncapped") {
    // duplicated near-dup cluster + duplicated empty docs (fp 0 group) +
    // a disjoint doc; the cap must prune by duplication-weighted block df
    val d = Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"),
      (21L, "the quick brown fox jumps over the lazy dog today"),
      (22L, "the quick brown fox jumps over a lazy dog today"),
      (23L, ""), (24L, ""),
      (25L, "completely different words entirely in this one here")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().sorted.toSeq
    for (cap <- Seq(None, Some(2), Some(50))) {
      val direct = canon(Dedup.simhashNearDup64(d, maxBlockFreq = cap))
      val composed = canon(Dedup.simhashNearDup64Deduped(d, maxBlockFreq = cap))
      assert(composed == direct, s"cap=$cap")
      if (cap.isEmpty) {
        assert(direct.contains((20L, 21L, 0)))   // within-group pair
        assert(direct.contains((23L, 24L, 0)))   // empty-doc group pairs too
      }
    }
  }

  test("minhashLshDeduped equals the direct form, capped and uncapped, nulls dropped") {
    // exact triple (within-group 1.0 pairs), a near-dup of it (cross-group
    // expansion), duplicated NULL texts (null signatures — the direct form
    // drops their pairs via the null estimate, the composed form must too),
    // and a disjoint doc; the cap must prune by duplication-weighted
    // bucket frequency
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo"
    val d = Seq(
      (30L, Some(base)), (31L, Some(base)), (32L, Some(base)),
      (33L, Some(base.replace("india", "xray"))),
      (34L, None: Option[String]), (35L, None: Option[String]),
      (36L, Some("completely different words entirely here now"))
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sorted.toSeq
    for (cap <- Seq(None, Some(2), Some(50))) {
      val direct = canon(Dedup.minhashLsh(d, shingleK = 2, numHashes = 32,
        bands = 8, threshold = 0.3, maxBucketFreq = cap))
      val composed = canon(Dedup.minhashLshDeduped(d, shingleK = 2, numHashes = 32,
        bands = 8, threshold = 0.3, maxBucketFreq = cap))
      assert(composed == direct, s"cap=$cap")
      if (cap.isEmpty) {
        assert(direct.contains((30L, 31L, 1.0)) && direct.contains((31L, 32L, 1.0)),
          "within-group pairs carry est 1.0")
        assert(direct.exists { case (a, b, _) => a == 30L && b == 33L },
          "cross-group near-dup expands")
        assert(!direct.exists { case (a, b, _) => a >= 34L && b <= 35L },
          "null-text pairs dropped in both forms")
      }
      if (cap == Some(2))
        assert(!direct.exists { case (a, b, _) => (a >= 30L && a <= 33L) && b <= 33L },
          "weighted bucket cap prunes the whole duplicated cluster (freq 3 or 4 > 2)")
    }
  }

  test("cosine: identity 1, orthogonal 0, zero-norm null (ANSI-safe)") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(0f, 0f))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(1.0), Some(0.0), None))
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(0.9f, 0.1f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 0), (4L, Array(-1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.bruteForceTopK(corpus, Seq(1f, 0f, 0f), 2, excludeSelfId = Some(1L))
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("LSH buckets: identical vectors collide; topK returns self-match first") {
    val corpus = Seq(
      (1L, Array.fill(8)(1f), 0), (2L, Array.fill(8)(1f), 0),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.lshTopK(corpus, corpus.where(col("vec_id") === 1), k = 2,
      numPlanes = 6, dim = 8)
      .select("corpus_id", "cosine").as[(Long, Double)].collect().toMap
    assert(got.contains(2L) && got(2L) == 1.0)
  }

  test("resizeMeta fits the box, preserves aspect, never upscales, floors at 1") {
    val assets = Seq((1L, 640, 480), (2L, 100, 50), (3L, 1, 4480))
      .toDF("asset_id", "width", "height")
    val got = graft.ops.Multimodal.resizeMeta(assets)
      .select("asset_id", "out_width", "out_height").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((224, 168)))   // downscale, aspect preserved
    assert(got(2L) == ((100, 50)))    // small image untouched (no upscale)
    assert(got(3L) == ((1, 224)))     // extreme aspect floors width at 1
  }

  test("sampleFrames emits rows only for videos at the requested cadence") {
    val assets = graft.ops.Multimodal.assetsFromText(spark, docs, "doc_id", "text")
    val frames = graft.ops.Multimodal.sampleFrames(assets, everyMs = 10000L)
    val byAsset = frames.groupBy("asset_id").count()
      .as[(Long, Long)].collect().toMap
    // doc_id % 3 == 2 -> video (docs 2); others produce no frames
    assert(byAsset.keySet == Set(2L))
    // frame count = floor(duration/10s)+1, duration deterministic from stub
    assert(byAsset(2L) >= 1)
    val offsets = frames.select("frame_ms").as[Long].collect().sorted
    assert(offsets.head == 0L && offsets.sliding(2).forall {
      case Array(a, b) => b - a == 10000L; case _ => true
    })
  }

  test("extractFeatures: deterministic fixed-dim embeddings feed similarity ops") {
    val assets = graft.ops.Multimodal.assetsFromText(spark, docs, "doc_id", "text")
    val feats = graft.ops.Multimodal.extractFeatures(assets, dim = 8)
    assert(feats.schema == graft.ops.Multimodal.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 5 && rows.forall(_.getSeq[Float](2).length == 8))
    // deterministic: same payload -> same embedding (docs 0 and 1 identical)
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(byId(0L) == byId(1L))
    assert(byId(0L) != byId(3L))
    // output plugs straight into the similarity surface
    val top = graft.ops.Similarity.bruteForceTopKJoin(
      feats.withColumnRenamed("feature", "embedding").withColumnRenamed("asset_id", "vec_id"),
      feats.withColumnRenamed("feature", "embedding").withColumnRenamed("asset_id", "vec_id")
        .where(col("vec_id") === 0), 1)
    assert(top.select("corpus_id").as[Long].collect().head == 1L) // its exact dup
  }

  test("groupOverlap: union sketch equals whole-group signature (min of mins)") {
    import org.apache.spark.sql.functions.call_function
    // signature(union of docs) computed via the aggregate must equal the
    // signature of the concatenated text: min over a union = min of mins
    val parts = Seq(("g", "aa bb cc dd ee"), ("g", "ff gg hh ii jj")).toDF("source", "text")
    val whole = Seq(("g", "aa bb cc dd ee ff gg hh ii jj")).toDF("source", "text")
    def unionSig(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), graft.ops.TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("source"), call_function("graft_minhash", col("__toks"), lit(2), lit(16)).as("sig"))
      .groupBy("source").agg(call_function("graft_minhash_union", col("sig")).as("usig"))
      .select("usig").as[Seq[Long]].collect().head
    // NOTE: shingles spanning the concatenation seam ("ee ff") exist only in
    // `whole`; compare against the union of part-signatures instead
    val partsSig = unionSig(parts)
    val wholeSig = unionSig(whole)
    // every positional min of the parts must be >= the whole's (whole has a
    // superset of shingles), and most positions agree
    assert(partsSig.zip(wholeSig).forall { case (p, w) => p >= w })
    assert(partsSig.zip(wholeSig).count { case (p, w) => p == w } >= 12)

    // overlap scoring: identical groups -> 1.0, disjoint -> low
    val d = Seq(("s1", "aa bb cc dd ee"), ("s2", "aa bb cc dd ee"),
      ("s3", "zz yy xx ww vv")).toDF("source", "text")
    val got = graft.ops.Dedup.groupOverlap(d, "source", shingleK = 2, numHashes = 16)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 1.0)
    assert(got(("s1", "s3")) < 0.5)
  }

  test("multi-probe LSH recall is monotone and reaches beyond single-bucket") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = corpus.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopKJoin(corpus, probes, 5)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recall(mp: Int): Double = {
      val got = Similarity.lshTopK(corpus, probes, 5, numPlanes = 10, dim = 64,
        multiProbe = mp)
        .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r0 = recall(0); val r4 = recall(4); val r10 = recall(10)
    assert(r0 <= r4 + 1e-9 && r4 <= r10 + 1e-9, s"recall not monotone: $r0 $r4 $r10")
    assert(r10 > r0, s"multi-probe should find neighbors single-bucket missed ($r0 vs $r10)")
  }

  test("ivfTopK with nProbe = nLists is exact (matches brute force)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = corpus.where(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "corpus_id", "rn").as[(Long, Long, Int)].collect().toSet
    val exact = rows(Similarity.bruteForceTopKJoin(corpus, probes, 5))
    val ivfAll = rows(Similarity.ivfTopK(corpus, probes, 5, nLists = 8, nProbe = 8))
    assert(ivfAll == exact)
    // restricted probe count returns k rows per probe from its own cells
    val ivf = Similarity.ivfTopK(corpus, probes, 5, nLists = 8, nProbe = 2)
    val counts = ivf.groupBy("probe_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5))
  }

  test("ivfRefinedTopK: refinement moves centroids but keeps the search contract") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = corpus.where(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "corpus_id", "rn").as[(Long, Long, Int)].collect().toSet
    // probing every refined cell is still exact brute force
    val exact = rows(Similarity.bruteForceTopKJoin(corpus, probes, 5))
    assert(rows(Similarity.ivfRefinedTopK(corpus, probes, 5, nLists = 8, nProbe = 8, iters = 2)) == exact)
    // Lloyd rounds actually move the centroids off the bootstrap vectors
    val boot = Similarity.centroidBootstrap(corpus, 8, "vec_id", "embedding")
    val refined = Similarity.refinedCentroids(corpus, 8, 2, "vec_id", "embedding")
    assert(boot.map(_._1).toSeq == refined.map(_._1).toSeq, "cell ids must be stable")
    assert(boot.zip(refined).exists { case ((_, b), (_, r)) => !b.sameElements(r) },
      "two Lloyd rounds should move at least one centroid")
    // refinement is deterministic (same literals both times)
    val again = Similarity.refinedCentroids(corpus, 8, 2, "vec_id", "embedding")
    assert(refined.zip(again).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("textStats: hand-computed ratios on a known doc, empty doc safe") {
    val got = TextAnalysis.textStats(docs)
      .select("doc_id", "n_tokens", "stopword_ratio", "distinct_ratio")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 0: 9 tokens, stopwords {the,the,over? no: over not in list} -> the×2 = 2/9
    assert(got(0L)._1 == 9L)
    assert(got(0L)._2 == math.rint(2.0 / 9.0 * 1e6) / 1e6)
    assert(got(0L)._3 == math.rint(8.0 / 9.0 * 1e6) / 1e6) // "the" repeats
    assert(got(4L) == ((0L, 0.0, 0.0))) // empty doc: no ANSI crash, zeroed
  }

  test("langId picks the dominant lexicon and 'und' for no hits") {
    val d = Seq((1L, "the cat and the dog of it"), (2L, "xyzzy plugh qwerty"),
      (3L, "le chat et la vie est une pour")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(d).select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "und", 3L -> "fr"))
  }

  test("fingerprint: stable rolling hash, matches a JVM reference computation") {
    val s = "abc"
    val want = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = Seq(s).toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(got.head == want)
    // empty text hashes to the aggregate seed, not a crash
    val empty = Seq("").toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(empty.head == 0L)
  }

  test("tokenCount: BPE-ish regex counts words, numbers, punctuation") {
    val got = Seq("hello, world 42!").toDF("text")
      .select(TextAnalysis.tokenCount(col("text"))).as[Int].collect()
    assert(got.head == 5) // hello , world 42 !
  }

  test("simhashNearDupFromFp: block candidates + exact popcount verify") {
    val fps = Seq(
      (1L, "0000000000000000"),
      (2L, "0000000000000003"), // ham(1,2)=2 -> pair
      (3L, "ffffffffffffffff"), // shares no block with 1/2 -> never a candidate
      (4L, "0000000000001f00"), // shares blocks with 1 but ham=5 > 3 -> verified out
      (5L, "3")                 // conv() dropped leading zeros; pads to fp 2's value
    ).toDF("doc_id", "fp")
    val got = graft.ops.Dedup.simhashNearDupFromFp(fps, nBlocks = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2), (1L, 5L, 2), (2L, 5L, 0)),
      s"expected exactly the <=3-bit pairs, got $got")
    // hot-block pruning yields a subset: ids 1, 2, 4, and 5 ALL carry block
    // value "0000" on blocks 0-2 (per-(bi,bv) frequency 4) — capping at 2
    // prunes those groups entirely
    val prunedPairs = graft.ops.Dedup.simhashNearDupFromFp(fps, nBlocks = 4,
      maxBlockFreq = Some(2)).as[(Long, Long, Int)].collect().toSet
    assert(prunedPairs.subsetOf(got))
    assert(prunedPairs.size < got.size, "the cap must actually drop hot-block candidates")
  }

  test("contamination: hand-computed overlap fractions against a reference corpus") {
    import graft.ops.Dedup
    val train = Seq(
      (1L, "a b c d e"),      // 3-grams: {abc, bcd, cde}
      (2L, "x y z w"),        // {xyz, yzw} — disjoint from reference
      (3L, "hi")              // <3 tokens → single whole-list gram "hi"
    ).toDF("doc_id", "text")
    val ref = Seq(
      (10L, "a b c d"),       // contributes {abc, bcd}
      (11L, "hi")             // contributes "hi"
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(train, ref)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((1L, 1L, 1.0)))
  }

  test("contamination: null-text docs stay in the report; null reference text adds no grams") {
    import graft.ops.Dedup
    val train = Seq(
      (1L, null.asInstanceOf[String]), // must NOT vanish from the report
      (2L, ""),                        // empty-token whole-list shingle
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val ref = Seq(
      (10L, "a b c"),
      (11L, null.asInstanceOf[String]) // contributes nothing — must not make '' docs "contaminated"
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(train, ref)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"null-text doc dropped: ${got.keySet}")
    assert(got(1L) == ((1L, 0L, 0.0)))
    assert(got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((1L, 1L, 1.0)))
  }

  test("repetitionStats: hand-computed signals; short and repetitious docs") {
    import graft.ops.TextAnalysis
    val d = Seq(
      (1L, "a b a b a b"),    // 2-grams: [a b, b a, a b, b a, a b] → top 'a b'=3/5
      (2L, "w x y z"),        // 3 distinct 2-grams, top 1/3
      (3L, "solo"),           // <2 tokens → single whole-list gram
      (4L, "")                // empty → single empty-string gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(d)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((5L, math.rint(2.0 / 5 * 1e6) / 1e6, math.rint(3.0 / 5 * 1e6) / 1e6)))
    assert(got(2L) == ((3L, 1.0, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(got(3L) == ((1L, 1.0, 1.0)))
    assert(got(4L) == ((1L, 1.0, 1.0)))
  }

  test("piiScrub: emails, IPv4s, long digit runs redacted; short numbers kept") {
    import graft.ops.TextAnalysis
    val d = Seq(
      "mail me at jo.do+x@sub.example.org today",
      "server 192.168.0.1 answered",
      "acct 123456789 but room 42 stays",
      "mixed a.b@c.de and 10.0.0.7 and 99999999"
    ).toDF("text")
    val got = d.select(TextAnalysis.piiScrub(col("text"))).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "server <IP> answered")
    assert(got(2) == "acct <NUM> but room 42 stays")
    assert(got(3) == "mixed <EMAIL> and <IP> and <NUM>")
  }

  test("hashSplit: deterministic across re-evaluation and repartitioning, ~80/20") {
    import graft.ops.Sampling
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id")
    val a = Sampling.hashSplit(d, "doc_id").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(d.repartition(13), "doc_id").as[(Long, String)].collect().toMap
    assert(a == b, "split membership must not depend on partitioning")
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.72 && trainFrac < 0.88, s"expected ~0.797 train fraction, got $trainFrac")
  }

  test("stratified sampleBy: per-class fractions hold within tolerance") {
    import graft.ops.Sampling
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fractions = Map("en" -> 0.5, "fr" -> 1.0)
    val sampled = Sampling.stratified(d.where(col("lang").isin("en", "fr")), "lang", fractions)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = d.where(col("lang").isin("en", "fr"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sampled("fr") == full("fr"), "fraction 1.0 must keep every row")
    val frac = sampled("en").toDouble / full("en")
    assert(frac > 0.35 && frac < 0.65, s"Bernoulli 0.5 sample drifted: $frac")
  }

  test("approximate sketches track their exact twins (HLL distinct, quantile)") {
    // events.ts is TIMESTAMP(NANOS); unread here, but the schema converter
    // still rejects the file without the legacy long mapping. Scoped with a
    // finally-restore so the shared session's conf can't leak into suites
    // that run after this one (test order must not change behavior).
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      val row = ev.agg(
        countDistinct(col("user_id")).as("exact_d"),
        approx_count_distinct(col("user_id")).as("approx_d"), // HLL++, default rsd 5%
        expr("percentile(value, 0.5)").as("exact_med"),
        expr("percentile_approx(value, 0.5, 1000)").as("approx_med")).collect().head
      val (ed, ad) = (row.getAs[Long]("exact_d"), row.getAs[Long]("approx_d"))
      assert(math.abs(ad - ed).toDouble / ed < 0.15, s"HLL drifted: exact=$ed approx=$ad")
      val (em, am) = (row.getAs[Double]("exact_med"), row.getAs[Double]("approx_med"))
      assert(math.abs(am - em) / math.max(em, 1e-9) < 0.05, s"quantile sketch drifted: $em vs $am")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("kmvDistinct: exact below k, estimator within KMV error bounds above k, nulls ignored") {
    import graft.ops.Sketches
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
    // below k: every group takes the exact path (n_seen < k ⇒ est == exact)
    val small = Sketches.kmvDistinct(d, "source", col("text"), k = 64)
      .as[(String, Long, Double)].collect()
    val exact = d.where(col("text").isNotNull).groupBy("source")
      .agg(countDistinct(col("text")).cast("double").as("x"))
      .as[(String, Double)].collect().toMap
    small.foreach { case (src, _, est) => assert(est == exact(src), s"$src exact path broke") }
    // above k: estimator path, per-group error within ~4/sqrt(k) (generous
    // tail; the mean tracks much tighter), and n_seen saturates at k
    val est = Sketches.kmvDistinct(d, "source", col("doc_id").cast("string"), k = 16)
      .as[(String, Long, Double)].collect()
    est.foreach { case (src, nSeen, e) =>
      assert(nSeen == 16L, s"$src did not saturate the sketch")
      assert(math.abs(e / 25.0 - 1.0) < 1.0, s"$src estimate wild: $e vs 25")
    }
    val mean = est.map(_._3).sum / est.length
    assert(math.abs(mean / 25.0 - 1.0) < 0.25, s"mean estimate drifted: $mean vs 25")
    // nulls carry no cardinality
    val withNulls = Seq(("a", Some("x")), ("a", None), ("a", Some("y")), ("b", None))
      .toDF("g", "v")
    val got = Sketches.kmvDistinct(withNulls, "g", col("v"), k = 4)
      .as[(String, Long, Double)].collect().toList
    assert(got == List(("a", 2L, 2.0)), s"null handling broke: $got")
  }

  test("KMV sketches merge exactly: estimate(merge(parts)) == kmvDistinct(whole), any split") {
    import graft.ops.Sketches
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Double)].collect().sorted.toSeq
    val whole = canon(Sketches.kmvDistinct(d, "source", col("text"), k = 16))
    // three deterministic splits with different shapes: parity, skewed
    // 90/10, three-way — and OVERLAPPING halves (a value sketched on both
    // sides must not double-count: the merge dedups hashes)
    val splits: Seq[Seq[org.apache.spark.sql.DataFrame]] = Seq(
      Seq(d.where(pmod(col("doc_id"), lit(2)) === 0), d.where(pmod(col("doc_id"), lit(2)) === 1)),
      Seq(d.where(pmod(col("doc_id"), lit(10)) === 0), d.where(pmod(col("doc_id"), lit(10)) =!= 0)),
      Seq(d.where(pmod(col("doc_id"), lit(3)) === 0), d.where(pmod(col("doc_id"), lit(3)) === 1),
        d.where(pmod(col("doc_id"), lit(3)) === 2)),
      Seq(d.where(col("doc_id") < 400), d.where(col("doc_id") >= 200)) // overlap
    )
    for ((parts, i) <- splits.zipWithIndex) {
      val sketches = parts.map(Sketches.kmvSketch(_, "source", col("text"), k = 16))
        .reduce(_ unionByName _)
      val merged = canon(Sketches.kmvEstimate(
        Sketches.kmvMerge(sketches, "source", k = 16), "source", k = 16))
      assert(merged == whole, s"split #$i: merged estimate diverged from the whole")
    }
    // merges compose: merge(merge(a, b), c) == sketch(whole) via a rollup
    val abc = splits(2).map(Sketches.kmvSketch(_, "source", col("text"), k = 16))
    val rolled = Sketches.kmvMerge(
      Sketches.kmvMerge(abc(0).unionByName(abc(1)), "source", k = 16).unionByName(abc(2)),
      "source", k = 16)
    assert(canon(Sketches.kmvEstimate(rolled, "source", k = 16)) == whole,
      "two-level rollup diverged")
  }

  test("contaminationBloom ≡ contamination, even with a deliberately lossy bloom") {
    import graft.ops.{Dedup, Sampling}
    val split = Sampling.hashSplit(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"), "doc_id")
    val train = split.where(col("split") === "train")
    val test = split.where(col("split") === "test")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val exact = canon(Dedup.contamination(train, test))
    // default geometry (FP ~1%) and a deliberately lossy 2-bits-per-gram
    // bloom (FP ~50%): the exact confirm must absorb EVERY false positive
    assert(canon(Dedup.contaminationBloom(train, test)) == exact,
      "bloom prefilter changed the contamination report")
    assert(canon(Dedup.contaminationBloom(train, test, bitsPerGram = 2)) == exact,
      "a lossy bloom must still be invisible behind the exact confirm")
  }

  test("quantileSketch: exact below k, merge ≡ whole across splits incl. overlap, nulls ignored") {
    import graft.ops.Sketches
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Double, Double)].collect().sorted.toSeq
    def est(sk: org.apache.spark.sql.DataFrame) =
      canon(Sketches.quantileEstimate(sk, "source", Seq(0.5 -> "p50", 0.9 -> "p90")))
    // below k: the sample IS the group, so estimates are the exact quantiles
    val exact = d.where(col("n_chars").isNotNull).groupBy("source")
      .agg(round(expr("percentile(CAST(n_chars AS DOUBLE), 0.5)"), 4).as("p50"),
        round(expr("percentile(CAST(n_chars AS DOUBLE), 0.9)"), 4).as("p90"))
      .as[(String, Double, Double)].collect()
      .map { case (s, a, b) => s -> ((a, b)) }.toMap
    est(Sketches.quantileSketch(d, "source", col("doc_id"), col("n_chars"), k = 64))
      .foreach { case (src, _, p50, p90) =>
        assert((p50, p90) == exact(src), s"$src exact path broke") }
    // merge exactness: bottom-k(union) == bottom-k(sides' bottom-ks), for
    // parity / skewed / 3-way / OVERLAPPING covers (the same row sketched
    // twice dedups on its (pri, v) pair), plus a two-level rollup
    val whole = est(Sketches.quantileSketch(d, "source", col("doc_id"), col("n_chars"), k = 16))
    val splits: Seq[Seq[org.apache.spark.sql.DataFrame]] = Seq(
      Seq(d.where(pmod(col("doc_id"), lit(2)) === 0), d.where(pmod(col("doc_id"), lit(2)) === 1)),
      Seq(d.where(pmod(col("doc_id"), lit(10)) === 0), d.where(pmod(col("doc_id"), lit(10)) =!= 0)),
      Seq(d.where(pmod(col("doc_id"), lit(3)) === 0), d.where(pmod(col("doc_id"), lit(3)) === 1),
        d.where(pmod(col("doc_id"), lit(3)) === 2)),
      Seq(d.where(col("doc_id") < 400), d.where(col("doc_id") >= 200)) // overlap
    )
    for ((parts, i) <- splits.zipWithIndex) {
      val sk = parts.map(Sketches.quantileSketch(_, "source", col("doc_id"), col("n_chars"), k = 16))
        .reduce(_ unionByName _)
      assert(est(Sketches.quantileMerge(sk, "source", k = 16)) == whole,
        s"split #$i: merged quantiles diverged from the whole")
    }
    val abc = splits(2).map(Sketches.quantileSketch(_, "source", col("doc_id"), col("n_chars"), k = 16))
    val rolled = Sketches.quantileMerge(
      Sketches.quantileMerge(abc(0).unionByName(abc(1)), "source", k = 16).unionByName(abc(2)),
      "source", k = 16)
    assert(est(rolled) == whole, "two-level quantile rollup diverged")
    // null values carry no mass; null keys drop with them
    val withNulls = Seq(("a", Some(1L), Some(10L)), ("a", Some(2L), None),
      ("a", Some(3L), Some(30L)), ("a", None, Some(99L)), ("b", Some(4L), None))
      .toDF("g", "k", "v")
    val got = Sketches.quantileEstimate(
      Sketches.quantileSketch(withNulls, "g", col("k"), col("v"), k = 4), "g",
      Seq(0.5 -> "p50"))
      .as[(String, Long, Double)].collect().toList
    assert(got == List(("a", 2L, 20.0)), s"null handling broke: $got")
  }

  test("budgetMix: deterministic, expected kept MASS near target, sqrt-damping by mass") {
    import graft.ops.Sampling
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    // skew by MASS: fold ten sources into one giant source
    val skewed = d.withColumn("source",
      when(col("source").isin((0 to 9).map("src" + _): _*), "big").otherwise(col("source")))
    val total = skewed.agg(sum("n_chars")).as[Long].head()
    val target = total / 3
    val kept = Sampling.budgetMix(skewed, "source", "doc_id", col("n_chars"), target)
    val again = Sampling.budgetMix(skewed.repartition(7), "source", "doc_id",
      col("n_chars"), target)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet,
      "budget mixing must not depend on partitioning")
    val got = kept.agg(sum("n_chars")).as[Long].head()
    assert(math.abs(got.toDouble / target - 1.0) < 0.35,
      s"kept mass $got strayed from target $target")
    // √-damping: the giant source's kept FRACTION of its own mass must be
    // below a small source's kept fraction
    val frac = kept.groupBy("source").agg(sum("n_chars").as("k"))
      .join(skewed.groupBy("source").agg(sum("n_chars").as("t")), Seq("source"))
      .select(col("source"), col("k").cast("double") / col("t").cast("double"))
      .as[(String, Double)].collect().toMap
    val smallFracs = frac.view.filterKeys(_ != "big").values
    assert(smallFracs.nonEmpty && frac("big") < smallFracs.min,
      s"sqrt damping inverted: $frac")
  }

  test("budgetMix/quantileSketch/minhashAgainst: documented edge contracts hold") {
    import graft.ops.{Dedup, Sampling, Sketches}
    // budgetMix: an all-null-mass source totals 0 → weight 0 → keeps nothing;
    // null-mass rows in a live source still draw their source's rate
    val d = Seq(("a", 1L, Some(100L)), ("a", 2L, None), ("a", 3L, Some(100L)),
      ("b", 4L, None), ("b", 5L, None)).toDF("source", "doc_id", "mass")
    val kept = Sampling.budgetMix(d, "source", "doc_id", col("mass"), targetMass = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(4L) && !kept.contains(5L),
      "a zero-mass source must keep nothing")
    assert(kept == Set(1L, 2L, 3L),
      s"target above total mass must keep the whole live source, got $kept")
    // quantileSketch: the k=2 lower bound is usable, k=1 rejected
    val q2 = Sketches.quantileEstimate(
      Sketches.quantileSketch(d, "source", col("doc_id"), col("mass"), k = 2),
      "source", Seq(0.5 -> "p50"))
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(q2.map(_._1) == Seq("a"), s"null-mass-only groups must vanish: $q2")
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(d, "source", col("doc_id"), col("mass"), k = 1)
    }
    // minhashAgainst: an EMPTY standing artifact reduces to the
    // within-shard exact collapse (the first-shard bootstrap case)
    val docs = Seq((1L, "one two three"), (2L, "one two three"),
      (3L, "four five six")).toDF("doc_id", "text")
    val empty = Dedup.minhashSignatures(docs.where(lit(false)))
    val kept2 = Dedup.minhashAgainst(empty, docs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(1L, 3L), s"empty-standing bootstrap broke: $kept2")
  }

  test("temperatureMix: deterministic, hits the target, sqrt-weights favor small sources") {
    import graft.ops.Sampling
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("source"))
    // skew the corpus: one giant source (all of src0..src9), several small
    val skewed = d.withColumn("source",
      when(col("source").isin((0 to 9).map("src" + _): _*), "big").otherwise(col("source")))
    val kept = Sampling.temperatureMix(skewed, "source", "doc_id", targetRows = 150)
    val again = Sampling.temperatureMix(skewed.repartition(7), "source", "doc_id", targetRows = 150)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet,
      "mixing must not depend on partitioning")
    val n = kept.count()
    assert(n > 100 && n < 200, s"expected ~150 kept rows, got $n")
    // √n weighting: the big source's keep RATE must be below the small ones'
    val rates = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    val fullCounts = skewed.groupBy("source").count().as[(String, Long)].collect().toMap
    val bigRate = rates.getOrElse("big", 0L).toDouble / fullCounts("big")
    val smallRates = fullCounts.keys.filter(_ != "big")
      .map(s => rates.getOrElse(s, 0L).toDouble / fullCounts(s))
    assert(bigRate < smallRates.min,
      s"temperature weighting inverted: big=$bigRate small=${smallRates.min}")
  }

  test("semanticDedup: larger id of every within-cell near-pair dropped, survivors clean") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val survivors = Similarity.semanticDedup(emb, threshold = 0.35, nLists = 16)
    val ids = survivors.select("vec_id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    assert(ids.subsetOf(all) && ids.size < all.size, "dedup must drop something, from the corpus")
    // no surviving within-cell pair may score >= threshold (every such pair
    // dropped its larger member), checked by re-scoring the survivor set
    val s = survivors.join(emb, "vec_id")
    val a = s.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = s.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("eb"))
    val bad = a.join(b, "cell").where(col("id_a") < col("id_b"))
      .where(Similarity.cosine(col("ea"), col("eb")) >= 0.35)
      .count()
    assert(bad == 0L, s"$bad surviving near-pairs remain")
    // the smallest id of the corpus can never be dropped
    assert(ids.contains(all.min), "minimum id must survive (only larger ids drop)")
    // exact-duplicate collapse is a pure optimization: duplicating the whole
    // corpus under higher ids must leave the survivor set IDENTICAL (every
    // copy is cosine-1 to its original, so copies always drop)
    val dup = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + 1000000L))
    val dupIds = Similarity.semanticDedup(dup, threshold = 0.35, nLists = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(dupIds == ids, "duplication changed the survivor set")
  }

  test("importanceWeights: target-aligned docs outscore off-target docs; nulls score as empty") {
    val target = Seq((100L, "alpha beta gamma delta"), (101L, "alpha beta gamma epsilon"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (0L, "alpha beta gamma delta"),         // pure target language
      (1L, "zeta eta theta iota"),            // never seen in target
      (2L, "alpha beta gamma iota"),          // shares one target trigram
      (3L, null.asInstanceOf[String])         // null → empty-doc convention
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.importanceWeights(raw, target)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L), "every raw doc must be scored")
    assert(got(0L)._2 > got(2L)._2 && got(2L)._2 > got(1L)._2,
      s"LLR ordering broke: $got")
    assert(got(1L)._2 < 0, "off-target doc must score negative")
    assert(got(3L)._1 == 1L, "null text scores as the single empty-list gram")
  }

  test("quantizeInt8: codes in range, max maps to ±127, error ≤ scale/2, zero vector safe") {
    val vecs = Seq(
      (0L, Array(1.0f, -2.0f, 0.5f, 4.0f)),   // absmax 4 → scale 4/127
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),    // zero vector
      (2L, Array(-3.0f, 3.0f, 1.5f, -1.5f))   // symmetric absmax
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.quantizeInt8(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getSeq[Int](r.fieldIndex("codes")),
          r.getAs[Double]("recon_mse")))
      .toMap
    val (s0, c0, m0) = got(0L)
    assert(c0.max == 127 && c0.forall(q => q >= -127 && q <= 127),
      s"codes out of range: $c0")
    assert(math.abs(s0 - 4.0 / 127.0) < 1e-9)
    // round-half error bound: every |x - q·s| ≤ s/2, so mse ≤ (s/2)²
    assert(m0 <= (s0 / 2) * (s0 / 2) + 1e-12, s"mse $m0 exceeds the rounding bound")
    val (s1, c1, m1) = got(1L)
    assert(s1 == 0.0 && c1.forall(_ == 0) && m1 == 0.0, "zero vector must be a no-op")
    assert(got(2L)._2.min == -127 && got(2L)._2.max == 127,
      "symmetric absmax must hit both int8 extremes")
  }

  test("quantizedTopK: scales cancel, rerank recovers exact, zero vector ranks last") {
    // v0 is v1 scaled 3× → identical codes → identical qcosine to any probe
    val corpus = Seq(
      (0L, Array(3.0f, 6.0f, -3.0f)),
      (1L, Array(1.0f, 2.0f, -1.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f)), // zero vector: qcosine null
      (4L, Array(-1.0f, -2.0f, 1.0f)) // antipode: qcosine -1
    ).toDF("vec_id", "embedding")
    val probes = corpus.where(col("vec_id") === 1L)
    val quant = graft.ops.Similarity.quantizedTopK(corpus, probes, k = 4)
      .orderBy("rn").collect()
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Double]("rn".replace("rn", "qcosine")), r.getAs[Int]("rn")))
    assert(quant.map(_._1).toSeq == Seq(0L, 2L, 4L, 3L),
      s"expected scaled-twin, then positive, antipode, null-last zero vector: ${quant.toSeq}")
    assert(quant(0)._2 == 1.0, "the 3×-scaled twin must score qcosine exactly 1.0 — scales cancel")
    // nulls rank LAST: zero vector must be rn 4, antipode rn 3
    val byId = quant.map(t => t._1 -> t._3).toMap
    assert(byId(3L) == 4 && byId(4L) == 3, s"null qcosine must sort after -1: ${quant.toSeq}")
    // rerank over the full corpus reproduces exact brute force
    val exact = graft.ops.Similarity.bruteForceTopKJoin(corpus, probes, 3)
      .select("corpus_id", "cosine", "rn").collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val rer = graft.ops.Similarity.quantizedTopK(corpus, probes, k = 3, rerankDepth = 4)
      .select("corpus_id", "cosine", "rn").collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(rer == exact, s"rerank depth = corpus size must equal exact: $rer vs $exact")
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.quantizedTopK(corpus, probes, k = 5, rerankDepth = 3)
    }
  }

  test("ivfQuantizedTopK: probing every cell reproduces the flat quantized ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = emb.where(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("qcosine"), r.getAs[Int]("rn"))).toSet
    val flat = asSet(graft.ops.Similarity.quantizedTopK(emb, probes, 5))
    val routed = asSet(graft.ops.Similarity.ivfQuantizedTopK(emb, probes, 5,
      nLists = 8, nProbe = 8))
    assert(routed == flat,
      s"nProbe == nLists must make routing a no-op: ${routed.diff(flat)} / ${flat.diff(routed)}")
    // a REAL routing (nProbe 2 of 8) returns k rows per probe from fewer candidates
    val narrow = graft.ops.Similarity.ivfQuantizedTopK(emb, probes, 5, nLists = 8, nProbe = 2)
    assert(narrow.groupBy("probe_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("pqEncode: bootstrap vectors self-assign with ~zero recon error; codes in range") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val enc = graft.ops.Similarity.pqEncode(emb, nSub = 8, nCodes = 8)
      .select("vec_id", "codes", "recon_mse")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toList
    assert(enc.nonEmpty)
    enc.foreach { case (id, codes, mse) =>
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 8),
        s"vec $id codes out of range: $codes")
      assert(mse > -1e-9, s"vec $id negative mse: $mse")
    }
    // the 8 lowest-id vectors ARE the codebooks: they reconstruct exactly
    enc.filter(_._1 < 8).foreach { case (id, codes, mse) =>
      assert(codes.forall(_ == id.toInt), s"bootstrap vec $id must self-assign: $codes")
      assert(math.abs(mse) < 1e-9, s"bootstrap vec $id must reconstruct exactly: $mse")
    }
  }

  test("refinedPqCodebooks: Lloyd rounds move the books, cut recon error, deterministic") {
    import org.apache.spark.sql.functions.lit
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val boot = graft.ops.Similarity.pqCodebooks(emb, 8, 8, "vec_id", "embedding")
    val ref = graft.ops.Similarity.refinedPqCodebooks(emb, 8, 8, 2, "vec_id", "embedding")
    assert(ref.length == boot.length && ref(0).length == boot(0).length &&
      ref(0)(0).length == boot(0)(0).length, "refinement must preserve shape")
    assert(boot.zip(ref).exists { case (bm, rm) =>
      bm.zip(rm).exists { case (b, r) => !b.sameElements(r) } },
      "two Lloyd rounds should move at least one sub-centroid")
    val again = graft.ops.Similarity.refinedPqCodebooks(emb, 8, 8, 2, "vec_id", "embedding")
    assert(ref.zip(again).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } },
      "refinement must be deterministic (6-dp literal means)")
    // the point of retraining: refined books reconstruct the corpus better
    // than the lowest-id bootstrap (mean MSE via the drift monitor)
    def mse(iters: Int): Double = {
      val books = graft.ops.Similarity.pqCodebookTable(
        emb, 8, 8, "vec_id", "embedding", iters)
      val codes = graft.ops.Similarity.pqEncodeAgainst(emb, books)
        .withColumn("batch", lit(0))
      graft.ops.Similarity.pqDriftStats(
        graft.ops.Similarity.PqIndex(books, codes), emb)
        .collect().head.getAs[Double]("mean_mse")
    }
    val before = mse(0); val after = mse(2)
    assert(after < before,
      s"Lloyd-refined books must cut mean reconstruction error: $after !< $before")
  }

  test("pqTopK: ADC exact on a codebook-only corpus; rerank = brute force; null/ragged rank last") {
    val corpus = Seq(
      (0L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (1L, Array(2.0f, 1.0f, 0.0f, -0.5f)),
      (2L, Array(-1.0f, -2.0f, 1.0f, -0.5f)), // antipode of 0
      (3L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (4L, null.asInstanceOf[Array[Float]]),  // null embedding
      (5L, Array(1.0f, 2.0f))                 // ragged width
    ).toDF("vec_id", "embedding")
    val probes = corpus.where(col("vec_id") === 0L)
    // corpus ids 0-3 ARE the codebook (nCodes = 4) → reconstruction is
    // exact → ADC cosine must equal the float cosine (both rounded 6)
    val adc = graft.ops.Similarity.pqTopK(corpus, probes, k = 5, nSub = 2, nCodes = 4)
      .select("corpus_id", "adc_cosine", "rn")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]), r.getInt(2))).toList
    val exact3 = graft.ops.Similarity.bruteForceTopKJoin(corpus, probes, 3)
      .select("corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    adc.filter(t => t._1 <= 3L).foreach { case (id, c, _) =>
      assert(c.contains(exact3(id)), s"ADC must be exact for codebook member $id: $c vs ${exact3(id)}")
    }
    // null + ragged vectors carry null ADC scores and take the LAST ranks
    val byId = adc.map(t => t._1 -> t._3).toMap
    assert(Set(byId(4L), byId(5L)) == Set(4, 5), s"null/ragged must rank last: $adc")
    assert(adc.filter(t => t._1 >= 4L).forall(_._2.isEmpty))
    // full-depth rerank reproduces brute force exactly
    val exact = graft.ops.Similarity.bruteForceTopKJoin(corpus, probes, 5)
      .select("corpus_id", "cosine", "rn").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    val rer = graft.ops.Similarity.pqTopK(corpus, probes, k = 5, nSub = 2, nCodes = 4,
        rerankDepth = 5)
      .select("corpus_id", "cosine", "rn").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    assert(rer == exact, s"rerank depth = corpus size must equal exact: $rer vs $exact")
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.pqTopK(corpus, probes, k = 5, rerankDepth = 3)
    }
  }

  test("ivfPqTopK: probing every cell reproduces the flat PQ-ADC ranking") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = emb.where(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "corpus_id", "adc_cosine", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3))).toSet
    val flat = asSet(graft.ops.Similarity.pqTopK(emb, probes, 5, nSub = 8, nCodes = 8))
    val routed = asSet(graft.ops.Similarity.ivfPqTopK(emb, probes, 5,
      nLists = 8, nProbe = 8, nSub = 8, nCodes = 8))
    assert(routed == flat,
      s"nProbe == nLists must make routing a no-op: ${routed.diff(flat)} / ${flat.diff(routed)}")
    // a REAL routing (2 of 8 cells) still returns k rows per probe
    val narrow = graft.ops.Similarity.ivfPqTopK(emb, probes, 5,
      nLists = 8, nProbe = 2, nSub = 8, nCodes = 8)
    assert(narrow.groupBy("probe_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("ivfPqResidualTopK: exact on codebook-bootstrap rows; null ranks last; offset skips centroid rows") {
    // rows 0-1 are the centroids (nLists = 2); rows 2-3 are the residual
    // codebook bootstrap (offset = nLists — their residuals ARE the books,
    // so their reconstruction is exact and their ADC score must equal the
    // float cosine). Without the offset the books would be the centroid
    // rows' identically-zero residuals (the measured recall-0.16 bug).
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f, -0.5f)),
      (1L, Array(-1.0f, 0.5f, -0.5f, 1.0f)),
      (2L, Array(1.2f, 0.3f, 0.4f, -0.2f)),   // cell 0, bootstrap residual
      (3L, Array(-0.8f, 0.7f, -0.3f, 0.9f)),  // cell 1, bootstrap residual
      (4L, Array(0.9f, -0.1f, 0.6f, -0.6f)),
      (5L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val probes = corpus.where(col("vec_id") === 0L)
    val res = graft.ops.Similarity.ivfPqResidualTopK(corpus, probes, k = 5,
      nLists = 2, nProbe = 2, nSub = 2, nCodes = 2)
      .select("corpus_id", "adc_cosine", "rn").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getInt(2))).toList
    assert(res.length == 5, s"all 5 non-probe rows must rank: $res")
    val exact = graft.ops.Similarity.bruteForceTopKJoin(corpus, probes, 5)
      .select("corpus_id", "cosine").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
    for (id <- Seq(2L, 3L)) {
      val got = res.find(_._1 == id).get._2
      assert(got == exact(id),
        s"codebook-bootstrap row $id reconstructs exactly, ADC must equal float cosine: $got vs ${exact(id)}")
    }
    // the null embedding carries a null score and takes the last rank
    val nullRow = res.find(_._1 == 5L).get
    assert(nullRow._2.isEmpty && nullRow._3 == 5, s"null must rank last: $res")
  }

  test("pqIndex: served ≡ direct; shard-union encode ≡ monolithic; per-row retraction algebra") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = emb.where(col("vec_id") < 5)
    val ix = graft.ops.Similarity.pqIndex(emb, nSub = 8, nCodes = 8)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "corpus_id", "adc_cosine", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3))).toSet
    val direct = asSet(graft.ops.Similarity.pqTopK(emb, probes, 5, nSub = 8, nCodes = 8))
    val served = asSet(graft.ops.Similarity.pqTopKFromIndex(ix, probes, 5))
    assert(served == direct, s"served diverged: ${served.diff(direct)} / ${direct.diff(served)}")
    // per-row encode: union of disjoint shard encodes == the monolithic codes
    def codesOf(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "codes", "recon_n2").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
    val shards = codesOf(
      graft.ops.Similarity.pqEncodeAgainst(emb.where(col("vec_id") % 2 === 0), ix.codebooks)
        .unionByName(graft.ops.Similarity
          .pqEncodeAgainst(emb.where(col("vec_id") % 2 === 1), ix.codebooks)))
    assert(shards == codesOf(ix.codes), "shard-union encode must equal monolithic")
    // retraction = anti-join on the codes table ≡ encode of the survivors
    val dels = emb.where(col("vec_id") >= 40).select("vec_id")
    val retracted = codesOf(ix.codes.join(dels, Seq("vec_id"), "left_anti"))
    val rebuilt = codesOf(graft.ops.Similarity.pqEncodeAgainst(
      emb.where(col("vec_id") < 40), ix.codebooks))
    assert(retracted == rebuilt, "retract(codes, D) must equal encode(W \\ D)")
  }

  test("duplicateSpans: cross-doc window fps counted per doc; short/null docs surface with 0") {
    val docs = Seq(
      (0L, "w2 w3 w4 z w2 w3 w4"),  // "w2 w3 w4" at pos 0 and 4
      (1L, "x w2 w3 w4"),           // shares the span once
      (2L, "all tokens unique here"),
      (3L, null.asInstanceOf[String]),
      (4L, "too short")             // 2 tokens < width 3
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicateSpans(docs, width = 3, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_windows"), r.getAs[Long]("dup_windows"), r.getAs[Double]("dup_ratio"))).toMap
    assert(got(0L) == ((5, 2L, 0.4)), s"doc 0: 5 windows, 2 dup occurrences: $got")
    assert(got(1L) == ((2, 1L, 0.5)), s"doc 1: $got")
    assert(got(2L) == ((2, 0L, 0.0)), s"unique doc must be clean: $got")
    assert(got(3L) == ((0, 0L, 0.0)) && got(4L) == ((0, 0L, 0.0)),
      s"null/short docs must surface with zero windows: $got")
  }

  test("duplicateSpansAgainst: standing bank scores incoming; self-repeats stay clean") {
    val standing = Seq((0L, "b1 b2 b3 b4 tail x")).toDF("doc_id", "text")
    val bank = graft.ops.Dedup.spanFingerprintBank(standing, width = 3)
    val incoming = Seq(
      (10L, "b1 b2 b3 b4"),         // both windows in the bank
      (11L, "z b2 b3 b4 q"),        // 1 of 3 windows in the bank
      (12L, "c c c c c c"),         // repeats ITSELF only — the contract: clean vs the bank
      (13L, "clean tokens only here"),
      (14L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicateSpansAgainst(incoming, bank, width = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_windows"), r.getAs[Long]("dup_windows"), r.getAs[Double]("dup_ratio")))).toMap
    assert(got(10L) == ((2, 2L, 1.0)), s"fully-banked doc: $got")
    assert(got(11L) == ((3, 1L, 0.333333)), s"partially-banked doc: $got")
    assert(got(12L) == ((4, 0L, 0.0)), s"self-repeating batch must score clean vs the bank: $got")
    assert(got(13L) == ((2, 0L, 0.0)) && got(14L) == ((0, 0L, 0.0)), s"clean/null: $got")
  }

  test("duplicateSpanIntervals: overlapping and touching windows merge, disjoint split") {
    val docs = Seq(
      (0L, "w1 w2 w3 w4 q r s w1 w2 w3 w4"), // dup at pos 0,1 and 7,8 → 2 islands of 4
      (1L, "w1 w2 w3 w4"),                   // both windows dup → 1 island, full coverage
      (2L, "all tokens unique here now"),
      (3L, null.asInstanceOf[String]),
      (4L, "s1 s2 s3 s1 s2 s3"),             // dup at pos 0 and 3: gap == width TOUCHES → merge
      (5L, "s1 s2 s3")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicateSpanIntervals(docs, width = 3, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_spans"),
          r.getAs[Long]("covered_tokens"), r.getAs[Double]("covered_ratio")))).toMap
    assert(got(0L) == ((11, 2, 8L, math.rint(8.0 / 11.0 * 1e6) / 1e6)), s"two islands of 4: $got")
    assert(got(1L) == ((4, 1, 4L, 1.0)), s"full-coverage island: $got")
    assert(got(2L) == ((5, 0, 0L, 0.0)) && got(3L) == ((0, 0, 0L, 0.0)), s"clean/null: $got")
    assert(got(4L) == ((6, 1, 6L, 1.0)),
      s"touching extents (gap == width) must merge into ONE island: $got")
  }

  test("topDuplicateSpans: reach-ranked fps with (min doc, min pos) example text") {
    val docs = Seq(
      (0L, "w2 w3 w4 z w2 w3 w4"),
      (1L, "x w2 w3 w4"),
      (2L, "w3 w4 z end"),          // shares "w3 w4 z" with doc 0 (pos 1)
      (3L, "all tokens unique here")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.topDuplicateSpans(docs, width = 3, topN = 5)
      .collect().map(r => r.getAs[String]("span_text") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("example_doc"), r.getAs[Int]("example_pos"))).toMap
    assert(got.size == 2, s"exactly two cross-doc spans: $got")
    assert(got("w2 w3 w4") == ((2L, 3L, 0L, 0)),
      s"3 occurrences across 2 docs, example = (doc 0, pos 0): $got")
    assert(got("w3 w4 z") == ((2L, 2L, 0L, 1)),
      s"example must be doc 0 pos 1 (min doc then min pos): $got")
  }

  test("invertedIndex: df counts all docs, postings cap at k lowest ids, minDf prunes") {
    val d = Seq(
      (10L, "apple banana"), (11L, "apple cherry"), (12L, "apple banana"),
      (13L, "apple date"), (14L, "apple elderberry"), (15L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(d, maxPostings = 3, minDf = 2L)
      .as[(String, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("apple") == ((5L, "10,11,12")), s"df must count ALL docs, postings cap at 3: $got")
    assert(got("banana") == ((2L, "10,12")))
    assert(!got.contains("cherry"), "minDf=2 must prune singletons")
    assert(!got.values.exists(_._2.split(",").length > 3), "posting cap violated")
  }

  test("bm25IndexRetract: retract(build(W), D) == build(W minus D), incl. null-text member") {
    val corpus = Seq(
      (0L, "spark window agg over the stream"),
      (1L, "customer query fast table scan"),
      (2L, "stream batch merge vector index"),
      (3L, "spark spark spark repeated tokens"),
      (4L, null.asInstanceOf[String]), // counted in n, zero postings
      (5L, "another document about windows and tables")
    ).toDF("doc_id", "text")
    val d = Seq(3L, 4L).toDF("doc_id") // one token-bearing, one null-text
    val retracted = TextAnalysis.bm25IndexRetract(TextAnalysis.bm25Index(corpus), d)
    val direct = TextAnalysis.bm25Index(corpus.where(!col("doc_id").isin(3L, 4L)))
    // stats row bit-identical (n, avgdl, sdl)
    assert(retracted.stats.as[(Long, Double, Long)].collect().head ==
      direct.stats.as[(Long, Double, Long)].collect().head)
    // postings row sets identical
    def rows(ix: TextAnalysis.Bm25Index) =
      ix.postings.as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(rows(retracted) == rows(direct))
    // ...and the served scores bit-identical through the full formula
    val qs = Seq(("q1", "spark window table")).toDF("query_id", "query")
    def serve(ix: TextAnalysis.Bm25Index) =
      TextAnalysis.bm25TopKFromIndex(ix, qs, k = 5)
        .as[(String, Long, Double, Int)].collect().sorted.toSeq
    assert(serve(retracted) == serve(direct))
    assert(!serve(retracted).exists(_._2 == 3L), "deleted doc must never rank")
    // duplicate ids in D collapse (n decremented once)
    val dupD = Seq(3L, 3L, 4L).toDF("doc_id")
    assert(TextAnalysis.bm25IndexRetract(TextAnalysis.bm25Index(corpus), dupD)
      .stats.as[(Long, Double, Long)].collect().head ==
      direct.stats.as[(Long, Double, Long)].collect().head)
  }

  test("ivfRetract / minhashSignaturesRetract: deleted ids vanish from every serve path") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val probes = emb.where(col("vec_id") < 8)
    val ix = Similarity.ivfIndex(emb, nLists = 8)
    val del = emb.where(col("vec_id") % 5 === 0).select("vec_id")
    val retracted = Similarity.ivfRetract(ix, del)
    // assignments == direct assignment over survivors (per-row, no cross terms)
    val directAsg = Similarity.ivfAssign(emb.where(col("vec_id") % 5 =!= 0), ix.centroids)
      .as[(Long, Int)].collect().sorted.toSeq
    assert(retracted.assignments.as[(Long, Int)].collect().sorted.toSeq == directAsg)
    // serving against the ORIGINAL corpus frame still cannot return deleted
    // ids: the assignment join drops unmatched corpus rows
    val served = Similarity.ivfTopKFromIndex(retracted, emb, probes, k = 4, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(served.nonEmpty && !served.exists(_._2 % 5 == 0))
    // MinHash artifact: pairs from the retracted signatures == pairs built
    // from the surviving docs directly (incl. the bucket-cap recount)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sigs = Dedup.minhashSignatures(docs)
    val sigsRetracted = Dedup.minhashSignaturesRetract(sigs,
      docs.where(col("doc_id") % 3 === 0).select("doc_id"))
    def pairs(sg: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairsFromSignatures(sg, threshold = 0.35, maxBucketFreq = Some(50))
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val direct = pairs(Dedup.minhashSignatures(docs.where(col("doc_id") % 3 =!= 0)))
    assert(pairs(sigsRetracted) == direct)
  }

  test("ivfDriftStats: a drifted epoch reads lower than the build epoch") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ix = Similarity.ivfIndex(emb, nLists = 8)
    val base = Similarity.ivfAssign(emb, ix.centroids)
      .withColumn("batch", lit(0))
    // drifted arrivals: every vector NEGATED (its best cell under the fixed
    // centroids is the original's worst) with offset ids
    val drifted = emb.withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding", transform(col("embedding"), x => (-x).cast("float")))
    val driftedAsg = Similarity.ivfAssign(drifted, ix.centroids)
      .withColumn("batch", lit(1))
    val stats = Similarity.ivfDriftStats(
      Similarity.IvfIndex(ix.centroids, base.unionByName(driftedAsg)),
      emb.unionByName(drifted))
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._4.get, r._5.get))).toMap
    val (n0, mean0, p10_0) = stats(0)
    val (n1, mean1, p10_1) = stats(1)
    assert(n0 == emb.count() && n1 == n0)
    assert(mean1 < mean0 && p10_1 < p10_0,
      s"drifted epoch must read lower: base=($mean0, $p10_0) drifted=($mean1, $p10_1)")
  }

  test("pqDriftStats: a drifted epoch reconstructs worse than the build epoch") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val books = Similarity.pqCodebookTable(emb)
    val base = Similarity.pqEncodeAgainst(emb, books).withColumn("batch", lit(0))
    // drifted arrivals: every vector SCALED ×3 with offset ids — the
    // frozen codebooks sit at the original magnitude, so reconstruction
    // error must climb (the re-train signal)
    val drifted = emb.withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding", transform(col("embedding"), x => (x * 3.0d).cast("float")))
    val dCodes = Similarity.pqEncodeAgainst(drifted, books).withColumn("batch", lit(1))
    val stats = Similarity.pqDriftStats(
      Similarity.PqIndex(books, base.unionByName(dCodes)),
      emb.unionByName(drifted))
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._4.get, r._5.get))).toMap
    val (n0, mean0, p90_0) = stats(0)
    val (n1, mean1, p90_1) = stats(1)
    assert(n0 == emb.count() && n1 == n0)
    assert(mean1 > mean0 && p90_1 > p90_0,
      s"drifted epoch must reconstruct worse: base=($mean0, $p90_0) drifted=($mean1, $p90_1)")
  }

  test("minhashAccuracy / simhashAccuracy: a perfect detector scores 1.0; empty sides go NULL") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo"
    val d = Seq(
      (0L, base), (1L, base), // exact dup pair: true jaccard 1.0, est 1.0, hamming 0
      (2L, "completely different words entirely here now"),
      (3L, "some other unrelated document text")
    ).toDF("doc_id", "text")
    val mh = Dedup.minhashAccuracy(d, thresholds = Seq(0.5, 0.9))
      .as[(Double, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(mh(0.5) == ((1L, 1L, 1L, Some(1.0), Some(1.0))), s"minhash gate: $mh")
    assert(mh(0.9) == ((1L, 1L, 1L, Some(1.0), Some(1.0))), s"minhash gate: $mh")
    val sh = Dedup.simhashAccuracy(d, jaccardThreshold = 0.5)
      .as[(Int, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(sh(0)._1 == 1L && sh(0)._3 == 1L && sh(0)._5 == Some(1.0),
      s"identical texts must hit at radius 0: $sh")
    assert((0 to 2).forall(r => sh(r)._2 <= sh(r + 1)._2 && sh(r)._3 <= sh(r + 1)._3),
      s"radius widening can only add predictions and hits: $sh")
    // no pairs on EITHER side -> empty report (groupBy over zero pair rows;
    // the oracle's CROSS JOIN + GROUP BY agrees), not a 0/0 crash
    val disjoint = Seq((0L, "one two three"), (1L, "four five six")).toDF("doc_id", "text")
    assert(Dedup.minhashAccuracy(disjoint, thresholds = Seq(0.9)).isEmpty)
  }

  test("IVF/PQ bootstraps accept array<double> corpora (the r14 verdict crash class)") {
    // The test corpus ships array<float>; every serve path advertises
    // array<double> support. A bare getSeq[Float] in any bootstrap collect
    // throws ClassCastException here — this pins the whole class dead.
    val f = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = f.withColumn("embedding", col("embedding").cast("array<double>"))
    val probesF = f.where(col("vec_id") < 3)
    val probesD = d.where(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "corpus_id", "rn").as[(Long, Long, Int)].collect().toSet
    // centroidBootstrap path (feeds all IVF/SemDeDup entry points)
    assert(rows(Similarity.ivfTopK(d, probesD, 5, nLists = 8, nProbe = 8)) ==
      rows(Similarity.ivfTopK(f, probesF, 5, nLists = 8, nProbe = 8)))
    // residual bootstrap + pqCodebooks path: same row count served either way
    val resD = Similarity.ivfPqResidualTopK(d, probesD, 4, nLists = 4, nProbe = 2,
      nSub = 8, nCodes = 8)
    val resF = Similarity.ivfPqResidualTopK(f, probesF, 4, nLists = 4, nProbe = 2,
      nSub = 8, nCodes = 8)
    assert(resD.count() == resF.count() && resD.count() > 0)
    // Lloyd refinement's vsum collect
    val refD = Similarity.refinedCentroids(d, 4, 1, "vec_id", "embedding")
    val refF = Similarity.refinedCentroids(f, 4, 1, "vec_id", "embedding")
    assert(refD.map(_._1).toSeq == refF.map(_._1).toSeq)
  }
}
