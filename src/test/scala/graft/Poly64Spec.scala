package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.plans.Poly64

/** The portable Poly64 hash family must be value-identical across all three
  * implementations — driver-side Scala ([[Poly64.baseHash]]), the native
  * Catalyst expressions (`graft_simhash64` / `graft_minhash_poly`), and the
  * HOF Column fallbacks ([[Dedup.poly64Base]] etc.) — because the DuckDB
  * oracle re-derives the same values from [[Poly64]]'s SQL renderings and
  * any drift breaks the driver's hash compare. */
class Poly64Spec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "tok", "hello world", "aa bb cc dd ee ff gg",
    "punct,.;: and MIXED Case 0123456789",
    "café naïve résumé" // BMP non-ASCII: é ï
  )

  test("poly64Base Column fallback equals driver-side Poly64.baseHash") {
    val got = samples.toDF("s")
      .select(col("s"), Dedup.poly64Base(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    for (s <- samples)
      assert(got(s) == Poly64.baseHash(s), s"poly64Base diverged on '$s'")
  }

  test("seed family is deterministic, odd-A, and within the multiplier bound") {
    val s1 = Poly64.seeds(32)
    val s2 = Poly64.seeds(32)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall { case (a, _) => (a & 1L) == 1L && a > 0 && a < (1L << 20) })
    assert(s1.map(_._2).distinct.length == 32)
  }

  test("native graft_tokens matches a driver-side golden split (HOF semantics)") {
    // NOTE: comparing against TextAnalysis.tokens in-session would be
    // tautological — TokenizeRewrite rewrites the HOF form to the native
    // expression. The golden is the semantics both must implement:
    // single-space split, empties dropped, order and duplicates kept.
    def golden(s: String): Seq[String] = s.split(" ", -1).filter(_.nonEmpty).toSeq
    val cases = Seq(
      "a b c", "  leading", "trailing  ", "double  space", "", " ", "   ",
      "one", "tab\tis a token byte", "nl\nis too", "café  naïve", "中文 分词 test",
      "dup dup dup"
    )
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq
    val all = cases ++ real
    val got = all.toDF("s")
      .select(col("s"), call_function("graft_tokens", col("s")).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    for (s <- all)
      assert(got(s) == golden(s), s"tokenizer diverged from golden on '$s'")
    // null propagates as null
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_tokens", col("s"))).collect().head
    assert(nulls.isNullAt(0))
  }

  test("TokenizeRewrite: the HOF tokenizer idiom optimizes to graft_tokens") {
    import graft.ops.TextAnalysis
    // file-backed source: a local relation would be constant-folded whole
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val optimized = d.select(TextAnalysis.tokens(col("text")).as("toks"))
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_tokens"),
      s"portable idiom must rewrite to the native tokenizer:\n$optimized")
    // a different separator or predicate must NOT match
    val other = d.select(filter(split(col("text"), ","), t => length(t) > 0).as("x"),
      filter(split(col("text"), " "), t => length(t) > 1).as("y"))
      .queryExecution.optimizedPlan.toString
    assert(!other.contains("graft_tokens"),
      s"rewrite over-matched a non-tokenizer filter:\n$other")
  }

  test("native graft_grams equals the composed shingle→distinct→xxhash64 chain as a set") {
    import graft.ops.{Dedup, TextAnalysis}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .unionByName(Seq((900001L, Seq.empty[String]), (900002L, Seq("one", "two")),
        (900003L, Seq("a", "b", "a", "b", "a", "b"))).toDF("doc_id", "__toks"))
    val diff = d.select(
      array_sort(call_function("graft_grams", col("__toks"), lit(3))).as("native"),
      array_sort(transform(array_distinct(Dedup.shinglesOf(col("__toks"), 3)),
        g => xxhash64(g))).as("hof"))
      .where(!(col("native") <=> col("hof")))
    assert(diff.isEmpty, s"gram digests diverged: ${diff.limit(3).collect().mkString(", ")}")
  }

  test("native graft_simhash64 equals the HOF simhash64 exactly") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, ""), (900002L, "tok"), (900003L, "a a a b")).toDF("doc_id", "text"))
    val diff = d.select(
      Dedup.simhash64(col("text")).as("hof"),
      call_function("graft_simhash64", TextAnalysis.tokens(col("text"))).as("native"))
      .where(!(col("hof") <=> col("native")))
    assert(diff.isEmpty,
      s"fingerprints diverged: ${diff.limit(3).collect().mkString(", ")}")
  }

  test("native graft_minhash_poly equals the HOF minhashSignature64 exactly") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60).select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .unionByName(Seq((900002L, Seq("tok")), (900003L, Seq("a", "a", "a", "b")))
        .toDF("doc_id", "__toks"))
    val diff = d.select(
      Dedup.minhashSignature64(Dedup.shinglesOf(col("__toks"), 3), 16).as("hof"),
      call_function("graft_minhash_poly", col("__toks"), lit(3), lit(16)).as("native"))
      .where(!(col("hof") <=> col("native")))
    assert(diff.isEmpty,
      s"signatures diverged: ${diff.limit(3).collect().mkString(", ")}")
  }

  test("simhashNearDup64: exact duplicates pair at hamming 0; cap prunes to a subset") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark catalyst expression trees"),
      (3L, "the quick brown fox jumps over the lazy dog again and again ok")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup64(docs).as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((0L, 1L, 0)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    val capped = Dedup.simhashNearDup64(docs, maxBlockFreq = Some(2))
      .as[(Long, Long, Int)].collect().toSet
    assert(capped.subsetOf(pairs))
  }
}
