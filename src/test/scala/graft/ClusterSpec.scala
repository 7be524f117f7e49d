package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Quantiles}

/** Near-dup cluster resolution (pairs → components → keep-best) and the
  * rank-based percentile twin. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L), // exact dup of 0
    // TRUE radius-1 near-dup of 0/1: adding the token "great" flips exactly
    // one fingerprint bit (verified against the portable Poly64 simhash —
    // most single-word edits flip >3 bits, so the fixture word is chosen,
    // not arbitrary)
    (2L, "the quick brown fox jumps over the great lazy dog", "en", "s", 49L),
    (3L, "completely different words entirely here now", "en", "s", 44L),
    (4L, "unrelated second standalone document body text", "en", "s", 46L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("connectedComponents: min label reaches every member, components stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents: converges on a long chain (diameter > 2 rounds)") {
    // path graph 10-11-...-17: the min label must walk 7 hops; cap=0 forces
    // the distributed loop (default would take the driver union-find path)
    val pairs = (10L until 17L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, driverEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 8 && got.values.forall(_ == 10L), s"chain did not converge: $got")
  }

  test("connectedComponents: driver union-find ≡ distributed loop (differential)") {
    // deterministic pseudo-random graph: chains, cliques, crossing edges,
    // self-loops, duplicate and reversed edges
    val raw = (0 until 300).flatMap { i =>
      val a = (i * 131) % 97; val b = (i * 173 + 7) % 97
      Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) // both directions
    } ++ Seq((200L, 200L), (201L, 202L), (201L, 202L))
    val pairs = raw.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    // the edges collapse mod 97 into a sparse functional graph whose min-node
    // eccentricity exceeds the default 20 rounds — raise maxIter so the loop
    // actually converges (an instrumented run showed the convergence witness
    // exact every round; 20 rounds simply isn't fixpoint on this fixture)
    val loop = Dedup.connectedComponents(pairs, maxIter = 100, driverEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == loop, s"paths diverge:\n fast=$fast\n loop=$loop")
  }

  test("connectedComponents: empty pair set yields an empty frame, no rounds") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).isEmpty)
  }

  test("connectedComponents: reliable checkpoint path (checkpoint dir set)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(pairs, driverEdgeCap = 0)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
      val files = new java.io.File(dir).listFiles
      assert(files != null && files.nonEmpty,
        "reliable checkpoint files must land in the checkpoint dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("connectedComponents: maxIter bounds the rounds (partial labels, warned)") {
    // 8-node path graph needs 7 propagation hops; 2 rounds can't finish
    val pairs = (10L until 17L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, maxIter = 2, driverEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 8 && !got.values.forall(_ == 10L),
      s"2 rounds must leave the chain unconverged (else the bound is dead): $got")
  }

  test("neardupClusters: exact+near dups share one cluster, rest are singletons") {
    val got = Dedup.neardupClusters(docs).as[(Long, Long)].collect().toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L,
      s"near-dup trio must collapse to min id 0: $got")
    assert(got(3L) == 3L && got(4L) == 4L, s"distinct docs must stay singletons: $got")
  }

  test("dropNearDuplicates keeps the best-scoring member, ties to lowest id") {
    // score favors doc 2 inside the {0,1,2} cluster
    val scored = docs.withColumn("score",
      when(col("doc_id") === 2, 9.0).otherwise(1.0))
    val kept = Dedup.dropNearDuplicates(scored, "score").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"expected best-of-cluster survivors: $kept")
    // equal scores: the lowest id must win deterministically
    val tied = Dedup.dropNearDuplicates(docs.withColumn("score", lit(1.0)), "score")
      .select("doc_id").as[Long].collect().toSet
    assert(tied == Set(0L, 3L, 4L), s"tie must break to the lowest id: $tied")
  }

  test("rankedPercentiles equals the percentile aggregate bit-for-bit after rounding") {
    // deterministic skewed values, uneven groups incl. a singleton group
    val df = (0 until 400).map { i =>
      (if (i == 0) "solo" else s"g${i % 3}", (i * 37 % 101).toDouble, (i * 53 % 997).toDouble)
    }.toDF("g", "a", "b")
    val specs = Seq(
      Quantiles.Spec("a", 0.5, "med_a"),
      Quantiles.Spec("b", 0.25, "p25_b"),
      Quantiles.Spec("b", 0.95, "p95_b"))
    val ranked = Quantiles.rankedPercentiles(df, "g", specs)
      .as[(String, Double, Double, Double, Long)].collect().toSet
    val buffered = df.groupBy(col("g")).agg(
      round(expr("percentile(a, 0.5)"), 4).as("med_a"),
      round(expr("percentile(b, 0.25)"), 4).as("p25_b"),
      round(expr("percentile(b, 0.95)"), 4).as("p95_b"),
      count(lit(1)).as("n"))
      .as[(String, Double, Double, Double, Long)].collect().toSet
    assert(ranked == buffered)
  }

  test("rankedPercentiles matches the percentile aggregate on NULL-bearing columns") {
    // different null sets per column + one group whose `a` is entirely null:
    // the aggregate ignores NULLs, so the twin must rank/size per column
    val df = (0 until 300).map { i =>
      val g = if (i < 10) "gn" else s"g${i % 3}"
      val a = if (i % 7 == 0 || g == "gn") None else Some((i * 37 % 101).toDouble)
      val b = if (i % 11 == 0) None else Some((i * 53 % 997).toDouble)
      (g, a, b)
    }.toDF("g", "a", "b")
    val specs = Seq(
      Quantiles.Spec("a", 0.5, "med_a"),
      Quantiles.Spec("b", 0.25, "p25_b"),
      Quantiles.Spec("b", 0.95, "p95_b"))
    val ranked = Quantiles.rankedPercentiles(df, "g", specs)
      .as[(String, Option[Double], Option[Double], Option[Double], Long)].collect().toSet
    val buffered = df.groupBy(col("g")).agg(
      round(expr("percentile(a, 0.5)"), 4).as("med_a"),
      round(expr("percentile(b, 0.25)"), 4).as("p25_b"),
      round(expr("percentile(b, 0.95)"), 4).as("p95_b"),
      count(lit(1)).as("n"))
      .as[(String, Option[Double], Option[Double], Option[Double], Long)].collect().toSet
    assert(ranked == buffered)
    assert(ranked.exists { case (g, a, _, _, _) => g == "gn" && a.isEmpty },
      "the all-null group must surface a NULL percentile, not vanish")
  }

  test("rankedPercentiles plans ONE exchange (windows + final agg share the key)") {
    import org.apache.spark.sql.execution.ExplainMode
    val p = Quantiles.rankedPercentiles(
      (0 until 100).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v"),
      "g", Seq(Quantiles.Spec("v", 0.5, "med")))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // detail-header count (PlanSpec idiom): FormattedMode prints each node
    // twice, and "(n) Exchange" cannot match ReusedExchange headers
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges == 1, s"spillable percentile must shuffle once:\n$p")
  }
}
