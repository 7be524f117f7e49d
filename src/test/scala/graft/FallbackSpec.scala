package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** The portable (no-extensions) formulations must agree with the native
  * ones — sessions without GraftExtensions take these paths. */
class FallbackSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "aa bb cc dd ee ff gg", "s1"),
    (1L, "aa bb cc dd ee ff gg", "s1"),
    (2L, "hh ii jj kk ll mm nn", "s2"),
    (3L, "aa bb cc zz yy xx ww", "s2")
  ).toDF("doc_id", "text", "source")

  test("posexplode union-sig fallback equals the native aggregate exactly") {
    val perDoc = docs
      .select(col("source").as("grp"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("grp"), call_function("graft_minhash", col("__toks"), lit(2), lit(16)).as("sig"))
    val native = perDoc.groupBy("grp")
      .agg(call_function("graft_minhash_union", col("sig")).as("usig"))
      .as[(String, Seq[Long])].collect().toMap
    val fallback = Dedup.unionSigFallback(perDoc)
      .as[(String, Seq[Long])].collect().toMap
    assert(fallback == native)
  }

  test("HOF minhashSignature: stable width, identical docs agree, disjoint differ") {
    val sigs = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shinglesOf(col("__toks"), 2), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs.values.forall(_.length == 16))
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(2L))
    // overlapping docs share some signature positions, disjoint docs almost none
    val share03 = sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b }
    val share02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(share03 > share02)
  }

  test("HOF dot equals native graft_dot on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val diff = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("h"),
      call_function("graft_dot", col("embedding"), col("embedding")).as("n"))
      .where(col("h") =!= col("n"))
    assert(diff.isEmpty)
  }

  test("native graft_simhash equals the HOF fingerprint exactly") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      // edge rows the real corpus lacks: empty text, one token, repeats
      .unionByName(Seq((900001L, ""), (900002L, "tok"), (900003L, "a a a b")).toDF("doc_id", "text"))
    val diff = d.select(
      Dedup.simhash(col("text")).as("hof"),
      call_function("graft_simhash", graft.ops.TextAnalysis.tokens(col("text"))).as("native"))
      // null-safe negation: a one-sided NULL must count as divergence, not
      // vanish into a null predicate
      .where(!(col("hof") <=> col("native")))
    assert(diff.isEmpty,
      s"fingerprints diverged: ${diff.limit(3).collect().mkString(", ")}")
  }

  test("posexplode vector-sum fallback equals the native aggregate") {
    val assigned = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") % 4).cast("int").as("cell"), col("embedding").as("emb"))
    val native = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_members"), call_function("graft_vec_sum", col("emb")).as("vsum"))
      .as[(Int, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val fallback = Similarity.vecSumFallback(assigned)
      .as[(Int, Long, Seq[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(native.keySet == fallback.keySet)
    for (k <- native.keySet) {
      assert(native(k)._1 == fallback(k)._1, s"member count diverged for cell $k")
      // summation ORDER differs (single element-add stream vs per-position
      // partial sums), so compare within fp tolerance, not bit-exactly
      native(k)._2.zip(fallback(k)._2).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"cell $k component drifted: $a vs $b")
      }
    }
  }

  test("ragged vector widths fail on BOTH vector-sum paths (no silent truncation)") {
    // two members of cell 0 with different widths: the native aggregate
    // throws a width mismatch; the fallback must raise too, not emit
    // truncated per-position sums with a max-count n_members
    val ragged = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f)), (1, Seq(5.0f, 6.0f)))
      .toDF("cell", "emb")
    val native = intercept[Exception] {
      ragged.groupBy("cell").agg(count(lit(1)).as("n_members"),
        call_function("graft_vec_sum", col("emb")).as("vsum")).collect()
    }
    val fallback = intercept[Exception] { Similarity.vecSumFallback(ragged).collect() }
    assert(fallback.getMessage != null && native.getMessage != null)
    // uniform widths still agree after the guard
    val clean = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f))).toDF("cell", "emb")
    val fb = Similarity.vecSumFallback(clean).as[(Int, Long, Seq[Double])].collect().head
    assert(fb._2 == 2L && fb._3 == Seq(4.0, 6.0))
  }

  test("kmeansIter: member counts partition the corpus; norms positive") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.kmeansIter(emb, nLists = 8).collect()
    assert(out.map(_.getAs[Long]("n_members")).sum == emb.count())
    assert(out.forall(_.getAs[Double]("centroid_norm") > 0))
  }

  test("kmeansIter: null/empty embeddings are dropped identically on both paths") {
    val dirty = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
      .select(col("vec_id"),
        when(col("vec_id") % 7 === 0, lit(null)) // includes vec_id 0, a would-be centroid
          .when(col("vec_id") % 11 === 3, array().cast("array<float>"))
          .otherwise(col("embedding")).as("embedding"))
    val kept = dirty.where(col("embedding").isNotNull && size(col("embedding")) > 0).count()
    val native = Similarity.kmeansIter(dirty, nLists = 4).collect()
    assert(native.map(_.getAs[Long]("n_members")).sum == kept,
      "null/empty vectors must not count as cell members")
    // fallback path must agree row-for-row (no ANSI abort, no ghost members)
    val centroids = Similarity.centroidBootstrap(dirty, 4, "vec_id", "embedding")
    val cs = Similarity.cellScores(centroids, Similarity.dot) _
    val assigned = dirty.where(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(array_max(cs(col("embedding"))).getField("c").as("cell"), col("embedding").as("emb"))
    val fb = Similarity.vecSumFallback(assigned).collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n_members")).toMap
    val nat = native.map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n_members")).toMap
    assert(fb == nat)
  }

  test("native graft_span_fps equals the HOF window fold exactly (incl. edges)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, ""),                       // no tokens
        (900002L, "only three tokens here"), // fewer than width
        (900003L, null.asInstanceOf[String]),
        (900004L, "a b c d e f g h i j")     // exactly spanning windows
      ).toDF("doc_id", "text"))
    val toks = TextAnalysis.tokens(col("text"))
    val width = 5
    val hof = when(size(transform(toks, t => Dedup.poly64Base(t))) >= width,
      transform(sequence(lit(0),
          size(transform(toks, t => Dedup.poly64Base(t))) - width),
        i => aggregate(
          slice(transform(toks, t => Dedup.poly64Base(t)), i + 1, lit(width)),
          lit(graft.plans.Poly64.Seed),
          (acc, h) => Dedup.mulAdd64(acc, lit(graft.plans.Poly64.Mul), h))))
      .otherwise(array().cast("array<bigint>"))
    val nat = coalesce(call_function("graft_span_fps", toks, lit(width)),
      array().cast("array<bigint>"))
    val diff = d.select(hof.as("h"), nat.as("n")).where(col("h") =!= col("n"))
    assert(diff.isEmpty, s"paths diverge: ${diff.take(3).mkString}")
    // short/empty/null docs must be EMPTY (not null) on the caller contract
    val edges = d.where(col("doc_id") >= 900001L)
      .select(col("doc_id"), nat.as("n")).as[(Long, Seq[Long])].collect().toMap
    assert(edges(900001L).isEmpty && edges(900002L).isEmpty && edges(900003L).isEmpty)
    assert(edges(900004L).length == 6, "10 tokens, width 5 → 6 windows")
    // a USER-supplied array with a null element (graft_span_fps is a
    // registered SQL function — the internal tokensIn path never makes
    // one): windows covering the null yield null fps, exactly the HOF
    // fold's null propagation; windows clear of it hash normally
    val raw = Seq((1L, Seq("a", "b", null, "d", "e", "f"))).toDF("id", "tk")
    val w3hof = transform(sequence(lit(0), size(col("tk")) - 3),
      i => aggregate(
        slice(transform(col("tk"), t => Dedup.poly64Base(t)), i + 1, lit(3)),
        lit(graft.plans.Poly64.Seed),
        (acc, h) => Dedup.mulAdd64(acc, lit(graft.plans.Poly64.Mul), h)))
    val got = raw.select(
      call_function("graft_span_fps", col("tk"), lit(3)).as("n"), w3hof.as("h"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].head()
    assert(got._1 == got._2, s"null-element parity broke: $got")
    assert(got._1(0).isEmpty && got._1(2).isEmpty && got._1(3).isDefined,
      s"windows over the null must be null, others real: ${got._1}")
  }

  test("native graft_pq_assign / graft_pq_lut equal the HOF forms (incl. short/zero vectors)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(40)
    val edges = Seq(
      (900001L, Array(0.25f, -0.5f, 1.0f, 2.0f)), // short: dim 4 < 64
      (900002L, Array.fill(64)(0.0f))             // zero vector, full dim
    ).toDF("vec_id", "embedding")
    val d = base.unionByName(edges)
    val books = Similarity.pqCodebooks(d, nSub = 8, nCodes = 8, "vec_id", "embedding")
    val w = books(0)(0).length
    val emb = col("embedding")
    (0 until 8).foreach { m =>
      val hof = array_max(array(books(m).zipWithIndex.map { case (c, k) =>
        val n2 = c.map(x => x * x).sum
        struct((Similarity.dot(slice(emb, m * w + 1, w), lit(c)) - lit(n2 / 2.0)).as("s"),
          lit(k).as("c"))
      }.toIndexedSeq: _*)).getField("c")
      val nat = call_function("graft_pq_assign", emb,
        typedLit(books(m).map(_.toSeq).toSeq), lit(m * w), lit(w))
      val diff = d.select(col("vec_id"), hof.as("h"), nat.as("n"))
        .where(not(col("h") <=> col("n")))
      assert(diff.isEmpty, s"assign paths diverge at m=$m: ${diff.take(3).mkString}")
    }
    // short vector: every score is null → HOF array_max yields the HIGHEST
    // code id; the native loop mirrors that rule exactly
    val shortCode = d.where(col("vec_id") === 900001L)
      .select(call_function("graft_pq_assign", emb,
        typedLit(books(0).map(_.toSeq).toSeq), lit(0), lit(w)))
      .collect()(0).getInt(0)
    assert(shortCode == 7, s"short vector must take the highest code id, got $shortCode")
    // LUT parity: nested slice-dots vs the native single scan
    val hofLut = array(books.indices.map { m =>
      array(books(m).map(c =>
        Similarity.dot(slice(emb, m * w + 1, w), lit(c))).toIndexedSeq: _*)
    }: _*)
    val natLut = call_function("graft_pq_lut", emb,
      typedLit(books.map(_.map(_.toSeq).toSeq).toSeq), lit(w))
    val lutDiff = d.select(col("vec_id"), hofLut.as("h"), natLut.as("n"))
      .where(not(col("h") <=> col("n")))
    assert(lutDiff.isEmpty, s"lut paths diverge: ${lutDiff.take(3).mkString}")
    // null embedding → null on BOTH native expressions (child-null rule)
    val nulls = Seq((900003L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
      .select(
        call_function("graft_pq_assign", emb, typedLit(books(0).map(_.toSeq).toSeq),
          lit(0), lit(w)).as("a"),
        call_function("graft_pq_lut", emb, typedLit(books.map(_.map(_.toSeq).toSeq).toSeq),
          lit(w)).as("l"))
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
  test("native graft_kmv equals the collect_set fallback (incl. nulls, dups, fewer-than-k)") {
    val rnd = new scala.util.Random(42)
    // dups (mod squeeze), a null-heavy group, a group with < k distinct
    val rows = (0 until 500).map { i =>
      val g = i % 4
      val h: java.lang.Long =
        if (g == 3 && i % 2 == 0) null
        else if (g == 2) java.lang.Long.valueOf(i % 5L) // < k distinct
        else java.lang.Long.valueOf(rnd.nextLong() % 1000L)
      (g, h)
    }
    val df = rows.toDF("g", "h")
    val native = df.groupBy("g")
      .agg(call_function("graft_kmv", col("h"), lit(8)).as("kmv"))
      .as[(Int, Seq[Long])].collect().toMap
    val fallback = df.groupBy("g")
      .agg(slice(array_sort(collect_set(col("h"))), 1, 8).as("kmv"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(native == fallback)
    // every sketch is sorted-ascending distinct, width <= k
    for ((_, s) <- native) {
      assert(s == s.distinct.sorted && s.length <= 8)
    }
    assert(native(2).length == 5, "fewer-than-k group keeps every distinct hash")
    // the merge is exact: sketch of the union == merge of per-part sketches
    val parts = df.withColumn("part", col("h") % 2)
      .groupBy("g", "part")
      .agg(call_function("graft_kmv", col("h"), lit(8)).as("kmv"))
    val merged = parts.select(col("g"), explode(col("kmv")).as("h"))
      .groupBy("g")
      .agg(call_function("graft_kmv", col("h"), lit(8)).as("kmv"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(merged == native)
  }

  test("graft_kmv: malformed SQL calls die as clean analysis errors, not IOOBE/NPE") {
    spark.range(3).createOrReplaceTempView("__kmv_probe")
    // missing k: must be a named analysis error, not IndexOutOfBounds
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_kmv(id) FROM __kmv_probe").collect())
    assert(e1.getMessage.contains("graft_kmv"))
    // non-literal k: must be a named analysis error, not an NPE at
    // resolution time
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_kmv(id, id) FROM __kmv_probe").collect())
    assert(e2.getMessage.contains("graft_kmv"))
    // NULL k is non-sense too
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_kmv(id, NULL) FROM __kmv_probe").collect())
    assert(e3.getMessage.contains("graft_kmv"))
  }

  test("native graft_hist equals the sum(when) chain (nulls skipped, out-of-range skipped, partial merge exact)") {
    import spark.implicits._
    // multi-partition so partial aggregation + merge + serde all run
    val df = spark.range(1000).repartition(3)
      .select((col("id") % 7).cast("int").as("b"))
    val nb = 8
    val native = df.agg(call_function("graft_hist", col("b"), lit(nb)))
      .head().getSeq[Long](0)
    val chain = df.agg(array((0 until nb).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L))): _*))
      .head().getSeq[Long](0)
    assert(native == chain, s"graft_hist $native != sum(when) chain $chain")
    // nulls carry no count; out-of-range values are skipped, never
    // corrupt a neighbor's bucket
    val odd = Seq(Some(1), None, Some(99), Some(-3), Some(1)).toDF("b")
    assert(odd.agg(call_function("graft_hist", col("b"), lit(4)))
      .head().getSeq[Long](0) == Seq(0L, 2L, 0L, 0L))
    // the grouped shape the manifest uses (one histogram per file)
    val grouped = spark.range(1000).repartition(5)
      .select((col("id") % 4).as("g"), (col("id") % 3).cast("int").as("b"))
    val n2 = grouped.groupBy("g")
      .agg(call_function("graft_hist", col("b"), lit(3)).as("h"))
      .orderBy("g").collect().map(_.getSeq[Long](1)).toSeq
    val c2 = grouped.groupBy("g")
      .agg(array((0 until 3).map(i =>
        sum(when(col("b") === i, 1L).otherwise(0L))): _*).as("h"))
      .orderBy("g").collect().map(_.getSeq[Long](1)).toSeq
    assert(n2 == c2, s"grouped graft_hist $n2 != chain $c2")
  }

  test("native graft_zbucket equals the when-chain (nulls→0, NaN past every bound, ties strictly-below, dup bounds)") {
    import spark.implicits._
    // boundaries WITH duplicates (a heavy-tailed quantile build produces
    // them) — nondecreasing, as percentile guarantees
    val nb = Seq(10.0, 20.0, 20.0, 30.0, 45.5, 45.5, 45.5, 80.0)
    val vals = Seq[Option[Double]](Some(5.0), Some(10.0), Some(10.0001),
      Some(20.0), Some(29.999), Some(45.5), Some(45.6), Some(80.0),
      Some(99.0), None, Some(Double.NaN), Some(-0.0), Some(0.0),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity))
    val df = vals.toDF("v").repartition(3)
    val chain = df.select(nb.map(b =>
      when(col("v") > lit(b), 1).otherwise(0)).reduce(_ + _).as("b"))
      .collect().map(_.getInt(0)).toSeq
    val native = df.select(
      call_function("graft_zbucket", col("v"), typedLit(nb)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(native == chain, s"zbucket $native != chain $chain")
    // string twin — binary UTF-8 order, empty strings and ties included
    val sc = Seq("", "apple", "apple", "m", "zz")
    val svals = Seq[Option[String]](Some(""), Some("a"), Some("apple"),
      Some("apples"), Some("m"), Some("n"), Some("zz"), Some("zzz"), None)
    val sdf = svals.toDF("s").repartition(2)
    val schain = sdf.select(sc.map(b =>
      when(col("s") > lit(b), 1).otherwise(0)).reduce(_ + _).as("b"))
      .collect().map(_.getInt(0)).toSeq
    val snative = sdf.select(
      call_function("graft_zbucket_str", col("s"), typedLit(sc)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(snative == schain, s"zbucket_str $snative != chain $schain")
  }

  test("graft_hist: malformed SQL calls die as clean analysis errors, not IOOBE/NPE") {
    spark.range(3).createOrReplaceTempView("__hist_probe")
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_hist(id) FROM __hist_probe").collect())
    assert(e1.getMessage.contains("graft_hist"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_hist(id, id) FROM __hist_probe").collect())
    assert(e2.getMessage.contains("graft_hist"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_hist(id, NULL) FROM __hist_probe").collect())
    assert(e3.getMessage.contains("graft_hist"))
  }
}
