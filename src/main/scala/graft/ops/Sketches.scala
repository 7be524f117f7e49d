package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus accounting at scale.
  *
  * The exact per-group distinct counts the reference's audit queries compute
  * (e.g. the dedup-rate surface of `load.py:139-148`) need a shuffle of every
  * distinct value. At 100 TB the distinct-value stream per group no longer
  * fits anywhere, and the standard answer is a bounded sketch: keep only the
  * K minimum hash values per group — the (k-1)/u_k estimator of Bar-Yossef
  * et al. (2002) / Beyer et al. (SIGMOD 2007). The sketch is mergeable
  * (union = merge the min-sets, re-truncate to K), its error is ~1/sqrt(K),
  * and — because the hash is an md5-derived uniform both engines compute
  * identically — the whole estimate is DETERMINISTIC and replayable in the
  * DuckDB oracle, unlike HLL-based `approx_count_distinct` whose register
  * layout no two engines share.
  */
object Sketches {

  /** Uniform 60-bit hash of a value: the first 15 hex chars of md5 as a
    * non-negative long in [0, 2^60). md5 is the one avalanching hash both
    * engines spell identically (lowercase hex — the [[Sampling.hashSplit]]
    * portability trick); 15 chars keep the integer exactly representable
    * in both a signed long and SQL BIGINT arithmetic. The Poly64 family is
    * the wrong tool here: its small multiplier never avalanches, so short
    * or same-length keys land in narrow bands of the 64-bit range — fine
    * for dedup EQUALITY, fatal for an estimator that assumes uniformity. */
  def md5Long60(value: Column): Column =
    conv(substring(md5(value.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** K-minimum-values distinct-count estimate per group.
    *
    * Shape: project (group, md5_60(value)) → distinct (ONE shuffle keyed on
    * the pair — map-side partial dedup applies) → per-group `row_number`
    * over hash order, keep rank ≤ k (second shuffle on group; the kept set
    * is ≤ k rows per group, so everything after the filter is tiny). If a
    * group has fewer than k distinct hashes the estimate IS the exact
    * count (n_seen < k ⇒ we saw every distinct value); otherwise
    * est = (k-1) · 2^60 / u_k with u_k the k-th smallest hash — all
    * IEEE-exact steps, so DuckDB reproduces the estimate bit-for-bit.
    *
    * At 100 TB the window form spills per group; a dedicated k-min-heap
    * UDAF would cut the second shuffle to k rows/group earlier, but the
    * row_number plan already filters to k rows before anything wide.
    *
    * NULL values carry no cardinality (count-distinct semantics).
    *
    * Output: (group, n_seen ≤ k, est_distinct rounded to 4 dp). */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int = 16): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val pairs = df.where(valueCol.isNotNull)
      .select(col(groupCol), md5Long60(valueCol).as("__h")).distinct()
    estimate(minK(pairs, groupCol, k), groupCol, k)
  }

  /** The k smallest distinct hashes per group, as a sorted-ascending array —
    * shared tail of [[kmvSketch]] and [[kmvMerge]]. Input: (groupCol, __h)
    * pairs, already distinct. */
  private def minK(pairs: DataFrame, groupCol: String, k: Int): DataFrame =
    pairs.withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__h").asc)))
      .where(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))

  /** (k-1)/u_k estimate from a sketch frame (groupCol, kmv sorted asc). */
  private def estimate(sketches: DataFrame, groupCol: String, k: Int): DataFrame =
    sketches
      .select(col(groupCol), size(col("kmv")).cast("long").as("n_seen"),
        element_at(col("kmv"), size(col("kmv"))).as("__kth"))
      .withColumn("est_distinct",
        round(when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0)
            / col("__kth").cast("double")), 4))
      .drop("__kth")

  /** PARTIAL KMV sketch per group: the k smallest distinct md5-60 hashes as
    * a sorted array — the materializable half of the sketch's 100 TB story.
    * Build one sketch per shard/day/partition (each output row is ≤ k
    * longs), persist them, and [[kmvMerge]] unions any subset at read time:
    * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), because every one of the k
    * smallest hashes of the union is among the k smallest of its own side —
    * the merge is EXACT, not approximate, so
    * estimate(merge(sketch(h₁), sketch(h₂))) ≡ [[kmvDistinct]](whole)
    * bit-for-bit (q_distinct_kmv_merged pins this against q_distinct_kmv's
    * own oracle; OpsSpec pins it property-style over random splits).
    *
    * Output: (groupCol, kmv array<long> ascending, length ≤ k). */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int = 16): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val pairs = df.where(valueCol.isNotNull)
      .select(col(groupCol), md5Long60(valueCol).as("__h")).distinct()
    minK(pairs, groupCol, k)
  }

  /** Merge partial KMV sketches (any number per group): union the min-sets,
    * drop duplicate hashes (the same distinct value sketched on two sides),
    * re-truncate to the k smallest. Explode-based, so merging m partials
    * shuffles ≤ m·k (group, hash) rows per group — never a corpus-sized
    * structure; the result is again a valid sketch, so merges compose
    * (day → month → year rollups). */
  def kmvMerge(sketches: DataFrame, groupCol: String, k: Int = 16,
      sketchCol: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val pairs = sketches
      .select(col(groupCol), explode(col(sketchCol)).as("__h")).distinct()
    minK(pairs, groupCol, k)
  }

  /** [[kmvDistinct]]'s estimate surface from an already-built sketch frame:
    * n_seen < k ⇒ the sketch holds EVERY distinct hash (exact count);
    * otherwise (k-1)·2^60/u_k. Identical arithmetic to kmvDistinct, so
    * sketch → estimate reproduces it bit-for-bit.
    * Output: (groupCol, n_seen, est_distinct). */
  def kmvEstimate(sketches: DataFrame, groupCol: String, k: Int = 16,
      sketchCol: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    estimate(sketches.withColumnRenamed(sketchCol, "kmv"), groupCol, k)
  }

  // ------------------------------------------------------ quantile sketch
  // The third mergeable sketch family (after KMV cardinality and the
  // sharded/streamed retrieval indexes): per-group QUANTILES from a
  // bottom-k-by-hash-priority row sample. Assigning every row the uniform
  // priority md5_60(key) and keeping the k smallest priorities per group
  // is a simple random sample of k rows without replacement — and, like
  // KMV, it is EXACTLY mergeable: every one of the k smallest priorities
  // of a union is among the k smallest of its own side, so
  // bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)). Unlike
  // t-digest/KLL (whose buffers are engine-private and merge-order-
  // dependent), the sample is DETERMINISTIC given unique keys, so the
  // DuckDB oracle replays sketch → merge → estimate bit-for-bit.
  // Accuracy: quantile-space error ~ 1/sqrt(k) (Dvoretzky–Kiefer–
  // Wolfowitz over a k-sample); n_seen < k ⇒ the sample IS the group and
  // every quantile is exact.

  /** PARTIAL quantile sketch per group: the k rows with the smallest
    * md5-60 priorities, as a priority-ascending array of (pri, v) structs
    * — one materializable row per group per shard/day, ≤ k entries each;
    * [[quantileMerge]] folds any subset at read time. The merge dedups on
    * the (pri, v) pair, so OVERLAPPING partials (the same row sketched on
    * two sides, e.g. an at-least-once replay) cannot double-count — the
    * KMV overlap-tolerance argument verbatim.
    *
    * PRECONDITION: `keyCol` unique per row (the [[Sampling.weightedSample]]
    * / hashSplit contract): duplicate keys draw identical priorities, and
    * which duplicate's VALUE survives the k-boundary would be partition-
    * order dependent. Ties on (pri, v) are harmless — the pair itself is
    * the sample unit. NULL values carry no mass (quantile-over-non-null,
    * the `quantile_cont`/`percentile` convention); NULL keys are dropped
    * with them. */
  def quantileSketch(df: DataFrame, groupCol: String, keyCol: Column,
      valueCol: Column, k: Int = 16): DataFrame = {
    require(k >= 2, s"quantile sketch needs k >= 2, got $k")
    // .distinct() so the base path and [[quantileMerge]] share the same
    // sample-unit semantics (the merge dedups (pri, v) pairs — without
    // this the documented estimate(merge(sketch(parts))) ≡
    // estimate(sketch(whole)) identity would silently depend on no
    // md5-60 priority collision between distinct keys sharing a value
    // in one group). Under the unique-key precondition it's a no-op on
    // values; the extra shuffle gets map-side partial dedup like
    // [[kmvSketch]]'s.
    bottomK(
      df.where(valueCol.isNotNull && keyCol.isNotNull)
        .select(col(groupCol), md5Long60(keyCol).as("__pri"),
          valueCol.cast("double").as("__v"))
        .distinct(),
      groupCol, k)
  }

  /** Keep the k (pri, v) pairs with the smallest priorities per group —
    * shared tail of [[quantileSketch]] and [[quantileMerge]]. The v
    * tie-break makes the k-boundary deterministic even under md5-60
    * priority collisions (possible only across groups' shared values or
    * duplicate keys; harmless either way because the PAIR is the unit). */
  private def bottomK(rows: DataFrame, groupCol: String, k: Int): DataFrame =
    rows.withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__pri").asc, col("__v").asc)))
      .where(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__pri").as("pri"),
        col("__v").as("v")))).as("qsk"))

  /** Merge partial quantile sketches (any number per group, overlap
    * allowed): explode, dedup the (pri, v) pairs, re-keep the k smallest.
    * Shuffles ≤ m·k rows per group for m partials — never corpus-sized —
    * and the result is again a valid sketch, so merges compose
    * (shard → day → corpus rollups). estimate(merge(sketch(parts))) ≡
    * estimate(sketch(whole)) exactly, for any cover of the input rows. */
  def quantileMerge(sketches: DataFrame, groupCol: String, k: Int = 16,
      sketchCol: String = "qsk"): DataFrame = {
    require(k >= 2, s"quantile sketch needs k >= 2, got $k")
    bottomK(
      sketches.select(col(groupCol), explode(col(sketchCol)).as("__e"))
        .select(col(groupCol), col("__e.pri").as("__pri"), col("__e.v").as("__v"))
        .distinct(),
      groupCol, k)
  }

  /** Quantiles of the sampled values: `percentile`'s linear interpolation
    * (the exact arithmetic DuckDB spells `quantile_cont` — the
    * q_percentiles cross-engine precedent), rounded to 4 dp. n_seen < k ⇒
    * the sample is the whole group and the estimates are the exact
    * quantiles. Output: (groupCol, n_seen, one column per requested
    * (probability, name)). */
  def quantileEstimate(sketches: DataFrame, groupCol: String,
      probs: Seq[(Double, String)] = Seq(0.5 -> "p50", 0.9 -> "p90"),
      sketchCol: String = "qsk"): DataFrame = {
    require(probs.nonEmpty, "quantileEstimate needs at least one probability")
    sketches.select(col(groupCol), explode(col(sketchCol)).as("__e"))
      .select(col(groupCol), col("__e.v").as("__v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_seen"),
        probs.map { case (p, name) =>
          round(expr(s"percentile(__v, $p)"), 4).as(name)
        }: _*)
  }
}
