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
}
