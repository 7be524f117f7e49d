package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the manual fallback when AQE's
  * skew-join splitting doesn't apply (e.g. broadcast not possible AND one
  * key dominates the build side, or aggregation state itself is skewed).
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already splits
  * skewed SHUFFLE partitions of sort-merge joins at runtime; prefer it.
  * These helpers cover the remaining cases: replicated salting trades `salts`×
  * duplication of the small side for an even distribution of the big side.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic pseudo-random salt
    * in [0, salts); the small side is replicated once per salt value, so
    * each hot key's rows spread over `salts` reducers instead of one.
    * Results are identical to `big.join(small, keys, joinType)`.
    *
    * Use when the small side is too large to broadcast but small enough to
    * replicate `salts`×, and a handful of keys dominate the big side. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner",
      seed: Long = 42L
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit `salts` copies of every unmatched
    // SMALL-side row (it is replicated pre-join); big-side-preserving
    // types are exact because each big row carries exactly one salt
    require(Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti join types, not $joinType " +
        "(outer-preserving the replicated small side would duplicate its unmatched rows)")
    val saltedBig = big.withColumn("__salt", floor(rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates over skewed keys:
    * phase 1 partially aggregates on (key, salt), phase 2 merges per key.
    * For sum/count/min/max the result is exact. (Spark's own map-side
    * partial aggregation usually makes this unnecessary — reach for it when
    * partial aggregation is defeated, e.g. high-cardinality intermediate
    * state per key or `spark.sql.aggregate.partialaggregate` disabled.) */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      out: String,
      salts: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val salted = df.withColumn("__salt", floor(rand(seed) * salts).cast("int"))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }
}
