package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling and split operators for training-data pipelines.
  *
  * The split that matters at 100 TB is the REPRODUCIBLE one: `df.sample()`
  * output depends on partitioning and task scheduling, so re-running a
  * pipeline (or moving it to another cluster) silently reshuffles
  * train/test membership. Hash-based assignment — a stable key hashed and
  * compared against a threshold — gives the same split on any engine, any
  * layout, any day; that's how production dataset splits are done.
  */
object Sampling {

  /** Deterministic hash split: rows whose `md5(key)` hex falls below the
    * threshold go to `train`, the rest to `test`. `"cc"` ≈ 204/256 ≈ 79.7%
    * train. md5 is engine-portable (identical lowercase hex in Spark and
    * the DuckDB oracle), unlike xxhash64 which only Spark exposes. */
  def hashSplit(df: DataFrame, keyCol: String, trainHexThreshold: String = "cc"): DataFrame =
    df.withColumn("split",
      when(md5(col(keyCol).cast("string").cast("binary")) < lit(trainHexThreshold), "train")
        .otherwise("test"))

  /** Stratified sample: per-class fractions via `sampleBy` (Bernoulli per
    * row, seeded). Reproducible for a FIXED partitioning only — use
    * [[hashSplit]] when cross-run stability matters. */
  def stratified(df: DataFrame, classCol: String, fractions: Map[String, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(classCol, fractions, seed)
}
