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

  /** Deterministic sequence packing: assign documents to fixed-token-budget
    * training sequences. Docs are laid out in (groupCol, keyCol) order and
    * a doc's sequence is its START offset `div` budget — the streaming-
    * concatenation layout training loaders use, expressed as pure window
    * arithmetic (one shuffle on groupCol; the running sum and both derived
    * columns share the sort). Deterministic on any engine/layout because
    * the order key is total. A doc longer than the budget still belongs to
    * the sequence its offset falls in (loaders split it downstream —
    * packing decides placement, not truncation).
    *
    * Output: input columns + n_tokens, seq_id (per-group sequence number),
    * seq_pos (1-based position within the sequence). */
  def packSequences(df: DataFrame, textCol: String, keyCol: String, groupCol: String,
      tokenBudget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(keyCol).asc)
    val withN = df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", (col("__start") / tokenBudget).cast("long"))
    withN
      .withColumn("seq_pos", row_number().over(
        Window.partitionBy(col(groupCol), col("seq_id")).orderBy(col(keyCol).asc)))
      .drop("__start")
  }

  /** Deterministic output sharding: shard = portable fingerprint of the key
    * mod nShards, plus the row's 1-based position within its shard (the
    * (shard, offset) address a training loader resumes from). The
    * fingerprint ([[TextAnalysis.fingerprint]]) is engine-portable, so the
    * assignment — unlike hash-partitioned writes — is reproducible across
    * engines and layouts. One shuffle on shard for the position window. */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", pmod(TextAnalysis.fingerprint(col(keyCol).cast("string")),
        lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col(keyCol).asc)))
  }
}
