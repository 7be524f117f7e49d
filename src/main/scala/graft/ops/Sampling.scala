package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic temperature-weighted source mixing: down-sample each
    * source so the kept corpus follows √n (temperature α = 0.5) source
    * weights — the standard multi-corpus rebalancing step (up-weight small
    * high-quality sources, damp the web crawl) of multilingual/multi-source
    * training recipes.
    *
    * Everything is exact integer or IEEE-pinned arithmetic so the SAME rows
    * are kept on any engine, any layout, any day:
    *  - per-source weight w_s = floor(√n_s · 10⁶) — `sqrt` is IEEE
    *    correctly-rounded everywhere (why α is fixed at 0.5: a general
    *    `pow` is NOT cross-engine reproducible), the floor pins it to an
    *    exact integer;
    *  - a row is kept iff u < targetRows·w_s/(W·n_s) with u the row-key's
    *    [[Sketches.md5Long60]] uniform as a fraction of 2^60 (md5 is the
    *    portable AVALANCHING hash — the polynomial fingerprints hash short
    *    keys into narrow bands and would bias the sample), cross-multiplied
    *    so both sides are products of pinned doubles in a fixed order —
    *    both engines round identically.
    *
    * Plan shape: one tiny aggregate (one row per source) broadcast back onto
    * the scan — the fact table is never shuffled; the filter is a per-row
    * predicate that survives any scale-up. Expected kept rows ≈ targetRows
    * when no source saturates (rate ≥ 1 keeps the whole source). */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
      targetRows: Long): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double")) * 1e6).cast("long"))
    val wsum = counts.agg(sum(col("__w")).as("__wsum"))
    val rates = counts.crossJoin(broadcast(wsum))
    val u = Sketches.md5Long60(col(keyCol)).cast("double")
    df.join(broadcast(rates), Seq(sourceCol))
      // u/2^60 < target·w/(W·n)  ⟺  u·n·W < target·w·2^60 — multiplication
      // order fixed left-to-right; the oracle spells the identical expression
      .where(u * col("__n").cast("double") * col("__wsum").cast("double")
        < lit(targetRows.toDouble) * col("__w").cast("double") * lit(1152921504606846976.0))
      .drop("__n", "__w", "__wsum")
  }

  /** [[temperatureMix]] under a MASS budget — the form an LLM data recipe
    * actually specifies: "x billion TOKENS of this mixture", not x rows.
    * Per-source mass T_s = Σ massCol (tokens, bytes, chars — exact integer
    * sum), temperature weight w_s = floor(√T_s·10⁶), and a row is kept iff
    * u/2^60 < targetMass·w_s/(W·T_s), so the EXPECTED KEPT MASS per source
    * is targetMass·w_s/W and totals targetMass across sources (rows are
    * kept with probability proportional to their source's rate regardless
    * of their own size — keeping by cumulative mass instead would make
    * inclusion depend on scan order, which nothing distributed can pin).
    * Same engine-portable arithmetic as [[temperatureMix]] (md5-60 uniform,
    * cross-multiplied pinned-double predicate, broadcast rates, zero fact
    * shuffle); rows with NULL mass contribute nothing to T_s but still
    * draw their keep decision from their source's rate. */
  def budgetMix(df: DataFrame, sourceCol: String, keyCol: String,
      massCol: Column, targetMass: Long): DataFrame = {
    val masses = df.groupBy(col(sourceCol))
      .agg(coalesce(sum(massCol.cast("long")), lit(0L)).as("__t"))
      .withColumn("__w", floor(sqrt(col("__t").cast("double")) * 1e6).cast("long"))
    val wsum = masses.agg(sum(col("__w")).as("__wsum"))
    val rates = masses.crossJoin(broadcast(wsum))
    val u = Sketches.md5Long60(col(keyCol)).cast("double")
    df.join(broadcast(rates), Seq(sourceCol))
      // u/2^60 < target·w/(W·T)  ⟺  u·T·W < target·w·2^60 — multiplication
      // order fixed left-to-right; the oracle spells the identical expression
      .where(u * col("__t").cast("double") * col("__wsum").cast("double")
        < lit(targetMass.toDouble) * col("__w").cast("double") * lit(1152921504606846976.0))
      .drop("__t", "__w", "__wsum")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, A-ES): each row draws the reproducible uniform u from
    * its key's md5-60-bit hash and competes with priority ln(u)/w — a
    * monotone transform of the classic u^(1/w) (one `ln` instead of a
    * `pow`, which is NOT cross-engine reproducible); the n highest
    * priorities win, which is exactly a weighted sample without
    * replacement. Priorities are quantized to micro-nat integers before
    * ranking, so the order is exact integer comparison on any engine
    * (ties → lowest key; the [[temperatureMix]]/[[hashSplit]] determinism
    * family). Rows with non-positive weight are dropped.
    *
    * Scale shape: the priority is a zero-shuffle per-row projection.
    * Grouped form: one shuffle per group for the top-n window. Global
    * form: orderBy+limit plans as TakeOrderedAndProject — per-partition
    * partial top-n, no single-task global sort; only the ≤ n winners are
    * re-ranked.
    *
    * PRECONDITION: `keyCol` must be UNIQUE per row (the same implicit
    * contract as the [[hashSplit]] family). Duplicate keys draw identical
    * priorities AND an identical tie-break, so which duplicate survives
    * the top-n cut would depend on engine/partition order — determinism
    * holds only for unique keys.
    *
    * Output: input columns + sample_rank (1-based within group / sample). */
  def weightedSample(df: DataFrame, weightCol: String, keyCol: String, n: Int,
      groupCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (Sketches.md5Long60(col(keyCol)).cast("double") + 1d) /
      lit(1152921504606846976.0)
    val pri = round(log(u) / col(weightCol).cast("double") * 1e6, 0).cast("long")
    val scored = df.where(col(weightCol).cast("double") > 0d).withColumn("__pri", pri)
    groupCol match {
      case Some(g) =>
        scored.withColumn("sample_rank", row_number().over(
            Window.partitionBy(col(g)).orderBy(col("__pri").desc, col(keyCol).asc)))
          .where(col("sample_rank") <= n).drop("__pri")
      case None =>
        scored.orderBy(col("__pri").desc, col(keyCol).asc).limit(n)
          .withColumn("sample_rank", row_number().over(
            Window.orderBy(col("__pri").desc, col(keyCol).asc)))
          .drop("__pri")
    }
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
