package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one pass over the corpus per probe,
  * embarrassingly parallel, `TakeOrderedAndProject` for the top-k (no global
  * sort). Scale path: random-hyperplane LSH buckets — probes only compare
  * against their bucket (and optional multi-probe neighbors), turning a full
  * scan into a bucket-local scan; the hyperplanes are seeded literals so the
  * bucketing is deterministic and reproducible across runs/executors.
  */
object Similarity {

  /** Dot product of two array<float|double> columns (accumulated in double,
    * index order — matches the oracle engine's list accumulation). Portable
    * HOF form; [[dotFn]] upgrades to the codegen'd native expression when
    * the session carries [[graft.plans.GraftExtensions]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  /** Session-aware dot product: the native `graft_dot` expression (tight
    * primitive loop inside whole-stage codegen, no per-pair intermediate
    * array) when registered, else the interpreted HOF form. Both produce
    * bit-identical doubles (same accumulation order). */
  def dotFn(s: org.apache.spark.sql.SparkSession): (Column, Column) => Column =
    if (s.catalog.functionExists("graft_dot"))
      (a, b) => call_function("graft_dot", a, b)
    else dot

  /** Shared pair-scoring expression: cosine from a pair dot and HOISTED
    * per-side norms, zero-denominator → null (ANSI-safe), rounded to 6 dp
    * for cross-engine rank stability. One definition so null/rounding
    * semantics can't drift between the four pairwise operators. */
  private def cosineFromNorms(dp: (Column, Column) => Column,
      embA: Column, embB: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    round(when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dp(embA, embB) / denom), 6)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null (not a crash) for zero-norm vectors — under
    * Spark 4's default ANSI mode a plain division would abort the whole scan
    * on one all-zero embedding. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(null).cast("double")).otherwise(dot(a, b) / denom)
  }

  /** Brute-force top-k cosine neighbors of one probe vector.
    * Plans as scan → per-row expression → TakeOrderedAndProject(k): no
    * shuffle of the corpus, only k rows reach the driver. */
  def bruteForceTopK(
      corpus: DataFrame,
      probe: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      excludeSelfId: Option[Long] = None
  ): DataFrame = {
    val p = lit(probe.map(_.toDouble).toArray)
    val scored = corpus
      .withColumn("cosine", round(cosine(col(embCol), p), 6))
      .select(col(idCol), col("cosine"))
    val filtered = excludeSelfId.map(id => scored.where(col(idCol) =!= id)).getOrElse(scored)
    filtered.orderBy(col("cosine").desc, col(idCol).asc).limit(k)
  }

  /** Brute-force top-k per probe ROW (probes is a DataFrame): broadcast the
    * small probe set against the corpus scan, score per pair, `row_number`
    * top-k per probe. One pass over the corpus regardless of probe count —
    * the exact-answer baseline the LSH path approximates. */
  def bruteForceTopKJoin(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-row norms hoisted to the sides: one dot per scored pair, not three
    val dp = dotFn(corpus.sparkSession)
    val cb = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"))
    val pb = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
      sqrt(dp(col(embCol), col(embCol))).as("__np"))
    val scored = cb.crossJoin(broadcast(pb))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("cosine", cosineFromNorms(dp,
        col("p_emb"), col("c_emb"), col("__np"), col("__nc")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc_nulls_last, col("corpus_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** Deterministic random hyperplanes: `numPlanes` × `dim`, seeded. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** LSH bucket id of an embedding: sign bits against the hyperplanes,
    * packed as a bit-string (kept as string to dodge 64-bit packing).
    * `dp` lets callers pass the session's fastest dot product. */
  def lshBucket(emb: Column, planes: Array[Array[Double]],
      dp: (Column, Column) => Column = dot): Column =
    concat_ws("", planes.map { plane =>
      when(dp(emb, lit(plane)) >= 0, "1").otherwise("0")
    }.toIndexedSeq: _*)

  /** ANN via LSH: bucket the corpus once, then for each probe row compare
    * only within its bucket. Returns top-k per probe by cosine.
    *
    * `probes` and `corpus` are both (id, embedding) frames; self-pairs are
    * excluded. The bucketed join shuffles on the (small) bucket id, AQE
    * handles bucket-size skew.
    *
    * `multiProbe` > 0 additionally probes every bucket within Hamming
    * distance 1 of the probe's own bucket, flipping each of the first
    * `multiProbe` planes — the standard multi-probe trick: recall rises
    * toward brute force at the cost of (multiProbe+1)× probe fan-out,
    * WITHOUT growing the corpus index (only the tiny probe side explodes).
    */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      numPlanes: Int = 12,
      dim: Int = 64,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      multiProbe: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(multiProbe >= 0 && multiProbe <= numPlanes,
      "multiProbe must be in [0, numPlanes]")
    val planes = hyperplanes(numPlanes, dim, seed)
    val dp = dotFn(corpus.sparkSession)
    val cb = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"),
      lshBucket(col(embCol), planes, dp).as("bucket"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"))
    // The probe's own bucket lands in a REAL column first: the flip variants
    // reference it 3× each (31 refs at multiProbe=10), and inlining the
    // plane-dot expression into every reference both re-computes it 31× per
    // row and bloats the fused codegen stage past Janino's method limit —
    // the window's pre-shuffle partial top-k sort fuses this projection into
    // its addToSorter and was the suite's one remaining codegen failure.
    // >1 reference to a non-cheap expression stops CollapseProject from
    // re-inlining (the textStats trick).
    val ownC = col("__own")
    val probeBuckets =
      if (multiProbe == 0) array(ownC)
      else array(ownC +: (0 until multiProbe).map { i =>
        // flip bit i of the bucket string: bucket ∂ Hamming-1 neighbor
        concat(
          substring(ownC, 1, i),
          when(substring(ownC, i + 1, 1) === "1", "0").otherwise("1"),
          substring(ownC, i + 2, numPlanes - i - 1))
      }: _*)
    val pb = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        lshBucket(col(embCol), planes, dp).as("__own"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"))
      .withColumn("bucket", explode(probeBuckets))
      .drop("__own")
    val scored = pb.join(cb, Seq("bucket"))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("cosine", cosineFromNorms(dp,
        col("p_emb"), col("c_emb"), col("__np"), col("__nc")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("corpus_id").asc)
    // No dedup needed: each corpus row carries exactly ONE bucket and the
    // probe's bucket variants are pairwise-distinct strings, so a
    // (probe, corpus) pair can match on at most one bucket. (Hamming-≥2
    // probing would need a dedup here.)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is bucketed into
    * Voronoi cells of `nLists` centroids; each probe searches only its
    * `nProbe` highest-scoring cells — corpus scan work drops by
    * ~nProbe/nLists vs brute force while recall stays high for clustered
    * data. `nProbe = nLists` degenerates to exact brute force (spec-tested).
    *
    * Centroid bootstrap: the `nLists` lowest-id vectors, collected to the
    * driver and folded in as literals (same pattern as the LSH hyperplanes;
    * a production bootstrap would run k-means — the query shape and plan
    * are identical, only the literal values change). Cell scoring uses dot
    * product, i.e. cosine ranking for L2-normalized embeddings. */
  /** Deterministic centroid bootstrap shared by [[ivfTopK]] and
    * [[kmeansIter]]: the `nLists` lowest-id vectors as (cellId, vector)
    * literals. One definition so the index and its refinement step can
    * never desynchronize (both oracles re-derive exactly this). */
  private[graft] def centroidBootstrap(
      corpus: DataFrame, nLists: Int, idCol: String, embCol: String): Array[(Int, Array[Double])] = {
    val centroids = corpus
      // null/empty vectors can't seed a cell (and would NPE the literal fold)
      .where(col(embCol).isNotNull && size(col(embCol)) > 0)
      // cast to array<double> in-plan so float AND double embedding columns
      // collect uniformly (the pqCodebooks lesson — a bare getSeq[Float]
      // ClassCastExceptions on array<double> corpora, and this bootstrap
      // feeds every IVF/SemDeDup/ivfPq entry point)
      .select(col(idCol), col(embCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(nLists)
      .collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }
    require(centroids.nonEmpty, "corpus must be non-empty")
    centroids
  }

  /** Per-row (score, cellId) struct array against the bootstrap centroids;
    * `array_max` of it = nearest cell (ties → higher cell id). */
  private[graft] def cellScores(centroids: Array[(Int, Array[Double])],
      dp: (Column, Column) => Column)(emb: Column): Column =
    array(centroids.map { case (cid, c) =>
      struct(dp(emb, lit(c)).as("s"), lit(cid).as("c"))
    }.toIndexedSeq: _*)

  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame =
    ivfTopKFrom(centroidBootstrap(corpus, nLists, idCol, embCol),
      corpus, probes, k, nProbe, idCol, embCol)

  /** IVF search against an explicit centroid set — shared by the bootstrap
    * index ([[ivfTopK]]) and the Lloyd-refined index ([[ivfRefinedTopK]]). */
  private def ivfTopKFrom(
      centroids: Array[(Int, Array[Double])],
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String,
      embCol: String
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val cellScores = this.cellScores(centroids, dp) _
    val cb = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"),
      array_max(cellScores(col(embCol))).getField("c").as("cell"))
    ivfSearch(centroids, cb, probes, k, nProbe, idCol, embCol)
  }

  /** Probe-side IVF search over a prepared corpus frame
    * (corpus_id, c_emb, __nc, cell) — the shared tail of [[ivfTopKFrom]]
    * (cell computed in-plan) and [[ivfTopKFromIndex]] (cell joined from the
    * materialized assignment table). */
  private def ivfSearch(
      centroids: Array[(Int, Array[Double])],
      cb: DataFrame,
      probes: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String,
      embCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dp = dotFn(probes.sparkSession)
    val cellScores = this.cellScores(centroids, dp) _
    val pb = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"),
        slice(reverse(array_sort(cellScores(col(embCol)))), 1, nProbe).as("__cells"))
      .withColumn("cell", explode(expr("transform(__cells, x -> x.c)")))
      .drop("__cells")
    val scored = pb.join(cb, Seq("cell"))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("cosine", cosineFromNorms(dp,
        col("p_emb"), col("c_emb"), col("__np"), col("__nc")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc_nulls_last, col("corpus_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** A materialized IVF index: `centroids` (cell, centroid array<double>)
    * and `assignments` (idCol, cell) — both plain DataFrames that write and
    * read as parquet tables. The build artifact of the build-once /
    * serve-many split: at 100 TB the corpus-side assignment (one argmax
    * over nLists centroids PER CORPUS ROW — by far the expensive half) runs
    * once per corpus snapshot; serving recomputes nothing but the probe
    * side. */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** BUILD the IVF index: bootstrap (iters = 0) or Lloyd-refine (iters > 0)
    * the centroids, then assign every corpus vector to its cell with
    * exactly the expression the in-plan search uses — so a served lookup
    * ([[ivfTopKFromIndex]]) is provably the same search [[ivfTopK]] /
    * [[ivfRefinedTopK]] run, just against the stored assignment
    * (q_ivf_topk_served pins this through a parquet round-trip against
    * q_ivf_topk's own oracle). */
  def ivfIndex(
      corpus: DataFrame,
      nLists: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): IvfIndex = {
    val spark = corpus.sparkSession
    val dp = dotFn(spark)
    val cents =
      if (iters > 0) refinedCentroids(corpus, nLists, iters, idCol, embCol)
      else centroidBootstrap(corpus, nLists, idCol, embCol)
    val centDf = spark.createDataFrame(cents.toIndexedSeq).toDF("cell", "centroid")
    val cellScores = this.cellScores(cents, dp) _
    val assignments = corpus.select(col(idCol),
      array_max(cellScores(col(embCol))).getField("c").as("cell"))
    IvfIndex(centDf, assignments)
  }

  /** Assign a corpus shard to the cells of an EXISTING centroid table —
    * the per-shard / incremental half of the IVF build: centroids are
    * fixed once ([[ivfIndex]]), then any number of corpus shards build
    * their assignments independently (per-row argmax against the same
    * centroids ⇒ trivially disjoint-mergeable: union of shard assignments
    * = the monolithic assignment, spec-pinned), and newly-landed shards
    * append to the artifact without touching old rows — the same
    * incremental story as [[graft.ops.TextAnalysis.bm25IndexMerge]], for
    * free because assignment has no cross-row terms. Uses the search's
    * exact argmax expression, so served lookups cannot drift. */
  def ivfAssign(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val cellScores = this.cellScores(collectCentroids(centroids), dp) _
    corpus.select(col(idCol),
      array_max(cellScores(col(embCol))).getField("c").as("cell"))
  }

  /** RETRACT a vector set from a materialized [[IvfIndex]] — the deletion
    * path mirroring [[graft.ops.TextAnalysis.bm25IndexRetract]]: assignment
    * rows are per-vector with no cross-row terms, so dropping the ids'
    * rows IS `build(W ∖ D)` exactly (centroids are a fixed build-time
    * artifact by the [[ivfAssign]] contract — retraction does not move
    * them, just as incremental adds don't; re-centering is a rebuild
    * decision, not a delete). Served top-k over the retracted index can
    * surface the deleted ids ONLY via the corpus frame passed at serve
    * time, and the assignment join drops unmatched corpus rows — so a
    * serve against the ORIGINAL corpus frame still never returns deleted
    * ids (spec-pinned). D broadcasts; nothing corpus-sized. */
  def ivfRetract(index: IvfIndex, vecIds: DataFrame,
      idCol: String = "vec_id"): IvfIndex =
    IvfIndex(index.centroids,
      index.assignments.join(broadcast(vecIds.select(col(idCol)).distinct()),
        Seq(idCol), "left_anti"))

  /** DRIFT MONITOR for the incremental IVF artifact — the operational
    * "when do I rebuild the centroids" number: per arrival epoch
    * (`batchCol` on the assignment table — the `batch=<id>` partitions
    * the streamed builder lands), the distribution of each vector's
    * cosine to its ASSIGNED centroid. Centroids are fixed at build time
    * ([[ivfAssign]]'s contract), so if newly-landed epochs' vectors sit
    * systematically farther from their cells (mean_cos declining, p10_cos
    * sagging vs the bootstrap epochs), the embedding distribution has
    * drifted and the index needs re-centering (a rebuild decision, not a
    * delete — the [[ivfRetract]] scaladoc's split); flat curves mean the
    * incremental adds are safe to keep appending.
    *
    * Scale shape: one join of the assignment table with its corpus
    * embeddings (both keyed on the id the artifact can be bucketed by)
    * plus a broadcast of the ≤ nLists centroid rows; output is one row
    * per epoch. Cross-engine determinism: per-row cosine is the shared
    * 6-dp-rounded expression, the mean is micro-unit integer quantized
    * (order-free sums — the corpus-report recipe), p10 is `percentile`'s
    * linear interpolation. Zero-norm vectors carry a null cosine and are
    * excluded from both stats but counted in `n` (the contamination
    * absence-is-a-decision convention).
    * Output: (batchCol, n, n_scored, mean_cos, p10_cos). */
  def ivfDriftStats(
      index: IvfIndex,
      corpus: DataFrame,
      batchCol: String = "batch",
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val scored = index.assignments
      .join(corpus.select(col(idCol), col(embCol)), Seq(idCol))
      .join(broadcast(index.centroids), Seq("cell"))
      .select(col(batchCol),
        cosineFromNorms(dp, col(embCol), col("centroid"),
          sqrt(dp(col(embCol), col(embCol))),
          sqrt(dp(col("centroid"), col("centroid")))).as("__cos"))
    scored.groupBy(col(batchCol))
      .agg(count(lit(1)).as("n"),
        count(col("__cos")).as("n_scored"),
        when(count(col("__cos")) > 0,
          round(sum(round(col("__cos") * 1e6, 0).cast("long")).cast("double")
            / count(col("__cos")).cast("double") / 1e6, 4)).as("mean_cos"),
        round(expr("percentile(__cos, 0.1)"), 6).as("p10_cos"))
  }

  /** Collect a (cell, centroid) table back into the bounded literal array
    * the probe/assignment expressions fold in — ≤ nLists rows by
    * construction, the same driver hop the bootstrap uses. */
  private def collectCentroids(centroids: DataFrame): Array[(Int, Array[Double])] =
    // cast in-plan: our build writes array<double>, but an index parquet
    // rewritten by an external tool as array<float> must not ClassCastException
    centroids.select(col("cell"), col("centroid").cast("array<double>")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)

  /** SERVE IVF top-k from a materialized [[IvfIndex]]: the ≤ nLists
    * centroid rows collect back into probe-side literals (the same bounded
    * driver hop the build used), and the corpus side joins the stored
    * (id, cell) assignment instead of recomputing the per-row argmax —
    * corpus vectors are touched only for the within-cell cosine. */
  def ivfTopKFromIndex(
      index: IvfIndex,
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val cents = collectCentroids(index.centroids)
    val cb = corpus
      .select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"),
        sqrt(dp(col(embCol), col(embCol))).as("__nc"))
      .join(index.assignments.select(col(idCol).as("corpus_id"), col("cell")),
        Seq("corpus_id"))
    ivfSearch(cents, cb, probes, k, nProbe, idCol, embCol)
  }

  /** Prototypicality-based dataset PRUNING (Sorscher et al. 2022, "Beyond
    * neural scaling laws": rank every example by its cosine to its
    * cluster's centroid — prototypical/"easy" = close, "hard" = far — and
    * keep a per-cluster quota; with abundant data keeping the HARDEST
    * examples beats random pruning). The cluster structure is the IVF
    * machinery verbatim: the deterministic [[centroidBootstrap]] cells and
    * the search's own argmax assignment, so the oracle replays it with the
    * established centroid CTEs.
    *
    * Per-cell quotas (vs a global top-k) are the point at scale: a global
    * hardness cut empties dense clusters' neighborhoods unevenly, while
    * per-cell ranking preserves coverage of every region of the embedding
    * space — and it parallelizes as one window over a cell-keyed shuffle.
    *
    * The assignment dot product is reused as the cosine numerator
    * (centroid norms fold in as ≤ nLists literals; vector norms are one
    * in-plan dot), so pruning adds nothing corpus-sized beyond the
    * assignment pass every IVF build already pays. Zero-norm vectors get a
    * NULL score and rank LAST under either ordering (null ordering pinned
    * cross-engine); null/empty embeddings are dropped up front (the
    * [[kmeansIter]] convention). Output: (idCol, cell, proto, rn) for the
    * ≤ perCell survivors of each cell — anti/semi-join back by id to
    * materialize the pruned corpus. */
  def prototypicalityPrune(
      corpus: DataFrame,
      nLists: Int = 16,
      perCell: Int = 20,
      keepHardest: Boolean = true,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    val dp = dotFn(spark)
    val cents = centroidBootstrap(corpus, nLists, idCol, embCol)
    val cs = cellScores(cents, dp) _
    // ≤ nLists centroid norms as an array literal indexed by cell id; the
    // driver-side left-fold sum matches dotSql's list_reduce order
    val normLits = array(cents.map { case (_, c) =>
      lit(math.sqrt(c.map(x => x * x).sum)) }.toIndexedSeq: _*)
    val ord =
      if (keepHardest) col("proto").asc_nulls_last else col("proto").desc_nulls_last
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(ord, col(idCol).asc)
    corpus
      .where(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol), array_max(cs(col(embCol))).as("__sc"),
        sqrt(dp(col(embCol), col(embCol))).as("__nv"))
      .select(col(idCol), col("__sc.c").as("cell"), col("__sc.s").as("__s"), col("__nv"))
      .withColumn("__ncl", element_at(normLits, col("cell") + 1))
      .withColumn("proto",
        when(col("__nv") * col("__ncl") === 0, lit(null).cast("double"))
          .otherwise(round(col("__s") / (col("__nv") * col("__ncl")), 6)))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perCell)
      .select(col(idCol), col("cell"), col("proto"), col("rn"))
  }

  /** One distributed Lloyd (k-means) iteration over the embedding corpus:
    * assign every vector to its nearest centroid (same deterministic
    * lowest-id bootstrap as [[ivfTopK]] — the refinement loop a production
    * IVF build runs), then recompute each cell's centroid as the member
    * mean. Output is a per-cell scalar surface (member count, centroid
    * norm, first mean component) — the full mean vector stays internal.
    *
    * Scale shape: assignment is embarrassingly parallel per row; the
    * recompute is ONE hash aggregate whose buffer is a single dim-wide
    * vector per cell ([[graft.plans.VectorSumAgg]] — partial aggregation
    * collapses each partition to ≤nLists vectors before the shuffle).
    * Sessions without the extension fall back to posexplode + (cell, pos)
    * aggregation: same result, dim× more shuffled rows. */
  def kmeansIter(
      corpus: DataFrame,
      nLists: Int = 16,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    val dp = dotFn(spark)
    val centroids = centroidBootstrap(corpus, nLists, idCol, embCol)
    val cellScores = this.cellScores(centroids, dp) _
    // Null/empty embeddings are dropped up front: they carry no position, and
    // keeping them would (a) diverge the native and posexplode paths on
    // n_members (graft_vec_sum skips them, posexplode emits no rows) and
    // (b) leave an all-null cell with an empty vsum, where element_at would
    // abort the job under ANSI mode.
    val assigned = corpus
      .where(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(
        array_max(cellScores(col(embCol))).getField("c").as("cell"),
        col(embCol).as("emb"))
    val summed = vecSummed(spark, assigned)
    summed.select(col("cell"), col("n_members"),
      round(sqrt(dot(col("vsum"), col("vsum"))) / col("n_members"), 6).as("centroid_norm"),
      round(element_at(col("vsum"), 1) / col("n_members"), 6).as("mean_c0"))
  }

  /** (cell, emb) → (cell, n_members, vsum): the native graft_vec_sum
    * aggregate when registered, else [[vecSumFallback]] — the one shared
    * per-cell vector-mean reduction under [[kmeansIter]],
    * [[refinedCentroids]], and [[refinedPqCodebooks]]. */
  private def vecSummed(spark: org.apache.spark.sql.SparkSession,
      assigned: DataFrame): DataFrame =
    if (spark.catalog.functionExists("graft_vec_sum"))
      assigned.groupBy("cell").agg(count(lit(1)).as("n_members"),
        call_function("graft_vec_sum", col("emb")).as("vsum"))
    else vecSumFallback(assigned)

  /** Portable vector-sum fallback (posexplode + positional aggregate) for
    * sessions without the graft_vec_sum aggregate. Input: (cell, emb) →
    * (cell, n_members, vsum). Must agree with the native aggregate
    * (spec-tested) — including on ragged corpora: ragged NON-EMPTY vector
    * widths within a cell make the native aggregate throw a width-mismatch
    * error, so the fallback raises too (per-position counts diverge from
    * the member count exactly when widths are ragged) instead of silently
    * producing truncated per-position sums.
    *
    * PRECONDITION (both paths): rows with null or EMPTY vectors must be
    * filtered by the caller — kmeansIter/refinedCentroids do. An empty
    * vector emits no posexplode rows, so this guard cannot see it, and the
    * two paths would disagree on n_members (native counts the row, the
    * fallback loses it). Behavior with empty vectors is undefined. */
  private[graft] def vecSumFallback(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("emb")))
      .groupBy("cell", "pos")
      .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("cnt"))
      .groupBy("cell")
      .agg(max(col("cnt")).as("__max_cnt"), min(col("cnt")).as("__min_cnt"),
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")).as("vsum"))
      .select(col("cell"),
        when(col("__min_cnt") === col("__max_cnt"), col("__max_cnt"))
          .otherwise(raise_error(concat(
            lit("vecSumFallback: ragged vector widths in cell "),
            col("cell").cast("string")))).as("n_members"),
        col("vsum"))

  /** `iters` full Lloyd rounds over the corpus: assign → per-cell mean →
    * feed the means back as the next round's centroid literals — the
    * production IVF index-build loop that the single [[kmeansIter]] step
    * stands in for. Each round is one distributed pass (the same
    * vector-sum aggregate as kmeansIter, shuffle ∝ nLists×dim); only the
    * ≤nLists×dim mean matrix crosses the driver between rounds (the same
    * bounded-collect pattern as the bootstrap).
    *
    * Cross-engine determinism: mean components are rounded to 6 decimals
    * (HALF_UP — Spark/DuckDB `round` convention) before becoming literals,
    * a margin ≫ the ~1e-9 summation-order drift, so a DuckDB oracle
    * re-deriving the same rounds computes bit-identical centroid literals
    * and therefore identical assignments. Cells that lose every member
    * keep their previous centroid. */
  private[graft] def refinedCentroids(
      corpus: DataFrame,
      nLists: Int,
      iters: Int,
      idCol: String,
      embCol: String
  ): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    val dp = dotFn(spark)
    // Iterative algorithm over a re-read input: cache the cleaned corpus
    // for the duration of the refinement (the standard k-means pattern —
    // every round re-scans it; MEMORY_AND_DISK spills rather than OOMs at
    // scale). Unpersisted before return; each round's collect materializes
    // it, so the cache is always warm for round 2+.
    val clean = corpus.where(col(embCol).isNotNull && size(col(embCol)) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = centroidBootstrap(corpus, nLists, idCol, embCol)
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    try for (_ <- 1 to iters) {
      val cs = cellScores(cents, dp) _
      val assigned = clean.select(
        array_max(cs(col(embCol))).getField("c").as("cell"), col(embCol).as("emb"))
      val summed = vecSummed(spark, assigned)
      val means = summed.collect().map { r =>
        val n = r.getAs[Long]("n_members").toDouble
        r.getAs[Int]("cell") -> r.getSeq[Double](r.fieldIndex("vsum")).map(v => round6(v / n)).toArray
      }.toMap
      cents = cents.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    } finally clean.unpersist()
    cents
  }

  /** IVF top-k over the Lloyd-refined index: [[refinedCentroids]] then the
    * standard cell-blocked search. Same plan shape as [[ivfTopK]]; only the
    * centroid literal values differ. */
  def ivfRefinedTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame =
    ivfTopKFrom(refinedCentroids(corpus, nLists, iters, idCol, embCol),
      corpus, probes, k, nProbe, idCol, embCol)

  /** Embedding-cosine near-duplicate pairs under a blocking key: pairs are
    * scored only within equal `blockCol` values, so the join fans out per
    * block instead of all-pairs — the standard way to keep near-dup
    * detection sub-quadratic (swap the block key for an LSH bucket id via
    * [[lshBucket]] when no natural key exists). */
  def cosineNearDupPairs(
      df: DataFrame,
      threshold: Double,
      blockCol: String = "label",
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    // Norms are per-ROW quantities: hoist them into the sides so each pair
    // costs one dot product, not three (3× fewer array passes in the
    // quadratic part; measured 7.6s → ~2.5s on sf0.1).
    val dp = dotFn(df.sparkSession)
    val a = df.select(col(blockCol), col(idCol).as("id_a"), col(embCol).as("emb_a"),
      sqrt(dp(col(embCol), col(embCol))).as("__na"))
    val b = df.select(col(blockCol), col(idCol).as("id_b"), col(embCol).as("emb_b"),
      sqrt(dp(col(embCol), col(embCol))).as("__nb"))
    a.join(b, Seq(blockCol))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosineFromNorms(dp,
        col("emb_a"), col("emb_b"), col("__na"), col("__nb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Semantic (embedding-space) deduplication, SemDeDup-style (Abbas et
    * al. 2023): cluster the corpus, compare pairs only WITHIN each cluster,
    * and keep one representative (the lowest id) of every cosine-≥-threshold
    * group. The cluster assignment is the same deterministic IVF bootstrap
    * the ANN index uses ([[centroidBootstrap]] + argmax cell), so the
    * blocking is reproducible across engines and the whole drop decision
    * carries a DuckDB oracle.
    *
    * This is the scale shape for embedding near-dup: [[cosineNearDupPairs]]
    * blocks on a LABEL column (needs one to exist); here the blocks are
    * learned Voronoi cells, and the pairwise stage is quadratic only within
    * a cell — at 100 TB you raise `nLists` so the expected cell size stays
    * bounded (cells ∝ corpus/nLists), exactly how SemDeDup runs on web-scale
    * corpora. One shuffle on `cell` feeds both self-join sides; norms are
    * hoisted per side so each pair costs one dot product.
    *
    * Returns the SURVIVORS as (idCol, cell): a row is dropped iff it is the
    * larger id of any within-cell pair with cosine ≥ threshold (null cosine
    * — zero-norm vectors — never matches).
    *
    * Exact-duplicate embeddings are collapsed to their min-id
    * representative BEFORE the pairwise stage. This is a pure optimization,
    * not a semantics change: cos(x, x) = 1 ≥ threshold, so every non-min
    * copy is dropped by its own representative anyway, and a copy is
    * near-dup to exactly what its representative is near-dup to — the
    * survivor set is provably identical. What it buys at scale: web-scale
    * corpora are FULL of byte-identical embeddings, which all hash to the
    * same cell — without the collapse, duplication ×d multiplies the hot
    * cell's pair work by d² and no nLists increase can dilute it (measured
    * 1.7 s → 14.8 s at copies ×10; near-flat collapsed). Null / empty /
    * all-zero embeddings are EXCLUDED from the collapse: their cosine is
    * null, they never match a pair, so the contract says every one of them
    * survives — collapsing them would silently drop rows. */
  def semanticDedup(corpus: DataFrame, threshold: Double, nLists: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val centroids = centroidBootstrap(corpus, nLists, idCol, embCol)
    val degenerate = col(embCol).isNull || size(col(embCol)) === 0 ||
      !exists(col(embCol), x => x =!= 0.0f)
    val reps = corpus.where(!degenerate)
      .groupBy(col(embCol)).agg(min(col(idCol)).as(idCol))
    // Assignment = broadcast-join argmax, NOT the cellScores literal array:
    // a per-row array of nLists (score, cell) structs re-materializes
    // nLists×dim literal doubles per row, which dominates once nLists grows
    // with the corpus (measured 48 s vs 12 s at nLists=160 over 50k
    // vectors). The join form streams one (row, centroid) pair at a time
    // through codegen and is what the oracle replays; max_by on a
    // (score, cell) struct keeps the exact s-then-c tie-break.
    val centDf = corpus.sparkSession
      .createDataFrame(centroids.toIndexedSeq).toDF("cell", "__cemb")
    val assigned = reps.crossJoin(broadcast(centDf))
      .groupBy(col(idCol))
      .agg(max_by(col("cell"), struct(dp(col(embCol), col("__cemb")).as("s"),
          col("cell").as("c"))).as("cell"),
        first(col(embCol)).as(embCol))
    // degenerate rows (null cosine — never pair, always survive) keep the
    // literal-array assignment: bit-for-bit the pre-collapse behavior
    val cells = cellScores(centroids, dp) _
    val degen = corpus.where(degenerate).select(col(idCol), col(embCol),
      array_max(cells(col(embCol))).getField("c").as("cell"))
    semanticDropTail(
      assigned.select(col(idCol), col(embCol), col("cell")).unionByName(degen),
      dp, threshold, idCol, embCol)
  }

  /** Shared within-cell pair/drop tail of [[semanticDedup]] and
    * [[semanticDedupFromIndex]]. Three consumers (both pair sides + the
    * survivor anti-join) — persist so the upstream collapse + assignment
    * run once, not three times (the dropNearDuplicates precedent;
    * ContextCleaner reclaims the blocks). */
  private def semanticDropTail(asgIn: DataFrame, dp: (Column, Column) => Column,
      threshold: Double, idCol: String, embCol: String): DataFrame = {
    val asg = asgIn
      .withColumn("__n", sqrt(dp(col(embCol), col(embCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = asg.select(col("cell"), col(idCol).as("id_a"), col(embCol).as("emb_a"),
      col("__n").as("__na"))
    val b = asg.select(col("cell"), col(idCol).as("id_b"), col(embCol).as("emb_b"),
      col("__n").as("__nb"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(cosineFromNorms(dp, col("emb_a"), col("emb_b"), col("__na"), col("__nb"))
        >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    asg.join(dropped, Seq(idCol), "left_anti").select(col(idCol), col("cell"))
  }

  /** The SemDeDup ACCURACY gate — the embedding-dedup family's member of
    * the measured-knob family ([[graft.ops.Dedup.minhashAccuracy]] /
    * q_ann_recall): [[semanticDedup]] only compares vectors WITHIN a
    * cell, so its miss mode is a near-dup pair split across cells, and
    * the `nLists` knob trades that recall against within-cell pair cost
    * (cell size ~ n/nLists ⇒ pair work ~ n²/nLists). This measures it:
    * of the exact brute-force cosine-≥-threshold pairs anchored at the
    * probe subset, the fraction whose two sides land in the SAME
    * bootstrap cell, per nLists in the sweep. n_true is constant across
    * rows (the truth doesn't move with nLists). The sweep DIRECTION is
    * corpus-dependent — which is exactly why this is a gate and not a
    * formula: asymptotically finer partitions must split neighborhoods,
    * but with unrefined bootstrap centroids COARSE cells assign
    * near-ties arbitrarily, and on the synthetic corpus recall RISES
    * 0.39 → 0.51 → 0.61 across 8/16/32 lists as cells align with the
    * latent label clusters (sf0.01; q_semdedup_recall — 0.36/0.45/0.67
    * at sf0.1). And the obvious fix is measured NOT to work: two Lloyd
    * rounds ([[refinedCentroids]]) moved sf0.1 hits 76/96/142 →
    * 75/94/136 at 8/16/32 lists — refinement balances cell SIZES (the
    * search-cost story), it does not keep near-dup pairs together. The
    * recall levers are nLists (bounded by the n²/nLists pair-cost
    * trade) and, at the margin, the serving threshold. Measure on a
    * corpus sample at deployment scale exactly like the sketch-dedup
    * gates.
    *
    * Scale shape: ONE brute-force truth pass (probe-subset × corpus —
    * probe-bounded, the q_ann_recall recipe), then per sweep point a
    * corpus×nLists argmax projection and two broadcast-joined cell
    * lookups over the (small) truth pair list. Empty truth ⇒ NULL
    * recall. Output: (n_lists, n_true, n_hit, recall). */
  def semanticDedupRecall(
      corpus: DataFrame,
      nListsSweep: Seq[Int] = Seq(8, 16, 32),
      threshold: Double = 0.35,
      probeMax: Long = 50,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    require(nListsSweep.nonEmpty, "semanticDedupRecall needs a sweep")
    val dp = dotFn(corpus.sparkSession)
    val cn = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("__ce"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"))
    val pn = corpus.where(col(idCol) < probeMax)
      .select(col(idCol).as("probe_id"), col(embCol).as("__pe"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"))
    val truth = cn.crossJoin(broadcast(pn))
      .where(col("probe_id") =!= col("corpus_id"))
      .where(cosineFromNorms(dp, col("__pe"), col("__ce"), col("__np"), col("__nc"))
        >= threshold)
      .select(col("probe_id"), col("corpus_id"))
    nListsSweep.map { l =>
      val cells = cellScores(centroidBootstrap(corpus, l, idCol, embCol), dp) _
      val asg = corpus.select(col(idCol),
        array_max(cells(col(embCol))).getField("c").as("cell"))
      truth
        .join(asg.select(col(idCol).as("probe_id"), col("cell").as("__pc")),
          Seq("probe_id"))
        .join(asg.select(col(idCol).as("corpus_id"), col("cell").as("__cc")),
          Seq("corpus_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__pc") === col("__cc"), 1L).otherwise(0L)).as("n_hit"))
        .select(lit(l).as("n_lists"), col("n_true"), col("n_hit"),
          when(col("n_true") > 0,
            round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
            .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** MULTI-PROBE SemDeDup — the ADOPTED answer to the r12 recall finding
    * (the argmax-cell pass at nLists=16 sees only ~45% of exact pair
    * mass on this corpus and Lloyd refinement does not lift it;
    * [[semanticDedupRecallProbed]] measured top-2 cells lifting recall
    * 0.45 → 0.66 at nLists=16, 0.36 → 0.75 at 8): every non-degenerate
    * vector claims its TOP-nProbe cells (the search's `nProbe` idea
    * applied to dedup), candidate pairs are vectors sharing ANY claimed
    * cell, and the drop rule is unchanged (higher id of any pair at
    * cosine ≥ threshold drops; a pair met in two shared cells collapses
    * in the distinct). Survivors carry their RESIDENT (argmax) cell, so
    * the output shape matches [[semanticDedup]]. Pair cost grows up to
    * ~nProbe² per cell (each vector resides in nProbe buckets) — the
    * measured recall/cost trade the gate quantifies per corpus; at
    * nProbe = 1 this IS [[semanticDedup]] (the exact-duplicate collapse
    * runs the same, pairs identical). Claimed cells rank by the exact
    * (s DESC, c DESC) argmax order via one window over the broadcast
    * centroid join; degenerate vectors (null cosine — never pair,
    * always survive) keep the literal-array resident assignment. */
  def semanticDedupProbed(corpus: DataFrame, threshold: Double, nLists: Int = 16,
      nProbe: Int = 2, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1, "nProbe must be >= 1")
    val dp = dotFn(corpus.sparkSession)
    val centroids = centroidBootstrap(corpus, nLists, idCol, embCol)
    val degenerate = col(embCol).isNull || size(col(embCol)) === 0 ||
      !exists(col(embCol), x => x =!= 0.0f)
    val reps = corpus.where(!degenerate)
      .groupBy(col(embCol)).agg(min(col(idCol)).as(idCol))
    val centDf = corpus.sparkSession
      .createDataFrame(centroids.toIndexedSeq).toDF("cell", "__cemb")
    // top-nProbe claimed cells: the broadcast-join form (the semanticDedup
    // argmax rationale — no nLists×dim literal re-materialization per row),
    // ranked by the same (s, c) struct order the argmax uses
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__s").desc, col("cell").desc)
    val claimed = reps.crossJoin(broadcast(centDf))
      .select(col(idCol), col(embCol), col("cell"),
        dp(col(embCol), col("__cemb")).as("__s"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nProbe)
      .select(col(idCol), col(embCol), col("cell"), col("__rn"))
    val cells = cellScores(centroids, dp) _
    val degen = corpus.where(degenerate).select(col(idCol), col(embCol),
      array_max(cells(col(embCol))).getField("c").as("cell"), lit(1).as("__rn"))
    val asg = claimed.unionByName(degen)
      .withColumn("__n", sqrt(dp(col(embCol), col(embCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = asg.select(col("cell"), col(idCol).as("id_a"), col(embCol).as("emb_a"),
      col("__n").as("__na"))
    val b = asg.select(col("cell"), col(idCol).as("id_b"), col(embCol).as("emb_b"),
      col("__n").as("__nb"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(cosineFromNorms(dp, col("emb_a"), col("emb_b"), col("__na"), col("__nb"))
        >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    asg.where(col("__rn") === 1).join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** The MULTI-PROBE extension of [[semanticDedupRecall]] — the measured
    * lever for the gate's r12 finding (nLists=16 sees only ~45% of exact
    * pair mass on this corpus, and Lloyd refinement does not lift it):
    * instead of the argmax cell alone, each vector claims its TOP-nProbe
    * cells (the search-side `nProbe` idea applied to dedup), and a truth
    * pair counts as CAUGHT when the two vectors' claimed cell sets
    * overlap — exactly the candidate criterion a probed within-cell pass
    * would enumerate. Candidate-pair cost grows ~nProbe² per cell in the
    * worst case (each vector resides in nProbe buckets), so run this gate
    * on a corpus sample and adopt the smallest nProbe whose recall is
    * acceptable. nProbe = 1 reproduces [[semanticDedupRecall]]'s numbers
    * row-for-row (internal consistency check the oracle also pins).
    * Cell ranking uses the search's exact (s DESC, c DESC) struct order.
    * Output: (n_lists, n_probe, n_true, n_hit, recall). */
  def semanticDedupRecallProbed(
      corpus: DataFrame,
      nListsSweep: Seq[Int] = Seq(8, 16, 32),
      nProbes: Seq[Int] = Seq(1, 2),
      threshold: Double = 0.35,
      probeMax: Long = 50,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    require(nListsSweep.nonEmpty && nProbes.nonEmpty,
      "semanticDedupRecallProbed needs both sweeps")
    val dp = dotFn(corpus.sparkSession)
    val cn = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("__ce"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"))
    val pn = corpus.where(col(idCol) < probeMax)
      .select(col(idCol).as("probe_id"), col(embCol).as("__pe"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"))
    val truth = cn.crossJoin(broadcast(pn))
      .where(col("probe_id") =!= col("corpus_id"))
      .where(cosineFromNorms(dp, col("__pe"), col("__ce"), col("__np"), col("__nc"))
        >= threshold)
      .select(col("probe_id"), col("corpus_id"))
    val rows = for (l <- nListsSweep; p <- nProbes) yield {
      val cells = cellScores(centroidBootstrap(corpus, l, idCol, embCol), dp) _
      // sort_array desc on the (s, c) struct = the argmax tie-break
      // (s DESC, c DESC); the first nProbe entries are the claimed cells
      val asg = corpus.select(col(idCol),
        slice(sort_array(cells(col(embCol)), asc = false), 1, p)
          .getField("c").as("cells"))
      truth
        .join(asg.select(col(idCol).as("probe_id"), col("cells").as("__pc")),
          Seq("probe_id"))
        .join(asg.select(col(idCol).as("corpus_id"), col("cells").as("__cc")),
          Seq("corpus_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(arrays_overlap(col("__pc"), col("__cc")), 1L).otherwise(0L))
            .as("n_hit"))
        .select(lit(l).as("n_lists"), lit(p).as("n_probe"), col("n_true"),
          col("n_hit"),
          when(col("n_true") > 0,
            round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
            .as("recall"))
    }
    rows.reduce(_ unionByName _)
  }

  /** [[semanticDedup]] SERVED from a materialized [[IvfIndex]] — the
    * build-once / serve-many split extended to the dedup family: the
    * corpus-sized per-row argmax (the expensive half of a SemDeDup pass)
    * comes from the stored assignment table instead of being recomputed,
    * so a re-run after a threshold change — the common tuning loop — pays
    * only the exact-collapse window and the within-cell pairs. Output is
    * IDENTICAL to [[semanticDedup]] over the same corpus because the index
    * build uses the search's exact argmax expression for every row,
    * degenerate vectors included ([[ivfIndex]]'s cellScores path is
    * bit-for-bit the direct form's degen assignment, and the broadcast-
    * join max_by it replaces carries the same (s, c) tie-break) —
    * q_semantic_dedup_served pins this against q_semantic_dedup's own
    * oracle through a parquet round-trip of the index. */
  def semanticDedupFromIndex(index: IvfIndex, corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val degenerate = col(embCol).isNull || size(col(embCol)) === 0 ||
      !exists(col(embCol), x => x =!= 0.0f)
    val reps = corpus.where(!degenerate)
      .groupBy(col(embCol)).agg(min(col(idCol)).as(idCol))
    val asgIn = reps.select(col(idCol), col(embCol))
      .unionByName(corpus.where(degenerate).select(col(idCol), col(embCol)))
      .join(index.assignments.select(col(idCol), col("cell")), Seq(idCol))
    semanticDropTail(asgIn, dp, threshold, idCol, embCol)
  }

  /** Per-vector symmetric int8 quantization — the storage-path operator for
    * an embedding store: at 100 TB of float32 vectors, absmax-int8 cuts the
    * bytes 4× (plus one float scale per vector) at ~0.1-1% cosine error,
    * which is why serving-side ANN indexes quantize by default.
    *
    * scale = max|x| / 127; q_i = round(x_i / scale) — |q_i| ≤ 127 by
    * construction (the max element maps to ±127 exactly), all-zero vectors
    * get scale 0 and all-zero codes (ANSI-safe guard, no division). Every
    * step is per-row, index-ordered, IEEE-pinned arithmetic: the codes, the
    * integer summaries, and the reconstruction error are bit-identical on
    * any engine — the DuckDB oracle re-derives them end-to-end.
    *
    * Output: (idCol, dim, scale, codes array<int>, q_sum, q_norm2,
    * recon_mse). Zero shuffle — this is a projection; the int summaries
    * (Σq, Σq² — exact integers) are the dedup/validation fingerprints a
    * quantized store keeps, recon_mse the quality gate. */
  /** Adds `__scale`, `codes`, `q_norm2` to `df` (all input columns kept) —
    * the shared quantization core of [[quantizeInt8]] and the quantized
    * serve paths. `__scale` is materialized first so the absmax fold runs
    * once per row, not once per code element. */
  private def withInt8Codes(df: DataFrame, embCol: String): DataFrame = {
    val emb = col(embCol)
    val absMax = aggregate(emb, lit(0.0), (a, v) => greatest(a, abs(v.cast("double"))))
    df.withColumn("__scale", absMax / 127.0)
      .withColumn("codes", transform(emb, x =>
        when(col("__scale") === 0.0, lit(0))
          .otherwise(round(x.cast("double") / col("__scale"), 0).cast("int"))))
      .withColumn("q_norm2",
        aggregate(col("codes"), lit(0L), (a, q) => a + q.cast("long") * q.cast("long")))
  }

  /** The scale-cancelled quantized cosine: integer dot over the codes,
    * one double division by the integer-norm product at the end, zero
    * norm → null (ANSI-safe), rounded 6 — ONE definition so the flat and
    * IVF-routed quantized serves can't drift. */
  private def qcosineOf(cCodes: Column, pCodes: Column,
      cN2: Column, pN2: Column): Column = {
    val intDot = aggregate(
      zip_with(cCodes, pCodes, (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val denom = sqrt(cN2.cast("double")) * sqrt(pN2.cast("double"))
    round(when(denom === 0.0, lit(null).cast("double"))
      .otherwise(intDot.cast("double") / denom), 6)
  }

  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val emb = col(embCol)
    val out = withInt8Codes(df, embCol)
      .withColumn("q_sum",
        aggregate(col("codes"), lit(0L), (a, q) => a + q.cast("long")))
      .withColumn("recon_mse", round(
        aggregate(zip_with(emb, col("codes"), (x, q) => {
          val d = x.cast("double") - q.cast("double") * col("__scale")
          d * d
        }), lit(0.0), (a, v) => a + v) / greatest(size(emb), lit(1)).cast("double"), 12))
    out.select(col(idCol), size(emb).as("dim"), round(col("__scale"), 9).as("scale"),
      col("codes"), col("q_sum"), col("q_norm2"), col("recon_mse"))
  }

  /** The SERVE half of the int8 story ([[quantizeInt8]] is the storage
    * half): top-k cosine over the codes alone. Symmetric absmax makes the
    * per-vector scales cancel — cos(a,b) ≈ Σqa·qb / (√Σqa²·√Σqb²) — so the
    * hot loop is an INTEGER dot over 4×-smaller rows (|q|≤127 ⇒ products
    * ≤16129, no overflow at any realistic dim), with one double division +
    * sqrt per candidate at the end. At 100 TB this is the difference
    * between scanning 4 bytes/component and 1: the quantized store IS the
    * scan, floats are only touched for `rerankDepth` candidates per probe.
    *
    * rerankDepth = 0 serves pure-quantized (score = qcosine, rounded 6).
    * rerankDepth > k widens the quantized pass to that depth, then
    * re-scores JUST those candidates with exact float cosine (a key-join
    * back to the float store — candidate-sized, not corpus-sized) and cuts
    * to k. The [[quantizedRecall]] gate measures what each mode loses.
    * Deterministic end-to-end: integer dots are exact, ties break on
    * corpus_id; the q_ann_recall_quant oracle replays both modes in SQL. */
  def quantizedTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      rerankDepth: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerankDepth == 0 || rerankDepth >= k,
      s"rerankDepth must be 0 (off) or >= k, got $rerankDepth < $k")
    val qc = quantizeInt8(corpus, idCol, embCol)
      .select(col(idCol).as("corpus_id"), col("codes").as("c_codes"),
        col("q_norm2").as("c_n2"))
    val qp = quantizeInt8(probes, idCol, embCol)
      .select(col(idCol).as("probe_id"), col("codes").as("p_codes"),
        col("q_norm2").as("p_n2"))
    val scored = qc.crossJoin(broadcast(qp))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("qcosine", qcosineOf(col("c_codes"), col("p_codes"),
        col("c_n2"), col("p_n2")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qcosine").desc_nulls_last, col("corpus_id").asc)
    val quant = scored.withColumn("rn", row_number().over(w))
    if (rerankDepth == 0) {
      quant.where(col("rn") <= k)
        .select(col("probe_id"), col("corpus_id"), col("qcosine"), col("rn"))
    } else exactRerank(corpus, probes,
      quant.where(col("rn") <= rerankDepth), k, idCol, embCol)
  }

  /** Candidate-sized exact re-rank shared by the quantized serves
    * ([[quantizedTopK]], [[pqTopK]]): join the approximate shortlist back
    * to the float store BY KEY (at scale: a point-lookup join, not a
    * corpus rescan), score exact float cosine, cut to k. */
  private def exactRerank(corpus: DataFrame, probes: DataFrame,
      shortlist: DataFrame, k: Int, idCol: String, embCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dp = dotFn(corpus.sparkSession)
    val cand = shortlist.select(col("probe_id"), col("corpus_id"))
    val cf = corpus.select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"),
      sqrt(dp(col(embCol), col(embCol))).as("__nc"))
    val pf = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
      sqrt(dp(col(embCol), col(embCol))).as("__np"))
    val exact = cand
      .join(cf, "corpus_id")
      .join(broadcast(pf), "probe_id")
      .withColumn("cosine", cosineFromNorms(dp,
        col("p_emb"), col("c_emb"), col("__np"), col("__nc")))
    val w2 = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc_nulls_last, col("corpus_id").asc)
    exact.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** IVF routing × int8 scoring — the two scale levers COMPOSED, which is
    * the production ANN shape at 100 TB: IVF cuts the candidates to
    * nProbe/nLists of the corpus ([[ivfTopK]]'s lever), int8 cuts the
    * bytes per scored candidate 4× ([[quantizedTopK]]'s lever). Cell
    * routing stays float (the centroid argmax runs at BUILD time on the
    * corpus side and only per-probe at serve; production stores cell +
    * codes, floats never reach the serve scan), within-cell scoring is
    * the scale-cancelled integer dot. Same deterministic contract as both
    * parents: bootstrap centroids, (s DESC, c DESC) cell tie-break,
    * qcosine ties on corpus_id; the q_ivf_topk_quant oracle replays
    * routing AND quantization end-to-end. The combined accuracy loss
    * (cell miss × quantization error) is measured by q_ann_recall_ivfq —
    * deploy on that number, not on the parents'. */
  def ivfQuantizedTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dp = dotFn(corpus.sparkSession)
    val centroids = centroidBootstrap(corpus, nLists, idCol, embCol)
    val cs = cellScores(centroids, dp) _
    val cb = withInt8Codes(corpus, embCol)
      .select(col(idCol).as("corpus_id"),
        array_max(cs(col(embCol))).getField("c").as("cell"),
        col("codes").as("c_codes"), col("q_norm2").as("c_n2"))
    val pb = withInt8Codes(probes, embCol)
      .select(col(idCol).as("probe_id"),
        slice(reverse(array_sort(cs(col(embCol)))), 1, nProbe).as("__cells"),
        col("codes").as("p_codes"), col("q_norm2").as("p_n2"))
      .withColumn("cell", explode(expr("transform(__cells, x -> x.c)")))
      .drop("__cells")
    val scored = pb.join(cb, Seq("cell"))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("qcosine", qcosineOf(col("c_codes"), col("p_codes"),
        col("c_n2"), col("p_n2")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qcosine").desc_nulls_last, col("corpus_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("qcosine"), col("rn"))
  }

  // ──────────────────────── product quantization ────────────────────────

  /** Deterministic PQ codebook bootstrap: the `nCodes` lowest-id complete
    * vectors, each cut into `nSub` equal-width sub-slices — codebook m is
    * their m-th slices (the [[centroidBootstrap]] convention applied per
    * subspace; a production build would Lloyd-refine each codebook on a
    * sample — the query shape and serve plan are identical, only the
    * literal values change). Returned as `[m][k] -> sub-centroid`. */
  private[graft] def pqCodebooks(
      corpus: DataFrame, nSub: Int, nCodes: Int,
      idCol: String, embCol: String): Array[Array[Array[Double]]] = {
    // cast to array<double> in-plan so float AND double embedding
    // columns collect uniformly (the withInt8Codes isFloat lesson — a
    // bare getSeq[Float] ClassCastExceptions on array<double> corpora)
    val base = corpus
      .where(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol), col(embCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(nCodes)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(base.nonEmpty, "corpus must be non-empty")
    val dim = base(0).length
    require(base.forall(_.length == dim),
      s"PQ bootstrap vectors must share one dim, got ${base.map(_.length).distinct.mkString(",")}")
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val w = dim / nSub
    Array.tabulate(nSub)(m => base.map(v => v.slice(m * w, (m + 1) * w)))
  }

  /** Per-subspace PQ assignment expression — min-L2 via the monotone
    * identity argmin_k ‖x_m − c‖² = argmax_k (x_m·c − ‖c‖²/2), ties →
    * higher code id (array_max struct order). ONE definition shared by the
    * encode ([[withPqCodes]]) and the codebook refinement
    * ([[refinedPqCodebooks]]) so their assignments cannot drift. Native
    * `graft_pq_assign` (one tight scan in WSCG) when registered; the
    * portable argmax-over-structs form otherwise — identical outputs
    * (FallbackSpec). */
  private def pqAssignCol(emb: Column, books: Array[Array[Array[Double]]],
      m: Int, dp: (Column, Column) => Column, native: Boolean): Column = {
    val w = books(0)(0).length
    if (native)
      call_function("graft_pq_assign", emb,
        typedLit(books(m).map(_.toSeq).toSeq), lit(m * w), lit(w))
    else array_max(array(books(m).zipWithIndex.map { case (c, k) =>
      val n2 = c.map(x => x * x).sum
      struct((dp(slice(emb, m * w + 1, w), lit(c)) - lit(n2 / 2.0)).as("s"),
        lit(k).as("c"))
    }.toIndexedSeq: _*)).getField("c")
  }

  /** Lloyd-refined PQ codebooks — the per-subspace analogue of
    * [[refinedCentroids]], closing the "retrain re-picks the bootstrap"
    * soft spot: start from the [[pqCodebooks]] bootstrap, then for `iters`
    * rounds assign every complete vector's m-th slice to its nearest
    * sub-centroid (the exact [[pqAssignCol]] serve expression) and replace
    * each (m, code) sub-centroid with its member mean. One distributed
    * pass per round covers ALL subspaces at once (posexplode of the nSub
    * (code, slice) structs → one hash aggregate keyed on m·|books|+code,
    * partial aggregation collapses each partition to ≤ nSub·nCodes
    * vectors before the shuffle); only the ≤ nSub·nCodes×w mean matrix
    * crosses the driver between rounds.
    *
    * Cross-engine determinism: the [[refinedCentroids]] contract — mean
    * components rounded to 6 decimals (HALF_UP) before becoming literals,
    * a margin ≫ summation-order drift, so an oracle unrolling the same
    * rounds derives bit-identical codebooks; codes that lose every member
    * keep their previous sub-centroid. */
  private[graft] def refinedPqCodebooks(
      corpus: DataFrame, nSub: Int, nCodes: Int, iters: Int,
      idCol: String, embCol: String): Array[Array[Array[Double]]] = {
    var books = pqCodebooks(corpus, nSub, nCodes, idCol, embCol)
    if (iters <= 0) return books
    val spark = corpus.sparkSession
    val dp = dotFn(spark)
    val native = spark.catalog.functionExists("graft_pq_assign")
    val w = books(0)(0).length
    val dim = nSub * w
    val nB = books(0).length
    // iterative over a re-read input: cache for the refinement (the
    // refinedCentroids pattern; MEMORY_AND_DISK spills rather than OOMs)
    val clean = corpus
      .where(col(embCol).isNotNull && size(col(embCol)) === dim)
      .select(col(embCol).cast("array<double>").as("__emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    try for (_ <- 1 to iters) {
      val emb = col("__emb")
      val subs = array((0 until nSub).map { m =>
        struct(pqAssignCol(emb, books, m, dp, native).as("code"),
          slice(emb, m * w + 1, w).as("sub"))
      }: _*)
      val assigned = clean.select(posexplode(subs))
        .select((col("pos") * nB + col("col.code")).as("cell"),
          col("col.sub").as("emb"))
      val means = vecSummed(spark, assigned).collect().map { r =>
        val n = r.getAs[Long]("n_members").toDouble
        r.getInt(r.fieldIndex("cell")) ->
          r.getSeq[Double](r.fieldIndex("vsum")).map(v => round6(v / n)).toArray
      }.toMap
      books = Array.tabulate(nSub)(m => Array.tabulate(nB)(k =>
        means.getOrElse(m * nB + k, books(m)(k))))
    } finally clean.unpersist()
    books
  }

  /** Adds `codes` (array<int>: one codebook id per subspace) and
    * `recon_n2` (‖reconstruction‖² = Σ_m ‖book_m[code_m]‖², m-ordered sum)
    * against driver-literal codebooks. Per-subspace assignment is min-L2
    * via the monotone identity argmin_k ‖x_m − c‖² = argmax_k (x_m·c −
    * ‖c‖²/2), computed as EXACTLY that expression on both engines so fp
    * rounding can't split them; ties → higher code id (array_max struct
    * order — the IVF cell convention). Null / off-dim vectors get null
    * codes and null recon_n2, which rank last at serve. */
  private def withPqCodes(df: DataFrame, embCol: String,
      books: Array[Array[Array[Double]]],
      dp: (Column, Column) => Column): DataFrame = {
    val nSub = books.length
    val w = books(0)(0).length
    val dim = nSub * w
    val emb = col(embCol)
    val ok = emb.isNotNull && size(emb) === dim
    // native argmin loop when registered (K=256 as one tight scan inside
    // WSCG); else the portable array_max-over-structs form — identical
    // outputs (FallbackSpec), but the HOF form's generated projection
    // outgrows Janino's method limit past a few dozen codes
    val native = df.sparkSession.catalog.functionExists("graft_pq_assign")
    def codeCol(m: Int): Column = pqAssignCol(emb, books, m, dp, native)
    // Each __pqc<m> lands as its OWN column and is referenced ≥2× below
    // (codes + recon_n2, and the serve's ADC lookups) — multiple references
    // to a non-cheap expression stop CollapseProject from re-inlining the
    // 16-struct argmax into every consumer (the lshTopK/textStats lesson:
    // inlining both recomputes it per reference and bloats the fused
    // window-sort codegen past Janino's method limit).
    val withRaw = (0 until nSub).foldLeft(df) { (d, m) =>
      d.withColumn(s"__pqc$m", when(ok, codeCol(m)))
    }
    // m-ordered left-associated sum — matches the oracle's ordered fold
    val n2Sum = (0 until nSub).map { m =>
      element_at(lit(books(m).map(c => c.map(x => x * x).sum)),
        col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    withRaw
      .withColumn("codes", when(ok, array((0 until nSub).map(m => col(s"__pqc$m")): _*)))
      .withColumn("recon_n2", when(ok, n2Sum))
  }

  /** ADC lookup tables for one vector — `lut[m][k] = x_m · book_m[k]` as a
    * nested-array column. Native single-scan expression when registered;
    * portable nested slice-dot arrays otherwise (identical outputs —
    * FallbackSpec; the HOF form outgrows Janino codegen past a few dozen
    * codes, same story as the assignment). */
  private def pqLutCol(emb: Column, books: Array[Array[Array[Double]]],
      dp: (Column, Column) => Column, native: Boolean): Column = {
    val w = books(0)(0).length
    if (native)
      call_function("graft_pq_lut", emb,
        typedLit(books.map(_.map(_.toSeq).toSeq).toSeq), lit(w))
    else array(books.indices.map { m =>
      array(books(m).map(c =>
        dp(slice(emb, m * w + 1, w), lit(c))).toIndexedSeq: _*)
    }: _*)
  }

  /** STORAGE half of product quantization: each vector becomes `nSub`
    * small-int codes (one byte each at nCodes ≤ 256) + one double — at
    * dim 64 / nSub 8 that is 32× fewer bytes than float32, the compression
    * that makes a 100 TB embedding store scannable. Output: (idCol, dim,
    * codes, recon_n2, recon_mse) — recon_mse is the per-vector quality
    * gate (mean squared reconstruction error, 12-dp, index-ordered). */
  def pqEncode(
      corpus: DataFrame,
      nSub: Int = 8,
      nCodes: Int = 16,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val books = pqCodebooks(corpus, nSub, nCodes, idCol, embCol)
    val emb = col(embCol)
    val native = corpus.sparkSession.catalog.functionExists("graft_pq_lut")
    // recon error via ‖x‖² − 2·Σ_m x_m·c_m + ‖recon‖² (all three already
    // index-ordered folds; avoids materializing the reconstruction).
    // x_m·c_m looks up the row's OWN lut — hoisted into a column so the
    // table is computed once, not once per subspace reference — at its
    // chosen code; the same table shape the serve builds per probe.
    val xDot = (0 until nSub).map { m =>
      element_at(element_at(col("__xlut"), m + 1), col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    withPqCodes(corpus, embCol, books, dp)
      .withColumn("__xlut", pqLutCol(emb, books, dp, native))
      .withColumn("recon_mse",
        when(col("codes").isNotNull, round(
          (dp(emb, emb) - lit(2.0) * xDot + col("recon_n2"))
            / greatest(size(emb), lit(1)).cast("double"), 12)))
      .select(col(idCol), size(emb).as("dim"), col("codes"),
        round(col("recon_n2"), 9).as("recon_n2"), col("recon_mse"))
  }

  /** SERVE half: PQ-ADC (asymmetric distance computation) top-k. The probe
    * stays float and precomputes one lookup table per subspace —
    * lut[m][k] = probe_m · book_m[k], nSub·nCodes dots per PROBE — then
    * every corpus candidate is scored from its codes alone:
    * adc_dot = Σ_m lut[m][code_m], i.e. nSub array lookups + adds per
    * candidate, NO per-candidate float dot. Cosine approximation:
    * adc_dot / (‖p‖ · √recon_n2). At 100 TB the serve scan touches only
    * the code store (nSub bytes + one double per vector); floats are
    * touched per probe (the LUT build) and — with `rerankDepth` > 0 — for
    * the shortlist's exact re-rank, a key-join not a rescan.
    *
    * Deterministic end-to-end: codebooks are lowest-id bootstrap slices,
    * assignment/LUT arithmetic is index-ordered, ties break on corpus_id;
    * the q_ann_topk_pq oracle replays codebooks, codes, LUTs, and the
    * fold in SQL. Accuracy is measured, not assumed — q_ann_recall_pq
    * sweeps the codebook-size knob: mean recall@5 at sf0.01 is
    * 0.22 / 0.30 / 0.64 at nCodes 16 / 64 / 256, and shortlist(20) +
    * exact rerank lifts the 16-code serve to 0.52. nCodes is the lever on
    * this corpus: a design-time probe measured per-subspace Lloyd
    * refinement NOT to close the gap (16 codes: 0.22 → 0.30 after 2
    * rounds; 64 codes: 0.30 → 0.34) — the same no-cluster-structure
    * finding as the SemDeDup gate. Deploy PQ on the swept number at YOUR
    * nCodes, and expect the rerank stage to carry exactness. */
  def pqTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nSub: Int = 8,
      nCodes: Int = 16,
      rerankDepth: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerankDepth == 0 || rerankDepth >= k,
      s"rerankDepth must be 0 (off) or >= k, got $rerankDepth < $k")
    val dp = dotFn(corpus.sparkSession)
    val books = pqCodebooks(corpus, nSub, nCodes, idCol, embCol)
    val cb = withPqCodes(corpus, embCol, books, dp)
      .select(col(idCol).as("corpus_id") +: col("recon_n2") +:
        (0 until nSub).map(m => col(s"__pqc$m")): _*)
    val native = corpus.sparkSession.catalog.functionExists("graft_pq_lut")
    val pb = probes.select(col(idCol).as("probe_id"),
      sqrt(dp(col(embCol), col(embCol))).as("__np"),
      pqLutCol(col(embCol), books, dp, native).as("__lut"))
    // m-ordered left-associated adds — matches the oracle's ordered fold;
    // per-candidate work is nSub array lookups, no float dot
    val adcDot = (0 until nSub).map { m =>
      element_at(element_at(col("__lut"), m + 1), col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    val denom = col("__np") * sqrt(col("recon_n2"))
    val scored = cb.crossJoin(broadcast(pb))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("adc_cosine",
        round(when(col("recon_n2").isNull || denom === 0.0,
          lit(null).cast("double")).otherwise(adcDot / denom), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_cosine").desc_nulls_last, col("corpus_id").asc)
    val approx = scored.withColumn("rn", row_number().over(w))
    if (rerankDepth == 0) {
      approx.where(col("rn") <= k)
        .select(col("probe_id"), col("corpus_id"), col("adc_cosine"), col("rn"))
    } else exactRerank(corpus, probes,
      approx.where(col("rn") <= rerankDepth), k, idCol, embCol)
  }

  /** IVF routing × PQ scoring — the FAISS-style IVF-PQ composition, the
    * production ANN shape when even int8 rows are too fat: IVF cuts the
    * candidates to ~nProbe/nLists of the corpus, PQ cuts the bytes per
    * scored candidate to nSub codes + one double (32× at dim 64 / nSub 8).
    * Cell routing stays float (build-time on the corpus side, per-probe at
    * serve); within-cell scoring is pure ADC lookups. Same deterministic
    * contract as both parents; the q_ivf_topk_pq oracle replays routing
    * AND the PQ pipeline. The combined accuracy (cell miss × quantization)
    * is measured by q_ann_recall_ivfpq — deploy on that number. Measured
    * at sf0.01, (nLists 16, nProbe 4) × (8×16 codes): recall@5 0.30 vs
    * flat ADC's 0.22 — routing can score ABOVE the flat PQ serve because
    * the cell gate prunes ADC false positives that would otherwise
    * outrank true neighbors; the interaction cuts both ways, which is
    * exactly why the composed gate, not the parents', is the deploy
    * number. */
  def ivfPqTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      nSub: Int = 8,
      nCodes: Int = 16,
      rerankDepth: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerankDepth == 0 || rerankDepth >= k,
      s"rerankDepth must be 0 (off) or >= k, got $rerankDepth < $k")
    val dp = dotFn(corpus.sparkSession)
    val centroids = centroidBootstrap(corpus, nLists, idCol, embCol)
    val cs = cellScores(centroids, dp) _
    val books = pqCodebooks(corpus, nSub, nCodes, idCol, embCol)
    val native = corpus.sparkSession.catalog.functionExists("graft_pq_lut")
    val cb = withPqCodes(corpus, embCol, books, dp)
      .select(col(idCol).as("corpus_id") +:
        array_max(cs(col(embCol))).getField("c").as("cell") +:
        col("recon_n2") +: (0 until nSub).map(m => col(s"__pqc$m")): _*)
    val pb = probes.select(col(idCol).as("probe_id"),
        slice(reverse(array_sort(cs(col(embCol)))), 1, nProbe).as("__cells"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"),
        pqLutCol(col(embCol), books, dp, native).as("__lut"))
      .withColumn("cell", explode(expr("transform(__cells, x -> x.c)")))
      .drop("__cells")
    val adcDot = (0 until nSub).map { m =>
      element_at(element_at(col("__lut"), m + 1), col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    val denom = col("__np") * sqrt(col("recon_n2"))
    val scored = pb.join(cb, Seq("cell"))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("adc_cosine",
        round(when(col("recon_n2").isNull || denom === 0.0,
          lit(null).cast("double")).otherwise(adcDot / denom), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_cosine").desc_nulls_last, col("corpus_id").asc)
    val approx = scored.withColumn("rn", row_number().over(w))
    if (rerankDepth == 0) {
      approx.where(col("rn") <= k)
        .select(col("probe_id"), col("corpus_id"), col("adc_cosine"), col("rn"))
    } else exactRerank(corpus, probes,
      approx.where(col("rn") <= rerankDepth), k, idCol, embCol)
  }

  /** RESIDUAL IVF-PQ — the production FAISS `IVFPQ` encoding, one rung
    * past [[ivfPqTopK]]: instead of quantizing raw vectors, each corpus
    * vector is encoded as its RESIDUAL r = x − μ(cell) against its IVF
    * centroid, with codebooks trained on residuals (the nCodes lowest-id
    * rows' residuals — the bootstrap convention). Why it wins: PQ error
    * scales with the norm of what's quantized, and residual norms are a
    * fraction of raw norms once vectors cluster — the same code budget
    * spends its resolution on the within-cell detail instead of
    * re-encoding the cell mean every row — IF the centroids are true
    * cell means and the corpus clusters tightly. MEASURED on this corpus
    * (50 probes, sf0.01, identical (16, 4, 8×nCodes) budgets): with
    * BOOTSTRAP centroids residual is a LOSS — 0.208 vs raw 0.224 at 16
    * codes, 0.432 vs 0.504 at 256 — because μ is a random member
    * vector, not a mean, so subtracting it ADDS noise; with 2 Lloyd
    * rounds (`refineIters = 2`) residual reaches parity-to-slightly-
    * better (0.256 / 0.516). The third independent probe (after the
    * SemDeDup Lloyd gate and the per-subspace PQ Lloyd probe) confirming
    * this corpus has no tight cluster structure for residuals to
    * exploit. Deploy decision: measure q_ann_recall_ivfpqres against
    * q_ann_recall_ivfpq on YOUR corpus; adopt residual only when its row
    * wins — the serve bytes are identical either way (codes + one double
    * per row), so the gate is pure accuracy.
    *
    * Serve algebra (the reason no residual is ever materialized at
    * serve): x ≈ μ + recon(r), so q·x ≈ q·μ + Σ_m lut[m][code_m] — the
    * q·μ term is exactly the cell-routing score the probe already
    * computed (the argmax struct's `s`), and the LUT is the standard
    * per-probe table over the residual codebooks. ‖x‖² ≈ ‖μ‖² +
    * 2·Σ_m μ_m·book_m[code_m] + Σ_m ‖book_m[code_m]‖², all three terms
    * driver-literal or code-indexed lookups, folded m-ordered and stored
    * as one double per row at encode (recon_n2's contract). Per scored
    * candidate the work is still nSub lookups + adds. Deterministic
    * end-to-end: bootstrap centroids and residual codebooks, index-
    * ordered arithmetic, ties → higher code / lower corpus_id; the
    * q_ivf_topk_pqres oracle replays centroids, cells, residuals,
    * codebooks, codes, LUTs, and all three norm terms in SQL. */
  def ivfPqResidualTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      nSub: Int = 8,
      nCodes: Int = 16,
      refineIters: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dp = dotFn(corpus.sparkSession)
    val centroids =
      if (refineIters > 0) refinedCentroids(corpus, nLists, refineIters, idCol, embCol)
      else centroidBootstrap(corpus, nLists, idCol, embCol)
    val cs = cellScores(centroids, dp) _
    val dim = centroids(0)._2.length
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val w0 = dim / nSub
    val byCell = centroids.sortBy(_._1).map(_._2)
    val centArr = typedLit(byCell.map(_.toSeq).toSeq)
    // residual via the engine's own zip_with — the SAME expression the
    // bootstrap job below and the corpus encode share, so codebook
    // arithmetic can never drift from encode arithmetic
    def resCol(emb: Column, cell: Column): Column =
      zip_with(emb.cast("array<double>"), element_at(centArr, cell + 1),
        (a, b) => a - b)
    // codebook bootstrap SKIPS the first nLists rows: those rows ARE the
    // centroids, so their residuals are identically zero — seeding the
    // books with them collapses recon(r) to 0 and the serve to
    // cell-routing alone (measured: recall@5 0.16 vs 0.52 with the
    // offset). Rows nLists..nLists+nCodes-1 carry genuine residuals and
    // stay fully deterministic (the oracle replays LIMIT/OFFSET).
    val bootstrap = corpus
      .where(col(embCol).isNotNull && size(col(embCol)) === dim)
      .select(col(idCol),
        resCol(col(embCol), array_max(cs(col(embCol))).getField("c")).as("remb"))
      .orderBy(col(idCol)).offset(nLists).limit(nCodes)
      .collect().map(_.getSeq[Double](1).toArray)
    require(bootstrap.nonEmpty, "corpus must be non-empty")
    val books = Array.tabulate(nSub)(m => bootstrap.map(v => v.slice(m * w0, (m + 1) * w0)))
    // driver-literal norm tables (index-ordered loops — the dotSql fold)
    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val muN2 = byCell.map(mu => dotArr(mu, mu)).toSeq
    val muDot: Seq[Seq[Seq[Double]]] = byCell.toSeq.map(mu =>
      (0 until nSub).map(m =>
        books(m).map(c => dotArr(mu.slice(m * w0, (m + 1) * w0), c)).toSeq))
    val ok = col(embCol).isNotNull && size(col(embCol)) === dim
    val asg = corpus.select(col(idCol), col(embCol),
        array_max(cs(col(embCol))).getField("c").as("cell"))
      .withColumn("__res", when(ok, resCol(col(embCol), col("cell"))))
    val coded = withPqCodes(asg, "__res", books, dp)
    // ‖μ + recon(r)‖² = ‖μ‖² + 2·Σ_m μ_m·book_m[code_m] + Σ_m ‖book‖² —
    // A + 2·B + C with each sum folded m-ordered (C is withPqCodes'
    // residual recon_n2); the oracle writes the same association
    val muB = (0 until nSub).map { m =>
      element_at(element_at(element_at(typedLit(muDot), col("cell") + 1),
        m + 1), col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    val cb = coded
      .withColumn("recon_full_n2", when(col("codes").isNotNull,
        element_at(typedLit(muN2), col("cell") + 1) + lit(2.0) * muB + col("recon_n2")))
      .select(col(idCol).as("corpus_id") +: col("cell") +:
        col("recon_full_n2") +: (0 until nSub).map(m => col(s"__pqc$m")): _*)
    val native = corpus.sparkSession.catalog.functionExists("graft_pq_lut")
    val pb = probes.select(col(idCol).as("probe_id"),
        sqrt(dp(col(embCol), col(embCol))).as("__np"),
        pqLutCol(col(embCol), books, dp, native).as("__lut"),
        slice(reverse(array_sort(cs(col(embCol)))), 1, nProbe).as("__cells"))
      .withColumn("__pc", explode(col("__cells")))
      .select(col("probe_id"), col("__np"), col("__lut"),
        col("__pc").getField("c").as("cell"), col("__pc").getField("s").as("__qmu"))
    // q·x ≈ q·μ + Σ_m lut[m][code_m]: the routing score rides along free
    val adcDot = col("__qmu") + (0 until nSub).map { m =>
      element_at(element_at(col("__lut"), m + 1), col(s"__pqc$m") + 1)
    }.reduce(_ + _)
    val denom = col("__np") * sqrt(col("recon_full_n2"))
    val scored = pb.join(cb, Seq("cell"))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("adc_cosine",
        round(when(col("recon_full_n2").isNull || denom === 0.0,
          lit(null).cast("double")).otherwise(adcDot / denom), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_cosine").desc_nulls_last, col("corpus_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("adc_cosine"), col("rn"))
  }

  /** A materialized PQ index: `codebooks` (m, k, centroid array<double>)
    * and `codes` (idCol, codes array<int>, recon_n2) — both plain parquet
    * tables. The build-once / serve-many split of the PQ story: encoding
    * (nSub argmin scans per corpus row — the expensive half) runs once per
    * snapshot; the serve scan touches ONLY the codes table (nSub ints +
    * one double per vector), floats never reach it. */
  final case class PqIndex(codebooks: DataFrame, codes: DataFrame)

  /** BUILD the PQ index: bootstrap the codebooks, encode every corpus
    * vector with exactly the expressions the in-plan serve uses — so
    * [[pqTopKFromIndex]] is provably the [[pqTopK]] search against stored
    * codes (q_ann_topk_pq_served pins this through a parquet round-trip
    * against q_ann_topk_pq's OWN oracle). */
  def pqIndex(
      corpus: DataFrame,
      nSub: Int = 8,
      nCodes: Int = 16,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): PqIndex = {
    val bookDf = pqCodebookTable(corpus, nSub, nCodes, idCol, embCol)
    PqIndex(bookDf, pqEncodeAgainst(corpus, bookDf, idCol, embCol))
  }

  /** The (m, k, centroid) codebook TABLE alone — the build-once artifact
    * the incremental/streamed PQ build fixes before any shard encodes
    * ([[graft.streaming.OnlineRefresh.buildPqIndexStream]]'s analogue of
    * the IVF centroid table). Bootstrapped from the `nCodes` lowest-id
    * vectors, same as [[pqIndex]] (which now delegates here);
    * `refineIters` > 0 Lloyd-refines each codebook per subspace
    * ([[refinedPqCodebooks]]) — the production re-train path. */
  def pqCodebookTable(
      corpus: DataFrame,
      nSub: Int = 8,
      nCodes: Int = 16,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      refineIters: Int = 0
  ): DataFrame = {
    val spark = corpus.sparkSession
    val books =
      if (refineIters > 0)
        refinedPqCodebooks(corpus, nSub, nCodes, refineIters, idCol, embCol)
      else pqCodebooks(corpus, nSub, nCodes, idCol, embCol)
    spark.createDataFrame(
      for ((bm, m) <- books.zipWithIndex.toIndexedSeq; (c, k) <- bm.zipWithIndex)
        yield (m, k, c.toIndexedSeq)).toDF("m", "k", "centroid")
  }

  /** Encode a corpus shard against an EXISTING codebook table — the
    * per-shard / incremental half of the PQ build (the [[ivfAssign]]
    * shape): codebooks are fixed once, every shard encodes independently,
    * and per-row codes have no cross-row terms ⇒ shard unions ≡ the
    * monolithic encode (spec-pinned). Retraction is the same per-row
    * algebra as [[ivfRetract]]: dropping ids' rows IS encode(W ∖ D). */
  def pqEncodeAgainst(
      corpus: DataFrame,
      codebooks: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    withPqCodes(corpus, embCol, collectPqCodebooks(codebooks), dp)
      .select(col(idCol), col("codes"), col("recon_n2"))
  }

  /** Collect a (m, k, centroid) codebook table back into the bounded
    * literal nesting the encode/serve expressions fold in — ≤ nSub·nCodes
    * rows by construction (the collectCentroids hop). */
  private def collectPqCodebooks(codebooks: DataFrame): Array[Array[Array[Double]]] =
    codebooks.select(col("m"), col("k"), col("centroid").cast("array<double>")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))

  /** Flat PQ-ADC top-k against LLOYD-REFINED codebooks — [[pqTopKFromIndex]]
    * with the [[refinedPqCodebooks]] literals instead of the bootstrap
    * slices: the serve plan is identical (stored codes + probe LUTs),
    * only the codebook values differ — the same bootstrap-vs-refined
    * relationship as [[ivfTopK]]/[[ivfRefinedTopK]]. */
  def pqRefinedTopK(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nSub: Int = 8,
      nCodes: Int = 16,
      iters: Int = 1,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val bookDf = pqCodebookTable(corpus, nSub, nCodes, idCol, embCol, iters)
    pqTopKFromIndex(
      PqIndex(bookDf, pqEncodeAgainst(corpus, bookDf, idCol, embCol)),
      probes, k, idCol, embCol)
  }

  /** DRIFT MONITOR for the incremental PQ artifact — the codebook twin of
    * [[ivfDriftStats]], closing the "when do I re-train the codebooks"
    * loop the r13 verdict named as PQ's lagging lifecycle cell: per
    * arrival epoch (`batchCol` on the codes table — the `batch=<id>`
    * partitions the streamed builder lands), the distribution of each
    * vector's RECONSTRUCTION ERROR against the fixed codebooks (the
    * [[pqEncode]] recon_mse expression re-derived from the stored codes —
    * codebooks are frozen at bootstrap, so if newly-landed epochs
    * systematically reconstruct worse (mean_mse climbing, p90_mse
    * spiking vs the bootstrap epochs), the embedding distribution has
    * drifted off the codebooks and they need re-training; flat curves
    * mean incremental encodes are safe to keep appending.
    *
    * Scale shape: one join of the codes table with its corpus embeddings
    * (both keyed on id) plus the ≤ nSub·nCodes codebook literals; output
    * is one row per epoch. Cross-engine determinism: per-row mse is the
    * 12-dp [[pqEncode]] expression (index-ordered folds), the mean is
    * micro-unit integer quantized, p90 is `percentile`'s linear
    * interpolation. Null-code rows (null/off-dim vectors) carry a null
    * mse — counted in `n`, excluded from the stats.
    * Output: (batchCol, n, n_scored, mean_mse, p90_mse). */
  def pqDriftStats(
      index: PqIndex,
      corpus: DataFrame,
      batchCol: String = "batch",
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    val dp = dotFn(corpus.sparkSession)
    val books = collectPqCodebooks(index.codebooks)
    val nSub = books.length
    val native = corpus.sparkSession.catalog.functionExists("graft_pq_lut")
    val emb = col(embCol)
    val joined = index.codes
      .select(col(batchCol), col(idCol), col("codes"), col("recon_n2"))
      .join(corpus.select(col(idCol), emb), Seq(idCol))
      .withColumn("__xlut", pqLutCol(emb, books, dp, native))
    val xDot = (0 until nSub).map { m =>
      element_at(element_at(col("__xlut"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    val scored = joined.withColumn("__mse",
      when(col("codes").isNotNull, round(
        (dp(emb, emb) - lit(2.0) * xDot + col("recon_n2"))
          / greatest(size(emb), lit(1)).cast("double"), 12)))
    scored.groupBy(col(batchCol))
      .agg(count(lit(1)).as("n"),
        count(col("__mse")).as("n_scored"),
        when(count(col("__mse")) > 0,
          round(sum(round(col("__mse") * 1e6, 0).cast("long")).cast("double")
            / count(col("__mse")).cast("double") / 1e6, 4)).as("mean_mse"),
        round(expr("percentile(__mse, 0.9)"), 6).as("p90_mse"))
  }

  /** SERVE PQ-ADC top-k from a materialized [[PqIndex]]: the codebooks
    * collect back into probe-side LUT literals, and the corpus side is
    * the stored codes table alone — per candidate the serve reads nSub
    * small ints + one double and does nSub array lookups. This is the
    * pure-artifact serve (the 32× story); exactness needs the float
    * rerank, which is [[pqTopK]]'s `rerankDepth` against the live corpus. */
  def pqTopKFromIndex(
      index: PqIndex,
      probes: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dp = dotFn(probes.sparkSession)
    val books = collectPqCodebooks(index.codebooks)
    val nSub = books.length
    val native = probes.sparkSession.catalog.functionExists("graft_pq_lut")
    val cb = index.codes.select(col(idCol).as("corpus_id"), col("codes"),
      col("recon_n2"))
    val pb = probes.select(col(idCol).as("probe_id"),
      sqrt(dp(col(embCol), col(embCol))).as("__np"),
      pqLutCol(col(embCol), books, dp, native).as("__lut"))
    // the stored codes are ATTRIBUTES here, so element_at lookups stay
    // cheap codegen — no argmax ever re-runs at serve
    val adcDot = (0 until nSub).map { m =>
      element_at(element_at(col("__lut"), m + 1),
        element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    val denom = col("__np") * sqrt(col("recon_n2"))
    val scored = cb.crossJoin(broadcast(pb))
      .where(col("probe_id") =!= col("corpus_id"))
      .withColumn("adc_cosine",
        round(when(col("recon_n2").isNull || denom === 0.0,
          lit(null).cast("double")).otherwise(adcDot / denom), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_cosine").desc_nulls_last, col("corpus_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col("corpus_id"), col("adc_cosine"), col("rn"))
  }

  /** Per-vector stats (norm, mean component) — cheap sanity surface. */
  def embeddingStats(df: DataFrame, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dp = dotFn(df.sparkSession)
    df.select(
      col(idCol),
      size(col(embCol)).as("dim"),
      round(sqrt(dp(col(embCol), col(embCol))), 6).as("l2_norm"),
      round(aggregate(col(embCol), lit(0.0), (a, v) => a + v.cast("double"))
        / greatest(size(col(embCol)), lit(1)), 6).as("mean_val")
    )
  }
}
