package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.fs.OnlineStore

/** Structured-Streaming maintenance of the online store.
  *
  * The reference refreshes its Redis online store with an hourly batch DAG
  * (airflow/dags/online_dag.py:25-30 → redis_data.py:44-94). Streaming-native
  * restatement: a file-source stream over the landed feature parquet,
  * `foreachBatch` upserting each micro-batch into the latest-per-key snapshot
  * — the same `writeOnline` code path as batch, so semantics can't drift.
  */
object OnlineRefresh {

  /** Start a stream that maintains `snapshotPath` as the latest-per-key view
    * of feature rows arriving under `inputPath`. */
  def start(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      snapshotPath: String,
      checkpoint: String,
      keys: Seq[String],
      tsCol: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputPath)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // All FS checks go through the snapshot path's OWN FileSystem — a
        // java.io.File check would be always-false on HDFS/S3/GCS and each
        // micro-batch would silently rebuild the store from just that batch.
        val conf = spark.sparkContext.hadoopConfiguration
        val dst = new org.apache.hadoop.fs.Path(snapshotPath)
        val fs = dst.getFileSystem(conf)
        val oldP = new org.apache.hadoop.fs.Path(snapshotPath + "_old")
        // Hadoop rename/delete report failure via `false`, not exceptions —
        // ignoring them could drop the only snapshot copy and still commit
        // the batch. Throwing makes the streaming engine retry the batch.
        def must(ok: Boolean, what: String): Unit =
          if (!ok) throw new java.io.IOException(s"snapshot swap failed: $what")
        // Recover from a crash mid-swap: dst gone but the set-aside copy
        // left. A failed recovery rename MUST abort too — continuing would
        // rebuild the store from just this batch, dropping all other keys.
        if (!fs.exists(dst) && fs.exists(oldP))
          must(fs.rename(oldP, dst), s"recovery rename $oldP -> $dst")
        val current =
          if (fs.exists(dst)) spark.read.parquet(snapshotPath)
          else batch.limit(0)
        val next = OnlineStore.writeOnline(current, batch, keys, tsCol)
        // Crash-safe swap: write tmp, move old aside, move tmp in, drop old.
        // A crash between the renames leaves either dst or dst_old intact —
        // never zero copies (plain delete+rename had that window).
        val tmp = new org.apache.hadoop.fs.Path(snapshotPath + "_tmp")
        next.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(oldP, true)
        if (fs.exists(dst)) must(fs.rename(dst, oldP), s"rename $dst -> $oldP")
        must(fs.rename(tmp, dst), s"rename $tmp -> $dst")
        fs.delete(oldP, true)
        ()
      }
      .start()
  }

  /** Watermarked hourly aggregate over an event-time stream — the streaming
    * twin of the offline calendar aggregation (late data bounded by the
    * watermark; state store holds only open windows).
    *
    * `avg_value` is the EXACT integer-cents 4-dp half-up average
    * ([[graft.fs.Expressions.exactAvg4]]), not `avg(double)`: streaming
    * state merges partial sums in yet another order than batch partitions
    * do, and a double average is accumulation-order-sensitive exactly at
    * the rounding boundary — the bug class the r7 sf0.1 audit caught. The
    * registered q_stream_hourly and the batch q_hourly_window both CALL
    * this function, so the public API and the oracled queries are one
    * definition that cannot drift. Assumes `valueCol` is a 2-dp quantity
    * (currency/sensor readings), the contract of the exact-cents trick;
    * `withWatermark` is a no-op on batch frames, so the same code serves
    * both execution modes. */
  def hourlyAggregate(stream: DataFrame, tsCol: String, keyCol: String, valueCol: String): DataFrame =
    stream
      .withWatermark(tsCol, "2 hours")
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum((col(valueCol) * 100).cast("decimal(18,0)")).cast("long").as("__cents"))
      .select(col("window"), col(keyCol),
        graft.fs.Expressions.exactAvg4(col("__cents"), col("n")).as("avg_value"), col("n"))

  /** Sliding event-time windows (width 1 h, slide 15 min by default): the
    * overlapping-window shape [[hourlyAggregate]]'s tumbling windows can't
    * express — each event lands in width/slide windows, the moving-average
    * view dashboards and drift monitors read. Same exact-cents integer
    * average (order-free, stream≡batch by construction) and the same
    * one-definition contract: the batch q_sliding_window and streaming
    * q_stream_sliding both call THIS function under one oracle. */
  def slidingAggregate(stream: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, "2 hours")
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum((col(valueCol) * 100).cast("decimal(18,0)")).cast("long").as("__cents"))
      .select(col("window"), col(keyCol),
        graft.fs.Expressions.exactAvg4(col("__cents"), col("n")).as("avg_value"), col("n"))

  /** Streaming exact dedup — the streaming twin of `Dedup.exact`: drop
    * rows whose `idCols` were already seen, with state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark` expires dedup
    * state once the watermark passes it — unbounded-state-safe, the only
    * way streaming dedup survives at 100 TB/day). */
  def dedupStream(stream: DataFrame, idCols: Seq[String], tsCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming exact-TEXT dedup — the streaming twin of
    * `Dedup.exactByDigest`: the document body is digested to 8 bytes
    * BEFORE deduplication, so the state store keys on a fixed-width hash
    * instead of holding document text (at 100 TB/day the state size is
    * what kills streaming dedup; watermark expiry bounds row count, the
    * digest bounds bytes-per-row). Collision risk is xxhash64's 2^-64 per
    * pair — the same trade the batch digest path documents. */
  def dedupStreamByDigest(stream: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withColumn("__graft_digest", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_digest")
      .drop("__graft_digest")

  /** Streaming FUZZY dedup — the streaming twin of
    * `Dedup.simhashGroups64`: rows whose portable 64-bit SimHash
    * fingerprint was already seen inside the watermark are dropped, so
    * near-identical documents (identical after tokenize/vote, e.g.
    * whitespace or ordering-invariant edits) collapse at the ingest
    * boundary. Fingerprint-EQUALITY is the only fuzzy form with
    * streaming-safe state: Hamming-radius matching needs a candidate
    * self-join, which an unbounded stream can't express — radius>0 dedup
    * stays a batch pass ([[graft.ops.Dedup.neardupClusters]]) over the
    * landed data. State per doc is one long (the digest-path trade made
    * fuzzy); watermark expiry bounds the row count. Batch-differential:
    * the kept set must equal batch `simhashGroups64`'s per-fingerprint
    * first-arrival representatives (StreamingSpec pins this).
    *
    * CRITERION caveat (measured, q_simhash_recall_fmt / SCALE.md r12):
    * fingerprint equality is BAG-OF-WORDS equality, not shingle
    * similarity — on the synthetic corpus ~99% of equal-fingerprint
    * pairs are sequence-different docs sharing a token set. Use this
    * stream only where that semantics is the target; the
    * shingle-overlap criterion needs the MinHash loop
    * ([[minhashIncrementalStream]]). */
  def dedupStreamBySimhash(stream: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withColumn("__graft_simhash",
        graft.ops.Dedup.simhash64Of(stream.sparkSession)(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_simhash")
      .drop("__graft_simhash")

  /** Streaming gap-based sessionization via the built-in `session_window`
    * — the streaming twin of the batch lag/running-sum formulation (the
    * batch query q_sessionize computes identical session boundaries;
    * differential-tested in batch mode where session_window also runs).
    * Windows extend while events arrive within `gap`; the watermark closes
    * and emits sessions once no extension is possible. */
  def sessionAggregate(stream: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Stream-static enrichment: join a record stream against the (static)
    * online snapshot — the streaming twin of the batch lookup (J2). Spark
    * broadcasts the static side when small, exactly like the batch plan.
    *
    * The static side's FILE LIST is resolved once at query start: each
    * micro-batch re-executes the scan but does NOT re-list the directory,
    * so a path-based snapshot swapped by [[start]] mid-query surfaces as
    * FileNotFoundException on the next batch, not as fresh data. To pick up
    * refreshes, restart the query (cheap — stream progress lives in the
    * checkpoint) or read the snapshot through a catalog table / format
    * whose file listing is transactional. */
  def enrichStream(stream: DataFrame, snapshot: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(snapshot, keys, "left")

  /** Streaming point-in-time enrichment: as entity rows arrive, attach the
    * latest in-TTL feature row from the (static) offline feature history —
    * the streaming twin of `FeatureStore.getHistoricalFeatures`. Window
    * functions can't run on an unbounded stream, so each micro-batch is
    * enriched in `foreachBatch` with the SAME `PointInTime
    * .historicalFeatures` code as batch (semantics can't drift;
    * batch-differential-tested). PIT enrichment is per-entity-row, so
    * incremental micro-batch results append to exactly the one-shot batch
    * result. Scale: each micro-batch is one bounded as-of join against the
    * feature store — partition pruning/pushdown on the static side apply
    * per batch, and `featureDf` re-resolves lazily so a compacted/appended
    * store is picked up on the next batch (unlike a stream-static stream
    * join, which pins the file list at query start — see [[enrichStream]]).
    *
    * Exactly-once output: foreachBatch is at-least-once (a batch whose
    * write succeeded but whose epoch didn't commit is RE-EXECUTED on
    * restart), so each batch overwrites its own `batch=<id>` partition
    * directory instead of blind-appending — the replay lands on the same
    * path and the result stays duplicate-free. Readers see a `batch`
    * partition column (drop it if unwanted). */
  def enrichAsOfStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      featureDf: () => DataFrame,
      outPath: String,
      checkpoint: String,
      keys: Seq[String],
      eventTs: String,
      featureTs: String,
      featureCols: Seq[String],
      ttl: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.PointInTime
          .historicalFeatures(batch, featureDf(), keys, eventTs, featureTs,
            featureCols, ttl, tieBreak)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()

  /** Streaming INCREMENTAL BM25 index build: documents arrive as a file-
    * source stream, and each micro-batch builds its own partial
    * [[graft.ops.TextAnalysis.bm25Index]] over the batch's documents —
    * the streaming form of [[graft.ops.TextAnalysis.bm25IndexMerge]]'s
    * per-shard build. Micro-batches partition the document set (each doc
    * is delivered exactly once), which is precisely the merge's
    * disjointness precondition, so merge-at-read
    * ([[readBm25Index]]) reproduces the monolithic index bit-for-bit NO
    * MATTER how the stream was batched — q_stream_bm25_index pins a
    * 4-batch build against the direct query's own oracle.
    *
    * Exactly-once via the [[enrichAsOfStream]] recipe: foreachBatch is
    * at-least-once, so each batch overwrites its own `batch=<id>`
    * partition of both tables instead of blind-appending — a replayed
    * epoch lands on the same path. At 100 TB this is the index
    * freshness path: the corpus lands continuously, each epoch adds its
    * postings shard, and serving reads the accumulated artifact without
    * ever re-tokenizing old documents. */
  def buildBm25IndexStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, outPath,
          s"bm25IndexStream:$checkpoint") {
        // ONE tokenize pass per epoch: land postings, then derive the
        // 1-row stats from the landed artifact + the batch's doc count
        // ([[graft.ops.TextAnalysis.bm25StatsFromPostings]] — bit-identical
        // to the second-action plan, minus its full re-tokenization).
        // The doc count stays a SEPARATE batch.count() (null-text docs
        // must count, so it cannot come from postings): riding it on the
        // postings write as an Observation was tried and REVERTED — the
        // CollectMetrics node sits inside the tokenize→tf pipeline and
        // breaks its whole-stage-codegen span, costing ~1 s per 4-epoch
        // build at sf0.1 (Probe18 bm25rc A/B), more than the one
        // column-pruned count job it saves; and a filtered batch that
        // collapses to an empty relation folds the node away entirely,
        // resolving the metrics map EMPTY (the dels-only retract epochs
        // died on exactly that).
        val ix = graft.ops.TextAnalysis.bm25Index(batch, textCol, idCol)
        ix.postings.write.mode("overwrite").parquet(s"$outPath/postings/batch=$batchId")
        graft.ops.TextAnalysis.bm25StatsFromPostings(
          spark.read.parquet(s"$outPath/postings/batch=$batchId"), batch.count())
          .write.mode("overwrite").parquet(s"$outPath/stats/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Read the artifact [[buildBm25IndexStream]] accumulates back as ONE
    * served index: partition discovery unions the per-batch postings, and
    * `bm25IndexMerge`'s exact-integer-sum normalization folds the
    * per-batch stats rows into the single whole-corpus row. */
  def readBm25Index(spark: SparkSession, outPath: String): graft.ops.TextAnalysis.Bm25Index = {
    recoverSwap(spark, outPath) // root swap: retractBm25Artifact
    recoverSwap(spark, s"$outPath/postings")
    recoverSwap(spark, s"$outPath/stats")
    graft.ops.TextAnalysis.bm25IndexMerge(Seq(graft.ops.TextAnalysis.Bm25Index(
      spark.read.parquet(s"$outPath/postings"),
      spark.read.parquet(s"$outPath/stats"))))
  }

  /** Streaming INCREMENTAL IVF index build — the embedding twin of
    * [[buildBm25IndexStream]], completing the index-freshness story for
    * both retrieval families: centroids are FIXED once (landed to
    * `outPath/centroids` before the stream starts — the build-time
    * artifact serving also reads), and each micro-batch of newly-landed
    * vectors computes its own `batch=<id>` assignment shard with
    * [[graft.ops.Similarity.ivfAssign]] — the per-row argmax against the
    * SAME stored centroids the search folds in, so served lookups cannot
    * drift from the monolithic build. Assignment has no cross-row terms,
    * so micro-batches (which partition the vector set) union into exactly
    * the monolithic assignment table no matter how the stream was
    * batched — q_stream_ivf_index pins that against q_ivf_topk's own
    * oracle. Exactly-once via the `batch=<id>` overwrite recipe; each
    * batch re-reads the ≤ nLists centroid rows from the artifact
    * (restart-safe — no driver state survives a resume anyway). The
    * `centroids` argument lands ONLY on first run: on restart the
    * artifact's STORED centroids are authoritative — [[recenterIvfIndex]]
    * may have replaced them, and a resume passing the original (stale)
    * frame must not clobber the re-centered table. */
  def buildIvfIndexStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      centroids: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    recoverSwap(spark, outPath) // root swap: recenterIvfIndex
    landCentroidsIfAbsent(spark, outPath, centroids)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, outPath,
          s"ivfIndexStream:$checkpoint") {
        graft.ops.Similarity
          .ivfAssign(batch, spark.read.parquet(s"$outPath/centroids"), idCol, embCol)
          .write.mode("overwrite").parquet(s"$outPath/assignments/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Land the IVF centroid table only when the artifact doesn't have one
    * yet — the stored table is authoritative across stream restarts (the
    * [[buildIvfIndexStream]] / [[recenterIvfIndex]] contract). */
  private def landCentroidsIfAbsent(spark: SparkSession, outPath: String,
      centroids: org.apache.spark.sql.DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$outPath/centroids")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      centroids.write.mode("overwrite").parquet(s"$outPath/centroids")
  }

  /** Read the artifact [[buildIvfIndexStream]] accumulates back as ONE
    * served [[graft.ops.Similarity.IvfIndex]]: partition discovery unions
    * the per-batch assignment shards; centroids read back as-landed. */
  def readIvfIndex(spark: SparkSession, outPath: String): graft.ops.Similarity.IvfIndex = {
    recoverSwap(spark, outPath) // root swap: applyIvfTombstones
    recoverSwap(spark, s"$outPath/assignments")
    graft.ops.Similarity.IvfIndex(
      spark.read.parquet(s"$outPath/centroids"),
      spark.read.parquet(s"$outPath/assignments"))
  }

  /** Streaming INCREMENTAL PQ index build — the codebook twin of
    * [[buildIvfIndexStream]], closing the build half of the PQ lifecycle
    * the r13 verdict named as the lagging family: codebooks are FIXED
    * once (landed to `outPath/codebooks` before the stream starts — the
    * same frozen-quantizer contract as the IVF centroid table), and each
    * micro-batch of newly-landed vectors encodes its own `batch=<id>`
    * codes shard with [[graft.ops.Similarity.pqEncodeAgainst]] — per-row
    * argmin against the SAME stored codebooks the ADC serve folds in, so
    * served lookups cannot drift from the monolithic build. Encoding has
    * no cross-row terms, so micro-batches union into exactly the
    * monolithic codes table no matter how the stream was batched
    * (q_stream_pq_index pins that against q_ann_topk_pq's own oracle).
    * Exactly-once via the `batch=<id>` overwrite recipe; each batch
    * re-reads the ≤ nSub·nCodes codebook rows from the artifact
    * (restart-safe). The `codebooks` argument lands ONLY on first run:
    * the stored table is authoritative across restarts — a codebook
    * re-train (the [[graft.ops.Similarity.pqDriftStats]] decision)
    * replaces it, and a resume passing the original frame must not
    * clobber the re-trained table. */
  def buildPqIndexStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      codebooks: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    recoverSwap(spark, outPath)
    recoverSwap(spark, s"$outPath/codebooks")
    val p = new org.apache.hadoop.fs.Path(s"$outPath/codebooks")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      // the one-time codebook landing commits via dir swap: a crash
      // mid-write leaves only the tmp dir (swept on the retry), never a
      // partial codebooks dir a bare existence check would adopt as
      // authoritative and silently encode every future batch against
      graft.fs.AtomicDir.swapDir(spark, s"$outPath/codebooks") { tmp =>
        codebooks.write.mode("overwrite").parquet(tmp)
      }
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, outPath,
          s"pqIndexStream:$checkpoint") {
        graft.ops.Similarity
          .pqEncodeAgainst(batch, spark.read.parquet(s"$outPath/codebooks"),
            idCol, embCol)
          .write.mode("overwrite").parquet(s"$outPath/codes/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Read the artifact [[buildPqIndexStream]] accumulates back as ONE
    * served [[graft.ops.Similarity.PqIndex]]: partition discovery unions
    * the per-batch codes shards (the `batch` provenance column rides
    * along — [[graft.ops.Similarity.pqTopKFromIndex]] projects it away,
    * [[graft.ops.Similarity.pqDriftStats]] groups on it); codebooks read
    * back as-landed. */
  def readPqIndex(spark: SparkSession, outPath: String): graft.ops.Similarity.PqIndex = {
    recoverSwap(spark, outPath)
    recoverSwap(spark, s"$outPath/codes")
    graft.ops.Similarity.PqIndex(
      spark.read.parquet(s"$outPath/codebooks"),
      spark.read.parquet(s"$outPath/codes"))
  }

  /** [[retractBatchArtifact]] over the [[buildPqIndexStream]] codes
    * shards — the same per-row algebra as [[retractIvfArtifact]]:
    * dropping ids' rows IS encode(W ∖ D) (codes carry no cross-row
    * terms); codebooks stay fixed. */
  def retractPqArtifact(spark: SparkSession, outPath: String,
      vecIds: DataFrame, idCol: String = "vec_id"): Unit = {
    recoverSwap(spark, outPath)
    retractBatchArtifact(spark, s"$outPath/codes", vecIds, idCol)
  }

  /** Compact the [[buildPqIndexStream]] codes shards (per-row, no
    * cross-row terms — identity fold; codebooks are one fixed table). */
  def compactPqIndex(spark: SparkSession, outPath: String): Boolean = {
    recoverSwap(spark, outPath)
    compactBatchArtifact(spark, s"$outPath/codes")
  }

  /** RE-TRAIN the PQ artifact from the live corpus — the quantizer twin
    * of [[recenterIvfIndex]], closing the loop [[graft.ops.Similarity
    * .pqDriftStats]] monitors: fresh codebooks LLOYD-REFINED per subspace
    * on the INDEXED corpus (`refineIters` rounds of
    * [[graft.ops.Similarity.refinedPqCodebooks]] — NOT the bare lowest-id
    * bootstrap, which on a low-id-drifted corpus would re-pick nearly the
    * books it is replacing and make retraining a near-no-op),
    * every indexed id re-encoded against them, one crash-safe root swap.
    * Epochs fold all-but-newest into the oldest id; the newest re-encodes
    * on its OWN partition so a replayed last micro-batch still overwrites
    * itself — but note the replay would re-encode against the NEW stored
    * codebooks (the stream reads them per batch), so replay stays
    * idempotent on the served result. The corpus must cover every
    * indexed id exactly once (loud refusal otherwise — re-encoding would
    * silently drop or duplicate). Returns false on an empty artifact. */
  def retrainPqIndex(spark: SparkSession, outPath: String,
      corpus: DataFrame, nSub: Int = 8, nCodes: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding",
      refineIters: Int = 2): Boolean = {
    recoverSwap(spark, outPath)
    recoverSwap(spark, s"$outPath/codes")
    recoverSwap(spark, s"$outPath/codebooks")
    val epochs = epochIds(spark, s"$outPath/codes")
    if (epochs.isEmpty) return false
    val newest = epochs.last
    val target = epochs.head
    val member = spark.read.parquet(s"$outPath/codes")
      .select(col(idCol), col("batch").cast("long").as("__b"))
    // ONE aggregate answers all three integrity questions in a single
    // job (the r16 verdict's double-full-pass fix), without asserting
    // anything about MEMBER-side id multiplicity (the r17 ADVICE
    // over-strictness: an id re-encoded before a compaction folds
    // epochs legitimately appears in more than one codes epoch, and it
    // must join the same corpus row in each). Pre-aggregating the
    // corpus per id makes the left join inflation-free, so: a missing
    // or null embedding leaves a null embCol row (count(emb) <
    // count(*)), and a duplicated CORPUS id surfaces as max(__n) > 1 —
    // refused, because the re-encode join below would duplicate rows.
    val corpusKeyed = corpus.select(col(idCol), col(embCol))
      .groupBy(col(idCol))
      .agg(first(col(embCol), ignoreNulls = false).as(embCol),
        count(lit(1)).as("__n"))
    val leftJ = member.join(corpusKeyed, Seq(idCol), "left")
    val g = leftJ.agg(count(lit(1)), count(col(embCol)), max(col("__n"))).head()
    require(g.getLong(0) == g.getLong(1) &&
        (g.isNullAt(2) || g.getLong(2) == 1L),
      "pq retrain: some indexed ids have no embedding in the supplied " +
        "corpus (or the corpus carries an id more than once) — " +
        "re-encoding would silently drop or duplicate them")
    val joined = member.join(corpus.select(col(idCol), col(embCol)), Seq(idCol))
    val books = graft.ops.Similarity.pqCodebookTable(
      joined.select(col(idCol), col(embCol)), nSub, nCodes, idCol, embCol,
      refineIters)
    def enc(df: DataFrame): DataFrame =
      graft.ops.Similarity.pqEncodeAgainst(df, books, idCol, embCol)
    swapDir(spark, outPath) { tmp =>
      books.write.mode("overwrite").parquet(s"$tmp/codebooks")
      enc(joined.where(col("__b") === newest).drop("__b"))
        .write.mode("overwrite").parquet(s"$tmp/codes/batch=$newest")
      if (epochs.size > 1)
        enc(joined.where(col("__b") =!= newest).drop("__b"))
          .write.mode("overwrite").parquet(s"$tmp/codes/batch=$target")
    }
    true
  }

  /** PQ-ARTIFACT MAINTENANCE — the third planner (layout, BM25/IVF,
    * now the quantizer): measure [[graft.ops.Similarity.pqDriftStats]]
    * per codes epoch against the live corpus and RE-TRAIN
    * ([[retrainPqIndex]]) when the NEWEST epoch's mean reconstruction
    * error climbs past `retrainAboveMse` (the codebook drift gate the
    * r13 verdict asked to close); else fold codes epochs past
    * `maxEpochs` ([[compactPqIndex]]). Physical retraction is
    * [[retractPqArtifact]]'s job at takedown time (per-row, no pending
    * state to fold — the reason this planner has no tombstone step).
    * Returns the (action, value) decision receipt. */
  def maintainPqIndex(spark: SparkSession, outPath: String,
      corpus: DataFrame, retrainAboveMse: Double = Double.PositiveInfinity,
      maxEpochs: Int = 8, nSub: Int = 8, nCodes: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding",
      refineIters: Int = 2): DataFrame =
      graft.fs.Layout.withWriterLease(spark, outPath,
        maintenanceHolder("maintainPqIndex")) {
    val report = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def meanMse(r: org.apache.spark.sql.Row): Option[Double] = {
      val i = r.fieldIndex("mean_mse")
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    val drift = graft.ops.Similarity.pqDriftStats(
      readPqIndex(spark, outPath), corpus, idCol = idCol, embCol = embCol)
      .orderBy(col("batch").cast("long")).collect()
    for (r <- drift; m <- meanMse(r))
      report += (s"mean_mse_epoch_${r.get(0)}" -> m)
    val newestMse = drift.lastOption.flatMap(meanMse).getOrElse(0.0)
    val epochs = epochIds(spark, s"$outPath/codes").size
    report += ("epochs_before" -> epochs.toDouble)
    if (newestMse > retrainAboveMse) {
      retrainPqIndex(spark, outPath, corpus, nSub, nCodes, idCol, embCol,
        refineIters)
      report += ("retrained" -> 1.0)
      val after = graft.ops.Similarity.pqDriftStats(
        readPqIndex(spark, outPath), corpus, idCol = idCol, embCol = embCol)
        .orderBy(col("batch").cast("long")).collect()
      for (r <- after.lastOption; m <- meanMse(r))
        report += ("mean_mse_after" -> m)
    } else if (epochs > maxEpochs && compactPqIndex(spark, outPath)) {
      report += ("compacted" -> 1.0)
      report += ("epochs_after" ->
        epochIds(spark, s"$outPath/codes").size.toDouble)
    }
    import spark.implicits._
    report.toSeq.toDF("action", "value")
  }

  /** [[buildIvfIndexStream]] with a DELETION FEED interleaved — the
    * embedding twin of [[buildBm25IndexRetractStream]], closing the last
    * asymmetric cell in the lifecycle matrix: a takedown arriving
    * mid-stream on the vector index no longer waits for stream stop →
    * [[retractIvfArtifact]] → resume. Insert rows assign against the
    * fixed stored centroids exactly as before; delete rows (carrying only
    * `idCol` — `embCol` null) land as append-only `dels/batch=<id>`
    * tombstone partitions. Serving applies them logically
    * ([[readIvfIndexRetracted]] — one anti-join, since assignment rows
    * carry no cross-row terms); physical removal is
    * [[applyIvfTombstones]]' job between stream runs. Same SEMANTICS as
    * the BM25 family: tombstones are id-based and ORDERING-BLIND — a
    * delete-then-reinsert of the same id stays deleted at serve
    * (takedowns on an index are absolute), unlike the corpus loops'
    * later-tombstone rule. Exactly-once: both writes are `batch=<id>`
    * overwrites and nothing in the standing artifact is mutated, so a
    * replayed epoch re-lands identical partitions. */
  def buildIvfIndexRetractStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      centroids: org.apache.spark.sql.DataFrame,
      opCol: String = "op",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    // self-heal BEFORE landing centroids/creating subdirs — applyIvfTombstones
    // root-swaps outPath (the buildBm25IndexRetractStream lesson: writing
    // into a recreated dst makes recoverSwap's guard unreachable forever)
    recoverSwap(spark, outPath)
    landCentroidsIfAbsent(spark, outPath, centroids)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/dels"))
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, outPath,
          s"ivfIndexRetractStream:$checkpoint") {
        batch.where(col(opCol) === lit("del")).select(col(idCol))
          .write.mode("overwrite").parquet(s"$outPath/dels/batch=$batchId")
        graft.ops.Similarity
          .ivfAssign(batch.where(col(opCol) === lit("ins")).drop(opCol),
            spark.read.parquet(s"$outPath/centroids"), idCol, embCol)
          .write.mode("overwrite").parquet(s"$outPath/assignments/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** RE-CENTER the streamed IVF artifact — the ACT the drift monitor
    * ([[graft.ops.Similarity.ivfDriftStats]]) decides: when per-epoch
    * cosine-to-assigned-centroid degrades, recompute centroids over the
    * ACCUMULATED corpus, reassign every indexed vector, and swap the
    * artifact atomically — after which the resumed stream's epochs assign
    * against the new centroids (foreachBatch re-reads `centroids` from
    * the artifact every batch, so a REPLAYED newest epoch also lands
    * new-centroid assignments — identical to the rows written here).
    *
    * The artifact stores only (id, cell), so the caller supplies the
    * embeddings (`corpus`); every indexed id must appear in it exactly
    * once (enforced — an unmatched id cannot be reassigned and would
    * silently vanish from the index). New centroids come from the
    * INDEXED vectors (`corpus` ∩ artifact ids) via the same
    * [[graft.ops.Similarity.ivfIndex]] bootstrap/Lloyd path as a fresh
    * build — so recenter-after-drift ≡ `ivfIndex` over the accumulated
    * corpus THROUGH THE SERVED SCORES (q_ivf_recentered pins it).
    * Committed epochs fold into the oldest partition (their epoch
    * boundaries carry no information the new assignment preserves); the
    * newest epoch keeps its own partition so an at-least-once replay
    * overwrites rather than double-lands (the [[compactBatchArtifact]]
    * argument). A `dels` subtree ([[buildIvfIndexRetractStream]]) rides
    * the swap verbatim — tombstones name ids, which re-centering does
    * not change. Run between stream runs. */
  def recenterIvfIndex(
      spark: SparkSession,
      outPath: String,
      corpus: DataFrame,
      nLists: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Boolean = {
    recoverSwap(spark, outPath)
    recoverSwap(spark, s"$outPath/assignments")
    val epochs = epochIds(spark, s"$outPath/assignments")
    if (epochs.isEmpty) return false
    val newest = epochs.last
    val target = epochs.head
    val member = spark.read.parquet(s"$outPath/assignments")
      .select(col(idCol), col("batch").cast("long").as("__b"))
    val emb = corpus.select(col(idCol), col(embCol))
    val joined = member.join(emb, Seq(idCol))
    val nIdx = member.count()
    require(joined.count() == nIdx,
      "ivf recenter: some indexed ids have no embedding in the supplied " +
        "corpus (or appear more than once) — reassignment would silently " +
        "drop or duplicate them")
    val fresh = graft.ops.Similarity.ivfIndex(
      joined.select(col(idCol), col(embCol)), nLists, iters, idCol, embCol)
    val withBatch = fresh.assignments.join(member, Seq(idCol))
    val folded = withBatch.where(col("__b") =!= newest).select(col(idCol), col("cell"))
    val newestPart = withBatch.where(col("__b") === newest).select(col(idCol), col("cell"))
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delsPath = new org.apache.hadoop.fs.Path(s"$outPath/dels")
    val dels = if (fs.exists(delsPath) &&
        fs.listStatus(delsPath).exists(_.getPath.getName.startsWith("batch=")))
      Some(spark.read.parquet(s"$outPath/dels")) else None
    val keepDelsDir = fs.exists(delsPath)
    swapDir(spark, outPath) { tmp =>
      fresh.centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      if (epochs.length > 1)
        folded.write.mode("overwrite").parquet(s"$tmp/assignments/batch=$target")
      newestPart.write.mode("overwrite").parquet(s"$tmp/assignments/batch=$newest")
      dels.foreach(_.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/dels"))
      if (dels.isEmpty && keepDelsDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/dels"))
      ()
    }
    true
  }

  /** Serve the [[buildIvfIndexRetractStream]] artifact: union the
    * assignment shards and anti-join ALL tombstone ids away — the
    * streamed-artifact form of [[graft.ops.Similarity.ivfRetract]].
    * Duplicate tombstones collapse (anti-join semantics), so re-deleting
    * is safe. */
  def readIvfIndexRetracted(spark: SparkSession, outPath: String,
      idCol: String = "vec_id"): graft.ops.Similarity.IvfIndex = {
    val ix = readIvfIndex(spark, outPath)
    // after applyIvfTombstones the dels subtree is empty (no batch= child
    // to infer a schema from) — nothing to subtract
    if (epochIds(spark, s"$outPath/dels").isEmpty) ix
    else graft.ops.Similarity.IvfIndex(ix.centroids,
      ix.assignments.join(
        broadcast(spark.read.parquet(s"$outPath/dels").select(col(idCol)).distinct()),
        Seq(idCol), "left_anti"))
  }

  /** PHYSICALLY apply [[buildIvfIndexRetractStream]]'s tombstones and drop
    * them — the IVF twin of [[applyBm25Tombstones]], but SIMPLER because
    * per-row retraction is IDEMPOTENT: assignment rows carry no cross-row
    * sums, so ALL tombstone epochs (including the newest, replayable one)
    * can be applied and dropped in one pass — a replayed newest epoch
    * re-lands its tombstone partition and its identical assignment shard,
    * and re-applying those tombstones at read is an anti-join no-op. (The
    * BM25 twin must keep its newest epoch logical precisely because its
    * stats subtraction is NOT idempotent.) Assignments, the emptied dels
    * subtree, and the carried-through centroids move under ONE crash-safe
    * root swap; serve output is invariant (q_stream_ivf_retracted's
    * oracle family pins it). No-op (false) when no tombstones exist. Run
    * between stream runs, like compaction. */
  def applyIvfTombstones(spark: SparkSession, outPath: String,
      idCol: String = "vec_id"): Boolean = {
    recoverSwap(spark, outPath)
    if (epochIds(spark, s"$outPath/dels").isEmpty) return false
    val delIds = spark.read.parquet(s"$outPath/dels").select(col(idCol)).distinct()
    if (delIds.isEmpty) return false
    val asg = spark.read.parquet(s"$outPath/assignments")
    val kept = asg.join(broadcast(delIds), Seq(idCol), "left_anti")
      .select(asg.columns.map(col).toIndexedSeq: _*)
    val centroids = spark.read.parquet(s"$outPath/centroids")
    swapDir(spark, outPath) { tmp =>
      kept.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/assignments")
      centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      // dels subtree recreated empty — the shape readers/the resumed
      // stream expect; a replayed newest epoch re-lands its partition here
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/dels"))
    }
    true
  }

  /** Streaming KMV sketch accumulation — the sketch-family member of the
    * incremental-build trio (BM25 postings, IVF assignments, and now
    * cardinality): each micro-batch lands its own partial
    * [[graft.ops.Sketches.kmvSketch]] (≤ k longs per group per batch) and
    * [[readKmvSketch]] merge-folds the artifact at read time. Unlike the
    * index builds, KMV needs NO disjointness precondition at all:
    * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) holds for OVERLAPPING
    * sides too (the merge dedups hashes), so even an at-least-once replay
    * of a whole batch cannot perturb the estimate — the `batch=<id>`
    * overwrite is kept anyway to bound artifact growth. */
  def buildKmvSketchStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      groupCol: String,
      valueCol: String,
      k: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sketches.kmvSketch(batch, groupCol, org.apache.spark.sql.functions.col(valueCol), k)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming QUANTILE sketch accumulation — completes the incremental-
    * build quartet (BM25 postings, IVF assignments, KMV cardinality, and
    * now quantiles): each micro-batch lands its own partial
    * [[graft.ops.Sketches.quantileSketch]] (≤ k (pri, v) pairs per group
    * per batch) and [[readQuantileSketch]] merge-folds the artifact at
    * read time. Like KMV — and unlike the index builds — the merge needs
    * NO disjointness: bottom-k by priority dedups the (pri, v) pairs, so
    * an at-least-once replay of a whole batch cannot perturb the sample;
    * the `batch=<id>` overwrite is kept to bound artifact growth. */
  def buildQuantileSketchStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      k: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sketches.quantileSketch(batch, groupCol, col(keyCol), col(valueCol), k)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** Merge-fold the accumulated per-batch quantile sketches back into one
    * sketch frame per group (still ≤ k pairs each) — feed to
    * [[graft.ops.Sketches.quantileEstimate]]. */
  def readQuantileSketch(spark: SparkSession, outPath: String, groupCol: String,
      k: Int = 16): DataFrame = {
    recoverSwap(spark, outPath)
    graft.ops.Sketches.quantileMerge(spark.read.parquet(outPath), groupCol, k)
  }

  /** Merge-fold the accumulated per-batch sketches back into one sketch
    * frame per group (still ≤ k hashes each) — feed to
    * [[graft.ops.Sketches.kmvEstimate]]. */
  def readKmvSketch(spark: SparkSession, outPath: String, groupCol: String,
      k: Int = 16): DataFrame = {
    recoverSwap(spark, outPath)
    graft.ops.Sketches.kmvMerge(spark.read.parquet(outPath), groupCol, k)
  }

  /** Ingest-time benchmark DECONTAMINATION: each micro-batch of arriving
    * documents is scored against the static reference corpus with
    * [[graft.ops.Dedup.contamination]] (the batch operator verbatim) and
    * only docs at or below `maxContamination` land, each carrying its
    * score as provenance. Per-doc deterministic and batching-INVARIANT —
    * a doc's score depends only on its own grams and the static
    * reference — so the accumulated output equals the one-shot batch
    * filter no matter how the stream was batched, and the oracle replays
    * the batch form directly (unlike the order-dependent
    * [[dedupIncrementalStream]]). Exactly-once via the `batch=<id>`
    * overwrite recipe. This is the eval-set firewall a training-data
    * ingest runs continuously: benchmark text can never enter the corpus,
    * and the quarantine decision lands with the evidence attached. */
  def decontaminateStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      reference: () => DataFrame,
      outPath: String,
      checkpoint: String,
      maxContamination: Double,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    // the reference is STATIC by contract (the scaladoc's batching-
    // invariance argument depends on it), so its distinct gram set is
    // derived and cached ONCE here — the old per-batch
    // contamination(batch, reference()) re-tokenized and re-distinct'd
    // the whole reference corpus on every micro-batch
    val refGrams = graft.ops.Dedup.referenceGrams(reference(), textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cont = graft.ops.Dedup.contaminationAgainstGrams(batch, refGrams,
          textCol, idCol, n)
        batch
          .join(cont.where(col("contamination") <= maxContamination)
            .select(col(idCol), col("contamination")), Seq(idCol))
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** CONTINUOUS Z-ORDERED INGEST — the layout family's streaming loop,
    * completing its lifecycle matrix the way every other artifact family
    * got one (build → append → refresh → compact, now driven by a
    * stream): each micro-batch lands z-clustered as its own `batch=<id>`
    * partition of the layout (first epoch derives the frozen boundaries
    * from ITSELF and writes the meta sidecar — a stream never sees the
    * full table; [[graft.fs.Layout.layoutStats]] is the drift/rebuild
    * trigger), then BOTH skipping indexes catch up incrementally
    * ([[graft.fs.Layout.refreshManifest]]/[[graft.fs.Layout
    * .refreshValueIndex]] — cost ∝ the batch, never the table).
    *
    * Exactly-once: the `batch=<id>` partition overwrite (the engine-wide
    * recipe — a replayed epoch rewrites its own partition, never
    * double-lands), and the index refreshes run with `allowGone = true`
    * because a replay regenerates part-file names: the refresh drops the
    * orphaned rows and indexes the fresh files, leaving the index an
    * exact description of the live file set. Between stream runs,
    * [[compactZorderLayout]] folds committed epochs back to the built
    * file count. Pruned/point reads stay EXACT throughout
    * (q_stream_zorder_ingest's oracle is the full-scan conjunction);
    * a crash between the data write and an index refresh surfaces as
    * the loud staleness guard on the next read, never as missing rows.
    * Every batch records ONE commit in the table's log for free — the
    * single mutator call inside the body claims it
    * ([[graft.fs.OptimisticCommit]], the r18 default-path wiring); the
    * same holds for all five zorder stream loops. */
  def zorderIngestStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      layoutPath: String,
      checkpoint: String,
      zCols: Seq[String],
      indexCol: String,
      bits: Int = 6,
      numFilesPerBatch: Int = 4,
      buckets: Int = 1 << 16,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      quantileOn: Option[(String, String)] = None,
      quantileK: Int = 64
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, layoutPath,
          s"zorderIngestStream:$checkpoint") {
        val conf = spark.sparkContext.hadoopConfiguration
        def exists(p: String): Boolean = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).exists(hp)
        }
        val mPath = graft.fs.Layout.manifestPath(layoutPath)
        val vPath = graft.fs.Layout.valueIndexPath(layoutPath, indexCol)
        recoverSwap(spark, mPath)
        recoverSwap(spark, vPath)
        // DATA recovery before anything touches the root (the r14 ADVICE
        // gap — the other two layout streams already do this): the
        // companion compactZorderLayout swaps the layout ROOT, and a crash
        // between its renames leaves only '<layout>_old'; without this
        // restore, appendZorderedEpoch would recreate the root holding
        // only the new epoch and the allowGone refreshes would silently
        // drop every pre-compaction file from the indexes — silent row
        // loss instead of the loud staleness failure. No-op before the
        // first epoch (the root does not exist yet).
        graft.fs.Layout.recoverLayout(spark, layoutPath)
        if (!exists(graft.fs.Layout.layoutMetaPath(layoutPath)))
          graft.fs.Layout.buildZorderedEpoch(batch, layoutPath, zCols, bits,
            numFilesPerBatch, batchId)
        else
          graft.fs.Layout.appendZorderedEpoch(batch, layoutPath, batchId,
            numFilesPerBatch)
        // the common cadences share ONE scan for both indexes: first epoch
        // = combined full build, every later epoch = combined incremental
        // refresh; the mixed states (one index present, the other not —
        // only reachable by hand-deleting a sidecar) keep the individual
        // paths
        (exists(mPath), exists(vPath)) match {
          case (false, false) =>
            graft.fs.Layout.writeLayoutIndexes(spark, layoutPath, zCols,
              indexCol, buckets)
          case (true, true) =>
            graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
              indexCol, buckets, allowGone = true)
          case (hasM, _) =>
            if (!hasM)
              graft.fs.Layout.writeManifest(spark, layoutPath, zCols)
            else
              graft.fs.Layout.refreshManifest(spark, layoutPath, zCols,
                allowGone = true)
            if (!exists(vPath))
              graft.fs.Layout.writeValueIndex(spark, layoutPath, indexCol,
                buckets)
            else
              graft.fs.Layout.refreshValueIndex(spark, layoutPath, indexCol,
                buckets, allowGone = true)
        }
        // the OPTIONAL third index family: per-file quantile samples —
        // same epoch commit unit, same incremental refresh economics,
        // so the quantile pushdown serves between epochs like the others
        quantileOn.foreach { case (v, key) =>
          val qp = graft.fs.Layout.quantileIndexPath(layoutPath, v, key)
          recoverSwap(spark, qp)
          if (!exists(qp))
            graft.fs.Layout.writeQuantileIndex(spark, layoutPath, v, key,
              quantileK)
          else
            graft.fs.Layout.refreshQuantileIndex(spark, layoutPath, v, key,
              quantileK, allowGone = true)
        }
        }
        ()
      }
      .start()
  }

  /** Fold the layout's committed epochs back to the built file count —
    * [[compactBatchArtifact]] with a z-reclustering fold (frozen-meta
    * re-key + range exchange + in-file sort, so the compacted partition
    * is a proper Z layout, not a concatenation), then FULL index
    * rewrites (every folded file changed — the incremental refreshes'
    * gone-files contract). Run between stream runs; the newest epoch
    * stays verbatim (the only one foreachBatch may replay). Returns
    * false (untouched) below 3 epochs. */
  def compactZorderLayout(
      spark: SparkSession,
      layoutPath: String,
      zCols: Seq[String],
      indexCol: String,
      numFiles: Int = 8,
      buckets: Int = 1 << 16
  ): Boolean = graft.fs.Layout.withWriterLease(spark, layoutPath,
      maintenanceHolder("compactZorderLayout")) {
    // the fold swaps the layout ROOT via compactBatchArtifact (not a
    // Layout mutator), so the planner records the rewrite commit itself
    graft.fs.OptimisticCommit.rewriteScope(spark, layoutPath,
      "compactZorderLayout") {
    val (cols, bits, bounds, sbounds) =
      graft.fs.Layout.readLayoutMetaTyped(spark, layoutPath)
    // the fold's range exchange SAMPLES its child (a second execution of
    // the scan+keying lineage) before the shuffle pass — persist the fold
    // source for the write's duration so both passes read the cache (the
    // [[graft.fs.Layout.withRangeClustered]] rationale; here the write
    // happens inside compactBatchArtifact, so the cache handle outlives
    // the lambda and releases right after the call)
    var foldSrc: Option[DataFrame] = None
    val did =
      try compactBatchArtifact(spark, layoutPath, { df =>
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        foldSrc = Some(cached)
        graft.fs.Layout.zorderKeyWithBoundsTyped(cached, cols, bits, bounds, sbounds)
          .repartitionByRange(numFiles, col("zkey"))
          .sortWithinPartitions(col("zkey"))
          .drop(graft.fs.Layout.zorderWorkCols(cols.size): _*)
      })
      finally foldSrc.foreach(_.unpersist(false))
    if (did) {
      // full index rewrites after the fold — ONE table scan for both
      graft.fs.Layout.writeLayoutIndexes(spark, layoutPath, zCols, indexCol,
        buckets)
      rebuildStandingQuantileIndexes(spark, layoutPath)
    }
    did
    }
  }

  /** SIZE-TIERED fold between stream runs — the INCREMENTAL maintenance
    * unit ([[graft.fs.Layout.compactEpochsTiered]] + the fold-sized
    * index catch-up): only epochs below `maxBytes` fold (never the
    * newest — replay safety), untouched epochs keep their files, so the
    * closing index refreshes run INCREMENTALLY with `allowGone = true`
    * (victim files drop, target files index) instead of the full
    * rewrites [[compactZorderLayout]] forces. The steady-state cadence
    * for a long-lived ingest stream: each run absorbs the small tail at
    * cost ∝ the tail; schedule the full fold (or a recluster, on the
    * drift number) only when the tier count itself grows. Returns the
    * folded epoch ids (empty = nothing small enough to fold). */
  def tierZorderLayout(
      spark: SparkSession,
      layoutPath: String,
      zCols: Seq[String],
      indexCol: String,
      maxBytes: Long,
      numFiles: Int = 4,
      buckets: Int = 1 << 16
  ): Seq[Long] = graft.fs.Layout.withWriterLease(spark, layoutPath,
      maintenanceHolder("tierZorderLayout")) {
    val folded = graft.fs.Layout.compactEpochsTiered(spark, layoutPath,
      maxBytes, numFiles)
    if (folded.nonEmpty) {
      graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
        indexCol, buckets, allowGone = true)
      refreshStandingQuantileIndexes(spark, layoutPath)
    }
    folded
  }

  /** Per-INVOCATION lease holder for the maintenance planners — the r15
    * verdict's live hazard: a CONSTANT holder ("layout-maintenance")
    * passes [[graft.fs.Layout.withWriterLease]]'s self-fenced re-entry,
    * so an overrunning maintenance cron overlapping its next firing
    * would interleave root swaps silently — the exact collision the
    * lease exists to refuse. A fresh UUID per call makes any overlap
    * (same planner or not) refuse loudly. The honest trade: a CRASHED
    * maintenance run no longer self-heals on retry — the operator
    * confirms the process is gone and runs
    * [[graft.fs.Layout.breakWriterLease]] (the marker records this
    * holder string, naming the planner and pid@host for that check).
    * The streams keep their checkpoint-path holders — one active query
    * per checkpoint is a real exclusivity unit; a cron firing is not.
    * The ARTIFACT families (BM25/IVF/PQ) carry the same discipline on
    * their artifact roots: each index stream's foreachBatch and each
    * artifact planner holds the root's lease for its duration, so a
    * maintenance fold can never interleave with a mid-epoch stream
    * landing (the same swap-vs-append hazard the layout lease closes). */
  private def maintenanceHolder(op: String): String = {
    val pidHost = try {
      val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
      rt.getName // "pid@host"
    } catch { case _: Throwable => "unknown" }
    s"$op:$pidHost:${java.util.UUID.randomUUID}"
  }

  /** Every standing quantile index catches up incrementally (the tier /
    * stream cadence) — discovery by the path convention, each at its
    * build's persisted k. */
  private def refreshStandingQuantileIndexes(spark: SparkSession,
      layoutPath: String): Unit =
    graft.fs.Layout.standingQuantileIndexes(spark, layoutPath)
      .foreach { case (v, key, k) =>
        graft.fs.Layout.refreshQuantileIndex(spark, layoutPath, v, key, k,
          allowGone = true)
      }

  /** Every standing quantile index rebuilds whole (the every-file-changed
    * cadence: recluster / full fold / flat compact). */
  private def rebuildStandingQuantileIndexes(spark: SparkSession,
      layoutPath: String): Unit =
    graft.fs.Layout.standingQuantileIndexes(spark, layoutPath)
      .foreach { case (v, key, k) =>
        graft.fs.Layout.writeQuantileIndex(spark, layoutPath, v, key, k)
      }

  /** RECLUSTER the layout between stream runs — the drift-loop closer
    * ([[graft.fs.Layout.layoutDrift]] is the trigger,
    * [[graft.fs.Layout.reclusterLayout]] the rewrite, this the bundled
    * maintenance unit like [[compactZorderLayout]]): fresh boundaries
    * from the drifted table, epoch fold (newest kept on its own
    * partition for replay), then the FULL index rewrites every-file-
    * changed demands — the layout serves pruned reads again the moment
    * this returns. Run instead of compactZorderLayout when the drift
    * number says the frozen bounds no longer match the data. */
  def reclusterZorderLayout(
      spark: SparkSession,
      layoutPath: String,
      zCols: Seq[String],
      indexCol: String,
      numFiles: Int = 8,
      buckets: Int = 1 << 16,
      sampleBy: Option[(String, Int)] = None
  ): Seq[Seq[Double]] = graft.fs.Layout.withWriterLease(spark, layoutPath,
      maintenanceHolder("reclusterZorderLayout")) {
    // ONE commit for recluster + index rewrites (the inner
    // reclusterLayout's own scope nests into this one)
    graft.fs.OptimisticCommit.rewriteScope(spark, layoutPath,
      "reclusterZorderLayout") {
    val bounds = graft.fs.Layout.reclusterLayout(spark, layoutPath, numFiles,
      sampleBy)
    graft.fs.Layout.writeLayoutIndexes(spark, layoutPath, zCols, indexCol,
      buckets)
    rebuildStandingQuantileIndexes(spark, layoutPath)
    bounds
    }
  }

  /** TAKEDOWN FEED for the Z-ordered layout — the streaming twin of
    * [[graft.fs.Layout.deleteByKeys]] closing the layout family's
    * retract-as-a-stream cell (every other artifact family has one):
    * each micro-batch is a set of `keyCol` values to remove (the
    * DMCA/GDPR shape — ids arrive continuously, rows must leave the
    * standing table); the whole batch routes through the value index in
    * one probe, only victim-holding partitions rewrite (crash-safe
    * hidden set-asides), and both skipping indexes catch up
    * incrementally before the epoch commits — so between epochs the
    * layout is always serveable and exactly the survivors. Replay-
    * idempotent without epoch bookkeeping: a replayed batch's keys find
    * no victims (they are already gone), the rewrites skip, and the
    * refreshes no-op — deletion is naturally convergent, unlike
    * insertion (which needs the `batch=<id>` overwrite trick). */
  def zorderDeleteStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      layoutPath: String,
      checkpoint: String,
      zCols: Seq[String],
      keyCol: String,
      buckets: Int = 1 << 16,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.fs.Layout.withWriterLease(spark, layoutPath,
          s"zorderDeleteStream:$checkpoint") {
        // index swaps may have crashed mid-epoch; restore before the
        // consult inside deleteByKeys reads them
        recoverSwap(spark, graft.fs.Layout.manifestPath(layoutPath))
        recoverSwap(spark, graft.fs.Layout.valueIndexPath(layoutPath, keyCol))
        // DATA recovery strictly BEFORE the head refresh: a crash inside
        // a partition swap leaves a set-aside the refresh would read as
        // gone files — refreshing first would drop the partition from
        // the indexes and serve without its surviving rows
        graft.fs.Layout.recoverLayout(spark, layoutPath)
        // HEAD repair (no-op when fresh): a crash between a previous
        // epoch's rewrites and its closing refresh leaves stale indexes,
        // and the consult inside deleteByKeys refuses stale — the
        // replayed batch must restore freshness before it can route
        graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
          keyCol, buckets, allowGone = true)
        graft.fs.Layout.deleteByKeys(spark, layoutPath, batch, keyCol, buckets)
        // the epoch's commit unit: indexes catch up to the rewrites —
        // ONE shared scan of the changed files for both indexes
        graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
          keyCol, buckets, allowGone = true)
        }
        ()
      }
      .start()
  }

  /** LAYOUT MAINTENANCE — ONE call closing the whole monitor→decide→act
    * loop, the thing an operator actually schedules: (1) FOLD any
    * pending MoR sidecars (tombstones first, then upsert deltas — the
    * takedown-wins rule is enforced inside the folds themselves;
    * maintenance time IS the compaction cadence that keeps both
    * sidecars broadcast-sized and re-arms the metadata pushdowns);
    * (2) measure [[graft.fs.Layout.layoutDrift]] on the folded table
    * and RECLUSTER when any Z column's TV ≥ `reclusterAt` (fresh
    * sampled bounds + full index rewrite — the drift cure); (3) else
    * COMPACT when the live file count exceeds `maxFiles` (the
    * small-files answer): with `tierBytes` set, an epoch layout first
    * tries the SIZE-TIERED fold ([[tierZorderLayout]]'s economics —
    * rewrite ∝ the small tail, incremental index catch-up) and only
    * falls through to the whole-table fold when nothing small enough
    * remains to tier; without it, epoch layouts fold committed epochs
    * and flat layouts re-range-cluster, full index rewrite either way.
    * Holds
    * the writer lease for the whole run, so a stream mid-epoch refuses
    * it and vice versa; every step is individually crash-safe and a
    * re-run converges (folds are key-idempotent, recluster/compact are
    * whole-rewrites). Assumes the standing layout has its manifest on
    * `zCols` and value index on `keyCol` — the serving posture every
    * loop here maintains. Returns the decision receipt as (action,
    * value) rows: fold counts, per-column drift, and which rewrite (if
    * any) ran with the file counts either side. */
  def maintainLayout(
      spark: SparkSession,
      layoutPath: String,
      zCols: Seq[String],
      keyCol: String,
      buckets: Int = 1 << 16,
      reclusterAt: Double = 0.25,
      maxFiles: Int = 64,
      numFiles: Int = 8,
      sampleBy: Option[(String, Int)] = None,
      tierBytes: Option[Long] = None
  ): DataFrame = graft.fs.Layout.withWriterLease(spark, layoutPath,
      maintenanceHolder("maintainLayout")) {
    // ONE commit per maintenance run — the folds, the drift measure, and
    // whichever rewrite arm acts all fold into it (nested scopes); the
    // epoch-fold arm swaps the root via compactBatchArtifact, which is
    // not a Layout mutator, so the planner-level scope also covers it
    graft.fs.OptimisticCommit.rewriteScope(spark, layoutPath,
      "maintainLayout") {
    graft.fs.Layout.recoverLayout(spark, layoutPath)
    val report = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val removed = graft.fs.Layout.applyTombstones(spark, layoutPath, keyCol,
      zCols, buckets)
    if (removed > 0) report += ("fold_tombstones_removed" -> removed.toDouble)
    val (rep, ins) = graft.fs.Layout.applyUpsertDeltas(spark, layoutPath,
      keyCol, zCols, buckets, numFiles)
    if (rep + ins > 0) {
      report += ("fold_deltas_replaced" -> rep.toDouble)
      report += ("fold_deltas_inserted" -> ins.toDouble)
    }
    val drift = graft.fs.Layout.layoutDrift(spark, layoutPath, sampleBy)
      .collect()
    drift.foreach(r =>
      report += (s"drift_${r.getString(1)}" -> r.getDouble(3)))
    val maxTv = drift.map(_.getDouble(3)).foldLeft(0.0)(math.max)
    // driver-side listing (one RPC class) — spark.read.parquet(...)
    // .inputFiles ran a partition-discovery JOB, twice per maintenance
    // run (the r15 verdict's driver-job-hygiene note)
    def fileCount(): Int =
      graft.fs.Layout.listedDataFilePaths(spark, layoutPath).size
    val filesBefore = fileCount()
    report += ("files_before" -> filesBefore.toDouble)
    if (maxTv >= reclusterAt) {
      graft.fs.Layout.reclusterLayout(spark, layoutPath, numFiles, sampleBy)
      graft.fs.Layout.writeLayoutIndexes(spark, layoutPath, zCols, keyCol,
        buckets)
      rebuildStandingQuantileIndexes(spark, layoutPath)
      report += ("reclustered" -> 1.0)
      graft.fs.Layout.layoutDrift(spark, layoutPath, sampleBy).collect()
        .foreach(r =>
          report += (s"drift_after_${r.getString(1)}" -> r.getDouble(3)))
      report += ("files_after" -> fileCount().toDouble)
    } else if (filesBefore > maxFiles) {
      val hasEpochs = {
        val rp = new org.apache.hadoop.fs.Path(layoutPath)
        val hfs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        hfs.listStatus(rp).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("batch="))
      }
      // with a tier threshold configured, the epoch shape tries the
      // INCREMENTAL fold first — cost ∝ the small tail, index catch-up
      // incremental; the full fold is the fallback when nothing small
      // enough remains to tier (so repeated maintenance stays cheap and
      // the whole-table rewrite happens only when genuinely due)
      val tiered =
        if (hasEpochs) tierBytes.map(b =>
          graft.fs.Layout.compactEpochsTiered(spark, layoutPath, b, numFiles))
          .getOrElse(Nil)
        else Nil
      if (tiered.nonEmpty) {
        graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
          keyCol, buckets, allowGone = true)
        refreshStandingQuantileIndexes(spark, layoutPath)
        report += ("tiered" -> tiered.size.toDouble)
        report += ("files_after" -> fileCount().toDouble)
      } else {
        val did =
          if (hasEpochs) {
            val (cols, bits, bounds, sbounds) =
              graft.fs.Layout.readLayoutMetaTyped(spark, layoutPath)
            // persist-through-the-fold: see compactZorderLayout — one
            // scan+keying execution instead of two (range-exchange sampling)
            var foldSrc: Option[DataFrame] = None
            try compactBatchArtifact(spark, layoutPath, { df =>
              val cached = df.persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              foldSrc = Some(cached)
              graft.fs.Layout.zorderKeyWithBoundsTyped(cached, cols, bits,
                bounds, sbounds)
                .repartitionByRange(numFiles, col("zkey"))
                .sortWithinPartitions(col("zkey"))
                .drop(graft.fs.Layout.zorderWorkCols(cols.size): _*)
            })
            finally foldSrc.foreach(_.unpersist(false))
          } else {
            graft.fs.Layout.compactLayout(spark, layoutPath, numFiles); true
          }
        if (did) {
          graft.fs.Layout.writeLayoutIndexes(spark, layoutPath, zCols, keyCol,
            buckets)
          rebuildStandingQuantileIndexes(spark, layoutPath)
          report += ("compacted" -> 1.0)
          report += ("files_after" -> fileCount().toDouble)
        }
      }
    }
    import spark.implicits._
    report.toSeq.toDF("action", "value")
    }
  }

  /** BM25-ARTIFACT MAINTENANCE — the [[maintainLayout]] analogue for the
    * retrieval index (the one call a deployment crons between stream
    * runs): (1) fold committed tombstone epochs physically
    * ([[applyBm25Tombstones]] — the newest epoch's stay logical, the
    * replay-safety split; its cross-epoch double-subtract precondition
    * REFUSES loudly rather than risking wrong stats — re-run after the
    * next epoch commits); (2) fold the postings/stats epochs past
    * `maxEpochs` ([[compactBm25Index]] — the exact stats algebra, serve
    * output pinned unchanged by q_stream_bm25_ret_compacted). Returns
    * the (action, value) decision receipt, the observability hook. */
  def maintainBm25Index(spark: SparkSession, outPath: String,
      maxEpochs: Int = 8): DataFrame =
      graft.fs.Layout.withWriterLease(spark, outPath,
        maintenanceHolder("maintainBm25Index")) {
    val report = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    if (applyBm25Tombstones(spark, outPath))
      report += ("tombstones_applied" -> 1.0)
    val epochs = epochIds(spark, s"$outPath/postings").size
    report += ("epochs_before" -> epochs.toDouble)
    if (epochs > maxEpochs && compactBm25Index(spark, outPath)) {
      report += ("compacted" -> 1.0)
      report += ("epochs_after" ->
        epochIds(spark, s"$outPath/postings").size.toDouble)
    }
    import spark.implicits._
    report.toSeq.toDF("action", "value")
  }

  /** IVF-ARTIFACT MAINTENANCE — monitor → decide → act for the ANN
    * index: (1) fold pending deletion epochs ([[applyIvfTombstones]]);
    * (2) measure [[graft.ops.Similarity.ivfDriftStats]] per assignment
    * epoch against the live corpus and RE-CENTER
    * ([[recenterIvfIndex]] — fresh centroids from the indexed corpus,
    * full reassignment) when the NEWEST epoch's mean member-to-centroid
    * cosine falls below `recenterBelow` (the drift receipt every row of
    * the report carries); (3) else fold assignment epochs past
    * `maxEpochs` ([[compactIvfIndex]] — identity fold, per-row shards).
    * The corpus must cover every indexed id (the recenter precondition
    * — refuses loudly otherwise). Returns the (action, value) receipt. */
  def maintainIvfIndex(spark: SparkSession, outPath: String,
      corpus: DataFrame, recenterBelow: Double = 0.0, maxEpochs: Int = 8,
      nLists: Int = 16, iters: Int = 0, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
      graft.fs.Layout.withWriterLease(spark, outPath,
        maintenanceHolder("maintainIvfIndex")) {
    val report = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    if (applyIvfTombstones(spark, outPath, idCol))
      report += ("tombstones_applied" -> 1.0)
    val drift = graft.ops.Similarity.ivfDriftStats(
      readIvfIndex(spark, outPath), corpus, idCol = idCol, embCol = embCol)
      .orderBy(col("batch").cast("long")).collect()
    def meanCos(r: org.apache.spark.sql.Row): Option[Double] = {
      val i = r.fieldIndex("mean_cos")
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    for (r <- drift; c <- meanCos(r))
      report += (s"mean_cos_epoch_${r.get(0)}" -> c)
    // an all-zero-norm epoch carries a null mean (the absence-is-a-
    // decision convention) — treat as healthy rather than recentering
    // on a vacuous signal
    val newestCos = drift.lastOption.flatMap(meanCos).getOrElse(1.0)
    val epochs = epochIds(spark, s"$outPath/assignments").size
    report += ("epochs_before" -> epochs.toDouble)
    if (newestCos < recenterBelow) {
      recenterIvfIndex(spark, outPath, corpus, nLists, iters, idCol, embCol)
      report += ("recentered" -> 1.0)
      val after = graft.ops.Similarity.ivfDriftStats(
        readIvfIndex(spark, outPath), corpus, idCol = idCol, embCol = embCol)
        .orderBy(col("batch").cast("long")).collect()
      for (r <- after.lastOption; c <- meanCos(r))
        report += ("mean_cos_after" -> c)
    } else if (epochs > maxEpochs && compactIvfIndex(spark, outPath)) {
      report += ("compacted" -> 1.0)
      report += ("epochs_after" ->
        epochIds(spark, s"$outPath/assignments").size.toDouble)
    }
    import spark.implicits._
    report.toSeq.toDF("action", "value")
  }

  /** TAKEDOWN FEED, MERGE-ON-READ — the O(feed) twin of
    * [[zorderDeleteStream]]: each micro-batch of keys lands as
    * tombstones ([[graft.fs.Layout.deleteLogical]] — one tiny
    * crash-safe sidecar swap, ZERO partition rewrites) and, unlike the
    * physical loop, the skipping indexes never go stale, so MoR reads
    * serve exactly THROUGHOUT the batch, not just between epochs.
    * Replay is idempotent by construction: already-tombstoned keys
    * re-append as a no-op (the sidecar is a distinct set). Run
    * [[graft.fs.Layout.applyTombstones]] on compaction cadence between
    * stream runs — the deletion-vector cadence: it folds physical,
    * keeps the standing set broadcast-sized, and re-arms the metadata
    * pushdowns. Choose this loop when takedowns are frequent and small
    * (the r15a economics: staging cost ∝ keys; the physical loop's ∝
    * victim partitions). */
  def zorderDeleteMorStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      layoutPath: String,
      checkpoint: String,
      keyCol: String,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.fs.Layout.withWriterLease(spark, layoutPath,
          s"zorderDeleteMorStream:$checkpoint") {
          // heal a crashed companion maintenance swap before touching
          // the table (the ingest-loop lesson); the sidecar's own swap
          // recovery runs inside deleteLogical
          graft.fs.Layout.recoverLayout(spark, layoutPath)
          graft.fs.Layout.deleteLogical(spark, layoutPath, batch, keyCol)
        }
        ()
      }
      .start()
  }

  /** CDC APPLY, MERGE-ON-READ — the O(feed) twin of
    * [[zorderUpsertStream]]: each key-distinct micro-batch STAGES its
    * replacement rows ([[graft.fs.Layout.upsertLogical]] — one tiny
    * sidecar swap, zero partition rewrites, measured ~23× cheaper per
    * batch than the physical loop at the spread-key worst case, SCALE.md
    * r15a) and MoR reads fold the latest staged version per key.
    * Replay is idempotent on the SERVED result: a replayed batch
    * re-stages the same rows under a fresh `__seq`, and latest-wins
    * picks identical values (only the last uncommitted batch can
    * replay, so no earlier version can be resurrected). Run
    * [[graft.fs.Layout.applyUpsertDeltas]] on compaction cadence
    * between stream runs — it folds latest-per-key through one physical
    * merge, keeps the delta set broadcast-sized, and re-arms the
    * metadata pushdowns. Batches must be key-distinct and null-key-free
    * ([[graft.fs.Layout.upsertLogical]] refuses both — collapse with
    * latest-per-key upstream, route keyless inserts through the ingest
    * loop). */
  def zorderUpsertMorStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      layoutPath: String,
      checkpoint: String,
      keyCol: String,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.fs.Layout.withWriterLease(spark, layoutPath,
          s"zorderUpsertMorStream:$checkpoint") {
          graft.fs.Layout.recoverLayout(spark, layoutPath)
          graft.fs.Layout.upsertLogical(spark, layoutPath, batch, keyCol)
        }
        ()
      }
      .start()
  }

  /** CDC APPLY for the Z-ordered layout — the streaming MERGE loop
    * completing the layout's streaming matrix (ingest, takedown, now
    * upsert): each micro-batch of key-distinct change rows goes through
    * [[graft.fs.Layout.upsertByKey]] — the batch lands as its own epoch
    * (frozen-bounds re-key), matched keys anti-join out of every older
    * partition, indexes catch up before the epoch commits. CDC epochs
    * land at `cdcEpochBase + batchId` — a RESERVED id space far above
    * any ingest epoch, because foreachBatch ids restart at 0 and a
    * collision with a data epoch would overwrite it; the fixed base
    * also makes replay idempotent (batch k always lands partition
    * base+k, the engine-wide overwrite recipe — a derived max+1 base
    * would drift across resumes and double-land). Latest-wins ACROSS
    * batches is structural: a later batch's keys are matched out of
    * earlier CDC epochs like any other partition. Same self-healing
    * head repair as the takedown feed. Each batch must be key-distinct
    * ([[graft.fs.Layout.upsertByKey]] refuses otherwise) — collapse
    * with latest-per-key upstream, the CDC recipe. */
  def zorderUpsertStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      layoutPath: String,
      checkpoint: String,
      zCols: Seq[String],
      keyCol: String,
      buckets: Int = 1 << 16,
      numFilesPerBatch: Int = 4,
      cdcEpochBase: Long = 1L << 40,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, layoutPath,
          s"zorderUpsertStream:$checkpoint") {
        recoverSwap(spark, graft.fs.Layout.manifestPath(layoutPath))
        recoverSwap(spark, graft.fs.Layout.valueIndexPath(layoutPath, keyCol))
        // data recovery BEFORE the head refresh (see zorderDeleteStream —
        // a refresh over a set-aside partition would drop its files)
        graft.fs.Layout.recoverLayout(spark, layoutPath)
        graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
          keyCol, buckets, allowGone = true)
        graft.fs.Layout.upsertByKey(spark, layoutPath, batch, keyCol, buckets,
          numFilesPerBatch, batchId = Some(cdcEpochBase + batchId))
        // commit unit: ONE shared scan of the changed files for both indexes
        graft.fs.Layout.refreshLayoutIndexes(spark, layoutPath, zCols,
          keyCol, buckets, allowGone = true)
        }
        ()
      }
      .start()
  }

  /** The ingestion loop RUN AS A STREAM: each micro-batch of newly-landed
    * documents is cleaned against the standing corpus of all EARLIER
    * batches' survivors with [[graft.ops.Dedup.dedupAgainst]] (digest
    * anti-join → within-batch collapse → cross-corpus simhash candidate
    * drop — the batch q_dedup_incremental operator, so semantics cannot
    * drift), and its survivors land as the `batch=<id>` partition of the
    * corpus — which IS the next batch's standing side. This is the shape
    * a 100 TB corpus actually grows by: nothing existing×existing ever
    * runs, each epoch pays one shard-vs-corpus pass, and the standing
    * side contributes only digest + fingerprint streams (materialized
    * columns of the corpus table in a real deployment).
    *
    * Unlike the index streams, the RESULT here depends on batch
    * membership and order (first-arrival-wins); the caller must stage
    * input files so delivery order is deterministic (the
    * q_stream_dedup_incremental fixture lands one file per doc_id-mod-4
    * shard with strictly increasing mtimes — the order the oracle
    * replays). Exactly-once: the `batch=<id>` overwrite plus the
    * `batch < batchId` standing filter make a replayed epoch idempotent —
    * it can neither see its own previous output nor double-land it. */
  def dedupIncrementalStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBlocks: Int = 4,
      maxBlockFreq: Option[Int] = Some(50),
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/docs"))
    val standingSchema = schema.add("batch", org.apache.spark.sql.types.LongType)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val standing = spark.read.schema(standingSchema).parquet(s"$outPath/docs")
          .where(col("batch") < lit(batchId)).drop("batch")
        graft.ops.Dedup
          .dedupAgainst(standing, batch, textCol, idCol, nBlocks, maxBlockFreq)
          .write.mode("overwrite").parquet(s"$outPath/docs/batch=$batchId")
        ()
      }
      .start()
  }

  /** INGESTION-TIME SPAN COVERAGE as a stream — the span family's
    * lifecycle column: each micro-batch of newly-landed documents is
    * scored window-by-window against the accumulated fingerprint BANK of
    * all earlier batches ([[graft.ops.Dedup.duplicateSpansAgainst]] — the
    * batch q_dup_spans_incremental operator, so semantics cannot drift),
    * then extends the bank with its own distinct window fps. Two
    * artifacts grow under `outPath`: `bank/batch=<id>` (distinct span
    * fps, 8 B/row — all the standing corpus ever contributes; text is
    * never re-read) and `coverage/batch=<id>` (that epoch's per-doc
    * report, arrival provenance in the partition column). At 100 TB this
    * is the admission-control shape: per epoch one shard-vs-bank
    * hash-only semi-join, bank growth bounded by distinct window count.
    *
    * Batch membership and order matter (a span is boilerplate only if an
    * EARLIER batch landed it; a batch that merely repeats itself scores
    * clean BY CONTRACT — duplicateSpansAgainst's rule), so fixtures pin
    * delivery order via mtime-staged shards exactly like
    * q_stream_dedup_incremental. Exactly-once: `batch=<id>` overwrites
    * plus the `batch < batchId` standing filter make a replayed epoch
    * rebuild the same coverage against the same earlier-batch bank. */
  def spanBankIngestStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      width: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/bank"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/coverage"))
    val bankSchema = new StructType()
      .add("span_fp", org.apache.spark.sql.types.LongType)
      .add("batch", org.apache.spark.sql.types.LongType)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bank = spark.read.schema(bankSchema).parquet(s"$outPath/bank")
          .where(col("batch") < lit(batchId)).drop("batch")
        graft.ops.Dedup
          .duplicateSpansAgainst(batch, bank, width, textCol, idCol)
          .write.mode("overwrite").parquet(s"$outPath/coverage/batch=$batchId")
        graft.ops.Dedup.spanFingerprintBank(batch, width, textCol, idCol)
          .write.mode("overwrite").parquet(s"$outPath/bank/batch=$batchId")
        ()
      }
      .start()
  }

  /** The accumulated span-fingerprint bank as ONE distinct-fps frame —
    * the serve-side read of the [[spanBankIngestStream]] artifact
    * ([[graft.ops.Dedup.duplicateSpansAgainst]]'s `standingFps` input).
    * Self-heals a crashed swap first, like every artifact reader. */
  def readSpanBank(spark: SparkSession, outPath: String): DataFrame = {
    recoverSwap(spark, s"$outPath/bank")
    spark.read.parquet(s"$outPath/bank")
      .select(col("span_fp")).distinct()
  }

  /** RETRACT documents from the span bank — the takedown path the r13
    * verdict named as the family's missing lifecycle cell: without it a
    * DMCA'd doc's fingerprints keep scoring later arrivals as boilerplate
    * forever. The feed carries the retracted docs' TEXT (a takedown
    * identifies its content; the 8 B/fp bank stores no doc attribution by
    * design), their window fps are re-derived once
    * ([[graft.ops.Dedup.spanFingerprintBank]] — the only text read), and
    * every bank partition anti-joins them away
    * ([[retractBatchArtifact]] keyed on span_fp — idempotent, crash-safe
    * swap, composes with [[compactSpanBank]] in either order).
    *
    * Semantics (what the q_stream_span_retracted oracle replays): the
    * surviving bank is exactly bank ∖ fps(retracted docs) — a SET minus.
    * That equals the rebuild over survivors iff no surviving doc shares a
    * verbatim width-w span with a retracted one (StreamingSpec pins the
    * equivalence on such a corpus); a shared span is dropped too, and
    * SELF-HEALS — the next arrival carrying it scores clean once and
    * re-lands the fp in its own batch's bank partition. For boilerplate
    * that bias (under-flag after a takedown) is the safe direction.
    *
    * Scale shape: the retraction frame is windows(takedown feed) — a few
    * thousand fps per takedown — broadcast into one anti-join pass over
    * the 8 B/fp bank; text of the standing corpus is never re-read. */
  def retractSpanBank(
      spark: SparkSession,
      outPath: String,
      retractedDocs: DataFrame,
      width: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val fps = graft.ops.Dedup
      .spanFingerprintBank(retractedDocs, width, textCol, idCol)
    retractBatchArtifact(spark, s"$outPath/bank", fps, "span_fp")
  }

  /** Compact the [[spanBankIngestStream]] bank: fold every committed
    * epoch except the newest into the oldest partition through
    * `distinct()` — the bank is consumed as a SET ([[readSpanBank]]
    * distincts; [[graft.ops.Dedup.duplicateSpansAgainst]] semi-joins), so
    * the distinct fold satisfies [[compactBatchArtifact]]'s
    * read(fold(parts)) ≡ read(parts) algebra trivially, and physically
    * removes the cross-epoch fp repeats that accrete whenever epochs
    * share boilerplate. The newest epoch stays verbatim (the replayable
    * one); the per-epoch `batch < id` standing read keeps working because
    * folded fps keep the OLDEST partition's id — strictly earlier than
    * any future epoch. Run between stream runs, like every compactor. */
  def compactSpanBank(spark: SparkSession, outPath: String): Boolean =
    compactBatchArtifact(spark, s"$outPath/bank", _.distinct())

  // ------------------------------------------------------------ compaction
  // The streaming builders above accrete one `batch=<id>` partition per
  // micro-batch forever — correct, but partition/file counts decay read
  // performance over months of epochs. Compaction merge-folds all COMMITTED
  // partials into the artifact's oldest partition and rewrites the
  // directory atomically; the newest partition is deliberately left alone
  // because it is the only epoch foreachBatch may ever REPLAY (at-least-
  // once: a batch whose write landed but whose epoch didn't commit re-runs
  // on restart and overwrites its own `batch=<id>` path — folding it away
  // would turn that idempotent overwrite into silent double-counting).
  // Run between stream runs (the builders' file listings must not race the
  // swap); the checkpoint is untouched, so the stream resumes at the next
  // epoch id and keeps appending — StreamingSpec pins resume-after-
  // compaction end-to-end, q_bm25_topk_compacted pins compacted ≡
  // uncompacted serve output under the oracle.

  /** Self-heal a directory whose last swap crashed mid-rename: dst missing
    * but the set-aside `_old` copy intact ⇒ restore it. PUBLIC entry points
    * that read or rewrite a swapped artifact dir call this FIRST — the
    * recovery branch inside [[swapDir]] alone is unreachable when the
    * caller (e.g. [[compactBatchArtifact]]'s `spark.read.parquet(dir)`, or
    * any read* helper) touches the missing dst before the swap runs. */
  private[streaming] def recoverSwap(spark: SparkSession, dirPath: String): Unit =
    graft.fs.AtomicDir.recoverSwap(spark, dirPath)

  /** Crash-safe directory swap ([[graft.fs.AtomicDir.swapDir]] — the
    * [[start]] snapshot recipe, shared with the layout-index refreshes):
    * write the replacement via `write(tmpPath)`, move the old dir aside,
    * move tmp in, drop old — a crash between renames leaves dst or
    * dst_old intact, and [[recoverSwap]] (run there AND by every public
    * entry point that touches the dir, where the crash actually
    * surfaces) restores dst. */
  private def swapDir(spark: SparkSession, dirPath: String)(write: String => Unit): Unit =
    graft.fs.AtomicDir.swapDir(spark, dirPath)(write)

  /** Compact a `batch=<id>`-partitioned artifact directory: fold every
    * partition EXCEPT the newest through `fold` (identity for
    * concatenation-shaped artifacts — postings, IVF assignments; the
    * exact merge for sketch artifacts) into the OLDEST partition's id,
    * keep the newest verbatim, swap atomically. The target id must be an
    * already-committed epoch's (any id < the newest qualifies; the oldest
    * is used) so a replayed last epoch can never overwrite the compacted
    * mass. No-op (returns false) with fewer than 3 partitions — with 2,
    * the non-newest side is a single partition and there is nothing to
    * fold. Correctness relies on the artifact's merge algebra: fold must
    * satisfy read(fold(parts)) ≡ read(parts), which every artifact here
    * proves via its *_merged / sharded oracle query. */
  def compactBatchArtifact(spark: SparkSession, dir: String,
      fold: DataFrame => DataFrame = identity): Boolean = {
    recoverSwap(spark, dir)
    val df = spark.read.parquet(dir)
    val ids = df.select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (ids.length < 3) return false
    val newest = ids.last
    val target = ids.head
    val compacted = fold(df.where(col("batch") =!= newest).drop("batch"))
    val latest = df.where(col("batch") === newest).drop("batch")
    // both plans read `dir` — they execute inside the write step, BEFORE
    // the swap replaces it
    swapDir(spark, dir) { tmp =>
      compacted.write.mode("overwrite").parquet(s"$tmp/batch=$target")
      latest.write.mode("overwrite").parquet(s"$tmp/batch=$newest")
    }
    true
  }

  /** Compact the [[buildBm25IndexStream]] artifact: postings concatenate
    * (per-(doc, token) rows — identity fold), stats fold by the
    * [[graft.ops.TextAnalysis.bm25IndexMerge]] exact-integer-sum algebra
    * (n = Σnᵢ, sdl = Σsdlᵢ, avgdl re-derived — bit-identical to the
    * monolithic build, which is why compacted serve output cannot move). */
  def compactBm25Index(spark: SparkSession, outPath: String): Boolean = {
    recoverSwap(spark, outPath) // root swap: retractBm25Artifact
    val p = compactBatchArtifact(spark, s"$outPath/postings")
    val st = compactBatchArtifact(spark, s"$outPath/stats", d => d
      .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
      .select(col("n"), when(col("n") > 0,
        col("sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"),
        col("sdl")))
    p || st
  }

  /** Compact the [[buildIvfIndexStream]] assignment shards (per-row, no
    * cross-row terms — identity fold; centroids are one fixed table). */
  def compactIvfIndex(spark: SparkSession, outPath: String): Boolean = {
    recoverSwap(spark, outPath) // root swap: applyIvfTombstones
    compactBatchArtifact(spark, s"$outPath/assignments")
  }

  /** RETRACT ids from a `batch=<id>`-partitioned PER-ROW artifact — IVF
    * assignment shards, MinHash signature/docs partitions, anything whose
    * rows carry no cross-row sums: one anti-join preserving the batch
    * column, one crash-safe swap. Because nothing is subtracted, the
    * operation is IDEMPOTENT (re-applying a deletion batch is a no-op) —
    * the property the BM25 artifact, whose stats row carries exact sums,
    * fundamentally cannot have ([[retractBm25Artifact]]'s exactly-once
    * contract). Composes with [[compactBatchArtifact]] in either order. */
  def retractBatchArtifact(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String): Unit = {
    recoverSwap(spark, dir)
    val d = ids.select(col(idCol)).distinct()
    val src = spark.read.parquet(dir)
    val kept = src.join(broadcast(d), Seq(idCol), "left_anti")
      .select(src.columns.map(col).toIndexedSeq: _*)
    swapDir(spark, dir)(tmp =>
      kept.write.partitionBy("batch").mode("overwrite").parquet(tmp))
  }

  /** [[retractBatchArtifact]] over the [[buildIvfIndexStream]] assignment
    * shards — the streamed-artifact form of
    * [[graft.ops.Similarity.ivfRetract]] (per-epoch `ivfAssign(shard ∖ D)`
    * exactly, since assignment is per-row; centroids stay fixed). */
  def retractIvfArtifact(spark: SparkSession, outPath: String,
      vecIds: DataFrame, idCol: String = "vec_id"): Unit = {
    recoverSwap(spark, outPath) // root swap: applyIvfTombstones
    retractBatchArtifact(spark, s"$outPath/assignments", vecIds, idCol)
  }

  /** Compact a retract-loop corpus artifact
    * ([[minhashIngestRetractStream]] / [[dedupIngestRetractStream]] —
    * `docs` + optional `sigs` + `dels` under one root), PHYSICALLY
    * applying the tombstones it folds: every committed epoch except the
    * newest merges into the oldest partition with all APPLICABLE
    * tombstones (del.batch > doc.batch) anti-joined away, and the
    * applied tombstone partitions are dropped — the LSM merge step that
    * keeps delete markers from accumulating forever. The newest epoch of
    * every subtree is kept verbatim (the only foreachBatch-replayable
    * one — the [[compactBatchArtifact]] argument), and all three
    * subtrees move under ONE crash-safe swap of the artifact ROOT.
    *
    * Correctness: a tombstone at epoch t applies to docs with arrival
    * batch < t, so every tombstone OLDER than the newest epoch is fully
    * applied by the fold (nothing it names can arrive later than it in
    * the folded mass). Folded docs take the oldest batch id; the
    * newest epoch's tombstones (kept verbatim) still apply to them at
    * read time because newest > oldest — [[readRetractedCorpus]] output
    * is INVARIANT under this compaction (oracle-pinned by
    * q_stream_minhash_ret_compacted). Run between stream runs; the
    * resumed stream's `batch < batchId` / `batch <= batchId` standing
    * filters see the folded mass at the oldest id, all of which is
    * < any fresh epoch. No-op (false) with fewer than 3 doc epochs. */
  def compactRetractedCorpus(spark: SparkSession, outPath: String,
      idCol: String = "doc_id"): Boolean = {
    recoverSwap(spark, outPath)
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val docEpochs = epochIds(spark, s"$outPath/docs")
    if (docEpochs.length < 3) return false
    val newest = docEpochs.last
    val target = docEpochs.head
    val hasSigs = fs.exists(new org.apache.hadoop.fs.Path(s"$outPath/sigs"))
    val dels = spark.read.parquet(s"$outPath/dels")
      .select(col(idCol).as("__del_id"), col("batch").cast("long").as("__del_batch"))
    // tombstones OLDER than the newest epoch are fully applied by the fold
    val oldDels = dels.where(col("__del_batch") < lit(newest))
    def foldWithDels(sub: String): (DataFrame, DataFrame) = {
      val df = spark.read.parquet(s"$outPath/$sub")
      val folded = df.where(col("batch") =!= newest)
        .join(oldDels,
          df(idCol) === col("__del_id") && col("__del_batch") > df("batch"),
          "left_anti")
        .drop("batch")
      (folded, df.where(col("batch") === newest).drop("batch"))
    }
    val (docsFolded, docsNewest) = foldWithDels("docs")
    val sigs = if (hasSigs) Some(foldWithDels("sigs")) else None
    val newestDels = spark.read.parquet(s"$outPath/dels")
      .where(col("batch").cast("long") === newest).drop("batch")
    swapDir(spark, outPath) { tmp =>
      docsFolded.write.mode("overwrite").parquet(s"$tmp/docs/batch=$target")
      docsNewest.write.mode("overwrite").parquet(s"$tmp/docs/batch=$newest")
      sigs.foreach { case (f, n) =>
        f.write.mode("overwrite").parquet(s"$tmp/sigs/batch=$target")
        n.write.mode("overwrite").parquet(s"$tmp/sigs/batch=$newest")
      }
      // applied tombstones drop; the newest epoch's (replayable) survive —
      // an empty write still creates the dels subtree readers expect
      newestDels.write.mode("overwrite").parquet(s"$tmp/dels/batch=$newest")
      ()
    }
    true
  }

  /** RETRACT a document set from the `batch=<id>`-partitioned STREAMED
    * BM25 artifact in place — [[graft.ops.TextAnalysis.bm25IndexRetract]]
    * applied per epoch, so the artifact keeps its partition layout (the
    * stream resumes appending on top; [[compactBm25Index]] folds as
    * usual) and each partition stays exactly `bm25Index(epoch docs ∖ D)`:
    *
    *   - postings are per-(doc, token) rows — the global anti-join drops
    *     exactly the deleted docs' rows from whichever epoch holds them;
    *   - each epoch's stats row subtracts ITS OWN deleted docs' exact
    *     integer sums (nᵢ −= |D ∩ docsᵢ|, sdlᵢ −= Σ their tf), grouped
    *     from the pre-retraction postings — algebraically identical to
    *     running bm25IndexRetract(epochᵢ, D ∩ docsᵢ) for every i, since
    *     epochs partition the corpus. The merged read then equals
    *     build(W ∖ D) by the bm25IndexMerge sum algebra.
    *
    * PRECONDITION (stricter than the monolithic retract's): every id in
    * `docIds` must own at least one postings row — a doc's EPOCH is only
    * discoverable through its postings, so a null/empty-text doc (counted
    * in some epoch's n but owning no rows) cannot be attributed and would
    * silently skew that epoch's stats. Violations throw rather than
    * half-apply. Exactly-once per deletion batch is the caller's duty
    * (the bm25IndexRetract contract); postings and stats are rewritten
    * under ONE crash-safe swap of the artifact ROOT (both tables replaced
    * atomically — a two-swap version would leave a crash window where
    * postings are retracted but stats are not, unrecoverable because the
    * removed tf mass is only derivable from the pre-retraction postings).
    * Run between stream runs, like compaction.
    *
    * On a dels-bearing artifact ([[buildBm25IndexRetractStream]]'s) the
    * tombstone subtree is carried through the swap VERBATIM — an earlier
    * version silently dropped it, after which [[readBm25IndexRetracted]]
    * threw on the missing path (or a restarted stream recreated it empty
    * and served deleted docs resurfaced). `docIds` must then be DISJOINT
    * from the standing tombstone ids (enforced — throws): a tombstoned id
    * retracted physically here would be subtracted a second time when the
    * carried-through logical tombstone is applied at serve; physical
    * application of existing tombstones is [[applyBm25Tombstones]]'s job. */
  def retractBm25Artifact(spark: SparkSession, outPath: String,
      docIds: DataFrame, idCol: String = "doc_id"): Unit = {
    recoverSwap(spark, outPath)
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delsPath = new org.apache.hadoop.fs.Path(s"$outPath/dels")
    // a dels dir with no batch= child yet (stream created it, no epoch
    // landed) has no schema to infer — treat as absent
    val dels = if (fs.exists(delsPath) &&
        fs.listStatus(delsPath).exists(_.getPath.getName.startsWith("batch=")))
      Some(spark.read.parquet(s"$outPath/dels")) else None
    dels.foreach { d =>
      val overlap = d.select(col(idCol))
        .join(broadcast(docIds.select(col(idCol)).distinct()), Seq(idCol), "left_semi")
        .limit(1).count()
      require(overlap == 0L,
        "bm25 artifact retraction: docIds overlap standing tombstones — the " +
          "carried-through logical tombstone would double-subtract stats at " +
          "serve; apply existing tombstones with applyBm25Tombstones instead")
    }
    val (newPostings, newStats) = bm25RetractPlans(spark, outPath, docIds, idCol)
    // all writes execute inside swapDir against the still-intact old dirs
    // (tmp is fully written before any rename), then ONE atomic swap
    swapDir(spark, outPath) { tmp =>
      newPostings.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/postings")
      newStats.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/stats")
      dels.foreach(_.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/dels"))
    }
  }

  /** The per-epoch exact-subtraction plans shared by [[retractBm25Artifact]]
    * and [[applyBm25Tombstones]]: (retracted postings, retracted stats),
    * both still `batch`-columned. Throws if any deletion id owns no
    * postings row (unattributable to an epoch). Callers execute the plans
    * inside their [[swapDir]] write, against the still-intact old dirs. */
  private def bm25RetractPlans(spark: SparkSession, outPath: String,
      docIds: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val ids = docIds.select(col(idCol)).distinct()
    val postings = spark.read.parquet(s"$outPath/postings")
    val nIds = ids.count()
    // ONE pass over the postings for both the attribution check and the
    // per-epoch removed mass (they used to be two separate scans): a
    // ROLLUP over batch gives the per-epoch (distinct ids, Σ tf) rows AND
    // the grand-total row whose countDistinct is the global found-id
    // count — the exact check the separate distinct().count() ran. The
    // result is ≤ epochs+1 rows, collected once and re-served as a
    // literal frame so neither consumer re-scans the postings.
    val rolled = postings.join(broadcast(ids), Seq(idCol), "left_semi")
      .rollup(col("batch"))
      .agg(countDistinct(col(idCol)).as("__rn"), sum(col("tf")).as("__rsdl"))
    val rolledRows = rolled.collect()
    val found = rolledRows.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(0L)
    require(found == nIds,
      s"bm25 artifact retraction: $found of $nIds deletion ids own postings rows — " +
        "ids without postings (null/empty text or unknown) cannot be attributed to an epoch")
    // per-epoch removed mass, from the index alone (Σ tf over a doc's rows = its dl)
    val removed = spark.createDataFrame(
      java.util.Arrays.asList(rolledRows.filter(!_.isNullAt(0)): _*),
      rolled.schema)
    val newStats = spark.read.parquet(s"$outPath/stats")
      .join(removed, Seq("batch"), "left")
      .select(col("batch"),
        (col("n") - coalesce(col("__rn"), lit(0L))).as("n"),
        (col("sdl") - coalesce(col("__rsdl"), lit(0L))).as("sdl"))
      .select(col("batch"), col("n"), when(col("n") > 0,
        col("sdl").cast("double") / col("n").cast("double")).otherwise(lit(0d)).as("avgdl"),
        col("sdl"))
    val newPostings = postings.join(broadcast(ids), Seq(idCol), "left_anti")
      .select(col("token"), col(idCol), col("tf"), col("dl"), col("batch"))
    (newPostings, newStats)
  }

  /** Epoch ids of a `batch=<id>`-partitioned dir, from DIRECTORY names —
    * row-level distincts miss empty partitions (delete-only epochs). */
  private def epochIds(spark: SparkSession, dirPath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dirPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).sorted
  }

  /** Compact the [[buildKmvSketchStream]] artifact: m partials per group
    * fold to ONE ≤ k-hash sketch ([[graft.ops.Sketches.kmvMerge]] — the
    * overlap-tolerant exact merge, so even a replay-duplicated partial in
    * the compacted mass cannot perturb the estimate). */
  def compactKmvSketch(spark: SparkSession, outPath: String, groupCol: String,
      k: Int = 16): Boolean =
    compactBatchArtifact(spark, outPath,
      d => graft.ops.Sketches.kmvMerge(d, groupCol, k))

  /** Compact the [[buildQuantileSketchStream]] artifact
    * ([[graft.ops.Sketches.quantileMerge]] — same overlap-tolerant
    * algebra over (pri, v) pairs). */
  def compactQuantileSketch(spark: SparkSession, outPath: String, groupCol: String,
      k: Int = 16): Boolean =
    compactBatchArtifact(spark, outPath,
      d => graft.ops.Sketches.quantileMerge(d, groupCol, k))

  /** The MinHash (Jaccard-criterion) twin of [[dedupIncrementalStream]],
    * closing the artifact-maintenance half of the incremental story: each
    * micro-batch of newly-landed documents is cleaned against the STANDING
    * SIGNATURE ARTIFACT of all earlier batches' survivors with
    * [[graft.ops.Dedup.minhashAgainst]] (digest anti-join → within-batch
    * collapse → band-bucket candidate drop, existing-side hot-bucket cap —
    * the batch q_minhash_incremental operator, so semantics cannot drift),
    * and then APPENDS the survivors' own signatures
    * ([[graft.ops.Dedup.minhashSignatures]]) as the `batch=<id>` partition
    * of the artifact — which IS the next batch's standing side. The
    * standing corpus is never re-read as text: per-epoch cost is
    * shard-size × standing-SIGNATURE-size, the bound that holds at
    * 100 TB (signatures are ~260 B/doc regardless of doc length).
    *
    * Survivor docs land under `outPath/docs/batch=<id>`; signatures under
    * `outPath/sigs/batch=<id>`. Signatures are computed from the LANDED
    * docs partition (one cheap re-read) rather than the survivor frame's
    * lineage — recomputing through the whole minhashAgainst plan would
    * re-run the dedup per write. Exactly-once: both partitions are
    * `batch=<id>` overwrites and the standing filter is `batch < batchId`,
    * so a replayed epoch can neither see its own previous output nor
    * double-land it (the [[dedupIncrementalStream]] recipe). Result
    * depends on delivery order (first-arrival-wins) — stage input files
    * with deterministic mtimes, as q_stream_minhash_incremental's fixture
    * does. `shingleK`/`numHashes`/`portableHash` must match across the
    * stream's lifetime (the artifact-analyzer contract of
    * [[graft.ops.Dedup.minhashAgainst]]). */
  def minhashIncrementalStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = Some(50),
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/sigs"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/docs"))
    val idType = schema(idCol).dataType
    val sigSchema = new StructType()
      .add(idCol, idType).add("dg", org.apache.spark.sql.types.LongType)
      .add("sig", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      .add("batch", org.apache.spark.sql.types.LongType)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val standing = spark.read.schema(sigSchema).parquet(s"$outPath/sigs")
          .where(col("batch") < lit(batchId)).drop("batch")
        graft.ops.Dedup
          .minhashAgainst(standing, batch, textCol, idCol, shingleK,
            numHashes, bands, threshold, portableHash, maxBucketFreq)
          .write.mode("overwrite").parquet(s"$outPath/docs/batch=$batchId")
        graft.ops.Dedup
          .minhashSignatures(spark.read.parquet(s"$outPath/docs/batch=$batchId"),
            textCol, idCol, shingleK, numHashes, portableHash)
          .write.mode("overwrite").parquet(s"$outPath/sigs/batch=$batchId")
        ()
      }
      .start()
  }

  /** [[minhashIncrementalStream]] with a DELETION FEED interleaved — the
    * streaming retraction path: the stream carries BOTH inserts and
    * takedowns (an `opCol` marks each row `"ins"` or `"del"`; delete rows
    * need only `idCol`), so a takedown arriving mid-stream no longer waits
    * for stop → batch retract → resume. Per micro-batch:
    *
    *   1. the batch's deletion ids land as `outPath/dels/batch=<id>` —
    *      an append-only TOMBSTONE partition (the LSM delete-marker
    *      shape: physical removal is compaction's job, the standing-side
    *      view applies markers logically);
    *   2. the standing signature artifact is retracted by every
    *      tombstone so far (batch ≤ this one — this batch's deletes
    *      apply BEFORE its inserts are cleaned, the within-batch
    *      delete-first convention) under the SAME later-tombstone rule
    *      the serving read uses (a tombstone kills only signatures that
    *      arrived before it — an id-only [[graft.ops.Dedup
    *      .minhashSignaturesRetract]] would also blind the loop to a
    *      same-id reinsert the read still serves) — so a near-dup of a
    *      deleted doc arriving later now SURVIVES, and an exact copy
    *      re-enters: the dedup decisions themselves see the retraction,
    *      not just the serving read;
    *   3. the batch's inserts are cleaned against the retracted standing
    *      ([[graft.ops.Dedup.minhashAgainst]] — unchanged) and land as
    *      `docs/batch=<id>` + `sigs/batch=<id>` exactly as in the
    *      insert-only loop.
    *
    * Exactly-once: all three writes are `batch=<id>` overwrites and both
    * standing filters are batch-id-bounded; retraction here is pure
    * anti-join (signature rows carry no cross-row sums — unlike BM25
    * stats), so a replayed epoch re-applies every step idempotently.
    * Deletions target docs from EARLIER batches (a delete and its doc's
    * insert in the SAME batch is out of contract). Read survivors with
    * [[readRetractedCorpus]]: a doc is out iff a tombstone with a LATER
    * batch id names it — delete-then-reinsert keeps the reinsert. */
  def minhashIngestRetractStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      opCol: String = "op",
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      portableHash: Boolean = false,
      maxBucketFreq: Option[Int] = Some(50),
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    recoverSwap(spark, outPath) // root swap: compactRetractedCorpus
    for (sub <- Seq("sigs", "docs", "dels"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/$sub"))
    val idType = schema(idCol).dataType
    val sigSchema = new StructType()
      .add(idCol, idType).add("dg", org.apache.spark.sql.types.LongType)
      .add("sig", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      .add("batch", org.apache.spark.sql.types.LongType)
    val delSchema = new StructType()
      .add(idCol, idType).add("batch", org.apache.spark.sql.types.LongType)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.where(col(opCol) === lit("del")).select(col(idCol))
          .write.mode("overwrite").parquet(s"$outPath/dels/batch=$batchId")
        // ORDERING-AWARE retraction — the same later-tombstone rule the
        // serving read uses: a tombstone kills only signatures that
        // arrived BEFORE it, so a same-id delete-then-reinsert keeps the
        // reinserted doc's signature standing (an id-only anti-join left
        // the live reinsert invisible to later dedup decisions while
        // readRetractedCorpus still served it — duplicate texts)
        val dels = spark.read.schema(delSchema).parquet(s"$outPath/dels")
          .where(col("batch") <= lit(batchId))
          .select(col(idCol).as("__del_id"), col("batch").as("__del_batch"))
        val sigsStanding = spark.read.schema(sigSchema).parquet(s"$outPath/sigs")
          .where(col("batch") < lit(batchId))
        val standing = sigsStanding
          .join(broadcast(dels),
            sigsStanding(idCol) === col("__del_id") &&
              col("__del_batch") > sigsStanding("batch"),
            "left_anti")
          .drop("batch")
        graft.ops.Dedup
          .minhashAgainst(standing,
            batch.where(col(opCol) === lit("ins")).drop(opCol),
            textCol, idCol, shingleK, numHashes, bands, threshold,
            portableHash, maxBucketFreq)
          .write.mode("overwrite").parquet(s"$outPath/docs/batch=$batchId")
        graft.ops.Dedup
          .minhashSignatures(spark.read.parquet(s"$outPath/docs/batch=$batchId"),
            textCol, idCol, shingleK, numHashes, portableHash)
          .write.mode("overwrite").parquet(s"$outPath/sigs/batch=$batchId")
        ()
      }
      .start()
  }

  /** The surviving corpus of a [[minhashIngestRetractStream]] /
    * [[dedupIngestRetractStream]] run (both land `docs/batch=<id>` +
    * `dels/batch=<id>`): landed survivors minus docs a LATER tombstone
    * names (a tombstone applies to docs that arrived before it; a
    * reinsert after a delete survives). Output carries the arrival
    * `batch` column. */
  def readRetractedCorpus(spark: SparkSession, outPath: String,
      idCol: String = "doc_id"): DataFrame = {
    recoverSwap(spark, outPath) // root swap: compactRetractedCorpus
    val docs = spark.read.parquet(s"$outPath/docs")
    val dels = spark.read.parquet(s"$outPath/dels")
      .select(col(idCol).as("__del_id"), col("batch").as("__del_batch"))
    docs.join(dels,
        docs(idCol) === col("__del_id") && col("__del_batch") > docs("batch"),
        "left_anti")
  }

  /** [[dedupIncrementalStream]] with a DELETION FEED interleaved — the
    * Hamming-criterion twin of [[minhashIngestRetractStream]], completing
    * streaming retraction for BOTH ingestion loops: the stream carries
    * inserts and takedowns (`opCol` ∈ {"ins", "del"}); each micro-batch
    * lands its deletion ids as an append-only `dels/batch=<id>` tombstone
    * partition, then cleans its inserts with
    * [[graft.ops.Dedup.dedupAgainst]] against the standing survivors
    * MINUS all tombstones so far (batch ≤ this one — delete-first within
    * a batch). The standing side here is the docs table itself (this
    * loop's artifact IS the corpus), so retraction is one anti-join
    * before the dedup — a deleted doc stops blocking both the exact
    * digest stage and the simhash block-candidate stage, and an exact
    * copy of it re-enters. Exactly-once by the same argument as the
    * MinHash twin: every write is a `batch=<id>` overwrite and every
    * standing filter is batch-id-bounded; all retraction steps are pure
    * anti-joins. Read survivors with [[readRetractedCorpus]]. */
  def dedupIngestRetractStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      opCol: String = "op",
      textCol: String = "text",
      idCol: String = "doc_id",
      nBlocks: Int = 4,
      maxBlockFreq: Option[Int] = Some(50),
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    recoverSwap(spark, outPath) // root swap: compactRetractedCorpus
    for (sub <- Seq("docs", "dels"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/$sub"))
    val docSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == opCol))
    val standingSchema = docSchema.add("batch", org.apache.spark.sql.types.LongType)
    val delSchema = new StructType()
      .add(idCol, schema(idCol).dataType).add("batch", org.apache.spark.sql.types.LongType)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.where(col(opCol) === lit("del")).select(col(idCol))
          .write.mode("overwrite").parquet(s"$outPath/dels/batch=$batchId")
        // ordering-aware retraction — see minhashIngestRetractStream: an
        // id-only anti-join would drop a reinserted doc's standing row
        val dels = spark.read.schema(delSchema).parquet(s"$outPath/dels")
          .where(col("batch") <= lit(batchId))
          .select(col(idCol).as("__del_id"), col("batch").as("__del_batch"))
        val docsStanding = spark.read.schema(standingSchema).parquet(s"$outPath/docs")
          .where(col("batch") < lit(batchId))
        val standing = docsStanding
          .join(broadcast(dels),
            docsStanding(idCol) === col("__del_id") &&
              col("__del_batch") > docsStanding("batch"),
            "left_anti")
          .drop("batch")
        graft.ops.Dedup
          .dedupAgainst(standing,
            batch.where(col(opCol) === lit("ins")).drop(opCol),
            textCol, idCol, nBlocks, maxBlockFreq)
          .write.mode("overwrite").parquet(s"$outPath/docs/batch=$batchId")
        ()
      }
      .start()
  }

  /** [[buildBm25IndexStream]] with a DELETION FEED interleaved — streaming
    * retraction for the INDEX-builder family: insert rows build their
    * epoch's partial index exactly as before; delete rows land as
    * append-only `dels/batch=<id>` tombstone partitions (idempotent
    * overwrite — nothing in the standing artifact is mutated, so there is
    * no double-subtraction hazard at all, unlike physical retraction).
    * Serving applies the tombstones logically at read time
    * ([[readBm25IndexRetracted]] — the monolithic
    * [[graft.ops.TextAnalysis.bm25IndexRetract]] over the merged
    * artifact); physical removal is [[applyBm25Tombstones]]'s job between
    * stream runs (it alone knows to keep the replayable newest epoch's
    * tombstones logical and to drop the applied ones) — compose with
    * [[compactBm25Index]] afterwards to fold partitions. Tombstones must
    * name docs already delivered to the index (deletion requests reference
    * corpus members — a delete racing ahead of its doc's insert is out
    * of contract, same as the batch retract's precondition). SEMANTICS
    * NOTE: this family's tombstones are id-based and ORDERING-BLIND — a
    * delete-then-reinsert of the same id stays deleted at serve
    * (takedowns on an index are absolute), unlike the corpus loops
    * ([[minhashIngestRetractStream]]/[[dedupIngestRetractStream]]) whose
    * later-tombstone rule lets a reinsert survive. */
  def buildBm25IndexRetractStream(
      spark: SparkSession,
      inputPath: String,
      schema: StructType,
      outPath: String,
      checkpoint: String,
      opCol: String = "op",
      textCol: String = "text",
      idCol: String = "doc_id",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    // self-heal BEFORE creating subdirectories: retractBm25Artifact /
    // applyBm25Tombstones root-swap outPath, and a crash between their
    // renames leaves outPath missing with outPath_old intact — if
    // createDirectories recreated outPath first, recoverSwap's
    // !exists(dst) guard could never fire again and the committed
    // postings/stats in _old would be silently lost (the checkpoint
    // prevents re-delivery)
    recoverSwap(spark, outPath)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$outPath/dels"))
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fs.Layout.withWriterLease(spark, outPath,
          s"bm25IndexRetractStream:$checkpoint") {
        batch.where(col(opCol) === lit("del")).select(col(idCol))
          .write.mode("overwrite").parquet(s"$outPath/dels/batch=$batchId")
        // ONE tokenize pass per epoch (the [[buildBm25IndexStream]] recipe,
        // including its rejected-Observation note — the separate count is
        // cheaper than a CollectMetrics barrier in the tokenize pipeline)
        val ins = batch.where(col(opCol) === lit("ins")).drop(opCol)
        val ix = graft.ops.TextAnalysis.bm25Index(ins, textCol, idCol)
        ix.postings.write.mode("overwrite").parquet(s"$outPath/postings/batch=$batchId")
        graft.ops.TextAnalysis.bm25StatsFromPostings(
          spark.read.parquet(s"$outPath/postings/batch=$batchId"), ins.count())
          .write.mode("overwrite").parquet(s"$outPath/stats/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Serve the [[buildBm25IndexRetractStream]] artifact: merge-fold the
    * partial indexes ([[readBm25Index]]) and apply ALL tombstones via the
    * exact monolithic retract — duplicates across tombstone partitions
    * collapse (the retract distincts its ids), so re-deleting is safe. */
  def readBm25IndexRetracted(spark: SparkSession, outPath: String,
      idCol: String = "doc_id"): graft.ops.TextAnalysis.Bm25Index =
    graft.ops.TextAnalysis.bm25IndexRetract(
      readBm25Index(spark, outPath),
      spark.read.parquet(s"$outPath/dels").select(col(idCol)),
      idCol)

  /** PHYSICALLY apply the [[buildBm25IndexRetractStream]] tombstones from
    * every COMMITTED epoch (batch < the newest index epoch) and drop
    * those tombstone partitions — the bm25 twin of
    * [[compactRetractedCorpus]]'s LSM merge, closing the logical →
    * physical → dropped lifecycle for the index family. The newest
    * epoch's tombstones stay LOGICAL (applied by
    * [[readBm25IndexRetracted]] at serve time): that epoch is the only
    * foreachBatch-replayable one, and because the stats subtraction is
    * NOT idempotent, a replay re-landing tombstones whose mass had
    * already been subtracted would double-count — keeping them logical
    * keeps the replay harmless (tombstone overwrite + unchanged
    * artifact). Postings, stats, AND the pruned dels move under ONE
    * atomic root swap; serve output is invariant
    * (q_stream_bm25_ret_compacted pins it). Ids without postings rows
    * (e.g. a tombstone racing its doc — out of contract for the stream)
    * throw, as in [[retractBm25Artifact]]. PRECONDITION (enforced — one
    * broadcast semi-join, throws on violation): no id appears in BOTH a
    * committed and the newest tombstone epoch — once the committed copy
    * is applied physically, the still-logical duplicate would subtract
    * the doc's stats a second time at serve (the bm25IndexRetract
    * non-idempotence; duplicate ids WITHIN the committed epochs, or
    * within the newest, collapse fine — a silent failure before r13,
    * since the postings anti-join no-ops on the second application). Run
    * between stream runs; compose with [[compactBm25Index]] afterwards
    * to fold partitions. */
  def applyBm25Tombstones(spark: SparkSession, outPath: String,
      idCol: String = "doc_id"): Boolean = {
    recoverSwap(spark, outPath)
    val newest = epochIds(spark, s"$outPath/postings").lastOption.getOrElse(return false)
    val delsAll = spark.read.parquet(s"$outPath/dels")
    val oldIds = delsAll.where(col("batch").cast("long") < newest).select(col(idCol))
    if (oldIds.isEmpty) return false
    val crossEpoch = delsAll.where(col("batch").cast("long") === newest)
      .select(col(idCol))
      .join(broadcast(oldIds.distinct()), Seq(idCol), "left_semi")
      .limit(1).count()
    require(crossEpoch == 0L,
      "bm25 tombstone apply: an id appears in both a committed and the newest " +
        "tombstone epoch — its committed copy applied physically here plus the " +
        "still-logical newest copy at serve would double-subtract stats; wait " +
        "for the next epoch to commit (or drop the duplicate) before applying")
    val (newPostings, newStats) = bm25RetractPlans(spark, outPath, oldIds, idCol)
    val newestDels = delsAll.where(col("batch").cast("long") === newest).drop("batch")
    swapDir(spark, outPath) { tmp =>
      newPostings.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/postings")
      newStats.write.partitionBy("batch").mode("overwrite").parquet(s"$tmp/stats")
      newestDels.write.mode("overwrite").parquet(s"$tmp/dels/batch=$newest")
    }
    true
  }

  /** A feature observation keyed by entity; `id` is the deterministic
    * tie-break for equal timestamps (mirrors the batch path's
    * latestSnapshot(ts, tieBreak) argmax so the two maintenance paths
    * can never disagree on the served value). */
  final case class Obs(key: String, ts: java.sql.Timestamp, value: Double, id: Long)

  /** Stateful latest-per-key maintenance with `flatMapGroupsWithState`:
    * per-key state holds the current latest observation; a micro-batch
    * emits a row only when the key's latest actually advances — a
    * change-data stream of online-store updates (vs [[start]]'s snapshot
    * rewrite, this scales state with #keys and output with #changes).
    * "Latest" is argmax by (ts, id), identical to the batch snapshot.
    * State is fault-tolerant via the state store + checkpoint; a real
    * deployment adds a GroupStateTimeout to expire idle entities (TTL).
    * NOTE: the state encoding is [[Obs]]'s schema — changing Obs breaks
    * resumption from checkpoints written by an older schema (the state
    * store rejects incompatible encoders; restart with a fresh checkpoint). */
  def latestPerKeyStream(
      observations: org.apache.spark.sql.Dataset[Obs]
  ): org.apache.spark.sql.Dataset[Obs] = {
    import observations.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def later(a: Obs, b: Obs): Boolean = {
      val c = b.ts.compareTo(a.ts)
      c > 0 || (c == 0 && b.id > a.id)
    }
    observations
      .groupByKey(_.key)
      .flatMapGroupsWithState[Obs, Obs](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Obs], state: GroupState[Obs]) =>
          val incoming = rows.reduceOption((a, b) => if (later(a, b)) b else a)
          incoming match {
            case Some(newest) =>
              val advanced = state.getOption.forall(cur => later(cur, newest))
              if (advanced) {
                state.update(newest)
                Iterator.single(newest)
              } else Iterator.empty
            case None => Iterator.empty
          }
      }
  }
}
