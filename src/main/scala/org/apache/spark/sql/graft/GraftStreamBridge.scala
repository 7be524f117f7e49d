package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Connector bridge — the same `org.apache.spark.sql.*` subpackage seam
  * Spark's own external connectors use (the Kafka connector lives in
  * `org.apache.spark.sql.kafka010` for exactly this reason) to reach
  * the one `private[sql]` constructor a V1 streaming Source cannot do
  * without: `MicroBatchExecution` asserts that `Source.getBatch`'s
  * result has `isStreaming = true`, and no public API sets that flag on
  * a batch-constructed DataFrame. This object contains ONLY that
  * marker conversion; everything else in the engine stays on public
  * API. */
object GraftStreamBridge {

  /** Re-wrap a batch DataFrame as a streaming-flagged one with the
    * given schema — the `internalCreateDataFrame(..., isStreaming =
    * true)` recipe V1 sources have always used (the row RDD is the
    * batch plan's execution, planned lazily per micro-batch). */
  def asStreaming(df: DataFrame, schema: StructType): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** Release the storage blocks behind a CHECKPOINTED Dataset — the
    * `LogicalRDD` seam (`private[sql]`, hence this bridge): a Dataset
    * returned by `checkpoint()`/`localCheckpoint()` wraps the
    * materialized RDD directly, and `Dataset.unpersist` cannot reach it
    * (the blocks belong to the RDD, not the CacheManager). Iterative
    * loops that checkpoint per round (connected components) otherwise
    * leak one round's blocks per iteration until the ContextCleaner's
    * next GC-driven sweep — deterministic release keeps the storage
    * pool flat. MUST only be called once nothing will read the Dataset
    * again: a locally-checkpointed RDD has no lineage to recompute
    * from. No-op on a non-checkpoint Dataset. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  /** A streaming-flagged frame that raises `message` at EXECUTION, not
    * construction. The V1 `getBatch` contract requires reproducing
    * already-committed ranges "or at least not failing" — the runtime
    * re-CONSTRUCTS them on recovery and discards the result — so a
    * source refusal (expired pins, rewrite-class commit in range) must
    * be deferred to execution: a recovery re-read sails through, a
    * batch that would actually serve bad data still dies loudly. */
  def failingStreaming(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, message: String): DataFrame = {
    val rdd = spark.sparkContext.parallelize(Seq(0), 1)
      .mapPartitions[org.apache.spark.sql.catalyst.InternalRow](_ =>
        throw new IllegalStateException(message))
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
  }
}

/** A Scan serving a single pre-computed row driver-side — what a
  * manifest-answered aggregate becomes ([[GraftMetaScanBuilder]]);
  * Spark plans a [[LocalScan]] as a LocalTableScan, zero tasks. */
final class GraftMetaLocalScan(override val readSchema: StructType,
    values: Seq[Any]) extends LocalScan {
  override def rows(): Array[InternalRow] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(readSchema)
    Array(conv(org.apache.spark.sql.Row.fromSeq(values))
      .asInstanceOf[InternalRow])
  }
  override def description(): String =
    s"GraftMetaLocalScan${readSchema.fieldNames.mkString("[", ", ", "]")}"
}

/** The aggregate-interception seam of the graft DSv2 table: forwards
  * every pushdown to Spark's own [[ParquetScanBuilder]] (column
  * pruning, catalyst data filters, footer aggregates), EXCEPT that a
  * no-filter no-group-by COUNT(*)/MIN/MAX the layout manifest can
  * answer becomes a COMPLETE pushdown served from one sidecar read
  * (`answer` — provided by the caller so the manifest logic stays in
  * the engine package): one driver row instead of one footer RPC per
  * file. Any untranslatable shape, pushed data filter, or stale
  * manifest delegates — the stock path is exact, just footer-priced.
  * Lives in this `org.apache.spark.sql.*` bridge package because the
  * filter seam ([[SupportsPushDownCatalystFilters]]) is `private[sql]`
  * — the same subpackage pattern as the streaming marker above. */
final class GraftMetaScanBuilder(inner: ParquetScanBuilder,
    answer: Aggregation => Option[(StructType, Seq[Any])])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates {

  private var metaResult: Option[(StructType, Seq[Any])] = None
  private var anyDataFilter = false

  // supportCompletePushDown and pushAggregation both consult — one
  // manifest read per planned aggregation, not two
  private var answered: Option[(Aggregation, Option[(StructType, Seq[Any])])] =
    None
  private def answerOnce(agg: Aggregation): Option[(StructType, Seq[Any])] =
    answered match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = answer(agg)
        answered = Some((agg, r))
        r
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val residual = inner.pushFilters(filters)
    anyDataFilter = anyDataFilter || filters.nonEmpty
    residual
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    (!anyDataFilter && answerOnce(agg).isDefined) ||
      inner.supportCompletePushDown(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!anyDataFilter) {
      metaResult = answerOnce(agg)
      if (metaResult.isDefined) return true
    }
    inner.pushAggregation(agg)
  }

  override def build(): Scan = metaResult match {
    case Some((schema, values)) => new GraftMetaLocalScan(schema, values)
    case None => inner.build()
  }
}
