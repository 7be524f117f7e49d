package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Dense occupancy-histogram buffer: one 8·nb-byte counter array. */
final class HistBuffer(val nb: Int) {
  val cnt: Array[Long] = new Array[Long](nb)
}

/** `graft_hist(bucket int/bigint, nb int literal) → array<bigint>` — the
  * dense occupancy histogram of a bounded integer column: `out[b] =
  * COUNT(bucket = b)` for b in [0, nb), as ONE aggregate expression.
  *
  * Why a custom aggregate: the expression formulation — nb separate
  * `sum(when(bucket = b, 1))` aggregates per histogram — costs nb
  * comparisons PER ROW and adds nb aggregate expressions to the plan
  * (128 extra at the manifest's bits=6 × 2 Z columns — the measured
  * ~0.5–0.8 s zh delta per manifest build in SCALE.md r17a). This buffer
  * is one fixed array, update is one bounds-checked increment, partial
  * aggregation applies (merge = element-wise add — exact integer sums, so
  * the result is BIT-IDENTICAL to the sum(when) chain under any
  * regrouping; LayoutSpec pins the equality). NULL buckets are skipped
  * (the count convention); out-of-range buckets are skipped too — the
  * manifest's strictly-below fold emits [0, nb−1] by construction, and
  * skipping a foreign value beats corrupting a neighbor's count. */
case class HistAgg(
    child: Expression,
    nb: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuffer] {

  require(nb >= 1 && nb <= (1 << 16),
    s"graft_hist needs nb in [1, 65536], got $nb")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hist requires an int/bigint bucket column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): HistBuffer = new HistBuffer(nb)

  override def update(buffer: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Number].longValue
      if (b >= 0L && b < buffer.nb) buffer.cnt(b.toInt) += 1L
    }
    buffer
  }

  override def merge(a: HistBuffer, b: HistBuffer): HistBuffer = {
    var i = 0
    while (i < a.nb) { a.cnt(i) += b.cnt(i); i += 1 }
    a
  }

  override def eval(buffer: HistBuffer): Any =
    new GenericArrayData(buffer.cnt.clone())

  override def serialize(buffer: HistBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.nb)
    bb.putInt(buffer.nb)
    var i = 0
    while (i < buffer.nb) { bb.putLong(buffer.cnt(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HistBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new HistBuffer(bb.getInt())
    var i = 0
    while (i < buf.nb) { buf.cnt(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistAgg =
    copy(child = newChildren.head)
}
