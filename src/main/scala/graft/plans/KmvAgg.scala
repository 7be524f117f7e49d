package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer: the k smallest DISTINCT longs seen so
  * far, kept sorted ascending in a fixed k-capacity array. This is the
  * whole KMV sketch state — 8·k bytes, never corpus-sized. */
final class KmvBuffer(val k: Int) {
  val arr: Array[Long] = new Array[Long](k)
  var n: Int = 0

  /** Insert `h` iff it belongs among the k smallest distinct values.
    * Binary search + shift — k is sketch-sized (16 by default), so the
    * shift is a handful of words, not a data-path cost. */
  def add(h: Long): Unit = {
    if (n == k && h >= arr(n - 1)) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && arr(lo) == h) return // distinct-set semantics
    val last = if (n == k) k - 1 else n
    var i = last
    while (i > lo) { arr(i) = arr(i - 1); i -= 1 }
    arr(lo) = h
    if (n < k) n += 1
  }
}

/** `graft_kmv(h bigint, k int literal) → array<bigint>` — the k smallest
  * DISTINCT hash values of the group, sorted ascending: the partial
  * K-Minimum-Values cardinality sketch ([[graft.ops.Sketches.kmvSketch]])
  * as a bounded-buffer aggregate.
  *
  * Why a custom aggregate: the HOF formulation
  * (`slice(array_sort(collect_set(h)), 1, k)`) buffers EVERY distinct hash
  * of the group before truncating — on a high-cardinality column that is a
  * group-sized array in one agg buffer, exactly the structure a sketch
  * exists to avoid. This buffer is 8·k bytes regardless of group size,
  * partial aggregation applies (merge is the same bounded insert), and the
  * shuffle carries ≤ k longs per (partition, group).
  *
  * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) — every one of the k smallest
  * values of a union is among the k smallest of its own side — so partial
  * buffers merge EXACTLY and the result is bit-identical to the HOF form
  * (FallbackSpec pins this). NULL inputs carry no cardinality and are
  * skipped, the collect_set convention. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"graft_kmv needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a bigint hash column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.n) { a.add(b.arr(i)); i += 1 }
    a
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.arr, buffer.n))

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buffer.n)
    bb.putInt(buffer.k)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}
