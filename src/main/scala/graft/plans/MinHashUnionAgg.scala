package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_minhash_union(sig array<long>) → array<long>` — aggregate that
  * unions per-row MinHash signatures into the signature of the group's
  * UNION of shingle sets (elementwise minimum; min over a union is the min
  * of the mins, so this is exact, not an approximation of the sketch).
  *
  * The sketch-aggregate shape SURVEY §4 reserved custom Catalyst surface
  * for: a `TypedImperativeAggregate[Array[Long]]` with an 8·N-byte buffer,
  * associative+commutative merge → partial aggregation applies, the shuffle
  * carries one small signature per (partition, group). Enables group-vs-
  * group set similarity (e.g. content overlap between sources) without
  * ever materializing the underlying shingle sets.
  */
case class MinHashUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_union requires array<long> signatures, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.isEmpty) Array.fill(n)(Long.MaxValue) else buffer
    require(buf.length == n,
      s"signature width mismatch: buffer ${buf.length} vs input $n")
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, "signature width mismatch in merge")
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    Array.fill(n)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = newChildren.head)
}
