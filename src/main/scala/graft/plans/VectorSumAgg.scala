package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_vec_sum(vec array<float|double>) → array<double>` — element-wise
  * vector-sum aggregate for embedding math (k-means centroid refinement,
  * group centroids for cluster-level similarity).
  *
  * Same custom-Catalyst shape as [[MinHashUnionAgg]] (SURVEY §4's reserved
  * surface): a `TypedImperativeAggregate[Array[Double]]` whose buffer is one
  * 8·dim-byte vector; update/merge are associative+commutative element adds,
  * so partial aggregation applies and the shuffle carries ONE vector per
  * (partition, group) instead of every member row — the difference between
  * shuffling 8·dim·groups bytes and 8·dim·rows bytes at 100 TB.
  *
  * Null handling: null input vectors are skipped; null elements contribute 0
  * (mirrors the portable posexplode fallback, where explode drops null
  * arrays and SQL sum ignores nulls). Width mismatches throw — silently
  * zero-padding would corrupt centroids.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires array<float|double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.isEmpty) new Array[Double](n) else buffer
    require(buf.length == n, s"vector width mismatch: buffer ${buf.length} vs input $n")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        buf(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, "vector width mismatch in merge")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    Array.fill(n)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}
