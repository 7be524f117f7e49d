package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_grams(tokens array<string>, k) → array<long>` — the DISTINCT
  * xxhash64 digests of a document's word k-shingles in one pass.
  *
  * The composable pipeline (`shinglesOf` HOF → `array_distinct` →
  * `xxhash64` per exploded row) materializes every shingle string,
  * deduplicates them by full string comparison, and only then hashes.
  * This expression builds each shingle once (`UTF8String.concatWs`, no
  * JVM-String copies), hashes it immediately (XXH64 seed 42 — exactly the
  * SQL `xxhash64` of the same shingle string, so digests stay
  * interchangeable with the composed form), and deduplicates the 8-byte
  * digests instead of the strings. Output order is first-occurrence, which
  * downstream set-semantics consumers (explode → join/aggregate) ignore.
  *
  * Shingle semantics mirror [[graft.ops.Dedup.shinglesOf]]: fewer than k
  * tokens → one shingle of the whole token list.
  */
case class GramDigests(child: Expression, shingleK: Int)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "gramDigests"

  require(shingleK > 0, "shingleK must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_grams requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): ArrayData = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    ShingleWalk.foreach(toks, shingleK) { sh =>
      seen.add(XXH64.hashUTF8String(sh, 42L)); ()
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramDigests =
    copy(child = newChild)
}
