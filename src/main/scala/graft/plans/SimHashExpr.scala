package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(tokens array<string>) → string` — native SimHash
  * fingerprint, bit-identical to the portable HOF formulation
  * ([[graft.ops.Dedup.simhash]]) so the two are interchangeable under specs
  * and snapshots.
  *
  * The HOF form pays a brutal per-token price: `bin()` renders each token
  * hash as a 64-char string, `lpad`+`split` explode it into 64 one-char
  * strings, and a `zip_with` walks them through interpreted HOF machinery —
  * thousands of small allocations per document. This expression takes the
  * same distinct-token xxhash64 (seed 42, the SQL function's default) and
  * counts bit votes with shifts in a tight loop, then renders the
  * fingerprint exactly like `conv(bits, 2, 16)` does (unsigned uppercase
  * hex, no leading zeros, "0" for zero).
  */
case class SimHashExpr(child: Expression)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "simhash"

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // array_distinct semantics: only the first occurrence votes
      if (t != null && seen.add(t)) {
        val h = XXH64.hashUTF8String(t, 42L)
        var p = 0
        while (p < 64) {
          // position 0 = the most significant bit, matching bin()'s render
          if (((h >>> (63 - p)) & 1L) == 1L) votes(p) += 1 else votes(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 64) {
      fp = (fp << 1) | (if (votes(p) > 0) 1L else 0L)
      p += 1
    }
    // conv(…, 2, 16) render: unsigned, uppercase, no leading zeros
    UTF8String.fromString(java.lang.Long.toHexString(fp).toUpperCase)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
