package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash(tokens array<string>, k, numHashes) → array<long>` —
  * one-pass MinHash signature over word k-shingles.
  *
  * The composable form (`aggregate` over a shingle array with a `zip_with`
  * of per-seed hashes) walks Catalyst's interpreted HOF machinery per
  * element and allocates two intermediate arrays per shingle. This
  * expression builds each shingle once (`UTF8String.concatWs`, no copy of
  * the token bytes into JVM strings) and folds all `numHashes` seeded
  * XXH64 values into one running-minimum array — zero intermediate
  * allocation in the loop.
  *
  * Shingle semantics mirror `Dedup.shinglesOf`: fewer than k tokens → one
  * shingle of the whole token list (empty token list → the empty string).
  * Duplicate shingles need no dedup — duplicates cannot change a minimum.
  * Seeds are 0..numHashes-1 (values differ from the HOF formulation's
  * xxhash64(x, seed) chain; signatures are engine-internal, only agreement
  * RATES are observable, so the two formulations are interchangeable).
  */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "minhash"

  require(shingleK > 0 && numHashes > 0, "shingleK and numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(toks: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    ShingleWalk.foreach(toks, shingleK) { sh =>
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashUTF8String(sh, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
