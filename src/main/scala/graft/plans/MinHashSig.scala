package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  extends UnaryExpression {

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

  // one reference-object call, not CodegenFallback — keeps the enclosing
  // stage inside whole-stage codegen (see graft.plans.SimHash64Expr)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhash", this)
      s"${ev.value} = $ref.compute($c);"
    })

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")

    def absorb(sh: UTF8String): Unit = {
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashUTF8String(sh, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
    }

    if (n < shingleK) {
      val parts = Array.tabulate(n)(i => toks.getUTF8String(i))
      absorb(UTF8String.concatWs(sep, parts: _*))
    } else {
      var i = 0
      val parts = new Array[UTF8String](shingleK)
      while (i <= n - shingleK) {
        var j = 0
        while (j < shingleK) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        absorb(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
