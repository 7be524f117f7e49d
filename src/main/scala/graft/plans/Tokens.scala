package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_tokens(text string) → array<string>` — the whitespace tokenizer
  * as a single byte-scan expression.
  *
  * The HOF formulation (`filter(split(text, " "), length > 0)`) pays a
  * regex `split` plus interpreted higher-order `filter` machinery per row,
  * and — because HigherOrderFunctions are CodegenFallback — pushes every
  * projection that tokenizes out of whole-stage codegen. This expression
  * scans the UTF-8 bytes once for 0x20 (a space byte never occurs inside a
  * multi-byte UTF-8 sequence, so byte scanning is code-point-safe) and
  * emits non-copying slices of one materialized byte array.
  *
  * Semantics exactly mirror the HOF form (spec-enforced): ONLY the single
  * space character separates (tabs/newlines are token bytes, as with
  * `split(text, " ")`); runs of spaces and leading/trailing spaces produce
  * no empty tokens; empty input → empty array; null → null.
  */
case class TokensExpr(child: Expression)
  extends UnaryExpression with ComputeRefCodegen {

  override protected def refName: String = "tokens"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires a string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}
