package graft.plans

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Codegen for per-row expressions whose loop isn't worth generating:
  * emit ONE call to the concrete class's public `compute` on a reference
  * object. That keeps the enclosing stage inside whole-stage codegen —
  * `CodegenFallback` would kick the entire stage out — while the loop
  * stays ordinary JVM code. The implementor declares
  * `def compute(in: <InputType>): <OutputType>`; the generated assignment
  * resolves against the concrete class (addReferenceObj types the
  * reference by its runtime class), so no boxing or casts appear here. */
trait ComputeRefCodegen { self: UnaryExpression =>

  /** Stable name for the generated reference field. */
  protected def refName: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj(refName, this)
      s"${ev.value} = $ref.compute($c);"
    })
}

/** The shared word-k-shingle walk — the cross-engine contract the native
  * MinHash/gram expressions and the DuckDB oracles all mirror: fewer than
  * k tokens → ONE shingle of the whole (space-joined) token list, else
  * every k-window joined by a single space, in order, duplicates kept
  * (consumers dedup if they need to). One definition so the semantics
  * cannot drift between expressions. */
private[plans] object ShingleWalk {
  private val Sep = UTF8String.fromString(" ")

  def foreach(toks: ArrayData, k: Int)(absorb: UTF8String => Unit): Unit = {
    val n = toks.numElements()
    if (n < k) {
      val parts = Array.tabulate(n)(i => toks.getUTF8String(i))
      absorb(UTF8String.concatWs(Sep, parts: _*))
    } else {
      var i = 0
      val parts = new Array[UTF8String](k)
      while (i <= n - k) {
        var j = 0
        while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        absorb(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
    }
  }
}
