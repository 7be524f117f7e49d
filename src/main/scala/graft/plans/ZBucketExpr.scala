package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_zbucket(v double, bounds array<double> literal) → int` — the
  * layout's strictly-below quantile bucket: COUNT of boundaries b with
  * v > b over the build's frozen NONDECREASING boundary array, as one
  * O(log 2^bits) binary search.
  *
  * Why a custom expression: the `when(v > lit(b), 1)` chain evaluates
  * 2^bits−1 comparisons PER ROW and compiles a 2^bits−1-term codegen
  * tree PER OPERATION (the residual zh write-path overhead in SCALE.md
  * r17a after the aggregate side moved to graft_hist) — the hot keying
  * path of every Z-ordered write/append/compact runs it for every row
  * and column. The search is bit-identical to the chain: Spark compares
  * doubles through [[org.apache.spark.sql.catalyst.util.SQLOrderingUtil
  * .compareDoubles]] (−0.0 = 0.0, NaN greatest), which is a total order
  * consistent with the boundary array's sortedness, so lower-bound(v) =
  * #{b : b < v} = #{b : v > b}. NULL input takes bucket 0 (the chain's
  * `otherwise(0)` fold — nulls-first convention); NaN lands past every
  * finite boundary (the chain's every-term-true), FallbackSpec-pinned.
  */
case class ZBucketExpr(
    child: Expression,
    bounds: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zbucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_zbucket requires a double value column, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else ZBucketExpr.search(bounds, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("zbounds", bounds, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        ${ev.value} = graft.plans.ZBucketExpr.search($b, ${c.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ZBucketExpr =
    copy(child = newChild)

  // case-class equality over an Array field degrades to reference
  // identity, defeating plan canonicalization / common-subexpression
  // elimination / exchange reuse for two semantically identical bucket
  // expressions (r17 ADVICE) — compare the boundary CONTENTS
  override def equals(o: Any): Boolean = o match {
    case z: ZBucketExpr =>
      child == z.child && java.util.Arrays.equals(bounds, z.bounds)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bounds)
}

object ZBucketExpr {
  /** #{b : b < v} under Spark's double ordering (SQLOrderingUtil:
    * −0.0 = 0.0, NaN greater than everything) over a nondecreasing
    * array — the strictly-below bucket. */
  def search(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(bounds(mid), v) < 0) lo = mid + 1
      else hi = mid
    }
    lo
  }
}

/** [[ZBucketExpr]] over STRING cut boundaries — binary UTF-8 comparison
  * ([[UTF8String.compareTo]]), exactly the chain's `v > lit(cut)`
  * collation; same null→0 convention, same lower-bound identity (cut
  * arrays are nondecreasing by construction — rank order). */
case class ZBucketStrExpr(
    child: Expression,
    bounds: Array[UTF8String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zbucket_str"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_zbucket_str requires a string value column, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else ZBucketStrExpr.search(bounds, v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("zcuts", bounds,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        ${ev.value} = graft.plans.ZBucketStrExpr.search($b, ${c.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ZBucketStrExpr =
    copy(child = newChild)

  // content equality over the cut array — see [[ZBucketExpr.equals]]
  override def equals(o: Any): Boolean = o match {
    case z: ZBucketStrExpr =>
      child == z.child &&
        java.util.Arrays.equals(bounds.asInstanceOf[Array[AnyRef]],
          z.bounds.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.hashCode(bounds.asInstanceOf[Array[AnyRef]])
}

object ZBucketStrExpr {
  /** #{cut : cut < v} in binary UTF-8 order over a nondecreasing array. */
  def search(bounds: Array[UTF8String], v: UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(v) < 0) lo = mid + 1
      else hi = mid
    }
    lo
  }
}
