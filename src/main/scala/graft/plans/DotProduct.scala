package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(array<float|double>, array<float|double>) → double` — a native
  * codegen'd dot product for the embedding hot paths.
  *
  * Why a custom Expression (the one place built-ins genuinely fall short):
  * the composable form `aggregate(zip_with(a, b, ...), 0.0D, ...)` is a
  * higher-order-function chain — interpreted per row, allocating an
  * intermediate array per evaluated pair. In the quadratic part of
  * near-dup/ANN scoring that allocation dominates. This expression compiles
  * to a tight primitive loop over `ArrayData` inside whole-stage codegen.
  *
  * Semantics exactly mirror the HOF form so the two are interchangeable
  * under the DuckDB oracles: accumulation in ascending index order over
  * doubles (bit-identical results), null array / length mismatch / null
  * element → null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val getL =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ($getL) * ($getR);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering [[DotProduct]] as SQL function `graft_dot`.
  * Enable with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`;
  * `Similarity` falls back to the HOF formulation in sessions without it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // rewrite the portable tokenizer idiom to the native byte scan in any
    // query, not just the engine's own session-aware call sites
    ext.injectOptimizerRule(_ => TokenizeRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSig(
        children(0),
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_union"),
      new ExpressionInfo(classOf[MinHashUnionAgg].getName, "graft_minhash_union"),
      (children: Seq[Expression]) =>
        MinHashUnionAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_grams"),
      new ExpressionInfo(classOf[GramDigests].getName, "graft_grams"),
      (children: Seq[Expression]) => GramDigests(
        children(0), children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokensExpr].getName, "graft_tokens"),
      (children: Seq[Expression]) => TokensExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_poly"),
      new ExpressionInfo(classOf[Poly64MinHash].getName, "graft_minhash_poly"),
      (children: Seq[Expression]) => Poly64MinHash(
        children(0),
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("graft_span_fps"),
      new ExpressionInfo(classOf[Poly64SpanFps].getName, "graft_span_fps"),
      (children: Seq[Expression]) => Poly64SpanFps(
        children(0),
        children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VectorSumAgg].getName, "graft_vec_sum"),
      (children: Seq[Expression]) =>
        VectorSumAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (children: Seq[Expression]) => {
        // graft_kmv is USER-visible SQL surface: malformed calls must die
        // as a clean analysis error, not an IndexOutOfBounds (missing k)
        // or an NPE (non-literal k evaluated at resolution time)
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "`graft_kmv`",
              "expectedNum" -> "2", "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val kExpr = children(1)
        if (!kExpr.foldable || kExpr.eval() == null ||
            !kExpr.eval().isInstanceOf[Number])
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map("funcName" -> "`graft_kmv`",
              "paramName" -> "`k`", "paramType" -> "\"INT\""))
        KmvAgg(children.head, kExpr.eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hist"),
      new ExpressionInfo(classOf[HistAgg].getName, "graft_hist"),
      (children: Seq[Expression]) => {
        // user-visible SQL surface: the graft_kmv analysis-error hygiene
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "`graft_hist`",
              "expectedNum" -> "2", "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val nbExpr = children(1)
        if (!nbExpr.foldable || nbExpr.eval() == null ||
            !nbExpr.eval().isInstanceOf[Number])
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map("funcName" -> "`graft_hist`",
              "paramName" -> "`nb`", "paramType" -> "\"INT\""))
        HistAgg(children.head, nbExpr.eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zbucket"),
      new ExpressionInfo(classOf[ZBucketExpr].getName, "graft_zbucket"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "`graft_zbucket`",
              "expectedNum" -> "2", "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val bExpr = children(1)
        if (!bExpr.foldable || bExpr.eval() == null ||
            !bExpr.eval().isInstanceOf[ArrayData])
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map("funcName" -> "`graft_zbucket`",
              "paramName" -> "`bounds`", "paramType" -> "\"ARRAY<DOUBLE>\""))
        ZBucketExpr(children.head,
          bExpr.eval().asInstanceOf[ArrayData].toDoubleArray())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zbucket_str"),
      new ExpressionInfo(classOf[ZBucketStrExpr].getName, "graft_zbucket_str"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "`graft_zbucket_str`",
              "expectedNum" -> "2", "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        val bExpr = children(1)
        if (!bExpr.foldable || bExpr.eval() == null ||
            !bExpr.eval().isInstanceOf[ArrayData])
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map("funcName" -> "`graft_zbucket_str`",
              "paramName" -> "`cuts`", "paramType" -> "\"ARRAY<STRING>\""))
        ZBucketStrExpr(children.head,
          bExpr.eval().asInstanceOf[ArrayData]
            .toArray[org.apache.spark.unsafe.types.UTF8String](
              org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_assign"),
      new ExpressionInfo(classOf[PqAssignExpr].getName, "graft_pq_assign"),
      (children: Seq[Expression]) => {
        val ad = children(1).eval().asInstanceOf[ArrayData]
        val books = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray)
        PqAssignExpr(children(0), books,
          children(2).eval().asInstanceOf[Number].intValue(),
          children(3).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[PqLutExpr].getName, "graft_pq_lut"),
      (children: Seq[Expression]) => {
        val ad = children(1).eval().asInstanceOf[ArrayData]
        val books = Array.tabulate(ad.numElements()) { m =>
          val bm = ad.getArray(m)
          Array.tabulate(bm.numElements())(k => bm.getArray(k).toDoubleArray)
        }
        PqLutExpr(children(0), books,
          children(2).eval().asInstanceOf[Number].intValue())
      }))
  }
}
