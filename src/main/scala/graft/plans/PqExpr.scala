package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_pq_assign(emb array<float|double>, books array<array<double>>,
  * offset, width) → int` — the product-quantization sub-space assignment:
  * argmax over codes k of `emb[offset..offset+width)·books[k] − ‖books[k]‖²/2`
  * (the monotone rewrite of min-L2), ties → higher code id.
  *
  * Why a native expression (the one place the built-ins genuinely fall
  * short): the composable form is `array_max` over nCodes inline
  * (score, id) structs — at the production codebook size K=256 that single
  * projection exceeds Janino's method limit, so the whole stage falls out
  * of whole-stage codegen AND the 256-way CreateArray re-evaluates its
  * window dot per struct. Here the codebook rides as a reference object
  * and the scan is two primitive loops; [[ComputeRefCodegen]] keeps the
  * enclosing stage inside WSCG.
  *
  * Parity contract with the HOF form (FallbackSpec pins it): window dots
  * accumulate in ascending index order from 0.0 (bit-identical doubles);
  * ties → higher code id (`array_max` struct order, -0.0 ties 0.0); a
  * vector too short for the window, or with a null element inside it,
  * scores every code null in the HOF form — whose `array_max` then yields
  * the HIGHEST code id — mirrored here exactly. Callers null off-dim
  * vectors out BEFORE this expression; the rule only exists so both forms
  * stay total and identical. */
case class PqAssignExpr(child: Expression, books: Array[Array[Double]],
    offset: Int, width: Int)
  extends UnaryExpression with ComputeRefCodegen {
  require(books.nonEmpty && books.forall(_.length == width),
    s"graft_pq_assign: need non-empty codebook of width-$width centroids")
  require(offset >= 0 && width > 0, "graft_pq_assign: offset/width must be positive")

  private val halfN2: Array[Double] = books.map(c => c.map(x => x * x).sum / 2.0)

  override protected def refName: String = "pqAssign"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pq_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_assign requires array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(emb: ArrayData): Int = {
    val nCodes = books.length
    if (emb.numElements() < offset + width) return nCodes - 1
    val x = new Array[Double](width)
    var j = 0
    while (j < width) {
      if (emb.isNullAt(offset + j)) return nCodes - 1
      x(j) = if (isFloat) emb.getFloat(offset + j).toDouble
             else emb.getDouble(offset + j)
      j += 1
    }
    var best = 0.0
    var bestK = -1
    var k = 0
    while (k < nCodes) {
      val c = books(k)
      var s = 0.0
      var i = 0
      while (i < width) { s += x(i) * c(i); i += 1 }
      s -= halfN2(k)
      // Spark double ordering: NaN sorts greatest; ties → later (higher) k
      val takes = bestK < 0 ||
        (if (java.lang.Double.isNaN(s)) true
         else if (java.lang.Double.isNaN(best)) false
         else s >= best)
      if (takes) { best = s; bestK = k }
      k += 1
    }
    bestK
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignExpr =
    copy(child = newChild)
}

/** `graft_pq_lut(emb array<float|double>, books array<array<array<double>>>,
  * width) → array<array<double>>` — every ADC lookup table of a probe in
  * one call: `out[m][k] = emb[m·width..(m+1)·width) · books[m][k]`.
  *
  * The composable form is nSub × nCodes inline slice-dots — the same
  * Janino blowup as the assignment at K=256, on the probe projection.
  * Here it is three primitive loops sharing one window buffer.
  *
  * HOF parity: each dot accumulates in ascending index order; a window
  * that runs past the vector's end, or contains a null element, yields
  * null for that window's whole row of dots (the slice-dot's
  * length-mismatch/null-element → null rule). */
case class PqLutExpr(child: Expression, books: Array[Array[Array[Double]]],
    width: Int)
  extends UnaryExpression with ComputeRefCodegen {
  require(books.nonEmpty && books.forall(b => b.nonEmpty && b.forall(_.length == width)),
    s"graft_pq_lut: need non-empty width-$width codebooks")

  override protected def refName: String = "pqLut"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut requires array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(emb: ArrayData): ArrayData = {
    val nSub = books.length
    val out = new Array[ArrayData](nSub)
    val x = new Array[Double](width)
    var m = 0
    while (m < nSub) {
      val off = m * width
      val nCodes = books(m).length
      var bad = emb.numElements() < off + width
      if (!bad) {
        var j = 0
        while (j < width && !bad) {
          if (emb.isNullAt(off + j)) bad = true
          else x(j) = if (isFloat) emb.getFloat(off + j).toDouble
                      else emb.getDouble(off + j)
          j += 1
        }
      }
      if (bad) {
        out(m) = new GenericArrayData(new Array[Any](nCodes))
      } else {
        val row = new Array[Double](nCodes)
        var k = 0
        while (k < nCodes) {
          val c = books(m)(k)
          var s = 0.0
          var i = 0
          while (i < width) { s += x(i) * c(i); i += 1 }
          row(k) = s
          k += 1
        }
        out(m) = new GenericArrayData(row)
      }
      m += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
