package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * `pca_project(vec, basis, mean_dots, scale)` — project a float vector onto
 * a PCA basis: component `c` is `Σ_d floor(vec[d]·scale) · basis[c][d] −
 * mean_dots[c]` (the quantized-domain centered projection of
 * [[graft.ops.Similarity.pcaProject]]), summed left-to-right in double —
 * bit-identical to the composed `aggregate(zip_with(...))` form on
 * non-null elements, but codegen'd: the composed form interprets one
 * lambda frame per element per component (k·d frames per row), while this
 * kernel is k·d primitive multiply-adds with the basis riding into
 * generated code as a REFERENCE OBJECT (stable generated source across
 * retrained bases — the same janino-cache argument as
 * [[QuantizedArgBest]]). The row vector quantizes ONCE into a scratch
 * buffer shared by all k components (the HOF form re-quantizes per
 * component).
 *
 * `basis` (array<array<double>>), `mean_dots` (array<double>) and `scale`
 * must be foldable. Null vector → null; a null ELEMENT contributes 0
 * (the robust convention — the composed HOF form would instead null the
 * whole component).
 */
case class PcaProjectExpr(
    vec: Expression, basis: Expression, meanDot: Expression, scaleE: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = basis
  override def third: Expression = meanDot
  override def fourth: Expression = scaleE

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!(vec.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckFailure(
        s"pca_project requires array<float> vec, got ${vec.dataType.simpleString}")
    else if (!(basis.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckFailure(
        s"pca_project requires array<array<double>> basis, got ${basis.dataType.simpleString}")
    else if (!(meanDot.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckFailure(
        s"pca_project requires array<double> mean_dots, got ${meanDot.dataType.simpleString}")
    else if (scaleE.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"pca_project requires bigint scale, got ${scaleE.dataType.simpleString}")
    else if (!basis.foldable || !meanDot.foldable || !scaleE.foldable)
      TypeCheckResult.TypeCheckFailure(
        "pca_project requires foldable (literal) basis, mean_dots and scale")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "pca_project"

  @transient private lazy val basisLocal: Array[Array[Double]] = {
    val ad = basis.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(c => ad.getArray(c).toDoubleArray())
  }

  @transient private lazy val meanDotLocal: Array[Double] =
    meanDot.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  @transient private lazy val scaleLocal: Double =
    scaleE.eval(null).asInstanceOf[Long].toDouble

  /** Shared by eval and codegen (reference object). */
  def project(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    val qv = new Array[Double](n)
    var i = 0
    while (i < n) {
      qv(i) = if (xs.isNullAt(i)) 0.0
        else math.floor(xs.getFloat(i).toDouble * scaleLocal)
      i += 1
    }
    val out = new Array[Any](basisLocal.length)
    var c = 0
    while (c < basisLocal.length) {
      val b = basisLocal(c)
      val m = math.min(n, b.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += qv(j) * b(j); j += 1 }
      out(c) = acc - meanDotLocal(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, b: Any, m: Any, s: Any): Any =
    project(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pcaKernel", this, classOf[PcaProjectExpr].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => s"${ev.value} = $self.project($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PcaProjectExpr =
    copy(vec = newFirst, basis = newSecond, meanDot = newThird, scaleE = newFourth)
}

object PcaProject {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PcaProjectExpr].getName,
    null,
    "pca_project",
    "_FUNC_(vec, basis, mean_dots, scale) - centered PCA projection of a " +
      "float vector under integer quantization: component c = " +
      "sum_d floor(vec[d]*scale)*basis[c][d] - mean_dots[c].",
    "", "", "", "", "", "", "built-in")
}
