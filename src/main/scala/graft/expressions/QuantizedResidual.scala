package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/**
 * Residual-domain companions to [[QuantizedArgBest]], the kernels behind
 * residual product quantization (the standard IVF-PQ form, Jégou et al.
 * 2011): PQ codes quantize `x − c(cell)` instead of `x`, which roughly
 * doubles recall at the same code budget because each cell's codebook only
 * has to cover the local spread around its centroid, not the whole space.
 *
 * The residual is defined in the QUANTIZED integer domain:
 * `qr[d] = floor(x[d]·10^6) − qoff[cell][d]` with `qoff` the pre-quantized
 * coarse centroids — exact integers end to end (a float-domain `x − c`
 * would re-round on quantization and lose engine-portable determinism).
 *
 * Same codegen discipline as [[QuantizedArgBest]]: the codebook and offset
 * matrices must be FOLDABLE and ride into generated code as reference
 * objects (value-stable source → the code cache hits across retrained
 * centroid values); the per-row inputs are the vector and its coarse-cell
 * INDEX (position in the cid-sorted centroid list, as returned by
 * `quantized_argbest` — not the cid itself).
 */
object QuantizedResidual {

  private[expressions] def quantizeRow(xs: ArrayData): Array[Long] = {
    val n = xs.numElements()
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      qv(i) = if (xs.isNullAt(i)) 0L else math.floor(xs.getFloat(i) * 1e6).toLong
      i += 1
    }
    qv
  }

  private[expressions] def matrixLocal(e: Expression): Array[Array[Long]] = {
    val ad = e.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(c => ad.getArray(c).toLongArray())
  }

  private[expressions] def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[expressions] def isLongMatrix(e: Expression): Boolean = e.dataType match {
    case ArrayType(ArrayType(LongType, _), _) => true
    case _ => false
  }

  val residualInfo: ExpressionInfo = new ExpressionInfo(
    classOf[QuantizedResidualExpr].getName,
    null,
    "quantized_residual",
    "_FUNC_(vec, qoffs, offIdx) - floor(vec*1e6) minus the offIdx-th pre-quantized offset row, as array<bigint>.",
    "", "", "", "", "", "", "built-in")

  val argBestResInfo: ExpressionInfo = new ExpressionInfo(
    classOf[QuantizedArgBestRes].getName,
    null,
    "quantized_argbest_res",
    "_FUNC_(vec, qcents, qoffs, offIdx) - index of the candidate minimizing the exact L2 key over the quantized residual (vec minus offset row offIdx), ties to the smallest index.",
    "", "", "", "", "", "", "built-in")
}

/** `quantized_residual(vec, qoffs, offIdx)` → `array<bigint>`:
  * `floor(vec[d]·10^6) − qoffs[offIdx][d]` over the common prefix (offset
  * rows shorter than the vector leave the tail un-shifted — callers pass
  * full-width or full-slice offsets). */
case class QuantizedResidualExpr(vec: Expression, qoffs: Expression, offIdx: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = qoffs
  override def third: Expression = offIdx

  override def checkInputDataTypes(): TypeCheckResult =
    if (!QuantizedResidual.isFloatArr(vec))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_residual requires array<float> vec, got ${vec.dataType.simpleString}")
    else if (!QuantizedResidual.isLongMatrix(qoffs))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_residual requires array<array<bigint>> qoffs, got ${qoffs.dataType.simpleString}")
    else if (offIdx.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"quantized_residual requires int offIdx, got ${offIdx.dataType.simpleString}")
    else if (!qoffs.foldable)
      TypeCheckResult.TypeCheckFailure("quantized_residual requires foldable (literal) qoffs")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantized_residual"

  @transient private lazy val offsLocal: Array[Array[Long]] =
    QuantizedResidual.matrixLocal(qoffs)

  def residual(xs: ArrayData, oi: Int): ArrayData = {
    val qv = QuantizedResidual.quantizeRow(xs)
    val off = offsLocal(oi)
    val m = math.min(qv.length, off.length)
    var i = 0
    while (i < m) { qv(i) -= off(i); i += 1 }
    new GenericArrayData(qv)
  }

  override protected def nullSafeEval(v: Any, o: Any, i: Any): Any =
    residual(v.asInstanceOf[ArrayData], i.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("residualKernel", this, classOf[QuantizedResidualExpr].getName)
    nullSafeCodeGen(ctx, ev, (v, _, i) => s"${ev.value} = $self.residual($v, $i);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantizedResidualExpr =
    copy(vec = newFirst, qoffs = newSecond, offIdx = newThird)
}

/** `quantized_argbest_res(vec, qcents, qoffs, offIdx)` — index of the
  * candidate minimizing the exact-integer L2 key
  * `Σ qcents[c][d]² − 2·Σ qr[d]·qcents[c][d]` with
  * `qr = floor(vec·10^6) − qoffs[offIdx]`, ties → smallest index. The L2
  * bias `Σ q²` is derived from the candidate matrix (residual encode is
  * always an L2 argmin — there is no max-dot residual variant). */
case class QuantizedArgBestRes(
    vec: Expression, qcents: Expression, qoffs: Expression, offIdx: Expression)
    extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = qcents
  override def third: Expression = qoffs
  override def fourth: Expression = offIdx

  override def checkInputDataTypes(): TypeCheckResult =
    if (!QuantizedResidual.isFloatArr(vec))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_argbest_res requires array<float> vec, got ${vec.dataType.simpleString}")
    else if (!QuantizedResidual.isLongMatrix(qcents) || !QuantizedResidual.isLongMatrix(qoffs))
      TypeCheckResult.TypeCheckFailure(
        "quantized_argbest_res requires array<array<bigint>> qcents and qoffs")
    else if (offIdx.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"quantized_argbest_res requires int offIdx, got ${offIdx.dataType.simpleString}")
    else if (!qcents.foldable || !qoffs.foldable)
      TypeCheckResult.TypeCheckFailure(
        "quantized_argbest_res requires foldable (literal) qcents and qoffs")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantized_argbest_res"

  @transient private lazy val centsLocal: Array[Array[Long]] =
    QuantizedResidual.matrixLocal(qcents)

  @transient private lazy val offsLocal: Array[Array[Long]] =
    QuantizedResidual.matrixLocal(qoffs)

  /** L2 bias per candidate, derived once from the quantized entries. */
  @transient private lazy val biasLocal: Array[Long] =
    centsLocal.map { cv =>
      var acc = 0L
      var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      acc
    }

  def argBest(xs: ArrayData, oi: Int): Int = {
    val qv = QuantizedResidual.quantizeRow(xs)
    val off = offsLocal(oi)
    val mm = math.min(qv.length, off.length)
    var i = 0
    while (i < mm) { qv(i) -= off(i); i += 1 }
    var best = 0
    var bestKey = Long.MaxValue
    var c = 0
    while (c < centsLocal.length) {
      val cv = centsLocal(c)
      val m = math.min(qv.length, cv.length)
      var dot = 0L
      var j = 0
      while (j < m) { dot += qv(j) * cv(j); j += 1 }
      val key = biasLocal(c) - 2L * dot
      if (key < bestKey) { bestKey = key; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any, c: Any, o: Any, i: Any): Any =
    argBest(v.asInstanceOf[ArrayData], i.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("argbestResKernel", this, classOf[QuantizedArgBestRes].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _, i) => s"${ev.value} = $self.argBest($v, $i);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): QuantizedArgBestRes =
    copy(vec = newFirst, qcents = newSecond, qoffs = newThird, offIdx = newFourth)
}
