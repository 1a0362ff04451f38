package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/**
 * `quantized_argbest(vec, qcents, bias)` — index of the candidate centroid
 * minimizing the exact-integer key `bias[c] − 2·Σ floor(vec[i]·10^6) ·
 * qcents[c][i]`, ties → smallest index. This one key form covers both
 * assignment metrics of [[graft.ops.Similarity]]:
 *
 *  - L2 argmin ‖x−c‖² = argmin (c·c − 2·x·c): pass `bias[c] = c·c` (the
 *    pre-quantized self-dot);
 *  - max-dot argmax x·c = argmin −2·x·c: pass `bias[c] = 0`.
 *
 * `qcents` and `bias` must be FOLDABLE (literals): they are evaluated once
 * driver-side into primitive `long[][]`/`long[]` arrays that ride into
 * generated code as REFERENCE OBJECTS, not embedded constants. That is the
 * whole point of this kernel: the composed form (an `array_min` over
 * per-centroid `struct(key, cid)` expressions) embeds every centroid value
 * in the generated source, so each Lloyd iteration and each retrained
 * centroid set produces NEW source and a fresh multi-second janino compile
 * of a multi-thousand-line method — measured as a 2–5× slowdown of the
 * whole embed family. With the codebook as a reference object the source
 * is stable across centroid values, the code cache hits, and the per-row
 * work is a tight primitive loop (k·dims multiply-adds, no boxing).
 *
 * The vector side is quantized once per row into a scratch buffer, so each
 * component pays one `floor` for all k candidates.
 */
case class QuantizedArgBest(vec: Expression, qcents: Expression, bias: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = qcents
  override def third: Expression = bias

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(e: Expression, et: DataType): Boolean = e.dataType match {
      case ArrayType(t, _) => t == et
      case _ => false
    }
    if (!isArr(vec, FloatType))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_argbest requires array<float> vec, got ${vec.dataType.simpleString}")
    else if (!(qcents.dataType match {
        case ArrayType(ArrayType(LongType, _), _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_argbest requires array<array<bigint>> qcents, got ${qcents.dataType.simpleString}")
    else if (!isArr(bias, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_argbest requires array<bigint> bias, got ${bias.dataType.simpleString}")
    else if (!qcents.foldable || !bias.foldable)
      TypeCheckResult.TypeCheckFailure(
        "quantized_argbest requires foldable (literal) qcents and bias")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "quantized_argbest"

  /** The candidate matrix as primitive arrays, evaluated once. */
  @transient private lazy val centsLocal: Array[Array[Long]] = {
    val ad = qcents.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(c => ad.getArray(c).toLongArray())
  }

  @transient private lazy val biasLocal: Array[Long] =
    bias.eval(null).asInstanceOf[ArrayData].toLongArray()

  /** Shared by eval and codegen (via reference object). Quantizes the row
    * vector once, then scans candidates; dots run over the common prefix
    * of vector and candidate (same convention as `quantized_dot`). */
  def argBest(xs: ArrayData): Int = {
    val n = xs.numElements()
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      qv(i) = if (xs.isNullAt(i)) 0L else math.floor(xs.getFloat(i) * 1e6).toLong
      i += 1
    }
    var best = 0
    var bestKey = Long.MaxValue
    var c = 0
    while (c < centsLocal.length) {
      val cv = centsLocal(c)
      val m = math.min(n, cv.length)
      var dot = 0L
      var j = 0
      while (j < m) { dot += qv(j) * cv(j); j += 1 }
      val key = biasLocal(c) - 2L * dot
      if (key < bestKey) { bestKey = key; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any, c: Any, b: Any): Any =
    argBest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("argbestKernel", this, classOf[QuantizedArgBest].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $self.argBest($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantizedArgBest =
    copy(vec = newFirst, qcents = newSecond, bias = newThird)
}

object QuantizedArgBest {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[QuantizedArgBest].getName,
    null,
    "quantized_argbest",
    "_FUNC_(vec, qcents, bias) - index of the candidate minimizing bias[c] - 2*quantized_dot'(vec, qcents[c]), ties to the smallest index.",
    "", "", "", "", "", "", "built-in")
}
