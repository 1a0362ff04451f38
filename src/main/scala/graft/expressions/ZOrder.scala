package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * `zorder_key(xa, xb, cutsA, cutsB)` — Morton (Z-order) interleave of two
 * columns' quantile-bucket ranks, the multi-dimensional clustering key for
 * [[graft.ops.Scale.writeZOrdered]].
 *
 * Range-clustering on ONE column ([[graft.ops.Scale.writeRangeClustered]])
 * gives that column tight per-file min/max ranges and the other columns
 * none: a predicate on the second column scans every file. Sorting by the
 * Morton code of both columns' bucket ranks gives every file a narrow
 * rectangle in (A, B) space, so parquet min/max skipping works for
 * predicates on EITHER column — the layout trade every large analytical
 * store (Delta OPTIMIZE ZORDER, Iceberg sort orders) makes for selectively
 * read 100 TB corpora.
 *
 * Bucket rank = count of cut points ≤ x (binary search over the sorted,
 * driver-computed quantile cuts — equi-POPULATED buckets, so skewed
 * distributions still spread over the full grid; raw value interleaving
 * would collapse skewed data onto a few codes). `cutsA`/`cutsB` must be
 * foldable (literals): like [[QuantizedArgBest]]'s codebook they are
 * evaluated once into primitive `double[]` reference objects, keeping the
 * generated source stable across different cut sets (code-cache hits) and
 * the per-row work a primitive binary search + bit spread.
 *
 * Capacity: up to 65535 cuts per side (16-bit ranks) interleaved into a
 * 32-bit code — 4 billion grid cells, far beyond any useful file count.
 */
case class ZOrderKey(xa: Expression, xb: Expression, cutsA: Expression, cutsB: Expression)
    extends QuaternaryExpression {

  override def first: Expression = xa
  override def second: Expression = xb
  override def third: Expression = cutsA
  override def fourth: Expression = cutsB

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArr(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (xa.dataType != DoubleType || xb.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires double inputs, got ${xa.dataType.simpleString}, ${xb.dataType.simpleString}")
    else if (!isDoubleArr(cutsA) || !isDoubleArr(cutsB))
      TypeCheckResult.TypeCheckFailure("zorder_key requires array<double> cut points")
    else if (!cutsA.foldable || !cutsB.foldable)
      TypeCheckResult.TypeCheckFailure("zorder_key requires foldable (literal) cut points")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  @transient private lazy val cutsALocal: Array[Double] = {
    val a = cutsA.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    require(a.length <= 65535, s"zorder_key supports at most 65535 cuts, got ${a.length}")
    a
  }
  @transient private lazy val cutsBLocal: Array[Double] = {
    val a = cutsB.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    require(a.length <= 65535, s"zorder_key supports at most 65535 cuts, got ${a.length}")
    a
  }

  /** Rank of `x` = number of cuts ≤ x, via binary search (duplicate cuts —
    * a skewed discrete distribution — resolve to the rightmost, so equal
    * values always land in the same bucket). */
  private def rank(cuts: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Spread the low 16 bits of `v` to even bit positions. */
  private def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Shared by eval and codegen (reference object). */
  def zkey(a: Double, b: Double): Long =
    spread(rank(cutsALocal, a)) | (spread(rank(cutsBLocal, b)) << 1)

  override protected def nullSafeEval(a: Any, b: Any, ca: Any, cb: Any): Any =
    zkey(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zorderKernel", this, classOf[ZOrderKey].getName)
    nullSafeCodeGen(ctx, ev, (a, b, _, _) => s"${ev.value} = $self.zkey($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): ZOrderKey =
    copy(xa = newFirst, xb = newSecond, cutsA = newThird, cutsB = newFourth)
}

object ZOrder {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ZOrderKey].getName,
    null,
    "zorder_key",
    "_FUNC_(xa, xb, cutsA, cutsB) - Morton interleave of the two values' quantile-bucket ranks (rank = cuts <= x, 16 bits per side).",
    "", "", "", "", "", "", "built-in")
}
