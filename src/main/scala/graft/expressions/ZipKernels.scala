package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compression-ratio quality signal — the classic C4/Gopher-class
 * long-range-redundancy gate. Token-level repetition stats
 * (`repetition_stats`: top-token share, duplicate-bigram fraction) see
 * LOCAL repetition; page-scale boilerplate — a navigation block repeated
 * every few hundred tokens, templated listings, machine-generated
 * paragraph mills — slips past them while compressing to almost nothing.
 * `deflate_ratio(text)` = deflated UTF-8 byte count / raw UTF-8 byte
 * count under `java.util.zip.Deflater` with PINNED parameters (level 6,
 * raw stream `nowrap=true` so no zlib header/adler constant rides the
 * ratio, default strategy): far below 1 means the document is mostly
 * self-repeating; ~1 (or above, for short inputs — deflate's block
 * framing has a floor) means incompressible.
 *
 * Determinism: fixed level/strategy/no-dictionary on a single zlib build
 * is deterministic; across zlib BUILDS the exact byte count may drift a
 * few bytes, which is why the oracle checks planted-payload RATIO
 * BUCKETS with wide margins (redundant < 0.25 ≤ prose < 0.9 ≤ floor
 * cases), never raw counts, and why gates should threshold with margin
 * too. Empty/null follow the kernel laws: null → null, empty → 1.0
 * (vacuously incompressible, never a divide-by-zero).
 */
object ZipKernels {

  def deflateRatio(s: UTF8String): Double = {
    if (s == null) return 1.0 // unreachable via nullSafeEval; total anyway
    val b = s.getBytes
    if (b.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(b)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) {
        total += d.deflate(buf)
      }
      total.toDouble / b.length
    } finally d.end()
  }

  /** `deflate_ratio(text)` — see [[ZipKernels]]. */
  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "deflate_ratio"
    override protected def nullSafeEval(a: Any): Any =
      ZipKernels.deflateRatio(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.ZipKernels.deflateRatio($a)")
    override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
      copy(child = newChild)
  }

  val deflateRatioInfo: ExpressionInfo = new ExpressionInfo(
    classOf[DeflateRatio].getName, null, "deflate_ratio",
    "_FUNC_(text) - deflated/raw UTF-8 byte ratio (level 6, raw stream): the C4/Gopher long-range-redundancy quality signal; 1.0 for empty.",
    "", "", "", "", "", "", "built-in")
}
