package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * PII pseudonymization kernel: every match of the [[graft.ops.Pii.patterns]]
 * classes is replaced by a STABLE token `<KIND:xxxxxxxx>` where `xxxxxxxx`
 * is the first 8 md5 hex digits of the matched value — the same email
 * yields the same token in every document, run, and engine.
 *
 * Redacting to a constant (`<EMAIL>`) destroys linkability; training-data
 * and analytics pipelines usually need "same person, same token" (joinable
 * pseudonyms, co-reference preserved) without carrying the raw value. A
 * per-match computed replacement is not expressible with the built-in
 * `regexp_replace` (its replacement string is static), so this is a native
 * codegen'd expression — one pass per pattern class over each row, no
 * interpreter boundary, embarrassingly parallel like the rest of
 * [[graft.ops.Pii]]. Replacement tokens contain no digits-with-separators
 * or `@`, so later pattern classes never re-match an earlier replacement.
 */
object PiiKernels {

  /** `(KIND, compiled pattern)` in [[graft.ops.Pii.patterns]] redaction
    * order — one shared source of truth for what counts as PII. */
  private lazy val compiled: Array[(String, Pattern)] =
    graft.ops.Pii.patterns
      // Locale.ROOT: default-locale uppercasing would mint different token
      // kinds on e.g. a tr-TR JVM ("İPV4"), breaking the stable contract
      .map { case (kind, re, _) =>
        (kind.toUpperCase(java.util.Locale.ROOT), Pattern.compile(re))
      }
      .toArray

  // one digest per thread, reset per use (same discipline as MinhashSigs)
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes as 8 lowercase hex digits —
    * `substring(md5(v), 1, 8)` semantics, reproducible in any engine. */
  private def hash8(v: String): String = {
    val md = md5.get()
    md.reset()
    val d = md.digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    f"$x%08x"
  }

  def pseudonymize(s: UTF8String): UTF8String = {
    var text = s.toString
    var i = 0
    while (i < compiled.length) {
      val kind = compiled(i)._1
      val m = compiled(i)._2.matcher(text)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(text.length + 16)
        var last = 0
        m.reset()
        while (m.find()) {
          sb.append(text, last, m.start())
          sb.append('<').append(kind).append(':').append(hash8(m.group())).append('>')
          last = m.end()
        }
        sb.append(text, last, text.length)
        text = sb.toString
      }
      i += 1
    }
    UTF8String.fromString(text)
  }

  val pseudonymizeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[Pseudonymize].getName, "pii_pseudonymize")
}

/** `pii_pseudonymize(text)` — see [[PiiKernels.pseudonymize]]. */
case class Pseudonymize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pii_pseudonymize requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "pii_pseudonymize"
  override protected def nullSafeEval(a: Any): Any =
    PiiKernels.pseudonymize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.PiiKernels.pseudonymize($a);")
  override protected def withNewChildInternal(newChild: Expression): Pseudonymize =
    copy(child = newChild)
}
