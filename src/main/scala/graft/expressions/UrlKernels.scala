package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.PublicSuffix

/**
 * Registrable-domain (eTLD+1) extraction — the exact Public Suffix List
 * algorithm (publicsuffix.org/list: longest matching rule wins, `*.`
 * matches one label, `!` exceptions beat their wildcard, unmatched hosts
 * fall back to the implicit `*` rule) over the bundled
 * [[graft.model.PublicSuffix]] snapshot.
 *
 * A native expression rather than a rules broadcast-join: the lookup is
 * per-row, needs at most `labels` O(1) set probes against a static
 * HashSet, and stays inside whole-stage codegen — a join formulation
 * would explode candidate suffixes (rows × labels) through an exchange to
 * compute what one pass over the string already knows.
 */
object UrlKernels {

  /** `registrable_domain(host)` — eTLD+1 of a hostname; null when the
    * host has no registrable domain (null/empty/malformed input, the host
    * IS a public suffix, or an all-numeric IPv4 literal — PSL semantics).
    * Input is lowercased and a trailing dot stripped, so raw or
    * canonicalized hosts both work. */
  case class RegistrableDomain(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string host, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "registrable_domain"
    override protected def nullSafeEval(a: Any): Any =
      UrlKernels.registrable(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val code = nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.expressions.UrlKernels.registrable($a);
           |${ev.isNull} = ${ev.value} == null;""".stripMargin)
      code
    }
    override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
      copy(child = newChild)
  }

  /** Static kernel (invoked from generated code and from eval). PSL walk,
    * longest suffix first: at each start index an exception match ends the
    * walk with the suffix one label shorter, a normal or wildcard match
    * ends it there; no match falls back to the last label (the implicit
    * `*` rule). The registrable domain is the public suffix plus one
    * label; a host that IS a public suffix has none. */
  def registrable(host: UTF8String): UTF8String = {
    if (host == null) return null
    var s = host.toString.toLowerCase(java.util.Locale.ROOT)
    if (s.nonEmpty && s.charAt(s.length - 1) == '.') s = s.substring(0, s.length - 1)
    if (s.isEmpty) return null
    val labels = s.split('.')
    if (labels.length == 0) return null
    var allNumeric = true
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.isEmpty) return null // ".." or leading dot — malformed
      var j = 0
      while (j < l.length && allNumeric) {
        val c = l.charAt(j)
        if (c < '0' || c > '9') allNumeric = false
        j += 1
      }
      i += 1
    }
    if (allNumeric) return null // IPv4 literal: no registrable domain
    val n = labels.length
    var psStart = -1
    i = 0
    while (i < n && psStart < 0) {
      val suffix = labels.slice(i, n).mkString(".")
      if (PublicSuffix.exceptions.contains(suffix)) psStart = i + 1
      else if (PublicSuffix.rules.contains(suffix)) psStart = i
      else if (i + 1 < n &&
        PublicSuffix.wildcards.contains(labels.slice(i + 1, n).mkString(".")))
        psStart = i
      i += 1
    }
    if (psStart < 0) psStart = n - 1
    if (psStart == 0) null
    else UTF8String.fromString(labels.slice(psStart - 1, n).mkString("."))
  }

  val registrableInfo: ExpressionInfo = new ExpressionInfo(
    classOf[RegistrableDomain].getName, null, "registrable_domain",
    "_FUNC_(host) - registrable eTLD+1 domain of a hostname per the bundled public-suffix snapshot; null when none exists.",
    "", "", "", "", "", "", "built-in")
}
