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

  /** No suffix longer than this (in labels) can match any snapshot rule:
    * the longest normal/exception rule's label count, or a wildcard
    * parent's plus the wildcard's own label. Computed once at class load;
    * the walk skips start indices whose suffix exceeds it. */
  private val MaxMatchLabels: Int = {
    def labels(r: String): Int = r.count(_ == '.') + 1
    ((PublicSuffix.rules.iterator ++ PublicSuffix.exceptions.iterator).map(labels) ++
      PublicSuffix.wildcards.iterator.map(labels(_) + 1)).max
  }

  /** Static kernel (invoked from generated code and from eval). PSL walk,
    * longest suffix first: at each start index an exception match ends the
    * walk with the suffix one label shorter, a normal or wildcard match
    * ends it there; no match falls back to the last label (the implicit
    * `*` rule). The registrable domain is the public suffix plus one
    * label; a host that IS a public suffix has none. One char pass
    * validates labels and finds their offsets; the walk then builds ONE
    * suffix string per probed label (each iteration hands its `next`
    * suffix to the following one, which doubles as the wildcard parent
    * probe) — no arrays of labels, no per-index re-joins. */
  def registrable(host: UTF8String): UTF8String = {
    if (host == null) return null
    var s = host.toString.toLowerCase(java.util.Locale.ROOT)
    if (s.nonEmpty && s.charAt(s.length - 1) == '.') s = s.substring(0, s.length - 1)
    if (s.isEmpty) return null
    // one pass: reject empty labels, detect all-numeric (IPv4), count dots
    var allNumeric = true
    var prev = '.'
    var nDots = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (prev == '.') return null // leading dot or ".." — malformed
        nDots += 1
      } else if (c < '0' || c > '9') allNumeric = false
      prev = c
      i += 1
    }
    if (prev == '.') return null // "a.." stripped once still ends dotted
    if (allNumeric) return null // IPv4 literal: no registrable domain
    val n = nDots + 1
    val starts = new Array[Int](n)
    var li = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == '.') { starts(li) = i + 1; li += 1 }
      i += 1
    }
    var psStart = -1
    i = math.max(0, n - MaxMatchLabels) // longer suffixes cannot match
    var cur = if (i < n) s.substring(starts(i)) else null
    while (i < n && psStart < 0) {
      val next = if (i + 1 < n) s.substring(starts(i + 1)) else null
      if (PublicSuffix.exceptions.contains(cur)) psStart = i + 1
      else if (PublicSuffix.rules.contains(cur)) psStart = i
      else if (next != null && PublicSuffix.wildcards.contains(next)) psStart = i
      cur = next
      i += 1
    }
    if (psStart < 0) psStart = n - 1
    if (psStart == 0) null
    else UTF8String.fromString(s.substring(starts(psStart - 1)))
  }

  val registrableInfo: ExpressionInfo = new ExpressionInfo(
    classOf[RegistrableDomain].getName, null, "registrable_domain",
    "_FUNC_(host) - registrable eTLD+1 domain of a hostname per the bundled public-suffix snapshot; null when none exists.",
    "", "", "", "", "", "", "built-in")

  /** `pct_normalize(url)` — RFC 3986 §§2.3/6.2.2.1 safe-subset
    * percent-encoding normalization in ONE string pass: escape hex folds
    * to uppercase and unreserved escapes (ALPHA / DIGIT / `-._~`) decode;
    * reserved escapes survive encoded (decoding `%2F` would merge
    * distinct resources). Bit-identical to the 78-expression
    * replace-chain form ([[graft.ops.TextOps.pctNormalizeUrlChain]] —
    * the DuckDB-replayable oracle rendering, spec-pinned equal), which
    * cost 78 passes over every URL; the kernel costs one. Equivalence
    * argument: the chain's decodes are literal uppercase `%XX` replaces
    * applied after the hex fold, none of which can create a new escape
    * (`%25` is absent — `%` is reserved), and a valid escape's body can
    * never start another escape, so left-to-right single-pass processing
    * commutes with the chain's sequential global replaces; a bare `%`
    * not followed by two hex chars is untouched by every chain pattern
    * and is emitted verbatim here. */
  case class PctNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string url, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "pct_normalize"
    override protected def nullSafeEval(a: Any): Any =
      UrlKernels.pctNormalize(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.UrlKernels.pctNormalize($a)")
    override protected def withNewChildInternal(newChild: Expression): PctNormalize =
      copy(child = newChild)
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(code: Int): Boolean =
    (code >= 'A' && code <= 'Z') || (code >= 'a' && code <= 'z') ||
      (code >= '0' && code <= '9') ||
      code == '-' || code == '.' || code == '_' || code == '~'

  private val UpHex = "0123456789ABCDEF"

  /** Static kernel (invoked from generated code and from eval). Never
    * null-for-non-null; escape-free inputs return the INPUT reference —
    * the common case allocates nothing. */
  def pctNormalize(url: UTF8String): UTF8String = {
    if (url == null) return null
    val s = url.toString
    if (s.indexOf('%') < 0) return url
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h1 = hexVal(s.charAt(i + 1))
        val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val code = h1 * 16 + h2
          if (isUnreserved(code)) sb.append(code.toChar)
          else sb.append('%').append(UpHex.charAt(h1)).append(UpHex.charAt(h2))
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** `idn_ascii(host)` — ASCII-compatible (punycode) form of a hostname
    * via in-JDK `java.net.IDN` (IDNA2003, the public RFC 3490 algorithm):
    * a unicode host and its punycode twin (`bücher.de` vs
    * `xn--bcher-kva.de`) collapse to ONE canonical key, so domain caps
    * and blocklists keyed on the canonical host are no longer evadable by
    * the encoding choice. Lowercases first (so `BÜCHER.DE` collapses
    * too); all-ASCII hosts take a zero-alloc fast path (already-punycode
    * spellings are fixpoints); a host IDNA rejects (overlong label, empty
    * label, …) falls back to its lowercased form — deterministic
    * best-effort, never a throw inside a 100 TB scan. */
  case class IdnAscii(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string host, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "idn_ascii"
    override protected def nullSafeEval(a: Any): Any =
      UrlKernels.idnAscii(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.UrlKernels.idnAscii($a)")
    override protected def withNewChildInternal(newChild: Expression): IdnAscii =
      copy(child = newChild)
  }

  /** Static kernel (invoked from generated code and from eval). */
  def idnAscii(host: UTF8String): UTF8String = {
    if (host == null) return null
    val s = host.toString
    var i = 0
    var ascii = true
    var hasUpper = false
    while (ascii && i < s.length) {
      val c = s.charAt(i)
      if (c > 127) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) {
      if (!hasUpper) host
      else UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))
    } else {
      val lowered = s.toLowerCase(java.util.Locale.ROOT)
      try UTF8String.fromString(
        java.net.IDN.toASCII(lowered).toLowerCase(java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => UTF8String.fromString(lowered) }
    }
  }

  val idnAsciiInfo: ExpressionInfo = new ExpressionInfo(
    classOf[IdnAscii].getName, null, "idn_ascii",
    "_FUNC_(host) - lowercased ASCII-compatible (punycode) hostname via java.net.IDN; unicode and punycode spellings collapse to one key, malformed hosts fall back to lowercase.",
    "", "", "", "", "", "", "built-in")

  val pctNormalizeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[PctNormalize].getName, null, "pct_normalize",
    "_FUNC_(url) - safe-subset percent-encoding normalization: escape hex uppercased, RFC 3986 unreserved escapes decoded, reserved escapes preserved.",
    "", "", "", "", "", "", "built-in")
}
