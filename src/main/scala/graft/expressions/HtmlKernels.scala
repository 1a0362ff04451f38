package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML entity decoding for the text-extraction ingest stage
 * ([[graft.ops.TextOps.stripHtml]]) — the six ubiquitous named entities
 * plus BOUNDED numeric character references (`&#NNN;` / `&#xHH;`), which
 * real crawl HTML is full of (`&#x27;`, `&#8217;`, `&#160;`, …) and which
 * a named-only decoder leaves as literal text that poisons dedup keys and
 * fingerprints downstream.
 *
 * One left-to-right pass, native codegen'd expression. Single-pass
 * processing gives the same never-rescan-output guarantee the old
 * replace chain got from ordering `&amp;` last: `&amp;lt;` decodes to
 * the literal `&lt;` the author wrote (the emitted `&` is never
 * re-examined), never to `<`.
 *
 * Decode set (anything else — unterminated, out of range, overlong —
 * survives verbatim; a decoder must never guess):
 *   - named: `&amp; &lt; &gt; &quot; &apos; &nbsp;` (case-sensitive,
 *     the canonical spellings);
 *   - numeric: decimal (≤ 7 digits) and hex (`x`/`X`, ≤ 6 digits, any
 *     case) references whose code point is printable ASCII (32–126),
 *     NBSP (160 → plain space, matching the `&nbsp;` rule), or the
 *     common-punctuation set {© « ® ° · » × ÷ – — ‘ ’ ‚ “ ” „ • … ′ ″
 *     € ™}. Leading zeros are accepted (`&#039;` ≡ `&#39;`).
 */
object HtmlKernels {

  case class HtmlUnescape(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "html_unescape"
    override protected def nullSafeEval(a: Any): Any =
      HtmlKernels.unescape(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.HtmlKernels.unescape($a)")
    override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
      copy(child = newChild)
  }

  /** Code point → decoded char, or -1 when outside the bounded safe set.
    * 160 (NBSP) maps to a plain space — the same judgment as the `&nbsp;`
    * rule (downstream whitespace collapse treats them alike). */
  private def safeChar(code: Int): Int = code match {
    case c if c >= 32 && c <= 126 => c
    case 160 => ' '.toInt
    case 169 | 171 | 174 | 176 | 183 | 187 | 215 | 247 => code
    case 8211 | 8212 | 8216 | 8217 | 8218 | 8220 | 8221 | 8222 => code
    case 8226 | 8230 | 8242 | 8243 | 8364 | 8482 => code
    case _ => -1
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** Static kernel (invoked from generated code and from eval).
    * Entity-free inputs return the INPUT reference — zero alloc. */
  def unescape(html: UTF8String): UTF8String = {
    if (html == null) return null
    val s = html.toString
    if (s.indexOf('&') < 0) return html
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else if (s.regionMatches(i + 1, "amp;", 0, 4)) { sb.append('&'); i += 5 }
      else if (s.regionMatches(i + 1, "lt;", 0, 3)) { sb.append('<'); i += 4 }
      else if (s.regionMatches(i + 1, "gt;", 0, 3)) { sb.append('>'); i += 4 }
      else if (s.regionMatches(i + 1, "quot;", 0, 5)) { sb.append('"'); i += 6 }
      else if (s.regionMatches(i + 1, "apos;", 0, 5)) { sb.append('\''); i += 6 }
      else if (s.regionMatches(i + 1, "nbsp;", 0, 5)) { sb.append(' '); i += 6 }
      else if (i + 2 < n && s.charAt(i + 1) == '#') {
        // numeric reference: bounded parse, verbatim on any failure
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val start = j
        var code = 0
        var ok = true
        while (ok && j < n && j - start < (if (hex) 6 else 7) && {
          val d = if (hex) hexVal(s.charAt(j))
                  else if (s.charAt(j) >= '0' && s.charAt(j) <= '9') s.charAt(j) - '0'
                  else -1
          if (d >= 0) { code = code * (if (hex) 16 else 10) + d; true } else false
        }) j += 1
        // a digit run that hit the length cap but has more digits is
        // overlong — verbatim, never a truncated decode
        if (j == start || j >= n || s.charAt(j) != ';' ||
            safeChar(code) < 0) { sb.append('&'); i += 1 }
        else { sb.append(safeChar(code).toChar); i = j + 1 }
      } else { sb.append('&'); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  val unescapeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[HtmlUnescape].getName, null, "html_unescape",
    "_FUNC_(s) - decode the six ubiquitous named HTML entities plus bounded numeric character references (printable ASCII + common punctuation); anything else survives verbatim.",
    "", "", "", "", "", "", "built-in")
}
