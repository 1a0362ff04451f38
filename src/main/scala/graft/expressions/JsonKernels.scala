package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JSON → text (`json_text`) — the `application/json` rung of the mime
 * router ([[graft.ops.TextOps.extractText]]). Without it JSON payloads
 * fall into the HTML branch, where braces and quoted keys survive as
 * noise lines that poison dedup keys and quality scores downstream.
 *
 * The harvest law: one strict recursive-descent parse of exactly ONE
 * top-level value; every STRING VALUE — object member values and array
 * string elements, in document order — becomes its own block line (keys
 * are schema, not text; numbers/booleans/nulls are validated but
 * contribute nothing). JSON escapes decode in full (`\" \\ \/ \b \f \n
 * \r \t \uXXXX`, surrogate pairs ride through as two units); a `\n`
 * inside a value is a real line break — the block-line law. Output is
 * per-line whitespace-collapsed, empty lines dropped, lines joined with
 * `\n` (the `html_to_text` line law, so JSON text feeds the same
 * paragraph tiers).
 *
 * What refuses (NULL — visible to the ingest ledger, like pdf_text):
 *   - any parse error, including trailing non-whitespace after the
 *     first value (a JSON-labeled payload that is not JSON);
 *   - nesting deeper than 64 levels (hostile input bound);
 *   - unterminated strings / bad escapes.
 *
 * A VALID document with no string values (e.g. `{"n": 1}`) yields ''
 * — text-free, not malformed. Null in → null out.
 */
object JsonKernels {

  private val MaxDepth = 64

  /** Parse failure sentinel (cheaper than exceptions in the hot path). */
  private final class Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private val bad = new Bad

  def jsonText(u: UTF8String): UTF8String = {
    if (u == null) return null
    val raw = u.toString
    // a leading U+FEFF (the UTF-8 BOM surviving byte decode — standard
    // Windows tooling output) is not content; refusing it would count
    // perfectly valid JSON as refusal mass
    val s = if (raw.nonEmpty && raw.charAt(0) == 0xFEFF.toChar) raw.substring(1)
            else raw
    val out = new java.lang.StringBuilder(math.min(s.length, 256))
    try {
      val end = parseValue(s, skipWs(s, 0), out, 0)
      if (skipWs(s, end) != s.length) return null // trailing garbage
      UTF8String.fromString(collapse(out.toString))
    } catch {
      case _: Bad => null
      case _: StackOverflowError => null // belt over the depth bound
    }
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** Parse one value at `i` (non-ws); returns index past it. String
    * values append to `out` as '\n'-framed blocks. */
  private def parseValue(s: String, i: Int, out: java.lang.StringBuilder,
      depth: Int): Int = {
    if (depth > MaxDepth) throw bad
    val n = s.length
    if (i >= n) throw bad
    s.charAt(i) match {
      case '{' =>
        var j = skipWs(s, i + 1)
        if (j < n && s.charAt(j) == '}') return j + 1
        while (true) {
          if (j >= n || s.charAt(j) != '"') throw bad
          j = parseString(s, j, null) // key: schema, not text
          j = skipWs(s, j)
          if (j >= n || s.charAt(j) != ':') throw bad
          j = parseValue(s, skipWs(s, j + 1), out, depth + 1)
          j = skipWs(s, j)
          if (j < n && s.charAt(j) == ',') j = skipWs(s, j + 1)
          else if (j < n && s.charAt(j) == '}') return j + 1
          else throw bad
        }
        throw bad // unreachable
      case '[' =>
        var j = skipWs(s, i + 1)
        if (j < n && s.charAt(j) == ']') return j + 1
        while (true) {
          j = parseValue(s, j, out, depth + 1)
          j = skipWs(s, j)
          if (j < n && s.charAt(j) == ',') j = skipWs(s, j + 1)
          else if (j < n && s.charAt(j) == ']') return j + 1
          else throw bad
        }
        throw bad // unreachable
      case '"' =>
        out.append('\n')
        val j = parseString(s, i, out)
        out.append('\n')
        j
      case 't' =>
        if (s.regionMatches(i, "true", 0, 4)) i + 4 else throw bad
      case 'f' =>
        if (s.regionMatches(i, "false", 0, 5)) i + 5 else throw bad
      case 'n' =>
        if (s.regionMatches(i, "null", 0, 4)) i + 4 else throw bad
      case c if c == '-' || (c >= '0' && c <= '9') =>
        parseNumber(s, i)
      case _ => throw bad
    }
  }

  /** Parse the string at `i` (must be '"'); decoded chars append to
    * `out` when non-null. Returns index past the closing quote. */
  private def parseString(s: String, i: Int,
      out: java.lang.StringBuilder): Int = {
    val n = s.length
    var j = i + 1
    while (j < n) {
      val c = s.charAt(j)
      if (c == '"') return j + 1
      else if (c == '\\') {
        if (j + 1 >= n) throw bad
        s.charAt(j + 1) match {
          case '"' => if (out != null) out.append('"'); j += 2
          case '\\' => if (out != null) out.append('\\'); j += 2
          case '/' => if (out != null) out.append('/'); j += 2
          case 'b' => if (out != null) out.append('\b'); j += 2
          case 'f' => if (out != null) out.append('\f'); j += 2
          case 'n' => if (out != null) out.append('\n'); j += 2
          case 'r' => if (out != null) out.append('\r'); j += 2
          case 't' => if (out != null) out.append('\t'); j += 2
          case 'u' =>
            if (j + 6 > n) throw bad
            var code = 0
            var k = j + 2
            while (k < j + 6) {
              val d = Character.digit(s.charAt(k), 16)
              if (d < 0) throw bad
              code = code * 16 + d
              k += 1
            }
            if (out != null) out.append(code.toChar)
            j += 6
          case _ => throw bad
        }
      } else if (c < ' ') throw bad // raw control char: invalid JSON
      else { if (out != null) out.append(c); j += 1 }
    }
    throw bad // unterminated
  }

  private def parseNumber(s: String, i: Int): Int = {
    val n = s.length
    var j = i
    if (j < n && s.charAt(j) == '-') j += 1
    val intStart = j
    while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
    if (j == intStart) throw bad
    if (s.charAt(intStart) == '0' && j - intStart > 1) throw bad
    if (j < n && s.charAt(j) == '.') {
      j += 1
      val fs = j
      while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
      if (j == fs) throw bad
    }
    if (j < n && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
      j += 1
      if (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
      val es = j
      while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
      if (j == es) throw bad
    }
    j
  }

  /** The shared per-line collapse law ([[HtmlKernels.collapseLines]]). */
  private def collapse(decoded: String): String =
    HtmlKernels.collapseLines(decoded)

  /** `json_text(string)` — see [[JsonKernels]]. */
  case class JsonText(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "json_text"
    override protected def nullSafeEval(a: Any): Any =
      JsonKernels.jsonText(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.JsonKernels.jsonText($a);" +
          s"${ev.isNull} = ${ev.value} == null;")
    override def nullable: Boolean = true
    override protected def withNewChildInternal(newChild: Expression): JsonText =
      copy(child = newChild)
  }

  val jsonTextInfo: ExpressionInfo = new ExpressionInfo(
    classOf[JsonText].getName, null, "json_text",
    "_FUNC_(json) - harvest string VALUES (not keys) of one strictly-parsed JSON document as block lines: full escape decode, per-line collapse; NULL for malformed/trailing-garbage/over-deep input, '' for valid JSON with no string values.",
    "", "", "", "", "", "", "built-in")
}
