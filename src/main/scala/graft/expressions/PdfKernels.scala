package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * PDF text extraction (`pdf_text`) — the top non-HTML text carrier in
 * real crawls ships as `application/pdf`, and the WARC reader surfaces
 * its bytes and mime with nothing downstream able to read them. This is
 * the pure-JDK HONEST TIER (the `image_meta`/`video_meta` pattern): it
 * extracts what a simple-font, Flate-or-raw PDF actually carries and
 * returns NULL for what it cannot do soundly, never a guess.
 *
 * What it does:
 *   - walks every `stream … endstream` block; inflates `/FlateDecode`
 *     streams via `java.util.zip.Inflater` (closed in `finally` — the
 *     zlib native-leak law from the WARC reader applies verbatim);
 *     other filters (DCT, LZW, …) are skipped — they are images or
 *     exotica, not text;
 *   - runs a content-stream tokenizer over streams that contain a
 *     `BT … ET` text block: literal strings `(…)` with the full escape
 *     set (\n \r \t \b \f \( \) \\ octal \ddd, backslash-newline),
 *     hex strings `<…>`, arrays for `TJ`, names, numbers, inline
 *     dictionaries (skipped balanced);
 *   - text operators: `Tj`/`'`/`"` show a string (`'`/`"` break the
 *     line first), `TJ` shows an array (kern numbers ≤ −180/1000 em
 *     render as a word space — the conventional word-break threshold),
 *     `Td`/`TD` with a vertical component, `T*`, `Tm`, and `BT` break
 *     lines;
 *   - string bytes decode per the SELECTED FONT (`Tf` tracked): simple
 *     fonts via WinAnsiEncoding ≡ windows-1252 on every printable
 *     position (the sloppy-cp1252 table, matching `text_from_bytes`'
 *     fallback law); composite (Type0/CID) fonts via their `/ToUnicode`
 *     CMap — 2-byte big-endian codes through `bfchar`/`bfrange`
 *     entries (both dst forms), the CMap stream itself Flate or raw,
 *     resolved through the document's object table and `/Font`
 *     resource bindings (what CID-keyed subset fonts from modern
 *     generators need);
 *   - output is per-line whitespace-collapsed, empty lines dropped,
 *     lines joined with `\n` (the `html_to_text` line law, so the
 *     extraction feeds the same paragraph tiers).
 *
 * What it refuses (NULL):
 *   - bytes that do not begin with `%PDF-`;
 *   - encrypted documents (`/Encrypt` in dictionary text — string
 *     bytes would be ciphertext);
 *   - documents whose ONLY text is unknowable: show strings of a Type0
 *     font with no usable ToUnicode are glyph indices of a subset font
 *     and contribute nothing (never mojibake) — if nothing else
 *     decoded, the honest answer is refusal, not '';
 *   - anything that throws mid-walk (never propagates).
 *
 * A structurally valid PDF with no text AT ALL yields the empty string
 * (a scanned-image PDF is a real, common case — '' is the honest
 * answer, NULL would conflate it with corruption). Remaining documented
 * limits: objects inside compressed object streams (/ObjStm) are
 * invisible to the object walk (fonts hidden there fall back to
 * WinAnsi), and font resource names are resolved document-globally
 * (per-page rebinding of one name resolves last-wins).
 *
 * Reference analog: the S2 ingest parse (docker/lambda_function.py:64)
 * applied to the crawl's PDF mass.
 */
object PdfKernels {

  // ---------------------------------------------------------------- pdf_text

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val n = b.length - pat.length
    while (i <= n) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private val StreamKw = "stream".getBytes("ISO-8859-1")
  private val EndstreamKw = "endstream".getBytes("ISO-8859-1")
  private val DictOpen = "<<".getBytes("ISO-8859-1")

  /** Per-stream inflated-bytes cap — the same hostile-input law as
    * `graft.warc.maxShardBytes`: a tiny FlateDecode bomb inside a PDF
    * must not allocate hundreds of MB per row. Content streams carrying
    * text are tiny; Flate-compressed image XObjects can be tens of MB
    * and carry no text, so past the cap the STREAM is refused (null →
    * skipped), not the document. */
  private[graft] def maxInflateBytes: Int =
    Integer.getInteger("graft.pdf.maxInflateBytes", 32 << 20)

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val cap = maxInflateBytes
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(data.length * 4, 64), cap))
      val buf = new Array[Byte](8192)
      while (!inf.finished && !inf.needsInput) {
        val n = inf.inflate(buf)
        if (n > 0) {
          if (out.size.toLong + n > cap) return null // decompression bomb
          out.write(buf, 0, n)
        } else if (n == 0 && inf.needsDictionary) return null
      }
      if (out.size == 0) null else out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end() // the zlib native-leak law (WarcKernels:232)
  }

  /** Decode one WinAnsi byte (≡ sloppy cp1252 — the text_from_bytes
    * fallback table). */
  private def winAnsi(c: Int): Char = {
    if (c >= 0x80 && c <= 0x9f) ByteKernels.cp1252HighChar(c) else c.toChar
  }

  // ------------------------------------------------------- font model

  /** How show-string BYTES become text under the current font (PDF
    * strings are byte strings; the font's encoding gives them meaning). */
  private sealed trait FontMode
  /** Simple font: one byte per glyph, WinAnsi ≡ sloppy cp1252 — the
    * pre-CID tier's behavior, and the default for unresolved names. */
  private case object SimpleFont extends FontMode
  /** Composite (Type0) font WITH a ToUnicode CMap: `width`-byte
    * big-endian codes map through `cmap` (missing codes contribute
    * nothing and count as unknowable mass — no guessing). */
  private final case class CidFont(
      width: Int, cmap: java.util.HashMap[Integer, String]) extends FontMode
  /** Composite font WITHOUT a usable ToUnicode: show strings are glyph
    * indices of a subset font — unknowable by construction. */
  private case object CidUnknowable extends FontMode

  /** Mutable per-document marker: some show-string text existed that the
    * tier could not decode (CID without ToUnicode, or unmapped codes).
    * If the whole document decodes to '' AND this is set, pdf_text
    * refuses with NULL — "there was text, none of it readable" must not
    * masquerade as "text-free document". */
  private final class UnknowableMass { var seen = false }

  private def decodeShown(raw: Array[Byte], font: FontMode,
      mass: UnknowableMass): String = font match {
    case SimpleFont =>
      val sb = new java.lang.StringBuilder(raw.length)
      var i = 0
      while (i < raw.length) { sb.append(winAnsi(raw(i) & 0xff)); i += 1 }
      sb.toString
    case CidFont(width, cmap) =>
      val sb = new java.lang.StringBuilder(raw.length)
      var i = 0
      while (i + width <= raw.length) {
        var code = 0
        var k = 0
        while (k < width) { code = (code << 8) | (raw(i + k) & 0xff); k += 1 }
        val u = cmap.get(code)
        if (u != null) sb.append(u) else mass.seen = true
        i += width
      }
      if (i < raw.length) mass.seen = true // trailing partial code
      sb.toString
    case CidUnknowable =>
      if (raw.length > 0) mass.seen = true
      ""
  }

  /** Extract the text of one content stream into `out` (lines marked
    * with '\n'; final collapse happens once per document). `fonts` maps
    * resource names (e.g. "F1") selected by `Tf` to their decode mode;
    * names absent from the map decode as simple WinAnsi. */
  private def extractContent(c: Array[Byte], out: java.lang.StringBuilder,
      fonts: Map[String, FontMode], mass: UnknowableMass): Unit = {
    val n = c.length
    var i = 0
    var lastStr: Array[Byte] = null  // most recent complete string operand (raw)
    var lastArr: String = null       // most recent array operand (TJ form, decoded)
    var lastName: String = null      // most recent name operand (for Tf)
    var curFont: FontMode = SimpleFont
    var numStack = List.empty[Double]

    def parseString(from: Int): (Array[Byte], Int) = {
      // literal string starting at '(' — returns (raw bytes, index past ')')
      val sb = new java.io.ByteArrayOutputStream(32)
      var j = from + 1
      var depth = 1
      while (j < n && depth > 0) {
        val ch = c(j) & 0xff
        if (ch == '\\' && j + 1 < n) {
          val e = c(j + 1) & 0xff
          e match {
            case 'n' => sb.write('\n'); j += 2
            case 'r' => sb.write('\r'); j += 2
            case 't' => sb.write('\t'); j += 2
            case 'b' => sb.write('\b'); j += 2
            case 'f' => sb.write('\f'); j += 2
            case '(' => sb.write('('); j += 2
            case ')' => sb.write(')'); j += 2
            case '\\' => sb.write('\\'); j += 2
            case '\r' => j += (if (j + 2 < n && c(j + 2) == '\n') 3 else 2)
            case '\n' => j += 2
            case d if d >= '0' && d <= '7' =>
              var code = 0
              var k = j + 1
              while (k < n && k - j <= 3 && c(k) >= '0' && c(k) <= '7') {
                code = code * 8 + (c(k) - '0'); k += 1
              }
              sb.write(code & 0xff); j = k
            case other => sb.write(other); j += 2
          }
        } else if (ch == '(') { depth += 1; sb.write('('); j += 1 }
        else if (ch == ')') {
          depth -= 1
          if (depth > 0) sb.write(')')
          j += 1
        } else { sb.write(ch); j += 1 }
      }
      (sb.toByteArray, j)
    }

    def parseHex(from: Int): (Array[Byte], Int) = {
      val sb = new java.io.ByteArrayOutputStream(16)
      var j = from + 1
      var hi = -1
      while (j < n && c(j) != '>') {
        val ch = c(j) & 0xff
        val d =
          if (ch >= '0' && ch <= '9') ch - '0'
          else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
          else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
          else -1
        if (d >= 0) {
          if (hi < 0) hi = d
          else { sb.write(hi * 16 + d); hi = -1 }
        }
        j += 1
      }
      if (hi >= 0) sb.write(hi * 16) // odd count: pad 0
      (sb.toByteArray, if (j < n) j + 1 else n)
    }

    def parseArray(from: Int): (String, Int) = {
      // TJ operand: strings decoded under the CURRENT font and joined;
      // a kern ≤ -180 (thousandths of an em) is the conventional
      // word-break threshold
      val sb = new java.lang.StringBuilder(32)
      var j = from + 1
      while (j < n && c(j) != ']') {
        val ch = c(j) & 0xff
        if (ch == '(') {
          val (s, k) = parseString(j)
          sb.append(decodeShown(s, curFont, mass)); j = k
        } else if (ch == '<') {
          val (s, k) = parseHex(j)
          sb.append(decodeShown(s, curFont, mass)); j = k
        } else if (ch == '-' || (ch >= '0' && ch <= '9')) {
          var k = j + 1
          while (k < n && ((c(k) >= '0' && c(k) <= '9') || c(k) == '.')) k += 1
          val num = try new String(c, j, k - j, "ISO-8859-1").toDouble
                    catch { case _: NumberFormatException => 0.0 }
          if (num <= -180.0) sb.append(' ')
          j = k
        } else j += 1
      }
      (sb.toString, if (j < n) j + 1 else n)
    }

    def isDelim(ch: Int): Boolean =
      ch <= ' ' || ch == '(' || ch == ')' || ch == '<' || ch == '>' ||
        ch == '[' || ch == ']' || ch == '{' || ch == '}' || ch == '/' || ch == '%'

    var inText = false
    while (i < n) {
      val ch = c(i) & 0xff
      if (ch == '%') { // comment to EOL
        while (i < n && c(i) != '\n' && c(i) != '\r') i += 1
      } else if (ch == '(') {
        val (s, k) = parseString(i); lastStr = s; i = k
      } else if (ch == '<' && i + 1 < n && c(i + 1) == '<') {
        // inline dictionary (marked content props): skip balanced
        var depth = 0
        while (i < n && {
          if (c(i) == '<' && i + 1 < n && c(i + 1) == '<') { depth += 1; i += 2; true }
          else if (c(i) == '>' && i + 1 < n && c(i + 1) == '>') {
            depth -= 1; i += 2; depth > 0
          } else { i += 1; true }
        }) ()
      } else if (ch == '<') {
        val (s, k) = parseHex(i); lastStr = s; i = k
      } else if (ch == '[') {
        val (s, k) = parseArray(i); lastArr = s; i = k
      } else if (ch == '/') { // name: record for Tf
        val start = i + 1
        i += 1
        while (i < n && !isDelim(c(i) & 0xff)) i += 1
        lastName = new String(c, start, i - start, "ISO-8859-1")
      } else if (ch == '-' || ch == '+' || ch == '.' || (ch >= '0' && ch <= '9')) {
        var k = i + 1
        while (k < n && ((c(k) >= '0' && c(k) <= '9') || c(k) == '.')) k += 1
        val num = try new String(c, i, k - i, "ISO-8859-1").toDouble
                  catch { case _: NumberFormatException => 0.0 }
        numStack = num :: numStack.take(4)
        i = k
      } else if (!isDelim(ch)) { // operator token
        val start = i
        while (i < n && !isDelim(c(i) & 0xff)) i += 1
        val op = new String(c, start, i - start, "ISO-8859-1")
        op match {
          case "BT" => inText = true; out.append('\n')
          case "ET" => inText = false
          case "Tf" if lastName != null =>
            curFont = fonts.getOrElse(lastName, SimpleFont)
          case "Tj" if inText && lastStr != null =>
            out.append(decodeShown(lastStr, curFont, mass))
          case "'" if inText && lastStr != null =>
            out.append('\n'); out.append(decodeShown(lastStr, curFont, mass))
          case "\"" if inText && lastStr != null =>
            out.append('\n'); out.append(decodeShown(lastStr, curFont, mass))
          case "TJ" if inText && lastArr != null => out.append(lastArr)
          case "T*" if inText => out.append('\n')
          case "Td" | "TD" if inText =>
            // operands (tx ty …numStack is reversed): break on any
            // vertical motion
            if (numStack.headOption.exists(_ != 0.0)) out.append('\n')
          case "Tm" if inText => out.append('\n')
          case _ => ()
        }
        if (op == "Tj" || op == "'" || op == "\"") lastStr = null
        if (op == "TJ") lastArr = null
        numStack = Nil
      } else i += 1
    }
  }

  /** The shared per-line collapse law ([[HtmlKernels.collapseLines]]). */
  private def collapseLines(decoded: String): String =
    HtmlKernels.collapseLines(decoded)

  private val EncryptKw = "/Encrypt".getBytes("ISO-8859-1")

  /** True when '/Encrypt' appears OUTSIDE stream…endstream data spans —
    * i.e. in dictionary/trailer text, where a real encryption reference
    * lives (classic `trailer << /Encrypt n g R >>` and the xref-stream
    * dict alike). An occurrence inside stream DATA is page content or
    * ciphertext coincidence, not an encryption marker. */
  private def encryptDictPresent(b: Array[Byte]): Boolean = {
    // occurrences are monotone, so each is searched for ONCE and only
    // re-searched after a stream span consumed it — the no-/Encrypt
    // common case costs one scan, not one per stream object
    var at = 0
    var e = indexOf(b, EncryptKw, 0)
    while (at < b.length) {
      if (e < 0) return false
      val sk = indexOf(b, StreamKw, at)
      val limit = if (sk < 0) b.length else sk
      if (e < limit) return true
      if (sk < 0) return false
      val end = indexOf(b, EndstreamKw, sk + StreamKw.length)
      if (end < 0) return false // unterminated stream: rest is data
      at = end + EndstreamKw.length
      if (e < at) e = indexOf(b, EncryptKw, at)
    }
    false
  }

  // ---------------------------------------------- composite-font resolution

  private val ObjKw = "obj".getBytes("ISO-8859-1")
  private val EndobjKw = "endobj".getBytes("ISO-8859-1")
  private val Type0Kw = "/Type0".getBytes("ISO-8859-1")

  private def isDelimByte(ch: Int): Boolean =
    ch <= ' ' || ch == '(' || ch == ')' || ch == '<' || ch == '>' ||
      ch == '[' || ch == ']' || ch == '{' || ch == '}' || ch == '/' || ch == '%'

  /** Map object number → body span (after `N G obj`, before `endobj`),
    * skipping stream data so binary bytes spelling 'endobj' can't
    * truncate a span. Objects inside compressed object streams
    * (/ObjStm) are invisible to this walk — a documented tier limit
    * (fonts hidden there fall back to the simple-font decode). */
  private def parseObjects(b: Array[Byte]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var at = 0
    while (at < b.length) {
      val ok = indexOf(b, ObjKw, at)
      if (ok < 0) return out.toMap
      // not 'endobj', delimiter-terminated, preceded by "num gen"
      val isEndobj = ok >= 3 &&
        b(ok - 3) == 'e' && b(ok - 2) == 'n' && b(ok - 1) == 'd'
      var valid = !isEndobj &&
        (ok + 3 >= b.length || isDelimByte(b(ok + 3) & 0xff))
      var num = -1
      if (valid) {
        def skipWs(q0: Int): Int = {
          var q = q0
          while (q >= 0 && (b(q) == ' ' || b(q) == '\r' || b(q) == '\n' ||
            b(q) == '\t')) q -= 1
          q
        }
        var p = skipWs(ok - 1)
        val genEnd = p
        while (p >= 0 && b(p) >= '0' && b(p) <= '9') p -= 1
        if (p == genEnd) valid = false
        else {
          p = skipWs(p)
          val numEnd = p
          while (p >= 0 && b(p) >= '0' && b(p) <= '9') p -= 1
          if (p == numEnd || numEnd - p > 9) valid = false
          else num = new String(b, p + 1, numEnd - p, "ISO-8859-1").toInt
        }
      }
      if (!valid) at = ok + ObjKw.length
      else {
        val bodyStart = ok + ObjKw.length
        // find endobj, hopping over any stream…endstream data inside
        var scan = bodyStart
        var endAt = -1
        var more = true
        while (more) {
          val eo = indexOf(b, EndobjKw, scan)
          if (eo < 0) more = false
          else {
            val sk = indexOf(b, StreamKw, scan)
            val realStream = sk >= 0 && sk < eo && !(sk >= 3 &&
              b(sk - 3) == 'e' && b(sk - 2) == 'n' && b(sk - 1) == 'd')
            if (realStream) {
              val es = indexOf(b, EndstreamKw, sk + StreamKw.length)
              if (es < 0) more = false
              else scan = es + EndstreamKw.length
            } else { endAt = eo; more = false }
          }
        }
        if (endAt < 0) at = ok + ObjKw.length
        else { out(num) = (bodyStart, endAt); at = endAt + EndobjKw.length }
      }
    }
    out.toMap
  }

  /** Extract (and inflate if /FlateDecode) the stream data of one object
    * span; null when the object has no stream or inflation refuses. */
  private def objectStreamData(
      b: Array[Byte], span: (Int, Int)): Array[Byte] = {
    val (s, e) = span
    val sk = indexOf(b, StreamKw, s)
    if (sk < 0 || sk >= e) return null
    val dict = new String(b, s, sk - s, "ISO-8859-1")
    var dataStart = sk + StreamKw.length
    if (dataStart < b.length && b(dataStart) == '\r') dataStart += 1
    if (dataStart < b.length && b(dataStart) == '\n') dataStart += 1
    val end = indexOf(b, EndstreamKw, dataStart)
    if (end < 0) return null
    var dataEnd = end
    if (dataEnd > dataStart && b(dataEnd - 1) == '\n') dataEnd -= 1
    if (dataEnd > dataStart && b(dataEnd - 1) == '\r') dataEnd -= 1
    val raw = java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
    if (dict.contains("/FlateDecode")) inflate(raw)
    else if (dict.contains("/Filter")) null
    else raw
  }

  private val BfCharRe =
    "(?s)beginbfchar(.*?)endbfchar".r
  private val BfRangeRe =
    "(?s)beginbfrange(.*?)endbfrange".r
  private val HexPairRe =
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
  private val RangeRe =
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(?:<([0-9A-Fa-f]+)>|\\[((?:\\s*<[0-9A-Fa-f]+>)+)\\s*\\])".r
  private val CodespaceRe =
    "(?s)begincodespacerange\\s*<([0-9A-Fa-f]+)>".r

  /** UTF-16BE hex → String (4 hex digits per code unit; surrogate pairs
    * ride through as-is). */
  private def utf16Hex(hex: String): String = {
    val sb = new java.lang.StringBuilder(hex.length / 4 + 1)
    var i = 0
    while (i + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    if (i < hex.length) // short dst (e.g. 2 hex digits): one char
      sb.append(Integer.parseInt(hex.substring(i), 16).toChar)
    sb.toString
  }

  /** Increment the LAST UTF-16 code unit by `delta` — the bfrange law
    * ("the last byte of the string is incremented"). */
  private def bumpLast(base: String, delta: Int): String =
    if (base.isEmpty) base
    else base.substring(0, base.length - 1) +
      (base.charAt(base.length - 1) + delta).toChar

  /** Source-code hex → int, or -1 when it exceeds the supported 1–2
    * byte code space (4-byte surrogate-coded srcs — CJK Extension-B
    * subset fonts — are out of tier: the ENTRY is skipped, never a
    * parse exception that would refuse the whole document). */
  private def srcHex(hex: String): Int =
    if (hex.length > 4) -1 else Integer.parseInt(hex, 16)

  /** Parse a ToUnicode CMap: code width from the codespace range
    * (default 2 bytes — Identity-H), bfchar pairs, bfrange in both the
    * dst-start and dst-array forms. Bounded: a range wider than 65536
    * codes is hostile input and is clipped; srcs beyond the 2-byte
    * code space are skipped per-entry (see [[srcHex]]). */
  private def parseCMap(text: String): (Int, java.util.HashMap[Integer, String]) = {
    val map = new java.util.HashMap[Integer, String]()
    val width = CodespaceRe.findFirstMatchIn(text)
      .map(_.group(1).length / 2).filter(w => w == 1 || w == 2).getOrElse(2)
    for (sec <- BfCharRe.findAllMatchIn(text); m <- HexPairRe.findAllMatchIn(sec.group(1))) {
      val src = srcHex(m.group(1))
      if (src >= 0) map.put(src, utf16Hex(m.group(2)))
    }
    for (sec <- BfRangeRe.findAllMatchIn(text); m <- RangeRe.findAllMatchIn(sec.group(1))) {
      val lo = srcHex(m.group(1))
      val hi0 = srcHex(m.group(2))
      if (lo >= 0 && hi0 >= 0) {
        val hi = math.min(hi0, lo + 0xffff)
        if (m.group(3) != null) {
          val base = utf16Hex(m.group(3))
          var code = lo
          while (code <= hi) { map.put(code, bumpLast(base, code - lo)); code += 1 }
        } else {
          val dsts = HexRe.findAllMatchIn(m.group(4)).map(_.group(1)).toArray
          var k = 0
          while (k < dsts.length && lo + k <= hi) {
            map.put(lo + k, utf16Hex(dsts(k))); k += 1
          }
        }
      }
    }
    (width, map)
  }

  private val HexRe = "<([0-9A-Fa-f]+)>".r
  private val ToUnicodeRe = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
  // resource names run to the next delimiter — PDF name tokens legally
  // carry '.', '-', '#xx' escapes and more, and the Tf reader keeps the
  // raw spelling, so both sides must share the charset or bindings miss
  private val FontBindRe =
    "/([^\\s/<>\\[\\](){}%]+)\\s+(\\d+)\\s+\\d+\\s+R".r
  private val FontDictRe = "(?s)/Font\\s*<<(.*?)>>".r
  private val FontRefRe = "/Font\\s+(\\d+)\\s+\\d+\\s+R".r

  /** Resolve resource font names to decode modes. Called only when the
    * document mentions /Type0 at all (the simple-font fast path pays
    * nothing). Name bindings are collected across every /Font resource
    * dict in the document — per-page name collisions with different
    * bindings resolve last-wins, a documented approximation (real
    * generators bind consistently). */
  private def buildFontMap(b: Array[Byte]): Map[String, FontMode] = {
    val objs = parseObjects(b)
    if (objs.isEmpty) return Map.empty
    // Type0 font objects → their decode mode
    val type0 = scala.collection.mutable.Map.empty[Int, FontMode]
    for ((num, (s, e)) <- objs) {
      val sk = indexOf(b, StreamKw, s)
      val dictEnd = if (sk >= 0 && sk < e) sk else e
      val dict = new String(b, s, dictEnd - s, "ISO-8859-1")
      if (dict.contains("/Type0") && dict.contains("/Subtype")) {
        val mode = ToUnicodeRe.findFirstMatchIn(dict) match {
          case Some(m) =>
            val ref = m.group(1).toInt
            objs.get(ref).map(objectStreamData(b, _)) match {
              case Some(cm) if cm != null =>
                // a CMap the tier cannot parse is an UNUSABLE map for
                // THIS FONT — never an exception that refuses the doc
                try {
                  val (w, map) = parseCMap(new String(cm, "ISO-8859-1"))
                  if (map.isEmpty) CidUnknowable else CidFont(w, map)
                } catch {
                  case e if scala.util.control.NonFatal(e) => CidUnknowable
                }
              case _ => CidUnknowable
            }
          case None => CidUnknowable
        }
        type0(num) = mode
      }
    }
    if (type0.isEmpty) return Map.empty
    // resource bindings: /Font << /F1 5 0 R … >> INLINE in any object
    // dict, plus the indirect form /Font 9 0 R where object 9 IS the
    // name→ref dict (a common generator layout — without following the
    // ref, Type0 fonts stay unbound and decode as WinAnsi mojibake)
    def dictText(span: (Int, Int)): String = {
      val (s, e) = span
      val sk = indexOf(b, StreamKw, s)
      val dictEnd = if (sk >= 0 && sk < e) sk else e
      new String(b, s, dictEnd - s, "ISO-8859-1")
    }
    val out = scala.collection.mutable.Map.empty[String, FontMode]
    def bind(inner: String): Unit =
      for (m <- FontBindRe.findAllMatchIn(inner))
        type0.get(m.group(2).toInt).foreach(mode => out(m.group(1)) = mode)
    for ((_, span) <- objs) {
      val dict = dictText(span)
      if (dict.contains("/Font")) {
        for (fd <- FontDictRe.findAllMatchIn(dict)) bind(fd.group(1))
        for (fr <- FontRefRe.findAllMatchIn(dict);
             span2 <- objs.get(fr.group(1).toInt)) {
          val target = dictText(span2)
          // the referenced object is the font dict itself: its whole
          // body is name→ref pairs
          bind(target)
        }
      }
    }
    out.toMap
  }

  def pdfText(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    try {
      if (b.length < 8 || b(0) != '%' || b(1) != 'P' || b(2) != 'D' ||
        b(3) != 'F' || b(4) != '-') return null
      // encrypted: string/stream bytes are ciphertext — refuse honestly.
      // The scan covers DICTIONARY text only (classic trailers and
      // xref-stream dicts both live outside stream data), so raw
      // stream bytes that happen to contain '/Encrypt' don't falsely
      // refuse the document.
      if (encryptDictPresent(b)) return null
      // composite fonts: resolve names → decode modes only when the
      // document mentions /Type0 at all (simple PDFs pay one indexOf)
      val fonts: Map[String, FontMode] =
        if (indexOf(b, Type0Kw, 0) >= 0) buildFontMap(b) else Map.empty
      val mass = new UnknowableMass
      val out = new java.lang.StringBuilder(256)
      var at = 0
      var continue = true
      while (continue) {
        val sk = indexOf(b, StreamKw, at)
        if (sk < 0) continue = false
        else {
          // enclosing dict: nearest << before the keyword
          var dictAt = -1
          var probe = indexOf(b, DictOpen, math.max(0, at - 1))
          // walk << occurrences up to the stream keyword, keep the last
          var last = -1
          var p = probe
          while (p >= 0 && p < sk) { last = p; p = indexOf(b, DictOpen, p + 2) }
          dictAt = last
          val dict =
            if (dictAt >= 0) new String(b, dictAt, sk - dictAt, "ISO-8859-1")
            else ""
          var dataStart = sk + StreamKw.length
          if (dataStart < b.length && b(dataStart) == '\r') dataStart += 1
          if (dataStart < b.length && b(dataStart) == '\n') dataStart += 1
          val end = indexOf(b, EndstreamKw, dataStart)
          if (end < 0) continue = false
          else {
            var dataEnd = end
            if (dataEnd > dataStart && b(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && b(dataEnd - 1) == '\r') dataEnd -= 1
            val raw = java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
            val isFlate = dict.contains("/FlateDecode")
            val hasOtherFilter = !isFlate && dict.contains("/Filter")
            val content =
              if (isFlate) inflate(raw)
              else if (hasOtherFilter) null // images/exotica: not text
              else raw
            if (content != null &&
              indexOf(content, "BT".getBytes("ISO-8859-1"), 0) >= 0) {
              extractContent(content, out, fonts, mass)
            }
            at = end + EndstreamKw.length
          }
        }
      }
      val text = collapseLines(out.toString)
      // the unknowable-text law: a document whose ONLY text was
      // undecodable glyph indices refuses (NULL) — it is not
      // "text-free" ('' — the scanned-image case)
      if (text.isEmpty && mass.seen) null
      else UTF8String.fromString(text)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** `pdf_text(binary)` — see [[PdfKernels]]. */
  case class PdfText(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "pdf_text"
    override protected def nullSafeEval(a: Any): Any =
      PdfKernels.pdfText(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.PdfKernels.pdfText($a);" +
          s"${ev.isNull} = ${ev.value} == null;")
    override def nullable: Boolean = true
    override protected def withNewChildInternal(newChild: Expression): PdfText =
      copy(child = newChild)
  }

  val pdfTextInfo: ExpressionInfo = new ExpressionInfo(
    classOf[PdfText].getName, null, "pdf_text",
    "_FUNC_(binary) - pure-JDK PDF text tier: Flate/raw content streams, BT/ET text operators (Tj/TJ/'/\"/Td/TD/T*/Tm line law), WinAnsi simple-font decode, Type0/CID fonts via ToUnicode CMaps, per-line collapse; NULL for non-PDF, encrypted, or only-unknowable-text bytes, '' for a text-free PDF.",
    "", "", "", "", "", "", "built-in")

  // --------------------------------------------------------------- synth_pdf

  /** Deterministic closed-form PDF fixture per id (the synth_warc
    * pattern): a real single-page document — catalog, page tree,
    * WinAnsi Helvetica, computed xref — whose content stream exercises
    * one extraction arm per `id % 10`:
    *
    *   0. raw (uncompressed) stream, one `Tj` line
    *   1. FlateDecode stream, two lines via `Td`/`T*`
    *   2. `TJ` array with kern numbers (word break at ≤ −180) + a hex
    *      string on its own line
    *   3. the literal-string escape gauntlet (parens, octal, backslash,
    *      tab)
    *   4. WinAnsi high bytes by octal escape (café déjà vu)
    *   5. the `'` move-show operator
    *   6. ENCRYPTED (a /Encrypt trailer entry) → pdf_text must NULL
    *   7. CORRUPT (truncated header) → pdf_text must NULL
    *   8. CID/Type0 font WITH a Flate-compressed /ToUnicode CMap: codes
    *      offset by 0xE0 through a bfrange (a decoder ignoring the CMap
    *      reads garbage), space and an 'ff'→two-char expansion through
    *      bfchar — expected "cid ff <id>\nbeta" (the beta line dedups
    *      against arm 1's across encodings)
    *   9. CID/Type0 WITHOUT ToUnicode: glyph indices are unknowable →
    *      pdf_text must NULL (the honest refusal, distinct from '')
    */
  def synthPdf(id: Long): Array[Byte] = {
    val arm = ((id % 10) + 10) % 10
    if (arm == 7) return s"%PD${id}garbage".getBytes("ISO-8859-1")

    /** Encode text as 2-byte CID hex codes under the arm-8 CMap: space
      * → 0001, literal "ff" → the ligature code 0002, else char+0xE0. */
    def cidHex(text: String): String = {
      val sb = new java.lang.StringBuilder(text.length * 4)
      var i = 0
      while (i < text.length) {
        if (text.charAt(i) == ' ') { sb.append("0001"); i += 1 }
        else if (i + 1 < text.length && text.charAt(i) == 'f' &&
          text.charAt(i + 1) == 'f') { sb.append("0002"); i += 2 }
        else { sb.append(f"${text.charAt(i) + 0xE0}%04X"); i += 1 }
      }
      sb.toString
    }

    val content: Array[Byte] = arm match {
      case 0 => s"BT /F1 12 Tf 72 720 Td (Hello PDF $id) Tj ET".getBytes("ISO-8859-1")
      case 1 =>
        val raw = s"BT /F1 12 Tf 72 720 Td (alpha $id) Tj 0 -14 Td (beta) Tj ET"
          .getBytes("ISO-8859-1")
        deflate(raw)
      case 2 =>
        (s"BT /F1 12 Tf 72 720 Td [(Th) -50 (is) -260 (is T) -10 (J $id)] TJ " +
          "T* <48656C6C6F> Tj ET").getBytes("ISO-8859-1")
      case 3 =>
        (s"BT /F1 12 Tf (paren \\( \\) octal \\101 backslash \\\\ tab\\there $id) Tj ET")
          .getBytes("ISO-8859-1")
      case 4 =>
        "BT /F1 12 Tf (caf\\351 d\\351j\\340 vu) Tj ET".getBytes("ISO-8859-1")
      case 5 =>
        (s"BT /F1 12 Tf (first line) Tj (second $id) ' ET").getBytes("ISO-8859-1")
      case 6 => s"BT /F1 12 Tf (secret $id) Tj ET".getBytes("ISO-8859-1")
      case 8 =>
        (s"BT /F1 12 Tf 72 720 Td <${cidHex(s"cid ff $id")}> Tj " +
          s"T* <${cidHex("beta")}> Tj ET").getBytes("ISO-8859-1")
      case _ => // 9: CID codes with no ToUnicode anywhere
        "BT /F1 12 Tf <012304560187> Tj ET".getBytes("ISO-8859-1")
    }
    val flate = arm == 1
    val filter = if (flate) " /Filter /FlateDecode" else ""

    // objects 1..N in order; streams carry (dictPrefix, bytes)
    val objects = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def obj(num: Int, body: String): Unit =
      objects += s"$num 0 obj $body endobj\n".getBytes("ISO-8859-1")
    def streamObj(num: Int, dict: String, data: Array[Byte]): Unit = {
      val bos = new java.io.ByteArrayOutputStream(data.length + 64)
      bos.write(s"$num 0 obj << $dict /Length ${data.length} >>\nstream\n"
        .getBytes("ISO-8859-1"))
      bos.write(data, 0, data.length)
      bos.write("\nendstream endobj\n".getBytes("ISO-8859-1"))
      objects += bos.toByteArray
    }

    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    streamObj(4, if (flate) "/Filter /FlateDecode" else "", content)
    arm match {
      case 8 =>
        obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity-H " +
          "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>")
        obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth >>")
        val cmap = ("/CIDInit /ProcSet findresource begin\n12 dict begin\n" +
          "begincmap\n/CMapName /Synth-UCS def\n/CMapType 2 def\n" +
          "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
          "2 beginbfchar\n<0001> <0020>\n<0002> <00660066>\nendbfchar\n" +
          "1 beginbfrange\n<0100> <017E> <0020>\nendbfrange\n" +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
          .getBytes("ISO-8859-1")
        streamObj(7, "/Filter /FlateDecode", deflate(cmap))
      case 9 =>
        obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Synth-NoMap " +
          "/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
        obj(6, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth >>")
      case _ =>
        obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding /WinAnsiEncoding >>")
    }

    val bos = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = objects.map { ob =>
      val off = bos.size
      bos.write(ob, 0, ob.length)
      off
    }
    val xrefAt = bos.size
    w(s"xref\n0 ${objects.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    val enc = if (arm == 6) " /Encrypt 9 0 R" else ""
    w(s"trailer << /Size ${objects.length + 1} /Root 1 0 R$enc >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    bos.toByteArray
  }

  /** zlib-wrapped deflate (what /FlateDecode expects), closed in
    * `finally`. */
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** `synth_pdf(id)` — deterministic PDF fixture generator. */
  case class SynthPdf(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral id, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_pdf"
    override protected def nullSafeEval(a: Any): Any = a match {
      case l: java.lang.Long => PdfKernels.synthPdf(l)
      case i: java.lang.Integer => PdfKernels.synthPdf(i.toLong)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.expressions.PdfKernels.synthPdf((long) $a)")
    override protected def withNewChildInternal(newChild: Expression): SynthPdf =
      copy(child = newChild)
  }

  val synthPdfInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthPdf].getName, null, "synth_pdf",
    "_FUNC_(id) - deterministic closed-form PDF fixture: raw/Flate content streams, TJ kerning, escape gauntlet, WinAnsi bytes, ' operator, CID/ToUnicode arms, an encrypted arm and a corrupt arm.",
    "", "", "", "", "", "", "built-in")
}
