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
 *   - string bytes decode via WinAnsiEncoding ≡ windows-1252 on every
 *     printable position (the sloppy-cp1252 table, matching
 *     `text_from_bytes`' fallback law);
 *   - output is per-line whitespace-collapsed, empty lines dropped,
 *     lines joined with `\n` (the `html_to_text` line law, so the
 *     extraction feeds the same paragraph tiers).
 *
 * What it refuses (NULL):
 *   - bytes that do not begin with `%PDF-`;
 *   - encrypted documents (`/Encrypt` in the trailer — string bytes
 *     would be ciphertext);
 *   - anything that throws mid-walk (never propagates).
 *
 * A structurally valid PDF with no extractable text yields the empty
 * string (a scanned-image PDF is a real, common case — '' is the honest
 * answer, NULL would conflate it with corruption). Composite/CID fonts
 * with ToUnicode CMaps are out of tier: their show-strings are glyph
 * indices, which decode here as mojibake only if the page also lacks
 * simple-font text — documented, like VP8-lossy pixel decode.
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

  /** Extract the text of one content stream into `out` (lines marked
    * with '\n'; final collapse happens once per document). */
  private def extractContent(c: Array[Byte], out: java.lang.StringBuilder): Unit = {
    val n = c.length
    var i = 0
    var lastStr: String = null       // most recent complete string operand
    var lastArr: String = null       // most recent array operand (TJ form)
    var numStack = List.empty[Double]

    def parseString(from: Int): (String, Int) = {
      // literal string starting at '(' — returns (decoded, index past ')')
      val sb = new java.lang.StringBuilder(32)
      var j = from + 1
      var depth = 1
      while (j < n && depth > 0) {
        val ch = c(j) & 0xff
        if (ch == '\\' && j + 1 < n) {
          val e = c(j + 1) & 0xff
          e match {
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'b' => sb.append('\b'); j += 2
            case 'f' => sb.append('\f'); j += 2
            case '(' => sb.append('('); j += 2
            case ')' => sb.append(')'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case '\r' => j += (if (j + 2 < n && c(j + 2) == '\n') 3 else 2)
            case '\n' => j += 2
            case d if d >= '0' && d <= '7' =>
              var code = 0
              var k = j + 1
              while (k < n && k - j <= 3 && c(k) >= '0' && c(k) <= '7') {
                code = code * 8 + (c(k) - '0'); k += 1
              }
              sb.append(winAnsi(code & 0xff)); j = k
            case other => sb.append(winAnsi(other)); j += 2
          }
        } else if (ch == '(') { depth += 1; sb.append('('); j += 1 }
        else if (ch == ')') {
          depth -= 1
          if (depth > 0) sb.append(')')
          j += 1
        } else { sb.append(winAnsi(ch)); j += 1 }
      }
      (sb.toString, j)
    }

    def parseHex(from: Int): (String, Int) = {
      val sb = new java.lang.StringBuilder(16)
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
          else { sb.append(winAnsi(hi * 16 + d)); hi = -1 }
        }
        j += 1
      }
      if (hi >= 0) sb.append(winAnsi(hi * 16)) // odd count: pad 0
      (sb.toString, if (j < n) j + 1 else n)
    }

    def parseArray(from: Int): (String, Int) = {
      // TJ operand: strings joined; a kern ≤ -180 (thousandths of an em)
      // is the conventional word-break threshold
      val sb = new java.lang.StringBuilder(32)
      var j = from + 1
      while (j < n && c(j) != ']') {
        val ch = c(j) & 0xff
        if (ch == '(') { val (s, k) = parseString(j); sb.append(s); j = k }
        else if (ch == '<') { val (s, k) = parseHex(j); sb.append(s); j = k }
        else if (ch == '-' || (ch >= '0' && ch <= '9')) {
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
      } else if (ch == '/') { // name: skip
        i += 1
        while (i < n && !isDelim(c(i) & 0xff)) i += 1
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
          case "Tj" if inText && lastStr != null => out.append(lastStr)
          case "'" if inText && lastStr != null =>
            out.append('\n'); out.append(lastStr)
          case "\"" if inText && lastStr != null =>
            out.append('\n'); out.append(lastStr)
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

  /** Per-line whitespace collapse — the html_to_text pass-3 law. */
  private def collapseLines(decoded: String): String = {
    val m = decoded.length
    val out = new java.lang.StringBuilder(m)
    var pendingBreak = false
    var pendingSpace = false
    var j = 0
    while (j < m) {
      val c = decoded.charAt(j)
      if (c == '\n') pendingBreak = true
      else if (Character.isWhitespace(c)) pendingSpace = true
      else {
        if (pendingBreak) { if (out.length > 0) out.append('\n') }
        else if (pendingSpace && out.length > 0) out.append(' ')
        pendingBreak = false; pendingSpace = false
        out.append(c)
      }
      j += 1
    }
    out.toString
  }

  private val EncryptKw = "/Encrypt".getBytes("ISO-8859-1")

  /** True when '/Encrypt' appears OUTSIDE stream…endstream data spans —
    * i.e. in dictionary/trailer text, where a real encryption reference
    * lives (classic `trailer << /Encrypt n g R >>` and the xref-stream
    * dict alike). An occurrence inside stream DATA is page content or
    * ciphertext coincidence, not an encryption marker. */
  private def encryptDictPresent(b: Array[Byte]): Boolean = {
    var at = 0
    while (at < b.length) {
      val sk = indexOf(b, StreamKw, at)
      val limit = if (sk < 0) b.length else sk
      val e = indexOf(b, EncryptKw, at)
      if (e >= 0 && e < limit) return true
      if (sk < 0) return false
      val end = indexOf(b, EndstreamKw, sk + StreamKw.length)
      if (end < 0) return false // unterminated stream: rest is data
      at = end + EndstreamKw.length
    }
    false
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
              extractContent(content, out)
            }
            at = end + EndstreamKw.length
          }
        }
      }
      UTF8String.fromString(collapseLines(out.toString))
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
    "_FUNC_(binary) - pure-JDK PDF text tier: Flate/raw content streams, BT/ET text operators (Tj/TJ/'/\"/Td/TD/T*/Tm line law), WinAnsi string decode, per-line collapse; NULL for non-PDF or encrypted bytes, '' for a text-free PDF.",
    "", "", "", "", "", "", "built-in")

  // --------------------------------------------------------------- synth_pdf

  /** Deterministic closed-form PDF fixture per id (the synth_warc
    * pattern): a real single-page document — catalog, page tree,
    * WinAnsi Helvetica, computed xref — whose content stream exercises
    * one extraction arm per `id % 8`:
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
    */
  def synthPdf(id: Long): Array[Byte] = {
    val arm = ((id % 8) + 8) % 8
    if (arm == 7) return s"%PD${id}garbage".getBytes("ISO-8859-1")
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
      case _ => s"BT /F1 12 Tf (secret $id) Tj ET".getBytes("ISO-8859-1")
    }
    val flate = arm == 1
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val bos = new java.io.ByteArrayOutputStream(1024)
    val offsets = new Array[Int](6)
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    offsets(0) = bos.size
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(1) = bos.size
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(2) = bos.size
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(3) = bos.size
    w(s"4 0 obj << /Length ${content.length}$filter >>\nstream\n")
    bos.write(content, 0, content.length)
    w("\nendstream endobj\n")
    offsets(4) = bos.size
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >> endobj\n")
    val xrefAt = bos.size
    w("xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    val enc = if (arm == 6) " /Encrypt 9 0 R" else ""
    w(s"trailer << /Size 6 /Root 1 0 R$enc >>\nstartxref\n$xrefAt\n%%EOF\n")
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
    "_FUNC_(id) - deterministic closed-form PDF fixture: raw/Flate content streams, TJ kerning, escape gauntlet, WinAnsi bytes, ' operator, an encrypted arm and a corrupt arm.",
    "", "", "", "", "", "", "built-in")
}
