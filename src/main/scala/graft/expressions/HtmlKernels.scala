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
    UTF8String.fromString(unescapeString(s))
  }

  /** String-level body of [[unescape]] — shared with [[toText]], whose
    * tag-strip pass already owns a String. */
  private[expressions] def unescapeString(s: String): String = {
    if (s.indexOf('&') < 0) return s
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
    sb.toString
  }

  val unescapeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[HtmlUnescape].getName, null, "html_unescape",
    "_FUNC_(s) - decode the six ubiquitous named HTML entities plus bounded numeric character references (printable ASCII + common punctuation); anything else survives verbatim.",
    "", "", "", "", "", "", "built-in")

  /**
   * BLOCK-STRUCTURED HTML→text extraction (`html_to_text`) — the
   * crawl-chain rung [[graft.ops.TextOps.stripHtml]] cannot be: that
   * helper collapses ALL whitespace to single spaces, so a raw-HTML feed
   * reaches the within-doc / corpus-wide PARAGRAPH dedup tiers and
   * CCNet-style boilerplate removal as ONE line per document and both
   * stages silently no-op. This kernel preserves the document's block
   * structure as newlines so the line-level curation tiers operate on
   * exactly the units a production extractor (trafilatura / jusText /
   * CCNet's WET step) hands them.
   *
   * One left-to-right pass, native codegen'd expression:
   *
   *   - NON-CONTENT SUBTREES are dropped whole: `script`/`style` as
   *     HTML raw-text elements (content skipped to the matching close
   *     tag — a `<` inside JS never re-enters the parser), and
   *     `head`/`nav`/`footer`/`aside` with same-tag depth counting
   *     (chrome, not prose). An unclosed drop-subtree swallows to end
   *     of input — degrade to LESS text, never guess — with one
   *     spec-mandated exception: `<body` ends an unclosed `<head>`
   *     (HTML5 makes `</head>` optional; real pages omit it).
   *   - BLOCK BOUNDARIES emit a newline: `p div br li h1–h6 tr
   *     blockquote pre` (open and close; also the dropped subtrees'
   *     edges). Every other tag — inline markup — emits a single
   *     space, never zero width: `foo<b>bar</b>` keeps its author
   *     spacing law from stripHtml and per-line collapse absorbs it.
   *   - Comments (`<!-- -->`), doctypes (`<! >`), and processing
   *     instructions (`<? >`) vanish; `>` inside a quoted attribute
   *     value does not close its tag (the regex strip's known hole).
   *   - Entities decode via the [[unescape]] law (after tag strip, so
   *     a decoded `&lt;` is literal text, never re-parsed; no entity
   *     in the bounded safe set decodes to a newline).
   *   - Finally whitespace collapses PER LINE (the fix for
   *     stripHtml's global collapse): runs of intra-line whitespace
   *     become one space, lines are trimmed, empty lines drop, lines
   *     join with `\n`.
   *
   * Malformed markup degrades gracefully (unclosed tag strips to end,
   * stray `>` is text, never throws); null in → null out; a page with
   * no prose yields the empty string. Reference analog: the S2 ingest
   * parse (docker/lambda_function.py:64) applied to crawl HTML.
   */
  case class HtmlToText(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "html_to_text"
    override protected def nullSafeEval(a: Any): Any =
      HtmlKernels.toText(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.HtmlKernels.toText($a)")
    override protected def withNewChildInternal(newChild: Expression): HtmlToText =
      copy(child = newChild)
  }

  /** Subtrees whose content is chrome, not prose. `script`/`style` are
    * handled as raw-text elements separately. */
  private val dropSubtrees = Set("head", "nav", "footer", "aside")

  /** Tags whose open OR close is a block boundary (→ newline). */
  private val blockTags = Set(
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "blockquote", "pre",
    // structural containers: their edges are block boundaries too (they
    // never sit mid-sentence), and the dropped subtrees' edges
    "html", "body", "head", "nav", "footer", "aside",
    "table", "ul", "ol", "section", "article", "header", "main", "title")

  /** XML-mode block boundaries: the HTML set (feeds embed XHTML) plus
    * the RSS/Atom element vocabulary — each feed field is its own line
    * unit for the paragraph tiers. */
  private val xmlBlockTags = blockTags ++ Set(
    "item", "entry", "channel", "feed", "rss", "description", "summary",
    "content", "subtitle", "author", "name", "category", "link", "guid",
    "pubdate", "updated", "published", "id", "enclosure")

  /** XML-mode SKIP subtrees: pure-metadata feed elements whose text is
    * URLs, URNs, and timestamps — schema, not prose (the same law that
    * keeps json_text from harvesting keys). Left in, every item would
    * ship unique-per-doc noise lines that inflate dedup keys and skew
    * the quality/language gates. */
  private val xmlMetaTags = Set(
    "link", "guid", "pubdate", "updated", "published", "id", "enclosure")

  /** XML-mode PROSE CONTAINERS: feed elements whose content is MARKUP
    * by convention — RSS `description` and Atom `content`/`summary`
    * ship HTML either entity-ESCAPED (`&lt;p&gt;…`, the dominant real
    * form) or inside CDATA. Their raw content gets ONE transport-layer
    * entity decode (CDATA spans excluded — CDATA is already literal)
    * and then the html-mode pass, so embedded tags become structure
    * instead of literal `<p>` noise lines. The html pass's own entity
    * decode then handles the CONTENT-layer entities — two decodes is
    * exactly right for escaped html, one for CDATA, and a plain-text
    * value passes through unchanged (no tags, '&' alone survives). */
  private val xmlProseTags = Set("description", "content", "summary")

  /** One feed prose container's raw inner text → extracted text: the
    * transport decode + html pass described at [[xmlProseTags]]. */
  private def feedProseContent(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val cd = raw.indexOf("<![CDATA[", i)
      if (cd < 0) {
        sb.append(unescapeString(raw.substring(i)))
        i = raw.length
      } else {
        sb.append(unescapeString(raw.substring(i, cd)))
        val end = raw.indexOf("]]>", cd + 9)
        val inner =
          if (end < 0) raw.substring(cd + 9) else raw.substring(cd + 9, end)
        sb.append(inner) // literal markup: the html pass decodes once
        i = if (end < 0) raw.length else end + 3
      }
    }
    toTextString(sb.toString, xml = false)
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9')

  /** Lowercased tag name starting at `from` (first name char), or "" if
    * none. */
  private def tagName(s: String, from: Int): String = {
    var j = from
    val n = s.length
    val sb = new java.lang.StringBuilder(8)
    while (j < n && isNameChar(s.charAt(j)) && sb.length < 16) {
      val c = s.charAt(j)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      j += 1
    }
    sb.toString
  }

  /** Index just past the tag's closing `>`, honoring quoted attribute
    * values; `n` when the tag never closes (strip-to-end law). */
  private def skipTag(s: String, from: Int): Int = {
    var j = from
    val n = s.length
    var quote: Char = 0
    while (j < n) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    n
  }

  /** Case-insensitive search for `</name` at or after `from`; returns the
    * index of the `<`, or -1. */
  private def findClose(s: String, from: Int, name: String): Int = {
    var j = from
    val n = s.length
    val m = name.length
    while (j + m + 1 < n) {
      if (s.charAt(j) == '<' && s.charAt(j + 1) == '/' &&
          s.regionMatches(true, j + 2, name, 0, m) &&
          (j + 2 + m >= n || !isNameChar(s.charAt(j + 2 + m)))) return j
      j += 1
    }
    -1
  }

  /** Static kernel for [[HtmlToText]]. */
  def toText(html: UTF8String): UTF8String = {
    if (html == null) return null
    UTF8String.fromString(toTextString(html.toString))
  }

  private[expressions] def toTextString(s: String): String =
    toTextString(s, xml = false)

  /** Shared tag-walk body. `xml = true` is the FEED mode: no chrome
    * subtrees are dropped (RSS/Atom have no head/nav), the block set
    * grows the feed vocabulary, and `<![CDATA[…]]>` content — where
    * real feeds embed escaped HTML — is extracted by ONE nested
    * html-mode pass (CDATA cannot nest) framed as its own block. */
  private[expressions] def toTextString(s: String, xml: Boolean): String = {
    val n = s.length
    val blocks = if (xml) xmlBlockTags else blockTags
    // subtrees whose CONTENT is dropped whole: html chrome, or the
    // feed metadata elements (URLs/timestamps are schema, not prose)
    val skips = if (xml) xmlMetaTags else dropSubtrees
    // pass 1: strip tags, drop non-content subtrees, mark block
    // boundaries with '\n' and inline-tag sites with ' '
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') { sb.append(c); i += 1 }
      else if (xml && s.regionMatches(i + 1, "![CDATA[", 0, 8)) {
        val end = s.indexOf("]]>", i + 9)
        val inner = if (end < 0) s.substring(i + 9)
                    else s.substring(i + 9, end)
        // literal character data; embedded-HTML shape extracted by the
        // html law (the dominant real feed form). Escape the decoded
        // text's '&' so pass 2's entity decode cannot double-decode
        // CDATA content (it is literal by definition).
        sb.append('\n')
        sb.append(toTextString(inner, xml = false).replace("&", "&amp;"))
        sb.append('\n')
        i = if (end < 0) n else end + 3
      } else if (s.regionMatches(i + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
        i = skipTag(s, i + 2)
      } else {
        val isClose = i + 1 < n && s.charAt(i + 1) == '/'
        val name = tagName(s, if (isClose) i + 2 else i + 1)
        if (name.isEmpty) { sb.append(c); i += 1 } // stray '<' is text
        else {
          if (blocks.contains(name)) sb.append('\n') else sb.append(' ')
          i = skipTag(s, i + 1)
          // a self-closed tag (<enclosure url=… /> — the usual feed
          // form) has no subtree to skip; entering the skip would
          // swallow to end of input looking for a close that never comes
          val selfClosing = i >= 2 && s.charAt(i - 2) == '/'
          if (xml && !isClose && !selfClosing && xmlProseTags.contains(name)) {
            // feed prose container: capture raw content, transport-
            // decode, html-mode extract — escaped and CDATA markup
            // alike become structure ([[feedProseContent]]); the
            // re-escape keeps the outer pass-2 from double-decoding
            val close = findClose(s, i, name)
            val raw = if (close < 0) s.substring(i) else s.substring(i, close)
            sb.append('\n')
            sb.append(feedProseContent(raw).replace("&", "&amp;"))
            sb.append('\n')
            i = if (close < 0) n else skipTag(s, close + 2 + name.length)
          } else if (!isClose && !selfClosing &&
              (name == "script" || name == "style")) {
            // raw-text element: content is code, skip to the close tag
            val close = findClose(s, i, name)
            i = if (close < 0) n else skipTag(s, close + 2 + name.length)
          } else if (!isClose && !selfClosing && skips.contains(name)) {
            // chrome subtree: skip to the matching close with same-tag
            // depth counting; an unclosed <head> ends at <body>
            var depth = 1
            while (depth > 0 && i < n) {
              val lt = s.indexOf('<', i)
              if (lt < 0) { i = n }
              else if (s.regionMatches(true, lt + 1, name, 0, name.length) &&
                  (lt + 1 + name.length >= n ||
                    !isNameChar(s.charAt(lt + 1 + name.length)))) {
                depth += 1; i = skipTag(s, lt + 1)
              } else if (s.charAt(lt + 1) == '/' &&
                  s.regionMatches(true, lt + 2, name, 0, name.length) &&
                  (lt + 2 + name.length >= n ||
                    !isNameChar(s.charAt(lt + 2 + name.length)))) {
                depth -= 1; i = skipTag(s, lt + 1)
              } else if (name == "head" &&
                  s.regionMatches(true, lt + 1, "body", 0, 4) &&
                  (lt + 5 >= n || !isNameChar(s.charAt(lt + 5)))) {
                // HTML5: </head> is optional — body opens, head is over
                depth = 0; i = lt
              } else i = lt + 1
            }
            sb.append('\n')
          }
        }
      }
    }
    // pass 2: entity decode (no safe entity decodes to a newline, so the
    // line structure above is final)
    val decoded = unescapeString(sb.toString)
    // pass 3: the shared line law
    collapseLines(decoded)
  }

  /** THE per-line whitespace-collapse law — trim each line, single
    * spaces within, drop empties, join with '\n'. One implementation
    * shared by every text tier (html/xml pass 3, pdf_text, json_text)
    * so the cross-media dedup contract — same line units everywhere —
    * cannot silently diverge. */
  private[expressions] def collapseLines(decoded: String): String = {
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

  val toTextInfo: ExpressionInfo = new ExpressionInfo(
    classOf[HtmlToText].getName, null, "html_to_text",
    "_FUNC_(html) - block-structured HTML to text: drops script/style/head/nav/footer/aside subtrees, newline at block-tag boundaries (p div br li h1-h6 tr blockquote pre ...), entity decode, per-line whitespace collapse.",
    "", "", "", "", "", "", "built-in")

  /**
   * Document TITLE extraction (`html_title`) — the field [[HtmlToText]]
   * rightly cannot produce: it drops the whole `head` subtree as chrome,
   * but the retrieval tier's BM25F ships a WEIGHTED TITLE FIELD
   * ([[graft.ops.Retrieval]]), which a crawl feed could never populate.
   * This kernel is the missing rung: the FIRST `<title>` element's text
   * before any `<body>` open (a `<title>` inside body markup — SVG —
   * is not the document title), entity-decoded by the [[unescape]] law,
   * whitespace-collapsed to a single trimmed line.
   *
   * Laws: no `<title>` before body → NULL (absence is not an empty
   * title); `<title></title>` → '' (present but empty); script/style
   * raw-text content is skipped first (a title spelled inside JS is
   * code, not a title); an unclosed `<title>` captures to end of input
   * (the strip-to-end law). Null in → null out.
   */
  case class HtmlTitle(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "html_title"
    override protected def nullSafeEval(a: Any): Any =
      HtmlKernels.title(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.HtmlKernels.title($a);" +
          s"${ev.isNull} = ${ev.value} == null;")
    override protected def withNewChildInternal(newChild: Expression): HtmlTitle =
      copy(child = newChild)
  }

  /** Static kernel for [[HtmlTitle]]. */
  def title(html: UTF8String): UTF8String = {
    if (html == null) return null
    val t = titleString(html.toString)
    if (t == null) null else UTF8String.fromString(t)
  }

  private[expressions] def titleString(s: String): String = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') i += 1
      else if (s.regionMatches(i + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
        i = skipTag(s, i + 2)
      } else {
        val isClose = i + 1 < n && s.charAt(i + 1) == '/'
        val name = tagName(s, if (isClose) i + 2 else i + 1)
        if (name.isEmpty) i += 1 // stray '<' is text
        else if (!isClose && name == "body") return null // head is over
        else if (!isClose && (name == "script" || name == "style")) {
          i = skipTag(s, i + 1)
          val close = findClose(s, i, name)
          i = if (close < 0) n else skipTag(s, close + 2 + name.length)
        } else if (!isClose && name == "title") {
          i = skipTag(s, i + 1)
          val close = findClose(s, i, "title")
          val raw = if (close < 0) s.substring(i) else s.substring(i, close)
          val decoded = unescapeString(raw)
          // single-line collapse: runs of whitespace → one space, trimmed
          val out = new java.lang.StringBuilder(decoded.length)
          var pendingSpace = false
          var j = 0
          while (j < decoded.length) {
            val ch = decoded.charAt(j)
            if (Character.isWhitespace(ch)) pendingSpace = true
            else {
              if (pendingSpace && out.length > 0) out.append(' ')
              pendingSpace = false
              out.append(ch)
            }
            j += 1
          }
          return out.toString
        } else i = skipTag(s, i + 1)
      }
    }
    null
  }

  val titleInfo: ExpressionInfo = new ExpressionInfo(
    classOf[HtmlTitle].getName, null, "html_title",
    "_FUNC_(html) - first <title> text before any <body>: entity-decoded, whitespace-collapsed to one line; NULL when absent, '' when present but empty.",
    "", "", "", "", "", "", "built-in")

  /**
   * XML/RSS/Atom → text (`xml_text`) — the feed rung of the mime
   * router: [[HtmlToText]]'s one-pass block law under the XML rules.
   * No chrome subtrees (feeds have no head/nav to drop), the block set
   * grows the RSS/Atom element vocabulary (`item`, `entry`, `title`,
   * `description`, `summary`, `content`, …) so each feed field is its
   * own line unit, and `<![CDATA[…]]>` sections — where real feeds ship
   * escaped HTML — are extracted by one nested html-mode pass (CDATA
   * cannot nest) and framed as their own block. Entities decode by the
   * [[unescape]] law OUTSIDE CDATA only (CDATA is literal by
   * definition). Same per-line collapse; null in → null out.
   */
  case class XmlText(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "xml_text"
    override protected def nullSafeEval(a: Any): Any =
      HtmlKernels.xmlText(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.HtmlKernels.xmlText($a)")
    override protected def withNewChildInternal(newChild: Expression): XmlText =
      copy(child = newChild)
  }

  /** Static kernel for [[XmlText]]. */
  def xmlText(x: UTF8String): UTF8String = {
    if (x == null) return null
    UTF8String.fromString(toTextString(x.toString, xml = true))
  }

  val xmlTextInfo: ExpressionInfo = new ExpressionInfo(
    classOf[XmlText].getName, null, "xml_text",
    "_FUNC_(xml) - feed-mode block extraction: RSS/Atom element vocabulary as block boundaries, CDATA content through the html law, entity decode outside CDATA, per-line collapse.",
    "", "", "", "", "", "", "built-in")
}
