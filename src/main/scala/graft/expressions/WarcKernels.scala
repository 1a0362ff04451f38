package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Pure-JDK WARC (ISO 28500) shard reader — the format crawl corpora
 * actually arrive in (Common Crawl ships `*.warc.gz` shards of ~1 GiB,
 * one gzip MEMBER per record). `warc_records(bytes)` parses a whole
 * shard into an array of record structs, composing as
 * `binaryFile scan → explode(warc_records(content)) → text_from_bytes →
 * strip_html → …` — the rung that makes the crawl-ingest capstone
 * end-to-end real from on-disk crawl bytes.
 *
 * Framing: gzip is detected by magic (1F 8B) and decompressed with
 * `java.util.zip.GZIPInputStream`, which walks concatenated members —
 * per-record members, whole-file compression, and plain uncompressed
 * WARC all parse identically. Records parse sequentially: version line
 * (`WARC/…`), headers to the blank line, `Content-Length` bytes of
 * block, the separating CRLFs. For `response` records whose
 * Content-Type is an HTTP envelope the status line and headers are
 * parsed off, a `chunked` Transfer-Encoding body is de-chunked, and the
 * struct carries the HTTP body + Content-Type + status; every other
 * record type carries its raw block and WARC Content-Type.
 *
 * Malformation policy (the Jsonl PERMISSIVE analog): a structurally
 * broken record — bad version line, missing/short Content-Length —
 * cannot be resynchronized without guessing, so the walk STOPS THERE
 * and appends one `_corrupt` sentinel record (all fields null); the
 * records before it are kept and the sentinel is the ledger's queryable
 * corrupt count. A malformed HTTP envelope inside a well-framed
 * response record degrades softly instead: null status, WARC
 * Content-Type, raw block as content. Truncated gzip → the records
 * decompressed so far + the sentinel. Never throws.
 *
 * Memory: the array is bounded by one shard's decompressed size — the
 * Common Crawl shard layout (≈1 GiB gz) is sized for exactly this
 * one-task-per-shard shape, and projection/filtering prune immediately
 * after the explode.
 */
object WarcKernels {

  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("ts", StringType),
    StructField("mime", StringType),
    StructField("status", IntegerType),
    StructField("content", BinaryType)))

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Read one header line (to LF, CR stripped); null at EOF. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val b = buf.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
    new String(b, 0, n, Ascii)
  }

  /** Hard cap on one record's declared Content-Length (256 MiB — far
    * above any sane crawl record; override with
    * `-Dgraft.warc.maxRecordBytes`). The declared length is UNTRUSTED
    * header input: allocating it up front would let a hostile ~2 GiB
    * declaration OOM the executor before a single byte is read, so
    * oversized declarations degrade to the _corrupt sentinel and the
    * buffer grows in bounded chunks as real bytes actually arrive. */
  private def maxRecordBytes: Long =
    sys.props.get("graft.warc.maxRecordBytes").map(_.toLong)
      .getOrElse(256L << 20)

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    if (n > maxRecordBytes)
      throw new EOFException(s"declared record length $n exceeds cap")
    if (n <= (4L << 20)) {
      // sane declaration (the overwhelmingly common crawl case): ONE
      // exact allocation read in place — no chunk buffer, no final
      // copy (the r17 grow-as-read form cost a full extra copy per
      // record, A/B-visible on q_src_warc). A lying small header still
      // meets EOF below with at most 4 MiB transiently allocated.
      val out = new Array[Byte](n.toInt)
      var off = 0
      while (off < out.length) {
        val k = in.read(out, off, out.length - off)
        if (k < 0) throw new EOFException("short block")
        off += k
      }
      out
    } else {
      // large declaration: grow-as-read — the header is UNTRUSTED and
      // only sizes the first chunk hint, never the full claim, so a
      // hostile ~256 MiB declaration cannot allocate ahead of real bytes
      val out = new ByteArrayOutputStream(1 << 16)
      val buf = new Array[Byte](1 << 16)
      var remaining = n
      while (remaining > 0) {
        val k = in.read(buf, 0, math.min(remaining, buf.length.toLong).toInt)
        if (k < 0) throw new EOFException("short block")
        out.write(buf, 0, k)
        remaining -= k
      }
      out.toByteArray
    }
  }

  /** Per-shard decompressed-bytes cap (default 1 GiB; override with
    * `-Dgraft.warc.maxShardBytes`): parseWarc materializes a shard's
    * records as one array value, so a shard whose DECOMPRESSED size is
    * unbounded (a gzip bomb, or a real multi-GiB raw shard) must stop
    * the walk with the _corrupt sentinel — counted in ingestStats —
    * instead of hitting executor OOM or the 2 GiB JVM array limit. */
  private def maxShardBytes: Long =
    sys.props.get("graft.warc.maxShardBytes").map(_.toLong)
      .getOrElse(1L << 30)

  /** Counts decompressed bytes as they are consumed; crossing the cap
    * raises EOFException, which the parse loop's NonFatal handler turns
    * into the one _corrupt sentinel. */
  private final class BoundedIn(under: InputStream, limit: Long)
      extends java.io.FilterInputStream(under) {
    private var count = 0L
    private def bump(n: Int): Int = {
      if (n > 0) {
        count += n
        if (count > limit)
          throw new EOFException(s"shard decompressed past $limit bytes")
      }
      n
    }
    override def read(): Int = {
      val c = super.read()
      if (c >= 0) bump(1)
      c
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      bump(super.read(b, off, len))
  }

  private def corruptRow: InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("_corrupt"), null, null, null, null, null))

  /** De-chunk an HTTP/1.1 chunked body; null when the framing is not
    * actually chunked-valid (caller falls back to the raw bytes). */
  private def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length - from)
    var i = from
    while (true) {
      val eol = {
        var j = i
        while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
        if (j + 1 >= b.length) return null else j
      }
      val sizeStr = new String(b, i, eol - i, Ascii)
      val semi = sizeStr.indexOf(';')
      val hexPart = (if (semi >= 0) sizeStr.substring(0, semi) else sizeStr).trim
      val size =
        try java.lang.Long.parseLong(hexPart, 16)
        catch { case _: NumberFormatException => return null }
      i = eol + 2
      if (size == 0) return out.toByteArray // trailers ignored
      if (i + size + 2 > b.length) return null
      out.write(b, i, size.toInt)
      i += size.toInt
      if (b(i) != '\r' || b(i + 1) != '\n') return null
      i += 2
    }
    null // unreachable
  }

  /** Parse the HTTP envelope of a response block into
    * (status, contentType, body); null when it is not an HTTP payload
    * (caller degrades to the raw block). */
  private def parseHttp(block: Array[Byte]): (Integer, String, Array[Byte]) = {
    // header/body split at the first CRLFCRLF
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return null
    val head = new String(block, 0, split, Ascii)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return null
    val parts = lines(0).split(" ")
    if (parts.length < 2) return null
    val status =
      try Integer.valueOf(parts(1).toInt)
      catch { case _: NumberFormatException => return null }
    var ctype: String = null
    var chunked = false
    var l = 1
    while (l < lines.length) {
      val line = lines(l)
      val c = line.indexOf(':')
      if (c > 0) {
        val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(c + 1).trim
        if (k == "content-type") ctype = v
        else if (k == "transfer-encoding" &&
          v.toLowerCase(java.util.Locale.ROOT).contains("chunked")) chunked = true
      }
      l += 1
    }
    val bodyFrom = split + 4
    val raw = java.util.Arrays.copyOfRange(block, bodyFrom, block.length)
    val body = if (chunked) {
      val d = dechunk(block, bodyFrom)
      if (d == null) raw else d
    } else raw
    (status, ctype, body)
  }

  def parseWarc(bytes: Array[Byte]): GenericArrayData = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // the gzip path holds a NATIVE zlib inflater — it must be closed per
    // call, not left to finalization: at crawl scale (millions of shards
    // per executor lifetime) unreleased native buffers OOM-kill the
    // process from outside the heap (measured: the 100x stress run died
    // on SIGKILL before this finally block existed)
    var in: InputStream = null
    try {
      val base = new ByteArrayInputStream(bytes)
      in = new BoundedIn(
        if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
          (bytes(1) & 0xff) == 0x8b)
          new java.util.zip.GZIPInputStream(base, 1 << 16)
        else base,
        maxShardBytes)
      var done = false
      while (!done) {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in) // inter-record CRLFs
        if (line == null) done = true
        else if (!line.startsWith("WARC/")) {
          rows += corruptRow; done = true
        } else {
          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = readLine(in)
          var ok = true
          while (ok && h != null && h.nonEmpty) {
            val c = h.indexOf(':')
            if (c > 0)
              headers(h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
                h.substring(c + 1).trim
            h = readLine(in)
          }
          if (h == null) { rows += corruptRow; done = true }
          else {
            val lenStr = headers.getOrElse("content-length", null)
            val len =
              try if (lenStr == null) -1L else lenStr.toLong
              catch { case _: NumberFormatException => -1L }
            if (len < 0) { rows += corruptRow; done = true }
            else {
              val block = readFully(in, len)
              val wtype = headers.getOrElse("warc-type", "unknown")
              val url = headers.getOrElse("warc-target-uri", null)
              val ts = headers.getOrElse("warc-date", null)
              val wmime = headers.getOrElse("content-type", null)
              val isHttp = wtype == "response" && wmime != null &&
                wmime.toLowerCase(java.util.Locale.ROOT)
                  .startsWith("application/http")
              val (status, mime, content) =
                if (isHttp) {
                  val p = parseHttp(block)
                  if (p == null) (null: Integer, wmime, block)
                  else (p._1, if (p._2 != null) p._2 else wmime, p._3)
                } else (null: Integer, wmime, block)
              rows += new GenericInternalRow(Array[Any](
                UTF8String.fromString(wtype),
                if (url == null) null else UTF8String.fromString(url),
                if (ts == null) null else UTF8String.fromString(ts),
                if (mime == null) null else UTF8String.fromString(mime),
                if (status == null) null else status.intValue,
                content))
            }
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => rows += corruptRow
    } finally {
      if (in != null) try in.close() catch {
        case scala.util.control.NonFatal(_) =>
      }
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** `warc_records(binary)` — see [[WarcKernels]]. */
  case class WarcRecords(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(recordType, containsNull = false)
    override def prettyName: String = "warc_records"
    override protected def nullSafeEval(a: Any): Any =
      WarcKernels.parseWarc(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.WarcKernels.parseWarc($c);")
    override protected def withNewChildInternal(newChild: Expression): WarcRecords =
      copy(child = newChild)
  }

  val warcRecordsInfo: ExpressionInfo = new ExpressionInfo(
    classOf[WarcRecords].getName, null, "warc_records",
    "_FUNC_(binary) - parse a WARC shard (plain or gzip, multi-member) into records (warc_type, url, ts, mime, status, content); HTTP response envelopes parsed and de-chunked; a malformed record ends the walk with one _corrupt sentinel.",
    "", "", "", "", "", "", "built-in")

  // ---- deterministic fixture generator -----------------------------------

  /** Closed-form WARC shard for oracle plants: a `warcinfo` record, a
    * `response` (url `https://w{id%8}.example.com/p/{id}`, date
    * `2024-01-{01+id%28}`, status 200/404/503 by id%3; body plain HTML
    * by default, CHUNKED transfer at id%5=0, windows-1252 "café page"
    * at id%5=1, declared-ISO-8859-2 Polish at id%5=2 — the charset only
    * a Content-Type header can pick), and a `request` record — gzipped ONE MEMBER PER RECORD
    * at odd ids (the Common Crawl framing), plain at even. id%7=6
    * appends a truncated record that must parse to the `_corrupt`
    * sentinel after the three good records. */
  def synthWarc(id: Long): Array[Byte] = {
    val crlf = "\r\n"
    def record(tpe: String, uri: String, extra: Map[String, String],
        payload: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder()
      sb.append("WARC/1.0").append(crlf)
      sb.append("WARC-Type: ").append(tpe).append(crlf)
      sb.append("WARC-Date: 2024-01-")
        .append(f"${1 + math.floorMod(id, 28)}%02d")
        .append("T00:00:00Z").append(crlf)
      sb.append("WARC-Record-ID: <urn:uuid:")
        .append(f"$id%08d").append("-").append(tpe).append(">").append(crlf)
      if (uri != null)
        sb.append("WARC-Target-URI: ").append(uri).append(crlf)
      extra.foreach { case (k, v) =>
        sb.append(k).append(": ").append(v).append(crlf)
      }
      sb.append("Content-Length: ").append(payload.length).append(crlf)
      sb.append(crlf)
      val head = sb.toString.getBytes(Ascii)
      val out = new ByteArrayOutputStream(head.length + payload.length + 4)
      out.write(head); out.write(payload)
      out.write(crlf.getBytes(Ascii)); out.write(crlf.getBytes(Ascii))
      out.toByteArray
    }
    val url = s"https://w${math.floorMod(id, 8)}.example.com/p/$id"
    val status = math.floorMod(id, 3) match {
      case 0 => 200; case 1 => 404; case _ => 503
    }
    val arm = math.floorMod(id, 5)
    val (ctype, bodyBytes) =
      if (arm == 1)
        ("text/html; charset=windows-1252",
          // JDK windows-1252 encode of the café literal
          s"café page $id".getBytes(
            java.nio.charset.Charset.forName("windows-1252")))
      else if (arm == 2)
        // the DECLARATION-ONLY charset: ISO-8859-2 decodes every byte,
        // so no sniffing ladder can pick it — only the header can
        ("text/html; charset=ISO-8859-2",
          s"zażółć gęślą jaźń strona $id".getBytes(
            java.nio.charset.Charset.forName("ISO-8859-2")))
      else
        ("text/html; charset=UTF-8",
          s"<html><body><p>synth page $id</p></body></html>"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val httpBody =
      if (arm == 0) {
        // chunked: first 10 bytes, then the rest, then the 0 terminator
        val c1 = java.util.Arrays.copyOfRange(bodyBytes, 0, 10)
        val c2 = java.util.Arrays.copyOfRange(bodyBytes, 10, bodyBytes.length)
        val out = new ByteArrayOutputStream()
        out.write("a\r\n".getBytes(Ascii)); out.write(c1)
        out.write(crlf.getBytes(Ascii))
        out.write((c2.length.toHexString + crlf).getBytes(Ascii)); out.write(c2)
        out.write(crlf.getBytes(Ascii))
        out.write(("0" + crlf + crlf).getBytes(Ascii))
        out.toByteArray
      } else bodyBytes
    val httpHead = new StringBuilder()
      .append("HTTP/1.1 ").append(status).append(" X").append(crlf)
      .append("Content-Type: ").append(ctype).append(crlf)
    if (arm == 0) httpHead.append("Transfer-Encoding: chunked").append(crlf)
    httpHead.append(crlf)
    val httpPayload = {
      val out = new ByteArrayOutputStream()
      out.write(httpHead.toString.getBytes(Ascii)); out.write(httpBody)
      out.toByteArray
    }
    val recs = scala.collection.mutable.ArrayBuffer(
      record("warcinfo", null,
        Map("Content-Type" -> "application/warc-fields"),
        "software: graft-synth".getBytes(Ascii)),
      record("response", url,
        Map("Content-Type" -> "application/http;msgtype=response"),
        httpPayload),
      record("request", url,
        Map("Content-Type" -> "application/http;msgtype=request"),
        s"GET /p/$id HTTP/1.1\r\n\r\n".getBytes(Ascii)))
    val out = new ByteArrayOutputStream()
    val gz = math.floorMod(id, 2) == 1
    // close() ends the native deflater (closing the BAOS underneath is a
    // no-op) — finish() alone leaks zlib native memory per member, which
    // OOM-kills a long-lived executor generating millions of fixtures
    def member(payload: Array[Byte]): Unit =
      if (gz) {
        val g = new java.util.zip.GZIPOutputStream(out)
        try { g.write(payload); g.finish() } finally g.close()
      } else out.write(payload)
    recs.foreach(member)
    if (math.floorMod(id, 7) == 6)
      member("WARC/1.0\r\nWARC-Type: response\r\n".getBytes(Ascii))
    out.toByteArray
  }

  /** `synth_warc(id)` — deterministic WARC shard fixture. */
  case class SynthWarc(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_warc requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_warc"
    override protected def nullSafeEval(id: Any): Any =
      synthWarc(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.WarcKernels.synthWarc($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthWarc =
      copy(child = newChild)
  }

  val synthWarcInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthWarc].getName, null, "synth_warc",
    "_FUNC_(id) - deterministic WARC shard fixture (warcinfo+response+request; per-record gzip members at odd ids; chunked/cp1252 body arms; corrupt tail at id%7=6).",
    "", "", "", "", "", "", "built-in")
}
