package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level text ingest: real crawl data arrives as BYTES in mixed or
 * wrongly-declared charsets, often already damaged by an earlier pipeline
 * that decoded UTF-8 as a legacy single-byte charset and re-encoded the
 * result (mojibake — "café" shipped as "cafÃ©"). `text_from_bytes` is the
 * missing rung BEFORE `text_normalize`: one codegen'd pass per row that
 * (1) decodes strict-valid UTF-8 as UTF-8, (2) falls back to
 * Windows-1252 for anything else (the de-facto superset of Latin-1 on
 * the web — HTML5 aliases `latin-1` to it; the five undefined cp1252
 * bytes 0x81/0x8D/0x8F/0x90/0x9D decode to their C1 controls, the
 * "sloppy-windows-1252" convention mojibake repair requires), and
 * (3) repairs up to TWO rounds of UTF-8-as-cp1252 mojibake: re-encode
 * the decoded string through cp1252 and, if the bytes form strictly
 * valid UTF-8 that decodes to something NEW, take the decode. The loop
 * is the public ftfy recipe (Speer, "fixes text for you") restricted to
 * its dominant case; two rounds covers single- and double-encoding,
 * and the strict-validity + progress guards make it a no-op on text
 * that is already clean (ASCII re-encodes to itself and decodes to
 * itself → breaks immediately).
 *
 * Deterministic, total (null in → null out, empty → empty), and exactly
 * replayable: the oracle plants closed-form byte fixtures whose expected
 * strings are computed by construction on both engines.
 */
object ByteKernels {

  /** cp1252 decode table for bytes 0x80..0x9F (the block where cp1252
    * diverges from Latin-1); the five holes keep their C1 control value. */
  private val cp1252High: Array[Char] = {
    val a = new Array[Char](32)
    var i = 0
    while (i < 32) { a(i) = (0x80 + i).toChar; i += 1 } // C1 default (holes)
    val m = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    m.foreach { case (b, c) => a(b - 0x80) = c }
    a
  }

  /** char → cp1252 byte for the non-trivial range (inverse of the decode
    * table); chars 0x00..0x7F and 0xA0..0xFF map to themselves. */
  private val cp1252Enc: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    var i = 0
    while (i < 32) {
      m.put(Character.valueOf(cp1252High(i)), java.lang.Byte.valueOf((0x80 + i).toByte))
      i += 1
    }
    m
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates, max
    * U+10FFFF) — the gate between "this IS utf-8" and the cp1252 path. */
  private def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) {            // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {          // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80 // no overlong
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) {          // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
      }
    true
  }

  private def decodeCp1252(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      sb.append(
        if (c >= 0x80 && c <= 0x9f) cp1252High(c - 0x80) else c.toChar)
      i += 1
    }
    sb.toString
  }

  /** Encode via cp1252 if EVERY char is representable, else null. */
  private def encodeCp1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch < 0x80 || (ch >= 0xa0 && ch <= 0xff)) out(i) = ch.toByte
      else {
        val b = cp1252Enc.get(Character.valueOf(ch))
        if (b == null) return null
        out(i) = b.byteValue
      }
      i += 1
    }
    out
  }

  def textFromBytes(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    if (bytes.length == 0) return UTF8String.EMPTY_UTF8
    var s =
      if (validUtf8(bytes)) new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      else decodeCp1252(bytes)
    var rounds = 0
    var progressed = true
    while (rounds < 2 && progressed) {
      progressed = false
      val re = encodeCp1252(s)
      if (re != null && validUtf8(re)) {
        val fixed = new String(re, java.nio.charset.StandardCharsets.UTF_8)
        if (fixed != s) { s = fixed; progressed = true }
      }
      rounds += 1
    }
    UTF8String.fromString(s)
  }

  /** `text_from_bytes(binary)` — see [[ByteKernels]]. */
  case class TextFromBytes(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "text_from_bytes"
    override protected def nullSafeEval(a: Any): Any =
      ByteKernels.textFromBytes(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.ByteKernels.textFromBytes($a)")
    override protected def withNewChildInternal(newChild: Expression): TextFromBytes =
      copy(child = newChild)
  }

  val textFromBytesInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TextFromBytes].getName, null, "text_from_bytes",
    "_FUNC_(binary) - decode crawl bytes to text: strict UTF-8, Windows-1252 fallback, up to two rounds of UTF-8-as-cp1252 mojibake repair.",
    "", "", "", "", "", "", "built-in")
}
