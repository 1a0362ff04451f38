package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level text ingest: real crawl data arrives as BYTES in mixed or
 * wrongly-declared charsets, often already damaged by an earlier pipeline
 * that decoded UTF-8 as a legacy single-byte charset and re-encoded the
 * result (mojibake — "café" shipped as "cafÃ©"). `text_from_bytes` is the
 * missing rung BEFORE `text_normalize`: one codegen'd pass per row whose
 * decode ladder is, in order:
 *
 *  1. UTF-16 with BOM (FE FF / FF FE, even length, ≥1 code unit of
 *     content): strict decode — unpaired surrogates fall through —
 *     with the BOM stripped. BOM-less UTF-16 is NOT guessed (it is
 *     indistinguishable from binary without a language model; crawl
 *     payloads that matter carry the BOM or declare the charset).
 *  2. Strict-valid UTF-8 (RFC 3629: no overlongs, no surrogates, max
 *     U+10FFFF) decodes as UTF-8, then up to TWO rounds of
 *     UTF-8-as-cp1252 mojibake repair: re-encode the decoded string
 *     through cp1252 and, if the bytes form strictly valid UTF-8 that
 *     decodes to something NEW, take the decode. The loop is the public
 *     ftfy recipe (Speer, "fixes text for you") restricted to its
 *     dominant case; two rounds covers single- and double-encoding, and
 *     the strict-validity + progress guards make it a no-op on clean
 *     text (ASCII re-encodes to itself → breaks immediately).
 *  3. Legacy-charset ladder — the multibyte CJK family (Shift_JIS,
 *     EUC-JP, EUC-KR, GB18030, Big5), the single-byte Cyrillic family
 *     (windows-1251, KOI8-R, KOI8-U, ISO-8859-5), the single-byte
 *     script charsets the bundled language gate covers (ISO-8859-7 /
 *     windows-1253 Greek, windows-1255 Hebrew, windows-1256
 *     Arabic/Farsi, windows-874 Thai), and the LATIN rungs
 *     (ISO-8859-9 / windows-1254 Turkish, ISO-8859-2 / windows-1250
 *     Central European) — all in-JDK charsets. A candidate must
 *     (a) strict-decode its full payload (CodingErrorAction.REPORT —
 *     no replacement characters; candidates are SCORED on a bounded
 *     prefix decode and only the winner pays the full decode),
 *     (b) carry non-ASCII evidence in the classified window (8 chars
 *     for non-Latin scripts — the cutoffs are calibrated on 8-word
 *     bags and a lone ideograph is not classifiable; 2 for the Latin
 *     rungs, whose real pages run a handful of accents per sentence),
 *     and (c) CLASSIFY as a language that charset encodes under the
 *     bundled profile-snapshot n-gram identifier with its calibrated
 *     rejection cutoffs ([[DocKernels.langGateLabel]]). Byte validity
 *     alone CANNOT separate the structurally-ambiguous pairs — EUC-JP
 *     and GB2312 share the EUC frame and even the kana rows, Big5 and
 *     GBK overlap on most of the two-byte space, and every single-byte
 *     rung decodes nearly every byte — so the gate is "reads as real
 *     text in a plausible language", the same measured rejection
 *     machinery the language gate itself uses. Lowest normalized
 *     distance wins; ties break in ladder order. A French cp1252 page
 *     tried as windows-1251 yields Latin words with stray Cyrillic —
 *     the classifier rejects it and the ladder falls through. The
 *     LATIN rungs additionally compete against the cp1252 incumbent
 *     by distance (lowest wins, ties keep cp1252): a windows-1250
 *     Polish page classifies 'pl' under cp1252 too, with wrong accent
 *     glyphs — first-accept would ship mojibake.
 *  4. Windows-1252 fallback for everything else (the de-facto superset
 *     of Latin-1 on the web — HTML5 aliases `latin-1` to it; the five
 *     undefined cp1252 bytes 0x81/0x8D/0x8F/0x90/0x9D decode to their
 *     C1 controls, the "sloppy-windows-1252" convention mojibake
 *     repair requires), plus the same two-round mojibake repair.
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

  /** cp1252 decode of one byte in 0x80..0x9F — shared with the PDF
    * tier's WinAnsiEncoding string decode ([[PdfKernels]]), which is
    * cp1252 on every printable position. */
  private[expressions] def cp1252HighChar(c: Int): Char = cp1252High(c - 0x80)

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

  /** Classification prefix cap for the legacy-charset gate (step 3). */
  private val GateCapCodePoints = 512

  /** Byte-prefix cap for candidate scoring (r17): classification reads
    * at most [[GateCapCodePoints]] code points, and every ladder charset
    * yields ≥ 1 code point per 4 bytes, so the first 4096 bytes always
    * cover the classified window — candidates are scored on a bounded
    * prefix decode and only the WINNER pays a full-payload strict
    * decode (acceptance still requires full validity, so the accepted
    * set is unchanged; the r16 A/B flagged the full-decode-per-candidate
    * cost on large documents). */
  private val PrefixCapBytes = 4096

  /** One ladder rung: charset, the languages it plausibly encodes, and
    * whether it is a LATIN-script charset — Latin rungs compete against
    * the cp1252 incumbent by distance (lowest wins) instead of being
    * short-circuited by it, and they use the lower Latin evidence floor
    * (a real Polish/Turkish page carries only a handful of non-ASCII
    * letters; the 8-char floor is calibrated for non-Latin scripts
    * where every letter is non-ASCII). */
  private final case class Rung(
      cs: java.nio.charset.Charset, langs: Array[String], latin: Boolean)

  private def rung(name: String, latin: Boolean, langs: String*): Rung =
    Rung(java.nio.charset.Charset.forName(name), langs.toArray, latin)

  /** The ladder in order — the deterministic tie-break when two
    * candidates score equally. */
  private val legacyLadder: Array[Rung] =
    Array(
      rung("Shift_JIS", latin = false, "ja"),
      rung("EUC-JP", latin = false, "ja"),
      rung("EUC-KR", latin = false, "ko"),
      rung("GB18030", latin = false, "zh"),
      rung("Big5", latin = false, "zh"),
      rung("windows-1251", latin = false, "bg", "ru", "sr", "uk"),
      // the rest of the single-byte Cyrillic family: all three decode
      // every byte (like cp1251), so only the language gate separates
      // them — measured (tools/calibrate_langid.py): each mapping's
      // real text classifies at 160–281 normalized distance under its
      // own decode and REJECTS (513–836) under every other family
      // member's, except KOI8-R/KOI8-U whose shared Russian rows yield
      // IDENTICAL decodes (tie → ladder order, same output) and whose
      // Ukrainian case separates by distance (281 own vs 384 cross)
      rung("KOI8-R", latin = false, "bg", "ru"),
      rung("KOI8-U", latin = false, "bg", "ru", "uk"),
      rung("ISO-8859-5", latin = false, "bg", "ru", "sr", "uk"),
      // r17: the remaining single-byte scripts the bundled gate
      // already covers — Greek, Hebrew, Arabic/Farsi, Thai. Same law
      // as the Cyrillic family: every one decodes nearly every byte,
      // so membership + calibrated distance is the only separator.
      rung("ISO-8859-7", latin = false, "el"),
      rung("windows-1253", latin = false, "el"),
      rung("windows-1255", latin = false, "he"),
      rung("windows-1256", latin = false, "ar", "fa"),
      rung("x-windows-874", latin = false, "th"),
      // r17 Latin rungs: Turkish (Latin-5) and the Central-European
      // family. These compete with the cp1252 incumbent BY DISTANCE —
      // a windows-1250 Polish page also classifies 'pl' under cp1252
      // (measured 237 normalized, under the cutoff) with wrong accent
      // glyphs, so first-accept would ship mojibake; the true decode
      // scores lower and must win.
      rung("ISO-8859-9", latin = true, "tr"),
      rung("windows-1254", latin = true, "tr"),
      rung("ISO-8859-2", latin = true,
        "pl", "cs", "sk", "sl", "hr", "hu", "ro"),
      rung("windows-1250", latin = true,
        "pl", "cs", "sk", "sl", "hr", "hu", "ro"))

  /** Languages FULLY representable in cp1252 — when the cp1252 decode
    * classifies as one of these, cp1252 is a scored INCUMBENT the Latin
    * rungs must beat by strictly lower distance (ties keep cp1252, the
    * pre-r17 behavior). A label outside this set (e.g. 'pl' — Polish
    * needs ą/ł/ż, which cp1252 cannot encode) means the cp1252 reading
    * is mojibake-adjacent and any member Latin rung may claim the page. */
  private val cp1252Langs: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](32)
    Array("en", "es", "fr", "de", "pt", "it", "nl", "da", "no", "sv",
      "fi", "is", "ca", "et", "id", "sw").foreach(s.add)
    s
  }

  /** Strict decode from `offset`: null on ANY malformed or unmappable
    * input (decoders are not thread-safe — one per call; this is the
    * rare non-UTF-8 path). */
  private def strictDecode(
      cs: java.nio.charset.Charset, b: Array[Byte], offset: Int): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, offset, b.length - offset))
      .toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** UTF-16 with BOM: FE FF → BE, FF FE → LE; even length with at least
    * one content unit; strict decode (unpaired surrogates → null), BOM
    * stripped. */
  private def decodeUtf16Bom(b: Array[Byte]): String = {
    if (b.length < 4 || (b.length & 1) == 1) return null
    val b0 = b(0) & 0xff
    val b1 = b(1) & 0xff
    val cs =
      if (b0 == 0xfe && b1 == 0xff) java.nio.charset.StandardCharsets.UTF_16BE
      else if (b0 == 0xff && b1 == 0xfe) java.nio.charset.StandardCharsets.UTF_16LE
      else return null
    strictDecode(cs, b, 2)
  }

  /** Evidence floor for the NON-LATIN legacy gate: a candidate decode
    * must carry at least this many non-ASCII chars before the
    * classifier's verdict means anything — the cutoffs are calibrated
    * on 8-word bags, and a lone "、" (SJIS 0x8141) or "い" (EUC-JP
    * 0xA4A4) would otherwise clear the deliberately-lenient CJK
    * cutoffs. Below the floor the deterministic cp1252 fallback is the
    * honest answer. */
  private val MinGateEvidence = 8

  /** Evidence floor for LATIN rungs (r17): real Polish/Turkish/Croatian
    * text runs a handful of non-ASCII letters per sentence (the planted
    * pl sentence carries six, hr three), so the 8-char floor would
    * block exactly the pages these rungs exist for. Two non-ASCII chars
    * are enough for the membership + cutoff gate to be the real
    * separator; below that the charsets are indistinguishable and
    * cp1252 is the honest answer. Doubles as the outer high-byte gate. */
  private val MinLatinEvidence = 2

  /** Count bytes ≥ 0x80, stopping early at `cap` — the pre-decode
    * evidence bound for the legacy ladder. */
  private def countHighBytes(b: Array[Byte], cap: Int): Int = {
    var i = 0
    var n = 0
    while (i < b.length && n < cap) {
      if ((b(i) & 0x80) != 0) n += 1
      i += 1
    }
    n
  }

  private def countNonAscii(s: String): Int = {
    var i = 0
    var n = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) n += 1
      i += 1
    }
    n
  }

  /** Strict decode of the first [[PrefixCapBytes]] bytes — the bounded
    * window candidate SCORING reads (full payloads decode only for the
    * winner). `endOfInput = false` so a multibyte sequence cut at the
    * prefix boundary is UNDERFLOW (ignored), not a malformed error; a
    * malformed byte INSIDE the window still disqualifies. Payloads at
    * or under the cap take the ordinary full strict decode. */
  private def strictDecodePrefix(
      cs: java.nio.charset.Charset, b: Array[Byte]): String = {
    if (b.length <= PrefixCapBytes) return strictDecode(cs, b, 0)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val in = java.nio.ByteBuffer.wrap(b, 0, PrefixCapBytes)
    val out = java.nio.CharBuffer.allocate(PrefixCapBytes + 2)
    val cr = dec.decode(in, out, false)
    if (cr.isError) null
    else { out.flip(); out.toString }
  }

  /** Step 3: best legacy-charset decode that reads as a language its
    * charset encodes, or null when none qualifies.
    *
    * Candidates are scored on their bounded PREFIX decode (see
    * [[PrefixCapBytes]] — the classified window is identical to the
    * full decode's, so the ranking is unchanged), with classifications
    * MEMOIZED by decoded string (KOI8-R vs KOI8-U agree on every
    * Russian/Bulgarian letter; the Latin rungs usually agree with
    * cp1252 on a French page — identical decodes classify once).
    * Acceptance then requires the winner's FULL payload to
    * strict-decode; a candidate whose prefix is valid but whose tail is
    * malformed is skipped and the next-ranked candidate is tried —
    * exactly the set the per-candidate-full-decode ladder accepted.
    *
    * `latinOnly` restricts the walk to Latin rungs — set when the
    * cp1252 decode already READS as a real language, in which case a
    * non-Latin rung cannot win (its membership label would need the
    * same window to read as ja/ru/el/…, contradicting the accepted
    * Latin reading) but a Latin rung still can, by strictly lower
    * distance (`bestScore` seeds from the cp1252 incumbent when its
    * label is cp1252-representable; ties keep cp1252). */
  private def tryLegacy(
      b: Array[Byte], latinOnly: Boolean, incumbentScore: Int,
      cpLabelCache: (String, (String, Int))): (String, String) = {
    // (score, ladderIdx, prefixDec) candidates, insertion-kept
    val scores = new java.util.ArrayList[(Int, Int, String)](4)
    val memo = new java.util.HashMap[String, (String, Int)](8)
    if (cpLabelCache != null) memo.put(cpLabelCache._1, cpLabelCache._2)
    var i = 0
    while (i < legacyLadder.length) {
      val r = legacyLadder(i)
      if (!latinOnly || r.latin) {
        val dec = strictDecodePrefix(r.cs, b)
        val floor = if (r.latin) MinLatinEvidence else MinGateEvidence
        if (dec != null && countNonAscii(dec) >= floor) {
          var ls = memo.get(dec)
          if (ls == null) {
            ls = DocKernels.langGateLabel(dec, GateCapCodePoints)
            memo.put(dec, ls)
          }
          val (label, score) = ls
          var l = 0
          var member = false
          while (l < r.langs.length && !member) {
            member = r.langs(l) == label; l += 1
          }
          if (member && score < incumbentScore) scores.add((score, i, dec))
        }
      }
      i += 1
    }
    if (scores.isEmpty) return null
    // winner(s) by (score asc, ladder order asc); full-decode in rank
    // order, first full-valid wins (prefix == full under the cap)
    val arr = new Array[(Int, Int, String)](scores.size)
    scores.toArray(arr)
    java.util.Arrays.sort(arr,
      Ordering.by[(Int, Int, String), (Int, Int)](t => (t._1, t._2)))
    var k = 0
    while (k < arr.length) {
      val cs = legacyLadder(arr(k)._2).cs
      val full =
        if (b.length <= PrefixCapBytes) arr(k)._3
        else strictDecode(cs, b, 0)
      if (full != null)
        return (full, cs.name().toLowerCase(java.util.Locale.ROOT))
      k += 1
    }
    null
  }

  def textFromBytes(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    UTF8String.fromString(decodeWithRung(bytes)._1)
  }

  /** Exit-rung label for [[textFromBytes]] — the decode-cost
    * observability surface (r17): `empty`, `utf16`, `utf8`,
    * `utf8_repair` (valid UTF-8 that took ≥1 mojibake-repair round), a
    * ladder charset's canonical lowercase name (`shift_jis`,
    * `windows-1250`, …), or `cp1252` (the fallback; its repair round is
    * a structural no-op — cp1252 decode/encode is bijective per byte).
    * The ladder keeps growing rungs, and WHERE rows exit attributes the
    * per-row decode cost as a queryable record instead of a rerun. */
  def textFromBytesRung(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    UTF8String.fromString(decodeWithRung(bytes)._2)
  }

  private[expressions] def decodeWithRung(bytes: Array[Byte]): (String, String) = {
    if (bytes.length == 0) return ("", "empty")
    val u16 = decodeUtf16Bom(bytes)
    if (u16 != null) return (u16, "utf16")
    var s: String = null
    var rung: String = null
    if (validUtf8(bytes)) {
      s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      rung = "utf8"
    } else {
      // Cost gates before the legacy ladder — GB18030 strict-decodes
      // nearly any byte stream, so ungated, EVERY non-UTF-8 row pays
      // the full rung walk (the r16 A/B flagged that at 6.7× on the
      // byte-decode bench line). Shape (r17):
      //  (a) BYTE EVIDENCE: every ladder candidate needs non-ASCII
      //      CHARS after decode (8 for non-Latin scripts, 2 for the
      //      Latin rungs), and each such char consumes at least one
      //      byte ≥ 0x80 — so fewer than MinLatinEvidence high BYTES
      //      means no candidate can be accepted at all, and the
      //      ladder is skipped without decoding anything.
      //  (b) LATIN COMPETITION, not first-accept: classify the cp1252
      //      decode ONCE. A decode that READS as a real language means
      //      no NON-Latin rung can win (cp1252 emits no Cyrillic/CJK,
      //      so their membership labels cannot fire) — but a LATIN
      //      rung still can: a windows-1250 Polish page classifies
      //      'pl' under cp1252 too (measured 237 normalized, under
      //      the cutoff) with wrong accent glyphs. So Latin rungs
      //      compete by distance against the cp1252 incumbent, whose
      //      score counts only when its label is actually
      //      cp1252-representable (cp1252Langs); ties keep cp1252.
      //      True CJK/Cyrillic/Greek/… bytes read as mojibake here,
      //      the classifier rejects, and the full ladder runs.
      val cp = decodeCp1252(bytes)
      if (countHighBytes(bytes, MinLatinEvidence) >= MinLatinEvidence) {
        val cpVerdict = DocKernels.langGateLabel(cp, GateCapCodePoints)
        val latinOnly = cpVerdict._1 != "und"
        val incumbent =
          if (latinOnly && cp1252Langs.contains(cpVerdict._1)) cpVerdict._2
          else Int.MaxValue
        val legacy = tryLegacy(bytes, latinOnly, incumbent, (cp, cpVerdict))
        if (legacy != null) return legacy
      }
      s = cp
      rung = "cp1252"
    }
    var rounds = 0
    var progressed = true
    var repaired = false
    while (rounds < 2 && progressed) {
      progressed = false
      val re = encodeCp1252(s)
      if (re != null && validUtf8(re)) {
        val fixed = new String(re, java.nio.charset.StandardCharsets.UTF_8)
        if (fixed != s) { s = fixed; progressed = true; repaired = true }
      }
      rounds += 1
    }
    (s, if (repaired) rung + "_repair" else rung)
  }

  /** Resolve a declared charset out of a MIME type string (the
    * `charset=` parameter, optionally quoted) or a bare charset name;
    * null when nothing is declared ("", a MIME type with no charset
    * parameter) or the name is unknown to this JVM. A bare name with a
    * '/' is a MIME type, never a charset. */
  private def resolveDeclared(decl: String): java.nio.charset.Charset = {
    if (decl == null) return null
    var name = decl.trim
    if (name.isEmpty) return null
    val lower = name.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf("charset=")
    if (at >= 0) {
      name = name.substring(at + 8)
      val semi = name.indexOf(';')
      if (semi >= 0) name = name.substring(0, semi)
      name = name.trim.stripPrefix("\"").stripSuffix("\"").trim
    } else if (name.indexOf('/') >= 0) return null
    if (name.isEmpty) return null
    try {
      if (java.nio.charset.Charset.isSupported(name))
        java.nio.charset.Charset.forName(name)
      else null
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** [[textFromBytes]] with a DECLARED charset (an HTTP/HTML
    * `Content-Type` value or a bare charset name) — the honor-but-verify
    * ladder crawl payloads actually need, because a declaration reaches
    * charsets sniffing never can (an ISO-8859-2 Polish page decodes
    * every byte under five different single-byte charsets; only the
    * declaration picks one):
    *
    *  1. A BOM outranks the declaration (the WHATWG precedence).
    *  2. Strictly-valid UTF-8 outranks a non-UTF-8 declaration —
    *     legacy declarations on UTF-8 bytes are THE classic mojibake
    *     source, and a single-byte charset would "successfully" decode
    *     them to garbage; the mojibake-repair rounds still apply.
    *  3. The declared charset strict-decodes (REPORT — any malformed or
    *     unmappable byte disqualifies it); the declaration itself is
    *     the evidence, so no language gate applies here.
    *  4. Anything else falls to the full sniffing ladder of
    *     [[textFromBytes]].
    *
    * Empty/undeclared/unknown charset values skip straight to the
    * sniffing ladder, so `textFromBytesDeclared(b, "")` ≡
    * `textFromBytes(b)`. */
  def textFromBytesDeclared(bytes: Array[Byte], decl: UTF8String): UTF8String = {
    if (bytes == null) return null
    if (bytes.length == 0) return UTF8String.EMPTY_UTF8
    val u16 = decodeUtf16Bom(bytes)
    if (u16 != null) return UTF8String.fromString(u16)
    if (validUtf8(bytes)) return textFromBytes(bytes)
    val cs = resolveDeclared(if (decl == null) null else decl.toString)
    if (cs != null) {
      val dec = strictDecode(cs, bytes, 0)
      if (dec != null) return UTF8String.fromString(dec)
    }
    textFromBytes(bytes)
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

  /** `text_from_bytes_rung(binary)` — see [[textFromBytesRung]]. */
  case class TextFromBytesRung(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "text_from_bytes_rung"
    override protected def nullSafeEval(a: Any): Any =
      ByteKernels.textFromBytesRung(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.expressions.ByteKernels.textFromBytesRung($a)")
    override protected def withNewChildInternal(newChild: Expression): TextFromBytesRung =
      copy(child = newChild)
  }

  val textFromBytesRungInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TextFromBytesRung].getName, null, "text_from_bytes_rung",
    "_FUNC_(binary) - the decode ladder rung text_from_bytes exits at: empty, utf16, utf8, utf8_repair, a ladder charset name, or cp1252 — per-row decode-cost attribution as a record.",
    "", "", "", "", "", "", "built-in")

  val textFromBytesInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TextFromBytes].getName, null, "text_from_bytes",
    "_FUNC_(binary) - decode crawl bytes to text: UTF-16 BOM, strict UTF-8, a language-gated legacy ladder (CJK multibyte, Cyrillic/Greek/Hebrew/Arabic/Thai single-byte, Turkish + Central-European Latin rungs competing with cp1252 by distance), Windows-1252 fallback with up to two rounds of UTF-8-as-cp1252 mojibake repair.",
    "", "", "", "", "", "", "built-in")

  /** `text_from_bytes_decl(binary, declared)` — see
    * [[ByteKernels.textFromBytesDeclared]]. Strict in BOTH arguments
    * (SQL convention); callers with a nullable declaration column
    * coalesce it to '' (≡ undeclared), which
    * [[graft.ops.TextOps.textFromBytesDeclared]] does. */
  case class TextFromBytesDecl(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "text_from_bytes_decl"
    override protected def nullSafeEval(b: Any, d: Any): Any =
      ByteKernels.textFromBytesDeclared(
        b.asInstanceOf[Array[Byte]], d.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, d) =>
        s"graft.expressions.ByteKernels.textFromBytesDeclared($b, $d)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TextFromBytesDecl =
      copy(left = newLeft, right = newRight)
  }

  val textFromBytesDeclInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TextFromBytesDecl].getName, null, "text_from_bytes_decl",
    "_FUNC_(binary, declared) - text_from_bytes honoring a declared charset (a Content-Type value or bare charset name): BOM > valid UTF-8 > strict declared decode > the sniffing ladder; '' declares nothing.",
    "", "", "", "", "", "", "built-in")
}
