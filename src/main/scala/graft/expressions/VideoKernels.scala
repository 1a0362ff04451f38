package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Video METADATA tier: a pure-JDK ISO-BMFF (MP4/M4A/MOV) box parser —
 * no codec, no pixels (the in-JDK pixel decode stays impossible and the
 * pixel stub documented in [[graft.ops.Multimodal]]), but duration,
 * track count, codec fourccs and display dimensions are plain box
 * arithmetic over the container structure (ISO/IEC 14496-12, public
 * spec): `[size:4][type:4][payload]` boxes, 64-bit `largesize` when
 * size==1, size==0 meaning to-EOF; `moov/mvhd` carries
 * timescale+duration (version 0: 32-bit, version 1: 64-bit fields);
 * each `trak/tkhd` carries 16.16-fixed display width/height; the first
 * `stsd` sample-entry fourcc under `trak/mdia/minf/stbl` names the
 * track codec.
 *
 * These fields are exactly what dedup/curation needs from video at
 * 100 TB: a (duration, dims, codec-set) key groups re-encodes and
 * re-containerizations cheaply, and the mp4a fourcc marks tracks
 * eligible for the existing audio-fingerprint machinery once samples
 * are decoded out-of-band.
 *
 * Fail-safe contract: any structural violation — truncated box, size
 * escaping its parent, missing/short `moov` or `mvhd`, zero timescale —
 * returns NULL (the corrupt-input law every media kernel here follows),
 * never throws, never returns a half-parsed row.
 */
object VideoKernels {

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (payloadStart, payloadEnd, type) for the box at `i`, or null when the
    * header is malformed or escapes `end`. */
  private def boxAt(b: Array[Byte], i: Int, end: Int): (Int, Int, String) = {
    if (i + 8 > end) return null
    var size = u32(b, i)
    var headerLen = 8
    if (size == 1) {
      if (i + 16 > end) return null
      size = u64(b, i + 8)
      headerLen = 16
    } else if (size == 0) {
      size = (end - i).toLong // to end of enclosing scope
    }
    if (size < headerLen || i + size > end) return null
    ((i + headerLen), (i + size.toInt), fourcc(b, i + 4))
  }

  /** First child box of `typ` inside [from, end), or -1. */
  private def findChild(b: Array[Byte], from: Int, end: Int, typ: String): (Int, Int) = {
    var i = from
    while (i < end) {
      val bx = boxAt(b, i, end)
      if (bx == null) return null
      if (bx._3 == typ) return (bx._1, bx._2)
      i = bx._2
    }
    null
  }

  def videoMeta(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    try videoMetaImpl(bytes)
    catch { case _: Exception => null } // corrupt-input law: never throw
  }

  private def videoMetaImpl(b: Array[Byte]): InternalRow = {
    val moov = findChild(b, 0, b.length, "moov")
    if (moov == null) return null
    val (ms, me) = moov
    val mvhd = findChild(b, ms, me, "mvhd")
    if (mvhd == null) return null
    val (hs, he) = mvhd
    if (he - hs < 4) return null
    val version = b(hs) & 0xff
    // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
    val (timescale, duration) =
      if (version == 0) {
        if (he - hs < 20) return null
        (u32(b, hs + 12), u32(b, hs + 16))
      } else if (version == 1) {
        if (he - hs < 32) return null
        (u32(b, hs + 20), u64(b, hs + 24))
      } else return null
    if (timescale <= 0) return null
    val durationMs = duration * 1000L / timescale
    // walk traks: count, first nonzero dims, codec fourccs in track order
    var nTracks = 0
    var width = -1
    var height = -1
    val codecs = new scala.collection.mutable.ArrayBuffer[String](4)
    var i = ms
    while (i < me) {
      val bx = boxAt(b, i, me)
      if (bx == null) return null
      if (bx._3 == "trak") {
        nTracks += 1
        val tk = findChild(b, bx._1, bx._2, "tkhd")
        if (tk != null) {
          val (ts, te) = tk
          val tv = if (te - ts >= 1) b(ts) & 0xff else -1
          // v0 dims at payload offset 76, v1 at 88 (wider timestamps/duration)
          val dimOff = if (tv == 0) 76 else if (tv == 1) 88 else -1
          if (dimOff > 0 && te - ts >= dimOff + 8) {
            val w = (u32(b, ts + dimOff) >> 16).toInt
            val h = (u32(b, ts + dimOff + 4) >> 16).toInt
            if (width < 0 && (w > 0 || h > 0)) { width = w; height = h }
          }
        }
        val mdia = findChild(b, bx._1, bx._2, "mdia")
        val minf = if (mdia == null) null else findChild(b, mdia._1, mdia._2, "minf")
        val stbl = if (minf == null) null else findChild(b, minf._1, minf._2, "stbl")
        val stsd = if (stbl == null) null else findChild(b, stbl._1, stbl._2, "stsd")
        if (stsd != null) {
          val (ss, se) = stsd
          // fullbox ver/flags(4) entry_count(4) then the first sample entry
          if (se - ss >= 16 && u32(b, ss + 4) >= 1) {
            val entry = boxAt(b, ss + 8, se)
            if (entry != null) codecs += entry._3
          }
        }
      }
      i = bx._2
    }
    InternalRow(
      durationMs,
      nTracks,
      if (width >= 0) width else null,
      if (height >= 0) height else null,
      UTF8String.fromString(codecs.mkString(",")))
  }

  /** `video_meta(binary)` — see [[VideoKernels]]. */
  case class VideoMeta(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("duration_ms", LongType, nullable = false),
      StructField("n_tracks", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("codecs", StringType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "video_meta"
    override protected def nullSafeEval(a: Any): Any =
      VideoKernels.videoMeta(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |${ev.value} = graft.expressions.VideoKernels.videoMeta($a);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): VideoMeta =
      copy(child = newChild)
  }

  /** Deterministic planted MP4 (test/oracle fixture) — every parameter is
    * closed-form in the id so the oracle recomputes the expected metadata
    * from the SAME formulas without reading a byte:
    *  - id % 7 == 6 → NOT an MP4 (garbage bytes; the corrupt-input law row)
    *  - mvhd version = id % 2 (v1 exercises the 64-bit duration layout)
    *  - moov uses the 64-bit `largesize` header form when id % 5 == 0
    *  - timescale = 1000 + (id % 9) * 100
    *  - duration ticks = 48000 + (id * 7) % 100000
    *  - tracks = 1 + id % 3: first a video track (codec by id % 3 from
    *    avc1/hev1/av01, width 320 + (id%16)*40, height 240 + (id%9)*40),
    *    then mp4a, then tx3g. */
  def synthMp4(id: Long): Array[Byte] = {
    if (id % 7 == 6) {
      // deliberately NOT ISO-BMFF: size field larger than the buffer
      return Array[Byte](0x7f, 'J', 'U', 'N', 'K', 0x00, 0x01, 0x02, 0x03)
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    def full(typ: String, version: Int, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](version.toByte, 0, 0, 0) ++ payload)
    val version = (id % 2).toInt
    val timescale = 1000L + (id % 9) * 100
    val ticks = 48000L + (id * 7) % 100000
    val matrix =
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x10000) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000)
    val mvhd =
      if (version == 0)
        full("mvhd", 0, be32(0) ++ be32(0) ++ be32(timescale) ++ be32(ticks) ++
          be32(0x10000) ++ Array[Byte](1, 0) ++ new Array[Byte](10) ++ matrix ++
          new Array[Byte](24) ++ be32(9))
      else
        full("mvhd", 1, be64(0) ++ be64(0) ++ be32(timescale) ++ be64(ticks) ++
          be32(0x10000) ++ Array[Byte](1, 0) ++ new Array[Byte](10) ++ matrix ++
          new Array[Byte](24) ++ be32(9))
    def tkhd(trackId: Long, w: Int, h: Int): Array[Byte] =
      full("tkhd", 0, be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++
        be32(ticks) ++ new Array[Byte](8) ++ new Array[Byte](8) ++ matrix ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    def trak(trackId: Long, w: Int, h: Int, codec: String): Array[Byte] = {
      val entry = box(codec, new Array[Byte](8))
      val stsd = full("stsd", 0, be32(1) ++ entry)
      box("trak", tkhd(trackId, w, h) ++
        box("mdia", box("minf", box("stbl", stsd))))
    }
    val nTracks = 1 + (id % 3).toInt
    val vcodec = Seq("avc1", "hev1", "av01")((id % 3).toInt)
    val w = 320 + (id % 16).toInt * 40
    val h = 240 + (id % 9).toInt * 40
    var traks = trak(1, w, h, vcodec)
    if (nTracks >= 2) traks = traks ++ trak(2, 0, 0, "mp4a")
    if (nTracks >= 3) traks = traks ++ trak(3, 0, 0, "tx3g")
    val moovPayload = mvhd ++ traks
    val moov =
      if (id % 5 == 0)
        be32(1) ++ "moov".getBytes("ISO-8859-1") ++
          be64(16L + moovPayload.length) ++ moovPayload
      else box("moov", moovPayload)
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ be32(512) ++
        "isomiso2avc1mp41".getBytes("ISO-8859-1"))
    ftyp ++ moov ++ box("mdat", new Array[Byte](16))
  }

  /** `synth_mp4(id)` — deterministic planted MP4 (test/oracle fixture). */
  case class SynthMp4(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_mp4 requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_mp4"
    override protected def nullSafeEval(id: Any): Any = synthMp4(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.VideoKernels.synthMp4($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthMp4 =
      copy(child = newChild)
  }

  val synthInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthMp4].getName, null, "synth_mp4",
    "_FUNC_(id) - deterministic planted MP4 whose metadata is closed-form in the id (test/oracle fixture).",
    "", "", "", "", "", "", "built-in")

  val videoMetaInfo: ExpressionInfo = new ExpressionInfo(
    classOf[VideoMeta].getName, null, "video_meta",
    "_FUNC_(binary) - ISO-BMFF (MP4) container metadata: (duration_ms, n_tracks, width, height, codecs); NULL for anything that is not a structurally valid MP4.",
    "", "", "", "", "", "", "built-in")
}
