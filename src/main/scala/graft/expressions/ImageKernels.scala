package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Real image decode on the JDK's own codecs (`javax.imageio` reads PNG, BMP,
 * GIF, JPEG with zero external dependencies) plus a deterministic synthetic
 * image generator used to plant oracle-checkable fixtures.
 *
 * This replaces the round-≤6 `decodeStub` *for images*: the stub derived
 * fake "dimensions" from payload bytes because the container has no codec
 * libraries — but PNG/BMP decoding needs none. Audio/video remain stubbed
 * ([[graft.ops.Multimodal.decodeStub]], [[graft.ops.Multimodal.sampleFrames]])
 * since those genuinely need external codecs.
 *
 * Decode failure policy: an unreadable/corrupt payload decodes to NULL
 * (never throws) — at corpus scale a bad image must not kill a 100 TB scan;
 * callers filter or count nulls. Pixel statistics are exact integer sums in
 * sRGB space, so any engine recomputing them from the generation parameters
 * gets bit-identical values (the DuckDB oracle does exactly that).
 */
object ImageKernels {

  /** Planted-image geometry/color — closed-form in the asset id, so an SQL
    * oracle can recompute every decoded statistic without touching pixels:
    * width = 8 + id%8, height = 8 + id%5, color = (id%256, id·7%256,
    * id·13%256); the x=0 column is black so positional pixel reads are
    * exercised (metadata-only "decoding" would get the sums wrong). */
  def synthPng(id: Long): Array[Byte] = {
    val w = (8 + math.floorMod(id, 8)).toInt
    val h = (8 + math.floorMod(id, 5)).toInt
    val r = math.floorMod(id, 256).toInt
    val g = math.floorMod(id * 7, 256).toInt
    val b = math.floorMod(id * 13, 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x == 0) 0 else rgb)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Shared pixel reader: the pure-JDK VP8L (lossless WebP) decoder
    * first ([[Vp8lKernels.decodeArgb]] — the framing javax.imageio
    * cannot read, r17), then ImageIO for everything it supports.
    * Returns (w, h, ARGB row-major) or null. */
  private def readRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val v = Vp8lKernels.decodeArgb(bytes)
    if (v != null) v
    else {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        (w, h, img.getRGB(0, 0, w, h, null, 0, w))
      }
    }
  }

  /** Decode any supported payload (ImageIO formats + VP8L WebP) to
    * exact pixel statistics;
    * null for unreadable bytes. Catches NonFatal, not just IOException:
    * javax.imageio decoders throw RuntimeExceptions
    * (ArrayIndexOutOfBounds, NegativeArraySize, IllegalArgument,
    * CMMException) on malformed/truncated headers, and any of those
    * escaping would kill the task — and with it the whole 100 TB scan
    * the never-throws policy exists to protect. */
  def decode(bytes: Array[Byte]): InternalRow =
    try {
      val rgb = readRgb(bytes)
      if (rgb == null) null
      else {
        val (w, h, px) = rgb
        var sr = 0L
        var sg = 0L
        var sb = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff
          sg += (p >> 8) & 0xff
          sb += p & 0xff
          i += 1
        }
        new GenericInternalRow(Array[Any](w, h, w.toLong * h, sr, sg, sb))
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /**
   * 64-bit average-hash (aHash) perceptual fingerprint: the decoded image
   * is block-averaged onto an 8×8 luminance grid (cell (cy, cx) covers
   * pixel columns [cx·w/8, (cx+1)·w/8) — integer division, exact for any
   * geometry), and bit `cy·8 + cx` is set iff the cell's mean luminance
   * (l = r+g+b) is at least the whole-image mean — compared CROSS-
   * MULTIPLIED (`cell_sum·total_px >= total_sum·cell_px`), so no float
   * division ever happens and the bit pattern replays exactly from the
   * planted-image closed form in the SQL oracle. Cells with zero pixels
   * (w or h below 8) contribute a 0 bit. Null for unreadable bytes.
   *
   * Near-identical images (re-encodes, small edits, resizes that preserve
   * the 8×8 structure) land within a few bits — pair them with the
   * simhash64 band machinery ([[graft.ops.Dedup.simhashNearDuplicates64]]).
   */
  def aHash64(bytes: Array[Byte]): java.lang.Long =
    try {
      val rgb = readRgb(bytes)
      if (rgb == null) null
      else {
        val (w, h, px) = rgb
        var totalSum = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          totalSum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          i += 1
        }
        val totalPx = w.toLong * h
        var hash = 0L
        var cy = 0
        while (cy < 8) {
          val y0 = cy * h / 8
          val y1 = (cy + 1) * h / 8
          var cx = 0
          while (cx < 8) {
            val x0 = cx * w / 8
            val x1 = (cx + 1) * w / 8
            val cellPx = (x1 - x0).toLong * (y1 - y0)
            if (cellPx > 0) {
              var cellSum = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = px(y * w + x)
                  cellSum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                  x += 1
                }
                y += 1
              }
              if (cellSum * totalPx >= totalSum * cellPx)
                hash |= 1L << (cy * 8 + cx)
            }
            cx += 1
          }
          cy += 1
        }
        java.lang.Long.valueOf(hash)
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /**
   * REAL downscale by integer block averaging: output pixel (ox, oy)
   * covers source block [ox·w/tw, (ox+1)·w/tw) × [oy·h/th, (oy+1)·h/th)
   * (floor indexing — the [[aHash64]] grid), each channel the FLOOR of the
   * block's integer mean. Deterministic to the bit on any JVM (no AWT
   * scaler, no float filter kernels), so the decoded statistics of a
   * resized planted image replay closed-form in the SQL oracle. Returns a
   * PNG re-encode; null for unreadable bytes or an UPSCALE request (this
   * is the thumbnail/feature-prep kernel — upsampling is a modeling
   * choice, not a data-prep default).
   */
  def resizePng(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] =
    try {
      val rgb = readRgb(bytes)
      if (rgb == null) null
      else {
        val (w, h, px0) = rgb
        if (tw < 1 || th < 1 || tw > w || th > h) null
        else {
          val px = px0
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var oy = 0
          while (oy < th) {
            val y0 = oy * h / th
            val y1 = (oy + 1) * h / th
            var ox = 0
            while (ox < tw) {
              val x0 = ox * w / tw
              val x1 = (ox + 1) * w / tw
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = px(y * w + x)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (x1 - x0).toLong * (y1 - y0)
              out.setRGB(ox, oy,
                (((sr / n).toInt & 0xff) << 16) |
                  (((sg / n).toInt & 0xff) << 8) |
                  ((sb / n).toInt & 0xff))
              ox += 1
            }
            oy += 1
          }
          val baos = new ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          baos.toByteArray
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  val decodeType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** `synth_image(id)` — deterministic planted PNG (test/oracle fixture). */
  case class SynthImage(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_image requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_image"
    override protected def nullSafeEval(id: Any): Any = synthPng(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.ImageKernels.synthPng($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthImage =
      copy(child = newChild)
  }

  /** `image_decode(content)` — exact pixel stats, null on unreadable bytes. */
  case class ImageDecode(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_decode requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = decodeType
    override def nullable: Boolean = true
    override def prettyName: String = "image_decode"
    override protected def nullSafeEval(bytes: Any): Any =
      decode(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.expressions.ImageKernels.decode($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): ImageDecode =
      copy(child = newChild)
  }

  val synthInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthImage].getName,
    null,
    "synth_image",
    "_FUNC_(id) - deterministic synthetic PNG payload for the given id (fixture generator).",
    "", "", "", "", "", "", "built-in")

  val decodeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ImageDecode].getName,
    null,
    "image_decode",
    "_FUNC_(content) - decode an image payload (PNG/BMP/GIF/JPEG via javax.imageio) to exact pixel statistics; NULL if unreadable.",
    "", "", "", "", "", "", "built-in")

  /** `image_ahash(content)` — 64-bit average-hash perceptual fingerprint,
    * null on unreadable bytes. */
  case class ImageAHash(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_ahash requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_ahash"
    override protected def nullSafeEval(bytes: Any): Any =
      aHash64(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |java.lang.Long ${ev.value}_h = graft.expressions.ImageKernels.aHash64($c);
           |${ev.isNull} = ${ev.value}_h == null;
           |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_h.longValue();
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): ImageAHash =
      copy(child = newChild)
  }

  /** `image_resize(content, tw, th)` — integer block-average downscale to
    * a PNG; null on unreadable bytes or upscale. tw/th are plan-time
    * literals (a data-dependent output geometry has no stable schema
    * story). */
  case class ImageResize(child: Expression, tw: Int, th: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType if tw >= 1 && th >= 1 => TypeCheckResult.TypeCheckSuccess
      case BinaryType => TypeCheckResult.TypeCheckFailure(
        s"image_resize target must be >= 1x1, got ${tw}x$th")
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_resize requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "image_resize"
    override protected def nullSafeEval(bytes: Any): Any =
      resizePng(bytes.asInstanceOf[Array[Byte]], tw, th)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.expressions.ImageKernels.resizePng($c, $tw, $th);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): ImageResize =
      copy(child = newChild)
  }

  val resizeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ImageResize].getName,
    null,
    "image_resize",
    "_FUNC_(content, tw, th) - integer block-average downscale to a tw x th PNG; NULL if unreadable or an upscale.",
    "", "", "", "", "", "", "built-in")

  val aHashInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ImageAHash].getName,
    null,
    "image_ahash",
    "_FUNC_(content) - 64-bit average-hash perceptual fingerprint of an image payload (8x8 block-averaged luminance vs global mean, integer-exact); NULL if unreadable.",
    "", "", "", "", "", "", "built-in")

  // ---- header-metadata tier (round 16) -----------------------------------
  //
  // `image_meta` parses CONTAINER HEADERS ONLY — dimensions + format +
  // alpha flag with zero pixel decode — which is (a) the only tier
  // available for WebP, a dominant crawl image format javax.imageio
  // cannot decode (VP8 lossy, VP8L lossless, and VP8X extended headers
  // are all pure byte arithmetic, the same shape as VideoKernels'
  // ISO-BMFF walk), and (b) the cheap first pass a 100 TB image corpus
  // runs before deciding what to decode at all. Header-tier honesty:
  // PNG alpha comes from the IHDR color type (a tRNS chunk deeper in
  // the stream is not consulted); GIF transparency lives in per-frame
  // graphics-control extensions, so GIF reports false; JPEG has no
  // alpha. Corrupt/truncated/unknown bytes → NULL, never a throw.

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def tag4(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  private def metaRow(fmt: String, w: Int, h: Int, alpha: Boolean): InternalRow =
    if (w <= 0 || h <= 0) null
    else new GenericInternalRow(Array[Any](
      org.apache.spark.unsafe.types.UTF8String.fromString(fmt), w, h, alpha))

  def imageMeta(b: Array[Byte]): InternalRow =
    try {
      val n = b.length
      // PNG: signature + IHDR (always the first chunk per spec)
      if (n >= 26 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && tag4(b, 12) == "IHDR") {
        val ct = b(25) & 0xff
        metaRow("png", be32(b, 16), be32(b, 20), ct == 4 || ct == 6)
      } else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        metaRow("gif", le16(b, 6), le16(b, 8), alpha = false)
      } else if (n >= 26 && b(0) == 'B' && b(1) == 'M') {
        val dib = le32(b, 14)
        if (dib >= 40 && n >= 30)
          metaRow("bmp", le32(b, 18), math.abs(le32(b, 22)),
            le16(b, 28) == 32)
        else if (dib == 12)
          metaRow("bmp", le16(b, 18), le16(b, 20), alpha = false)
        else null
      } else if (n >= 12 && tag4(b, 0) == "RIFF" && tag4(b, 8) == "WEBP") {
        if (n < 20) return null
        tag4(b, 12) match {
          case "VP8 " if n >= 30 =>
            // lossy: 3-byte frame tag, sync 9D 01 2A, then 14-bit dims
            if ((b(23) & 0xff) != 0x9d || (b(24) & 0xff) != 0x01 ||
              (b(25) & 0xff) != 0x2a) null
            else metaRow("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff,
              alpha = false)
          case "VP8L" if n >= 25 =>
            // lossless: 0x2F signature, then 14+14 bit dims-1 + alpha bit
            if ((b(20) & 0xff) != 0x2f) null
            else {
              val bits = le32(b, 21)
              metaRow("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1,
                ((bits >> 28) & 1) == 1)
            }
          case "VP8X" if n >= 30 =>
            // extended: flags byte (0x10 = alpha), 24-bit canvas dims-1
            metaRow("webp", le24(b, 24) + 1, le24(b, 27) + 1,
              (b(20) & 0x10) != 0)
          case _ => null
        }
      } else if (n >= 16 && tag4(b, 4) == "ftyp") {
        avifMeta(b)
      } else if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk markers to the first SOFn (C0-CF minus C4/C8/CC)
        var i = 2
        while (i + 3 < n) {
          if ((b(i) & 0xff) != 0xff) return null
          var m = b(i + 1) & 0xff
          while (m == 0xff && i + 2 < n) { i += 1; m = b(i + 1) & 0xff }
          if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (m == 0xd9 || m == 0xda) return null // EOI/SOS before SOF
          else {
            val len = be16(b, i + 2)
            if (len < 2) return null
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 9 > n) return null
              return metaRow("jpeg", be16(b, i + 7), be16(b, i + 5),
                alpha = false)
            }
            i += 2 + len
          }
        }
        null
      } else null
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /** Deterministic WebP fixture: id rotates through the three WebP
    * framings — id%3 = 0 lossy VP8 (alpha always false), 1 lossless
    * VP8L, 2 extended VP8X — with closed-form geometry w = 16 + id%32,
    * h = 16 + id%16 and alpha = (id%2 == 1) for the framings that carry
    * the bit. Only the HEADERS are real (the pixel bitstream is not
    * generated — `image_meta` never reads past them); id%7 == 6 emits
    * a truncated RIFF shell to pin the corrupt→NULL law. */
  // ISO-BMFF still images (AVIF/HEIC) — the same pure-byte box walk shape
  // as VideoKernels' MP4 parse, against the HEIF layout:
  // ftyp(brand) → meta(FullBox) → iprp → ipco → ispe (spatial extents,
  // FullBox: ver/flags then width/height u32). Alpha is an AUXILIARY
  // IMAGE ITEM in HEIF, marked by an `auxC` property in ipco — presence
  // is the honest header-tier signal (resolving which item it attaches
  // to needs the ipma association walk; the property existing at all
  // means the file carries an alpha plane). The FIRST ispe is taken:
  // encoders write the primary item's properties first, and the alpha
  // aux item shares the primary's extents.

  /** Map an ftyp brand to a format label; null for non-still brands. */
  private def bmffBrand(s: String): String =
    if (s == "avif" || s == "avis") "avif"
    else if (s == "heic" || s == "heix" || s == "hevc" || s == "hevx") "heic"
    else if (s == "mif1" || s == "msf1") "heif"
    else null

  /** First child box of `typ` scanning [from, end); (payloadStart,
    * boxEnd) or null. Strict: a malformed size aborts the walk. */
  private def bmffChild(b: Array[Byte], from: Int, end: Int, typ: String): (Int, Int) = {
    var i = from
    while (i + 8 <= end) {
      val sz = be32(b, i).toLong & 0xffffffffL
      if (sz < 8 || i + sz > end) return null
      if (tag4(b, i + 4) == typ) return (i + 8, i + sz.toInt)
      i += sz.toInt
    }
    null
  }

  private def avifMeta(b: Array[Byte]): InternalRow = {
    val n = b.length
    val ftypSize = be32(b, 0)
    if (ftypSize < 16 || ftypSize > n) return null
    // major brand, then the compatible-brands list; the MOST SPECIFIC
    // label wins (an avif file typically lists mif1 as compatible)
    var best: String = null
    def consider(s: String): Unit = {
      val f = bmffBrand(s)
      if (f != null && (best == null ||
        (best == "heif" && f != "heif"))) best = f
    }
    consider(tag4(b, 8))
    var i = 16
    while (i + 4 <= ftypSize) { consider(tag4(b, i)); i += 4 }
    if (best == null) return null
    val meta = bmffChild(b, ftypSize, n, "meta")
    if (meta == null) return null
    val iprp = bmffChild(b, meta._1 + 4, meta._2, "iprp") // meta is a FullBox
    if (iprp == null) return null
    val ipco = bmffChild(b, iprp._1, iprp._2, "ipco")
    if (ipco == null) return null
    var w = -1
    var h = -1
    var alpha = false
    var j = ipco._1
    while (j + 8 <= ipco._2) {
      val sz = be32(b, j).toLong & 0xffffffffL
      if (sz < 8 || j + sz > ipco._2) return null
      val t = tag4(b, j + 4)
      if (t == "ispe" && w < 0 && j + 20 <= ipco._2) {
        w = be32(b, j + 12); h = be32(b, j + 16)
      } else if (t == "auxC") alpha = true
      j += sz.toInt
    }
    metaRow(best, w, h, alpha)
  }

  /** Deterministic AVIF/HEIC fixture: brand heic at id%5=0 else avif
    * (mif1 always listed compatible — the specific brand must win),
    * closed-form geometry w = 24 + id%40, h = 24 + id%24, alpha =
    * (id%2 == 1) via an `auxC` property; id%7 == 6 emits a meta box
    * whose declared size runs past EOF to pin the corrupt→NULL law.
    * Headers only (no coded image data — `image_meta` never reads
    * past ipco). */
  def synthAvif(id: Long): Array[Byte] = {
    val w = (24 + math.floorMod(id, 40)).toInt
    val h = (24 + math.floorMod(id, 24)).toInt
    val alpha = math.floorMod(id, 2) == 1
    val brand = if (math.floorMod(id, 5) == 0) "heic" else "avif"
    def be32a(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32a(8 + payload.length) ++
        typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload
    val ftyp = box("ftyp",
      brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        be32a(0) ++
        "mif1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    if (math.floorMod(id, 7) == 6) {
      // meta declares 4096 bytes and the file ends: corrupt
      return ftyp ++ be32a(4096) ++
        "meta".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        be32a(0)
    }
    val ispe = box("ispe", be32a(0) ++ be32a(w) ++ be32a(h))
    val auxC = box("auxC", be32a(0) ++
      "urn:mpeg:mpegB:cicp:systems:auxiliary:alpha "
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val ipco = box("ipco", if (alpha) ispe ++ auxC else ispe)
    val meta = box("meta", be32a(0) ++ box("iprp", ipco))
    val mdat = box("mdat", Array[Byte](1, 2, 3, 4))
    ftyp ++ meta ++ mdat
  }

  def synthWebp(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 32)).toInt
    val h = (16 + math.floorMod(id, 16)).toInt
    val alpha = math.floorMod(id, 2) == 1
    val out = new ByteArrayOutputStream()
    def le32w(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    if (math.floorMod(id, 7) == 6) {
      out.write("RIFF".getBytes("US-ASCII")); le32w(4)
      out.write("WEBP".getBytes("US-ASCII")) // no chunk: truncated shell
      return out.toByteArray
    }
    val (tag, payload) = math.floorMod(id, 3) match {
      case 0 =>
        val p = new Array[Byte](10)
        p(3) = 0x9d.toByte; p(4) = 0x01; p(5) = 0x2a
        p(6) = (w & 0xff).toByte; p(7) = ((w >> 8) & 0x3f).toByte
        p(8) = (h & 0xff).toByte; p(9) = ((h >> 8) & 0x3f).toByte
        ("VP8 ", p)
      case 1 =>
        val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
        val p = new Array[Byte](5)
        p(0) = 0x2f
        p(1) = (bits & 0xff).toByte; p(2) = ((bits >> 8) & 0xff).toByte
        p(3) = ((bits >> 16) & 0xff).toByte; p(4) = ((bits >> 24) & 0xff).toByte
        ("VP8L", p)
      case _ =>
        val p = new Array[Byte](10)
        p(0) = (if (alpha) 0x10 else 0x00).toByte
        val cw = w - 1
        val ch = h - 1
        p(4) = (cw & 0xff).toByte; p(5) = ((cw >> 8) & 0xff).toByte
        p(6) = ((cw >> 16) & 0xff).toByte
        p(7) = (ch & 0xff).toByte; p(8) = ((ch >> 8) & 0xff).toByte
        p(9) = ((ch >> 16) & 0xff).toByte
        ("VP8X", p)
    }
    val padded = payload.length + (payload.length & 1)
    out.write("RIFF".getBytes("US-ASCII")); le32w(4 + 8 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(tag.getBytes("US-ASCII")); le32w(payload.length)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("has_alpha", BooleanType)))

  /** `image_meta(content)` — header-only (format, width, height,
    * has_alpha); NULL for corrupt/unknown bytes. */
  case class ImageMeta(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_meta requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = metaType
    override def nullable: Boolean = true
    override def prettyName: String = "image_meta"
    override protected def nullSafeEval(bytes: Any): Any =
      imageMeta(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.expressions.ImageKernels.imageMeta($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): ImageMeta =
      copy(child = newChild)
  }

  /** `synth_webp(id)` — deterministic WebP header fixture (see
    * [[synthWebp]]). */
  case class SynthWebp(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_webp requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_webp"
    override protected def nullSafeEval(id: Any): Any =
      synthWebp(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.ImageKernels.synthWebp($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthWebp =
      copy(child = newChild)
  }

  /** `synth_avif(id)` — deterministic AVIF/HEIC header fixture (see
    * [[synthAvif]]). */
  case class SynthAvif(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_avif requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_avif"
    override protected def nullSafeEval(id: Any): Any =
      synthAvif(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.ImageKernels.synthAvif($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthAvif =
      copy(child = newChild)
  }

  val metaInfo: ExpressionInfo = new ExpressionInfo(
    classOf[ImageMeta].getName,
    null,
    "image_meta",
    "_FUNC_(content) - header-only image metadata (format, width, height, has_alpha) for PNG/GIF/BMP/JPEG/WebP(VP8,VP8L,VP8X)/AVIF/HEIC (ISO-BMFF ispe walk, auxC alpha); NULL for corrupt or unknown bytes.",
    "", "", "", "", "", "", "built-in")

  val synthAvifInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthAvif].getName,
    null,
    "synth_avif",
    "_FUNC_(id) - deterministic AVIF/HEIC header fixture (ftyp brand by id%5, ispe geometry, auxC alpha at odd ids, corrupt meta at id%7=6).",
    "", "", "", "", "", "", "built-in")

  val synthWebpInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthWebp].getName,
    null,
    "synth_webp",
    "_FUNC_(id) - deterministic WebP header fixture rotating VP8/VP8L/VP8X framings (corrupt shell at id%7=6).",
    "", "", "", "", "", "", "built-in")
}
