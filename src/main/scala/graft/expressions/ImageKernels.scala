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

  /** Decode any ImageIO-supported payload to exact pixel statistics;
    * null for unreadable bytes. Catches NonFatal, not just IOException:
    * javax.imageio decoders throw RuntimeExceptions
    * (ArrayIndexOutOfBounds, NegativeArraySize, IllegalArgument,
    * CMMException) on malformed/truncated headers, and any of those
    * escaping would kill the task — and with it the whole 100 TB scan
    * the never-throws policy exists to protect. */
  def decode(bytes: Array[Byte]): InternalRow =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
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
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
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
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (tw < 1 || th < 1 || tw > w || th > h) null
        else {
          val px = img.getRGB(0, 0, w, h, null, 0, w)
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
}
