package graft

import graft.expressions.Vp8lKernels
import graft.ops.Multimodal

/**
 * VP8L (lossless WebP) pixel decode: every fixture arm round-trips to
 * its closed-form pixels, the perceptual tier sees through re-encodes
 * (three different VP8L encodings of one image hash identically, and
 * match the same image as PNG), and the refusal laws hold (VP8 lossy,
 * corrupt, truncated → null).
 */
class Vp8lSpec extends SparkSpec {
  import spark.implicits._

  /** Closed-form expected pixels for synthWebpL(id) (see the encoder's
    * geometry contract). */
  private def expected(id: Long): (Int, Int, Long, Long, Long, Long) = {
    val w = (9 + math.floorMod(id, 8)).toInt
    val h = (8 + math.floorMod(id, 5)).toInt
    val r = math.floorMod(id, 256)
    val g = math.floorMod(id * 7, 256)
    val b = math.floorMod(id * 13, 256)
    val arm = math.floorMod(id, 7).toInt
    val n = w.toLong * h
    arm match {
      case 0 | 1 | 4 => // black first column
        (w, h, n, (w - 1).toLong * h * r, (w - 1).toLong * h * g,
          (w - 1).toLong * h * b)
      case 2 => // LZ77 stripes: greens alternate g/(g+128) by row;
        // the last row copies row h-2 (far plane code 97 + code 1)
        val gb2 = (g + 128) % 256
        val nGa = if (h % 2 == 0) h / 2 + 1 else (h - 1) / 2
        (w, h, n, n * r, w.toLong * (nGa * g + (h - nGa) * gb2), n * b)
      case 3 | 5 => // constant color
        (w, h, n, n * r, n * g, n * b)
      case _ => // arm 6: greens 1 + y%2 off the black column
        (w, h, n, (w - 1).toLong * h * r,
          (w - 1).toLong * (h + h / 2), (w - 1).toLong * h * b)
    }
  }

  test("the LZ77 code-to-plane table: packed form round-trips all 120 " +
    "entries, and the nearest-first generation rule reproduces the " +
    "verbatim embed everywhere except the documented d²=61 tie quirk") {
    val table = Vp8lKernels.DistMapPairs.toSeq
    assert(table.length == 120)
    // the packed (dx+7)|(dy<<4) form must round-trip exactly — this is
    // what the decode loop reads (the old (dx+8) pack overflowed dx=8)
    assert(Vp8lKernels.distMapEntries.toSeq == table)
    // domain law: dy 0..7, dx −7..8, (dy=0, dx≤0) excluded, no dups
    assert(table.distinct.length == 120)
    for ((dx, dy) <- table)
      assert(dy >= 0 && dy <= 7 && dx >= -7 && dx <= 8 &&
        !(dy == 0 && dx <= 0), s"($dx,$dy) outside the spec domain")
    // cross-check: nearest-first by dx²+dy², ties larger dy then
    // positive dx, reproduces the published table at every plane code
    // EXCEPT the d²=61 group (codes 93–96), where the published order
    // is (6,5),(−6,5),(5,6),(−5,6) — an unstable-sort quirk the
    // normative table carries and decoders must follow verbatim
    val ruled = (for {
      dy <- 0 to 7
      dx <- -7 to 8
      if !(dy == 0 && dx <= 0)
    } yield (dx, dy))
      .sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }
    for (i <- 0 until 120 if i < 92 || i > 95)
      assert(table(i) == ruled(i),
        s"plane code ${i + 1}: embed ${table(i)} vs rule ${ruled(i)}")
    assert(table.slice(92, 96) == Seq((6, 5), (-6, 5), (5, 6), (-5, 6)))
    assert(ruled.slice(92, 96).toSet == table.slice(92, 96).toSet)
  }

  test("every encoder arm round-trips: literal, subtract-green, LZ77 " +
    "neighborhood backref, color cache, bundled palette, predictor, " +
    "normal huffman") {
    graft.GraftExtensions.register(spark)
    // 14 consecutive ids cover every arm twice with varied geometry
    val rows = (100L to 113L).map { id =>
      (id, Vp8lKernels.synthWebpL(id))
    }.toDF("id", "bytes")
      .select($"id", Multimodal.decodeImage($"bytes").as("f"))
      .select($"id", $"f.width", $"f.height", $"f.n_px",
        $"f.sum_r", $"f.sum_g", $"f.sum_b")
      .as[(Long, Int, Int, Long, Long, Long, Long)]
      .collect()
    for ((id, w, h, n, sr, sg, sb) <- rows) {
      val (ew, eh, en, er, eg, eb) = expected(id)
      assert((w, h, n, sr, sg, sb) == ((ew, eh, en, er, eg, eb)),
        s"id=$id arm=${id % 7}: got ($w,$h,$n,$sr,$sg,$sb) " +
          s"want ($ew,$eh,$en,$er,$eg,$eb)")
    }
  }

  test("perceptual dedup sees through re-encodes: three VP8L encodings " +
    "of one image (literal / subtract-green / palette) hash identically, " +
    "and equal the SAME pixels as PNG — exact dedup is blind to all four") {
    graft.GraftExtensions.register(spark)
    // ids congruent mod lcm(8,5,256)=2560 share geometry/color; the +7680
    // and +12800 offsets shift the arm by 1 and 4 (2560 ≡ 5 mod 7)
    val ids = Seq(14L, 7694L, 12814L) // arms 0, 1, 4 — identical pixels
    val encs = ids.map(Vp8lKernels.synthWebpL)
    assert(encs.map(_.toSeq).distinct.size == 3, "three DIFFERENT byte streams")
    // identical pixels -> identical aHash through the kernel path
    val hashes = encs.map { b =>
      Seq(Tuple1(b)).toDF("b")
        .select(org.apache.spark.sql.functions.call_function("image_ahash", $"b"))
        .as[Long].collect().head
    }
    assert(hashes.distinct.size == 1, s"one perceptual hash: $hashes")
    // and the same picture as PNG (ImageIO route) agrees
    val w = 15; val h = 12
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (14 << 16) | (98 << 8) | 182
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x == 0) 0 else rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val pngHash = Seq(Tuple1(baos.toByteArray)).toDF("b")
      .select(org.apache.spark.sql.functions.call_function("image_ahash", $"b"))
      .as[Long].collect().head
    assert(pngHash == hashes.head, "PNG and VP8L of one image hash alike")
  }

  test("refusal laws: VP8 lossy stays null, corrupt/truncated VP8L is " +
    "null, decode dims agree with the header-metadata tier") {
    graft.GraftExtensions.register(spark)
    def dec(b: Array[Byte]) =
      Seq(Tuple1(b)).toDF("b").select(Multimodal.decodeImage($"b"))
        .collect()(0)
    // a VP8 (lossy) shell from the header-tier fixture generator: meta
    // reads its geometry, pixel decode must refuse
    val lossy = Seq(Tuple1(0L)).toDF("id")
      .select(org.apache.spark.sql.functions.call_function("synth_webp", $"id"))
      .as[Array[Byte]].collect().head
    assert(dec(lossy).isNullAt(0))
    // corrupt: flip a byte mid-stream; truncate the payload
    val good = Vp8lKernels.synthWebpL(101L)
    val flipped = good.clone()
    flipped(flipped.length - 3) = (flipped(flipped.length - 3) ^ 0x7f).toByte
    val out = dec(flipped)
    // a mid-stream flip either refuses or decodes to the same dims
    // (the header is intact) — it must never throw; truncation refuses
    assert(out.isNullAt(0) || out.getStruct(0).getInt(0) == 14)
    assert(dec(good.take(24)).isNullAt(0))
    // meta/decode consistency on a real VP8L payload
    val meta = Seq(Tuple1(good)).toDF("b")
      .select(org.apache.spark.sql.functions.call_function("image_meta", $"b").as("m"))
      .select($"m.format", $"m.width", $"m.height")
      .as[(String, Int, Int)].collect().head
    val d = dec(good).getStruct(0)
    assert(meta._1 == "webp" && meta._2 == d.getInt(0) && meta._3 == d.getInt(1),
      s"meta $meta vs decode (${d.getInt(0)}, ${d.getInt(1)})")
  }
}
