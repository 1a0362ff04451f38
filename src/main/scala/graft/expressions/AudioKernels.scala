package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Real audio decode on the JDK's own codec (`javax.sound.sampled` reads
 * WAV/PCM with zero external dependencies) plus a deterministic synthetic
 * WAV generator used to plant oracle-checkable fixtures — the audio arm of
 * the same playbook [[ImageKernels]] established for images in round 7.
 *
 * Scope: 16-bit signed PCM (the WAV interchange baseline). Compressed
 * audio (MP3/AAC/OGG) genuinely needs external codecs — those payloads
 * decode to NULL here, exactly like any other unreadable bytes, and a real
 * deployment swaps only this kernel. Video stays permanently stubbed
 * ([[graft.ops.Multimodal.sampleFrames]]): no in-JDK video codec exists.
 *
 * Decode failure policy (same as images): an unreadable/corrupt/
 * unsupported payload decodes to NULL — never throws (NonFatal caught) —
 * because one bad file must not kill a 100 TB scan; callers filter or
 * count nulls.
 *
 * Statistics are exact integer sums over the decoded samples (per-channel
 * sum and sum-of-squares — the integer core of per-channel RMS), so any
 * engine recomputing them from the generation parameters gets bit-identical
 * values (the DuckDB oracle does exactly that, closed-form in the asset id).
 */
object AudioKernels {

  /** Planted-WAV geometry — closed-form in the asset id, so an SQL oracle
    * can recompute every decoded statistic without touching samples:
    * sampleRate = 8000, channels = 1 + id%2, frames = 256 + id%128,
    * sample(ch, i) = ((id·31 + ch·17 + i·7919) mod 65536) − 32768. */
  val SampleRate: Int = 8000

  def synthWav(id: Long): Array[Byte] = {
    val channels = (1 + math.floorMod(id, 2)).toInt
    val frames = (256 + math.floorMod(id, 128)).toInt
    val dataLen = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(SampleRate)
      .putInt(SampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)              // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      var ch = 0
      while (ch < channels) {
        val v = math.floorMod(id * 31 + ch * 17 + i.toLong * 7919, 65536L) - 32768L
        buf.putShort(v.toShort)
        ch += 1
      }
      i += 1
    }
    buf.array()
  }

  val decodeType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("sum_c0", LongType),
    StructField("sumsq_c0", LongType),
    StructField("sum_c1", LongType),
    StructField("sumsq_c1", LongType)))

  /** Decode a 16-bit signed PCM payload (WAV et al. via
    * `javax.sound.sampled`) to exact integer sample statistics; NULL for
    * unreadable/unsupported bytes (NonFatal caught — see class doc).
    * Mono payloads report zeros for the second channel's sums. */
  def decode(bytes: Array[Byte]): InternalRow =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels >= 1 && fmt.getChannels <= 2
        if (!ok) null
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize // channels * 2 for 16-bit PCM
          val data = ais.readAllBytes()
          val frames = data.length / frameSize
          val sums = new Array[Long](2)
          val sumsqs = new Array[Long](2)
          var i = 0
          while (i < frames) {
            var ch = 0
            while (ch < channels) {
              val off = i * frameSize + ch * 2
              val v: Long =
                if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort.toLong
                else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toLong
              sums(ch) += v
              sumsqs(ch) += v * v
              ch += 1
            }
            i += 1
          }
          new GenericInternalRow(Array[Any](
            fmt.getSampleRate.toInt, channels, frames.toLong,
            sums(0), sumsqs(0), sums(1), sumsqs(1)))
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /**
   * 64-bit energy-profile audio fingerprint: frames are assigned to 64
   * windows by `w = i·64 / frames` (integer division — an ASSIGNMENT rule,
   * so SQL replays it without boundary arithmetic), and bit `w` is set iff
   * the window's total sample energy (Σ s² over frames and channels,
   * exact integers) is at least the track's mean energy per frame —
   * compared CROSS-MULTIPLIED (`e_w·F >= E·f_w`, channel counts cancel),
   * so no float division anywhere and the planted-WAV closed form replays
   * every bit in the oracle. Null for unreadable/non-PCM bytes; tracks
   * shorter than 64 frames hash on their occupied windows only (empty
   * windows contribute 0 bits). Re-encode-stable for lossless PCM: the
   * fingerprint is a pure function of the decoded sample matrix.
   */
  def fingerprint64(bytes: Array[Byte]): java.lang.Long =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels >= 1 && fmt.getChannels <= 2
        if (!ok) null
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize
          val data = ais.readAllBytes()
          val frames = data.length / frameSize
          if (frames == 0) null
          else {
            val e = new Array[Long](64)
            val f = new Array[Long](64)
            var total = 0L
            var i = 0
            while (i < frames) {
              val w = ((i.toLong * 64) / frames).toInt
              var ch = 0
              var sq = 0L
              while (ch < channels) {
                val off = i * frameSize + ch * 2
                val v: Long =
                  if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort.toLong
                  else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toLong
                sq += v * v
                ch += 1
              }
              e(w) += sq
              f(w) += 1
              total += sq
              i += 1
            }
            var hash = 0L
            var w = 0
            while (w < 64) {
              // BigInt: e_w·F overflows a long past ~2^19 frames (real
              // tracks easily exceed that); 64 arbitrary-precision
              // compares per track are noise next to the decode
              if (f(w) > 0 && BigInt(e(w)) * frames >= BigInt(total) * f(w))
                hash |= 1L << w
              w += 1
            }
            java.lang.Long.valueOf(hash)
          }
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /** `synth_wav(id)` — deterministic planted WAV (test/oracle fixture). */
  case class SynthWav(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_wav requires bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "synth_wav"
    override protected def nullSafeEval(id: Any): Any = synthWav(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.AudioKernels.synthWav($c);")
    override protected def withNewChildInternal(newChild: Expression): SynthWav =
      copy(child = newChild)
  }

  /** `audio_decode(content)` — exact sample stats, null on unreadable bytes. */
  case class AudioDecode(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_decode requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = decodeType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_decode"
    override protected def nullSafeEval(bytes: Any): Any =
      decode(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.expressions.AudioKernels.decode($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): AudioDecode =
      copy(child = newChild)
  }

  val synthInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SynthWav].getName,
    null,
    "synth_wav",
    "_FUNC_(id) - deterministic synthetic 16-bit PCM WAV payload for the given id (fixture generator).",
    "", "", "", "", "", "", "built-in")

  val decodeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[AudioDecode].getName,
    null,
    "audio_decode",
    "_FUNC_(content) - decode a 16-bit PCM audio payload (WAV via javax.sound.sampled) to exact sample statistics; NULL if unreadable.",
    "", "", "", "", "", "", "built-in")

  /** `audio_fingerprint(content)` — 64-bit energy-profile fingerprint,
    * null on unreadable bytes. */
  case class AudioFingerprint(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_fingerprint requires binary, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_fingerprint"
    override protected def nullSafeEval(bytes: Any): Any =
      fingerprint64(bytes.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |java.lang.Long ${ev.value}_h = graft.expressions.AudioKernels.fingerprint64($c);
           |${ev.isNull} = ${ev.value}_h == null;
           |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_h.longValue();
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
      copy(child = newChild)
  }

  val fingerprintInfo: ExpressionInfo = new ExpressionInfo(
    classOf[AudioFingerprint].getName,
    null,
    "audio_fingerprint",
    "_FUNC_(content) - 64-bit energy-profile audio fingerprint (64 windows vs mean frame energy, integer-exact); NULL if unreadable.",
    "", "", "", "", "", "", "built-in")
}
