package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_sigs(tokens, numHashes, shingle)` — MinHash signature of a
 * document computed PER ROW from its token array: for every word
 * `shingle`-gram (space-joined, `concat_ws` null-skipping semantics) take
 * the md5-derived 32-bit hash ([[graft.ops.TextOps.hash32]] semantics:
 * first 4 digest bytes, unsigned big-endian) and keep, per permutation `i`,
 * the minimum of the affine family `(h·(2i+1) + 98765·i + 12345) mod
 * (2^31−1)` ([[graft.ops.Dedup.affine]]). Returns `array<long>` of length
 * `numHashes`; fewer than `shingle` tokens yields an empty array.
 *
 * Why an expression: the aggregate formulation (explode shingles → shuffle
 * by doc id → grouped min) moves EVERY SHINGLE of the corpus through a
 * shuffle. The signature is a pure per-document function, so at 100 TB the
 * shuffle is pure waste — this kernel keeps shingles inside their row and
 * the whole dedup map phase stays embarrassingly parallel. Duplicate
 * shingles need no dedup pass: a min over a multiset equals the min over
 * its set.
 *
 * Values are identical to the aggregate path and to the DuckDB oracle
 * (same md5, same affine coefficients, same modulus).
 */
case class MinhashSigs(child: Expression, numHashes: Int, shingle: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 && shingle > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires array<string> tokens and positive numHashes/shingle, " +
          s"got ${child.dataType.simpleString}, numHashes=$numHashes, shingle=$shingle")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(a: Any): Any =
    MinhashSigs.compute(a.asInstanceOf[ArrayData], numHashes, shingle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinhashSigs.compute($a, $numHashes, $shingle);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {

  val Prime: Long = 2147483647L

  // One digest per thread, reset per use — getInstance() per shingle would
  // make provider lookup + allocation the dominant cost of the kernels.
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes as an unsigned big-endian 32-bit value —
    * exactly `conv(substring(md5(s), 1, 8), 16, 10)`. */
  def hash32(s: UTF8String): Long = hash32Bytes(s.getBytes)

  def hash32Bytes(b: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(b)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 8 md5 digest bytes as a packed 64-bit value whose LOW half is
    * hex chars 1-8 and HIGH half is hex chars 9-16 (each an unsigned
    * big-endian 32-bit value): bit j (0..31) comes from
    * `('0x'||substr(md5(s),1,8))`, bit 32+j from `substr(md5(s),9,8)`.
    * The split-halves layout keeps both sides oracle-expressible in signed
    * BIGINT arithmetic (a raw 8-byte value overflows DuckDB's hex cast). */
  def hash64(s: UTF8String): Long = hash64Bytes(s.getBytes)

  def hash64Bytes(b: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(b)
    val lo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val hi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    (hi << 32) | lo
  }

  /** 32-bit hash of the space-joined `shingle`-window at `start`
    * (`concat_ws` null-skipping semantics) — THE shingle-hash definition,
    * shared by every kernel so Spark↔oracle parity has one source of truth. */
  def shingleHash(tokens: ArrayData, start: Int, shingle: Int, sb: java.lang.StringBuilder): Long = {
    sb.setLength(0)
    var j = 0
    var first = true
    while (j < shingle) {
      if (!tokens.isNullAt(start + j)) { // concat_ws skips nulls
        if (!first) sb.append(' ')
        sb.append(tokens.getUTF8String(start + j).toString)
        first = false
      }
      j += 1
    }
    hash32Bytes(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Static kernel, invoked from generated code and from nullSafeEval. */
  def compute(tokens: ArrayData, numHashes: Int, shingle: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingle) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var start = 0
    while (start <= n - shingle) {
      val h = shingleHash(tokens, start, shingle, sb)
      var i = 0
      while (i < numHashes) {
        val v = (h * (2L * i + 1) + (98765L * i + 12345L)) % Prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      start += 1
    }
    new GenericArrayData(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashSigs].getName,
    null,
    "minhash_sigs",
    "_FUNC_(tokens, numHashes, shingle) - per-row MinHash signature of a token array.",
    "", "", "", "", "", "", "built-in")
}
