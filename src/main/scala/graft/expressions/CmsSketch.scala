package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `cms_sketch(col, d, w)` — Count-Min sketch as a native Catalyst
 * aggregate: a d×w counter matrix answering point-frequency queries over
 * an UNBOUNDED key domain in O(d·w) space.
 *
 * Complements [[FreqSketch]] (Misra-Gries): MG answers "which items are
 * frequent" with at most k survivors; CMS answers "how often did THIS item
 * occur" for any item, including ones far below the heavy-hitter bar —
 * the building block for per-key rate limits, join-skew pre-detection and
 * frequency features at 100 TB, where `groupBy(key).count()` would
 * shuffle one record per distinct key. Shuffle volume here is O(d·w ×
 * partitions) regardless of key cardinality, same shape as `freq_items`.
 *
 * Guarantees (Cormode & Muthukrishnan 2005):
 *  - estimates never undercount: est(x) ≥ true(x) always (each row-i
 *    counter sums true(x) plus its colliders — nonnegative);
 *  - est(x) ≤ true(x) + εN with probability 1−δ for w = ⌈e/ε⌉ rows of
 *    d = ⌈ln 1/δ⌉ — the classical bound, law-tested in CmsSketchSpec;
 *  - the merge is elementwise ADDITION, so unlike Misra-Gries the sketch
 *    content is EXACTLY partition- and merge-order-independent: the
 *    counter matrix is a pure function of the multiset of inputs, which
 *    is what lets a DuckDB oracle replay the whole sketch bit-for-bit.
 *
 * Hashing is the engine's standard md5-derived 32-bit hash
 * ([[MinhashSigs.hash32]] = `('0x'||substr(md5(x),1,8))::BIGINT` in
 * DuckDB) pushed through the same affine family as the MinHash
 * permutations: `bucket_i(x) = ((h·(2i+1) + (98765·i+12345)) mod P) mod w`
 * — deterministic, engine-portable, no RNG state.
 *
 * Result: `array<array<bigint>>` — d rows of w counters.
 */
object CmsSketch {

  val Prime: Long = MinhashSigs.Prime // 2147483647
  val MaxDepth = 16
  // Every PARTIAL aggregate ships its full d×w matrix through the
  // exchange; at the cap that is 16 × 65536 × 8 B = 8 MB per partition —
  // already generous (w = 65536 gives ε ≈ 4·10⁻⁵), while an unbounded
  // width would let one aggregate allocate executor-memory-sized buffers.
  val MaxWidth = 1 << 16

  val resultType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  /** Row-i bucket of a pre-hashed key — THE bucket definition, shared by
    * the aggregate, the estimator column and the spec reference. */
  def bucket(h32: Long, i: Int, w: Int): Int =
    (((h32 * (2L * i + 1) + (98765L * i + 12345L)) % Prime) % w).toInt

  final class Counters(val d: Int, val w: Int) {
    val cells = new Array[Long](d * w)
    def add(s: UTF8String): Unit = {
      val h = MinhashSigs.hash32(s)
      var i = 0
      while (i < d) { cells(i * w + bucket(h, i, w)) += 1L; i += 1 }
    }
    def mergeIn(other: Counters): Unit = {
      require(other.d == d && other.w == w, "merging differently-shaped CMS buffers")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    }
  }

  case class Cms(
      child: Expression, d: Int, w: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Counters] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType if d >= 1 && d <= MaxDepth && w >= 1 && w <= MaxWidth =>
        TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName depth must be in [1, $MaxDepth] and width in [1, $MaxWidth], got ($d, $w)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${other.simpleString}")
    }

    override def createAggregationBuffer(): Counters = new Counters(d, w)

    override def update(buffer: Counters, input: InternalRow): Counters = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[UTF8String])
      buffer
    }

    override def merge(buffer: Counters, other: Counters): Counters = {
      buffer.mergeIn(other)
      buffer
    }

    override def eval(buffer: Counters): Any =
      new GenericArrayData(Array.tabulate[Any](d) { i =>
        val row = new Array[Any](w)
        var j = 0
        while (j < w) { row(j) = buffer.cells(i * w + j); j += 1 }
        new GenericArrayData(row)
      })

    override def serialize(buffer: Counters): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.d)
      out.writeInt(buffer.w)
      var i = 0
      while (i < buffer.cells.length) { out.writeLong(buffer.cells(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Counters = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val c = new Counters(in.readInt(), in.readInt())
      var i = 0
      while (i < c.cells.length) { c.cells(i) = in.readLong(); i += 1 }
      c
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): Cms =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): Cms =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): Cms =
      copy(child = newChild)

    override def dataType: DataType = resultType
    override def nullable: Boolean = false
    override def prettyName: String = "cms_sketch"
  }

  val info = new ExpressionInfo(
    classOf[Cms].getName, "cms_sketch",
    "cms_sketch(col, d, w) - Count-Min sketch of a string column: d x w " +
      "counter matrix; point estimates never undercount and overcount by " +
      "at most eps*N w.h.p. for w = ceil(e/eps), d = ceil(ln 1/delta). " +
      "Merge is elementwise addition (exactly partition-order-independent).")
}
