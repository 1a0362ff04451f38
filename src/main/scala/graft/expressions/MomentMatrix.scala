package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `moment_matrix(vec, dims, scale)` — exact integer first and second
 * moments of a vector column in ONE partial-aggregatable pass: each
 * component quantizes to `q_d = floor(x_d · scale)` (the engine's standard
 * integer-domain trick, see [[QuantizedDot]]), and the aggregate
 * accumulates the count, the per-dimension sums `Σ q_d`, and the
 * upper-triangle cross products `Σ q_i·q_j` (i ≤ j) — everything a PCA /
 * covariance computation needs, with NO N×d² explosion and no shuffle
 * beyond the final single-row merge (buffer size 1 + d + d(d+1)/2 longs;
 * at d = 64 that is 2 145 longs ≈ 17 KB per partial).
 *
 * Exactness: integer adds are associative and commutative, so the result
 * is a pure function of the input multiset — partition- and merge-order
 * independent, replayable bit-for-bit by a SQL oracle (unlike float
 * covariance accumulation, whose sum order is nondeterministic under
 * Spark's partial aggregation). Magnitude bound (documented, same
 * discipline as [[CmsSketch]]): with `|x| ≤ 1` each product is at most
 * `scale²`, so the sums stay exact for `N < 2⁶³ / scale²` rows — at the
 * default scale 10³ that is ~9.2 × 10¹² vectors; callers with larger
 * corpora or unnormalized vectors must shrink `scale`.
 *
 * Result: `array<bigint>` laid out `[n, s_0..s_{d-1}, p_00, p_01, ...,
 * p_{(d-1)(d-1)}]` with the upper triangle row-major:
 * `p(i,j) at 1 + d + i·d − i(i−1)/2 + (j − i)` for i ≤ j. Null vectors
 * are skipped; a wrong-length vector fails loud (a silent drop would
 * corrupt the moments).
 */
object MomentMatrix {

  val MaxDims = 512 // buffer is O(d²): 512 → ~1 MB per partial, ample

  /** Flat index of the (i, j) cross product (i ≤ j) within the result. */
  def triIndex(i: Int, j: Int, d: Int): Int =
    1 + d + i * d - i * (i - 1) / 2 + (j - i)

  final class Moments(val d: Int, val scale: Long) {
    val cells = new Array[Long](1 + d + d * (d + 1) / 2)
    private val q = new Array[Long](d)
    def add(vec: ArrayData): Unit = {
      require(vec.numElements() == d,
        s"moment_matrix(dims=$d) got a vector of length ${vec.numElements()}")
      var i = 0
      while (i < d) {
        // null elements quantize to 0 — PcaProject's convention, so the
        // moments a model trains from and the projection it serves agree
        q(i) =
          if (vec.isNullAt(i)) 0L
          else math.floor(vec.getFloat(i).toDouble * scale).toLong
        i += 1
      }
      cells(0) += 1L
      i = 0
      while (i < d) {
        cells(1 + i) += q(i)
        var j = i
        var base = 1 + d + i * d - i * (i - 1) / 2 - i
        while (j < d) { cells(base + j) += q(i) * q(j); j += 1 }
        i += 1
      }
    }
    def mergeIn(other: Moments): Unit = {
      require(other.d == d && other.scale == scale,
        "merging differently-shaped moment buffers")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    }
  }

  case class MomentAgg(
      child: Expression, dims: Int, scale: Long,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Moments] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) if dims >= 1 && dims <= MaxDims && scale >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName dims must be in [1, $MaxDims] and scale >= 1, got ($dims, $scale)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }

    override def createAggregationBuffer(): Moments = new Moments(dims, scale)

    override def update(buffer: Moments, input: InternalRow): Moments = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[ArrayData])
      buffer
    }

    override def merge(buffer: Moments, other: Moments): Moments = {
      buffer.mergeIn(other)
      buffer
    }

    override def eval(buffer: Moments): Any =
      new GenericArrayData(buffer.cells.map(v => v: Any))

    override def serialize(buffer: Moments): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.d)
      out.writeLong(buffer.scale)
      var i = 0
      while (i < buffer.cells.length) { out.writeLong(buffer.cells(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Moments = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val m = new Moments(in.readInt(), in.readLong())
      var i = 0
      while (i < m.cells.length) { m.cells(i) = in.readLong(); i += 1 }
      m
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MomentAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MomentAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MomentAgg =
      copy(child = newChild)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "moment_matrix"
  }

  val info = new ExpressionInfo(
    classOf[MomentAgg].getName, "moment_matrix",
    "moment_matrix(vec, dims, scale) - exact integer moment matrix of a " +
      "float-vector column: [n, per-dim sums, upper-triangle cross " +
      "products] over q_d = floor(x_d * scale). Partial-aggregatable, " +
      "merge is elementwise addition (partition-order independent); " +
      "exact while N < 2^63 / scale^2 for |x| <= 1.")

  // -----------------------------------------------------------------------
  // vec_sum — the first-order-only sibling: exact integer count + per-dim
  // sums, buffer 1 + d longs. The aggregate behind group-wise pooling
  // (chunk embeddings -> document embedding): shuffling one partial per
  // (group, partition) of d+1 longs instead of posexploding N×d rows is a
  // d× exchange-volume cut. Magnitude bound is the gentler first-order
  // one: N < 2^63 / scale per group.
  // -----------------------------------------------------------------------

  final class VecSums(val d: Int, val scale: Long) {
    val cells = new Array[Long](1 + d)
    def add(vec: ArrayData): Unit = {
      require(vec.numElements() == d,
        s"vec_sum(dims=$d) got a vector of length ${vec.numElements()}")
      cells(0) += 1L
      var i = 0
      while (i < d) {
        // null elements quantize to 0 (PcaProject convention; see Moments)
        if (!vec.isNullAt(i))
          cells(1 + i) += math.floor(vec.getFloat(i).toDouble * scale).toLong
        i += 1
      }
    }
    def mergeIn(other: VecSums): Unit = {
      require(other.d == d && other.scale == scale,
        "merging differently-shaped vec_sum buffers")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    }
  }

  case class VecSumAgg(
      child: Expression, dims: Int, scale: Long,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSums] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) if dims >= 1 && dims <= MaxDims && scale >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName dims must be in [1, $MaxDims] and scale >= 1, got ($dims, $scale)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }

    override def createAggregationBuffer(): VecSums = new VecSums(dims, scale)

    override def update(buffer: VecSums, input: InternalRow): VecSums = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[ArrayData])
      buffer
    }

    override def merge(buffer: VecSums, other: VecSums): VecSums = {
      buffer.mergeIn(other)
      buffer
    }

    override def eval(buffer: VecSums): Any =
      new GenericArrayData(buffer.cells.map(v => v: Any))

    override def serialize(buffer: VecSums): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.d)
      out.writeLong(buffer.scale)
      var i = 0
      while (i < buffer.cells.length) { out.writeLong(buffer.cells(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): VecSums = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val m = new VecSums(in.readInt(), in.readLong())
      var i = 0
      while (i < m.cells.length) { m.cells(i) = in.readLong(); i += 1 }
      m
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
      copy(child = newChild)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "vec_sum"
  }

  val vecSumInfo = new ExpressionInfo(
    classOf[VecSumAgg].getName, "vec_sum",
    "vec_sum(vec, dims, scale) - exact integer [count, per-dim sums] of a " +
      "float-vector column over q_d = floor(x_d * scale). " +
      "Partial-aggregatable; merge is elementwise addition.")
}
