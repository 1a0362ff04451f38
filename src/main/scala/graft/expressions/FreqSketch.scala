package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `freq_items(col, k)` — mergeable Misra-Gries heavy-hitters sketch as a
 * native Catalyst aggregate.
 *
 * The frequent-items question at 100 TB is NOT answerable with
 * `groupBy(col).count().orderBy(...)` when `col` is high-cardinality: that
 * plan shuffles one record per distinct key (billions of URLs, user ids,
 * vendor strings) to produce a result of which only the top handful
 * matters. This sketch keeps at most `k` counters per partial aggregate,
 * combines map-side like any hash aggregate, and ships k-sized byte
 * buffers through the exchange — the shuffle volume is O(k × partitions)
 * regardless of key cardinality.
 *
 * Guarantees (classical Misra-Gries, preserved under the pruning merge):
 *  - counts never overcount: reported ≤ true;
 *  - undercount is bounded by n/(k+1) over n processed rows, so any item
 *    with true frequency above n/(k+1) is guaranteed present;
 *  - when the true distinct count is ≤ k, no decrement ever fires and the
 *    sketch is EXACT and merge-order-independent — which is what makes an
 *    exact DuckDB oracle possible on a bounded-domain column while the
 *    approximation properties are spec'd separately on an adversarial
 *    stream.
 *
 * Result: `array<struct<item string, count bigint>>`, count-descending,
 * item-ascending tie-break (deterministic output order).
 */
object FreqSketch {

  val MaxCapacity = 4096 // decrement path is O(k); keep the counter map cache-sized

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  /** Mutable Misra-Gries counter map, capacity-bounded. */
  final class MisraGries(val capacity: Int) {
    val counts = new mutable.HashMap[String, Long]

    def add(item: String): Unit = counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // classic decrement-all step: the arriving item and one unit of
        // every tracked item annihilate (k+1 distinct items, one vote each)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.keysIterator.foreach { key =>
          val c = counts(key)
          if (c == 1L) dead += key else counts.update(key, c - 1)
        }
        dead.foreach(counts.remove)
    }

    /** Merge-with-prune: sum counters, then if over capacity subtract the
      * (capacity+1)-th largest count from all (the merge-side analogue of
      * the decrement step — error bounds add, staying ≤ n/(k+1) total). */
    def mergeIn(other: MisraGries): Unit = {
      other.counts.foreach { case (key, c) =>
        counts.update(key, counts.getOrElse(key, 0L) + c)
      }
      if (counts.size > capacity) {
        val sub = counts.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
        counts.keys.toArray.foreach { key =>
          val c = counts(key) - sub
          if (c <= 0L) counts.remove(key) else counts.update(key, c)
        }
      }
    }
  }

  case class FreqItems(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType if k >= 1 && k <= MaxCapacity => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName capacity must be in [1, $MaxCapacity], got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${other.simpleString}")
    }

    override def createAggregationBuffer(): MisraGries = new MisraGries(k)

    override def update(buffer: MisraGries, input: InternalRow): MisraGries = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
      buffer
    }

    override def merge(buffer: MisraGries, other: MisraGries): MisraGries = {
      buffer.mergeIn(other)
      buffer
    }

    override def eval(buffer: MisraGries): Any = {
      val items = buffer.counts.toSeq.sortBy { case (item, c) => (-c, item) }
      new GenericArrayData(items.map { case (item, c) =>
        val row = new GenericInternalRow(2)
        row.update(0, UTF8String.fromString(item))
        row.setLong(1, c)
        row
      }.toArray[Any])
    }

    override def serialize(buffer: MisraGries): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.capacity)
      out.writeInt(buffer.counts.size)
      buffer.counts.foreach { case (item, c) =>
        val b = item.getBytes("UTF-8") // length-prefixed: no writeUTF 64KB limit
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): MisraGries = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val mg = new MisraGries(in.readInt())
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        mg.counts.update(new String(b, "UTF-8"), in.readLong())
        i += 1
      }
      mg
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): FreqItems =
      copy(child = newChild)

    override def dataType: DataType = resultType
    override def nullable: Boolean = false
    override def prettyName: String = "freq_items"
  }

  val info = new ExpressionInfo(
    classOf[FreqItems].getName, "freq_items",
    "freq_items(col, k) - Misra-Gries heavy hitters: top items of a string " +
      "column with at most k counters per partial aggregate; exact when the " +
      "domain has <= k distinct values, undercount <= n/(k+1) otherwise.")
}
