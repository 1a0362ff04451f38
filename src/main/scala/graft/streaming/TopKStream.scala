package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.expressions.FreqSketch
import graft.expressions.FreqSketch.MisraGries

/**
 * Streaming heavy hitters — the unbounded-stream form of the native
 * `freq_items` Misra-Gries aggregate ([[graft.expressions.FreqSketch]]):
 * "which vendors / domains / event types dominate the stream so far",
 * maintained continuously with BOUNDED state.
 *
 * State shape: items are hash-partitioned into `buckets` groups, and each
 * group's `flatMapGroupsWithState` state is ONE capacity-`k` Misra-Gries
 * counter map — total state ≤ `buckets · k` entries forever, regardless of
 * stream length or item cardinality (the reason a plain
 * `groupBy(item).count()` streaming aggregation is not this operator: its
 * state carries every distinct item ever seen). Because the bucket is a
 * FUNCTION of the item, bucket sketches track DISJOINT item sets: the
 * global answer is the plain union of per-bucket outputs — no cross-bucket
 * merge step, no second shuffle.
 *
 * Per-batch transition (deterministic, arrival-order-free): the batch's
 * items are counted EXACTLY per bucket first, then weight-merged into the
 * state sketch via the same merge-with-prune the distributed aggregate
 * uses ([[MisraGries.mergeIn]] — sum counters, subtract the (k+1)-th
 * largest when over capacity). Guarantees carried over from the batch
 * sketch, per bucket with `n_b` items seen: tracked counts NEVER
 * overcount, undercount by ≤ `n_b/(k+1)`, and every item with true count
 * > `n_b/(k+1)` is present. Emission is Update-mode: each batch re-emits
 * the touched buckets' full tracked set (count-desc, item-asc), so the
 * sink always holds the current standings.
 */
object TopKStream {

  /** One tracked item of one bucket's sketch, as of the latest batch. */
  case class Tracked(bucket: Int, item: String, count: Long)

  /**
   * The state-transition function — exposed for direct unit testing;
   * streaming queries go through [[heavyHitters]].
   */
  def updateBucket(k: Int)(
      bucket: Int,
      rows: Iterator[(Int, String)],
      state: GroupState[Map[String, Long]]): Iterator[Tracked] = {
    // exact count of the batch slice first: the MG transition is then a
    // pure function of the batch MULTISET, not of Spark's arrival order
    val exact = new mutable.HashMap[String, Long]
    rows.foreach { case (_, item) =>
      if (item != null) exact.update(item, exact.getOrElse(item, 0L) + 1L)
    }
    val acc = new MisraGries(k)
    state.getOption.foreach(_.foreach { case (i, c) => acc.counts.update(i, c) })
    val batch = new MisraGries(FreqSketch.MaxCapacity) // capacity unused by mergeIn
    exact.foreach { case (i, c) => batch.counts.update(i, c) }
    acc.mergeIn(batch)
    val snapshot = acc.counts.toMap
    state.update(snapshot)
    snapshot.toSeq.sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) => Tracked(bucket, item, c) }.iterator
  }

  /**
   * Continuous heavy-hitter standings over `itemCol` of a stream.
   * `k` is the per-bucket sketch capacity, `buckets` the state-parallelism
   * (and shuffle width) of the stateful stage.
   */
  def heavyHitters(
      events: DataFrame, itemCol: String, k: Int, buckets: Int = 16): Dataset[Tracked] = {
    require(k >= 1 && k <= FreqSketch.MaxCapacity,
      s"k must be in [1, ${FreqSketch.MaxCapacity}], got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        pmod(hash(col(itemCol)), lit(buckets)).cast("int").as("bucket"),
        col(itemCol).cast("string").as("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(updateBucket(k))
  }
}
