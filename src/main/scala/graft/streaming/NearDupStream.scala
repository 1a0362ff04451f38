package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{array, call_function, col, explode, lit, shiftright, struct}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/**
 * Cross-batch streaming NEAR-duplicate detection: the streaming form of
 * [[graft.ops.Dedup.simhashNearDuplicates64]]. Each arriving document is
 * sketched with the 64-bit SimHash kernel and split into 4 16-bit bands;
 * state lives PER BAND BUCKET (the `(band, band_key)` key) and holds the
 * `(id, sketch)` pairs previously routed there, so a new document compares
 * only against its bucket's occupants — never the whole history. Pairs
 * within Hamming distance `maxHamming` are emitted as they are discovered,
 * across batches: a document pairs with everything relevant that arrived
 * before it.
 *
 * Recall is the batch variant's: pigeonhole makes band blocking EXACT for
 * `maxHamming ≤ 3`. A pair sharing several unchanged bands is emitted once
 * per shared bucket (buckets cannot see each other's state) — consumers
 * needing unique pairs apply `dropDuplicates` downstream.
 *
 * State per bucket is its occupancy (~N/65536 per band over the stream's
 * horizon — the same blocking math that keeps the batch join sparse).
 * `stateTtlMs > 0` bounds it with a processing-time TTL (the detection
 * horizon: pairs straddling more than the TTL go unreported); leave 0 for
 * the full-history contract and a RocksDB state store at scale.
 *
 * Requires [[graft.GraftExtensions.register]] on the session (the
 * `simhash64` kernel).
 */
object NearDupStream {

  case class Doc(doc_id: Long, text: String)

  /** Internal banded row (public: encoder codegen instantiates it). */
  case class Banded(doc_id: Long, simhash: Long, bucket: Long)

  case class Pair(id_a: Long, id_b: Long, hamming: Int)

  /** State transition, exposed for unit testing. Replayed ids are guarded:
    * a document never pairs with itself and is stored at most once.
    *
    * `maxOccupancy` is the streaming analogue of the batch family's
    * stop-bucket cap ([[graft.ops.Dedup.SimhashMaxOccupancy]]): a bucket
    * that reaches it SATURATES — later arrivals neither compare nor
    * store, so per-bucket state is bounded at `maxOccupancy` entries and
    * per-bucket emission at C(maxOccupancy, 2) pairs even when a million
    * blank images share one fingerprint. Divergence from batch is the
    * append-mode inevitability: pairs emitted before saturation stand
    * (batch drops an over-occupied bucket WHOLE), and with no cap binding
    * the two agree exactly (spec-pinned). */
  def updateGroup(maxHamming: Int, stateTtlMs: Long, maxOccupancy: Int)(
      bucket: Long,
      docs: Iterator[Banded],
      state: GroupState[List[(Long, Long)]]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = docs.toSeq.sortBy(_.doc_id) // deterministic emit order
      var seen = state.getOption.getOrElse(Nil)
      var occupancy = seen.size
      val out = collection.mutable.ArrayBuffer.empty[Pair]
      batch.foreach { d =>
        if (occupancy < maxOccupancy && !seen.exists(_._1 == d.doc_id)) {
          seen.foreach { case (id0, sk0) =>
            val h = java.lang.Long.bitCount(sk0 ^ d.simhash)
            if (h <= maxHamming)
              out += (if (id0 < d.doc_id) Pair(id0, d.doc_id, h)
                      else Pair(d.doc_id, id0, h))
          }
          seen = (d.doc_id, d.simhash) :: seen
          occupancy += 1
        }
      }
      state.update(seen)
      if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      out.iterator
    }
  }

  /** Near-duplicate pair stream (append mode). */
  def pairs(
      docs: Dataset[Doc], maxHamming: Int = 3, stateTtlMs: Long = 0L,
      maxOccupancy: Int = graft.ops.Dedup.SimhashMaxOccupancy): Dataset[Pair] = {
    require(maxHamming <= 3,
      s"4-band blocking is exact only for maxHamming <= 3, got $maxHamming")
    require(maxOccupancy >= 2,
      s"maxOccupancy below 2 drops every pair-capable bucket, got $maxOccupancy")
    implicit val bandedEnc = Encoders.product[Banded]
    implicit val pairEnc = Encoders.product[Pair]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.kryo[List[(Long, Long)]]
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // null text would sketch to a null simhash and kill the query inside
    // the non-nullable Banded deserializer — filter up front (the batch
    // path tolerates null sketches: its null band_key rows drop in the
    // equi-join; a typed streaming Dataset has no such slack)
    val sketched = docs
      .where(col("text").isNotNull)
      .withColumn("simhash", call_function("simhash64", TextOps.tokens(col("text"))))
    val banded = sketched.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        // bucket = band*2^16 + band_key — one long key per (band, band_key)
        struct(lit(j.toLong * 65536L)
          .plus(shiftright(col("simhash"), 16 * j).bitwiseAND(lit(65535L)))
          .as("bucket"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.bucket").as("bucket"))
      .as[Banded]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        updateGroup(maxHamming, stateTtlMs, maxOccupancy))
  }
}
