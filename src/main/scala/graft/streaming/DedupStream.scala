package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/**
 * Cross-batch streaming exact deduplication: the streaming form of
 * [[graft.ops.Dedup.exactByContent]]. Each document's content fingerprint
 * ([[TextOps.fingerprint]] — case/whitespace-normalized md5) claims a state
 * slot; the first document to claim it (smallest id within its batch) is
 * emitted, every later arrival with the same fingerprint — in the same batch
 * or any future one — is dropped.
 *
 * State is one boolean per DISTINCT document ever seen — tiny per key, but
 * unbounded over an unbounded stream. `stateTtlMs > 0` bounds it with a
 * processing-time TTL (dedup horizon: re-sends older than the TTL
 * reappear), the standard trade on an infinite crawl feed; leave 0 for the
 * exact-forever contract and a RocksDB state store at scale.
 */
object DedupStream {

  case class Doc(doc_id: Long, text: String)

  /** Internal keyed row (public: encoder codegen instantiates it). */
  case class Keyed(doc_id: Long, text: String, fp: String)

  /** State transition, exposed for unit testing. */
  def updateGroup(stateTtlMs: Long)(
      fp: String,
      docs: Iterator[Keyed],
      state: GroupState[Boolean]): Iterator[Doc] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = docs.toSeq // materialize before touching state
      val out =
        if (state.exists || batch.isEmpty) Iterator.empty[Doc]
        else {
          val first = batch.minBy(_.doc_id)
          Iterator.single(Doc(first.doc_id, first.text))
        }
      state.update(true)
      if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      out
    }
  }

  /** Deduplicated stream (append mode): one surviving row per distinct
    * normalized content across all batches. */
  def deduped(docs: Dataset[Doc], stateTtlMs: Long = 0L): Dataset[Doc] = {
    implicit val keyedEnc = Encoders.product[Keyed]
    implicit val docEnc = Encoders.product[Doc]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .as[Keyed]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(updateGroup(stateTtlMs))
  }
}
