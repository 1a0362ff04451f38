package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.{ManifestStore, MinhashIndex}

/**
 * Continuous NEAR-DUP-INDEX ingest — the [[LexIngestStream]] twin for the
 * persisted MinHash-LSH store ([[graft.ops.MinhashIndex]]), closing the
 * streaming tier's last build-once asymmetry: each micro-batch of
 * `(doc_id, text)` rows is signed + banded ONCE (per-row native kernel)
 * and committed as a fresh band segment, and the pairs the batch
 * introduces against everything already indexed come back through
 * `onPairs` — the live duplicate feed a crawl pipeline alerts or filters
 * on, at the cost of ONE columnar scan of stored band rows per batch
 * (the corpus is never re-signed; the [[MinhashIndex.appendToMinhashIndex]]
 * economics, streamed).
 *
 * Crash contract (round 15 — EXACTLY-ONCE): every append is stamped with
 * `q=<queryId>/batch=<id>` ([[StreamTags.batchTag]] — checkpoint-stable
 * query id, so replays of this lineage match while a fresh checkpoint or
 * second stream never collides), committed atomically with its band
 * segment. A crash-replayed micro-batch therefore skips the re-append —
 * which would otherwise double the batch's occupancy partials, tripping
 * the cap early and silently dropping true pairs forever after — and
 * `onPairs` re-receives the ORIGINAL pair frame, re-derived from the
 * store alone ([[MinhashIndex.appendToMinhashIndex]]'s replay path).
 * Batches must carry NEW doc ids (the append contract shared with the
 * lexical store).
 *
 * Per batch `onReport` receives `(batchId, nDocs, nNewPairs,
 * indexVersion, segments)` — segment count is the compaction trigger.
 */
object MinhashIngestStream {

  final case class BatchReport(
      batchId: Long, nDocs: Long, nNewPairs: Long,
      indexVersion: Long, segments: Int)

  def attach(
      docs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      maxOccupancy: Int = 64)(
      onReport: BatchReport => Unit,
      onPairs: DataFrame => Unit = _ => ()): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val n = pinned.count()
        var nPairs = 0L
        if (n > 0) {
          val tag = Some(StreamTags.batchTag(spark, id))
          if (MinhashIndex.minhashIndexCommitted(indexDir)) {
            // append returns the batch-vs-(batch ∪ corpus) candidate pairs,
            // already materialized — safe to count and hand out; a replayed
            // batch (tag already committed) re-derives the SAME frame from
            // the store without appending
            val pairs = MinhashIndex.appendToMinhashIndex(
              pinned, indexDir, idCol, textCol, maxOccupancy, tag)
            nPairs = pairs.count()
            onPairs(pairs)
          } else {
            // first non-empty batch bootstraps the index (tagged, so its
            // replay — against a now-committed index — is recognized by
            // the append path); within-batch pairs still surface (an empty
            // index contributes none)
            MinhashIndex.writeMinhashIndex(
              pinned, indexDir, idCol, textCol, numHashes, bands, shingle, tag)
            val pairs = MinhashIndex.candidatePairsIndexed(
              spark, indexDir, maxOccupancy).localCheckpoint()
            nPairs = pairs.count()
            onPairs(pairs)
          }
        }
        ManifestStore.readVersioned(spark, indexDir, "_mh") match {
          case Some((version, content)) =>
            val nSegs = content.linesIterator.count(_.startsWith("seg\t"))
            onReport(BatchReport(id, n, nPairs, version, nSegs))
          case None => onReport(BatchReport(id, n, nPairs, 0L, 0))
        }
      } finally DriftStream.release(pinned)
    }
  }

  /** [[attach]] + start. */
  def start(
      docs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      maxOccupancy: Int = 64)(
      onReport: BatchReport => Unit,
      onPairs: DataFrame => Unit = _ => ()): StreamingQuery =
    attach(docs, indexDir, idCol, textCol, numHashes, bands, shingle,
      maxOccupancy)(onReport, onPairs).start()
}
