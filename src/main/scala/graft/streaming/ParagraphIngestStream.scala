package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.Dedup

/**
 * Continuous PARAGRAPH-DEDUP ingest — the crawl-side CCNet stage streamed:
 * each micro-batch of `(doc_id, text)` rows is cleaned against the
 * persisted line-hash store ([[Dedup.paragraphDedupIncrementalIndexed]] —
 * lines seen anywhere in the accumulated corpus are dropped, keep-first
 * within the batch), the cleaned documents come back through `onClean`
 * (what a downstream quality/dedup stage consumes), and the batch's own
 * distinct line hashes append to the store. The corpus is never rescanned:
 * per-batch cost is the batch's line mass plus one anti-join against the
 * committed hashes.
 *
 * The first non-empty batch bootstraps the store (cleaned against itself —
 * exactly the incremental contract with an empty store). Crash contract:
 * the cleaned frame is materialized BEFORE the hash commit, so a crash
 * mid-batch leaves only unreferenced debris; on replay the batch re-cleans
 * against the same pre-batch store state iff the source replays
 * exactly-once (re-delivered hashes upsert idempotently either way —
 * re-CLEANING after a post-commit crash would drop the batch's own lines
 * as "seen", the at-least-once trade stated plainly).
 *
 * Per batch `onReport` receives `(batchId, nDocs, nEmptied)` — `nEmptied`
 * counts documents that reassembled to the empty string (pure boilerplate,
 * the live curation alert).
 */
object ParagraphIngestStream {

  final case class BatchReport(batchId: Long, nDocs: Long, nEmptied: Long)

  def attach(
      docs: DataFrame, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = "\n")(
      onReport: BatchReport => Unit,
      onClean: DataFrame => Unit = _ => ()): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val n = pinned.count()
        var emptied = 0L
        if (n > 0) {
          val cleaned =
            if (Dedup.lineStoreCommitted(spark, storeDir)) {
              // the store's pinned separator is authoritative — a stream
              // configured differently would silently split lines another
              // way and drop whole documents as "duplicates"
              val pinnedSep = Dedup.lineStoreSep(spark, storeDir)
              require(pinnedSep == sep,
                s"line-hash store under $storeDir is pinned to separator " +
                  s"${pinnedSep.map(c => f"\\u${c.toInt}%04x").mkString} but the " +
                  s"stream was configured with ${sep.map(c => f"\\u${c.toInt}%04x").mkString}")
              Dedup.paragraphDedupIncrementalIndexed(pinned, storeDir, idCol, textCol)
            } else {
              // bootstrap: clean the batch against itself (incremental
              // with an empty store), then commit its hashes
              val c = Dedup.paragraphDedup(pinned, idCol, textCol, sep)
                .localCheckpoint()
              Dedup.writeLineHashes(pinned, storeDir, textCol, sep)
              c
            }
          emptied = cleaned.where(col(textCol) === "").count()
          onClean(cleaned)
        }
        onReport(BatchReport(id, n, emptied))
      } finally DriftStream.release(pinned)
    }
  }

  /** [[attach]] + start. */
  def start(
      docs: DataFrame, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      sep: String = "\n")(
      onReport: BatchReport => Unit,
      onClean: DataFrame => Unit = _ => ()): StreamingQuery =
    attach(docs, storeDir, idCol, textCol, sep)(onReport, onClean).start()
}
