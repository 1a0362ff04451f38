package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.Dedup

/**
 * Continuous EXACT-SUBSTRING (span) dedup ingest — the Lee et al.
 * ExactSubstr stage streamed, completing the persisted-store twins
 * (paragraph / lexical / minhash / vector / binary all have one): each
 * micro-batch of `(doc_id, text)` rows is cut against the persisted
 * window-count store ([[Dedup.exactSubstringDedupIncrementalIndexed]] —
 * a window whose total occurrence count across store ∪ batch exceeds one
 * is boilerplate), the cleaned documents come back through `onClean`
 * (`(id, text_clean, n_tokens, n_kept)`; fully-covered documents drop),
 * and the batch's own window counts FOLD INTO the store by addition
 * under the pinned window meta. The corpus is never re-tokenized:
 * per-batch cost is the batch's window mass plus one equi-join against
 * the committed `(h, c)` skeleton.
 *
 * The first non-empty batch bootstraps the store (cut against itself —
 * exactly the incremental contract with an empty store — then its raw
 * counts commit). A stream configured with a different window length
 * than a committed store's pinned meta fails loud BEFORE mutating
 * anything — mismatched windows would silently corrupt every count.
 *
 * Crash contract (round 15 — EXACTLY-ONCE): every count fold is stamped
 * with `q=<queryId>/batch=<id>` ([[StreamTags.batchTag]] — the query id
 * is checkpoint-stable, so replays of THIS lineage match and a second
 * stream or fresh checkpoint never collides), committed atomically with
 * the fold. A crash-replayed micro-batch therefore skips the re-add —
 * which would otherwise make every window of the batch total ≥ 2 and cut
 * the ENTIRE replayed batch from `onClean` while over-cutting future
 * occurrences forever — and `onClean` re-receives the ORIGINAL cleaned
 * output, re-derived from the already-folded store
 * ([[Dedup.exactSubstringDedupIncrementalIndexed]]'s replay path).
 * Single-writer per store, like every ledger here.
 *
 * Per batch `onReport` receives `(batchId, nDocs, nCutDocs, nDropped)` —
 * documents that lost at least one window, and documents that dropped
 * entirely (fully-covered boilerplate or token-less text).
 */
object SpanIngestStream {

  final case class BatchReport(
      batchId: Long, nDocs: Long, nCutDocs: Long, nDropped: Long)

  def attach(
      docs: DataFrame, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8)(
      onReport: BatchReport => Unit,
      onClean: DataFrame => Unit = _ => ()): DataStreamWriter[Row] = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val spark = docs.sparkSession
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val nIn = pinned.count()
        var nCut = 0L
        var nDropped = 0L
        if (nIn > 0) {
          val tag = Some(StreamTags.batchTag(spark, id))
          val cleaned =
            if (Dedup.spanStoreCommitted(spark, storeDir)) {
              // the store's pinned window length is authoritative — a
              // stream counting different windows would silently corrupt
              // every stored count
              val pinnedN = Dedup.spanStoreWindow(spark, storeDir)
              require(pinnedN == n,
                s"window-count store under $storeDir is pinned to n=$pinnedN " +
                  s"but the stream was configured with n=$n")
              Dedup.exactSubstringDedupIncrementalIndexed(
                pinned, storeDir, idCol, textCol, tag)
            } else {
              // bootstrap: cut the batch against itself (incremental with
              // an empty store), then commit its raw counts + meta — the
              // tag rides the data upsert so a crash between it and the
              // meta commit replays into "skip the re-add, commit the meta"
              val c = Dedup.exactSubstringDedup(pinned, idCol, textCol, n)
                .localCheckpoint()
              Dedup.writeWindowCounts(pinned, storeDir, idCol, textCol, n, tag)
              c
            }
          nCut = cleaned.where(col("n_kept") < col("n_tokens")).count()
          nDropped = nIn - cleaned.count()
          onClean(cleaned)
        }
        onReport(BatchReport(id, nIn, nCut, nDropped))
      } finally DriftStream.release(pinned)
    }
  }

  /** [[attach]] + start. */
  def start(
      docs: DataFrame, storeDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8)(
      onReport: BatchReport => Unit,
      onClean: DataFrame => Unit = _ => ()): StreamingQuery =
    attach(docs, storeDir, idCol, textCol, n)(onReport, onClean).start()
}
