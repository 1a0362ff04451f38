package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.{ManifestStore, Similarity}

/**
 * Continuous BINARY-CODE-STORE ingest — the [[VectorIngestStream]] twin
 * for the persisted sign-bit store ([[Similarity.writeBinaryCodes]]),
 * closing the streaming tier's last build-once asymmetry: each
 * micro-batch of `(vec_id, embedding)` rows is sign-encoded ONCE (the
 * statically-unrolled codegen'd packer) and upserted into the store's
 * id-partitioned code table, so [[Similarity.binaryTopKIndexed]] serves
 * the accumulated corpus between batches from committed snapshots and
 * the raw vectors are never re-encoded.
 *
 * The dims guard is the store's own: the FIRST non-empty batch pins
 * `dims` in the versioned meta, and any later batch (this stream
 * restarted wrong, or a second producer) at a different width fails the
 * micro-batch loud — a silent width mix would collide different-width
 * corpora into garbage Hamming space. Null embeddings drop at encode
 * ([[Similarity.binaryEncodeFrame]]'s documented policy); the per-batch
 * report carries both the batch row count and the store's committed
 * width. Re-delivered batches upsert idempotently (same ids, same
 * codes — the at-least-once trade every ingest stream here states),
 * and in-batch duplicate ids collapse to ONE row before the upsert: a
 * replayed source can deliver the same row twice inside one micro-batch
 * (a restart without offsets merges history), and the store's keyed
 * upsert dedups batch-vs-store, not within-batch — two rows for one id
 * would corrupt every top-k that id appears in. For the re-delivery
 * case the collapse is exact (identical vectors encode identically);
 * two CONFLICTING vectors for one id inside one batch are a producer
 * bug and resolve to an arbitrary one.
 */
object BinaryIngestStream {

  /** `dims` is the STORE's committed width, read back from the pinned
    * meta — not the attach parameter — so a consumer keying width alerts
    * on the report sees what is actually pinned; −1 until the first
    * non-empty batch bootstraps the store (nothing is committed yet, and
    * reporting the attach-time wish as a pin would mask a later
    * different-width producer's loud failure). */
  final case class BatchReport(batchId: Long, nVectors: Long, dims: Int)

  def attach(
      vectors: DataFrame, storeDir: String, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")(
      onReport: BatchReport => Unit): DataStreamWriter[Row] = {
    val spark = vectors.sparkSession
    vectors.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val n = pinned.count()
        if (n > 0)
          Similarity.writeBinaryCodes(
            pinned.dropDuplicates(Seq(idCol)), storeDir, dims, idCol, vecCol)
        val stored = ManifestStore.readVersioned(spark, storeDir, "_bincodes")
          .map(_._2.trim.stripPrefix("dims\t").toInt).getOrElse(-1)
        onReport(BatchReport(id, n, stored))
      } finally DriftStream.release(pinned)
    }
  }

  /** [[attach]] + start. */
  def start(
      vectors: DataFrame, storeDir: String, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")(
      onReport: BatchReport => Unit): StreamingQuery =
    attach(vectors, storeDir, dims, idCol, vecCol)(onReport).start()
}
