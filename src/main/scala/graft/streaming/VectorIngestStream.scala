package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.Similarity

/**
 * Continuous VECTOR-INDEX ingest — the streaming face of the persisted
 * ANN index ([[Similarity.writeIndex]]/[[Similarity.appendToIndex]]):
 * each micro-batch of `(id, embedding)` rows is residual-encoded against
 * the index's FROZEN quantizers and committed as a fresh code/vector
 * generation under the index's manifest protocol. Readers querying
 * between batches always see a complete committed snapshot (the append
 * is invisible until its one-file commit), and a crash mid-batch leaves
 * only unreferenced debris.
 *
 * What this is NOT: quantizer retraining. Appends encode against the
 * coarse centroids and codebooks the index was built with — the standard
 * serving trade (Faiss's add-with-frozen-quantizer); a drifted embedding
 * distribution eventually needs a rebuild, which is exactly what
 * [[DriftStream]] on an embedding-derived key is for. Generation count
 * grows per batch: schedule [[Similarity.compactIndex]] like any other
 * manifest table (the reported generation count is the trigger signal).
 *
 * Per batch `onReport` receives `(batchId, nVectors, indexVersion,
 * codeGenerations)`.
 */
object VectorIngestStream {

  final case class BatchReport(
      batchId: Long, nVectors: Long, indexVersion: Long, codeGenerations: Int)

  def attach(
      vectors: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding")(
      onReport: BatchReport => Unit): DataStreamWriter[Row] = {
    val spark = vectors.sparkSession
    vectors.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val n = pinned.count()
        Similarity.appendToIndex(pinned, indexDir, idCol, vecCol)
        val (version, nGens) = Similarity.indexStatus(spark, indexDir)
        onReport(BatchReport(id, n, version, nGens))
      } finally pinned.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
  }

  /** [[attach]] + start. */
  def start(
      vectors: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding")(
      onReport: BatchReport => Unit): StreamingQuery =
    attach(vectors, indexDir, idCol, vecCol)(onReport).start()
}
