package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.{Similarity, SketchLedger}

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
 *
 * MOMENTS LEDGER (optional): pass `momentsLedger = Some((dir, dims))` and
 * every non-empty batch ALSO appends its exact integer moment frame
 * ([[Similarity.momentFrame]]) to a [[SketchLedger]] at `dir` — the
 * running corpus statistics that make the eventual drift-triggered
 * REBUILD cheap: `pcaTrainFromMoments(momentFold(ledger))` retrains from
 * frames without rescanning a single ingested batch, and the fold equals
 * the whole-corpus pass bit for bit (SketchLedgerSpec). The two stores
 * commit independently (no cross-store transaction): a crash between the
 * index append and the ledger append can leave the ledger one batch
 * behind the index — acceptable for advisory statistics, and visible by
 * comparing the ledger's frame count to the report stream.
 */
object VectorIngestStream {

  /** `drift` is populated only when the stream was attached with a
    * moments ledger AND `driftBaselineGens > 0` and the ledger has grown
    * past the baseline window — the [[Similarity.ledgerMomentsDrift]]
    * score of everything ingested after the first `driftBaselineGens`
    * committed frames vs that baseline (≳1 ⇒ the mean has moved ~a
    * pooled σ: trigger [[Similarity.rebuildIndex]]). */
  final case class BatchReport(
      batchId: Long, nVectors: Long, indexVersion: Long, codeGenerations: Int,
      drift: Option[Double] = None)

  def attach(
      vectors: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      momentsLedger: Option[(String, Int)] = None,
      driftBaselineGens: Int = 0)(
      onReport: BatchReport => Unit): DataStreamWriter[Row] = {
    val spark = vectors.sparkSession
    vectors.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val n = pinned.count()
        Similarity.appendToIndex(pinned, indexDir, idCol, vecCol)
        if (n > 0) momentsLedger.foreach { case (mDir, dims) =>
          SketchLedger.append(Similarity.momentFrame(pinned, dims, vecCol), mDir)
        }
        val drift = momentsLedger.flatMap { case (mDir, dims) =>
          if (driftBaselineGens <= 0) None
          else Similarity.ledgerMomentsDrift(spark, mDir, dims, driftBaselineGens)
        }
        val (version, nGens) = Similarity.indexStatus(spark, indexDir)
        onReport(BatchReport(id, n, version, nGens, drift))
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
      idCol: String = "vec_id", vecCol: String = "embedding",
      momentsLedger: Option[(String, Int)] = None,
      driftBaselineGens: Int = 0)(
      onReport: BatchReport => Unit): StreamingQuery =
    attach(vectors, indexDir, idCol, vecCol, momentsLedger,
      driftBaselineGens)(onReport).start()
}
