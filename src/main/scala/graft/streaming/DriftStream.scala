package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.Profile

/**
 * Streaming distribution-drift monitor — the continuous consumer of the
 * batch drift math ([[Profile.driftByKey]]): a FIXED reference
 * distribution of a categorical column (yesterday's corpus, the accepted
 * training mix, a golden crawl snapshot) is counted ONCE at construction,
 * and every micro-batch is scored against it with the SAME PSI /
 * Jensen-Shannon arithmetic the batch operator uses — monitor and batch
 * audit can never disagree, because there is one implementation
 * ([[Profile.driftByKeyFromCounts]]).
 *
 * Per batch the monitor emits one summary row
 * `(batch_id, n_rows, n_keys_batch, psi, jsd, drifted)` to the supplied
 * callback, where `drifted = psi > psiThreshold` — the standard industry
 * reading is ≳0.25 shifted, ≲0.1 stable. State is the reference count
 * table (distinct-key-sized, checkpoint-materialized) and nothing else:
 * no per-batch accumulation, so a quiet stream costs one tiny aggregate
 * per batch.
 *
 * Deployment shape: driver-held `foreachBatch` transition, the
 * [[StatementStream]] / [[RateLimitStream]] discipline.
 */
object DriftStream {

  /** Unpersist a localCheckpoint's blocks (the round-5 block-manager
    * residue lesson — per-batch checkpoints must not accumulate for the
    * life of an unbounded stream). */
  private[streaming] def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** One reference-scored monitor instance. Reusable across batches and
    * streams (the reference table is immutable). */
  final class DriftMonitor(ref: DataFrame, keyCol: String, eps: Double = 1e-6) {
    private val refCounts = ref.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("ref_cnt"))
      .localCheckpoint()

    /** Score one batch: `(n_rows, n_keys_batch, psi, jsd)`. */
    def score(batch: DataFrame): (Long, Long, Double, Double) = {
      val c = batch.where(col(keyCol).isNotNull)
        .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cur_cnt"))
        .localCheckpoint()
      try {
        val row = Profile.driftByKeyFromCounts(refCounts, c, eps).agg(
          coalesce(sum("cur_cnt"), lit(0L)).as("n_rows"),
          count(when(col("cur_cnt") > 0, 1)).as("n_keys"),
          coalesce(sum("psi"), lit(0.0)).as("psi"),
          coalesce(sum("jsd"), lit(0.0)).as("jsd")).collect()(0)
        (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
      } finally DriftStream.release(c) // per-batch checkpoint must not outlive the score
    }
  }

  /** Wire a monitor into a stream: each micro-batch is scored against the
    * reference and the summary handed to `onScore`
    * (`batchId, nRows, nKeys, psi, jsd, drifted`). Rows pass through
    * untouched to `sink` — monitoring must never drop data. */
  def attach(
      stream: DataFrame, keyCol: String, ref: DataFrame,
      psiThreshold: Double = 0.25, eps: Double = 1e-6)(
      onScore: (Long, Long, Long, Double, Double, Boolean) => Unit)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val monitor = new DriftMonitor(ref, keyCol, eps)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint() // score + sink read it once each
      try {
        val (nRows, nKeys, psi, jsd) = monitor.score(pinned)
        onScore(id, nRows, nKeys, psi, jsd, psi > psiThreshold)
        sink(pinned, id)
      } finally release(pinned)
    }
  }

  /** [[attach]] + start. */
  def start(
      stream: DataFrame, keyCol: String, ref: DataFrame,
      psiThreshold: Double = 0.25, eps: Double = 1e-6)(
      onScore: (Long, Long, Long, Double, Double, Boolean) => Unit)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(stream, keyCol, ref, psiThreshold, eps)(onScore)(sink).start()
}
