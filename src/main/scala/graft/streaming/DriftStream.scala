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
    * streams (the reference table is immutable). The key is an EXPRESSION
    * so the categorical monitor (`col(keyCol)`) and the numeric one
    * ([[numericMonitor]] — the DD bucket of a continuous column) share
    * every line of the scoring path; null keys (out-of-domain values) are
    * excluded on both sides, as in the batch operators. */
  final class DriftMonitor private[streaming] (
      ref: DataFrame, keyExpr: org.apache.spark.sql.Column, eps: Double) {
    def this(ref: DataFrame, keyCol: String, eps: Double = 1e-6) =
      this(ref, col(keyCol), eps)

    private val refCounts = ref.where(keyExpr.isNotNull)
      .groupBy(keyExpr.as("key")).agg(count(lit(1)).as("ref_cnt"))
      .localCheckpoint()

    /** Score one batch: `(n_rows, n_keys_batch, psi, jsd)`. */
    def score(batch: DataFrame): (Long, Long, Double, Double) = {
      val c = batch.where(keyExpr.isNotNull)
        .groupBy(keyExpr.as("key")).agg(count(lit(1)).as("cur_cnt"))
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

  /** NUMERIC drift monitor: the batch column is DD-log-bucketed
    * ([[Profile.ddBucket]] — the exact bucket math
    * [[Profile.driftNumericByBucket]] uses, so monitor and batch audit
    * can never disagree) and scored against the reference's bucket
    * distribution. Non-positive/null values are out of domain (their
    * bucket is null) and excluded, as in the batch operator. */
  def numericMonitor(
      ref: DataFrame, c: String, alpha: Double = 0.01,
      eps: Double = 1e-6): DriftMonitor =
    new DriftMonitor(ref, Profile.ddBucket(col(c), alpha), eps)

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

  /** [[attach]] for a CONTINUOUS column via [[numericMonitor]] — same
    * callback/sink contract, pass-through semantics unchanged. */
  def attachNumeric(
      stream: DataFrame, c: String, ref: DataFrame, alpha: Double = 0.01,
      psiThreshold: Double = 0.25, eps: Double = 1e-6)(
      onScore: (Long, Long, Long, Double, Double, Boolean) => Unit)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val monitor = numericMonitor(ref, c, alpha, eps)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      try {
        val (nRows, nKeys, psi, jsd) = monitor.score(pinned)
        onScore(id, nRows, nKeys, psi, jsd, psi > psiThreshold)
        sink(pinned, id)
      } finally release(pinned)
    }
  }

  /** [[attachNumeric]] + start. */
  def startNumeric(
      stream: DataFrame, c: String, ref: DataFrame, alpha: Double = 0.01,
      psiThreshold: Double = 0.25, eps: Double = 1e-6)(
      onScore: (Long, Long, Long, Double, Double, Boolean) => Unit)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    attachNumeric(stream, c, ref, alpha, psiThreshold, eps)(onScore)(sink).start()
}
