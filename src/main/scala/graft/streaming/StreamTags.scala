package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Idempotence-tag identity for foreachBatch sinks (round 15, closing the
 * round-14 advice): `foreachBatch` batch ids are only unique PER CHECKPOINT
 * LINEAGE — they restart from 0 for a stream attached with a fresh
 * checkpoint location, so a bare `batch=<id>` tag on a long-lived store
 * would collide with an earlier lineage's tags and silently SKIP real
 * appends for batches 0..k. The fix is the streaming query id: Spark
 * persists it in the checkpoint's metadata, so it is STABLE across
 * restarts of one checkpoint (exactly the replays idempotence must
 * absorb) and FRESH for a new checkpoint or a second stream (whose
 * batches must append). The id is published as a thread-local property on
 * the micro-batch execution thread — the thread foreachBatch callbacks
 * run on.
 *
 * Outside a streaming thread (unit tests driving the batch ops directly)
 * the property is absent and the tag degrades to `batch=<id>` — callers
 * simulating checkpoint recovery must then reuse the exact tag string.
 */
object StreamTags {

  /** Spark's thread-local streaming query id key
    * (`StreamExecution.QUERY_ID_KEY`). */
  private val QueryIdKey = "sql.streaming.queryId"

  /** The idempotence tag for this micro-batch:
    * `q=<queryId>/batch=<batchId>` on a streaming thread,
    * `batch=<batchId>` elsewhere. */
  def batchTag(spark: SparkSession, batchId: Long): String =
    Option(spark.sparkContext.getLocalProperty(QueryIdKey))
      .fold(s"batch=$batchId")(q => s"q=$q/batch=$batchId")
}
