package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Transaction
import graft.ops.FinOps
import graft.pipeline.FinancialPipeline

/**
 * S1/S10 — the event-driven ingest loop as Structured Streaming.
 *
 * The reference wires S3 `ObjectCreated` → Lambda → full pipeline per file
 * (LF:483-491). Here the ingest directory is a streaming file source: each
 * discovered CSV becomes (part of) a micro-batch, `foreachBatch` runs the
 * complete batch pipeline (analyze → report JSON → statements upsert), and
 * `cleanSource=delete` reproduces the post-ingest `delete_object` (LF:548).
 *
 * Differences from the reference, by design:
 *  - every file in an event batch is processed (the reference silently drops
 *    all but the first record of a multi-record event, LF:485-486);
 *  - exactly-once bookkeeping comes from the checkpoint dir instead of
 *    "the file was deleted";
 *  - one batch may carry many user-months — the set-based pipeline handles
 *    them in one pass instead of a loop.
 *
 * `Trigger.AvailableNow` drains everything currently in the directory and
 * stops — the batch-parity mode (and what the tests use); the default
 * continuous trigger tails the directory forever.
 *
 * Each micro-batch is policed by [[FinOps.validateStatement]]: only valid
 * rows reach analytics and the statements table; malformed rows (unparseable
 * date/amount, bad location, …) land in a quarantine sink with their reject
 * reason instead of flowing through as nulls that silently drop from grouped
 * results. The reference aborts the whole load on one bad row (LF:84-85) —
 * at scale one bad row must never kill a batch, and must never vanish.
 */
object StatementStream {

  def start(
      spark: SparkSession,
      ingestDir: String,
      statementsPath: String,
      reportPath: String,
      checkpointDir: String,
      availableNow: Boolean = true,
      deleteIngested: Boolean = false,
      quarantinePath: Option[String] = None): StreamingQuery = {
    val rejectsPath =
      quarantinePath.getOrElse(statementsPath.stripSuffix("/") + "_quarantine")
    val raw = spark.readStream
      .option("header", true)
      .option("encoding", "UTF-8")
      .option("maxFilesPerTrigger", 16)
      .option("cleanSource", if (deleteIngested) "delete" else "off")
      .schema(Transaction.csvSchema)
      .csv(ingestDir)

    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Parse+validate once: the valid/reject splits and runBatch would
        // otherwise each re-read and re-parse the batch lineage.
        val normalized = FinOps.normalizeStatement(batch).persist()
        try {
          val (valid, rejects) = FinOps.validateStatement(normalized)
          if (!rejects.isEmpty)
            // Idempotent under micro-batch replay: each batch owns a
            // batch_id partition that a retry OVERWRITES rather than
            // appending duplicate reject rows to the table.
            rejects.write.mode("overwrite")
              .parquet(s"$rejectsPath/batch_id=$batchId")
          if (!valid.isEmpty) {
            // Same replay contract as the quarantine write: each micro-batch
            // owns a batch_id report partition that a retry overwrites.
            FinancialPipeline.runBatch(
              valid, statementsPath,
              Some(s"${reportPath.stripSuffix("/")}/batch_id=$batchId"),
              spark, reportMode = "overwrite")
            ()
          }
        } finally normalized.unpersist()
      }

    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
