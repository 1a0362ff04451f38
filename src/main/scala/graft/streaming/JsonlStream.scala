package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Streaming JSONL ingest — the continuous form of [[graft.sources.Jsonl]].
 *
 * A crawl or export feed lands `*.jsonl` shards in a directory over time;
 * the file source discovers new shards per micro-batch (no rescan of
 * history — the source tracks seen files in its own log), and every shard
 * parses under the same explicit-schema PERMISSIVE contract as the batch
 * reader: malformed lines land whole in the corrupt column, counted,
 * never fatal. The running ingest-health ledger is literally the batch
 * aggregation ([[graft.sources.Jsonl.ingestStats]]) applied to the
 * streaming frame — Spark's incremental aggregation keeps it current per
 * micro-batch, so ingest health is a live queryable fact, not a
 * post-mortem scan.
 *
 * `maxFilesPerTrigger` bounds a micro-batch's file count — the backfill
 * throttle: pointing the stream at a directory with years of history must
 * not make batch #1 read all of it.
 */
object JsonlStream {

  def read(
      spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt", maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
    (if (maxFilesPerTrigger > 0)
       reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else reader)
      .json(path)
  }
}
