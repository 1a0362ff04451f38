package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC shard ingest — the on-disk format crawl corpora arrive in (the
 * reference pipeline's S1/S2 ingest analog at crawl scale; cf.
 * /root/reference docker/lambda_function.py:1 reading raw uploads).
 * Batch and streaming readers share one shape:
 *
 *   binaryFile scan (one task per shard — shards are the parallelism
 *   unit, exactly how a 1000-executor cluster eats Common Crawl)
 *   → explode(warc_records(content))   (codegen'd pure-JDK parse:
 *     gzip member framing, WARC headers, HTTP envelope + de-chunking)
 *   → (url, ts, mime, status, content) rows ready for
 *     text_from_bytes → strip_html → the crawl capstone chain.
 *
 * Malformed records surface as `_corrupt` sentinel rows (the Jsonl
 * PERMISSIVE analog — counted, queryable, never fatal);
 * [[ingestStats]] is the same per-shard health ledger Jsonl ingest
 * keeps. Requires [[graft.GraftExtensions.register]].
 */
object Warc {

  /** Records of one shard's bytes as an array column — compose with
    * `explode`/`posexplode`. */
  def records(content: Column): Column = call_function("warc_records", content)

  /** Batch read: every `*.warc[.gz]` under `path` to one row per record
    * `(path, rec_no, warc_type, url, ts, mime, status, content)`.
    * `rec_no` is the in-shard position — with the path it is the stable
    * record identity downstream doc_ids derive from. */
  def read(spark: SparkSession, path: String): DataFrame =
    explodeRecords(
      spark.read.format("binaryFile").load(path)
        .select(col("path"), col("content")))

  /** Streaming twin: the file source discovers new shards per
    * micro-batch; same schema as [[read]]. `maxFilesPerTrigger` is the
    * backfill throttle (batch #1 of a stream pointed at years of
    * history must not read all of it). */
  def readStream(
      spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    // the binaryFile STREAMING source requires its (fixed) schema up front
    val reader = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    explodeRecords(
      (if (maxFilesPerTrigger > 0)
         reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
       else reader)
        .load(path)
        .select(col("path"), col("content")))
  }

  private def explodeRecords(shards: DataFrame): DataFrame =
    shards
      .select(col("path"), posexplode(records(col("content")))
        .as(Seq("rec_no", "rec")))
      .select(col("path"), col("rec_no"),
        col("rec.warc_type").as("warc_type"), col("rec.url").as("url"),
        col("rec.ts").as("ts"), col("rec.mime").as("mime"),
        col("rec.status").as("status"), col("rec.content").as("content"))

  /** Ingest-health ledger per shard: record/response/corrupt counts and
    * payload mass — one hash aggregate on the scan ingest already pays
    * (the [[Jsonl.ingestStats]] analog; corrupt records carry their own
    * sentinel type instead of a corrupt column). */
  def ingestStats(records: DataFrame): DataFrame =
    records.groupBy("path")
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("warc_type") === "response", 1L).otherwise(0L))
          .as("n_responses"),
        sum(when(col("warc_type") === "_corrupt", 1L).otherwise(0L))
          .as("n_corrupt"),
        sum(coalesce(length(col("content")).cast("long"), lit(0L)))
          .as("payload_bytes"))
}
