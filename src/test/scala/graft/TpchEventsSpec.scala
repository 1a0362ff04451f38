package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.queries.Tpch

/**
 * The events table's `ts` physical encoding has varied across driver
 * testdata generations (commit 9923d51): ns-precision INT64 (Spark 4 reads
 * it as a raw long under `nanosAsLong`) vs plain µs timestamps (arriving
 * as TIMESTAMP_NTZ). [[Tpch.readEvents]] must parse BOTH to the identical
 * session-local TimestampType column — and fail loud on anything else —
 * so a future regeneration can't silently shift event-time semantics.
 */
class TpchEventsSpec extends SparkSpec {
  import spark.implicits._

  // µs-representable instants (no sub-µs component): both encodings must
  // round-trip to exactly these
  private val instants = Seq(
    "2024-01-01 12:34:56.789",
    "2024-06-30 23:59:59.999999",
    "2025-02-28 00:00:00.0")

  private def microsOf(s: String): Long = {
    val t = Timestamp.valueOf(s) // session TZ is UTC in SparkSpec
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  }

  private def writeFixture(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ns-as-long and µs-timestamp encodings parse to identical timestamps") {
    val micros = instants.map(microsOf)

    // generation A: ts as INT64 ns epoch (what nanosAsLong hands Spark)
    val nsDir = writeFixture(
      tmpDir("ev_ns"),
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L, "view") }
        .toDF("event_id", "ts", "event_type"))

    // generation B: ts as µs TIMESTAMP_NTZ (timestamp without time zone)
    val usDir = writeFixture(
      tmpDir("ev_us"),
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us, "view") }
        .toDF("event_id", "us", "event_type")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
          col("event_type")))

    val a = Tpch.readEvents(spark, nsDir)
    val b = Tpch.readEvents(spark, usDir)
    assert(a.schema("ts").dataType == TimestampType, a.schema.treeString)
    assert(b.schema("ts").dataType == TimestampType, b.schema.treeString)

    def tsById(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ta = tsById(a)
    val tb = tsById(b)
    assert(ta == tb, s"encodings diverged: $ta vs $tb")
    assert(ta == micros.indices.map(i => i.toLong -> micros(i)).toMap,
      s"parsed values shifted from the written instants: $ta")
  }

  test("an unexpected ts physical type fails loud instead of casting to nulls") {
    val badDir = writeFixture(
      tmpDir("ev_bad"),
      Seq((1L, "2024-01-01 12:00:00", "view")).toDF("event_id", "ts", "event_type"))
    val e = intercept[IllegalStateException](Tpch.readEvents(spark, badDir))
    assert(e.getMessage.contains("unsupported physical type"), e.getMessage)
  }
}
