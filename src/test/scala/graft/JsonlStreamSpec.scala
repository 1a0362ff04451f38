package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Jsonl
import graft.streaming.JsonlStream

class JsonlStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("lang", StringType).add("n", LongType)

  test("shards ingest incrementally; the live ledger converges to the batch ledger") {
    val srcDir = tmpDir("jsonl_stream_src")
    def shard(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir, name), lines.mkString("\n").getBytes("UTF-8"))

    shard("a.jsonl", Seq(
      """{"id":1,"lang":"en","n":10}""",
      """{"id":2,"lang":"de","n":20}""",
      """{"id":3,"lang":"en","n":5""")) // truncated → corrupt

    val ledger = Jsonl.ingestStats(
      JsonlStream.read(spark, srcDir, schema), "lang", col("n"))
    val q = ledger.writeStream
      .format("memory").queryName("jsonl_ledger").outputMode("complete").start()
    try {
      q.processAllAvailable()
      def snapshot(): Map[Option[String], (Long, Option[Long], Long)] =
        spark.table("jsonl_ledger")
          .as[(Option[String], Long, Option[Long], Long)]
          .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(snapshot() == Map(
        Option("en") -> ((1L, Option(10L), 0L)),
        Option("de") -> ((1L, Option(20L), 0L)),
        None -> ((1L, None, 1L))))

      // a later shard arrives: the ledger is CUMULATIVE (incremental agg
      // state), not a per-batch restatement
      shard("b.jsonl", Seq(
        """{"id":4,"lang":"en","n":7}""",
        """garbage line"""))
      q.processAllAvailable()
      val live = snapshot()
      assert(live == Map(
        Option("en") -> ((2L, Option(17L), 0L)),
        Option("de") -> ((1L, Option(20L), 0L)),
        None -> ((2L, None, 2L))))

      // the streaming ledger over N shards == the batch ledger over the
      // same directory — one ingest contract, two execution modes
      val batch = Jsonl.ingestStats(Jsonl.read(spark, srcDir, schema), "lang", col("n"))
        .as[(Option[String], Long, Option[Long], Long)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(live == batch)
    } finally q.stop()
  }

  test("maxFilesPerTrigger throttles the backfill (one shard per micro-batch)") {
    val srcDir = tmpDir("jsonl_stream_throttle")
    (1 to 3).foreach { i =>
      Files.write(Paths.get(srcDir, s"s$i.jsonl"),
        s"""{"id":$i,"lang":"en","n":$i}""".getBytes("UTF-8"))
    }
    val q = JsonlStream.read(spark, srcDir, schema, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("jsonl_throttled").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_throttled").count() == 3)
      // 3 files at 1 file/trigger → at least 3 committed micro-batches
      assert(q.lastProgress.batchId >= 2, s"batchId=${q.lastProgress.batchId}")
    } finally q.stop()
  }
}
