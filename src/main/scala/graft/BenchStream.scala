package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Tpch
import graft.streaming.{DedupStream, DriftStream, EventStream, NearDupStream, SessionStream, TopKStream}

/**
 * Streaming benchmark main — the stateful paths the unit specs exercise
 * logically but never under load: cross-batch exact dedup, band-bucketed
 * near-dup, custom-state sessionization, native session windows, watermarked
 * tumbling windows, and the stream-stream interval join.
 *
 * Method: the input table is re-sharded into `shards` parquet files (written
 * sequentially so modification times ascend in event-time order where order
 * matters) and replayed through the file source with `maxFilesPerTrigger=1`
 * under `Trigger.AvailableNow` — a multi-micro-batch replay in which state
 * genuinely crosses batch boundaries, unlike a single-batch smoke run.
 * Dedup inputs are the documents table unioned with id-shifted copies (a
 * crawl feed re-serving the same content), so the state stores see real
 * duplicate pressure and emit real drops/pairs.
 *
 * Per query we report wall seconds, input rows/sec, micro-batch count, and
 * the final state-store footprint (`stateOperators` rows/bytes from the last
 * progress) — the number that decides whether a TTL is needed at 100 TB.
 * TTL variants run with a horizon longer than the bench so the measurement
 * captures the bookkeeping overhead of timeout tracking, not mass eviction
 * (eviction semantics are spec-tested; a bench that evicts everything would
 * flatter state size while measuring nothing).
 *
 * Emits ONE JSON line and writes it to `BENCH_STREAM.json` in the cwd.
 */
object BenchStream {

  private final case class Res(
      name: String,
      rowsIn: Long,
      rowsOut: Long,
      secs: Double,
      batches: Int,
      stateRows: Long,
      stateBytes: Long,
      stateRemoved: Long) {
    def json: String = {
      val rps = if (secs > 0) rowsIn / secs else 0d
      // Locale.ROOT: the f-interpolator formats with the JVM default locale,
      // and a comma-decimal locale would emit invalid JSON.
      def num(fmt: String, v: Double) =
        String.format(java.util.Locale.ROOT, fmt, Double.box(v))
      s""""$name":{"rows_in":$rowsIn,"rows_out":$rowsOut,"secs":${num("%.3f", secs)},""" +
        s""""rows_per_sec":${num("%.0f", rps)},"batches":$batches,"state_rows":$stateRows,""" +
        s""""state_bytes":$stateBytes,"state_removed":$stateRemoved}"""
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // recentProgress retains only this many entries (default 100); the
      // rows_out/batches sums below read it, so keep it above any plausible
      // batch count or a higher shard count would silently undercount.
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft-bench-stream").toString
    val shards = 16

    // ---- inputs -----------------------------------------------------------
    // Documents × 4 id-shifted copies: every fingerprint/band bucket takes 4
    // claimants across the replay, so dedup state does real cross-batch work.
    val docs = Tpch.read(spark, sfDir, "documents").select("doc_id", "text")
    val copies = 4
    // Shift copies by max(doc_id)+1 so shifted ids can never collide with
    // real ones at any scale factor (a hardcoded stride would silently
    // corrupt the duplicate-pressure setup once doc_ids outgrow it).
    val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docFeed = (0 until copies)
      .map(k => docs.select((col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val docDir = s"$work/docs"
    docFeed.repartition(shards).write.parquet(docDir)
    val docRows = copies.toLong * docs.count()

    // Events re-sharded in EVENT-TIME order (sequential writes → ascending
    // modification times → the file source replays time-ordered batches, so
    // watermarks advance instead of declaring everything late).
    val events = Tpch.read(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val evDir = s"$work/events"
    val tiled = events
      .withColumn("__b", ntile(shards).over(Window.orderBy("ts", "event_id")))
      .persist()
    val evRows = tiled.count()
    (1 to shards).foreach { i =>
      tiled.where(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("append").parquet(evDir)
    }
    tiled.unpersist()

    def docStream: DataFrame = spark.readStream
      .schema(spark.read.parquet(docDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docDir)

    def evStream: DataFrame = spark.readStream
      .schema(spark.read.parquet(evDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(evDir)

    // ---- runner -----------------------------------------------------------
    // Completion is detected from the progress stream (cumulative
    // numInputRows == the expected ingest), then the query is stopped
    // explicitly. Neither awaitTermination() nor processAllAvailable() works
    // for the *_ttl configs: `FlatMapGroupsWithStateExec.shouldRunAnotherBatch`
    // returns true UNCONDITIONALLY under ProcessingTimeTimeout, so AvailableNow
    // never self-terminates and the engine never raises the noNewData flag
    // processAllAvailable() blocks on — both spin ~2 no-data batches/sec
    // forever waiting for timers (observed: 1,500+ empty batches). The
    // measured window is input-processing time only; `graceMs` then holds
    // the query open (unmeasured) so short-horizon eviction timers can fire
    // before the state metrics are read.
    var n = 0
    def measure(name: String, rowsIn: Long, graceMs: Long = 0,
        afterIngest: () => Unit = () => ())(
        mk: String => org.apache.spark.sql.streaming.StreamingQuery): Res = {
      n += 1
      val t0 = System.nanoTime()
      val q = mk(s"$work/ckpt$n")
      def ingested: Long = q.recentProgress.map(_.numInputRows).sum
      val deadline = System.nanoTime() + 10L * 60 * 1000000000L
      while (q.isActive && ingested < rowsIn && System.nanoTime() < deadline)
        Thread.sleep(100)
      if (q.isActive && ingested < rowsIn)
        throw new IllegalStateException(
          s"$name: replay ingested only $ingested of $rowsIn rows before the deadline")
      afterIngest() // e.g. the group-commit flush — INSIDE the stamped window
      val secs = (System.nanoTime() - t0) / 1e9
      if (graceMs > 0) Thread.sleep(graceMs)
      q.stop()
      q.awaitTermination()
      val progress = q.recentProgress.toSeq
      val last = progress.lastOption
      val stateRows = last.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateBytes = last.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
      // Evictions accumulate per batch — sum across the replay, not last-only.
      val stateRemoved = progress.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
      val rowsOut = progress.map(p => math.max(0L, p.sink.numOutputRows)).sum
      val batches = progress.count(_.numInputRows > 0)
      val r = Res(name, rowsIn, rowsOut, secs, batches, stateRows, stateBytes, stateRemoved)
      println(s"  ${r.json}")
      r
    }
    def run(name: String, rowsIn: Long, graceMs: Long = 0)(out: DataFrame): Res =
      measure(name, rowsIn, graceMs)(ckpt =>
        out.writeStream.format("noop").outputMode("append")
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start())

    val tenMin = 10L * 60 * 1000 // TTL horizon > bench wall time: overhead, not eviction
    val evictMs = 500L // TTL horizon ≪ replay wall time: measures MASS eviction

    val results = Seq(
      run("dedup_exact", docRows)(
        DedupStream.deduped(docStream.as[DedupStream.Doc]).toDF()),
      run("dedup_exact_ttl", docRows)(
        DedupStream.deduped(docStream.as[DedupStream.Doc], stateTtlMs = tenMin).toDF()),
      // Short horizon: state written in early batches expires under the
      // replay itself, so this line measures eviction work (timeout scans +
      // removals) and the post-eviction steady-state footprint — the
      // complement of the *_ttl lines, which measure timeout BOOKKEEPING.
      // `state_removed` > 0 is the proof eviction actually fired. The grace
      // window (6× the horizon) lets the final batches' timers fire in
      // no-data batches before the metrics are read.
      run("dedup_exact_ttl_evict", docRows, graceMs = 6 * evictMs)(
        DedupStream.deduped(docStream.as[DedupStream.Doc], stateTtlMs = evictMs).toDF()),
      run("neardup_simhash", docRows)(
        NearDupStream.pairs(docStream.as[NearDupStream.Doc]).toDF()),
      run("neardup_simhash_ttl", docRows)(
        NearDupStream.pairs(docStream.as[NearDupStream.Doc], stateTtlMs = tenMin).toDF()),
      run("sessionize_state", evRows)(
        SessionStream.sessionize(
          evStream.select(col("user_id"), col("ts"), col("value"))
            .as[SessionStream.Event]).toDF()),
      run("session_window_native", evRows)(EventStream.sessionWindowAgg(evStream)),
      run("window_tumbling", evRows)(EventStream.windowedAgg(evStream)),
      // rows_in = 2×evRows: the two join sides are independent file sources
      // over the same directory, so the query genuinely ingests every event
      // twice — rows_per_sec must reflect actual ingest, not distinct rows.
      run("interval_join", 2 * evRows)(
        EventStream.intervalJoin(
          evStream.where(col("event_type") === "purchase"),
          evStream.where(col("event_type") === "view"),
          "user_id")),
      // ---- round-10 streaming ops under load ----------------------------
      // Misra-Gries standings: bounded keyed state (buckets x k), Update
      // mode re-emission per touched bucket
      measure("heavy_hitters", evRows)(ckpt =>
        TopKStream.heavyHitters(evStream, "event_type", k = 16, buckets = 8)
          .toDF().writeStream.format("noop").outputMode("update")
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()),
      // PSI drift scoring per micro-batch against a fixed reference (a
      // driver-held count table): measures the per-batch aggregate tax
      measure("drift_monitor", evRows)(ckpt =>
        DriftStream.attach(
            evStream, "event_type",
            events.select("event_type"))((_, _, _, _, _, _) => ())((_, _) => ())
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()),
      // the composed ingest pipeline end-to-end (drift + CMS rate limit +
      // incremental dedup + manifest upsert); cap sized to admit everything
      // so the line measures machinery, not rejection short-circuits
      measure("ingest_pipeline", docRows)(ckpt =>
        graft.streaming.IngestPipeline.attach(
            docStream.withColumn("source", (col("doc_id") % 5).cast("string")),
            idCol = "doc_id", textCol = "text", keyCol = "source",
            partCol = "source", tablePath = s"$work/ingest_table",
            ref = docFeed.select((col("doc_id") % 5).cast("string").as("source")),
            cap = docRows + 1)(_ => ())
          .writer
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()),
      // same pipeline at group-commit cadence 8: one manifest commit per 8
      // micro-batches (the round-10 verdict's amortization lever); the
      // final flush is inside the stamped window
      {
        var h: graft.streaming.IngestPipeline.Handle = null
        measure("ingest_pipeline_gc8", docRows,
            afterIngest = () => if (h != null) h.flush()) { ckpt =>
          h = graft.streaming.IngestPipeline.attach(
            docStream.withColumn("source", (col("doc_id") % 5).cast("string")),
            idCol = "doc_id", textCol = "text", keyCol = "source",
            partCol = "source", tablePath = s"$work/ingest_table_gc8",
            ref = docFeed.select((col("doc_id") % 5).cast("string").as("source")),
            cap = docRows + 1, commitEvery = 8)(_ => ())
          h.writer
            .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
        }
      })

    val line =
      s"""{"metric":"stream_total","value":${results.map(_.secs).sum},"unit":"sec",""" +
        s""""streams":${results.map(_.json).mkString("{", ",", "}")},""" +
        s""""shards":$shards,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("BENCH_STREAM.json"), line + "\n")
    spark.stop()
  }
}
