package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dedup
import graft.streaming.SpanIngestStream

/**
 * Continuous exact-substring (span) dedup ingest
 * ([[graft.streaming.SpanIngestStream]]): streamed batches cut against the
 * accumulated window-count store (bootstrapping on the first batch), each
 * batch's cleaned feed equals the BATCH operator over the accumulated
 * corpus restricted to the batch (the incremental contract), the store's
 * counts stay serveable mid-stream and equal the one-shot counts of
 * everything ingested, and a window-length mismatch fails loud.
 */
class SpanIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3
  private val batch1 = Seq(
    (1L, "x1 x2 s1 s2 s3 x3"), // shares span s1 s2 s3 with doc 2
    (2L, "y1 s1 s2 s3 y2 y3"),
    (3L, "z1 z2 z3 z4"))
  private val batch2 = Seq(
    (4L, "q1 q2 s1 s2 s3 q3"), // span already stored — cut against history
    (5L, "u1 u2 u3 u4 u5"))
  private val batch3 = Seq(
    (6L, "z1 z2 z3 z4"), // exact copy of stored doc 3 — fully covered, drops
    (7L, "v1 v2"))       // shorter than a window — untouched

  private def oneShotRestricted(
      upTo: Seq[Seq[(Long, String)]], ids: Set[Long]): Seq[(Long, String, Long, Long)] =
    Dedup.exactSubstringDedup(
        upTo.flatten.toDF("doc_id", "text"), "doc_id", "text", N)
      .where($"id".isin(ids.toSeq: _*))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq

  test("per-batch cleaned feed == batch operator over the accumulated corpus " +
    "restricted to the batch; counts serve mid-stream; drops/cuts reported") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("span_stream")
    val reports = mutable.Buffer.empty[SpanIngestStream.BatchReport]
    val cleaned = mutable.Buffer.empty[Seq[(Long, String, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = SpanIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir, n = N)(
      reports += _,
      df => cleaned += df.orderBy("id").as[(Long, String, Long, Long)].collect().toSeq)
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      // MID-STREAM SERVING: the committed store equals one-shot counts of
      // everything ingested so far — a concurrent batch consumer can
      // compose with exactSubstringDedupIncremental right now
      val served = Dedup.readWindowCounts(spark, dir)
        .as[(Long, Long)].collect().toSet
      val oneShot = Dedup.substringWindowCounts(
          batch1.toDF("doc_id", "text"), "doc_id", "text", N)
        .as[(Long, Long)].collect().toSet
      assert(served == oneShot, "mid-stream store != one-shot counts")

      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
      ms.addData(Seq.empty[(Long, String)]: _*); q.processAllAvailable()
    } finally q.stop()

    // the incremental law, batch by batch
    assert(cleaned(0) == oneShotRestricted(Seq(batch1), Set(1L, 2L, 3L)))
    assert(cleaned(1) == oneShotRestricted(Seq(batch1, batch2), Set(4L, 5L)))
    assert(cleaned(2) == oneShotRestricted(Seq(batch1, batch2, batch3), Set(6L, 7L)))

    val live = reports.filter(_.nDocs > 0)
    assert(live.map(_.nCutDocs) == Seq(2L, 1L, 0L), live.toString)
    assert(live.map(_.nDropped) == Seq(0L, 0L, 1L), live.toString)

    // the store accumulated every batch's counts by addition
    val finalCounts = Dedup.readWindowCounts(spark, dir)
      .as[(Long, Long)].collect().toSet
    val wantCounts = Dedup.substringWindowCounts(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"), "doc_id", "text", N)
      .as[(Long, Long)].collect().toSet
    assert(finalCounts == wantCounts, "final store != one-shot counts of the union")

    // and serving composes: the indexed one-call form still agrees with the
    // oracle-shared incremental math on a fresh batch
    val b4 = Seq((8L, "u1 u2 u3 u4 u5 w9")).toDF("doc_id", "text")
    val viaStore = Dedup.exactSubstringDedupIncrementalIndexed(
        b4, dir, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(viaStore == oneShotRestricted(
      Seq(batch1, batch2, batch3, Seq((8L, "u1 u2 u3 u4 u5 w9"))), Set(8L)))
  }

  test("crash replay is exactly-once (r15): a tagged count fold re-applied " +
    "under the same tag leaves the store identical to the no-crash run and " +
    "re-derives the ORIGINAL cleaned output; a fresh lineage still appends") {
    val dir = tmpDir("span_replay")
    // bootstrap batch, tagged the way the stream stamps it
    Dedup.writeWindowCounts(
      batch1.toDF("doc_id", "text"), dir, "doc_id", "text", N,
      tag = Some("q=lineage1/batch=0"))
    // BOOTSTRAP REPLAY: the store is committed now, so a restarted stream
    // takes the incremental path with the same tag — the replay math must
    // reproduce the original bootstrap output (cut against itself), not
    // cut the whole batch because it sees its own counts
    val bootReplay = Dedup.exactSubstringDedupIncrementalIndexed(
        batch1.toDF("doc_id", "text"), dir, "doc_id", "text",
        Some("q=lineage1/batch=0"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(bootReplay == oneShotRestricted(Seq(batch1), Set(1L, 2L, 3L)),
      "bootstrap replay must re-derive the original cleaned output")

    // batch 1 (original pass), tagged
    val orig = Dedup.exactSubstringDedupIncrementalIndexed(
        batch2.toDF("doc_id", "text"), dir, "doc_id", "text",
        Some("q=lineage1/batch=1"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    val countsAfter = Dedup.readWindowCounts(spark, dir)
      .as[(Long, Long)].collect().toSet

    // CRASH REPLAY: checkpoint recovery re-delivers the batch under the
    // same lineage + id — the fold must not re-add (which would make every
    // window of the batch total >= 2, cutting the ENTIRE replayed batch
    // and over-cutting future occurrences forever)
    val replay = Dedup.exactSubstringDedupIncrementalIndexed(
        batch2.toDF("doc_id", "text"), dir, "doc_id", "text",
        Some("q=lineage1/batch=1"))
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(replay == orig, "replayed onClean output != original")
    val countsReplayed = Dedup.readWindowCounts(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(countsReplayed == countsAfter, "replay mutated the store")

    // final store == the no-crash run (one-shot counts over the union)
    val wantCounts = Dedup.substringWindowCounts(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", N)
      .as[(Long, Long)].collect().toSet
    assert(countsReplayed == wantCounts, "store != no-crash run after replay")

    // a FRESH lineage (new checkpoint / second stream) re-feeding rows
    // under its own ids is NOT a replay — it must fold (honest re-count)
    Dedup.exactSubstringDedupIncrementalIndexed(
      Seq((9L, "s1 s2 s3")).toDF("doc_id", "text"), dir, "doc_id", "text",
      Some("q=lineage2/batch=0"))
    assert(Dedup.readWindowCounts(spark, dir)
      .as[(Long, Long)].collect().toSet != wantCounts,
      "a fresh lineage's batch must fold, not be mistaken for a replay")
  }

  test("the stream stamps its folds with query-id-namespaced tags") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("span_stream_tags")
    val ms = MemoryStream[(Long, String)]
    val q = SpanIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir, n = N)(_ => ())
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val tags = graft.ops.ManifestStore.tags(spark, dir)
    assert(tags == Seq(s"q=${q.id}/batch=0", s"q=${q.id}/batch=1"),
      s"stream folds must carry checkpoint-stable lineage tags, got $tags")
  }

  test("a stream configured with a different window length than the pinned " +
    "store fails loud before mutating anything") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("span_stream_n")
    Dedup.writeWindowCounts(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), dir, "doc_id", "text", N)
    val before = Dedup.readWindowCounts(spark, dir).count()
    val ms = MemoryStream[(Long, String)]
    val q = SpanIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir, n = 4)(_ => ())
    val err = intercept[Exception] {
      try { ms.addData((2L, "a b c d e")); q.processAllAvailable() } finally q.stop()
    }
    val msg = Option(err.getCause).fold(err.getMessage)(c => err.getMessage + c.getMessage)
    assert(msg.contains("pinned to n=3"), msg)
    assert(Dedup.readWindowCounts(spark, dir).count() == before,
      "a rejected stream batch mutated the store")
  }
}
