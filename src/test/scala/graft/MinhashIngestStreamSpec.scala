package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, MinhashIndex}
import graft.streaming.MinhashIngestStream

/**
 * Continuous near-dup-index ingest ([[graft.streaming.MinhashIngestStream]]):
 * streamed batches land as committed band segments (bootstrapping on the
 * first batch), each batch's `onPairs` feed carries exactly the pairs it
 * introduces, their disjoint union equals one-shot candidate generation
 * over the whole corpus, and serving from the final index is identical —
 * the streamed economics never change the answer.
 */
class MinhashIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = (0 until 30).map { i =>
    val g = i / 3
    val shared = (0 until 12).map(k => s"w${(g * 7 + k * 3) % 19}").mkString(" ")
    (i.toLong, s"$shared tail${i % 3} end$g")
  }

  private def oneShot(rows: Seq[(Long, String)]): Set[(Long, Long)] =
    pairSet(Dedup.candidatePairs(
      Dedup.lshBands(
        Dedup.minhashSignaturesNative(
          rows.toDF("doc_id", "text"), "doc_id", "text", 16, 3), 16, 8),
      maxOccupancy = 64))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed batches: per-batch pair feeds union to the one-shot pair set; " +
    "final index serves identically; segments count per batch") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("mh_stream")
    val reports = mutable.Buffer.empty[MinhashIngestStream.BatchReport]
    val fed = mutable.Buffer.empty[Set[(Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = MinhashIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir)(
      reports += _, pairs => fed += pairSet(pairs))
    try {
      ms.addData(corpus.take(10): _*); q.processAllAvailable()
      ms.addData(corpus.slice(10, 20): _*); q.processAllAvailable()
      ms.addData(corpus.drop(20): _*); q.processAllAvailable()
      ms.addData(Seq.empty[(Long, String)]: _*); q.processAllAvailable()
    } finally q.stop()

    assert(reports.size >= 3, reports.toString)
    val live = reports.filter(_.nDocs > 0)
    assert(live.size == 3)
    assert(live.map(_.segments) == Seq(1, 2, 3), live.toString)
    assert(live.map(_.nDocs).sum == 30)
    assert(live.map(_.nNewPairs) == fed.map(_.size.toLong), "report/feed mismatch")

    // the disjoint per-batch feeds union to one-shot over the union corpus
    val union = oneShot(corpus)
    assert(fed.reduce(_ ++ _) == union, "streamed pair feeds != one-shot pairs")
    assert(fed.map(_.size).sum == union.size, "per-batch feeds overlapped")
    // and the committed index serves the same set
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir, 64)) == union)

    // compaction: serving invariant, segments collapse
    assert(MinhashIndex.compactMinhashIndex(spark, dir) == 3)
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir, 64)) == union)
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.segments == 1)
  }

  test("the stream stamps appends with query-id-namespaced tags") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("mh_stream_tags")
    val ms = MemoryStream[(Long, String)]
    val q = MinhashIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir)(_ => ())
    try {
      ms.addData(corpus.take(10): _*); q.processAllAvailable()
      ms.addData(corpus.slice(10, 20): _*); q.processAllAvailable()
    } finally q.stop()
    val content = graft.ops.ManifestStore.readVersioned(spark, dir, "_mh").get._2
    val tags = content.linesIterator
      .filter(_.startsWith("tag\t")).map(_.stripPrefix("tag\t")).toSeq
    assert(tags == Seq(s"q=${q.id}/batch=0", s"q=${q.id}/batch=1"),
      s"stream appends must carry checkpoint-stable lineage tags, got $tags")
  }

  test("crash replay is exactly-once (r15): a tagged append re-applied under " +
    "the same tag re-derives the IDENTICAL pair frame without re-appending — " +
    "doubled occupancy partials would trip the cap and drop true pairs") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("mh_replay")
    // one degenerate hamming family: identical text → identical signature →
    // every band collides in one bucket. Cap 4 exactly fits the no-crash
    // total (2 stored + 2 appended); a double-appended batch would push the
    // bucket's partials to 6 > 4 and silently kill the family's pairs.
    val same = "w1 w2 w3 w4 w5 w6 w7 w8"
    val batchA = Seq((1L, same), (2L, same))
    val batchB = Seq((3L, same), (4L, same))
    MinhashIndex.writeMinhashIndex(
      batchA.toDF("doc_id", "text"), dir, tag = Some("q=l1/batch=0"))

    // BOOTSTRAP REPLAY: index committed, restarted stream takes the append
    // path with batch 0's tag — must not append; re-derived pairs = the
    // within-batch pairs the bootstrap feed delivered
    val bootPairs = pairSet(MinhashIndex.appendToMinhashIndex(
      batchA.toDF("doc_id", "text"), dir, maxOccupancy = 4,
      tag = Some("q=l1/batch=0")))
    assert(bootPairs == Set((1L, 2L)), s"bootstrap replay pairs: $bootPairs")
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.segments == 1,
      "bootstrap replay appended a segment")

    // batch 1, original pass
    val orig = pairSet(MinhashIndex.appendToMinhashIndex(
      batchB.toDF("doc_id", "text"), dir, maxOccupancy = 4,
      tag = Some("q=l1/batch=1")))
    assert(orig == Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"original pairs: $orig")

    // CRASH REPLAY: same tag → identical frame, no segment, no partials
    val replay = pairSet(MinhashIndex.appendToMinhashIndex(
      batchB.toDF("doc_id", "text"), dir, maxOccupancy = 4,
      tag = Some("q=l1/batch=1")))
    assert(replay == orig, s"replayed pair feed $replay != original $orig")
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.segments == 2,
      "replay appended a segment")

    // serving == the no-crash run: at cap 4 the family still emits all
    // C(4,2) pairs (doubled partials would have dropped the bucket whole)
    val want = pairSet(Dedup.candidatePairs(
      Dedup.lshBands(
        Dedup.minhashSignaturesNative(
          (batchA ++ batchB).toDF("doc_id", "text"), "doc_id", "text", 16, 3),
        16, 8),
      maxOccupancy = 4))
    assert(want.size == 6, s"sanity: no-crash one-shot emits C(4,2), got $want")
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir, 4)) == want,
      "post-replay serving != no-crash run")

    // a FRESH lineage's batch under its own tag is NOT a replay: it appends
    // (and at cap 4 its occupancy honestly saturates the bucket)
    MinhashIndex.appendToMinhashIndex(
      Seq((5L, same)).toDF("doc_id", "text"), dir, maxOccupancy = 64,
      tag = Some("q=l2/batch=0"))
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.segments == 3,
      "a fresh lineage's append must land")
  }
}
