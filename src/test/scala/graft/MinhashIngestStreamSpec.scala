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
}
