package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dedup
import graft.streaming.ParagraphIngestStream

/**
 * Continuous paragraph-dedup ingest ([[graft.streaming.ParagraphIngestStream]]):
 * streamed batches clean against the accumulated line-hash store
 * (bootstrapping on the first batch), and — when ingest order follows id
 * order — the per-batch cleaned feeds union to EXACTLY the batch
 * keep-first operator over the whole corpus: the streamed economics never
 * change the answer.
 */
class ParagraphIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  // shared banner, unique bodies, mod-4 shared footers; doc 29 is PURE
  // boilerplate (banner + an already-seen footer) — it must reassemble
  // empty and be reported
  private def corpus: Seq[(Long, String)] = (0 until 29).map { i =>
    (i.toLong, s"banner\nbody$i\nfooter${i % 4}")
  } :+ (29L, "banner\nfooter1")

  test("streamed cleaned feeds union to batch keep-first over the whole corpus; empties reported") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("para_stream")
    val reports = mutable.Buffer.empty[ParagraphIngestStream.BatchReport]
    val cleaned = mutable.Buffer.empty[Seq[(Long, String)]]
    val ms = MemoryStream[(Long, String)]
    val q = ParagraphIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir)(
      reports += _,
      df => cleaned += df.orderBy("doc_id").as[(Long, String)].collect().toSeq)
    try {
      ms.addData(corpus.take(10): _*); q.processAllAvailable()
      ms.addData(corpus.slice(10, 20): _*); q.processAllAvailable()
      ms.addData(corpus.drop(20): _*); q.processAllAvailable()
      ms.addData(Seq.empty[(Long, String)]: _*); q.processAllAvailable()
    } finally q.stop()

    val live = reports.filter(_.nDocs > 0)
    assert(live.size == 3 && live.map(_.nDocs).sum == 30, reports.toString)
    // the pure-boilerplate doc arrived in batch 3 and emptied there
    assert(live.map(_.nEmptied) == Seq(0L, 0L, 1L), live.toString)

    // the law: streamed feeds ≡ one-shot keep-first over the union (ids
    // follow ingest order, so the global first occurrence is in the
    // earliest batch carrying the line)
    val streamed = cleaned.flatten.sortBy(_._1)
    val batchRef = Dedup.paragraphDedup(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(streamed == batchRef, "streamed cleaned union != batch keep-first")

    // the store accumulated every distinct line
    val stored = Dedup.readLineHashes(spark, dir).count()
    val distinctLines = corpus.flatMap(_._2.split("\n")).distinct.size.toLong
    assert(stored == distinctLines)
  }

  test("a stream configured with a different separator than the pinned store fails loud") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("para_stream_sep")
    Dedup.writeLineHashes(
      Seq((1L, "a\nb")).toDF("doc_id", "text"), dir, "text") // pins "\n"
    val ms = MemoryStream[(Long, String)]
    val q = ParagraphIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir, sep = "|")(_ => ())
    val err = intercept[Exception] {
      try { ms.addData((2L, "b|c")); q.processAllAvailable() } finally q.stop()
    }
    val msg = Option(err.getCause).fold(err.getMessage)(c => err.getMessage + c.getMessage)
    assert(msg.contains("pinned to separator"), msg)
  }
}
