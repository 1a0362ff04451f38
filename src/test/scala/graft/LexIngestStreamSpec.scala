package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Retrieval
import graft.streaming.LexIngestStream

/**
 * Continuous lexical-index ingest ([[graft.streaming.LexIngestStream]]):
 * streamed batches land as committed BM25 segments (bootstrapping the
 * index on the first batch); serving between batches equals the direct
 * [[Retrieval.bm25]] over the docs streamed SO FAR, and the final
 * streamed index serves identically to a one-shot build of the whole
 * corpus — df, N and avgdl fold exactly across segments.
 */
class LexIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed appends == one-shot build; mid-stream serving is the so-far corpus; compaction invariant") {
    implicit val ctx = spark.sqlContext
    val all = Seq(
      (1L, "spark joins fast"), (2L, "hash table scan"),
      (3L, "spark spark window"), (4L, "window sort merge"),
      (5L, "spark hash join"), (6L, "sort spill shuffle"))
    val queries = Seq((0L, "spark window"), (1L, "hash")).toDF("qid", "qtext")
    def ranked(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("qid", "rank").collect().toSeq.map(_.toSeq)
    def serve(dir: String): Seq[Seq[Any]] = ranked(
      Retrieval.bm25TopKIndexed(Retrieval.readLexIndex(spark, dir), queries, k = 6))

    val dir = tmpDir("lex_stream")
    val reports = mutable.Buffer.empty[LexIngestStream.BatchReport]
    val ms = MemoryStream[(Long, String)]
    val q = LexIngestStream.start(
      ms.toDS().toDF("doc_id", "text"), dir)(reports += _)
    try {
      // batch 0 bootstraps the index from an empty dir
      ms.addData(all.take(2): _*)
      q.processAllAvailable()
      assert(serve(dir) == ranked(Retrieval.bm25(
        all.take(2).toDF("doc_id", "text"), "doc_id", "text", queries, k = 6)),
        "bootstrap segment diverged from direct bm25")
      // batch 1 appends; serving between batches = the so-far corpus
      ms.addData(all.slice(2, 4): _*)
      q.processAllAvailable()
      assert(serve(dir) == ranked(Retrieval.bm25(
        all.take(4).toDF("doc_id", "text"), "doc_id", "text", queries, k = 6)),
        "mid-stream serving diverged from the so-far corpus")
      ms.addData(all.slice(4, 6): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.map(_.nDocs).toSeq == Seq(2L, 2L, 2L), reports.toString)
    assert(reports.map(_.segments).toSeq == Seq(1, 2, 3), reports.toString)
    assert(reports(2).indexVersion > reports(0).indexVersion)

    // final streamed index == one-shot build of the whole corpus
    val dirRef = tmpDir("lex_stream_ref")
    Retrieval.writeLexIndex(all.toDF("doc_id", "text"), dirRef)
    assert(serve(dir) == serve(dirRef),
      "streamed index diverged from the one-shot build")

    // compaction trigger surfaced via the report's segment count; merging
    // changes nothing served
    assert(Retrieval.compactLexIndex(spark, dir, maxGens = 1) == 3)
    assert(serve(dir) == serve(dirRef))
    assert(Retrieval.vacuumLexIndex(spark, dir) == 3)
    assert(serve(dir) == serve(dirRef))
  }
}
