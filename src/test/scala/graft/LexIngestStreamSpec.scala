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

    // the stream stamped each commit with its checkpoint-stable lineage tag
    // (r15) — and compaction carried them forward, so a very late replay
    // still recognizes itself
    val content = graft.ops.ManifestStore.readVersioned(spark, dir, "_lex").get._2
    val tags = content.linesIterator
      .filter(_.startsWith("tag\t")).map(_.stripPrefix("tag\t")).toSeq
    assert(tags == (0 to 2).map(i => s"q=${q.id}/batch=$i"),
      s"stream appends must carry lineage tags surviving compact, got $tags")
  }

  test("crash replay is exactly-once (r15): a tagged append re-applied under " +
    "the same tag never lands a second segment — doubled df/corpus-stat " +
    "partials would skew every subsequent BM25 score") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("lex_replay")
    val batchA = Seq((1L, "spark joins fast"), (2L, "hash table scan"))
    val batchB = Seq((3L, "spark spark window"), (4L, "window sort merge"))
    val queries = Seq((0L, "spark window"), (1L, "hash")).toDF("qid", "qtext")
    def ranked(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("qid", "rank").collect().toSeq.map(_.toSeq)
    def serve(): Seq[Seq[Any]] = ranked(
      Retrieval.bm25TopKIndexed(Retrieval.readLexIndex(spark, dir), queries, k = 6))

    Retrieval.writeLexIndex(
      batchA.toDF("doc_id", "text"), dir, tag = Some("q=l1/batch=0"))
    Retrieval.appendToLexIndex(
      batchB.toDF("doc_id", "text"), dir, tag = Some("q=l1/batch=1"))
    val want = serve()
    val wantStats = Retrieval.readLexIndex(spark, dir).stats.collect()(0).toSeq

    // CRASH REPLAY of batch 1: same lineage + id → no-op
    Retrieval.appendToLexIndex(
      batchB.toDF("doc_id", "text"), dir, tag = Some("q=l1/batch=1"))
    assert(Retrieval.lexIndexStats(spark, dir).get.segments == 2,
      "replay landed a segment")
    assert(Retrieval.readLexIndex(spark, dir).stats.collect()(0).toSeq == wantStats,
      "replay doubled corpus-stat partials")
    assert(serve() == want, "post-replay serving != no-crash run")
    // serving still equals direct bm25 over the no-crash corpus
    assert(serve() == ranked(Retrieval.bm25(
      (batchA ++ batchB).toDF("doc_id", "text"), "doc_id", "text", queries, k = 6)),
      "post-replay index diverged from the no-crash corpus")

    // BOOTSTRAP REPLAY: the index is committed, so a restarted stream takes
    // the append path with batch 0's tag — recorded at bootstrap, so no-op
    Retrieval.appendToLexIndex(
      batchA.toDF("doc_id", "text"), dir, tag = Some("q=l1/batch=0"))
    assert(Retrieval.lexIndexStats(spark, dir).get.segments == 2,
      "bootstrap replay landed a segment")

    // a FRESH lineage's batch is NOT a replay: it appends
    Retrieval.appendToLexIndex(
      Seq((5L, "spark hash join")).toDF("doc_id", "text"), dir,
      tag = Some("q=l2/batch=0"))
    assert(Retrieval.lexIndexStats(spark, dir).get.segments == 3,
      "a fresh lineage's append must land")
  }
}
