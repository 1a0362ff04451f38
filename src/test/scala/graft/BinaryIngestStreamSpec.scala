package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Similarity
import graft.streaming.BinaryIngestStream

/**
 * Continuous binary-code-store ingest ([[graft.streaming.BinaryIngestStream]]):
 * streamed micro-batches upsert committed code snapshots; serving between
 * batches sees only complete state; the final streamed store equals a
 * one-shot [[Similarity.writeBinaryCodes]] of the same corpus; a
 * mismatched-width batch fails loud against the pinned meta.
 */
class BinaryIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(d => math.sin(d * 1.1 + (i % 9) * 0.6).toFloat)

  test("streamed ingest == one-shot store; mid-stream serving committed; " +
    "reports carry the pinned width") {
    implicit val ctx = spark.sqlContext
    val all = (0 until 40).map(i => (i.toLong, vec(i)))
    val embs = all.toDF("vec_id", "embedding")
    val queries = embs.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def serve(dir: String): Set[(Long, Int, Long, Int)] =
      Similarity.binaryTopKIndexed(spark, dir, queries, 4)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet

    val dirBatch = tmpDir("bin_batch")
    Similarity.writeBinaryCodes(embs, dirBatch, dims = 8)

    val dirStream = tmpDir("bin_stream")
    val reports = mutable.Buffer.empty[BinaryIngestStream.BatchReport]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = BinaryIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), dirStream, dims = 8)(reports += _)
    try {
      ms.addData(all.take(15): _*)
      q.processAllAvailable()
      // first batch bootstrapped the store AND pinned dims — serving
      // between batches reads a complete committed snapshot
      assert(Similarity.binaryCodesCommitted(spark, dirStream))
      assert(serve(dirStream).nonEmpty)
      ms.addData(all.slice(15, 40): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.map(r => (r.nVectors, r.dims)) == mutable.Buffer((15L, 8), (25L, 8)))
    assert(serve(dirStream) == serve(dirBatch),
      "streamed store diverged from the one-shot build")
    assert(Similarity.readBinaryCodes(spark, dirStream).count() == 40L)

    // re-delivered batch (crash-replay at-least-once): idempotent upsert
    val q2 = BinaryIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), dirStream, dims = 8)(_ => ())
    try { ms.addData(all.slice(15, 40): _*); q2.processAllAvailable() }
    finally q2.stop()
    assert(serve(dirStream) == serve(dirBatch), "replay changed the store")

    // a producer at a different width must fail its batch loud, and the
    // store must stay intact at the pinned width
    val ms4 = MemoryStream[(Long, Array[Float])]
    val q4 = BinaryIngestStream.start(
      ms4.toDS().toDF("vec_id", "embedding"), dirStream, dims = 4)(_ => ())
    try {
      ms4.addData((100L, Array(1f, -1f, 1f, -1f)))
      val ex = intercept[Exception] { q4.processAllAvailable() }
      assert(ex.getMessage != null)
    } finally q4.stop()
    assert(serve(dirStream) == serve(dirBatch), "failed batch mutated the store")
  }

  test("empty batches report zero rows and commit nothing") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("bin_empty")
    val reports = mutable.Buffer.empty[BinaryIngestStream.BatchReport]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = BinaryIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), dir, dims = 8)(reports += _)
    try {
      ms.addData(Seq.empty[(Long, Array[Float])]: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.forall(r => r.nVectors == 0L && r.dims == -1),
      "pre-bootstrap reports must carry dims = -1 (nothing pinned), " +
        s"got $reports")
    assert(!Similarity.binaryCodesCommitted(spark, dir),
      "an empty stream must not bootstrap a store")
  }
}
