package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Similarity
import graft.streaming.VectorIngestStream

/**
 * Continuous vector-index ingest ([[graft.streaming.VectorIngestStream]]):
 * streamed batches land as committed index generations; serving between
 * batches always sees a complete snapshot, and the final streamed index
 * serves IDENTICALLY to a one-shot batch build of the same corpus (the
 * appendToIndex equivalence, now across micro-batches).
 */
class VectorIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed appends == batch build; per-batch reports track version and generations") {
    implicit val ctx = spark.sqlContext
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(d => math.cos(d * 0.7 + (i % 7)).toFloat)
    val all = (0 until 48).map(i => (i.toLong, vec(i)))
    val embs = all.toDF("vec_id", "embedding")
    val queries = embs.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def serve(dir: String) = Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, dir), queries, 3, nprobe = 2)
      .select("qid", "rank", "vec_id", "adc")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    // frozen quantizers trained once on the full corpus (the append contract)
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)
    val dirBatch = tmpDir("vidx_batch")
    val dirStream = tmpDir("vidx_stream")
    Similarity.writeIndex(embs, coarse, cb, dirBatch, dims = 8, m = 2)
    // the streamed index starts from the first 16 vectors
    Similarity.writeIndex(
      embs.where($"vec_id" < 16), coarse, cb, dirStream, dims = 8, m = 2)

    val reports = mutable.Buffer.empty[VectorIngestStream.BatchReport]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = VectorIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), dirStream)(reports += _)
    try {
      ms.addData(all.slice(16, 32): _*)
      q.processAllAvailable()
      // serving between batches: committed snapshot, no partial state
      assert(serve(dirStream).nonEmpty)
      ms.addData(all.slice(32, 48): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.map(_.nVectors).toSeq == Seq(16L, 16L), reports.toString)
    assert(reports(1).indexVersion > reports(0).indexVersion)
    assert(reports(1).codeGenerations == 3, reports.toString) // build + 2 appends
    assert(serve(dirStream) == serve(dirBatch),
      "streamed index diverged from the one-shot batch build")
    // compaction merges the streamed append generations without changing
    // serving (the quantizer generation keeps its own codes — floor of 2)
    assert(Similarity.compactIndex(spark, dirStream, maxGens = 1) > 0)
    assert(Similarity.indexStatus(spark, dirStream)._2 == 2)
    assert(serve(dirStream) == serve(dirBatch))
  }

  test("moments ledger rides the ingest: fold over streamed frames == whole-stream pass") {
    import graft.ops.SketchLedger
    implicit val ctx = spark.sqlContext
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(d => math.sin(d * 0.9 + i * 0.3).toFloat)
    val all = (0 until 40).map(i => (i.toLong, vec(i)))
    val embs = all.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCentroids(embs, 4, 1)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 1)
    val idxDir = tmpDir("vidx_mom")
    val ledgerDir = tmpDir("vidx_mom_ledger")
    Similarity.writeIndex(embs.where($"vec_id" < 10), coarse, cb, idxDir, dims = 8, m = 2)
    // bootstrap frame for the pre-stream corpus, then stream the rest
    SketchLedger.append(
      Similarity.momentFrame(embs.where($"vec_id" < 10), dims = 8), ledgerDir)
    val ms = MemoryStream[(Long, Array[Float])]
    val q = VectorIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), idxDir,
      momentsLedger = Some((ledgerDir, 8)))(_ => ())
    try {
      ms.addData(all.slice(10, 25): _*)
      q.processAllAvailable()
      ms.addData(all.slice(25, 40): _*)
      q.processAllAvailable()
    } finally q.stop()
    val fold = Similarity.momentFold(SketchLedger.read(spark, ledgerDir).get)
    val whole = Similarity.momentMatrix(embs, dims = 8)
    assert(fold.toSeq == whole.toSeq,
      "streamed moment frames diverge from the whole-corpus pass")
    // and PCA retrains from the ledger exactly as from the corpus
    val a = Similarity.pcaTrainFromMoments(fold, dims = 8, k = 3)
    val b = Similarity.pcaTrain(embs, dims = 8, k = 3)
    assert(a.basis.flatten.toSeq == b.basis.flatten.toSeq &&
      a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("per-batch drift rides the report: None before a window, low in-distribution, high after a shift") {
    import graft.ops.SketchLedger
    implicit val ctx = spark.sqlContext
    def vec(i: Long, shift: Float): Array[Float] =
      Array.tabulate(8)(d => (math.sin(i * 0.7 + d) * 0.5 + shift).toFloat)
    val base = (0 until 200).map(i => (i.toLong, vec(i, 0f)))
    val embs = base.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCentroids(embs, 4, 1)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 1)
    val idxDir = tmpDir("vidx_drift")
    val ledgerDir = tmpDir("vidx_drift_ledger")
    Similarity.writeIndex(embs.where($"vec_id" < 10), coarse, cb, idxDir, dims = 8, m = 2)
    val reports = mutable.Buffer.empty[VectorIngestStream.BatchReport]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = VectorIngestStream.start(
      ms.toDS().toDF("vec_id", "embedding"), idxDir,
      momentsLedger = Some((ledgerDir, 8)), driftBaselineGens = 1)(reports += _)
    try {
      ms.addData(base.slice(10, 110): _*) // the baseline window
      q.processAllAvailable()
      ms.addData(base.slice(110, 200): _*) // in-distribution
      q.processAllAvailable()
      ms.addData((200 until 300).map(i => (i.toLong, vec(i, 0.7f))): _*) // ~2σ shift
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(_.drift.isDefined).toSeq == Seq(false, true, true), reports.toString)
    assert(reports(1).drift.get < 0.1, s"in-distribution drift ${reports(1).drift.get}")
    // recent window = in-distribution + shifted gens — diluted but far
    // above the in-distribution score (the trigger has teeth)
    assert(reports(2).drift.get > 0.5, s"post-shift drift ${reports(2).drift.get}")
  }
}
