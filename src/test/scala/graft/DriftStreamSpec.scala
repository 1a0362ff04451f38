package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Profile
import graft.streaming.DriftStream

/**
 * Streaming drift monitor laws ([[graft.streaming.DriftStream]]):
 *  - a batch matching the reference mix scores ~0 and is not flagged;
 *  - a disjoint batch scores high PSI and flags;
 *  - the per-batch score IS the batch operator's score (one
 *    implementation — parity against [[Profile.drift]] on the same
 *    frames);
 *  - rows pass through to the sink untouched.
 */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming: per-batch PSI matches the batch operator; disjoint batch flags") {
    implicit val ctx = spark.sqlContext
    val ref = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("k")
    val scores = mutable.Buffer.empty[(Long, Long, Long, Double, Double, Boolean)]
    val sunk = mutable.Buffer.empty[Long]
    val ms = MemoryStream[String]
    val q = DriftStream.start(ms.toDS().toDF("k"), "k", ref, psiThreshold = 0.25) {
      (id, n, nk, psi, jsd, drifted) => scores += ((id, n, nk, psi, jsd, drifted))
    } { (batch, _) => sunk += batch.count() }
    try {
      ms.addData(Seq.fill(25)("a") ++ Seq.fill(25)("b"): _*)
      q.processAllAvailable()
      ms.addData(Seq.fill(50)("c"): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(sunk.toSeq == Seq(50L, 50L), "rows must pass through untouched")
    assert(scores.size == 2)
    val (_, n1, k1, psi1, jsd1, d1) = scores(0)
    assert(n1 == 50 && k1 == 2 && !d1)
    assert(math.abs(psi1) < 1e-12 && math.abs(jsd1) < 1e-12,
      "a batch matching the reference mix must score zero")
    val (_, n2, k2, psi2, _, d2) = scores(1)
    assert(n2 == 50 && k2 == 1 && d2 && psi2 > 0.25)
    // parity: the monitor's number IS Profile.drift's number on the same frames
    val batch2 = Seq.fill(50)("c").toDF("k")
    val expect = Profile.drift(ref, batch2, "k").collect()(0)
    assert(psi2 == expect.getAs[Double]("psi"))
  }

  test("numeric drift: DD-bucketed PSI, batch/stream parity, out-of-domain excluded, magnitude shift flags") {
    implicit val ctx = spark.sqlContext
    // reference: values around 10; shifted batch: values around 1000 — a
    // magnitude shift lands in disjoint log buckets and must flag
    val ref = (1 to 100).map(i => 8.0 + (i % 5)).toDF("v")
    val scores = mutable.Buffer.empty[(Long, Long, Long, Double, Double, Boolean)]
    val ms = MemoryStream[Double]
    val q = DriftStream.startNumeric(
      ms.toDS().toDF("v"), "v", ref, alpha = 0.05, psiThreshold = 0.25) {
      (id, n, nk, psi, jsd, drifted) => scores += ((id, n, nk, psi, jsd, drifted))
    } { (_, _) => () }
    try {
      // same-distribution batch (plus out-of-domain values that must not count)
      ms.addData((1 to 50).map(i => 8.0 + (i % 5)) ++ Seq(-1.0, 0.0): _*)
      q.processAllAvailable()
      ms.addData((1 to 50).map(i => 800.0 + (i % 5) * 100): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(scores.size == 2)
    val (_, n1, _, psi1, _, d1) = scores(0)
    assert(n1 == 50, s"out-of-domain values leaked into the count: $n1")
    assert(math.abs(psi1) < 1e-12 && !d1, s"same-distribution batch flagged: psi=$psi1")
    val (_, n2, _, psi2, _, d2) = scores(1)
    assert(n2 == 50 && d2 && psi2 > 0.25, s"magnitude shift must flag: psi=$psi2")

    // ONE implementation: the stream's score is Profile.driftNumeric's
    val batch2 = (1 to 50).map(i => 800.0 + (i % 5) * 100).toDF("v")
    val expect = Profile.driftNumeric(ref, batch2, "v", alpha = 0.05).collect()(0)
    assert(psi2 == expect.getAs[Double]("psi"))

    // and the per-bucket frame composes from ddHistogram frames (the
    // ledger-fold entry point): histograms in == driftNumericByBucket out
    val viaHists = Profile.driftNumericFromHistograms(
      Profile.ddHistogram(ref, "v", 0.05)
        .select(col("bucket").as("key"), col("cnt").as("ref_cnt")),
      Profile.ddHistogram(batch2, "v", 0.05)
        .select(col("bucket").as("key"), col("cnt").as("cur_cnt")),
      alpha = 0.05)
    val direct = Profile.driftNumericByBucket(ref, batch2, "v", alpha = 0.05)
    assert(viaHists.orderBy("bucket").collect().toSeq.map(_.toSeq)
      == direct.orderBy("bucket").collect().toSeq.map(_.toSeq))
  }
}
