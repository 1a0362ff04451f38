package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
}
