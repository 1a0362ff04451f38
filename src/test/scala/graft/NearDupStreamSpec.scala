package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.{Doc, Pair}

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming near-dup emits pairs within and across batches, replay-safe") {
    GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = NearDupStream.pairs(ms.toDS())
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      ms.addData(
        Doc(1L, "alpha beta gamma delta"),
        Doc(2L, "alpha beta gamma delta"), // identical sketch — pair in-batch
        Doc(3L, "unrelated content entirely different here"))
      q.processAllAvailable()
      // a pair sharing several bands is emitted once per shared bucket —
      // the documented contract is dedup downstream, hence the Set
      val b1 = spark.table("neardup_out").as[Pair].collect().toSet
      assert(b1 == Set(Pair(1L, 2L, 0)))

      // batch 2: a cross-batch dup of doc 1/2's content, plus a replay of
      // doc 1 itself (must neither self-pair nor duplicate state)
      ms.addData(Doc(4L, "alpha beta gamma delta"), Doc(1L, "alpha beta gamma delta"))
      q.processAllAvailable()
      val b2 = spark.table("neardup_out").as[Pair].collect().toSet
      assert(b2 == Set(Pair(1L, 2L, 0), Pair(1L, 4L, 0), Pair(2L, 4L, 0)))
    } finally q.stop()
  }

  test("saturation cap: a bucket that reaches maxOccupancy stops storing and " +
    "comparing — state and emission stay bounded under a degenerate family") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[List[(Long, Long)]](
      Optional.empty[List[(Long, Long)]], GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    // 5 identical sketches, cap 3: docs 1..3 store (pairs C(3,2)=3), 4..5
    // hit the saturated bucket — no pairs, no state growth
    val docs = (1L to 5L).map(i => NearDupStream.Banded(i, 0x42L, 0L))
    val out = NearDupStream.updateGroup(3, 0L, 3)(0L, docs.iterator, st).toSet
    assert(out == Set(NearDupStream.Pair(1L, 2L, 0), NearDupStream.Pair(1L, 3L, 0),
      NearDupStream.Pair(2L, 3L, 0)))
    assert(st.get.size == 3, s"saturated bucket grew state: ${st.get}")
    // a later batch against the saturated bucket emits nothing either
    val out2 = NearDupStream.updateGroup(3, 0L, 3)(
      0L, Iterator(NearDupStream.Banded(9L, 0x42L, 0L)), st).toSet
    assert(out2.isEmpty && st.get.size == 3)
  }

  test("state TTL: timed-out buckets are removed without emitting") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ndState = TestGroupState.create[List[(Long, Long)]](
      Optional.of(List((1L, 42L))), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    val out = NearDupStream.updateGroup(3, 1000L, 1024)(0L, Iterator.empty, ndState)
    assert(out.isEmpty && ndState.isRemoved)
    val dState = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    val out2 = graft.streaming.DedupStream.updateGroup(1000L)("fp", Iterator.empty, dState)
    assert(out2.isEmpty && dState.isRemoved)
  }
}
