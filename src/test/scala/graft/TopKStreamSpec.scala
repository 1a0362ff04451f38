package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.TopKStream

/**
 * Streaming heavy-hitter laws ([[graft.streaming.TopKStream]]):
 *  - with per-bucket distinct items ≤ k the sketch is EXACT, within and
 *    across micro-batches (counts accumulate, Update-mode re-emission);
 *  - the merge-with-prune transition is deterministic and bounded: state
 *    never holds more than k items, tracked counts never overcount, and
 *    the undercount stays within n/(k+1);
 *  - the transition is a function of the batch MULTISET (arrival order
 *    cannot change it).
 */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming: exact standings accumulate across batches when distinct <= k") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val q = TopKStream.heavyHitters(ms.toDS().toDF("item"), "item", k = 8, buckets = 4)
      .writeStream.format("memory").queryName("topk_out").outputMode("update").start()
    def standings(): Map[String, Long] =
      spark.table("topk_out").as[TopKStream.Tracked].collect()
        .groupBy(_.item).view.mapValues(_.map(_.count).max).toMap
    try {
      ms.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
      q.processAllAvailable()
      assert(standings() == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
      ms.addData("a", "a", "d")
      q.processAllAvailable()
      // update-mode: the memory sink holds both emissions; max-per-item is
      // the current standing — batch 2 adds into batch 1's state
      assert(standings() == Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
    } finally q.stop()
  }

  test("streaming: state survives a stop/restart from the checkpoint") {
    implicit val ctx = spark.sqlContext
    val ckpt = tmpDir("topk_ckpt")
    val ms = MemoryStream[String]
    // memory sinks refuse checkpoint recovery; foreachBatch supports it
    // (the production wiring) — emissions fold into a driver-held map
    val emitted = scala.collection.mutable.Map.empty[String, Long]
    def start() = TopKStream.heavyHitters(ms.toDS().toDF("item"), "item", k = 8, buckets = 4)
      .toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => emitted.update(r.getString(1), r.getLong(2)))
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      ms.addData(Seq.fill(4)("a") ++ Seq.fill(2)("b"): _*)
      q1.processAllAvailable()
      assert(emitted.toMap == Map("a" -> 4L, "b" -> 2L))
    } finally q1.stop()
    // a NEW query instance over the same checkpoint resumes the Misra-Gries
    // state — counts accumulate across the restart, nothing resets
    val q2 = start()
    try {
      ms.addData("a", "c")
      q2.processAllAvailable()
      assert(emitted.toMap == Map("a" -> 5L, "b" -> 2L, "c" -> 1L),
        s"state lost across restart: $emitted")
    } finally q2.stop()
  }

  test("updateBucket: deterministic merge-with-prune, bounded state, one-sided error") {
    def runBatch(
        prior: Option[Map[String, Long]],
        items: Seq[String]): (Seq[TopKStream.Tracked], Map[String, Long]) = {
      val state = TestGroupState.create[Map[String, Long]](
        prior.map(Optional.of[Map[String, Long]]).getOrElse(Optional.empty()),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], hasTimedOut = false)
      val out = TopKStream.updateBucket(2)(0, items.map((0, _)).iterator, state).toSeq
      (out, state.get)
    }
    // exact batch counts {a:5, b:4, c:3, d:1} pruned to capacity 2:
    // subtract the 3rd-largest (3) → {a:2, b:1}, deterministic
    val items = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") :+ "d"
    val (out, st) = runBatch(None, items)
    assert(st == Map("a" -> 2L, "b" -> 1L))
    assert(out.map(t => (t.item, t.count)) == Seq(("a", 2L), ("b", 1L)),
      "emission must be count-desc, item-asc")
    // arrival order cannot change the transition (multiset function)
    val shuffled = new scala.util.Random(7).shuffle(items)
    assert(runBatch(None, shuffled)._2 == st)
    // one-sided error: tracked counts never exceed truth; undercount is
    // bounded by n/(k+1) = 13/3
    st.foreach { case (i, c) =>
      val truth = items.count(_ == i)
      assert(c <= truth && truth - c <= items.size / 3)
    }
    // a second batch merges into the pruned state and stays bounded
    val (_, st2) = runBatch(Some(st), Seq("c", "c", "c", "c", "a"))
    assert(st2.size <= 2, s"state exceeded capacity: $st2")
    assert(st2.keySet.contains("c"), "a newly-heavy item must displace into the sketch")
  }
}
