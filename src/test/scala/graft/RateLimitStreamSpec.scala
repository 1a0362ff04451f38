package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.RateLimitStream

case class RateLimitDoc(key: String, doc_id: Long)

class RateLimitStreamSpec extends SparkSpec {
  import spark.implicits._

  test("CMS rate limiter: planted hot key is capped across batches, cold keys sail through") {
    val limiter = new RateLimitStream.CmsRateLimiter(
      "key", "doc_id", cap = 100, d = 8, w = 8192)

    def batch(tag: Int, hot: Int, coldEach: Int) =
      ((0 until hot).map(i => RateLimitDoc("hot", tag * 10000L + i)) ++
        (0 until coldEach).flatMap(i =>
          Seq(RateLimitDoc("cold_a", tag * 10000L + 1000 + i), RateLimitDoc("cold_b", tag * 10000L + 2000 + i))))
        .toDF()

    // batch 1: hot sends 80 — under the 100 cap, all admitted
    val b1 = limiter.admit(batch(1, hot = 80, coldEach = 10))
      .groupBy("key").count().as[(String, Long)].collect().toMap
    assert(b1 == Map("hot" -> 80L, "cold_a" -> 10L, "cold_b" -> 10L), b1.toString)

    // batch 2: hot sends 80 more — only the 20 below the cap admitted,
    // and admission is deterministic: the LOWEST doc_ids by orderCol
    val a2 = limiter.admit(batch(2, hot = 80, coldEach = 10))
    val b2 = a2.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(b2 == Map("hot" -> 20L, "cold_a" -> 10L, "cold_b" -> 10L), b2.toString)
    val hotIds = a2.where($"key" === "hot").select("doc_id").as[Long].collect().sorted
    assert(hotIds.toSeq == (0 until 20).map(i => 20000L + i), s"admission order broken: ${hotIds.toSeq}")

    // batch 3: hot is exhausted — zero admitted, cold still flows
    val b3 = limiter.admit(batch(3, hot = 50, coldEach = 10))
      .groupBy("key").count().as[(String, Long)].collect().toMap
    assert(b3 == Map("cold_a" -> 10L, "cold_b" -> 10L), b3.toString)

    // the one-sided guarantee: total admitted per key NEVER exceeds cap
    // (CMS estimates never undercount admitted mass)
    assert(b1("hot") + b2("hot") + b3.getOrElse("hot", 0L) == 100L)

    // the sketch is the only state — storable, re-foldable matrix
    assert(limiter.currentSketch.exists(_.length == 8))
  }

  test("CMS rate limiter: attached to a real stream via foreachBatch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[RateLimitDoc]
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = RateLimitStream.start(
      ms.toDF(), "key", "doc_id", cap = 5) { (admitted, _) =>
      got ++= admitted.select("key", "doc_id").as[(String, Long)].collect()
    }
    try {
      ms.addData((0 until 4).map(i => RateLimitDoc("h", i)): _*)
      q.processAllAvailable()
      ms.addData((4 until 10).map(i => RateLimitDoc("h", i)) :+ RateLimitDoc("c", 100L): _*)
      q.processAllAvailable()
      val byKey = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(byKey("h") == (0L until 5L), s"hot admissions: ${byKey("h")}")
      assert(byKey("c") == Seq(100L))
    } finally q.stop()
  }
}
