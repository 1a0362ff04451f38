package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DedupStream
import graft.streaming.DedupStream.Doc

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops repeats within a batch and across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = DedupStream.deduped(ms.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: ids 1 and 2 normalize to the same content (case/whitespace)
      ms.addData(
        Doc(2L, "Hello  World"), // same fp as doc 1, larger id — dropped
        Doc(1L, "hello world"),
        Doc(3L, "something else"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out").as[Doc].collect().map(_.doc_id).sorted.toSeq
      assert(b1 == Seq(1L, 3L))

      // batch 2: a cross-batch repeat of doc 1's content + one new document
      ms.addData(Doc(4L, "HELLO WORLD"), Doc(5L, "third thing"))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out").as[Doc].collect().map(_.doc_id).sorted.toSeq
      assert(b2 == Seq(1L, 3L, 5L)) // 4 was deduped against batch-1 state
    } finally q.stop()
  }
}
