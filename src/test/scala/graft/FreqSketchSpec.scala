package graft

import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def topItems(df: org.apache.spark.sql.DataFrame, colName: String, k: Int) =
    df.agg(call_function("freq_items", col(colName), lit(k)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.count".as("cnt"))
      .as[(String, Long)].collect().toSeq

  test("exact when distinct <= k, independent of partitioning (merge path)") {
    val rows = (0 until 2000).map(i => s"k${i % 7}")
    val expected = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSet
    for (parts <- Seq(1, 5, 32)) {
      val got = topItems(rows.toDF("s").repartition(parts), "s", 16).toSet
      assert(got == expected, s"inexact at distinct<=k with $parts partitions")
    }
  }

  test("deterministic output order: count desc, item asc") {
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c")
    assert(topItems(rows.toDF("s").repartition(3), "s", 8) ==
      Seq(("a", 5L), ("b", 5L), ("c", 2L)))
  }

  test("over capacity: never overcounts, undercount <= n/(k+1), heavy item survives") {
    // adversarial stream: one heavy item (30%) drowning in a long tail of
    // singletons, far more distinct values than the k=16 counters
    val n = 3000
    val heavy = (0 until (n * 3 / 10)).map(_ => "HEAVY")
    val tail = (0 until n - heavy.size).map(i => s"tail_$i")
    val rows = new scala.util.Random(42).shuffle((heavy ++ tail).toVector)
    val k = 16
    val got = topItems(rows.toDF("s").repartition(8), "s", k).toMap
    val trueHeavy = heavy.size.toLong
    assert(got.contains("HEAVY"), "item above n/(k+1) frequency was lost")
    assert(got("HEAVY") <= trueHeavy, "Misra-Gries must never overcount")
    assert(got("HEAVY") >= trueHeavy - n / (k + 1),
      s"undercount exceeded n/(k+1): ${got("HEAVY")} vs $trueHeavy")
    // every reported count is a valid lower bound on its true frequency
    got.foreach { case (item, c) =>
      val t = if (item == "HEAVY") trueHeavy else 1L
      assert(c <= t, s"$item overcounted: $c > $t")
    }
  }

  test("nulls are skipped, not counted") {
    val rows = Seq(Some("x"), None, Some("x"), None, Some("y"))
    assert(topItems(rows.toDF("s"), "s", 4).toSet == Set(("x", 2L), ("y", 1L)))
  }

  test("per-group sketches: one independent k-bounded sketch per group key") {
    val df = ((1 to 30).map(i => ("g1", s"v${i % 3}")) ++
      (1 to 20).map(_ => ("g2", "only"))).toDF("g", "s").repartition(6)
    val got = df.groupBy("g")
      .agg(call_function("freq_items", col("s"), lit(8)).as("hh"))
      .select($"g", explode($"hh").as("h"))
      .select($"g", $"h.item", $"h.count".as("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("g1", "v0", 10L), ("g1", "v1", 10L), ("g1", "v2", 10L),
      ("g2", "only", 20L)))
  }

  test("streaming: the sketch aggregates incrementally across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = ms.toDS().toDF("s")
      .agg(call_function("freq_items", col("s"), lit(8)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.count".as("cnt"))
      .writeStream.format("memory").queryName("hh_stream").outputMode("complete").start()
    try {
      ms.addData("a", "b", "a")
      q.processAllAvailable()
      assert(spark.table("hh_stream").as[(String, Long)].collect().toSet ==
        Set(("a", 2L), ("b", 1L)))
      ms.addData("b", "c", "b")
      q.processAllAvailable()
      // cumulative: batch-2 counts merge into the running sketch state
      assert(spark.table("hh_stream").as[(String, Long)].collect().toSet ==
        Set(("a", 2L), ("b", 3L), ("c", 1L)))
    } finally q.stop()
  }
}
