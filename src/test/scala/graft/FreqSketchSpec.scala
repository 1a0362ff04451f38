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
}
