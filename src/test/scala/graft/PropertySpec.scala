package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.ops.FinOps

/**
 * Algebraic property tests (SURVEY §5 item 4), ScalaCheck-generated data
 * under a fixed seed, evaluated in one Spark batch per property (per-sample
 * Spark jobs would be prohibitively slow).
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed = rng.Seed(42L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  private val txGen = for {
    user <- Gen.chooseNum(1, 8)
    month <- Gen.chooseNum(1, 12)
    cat <- Gen.oneOf("a", "b", "c")
    cents <- Gen.chooseNum(1L, 1000000L)
  } yield (user.toString, f"2024$month%02d", cat, cents / 100.0)

  private def txDf(rows: Seq[(String, String, String, Double)]) =
    rows.zipWithIndex.map { case ((u, ym, c, amt), i) => (u, ym, i.toString, c, amt) }
      .toDF("userId", "yearMonth", "id", "category", "amount0")
      .select($"userId", $"yearMonth", $"id",
        to_date(concat($"yearMonth", lit("15")), "yyyyMMdd").as("date"),
        lit("v").as("vendor"), $"category",
        $"amount0".cast("decimal(12,2)").as("amount"),
        lit("USD").as("currency"), lit(true).as("recurring"),
        lit("t").as("txType"), lit("US-CA").as("location"), lit("d").as("description"))

  test("property: category totals partition the per-user total (A5 vs A3·count)") {
    val df = txDf(sample(txGen, 300)).cache()
    val byCat = FinOps.spendingByCategory(df, Seq("userId"))
      .groupBy("userId").agg(round(sum($"total"), 2).as("cat_sum"))
    val direct = df.groupBy("userId")
      .agg(sum(FinOps.money($"amount")).cast("double").as("total"))
    val joined = byCat.join(direct, "userId")
      .where(round($"cat_sum", 2) =!= round($"total", 2))
    assert(joined.isEmpty)
  }

  test("property: prevYearMonth is the inverse of +1 month for arbitrary months") {
    val yms = sample(for {
      y <- Gen.chooseNum(1990, 2030); m <- Gen.chooseNum(1, 12)
    } yield f"$y$m%02d", 200).distinct
    val df = yms.toDF("ym")
      .withColumn("next", date_format(add_months(to_date(concat($"ym", lit("01")), "yyyyMMdd"), 1), "yyyyMM"))
      .withColumn("back", FinOps.prevYearMonth($"next"))
    assert(df.where($"back" =!= $"ym").isEmpty)
  }

  test("property: top-k is a subset of the input and dominates every non-member") {
    val df = txDf(sample(txGen, 200)).cache()
    val top = FinOps.topHighValue(df, 3)
    // every top row exists in the input
    assert(top.select("userId", "id").exceptAll(df.select("userId", "id")).isEmpty)
    // no non-member strictly exceeds a member (per user)
    val maxNon = df.join(top.select("userId", "id"), Seq("userId", "id"), "left_anti")
      .groupBy("userId").agg(max($"amount".cast("double")).as("best_rest"))
    val minTop = top.groupBy("userId").agg(min($"amount".cast("double")).as("worst_top"), count(lit(1)).as("k"))
    val bad = minTop.where($"k" === 3).join(maxNon, "userId")
      .where($"best_rest" > $"worst_top")
    assert(bad.isEmpty)
  }

  test("property: monthly spending is invariant under union order (J4 commutativity)") {
    val rows = sample(txGen, 300)
    val (l, r) = rows.splitAt(rows.size / 2)
    val a = txDf(l); val b = txDf(r)
    val ab = FinOps.monthlySpending(a.unionByName(b))
    val ba = FinOps.monthlySpending(b.unionByName(a))
    assert(ab.exceptAll(ba).isEmpty && ba.exceptAll(ab).isEmpty)
  }
}
