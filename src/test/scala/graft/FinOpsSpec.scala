package graft

import org.apache.spark.sql.functions._

import graft.ops.FinOps

/** Unit tests for the reference-semantics traps (SURVEY §5 item 3, §7.4). */
class FinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def txRows(rows: (String, String, String, String, String, Double, Boolean, String)*) =
    rows.toDF("userId", "yearMonth", "id", "date0", "category", "amount0", "recurring", "location")
      .select(
        $"userId", $"yearMonth", $"id",
        to_date($"date0").as("date"),
        lit("v").as("vendor"), $"category",
        $"amount0".cast("decimal(12,2)").as("amount"),
        lit("USD").as("currency"), $"recurring",
        lit("t").as("txType"), $"location", lit("d").as("description"))

  test("P8: amounts are rounded BEFORE summation (sum-of-rounded)") {
    // 10.004 + 10.004: round-then-sum = 20.00; sum-then-round would be 20.01
    val df = Seq(("u", "202401", "1", "2024-01-01", "c", 10.004, false, "US-CA"),
                 ("u", "202401", "2", "2024-01-02", "c", 10.004, false, "US-CA"))
    val out = FinOps.spendingByCategory(txRows(df: _*)).select("total").as[Double].collect()
    assert(out.toSeq == Seq(20.00))
  }

  test("A4: mode tie-break is (count desc, value asc)") {
    val df = Seq(("u", "B"), ("u", "A"), ("u", "C"), ("u", "A"), ("u", "B")).toDF("userId", "v")
    val out = FinOps.modeBy(df, "userId", "v", "m").select("m").as[String].collect()
    assert(out.toSeq == Seq("A")) // A and B both count 2 → A wins
  }

  test("P7: previous-month arithmetic rolls over January") {
    val df = Seq("202501", "202401", "202403", "202412").toDF("ym")
      .select(FinOps.prevYearMonth($"ym").as("prev"))
    assert(df.as[String].collect().toSeq == Seq("202412", "202312", "202402", "202411"))
  }

  test("A3: average is round-half-up of the exact rational; empty history = 0") {
    // (10.00 + 10.01)/2 = 10.005 → half-up → 10.01 (float round would give 10.0)
    val df = Seq(("u", "202401", "1", "2024-01-01", "c", 10.00, false, "US-CA"),
                 ("u", "202401", "2", "2024-01-02", "c", 10.01, false, "US-CA"))
    val avg = FinOps.historicalAveragePerUser(txRows(df: _*))
      .select("avg_amount").as[Double].collect()
    assert(avg.toSeq == Seq(10.01))
    val empty = FinOps.historicalAverage(txRows(df: _*).where(lit(false)))
      .select("avg_amount").as[Double].collect()
    assert(empty.toSeq == Seq(0.0))
  }

  test("P9: year-end projection is ytd*12/m with exact half-up rounding") {
    val df = Seq((100.01, 8)).toDF("ytd_total", "m_elapsed")
    val out = FinOps.projectYearEnd(df, "ytd_total", "m_elapsed")
      .select("projected").as[Double].collect()
    // 12 * 10001 / 8 cents = 15001.5 → 15002 → 150.02
    assert(out.toSeq == Seq(150.02))
    // December statement (m=12) projects exactly the ytd
    val dec = Seq((55.55, 12)).toDF("ytd_total", "m_elapsed")
    assert(FinOps.projectYearEnd(dec, "ytd_total", "m_elapsed")
      .select("projected").as[Double].collect().toSeq == Seq(55.55))
  }

  test("O2: trend needs strict monotonicity over the latest 3 months") {
    val monthly = Seq(
      ("up", "202401", 1.0), ("up", "202402", 2.0), ("up", "202403", 3.0),
      ("down", "202401", 3.0), ("down", "202402", 2.0), ("down", "202403", 1.0),
      ("flat", "202401", 2.0), ("flat", "202402", 2.0), ("flat", "202403", 3.0),
      ("short", "202401", 1.0), ("short", "202402", 2.0),
      // 4 months: only the latest 3 count → 5,1,9 from the last three → Stable
      ("older", "202401", 0.5), ("older", "202402", 5.0), ("older", "202403", 1.0), ("older", "202404", 9.0)
    ).toDF("userId", "ym", "total")
    val out = FinOps.classifyTrend(monthly).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map(
      "up" -> "Up", "down" -> "Down", "flat" -> "Stable",
      "short" -> "Not enough data", "older" -> "Stable"))
  }

  test("O2: typed TrendAggregator agrees with the window-based classifier") {
    val monthly = FinOps.monthlySpending(txRows(
      (1 to 8).map(m => ("u1", f"2024$m%02d", m.toString, f"2024-$m%02d-10", "c", m * 10.0, false, "US-CA")) ++
      (1 to 4).map(m => ("u2", f"2024$m%02d", s"b$m", f"2024-$m%02d-10", "c", 50.0 - m, false, "US-CA")) ++
      Seq(("u3", "202401", "z1", "2024-01-10", "c", 5.0, false, "US-CA")): _*))
    val fromWindow = FinOps.classifyTrend(monthly)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val fromAgg = monthly.as[(String, String, Double)]
      .groupByKey(_._1)
      .agg(graft.ops.TrendAggregator.toColumn.name("trend"))
      .collect().toMap
    assert(fromAgg == fromWindow)
    assert(fromAgg == Map("u1" -> "Up", "u2" -> "Down", "u3" -> "Not enough data"))
  }

  test("O1: top-k breaks amount ties by id ascending") {
    val df = txRows(
      ("u", "202401", "9", "2024-01-01", "c", 75.0, false, "US-CA"),
      ("u", "202401", "2", "2024-01-02", "c", 75.0, false, "US-CA"),
      ("u", "202401", "5", "2024-01-03", "c", 120.0, false, "US-CA"),
      ("u", "202401", "7", "2024-01-04", "c", 10.0, false, "US-CA"))
    val out = FinOps.topHighValue(df, 3).orderBy("rank").select("id").as[String].collect()
    assert(out.toSeq == Seq("5", "2", "9"))
  }

  test("F2: null home country (no history) marks every transaction foreign, avg 0 ⇒ High Risk") {
    val cur = txRows(("u", "202401", "1", "2024-01-01", "c", 5.0, false, "US-CA"))
    val empty = cur.where(lit(false))
    val out = FinOps.flagRisky(
      cur, FinOps.homeCountry(empty, spark), FinOps.historicalAveragePerUser(empty), spark)
    val rows = out.select("transaction_id", "home_country", "average_amount", "risk_level").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(1) && rows(0).getDouble(2) == 0.0 && rows(0).getString(3) == "High Risk")
  }

  test("J1: unknown country codes drop (reference would crash); known resolve") {
    val df = txRows(
      ("u", "202401", "1", "2024-01-01", "c", 5.0, false, "XX-??"),
      ("u", "202401", "2", "2024-01-01", "c", 5.0, false, "DZ-ALG"))
    val out = FinOps.resolveCountry(df, spark).select("id", "country").as[(String, String)].collect()
    assert(out.toSeq == Seq(("2", "Algeria")))
  }

  test("S2: validateStatement quarantines bad rows instead of aborting the load") {
    val raw = Seq(
      ("1", "202412", "t1", "2024-12-01", "55.00", "true", "US-CA"),
      ("1", "202412", "t2", "not-a-date", "10.00", "true", "US-CA"),
      ("1", "202412", "t3", "2024-12-02", "oops", "false", "US-CA"),
      ("1", "2024xx", "t4", "2024-12-03", "10.00", "false", "US-CA"),
      ("1", "202412", "t5", "2024-12-04", "10.00", "false", "narnia"))
      .toDF("UserId", "YearMonth", "id0", "date0", "amount0", "rec0", "loc0")
      .select(
        col("UserId"), col("YearMonth"),
        col("id0").as("transactions.id"), col("date0").as("transactions.date"),
        lit("v").as("transactions.vendor"), lit("c").as("transactions.category"),
        col("amount0").as("transactions.amount"), lit("USD").as("transactions.currency"),
        col("rec0").as("transactions.recurring"), lit("t").as("transactions.type"),
        col("loc0").as("transactions.location"), lit("d").as("transactions.description"))
    val normalized = FinOps.normalizeStatement(raw)
    val (valid, rejects) = FinOps.validateStatement(normalized)
    assert(valid.select("id").as[String].collect().toSeq == Seq("t1"))
    val reasons = rejects.select("id", "_reject_reason").as[(String, String)].collect().toMap
    assert(reasons == Map(
      "t2" -> "unparseable date", "t3" -> "unparseable amount",
      "t4" -> "bad yearMonth", "t5" -> "bad location"))
  }

  test("S2: ingest parses the BOM'd reference fixture with typed coercions") {
    val df = FinOps.ingestStatement(spark, "/root/reference/test_data/user_1_new_statement202412.csv")
    assert(df.count() == 12)
    val r = df.where($"id" === "1001").collect()(0)
    assert(r.getAs[String]("userId") == "1")
    assert(r.getAs[java.math.BigDecimal]("amount").doubleValue() == 55.0)
    assert(r.getAs[Boolean]("recurring"))
    assert(r.getAs[java.sql.Date]("date").toString == "2024-12-01")
  }
}
