package graft

import org.apache.spark.sql.functions._

import graft.ops.FinOps
import graft.pipeline.FinancialPipeline

/**
 * Golden end-to-end tests: the full pipeline over the three reference fixture
 * statements, asserted against hand-computed goldens derived from the
 * reference semantics (SURVEY §2; values recomputed independently from the
 * CSVs).
 */
class PipelineGoldenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val statement =
    FinOps.ingestStatement(spark, "/root/reference/test_data/*.csv").cache()

  private def emptyHist = statement.where(lit(false))

  test("golden: spending by category per user") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val cat = res.spendingByCategory
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
    assert(cat(("1", "Groceries")) == 160.0)
    assert(cat(("1", "Entertainment")) == 42.48)
    assert(cat(("1", "Shopping")) == 248.35)
    assert(cat(("2", "Shopping")) == 373.75)
    assert(cat(("2", "Health & Wellness")) == 75.0)
    assert(cat(("3", "Shopping")) == 593.35)
    assert(cat(("3", "Food & Beverages")) == 43.0)
  }

  test("golden: cold start (no history) flags everything High Risk") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val flags = res.flagged.collect()
    assert(flags.length == 36) // all 12 rows of each user
    assert(flags.forall(_.getAs[String]("risk_level") == "High Risk"))
    assert(res.trend.collect().forall(_.getString(1) == "Not enough data"))
  }

  test("golden: with seeded history — home country, average, flags") {
    val dir = tmpDir("stmts")
    FinOps.writeStatements(FinOps.toStatementItems(statement), dir)
    val hist = FinancialPipeline.loadHistory(spark, dir)
    val res = FinancialPipeline.analyze(statement, hist, spark)

    val home = FinOps.homeCountry(hist, spark)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(home == Map("1" -> "United States", "2" -> "Canada", "3" -> "Canada"))

    val avg = FinOps.historicalAveragePerUser(hist)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avg == Map("1" -> 43.82, "2" -> 51.19, "3" -> 70.03))

    val flags = res.flagged
      .collect().groupBy(_.getAs[String]("userId"))
      .view.mapValues(_.map(r =>
        (r.getAs[String]("transaction_id"), r.getAs[String]("country"), r.getAs[String]("risk_level")))
        .toSet).toMap
    assert(flags("1") == Set(("1012", "Algeria", "High Risk"))) // 75 > 43.82
    assert(flags("2") == Set(("2009", "France", "High Risk"))) // 150 > 51.19
    assert(flags("3").size == 2) // DZ + US rows both foreign for a CA home
    assert(flags("3").exists { case (_, c, r) => c == "Algeria" && r == "High Risk" }) // 250 > 70.03
  }

  test("golden: recurring YTD totals and year-end projection (December ⇒ identity)") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val rec = res.recurring.where($"userId" === "1")
      .collect().map(r => r.getAs[String]("vendor") ->
        (r.getAs[Double]("ytd_total"), r.getAs[Double]("projected"))).toMap
    assert(rec == Map(
      "Apple.com/Bill" -> (3.35, 3.35),
      "Gym Membership" -> (55.0, 55.0),
      "Netflix" -> (13.99, 13.99),
      "Spotify" -> (9.99, 9.99)))
  }

  test("golden: top-3 high value per user with id tie-break") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val top = res.topHighValue
      .orderBy("userId", "rank")
      .select("userId", "id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top.toSeq == Seq(
      ("1", "1006"), ("1", "1005"), ("1", "1012"), // 75.0 tie → 1005 before 1012
      ("2", "2009"), ("2", "2006"), ("2", "2008"),
      ("3", "3012"), ("3", "3008"), ("3", "3005")))
  }

  test("golden: multi-month history drives previous-month selection and an Up trend") {
    // History: the same statements shifted to 202410 (amounts ×0.25) and
    // 202411 (×0.5) — monthly totals strictly increase into 202412.
    def shifted(months: Int, scale: Double) = statement
      .withColumn("yearMonth", date_format(add_months(to_date(concat($"yearMonth", lit("01")), "yyyyMMdd"), -months), "yyyyMM"))
      .withColumn("date", add_months($"date", -months))
      .withColumn("amount", ($"amount" * scale).cast("decimal(12,2)"))
      .withColumn("id", concat($"id", lit(s"_m$months")))
    val hist = shifted(2, 0.25).unionByName(shifted(1, 0.5))
    val dir = tmpDir("stmts_multi")
    FinOps.writeStatements(FinOps.toStatementItems(hist), dir)

    val loaded = FinancialPipeline.loadHistory(spark, dir)
    assert(loaded.count() == 72) // 2 months × 36 rows round-tripped
    val res = FinancialPipeline.analyze(statement, loaded, spark)

    // trend: three strictly increasing months per user
    val trend = res.trend.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(trend == Map("1" -> "Up", "2" -> "Up", "3" -> "Up"))

    // previous-month selection picks exactly the 202411 rows
    val prev = res.previousMonth
      .select("userId", "category", "total")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val expected = FinOps.spendingByCategory(shifted(1, 0.5), Seq("userId"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(prev == expected && prev.nonEmpty)
  }

  test("golden: a batch carrying two months for one user reports per month") {
    // user 1's December statement plus a January statement in the SAME batch
    val jan = statement.where($"userId" === "1")
      .withColumn("yearMonth", lit("202501"))
      .withColumn("date", add_months($"date", 1))
      .withColumn("id", concat($"id", lit("_jan")))
    val batch = statement.unionByName(jan)
    val res = FinancialPipeline.analyze(batch, emptyHist, spark)

    // top-K is per statement month: user 1 gets 3 + 3, others 3
    val topCounts = res.topHighValue.groupBy("userId", "yearMonth").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(topCounts(("1", "202412")) == 3 && topCounts(("1", "202501")) == 3)
    assert(topCounts(("2", "202412")) == 3)

    // the January group's previous month is December (present in the batch)
    val prevJan = res.previousMonth
      .where($"userId" === "1" && $"target_ym" === "202501")
      .collect().map(r => r.getAs[String]("category") -> r.getAs[Double]("total")).toMap
    assert(prevJan("Groceries") == 160.0 && prevJan.size == 5)
    // December has no previous month in a cold start
    assert(res.previousMonth.where($"target_ym" === "202412").isEmpty)

    // recurring YTD is scoped to each statement's own year: the January
    // statement (2025 dates) must not absorb the December (2024) totals
    val recByMonth = res.recurring.where($"userId" === "1")
      .groupBy("target_ym").agg(sum($"ytd_total").as("s"))
      .collect().map(r => r.getAs[String]("target_ym") -> r.getAs[Double]("s")).toMap
    assert(recByMonth.keySet == Set("202412", "202501"))
    assert(recByMonth("202412") == recByMonth("202501")) // same rows, shifted

    // report assembly: one row per user-month; sibling months must not merge
    // (grouping by user alone threw 'duplicate map key' here)
    val report = FinancialPipeline.assembleReport(batch, res).cache()
    assert(report.count() == 4) // u1×2 months + u2 + u3
    val repDec = report.where($"userId" === "1" && $"yearMonth" === "202412").collect()(0)
    val repJan = report.where($"userId" === "1" && $"yearMonth" === "202501").collect()(0)
    assert(repDec.getAs[Map[String, Double]]("spending_by_category")("Groceries") == 160.0)
    assert(repJan.getAs[Map[String, Double]]("spending_by_category").size == 5)
    assert(repJan.getAs[Map[String, Double]]("previous_month")("Groceries") == 160.0)
    assert(repDec.isNullAt(repDec.fieldIndex("previous_month"))) // cold start
    assert(repJan.getAs[scala.collection.Seq[Any]]("top_high_value").size == 3)

    // chart data and rendering follow the same grain: one document per
    // statement month, each with its own recurring series (mixing sibling
    // months under one vendor label was the pre-fix failure mode)
    val charts = FinancialPipeline.chartData(res)
    val recMonths = charts
      .where($"chart" === "recurring_ytd" && $"userId" === "1")
      .select("yearMonth").distinct().as[String].collect().toSet
    assert(recMonths == Set("202412", "202501"))
    val rendered = graft.report.ReportRenderer.renderAll(charts)
    assert(rendered.count() == 4) // u1×2 months + u2 + u3
  }

  test("report assembly adds no broadcast hints of its own (AQE decides at runtime)") {
    // Per-user roll-ups scale with user count: a forced build-side OOMs the
    // driver at 10^7 users. The only hints in the final plan must be the ones
    // already inside the Results lineage (the fixed 249-row ISO dimension).
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def nHints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val report = FinancialPipeline.assembleReport(statement, res)
    val inherited = Seq(
      res.spendingByCategory, res.previousMonth, res.recurring,
      res.topHighValue, res.flagged, res.monthly, res.trend).map(nHints).sum
    assert(nHints(report) == inherited)
  }

  test("golden: chart data carries every series the reference renders") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val charts = FinancialPipeline.chartData(res).cache()
    val kinds = charts.select("chart").distinct().as[String].collect().toSet
    assert(kinds == Set(
      "category_pie", "category_pie_prev", "monthly_trend",
      "recurring_ytd", "top_high_value", "flagged")
      - "category_pie_prev") // no previous month in the cold scenario
    // pie percentages sum to 100 per user
    val pies = charts.where($"chart" === "category_pie")
      .groupBy("userId").agg(round(sum($"value"), 6).as("s"))
    assert(pies.collect().forall(_.getDouble(1) == 100.0))
  }

  test("golden: report assembly carries all components as one row per user-month") {
    val res = FinancialPipeline.analyze(statement, emptyHist, spark)
    val report = FinancialPipeline.assembleReport(statement, res)
    val rows = report.collect()
    assert(rows.length == 3)
    val u1 = report.where($"userId" === "1").collect()(0)
    val cat = u1.getAs[Map[String, Double]]("spending_by_category")
    assert(cat("Groceries") == 160.0 && cat.size == 5)
    assert(u1.getAs[String]("trend") == "Not enough data")
    assert(u1.getAs[scala.collection.Seq[Any]]("top_high_value").size == 3)
    assert(u1.getAs[scala.collection.Seq[Any]]("flagged_transactions").size == 12)
  }
}
