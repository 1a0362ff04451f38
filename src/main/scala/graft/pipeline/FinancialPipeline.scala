package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.FinOps

/**
 * The full statement-analytics DAG of the reference
 * (`lambda_handler`, LF:483-554), set-based: one distributed pass computes
 * every user-month's report instead of a driver loop over groups (LF:495).
 *
 * Inputs are the canonical transaction frame: `cur` (the freshly ingested
 * statement rows, any number of user-months) and `hist` (flattened history
 * read from the statements table). The reference re-queries history per
 * (user, month) group (LF:496) — here history is read once.
 */
object FinancialPipeline {

  /**
   * All per-statement analytics — the engine-side results the report is
   * assembled from.
   *
   * Multi-month-batch semantics: previous-month, top-K, and recurring YTD
   * (+ projection) are computed per `(userId, statement yearMonth)` group,
   * exactly like the reference's per-group loop — each group scoped to its
   * own month/year. The union-scoped analytics (monthly spending, trend) see
   * ALL of the batch's months at once, where the reference — processing
   * groups sequentially against a not-yet-updated table — would hide a
   * user's sibling new months from each other. That order-dependent behavior
   * is not reproducible set-based and the set-based result is the more
   * useful one; documented divergence.
   */
  final case class Results(
      flagged: DataFrame,          // F2+C1+C2+C3
      spendingByCategory: DataFrame, // A5 (current month)
      previousMonth: DataFrame,    // P7+F4+A8
      highValue: DataFrame,        // F1
      topHighValue: DataFrame,     // O1
      recurring: DataFrame,        // J4+F3+A6 (+P9 projection)
      monthly: DataFrame,          // A7
      trend: DataFrame)            // O2

  def analyze(cur: DataFrame, hist: DataFrame, spark: SparkSession): Results = {
    val all = cur.unionByName(hist) // J4
    val home = FinOps.homeCountry(hist, spark) // A4 over history (LF:498)
    val avg = FinOps.historicalAveragePerUser(hist) // A3 over history (LF:499)

    // Recurring YTD per (user, statement month), each scoped to its own
    // statement's year; months elapsed = the statement month's number (LF:392).
    val rec = FinOps.recurringYtdByStatement(cur, hist)
      .withColumn("m_elapsed", substring(col("target_ym"), 5, 2).cast("int"))
    val recProjected = FinOps.projectYearEnd(rec, "ytd_total", "m_elapsed")

    Results(
      flagged = FinOps.flagRisky(cur, home, avg, spark),
      spendingByCategory = FinOps.spendingByCategory(cur),
      previousMonth = FinOps.previousMonthByStatement(all, cur),
      highValue = FinOps.highValue(cur, avg),
      topHighValue = FinOps.topHighValue(cur, 3, Seq("userId", "yearMonth")),
      recurring = recProjected,
      monthly = FinOps.monthlySpending(all),
      trend = FinOps.classifyTrend(FinOps.monthlySpending(all)))
  }

  /**
   * S6 — report assembly: one row per (userId, statement month) carrying the
   * reference report's fields (LF:511-521) as typed nested columns, ready for
   * `df.write.json`.
   *
   * Per-month components (category spend, previous month, recurring, top-K,
   * flags) are grouped and joined on the FULL report key `(userId, yearMonth)`
   * — grouping them by user alone would merge sibling months of a multi-month
   * batch into one `map_from_entries` (duplicate-key crash under Spark's
   * default EXCEPTION dedup policy). The union-scoped components (monthly
   * spending map, trend) are one row per user by construction and legitimately
   * shared across that user's month rows.
   *
   * No explicit broadcast hints: every roll-up here scales with the user
   * count, so a forced build-side would OOM the driver at 10^7+ users. All
   * joins share the report-key partitioning (one shuffle reused); AQE promotes
   * genuinely small sides to broadcast at runtime.
   */
  def assembleReport(cur: DataFrame, results: Results): DataFrame = {
    val keys = cur.select(col("userId"), col("yearMonth")).distinct()
    val mk = Seq("userId", "yearMonth")

    def mapOf(df: DataFrame, key: Column, value: Column, name: String): DataFrame =
      df.groupBy(mk.map(col): _*)
        .agg(map_from_entries(sort_array(collect_list(struct(key, value)))).as(name))

    val cat = mapOf(results.spendingByCategory, col("category"), col("total"), "spending_by_category")
    val prev = mapOf(results.previousMonth.withColumnRenamed("target_ym", "yearMonth"),
      col("category"), col("total"), "previous_month")
    val recur = results.recurring.withColumnRenamed("target_ym", "yearMonth")
      .groupBy(mk.map(col): _*)
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("vendor"), struct(col("ytd_total"), col("projected")))))).as("recurring"))
    val top = results.topHighValue
      .groupBy(mk.map(col): _*)
      .agg(sort_array(collect_list(struct(col("rank"), col("id"), col("amount").cast("double").as("amount"))))
        .as("top_high_value"))
    val flags = results.flagged
      .groupBy(mk.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("transaction_id"), col("country"), col("risk_level"), col("amount"), col("explanation"))))
        .as("flagged_transactions"))
    val monthly = results.monthly
      .groupBy("userId")
      .agg(map_from_entries(sort_array(collect_list(struct(col("ym"), col("total")))))
        .as("monthly_spending"))

    val perMonth = Seq(cat, prev, recur, top, flags)
      .foldLeft(keys)((acc, df) => acc.join(df, mk, "left"))
    Seq(monthly, results.trend)
      .foldLeft(perMonth)((acc, df) => acc.join(df, Seq("userId"), "left"))
  }

  /**
   * S7/S8 data layer — the chart models the reference renders (pie of
   * current vs previous category spend LF:175-222, monthly bar+line
   * LF:283-308, recurring grouped bars LF:388-430, and the PDF's top-3 /
   * flagged tables LF:315-387) as one long-format DataFrame:
   * `(userId, yearMonth, chart, series, label, value)`.
   *
   * `yearMonth` is the statement month the row belongs to — the report
   * grain, matching [[assembleReport]]; without it a multi-month batch
   * would mix sibling months' values under one vendor/category label. The
   * user-scoped monthly-trend series (it spans ALL months by definition)
   * carries the sentinel `"*"` and is shared across that user's documents.
   * Rendering (PNG/PDF vs SVG/HTML) is presentation; everything a renderer
   * needs is here, including pie percentages.
   */
  val SharedMonth = "*"

  def chartData(results: Results): DataFrame = {
    def part(df: DataFrame, ym: Column, chart: String,
             series: Column, label: Column, value: Column) =
      df.select(
        col("userId"), ym.as("yearMonth"), lit(chart).as("chart"),
        series.as("series"), label.as("label"), value.cast("double").as("value"))

    val curPie = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("userId", "yearMonth")
      results.spendingByCategory
        .withColumn("pct", col("total") / sum(col("total")).over(w) * 100)
        .select(
          col("userId"), col("yearMonth"), lit("category_pie").as("chart"),
          lit("current").as("series"), col("category").as("label"), col("pct").as("value"))
    }
    Seq(
      part(results.previousMonth, col("target_ym"), "category_pie_prev",
        lit("previous"), col("category"), col("total")),
      part(results.monthly, lit(SharedMonth), "monthly_trend",
        lit("total"), col("ym"), col("total")),
      part(results.recurring, col("target_ym"), "recurring_ytd",
        lit("ytd"), col("vendor"), col("ytd_total")),
      part(results.recurring, col("target_ym"), "recurring_ytd",
        lit("projected"), col("vendor"), col("projected")),
      part(results.topHighValue, col("yearMonth"), "top_high_value",
        lit("amount"), col("id"), col("amount")),
      part(results.flagged, col("yearMonth"), "flagged",
        col("risk_level"), col("transaction_id"), col("amount"))
    ).foldLeft(curPie)(_ unionByName _)
  }

  /**
   * One batch run end-to-end (the body of `lambda_handler` minus AWS):
   * ingest → analyze against the statements table → write the report (JSON,
   * S6) → upsert the new statement items (S5, last-writer-wins per
   * user-month partition).
   */
  def runBatch(
      statement: DataFrame,
      statementsPath: String,
      reportPath: Option[String],
      spark: SparkSession,
      reportMode: String = "append"): Results = {
    // Materialize history before the upsert below rewrites the table the
    // lazy plans would otherwise re-scan.
    val hist = loadHistory(spark, statementsPath).persist()
    hist.count()
    val results = analyze(statement, hist, spark)
    // reportMode "overwrite" + a caller-owned per-batch directory is the
    // idempotent form (what the streaming path uses for replay safety);
    // the default appends into one report directory across batch calls.
    reportPath.foreach(p =>
      assembleReport(statement, results).write.mode(reportMode).json(p))
    FinOps.upsertStatements(FinOps.toStatementItems(statement), statementsPath, spark)
    results
  }

  /** Flattened full history from the statements table (empty frame with the
    * right schema when the table does not exist yet). */
  def loadHistory(spark: SparkSession, statementsPath: String): DataFrame = {
    // Partition columns come back type-inferred (numeric-looking userIds
    // become ints); restore the canonical string key.
    if (FinOps.tableExists(spark, statementsPath))
      FinOps.explodeStatements(
        spark.read.parquet(statementsPath)
          .withColumn("userId", col("userId").cast("string")))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.Transaction.schema)
  }
}
