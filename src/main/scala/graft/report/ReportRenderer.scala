package graft.report

import org.apache.spark.sql.DataFrame

/**
 * S7/S8 — the rendering sink over [[graft.pipeline.FinancialPipeline.chartData]]:
 * one standalone HTML document per user carrying every chart and table the
 * reference renders (category pies `LF:175-222`, monthly bars `LF:283-308`,
 * recurring grouped bars `LF:388-430`, and the PDF's top-3/flagged tables
 * `LF:315-387`) as inline SVG.
 *
 * Scale shape: rendering is a typed `groupByKey(userId).mapGroups` — each
 * group is one user's handful of chart rows, so per-task state is tiny and
 * the render fans out with the user count (10^7 users = 10^7 small groups
 * across the cluster, never a driver loop). Rows are sorted inside the
 * group before drawing, so output is byte-stable regardless of shuffle
 * order.
 */
object ReportRenderer {

  /** Long-format chart row (the [[graft.pipeline.FinancialPipeline.chartData]]
    * schema). `yearMonth` is the statement month, or `"*"` for user-scoped
    * series shared across that user's month documents. */
  final case class ChartRow(
      userId: String, yearMonth: String, chart: String,
      series: String, label: String, value: Double)

  /** One user-month's chart rows → a standalone HTML report document. */
  def renderUser(userId: String, yearMonth: String, rows: Seq[ChartRow]): String = {
    val byChart = rows.groupBy(_.chart)
    def of(c: String): Seq[ChartRow] = byChart.getOrElse(c, Nil)
    val parts = Seq.newBuilder[String]

    val cur = of("category_pie").sortBy(_.label).map(r => r.label -> r.value)
    if (cur.nonEmpty) parts += Svg.pie(cur, "Spending by category")

    val prev = of("category_pie_prev").sortBy(_.label).map(r => r.label -> r.value)
    if (prev.nonEmpty) parts += Svg.pie(prev, "Previous month by category")

    val monthly = of("monthly_trend").sortBy(_.label).map(r => r.label -> r.value)
    if (monthly.nonEmpty) parts += Svg.bars(monthly, "Monthly spending")

    val rec = of("recurring_ytd")
    if (rec.nonEmpty) {
      val ytd = rec.filter(_.series == "ytd").map(r => r.label -> r.value).toMap
      val proj = rec.filter(_.series == "projected").map(r => r.label -> r.value).toMap
      val vendors = (ytd.keySet ++ proj.keySet).toSeq.sorted
      parts += Svg.groupedBars(
        vendors.map(v => (v, ytd.getOrElse(v, 0.0), proj.getOrElse(v, 0.0))),
        "ytd", "projected", "Recurring spend: YTD vs year-end projection")
    }

    val top = of("top_high_value").sortBy(r => (-r.value, r.label))
    if (top.nonEmpty) parts += Svg.table(
      Seq("transaction", "amount"),
      top.map(r => Seq(r.label, f"${r.value}%.2f")),
      "Top high-value transactions")

    val flagged = of("flagged").sortBy(_.label)
    if (flagged.nonEmpty) parts += Svg.table(
      Seq("transaction", "risk level", "amount"),
      flagged.map(r => Seq(r.label, r.series, f"${r.value}%.2f")),
      "Flagged transactions")

    val monthLabel =
      if (yearMonth == FinancialPipelineSharedMonth) "" else s" — $yearMonth"
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">""" +
      s"""<title>Report ${Svg.esc(userId)}${Svg.esc(monthLabel)}</title></head>""" +
      s"""<body><h2>Financial report — user ${Svg.esc(userId)}${Svg.esc(monthLabel)}</h2>""" +
      parts.result().mkString("\n") + "</body></html>"
  }

  private def FinancialPipelineSharedMonth: String =
    graft.pipeline.FinancialPipeline.SharedMonth

  /** Distributed render: chartData (long format) → one `(userId, yearMonth,
    * html)` row per user-month document. Month-scoped rows go to their own
    * month's document; `"*"` rows (monthly trend) are shared into every
    * document of their user — sibling months never mix (the report grain,
    * same as `assembleReport`). */
  def renderAll(chartData: DataFrame): DataFrame = {
    val spark = chartData.sparkSession
    import spark.implicits._
    val shared = FinancialPipelineSharedMonth
    chartData.as[ChartRow]
      .groupByKey(_.userId)
      .flatMapGroups { (uid, it) =>
        val rows = it.toSeq
        val common = rows.filter(_.yearMonth == shared)
        val months = rows.map(_.yearMonth).filter(_ != shared).distinct.sorted
        if (months.isEmpty)
          Iterator.single((uid, shared, renderUser(uid, shared, common)))
        else months.iterator.map { ym =>
          (uid, ym, renderUser(uid, ym, rows.filter(_.yearMonth == ym) ++ common))
        }
      }
      .toDF("userId", "yearMonth", "html")
  }

  /** Report file tree sink: one `userId=<u>/yearMonth=<m>/part-*.txt` HTML
    * document per user-month under `outDir` (any Hadoop filesystem). */
  def write(chartData: DataFrame, outDir: String): Unit =
    renderAll(chartData).write
      .partitionBy("userId", "yearMonth").mode("overwrite").text(outDir)
}
