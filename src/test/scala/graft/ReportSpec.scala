package graft

import org.apache.spark.sql.functions._

import graft.ops.FinOps
import graft.pipeline.FinancialPipeline
import graft.report.{ReportRenderer, Svg}

/** S7/S8 rendering layer: SVG primitives + the distributed per-user HTML
  * report over the reference fixtures. */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val statement =
    FinOps.ingestStatement(spark, "/root/reference/test_data/*.csv").cache()

  test("SVG primitives: pie slices, escaped labels, zero-total guard") {
    val pie = Svg.pie(Seq("Food & Drink" -> 60.0, "Rent" -> 40.0), "t")
    assert(pie.count(_ == '<') > 3 && pie.contains("<path"))
    assert(pie.contains("Food &amp; Drink") && pie.contains("(60.00%)"))
    assert(Svg.pie(Nil, "t").contains("no data"))
    assert(Svg.pie(Seq("only" -> 5.0), "t").contains("<circle")) // single slice
    val bars = Svg.bars(Seq("202411" -> 10.0, "202412" -> 20.0), "m")
    assert(bars.count(_ == '<') > 3 && bars.split("<rect").length == 3)
  }

  test("distributed render: one byte-stable HTML report per user") {
    val res = FinancialPipeline.analyze(statement, statement.where(lit(false)), spark)
    val charts = FinancialPipeline.chartData(res)
    val rendered = ReportRenderer.renderAll(charts).cache()
    assert(rendered.count() == 3)
    val u1 = rendered.where($"userId" === "1").select("html").as[String].collect()(0)
    assert(u1.startsWith("<!DOCTYPE html>"))
    assert(u1.contains("Spending by category") && u1.contains("Monthly spending"))
    assert(u1.contains("Flagged transactions") && u1.contains("Top high-value"))
    assert(u1.contains("<svg ") && u1.contains("<table "))
    // 5 categories for user 1 ⇒ 5 pie slices
    assert(u1.split("<path").length - 1 >= 5)
    // deterministic: a second render is byte-identical
    val again = ReportRenderer.renderAll(charts)
      .where($"userId" === "1").select("html").as[String].collect()(0)
    assert(again == u1)
  }

  test("report file tree: one html document per user-month partition") {
    val res = FinancialPipeline.analyze(statement, statement.where(lit(false)), spark)
    val dir = tmpDir("html_reports")
    ReportRenderer.write(FinancialPipeline.chartData(res), dir)
    val doc = spark.read.text(dir + "/userId=2/yearMonth=202412")
      .as[String].collect().mkString
    assert(doc.contains("Financial report") && doc.contains("<svg "))
  }
}
