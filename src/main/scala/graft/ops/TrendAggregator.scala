package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: up to the 3 latest (ym, total), ym-descending. */
case class TrendBuf(months: Seq[MonthTotal])
case class MonthTotal(ym: String, total: Double)

/**
 * Typed single-pass trend classifier — the `Aggregator[IN, BUF, OUT]` form of
 * [[FinOps.classifyTrend]] (SURVEY §7.3 flagged this as the one place a
 * custom typed aggregate is a reasonable convenience): feed `(userId,
 * yearMonth, monthlyTotal)` rows, get the reference's 3-point label
 * (LF:269-276) without a ranked window — the buffer keeps only the latest
 * three months, so per-group state is O(1) and the aggregate is fully
 * partial-aggregatable (merge combines two top-3 buffers).
 *
 * Usage (typed API):
 * {{{
 *   monthly.as[(String, String, Double)]          // (userId, ym, total)
 *     .groupByKey(_._1)
 *     .agg(TrendAggregator.toColumn.name("trend"))
 * }}}
 */
object TrendAggregator extends Aggregator[(String, String, Double), TrendBuf, String] {

  override def zero: TrendBuf = TrendBuf(Seq.empty)

  private def top3(ms: Seq[MonthTotal]): Seq[MonthTotal] =
    ms.sortBy(_.ym)(Ordering[String].reverse).take(3)

  override def reduce(buf: TrendBuf, in: (String, String, Double)): TrendBuf =
    TrendBuf(top3(buf.months :+ MonthTotal(in._2, in._3)))

  override def merge(a: TrendBuf, b: TrendBuf): TrendBuf =
    TrendBuf(top3(a.months ++ b.months))

  override def finish(buf: TrendBuf): String = buf.months match {
    case Seq(m0, m1, m2) =>
      if (m0.total > m1.total && m1.total > m2.total) "Up"
      else if (m0.total < m1.total && m1.total < m2.total) "Down"
      else "Stable"
    case _ => "Not enough data"
  }

  override def bufferEncoder: Encoder[TrendBuf] = Encoders.product[TrendBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
