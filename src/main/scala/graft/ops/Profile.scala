package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column profiling — the ANALYZE/data-quality surface: per-column null
 * count, exact distinct count, and lexicographic min/max (values cast to
 * string so one output schema covers every input type; numeric callers
 * wanting numeric extremes profile the raw column themselves).
 *
 * ONE aggregation pass computes every statistic for every requested
 * column (a flat agg list, partial-aggregated map-side), then a `stack`
 * unpivots the single result row into `(col_name, n_nulls, n_distinct,
 * min_value, max_value)` — profiling N columns costs one corpus scan,
 * not N. Exact distinct counts expand per column inside the same
 * aggregate (Spark plans one Expand); for quick-look profiling of very
 * wide tables at the 100 TB end, swap `countDistinct` for
 * `approx_count_distinct` — kept exact here because the driver oracle
 * compares exact values.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val stacked = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.length}, $stacked) AS (col_name, n_nulls, n_distinct, min_value, max_value)")
  }
}
