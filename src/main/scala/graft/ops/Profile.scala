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
    require(cols.distinct == cols, "profile column list contains duplicates")
    // the stack() unpivot splices names into a SQL expression — refuse
    // names that would break or inject into it rather than mis-parse
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "profile column names must not contain backticks or quotes")
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

  /**
   * Fixed-width histogram of a numeric column over `[lo, hi]`: `bins`
   * equal buckets, values outside the range (and nulls) dropped, the
   * closed upper edge clamped into the last bucket. Returns
   * `(bin, bin_lo, bin_hi, cnt)` for NON-EMPTY buckets (dense zero-filled
   * output is a small generate+left-join away; the sparse form is what
   * scales — one hash aggregate, no materialized bucket table).
   *
   * Engine-portable determinism: the bucket width is computed at PLAN TIME
   * in Scala (never `(hi-lo)/bins` inside SQL, where integer-division
   * semantics differ across engines) and the per-row arithmetic is a
   * single subtract/divide/floor chain — IEEE-identical everywhere.
   */
  def histogram(
      df: DataFrame, c: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"hi must exceed lo, got [$lo, $hi]")
    val w = (hi - lo) / bins
    val x = col(c).cast("double")
    df.where(x.isNotNull && x >= lo && x <= hi)
      .withColumn("bin",
        least(lit(bins - 1), floor((x - lit(lo)) / lit(w)).cast("int")))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        col("cnt"))
  }
}
