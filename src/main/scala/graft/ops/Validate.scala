package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data validation and repair — the contract-enforcement pass a pipeline
 * runs BEFORE expensive downstream work (training-data builds amplify
 * upstream nulls/orphans/outliers into silent model damage):
 * referential-integrity audits, one-pass constraint reports, quantile
 * winsorization, and group-median imputation. Everything here is exact
 * integer/order-statistic arithmetic, so every report is oracle-replayable.
 */
object Validate {

  /**
   * Referential-integrity audit: child rows whose `fkCol` has no match in
   * `parent.pkCol` — one summary row
   * `(n_child, n_orphan_rows, n_orphan_keys)` (null FKs are not orphans:
   * SQL's optional-relationship convention; count them via
   * [[constraintReport]] if the contract forbids null).
   *
   * Shape at scale: the parent side collapses to DISTINCT keys before any
   * join (a fact-to-dimension audit never shuffles the fact against the
   * raw dimension), the orphan check is a LEFT ANTI join on the key —
   * broadcast when the key set is small, shuffle otherwise, never a
   * row-multiplying join — and the child is scanned once.
   */
  def refIntegrity(
      child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val keys = parent.where(col(pkCol).isNotNull)
      .select(col(pkCol).as("_pk")).distinct()
    val orphans = child.where(col(fkCol).isNotNull)
      .select(col(fkCol).as("_fk"))
      .join(keys, col("_fk") === col("_pk"), "left_anti")
      .agg(
        count(lit(1)).as("n_orphan_rows"),
        count_distinct(col("_fk")).as("n_orphan_keys"))
    child.agg(count(lit(1)).as("n_child")).crossJoin(broadcast(orphans))
  }

  /**
   * One-pass constraint report: each named predicate's VIOLATION count
   * (rows where the predicate is false or null — an unevaluable contract
   * is a broken contract), plus the scanned total, as
   * `(constraint, n_rows, n_violations)` rows. ONE aggregate over one
   * corpus scan regardless of how many constraints ride along — the
   * contract list widens the aggregate, never adds a pass.
   */
  def constraintReport(
      df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "constraintReport requires at least one constraint")
    val names = constraints.map(_._1)
    require(names.distinct == names, s"duplicate constraint names: $names")
    require(names.forall(n => !n.contains("'") && !n.contains("`")),
      "constraint names must not contain quotes or backticks")
    val aggs = count(lit(1)).as("_n") +: constraints.map { case (name, pred) =>
      count(when(not(coalesce(pred, lit(false))), 1)).as(s"_v_$name")
    }
    val stacked = constraints.map { case (name, _) => s"'$name', `_v_$name`" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${constraints.size}, $stacked) AS (`constraint`, n_violations)",
        "_n AS n_rows")
      .select(col("constraint"), col("n_rows"), col("n_violations"))
  }

  /**
   * Winsorization: clamp `c` into its own exact interpolated
   * [`pLo`, `pHi`] quantile range — the standard outlier-damping repair
   * that, unlike row DELETION ([[Profile.madOutliers]] flags for that),
   * keeps the row count and every other column intact. Nulls pass
   * through. Two-job shape like [[Profile.equiDepthHistogram]]: one tiny
   * quantile aggregate (exact `percentile` — its buffer holds the
   * column's distinct values; at the 100 TB end clamp to
   * [[Profile.hashSampleQuantiles]] bounds instead) whose two numbers
   * embed as plan-time literals, then
   * a codegen'd `greatest/least` projection over the unshuffled corpus.
   * Adds `<c>_w` beside the original column.
   */
  def winsorize(
      df: DataFrame, c: String, pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val x = col(c).cast("double")
    val row = df.where(x.isNotNull).select(x.as("_x"))
      .agg(expr(s"percentile(_x, array($pLo, $pHi))")).head()
    if (row.isNullAt(0)) return df.withColumn(s"${c}_w", x) // all-null input
    val Seq(lo, hi) = row.getSeq[Double](0).toSeq
    // greatest/least SKIP nulls (SQL semantics), so an unguarded clamp would
    // silently impute null inputs with `lo`; gate on isNotNull to pass nulls.
    df.withColumn(s"${c}_w",
      when(x.isNotNull, least(greatest(x, lit(lo)), lit(hi))))
  }

  /**
   * Group-median imputation: nulls in `valueCol` filled with the EXACT
   * interpolated median of the value's own `groupCol` group (groups that
   * are entirely null stay null — inventing a global value is a policy,
   * not a default). The medians are one grouped aggregate over the
   * non-null rows (group-count-sized result, AQE broadcasts it back);
   * the fill is a join + `coalesce`, no window over the corpus. Adds
   * `<valueCol>_f`.
   */
  def imputeByGroupMedian(
      df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val medians = df.where(x.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), x.as("_x"))
      .groupBy("_g").agg(expr("percentile(_x, 0.5)").as("_med"))
    df.join(medians, col(groupCol) === col("_g"), "left")
      .withColumn(s"${valueCol}_f", coalesce(x, col("_med")))
      .drop("_g", "_med")
  }
}
