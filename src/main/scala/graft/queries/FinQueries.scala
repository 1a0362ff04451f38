package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.FinOps

/**
 * Driver-contract queries for the financial operator inventory (SURVEY.md §2,
 * S/P/F/C/A/J/O rows), expressed over the driver's TPC-H-ish tables via
 * [[Tpch.ordersTx]] so each one runs the same [[graft.ops.FinOps]] code the
 * financial pipeline uses. Each query has a DuckDB oracle that mirrors its
 * semantics exactly; all money aggregation is decimal/integer-exact so Spark
 * and DuckDB hashes agree (see FinOps notes on float-summation order).
 *
 * Every query ends in a total-order `ORDER BY` shared with its oracle so the
 * driver's row-hash comparison is deterministic.
 */
object FinQueries {

  private type Q = (SparkSession, String) => DataFrame

  private def tx(spark: SparkSession, sfDir: String): DataFrame =
    Tpch.ordersTx(spark, sfDir)

  /** Each user's statement month = their latest yearMonth (the set-based
    * generalization of "the month of the uploaded statement"). */
  private def withTargetYm(df: DataFrame): DataFrame =
    df.withColumn("target_ym", max("yearMonth").over(Window.partitionBy("userId")))

  private def currentRows(df: DataFrame): DataFrame =
    withTargetYm(df).where(col("yearMonth") === col("target_ym")).drop("target_ym")

  private def historyRows(df: DataFrame): DataFrame =
    withTargetYm(df).where(col("yearMonth") =!= col("target_ym")).drop("target_ym")

  // Shared oracle fragments -------------------------------------------------

  private val cte = Tpch.txCte

  /** Oracle fragment: tx plus each user's target (latest) month. */
  private val t2Cte =
    s"""$cte,
       |t2 AS (SELECT *, max(yearMonth) OVER (PARTITION BY userId) AS target_ym FROM tx)""".stripMargin

  /** Oracle fragment: exact per-user average in integer cents (mirrors
    * FinOps.historicalAveragePerUser — round_half_up(sum/count, 2dp)). */
  private def avgSql(src: String): String =
    s"""SELECT userId,
       |  CAST((2 * SUM(CAST(amount * 100 AS BIGINT)) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 100 AS avg_amount
       |FROM $src GROUP BY userId""".stripMargin

  /** Oracle fragment: per-user home country (mode with (count desc, country
    * asc) tie-break) over `src`, which must expose userId + location. */
  private def homeSql(src: String): String =
    s"""SELECT userId, country AS home_country FROM (
       |  SELECT userId, country,
       |         row_number() OVER (PARTITION BY userId ORDER BY cnt DESC, country ASC) AS rn
       |  FROM (SELECT userId, country, count(*) AS cnt
       |        FROM $src JOIN iso ON substr(location, 1, 2) = a2
       |        GROUP BY userId, country)
       |) WHERE rn = 1""".stripMargin

  private val moneySum = "CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE)"

  // -------------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // S2/P1/P2 — statement CSV ingest on the reference fixtures
    "q_s2_ingest" -> ((s, _) =>
      FinOps.ingestStatement(s, "/root/reference/test_data/*.csv")
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("userId", "id")),

    // Column profiling: one scan computes nulls/distinct/min/max for every
    // requested column (the ANALYZE/data-quality surface)
    "q_profile_orders" -> ((s, dir) =>
      graft.ops.Profile.profile(
        Tpch.read(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"))
        .orderBy("col_name")),

    // Fixed-width histogram (24 × 25k buckets over order totals)
    "q_hist_totalprice" -> ((s, dir) =>
      graft.ops.Profile.histogram(
        Tpch.read(s, dir, "orders"), "o_totalprice", 0.0, 600000.0, 24)
        .orderBy("bin")),

    // Equi-depth histogram: 8 ~equal-count buckets with exact interpolated
    // quantile edges embedded as plan-time literals
    "q_hist_equidepth" -> ((s, dir) =>
      graft.ops.Profile.equiDepthHistogram(
        Tpch.read(s, dir, "orders"), "o_totalprice", 8)
        .orderBy("bin")),

    // P1 — projection + rename with a pushed-down filter
    "q_p1_project" -> ((s, dir) =>
      Tpch.read(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(
          col("l_orderkey").as("order_id"),
          col("l_linenumber").as("line_no"),
          col("l_quantity").cast("int").as("qty"),
          col("l_returnflag").as("flag"))
        .orderBy("order_id", "line_no")),

    // P2 — type coercion (string/int/boolean/decimal)
    "q_p2_coerce" -> ((s, dir) =>
      Tpch.read(s, dir, "lineitem")
        .select(
          col("l_orderkey").cast("string").as("id"),
          col("l_linenumber").as("line_no"),
          col("l_quantity").cast("int").as("qty_int"),
          (col("l_returnflag") === "R").as("is_return"),
          col("l_extendedprice").cast("decimal(12,2)").cast("string").as("amount_str"))
        .orderBy("id", "line_no")),

    // P3 — country-code extraction
    "q_p3_country_code" -> ((s, dir) =>
      tx(s, dir)
        .select(col("userId"), col("id"), substring(col("location"), 1, 2).as("cc"))
        .orderBy("id")),

    // P4/J1 — ISO-3166 broadcast dimension join
    "q_j1_country_resolve" -> ((s, dir) =>
      FinOps.resolveCountry(tx(s, dir), s)
        .select("userId", "id", "country")
        .orderBy("id")),

    // P5 — yearMonth derivation from date
    "q_p5_yearmonth" -> ((s, dir) =>
      tx(s, dir)
        .select(col("id"), FinOps.ymOfDate(col("date")).as("ym"))
        .orderBy("id")),

    // P6 — year derivation (from date and from yearMonth string)
    "q_p6_year" -> ((s, dir) =>
      tx(s, dir)
        .select(
          col("id"),
          year(col("date")).as("yr"),
          substring(col("yearMonth"), 1, 4).as("yr_str"))
        .orderBy("id")),

    // P7 — previous-month arithmetic incl. January rollover
    "q_p7_prev_month" -> ((s, dir) =>
      tx(s, dir)
        .select("yearMonth").distinct()
        .withColumn("prev_ym", FinOps.prevYearMonth(col("yearMonth")))
        .orderBy("yearMonth")),

    // A1 — grouping by the composite ownership key
    "q_a1_group_keys" -> ((s, dir) =>
      tx(s, dir)
        .groupBy("userId", "yearMonth")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("userId", "yearMonth")),

    // A2 + S4 — nest to statement items, then explode back (round-trip)
    "q_a2_nest_roundtrip" -> ((s, dir) =>
      FinOps.explodeStatements(FinOps.toStatementItems(tx(s, dir)))
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("id")),

    // A3 — per-user historical average (exact integer-cents rounding)
    "q_a3_hist_avg" -> ((s, dir) =>
      FinOps.historicalAveragePerUser(tx(s, dir)).orderBy("userId")),

    // A4 + J1 — per-user modal country
    "q_a4_home_country" -> ((s, dir) =>
      FinOps.homeCountry(tx(s, dir), s).orderBy("userId")),

    // A4 (generic mode with real tie-breaks) — modal vendor per user
    "q_a4_mode_vendor" -> ((s, dir) =>
      FinOps.modeBy(tx(s, dir), "userId", "vendor", "top_vendor").orderBy("userId")),

    // A5/P8 — spending by category, sum-of-rounded money semantics
    "q_a5_category_spend" -> ((s, dir) =>
      FinOps.spendingByCategory(tx(s, dir))
        .orderBy("userId", "yearMonth", "category")),

    // P7+F4+A8 — previous-month category spending
    "q_a8_prev_month_spend" -> ((s, dir) =>
      FinOps.previousMonthSpending(withTargetYm(tx(s, dir)), col("target_ym"))
        .orderBy("userId", "category")),

    // F1/J2 — high-value transactions vs per-user scalar threshold
    "q_f1_high_value" -> ((s, dir) => {
      val t = tx(s, dir)
      FinOps.highValue(t, FinOps.historicalAveragePerUser(t))
        .select(col("userId"), col("id"), col("amount").cast("double").as("amount"), col("avg_amount"))
        .orderBy("id")
    }),

    // O1 — per-user top-3 by amount with deterministic tie-break
    "q_o1_topk" -> ((s, dir) =>
      FinOps.topHighValue(tx(s, dir), 3)
        .select(col("userId"), col("rank"), col("id"), col("amount").cast("double").as("amount"))
        .orderBy("userId", "rank")),

    // J4+F3+A6 — recurring YTD by vendor over current ∪ historical
    "q_a6_recurring_ytd" -> ((s, dir) => {
      val t = tx(s, dir)
      FinOps.recurringYtd(currentRows(t), historyRows(t))
        .orderBy("userId", "vendor")
    }),

    // P9 — year-end linear extrapolation of the recurring YTD totals
    "q_p9_projection" -> ((s, dir) => {
      val t = tx(s, dir)
      val rec = FinOps.recurringYtd(currentRows(t), historyRows(t))
      val m = t.groupBy("userId")
        .agg(max("yearMonth").as("tym"))
        .select(col("userId"), substring(col("tym"), 5, 2).cast("int").as("m_elapsed"))
      FinOps.projectYearEnd(rec.join(m, "userId"), "ytd_total", "m_elapsed")
        .select("userId", "vendor", "ytd_total", "m_elapsed", "projected")
        .orderBy("userId", "vendor")
    }),

    // A7 — per-user monthly spending
    "q_a7_monthly_spend" -> ((s, dir) =>
      FinOps.monthlySpending(tx(s, dir)).orderBy("userId", "ym")),

    // O2 — 3-point trend classification (window partitioned by user)
    "q_o2_trend" -> ((s, dir) =>
      FinOps.classifyTrend(FinOps.monthlySpending(tx(s, dir))).orderBy("userId")),

    // O3 — month-ascending display sort (global monthly totals)
    "q_o3_sort_months" -> ((s, dir) =>
      tx(s, dir)
        .groupBy(FinOps.ymOfDate(col("date")).as("ym"))
        .agg(sum(FinOps.money(col("amount"))).cast("double").as("total"))
        .orderBy("ym")),

    // F2+C1+C2+C3 — the flagship: flag risky (foreign) current-month
    // transactions against home country + historical average.
    // One-pass shape: resolve countries once over the windowed frame, derive
    // current/history/home/average from that single branch (measured ~2×
    // faster than resolving current and history separately).
    "q_flag_risky" -> ((s, dir) => {
      val resolved = FinOps.resolveCountry(withTargetYm(tx(s, dir)), s)
      val hist = resolved.where(col("yearMonth") =!= col("target_ym"))
      FinOps.flagRiskyResolved(
          resolved.where(col("yearMonth") === col("target_ym")),
          FinOps.modeBy(hist, "userId", "country", "home_country"),
          FinOps.historicalAveragePerUser(hist))
        .orderBy("transaction_id")
    }),

    // J3 — current-vs-previous month category comparison (full outer)
    "q_j3_month_compare" -> ((s, dir) => {
      val t = withTargetYm(tx(s, dir))
      val cur = FinOps.spendingByCategory(
        t.where(col("yearMonth") === col("target_ym")), Seq("userId"))
      val prev = FinOps.previousMonthSpending(t, col("target_ym"))
        .withColumnRenamed("total", "prev_total")
      cur.join(prev, Seq("userId", "category"), "full_outer")
        .select(
          col("userId"), col("category"),
          coalesce(col("total"), lit(0d)).as("cur_total"),
          coalesce(col("prev_total"), lit(0d)).as("prev_total"))
        .orderBy("userId", "category")
    }),

    // ROLLUP hierarchy: (userId, category) subtotals + per-user + grand
    // total. Expressed via spark.sql — the Dataset rollup API trips Spark 4's
    // ambiguous-self-join check on grouping columns over joined lineage.
    "q_fin_rollup" -> ((s, dir) => {
      tx(s, dir)
        .select(col("userId"), col("category"), FinOps.money(col("amount")).as("m"))
        .createOrReplaceTempView("graft_rollup_tx")
      s.sql(
        """SELECT userId, category, CAST(SUM(m) AS DOUBLE) AS total
          |FROM graft_rollup_tx
          |GROUP BY ROLLUP (userId, category)
          |ORDER BY userId ASC NULLS FIRST, category ASC NULLS FIRST""".stripMargin)
    }),

    // PIVOT: order-status categories to columns (explicit value set)
    "q_fin_pivot" -> ((s, dir) =>
      tx(s, dir)
        .groupBy("userId")
        .pivot("category", Seq("F", "O", "P"))
        .agg(sum(FinOps.money(col("amount"))).cast("double"))
        .na.fill(0d, Seq("F", "O", "P"))
        .orderBy("userId")),

    // Running balance: per-user cumulative window (exact decimal)
    "q_fin_running_balance" -> ((s, dir) =>
      FinOps.runningBalance(tx(s, dir)).orderBy("userId", "date", "id")),

    // J4 — unionByName then re-aggregate (cur ∪ hist ≡ the whole table)
    "q_j4_union" -> ((s, dir) => {
      val t = tx(s, dir)
      currentRows(t).unionByName(historyRows(t))
        .groupBy("userId")
        .agg(
          count(lit(1)).as("cnt"),
          sum(FinOps.money(col("amount"))).cast("double").as("total"))
        .orderBy("userId")
    })
  )

  // -------------------------------------------------------------------------

  val oracleSql: Map[String, String] = Map(
    // width 25000.0 is computed plan-side ((600000-0)/24) and embedded as a
    // literal in both engines — never divided inside SQL
    "q_hist_totalprice" ->
      """WITH b AS (SELECT least(23, CAST(floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 25000.0) AS INT)) AS bin
        |           FROM orders
        |           WHERE o_totalprice IS NOT NULL
        |             AND CAST(o_totalprice AS DOUBLE) >= 0.0
        |             AND CAST(o_totalprice AS DOUBLE) <= 600000.0)
        |SELECT bin,
        |       CAST(0.0 + bin * 25000.0 AS DOUBLE) AS bin_lo,
        |       CAST(0.0 + (bin + 1) * 25000.0 AS DOUBLE) AS bin_hi,
        |       count(*) AS cnt
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_hist_equidepth" ->
      """WITH e AS (SELECT unnest(quantile_cont(CAST(o_totalprice AS DOUBLE),
        |                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS edge
        |           FROM orders WHERE o_totalprice IS NOT NULL),
        |r AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS x
        |      FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT k, x, CAST(count(*) FILTER (WHERE x > edge) AS INT) AS bin
        |      FROM r CROSS JOIN e GROUP BY k, x)
        |SELECT bin, count(*) AS cnt, min(x) AS x_min, max(x) AS x_max
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_profile_orders" -> {
      // min/max cast BEFORE aggregating (lexicographic on strings) to match
      // the Spark side exactly
      def one(c: String) =
        s"""SELECT '$c' AS col_name,
           |  count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  min(CAST($c AS VARCHAR)) AS min_value,
           |  max(CAST($c AS VARCHAR)) AS max_value
           |FROM orders""".stripMargin
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_s2_ingest" ->
      """SELECT UserId AS userId, YearMonth AS yearMonth,
        |  "transactions.id" AS id,
        |  CAST("transactions.date" AS DATE) AS date,
        |  "transactions.vendor" AS vendor,
        |  "transactions.category" AS category,
        |  CAST(CAST("transactions.amount" AS DECIMAL(12,2)) AS DOUBLE) AS amount,
        |  "transactions.currency" AS currency,
        |  lower("transactions.recurring") = 'true' AS recurring,
        |  "transactions.type" AS txType,
        |  "transactions.location" AS location,
        |  "transactions.description" AS description
        |FROM read_csv('/root/reference/test_data/*.csv', header=true, all_varchar=true)
        |ORDER BY userId, id""".stripMargin,

    "q_p1_project" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  CAST(l_quantity AS INT) AS qty, l_returnflag AS flag
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY order_id, line_no""".stripMargin,

    "q_p2_coerce" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS id, l_linenumber AS line_no,
        |  CAST(l_quantity AS INT) AS qty_int,
        |  l_returnflag = 'R' AS is_return,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS amount_str
        |FROM lineitem ORDER BY id, line_no""".stripMargin,

    "q_p3_country_code" ->
      s"$cte SELECT userId, id, substr(location, 1, 2) AS cc FROM tx ORDER BY id",

    "q_j1_country_resolve" ->
      s"""$cte SELECT userId, id, country
         |FROM tx JOIN iso ON substr(location, 1, 2) = a2 ORDER BY id""".stripMargin,

    "q_p5_yearmonth" ->
      s"$cte SELECT id, strftime(date, '%Y%m') AS ym FROM tx ORDER BY id",

    "q_p6_year" ->
      s"""$cte SELECT id, CAST(year(date) AS INT) AS yr,
         |  substr(yearMonth, 1, 4) AS yr_str FROM tx ORDER BY id""".stripMargin,

    "q_p7_prev_month" ->
      s"""$cte SELECT DISTINCT yearMonth,
         |  strftime(date_trunc('month', strptime(yearMonth || '01', '%Y%m%d')) - INTERVAL 1 MONTH, '%Y%m') AS prev_ym
         |FROM tx ORDER BY yearMonth""".stripMargin,

    "q_a1_group_keys" ->
      s"""$cte SELECT userId, yearMonth, count(*) AS cnt
         |FROM tx GROUP BY userId, yearMonth ORDER BY userId, yearMonth""".stripMargin,

    "q_a2_nest_roundtrip" ->
      s"""$cte SELECT userId, yearMonth, id, date, vendor, category,
         |  CAST(amount AS DOUBLE) AS amount, currency, recurring, txType, location, description
         |FROM tx ORDER BY id""".stripMargin,

    "q_a3_hist_avg" ->
      s"$cte ${avgSql("tx")} ORDER BY userId",

    "q_a4_home_country" ->
      s"$cte ${homeSql("tx")} ORDER BY userId",

    "q_a4_mode_vendor" ->
      s"""$cte SELECT userId, vendor AS top_vendor FROM (
         |  SELECT userId, vendor,
         |         row_number() OVER (PARTITION BY userId ORDER BY cnt DESC, vendor ASC) AS rn
         |  FROM (SELECT userId, vendor, count(*) AS cnt FROM tx GROUP BY userId, vendor)
         |) WHERE rn = 1 ORDER BY userId""".stripMargin,

    "q_a5_category_spend" ->
      s"""$cte SELECT userId, yearMonth, category, $moneySum AS total
         |FROM tx GROUP BY userId, yearMonth, category
         |ORDER BY userId, yearMonth, category""".stripMargin,

    "q_a8_prev_month_spend" ->
      s"""$t2Cte
         |SELECT userId, category, $moneySum AS total
         |FROM t2
         |WHERE strftime(date, '%Y%m') =
         |      strftime(date_trunc('month', strptime(target_ym || '01', '%Y%m%d')) - INTERVAL 1 MONTH, '%Y%m')
         |GROUP BY userId, category
         |ORDER BY userId, category""".stripMargin,

    "q_f1_high_value" ->
      s"""$cte, avg_t AS (${avgSql("tx")})
         |SELECT t.userId, t.id, CAST(t.amount AS DOUBLE) AS amount, a.avg_amount
         |FROM tx t JOIN avg_t a ON t.userId = a.userId
         |WHERE CAST(t.amount AS DOUBLE) > a.avg_amount
         |ORDER BY t.id""".stripMargin,

    "q_o1_topk" ->
      s"""$cte SELECT userId, rank, id, CAST(amount AS DOUBLE) AS amount FROM (
         |  SELECT userId, id, amount,
         |         CAST(row_number() OVER (PARTITION BY userId ORDER BY amount DESC, id ASC) AS INT) AS rank
         |  FROM tx
         |) WHERE rank <= 3 ORDER BY userId, rank""".stripMargin,

    "q_a6_recurring_ytd" ->
      s"""$cte,
         |w AS (SELECT *, max(substr(yearMonth, 1, 4)) OVER (PARTITION BY userId) AS cur_year FROM tx)
         |SELECT userId, vendor, $moneySum AS ytd_total, min(cur_year) AS cur_year
         |FROM w WHERE year(date) = CAST(cur_year AS BIGINT) AND recurring
         |GROUP BY userId, vendor
         |ORDER BY userId, vendor""".stripMargin,

    "q_p9_projection" ->
      s"""$cte,
         |w AS (SELECT *,
         |        max(substr(yearMonth, 1, 4)) OVER (PARTITION BY userId) AS cur_year,
         |        max(yearMonth) OVER (PARTITION BY userId) AS tym
         |      FROM tx),
         |rec AS (SELECT userId, vendor,
         |          SUM(CAST(amount AS DECIMAL(18,2))) AS s,
         |          CAST(substr(min(tym), 5, 2) AS INT) AS m_elapsed
         |        FROM w WHERE year(date) = CAST(cur_year AS BIGINT) AND recurring
         |        GROUP BY userId, vendor)
         |SELECT userId, vendor, CAST(s AS DOUBLE) AS ytd_total, m_elapsed,
         |  CAST((24 * CAST(s * 100 AS BIGINT) + m_elapsed) // (2 * m_elapsed) AS DOUBLE) / 100 AS projected
         |FROM rec ORDER BY userId, vendor""".stripMargin,

    "q_a7_monthly_spend" ->
      s"""$cte SELECT userId, strftime(date, '%Y%m') AS ym, $moneySum AS total
         |FROM tx GROUP BY userId, ym ORDER BY userId, ym""".stripMargin,

    "q_o2_trend" ->
      s"""$cte,
         |m AS (SELECT userId, strftime(date, '%Y%m') AS ym,
         |        SUM(CAST(amount AS DECIMAL(18,2))) AS total
         |      FROM tx GROUP BY userId, ym),
         |r AS (SELECT userId, total,
         |        row_number() OVER (PARTITION BY userId ORDER BY ym DESC) AS rn
         |      FROM m),
         |p AS (SELECT userId, count(*) AS n,
         |        max(CASE WHEN rn = 1 THEN total END) AS m0,
         |        max(CASE WHEN rn = 2 THEN total END) AS m1,
         |        max(CASE WHEN rn = 3 THEN total END) AS m2
         |      FROM r WHERE rn <= 3 GROUP BY userId)
         |SELECT userId,
         |  CASE WHEN n < 3 THEN 'Not enough data'
         |       WHEN m0 > m1 AND m1 > m2 THEN 'Up'
         |       WHEN m0 < m1 AND m1 < m2 THEN 'Down'
         |       ELSE 'Stable' END AS trend
         |FROM p ORDER BY userId""".stripMargin,

    "q_o3_sort_months" ->
      s"""$cte SELECT strftime(date, '%Y%m') AS ym, $moneySum AS total
         |FROM tx GROUP BY ym ORDER BY ym""".stripMargin,

    "q_flag_risky" ->
      s"""$t2Cte,
         |cur AS (SELECT * FROM t2 WHERE yearMonth = target_ym),
         |hist AS (SELECT * FROM t2 WHERE yearMonth <> target_ym),
         |home AS (${homeSql("hist")}),
         |avg_t AS (${avgSql("hist")})
         |SELECT c.userId, c.yearMonth, c.id AS transaction_id, c.date, c.vendor, c.category,
         |  CAST(c.amount AS DOUBLE) AS amount, c.location, i.country, h.home_country,
         |  COALESCE(a.avg_amount, 0) AS average_amount,
         |  CASE WHEN CAST(c.amount AS DOUBLE) > COALESCE(a.avg_amount, 0) THEN 'High Risk'
         |       ELSE 'Moderate Risk' END AS risk_level,
         |  'Transaction in ' || i.country || ' outside home country ' ||
         |    COALESCE(h.home_country, 'unknown') || '; amount ' ||
         |    CAST(CAST(c.amount AS DECIMAL(18,2)) AS VARCHAR) || ' vs average ' ||
         |    CAST(CAST(COALESCE(a.avg_amount, 0) AS DECIMAL(18,2)) AS VARCHAR) AS explanation
         |FROM cur c
         |JOIN iso i ON substr(c.location, 1, 2) = i.a2
         |LEFT JOIN home h ON c.userId = h.userId
         |LEFT JOIN avg_t a ON c.userId = a.userId
         |WHERE i.country IS DISTINCT FROM h.home_country
         |ORDER BY transaction_id""".stripMargin,

    "q_j3_month_compare" ->
      s"""$t2Cte,
         |cur AS (SELECT userId, category, $moneySum AS total
         |        FROM t2 WHERE yearMonth = target_ym GROUP BY userId, category),
         |prev AS (SELECT userId, category, $moneySum AS prev_total
         |         FROM t2
         |         WHERE strftime(date, '%Y%m') =
         |               strftime(date_trunc('month', strptime(target_ym || '01', '%Y%m%d')) - INTERVAL 1 MONTH, '%Y%m')
         |         GROUP BY userId, category)
         |SELECT COALESCE(c.userId, p.userId) AS userId,
         |  COALESCE(c.category, p.category) AS category,
         |  COALESCE(c.total, 0) AS cur_total,
         |  COALESCE(p.prev_total, 0) AS prev_total
         |FROM cur c FULL OUTER JOIN prev p
         |  ON c.userId = p.userId AND c.category = p.category
         |ORDER BY userId, category""".stripMargin,

    "q_j4_union" ->
      s"""$cte SELECT userId, count(*) AS cnt, $moneySum AS total
         |FROM tx GROUP BY userId ORDER BY userId""".stripMargin,

    "q_fin_rollup" ->
      s"""$cte SELECT userId, category, $moneySum AS total
         |FROM tx GROUP BY ROLLUP (userId, category)
         |ORDER BY userId ASC NULLS FIRST, category ASC NULLS FIRST""".stripMargin,

    "q_fin_pivot" ->
      s"""$cte SELECT userId,
         |  COALESCE(CAST(SUM(CASE WHEN category = 'F' THEN CAST(amount AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS F,
         |  COALESCE(CAST(SUM(CASE WHEN category = 'O' THEN CAST(amount AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS O,
         |  COALESCE(CAST(SUM(CASE WHEN category = 'P' THEN CAST(amount AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS P
         |FROM tx GROUP BY userId ORDER BY userId""".stripMargin,

    "q_fin_running_balance" ->
      s"""$cte SELECT userId, id, date, CAST(amount AS DOUBLE) AS amount,
         |  CAST(SUM(CAST(amount AS DECIMAL(18,2))) OVER (
         |    PARTITION BY userId ORDER BY date, id
         |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS balance
         |FROM tx ORDER BY userId, date, id""".stripMargin
  )
}
