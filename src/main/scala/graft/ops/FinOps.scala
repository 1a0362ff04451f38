package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.model.{Iso3166, Transaction}

/**
 * Financial-statement analytics operators.
 *
 * Each operator re-expresses one behavior of the reference pipeline
 * (`/root/reference/docker/lambda_function.py`, cited as `LF` below) as a pure,
 * set-based `DataFrame => DataFrame` transformation:
 *
 *  - The reference processes one `(UserId, YearMonth)` group at a time in a
 *    driver-side Python loop (LF:495). Here every operator is keyed by `userId`
 *    and computed for ALL users in one distributed pass — per-user scalars
 *    (historical average, home country) become grouped aggregates that are
 *    joined back on the group key. At 100 TB this is the difference between a
 *    single shuffle and a million sequential jobs.
 *  - Money arithmetic follows the reference's "round each amount to 2 dp, then
 *    sum" semantics (LF:147,249,261), but accumulates in DECIMAL(18,2) rather
 *    than float: exact, order-independent (a float sum changes value under
 *    Spark's nondeterministic partial-aggregation order), and identical to the
 *    reference's result for 2-dp inputs. Final outputs are cast to double to
 *    match the reference's `float()` report values (LF:90,124,147).
 *  - Input is the canonical transaction frame ([[graft.model.Transaction]]):
 *    `userId, yearMonth, id, date, vendor, category, amount DECIMAL(12,2),
 *    currency, recurring, txType, location, description`.
 */
object FinOps {

  /** Accumulator type for money sums: wide enough for 100 TB of 2-dp amounts. */
  val MoneySumType: DecimalType = DecimalType(18, 2)

  /** Reference money semantics (LF:147): round to 2 dp *before* aggregation.
    * The decimal cast keeps downstream sums exact and order-independent. */
  def money(c: Column): Column = round(c.cast("double"), 2).cast(MoneySumType)

  /** yearMonth ("yyyyMM") derived from a date column — replaces the
    * reference's `date[:7].replace("-","")` string slicing (LF:170,258). */
  def ymOfDate(date: Column): Column = date_format(date, "yyyyMM")

  /** Previous calendar month of a "yyyyMM" string, with correct January →
    * December-of-prior-year rollover (LF:156-165; fixes the LF:215 label bug —
    * `str(int(ym)-1)` — which produces e.g. 202500). */
  def prevYearMonth(ym: Column): Column =
    date_format(add_months(to_date(concat(ym, lit("01")), "yyyyMMdd"), -1), "yyyyMM")

  // -------------------------------------------------------------------------
  // S2 / P1 / P2 — statement ingest
  // -------------------------------------------------------------------------

  /**
   * Reads a statement CSV (reference header format, `transactions.`-prefixed
   * columns, optional UTF-8 BOM — LF:58-86) into the canonical transaction
   * frame. Everything is read as string and coerced here, so one malformed row
   * becomes a null to police instead of aborting the load (LF:84-85 aborts).
   *
   * Column names in the raw schema contain literal dots, so every reference
   * uses backticks (`col("`transactions.id`")`) — Spark would otherwise parse
   * them as struct-field paths.
   */
  def ingestStatement(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", true)
      .option("encoding", "UTF-8")
      .schema(Transaction.csvSchema)
      .csv(path)
    normalizeStatement(raw)
  }

  /** The projection/coercion half of ingest (P1 + P2), usable on any frame
    * that has the raw reference column names. Coercions are try_-variants:
    * under ANSI mode (Spark 4 default) a plain cast/to_date THROWS on a
    * malformed value, which would reproduce the reference's
    * one-bad-row-kills-the-load behavior (LF:84-85); here bad values become
    * nulls that [[validateStatement]] quarantines. */
  def normalizeStatement(raw: DataFrame): DataFrame = {
    def c(name: String): Column = col(s"`transactions.$name`")
    raw.select(
      col("UserId").cast(StringType).as("userId"),
      col("YearMonth").cast(StringType).as("yearMonth"),
      c("id").as("id"),
      try_to_timestamp(c("date"), lit("yyyy-MM-dd")).cast("date").as("date"),
      c("vendor").as("vendor"),
      c("category").as("category"),
      expr("try_cast(`transactions.amount` AS decimal(12,2))").as("amount"),
      c("currency").as("currency"),
      // LF:73: recurring = str.lower() == "true"
      (lower(c("recurring")) === "true").as("recurring"),
      c("type").as("txType"),
      c("location").as("location"),
      c("description").as("description")
    )
  }

  /**
   * Ingest policing: splits a normalized statement frame into
   * `(valid, rejects)`. The reference aborts the entire load when any row is
   * malformed (LF:84-85) — at scale one bad row must never kill a 100 TB
   * batch, so invalid rows are quarantined with a reason instead. A row is
   * invalid when any required field failed coercion (nulls from
   * [[normalizeStatement]]) or the location is not `CC-…` shaped.
   */
  def validateStatement(df: DataFrame): (DataFrame, DataFrame) = {
    val reason = when(col("userId").isNull, "missing userId")
      .when(col("yearMonth").isNull || !col("yearMonth").rlike("^\\d{6}$"), "bad yearMonth")
      .when(col("id").isNull, "missing id")
      .when(col("date").isNull, "unparseable date")
      .when(col("amount").isNull, "unparseable amount")
      .when(col("location").isNull || !col("location").rlike("^[A-Z]{2}(-|$)"), "bad location")
    val tagged = df.withColumn("_reject_reason", reason)
    (tagged.where(col("_reject_reason").isNull).drop("_reject_reason"),
      tagged.where(col("_reject_reason").isNotNull))
  }

  // -------------------------------------------------------------------------
  // P3 / P4 / J1 — country resolution
  // -------------------------------------------------------------------------

  /**
   * Resolves `location` ("CC-REGION", LF:75) to a country name via an inner
   * broadcast join against the bundled ISO-3166 dimension (replaces the
   * per-row uncached pycountry lookup, LF:101,121). Inner join reproduces the
   * reference's "unknown code ⇒ row does not survive" behavior (LF:101 raises)
   * without crashing the job. `broadcast` is explicit: the 249-row dimension
   * must never shuffle the fact side.
   */
  def resolveCountry(df: DataFrame, spark: SparkSession): DataFrame =
    df.withColumn("alpha2", substring(col("location"), 1, 2))
      .join(broadcast(Iso3166.table(spark)), Seq("alpha2"), "inner")
      .drop("alpha2")

  // -------------------------------------------------------------------------
  // A3 — historical average (per user)
  // -------------------------------------------------------------------------

  /** Exact 2-dp money value in integer cents — the substrate for the ops that
    * must *round results of division* (A3 average, P9 projection). Rounding a
    * float quotient is platform-dependent at half-boundaries (and .xx5
    * boundaries occur systematically when dividing 2-dp money), so those ops
    * round the true rational with integer arithmetic instead:
    * `round_half_up(a/b) = (2a + b) DIV (2b)` for positive a, b. */
  private def cents(amount: Column): Column =
    (money(amount) * 100).cast("long")

  /**
   * Per-user mean transaction amount over the whole history, rounded
   * half-up to 2 dp (LF:88-94 does `round(sum(float)/count, 2)`). Mean of
   * *transaction amounts*, not of monthly totals. The reference computes one
   * scalar per user in a driver loop; here it is a single grouped aggregate →
   * `(userId, avg_amount)`.
   *
   * Computed entirely in integer cents — exact, order-independent, and
   * deterministic across engines (a float `avg()` is none of these under
   * partial aggregation).
   */
  def historicalAveragePerUser(df: DataFrame): DataFrame =
    df.groupBy("userId")
      .agg(sum(cents(col("amount"))).as("_cents"), count(lit(1)).as("_n"))
      .select(
        col("userId"),
        (expr("(2 * _cents + _n) DIV (2 * _n)").cast("double") / 100).as("avg_amount"))

  /** Global variant (single row) — the reference shape for one user's history
    * (LF:88-94); empty input ⇒ 0. */
  def historicalAverage(df: DataFrame): DataFrame =
    df.agg(sum(cents(col("amount"))).as("_cents"), count(lit(1)).as("_n"))
      .select(
        coalesce(
          expr("(2 * _cents + _n) DIV (2 * _n)").cast("double") / 100,
          lit(0d)
        ).as("avg_amount"))

  // -------------------------------------------------------------------------
  // A4 — home country (mode with deterministic tie-break)
  // -------------------------------------------------------------------------

  /**
   * Per-user modal country of historical transactions (LF:96-115) →
   * `(userId, home_country)`.
   *
   * Divergence (documented, SURVEY §7.4): the reference breaks count ties by
   * dict insertion order (first country encountered), which is not stable
   * under a shuffle. We use `(count desc, country asc)` — deterministic on any
   * cluster. Implemented as a two-level aggregate + `max_by`-style struct max
   * rather than `row_number` over a window, so there is no extra sort: the
   * per-user winner is picked by a single `max(struct(cnt, inverted country))`.
   */
  def homeCountry(df: DataFrame, spark: SparkSession): DataFrame =
    modeBy(resolveCountry(df, spark), "userId", "country", "home_country")

  /**
   * Generic per-key mode: the most frequent `value` per `key`, ties broken by
   * the smaller value. Two hash aggregates and no window sort: the winner is
   * picked by `min_by` over the composite ordering `(-count, value)`, a
   * partial-aggregatable one-pass reduction — at scale this beats a
   * `row_number` window, which would sort every group.
   */
  def modeBy(df: DataFrame, key: String, value: String, outName: String): DataFrame =
    df.groupBy(col(key), col(value))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(key))
      .agg(min_by(col(value), struct(negate(col("cnt")), col(value))).as(outName))

  // -------------------------------------------------------------------------
  // A5 — spending by category
  // -------------------------------------------------------------------------

  /**
   * Sum of rounded amounts per category (LF:143-152), grouped by the given
   * keys (reference scope: one user-month statement ⇒ keys = userId,
   * yearMonth). Sum-of-rounded, not rounded-sum (SURVEY §7.4 trap #2).
   */
  def spendingByCategory(df: DataFrame, keys: Seq[String] = Seq("userId", "yearMonth")): DataFrame =
    df.groupBy((keys :+ "category").map(col): _*)
      .agg(sum(money(col("amount"))).cast("double").as("total"))

  // -------------------------------------------------------------------------
  // P7 / F4 / A8 — previous-month spending
  // -------------------------------------------------------------------------

  /**
   * Previous-month category spending (LF:154-173): for each user, restrict
   * `all` (current ∪ historical) to the month before `targetYm` and compute
   * A5. `targetYm` is a per-row column (the statement month); in the set-based
   * pipeline it is the user's max yearMonth.
   */
  def previousMonthSpending(all: DataFrame, targetYm: Column): DataFrame = {
    val prev = prevYearMonth(targetYm)
    spendingByCategory(
      all.where(ymOfDate(col("date")) === prev),
      keys = Seq("userId"))
  }

  /**
   * Per-statement-month variant: one previous-month breakdown per
   * `(userId, statement yearMonth)` group, matching the reference's
   * per-group loop when one batch carries several months for a user
   * (each group's report uses its OWN month, LF:495-502). Implemented as a
   * broadcast-friendly join of the distinct statement keys onto `all`.
   */
  def previousMonthByStatement(all: DataFrame, cur: DataFrame): DataFrame = {
    val targets = cur.select(col("userId"), col("yearMonth").as("target_ym")).distinct()
    all.join(targets, Seq("userId"))
      .where(ymOfDate(col("date")) === prevYearMonth(col("target_ym")))
      .groupBy(col("userId"), col("target_ym"), col("category"))
      .agg(sum(money(col("amount"))).cast("double").as("total"))
  }

  // -------------------------------------------------------------------------
  // F1 / J2 — high-value transactions
  // -------------------------------------------------------------------------

  /**
   * Transactions strictly above the user's historical average (LF:225-236).
   * The scalar threshold is a per-user aggregate joined back on the group key
   * — the Spark form of a scalar subquery; no `.collect()` anywhere.
   * A user with no history has average 0 (reference coalesce, LF:93-94), so
   * every positive amount is high-value — hence the left join + coalesce.
   */
  def highValue(cur: DataFrame, avgPerUser: DataFrame): DataFrame =
    cur.join(avgPerUser, Seq("userId"), "left")
      .withColumn("avg_amount", coalesce(col("avg_amount"), lit(0d)))
      .where(col("amount").cast("double") > col("avg_amount"))

  // -------------------------------------------------------------------------
  // O1 — top-K by amount
  // -------------------------------------------------------------------------

  /**
   * Per-group top-K transactions by amount (LF:310-313), deterministic via
   * the `(amount desc, id asc)` tie-break (reference relies on stable Python
   * sort). The reference's scope is one (user, month) statement group; pass
   * `partitionCols = Seq("userId", "yearMonth")` for exact multi-month-batch
   * fidelity. Spark plans a WindowGroupLimit (partial per-partition top-K
   * before the shuffle), so this never sorts whole groups.
   */
  def topHighValue(
      df: DataFrame, k: Int = 3,
      partitionCols: Seq[String] = Seq("userId")): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("amount").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // -------------------------------------------------------------------------
  // F3 / A6 / J4 — recurring year-to-date by vendor
  // -------------------------------------------------------------------------

  /**
   * Recurring-transaction YTD totals by vendor (LF:238-251) over
   * current ∪ historical (`unionByName`, J4). "Current year" is the year of
   * each user's CURRENT statement (the reference passes the statement's own
   * year, LF:505) — derived from `cur` only, so reprocessing an older batch
   * against newer history still computes the batch's year, not the history's.
   * Assumes one statement month per user in `cur` (the reference's shape);
   * a multi-month batch should use [[recurringYtdByStatement]].
   */
  def recurringYtd(cur: DataFrame, hist: DataFrame): DataFrame = {
    val curYear = cur.groupBy("userId")
      .agg(max(substring(col("yearMonth"), 1, 4)).as("cur_year"))
    cur.unionByName(hist)
      .join(curYear, Seq("userId"))
      .where(year(col("date")) === col("cur_year").cast("int") && col("recurring"))
      .groupBy("userId", "vendor")
      .agg(
        sum(money(col("amount"))).cast("double").as("ytd_total"),
        // cur_year is constant within a user; min() is the deterministic pick
        min(col("cur_year")).as("cur_year"))
  }

  /**
   * Per-statement-month variant of [[recurringYtd]]: one YTD roll-up per
   * `(userId, statement yearMonth)` group, each scoped to its OWN statement's
   * year — exact reference semantics (LF:505) when one batch carries several
   * months for a user (e.g. a December and a January statement together get
   * 2024- and 2025-scoped YTDs). Same join-on-derived-keys shape as
   * [[previousMonthByStatement]]; the target set is batch-bounded and small,
   * so AQE broadcasts it.
   */
  def recurringYtdByStatement(cur: DataFrame, hist: DataFrame): DataFrame = {
    val targets = cur.select(col("userId"), col("yearMonth").as("target_ym")).distinct()
    cur.unionByName(hist)
      .join(targets, Seq("userId"))
      .where(year(col("date")) === substring(col("target_ym"), 1, 4).cast("int") &&
        col("recurring"))
      .groupBy("userId", "target_ym", "vendor")
      .agg(sum(money(col("amount"))).cast("double").as("ytd_total"))
  }

  // -------------------------------------------------------------------------
  // P9 — year-end linear extrapolation
  // -------------------------------------------------------------------------

  /**
   * Year-end projection of a YTD total (LF:392-399):
   * `predicted = ytd + (ytd / m) * (12 - m)` rounded to 2 dp, where `m` is
   * the months elapsed. Algebraically `predicted = ytd * 12 / m`; computed in
   * integer cents with half-up rounding of the true rational —
   * `(24*cents + m) DIV (2*m)` — so the result is exact and engine-portable
   * (the reference rounds a float quotient, which is ill-defined at the .xx5
   * boundaries this expression hits for every odd-cent ytd).
   *
   * Expects `ytdCol`/`monthsCol` to name existing columns; returns the frame
   * with a double `projected` column appended.
   */
  def projectYearEnd(df: DataFrame, ytdCol: String, monthsCol: String): DataFrame =
    df.withColumn("_c", cents(col(ytdCol)))
      .withColumn(
        "projected",
        expr(s"(24 * _c + $monthsCol) DIV (2 * $monthsCol)").cast("double") / 100)
      .drop("_c")

  /**
   * Per-user running balance: cumulative money total ordered by
   * `(date, id)` — the statement-view computation a real banking consumer of
   * this engine asks for first. Exact decimal accumulation in a per-user
   * window (ROWS frame, total order, no ties).
   */
  def runningBalance(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("userId")
      .orderBy(col("date"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col("userId"), col("id"), col("date"),
      col("amount").cast("double").as("amount"),
      sum(money(col("amount"))).over(w).cast("double").as("balance"))
  }

  // -------------------------------------------------------------------------
  // A7 — monthly spending
  // -------------------------------------------------------------------------

  /** Per-user month → total spending over current ∪ historical (LF:256-261). */
  def monthlySpending(all: DataFrame): DataFrame =
    all.groupBy(col("userId"), ymOfDate(col("date")).as("ym"))
      .agg(sum(money(col("amount"))).cast("double").as("total"))

  // -------------------------------------------------------------------------
  // O2 — 3-point trend classification
  // -------------------------------------------------------------------------

  /**
   * Classifies each user's spending trend from the latest 3 monthly totals
   * (LF:253-281): strictly increasing toward the latest month ⇒ "Up",
   * strictly decreasing ⇒ "Down", otherwise "Stable"; fewer than 3 months ⇒
   * "Not enough data".
   *
   * The window is partitioned by `userId` (the reference's is effectively
   * per-user because each run handles one user) — an unpartitioned
   * `Window.orderBy` would serialize 100 TB through one task.
   */
  def classifyTrend(monthly: DataFrame): DataFrame = {
    val w = Window.partitionBy("userId").orderBy(col("ym").desc)
    val latest3 = monthly
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    latest3
      .groupBy("userId")
      .agg(
        count(lit(1)).as("n"),
        max(when(col("rn") === 1, col("total"))).as("m0"),
        max(when(col("rn") === 2, col("total"))).as("m1"),
        max(when(col("rn") === 3, col("total"))).as("m2"))
      .select(
        col("userId"),
        when(col("n") < 3, "Not enough data")
          .when(col("m0") > col("m1") && col("m1") > col("m2"), "Up")
          .when(col("m0") < col("m1") && col("m1") < col("m2"), "Down")
          .otherwise("Stable")
          .as("trend"))
  }

  // -------------------------------------------------------------------------
  // F2 / C1 / C2 / C3 — risk flagging
  // -------------------------------------------------------------------------

  /**
   * Flags foreign transactions (LF:96-141): resolve each current transaction's
   * country (P3+J1), keep rows whose country differs from the user's home
   * country (F2 — null-safe: a user with no history has `home_country = null`
   * and every transaction is foreign, matching LF:122 with `None`), grade
   * "High Risk" when the amount exceeds the historical average else
   * "Moderate Risk" (C1), and project the flag record (C2) with an explanation
   * string (C3).
   *
   * Divergence (documented): the reference's output keys contain typos
   * (`avarage_amount`, `home_counter`, `categoty`, LF:133-137); we use correct
   * names.
   */
  def flagRisky(cur: DataFrame, home: DataFrame, avgPerUser: DataFrame, spark: SparkSession): DataFrame =
    flagRiskyResolved(resolveCountry(cur, spark), home, avgPerUser)

  /** [[flagRisky]] over rows whose `country` is already resolved — lets a
    * caller resolve current+historical rows in ONE pass and derive home/avg
    * from the same frame (the flagship query does this; ~2× fewer scans). */
  def flagRiskyResolved(resolved: DataFrame, home: DataFrame, avgPerUser: DataFrame): DataFrame = {
    val flagged = resolved
      .join(home, Seq("userId"), "left")
      .join(avgPerUser, Seq("userId"), "left")
      // no history ⇒ average 0 (reference coalesce, LF:93-94) ⇒ any positive
      // foreign amount grades High Risk
      .withColumn("avg_amount", coalesce(col("avg_amount"), lit(0d)))
      .where(!(col("country") <=> col("home_country")))
      .withColumn("amount_d", col("amount").cast("double"))
      .withColumn(
        "risk_level",
        when(col("amount_d") > col("avg_amount"), "High Risk").otherwise("Moderate Risk"))
    flagged.select(
      col("userId"),
      col("yearMonth"),
      col("id").as("transaction_id"),
      col("date"),
      col("vendor"),
      col("category"),
      col("amount_d").as("amount"),
      col("location"),
      col("country"),
      col("home_country"),
      col("avg_amount").as("average_amount"),
      col("risk_level"),
      concat(
        lit("Transaction in "), col("country"),
        lit(" outside home country "), coalesce(col("home_country"), lit("unknown")),
        lit("; amount "), col("amount").cast(DecimalType(18, 2)).cast("string"),
        lit(" vs average "), coalesce(col("avg_amount").cast(DecimalType(18, 2)).cast("string"), lit("n/a"))
      ).as("explanation"))
  }

  /**
   * [[flagRisky]] projected to the reference's EXACT flag-record keys
   * (LF:130-140) for byte-compatible exports to consumers of the original
   * JSON contract — including its typos (`avarage_amount`, `home_counter`,
   * `categoty`) and its quirk of emitting the resolved country NAME under
   * the key `"location"`. The corrected projection ([[flagRiskyResolved]])
   * remains the default; this mirrors [[toStatementItemsRefCompat]].
   * `userId`/`yearMonth` lead as the report keys (the reference scopes the
   * list per user-month group rather than carrying keys per record).
   */
  def flagRiskyRefCompat(
      cur: DataFrame, home: DataFrame, avgPerUser: DataFrame,
      spark: SparkSession): DataFrame =
    flagRisky(cur, home, avgPerUser, spark).select(
      col("userId"),
      col("yearMonth"),
      col("transaction_id"),
      col("amount"),
      col("average_amount").as("avarage_amount"),
      col("country").as("location"),
      col("risk_level"),
      col("home_country").as("home_counter"),
      col("category").as("categoty"),
      col("vendor"),
      col("date"))

  // -------------------------------------------------------------------------
  // A2 / S4 / S5 — persistence model
  // -------------------------------------------------------------------------

  /**
   * Nests each user-month's transactions into one row — the persisted
   * statements-table item shape (reference DynamoDB item
   * `{UserId, YearMonth, transactions: List[Map]}`, LF:467-474).
   *
   * Divergence: the struct field is `txType` where the reference item uses key
   * `"type"` (a Scala keyword-adjacent name kept consistent with the case
   * class); document-level shape is otherwise identical.
   */
  def toStatementItems(df: DataFrame): DataFrame =
    df.groupBy("userId", "yearMonth")
      .agg(collect_list(struct(Transaction.nestedFields.map(col): _*)).as("transactions"))

  /** [[toStatementItems]] with the reference's exact item field names —
    * `txType` emitted as `"type"` (the DynamoDB item key, LF:458) — for
    * byte-compatible exports to a consumer of the original format. */
  def toStatementItemsRefCompat(df: DataFrame): DataFrame =
    df.groupBy("userId", "yearMonth")
      .agg(collect_list(struct(Transaction.nestedFields.map {
        case "txType" => col("txType").as("type")
        case f => col(f)
      }: _*)).as("transactions"))

  /** Flattens statement items back to transaction rows (the reference's
    * history read concatenates each item's list — LF:40-49 — i.e. explode). */
  def explodeStatements(items: DataFrame): DataFrame =
    items
      .select(col("userId"), col("yearMonth"), explode(col("transactions")).as("t"))
      .select(
        (Seq(col("userId"), col("yearMonth")) ++
          Transaction.nestedFields.map(f => col(s"t.$f").as(f))): _*)

  /**
   * Writes statement items as a parquet table partitioned by `userId` so the
   * keyed historical read (S4) is partition-pruned. Dynamic partition
   * overwrite — NOTE this replaces whole USER partitions; put-item semantics
   * for an incremental batch are [[upsertStatements]].
   *
   * Partitioning by userId alone (not userId+yearMonth) bounds the partition
   * count; at 100 TB a per-user-month directory layout would be a small-files
   * explosion. Within a user partition, yearMonth is a normal column and
   * parquet min/max stats still skip files on month predicates.
   */
  /** Cluster by the partition column before a partitioned write: without it
    * every task holding any of a user's rows opens its own file in that
    * user's directory — N_tasks × N_users tiny files (48k observed at sf0.1,
    * minutes of commit overhead locally; a small-files explosion and
    * NameNode/listing pressure at 100 TB). Repartitioned, each user lands in
    * exactly one task → exactly one file per user directory per write. */
  def writeStatements(items: DataFrame, path: String): Unit =
    items.repartition(col("userId")).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("userId")
      .parquet(path)

  /**
   * Put-item upsert (LF:545 last-writer-wins per `(userId, yearMonth)`):
   * merges a batch of statement items into the table, replacing same-month
   * items and preserving the user's other months. Up to [[UpsertPruneKeyCap]]
   * affected users, their partitions are pruned via a driver-collected key
   * set; beyond it (backfill-sized batches) a left-semi join selects them
   * without any driver-side materialization.
   */
  /** True when `path` holds a non-empty table (an existing-but-empty
    * directory — e.g. a fresh temp dir — counts as missing). */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Above this many distinct users in a batch, the upsert stops collecting
    * the key set to the driver (a million-literal IN list bloats the plan and
    * driver heap) and switches to a left-semi join — no partition pruning,
    * but no driver blowup either. Statement-drop batches sit far below it;
    * backfills sit far above. */
  val UpsertPruneKeyCap: Int = 10000

  /** Staging directory used by [[upsertStatements]] for crash-safe merges. */
  private def upsertStagingPath(path: String) =
    new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "_upsert_staging")

  /** Crash recovery for [[upsertStatements]]: a leftover staging directory
    * means a prior upsert died mid-flight. If the staging write COMMITTED
    * (`_SUCCESS` present), the crash happened during the final partition
    * overwrite, so the target may hold half-rewritten user partitions; the
    * staging copy is the authoritative state for exactly those partitions
    * and is re-applied before anything else reads the table. If staging is
    * uncommitted, the target was never touched (the overwrite only starts
    * after staging commits) and the debris is just dropped. Runs on every
    * upsert entry; returns true when a restore was applied. */
  def recoverUpsertStaging(spark: SparkSession, path: String): Boolean = {
    val tmp = upsertStagingPath(path)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tmp)) return false
    val committed = fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
    if (committed) writeStatements(spark.read.parquet(tmp.toString), path)
    fs.delete(tmp, true)
    committed
  }

  def upsertStatements(
      items: DataFrame, path: String, spark: SparkSession,
      pruneKeyCap: Int = UpsertPruneKeyCap): Unit = {
    recoverUpsertStaging(spark, path)
    if (!tableExists(spark, path)) { writeStatements(items, path); return }
    val keys = items.select("userId").distinct()
    // Bounded collect: at most cap+1 keys ever reach the driver.
    val affected = keys.limit(pruneKeyCap + 1).collect().map(_.getString(0))
    val existing = spark.read.parquet(path)
      .withColumn("userId", col("userId").cast("string"))
    val touched =
      if (affected.length <= pruneKeyCap)
        // partition-pruned: only the affected users' directories are scanned
        existing.where(col("userId").isin(affected.toIndexedSeq: _*))
      else
        existing.join(keys, Seq("userId"), "left_semi")
    val keep = touched
      .join(items.select("userId", "yearMonth").distinct(), Seq("userId", "yearMonth"), "left_anti")
    val merged = keep.select(items.columns.toIndexedSeq.map(col): _*).unionByName(items)
    // Stage the merged frame durably before overwriting the files it reads.
    // A persist()+count() pin is NOT safe here: a lost cached block during the
    // overwrite recomputes from partially-rewritten partitions and silently
    // corrupts history. A mid-overwrite failure is recovered by
    // [[recoverUpsertStaging]] at the next upsert's entry: the committed
    // staging copy is re-applied over the affected partitions before merging.
    val tmp = upsertStagingPath(path)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.write.mode("overwrite").parquet(tmp.toString)
    writeStatements(spark.read.parquet(tmp.toString), path)
    fs.delete(tmp, true)
  }

  /**
   * [[upsertStatements]] semantics over a [[ManifestStore]] table — the
   * single-write, manifest-committed upsert path. Same last-writer-wins
   * contract per `(userId, yearMonth)`; the merged partitions are written
   * ONCE into a fresh generation and the manifest rename commits (the
   * staged scheme writes them twice). Partition pruning needs no key
   * collection or IN-list: the manifest names exactly the touched users'
   * current directories. See ManifestStore's crash-safety argument.
   */
  def upsertStatementsManifest(items: DataFrame, path: String, spark: SparkSession): Unit =
    ManifestStore.upsert(items, path, "userId", Seq("userId", "yearMonth"), spark)

  /** Current state of a manifest-committed statements table (None before
    * the first commit), canonical string userId restored. */
  def readStatementsManifest(spark: SparkSession, path: String): Option[DataFrame] =
    ManifestStore.currentFrame(spark, path, "userId")

  /** Partition-pruned read of one user's history, flattened to rows. The
    * equality predicate on the partition column becomes a PartitionFilter —
    * only that user's directory is listed and scanned. */
  def readUserHistory(spark: SparkSession, path: String, userId: String): DataFrame =
    explodeStatements(
      spark.read.parquet(path)
        .where(col("userId") === userId)
        .withColumn("userId", col("userId").cast("string")))
}
