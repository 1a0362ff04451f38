package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Iso3166, Transaction}

/**
 * Adapts the driver's TPC-H-ish test tables (`TESTDATA.md`) into the canonical
 * transaction frame so the financial operators in [[graft.ops.FinOps]] can be
 * exercised — and oracle-checked — at scale. The same nation→ISO mapping feeds
 * both the Spark adapter and the DuckDB oracle CTE ([[txCte]]), so there is a
 * single source of truth for the synthetic "location" column.
 *
 * Mapping: one order = one transaction. `o_custkey` → userId, `o_orderdate` →
 * date/yearMonth, `o_orderpriority` → vendor (5 values), `o_orderstatus` →
 * category, `o_totalprice` → amount, and the customer's nation → an ISO-3166
 * alpha-2 code rendered as the reference's "CC-REGION" location string.
 */
object Tpch {

  /** nationkey (0–24) → ISO-3166 alpha-2. Arbitrary but fixed; all codes
    * resolve in [[graft.model.Iso3166]] and none contain SQL-quoting hazards. */
  val nationIso: Seq[(Int, String)] = Seq(
    0 -> "US", 1 -> "CA", 2 -> "FR", 3 -> "DE", 4 -> "GB",
    5 -> "JP", 6 -> "CN", 7 -> "IN", 8 -> "BR", 9 -> "AU",
    10 -> "MX", 11 -> "ES", 12 -> "IT", 13 -> "NL", 14 -> "SE",
    15 -> "NO", 16 -> "DK", 17 -> "FI", 18 -> "PL", 19 -> "RU",
    20 -> "ZA", 21 -> "AR", 22 -> "CL", 23 -> "EG", 24 -> "KE")

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") readEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$table.parquet")

  /** The events table's `ts` physical type has varied across testdata
    * generations: ns-precision timestamps (which Spark 4 refuses to read as
    * TimestampType — read as raw longs under `nanosAsLong` and truncate to µs
    * with integer division; ns epochs exceed 2^53, never via doubles) or
    * plain µs timestamps (arrive as TIMESTAMP_NTZ — cast to session-local
    * TimestampType, value-identical under the UTC session TZ every entry
    * point pins). Dispatch on the observed schema so both generations read
    * to the same canonical column type. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        // fail loud: a string/double ts from an unexpected regeneration
        // would otherwise cast silently (possibly to nulls) and shift
        // every event-time semantic downstream
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — expected " +
            "ns-as-long (legacy nanos) or a timestamp type")
    }
  }

  /**
   * Orders as canonical transactions. The two dimension joins (nation, the
   * 25-row ISO map) are explicit broadcasts; customer is broadcast too — it
   * is 1/10th of orders and the join key is its primary key.
   *
   * The transaction "location" nation is `(c_nationkey + o_orderkey % 7) % 25`
   * — mostly-stable per customer but varied across orders, so the
   * home-country mode has real ties to break and the foreign-transaction
   * predicate selects a nonempty, non-total subset.
   */
  /** Session-scoped memo of the adapter output. Every contract query starts
    * from this frame, and Verify/Bench re-derive it dozens of times per run;
    * a real deployment materializes the canonical frame once and fans
    * analytics out from it — the memo gives the bench the same economics.
    * MEMORY_AND_DISK so larger scale factors spill instead of OOM. Keyed by
    * session OBJECT identity (no identity-hash collision can hand a new
    * session a frame bound to a dead context), and entries of STOPPED
    * sessions are purged on every access — weak references alone would not
    * collect them, since a cached DataFrame strongly references its own
    * session. */
  private val txMemo =
    new java.util.IdentityHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  def ordersTx(spark: SparkSession, sfDir: String): DataFrame = txMemo.synchronized {
    val dead = txMemo.entrySet().iterator()
    while (dead.hasNext) {
      if (dead.next().getKey.sparkContext.isStopped) dead.remove()
    }
    var perSession = txMemo.get(spark)
    if (perSession == null) {
      perSession = scala.collection.mutable.Map.empty[String, DataFrame]
      txMemo.put(spark, perSession)
    }
    perSession.getOrElseUpdate(
      sfDir,
      buildOrdersTx(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private def buildOrdersTx(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = read(spark, sfDir, "orders")
    val customer = read(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey")
    val nation = read(spark, sfDir, "nation")
    val iso = nationIso.toDF("nk", "a2")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .withColumn("loc_nk", (col("c_nationkey") + col("o_orderkey") % 7) % 25)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(iso), col("loc_nk") === col("nk"))
      .select(
        col("o_custkey").cast("string").as("userId"),
        date_format(col("o_orderdate"), "yyyyMM").as("yearMonth"),
        col("o_orderkey").cast("string").as("id"),
        col("o_orderdate").cast("date").as("date"),
        col("o_orderpriority").as("vendor"),
        col("o_orderstatus").as("category"),
        col("o_totalprice").cast(Transaction.MoneyType).as("amount"),
        lit("USD").as("currency"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("recurring"),
        col("o_orderstatus").as("txType"),
        concat(col("a2"), lit("-R"), col("n_regionkey").cast("string")).as("location"),
        concat(lit("order "), col("o_orderkey").cast("string")).as("description"))
  }

  /** DuckDB CTE defining the identical `tx` relation plus the `iso` dimension
    * (nationkey, alpha2, country-name) — country names interpolated from
    * [[graft.model.Iso3166]] so P4/J1 oracles share the bundled dimension. */
  val txCte: String = {
    val isoRows = nationIso
      .map { case (nk, a2) => s"($nk, '$a2', '${Iso3166.name(a2).get}')" }
      .mkString(", ")
    s"""WITH iso(nk, a2, country) AS (VALUES $isoRows),
       |tx AS (
       |  SELECT CAST(o_custkey AS VARCHAR) AS userId,
       |         strftime(o_orderdate, '%Y%m') AS yearMonth,
       |         CAST(o_orderkey AS VARCHAR) AS id,
       |         CAST(o_orderdate AS DATE) AS date,
       |         o_orderpriority AS vendor,
       |         o_orderstatus AS category,
       |         CAST(o_totalprice AS DECIMAL(12,2)) AS amount,
       |         'USD' AS currency,
       |         o_orderpriority IN ('1-URGENT', '2-HIGH') AS recurring,
       |         o_orderstatus AS txType,
       |         a2 || '-R' || CAST(n_regionkey AS VARCHAR) AS location,
       |         'order ' || CAST(o_orderkey AS VARCHAR) AS description
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN iso ON (c_nationkey + o_orderkey % 7) % 25 = nk
       |)""".stripMargin
  }
}
