package graft.model

import org.apache.spark.sql.types._

/**
 * The unit of data in the financial pipeline: one statement transaction row.
 *
 * Mirrors the reference's 12-column CSV record (see
 * /root/reference/docker/lambda_function.py:58-86 and
 * /root/reference/test_data/user_1_new_statement202412.csv:1), re-expressed as a
 * typed Spark row:
 *
 *  - `amount` ingests as DECIMAL(12,2) (the reference parses `decimal.Decimal`,
 *    lambda_function.py:71) and is cast to Double inside analytics to match the
 *    reference's `float()` casts (lambda_function.py:90,124,147,...).
 *  - `date` ingests as a real DateType instead of the reference's string slicing
 *    (`date[:4]`, `date[:7]`, lambda_function.py:170,244,258) — calendar derivations
 *    use `year()` / `date_format()` so Catalyst can fold and push them.
 *  - `userId` / `yearMonth` stay strings (the reference's DynamoDB `S` keys,
 *    lambda_function.py:470-471); they are the partition columns of the persisted
 *    statements table.
 */
final case class Transaction(
    userId: String,
    yearMonth: String,
    id: String,
    date: java.sql.Date,
    vendor: String,
    category: String,
    amount: java.math.BigDecimal,
    currency: String,
    recurring: Boolean,
    txType: String,
    location: String,
    description: String
)

object Transaction {

  /** Money precision used at the ingest boundary (DECIMAL(12,2) ≙ the reference's
    * two-decimal `Decimal` values). */
  val MoneyType: DecimalType = DecimalType(12, 2)

  /** Raw CSV schema: exact reference header names (`transactions.`-prefixed).
    * Everything is read as string and coerced in [[graft.ops.FinOps.ingestStatement]]
    * so a malformed row surfaces as a null we can police, instead of a crash
    * (the reference aborts the whole load on one bad row, lambda_function.py:84-85). */
  val csvSchema: StructType = StructType(Seq(
    StructField("UserId", StringType),
    StructField("YearMonth", StringType),
    StructField("transactions.id", StringType),
    StructField("transactions.date", StringType),
    StructField("transactions.vendor", StringType),
    StructField("transactions.category", StringType),
    StructField("transactions.amount", StringType),
    StructField("transactions.currency", StringType),
    StructField("transactions.recurring", StringType),
    StructField("transactions.type", StringType),
    StructField("transactions.location", StringType),
    StructField("transactions.description", StringType)
  ))

  /** Post-ingest flat schema (field order = case class order). */
  val schema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("yearMonth", StringType),
    StructField("id", StringType),
    StructField("date", DateType),
    StructField("vendor", StringType),
    StructField("category", StringType),
    StructField("amount", MoneyType),
    StructField("currency", StringType),
    StructField("recurring", BooleanType),
    StructField("txType", StringType),
    StructField("location", StringType),
    StructField("description", StringType)
  ))

  /** The 10 non-key fields nested into the persisted statements item
    * (reference DynamoDB item shape `{UserId, YearMonth, transactions: List[Map]}`,
    * lambda_function.py:467-474). */
  val nestedFields: Seq[String] = Seq(
    "id", "date", "vendor", "category", "amount",
    "currency", "recurring", "txType", "location", "description")
}
