package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Schema'd JSONL (newline-delimited JSON) corpus ingest — the lingua franca
 * of LLM training-data interchange (crawl dumps, dataset hub exports,
 * inter-stage handoffs all ship as `*.jsonl[.gz]`).
 *
 * Two non-negotiables at 100 TB drive the shape of [[read]]:
 *
 *  - '''Explicit schema, never inference.''' Schema inference costs a full
 *    extra pass over the data before the real one, and on a sharded corpus
 *    different shards can infer different schemas (a field that is null in
 *    one shard and numeric in another). The caller states the contract; the
 *    reader projects exactly those fields and prunes the rest at parse time
 *    (a JSON tokenizer skip, not a parse-then-drop).
 *
 *  - '''Malformed lines are counted, not fatal and not silent.''' A real
 *    crawl dump always contains truncated/garbled lines. FAILFAST would let
 *    one bad byte kill a 100 TB job; DROPMALFORMED makes rows vanish with
 *    no ledger entry. PERMISSIVE with a corrupt-record column keeps the raw
 *    line (every typed column null) so ingest health is a first-class,
 *    queryable fact — [[ingestStats]] is the per-group ledger.
 */
object Jsonl {

  /**
   * Read a JSONL path with an explicit `schema` in PERMISSIVE mode.
   * Well-formed lines parse into the typed columns; malformed lines land
   * whole in `corruptCol` with every schema column null. The returned frame
   * carries `schema` plus the string `corruptCol` appended.
   */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /**
   * Ingest-health ledger: one row per `groupCol` value with parsed-row
   * count and payload mass, plus one null-group row carrying the corrupt
   * count (a corrupt line parses no group key, so it lands in the null
   * group by construction). One hash aggregate — the ledger costs nothing
   * beyond the scan that ingest already pays.
   */
  def ingestStats(
      df: DataFrame, groupCol: String, massCol: Column,
      corruptCol: String = "_corrupt"): DataFrame =
    df.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(massCol).as("mass"),
        count(col(corruptCol)).as("n_corrupt"))
}
