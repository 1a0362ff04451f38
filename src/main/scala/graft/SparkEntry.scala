package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventQueries, FinQueries, LlmQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §3): flag risky foreign transactions for every
    * user against their home country and historical average — the deepest
    * dependency chain in the reference DAG (S2→J1→A3→A4→F2→C1→C2→C3).
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    FinQueries.queries("q_flag_risky")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-training-data operators (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FinQueries.queries ++ LlmQueries.queries ++ EventQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    FinQueries.oracleSql ++ LlmQueries.oracleSql ++ EventQueries.oracleSql
}
