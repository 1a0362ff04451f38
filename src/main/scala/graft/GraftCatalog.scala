package graft

import org.apache.spark.sql.SparkSession

import graft.ops.FinOps
import graft.queries.Tpch

/**
 * SQL surface: registers the engine's relations as temp views so everything
 * is queryable via `spark.sql(...)` alongside the DataFrame API — together
 * with [[GraftExtensions]] (native functions) this is the full SQL-first
 * entry point.
 *
 * Views: the raw test tables, the canonical `transactions` frame, and
 * (optionally) a statements table's flattened `history`.
 */
object GraftCatalog {

  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    GraftExtensions.register(spark)
    tables.foreach(t => Tpch.read(spark, sfDir, t).createOrReplaceTempView(t))
    Tpch.ordersTx(spark, sfDir).createOrReplaceTempView("transactions")
  }

  /** Adds the flattened statements-table history as the `history` view. */
  def registerHistory(spark: SparkSession, statementsPath: String): Unit =
    graft.pipeline.FinancialPipeline.loadHistory(spark, statementsPath)
      .createOrReplaceTempView("history")
}
