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

  /** Registers a manifest-committed table ([[graft.ops.ManifestStore]]) as
    * a temp view — current snapshot, or a time-travel snapshot when `asOf`
    * is given. The view captures the manifest resolved AT REGISTRATION:
    * a later upsert does not shift the view mid-query-session (re-register
    * to advance), which is exactly the snapshot-isolation contract the
    * immutable generations provide. No data is copied — the view is the
    * manifest-named parquet directories. */
  def registerManifestTable(
      spark: SparkSession, path: String, partCol: String, viewName: String,
      asOf: Option[Long] = None): Boolean = {
    val frame = asOf match {
      case Some(v) => graft.ops.ManifestStore.frameAt(spark, path, partCol, v)
      case None => graft.ops.ManifestStore.currentFrame(spark, path, partCol)
    }
    frame.foreach(_.createOrReplaceTempView(viewName))
    frame.isDefined
  }
}
