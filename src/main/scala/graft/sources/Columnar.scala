package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Columnar-format interop beyond parquet: ORC, via Spark's built-in
 * datasource. ORC is a first-class citizen of the same scan pipeline as
 * parquet — predicate pushdown (`PushedFilters`), column pruning
 * (`ReadSchema`), and partition pruning all apply, so a lakehouse standing
 * on ORC files gets the identical plan shapes this library pins for
 * parquet (PlanAuditSpec carries an ORC pushdown pin).
 *
 * Avro is deliberately absent: the `spark-avro` datasource module is not
 * on this distribution's classpath (only Avro's core serialization jars
 * ride along for Spark's internal use), and a fail-at-runtime format row
 * would be worse than a documented boundary.
 */
object Columnar {

  /** Writes `df` to `path` as ORC once (`_SUCCESS`-guarded idempotent
    * materialization — reruns reuse the files) and reads it back through
    * the ORC scan. The returned frame's lineage STARTS at the ORC files,
    * so downstream filters and projections push into the ORC reader
    * rather than replaying `df`'s plan.
    *
    * SINGLE-WRITER contract, stated plainly: the exists-check + overwrite
    * is not atomic — two concurrent callers on one path can both miss the
    * guard and race the write, and a reader can observe a half-written
    * mirror (no manifest protocol here; this is a scratch materialization
    * helper, not a store). Route shared artifacts through
    * [[graft.ops.ManifestStore]] instead. */
  def orcMirror(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val hfs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(done)) df.write.mode("overwrite").orc(path)
    spark.read.orc(path)
  }
}
