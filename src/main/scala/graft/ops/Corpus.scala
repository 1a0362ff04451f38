package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus curation: deterministic sampling and dataset splitting.
 *
 * Both are hash-based (md5-derived, [[TextOps.hash32]]) rather than
 * RNG-based: the same row lands in the same sample/split on every run, on
 * any engine, at any parallelism — which is what makes training-data builds
 * reproducible and incremental (a re-run over 100 TB + 1 new shard keeps
 * every previously-sampled document stable). `spark.sample()` by contrast is
 * seed+partition dependent.
 */
object Corpus {

  /** Uniform bucket in [0, 10000) derived from the row's id. */
  def hashBucket(id: Column): Column =
    TextOps.hash32(id.cast("string")) % 10000

  /** Deterministic `rate` sample (rate in [0,1], 10^-4 resolution). */
  def sampleDeterministic(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashBucket(col(idCol)) < (rate * 10000).toInt)

  /**
   * Deterministic train/validation/test split label from the id hash:
   * buckets [0, train·10⁴) → "train", then validation, remainder → "test".
   */
  def splitLabel(id: Column, train: Double = 0.8, validation: Double = 0.1): Column = {
    val b = hashBucket(id)
    when(b < (train * 10000).toInt, "train")
      .when(b < ((train + validation) * 10000).toInt, "validation")
      .otherwise("test")
  }

  /** Attaches the split label as a `split` column. */
  def withSplit(df: DataFrame, idCol: String,
                train: Double = 0.8, validation: Double = 0.1): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), train, validation))
}
