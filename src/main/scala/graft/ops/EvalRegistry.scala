package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{TextOps => T}

/**
 * Persisted EVAL-SUITE FINGERPRINT REGISTRY — decontamination's
 * production shape at 100 TB: benchmark suites change rarely and are
 * tiny; the training corpus is the full table scan and arrives in
 * batches. Registering a suite ONCE stores its exact content
 * fingerprints and winnowing fingerprints (plus a doc roster) under the
 * manifest protocol, and every later corpus batch gates against the
 * store — the eval TEXT itself is never re-read, never re-fingerprinted,
 * and never has to be distributed to the ingest pipeline at all (the
 * registry is fingerprints only, which also matters when a benchmark's
 * text cannot be shipped to the training environment).
 *
 * Layout: one [[ManifestStore]] table at `dir`, rows
 * `(suite, eval_id, kind, fp)` with `kind ∈ {x = exact md5, w = winnow
 * fingerprint (long as string), d = doc roster}`, PARTITIONED BY SUITE —
 * a gate scoped to one suite prunes every other suite's partitions at
 * the scan. The winnow parameters `(n, w)` pin in a versioned meta file
 * (mismatched fingerprints are incomparable, so an append never gets the
 * chance to mix them — it reads the pinned values). Upserts are keyed on
 * the full row, so re-registering a suite is idempotent. Single-writer
 * per registry, like every store here.
 *
 * Serving tiers (each equals its direct twin over the registered eval
 * set — spec-pinned):
 *  - [[exactContaminationIndexed]] ≡ [[Dedup.crossContamination]];
 *  - [[overlapContaminationIndexed]] ≡ [[Dedup.overlapContamination]];
 *  - [[contaminationReportIndexed]] ≡ [[Dedup.contaminationReport]]
 *    (per-eval-doc rollup INCLUDING clean docs — the roster rows make
 *    fingerprint-less eval docs report clean-as-undetectable exactly
 *    like the direct form);
 *  - [[decontaminateIndexed]] — the one-call GATE: the corpus minus
 *    every document that exact-matches or contains ≥ `threshold` of any
 *    registered eval doc.
 */
object EvalRegistry {

  private val Prefix = "_evalreg"

  /** Whether a registry is fully bootstrapped (data AND pinned meta). */
  def evalRegistryCommitted(spark: SparkSession, dir: String): Boolean =
    ManifestStore.readVersioned(spark, dir, Prefix).isDefined

  /** The pinned winnow parameters `(n, w)`. */
  def registryParams(spark: SparkSession, dir: String): (Int, Int) =
    ManifestStore.readVersioned(spark, dir, Prefix)
      .map { case (_, c) =>
        val kv = c.linesIterator.filter(_.nonEmpty)
          .map(_.split("\t")).map(a => a(0) -> a(1)).toMap
        (kv("n").toInt, kv("w").toInt)
      }
      .getOrElse(throw new IllegalStateException(
        s"no committed eval registry under $dir"))

  /** Long-cast of an eval id that FAILS LOUD when the cast nulls out
    * (round-14 advice): a non-numeric string id (non-ANSI sessions) or a
    * null id would otherwise register roster/exact/winnow rows under
    * `eval_id = null` — merging distinct docs and corrupting every
    * report denominator with no error. A codegen'd `raise_error` in the
    * projection, no extra pass (the calibration-guard pattern). */
  private def evalIdLong(id: Column, idCol: String): Column =
    when(id.cast("long").isNotNull, id.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"eval registry: id column '$idCol' value '"),
        coalesce(id.cast("string"), lit("NULL")),
        lit("' does not cast to a non-null long — rows would register " +
          "under null eval_id, silently merging docs and corrupting " +
          "report denominators; supply numeric ids"))))

  private def registryRows(
      evalSet: DataFrame, idCol: String, textCol: String,
      suite: String, n: Int, w: Int): DataFrame = {
    val roster = evalSet.select(
      lit(suite).as("suite"), evalIdLong(col(idCol), idCol).as("eval_id"),
      lit("d").as("kind"), lit("").as("fp"))
    val exact = evalSet
      .select(evalIdLong(col(idCol), idCol).as("eval_id"),
        T.fingerprint(col(textCol)).as("fp"))
      .where(col("fp").isNotNull)
      .select(lit(suite).as("suite"), col("eval_id"), lit("x").as("kind"), col("fp"))
    val winnow = T.winnowNative(evalSet, idCol, textCol, n, w)
      .select(lit(suite).as("suite"), evalIdLong(col("id"), idCol).as("eval_id"),
        lit("w").as("kind"), col("fp").cast("string").as("fp"))
    roster.unionByName(exact).unionByName(winnow)
  }

  /** Bootstrap the registry with one suite. Fails loud on an
    * already-committed registry — use [[appendToEvalRegistry]] to add
    * suites or docs (the pinned `(n, w)` must govern them all). */
  def writeEvalRegistry(
      evalSet: DataFrame, dir: String, idCol: String, textCol: String,
      suite: String, n: Int = 3, w: Int = 4): Unit = {
    val spark = evalSet.sparkSession
    require(ManifestStore.readVersioned(spark, dir, Prefix).isEmpty,
      s"eval registry already committed under $dir — use appendToEvalRegistry")
    ManifestStore.upsert(
      registryRows(evalSet, idCol, textCol, suite, n, w),
      dir, "suite", Seq("suite", "eval_id", "kind", "fp"), spark)
    ManifestStore.commitVersioned(spark, dir, Prefix, 1L, s"n\t$n\nw\t$w\n")
  }

  /** Register another suite (or more docs of an existing one) under the
    * PINNED winnow parameters. Idempotent per row — re-registering a
    * suite upserts the same keys. */
  def appendToEvalRegistry(
      evalSet: DataFrame, dir: String, idCol: String, textCol: String,
      suite: String): Unit = {
    val spark = evalSet.sparkSession
    val (n, w) = registryParams(spark, dir)
    ManifestStore.upsert(
      registryRows(evalSet, idCol, textCol, suite, n, w),
      dir, "suite", Seq("suite", "eval_id", "kind", "fp"), spark)
  }

  /** The raw registry rows, pruned to `suite` when given (a partition
    * filter — other suites' files are never read). */
  def readEvalRegistry(
      spark: SparkSession, dir: String,
      suite: Option[String] = None): DataFrame = {
    registryParams(spark, dir) // fail loud before the first commit
    val all = ManifestStore.currentFrame(spark, dir, "suite")
      .getOrElse(throw new IllegalStateException(
        s"no committed eval registry under $dir"))
    suite.fold(all)(s => all.where(col("suite") === s))
  }

  /** Registered suite names (bounded: suites are few). */
  def registrySuites(spark: SparkSession, dir: String): Seq[String] =
    readEvalRegistry(spark, dir).select("suite").distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** Exact-tier gate rows `(corpus_id, suite, eval_id)` — the corpus is
    * fingerprinted once and equi-joined against the stored `x` rows
    * (eval-sized → AQE broadcasts them). */
  def exactContaminationIndexed(
      corpus: DataFrame, dir: String, idCol: String, textCol: String,
      suite: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    corpus
      .select(col(idCol).as("corpus_id"), T.fingerprint(col(textCol)).as("fp"))
      .join(readEvalRegistry(spark, dir, suite).where(col("kind") === "x")
        .select("suite", "eval_id", "fp"), "fp")
      .select("corpus_id", "suite", "eval_id")
  }

  /** Overlap-tier gate rows `(corpus_id, suite, eval_id, containment)` at
    * the pinned `(n, w)` — the corpus is winnowed once per call, the
    * stored postings and per-doc denominators come from the registry. */
  def overlapContaminationIndexed(
      corpus: DataFrame, dir: String, idCol: String, textCol: String,
      threshold: Double = 0.8, suite: Option[String] = None): DataFrame =
    overlapScores(corpus, dir, idCol, textCol, suite)
      .where(col("containment") >= threshold)

  private def overlapScores(
      corpus: DataFrame, dir: String, idCol: String, textCol: String,
      suite: Option[String]): DataFrame = {
    val spark = corpus.sparkSession
    val (n, w) = registryParams(spark, dir)
    // the registry feeds two consumers (denominators + the fp join) and
    // is deliberately NOT checkpointed: re-reading an eval-sized parquet
    // twice is cheap, while a localCheckpoint here would leak one cached
    // block per call — and the ingest pipeline calls this PER BATCH on an
    // unbounded stream (the round-5 block-manager-residue lesson)
    val wrows = readEvalRegistry(spark, dir, suite)
      .where(col("kind") === "w").select("suite", "eval_id", "fp")
    val en = wrows.groupBy("suite", "eval_id").agg(count(lit(1)).as("n_eval"))
    val cw = T.winnowNative(corpus, idCol, textCol, n, w)
      .select(col("id").as("corpus_id"), col("fp").cast("string").as("fp"))
    cw.join(wrows, "fp")
      .groupBy("corpus_id", "suite", "eval_id")
      .agg(count(lit(1)).as("shared"))
      .join(en, Seq("suite", "eval_id"))
      .select(col("corpus_id"), col("suite"), col("eval_id"),
        (col("shared").cast("double") / col("n_eval")).as("containment"))
  }

  /** Per-eval-doc rollup served from the store — one row per REGISTERED
    * doc (roster rows), including clean and fingerprint-less ones:
    * `(suite, eval_id, max_containment, n_contaminating, contaminated)`.
    * Equals [[Dedup.contaminationReport]] over the registered eval set
    * (plus the suite column). */
  def contaminationReportIndexed(
      corpus: DataFrame, dir: String, idCol: String, textCol: String,
      threshold: Double = 0.8, suite: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    val scores = overlapScores(corpus, dir, idCol, textCol, suite)
    readEvalRegistry(spark, dir, suite).where(col("kind") === "d")
      .select("suite", "eval_id")
      .join(scores.select("suite", "eval_id", "containment"),
        Seq("suite", "eval_id"), "left")
      .groupBy("suite", "eval_id")
      .agg(
        round(max(coalesce(col("containment"), lit(0.0))), 6)
          .as("max_containment"),
        sum(when(col("containment") >= threshold, 1L).otherwise(0L))
          .as("n_contaminating"))
      .withColumn("contaminated", col("n_contaminating") > 0)
  }

  /** Retire a whole suite — the benchmark-rotation takedown: physically
    * removes its rows under the manifest protocol (`suite` IS the
    * partition column, so the rewrite touches nothing outside the
    * retired suite's partition). Gates stop flagging against it the
    * moment the commit lands; other suites are untouched. */
  def deleteSuite(spark: SparkSession, dir: String, suite: String): Int =
    ManifestStore.delete(
      readEvalRegistry(spark, dir, Some(suite))
        .select("suite", "eval_id", "kind", "fp"),
      dir, "suite", Seq("suite", "eval_id", "kind", "fp"), spark)

  /** The one-call GATE: `corpus` minus every document that exact-matches
    * a registered eval doc OR contains ≥ `threshold` of one (both tiers,
    * any suite unless scoped) — the anti-join the ingest pipeline runs
    * per batch. Cost ∝ the batch's fingerprint mass; the registry side is
    * eval-sized. The corpus lineage executes three times (exact tier,
    * overlap tier, the anti-join back) — materialize an expensive
    * upstream lineage first, as [[graft.streaming.IngestPipeline]] does
    * with its checkpointed `fresh` frame. */
  def decontaminateIndexed(
      corpus: DataFrame, dir: String, idCol: String, textCol: String,
      threshold: Double = 0.8, suite: Option[String] = None): DataFrame = {
    val flagged = exactContaminationIndexed(corpus, dir, idCol, textCol, suite)
      .select("corpus_id")
      .unionByName(
        overlapContaminationIndexed(corpus, dir, idCol, textCol, threshold, suite)
          .select("corpus_id"))
      .distinct()
    corpus.join(flagged.select(col("corpus_id").as(idCol)), Seq(idCol), "left_anti")
  }
}
