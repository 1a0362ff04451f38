package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.FinOps
import graft.pipeline.FinancialPipeline
import graft.queries.Tpch
import graft.report.ReportRenderer

/**
 * End-to-end pipeline benchmark — times the full flagship DAG the unit and
 * golden specs only exercise at fixture scale (36 rows): history read →
 * analyze (all eight analytics) → report assembly → JSON report write →
 * statements-table upsert → chart-data derivation → per-user HTML render.
 * This is the whole of the reference's `lambda_handler` (LF:483-554) as one
 * distributed batch, measured at the driver's scale factor.
 *
 * Setup (unmeasured, like a deployment whose statements table already
 * exists): the canonical transaction frame is split on its maximum
 * yearMonth — the latest month plays the freshly-ingested statement batch,
 * everything earlier is upserted into a statements table first. The measured
 * phases then are:
 *
 *  - `run_batch`  — [[FinancialPipeline.runBatch]]: history load+persist, the
 *    eight analytics, report assembly, the JSON report write, and the
 *    last-writer-wins upsert of the new month. The report write forces every
 *    per-month analytic exactly once.
 *  - `render_charts` — [[FinancialPipeline.chartData]] over the same results
 *    plus [[ReportRenderer.write]]: the long-format chart frame re-forces the
 *    analytics (from the persisted history) and fans out one HTML document
 *    per user-month via `groupByKey.mapGroups`.
 *
 * A full pass at sf0.001 first warms codegen/datasource one-time costs so
 * the measured numbers are warm times (same rationale as [[Bench]]).
 *
 * Emits ONE JSON line and writes it to `BENCH_PIPELINE.json` in the cwd.
 */
object BenchPipeline {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One full pass at `sfDir`; returns (phase → secs, counters). */
  private def pass(spark: SparkSession, sfDir: String): (Seq[(String, Double)], Map[String, Long]) = {
    val work = Files.createTempDirectory("graft-bench-pipeline").toString
    val statementsPath = s"$work/statements"
    val reportPath = s"$work/reports"
    val chartsPath = s"$work/charts"

    val tx = Tpch.ordersTx(spark, sfDir)
    // The statement batch is the latest FULL month: TPC-H orders end Aug 2
    // 1998, so the raw max(yearMonth) holds ~2% of a month's rows — a
    // 64-row batch against 150k history measures nothing. "Full" = at least
    // half the peak monthly volume; latest such month wins.
    val counts = tx.groupBy("yearMonth").count()
    val peak = counts.agg(max("count")).head().getLong(0)
    val batchYm = counts.where(col("count") >= peak / 2)
      .agg(max("yearMonth")).head().getString(0)
    val cur = tx.where(col("yearMonth") === batchYm)
    val hist = tx.where(col("yearMonth") =!= batchYm)

    // Unmeasured seed: the pre-existing statements table. (Timed anyway and
    // reported as `seed_history` for context — it is a one-time table build,
    // not per-batch work.)
    val (_, tSeed) = time {
      FinOps.upsertStatements(FinOps.toStatementItems(hist), statementsPath, spark)
    }
    System.err.println(f"[pipeline] $sfDir seed_history ${tSeed}%.1fs")

    val (results, tBatch) = time {
      FinancialPipeline.runBatch(cur, statementsPath, Some(reportPath), spark)
    }
    System.err.println(f"[pipeline] $sfDir run_batch ${tBatch}%.1fs")

    // Chart rendering is scoped to the batch's users (the reference renders
    // charts only for the statement groups it processed, LF:511-521);
    // unscoped, every historical user gets a monthly-trend-only document.
    val (_, tCharts) = time {
      ReportRenderer.write(
        FinancialPipeline.chartData(results)
          .join(cur.select("userId").distinct(), Seq("userId"), "left_semi"),
        chartsPath)
    }
    System.err.println(f"[pipeline] $sfDir render_charts ${tCharts}%.1fs")

    val counters = Map(
      "cur_rows" -> cur.count(),
      "hist_rows" -> hist.count(),
      "report_rows" -> spark.read.json(reportPath).count(),
      // one partition dir per rendered user-month document
      "chart_docs" -> spark.read.text(chartsPath)
        .select("userId", "yearMonth").distinct().count())

    // Upsert-cost experiment (round-7): the same seed + batch through the
    // staged double-write vs the manifest-committed single write, isolated
    // from the analytics so the delta is the durability scheme alone.
    // `upsert_staged` re-measures FinOps.upsertStatements of the batch into
    // a fresh copy of the seeded table; `upsert_manifest` measures
    // FinOps.upsertStatementsManifest into a manifest table seeded with the
    // same history. Crash-safety analysis: ManifestStore scaladoc.
    val stagedDir = s"$work/statements_staged"
    val manifestDir = s"$work/statements_manifest"
    val histItems = FinOps.toStatementItems(hist)
    val curItems = FinOps.toStatementItems(cur)
    val (_, tSeedStaged) = time { FinOps.upsertStatements(histItems, stagedDir, spark) }
    val (_, tUpStaged) = time { FinOps.upsertStatements(curItems, stagedDir, spark) }
    System.err.println(f"[pipeline] $sfDir upsert_staged ${tUpStaged}%.1fs (seed ${tSeedStaged}%.1fs)")
    val (_, tSeedManifest) = time { FinOps.upsertStatementsManifest(histItems, manifestDir, spark) }
    val (_, tUpManifest) = time { FinOps.upsertStatementsManifest(curItems, manifestDir, spark) }
    System.err.println(f"[pipeline] $sfDir upsert_manifest ${tUpManifest}%.1fs (seed ${tSeedManifest}%.1fs)")

    // Release the per-pass persisted history so the sf0.001 warm pass leaves
    // no block-manager residue in the measured pass (Bench.scala rationale).
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    (Seq(
      "seed_history" -> tSeed, "run_batch" -> tBatch, "render_charts" -> tCharts,
      "seed_staged" -> tSeedStaged, "upsert_staged" -> tUpStaged,
      "seed_manifest" -> tSeedManifest, "upsert_manifest" -> tUpManifest),
      counters)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalescing starts from here and merges down (parallelismFirst
      // keeps small stages wide): big shuffles keep up to 8x the reduce
      // parallelism instead of 10x-fatter partitions that spill
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // without this, persisted frames (the clustering loops' edge cache)
      // materialize at the UNcoalesced initial width — 256-task stages per
      // iteration on tiny cached data (measured 4.3s -> 7.2s on
      // q_dedup_clusters at sf0.1); with it AQE re-plans below the cache
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")

    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory && warm != sfDir)
      try pass(spark, warm) catch { case _: Throwable => () }

    val (phases, counters) = pass(spark, sfDir)

    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // pipeline_total stays comparable across rounds: the per-batch DAG only
    // (the seed phases and the upsert-scheme experiment report separately)
    val measured = phases.collect {
      case (k, v) if k == "run_batch" || k == "render_charts" => v
    }.sum
    val phaseJson = phases.map { case (k, v) => s""""$k":${num(v)}""" }.mkString("{", ",", "}")
    val counterJson = counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"pipeline_total","value":${num(measured)},"unit":"sec",""" +
        s""""phases":$phaseJson,"counters":$counterJson,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("BENCH_PIPELINE.json"), line + "\n")
    spark.stop()
  }
}
