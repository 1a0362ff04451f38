package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, EvalRegistry, ManifestStore}

/**
 * Persisted eval-suite fingerprint registry ([[graft.ops.EvalRegistry]]):
 * every indexed serving tier equals its direct twin over the registered
 * eval set, suites prune at the partition level, fingerprint-less docs
 * ride the roster, and the one-call gate removes exactly the union of
 * the exact and overlap tiers.
 */
class EvalRegistrySpec extends SparkSpec {
  import spark.implicits._

  // corpus: 20 docs of distinctive 12-token texts (mod 97 keeps every
  // doc's token sequence unique — a mod sharing a factor with the stride
  // would plant accidental exact duplicates)
  private def corpus: DataFrame = (0 until 20).map { i =>
    (i.toLong, (0 until 12).map(k => s"tok${(i * 5 + k * 3) % 97}").mkString(" "))
  }.toDF("doc_id", "text")

  // eval suite: doc 100 = exact copy of corpus doc 3; doc 101 = the middle
  // 8 tokens of corpus doc 7 (overlap tier); doc 102 = clean distinct text;
  // doc 103 = too short to fingerprint (roster-only: clean-as-undetectable)
  private def evalMain: DataFrame = {
    val c = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    Seq(
      (100L, c(3L)),
      (101L, c(7L).split(" ").slice(2, 10).mkString(" ")),
      (102L, (0 until 12).map(k => s"zzz$k").mkString(" ")),
      (103L, "a b")).toDF("doc_id", "text")
  }

  test("indexed tiers equal their direct twins; the report covers roster docs " +
    "including clean and fingerprint-less; the gate removes exactly exact ∪ overlap") {
    GraftExtensions.register(spark)
    val dir = tmpDir("evalreg")
    EvalRegistry.writeEvalRegistry(evalMain, dir, "doc_id", "text", "main")
    assert(EvalRegistry.evalRegistryCommitted(spark, dir))
    assert(EvalRegistry.registryParams(spark, dir) == ((3, 4)))

    // exact tier ≡ direct
    val exIdx = EvalRegistry.exactContaminationIndexed(corpus, dir, "doc_id", "text")
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    val exDirect = Dedup.crossContamination(corpus, evalMain, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(exIdx == exDirect && exIdx.contains((3L, 100L)), exIdx.toString)

    // overlap tier ≡ direct (same threshold, same pinned (n, w))
    val ovIdx = EvalRegistry.overlapContaminationIndexed(
        corpus, dir, "doc_id", "text", threshold = 0.8)
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    val ovDirect = Dedup.overlapContamination(
        corpus, evalMain, "doc_id", "text", threshold = 0.8)
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(ovIdx == ovDirect && ovIdx.contains((7L, 101L)), ovIdx.toString)

    // report ≡ direct + suite column; roster carries clean (102) and
    // fingerprint-less (103) docs as clean rows
    val repIdx = EvalRegistry.contaminationReportIndexed(
        corpus, dir, "doc_id", "text", threshold = 0.8)
      .select("eval_id", "max_containment", "n_contaminating", "contaminated")
      .as[(Long, Double, Long, Boolean)].collect().toSet
    val repDirect = Dedup.contaminationReport(
        corpus, evalMain, "doc_id", "text", threshold = 0.8)
      .as[(Long, Double, Long, Boolean)].collect().toSet
    assert(repIdx == repDirect, s"$repIdx vs $repDirect")
    assert(repIdx.exists(r => r._1 == 103L && !r._4),
      "fingerprint-less doc must report clean-as-undetectable")
    assert(repIdx.size == 4)

    // the gate: survivors = corpus minus (exact ∪ overlap) corpus ids
    val flagged = exIdx.map(_._1) ++ ovIdx.map(_._1)
    val kept = EvalRegistry.decontaminateIndexed(
        corpus, dir, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == corpus.select("doc_id").as[Long].collect().toSet -- flagged)
  }

  test("suites partition-prune and compose: a second suite's matches appear only " +
    "unscoped or under its own name; re-registering is idempotent") {
    GraftExtensions.register(spark)
    val dir = tmpDir("evalreg_suites")
    EvalRegistry.writeEvalRegistry(evalMain, dir, "doc_id", "text", "main")
    // second suite: exact copy of corpus doc 11
    val c11 = corpus.where($"doc_id" === 11L).select($"text").as[String].head()
    EvalRegistry.appendToEvalRegistry(
      Seq((200L, c11)).toDF("doc_id", "text"), dir, "doc_id", "text", "v2")
    assert(EvalRegistry.registrySuites(spark, dir) == Seq("main", "v2"))

    val all = EvalRegistry.exactContaminationIndexed(corpus, dir, "doc_id", "text")
      .select("suite", "corpus_id", "eval_id").as[(String, Long, Long)].collect().toSet
    assert(all == Set(("main", 3L, 100L), ("v2", 11L, 200L)))
    val scoped = EvalRegistry.exactContaminationIndexed(
        corpus, dir, "doc_id", "text", suite = Some("v2"))
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(scoped == Set((11L, 200L)))
    // suite scoping reaches the SCAN as a partition filter
    val plan = EvalRegistry.readEvalRegistry(spark, dir, Some("v2"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("suite") && (plan.contains("PartitionFilters") ||
      plan.contains("PushedFilters")), plan.take(800))
    // idempotent re-register: same keys upsert, no duplicate rows
    val before = EvalRegistry.readEvalRegistry(spark, dir).count()
    EvalRegistry.appendToEvalRegistry(
      Seq((200L, c11)).toDF("doc_id", "text"), dir, "doc_id", "text", "v2")
    assert(EvalRegistry.readEvalRegistry(spark, dir).count() == before)
    // scoping the report to one suite covers exactly its roster
    val rep = EvalRegistry.contaminationReportIndexed(
        corpus, dir, "doc_id", "text", suite = Some("v2"))
      .select("eval_id").as[Long].collect().toSeq
    assert(rep == Seq(200L))

    // the SQL face of the gate: graft_decontaminate == the Scala call
    corpus.createOrReplaceTempView("evalreg_corpus")
    val sql = spark.sql(
      s"SELECT doc_id FROM graft_decontaminate('evalreg_corpus', 'doc_id', " +
        s"'text', '$dir', 0.8) ORDER BY doc_id").as[Long].collect().toSeq
    val scala = EvalRegistry.decontaminateIndexed(
        corpus, dir, "doc_id", "text", 0.8)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(sql == scala && !sql.contains(11L))

    // suite retirement: the v2 partition rewrites away, "main" untouched,
    // and the unscoped gate stops flagging v2's match immediately
    val removed = EvalRegistry.deleteSuite(spark, dir, "v2")
    assert(removed > 0)
    assert(EvalRegistry.registrySuites(spark, dir) == Seq("main"))
    val after = EvalRegistry.exactContaminationIndexed(corpus, dir, "doc_id", "text")
      .select("corpus_id").as[Long].collect().toSet
    assert(after == Set(3L), after.toString)
    assert(EvalRegistry.decontaminateIndexed(corpus, dir, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet.contains(11L),
      "retired suite still gating")
  }

  test("guards: bootstrap-once fails loud; reads before the first commit fail " +
    "loud; the meta pins (n, w) for appends") {
    GraftExtensions.register(spark)
    val dir = tmpDir("evalreg_guards")
    intercept[IllegalStateException] {
      EvalRegistry.readEvalRegistry(spark, dir)
    }
    EvalRegistry.writeEvalRegistry(
      evalMain, dir, "doc_id", "text", "main", n = 4, w = 5)
    assert(EvalRegistry.registryParams(spark, dir) == ((4, 5)))
    val ex = intercept[IllegalArgumentException] {
      EvalRegistry.writeEvalRegistry(evalMain, dir, "doc_id", "text", "again")
    }
    assert(ex.getMessage.contains("already committed"))
    // appends inherit the pinned params: the served overlap equals the
    // direct form at (4, 5), not the defaults
    val ov = EvalRegistry.overlapContaminationIndexed(
        corpus, dir, "doc_id", "text", threshold = 0.8)
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    val direct = Dedup.overlapContamination(
        corpus, evalMain, "doc_id", "text", threshold = 0.8, n = 4, w = 5)
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(ov == direct)
  }
}
