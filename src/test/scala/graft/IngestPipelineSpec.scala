package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.ManifestStore
import graft.streaming.IngestPipeline

/**
 * The composed ingest pipeline end-to-end ([[graft.streaming.IngestPipeline]]):
 * drift scored per batch, per-source caps enforced, within- and cross-batch
 * content duplicates dropped, survivors landing in the manifest-committed
 * table — with the ledger accounting for every row's fate.
 */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: drift + rate limit + dedup + manifest upsert compose") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("ingest_pipe")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val residentBefore = spark.sparkContext.getPersistentRDDs.size
    val reports = mutable.Buffer.empty[IngestPipeline.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val (q, _) = IngestPipeline.start(
      ms.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 3L)(reports += _)
    try {
      // batch 0: within-batch content dup (doc 3 repeats doc 1's text
      // under another source), everything under the cap, mix ~reference
      ms.addData((1L, "alpha", "a"), (2L, "beta", "a"), (3L, "alpha", "b"))
      q.processAllAvailable()
      // batch 1: a cross-batch dup (doc 4 = "alpha"), a 5-row burst from a
      // NEW source c (cap admits 3), mix far from reference
      ms.addData((4L, "alpha", "a"), (5L, "g1", "c"), (6L, "g2", "c"),
        (7L, "g3", "c"), (8L, "g4", "c"), (9L, "g5", "c"))
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.size == 2, reports.toString)
    val r0 = reports(0)
    assert((r0.nIn, r0.nAdmitted, r0.nFresh) == ((3L, 3L, 2L)), r0.toString)
    assert(!r0.drifted, s"near-reference mix must not flag: $r0")
    val r1 = reports(1)
    // 6 in; doc 4 + three of c admitted (the cap rejects g4, g5);
    // doc 4's content is already in the store -> 3 fresh
    assert((r1.nIn, r1.nAdmitted, r1.nFresh) == ((6L, 4L, 3L)), r1.toString)
    assert(r1.drifted, s"a new-source burst must flag drift: $r1")

    // the table holds exactly the fresh survivors, atomically committed
    val table = ManifestStore.currentFrame(spark, dir, "source").get
      .select("id").as[Long].collect().toSet
    assert(table == Set(1L, 2L, 5L, 6L, 7L), table.toString)
    // partition b never materialized (its only row deduped away)
    val m = ManifestStore.readManifest(spark, dir).get
    assert(m.entries.keySet == Set("a", "c"), m.entries.toString)
    // per-batch checkpoints are RELEASED: only the long-lived state (the
    // fingerprint store + the monitor's reference counts) may remain
    // resident after the stream stops — a leak here grows per batch and
    // squeezes execution memory on an unbounded stream
    val residentAfter = spark.sparkContext.getPersistentRDDs.size
    assert(residentAfter <= residentBefore + 2,
      s"checkpoint residue: $residentBefore resident before, $residentAfter after")
  }

  test("per-row gate rides the pipeline: und/quality rejects drop before " +
    "dedup, the fingerprint store never learns them, report arithmetic holds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.GraftExtensions.register(spark)
    val dir = tmpDir("ingest_gate")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val reports = mutable.Buffer.empty[IngestPipeline.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val gate = graft.ops.TextOps.langIdNgram($"text") =!= "und"
    val (q, _) = IngestPipeline.start(
      ms.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 10L, gate = Some(gate))(reports += _)
    try {
      // batch 0: two real-language docs + one keyboard-mash doc (the gate
      // rejects it) + a dup of doc 1's text
      ms.addData(
        (1L, "the children walked to the school in the morning", "a"),
        (2L, "xqzv wkjq pfft zzzz qqq xxkj vvwp", "a"), // gate reject
        (3L, "the children walked to the school in the morning", "b"), // dup
        (4L, "los estudiantes terminaron sus deberes antes de la cena", "b"))
      q.processAllAvailable()
      // batch 1: the SAME garbage text again — it must be gate-rejected
      // again (nGated), NOT deduped (the store never fingerprinted it)
      ms.addData((5L, "xqzv wkjq pfft zzzz qqq xxkj vvwp", "a"))
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.size == 2, reports.toString)
    val r0 = reports(0)
    assert((r0.nIn, r0.nAdmitted, r0.nGated, r0.nFresh) == ((4L, 4L, 3L, 2L)),
      r0.toString)
    val r1 = reports(1)
    // the garbage doc drops at the GATE again — dedup never saw it, so
    // nGated = 0 and the duplicate count stays 0, proving the store did
    // not grow with a discarded row
    assert((r1.nIn, r1.nAdmitted, r1.nGated, r1.nFresh) == ((1L, 1L, 0L, 0L)),
      r1.toString)
    val table = ManifestStore.currentFrame(spark, dir, "source").get
      .select("id").as[Long].collect().toSet
    assert(table == Set(1L, 4L), table.toString)
  }

  test("card ledger rides the ingest: fold over the per-batch frames == " +
    "the dataset card of exactly what the table accumulated") {
    import graft.ops.{Corpus, SketchLedger}
    import org.apache.spark.sql.functions.{col, length}
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("ingest_card")
    val ledger = tmpDir("ingest_card_ledger")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val ms = MemoryStream[(Long, String, String)]
    val (q, _) = IngestPipeline.start(
      ms.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 10L,
      cardLedger = Some(ledger))(_ => ())
    try {
      ms.addData((1L, "alpha", "a"), (2L, "beta", "a"), (3L, "alpha", "b"))
      q.processAllAvailable()
      ms.addData((4L, "alpha", "a"), (5L, "gamma delta", "c"))
      q.processAllAvailable()
    } finally q.stop()
    // two batches with fresh survivors → two committed card frames
    assert(SketchLedger.status(spark, ledger).get._2 == 2)
    val folded = Corpus.cardFold(SketchLedger.read(spark, ledger).get)
      .collect()(0)
    // the reference card: EXACTLY the table's accumulated rows, with the
    // pipeline's column mapping (label sets = source twice, chars = len)
    val table = ManifestStore.currentFrame(spark, dir, "source").get
    val want = Corpus.cardFold(Corpus.cardFrame(
        table.withColumn("_len", length(col("text")).cast("long")),
        "text", "source", "source", "_len"))
      .collect()(0)
    for (f <- Seq("n_docs", "n_null_text", "n_langs", "n_sources",
        "total_tokens", "total_chars", "n_distinct_texts"))
      assert(folded.getAs[Long](f) == want.getAs[Long](f),
        s"$f: ledger ${folded.getAs[Long](f)} != table ${want.getAs[Long](f)}")

    // exactly-once across crash replay: the pipeline stamped each append
    // with q=<queryId>/batch=<id> (r15 — the query id is checkpoint-stable,
    // so recovery replays match while a NEW checkpoint lineage gets a
    // fresh namespace instead of colliding with these tags), so
    // re-delivering a batch's card frame under the SAME lineage + id is a
    // no-op — ledger fold == table card with no compact needed
    val tags = SketchLedger.tags(spark, ledger)
    assert(tags == Seq(s"q=${q.id}/batch=0", s"q=${q.id}/batch=1"),
      s"tags must be query-id-namespaced batch ids, got $tags")
    val replayFrame = Corpus.cardFrame(
      Seq((4L, "alpha", "a"), (5L, "gamma delta", "c")).toDF("id", "text", "source")
        .withColumn("_len", length(col("text")).cast("long")),
      "text", "source", "source", "_len")
    assert(SketchLedger.append(replayFrame, ledger, tag = Some(s"q=${q.id}/batch=1")) == 2L,
      "replayed batch must return the current version without appending")
    assert(SketchLedger.status(spark, ledger).get._2 == 2, "replay appended a frame")
    val refolded = Corpus.cardFold(SketchLedger.read(spark, ledger).get).collect()(0)
    assert(refolded.getAs[Long]("n_docs") == want.getAs[Long]("n_docs"))
    // a SECOND stream (fresh lineage) re-feeding the same rows under its
    // own batch 1 must NOT collide with this lineage's tags — the r14
    // advice hole: bare batch=1 would have silently skipped it
    assert(SketchLedger.append(replayFrame, ledger,
      tag = Some("q=other-lineage/batch=1")) == 3L,
      "a fresh checkpoint lineage's batch must append, not collide")
  }

  test("decontamination gate rides the pipeline: registered eval content never " +
    "reaches the table or the card ledger; the report accounts the drop") {
    import graft.ops.{Corpus, EvalRegistry, SketchLedger}
    import org.apache.spark.sql.functions.{col, length}
    implicit val ctx = spark.sqlContext
    GraftExtensions.register(spark)
    val dir = tmpDir("ingest_decon")
    val ledger = tmpDir("ingest_decon_ledger")
    val reg = tmpDir("ingest_decon_reg")
    // registry: one benchmark doc whose text will arrive in the stream
    EvalRegistry.writeEvalRegistry(
      Seq((900L, "leaked benchmark answer text")).toDF("doc_id", "text"),
      reg, "doc_id", "text", "bench")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val reports = mutable.Buffer.empty[IngestPipeline.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val (q, _) = IngestPipeline.start(
      ms.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 10L,
      cardLedger = Some(ledger), evalRegistry = Some((reg, 0.8)))(reports += _)
    try {
      ms.addData(
        (1L, "alpha", "a"),
        (2L, "Leaked  BENCHMARK answer TEXT", "a"), // normalized exact match
        (3L, "gamma delta", "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(r => (r.nFresh, r.nClean)) == Seq((3L, 2L)), reports.toString)
    val tableIds = ManifestStore.currentFrame(spark, dir, "source").get
      .select("id").as[Long].collect().toSet
    assert(tableIds == Set(1L, 3L), s"contaminated doc reached the table: $tableIds")
    // the card ledger counted exactly the gated survivors (== the table)
    val folded = Corpus.cardFold(SketchLedger.read(spark, ledger).get).collect()(0)
    val want = Corpus.cardFold(Corpus.cardFrame(
        ManifestStore.currentFrame(spark, dir, "source").get
          .withColumn("_len", length(col("text")).cast("long")),
        "text", "source", "source", "_len")).collect()(0)
    assert(folded.getAs[Long]("n_docs") == 2L &&
      folded.getAs[Long]("n_docs") == want.getAs[Long]("n_docs"))

    // the gated path must release its per-batch checkpoints too: run two
    // more batches (incl. an all-duplicate one that skips the gate) and
    // pin the resident-block count — a leak here grows per batch forever
    val residentMid = spark.sparkContext.getPersistentRDDs.size
    val ms2 = MemoryStream[(Long, String, String)]
    val (q2, _) = IngestPipeline.start(
      ms2.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 10L,
      seed = Some(ManifestStore.currentFrame(spark, dir, "source").get),
      cardLedger = Some(ledger), evalRegistry = Some((reg, 0.8)))(_ => ())
    try {
      ms2.addData((4L, "delta epsilon", "b")); q2.processAllAvailable()
      ms2.addData((5L, "alpha", "a")); q2.processAllAvailable() // all-dup batch
    } finally q2.stop()
    val residentAfter = spark.sparkContext.getPersistentRDDs.size
    assert(residentAfter <= residentMid + 2,
      s"gated-path checkpoint residue: $residentMid before, $residentAfter after")
  }

  test("SketchLedger tagged appends: same tag is a no-op, tags survive compaction, " +
    "untagged appends never collide with tags") {
    import graft.ops.SketchLedger
    val dir = tmpDir("ledger_tags")
    val f1 = Seq((1L, 10L)).toDF("k", "v")
    val f2 = Seq((2L, 20L)).toDF("k", "v")
    assert(SketchLedger.append(f1, dir, tag = Some("batch=0")) == 1L)
    assert(SketchLedger.append(f1, dir, tag = Some("batch=0")) == 1L) // replay
    assert(SketchLedger.append(f2, dir, tag = Some("batch=1")) == 2L)
    assert(SketchLedger.status(spark, dir).get._2 == 2)
    assert(SketchLedger.append(f2, dir) == 3L) // untagged: always appends
    assert(SketchLedger.tags(spark, dir) == Seq("batch=0", "batch=1"))
    // compaction folds frames but keeps the tag memory: a very late
    // replay of batch 0 is still a no-op
    val folded = SketchLedger.read(spark, dir).get
      .groupBy().agg(org.apache.spark.sql.functions.sum("v").as("v")).collect()(0)
    assert(folded.getLong(0) == 50L)
    SketchLedger.compact(
      Seq((0L, 50L)).toDF("k", "v"), dir)
    assert(SketchLedger.status(spark, dir).get._2 == 1)
    val v = SketchLedger.append(f1, dir, tag = Some("batch=0"))
    assert(SketchLedger.status(spark, dir).get._2 == 1,
      "post-compact replay appended a frame")
    assert(SketchLedger.tags(spark, dir) == Seq("batch=0", "batch=1"))
    assert(v == 4L)
  }

  test("group commit (commitEvery=3): rows buffer, one commit per group, flush drains the remainder — every row accounted") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("ingest_gc")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    val reports = mutable.Buffer.empty[IngestPipeline.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val (q, h) = IngestPipeline.start(
      ms.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 100L, commitEvery = 3)(reports += _)
    try {
      def versions = ManifestStore.versions(spark, dir).size
      ms.addData((1L, "t1", "a"), (2L, "t2", "a")); q.processAllAvailable()
      assert(versions == 0, "batch 1 of the group must not commit")
      assert(ManifestStore.readManifest(spark, dir).isEmpty)
      // batch 2 carries an intra-group cross-batch dup (t1) — dedup state
      // grows per batch, independent of the deferred commit
      ms.addData((3L, "t1", "b"), (4L, "t3", "b")); q.processAllAvailable()
      assert(versions == 0, "batch 2 of the group must not commit")
      ms.addData((5L, "t4", "a")); q.processAllAvailable()
      assert(versions == 1, "3rd batch must trigger the group's single commit")
      val afterGroup = ManifestStore.currentFrame(spark, dir, "source").get
        .select("id").as[Long].collect().toSet
      assert(afterGroup == Set(1L, 2L, 4L, 5L), afterGroup.toString)

      // a partial group buffers until flush
      ms.addData((6L, "t5", "a")); q.processAllAvailable()
      assert(versions == 1, "partial group must not commit")
      h.flush()
      assert(versions == 2, "flush must commit the remainder")
      val all = ManifestStore.currentFrame(spark, dir, "source").get
        .select("id").as[Long].collect().toSet
      assert(all == Set(1L, 2L, 4L, 5L, 6L), all.toString)
      h.flush() // idempotent no-op
      assert(versions == 2)
      // the ledger accounted every row across the group boundaries
      assert(reports.map(_.nIn).sum == 6L)
      assert(reports.map(_.nFresh).sum == 5L) // id 3 deduped intra-group
    } finally q.stop()
  }

  test("group-commit crash replay: kill mid-group, restart re-seeded from the table, " +
    "replay the uncommitted batches — no lost row, no duplicate") {
    implicit val ctx = spark.sqlContext
    val dir = tmpDir("ingest_crash")
    val ref = (Seq.fill(2)("a") ++ Seq.fill(2)("b")).toDF("source")
    def versions = ManifestStore.versions(spark, dir).size
    def tableIds = ManifestStore.currentFrame(spark, dir, "source").get
      .select("id").as[Long].collect().toSet

    // run 1: one full group commits; two more batches buffer, then CRASH
    // (stop without flush — the in-memory buffer is lost, by the documented
    // group-commit trade)
    val ms1 = MemoryStream[(Long, String, String)]
    val (q1, _) = IngestPipeline.start(
      ms1.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 100L, commitEvery = 3)(_ => ())
    try {
      ms1.addData((1L, "t1", "a")); q1.processAllAvailable()
      ms1.addData((2L, "t2", "a")); q1.processAllAvailable()
      ms1.addData((3L, "t3", "b")); q1.processAllAvailable()
      assert(versions == 1 && tableIds == Set(1L, 2L, 3L))
      ms1.addData((4L, "t4", "a")); q1.processAllAvailable()
      ms1.addData((5L, "t5", "b")); q1.processAllAvailable()
      assert(versions == 1, "mid-group batches must not have committed")
    } finally q1.stop() // crash: ids 4, 5 were buffered, never committed
    assert(tableIds == Set(1L, 2L, 3L), "crash must not leak partial groups")

    // run 2 (restart): the replayed source re-delivers the uncommitted
    // batches PLUS a row whose content is already committed (the at-least-
    // once overlap a real checkpoint replay produces); dedup state is
    // re-seeded from the TABLE, so the overlap drops and nothing duplicates
    val ms2 = MemoryStream[(Long, String, String)]
    val seed = ManifestStore.currentFrame(spark, dir, "source").get
    val reports2 = mutable.Buffer.empty[IngestPipeline.BatchReport]
    val (q2, h2) = IngestPipeline.start(
      ms2.toDS().toDF("id", "text", "source"),
      idCol = "id", textCol = "text", keyCol = "source", partCol = "source",
      tablePath = dir, ref = ref, cap = 100L, seed = Some(seed),
      commitEvery = 3)(reports2 += _)
    try {
      ms2.addData((4L, "t4", "a"), (9L, "t1", "b")) // 9 = replayed dup of committed t1
      q2.processAllAvailable()
      ms2.addData((5L, "t5", "b")); q2.processAllAvailable()
      h2.flush() // drain the partial group (the shutdown-hook path)
    } finally q2.stop()

    // every crashed row landed exactly once; the already-committed content
    // was NOT re-ingested under its replayed id
    assert(tableIds == Set(1L, 2L, 3L, 4L, 5L), tableIds.toString)
    assert(reports2.map(_.nFresh).sum == 2L, reports2.toString)
    // content-level uniqueness across the whole table (the no-duplicate law)
    val texts = ManifestStore.currentFrame(spark, dir, "source").get
      .select("text").as[String].collect().toSeq
    assert(texts.size == texts.distinct.size, s"duplicate content: $texts")
  }
}
