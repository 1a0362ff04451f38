package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.{Dedup, EvalRegistry, ManifestStore, TextOps}

/**
 * The composed TRAINING-DATA INGEST pipeline — every streaming guard this
 * library provides, wired in the order a production corpus feed runs them,
 * each stage the SAME implementation its batch/spec-verified form uses:
 *
 *  1. DRIFT ([[DriftStream.DriftMonitor]] → [[graft.ops.Profile.drift]]
 *     math): the batch's categorical mix is scored against a fixed
 *     reference; drifting batches are REPORTED, never dropped — gating on
 *     drift is a policy for the operator reading the ledger.
 *  2. RATE LIMIT ([[RateLimitStream.CmsRateLimiter]]): per-key admission
 *     caps (domain/licence/source) with one O(d·w) matrix as the only
 *     state; the cap is never exceeded, collisions only throttle early.
 *  3. GATE (optional — any per-row keep predicate, e.g.
 *     `lang_id_ngram(text) =!= "und"` and/or quality rules): admitted
 *     rows failing the predicate drop BEFORE dedup ever fingerprints
 *     them — per-row kernel cost, zero state, and the fingerprint store
 *     never grows with rows the corpus would discard anyway.
 *  4. EXACT DEDUP ([[Dedup.exactIncremental]] against a fingerprint
 *     store): within-batch and cross-batch duplicates drop; the store
 *     grows by addition and is never rescanned.
 *  5. DECONTAMINATION (optional — [[graft.ops.EvalRegistry
 *     .decontaminateIndexed]] against a registered benchmark-fingerprint
 *     store): documents that exact-match or contain ≥ the gate threshold
 *     of any registered eval doc drop BEFORE the table ever sees them —
 *     fingerprints only, the eval text never enters the pipeline.
 *  6. UPSERT ([[ManifestStore.upsert]]): survivors land in the
 *     manifest-committed table — atomic visibility, crash debris
 *     invisible, snapshot isolation for concurrent readers.
 *
 * Per batch one ledger row goes to `onReport`:
 * `(batchId, nIn, psi, drifted, nAdmitted, nGated, nFresh, nClean)`;
 * `nIn − nAdmitted` is the rate-limit rejection count, `nAdmitted −
 * nGated` the gate rejection count (`nGated == nAdmitted` with no gate),
 * `nGated − nFresh` the duplicate count, and `nFresh − nClean` the
 * contamination-gate count (`nClean == nFresh` with no registry). State: the reference count table, the CMS matrix, and
 * the fingerprint store (content-hash-sized — the one genuinely growing
 * piece, exactly the piece a deployment would persist via the manifest
 * protocol between runs).
 *
 * GROUP COMMIT (`commitEvery`, round 11): one manifest commit per
 * micro-batch was the measured pipeline bottleneck (666 rows/s vs 10.7k
 * for the stateless stages, BENCH_STREAM) — each commit pays a
 * generation write + manifest CAS regardless of batch size. With
 * `commitEvery = N`, fresh survivors buffer (checkpointed, so no lineage
 * re-reads a batch) and land as ONE upsert every N batches — atomicity
 * per COMMIT is unchanged (a reader sees all of a group or none of it;
 * crash debris stays invisible). The trade, stated honestly: visibility
 * lags up to N−1 batches, and a crash before the group's commit loses
 * those batches' table rows (dedup state is in-memory and re-seeded on
 * restart anyway, so a replayed source re-ingests them). [[Handle.flush]]
 * commits any remainder — call it after the stream drains or on
 * shutdown.
 */
object IngestPipeline {

  final case class BatchReport(
      batchId: Long, nIn: Long, psi: Double, drifted: Boolean,
      nAdmitted: Long, nGated: Long, nFresh: Long, nClean: Long)

  /** The wired pipeline plus its group-commit flusher. */
  final class Handle(
      val writer: DataStreamWriter[Row], flushFn: () => Unit) {
    /** Commit any buffered-but-uncommitted survivors now. Call after the
      * stream drains (or from a shutdown hook); a no-op when nothing is
      * pending or `commitEvery = 1`. */
    def flush(): Unit = flushFn()
  }

  /**
   * Wire the pipeline. `docs` must carry `idCol`, `textCol`, `keyCol`
   * (the rate-limit key) and `partCol` (the table partition column);
   * `ref` is the drift reference for `keyCol`'s distribution.
   *
   * CARD LEDGER (optional): with `cardLedger = Some(dir)`, every batch's
   * FRESH survivors — exactly the rows the table accumulates — append one
   * [[graft.ops.Corpus.cardFrame]] row (label sets keyed on `keyCol` /
   * `partCol`, char mass = text length) to a [[graft.ops.SketchLedger]]
   * at `dir`, so `Corpus.cardFold(SketchLedger.read(...))` is the RUNNING
   * DATASET CARD of the ingested corpus at any moment, with no batch ever
   * rescanned. The ledger commits independently of the (possibly grouped)
   * table upsert — a crash can leave it up to one group ahead of the
   * table, the same advisory-statistics trade the vector ingest's moments
   * ledger states. Replay is EXACTLY-ONCE: each append is tagged with
   * `q=<queryId>/batch=<id>` ([[StreamTags.batchTag]] — round 15: the
   * query-id namespace closes the r14 advice hole where bare batch ids
   * collided across checkpoint LINEAGES, silently skipping a new stream's
   * batches 0..k against a reused ledger; the query id is
   * checkpoint-stable, so exactly the replays recovery produces match and
   * nothing else does), committed atomically with its frame, so a
   * crash-replayed batch — whose rows the restarted dedup state no longer
   * remembers — skips its ledger append instead of double-counting (the
   * table's keyed upsert absorbs those rows anyway; spec-pinned: ledger
   * fold == table card after kill + replay, no compact needed). A source
   * that replays rows under NEW batch ids (manual re-feeds, not
   * checkpoint recovery) is still re-counted — for that, re-derive
   * (`cardFrame` over the table) and [[graft.ops.SketchLedger.compact]].
   */
  def attach(
      docs: DataFrame, idCol: String, textCol: String, keyCol: String,
      partCol: String, tablePath: String, ref: DataFrame,
      cap: Long, psiThreshold: Double = 0.25,
      seed: Option[DataFrame] = None, commitEvery: Int = 1,
      cardLedger: Option[String] = None,
      evalRegistry: Option[(String, Double)] = None,
      gate: Option[Column] = None)(
      onReport: BatchReport => Unit): Handle = {
    require(commitEvery >= 1, s"commitEvery must be >= 1, got $commitEvery")
    val spark = docs.sparkSession
    val monitor = new DriftStream.DriftMonitor(ref, keyCol)
    val limiter = new RateLimitStream.CmsRateLimiter(keyCol, idCol, cap)
    // fingerprint store: starts from the optional seed corpus, grows by
    // addition; checkpointed so no batch's lineage re-reads a predecessor
    var seenFps: DataFrame = seed
      .map(s => Dedup.seenFingerprints(s, textCol))
      .getOrElse(spark.emptyDataFrame.select(lit("").as("fp")).where(lit(false)))
      .localCheckpoint()
    // group-commit buffer: fresh survivors awaiting their group's upsert
    // (checkpointed — its lineage must not re-read any batch); dedup state
    // still grows PER BATCH so intra-group duplicates drop correctly
    var pending: Option[DataFrame] = None
    var batchesSinceCommit = 0
    // one lock guards pending/batchesSinceCommit on BOTH threads: the
    // foreachBatch thread's read-modify-write and a Handle.flush from a
    // shutdown hook — an unguarded race could commit-and-release the
    // buffer while a batch is still unioning into it
    val pendingLock = new Object
    def flushPending(): Unit = pendingLock.synchronized {
      pending.foreach { p =>
        ManifestStore.upsert(p, tablePath, partCol, Seq(partCol, idCol), spark)
        DriftStream.release(p)
      }
      pending = None
      batchesSinceCommit = 0
    }

    val writer = docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      // every per-batch checkpoint is released before the batch ends, and
      // a superseded fingerprint store as soon as its successor is
      // materialized — on an unbounded stream leaked checkpoint blocks
      // squeeze execution memory for every later batch (the round-5
      // block-manager-residue lesson, enforced by IngestPipelineSpec)
      var admitted: DataFrame = null
      var gated: DataFrame = null
      var fresh: DataFrame = null
      var clean: DataFrame = null
      try {
        val nIn = pinned.count()
        val (_, _, psi, _) = monitor.score(pinned)
        admitted = limiter.admit(pinned)
        val nAdmitted = admitted.count()
        // optional per-row gate BEFORE dedup: rows the corpus would
        // discard must not cost a fingerprint or grow the store
        gated = gate.fold(admitted)(c => admitted.where(c).localCheckpoint())
        val nGated = if (gated eq admitted) nAdmitted else gated.count()
        fresh = Dedup.exactIncremental(gated, seenFps, idCol, textCol)
          .localCheckpoint()
        val nFresh = fresh.count()
        // the contamination gate sits AFTER dedup (gate cost ∝ fresh rows,
        // not batch rows) and BEFORE the table/ledger; the fingerprint
        // store still grows by the FULL fresh set — a contaminated doc
        // re-arriving later is still a duplicate, and re-gating it every
        // time would pay the registry join again for nothing
        clean =
          if (nFresh == 0) fresh // nothing to gate — skip the registry read
          else evalRegistry.fold(fresh) { case (regDir, threshold) =>
            EvalRegistry.decontaminateIndexed(fresh, regDir, idCol, textCol, threshold)
              .localCheckpoint()
          }
        val nClean = if (clean eq fresh) nFresh else clean.count()
        if (nFresh > 0) {
          val grown = seenFps
            .unionByName(Dedup.seenFingerprints(fresh, textCol))
            .distinct()
            .localCheckpoint() // eager: safe to drop the predecessor now
          DriftStream.release(seenFps)
          seenFps = grown
        }
        if (nClean > 0) {
          cardLedger.foreach { dir =>
            // query-id-namespaced batch tag: a crash-replayed batch (same
            // checkpoint lineage, same id) skips the append — exactly-once
            // card accounting even though the restarted dedup state no
            // longer remembers its rows — while a second stream or a fresh
            // checkpoint gets a fresh namespace and appends normally
            graft.ops.SketchLedger.append(
              graft.ops.Corpus.cardFrame(
                clean.withColumn("_len", length(col(textCol)).cast("long")),
                textCol, keyCol, partCol, "_len"),
              dir, tag = Some(StreamTags.batchTag(spark, id)))
          }
          pendingLock.synchronized {
            val buffered = pending.fold(clean)(_.unionByName(clean))
              .localCheckpoint() // eager: clean + old buffer releasable below
            pending.foreach(DriftStream.release)
            pending = Some(buffered)
          }
        }
        pendingLock.synchronized {
          batchesSinceCommit += 1
          if (batchesSinceCommit >= commitEvery) flushPending()
        }
        onReport(BatchReport(id, nIn, psi, psi > psiThreshold, nAdmitted,
          nGated, nFresh, nClean))
      } finally {
        if (clean != null && (clean ne fresh)) DriftStream.release(clean)
        if (fresh != null) DriftStream.release(fresh)
        if (gated != null && (gated ne admitted)) DriftStream.release(gated)
        if (admitted != null) DriftStream.release(admitted)
        DriftStream.release(pinned)
      }
    }
    new Handle(writer, () => flushPending())
  }

  /** [[attach]] + start. */
  def start(
      docs: DataFrame, idCol: String, textCol: String, keyCol: String,
      partCol: String, tablePath: String, ref: DataFrame,
      cap: Long, psiThreshold: Double = 0.25,
      seed: Option[DataFrame] = None, commitEvery: Int = 1,
      cardLedger: Option[String] = None,
      evalRegistry: Option[(String, Double)] = None,
      gate: Option[Column] = None)(
      onReport: BatchReport => Unit): (StreamingQuery, Handle) = {
    val h = attach(docs, idCol, textCol, keyCol, partCol, tablePath, ref,
      cap, psiThreshold, seed, commitEvery, cardLedger, evalRegistry,
      gate)(onReport)
    (h.writer.start(), h)
  }
}
