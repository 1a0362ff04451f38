package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted INCREMENTAL MinHash-LSH near-duplicate index — the missing
 * rerun economics of [[Dedup.nearDuplicates]]: the one-shot operator
 * re-signs and re-bands the ENTIRE corpus every run (signature cost ∝
 * corpus tokens), while near-dup state is a pure function of each
 * document alone and therefore belongs in a build-once store. This module
 * persists the banded signature rows `(id, band, band_key)` under the
 * same versioned-manifest commit protocol the lexical index uses
 * ([[Retrieval.writeLexIndex]] / [[graft.ops.ManifestStore]]): atomic
 * visibility, crash debris invisible, snapshot time travel for free.
 *
 * The incremental contract (the [[Dedup.exactIncremental]] shape lifted
 * to near-dups): appending a batch signs + bands ONLY the batch, then
 * joins its band rows against the STORED postings —
 *
 *  - intra-batch pairs: [[Dedup.candidatePairs]] over the batch bands;
 *  - cross pairs: stored live bands ⋈ (broadcast) batch bands on
 *    `(band, band_key)` — ONE columnar scan of stored band rows, never a
 *    re-tokenize, never a re-hash, no shuffle of the stored mass.
 *
 * Band-bucket occupancy (the [[Dedup.candidatePairs]] quadratic-tail
 * cap) folds ADDITIVELY: each segment carries an `occupancy/` partial
 * `(band, band_key, n)` and deletes commit NEGATIVE partials, so an
 * append knows every bucket's current total from vocabulary-sized
 * artifacts without aggregating stored bands.
 *
 * Cap semantics, stated honestly: [[appendToMinhashIndex]] applies the
 * cap at EMISSION time (a bucket ≤ cap at this append emits; a bucket
 * that crosses the cap later keeps its earlier emissions — the natural
 * streaming semantic), while [[candidatePairsIndexed]] re-applies the cap
 * over the accumulated corpus and therefore equals one-shot
 * [[Dedup.candidatePairs]] over the union EXACTLY (spec-pinned parity
 * law). When no bucket ever crosses the cap between appends the two
 * agree; the divergence is only ever extra early-emitted pairs from
 * since-capped (boilerplate) buckets.
 *
 * Scale: a 100 TB corpus holds ~`bands` band rows per document — the
 * stored mass is O(docs × bands) small fixed-width rows, range-clustered
 * by `(band, band_key)`; appends broadcast the batch side, deletes commit
 * tombstones + negative occupancy without touching segments, and
 * compaction is the one full-rewrite debt collector (also retiring
 * tombstones physically).
 *
 * VERIFIED-PAIR generations: candidate generation amortizes into the
 * band store, but Jaccard VERIFICATION is the dominant rerun cost once
 * candidate mass grows (the 100× stress run measured ~103s of a 106s
 * full re-serve in re-verifying history). Verification verdicts are a
 * pure function of the two documents' text (immutable under the
 * new-docs append contract), so they too belong in the store: `pairs`
 * generations hold per-candidate dispositions `(id_a, id_b, jaccard,
 * pass)` — committed by [[nearDuplicatesForBatch]] per batch and by
 * [[nearDuplicatesIndexed]]`(persistVerdicts = true)` for full serves —
 * and serving intersects CURRENT candidates with stored verdicts,
 * verifying only the uncovered remainder. Verdicts are only comparable
 * under one `(shingle, threshold)`, so the first pairs commit pins a
 * `vmeta` line and later commits must match (fail-loud); a serve at a
 * DIFFERENT `(shingle, threshold)` ignores the store and verifies fresh
 * (a stored pass at 0.5 says nothing about 0.3). Tombstoned ids drop
 * out of the verdict view at read; compaction folds pair generations
 * into the rewrite. A crash between an append's band commit and its
 * pairs commit self-heals: missing verdicts are re-verified at the next
 * serve, never wrong.
 */
object MinhashIndex {

  /** The signature-function identity of an index — appends MUST band with
    * the same parameters or candidate collisions are meaningless; stored
    * in the manifest and read back (never passed) on append. */
  final case class MhMeta(numHashes: Int, bands: Int, shingle: Int)

  private val Prefix = "_mh"

  private def genNumber(genId: String): Long = genId.takeWhile(_.isDigit).toLong

  private def newGenId(version: Long): String =
    s"$version-${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  /** Fresh generation number: strictly above the committed manifest version
    * and every `gen=` directory on disk (crash debris is never reused). */
  private def nextGen(spark: SparkSession, indexDir: String): Long = {
    val hfs = ManifestStore.fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val onDisk =
      if (!hfs.exists(dir)) Seq.empty[Long]
      else hfs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("gen=")).map(n => genNumber(n.stripPrefix("gen="))).toSeq
    val committed = ManifestStore.readVersioned(spark, indexDir, Prefix).map(_._1)
    (committed.toSeq ++ onDisk :+ 0L).max + 1
  }

  /** Parsed manifest: banding meta, band segments, delete generations,
    * verified-pair generations, the pinned verification identity
    * `(shingle, threshold)` of the pair generations (None until the first
    * pairs commit), and idempotence tags (round 15 — the
    * [[SketchLedger.append]] contract: a tagged append already recorded
    * here skips the commit, so a checkpoint-replayed micro-batch never
    * doubles occupancy partials). Older manifests simply lack
    * `prs`/`vmeta`/`tag` lines. */
  private final case class Mf(
      meta: MhMeta, segs: Seq[String], delGens: Seq[String],
      pairGens: Seq[String], vmeta: Option[(Int, Double)],
      tags: Seq[String] = Seq.empty)

  private def parseManifest(content: String): Mf = {
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    val meta = lines.collectFirst { case l if l.startsWith("meta\t") =>
      val Array(nh, b, sh) = l.stripPrefix("meta\t").split(",")
      MhMeta(nh.toInt, b.toInt, sh.toInt)
    }.getOrElse(throw new IllegalStateException(
      "minhash index manifest carries no meta line — not a minhash index"))
    val vmeta = lines.collectFirst { case l if l.startsWith("vmeta\t") =>
      val Array(sh, t) = l.stripPrefix("vmeta\t").split(",")
      (sh.toInt, t.toDouble)
    }
    Mf(meta,
      lines.collect { case l if l.startsWith("seg\t") => l.stripPrefix("seg\t") },
      lines.collect { case l if l.startsWith("del\t") => l.stripPrefix("del\t") },
      lines.collect { case l if l.startsWith("prs\t") => l.stripPrefix("prs\t") },
      vmeta,
      lines.collect { case l if l.startsWith("tag\t") => l.stripPrefix("tag\t") })
  }

  private def manifestContent(mf: Mf): String =
    (Seq(s"meta\t${mf.meta.numHashes},${mf.meta.bands},${mf.meta.shingle}") ++
      mf.vmeta.map { case (sh, t) => s"vmeta\t$sh,$t" } ++
      mf.segs.map(g => s"seg\t$g") ++ mf.delGens.map(g => s"del\t$g") ++
      mf.pairGens.map(g => s"prs\t$g") ++
      ManifestStore.boundTags(mf.tags).map(t => s"tag\t$t"))
      .mkString("", "\n", "\n")

  private def withTag(mf: Mf, tag: Option[String]): Mf = {
    tag.foreach(ManifestStore.requireTagShape)
    mf.copy(tags = ManifestStore.boundTags(mf.tags ++ tag))
  }

  private def readManifest(
      spark: SparkSession, indexDir: String, op: String): (Long, Mf) = {
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, Prefix)
      .getOrElse(throw new IllegalStateException(
        s"$op: no committed minhash index under $indexDir"))
    (ver, parseManifest(content))
  }

  /** Band rows of `df` under `meta` — the per-row native signature kernel
    * ([[Dedup.minhashSignaturesNative]]): no explode of shingles, no
    * shuffle; a pure per-document map the store then makes permanent. */
  private def bandRows(
      df: DataFrame, idCol: String, textCol: String, meta: MhMeta): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    Dedup.lshBands(
      Dedup.minhashSignaturesNative(
        df.select(col(idCol).as("id"), col(textCol).as("_t")), "id", "_t",
        meta.numHashes, meta.shingle),
      meta.numHashes, meta.bands)
  }

  /** One segment's two artifacts: the band rows (range-clustered by
    * `(band, band_key)` so bucket rows co-locate in files) and the
    * additive occupancy partial, derived by re-reading the just-written
    * bands (audits the written bytes, same discipline as the lexical
    * segment writer). */
  private def writeSegment(bands: DataFrame, base: String): Unit = {
    val spark = bands.sparkSession
    bands.select("id", "band", "band_key")
      .repartitionByRange(col("band"), col("band_key"))
      .sortWithinPartitions("band", "band_key")
      .write.mode("overwrite").parquet(s"$base/bands")
    spark.read.parquet(s"$base/bands")
      .groupBy("band", "band_key").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$base/occupancy")
  }

  private def segUnion(
      spark: SparkSession, indexDir: String, gens: Seq[String],
      artifact: String): DataFrame =
    gens.map(g => spark.read.parquet(s"$indexDir/gen=$g/$artifact"))
      .reduce(_.unionByName(_))

  private def liveTombstones(
      spark: SparkSession, indexDir: String,
      delGens: Seq[String]): Option[DataFrame] =
    if (delGens.isEmpty) None
    else Some(segUnion(spark, indexDir, delGens, "tombstones").distinct())

  /** The live band rows: segment union minus tombstoned ids (broadcast
    * anti-join — tombstone sets are takedown-sized). */
  private def liveBands(
      spark: SparkSession, indexDir: String, segs: Seq[String],
      delGens: Seq[String]): DataFrame = {
    val all = segUnion(spark, indexDir, segs, "bands")
    liveTombstones(spark, indexDir, delGens)
      .fold(all)(t => all.join(broadcast(t), Seq("id"), "left_anti"))
  }

  /** Build and commit a minhash index over `df`. Rebuilding over an
    * existing index is safe: old generations stay untouched and the old
    * manifest stays authoritative until the new commit lands. `tag`
    * records an idempotence marker with the initial commit so a
    * bootstrap micro-batch replayed after a crash (the index is committed
    * by then, so the stream takes the append path) is recognized there. */
  def writeMinhashIndex(
      df: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      tag: Option[String] = None): Unit = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val spark = df.sparkSession
    val meta = MhMeta(numHashes, bands, shingle)
    val gen = nextGen(spark, indexDir)
    val genId = newGenId(gen)
    writeSegment(bandRows(df, idCol, textCol, meta), s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(withTag(
        Mf(meta, Seq(genId), Seq.empty, Seq.empty, None), tag)))
  }

  /** True iff `indexDir` holds a committed minhash index. */
  def minhashIndexCommitted(indexDir: String): Boolean =
    ManifestStore.readVersioned(SparkSession.active, indexDir, Prefix).isDefined

  /**
   * Incremental append: sign + band ONLY `delta`, commit it as one more
   * segment, and return the NEW candidate pairs it introduces — batch ×
   * batch plus batch × stored-corpus — under the occupancy cap applied to
   * each bucket's post-append total (emission-time semantics; see the
   * object doc). The stored corpus is touched exactly once, as a columnar
   * scan of its band rows joined against the BROADCAST batch bands;
   * nothing is re-signed, re-tokenized, or shuffled.
   *
   * The returned frame is materialized (localCheckpoint) BEFORE the
   * commit, so consuming it never depends on post-commit manifest state.
   * Contract: `delta` carries documents NOT already in the index (the
   * [[Retrieval.appendToLexIndex]] new-docs contract); an empty delta is
   * a no-op returning an empty pair frame.
   *
   * `tag` makes the append IDEMPOTENT under at-least-once replay (round
   * 15): a tag already in the manifest — committed atomically with its
   * band segment — skips the commit AND re-derives the SAME pair frame
   * the original call returned, from the store alone: the batch's bands
   * recompute (a pure per-document function), the occupancy cap evaluates
   * against the store's CURRENT totals (which already include this
   * batch's partials — exactly the post-append totals the original cap
   * check used), and the cross side excludes the batch's own ids from the
   * live bands (they are in the store now; intra-batch pairs come from
   * the recomputed bands). A crash-replayed streaming micro-batch
   * therefore neither doubles occupancy partials (which would trip caps
   * early and silently drop true pairs forever) nor loses its pair feed.
   */
  def appendToMinhashIndex(
      delta: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxOccupancy: Int = Int.MaxValue, tag: Option[String] = None): DataFrame = {
    val spark = delta.sparkSession
    val (ver, mf) = readManifest(spark, indexDir, "appendToMinhashIndex")
    import mf.{segs, delGens}
    if (tag.exists(mf.tags.contains))
      return replayAppendPairs(delta, indexDir, idCol, textCol, mf, maxOccupancy)
    val bandsB = bandRows(delta, idCol, textCol, mf.meta).localCheckpoint()
    if (bandsB.isEmpty)
      return bandsB.select(col("id").as("id_a"), col("id").as("id_b")).limit(0)
    // post-append bucket totals from the additive occupancy partials (del
    // generations carry negatives). The stored partial rows are
    // bucket-count-sized (≈ docs × bands across segments), so the fold is
    // RESTRICTED to the batch's buckets first — a broadcast semi-join
    // against the batch's (band, band_key) set — before aggregating:
    // per-append work stays proportional to the batch, not the corpus.
    val occB = bandsB.groupBy("band", "band_key").agg(count(lit(1)).as("_nb"))
    val occS = segUnion(spark, indexDir, segs ++ delGens, "occupancy")
      .join(broadcast(occB.select("band", "band_key")),
        Seq("band", "band_key"), "left_semi")
      .groupBy("band", "band_key").agg(sum(col("n")).as("_ns"))
    val ok = occB.join(occS, Seq("band", "band_key"), "left")
      .where(col("_nb") + coalesce(col("_ns"), lit(0L)) <= maxOccupancy)
      .select("band", "band_key")
    val bandsOk = bandsB.join(broadcast(ok), Seq("band", "band_key"), "left_semi")
    val intra = Dedup.candidatePairs(bandsOk, Int.MaxValue)
    val cross = liveBands(spark, indexDir, segs, delGens)
      .join(broadcast(bandsOk.select(
        col("band"), col("band_key"), col("id").as("_id_new"))),
        Seq("band", "band_key"))
      .where(col("id") =!= col("_id_new"))
      .select(
        least(col("id"), col("_id_new")).as("id_a"),
        greatest(col("id"), col("_id_new")).as("id_b"))
      .distinct()
    val pairs = intra.unionByName(cross).distinct().localCheckpoint()
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    writeSegment(bandsB, s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(withTag(mf.copy(segs = segs :+ genId), tag)))
    pairs
  }

  /** The replay path of a tagged [[appendToMinhashIndex]]: the batch's
    * segment is already committed, so re-derive the ORIGINAL call's pair
    * frame without mutating anything. Equivalence argument: the original
    * cap check admitted buckets where `batch + storedBefore <= cap`; the
    * store's current partials sum to exactly `storedBefore + batch` (the
    * appended segment's occupancy IS the batch's counts), so filtering on
    * current totals `<= cap` admits the same buckets. The original cross
    * join ran stored-before bands × batch bands; live bands minus the
    * batch's ids reconstruct stored-before exactly (delta ids are NEW by
    * the append contract), and intra-batch pairs come from the recomputed
    * batch bands. */
  private def replayAppendPairs(
      delta: DataFrame, indexDir: String, idCol: String, textCol: String,
      mf: Mf, maxOccupancy: Int): DataFrame = {
    val spark = delta.sparkSession
    val bandsB = bandRows(delta, idCol, textCol, mf.meta).localCheckpoint()
    if (bandsB.isEmpty)
      return bandsB.select(col("id").as("id_a"), col("id").as("id_b")).limit(0)
    val occNow = segUnion(spark, indexDir, mf.segs ++ mf.delGens, "occupancy")
      .join(broadcast(bandsB.select("band", "band_key").distinct()),
        Seq("band", "band_key"), "left_semi")
      .groupBy("band", "band_key").agg(sum(col("n")).as("_nt"))
    val ok = occNow.where(col("_nt") <= maxOccupancy).select("band", "band_key")
    val bandsOk = bandsB.join(broadcast(ok), Seq("band", "band_key"), "left_semi")
    val intra = Dedup.candidatePairs(bandsOk, Int.MaxValue)
    val deltaIds = delta.select(col(idCol).as("id")).distinct()
    val cross = liveBands(spark, indexDir, mf.segs, mf.delGens)
      .join(broadcast(deltaIds), Seq("id"), "left_anti")
      .join(broadcast(bandsOk.select(
        col("band"), col("band_key"), col("id").as("_id_new"))),
        Seq("band", "band_key"))
      .where(col("id") =!= col("_id_new"))
      .select(
        least(col("id"), col("_id_new")).as("id_a"),
        greatest(col("id"), col("_id_new")).as("id_b"))
      .distinct()
    intra.unionByName(cross).distinct().localCheckpoint()
  }

  /** Fail-loud guard for every verdict-committing path: a candidate
    * document MISSING from the caller's corpus frame vanishes from
    * [[Dedup.verifyJaccard]]'s size join exactly like a size-prefilter
    * elimination, so without this check a wrong/partial corpus would
    * commit decisive `pass = false` verdicts for pairs that were never
    * examined — and since covered serves reuse stored verdicts without
    * re-consulting text (by design), one bad-corpus persisting call
    * would permanently suppress true near-dup pairs with no self-heal.
    * Cost: one bounded aggregation ∝ candidate mass (the corpus side
    * prunes to its id column before the anti-join), paid only on
    * persisting calls — verdict commits are rare and permanent, the
    * check is cheap insurance against an unrecoverable store. */
  private def requireCandidatesInCorpus(
      candidates: DataFrame, corpus: DataFrame, idCol: String,
      indexDir: String): Unit = {
    val missing = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
      .join(corpus.select(col(idCol).as("id")), Seq("id"), "left_anti")
      .limit(5).collect().map(_.get(0))
    require(missing.isEmpty,
      s"refusing to persist verdicts under $indexDir: candidate documents " +
        s"absent from the supplied corpus frame (e.g. ${missing.mkString(", ")}) " +
        "— their pairs would commit as decisive fails without ever being " +
        "examined, permanently suppressing true near-dups on every later " +
        "serve; pass the full accumulated corpus (including this batch)")
  }

  /** Per-candidate disposition rows `(id_a, id_b, jaccard, pass)`:
    * candidates absent from the verify output were eliminated by its size
    * prefilter (they CANNOT reach the threshold) — stored as
    * `pass = false, jaccard = null` so reruns skip them too. Callers must
    * run [[requireCandidatesInCorpus]] first: the prefilter-elimination
    * reading of absence is only sound when every candidate document was
    * actually present in the verify call's corpus frame. */
  private def dispositions(
      candidates: DataFrame, verified: DataFrame, threshold: Double): DataFrame =
    candidates.select("id_a", "id_b")
      .join(verified.select("id_a", "id_b", "jaccard"), Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        coalesce(col("jaccard") >= lit(threshold), lit(false)).as("pass"))

  /** Fail-loud guard shared by every verdict-committing path: the index's
    * pinned `vmeta` identity must match EXACTLY. Runs against a
    * freshly-read manifest so callers can check BEFORE mutating anything. */
  private def requireVmeta(
      mf: Mf, indexDir: String, shingle: Int, threshold: Double): Unit =
    mf.vmeta.foreach { case (sh, t) =>
      require(sh == shingle && t == threshold,
        s"verified-pair store under $indexDir is pinned to (shingle=$sh, " +
          s"threshold=$t); committing verdicts at ($shingle, $threshold) " +
          "would mix incomparable dispositions — compact away the old " +
          "generations or use a fresh index")
    }

  /** Commit `disp` as one verified-pair generation. Re-reads the manifest
    * at commit time — callers may have advanced it (the append's band
    * commit) since their last read. Callers guard emptiness on their
    * already-materialized candidate frames (disp rows ∝ candidates), so
    * the disposition join executes exactly once, in the write. */
  private def commitPairsGen(
      spark: SparkSession, indexDir: String, disp: DataFrame,
      shingle: Int, threshold: Double, tag: Option[String] = None): Unit = {
    val (ver, mf) = readManifest(spark, indexDir, "commitPairsGen")
    if (tag.exists(mf.tags.contains)) return // replayed batch: verdicts committed
    requireVmeta(mf, indexDir, shingle, threshold)
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    disp.select("id_a", "id_b", "jaccard", "pass")
      .sortWithinPartitions("id_a", "id_b")
      .write.mode("overwrite").parquet(s"$indexDir/gen=$genId/pairs")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(withTag(mf.copy(
        pairGens = mf.pairGens :+ genId, vmeta = Some((shingle, threshold))), tag)))
  }

  /** The live stored verdicts `(id_a, id_b, jaccard, pass)` — tombstoned
    * ids dropped on BOTH sides (a pair referencing a deleted document is
    * dead), de-duplicated across generations when more than one exists
    * (verdicts are deterministic, so any copy is authoritative). None when
    * no pairs generation has been committed. */
  private def livePairs(
      spark: SparkSession, indexDir: String, mf: Mf): Option[DataFrame] =
    if (mf.pairGens.isEmpty) None
    else {
      val all = segUnion(spark, indexDir, mf.pairGens, "pairs")
      val alive = liveTombstones(spark, indexDir, mf.delGens).fold(all) { t =>
        all
          .join(broadcast(t.select(col("id").as("id_a"))), Seq("id_a"), "left_anti")
          .join(broadcast(t.select(col("id").as("id_b"))), Seq("id_b"), "left_anti")
      }
      Some(if (mf.pairGens.size > 1) alive.dropDuplicates("id_a", "id_b") else alive)
    }

  /** True iff the index carries at least one committed verified-pair
    * generation (the reader's predicate for build-once memos that want
    * rerun-cheap serving, not just a band store). */
  def verifiedPairsCommitted(spark: SparkSession, indexDir: String): Boolean =
    ManifestStore.readVersioned(spark, indexDir, Prefix)
      .exists(c => parseManifest(c._2).pairGens.nonEmpty)

  /** The live stored verdicts for audits (`(id_a, id_b, jaccard, pass)`),
    * with the pinned verification identity. None until a pairs commit. */
  def readVerifiedPairs(
      spark: SparkSession, indexDir: String): Option[(DataFrame, (Int, Double))] = {
    val (_, mf) = readManifest(spark, indexDir, "readVerifiedPairs")
    for (p <- livePairs(spark, indexDir, mf); v <- mf.vmeta) yield (p, v)
  }

  /**
   * Candidate near-duplicate pairs of the WHOLE accumulated corpus,
   * served from the stored band rows — equals one-shot
   * [[Dedup.candidatePairs]] over [[Dedup.lshBands]] of the union corpus
   * EXACTLY (the cap re-applies over current totals, so even buckets that
   * crossed the cap mid-append resolve identically), at the cost of one
   * band-row scan: the corpus itself is never re-signed.
   */
  def candidatePairsIndexed(
      spark: SparkSession, indexDir: String,
      maxOccupancy: Int = Int.MaxValue): DataFrame = {
    val (_, mf) = readManifest(spark, indexDir, "candidatePairsIndexed")
    Dedup.candidatePairs(liveBands(spark, indexDir, mf.segs, mf.delGens), maxOccupancy)
  }

  /**
   * The INCREMENTAL VERIFIED feed — the per-batch unit a continuous
   * near-dup deployment actually consumes, with verification paid only
   * on the batch's OWN candidate pairs (never the corpus's): append
   * `delta` ([[appendToMinhashIndex]] — signs only the batch), then
   * Jaccard-verify just the returned new pairs against `corpus` (which
   * must contain the accumulated documents INCLUDING `delta` — the
   * ingest table after its upsert; [[Dedup.verifyJaccard]] shingles only
   * the pair-involved docs, so cost is ∝ batch candidate mass). The
   * disjoint union of these per-batch feeds equals one-shot
   * [[Dedup.nearDuplicates]] over the final corpus (spec-pinned), which
   * is exactly why a rerun never needs to re-verify history.
   *
   * With `persistVerdicts` (the default) the batch's verification
   * dispositions — passes AND fails, including size-prefilter
   * eliminations — commit as a `pairs` generation, so a later FULL
   * re-serve ([[nearDuplicatesIndexed]]) reads this batch's verdicts
   * instead of re-paying its Jaccard work. The feed itself is
   * materialized either way; a crash between the band commit and the
   * pairs commit only loses the verdict cache, never correctness.
   */
  def nearDuplicatesForBatch(
      delta: DataFrame, corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingle: Int = 3, threshold: Double = 0.5,
      maxOccupancy: Int = 64, persistVerdicts: Boolean = true,
      tag: Option[String] = None): DataFrame = {
    val spark = delta.sparkSession
    // identity check BEFORE the append mutates the store: failing after
    // the band commit would leave the delta appended, and the retry with
    // the corrected threshold would append it AGAIN — doubling its
    // occupancy partials and silently capping its buckets at half their
    // true occupancy forever after
    if (persistVerdicts)
      requireVmeta(readManifest(spark, indexDir, "nearDuplicatesForBatch")._2,
        indexDir, shingle, threshold)
    // the documented contract — `corpus` contains the accumulated corpus
    // INCLUDING `delta` (the ingest table AFTER its upsert) — enforced
    // BEFORE the append mutates the store: passing the pre-upsert table is
    // the common way to violate it, and catching it only at the
    // post-verification candidate check would leave the delta's bands
    // appended, so the corrected retry would append them AGAIN (doubled
    // occupancy partials). Cost ∝ batch ids, nothing corpus-sized moves.
    val missingDelta = delta.select(col(idCol).as("id")).distinct()
      .join(corpus.select(col(idCol).as("id")), Seq("id"), "left_anti")
      .limit(5).collect().map(_.get(0))
    require(missingDelta.isEmpty,
      s"nearDuplicatesForBatch: delta documents absent from `corpus` " +
        s"(e.g. ${missingDelta.mkString(", ")}) — pass the accumulated " +
        "corpus INCLUDING this batch (the ingest table after its upsert)")
    // the pairs commit carries its OWN tag (band commit and pairs commit
    // are two manifest versions — a crash between them must replay into
    // "band skip, pairs commit", the existing self-heal, not a double)
    val newPairs = appendToMinhashIndex(
      delta, indexDir, idCol, textCol, maxOccupancy, tag)
    val verified = Dedup.verifyJaccard(newPairs, corpus, idCol, textCol, shingle,
      minJaccard = threshold).localCheckpoint()
    if (persistVerdicts && !newPairs.isEmpty) {
      requireCandidatesInCorpus(newPairs, corpus, idCol, indexDir)
      commitPairsGen(spark, indexDir,
        dispositions(newPairs, verified, threshold), shingle, threshold,
        tag.map(_ + "/pairs"))
    }
    verified.where(col("jaccard") >= threshold)
  }

  /** End-to-end near-dup detection FROM the index: stored candidate pairs
    * ([[candidatePairsIndexed]] — never re-signs) Jaccard-verified against
    * the corpus text at `threshold` ([[Dedup.verifyJaccard]] — shingles
    * only candidate docs). The one-call serving form of
    * [[Dedup.nearDuplicates]] with the signing cost amortized into the
    * store — and, when the store carries verified-pair generations at the
    * same `shingle` and a pinned threshold `t ≤ threshold`, the
    * verification cost amortized too: stored verdicts answer every
    * covered candidate (Jaccard is deterministic over immutable text, so
    * a stored verdict IS the fresh one; a pass row carries its EXACT
    * jaccard, re-filterable at any HIGHER bar, and a fail at `t` —
    * including a size-prefilter elimination, which proves `J < t` — is a
    * fail at every `threshold ≥ t`), and only the uncovered remainder is
    * shingled. Tightening the near-dup bar therefore never re-verifies; a
    * LOWER threshold or different shingle is incomparable and verifies
    * everything fresh.
    *
    * `persistVerdicts = true` additionally commits the freshly-verified
    * remainder's dispositions as a new pairs generation — run the FIRST
    * full serve with it and every later re-serve degrades to candidate
    * generation + one verdict join, the single-digit-ratio rerun path. */
  def nearDuplicatesIndexed(
      corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingle: Int = 3, threshold: Double = 0.5,
      maxOccupancy: Int = 64, persistVerdicts: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val (_, mf) = readManifest(spark, indexDir, "nearDuplicatesIndexed")
    // persisting is only legal at the pinned identity: a serve at a
    // tighter bar verifies its remainder with a DEEPER size prune, so its
    // fails are not decisive at the pinned threshold and committing them
    // would poison every later serve
    require(!persistVerdicts || mf.vmeta.forall(_ == ((shingle, threshold))),
      s"index under $indexDir pins verification identity ${mf.vmeta.orNull}; " +
        s"persisting verdicts at ($shingle, $threshold) would mix " +
        "incomparable dispositions")
    val cands = Dedup.candidatePairs(
      liveBands(spark, indexDir, mf.segs, mf.delGens), maxOccupancy)
    val stored = mf.vmeta match {
      case Some((sh, t)) if sh == shingle && t <= threshold =>
        livePairs(spark, indexDir, mf)
      case _ => None
    }
    stored match {
      case Some(p) =>
        // candidates feed the covered join, the anti-join AND (when
        // persisting) the disposition build — pin them once
        val c = cands.localCheckpoint()
        val covered = c.join(p, Seq("id_a", "id_b"))
        val fresh = c.join(p.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
          .localCheckpoint()
        val verifiedFresh = Dedup.verifyJaccard(
          fresh, corpus, idCol, textCol, shingle, minJaccard = threshold)
          .localCheckpoint()
        if (persistVerdicts && !fresh.isEmpty) { // identity pinned by the require
          requireCandidatesInCorpus(fresh, corpus, idCol, indexDir)
          commitPairsGen(spark, indexDir,
            dispositions(fresh, verifiedFresh, threshold), shingle, threshold)
        }
        // the covered verdict re-filters at the serve's bar: pass rows
        // carry exact jaccard; fail rows (jaccard null or < pinned t)
        // cannot reach any threshold ≥ t
        covered.where(col("pass") && col("jaccard") >= threshold)
          .select("id_a", "id_b", "jaccard")
          .unionByName(verifiedFresh.where(col("jaccard") >= threshold))
      case None =>
        val c = if (persistVerdicts) cands.localCheckpoint() else cands
        val verified = Dedup.verifyJaccard(
          c, corpus, idCol, textCol, shingle, minJaccard = threshold)
        if (persistVerdicts) {
          val v = verified.localCheckpoint()
          if (!c.isEmpty) {
            requireCandidatesInCorpus(c, corpus, idCol, indexDir)
            commitPairsGen(spark, indexDir,
              dispositions(c, v, threshold), shingle, threshold)
          }
          v.where(col("jaccard") >= threshold)
        } else verified.where(col("jaccard") >= threshold)
    }
  }

  /** The live banded view `(id, band, band_key)` — for composing with
    * custom verification or occupancy audits ([[Dedup.lshOccupancyStats]]). */
  def readMinhashBands(spark: SparkSession, indexDir: String): DataFrame = {
    val (_, mf) = readManifest(spark, indexDir, "readMinhashBands")
    liveBands(spark, indexDir, mf.segs, mf.delGens)
  }

  /** TIME TRAVEL: the banded view as of commit version `asOf` (the
    * [[Retrieval.readLexIndexAt]] twin) — readable until
    * [[compactMinhashIndex]]/[[vacuumMinhashIndex]] reclaim the
    * generations it references. */
  def readMinhashBandsAt(
      spark: SparkSession, indexDir: String, asOf: Long): DataFrame = {
    val content = ManifestStore.readVersionedAt(spark, indexDir, Prefix, asOf)
      .getOrElse(throw new IllegalStateException(
        s"no minhash index committed at or before version $asOf under $indexDir"))._2
    val mf = parseManifest(content)
    liveBands(spark, indexDir, mf.segs, mf.delGens)
  }

  /** [[candidatePairsIndexed]] as of commit version `asOf`. */
  def candidatePairsIndexedAt(
      spark: SparkSession, indexDir: String, asOf: Long,
      maxOccupancy: Int = Int.MaxValue): DataFrame =
    Dedup.candidatePairs(readMinhashBandsAt(spark, indexDir, asOf), maxOccupancy)

  /** All committed index versions, ascending. */
  def minhashIndexVersions(spark: SparkSession, indexDir: String): Seq[Long] =
    ManifestStore.versionsOf(spark, indexDir, Prefix)

  /**
   * Tombstone DELETE — the takedown path without touching any segment:
   * commits the ids as a `del` generation holding the id list (anti-joined
   * into every read) plus NEGATIVE occupancy partials computed from the
   * deleted docs' live band rows, so [[appendToMinhashIndex]]'s cap math
   * stays exact after deletion. Idempotent: partials are computed against
   * the serving view, so re-deleting an id (or deleting an unknown one)
   * contributes zero. Re-adding a deleted document requires
   * [[compactMinhashIndex]] first (tombstones hide the id in EVERY
   * segment — the same contract as the ANN and lexical stores).
   */
  def deleteFromMinhashIndex(ids: DataFrame, indexDir: String): Unit = {
    val spark = ids.sparkSession
    require(ids.columns.length == 1,
      s"deleteFromMinhashIndex takes a single-column id frame, got " +
        s"(${ids.columns.mkString(", ")}) — selecting a wrong column " +
        "silently would tombstone the wrong documents")
    val (ver, mf) = readManifest(spark, indexDir, "deleteFromMinhashIndex")
    val dels = ids.select(col(ids.columns.head).as("id")).distinct().localCheckpoint()
    if (dels.isEmpty) return
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    val base = s"$indexDir/gen=$genId"
    dels.coalesce(1).write.mode("overwrite").parquet(s"$base/tombstones")
    liveBands(spark, indexDir, mf.segs, mf.delGens)
      .join(broadcast(dels), Seq("id"), "left_semi")
      .groupBy("band", "band_key").agg(negate(count(lit(1))).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/occupancy")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(mf.copy(delGens = mf.delGens :+ genId)))
  }

  /**
   * Compaction + physical purge in one rewrite: all live segments minus
   * tombstoned docs merge into ONE re-clustered segment with occupancy
   * recomputed from the surviving rows, committed with no `del` lines —
   * after this plus [[vacuumMinhashIndex]] no byte of a deleted document
   * remains, and deleted ids become re-appendable. Serving is identical
   * before and after (spec-pinned). Returns the number of generations
   * retired (segments merged + del generations + pair generations), 0
   * when the index is already a single tombstone-free segment with at
   * most one pair generation.
   */
  def compactMinhashIndex(spark: SparkSession, indexDir: String): Int = {
    val (ver, mf) = readManifest(spark, indexDir, "compactMinhashIndex")
    if (mf.segs.size <= 1 && mf.delGens.isEmpty && mf.pairGens.size <= 1) return 0
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    writeSegment(
      liveBands(spark, indexDir, mf.segs, mf.delGens), s"$indexDir/gen=$genId")
    // verified-pair generations fold into the SAME rewrite: tombstoned ids
    // drop out physically, duplicates collapse, and the surviving verdicts
    // keep their pinned vmeta — serving is identical before and after
    val survivingPairs = livePairs(spark, indexDir, mf).map { p =>
      p.select("id_a", "id_b", "jaccard", "pass")
        .sortWithinPartitions("id_a", "id_b")
        .write.mode("overwrite").parquet(s"$indexDir/gen=$genId/pairs")
      genId
    }
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(mf.copy(
        segs = Seq(genId), delGens = Seq.empty,
        pairGens = survivingPairs.toSeq,
        vmeta = mf.vmeta.filter(_ => survivingPairs.nonEmpty))))
    mf.segs.size + mf.delGens.size + mf.pairGens.size
  }

  /** Drop generation directories the current manifest does not reference
    * (superseded rebuilds, compaction victims, crash debris). Space only;
    * returns the count removed. */
  def vacuumMinhashIndex(spark: SparkSession, indexDir: String): Int = {
    val live = ManifestStore.readVersioned(spark, indexDir, Prefix)
      .map { case (_, c) =>
        val mf = parseManifest(c); (mf.segs ++ mf.delGens ++ mf.pairGens).toSet }
      .getOrElse(Set.empty[String])
    val hfs = ManifestStore.fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    if (!hfs.exists(dir)) return 0
    val dead = hfs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") &&
        !live.contains(p.getName.stripPrefix("gen=")))
    dead.foreach(p => hfs.delete(p, true))
    dead.length
  }

  /** One-call health report (the [[Retrieval.lexIndexStats]] twin):
    * committed version, signature meta, live segments, tombstone debt,
    * and unreferenced debris directories. Listings + one tiny tombstone
    * read — band rows are never touched. */
  final case class MinhashIndexStats(
      version: Long, meta: MhMeta, segments: Int,
      tombstoneGenerations: Int, tombstonedIds: Long, debrisGenerations: Int,
      pairGenerations: Int, verificationMeta: Option[(Int, Double)])

  def minhashIndexStats(
      spark: SparkSession, indexDir: String): Option[MinhashIndexStats] =
    ManifestStore.readVersioned(spark, indexDir, Prefix).map { case (ver, content) =>
      val mf = parseManifest(content)
      val nTs = liveTombstones(spark, indexDir, mf.delGens).map(_.count()).getOrElse(0L)
      val live = (mf.segs ++ mf.delGens ++ mf.pairGens).toSet
      val hfs = ManifestStore.fs(spark, indexDir)
      val dir = new org.apache.hadoop.fs.Path(indexDir)
      val onDisk =
        if (!hfs.exists(dir)) Set.empty[String]
        else hfs.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=")).toSet
      MinhashIndexStats(ver, mf.meta, mf.segs.size, mf.delGens.size, nTs,
        (onDisk -- live).size, mf.pairGens.size, mf.vmeta)
    }
}
