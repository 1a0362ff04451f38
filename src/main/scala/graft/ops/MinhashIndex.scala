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

  private def parseManifest(content: String): (MhMeta, Seq[String], Seq[String]) = {
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    val meta = lines.collectFirst { case l if l.startsWith("meta\t") =>
      val Array(nh, b, sh) = l.stripPrefix("meta\t").split(",")
      MhMeta(nh.toInt, b.toInt, sh.toInt)
    }.getOrElse(throw new IllegalStateException(
      "minhash index manifest carries no meta line — not a minhash index"))
    (meta,
      lines.collect { case l if l.startsWith("seg\t") => l.stripPrefix("seg\t") },
      lines.collect { case l if l.startsWith("del\t") => l.stripPrefix("del\t") })
  }

  private def manifestContent(
      meta: MhMeta, segs: Seq[String], delGens: Seq[String]): String =
    (s"meta\t${meta.numHashes},${meta.bands},${meta.shingle}" +:
      (segs.map(g => s"seg\t$g") ++ delGens.map(g => s"del\t$g")))
      .mkString("", "\n", "\n")

  private def readManifest(
      spark: SparkSession, indexDir: String,
      op: String): (Long, MhMeta, Seq[String], Seq[String]) = {
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, Prefix)
      .getOrElse(throw new IllegalStateException(
        s"$op: no committed minhash index under $indexDir"))
    val (meta, segs, delGens) = parseManifest(content)
    (ver, meta, segs, delGens)
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
    * manifest stays authoritative until the new commit lands. */
  def writeMinhashIndex(
      df: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3): Unit = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val spark = df.sparkSession
    val meta = MhMeta(numHashes, bands, shingle)
    val gen = nextGen(spark, indexDir)
    val genId = newGenId(gen)
    writeSegment(bandRows(df, idCol, textCol, meta), s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(meta, Seq(genId), Seq.empty))
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
   */
  def appendToMinhashIndex(
      delta: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxOccupancy: Int = Int.MaxValue): DataFrame = {
    val spark = delta.sparkSession
    val (ver, meta, segs, delGens) = readManifest(spark, indexDir, "appendToMinhashIndex")
    val bandsB = bandRows(delta, idCol, textCol, meta).localCheckpoint()
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
      manifestContent(meta, segs :+ genId, delGens))
    pairs
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
    val (_, _, segs, delGens) = readManifest(spark, indexDir, "candidatePairsIndexed")
    Dedup.candidatePairs(liveBands(spark, indexDir, segs, delGens), maxOccupancy)
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
   */
  def nearDuplicatesForBatch(
      delta: DataFrame, corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingle: Int = 3, threshold: Double = 0.5,
      maxOccupancy: Int = 64): DataFrame = {
    val newPairs = appendToMinhashIndex(delta, indexDir, idCol, textCol, maxOccupancy)
    Dedup.verifyJaccard(newPairs, corpus, idCol, textCol, shingle,
        minJaccard = threshold)
      .where(col("jaccard") >= threshold)
  }

  /** End-to-end near-dup detection FROM the index: stored candidate pairs
    * ([[candidatePairsIndexed]] — never re-signs) Jaccard-verified against
    * the corpus text at `threshold` ([[Dedup.verifyJaccard]] — shingles
    * only candidate docs). The one-call serving form of
    * [[Dedup.nearDuplicates]] with the signing cost amortized into the
    * store; verification remains ∝ candidate mass by nature. */
  def nearDuplicatesIndexed(
      corpus: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingle: Int = 3, threshold: Double = 0.5,
      maxOccupancy: Int = 64): DataFrame =
    Dedup.verifyJaccard(
        candidatePairsIndexed(corpus.sparkSession, indexDir, maxOccupancy),
        corpus, idCol, textCol, shingle, minJaccard = threshold)
      .where(col("jaccard") >= threshold)

  /** The live banded view `(id, band, band_key)` — for composing with
    * custom verification or occupancy audits ([[Dedup.lshOccupancyStats]]). */
  def readMinhashBands(spark: SparkSession, indexDir: String): DataFrame = {
    val (_, _, segs, delGens) = readManifest(spark, indexDir, "readMinhashBands")
    liveBands(spark, indexDir, segs, delGens)
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
    val (_, segs, delGens) = parseManifest(content)
    liveBands(spark, indexDir, segs, delGens)
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
    val (ver, meta, segs, delGens) = readManifest(spark, indexDir, "deleteFromMinhashIndex")
    val dels = ids.select(col(ids.columns.head).as("id")).distinct().localCheckpoint()
    if (dels.isEmpty) return
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    val base = s"$indexDir/gen=$genId"
    dels.coalesce(1).write.mode("overwrite").parquet(s"$base/tombstones")
    liveBands(spark, indexDir, segs, delGens)
      .join(broadcast(dels), Seq("id"), "left_semi")
      .groupBy("band", "band_key").agg(negate(count(lit(1))).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/occupancy")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(meta, segs, delGens :+ genId))
  }

  /**
   * Compaction + physical purge in one rewrite: all live segments minus
   * tombstoned docs merge into ONE re-clustered segment with occupancy
   * recomputed from the surviving rows, committed with no `del` lines —
   * after this plus [[vacuumMinhashIndex]] no byte of a deleted document
   * remains, and deleted ids become re-appendable. Serving is identical
   * before and after (spec-pinned). Returns the number of generations
   * retired (segments merged + del generations), 0 when the index is
   * already a single tombstone-free segment.
   */
  def compactMinhashIndex(spark: SparkSession, indexDir: String): Int = {
    val (ver, meta, segs, delGens) = readManifest(spark, indexDir, "compactMinhashIndex")
    if (segs.size <= 1 && delGens.isEmpty) return 0
    val gen = math.max(nextGen(spark, indexDir), ver + 1)
    val genId = newGenId(gen)
    writeSegment(
      liveBands(spark, indexDir, segs, delGens), s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, Prefix, gen,
      manifestContent(meta, Seq(genId), Seq.empty))
    segs.size + delGens.size
  }

  /** Drop generation directories the current manifest does not reference
    * (superseded rebuilds, compaction victims, crash debris). Space only;
    * returns the count removed. */
  def vacuumMinhashIndex(spark: SparkSession, indexDir: String): Int = {
    val live = ManifestStore.readVersioned(spark, indexDir, Prefix)
      .map { case (_, c) => val (_, s, d) = parseManifest(c); (s ++ d).toSet }
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
      tombstoneGenerations: Int, tombstonedIds: Long, debrisGenerations: Int)

  def minhashIndexStats(
      spark: SparkSession, indexDir: String): Option[MinhashIndexStats] =
    ManifestStore.readVersioned(spark, indexDir, Prefix).map { case (ver, content) =>
      val (meta, segs, delGens) = parseManifest(content)
      val nTs = liveTombstones(spark, indexDir, delGens).map(_.count()).getOrElse(0L)
      val live = (segs ++ delGens).toSet
      val hfs = ManifestStore.fs(spark, indexDir)
      val dir = new org.apache.hadoop.fs.Path(indexDir)
      val onDisk =
        if (!hfs.exists(dir)) Set.empty[String]
        else hfs.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=")).toSet
      MinhashIndexStats(ver, meta, segs.size, delGens.size, nTs, (onDisk -- live).size)
    }
}
