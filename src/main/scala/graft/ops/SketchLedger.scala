package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Generic persisted SKETCH LEDGER — the third face of the versioned-commit
 * protocol ([[ManifestStore.commitVersioned]]), after the statements table
 * and the ANN/lexical indexes: every mergeable summary in this library
 * (Count-Min matrices — [[Profile.cmsMergeAll]]; HLL binaries —
 * [[Profile.hllMergedEstimate]]; DD log-histograms — [[Profile.ddQuantiles]]
 * over a bucket-count fold; Misra-Gries heavy-hitter arrays) can be
 * maintained as an append-only sequence of tiny per-batch sketch frames,
 * committed atomically and folded at read time — corpus-wide statistics at
 * cost ∝ batches, with NO batch ever rescanned and no reader ever seeing a
 * half-appended state.
 *
 * Layout under `dir`: `gen=<V>-<token>/` parquet (one small frame per
 * append) + `_sketch.<V>[.<writer token>]` manifests naming the live
 * generations. Crash debris (a written generation whose commit never
 * landed) is invisible; a concurrent-append loser throws rather than
 * silently losing the winner's batch — the [[ManifestStore.CommitProtocol]]
 * guarantees, unchanged.
 *
 * The fold itself stays with the caller (each sketch family has its own
 * merge: elementwise addition, `hll_union_agg`, bucket-count sum) — the
 * ledger is deliberately schema-agnostic.
 */
object SketchLedger {

  private val Prefix = "_sketch"

  private def newGenId(version: Long): String =
    s"$version-${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  private def parseManifest(content: String): Seq[String] =
    content.linesIterator.filter(_.nonEmpty)
      .collect { case l if l.startsWith("gen\t") => l.stripPrefix("gen\t") }.toSeq

  private def parseTags(content: String): Seq[String] =
    content.linesIterator.filter(_.nonEmpty)
      .collect { case l if l.startsWith("tag\t") => l.stripPrefix("tag\t") }.toSeq

  private def manifestContent(gens: Seq[String], tags: Seq[String]): String =
    (gens.map(g => s"gen\t$g") ++ tags.map(t => s"tag\t$t"))
      .mkString("", "\n", "\n")

  /** Append one sketch frame (typically one row, a few KB) as a new
    * committed generation; returns the committed version. The first append
    * creates the ledger.
    *
    * `tag` makes the append IDEMPOTENT under at-least-once replay: a tag
    * already recorded in the manifest (committed atomically WITH its
    * frame) skips the append and returns the current version — stamp a
    * streaming sink's appends with the `foreachBatch` batch id and a
    * crash-replayed batch becomes a non-event instead of a double-counted
    * frame. Tags survive [[compact]] (a compacted ledger must still
    * reject a very late replay) and cost one manifest line each;
    * retention is BOUNDED to the trailing
    * [[ManifestStore.MaxRetainedTags]] (checkpoint recovery can only
    * replay the most recent uncommitted batch ids — an unbounded list
    * would grow the manifest and its contains-scan linearly forever on an
    * unbounded stream). */
  def append(sketch: DataFrame, dir: String, tag: Option[String] = None): Long = {
    val spark = sketch.sparkSession
    val prior = ManifestStore.readVersioned(spark, dir, Prefix)
    val gens = prior.map { case (_, c) => parseManifest(c) }.getOrElse(Seq.empty)
    val tags = prior.map { case (_, c) => parseTags(c) }.getOrElse(Seq.empty)
    if (tag.exists(tags.contains)) prior.get._1 // replayed batch: no-op
    else {
      tag.foreach(ManifestStore.requireTagShape)
      // Version derives from the manifest we READ, never from on-disk gen
      // dirs: a stale appender must collide on prior.version + 1 and throw
      // (the documented loser-throws contract) instead of bumping past a
      // concurrent winner and committing a manifest that omits the
      // winner's frame. The UUID suffix keeps same-version crash-debris
      // directories collision-free.
      val gen = prior.map(_._1 + 1).getOrElse(1L)
      val genId = newGenId(gen)
      sketch.coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=$genId")
      ManifestStore.commitVersioned(spark, dir, Prefix, gen,
        manifestContent(gens :+ genId, ManifestStore.boundTags(tags ++ tag)))
      gen
    }
  }

  /** Tags recorded by idempotent appends, in append order. */
  def tags(spark: SparkSession, dir: String): Seq[String] =
    ManifestStore.readVersioned(spark, dir, Prefix)
      .map { case (_, c) => parseTags(c) }.getOrElse(Seq.empty)

  /** Committed generation ids in append order — the window handle for
    * before/after comparisons over the ledger (drift scoring folds a
    * prefix and its complement separately). Empty before the first
    * commit. */
  def generations(spark: SparkSession, dir: String): Seq[String] =
    ManifestStore.readVersioned(spark, dir, Prefix)
      .map { case (_, c) => parseManifest(c) }.getOrElse(Seq.empty)

  /** The union of an explicit generation subset (ids from
    * [[generations]]) — same shape as [[read]] but windowed. */
  def readGens(spark: SparkSession, dir: String, gens: Seq[String]): DataFrame = {
    require(gens.nonEmpty, "readGens of an empty generation window")
    gens.map(g => spark.read.parquet(s"$dir/gen=$g")).reduce(_.unionByName(_))
  }

  /** All committed sketch frames, unioned — hand the result to the
    * family's fold. None before the first commit. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    ManifestStore.readVersioned(spark, dir, Prefix).map { case (_, content) =>
      parseManifest(content)
        .map(g => spark.read.parquet(s"$dir/gen=$g"))
        .reduce(_.unionByName(_))
    }

  /** Committed version and generation count (the compaction-pressure
    * signal — a deployment folding thousands of generations re-appends
    * the fold as one frame and vacuums). */
  def status(spark: SparkSession, dir: String): Option[(Long, Int)] =
    ManifestStore.readVersioned(spark, dir, Prefix)
      .map { case (v, c) => (v, parseManifest(c).size) }

  /** Replace all live generations with the single `folded` frame (the
    * caller's fold of [[read]]) — compaction for a long-lived ledger.
    * Old generations become debris for [[vacuum]]. */
  def compact(folded: DataFrame, dir: String): Long = {
    val spark = folded.sparkSession
    val (ver, content) = ManifestStore.readVersioned(spark, dir, Prefix)
      .getOrElse(throw new IllegalStateException(s"no committed ledger under $dir"))
    val gen = ver + 1 // same read-version CAS discipline as append
    val genId = newGenId(gen)
    folded.coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=$genId")
    // idempotence tags OUTLIVE the frames they arrived with: a compacted
    // ledger must still treat a very late replayed batch as a no-op
    // (retention stays bounded — the trailing window covers every id
    // checkpoint recovery could still replay)
    ManifestStore.commitVersioned(spark, dir, Prefix, gen,
      manifestContent(Seq(genId), ManifestStore.boundTags(parseTags(content))))
    gen
  }

  /** Drop generation directories the CURRENT manifest doesn't name and
    * manifest files below the latest version. Returns directories deleted. */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val live = ManifestStore.readVersioned(spark, dir, Prefix)
      .map { case (_, c) => parseManifest(c).toSet }.getOrElse(return 0)
    val hfs = ManifestStore.fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val dead = hfs.listStatus(p).map(_.getPath)
      .filter(x => x.getName.startsWith("gen=") &&
        !live.contains(x.getName.stripPrefix("gen=")))
    dead.foreach(d => hfs.delete(d, true))
    // reclaim superseded manifests (keep every file of the newest version —
    // read-repair winners resolve at read time)
    val files = ManifestStore.listVersioned(spark, dir, Prefix)
    val vmax = files.map(_._1).max
    files.filter(_._1 < vmax).foreach { case (_, _, name) =>
      hfs.delete(new org.apache.hadoop.fs.Path(dir, name), false)
    }
    dead.length
  }
}
