package graft.ops

import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Manifest-committed partitioned table — the single-write alternative to
 * the staged double-write in [[FinOps.upsertStatements]].
 *
 * Layout under `path`:
 * {{{
 *   data/gen=<V>/<partCol>=<value>/part-*.parquet   — immutable once written
 *   _manifest.<zero-padded V>                        — partition → generation
 * }}}
 *
 * A manifest file maps every live partition value to the generation whose
 * directory holds its CURRENT rows. Readers resolve the highest-numbered
 * manifest and read exactly the directories it names; writers append new
 * generation directories (never touching existing files) and then commit by
 * renaming a complete manifest into place.
 *
 * Crash-safety argument (vs the staged double-write):
 *  - The ONLY visible-state transition is the manifest rename — on HDFS and
 *    POSIX a rename into a NEW name is atomic, and the writer never reuses
 *    or overwrites a manifest name (versions are strictly increasing).
 *  - A crash anywhere before the rename leaves orphan `gen=` debris and/or
 *    a `.tmp` manifest, both invisible to readers: the previous manifest
 *    still names only complete directories. No recovery re-apply step
 *    exists because no reader can ever observe a partial write — compare
 *    [[FinOps.recoverUpsertStaging]], which must repair half-overwritten
 *    partitions.
 *  - A retry after a crash picks a FRESH generation number (max over both
 *    the manifest version and all `gen=` directories on disk, +1), so debris
 *    from the failed attempt is never appended into.
 *  - Readers holding the previous manifest keep a consistent SNAPSHOT even
 *    while an upsert commits (old generations are immutable) — the staged
 *    scheme's dynamic partition overwrite invalidates concurrent lazy scans
 *    of the rewritten partitions, which is why the pipeline must eagerly
 *    materialize history before upserting.
 *  - SINGLE WRITER supported: the crash-safety argument covers one writer
 *    crashing/retrying; a deployment with multiple writers must still
 *    serialize upserts externally (the same contract Hive's INSERT
 *    OVERWRITE and the staged scheme carry). Since round 9 a violation is
 *    NON-CORRUPTING rather than silently corrupting: generation ids carry
 *    a per-writer random token (`gen=<V>-<token>`), so two concurrent
 *    upserts write into structurally disjoint directories and race only
 *    on the manifest commit — whose store-dependent primitive is the
 *    pluggable [[CommitProtocol]]: `AtomicRename` (HDFS/POSIX-like
 *    stores — FileContext rename WITHOUT overwrite, which fails on an
 *    existing destination; the plain `FileSystem.rename` would silently
 *    REPLACE on vanilla LocalFileSystem/POSIX) or `VersionedReadRepair`
 *    (S3-class stores with no atomic fail-if-exists rename —
 *    writer-unique manifest names, deterministic min-token winner at
 *    read time, loser self-aborts). Under both, at most one writer
 *    acknowledges a version, the loser throws, and its token-unique
 *    debris (referenced by no winning manifest) is invisible and
 *    vacuumable. The winner's manifest cannot name a loser's files.
 *  - Cost of the trade: orphan/superseded generation directories accumulate
 *    until [[vacuum]] (space, not correctness), and the manifest is a
 *    per-partition map held driver-side at commit time — at extreme
 *    partition counts a production system chunks it (Iceberg's manifest
 *    list); the single-file form is right up to millions of entries.
 *
 * Write volume: the merged frame is written ONCE (the staged scheme writes
 * it twice — staging copy, then partition overwrite). At 100 TB the upsert
 * path's cost is dominated by exactly this volume.
 */
object ManifestStore {

  /** `entries` maps each live partition value to its generation ID — the
    * `gen=` directory name suffix. Historically a bare number; since round
    * 9 writers mint `<V>-<token>` ids (both forms parse and read).
    * `tags` are idempotence markers (round 15 — the [[SketchLedger]]
    * pattern generalized): an [[upsert]] stamped with a tag already in the
    * manifest is a no-op, so a crash-replayed streaming micro-batch never
    * re-folds additive partials. Serialized as `#tag\t<t>` lines beside the
    * entry lines and committed atomically with them. */
  final case class Manifest(
      version: Long, entries: Map[String, String],
      tags: Seq[String] = Seq.empty)

  // -------------------------------------------------------------------------
  // Idempotence tags, shared across every manifest dialect in this engine
  // (this table store, SketchLedger, the minhash/lexical index manifests):
  // a tag is one line committed atomically WITH the append it marks, so
  // "was this batch already folded in?" is answerable from the same read
  // that serves the store. Retention is BOUNDED (advice r14): checkpoint
  // recovery can only ever replay the most recent uncommitted batch ids,
  // so tags beyond the trailing window are dead weight — an unbounded list
  // would grow the manifest (and the contains scan) linearly forever.
  // MaxRetainedTags = 512 is ~three orders of magnitude above any real
  // replay horizon (micro-batch engines replay the last uncommitted batch,
  // occasionally a handful).
  // -------------------------------------------------------------------------

  private[graft] val MaxRetainedTags = 512

  private[graft] def boundTags(tags: Seq[String]): Seq[String] =
    if (tags.size <= MaxRetainedTags) tags else tags.takeRight(MaxRetainedTags)

  private[graft] def requireTagShape(tag: String): Unit =
    require(!tag.contains('\n') && !tag.contains('\t'),
      s"idempotence tag must not contain tab/newline: '$tag'")

  /**
   * Commit-primitive strategy for the versioned-file protocol — the one
   * store-dependent step. Everything else (immutable generation
   * directories, never-reused version numbers, debris-until-named) is
   * store-agnostic.
   */
  sealed trait CommitProtocol
  object CommitProtocol {
    /**
     * HDFS / POSIX-like stores: tmp write + rename that FAILS if the
     * destination exists. Implemented via `FileContext.rename` WITHOUT
     * `Options.Rename.OVERWRITE` — the `FileSystem.rename` API is NOT a
     * safe primitive here: vanilla Hadoop `LocalFileSystem`/POSIX
     * `rename(2)` silently REPLACE an existing destination, so a racing
     * loser would overwrite the winner's same-version manifest. On HDFS
     * the no-overwrite check is atomic in the NameNode; on local
     * filesystems FileContext enforces it with a check that closes the
     * silent-overwrite hole (a vanishing TOCTOU window remains — use
     * [[VersionedReadRepair]] where true multi-writer safety matters).
     * For schemes with no `AbstractFileSystem` binding the fall-back is an
     * explicit exists-check before `FileSystem.rename` (same contract,
     * wider window).
     */
    case object AtomicRename extends CommitProtocol

    /**
     * Object stores with NO atomic fail-if-exists rename (S3: rename =
     * copy+delete, destinations silently replaced): version-file names are
     * made WRITER-UNIQUE (`<prefix>.<v>.<token>`), so no two writers ever
     * contend on one name — the only atomicity required is "a completed
     * PUT/rename appears as a whole object", which S3 and every POSIX-like
     * store provide. Duplicate files for one version are RESOLVED AT READ
     * TIME: the deterministic winner is the lexically smallest token.
     * After its (uncontended) rename a writer lists the version's files;
     * if ANY other writer's file is visible it aborts — deletes its own
     * file and throws — so at most one writer ACKNOWLEDGES each version
     * (two true-simultaneous racers can BOTH abort: no commit at that
     * version, both throw, retry-able; never a half state). Remaining
     * window, stated honestly: a writer that CRASHES between its rename
     * and its visibility check leaves a same-version file that can shadow
     * a concurrently-acknowledged winner if its token sorts lower — the
     * store gives no RENAME-class primitive to close this; a store-native
     * conditional PUT does, and since round 11 that is the
     * [[ConditionalPut]] tier (register an S3 `If-None-Match` client via
     * [[ManifestStore.registerCommitStore]]). This tier remains for
     * S3-class stores without such a client.
     * Every resolvable state remains CONSISTENT (each candidate manifest
     * names only complete, immutable generations derived from the prior
     * version); the hazard is lost-update between two concurrent writers,
     * which the store's single-writer contract already excludes — this
     * tier exists to make a violation non-corrupting on S3, exactly as
     * [[AtomicRename]] does on HDFS. [[vacuum]] reclaims non-winner
     * duplicates.
     */
    case object VersionedReadRepair extends CommitProtocol

    /**
     * Store-native conditional-PUT tier — closes the residual crash window
     * [[VersionedReadRepair]] documents: when the store can atomically
     * "create this object iff absent" (S3 `If-None-Match: *`, GCS
     * `ifGenerationMatch=0`, HDFS create-exclusive), the commit IS that
     * one call. A writer either completed the put (committed, visible,
     * version taken) or it didn't (nothing visible) — there is NO
     * intermediate state a crash can leave, so the crashed-writer-shadows-
     * a-winner hazard of the read-repair tier cannot arise. The protocol
     * logic needs nothing else from the store: losers get `false` and
     * throw, no tmp files, no visibility check, no read-time resolution.
     */
    final case class ConditionalPut(store: CommitStore) extends CommitProtocol

    /** Session-level switch: `spark.graft.commit.protocol` =
      * `rename` (default — HDFS/POSIX) | `read-repair` (S3-class stores
      * without a registered conditional-put client) | `conditional-put`
      * (uses the [[ManifestStore.registerCommitStore registered]]
      * [[CommitStore]], falling back to [[CommitStore.HadoopCreateExclusive]]). */
    def fromConf(spark: SparkSession): CommitProtocol =
      spark.conf.get("spark.graft.commit.protocol", "rename") match {
        case "rename"          => AtomicRename
        case "read-repair"     => VersionedReadRepair
        case "conditional-put" => ConditionalPut(currentCommitStore)
        case other => throw new IllegalArgumentException(
          s"spark.graft.commit.protocol must be rename|read-repair|conditional-put, got $other")
      }
  }

  /**
   * The narrow store SPI behind [[CommitProtocol.ConditionalPut]] — ONE
   * method, so a real S3 client (`PutObject` with `If-None-Match: *`) can
   * drop in without touching any protocol logic. Implementations must make
   * the create-iff-absent decision ATOMIC in the store; everything else in
   * the commit machinery is store-agnostic.
   */
  trait CommitStore {
    /** Atomically create `dir/name` with `content` iff no object exists at
      * that name; return false — writing nothing — when one does. */
    def putIfAbsent(
        spark: SparkSession, dir: String, name: String, content: Array[Byte]): Boolean
  }

  object CommitStore {
    /** Hadoop `create(path, overwrite = false)` — atomic in the NameNode on
      * HDFS (true create-exclusive); on local filesystems the no-overwrite
      * check is enforced but not race-atomic (prefer a store-native client
      * where true multi-writer safety matters). */
    object HadoopCreateExclusive extends CommitStore {
      override def putIfAbsent(
          spark: SparkSession, dir: String, name: String,
          content: Array[Byte]): Boolean = {
        val hfs = fs(spark, dir)
        val p = new Path(dir, name)
        val out =
          try hfs.create(p, false)
          catch {
            case e: java.io.IOException =>
              if (hfs.exists(p)) return false else throw e
          }
        try out.write(content) finally out.close()
        true
      }
    }
  }

  @volatile private var registeredCommitStore: Option[CommitStore] = None

  /** Install a store-native [[CommitStore]] (e.g. an S3 `If-None-Match`
    * client) for the `conditional-put` protocol; process-wide. */
  def registerCommitStore(store: CommitStore): Unit =
    registeredCommitStore = Some(store)

  def clearCommitStore(): Unit = registeredCommitStore = None

  private def currentCommitStore: CommitStore =
    registeredCommitStore.getOrElse(CommitStore.HadoopCreateExclusive)

  private[graft] def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // -----------------------------------------------------------------------
  // THE commit protocol — shared by this table store and the persisted ANN
  // index ([[Similarity.writeIndex]]/appendToIndex): versioned text files
  // `<prefix>.<zero-padded v>[.<writer token>]` written to a `.tmp` name
  // and committed by the [[CommitProtocol]] in force. Everything else
  // (data files, generation directories) is invisible debris until a
  // manifest names it.
  // -----------------------------------------------------------------------

  /** Parse a committed version-file name: `(version, writerToken)` —
    * token is "" for the rename-form `<prefix>.<v>`. `.tmp` and foreign
    * names → None. */
  private[graft] def parseVersioned(name: String, prefix: String): Option[(Long, String)] = {
    if (!name.startsWith(prefix + ".") || name.endsWith(".tmp")) return None
    val rest = name.stripPrefix(prefix + ".")
    val dot = rest.indexOf('.')
    val (v, tok) = if (dot < 0) (rest, "") else (rest.substring(0, dot), rest.substring(dot + 1))
    if (v.nonEmpty && v.forall(_.isDigit)) Some((v.toLong, tok)) else None
  }

  /** All committed version files under `dir`: `(version, token, fileName)`.
    * The committed content of version v is its lexically-SMALLEST-token
    * file (rename-form "" sorts first) — deterministic under
    * [[CommitProtocol.VersionedReadRepair]]'s duplicate-tolerant reads,
    * and trivially unique under [[CommitProtocol.AtomicRename]]. */
  private[graft] def listVersioned(
      spark: SparkSession, dir: String, prefix: String): Seq[(Long, String, String)] = {
    val d = new Path(dir)
    val hfs = fs(spark, dir)
    if (!hfs.exists(d)) return Seq.empty
    hfs.listStatus(d).toSeq
      .flatMap(st => parseVersioned(st.getPath.getName, prefix)
        .map { case (v, tok) => (v, tok, st.getPath.getName) })
  }

  private def readFile(spark: SparkSession, dir: String, name: String): String = {
    val in = fs(spark, dir).open(new Path(dir, name))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Highest committed `<prefix>.<v>` under `dir`: `(version, content)`. */
  private[graft] def readVersioned(
      spark: SparkSession, dir: String, prefix: String): Option[(Long, String)] = {
    val files = listVersioned(spark, dir, prefix)
    if (files.isEmpty) return None
    val vmax = files.map(_._1).max
    val name = files.filter(_._1 == vmax).minBy(_._2)._3
    Some((vmax, readFile(spark, dir, name)))
  }

  /** The committed `<prefix>` file with the HIGHEST version ≤ `asOf` —
    * the generic time-travel resolve behind [[readManifestAt]] and the
    * index stores' `readIndexAt`/`readLexIndexAt`. */
  private[graft] def readVersionedAt(
      spark: SparkSession, dir: String, prefix: String,
      asOf: Long): Option[(Long, String)] = {
    val files = listVersioned(spark, dir, prefix).filter(_._1 <= asOf)
    if (files.isEmpty) return None
    val v = files.map(_._1).max
    val name = files.filter(_._1 == v).minBy(_._2)._3
    Some((v, readFile(spark, dir, name)))
  }

  /** All committed versions of `<prefix>` under `dir`, ascending. */
  private[graft] def versionsOf(
      spark: SparkSession, dir: String, prefix: String): Seq[Long] =
    listVersioned(spark, dir, prefix).map(_._1).distinct.sorted

  private def writerToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** Commit `content` as version `version` of `<prefix>` under `dir`,
    * using the [[CommitProtocol]] selected by `spark.graft.commit.protocol`.
    * Throws (never silently loses a prior commit) when another writer
    * already holds the version. */
  private[graft] def commitVersioned(
      spark: SparkSession, dir: String, prefix: String,
      version: Long, content: String): Unit =
    commitVersioned(spark, dir, prefix, version, content, CommitProtocol.fromConf(spark))

  private[graft] def commitVersioned(
      spark: SparkSession, dir: String, prefix: String,
      version: Long, content: String, protocol: CommitProtocol): Unit = {
    val hfs = fs(spark, dir)
    val finalName = f"$prefix.$version%012d"
    protocol match {
      case CommitProtocol.ConditionalPut(store) =>
        // one atomic create-iff-absent IS the commit — no tmp file, no
        // rename, no visibility check, no crash window
        if (!store.putIfAbsent(spark, dir, finalName, content.getBytes("UTF-8")))
          throw new java.io.IOException(
            s"conditional-put commit refused for $finalName under $dir — " +
              s"a concurrent writer committed this version first")
      case _ => commitVersionedByRename(
        spark, hfs, dir, prefix, version, content, protocol, finalName)
    }
  }

  private def commitVersionedByRename(
      spark: SparkSession, hfs: FileSystem, dir: String, prefix: String,
      version: Long, content: String, protocol: CommitProtocol,
      finalName: String): Unit = {
    val token = writerToken()
    // tmp name is writer-unique under BOTH rename protocols: two racing
    // writers must never clobber each other's in-flight bytes
    val tmp = new Path(dir, s"$finalName.$token.tmp")
    val out = hfs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    protocol match {
      case CommitProtocol.AtomicRename =>
        val dst = hfs.makeQualified(new Path(dir, finalName))
        val src = hfs.makeQualified(tmp)
        val fc =
          try Some(FileContext.getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration))
          catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }
        fc match {
          case Some(c) =>
            // no Options.Rename.OVERWRITE → FileAlreadyExistsException if
            // dst exists (atomic on HDFS; enforced-check on local FS —
            // FileSystem.rename would silently REPLACE there)
            try c.rename(src, dst)
            catch { case e: java.io.IOException =>
              hfs.delete(tmp, false)
              throw new java.io.IOException(
                s"commit rename failed for $finalName under $dir — " +
                  s"a concurrent writer likely committed this version first", e)
            }
          case None =>
            // scheme without an AbstractFileSystem binding: explicit
            // exists-check (wider race window; prefer read-repair there)
            if (hfs.exists(dst) || !hfs.rename(tmp, dst)) {
              hfs.delete(tmp, false)
              throw new java.io.IOException(
                s"commit rename failed for $finalName under $dir — " +
                  s"destination already committed by a concurrent writer")
            }
        }
      case CommitProtocol.VersionedReadRepair =>
        // rename to a writer-UNIQUE final name (uncontended — safe even
        // where rename is copy+delete), then check who else is visible
        val mine = new Path(dir, s"$finalName.$token")
        if (!hfs.rename(tmp, mine))
          throw new java.io.IOException(
            s"commit rename failed for ${mine.getName} under $dir")
        val others = listVersioned(spark, dir, prefix)
          .filter { case (v, tok, _) => v == version && tok != token }
        if (others.nonEmpty) {
          hfs.delete(mine, false)
          throw new java.io.IOException(
            s"lost the version-$version commit race under $dir to " +
              s"${others.map(_._3).sorted.mkString(", ")}")
        }
      case CommitProtocol.ConditionalPut(_) =>
        throw new IllegalStateException(
          "ConditionalPut is dispatched before the rename path") // unreachable
    }
  }

  private val TagLine = "#tag\t"

  private def parseManifest(version: Long, content: String): Manifest = {
    val (tagLines, entryLines) =
      content.linesIterator.filter(_.nonEmpty).toSeq.partition(_.startsWith(TagLine))
    val entries = entryLines.map { line =>
      val i = line.lastIndexOf('\t')
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
    Manifest(version, entries, tagLines.map(_.stripPrefix(TagLine)))
  }

  /** Numeric component of a generation id (`"7"` and `"7-ab12cd34"` → 7). */
  private def genNumber(genId: String): Long =
    genId.takeWhile(_.isDigit).toLong

  /** Fresh writer-unique generation id: the next version number plus a
    * random per-writer token, so no two writers — even ones that read the
    * same manifest concurrently — can ever produce the same directory. */
  private def newGenId(version: Long): String =
    s"$version-${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  /** Highest committed manifest, if any. */
  def readManifest(spark: SparkSession, path: String): Option[Manifest] =
    readVersioned(spark, path, "_manifest")
      .map { case (version, content) => parseManifest(version, content) }

  /** The committed manifest with the HIGHEST version ≤ `asOf`, if any —
    * the snapshot a reader at that point in history saw. Manifest files
    * are never overwritten or renamed away, so every commit remains
    * addressable until [[vacuum]] physically reclaims the generations it
    * references. */
  def readManifestAt(spark: SparkSession, path: String, asOf: Long): Option[Manifest] = {
    val files = listVersioned(spark, path, "_manifest").filter(_._1 <= asOf)
    if (files.isEmpty) return None
    val v = files.map(_._1).max
    val name = files.filter(_._1 == v).minBy(_._2)._3
    Some(parseManifest(v, readFile(spark, path, name)))
  }

  /** All committed manifest versions under `path`, ascending — the store's
    * commit history (each version is an addressable snapshot until
    * [[vacuum]] reclaims what it references). */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    listVersioned(spark, path, "_manifest").map(_._1).distinct.sorted

  /** Write a complete manifest to a temp name, then commit via atomic
    * rename to its (never-reused) final name. */
  private def commitManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val sb = new StringBuilder
    m.entries.toSeq.sortBy(_._1).foreach { case (k, g) =>
      require(!k.startsWith("#tag"),
        s"partition value '$k' collides with the reserved tag-line prefix")
      sb.append(k).append('\t').append(g).append('\n')
    }
    boundTags(m.tags).foreach(t => sb.append(TagLine).append(t).append('\n'))
    commitVersioned(spark, path, "_manifest", m.version, sb.toString)
  }

  /** Idempotence tags recorded by tagged [[upsert]]s, in append order
    * (bounded to the trailing [[MaxRetainedTags]]). */
  def tags(spark: SparkSession, path: String): Seq[String] =
    readManifest(spark, path).map(_.tags).getOrElse(Seq.empty)

  /** Whether `tag` is recorded in the current manifest — the reader's
    * predicate for replay detection BEFORE recomputing an append. */
  def hasTag(spark: SparkSession, path: String, tag: String): Boolean =
    readManifest(spark, path).exists(_.tags.contains(tag))

  /** Next generation number: strictly above the committed version AND every
    * `gen=` directory on disk, so debris from a crashed attempt is never
    * appended into. (The token suffix already guarantees directory
    * uniqueness; the strictly-increasing number keeps manifest versions
    * monotone and generation history readable.) */
  private def nextGen(spark: SparkSession, path: String, m: Option[Manifest]): Long = {
    val dataDir = new Path(s"$path/data")
    val hfs = fs(spark, path)
    val onDisk =
      if (!hfs.exists(dataDir)) Seq.empty[Long]
      else hfs.listStatus(dataDir).map(_.getPath.getName)
        .filter(_.startsWith("gen=")).map(n => genNumber(n.stripPrefix("gen="))).toSeq
    (m.map(_.version).toSeq ++ onDisk :+ 0L).max + 1
  }

  /** Directories the current manifest names, restricted to `vals` (None →
    * all live partitions). */
  private def liveDirs(
      path: String, m: Manifest, partCol: String, vals: Option[Seq[String]]): Seq[String] = {
    val selected = vals.fold(m.entries)(vs => m.entries.filter { case (k, _) => vs.contains(k) })
    selected.toSeq.sorted.map { case (v, g) => s"$path/data/gen=$g/$partCol=$v" }
  }

  private def frameOf(
      spark: SparkSession, path: String, partCol: String,
      m: Manifest, partVals: Option[Seq[String]]): Option[DataFrame] = {
    val dirs = liveDirs(path, m, partCol, partVals)
    if (dirs.isEmpty) None
    else Some(
      spark.read.option("basePath", s"$path/data").parquet(dirs: _*)
        .drop("gen")
        .withColumn(partCol, col(partCol).cast("string")))
  }

  /** Current table state: exactly the manifest-named directories, one scan,
    * partition column restored, generation column dropped. None before the
    * first commit. */
  def currentFrame(
      spark: SparkSession, path: String, partCol: String,
      partVals: Option[Seq[String]] = None): Option[DataFrame] =
    readManifest(spark, path).flatMap(frameOf(spark, path, partCol, _, partVals))

  /** Time travel: the table as of commit version `asOf` (the newest commit
    * ≤ `asOf`). Generations are immutable, so the snapshot is consistent
    * with no locking; it stays READABLE until a [[vacuum]] with a
    * retention horizon above it reclaims the generations it references —
    * a deployment that serves time travel sizes `retainVersions`
    * accordingly. */
  def frameAt(
      spark: SparkSession, path: String, partCol: String, asOf: Long,
      partVals: Option[Seq[String]] = None): Option[DataFrame] =
    readManifestAt(spark, path, asOf).flatMap(frameOf(spark, path, partCol, _, partVals))

  /**
   * Last-writer-wins upsert: rows of `items` replace current rows sharing
   * the same `mergeKeys`; other rows of the touched partitions carry over.
   * ONE write of the merged partitions into a fresh generation directory,
   * then the manifest rename commits. Reads only the touched partitions'
   * current directories (the manifest IS the pruning index — untouched
   * partitions are never listed, let alone scanned).
   *
   * `tag` makes the upsert IDEMPOTENT under at-least-once replay (the
   * [[SketchLedger.append]] contract, generalized): a tag already in the
   * manifest — committed atomically WITH the merge it marks — skips the
   * write entirely and returns false. Stores whose upserts fold ADDITIVE
   * partials (the span window-count store) stamp each streaming batch's
   * fold with its batch id so a checkpoint-replayed micro-batch never
   * doubles counts. Returns true when the upsert was performed.
   */
  def upsert(
      items: DataFrame, path: String, partCol: String, mergeKeys: Seq[String],
      spark: SparkSession, tag: Option[String] = None): Boolean = {
    require(mergeKeys.contains(partCol), s"mergeKeys must include $partCol")
    tag.foreach(requireTagShape)
    val man = readManifest(spark, path)
    if (tag.exists(t => man.exists(_.tags.contains(t)))) return false
    val touched = items.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val existingTouched = man.flatMap { m =>
      currentFrame(spark, path, partCol, Some(touched.filter(m.entries.contains)))
    }
    val merged = existingTouched.fold(items) { ex =>
      ex.join(items.select(mergeKeys.map(col): _*).distinct(), mergeKeys, "left_anti")
        .select(items.columns.toIndexedSeq.map(col): _*)
        .unionByName(items)
    }
    val gen = nextGen(spark, path, man)
    val genId = newGenId(gen)
    merged
      .withColumn("gen", lit(genId))
      .repartition(col(partCol)) // one file per partition dir, not one per task
      .write.mode("append").partitionBy("gen", partCol)
      .parquet(s"$path/data")
    val entries = man.map(_.entries).getOrElse(Map.empty) ++ touched.map(_ -> genId)
    val tags = boundTags(man.map(_.tags).getOrElse(Seq.empty) ++ tag)
    commitManifest(spark, path, Manifest(gen, entries, tags))
    true
  }

  /**
   * Row-level DELETE: rows of the current table matching `keys` on
   * `mergeKeys` are removed — the takedown/right-to-be-forgotten path for
   * the partitioned table. Same shape and cost as [[upsert]]: only the
   * TOUCHED partitions (those named by `keys`' `partCol` values — the
   * manifest prunes everything else) are rewritten, minus the matching
   * rows, into one fresh generation, and the manifest commit flips
   * atomically. Removal is PHYSICAL immediately for the current snapshot
   * (unlike the serve-time-tombstone indexes, a partition-grain rewrite is
   * exactly what this store's upsert already pays); the deleted rows'
   * bytes persist only in superseded generations until [[vacuum]].
   * A partition whose every row is deleted drops out of the manifest
   * entirely. Deleting keys not in the table is a no-op. Returns the
   * number of partitions rewritten.
   */
  def delete(
      keys: DataFrame, path: String, partCol: String, mergeKeys: Seq[String],
      spark: SparkSession): Int = {
    require(mergeKeys.contains(partCol), s"mergeKeys must include $partCol")
    val man = readManifest(spark, path) match {
      case None => return 0
      case Some(m) => m
    }
    val touched = keys.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.filter(man.entries.contains)
    if (touched.isEmpty) return 0
    val existing = currentFrame(spark, path, partCol, Some(touched)) match {
      case None => return 0
      case Some(f) => f
    }
    val remaining = existing
      .join(keys.select(mergeKeys.map(col): _*).distinct(), mergeKeys, "left_anti")
      .localCheckpoint() // consumed twice: the write + the still-live scan
    val gen = nextGen(spark, path, Some(man))
    val genId = newGenId(gen)
    remaining
      .withColumn("gen", lit(genId))
      .repartition(col(partCol))
      .write.mode("append").partitionBy("gen", partCol)
      .parquet(s"$path/data")
    val stillLive = remaining.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val entries = (man.entries -- touched) ++
      touched.filter(stillLive.contains).map(_ -> genId)
    commitManifest(spark, path, Manifest(gen, entries, man.tags))
    touched.size
  }

  /**
   * Generation compaction — the small-files/long-listing answer for a table
   * that has absorbed many upserts. Each upsert leaves its touched
   * partitions in a fresh `gen=` directory, so after G upserts the live
   * table is spread across up to G generation directories: every
   * [[currentFrame]] read lists (and at 100 TB on an object store, pays a
   * round-trip per) each of them, and old generations can't be vacuumed
   * while any partition still lives there. Compaction rewrites the
   * partitions of the SMALLEST live generations (fewest live partitions
   * first — cheapest rewrite volume per directory eliminated) into one
   * fresh generation until at most `maxGens` remain, then commits via the
   * same never-reused-manifest-name rename as [[upsert]]. Crash-safe for
   * free: a crash mid-rewrite leaves an unreferenced `gen=` directory and
   * the previous manifest intact. Readers of the old manifest keep their
   * snapshot (their generations are immutable until [[vacuum]]).
   *
   * Partial by design: `maxGens` bounds rewrite volume — a nightly
   * `compact(maxGens = 4)` amortizes consolidation instead of rewriting
   * the whole table each time (full rewrite = `maxGens = 1`).
   *
   * `clusterBy` makes the consolidation rewrite ALSO a re-clustering pass
   * — the natural point for it, since upserted generations accumulate in
   * ingest order and erode the file-skipping a clustered initial write
   * bought ([[Scale.writeRangeClustered]]/[[Scale.writeZOrdered]]
   * semantics): one column range-clusters, two columns Z-order via the
   * same Morton-key kernel ([[Scale.withZOrderKey]]). Rows are
   * range-partitioned on (partCol, cluster key) and sorted within tasks,
   * so every rewritten file sits in one partition directory and covers a
   * narrow cluster-key range — parquet footer min/max then skips files
   * for selective reads, verified by ScaleSpec after an upsert storm +
   * compact. Commit protocol, crash-safety and snapshot behavior are
   * identical to the unclustered form (clustering changes bytes-on-disk
   * layout, never content or visibility).
   *
   * Returns the number of partitions rewritten (0 if already compact).
   */
  def compact(
      spark: SparkSession, path: String, partCol: String,
      maxGens: Int = 1, clusterBy: Seq[String] = Nil): Int = {
    require(maxGens >= 1, "maxGens must be at least 1")
    require(clusterBy.size <= 2,
      s"clusterBy supports 1 (range) or 2 (z-order) columns, got ${clusterBy.size}")
    val man = readManifest(spark, path) match {
      case None => return 0
      case Some(m) => m
    }
    val byGen = man.entries.groupBy(_._2) // gen -> (partition -> gen)
    if (byGen.size <= maxGens) return 0
    // Collapse the smallest generations; keep the (maxGens - 1) largest
    // as-is — the new consolidated generation is the maxGens-th. Ties
    // break on the newer (higher-numbered) generation staying put.
    val keep = byGen.toSeq
      .sortBy { case (g, parts) => (-parts.size, -genNumber(g), g) }
      .take(maxGens - 1).map(_._1).toSet
    val victims = man.entries.collect {
      case (p, g) if !keep.contains(g) => p
    }.toSeq.sorted
    val frame = currentFrame(spark, path, partCol, Some(victims)) match {
      case None => return 0
      case Some(f) => f
    }
    val gen = nextGen(spark, path, Some(man))
    val genId = newGenId(gen)
    val clustered = clusterBy match {
      case Nil =>
        frame.withColumn("gen", lit(genId)).repartition(col(partCol))
      case Seq(c) =>
        frame.withColumn("gen", lit(genId))
          .repartitionByRange(col(partCol), col(c))
          .sortWithinPartitions(col(partCol), col(c))
      case Seq(a, b) =>
        Scale.withZOrderKey(frame, a, b, "_zkey")
          .withColumn("gen", lit(genId))
          .repartitionByRange(col(partCol), col("_zkey"))
          .sortWithinPartitions(col(partCol), col("_zkey"))
          .drop("_zkey")
    }
    clustered
      .write.mode("append").partitionBy("gen", partCol)
      .parquet(s"$path/data")
    commitManifest(spark, path,
      Manifest(gen, man.entries ++ victims.map(_ -> genId), man.tags))
    victims.size
  }

  /** One-call table health report for the ops runbook: committed version,
    * retained manifest files, live partitions, the DISTINCT generations
    * they live in (the [[compact]] pressure number — reads pay a listing
    * per live generation), and debris directories no manifest references
    * (the [[vacuum]] reclaim number). Driver-side listings only — never
    * reads data files. */
  final case class TableStats(
      version: Long, nManifestFiles: Int, livePartitions: Int,
      liveGenerations: Int, debrisGenerations: Int)

  def stats(spark: SparkSession, path: String): Option[TableStats] =
    readManifest(spark, path).map { m =>
      val live = m.entries.values.toSet
      val hfs = fs(spark, path)
      val dataDir = new Path(s"$path/data")
      val onDisk =
        if (!hfs.exists(dataDir)) Set.empty[String]
        else hfs.listStatus(dataDir).map(_.getPath.getName)
          .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=")).toSet
      TableStats(
        version = m.version,
        nManifestFiles = listVersioned(spark, path, "_manifest").size,
        livePartitions = m.entries.size,
        liveGenerations = live.size,
        debrisGenerations = (onDisk -- live).size)
    }

  /** Drop generation directories no RETAINED manifest references
    * (superseded or crash debris), plus manifest files below the retention
    * horizon. `retainVersions` is the time-travel window: the newest N
    * committed manifests — and every generation any of them names — stay
    * readable; snapshots older than that are reclaimed. Safe any time
    * after readers of below-horizon manifests are done; space reclamation
    * only — correctness never depends on it. Vacuum IS a writer operation
    * under the single-writer contract: run concurrently with an in-flight
    * [[upsert]]/[[compact]] it would delete that writer's not-yet-committed
    * generation directory (unreferenced by any manifest until the commit
    * rename). Returns the number of generation directories deleted. */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the current manifest")
    val vs = versions(spark, path)
    if (vs.isEmpty) return 0
    val retained = vs.takeRight(retainVersions)
    val live = retained
      .flatMap(v => readManifestAt(spark, path, v))
      .flatMap(_.entries.values).toSet
    val hfs = fs(spark, path)
    val dataDir = new Path(s"$path/data")
    val dead =
      if (!hfs.exists(dataDir)) Array.empty[Path]
      else hfs.listStatus(dataDir).map(_.getPath)
        .filter(p => p.getName.startsWith("gen=") &&
          !live.contains(p.getName.stripPrefix("gen=")))
    dead.foreach(p => hfs.delete(p, true))
    val belowHorizon = vs.dropRight(retainVersions).toSet
    val manifestFiles = listVersioned(spark, path, "_manifest")
    val winners = manifestFiles.groupBy(_._1)
      .map { case (v, fs) => v -> fs.minBy(_._2)._3 }
    manifestFiles.foreach { case (v, _, name) =>
      // below-horizon versions go entirely; retained versions keep ONLY the
      // deterministic winner — crash debris from a read-repair loser (same
      // version, higher token) is resolution-irrelevant and reclaimed here
      if (belowHorizon.contains(v) || !winners.get(v).contains(name))
        hfs.delete(new Path(path, name), false)
    }
    dead.length
  }
}
