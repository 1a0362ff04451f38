package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
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
 *    on the manifest rename — rename-to-existing fails on HDFS/POSIX, so
 *    exactly one writer wins, the loser throws, and its token-unique
 *    debris (referenced by no manifest) is invisible and vacuumable. The
 *    winner's manifest cannot name a loser's files.
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
    * 9 writers mint `<V>-<token>` ids (both forms parse and read). */
  final case class Manifest(version: Long, entries: Map[String, String])

  private[ops] def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestName(v: Long): String = f"_manifest.$v%012d"

  // -----------------------------------------------------------------------
  // THE commit protocol — shared by this table store and the persisted ANN
  // index ([[Similarity.writeIndex]]/appendToIndex): versioned text files
  // `<prefix>.<zero-padded v>` written to a `.tmp` name and committed by
  // ONE atomic rename into a never-reused final name. Everything else
  // (data files, generation directories) is invisible debris until a
  // manifest names it.
  // -----------------------------------------------------------------------

  /** Highest committed `<prefix>.<v>` under `dir`: `(version, content)`. */
  private[ops] def readVersioned(
      spark: SparkSession, dir: String, prefix: String): Option[(Long, String)] = {
    val d = new Path(dir)
    val hfs = fs(spark, dir)
    if (!hfs.exists(d)) return None
    val names = hfs.listStatus(d)
      .map(_.getPath.getName)
      .filter(n => n.startsWith(prefix + ".") && !n.endsWith(".tmp"))
    if (names.isEmpty) return None
    val name = names.max // zero-padded → lexical max = numeric max
    val version = name.stripPrefix(prefix + ".").toLong
    val in = hfs.open(new Path(d, name))
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some((version, content))
  }

  /** Commit `content` as `<prefix>.<zero-padded version>` via tmp write +
    * atomic rename to the (never-reused) final name. */
  private[ops] def commitVersioned(
      spark: SparkSession, dir: String, prefix: String,
      version: Long, content: String): Unit = {
    val hfs = fs(spark, dir)
    val finalName = f"$prefix.$version%012d"
    val tmp = new Path(dir, finalName + ".tmp")
    val out = hfs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!hfs.rename(tmp, new Path(dir, finalName)))
      throw new java.io.IOException(
        s"commit rename failed for $finalName under $dir")
  }

  private def parseManifest(version: Long, content: String): Manifest = {
    val entries = content.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('\t')
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
    Manifest(version, entries)
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
    val d = new Path(path)
    val hfs = fs(spark, path)
    if (!hfs.exists(d)) return None
    val names = hfs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("_manifest.") && !n.endsWith(".tmp"))
      .filter(_.stripPrefix("_manifest.").toLong <= asOf)
    if (names.isEmpty) return None
    val name = names.max
    val in = hfs.open(new Path(d, name))
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some(parseManifest(name.stripPrefix("_manifest.").toLong, content))
  }

  /** All committed manifest versions under `path`, ascending — the store's
    * commit history (each version is an addressable snapshot until
    * [[vacuum]] reclaims what it references). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val d = new Path(path)
    val hfs = fs(spark, path)
    if (!hfs.exists(d)) return Seq.empty
    hfs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("_manifest.") && !n.endsWith(".tmp"))
      .map(_.stripPrefix("_manifest.").toLong).toSeq.sorted
  }

  /** Write a complete manifest to a temp name, then commit via atomic
    * rename to its (never-reused) final name. */
  private def commitManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val sb = new StringBuilder
    m.entries.toSeq.sortBy(_._1).foreach { case (k, g) =>
      sb.append(k).append('\t').append(g).append('\n')
    }
    commitVersioned(spark, path, "_manifest", m.version, sb.toString)
  }

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
   */
  def upsert(
      items: DataFrame, path: String, partCol: String, mergeKeys: Seq[String],
      spark: SparkSession): Unit = {
    require(mergeKeys.contains(partCol), s"mergeKeys must include $partCol")
    val man = readManifest(spark, path)
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
    commitManifest(spark, path, Manifest(gen, entries))
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
   * Returns the number of partitions rewritten (0 if already compact).
   */
  def compact(
      spark: SparkSession, path: String, partCol: String,
      maxGens: Int = 1): Int = {
    require(maxGens >= 1, "maxGens must be at least 1")
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
    frame
      .withColumn("gen", lit(genId))
      .repartition(col(partCol))
      .write.mode("append").partitionBy("gen", partCol)
      .parquet(s"$path/data")
    commitManifest(spark, path,
      Manifest(gen, man.entries ++ victims.map(_ -> genId)))
    victims.size
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
    vs.dropRight(retainVersions).foreach(v =>
      hfs.delete(new Path(path, manifestName(v)), false))
    dead.length
  }
}
