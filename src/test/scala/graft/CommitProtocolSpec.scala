package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.ManifestStore
import graft.ops.ManifestStore.CommitProtocol

/**
 * S3-shaped store simulation: `rename` onto an existing destination silently
 * REPLACES it (S3 rename = copy+delete; vanilla Hadoop LocalFileSystem does
 * the same), and the scheme has no `AbstractFileSystem` binding, so
 * `FileContext` — the AtomicRename protocol's enforcing API — is
 * unavailable. Exactly the environment where round 9's
 * rename-fails-if-exists assumption breaks.
 */
class OverwritingRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "owfs"
  override def getUri: java.net.URI = java.net.URI.create("owfs:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}

/**
 * The pluggable commit primitive ([[ManifestStore.CommitProtocol]]) against
 * a store where rename-to-existing silently succeeds — the S3/vanilla-
 * LocalFileSystem hazard the round-9 race guarantee implicitly assumed away.
 */
class CommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def owfsDir(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.owfs.impl", classOf[OverwritingRenameFs].getName)
    "owfs://" + tmpDir(prefix)
  }

  private def write(dir: String, name: String, content: String): Unit = {
    val hfs = ManifestStore.fs(spark, dir)
    val out = hfs.create(new Path(dir, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("the simulated store really overwrites on rename — the hazard is live") {
    val dir = owfsDir("owfs_hazard")
    val hfs = ManifestStore.fs(spark, dir)
    write(dir, "a", "A")
    write(dir, "b", "B")
    assert(hfs.rename(new Path(dir, "a"), new Path(dir, "b")),
      "owfs rename onto an existing destination must report success")
    val in = hfs.open(new Path(dir, "b"))
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "A", "destination must have been silently replaced")
  }

  test("AtomicRename on a local (FileContext-served) store: second same-version commit throws, first survives") {
    val dir = tmpDir("cp_rename")
    ManifestStore.commitVersioned(spark, dir, "_index", 1, "winner",
      CommitProtocol.AtomicRename)
    val e = intercept[java.io.IOException] {
      ManifestStore.commitVersioned(spark, dir, "_index", 1, "loser",
        CommitProtocol.AtomicRename)
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    assert(ManifestStore.readVersioned(spark, dir, "_index").contains((1L, "winner")))
    // the loser's tmp must not linger as pseudo-debris
    val leftover = ManifestStore.fs(spark, dir)
      .listStatus(new Path(dir)).map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftover.isEmpty, s"loser tmp debris: ${leftover.mkString(",")}")
  }

  test("AtomicRename fallback on a non-FileContext overwriting store still refuses the second commit") {
    val dir = owfsDir("cp_rename_owfs")
    ManifestStore.commitVersioned(spark, dir, "_index", 1, "winner",
      CommitProtocol.AtomicRename)
    intercept[java.io.IOException] {
      ManifestStore.commitVersioned(spark, dir, "_index", 1, "loser",
        CommitProtocol.AtomicRename)
    }
    assert(ManifestStore.readVersioned(spark, dir, "_index").contains((1L, "winner")))
  }

  test("VersionedReadRepair: racing loser self-aborts, winner's acknowledged commit is durable") {
    val dir = owfsDir("cp_rr")
    // writer A commits version 2 and is acknowledged
    ManifestStore.commitVersioned(spark, dir, "_manifest", 2, "p1\tgA\n",
      CommitProtocol.VersionedReadRepair)
    // writer B raced (same computed version): its rename lands on a
    // writer-unique name, its visibility check sees A, it aborts
    val e = intercept[java.io.IOException] {
      ManifestStore.commitVersioned(spark, dir, "_manifest", 2, "p1\tgB\n",
        CommitProtocol.VersionedReadRepair)
    }
    assert(e.getMessage.contains("lost the version-2 commit race"), e.getMessage)
    // reads resolve A — and B deleted its own file, so no duplicate remains
    assert(ManifestStore.readVersioned(spark, dir, "_manifest")
      .contains((2L, "p1\tgA\n")))
    assert(ManifestStore.listVersioned(spark, dir, "_manifest").size == 1)
  }

  test("VersionedReadRepair: crashed-loser debris resolves deterministically; vacuum reclaims it") {
    val dir = owfsDir("cp_rr_crash")
    // two same-version files — a writer crashed between rename and its
    // visibility check, so no self-abort happened; min-token wins reads
    write(dir, "_manifest.000000000003.aaaa1111", "p1\tgA\n")
    write(dir, "_manifest.000000000003.bbbb2222", "p1\tgB\n")
    assert(ManifestStore.readVersioned(spark, dir, "_manifest")
      .contains((3L, "p1\tgA\n")), "winner must be the lexically smallest token")
    assert(ManifestStore.versions(spark, dir) == Seq(3L),
      "duplicate files are ONE version, not two")
    // vacuum keeps only the deterministic winner file for retained versions
    ManifestStore.vacuum(spark, dir, retainVersions = 1)
    val left = ManifestStore.listVersioned(spark, dir, "_manifest").map(_._3)
    assert(left == Seq("_manifest.000000000003.aaaa1111"), left.toString)
    assert(ManifestStore.readVersioned(spark, dir, "_manifest")
      .contains((3L, "p1\tgA\n")), "resolution unchanged by vacuum")
  }

  test("end-to-end upsert race on the overwriting store under read-repair: winner readable, loser debris vacuumable") {
    val dir = owfsDir("cp_rr_upsert")
    spark.conf.set("spark.graft.commit.protocol", "read-repair")
    try {
      def batch(tag: String) =
        spark.range(3).select(
          lit("p1").as("k"), concat(lit(tag + "_"), $"id").as("id"), $"id".as("v"))
      ManifestStore.upsert(batch("seed"), dir, "k", Seq("k", "id"), spark)   // v1
      ManifestStore.upsert(batch("winner"), dir, "k", Seq("k", "id"), spark) // v2
      // loser read the v1 manifest before the winner committed: its data
      // write lands in a token-unique generation, its manifest commit for
      // the already-taken version 2 must abort
      val loserGen = "2-deadbeef"
      batch("loser").withColumn("gen", lit(loserGen)).repartition($"k")
        .write.mode("append").partitionBy("gen", "k").parquet(s"$dir/data")
      intercept[java.io.IOException] {
        ManifestStore.commitVersioned(spark, dir, "_manifest", 2,
          s"p1\t$loserGen\n", CommitProtocol.VersionedReadRepair)
      }
      val ids = ManifestStore.currentFrame(spark, dir, "k").get
        .select($"id").as[String].collect().toSet
      assert(ids == (0 until 3).flatMap(i => Seq(s"seed_$i", s"winner_$i")).toSet,
        s"loser rows leaked into reads: $ids")
      assert(ManifestStore.vacuum(spark, dir) >= 1)
      assert(!ManifestStore.fs(spark, dir)
        .exists(new Path(s"$dir/data/gen=$loserGen")), "loser generation survived vacuum")
    } finally spark.conf.set("spark.graft.commit.protocol", "rename")
  }

  /** Conditional-put double: the create-iff-absent DECISION is atomic
    * (ConcurrentHashMap claim — the semantics a real S3 `If-None-Match: *`
    * provides in the store), then the bytes land so readers resolve them.
    * Runs on the OVERWRITING store, where neither rename tier's primitive
    * exists — exactly the deployment the SPI is for. */
  private object InMemoryConditionalPut extends ManifestStore.CommitStore {
    val claimed: java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    override def putIfAbsent(
        s: org.apache.spark.sql.SparkSession, dir: String, name: String,
        content: Array[Byte]): Boolean = {
      if (!claimed.add(s"$dir/$name")) return false
      val hfs = ManifestStore.fs(s, dir)
      val out = hfs.create(new Path(dir, name), true)
      try out.write(content) finally out.close()
      true
    }
  }

  test("ConditionalPut: one atomic call commits; the loser is refused with nothing written — no crash window") {
    val dir = owfsDir("cp_cput")
    val proto = CommitProtocol.ConditionalPut(InMemoryConditionalPut)
    ManifestStore.commitVersioned(spark, dir, "_manifest", 1, "p1\tgA\n", proto)
    val e = intercept[java.io.IOException] {
      ManifestStore.commitVersioned(spark, dir, "_manifest", 1, "p1\tgB\n", proto)
    }
    assert(e.getMessage.contains("conditional-put commit refused"), e.getMessage)
    assert(ManifestStore.readVersioned(spark, dir, "_manifest")
      .contains((1L, "p1\tgA\n")))
    // exactly ONE file per version, no tmp debris, no duplicate to resolve
    val files = ManifestStore.fs(spark, dir)
      .listStatus(new Path(dir)).map(_.getPath.getName).toSeq
    assert(files == Seq("_manifest.000000000001"), files.toString)
    // the crash matrix is a two-state machine here: BEFORE the put nothing
    // is visible and the version is free (a retry simply takes it); AFTER
    // the put the commit is complete. There is no intermediate state, so
    // the read-repair tier's crashed-loser-shadows-winner hazard (covered
    // above) cannot be constructed for this tier — that is the point.
  }

  test("end-to-end upsert race under conditional-put on the overwriting store: loser aborts, winner durable") {
    val dir = owfsDir("cp_cput_upsert")
    ManifestStore.registerCommitStore(InMemoryConditionalPut)
    spark.conf.set("spark.graft.commit.protocol", "conditional-put")
    try {
      def batch(tag: String) =
        spark.range(3).select(
          lit("p1").as("k"), concat(lit(tag + "_"), $"id").as("id"), $"id".as("v"))
      ManifestStore.upsert(batch("seed"), dir, "k", Seq("k", "id"), spark)   // v1
      ManifestStore.upsert(batch("winner"), dir, "k", Seq("k", "id"), spark) // v2
      // a loser that computed version 2 from the stale v1 manifest: its
      // data write lands token-unique, its commit is refused atomically
      val loserGen = "2-deadbeef"
      batch("loser").withColumn("gen", lit(loserGen)).repartition($"k")
        .write.mode("append").partitionBy("gen", "k").parquet(s"$dir/data")
      intercept[java.io.IOException] {
        ManifestStore.commitVersioned(spark, dir, "_manifest", 2, s"p1\t$loserGen\n")
      }
      val ids = ManifestStore.currentFrame(spark, dir, "k").get
        .select($"id").as[String].collect().toSet
      assert(ids == (0 until 3).flatMap(i => Seq(s"seed_$i", s"winner_$i")).toSet,
        s"loser rows leaked into reads: $ids")
      assert(ManifestStore.vacuum(spark, dir) >= 1)
      assert(!ManifestStore.fs(spark, dir)
        .exists(new Path(s"$dir/data/gen=$loserGen")), "loser generation survived vacuum")
    } finally {
      spark.conf.set("spark.graft.commit.protocol", "rename")
      ManifestStore.clearCommitStore()
    }
  }

  test("HadoopCreateExclusive default store: second putIfAbsent refused, content intact") {
    val dir = tmpDir("cp_hce")
    val st = ManifestStore.CommitStore.HadoopCreateExclusive
    assert(st.putIfAbsent(spark, dir, "_m.1", "A".getBytes("UTF-8")))
    assert(!st.putIfAbsent(spark, dir, "_m.1", "B".getBytes("UTF-8")))
    val in = ManifestStore.fs(spark, dir).open(new Path(dir, "_m.1"))
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "A")
  }

  test("FileContext on file:// refuses rename onto an existing destination (the primitive AtomicRename rests on)") {
    // the FileSystem-API rename on vanilla LocalFileSystem would silently
    // replace; FileContext without Options.Rename.OVERWRITE must throw —
    // independent of which FileSystem implementation services file://
    val dir = tmpDir("cp_fc")
    write(dir, "a", "A")
    write(dir, "b", "B")
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = ManifestStore.fs(spark, dir)
    val src = hfs.makeQualified(new Path(dir, "a"))
    val dst = hfs.makeQualified(new Path(dir, "b"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
    intercept[java.io.IOException] { fc.rename(src, dst) }
    val in = hfs.open(dst)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "B", "existing destination must be untouched")
  }
}
