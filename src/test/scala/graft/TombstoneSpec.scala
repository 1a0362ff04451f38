package graft

import org.apache.spark.sql.functions._

import graft.ops.{ManifestStore, Retrieval, Similarity}

/**
 * Tombstone deletes across the three persisted stores — the takedown /
 * right-to-be-forgotten path (round-11 verdict item): a delete commits
 * under the same CAS'd manifest protocol, serving hides the rows
 * immediately without a rebuild, and the physical purge removes every
 * byte. The strong laws are REBUILD PARITY (post-delete serving equals a
 * fresh build over the corpus minus the deleted rows — for BM25 that
 * means df/N/avgdl adjust, not just the retrievable set) and PURGE
 * INVARIANCE (serving identical before and after physical removal).
 */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  // ---- ANN index ---------------------------------------------------------

  private def embs = (0 until 48).map { i =>
    (i.toLong, Array.tabulate(8)(d => math.cos(d * 0.7 + (i % 7)).toFloat))
  }.toDF("vec_id", "embedding")

  private def vqueries = embs.where($"vec_id" < 3)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))

  private def akey(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "rank", "vec_id", "adc")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("ANN delete: served results equal a rebuild without the ids; purge retires tombstones physically") {
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)
    val dir = tmpDir("ann_del")
    Similarity.writeIndex(embs, coarse, cb, dir, dims = 8, m = 2)

    // delete ids that ARE in the pre-delete top-k, so the law has teeth
    val pre = Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)
    val victimIds = pre.select("vec_id").where($"vec_id" >= 3)
      .limit(2).as[Long].collect().toSeq
    assert(victimIds.nonEmpty)
    Similarity.deleteFromIndex(victimIds.toDF("vec_id"), dir)

    // deleted docs absent from BOTH serving paths
    val idx = Similarity.readIndex(spark, dir)
    val adc = Similarity.ivfPqTopKIndexed(idx, vqueries, 3, nprobe = 2)
    val rr = Similarity.ivfPqTopKIndexedRerank(idx, vqueries, 3, nprobe = 2, shortlist = 16)
    assert(adc.where($"vec_id".isin(victimIds: _*)).isEmpty, "deleted id served (ADC)")
    assert(rr.where($"vec_id".isin(victimIds: _*)).isEmpty, "deleted id served (rerank)")

    // REBUILD PARITY: identical to an index built without the ids (same
    // quantizers — codes are per-row pure functions, so bit-exact)
    val dirRef = tmpDir("ann_del_ref")
    Similarity.writeIndex(
      embs.where(!$"vec_id".isin(victimIds: _*)), coarse, cb, dirRef, dims = 8, m = 2)
    assert(akey(adc) == akey(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirRef), vqueries, 3, nprobe = 2)),
      "post-delete serving diverged from the rebuild")

    // deleting an unknown / already-deleted id is harmless
    Similarity.deleteFromIndex(Seq(victimIds.head, 99999L).toDF("vec_id"), dir)
    assert(akey(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)) == akey(adc))

    // append AFTER a delete preserves the tombstones
    Similarity.appendToIndex(
      embs.where($"vec_id" === 5L).select(($"vec_id" + 500L).as("vec_id"), $"embedding"), dir)
    val afterApp = Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)
    assert(afterApp.where($"vec_id".isin(victimIds: _*)).isEmpty,
      "append dropped the tombstones")

    // compaction keeps serving identical while physically dropping
    // tombstoned rows from whatever it rewrites
    val preCompact = akey(afterApp)
    if (Similarity.compactIndex(spark, dir, maxGens = 2) > 0)
      assert(akey(Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)) == preCompact)

    // the ops report surfaces the tombstone debt
    val stats = Similarity.indexStats(spark, dir).get
    assert(stats.tombstoneGenerations == 2 && stats.tombstonedIds == victimIds.size + 1,
      stats.toString)

    // PURGE: physical drop + tombstone retirement; serving unchanged
    val retired = Similarity.purgeIndexTombstones(spark, dir)
    assert(retired == victimIds.size + 1, s"retired $retired tombstones") // +1 = 99999
    assert(akey(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)) == preCompact,
      "purge changed serving")
    Similarity.vacuumIndex(spark, dir)
    // raw post-purge artifacts carry NO tombstoned vec_id anywhere
    val manifest = ManifestStore.readVersioned(spark, dir, "_index").get._2
    assert(!manifest.contains("dels\t"), "purged manifest still lists tombstones")
    val liveGens = manifest.linesIterator
      .collect { case l if l.startsWith("codes\t") => l.stripPrefix("codes\t") }.toSeq
    liveGens.foreach { g =>
      val raw = spark.read.option("basePath", s"$dir/gen=$g/codes")
        .parquet(s"$dir/gen=$g/codes")
      assert(raw.where($"vec_id".isin(victimIds: _*)).isEmpty,
        s"gen $g still holds deleted codes")
    }
    // a second purge is a no-op; the report shows the debt collected
    assert(Similarity.purgeIndexTombstones(spark, dir) == 0L)
    val statsAfter = Similarity.indexStats(spark, dir).get
    assert(statsAfter.tombstoneGenerations == 0 && statsAfter.tombstonedIds == 0L,
      statsAfter.toString)
  }

  // ---- lexical index -----------------------------------------------------

  private def docsA = Seq(
    (1L, "spark joins fast"), (2L, "hash table scan"),
    (3L, "spark spark window"), (4L, "window sort merge"),
    (5L, "spark hash join"), (6L, "")).toDF("doc_id", "text")

  private def tqueries = Seq((0L, "spark window"), (1L, "hash")).toDF("qid", "qtext")

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("qid", "rank").collect().toSeq.map(_.toSeq)

  test("rebuildIndex: self-healing retrain from the index's own vectors equals a fresh build over the remaining corpus") {
    val half = embs.where($"vec_id" < 24)
    val coarse = Similarity.trainCentroids(half, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(half, coarse, dims = 8, m = 2, k = 3, iters = 2)
    val dir = tmpDir("ann_rebuild")
    // stale-quantizer scenario: trained on the first half only, second
    // half appended against the frozen quantizers, then a takedown lands
    Similarity.writeIndex(half, coarse, cb, dir, dims = 8, m = 2)
    Similarity.appendToIndex(embs.where($"vec_id" >= 24), dir)
    Similarity.deleteFromIndex(Seq(5L, 30L).toDF("vec_id"), dir)
    // retrain in place with FRESH quantizers at a different coarse k
    Similarity.rebuildIndex(spark, dir, coarseK = 6, pqK = 4, iters = 2)
    def served(d: String) = Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, d), vqueries, 3, nprobe = 2, shortlist = 16)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = served(dir)
    // law: deterministic training → identical serving to a fresh
    // buildIndex over the remaining corpus
    val ref = tmpDir("ann_rebuild_ref")
    Similarity.buildIndex(embs.where(!$"vec_id".isin(5L, 30L)), ref,
      dims = 8, m = 2, coarseK = 6, pqK = 4, iters = 2)
    assert(got == served(ref), s"rebuild diverged from fresh build")
    // the rebuild collapsed generations and retired accumulated tombstones
    val st = Similarity.indexStats(spark, dir).get
    assert(st.tombstonedIds == 0 && st.tombstoneGenerations == 0, st.toString)
    assert(st.codeGenerations == 1, st.toString)
    // deleted ids stay gone through the retrain
    assert(!got.exists { case (_, _, v) => v == 5L || v == 30L })
  }

  test("lex delete: BM25 scores equal a rebuild without the docs (df/N/avgdl adjust); purge physical") {
    val dir = tmpDir("lex_del")
    Retrieval.writeLexIndex(docsA, dir)

    // delete doc 3 (a top hit for 'spark window') AND the zero-token doc 6
    // — the empty doc contributes (1, 0) to (n_docs, total_tokens), which
    // only the doclens artifact can account for
    Retrieval.deleteFromLexIndex(Seq(3L, 6L).toDF("doc_id"), dir)
    val served = ranked(Retrieval.bm25TopKIndexed(
      Retrieval.readLexIndex(spark, dir), tqueries, k = 5))
    assert(!served.exists(r => r(2) == 3L || r(2) == 6L), "deleted doc retrieved")

    // REBUILD PARITY including the stats: scores bit-equal a fresh build
    // over the corpus minus the deleted docs
    val ref = ranked(Retrieval.bm25(
      docsA.where(!$"doc_id".isin(3L, 6L)), "doc_id", "text", tqueries, k = 5))
    assert(served == ref, s"post-delete BM25 diverged from rebuild:\n$served\nvs\n$ref")

    // idempotent: re-delete + unknown id change nothing
    Retrieval.deleteFromLexIndex(Seq(3L, 777L).toDF("doc_id"), dir)
    assert(ranked(Retrieval.bm25TopKIndexed(
      Retrieval.readLexIndex(spark, dir), tqueries, k = 5)) == served)

    // append after delete: tombstones keep applying, new docs serve
    Retrieval.appendToLexIndex(Seq((10L, "window spark")).toDF("doc_id", "text"), dir)
    val served2 = ranked(Retrieval.bm25TopKIndexed(
      Retrieval.readLexIndex(spark, dir), tqueries, k = 6))
    val ref2 = ranked(Retrieval.bm25(
      docsA.where(!$"doc_id".isin(3L, 6L))
        .unionByName(Seq((10L, "window spark")).toDF("doc_id", "text")),
      "doc_id", "text", tqueries, k = 6))
    assert(served2 == ref2, "append-after-delete diverged from rebuild")

    // the ops report surfaces the tombstone debt
    val lstats = Retrieval.lexIndexStats(spark, dir).get
    assert(lstats.tombstoneGenerations == 2 && lstats.tombstonedIds == 3L, lstats.toString)

    // PURGE: serving unchanged, del lines gone, postings physically clean
    val retired = Retrieval.purgeLexTombstones(spark, dir)
    assert(retired == 3L, s"retired $retired") // 3, 6, 777
    assert(ranked(Retrieval.bm25TopKIndexed(
      Retrieval.readLexIndex(spark, dir), tqueries, k = 6)) == served2)
    val manifest = ManifestStore.readVersioned(spark, dir, "_lex").get._2
    assert(!manifest.contains("del\t"), "purged manifest still lists tombstones")
    Retrieval.vacuumLexIndex(spark, dir)
    val seg = manifest.linesIterator
      .collect { case l if l.startsWith("seg\t") => l.stripPrefix("seg\t") }.toSeq
    seg.foreach { g =>
      assert(spark.read.parquet(s"$dir/gen=$g/postings")
        .where($"doc_id".isin(3L, 6L)).isEmpty, s"gen $g still holds deleted postings")
    }
    assert(Retrieval.purgeLexTombstones(spark, dir) == 0L)
    val lstatsAfter = Retrieval.lexIndexStats(spark, dir).get
    assert(lstatsAfter.tombstoneGenerations == 0 && lstatsAfter.tombstonedIds == 0L)
  }

  // ---- time travel ---------------------------------------------------------

  test("index time travel: a pre-delete snapshot still serves the deleted doc; versions addressable until vacuum") {
    // ANN: build (v1) -> append (v2) -> delete (v3); v2 must still serve
    // the id v3 tombstoned — the pinned-experiment reproducibility contract
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)
    val dir = tmpDir("ann_tt")
    Similarity.writeIndex(embs.where($"vec_id" < 24), coarse, cb, dir, dims = 8, m = 2)
    Similarity.appendToIndex(embs.where($"vec_id" >= 24), dir)
    val victim = Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)
      .where($"vec_id" >= 3).select("vec_id").as[Long].head()
    Similarity.deleteFromIndex(Seq(victim).toDF("vec_id"), dir)
    assert(Similarity.indexVersions(spark, dir) == Seq(1L, 2L, 3L))
    val atV2 = Similarity.ivfPqTopKIndexed(
      Similarity.readIndexAt(spark, dir, 2L), vqueries, 3, nprobe = 2)
    assert(!atV2.where($"vec_id" === victim).isEmpty,
      "pre-delete snapshot lost the later-deleted doc")
    assert(Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, dir), vqueries, 3, nprobe = 2)
      .where($"vec_id" === victim).isEmpty, "current snapshot still serves the deleted doc")
    // v1 (pre-append) serves only the first half's candidates
    assert(Similarity.ivfPqTopKIndexed(
        Similarity.readIndexAt(spark, dir, 1L), vqueries, 3, nprobe = 2)
      .where($"vec_id" >= 24).isEmpty, "v1 snapshot sees appended vectors")

    // lex: same contract
    val ldir = tmpDir("lex_tt")
    Retrieval.writeLexIndex(docsA, ldir)
    Retrieval.deleteFromLexIndex(Seq(3L).toDF("doc_id"), ldir)
    assert(Retrieval.lexIndexVersions(spark, ldir) == Seq(1L, 2L))
    val served1 = Retrieval.bm25TopKIndexed(
      Retrieval.readLexIndexAt(spark, ldir, 1L), tqueries, k = 5)
    assert(!served1.where($"doc_id" === 3L).isEmpty,
      "pre-delete lex snapshot lost the deleted doc")
    assert(Retrieval.bm25TopKIndexed(
        Retrieval.readLexIndex(spark, ldir), tqueries, k = 5)
      .where($"doc_id" === 3L).isEmpty)
  }

  // ---- manifest table ----------------------------------------------------

  test("ManifestStore.delete: partition-pruned row deletes; emptied partitions leave the manifest") {
    val dir = tmpDir("ms_del")
    val rows = Seq(
      ("202501", "u1", 10.0), ("202501", "u2", 20.0),
      ("202502", "u1", 30.0), ("202503", "u3", 40.0))
      .toDF("ym", "user", "amt")
    ManifestStore.upsert(rows, dir, "ym", Seq("ym", "user"), spark)

    // row-level delete in one partition; other rows of it survive
    val n = ManifestStore.delete(
      Seq(("202501", "u2")).toDF("ym", "user"), dir, "ym", Seq("ym", "user"), spark)
    assert(n == 1)
    val cur = ManifestStore.currentFrame(spark, dir, "ym").get
      .select("ym", "user").as[(String, String)].collect().toSet
    assert(cur == Set(("202501", "u1"), ("202502", "u1"), ("202503", "u3")))

    // deleting every row of a partition drops it from the manifest
    ManifestStore.delete(
      Seq(("202503", "u3")).toDF("ym", "user"), dir, "ym", Seq("ym", "user"), spark)
    val man = ManifestStore.readManifest(spark, dir).get
    assert(!man.entries.contains("202503"), "emptied partition still in manifest")
    assert(ManifestStore.currentFrame(spark, dir, "ym").get.count() == 2)

    // unknown keys are a no-op (no new generation committed)
    val verBefore = ManifestStore.readManifest(spark, dir).get.version
    assert(ManifestStore.delete(
      Seq(("209912", "zz")).toDF("ym", "user"), dir, "ym", Seq("ym", "user"), spark) == 0)
    assert(ManifestStore.readManifest(spark, dir).get.version == verBefore)

    // untouched partitions were never rewritten (their generation is unchanged)
    val genOf202502 = man.entries("202502")
    assert(ManifestStore.readManifest(spark, dir).get.entries("202502") == genOf202502)
  }
}
