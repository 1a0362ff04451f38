package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, MinhashIndex}

/**
 * The persisted incremental MinHash-LSH index (round-12 verdict item 1):
 * appends sign + band only the batch, serving equals one-shot candidate
 * generation over the accumulated corpus, and the store follows the
 * TombstoneSpec discipline — delete hides + adjusts occupancy exactly,
 * compact retires tombstones physically with identical serving.
 */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // 30 docs in near-dup groups of 3: a long shared prefix per group, one
  // trailing token varied per member — high-Jaccard triples the banding
  // must catch, plus enough shared vocabulary for occasional random
  // collisions (which parity must reproduce too, whatever they are)
  private def corpus: DataFrame = (0 until 30).map { i =>
    val g = i / 3
    val shared = (0 until 12).map(k => s"w${(g * 7 + k * 3) % 19}").mkString(" ")
    (i.toLong, s"$shared tail${i % 3} end$g")
  }.toDF("doc_id", "text")

  private def oneShot(df: DataFrame, cap: Int = Int.MaxValue): Set[(Long, Long)] =
    pairSet(Dedup.candidatePairs(
      Dedup.lshBands(
        Dedup.minhashSignaturesNative(df, "doc_id", "text", 16, 3), 16, 8), cap))

  private def pairSet(pairs: DataFrame): Set[(Long, Long)] =
    pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("append signs only the batch; indexed serving == one-shot over the union; " +
    "returned delta-pairs are exactly the new ones") {
    val a = corpus.where($"doc_id" % 2 === 0)
    val b = corpus.where($"doc_id" % 2 === 1)
    val dir = tmpDir("mh_inc")
    MinhashIndex.writeMinhashIndex(a, dir)
    assert(MinhashIndex.minhashIndexCommitted(dir))

    val newPairs = pairSet(MinhashIndex.appendToMinhashIndex(b, dir))
    val union = oneShot(corpus)
    val aOnly = oneShot(a)
    assert(newPairs == union -- aOnly,
      s"append must return exactly the pairs the batch introduces:\n" +
        s"got ${newPairs.toSeq.sorted}\nwant ${(union -- aOnly).toSeq.sorted}")
    assert(union.nonEmpty && newPairs.nonEmpty, "vacuous corpus — no collisions")

    // the serving read equals one-shot over the union, capped or not
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == union)
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir, maxOccupancy = 4)) ==
      oneShot(corpus, cap = 4), "cap must re-apply over the accumulated corpus")

    val st = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(st.segments == 2 && st.tombstoneGenerations == 0 && st.tombstonedIds == 0L)
    assert(st.meta == MinhashIndex.MhMeta(16, 8, 3))
  }

  test("incremental VERIFIED feed: per-batch verified pairs union to one-shot " +
    "nearDuplicates over the final corpus — history is never re-verified") {
    val batches = Seq(
      corpus.where($"doc_id" < 10),
      corpus.where($"doc_id" >= 10 && $"doc_id" < 20),
      corpus.where($"doc_id" >= 20))
    val dir = tmpDir("mh_feed")
    MinhashIndex.writeMinhashIndex(batches.head, dir)
    // batch 1's own pairs come from the serving read over the bootstrap
    var acc = batches.head
    val feed0 = pairSet(MinhashIndex.nearDuplicatesIndexed(
      acc, dir, threshold = 0.35, maxOccupancy = 64))
    val feeds = feed0 +: batches.tail.map { b =>
      acc = acc.unionByName(b) // the ingest table after its upsert
      pairSet(MinhashIndex.nearDuplicatesForBatch(
        b, acc, dir, threshold = 0.35, maxOccupancy = 64))
    }
    val oneShotAll = pairSet(Dedup.nearDuplicates(
      corpus, "doc_id", "text", numHashes = 16, bands = 8, shingle = 3,
      threshold = 0.35, nativeSignatures = true, maxOccupancy = 64))
    assert(feeds.reduce(_ ++ _) == oneShotAll,
      s"verified feeds != one-shot: ${feeds.map(_.size)} vs ${oneShotAll.size}")
    assert(feeds.map(_.size).sum == oneShotAll.size,
      "per-batch verified feeds overlapped — history was re-verified")
    assert(oneShotAll.nonEmpty)
  }

  test("time travel: the index as of each committed version serves that snapshot's pairs") {
    val dir = tmpDir("mh_tt")
    val a = corpus.where($"doc_id" < 15)
    MinhashIndex.writeMinhashIndex(a, dir)
    MinhashIndex.appendToMinhashIndex(corpus.where($"doc_id" >= 15), dir)
    MinhashIndex.deleteFromMinhashIndex(Seq(0L).toDF("doc_id"), dir)
    val versions = MinhashIndex.minhashIndexVersions(spark, dir)
    assert(versions.size == 3 && versions == versions.sorted)
    assert(pairSet(MinhashIndex.candidatePairsIndexedAt(spark, dir, versions.head)) ==
      oneShot(a), "version-1 snapshot must be the bootstrap corpus")
    assert(pairSet(MinhashIndex.candidatePairsIndexedAt(spark, dir, versions(1))) ==
      oneShot(corpus), "version-2 snapshot must be the appended union")
    assert(pairSet(MinhashIndex.candidatePairsIndexedAt(spark, dir, versions.last)) ==
      oneShot(corpus.where($"doc_id" =!= 0L)), "latest must reflect the delete")
    assert(pairSet(MinhashIndex.candidatePairsIndexedAt(spark, dir, versions.last)) ==
      pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)))
  }

  test("empty append is a no-op: empty pair frame, no new commit") {
    val dir = tmpDir("mh_empty")
    MinhashIndex.writeMinhashIndex(corpus, dir)
    val verBefore = MinhashIndex.minhashIndexStats(spark, dir).get.version
    val out = MinhashIndex.appendToMinhashIndex(corpus.limit(0), dir)
    assert(out.isEmpty)
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.version == verBefore)
  }

  test("append to an uncommitted dir fails loud") {
    val ex = intercept[IllegalStateException] {
      MinhashIndex.appendToMinhashIndex(corpus, tmpDir("mh_none"))
    }
    assert(ex.getMessage.contains("no committed minhash index"))
  }

  test("delete: serving equals one-shot over the corpus minus the ids; " +
    "later appends never pair against deleted docs and cap math stays exact") {
    val a = corpus.where($"doc_id" < 20)
    val dir = tmpDir("mh_del")
    MinhashIndex.writeMinhashIndex(a, dir)
    // delete one member of a near-dup triple so the law has teeth
    val victims = Seq(0L, 3L)
    MinhashIndex.deleteFromMinhashIndex(victims.toDF("doc_id"), dir)
    val survivors = a.where(!$"doc_id".isin(victims: _*))
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == oneShot(survivors),
      "post-delete serving must equal one-shot over the remaining corpus")

    // a later append joins only live docs, and its occupancy totals see the
    // negative partials: parity against one-shot over survivors + batch
    val b = corpus.where($"doc_id" >= 20)
    val newPairs = pairSet(MinhashIndex.appendToMinhashIndex(b, dir))
    val after = survivors.unionByName(b)
    assert(newPairs == oneShot(after) -- oneShot(survivors))
    assert(!newPairs.exists(p => victims.contains(p._1) || victims.contains(p._2)),
      "a deleted doc resurfaced in append pairs")
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == oneShot(after))

    // idempotent re-delete: no change to serving, debt counted once per id
    MinhashIndex.deleteFromMinhashIndex(victims.toDF("doc_id"), dir)
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == oneShot(after))
  }

  private def verifiedSet(pairs: DataFrame): Set[(Long, Long, Double)] =
    pairs.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def oneShotVerified(df: DataFrame, threshold: Double): Set[(Long, Long, Double)] =
    verifiedSet(Dedup.nearDuplicates(
      df, "doc_id", "text", numHashes = 16, bands = 8, shingle = 3,
      threshold = threshold, nativeSignatures = true, maxOccupancy = 64))

  /** Same ids, text mutilated — fresh verification over THIS corpus would
    * disagree with the real one, so a serve that still returns the true
    * verdicts provably read the store instead of re-shingling. */
  private def corrupted: DataFrame =
    corpus.select($"doc_id", concat(lit("x y z q"), $"doc_id").as("text"))

  test("verified-pair store: a persistVerdicts serve commits every candidate's " +
    "disposition; re-serves read verdicts and shingle NOTHING (corrupted-corpus probe)") {
    val dir = tmpDir("mh_verd")
    MinhashIndex.writeMinhashIndex(corpus.where($"doc_id" % 2 === 0), dir)
    MinhashIndex.appendToMinhashIndex(corpus.where($"doc_id" % 2 === 1), dir,
      maxOccupancy = 64)
    val first = verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, threshold = 0.35, maxOccupancy = 64, persistVerdicts = true))
    assert(first == oneShotVerified(corpus, 0.35) && first.nonEmpty,
      "persisting serve must still equal one-shot nearDuplicates")
    val st = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(st.pairGenerations == 1 && st.verificationMeta.contains((3, 0.35)))
    assert(MinhashIndex.verifiedPairsCommitted(spark, dir))

    // mechanism probe: with every candidate covered, the corpus text is
    // never consulted — a mutilated corpus must yield the SAME verdicts
    val reserve = verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.35, maxOccupancy = 64))
    assert(reserve == first, "re-serve re-verified instead of reading stored verdicts")
    // failed candidates are covered too (pass=false rows): the store holds
    // MORE dispositions than passing pairs
    val (stored, vm) = MinhashIndex.readVerifiedPairs(spark, dir).get
    assert(vm == ((3, 0.35)))
    assert(stored.count() >= first.size &&
      stored.where(!col("pass")).count() ==
        stored.count() - first.size)
  }

  test("batch feeds persist their verdicts; a later full serve verifies ONLY the " +
    "uncovered bootstrap pairs, and persisting that remainder completes coverage") {
    val a = corpus.where($"doc_id" < 10)
    val dir = tmpDir("mh_verd_inc")
    MinhashIndex.writeMinhashIndex(a, dir)
    var acc = a
    Seq(corpus.where($"doc_id" >= 10 && $"doc_id" < 20),
        corpus.where($"doc_id" >= 20)).foreach { b =>
      acc = acc.unionByName(b)
      MinhashIndex.nearDuplicatesForBatch(
        b, acc, dir, threshold = 0.35, maxOccupancy = 64).count()
    }
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.pairGenerations == 2)
    // bootstrap-internal pairs are the only uncovered ones — the serve
    // verifies them fresh (correct corpus required), reuses the rest
    val full = verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, threshold = 0.35, maxOccupancy = 64, persistVerdicts = true))
    assert(full == oneShotVerified(corpus, 0.35))
    // now coverage is total: the corrupted-corpus probe must hold
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.35, maxOccupancy = 64)) == full)
  }

  test("vmeta discipline: thresholds AT OR ABOVE the pinned bar reuse verdicts " +
    "(exact-jaccard re-filter — corrupted-corpus probe); lower thresholds and " +
    "other shingles verify fresh; persisting off-identity fails loud") {
    val dir = tmpDir("mh_vmeta")
    MinhashIndex.writeMinhashIndex(corpus, dir)
    MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, threshold = 0.35, maxOccupancy = 64, persistVerdicts = true).count()
    // tighter bar: a pass at 0.35 carries its exact jaccard and a fail
    // cannot reach 0.8 — full coverage means the corpus text is never
    // consulted, so the corrupted probe must still give the true answer
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.8, maxOccupancy = 64)) ==
      oneShotVerified(corpus, 0.8))
    // looser bar: stored fails at 0.35 say nothing about 0.2 — must
    // re-verify (the REAL corpus feeds it; the corrupted probe would lie)
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, threshold = 0.2, maxOccupancy = 64)) ==
      oneShotVerified(corpus, 0.2))
    // different VERIFICATION shingle: incomparable to the stored verdicts,
    // so the serve re-verifies the stored (shingle-3-banded) candidates at
    // 4-shingle Jaccard — equal to the explicit fresh composition
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, shingle = 4, threshold = 0.35, maxOccupancy = 64)) ==
      verifiedSet(Dedup.verifyJaccard(
          MinhashIndex.candidatePairsIndexed(spark, dir, maxOccupancy = 64),
          corpus, "doc_id", "text", shingle = 4, minJaccard = 0.35)
        .where(col("jaccard") >= 0.35)))
    val exServe = intercept[IllegalArgumentException] {
      MinhashIndex.nearDuplicatesIndexed(
        corpus, dir, threshold = 0.8, maxOccupancy = 64, persistVerdicts = true)
    }
    assert(exServe.getMessage.contains("incomparable"))
    // the batch feed must fail BEFORE mutating anything: failing after
    // the band commit would leave the delta appended, and the corrected
    // retry would append it AGAIN — doubled occupancy partials would then
    // silently cap its buckets at half their true occupancy
    val before = MinhashIndex.minhashIndexStats(spark, dir).get
    val exBatch = intercept[IllegalArgumentException] {
      MinhashIndex.nearDuplicatesForBatch(
        corpus.limit(1), corpus, dir, shingle = 4, threshold = 0.35,
        maxOccupancy = 64)
    }
    assert(exBatch.getMessage.contains("incomparable"))
    val after = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(after.version == before.version && after.segments == before.segments,
      s"a rejected batch feed mutated the store: $before -> $after")
  }

  test("verdict-store corpus guard: persisting with a candidate document absent " +
    "from the corpus frame fails loud and commits NOTHING (absence would be " +
    "misread as a size-prefilter fail and poison every later serve); the batch " +
    "feed rejects a pre-upsert corpus BEFORE the band append") {
    val dir = tmpDir("mh_guard")
    MinhashIndex.writeMinhashIndex(corpus, dir)
    // doc 0 sits in near-dup triple (0,1,2) — it IS a candidate, so a
    // corpus missing it must be rejected, not committed as pass=false
    val ex = intercept[IllegalArgumentException] {
      MinhashIndex.nearDuplicatesIndexed(
        corpus.where($"doc_id" =!= 0L), dir,
        threshold = 0.35, maxOccupancy = 64, persistVerdicts = true)
    }
    assert(ex.getMessage.contains("absent from the supplied corpus"))
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.pairGenerations == 0,
      "a rejected persisting serve committed a pairs generation")
    // the store is intact: a correct persisting serve still works
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corpus, dir, threshold = 0.35, maxOccupancy = 64, persistVerdicts = true)) ==
      oneShotVerified(corpus, 0.35))

    // batch feed with the PRE-upsert corpus (delta not in it): must fail
    // before appending bands — a post-append failure would make the
    // corrected retry append the delta twice
    val before = MinhashIndex.minhashIndexStats(spark, dir).get
    val exB = intercept[IllegalArgumentException] {
      MinhashIndex.nearDuplicatesForBatch(
        Seq((1000L, "w0 w3 w6 tail0 end0")).toDF("doc_id", "text"), corpus, dir,
        threshold = 0.35, maxOccupancy = 64)
    }
    assert(exB.getMessage.contains("INCLUDING this batch"))
    val after = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(after.version == before.version && after.segments == before.segments,
      s"a rejected batch feed mutated the store: $before -> $after")
  }

  test("delete drops stored verdicts for the victim's pairs; compaction folds " +
    "pair generations into the rewrite with identical serving") {
    val dir = tmpDir("mh_verd_del")
    MinhashIndex.writeMinhashIndex(corpus.where($"doc_id" < 20), dir)
    MinhashIndex.nearDuplicatesIndexed(
      corpus.where($"doc_id" < 20), dir, threshold = 0.35, maxOccupancy = 64,
      persistVerdicts = true).count()
    acc2AppendAndPersist(dir)
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.pairGenerations == 2)

    MinhashIndex.deleteFromMinhashIndex(Seq(0L, 3L).toDF("doc_id"), dir)
    val survivors = corpus.where(!$"doc_id".isin(0L, 3L))
    val served = verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.35, maxOccupancy = 64))
    assert(served == oneShotVerified(survivors, 0.35),
      "post-delete serve must equal one-shot over survivors (from stored verdicts)")
    assert(!served.exists(p => Set(0L, 3L)(p._1) || Set(0L, 3L)(p._2)))

    val retired = MinhashIndex.compactMinhashIndex(spark, dir)
    assert(retired == 5, s"2 segs + 1 del + 2 pair gens, got $retired")
    val st = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(st.pairGenerations == 1 && st.verificationMeta.contains((3, 0.35)))
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.35, maxOccupancy = 64)) == served,
      "compaction changed serving or lost verdicts")
    MinhashIndex.vacuumMinhashIndex(spark, dir)
    assert(verifiedSet(MinhashIndex.nearDuplicatesIndexed(
      corrupted, dir, threshold = 0.35, maxOccupancy = 64)) == served)
  }

  /** Append the ≥20 half and persist its feed verdicts (helper keeps the
    * delete/compact test readable). */
  private def acc2AppendAndPersist(dir: String): Unit =
    MinhashIndex.nearDuplicatesForBatch(
      corpus.where($"doc_id" >= 20), corpus, dir,
      threshold = 0.35, maxOccupancy = 64).count()

  test("compact: identical serving, tombstones retired physically, " +
    "deleted ids become re-appendable, vacuum reclaims debris") {
    val dir = tmpDir("mh_compact")
    MinhashIndex.writeMinhashIndex(corpus.where($"doc_id" < 15), dir)
    MinhashIndex.appendToMinhashIndex(corpus.where($"doc_id" >= 15), dir)
    MinhashIndex.deleteFromMinhashIndex(Seq(1L, 4L).toDF("doc_id"), dir)
    val before = pairSet(MinhashIndex.candidatePairsIndexed(spark, dir))

    val retired = MinhashIndex.compactMinhashIndex(spark, dir)
    assert(retired == 3, s"2 segments + 1 del generation, got $retired")
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == before,
      "compaction changed serving")
    val st = MinhashIndex.minhashIndexStats(spark, dir).get
    assert(st.segments == 1 && st.tombstoneGenerations == 0 && st.tombstonedIds == 0L)
    assert(st.debrisGenerations == 3)
    assert(MinhashIndex.vacuumMinhashIndex(spark, dir) == 3)
    assert(MinhashIndex.minhashIndexStats(spark, dir).get.debrisGenerations == 0)
    assert(pairSet(MinhashIndex.candidatePairsIndexed(spark, dir)) == before,
      "vacuum touched live data")

    // the tombstone contract: after compaction a deleted id can re-enter
    val again = pairSet(MinhashIndex.appendToMinhashIndex(
      corpus.where($"doc_id" === 1L), dir))
    assert(again.exists(p => p._1 == 1L || p._2 == 1L),
      "re-appended id 1 should pair with its surviving near-dup group")
    // noop compact on a single tombstone-free segment
    MinhashIndex.compactMinhashIndex(spark, dir) // merges the re-append segment
    assert(MinhashIndex.compactMinhashIndex(spark, dir) == 0)
  }
}
