package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora: exact (content-hash),
 * near-duplicate via MinHash+LSH banding, SimHash sketches, and blocked
 * n-gram Jaccard.
 *
 * Scale design (the part that matters at 100 TB):
 *  - Exact dedup is a hash-partitioned `row_number() = 1` on the content key —
 *    one shuffle by key, no global sort.
 *  - Near-dup candidate generation NEVER does an all-pairs join. MinHash
 *    signatures are banded and candidates are pairs that collide in ≥1 band —
 *    a self-equi-join on (band, bandKey), which shuffles each doc `bands`
 *    times instead of comparing N² pairs. With b bands of r rows, the
 *    candidate probability of a pair with Jaccard j is 1-(1-j^r)^b — the
 *    standard S-curve; tune (b, r) to the target threshold.
 *  - Verification (true Jaccard) runs only on the candidate set.
 *  - All hashes are md5-derived (see [[TextOps.hash32]]) — deterministic
 *    across engines and restarts, so incremental dedup runs agree.
 */
object Dedup {

  /** Large prime modulus for the affine minhash family (2^31 - 1). */
  val Prime: Long = 2147483647L

  /**
   * Frees the block-manager storage behind a `localCheckpoint`'d frame once a
   * newer checkpoint supersedes it. The iterative clustering loops below cut
   * lineage with a checkpoint per round; without an explicit release every
   * round's blocks stay resident for the life of the application — round 5's
   * bench showed that residue squeezing execution memory for unrelated
   * queries (q_dedup_jaccard_blocked 11.3s in-suite vs 2.43s isolated).
   * A checkpointed plan bottoms out in `LogicalRDD` leaves whose RDDs hold
   * the persisted blocks; unpersisting them is safe as soon as no
   * not-yet-materialized frame derives from them.
   */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Affine permutation family: h_i(x) = (a_i·x + b_i) mod P with fixed,
    * engine-portable coefficients. */
  def affine(i: Int, h: Column): Column =
    (h * lit(2L * i + 1) + lit(98765L * i + 12345L)) % lit(Prime)

  /**
   * Keeps one row per `key` — the one with the smallest `orderCol`
   * (deterministic winner, matching "first seen" under a total order).
   */
  def exact(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCol.asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact content dedup: one row per distinct text (by md5), smallest id wins. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, md5(col(textCol)), col(idCol))

  /**
   * Incremental (snapshot-over-snapshot) exact dedup: the rows of a NEW
   * batch that are genuinely new content — not already present in the
   * accumulated corpus (by content fingerprint, [[TextOps.fingerprint]]
   * normalization), and first-per-fingerprint within the batch itself.
   * This is the daily-crawl shape: the 100 TB corpus is never rescanned or
   * re-deduplicated; only its fingerprint column joins against the
   * (much smaller) batch.
   *
   * `seen` needs only a `fp` column (persist just the fingerprints, not
   * the documents). The anti-join shuffles on the fingerprint key — at
   * batch ≪ corpus scale AQE turns the batch side into the broadcast
   * probe; either way no all-pairs, no full-corpus rewrite.
   */
  def exactIncremental(
      batch: DataFrame, seen: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(seen.columns.contains("fp"), "seen must carry a fp fingerprint column")
    exact(
      batch
        .withColumn("_fp", TextOps.fingerprint(col(textCol)))
        .join(seen.select(col("fp").as("_fp")), Seq("_fp"), "left_anti"),
      col("_fp"), col(idCol))
      .drop("_fp")
  }

  /** The fingerprint column [[exactIncremental]] expects `seen` to carry —
    * one row per already-ingested document. */
  def seenFingerprints(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()

  /**
   * Content-level snapshot diff: what a new corpus version `v2` added,
   * removed, or retained relative to `v1`, keyed by normalized content
   * fingerprint (NOT by document id — re-crawled content under a fresh id
   * is "retained", which is the question dataset versioning actually
   * asks). One row per distinct fingerprint:
   * `(fp, id_v1, id_v2, status ∈ added|removed|retained)`, each side
   * represented by its smallest id.
   *
   * Two content-keyed aggregates plus one full-outer join on the
   * fingerprint — linear in both snapshots, no all-pairs, and the join key
   * is the aggregate key so AQE plans it shuffle-aligned.
   */
  def snapshotDiff(
      v1: DataFrame, v2: DataFrame, idCol: String, textCol: String): DataFrame = {
    def fps(d: DataFrame, as: String) =
      d.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
        .agg(min(col(idCol)).as(as))
    fps(v1, "id_v1")
      .join(fps(v2, "id_v2"), Seq("fp"), "full_outer")
      .withColumn("status",
        when(col("id_v1").isNull, "added")
          .when(col("id_v2").isNull, "removed")
          .otherwise("retained"))
  }

  /**
   * Corpus-wide paragraph/line dedup — the CCNet ingest stage (Wenzek et
   * al. 2020, arXiv:1911.00359): split every document on `sep`, drop each
   * line that duplicates one seen elsewhere in the corpus, and reassemble
   * the survivors in original order. This is what strips boilerplate
   * ("subscribe", cookie banners, shared footers) that recurs across
   * MILLIONS of otherwise-distinct pages — cheaper and earlier in the
   * pipeline than span dedup ([[exactSubstringDedup]]), which catches
   * shared runs that don't align to line boundaries.
   *
   * `keepFirst = true` (default) keeps the single first occurrence under
   * the (id, position) total order — one copy of every line value survives
   * somewhere, CCNet's semantics. `keepFirst = false` removes EVERY
   * occurrence of a line that appears more than once (the aggressive
   * variant for boilerplate known to be worthless).
   *
   * Scale shape: lines are keyed by md5 (fixed 32 bytes shuffled per line,
   * not the line text); the global first/count comes from a
   * partial-aggregatable `groupBy(h)` — map-side combine collapses a
   * million-fold duplicated banner to one row per input partition BEFORE
   * the exchange, so pathological line skew never concentrates on one
   * reducer. One shuffle-join of lines against that aggregate on `h`;
   * the rebuild then moves only the DROPPED `(id, pos)` occurrences (the
   * dup mass) — surviving text never re-shuffles, the cleaned string is a
   * per-row position-aware filter over the original split (the span-
   * rebuild shape). No windows over the hot key, no all-pairs.
   * A document whose every line was seen earlier reassembles to the empty
   * string (it is pure boilerplate — downstream length filters drop it).
   * Null/absent text passes through as null.
   */
  def paragraphDedup(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", keepFirst: Boolean = true): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val lines = paragraphLines(base, sep)
    val drops =
      if (keepFirst) paragraphDropLaterOccurrences(lines)
      else {
        val counts = lines.groupBy(col("h")).agg(count(lit(1)).as("n"))
        lines.join(counts, Seq("h")).where(col("n") > 1L).select("id", "pos")
      }
    paragraphRebuild(base, drops, idCol, textCol, sep)
  }

  /** `(id, pos, line, h)` line frame of non-null-text docs. */
  private def paragraphLines(base: DataFrame, sep: String): DataFrame =
    base.where(col("text").isNotNull)
      .select(col("id"), posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))

  /** Occurrences to DROP under keep-first: everything but the first
    * occurrence per line hash under the (id, pos) total order —
    * min(struct) per hash is partial-aggregatable, so banner skew
    * collapses map-side. */
  private def paragraphDropLaterOccurrences(lines: DataFrame): DataFrame = {
    val firsts = lines.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    lines.join(firsts, Seq("h"))
      .where(struct(col("id"), col("pos")) =!= col("first"))
      .select("id", "pos")
  }

  /** Rebuild from the DROP list — the span-rebuild medicine applied to
    * lines: only the dropped `(id, pos)` occurrences (the dup mass, the
    * small side on a real corpus) move through an exchange; the corpus
    * text never does. Each doc's drop positions collect to one array row
    * (bounded by the doc's own line count), joined id-keyed (AQE
    * broadcasts the drop side when dups ≪ corpus), and a per-row
    * position-aware HOF filter keeps the lines outside the drop set.
    * Null text rides through as null; a doc whose every line was dropped
    * becomes "". */
  private def paragraphRebuild(
      base: DataFrame, drops: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame = {
    val cutArr = drops.groupBy(col("id"))
      .agg(collect_list(col("pos")).as("_cut"))
    base.join(cutArr, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(array_join(
            filter(split(col("text"), java.util.regex.Pattern.quote(sep)),
              (_, i) => coalesce(!array_contains(col("_cut"), i), lit(true))),
            sep)).as(textCol))
  }

  /**
   * WITHIN-document line dedup — the Gopher-class repetition cleanup (Rae
   * et al. 2021 flag docs by duplicate-line fraction; this REPAIRS them):
   * inside each document, every repeat of an earlier line is dropped,
   * other documents' lines are irrelevant. Because the scope is one row,
   * this is a pure PROJECTION — zero shuffles, no state, composes before
   * the corpus-wide [[paragraphDedup]] (which then charges each surviving
   * value once globally). The per-row scan is O(lines²) in the worst
   * case (`array_contains` over the seen prefix) — lines per document are
   * bounded small in practice; the corpus-wide operator is the tool when
   * they aren't. Null text rides through as null.
   */
  def paragraphDedupWithinDoc(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val arr = split(col(textCol), java.util.regex.Pattern.quote(sep))
    docs.withColumn(textCol,
      when(col(textCol).isNull, lit(null).cast("string"))
        .otherwise(array_join(
          filter(arr, (l, i) => !array_contains(slice(arr, lit(1), i), l)), sep)))
  }

  /** Distinct line hashes of the accumulated corpus — the store behind
    * [[paragraphDedupIncremental]], the line-granularity mirror of
    * [[seenFingerprints]]: persist just these 32-byte hashes, never the
    * corpus text. */
  def seenLineHashes(
      corpus: DataFrame, textCol: String, sep: String = "\n"): DataFrame =
    corpus.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("_l"))
      .select(md5(col("_l")).as("h")).distinct()

  /**
   * Incremental (batch-over-store) paragraph dedup — the continuous-crawl
   * form of [[paragraphDedup]]'s keep-first contract, the way
   * [[exactIncremental]] extends [[exact]]: a batch line survives iff its
   * hash is NOT in the accumulated store AND it is the first occurrence
   * within the batch itself under the (id, position) order. Cost is the
   * batch's own line mass plus one anti-join against the hash store
   * (batch ≪ store → AQE broadcasts the batch side); the corpus text is
   * never rescanned.
   *
   * Streaming approximation, stated plainly (same as the span-dedup and
   * exact-dedup incrementals): stored documents were cleaned against the
   * store as of THEIR ingest time — a line first duplicated by a later
   * batch is dropped from that batch onward, not retroactively. When
   * ingest order follows id order, this equals the batch operator over
   * the concatenated corpus restricted to the batch (spec-pinned).
   */
  def paragraphDedupIncremental(
      batch: DataFrame, seen: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    require(seen.columns.contains("h"),
      "seen must carry an h line-hash column — see seenLineHashes")
    val base = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val lines = paragraphLines(base, sep)
    // drop = seen-anywhere ∪ later-occurrence-within-batch (of the unseen).
    // The store joins ONCE: a marked left join feeds one per-hash aggregate
    // carrying both the seen flag and the first fresh occurrence; the
    // batch-side lines (cheap split/posexplode) are the only recomputed
    // lineage.
    val hinfo = lines
      .join(seen.select(col("h"), lit(true).as("_seen")), Seq("h"), "left")
      .groupBy("h")
      .agg(
        max(coalesce(col("_seen"), lit(false))).as("_seenAny"),
        min(when(col("_seen").isNull, struct(col("id"), col("pos"))))
          .as("_firstFresh"))
    val drops = lines.join(hinfo, Seq("h"))
      .where(col("_seenAny") || struct(col("id"), col("pos")) =!= col("_firstFresh"))
      .select("id", "pos")
    paragraphRebuild(base, drops, idCol, textCol, sep)
  }

  /** A chosen LSH banding: `bands × rows = numHashes`, with the S-curve
    * crossover `(1/bands)^(1/rows)` — the Jaccard similarity at which a
    * pair's candidate probability passes ~1−1/e. */
  final case class LshPlan(bands: Int, rows: Int, crossover: Double)

  /** Candidate probability of a pair with Jaccard `j` under `(bands,
    * rows)` banding: `1 − (1 − j^rows)^bands` — the standard S-curve
    * (Leskovec/Rajaraman/Ullman, MMDS ch. 3). */
  def lshCandidateProb(bands: Int, rows: Int, j: Double): Double =
    1.0 - math.pow(1.0 - math.pow(j, rows), bands)

  /**
   * Pick the banding for a target Jaccard threshold: among the divisors
   * of `numHashes`, the `(bands, rows)` whose S-curve crossover
   * `(1/b)^(1/r)` lands closest to `targetJaccard` (ties to more bands —
   * recall over precision, the dedup-side default). The planning function
   * every `nearDuplicates`/[[MinhashIndex]] deployment otherwise
   * hand-derives; e.g. 16 hashes at target 0.35 → (8 bands, 2 rows),
   * crossover 0.3536 — the engine's own shipped configuration.
   */
  def lshPlan(numHashes: Int, targetJaccard: Double): LshPlan = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(targetJaccard > 0 && targetJaccard < 1,
      s"targetJaccard must be in (0, 1), got $targetJaccard")
    val options = (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      LshPlan(b, r, math.pow(1.0 / b, 1.0 / r))
    }
    options.minBy(p => (math.abs(p.crossover - targetJaccard), -p.bands))
  }

  /**
   * MinHash signatures, wide format: one row per document with columns
   * `mh_0 … mh_{numHashes-1}`. All `numHashes` permutation minima are
   * computed in a SINGLE grouped aggregation over the exploded shingles —
   * each shingle row is touched once, versus a numHashes× row explosion in
   * the naive long-format layout (measured 2× faster at 16 hashes).
   */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingle: Int = 3): DataFrame = {
    val shingled = TextOps.explodedShingles(df, idCol, textCol, shingle)
      .withColumn("h", TextOps.hash32(col("sh")))
    val mins = (0 until numHashes).map(i => min(affine(i, col("h"))).as(s"mh_$i"))
    shingled.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /**
   * [[minhashSignatures]] via the native [[graft.expressions.MinhashSigs]]
   * kernel — same values, computed PER ROW with no explode and NO SHUFFLE
   * (the aggregate path moves every shingle of the corpus through an
   * exchange; the signature is a pure per-document function, so that
   * exchange is pure waste at scale). Requires
   * [[graft.GraftExtensions.register]] on the session.
   */
  def minhashSignaturesNative(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingle: Int = 3): DataFrame = {
    val sigs = df
      .select(
        col(idCol).as("id"),
        call_function(
          "minhash_sigs",
          TextOps.tokens(col(textCol)), lit(numHashes), lit(shingle)).as("_sigs"))
      .where(size(col("_sigs")) > 0) // < shingle tokens ⇒ no signature row
    val wide = (0 until numHashes).map(i => element_at(col("_sigs"), i + 1).as(s"mh_$i"))
    sigs.select((col("id") +: wide): _*)
  }

  /**
   * LSH banding over a wide signature: emits `(id, band, band_key)` rows,
   * band_key = order-fixed concatenation of the band's minhashes. One cheap
   * `bands`-way explode per document (bands ≪ numHashes rows).
   */
  def lshBands(signatures: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val ks = (b * rows until (b + 1) * rows).map(i => col(s"mh_$i").cast("string"))
      struct(lit(b).as("band"), concat_ws(",", ks: _*).as("band_key"))
    }
    signatures
      .select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /**
   * Candidate near-duplicate pairs: documents sharing at least one LSH band.
   * The self-join is an equi-join on (band, band_key) — never all-pairs.
   *
   * `maxOccupancy` bounds the quadratic tail: a (band, band_key) bucket
   * holding more than that many documents contributes occupancy² candidate
   * pairs, and fixed-band LSH's bucket occupancy grows linearly with the
   * corpus — the 10× stress run measured 3.3× candidate-mass growth from
   * exactly this. Buckets over the cap are dropped WHOLE (the standard
   * stop-bucket treatment: an oversized bucket is almost always shared
   * boilerplate whose pairs junk the verifier, and a true near-dup pair
   * agrees on most of its signature, so it still collides in its other,
   * sparser bands), making worst-case candidate mass O(corpus × cap ×
   * bands) instead of quadratic. The drop is never silent — audit it with
   * [[lshOccupancyStats]]; recall floors are pinned in QualitySpec. The
   * occupancy count reuses the self-join's (band, band_key) hash
   * partitioning, so the filter adds no extra exchange of the corpus.
   */
  def candidatePairs(bands: DataFrame, maxOccupancy: Int = Int.MaxValue): DataFrame =
    // Inverted-index generation: ONE shuffle of the band rows builds a
    // sorted posting list per (band, band_key), the occupancy cap becomes
    // a `size(ids)` predicate on the SAME aggregation (the former
    // count-then-semi-join occupancy pass disappears entirely), and pairs
    // are emitted by an in-posting Generate. The former self-join shuffled
    // and sorted the band mass twice — its sides differ only by an alias
    // but project different columns below the exchange, so no stage reuse
    // was possible (measured on the blocked-Jaccard twin of this shape:
    // the posting form cut 10×-scale time 5.9→3.3s). Memory bound: one
    // posting must fit a task — the cap guarantees that when set; the
    // uncapped classic inherits the hot-bucket hazard it always had, now
    // as task memory rather than join blowup (use the cap at scale).
    // array_distinct guards the one behavior the old self-join got for free
    // from its `id_a < id_b` predicate: a duplicated (band, band_key, id)
    // input row must not turn into a self-pair. Callers produce unique rows
    // by construction (one row per doc per band), so this is O(posting)
    // insurance, not a load-bearing dedup; it also makes the occupancy cap
    // count DOCUMENTS, never raw rows.
    bands.groupBy("band", "band_key")
      .agg(array_distinct(sort_array(collect_list(col("id")))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxOccupancy)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("id_b"))
      .distinct()

  /** Occupancy audit for the [[candidatePairs]] cap: one row —
    * `(n_buckets, n_dropped_buckets, dropped_rows, dropped_pair_mass,
    * max_occupancy)` — quantifying what a given cap discards (a dropped
    * bucket of n docs forfeits n·(n−1)/2 candidate pairs). Run it
    * alongside any capped dedup so the drop is measured, never silent. */
  def lshOccupancyStats(bands: DataFrame, maxOccupancy: Int): DataFrame =
    bands.groupBy("band", "band_key")
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("n") > maxOccupancy, 1L).otherwise(0L)).as("n_dropped_buckets"),
        sum(when(col("n") > maxOccupancy, col("n")).otherwise(0L)).as("dropped_rows"),
        sum(when(col("n") > maxOccupancy, (col("n") * (col("n") - 1) / 2).cast("long"))
          .otherwise(0L)).as("dropped_pair_mass"),
        max(col("n")).as("max_occupancy"))

  /**
   * True Jaccard similarity over word shingles for a given pair set —
   * verification stage of the MinHash pipeline, cost ∝ candidate pairs, not N².
   */
  def verifyJaccard(
      pairs: DataFrame, df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    // Cache the pair set (it feeds the id restriction below AND the size
    // prefilter — recomputing the LSH lineage per reference would double
    // candidate generation) and restrict shingling to documents that
    // appear in ≥1 candidate pair: the candidate set is bounded by the
    // banding, the corpus is not — without the semi-join the explode+group
    // below shingles every document of a 100 TB corpus twice for a
    // verification that touches a small fraction of them.
    //
    // localCheckpoint chosen DELIBERATELY over persist: a persisted pair
    // set measured 2.7× slower end-to-end (9.4s vs 3.5s at sf0.1) because
    // AQE cannot re-plan below an InMemoryRelation boundary (cached-plan
    // output partitioning is pinned), while the checkpointed leaf has
    // known size and leaves AQE free to broadcast the id semi-join. The
    // trade: checkpoint blocks are not recomputable — losing an executor
    // mid-query fails the job (retry recomputes from source) instead of
    // transparently recomputing the lost partitions. For a bounded
    // candidate table that guards a much larger verification, the fast
    // plan + job-level retry is the right side of that trade.
    val p = pairs.localCheckpoint()
    val ids = p.select(col("id_a").as("_vid"))
      .unionByName(p.select(col("id_b").as("_vid")))
      .distinct()
    val cand = df.join(ids, col(idCol) === col("_vid"), "left_semi")
    val sh = TextOps.explodedShingles(cand, idCol, textCol, shingle)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // Size prefilter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose set
    // sizes are more than a 1/minJaccard factor apart cannot pass — prune
    // them BEFORE the (expensive) intersection join.
    val sized = p
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
    val pruned =
      if (minJaccard > 0)
        sized.where(
          least(col("n_a"), col("n_b")).cast("double") >=
            greatest(col("n_a"), col("n_b")) * minJaccard)
      else sized
    val inter = pruned.select("id_a", "id_b")
      .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    pruned
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
  }

  /**
   * Blocked near-duplicate detection without LSH: documents are compared only
   * within a block (e.g. (lang, source, length-bucket)), and candidate pairs
   * are generated by a shingle-to-shingle equi-join on (block, shingle) —
   * pairs sharing zero shingles have Jaccard 0 and can never pass a positive
   * threshold, so they are never materialized at all (vs. a block-wide pair
   * cross product). Returns pairs with exact Jaccard ≥ `threshold`.
   */
  def blockedNearDuplicates(
      df: DataFrame, idCol: String, textCol: String, blockCols: Seq[String],
      shingle: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0, "a zero threshold would require the full pair cross product")
    val sh = TextOps.explodedShingles(df, idCol, textCol, shingle, blockCols)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // Inverted-index candidate generation: ONE shuffle of the exploded
    // shingles builds a sorted posting list per (block…, shingle), and the
    // in-posting pair Generate emits each co-occurrence directly — where
    // the former shingle-to-shingle self-join shuffled AND sorted the full
    // shingle mass twice (the two join sides differ only by an alias, but
    // project different output columns below the exchange, so neither
    // planner nor AQE can reuse the stage). Pair mass is identical —
    // Σ|posting|²/2 either way — but it now materializes from a Generate
    // instead of a sort-merge. Memory bound: one posting list must fit a
    // task (ids are unique per posting thanks to array_distinct'd
    // shingles; blocks bound posting width the same way they bound the
    // former join's bucket width).
    val posting = sh.groupBy((blockCols :+ "sh").map(col): _*)
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val inter = posting
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * End-to-end MinHash-LSH near-dup detection: signatures → bands → candidate
   * pairs → Jaccard verification ≥ `threshold`. `maxOccupancy` bounds
   * band-bucket blowup (see [[candidatePairs]]); pass `Int.MaxValue` for
   * the uncapped classic.
   */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      threshold: Double = 0.5, nativeSignatures: Boolean = false,
      maxOccupancy: Int = 64): DataFrame = {
    val sigs =
      if (nativeSignatures) minhashSignaturesNative(df, idCol, textCol, numHashes, shingle)
      else minhashSignatures(df, idCol, textCol, numHashes, shingle)
    val cands = candidatePairs(lshBands(sigs, numHashes, bands), maxOccupancy)
    verifyJaccard(cands, df, idCol, textCol, shingle, minJaccard = threshold)
      .where(col("jaccard") >= threshold)
  }

  /**
   * SimHash near-duplicate pairs: documents whose 32-bit sketches differ in
   * at most `maxHamming` bits. Candidates come from byte-band blocking —
   * the sketch splits into 4 bytes and docs sharing ANY byte-band collide;
   * by pigeonhole a pair within Hamming distance 3 differs in at most 3
   * bytes, so it always shares at least one unchanged band: the blocking is
   * EXACT (full recall) for `maxHamming ≤ 3`, and the self-join is an
   * equi-join on (band, band_key).
   *
   * SCALE LIMIT: an 8-bit band has only 256 distinct keys, so each bucket
   * holds ~N/256 documents and the candidate set grows as ~N²/64 — fine for
   * small or pre-blocked inputs (per-shard, per-(lang, source) partitions),
   * quadratic on a whole corpus. For corpus-scale blocking use the 64-bit
   * sketch with 16-bit bands ([[simhashNearDuplicates64]]): 65536 keys per
   * band cut the candidate mass by 256× and the wider sketch makes random
   * collisions negligible.
   */
  def simhashNearDuplicates(
      sketches: DataFrame, maxHamming: Int = 3,
      maxOccupancy: Int = SimhashMaxOccupancy): DataFrame =
    simhashBandPairs(sketches, maxHamming, bandBits = 8, maxOccupancy)

  /**
   * [[simhashNearDuplicates]] over 64-bit sketches ([[simhash64]] /
   * [[simhashNative64]]) with 16-bit bands — the corpus-scale variant.
   * Pigeonhole again makes the blocking EXACT for `maxHamming ≤ 3` (4 bands,
   * ≤3 flipped bits ⇒ ≥1 untouched band), but each band now has 65536 keys:
   * bucket occupancy ~N/65536, candidate pairs ~N²/16384 — 256× fewer than
   * the byte-banded 32-bit sketch, and the 64-bit sketch keeps the random
   * (non-near-dup) collision rate negligible at corpus scale.
   */
  def simhashNearDuplicates64(
      sketches: DataFrame, maxHamming: Int = 3,
      maxOccupancy: Int = SimhashMaxOccupancy): DataFrame =
    simhashBandPairs(sketches, maxHamming, bandBits = 16, maxOccupancy)

  /** Default band-bucket occupancy cap for the simhash pair family — the
    * same stop-bucket treatment as [[candidatePairs]]'s `maxOccupancy`,
    * sized for fingerprint bands rather than minhash signature bands: a
    * 16-bit band has only 65536 keys, so honest buckets grow linearly
    * with the corpus AND degenerate content (blank images, silence
    * clips, empty/boilerplate docs) collapses to ONE fingerprint whose
    * bucket holds the whole degenerate family — uncapped, one reducer
    * gets that family and emits occupancy² pairs. At the default, a
    * surviving bucket contributes ≤ C(1024,2) ≈ 524k pairs and
    * worst-case candidate mass is O(corpus × 1024 × 4) — linear. A
    * dropped bucket's docs agree on ≤ `bandBits` sketch bits by
    * construction of the drop (they still collide in their other, less
    * degenerate bands if genuinely near-dup), and the drop is never
    * silent: audit with [[simhashOccupancyStats]]. */
  val SimhashMaxOccupancy: Int = 1024

  /** The 4-band projection `(id, simhash, band, band_key)` behind the
    * simhash pair family — public so occupancy audits and custom
    * verification can compose with it. */
  def simhashBands(sketches: DataFrame, bandBits: Int = 16): DataFrame = {
    val mask = (1L << bandBits) - 1
    sketches.select(
      col("id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), bandBits * j).bitwiseAND(lit(mask)).as("band_key"))): _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.band").as("band"), col("b.band_key").as("band_key"))
  }

  /** Occupancy audit for the simhash pair family's `maxOccupancy` cap —
    * [[lshOccupancyStats]] over the [[simhashBands]] projection: one row
    * `(n_buckets, n_dropped_buckets, dropped_rows, dropped_pair_mass,
    * max_occupancy)`. Run it alongside any capped near-dup pass so the
    * drop is measured, never silent.
    *
    * `bandBits` is REQUIRED (round-14 advice): the 64-bit family bands at
    * 16 bits but the 32-bit family ([[simhashNearDuplicates]]) bands at 8
    * — a defaulted audit of 32-bit sketches would silently measure the
    * WRONG banding, reporting drop stats that don't correspond to what
    * the capped pair pass actually dropped. Use
    * [[simhashOccupancyStats32]] for the 32-bit family. */
  def simhashOccupancyStats(
      sketches: DataFrame, bandBits: Int,
      maxOccupancy: Int = SimhashMaxOccupancy): DataFrame =
    lshOccupancyStats(simhashBands(sketches, bandBits), maxOccupancy)

  /** [[simhashOccupancyStats]] at the 32-bit family's banding (8-bit
    * bands) — the audit that matches what [[simhashNearDuplicates]]'s
    * capped pair pass actually drops. */
  def simhashOccupancyStats32(
      sketches: DataFrame, maxOccupancy: Int = SimhashMaxOccupancy): DataFrame =
    simhashOccupancyStats(sketches, bandBits = 8, maxOccupancy = maxOccupancy)

  /** Shared band-blocked Hamming pair generator: splits the sketch into 4
    * bands of `bandBits` bits each (32-bit sketch × 8-bit bands, 64-bit
    * sketch × 16-bit bands), collides docs on (band, band_key), verifies
    * with `bit_count(xor)`. `maxOccupancy` drops over-occupied buckets
    * WHOLE — see [[SimhashMaxOccupancy]]. */
  private def simhashBandPairs(
      sketches: DataFrame, maxHamming: Int, bandBits: Int,
      maxOccupancy: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4-band blocking is exact only for maxHamming <= 3, got $maxHamming")
    require(maxOccupancy >= 2,
      s"maxOccupancy below 2 drops every pair-capable bucket, got $maxOccupancy")
    val banded = simhashBands(sketches, bandBits)
    // Posting-list pair generation (same shape as [[candidatePairs]]): one
    // shuffle of the band rows, pairs from an in-posting Generate, sketch
    // payload riding in the posting struct. sort_array orders by the
    // struct's first field — the unique-per-bucket id — so id_a < id_b
    // holds by construction. Posting width is the band-key bucket size:
    // fine for 16-bit bands (65536 keys/band), and the 8-bit path keeps
    // its documented whole-corpus quadratic warning either way.
    banded.groupBy("band", "band_key")
      .agg(array_distinct(sort_array(collect_list(struct(col("id"), col("simhash"))))).as("ps"))
      .where(size(col("ps")) > 1 && size(col("ps")) <= maxOccupancy)
      .select(posexplode(col("ps")).as(Seq("i", "pa")), col("ps"))
      .select(col("pa"),
        explode(expr("slice(ps, i + 2, size(ps) - i - 1)")).as("pb"))
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"),
        bit_count(col("pa.simhash").bitwiseXOR(col("pb.simhash"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * MinHash-estimated Jaccard for a pair set over wide signature frames:
   * the fraction of agreeing minhash components (an unbiased estimator of
   * true Jaccard, stderr ≈ 1/√numHashes). The signature-only verification
   * tier — no text access, so it works against a persisted signature store.
   */
  def estimateJaccard(
      pairs: DataFrame, sigsA: DataFrame, sigsB: DataFrame,
      numHashes: Int = 16): DataFrame = {
    def renamed(s: DataFrame, side: String) =
      s.select((col("id").as(s"id_$side") +:
        (0 until numHashes).map(i => col(s"mh_$i").as(s"${side}_mh_$i"))): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(renamed(sigsA, "a"), "id_a")
      .join(renamed(sigsB, "b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
  }

  /**
   * Incremental near-dup detection: a NEW shard against a PERSISTED corpus
   * signature store — the realistic 100 TB shape (signatures+bands of the
   * existing corpus are computed once and stored; each arriving shard is
   * signed, banded, and joined against the store, never re-processing the
   * corpus). Returns `(id_a=existing, id_b=new, est_jaccard)` pairs with
   * estimated Jaccard ≥ `threshold`, plus new-vs-new pairs within the
   * shard. Feed the result to [[clusters]]/[[dropDuplicateClusters]] and
   * append the surviving new signatures to the store.
   *
   * `existingSigs`/`newSigs` are wide signature frames ([[minhashSignatures]]
   * / [[minhashSignaturesNative]] output: `id, mh_0..mh_{n-1}`).
   */
  def nearDuplicatesIncremental(
      existingSigs: DataFrame, newSigs: DataFrame,
      numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.5,
      existingBands: Option[DataFrame] = None): DataFrame = {
    // Pass the PERSISTED band table via `existingBands` in production:
    // recomputing it here scans the whole store per shard, which defeats
    // the incremental design (kept as a default for small stores/tests).
    val eb = existingBands.getOrElse(lshBands(existingSigs, numHashes, bands))
    val nb = lshBands(newSigs, numHashes, bands)
    // existing–new collisions (store side never self-joins again). The
    // id inequality guards replayed shards whose ids were already appended
    // to the store: a doc must never pair with itself and be dropped as
    // its own duplicate.
    val cross = eb.select(col("band"), col("band_key"), col("id").as("id_a"))
      .join(nb.select(col("band"), col("band_key"), col("id").as("id_b")),
        Seq("band", "band_key"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    // …plus collisions within the new shard itself
    val within = candidatePairs(nb)
    val all = existingSigs.unionByName(newSigs).dropDuplicates("id")
    estimateJaccard(cross.unionByName(within), all, all, numHashes)
      .where(col("est_jaccard") >= threshold)
  }

  /**
   * Applies a near-duplicate pair set to the corpus: removes every `id_b`
   * (pairs are emitted with `id_a < id_b`, so the smallest id of a duplicate
   * chain survives — deterministic, and transitively safe because any later
   * member pairs with an earlier one through the same bucket).
   */
  def dropNearDuplicates(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(
      pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /**
   * Connected components over a near-duplicate pair set: every document in a
   * duplicate cluster gets the cluster's MINIMUM id as its label —
   * `(id, cluster)`, one row per document that appears in ≥1 pair.
   *
   * [[dropNearDuplicates]]'s "drop every id_b" is only safe when the pair
   * set is bucket-transitive; arbitrary pair sets (e.g. a union of pairs from
   * different detectors) form chains `a–b, b–c` where c never pairs with a —
   * clustering closes them so exactly one representative per component
   * survives.
   *
   * Implementation: iterative min-label propagation — per round, each node
   * takes the min of its own and its neighbors' labels; converges in
   * O(component diameter) rounds (near-dup clusters are shallow). Each round
   * is one equi-join + grouped min, `localCheckpoint` cuts the growing
   * lineage, and a `limit(1)` probe detects convergence without a full
   * count — the standard scalable shape (GraphX-free connected components).
   */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the pair set once: the symmetric edge union references it
    // twice, and pair generation (LSH/Jaccard lineage) is the expensive part.
    val p = pairs.persist()
    val edges = p
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    edges.count()
    p.unpersist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("c_dst")), "dst")
        .groupBy("src")
        .agg(min(col("c_dst")).as("nbr_min"))
        .select(col("src").as("id"), col("nbr_min"))
      // The changed flag rides along INTO the checkpoint, so the convergence
      // probe is a cheap scan of the already-materialized blocks — the
      // former probe re-joined the new labels against the old ones, paying
      // an extra shuffle per round for information the update already had.
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"),
          (coalesce(col("nbr_min"), col("cluster")) < col("cluster")).as("_changed"))
        .localCheckpoint()
      converged = updated.where(col("_changed")).limit(1).isEmpty
      // `updated` is materialized (eager checkpoint): the previous round's
      // checkpoint blocks are now dead weight — release them.
      releaseCheckpoint(labels)
      labels = updated.drop("_changed")
      i += 1
    }
    edges.unpersist()
    // A silent truncation would let duplicates survive the dedup pass with
    // multiple "representatives" per component — fail loudly instead (and
    // release the abandoned labels checkpoint so a caller that catches and
    // falls back — clustersAuto — starts from a clean block manager).
    if (!converged) {
      releaseCheckpoint(labels)
      throw new IllegalStateException(
        s"Dedup.clusters did not converge within $maxIter iterations " +
          "(a component's diameter exceeds maxIter); raise maxIter or use " +
          "clustersContract (O(log n) rounds regardless of diameter)")
    }
    labels
  }

  /**
   * Connected components by alternating large-star / small-star contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
   * 2014) — same output contract as [[clusters]]: `(id, cluster)` with the
   * component MINIMUM id as label, one row per node appearing in ≥1 pair.
   *
   * Where min-label propagation needs O(component diameter) rounds — a
   * pathological near-dup chain (doc₁~doc₂~…~docₙ from incremental crawl
   * shards) makes that O(n) — star contraction halves the effective depth
   * every alternation and converges in O(log n) rounds on ANY topology:
   *
   *  - large-star: every node links its strictly-LARGER neighbors to the
   *    minimum of its closed neighborhood;
   *  - small-star: every node links its smaller-or-self neighborhood to
   *    that minimum.
   *
   * Both steps preserve connectivity and never increase the edge count
   * (beyond the canonical set), and the fixed point is one star per
   * component rooted at its minimum id, read off as the label set. Each
   * round is two (groupBy-min + equi-join) phases over the edge list —
   * shuffle-by-key only, no all-pairs anywhere, `localCheckpoint` per round
   * to cut lineage. This is the whole-corpus-scale path; [[clusters]] stays
   * the cheaper choice for the shallow clusters typical of one-shot LSH
   * output (2–3 rounds at one join each).
   */
  def clustersContract(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val p = pairs.persist()
    // All labeled nodes (parity with clusters(): every id in ≥1 pair, even
    // self-pairs / isolated nodes that the edge canonicalization drops).
    val nodes = p.select(col("id_a").as("id"))
      .unionByName(p.select(col("id_b").as("id")))
      .distinct()
      .localCheckpoint()
    // Canonical undirected edge list: (src, dst) with src < dst.
    var edges = p
      .select(least(col("id_a"), col("id_b")).as("src"),
        greatest(col("id_a"), col("id_b")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    p.unpersist()
    var converged = edges.limit(1).isEmpty // no edges ⇒ nothing to contract
    var i = 0
    while (!converged && i < maxIter) {
      // Large-star: symmetric view; per node u, m = min(neighborhood ∪ u);
      // attach every neighbor v > u to m. Emitted edges are canonical by
      // construction (m ≤ u < v).
      val sym = edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("nbr_min"))
        .select(col("u"), least(col("u"), col("nbr_min")).as("m"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("m").as("src"), col("v").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
      // Small-star over the canonical list: per hub `dst`, m = min of its
      // smaller neighbors; attach those neighbors AND the hub to m.
      val hubMin = large.groupBy("dst").agg(min(col("src")).as("m"))
      val next = large.join(hubMin, "dst")
        .select(col("m").as("src"), col("src").as("dst"))
        .unionByName(hubMin.select(col("m").as("src"), col("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      // Fixed point: the canonical edge set stopped changing. Count equality
      // plus one-sided difference proves set equality without a second
      // except pass (both sides are already materialized checkpoints).
      converged = next.count() == edges.count() &&
        next.exceptAll(edges).limit(1).isEmpty
      // The convergence probe was the last reader of the old edge set;
      // release its checkpoint blocks before the next round allocates more.
      releaseCheckpoint(edges)
      edges = next
      i += 1
    }
    if (!converged) {
      releaseCheckpoint(nodes)
      releaseCheckpoint(edges)
      throw new IllegalStateException(
        s"Dedup.clustersContract did not converge within $maxIter iterations " +
          "(expected O(log n) rounds; raise maxIter)")
    }
    // Fixed point is a star per component rooted at the minimum id: leaves
    // label as their root, roots (and isolated nodes) label as themselves.
    nodes
      .join(edges.select(col("dst").as("id"), col("src").as("c")), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("cluster"))
  }

  /**
   * Connected components with per-partition union-find pre-contraction —
   * same output contract as [[clusters]]/[[clustersContract]]: `(id,
   * cluster)` labeled with the component MINIMUM id, one row per node
   * appearing in ≥1 pair. Requires integral id columns (cast to long
   * internally; labels cast back).
   *
   * The iterative algorithms touch the FULL edge mass once per round —
   * O(rounds) shuffles of the largest frame in the job. This path touches it
   * exactly once: edges range-partition by `src`, and each partition runs an
   * in-memory min-rooted union-find (the genuinely per-partition imperative
   * case `mapPartitions` exists for). Every edge has both endpoints unioned
   * locally, so all surviving structure lives in nodes that appear in
   * MULTIPLE partitions: their per-partition roots must be glued, and that
   * contracted root graph — bounded by the number of cross-partition node
   * occurrences, typically orders of magnitude below |E| — goes to
   * [[clustersContract]] (O(log n) rounds on frames that are now tiny).
   * Labels read back through two small joins.
   *
   * Why RANGE partitioning: near-dup chains from incremental crawl shards
   * link numerically ADJACENT ids (docₙ ~ docₙ₊₁); range placement puts whole
   * chain segments in one partition where the union-find collapses them to
   * depth 1, leaving ≤ one cross-partition link per boundary. For unordered
   * topologies it is no worse than hash. Correctness never depends on the
   * placement — any partitioning yields the same labels — so RangePartitioner
   * sampling variance cannot perturb results.
   *
   * Per-partition memory is O(nodes in partition) hashmap entries; at fixed
   * executor memory the knob is shuffle width (more partitions → smaller
   * local graphs → more glue edges), degrading toward [[clustersContract]]'s
   * profile, never past it.
   */
  def clustersLocal(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val idType = pairs.schema("id_a").dataType
    val p = pairs.persist()
    val nodes = p.select(col("id_a").cast("long").as("id"))
      .unionByName(p.select(col("id_b").cast("long").as("id")))
      .distinct()
      .localCheckpoint()
    val edges = p
      .select(least(col("id_a"), col("id_b")).cast("long").as("src"),
        greatest(col("id_a"), col("id_b")).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val parts = spark.sessionState.conf.numShufflePartitions
    // (id → local component min) per (node, partition) occurrence.
    val mapping = edges
      .repartitionByRange(parts, col("src"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // Min-rooted union-find: the representative is always the set's
        // minimum element, so roots read off as local component minima with
        // no second pass. Path compression keeps chains amortized-constant.
        val parent = new java.util.HashMap[Long, java.lang.Long]()
        def find(x0: Long): Long = {
          var x = x0
          var px = parent.get(x)
          while (px != null && px.longValue != x) { x = px.longValue; px = parent.get(x) }
          var y = x0
          while (y != x) { val n = parent.get(y).longValue; parent.put(y, x); y = n }
          x
        }
        def union(a: Long, b: Long): Unit = {
          if (parent.get(a) == null) parent.put(a, a)
          if (parent.get(b) == null) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        it.foreach { case (s, d) => union(s, d) }
        val out = Vector.newBuilder[(Long, Long)]
        val keys = parent.keySet().iterator()
        // find() only rewrites values of existing keys (path compression) —
        // no structural modification, so iterating keySet is safe.
        while (keys.hasNext) { val k = keys.next(); out += ((k, find(k))) }
        out.result().iterator
      }
      .toDF("id", "root")
    val byId = mapping.groupBy("id")
      .agg(min(col("root")).as("root"), collect_set(col("root")).as("roots"))
      .localCheckpoint()
    p.unpersist()
    // From here on nodes/byId checkpoints are live; release them on EVERY
    // exit — clustersContract's maxIter fail-loud must not leak them to the
    // caller (clusters()/clustersContract() release on that path too).
    try {
      // Glue graph: for each multi-partition node, star its roots to their min.
      val glue = byId
        .where(size(col("roots")) > 1)
        .select(col("root").as("id_a"), explode(col("roots")).as("id_b"))
        .where(col("id_a") =!= col("id_b"))
      val rootLabels = clustersContract(glue, maxIter)
        .select(col("id").as("root"), col("cluster").as("root_cluster"))
      val labels = byId.select(col("id"), col("root"))
        .join(rootLabels, Seq("root"), "left")
        .select(col("id"), coalesce(col("root_cluster"), col("root")).as("cluster"))
      val out = nodes
        .join(labels, Seq("id"), "left")
        .select(col("id").cast(idType).as("id"),
          coalesce(col("cluster"), col("id")).cast(idType).as("cluster"))
        .localCheckpoint()
      // rootLabels' analyzed plan bottoms out in clustersContract's
      // internal checkpoint LogicalRDDs — release them too, or the
      // contraction's final-round blocks stay resident for the
      // application lifetime (the round-5 bench residue failure mode).
      releaseCheckpoint(rootLabels)
      out
    } finally {
      releaseCheckpoint(nodes)
      releaseCheckpoint(byId)
    }
  }

  /** Integral types [[clustersLocal]] accepts; anything else (string content
    * hashes as ids) routes to the order-generic strategies. The two columns
    * must also share ONE type: clustersLocal casts labels back to id_a's
    * type, and a mixed-width pair set (int id_a, long id_b) would silently
    * truncate id_b-derived labels — mixed widths route to the generic path,
    * whose least/greatest comparisons widen under Catalyst coercion. */
  private def integralIds(pairs: DataFrame): Boolean = {
    import org.apache.spark.sql.types._
    val integral = Seq("id_a", "id_b").forall(c => pairs.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    integral && pairs.schema("id_a").dataType == pairs.schema("id_b").dataType
  }

  /**
   * Strategy-selecting connected components. Integral ids — the common case —
   * take [[clustersLocal]]: one pass over the full edge mass, iteration only
   * on the contracted cross-partition root graph; safe on ANY topology (no
   * diameter fail-loud exists on this path). Non-integral ids fall back to
   * min-label propagation ([[clusters]], cheapest at diameter 2–3) with
   * large-star/small-star contraction ([[clustersContract]]) as the
   * always-terminating fallback beyond `propagationRounds`. The pair set is
   * persisted across attempts so the (expensive) candidate-generation
   * lineage is computed once, not once per strategy.
   */
  def clustersAuto(
      pairs: DataFrame, propagationRounds: Int = 8, maxIter: Int = 30): DataFrame = {
    val p = pairs.persist()
    try {
      if (integralIds(p)) clustersLocal(p, maxIter)
      else {
        try clusters(p, propagationRounds)
        catch {
          case _: IllegalStateException => clustersContract(p, maxIter)
        }
      }
    } finally p.unpersist() // all strategies return materialized checkpoints
  }

  /**
   * Keeps exactly one document per duplicate cluster (the minimum id);
   * documents appearing in no pair pass through untouched. The
   * chain-closing, detector-agnostic form of [[dropNearDuplicates]].
   * Uses [[clustersAuto]] — safe on any cluster topology (propagation fast
   * path, contraction fallback), so no input can hit a diameter fail-loud.
   */
  def dropDuplicateClusters(
      df: DataFrame, pairs: DataFrame, idCol: String, maxIter: Int = 30): DataFrame =
    df.join(
      clustersAuto(pairs, maxIter = maxIter)
        .where(col("id") =!= col("cluster"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /**
   * Quality-aware canonical survivor selection: keeps, per duplicate
   * cluster, the row MAXIMIZING `qualityCol` (ties broken by the minimum
   * id — fully deterministic), and drops every other cluster member;
   * documents appearing in no pair pass through untouched. This is the
   * policy production dedup actually wants — [[dropDuplicateClusters]]'s
   * min-id survivor is arbitrary, while "keep the longest / highest-quality
   * copy" preserves the best training signal per duplicate group (the
   * CCNet/RefinedWeb-style canonicalization step).
   *
   * Scale shape: every intermediate frame is proportional to the DUPLICATE
   * mass (pair members), never the corpus — the labels come from
   * [[clustersAuto]] over the pairs, quality is joined for member rows
   * only, the per-cluster survivor is one `min_by` hash aggregate (no
   * window, no per-cluster sort), and the corpus pays exactly one
   * anti-join against the loser id list. A null quality ranks BELOW every
   * non-null quality (it survives only in an all-null cluster, where the
   * min-id tie-break decides) — mirroring SQL `ORDER BY q DESC NULLS
   * LAST` so oracles replay the same survivor.
   */
  def keepBestInClusters(
      df: DataFrame, pairs: DataFrame, idCol: String, qualityCol: Column,
      maxIter: Int = 30): DataFrame = {
    val labels = clustersAuto(pairs, maxIter = maxIter)
      .withColumnRenamed("id", idCol)
    // nulls-last under the min_by asc ordering: null quality -> +inf key
    val qKey = negate(coalesce(qualityCol.cast("double"),
      lit(Double.NegativeInfinity)))
    val survivors = df
      .join(labels, Seq(idCol))
      .groupBy(col("cluster"))
      .agg(min_by(col(idCol), struct(qKey, col(idCol))).as(idCol))
      .select(idCol)
    val losers = labels.select(idCol).join(survivors, Seq(idCol), "left_anti")
    df.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Benchmark decontamination: exact-content overlap between a training
   * corpus and an evaluation set — `(corpus_id, eval_id)` for every pair
   * whose case/whitespace-normalized fingerprints collide. The join is an
   * equi-join on the md5 fingerprint (shuffle by hash, never all-pairs);
   * at 100 TB the eval side is typically small enough for AQE to broadcast.
   * Near-duplicate contamination composes from [[blockedNearDuplicates]] /
   * [[nearDuplicates]] over the unioned corpora; this is the exact tier
   * every decontamination pass runs first.
   */
  def crossContamination(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String): DataFrame =
    corpus
      .select(col(idCol).as("corpus_id"), TextOps.fingerprint(col(textCol)).as("_fp"))
      .join(
        evalSet.select(col(idCol).as("eval_id"), TextOps.fingerprint(col(textCol)).as("_fp")),
        "_fp")
      .select("corpus_id", "eval_id")

  /**
   * [[crossContamination]] with a Bloom-filter pre-filter on the corpus
   * side — the shape that matters at 100 TB, where the training corpus is
   * the full table scan and the eval set is a few thousand documents. A
   * Bloom filter over the eval fingerprints (built by a distributed
   * aggregate, sized from the eval count at `fpp`) is applied to every
   * corpus row BEFORE the shuffle, so only the ~fpp false-positive fraction
   * plus the true matches are ever hashed into the join exchange; the
   * equi-join then removes the false positives, making the RESULT exactly
   * [[crossContamination]]'s. This is the same plan Spark's own
   * InjectRuntimeFilter builds for selective joins, constructed explicitly
   * so the pushdown is guaranteed rather than cost-model-dependent.
   *
   * Driver traffic is one eval-side count and the serialized sketch
   * (`optimalNumOfBits(n, fpp)` bits ≈ 120 KB at n=100k, fpp=1%) — bounded
   * by the eval set, never the corpus. Fails loudly past Spark's
   * 67,108,864-bit aggregate cap (an eval set of ~7M items at 1% — far
   * beyond any benchmark suite) rather than silently degrading.
   *
   * Requires [[graft.GraftExtensions.register]] (the `bloom_build` /
   * `bloom_probe` bridges to Spark's native Bloom expressions).
   */
  def crossContaminationBloom(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.01): DataFrame = {
    val ev = evalSet
      .select(col(idCol).as("eval_id"), TextOps.fingerprint(col(textCol)).as("_fp"))
      .persist()
    try {
      val n = ev.count()
      if (n == 0) return crossContamination(corpus, evalSet, idCol, textCol)
      val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
      // Bounded collect: the sketch bytes only — the literal form
      // BloomFilterMightContain requires (a constant or scalar subquery).
      val sketch = ev
        .agg(call_function("bloom_build",
          xxhash64(col("_fp")), lit(n), lit(numBits)).as("bf"))
        .head().getAs[Array[Byte]](0)
      corpus
        .select(col(idCol).as("corpus_id"), TextOps.fingerprint(col(textCol)).as("_fp"))
        .where(call_function("bloom_probe", lit(sketch), xxhash64(col("_fp"))))
        .join(ev, "_fp")
        .select("corpus_id", "eval_id")
    } finally ev.unpersist()
  }

  /**
   * 32-bit SimHash sketch per document: each token's 32-bit hash votes
   * ±count on every bit position; the sketch keeps the sign. Documents
   * within a small Hamming distance are near-duplicates. Emitted as a long.
   *
   * Built with explode over (token-counts × 32 bit positions) + one grouped
   * conditional sum — all codegen'd, no UDF bit twiddling.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCounts = df
      .select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextOps.hash32(col("tok")))
    val bits = tokCounts.select(
      col("id"), col("cnt"), col("h"),
      explode(array((0 until 32).map(lit): _*)).as("j"))
    // Bit extraction via power-of-two division: h < 2^32 and 2^j are exact
    // doubles, and dividing by a power of two only shifts the exponent, so
    // (h / 2^j) is exact and the truncating long cast is a clean right-shift.
    val pow2j = pow(lit(2d), col("j")).cast("long")
    bits
      .withColumn(
        "vote",
        when((col("h") / pow2j).cast("long") % 2 === 1, col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy("id", "j")
      .agg(sum(col("vote")).as("v"))
      .groupBy("id")
      .agg(sum(when(col("v") > 0, pow(lit(2d), col("j")).cast("long")).otherwise(0L))
        .as("simhash"))
  }

  /** [[simhash]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.Simhash32]]) — same sketch, zero
    * shuffles (the aggregate form pays THREE: token counts, bit votes,
    * final sketch — all for a pure per-document function). Requires
    * [[graft.GraftExtensions.register]]. */
  def simhashNative(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // null-text docs drop entirely (explode skips null arrays in the
    // aggregate form — keep the 'same sketch' equivalence exact)
    df.where(col(textCol).isNotNull).select(
      col(idCol).as("id"),
      call_function("simhash32", TextOps.tokens(col(textCol))).as("simhash"))

  /**
   * 64-bit SimHash sketch per document — [[simhash]] widened to the first 8
   * md5 digest bytes in the [[graft.expressions.MinhashSigs.hash64]]
   * split-halves layout (bit j<32 from hex chars 1–8, bit 32+j from chars
   * 9–16, each an unsigned 32-bit value — both halves stay oracle-
   * expressible in signed BIGINT arithmetic). Twice the signal bits makes
   * random sketch collisions negligible and enables the 16-bit-band
   * blocking of [[simhashNearDuplicates64]].
   *
   * Aggregate formulation (explode + grouped sums, all codegen'd) — the
   * oracle-parity reference for [[simhashNative64]]; prefer the native
   * kernel in production, this pays three exchanges per corpus pass.
   */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCounts = df
      .select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo", TextOps.hash32(col("tok")))
      .withColumn("hi", conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long"))
    val bits = tokCounts.select(
      col("id"), col("cnt"), col("lo"), col("hi"),
      explode(array((0 until 64).map(lit): _*)).as("j"))
    // Bit j of the 64-bit hash = bit j of `lo` for j<32, bit j-32 of `hi`
    // otherwise; each half is < 2^32 so the power-of-two-division trick from
    // [[simhash]] stays exact.
    val half = when(col("j") < 32, col("lo")).otherwise(col("hi"))
    val pos = when(col("j") < 32, col("j")).otherwise(col("j") - 32)
    val pow2 = pow(lit(2d), pos).cast("long")
    bits
      .withColumn(
        "vote",
        when((half / pow2).cast("long") % 2 === 1, col("cnt")).otherwise(-col("cnt")))
      .groupBy("id", "j")
      .agg(sum(col("vote")).as("v"))
      // shiftleft wraps at j=63 (1L<<63 = Long.MinValue), which IS the
      // two's-complement value of sketch bit 63 — the sum of distinct signed
      // bit values reconstructs the sketch exactly, no overflow possible.
      .groupBy("id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** [[simhash64]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.Simhash64]]) — same sketch, zero
    * shuffles. Requires [[graft.GraftExtensions.register]]. */
  def simhashNative64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // null-text docs drop entirely (explode skips null arrays in the
    // aggregate form — keep the 'same sketch' equivalence exact)
    df.where(col(textCol).isNotNull).select(
      col(idCol).as("id"),
      call_function("simhash64", TextOps.tokens(col(textCol))).as("simhash"))

  /**
   * Near-duplicate benchmark decontamination — the tier above
   * [[crossContamination]]'s exact-fingerprint match: an eval document
   * CONTAINED in a (possibly much longer) training document leaks the
   * benchmark even though normalized-content equality and whole-document
   * Jaccard both miss it. Winnowing fingerprints of both sides equi-join
   * on fp (candidates ∝ shared window minima, never all-pairs); score =
   * `shared / |eval fps|` — eval-side containment, ~1.0 when the eval
   * text sits anywhere inside the training document. Requires
   * [[graft.GraftExtensions.register]].
   */
  /**
   * Fuzzy duplicate pairs by EDIT DISTANCE — the entity-resolution join
   * ("Acme Corp" vs "Acme Corp.", vendor/author normalization) the
   * shingle-based family can't do: Jaccard on word shingles is blind to
   * single-character edits inside a token. Returns every id pair whose
   * strings are within `maxDist` Levenshtein edits, with the exact
   * distance: `(id_a, id_b, s_a, s_b, dist)`, `id_a < id_b`.
   *
   * Never an all-pairs join — ED-Join-style PREFIX FILTERING:
   *  1. Strings are padded with q−1 sentinels and cut into positional
   *     q-grams; duplicate grams get occurrence indices, so the gram
   *     multiset becomes a SET of (gram, occ) tokens and one edit disturbs
   *     at most `q` tokens (Gravano et al.'s count bound).
   *  2. Distance ≤ d therefore implies token overlap ≥ max(|A|,|B|) − q·d,
   *     and by the AllPairs prefix theorem the (q·d + 1) globally-RAREST
   *     tokens of each string (ties by token, deterministic) must
   *     intersect. Candidates come from an equi-join of those PREFIX
   *     posting lists only — the hot "every vendor shares this substring"
   *     gram is frequent, lands outside every prefix, and never generates
   *     a pair (the blocking-skew failure mode of plain gram joins).
   *  3. Survivors pass a length-band filter and the banded-DP
   *     `levenshtein(s_a, s_b, maxDist)` verify (O(d·n) per pair, −1
   *     above threshold) — only candidates ever pay it.
   *
   * Cost: one tokenize pass, one vocabulary-sized frequency aggregate
   * joined back (AQE broadcasts it), one per-string top-(q·d+1) window,
   * one posting-list pair generation ([[candidatePairs]] machinery, with
   * its occupancy cap available for adversarial prefix-token skew), one
   * verify join.
   *
   * `maxDist ≤ 1` routes to the TIGHTER deletion-neighborhood blocking
   * ([[editDistancePairsDel1]] — SymSpell's observation): candidates
   * there are provably within distance 2, an order of magnitude fewer
   * than the gram-prefix candidates on low-entropy corpora (measured
   * 0.29M vs 3.0M on 15k near-identical names). The gram-prefix path is
   * the general-`d` engine.
   */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, q: Int = 3,
      maxOccupancy: Int = Int.MaxValue): DataFrame =
    verifyEditDistance(
      editDistanceCandidates(df, idCol, strCol, maxDist, q, maxOccupancy), maxDist)

  /** Candidate generation for [[editDistancePairs]]: `(id_a, id_b, s_a,
    * s_b)` with id_a < id_b — deletion-neighborhood blocking at d ≤ 1,
    * gram-prefix + short-string recovery beyond. */
  private def editDistanceCandidates(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int, maxOccupancy: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    if (maxDist <= 1) return editDistanceCandidatesDel1(df, idCol, strCol, maxOccupancy)
    val prefixLen = q * maxDist + 1
    val pad = "\u0001" * (q - 1)
    val rows = df.where(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .localCheckpoint() // fans into tokens, shorts, and both verify joins
    // occurrence indexing is ROW-LOCAL (occ of gram i = 1 + equal grams
    // before position i): O(L^2) per string but ZERO shuffles - the right
    // trade for the short-string domain (names, vendors) this operator
    // targets, where L is tens of characters and the corpus is what's big
    val tokens = rows
      .withColumn("_p", concat(lit(pad), col("s"), lit(pad)))
      .withColumn("_g", transform(
        sequence(lit(1), length(col("s")) + lit(q - 1)),
        i => col("_p").substr(i, lit(q))))
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("_g"))),
        i => concat_ws("\u0002",
          element_at(col("_g"), i),
          (size(filter(slice(col("_g"), lit(1), i - 1),
            x => x === element_at(col("_g"), i))) + 1).cast("string")))).as("tok"))
      .localCheckpoint() // O(L^2) tokenize pass runs ONCE, not per consumer
    val freq = tokens.groupBy("tok").agg(count(lit(1)).as("_f"))
    val prefixes = tokens.join(freq, "tok")
      .withColumn("_rk",
        row_number().over(Window.partitionBy("id").orderBy(col("_f"), col("tok"))))
      .where(col("_rk") <= prefixLen)
      .select(lit(0).as("band"), col("tok").as("band_key"), col("id"))
    // SHORT-STRING completeness: the prefix theorem needs a required
    // overlap t = max(|A|,|B|) - q*d >= 1; when BOTH strings carry at most
    // q*d tokens (length <= q*(d-1)+1) a within-distance pair may share NO
    // gram at all and the prefix join misses it (caught by the
    // brute-force property test). Those pairs are recovered through
    // generalized deletion neighborhoods (up to d deletions - tiny sets
    // at these lengths); short-vs-LONG pairs keep t >= 1 and stay with
    // the prefix join.
    val shortLen = q * (maxDist - 1) + 1
    val shorts = rows.where(length(col("s")) <= shortLen)
    val shortVariants = (1 to maxDist).foldLeft(array(col("s"))) { (vs, _) =>
      array_distinct(concat(vs, flatten(transform(vs, v => delOnce(v)))))
    }
    val shortBands = shorts.select(
      lit(0).as("band"), explode(shortVariants).as("band_key"), col("id"))
    candidatePairs(prefixes, maxOccupancy)
      .unionByName(candidatePairs(shortBands, maxOccupancy))
      .distinct()
      .join(rows.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(rows.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .select("id_a", "id_b", "s_a", "s_b")
  }

  /** Banded-DP verification over a candidate frame `(id_a, id_b, s_a,
    * s_b)` — shared by both blocking strategies. */
  private def verifyEditDistance(cands: DataFrame, maxDist: Int): DataFrame =
    cands
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b", "dist")

  /**
   * Blocking diagnostics for [[editDistancePairs]] — the "no silent caps"
   * companion ([[lshOccupancyStats]] discipline): one row
   * `(n_candidates, n_pairs, efficiency)` quantifying how much
   * levenshtein work the candidate generation admits per true pair.
   * Efficiency near 1 means the blocking is doing the work; a collapse
   * toward 0 on a new corpus is the signal to raise `q`, lower
   * `maxOccupancy`, or pre-normalize keys.
   */
  def editDistanceBlockingStats(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, q: Int = 3,
      maxOccupancy: Int = Int.MaxValue): DataFrame = {
    val cands = editDistanceCandidates(df, idCol, strCol, maxDist, q, maxOccupancy)
      .localCheckpoint() // feeds both counts — one generation pass
    val verified = verifyEditDistance(cands, maxDist)
    cands.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(verified.agg(count(lit(1)).as("n_pairs"))))
      .select(col("n_candidates"), col("n_pairs"),
        round(col("n_pairs").cast("double") /
          greatest(col("n_candidates"), lit(1L)).cast("double"), 6).as("efficiency"))
  }

  /**
   * Deletion-neighborhood (SymSpell-style) candidate generation for
   * `maxDist <= 1` -- the tight fast path [[editDistancePairs]] routes to:
   * two strings within ONE edit must share a member of their deletion
   * neighborhoods {s} UNION { s minus one character }, so blocking on
   * those L+1 variants yields candidates that are PROVABLY within
   * distance 2 (sharing a variant bounds the distance by one deletion
   * each side) -- measured on the 15k-name synthetic corpus: 0.29M
   * candidates vs the gram-prefix path's 3.0M for 0.26M true pairs.
   * Variant count per string is L+1 (vs the gram path's fixed q*d+1
   * prefix), the right trade at d=1 for the tens-of-characters strings
   * this operator targets; for d >= 2 the neighborhood explodes
   * combinatorially and the gram-prefix filter takes over.
   */
  /** All single-character deletions of `c` (the string itself excluded);
    * the empty string has none. Guarded: sequence(1, 0) would generate a
    * DESCENDING range. */
  private def delOnce(c: Column): Column =
    when(length(c) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))

  private def editDistanceCandidatesDel1(
      df: DataFrame, idCol: String, strCol: String,
      maxOccupancy: Int): DataFrame = {
    val rows = df.where(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    // {s} ++ one-char deletions; sequence(1, 0) would generate DESCENDING
    // for the empty string, hence the guard
    val variants = when(length(col("s")) === 0, array(col("s")))
      .otherwise(concat(
        array(col("s")),
        transform(sequence(lit(1), length(col("s"))),
          i => concat(
            col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s")))))))
    val bands = rows.select(explode(variants).as("band_key"), col("id"), col("s"))
    // candidatePairs with the STRING carried in the posting payload: pairs
    // emerge join-free (the generic path pays two join-backs to recover
    // strings; here a posting is <= maxOccupancy structs of ~L chars, so
    // carrying the payload through the explode is cheaper than two
    // shuffles of the candidate set). sort_array orders by the leading
    // struct field -> id_a < id_b, as in candidatePairs.
    val cands = bands
      .groupBy("band_key")
      .agg(array_distinct(sort_array(collect_list(struct(col("id"), col("s"))))).as("xs"))
      .where(size(col("xs")) > 1 && size(col("xs")) <= maxOccupancy)
      .select(posexplode(col("xs")).as(Seq("i", "a")), col("xs"))
      .select(col("a"),
        explode(expr("slice(xs, i + 2, size(xs) - i - 1)")).as("b"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct()
    cands
  }

  def overlapContamination(
      corpus: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3, w: Int = 4): DataFrame = {
    val cf = TextOps.winnowNative(corpus, idCol, textCol, n, w)
      .select(col("fp"), col("id").as("corpus_id"))
    // materialized once: ef feeds both the per-doc counts and the fp join,
    // and the eval winnow lineage would otherwise compute twice (same
    // multiply-referenced-lineage medicine as verifyJaccard)
    val ef = TextOps.winnowNative(evalSet, idCol, textCol, n, w).localCheckpoint()
    val en = ef.groupBy("id").agg(count(lit(1)).as("n_eval"))
    val shared = cf
      .join(ef.select(col("fp"), col("id").as("eval_id")), "fp")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(en.select(col("id").as("eval_id"), col("n_eval")), "eval_id")
      .select(col("corpus_id"), col("eval_id"),
        (col("shared").cast("double") / col("n_eval")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /**
   * Per-eval-document CONTAMINATION REPORT — the artifact an eval-suite
   * owner actually reads: one row per eval doc (INCLUDING clean ones, the
   * half a pair list silently omits) with its worst corpus containment
   * and how many corpus documents sit at or above the gate. `max_containment`
   * below `threshold` but well above zero is the actionable middle band a
   * pair feed filtered at the gate never surfaces. Same fingerprint
   * machinery and join mass as [[overlapContamination]] (the gate filters
   * after the per-pair aggregate, so scoring every sharing pair costs
   * nothing extra); eval docs too short to fingerprint report clean —
   * UNDETECTABLE by this tier, not certified absent (use the exact tier
   * for those).
   */
  def contaminationReport(
      corpus: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3, w: Int = 4): DataFrame = {
    val pairs = overlapContamination(
      corpus, evalSet, idCol, textCol, threshold = 0.0, n = n, w = w)
    evalSet.select(col(idCol).as("eval_id"))
      .join(pairs, Seq("eval_id"), "left")
      .groupBy("eval_id")
      .agg(
        round(max(coalesce(col("containment"), lit(0.0))), 6)
          .as("max_containment"),
        sum(when(col("containment") >= threshold, 1L).otherwise(0L))
          .as("n_contaminating"))
      .withColumn("contaminated", col("n_contaminating") > 0)
  }

  /**
   * Containment / partial-overlap detection over winnowing fingerprints
   * ([[TextOps.winnow]] / [[TextOps.winnowNative]] `(id, fp)` rows):
   * candidate pairs share ≥ 1 fingerprint — an equi-join on `fp`, so
   * documents with no common window minimum never pair — scored as
   * `shared / min(|fps_a|, |fps_b|)`, which is ~1.0 when the smaller
   * document's fingerprints sit inside the larger's (prefix copies,
   * quotations, template reuse). The asymmetric denominator is exactly
   * what Jaccard-style dedup lacks: a half-document contained in its
   * full document scores ~1.0 here but only ~0.5 Jaccard, below every
   * sane near-dup threshold.
   *
   * Scale: the fp self-join shuffles fingerprint rows (docs × fps/doc),
   * never all-pairs. Ubiquitous fingerprints (site boilerplate) inflate
   * join buckets quadratically while carrying no discriminative signal —
   * run [[TextOps]] boilerplate removal first, or set `maxDocFreq` to
   * drop fingerprints appearing in more than that many documents. The cap
   * filters BOTH the join and the per-doc denominators, so scores stay
   * "containment over non-ubiquitous fingerprints" (consistent, and a
   * document consisting solely of boilerplate simply drops out).
   */
  def containment(
      fps: DataFrame, threshold: Double,
      maxDocFreq: Option[Long] = None): DataFrame = {
    // Dedup (id, fp) pairs ONCE at entry: callers may feed rows that repeat
    // a pair (e.g. unioned per-shard winnow outputs), and a repeated pair
    // would multiply `shared` quadratically (dup_a × dup_b through the
    // self-join) while the denominators grow only linearly — containment
    // could exceed 1.0 and spurious pairs could cross the threshold.
    val uniq = fps.select("id", "fp").distinct()
    val base = maxDocFreq match {
      case Some(cap) =>
        val ubiquitous = uniq.groupBy("fp")
          .agg(count(lit(1)).as("_df"))
          .where(col("_df") > cap)
          .select("fp")
        uniq.join(ubiquitous, Seq("fp"), "left_anti")
      case None => uniq
    }
    val counts = base.groupBy("id").agg(count(lit(1)).as("n"))
    val shared = base.select(col("fp"), col("id").as("id_a"))
      .join(base.select(col("fp"), col("id").as("id_b")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") / least(col("n_a"), col("n_b"))).as("containment"))
      .where(col("containment") >= threshold)
  }

  /**
   * Exact-substring (span-level) deduplication — the Lee et al. 2021
   * ("Deduplicating Training Data Makes Language Models Better",
   * arXiv:2107.06499) ExactSubstr operation, re-expressed relationally:
   * document-LEVEL dedup keeps near-identical pages apart, but memorized
   * boilerplate — license headers, navigation chrome, templated
   * paragraphs — recurs INSIDE otherwise-distinct documents, and span
   * dedup is what removes it. Every `n`-token window whose exact content
   * occurs more than once in the corpus (across documents or repeated
   * within one) is boilerplate by definition here; all tokens covered by
   * any duplicated window are cut from every document, and the text is
   * rebuilt from the survivors.
   *
   * The reference implementation uses a corpus-wide suffix array — a
   * sequential construction that does not distribute. The relational
   * form: window-hash → global occurrence count → per-doc island merge of
   * duplicated window starts → covered-position marks → anti-join rebuild.
   * Cost is one shuffle of the window-hash mass (tokens × 1 rows — each
   * position starts one window), one of the duplicated window STARTS
   * (1 row per occurrence — overlapping windows coalesce into [start, end]
   * islands per document before any position is generated, so the
   * covered-position mass is O(covered tokens), never n× it), and the
   * rebuild's per-document aggregation; no self-join ever materializes
   * pairs of occurrences, so a window occurring k times costs k rows,
   * not k². Window hashes are the
   * engine-standard md5-derived 32-bit values over the space-joined
   * window ([[TextOps.hash32]] semantics) — deterministic, and exactly
   * replayable by the DuckDB oracle.
   *
   * Removal is aggressive by contract (EVERY occurrence is cut, no
   * canonical survivor) — right for boilerplate; for cross-document
   * quotation dedup use [[exactSubstringDedupKeepFirst]], which keeps one
   * deterministic survivor per duplicated window. Hash collisions
   * (32-bit) can spuriously merge distinct windows at ~N²/2³² odds — the
   * standard trade, same as the fingerprint operators.
   *
   * Returns `(id, text_clean, n_tokens, n_kept)` for documents with ≥1
   * surviving token (fully-boilerplate documents drop out — which IS the
   * curation signal).
   */
  def exactSubstringDedup(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val toks = spanTokens(df, idCol, textCol)
    val wins = spanWins(toks, n)
    // duplicated = total occurrence count > 1 (within- or cross-document)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("c")).where(col("c") > 1).select("h")
    spanCutRebuild(toks, wins.join(dup, "h").select(col("id"), col("p")), n)
  }

  /**
   * KEEP-ONE exact-substring dedup — the Lee et al. keep-a-canonical-
   * occurrence policy (their public ExactSubstr tooling removes all
   * later occurrences, keeping the first): per duplicated window HASH,
   * the lexicographically first occurrence by `(id, p)` SURVIVES and
   * every other occurrence is cut. Right for cross-document quotation /
   * shared-paragraph dedup, where the remove-all contract
   * ([[exactSubstringDedup]] — correct for boilerplate) would delete the
   * canonical copy too.
   *
   * The survivor rule is deterministic and engine-replayable: a
   * `row_number` over `(id, p)` within each hash — one exchange of the
   * duplicated-occurrence mass (1 row per occurrence), then the same
   * island cut + rebuild. Overlapping-span interaction, stated plainly:
   * survival is per-WINDOW — a surviving window's tokens can still be cut
   * where a DIFFERENT duplicated window covering them lost its own
   * tie-break (the inherent window-granularity trade; Lee et al.'s
   * byte-range form has the same property at range granularity). What IS
   * guaranteed: every cut position of this variant is also cut by
   * remove-all (survivors only shrink the cut set — spec-pinned), and for
   * a window duplicated k times exactly k−1 occurrences are cut.
   *
   * Same output shape as [[exactSubstringDedup]]; documents whose every
   * token sat under losing occurrences drop out.
   */
  def exactSubstringDedupKeepFirst(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val toks = spanTokens(df, idCol, textCol)
    val wins = spanWins(toks, n)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("c")).where(col("c") > 1).select("h")
    val byHash = Window.partitionBy("h").orderBy(col("id"), col("p"))
    val losers = wins.join(dup, "h")
      .withColumn("_rn", row_number().over(byHash))
      .where(col("_rn") > 1)
      .select(col("id"), col("p"))
    spanCutRebuild(toks, losers, n)
  }

  /**
   * Memorization-risk profile — the diagnostic twin of the span-dedup
   * family (Lee et al. 2021 §5; Carlini et al. 2022, arXiv:2202.07646,
   * tie memorization odds to duplicated-sequence length): per document,
   * how much of it is corpus-duplicated text, and how LONG the worst run
   * is. Returns `(id, n_tokens, max_dup_span, dup_tokens)` for every
   * non-null-text document — `dup_tokens` is the count of tokens covered
   * by at least one duplicated `n`-window, `max_dup_span` the length of
   * the longest contiguous covered run (0 when nothing is duplicated).
   * This is the triage view a curation pipeline ranks by BEFORE deciding
   * between [[exactSubstringDedup]]'s cut and dropping the document
   * outright.
   *
   * Same cost shape as the dedup itself minus the rebuild: one window-hash
   * exchange, one duplicated-START exchange (1 row per occurrence — the
   * gap-and-island merge makes covered mass O(islands), positions are
   * never generated at all: each island's length is `max(p)−min(p)+n`
   * directly), one per-doc aggregate.
   */
  def memorizationProfile(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val toks = spanTokens(df, idCol, textCol).where(col("t").isNotNull)
    val wins = spanWins(toks, n)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("c")).where(col("c") > 1).select("h")
    val byDoc = Window.partitionBy("id").orderBy("p")
    val islands = wins.join(dup, "h").select(col("id"), col("p"))
      .withColumn("_new",
        when(col("p") - lag("p", 1).over(byDoc) > n, 1).otherwise(0))
      .withColumn("_island", sum("_new").over(byDoc))
      .groupBy("id", "_island")
      .agg((max(col("p")) - min(col("p")) + lit(n)).cast("long").as("_len"))
      .groupBy("id")
      .agg(max(col("_len")).as("max_dup_span"), sum(col("_len")).as("dup_tokens"))
    toks.select(col("id"), size(col("t")).cast("long").as("n_tokens"))
      .join(islands, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("max_dup_span"), lit(0L)).as("max_dup_span"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** `(id, t: array<string>)` token frames for the span-dedup family. */
  private def spanTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))

  /** One row per n-token window start: `(id, p, h)` — p 1-based, h the
    * ROLLING double-polynomial window hash
    * ([[graft.expressions.DocKernels.SpanWinHashes]] — one md5 per TOKEN
    * plus O(1) integer work per window, replacing the former md5 of each
    * space-joined window string whose hashed byte volume was O(tokens·n);
    * the packed 62-bit value also collides less than the 32-bit md5
    * prefix it replaces). Re-keying note: window hash VALUES changed in
    * round 12 — a pre-round-12 [[substringWindowCounts]] store must be
    * regenerated; the oracles replay the polynomial term-by-term. */
  private def spanWins(toks: DataFrame, n: Int): DataFrame = {
    graft.GraftExtensions.register(toks.sparkSession)
    toks.select(col("id"),
        posexplode(call_function("span_win_hashes", col("t"), lit(n))).as(Seq("_p0", "h")))
      .select(col("id"), (col("_p0") + 1).as("p"), col("h"))
  }

  /** Shared cut + rebuild: `dupStarts` is `(id, p)` — the duplicated
    * window occurrences to remove from each document.
    *
    * Coalesces duplicated windows into per-document [start, end] islands
    * BEFORE generating covered positions. Overlapping/adjacent windows are
    * the common case (a duplicated run of length L starts L-n+1 windows,
    * every one of them duplicated), so exploding each window's n positions
    * and `distinct()`-ing — the round-9 plan — shuffled ~n× the duplicated
    * -window mass only to collapse it again. Gap-and-island instead: one
    * exchange of the duplicated window STARTS (1 row per occurrence, not
    * n), a per-doc sort, islands split where the next start clears the
    * previous window's coverage (p - prev_p > n), then positions are
    * generated from the merged ranges — disjoint by construction, so no
    * distinct. At ExactSubstr's canonical n=50 on a boilerplate-heavy
    * corpus this is the difference between shuffling 50× the dup mass and
    * shuffling it once. */
  private def spanCutRebuild(toks: DataFrame, dupStarts: DataFrame, n: Int): DataFrame = {
    val byDoc = Window.partitionBy("id").orderBy("p")
    // per-doc [start, end] cut islands, collected to ONE array row per doc
    // — the frame is duplicated-island-sized, never token-sized
    val islands = dupStarts
      .withColumn("_new",
        when(col("p") - lag("p", 1).over(byDoc) > n, 1).otherwise(0))
      .withColumn("_island", sum("_new").over(byDoc))
      .groupBy("id", "_island")
      .agg(min("p").as("s"), (max("p") + lit(n - 1)).as("e"))
      .groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("_cuts"))
    // Rebuild WITHOUT exploding the corpus (the round-12 shuffle cut —
    // formerly every token moved through a (id, pos) anti-join exchange
    // plus a collect_list re-assembly sort): one id-keyed join of the
    // token frames against the island arrays (cut docs ≪ corpus → AQE
    // broadcasts the island side), then a per-row position-aware HOF
    // filter keeps tokens outside every island. Tokens never shuffle;
    // islands per doc are disjoint and few (they merged overlaps), so the
    // per-token exists() scan is O(islands), not O(cuts).
    toks.join(islands, Seq("id"), "left")
      .select(
        col("id"),
        filter(col("t"), (tok, i) =>
          coalesce(
            !exists(col("_cuts"), c =>
              (i + 1) >= c.getField("s") && (i + 1) <= c.getField("e")),
            lit(true))).as("_kept"),
        size(col("t")).cast("long").as("n_tokens"))
      .where(size(col("_kept")) > 0)
      .select(
        col("id"),
        array_join(col("_kept"), " ").as("text_clean"),
        col("n_tokens"),
        size(col("_kept")).cast("long").as("n_kept"))
  }

  /**
   * The window-hash store behind [[exactSubstringDedupIncremental]]: one
   * row per distinct `n`-token window hash with its total occurrence
   * count, `(h, c)`. The continuous-ingest contract mirrors
   * [[seenFingerprints]]: persist the counts at ingest time and MAINTAIN
   * them by addition — counts of the next batch's windows sum onto the
   * stored rows (`union → groupBy(h).sum(c)`, or a [[ManifestStore]]
   * upsert keyed on a hash prefix) — so the accumulated corpus is NEVER
   * re-tokenized or rescanned. The store is two longs per distinct window
   * — the corpus's token mass compressed to its distinct-window skeleton.
   */
  def substringWindowCounts(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    spanWins(spanTokens(df, idCol, textCol), n)
      .groupBy("h").agg(count(lit(1)).as("c"))
  }

  /**
   * Incremental (batch-over-store) exact-substring dedup — the continuous
   * -ingest form of [[exactSubstringDedup]], the way [[exactIncremental]]
   * extends [[exact]]: a window in the NEW batch is boilerplate when its
   * total occurrence count across store ∪ batch exceeds one, i.e.
   * `c_batch(h) + c_seen(h) > 1`. Exactly the batch operator's decision
   * over the concatenated corpus — LlmOpsSpec pins
   * `incremental(batch, counts(corpus)) ≡ batch(corpus ∪ batch) ↾ batch`
   * — without touching corpus text: cost is the batch's own window mass
   * plus ONE equi-join against the `(h, c)` store (batch ≪ store → AQE
   * broadcasts the batch side; either way no corpus rescan, no pairs).
   *
   * Same aggressive-removal contract as the batch form, applied to the
   * batch's documents only: stored documents were themselves cut at their
   * own ingest time against the store as of then — the streaming
   * approximation; a window first duplicated by a LATER batch is cut from
   * that batch onward, not retroactively.
   */
  def exactSubstringDedupIncremental(
      batch: DataFrame, seen: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    require(seen.columns.contains("h") && seen.columns.contains("c"),
      "seen must carry (h, c) window-hash counts — see substringWindowCounts")
    val toks = spanTokens(batch, idCol, textCol)
    val wins = spanWins(toks, n)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("_cb"))
      .join(seen.select(col("h"), col("c").as("_cs")), Seq("h"), "left")
      .where(col("_cb") + coalesce(col("_cs"), lit(0L)) > 1)
      .select("h")
    spanCutRebuild(toks, wins.join(dup, "h").select(col("id"), col("p")), n)
  }

  // -------------------------------------------------------------------------
  // PERSISTED window-count store — the concrete form of the persistence
  // contract [[substringWindowCounts]] documents (round 12, completing the
  // persisted-incremental family beside [[MinhashIndex]] and the lexical /
  // ANN stores): the `(h, c)` skeleton lives as a [[ManifestStore]] table
  // partitioned by an 8-bit hash prefix, counts MAINTAINED BY ADDITION at
  // each append, so continuous span dedup never re-tokenizes a byte of
  // the accumulated corpus. Window length `n` is pinned in a versioned
  // meta file — an append with mismatched windows would silently corrupt
  // every count, so it fails loud instead. Single-writer contract per
  // store (the additive read-modify-write is not concurrency-safe; the
  // same contract every sketch ledger in this engine carries).
  // -------------------------------------------------------------------------

  private val SpanStorePrefix = "_span"
  private val SpanHashParts = 64

  private def spanMetaN(spark: org.apache.spark.sql.SparkSession, dir: String): Int =
    ManifestStore.readVersioned(spark, dir, SpanStorePrefix)
      .map(_._2.trim.stripPrefix("n\t").toInt)
      .getOrElse(throw new IllegalStateException(
        s"no committed window-count store under $dir"))

  private def withHashPart(counts: DataFrame): DataFrame =
    counts.withColumn("hp", pmod(col("h"), lit(SpanHashParts)).cast("string"))

  /** Whether a window-count store has been fully bootstrapped (data AND
    * pinned meta) under `storeDir` — the reader's own predicate, so a
    * bootstrap-once guard built on it self-heals after a crash between
    * the data upsert and the meta commit. */
  def spanStoreCommitted(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): Boolean =
    ManifestStore.readVersioned(spark, storeDir, SpanStorePrefix).isDefined

  /** The window length pinned in a committed store's meta — callers
    * configured with their own `n` (e.g. a stream) verify against it
    * instead of silently counting different windows. */
  def spanStoreWindow(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): Int =
    spanMetaN(spark, storeDir)

  /** Bootstrap the persisted store from an initial corpus. Fails loud on
    * an already-committed store (a re-bootstrap with a different corpus
    * would leave stale counts for hashes absent from the new one — wipe
    * the dir or keep appending instead). */
  def writeWindowCounts(
      df: DataFrame, storeDir: String, idCol: String, textCol: String,
      n: Int, tag: Option[String] = None): Unit = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val spark = df.sparkSession
    require(ManifestStore.readVersioned(spark, storeDir, SpanStorePrefix).isEmpty,
      s"window-count store already committed under $storeDir — use " +
        "exactSubstringDedupIncrementalIndexed to append")
    // a tagged bootstrap whose data upsert landed but whose meta commit
    // crashed replays HERE (spanStoreCommitted reads the meta): the tag
    // skips the data re-add and only the meta commit re-runs
    ManifestStore.upsert(
      withHashPart(substringWindowCounts(df, idCol, textCol, n)),
      storeDir, "hp", Seq("hp", "h"), spark, tag)
    ManifestStore.commitVersioned(spark, storeDir, SpanStorePrefix, 1L, s"n\t$n\n")
  }

  /** The committed `(h, c)` frame (for composing with
    * [[exactSubstringDedupIncremental]] directly). */
  def readWindowCounts(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame = {
    spanMetaN(spark, storeDir) // fail loud before the first commit
    ManifestStore.currentFrame(spark, storeDir, "hp")
      .map(_.select("h", "c"))
      .getOrElse(throw new IllegalStateException(
        s"no committed window-count store under $storeDir"))
  }

  /**
   * One-call continuous-ingest step: dedup `batch` against the persisted
   * counts (exactly [[exactSubstringDedupIncremental]]'s math — shares
   * its oracle), then fold the batch's OWN window counts into the store
   * by addition (only the batch's hashes are read back and re-written;
   * untouched rows carry over inside their partitions). Returns the
   * cleaned batch, materialized before the commit.
   *
   * `tag` makes the count fold IDEMPOTENT under at-least-once replay
   * (round 15 — closing the additive-fold honesty caveat): a tag already
   * in the store's manifest — committed atomically with the fold it marks
   * — skips the re-add AND re-derives the ORIGINAL cleaned output from
   * the store alone. Equivalence: the original cut condition was
   * `c_batch(h) + c_storeBefore(h) > 1`; after the fold the store holds
   * exactly `c_storeBefore + c_batch`, so on replay the condition is
   * simply `c_store(h) > 1` over the batch's windows. Without the tag, a
   * crash-replayed micro-batch re-adds its counts — every one of its
   * windows then totals ≥ 2 against the store and the whole batch would
   * be cut from the replayed `onClean` output, while future occurrences
   * of its windows over-cut forever.
   */
  def exactSubstringDedupIncrementalIndexed(
      batch: DataFrame, storeDir: String, idCol: String,
      textCol: String, tag: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    val n = spanMetaN(spark, storeDir)
    val seen = readWindowCounts(spark, storeDir)
    if (tag.exists(t => ManifestStore.hasTag(spark, storeDir, t))) {
      // replayed batch: counts already folded — cut against store totals
      val toks = spanTokens(batch, idCol, textCol)
      val wins = spanWins(toks, n)
      val dup = wins.select("h")
        .join(seen.where(col("c") > 1).select("h"), Seq("h"), "left_semi")
        .distinct()
      return spanCutRebuild(
        toks, wins.join(dup, "h").select(col("id"), col("p")), n)
    }
    val cleaned =
      exactSubstringDedupIncremental(batch, seen, idCol, textCol, n)
        .localCheckpoint()
    val bc = substringWindowCounts(batch, idCol, textCol, n)
    val summed = bc
      .join(seen.select(col("h"), col("c").as("_c0")), Seq("h"), "left")
      .select(col("h"), (col("c") + coalesce(col("_c0"), lit(0L))).as("c"))
    ManifestStore.upsert(
      withHashPart(summed), storeDir, "hp", Seq("hp", "h"), spark, tag)
    cleaned
  }

  // -------------------------------------------------------------------------
  // PERSISTED line-hash store — the concrete form of the persistence
  // contract [[seenLineHashes]] documents: the distinct line hashes live
  // as a [[ManifestStore]] table partitioned by the hash prefix mod 64
  // (matching the window-count store's width — at toy scale the serve-time
  // read is directory-listing-bound, so partition count is the knob),
  // appends upsert only the batch's distinct hashes (idempotent —
  // a re-appended hash replaces itself), so continuous paragraph dedup
  // never rescans a byte of the accumulated corpus. The separator is
  // pinned in a versioned meta file (base64 — separators are usually
  // control characters): an append that split lines differently would
  // silently merge distinct lines, so a mismatched store fails loud at
  // read time instead. Single-writer contract per store, like every
  // ledger in this engine.
  // -------------------------------------------------------------------------

  private val ParaStorePrefix = "_para"
  private val ParaHashParts = 64

  private def paraSep(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    ManifestStore.readVersioned(spark, dir, ParaStorePrefix)
      .map(m => new String(
        java.util.Base64.getDecoder.decode(m._2.trim.stripPrefix("sep\t")), "UTF-8"))
      .getOrElse(throw new IllegalStateException(
        s"no committed line-hash store under $dir"))

  private def withLinePart(hashes: DataFrame): DataFrame =
    hashes.withColumn("hp",
      pmod(conv(substring(col("h"), 1, 2), 16, 10).cast("long"),
        lit(ParaHashParts.toLong)).cast("string"))

  /** Bootstrap the persisted line-hash store from an initial corpus.
    * Fails loud on an already-committed store (re-bootstrapping with a
    * different corpus would leave stale hashes — wipe the dir or keep
    * appending instead). */
  def writeLineHashes(
      df: DataFrame, storeDir: String, textCol: String,
      sep: String = "\n"): Unit = {
    val spark = df.sparkSession
    require(ManifestStore.readVersioned(spark, storeDir, ParaStorePrefix).isEmpty,
      s"line-hash store already committed under $storeDir — use " +
        "paragraphDedupIncrementalIndexed to append")
    ManifestStore.upsert(
      withLinePart(seenLineHashes(df, textCol, sep)),
      storeDir, "hp", Seq("hp", "h"), spark)
    val sepB64 = java.util.Base64.getEncoder.encodeToString(sep.getBytes("UTF-8"))
    ManifestStore.commitVersioned(spark, storeDir, ParaStorePrefix, 1L, s"sep\t$sepB64\n")
  }

  /** Whether a line-hash store has been fully bootstrapped (data AND
    * pinned meta) under `storeDir` — the reader's own predicate, so a
    * bootstrap-once guard built on it self-heals after a crash between
    * the data upsert and the meta commit. */
  def lineStoreCommitted(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): Boolean =
    ManifestStore.readVersioned(spark, storeDir, ParaStorePrefix).isDefined

  /** The separator pinned in a committed store's meta — callers composing
    * their own split (e.g. a stream configured with an explicit `sep`)
    * verify against it instead of silently splitting differently. */
  def lineStoreSep(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): String =
    paraSep(spark, storeDir)

  private def lineHashFrame(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    ManifestStore.currentFrame(spark, storeDir, "hp")
      .map(_.select("h"))
      .getOrElse(throw new IllegalStateException(
        s"no committed line-hash store under $storeDir"))

  /** The committed `(h)` frame (for composing with
    * [[paragraphDedupIncremental]] directly). */
  def readLineHashes(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame = {
    paraSep(spark, storeDir) // fail loud before the first commit
    lineHashFrame(spark, storeDir)
  }

  /**
   * One-call continuous-ingest step: paragraph-dedup `batch` against the
   * persisted hashes (exactly [[paragraphDedupIncremental]]'s math —
   * shares its oracle), then append the batch's OWN distinct line hashes
   * (only the batch's hash partitions are rewritten). Returns the cleaned
   * batch, materialized before the commit.
   */
  def paragraphDedupIncrementalIndexed(
      batch: DataFrame, storeDir: String, idCol: String,
      textCol: String): DataFrame = {
    val spark = batch.sparkSession
    val sep = paraSep(spark, storeDir) // one meta read serves both uses
    val seen = lineHashFrame(spark, storeDir)
    val cleaned = paragraphDedupIncremental(batch, seen, idCol, textCol, sep)
      .localCheckpoint()
    ManifestStore.upsert(
      withLinePart(seenLineHashes(batch, textCol, sep)),
      storeDir, "hp", Seq("hp", "h"), spark)
    cleaned
  }
}
