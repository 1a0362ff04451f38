package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Corpus, Dedup, Multimodal, Pii, Profile, Similarity, TextOps}

/** Units for the LLM-pipeline operators. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("TextOps: shingles, token counts, guards") {
    val df = Seq("a b c d", "x y").toDF("text")
      .select(TextOps.wordShingles($"text").as("sh"), TextOps.tokenCount($"text").as("n"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a b c", "b c d") && rows(0).getInt(1) == 4)
    assert(rows(1).getSeq[String](0) == Seq.empty && rows(1).getInt(1) == 2)
  }

  test("TextOps: NB classifier — disjoint vocab, exact hand-computed score, tie on label asc") {
    val train = Seq(("A", "x x y"), ("B", "z")).toDF("label", "text")
    val model = TextOps.nbTrain(train, "label", "text")
    val out = TextOps.nbPredict(
        Seq((1L, "x x"), (2L, "z z z")).toDF("id", "text"), "id", "text", model)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "A" && out(1).getString(1) == "B")
    // doc "x x": m = 2·ln(cnt_A(x)+1) = 2·ln 3, n_d = 2, nt_A = 3, prior ln(1/2)
    val b = (1 << 18).toDouble
    val want = BigDecimal(
        2 * math.log(3.0) - 2 * math.log(3.0 + b) + math.log(0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(2) == want, s"score ${out(0).getDouble(2)} != $want")
    // unseen vocab + symmetric label stats: scores tie, label asc wins
    val sym = TextOps.nbTrain(
      Seq(("a", "p"), ("b", "q")).toDF("label", "text"), "label", "text")
    val t = TextOps.nbPredict(
      Seq((9L, "unseen")).toDF("id", "text"), "id", "text", sym).collect()(0)
    assert(t.getString(1) == "a")
    // null-label rows are excluded from training
    val withNull = TextOps.nbTrain(
      train.unionByName(Seq((null: String, "x")).toDF("label", "text")), "label", "text")
    assert(withNull.labelStats.count() == 2)
  }

  test("TextOps: langId picks the dominant stopword profile, 'und' without hits") {
    val df = Seq("the cat sat on the mat", "el gato es un gato", "zzz qqq").toDF("text")
      .select(TextOps.langId($"text").as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und"))
  }

  test("Dedup: exact keeps the smallest id per content") {
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactByContent(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 9L))
  }

  test("Dedup: incremental batch keeps only content unseen in the corpus, once") {
    val corpus = Seq((1L, "old news"), (2L, "evergreen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "OLD   news"),   // normalizes to seen content → dropped
      (11L, "fresh story"),  // new
      (12L, "fresh story"),  // in-batch duplicate → only 11 survives
      (13L, "another one"))  // new
      .toDF("doc_id", "text")
    val out = Dedup.exactIncremental(
        batch, Dedup.seenFingerprints(corpus, "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(11L, 13L))
  }

  test("Dedup: snapshot diff classifies content as added/removed/retained by fingerprint") {
    val v1 = Seq((1L, "kept doc"), (2L, "dropped doc")).toDF("doc_id", "text")
    val v2 = Seq(
      (10L, "KEPT   doc"),  // same normalized content under a new id → retained
      (11L, "brand new"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.snapshotDiff(v1, v2, "doc_id", "text")
      .select("status", "id_v1", "id_v2").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      ("retained", 1L, 10L), ("removed", 2L, -1L), ("added", -1L, 11L)))
  }

  test("Dedup: verifyJaccard is exact on known overlaps") {
    val docs = Seq(
      (1L, "a b c d e"),   // shingles {abc, bcd, cde}
      (2L, "a b c d x"),   // shingles {abc, bcd, cdx} → inter 2, union 4
      (3L, "p q r s t")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.verifyJaccard(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 0.5)
    assert(out((1L, 3L)) == 0.0)
  }

  test("TextOps: subword tokenizer splits letter runs, digits and punctuation") {
    val df = Seq("Hello, world42! x").toDF("text")
      .select(TextOps.subwordTokens($"text").as("t"))
    assert(df.collect()(0).getSeq[String](0) ==
      Seq("hello", ",", "world", "42", "!", "x"))
  }

  test("Dedup: blocked near-dups find only same-block overlapping pairs") {
    val docs = Seq(
      (1L, "a b c d e f", "en"),
      (2L, "a b c d e x", "en"),   // near-dup of 1, same block
      (3L, "a b c d e f", "fr"),   // identical text but different block
      (4L, "q r s t u v", "en")).toDF("doc_id", "text", "lang")
    val out = Dedup.blockedNearDuplicates(docs, "doc_id", "text", Seq("lang"), threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L))) // 3 is blocked away, 4 shares nothing
  }

  test("Dedup: minhash-LSH recovers a planted near-duplicate") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),          // near-dup of 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val out = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("Dedup: LSH occupancy cap drops oversized buckets whole, and counts them") {
    // 5 docs share bucket (0,"hot"); 2 share (1,"cold"); cap 4 must drop
    // every hot pair and keep the cold one
    val bands = (
      (1L to 5L).map(id => (id, 0, "hot")) ++ Seq((6L, 1, "cold"), (7L, 1, "cold"))
    ).toDF("id", "band", "band_key")
    val uncapped = Dedup.candidatePairs(bands)
    assert(uncapped.count() == 10 + 1)
    val capped = Dedup.candidatePairs(bands, maxOccupancy = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((6L, 7L)))
    // a doc in a dropped bucket still pairs via its OTHER bands
    val twoBands = bands.unionByName(Seq((1L, 2, "alt"), (2L, 2, "alt")).toDF("id", "band", "band_key"))
    val capped2 = Dedup.candidatePairs(twoBands, maxOccupancy = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped2 == Set((1L, 2L), (6L, 7L)))
    // the audit counter quantifies exactly what the cap discarded
    val s = Dedup.lshOccupancyStats(bands, 4).collect()(0)
    assert(s.getAs[Long]("n_buckets") == 2 && s.getAs[Long]("n_dropped_buckets") == 1)
    assert(s.getAs[Long]("dropped_rows") == 5 && s.getAs[Long]("dropped_pair_mass") == 10)
    assert(s.getAs[Long]("max_occupancy") == 5)
  }

  test("Dedup: dropNearDuplicates keeps the smallest id of each duplicate chain") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("Dedup: simhash is deterministic and identical for identical content") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("QuantizedDot: native expression matches the interpreted zip_with form") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(d => (math.sin(i * 16 + d) * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 7).select($"embedding".as("qv"))
    val both = vecs.join(q)
      .select(
        Similarity.dotQ($"embedding", $"qv").as("native"),
        Similarity.intDot(
          Similarity.quantize($"embedding"), Similarity.quantize($"qv")).as("interp"))
    assert(both.where($"native" =!= $"interp").isEmpty)
    // wrong input type is an analysis-time error, not a runtime surprise
    val err = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(Similarity.dotQ($"a", $"b")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("quantized_dot"))
  }

  test("Similarity: quantized dot products are exact; top-1 is self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(0.6f, 0.8f), 0)).toDF("vec_id", "embedding", "label")
    val queries = vecs.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(vecs, queries, 3)
      .orderBy("rank").select("vec_id", "dot").as[(Long, Long)].collect()
    assert(out(0) == ((0L, 1000000L * 1000000L)))  // self first
    assert(out(1)._1 == 2L && out(1)._2 == 600000L * 1000000L)
    assert(out(2)._1 == 1L && out(2)._2 == 0L)
  }

  test("Similarity: hard negatives exclude positives, fnFrac drops likely false negatives") {
    val vecs = Seq(
      (1L, Array(0.5f, 0.5f)),   // the labeled positive (dot 5e11)
      (2L, Array(1.0f, 0.0f)),   // unlabeled near-match (dot 1e12) — a false negative
      (3L, Array(0.25f, 0.0f)),  // genuine hard negative (dot 2.5e11)
      (4L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val positives = Seq((0L, 1L)).toDF("qid", "vec_id")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // unguarded: every non-positive ranked, near-match first
    assert(ids(Similarity.hardNegatives(vecs, queries, positives, 3)) == Seq(2L, 3L, 4L))
    // fnFrac=0.95: the unlabeled near-match scores 1e12 > 0.95 · 5e11 → dropped
    assert(ids(Similarity.hardNegatives(
      vecs, queries, positives, 3, fnFrac = Some(0.95))) == Seq(3L, 4L))
    // a query with NO labeled positive keeps all candidates under the guard
    val qNoPos = Seq((9L, Array(0.0f, 1.0f))).toDF("qid", "qvec")
    assert(ids(Similarity.hardNegatives(
      vecs, qNoPos, positives, 1, fnFrac = Some(0.95))) == Seq(4L))
  }

  test("Similarity: identical vectors share an SRP bucket and cosine ≈ 1") {
    val vecs = (0 until 4).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(d + i % 2).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    // ids 0,2 identical; ids 1,3 identical
    val out = Similarity.srpNearDuplicates(vecs, nBits = 8, dims = 8, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 2L)) && out.contains((1L, 3L)))
    assert(!out.contains((0L, 1L)))
  }

  test("Similarity: IVF assigns to the best centroid and probes one cell") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(0.1f, 0.9f), 0))
      .toDF("vec_id", "embedding", "label")
    val centroids = vecs.where($"vec_id".isin(0, 2))
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val cells = Similarity.ivfAssign(vecs, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("Similarity: nprobe=2 recovers a neighbor straddling a cell boundary") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0), // the centroids
      (10L, Array(0.72f, 0.70f), 0), // query — lands in cell 0
      (11L, Array(0.70f, 0.72f), 0), // its true neighbor — lands in cell 2
      (12L, Array(0.95f, 0.10f), 0)) // same-cell distractor
      .toDF("vec_id", "embedding", "label")
    val centroids = vecs.where($"vec_id".isin(0, 2))
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val queries = vecs.where($"vec_id" === 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    val brute = ids(Similarity.bruteForceTopK(vecs, queries, 2))
    assert(brute == Set(10L, 11L)) // exact top-2: self + the straddler
    val p1 = ids(Similarity.ivfTopK(vecs, centroids, queries, 2, nprobe = 1))
    val p2 = ids(Similarity.ivfTopK(vecs, centroids, queries, 2, nprobe = 2))
    assert(!p1.contains(11L)) // single-cell probe misses it (recall 1/2)
    assert(p2 == brute)       // probing the 2 best cells restores full recall
  }

  test("Dedup: native minhash signatures equal the aggregate path exactly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words in this one here"),
      (4L, "ab")) // fewer than 3 tokens → no signature in either path
      .toDF("doc_id", "text")
    val agg = Dedup.minhashSignatures(docs, "doc_id", "text")
    val native = Dedup.minhashSignaturesNative(docs, "doc_id", "text")
    assert(agg.columns.toSeq == native.columns.toSeq)
    assert(agg.exceptAll(native).isEmpty && native.exceptAll(agg).isEmpty)
    assert(native.count() == 3)
  }

  test("DocKernels: simhash/fingerprint/repetition kernels equal the aggregate paths") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick"),
      (2L, "a a a a b"),
      (3L, "one two"), // < 3 tokens: null min-shingle, has bigrams
      (4L, "solo"),    // single token: null dup_2gram_frac
      (5L, null.asInstanceOf[String])) // null text: dropped by BOTH paths
      .toDF("doc_id", "text")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.columns.toSeq == b.columns.toSeq)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
    same(Dedup.simhash(docs, "doc_id", "text"), Dedup.simhashNative(docs, "doc_id", "text"))
    same(Dedup.simhash64(docs, "doc_id", "text"), Dedup.simhashNative64(docs, "doc_id", "text"))
    same(TextOps.fingerprints(docs, "doc_id", "text"),
      TextOps.fingerprintsNative(docs, "doc_id", "text"))
    same(TextOps.repetitionSignals(docs, "doc_id", "text"),
      TextOps.repetitionSignalsNative(docs, "doc_id", "text"))
    // lang_id kernel vs composed argmax, including the 'und' fallback
    val langDocs = Seq("the cat sat on the mat", "el gato es un gato", "zzz qqq")
      .toDF("text").withColumn("_toks", TextOps.tokens(col("text")))
    same(
      langDocs.select(TextOps.langIdFromTokens(col("_toks")).as("predicted")),
      langDocs.select(TextOps.langIdNative(col("_toks")).as("predicted")))
  }

  test("Dedup: simhash byte-band pairs are exact for Hamming <= 3") {
    val sk = Seq(
      (1L, 0x0AL),                                    // baseline
      (2L, 0x0BL),                                    // 1 bit off — pair
      (3L, 0xF0F0L), (4L, 0x0F0FL),                   // hamming 16 — never
      (5L, 0x0AL ^ (1L << 8) ^ (1L << 16) ^ (1L << 24))) // 3 bits, one per
                                                         // upper band — the
                                                         // shared low band
                                                         // still finds it
      .toDF("id", "simhash")
    val pairs = Dedup.simhashNearDuplicates(sk)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 1), (1L, 5L, 3)))
  }

  test("Dedup: 64-bit simhash 16-bit-band pairs are exact for Hamming <= 3, sign bit included") {
    val sk = Seq(
      (1L, 0x0AL),
      (2L, 0x0BL),                       // 1 bit off id 1 — pair
      (3L, Long.MinValue | 0x0AL),       // id 1 + bit 63: negative sketch,
                                         // shift/mask banding must still work
      (4L, 0x0AL ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)), // 3 bits, one per
                                         // upper band — low band finds it
      (5L, 0x7FFF_FFFF_FFFF_0000L))      // far from everything
      .toDF("id", "simhash")
    val pairs = Dedup.simhashNearDuplicates64(sk)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    // (3,4) collide in band 0 but sit at Hamming 4 — the verifier must drop
    // them; (2,4) share no band AND sit at Hamming 4.
    assert(pairs == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2), (1L, 4L, 3)))
  }

  test("Dedup: simhash stop-bucket cap drops a hot bucket WHOLE, spares sparse " +
    "buckets, and cap=MaxValue equals the default-capped output when no bucket " +
    "is hot; the occupancy audit measures exactly what was dropped") {
    // 40 identical sketches — one degenerate family filling all 4 of its
    // band buckets to occupancy 40 — plus one honest near-dup pair far away
    val hot = (1L to 40L).map((_, 0x1111222233334444L))
    val pairDocs = Seq((100L, 0x7FFF0000ABCD0001L), (101L, 0x7FFF0000ABCD0000L))
    val sk = (hot ++ pairDocs).toDF("id", "simhash")
    val capped = Dedup.simhashNearDuplicates64(sk, maxHamming = 3, maxOccupancy = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)),
      "capped pairs must keep the sparse-bucket pair and drop the hot family whole")
    val uncapped = Dedup.simhashNearDuplicates64(sk, maxHamming = 3, Int.MaxValue)
    assert(uncapped.count() == 40L * 39L / 2L + 1L,
      "uncapped must emit the full quadratic family")
    // no hot bucket at the default cap: capped == uncapped (the parity law
    // every existing caller relies on at test scale)
    val sparse = Seq((1L, 0x0AL), (2L, 0x0BL), (3L, 0xF0F0L)).toDF("id", "simhash")
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pset(Dedup.simhashNearDuplicates64(sparse)) ==
      pset(Dedup.simhashNearDuplicates64(sparse, 3, Int.MaxValue)))
    assert(pset(Dedup.simhashNearDuplicates(sparse)) ==
      pset(Dedup.simhashNearDuplicates(sparse, 3, Int.MaxValue)))
    // the audit: 4 hot buckets of 40 rows, C(40,2)·4 forfeited pairs; the
    // honest pair's buckets survive (3 shared + 2 lone = 5 sparse buckets)
    val st = Dedup.simhashOccupancyStats(sk, bandBits = 16, maxOccupancy = 10)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(st == ((9L, 4L, 160L, 4L * (40L * 39L / 2L), 40L)), s"got $st")
  }

  test("TextOps/Dedup: winnowing detects containment that Jaccard misses") {
    val full = (1 to 24).map(i => s"tok$i").mkString(" ")
    val half = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (101 to 124).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, full), (2L, half), (3L, other)).toDF("doc_id", "text")
    // kernel == aggregate fingerprint set (incl. a short doc's degenerate window)
    val shortDoc = Seq((9L, "a b c d")).toDF("doc_id", "text") // 2 shingles < w=4
    for (d <- Seq(docs, shortDoc)) {
      val agg = TextOps.winnow(d, "doc_id", "text")
      val nat = TextOps.winnowNative(d, "doc_id", "text")
      assert(agg.exceptAll(nat).isEmpty && nat.exceptAll(agg).isEmpty)
    }
    // the prefix copy's fingerprints are a subset of its source's → 1.0
    val pairs = Dedup.containment(TextOps.winnowNative(docs, "doc_id", "text"), 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // …while the same pair sits below any sane Jaccard near-dup threshold
    val j = Dedup.verifyJaccard(
      Seq((1L, 2L)).toDF("id_a", "id_b"), docs, "doc_id", "text")
      .select("jaccard").as[Double].head()
    assert(j < 0.5)
  }

  test("TextOps: boilerplate removal is per-group, order-preserving, and keeps emptied docs") {
    val docs = Seq(
      (1L, "s1", "unique one\nCOOKIE BANNER\nmore text"),
      (2L, "s1", "COOKIE BANNER\nanother doc"),
      (3L, "s1", "third doc\nCOOKIE BANNER"),
      (4L, "s2", "COOKIE BANNER"), // 1/3 of s2's docs — NOT boilerplate there
      (5L, "s2", "plain"),
      (6L, "s2", "also plain"),
      (7L, "s3", "SAME"), (8L, "s3", "SAME")) // all-boilerplate docs
      .toDF("doc_id", "src", "text")
    val out = TextOps.removeBoilerplate(docs, "doc_id", "text", "src", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique one\nmore text") // order survives around the cut
    assert(out(2L) == "another doc" && out(3L) == "third doc")
    assert(out(4L) == "COOKIE BANNER") // group isolation: common in s1 only
    assert(out(5L) == "plain" && out(6L) == "also plain")
    assert(out(7L) == "" && out(8L) == "") // emptied docs still present
    assert(out.size == 8)
  }

  test("Similarity: k-means training converges to cluster means, deterministically") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, 2, 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // seeds are ids 0,1 (both in the x-cluster); after one iteration the
    // y-cluster vectors defect to cid 1's side and the means separate
    assert(cents.keySet == Set(0, 1))
    assert(math.abs(cents(0)(0) - 0.95f) < 1e-5 && math.abs(cents(0)(1) - 0.05f) < 1e-5)
    assert(math.abs(cents(1)(0) - 0.05f) < 1e-5 && math.abs(cents(1)(1) - 0.95f) < 1e-5)
    // bit-identical across runs (the property the oracle check relies on)
    val again = Similarity.trainCentroids(vecs, 2, 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(again == cents)
  }

  test("Bpe: merge learning and encoding reproduce the classic hand example") {
    // Sennrich et al.'s corpus: low×5, lower×2, newest×6, widest×3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = TextOps.learnBpeMerges(df, "text", 4)
    // (e,s) and (s,t) tie at 9 → lexicographic; then the chain es→est, l+o, lo+w
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    GraftExtensions.registerBpe(spark, merges)
    val pieces = Seq("lowest").toDF("text")
      .select(TextOps.bpeEncode(TextOps.tokens(col("text"))).as("p"))
      .as[Seq[String]].head()
    assert(pieces == Seq("low", "est")) // the canonical BPE segmentation
    // unseen characters fall back to singletons; multiple tokens concatenate
    val odd = Seq("xyz lowest").toDF("text")
      .select(TextOps.bpeEncode(TextOps.tokens(col("text"))).as("p"))
      .as[Seq[String]].head()
    assert(odd == Seq("x", "y", "z", "low", "est"))
  }

  test("Dedup: containment doc-frequency cap drops ubiquitous fingerprints consistently") {
    val fps = Seq(
      (1L, 100L), (1L, 1L), (1L, 2L),
      (2L, 100L), (2L, 1L), (2L, 2L),
      (3L, 100L), (3L, 9L)) // fp 100 is in every doc — boilerplate-shaped
      .toDF("id", "fp")
    val open = Dedup.containment(fps, 0.5)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
    assert(open == Set((1L, 2L, 1.0), (1L, 3L, 0.5), (2L, 3L, 0.5)))
    // cap 2: fp 100 (df=3) leaves both the join and the denominators —
    // only the genuinely shared pair survives
    val capped = Dedup.containment(fps, 0.5, maxDocFreq = Some(2L))
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
    assert(capped == Set((1L, 2L, 1.0)))
    // repeated (id, fp) pairs (unioned per-shard winnow outputs) must not
    // multiply shared counts through the self-join: scores never exceed 1.0
    // and equal the deduped input's exactly
    val doubled = Dedup.containment(fps.union(fps), 0.5)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
    assert(doubled == open)
  }

  test("Profile: one-pass column stats count nulls and distinct values") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")), (4L, Option("a")))
      .toDF("id", "v")
    val p = graft.ops.Profile.profile(df, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(p("id") == ((0L, 4L, "1", "4")))
    assert(p("v") == ((1L, 2L, "a", "b"))) // null excluded from distinct and extremes
  }

  test("Dedup.contaminationReport: every eval doc emits a row — clean zero, " +
    "middle band visible below the gate, short docs report clean") {
    import graft.ops.Dedup
    graft.GraftExtensions.register(spark)
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "q r s t u v w x y z aa bb cc dd"))
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (101L, "a b c d e f g h i j k l m n o p"), // full copy → containment 1
      (102L, "a b c d e f g h zz yy xx ww vv uu tt ss"), // partial: below gate
      (103L, "totally fresh eval content never seen"),   // clean
      (104L, "xy"))                                      // too short: no fps
      .toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, evalSet, "doc_id", "text", 0.8)
      .orderBy("eval_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 4, out.toSeq.toString)
    assert(out(0) == ((101L, 1.0, 1L, true)), out(0).toString)
    val mid = out(1)
    assert(mid._1 == 102L && mid._2 > 0.0 && mid._2 < 0.8 &&
      mid._3 == 0L && !mid._4, s"middle band must be visible below the gate: $mid")
    assert(out(2) == ((103L, 0.0, 0L, false)))
    assert(out(3) == ((104L, 0.0, 0L, false)),
      "a fingerprint-less doc reports clean (undetectable, not certified)")
  }

  test("Profile.calibrationReport: decile buckets with closed top, " +
    "n_pos/mean per bucket, null scores and labels excluded") {
    import graft.ops.Profile
    val d = Seq(
      (0.05, Some(false)), (0.08, Some(false)),   // bucket 0: 0/2 pos
      (0.55, Some(true)), (0.58, Some(false)),    // bucket 5: 1/2 pos
      (0.95, Some(true)), (1.0, Some(true)),      // bucket 9 (1.0 closes in)
      (0.42, None),                                // null label: excluded
      (Double.NaN, Some(true)))                    // NaN rides to a bucket? no:
      .toDF("score", "label")
      // plant the null score via a where-replace (NaN would floor oddly)
      .withColumn("score", when(isnan($"score"), lit(null)).otherwise($"score"))
    val out = Profile.calibrationReport(d, "score", "label")
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, 0.065), (5L, 2L, 1L, 0.565), (9L, 2L, 2L, 0.975)))
    // scores outside [0,1] fail LOUD — a buggy scorer export must never
    // silently skew the reliability curve (negative would land in a
    // negative bucket, >1 clamp into the top one)
    for (bad <- Seq(-0.2, 1.7)) {
      val ex = intercept[Exception] {
        Profile.calibrationReport(
          Seq((bad, true)).toDF("score", "label"), "score", "label").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
      assert(msgs(ex).exists(m => m != null && m.contains("outside [0, 1]")),
        ex.toString)
    }
  }

  test("Profile: correlations — perfect +/-1, known value, zero-variance null, complete-case") {
    import graft.ops.Profile
    // y = 2x (corr +1), z = -x (corr -1 with both)
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .toDF("x", "y", "z")
    val out = Profile.correlations(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("x", "y")) == 1.0 && out(("x", "z")) == -1.0 && out(("y", "z")) == -1.0, out.toString)
    // hand-computed non-trivial value: x=(1,2,3), w=(1,3,2) → corr = 0.5
    val hand = Profile.correlations(
        Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).toDF("x", "w"), Seq("x", "w"))
      .collect()(0)
    assert(hand.getDouble(3) == 0.5, hand.toString)
    // zero-variance column → null corr, not ±1 or NaN
    val zv = Profile.correlations(
        Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "c"), Seq("x", "c"))
      .collect()(0)
    assert(zv.isNullAt(3), zv.toString)
    // complete-case: a null in ANY column drops the row everywhere
    val withNull = Seq((Some(1.0), Some(2.0)), (None, Some(9.0)), (Some(3.0), Some(6.0)))
      .toDF("x", "y")
    val cc = Profile.correlations(withNull, "x" :: "y" :: Nil).collect()(0)
    assert(cc.getLong(2) == 2L && cc.getDouble(3) == 1.0, cc.toString)
  }

  test("Profile: correlations at d=32 — one aggregate subtree, all pairs derived") {
    import graft.ops.Profile
    val d = 32
    val colNames = (0 until d).map(i => s"c$i")
    // c_i = a deterministic linear+offset family: c_i = (i+1)*t + i, so
    // every pair correlates exactly +1 (linear in the same t)
    val rows = (1 to 50).map { t =>
      org.apache.spark.sql.Row.fromSeq(
        (0 until d).map(i => (i + 1.0) * t + i))
    }
    val schema = org.apache.spark.sql.types.StructType(colNames.map(c =>
      org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val corr = Profile.correlations(df, colNames, scale = 1000L)
    // the wide-d discipline: ONE aggregate subtree + a literal pair
    // explode — never d(d-1)/2 union arms each re-deriving the aggregate
    val nAgg = corr.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAgg == 1, s"correlations must plan exactly 1 aggregate, got $nAgg")
    val out = corr.collect()
    assert(out.length == d * (d - 1) / 2, s"expected ${d * (d - 1) / 2} pairs")
    assert(out.forall(r => r.getLong(2) == 50L && r.getDouble(3) == 1.0),
      out.filterNot(r => r.getDouble(3) == 1.0).take(3).mkString("; "))
  }

  test("Profile: histogram clamps the closed upper edge and drops out-of-range") {
    val df = Seq(0.0, 5.0, 9.99, 10.0, -0.1, 10.1).toDF("x")
    val h = graft.ops.Profile.histogram(df, "x", 0.0, 10.0, 2)
      .orderBy("bin")
      .select("bin", "bin_lo", "bin_hi", "cnt")
      .as[(Int, Double, Double, Long)].collect().toSeq
    // 10.0 lands in the last bucket (closed upper edge); -0.1 / 10.1 drop
    assert(h == Seq((0, 0.0, 5.0, 1L), (1, 5.0, 10.0, 3L)))
  }

  test("TextOps: curation gate reports every failed rule in fixed order") {
    graft.GraftExtensions.register(spark)
    val df = Seq(
      (1L, "the of and to in is it a steady normal document with plenty of calm words here"),
      (2L, "spam spam spam spam spam spam spam spam"), // repetitive AND short
      (3L, "tiny"),
      (4L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce quince"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.curationGate(df, "doc_id", "text",
        graft.ops.TextOps.CurationRules(
          minTokens = 10, maxTopTokenFrac = 0.5, allowedLangs = Seq("en")))
      .orderBy("doc_id")
      .select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(out == Seq(
      (1L, true, ""),
      // all-"spam" doc: short, one dominating token, AND no English markers
      (2L, false, "too_few_tokens,top_token_frac,lang"),
      // single token: trivially dominated by itself, unidentifiable language
      (3L, false, "too_few_tokens,top_token_frac,lang"),
      (4L, false, "lang")))                          // es-looking text
  }

  test("Corpus: shuffle order is a stable permutation key, independent of input order") {
    val a = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val b = Seq(5L, 3L, 1L, 4L, 2L).toDF("doc_id")
    val ordA = graft.ops.Corpus.withShuffleOrder(a, "doc_id")
      .orderBy("ord", "doc_id").select("doc_id").as[Long].collect().toSeq
    val ordB = graft.ops.Corpus.withShuffleOrder(b, "doc_id")
      .orderBy("ord", "doc_id").select("doc_id").as[Long].collect().toSeq
    assert(ordA == ordB)            // same permutation regardless of input order
    assert(ordA != Seq(1L, 2L, 3L, 4L, 5L)) // and it actually permutes
    // a different salt yields a different permutation
    val salted = graft.ops.Corpus.withShuffleOrder(a, "doc_id", salt = "epoch2")
      .orderBy("ord", "doc_id").select("doc_id").as[Long].collect().toSeq
    assert(salted != ordA)
    // a pre-existing 'ord' column fails loudly instead of being overwritten
    intercept[IllegalArgumentException] {
      graft.ops.Corpus.withShuffleOrder(
        graft.ops.Corpus.withShuffleOrder(a, "doc_id"), "doc_id")
    }
  }

  test("TextOps: distinctive keywords rank rare-then-frequent with integer keys") {
    val df = Seq(
      (1L, "common common rare common unique"),
      (2L, "common rare rare"),
      (3L, "common common")).toDF("doc_id", "text")
    // df: common=3, rare=2, unique=1
    val out = graft.ops.TextOps.distinctiveTokens(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "token", "rank")
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "unique", 1), (1L, "rare", 2),   // doc 1: rarest first
      (2L, "rare", 1), (2L, "common", 2),
      (3L, "common", 1)))                   // doc 3 has only one distinct token
  }

  test("Profile: MAD outliers flag deviation beyond k MADs, robust to the outlier itself") {
    // median 5, deviations {4,1,0,1,4,995} → MAD 2.5; only 1000 exceeds 3*MAD
    val df = Seq(1.0, 4.0, 5.0, 6.0, 9.0, 1000.0).toDF("x")
    val out = graft.ops.Profile.madOutliers(df, "x", 3.0)
      .select("x").as[Double].collect().toSeq
    assert(out == Seq(1000.0))
    // nulls are ignored, not treated as deviations
    val withNull = Seq(Option(1.0), Option(2.0), None, Option(3.0)).toDF("x")
    assert(graft.ops.Profile.madOutliers(withNull, "x", 3.0).isEmpty)
  }

  test("Profile: equi-depth histogram holds ~equal counts with edge-exclusive buckets") {
    // 1..100: quartile edges 25.75 / 50.5 / 75.25 → 4 buckets of 25
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val h = graft.ops.Profile.equiDepthHistogram(df, "x", 4)
      .orderBy("bin")
      .select("bin", "cnt", "x_min", "x_max")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(h == Seq(
      (0, 25L, 1.0, 25.0), (1, 25L, 26.0, 50.0),
      (2, 25L, 51.0, 75.0), (3, 25L, 76.0, 100.0)))
    // a value exactly on an edge stays in the LOWER bucket
    val tied = Seq(1.0, 2.0, 2.0, 2.0, 3.0).toDF("x")
    val ht = graft.ops.Profile.equiDepthHistogram(tied, "x", 2)
      .orderBy("bin").select("bin", "cnt").as[(Int, Long)].collect().toSeq
    assert(ht == Seq((0, 4L), (1, 1L))) // median 2.0 → the three 2.0s bin low
  }

  test("Profile: approx profile tracks exact distincts within the sketch error") {
    val df = (1 to 2000).map(i => (i.toLong, s"v${i % 500}")).toDF("id", "v")
    val exact = graft.ops.Profile.profile(df, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = graft.ops.Profile.profileApprox(df, Seq("id", "v"), rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((c, ex) <- exact) {
      val ap = approx(c).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"$c: approx $ap vs exact $ex")
    }
    // and the row-shape contract (nulls/min/max) is identical to the exact pass
    val exRest = graft.ops.Profile.profile(df, Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(4)))
    val apRest = graft.ops.Profile.profileApprox(df, Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(exRest.sameElements(apRest))
  }

  test("Bpe: incremental learner matches a brute-force rescan reference") {
    import scala.collection.mutable
    def mergeAll(s: mutable.ArrayBuffer[String], a: String, b: String): Unit = {
      var i = 0
      while (i < s.length - 1) {
        if (s(i) == a && s(i + 1) == b) { s(i) = a + b; s.remove(i + 1) } else i += 1
      }
    }
    // the naive algorithm: full pair-count rescan per merge
    def brute(wc: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
      val words = wc.map { case (w, c) => (mutable.ArrayBuffer(w.map(_.toString): _*), c) }
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (out.length < n && !done) {
        val counts = mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (syms, c) =>
          (0 until syms.length - 1).foreach { i =>
            val k = (syms(i), syms(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + c)
          }
        }
        if (counts.isEmpty) done = true
        else {
          val best = counts.keys.toSeq.sortBy { case (a, b) => (-counts((a, b)), a, b) }.head
          out += best
          words.foreach { case (syms, _) => mergeAll(syms, best._1, best._2) }
        }
      }
      out.toSeq
    }
    // overlapping chains, repeats, ties — the shapes that break incremental updates
    val corpus = Seq(
      "abcabc" -> 7L, "bcbcbc" -> 5L, "aabbcc" -> 4L, "cabbage" -> 3L,
      "abc" -> 9L, "aaaa" -> 2L, "xyxyxy" -> 6L)
    for (n <- Seq(1, 3, 8, 25))
      assert(Bpe.learn(corpus, n) == brute(corpus, n), s"divergence at numMerges=$n")
  }

  test("Dedup: incremental shard dedup finds store and within-shard dups by signature") {
    val mk = (id: Long, text: String) => (id, text)
    val existing = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta"),
      mk(2L, "one two three four five six")).toDF("doc_id", "text")
    val shard = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta"), // exact dup of store doc 1
      mk(11L, "totally different content in this document"),
      mk(12L, "totally different content in this document")) // within-shard dup
      .toDF("doc_id", "text")
    val store = Dedup.minhashSignatures(existing, "doc_id", "text")
    val fresh = Dedup.minhashSignatures(shard, "doc_id", "text")
    val pairs = Dedup.nearDuplicatesIncremental(store, fresh, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L), (11L, 12L)))
    // identical docs agree on every minhash component
    val est = Dedup.nearDuplicatesIncremental(store, fresh, threshold = 0.9)
      .select("est_jaccard").as[Double].collect()
    assert(est.forall(_ == 1.0))
  }

  test("Dedup: clusters close pair chains and keep the min id per component") {
    // chain 1–2, 2–3 (3 never pairs with 1) + separate component 10–11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("doc_id")
    val kept = Dedup.dropDuplicateClusters(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 10L)) // one survivor per cluster + untouched 4
  }

  test("Dedup: keepBestInClusters keeps the max-quality member, min-id on ties, nulls last") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, Some(5.0)), (2L, Some(9.0)), (3L, Some(9.0)), // tie 2 vs 3 → min id 2
      (4L, Some(1.0)),                                   // non-member: untouched
      (10L, None), (11L, Some(0.5)),                     // null ranks last → 11
      (20L, None), (21L, None))                          // all-null → min id 20
      .toDF("doc_id", "q")
    val kept = Dedup.keepBestInClusters(docs, pairs, "doc_id", col("q"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 11L, 20L))
    // survivor laws: one per component, survivors ⊆ input, members-only drop
    assert(kept.subsetOf(Set(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L)))
  }

  test("Dedup: clustersContract matches propagation labels and converges on a 1000-link chain") {
    // Same mixed graph as the propagation test: identical label contract.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clustersContract(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    // The adversarial topology for propagation: one 1000-link chain
    // (diameter 1000 ≫ propagation's default maxIter=20). Contraction must
    // close it within its default O(log n) round budget. Links are shuffled
    // and reversed so convergence can't ride on input ordering.
    val chain = (1L until 1001L).map(i => if (i % 2 == 0) (i + 1, i) else (i, i + 1))
    val chainDf = scala.util.Random.shuffle(chain).toDF("id_a", "id_b")
    val labels = Dedup.clustersContract(chainDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 1001)
    assert(labels.forall(_._2 == 1L))

    // Propagation on the same chain fail-louds rather than truncating —
    // the documented envelope that clustersContract exists to lift.
    val ex = intercept[IllegalStateException](Dedup.clusters(chainDf, maxIter = 5).collect())
    assert(ex.getMessage.contains("clustersContract"))

    // Self-pairs / isolated nodes still get a (self-labeled) row.
    val selfCl = Dedup.clustersContract(Seq((7L, 7L)).toDF("id_a", "id_b")).collect()
    assert(selfCl.map(r => r.getLong(0) -> r.getLong(1)).toSeq == Seq(7L -> 7L))
  }

  test("Dedup: clustersAuto falls back to contraction beyond the propagation budget") {
    // Shallow graph: resolved inside the propagation budget, same labels.
    val shallow = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clustersAuto(shallow).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    // A 200-link chain exceeds any propagation budget we'd configure; auto
    // must complete via contraction instead of surfacing the fail-loud.
    val chain = (1L until 201L).map(i => (i, i + 1))
    val chainDf = scala.util.Random.shuffle(chain).toDF("id_a", "id_b")
    val labels = Dedup.clustersAuto(chainDf, propagationRounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 201)
    assert(labels.forall(_._2 == 1L))

    // dropDuplicateClusters rides the auto path: a deep chain can no longer
    // hit the diameter fail-loud (the round-5 envelope it shipped with).
    val docs = (1L to 201L).toDF("doc_id")
    val kept = Dedup.dropDuplicateClusters(docs, chainDf, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("Dedup: bloom-prefiltered decontamination matches the exact join, and prunes pre-shuffle") {
    val corpus = Seq(
      (1L, "the quick brown fox"), (2L, "held out eval text"),
      (3L, "unrelated corpus doc"), (4L, "Held   OUT eval text")) // normalizes to doc 2
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "held out EVAL text"), (101L, "never in corpus"))
      .toDF("doc_id", "text")

    val exact = Dedup.crossContamination(corpus, evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Dedup.crossContaminationBloom(corpus, evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((2L, 100L), (4L, 100L)))
    assert(bloom == exact)

    // The probe must sit on the corpus scan side — BEFORE the join exchange —
    // or the sketch saved nothing at 100 TB. A Range-backed corpus keeps the
    // plan honest: a literal fixture collapses into a pre-evaluated
    // LocalTableScan (ConvertToLocalRelation runs the pushed-down probe at
    // optimize time), hiding the filter from the plan string.
    val rangeCorpus = spark.range(0, 1000)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    val rangeEval = Seq((9000L, "doc 5")).toDF("doc_id", "text")
    val pruned = Dedup.crossContaminationBloom(rangeCorpus, rangeEval, "doc_id", "text")
    assert(pruned.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 9000L)))

    // Empty eval set: degenerate case returns no rows rather than building
    // a zero-item sketch.
    val emptyEval = evalSet.where(lit(false))
    assert(Dedup.crossContaminationBloom(corpus, emptyEval, "doc_id", "text").isEmpty)
  }

  test("Similarity: PQ codebooks, codes, and ADC ranking behave on a separable fixture") {
    // 8 vectors, 2 subspaces of 2 dims; each subspace has two well-separated
    // clusters, so 2 codes per subspace reconstruct cleanly.
    val embs = (0 until 8).map { i =>
      val hi = 1f + i * 0.01f
      val a = if (i < 4) Array(hi, 0f) else Array(0f, hi)
      val b = if (i % 2 == 0) Array(hi, 0f) else Array(0f, hi)
      (i.toLong, a ++ b)
    }.toDF("vec_id", "embedding")

    val cb = Similarity.pqTrainCodebooks(embs, dims = 4, m = 2, k = 2, iters = 2)
    val cbRows = cb.collect()
    assert(cbRows.length <= 4 && cbRows.forall(_.getSeq[Float](2).length == 2))

    val codes = Similarity.pqEncode(embs, cb, dims = 4, m = 2).collect()
    assert(codes.length == 16) // 8 vectors × 2 subspaces
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 2))
    // same-cluster vectors share codes: vectors 0 and 2 agree in BOTH
    // subspaces (both i<4 and both even)
    val byVec = codes.map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(byVec((0L, 0)) == byVec((2L, 0)) && byVec((0L, 1)) == byVec((2L, 1)))

    // the lowest-id member of the query's code cell ranks first (ADC ties
    // break by vec_id; vector 0 shares its codes only with vector 2)
    val queries = embs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.pqAdcTopK(
      Similarity.pqEncode(embs, cb, dims = 4, m = 2), cb, queries, 3, dims = 4, m = 2)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 0L, s"self not top-1: ${top.mkString(", ")}")

    // IVF-PQ with nprobe=1: every hit must live in the query's own coarse
    // cell — the probe restriction is the whole contract.
    val coarse = Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
      .toDF("cid", "cvec")
    val cbRes = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 4, m = 2, k = 3, iters = 1)
    val hits = Similarity.ivfPqTopK(
      embs, coarse, cbRes, queries, 8, nprobe = 1, dims = 4, m = 2)
      .select("vec_id").as[Long].collect().toSet
    val qCell = Similarity.ivfAssign(embs.where(col("vec_id") === 0), coarse)
      .select("cell").as[Int].head()
    val cellMembers = Similarity.ivfAssign(embs, coarse)
      .where(col("cell") === qCell).select("vec_id").as[Long].collect().toSet
    assert(hits.nonEmpty && hits.subsetOf(cellMembers),
      s"IVF-PQ leaked outside the probed cell: $hits vs $cellMembers")
  }

  test("Similarity: persisted index round-trips and serves identically to the in-query path") {
    val embs = (0 until 32).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(d * 0.9 + (i % 5)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = embs.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    try {
      assert(!Similarity.indexCommitted(dir))
      Similarity.buildIndex(embs, dir, dims = 8, m = 2, coarseK = 4, pqK = 3, iters = 2)
      assert(Similarity.indexCommitted(dir))
      val idx = Similarity.readIndex(spark, dir)
      assert(idx.dims == 8 && idx.m == 2)

      // serving from the index == the full in-query pipeline, bit for bit
      // (residual codebooks — the form buildIndex trains since round 8)
      val coarse = Similarity.trainCentroids(embs, 4, 2)
      val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "vec_id", "adc")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      val served = key(Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 2))
      val inQuery = key(Similarity.ivfPqTopK(
        embs, coarse, cb, queries, 3, nprobe = 2, dims = 8, m = 2))
      assert(served == inQuery, s"persisted serving diverged:\n$served\nvs\n$inQuery")

      // the re-rank stage serves from the index's own raw-vector artifact
      // — must equal the in-query two-stage ranking bit for bit
      def keyDot(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "vec_id", "dot")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      val servedRr = keyDot(
        Similarity.ivfPqTopKIndexedRerank(idx, queries, 3, nprobe = 2, shortlist = 8))
      val inQueryRr = keyDot(Similarity.ivfPqTopKRerank(
        embs, coarse, cb, queries, 3, nprobe = 2, shortlist = 8, dims = 8, m = 2))
      assert(servedRr == inQueryRr,
        s"indexed re-rank diverged:\n$servedRr\nvs\n$inQueryRr")

      // the probe set must reach the codes scan as a partition filter —
      // non-probed cells' files are pruned at planning time
      val plan = Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 1)
        .queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
        s"no partition filter on the codes scan:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("Similarity: projection-based encode/assign is bit-identical to the join path") {
    // 24 vectors of 8 dims with deliberate exact ties (duplicate vectors and
    // duplicate centroids) so the (key, cid) tie-break is exercised, not
    // just the happy path.
    val embs = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(d * 0.7 + (i % 6)).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(embs, 4, 2)
    val projA = Similarity.ivfAssign(embs, cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val joinA = Similarity.ivfAssignJoin(embs, cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(projA == joinA, s"ivfAssign diverged:\n$projA\nvs\n$joinA")

    val cb = Similarity.pqTrainCodebooks(embs, dims = 8, m = 4, k = 3, iters = 2)
    val projC = Similarity.pqEncode(embs, cb, dims = 8, m = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val joinC = Similarity.pqEncodeJoin(embs, cb, dims = 8, m = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(projC == joinC, s"pqEncode diverged:\n$projC\nvs\n$joinC")
  }

  test("Similarity: semantic dedup pairs within cells only; one survivor per similarity group") {
    val embs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.999f, 0.01f, 0f, 0f)),  // ~v1 (cos ≈ 0.9999)
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0.01f, 0.999f, 0f, 0f)),  // ~v3
      (5L, Array(0f, 0f, 1f, 0f)))         // singleton cell
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (0, Array(1f, 0f, 0f, 0f)),
      (1, Array(0f, 1f, 0f, 0f)),
      (2, Array(0f, 0f, 1f, 0f)))
      .toDF("cid", "cvec")

    val pairs = Similarity.semanticNearDuplicates(embs, cents, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))

    val kept = Similarity.semanticDedup(embs, cents, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))

    // Cross-corpus semantic contamination: an eval vector near a corpus
    // vector (same cell) is flagged; the cross-cell near-miss is not.
    val evalSet = Seq(
      (100L, Array(0.999f, 0.02f, 0f, 0f)),  // ≈ v1/v2's cell 0
      (101L, Array(0f, 0f, 0.01f, 0.999f)))  // cell of nothing similar
      .toDF("vec_id", "embedding")
    val flagged = Similarity.semanticContamination(embs, evalSet, cents, 0.95)
      .select("corpus_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 100L), (2L, 100L)), flagged.toString)
  }

  test("Similarity: semantic cell count follows the max(32, ceil(sqrt(N))) rule") {
    // the rule the SemDeDup queries and their SQL oracles both derive —
    // fixed k was the measured 10×-scale quadratic (BENCH_SCALE10X r7)
    assert(Similarity.semanticCellCount(0) == 32)
    assert(Similarity.semanticCellCount(500) == 32)   // sf0.01: floor holds
    assert(Similarity.semanticCellCount(1024) == 32)  // boundary: √1024 = 32
    assert(Similarity.semanticCellCount(1025) == 33)
    assert(Similarity.semanticCellCount(2000) == 45)  // sf0.1
    assert(Similarity.semanticCellCount(20000) == 142) // 10× stress corpus
    val ns = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
    assert(ns.map(Similarity.semanticCellCount) == ns.map(Similarity.semanticCellCount).sorted,
      "cell count must be monotone in corpus size")

    // autoCentroids trains exactly that many cells (distinct seeds ⇒ k cells)
    val embs33 = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 4 + d + 1).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.autoCentroids(embs33, iters = 0).count() == 32L)
  }

  test("TextOps: chunking covers every token once per stride, short docs pass through") {
    // 10 tokens, chunk 4, overlap 1 (stride 3) → starts 0,3,6 → 3 chunks
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_no").collect()
    val doc1 = out.filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(doc1.toSeq == Seq(
      (0, "t0 t1 t2 t3", 4), (1, "t3 t4 t5 t6", 4), (2, "t6 t7 t8 t9", 4)))
    // short doc: itself as chunk 0
    val doc2 = out.filter(_.getLong(0) == 2L).map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(doc2.toSeq == Seq((0, "a b", 2)))
    // ragged tail: 11 tokens → last chunk holds the 2 unseen tokens
    val ragged = TextOps.chunkDocuments(
      Seq((1L, (0 until 11).map("t" + _).mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 4, overlap = 1).orderBy("chunk_no").collect()
    assert(ragged.length == 4 && ragged.last.getString(2) == "t9 t10"
      && ragged.last.getInt(3) == 2)
    // chunking never shuffles: scan → project → generate, no Exchange
    val plan = TextOps.chunkDocuments(df, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("TextOps: unigram perplexity — uniform corpus scores 1:1 with hand-computed model") {
    // Two docs over a 2-token vocabulary: a=3, b=1 → T=4, V=2.
    // p(a)=(3+1)/7, p(b)=(1+1)/7.
    val df = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val out = TextOps.unigramPerplexity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val pa = 4.0 / 7.0
    val pb = 2.0 / 7.0
    val nll1 = -(2 * math.log(pa) + math.log(pb)) / 3
    val nll2 = -math.log(pa)
    assert(out(0).getLong(1) == 3 && out(1).getLong(1) == 1)
    assert(math.abs(out(0).getDouble(2) - nll1) < 5e-5)
    assert(math.abs(out(1).getDouble(2) - nll2) < 5e-5)
    assert(math.abs(out(0).getDouble(3) - math.exp(nll1)) < 5e-3)

    // Scoring a foreign doc against an external LM: unseen tokens take the
    // add-one floor, so an out-of-distribution doc scores strictly higher.
    val lm = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val scored = TextOps.unigramPerplexity(
      Seq((10L, "a a"), (11L, "z z")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    assert(scored(0).getDouble(3) < scored(1).getDouble(3))
  }

  test("TextOps: token entropy — uniform max, single-token zero, hand-checked mid case") {
    val df = Seq(
      (1L, "a b c d"),    // uniform over 4 → ln 4
      (2L, "x x x x"),    // single token → 0
      (3L, "a a b"))      // H = ln3 − (2 ln2)/3
      .toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(math.abs(out(0).getDouble(2) - math.log(4)) < 5e-5)
    assert(out(1).getDouble(2) == 0.0)
    assert(math.abs(out(2).getDouble(2) - (math.log(3) - 2 * math.log(2) / 3)) < 5e-5)
  }

  test("TextOps: bigram perplexity — conditional probabilities hand-checked; repetition scores low") {
    // Corpus "a b a b" + "a b": uni a=3, b=3, T=6, V=2.
    // Bigrams: (a,b)×3, (b,a)×1.
    // Doc 1 "a b a b": lp = ln p(a) + ln p(b|a) + ln p(a|b) + ln p(b|a)
    //   p(a) = 4/9, p(b|a) = 4/6, p(a|b) = 2/6, p(b|a) = 4/6
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.bigramPerplexity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val nll1 = -(math.log(4.0 / 9) + 2 * math.log(4.0 / 6) + math.log(2.0 / 6)) / 4
    assert(out(0).getLong(1) == 4)
    assert(math.abs(out(0).getDouble(2) - nll1) < 5e-5)
    // A repetitive in-distribution doc must score lower than an unseen-
    // transition doc under the same LM.
    val lm = Seq((0L, "x y x y x y")).toDF("doc_id", "text")
    val scored = TextOps.bigramPerplexity(
      Seq((10L, "x y x y"), (11L, "y y y y")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    assert(scored(0).getDouble(3) < scored(1).getDouble(3))
  }

  test("Pii: detection counts, ordered redaction, quarantine predicate") {
    val df = Seq(
      (1L, "email bob.smith+x@mail.example.org and ip 192.168.0.1"),
      (2L, "card 4111 1111 1111 1111 phone 555-123-4567 ssn 123-45-6789"),
      (3L, "clean text with no identifiers")).toDF("doc_id", "text")
    val out = df.select(
      (col("doc_id") +: Pii.counts($"text") :+
        Pii.redact($"text").as("r") :+ Pii.hasPii($"text").as("h")): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_email") == 1 && out(0).getAs[Int]("n_ipv4") == 1)
    assert(out(0).getAs[String]("r") == "email <EMAIL> and ip <IP>")
    assert(out(1).getAs[Int]("n_card") == 1 && out(1).getAs[Int]("n_phone") == 1 &&
      out(1).getAs[Int]("n_ssn") == 1)
    assert(out(1).getAs[String]("r") == "card <CARD> phone <PHONE> ssn <SSN>")
    assert(out(1).getAs[Boolean]("h") && !out(2).getAs[Boolean]("h"))
    assert(out(2).getAs[String]("r") == "clean text with no identifiers")
  }

  test("Pii: pseudonymization yields stable linkable tokens, distinct per value") {
    graft.GraftExtensions.register(spark)
    val df = Seq(
      (1L, "contact alice@example.com or bob@example.com"),
      (2L, "alice@example.com again from 10.0.0.1"),
      (3L, "no identifiers here")).toDF("doc_id", "text")
    val out = df.select($"doc_id", Pii.pseudonymize($"text").as("p"))
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    val tok = "<EMAIL:([0-9a-f]{8})>".r
    val doc1 = tok.findAllMatchIn(out(0)).map(_.group(1)).toSeq
    assert(doc1.size == 2 && doc1.distinct.size == 2) // different values, different tokens
    // the SAME email in another document gets the SAME token (linkable)
    val doc2 = tok.findAllMatchIn(out(1)).map(_.group(1)).toSeq
    assert(doc2 == Seq(doc1.head))
    assert(out(1).contains("<IPV4:"))
    assert(out(2) == "no identifiers here")
    // pseudonymized text carries no residual detectable PII
    assert(df.select(Pii.pseudonymize($"text").as("p"))
      .where(Pii.hasPii($"p")).isEmpty)
    // and the SQL surface sees the same function
    df.createOrReplaceTempView("pii_docs")
    val viaSql = spark.sql(
      "SELECT pii_pseudonymize(text) AS p FROM pii_docs WHERE doc_id = 1")
      .as[String].head
    assert(viaSql == out(0))
  }

  test("TextOps: repetition signals flag token and bigram repeats") {
    val df = Seq((1L, "a a a a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "doc_id", "text").orderBy("id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 5)
    assert(out(0).getAs[Double]("top_token_frac") == 0.8)
    assert(out(0).getAs[Double]("dup_2gram_frac") == 0.5) // (a a)×3 + (a b)
    assert(out(1).getAs[Double]("dup_2gram_frac") == 0.0)
  }

  test("Multimodal: asset plumbing — schema, stub features, frame fan-out") {
    val docs = Seq((1L, "Hello world payload", "srcA")).toDF("doc_id", "text", "source")
    val assets = Multimodal.asAsset($"doc_id", lit("image"), $"text", $"source")(docs)
    assert(assets.schema.fieldNames.toSeq == Seq("asset_id", "modality", "content", "meta"))

    val feats = Multimodal.extractFeatures(assets).collect()(0)
    val f = feats.getStruct(4)
    assert(f.getAs[Long]("n_bytes") == 19L)
    assert(f.getAs[Int]("width") == ('H'.toInt + 1) * 16)
    assert(f.getAs[Int]("height") == ('e'.toInt + 1) * 16)

    val frames = Multimodal.sampleFrames(assets, stride = 5, frameBytes = 4)
    assert(frames.count() == 3) // 19 bytes / stride 5 → 3 frames
  }

  test("Multimodal: real image decode — exact pixel stats, codec-independent, null on garbage") {
    import graft.expressions.ImageKernels
    // kernel-level: planted PNG decodes to the closed-form stats
    for (id <- Seq(0L, 1L, 17L, 255L, 1000003L)) {
      val row = ImageKernels.decode(ImageKernels.synthPng(id))
      val (w, h) = ((8 + id % 8).toInt, (8 + id % 5).toInt)
      assert(row.getInt(0) == w && row.getInt(1) == h)
      assert(row.getLong(2) == w.toLong * h)
      assert(row.getLong(3) == (id % 256) * (w - 1) * h, s"sum_r for id=$id")
      assert(row.getLong(4) == (id * 7 % 256) * (w - 1) * h, s"sum_g for id=$id")
      assert(row.getLong(5) == (id * 13 % 256) * (w - 1) * h, s"sum_b for id=$id")
    }
    // codec independence: the same image written as BMP decodes to the
    // same statistics (stats are a property of pixels, not the container)
    val png = ImageKernels.synthPng(42L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val viaPng = ImageKernels.decode(png)
    val viaBmp = ImageKernels.decode(baos.toByteArray)
    assert((0 to 1).forall(i => viaPng.getInt(i) == viaBmp.getInt(i)) &&
      (2 to 5).forall(i => viaPng.getLong(i) == viaBmp.getLong(i)))

    // column-level: decodeImage over planted assets; garbage bytes → null
    val df = Seq((3L, ImageKernels.synthPng(3L)), (4L, "not an image".getBytes))
      .toDF("asset_id", "content")
    val out = df.select($"asset_id", Multimodal.decodeImage($"content").as("f"))
      .orderBy("asset_id").collect()
    assert(out(0).getStruct(1).getInt(0) == (8 + 3 % 8) && !out(0).isNullAt(1))
    assert(out(1).isNullAt(1), "garbage payload must decode to NULL, not throw")

    // truncated container: imageio throws RuntimeExceptions (not just
    // IOException) on malformed headers — the NonFatal catch must turn
    // every truncation point into NULL, never a task-killing throw
    for (cut <- Seq(2, 10, 30, png.length / 2))
      assert(ImageKernels.decode(png.take(cut)) == null, s"truncated at $cut")
  }

  test("Multimodal: real audio decode — exact sample stats, null on garbage/truncation") {
    import graft.expressions.AudioKernels
    // kernel-level: planted WAV decodes to the closed-form stats
    for (id <- Seq(0L, 1L, 17L, 255L, 1000003L)) {
      val row = AudioKernels.decode(AudioKernels.synthWav(id))
      assert(row != null, s"planted WAV for id=$id must decode")
      val channels = (1 + id % 2).toInt
      val frames = 256 + id % 128
      assert(row.getInt(0) == 8000 && row.getInt(1) == channels)
      assert(row.getLong(2) == frames, s"n_frames for id=$id")
      for (ch <- 0 until channels) {
        var sm = 0L; var sq = 0L
        for (i <- 0L until frames) {
          val v = math.floorMod(id * 31 + ch * 17 + i * 7919, 65536L) - 32768L
          sm += v; sq += v * v
        }
        assert(row.getLong(3 + 2 * ch) == sm, s"sum ch=$ch id=$id")
        assert(row.getLong(4 + 2 * ch) == sq, s"sumsq ch=$ch id=$id")
      }
      // mono reports zeros for the absent channel
      if (channels == 1)
        assert(row.getLong(5) == 0L && row.getLong(6) == 0L)
    }

    // corrupt-payload policy: garbage and every truncation point → NULL,
    // never a throw (javax.sound throws checked AND runtime exceptions on
    // malformed RIFF structure)
    val wav = AudioKernels.synthWav(7L)
    assert(AudioKernels.decode("not audio at all".getBytes) == null)
    // header truncation (44-byte RIFF/fmt/data header) → unreadable → NULL
    for (cut <- Seq(3, 11, 20, 43))
      assert(AudioKernels.decode(wav.take(cut)) == null, s"truncated at $cut")
    // mid-data truncation: header parses, stream is short — decoded as a
    // partial take (fewer frames), never a throw; callers see the frame
    // count and can gate on expected duration
    val partial = AudioKernels.decode(wav.take(44 + (wav.length - 44) / 2))
    assert(partial != null && partial.getLong(2) < 256 + 7 % 128)

    // column-level: decodeAudio over planted assets; corrupt → null row
    val df = Seq((5L, AudioKernels.synthWav(5L)), (6L, Array[Byte](82, 73, 70)))
      .toDF("asset_id", "content")
    val out = df.select($"asset_id", Multimodal.decodeAudio($"content").as("f"))
      .orderBy("asset_id").collect()
    assert(!out(0).isNullAt(1) && out(0).getStruct(1).getInt(1) == 2) // id 5 → stereo
    assert(out(1).isNullAt(1), "corrupt payload must decode to NULL, not throw")
  }

  test("span_win_hashes kernel: rolling == closed-form polynomial, short docs empty, " +
    "identical windows collide, distinct windows don't") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val M = 2147483647L
    // closed-form reference, computed independently of the rolling update:
    // h_b(p) = sum_j hm(t_{p+j}) * b^(n-1-j) mod M, packed h1*2^31 + h2
    def ref(tokens: Seq[String], n: Int): Seq[Long] = {
      val hm = tokens.map(t =>
        graft.expressions.MinhashSigs.hash32Bytes(t.getBytes("UTF-8")) % M)
      def poly(b: Long, start: Int): Long =
        (0 until n).foldLeft(0L)((acc, j) => (acc * b + hm(start + j)) % M)
      (0 to tokens.size - n).map(p => (poly(131L, p) << 31) + poly(137L, p))
    }
    val texts = Seq(
      "a b c d e f g",
      "x y a b c d q",       // shares the window "a b c d" with doc 1
      "one two three",
      "short")
    val n = 4
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", call_function("span_win_hashes", split($"text", " "), lit(n)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ").toSeq
      val want = if (toks.size < n) Seq.empty[Long] else ref(toks, n)
      assert(got(i.toLong) == want, s"doc $i: ${got(i.toLong)} != $want")
    }
    // the shared 4-token window hashes identically across documents...
    assert(got(0L)(0) == got(1L)(2), "identical windows must collide")
    // ...and the hash space is wide enough that the other windows differ
    assert((got(0L) ++ got(1L)).distinct.size == got(0L).size + got(1L).size - 1)
  }

  test("Dedup.lshPlan: crossover math, shipped-config reproduction, recall-side ties") {
    import graft.ops.Dedup
    // the engine's own shipped configuration falls out of the planner
    val p35 = Dedup.lshPlan(16, 0.35)
    assert(p35.bands == 8 && p35.rows == 2, p35.toString)
    assert(math.abs(p35.crossover - math.pow(1.0 / 8, 0.5)) < 1e-12)
    // high-threshold target picks fewer bands / more rows
    val p80 = Dedup.lshPlan(16, 0.8)
    assert(p80.bands < p35.bands && p80.rows > p35.rows, p80.toString)
    // S-curve sanity: candidate probability is monotone in j, and more
    // bands always mean more candidates at fixed j
    val js = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
    val curve = js.map(Dedup.lshCandidateProb(8, 2, _))
    assert(curve == curve.sorted && curve.last > 0.99, curve.toString)
    js.foreach { j =>
      assert(Dedup.lshCandidateProb(8, 2, j) >= Dedup.lshCandidateProb(4, 4, j) - 1e-12,
        s"more bands must not lower candidate prob at j=$j")
    }
    // a pair AT the crossover has candidate probability near 1 - 1/e
    val atCross = Dedup.lshCandidateProb(p35.bands, p35.rows, p35.crossover)
    assert(math.abs(atCross - (1 - math.exp(-1))) < 0.05, atCross.toString)
    intercept[IllegalArgumentException](Dedup.lshPlan(16, 0.0))
  }

  test("TextOps.stripHtml: blocks dropped with content, entities decoded in order, " +
    "malformed markup degrades gracefully") {
    import spark.implicits._
    import graft.ops.TextOps
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextOps.stripHtml($"h")).collect()(0).getString(0)
    assert(strip("<p>Hello <b>world</b></p>") == "Hello world")
    // script/style vanish WITH content, even with a stray '<' inside
    assert(strip("a<script>if (1 < 2) x()</script>b<style>p{}</style>c") == "a b c")
    // entity order: &amp;lt; is the LITERAL text '&lt;', not a tag opener
    assert(strip("A &amp; B &amp;lt;kept&amp;gt; &lt;x&gt; &quot;q&quot; &#39;s&#39;") ==
      "A & B &lt;kept&gt; <x> \"q\" 's'")
    // unclosed tag: strips to its '>', or survives as text when '>' never comes
    assert(strip("pre <div class='x' post") == "pre <div class='x' post")
    assert(strip("pre <div\nclass='x'> post") == "pre post")
    // whitespace collapse + trim
    assert(strip("  <p> a\n\n b\t c </p>  ") == "a b c")
    // null passthrough
    assert(Seq[Option[String]](None).toDF("h")
      .select(TextOps.stripHtml($"h")).collect()(0).isNullAt(0))
  }

  test("HtmlKernels.html_unescape: numeric character references decode across the " +
    "bounded safe set; everything else survives verbatim; single pass keeps the " +
    "&amp;-last law") {
    import spark.implicits._
    def un(s: String): String =
      Seq(s).toDF("h")
        .select(org.apache.spark.sql.functions.call_function("html_unescape", $"h"))
        .collect()(0).getString(0)
    // decimal / hex (both x cases, both hex cases) / leading zeros
    assert(un("&#39;&#x27;&#X27;&#x4d;&#x4D;&#039;&#0065;") == "'''MM'A")
    // printable-ASCII range edges: 32 (space) and 126 (~); 31 and 127 out
    assert(un("a&#32;b&#126;c&#31;d&#127;e") == "a b~c&#31;d&#127;e")
    // NBSP (both spellings) decodes to a PLAIN space, like &nbsp;
    assert(un("x&#160;y&#xA0;z&nbsp;w") == "x y z w")
    // common punctuation set
    assert(un("&#8211;&#8212;&#8216;&#8217;&#8220;&#8221;&#8226;&#8230;&#8364;&#8482;") ==
      "–—‘’“”•…€™")
    // out-of-range / overlong / malformed / unterminated: verbatim
    assert(un("&#999999; &#12345678; &#; &#x; &#xG1; &#12") ==
      "&#999999; &#12345678; &#; &#x; &#xG1; &#12")
    // double-encoding: &amp;#8217; is the LITERAL text '&#8217;'
    assert(un("dbl&amp;#8217;") == "dbl&#8217;")
    assert(un("A &amp;lt;kept&amp;gt; &lt;x&gt;") == "A &lt;kept&gt; <x>")
    // &apos; (the XML fifth) decodes; unknown named entities survive
    assert(un("&apos;ok&bogus;&ampx") == "'ok&bogus;&ampx")
    // entity-free fast path + null
    assert(un("no entities here") == "no entities here")
    assert(Seq[Option[String]](None).toDF("h")
      .select(org.apache.spark.sql.functions.call_function("html_unescape", $"h"))
      .collect()(0).isNullAt(0))
  }

  test("HtmlKernels.html_to_text: block boundaries become newlines, chrome subtrees " +
    "drop whole, entities decode, whitespace collapses PER LINE, malformed degrades") {
    import spark.implicits._
    def x(s: String): String =
      Seq(s).toDF("h").select(TextOps.htmlToText($"h")).collect()(0).getString(0)
    // block tags emit newlines; inline tags keep author spacing
    assert(x("<h1>Title</h1><p>Hello <b>world</b></p><p>Next</p>") ==
      "Title\nHello world\nNext")
    assert(x("line one<br>line two<br/>line three") ==
      "line one\nline two\nline three")
    assert(x("<ul><li>a</li><li>b</li></ul><div>c</div>") == "a\nb\nc")
    assert(x("<table><tr><td>r1c1</td><td>r1c2</td></tr><tr><td>r2</td></tr></table>") ==
      "r1c1 r1c2\nr2")
    // chrome subtrees vanish WITH content: head (incl. title/style), nav,
    // footer, aside; script raw-text with a '<' inside never re-parses
    assert(x("<html><head><title>t</title><style>p{color:red}</style></head>" +
      "<body><nav>home about</nav><p>prose</p>" +
      "<script>if (1 < 2) { x(); }</script>" +
      "<aside>related links</aside><footer>copyright corp</footer></body></html>") ==
      "prose")
    // nested same-tag chrome: depth counting finds the MATCHING close
    assert(x("<nav>outer <nav>inner</nav> still chrome</nav><p>kept</p>") == "kept")
    // unclosed <head> ends at <body> (HTML5 optional </head>); unclosed
    // nav swallows to end — degrade to less text, never guess
    assert(x("<html><head><title>t</title><body><p>kept</p></body></html>") == "kept")
    assert(x("<p>kept</p><nav>menu <p>swallowed</p>") == "kept")
    // comments, doctype, processing instructions vanish; '>' inside a
    // quoted attribute value does NOT close its tag
    assert(x("<!DOCTYPE html><!-- note --><?xml v?><p>a</p>") == "a")
    assert(x("""<p title="a > b">c</p>""") == "c")
    assert(x("<!-- unterminated comment <p>gone</p>") == "")
    // entities decode after tag strip: &lt; is literal, never re-parsed;
    // &amp;-last law holds
    assert(x("<p>A &amp; B &lt;tag&gt; &#8217;s &nbsp;end</p>") ==
      "A & B <tag> ’s end")
    assert(x("<p>&amp;lt;kept&amp;gt;</p>") == "&lt;kept&gt;")
    // per-line collapse: intra-line runs collapse, lines trim, EMPTY
    // lines drop, but distinct blocks stay distinct lines
    assert(x("<div>  a\t b  </div><div>   </div><div>c</div>") == "a b\nc")
    assert(x("<pre>  keep   structure? no: collapsed  </pre>") ==
      "keep structure? no: collapsed")
    // malformed: unclosed tag strips to end-of-input; stray '<'/'>' are text
    assert(x("pre <div class='x' post") == "pre")
    assert(x("a < b and c > d") == "a < b and c > d")
    // tag-free text passes through with per-line collapse intact
    assert(x("line1\n\n  line2  \nline3") == "line1\nline2\nline3")
    // chrome-only page → empty string; null in → null out
    assert(x("<nav>only chrome</nav>") == "")
    assert(Seq[Option[String]](None).toDF("h")
      .select(TextOps.htmlToText($"h")).collect()(0).isNullAt(0))
  }

  test("HtmlKernels.html_title laws: first <title> before <body>, entity " +
    "decode + one-line collapse, script-skip, NULL for absent, '' for " +
    "present-but-empty") {
    import spark.implicits._
    def t(s: String): Option[String] =
      Seq(s).toDF("h").select(TextOps.htmlTitle($"h"))
        .as[Option[String]].collect().head
    assert(t("<html><head><title>My Page</title></head><body>x</body></html>")
      .contains("My Page"))
    // entity decode + whitespace collapse to ONE trimmed line
    assert(t("<title>  A &amp; B\n\t &#8217;s  guide </title>")
      .contains("A & B ’s guide"))
    // a <title> spelled inside script raw-text is code, not a title
    assert(t("<head><script>var t=\"<title>not me</title>\";</script>" +
      "<title>real</title></head><body></body>").contains("real"))
    // FIRST title wins; a title inside body (SVG) is not the doc title
    assert(t("<title>one</title><title>two</title>").contains("one"))
    assert(t("<body><svg><title>svg label</title></svg></body>").isEmpty)
    // absence is NULL; present-but-empty is ''
    assert(t("<html><head></head><body>no title</body></html>").isEmpty)
    assert(t("<title></title><body></body>").contains(""))
    // unclosed title captures to end of input (strip-to-end law);
    // attributes on the tag are honored
    assert(t("<title data-x=\"a > b\">tail text").contains("tail text"))
    // null in -> null out
    assert(Seq[Option[String]](None).toDF("h")
      .select(TextOps.htmlTitle($"h")).collect()(0).isNullAt(0))
  }

  test("JsonKernels.json_text laws: string values harvest in order as " +
    "block lines, keys/numbers/bools silent, escapes decode, strict " +
    "refusal for non-JSON, '' for valid-but-text-free") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def j(s: String): Option[String] =
      Seq(s).toDF("s").select(TextOps.jsonText($"s"))
        .as[Option[String]].collect().head
    // values in document order; keys are schema, numbers/bools silent
    assert(j("""{"title": "one", "tags": ["a", "b"], "n": 42, "ok": true,
      "meta": {"note": "deep"}}""").contains("one\na\nb\ndeep"))
    // escape decode: \n inside a value is a REAL line break (block law);
    // \u decodes; \" and \\ decode
    assert(j("{\"a\": \"line1\\nline2\", \"b\": \"x\\u0020y\", " +
      "\"c\": \"q\\\"q \\\\ end\"}")
      .contains("line1\nline2\nx y\nq\"q \\ end"))
    // top-level array and bare string work; whitespace tolerated
    assert(j("""  [ "x" , { "k" : "y" } , 3 ]  """).contains("x\ny"))
    assert(j("\"solo\"").contains("solo"))
    // valid but text-free -> '' (distinct from malformed -> NULL)
    assert(j("""{"n": 1, "m": [2, false, null]}""").contains(""))
    // a UTF-8 BOM surviving byte decode is not content — valid JSON
    // behind it must not count as refusal mass
    assert(j("\uFEFF{\"a\": \"bom ok\"}").contains("bom ok"))
    // strict refusals: trailing garbage, unterminated, bad escape, bare
    // word, raw control char in a string, over-deep nesting
    assert(j("""{"a": "b"} extra""").isEmpty)
    assert(j("""{"a": "b" """).isEmpty)
    assert(j("""{"a": "b\q"}""").isEmpty)
    assert(j("not json at all").isEmpty)
    assert(j("{\"a\": \"x\ny\"}").isEmpty) // raw newline inside string
    assert(j("[" * 100 + "\"x\"" + "]" * 100).isEmpty) // depth > 64
    // null in -> null out
    assert(Seq[Option[String]](None).toDF("s")
      .select(TextOps.jsonText($"s")).collect()(0).isNullAt(0))
  }

  test("HtmlKernels.xml_text laws: feed fields are block lines, CDATA " +
    "content extracts through the html law without double entity decode, " +
    "head is NOT chrome in feed mode") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def x(s: String): String =
      Seq(s).toDF("s").select(TextOps.xmlText($"s"))
        .collect()(0).getString(0)
    // RSS shape: each field its own line; PI and comments vanish;
    // METADATA elements (link/guid/pubDate/enclosure — URLs and
    // timestamps, schema not prose) drop whole, including the
    // self-closing enclosure form (no subtree to swallow)
    assert(x("<?xml version=\"1.0\"?><!-- gen --><rss><channel>" +
      "<title>My Feed</title><link>https://ex.com/f</link>" +
      "<item><title>post one</title>" +
      "<guid>https://ex.com/p?id=1</guid>" +
      "<pubDate>Mon, 01 Jan 2026</pubDate>" +
      "<enclosure url=\"https://ex.com/a.mp3\" length=\"1\"/>" +
      "<description>real prose</description></item></channel></rss>") ==
      "My Feed\npost one\nreal prose")
    // CDATA: embedded HTML extracted by the html law (tags become
    // structure, not noise), framed as its own block
    assert(x("<item><description><![CDATA[<p>Hello <b>world</b></p>" +
      "<nav>chrome</nav>]]></description></item>") == "Hello world")
    // the DOMINANT real form: entity-ESCAPED html inside description/
    // content — one transport decode, then the html law (chrome drops,
    // content-layer entities decode once; literal '<p>' never survives
    // as a noise line)
    assert(x("<item><description>&lt;p&gt;Hello &amp;amp; hi&lt;/p&gt;" +
      "&lt;nav&gt;chrome&lt;/nav&gt;</description></item>") ==
      "Hello & hi")
    assert(x("<feed><entry><content type=\"html\">&lt;h1&gt;Title" +
      "&lt;/h1&gt;&lt;p&gt;body text&lt;/p&gt;</content></entry></feed>") ==
      "Title\nbody text")
    // a PLAIN-TEXT description value passes through with one net decode
    assert(x("<item><description>A &amp; B plain</description></item>") ==
      "A & B plain")
    // CDATA is literal: '&amp;' inside CDATA is the FOUR characters
    // &,a,m,p,; (plus the entity decode of the html pass) and must not
    // double-decode; entities OUTSIDE CDATA decode once
    assert(x("<item><t>A &amp; B</t><d><![CDATA[keep &amp;lt; verbatim]]>" +
      "</d></item>") == "A & B\nkeep &lt; verbatim")
    // Atom entries (their <id> is metadata and drops); head/nav are
    // ordinary elements in feed mode
    assert(x("<feed><entry><id>urn:uuid:abc</id><title>e1</title>" +
      "<summary>s1</summary></entry></feed>") == "e1\ns1")
    assert(x("<doc><head>not chrome here</head><nav>kept</nav></doc>") ==
      "not chrome here\nkept")
    // unterminated CDATA captures to end (degrade to less structure,
    // never throw); null in -> null out
    assert(x("<item><d><![CDATA[tail text") == "tail text")
    assert(Seq[Option[String]](None).toDF("s")
      .select(TextOps.xmlText($"s")).collect()(0).isNullAt(0))
    // application/xhtml+xml is a WEB PAGE serving mime, not a feed:
    // extractText keeps the html route so nav/head chrome still drops
    val xhtml = ("<html><head><title>t</title></head><body>" +
      "<nav>menu</nav><p>prose</p></body></html>").getBytes("UTF-8")
    assert(Seq((xhtml, "application/xhtml+xml")).toDF("c", "m")
      .select(TextOps.extractText($"c", $"m"))
      .as[String].collect().head == "prose")
  }

  test("Corpus.mediaRefusalCard: a VP8-lossy WebP is COUNTED refused " +
    "mass (docs and exact bytes), not silently dropped; decodable media " +
    "and extractable text count zero") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // a real decodable PNG, a VP8-LOSSY webp (pixel decode refuses —
    // the documented pure-JDK blind spot), a corrupt PDF, good html
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val lossy = graft.expressions.ImageKernels.synthWebp(0L) // VP8 framing
    val badPdf = graft.expressions.PdfKernels.synthPdf(7L)
    val html = "<p>fine</p>".getBytes("UTF-8")
    val rows = Seq(
      (1L, "image/png", png), (2L, "image/webp", lossy),
      (3L, "application/pdf", badPdf), (4L, "text/html", html))
      .toDF("id", "mime", "content")
      .withColumn("ok",
        when($"mime".startsWith("image/"),
          when(graft.ops.Multimodal.decodeImage($"content").isNotNull,
            lit("decoded")))
          .otherwise(graft.ops.TextOps.extractText($"content", $"mime")))
    val card = graft.ops.Corpus
      .mediaRefusalCard(rows, "mime", "content", "ok")
      .select("media_type", "n_docs", "n_refused", "total_bytes",
        "refused_bytes")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(card("image/webp") ==
      (("image/webp", 1L, 1L, lossy.length.toLong, lossy.length.toLong)),
      s"VP8-lossy refusal counted with its exact byte mass: $card")
    assert(card("image/png") ==
      (("image/png", 1L, 0L, png.length.toLong, 0L)), s"$card")
    assert(card("application/pdf") ==
      (("application/pdf", 1L, 1L, badPdf.length.toLong,
        badPdf.length.toLong)), s"$card")
    assert(card("text/html") ==
      (("text/html", 1L, 0L, html.length.toLong, 0L)), s"$card")
  }

  test("TextOps.canonicalizeUrl: variants collapse, ports/fragments/tracking handled, " +
    "root path and param sort stable") {
    import spark.implicits._
    import graft.ops.TextOps
    def canon(s: String): String =
      Seq(s).toDF("u").select(TextOps.canonicalizeUrl($"u")).collect()(0).getString(0)
    // the crawl-dedup property: cosmetic variants collapse to one key
    val variants = Seq(
      "HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "https://example.com/a/b?a=1&b=2",
      "https://EXAMPLE.com:443/a/b/?b=2&utm_campaign=y&a=1")
    assert(variants.map(canon).distinct == Seq("https://example.com/a/b?a=1&b=2"),
      variants.map(canon).toString)
    // non-default port survives; default port for the OTHER scheme survives
    assert(canon("http://h.com:8080/x") == "http://h.com:8080/x")
    assert(canon("http://h.com:443/x") == "http://h.com:443/x")
    assert(canon("https://h.com:80/x") == "https://h.com:80/x")
    // root path keeps its slash; all-tracking query drops the '?'
    assert(canon("https://h.com/?utm_source=a&gclid=b") == "https://h.com/")
    assert(canon("HTTP://H.com:80/") == "http://h.com/")
    // a 'ref' param drops, but 'referrer=' and 'prefix=' survive (anchored)
    assert(canon("https://h.com/p?ref=x&referrer=y&prefix=z") ==
      "https://h.com/p?prefix=z&referrer=y")
    // null passthrough
    assert(Seq[Option[String]](None).toDF("u")
      .select(TextOps.canonicalizeUrl($"u")).collect()(0).isNullAt(0))
  }

  test("TextOps.canonicalizeUrl percent-encoding: unreserved escapes decode " +
    "and collapse, reserved escapes survive with uppercased hex, " +
    "%25 never decodes (no new-escape injection)") {
    import spark.implicits._
    import graft.ops.TextOps
    def canon(s: String): String =
      Seq(s).toDF("u").select(TextOps.canonicalizeUrl($"u")).collect()(0).getString(0)
    // unreserved set decodes everywhere — path, param name, param value —
    // so escaped spellings collapse with the bare one
    assert(canon("https://h.com/p%61ge/%7Ealice?%61=%31") ==
      canon("https://h.com/page/~alice?a=1"))
    assert(canon("https://h.com/A%2Da.b%5Fc") == "https://h.com/A-a.b_c")
    // reserved escapes MUST NOT decode (decoding %2F would merge distinct
    // resources); their hex uppercases, both nibble positions
    assert(canon("https://h.com/a%2fb%3a1?x=%2fv%3a7") ==
      "https://h.com/a%2Fb%3A1?x=%2Fv%3A7")
    assert(canon("https://h.com/%aB%Cd") == "https://h.com/%AB%CD")
    // %25 ('%') is reserved: '%2541' is escape %25 + literal "41", and the
    // chain never manufactures a new escape out of it
    assert(canon("https://h.com/x%2541") == "https://h.com/x%2541")
    assert(canon("https://h.com/x%2561") == "https://h.com/x%2561")
    // a '%' not followed by two hex digits passes through untouched
    assert(canon("https://h.com/100%zz") == "https://h.com/100%zz")
  }

  test("TextOps.langIdNgram: the trigram profiles identify all 10 planted " +
    "languages (accuracy floor 10/10 on held-out sentences distinct from the " +
    "seeds); trigram-less text is 'und'; the marker tier stays available") {
    import spark.implicits._
    import graft.ops.TextOps
    val plants = Seq(
      "en" -> "the children walk to the school in the morning and they read books with the teacher",
      "es" -> "los niños caminan a la escuela por la mañana y leen libros con el maestro en la ciudad",
      "fr" -> "les enfants marchent vers la maison le matin et ils lisent des livres avec le professeur dans la ville",
      "de" -> "die kinder gehen am morgen in die schule und sie lesen bücher mit dem lehrer in der stadt",
      "pt" -> "as crianças caminham para a escola de manhã e leem livros com o professor na cidade",
      "it" -> "i bambini camminano verso la scuola al mattino e leggono libri con il maestro nella città",
      "ru" -> "дети идут в школу утром и читают книги с учителем в городе каждый день недели",
      "ar" -> "يذهب الأطفال إلى المدرسة في الصباح ويقرؤون الكتب مع المعلم في المدينة كل يوم",
      "ja" -> "子供たちは朝に学校へ歩いて行き、先生と一緒に本を読みます。毎日街の中で遊びます。",
      "zh" -> "孩子们早上走路去学校，他们和老师一起读书。每天在城市里玩耍。")
    val got = plants.toDF("expected", "text")
      .select($"expected", TextOps.langIdNgram($"text").as("predicted"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val wrong = got.filter { case (e, p) => e != p }
    assert(wrong.isEmpty, s"misclassified plants: ${wrong.mkString(", ")}")
    // und only for trigram-less text; whitespace-only and empty qualify
    val und = Seq("", "   ", "\t\n").toDF("text")
      .select(TextOps.langIdNgram($"text")).collect().map(_.getString(0))
    assert(und.forall(_ == "und"), und.mkString(","))
    // a single char plus padding IS a trigram — classified, not und
    assert(Seq("a").toDF("text").select(TextOps.langIdNgram($"text"))
      .collect()(0).getString(0) != "und")
    // null passthrough
    assert(Seq[Option[String]](None).toDF("text")
      .select(TextOps.langIdNgram($"text")).collect()(0).isNullAt(0))
  }

  test("UrlKernels.idn_ascii: unicode and punycode host spellings collapse to one " +
    "canonical key; ASCII hosts are fixpoints; malformed hosts fall back lowercased") {
    import spark.implicits._
    import graft.ops.TextOps
    def idn(s: String): String =
      Seq(s).toDF("h").select(TextOps.idnAsciiHost($"h")).collect()(0).getString(0)
    // twins collapse, case-insensitively, and punycode is a fixpoint
    assert(idn("bücher.de") == "xn--bcher-kva.de")
    assert(idn("BÜCHER.DE") == "xn--bcher-kva.de")
    assert(idn("xn--bcher-kva.de") == "xn--bcher-kva.de")
    assert(idn("münchen.de") == "xn--mnchen-3ya.de")
    assert(idn("東京.jp") == "xn--1lqs71d.jp")
    // ASCII fast path: lowercase only
    assert(idn("Example.COM") == "example.com")
    assert(idn("example.com") == "example.com")
    assert(idn("") == "")
    // IDNA-rejected host (empty label): deterministic lowercase fallback
    assert(idn("BAD..HÖST") == "bad..höst")
    // null passthrough
    assert(Seq[Option[String]](None).toDF("h")
      .select(TextOps.idnAsciiHost($"h")).collect()(0).isNullAt(0))
    // end-to-end: canonicalizeUrl gives both spellings ONE key
    def canon(s: String): String =
      Seq(s).toDF("u").select(TextOps.canonicalizeUrl($"u")).collect()(0).getString(0)
    assert(canon("https://BÜcher.de/a?b=2&a=1") == canon("https://xn--bcher-kva.de/a?a=1&b=2"))
    assert(canon("https://bücher.de/a") == "https://xn--bcher-kva.de/a")
  }

  test("UrlKernels.pct_normalize: the one-pass kernel is bit-identical to the " +
    "78-expression replace chain the oracle replays, across the adversarial " +
    "escape space") {
    import spark.implicits._
    import graft.ops.TextOps
    val fixtures = Seq(
      // clean / no-escape fast path
      "https://h.com/plain", "", "no escapes at all",
      // unreserved decodes, every case mix
      "%61%41%30%2d%2e%5f%7e", "%6a%6A%4a%4A",
      // reserved escapes: hex fold only, both nibbles, all case mixes
      "%2f%2F%3a%3A%aB%Ab%ab%AB%cd%dc%ef%fe",
      // %25 must never manufacture a new escape
      "x%2541 y%2561 z%25%25 %252541",
      // bare/truncated/malformed percents
      "%", "%%", "%g1", "%1g", "%a", "%1", "100%zz", "a%", "tail%4",
      // adjacent + overlapping-looking runs
      "%%41", "%2%41", "%a%41", "%41%42%43", "%aa%aa", "%fa%af",
      // escapes at string edges
      "%41end", "start%7E", "%41", "%7e",
      // unicode payload around escapes
      "café/%61/über?x=%7e☃",
      // long degenerate run
      "%61" * 50 + "%2f" * 50 + "%" * 7)
    val df = fixtures.toDF("u")
    val rows = df.select(
      TextOps.pctNormalizeUrl($"u").as("kernel"),
      TextOps.pctNormalizeUrlChain($"u").as("chain")).collect()
    rows.zip(fixtures).foreach { case (r, f) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel/chain diverge on '$f': '${r.getString(0)}' vs '${r.getString(1)}'")
    }
    // null passthrough
    assert(Seq[Option[String]](None).toDF("u")
      .select(TextOps.pctNormalizeUrl($"u")).collect()(0).isNullAt(0))
  }

  test("Dedup: exact-substring span dedup cuts every duplicated window occurrence") {
    // n=3 windows, hand-computable: a and b share the span "s1 s2 s3"
    // (cross-doc dup), d repeats its own 3-window internally (within-doc
    // dup, fully covered -> drops out), c is unique, e is shorter than a
    // window (untouched even though its tokens appear inside others' spans)
    val docs = Seq(
      (1L, "x1 x2 s1 s2 s3 x3"),
      (2L, "y1 s1 s2 s3 y2 y3"),
      (3L, "z1 z2 z3 z4"),
      (4L, "w1 w2 w3 w1 w2 w3"),
      (5L, "s1 s2")).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (1L, "x1 x2 x3", 6L, 3L),   // span at p=3 cut
      (2L, "y1 y2 y3", 6L, 3L),   // same span at p=2 cut
      (3L, "z1 z2 z3 z4", 4L, 4L), // unique windows survive whole
      (5L, "s1 s2", 2L, 2L)),     // sub-window doc untouched; doc 4 fully cut
      s"unexpected span-dedup output: $out")

    // identical twin docs: EVERY window duplicated -> both drop out
    // entirely, and uninvolved docs are untouched
    val twins = Seq(
      (1L, "t1 t2 t3 t4 t5"), (2L, "t1 t2 t3 t4 t5"), (3L, "u1 u2 u3 u4")
    ).toDF("doc_id", "text")
    val twinOut = Dedup.exactSubstringDedup(twins, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(twinOut == Set((3L, "u1 u2 u3 u4")), s"twin handling wrong: $twinOut")

    // n=1 degenerates to token-level dedup: any token occurring twice
    // anywhere is cut everywhere
    val tokLevel = Dedup.exactSubstringDedup(
      Seq((1L, "a b c"), (2L, "b d")).toDF("doc_id", "text"), "doc_id", "text", n = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tokLevel == Set((1L, "a c"), (2L, "d")), s"n=1 semantics wrong: $tokLevel")
  }

  test("Dedup: keep-one span dedup — deterministic survivor, k-1 cuts, cut set ⊆ remove-all's") {
    // hand-computed survivor semantics: "a b c" occurs at (1,1) and (2,2);
    // the (id,p)-first occurrence (doc 1) survives, doc 2's copy is cut
    val docs = Seq((1L, "a b c d"), (2L, "x a b c y")).toDF("doc_id", "text")
    val kf = Dedup.exactSubstringDedupKeepFirst(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kf == Set((1L, "a b c d"), (2L, "x y")), s"survivor rule wrong: $kf")
    // remove-all on the same corpus cuts BOTH occurrences
    val ra = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ra == Set((1L, "d"), (2L, "x y")), s"remove-all baseline moved: $ra")

    // identical twins: the first doc survives WHOLE, the twin drops out
    val twins = Seq(
      (1L, "t1 t2 t3 t4 t5"), (2L, "t1 t2 t3 t4 t5"), (3L, "u1 u2 u3 u4")
    ).toDF("doc_id", "text")
    val twinKf = Dedup.exactSubstringDedupKeepFirst(twins, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(twinKf == Set((1L, "t1 t2 t3 t4 t5"), (3L, "u1 u2 u3 u4")),
      s"twin keep-one wrong: $twinKf")

    // PARITY LAW on a richer corpus: remove-all's kept tokens per doc are
    // a subsequence of keep-first's (survivors only SHRINK the cut set)
    val corpus = Seq(
      (1L, "y1 s1 s2 s3 y2 y3"), (2L, "x1 x2 s1 s2 s3 x3"),
      (3L, "q1 q2 q3 q1 q2 q3"), (4L, "z1 z2 z3 z4"),
      (5L, "z1 z2 z3 z9")).toDF("doc_id", "text")
    def byDoc(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val raM = byDoc(Dedup.exactSubstringDedup(corpus, "doc_id", "text", n = 3))
    val kfM = byDoc(Dedup.exactSubstringDedupKeepFirst(corpus, "doc_id", "text", n = 3))
    def isSubseq(small: Seq[String], big: Seq[String]): Boolean = {
      var i = 0
      big.foreach(t => if (i < small.length && small(i) == t) i += 1)
      i == small.length
    }
    raM.foreach { case (id, toksRa) =>
      val toksKf = kfM.getOrElse(id, Seq.empty)
      assert(isSubseq(toksRa, toksKf),
        s"doc $id: remove-all kept $toksRa is not a subsequence of keep-first $toksKf")
    }
    // and keep-first never keeps LESS than remove-all anywhere
    assert(raM.keySet.subsetOf(kfM.keySet))
  }

  test("Dedup: incremental span dedup == batch span dedup over the union, restricted to the batch") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val corpus = Seq(
      (2L, "x1 x2 s1 s2 s3 x3"),     // shares the s-span with batch doc 1
      (4L, "w1 w2 w3 w4 w5"),
      (6L, "r1 r2 r3 r1 r2 r3")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "y1 s1 s2 s3 y2 y3"),     // cross-BATCH-vs-STORE dup -> cut
      (3L, "z1 z2 z3 z4"),           // unique -> untouched
      (5L, "q1 q2 q3 q1 q2 q3"),     // within-batch-doc dup -> fully cut
      (7L, "y1 s1 s2"),              // sub-window spans only -> untouched
      (9L, "z1 z2 z3 z9")).toDF("doc_id", "text") // shares window z1z2z3 with 3
    val seen = Dedup.substringWindowCounts(corpus, "doc_id", "text", n = 3)
    val inc = rows(Dedup.exactSubstringDedupIncremental(batch, seen, "doc_id", "text", n = 3))

    // the law: identical to running the batch operator over store ∪ batch
    // and keeping the batch's documents
    val full = rows(Dedup.exactSubstringDedup(
      corpus.unionByName(batch), "doc_id", "text", n = 3)
      .where($"id" % 2 =!= 0))
    assert(inc == full, s"incremental $inc != batch-over-union $full")
    // spot-check the semantics: doc 1 loses the s-span against the STORE
    // and its y1-s1-s2 window against batch doc 7 (positions 1-4 cut), doc
    // 5 self-destructs within-batch, docs 3 and 9 lose their shared
    // window, and doc 7 (one window, duplicated) drops out entirely
    val byId = inc.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == "y2 y3", byId.toString)
    assert(!byId.contains(5L), "within-batch duplicated doc must drop out")
    assert(!byId.contains(7L), "fully-covered batch doc must drop out")
    assert(byId(3L) == "z4" && byId(9L) == "z9", byId.toString)

    // store maintenance is ADDITION: counts(corpus) ++ counts(batch)
    // summed == counts(corpus ∪ batch) — the never-rescan contract
    val summed = seen.unionByName(Dedup.substringWindowCounts(batch, "doc_id", "text", n = 3))
      .groupBy("h").agg(sum("c").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.substringWindowCounts(
      corpus.unionByName(batch), "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(summed == direct, "window-count store is not additive")
  }

  test("Dedup: PERSISTED window-count store — one-call ingest equals the direct " +
    "incremental pass, counts fold by addition across appends, guards fail loud") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val corpus = Seq(
      (2L, "x1 x2 s1 s2 s3 x3"),
      (4L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val batchB = Seq(
      (1L, "y1 s1 s2 s3 y2 y3"),
      (3L, "z1 z2 z3 z4")).toDF("doc_id", "text")
    val batchC = Seq(
      (5L, "z1 z2 z3 q9"),           // dup only against BATCH B's counts —
      (7L, "w3 w4 w5 k1")).toDF("doc_id", "text") // dup against the BOOTSTRAP corpus

    val dir = tmpDir("span_store")
    intercept[IllegalStateException](Dedup.readWindowCounts(spark, dir))
    Dedup.writeWindowCounts(corpus, dir, "doc_id", "text", n = 3)
    intercept[IllegalArgumentException](
      Dedup.writeWindowCounts(corpus, dir, "doc_id", "text", n = 3))

    // one-call ingest of B == direct incremental against counts(corpus)
    val gotB = rows(Dedup.exactSubstringDedupIncrementalIndexed(
      batchB, dir, "doc_id", "text"))
    val wantB = rows(Dedup.exactSubstringDedupIncremental(
      batchB, Dedup.substringWindowCounts(corpus, "doc_id", "text", 3),
      "doc_id", "text", n = 3))
    assert(gotB == wantB, s"$gotB != $wantB")

    // the store folded B's counts by ADDITION: ingesting C now sees
    // corpus ∪ B — doc 5 dups against B's z-window, doc 7 against the
    // bootstrap corpus's w-window
    val gotC = rows(Dedup.exactSubstringDedupIncrementalIndexed(
      batchC, dir, "doc_id", "text"))
    val wantC = rows(Dedup.exactSubstringDedupIncremental(
      batchC,
      Dedup.substringWindowCounts(
        corpus.unionByName(batchB), "doc_id", "text", 3),
      "doc_id", "text", n = 3))
    assert(gotC == wantC, s"$gotC != $wantC")
    val byId = gotC.map(t => t._1 -> t._2).toMap
    assert(byId(5L) == "q9" && byId(7L) == "k1", byId.toString)

    // and the final store equals a from-scratch count of everything
    val stored = Dedup.readWindowCounts(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.substringWindowCounts(
      corpus.unionByName(batchB).unionByName(batchC), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == direct, "persisted counts diverged from a fresh count")
  }

  test("Multimodal.imageNearDuplicates: perceptual-hash pairs via the simhash band machinery") {
    import spark.implicits._
    def png(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val gradient = png((x, _) => x * 4)
    val gradientTweaked = png((x, y) => if (x == 10 && y == 10) 255 else x * 4)
    val inverse = png((x, _) => 255 - x * 4)
    val assets = Seq(
      (1L, gradient), (2L, gradient), (3L, gradientTweaked),
      (4L, inverse), (5L, Array[Byte](1, 2, 3))).toDF("id", "content")
    val pairs = graft.ops.Multimodal.imageNearDuplicates(assets, "id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // identical pixels → hamming 0; a one-pixel tweak stays within the
    // band threshold; the inverted gradient (mirrored bits) never pairs;
    // undecodable bytes drop out instead of crashing the scan
    assert(pairs.contains((1L, 2L, 0)), pairs.toString)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L), "near-identical image missed")
    assert(pairs.forall(p => p._1 != 4L && p._2 != 4L), "inverse gradient must not pair")
    assert(pairs.forall(p => p._1 != 5L && p._2 != 5L), "garbage bytes must be excluded")
    // the hash itself is deterministic and re-encode-stable (same pixels,
    // fresh PNG encode → identical 64-bit fingerprint)
    GraftExtensions.register(spark)
    val hs = Seq((1L, gradient), (2L, png((x, _) => x * 4))).toDF("id", "content")
      .select(call_function("image_ahash", col("content")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
  }

  test("Multimodal feature store: decode once at ingest, indexed near-dup == decode path, " +
    "upsert idempotent, delete retires pairs") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val base = Seq(
      (1L, "image", 10L), (2L, "image", 10L), (3L, "image", 11L),
      (4L, "audio", 7L), (5L, "audio", 7L), (6L, "audio", 9L))
      .toDF("asset_id", "modality", "pk")
      .withColumn("content_raw",
        when($"modality" === "image", call_function("synth_image", $"pk"))
          .otherwise(call_function("synth_wav", $"pk")))
      .unionByName(Seq((7L, "image", 0L)).toDF("asset_id", "modality", "pk")
        .withColumn("content_raw", lit(Array[Byte](1, 2, 3))))
    val assets = Multimodal.asAsset(
      $"asset_id", $"modality", $"content_raw", lit("src"))(base)
    val dir = tmpDir("mm_store")
    Multimodal.writeFeatureStore(assets, dir)

    val store = Multimodal.readFeatureStore(spark, dir)
    assert(store.count() == 7)
    // undecodable payload: failure recorded (row present, null fingerprint)
    assert(store.where($"asset_id" === 7L && $"simhash".isNull).count() == 1)
    // modality dispatch: the matching stats struct is populated, others null
    assert(store.where($"modality" === "image" && $"asset_id" =!= 7L)
      .where($"img".isNull || $"audio".isNotNull).isEmpty)
    assert(store.where($"modality" === "audio")
      .where($"audio".isNull || $"img".isNotNull).isEmpty)

    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the store serves the SAME pairs the decode path computes — zero
    // payload bytes read at serve time
    val direct = pset(Multimodal.imageNearDuplicates(
      assets.where($"modality" === "image"), "asset_id", "content"))
    assert(pset(Multimodal.imageNearDuplicatesIndexed(spark, dir)) == direct)
    assert(direct.contains((1L, 2L, 0)), direct.toString)
    val audioPairs = pset(Multimodal.audioNearDuplicatesIndexed(spark, dir))
    assert(audioPairs == pset(Multimodal.audioNearDuplicates(
      assets.where($"modality" === "audio"), "asset_id", "content")))
    assert(audioPairs.contains((4L, 5L, 0)), audioPairs.toString)

    // re-ingesting a subset is idempotent (upsert by key, last writer wins)
    Multimodal.writeFeatureStore(assets.where($"asset_id" <= 3L), dir)
    assert(pset(Multimodal.imageNearDuplicatesIndexed(spark, dir)) == direct)

    // takedown: the deleted asset's feature row and all its pairs vanish
    Multimodal.deleteFromFeatureStore(
      Seq(("image", 2L)).toDF("modality", "asset_id"), dir)
    val after = pset(Multimodal.imageNearDuplicatesIndexed(spark, dir))
    assert(after == direct.filterNot(p => p._1 == 2L || p._2 == 2L), after.toString)
  }

  test("Multimodal.resizeImage: exact block means, upscale and garbage null") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // 4x2 image, distinct pixel values -> 2x1 resize averages each half
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val vals = Seq(Seq(10, 20, 30, 40), Seq(50, 60, 70, 80))
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = vals(y)(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq((1L, baos.toByteArray), (2L, Array[Byte](1, 2))).toDF("id", "content")
    val decoded = df.select(col("id"),
        graft.ops.Multimodal.decodeImage(
          graft.ops.Multimodal.resizeImage(col("content"), 2, 1)).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // left block mean = (10+20+50+60)/4 = 35; right = (30+40+70+80)/4 = 55
    val f = decoded(1L).get.asInstanceOf[org.apache.spark.sql.Row]
    assert((f.getInt(0), f.getInt(1), f.getLong(2)) == ((2, 1, 2L)))
    assert(f.getLong(3) == 90L && f.getLong(4) == 90L && f.getLong(5) == 90L) // 35+55 per channel
    assert(decoded(2L).isEmpty, "garbage bytes must resize to NULL")
    // an upscale request is null, not an invented interpolation
    assert(df.where(col("id") === 1)
      .select(graft.ops.Multimodal.resizeImage(col("content"), 8, 8))
      .collect()(0).isNullAt(0))
  }

  test("Multimodal.audioNearDuplicates: energy-fingerprint pairs, garbage excluded") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val wav1 = graft.expressions.AudioKernels.synthWav(1L)
    val wav9 = graft.expressions.AudioKernels.synthWav(9L)
    val assets = Seq(
      (1L, wav1), (2L, wav1), (3L, wav9), (4L, Array[Byte](9, 9, 9))).toDF("id", "content")
    val pairs = graft.ops.Multimodal.audioNearDuplicates(assets, "id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)), s"identical payloads must pair: $pairs")
    assert(pairs.forall(p => p._1 != 4L && p._2 != 4L), "garbage bytes must be excluded")
    // the two planted tracks have pseudo-random energy profiles — their
    // fingerprints sit far apart (deterministic fixture, stable assertion)
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), pairs.toString)
    // fingerprint is a pure function of the decoded samples: re-reading
    // the same payload yields the same 64 bits
    val hs = Seq((1L, wav1), (2L, wav1)).toDF("id", "content")
      .select(call_function("audio_fingerprint", col("content")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
  }

  test("Dedup.editDistancePairs: brute-force parity, multiset grams, threshold cut") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq(
      1L -> "acme corp", 2L -> "acme corp.", 3L -> "acme corp", 4L -> "acme inc",
      5L -> "aaaa", 6L -> "aaab", 7L -> "aaaaa", 8L -> "zeta",
      9L -> "completely different")
    def truth(d: Int) = (for {
      (i, a) <- names; (j, b) <- names if i < j && lev(a, b) <= d
    } yield (i, j, lev(a, b))).toSet
    val df = names.toDF("id", "name")
    def run(d: Int) = Dedup.editDistancePairs(df, "id", "name", maxDist = d, q = 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // d=1: exact dups (0), substitution, trailing '.', single insert — and
    // nothing beyond; the prefix filter must be invisible in the result
    assert(run(1) == truth(1), s"got ${run(1)}, want ${truth(1)}")
    assert(truth(1).contains((1L, 3L, 0)) && truth(1).contains((5L, 6L, 1)) &&
      truth(1).contains((5L, 7L, 1))) // the test corpus exercises all three edit kinds
    // widening the threshold widens the prefix (q·d+1) and the result
    assert(run(2) == truth(2))
    assert(run(2).contains((6L, 7L, 2)), "aaab↔aaaaa enters only at d=2")
  }

  test("entity resolution end-to-end: normalize -> fuzzy pairs -> clusters -> canonical survivors") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val vendors = Seq(
      (1L, "Acme Corp"), (2L, "acme  corp"), (3L, "Acme Corp."),
      (4L, "Globex Inc"), (5L, "globex inc"), (6L, "Wildly Different LLC"))
      .toDF("id", "name")
    val normed = vendors.select(col("id"),
      call_function("text_normalize", col("name")).as("name"))
    val pairs = Dedup.editDistancePairs(normed, "id", "name", maxDist = 1)
      .select("id_a", "id_b")
    val clusters = Dedup.clustersAuto(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {1,2,3} merge (case/whitespace via normalize, trailing '.' via edit
    // distance), {4,5} merge, 6 touches no pair and stays out of the map
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L),
      clusters.toString)
    // canonical survivors: one representative per entity + the singleton
    val survivors = Dedup.dropDuplicateClusters(vendors, pairs, "id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L, 6L), survivors.toString)
  }

  test("text_normalize: NFC unifies composed/decomposed, casefolds, collapses whitespace") {
    import graft.expressions.DocKernels
    def n(s: String): String = DocKernels.normalizeText(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(n("Café") == n("Café"), "NFC must unify the two Café spellings")
    assert(n("Café") == "café")
    assert(n("  A\t\tB\n C ") == "a b c")
    assert(n("") == "")
    // the expression path agrees with the kernel and passes nulls through
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq(Some("Café  X"), None).toDF("t")
      .select(call_function("text_normalize", col("t"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("café x", null))
  }

  test("Corpus.packedExamples: budget-bounded packs, ordered boundaries, oversize doc alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i j k l m n o"), // 10 tokens > budget
      (4L, "p q"), (5L, "r")).toDF("doc_id", "text")
    val got = Corpus.packedExamples(docs, "doc_id",
        TextOps.tokenCount(col("text")), budget = 6L, nBuckets = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getString(4), r.getString(5))).sortBy(_._1)
    // one bucket, id order: cum 3,5,15,17,18 → seqs 0,0,0(start 5<6? (5)//6=0... )
    // seq = (cum - n) DIV 6: doc1 (0)→0, doc2 (3)→0, doc3 (5)→0, doc4 (15)→2, doc5 (17)→2
    assert(got.map(g => (g._1, g._4)).toSeq ==
      Seq((0L, "1,2,3"), (2L, "4,5")), got.mkString("; "))
    // pack (0,0) holds docs 1,2,3: the 10-token doc joins because its
    // START (5) is under budget — packSequences' documented greedy
    // semantics (packs overflow by at most one document, never split one)
    val first = got.head
    assert(first._2 == 3 && first._3 == 15L && first._5 == "3,2,10")
    // every doc appears exactly once across all packs
    assert(got.map(_._4.split(",").length).sum == 5)
  }

  test("Profile.drift: identical slices score zero; disjoint slices saturate JSD at ln 2") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "z").toDF("k")
    val same = Profile.drift(a, a, "k").collect()(0)
    assert(same.getAs[Long]("n_keys_union") == 3)
    assert(math.abs(same.getAs[Double]("psi")) < 1e-12)
    assert(math.abs(same.getAs[Double]("jsd")) < 1e-12)
    // disjoint key sets: JSD hits its ln 2 ceiling exactly; PSI is positive
    // and every union key appears (full-outer completeness)
    val b = Seq("q", "q", "r").toDF("k")
    val dis = Profile.drift(a, b, "k").collect()(0)
    assert(dis.getAs[Long]("n_keys_ref") == 3 && dis.getAs[Long]("n_keys_cur") == 2)
    assert(dis.getAs[Long]("n_keys_union") == 5)
    assert(math.abs(dis.getAs[Double]("jsd") - math.log(2)) < 1e-9)
    assert(dis.getAs[Double]("psi") > 0)
    // hand-checked shifted case: ref {x:3, y:1}, cur {x:1, y:3}
    val ref = Seq("x", "x", "x", "y").toDF("k")
    val cur = Seq("x", "y", "y", "y").toDF("k")
    val psi = 2 * (0.75 - 0.25) * math.log(0.75 / 0.25) // symmetric pair of terms
    assert(math.abs(Profile.drift(ref, cur, "k").collect()(0).getAs[Double]("psi") - psi) < 1e-12)
    // an EMPTY current side: degenerate zero-share distribution — finite
    // maximal scores, never null/NaN poisoning
    val e = Profile.drift(a, Seq.empty[String].toDF("k"), "k").collect()(0)
    assert(e.getAs[Long]("n_keys_cur") == 0 && e.getAs[Long]("n_keys_union") == 3)
    val psiE = e.getAs[Double]("psi")
    val jsdE = e.getAs[Double]("jsd")
    assert(!psiE.isNaN && !psiE.isInfinite && psiE > 0, s"psi=$psiE")
    assert(math.abs(jsdE - 0.5 * math.log(2)) < 1e-9, s"jsd=$jsdE") // ½·Σp·ln2
  }

  test("TextOps.pmiCollocations: hand-checked PMI, minCount cut, deterministic tie order") {
    import spark.implicits._
    val docs = Seq("new york is big", "new york is old").toDF("text")
    val got = TextOps.pmiCollocations(docs, "text", minCount = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // U = 8 tokens, B = 6 pairs; both surviving pairs have count 2 with
    // component counts 2 and 2 → pmi = ln((2/6) / ((2/8)·(2/8))) rounded 6dp
    val expected = BigDecimal(math.log((2.0 / 6) / ((2.0 / 8) * (2.0 / 8))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 2, got.mkString(", "))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("new", "york"), ("york", "is")),
      "tie must break on (w1, w2) ascending")
    assert(got.forall(t => t._3 == 2L && math.abs(t._4 - expected) < 1e-9))
  }

  test("Profile.ddHistogram/ddQuantiles: alpha value-error bound, lossless shard fold") {
    import spark.implicits._
    val vals = (1 to 20000).map(i => i.toDouble / 7.0)
    val df = vals.toDF("x")
    val hist = Profile.ddHistogram(df, "x", alpha = 0.01)
    val got = Profile.ddQuantiles(hist, 0.01, Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sorted = vals.sorted
    for (p <- Seq(0.5, 0.99)) {
      val (n, est) = got(p)
      assert(n == 20000L)
      val truth = sorted(math.floor(p * (n - 1)).toInt)
      assert(math.abs(est / truth - 1) <= 0.0101,
        s"p=$p est=$est truth=$truth exceeds the alpha bound")
    }
    // merge IS addition: per-shard histograms folded == whole-corpus histogram
    val folded = (0 until 3).map(r =>
        Profile.ddHistogram(vals.zipWithIndex.collect {
          case (v, i) if i % 3 == r => v
        }.toDF("x"), "x", alpha = 0.01))
      .reduce(_ unionByName _)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val a = hist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = folded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "shard fold diverged from the whole-corpus histogram")
    // zero/negative/null excluded
    assert(Profile.ddHistogram(Seq(-1.0, 0.0, 2.0).toDF("x"), "x")
      .agg(sum("cnt")).collect()(0).getLong(0) == 1L)
  }

  test("Profile.hashSampleQuantiles: deterministic, partition-invariant, exact when k >= n") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val r1 = Profile.hashSampleQuantiles(df, "id", "x", k = 2000, probs = Seq(0.5))
      .collect()(0)
    assert(r1.getAs[Long]("n_sampled") == 2000L)
    val med = r1.getAs[Double]("value")
    assert(math.abs(med - 4999.5) < 500, s"median estimate off: $med") // ~4.5 sigma slack
    // partition layout cannot change the sample (hash membership, not scan order)
    val r7 = Profile.hashSampleQuantiles(df.repartition(7), "id", "x",
      k = 2000, probs = Seq(0.5)).collect()(0)
    assert(r7.getAs[Double]("value") == med)
    // k >= n: the sample IS the column — exact interpolated median
    val ex = Profile.hashSampleQuantiles(df, "id", "x", k = 20000, probs = Seq(0.5))
      .collect()(0)
    assert(ex.getAs[Long]("n_sampled") == 10000L && ex.getAs[Double]("value") == 4999.5)
    // a different salt draws a different sample
    val s2 = Profile.hashSampleQuantiles(df, "id", "x", k = 2000, probs = Seq(0.5),
      salt = "b").collect()(0)
    assert(s2.getAs[Double]("value") != med)
  }

  test("Corpus.sampleWeighted: size k, reproducible, weight-dominant row wins, bad weights excluded") {
    import spark.implicits._
    val base = (1 to 100).map(i => (i.toLong, 1.0)) :+ (999L, 1e12)
    val df = base.toDF("id", "w")
    val s1 = Corpus.sampleWeighted(df, "id", "w", k = 10).collect().map(_.getLong(0)).toSet
    val s2 = Corpus.sampleWeighted(df, "id", "w", k = 10).collect().map(_.getLong(0)).toSet
    assert(s1.size == 10 && s1 == s2, "weighted sample must be deterministic")
    assert(s1.contains(999L), "a weight 12 orders of magnitude above the rest must be drawn")
    // a different salt draws an independent sample (almost surely different)
    val s3 = Corpus.sampleWeighted(df, "id", "w", k = 10, salt = "b")
      .collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
    // null / zero / negative weights are never drawn, even with k > n
    val bad = Seq((1L, Some(2.0)), (2L, Some(0.0)), (3L, Some(-1.0)), (4L, None))
      .toDF("id", "w")
    assert(Corpus.sampleWeighted(bad, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("Similarity.binaryEncode: sign-bit packing incl. bit 63, zeros clear, multi-word") {
    import spark.implicits._
    // dims=64: bits 0 and 63 positive, everything else zero/negative
    val v = Array.tabulate(64)(i => if (i == 0) 0.5f else if (i == 63) 1e-9f
                                    else if (i == 1) 0.0f else -0.3f)
    val sig = Seq(Tuple1(v)).toDF("embedding")
      .select(Similarity.binaryEncode($"embedding", 64)).as[Seq[Long]].collect()(0)
    assert(sig == Seq(1L | (1L << 63)))
    // dims=70 spills into a second word: bit 69 → word 1, bit 5
    val v2 = Array.tabulate(70)(i => if (i == 69) 2.0f else -1.0f)
    val sig2 = Seq(Tuple1(v2)).toDF("embedding")
      .select(Similarity.binaryEncode($"embedding", 70)).as[Seq[Long]].collect()(0)
    assert(sig2 == Seq(0L, 1L << 5))
  }

  test("Similarity.binaryTopK: hamming ranking with id tie-break; rerank recovers exact order") {
    import spark.implicits._
    // 4-dim toy corpus; signs: q=[+,+,+,+]
    val vecs = Seq(
      (0L, Array(0.9f, 0.8f, 0.7f, 0.6f)),   // ham 0 to q
      (1L, Array(0.1f, 0.2f, 0.3f, -0.1f)),  // ham 1
      (2L, Array(0.5f, 0.5f, 0.5f, -0.5f)),  // ham 1 — ties with 1, id breaks
      (3L, Array(-1f, -1f, -1f, -1f)))       // ham 4
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(1f, 1f, 1f, 1f))).toDF("qid", "qvec")
    val codes = Similarity.binaryEncodeFrame(vecs, 4)
    val out = Similarity.binaryTopK(codes, queries, 4, 4)
      .orderBy("rank").select("vec_id", "ham").as[(Long, Int)].collect().toSeq
    assert(out == Seq((0L, 0), (1L, 1), (2L, 1), (3L, 4)))
    // rerank with shortlist = corpus: exact top-k == bruteForceTopK (the
    // recall ceiling law — the hamming stage only has to CONTAIN the top-k)
    val rr = Similarity.binaryTopKRerank(vecs, queries, 3, 4, 4)
      .orderBy("rank").select("vec_id", "dot").as[(Long, Long)].collect().toSeq
    val brute = Similarity.bruteForceTopK(vecs, queries, 3)
      .orderBy("rank").select("vec_id", "dot").as[(Long, Long)].collect().toSeq
    assert(rr == brute)
    // a NULL query vector is dropped (null qsig would null every hamming
    // and rank k arbitrary rows NULLS-FIRST); live queries unaffected
    val withNull = Seq(
      (9L, Array(1f, 1f, 1f, 1f)), (10L, null.asInstanceOf[Array[Float]]))
      .toDF("qid", "qvec")
    val guarded = Similarity.binaryTopK(codes, withNull, 4, 4)
    assert(guarded.where($"qid" === 10L).isEmpty)
    assert(guarded.where($"qid" === 9L).orderBy("rank")
      .select("vec_id", "ham").as[(Long, Int)].collect().toSeq == out)
  }

  test("Dedup.memorizationProfile: island lengths, disjoint runs, zero rows for clean docs") {
    import spark.implicits._
    // doc 1 and 2 share the 6-token run "a b c d e f" (n=3 → windows at
    // 1..4 → island [1, 6]); doc 1 additionally repeats "x y z" at two
    // DISJOINT positions within itself
    val docs = Seq(
      (1L, "a b c d e f q x y z r s t u x y z"),
      (2L, "a b c d e f"),
      (3L, "aa bb cc dd ee")) // shares no 3-window with anything
      .toDF("doc_id", "text")
    val out = Dedup.memorizationProfile(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: islands [1,6] (len 6), [8,10] and [15,17] (len 3 each) →
    // max 6, covered 12; doc 2: [1,6] → max 6, covered 6; doc 3: clean
    assert(out == Seq((1L, 17L, 6L, 12L), (2L, 6L, 6L, 6L), (3L, 5L, 0L, 0L)))
  }

  test("TextOps.urlHost: canonical host, port/path/query stripped, non-URL empty, null null") {
    import spark.implicits._
    val rows = Seq(
      "https://site3.com/page/1?a=1", "http://h.example.org:8080/x",
      "ftp://files.net", "not a url", null)
      .toDF("u").select(TextOps.urlHost($"u")).as[String].collect().toSeq
    assert(rows == Seq("site3.com", "h.example.org", "files.net", "", null))
  }

  test("Corpus.withSplitLeakageSafe: chains land on one side; pair-free corpus == withSplit") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a CHAIN a-b, b-c (c never pairs with a) plus a far-apart pair —
    // closure must glue the chain to one representative
    val pairs = Seq((1L, 50L), (50L, 120L), (7L, 199L)).toDF("id_a", "id_b")
    val safe = Corpus.withSplitLeakageSafe(docs, "doc_id", pairs)
    val bySplit = safe.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(bySplit(1L), bySplit(50L), bySplit(120L)).size == 1, "chain straddled a cut")
    assert(bySplit(7L) == bySplit(199L), "pair straddled a cut")
    // a chain LONGER than min-label propagation's iteration cap must not
    // wedge the assignment (clustersAuto routes around the diameter wall)
    val longChain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val safeLong = Corpus.withSplitLeakageSafe(docs, "doc_id", longChain)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L to 40L).map(safeLong).toSet.size == 1,
      "a 41-member chain component straddled a cut")
    // the audit reads zero on the safe assignment
    assert(Corpus.splitLeakageFromPairs(pairs, safe).isEmpty)
    // pair-free corpus: identical to the plain id-hash split
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val plain = Corpus.withSplit(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val safeNp = Corpus.withSplitLeakageSafe(docs, "doc_id", noPairs)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(safeNp == plain)
  }

  test("TextOps.registrableDomain: PSL matrix — multi-label rules, wildcard, " +
    "exception, private suffixes, implicit-* fallback, null cases") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def reg(hosts: String*): Seq[String] =
      hosts.toDF("h").select(TextOps.registrableDomain($"h")).as[String]
        .collect().toSeq
    // multi-label rule: shards collapse; deeper shards too
    assert(reg("a1.spam.co.uk", "a2.spam.co.uk", "x.y.spam.co.uk") ==
      Seq("spam.co.uk", "spam.co.uk", "spam.co.uk"))
    // private hosting suffix: each tenant is its own registrable domain
    assert(reg("alice.github.io", "bob.github.io", "www.alice.github.io") ==
      Seq("alice.github.io", "bob.github.io", "alice.github.io"))
    // implicit * fallback: unknown TLD groups at last-label+1
    assert(reg("w3.site4.com", "deep.sub.example.dev", "foo.unknowntld") ==
      Seq("site4.com", "example.dev", "foo.unknowntld"))
    // wildcard *.ck: one label under ck is a public suffix
    assert(reg("sub.shop2.ck", "shop2.ck") == Seq("sub.shop2.ck", null))
    // exception !www.ck beats the wildcard: www.ck IS a registrable domain
    assert(reg("www.ck", "foo.www.ck") == Seq("www.ck", "www.ck"))
    // Japanese designated-city wildcard + its city exception
    assert(reg("x.chuo.kobe.jp", "city.kobe.jp", "w.city.kobe.jp") ==
      Seq("x.chuo.kobe.jp", "city.kobe.jp", "city.kobe.jp"))
    // case fold + trailing dot
    assert(reg("A1.Spam.CO.UK", "spam.co.uk.") == Seq("spam.co.uk", "spam.co.uk"))
    // null cases: a bare public suffix, a bare TLD, empty, malformed,
    // IPv4 literal, null input
    assert(reg("co.uk", "com", "", "a..b", "192.168.0.1", null) ==
      Seq(null, null, null, null, null, null))
    // generated families: JP prefectures, US k12 locality scheme, KR
    // regions, CN provinces — and the EC2-hostname wildcard, where every
    // instance host is its own registrable domain
    assert(reg("www.pref.okinawa.jp", "district.k12.wi.us",
      "my.school.busan.kr", "site.gd.cn",
      "ec2-1-2-3-4.compute-1.amazonaws.com",
      "x.ec2-1-2-3-4.compute-1.amazonaws.com") ==
      Seq("pref.okinawa.jp", "district.k12.wi.us", "school.busan.kr",
        "site.gd.cn", null, "x.ec2-1-2-3-4.compute-1.amazonaws.com"))
  }

  test("Corpus.filterBlockedUrls matchRegistrable: subdomain shards cannot " +
    "evade the list; hosting tenants are blocked individually; " +
    "suffix-less hosts fall back to hostname matching") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val d = Seq(
      (1L, "https://ok.com/a"),
      (2L, "https://a1.spam.co.uk/x"),     // shard of a blocked domain
      (3L, "https://a2.spam.co.uk/y"),     // another shard — same verdict
      (4L, "https://spam.co.uk/"),         // the apex itself
      (5L, "https://evil.github.io/p"),    // blocked tenant
      (6L, "https://good.github.io/p"),    // sibling tenant stays
      (7L, null.asInstanceOf[String]))     // passes through
      .toDF("doc_id", "url")
    // blocklist entries may be apexes OR full hosts — both normalize
    val blocked = Seq("spam.co.uk", "www.evil.github.io").toDF("host")
    val kept = Corpus.filterBlockedUrls(d, "url", blocked, matchRegistrable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L, 7L))
    // the full-hostname mode documents the evasion these shards exploit
    val naive = Corpus.filterBlockedUrls(d, "url", blocked)
      .select("doc_id").as[Long].collect().toSet
    assert(naive == Set(1L, 2L, 3L, 5L, 6L, 7L),
      "hostname matching should only catch the exact apex")
  }

  test("Corpus.filterBlockedUrls: host blocklist, path pattern, null-url passthrough") {
    import spark.implicits._
    val d = Seq(
      (1L, "https://ok.com/a"),
      (2L, "https://BAD.com/a"),        // host blocked (case-folded)
      (3L, "https://ok.com/spam/x"),    // path pattern
      (4L, null.asInstanceOf[String]))  // passes through
      .toDF("doc_id", "url")
    val blocked = Seq("bad.com").toDF("host")
    val kept = Corpus.filterBlockedUrls(d, "url", blocked, Some("/spam/"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    // without the path rule only the host drop applies
    val hostOnly = Corpus.filterBlockedUrls(d, "url", blocked)
      .select("doc_id").as[Long].collect().toSet
    assert(hostOnly == Set(1L, 3L, 4L))
  }

  test("TextOps.nbMarginReliability: separable corpus concentrates mass in the cap bucket at accuracy 1") {
    import spark.implicits._
    // class vocabularies are disjoint → margins are large and every
    // prediction is right; a conflicted doc (mixed vocab) lands low
    val rows = (0 until 60).map { i =>
      val lbl = if (i % 2 == 0) "a" else "b"
      val word = if (i % 2 == 0) "spark" else "tensor"
      (i.toLong, lbl, Seq.fill(8)(word).mkString(" "))
    } :+ (999L, "a", "spark tensor") // near-zero margin
    val df = rows.toDF("doc_id", "lbl", "text")
    val model = TextOps.nbTrain(df.where($"doc_id" < 900), "lbl", "text")
    val rel = TextOps.nbMarginReliability(df, "doc_id", "text", "lbl", model)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rel.map(_._2).sum == 61L, s"buckets must partition the corpus: $rel")
    val top = rel.last
    assert(top._1 == 9L && top._2 >= 60L && top._3 == top._2,
      s"separable mass must sit in the cap bucket at accuracy 1: $rel")
    assert(rel.head._1 == 0L, s"the conflicted doc must land in bucket 0: $rel")
  }

  test("binary-code store: serve == in-query, upsert idempotent, delete retires, dims pinned") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_bin_store_spec").toString
    val vecs = Seq(
      (0L, Array(0.9f, 0.8f, 0.7f, 0.6f)), (1L, Array(0.1f, 0.2f, 0.3f, -0.1f)),
      (2L, Array(0.5f, 0.5f, 0.5f, -0.5f)), (3L, Array(-1f, -1f, -1f, -1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Array(1f, 1f, 1f, 1f))).toDF("qid", "qvec")
    Similarity.writeBinaryCodes(vecs, dir, dims = 4)
    def served = Similarity.binaryTopKIndexed(spark, dir, queries, 4)
      .orderBy("rank").select("vec_id", "ham").as[(Long, Int)].collect().toSeq
    val inQuery = Similarity.binaryTopK(
        Similarity.binaryEncodeFrame(vecs, 4), queries, 4, 4)
      .orderBy("rank").select("vec_id", "ham").as[(Long, Int)].collect().toSeq
    assert(served == inQuery)
    // re-encoding the same corpus replaces rows — serving unchanged
    Similarity.writeBinaryCodes(vecs, dir, dims = 4)
    assert(served == inQuery)
    // a mismatched width fails loud instead of scoring garbage hamming
    intercept[IllegalArgumentException] {
      Similarity.writeBinaryCodes(vecs, dir, dims = 8)
    }
    // takedown: the deleted vector leaves the serving path physically
    Similarity.deleteBinaryCodes(Seq(Tuple1(0L)).toDF("vec_id"), dir)
    assert(served.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("Dedup.paragraphDedupIncremental: equals batch keep-first over the union restricted to the batch") {
    import spark.implicits._
    val corpus = Seq((1L, "banner\nold body"), (2L, "banner\nmid")).toDF("doc_id", "text")
    val batch = Seq((10L, "banner\nnew one\nshared"), (11L, "shared\nnew two"))
      .toDF("doc_id", "text")
    val inc = Dedup.paragraphDedupIncremental(
        batch, Dedup.seenLineHashes(corpus, "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // banner is stored → dropped; "shared" keeps its first batch occurrence
    assert(inc == Seq((10L, "new one\nshared"), (11L, "new two")))
    // the law: with corpus ids preceding batch ids, incremental ≡ the
    // batch operator over the concatenated corpus restricted to the batch
    val union = Dedup.paragraphDedup(corpus.unionByName(batch), "doc_id", "text")
      .where($"doc_id" >= 10L)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(inc == union)
  }

  test("Dedup line-hash store: bootstrap-once fails loud, appends become visible, sep pinned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_para_store_spec").toString
    val corpus = Seq((1L, "banner\nold body")).toDF("doc_id", "text")
    Dedup.writeLineHashes(corpus, dir, "text")
    intercept[IllegalArgumentException] {
      Dedup.writeLineHashes(corpus, dir, "text")
    }
    // serve == direct incremental against the same corpus
    val batch1 = Seq((10L, "banner\nnew one")).toDF("doc_id", "text")
    val c1 = Dedup.paragraphDedupIncrementalIndexed(batch1, dir, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(c1 == Seq((10L, "new one")))
    // the one-call ingested batch1's lines: a later batch must see them
    val batch2 = Seq((20L, "new one\nbrand new")).toDF("doc_id", "text")
    val c2 = Dedup.paragraphDedupIncrementalIndexed(batch2, dir, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(c2 == Seq((20L, "brand new")))
    // a custom separator is pinned in the store meta and used at serve time
    val dir2 = java.nio.file.Files.createTempDirectory("graft_para_store_spec2").toString
    Dedup.writeLineHashes(Seq((1L, "a|b")).toDF("doc_id", "text"), dir2, "text", sep = "|")
    val cSep = Dedup.paragraphDedupIncrementalIndexed(
        Seq((2L, "b|c")).toDF("doc_id", "text"), dir2, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(cSep == Seq((2L, "c")))
  }

  test("Dedup.paragraphDedupWithinDoc: repeats collapse inside the doc only; null rides") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x\ny\nx\nz\ny"),
      (2L, "x"),                      // other docs never affect doc 1
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedupWithinDoc(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x\ny\nz"), (2L, "x"), (3L, null)))
  }

  test("Dedup.paragraphDedup: keep-first keeps one copy, remove-all strips every copy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banner\nalpha\nfooter"),
      (2L, "banner\nbeta\nfooter"),
      (3L, "banner\nfooter"),           // pure boilerplate → reassembles empty
      (4L, null.asInstanceOf[String]),  // null rides through as null
      (5L, "gamma"))
      .toDF("doc_id", "text")
    val kf = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(kf == Seq(
      (1L, "banner\nalpha\nfooter"), // doc 1 is first: keeps both shared lines
      (2L, "beta"),
      (3L, ""),
      (4L, null),
      (5L, "gamma")))
    val ra = Dedup.paragraphDedup(docs, "doc_id", "text", keepFirst = false)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(ra == Seq((1L, "alpha"), (2L, "beta"), (3L, ""), (4L, null), (5L, "gamma")))
  }

  test("TextOps.textFromBytes: strict UTF-8, sloppy-cp1252 fallback, " +
    "mojibake repair rounds, unmappable scripts untouched, null/empty laws") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    graft.GraftExtensions.register(spark)
    def cp1252(s: String): Array[Byte] = {
      // test-side encoder: strict cp1252 for the fixtures (no holes used)
      val specials = Map('\u20ac' -> 0x80, '\u201a' -> 0x82, '\u0192' -> 0x83,
        '\u201e' -> 0x84, '\u2026' -> 0x85, '\u2020' -> 0x86, '\u2021' -> 0x87,
        '\u02c6' -> 0x88, '\u2030' -> 0x89, '\u0160' -> 0x8a, '\u2039' -> 0x8b,
        '\u0152' -> 0x8c, '\u017d' -> 0x8e, '\u2018' -> 0x91, '\u2019' -> 0x92,
        '\u201c' -> 0x93, '\u201d' -> 0x94, '\u2022' -> 0x95, '\u2013' -> 0x96,
        '\u2014' -> 0x97, '\u02dc' -> 0x98, '\u2122' -> 0x99, '\u0161' -> 0x9a,
        '\u203a' -> 0x9b, '\u0153' -> 0x9c, '\u017e' -> 0x9e, '\u0178' -> 0x9f)
      s.map(c => specials.getOrElse(c, c.toInt).toByte).toArray
    }
    val clean = "price 12 \u20ac and caf\u00e9"           // € + é
    val mojibake1 = new String(clean.getBytes(UTF_8).map(_ & 0xff).map {
      b => if (b >= 0x80 && b <= 0x9f) " \u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178".charAt(b - 0x7f) else b.toChar
    }.mkString)                                            // utf8-as-cp1252
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, "plain ascii".getBytes(UTF_8)),                 // identity
      (2L, clean.getBytes(UTF_8)),                         // valid utf-8 kept
      (3L, cp1252(clean)),                                 // legacy cp1252
      (4L, mojibake1.getBytes(UTF_8)),                     // 1-round mojibake
      (5L, "\u4e2d\u6587 text".getBytes(UTF_8)),           // unmappable: untouched
      (6L, Array[Byte](0x81.toByte, 0x41)),                // hole byte -> C1 + A
      (7L, Array.emptyByteArray),                          // empty -> ""
      (8L, null))                                          // null -> null
    val out = rows.toDF("id", "b")
      .select($"id", graft.ops.TextOps.textFromBytes($"b").as("t"))
      .orderBy("id").as[(Long, String)].collect().toMap
    assert(out(1L) == "plain ascii")
    assert(out(2L) == clean)
    assert(out(3L) == clean, s"cp1252 decode+repair: ${out(3L)}")
    assert(out(4L) == clean, s"mojibake repair: ${out(4L)}")
    assert(out(5L) == "\u4e2d\u6587 text")
    assert(out(6L) == "\u0081A")
    assert(out(7L) == "")
    assert(out(8L) == null)
    // double-encoded: utf8(clean) -> cp1252-decode -> utf8 -> cp1252-decode -> utf8
    def asCp(b: Array[Byte]): String = new String(b.map { x =>
      val c = x & 0xff
      if (c >= 0x80 && c <= 0x9f)
        "\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178".charAt(c - 0x80)
      else c.toChar
    }.mkString)
    val dbl = asCp(asCp(clean.getBytes(UTF_8)).getBytes(UTF_8)).getBytes(UTF_8)
    val out2 = Seq((1L, dbl)).toDF("id", "b")
      .select(graft.ops.TextOps.textFromBytes($"b")).as[String].collect().head
    assert(out2 == clean, s"double mojibake repair: $out2")
  }

  test("TextOps.textFromBytes legacy-multibyte tier: each charset picked " +
    "from its bytes by the language gate, ambiguous pairs separated, " +
    "Latin cp1252 never hijacked, UTF-16 BOM tier structural") {
    import spark.implicits._
    import java.nio.charset.Charset
    graft.GraftExtensions.register(spark)
    def decode(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.TextOps.textFromBytes($"b")).as[String].collect().head
    val ja = "子供たちは朝に学校へ歩いて行きます。先生と一緒に本を読みます。"
    val ko = "아이들은 아침에 학교에 걸어가서 선생님과 함께 책을 읽습니다"
    val zhS = "孩子们早上走路去学校他们和老师一起读书每天在城市里玩"
    val zhT = "孩子們早上走路去學校他們和老師一起讀書每天在城市裡玩"
    val uk = "діти йдуть вранці до школи і читають книжки з учителем у місті"
    val ru = "дети идут в школу утром и читают книги с учителем в городе"
    val bg = "децата вървят сутрин към училището и четат книги с учителя в града"
    // the SAME Japanese sentence in both Japanese framings — byte
    // structure alone cannot separate EUC-JP from GB2312 (shared EUC
    // frame + kana rows); the language-set gate must
    for (cs <- Seq("Shift_JIS", "EUC-JP"))
      assert(decode(ja.getBytes(Charset.forName(cs))) == ja, cs)
    assert(decode(ko.getBytes(Charset.forName("EUC-KR"))) == ko)
    // the structurally-ambiguous Chinese pair: GB18030 simplified vs
    // Big5 traditional both land in the zh profile's acceptance region,
    // each from its own bytes
    assert(decode(zhS.getBytes(Charset.forName("GB18030"))) == zhS)
    assert(decode(zhT.getBytes(Charset.forName("Big5"))) == zhT)
    // windows-1251 is a LANGUAGE SET (bg/ru/uk), not just Russian
    for (t <- Seq(ru, uk, bg))
      assert(decode(t.getBytes(Charset.forName("windows-1251"))) == t, t)
    // the whole single-byte Cyrillic family: every mapping decodes every
    // byte, so only the language gate separates them — each real text
    // must round-trip through ITS OWN mapping (the cross-decodes measure
    // 513-836 normalized distance and reject)
    for (cs <- Seq("KOI8-R", "KOI8-U", "ISO-8859-5"))
      assert(decode(ru.getBytes(Charset.forName(cs))) == ru, cs)
    for (cs <- Seq("KOI8-U", "ISO-8859-5")) // uk has no KOI8-R encoding
      assert(decode(uk.getBytes(Charset.forName(cs))) == uk, cs)
    assert(decode(bg.getBytes(Charset.forName("ISO-8859-5"))) == bg)
    // a French cp1252 page strict-decodes under windows-1251 too (all
    // single bytes map) — but reads as Latin-with-stray-Cyrillic, the
    // classifier rejects it, and the cp1252 fallback wins
    val fr = "café déjà vu 95% naïve les enfants marchent vers la maison"
    assert(decode(fr.getBytes(Charset.forName("windows-1252"))) == fr)
    // UTF-16 tier: BOM + strict decode, both endiannesses
    val mixed = "café δοκιμή текст"
    assert(decode(Array[Byte](0xff.toByte, 0xfe.toByte) ++
      mixed.getBytes(Charset.forName("UTF-16LE"))) == mixed)
    assert(decode(Array[Byte](0xfe.toByte, 0xff.toByte) ++
      mixed.getBytes(Charset.forName("UTF-16BE"))) == mixed)
    // bare BOM (no content) and odd length fall through to cp1252
    assert(decode(Array[Byte](0xff.toByte, 0xfe.toByte)) == "ÿþ")
    assert(decode(Array[Byte](0xff.toByte, 0xfe.toByte, 0xfa.toByte)) == "ÿþú")
    // BOM + unpaired surrogate (D800 little-endian) is NOT valid UTF-16
    // — strict decode refuses, the ladder falls to cp1252
    assert(decode(Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0xd8.toByte))
      == "ÿþ\u0000Ø")
    // too-short CJK (one ideograph) cannot clear the language gate —
    // deterministic cp1252 fallback, never a half-confident guess
    assert(decode("中".getBytes(Charset.forName("Big5"))) == "¤¤")
  }

  test("TextOps.textFromBytes r17 rungs: Greek/Hebrew/Arabic/Thai single-byte " +
    "charsets round-trip; Latin rungs beat cp1252 by DISTANCE, not " +
    "first-accept; prefix-valid/tail-malformed payloads still reject; the " +
    "classified window is the first 512 code points") {
    import spark.implicits._
    import java.nio.charset.Charset
    graft.GraftExtensions.register(spark)
    def decode(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.TextOps.textFromBytes($"b")).as[String].collect().head
    val el = "τα παιδιά περπατούν στο σχολείο το πρωί και διαβάζουν βιβλία με τον δάσκαλο στην πόλη"
    val he = "הילדים הולכים לבית הספר בבוקר וקוראים ספרים עם המורה בעיר"
    val ar = "يذهب الأطفال إلى المدرسة في الصباح ويقرؤون الكتب مع المعلم في المدينة كل يوم"
    val th = "เด็กเดินไปโรงเรียนในตอนเช้าและอ่านหนังสือกับครูในเมือง"
    // each script charset picked from its bytes by the language gate
    // (every one decodes nearly every byte — membership + calibrated
    // distance is the only separator, the Cyrillic-family law again)
    for (cs <- Seq("windows-1253", "ISO-8859-7"))
      assert(decode(el.getBytes(Charset.forName(cs))) == el, cs)
    assert(decode(he.getBytes(Charset.forName("windows-1255"))) == he)
    assert(decode(ar.getBytes(Charset.forName("windows-1256"))) == ar)
    assert(decode(th.getBytes(Charset.forName("x-windows-874"))) == th)
    // LATIN rungs: a windows-1250 Polish page also classifies 'pl'
    // under cp1252 (measured 237 normalized, under the cutoff) with
    // '¹' where 'ą' belongs — first-accept would ship that; lowest
    // distance picks the true decode. Same for Turkish and Czech.
    val pl = "dzieci idą rano do szkoły i czytają książki z nauczycielem w mieście"
    val tr = "çocuklar sabah okula yürüyorlar ve şehirde öğretmenle birlikte kitap okuyorlar"
    val cz = "děti chodí ráno do školy a čtou si knihy s učitelem ve městě"
    for (cs <- Seq("windows-1250", "ISO-8859-2"))
      assert(decode(pl.getBytes(Charset.forName(cs))) == pl, cs)
    for (cs <- Seq("ISO-8859-9", "windows-1254"))
      assert(decode(tr.getBytes(Charset.forName(cs))) == tr, cs)
    assert(decode(cz.getBytes(Charset.forName("ISO-8859-2"))) == cz)
    // …and a GENUINE cp1252 page is never stolen by a Latin rung: the
    // incumbent keeps ties, and fr/es/de are cp1252-representable
    val fr = "les enfants marchent vers la maison le matin et ils lisent des livres avec le professeur"
    val es = "los niños caminan a la escuela por la mañana y leen libros con el maestro en la ciudad"
    for (t <- Seq(fr, es))
      assert(decode(t.getBytes(Charset.forName("windows-1252"))) == t, t)
    // PREFIX-SCORED, FULL-VALIDATED (r17): candidates are ranked on a
    // bounded prefix decode, but acceptance requires the FULL payload
    // to strict-decode. A >4096-byte payload whose prefix is valid
    // Shift_JIS Japanese but whose tail is malformed must NOT ship the
    // prefix — the SJIS candidate dies at full validation and the
    // ladder falls to the sloppy-cp1252 fallback (which cannot equal
    // the Japanese text).
    val ja = "子供たちは朝に学校へ歩いて行きます。先生と一緒に本を読みます。"
    val sjis = ja.getBytes(Charset.forName("Shift_JIS"))
    val big = new java.io.ByteArrayOutputStream()
    while (big.size < 5000) big.write(sjis)
    val clean = big.toByteArray
    assert(decode(clean) == ja * (clean.length / sjis.length),
      "control: the clean repeated payload decodes via SJIS")
    val broken = clean ++ Array[Byte](0xff.toByte, 0xff.toByte)
    val out = decode(broken)
    assert(!out.contains("子供"),
      s"tail-malformed payload must not ship the SJIS prefix: ${out.take(40)}")
    // WINDOW LAW: classification reads the first 512 code points. A page
    // that opens with >512 chars of real English before a Japanese body
    // reads as LATIN in the window — the ladder stands down and the
    // page takes the cp1252 fallback (pinned intentionally: sniffing is
    // a whole-page verdict made on the head; mixed-script pages need a
    // declared charset, which textFromBytesDeclared honors).
    val enHead = ("the children walk to the school in the morning and " +
      "they read books with the teacher ") * 8 // ~700 chars, ASCII
    val mixedBytes = (enHead + ja).getBytes(Charset.forName("Shift_JIS"))
    val mixedOut = decode(mixedBytes)
    assert(mixedOut.startsWith("the children") && !mixedOut.contains("子供"),
      s"Latin window → cp1252 fallback: ${mixedOut.take(40)}")
  }

  test("PdfKernels.pdf_text laws: non-PDF and encrypted refuse with NULL, " +
    "a text-free PDF yields '', extraction is deterministic") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def pdf(b: Array[Byte]): Option[String] =
      Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.TextOps.pdfText($"b")).as[Option[String]].collect().head
    // refusal law: not-a-PDF, truncated header, encrypted
    assert(pdf("hello world".getBytes("UTF-8")).isEmpty)
    assert(pdf(graft.expressions.PdfKernels.synthPdf(7L)).isEmpty) // corrupt arm
    assert(pdf(graft.expressions.PdfKernels.synthPdf(6L)).isEmpty) // /Encrypt arm
    // a structurally valid PDF with no text ops: '' (the scanned-image
    // case), NOT null — distinguishable from corruption
    val noText = ("%PDF-1.4\n1 0 obj << /Length 10 >>\nstream\n0 0 m 1 1 l S" +
      "\nendstream endobj\ntrailer << /Size 2 >>\n%%EOF").getBytes("ISO-8859-1")
    assert(pdf(noText).contains(""))
    // closed-form arms (the q_src_pdf oracle pins all ten; spot a few)
    assert(pdf(graft.expressions.PdfKernels.synthPdf(0L)).contains("Hello PDF 0"))
    assert(pdf(graft.expressions.PdfKernels.synthPdf(14L))
      .contains("café déjà vu")) // WinAnsi octal bytes
    // CID/Type0 with a ToUnicode CMap: 2-byte codes offset by 0xE0
    // through bfrange, space + the two-char 'ff' expansion via bfchar
    assert(pdf(graft.expressions.PdfKernels.synthPdf(18L))
      .contains("cid ff 18\nbeta"))
    // CID/Type0 WITHOUT ToUnicode: the only text is glyph indices ->
    // NULL (unknowable), never '' and never mojibake
    assert(pdf(graft.expressions.PdfKernels.synthPdf(19L)).isEmpty)
    // null in -> null out
    assert(Seq[Option[Array[Byte]]](None).toDF("b")
      .select(graft.ops.TextOps.pdfText($"b")).collect()(0).isNullAt(0))
  }

  test("PdfKernels hostile-input laws: '/Encrypt' inside stream DATA is " +
    "content (not an encryption marker), and a FlateDecode bomb past the " +
    "inflate cap skips the stream instead of allocating its full size") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def pdf(b: Array[Byte]): Option[String] =
      Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.TextOps.pdfText($"b")).as[Option[String]].collect().head
    // the false-refusal case the trailer-only law fixes: a document whose
    // PAGE TEXT mentions /Encrypt must still extract
    val prose = ("%PDF-1.4\n1 0 obj << /Length 44 >>\nstream\n" +
      "BT (see the /Encrypt entry of the trailer) Tj ET" +
      "\nendstream endobj\ntrailer << /Size 2 >>\n%%EOF").getBytes("ISO-8859-1")
    assert(pdf(prose).contains("see the /Encrypt entry of the trailer"))
    // ...while a real trailer-dict /Encrypt still refuses (fixture arm 6
    // re-pinned here so both sides of the law sit together)
    assert(pdf(graft.expressions.PdfKernels.synthPdf(6L)).isEmpty)
    // decompression bomb: ~1 MiB of text ops from a few hundred
    // compressed bytes; under a 64 KiB test cap the stream is refused
    // (document stays '', the OTHER stream's text still extracts)
    val bombPayload = ("BT (x) Tj ET " * 80000).getBytes("ISO-8859-1")
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(bombPayload); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val bomb = out.toByteArray
    val doc = new java.io.ByteArrayOutputStream()
    doc.write(("%PDF-1.4\n1 0 obj << /Length " + bomb.length +
      " /Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1"))
    doc.write(bomb)
    doc.write(("\nendstream endobj\n2 0 obj << /Length 20 >>\nstream\n" +
      "BT (survivor line) Tj ET\nendstream endobj\n" +
      "trailer << /Size 3 >>\n%%EOF").getBytes("ISO-8859-1"))
    val bombed = doc.toByteArray
    System.setProperty("graft.pdf.maxInflateBytes", "65536")
    try {
      assert(pdf(bombed).contains("survivor line"),
        "bombed stream skipped, sibling stream still extracts")
    } finally System.clearProperty("graft.pdf.maxInflateBytes")
    // and under the default cap the same document extracts BOTH streams
    val full = pdf(bombed).get
    assert(full.contains("survivor line") && full.contains("x"))
    // INDIRECT font resource dict (/Font 9 0 R — a common generator
    // layout) must resolve, and a 4-byte surrogate-coded CMap src
    // (CJK Extension-B subsets) is SKIPPED per-entry, never a parse
    // exception that refuses the whole document
    val cmap = "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "1 beginbfchar\n<0041> <0058>\nendbfchar\n" +
      "1 beginbfrange\n<D840DC00> <D840DC1F> <0041>\nendbfrange"
    val indirect = ("%PDF-1.4\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R " +
      "/Resources << /Font 9 0 R >> >> endobj\n" +
      "9 0 obj << /F1 5 0 R >> endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/DescendantFonts [6 0 R] /ToUnicode 7 0 R >> endobj\n" +
      "6 0 obj << /Type /Font /Subtype /CIDFontType2 >> endobj\n" +
      s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n" +
      "4 0 obj << /Length 26 >>\nstream\nBT /F1 12 Tf <0041> Tj ET\nendstream endobj\n" +
      "trailer << /Size 10 >>\n%%EOF").getBytes("ISO-8859-1")
    assert(pdf(indirect).contains("X"),
      s"indirect /Font dict + skipped wide src: ${pdf(indirect)}")
  }

  test("TextOps.textFromBytesDeclared: honor-but-verify — a declaration " +
    "reaches charsets sniffing never can; BOM and valid UTF-8 outrank " +
    "a lying declaration; unknown/absent declarations fall to the ladder") {
    import spark.implicits._
    import java.nio.charset.Charset
    graft.GraftExtensions.register(spark)
    def decode(b: Array[Byte], decl: String): String =
      Seq((b, decl)).toDF("b", "d")
        .select(graft.ops.TextOps.textFromBytesDeclared($"b", $"d"))
        .as[String].collect().head
    // the declaration-only case: ISO-8859-2 decodes EVERY byte, so no
    // validity test can pick it — the Content-Type header does
    val pl = "zażółć gęślą jaźń pełną łąkę"
    val plBytes = pl.getBytes(Charset.forName("ISO-8859-2"))
    assert(decode(plBytes, "text/html; charset=ISO-8859-2") == pl)
    assert(decode(plBytes, "ISO-8859-2") == pl, "bare charset name works")
    assert(decode(plBytes, "charset=\"iso-8859-2\"") == pl, "quoted+cased")
    // without the declaration the same bytes are cp1252 mojibake —
    // exactly the gap the declared form closes
    assert(decode(plBytes, "") != pl)
    assert(decode(plBytes, "text/html") != pl, "MIME without charset declares nothing")
    // BOM-less UTF-16 is undecodable by sniffing but trivial by declaration
    val el = "τα παιδιά περπατούν στο σχολείο"
    assert(decode(el.getBytes(Charset.forName("UTF-16LE")), "charset=UTF-16LE") == el)
    // a LYING legacy declaration on strictly-valid UTF-8 bytes loses:
    // the single-byte charset would "successfully" decode to mojibake
    val fr = "café déjà vu"
    assert(decode(fr.getBytes("UTF-8"), "text/html; charset=ISO-8859-2") == fr)
    // a BOM outranks the declaration (WHATWG precedence)
    val mixed = "café δοκιμή"
    assert(decode(Array[Byte](0xff.toByte, 0xfe.toByte) ++
      mixed.getBytes(Charset.forName("UTF-16LE")),
      "charset=ISO-8859-2") == mixed)
    // a declaration whose strict decode FAILS falls to the ladder: SJIS
    // bytes declared EUC-KR still come back as the Japanese sentence
    val ja = "子供たちは朝に学校へ歩いて行きます。先生と一緒に本を読みます。"
    val sjis = ja.getBytes(Charset.forName("Shift_JIS"))
    assert(!isStrict(sjis, "EUC-KR"), "fixture: SJIS must not be EUC-KR-valid")
    assert(decode(sjis, "text/html; charset=EUC-KR") == ja)
    // unknown charset names are undeclared, never a throw
    assert(decode(fr.getBytes("UTF-8"), "charset=x-no-such-charset") == fr)
    // null declaration ≡ undeclared (the helper coalesces)
    assert(decode(plBytes, null) == decode(plBytes, ""))
    // strictness matrix law: declared ≡ plain ladder whenever nothing
    // is declared
    val garbage = Array[Byte](0xfa.toByte, 0x81.toByte, 0xff.toByte)
    assert(decode(garbage, "") ==
      Seq(Tuple1(garbage)).toDF("b")
        .select(graft.ops.TextOps.textFromBytes($"b")).as[String].collect().head)
  }

  /** Does `b` strict-decode under `cs`? (fixture sanity only) */
  private def isStrict(b: Array[Byte], cs: String): Boolean = {
    val dec = java.nio.charset.Charset.forName(cs).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  test("ImageKernels.imageMeta: header-only metadata for every format, " +
    "WebP framings agree with their generator, corrupt -> NULL law") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def meta(b: Array[Byte]): Option[(String, Int, Int, Boolean)] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.Multimodal.imageMeta($"b").as("m"))
        .select($"m.format", $"m.width", $"m.height", $"m.has_alpha")
        .collect().head
      if (r.isNullAt(0)) None
      else Some((r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    }
    // real encoders: the header tier must agree with the pixel tier
    def encoded(fmt: String, w: Int, h: Int, argb: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        if (argb) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    assert(meta(encoded("png", 17, 9, argb = false)) ==
      Some(("png", 17, 9, false)))
    assert(meta(encoded("png", 5, 31, argb = true)) ==
      Some(("png", 5, 31, true)), "IHDR color type 6 carries alpha")
    assert(meta(encoded("gif", 12, 7, argb = false)) ==
      Some(("gif", 12, 7, false)))
    assert(meta(encoded("bmp", 23, 11, argb = false)) ==
      Some(("bmp", 23, 11, false)))
    assert(meta(encoded("jpg", 33, 21, argb = false)) ==
      Some(("jpeg", 33, 21, false)))
    // WebP framings straight from the fixture generator: VP8 (id%3=0,
    // alpha structurally absent), VP8L (id%3=1), VP8X (id%3=2) — with
    // geometry and alpha recomputed from the id closed form
    for (id <- Seq(0L, 3L, 12L, 1L, 7L, 31L, 2L, 5L, 23L)) {
      val w = (16 + id % 32).toInt
      val h = (16 + id % 16).toInt
      val alpha = id % 3 != 0 && id % 2 == 1
      assert(meta(graft.expressions.ImageKernels.synthWebp(id)) ==
        Some(("webp", w, h, alpha)), s"id=$id")
    }
    // corrupt/truncated/unknown → NULL, never a throw
    assert(meta(graft.expressions.ImageKernels.synthWebp(6L)) == None,
      "truncated RIFF shell")
    assert(meta(Array[Byte]()) == None)
    assert(meta("not an image at all".getBytes("UTF-8")) == None)
    assert(meta(encoded("png", 4, 4, argb = false).take(20)) == None,
      "truncated IHDR")
    val badSync = graft.expressions.ImageKernels.synthWebp(0L)
    badSync(23) = 0x00 // break the VP8 sync code
    assert(meta(badSync) == None)
    // JPEG marker walk survives leading APPn segments (real camera
    // files): the ImageIO JPEG already carries APP0/JFIF — covered
    // above; a bare SOS before SOF must be NULL, not a scan
    assert(meta(Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)
      .map(_.toByte)) == None)
    // ISO-BMFF stills (AVIF/HEIC): brand detection (the specific brand
    // must beat the generic mif1 compatible), ispe geometry, auxC alpha
    for (id <- Seq(1L, 2L, 3L, 4L, 5L, 10L, 17L)) {
      val w = (24 + id % 40).toInt
      val h = (24 + id % 24).toInt
      val fmt = if (id % 5 == 0) "heic" else "avif"
      assert(meta(graft.expressions.ImageKernels.synthAvif(id)) ==
        Some((fmt, w, h, id % 2 == 1)), s"id=$id")
    }
    // corrupt meta (declared size past EOF) → NULL; a bare ftyp with no
    // meta tree → NULL (no extents is not an image we can describe)
    assert(meta(graft.expressions.ImageKernels.synthAvif(6L)) == None)
    assert(meta(graft.expressions.ImageKernels.synthAvif(20L).take(20)) == None)
  }

  test("ZipKernels.deflateRatio: ordering across redundancy classes, " +
    "null/empty laws, determinism, and the curation-gate rung") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val redundant = "all work and no play makes jack a dull boy " * 25
    val prose = "the students finished their homework before dinner and " +
      "watched a movie together while the rain kept falling outside"
    val shortUnique = "x9f2ab17c"
    val rows = Seq((1L, redundant), (2L, prose), (3L, shortUnique),
      (4L, ""), (5L, null))
    val out = rows.toDF("id", "t")
      .select($"id", graft.ops.TextOps.deflateRatio($"t").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(out(1L) != null && out(1L).doubleValue < 0.25,
      s"repeated boilerplate must compress hard: ${out(1L)}")
    assert(out(2L) != null && out(2L).doubleValue > 0.25 &&
      out(2L).doubleValue < 0.9, s"prose sits in the middle: ${out(2L)}")
    assert(out(3L) != null && out(3L).doubleValue >= 0.9,
      s"short unique text hits the framing floor: ${out(3L)}")
    assert(out(4L) != null && out(4L).doubleValue == 1.0, "empty -> 1.0")
    assert(out(5L) == null, "null -> null")
    // determinism: the kernel re-evaluated gives identical doubles
    val again = rows.toDF("id", "t")
      .select($"id", graft.ops.TextOps.deflateRatio($"t").as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(out == again)
    // gate rung: the planted boilerplate fails EXACTLY deflate_ratio;
    // prose passes; the rule costs nothing unless set (default run
    // keeps both)
    val gated = graft.ops.TextOps.curationGate(
        Seq((1L, redundant), (2L, prose)).toDF("doc_id", "text"),
        "doc_id", "text",
        graft.ops.TextOps.CurationRules(minDeflateRatio = 0.1))
      .orderBy("doc_id").as[(Long, Boolean, String)].collect().toSeq
    assert(gated == Seq((1L, false, "deflate_ratio"), (2L, true, "")))
    val defaulted = graft.ops.TextOps.curationGate(
        Seq((1L, redundant), (2L, prose)).toDF("doc_id", "text"),
        "doc_id", "text", graft.ops.TextOps.CurationRules())
      .orderBy("doc_id").as[(Long, Boolean, String)].collect().toSeq
    assert(defaulted.forall(_._2), "disabled rule must not fire")
  }

  test("ByteKernels strict UTF-8 validation: overlongs, surrogates, and " +
    "range/truncation edges all fall to the cp1252 path, valid boundaries decode") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    def decode(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("b")
        .select(graft.ops.TextOps.textFromBytes($"b")).as[String].collect().head
    // INVALID sequences: every byte decodes via cp1252 instead
    val invalid = Seq(
      Array(0xC0, 0x80),             // overlong NUL (2-byte)
      Array(0xC1, 0xBF),             // overlong (C1 lead is never legal)
      Array(0xE0, 0x80, 0x80),       // overlong 3-byte
      Array(0xED, 0xA0, 0x80),       // UTF-16 surrogate D800
      Array(0xF0, 0x80, 0x80, 0x80), // overlong 4-byte
      Array(0xF4, 0x90, 0x80, 0x80), // above U+10FFFF
      Array(0xF5, 0x80, 0x80, 0x80), // lead byte out of range
      Array(0x41, 0xE2, 0x82),       // truncated 3-byte at end
      Array(0x41, 0xC3))             // truncated 2-byte at end
      .map(_.map(_.toByte))
    for (b <- invalid) {
      val s = decode(b)
      // cp1252 decode = one char per byte, never a replacement char
      assert(s.length == b.length && !s.contains('\uFFFD'),
        s"bytes ${b.map(x => f"${x & 0xff}%02X").mkString(" ")} -> '$s'")
    }
    // VALID boundary sequences decode as UTF-8 (length in chars < bytes)
    assert(decode(Array(0xF0, 0x90, 0x80, 0x80).map(_.toByte)).codePointAt(0) == 0x10000)
    assert(decode(Array(0xF4, 0x8F, 0xBF, 0xBF).map(_.toByte)).codePointAt(0) == 0x10FFFF)
    assert(decode(Array(0xED, 0x9F, 0xBF).map(_.toByte)) == "\ud7ff") // last pre-surrogate
    assert(decode(Array(0xEE, 0x80, 0x80).map(_.toByte)) == "\ue000") // first post-surrogate
  }

  test("Multimodal.videoMeta: hand-built ISO-BMFF fixtures parse exactly; " +
    "corrupt/truncated/non-MP4 input obeys the NULL law") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // hand-built fixtures (hex rendered by an independent python builder):
    // v0 mvhd, timescale 1000, duration 90500 ticks, avc1 1920x1080 + mp4a
    val video = "000000206674797069736F6D0000020069736F6D69736F32617663316D703431000001AC6D6F6F760000006C6D766864000000000000000000000000000003E80001618400010000010000000000000000000000000100000000000000000000000000000001000000000000000000000000000040000000000000000000000000000000000000000000000000000000000000030000009C7472616B0000005C746B6864000000030000000000000000000000010000000000016184000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000780000004380000000000386D646961000000306D696E66000000287374626C00000020737473640000000000000001000000106176633100000000000000000000009C7472616B0000005C746B6864000000030000000000000000000000020000000000016184000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000000000000000000000000386D646961000000306D696E66000000287374626C00000020737473640000000000000001000000106D7034610000000000000000000000186D64617400000000000000000000000000000000"
    // v1 mvhd (64-bit duration) inside a 64-bit largesize moov, audio-only:
    // timescale 48000, duration 480000 ticks -> exactly 10000 ms
    val audio = "00000018667479704D344120000000004D34412069736F6D000000016D6F6F760000000000000124000000786D76686401000000000000000000000000000000000000000000BB80000000000007530000010000010000000000000000000000000100000000000000000000000000000001000000000000000000000000000040000000000000000000000000000000000000000000000000000000000000020000009C7472616B0000005C746B6864000000030000000000000000000000010000000000075300000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000000000000000000000000386D646961000000306D696E66000000287374626C00000020737473640000000000000001000000106D7034610000000000000000"
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, bytes(video)),
      (2L, bytes(audio)),
      (3L, bytes(video).take(100)),            // truncated mid-moov
      (4L, "not a video at all".getBytes),     // no box structure
      (5L, Array.emptyByteArray),              // empty
      (6L, bytes(video).updated(40, 0x7f.toByte)), // mvhd size escapes moov
      (7L, null))
    val out = rows.toDF("id", "b")
      .select($"id", graft.ops.Multimodal.videoMeta($"b").as("f"))
      .select($"id", $"f.duration_ms", $"f.n_tracks", $"f.width", $"f.height",
        $"f.codecs")
      .orderBy("id").collect()
    val v = out(0)
    assert((v.getLong(1), v.getInt(2), v.getInt(3), v.getInt(4), v.getString(5)) ==
      ((90500L, 2, 1920, 1080, "avc1,mp4a")), s"video fixture: $v")
    val a = out(1)
    assert((a.getLong(1), a.getInt(2), a.getString(5)) == ((10000L, 1, "mp4a")),
      s"audio fixture: $a")
    assert(a.isNullAt(3) && a.isNullAt(4), "audio-only: no dimensions")
    for (i <- 2 until 7)
      assert(out(i).isNullAt(1) && out(i).isNullAt(5),
        s"row ${out(i).getLong(0)} must be NULL (corrupt-input law): ${out(i)}")
  }
}
