package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/**
 * Retrieval-quality floors for the sketch/ANN family at sf0.01 — the CI
 * counterpart of the `Quality` main (which writes QUALITY.json at sf0.1).
 * Everything here is deterministic (planted corpus, deterministic hashes,
 * deterministic training), so the floors are regression tripwires for code
 * changes, not statistical tolerances; they sit comfortably below the
 * measured values (MinHash h16_b4 measured 0.995 recall / 0.908 precision,
 * SimHash64 0.743/0.964, IVF nprobe8 recall@10 0.794, PQ m4 full-scan
 * 0.258 — see QUALITY.json history).
 */
class QualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("NB classifier separates a planted-signal corpus far above the majority prior") {
    import spark.implicits._
    import graft.ops.TextOps
    // class-specific vocab mixed with shared noise: learnable by design
    val shared = Seq("the", "of", "data", "run", "with")
    val va = Seq("spark", "join", "shuffle")
    val vb = Seq("tensor", "grad", "batchnorm")
    def doc(i: Int, own: Seq[String]) =
      (0 until 12).map(j =>
        if (j % 3 == 0) own((i + j) % own.length)
        else shared((i * 7 + j) % shared.length)).mkString(" ")
    val rows = (0 until 120).map { i =>
      if (i % 3 != 0) (i.toLong, "a", doc(i, va)) // 2:1 imbalance
      else (i.toLong, "b", doc(i, vb))
    }
    val df = rows.toDF("doc_id", "label", "text")
    val m = TextOps.nbTrain(df.where($"doc_id" % 10 < 8), "label", "text")
    val test = df.where($"doc_id" % 10 >= 8)
    val acc = TextOps.nbPredict(test, "doc_id", "text", m)
      .join(test.select($"doc_id", $"label"), Seq("doc_id"))
      .agg(avg(when($"pred" === $"label", 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    // majority prior is ~0.67; planted vocab must push NB near-perfect
    assert(acc >= 0.95, s"planted-signal accuracy $acc below 0.95")
  }

  test("minhash-LSH banding: recall/precision floors and the bands s-curve") {
    GraftExtensions.register(spark)
    val docs = Quality.docsWithNearDups(spark, dir).localCheckpoint()
    val truth = Quality.pairSet(Quality.jaccardTruth(docs, 0.8))
    assert(truth.nonEmpty)
    val byBands = Seq(2, 4, 8).map { b =>
      b -> Quality.recallPrecision(
        Quality.pairSet(Quality.minhashCandidates(docs, 16, b)), truth)
    }.toMap
    val (r4, p4) = byBands(4)
    assert(r4 >= 0.95, s"h16_b4 recall $r4 < 0.95")
    assert(p4 >= 0.80, s"h16_b4 precision $p4 < 0.80")
    assert(byBands(8)._1 >= 0.99, s"h16_b8 recall ${byBands(8)._1} < 0.99")
    // more bands = shorter band keys = more candidates: recall must be
    // monotone in bands (the s-curve moving left)
    assert(byBands(2)._1 <= byBands(4)._1 && byBands(4)._1 <= byBands(8)._1,
      s"recall not monotone in bands: $byBands")

    val (shR, shP) = Quality.recallPrecision(
      Quality.pairSet(Dedup.simhashNearDuplicates64(
        Dedup.simhashNative64(docs, "doc_id", "text"), maxHamming = 3)
        .select("id_a", "id_b")),
      Quality.pairSet(Quality.jaccardTruth(docs, 0.9)))
    assert(shR >= 0.60, s"simhash64 recall $shR < 0.60")
    assert(shP >= 0.85, s"simhash64 precision $shP < 0.85")
  }

  test("IVF recall@k floors; recall monotone in nprobe; PQ floor") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)
    val byProbe = Seq(1, 2, 8).map { np =>
      np -> Quality.recallAtK(
        Quality.topkMap(Similarity.ivfTopK(e, cents, queries, 10, nprobe = np)), exact)
    }.toMap
    assert(byProbe(1) >= 0.40, s"ivf nprobe1 recall@10 ${byProbe(1)} < 0.40")
    assert(byProbe(2) >= 0.50, s"ivf nprobe2 recall@10 ${byProbe(2)} < 0.50")
    assert(byProbe(8) >= 0.70, s"ivf nprobe8 recall@10 ${byProbe(8)} < 0.70")
    // probing more cells only ever adds candidates scored by the same
    // exact dot, so recall is monotone in nprobe — a structural law, not
    // a tuned tolerance
    assert(byProbe(1) <= byProbe(2) && byProbe(2) <= byProbe(8),
      s"recall not monotone in nprobe: $byProbe")

    val cb = Similarity.pqTrainCodebooks(e, dims = 64, m = 4, k = 16, iters = 2)
    val codes = Similarity.pqEncode(e, cb, dims = 64, m = 4)
    val pqR = Quality.recallAtK(
      Quality.topkMap(Similarity.pqAdcTopK(codes, cb, queries, 10, dims = 64, m = 4)), exact)
    assert(pqR >= 0.15, s"pq m4 full-scan recall@10 $pqR < 0.15")

    // SQ8 (round 10): 8 bits per DIMENSION (4× compression) must rank far
    // above PQ's 4-bits-per-16-dims (128×) and essentially at the exact
    // scan — per-dimension max quantization error is span/255 ≈ 0.4% of
    // the component range
    val sqBounds = Similarity.sqTrainBounds(e)
    val sqR = Quality.recallAtK(
      Quality.topkMap(Similarity.sqTopK(
        Similarity.sqEncode(e, sqBounds), sqBounds, queries, 10)), exact)
    assert(sqR >= 0.95, s"sq8 full-scan recall@10 $sqR < 0.95")
    assert(sqR > pqR, s"sq8 ($sqR) should beat pq m4 ($pqR)")
  }

  test("residual IVF-PQ: recall floors, the k-lever, and the energy diagnostic") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)

    val cbR = Similarity.pqTrainCodebooksResidual(e, cents, dims = 64, m = 8, k = 16, iters = 2)
    val r16 = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfPqTopK(
        e, cents, cbR, queries, 10, nprobe = 2, dims = 64, m = 8)), exact)
    info(s"residual ivfpq m8 k16 nprobe2 recall@10 = $r16")
    assert(r16 >= 0.35, s"residual ivfpq m8 k16 recall@10 $r16 < 0.35 (measured 0.437)")

    // the k-lever: more codes per subspace must not lose recall on this
    // corpus (measured gain ~0.29 → ~0.36 at sf0.1)
    val cbR64 = Similarity.pqTrainCodebooksResidual(e, cents, dims = 64, m = 8, k = 64, iters = 2)
    val r64 = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfPqTopK(
        e, cents, cbR64, queries, 10, nprobe = 2, dims = 64, m = 8)), exact)
    info(s"residual ivfpq m8 k64 nprobe2 recall@10 = $r64")
    assert(r64 >= r16 - 0.05, s"k=64 recall $r64 collapsed vs k=16 $r16")

    // geometry diagnostic: on this isotropic corpus residuals carry most
    // of the raw energy (~0.9) — the measured reason residual ≈ raw PQ
    // here, and the number that flips on naturally clustered corpora
    val energy = Quality.residualEnergyRatio(e, cents)
    info(s"residual energy ratio = $energy")
    assert(energy > 0.0 && energy < 1.0, s"residual energy ratio $energy out of (0,1)")
  }

  test("exact re-rank lifts IVF-PQ recall to the nprobe ceiling") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)
    val cbR = Similarity.pqTrainCodebooksResidual(e, cents, dims = 64, m = 8, k = 16, iters = 2)

    val adcOnly = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfPqTopK(
        e, cents, cbR, queries, 10, nprobe = 2, dims = 64, m = 8)), exact)
    val reranked = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfPqTopKRerank(
        e, cents, cbR, queries, 10, nprobe = 2, shortlist = 256, dims = 64, m = 8)), exact)
    val ceiling = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfTopK(e, cents, queries, 10, nprobe = 2)), exact)
    info(s"adc-only $adcOnly -> reranked $reranked (exact nprobe2 ceiling $ceiling)")
    assert(reranked >= adcOnly,
      s"re-rank lost recall: $reranked < adc-only $adcOnly")

    // STRUCTURAL law, not a tuned floor: 500 vectors over 32 cells put
    // ~31 candidates in any query's 2 probed cells, so a 256-row
    // shortlist contains EVERY probed candidate — the two-stage ranking
    // then equals the single-stage exact scan of the same cells exactly
    // (same dot, same vec_id tie-break), codebook quality irrelevant
    assert(reranked == ceiling,
      s"full-coverage re-rank $reranked != exact nprobe2 ceiling $ceiling")

    // and the serving floor the round-8 verdict asked for, at spec scale
    assert(reranked >= 0.50, s"re-rank recall@10 $reranked < 0.50")
  }

  test("binary quantization: re-rank absorbs the sign-bit error; full shortlist equals brute") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val raw = Quality.recallAtK(
      Quality.topkMap(Similarity.binaryTopK(
        Similarity.binaryEncodeFrame(e, 64), queries, 10, 64)), exact)
    val reranked = Quality.recallAtK(
      Quality.topkMap(Similarity.binaryTopKRerank(e, queries, 10, 256, 64)), exact)
    info(s"binary raw $raw -> reranked(sl=256) $reranked")
    assert(reranked >= raw, s"re-rank lost recall: $reranked < raw $raw")
    assert(reranked >= 0.6, s"binary re-rank recall@10 $reranked < 0.6")
    // STRUCTURAL law: a shortlist covering the whole corpus makes the
    // two-stage ranking THE exact scan (same dot, same vec_id tie-break) —
    // the hamming stage only reorders what the re-rank fully re-scores
    val full = Quality.recallAtK(
      Quality.topkMap(Similarity.binaryTopKRerank(e, queries, 10, 1 << 20, 64)), exact)
    assert(full == 1.0, s"corpus-wide shortlist re-rank recall $full != 1.0")
  }

  test("converged coarse training: deterministic, converges before the cap, ceiling effect measured") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))

    val cents2 = Similarity.trainCentroids(e, 32, 2)
    val (centsC, iters) = Similarity.trainCentroidsConvergedDetail(
      e, 32, maxIters = 16, eps = 1e-3, trainFrac = 1.0, "vec_id", "embedding")
    info(s"converged after $iters Lloyd rounds")
    assert(iters > 2, s"converged in $iters rounds — movement-ε stop degenerated to the pinned count")
    assert(iters < 16, s"hit the $iters-round cap without converging")

    // determinism: an identical run stops after the identical round count
    // with bit-identical centroids (the engine-portability contract)
    val (centsC2, iters2) = Similarity.trainCentroidsConvergedDetail(
      e, 32, maxIters = 16, eps = 1e-3, trainFrac = 1.0, "vec_id", "embedding")
    assert(iters2 == iters)
    def cmat(df: org.apache.spark.sql.DataFrame): Seq[(Int, Seq[Float])] =
      df.collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    assert(cmat(centsC2) == cmat(centsC), "converged training is not deterministic")

    // MEASURED (not assumed): on this near-isotropic corpus convergence is
    // ceiling-NEUTRAL at fixed nprobe — the tolerance band pins "no
    // collapse, no miracle" so a regression in either direction surfaces
    val r2 = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfTopK(e, cents2, queries, 10, nprobe = 2)), exact)
    val rC = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfTopK(e, centsC, queries, 10, nprobe = 2)), exact)
    info(s"nprobe2 ceiling: 2 rounds $r2 -> converged $rC")
    assert(math.abs(rC - r2) <= 0.06,
      s"converged-vs-2-round ceiling moved outside the measured band: $r2 -> $rC")

    // sample-bounded training is deterministic and structurally usable
    // (250 training points for 32 cells at spec scale is noise-dominated,
    // so only a sanity floor is pinned — the bound exists for 100 TB cost,
    // not for spec-scale quality)
    val (centsS, _) = Similarity.trainCentroidsConvergedDetail(
      e, 32, maxIters = 16, eps = 1e-3, trainFrac = 0.5, "vec_id", "embedding")
    val (centsS2, _) = Similarity.trainCentroidsConvergedDetail(
      e, 32, maxIters = 16, eps = 1e-3, trainFrac = 0.5, "vec_id", "embedding")
    assert(cmat(centsS2) == cmat(centsS), "sampled training is not deterministic")
    val rS = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfTopK(e, centsS, queries, 10, nprobe = 2)), exact)
    info(s"nprobe2 ceiling with trainFrac=0.5 quantizer: $rS")
    assert(rS >= 0.25, s"half-sample quantizer unusable: $rS")
  }

  test("redundant assignment: recall at unchanged nprobe is a structural superset gain") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)

    // r=1 multi must equal plain ivfTopK exactly (same cells, same
    // ranking) — the degenerate-case identity that pins the plumbing
    val single = Quality.topkMap(Similarity.ivfTopK(e, cents, queries, 10, nprobe = 2))
    val multi1 = Quality.topkMap(Similarity.ivfTopKMulti(
      e, cents, queries, 10, nprobe = 2, assignR = 1))
    assert(multi1 == single, "assignR=1 must reproduce single-assignment exactly")

    // r=2: candidates are a strict superset, exact scoring → recall can
    // only rise (structural), and on this corpus it rises MATERIALLY
    val rSingle = Quality.recallAtK(single, exact)
    val rMulti = Quality.recallAtK(Quality.topkMap(Similarity.ivfTopKMulti(
      e, cents, queries, 10, nprobe = 2, assignR = 2)), exact)
    info(s"nprobe2 recall@10: single $rSingle -> multi-r2 $rMulti")
    assert(rMulti >= rSingle, s"superset candidates lost recall: $rSingle -> $rMulti")
    assert(rMulti >= rSingle + 0.04,
      s"multi-assignment gain collapsed: $rSingle -> $rMulti (measured ~+0.09)")
  }

  test("persisted assign_r=2 index: indexed re-rank reaches the multi-assignment ceiling") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, dir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Quality.topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)
    val cbR = Similarity.pqTrainCodebooksResidual(e, cents, dims = 64, m = 8, k = 16, iters = 2)

    val d1 = tmpDir("q_idx_r1")
    val d2 = tmpDir("q_idx_r2")
    Similarity.writeIndex(e, cents, cbR, d1, dims = 64, m = 8, assignR = 1)
    Similarity.writeIndex(e, cents, cbR, d2, dims = 64, m = 8, assignR = 2)

    def served(idxDir: String): Map[Long, Set[Long]] = Quality.topkMap(
      Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, idxDir), queries, 10, nprobe = 2, shortlist = 256))

    // r=1 identity on the INDEXED path: the in-query two-stage ranking and
    // the persisted-index one share quantizers, so recall is identical
    val r1 = Quality.recallAtK(served(d1), exact)
    val inQuery = Quality.recallAtK(Quality.topkMap(
      Similarity.ivfPqTopKRerank(
        e, cents, cbR, queries, 10, nprobe = 2, shortlist = 256,
        dims = 64, m = 8)), exact)
    assert(r1 == inQuery, s"persisted r=1 serving ($r1) != in-query re-rank ($inQuery)")

    // STRUCTURAL ceiling law: with a shortlist covering every probed
    // candidate, the r=2 indexed re-rank equals the exact scan over the
    // multi-assigned candidate set — ivfTopKMulti at the same knobs
    val r2Served = served(d2)
    val ceiling = Quality.topkMap(Similarity.ivfTopKMulti(
      e, cents, queries, 10, nprobe = 2, assignR = 2))
    assert(r2Served == ceiling,
      "r=2 indexed re-rank diverged from the exact multi-assignment scan")

    // and the measured gain the round-10 verdict asked to wire in: the
    // build-once/query-many shape now carries the ~0.70-at-nprobe2 recall
    val r2 = Quality.recallAtK(r2Served, exact)
    info(s"indexed re-rank recall@10 at nprobe=2: r1 $r1 -> r2 $r2")
    assert(r2 >= r1 + 0.04, s"persisted multi-assignment gain collapsed: $r1 -> $r2")
    assert(r2 >= 0.60, s"persisted r=2 recall@10 $r2 < 0.60 (measured ~0.70)")
  }

  test("structured corpus: PCA/IVF/residual levers work ON SIGNAL — the anisotropic " +
    "twins of the isotropic floors") {
    // deterministic generator (md5-derived), so these are regression
    // tripwires; floors sit below the measured sf0.1 values (ivf 0.99,
    // explained 0.996, pca recall 0.86, energy 0.12 — QUALITY.json)
    val es = Quality.structuredEmbeddings(spark, 1000).localCheckpoint()
    val queries = es.where(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact10 = Quality.topkMap(Similarity.bruteForceTopK(es, queries, 10))
    val cents = Similarity.trainCentroids(es, 16, 2)
    val ivf = Quality.recallAtK(
      Quality.topkMap(Similarity.ivfTopK(es, cents, queries, 10, nprobe = 2)), exact10)
    assert(ivf >= 0.85, s"clustered-corpus IVF recall collapsed: $ivf")
    val energy = Quality.residualEnergyRatio(es, cents)
    assert(energy <= 0.5,
      s"planted clusters must leave small residuals, got energy ratio $energy")
    val pca = Similarity.pcaTrain(es, dims = 64, k = 64)
    val explained32 = pca.eigenvalues.take(32).sum / pca.eigenvalues.sum
    assert(explained32 >= 0.9,
      s"planted spectrum must concentrate in 32 components, got $explained32")
    val pca32 = pca.copy(k = 32,
      basis = pca.basis.take(32), eigenvalues = pca.eigenvalues.take(32))
    val proj = Similarity.pcaProject(es, pca32)
      .select(col("vec_id"),
        transform(col("pca"),
          x => (x / pca32.scale.toDouble).cast("float")).as("embedding"))
    val projQ = proj.where(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pcaRecall = Quality.recallAtK(
      Quality.topkMap(Similarity.bruteForceTopK(proj, projQ, 10)), exact10)
    assert(pcaRecall >= 0.7,
      s"64->32 PCA search on an anisotropic corpus must beat the 0.41 isotropic " +
        s"floor decisively, got $pcaRecall")
  }
}
