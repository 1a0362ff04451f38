package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/**
 * Retrieval-QUALITY harness for the sketch/ANN family. The oracle suite
 * proves determinism parity (every operator computes exactly what it
 * claims); this main measures what the sketches are FOR — how much of the
 * true result the approximate path actually retrieves, per knob setting:
 *
 *  - MinHash-LSH banding: candidate recall/precision against EXACT
 *    shingle-Jaccard ground truth (full inverted index — every pair
 *    sharing ≥1 shingle exactly verified; pairs sharing none have J = 0
 *    and cannot reach any positive threshold).
 *  - SimHash-64 banded blocking (Hamming ≤ 3): recall/precision against
 *    the same exact-Jaccard truth at a high threshold (SimHash approximates
 *    token-frequency cosine, not Jaccard — the measured gap between the
 *    two notions is part of what this harness documents).
 *  - IVF / PQ / IVF-PQ: recall@k against the exact [[Similarity.bruteForceTopK]]
 *    scan, as nprobe scales (IVF) and under code compression (PQ).
 *
 * Corpus: the same planted near-dup corpus the bench queries use (each
 * document unioned with an id-shifted copy missing its first two tokens).
 * Writes ONE JSON line to stdout and `QUALITY.json` in the cwd.
 * `QualitySpec` asserts per-knob floors on these same metrics, so a
 * regression in banding/probing quality fails CI, not just a bench read.
 */
object Quality {

  /** documents ∪ near-dup mutation (drop first 2 tokens, id+1000000) —
    * mirrors the bench corpus in `LlmQueries.docsWithNearDups`. */
  def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = graft.queries.Tpch.read(s, dir, "documents")
    val toks = split(col("text"), " ")
    val mutated = d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(toks, lit(3), greatest(lit(0), size(toks) - 2)), " ").as("text"))
    d.select("doc_id", "text").unionByName(mutated)
  }

  /** EXACT Jaccard ground truth at `threshold`: one global block → the
    * candidate join is the full shingle inverted index, so every pair with
    * J ≥ threshold > 0 is found and exactly verified. Quadratic in the
    * largest shingle posting list — a measurement tool for bench-scale
    * corpora, not a production operator (that's what the sketches are for). */
  def jaccardTruth(docs: DataFrame, threshold: Double): DataFrame =
    Dedup.blockedNearDuplicates(
      docs.withColumn("_blk", lit(1)), "doc_id", "text", Seq("_blk"),
      shingle = 3, threshold = threshold)
      .select("id_a", "id_b")

  /** MinHash-LSH candidate pairs at (numHashes, bands) — measured WITH the
    * shipped occupancy cap, so the recall floors pin the capped shape the
    * dedup queries actually run (at sf0.1 max occupancy is ~41, so the cap
    * never binds and the floors are unchanged from the uncapped r7 values). */
  def minhashCandidates(docs: DataFrame, numHashes: Int, bands: Int): DataFrame =
    Dedup.candidatePairs(Dedup.lshBands(
      Dedup.minhashSignaturesNative(docs, "doc_id", "text", numHashes, shingle = 3),
      numHashes, bands), maxOccupancy = 64)

  def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** (recall, precision) of a predicted pair set vs truth; empty sides
    * score 1.0 (nothing to miss / nothing wrong). */
  def recallPrecision(
      pred: Set[(Long, Long)], truth: Set[(Long, Long)]): (Double, Double) = {
    val hit = (pred & truth).size.toDouble
    (if (truth.isEmpty) 1.0 else hit / truth.size,
      if (pred.isEmpty) 1.0 else hit / pred.size)
  }

  /** qid → retrieved vec_ids from a top-k result frame. */
  def topkMap(df: DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Mean per-query |pred ∩ truth| / |truth| (truth from the exact scan). */
  def recallAtK(pred: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
    require(truth.nonEmpty, "empty ground-truth top-k")
    truth.map { case (q, t) =>
      (pred.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size
  }

  /** Σ‖x − c(cell)‖² / Σ‖x‖² over the corpus (quantized domain) — the
    * geometry number that predicts how much residual PQ can help: ~0.2–0.3
    * on naturally clustered corpora (where residual encoding earns its
    * reputation), ~0.9+ on isotropic random vectors (where residuals are
    * nearly as big as the raw vectors and residual ≈ raw PQ by
    * construction). Recorded so the recall lines can be read against the
    * corpus's actual structure instead of folk expectations. */
  def residualEnergyRatio(e: DataFrame, cents: DataFrame): Double = {
    val cells = Similarity.ivfAssign(e, cents).select(col("vec_id"), col("cell"))
    val sums = e.select(col("vec_id"), col("embedding").as("v"))
      .join(cells, "vec_id")
      .join(broadcast(cents.select(col("cid").as("cell"), col("cvec"))), "cell")
      .select(
        aggregate(
          zip_with(Similarity.quantize(col("v")), Similarity.quantize(col("cvec")),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("rr"),
        aggregate(
          transform(Similarity.quantize(col("v")), x => x * x),
          lit(0L), (acc, x) => acc + x).as("xx"))
      .agg(sum("rr"), sum("xx")).collect()(0)
    sums.getLong(0).toDouble / sums.getLong(1)
  }

  /**
   * STRUCTURED embedding corpus (round-12 verdict item 4): the isotropic
   * synth embeddings refute every quality lever BY CONSTRUCTION (flat
   * spectrum → PCA has nothing to keep, rotation has nothing to align,
   * residuals are as big as the vectors), so the quality harness also
   * measures the same levers on a corpus with planted structure:
   *
   *  - 32 cluster centers living in the top 16 latent dimensions (IVF and
   *    residual encoding have real geometry to exploit);
   *  - a geometrically decaying noise spectrum (σ_k ∝ 0.95^k — PCA has
   *    variance to concentrate);
   *  - the latent frame mixed through the Sylvester-Hadamard rotation
   *    `H[d][k] = (−1)^popcount(d AND k)` (orthogonal, deterministic), so
   *    the OBSERVED axes correlate across PQ subspace boundaries — the
   *    regime where a learned rotation (OPQ-lite) can actually win;
   *  - `label = cell mod 4`, correlated with geometry (filtered-ANN truth
   *    sets are geometrically coherent).
   *
   * Everything is md5-hash-derived from (seed, index) — deterministic
   * across runs and engines, no RNG state.
   */
  def structuredEmbeddings(
      spark: SparkSession, n: Int, dims: Int = 64, cells: Int = 32): DataFrame = {
    import spark.implicits._
    def u(seed: String): Double = // uniform in [-1, 1], md5-derived
      graft.expressions.MinhashSigs.hash32Bytes(
        seed.getBytes("UTF-8")).toDouble / 2147483648.0 - 1.0
    val centers = Array.tabulate(cells, dims)((c, k) =>
      if (k < 16) u(s"qc:$c:$k") else 0.0)
    val sigma = Array.tabulate(dims)(k => 0.35 * math.pow(0.95, k))
    (0 until n).map { i =>
      val cell = i % cells
      val y = Array.tabulate(dims)(k => centers(cell)(k) * 0.8 + u(s"qz:$i:$k") * sigma(k))
      val x = Array.tabulate(dims) { d =>
        var s = 0.0
        var k = 0
        while (k < dims) {
          s += (if (Integer.bitCount(d & k) % 2 == 0) y(k) else -y(k))
          k += 1
        }
        (s / 16.0).toFloat // keeps |x| ~< 1 (the quantization contract)
      }
      (i.toLong, x, (cell % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalescing starts from here and merges down (parallelismFirst
      // keeps small stages wide): big shuffles keep up to 8x the reduce
      // parallelism instead of 10x-fatter partitions that spill
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // without this, persisted frames (the clustering loops' edge cache)
      // materialize at the UNcoalesced initial width — 256-task stages per
      // iteration on tiny cached data (measured 4.3s -> 7.2s on
      // q_dedup_clusters at sf0.1); with it AQE re-plans below the cache
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    // ---- text sketches vs exact Jaccard truth --------------------------
    val docs = docsWithNearDups(spark, sfDir).localCheckpoint()
    val truth80 = pairSet(jaccardTruth(docs, 0.8))
    val truth90 = pairSet(jaccardTruth(docs, 0.9))
    val mh = for (bands <- Seq(2, 4, 8)) yield {
      val (r, p) = recallPrecision(pairSet(minhashCandidates(docs, 16, bands)), truth80)
      s""""h16_b$bands":{"recall":$r,"precision":$p}"""
    }
    val (shR, shP) = recallPrecision(
      pairSet(Dedup.simhashNearDuplicates64(
        Dedup.simhashNative64(docs, "doc_id", "text"), maxHamming = 3)
        .select("id_a", "id_b")),
      truth90)

    // ---- ANN vs the exact scan -----------------------------------------
    val e = graft.queries.Tpch.read(spark, sfDir, "embeddings").localCheckpoint()
    val queries = e.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact5 = topkMap(Similarity.bruteForceTopK(e, queries, 5))
    val exact10 = topkMap(Similarity.bruteForceTopK(e, queries, 10))
    val cents = Similarity.trainCentroids(e, 32, 2)
    // Converged coarse training (round 10) — measured, NOT adopted for the
    // headline lines: on this near-isotropic corpus running Lloyd to
    // movement-ε (14 rounds at sf0.1) LOWERS the fixed-nprobe ceiling
    // (0.584 vs 0.611 at nprobe=2) — crisper cells hide cell-straddling
    // neighbors. Recorded so the "just converge the quantizer" hypothesis
    // stays refuted by the artifact itself; the ceiling lever at unchanged
    // nprobe is redundant assignment (ivf_nprobe2_multi2_at10 below).
    val (centsConv, kmIters) = Similarity.trainCentroidsConvergedDetail(
      e, 32, maxIters = 16, eps = 1e-3, trainFrac = 1.0, "vec_id", "embedding")
    val ivfConv = recallAtK(
      topkMap(Similarity.ivfTopK(e, centsConv, queries, 10, nprobe = 2)), exact10)
    // Redundant (top-2) assignment at unchanged nprobe=2: candidates are a
    // strict superset of single-assignment's, so exact scoring makes the
    // gain structural — the index carries 2x rows for it.
    val ivfMulti2 = recallAtK(
      topkMap(Similarity.ivfTopKMulti(
        e, cents, queries, 10, nprobe = 2, assignR = 2)), exact10)
    val ivf = for (np <- Seq(1, 2, 4, 8); k <- Seq(5, 10)) yield {
      val truth = if (k == 5) exact5 else exact10
      val r = recallAtK(topkMap(Similarity.ivfTopK(e, cents, queries, k, nprobe = np)), truth)
      s""""ivf_nprobe${np}_at$k":$r"""
    }
    val pq = for (m <- Seq(4, 8)) yield {
      val cb = Similarity.pqTrainCodebooks(e, dims = 64, m = m, k = 16, iters = 2)
      val codes = Similarity.pqEncode(e, cb, dims = 64, m = m).localCheckpoint()
      val full = recallAtK(
        topkMap(Similarity.pqAdcTopK(codes, cb, queries, 10, dims = 64, m = m)), exact10)
      // IVF-PQ is residual-encoded (round 8): codebooks trained on
      // residuals against the same coarse quantizer the probe uses
      val cbR = Similarity.pqTrainCodebooksResidual(
        e, cents, dims = 64, m = m, k = 16, iters = 2)
      val ivfpq = recallAtK(
        topkMap(Similarity.ivfPqTopK(
          e, cents, cbR, queries, 10, nprobe = 2, dims = 64, m = m)), exact10)
      s""""pq_m${m}_fullscan_at10":$full,"ivfpq_m${m}_nprobe2_at10":$ivfpq"""
    }
    // PCA-rotation ablation (round 11, the OPQ-lite hypothesis): rotate
    // the corpus by the full-rank PCA basis (an isometry — within the
    // rotated space exact search is the same problem), retrain the SAME
    // coarse+PQ configuration there, and measure recall against the
    // rotated-space exact truth. If variance-aligned subspaces help PQ on
    // this corpus, the rotated line beats ivfpq_m8_nprobe2_at10; either
    // way the number is recorded and the hypothesis stays pinned to the
    // artifact (the convergence-refutation discipline).
    val pcaModel = Similarity.pcaTrain(e, dims = 64, k = 64)
    val rot = Similarity.pcaProject(e, pcaModel)
      .select(col("vec_id"),
        transform(col("pca"),
          x => (x / pcaModel.scale.toDouble).cast("float")).as("embedding"))
      .localCheckpoint()
    val rotQueries = rot.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val rotExact10 = topkMap(Similarity.bruteForceTopK(rot, rotQueries, 10))
    val rotCents = Similarity.trainCentroids(rot, 32, 2)
    val rotCbR = Similarity.pqTrainCodebooksResidual(
      rot, rotCents, dims = 64, m = 8, k = 16, iters = 2)
    val ivfpqRot = recallAtK(
      topkMap(Similarity.ivfPqTopK(
        rot, rotCents, rotCbR, rotQueries, 10, nprobe = 2, dims = 64, m = 8)),
      rotExact10)

    // The k-lever: on this corpus the serving-recall knob that actually
    // moves is codes-per-subspace, not residual vs raw (see
    // residual_energy_ratio) — measured with the shipped operators.
    val cbR64 = Similarity.pqTrainCodebooksResidual(
      e, cents, dims = 64, m = 8, k = 64, iters = 2)
    val ivfpqK64 = recallAtK(
      topkMap(Similarity.ivfPqTopK(
        e, cents, cbR64, queries, 10, nprobe = 2, dims = 64, m = 8)), exact10)
    val energy = residualEnergyRatio(e, cents)
    // Exact re-rank (round 9): ADC only shortlists, the raw vectors decide
    // — recall should sit at/near the exact-scan ceiling of the same
    // nprobe (ivf_nprobe2_at10) even with the WEAK m=8/k=16 codebooks,
    // because the shortlist only has to CONTAIN the true top-10.
    val cbR16 = Similarity.pqTrainCodebooksResidual(
      e, cents, dims = 64, m = 8, k = 16, iters = 2)
    val rerank = recallAtK(
      topkMap(Similarity.ivfPqTopKRerank(
        e, cents, cbR16, queries, 10, nprobe = 2, shortlist = 256,
        dims = 64, m = 8)), exact10)
    // the full knob story: with re-rank absorbing the quantization error,
    // recall tracks the nprobe ceiling — raising nprobe is now the ONLY
    // lever left, and it buys exactly what the exact scan would
    val rerank8 = recallAtK(
      topkMap(Similarity.ivfPqTopKRerank(
        e, cents, cbR16, queries, 10, nprobe = 8, shortlist = 1024,
        dims = 64, m = 8)), exact10)
    // Redundant assignment WIRED INTO the persisted index (round 11): an
    // assign_r=2 index serves ivfPqTopKIndexedRerank at unchanged nprobe=2
    // with the superset candidate set — recall should land at the
    // ivf_nprobe2_multi2_at10 ceiling (re-rank absorbs quantization error,
    // leaving the multi-assignment probe reach as the binding constraint).
    // This is the build-once/query-many deployment shape, measured on the
    // real artifact (build → commit → read → serve), not the in-query path.
    val idxDir = Files.createTempDirectory("graft_quality_idx").toString
    Similarity.writeIndex(e, cents, cbR16, idxDir, dims = 64, m = 8, assignR = 2)
    val rerankMulti2 = recallAtK(
      topkMap(Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, idxDir), queries, 10, nprobe = 2,
        shortlist = 256)), exact10)
    // Filtered ANN (round 11): predicate pushed into the codes scan of an
    // attribute-carrying index; truth is the EXACT brute-force top-10 over
    // the predicate-passing corpus subset. At ~1/4 selectivity the probed
    // cells hold ~4× less matching mass, so fixed-nprobe recall drops —
    // the documented trade — and raising nprobe buys it back. Measured on
    // the persisted artifact with the re-rank stage.
    val fIdxDir = Files.createTempDirectory("graft_quality_fidx").toString
    Similarity.writeIndex(e, cents, cbR16, fIdxDir, dims = 64, m = 8,
      attrCols = Seq("label"))
    val fPred = col("label") === 2
    val fExact10 = topkMap(
      Similarity.bruteForceTopK(e.where(fPred), queries, 10))
    val fIdx = Similarity.readIndex(spark, fIdxDir)
    val filtered2 = recallAtK(
      topkMap(Similarity.ivfPqTopKIndexedRerank(
        fIdx, queries, 10, nprobe = 2, shortlist = 256,
        filter = Some(fPred))), fExact10)
    val filtered8 = recallAtK(
      topkMap(Similarity.ivfPqTopKIndexedRerank(
        fIdx, queries, 10, nprobe = 8, shortlist = 1024,
        filter = Some(fPred))), fExact10)

    // SQ8 (round 10): per-dimension 8-bit codes, full scan — the
    // 4×-compression tier should sit far above PQ's 128×-compressed recall
    // and near the exact scan
    val sqBounds = Similarity.sqTrainBounds(e)
    val sq8 = recallAtK(
      topkMap(Similarity.sqTopK(
        Similarity.sqEncode(e, sqBounds), sqBounds, queries, 10)), exact10)

    // Binary (1-bit sign) quantization (round 12): the 32× floor of the
    // ladder. The raw hamming scan is the honest low line (64 bits can't
    // rank 10 neighbors out of thousands); the production shape — hamming
    // shortlist + exact re-rank — is what the recall claim rides on.
    val bCodes = Similarity.binaryEncodeFrame(e, 64).localCheckpoint()
    val binRaw = recallAtK(
      topkMap(Similarity.binaryTopK(bCodes, queries, 10, 64)), exact10)
    val binRerank = recallAtK(
      topkMap(Similarity.binaryTopKRerankFromCodes(
        bCodes, e, queries, 10, 256, 64)), exact10)

    // ---- fuzzy-dedup blocking efficiency (round 10) --------------------
    // candidates admitted per true pair on the adversarial synthetic names
    // (near-identical digit tails) - the corpus where weak blocking drowns
    val cust = graft.queries.Tpch.read(spark, sfDir, "customer")
    val fuzzyRow = Dedup.editDistanceBlockingStats(cust, "c_custkey", "c_name", maxDist = 1)
      .collect()(0)
    val fuzzy =
      s""""fuzzy_d1":{"candidates":${fuzzyRow.getLong(0)},"pairs":${fuzzyRow.getLong(1)},""" +
        s""""efficiency":${fuzzyRow.getDouble(2)}}"""

    // ---- NB classifier held-out accuracy (round 11) --------------------
    // Honest-measurement pair: the synth corpus draws text independent of
    // its lang/source labels, so the LANG accuracy should sit AT the
    // majority prior (the corpus finding, same class as the PCA isotropy
    // floor) — while a CONTENT-DERIVED label on the same corpus shows the
    // classifier separates when signal exists.
    def holdoutAcc(d: DataFrame, labelCol: String): (Double, Double) = {
      val train = d.where(col("doc_id") % 10 < 8)
      val test = d.where(col("doc_id") % 10 >= 8).localCheckpoint()
      val preds = graft.ops.TextOps.nbPredict(
        test, "doc_id", "text", graft.ops.TextOps.nbTrain(train, labelCol, "text"))
      val acc = preds.join(test.select(col("doc_id"), col(labelCol).as("_t")), Seq("doc_id"))
        .agg(avg(when(col("pred") === col("_t"), 1.0).otherwise(0.0)))
        .collect()(0).getDouble(0)
      val prior = test.groupBy(col(labelCol)).count()
        .agg(max("count")).collect()(0).getLong(0).toDouble / test.count()
      (acc, prior)
    }
    val docsRaw = graft.queries.Tpch.read(spark, sfDir, "documents")
      .where(col("text").isNotNull)
    val (langAcc, langPrior) = holdoutAcc(docsRaw, "lang")
    // capability control at harness scale: planted class vocab + shared
    // noise (deterministic generator, 2:1 imbalance) — separable by design
    val planted = {
      import spark.implicits._
      val shared = Seq("the", "of", "data", "run", "with", "scan", "row")
      val va = Seq("spark", "join", "shuffle")
      val vb = Seq("tensor", "grad", "batchnorm")
      (0 until 10000).map { i =>
        val own = if (i % 3 != 0) va else vb
        val text = (0 until 40).map(j =>
          if (j % 4 == 0) own((i + j) % own.length)
          else shared((i * 7 + j) % shared.length)).mkString(" ")
        (i.toLong, if (i % 3 != 0) "a" else "b", text)
      }.toDF("doc_id", "lbl", "text")
    }
    val (plantedAcc, plantedPrior) = holdoutAcc(planted, "lbl")
    val nb =
      s""""nb":{"lang_holdout_acc":$langAcc,"lang_majority_prior":$langPrior,""" +
        s""""planted_signal_acc":$plantedAcc,"planted_majority_prior":$plantedPrior}"""

    // ---- STRUCTURED corpus: the same levers measured ON SIGNAL ----------
    // (round-12 verdict item 4 — every line here sits beside its isotropic
    // twin above; the corpus is deliberately anisotropic + clustered +
    // Hadamard-rotated, see structuredEmbeddings)
    val es = structuredEmbeddings(spark, math.max(2000, e.count().toInt))
      .localCheckpoint()
    val sQueries = es.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sExact10 = topkMap(Similarity.bruteForceTopK(es, sQueries, 10))
    val sCents = Similarity.trainCentroids(es, 32, 2)
    val sIvf = recallAtK(
      topkMap(Similarity.ivfTopK(es, sCents, sQueries, 10, nprobe = 2)), sExact10)
    val sEnergy = residualEnergyRatio(es, sCents)
    // PCA: explained variance of the top 32 of 64 components, and
    // recall@10 of EXACT search in the 32-dim projected space against the
    // full-space truth — the pair of numbers whose isotropic values (0.66
    // explained, 0.41 recall) were corpus findings, not engine ceilings
    val sPcaFull = Similarity.pcaTrain(es, dims = 64, k = 64)
    val sExplained32 =
      sPcaFull.eigenvalues.take(32).sum / sPcaFull.eigenvalues.sum
    val sPca32 = sPcaFull.copy(k = 32,
      basis = sPcaFull.basis.take(32), eigenvalues = sPcaFull.eigenvalues.take(32))
    val sProj = Similarity.pcaProject(es, sPca32)
      .select(col("vec_id"),
        transform(col("pca"),
          x => (x / sPca32.scale.toDouble).cast("float")).as("embedding"))
      .localCheckpoint()
    val sProjQueries = sProj.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sPcaRecall = recallAtK(
      topkMap(Similarity.bruteForceTopK(sProj, sProjQueries, 10)), sExact10)
    // OPQ-lite re-tested where it CAN win: baseline residual IVF-PQ vs the
    // same configuration after full-rank PCA rotation — on the Hadamard-
    // mixed spectrum the rotation re-concentrates variance into aligned
    // subspaces, which is precisely OPQ's claim
    val sCbR = Similarity.pqTrainCodebooksResidual(
      es, sCents, dims = 64, m = 8, k = 16, iters = 2)
    val sIvfpq = recallAtK(
      topkMap(Similarity.ivfPqTopK(
        es, sCents, sCbR, sQueries, 10, nprobe = 2, dims = 64, m = 8)), sExact10)
    val sRot = Similarity.pcaProject(es, sPcaFull)
      .select(col("vec_id"),
        transform(col("pca"),
          x => (x / sPcaFull.scale.toDouble).cast("float")).as("embedding"))
      .localCheckpoint()
    val sRotQueries = sRot.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sRotExact10 = topkMap(Similarity.bruteForceTopK(sRot, sRotQueries, 10))
    val sRotCents = Similarity.trainCentroids(sRot, 32, 2)
    val sRotCbR = Similarity.pqTrainCodebooksResidual(
      sRot, sRotCents, dims = 64, m = 8, k = 16, iters = 2)
    val sIvfpqRot = recallAtK(
      topkMap(Similarity.ivfPqTopK(
        sRot, sRotCents, sRotCbR, sRotQueries, 10, nprobe = 2, dims = 64, m = 8)),
      sRotExact10)
    // OPQ with BALANCED allocation (Ge et al.'s parametric OPQ insight):
    // plain PCA rotation CONCENTRATES variance — the first PQ subspace
    // then carries most of the energy and its 16 codes saturate, which is
    // why the rot line barely moves. The real OPQ lever deals the
    // variance-sorted components across subspaces in snake order so each
    // subspace quantizes a balanced slice; same isometry class, different
    // component-to-subspace assignment.
    val snakePerm: Array[Int] = {
      val mSub = 8
      val per = 64 / mSub
      val buckets = Array.fill(mSub)(List.empty[Int])
      for (r <- 0 until per; j <- 0 until mSub) {
        val compIdx = r * mSub + (if (r % 2 == 0) j else mSub - 1 - j)
        buckets(j) = buckets(j) :+ compIdx
      }
      buckets.flatten.toArray
    }
    val sPcaOpq = sPcaFull.copy(
      basis = snakePerm.map(sPcaFull.basis),
      eigenvalues = snakePerm.map(sPcaFull.eigenvalues))
    val sOpq = Similarity.pcaProject(es, sPcaOpq)
      .select(col("vec_id"),
        transform(col("pca"),
          x => (x / sPcaOpq.scale.toDouble).cast("float")).as("embedding"))
      .localCheckpoint()
    val sOpqQueries = sOpq.where(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sOpqExact10 = topkMap(Similarity.bruteForceTopK(sOpq, sOpqQueries, 10))
    val sOpqCents = Similarity.trainCentroids(sOpq, 32, 2)
    val sOpqCbR = Similarity.pqTrainCodebooksResidual(
      sOpq, sOpqCents, dims = 64, m = 8, k = 16, iters = 2)
    val sIvfpqOpq = recallAtK(
      topkMap(Similarity.ivfPqTopK(
        sOpq, sOpqCents, sOpqCbR, sOpqQueries, 10, nprobe = 2, dims = 64, m = 8)),
      sOpqExact10)
    // binary quantization on the structured corpus: clustered geometry
    // concentrates sign agreement within clusters, so the raw hamming line
    // should sit above its isotropic twin
    val sBinCodes = Similarity.binaryEncodeFrame(es, 64).localCheckpoint()
    val sBinRaw = recallAtK(
      topkMap(Similarity.binaryTopK(sBinCodes, sQueries, 10, 64)), sExact10)
    val sBinRerank = recallAtK(
      topkMap(Similarity.binaryTopKRerankFromCodes(
        sBinCodes, es, sQueries, 10, 256, 64)), sExact10)
    val structured =
      s""""structured":{"n":${es.count()},"ivf_nprobe2_at10":$sIvf,""" +
        s""""residual_energy_ratio":$sEnergy,""" +
        s""""pca32_explained_var":$sExplained32,"pca32_recall_at10":$sPcaRecall,""" +
        s""""ivfpq_m8_nprobe2_at10":$sIvfpq,""" +
        s""""ivfpq_m8_nprobe2_rot_at10":$sIvfpqRot,""" +
        s""""ivfpq_m8_nprobe2_opq_balanced_at10":$sIvfpqOpq,""" +
        s""""binary_fullscan_at10":$sBinRaw,"binary_rerank_sl256_at10":$sBinRerank}"""

    val json =
      s"""{"sf_dir":"$sfDir",$nb,$structured,"text":{"docs":${docs.count()},"truth_pairs_j80":${truth80.size},""" +
        s""""truth_pairs_j90":${truth90.size},"minhash_lsh":{${mh.mkString(",")}},""" +
        s""""simhash64_h3":{"recall":$shR,"precision":$shP}},""" +
        s""""ann":{"queries":${exact10.size},${ivf.mkString(",")},${pq.mkString(",")},""" +
        s""""ivfpq_m8_k64_nprobe2_at10":$ivfpqK64,"ivfpq_rerank_at10":$rerank,""" +
        s""""ivfpq_rerank_nprobe8_at10":$rerank8,""" +
        s""""ivfpq_rerank_multi2_at10":$rerankMulti2,"sq8_fullscan_at10":$sq8,""" +
        s""""binary_fullscan_at10":$binRaw,"binary_rerank_sl256_at10":$binRerank,""" +
        s""""ivfpq_filtered_nprobe2_at10":$filtered2,""" +
        s""""ivfpq_filtered_nprobe8_at10":$filtered8,""" +
        s""""ivfpq_m8_nprobe2_rot_at10":$ivfpqRot,""" +
        s""""kmeans_converged_iters":$kmIters,""" +
        s""""ivf_converged_nprobe2_at10":$ivfConv,""" +
        s""""ivf_nprobe2_multi2_at10":$ivfMulti2,""" +
        s""""residual_energy_ratio":$energy},$fuzzy}"""
    println(json)
    Files.writeString(Paths.get("QUALITY.json"), json + "\n")
    spark.stop()
  }
}
