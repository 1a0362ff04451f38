package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StructField, StructType}

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * All scoring is done on integer-quantized components
 * (`floor(x · 10^6)` per dimension): a float→double cast and a single double
 * multiply are exactly rounded, so the quantized values — and therefore every
 * dot product — are integers computed identically on any engine, with no
 * float-summation-order nondeterminism. At 10^6 scale the quantization error
 * on unit vectors is ~10^-6, far below any ranking-relevant margin; ties are
 * broken by vector id.
 *
 * The scoring kernel is the native codegen'd expression
 * [[graft.expressions.QuantizedDot]] (`quantized_dot`), installed by
 * [[graft.GraftExtensions]] — the composed `aggregate(zip_with(...))` form is
 * semantically identical but runs interpreted (higher-order functions don't
 * codegen) and measures ~4× slower; it is kept here as [[intDot]] for
 * cross-checking.
 *
 * Scale design:
 *  - [[bruteForceTopK]] is the exact baseline: a broadcast of the (small)
 *    query set against the corpus — one pass, no shuffle of the corpus, a
 *    per-query top-k via partial TakeOrdered. Linear in corpus size.
 *  - [[srpSignature]] buckets vectors by a sign-random-projection bit
 *    signature (deterministic integer weights). Near-dup search and ANN then
 *    join only within buckets — candidate cost ∝ bucket sizes, not N².
 *  - [[ivfAssign]] is the IVF coarse quantizer: vectors are assigned to their
 *    nearest centroid cell; a query probes only its own cell(s). Centroid
 *    count √N keeps both sides balanced at scale.
 */
object Similarity {

  /** Quantization scale: 6 decimal digits of a unit-vector component. */
  val Scale: Double = 1e6

  /** Native codegen'd quantized dot product (requires
    * [[graft.GraftExtensions.register]] on the session). */
  def dotQ(a: Column, b: Column): Column =
    call_function("quantized_dot", a, b)

  /** `array<float>` → `array<long>` quantized components (slow-path util). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x * Scale).cast("long"))

  /** Interpreted reference implementation of the quantized dot product —
    * same integers as [[dotQ]]; used to cross-check the native expression. */
  def intDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from integer dot/norms (single double ops at the end). */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  // ---------------------------------------------------------------------
  // Driver-held codebook machinery — the shuffle-free encode/assign path.
  //
  // Centroid sets and PQ codebooks are broadcast-sized BY CONSTRUCTION
  // (k ≈ √N cells is a few thousand rows even at 1B vectors; a PQ codebook
  // is m·k rows of `dims/m` floats — a few KB). Holding them driver-side
  // lets every assignment/encode be a pure PROJECTION: an argmin over
  // per-centroid quantized dots computed per row, no broadcast-join ×
  // k-candidates blow-up and no `groupBy(vec_id)` exchange afterwards. At
  // 100 TB that exchange is N small rows of pure waste per encode pass —
  // this path removes it (PlanAuditSpec pins the no-Exchange shape).
  // ---------------------------------------------------------------------

  /** Hard cap on rows collected for a driver-held centroid/codebook set —
    * far above any sane configuration (cells ≈ √N wants scale-out long
    * before 65536 centroids), and a fail-loud guard against accidentally
    * passing a corpus where a codebook belongs. */
  val MaxLocalCodebookRows: Int = 1 << 16

  /** Driver-side mirror of `dotQ(cv, cv)` — same float→double widening,
    * same `floor(x·10^6)` quantization, same integer sum as
    * [[graft.expressions.QuantizedDot]], so a driver-computed ‖c‖² bias
    * is bit-identical to the in-plan self-dot it replaces. */
  private def qdotSelf(cv: Array[Float]): Long = {
    var acc = 0L
    var i = 0
    while (i < cv.length) {
      val q = math.floor(cv(i) * 1e6).toLong
      acc += q * q
      i += 1
    }
    acc
  }

  /** Driver-side `floor(x·10^6)` pre-quantization of a centroid. */
  private def quantizeLocal(cv: Array[Float]): Seq[Long] =
    cv.toSeq.map(f => math.floor(f * 1e6).toLong)

  /** Per-row best candidate INDEX via the native `quantized_argbest`
    * kernel: argmin of `bias[c] − 2·dot(v, cents[c])`, ties → smallest
    * index. With `bias = ‖c‖²` this is the exact L2 argmin; with
    * `bias = 0` it is the max-dot argmax (argmin −2·dot). Candidates MUST
    * be pre-sorted by ascending cid so index tie-break ≡ cid tie-break.
    * The pre-quantized candidate matrix rides as one foldable literal that
    * becomes a codegen REFERENCE object — generated source stays stable
    * across centroid values, so retrained centroids never trigger a
    * recompile (the composed array_min form did, at seconds per compile).
    */
  private def argBestIdx(v: Column, cents: Seq[(Any, Array[Float])], l2: Boolean): Column = {
    val qcents = cents.map { case (_, cv) => quantizeLocal(cv) }
    val bias = if (l2) cents.map { case (_, cv) => qdotSelf(cv) } else cents.map(_ => 0L)
    call_function("quantized_argbest", v, typedlit(qcents), typedlit(bias))
  }

  /** The candidate id at a kernel-returned index, preserving the original
    * cid column type (int for trained centroids, caller-supplied otherwise). */
  private def cidAt(cents: Seq[(Any, Array[Float])], idx: Column): Column =
    cents.head._1 match {
      case _: Int => element_at(typedlit(cents.map(_._1.asInstanceOf[Int])), idx + 1)
      case _: Long => element_at(typedlit(cents.map(_._1.asInstanceOf[Long])), idx + 1)
      case other => throw new IllegalArgumentException(
        s"centroid ids must be int or bigint, got ${other.getClass.getSimpleName}")
    }

  /** The candidate vector at a kernel-returned index (one float-array
    * lookup per row — used to recover the winning dot product). */
  private def cvecAt(cents: Seq[(Any, Array[Float])], idx: Column): Column =
    element_at(typedlit(cents.map(_._2.toSeq)), idx + 1)

  private def sortKey(cid: Any): Long = cid match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(
      s"centroid ids must be int or bigint, got ${other.getClass.getSimpleName}")
  }

  /** Collect a broadcast-sized centroid frame driver-side (fail-loud past
    * [[MaxLocalCodebookRows]]), sorted by ascending cid so the kernel's
    * smallest-index tie-break matches the smallest-cid contract. Keeps
    * each cid at its ORIGINAL type so the projection's `cell` column
    * matches the join-based schema exactly. */
  private def collectCentroids(
      centroids: DataFrame, cIdCol: String, cVecCol: String): Seq[(Any, Array[Float])] = {
    val rows = centroids.select(col(cIdCol), col(cVecCol))
      .limit(MaxLocalCodebookRows + 1).collect()
    require(rows.nonEmpty, "centroid set is empty")
    require(rows.length <= MaxLocalCodebookRows,
      s"centroid set exceeds $MaxLocalCodebookRows rows — this is a corpus, not a codebook")
    rows.toSeq.map(r => (r.get(0), r.getSeq[Float](1).toArray)).sortBy(t => sortKey(t._1))
  }

  /** Collect PQ codebooks driver-side, grouped by subspace. */
  private def collectCodebooks(codebooks: DataFrame): Map[Int, Seq[(Any, Array[Float])]] = {
    val rows = codebooks.select(col("sub").cast("int"), col("cid"), col("cvec"))
      .limit(MaxLocalCodebookRows + 1).collect()
    require(rows.nonEmpty, "codebook set is empty")
    require(rows.length <= MaxLocalCodebookRows,
      s"codebook set exceeds $MaxLocalCodebookRows rows — this is a corpus, not a codebook")
    rows.toSeq.groupBy(_.getInt(0)).map { case (s, rs) =>
      s -> rs.map(r => (r.get(1), r.getSeq[Float](2).toArray)).sortBy(t => sortKey(t._1))
    }
  }

  /** Exact-integer Lloyd's mean from collected `(cell, d, sx, cnt)` rows:
    * one long→double cast per sum, one double division by the exact count,
    * one ÷10^6 and one float rounding — the identical arithmetic chain the
    * in-plan `((sx.cast(double)/cnt)/Scale).cast(float)` performed, so the
    * driver-iterated trainer is bit-identical to the join-based one. */
  private def lloydMeans(rows: Seq[Row]): Seq[(Int, Array[Float])] =
    rows.groupBy(_.getInt(0)).toSeq.map { case (cell, rs) =>
      val comps = rs
        .map(r => (r.getInt(1), ((r.getLong(2).toDouble / r.getLong(3)) / Scale).toFloat))
        .sortBy(_._1).map(_._2)
      (cell, comps.toArray)
    }.sortBy(_._1)

  /** Seed centroids: the `k` lowest-id vectors, cid 0..k−1 in id order. */
  private def seedRows(
      emb: DataFrame, k: Int, idCol: String, vecCol: String): Seq[(Int, Array[Float])] =
    emb.select(col(idCol).as("_sid"), col(vecCol).as("cvec"))
      .orderBy(col("_sid").asc).limit(k).collect()
      .toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  /** `(cid, cvec)` DataFrame from driver-held centroids. */
  private def centroidFrame(spark: SparkSession, cents: Seq[(Int, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("cvec", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      cents.map { case (cid, cv) => Row(cid, cv.toSeq) }.asJava, schema)
  }

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * (it is broadcast); the corpus is streamed once. Scores are integer dot
   * products (≙ cosine ranking for normalized embeddings).
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"))))
      .select(col("qid"), col("vec_id"), dotQ(col("v"), col("qv")).as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * Hard-negative mining over ANY scored candidate frame
   * `(qid, vec_id, dot)` — the contrastive-training data generator (DPR,
   * Karpukhin et al. 2020): per query, the top-`k` highest-scoring corpus
   * vectors that are NOT labeled positives. `positives` is the label
   * relation `(qid, vec_id)` — queries-sided and broadcast by construction.
   *
   * `fnFrac` is the RocketQA-style false-negative guard (Qu et al. 2021):
   * an unlabeled candidate scoring above `fnFrac ×` the query's best
   * LABELED positive score is likely a missing label, not a negative —
   * mining it would train the model to push true matches apart. When set,
   * such candidates are excluded (threshold test is one double multiply per
   * row — engine-exact); queries with no labeled positive keep all
   * candidates (nothing to calibrate against).
   *
   * Pass [[bruteForceTopK]]'s internals via [[hardNegatives]] for the exact
   * tier, or any indexed serving output (`ivfTopK`/`ivfPqTopKIndexed`) —
   * the miner only needs `(qid, vec_id, dot)`, so the candidate generator
   * scales independently.
   */
  def hardNegativesFrom(
      scored: DataFrame, positives: DataFrame, k: Int,
      fnFrac: Option[Double] = None,
      idCol: String = "vec_id", qIdCol: String = "qid"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    fnFrac.foreach(f => require(f > 0, s"fnFrac must be positive, got $f"))
    val pos = positives.select(col(qIdCol).as("qid"), col(idCol).as("vec_id"))
    val cand = scored.join(broadcast(pos), Seq("qid", "vec_id"), "left_anti")
    val filtered = fnFrac match {
      case Some(f) =>
        val pmax = scored.join(broadcast(pos), Seq("qid", "vec_id"))
          .groupBy("qid").agg(max(col("dot")).as("_pmax"))
        cand.join(broadcast(pmax), Seq("qid"), "left")
          .where(col("_pmax").isNull ||
            col("dot").cast("double") <= lit(f) * col("_pmax").cast("double"))
          .drop("_pmax")
      case None => cand
    }
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    filtered.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** [[hardNegativesFrom]] over the exact brute-force scorer: corpus
    * streamed once against broadcast queries, every non-positive ranked. */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame, positives: DataFrame, k: Int,
      fnFrac: Option[Double] = None,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"))))
      .select(col("qid"), col("vec_id"), dotQ(col("v"), col("qv")).as("dot"))
    hardNegativesFrom(scored, positives, k, fnFrac, idCol = "vec_id", qIdCol = "qid")
  }

  // -------------------------------------------------------------------------
  // SQ8 scalar quantization — the third compression tier alongside PQ and
  // residual IVF-PQ (the classic Faiss/Lucene `SQ8` codec): every dimension
  // is independently linear-quantized to an 8-bit code against per-dimension
  // corpus [min, max] bounds. 4× compression (1 byte/dim vs float32) with
  // far higher fidelity than PQ's 128× — the tier to reach for when PQ
  // recall is not enough but raw vectors don't fit.
  //
  // Everything stays in the exact integer domain: bounds are min/max of the
  // floor(x·10⁶) quantized components, codes are floor-divisions of
  // integers, and the asymmetric score is the integer
  //   Σ_d qq[d] · (255·mn[d] + code[d]·(mx[d] − mn[d]))
  // — i.e. 255× the dot of the query against the dequantized corpus vector,
  // scale-invariant for ranking and bit-identical on any engine.
  // -------------------------------------------------------------------------

  /** Per-dimension [min, max] of the quantized component domain over the
    * corpus — the SQ8 "trainer" (one aggregate pass; `dims` rows). */
  def sqTrainBounds(
      emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(posexplode(quantize(col(vecCol))).as(Seq("d", "q")))
      .groupBy("d").agg(min(col("q")).as("mn"), max(col("q")).as("mx"))

  /** Collected (mn, mx) bound arrays indexed by dimension — broadcast-sized
    * by construction (`dims` rows), guarded like every driver-held codebook. */
  private def collectBounds(bounds: DataFrame): (Array[Long], Array[Long]) = {
    val rows = bounds.orderBy("d").collect()
    require(rows.length <= MaxLocalCodebookRows,
      s"sqEncode bounds has ${rows.length} rows — pass per-dimension bounds, not a corpus")
    (rows.map(_.getAs[Long]("mn")), rows.map(_.getAs[Long]("mx")))
  }

  /** SQ8 encode: `(vec_id, codes array<long> ∈ [0,255])` — a shuffle-free
    * projection against the driver-held bounds (a degenerate dimension,
    * mx = mn, codes as 0 and contributes the exact constant at scoring).
    * The floor(double-division) is exact here: numerators stay ≤ 5.1·10⁸,
    * far inside the 2⁵³ integer-exact double range, and the true quotient
    * is never within half-an-ulp of an integer it isn't equal to. */
  def sqEncode(
      emb: DataFrame, bounds: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mn, mx) = collectBounds(bounds)
    val mnLit = array(mn.toIndexedSeq.map(lit(_)): _*)
    val spanLit = array(mn.indices.map(i => lit(mx(i) - mn(i))): _*)
    emb.select(
      col(idCol).as("vec_id"),
      transform(quantize(col(vecCol)), (q, i) => {
        val span = element_at(spanLit, i + 1)
        when(span === 0L, lit(0L))
          .otherwise(floor((q - element_at(mnLit, i + 1)).cast("double") * 255.0 /
            span.cast("double")).cast("long"))
      }).as("codes"))
  }

  /**
   * Asymmetric SQ8 top-k: the full-precision query scores every corpus
   * code word by the exact integer `Σ qq·(255·mn + code·span)` — 255× the
   * quantized-dot against the dequantized vector, so ranking matches a
   * dequantize-then-dot serving path exactly while never materializing
   * floats. Same broadcast-queries / corpus-single-pass / per-query
   * TakeOrdered shape as [[bruteForceTopK]]; `codes` comes from
   * [[sqEncode]] (persist it — build once, serve many).
   */
  def sqTopK(
      codes: DataFrame, bounds: DataFrame, queries: DataFrame, k: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (mn, mx) = collectBounds(bounds)
    val baseLit = array(mn.toIndexedSeq.map(m => lit(255L * m)): _*)
    val spanLit = array(mn.indices.map(i => lit(mx(i) - mn(i))): _*)
    // Σ qq·(255·mn + code·span) split as Σ qq·code·span + Σ qq·255·mn —
    // both exact integer folds (magnitudes bounded well inside int64)
    val scored = codes
      .join(broadcast(queries.select(col(qIdCol).as("qid"), quantize(col(qVecCol)).as("qq"))))
      .select(col("qid"), col("vec_id"),
        (aggregate(
          zip_with(
            zip_with(col("qq"), col("codes"), (q, c) => q * c),
            spanLit, (qc, s) => qc * s),
          lit(0L), (acc, v) => acc + v) +
          aggregate(
            zip_with(col("qq"), baseLit, (q, b) => q * b),
            lit(0L), (acc, v) => acc + v)).as("sdot"))
    val w = Window.partitionBy("qid").orderBy(col("sdot").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sdot")
  }

  // -------------------------------------------------------------------------
  // Binary (1-bit) quantization — the compression floor of the ladder
  // (float32 → SQ8 4× → PQ ~128× → binary 32×/dim-byte): one SIGN BIT per
  // dimension, packed 64 to a long. The standard "binary quantization"
  // serving tier of modern vector stores (Lucene/Elasticsearch BQ,
  // Qdrant/Weaviate binary indexes): Hamming distance over the packed words
  // is a rank proxy for cosine on roughly-centered embeddings, the scan
  // touches 1 bit/dim (d=64 → ONE long per vector, a 256× read reduction vs
  // float32), and an exact re-rank of the Hamming shortlist buys the recall
  // back — same two-stage contract as [[ivfPqTopKIndexedRerank]].
  //
  // Everything is engine-exact by construction: the bit rule is a raw
  // float32 `> 0` comparison (no quantization, no rounding), packing is
  // integer bit-or, and the score is an integer popcount — the oracle
  // replays all three verbatim.
  // -------------------------------------------------------------------------

  /** Sign-bit binary code for an `array<float>` column: bit `i mod 64` of
    * word `i / 64` is set iff component `i` is `> 0f` (strict — zeros and
    * negatives clear; a null COMPONENT clears its bit, the PcaProject
    * zero convention, and matches the oracle's bit_or over non-null
    * elements). Statically unrolled over `dims`, so the whole encode is
    * codegen'd fixed-arity integer arithmetic (no higher-order
    * functions): `ceil(dims/64)` longs per row. A null VECTOR propagates
    * null; a vector whose length differs from `dims` fails loud in
    * EITHER direction (a short vector hashed as zero-padded or a long
    * one silently truncated would make different-width corpora collide —
    * EdgeCasesSpec pins both throws). */
  def binaryEncode(vec: Column, dims: Int): Column = {
    require(dims > 0, s"dims must be positive, got $dims")
    val words = (0 until (dims + 63) / 64).map { w =>
      val hi = math.min(dims, w * 64 + 64)
      (w * 64 until hi).map { i =>
        when(element_at(vec, i + 1) > lit(0f), lit(1L << (i - w * 64)))
          .otherwise(lit(0L))
      }.reduce[Column](_ bitwiseOR _)
    }
    when(vec.isNull, lit(null).cast("array<bigint>"))
      .when(size(vec) === dims, array(words: _*))
      .otherwise(raise_error(concat(
        lit(s"binaryEncode: expected a $dims-dim vector, got length "),
        size(vec).cast("string"))))
  }

  /** `(vec_id, sig)` binary-code frame — the build-once artifact (persist
    * it like [[sqEncode]] codes; at d=64 it is one long per vector). A
    * shuffle-free projection over the corpus scan. Null-vector rows are
    * DROPPED (the oracle's unnest emits no row for them — a fabricated
    * all-zero code would otherwise rank). */
  def binaryEncodeFrame(
      emb: DataFrame, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"), binaryEncode(col(vecCol), dims).as("sig"))

  /** Hamming distance between two packed sign-bit codes: per-word
    * `bit_count(xor)` summed over the statically-known word count —
    * fixed-arity integer ops, fully codegen'd. */
  def hammingDist(a: Column, b: Column, dims: Int): Column = {
    val nWords = (dims + 63) / 64
    (0 until nWords).map { w =>
      bit_count(element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1)))
    }.reduce[Column](_ + _).cast("int")
  }

  /**
   * Binary top-k: rank the corpus codes by Hamming distance to each query's
   * sign-bit code (asc; vec_id tie-break — Hamming ties are common at 64
   * bits, so the deterministic tie-break matters). Same broadcast-queries /
   * corpus-single-pass / per-query TakeOrdered shape as [[bruteForceTopK]],
   * but the scanned payload is the packed codes, not float vectors —
   * `codes` comes from [[binaryEncodeFrame]] (build once, serve many).
   */
  def binaryTopK(
      codes: DataFrame, queries: DataFrame, k: Int, dims: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // null query vectors produce null qsig and null hamming, which an
    // ascending rank window orders NULLS FIRST — such a query would return
    // k ARBITRARY rows ranked ahead of everything. Dropped instead, the
    // same policy binaryEncodeFrame applies to null corpus vectors.
    val scored = codes
      .join(broadcast(queries.where(col(qVecCol).isNotNull).select(
        col(qIdCol).as("qid"), binaryEncode(col(qVecCol), dims).as("qsig"))))
      .select(col("qid"), col("vec_id"),
        hammingDist(col("sig"), col("qsig"), dims).as("ham"))
    val w = Window.partitionBy("qid").orderBy(col("ham").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "vec_id", "ham")
  }

  /** Binary scan + exact re-rank — the production BQ serving shape: the
    * Hamming scan retrieves a `shortlist` ≫ k candidate set per query
    * (codes only — at d=64 the scan reads one long per corpus row), and
    * the final ranking exact-scores just those candidates against the raw
    * vectors ([[rerankExact]]'s broadcast-shortlist join — the corpus never
    * shuffles). Output ranks by exact integer dot (desc, vec_id tie-break),
    * directly comparable to [[bruteForceTopK]]. */
  def binaryTopKRerank(
      emb: DataFrame, queries: DataFrame, k: Int, shortlist: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame =
    binaryTopKRerankFromCodes(
      binaryEncodeFrame(emb, dims, idCol, vecCol), emb, queries, k,
      shortlist, dims, idCol, vecCol, qIdCol, qVecCol)

  /** [[binaryTopKRerank]] with a caller-held codes frame (a persisted
    * store readback, or codes already materialized for another
    * measurement) — the encode pass is not repeated. */
  def binaryTopKRerankFromCodes(
      codes: DataFrame, emb: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val sl = binaryTopK(codes, queries, shortlist, dims, qIdCol, qVecCol)
      .select("qid", "vec_id")
    rerankExact(sl, emb, queries, k, idCol, vecCol, qIdCol, qVecCol)
  }

  // -------------------------------------------------------------------------
  // PERSISTED binary-code store — the build-once artifact behind
  // [[binaryTopK]] (the same manifest machinery as the multimodal feature
  // store and the line-hash/window-count skeletons): one long per vector
  // at d=64, partitioned by id mod 64, `dims` pinned in a versioned meta
  // file so a probe encoded at a different width fails loud instead of
  // scoring garbage hamming distances. Upsert re-encodes changed vectors
  // idempotently; delete is the row-level takedown.
  // -------------------------------------------------------------------------

  private val BinStorePrefix = "_bincodes"
  private val BinIdParts = 64

  private def binMetaDims(spark: SparkSession, dir: String): Int =
    ManifestStore.readVersioned(spark, dir, BinStorePrefix)
      .map(_._2.trim.stripPrefix("dims\t").toInt)
      .getOrElse(throw new IllegalStateException(
        s"no committed binary-code store under $dir"))

  /** Encode + commit (bootstrap or append/upsert — re-encoding an id
    * replaces its row). `dims` is pinned at bootstrap; appends must
    * match it. */
  def writeBinaryCodes(
      emb: DataFrame, storeDir: String, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val existing = ManifestStore.readVersioned(spark, storeDir, BinStorePrefix)
    existing.foreach { case (_, meta) =>
      val stored = meta.trim.stripPrefix("dims\t").toInt
      require(stored == dims,
        s"binary-code store under $storeDir is pinned at dims=$stored, got $dims")
    }
    val codes = binaryEncodeFrame(emb, dims, idCol, vecCol)
      .withColumn("bp", pmod(col("vec_id"), lit(BinIdParts)).cast("string"))
    ManifestStore.upsert(codes, storeDir, "bp", Seq("bp", "vec_id"), spark)
    // meta commits AFTER the data lands: a crashed bootstrap fails loud at
    // read (no meta) instead of advertising an empty store
    if (existing.isEmpty)
      ManifestStore.commitVersioned(
        spark, storeDir, BinStorePrefix, 1L, s"dims\t$dims\n")
  }

  /** Whether a binary-code store has been fully bootstrapped (data AND
    * pinned meta) under `storeDir` — the reader's own predicate, so a
    * bootstrap-once guard built on it self-heals after a crash between
    * the data upsert and the meta commit. */
  def binaryCodesCommitted(spark: SparkSession, storeDir: String): Boolean =
    ManifestStore.readVersioned(spark, storeDir, BinStorePrefix).isDefined

  private def binCodesFrame(spark: SparkSession, storeDir: String): DataFrame =
    ManifestStore.currentFrame(spark, storeDir, "bp")
      .map(_.select("vec_id", "sig"))
      .getOrElse(throw new IllegalStateException(
        s"no committed binary-code store under $storeDir"))

  /** The committed `(vec_id, sig)` codes. Fails loud before the first
    * commit. */
  def readBinaryCodes(spark: SparkSession, storeDir: String): DataFrame = {
    binMetaDims(spark, storeDir)
    binCodesFrame(spark, storeDir)
  }

  /** Takedown: physically remove vectors' code rows (partition-grain
    * rewrite). `ids` must carry `vec_id`. */
  def deleteBinaryCodes(ids: DataFrame, storeDir: String): Int =
    ManifestStore.delete(
      ids.select(col("vec_id"))
        .withColumn("bp", pmod(col("vec_id"), lit(BinIdParts)).cast("string")),
      storeDir, "bp", Seq("bp", "vec_id"), ids.sparkSession)

  /** [[binaryTopK]] served from the persisted store, `dims` read from the
    * pinned meta — the query vectors never touch the corpus, the scan
    * reads one long per stored vector. */
  def binaryTopKIndexed(
      spark: SparkSession, storeDir: String, queries: DataFrame, k: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    val dims = binMetaDims(spark, storeDir) // one meta read serves both uses
    binaryTopK(binCodesFrame(spark, storeDir), queries, k, dims, qIdCol, qVecCol)
  }

  /** Fail-loud bound on per-query candidate-set size in [[mmrRerank]]: the
    * greedy loop is O(k·|C|) per query and holds one query's candidates in
    * memory — the contract is k-bounded ANN/BM25 shortlists, not corpora. */
  val MaxMmrCandidates: Int = 4096

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
   * from each query's candidate shortlist, greedily pick the document
   * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance
   * traded against redundancy with what is already selected, the standard
   * diversity pass over an ANN/BM25 shortlist. The max over an empty
   * selection is 0, so the first pick maximizes `λ·rel` (ties → smallest
   * doc id, as everywhere).
   *
   * `candidates` columns: `(qid, doc_id, rel, embedding)` with `rel` an
   * integer relevance (e.g. the quantized dot from [[bruteForceTopK]]).
   * Pairwise similarities are the same `floor(x·10⁶)` quantized integer
   * dots as every other scorer here, computed inside the group — so with
   * exact-integer `rel` the whole greedy trace is deterministic IEEE
   * arithmetic, reproducible on any engine (the oracle replays it as k
   * unrolled selection rounds).
   *
   * Scale shape: candidate sets are k-bounded by construction (guarded at
   * [[MaxMmrCandidates]]); the greedy runs per query inside `flatMapGroups`
   * — the legitimately imperative case, one group = one shortlist, never a
   * corpus. Output: `(qid, rank, doc_id, mmr)`, `rank ∈ [1, k]`.
   */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(0 <= lambda && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      .select(col("qid").cast("long"), col("doc_id").cast("long"),
        col("rel").cast("long"), col("embedding"))
      .as[(Long, Long, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Array[Float])]) =>
        val cs = it.toArray.sortBy(_._2)
        require(cs.length <= MaxMmrCandidates,
          s"mmrRerank got ${cs.length} candidates for query $qid " +
            s"(max $MaxMmrCandidates) — pass a top-k shortlist, not a corpus")
        val qv = cs.map(_._4.map(f => math.floor(f * Scale).toLong))
        def dot(a: Int, b: Int): Long = {
          var acc = 0L
          var i = 0
          val (x, y) = (qv(a), qv(b))
          val n = math.min(x.length, y.length)
          while (i < n) { acc += x(i) * y(i); i += 1 }
          acc
        }
        val selected = scala.collection.mutable.ArrayBuffer[Int]()
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
        val picked = new Array[Boolean](cs.length)
        var rank = 1
        while (rank <= math.min(k, cs.length)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            if (!picked(i)) {
              var maxSim = 0L // max over the empty selection is 0 by contract
              var first = true
              selected.foreach { s =>
                val d = dot(i, s)
                if (first || d > maxSim) { maxSim = d; first = false }
              }
              val score = lambda * cs(i)._3.toDouble - (1 - lambda) * maxSim.toDouble
              // strict > keeps the smallest doc_id on ties (cs is id-sorted)
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          picked(best) = true
          selected += best
          out += ((qid, rank, cs(best)._2, bestScore))
          rank += 1
        }
        out.iterator
      }
      .toDF("qid", "rank", "doc_id", "mmr")
  }

  /**
   * Sign-random-projection bit signature (`nBits` ≤ 30): bit j is the sign of
   * the dot product with a deterministic pseudo-random integer hyperplane
   * `w[j][d] = ((1103515245·(j·dims+d) + 12345) mod 65536) − 32768` (an LCG
   * over the flattened index — reproducible anywhere, no RNG state).
   * Vectors in the same bucket are cosine-close with high probability.
   *
   * Weights ride as float literal arrays through [[dotQ]]: they are integers
   * ≤ 2^15 so `floor(w·10^6) = w·10^6` exactly, which scales every dot by
   * 10^6 — sign-invariant, so the signature is unchanged.
   */
  def srpSignature(vec: Column, nBits: Int, dims: Int): Column = {
    val bitCols = (0 until nBits).map { j =>
      val weights = array((0 until dims).map { d =>
        lit(((1103515245L * (j.toLong * dims + d) + 12345L) % 65536L - 32768L).toFloat)
      }: _*)
      when(dotQ(vec, weights) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /**
   * LSH-bucketed near-duplicate pairs: vectors sharing an SRP bucket whose
   * exact cosine ≥ `threshold`. The self-join is an equi-join on the bucket
   * key — never all-pairs.
   */
  def srpNearDuplicates(
      emb: DataFrame, nBits: Int, dims: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = emb.select(
      col(idCol).as("vec_id"),
      col(vecCol).as("v"),
      srpSignature(col(vecCol), nBits, dims).as("bucket"))
    val a = sig.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("v_b"))
    a.join(b, "bucket")
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        cosine(
          dotQ(col("v_a"), col("v_b")),
          dotQ(col("v_a"), col("v_a")),
          dotQ(col("v_b"), col("v_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * K-means centroid training for the IVF coarse quantizer — Lloyd's
   * iterations in map-reduce form. Seeds with the `k` lowest-id vectors
   * (cid 0..k-1 in id order — deterministic, no RNG); each iteration
   * assigns every vector to its best centroid by exact integer quantized
   * dot product ([[ivfAssign]] semantics, ties → smaller cid) and
   * recomputes each centroid as its cell's component-wise mean. Returns
   * `(cid, cvec: array<float>)`, ready for [[ivfAssign]] / [[ivfTopK]].
   *
   * Engine-portable determinism — the property random-init k-means lacks:
   * assignment compares exact integer dots; each mean is ONE double
   * division of an exact integer component sum by an exact count followed
   * by one float rounding. No float-summation-order dependence anywhere,
   * so any engine or partitioning produces bit-identical centroids
   * (oracle-checked against an unrolled SQL formulation).
   *
   * Scale: per iteration, ONE pass over the corpus — assignment is a pure
   * projection against the driver-held centroids (no join, no
   * `groupBy(vec_id)` exchange), and the only shuffle is the component-sum
   * aggregation, partial-aggregated to ≤ k·dims rows per partition
   * map-side. Centroid state is k·dims floats held on the driver between
   * rounds (the same place a broadcast would put it, without the lineage).
   * A cell that loses all members is dropped (k may shrink) — standard
   * Lloyd's behavior, kept deterministic.
   */
  def trainCentroids(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = emb.sparkSession
    var cents: Seq[(Int, Array[Float])] = seedRows(emb, k, idCol, vecCol)
    for (_ <- 0 until iters) {
      val sums = emb
        .select(
          cidAt(cents, argBestIdx(col(vecCol), cents, l2 = false)).as("cell"),
          posexplode(quantize(col(vecCol))).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      cents = lloydMeans(sums.toSeq)
    }
    centroidFrame(spark, cents)
  }

  /**
   * [[trainCentroids]] iterated TO CONVERGENCE instead of a pinned round
   * count — the principled stopping rule (a pinned count is an arbitrary
   * constant; movement-ε is a property of the data). MEASURED caveat, so
   * nobody mistakes this for a recall lever: on the near-isotropic test
   * corpus (residual energy ~0.89) converging the quantizer does NOT
   * raise — it slightly LOWERS — the fixed-nprobe exact-scan ceiling
   * (QUALITY.json `ivf_converged_nprobe2_at10` vs `ivf_nprobe2_at10`):
   * crisper cells hide cell-straddling neighbors that fuzzier
   * under-converged cells happened to co-locate. The ceiling lever at
   * unchanged nprobe is REDUNDANT ASSIGNMENT ([[ivfTopKMulti]] —
   * structural recall gain, storage-for-recall trade), not more Lloyd
   * rounds. Runs rounds until the largest centroid movement (L2, float
   * domain) is ≤ `eps`, or `maxIters`. Deterministic:
   * same seeding, same exact-integer assignment and means as
   * [[trainCentroids]], and the stopping rule is a pure function of the
   * (deterministic) centroid sequence — any engine or partitioning stops
   * after the identical round count with bit-identical centroids. A cell
   * that dies between rounds counts as infinite movement (iteration
   * continues past structural change).
   *
   * `trainFrac` < 1 trains on a deterministic hash-sample
   * (`hash32(id) mod 10⁶ < frac·10⁶`) — the 100 TB path: the quantizer
   * needs a REPRESENTATIVE sample, not the corpus, so per-round cost is
   * bounded while assignment/serving still run over everything.
   *
   * The pinned-count [[trainCentroids]] stays the ORACLE surface
   * (`q_sim_kmeans` replays unrolled rounds in SQL — a data-dependent
   * round count cannot be a plan-time constant on both sides); converged
   * training is the quality/serving surface (QUALITY.json, index builds).
   */
  def trainCentroidsConverged(
      emb: DataFrame, k: Int, maxIters: Int = 16, eps: Double = 1e-3,
      trainFrac: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    trainCentroidsConvergedDetail(emb, k, maxIters, eps, trainFrac, idCol, vecCol)._1

  /** [[trainCentroidsConverged]] plus the round count it stopped after —
    * the measurement surface (QUALITY.json records it). */
  private[graft] def trainCentroidsConvergedDetail(
      emb: DataFrame, k: Int, maxIters: Int, eps: Double, trainFrac: Double,
      idCol: String, vecCol: String): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(eps >= 0, s"eps must be >= 0, got $eps")
    require(trainFrac > 0 && trainFrac <= 1, s"trainFrac must be in (0, 1], got $trainFrac")
    val spark = emb.sparkSession
    val train =
      if (trainFrac >= 1.0) emb
      else emb.where(
        pmod(TextOps.hash32(col(idCol).cast("string")), lit(1000000)) <
          lit(math.round(trainFrac * 1e6).toInt))
    var cents = seedRows(train, k, idCol, vecCol)
    var it = 0
    var moved = Double.MaxValue
    while (it < maxIters && moved > eps) {
      val sums = train
        .select(
          cidAt(cents, argBestIdx(col(vecCol), cents, l2 = false)).as("cell"),
          posexplode(quantize(col(vecCol))).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val next = lloydMeans(sums.toSeq)
      moved = maxMovement(cents, next)
      cents = next
      it += 1
    }
    (centroidFrame(spark, cents), it)
  }

  /** Largest per-centroid L2 movement between consecutive rounds; a
    * changed cid set (a cell died) is infinite movement. */
  private def maxMovement(
      a: Seq[(Int, Array[Float])], b: Seq[(Int, Array[Float])]): Double = {
    if (a.map(_._1) != b.map(_._1)) return Double.MaxValue
    a.zip(b).map { case ((_, x), (_, y)) =>
      math.sqrt(x.zip(y).map { case (p, q) => (p - q).toDouble * (p - q) }.sum)
    }.max
  }

  /** All (vector, centroid) scores — the shared substrate of [[ivfAssign]]
    * (argmax per vector) and the query-side multi-cell probe in [[ivfTopK]].
    * Returns `(vec_id, cid, cdot)`. `centroids` must be small (broadcast). */
  def ivfScoreCells(
      emb: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cIdCol: String = "cid", cVecCol: String = "cvec"): DataFrame =
    emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(broadcast(centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cv"))))
      .select(col("vec_id"), col("cid"), dotQ(col("v"), col("cv")).as("cdot"))

  /**
   * IVF coarse assignment: each vector goes to the centroid with the largest
   * dot product (ties → smaller centroid id). `centroids` must be
   * broadcast-sized (collected driver-side, fail-loud past
   * [[MaxLocalCodebookRows]]). Returns `(vec_id, cell, cdot)`.
   *
   * This is a pure PROJECTION over the corpus — the per-row argmax runs
   * against centroid literals, so there is no broadcast-join fan-out and
   * no `groupBy(vec_id)` exchange (PlanAuditSpec pins no-Exchange). The
   * join-based form survives as [[ivfAssignJoin]] for cross-checking.
   */
  def ivfAssign(
      emb: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cIdCol: String = "cid", cVecCol: String = "cvec"): DataFrame = {
    val cents = collectCentroids(centroids, cIdCol, cVecCol)
    emb
      .select(
        col(idCol).as("vec_id"), col(vecCol).as("_v"),
        argBestIdx(col(vecCol), cents, l2 = false).as("_i"))
      .select(
        col("vec_id"),
        cidAt(cents, col("_i")).as("cell"),
        dotQ(col("_v"), cvecAt(cents, col("_i"))).as("cdot"))
  }

  /**
   * Cluster-stratified diverse sampling: exactly `perCell` vectors drawn
   * deterministically from EACH coarse cell (fewer if the cell is smaller)
   * — the diversity-preserving downsample (cluster-balanced sampling) that
   * keeps every region of embedding space represented where a uniform
   * sample would mirror the corpus's density skew. The draw inside each
   * cell is [[graft.ops.Corpus.sampleExactPerGroup]]'s salted-hash order:
   * unbiased, stable across runs/engines/partitioning.
   *
   * Scale shape: assignment is the shuffle-free [[ivfAssign]] projection;
   * the per-cell cap compiles to `WindowGroupLimit` (map-side pruning to
   * `perCell` rows per cell before the exchange).
   */
  def diverseSample(
      emb: DataFrame, centroids: DataFrame, perCell: Int, salt: String = "",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Corpus.sampleExactPerGroup(
      ivfAssign(emb, centroids, idCol, vecCol).select("vec_id", "cell"),
      "vec_id", "cell", perCell, salt)

  /** Join-based reference implementation of [[ivfAssign]] — same integers,
    * same `(−cdot, cid)` tie-break, but pays a broadcast-join × k fan-out
    * and a `groupBy(vec_id)` exchange; kept only to cross-check the
    * projection path (LlmOpsSpec asserts bit-identical output). */
  private[graft] def ivfAssignJoin(
      emb: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cIdCol: String = "cid", cVecCol: String = "cvec"): DataFrame =
    ivfScoreCells(emb, centroids, idCol, vecCol, cIdCol, cVecCol)
      .groupBy("vec_id")
      .agg(min_by(struct(col("cid"), col("cdot")), struct(negate(col("cdot")), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cell"), col("best.cdot").as("cdot"))

  /**
   * Redundant (top-`r`) coarse assignment: each vector lands in its `r`
   * best cells instead of one — the Faiss-style spill/multi-assignment
   * trade. At fixed nprobe the probe's candidate set becomes a STRICT
   * SUPERSET of single-assignment's (a vector's best cell is among its
   * top-r), so with exact candidate scoring recall at the same nprobe can
   * only rise — measured +0.09 recall@10 at nprobe=2/r=2 on the test
   * corpus, equivalent to nprobe=4 recall at nprobe=2 latency shape. Cost:
   * the index carries r× the rows and a probed cell is ~r× as populous —
   * storage and scan mass buy the recall, nothing is free.
   *
   * Same shuffle-free projection discipline as [[ivfAssign]]: per-row dots
   * against centroid literals, an in-row sort of (−dot, cid) structs (the
   * exact [[ivfAssign]] tie-break), top-r exploded. The in-row sort is
   * O(k log k) per vector — right up to the few-thousand-cell coarse
   * quantizers IVF-PQ uses; a dedicated top-r kernel is the next step past
   * that. Returns `(vec_id, cell, cdot, crank)` with crank 1..r.
   */
  def ivfAssignTop(
      emb: DataFrame, centroids: DataFrame, r: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cIdCol: String = "cid", cVecCol: String = "cvec"): DataFrame = {
    require(r >= 1, s"r must be >= 1, got $r")
    val cents = collectCentroids(centroids, cIdCol, cVecCol)
    val entries = cents.map { case (cid, cv) =>
      struct(
        negate(dotQ(col("_v"), typedlit(cv.toSeq))).as("nd"),
        lit(cid).as("cid"))
    }
    emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .select(col("vec_id"),
        posexplode(slice(array_sort(array(entries: _*)), 1, r)).as(Seq("_i", "_e")))
      .select(col("vec_id"), col("_e.cid").as("cell"),
        negate(col("_e.nd")).as("cdot"), (col("_i") + 1).as("crank"))
  }

  /**
   * [[ivfTopK]] over a redundantly-assigned corpus ([[ivfAssignTop]] with
   * `assignR` cells per vector): same probe fan-out, superset candidates,
   * exact scoring — the recall lever at UNCHANGED nprobe. A candidate
   * reachable through two probed cells is deduplicated before ranking
   * (same dot either way, but a duplicate row would occupy two top-k
   * ranks).
   */
  def ivfTopKMulti(
      emb: DataFrame, centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 1, assignR: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cells = ivfAssignTop(emb, centroids, assignR, idCol, vecCol)
      .select(col("vec_id"), col("cell"))
    val corpus = emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(cells, "vec_id")
    val qw = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cid").asc)
    val probes = ivfScoreCells(
        queries.select(col("qid").as("vec_id"), col("qvec").as("embedding")), centroids)
      .withColumn("prn", row_number().over(qw))
      .where(col("prn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
    val qcells = queries
      .select(col("qid"), col("qvec").as("qv"))
      .join(broadcast(probes), "qid")
    val scored = corpus
      .join(broadcast(qcells), "cell")
      .select(col("qid"), col("vec_id"), dotQ(col("v"), col("qv")).as("dot"))
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /**
   * IVF top-k: probe each query's `nprobe` best cells (by centroid dot,
   * ties → smaller centroid id) and rank their members by exact integer dot
   * product — the scale path when brute force over the full corpus is too
   * expensive (cost ∝ nprobe · cell size ≈ nprobe · N/#centroids).
   *
   * `nprobe = 1` is the classic single-cell probe; real deployments use a
   * few cells because true neighbors straddle cell boundaries — recall rises
   * with nprobe while cost stays linear in it. Corpus vectors still live in
   * exactly one cell, so the probe fan-out never duplicates candidates.
   */
  def ivfTopK(
      emb: DataFrame, centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cells = ivfAssign(emb, centroids, idCol, vecCol)
      .select(col("vec_id"), col("cell"))
    val corpus = emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(cells, "vec_id")
    // top-nprobe cells per query; same (cdot desc, cid asc) order as the
    // argmax in ivfAssign, so nprobe=1 reproduces the single-cell assignment
    val qw = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cid").asc)
    val probes = ivfScoreCells(
        queries.select(col("qid").as("vec_id"), col("qvec").as("embedding")), centroids)
      .withColumn("prn", row_number().over(qw))
      .where(col("prn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
    val qcells = queries
      .select(col("qid"), col("qvec").as("qv"))
      .join(broadcast(probes), "qid")
    val scored = corpus
      .join(broadcast(qcells), "cell")
      .select(col("qid"), col("vec_id"), dotQ(col("v"), col("qv")).as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /**
   * L2 (Euclidean) k-means — the PQ codebook trainer. Identical protocol to
   * [[trainCentroids]] (k lowest-id seeds, exact integer scoring, one
   * float-rounded mean per component per round) but assigns by
   * argmin ‖x−c‖² = argmin (c·c − 2·x·c), computed exactly from quantized
   * dots — the metric product quantization requires (subvectors are not
   * normalized, so max-dot assignment would degenerate toward the
   * largest-norm centroid).
   */
  def trainCentroidsL2(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = emb.sparkSession
    var cents: Seq[(Int, Array[Float])] = seedRows(emb, k, idCol, vecCol)
    for (_ <- 0 until iters) {
      val sums = emb
        .select(
          cidAt(cents, argBestIdx(col(vecCol), cents, l2 = true)).as("cell"),
          posexplode(quantize(col(vecCol))).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      cents = lloydMeans(sums.toSeq)
    }
    centroidFrame(spark, cents)
  }

  /**
   * Product-quantization codebooks: the embedding space is split into `m`
   * contiguous subspaces of `dims / m` components; each subspace learns its
   * own `k`-entry L2 codebook ([[trainCentroidsL2]] over the sliced
   * subvectors). Returns `(sub, cid, cvec)` — m·k rows, the entire "index"
   * a 100 TB corpus is compressed against (a few KB, always broadcast).
   *
   * With m subspaces of k codes, each vector stores m small codes instead
   * of `dims` floats — 64-dim float32 at m=4, k=16 compresses 256 bytes to
   * 2, the 128× that makes exhaustive ADC scans over a whole corpus
   * affordable.
   */
  def pqTrainCodebooks(
      emb: DataFrame, dims: Int, m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val sd = dims / m
    // All m subspaces train through ONE chain with `sub` as a column — one
    // corpus pass per Lloyd iteration instead of m (training a separate
    // codebook per subspace would re-scan 100 TB m times per round). Same
    // seeds (each subspace seeds with the k lowest-id vectors' slices),
    // same per-(vector, subspace) L2 argmin (now a projection against the
    // driver-held codebooks — no join, no `groupBy(vec_id, sub)` exchange),
    // same float-rounded means — bit-identical to per-subspace
    // [[trainCentroidsL2]], oracle-checked.
    val spark = emb.sparkSession
    val seeds = emb.select(col(idCol).as("_sid"), col(vecCol).as("v"))
      .orderBy(col("_sid").asc).limit(k).collect()
    var cents: Map[Int, Seq[(Int, Array[Float])]] =
      (0 until m).map { s =>
        s -> seeds.toSeq.zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](1).slice(s * sd, (s + 1) * sd).toArray)
        }
      }.toMap
    for (_ <- 0 until iters) {
      val perSub = (0 until m).map { s =>
        val sv = slice(col(vecCol), s * sd + 1, sd)
        struct(
          lit(s).as("sub"),
          cidAt(cents(s), argBestIdx(sv, cents(s), l2 = true)).as("cell"),
          quantize(sv).as("qs"))
      }
      val sums = emb
        .select(explode(array(perSub: _*)).as("r"))
        .select(col("r.sub").as("sub"), col("r.cell").as("cell"),
          posexplode(col("r.qs")).as(Seq("d", "x")))
        .groupBy("sub", "cell", "d")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      cents = sums.toSeq.groupBy(_.getInt(0)).map { case (s, rs) =>
        s -> lloydMeans(rs.map(r => Row(r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))))
      }
    }
    val schema = StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("cid", IntegerType, nullable = false),
      StructField("cvec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = cents.toSeq.sortBy(_._1).flatMap { case (s, cs) =>
      cs.map { case (cid, cv) => Row(s, cid, cv.toSeq) }
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /**
   * PQ encoding: each vector's subvector maps to its L2-nearest codebook
   * entry. Returns the compressed corpus `(vec_id, sub, code)` — m small
   * ints per vector, the only thing [[pqAdcTopK]] ever scans.
   *
   * Encoding is a pure PROJECTION: the m per-subspace argmins run against
   * driver-held codebook literals in one pass over the scan, with no
   * broadcast-join fan-out and no `groupBy(vec_id, sub)` exchange
   * (PlanAuditSpec pins the scan→project→generate, no-Exchange shape).
   * At 100 TB, encode is the full-corpus pass — an exchange of N·m small
   * rows here is pure waste. [[pqEncodeJoin]] keeps the join-based form
   * for cross-checking.
   */
  def pqEncode(
      emb: DataFrame, codebooks: DataFrame, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    val sd = dims / m
    val cb = collectCodebooks(codebooks)
    (0 until m).foreach(s =>
      require(cb.contains(s), s"codebooks missing subspace $s (have ${cb.keys.toSeq.sorted})"))
    val codeCols = (0 until m).map { s =>
      val sv = slice(col(vecCol), s * sd + 1, sd)
      cidAt(cb(s), argBestIdx(sv, cb(s), l2 = true))
    }
    emb.select(
      col(idCol).as("vec_id"),
      posexplode(array(codeCols: _*)).as(Seq("sub", "code")))
  }

  /** Join-based reference implementation of [[pqEncode]] — same integers,
    * same `(dist, cid)` tie-break; kept only to cross-check the projection
    * path (LlmOpsSpec asserts bit-identical codes). */
  private[graft] def pqEncodeJoin(
      emb: DataFrame, codebooks: DataFrame, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sd = dims / m
    val subs = emb.select(
      col(idCol).as("vec_id"),
      posexplode(array((0 until m).map(s => slice(col(vecCol), s * sd + 1, sd)): _*))
        .as(Seq("sub", "sv")))
    val cb = codebooks.select(
      col("sub"), col("cid"), col("cvec"), dotQ(col("cvec"), col("cvec")).as("_cc"))
    subs
      .join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"), col("cid"),
        (col("_cc") - lit(2L) * dotQ(col("sv"), col("cvec"))).as("_dist"))
      .groupBy("vec_id", "sub")
      .agg(min_by(col("cid"), struct(col("_dist"), col("cid"))).as("code"))
  }

  // ---------------------------------------------------------------------
  // Residual product quantization — the standard IVF-PQ form (Jégou et
  // al. 2011). PQ codes quantize the RESIDUAL x − c(cell) instead of the
  // raw vector: each coarse cell's codebook only has to cover the local
  // spread around its centroid rather than the whole embedding space,
  // which roughly doubles recall at the same code budget (measured here:
  // QUALITY.json ivfpq_m8_nprobe2_at10 0.28 raw → see round-8 value).
  //
  // Residuals live in the QUANTIZED integer domain:
  //   qr[d] = floor(x[d]·10^6) − floor(c[d]·10^6)
  // so every training mean, code assignment, and ADC distance stays an
  // exact integer computation any engine reproduces bit-identically (a
  // float-domain x − c would re-round on quantization). The kernels are
  // [[graft.expressions.QuantizedArgBestRes]] / QuantizedResidualExpr —
  // same reference-object codegen discipline as `quantized_argbest`.
  // ---------------------------------------------------------------------

  /** Driver-side mirror of the coarse max-dot assignment (ties → smallest
    * index) — used to residualize seed vectors exactly as the in-plan
    * kernel would. */
  private def argMaxDotLocal(qv: Array[Long], qcents: Seq[Seq[Long]]): Int = {
    var best = 0
    var bestKey = Long.MaxValue
    var c = 0
    while (c < qcents.length) {
      val cv = qcents(c)
      val m = math.min(qv.length, cv.length)
      var dot = 0L
      var j = 0
      while (j < m) { dot += qv(j) * cv(j); j += 1 }
      val key = -2L * dot
      if (key < bestKey) { bestKey = key; best = c }
      c += 1
    }
    best
  }

  /**
   * Residual PQ codebooks: like [[pqTrainCodebooks]] but each training
   * point is the quantized residual of its vector against its coarse cell
   * ([[ivfAssign]] over `coarse`). Seeds are the k lowest-id vectors'
   * residual slices (exact integers — seeds never round-trip through
   * float); each Lloyd round assigns by exact-integer L2 argmin over the
   * residuals and re-estimates float means through the same
   * sum/count/÷10^6/float-round chain as every other trainer here, so the
   * result is engine-portable deterministic and the DuckDB oracle replays
   * it verbatim. One corpus pass per iteration; assignment and residual
   * extraction are pure projections (no join, no exchange before the
   * ≤ m·k·dims-row partial aggregate).
   */
  def pqTrainCodebooksResidual(
      emb: DataFrame, coarse: DataFrame, dims: Int, m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, "residual codebooks need >= 1 Lloyd iteration (float export)")
    val spark = emb.sparkSession
    val sd = dims / m
    val cents = collectCentroids(coarse, "cid", "cvec")
    val qoffs: Seq[Seq[Long]] = cents.map { case (_, cv) => quantizeLocal(cv) }
    def qoffsSub(s: Int): Seq[Seq[Long]] = qoffs.map(_.slice(s * sd, (s + 1) * sd))

    // Seeds: k lowest-id vectors, residualized driver-side with the exact
    // same quantized max-dot assignment the in-plan kernel performs.
    val seeds = emb.select(col(idCol).as("_sid"), col(vecCol).as("v"))
      .orderBy(col("_sid").asc).limit(k).collect()
    var state: Map[Int, Seq[(Int, Array[Long])]] =
      (0 until m).map { s =>
        s -> seeds.toSeq.zipWithIndex.map { case (r, i) =>
          val qv = quantizeLocal(r.getSeq[Float](1).toArray).toArray
          val ci = argMaxDotLocal(qv, qoffs)
          val qr = qv.zip(qoffs(ci)).map { case (a, b) => a - b }
          (i, qr.slice(s * sd, (s + 1) * sd))
        }
      }.toMap
    var floats: Map[Int, Seq[(Int, Array[Float])]] = Map.empty

    for (_ <- 0 until iters) {
      val perSub = (0 until m).map { s =>
        val sv = slice(col("_v"), s * sd + 1, sd)
        val entries = state(s)
        val idx = call_function("quantized_argbest_res",
          sv, typedlit(entries.map(_._2.toSeq)), typedlit(qoffsSub(s)), col("_ci"))
        struct(
          lit(s).as("sub"),
          element_at(typedlit(entries.map(_._1)), idx + 1).as("cell"),
          call_function("quantized_residual",
            sv, typedlit(qoffsSub(s)), col("_ci")).as("qs"))
      }
      val sums = emb
        .select(col(vecCol).as("_v"),
          argBestIdx(col(vecCol), cents, l2 = false).as("_ci"))
        .select(explode(array(perSub: _*)).as("r"))
        .select(col("r.sub").as("sub"), col("r.cell").as("cell"),
          posexplode(col("r.qs")).as(Seq("d", "x")))
        .groupBy("sub", "cell", "d")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .collect()
      floats = sums.toSeq.groupBy(_.getInt(0)).map { case (s, rs) =>
        s -> lloydMeans(rs.map(r => Row(r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))))
      }
      state = floats.map { case (s, cs) =>
        s -> cs.map { case (cid, cv) => (cid, quantizeLocal(cv).toArray) }
      }
    }
    val schema = StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("cid", IntegerType, nullable = false),
      StructField("cvec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = floats.toSeq.sortBy(_._1).flatMap { case (s, cs) =>
      cs.map { case (cid, cv) => Row(s, cid, cv.toSeq) }
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /**
   * Residual PQ encode fused with coarse assignment: ONE projection over
   * ONE corpus scan emits `(vec_id, cell, sub, code)` — the per-row coarse
   * cell index feeds the residual argmin directly, so the 100 TB encode
   * pass has no join and no exchange (PlanAuditSpec pins the shape).
   * `codebooks` must be residual-trained ([[pqTrainCodebooksResidual]]
   * against the same `coarse`).
   */
  def pqEncodeResidual(
      emb: DataFrame, coarse: DataFrame, codebooks: DataFrame, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      attrCols: Seq[String] = Nil): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    val sd = dims / m
    val cents = collectCentroids(coarse, "cid", "cvec")
    val qoffs: Seq[Seq[Long]] = cents.map { case (_, cv) => quantizeLocal(cv) }
    val cb = collectCodebooks(codebooks)
    (0 until m).foreach(s =>
      require(cb.contains(s), s"codebooks missing subspace $s (have ${cb.keys.toSeq.sorted})"))
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("_v"), s * sd + 1, sd)
      val idx = call_function("quantized_argbest_res",
        sv, typedlit(cb(s).map(t => quantizeLocal(t._2))),
        typedlit(qoffs.map(_.slice(s * sd, (s + 1) * sd))), col("_ci"))
      cidAt(cb(s), idx)
    }
    // attribute columns ride the same single projection pass — pure
    // pass-through, no join, no second corpus scan
    val attrs = attrCols.map(col)
    emb
      .select(Seq(
        col(idCol).as("vec_id"), col(vecCol).as("_v"),
        argBestIdx(col(vecCol), cents, l2 = false).as("_ci")) ++ attrs: _*)
      .select(Seq(
        col("vec_id"),
        cidAt(cents, col("_ci")).as("cell")) ++ attrs :+
        posexplode(array(codeCols: _*)).as(Seq("sub", "code")): _*)
  }

  /**
   * Residual PQ encode with REDUNDANT (top-`r`) coarse assignment — the
   * persisted-index form of [[ivfAssignTop]]'s recall lever: every vector
   * is encoded into each of its `r` best cells, with the residual taken
   * against THAT cell's centroid (so each copy's ADC distance is exact for
   * its own cell). At fixed nprobe the probe's candidate set becomes a
   * strict superset of single-assignment's; serving dedups copies by
   * keeping the minimum per-cell ADC ([[adcScoresIndexed]]). Still ONE
   * projection over ONE corpus scan — the top-r cell ranking is an in-row
   * sort of (−dot, cid) structs (the exact [[ivfAssign]] tie-break), then
   * the per-assignment residual argmin runs against the same centroid
   * literals. `r = 1` delegates to [[pqEncodeResidual]] (bit-identical,
   * plan-pinned single-assignment shape).
   */
  def pqEncodeResidualTop(
      emb: DataFrame, coarse: DataFrame, codebooks: DataFrame, dims: Int, m: Int,
      r: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      attrCols: Seq[String] = Nil): DataFrame = {
    require(r >= 1, s"r must be >= 1, got $r")
    if (r == 1)
      return pqEncodeResidual(emb, coarse, codebooks, dims, m, idCol, vecCol, attrCols)
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    val sd = dims / m
    val cents = collectCentroids(coarse, "cid", "cvec")
    val qoffs: Seq[Seq[Long]] = cents.map { case (_, cv) => quantizeLocal(cv) }
    val cb = collectCodebooks(codebooks)
    (0 until m).foreach(s =>
      require(cb.contains(s), s"codebooks missing subspace $s (have ${cb.keys.toSeq.sorted})"))
    val entries = cents.zipWithIndex.map { case ((cid, cv), i) =>
      struct(
        negate(dotQ(col("_v"), typedlit(cv.toSeq))).as("nd"),
        lit(cid).as("cid"),
        lit(i).as("idx"))
    }
    val codeCols = (0 until m).map { s =>
      val sv = slice(col("_v"), s * sd + 1, sd)
      val idx = call_function("quantized_argbest_res",
        sv, typedlit(cb(s).map(t => quantizeLocal(t._2))),
        typedlit(qoffs.map(_.slice(s * sd, (s + 1) * sd))), col("_ci"))
      cidAt(cb(s), idx)
    }
    val attrs = attrCols.map(col)
    emb
      .select(Seq(col(idCol).as("vec_id"), col(vecCol).as("_v")) ++ attrs: _*)
      .select(Seq(col("vec_id"), col("_v")) ++ attrs :+
        explode(slice(array_sort(array(entries: _*)), 1, r)).as("_e"): _*)
      .select(Seq(col("vec_id"), col("_v"),
        col("_e.cid").as("cell"), col("_e.idx").as("_ci")) ++ attrs: _*)
      .select(
        Seq(col("vec_id"), col("cell")) ++ attrs :+
        posexplode(array(codeCols: _*)).as(Seq("sub", "code")): _*)
  }

  /** Per-(query, probed cell) residual ADC lookup table
    * `(qid, cell, sub, code, pd)` with pd = Σ_d (qr_d − qcb_d)² over the
    * subspace — the FULL squared distance term, so summing m entries gives
    * exact ‖qr − reconstruction‖² and rankings compare correctly across a
    * query's different probed cells (the cross-cell term ‖q − c‖² is
    * inside, not dropped). queries × nprobe × m × k rows — broadcast-sized
    * by construction. */
  private def pqLutResidual(
      codebooks: DataFrame, coarse: DataFrame, probes: DataFrame,
      queries: DataFrame, dims: Int, m: Int,
      qIdCol: String, qVecCol: String): DataFrame = {
    val sd = dims / m
    val rq = zip_with(
      quantize(col("qv")), quantize(col("cvec")), (a, b) => a - b)
    val subs = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"))
      .join(probes, "qid")
      .join(broadcast(coarse.select(col("cid").as("cell"), col("cvec"))), "cell")
      .select(col("qid"), col("cell"),
        posexplode(array((0 until m).map(s => slice(rq, s * sd + 1, sd)): _*))
          .as(Seq("sub", "rqs")))
    subs
      .join(codebooks.select(col("sub"), col("cid").as("code"), col("cvec")), "sub")
      .select(col("qid"), col("cell"), col("sub"), col("code"),
        aggregate(
          zip_with(col("rqs"), quantize(col("cvec")), (r, c) => (r - c) * (r - c)),
          lit(0L), (acc, v) => acc + v).as("pd"))
  }

  /**
   * Asymmetric-distance (ADC) top-k over a PQ-compressed corpus: per query,
   * a lookup table of per-(subspace, code) partial distances
   * (c·c − 2·q_sub·c, exact integers) is broadcast and the compressed codes
   * are scanned once — cost ∝ corpus codes (m small ints per vector), never
   * the original vectors. The ranking equals ‖x̂‖² − 2·q·x̂ (x̂ = the
   * reconstruction), i.e. true ADC order (the ‖q‖² term is constant per
   * query). Ties break by vec_id. Compose with [[ivfAssign]] to scan only
   * probed cells (IVF-PQ).
   */
  /** Per-query ADC lookup table `(qid, sub, code, pd)` with
    * pd = c·c − 2·q_sub·c — queries × m × k rows, always broadcast-sized. */
  private def pqLut(
      codebooks: DataFrame, queries: DataFrame, dims: Int, m: Int,
      qIdCol: String, qVecCol: String): DataFrame = {
    val sd = dims / m
    val qsubs = queries.select(
      col(qIdCol).as("qid"),
      posexplode(array((0 until m).map(s => slice(col(qVecCol), s * sd + 1, sd)): _*))
        .as(Seq("sub", "qv")))
    val cb = codebooks.select(
      col("sub"), col("cid").as("code"), col("cvec"),
      dotQ(col("cvec"), col("cvec")).as("_cc"))
    qsubs
      .join(cb, "sub")
      .select(col("qid"), col("sub"), col("code"),
        (col("_cc") - lit(2L) * dotQ(col("qv"), col("cvec"))).as("pd"))
  }

  def pqAdcTopK(
      codes: DataFrame, codebooks: DataFrame, queries: DataFrame, k: Int,
      dims: Int, m: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    val lut = pqLut(codebooks, queries, dims, m, qIdCol, qVecCol)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("vec_id").asc)
    codes
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("pd")).as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * IVF-PQ — the standard production ANN composition: a coarse quantizer
   * ([[ivfAssign]] over `coarse` centroids) shards the corpus into cells,
   * and each query ADC-scans only its `nprobe` best cells' compact codes.
   * At 1B vectors with √N cells and nprobe=8, a query touches ~8√N code
   * rows of m bytes each instead of N full vectors — the two knobs
   * (cells, nprobe) trade recall for cost independently of the PQ
   * compression itself.
   *
   * RESIDUAL form since round 8 (the production-standard Jégou variant):
   * `codebooks` must be residual-trained ([[pqTrainCodebooksResidual]]
   * against the same `coarse`), codes quantize x − c(cell)
   * ([[pqEncodeResidual]] — one fused projection pass), and each query
   * builds a per-probed-cell lookup table whose entries are full squared
   * distances over the query's own residual, so the ADC sum is exactly
   * ‖(q − c) − reconstruction‖² and ranks correctly across cells. Exact
   * integers end to end; ties break by vec_id.
   */
  def ivfPqTopK(
      emb: DataFrame, coarse: DataFrame, codebooks: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val codes = pqEncodeResidual(emb, coarse, codebooks, dims, m, idCol, vecCol)
    val qw = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cid").asc)
    val probes = ivfScoreCells(
        queries.select(col(qIdCol).as("vec_id"), col(qVecCol).as("embedding")), coarse)
      .withColumn("prn", row_number().over(qw))
      .where(col("prn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
    val lut = pqLutResidual(codebooks, coarse, probes, queries, dims, m, qIdCol, qVecCol)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("vec_id").asc)
    codes
      .join(broadcast(probes), "cell")
      .join(broadcast(lut), Seq("qid", "cell", "sub", "code"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("pd")).as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ---------------------------------------------------------------------
  // Persisted IVF-PQ index — build once, append deltas, query many.
  //
  // Every real 100 TB ANN deployment separates the (expensive, corpus-pass)
  // build from the (cheap, serving-time) query: the quantizers are trained
  // and the corpus encoded ONCE, written out, and every query afterwards
  // touches only the compact artifacts. Since round 8 the index commits
  // through the SAME protocol as [[ManifestStore]] (a never-reused
  // versioned manifest name committed by the store-appropriate
  // [[ManifestStore.CommitProtocol]] — fail-if-exists rename on
  // HDFS/POSIX-like stores, writer-unique-name read-repair on S3-class
  // stores) instead of its own bespoke
  // meta-written-last marker — one commit story for both stores, and the
  // rebuild-over-existing-dir hole is gone (a rebuild writes a FRESH
  // generation and re-points the manifest; a crash mid-rebuild leaves the
  // old manifest naming only old, untouched artifacts). Layout:
  //
  //   gen=<V>/coarse/     (cid, cvec)       — coarse centroids, broadcast
  //   gen=<V>/codebooks/  (sub, cid, cvec)  — residual PQ codebooks
  //   gen=<V>/meta/       (dims, m)
  //   gen=<V>/codes/cell=<cid>/ (vec_id, sub, code)
  //               — m small ints per vector, hive-partitioned by coarse
  //                 cell so a query's nprobe probe set becomes a PARTITION
  //                 FILTER on the scan (only the probed cells' files are
  //                 ever opened — at √N cells, a query reads ~nprobe/√N of
  //                 the index, not all of it)
  //   gen=<V>/vectors/cell=<cid>/ (vec_id, embedding)
  //               — the RAW vectors, same cell partitioning: the exact
  //                 re-rank stage ([[ivfPqTopKIndexedRerank]]) reads only
  //                 the probed cells' vectors for its ADC shortlist, which
  //                 is what makes the index self-contained for serving
  //                 (no side access to the original corpus table). Storage
  //                 is the corpus's own vector mass, reorganized — the
  //                 standard Faiss-style IVF-with-refine layout.
  //   _index.<zero-padded V>  — the commit point: lines
  //                 `quantizers\t<gen>` + `codes\t<gen>` (one per delta);
  //                 readers resolve the highest manifest and read exactly
  //                 the generations it names
  //
  // A full build writes everything into one fresh generation; an append
  // ([[appendToIndex]]) encodes a delta batch with the EXISTING quantizers
  // (one projection pass) into a new generation holding only codes +
  // vectors, and the next manifest references both. Generations are
  // immutable once committed; crash debris (a generation no manifest
  // names) is invisible and reclaimed by [[vacuumIndex]]. Single writer
  // supported — same contract as [[ManifestStore.upsert]], and since
  // round 9 the same insurance: generation directories carry a per-writer
  // token (`gen=<V>-<token>`), so racing writers write disjoint
  // directories and collide only on the manifest commit, where the
  // [[ManifestStore.CommitProtocol]] in force lets at most one writer
  // acknowledge and the loser's debris is unreferenced and vacuumable.
  // ---------------------------------------------------------------------

  /** A loaded persisted index (see layout above). `vectors` carries the
    * raw per-cell vectors backing the exact re-rank stage — constructed
    * LAZILY: building the frame lists the generations' vector directories
    * and reads parquet footers for schema, a cost ADC-only serving
    * ([[ivfPqTopKIndexed]]) must not pay for an artifact it never scans. */
  final class AnnIndex(
      val coarse: DataFrame, val codebooks: DataFrame, val codes: DataFrame,
      vectorsThunk: () => DataFrame, val dims: Int, val m: Int,
      val assignR: Int = 1, val attrs: Seq[String] = Nil) {
    lazy val vectors: DataFrame = vectorsThunk()
  }

  /** Attribute column list from a meta row (pre-attrs layouts → none). */
  private def metaAttrCols(meta: org.apache.spark.sql.Row): Seq[String] =
    if (!meta.schema.fieldNames.contains("attrs")) Nil
    else Option(meta.getAs[String]("attrs")).filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Nil)

  /** Generation IDs are directory-name suffixes: historically bare numbers,
    * since round 9 writers mint `<V>-<token>` (both forms parse and read).
    * The token makes concurrent writers' directories structurally disjoint
    * — they race only on the manifest commit, where the commit protocol
    * lets at most one writer acknowledge, so a single-writer-contract
    * violation is non-corrupting (same argument, same mechanism as
    * [[ManifestStore]]). */
  private def parseIndexManifest(content: String): (String, Seq[String], Seq[String]) = {
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    val q = lines.collectFirst { case l if l.startsWith("quantizers\t") =>
      l.stripPrefix("quantizers\t") }
    (q.getOrElse(throw new IllegalStateException("index manifest missing quantizers line")),
      lines.collect { case l if l.startsWith("codes\t") => l.stripPrefix("codes\t") },
      lines.collect { case l if l.startsWith("dels\t") => l.stripPrefix("dels\t") })
  }

  private def indexGenNumber(genId: String): Long =
    genId.takeWhile(_.isDigit).toLong

  private def newIndexGenId(version: Long): String =
    s"$version-${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  /** Fresh generation number: strictly above the committed manifest version
    * and every `gen=` directory on disk (crash debris is never reused). */
  private def nextIndexGen(spark: SparkSession, indexDir: String): Long = {
    val hfs = ManifestStore.fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val onDisk =
      if (!hfs.exists(dir)) Seq.empty[Long]
      else hfs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("gen=")).map(n => indexGenNumber(n.stripPrefix("gen="))).toSeq
    val committed = ManifestStore.readVersioned(spark, indexDir, "_index").map(_._1)
    (committed.toSeq ++ onDisk :+ 0L).max + 1
  }

  /**
   * Train quantizers and persist a complete IVF-PQ index: coarse k-means
   * ([[trainCentroids]], `coarseK` cells), residual PQ codebooks
   * ([[pqTrainCodebooksResidual]], m × pqK codes), then ONE combined
   * corpus pass that both assigns the coarse cell and PQ-encodes every
   * vector (cell assignment and encoding fuse into a single scan — at
   * 100 TB the build reads the corpus once for encoding, plus the bounded
   * Lloyd passes for training). The codes table is clustered
   * one-file-per-cell (`repartition(cell)` before the partitioned write —
   * the round-6 tiny-files lesson).
   */
  def buildIndex(
      emb: DataFrame, indexDir: String, dims: Int, m: Int,
      coarseK: Int, pqK: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      assignR: Int = 1, attrCols: Seq[String] = Nil): Unit = {
    val coarse = trainCentroids(emb, coarseK, iters, idCol, vecCol)
    val codebooks = pqTrainCodebooksResidual(emb, coarse, dims, m, pqK, iters, idCol, vecCol)
    writeIndex(emb, coarse, codebooks, indexDir, dims, m, idCol, vecCol, assignR, attrCols)
  }

  /** Persist an index from already-trained quantizers (see [[buildIndex]])
    * into a fresh generation, then commit via the manifest rename. Encode +
    * assign run as ONE projection over ONE corpus scan
    * ([[pqEncodeResidual]] — `codebooks` must come from
    * [[pqTrainCodebooksResidual]] against this `coarse`). Rebuilding over
    * an existing index is safe: the old generations are never touched and
    * the old manifest stays authoritative until the new rename lands. */
  /** Column names the index layout owns — attribute columns must not
    * collide with them (serving joins/aggregates would silently break). */
  private val IndexReservedCols =
    Set("vec_id", "cell", "sub", "code", "embedding", "qid", "adc", "pd", "rank")

  def writeIndex(
      emb: DataFrame, coarse: DataFrame, codebooks: DataFrame,
      indexDir: String, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      assignR: Int = 1, attrCols: Seq[String] = Nil): Unit = {
    require(m >= 1 && dims % m == 0, s"dims ($dims) must divide into m ($m) subspaces")
    require(assignR >= 1, s"assignR must be >= 1, got $assignR")
    attrCols.foreach(a => require(!IndexReservedCols.contains(a) && !a.contains(","),
      s"attribute column '$a' collides with a reserved index column or contains ','"))
    val spark = emb.sparkSession
    val gen = nextIndexGen(spark, indexDir)
    val genId = newIndexGenId(gen)
    val base = s"$indexDir/gen=$genId"
    coarse.coalesce(1).write.mode("overwrite").parquet(s"$base/coarse")
    codebooks.coalesce(1).write.mode("overwrite").parquet(s"$base/codebooks")
    import spark.implicits._
    // assign_r is an INDEX property, not a query knob: appends must encode
    // deltas with the same redundancy and serving must dedup copies, so it
    // rides the meta artifact next to dims/m — and so does the attribute
    // column list (appends must carry the same attrs or filtered serving
    // would see a mixed-schema corpus)
    Seq((dims, m, assignR, attrCols.mkString(",")))
      .toDF("dims", "m", "assign_r", "attrs")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    pqEncodeResidualTop(emb, coarse, codebooks, dims, m, assignR, idCol, vecCol, attrCols)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$base/codes")
    writeIndexVectors(emb, coarse, s"$base/vectors", idCol, vecCol, assignR, attrCols)
    ManifestStore.commitVersioned(spark, indexDir, "_index", gen,
      s"quantizers\t$genId\ncodes\t$genId\n")
  }

  /** Raw vectors clustered by coarse cell (the re-rank artifact): cell
    * assignment is the same shuffle-free argmax projection the encode pass
    * uses, fused with the vector itself into ONE corpus scan — no join, no
    * exchange before the partitioned write's own clustering. */
  private def writeIndexVectors(
      emb: DataFrame, coarse: DataFrame, dir: String,
      idCol: String, vecCol: String, assignR: Int = 1,
      attrCols: Seq[String] = Nil): Unit = {
    val cents = collectCentroids(coarse, "cid", "cvec")
    val attrs = attrCols.map(col)
    val assigned =
      if (assignR == 1)
        emb.select(Seq(
          col(idCol).as("vec_id"),
          cidAt(cents, argBestIdx(col(vecCol), cents, l2 = false)).as("cell"),
          col(vecCol).as("embedding")) ++ attrs: _*)
      else {
        // top-r copies so the re-rank stage's probed-cell partition filter
        // can reach a vector through ANY of its cells (serving dedups)
        val entries = cents.map { case (cid, cv) =>
          struct(
            negate(dotQ(col("_v"), typedlit(cv.toSeq))).as("nd"),
            lit(cid).as("cid"))
        }
        emb
          .select(Seq(col(idCol).as("vec_id"), col(vecCol).as("_v")) ++ attrs: _*)
          .select(Seq(col("vec_id"), col("_v").as("embedding")) ++ attrs :+
            explode(slice(array_sort(array(entries: _*)), 1, assignR)).as("_e"): _*)
          .select(Seq(
            col("vec_id"), col("_e.cid").as("cell"), col("embedding")) ++ attrs: _*)
      }
    assigned
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
  }

  /**
   * Incremental append — the continuous-ingest path: encode+assign a delta
   * batch with the EXISTING quantizers (no retraining, one projection
   * pass) into a new codes-only generation, and commit a manifest that
   * references the old generations plus the new one. Serving results are
   * identical to a full [[writeIndex]] of the concatenated corpus with the
   * same quantizers (codes are a per-row pure function of vector +
   * quantizers — PersistenceSpec pins the equivalence).
   */
  def appendToIndex(
      delta: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_index")
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $indexDir to append to"))
    val (qgen, codeGens, delGens) = parseIndexManifest(content)
    // An empty delta is a no-op: committing a row-less generation would
    // leave an uninferrable-schema parquet dir in the manifest. Checked
    // BEFORE the vectors-artifact guard so the documented no-op contract
    // holds even on a pre-vectors-layout (codes-only) index.
    if (delta.isEmpty) return
    requireVectorsArtifact(spark, indexDir, codeGens, "appendToIndex")
    val meta = spark.read.parquet(s"$indexDir/gen=$qgen/meta").collect().head
    val (dims, m) = (meta.getAs[Int]("dims"), meta.getAs[Int]("m"))
    // deltas must carry the index's own redundancy or serving would see a
    // mixed-multiplicity corpus (old vectors reachable via r cells, new
    // via 1) — assign_r is read from meta, never a caller knob here
    val assignR = if (meta.schema.fieldNames.contains("assign_r"))
      meta.getAs[Int]("assign_r") else 1
    // attrs are an index property too: a delta missing them would commit a
    // generation filtered serving can't predicate on — fail loud here
    val attrCols = metaAttrCols(meta)
    attrCols.foreach(a => require(delta.columns.contains(a),
      s"append delta missing index attribute column '$a' (index carries attrs " +
        s"${attrCols.mkString(",")})"))
    val coarse = spark.read.parquet(s"$indexDir/gen=$qgen/coarse")
    val codebooks = spark.read.parquet(s"$indexDir/gen=$qgen/codebooks")
    val gen = math.max(nextIndexGen(spark, indexDir), ver + 1)
    val genId = newIndexGenId(gen)
    pqEncodeResidualTop(delta, coarse, codebooks, dims, m, assignR, idCol, vecCol, attrCols)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/gen=$genId/codes")
    writeIndexVectors(
      delta, coarse, s"$indexDir/gen=$genId/vectors", idCol, vecCol, assignR, attrCols)
    val codeLines = (codeGens :+ genId).map(g => s"codes\t$g") ++
      delGens.map(g => s"dels\t$g")
    ManifestStore.commitVersioned(spark, indexDir, "_index", gen,
      s"quantizers\t$qgen\n" + codeLines.mkString("\n") + "\n")
  }

  /**
   * Tombstone DELETE — the takedown/right-to-be-forgotten path the
   * append-only index was missing: commit the ids as a tiny `tombstones`
   * generation under the same CAS'd manifest protocol, and every
   * subsequent [[readIndex]] anti-joins them out of BOTH served artifacts
   * (codes and raw vectors) — the deleted documents vanish from all
   * serving paths IMMEDIATELY, at the cost of one id-list write instead of
   * the full-index rebuild a 100 TB corpus can't afford. Physical removal
   * is deferred: [[compactIndex]] drops tombstoned rows from whatever it
   * rewrites, and [[purgeIndexTombstones]] is the complete physical drop
   * that also retires the tombstone list. Deleting ids not in the index is
   * a harmless no-op (the anti-join matches nothing); an empty id frame
   * commits nothing.
   *
   * `ids` must have a `vec_id` column; takedown batches are id LISTS
   * (bounded, broadcast-sized) — the serve-time anti-join builds a
   * broadcast hash set of them, so serving cost is unchanged.
   */
  def deleteFromIndex(ids: DataFrame, indexDir: String): Unit = {
    val spark = ids.sparkSession
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_index")
      .getOrElse(throw new IllegalStateException(
        s"no committed index under $indexDir to delete from"))
    val (qgen, codeGens, delGens) = parseIndexManifest(content)
    val dels = ids.select(col("vec_id")).distinct()
    if (dels.isEmpty) return
    val gen = math.max(nextIndexGen(spark, indexDir), ver + 1)
    val genId = newIndexGenId(gen)
    dels.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/gen=$genId/tombstones")
    ManifestStore.commitVersioned(spark, indexDir, "_index", gen,
      s"quantizers\t$qgen\n" + (codeGens.map(g => s"codes\t$g") ++
        (delGens :+ genId).map(g => s"dels\t$g")).mkString("\n") + "\n")
  }

  /**
   * Physical tombstone purge: rewrite ALL live code generations minus the
   * tombstoned ids into ONE consolidated generation and commit a manifest
   * with no `dels` lines — after this (plus [[vacuumIndex]]) no byte of a
   * deleted document remains on disk, the state a compliance deletion
   * ultimately requires. The quantizer artifacts stay in their original
   * generation (they are trained aggregates, not per-document data); only
   * the codes/vectors mass is rewritten — the cost of a full compaction,
   * paid when the tombstone debt is collected, not per delete. Serving
   * results are identical before and after (the serve-time anti-join
   * already hid the rows). Returns the number of tombstoned ids retired
   * (0 when the index carries no tombstones).
   */
  def purgeIndexTombstones(spark: SparkSession, indexDir: String): Long = {
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_index")
      .getOrElse(throw new IllegalStateException(s"no committed index under $indexDir"))
    val (qgen, codeGens, delGens) = parseIndexManifest(content)
    if (delGens.isEmpty) return 0L
    requireVectorsArtifact(spark, indexDir, codeGens, "purgeIndexTombstones")
    val ts = delGens
      .map(g => spark.read.parquet(s"$indexDir/gen=$g/tombstones"))
      .reduce(_.unionByName(_)).distinct().localCheckpoint()
    val nTs = ts.count()
    val gen = math.max(nextIndexGen(spark, indexDir), ver + 1)
    val genId = newIndexGenId(gen)
    def rewrite(artifact: String): Unit =
      codeGens.map { g =>
        val dir = s"$indexDir/gen=$g/$artifact"
        spark.read.option("basePath", dir).parquet(dir)
      }.reduce(_.unionByName(_))
        .join(broadcast(ts), Seq("vec_id"), "left_anti")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$indexDir/gen=$genId/$artifact")
    rewrite("codes")
    rewrite("vectors")
    ManifestStore.commitVersioned(spark, indexDir, "_index", gen,
      s"quantizers\t$qgen\ncodes\t$genId\n")
    // the quantizers generation survives for its trained artifacts; if it
    // also held codes, those (now unreferenced) subdirectories still carry
    // the deleted documents' bytes — drop them NOW, after the commit, so
    // the purge is physically complete without waiting for a vacuum.
    // Purge is a vacuum-class operation: manifests below the new version
    // stop resolving for the rewritten generations (same trade
    // [[ManifestStore.vacuum]] documents for its retention horizon).
    if (codeGens.contains(qgen)) {
      val hfs = ManifestStore.fs(spark, indexDir)
      hfs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/gen=$qgen/codes"), true)
      hfs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/gen=$qgen/vectors"), true)
    }
    nTs
  }

  /** Fail-loud guard for the round-9 layout: every committed code
    * generation must carry the raw-vector artifact. A pre-round-9 index
    * (codes-only generations) would otherwise accept the operation and
    * break LATER — readIndex's vectors union, the re-rank path and
    * compaction all throw PATH_NOT_FOUND at first use, far from the
    * cause. Rebuild such an index with [[writeIndex]] first. */
  private def requireVectorsArtifact(
      spark: SparkSession, indexDir: String, codeGens: Seq[String], op: String): Unit = {
    val hfs = ManifestStore.fs(spark, indexDir)
    val missing = codeGens.filterNot(g =>
      hfs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/gen=$g/vectors")))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"$op: index at $indexDir has generations without the vectors artifact " +
        s"(${missing.mkString(", ")}) — a pre-vectors-layout index; rebuild with " +
        "writeIndex before appending/compacting")
  }

  /** True iff `indexDir` holds a committed index (a `_index.<v>` manifest
    * exists). Probes through the Hadoop FileSystem API — correct on
    * HDFS/S3 too, where a `java.io.File` probe would always say false and
    * silently rebuild. */
  def indexCommitted(indexDir: String): Boolean =
    ManifestStore.readVersioned(SparkSession.active, indexDir, "_index").isDefined

  /** Load a persisted index: resolve the highest manifest, read exactly
    * the generations it names. No corpus scan, no training. Concurrent
    * with writers: committed generations are immutable, so a reader's
    * snapshot stays consistent while a rebuild/append commits. */
  /** Committed index version and code-generation count — the ops signals
    * (generation count is the [[compactIndex]] trigger). Listings only. */
  def indexStatus(spark: SparkSession, indexDir: String): (Long, Int) = {
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_index")
      .getOrElse(throw new IllegalStateException(s"no committed index under $indexDir"))
    val (_, codeGens, _) = parseIndexManifest(content)
    (ver, codeGens.size)
  }

  /** One-call index health report for the ops runbook (the
    * [[ManifestStore.stats]] discipline): committed version, live code
    * generations (the [[compactIndex]] pressure number), tombstone
    * generations and total tombstoned ids (the [[purgeIndexTombstones]]
    * DEBT — every query pays the anti-join until it's collected), and
    * debris directories no manifest references (the [[vacuumIndex]]
    * reclaim number). Listings plus one tiny tombstone-id read — never
    * touches codes or vectors. */
  final case class IndexStats(
      version: Long, codeGenerations: Int, tombstoneGenerations: Int,
      tombstonedIds: Long, debrisGenerations: Int)

  def indexStats(spark: SparkSession, indexDir: String): Option[IndexStats] =
    ManifestStore.readVersioned(spark, indexDir, "_index").map { case (ver, content) =>
      val (qgen, codeGens, delGens) = parseIndexManifest(content)
      val nTs =
        if (delGens.isEmpty) 0L
        else delGens
          .map(g => spark.read.parquet(s"$indexDir/gen=$g/tombstones"))
          .reduce(_.unionByName(_)).distinct().count()
      val live = (codeGens ++ delGens :+ qgen).toSet
      val hfs = ManifestStore.fs(spark, indexDir)
      val dir = new org.apache.hadoop.fs.Path(indexDir)
      val onDisk =
        if (!hfs.exists(dir)) Set.empty[String]
        else hfs.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=")).toSet
      IndexStats(ver, codeGens.size, delGens.size, nTs, (onDisk -- live).size)
    }

  def readIndex(spark: SparkSession, indexDir: String): AnnIndex =
    readIndexFrom(spark, indexDir,
      ManifestStore.readVersioned(spark, indexDir, "_index")
        .getOrElse(throw new IllegalStateException(
          s"no committed index under $indexDir"))._2)

  /** TIME TRAVEL: the index as of commit version `asOf` (the newest
    * commit ≤ `asOf`) — pin the exact snapshot a training run retrieved
    * against, reproducibly. Generations are immutable so the snapshot is
    * consistent with no locking; it stays READABLE until [[vacuumIndex]]
    * (which retains only the CURRENT manifest's generations) or a
    * [[purgeIndexTombstones]] reclaims what it references — a deployment
    * serving time travel schedules those accordingly, the
    * [[ManifestStore.vacuum]] retention contract. */
  def readIndexAt(spark: SparkSession, indexDir: String, asOf: Long): AnnIndex =
    readIndexFrom(spark, indexDir,
      ManifestStore.readVersionedAt(spark, indexDir, "_index", asOf)
        .getOrElse(throw new IllegalStateException(
          s"no index committed at or before version $asOf under $indexDir"))._2)

  /** All committed index versions, ascending — each addressable via
    * [[readIndexAt]] until vacuumed past. */
  def indexVersions(spark: SparkSession, indexDir: String): Seq[Long] =
    ManifestStore.versionsOf(spark, indexDir, "_index")

  private def readIndexFrom(
      spark: SparkSession, indexDir: String, content: String): AnnIndex = {
    val (qgen, codeGens, delGens) = parseIndexManifest(content)
    val meta = spark.read.parquet(s"$indexDir/gen=$qgen/meta").collect().head
    // live tombstones fold to ONE distinct-id frame (takedown batches are
    // id lists — broadcast-sized) anti-joined into BOTH served artifacts,
    // so every serving path sees the post-delete corpus without any
    // generation having been rewritten
    val tombstones: Option[DataFrame] =
      if (delGens.isEmpty) None
      else Some(delGens
        .map(g => spark.read.parquet(s"$indexDir/gen=$g/tombstones"))
        .reduce(_.unionByName(_)).distinct())
    def gens(artifact: String): DataFrame = {
      val all = codeGens.map { g =>
        val dir = s"$indexDir/gen=$g/$artifact"
        spark.read.option("basePath", dir).parquet(dir)
      }.reduce(_.unionByName(_))
      tombstones.fold(all)(ts =>
        all.join(broadcast(ts), Seq("vec_id"), "left_anti"))
    }
    new AnnIndex(
      coarse = spark.read.parquet(s"$indexDir/gen=$qgen/coarse"),
      codebooks = spark.read.parquet(s"$indexDir/gen=$qgen/codebooks"),
      codes = gens("codes"),
      vectorsThunk = () => gens("vectors"),
      dims = meta.getAs[Int]("dims"),
      m = meta.getAs[Int]("m"),
      // pre-assign_r indexes (rounds 8-10) are single-assignment
      assignR = if (meta.schema.fieldNames.contains("assign_r"))
        meta.getAs[Int]("assign_r") else 1,
      attrs = metaAttrCols(meta))
  }

  /**
   * Drift-triggered full retrain — the ACTION [[ledgerMomentsDrift]]
   * exists to trigger: rebuilds the index from its OWN stored rerank
   * vectors (the post-delete corpus — tombstones are folded by the read,
   * assign-r copies deduped here), retraining BOTH quantizer tiers
   * against the current distribution and committing one fresh full
   * generation through the same manifest swap. The old generations drop
   * out of the manifest atomically (vacuumable), accumulated tombstones
   * retire with them, and appends resume against the new quantizers. No
   * external copy of the corpus is needed — the index is self-healing.
   *
   * Training is deterministic (lowest-id seeds, exact integer Lloyd
   * iterations), so a rebuild serves IDENTICALLY to a fresh
   * [[buildIndex]] over the same remaining corpus (spec-pinned).
   */
  def rebuildIndex(
      spark: SparkSession, indexDir: String,
      coarseK: Int, pqK: Int, iters: Int): Unit = {
    val idx = readIndex(spark, indexDir)
    val emb = idx.vectors
      .select((col("vec_id") +: col("embedding") +: idx.attrs.map(col)): _*)
      .dropDuplicates("vec_id")
      // the training/encode passes scan this multiple times; pin the
      // dedup result rather than re-reading every generation per pass
      .localCheckpoint()
    buildIndex(emb, indexDir, idx.dims, idx.m, coarseK, pqK, iters,
      assignR = idx.assignR, attrCols = idx.attrs)
  }

  /**
   * Index-generation compaction — the continuous-ingest counterpart of
   * [[ManifestStore.compact]]: every [[appendToIndex]] adds a codes-only
   * generation, so after many small deltas a query's probed-cell read
   * lists (and on an object store pays a round-trip per) each generation's
   * partition directory. Compaction rewrites the SMALLEST code generations
   * (by on-disk bytes — cheapest rewrite volume per directory eliminated)
   * into one consolidated generation, then commits through the same
   * atomic never-reused-manifest-name rename. The quantizers generation
   * is never a victim (it also anchors coarse/codebooks/meta), so the
   * REACHABLE floor is 2 code generations when the quantizers gen holds
   * codes (the full-build case): `maxGens = 1` compacts as far as the
   * layout allows — down to {quantizers gen, one merged gen} — and then
   * reports 0, it does NOT rewrite the quantizers gen's codes. Serving
   * results are identical before and after (codes are content, not
   * order, and the rewrite unions then re-clusters by cell). A crash
   * mid-rewrite leaves an unreferenced generation — invisible,
   * vacuumable.
   *
   * Returns the number of generations eliminated (0 when no merge can
   * reduce the count further — "as compact as the layout permits", which
   * callers must NOT read as `codeGens.size <= maxGens`).
   */
  def compactIndex(spark: SparkSession, indexDir: String, maxGens: Int = 1): Int = {
    require(maxGens >= 1, "maxGens must be at least 1")
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_index")
      .getOrElse(return 0)
    val (qgen, codeGens, delGens) = parseIndexManifest(content)
    if (codeGens.size <= maxGens) return 0
    requireVectorsArtifact(spark, indexDir, codeGens, "compactIndex")
    val hfs = ManifestStore.fs(spark, indexDir)
    // one namespace walk per generation, NOT one per sort comparison
    // (sortBy re-evaluates its key function each compare; getContentSummary
    // is a recursive listing — an object-store round-trip storm at scale)
    val sizes: Map[String, Long] = codeGens.filterNot(_ == qgen).map { g =>
      g -> hfs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$indexDir/gen=$g/codes")).getLength
    }.toMap
    // keep the quantizers gen (if it holds codes) plus the largest others
    // up to the budget; everything else merges into one fresh generation
    val others = codeGens.filterNot(_ == qgen)
    val quota = math.max(0, maxGens - (if (codeGens.contains(qgen)) 1 else 0) - 1)
    val keep = others.sortBy(g => (-sizes(g), -indexGenNumber(g), g)).take(quota)
    val victims = others.filterNot(keep.contains)
    if (victims.size <= 1) return 0 // merging one gen can't reduce the count
    val gen = math.max(nextIndexGen(spark, indexDir), ver + 1)
    val genId = newIndexGenId(gen)
    // merged output physically drops tombstoned rows (the serve-time
    // anti-join already hides them, so content is unchanged); the del
    // lines stay live because the KEPT generations may still hold
    // tombstoned rows — [[purgeIndexTombstones]] is the full physical drop
    val ts: Option[DataFrame] =
      if (delGens.isEmpty) None
      else Some(delGens
        .map(g => spark.read.parquet(s"$indexDir/gen=$g/tombstones"))
        .reduce(_.unionByName(_)).distinct())
    def merge(artifact: String): Unit = {
      val unioned = victims.map { g =>
        val dir = s"$indexDir/gen=$g/$artifact"
        spark.read.option("basePath", dir).parquet(dir)
      }.reduce(_.unionByName(_))
      ts.fold(unioned)(t => unioned.join(broadcast(t), Seq("vec_id"), "left_anti"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$indexDir/gen=$genId/$artifact")
    }
    merge("codes")
    merge("vectors")
    val live = (codeGens.filter(g => g == qgen || keep.contains(g)) :+ genId)
    ManifestStore.commitVersioned(spark, indexDir, "_index", gen,
      s"quantizers\t$qgen\n" + (live.map(g => s"codes\t$g") ++
        delGens.map(g => s"dels\t$g")).mkString("\n") + "\n")
    victims.size
  }

  /** Drop generation directories the CURRENT manifest does not reference
    * (superseded rebuilds, crash debris). Space reclamation only —
    * correctness never depends on it; returns the number removed. */
  def vacuumIndex(spark: SparkSession, indexDir: String): Int = {
    val live = ManifestStore.readVersioned(spark, indexDir, "_index")
      .map { case (_, c) =>
        val (q, gs, ds) = parseIndexManifest(c); (gs ++ ds :+ q).toSet }
      .getOrElse(Set.empty[String])
    val hfs = ManifestStore.fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    if (!hfs.exists(dir)) return 0
    val dead = hfs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") &&
        !live.contains(p.getName.stripPrefix("gen=")))
    dead.foreach(p => hfs.delete(p, true))
    dead.length
  }

  /**
   * Serving-time IVF-PQ top-k over a persisted index — NO training, no
   * full-corpus encode: probes come from the (tiny, broadcast) coarse
   * table, the ADC lookup table from the (tiny) codebooks, and the code
   * scan is restricted to the probed cells by a LITERAL partition filter
   * (the probe set — queries × nprobe cell ids, bounded and small — is
   * collected and pushed as an `IN` on the hive partition column, so
   * non-probed cells' files are pruned at planning time, the behavior
   * PlanAuditSpec pins). Ranking is identical to [[ivfPqTopK]] with the
   * same quantizers.
   *
   * FILTERED search: pass `filter` (a predicate over the index's attribute
   * columns — see [[writeIndex]]'s `attrCols`) to restrict candidates
   * BEFORE top-k selection, so all k results satisfy the predicate
   * (pre-filter semantics, the Qdrant/Vespa contract — never the
   * post-filter shape that silently returns < k rows). The predicate is
   * ordinary parquet-column pruning on the codes scan (PushedFilters,
   * row-group stat skipping) — zero extra joins or exchanges. Recall
   * caveat inherent to IVF pre-filtering: candidates still come from the
   * nprobe probed cells only, so a highly selective predicate wants a
   * larger nprobe (matching-vector mass per probed cell shrinks with
   * selectivity; the standard filtered-ANN trade).
   */
  def ivfPqTopKIndexed(
      index: AnnIndex, queries: DataFrame, k: Int, nprobe: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec",
      filter: Option[Column] = None): DataFrame = {
    val (adc, _) = adcScoresIndexed(index, queries, nprobe, qIdCol, qVecCol, filter)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Shared serving-time ADC core: `(qid, vec_id, adc)` over the probed
    * cells plus the collected probe-cell set (for reuse as a partition
    * filter on the sibling `vectors` artifact). */
  private def adcScoresIndexed(
      index: AnnIndex, queries: DataFrame, nprobe: Int,
      qIdCol: String, qVecCol: String,
      filter: Option[Column] = None): (DataFrame, Seq[Any]) = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val qw = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cid").asc)
    val probes = ivfScoreCells(
        queries.select(col(qIdCol).as("vec_id"), col(qVecCol).as("embedding")), index.coarse)
      .withColumn("prn", row_number().over(qw))
      .where(col("prn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
    val probedCells = probes.select("cell").distinct().collect().map(_.get(0)).toSeq
    val lut = pqLutResidual(
      index.codebooks, index.coarse, probes, queries, index.dims, index.m, qIdCol, qVecCol)
    // an attribute predicate (filtered ANN) lands NEXT TO the partition
    // filter on the codes scan: attrs are plain parquet columns of the
    // artifact, so the predicate reaches PushedFilters / row-group stats —
    // non-matching file mass is skipped at the scan, never exchanged
    val filteredCodes = filter.fold(index.codes)(index.codes.where)
    val joined = filteredCodes
      .where(col("cell").isin(probedCells: _*))
      .join(broadcast(probes), "cell")
      .join(broadcast(lut), Seq("qid", "cell", "sub", "code"))
    // On a redundantly-assigned index (assign_r > 1) a candidate can be
    // reached through several probed cells, each copy with its own exact
    // per-cell ADC — keep the BEST copy (min distance, the Faiss dedup
    // rule). Summing across copies would corrupt the distance; the extra
    // per-cell grouping level exchanges only candidate×cell rows. The
    // single-assignment index keeps the one-level plan-pinned aggregate.
    val adc =
      if (index.assignR > 1)
        joined
          .groupBy("qid", "vec_id", "cell")
          .agg(sum(col("pd")).as("_adc_c"))
          .groupBy("qid", "vec_id")
          .agg(min(col("_adc_c")).as("adc"))
      else
        joined
          .groupBy("qid", "vec_id")
          .agg(sum(col("pd")).as("adc"))
    (adc, probedCells)
  }

  /** Exact re-rank of a per-query shortlist: score every `(qid, vec_id)`
    * shortlist row by the exact integer dot product against the raw
    * vectors and keep the top `k` (dot desc, vec_id tie-break — the same
    * ranking contract as [[bruteForceTopK]]/[[ivfTopK]]). The shortlist is
    * queries × R rows — broadcast-sized by construction — so the vector
    * scan joins against a broadcast hash set and never shuffles. */
  private def rerankExact(
      shortlist: DataFrame, vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      dedupCopies: Boolean = false): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    val scored = vectors
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(broadcast(shortlist.select(col("qid"), col("vec_id"))), "vec_id")
      .join(broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"))), "qid")
      .select(col("qid"), col("vec_id"), dotQ(col("v"), col("qv")).as("dot"))
    // a redundantly-assigned vectors artifact stores a vector once per
    // cell; copies score the same exact dot, but two identical rows would
    // occupy two top-k ranks — dedup the (shortlist-bounded) scored set
    (if (dedupCopies) scored.dropDuplicates("qid", "vec_id") else scored)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * IVF-PQ serving with an exact re-rank stage — the standard production
   * recall fix: the compressed-code ADC scan retrieves a SHORTLIST of
   * `shortlist` ≫ k candidates per query (cheap — codes only), and the
   * final ranking exact-scores just those candidates against the raw
   * vectors the index already stores per cell. Recall approaches the
   * exact-scan ceiling of the same nprobe (the ADC shortlist only has to
   * CONTAIN the true top-k, not rank it), while the expensive full-vector
   * arithmetic touches `shortlist` rows per query instead of every probed
   * cell's full mass. Cost knobs: `nprobe` bounds which cells are read at
   * all (partition filter on BOTH artifacts), `shortlist` bounds the
   * exact-scored row count. Output ranks by exact dot (desc, vec_id
   * tie-break) — directly comparable to [[ivfTopK]]/[[bruteForceTopK]].
   */
  def ivfPqTopKIndexedRerank(
      index: AnnIndex, queries: DataFrame, k: Int, nprobe: Int, shortlist: Int,
      qIdCol: String = "qid", qVecCol: String = "qvec",
      filter: Option[Column] = None): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val (adc, probedCells) =
      adcScoresIndexed(index, queries, nprobe, qIdCol, qVecCol, filter)
    val sw = Window.partitionBy("qid").orderBy(col("adc").asc, col("vec_id").asc)
    val sl = adc
      .withColumn("srn", row_number().over(sw))
      .where(col("srn") <= shortlist)
      .select("qid", "vec_id")
    rerankExact(
      sl, index.vectors.where(col("cell").isin(probedCells: _*)), queries, k,
      "vec_id", "embedding", qIdCol, qVecCol, dedupCopies = index.assignR > 1)
  }

  /** In-query (non-persisted) IVF-PQ with exact re-rank — the same
    * two-stage ranking as [[ivfPqTopKIndexedRerank]] with the shortlist
    * coming from [[ivfPqTopK]] and the exact stage scoring against the
    * corpus frame itself; the measurement path for the quality harness. */
  def ivfPqTopKRerank(
      emb: DataFrame, coarse: DataFrame, codebooks: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, shortlist: Int, dims: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "qid", qVecCol: String = "qvec"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val sl = ivfPqTopK(
        emb, coarse, codebooks, queries, shortlist, nprobe, dims, m,
        idCol, vecCol, qIdCol, qVecCol)
      .select("qid", "vec_id")
    rerankExact(sl, emb, queries, k, idCol, vecCol, qIdCol, qVecCol)
  }

  /**
   * SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
   * arXiv:2303.09540): assign every embedding to its k-means cell
   * ([[ivfAssign]] over [[trainCentroids]] output), then compare pairs ONLY
   * within a cell — the clustering bound is what makes semantic dedup
   * tractable at corpus scale: the pair search is an equi-join on the cell
   * id costing Σ|cell|² instead of N², and with √N balanced cells that is
   * ~N^1.5 spread across the cluster. Emits `(id_a, id_b, cos)` for pairs
   * with exact quantized cosine ≥ `threshold` (id_a < id_b).
   *
   * Same-cell is the SemDeDup contract, not an approximation knob: the
   * published method also only dedups within a cluster (true duplicates
   * straddling a cell boundary are the quantizer's recall trade, improved
   * by more k-means iterations, not by widening the join).
   */
  /**
   * The √N cell-count rule, as a function: `max(32, ⌈√n⌉)` cells for an
   * `n`-vector training corpus. The within-cell pair search costs
   * Σ|cell|² ≈ N²/k, so a FIXED k is quadratic in N — the 10× stress run
   * measured exactly that (4.18× time at 10× data with k pinned at 32,
   * 0.64× of that after raising k) — while k ∝ √N keeps the expected
   * per-cell occupancy √N and the total pair cost ~N^1.5, the published
   * SemDeDup scaling. The floor of 32 keeps small corpora from degrading
   * to a handful of giant cells.
   */
  def semanticCellCount(n: Long): Int =
    math.max(32, math.ceil(math.sqrt(n.toDouble)).toInt)

  /**
   * Centroids for the semantic-dedup family with the cell count DERIVED
   * from the corpus ([[semanticCellCount]]) instead of hard-coded — one
   * cheap `count()` (a metadata-only scan on parquet), then
   * [[trainCentroids]]. Callers who pin k explicitly own the √N rule
   * themselves.
   */
  def autoCentroids(
      emb: DataFrame, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    trainCentroids(emb, semanticCellCount(emb.count()), iters, idCol, vecCol)

  def semanticNearDuplicates(
      emb: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = ivfAssign(emb, centroids, idCol, vecCol)
      .select(col("vec_id"), col("cell"))
    val sig = emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(cells, "vec_id")
    val a = sig.select(col("cell"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("cell"), col("vec_id").as("id_b"), col("v").as("v_b"))
    a.join(b, "cell")
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        cosine(
          dotQ(col("v_a"), col("v_b")),
          dotQ(col("v_a"), col("v_a")),
          dotQ(col("v_b"), col("v_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * Semantic (embedding-level) decontamination: `(corpus_id, eval_id)` for
   * every train/eval pair whose exact quantized cosine ≥ `threshold` —
   * the leak tier that catches paraphrases and near-verbatim rewrites that
   * exact fingerprints ([[graft.ops.Dedup.crossContamination]]) and
   * token-overlap ([[graft.ops.Dedup.overlapContamination]]) both miss.
   * Both sides are assigned to the same quantizer's cells and only
   * same-cell cross pairs are scored (equi-join on cell — the eval side is
   * small, so per-cell fan-out is |cell_train| · |cell_eval|, never N²).
   */
  def semanticContamination(
      corpus: DataFrame, evalSet: DataFrame, centroids: DataFrame,
      threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cv = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("v_c"))
      .join(
        ivfAssign(corpus, centroids, idCol, vecCol)
          .select(col("vec_id").as("corpus_id"), col("cell")),
        "corpus_id")
    val ev = evalSet
      .select(col(idCol).as("eval_id"), col(vecCol).as("v_e"))
      .join(
        ivfAssign(evalSet, centroids, idCol, vecCol)
          .select(col("vec_id").as("eval_id"), col("cell")),
        "eval_id")
    cv.join(ev, "cell")
      .select(
        col("corpus_id"), col("eval_id"),
        cosine(
          dotQ(col("v_c"), col("v_e")),
          dotQ(col("v_c"), col("v_c")),
          dotQ(col("v_e"), col("v_e"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * Semantic deduplication: keeps one representative (the minimum id) per
   * connected group of [[semanticNearDuplicates]] pairs. Chains are closed
   * with [[Dedup.clustersAuto]] (propagation fast path, contraction
   * fallback), so a long a~b~c~… similarity chain collapses to one survivor
   * no matter its depth.
   */
  def semanticDedup(
      emb: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Dedup.dropDuplicateClusters(
      emb,
      semanticNearDuplicates(emb, centroids, threshold, idCol, vecCol)
        .select(col("id_a"), col("id_b")),
      idCol)

  // ---------------------------------------------------------------------
  // Distributed PCA — dimensionality reduction for embedding stores.
  //
  // The 100 TB shape: the ONLY corpus-wide pass is the `moment_matrix`
  // native aggregate (exact integer count / sums / upper-triangle cross
  // products, partial-aggregatable, ~17 KB per partition partial at
  // d = 64 — see graft.expressions.MomentMatrix). The d×d eigenproblem
  // is driver-side (trivial at embedding dims), and projection is a
  // shuffle-free per-row expression against literal basis vectors — the
  // same economics as k-means assignment. No N×d² explosion, no
  // float-sum nondeterminism: moments are exact integers, so training is
  // a pure function of the input multiset (oracle-replayable), and the
  // deterministic Jacobi sweep + sign convention make the basis itself
  // reproducible across runs and cluster layouts.
  // ---------------------------------------------------------------------

  /** A trained PCA basis. `mean` and `eigenvalues` live in the QUANTIZED
    * domain (components scaled by `scale`, variances by `scale²`) —
    * projections are therefore `scale ×` the unquantized ones, a fixed
    * isotropic factor that preserves every distance ratio and ranking. */
  final case class PcaModel(
      dims: Int, k: Int, scale: Long,
      mean: Array[Double], basis: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Exact integer moment matrix of the corpus — ONE aggregate row
    * `[n, s_0..s_{d-1}, upper-triangle Σq_i·q_j]` (see
    * [[graft.expressions.MomentMatrix]] for layout and the
    * `N < 2⁶³/scale²` exactness bound). The single collect is one bounded
    * array (1 + d + d(d+1)/2 longs), the legitimate driver-side shape. */
  /** The quantization scale rides the SQL surface as an int literal —
    * fail loud on a value that would silently truncate (training would
    * then quantize at a different scale than [[PcaModel.scale]] serves). */
  private def quantScaleLit(scale: Long, fn: String): Column = {
    require(scale >= 1 && scale <= Int.MaxValue,
      s"$fn scale must be in [1, ${Int.MaxValue}], got $scale")
    lit(scale.toInt)
  }

  def momentMatrix(
      emb: DataFrame, dims: Int,
      vecCol: String = "embedding", scale: Long = 1000L): Array[Long] = {
    graft.GraftExtensions.register(emb.sparkSession)
    emb.agg(call_function("moment_matrix",
        col(vecCol), lit(dims), quantScaleLit(scale, "momentMatrix")).as("m"))
      .collect()(0).getSeq[Long](0).toArray
  }

  /** Deterministic cyclic-Jacobi eigendecomposition of a symmetric d×d
    * matrix (driver-side; d = embedding dims, trivially small). Fixed
    * sweep order + fixed convergence test ⇒ bit-reproducible. Returns
    * (eigenvalues, eigenvectors-as-rows), UNSORTED. */
  private def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // stable tangent: t -> 1 as theta -> 0, never cancels
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d, d)((c0, i) => v(i)(c0)))
  }

  /**
   * Train a `k`-component PCA basis from the corpus's exact integer
   * moments: covariance `C_ij = P_ij/n − (S_i/n)(S_j/n)` (population
   * form, quantized domain), Jacobi eigensolve, components sorted by
   * eigenvalue descending (ties by first-seen order — deterministic),
   * each eigenvector sign-normalized so its largest-|magnitude| component
   * (first index on ties) is positive.
   */
  def pcaTrain(
      emb: DataFrame, dims: Int, k: Int,
      vecCol: String = "embedding", scale: Long = 1000L): PcaModel =
    pcaTrainFromMoments(momentMatrix(emb, dims, vecCol, scale), dims, k, scale)

  /** One-row moment FRAME `(dims, scale, m)` for a batch — the ledger unit
    * for incremental PCA: append one per ingest batch
    * ([[SketchLedger.append]]), fold with [[momentFold]], retrain with
    * [[pcaTrainFromMoments]] — corpus-wide PCA at cost ∝ batches, no
    * batch ever rescanned (integer moments merge by addition, so the fold
    * IS the whole-corpus aggregate, bit for bit). */
  def momentFrame(
      emb: DataFrame, dims: Int,
      vecCol: String = "embedding", scale: Long = 1000L): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    emb.agg(call_function("moment_matrix",
        col(vecCol), lit(dims), quantScaleLit(scale, "momentFrame")).as("m"))
      .select(lit(dims).as("dims"), lit(scale).as("scale"), col("m"))
  }

  /** Element-wise sum of moment frames (one row per appended batch —
    * bounded by compaction cadence, the [[SketchLedger]] contract).
    * Mixed shapes fail loud: a frame quantized at a different scale would
    * silently corrupt every moment. */
  def momentFold(frames: DataFrame): Array[Long] = {
    val rows = frames.select(col("dims"), col("scale"), col("m")).collect()
    require(rows.nonEmpty, "momentFold of an empty ledger")
    val dims = rows.head.getInt(0)
    val scale = rows.head.getLong(1)
    rows.foreach(r => require(r.getInt(0) == dims && r.getLong(1) == scale,
      s"mixed moment shapes in ledger: (${r.getInt(0)}, ${r.getLong(1)}) " +
        s"vs ($dims, $scale)"))
    val acc = new Array[Long](1 + dims + dims * (dims + 1) / 2)
    rows.foreach { r =>
      val m = r.getSeq[Long](2)
      require(m.length == acc.length,
        s"moment frame length ${m.length} != expected ${acc.length}")
      var i = 0
      while (i < acc.length) { acc(i) += m(i); i += 1 }
    }
    acc
  }

  /**
   * Group-wise mean pooling of a vector column — the chunk→document
   * embedding step (pool a long document's chunk embeddings into one
   * vector): `(groupCol, n, mean)` with `mean` the per-dimension average
   * in the ORIGINAL (unquantized) domain, computed as exact integer sums
   * (`vec_sum` native aggregate, quantized at `scale`) divided by the
   * count — a single double division per dimension, so the result is a
   * pure function of the input multiset (no float-summation order).
   *
   * Shuffle shape: ONE exchange of (group, partition)-partial sums of
   * d + 1 longs each — a d× volume cut over the posexplode-then-groupBy
   * form, and the partial aggregation means a hot group costs its reduce
   * task only the merge of per-partition partials.
   */
  def meanPool(
      df: DataFrame, groupCol: String, dims: Int,
      vecCol: String = "embedding", scale: Long = 1000L): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    df.groupBy(col(groupCol))
      .agg(call_function("vec_sum",
        col(vecCol), lit(dims), quantScaleLit(scale, "meanPool")).as("_s"))
      .select(
        col(groupCol),
        element_at(col("_s"), 1).as("n"),
        transform(slice(col("_s"), 2, dims),
          s => s.cast("double") / (element_at(col("_s"), 1) * lit(scale))
            .cast("double")).as("mean"))
  }

  /**
   * Embedding-distribution drift between two moment folds — the
   * REBUILD-TRIGGER signal for the frozen-quantizer index
   * ([[appendToIndex]] encodes against fixed centroids; when the
   * distribution moves, recall decays silently): the per-dimension
   * squared standardized mean shift, averaged —
   * `score = (1/d) Σ_d (μa_d − μb_d)² / (pooledVar_d + eps)`.
   * Both inputs come from [[momentMatrix]]/[[momentFold]] at the SAME
   * dims and scale, so the comparison costs two already-computed moment
   * arrays and zero corpus access — fold the ledger's pre-window and
   * post-window frames and compare. Deterministic closed form (driver
   * arithmetic over 2·(1+d+d(d+1)/2) longs); ~0 for same-distribution
   * windows, grows quadratically with mean displacement in units of the
   * pooled standard deviation (score ≈ k² for a uniform k-sigma shift).
   */
  def momentsDrift(
      a: Array[Long], b: Array[Long], dims: Int, eps: Double = 1e-9): Double = {
    val expect = 1 + dims + dims * (dims + 1) / 2
    require(a.length == expect && b.length == expect,
      s"moment arrays must have length $expect for dims=$dims, " +
        s"got ${a.length} and ${b.length}")
    val (na, nb) = (a(0).toDouble, b(0).toDouble)
    require(na >= 2 && nb >= 2, "momentsDrift needs >= 2 vectors per side")
    var acc = 0.0
    var d = 0
    while (d < dims) {
      val muA = a(1 + d) / na
      val muB = b(1 + d) / nb
      val idx = graft.expressions.MomentMatrix.triIndex(d, d, dims)
      val varA = a(idx) / na - muA * muA
      val varB = b(idx) / nb - muB * muB
      val pooled = (na * varA + nb * varB) / (na + nb)
      val diff = muA - muB
      acc += diff * diff / (pooled + eps)
      d += 1
    }
    acc / dims
  }

  /**
   * [[momentsDrift]] over a moments LEDGER (the
   * [[graft.streaming.VectorIngestStream]] `momentsLedger` artifact):
   * folds the first `baselineGens` committed frames against the rest and
   * scores the shift — "has the embedding distribution moved since the
   * index was built?" answered from sketches alone, no ingested batch
   * rescanned. Returns None until both windows are nonempty (fewer than
   * `baselineGens + 1` committed generations). A score ≳ 1 means the mean
   * has moved by about a pooled standard deviation — time to retrain the
   * quantizer ([[pcaTrainFromMoments]] / `buildIndex`) rather than keep
   * appending against stale centroids.
   */
  def ledgerMomentsDrift(
      spark: SparkSession, ledgerDir: String, dims: Int, baselineGens: Int,
      eps: Double = 1e-9): Option[Double] = {
    require(baselineGens > 0, s"baselineGens must be positive, got $baselineGens")
    val gens = SketchLedger.generations(spark, ledgerDir)
    if (gens.length <= baselineGens) None
    else {
      val base = momentFold(SketchLedger.readGens(spark, ledgerDir, gens.take(baselineGens)))
      val recent = momentFold(SketchLedger.readGens(spark, ledgerDir, gens.drop(baselineGens)))
      Some(momentsDrift(base, recent, dims, eps))
    }
  }

  /** Train from an already-folded moment array (see [[momentFold]]) —
    * the incremental-retrain entry point; [[pcaTrain]] is this over one
    * whole-corpus [[momentMatrix]] pass. */
  def pcaTrainFromMoments(
      mm: Array[Long], dims: Int, k: Int, scale: Long = 1000L): PcaModel = {
    require(k >= 1 && k <= dims, s"k ($k) must be in [1, dims=$dims]")
    val n = mm(0).toDouble
    require(n >= 2, s"pcaTrain needs at least 2 vectors, got ${mm(0)}")
    val mean = Array.tabulate(dims)(i => mm(1 + i) / n)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      mm(graft.expressions.MomentMatrix.triIndex(lo, hi, dims)) / n -
        mean(lo) * mean(hi)
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    val basis = order.map { c =>
      val vec = evecs(c)
      val mi = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(mi) < 0) vec.map(x => -x) else vec
    }.toArray
    PcaModel(dims, k, scale, mean, basis, order.map(evals).toArray)
  }

  /**
   * Project a vector column onto a trained basis — a PURE per-row
   * expression: each component is `Σ_d (q_d − mean_d)·b_cd` with
   * `q_d = floor(x_d·scale)` (the training quantization) and the basis /
   * mean folded in as literals, so the plan is a shuffle-free projection
   * over the scan with NO join and no corpus-wide state. Output column:
   * `array<double>` of length k. Runs on the codegen'd `pca_project`
   * kernel ([[graft.expressions.PcaProjectExpr]]) — the basis rides into
   * generated code as a reference object, the row quantizes once for all
   * k components, and the left-to-right summation is a fixed order —
   * deterministic across runs, partitionings, and bases.
   */
  def pcaProject(
      df: DataFrame, model: PcaModel,
      vecCol: String = "embedding", outCol: String = "pca"): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    val meanDots = model.basis.map(b =>
      b.zip(model.mean).map { case (w, mu) => w * mu }.sum)
    df.withColumn(outCol, call_function("pca_project",
      col(vecCol),
      typedlit(model.basis.map(_.toSeq).toSeq),
      typedlit(meanDots.toSeq),
      lit(model.scale)))
  }
}
