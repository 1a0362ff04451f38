package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Column profiling — the ANALYZE/data-quality surface: per-column null
 * count, exact distinct count, and lexicographic min/max (values cast to
 * string so one output schema covers every input type; numeric callers
 * wanting numeric extremes profile the raw column themselves).
 *
 * The EXACT path aggregates each column in two stages — `groupBy(value)`
 * with a map-side partial count, then a global roll-up of the
 * (value, count) table — and unions the per-column results. That shape
 * never multiplies rows: a flat multi-column `countDistinct` agg makes
 * Spark plan an Expand that replicates every input row once per profiled
 * column before the first partial aggregate (measured 4× slower on a
 * 5-column profile, and the gap widens with width), while here each
 * branch scans ONE parquet column (pruned scan), shrinks it map-side to
 * its distinct values, and shuffles only (value, count) pairs. The
 * branches share nothing, so Spark runs them concurrently inside one
 * job. [[profileApprox]] keeps the single-pass flat-agg shape — HLL
 * sketches aggregate in place without an Expand, so one corpus scan
 * covers every column there.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    requireProfileCols(cols)
    cols.map { c =>
      val g = df.select(col(c).as("_v")).groupBy("_v").agg(count(lit(1)).as("_cnt"))
      g.agg(
        lit(c).as("col_name"),
        coalesce(sum(when(col("_v").isNull, col("_cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("_v").isNotNull, 1)).as("n_distinct"),
        min(col("_v").cast("string")).as("min_value"),
        max(col("_v").cast("string")).as("max_value"))
    }.reduce(_ union _)
  }

  /**
   * [[profile]] with `approx_count_distinct` (HLL++, relative error `rsd`)
   * in place of the exact distinct count — the quick-look variant for wide
   * tables at the 100 TB end. Exact multi-column distincts make Spark plan
   * an `Expand` that multiplies every input row by the number of profiled
   * columns; HLL sketches aggregate each column in place (no row
   * multiplication) and merge map-side. Estimates are engine-specific, so
   * this variant is spec-bounded against the exact pass rather than
   * oracle-hashed.
   */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def requireProfileCols(cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "profile requires at least one column")
    require(cols.distinct == cols, "profile column list contains duplicates")
  }

  private def profileWith(
      df: DataFrame, cols: Seq[String], distinctAgg: String => Column): DataFrame = {
    requireProfileCols(cols)
    // the stack() unpivot splices names into a SQL expression — refuse
    // names that would break or inject into it rather than mis-parse
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "profile column names must not contain backticks or quotes")
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinctAgg(c).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val stacked = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.length}, $stacked) AS (col_name, n_nulls, n_distinct, min_value, max_value)")
  }

  /**
   * Fixed-width histogram of a numeric column over `[lo, hi]`: `bins`
   * equal buckets, values outside the range (and nulls) dropped, the
   * closed upper edge clamped into the last bucket. Returns
   * `(bin, bin_lo, bin_hi, cnt)` for NON-EMPTY buckets (dense zero-filled
   * output is a small generate+left-join away; the sparse form is what
   * scales — one hash aggregate, no materialized bucket table).
   *
   * Engine-portable determinism: the bucket width is computed at PLAN TIME
   * in Scala (never `(hi-lo)/bins` inside SQL, where integer-division
   * semantics differ across engines) and the per-row arithmetic is a
   * single subtract/divide/floor chain — IEEE-identical everywhere.
   */
  /**
   * Exact pairwise Pearson correlations over numeric columns in ONE
   * aggregate pass — the "which quality signals are redundant?" question
   * every feature/score audit asks before pruning columns. Values are
   * quantized to integers (`floor(x·scale)` — IEEE-identical on every
   * engine, the [[graft.ops.Similarity]] moment discipline) so the
   * accumulated sums are EXACT and order-independent; correlations derive
   * from the integer moments in closed form and round to 4 dp. Rows with
   * a null in ANY column are excluded (complete-case, the standard
   * pairwise-consistent choice). Output: one row per unordered pair
   * `(col_a, col_b, n, corr)` with the pair ordered by the INPUT column
   * sequence; a zero-variance column yields null corr (undefined, not ±1).
   *
   * Partials are `2 + d + d(d+1)/2` longs regardless of row count; the
   * documented overflow bound is `N · (scale·max|x|)² < 2⁶³` (the
   * [[graft.expressions.MomentMatrix]] analysis — at scale 10³ and values
   * up to 10⁴, ~9·10⁴ billion rows).
   *
   * Plan shape (the wide-d discipline): the moments land in ONE aggregate
   * row as two arrays (`_s` per-column sums, `_p` upper-triangle products),
   * and the d(d−1)/2 output rows come from exploding a LITERAL pair table
   * against it — one aggregate subtree + one Generate, so at d = 64 the
   * plan is 2 nodes, not 2 016 union arms each re-deriving the aggregate
   * (analysis/optimizer cost linear in d², correctness never leaning on
   * ReusedExchange).
   */
  def correlations(
      df: DataFrame, cols: Seq[String], scale: Long = 1000L): DataFrame = {
    require(cols.size >= 2, s"correlations needs at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "duplicate columns")
    require(scale > 0, s"scale must be positive, got $scale")
    val nc = cols.size
    val base = df.where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        floor(col(c).cast("double") * scale).cast("long").as(s"_q_$c")): _*)
    // 1-based flat index of the (i, j) cross product (i <= j) within `_p`
    def tri(i: Int, j: Int): Int = i * nc - i * (i - 1) / 2 + (j - i) + 1
    val m = base.agg(
      count(lit(1)).as("_n"),
      array(cols.map(c => sum(col(s"_q_$c"))): _*).as("_s"),
      array((for { i <- cols.indices; j <- i until nc }
        yield sum(col(s"_q_${cols(i)}") * col(s"_q_${cols(j)}"))): _*).as("_p"))
    val pairTable = array((for { i <- cols.indices; j <- (i + 1) until nc } yield
      struct(
        lit(cols(i)).as("a"), lit(cols(j)).as("b"),
        lit(i + 1).as("si"), lit(j + 1).as("sj"),
        lit(tri(i, j)).as("pij"), lit(tri(i, i)).as("pii"),
        lit(tri(j, j)).as("pjj"))): _*)
    // corr = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)·(n·Syy − Sy²)). The
    // SUMS are exact integers; the derived products are computed in
    // DOUBLE (casting each exact long first) so n·Sxy can never
    // overflow a long — still a pure function of the exact sums with a
    // fixed op order, so engines agree bit-for-bit and the 4-dp round
    // holds. (Precision, not determinism, degrades in the extreme
    // huge-mean/near-zero-corr regime — center first if that matters.)
    def d(c: Column): Column = c.cast("double")
    def s(idx: Column): Column = d(element_at(col("_s"), idx))
    def p(idx: Column): Column = d(element_at(col("_p"), idx))
    val n = d(col("_n"))
    val num = n * p(col("pr.pij")) - s(col("pr.si")) * s(col("pr.sj"))
    val va = n * p(col("pr.pii")) - s(col("pr.si")) * s(col("pr.si"))
    val vb = n * p(col("pr.pjj")) - s(col("pr.sj")) * s(col("pr.sj"))
    m.select(col("_n"), col("_s"), col("_p"), explode(pairTable).as("pr"))
      .select(
        col("pr.a").as("col_a"), col("pr.b").as("col_b"), col("_n").as("n"),
        when(va > 0 && vb > 0, round(num / sqrt(va * vb), 4))
          .otherwise(lit(null).cast("double")).as("corr"))
  }

  def histogram(
      df: DataFrame, c: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"hi must exceed lo, got [$lo, $hi]")
    val w = (hi - lo) / bins
    val x = col(c).cast("double")
    df.where(x.isNotNull && x >= lo && x <= hi)
      .withColumn("bin",
        least(lit(bins - 1), floor((x - lit(lo)) / lit(w)).cast("int")))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        col("cnt"))
  }

  /**
   * Count-Min point-frequency estimates ([[graft.expressions.CmsSketch]]):
   * ONE O(d·w)-shuffle pass builds the sketch, then each key in `keys` is
   * estimated from the counter matrix with the md5-affine bucket family —
   * `est = min_i counters[i][bucket_i(key)]`, never below the true count,
   * above it by ≤ εN w.h.p. at w = ⌈e/ε⌉. The sketch rides as a one-row
   * broadcast; estimation is codegen'd built-ins (md5/conv/element_at), so
   * probing any number of keys never rescans the corpus. The scale story
   * vs `groupBy(key).count()`: the sketch pass shuffles d·w longs per
   * partition regardless of key cardinality, and `keys` is typically a
   * small probe set (rate-limit suspects, join-skew candidates), not the
   * full domain.
   */
  def cmsEstimates(
      df: DataFrame, keyCol: String, keys: DataFrame, d: Int, w: Int): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession) // cms_sketch is a graft-native fn
    val sketch = df.agg(
      call_function("cms_sketch", col(keyCol), lit(d), lit(w)).as("_sk"))
    val h = conv(substring(md5(col("item").cast("binary")), 1, 8), 16, 10).cast("long")
    val est = (0 until d).map { i =>
      val bkt = (h * lit(2L * i + 1) + lit(98765L * i + 12345L)) % lit(2147483647L) % lit(w)
      element_at(element_at(col("_sk"), i + 1), (bkt + 1).cast("int"))
    }.reduce(least(_, _))
    keys.select(col(keyCol).as("item"))
      .crossJoin(broadcast(sketch))
      .select(col("item"), est.as("est"))
  }

  /**
   * Merge per-shard Count-Min sketches WITHOUT rescanning any shard — the
   * continuous-ingest form: each ingest batch stores its own
   * `cms_sketch` matrix (a few KB), and corpus-wide point estimates come
   * from folding the stored matrices elementwise (CMS merge IS addition,
   * so merged-then-estimate ≡ sketch-of-union exactly, spec-pinned). One
   * row out; cost ∝ number of shards, independent of corpus size.
   */
  def cmsMergeAll(sketches: DataFrame, sketchCol: String): DataFrame =
    sketches.agg(
      aggregate(
        collect_list(col(sketchCol)),
        lit(null).cast(sketches.schema(sketchCol).dataType),
        (acc, x) => when(acc.isNull, x).otherwise(
          zip_with(acc, x, (ra, rb) => zip_with(ra, rb, (a, b) => a + b))))
        .as(sketchCol))

  /**
   * Equi-join OUTPUT-SIZE estimate from two Count-Min sketches — the
   * AMS-style inner-product estimator: with per-side counter matrices
   * A and B built by the SAME hash family ([[graft.expressions.CmsSketch]]),
   * row i's inner product `Σ_j A[i][j]·B[i][j]` counts every matching-key
   * pair exactly PLUS non-negative collision mass, so
   * `est = min_i Σ_j A[i][j]·B[i][j]` NEVER undercounts the true join
   * cardinality `Σ_k cnt_L(k)·cnt_R(k)` and overshoots by ≤ N_L·N_R/w per
   * row in expectation (Alon-Matias-Szegedy / Cormode-Muthukrishnan).
   *
   * This is the pre-shuffle planning question at 100 TB: BEFORE paying a
   * sort-merge shuffle of both sides, two one-pass O(d·w) sketches (built
   * map-side, merged by addition, a few KB each) bound the join's output —
   * feeding the broadcast / salt / plain-shuffle decision the same way
   * [[keySkew]] feeds the per-key occupancy one. The estimate is a pure
   * function of the two input MULTISETS (no sampling, no RNG), so the
   * DuckDB oracle replays both matrices and the min-of-inner-products
   * bit-for-bit. One row out: `est_join_rows`.
   */
  def cmsJoinSize(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      d: Int = 4, w: Int = 256): DataFrame = {
    graft.GraftExtensions.register(left.sparkSession)
    val a = left.where(col(leftKey).isNotNull)
      .agg(call_function("cms_sketch", col(leftKey).cast("string"), lit(d), lit(w)).as("_a"))
    val b = right.where(col(rightKey).isNotNull)
      .agg(call_function("cms_sketch", col(rightKey).cast("string"), lit(d), lit(w)).as("_b"))
    // counter products reach N_L·N_R per cell — long·long wraps past 2^63
    // and would break the never-undercounts bound, so the inner product
    // accumulates in decimal(38,0): (19,0)·(19,0) → (38,0) exact (each
    // counter fits a long, hence 19 digits). The final min casts back to
    // long, mirroring the oracle's HUGEINT-then-CAST-AS-BIGINT arithmetic.
    val dec = "decimal(19,0)"
    val rowIp = (0 until d).map { i =>
      aggregate(
        zip_with(
          element_at(col("_a"), i + 1), element_at(col("_b"), i + 1),
          (x, y) => x.cast(dec) * y.cast(dec)),
        lit(0).cast("decimal(38,0)"), (acc, v) => acc + v)
    }.reduce(least(_, _))
    a.crossJoin(b).select(
      coalesce(rowIp, lit(0).cast("decimal(38,0)")).cast("long").as("est_join_rows"))
  }

  /**
   * Exact equi-join output size WITHOUT materializing the join:
   * `Σ_k cnt_L(k)·cnt_R(k)` over the per-key count tables — two hash
   * aggregates plus a join of (distinct-key)-sized frames, never the
   * joined row set itself. The ground truth [[cmsJoinSize]] approximates;
   * cheap enough to run exactly when the key domains are modest, which is
   * exactly when the sketch's collision bound is loosest.
   */
  def joinSizeExact(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val a = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("_k")).agg(count(lit(1)).as("_cl"))
    val b = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("_k")).agg(count(lit(1)).as("_cr"))
    a.join(b, "_k")
      .agg(coalesce(sum(col("_cl") * col("_cr")), lit(0L)).as("exact_join_rows"))
  }

  /**
   * Per-key distribution-drift contributions between a REFERENCE slice and
   * a CURRENT slice of a categorical column — the monitoring primitive for
   * "did this ingest batch / crawl snapshot / filtered corpus shift?".
   * For each key in either slice, with `p` = key share of `ref` and `q` =
   * key share of `cur` (shares of non-null rows):
   *
   *  - `psi` — Population-Stability-Index term `(p'-q')·ln(p'/q')` with
   *    both shares floored at `eps` (the standard guard that keeps a key
   *    present on only one side finite); Σ psi ≥ 0, with the usual
   *    industry reading ≲0.1 stable / ≳0.25 shifted.
   *  - `jsd` — Jensen-Shannon term `½·[p·ln(p/m) + q·ln(q/m)]`,
   *    `m = (p+q)/2`, `0·ln0 = 0`; Σ jsd ∈ [0, ln 2], symmetric, finite
   *    without smoothing.
   *
   * Shape at scale: one `groupBy(key).count` per side (map-side partial),
   * a full-outer join of the two (distinct-key)-sized count tables, and
   * two one-row totals broadcast in — the corpus itself is scanned once
   * per side and never shuffled by row. Pure count arithmetic + `ln`, so
   * the oracle replays it exactly (contributions rounded at the query
   * layer, never here — [[drift]] sums the unrounded terms).
   */
  def driftByKey(
      ref: DataFrame, cur: DataFrame, keyCol: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1e-2, s"eps must be in (0, 0.01), got $eps")
    // materialized (the Events.retention discipline): each count table
    // feeds BOTH its broadcast total and the join — without the cut the
    // corpus scan behind it runs twice
    val r = ref.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("ref_cnt"))
      .localCheckpoint()
    val c = cur.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cur_cnt"))
      .localCheckpoint()
    driftByKeyFromCounts(r, c, eps)
  }

  /**
   * [[driftByKey]] over PRE-AGGREGATED count tables
   * (`(key, ref_cnt)` / `(key, cur_cnt)`) — the form a monitor that holds
   * a fixed reference distribution calls per batch
   * ([[graft.streaming.DriftStream]]): the reference is counted ONCE at
   * construction, never re-aggregated per micro-batch.
   */
  def driftByKeyFromCounts(
      r: DataFrame, c: DataFrame, eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1e-2, s"eps must be in (0, 0.01), got $eps")
    val rt = r.agg(sum("ref_cnt").as("_rt"))
    val ct = c.agg(sum("cur_cnt").as("_ct"))
    val joined = r.join(c, Seq("key"), "full_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .crossJoin(broadcast(rt)).crossJoin(broadcast(ct))
    // an EMPTY side (no rows, or all-null keys → null total) is the
    // degenerate all-mass-elsewhere distribution: its shares are 0.0
    // everywhere, so every surviving key scores the maximal eps-floored
    // PSI term instead of poisoning the sums with nulls/NaNs
    val p = when(col("_rt").isNotNull && col("_rt") > 0,
      col("ref_cnt").cast("double") / col("_rt").cast("double")).otherwise(lit(0.0))
    val q = when(col("_ct").isNotNull && col("_ct") > 0,
      col("cur_cnt").cast("double") / col("_ct").cast("double")).otherwise(lit(0.0))
    val pS = greatest(p, lit(eps))
    val qS = greatest(q, lit(eps))
    val m = (p + q) / lit(2.0)
    val jsd =
      (when(p > 0, p * log(p / m)).otherwise(lit(0.0)) +
        when(q > 0, q * log(q / m)).otherwise(lit(0.0))) / lit(2.0)
    joined.select(
      col("key"), col("ref_cnt"), col("cur_cnt"),
      ((pS - qS) * log(pS / qS)).as("psi"),
      jsd.as("jsd"))
  }

  /** Corpus-level drift summary: key counts per side plus the summed PSI
    * and Jensen-Shannon divergence over [[driftByKey]]'s unrounded
    * contributions. One row. */
  def drift(
      ref: DataFrame, cur: DataFrame, keyCol: String,
      eps: Double = 1e-6): DataFrame =
    driftByKey(ref, cur, keyCol, eps).agg(
      count(when(col("ref_cnt") > 0, 1)).as("n_keys_ref"),
      count(when(col("cur_cnt") > 0, 1)).as("n_keys_cur"),
      count(lit(1)).as("n_keys_union"),
      sum("psi").as("psi"),
      sum("jsd").as("jsd"))

  /**
   * NUMERIC drift — [[driftByKey]] for continuous columns (amounts,
   * latencies, perplexities), the round-10 gap: the column is binned by
   * the SAME DD log-bucket assignment the quantile ledger uses
   * ([[ddBucket]] — one bucket math; every bucket spans an α-relative
   * value range, so bins are meaningfully comparable across corpora of
   * any magnitude, unlike fixed-width bins) and the per-bucket counts
   * score through THE categorical drift arithmetic
   * ([[driftByKeyFromCounts]]) — binned PSI over log-space buckets, the
   * standard continuous-PSI recipe. One row per occupied bucket:
   * `(bucket, bucket_mid, ref_cnt, cur_cnt, psi, jsd)` with `bucket_mid`
   * the α-accurate bucket value ([[ddBucketMid]]). Non-positive/null
   * values are out of domain (shift them first, or monitor their rate via
   * [[Validate.constraintReport]]).
   *
   * Scale shape: unchanged from the categorical path — one bucket-count
   * aggregate per side (≈10³ buckets however big the corpus), a
   * full-outer join of the two bucket tables, broadcast totals. And
   * because the bucket tables ARE [[ddHistogram]] frames, a deployment
   * already maintaining a DD ledger ([[SketchLedger]]) scores drift from
   * the ledger fold without touching either corpus.
   */
  def driftNumericByBucket(
      ref: DataFrame, cur: DataFrame, c: String,
      alpha: Double = 0.01, eps: Double = 1e-6): DataFrame = {
    val r = ddHistogram(ref, c, alpha)
      .select(col("bucket").as("key"), col("cnt").as("ref_cnt")).localCheckpoint()
    val cc = ddHistogram(cur, c, alpha)
      .select(col("bucket").as("key"), col("cnt").as("cur_cnt")).localCheckpoint()
    driftNumericFromHistograms(r, cc, alpha, eps)
  }

  /** [[driftNumericByBucket]] over PRE-BUCKETED `(key, ref_cnt)` /
    * `(key, cur_cnt)` DD-histogram frames — the ledger-fold and
    * streaming-monitor entry point (reference binned once, never per
    * batch). */
  def driftNumericFromHistograms(
      r: DataFrame, c: DataFrame, alpha: Double = 0.01,
      eps: Double = 1e-6): DataFrame =
    driftByKeyFromCounts(r, c, eps)
      .select(
        col("key").as("bucket"),
        ddBucketMid(col("key"), alpha).as("bucket_mid"),
        col("ref_cnt"), col("cur_cnt"), col("psi"), col("jsd"))

  /** One-row numeric-drift summary (the [[drift]] shape over
    * [[driftNumericByBucket]]'s unrounded contributions):
    * `(n_buckets_ref, n_buckets_cur, n_buckets_union, psi, jsd)`. */
  def driftNumeric(
      ref: DataFrame, cur: DataFrame, c: String,
      alpha: Double = 0.01, eps: Double = 1e-6): DataFrame =
    driftNumericByBucket(ref, cur, c, alpha, eps).agg(
      count(when(col("ref_cnt") > 0, 1)).as("n_buckets_ref"),
      count(when(col("cur_cnt") > 0, 1)).as("n_buckets_cur"),
      count(lit(1)).as("n_buckets_union"),
      sum("psi").as("psi"),
      sum("jsd").as("jsd"))

  /**
   * Key-occupancy skew profile — the pre-flight diagnostic behind the
   * [[Scale]] decisions: whether a join/aggregation key needs salting
   * (`max_cnt`/`p99_cnt` ≫ `p50_cnt`), what salt factor bounds the hot
   * key, and whether bucketing would balance. One row: distinct keys, row
   * count, and the max / median / p99 per-key occupancy. Two hash
   * aggregates, the second over one row per distinct key — at 100 TB this
   * is the cheap question to ask BEFORE a skewed shuffle wedges the job,
   * not after.
   */
  def keySkew(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"),
        expr("percentile(cnt, 0.5)").as("p50_cnt"),
        expr("percentile(cnt, 0.99)").as("p99_cnt"))

  /**
   * Per-shard HyperLogLog distinct-count ledger — the cardinality twin of
   * the Count-Min ledger ([[cmsMergeAll]]): each ingest batch/shard stores
   * ONE Datasketches HLL sketch (a few KB binary, Spark's native
   * `hll_sketch_agg`), and corpus-wide distinct counts come from folding
   * the stored sketches (`hll_union_agg`) — cost ∝ shards, the corpus is
   * NEVER rescanned. Union-then-estimate equals sketch-of-union exactly
   * (the sketch is a pure function of the observed hash set; spec-pinned),
   * so incremental maintenance is lossless. Estimates are
   * library-specific, hence spec-bounded against exact counts rather than
   * oracle-hashed (same stance as [[profileApprox]]).
   */
  def hllShardSketch(df: DataFrame, keyCol: String, lgK: Int = 12): DataFrame =
    df.where(col(keyCol).isNotNull)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("hll"))

  /** Fold stored shard sketches and estimate the union's cardinality. */
  def hllMergedEstimate(sketches: DataFrame, sketchCol: String): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(true)))
        .as("n_distinct_est"))

  /**
   * DDSketch-style log-bucket histogram of a POSITIVE column: bucket
   * `⌊ln(x)/ln(γ)⌋` with `γ = (1+α)/(1−α)`, so every value in a bucket is
   * within RELATIVE error `α` of the bucket's midpoint estimate
   * `2γ^(b+1)/(γ+1)` (floor-indexed buckets cover [γ^b, γ^(b+1))). Unlike rank-error sketches (GK/KLL — merge-order
   * dependent, engine-specific), this structure is a plain (bucket, count)
   * table: MERGE IS ADDITION (shard histograms fold losslessly, the
   * [[cmsMergeAll]]/[[hllShardSketch]] ledger discipline), the content is
   * a pure function of the input multiset, and the oracle replays it.
   * Memory is O(ln(max/min)/ln γ) buckets — ~1400 buckets span 9 decades
   * at α=1% — regardless of corpus size. Non-positive and null values are
   * excluded (DDSketch's domain; count them via [[Validate.constraintReport]]
   * if the contract forbids them).
   */
  /** THE DD bucket assignment, as a column: `⌊ln(x)/ln(γ)⌋` with
    * `γ = (1+α)/(1−α)` — shared by the histogram/quantile family and the
    * numeric drift path (one bucket math, never two). Non-positive and
    * null inputs map to NULL (Spark's `log` domain), which every consumer
    * filters. */
  def ddBucket(x: Column, alpha: Double): Column = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val gamma = (1 + alpha) / (1 - alpha)
    floor(log(x.cast("double")) / lit(math.log(gamma))).cast("long")
  }

  /** Midpoint VALUE estimate of DD bucket `b`: `2γ^(b+1)/(γ+1)`, within
    * relative error α of every value the bucket holds; 6-dp rounded (the
    * [[ddQuantiles]] convention — IEEE-reproducible, oracle-hashable). */
  def ddBucketMid(b: Column, alpha: Double): Column = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val gamma = (1 + alpha) / (1 - alpha)
    round(lit(2.0) * pow(lit(gamma), b + 1) / lit(gamma + 1), 6)
  }

  def ddHistogram(df: DataFrame, c: String, alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val x = col(c).cast("double")
    df.where(x.isNotNull && x > 0)
      .select(ddBucket(x, alpha).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /**
   * Quantile estimates from a [[ddHistogram]] (or a fold of shard
   * histograms): for each `p`, the midpoint estimate of the bucket holding
   * the `⌊p·(n−1)⌋`-th value (0-indexed) — guaranteed within relative
   * error `α` of the true quantile VALUE. The histogram is bucket-count
   * sized, so the cumulative walk is a window over ~10³ rows; output one
   * row per probability: `(p, n, est)` with `est` rounded to 6 dp (the
   * γ-power arithmetic is IEEE-reproducible; rounding absorbs the last
   * ulp for the oracle hash).
   */
  def ddQuantiles(
      hist: DataFrame, alpha: Double, probs: Seq[Double]): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be non-empty, each in [0, 1]: $probs")
    val gamma = (1 + alpha) / (1 - alpha)
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("_cum", sum("cnt").over(w))
      .crossJoin(broadcast(hist.agg(sum("cnt").as("_n"))))
    val ps = posexplode(typedlit(probs))
    cum.select(col("bucket"), col("_cum"), col("_n"))
      .select(col("bucket"), col("_cum"), col("_n"), ps.as(Seq("_i", "p")))
      .where(col("_cum") > floor(col("p") * (col("_n") - 1)))
      .groupBy("p").agg(
        min("bucket").as("_b"),
        max("_n").as("n"))
      .select(col("p"), col("n"),
        round(lit(2.0) * pow(lit(gamma), col("_b") + 1) / lit(gamma + 1), 6).as("est"))
  }

  /** Per-GROUP [[ddHistogram]]: `(grp, bucket, cnt)` — the grouped tier
    * of the mergeable-quantile ledger. Memory per group is the bucket
    * span, never the value multiset, which is what lets a hot group hold
    * billions of rows without an exact-percentile buffer explosion. */
  def ddHistogramByGroup(
      df: DataFrame, groupCol: String, c: String, alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val x = col(c).cast("double")
    df.where(x.isNotNull && x > 0 && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), ddBucket(x, alpha).as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile estimates from a [[ddHistogramByGroup]] — same
    * α-relative-value guarantee, the cumulative walk now a window
    * PARTITIONED by group (never a global sort). One row per
    * (group, probability): `(grp, p, n, est)`. */
  def ddQuantilesByGroup(
      hist: DataFrame, alpha: Double, probs: Seq[Double]): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be non-empty, each in [0, 1]: $probs")
    val gamma = (1 + alpha) / (1 - alpha)
    val w = Window.partitionBy("grp").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("grp")
    val cum = hist
      .withColumn("_cum", sum("cnt").over(w))
      .withColumn("_n", sum("cnt").over(wTot))
    cum
      .select(col("grp"), col("bucket"), col("_cum"), col("_n"),
        posexplode(typedlit(probs)).as(Seq("_i", "p")))
      .where(col("_cum") > floor(col("p") * (col("_n") - 1)))
      .groupBy("grp", "p").agg(
        min("bucket").as("_b"),
        max("_n").as("n"))
      .select(col("grp"), col("p"), col("n"),
        round(lit(2.0) * pow(lit(gamma), col("_b") + 1) / lit(gamma + 1), 6).as("est"))
  }

  /**
   * Quantile estimation over a FIXED-SIZE deterministic sample — the
   * 100 TB complement to the exact `percentile` aggregate: take the `k`
   * rows with the smallest salted id hash (a uniform without-replacement
   * sample that is a pure function of (ids, salt) — rerun-, partition-
   * and engine-stable, unlike `TABLESAMPLE`/`rand()`), then exact
   * interpolated quantiles of the sample. Rank error is the classic
   * bottom-k bound O(1/√k); k = 10⁴ gives ~1% rank accuracy for ANY
   * corpus size.
   *
   * Shape: the bottom-k is a `TakeOrderedAndProject` (per-partition heads
   * merged on the driver — no shuffle, no global sort), the quantile a
   * one-row aggregate over k rows. Contrast `percentile` over the full
   * column, whose buffer holds every distinct value, and
   * `approx_percentile`, whose GK sketch is engine-specific: this
   * estimator is exactly replayable in the oracle. Output one row per
   * requested probability: `(n_sampled, p, value)`.
   */
  def hashSampleQuantiles(
      df: DataFrame, idCol: String, c: String, k: Int,
      probs: Seq[Double], salt: String = ""): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be non-empty, each in [0, 1]: $probs")
    val h = TextOps.hash32(concat(lit(s"qsample:$salt:"), col(idCol).cast("string")))
    val sample = df.where(col(c).isNotNull)
      .select(col(idCol).as("_id"), col(c).cast("double").as("_x"), h.as("_h"))
      .orderBy(col("_h").asc, col("_id").asc)
      .limit(k)
    sample
      .agg(
        count(lit(1)).as("n_sampled"),
        expr(s"percentile(_x, array(${probs.mkString(", ")}))").as("_qs"))
      .select(col("n_sampled"), posexplode(col("_qs")).as(Seq("_i", "value")))
      .select(
        col("n_sampled"),
        element_at(typedlit(probs), col("_i").cast("int") + 1).as("p"),
        col("value"))
  }

  /**
   * Robust (median/MAD) outlier filter: keeps the rows whose `c` deviates
   * from the column median by more than `k` times the median absolute
   * deviation — the outlier test that, unlike mean/stddev z-scores, is not
   * itself dragged by the outliers it is hunting (50% breakdown point).
   *
   * Two tiny quantile aggregates (median, then MAD over the deviations —
   * the second NEEDS the first, so two passes is the true data dependency),
   * each one driver-bounded row whose value is embedded as a plan-time
   * literal; the final pass is a codegen'd filter over the unshuffled
   * corpus. Exactness across engines: interpolated medians match
   * `quantile_cont`, and subtract/abs/one multiply/compare are
   * IEEE-identical — no stddev float summation anywhere.
   */
  def madOutliers(df: DataFrame, c: String, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val x = col(c).cast("double")
    val nn = df.where(x.isNotNull)
    // alias before percentile() so arbitrary column names never splice
    // into the SQL expression (same discipline as equiDepthHistogram)
    val medRow = nn.select(x.as("_x")).agg(expr("percentile(_x, 0.5)")).head()
    if (medRow.isNullAt(0)) return nn // all-null / empty input: nothing to flag
    val med = medRow.getDouble(0)
    val mad = nn.select(abs(x - lit(med)).as("_d"))
      .agg(expr("percentile(_d, 0.5)")).head().getDouble(0)
    nn.where(abs(x - lit(med)) > lit(k) * lit(mad))
  }

  /**
   * Equi-depth (quantile) histogram: `bins` buckets holding approximately
   * equal row counts, with edges at the column's exact interpolated
   * `k/bins` quantiles — the bucketing that stays informative on skewed
   * distributions where fixed-width bins collapse into one hot bucket.
   * Returns `(bin, cnt, x_min, x_max)` per non-empty bucket; a value equal
   * to an edge goes to the LOWER bucket (`edge < x`, half-open buckets).
   *
   * Two jobs by design: the quantile aggregate first (ONE tiny row —
   * `bins-1` doubles, driver-bounded), whose edges are then embedded as
   * PLAN-TIME literals so the binning pass is a codegen'd comparison chain
   * — no interpreted array lambda, no per-row join against an edge table.
   * An unpartitioned `ntile` window would compute the same thing through a
   * single global sort task; this shape never sorts and never shuffles
   * more than the final `bins`-row aggregate. Spark's `percentile`
   * interpolation matches DuckDB's `quantile_cont` exactly on 2-dp input.
   */
  /**
   * Calibration (reliability-diagram) report for ANY scorer whose score
   * claims to be a probability: rows bucketed by `floor(score·bins)`
   * (top bucket closed), per bucket the volume, positive count, and the
   * 6-dp-rounded mean score — `n_pos/n` vs `mean_score` per row IS the
   * reliability curve, and the gap is the calibration error the operator
   * reads before trusting a threshold gate. The generic face of
   * [[TextOps.nbMarginReliability]]: that one buckets an engine-exact NB
   * margin; this one takes any `(score ∈ [0,1], label)` pair — a quality
   * classifier, a fuzzy-match confidence, an external model's export.
   *
   * One partial-aggregatable pass; bucketing is IEEE multiply+floor
   * (engine-exact, no libm), and the mean sums 4-dp-QUANTIZED integer
   * score units — a raw double sum is order-nondeterministic across
   * engines and would hang the oracle hash on reduction order, the same
   * reason money sums integer cents everywhere here. Null scores/labels
   * are excluded (not scored ≠ scored 0).
   */
  def calibrationReport(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    // scores outside [0,1] fail LOUD (raise_error is codegen'd — no extra
    // pass): silently clamping them into the edge buckets would skew the
    // reliability curve for exactly the miscalibrated/buggy scorer export
    // this report exists to catch
    val score = when(col(scoreCol) < 0 || col(scoreCol) > 1,
      raise_error(concat(
        lit(s"calibrationReport: $scoreCol outside [0, 1]: "),
        col(scoreCol).cast("string"))).cast("double"))
      .otherwise(col(scoreCol))
    df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(score * bins), lit(bins - 1)).cast("long").as("bucket"),
        round(score * 10000).cast("long").as("_s4"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("_pos"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(col("_pos")).as("n_pos"),
        round(sum(col("_s4")) / (count(lit(1)) * lit(10000.0)), 6)
          .as("mean_score"))
  }

  def equiDepthHistogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val nn = df.where(col(c).isNotNull).select(col(c).cast("double").as("_x"))
    val ps = (1 until bins).map(k => k.toDouble / bins)
    val edgeRow = nn
      .agg(expr(s"percentile(_x, array(${ps.mkString(", ")}))").as("e"))
      .head()
    if (edgeRow.isNullAt(0)) { // all-null / empty input: empty histogram
      return nn.withColumn("bin", lit(0))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"), min(col("_x")).as("x_min"), max(col("_x")).as("x_max"))
    }
    val edges = edgeRow.getSeq[Double](0)
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("_x") > lit(e), 1).otherwise(0)
    }
    nn.withColumn("bin", bin.cast("int"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("cnt"),
        min(col("_x")).as("x_min"),
        max(col("_x")).as("x_max"))
  }
}
