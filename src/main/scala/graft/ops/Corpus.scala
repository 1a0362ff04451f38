package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus curation: deterministic sampling and dataset splitting.
 *
 * Both are hash-based (md5-derived, [[TextOps.hash32]]) rather than
 * RNG-based: the same row lands in the same sample/split on every run, on
 * any engine, at any parallelism — which is what makes training-data builds
 * reproducible and incremental (a re-run over 100 TB + 1 new shard keeps
 * every previously-sampled document stable). `spark.sample()` by contrast is
 * seed+partition dependent.
 */
object Corpus {

  /**
   * Uniform bucket in [0, 10000) from a domain-salted id hash.
   *
   * The `domain` prefix decorrelates operators that compose: sampling and
   * splitting must be independent events per document, but with one shared
   * unsalted hash a `rate ≤ train` sample of a split corpus would yield ONLY
   * "train" rows (the two predicates read the same bucket), and a nested
   * sample would select `min(r1, r2)` instead of `r1 · r2`. The `salt` makes
   * repeated applications of the SAME operator independent too (two salted
   * sub-samples of a corpus don't overlap more than by chance).
   */
  def hashBucket(domain: String, salt: String, id: Column): Column =
    TextOps.hash32(concat(lit(s"$domain:$salt:"), id.cast("string"))) % 10000

  /** Bucket threshold for a rate: rounded, not truncated — `(0.57 · 10⁴)`
    * is 5699.999… in binary and truncation would silently drop the last
    * bucket of the documented 10^-4 resolution. */
  private def buckets(rate: Double): Int = math.round(rate * 10000).toInt

  /**
   * Deterministic `rate` sample (rate in [0,1], 10^-4 resolution). Same-salt
   * samples at increasing rates are nested (`rate 0.1 ⊆ rate 0.2` — stable
   * incremental growth); different salts are independent.
   */
  def sampleDeterministic(
      df: DataFrame, idCol: String, rate: Double, salt: String = ""): DataFrame =
    df.where(hashBucket("sample", salt, col(idCol)) < buckets(rate))

  /**
   * Deterministic weighted sampling WITHOUT replacement, inclusion
   * probability proportional to `weightCol` — Efraimidis-Spirakis A-ES:
   * each row draws a uniform `u` from its salted id hash and is ranked by
   * `priority = ln(u) / weight` (the log form of `u^(1/w)`; larger weight
   * pulls the negative priority toward 0), and the global top-`k`
   * priorities win. The quality-weighted subsample of corpus curation
   * ("sample 1M documents proportional to quality score") with the same
   * reproducibility contract as [[sampleDeterministic]]: the draw is a
   * pure function of (id, salt), so reruns and engines agree, and
   * different salts give independent samples.
   *
   * Rows with null/non-positive weight are excluded (a zero weight has
   * zero inclusion probability; A-ES divides by it). The priority is
   * rounded to 8 dp with an id tie-break so a 1-ulp cross-engine `ln`
   * discrepancy can never reorder the selection boundary. Top-k is a
   * `TakeOrdered` (per-partition heads merged on the driver), never a
   * global sort — the 100 TB shape.
   */
  def sampleWeighted(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = TextOps.hash32(concat(lit(s"wsample:$salt:"), col(idCol).cast("string")))
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.where(col(weightCol).isNotNull && col(weightCol).cast("double") > 0)
      .withColumn("priority", round(log(u) / col(weightCol).cast("double"), 8))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Deterministic train/validation/test split label from the id hash:
   * buckets [0, train·10⁴) → "train", then validation, remainder → "test".
   * Domain-separated from [[sampleDeterministic]]: splitting a sampled
   * corpus gives every label its expected share.
   */
  def splitLabel(id: Column, train: Double = 0.8, validation: Double = 0.1,
                 salt: String = ""): Column = {
    val b = hashBucket("split", salt, id)
    when(b < buckets(train), "train")
      .when(b < buckets(train + validation), "validation")
      .otherwise("test")
  }

  /** Attaches the split label as a `split` column. */
  def withSplit(df: DataFrame, idCol: String,
                train: Double = 0.8, validation: Double = 0.1,
                salt: String = ""): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), train, validation, salt))

  /**
   * Cross-split duplicate-contamination audit: hash splitting assigns by
   * ID, so two documents with IDENTICAL content routinely land on opposite
   * sides of a train/test cut — exactly the leakage that inflates held-out
   * eval (Lee et al. 2022 measure ~1% of benchmark eval data duplicated in
   * training sets). Returns, per ordered split pair, the number of
   * duplicate content groups spanning the pair and the total leaked pairs
   * (`Σ n_a · n_b` over shared fingerprints).
   *
   * Exact-content tier (normalized [[TextOps.fingerprint]]); near-dup
   * leakage composes the same shape over [[graft.ops.Dedup]]'s minhash
   * signatures. One exchange of per-(fingerprint, split) counts; the
   * self-join fans out at most `splits²` rows per fingerprint, never
   * document pairs.
   */
  /**
   * The NEAR-DUP tier of the leakage audit — the leak that actually
   * survives exact dedup: takes ANY duplicate-pair frame `(id_a, id_b)`
   * (simhash/minhash/embedding near-dup pairs — whatever generator fits
   * the corpus) and counts the pairs straddling a split boundary, per
   * ordered split pair. `labeled` is the `(idCol, split)` relation (from
   * [[withSplit]]). Two id-keyed equi-joins over the pair mass — the
   * generator's cost dominates, the audit itself is join-light.
   */
  def splitLeakageFromPairs(
      pairs: DataFrame, labeled: DataFrame, idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    val lab = labeled.select(col(idCol), col(splitCol))
    pairs
      .join(lab.select(col(idCol).as("id_a"), col(splitCol).as("_sa")), Seq("id_a"))
      .join(lab.select(col(idCol).as("id_b"), col(splitCol).as("_sb")), Seq("id_b"))
      .where(col("_sa") =!= col("_sb"))
      .select(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("leaked_pairs"))
  }

  /**
   * Leakage-SAFE split — fixes at assignment time what
   * [[splitLeakageFromPairs]] can only measure: the split hash runs on
   * each document's DUPLICATE-CLUSTER representative (the component
   * minimum from [[Dedup.clusters]] over any pair frame — exact groups,
   * verified minhash/simhash pairs, SemDeDup pairs), so duplicated or
   * near-duplicated content lands on ONE side of every cut by
   * construction. Documents in no pair represent themselves, and the
   * hash domain is [[splitLabel]]'s — a pair-free corpus splits
   * IDENTICALLY to [[withSplit]]. Cost: the pair generator dominates;
   * the assignment adds the closure over the pair mass plus one
   * id-keyed left join.
   *
   * Share caveat, stated plainly: splits are sized by CLUSTER count, not
   * document count — a corpus whose duplicate clusters are huge will see
   * per-split document shares drift from the requested fractions (the
   * price of the guarantee; dedup first if that matters).
   */
  def withSplitLeakageSafe(
      df: DataFrame, idCol: String, pairs: DataFrame,
      train: Double = 0.8, validation: Double = 0.1,
      salt: String = ""): DataFrame = {
    // clustersAuto, not plain clusters: min-label propagation caps its
    // iterations and FAILS on a duplicate component with diameter > cap
    // (long near-dup chains from incremental crawl shards are exactly how
    // that happens in production); the auto router falls back to the
    // O(log n)-round star contraction, so no pair topology can wedge a
    // split assignment
    val labels = graft.ops.Dedup.clustersAuto(pairs)
      .select(col("id").as(idCol), col("cluster").as("_rep"))
    df.join(labels, Seq(idCol), "left")
      .withColumn("split",
        splitLabel(coalesce(col("_rep"), col(idCol)), train, validation, salt))
      .drop("_rep")
  }

  def splitLeakageAudit(
      df: DataFrame, idCol: String, textCol: String,
      train: Double = 0.8, validation: Double = 0.1,
      salt: String = ""): DataFrame = {
    val counts = withSplit(df, idCol, train, validation, salt)
      .where(col(textCol).isNotNull)
      .select(TextOps.fingerprint(col(textCol)).as("fp"), col("split"))
      .groupBy("fp", "split").agg(count(lit(1)).as("n"))
    counts.as("a").join(counts.as("b"),
        col("a.fp") === col("b.fp") && col("a.split") < col("b.split"))
      .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("dup_groups"),
        sum(col("a.n") * col("b.n")).as("leaked_pairs"))
  }

  /**
   * Crawl-exclusion URL filter — the blocklist stage every web pipeline
   * runs before fetch-side processing: drops documents whose URL host is
   * on the blocklist (broadcast anti-join — a blocklist is list-sized,
   * never corpus-sized) and, optionally, whose PATH matches a drop
   * pattern (RE2-class regex — spam/calendar/faceted-nav path shapes).
   * Host and path extract with [[TextOps.canonicalizeUrl]]'s own anchored
   * regexes (host lowercased), so the filter agrees with the dedup key's
   * view of the URL. Documents with a null URL pass through — this
   * filter rejects KNOWN-bad addresses, absence of one is a different
   * policy (filter upstream if null means reject).
   *
   * `matchRegistrable = true` keys the anti-join on the eTLD+1
   * registrable domain ([[TextOps.registrableDomain]], both sides) so
   * subdomain sharding cannot evade the list; requires
   * [[graft.GraftExtensions.register]].
   *
   * Over-blocking note: registrable-domain matching is only as good as
   * the PSL snapshot's PRIVATE-section coverage. The bundled
   * [[graft.model.PublicSuffix]] is the FULL upstream list (ICANN +
   * private sections, 7.9k multi-label rules), so listed hosting
   * platforms (`github.io`, `blogspot.*`, …) key each tenant as its own
   * registrable domain. A platform the upstream list itself doesn't
   * carry still collapses all tenants to the platform apex — one listed
   * tenant then anti-joins away every innocent tenant — which is
   * inherent to eTLD+1 keying, not to the snapshot; refresh the snapshot
   * periodically (`tools/gen_public_suffix.py` over a current
   * `public_suffix_list.dat`) to track newly-registered platforms.
   */
  def filterBlockedUrls(
      df: DataFrame, urlCol: String, blockedHosts: DataFrame,
      dropPathPattern: Option[String] = None,
      matchRegistrable: Boolean = false): DataFrame = {
    val rawHost = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    // eTLD+1 mode: BOTH sides map through the registrable domain, so a
    // blocklist entry `spam.co.uk` (or any host under it) rejects every
    // subdomain shard `a{1..n}.spam.co.uk` — the evasion the full-hostname
    // key documented as open. Hosts with NO registrable domain (the PSL
    // null cases) fall back to the full hostname, so an anti-join key is
    // never silently null (null keys would pass every blocklist).
    val host =
      if (matchRegistrable)
        coalesce(TextOps.registrableDomain(rawHost), rawHost)
      else rawHost
    val blockKey =
      if (matchRegistrable)
        coalesce(TextOps.registrableDomain(lower(col("host"))), lower(col("host")))
      else lower(col("host"))
    val path = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val kept = df.withColumn("_host", host)
      .join(broadcast(blockedHosts.select(blockKey.as("_host"))),
        Seq("_host"), "left_anti")
      .drop("_host")
    dropPathPattern.fold(kept)(p =>
      kept.where(col(urlCol).isNull || !path.rlike(p)))
  }

  /**
   * Domain-weighted corpus mixing: per-group deterministic sampling rates
   * (e.g. keep 50% of a high-quality source, 5% of a crawl) — the standard
   * way a pretraining mix is rebalanced without materializing per-source
   * intermediate corpora. Thresholds are computed at PLAN time in integer
   * buckets (`round(rate·10⁴)`), so Spark and any oracle agree exactly and
   * no per-row float→int cast semantics are involved. Same hash domain as
   * [[sampleDeterministic]]: mixing then up-rating a source keeps previously
   * selected documents selected.
   */
  def sampleByGroup(
      df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(buckets(defaultRate))) {
      case (acc, (k, v)) => when(col(groupCol) === k, lit(buckets(v))).otherwise(acc)
    }
    df.where(hashBucket("sample", salt, col(idCol)) < threshold)
  }

  /**
   * Temperature-based mixture rates (the multilingual-pretraining
   * rebalancer, Conneau & Lample 2019): with group shares `p_g = n_g/N`,
   * the target mix is `q_g ∝ p_g^(1/T)` — `T = 1` keeps the natural mix,
   * `T → ∞` approaches uniform, `T < 1` sharpens toward the head. The
   * per-group KEEP RATE that realizes the target by downsampling only is
   * `r_g ∝ p_g^(1/T − 1)` normalized so the most-upweighted group keeps
   * rate 1.0 (no group is ever oversampled — the standard trade).
   * Returns `(groupCol, n_rows, share, rate)` — one row per group,
   * rate rounded to 6 dp (the plan-time threshold contract of
   * [[sampleByGroup]]).
   */
  def temperatureRates(
      df: DataFrame, groupCol: String, temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val grp = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val tot = grp.agg(sum(col("n_rows")).as("_tn"))
    val raw = grp.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"),
        (col("n_rows").cast("double") / col("_tn").cast("double")).as("share"),
        pow(col("n_rows").cast("double") / col("_tn").cast("double"),
          lit(1.0 / temperature - 1.0)).as("_w"))
    val mx = raw.agg(max(col("_w")).as("_mw"))
    raw.crossJoin(broadcast(mx))
      .select(col(groupCol), col("n_rows"), round(col("share"), 6).as("share"),
        round(col("_w") / col("_mw"), 6).as("rate"))
  }

  /**
   * Apply a temperature mix in one shot: [[temperatureRates]] joined back
   * (broadcast — the rates frame is group-count-sized) and the same
   * integer-bucket hash filter as [[sampleByGroup]], so the selection is
   * deterministic, incremental-stable, and exactly replayable. The kept
   * corpus follows `p^(1/T)` up to the 10⁻⁴ bucket quantization.
   */
  def sampleByTemperature(
      df: DataFrame, idCol: String, groupCol: String, temperature: Double,
      salt: String = ""): DataFrame = {
    val rates = temperatureRates(df, groupCol, temperature)
      .select(col(groupCol), round(col("rate") * 10000).cast("long").as("_thr"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(hashBucket("sample", salt, col(idCol)) < col("_thr"))
      .drop("_thr")
  }

  /**
   * Temperature-based UPSAMPLING rates — the repetition complement of
   * [[temperatureRates]]: the same `q_g ∝ p_g^(1/T)` target realized by
   * REPEATING tail groups instead of dropping head rows (the
   * data-constrained regime, where every document is needed and the mix is
   * rebalanced by epochs — LLaMA's per-source epoch counts; Muennighoff
   * et al. 2023 bound useful repetition at ~4 epochs, the `maxEpochs`
   * default). Per-group epoch factor `f_g ∝ p_g^(1/T − 1)` normalized so
   * the LARGEST group trains exactly once (`f = 1.0` — no row is ever
   * dropped), capped at `maxEpochs`, rounded to 6 dp (the same plan-time
   * contract as [[temperatureRates]]). Returns
   * `(groupCol, n_rows, share, epochs)`.
   */
  def epochRates(
      df: DataFrame, groupCol: String, temperature: Double,
      maxEpochs: Double = 4.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val grp = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val tot = grp.agg(sum(col("n_rows")).as("_tn"))
    val raw = grp.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"),
        (col("n_rows").cast("double") / col("_tn").cast("double")).as("share"),
        pow(col("n_rows").cast("double") / col("_tn").cast("double"),
          lit(1.0 / temperature - 1.0)).as("_w"))
    val mn = raw.agg(min(col("_w")).as("_mw"))
    raw.crossJoin(broadcast(mn))
      .select(col(groupCol), col("n_rows"), round(col("share"), 6).as("share"),
        least(round(col("_w") / col("_mw"), 6), lit(maxEpochs)).as("epochs"))
  }

  /**
   * Apply an epoch mix by deterministic repetition: every row is kept
   * `floor(f_g)` times, plus one extra copy for the hash-selected
   * `frac(f_g)` share of the group — so each group's total output mass is
   * `n_g · f_g` up to the 10⁻⁴ bucket quantization, and since `f_g ≥ 1` by
   * construction NO row is ever dropped. Copies are distinguished by an
   * `epoch` column (0-based) so a downstream [[withShuffleOrder]] on
   * `(idCol, epoch)` spreads repetitions across the training order instead
   * of clustering them. One broadcast join + a row-local generator — the
   * output exchange-free regardless of corpus size; output mass is bounded
   * by `maxEpochs ·` input mass.
   */
  def sampleWithRepetition(
      df: DataFrame, idCol: String, groupCol: String, temperature: Double,
      maxEpochs: Double = 4.0, salt: String = ""): DataFrame = {
    require(!df.columns.contains("epoch"),
      "sampleWithRepetition writes a reserved 'epoch' column, but the input already has one")
    val rates = epochRates(df, groupCol, temperature, maxEpochs)
      .select(col(groupCol),
        floor(col("epochs")).cast("long").as("_full"),
        round((col("epochs") - floor(col("epochs"))) * 10000).cast("long").as("_thr"))
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("_copies",
        col("_full") + when(
          hashBucket("epoch", salt, col(idCol)) < col("_thr"), 1L).otherwise(0L))
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_full", "_thr", "_copies")
  }

  /**
   * EXACT-count per-group sampling: precisely `n` rows per group (fewer if
   * the group is smaller), picked deterministically by ordering the group on
   * a salted id hash — an unbiased draw that is stable across runs, engines,
   * and parallelism. The eval-set construction primitive ("exactly 1000
   * documents per language"). Window is partitioned per group; no global
   * sort.
   */
  def sampleExactPerGroup(
      df: DataFrame, idCol: String, groupCol: String, n: Int,
      salt: String = ""): DataFrame =
    // an unbiased draw IS a quota cap ranked by the salted hash — one
    // implementation of the window/row_number idiom, one WindowGroupLimit
    // guarantee to maintain
    capPerGroup(df, groupCol, n,
      hashBucket("exact", salt, col(idCol)), col(idCol))

  /**
   * Deterministic training-order shuffle: attaches a stable pseudo-random
   * `ord` column (salted id hash) — sorting by `(ord, id)` is the global
   * document shuffle every pretraining run needs, reproducible across
   * engines, runs, and partitioning (unlike `orderBy(rand(seed))`, whose
   * sample depends on partition layout). Compose with
   * [[graft.ops.Scale.writeRangeClustered]] on `ord` to materialize a
   * sharded shuffled layout without any single-task global sort.
   */
  def withShuffleOrder(df: DataFrame, idCol: String, salt: String = ""): DataFrame = {
    // fail loudly rather than silently overwrite a caller's column (same
    // reserved-namespace discipline as Events.rangeJoin)
    require(!df.columns.contains("ord"),
      "withShuffleOrder writes a reserved 'ord' column, but the input already has one")
    df.withColumn(
      "ord", TextOps.hash32(concat(lit(s"shuffle:$salt:"), col(idCol).cast("string"))))
  }

  /**
   * Deterministic stratified interleave: attaches an `ord` column holding
   * the row's 0-based rank WITHIN its group under the salted-hash shuffle
   * — sorting by `(ord, <tiebreak>)` yields a round-robin training order
   * where rank r of every group precedes rank r+1 of any group. Unlike
   * [[withShuffleOrder]]'s iid order (whose short prefixes can be
   * arbitrarily unbalanced), ANY prefix of the interleaved order carries
   * every still-unexhausted group in equal proportion — the stable
   * per-batch source mix some training recipes want at batch granularity
   * rather than in expectation. Same reproducibility contract as every
   * hash-ordered op: a pure function of (id, salt).
   *
   * One exchange (window partitioned by group). A group spanning many
   * partitions sorts within its window — for pathologically dominant
   * groups compose with [[sampleByTemperature]]/[[capPerGroup]] first.
   */
  def withInterleaveOrder(
      df: DataFrame, idCol: String, groupCol: String,
      salt: String = ""): DataFrame = {
    require(!df.columns.contains("ord"),
      "withInterleaveOrder writes a reserved 'ord' column, but the input already has one")
    val w = Window.partitionBy(groupCol).orderBy(
      TextOps.hash32(concat(lit(s"ileave:$salt:"), col(idCol).cast("string"))),
      col(idCol))
    df.withColumn("ord", (row_number().over(w) - 1).cast("long"))
  }

  /**
   * Per-group quota cap: at most `n` rows per group, keeping the rows that
   * rank FIRST under `rankBy` — the per-domain document cap every web-corpus
   * recipe applies so no single site dominates the training mix (rank by
   * quality desc and the cap keeps the best; contrast
   * [[sampleExactPerGroup]], which draws an UNBIASED hash-ordered sample).
   *
   * `rankBy` must be a total order within each group (include a unique id)
   * or the kept set is not deterministic. The `row_number <= n` filter
   * compiles to Spark's `WindowGroupLimit`: each map task keeps only its
   * local top-`n` per group BEFORE the shuffle, so the exchange carries
   * O(groups · n) rows per task, not the whole corpus (plan-audited).
   */
  def capPerGroup(df: DataFrame, groupCol: String, n: Int, rankBy: Column*): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    require(rankBy.nonEmpty, "capPerGroup requires at least one rank column")
    val w = Window.partitionBy(groupCol).orderBy(rankBy: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }

  /**
   * Keeps rows whose `valueCol` lies inside the corpus's `[lo, hi]` quantile
   * range — the standard length/quality outlier trim (e.g. drop the shortest
   * and longest 5% before training). Exact percentiles via one global
   * aggregate (a single tiny row) broadcast back over the corpus; the corpus
   * itself is scanned twice but never shuffled. Spark's `percentile` matches
   * DuckDB's `quantile_cont` interpolation exactly on integer/2-dp inputs.
   */
  def filterByQuantileRange(
      df: DataFrame, valueCol: String, lo: Double, hi: Double): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= 1, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val q = df.agg(
      expr(s"percentile($valueCol, $lo)").as("_q_lo"),
      expr(s"percentile($valueCol, $hi)").as("_q_hi"))
    df.join(broadcast(q))
      .where(col(valueCol) >= col("_q_lo") && col(valueCol) <= col("_q_hi"))
      .drop("_q_lo", "_q_hi")
  }

  /**
   * Token-budget sequence packing: assigns each document a `(bucket, seq)`
   * training-sequence slot — consecutive documents (deterministic id order)
   * share a sequence until its token budget is spent; a document whose first
   * token falls past the boundary starts the next sequence (oversized
   * documents therefore own one sequence and overflow it, the usual
   * pack-and-overflow contract).
   *
   * Packing is PER BUCKET (id-hash, own domain so it composes independently
   * with sample/split): the running-sum window partitions on `bucket`, so no
   * global sort ever happens — 100 TB packs as `nBuckets` independent
   * partitions in parallel, and a document's slot is stable under corpus
   * growth within its bucket prefix.
   */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: Column, budget: Long,
      nBuckets: Int = 1024, salt: String = ""): DataFrame = {
    require(budget > 0 && nBuckets > 0, "budget and nBuckets must be positive")
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(
        "bucket",
        (TextOps.hash32(concat(lit(s"pack:$salt:"), col(idCol).cast("string"))) % nBuckets)
          .cast("int"))
      .withColumn("_toks", tokensCol.cast("long"))
      .withColumn("_cum", sum(col("_toks")).over(w))
      .withColumn("seq", expr(s"(_cum - _toks) DIV ${budget}L"))
      .drop("_cum", "_toks")
  }

  /**
   * Deterministic sample of documents totalling at most `budget` tokens:
   * the corpus is ordered by a salted id hash (an unbiased shuffle, stable
   * across runs/engines/partitioning) and the longest prefix whose
   * cumulative token count fits the budget is kept — "give me 10B tokens of
   * this corpus", the budgeted counterpart of [[sampleDeterministic]]'s
   * fixed-rate form. The document straddling the boundary (and everything
   * after it) is dropped: prefix semantics, not bin packing.
   *
   * Scale shape: NO global sort. The global hash order is decomposed as
   * (bucket, hash, id) with `bucket = hash % nBuckets`; per-bucket token
   * totals (≤ `nBuckets` rows) take an exclusive prefix sum on the driver-
   * sized frame and broadcast back, and the running sum inside each bucket
   * is a PARTITIONED window — 100 TB cumulates as `nBuckets` independent
   * streams. Rows keep their input columns.
   */
  /**
   * Training-EXAMPLE assembly on top of [[packSequences]]: the documents
   * of each (bucket, seq) pack become one example row —
   * `(bucket, seq, n_docs, n_tokens, doc_ids, part_lens)` with the member
   * ids and their token lengths serialized as id-ordered CSV strings (the
   * boundary/attention-mask information a trainer needs to avoid
   * cross-document attention; CSV so engines and the driver's row
   * comparator hash them identically — the `q_scale_salted_nest`
   * convention). Assembly is ONE grouped `collect_list` per pack; pack
   * sizes are budget-bounded by construction, so no group can exceed
   * `budget / min_doc_tokens` members — the collect is task-safe at any
   * corpus size.
   */
  def packedExamples(
      df: DataFrame, idCol: String, tokensCol: Column, budget: Long,
      nBuckets: Int = 1024, salt: String = ""): DataFrame =
    packSequences(df.withColumn("_n", tokensCol.cast("long")), idCol, col("_n"),
        budget, nBuckets, salt)
      .groupBy("bucket", "seq")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("_n").as("n"))))
        .as("_parts"))
      .select(
        col("bucket"), col("seq"),
        size(col("_parts")).as("n_docs"),
        aggregate(col("_parts"), lit(0L), (a, p) => a + p.getField("n")).as("n_tokens"),
        array_join(transform(col("_parts"), p => p.getField("id").cast("string")), ",")
          .as("doc_ids"),
        array_join(transform(col("_parts"), p => p.getField("n").cast("string")), ",")
          .as("part_lens"))

  def sampleToTokenBudget(
      df: DataFrame, idCol: String, tokensCol: Column, budget: Long,
      nBuckets: Int = 64, salt: String = ""): DataFrame = {
    require(budget > 0 && nBuckets > 0, "budget and nBuckets must be positive")
    val keyed = df
      .withColumn("_h",
        TextOps.hash32(concat(lit(s"budget:$salt:"), col(idCol).cast("string"))))
      .withColumn("_bk", (col("_h") % nBuckets).cast("int"))
      .withColumn("_tk", tokensCol.cast("long"))
    val wB = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = keyed.groupBy("_bk").agg(sum(col("_tk")).as("_bt"))
      // the window sorts ≤ nBuckets rows — a driver-sized frame, not the corpus
      .withColumn("_before", coalesce(sum(col("_bt")).over(wB), lit(0L)))
      .drop("_bt")
    val wIn = Window.partitionBy("_bk").orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(prefix), Seq("_bk"))
      .withColumn("_cum", col("_before") + sum(col("_tk")).over(wIn))
      .where(col("_cum") <= budget)
      .drop("_h", "_bk", "_tk", "_before", "_cum")
  }

  /**
   * DSIR log-importance weights (Data Selection via Importance Resampling,
   * Xie et al. 2023): score every raw document by how much more likely its
   * tokens are under a TARGET distribution (e.g. a curated high-quality set)
   * than under the raw-corpus distribution, using hashed unigram features —
   * the published, classifier-free way to select pretraining data that
   * "looks like" a target domain.
   *
   * Features: token → bucket `hash32(token) % nBuckets` (md5-derived, engine
   * portable). Both distributions are add-one-smoothed over the bucket
   * space: `p(b) = (c(b) + 1) / (T + nBuckets)`. A document's weight is
   * `logw = Σ_tokens [ln p_target(b) − ln p_raw(b)]`, rounded to 4 dp (the
   * [[TextOps.unigramPerplexity]] double-stability analysis applies).
   *
   * Scale shape: the two bucket models are token-level aggregates whose
   * RESULTS are at most `nBuckets` rows — the model joins back to the raw
   * tokens as a broadcast, so scoring never shuffles token mass; the only
   * exchange is the per-document sum. Output: `(id, n_tokens, logw)`; docs
   * with null text drop (no tokens to score).
   */
  def dsirLogWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    def bucketed(d: DataFrame) =
      d.where(col(textCol).isNotNull)
        .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("_tok"))
        .select(col(idCol), (TextOps.hash32(col("_tok")) % nBuckets).cast("int").as("b"))
    val tCnt = bucketed(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rCnt = bucketed(raw).groupBy("b").agg(count(lit(1)).as("cr"))
    // full outer: a bucket seen only on one side keeps its mass in BOTH
    // totals (smoothing covers the absent side)
    val model = tCnt.join(rCnt, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = model.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    bucketed(raw)
      // every raw bucket is in the model by construction → inner is total
      .join(broadcast(model), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((col("ct") + lit(1L)).cast("double") /
            (col("tt") + lit(nBuckets)).cast("double")) -
          log((col("cr") + lit(1L)).cast("double") /
            (col("tr") + lit(nBuckets)).cast("double"))).as("_lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), round(sum(col("_lp")), 4).as("logw"))
  }

  /**
   * DSIR selection: the `m` raw documents with the highest importance
   * weights (ties → ascending id) — the deterministic top-m variant of the
   * paper's Gumbel resampling (same expectation, reproducible). Global
   * top-m compiles to `TakeOrderedAndProject`: every partition forwards at
   * most `m` rows, nothing resembling a global sort runs.
   */
  def dsirSelect(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      m: Int, nBuckets: Int = 256): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    dsirLogWeights(raw, target, idCol, textCol, nBuckets)
      .orderBy(col("logw").desc, col(idCol).asc)
      .limit(m)
  }

  /**
   * Training-export sharding — the LAST step of a corpus build: the
   * curated documents assigned to `nShards` files in a deterministic
   * GLOBAL SHUFFLE (training wants documents decorrelated from their
   * ingest/source order; adjacent crawl pages in one batch teach the
   * model the crawl, not the language). Shard and within-shard order are
   * both salted id hashes ([[hashBucket]] discipline, independent
   * domains), so the export is a pure function of (ids, salt): re-runs,
   * engines and parallelism all produce the identical sharding — and an
   * incremental re-export keeps every old document's position stable.
   * Adds `(shard, ord)` with `ord` the 1-based rank inside the shard
   * (hash order, id tie-break).
   *
   * Scale shape: ONE exchange (the shard assignment), per-shard ranks via
   * a window partitioned by shard — never a global sort. The writer form
   * ([[writeTrainingShards]]) clusters one file per shard.
   */
  def withTrainingShard(
      df: DataFrame, idCol: String, nShards: Int, salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val shard = pmod(
      TextOps.hash32(concat(lit(s"shard:$salt:"), col(idCol).cast("string"))),
      lit(nShards.toLong)).cast("int")
    val h = TextOps.hash32(concat(lit(s"shardord:$salt:"), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("_h", h)
      .withColumn("ord", row_number().over(w))
      .drop("_h")
  }

  /** [[withTrainingShard]] + hive-partitioned parquet write, one
    * hash-ordered file per shard directory — the artifact a trainer's
    * data loader consumes shard-by-shard. */
  def writeTrainingShards(
      df: DataFrame, idCol: String, nShards: Int, outDir: String,
      salt: String = ""): Unit =
    withTrainingShard(df, idCol, nShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** The seven headline card metrics, in a fixed order shared by
    * [[datasetCard]] and [[datasetCardDiff]]. */
  private val CardMetrics: Seq[String] = Seq(
    "n_docs", "n_null_text", "n_langs", "n_sources",
    "total_tokens", "total_chars", "n_distinct_texts")

  /**
   * One-pass dataset card: volume, null mass, label cardinalities,
   * token/char mass, and distinct-content count as ONE aggregate over one
   * corpus scan (the count-distincts expand map-side) — the release-note
   * summary row of any corpus build. All metrics are integer-exact longs.
   */
  def datasetCard(
      df: DataFrame, textCol: String = "text", langCol: String = "lang",
      sourceCol: String = "source", charsCol: String = "n_chars"): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      sum(when(col(textCol).isNotNull,
        size(split(col(textCol), " ")).cast("long")).otherwise(0L))
        .as("total_tokens"),
      sum(col(charsCol)).as("total_chars"),
      countDistinct(md5(col(textCol))).as("n_distinct_texts"))

  /**
   * Per-media-type extraction/decode REFUSAL accounting (r18) — the
   * card row that makes the honest-tier blind spots VISIBLE IN THE
   * DATA instead of only in scaladoc: the engine's media tiers refuse
   * what they cannot decode soundly (encrypted/CID-unknowable PDFs,
   * VP8-lossy/AVIF pixel decode, non-JSON under a json mime, gzip
   * bombs), and a corpus operator must see how much mass that refusal
   * mass is per mime before trusting a feed.
   *
   * `okCol` is whatever the caller's tier produced — extracted text,
   * a decoded-image struct — where NULL means REFUSED (the engine-wide
   * refusal law). One grouped aggregate over one scan: per normalized
   * media type (parameters stripped, lowercased), document and byte
   * volume, refused documents and bytes, and the refusal percentage
   * (4-dp round — the engine's determinism contract).
   */
  def mediaRefusalCard(
      df: DataFrame, mimeCol: String, contentCol: String,
      okCol: String): DataFrame =
    df.select(
        trim(substring_index(lower(coalesce(col(mimeCol), lit(""))), ";", 1))
          .as("media_type"),
        coalesce(octet_length(col(contentCol)).cast("long"), lit(0L))
          .as("_bytes"),
        col(okCol).isNull.as("_refused"))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_refused"), 1L).otherwise(0L)).as("n_refused"),
        sum(col("_bytes")).as("total_bytes"),
        sum(when(col("_refused"), col("_bytes")).otherwise(0L))
          .as("refused_bytes"))
      .withColumn("refused_pct",
        round(col("n_refused") * lit(100.0) / col("n_docs"), 4))

  /**
   * Dataset-card DIFF between two corpus snapshots — the release-gate
   * artifact for an append-only corpus: what did this batch of appends do
   * to volume, token mass, and duplication? One long-format row per
   * metric: `(metric, v_a, v_b, delta)` with `delta = v_b − v_a`; the
   * exact-dup count is `n_docs − n_distinct_texts` per side, derivable
   * from the rows. Two one-row aggregates broadcast-joined and exploded —
   * each corpus is scanned once, nothing row-sized moves.
   *
   * Pair it with the manifest stores' time travel
   * ([[graft.ops.ManifestStore.frameAt]]) to diff committed VERSIONS of a
   * persisted corpus: `datasetCardDiff(frameAt(v1), frameAt(v2))`.
   */
  /**
   * Per-batch CARD FRAME — the dataset card's sufficient statistics as
   * ONE mergeable row: the additive exact counts, the exact label SETS
   * (lang/source are vocabulary-sized; a high-cardinality label belongs
   * in a sketch column instead), and an HLL sketch of text md5s for the
   * distinct-content estimate. Append one per ingested batch to a
   * [[SketchLedger]] (`SketchLedger.append(cardFrame(batch), dir)` in any
   * foreachBatch) and [[cardFold]] reads the running corpus card WITHOUT
   * rescanning a single ingested batch — continuous corpus accounting,
   * the streaming twin of [[datasetCard]].
   *
   * Fold laws (spec-pinned): every field except `n_distinct_texts` folds
   * EXACTLY equal to the one-shot [[datasetCard]] over the union;
   * `n_distinct_texts` is the HLL estimate — exact while the sketch stays
   * in its sparse regime, ~2% standard error at corpus scale, the
   * standard trade for mergeability. [[cardFoldFrame]] is associative
   * (a fold is itself a card frame), which is what makes
   * [[SketchLedger.compact]] of a long ledger sound.
   */
  def cardFrame(
      df: DataFrame, textCol: String = "text", langCol: String = "lang",
      sourceCol: String = "source", charsCol: String = "n_chars"): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
      collect_set(col(langCol)).as("langs"),
      collect_set(col(sourceCol)).as("sources"),
      sum(when(col(textCol).isNotNull,
        size(split(col(textCol), " ")).cast("long")).otherwise(0L))
        .as("total_tokens"),
      sum(col(charsCol)).as("total_chars"),
      hll_sketch_agg(md5(col(textCol))).as("text_hll"))

  /** Mergeable fold of card frames — same schema as [[cardFrame]], so
    * folds compose (ledger compaction re-appends this one row). */
  def cardFoldFrame(frames: DataFrame): DataFrame =
    frames.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_null_text")).as("n_null_text"),
      array_distinct(flatten(collect_list(col("langs")))).as("langs"),
      array_distinct(flatten(collect_list(col("sources")))).as("sources"),
      sum(col("total_tokens")).as("total_tokens"),
      sum(col("total_chars")).as("total_chars"),
      hll_union_agg(col("text_hll")).as("text_hll"))

  /** The READABLE running card from accumulated card frames (a
    * [[SketchLedger.read]] result): [[datasetCard]]'s column shape, with
    * `n_distinct_texts` the HLL estimate. */
  def cardFold(frames: DataFrame): DataFrame =
    cardFoldFrame(frames).select(
      col("n_docs"), col("n_null_text"),
      size(col("langs")).cast("long").as("n_langs"),
      size(col("sources")).cast("long").as("n_sources"),
      col("total_tokens"), col("total_chars"),
      hll_sketch_estimate(col("text_hll")).as("n_distinct_texts"))

  def datasetCardDiff(
      a: DataFrame, b: DataFrame, textCol: String = "text",
      langCol: String = "lang", sourceCol: String = "source",
      charsCol: String = "n_chars"): DataFrame = {
    val ca = datasetCard(a, textCol, langCol, sourceCol, charsCol)
    val cb = datasetCard(b, textCol, langCol, sourceCol, charsCol)
      .select(CardMetrics.map(m => col(m).as(s"${m}_b")): _*)
    val rows = CardMetrics.map(m =>
      struct(lit(m).as("metric"), col(m).as("v_a"), col(s"${m}_b").as("v_b")))
    ca.crossJoin(cb) // both sides are single aggregate rows — broadcast
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.metric").as("metric"), col("r.v_a").as("v_a"),
        col("r.v_b").as("v_b"), (col("r.v_b") - col("r.v_a")).as("delta"))
  }
}
