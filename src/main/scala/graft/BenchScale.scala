package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/**
 * 10× scale stress: the 2×-of-baseline contract is only ever checked at
 * sf0.1 (~17 MB) — this main synthesizes an sf1-equivalent corpus locally
 * and times the suite's most expensive queries at BOTH scales, writing
 * `BENCH_SCALE10X.json` with per-query ratios so super-linear growth has a
 * number on it instead of an assumption.
 *
 * Corpus construction matters: a plain id-shifted union (the BenchStream
 * trick) makes every copy an EXACT duplicate of the original, so the true
 * near-dup pair count grows ~quadratically with copies and every dedup
 * timing measures the corpus's pair blowup, not the operator's scaling.
 * The copies here are decorrelated so data grows 10× while per-group
 * duplicate structure stays CONSTANT:
 *  - documents: every token of copy i>0 is suffixed `_i`, so shingles
 *    never collide across copies (planted within-copy near-dups preserved
 *    exactly; the shingle equi-join generates no cross-copy candidates);
 *  - embeddings: copy i is cyclically rotated by i components, so
 *    cross-copy cosine falls to chance while within-copy geometry —
 *    centroid structure, planted exact dups — is preserved;
 *  - orders/customer: keys shifted by i·10⁷ (disjoint users, 10× groups).
 *
 * Also runs the SemDeDup cell-count experiment the √N guidance calls for:
 * at 10× the corpus, k=32 cells means Σ|cell|² grows ~100×/k — k must
 * track √N; the k=32 vs k=100 timings put a measured factor on that.
 */
object BenchScale {

  private val Shift = 10000000L

  private def releaseResidue(spark: SparkSession, keep: Set[Int]): Unit =
    spark.sparkContext.getPersistentRDDs.foreach {
      case (id, rdd) if !keep.contains(id) => rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** Decorrelated ×`copies` synthesis of the tables the stress queries
    * read; committed via a marker file, rebuilt only if absent. */
  def synth(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    // v3: adds events (v2 decorrelated customer names) — bumping the
    // marker rebuilds stale synth dirs
    val marker = new java.io.File(s"$dst/_GRAFT_SYNTH_OK_v3")
    if (marker.exists()) return
    new java.io.File(dst).mkdirs()

    def copiesOf(base: DataFrame)(mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map {
        case 0 => base
        case i => mutate(base, i)
      }.reduce(_.unionByName(_))

    val docs = graft.queries.Tpch.read(spark, src, "documents")
    copiesOf(docs) { (d, i) =>
      d.select(
        (col("doc_id") + lit(i * Shift)).as("doc_id"),
        array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = graft.queries.Tpch.read(spark, src, "embeddings")
    copiesOf(emb) { (e, i) =>
      val rot = i % 64
      e.select(
        (col("vec_id") + lit(i * Shift)).as("vec_id"),
        concat(
          slice(col("embedding"), rot + 1, 64 - rot),
          slice(col("embedding"), 1, rot)).as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val orders = graft.queries.Tpch.read(spark, src, "orders")
    copiesOf(orders) { (o, i) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i * Shift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * Shift))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val customer = graft.queries.Tpch.read(spark, src, "customer")
    copiesOf(customer) { (c, i) =>
      c.withColumn("c_custkey", col("c_custkey") + lit(i * Shift))
        // names get a per-copy DOUBLED-digit suffix: appending one shared
        // string preserves within-copy pairwise distances exactly, and
        // any cross-copy pair differs by >= 2 edits ("_ii" vs "_jj", or
        // 3 inserts vs the unsuffixed copy 0) — beyond the maxDist=1
        // stress query, so pair structure stays constant at 10×
        .withColumn("c_name", concat(col("c_name"), lit(s"_$i$i")))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/customer.parquet")

    // events: users and event ids shift per copy, timestamps unchanged —
    // per-user dense series and per-type hourly mixes replicate intact,
    // so the dense-series/anomaly/advisor oracles stay meaningful at 10×
    val events = graft.queries.Tpch.read(spark, src, "events")
    copiesOf(events) { (e, i) =>
      e.withColumn("event_id", col("event_id") + lit(i * Shift))
        .withColumn("user_id", col("user_id") + lit(i * Shift))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")

    for (t <- Seq("nation", "region"))
      graft.queries.Tpch.read(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    marker.createNewFile()
  }

  /** The suite's most expensive lines (per BENCH history), spanning dedup
    * clustering, banded candidates, semantic/embedding ops, PQ, the LM
    * join, and a plain shuffle-heavy aggregate as a control. */
  private val stressQueries = Seq(
    "q_dedup_clusters", "q_dedup_clusters_star", "q_dedup_clusters_auto",
    "q_dedup_minhash_lsh", "q_dedup_jaccard_blocked", "q_dedup_exact_substring",
    "q_dedup_exact_substring_keepfirst",
    "q_embed_semdedup", "q_contamination_semantic",
    "q_sim_ivfpq", "q_sim_pq",
    "q_text_perplexity2", "q_j4_union",
    // round-10 retrieval/curation additions whose query inputs derive from
    // the corpus itself (literal-term queries like q_ret_bm25 would match
    // nothing against the suffix-mutated 10× vocabulary):
    "q_ret_hybrid_rrf", "q_corpus_dsir", "q_corpus_token_budget",
    // late-round-10 additions: prefix/deletion-blocked fuzzy pairs (the
    // candidate machinery under 10× the strings) and the perceptual-hash
    // kernel (10× real PNG decodes — pure per-row compute control)
    "q_dedup_fuzzy", "q_mm_phash",
    // event-family scaling (synth v3 carries events): the union-and-carry
    // as-of plan, window sessionization, and the median-join imputation
    "q_ev_asof", "q_ev_sessions", "q_val_impute",
    // round-11 late additions: quality-aware survivor (clustering + one
    // min_by aggregate), the two-pass RM3 expansion (queries derive from
    // the corpus, same convention as q_ret_hybrid_rrf), and the two
    // single-aggregate controls (moments, grouped pooling) whose ratios
    // should sit at ~1× — they are one partial-agg pass each
    "q_dedup_keep_best", "q_ret_bm25_rm3",
    "q_embed_pca_moments", "q_embed_mean_pool",
    // round-11 closing additions: the NB train+classify double aggregate,
    // the epoch-repetition generator and the fingerprint-count leakage
    // audit (both ~1× single-exchange controls), the brute hard-negative
    // miner (linear in corpus mass) and its chained triplet capstone
    "q_text_nb_classify", "q_corpus_epoch_sample", "q_corpus_split_leakage",
    "q_sim_hard_negatives", "q_pipeline_triplets",
    // round-12 additions: the persisted-store serving paths (minhash
    // candidates, span window counts, media fingerprints — each pays its
    // one-time build in the warm-up memo, so the measured line is the
    // rerun a deployment repeats) and the composed keep-best capstone
    // over the persisted index
    "q_dedup_minhash_inc", "q_dedup_substring_inc_indexed",
    "q_mm_phash_indexed", "q_mm_neardup_indexed", "q_pipeline_neardup_curate",
    // round-12 session-2 additions: CCNet paragraph dedup (line mass is
    // linear; the banner's occurrence count grows 10× but the min-struct
    // aggregate partial-combines it map-side — the skew-proof claim under
    // stress), its store-served incremental form, the memorization
    // profiler (span machinery minus the rebuild), and the binary
    // quantization scan + rerank (linear bit-scan controls) with the
    // persisted-codes serving path
    "q_dedup_paragraph", "q_dedup_paragraph_inc_indexed",
    "q_dedup_memorization", "q_sim_binary_rerank", "q_sim_binary_indexed",
    // round-13 additions: the eTLD+1 quota (a kernel projection feeding
    // WindowGroupLimit — a ~1× control), the two-version card diff (two
    // 1-row aggregates — ~1× control), and the retrieval eval whose spine
    // re-plan must hold at 10× (queries derive from the corpus)
    "q_corpus_etld_cap", "q_corpus_card_diff", "q_ret_eval",
    // round-14 additions: the eval-registry decontamination gate (corpus
    // fingerprint mass is linear, the registry side eval-sized — the
    // store build pays once in the memo), the trigram language id and the
    // pct/idn-kernel url canon (per-row kernel ~1× controls), and the
    // simhash occupancy audit (two-level aggregate, linear)
    "q_contamination_decon", "q_text_langid_ngram", "q_text_url_canon",
    "q_dedup_simhash64_occupancy",
    // round-15 addition: the crawl-ingest capstone — strip/url/lang/quality
    // gates are per-row kernels + one WindowGroupLimit each, the paragraph
    // stages shuffle line mass (linear), the decon suite and mix rates ride
    // broadcasts; the composed ratio should stay near-linear
    "q_pipeline_crawl",
    // round-15 kernels (queue hygiene: explicit lines, not just riders
    // inside the capstone): container/byte-level per-row controls and the
    // scored langid twin + its calibration aggregate
    "q_mm_video_meta", "q_text_from_bytes", "q_text_langid_margin",
    "q_text_langid_calibration",
    // round-16 additions: the WARC shard reader (decompress+parse is
    // per-row over planted shards), the deflate-ratio kernel control, the
    // image header-metadata kernel control, and the bytes-fed crawl
    // capstone twin (text_from_bytes riding the whole chain)
    "q_src_warc", "q_text_deflate", "q_mm_image_meta",
    "q_pipeline_crawl_bytes",
    // round-17 additions: the block-structured HTML extractor and PDF
    // text tier (per-row kernel controls over planted markup/fixtures)
    // and the ladder-rung attribution aggregate (per-row kernel + one
    // grouped count)
    "q_text_html_blocks", "q_src_pdf", "q_text_rungs",
    "q_mm_decode_vp8l", "q_src_media",
    // round-18: the CID/ToUnicode PDF arms and json/rss routes ride
    // q_src_pdf/q_src_media above; new surface is the crawl-fed BM25F
    // (title/body kernels + the weighted-field postings build)
    "q_ret_bm25f_crawl")

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // Optional name-prefix filter for local iteration (mirrors Bench/Verify);
    // a filtered run skips the experiments and does NOT write the record.
    val selected =
      if (args.isEmpty) stressQueries
      else stressQueries.filter(n => args.exists(n.startsWith))
    val fullRun = args.isEmpty
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_DIR", s"${sys.props("java.io.tmpdir")}/graft_sf10x")
    val copies = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Scale-adaptive shuffle width: AQE coalescing STARTS from this many
      // partitions and merges down to its advisory size, so a 10× corpus
      // keeps 10× the reduce parallelism (bounded spill per task) while
      // small stages still collapse to a handful of tasks. With only the
      // fixed 32, every shuffle partition carries 10× the rows at sf1 —
      // exactly the regime where sort/agg spill turns linear growth into
      // the superlinear stress ratios this bench exists to catch.
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

    synth(spark, src, dst, copies)

    // Materialize the ordersTx memos and warm every plan shape at sf0.001
    // (mirrors Bench: codegen/JIT/datasource one-time costs must not bill
    // to the first measured query), then measure with a clean BlockManager
    // between queries.
    val warm = "/root/testdata/sf0.001"
    try {
      graft.queries.Tpch.ordersTx(spark, warm)
        .write.format("noop").mode("overwrite").save()
      graft.queries.Tpch.ordersTx(spark, src)
        .write.format("noop").mode("overwrite").save()
      graft.queries.Tpch.ordersTx(spark, dst)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    for (name <- selected) {
      try SparkEntry.queries(name)(spark, warm)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally releaseResidue(spark, keep)
    }
    // Warm once at BOTH measured scales too: the store-backed serving
    // queries (persisted minhash/phash/binary/lex/registry stores under
    // /tmp, memoized by their committed manifests) pay their one-time
    // build on the FIRST execution against a given corpus — without this
    // pass the build bills to whichever measured line finds /tmp cold,
    // and the ratio measures "build+serve vs serve" instead of the
    // serving rerun a deployment repeats (observed round 15: a freshly
    // synthesized 10x corpus put q_mm_phash_indexed's store build inside
    // the measured sf1 line, 1.45x -> 49x with zero code change). The
    // extra pass costs one unmeasured sweep per scale and makes every
    // measured line a warm rerun, the same contract Bench.scala applies.
    for (dir <- Seq(src, dst); name <- selected) {
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally releaseResidue(spark, keep)
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val perQuery = selected.map { name =>
      val fn = SparkEntry.queries(name)
      val t1 = time(fn(spark, src).write.format("noop").mode("overwrite").save())
      releaseResidue(spark, keep)
      val t10 = time(fn(spark, dst).write.format("noop").mode("overwrite").save())
      releaseResidue(spark, keep)
      println(s"[scale10x] $name sf0.1=${num(t1)}s sf1=${num(t10)}s ratio=${num(t10 / t1)}")
      s""""$name":{"sf01":${num(t1)},"sf1":${num(t10)},"ratio":${num(t10 / t1)}}"""
    }

    if (!fullRun) { spark.stop(); return }

    // SemDeDup √N experiment: same pipeline as q_embed_semdedup (corpus ∪
    // planted exact dups, threshold 0.95) at 10× with k=32 vs k=100 cells,
    // plus k=32 at 1× as the reference point.
    def semdedup(dir: String, k: Int): Double = {
      val e = graft.queries.Tpch.read(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      val withDups = e.unionByName(
        e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val t = time {
        Similarity.semanticDedup(
            withDups, Similarity.trainCentroids(withDups, k, 2), 0.95)
          .write.format("noop").mode("overwrite").save()
      }
      releaseResidue(spark, keep)
      t
    }
    val sd32_1 = semdedup(src, 32)
    val sd32_10 = semdedup(dst, 32)
    val sd100_10 = semdedup(dst, 100)
    // The SHIPPED parameterization: k derived by the max(32, ⌈√N⌉) rule
    // (what q_embed_semdedup / Similarity.autoCentroids now do), at both
    // scales — its ratio is the one the ≤2× scaling claim rests on.
    def autoK(dir: String): Int = {
      val e = graft.queries.Tpch.read(spark, dir, "embeddings")
      Similarity.semanticCellCount(2L * e.count()) // experiment corpus = emb ∪ dups
    }
    val sdAuto_1 = semdedup(src, autoK(src))
    val sdAuto_10 = semdedup(dst, autoK(dst))

    // MinHash-LSH stage split (round 9): the 10× ratio on
    // q_dedup_minhash_lsh has hovered at ~3× — before turning any banding
    // knob, measure WHERE the time goes: posting-list candidate GENERATION
    // (shuffle of band mass) vs Jaccard VERIFICATION (cost ∝ candidate
    // pairs — on this planted corpus ~every doc sits in a pair, so
    // verification is structurally ~linear in corpus, not a plan defect).
    def minhashSplit(dir: String): String = {
      val docs = Quality.docsWithNearDups(spark, dir)
      val bands = graft.ops.Dedup.lshBands(
        graft.ops.Dedup.minhashSignaturesNative(docs, "doc_id", "text", 16, 3), 16, 8)
      var cand: DataFrame = null
      // localCheckpoint is eager: tGen covers signature + banding + the
      // one posting-list shuffle + pair materialization, nothing else
      val tGen = time {
        cand = graft.ops.Dedup.candidatePairs(bands, maxOccupancy = 64).localCheckpoint()
      }
      val nCand = cand.count()
      val tVer = time {
        graft.ops.Dedup.verifyJaccard(cand, docs, "doc_id", "text", 3, minJaccard = 0.35)
          .where(col("jaccard") >= 0.35)
          .write.format("noop").mode("overwrite").save()
      }
      releaseResidue(spark, keep)
      s"""{"gen_sec":${num(tGen)},"verify_sec":${num(tVer)},"candidates":$nCand}"""
    }
    val mhSplit1 = minhashSplit(src)
    val mhSplit10 = minhashSplit(dst)

    // LSH occupancy-cap audit: exactly what the 64-cap drops at each scale
    // — the counter that keeps the cap from ever being silent.
    def lshStats(dir: String): String = {
      val docs = Quality.docsWithNearDups(spark, dir)
      val bands = graft.ops.Dedup.lshBands(
        graft.ops.Dedup.minhashSignaturesNative(docs, "doc_id", "text", 16, 3), 16, 8)
      val r = graft.ops.Dedup.lshOccupancyStats(bands, 64).collect()(0)
      s"""{"n_buckets":${r.getLong(0)},"n_dropped_buckets":${r.getLong(1)},""" +
        s""""dropped_rows":${r.getLong(2)},"dropped_pair_mass":${r.getLong(3)},""" +
        s""""max_occupancy":${r.getLong(4)}}"""
    }
    val lsh1 = lshStats(src)
    val lsh10 = lshStats(dst)

    val json =
      s"""{"copies":$copies,"src":"$src","synth":"$dst","queries":{${perQuery.mkString(",")}},""" +
        s""""semdedup_k":{"k32_sf01":${num(sd32_1)},"k32_sf1":${num(sd32_10)},""" +
        s""""k100_sf1":${num(sd100_10)},"k32_ratio":${num(sd32_10 / sd32_1)},""" +
        s""""k100_vs_k32_at_sf1":${num(sd100_10 / sd32_10)},""" +
        s""""kauto_sf01":${num(sdAuto_1)},"kauto_sf1":${num(sdAuto_10)},""" +
        s""""kauto_ratio":${num(sdAuto_10 / sdAuto_1)}},""" +
        s""""lsh_occupancy_cap64":{"sf01":$lsh1,"sf1":$lsh10},""" +
        s""""minhash_split":{"sf01":$mhSplit1,"sf1":$mhSplit10}}"""
    println(json)
    Files.writeString(Paths.get("BENCH_SCALE10X.json"), json + "\n")
    spark.stop()
  }
}
