package graft

import graft.ops.Similarity

/**
 * Test-enforced plan audit: the physical-plan properties PLANS.md narrates
 * (pushdown, pruning, broadcasts, window group limits, no cartesian blowups)
 * asserted against the actual planner output, so a regression that silently
 * de-optimizes a hot path fails CI instead of only showing up in a bench.
 */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("P1: filter and projection reach the parquet scan") {
    val p = plan("q_p1_project")
    assert(p.contains("PushedFilters"), p)
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(p).isDefined, p)
    // column pruning: the wide comment column never leaves the scan
    assert(!p.contains("l_comment"), "unpruned ReadSchema:\n" + p)
  }

  test("J1: the ISO dimension joins as a broadcast, never a shuffle") {
    val p = plan("q_j1_country_resolve")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("O1: top-k plans a WindowGroupLimit (partial top-k before the shuffle)") {
    val p = plan("q_o1_topk")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("dedup candidate generation is equi-join only — no cartesian, no NLJ") {
    for (q <- Seq("q_dedup_minhash_lsh", "q_dedup_jaccard_blocked", "q_embed_neardup",
        "q_dedup_simhash64_pairs", "q_dedup_containment", "q_text_boilerplate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q planned a nested loop:\n$p")
    }
  }

  test("per-group cap plans a WindowGroupLimit; range join stays an equi-join") {
    val cap = plan("q_corpus_cap")
    assert(cap.contains("WindowGroupLimit"), cap)
    val rj = plan("q_ev_range_join")
    assert(!rj.contains("CartesianProduct"), s"range join planned a cartesian:\n$rj")
    assert(!rj.contains("BroadcastNestedLoopJoin"), s"range join planned a nested loop:\n$rj")
  }

  test("eTLD+1 cap: WindowGroupLimit quota with the registrable_domain " +
    "kernel inside codegen — no UDF fallback, no extra exchange") {
    val p = plan("q_corpus_etld_cap")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("registrable_domain"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    // the key derivation is a pure Project feeding the quota directly —
    // no aggregate/join exchange between the kernel and the group limit
    // (WholeStageCodegen spans don't print in an unfinalized AQE string,
    // so the pin is the node shape, not the codegen label)
    assert(p.contains("Project [doc_id"), p)
  }

  test("round-6 additions: cell-bounded semdedup, bloom probe, perplexity partial-agg") {
    // SemDeDup's pair search must be an equi-join on the cell id — the
    // clustering bound is the whole point; a cartesian would be N².
    val sd = plan("q_embed_semdedup")
    assert(!sd.contains("CartesianProduct"), s"semdedup planned a cartesian:\n$sd")
    // The bloom probe must appear in the plan at all (a filter on the
    // corpus side, before the verifying join).
    val cb = plan("q_contamination_bloom")
    assert(cb.contains("might_contain"), s"bloom probe missing from plan:\n$cb")
    // Perplexity's LM aggregate must partial-aggregate map-side (two
    // HashAggregate stages around its exchange), and join the LM by key —
    // never nested-loop the vocabulary.
    val pp = plan("q_text_perplexity")
    assert(!pp.contains("CartesianProduct"), s"perplexity planned a cartesian:\n$pp")
    assert(pp.contains("partial_count") || pp.contains("HashAggregate"), pp)
  }

  test("PQ encode and IVF assign are shuffle-free projections over the scan") {
    // Encode/assign is the full-corpus pass of every ANN build — the per-row
    // argmin runs against driver-held codebook literals, so the plan must be
    // scan→project(→generate) with NO Exchange anywhere (the old join-based
    // form paid a broadcast-join × k fan-out plus a groupBy(vec_id) shuffle).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainCentroids(e, 4, 1)
    val assignPlan = Similarity.ivfAssign(e, cents)
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"), s"ivfAssign shuffles:\n$assignPlan")
    assert(!assignPlan.contains("Join"), s"ivfAssign joins:\n$assignPlan")
    val cb = Similarity.pqTrainCodebooks(e, dims = 64, m = 4, k = 4, iters = 1)
    val encodePlan = Similarity.pqEncode(e, cb, dims = 64, m = 4)
      .queryExecution.executedPlan.toString
    assert(!encodePlan.contains("Exchange"), s"pqEncode shuffles:\n$encodePlan")
    assert(!encodePlan.contains("Join"), s"pqEncode joins:\n$encodePlan")
    // Residual encode fuses coarse assignment + per-subspace residual
    // argmin into the SAME single projection — still no join, no exchange
    // (the 100 TB index-build pass must stay one scan).
    val cbR = Similarity.pqTrainCodebooksResidual(e, cents, dims = 64, m = 4, k = 4, iters = 1)
    val resPlan = Similarity.pqEncodeResidual(e, cents, cbR, dims = 64, m = 4)
      .queryExecution.executedPlan.toString
    assert(!resPlan.contains("Exchange"), s"pqEncodeResidual shuffles:\n$resPlan")
    assert(!resPlan.contains("Join"), s"pqEncodeResidual joins:\n$resPlan")
  }

  test("indexed re-rank: partition filters on BOTH artifacts, broadcast-only joins") {
    // The serving cost model depends on two things the planner must keep:
    // (1) the probe set prunes the codes scan AND the raw-vector scan at
    // planning time (only probed cells' files open — at √N cells a query
    // reads ~nprobe/√N of either artifact), and (2) every join rides a
    // broadcast (probes, LUT, shortlist, queries are all bounded-small) —
    // a SortMergeJoin would shuffle corpus-scale mass for a per-query
    // candidate set.
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val idxDir = tmpDir("graft_plan_idx")
    Similarity.buildIndex(e, idxDir, dims = 64, m = 4, coarseK = 4, pqK = 4, iters = 1)
    val idx = Similarity.readIndex(spark, idxDir)
    val queries = e.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val p = Similarity.ivfPqTopKIndexedRerank(idx, queries, 3, nprobe = 2, shortlist = 16)
      .queryExecution.executedPlan.toString
    val cellFilters = "PartitionFilters: \\[[^\\]]*cell".r.findAllIn(p).size
    assert(cellFilters >= 2,
      s"expected probe-cell partition filters on codes AND vectors scans, found $cellFilters:\n$p")
    assert(!p.contains("SortMergeJoin"), s"re-rank planned a shuffle join:\n$p")
    assert(!p.contains("CartesianProduct"), s"re-rank planned a cartesian:\n$p")
  }

  test("round-11 serving paths: tombstone anti-join broadcasts; r=2 index keeps pruning + broadcast joins") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // tombstoned index: the anti-join against the (tiny) id list must be
    // a BroadcastHashJoin — a shuffled anti-join would exchange the full
    // probed-cell mass to subtract a handful of ids
    val delDir = tmpDir("graft_plan_idx_del")
    Similarity.buildIndex(e, delDir, dims = 64, m = 4, coarseK = 4, pqK = 4, iters = 1)
    import spark.implicits._
    Similarity.deleteFromIndex(Seq(3L, 9L).toDF("vec_id"), delDir)
    val pDel = Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, delDir), queries, 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(pDel.contains("BroadcastHashJoin") && pDel.contains("LeftAnti"),
      s"tombstone filter must be a broadcast anti-join:\n$pDel")
    assert(!pDel.contains("SortMergeJoin"), s"tombstoned serving planned a shuffle join:\n$pDel")

    // assign_r=2 index: partition pruning and broadcast-only joins hold on
    // the redundant layout too (the min-over-cells dedup adds an aggregate,
    // never a shuffle join or a cartesian)
    val r2Dir = tmpDir("graft_plan_idx_r2")
    val coarse = Similarity.trainCentroids(e, 4, 1)
    val cb = Similarity.pqTrainCodebooksResidual(e, coarse, dims = 64, m = 4, k = 4, iters = 1)
    Similarity.writeIndex(e, coarse, cb, r2Dir, dims = 64, m = 4, assignR = 2)
    val pR2 = Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, r2Dir), queries, 3, nprobe = 2, shortlist = 16)
      .queryExecution.executedPlan.toString
    val cellFilters = "PartitionFilters: \\[[^\\]]*cell".r.findAllIn(pR2).size
    assert(cellFilters >= 2,
      s"r=2 serving lost the probed-cell partition filters ($cellFilters):\n$pR2")
    assert(!pR2.contains("SortMergeJoin") && !pR2.contains("CartesianProduct"),
      s"r=2 serving planned a shuffle join or cartesian:\n$pR2")
  }

  test("filtered ANN: attribute predicate is PUSHED into the codes scan, pruning intact") {
    // Filtered search must cost a scan-level predicate, not a join: the
    // attr rides the codes artifact as a parquet column, so the filter
    // must appear in PushedFilters (row-group stat skipping) NEXT TO the
    // probed-cell partition filter, with every join still broadcast.
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val idxDir = tmpDir("graft_plan_idx_attr")
    Similarity.buildIndex(e, idxDir, dims = 64, m = 4, coarseK = 4, pqK = 4,
      iters = 1, attrCols = Seq("label"))
    val idx = Similarity.readIndex(spark, idxDir)
    val queries = e.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val p = Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 2,
        filter = Some(col("label") === 2))
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(p).isDefined,
      s"label predicate not pushed to the codes scan:\n$p")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"filtered serving lost the probed-cell partition filter:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"filtered serving planned a shuffle join or cartesian:\n$p")
  }

  test("composed curation chains as one plan: no cartesian, rates/prefix joins broadcast") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Corpus, Dedup, TextOps}
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val gate = TextOps.curationGate(d, "doc_id", "text",
      TextOps.CurationRules(
        minTokens = 30, maxTopTokenFrac = 0.12, maxDupBigramFrac = 0.2))
    val gated = d.join(gate.where(col("keep")).select("doc_id"), Seq("doc_id"))
    val deduped = Dedup.exactByContent(gated, "doc_id", "text")
    val mixed = Corpus.sampleByTemperature(deduped, "doc_id", "lang", 2.0)
    val p = Corpus.sampleToTokenBudget(
        mixed.select("doc_id", "text", "lang", "source", "n_chars"),
        "doc_id", size(split(col("text"), " ")), budget = 8000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"curation chain planned a cartesian:\n$p")
    // the mix-rate and bucket-prefix frames are group-/bucket-count-sized
    // and must ride broadcasts, never shuffle the corpus against them
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in the chain:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-side frame shuffled against a stats frame:\n$p")
  }

  test("similarity scoring cross-products are broadcast-side only") {
    // Scoring every (vector, centroid/query) combination IS a cross product —
    // correct only as a BroadcastNestedLoopJoin whose build side is the small
    // broadcast set. A non-broadcast CartesianProduct would shuffle-pair two
    // large sides and must never appear.
    for (q <- Seq("q_sim_topk_brute", "q_sim_ivf_nprobe")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
    }
  }

  test("kernel-backed per-document queries shuffle only for the output sort") {
    // The per-row kernels exist precisely so these pure per-document
    // computations cost zero exchanges; the single remaining Exchange is
    // the oracle-determinism ORDER BY (rangepartitioning).
    for (q <- Seq("q_dedup_simhash", "q_dedup_simhash64", "q_text_fingerprint",
        "q_text_repetition", "q_text_winnow")) {
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 1, s"$q plans $exchanges exchanges:\n$p")
      assert(p.contains("rangepartitioning"), p)
    }
  }

  test("exact profile never plans an Expand — per-column two-stage distinct") {
    // A flat multi-column countDistinct agg makes Spark replicate every input
    // row once per profiled column through an Expand before the first partial
    // aggregate (measured 4× slower on a 5-column profile at sf0.1); the
    // union-of-two-stage-aggs shape must keep it out of the plan for good.
    val p = plan("q_profile_orders")
    assert(!p.contains("Expand"), s"profile planned an Expand:\n$p")
  }

  test("session_window and path mining stay partitioned — no single-task funnels") {
    for (q <- Seq("q_ev_sessions_native", "q_ev_sequences")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"), s"$q serializes through one task:\n$p")
    }
  }

  test("flagship risk query: every window is partitioned") {
    val p = plan("q_flag_risky")
    // an unpartitioned window serializes the whole table through one task;
    // Spark renders those as 'Window [...], [ordering only]' with an empty
    // partition spec — assert none exists by checking the single-partition
    // exchange marker it requires
    assert(!p.contains("SinglePartition"), p)
  }

  test("blocked Jaccard generates candidates from postings, not a shingle self-join") {
    val p = plan("q_dedup_jaccard_blocked")
    // inverted-index form: the shingle mass is shuffled ONCE into posting
    // lists and pairs come from a Generate — a sort-merge self-join would
    // shuffle and sort the full shingle explosion twice
    assert(!p.contains("SortMergeJoin"), s"shingle self-join came back:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("LSH and simhash band pairing generate from postings — one exchange, no self-join") {
    import spark.implicits._
    val bands = Seq((0, 1L, 10L), (0, 1L, 11L), (1, 2L, 10L))
      .toDF("band", "band_key", "id")
    val lsh = graft.ops.Dedup.candidatePairs(bands, maxOccupancy = 8)
      .queryExecution.executedPlan.toString
    assert(!lsh.contains("SortMergeJoin") && !lsh.contains("BroadcastHashJoin"),
      s"band self-join came back:\n$lsh")
    assert(lsh.contains("Generate"), lsh)
    assert(lsh.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"posting aggregation should shuffle the band mass once (+1 for distinct):\n$lsh")
    val sim = graft.ops.Dedup
      .simhashNearDuplicates64(Seq((1L, 7L), (2L, 7L)).toDF("id", "simhash"))
      .queryExecution.executedPlan.toString
    assert(!sim.contains("SortMergeJoin") && !sim.contains("BroadcastHashJoin"),
      s"simhash band self-join came back:\n$sim")
    assert(sim.contains("Generate"), sim)
  }

  test("r14 codec kernels stay native in the plan (no ScalaUDF); the " +
    "decontamination gate plans equi/anti joins only — no cartesian") {
    // url canon (pct_normalize + idn_ascii), html strip (html_unescape),
    // trigram language id: all per-row kernels inside the projection
    for (q <- Seq("q_text_url_canon", "q_text_url_idn", "q_text_html_strip",
        "q_text_langid_ngram")) {
      val p = plan(q)
      assert(!p.contains("ScalaUDF"), s"$q fell back to a UDF:\n${p.take(600)}")
      assert(!p.contains("CartesianProduct"), q)
    }
    val gate = plan("q_contamination_decon")
    assert(!gate.contains("CartesianProduct") &&
      !gate.contains("BroadcastNestedLoopJoin"),
      s"the gate must stay equi/anti-join only:\n${gate.take(800)}")
    assert(gate.contains("LeftAnti"), "the gate's survivor step is an anti-join")
  }

  test("crawl-ingest capstone chains as one plan: no cartesian, kernels " +
    "native, the decon suite and mix rates ride broadcasts") {
    val p = plan("q_pipeline_crawl")
    assert(!p.contains("CartesianProduct"), s"crawl chain planned a cartesian:\n${p.take(800)}")
    assert(!p.contains("ScalaUDF"), s"a kernel fell back to a UDF:\n${p.take(800)}")
    // the %97 suite anti-join and the temperature-rate join are tiny
    // frames against the corpus — broadcasts, never corpus-vs-corpus SMJs
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in the chain:\n${p.take(800)}")
    assert(p.contains("LeftAnti"), "decontamination must plan an anti-join")
  }

  test("freq_items sketches partially before the exchange (O(k) shuffle volume)") {
    val p = plan("q_profile_heavyhitters")
    // the sketch is an object (not unsafe-row) aggregate; the partial mode
    // must appear BELOW the exchange so only k-sized buffers shuffle
    assert(p.contains("ObjectHashAggregate"), p)
    assert("partial_freq_items|partial.*freq_items|freq_items".r.findFirstIn(p).isDefined, p)
    val lines = p.linesIterator.toSeq
    val exchange = lines.indexWhere(_.contains("Exchange"))
    val partial = lines.lastIndexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial"))
    assert(exchange >= 0 && partial > exchange,
      s"no partial sketch below the exchange:\n$p")
  }

  test("r16 kernels stay native and shuffle-free: WARC parse rides the " +
    "scan-side Generate; deflate/image-meta/byte-decode are pure " +
    "projections; the bytes-fed capstone keeps the capstone's shape") {
    // warc_records: one per-shard parse exploded scan-side — the only
    // exchange the final presentation sort; never a join
    val w = plan("q_src_warc")
    assert(!w.contains("ScalaUDF"), s"warc parse fell back to a UDF:\n${w.take(600)}")
    assert(w.contains("Generate"), s"no scan-side explode:\n${w.take(600)}")
    assert(!w.contains("Join"), s"warc read must not join:\n${w.take(600)}")
    // per-row kernel controls: projection + presentation sort only
    // (r17 adds the block HTML extractor, the PDF tier, and the VP8L
    // pixel decode to the same contract)
    for (q <- Seq("q_text_deflate", "q_mm_image_meta", "q_text_from_bytes",
        "q_text_html_blocks", "q_src_pdf", "q_mm_decode_vp8l")) {
      val p = plan(q)
      assert(!p.contains("ScalaUDF"), s"$q fell back to a UDF:\n${p.take(600)}")
      assert(!p.contains("Join") && !p.contains("CartesianProduct"),
        s"$q is a per-row kernel — no joins belong in its plan:\n${p.take(600)}")
    }
    // the bytes-fed capstone twin carries the same plan contract as the
    // text-fed capstone: kernels native, equi/anti joins only, tiny
    // frames broadcast
    val p = plan("q_pipeline_crawl_bytes")
    assert(!p.contains("CartesianProduct"), s"bytes capstone planned a cartesian:\n${p.take(800)}")
    assert(!p.contains("ScalaUDF"), s"a kernel fell back to a UDF:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in the chain:\n${p.take(800)}")
    assert(p.contains("LeftAnti"), "decontamination must plan an anti-join")
    // the rung-attribution record is ONE hash aggregate over the rung
    // projection — partial map-side, no join (r17)
    val r = plan("q_text_rungs")
    assert(!r.contains("ScalaUDF") && !r.contains("Join"),
      s"q_text_rungs is a kernel projection + one aggregate:\n${r.take(600)}")
    assert(r.contains("HashAggregate"),
      s"rung counts must partial-aggregate:\n${r.take(600)}")
    // r18: the refusal card is the tier kernels scan-side into ONE hash
    // aggregate keyed by media type — vocabulary-sized groups, no join
    val rc = plan("q_src_refusal_card")
    assert(!rc.contains("ScalaUDF") && !rc.contains("Join"),
      s"refusal card is projection + one aggregate:\n${rc.take(600)}")
    assert(rc.contains("HashAggregate"),
      s"refusal counts must partial-aggregate:\n${rc.take(600)}")
    // r18: the crawl-fed BM25F keeps the fielded form's exact contract —
    // title/body kernels ride the scan projection (no UDF, no cartesian),
    // query terms broadcast into the postings
    val bf = plan("q_ret_bm25f_crawl")
    assert(!bf.contains("ScalaUDF") && !bf.contains("CartesianProduct"),
      s"crawl BM25F shape broke:\n${bf.take(800)}")
    assert(bf.contains("BroadcastHashJoin"),
      s"query terms must broadcast into the postings:\n${bf.take(800)}")
  }

  test("span dedup: equi-joins only — no occurrence-pair blowup") {
    // the operator's scale claim is that k occurrences of a window cost k
    // rows, never k² — so the plan must contain no cartesian and no
    // nested-loop join anywhere (duplication is a groupBy + equi-joins)
    val p = plan("q_dedup_exact_substring")
    assert(!p.contains("CartesianProduct"), s"span dedup planned a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"span dedup planned an NLJ:\n$p")
  }

  test("cms_sketch aggregates partially before the exchange (O(d*w) shuffle volume)") {
    // same shape contract as freq_items: the counter matrix combines
    // map-side, so the exchange ships d*w-long buffers per partition, one
    // record per distinct key never shuffles
    val p = plan("q_profile_cms")
    assert(p.contains("ObjectHashAggregate"), p)
    val lines = p.linesIterator.toSeq
    val exchange = lines.indexWhere(_.contains("Exchange"))
    val partial = lines.lastIndexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial"))
    assert(exchange >= 0 && partial > exchange,
      s"no partial sketch below the exchange:\n$p")
  }

  test("round-10 monitoring ops: no cartesians; weighted sample is an unshuffled TakeOrdered") {
    // one-row total/sketch attaches legitimately plan as broadcast NLJs;
    // what must never appear is a row-level cartesian
    for (q <- Seq("q_text_collocations", "q_profile_drift", "q_profile_joinsize",
        "q_ev_rate_spikes", "q_ev_count_anomalies")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
    }
    // A-ES top-k: per-partition heads merged on the driver — a global sort
    // of the corpus (Exchange rangepartitioning) must never appear
    val ws = plan("q_corpus_weighted_sample")
    assert(ws.contains("TakeOrderedAndProject"), ws)
    assert(!ws.contains("Exchange"), s"weighted sample shuffled:\n$ws")
  }

  test("round-11 additions: epoch repetition is broadcast+generator; miners join broadcast-side") {
    // epoch mix: rates reach the corpus as a BroadcastHashJoin and copies
    // come from a row-local generator — never a row-level cartesian
    val ep = plan("q_corpus_epoch_sample")
    assert(ep.contains("BroadcastHashJoin"), ep)
    assert(ep.contains("Generate explode"), ep)
    assert(!ep.contains("CartesianProduct"), s"epoch sample planned a cartesian:\n$ep")
    // hard negatives: the label exclusion is a broadcast LeftAnti; the
    // only corpus×queries product is the broadcast-side scorer
    val hn = plan("q_sim_hard_negatives")
    assert(hn.contains("LeftAnti"), hn)
    assert(!hn.contains("CartesianProduct"), s"hard negatives planned a cartesian:\n$hn")
    // NB classify: token-side joins are hash joins on bucket/label — the
    // only NLJ attaches are the one-row/labels-sized broadcast stats
    val nb = plan("q_text_nb_classify")
    assert(!nb.contains("CartesianProduct"), s"nb classify planned a cartesian:\n$nb")
    // BM25F: query terms broadcast into the weighted postings, wdl attach
    // is an equi-join — never a cartesian, and the term filter broadcasts
    val bf = plan("q_ret_bm25f")
    assert(bf.contains("BroadcastHashJoin"), bf)
    assert(!bf.contains("CartesianProduct"), s"bm25f planned a cartesian:\n$bf")
    // SCD2: the full-outer merge SPECIALIZES per branch — each union arm's
    // null-filter lets Catalyst rewrite the FullOuter into an Inner /
    // LeftOuter / RightOuter HASH join (broadcast at this scale) — never
    // a cartesian or NLJ, and always an equi-join on the key
    val scd = plan("q_scale_scd2")
    assert(scd.contains("HashJoin"), scd)
    assert(!scd.contains("CartesianProduct") && !scd.contains("BroadcastNestedLoopJoin"),
      s"scd2 planned a cartesian/NLJ:\n$scd")
  }

  test("round-12 serving paths: indexed stores never recompute their features; " +
    "span rebuild never explodes the corpus; scd2 guard lives in the plan") {
    // the incremental minhash index serves candidates from STORED band
    // rows — a minhash_sigs call in the serving plan would mean the corpus
    // is being re-signed (the exact cost the store exists to kill)
    val mh = plan("q_dedup_minhash_inc")
    assert(!mh.contains("minhash_sigs"), s"indexed serving re-signed the corpus:\n$mh")
    assert(!mh.contains("CartesianProduct") && !mh.contains("BroadcastNestedLoopJoin"),
      s"minhash-inc planned a cartesian/NLJ:\n$mh")
    // the multimodal feature store serves fingerprints from parquet — any
    // decode/synth kernel in the plan means payload bytes are being re-read
    val ph = plan("q_mm_phash_indexed")
    assert(!ph.contains("image_ahash") && !ph.contains("synth_image") &&
      !ph.contains("image_decode"),
      s"indexed phash re-decoded payloads:\n$ph")
    val af = plan("q_mm_audio_fp_indexed")
    assert(!af.contains("audio_fingerprint") && !af.contains("synth_wav"),
      s"indexed audio fp re-decoded payloads:\n$af")
    // span dedup rebuild (round 12): the token mass must NOT fan out into
    // cut-position rows — the old shape generated sequence(start, end) per
    // island and anti-joined every token through an exchange; the new
    // shape is a per-row HOF filter, so the only Generate left is the
    // window-hash posexplode
    val sp = plan("q_dedup_exact_substring")
    assert(!sp.contains("explode(sequence("),
      s"span rebuild regressed to position-explode:\n$sp")
    // the scd2 duplicate-key guard is IN the merge plan (raise_error over
    // a window count), not a separate eager pass
    val scd = plan("q_scale_scd2")
    assert(scd.contains("raise_error"), s"scd2 guard left the plan:\n$scd")
  }

  test("binary quantization: broadcast scan + WindowGroupLimit, no HOFs in the encode") {
    val p = plan("q_sim_binary")
    // queries broadcast against the codes scan; per-query top-k keeps the
    // partial-TakeOrdered shape (map-side WindowGroupLimit before exchange)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    // the sign-bit encode is statically unrolled integer ops — a lambda in
    // the plan means it regressed to interpreted higher-order functions
    assert(!p.contains("lambdafunction"), s"binary encode regressed to HOFs:\n$p")
  }

  test("paragraph dedup and memorization profile: equi-joins only, no cartesian") {
    for (q <- Seq("q_dedup_paragraph", "q_dedup_paragraph_all", "q_dedup_memorization")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a cartesian/NLJ:\n$p")
    }
  }

  test("within-doc line dedup is a pure projection — zero exchanges") {
    // the operator itself, without the driver query's presentation sort
    val d = graft.queries.Tpch.read(spark, dir, "documents")
    val p = graft.ops.Dedup.paragraphDedupWithinDoc(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"within-doc dedup shuffled:\n$p")
  }

  test("ORC mirror: filters and pruning push into the ORC scan like parquet") {
    val d = SparkEntry.queries("q_src_orc")(spark, dir)
    // q_src_orc materialized the mirror; a filtered projection over it must
    // push the predicate into the ORC reader and prune unread columns
    val filtered = d.where(org.apache.spark.sql.functions.col("doc_id") < 10)
      .select("doc_id", "lang")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert("PushedFilters: \\[[^\\]]*doc_id".r.findFirstIn(p).isDefined, p)
  }
}
