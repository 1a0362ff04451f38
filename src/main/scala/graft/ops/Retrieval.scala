package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over a document corpus: BM25 scoring and
 * reciprocal-rank-fusion (RRF) of ranked lists — the keyword half of the
 * hybrid (lexical + vector) retrieval stack a training-data/RAG pipeline
 * pairs with the ANN serving path in [[Similarity]].
 *
 * Reference model (public): Robertson/Spärck Jones BM25 with the Lucene
 * non-negative idf variant, `idf(t) = ln(1 + (N − df + ½)/(df + ½))`, and
 * Cormack et al. 2009 reciprocal rank fusion, `rrf(d) = Σ_lists 1/(K + rank)`.
 *
 * Scale shape: the corpus is tokenized ONCE into a `(doc, token, tf, dl)`
 * postings frame (document length rides the explode, so postings build in a
 * single shuffle of token mass); corpus-level statistics are a one-row
 * aggregate and a vocabulary-sized document-frequency table derived from the
 * postings. Query evaluation never rescans or reshuffles the corpus: query
 * terms join the df table into a terms×stats frame that is BROADCAST to the
 * postings, partial scores aggregate per (query, doc), and per-query top-k
 * compiles to `WindowGroupLimit` (map-side k-pruning before the final
 * exchange). Persist the postings frame once and serve many query batches —
 * the same build-once/query-many shape as the ANN index.
 *
 * Determinism: scores are IEEE-double arithmetic over exact integer tf/df/dl
 * and two plan-time constants (k1, b); scores round to 4 dp before ranking
 * (absorbing partial-sum order and within-ulp `ln` differences — the same
 * analysis as [[TextOps.unigramPerplexity]]) and ties break on ascending
 * document id, so rankings reproduce bit-identically across engines.
 */
object Retrieval {

  /** BM25 k1 (term-frequency saturation) and b (length normalization) —
    * the standard Robertson defaults. */
  val K1: Double = 1.2
  val B: Double = 0.75

  /** RRF smoothing constant (Cormack et al.'s k = 60). */
  val RrfK: Int = 60

  /**
   * Exact PHRASE search: documents containing the token sequence `phrase`
   * contiguously, with occurrence counts — the positional-query capability
   * BM25's bag-of-words postings cannot answer. Returns
   * `(<idCol>, n_occurrences)`.
   *
   * Relational positional intersection, ONE corpus pass and ONE shuffle:
   * tokenize with positions, keep ONLY rows whose token appears in the
   * phrase (the selectivity rides the explode — for a 3-term phrase over a
   * web corpus that is a tiny fraction of the token mass), fan each kept
   * occurrence to every phrase slot j its token fills (a duplicated term
   * like the "a" in "a a the" fills TWO slots — the literal slot map is a
   * broadcast `typedlit`), and group by the implied phrase START
   * `(id, p − j)`: a start where all m distinct slots are present is a
   * match. No per-document arrays, no self-join per phrase term (the
   * classic m-way positional-postings join), no window functions.
   */
  def phraseSearch(
      df: DataFrame, idCol: String, textCol: String, phrase: String): DataFrame = {
    val terms = phrase.split(" ").toIndexedSeq
    require(terms.nonEmpty && terms.forall(_.nonEmpty),
      s"phrase must be non-empty space-separated tokens, got '$phrase'")
    val m = terms.size
    val slotsByTerm: Map[String, Seq[Int]] =
      terms.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSeq }
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p", "t")))
      .where(col("t").isin(terms.distinct: _*))
      .select(col("id"), col("p"),
        explode(element_at(typedlit(slotsByTerm), col("t"))).as("j"))
      .groupBy(col("id"), (col("p") - col("j")).as("base"))
      .agg(count_distinct(col("j")).as("nj"))
      .where(col("nj") === m)
      .groupBy("id").agg(count(lit(1)).as("n_occurrences"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Postings frame: one row per (document, distinct token) with the term
   * frequency `tf` and the document token length `dl`. ONE shuffle: `dl` is
   * computed on the unexploded row and carried through the explode, so no
   * second exchange or corpus self-join is needed to attach it. This is the
   * persistable index artifact — build once, serve every query batch.
   */
  def bm25Postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("_ts"))
      .select(col("doc_id"), size(col("_ts")).as("dl"), explode(col("_ts")).as("token"))
      .groupBy("doc_id", "token")
      // dl is constant within the doc, so max() just carries it through
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Corpus statistics (one row): document count and total token count.
    * `avgdl` is derived as an exact double ratio at scoring time. */
  def bm25Stats(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("total_tokens"))

  /** Per-token document frequency, derived from the postings frame (postings
    * rows are already (doc, token)-distinct, so this is a plain count). */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("token").agg(count(lit(1)).as("df"))

  /**
   * Multi-query BM25 top-k over a prebuilt postings frame.
   *
   * `queries` must have columns `(qid, qtext)`; query terms are
   * whitespace-tokenized and DEDUPLICATED (short-query convention: query-side
   * tf is ignored). Terms absent from the corpus vocabulary drop out of the
   * inner df join and contribute nothing. Output: `(qid, rank, doc_id,
   * score)` with `rank ∈ [1, k]` dense per query.
   *
   * Plan: qterms (tiny) ⋈ df-table → per-term idf, broadcast into the
   * postings; matched postings aggregate per (qid, doc); `row_number ≤ k`
   * compiles to WindowGroupLimit. The corpus-stats frame rides a broadcast
   * cross join — nothing collects to the driver.
   */
  def bm25TopK(
      postings: DataFrame, stats: DataFrame, queries: DataFrame, k: Int,
      k1: Double = K1, b: Double = B): DataFrame =
    bm25Score(postings, docFreq(postings), stats, queries, k, k1, b)

  /** Scoring core shared by the direct and persisted-index paths: `dfreq`
    * is the per-token document-frequency table (derived or precomputed). */
  private def bm25Score(
      postings: DataFrame, dfreq: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qterms = queries.select(
      col("qid"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
    val termStats = dfreq.join(broadcast(qterms), Seq("token"))
    val scored = postings
      .join(broadcast(termStats), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("qid"), col("doc_id"),
        // idf(t) = ln(1 + (N − df + ½)/(df + ½)); tf saturation with
        // length normalization against avgdl = total_tokens / n_docs
        (log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") * col("n_docs").cast("double") /
                col("total_tokens").cast("double"))))
          .as("_s"))
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("_s")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score")
  }

  /** Convenience: build postings + stats from the corpus and score
    * (single-shot form; for repeated batches build the postings once). */
  def bm25(
      df: DataFrame, idCol: String, textCol: String, queries: DataFrame,
      k: Int, k1: Double = K1, b: Double = B): DataFrame =
    bm25TopK(bm25Postings(df, idCol, textCol), bm25Stats(df, textCol),
      queries, k, k1, b)

  /**
   * PHRASE-CONSTRAINED BM25: rank only documents containing `phrase`
   * contiguously ([[phraseSearch]]), scored with FULL-corpus statistics —
   * idf and avgdl come from the whole collection, because a filter
   * narrows the candidate set but must never redefine term rarity (the
   * filter-vs-scoring split every production engine makes). The phrase
   * hit set cuts the postings by a semi-join BEFORE any scoring work, so
   * a selective phrase makes the query CHEAPER than unconstrained BM25,
   * never a post-filter over a full ranking.
   */
  def bm25Phrase(
      df: DataFrame, idCol: String, textCol: String, queries: DataFrame,
      phrase: String, k: Int, k1: Double = K1, b: Double = B): DataFrame = {
    val postings = bm25Postings(df, idCol, textCol)
    val hits = phraseSearch(df, idCol, textCol, phrase)
      .select(col(idCol).as("doc_id"))
    bm25Score(postings.join(hits, Seq("doc_id"), "left_semi"),
      docFreq(postings), bm25Stats(df, textCol), queries, k, k1, b)
  }

  /**
   * BM25F multi-field ranking (Robertson & Zaragoza 2004's weighted-field
   * model; the Elasticsearch `combined_fields` variant): per-field term
   * frequencies are scaled by the field boost and summed into ONE
   * pseudo-document frequency — `wtf(d,t) = Σ_f w_f·tf_{f,t}` — and the
   * document length normalizes the same way (`wdl = Σ_f w_f·dl_f`,
   * averaged over the corpus), so a title hit counts `w_title/w_body`
   * times a body hit but saturates through the SAME k1 curve instead of
   * summing independent per-field BM25 scores (the known failure of naive
   * field fusion: a term matching three weak fields outscores one strong
   * match). `df` counts documents containing the term in ANY field;
   * documents enter the stats when ANY field is non-null.
   *
   * Plan: one corpus scan per field unions into one (doc, token)
   * aggregate; `wdl` derives from the postings themselves
   * (`Σ_t wtf = Σ_f w_f·dl_f`), so there is NO second corpus pass — the
   * wdl attach is a doc-keyed equi-join of token-distinct frames, joined
   * AFTER the query-term filter so only matched docs move. Exact-binary
   * boosts (0.5, 1.0, 2.0, …) keep every weighted sum order-exact; the
   * 4-dp round-then-rank absorbs the rest (the engine's standard
   * determinism contract).
   */
  def bm25F(
      df: DataFrame, idCol: String, fields: Seq[(String, Double)],
      queries: DataFrame, k: Int, k1: Double = K1, b: Double = B): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fields.nonEmpty, "bm25F needs at least one field")
    fields.foreach { case (c, w) =>
      require(w > 0, s"field '$c' has a non-positive boost $w") }
    val tok = fields.map { case (c, w) =>
      df.where(col(c).isNotNull)
        .select(col(idCol).as("doc_id"),
          explode(TextOps.tokens(col(c))).as("token"), lit(w).as("_w"))
    }.reduce(_ unionByName _)
    val postings = tok.groupBy("doc_id", "token").agg(sum(col("_w")).as("wtf"))
      .localCheckpoint()
    val wdl = postings.groupBy("doc_id").agg(sum(col("wtf")).as("wdl"))
    val stats = wdl.agg(
      count(lit(1)).as("n_docs"), sum(col("wdl")).as("total_wdl"))
    val dfreq = postings.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = queries.select(
      col("qid"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
    val termStats = dfreq.join(broadcast(qterms), Seq("token"))
    val scored = postings
      .join(broadcast(termStats), Seq("token"))
      .join(wdl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(
        col("qid"), col("doc_id"),
        (log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("wtf") * lit(k1 + 1.0)) /
          (col("wtf") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("wdl") * col("n_docs").cast("double") /
                col("total_wdl"))))
          .as("_s"))
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("_s")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score")
  }

  /**
   * RM3-style pseudo-relevance-feedback expansion (Abdul-Jaleel et al.
   * 2004; the Anserini/Lucene default expansion model): a first BM25 pass
   * retrieves `fbDocs` feedback documents per query, their terms are
   * weighted by `rel(t) = Σ_D (tf(t,D)/|D|) · score(q,D)` (relevance-model
   * weights with the BM25 score as the document posterior), the top
   * `fbTerms` terms normalize to a distribution, and the final query
   * interpolates `origWeight · uniform(original terms) + (1−origWeight) ·
   * expansion` — then a second, WEIGHTED BM25 pass ranks the corpus under
   * the expanded query. Deterministic end to end: 6-dp rounds at the two
   * sum points (term weights), the engine's 4-dp round-then-rank on both
   * passes, token tie-breaks on the term-selection cut.
   *
   * Scale shape: the postings frame is built ONCE and materialized (it
   * feeds pass-1 scoring, feedback-term weighting, and pass-2 scoring —
   * the tokenize-once retention discipline); everything query-sided
   * (feedback lists, term weights — queries × (|Q| + fbTerms) rows)
   * stays broadcast-sized, so both passes are the standard broadcast-
   * into-postings plan and the corpus is scanned, not shuffled.
   */
  def bm25Rm3(
      df: DataFrame, idCol: String, textCol: String, queries: DataFrame,
      k: Int, fbDocs: Int = 5, fbTerms: Int = 10, origWeight: Double = 0.5,
      k1: Double = K1, b: Double = B): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fbDocs > 0 && fbTerms > 0, "fbDocs and fbTerms must be positive")
    require(origWeight >= 0.0 && origWeight <= 1.0,
      s"origWeight must be in [0,1], got $origWeight")
    val postings = bm25Postings(df, idCol, textCol).localCheckpoint()
    val stats = bm25Stats(df, textCol)
    val dfreq = docFreq(postings)
    val pass1 = bm25Score(postings, dfreq, stats, queries, fbDocs, k1, b)
    val weights = rm3Weights(postings, pass1, queries, fbTerms, origWeight)
    bm25ScoreWeighted(postings, dfreq, stats, weights, k, k1, b)
  }

  /**
   * [[bm25Rm3]] served from a PERSISTED lexical index — the
   * build-once/query-many form. Pass 1 is the token-pruned
   * [[bm25TopKIndexed]]; the feedback-doc term fetch is the ONE postings
   * scan that cannot token-prune (pseudo-relevance feedback needs the
   * feedback docs' full term vectors — the classic forward-index trade;
   * the scan's OUTPUT is bounded by queries × fbDocs docs' token mass and
   * the doc_id probe is a broadcast join); pass 2 collects the expanded
   * term set (bounded by queries × (|Q| + fbTerms), same fail-loud
   * [[MaxQueryTerms]] contract as the unexpanded path) back into a
   * literal `IN`, so the scoring scan recovers the token-range
   * footer-stat pruning.
   */
  def bm25Rm3Indexed(
      index: LexIndex, queries: DataFrame, k: Int,
      fbDocs: Int = 5, fbTerms: Int = 10, origWeight: Double = 0.5,
      k1: Double = K1, b: Double = B): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(fbDocs > 0 && fbTerms > 0, "fbDocs and fbTerms must be positive")
    require(origWeight >= 0.0 && origWeight <= 1.0,
      s"origWeight must be in [0,1], got $origWeight")
    val pass1 = bm25TopKIndexed(index, queries, fbDocs, k1, b)
    // bounded (queries × (|Q| + fbTerms) rows) — pinned so the term-set
    // collect and the pass-2 join don't recompute the feedback scan
    val weights = rm3Weights(index.postings, pass1, queries, fbTerms, origWeight)
      .localCheckpoint()
    val terms = weights.select("token").distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.size <= MaxQueryTerms,
      s"bm25Rm3Indexed expanded to ${terms.size} distinct terms " +
        s"(max $MaxQueryTerms) — pass an interactive query batch, not a corpus")
    bm25ScoreWeighted(
      index.postings.where(col("token").isin(terms: _*)),
      index.docFreq.where(col("token").isin(terms: _*)),
      index.stats, weights, k, k1, b)
  }

  /** Shared RM3 weight model: relevance-model term weights over the
    * pass-1 feedback lists, top-`fbTerms` cut, normalization, and the
    * `origWeight` interpolation with the uniform original query —
    * `(qid, token, w)`, every frame queries-sided and broadcast-sized. */
  private def rm3Weights(
      postings: DataFrame, pass1: DataFrame, queries: DataFrame,
      fbTerms: Int, origWeight: Double): DataFrame = {
    val rel = postings
      .join(broadcast(pass1.select(col("qid"), col("doc_id"), col("score"))),
        Seq("doc_id"))
      .groupBy(col("qid"), col("token"))
      .agg(round(sum(
        col("tf").cast("double") / col("dl").cast("double") * col("score")), 6)
        .as("rel"))
    val tw = Window.partitionBy("qid").orderBy(col("rel").desc, col("token").asc)
    val qw = Window.partitionBy("qid")
    val expTerms = rel
      .withColumn("_trn", row_number().over(tw))
      .where(col("_trn") <= fbTerms)
      .withColumn("_den", sum(col("rel")).over(qw))
      .select(col("qid"), col("token"), (col("rel") / col("_den")).as("w_exp"))
    val origTerms = queries
      .select(col("qid"),
        explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
      .withColumn("w_orig", lit(1.0) / count(lit(1)).over(qw))
    origTerms.select("qid", "token", "w_orig")
      .join(expTerms, Seq("qid", "token"), "full_outer")
      .select(col("qid"), col("token"),
        round(lit(origWeight) * coalesce(col("w_orig"), lit(0.0)) +
          lit(1.0 - origWeight) * coalesce(col("w_exp"), lit(0.0)), 6).as("w"))
  }

  /** Weighted variant of the scoring core: `termWeights` is
    * `(qid, token, w)` and each term's BM25 contribution scales by `w`
    * (the expanded-query second pass). Same plan shape as [[bm25Score]]. */
  private def bm25ScoreWeighted(
      postings: DataFrame, dfreq: DataFrame, stats: DataFrame,
      termWeights: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    val termStats = dfreq.join(broadcast(termWeights), Seq("token"))
    val scored = postings
      .join(broadcast(termStats), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(
        col("qid"), col("doc_id"),
        (col("w") *
          (log(lit(1.0) +
            (col("n_docs").cast("double") - col("df") + lit(0.5)) /
              (col("df").cast("double") + lit(0.5))) *
            (col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) +
                lit(b) * col("dl").cast("double") * col("n_docs").cast("double") /
                  col("total_tokens").cast("double")))))
          .as("_s"))
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("_s")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score")
  }

  /**
   * Reciprocal rank fusion of N ranked lists (each `(qid, doc_id, rank)`):
   * `rrf = Σ_lists 1/(rrfK + rank)`, documents absent from a list simply
   * contribute nothing — the standard way to combine lexical and vector
   * rankings without score calibration (Cormack et al. 2009). Output
   * `(qid, rank, doc_id, rrf)` with the fused top-k per query.
   *
   * Inputs are k-bounded per query by construction, so the union is tiny
   * relative to the corpus; the fused ranking is one aggregate + one
   * WindowGroupLimit. `rrf` rounds to 6 dp before ranking (sum order across
   * lists), ties break on ascending doc id.
   */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = RrfK): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0, s"k must be positive, got $k")
    val contrib = lists
      .map(_.select(col("qid"), col("doc_id"),
        (lit(1.0) / (lit(rrfK).cast("double") + col("rank"))).as("_c")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id").asc)
    contrib
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("_c")), 6).as("rrf"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "doc_id", "rrf")
  }

  /**
   * Ranking-quality evaluation — the measurement layer of a retrieval
   * pipeline: per query, graded nDCG@k (`(2^g − 1)/log₂(rank+1)` gains,
   * ideal ordering by grade desc / doc_id asc), MRR (reciprocal rank of
   * the first relevant hit, 0 if none retrieved), precision@k and
   * recall@k. `results` is any `(qid, rank, doc_id)` ranking (the output
   * contract of every top-k in this module); `qrels` is
   * `(qid, doc_id, grade)` with grade ≥ 1 meaning relevant (unjudged
   * pairs count grade 0 — the TREC convention). Queries with no judged
   * relevant document score ndcg/recall 0. Output:
   * `(qid, ndcg, mrr, prec, recall)`, all rounded to 6 dp.
   *
   * Scale shape: `results` is k-bounded per query by construction and
   * qrels is an evaluation set (orders of magnitude smaller than any
   * corpus) — every join and aggregate here moves queries × k rows; at
   * typical sizes the whole evaluation is broadcast-joined, nothing
   * corpus-scale is touched at all.
   */
  def evalRanking(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // rank ≤ k applies INSIDE the aggregate, not as a pre-filter: a query
    // whose surviving rows all sit above k (a rank-offset slice, a fused
    // list) must still emit a zeroed row — filtered away it would vanish
    // from the spine below and silently inflate macro-averages
    val graded = results
      .select(col("qid"), col("rank"), col("doc_id"))
      .join(qrels.select(col("qid"), col("doc_id"), col("grade")),
        Seq("qid", "doc_id"), "left")
      .withColumn("g", coalesce(col("grade"), lit(0)))
    val inK = col("rank") <= k
    val perQ = graded.groupBy("qid").agg(
      round(coalesce(sum(when(inK,
        (pow(lit(2.0), col("g")) - lit(1.0)) / log2(col("rank") + 1))), lit(0.0)), 6)
        .as("dcg"),
      round(max(when(inK && col("g") > 0, lit(1.0) / col("rank"))
        .otherwise(lit(0.0))), 6).as("mrr"),
      sum(when(inK && col("g") > 0, 1).otherwise(0)).as("n_rel_ret"))
    val iw = Window.partitionBy("qid").orderBy(col("grade").desc, col("doc_id").asc)
    val ideal = qrels.where(col("grade") > 0)
      .withColumn("irank", row_number().over(iw))
      .where(col("irank") <= k)
      .groupBy("qid")
      .agg(round(sum(
        (pow(lit(2.0), col("grade")) - lit(1.0)) / log2(col("irank") + 1)), 6)
        .as("idcg"))
    val nrel = qrels.where(col("grade") > 0)
      .groupBy("qid").agg(count(lit(1)).as("n_rel"))
    // evaluate over the JUDGED query set (the trec_eval convention): a
    // query present in qrels that retrieved zero results must emit a
    // zeroed row, not vanish — dropping it would overstate macro-averages.
    // The spine is perQ FULL-OUTER the distinct judged qids, NOT
    // (results ∪ qrels).distinct ⟕ perQ: that shape referenced `results`
    // — the entire retrieval lineage — twice, with different projections
    // below the exchanges, so no stage could be reused and the BM25 chain
    // executed twice per eval (the round-12 bench regression). perQ
    // aggregates over ALL results rows (the k cut lives inside the
    // aggregate), so its qid set IS results' — including queries whose
    // rows all sit above k.
    val judged = qrels.select(col("qid")).distinct()
    perQ
      .join(judged, Seq("qid"), "full_outer")
      .withColumn("dcg", coalesce(col("dcg"), lit(0.0)))
      .withColumn("mrr", coalesce(col("mrr"), lit(0.0)))
      .withColumn("n_rel_ret", coalesce(col("n_rel_ret"), lit(0L)))
      .join(ideal, Seq("qid"), "left")
      .join(nrel, Seq("qid"), "left")
      .select(
        col("qid"),
        round(when(col("idcg").isNull || col("idcg") === 0, lit(0.0))
          .otherwise(col("dcg") / col("idcg")), 6).as("ndcg"),
        col("mrr"),
        round(col("n_rel_ret").cast("double") / k, 6).as("prec"),
        round(when(col("n_rel").isNull, lit(0.0))
          .otherwise(col("n_rel_ret").cast("double") / col("n_rel")), 6)
          .as("recall"))
  }

  /**
   * Weighted min-max score fusion of N ranked lists (each
   * `(qid, doc_id, score)`) — the calibrated-score alternative to
   * [[rrfFuse]] when raw scores carry magnitude information worth keeping
   * (RRF deliberately discards it): per query per list, scores rescale to
   * `[0,1]` via `(s − min)/(max − min)` (a single-candidate or constant
   * list normalizes to 1.0 — the best score maps to 1 by convention),
   * then fuse as `Σ wᵢ · normᵢ` with documents absent from a list
   * contributing 0. Output `(qid, rank, doc_id, fused)`, fused rounded to
   * 6 dp before ranking, ties on ascending doc id.
   *
   * Scale shape: inputs are k-bounded per query by construction (top-k
   * lists), so the per-list min/max window, the union, and the fuse
   * aggregate all act on queries × k rows — nothing corpus-sized moves.
   */
  def fuseNormalized(lists: Seq[(DataFrame, Double)], k: Int): DataFrame = {
    require(lists.nonEmpty, "fuseNormalized needs at least one scored list")
    require(k > 0, s"k must be positive, got $k")
    require(lists.forall(_._2 > 0), "fusion weights must be positive")
    val qw = Window.partitionBy("qid")
    val contrib = lists.map { case (df, wgt) =>
      df.select(col("qid"), col("doc_id"), col("score").cast("double").as("_s"))
        .withColumn("_mn", min(col("_s")).over(qw))
        .withColumn("_mx", max(col("_s")).over(qw))
        .select(col("qid"), col("doc_id"),
          (lit(wgt) * when(col("_mx") === col("_mn"), lit(1.0))
            .otherwise((col("_s") - col("_mn")) / (col("_mx") - col("_mn"))))
            .as("_c"))
    }.reduce(_ unionByName _)
    val rw = Window.partitionBy("qid").orderBy(col("fused").desc, col("doc_id").asc)
    contrib
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("_c")), 6).as("fused"))
      .withColumn("rank", row_number().over(rw).cast("int"))
      .where(col("rank") <= k)
      .select("qid", "rank", "doc_id", "fused")
  }

  // -------------------------------------------------------------------------
  // Persisted lexical index — build-once/query-many with incremental append,
  // committed through ManifestStore.CommitProtocol (the same pluggable
  // HDFS-atomic-rename / S3-read-repair tiers as the table upserts and the
  // ANN index). Layout: gen=<V>-<token>/{postings, tokenstats, corpusstats};
  // the `_lex.<v>` manifest lists live segment generations (`seg\t<genId>`).
  //
  // Segments are DOC-DISJOINT by contract (append takes NEW documents, the
  // same contract as Similarity.appendToIndex) — that is what makes the
  // per-segment document-frequency partials and corpus stats additive, so
  // serving merges vocabulary-sized frames, never rescans the corpus.
  // Postings are range-clustered and sorted by token inside each segment:
  // parquet footer min/max lets a query's term filter skip every file whose
  // token range can't match.
  // -------------------------------------------------------------------------

  /** A loaded lexical index: unioned postings plus the merged (additive)
    * document-frequency and corpus-stats frames. */
  final class LexIndex(
      val postings: DataFrame, val docFreq: DataFrame, val stats: DataFrame)

  /** Fail-loud bound on distinct terms per query batch in
    * [[bm25TopKIndexed]]: the term set is collected to push a literal
    * file-skipping filter — the contract is interactive query batches,
    * not a corpus join. */
  val MaxQueryTerms: Int = 4096

  private def lexGenNumber(genId: String): Long = genId.takeWhile(_.isDigit).toLong

  private def newLexGenId(version: Long): String =
    s"$version-${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  /** Fresh generation number: strictly above the committed manifest version
    * and every `gen=` directory on disk (crash debris is never reused). */
  private def nextLexGen(spark: SparkSession, indexDir: String): Long = {
    val hfs = ManifestStore.fs(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val onDisk =
      if (!hfs.exists(dir)) Seq.empty[Long]
      else hfs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("gen=")).map(n => lexGenNumber(n.stripPrefix("gen="))).toSeq
    val committed = ManifestStore.readVersioned(spark, indexDir, "_lex").map(_._1)
    (committed.toSeq ++ onDisk :+ 0L).max + 1
  }

  /** `(segments, delete generations, idempotence tags)` — tags are the
    * round-15 replay markers ([[ManifestStore.boundTags]] retention): a
    * tagged [[appendToLexIndex]] whose tag is already here is a replayed
    * micro-batch and must NOT append again, or its df/corpus-stat partials
    * would double and skew every later BM25 score. */
  private def parseLexManifest(content: String): (Seq[String], Seq[String], Seq[String]) = {
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    (lines.collect { case l if l.startsWith("seg\t") => l.stripPrefix("seg\t") },
      lines.collect { case l if l.startsWith("del\t") => l.stripPrefix("del\t") },
      lines.collect { case l if l.startsWith("tag\t") => l.stripPrefix("tag\t") })
  }

  private def lexManifestContent(
      segs: Seq[String], delGens: Seq[String], tags: Seq[String]): String = {
    tags.foreach(ManifestStore.requireTagShape)
    (segs.map(g => s"seg\t$g") ++ delGens.map(g => s"del\t$g") ++
      ManifestStore.boundTags(tags).map(t => s"tag\t$t"))
      .mkString("", "\n", "\n")
  }

  /** One segment's four artifacts. The doc-frequency partial is derived by
    * re-reading the just-written postings (cheaper than re-tokenizing the
    * corpus, and it audits that the written bytes are readable). `doclens`
    * (Lucene's norms analog: one `(doc_id, dl)` row per document,
    * INCLUDING zero-token docs the postings explode drops) exists for the
    * delete path — tombstone stat adjustment must know exactly what each
    * deleted doc contributed to `n_docs`/`total_tokens`, which postings
    * alone cannot say for an empty document. */
  private def writeSegment(
      df: DataFrame, idCol: String, textCol: String, base: String): Unit = {
    val spark = df.sparkSession
    bm25Postings(df, idCol, textCol)
      .repartitionByRange(col("token"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$base/postings")
    val written = spark.read.parquet(s"$base/postings")
    docFreq(written).coalesce(1).write.mode("overwrite").parquet(s"$base/tokenstats")
    bm25Stats(df, textCol).coalesce(1).write.mode("overwrite")
      .parquet(s"$base/corpusstats")
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$base/doclens")
  }

  /** Build and commit a lexical index over `df`. Rebuilding over an existing
    * index is safe: old generations are untouched and the old manifest
    * stays authoritative until the new commit lands. `tag` records an
    * idempotence marker with the initial commit so a bootstrap micro-batch
    * replayed after a crash (the index is committed by then, so the stream
    * takes the append path) is recognized there. */
  def writeLexIndex(
      df: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      tag: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val gen = nextLexGen(spark, indexDir)
    val genId = newLexGenId(gen)
    writeSegment(df, idCol, textCol, s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, "_lex", gen,
      lexManifestContent(Seq(genId), Seq.empty, tag.toSeq))
  }

  /** Every live segment must carry the `doclens` artifact before a
    * delete/purge can account stats exactly — a pre-round-11 index
    * (postings-only segments) fails LOUD here instead of PATH_NOT_FOUND
    * deep inside the stat adjustment. Rebuild with [[writeLexIndex]] or
    * compact first. */
  private def requireDoclens(
      spark: SparkSession, indexDir: String, segs: Seq[String], op: String): Unit = {
    val hfs = ManifestStore.fs(spark, indexDir)
    val missing = segs.filterNot(g =>
      hfs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/gen=$g/doclens")))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"$op: lexical index at $indexDir has segments without the doclens artifact " +
        s"(${missing.mkString(", ")}) — a pre-doclens-layout index; rebuild with " +
        "writeLexIndex before deleting")
  }

  private def segUnion(
      spark: SparkSession, indexDir: String, segs: Seq[String],
      artifact: String): DataFrame =
    segs.map(g => spark.read.parquet(s"$indexDir/gen=$g/$artifact"))
      .reduce(_.unionByName(_))

  private def liveTombstones(
      spark: SparkSession, indexDir: String, delGens: Seq[String]): Option[DataFrame] =
    if (delGens.isEmpty) None
    else Some(delGens
      .map(g => spark.read.parquet(s"$indexDir/gen=$g/tombstones"))
      .reduce(_.unionByName(_)).distinct())

  /**
   * Tombstone DELETE from the lexical index — the takedown path without a
   * corpus re-tokenize or index rebuild: commit the doc ids as a tiny
   * `del` generation holding three artifacts —
   *
   *  - `tombstones/` — the id list, anti-joined into the postings scan at
   *    read time (the deleted docs can never be retrieved again);
   *  - `tokenstats/` — NEGATIVE per-token df partials (each deleted doc's
   *    df contribution, read off the live postings themselves), so the
   *    read-time df fold yields exactly the remaining corpus's df;
   *  - `corpusstats/` — negative `(n_docs, total_tokens)` from the
   *    `doclens` artifact (exact even for zero-token documents).
   *
   * After this commit, [[bm25TopKIndexed]] over the index scores
   * IDENTICALLY to [[bm25]] over the corpus minus the deleted docs —
   * df, N and avgdl all adjust, not just the retrievable set (spec-pinned
   * parity). Stat partials are computed against the SERVING view (live
   * postings minus prior tombstones), so re-deleting an id or deleting an
   * unknown id contributes zero — idempotent by construction. Physical
   * removal is [[purgeLexTombstones]]'s job.
   *
   * Note the append/delete ordering contract: a tombstone hides the id in
   * EVERY segment, so re-adding a deleted document requires a purge first
   * (the same contract the ANN index's [[graft.ops.Similarity.deleteFromIndex]]
   * carries).
   */
  def deleteFromLexIndex(ids: DataFrame, indexDir: String): Unit = {
    val spark = ids.sparkSession
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_lex")
      .getOrElse(throw new IllegalStateException(
        s"no committed lexical index under $indexDir to delete from"))
    val (segs, delGens, tags) = parseLexManifest(content)
    val dels = ids.select(col("doc_id")).distinct().localCheckpoint()
    if (dels.isEmpty) return
    requireDoclens(spark, indexDir, segs, "deleteFromLexIndex")
    val prior = liveTombstones(spark, indexDir, delGens)
    def live(artifact: String): DataFrame = {
      val all = segUnion(spark, indexDir, segs, artifact)
      prior.fold(all)(t => all.join(broadcast(t), Seq("doc_id"), "left_anti"))
    }
    val gen = math.max(nextLexGen(spark, indexDir), ver + 1)
    val genId = newLexGenId(gen)
    val base = s"$indexDir/gen=$genId"
    dels.coalesce(1).write.mode("overwrite").parquet(s"$base/tombstones")
    live("postings").join(broadcast(dels), Seq("doc_id"), "left_semi")
      .groupBy("token").agg(negate(count(lit(1))).as("df"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/tokenstats")
    live("doclens").join(broadcast(dels), Seq("doc_id"), "left_semi")
      .agg(
        negate(count(lit(1))).as("n_docs"),
        negate(coalesce(sum(col("dl")), lit(0L))).as("total_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/corpusstats")
    ManifestStore.commitVersioned(spark, indexDir, "_lex", gen,
      lexManifestContent(segs, delGens :+ genId, tags))
  }

  /**
   * Physical tombstone purge: rewrite all live segments minus tombstoned
   * docs into ONE consolidated segment (token-range-reclustered, stats
   * recomputed from the surviving rows), commit a manifest with no `del`
   * lines — after this plus [[vacuumLexIndex]] no byte of a deleted
   * document remains. Full-compaction cost, paid when the tombstone debt
   * is collected, not per delete. Serving identical before/after.
   * Returns the number of tombstoned ids retired.
   */
  def purgeLexTombstones(spark: SparkSession, indexDir: String): Long = {
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_lex")
      .getOrElse(throw new IllegalStateException(
        s"no committed lexical index under $indexDir"))
    val (segs, delGens, tags) = parseLexManifest(content)
    if (delGens.isEmpty) return 0L
    requireDoclens(spark, indexDir, segs, "purgeLexTombstones")
    val ts = liveTombstones(spark, indexDir, delGens).get.localCheckpoint()
    val nTs = ts.count()
    val gen = math.max(nextLexGen(spark, indexDir), ver + 1)
    val genId = newLexGenId(gen)
    val base = s"$indexDir/gen=$genId"
    segUnion(spark, indexDir, segs, "postings")
      .join(broadcast(ts), Seq("doc_id"), "left_anti")
      .repartitionByRange(col("token")).sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$base/postings")
    docFreq(spark.read.parquet(s"$base/postings"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/tokenstats")
    segUnion(spark, indexDir, segs, "doclens")
      .join(broadcast(ts), Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$base/doclens")
    spark.read.parquet(s"$base/doclens")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/corpusstats")
    ManifestStore.commitVersioned(spark, indexDir, "_lex", gen,
      lexManifestContent(Seq(genId), Seq.empty, tags))
    nTs
  }

  /** Incremental append of a NEW-document batch as one more segment —
    * serving over the appended index equals [[bm25]] over the concatenated
    * corpus (spec-pinned). An empty delta is a no-op.
    *
    * `tag` makes the append IDEMPOTENT under at-least-once replay (round
    * 15): a tag already in the manifest — committed atomically with its
    * segment — skips the append, so a checkpoint-replayed micro-batch
    * never doubles df/corpus-stat partials (which would silently skew
    * every subsequent BM25 score). */
  def appendToLexIndex(
      delta: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      tag: Option[String] = None): Unit = {
    val spark = delta.sparkSession
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_lex")
      .getOrElse(throw new IllegalStateException(
        s"no committed lexical index under $indexDir to append to"))
    val (segs, delGens, tags) = parseLexManifest(content)
    if (tag.exists(tags.contains)) return // replayed batch: already a segment
    if (delta.isEmpty) return
    val gen = math.max(nextLexGen(spark, indexDir), ver + 1)
    val genId = newLexGenId(gen)
    writeSegment(delta, idCol, textCol, s"$indexDir/gen=$genId")
    ManifestStore.commitVersioned(spark, indexDir, "_lex", gen,
      lexManifestContent(segs :+ genId, delGens, tags ++ tag))
  }

  /** True iff `indexDir` holds a committed lexical index. */
  def lexIndexCommitted(indexDir: String): Boolean =
    ManifestStore.readVersioned(SparkSession.active, indexDir, "_lex").isDefined

  /** One-call lexical-index health report (the
    * [[graft.ops.Similarity.indexStats]] twin): committed version, live
    * segments (the [[compactLexIndex]] pressure number), tombstone
    * generations + ids (the [[purgeLexTombstones]] debt), and debris
    * directories (the [[vacuumLexIndex]] reclaim number). Listings plus
    * one tiny tombstone read — postings are never touched. */
  final case class LexIndexStats(
      version: Long, segments: Int, tombstoneGenerations: Int,
      tombstonedIds: Long, debrisGenerations: Int)

  def lexIndexStats(spark: SparkSession, indexDir: String): Option[LexIndexStats] =
    ManifestStore.readVersioned(spark, indexDir, "_lex").map { case (ver, content) =>
      val (segs, delGens, _) = parseLexManifest(content)
      val nTs = liveTombstones(spark, indexDir, delGens)
        .map(_.count()).getOrElse(0L)
      val live = (segs ++ delGens).toSet
      val hfs = ManifestStore.fs(spark, indexDir)
      val dir = new org.apache.hadoop.fs.Path(indexDir)
      val onDisk =
        if (!hfs.exists(dir)) Set.empty[String]
        else hfs.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=")).toSet
      LexIndexStats(ver, segs.size, delGens.size, nTs, (onDisk -- live).size)
    }

  /** Load the committed index: postings union over live segments; df and
    * corpus stats fold the per-segment partials (vocabulary-sized work —
    * the corpus is never rescanned at load or serve time). */
  def readLexIndex(spark: SparkSession, indexDir: String): LexIndex =
    readLexIndexFrom(spark, indexDir,
      ManifestStore.readVersioned(spark, indexDir, "_lex")
        .getOrElse(throw new IllegalStateException(
          s"no committed lexical index under $indexDir"))._2)

  /** TIME TRAVEL: the lexical index as of commit version `asOf` — the
    * [[graft.ops.Similarity.readIndexAt]] twin; readable until
    * [[vacuumLexIndex]]/[[purgeLexTombstones]] reclaim the generations
    * it references. */
  def readLexIndexAt(spark: SparkSession, indexDir: String, asOf: Long): LexIndex =
    readLexIndexFrom(spark, indexDir,
      ManifestStore.readVersionedAt(spark, indexDir, "_lex", asOf)
        .getOrElse(throw new IllegalStateException(
          s"no lexical index committed at or before version $asOf under $indexDir"))._2)

  /** All committed lexical-index versions, ascending. */
  def lexIndexVersions(spark: SparkSession, indexDir: String): Seq[Long] =
    ManifestStore.versionsOf(spark, indexDir, "_lex")

  private def readLexIndexFrom(
      spark: SparkSession, indexDir: String, content: String): LexIndex = {
    val (segs, delGens, _) = parseLexManifest(content)
    val ts = liveTombstones(spark, indexDir, delGens)
    // del generations carry NEGATIVE df/corpus partials, so the same folds
    // that merge segments also apply deletions — df, N and avgdl all score
    // as if the deleted docs were never indexed; the postings anti-join
    // removes them from the retrievable set
    // tombstone gens always carry both stat partials (written by
    // deleteFromLexIndex before its commit), so they fold alongside segs
    def statUnion(artifact: String): DataFrame =
      segUnion(spark, indexDir, segs ++ delGens, artifact)
    new LexIndex(
      postings = ts.fold(segUnion(spark, indexDir, segs, "postings"))(t =>
        segUnion(spark, indexDir, segs, "postings")
          .join(broadcast(t), Seq("doc_id"), "left_anti")),
      docFreq = statUnion("tokenstats")
        .groupBy("token").agg(sum(col("df")).as("df"))
        .where(col("df") > 0),
      stats = statUnion("corpusstats").agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens")))
  }

  /**
   * Serving-time BM25 over a persisted index. The query batch's distinct
   * terms (bounded by [[MaxQueryTerms]], fail-loud) are collected and pushed
   * as a LITERAL `token IN (...)` filter on the postings scan — with
   * segments token-range-clustered, parquet footer stats prune every file
   * whose range can't contain a query term, the lexical analog of the ANN
   * index's probed-cell partition filter. Ranking is identical to [[bm25]]
   * over the same corpus.
   */
  def bm25TopKIndexed(
      index: LexIndex, queries: DataFrame, k: Int,
      k1: Double = K1, b: Double = B): DataFrame = {
    val terms = queries
      .select(explode(array_distinct(TextOps.tokens(col("qtext")))).as("t"))
      .distinct().collect().map(_.getString(0)).toSeq
    require(terms.size <= MaxQueryTerms,
      s"bm25TopKIndexed got ${terms.size} distinct query terms " +
        s"(max $MaxQueryTerms) — pass an interactive query batch, not a corpus")
    bm25Score(
      index.postings.where(col("token").isin(terms: _*)),
      index.docFreq.where(col("token").isin(terms: _*)),
      index.stats, queries, k, k1, b)
  }

  /**
   * Segment compaction (the [[graft.ops.Similarity.compactIndex]] policy):
   * when more than `maxGens` segments are live, the SMALLEST ones (by
   * postings bytes — cheapest rewrite volume per directory eliminated)
   * merge into one fresh segment, re-clustered by token, committed under
   * the same protocol. Doc-disjointness makes every merge a plain union +
   * partial-sum fold. Serving is identical before and after. Returns the
   * number of segments merged (0 if no merge can reduce the count).
   */
  def compactLexIndex(spark: SparkSession, indexDir: String, maxGens: Int = 1): Int = {
    require(maxGens >= 1, "maxGens must be at least 1")
    val (ver, content) = ManifestStore.readVersioned(spark, indexDir, "_lex")
      .getOrElse(return 0)
    // del generations are never compaction victims (they're tiny and their
    // negative partials must keep folding against the UNCHANGED segment
    // stats) — [[purgeLexTombstones]] is the consolidation that retires them
    val (segs, delGens, tags) = parseLexManifest(content)
    if (segs.size <= maxGens) return 0
    val hfs = ManifestStore.fs(spark, indexDir)
    val sizes: Map[String, Long] = segs.map { g =>
      g -> hfs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$indexDir/gen=$g/postings")).getLength
    }.toMap
    val keep = segs.sortBy(g => (-sizes(g), -lexGenNumber(g), g)).take(maxGens - 1)
    val victims = segs.filterNot(keep.contains)
    if (victims.size <= 1) return 0
    val gen = math.max(nextLexGen(spark, indexDir), ver + 1)
    val genId = newLexGenId(gen)
    val base = s"$indexDir/gen=$genId"
    def unioned(artifact: String): DataFrame =
      victims.map(g => spark.read.parquet(s"$indexDir/gen=$g/$artifact"))
        .reduce(_.unionByName(_))
    unioned("postings")
      .repartitionByRange(col("token")).sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$base/postings")
    unioned("tokenstats").groupBy("token").agg(sum(col("df")).as("df"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/tokenstats")
    unioned("corpusstats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_tokens")).as("total_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/corpusstats")
    // doclens merges when every victim carries it; a legacy mix leaves the
    // merged segment doclens-less (delete/purge then fail loud, as before)
    val hfsD = ManifestStore.fs(spark, indexDir)
    if (victims.forall(g =>
        hfsD.exists(new org.apache.hadoop.fs.Path(s"$indexDir/gen=$g/doclens"))))
      unioned("doclens").write.mode("overwrite").parquet(s"$base/doclens")
    ManifestStore.commitVersioned(spark, indexDir, "_lex", gen,
      lexManifestContent(keep :+ genId, delGens, tags))
    victims.size
  }

  /** Drop generation directories the current manifest does not reference
    * (superseded rebuilds, crash debris). Space only; returns count. */
  def vacuumLexIndex(spark: SparkSession, indexDir: String): Int = {
    val live = ManifestStore.readVersioned(spark, indexDir, "_lex")
      .map { case (_, c) => val (s, d, _) = parseLexManifest(c); (s ++ d).toSet }
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
}
