package graft.ops

import org.apache.spark.sql.DataFrame
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
      k1: Double = K1, b: Double = B): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qterms = queries.select(
      col("qid"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
    val termStats = docFreq(postings)
      .join(broadcast(qterms), Seq("token"))
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
}
