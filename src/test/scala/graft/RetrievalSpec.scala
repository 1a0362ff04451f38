package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** BM25 + RRF semantics: hand-computed scores on a tiny corpus, OOV and
  * query-dedup conventions, rank properties, fusion laws, and the
  * WindowGroupLimit / broadcast plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs: "a" everywhere (df=3), "b" in two, "rare" in one long doc
  private def corpus = Seq(
    (1L, "a b"),
    (2L, "a b b"),
    (3L, "a rare rare rare")).toDF("doc_id", "text")

  private def q(s: String) = Seq((0L, s)).toDF("qid", "qtext")

  /** Reference BM25 (same formula as the operator, computed in plain Scala). */
  private def ref(tf: Long, df: Long, dl: Long, nDocs: Long, totalTokens: Long): Double = {
    val idf = math.log(1.0 + (nDocs.toDouble - df + 0.5) / (df.toDouble + 0.5))
    val avg = totalTokens.toDouble / nDocs.toDouble
    idf * (tf.toDouble * (Retrieval.K1 + 1.0)) /
      (tf.toDouble + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * dl.toDouble / avg))
  }

  test("bm25 matches the hand-computed formula (tf saturation + length norm)") {
    val out = Retrieval.bm25(corpus, "doc_id", "text", q("rare b"), k = 3)
      .orderBy("rank").collect()
    // total tokens = 2 + 3 + 4 = 9, N = 3
    val sRare = ref(3, 1, 4, 3, 9) // doc 3: rare tf=3, dl=4
    val sB1 = ref(1, 2, 2, 3, 9)   // doc 1: b tf=1, dl=2
    val sB2 = ref(2, 2, 3, 3, 9)   // doc 2: b tf=2, dl=3
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L))
    val got = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got(3L) == math.rint(sRare * 1e4) / 1e4 ||
      math.abs(got(3L) - sRare) < 1e-4)
    assert(math.abs(got(2L) - sB2) < 1e-4)
    assert(math.abs(got(1L) - sB1) < 1e-4)
    // higher tf of the same term scores higher (saturating, still monotone)
    assert(got(2L) > got(1L))
  }

  test("out-of-vocabulary query terms contribute nothing; all-OOV query returns empty") {
    val withOov = Retrieval.bm25(corpus, "doc_id", "text", q("rare zzz"), k = 3)
      .orderBy("rank").collect()
    val without = Retrieval.bm25(corpus, "doc_id", "text", q("rare"), k = 3)
      .orderBy("rank").collect()
    assert(withOov.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      without.map(r => (r.getLong(2), r.getDouble(3))).toSeq)
    assert(Retrieval.bm25(corpus, "doc_id", "text", q("zzz yyy"), k = 3).count() == 0)
  }

  test("query terms are deduplicated (query-side tf is ignored)") {
    val once = Retrieval.bm25(corpus, "doc_id", "text", q("b"), k = 3).collect()
    val thrice = Retrieval.bm25(corpus, "doc_id", "text", q("b b b"), k = 3).collect()
    assert(once.map(_.toSeq).toSet == thrice.map(_.toSeq).toSet)
  }

  test("ranks are dense 1..k per query, ties break on ascending doc_id") {
    val tie = Seq((10L, "x"), (11L, "x")).toDF("doc_id", "text")
    val out = Retrieval.bm25(tie, "doc_id", "text", q("x"), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 11L)) // equal scores → id asc
  }

  test("rrfFuse: known values, doc in both lists outranks single-list docs") {
    val a = Seq((0L, 100L, 1), (0L, 101L, 2)).toDF("qid", "doc_id", "rank")
    val b = Seq((0L, 100L, 2), (0L, 102L, 1)).toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(100L, 102L, 101L))
    val expect100 = math.rint((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6
    assert(out.head.getDouble(3) == expect100)
    // single-list docs at the same rank tie exactly and break by doc_id:
    // 102 (rank 1 in b, 1/61) > 101 (rank 2 in a, 1/62)
    assert(out(1).getDouble(3) > out(2).getDouble(3))
  }

  test("rrfFuse of a list with itself doubles every contribution (rank order preserved)") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)).toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, a), k = 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getDouble(3) == math.rint(2.0 / 61 * 1e6) / 1e6)
  }

  // MMR candidates: d1/d2 identical vectors (redundant pair), d3 diverse.
  // Components are exact binary floats so quantized dots are closed-form:
  // sim(1,2) = 500000² + 125000² = 265_625_000_000, sim(*,3) = 62_500_000_000.
  private def mmrCands = Seq(
    (0L, 1L, 500000000000L, Array(0.5f, 0.125f)),
    (0L, 2L, 500000000000L, Array(0.5f, 0.125f)),
    (0L, 3L, 200000000000L, Array(0.0f, 0.5f)))
    .toDF("qid", "doc_id", "rel", "embedding")

  test("bm25F: single unit field reduces to bm25; title boost reorders; null fields score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark joins data fast here"),
      (2L, "rows scan merge sort spark"),
      (3L, "batch window filter order value")).toDF("doc_id", "text")
    val queries = Seq((0L, "spark sort")).toDF("qid", "qtext")
    // law: one field at boost 1.0 IS plain bm25, bit for bit
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(rows(Retrieval.bm25F(docs, "doc_id", Seq(("text", 1.0)), queries, 10)) ==
      rows(Retrieval.bm25(docs, "doc_id", "text", queries, 10)))
    // title boost: same term, same lengths — the title match must outrank
    // the body match under boost, and tie without it
    val fielded = Seq(
      (1L, "quantum stuff", "plain words here"),
      (2L, "plain stuff", "quantum words here")).toDF("doc_id", "title", "body")
    val q2 = Seq((0L, "quantum")).toDF("qid", "qtext")
    val boosted = Retrieval.bm25F(fielded, "doc_id",
        Seq(("title", 3.0), ("body", 1.0)), q2, 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(boosted == Seq(1L, 2L), s"title match must rank first: $boosted")
    // null fields: a doc with a null body still scores on its title
    val withNull = Seq(
      (1L, "quantum title", null), (2L, "other", "quantum body text")
    ).toDF("doc_id", "title", "body")
    val scoredNull = Retrieval.bm25F(withNull, "doc_id",
        Seq(("title", 2.0), ("body", 1.0)), q2, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(scoredNull == Set(1L, 2L))
  }

  test("bm25Rm3: expansion reaches docs sharing no original query term") {
    // doc 1 matches the query; doc 2 shares 'bridge' terms with doc 1 but
    // NOT with the query — plain BM25 cannot score it, RM3 must
    val docs = Seq(
      (1L, "query term bridge link"),
      (2L, "bridge link other stuff"),
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val q = Seq((7L, "query term")).toDF("qid", "qtext")
    val plain = Retrieval.bm25(docs, "doc_id", "text", q, k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L), s"plain bm25 should only reach doc 1, got $plain")
    val rm3 = Retrieval.bm25Rm3(docs, "doc_id", "text", q,
        k = 3, fbDocs = 1, fbTerms = 4, origWeight = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(rm3.contains(2L), s"expansion missed the bridge doc: $rm3")
    assert(!rm3.contains(3L), "expansion leaked to an unrelated doc")
  }

  test("bm25Rm3 with origWeight = 1 preserves the plain BM25 ranking") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "beta beta beta epsilon"),
      (4L, "zeta eta theta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta")).toDF("qid", "qtext")
    def ranking(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val plain = ranking(Retrieval.bm25(docs, "doc_id", "text", q, k = 4))
    val rm3 = ranking(Retrieval.bm25Rm3(docs, "doc_id", "text", q,
      k = 4, fbDocs = 2, fbTerms = 5, origWeight = 1.0))
    assert(rm3 == plain,
      s"origWeight=1 must reduce to the unexpanded ranking:\n$rm3\nvs\n$plain")
  }

  test("evalRanking: hand-computed nDCG/MRR/prec/recall, no-relevant and unjudged cases") {
    // q1: ranks 1..3 = docs (10 g=0, 11 g=2, 12 g=1); qrels also hold an
    // unretrieved relevant doc 13 (g=3) -> recall penalized, IDCG uses it
    val results = Seq(
      (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L)).toDF("qid", "rank", "doc_id")
    val qrels = Seq(
      (1L, 11L, 2), (1L, 12L, 1), (1L, 13L, 3),
      (3L, 30L, 1)).toDF("qid", "doc_id", "grade")
    val out = Retrieval.evalRanking(results, qrels, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // q1 DCG = 0 + 3/log2(3) + 1/log2(4) = 1.892789... + 0.5
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    // IDCG = 7/log2(2) + 3/log2(3) + 1/log2(4) (grades 3,2,1)
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 0.5
    val ndcg = BigDecimal(BigDecimal(dcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble /
      BigDecimal(idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == ndcg, s"ndcg ${out(1L)._1} != $ndcg")
    assert(out(1L)._2 == 0.5)                       // first relevant at rank 2
    assert(out(1L)._3 == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)    // 2 of 3 retrieved relevant
    assert(out(1L)._4 == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)    // 2 of 3 judged relevant
    // q2 has no judged relevant docs at all: everything 0
    assert(out(2L) == ((0.0, 0.0, 0.0, 0.0)))
    // q3 is judged but retrieved NOTHING -> a zeroed row (the trec_eval
    // convention: evaluate over the judged query set; silently dropping
    // it would overstate every macro-average)
    assert(out(3L) == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("bm25Rm3Indexed == direct bm25Rm3 over the same corpus") {
    val docs = Seq(
      (1L, "query term bridge link extra words"),
      (2L, "bridge link other stuff padding"),
      (3L, "query unrelated term filler tokens"),
      (4L, "completely different vocabulary here"),
      (5L, "term term bridge query mixed")).toDF("doc_id", "text")
    val q = Seq((7L, "query term"), (8L, "bridge stuff")).toDF("qid", "qtext")
    val direct = Retrieval.bm25Rm3(docs, "doc_id", "text", q,
        k = 5, fbDocs = 2, fbTerms = 4, origWeight = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val dir = tmpDir("rm3_lex_idx")
    Retrieval.writeLexIndex(docs, dir)
    val indexed = Retrieval.bm25Rm3Indexed(
        Retrieval.readLexIndex(spark, dir), q,
        k = 5, fbDocs = 2, fbTerms = 4, origWeight = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(indexed == direct,
      s"indexed RM3 diverged from direct:\n$indexed\nvs\n$direct")
  }

  test("fuseNormalized: min-max rescale, weights, constant-list convention, absent docs") {
    // list A: scores 10..30 normalize to 0, 0.5, 1; list B: constant -> 1.0
    val a = Seq((1L, 101L, 10.0), (1L, 102L, 20.0), (1L, 103L, 30.0))
      .toDF("qid", "doc_id", "score")
    val b = Seq((1L, 103L, 7.0), (1L, 104L, 7.0)).toDF("qid", "doc_id", "score")
    val out = Retrieval.fuseNormalized(Seq((a, 0.5), (b, 0.5)), k = 10)
      .collect().map(r => r.getLong(2) -> (r.getInt(1), r.getDouble(3))).toMap
    // 103: 0.5*1 + 0.5*1 = 1.0; 104: 0.5 (B only); 102: 0.25; 101: 0.0
    assert(out(103L) == ((1, 1.0)) && out(104L) == ((2, 0.5)))
    assert(out(102L) == ((3, 0.25)) && out(101L) == ((4, 0.0)))
    // single list with negative scores still lands in [0,1]
    val neg = Seq((1L, 1L, -4.0), (1L, 2L, -2.0)).toDF("qid", "doc_id", "score")
    val single = Retrieval.fuseNormalized(Seq((neg, 1.0)), k = 2)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(single == Map(2L -> 1.0, 1L -> 0.0))
    intercept[IllegalArgumentException] {
      Retrieval.fuseNormalized(Seq((a, 0.0)), k = 2)
    }
  }

  test("mmrRerank: diversity beats redundancy at low lambda, exact greedy trace") {
    val out = graft.ops.Similarity.mmrRerank(mmrCands, k = 3, lambda = 0.3)
      .orderBy("rank").collect()
    // pick 1: rel tie 5e11 → doc 1; pick 2: doc 2 scores
    // 0.3·5e11 − 0.7·2.65625e11 < doc 3's 0.3·2e11 − 0.7·6.25e10 → doc 3
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getDouble(3) == 0.3 * 5e11)
    assert(out(1).getDouble(3) == 0.3 * 2e11 - 0.7 * 6.25e10)
    assert(out(2).getDouble(3) == 0.3 * 5e11 - 0.7 * 2.65625e11)
  }

  test("mmrRerank: lambda = 1 reduces to pure relevance order") {
    val out = graft.ops.Similarity.mmrRerank(mmrCands, k = 3, lambda = 1.0)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(5e11, 5e11, 2e11))
  }

  test("mmrRerank: k beyond the candidate count returns every candidate once") {
    val out = graft.ops.Similarity.mmrRerank(mmrCands, k = 10, lambda = 0.5)
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L, 3L))
    assert(out.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("plan shape: per-query top-k is a WindowGroupLimit, query side broadcasts") {
    val p = Retrieval.bm25(corpus, "doc_id", "text", q("a b"), k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    // the only nested-loop join is the one-row stats broadcast cross join
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("phraseSearch: contiguity, overlap, duplicated phrase terms, absent phrase") {
    val docs = Seq(
      (1L, "x a a the y"),        // one hit
      (2L, "a a a the"),          // 'a a the' starts only at position 1
      (3L, "a a the z a a the"),  // two hits
      (4L, "a the a"),            // all terms present, never contiguous
      (5L, "completely unrelated")).toDF("doc_id", "text")
    def run(ph: String) = Retrieval.phraseSearch(docs, "doc_id", "text", ph)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run("a a the") == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // overlapping matches each count: "a a a" holds "a a" at two starts
    assert(run("a a") == Map(2L -> 2L, 3L -> 2L, 1L -> 1L))
    // single-term phrase degenerates to term occurrence counts
    assert(run("a") == Map(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 2L))
    assert(run("never here") == Map.empty)
  }
}
