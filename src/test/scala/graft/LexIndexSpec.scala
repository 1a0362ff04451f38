package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** Persisted lexical (BM25) index: build/read parity with the direct path,
  * incremental-append equivalence, compaction invariance, vacuum, and the
  * literal term filter reaching the parquet scan. */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpusA = Seq(
    (1L, "spark joins fast"), (2L, "hash table scan"),
    (3L, "spark spark window")).toDF("doc_id", "text")

  private def corpusB = Seq(
    (10L, "window sort merge"), (11L, "spark hash join")).toDF("doc_id", "text")

  private def queries = Seq((0L, "spark window"), (1L, "hash")).toDF("qid", "qtext")

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("qid", "rank").collect().toSeq.map(_.toSeq)

  test("indexed serving equals the direct bm25 on the same corpus") {
    val dir = tmpDir("lexidx")
    Retrieval.writeLexIndex(corpusA, dir)
    val idx = Retrieval.readLexIndex(spark, dir)
    assert(ranked(Retrieval.bm25TopKIndexed(idx, queries, k = 3)) ==
      ranked(Retrieval.bm25(corpusA, "doc_id", "text", queries, k = 3)))
  }

  test("append parity: index(A) + append(B) serves exactly bm25(A ∪ B)") {
    val dir = tmpDir("lexidx_app")
    Retrieval.writeLexIndex(corpusA, dir)
    Retrieval.appendToLexIndex(corpusB, dir)
    val idx = Retrieval.readLexIndex(spark, dir)
    val union = corpusA.unionByName(corpusB)
    assert(ranked(Retrieval.bm25TopKIndexed(idx, queries, k = 5)) ==
      ranked(Retrieval.bm25(union, "doc_id", "text", queries, k = 5)))
  }

  test("empty-delta append is a no-op (manifest version unchanged)") {
    val dir = tmpDir("lexidx_empty")
    Retrieval.writeLexIndex(corpusA, dir)
    val before = graft.ops.ManifestStore.readVersioned(spark, dir, "_lex").get._1
    Retrieval.appendToLexIndex(corpusA.where(lit(false)), dir)
    val after = graft.ops.ManifestStore.readVersioned(spark, dir, "_lex").get._1
    assert(before == after)
  }

  test("compaction merges segments without changing served rankings; vacuum reclaims") {
    val dir = tmpDir("lexidx_cmp")
    Retrieval.writeLexIndex(corpusA, dir)
    Retrieval.appendToLexIndex(corpusB, dir)
    Retrieval.appendToLexIndex(
      Seq((20L, "sort sort sort")).toDF("doc_id", "text"), dir)
    val before = ranked(
      Retrieval.bm25TopKIndexed(Retrieval.readLexIndex(spark, dir), queries, k = 5))
    val merged = Retrieval.compactLexIndex(spark, dir, maxGens = 1)
    assert(merged == 3)
    val after = ranked(
      Retrieval.bm25TopKIndexed(Retrieval.readLexIndex(spark, dir), queries, k = 5))
    assert(before == after)
    // the three victim segments are now debris; vacuum removes exactly them
    assert(Retrieval.vacuumLexIndex(spark, dir) == 3)
    assert(ranked(
      Retrieval.bm25TopKIndexed(Retrieval.readLexIndex(spark, dir), queries, k = 5))
      == after)
  }

  test("rebuild over an existing index supersedes it (old gens vacuumable)") {
    val dir = tmpDir("lexidx_rb")
    Retrieval.writeLexIndex(corpusA, dir)
    Retrieval.writeLexIndex(corpusB, dir) // full rebuild: only B is live
    val idx = Retrieval.readLexIndex(spark, dir)
    assert(ranked(Retrieval.bm25TopKIndexed(idx, queries, k = 5)) ==
      ranked(Retrieval.bm25(corpusB, "doc_id", "text", queries, k = 5)))
    assert(Retrieval.vacuumLexIndex(spark, dir) == 1)
  }

  test("serving pushes the query-term filter into the postings parquet scan") {
    val dir = tmpDir("lexidx_push")
    Retrieval.writeLexIndex(corpusA, dir)
    val idx = Retrieval.readLexIndex(spark, dir)
    val p = Retrieval.bm25TopKIndexed(idx, queries, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(token"), p)
  }
}
