package graft

import org.apache.spark.sql.functions._

import graft.ops.FinOps

/** A2/S4/S5 — nest → partitioned write → pruned read → explode round-trip,
  * last-writer-wins overwrite semantics, and partition pruning in the plan. */
class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val statement =
    FinOps.ingestStatement(spark, "/root/reference/test_data/*.csv").cache()

  test("A2+S4: nest → write → explode round-trips every row") {
    val dir = tmpDir("stmts_rt")
    val items = FinOps.toStatementItems(statement)
    assert(items.count() == 3) // one item per user-month (LF:467-474 shape)
    FinOps.writeStatements(items, dir)

    val back = FinOps.explodeStatements(
      spark.read.parquet(dir).withColumn("userId", $"userId".cast("string")))
    val orig = statement.select(back.columns.map(col): _*)
    assert(back.count() == 36)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("S5: upsert = last-writer-wins per user-MONTH, other months preserved") {
    val dir = tmpDir("stmts_lww")
    FinOps.upsertStatements(FinOps.toStatementItems(statement), dir, spark)
    // user 1 also has a January statement on file
    val jan = statement.where($"userId" === "1")
      .withColumn("yearMonth", lit("202501"))
      .withColumn("date", add_months($"date", 1))
    FinOps.upsertStatements(FinOps.toStatementItems(jan), dir, spark)
    // re-upload user 1's December with only 5 transactions → that month is
    // replaced; January and the other users stay intact
    val smaller = statement.where($"userId" === "1").limit(5)
    FinOps.upsertStatements(FinOps.toStatementItems(smaller), dir, spark)

    val u1 = FinOps.readUserHistory(spark, dir, "1")
    assert(u1.where(FinOps.ymOfDate($"date") === "202412").count() == 5)
    assert(u1.where(FinOps.ymOfDate($"date") === "202501").count() == 12)
    assert(FinOps.readUserHistory(spark, dir, "2").count() == 12)
    assert(FinOps.readUserHistory(spark, dir, "3").count() == 12)
  }

  test("S5: a batch over the key cap upserts via the semi-join path") {
    val dir = tmpDir("stmts_cap")
    // seed: 40 users × month 202412, one row each
    def month(ym: String, dt: String, tag: String) = spark.range(40)
      .select(
        $"id".cast("string").as("userId"), lit(ym).as("yearMonth"),
        concat($"id", lit(s"_$tag")).as("id"), lit(dt).cast("date").as("date"),
        lit("v").as("vendor"), lit("c").as("category"),
        lit(1.50).cast("decimal(12,2)").as("amount"), lit("USD").as("currency"),
        lit(false).as("recurring"), lit("purchase").as("txType"),
        lit("US-CA").as("location"), lit("d").as("description"))
    FinOps.upsertStatements(FinOps.toStatementItems(month("202412", "2024-12-01", "a")), dir, spark)
    // second batch: same 40 users, January — key count 40 > cap 5 forces the
    // left-semi path; December must survive, January must land
    FinOps.upsertStatements(
      FinOps.toStatementItems(month("202501", "2025-01-01", "b")), dir, spark, pruneKeyCap = 5)
    val all = FinOps.explodeStatements(
      spark.read.parquet(dir).withColumn("userId", $"userId".cast("string")))
    assert(all.count() == 80)
    assert(all.groupBy("yearMonth").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("202412" -> 40L, "202501" -> 40L))
    // replace January for all users over the cap again: last-writer-wins holds
    FinOps.upsertStatements(
      FinOps.toStatementItems(month("202501", "2025-01-02", "c").limit(40)), dir, spark, pruneKeyCap = 5)
    val jan = FinOps.explodeStatements(
      spark.read.parquet(dir).withColumn("userId", $"userId".cast("string")))
      .where($"yearMonth" === "202501")
    assert(jan.count() == 40 && jan.where($"id".endsWith("_c")).count() == 40)
  }

  test("S5: a crash during the final overwrite is recovered from staging") {
    val dir = tmpDir("stmts_crash")
    FinOps.upsertStatements(FinOps.toStatementItems(statement), dir, spark)

    // Simulate a prior upsert of user 1's January that COMMITTED its staging
    // write and then died mid-overwrite: the staging dir holds the merged
    // state for user 1 (December + January), while the target's user-1
    // partition was half-clobbered by the dying overwrite.
    val jan = statement.where($"userId" === "1")
      .withColumn("yearMonth", lit("202501"))
      .withColumn("date", add_months($"date", 1))
    val merged = FinOps.toStatementItems(statement.where($"userId" === "1"))
      .unionByName(FinOps.toStatementItems(jan))
    val stagingDir = dir.stripSuffix("/") + "_upsert_staging"
    merged.write.mode("overwrite").parquet(stagingDir) // writes _SUCCESS
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/userId=1"), true)

    // Next upsert (any batch — here user 2's February) must first restore
    // user 1 from staging, then apply its own merge.
    val feb = statement.where($"userId" === "2")
      .withColumn("yearMonth", lit("202502"))
      .withColumn("date", add_months($"date", 2))
    FinOps.upsertStatements(FinOps.toStatementItems(feb), dir, spark)

    assert(FinOps.readUserHistory(spark, dir, "1").count() == 24) // Dec + Jan restored
    assert(FinOps.readUserHistory(spark, dir, "2").count() == 24) // Dec + Feb merged
    assert(FinOps.readUserHistory(spark, dir, "3").count() == 12) // untouched
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingDir)))
  }

  test("S5: uncommitted staging debris is dropped without touching the table") {
    val dir = tmpDir("stmts_debris")
    FinOps.upsertStatements(FinOps.toStatementItems(statement), dir, spark)
    // A staging dir with data files but NO _SUCCESS marker = the staging
    // write itself died; the target was never touched and must stay intact.
    val stagingDir = dir.stripSuffix("/") + "_upsert_staging"
    FinOps.toStatementItems(statement.where($"userId" === "1").limit(2))
      .write.mode("overwrite").parquet(stagingDir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stagingDir + "/_SUCCESS"), false)

    assert(!FinOps.recoverUpsertStaging(spark, dir))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingDir)))
    (1 to 3).foreach { u =>
      assert(FinOps.readUserHistory(spark, dir, u.toString).count() == 12)
    }
  }

  test("dataset-card diff across store versions: per-metric deltas replay " +
    "the appended mass; self-diff is all-zero; deletes show as negative volume") {
    import graft.ops.{Corpus, ManifestStore}
    import spark.implicits._
    val dir = tmpDir("card_diff")
    def rows(ids: Range) = ids.map(i =>
      (i.toLong, if (i % 7 == 0) null else s"tok$i tok${i % 3} x",
        if (i % 2 == 0) "en" else "de", s"src${i % 3}", 10L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("dp", pmod($"doc_id", lit(4)).cast("string"))
    ManifestStore.upsert(rows(0 until 20), dir, "dp", Seq("dp", "doc_id"), spark)
    ManifestStore.upsert(rows(20 until 30), dir, "dp", Seq("dp", "doc_id"), spark)
    val vs = ManifestStore.versions(spark, dir)
    assert(vs.size == 2)
    val at = (v: Long) => ManifestStore.frameAt(spark, dir, "dp", v).get
    val diff = Corpus.datasetCardDiff(at(vs.head), at(vs.last))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(diff("n_docs") == ((20L, 30L, 10L)))
    assert(diff("n_null_text")._3 == 2L) // ids 21 and 28 are the appended nulls
    assert(diff.keySet.size == 7 && diff.values.forall { case (a, b, d) => b - a == d })
    // self-diff: every delta zero
    assert(Corpus.datasetCardDiff(at(vs.last), at(vs.last))
      .where($"delta" =!= 0L).isEmpty)
    // a delete shows as negative volume in the forward diff
    assert(ManifestStore.delete(
      rows(0 until 5).select("dp", "doc_id"), dir, "dp", Seq("dp", "doc_id"), spark) > 0)
    val vs2 = ManifestStore.versions(spark, dir)
    val afterDel = Corpus.datasetCardDiff(at(vs2(1)), at(vs2.last))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(afterDel("n_docs") == -5L)
  }

  test("card ledger: per-batch card frames fold to the one-shot card " +
    "(exact fields bit-equal, HLL distinct exact in the sparse regime); " +
    "folds are associative and survive ledger compaction") {
    import graft.ops.{Corpus, SketchLedger}
    import spark.implicits._
    def corpus(ids: Range) = ids.map(i =>
      (i.toLong, if (i % 11 == 0) null else s"text ${i % 40} body",
        if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        s"src${i % 4}", 5L + i % 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val all = corpus(0 until 90)
    val dir = tmpDir("card_ledger")
    Seq(0 until 30, 30 until 60, 60 until 90).foreach(r =>
      SketchLedger.append(Corpus.cardFrame(corpus(r)), dir))
    val folded = Corpus.cardFold(SketchLedger.read(spark, dir).get)
      .collect()(0)
    val oneShot = Corpus.datasetCard(all).collect()(0)
    for (f <- Seq("n_docs", "n_null_text", "n_langs", "n_sources",
        "total_tokens", "total_chars"))
      assert(folded.getAs[Long](f) == oneShot.getAs[Long](f),
        s"$f folded ${folded.getAs[Long](f)} != one-shot ${oneShot.getAs[Long](f)}")
    // ~41 distinct texts: deep inside the HLL sparse regime → exact
    assert(folded.getAs[Long]("n_distinct_texts") ==
      oneShot.getAs[Long]("n_distinct_texts"))
    // associativity: compacting the ledger to one folded FRAME serves the
    // same card afterwards (and for appends landing after the compact)
    SketchLedger.compact(
      Corpus.cardFoldFrame(SketchLedger.read(spark, dir).get), dir)
    assert(SketchLedger.status(spark, dir).get._2 == 1)
    SketchLedger.append(Corpus.cardFrame(corpus(90 until 120)), dir)
    val after = Corpus.cardFold(SketchLedger.read(spark, dir).get).collect()(0)
    val full = Corpus.datasetCard(corpus(0 until 120)).collect()(0)
    for (f <- Seq("n_docs", "n_langs", "total_tokens", "n_distinct_texts"))
      assert(after.getAs[Long](f) == full.getAs[Long](f),
        s"post-compact $f ${after.getAs[Long](f)} != ${full.getAs[Long](f)}")
  }

  test("S4: the keyed historical read is partition-pruned") {
    val dir = tmpDir("stmts_prune")
    FinOps.writeStatements(FinOps.toStatementItems(statement), dir)
    val plan = FinOps.readUserHistory(spark, dir, "2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert("PartitionFilters: \\[[^\\]]*userId".r.findFirstIn(plan).isDefined, plan)
  }

  test("S5-manifest: manifest upsert matches the staged upsert final state") {
    val staged = tmpDir("stmts_m_eq_a")
    val manif = tmpDir("stmts_m_eq_b")
    val jan = statement.where($"userId" === "1")
      .withColumn("yearMonth", lit("202501"))
      .withColumn("date", add_months($"date", 1))
    val smaller = statement.where($"userId" === "1").limit(5)
    // identical batch sequence through both stores: seed → add month →
    // last-writer-wins replace
    for (batch <- Seq(statement, jan, smaller)) {
      FinOps.upsertStatements(FinOps.toStatementItems(batch), staged, spark)
      FinOps.upsertStatementsManifest(FinOps.toStatementItems(batch), manif, spark)
    }
    val a = FinOps.explodeStatements(
      spark.read.parquet(staged).withColumn("userId", $"userId".cast("string")))
    val b = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, manif).get)
      .select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "manifest and staged upsert diverged")
  }

  test("S5-manifest: partial writes are invisible until the manifest rename; vacuum reclaims") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_crash")
    FinOps.upsertStatementsManifest(FinOps.toStatementItems(statement), dir, spark)
    val before = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
      .count()

    // Simulate a crash AFTER the data write but BEFORE the manifest commit:
    // a fully-written gen=99 directory plus a torn .tmp manifest. Readers
    // must still see exactly the previous state.
    val debris = FinOps.toStatementItems(
      statement.withColumn("yearMonth", lit("202502")))
    debris.withColumn("gen", lit(99L)).repartition($"userId")
      .write.mode("append").partitionBy("gen", "userId").parquet(s"$dir/data")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_manifest.000000000099.tmp"), true).close()
    assert(FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
      .count() == before, "uncommitted generation leaked into reads")

    // The retry must not append into the debris generation...
    val jan = statement.where($"userId" === "1")
      .withColumn("yearMonth", lit("202501"))
      .withColumn("date", add_months($"date", 1))
    FinOps.upsertStatementsManifest(FinOps.toStatementItems(jan), dir, spark)
    val after = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
    assert(after.where($"yearMonth" === "202502").count() == 0, "debris rows surfaced")
    assert(after.where($"yearMonth" === "202501").count() == 12)
    // ...and vacuum drops the dead generations (the debris gen and the
    // superseded ones), after which reads are unchanged.
    assert(ManifestStore.vacuum(spark, dir) >= 1)
    val afterVacuum = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
    assert(afterVacuum.exceptAll(after).isEmpty && after.exceptAll(afterVacuum).isEmpty)
  }

  test("S5-manifest: idempotence tags (r15) — a tagged upsert replayed under " +
    "the same tag is a no-op; tags survive delete and compact; retention is " +
    "bounded") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_tags")
    val b0 = Seq((1L, "a", "x"), (2L, "a", "y")).toDF("id", "p", "v")
    val b1 = Seq((3L, "b", "z")).toDF("id", "p", "v")
    assert(ManifestStore.upsert(b0, dir, "p", Seq("p", "id"), spark,
      tag = Some("q=l1/batch=0")))
    assert(ManifestStore.upsert(b1, dir, "p", Seq("p", "id"), spark,
      tag = Some("q=l1/batch=1")))
    val want = ManifestStore.currentFrame(spark, dir, "p").get.collect().toSet

    // replay: same tag → skipped, data identical even with DIFFERENT rows
    // (the caller's recomputed frame never lands twice)
    assert(!ManifestStore.upsert(
      Seq((3L, "b", "OTHER")).toDF("id", "p", "v"), dir, "p", Seq("p", "id"),
      spark, tag = Some("q=l1/batch=1")),
      "replayed tag must skip the upsert")
    assert(ManifestStore.currentFrame(spark, dir, "p").get.collect().toSet == want)
    assert(ManifestStore.tags(spark, dir) == Seq("q=l1/batch=0", "q=l1/batch=1"))
    assert(ManifestStore.hasTag(spark, dir, "q=l1/batch=1"))

    // a fresh lineage appends; untagged upserts never collide
    assert(ManifestStore.upsert(
      Seq((4L, "b", "w")).toDF("id", "p", "v"), dir, "p", Seq("p", "id"),
      spark, tag = Some("q=l2/batch=0")))
    ManifestStore.upsert(
      Seq((5L, "c", "u")).toDF("id", "p", "v"), dir, "p", Seq("p", "id"), spark)
    assert(ManifestStore.tags(spark, dir).size == 3)

    // delete and compact both rewrite the manifest — tags must ride along
    ManifestStore.delete(
      Seq((5L, "c")).toDF("id", "p"), dir, "p", Seq("p", "id"), spark)
    assert(ManifestStore.tags(spark, dir).size == 3, "delete dropped tags")
    ManifestStore.compact(spark, dir, "p")
    assert(ManifestStore.tags(spark, dir).size == 3, "compact dropped tags")
    assert(!ManifestStore.upsert(b1, dir, "p", Seq("p", "id"), spark,
      tag = Some("q=l1/batch=1")), "a very late replay must still no-op")

    // retention bound (pure fold — an actual 512-append flood is just this
    // fold applied repeatedly): only the trailing MaxRetainedTags survive;
    // the replay horizon is recent ids, older tags are dead manifest weight
    val flood = (0 until ManifestStore.MaxRetainedTags + 100).map(i => s"t$i")
    val kept = ManifestStore.boundTags(flood)
    assert(kept.size == ManifestStore.MaxRetainedTags)
    assert(kept == flood.takeRight(ManifestStore.MaxRetainedTags),
      "retention must keep the TRAILING window (the replayable ids)")
  }

  test("ANN index: attribute columns ride build+append, filtered serving, fail-loud guards") {
    import graft.ops.Similarity
    val embs = (0 until 48).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(d * 0.7 + (i % 7)).toFloat), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val queries = embs.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val dir = tmpDir("idx_attr")
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)
    Similarity.writeIndex(embs.where($"vec_id" < 24), coarse, cb, dir,
      dims = 8, m = 2, attrCols = Seq("label"))
    Similarity.appendToIndex(embs.where($"vec_id" >= 24), dir)
    val idx = Similarity.readIndex(spark, dir)
    assert(idx.attrs == Seq("label"), s"attrs lost in meta round-trip: ${idx.attrs}")

    // law: filtered top-k == unfiltered FULL candidate ranking restricted
    // to predicate-passing ids, re-ranked, cut to k
    val labels = embs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val allCands = Similarity.ivfPqTopKIndexed(idx, queries, 1000, nprobe = 2)
      .select("qid", "vec_id", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = allCands.filter(t => labels(t._2) == 1)
      .groupBy(_._1).toSeq.flatMap { case (qid, ts) =>
        ts.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, v, a), i) => (qid, i + 1, v, a) }
      }.toSet
    val filtered = Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 2,
        filter = Some($"label" === 1))
      .select("qid", "rank", "vec_id", "adc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(filtered == expected, s"filtered serving diverged:\n$filtered\nvs\n$expected")
    assert(filtered.forall(t => labels(t._3) == 1), "a non-matching candidate leaked")

    // the filtered RERANK path obeys the same predicate
    val fr = Similarity.ivfPqTopKIndexedRerank(idx, queries, 3, nprobe = 2,
        shortlist = 16, filter = Some($"label" === 1))
      .select("vec_id").collect().map(_.getLong(0))
    assert(fr.nonEmpty && fr.forall(labels(_) == 1))

    // guards: a delta missing the attr fails loud; reserved names rejected
    intercept[IllegalArgumentException] {
      Similarity.appendToIndex(
        embs.select($"vec_id" + 100 as "vec_id", $"embedding"), dir)
    }
    intercept[IllegalArgumentException] {
      Similarity.writeIndex(embs, coarse, cb, tmpDir("idx_attr_bad"),
        dims = 8, m = 2, attrCols = Seq("cell"))
    }
  }

  test("ANN index: manifest commit, append == full build, crash invisibility, vacuum") {
    import graft.ops.Similarity
    val embs = (0 until 48).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(d * 0.7 + (i % 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = embs.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "vec_id", "adc")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    // shared quantizers, trained once on the FULL corpus (the append
    // contract: deltas are encoded with existing quantizers, no retrain)
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)

    // full build vs half-build + append: identical serving results
    val dirFull = tmpDir("idx_full")
    val dirInc = tmpDir("idx_inc")
    Similarity.writeIndex(embs, coarse, cb, dirFull, dims = 8, m = 2)
    Similarity.writeIndex(
      embs.where($"vec_id" < 24), coarse, cb, dirInc, dims = 8, m = 2)
    Similarity.appendToIndex(embs.where($"vec_id" >= 24), dirInc)
    val full = key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirFull), queries, 3, nprobe = 2))
    val inc = key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2))
    assert(full == inc, s"append diverged from full build:\n$full\nvs\n$inc")

    // crash mid-rebuild: a generation written WITHOUT a manifest rename is
    // invisible — the old manifest keeps serving the old, untouched index
    // (the round-7 meta-last scheme failed exactly this case on rebuild)
    val before = key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirFull), queries, 3, nprobe = 2))
    val garbage = embs.select($"vec_id", transform($"embedding", x => -x).as("embedding"))
    Similarity.pqEncodeResidual(garbage, coarse, cb, dims = 8, m = 2)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dirFull/gen=9/codes")
    val fs = new org.apache.hadoop.fs.Path(dirFull)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(dirFull, "_index.000000000009.tmp"), true).close()
    assert(key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirFull), queries, 3, nprobe = 2)) == before,
      "uncommitted generation leaked into serving")

    // an empty delta commits nothing (no row-less generation)
    Similarity.appendToIndex(embs.where($"vec_id" < 0), dirFull)
    assert(key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirFull), queries, 3, nprobe = 2)) == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirFull, "_index.000000000010")),
      "empty delta committed a generation")

    // a real retry skips PAST the debris generation (gen 9 is never reused
    // or referenced), and vacuum then reclaims the debris
    Similarity.appendToIndex(
      embs.where($"vec_id" === 0L).select(($"vec_id" + 100L).as("vec_id"), $"embedding"),
      dirFull)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dirFull, "_index.000000000010")),
      "retry did not take the next generation past the debris")
    val codesAfter = Similarity.readIndex(spark, dirFull).codes.count()
    assert(codesAfter == 49L * 2, s"expected 98 code rows, got $codesAfter")
    assert(Similarity.vacuumIndex(spark, dirFull) >= 1, "debris generation not reclaimed")
    assert(Similarity.readIndex(spark, dirFull).codes.count() == codesAfter,
      "vacuum changed the committed index")

    // --- generation compaction: many small appends -> bounded gen count,
    // identical serving (ADC and exact re-rank), victims vacuumable ------
    (0 until 3).foreach { b =>
      Similarity.appendToIndex(
        embs.where($"vec_id" % 3 === b)
          .select(($"vec_id" + 200L + b).as("vec_id"), $"embedding"),
        dirInc)
    }
    def manifestCodeGens(dir: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val names = fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith("_index.") && !n.endsWith(".tmp"))
      val in = fs.open(new org.apache.hadoop.fs.Path(p, names.max))
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      content.linesIterator.filter(_.startsWith("codes\t")).toSeq
    }
    assert(manifestCodeGens(dirInc).size == 5, "expected 5 code generations pre-compaction")
    val preCompact = key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2))
    val preCompactRr = Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2, shortlist = 8)
      .select("qid", "rank", "vec_id", "dot")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val preCodes = Similarity.readIndex(spark, dirInc).codes.count()
    assert(Similarity.compactIndex(spark, dirInc, maxGens = 2) >= 2)
    assert(manifestCodeGens(dirInc).size <= 2, s"gen count not bounded: ${manifestCodeGens(dirInc)}")
    assert(Similarity.readIndex(spark, dirInc).codes.count() == preCodes,
      "compaction changed code mass")
    assert(key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2)) == preCompact,
      "compaction changed ADC serving results")
    assert(Similarity.ivfPqTopKIndexedRerank(
        Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2, shortlist = 8)
      .select("qid", "rank", "vec_id", "dot")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      == preCompactRr, "compaction changed re-rank serving results")
    assert(Similarity.compactIndex(spark, dirInc, maxGens = 2) == 0,
      "already-compact index must be a no-op")
    assert(Similarity.vacuumIndex(spark, dirInc) >= 2, "victim generations not reclaimed")
    assert(key(Similarity.ivfPqTopKIndexed(
      Similarity.readIndex(spark, dirInc), queries, 3, nprobe = 2)) == preCompact,
      "vacuum after compaction changed serving")

    // legacy layout (a generation without the vectors artifact): append and
    // compact must fail LOUD at the operation, not PATH_NOT_FOUND at first
    // re-rank use far from the cause
    val legacyGen = manifestCodeGens(dirInc).head.stripPrefix("codes\t")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dirInc/gen=$legacyGen/vectors"), true)
    val eApp = intercept[IllegalStateException](
      Similarity.appendToIndex(
        embs.where($"vec_id" === 1L).select(($"vec_id" + 900L).as("vec_id"), $"embedding"),
        dirInc))
    assert(eApp.getMessage.contains("vectors artifact"), eApp.getMessage)
  }

  test("ANN index with assign_r=2: multiplicity, meta round-trip, append parity, serving dedup, brute-force ceiling") {
    import graft.ops.Similarity
    val embs = (0 until 48).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(d * 0.7 + (i % 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = embs.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val coarse = Similarity.trainCentroids(embs, 4, 2)
    val cb = Similarity.pqTrainCodebooksResidual(embs, coarse, dims = 8, m = 2, k = 3, iters = 2)

    val dir2 = tmpDir("idx_r2")
    Similarity.writeIndex(embs, coarse, cb, dir2, dims = 8, m = 2, assignR = 2)
    val idx = Similarity.readIndex(spark, dir2)
    assert(idx.assignR == 2, "assign_r did not round-trip through meta")
    assert(idx.codes.count() == 48L * 2 * 2, "r=2 index must carry 2x code rows (x m subs)")
    assert(idx.vectors.count() == 48L * 2, "r=2 index must carry 2x vector rows")
    // each vector's 2 cells are DISTINCT (top-2 of the sort, not a dup)
    val perVec = idx.vectors.groupBy("vec_id")
      .agg(count_distinct(col("cell")).as("nc")).collect()
    assert(perVec.forall(_.getLong(1) == 2L), "copies must land in distinct cells")

    // serving dedups copies: exactly k rows per query, distinct vec_ids,
    // contiguous ranks — for BOTH the ADC and the re-rank path
    def wellFormed(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val rows = df.select("qid", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      rows.groupBy(_._1).foreach { case (q, rs) =>
        assert(rs.map(_._3).distinct.length == rs.length, s"q$q: duplicate vec_ids")
        assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"q$q: ranks not contiguous")
        assert(rs.length == k, s"q$q: ${rs.length} rows, expected $k")
      }
    }
    wellFormed(Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 2), 3)
    wellFormed(Similarity.ivfPqTopKIndexedRerank(idx, queries, 3, nprobe = 2, shortlist = 16), 3)

    // append reads assign_r from meta — half-build + append == full build
    val dirInc2 = tmpDir("idx_r2_inc")
    Similarity.writeIndex(
      embs.where($"vec_id" < 24), coarse, cb, dirInc2, dims = 8, m = 2, assignR = 2)
    Similarity.appendToIndex(embs.where($"vec_id" >= 24), dirInc2)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "vec_id", "adc")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(Similarity.ivfPqTopKIndexed(
        Similarity.readIndex(spark, dirInc2), queries, 3, nprobe = 2))
      == key(Similarity.ivfPqTopKIndexed(idx, queries, 3, nprobe = 2)),
      "r=2 append diverged from r=2 full build")

    // full-probe + covering shortlist: the two-stage indexed ranking must
    // equal the exact brute-force scan bit-for-bit (same dot, same
    // tie-break) — copies and dedup cannot leak into the final ranking
    def rkey(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "vec_id", "dot")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(
      rkey(Similarity.ivfPqTopKIndexedRerank(idx, queries, 3, nprobe = 4, shortlist = 200))
        == rkey(Similarity.bruteForceTopK(embs, queries, 3)),
      "full-probe r=2 re-rank diverged from brute force")
  }

  test("S5-manifest: committed generations are immutable — a reader's snapshot survives an upsert") {
    val dir = tmpDir("stmts_m_snap")
    FinOps.upsertStatementsManifest(FinOps.toStatementItems(statement), dir, spark)
    // lazy plan pinned to the pre-upsert manifest
    val snapshot = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
    val snapCountBefore = snapshot.count()
    // replace user 1's December with 5 rows (the staged scheme would
    // rewrite the partition this plan reads; the manifest scheme writes a
    // NEW generation and leaves the old directory intact)
    FinOps.upsertStatementsManifest(
      FinOps.toStatementItems(statement.where($"userId" === "1").limit(5)), dir, spark)
    assert(snapshot.count() == snapCountBefore, "snapshot changed under the reader")
    val current = FinOps.explodeStatements(FinOps.readStatementsManifest(spark, dir).get)
    assert(current.count() == snapCountBefore - 7) // 12 → 5 for user 1's month
  }

  test("S5-manifest: generation compaction preserves content, bounds live gens, unlocks vacuum") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_compact")
    def batch(p: String, tag: String) =
      spark.range(5).select(
        lit(p).as("k"), concat(lit(tag + "_"), $"id").as("id"), $"id".as("v"))
    // five upserts, each touching its own partition → five live generations
    (1 to 5).foreach(i =>
      ManifestStore.upsert(batch(s"p$i", s"b$i"), dir, "k", Seq("k", "id"), spark))
    def snapshot(): Seq[(String, String, Long)] =
      ManifestStore.currentFrame(spark, dir, "k").get
        .select($"k", $"id", $"v").as[(String, String, Long)]
        .collect().toSeq.sorted
    val before = snapshot()
    assert(ManifestStore.readManifest(spark, dir).get.entries.values.toSet.size == 5)

    // partial compaction: rewrite volume bounded — smallest gens collapse,
    // the largest survivor stays untouched, content identical
    assert(ManifestStore.compact(spark, dir, "k", maxGens = 2) == 4)
    assert(ManifestStore.readManifest(spark, dir).get.entries.values.toSet.size == 2)
    assert(snapshot() == before, "partial compaction changed table content")

    // full compaction → one generation; an already-compact table is a no-op
    assert(ManifestStore.compact(spark, dir, "k") == 5)
    assert(ManifestStore.readManifest(spark, dir).get.entries.values.toSet.size == 1)
    assert(ManifestStore.compact(spark, dir, "k") == 0)

    // every superseded generation is now dead weight vacuum can reclaim,
    // and reads are unchanged afterwards
    assert(ManifestStore.vacuum(spark, dir) >= 4)
    assert(snapshot() == before, "vacuum after compaction changed table content")
  }

  test("S5-manifest: a racing concurrent writer cannot corrupt the winner's commit") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_race")
    def batch(tag: String) =
      spark.range(4).select(
        lit("p1").as("k"), concat(lit(tag + "_"), $"id").as("id"), $"id".as("v"))
    ManifestStore.upsert(batch("seed"), dir, "k", Seq("k", "id"), spark) // version 1

    // Writer A wins version 2 through the real path.
    ManifestStore.upsert(batch("winner"), dir, "k", Seq("k", "id"), spark)

    // Writer B raced: it read the version-1 manifest BEFORE A committed, so
    // it computed the same next version (2) — but its generation directory
    // carries ITS writer token, structurally disjoint from A's. Emulate its
    // interleaved execution: the data write lands (token-unique dir), then
    // its manifest rename targets the name A already committed.
    val loserGen = "2-deadbeef"
    batch("loser").withColumn("gen", lit(loserGen)).repartition($"k")
      .write.mode("append").partitionBy("gen", "k").parquet(s"$dir/data")
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, "_manifest.000000000002.tmp")
    val out = hfs.create(tmp, true)
    try out.write(s"p1\t$loserGen\n".getBytes("UTF-8")) finally out.close()
    val renamed = hfs.rename(tmp, new org.apache.hadoop.fs.Path(dir, "_manifest.000000000002"))
    assert(!renamed, "rename onto an existing manifest name must fail — exactly one writer wins")

    // Readers see the winner's merge (seed rows carry over on their own
    // merge keys) and NOTHING of the loser — its token dir is invisible.
    val ids = ManifestStore.currentFrame(spark, dir, "k").get
      .select($"id").as[String].collect().toSet
    val expected = (0 until 4).flatMap(i => Seq(s"seed_$i", s"winner_$i")).toSet
    assert(ids == expected, s"loser rows leaked into reads: $ids")
    // The winner's manifest is structurally unable to name the loser's dir.
    val m = ManifestStore.readManifest(spark, dir).get
    assert(m.version == 2 && !m.entries.values.toSet.contains(loserGen), m.toString)

    // The loser's debris is unreferenced → vacuum reclaims it; reads unchanged.
    assert(ManifestStore.vacuum(spark, dir) >= 1)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/gen=$loserGen")),
      "loser generation survived vacuum")
    val after = ManifestStore.currentFrame(spark, dir, "k").get
      .select($"id").as[String].collect().toSet
    assert(after == ids, "vacuum changed reader-visible state")
  }

  test("S5-manifest: time travel — every commit is an addressable snapshot until vacuumed past") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_tt")
    def batch(p: String, v: Long) =
      spark.range(3).select(
        lit(p).as("k"), concat(lit("i"), $"id").as("id"), lit(v).as("v"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long)] =
      df.select($"k", $"id", $"v").as[(String, String, Long)].collect().toSeq.sorted
    ManifestStore.upsert(batch("p1", 1), dir, "k", Seq("k", "id"), spark)
    ManifestStore.upsert(batch("p2", 2), dir, "k", Seq("k", "id"), spark)
    ManifestStore.upsert(batch("p1", 3), dir, "k", Seq("k", "id"), spark) // replaces p1
    assert(ManifestStore.versions(spark, dir) == Seq(1L, 2L, 3L))

    val expectV1 = (0 until 3).map(i => ("p1", s"i$i", 1L)).sorted
    val expectV2 = (expectV1 ++ (0 until 3).map(i => ("p2", s"i$i", 2L))).sorted
    val expectV3 = ((0 until 3).map(i => ("p1", s"i$i", 3L)) ++
      (0 until 3).map(i => ("p2", s"i$i", 2L))).sorted
    assert(rows(ManifestStore.frameAt(spark, dir, "k", 1).get) == expectV1)
    assert(rows(ManifestStore.frameAt(spark, dir, "k", 2).get) == expectV2)
    assert(rows(ManifestStore.currentFrame(spark, dir, "k").get) == expectV3)

    // retention-aware vacuum: the newest 2 snapshots survive (every
    // generation either of them names stays), snapshot 1 is reclaimed
    ManifestStore.vacuum(spark, dir, retainVersions = 2)
    assert(ManifestStore.frameAt(spark, dir, "k", 1).isEmpty, "below-horizon snapshot survived")
    assert(rows(ManifestStore.frameAt(spark, dir, "k", 2).get) == expectV2)
    assert(rows(ManifestStore.currentFrame(spark, dir, "k").get) == expectV3)

    // full vacuum: only the current snapshot remains; content unchanged
    assert(ManifestStore.vacuum(spark, dir) >= 1)
    assert(ManifestStore.frameAt(spark, dir, "k", 2).isEmpty)
    assert(rows(ManifestStore.currentFrame(spark, dir, "k").get) == expectV3)
  }

  test("S5-manifest: SQL surface — manifest table registers as a (snapshot) view") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_view")
    def batch(p: String, v: Long) =
      spark.range(2).select(
        lit(p).as("k"), concat(lit("i"), $"id").as("id"), lit(v).as("v"))
    ManifestStore.upsert(batch("p1", 1), dir, "k", Seq("k", "id"), spark)
    ManifestStore.upsert(batch("p1", 2), dir, "k", Seq("k", "id"), spark) // replaces

    assert(GraftCatalog.registerManifestTable(spark, dir, "k", "mview"))
    assert(spark.sql("SELECT sum(v) FROM mview").as[Long].head() == 4L) // 2 rows at v=2

    // time-travel view: the v=1 snapshot, addressable side by side
    assert(GraftCatalog.registerManifestTable(spark, dir, "k", "mview_v1", asOf = Some(1L)))
    assert(spark.sql("SELECT sum(v) FROM mview_v1").as[Long].head() == 2L)

    // a registered view is a SNAPSHOT: a later upsert doesn't shift it...
    ManifestStore.upsert(batch("p2", 9), dir, "k", Seq("k", "id"), spark)
    assert(spark.sql("SELECT sum(v) FROM mview").as[Long].head() == 4L)
    // ...until re-registered
    assert(GraftCatalog.registerManifestTable(spark, dir, "k", "mview"))
    assert(spark.sql("SELECT sum(v) FROM mview").as[Long].head() == 22L)

    // registering a nonexistent table is a clean false, no view created
    assert(!GraftCatalog.registerManifestTable(spark, tmpDir("empty_m"), "k", "mnone"))
  }

  test("S5-manifest: stats reports versions, live spread, and debris; tracks compact/vacuum") {
    import graft.ops.ManifestStore
    val dir = tmpDir("stmts_m_stats")
    def batch(p: String) = spark.range(2).select(
      lit(p).as("k"), concat(lit("i"), $"id").as("id"), lit(1L).as("v"))
    assert(ManifestStore.stats(spark, dir).isEmpty, "no commit -> no stats")
    ManifestStore.upsert(batch("p1"), dir, "k", Seq("k", "id"), spark)
    ManifestStore.upsert(batch("p2"), dir, "k", Seq("k", "id"), spark)
    ManifestStore.upsert(batch("p3"), dir, "k", Seq("k", "id"), spark)
    val s1 = ManifestStore.stats(spark, dir).get
    assert(s1.version == 3 && s1.livePartitions == 3 && s1.liveGenerations == 3)
    assert(s1.nManifestFiles == 3 && s1.debrisGenerations == 0)
    // compaction collapses the live spread; superseded gens become debris
    ManifestStore.compact(spark, dir, "k", maxGens = 1)
    val s2 = ManifestStore.stats(spark, dir).get
    assert(s2.liveGenerations == 1 && s2.livePartitions == 3)
    assert(s2.debrisGenerations == 3, s2.toString)
    // vacuum reclaims the debris and below-horizon manifests
    ManifestStore.vacuum(spark, dir)
    val s3 = ManifestStore.stats(spark, dir).get
    assert(s3.debrisGenerations == 0 && s3.nManifestFiles == 1 && s3.liveGenerations == 1)
  }
}
