package graft

/** The engine's SQL entry point: views + native functions via spark.sql. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views and native functions are usable from plain SQL") {
    GraftCatalog.registerViews(spark, "/root/testdata/sf0.001")

    // canonical transactions view
    val totals = spark.sql(
      """SELECT category, CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM transactions GROUP BY category ORDER BY category""".stripMargin)
    assert(totals.count() == 3) // o_orderstatus domain

    // native quantized_dot from SQL
    val sims = spark.sql(
      """SELECT a.vec_id, quantized_dot(a.embedding, b.embedding) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |ORDER BY dot DESC LIMIT 3""".stripMargin).collect()
    assert(sims.head.getLong(0) == 0L) // self-similarity ranks first
    assert(sims.head.getLong(1) > 900000000000L)

    // a financial analytic straight from SQL over the same view
    val risky = spark.sql(
      """WITH t AS (SELECT *, max(yearMonth) OVER (PARTITION BY userId) AS tym FROM transactions)
        |SELECT count(*) FROM t WHERE yearMonth = tym""".stripMargin).collect()
    assert(risky.head.getLong(0) > 0)

    // the per-document kernels from SQL
    val kernels = spark.sql(
      """SELECT
        |  simhash32(split('a b a', ' ')) AS sh,
        |  min_shingle_hash(split('a b c d', ' '), 3) AS msh,
        |  size(minhash_sigs(split('a b c d', ' '), 16, 3)) AS n_sigs,
        |  repetition_stats(split('a a a b', ' ')).top_token_frac AS tf""".stripMargin).collect()(0)
    assert(kernels.getLong(0) != 0L && !kernels.isNullAt(1))
    assert(kernels.getInt(2) == 16 && kernels.getDouble(3) == 0.75)
    // fewer tokens than the shingle size is null, not a crash
    assert(spark.sql("SELECT min_shingle_hash(split('a b', ' '), 3)").collect()(0).isNullAt(0))
    // 64-bit sketch: present from SQL and distinct from the 32-bit sketch
    val sh64 = spark.sql(
      "SELECT simhash64(split('a b a', ' ')), simhash32(split('a b a', ' '))").collect()(0)
    assert(sh64.getLong(0) != 0L && sh64.getLong(0) != sh64.getLong(1))
    // winnowing fingerprints from SQL: 6 shingles, windows of 4 → ≤3 distinct minima
    val wf = spark.sql(
      "SELECT winnow_fps(split('a b c d e f g h', ' '), 3, 4) AS fps").collect()(0)
    val fps = wf.getSeq[Long](0)
    assert(fps.nonEmpty && fps.size <= 3 && fps == fps.sorted && fps.distinct == fps)
    // the r14 URL/text codec kernels, callable straight from SQL
    val codec = spark.sql(
      """SELECT
        |  pct_normalize('http://h/%7e%2fx') AS pct,
        |  html_unescape('A &amp;amp; &#x27;B&#8217;') AS ent,
        |  idn_ascii('BÜCHER.DE') AS idn,
        |  lang_id_ngram('the house is near the river and the people walk') AS lang,
        |  lang_id_ngram('') AS undl""".stripMargin).collect()(0)
    assert(codec.getString(0) == "http://h/~%2Fx", codec.getString(0))
    assert(codec.getString(1) == "A &amp; 'B’", codec.getString(1))
    assert(codec.getString(2) == "xn--bcher-kva.de")
    assert(codec.getString(3) == "en" && codec.getString(4) == "und")
    // bpe_encode from SQL once a merge table is bound to the session
    GraftExtensions.registerBpe(spark, Seq(("a", "b"), ("ab", "c")))
    val bpe = spark.sql("SELECT bpe_encode(split('abc xab', ' '))")
      .collect()(0).getSeq[String](0)
    assert(bpe == Seq("abc", "x", "ab"))
    // bloom_build aggregates a sketch; bloom_probe answers membership with
    // no false negatives. The probe requires a constant or SCALAR SUBQUERY
    // sketch (same contract as Spark's internal might_contain) — the
    // subquery form is the fully-distributed no-collect composition.
    val bloom = spark.sql(
      """SELECT bloom_probe(
        |         (SELECT bloom_build(xxhash64(concat('v', id)), 100L, 4096L)
        |          FROM range(0, 100)),
        |         xxhash64('v7')) AS hit""".stripMargin).collect()(0)
    assert(bloom.getBoolean(0), "bloom filter false negative")
    // round-10 kernels from SQL: perceptual hashes over the planted
    // fixtures and NFC normalization
    val r10 = spark.sql(
      """SELECT image_ahash(synth_image(CAST(5 AS BIGINT))) AS ih,
        |       audio_fingerprint(synth_wav(CAST(5 AS BIGINT))) AS af,
        |       image_ahash(CAST('junk' AS BINARY)) AS bad,
        |       text_normalize('  A		b ') AS tn""".stripMargin).collect()(0)
    assert(!r10.isNullAt(0) && !r10.isNullAt(1))
    assert(r10.isNullAt(2), "garbage bytes must hash to NULL")
    assert(r10.getString(3) == "a b")
  }

  test("curation operators run PURELY through spark.sql as table functions, " +
    "identical to the Scala API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    GraftCatalog.registerViews(spark, "/root/testdata/sf0.001")
    Seq((0L, "spark dup"), (1L, "hash join merge"))
      .toDF("qid", "qtext").createOrReplaceTempView("tfq")

    // 1. exact dedup
    val sqlDedup = spark.sql(
      """SELECT doc_id FROM graft_dedup_exact('documents', 'doc_id', 'text')
        |ORDER BY doc_id""".stripMargin).as[Long].collect().toSeq
    val apiDedup = graft.ops.Dedup.exactByContent(
        spark.table("documents"), "doc_id", "text")
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(sqlDedup == apiDedup && sqlDedup.nonEmpty)

    // 2. deterministic sample (and the SQL form composes downstream SQL)
    val sqlSample = spark.sql(
      """SELECT count(*) FROM graft_sample('documents', 'doc_id', 0.25, 's1')"""
    ).as[Long].collect()(0)
    val apiSample = graft.ops.Corpus.sampleDeterministic(
      spark.table("documents"), "doc_id", 0.25, "s1").count()
    assert(sqlSample == apiSample && sqlSample > 0)

    // 3. split labels
    val sqlSplit = spark.sql(
      """SELECT split, count(*) AS n
        |FROM graft_split('documents', 'doc_id', 0.8, 0.1, '')
        |GROUP BY split ORDER BY split""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val apiSplit = graft.ops.Corpus.withSplit(spark.table("documents"), "doc_id")
      .groupBy("split").count().orderBy("split")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlSplit == apiSplit && sqlSplit.map(_._1) == Seq("test", "train", "validation"))

    // 4. per-group cap
    val sqlCap = spark.sql(
      """SELECT lang, count(*) AS n
        |FROM graft_cap_per_group('documents', 'lang', 5, 'doc_id')
        |GROUP BY lang""".stripMargin)
      .collect().map(r => r.getLong(1)).toSeq
    assert(sqlCap.nonEmpty && sqlCap.forall(_ <= 5))

    // 5. BM25 top-k against a queries view
    val sqlBm25 = spark.sql(
      """SELECT qid, rank, doc_id, score
        |FROM graft_bm25_topk('documents', 'doc_id', 'text', 'tfq', 5)
        |ORDER BY qid, rank""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val apiBm25 = graft.ops.Retrieval.bm25(
        spark.table("documents"), "doc_id", "text", spark.table("tfq"), k = 5)
      .orderBy("qid", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(sqlBm25 == apiBm25 && sqlBm25.nonEmpty)

    // 6. quality signals (SQL filter over the TVF output — the gate shape)
    val sqlQual = spark.sql(
      """SELECT count(*) FROM graft_quality('documents', 'doc_id', 'text')
        |WHERE n_tokens >= 5 AND stopword_ratio >= 0""".stripMargin)
      .as[Long].collect()(0)
    assert(sqlQual > 0)

    // wrong arity / non-literal args fail loud with the descriptive error
    val ex = intercept[Exception](
      spark.sql("SELECT * FROM graft_dedup_exact('documents', 'doc_id')").collect())
    assert(ex.getMessage.contains("expects 3 argument"), ex.getMessage)
  }

  test("the persisted stores serve from plain SQL: minhash pairs and media near-dups") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // minhash index over a tiny planted corpus
    val docsDf = (0 until 12).map { i =>
      val shared = (0 until 10).map(k => s"w${(i / 3 * 5 + k) % 13}").mkString(" ")
      (i.toLong, s"$shared t${i % 3}")
    }.toDF("doc_id", "text")
    val mhDir = tmpDir("sql_mh")
    graft.ops.MinhashIndex.writeMinhashIndex(docsDf, mhDir)
    val sqlPairs = spark.sql(
      s"SELECT id_a, id_b FROM graft_minhash_pairs('$mhDir', 64) ORDER BY id_a, id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val apiPairs = graft.ops.MinhashIndex.candidatePairsIndexed(spark, mhDir, 64)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlPairs == apiPairs && sqlPairs.nonEmpty)

    // feature store with two identical planted images
    val assets = graft.ops.Multimodal.asAsset(
      $"asset_id", lit("image"), call_function("synth_image", $"pk"), lit("s"))(
      Seq((1L, 5L), (2L, 5L), (3L, 6L)).toDF("asset_id", "pk"))
    val mmDir = tmpDir("sql_mm")
    graft.ops.Multimodal.writeFeatureStore(assets, mmDir)
    val sqlDups = spark.sql(
      s"SELECT id_a, id_b, hamming FROM graft_mm_neardups('$mmDir', 'image', 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sqlDups.contains((1L, 2L, 0)), sqlDups.toString)
    val bad = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_mm_neardups('$mmDir', 'video', 3)").collect())
    assert(bad.getMessage.contains("modality"), bad.getMessage)
  }

  test("paragraph dedup and binary ANN run purely through spark.sql") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "banner\nalpha"), (2L, "banner\nbeta"))
      .toDF("doc_id", "text").createOrReplaceTempView("para_docs")
    val kf = spark.sql(
      "SELECT doc_id, text FROM graft_paragraph_dedup('para_docs', 'doc_id', 'text', 'keep_first') ORDER BY doc_id")
      .as[(Long, String)].collect().toSeq
    assert(kf == Seq((1L, "banner\nalpha"), (2L, "beta")))
    val ra = spark.sql(
      "SELECT doc_id, text FROM graft_paragraph_dedup('para_docs', 'doc_id', 'text', 'remove_all') ORDER BY doc_id")
      .as[(Long, String)].collect().toSeq
    assert(ra == Seq((1L, "alpha"), (2L, "beta")))
    val badMode = intercept[Exception](spark.sql(
      "SELECT * FROM graft_paragraph_dedup('para_docs', 'doc_id', 'text', 'zap')").collect())
    assert(badMode.getMessage.contains("mode"), badMode.getMessage)

    Seq((0L, Array(0.9f, 0.8f, 0.7f, 0.6f)), (1L, Array(0.1f, 0.2f, 0.3f, -0.1f)),
      (2L, Array(-1f, -1f, -1f, -1f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("bin_vecs")
    Seq((9L, Array(1f, 1f, 1f, 1f)))
      .toDF("qid", "qvec").createOrReplaceTempView("bin_queries")
    val sqlTop = spark.sql(
      "SELECT qid, rank, vec_id, dot FROM graft_binary_topk(" +
        "'bin_vecs', 'vec_id', 'embedding', 'bin_queries', 2, 3, 4) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val apiTop = graft.ops.Similarity.binaryTopKRerank(
        spark.table("bin_vecs"), spark.table("bin_queries"), 2, 3, 4)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSeq
    assert(sqlTop == apiTop && sqlTop.head == ((9L, 1, 0L)))
  }

  test("URL filter and memorization profile run purely through spark.sql") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "https://ok.com/a"), (2L, "https://bad.com/a"),
      (3L, "https://ok.com/spam/x"))
      .toDF("doc_id", "url").createOrReplaceTempView("uf_docs")
    Seq("bad.com").toDF("host").createOrReplaceTempView("uf_blocked")
    val kept = spark.sql(
      "SELECT doc_id FROM graft_url_filter('uf_docs', 'url', 'uf_blocked', '/spam/') ORDER BY doc_id")
      .as[Long].collect().toSeq
    assert(kept == Seq(1L))
    // '' disables the path rule
    val hostOnly = spark.sql(
      "SELECT doc_id FROM graft_url_filter('uf_docs', 'url', 'uf_blocked', '') ORDER BY doc_id")
      .as[Long].collect().toSeq
    assert(hostOnly == Seq(1L, 3L))

    Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text").createOrReplaceTempView("mem_docs")
    val mem = spark.sql(
      "SELECT id, max_dup_span FROM graft_memorization('mem_docs', 'doc_id', 'text', 3) ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(mem == Seq((1L, 6L), (2L, 6L), (3L, 0L)))
  }

  test("drift and NB reliability monitors are SQL-reachable with Scala parity") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // categorical drift: reference 50/50, current 80/20 over the key
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang").createOrReplaceTempView("drift_ref")
    (1 to 100).map(i => (i.toLong, if (i % 5 == 0) "de" else "en"))
      .toDF("id", "lang").createOrReplaceTempView("drift_cur")
    val sqlDrift = spark.sql(
      "SELECT key, psi, jsd FROM graft_drift('drift_ref', 'drift_cur', 'lang') ORDER BY key")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val apiDrift = graft.ops.Profile.driftByKey(
        spark.table("drift_ref"), spark.table("drift_cur"), "lang")
      .orderBy("key")
      .collect().map(r => (r.getAs[String]("key"),
        r.getAs[Double]("psi"), r.getAs[Double]("jsd"))).toSeq
    assert(sqlDrift == apiDrift && sqlDrift.map(_._1) == Seq("de", "en"))
    assert(sqlDrift.forall(_._2 > 0), "an 80/20-vs-50/50 shift must carry PSI mass")

    // NB reliability: disjoint class vocabularies train clean, one
    // conflicted held-out doc lands in the low bucket
    val train = (1 to 40).map(i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta", "a")
      else (i.toLong, "omega psi chi phi", "b"))
    train.toDF("doc_id", "text", "lang").createOrReplaceTempView("nbr_train")
    Seq((101L, "alpha beta gamma", "a"), (102L, "omega psi chi", "b"),
      (103L, "alpha omega", "a"))
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("nbr_held")
    val sqlRel = spark.sql(
      "SELECT bucket, n, n_correct FROM graft_nb_reliability(" +
        "'nbr_train', 'nbr_held', 'doc_id', 'text', 'lang') ORDER BY bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val apiRel = graft.ops.TextOps.nbMarginReliability(
        spark.table("nbr_held"), "doc_id", "text", "lang",
        graft.ops.TextOps.nbTrain(spark.table("nbr_train"), "lang", "text"))
      .orderBy("bucket")
      .collect().map(r => (r.getAs[Long]("bucket"),
        r.getAs[Long]("n"), r.getAs[Long]("n_correct"))).toSeq
    assert(sqlRel == apiRel && sqlRel.map(_._2).sum == 3L)

    // card diff: the release-gate table from SQL, and the native
    // registrable_domain kernel straight in a SELECT
    (1 to 10).map(i => (i.toLong, s"doc $i", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("card_a")
    (1 to 15).map(i => (i.toLong, s"doc ${i % 12}", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("card_b")
    val cd = spark.sql(
      "SELECT metric, delta FROM graft_card_diff('card_a', 'card_b') ORDER BY metric")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cd("n_docs") == 5L && cd("n_distinct_texts") == 2L)
    val rd = spark.sql(
      "SELECT registrable_domain('a1.spam.co.uk'), registrable_domain('bob.github.io')")
      .collect()(0)
    assert(rd.getString(0) == "spam.co.uk" && rd.getString(1) == "bob.github.io")
  }
}
