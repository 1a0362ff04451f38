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
}
