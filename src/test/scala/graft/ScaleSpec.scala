package graft

import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Bucketed co-located joins and salted skew handling. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    // a stale warehouse dir from a previous JVM survives the in-memory
    // catalog — clear both
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Scale.writeBucketed(a, "bkt_a", "k", 8)
    Scale.writeBucketed(b, "bkt_b", "k", 8)
    // force the non-broadcast path — bucketing is about avoiding the
    // SHUFFLE when both sides are too big to broadcast
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located
      assert(plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("range-clustered write yields disjoint per-file key ranges for skipping") {
    val dir = java.nio.file.Files.createTempDirectory("range_clustered").toString
    // write order deliberately scrambled — clustering must impose the
    // layout. SEEDED shuffle: RangePartitioner boundaries derive from the
    // input sample, so an unseeded permutation makes file boundaries (and
    // the pruning counts asserted below) vary run to run.
    val df = new scala.util.Random(42).shuffle((1 to 4000).toList)
      .map(i => (i.toLong, s"payload$i")).toDF("k", "v")
    Scale.writeRangeClustered(df, dir, filesPerWrite = 8, $"k")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size > 1, s"expected multiple files, got $files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // every file covers its own slice: no overlap between consecutive ranges,
    // which is exactly what lets parquet min/max stats skip files
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB, s"overlapping ranges: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 4000)
  }

  test("z-ordered layout prunes files on BOTH columns; single-column clustering only on one") {
    // two independent uniform dimensions: y is a bit-reversal-style
    // permutation of x, so sorting by x scrambles y completely. Seeded
    // shuffle — see the range-clustered test: unseeded input order makes
    // the sampled range boundaries, and so the marginal pruning-count
    // assertions, nondeterministic (observed flake).
    val n = 20000
    val df = new scala.util.Random(42).shuffle((0 until n).toList)
      .map(i => (i.toLong, ((i.toLong * 7919L) % n), s"p$i")).toDF("x", "y", "v")

    val zDir = tmpDir("zorder")
    val rDir = tmpDir("range1d")
    Scale.writeZOrdered(df, zDir, filesPerWrite = 16, "x", "y", buckets = 256)
    Scale.writeRangeClustered(df, rDir, filesPerWrite = 16, $"x")

    def parquetFiles(dir: String): Seq[String] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq

    // files a min/max-pruning reader must scan for a predicate lo<=c<=hi —
    // computed from the files' actual stats, the same facts parquet footers
    // carry at 100 TB
    def filesTouched(dir: String, c: String, lo: Long, hi: Long): Int =
      parquetFiles(dir).count { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }

    val zf = parquetFiles(zDir)
    assert(zf.size > 8, s"expected ~16 z-order files, got ${zf.size}")

    // 1%-selectivity predicate on each axis
    val zX = filesTouched(zDir, "x", 5000, 5200)
    val zY = filesTouched(zDir, "y", 5000, 5200)
    val rX = filesTouched(rDir, "x", 5000, 5200)
    val rY = filesTouched(rDir, "y", 5000, 5200)

    // the 1-D layout is perfect on its own column and useless on the other
    assert(rX <= 2, s"range-clustered x predicate touched $rX files")
    assert(rY >= 14, s"independent y should defeat 1-D clustering, touched $rY")
    // z-order prunes meaningfully on BOTH axes — each file is ~a rectangle.
    // Bound sized to the layout's physics, not wishfully: 16 files over a
    // Morton curve ≈ a 4×4 rectangle grid, so a 1% slice on either axis
    // touches ~one 4-file stripe, plus spill where the 16 equal-count cut
    // points land mid-rectangle — ≤ 10 of 16, against 14–16 for the
    // wrong-axis 1-D case
    assert(zX <= zf.size * 5 / 8, s"z-order x predicate touched $zX of ${zf.size}")
    assert(zY <= zf.size * 5 / 8, s"z-order y predicate touched $zY of ${zf.size}")
    assert(zY < rY, "z-order must beat 1-D clustering on the second column")

    // layout changes bytes on disk, never content
    assert(spark.read.parquet(zDir).count() == n)
    assert(spark.read.parquet(zDir).agg(sum($"x"), sum($"y")).head ==
      spark.read.parquet(rDir).agg(sum($"x"), sum($"y")).head)
  }

  test("salted join spreads a hot key and preserves the join result") {
    // 10k rows of one hot key + a few cold keys, joined to a small dim
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++ Seq((2L, 90001L), (3L, 90002L)))
      .toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "cold2"), (3L, "cold3")).toDF("k", "name")
    val out = Scale.saltedJoin(left, dim, "k", "row_id", saltFactor = 8)
    assert(out.count() == 10002)
    assert(out.where($"k" === 1 && $"name" =!= "hot").isEmpty)
    // salts actually spread the hot key across partitionings
    val salts = left.withColumn("_salt",
      (graft.ops.TextOps.hash32($"row_id".cast("string")) % 8).cast("int"))
      .where($"k" === 1).select("_salt").distinct().count()
    assert(salts == 8)
  }

  test("salted collect_list equals the unsalted multiset") {
    val df = (1 to 500).map(i => ("u1", i.toLong)) .toDF("k", "v")
    val salted = Scale.saltedCollectList(df, "k", "v", col("v"), 4)
      .select($"k", size($"items").as("n"))
      .as[(String, Int)].collect()
    assert(salted.toSeq == Seq(("u1", 500)))
  }

  test("whale user: salted nest bounds any single partial group's state") {
    // one whale user holds 50% of the corpus; 200 normal users share the rest
    val whale = (1 to 10000).map(i => ("whale", i.toLong))
    val rest = (1 to 10000).map(i => (s"u${i % 200}", 100000L + i))
    val df = (whale ++ rest).toDF("k", "v")

    val out = Scale.saltedCollectList(df, "k", "v", col("v"), saltFactor = 16)
    // correctness: the whale's nested multiset is complete
    val sizes = out.select($"k", size($"items").as("n")).as[(String, Int)]
      .collect().toMap
    assert(sizes("whale") == 10000)
    assert(sizes.values.sum == 20000)

    // state bound: phase one groups by (key, salt), so no partial group —
    // hence no single task's aggregation state — holds more than ~1/16 of the
    // whale (2× slack over perfect hash balance). An unsalted collect_list
    // would put all 10000 rows in ONE group's buffer.
    val partialMax = df
      .withColumn("_salt", (graft.ops.TextOps.hash32($"v".cast("string")) % 16).cast("int"))
      .groupBy("k", "_salt").count()
      .agg(max("count")).as[Long].collect()(0)
    assert(partialMax <= (10000 / 16) * 2, s"largest partial group = $partialMax")
  }

  test("autoSaltFactor: sketch-driven decision — 1 on uniform keys, ~hot/typical lanes on a whale, capped") {
    // uniform occupancy: salting would only add a useless second phase
    val uniform = (1 to 2000).map(i => (s"u${i % 100}", i.toLong)).toDF("k", "v")
    assert(Scale.autoSaltFactor(uniform, "k") == 1)

    // whale at 100x the median: factor ≈ hot/typical, NOT the default constant
    val whale = ((1 to 5000).map(i => ("whale", i.toLong)) ++
      (1 to 5000).map(i => (s"u${i % 100}", 100000L + i))).toDF("k", "v")
    val f = Scale.autoSaltFactor(whale, "k")
    assert(f >= 50 && f <= 64, s"expected ~hot/typical=100 capped at 64, got $f")

    // the cap bounds build-side replication no matter how extreme the skew
    assert(Scale.autoSaltFactor(whale, "k", cap = 8) == 8)

    // end-to-end: nesting under the measured factor is still the exact
    // unsalted multiset
    val sizes = Scale.saltedCollectList(whale, "k", "v", col("v"), f)
      .select($"k", size($"items").as("n")).as[(String, Int)].collect().toMap
    assert(sizes("whale") == 5000 && sizes.values.sum == 10000)
  }

  test("autoSaltFactor: sketch decision parity with the exact opt-in path") {
    // The sketch path must AGREE with autoSaltFactorExact (full key
    // shuffle) on the decisions that matter — salt-or-not, and the lane
    // count within sketch-error tolerance (HLL distinct ~2-5%, CMS never
    // under, MG never over: a lane or two of drift, never a regime flip).

    // uniform: both say don't salt
    val uniform = (1 to 2000).map(i => (s"u${i % 100}", i.toLong)).toDF("k", "v")
    assert(Scale.autoSaltFactorExact(uniform, "k") == 1)
    assert(Scale.autoSaltFactor(uniform, "k") == 1)

    // moderate whale (20x the bulk): exact gives ceil(1000/50) = 20 lanes;
    // the sketch must land within +-2
    val whale20 = ((1 to 1000).map(i => ("whale", i.toLong)) ++
      (1 to 5000).map(i => (s"u${i % 100}", 100000L + i))).toDF("k", "v")
    val fe = Scale.autoSaltFactorExact(whale20, "k")
    val fs = Scale.autoSaltFactor(whale20, "k")
    info(s"whale20: exact=$fe sketch=$fs")
    assert(fe == 20, s"exact path moved: $fe")
    assert(math.abs(fs - fe) <= 2, s"sketch factor $fs drifted from exact $fe")

    // extreme whale: both hit the cap — identical decision
    val whale100 = ((1 to 5000).map(i => ("whale", i.toLong)) ++
      (1 to 5000).map(i => (s"u${i % 100}", 100000L + i))).toDF("k", "v")
    assert(Scale.autoSaltFactorExact(whale100, "k") == 64)
    assert(Scale.autoSaltFactor(whale100, "k") == 64)
  }

  test("manifest compaction re-clusters: file skipping holds after an upsert storm + compact") {
    import graft.ops.ManifestStore
    // An upsert storm leaves each shard's rows in INGEST order — every
    // file spans the full key range, so min/max pruning is useless. The
    // compaction rewrite is the natural re-clustering point: afterwards a
    // selective read must touch a fraction of each shard's rows (by the
    // same footer stats a 100 TB reader prunes with).
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    val priorCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "24")
    // AQE would (correctly, at real scale) coalesce this toy shuffle to one
    // task; pin the width so the test can observe per-file ranges at all
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      def storm(dir: String): Unit = {
        val rnd = new scala.util.Random(11)
        for (shard <- Seq("s0", "s1"); half <- 0 until 2) {
          // each batch sprays x uniformly over the full [0, 16000) range
          val rows = rnd.shuffle((0 until 4000).toList).map { i =>
            val x = (i * 4 + half * 2 + (if (shard == "s0") 0 else 1)).toLong % 16000
            (shard, s"${shard}_${half}_$i", x, (x * 4409L) % 16000L)
          }
          ManifestStore.upsert(
            rows.toDF("k", "id", "x", "y"), dir, "k", Seq("k", "id"), spark)
        }
      }
      def liveFiles(dir: String, shard: String): Seq[String] = {
        val m = ManifestStore.readManifest(spark, dir).get
        val g = m.entries(shard)
        new java.io.File(s"$dir/data/gen=$g/k=$shard").listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      }
      // fraction of a shard's ROWS a min/max-pruning reader must scan for
      // a 2%-selectivity predicate on `c` — the footer-stats fact
      def rowsTouched(dir: String, shard: String, c: String, lo: Long, hi: Long): Double = {
        val per = liveFiles(dir, shard).map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col(c)), max(col(c)), count(lit(1))).head
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        val touched = per.filter { case (mn, mx, _) => mn <= hi && mx >= lo }
        touched.map(_._3).sum.toDouble / per.map(_._3).sum
      }
      def snapshot(dir: String): Set[(String, String, Long, Long)] =
        ManifestStore.currentFrame(spark, dir, "k").get
          .select($"k", $"id", $"x", $"y").as[(String, String, Long, Long)]
          .collect().toSet

      // range re-clustering on x
      val rDir = tmpDir("ms_rcompact")
      storm(rDir)
      val before = snapshot(rDir)
      assert(ManifestStore.compact(spark, rDir, "k", maxGens = 1, clusterBy = Seq("x")) == 2)
      assert(snapshot(rDir) == before, "re-clustering compact changed content")
      for (shard <- Seq("s0", "s1")) {
        assert(liveFiles(rDir, shard).size >= 3,
          s"$shard: too few files to demonstrate skipping")
        val frac = rowsTouched(rDir, shard, "x", 4000, 4320)
        assert(frac <= 0.45, s"$shard: x-slice touched ${frac * 100}%% of rows after compact")
      }

      // z-order re-clustering on (x, y): both axes must prune
      val zDir = tmpDir("ms_zcompact")
      storm(zDir)
      val zBefore = snapshot(zDir)
      assert(ManifestStore.compact(spark, zDir, "k", maxGens = 1, clusterBy = Seq("x", "y")) == 2)
      assert(snapshot(zDir) == zBefore, "z-order compact changed content")
      for (shard <- Seq("s0", "s1")) {
        val fx = rowsTouched(zDir, shard, "x", 4000, 4320)
        val fy = rowsTouched(zDir, shard, "y", 4000, 4320)
        assert(fx <= 0.65 && fy <= 0.65,
          s"$shard: z-order compact prunes neither axis (x $fx, y $fy)")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prior)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", priorCoalesce)
    }
  }

  test("autoSaltFactor: the sketch decision plans without a key exchange") {
    // the POINT of the sketch path: deciding whether to shuffle must not
    // itself shuffle the key column — the aggregation combines map-side
    // and ships constant-size buffers (count/HLL/MG/CMS), never key rows.
    // Pin the shape: the decision plan's exchange is a single-partition
    // gather of partial buffers, not a hashpartitioning on the key.
    graft.GraftExtensions.register(spark)
    val df = (1 to 2000).map(i => (s"u${i % 100}", i.toLong)).toDF("k", "v")
    val ks = col("k").cast("string")
    val plan = df.agg(
      count(ks).as("n"),
      approx_count_distinct(ks).as("nd"),
      call_function("freq_items", ks, lit(16)).as("hh"),
      call_function("cms_sketch", ks, lit(8), lit(8192)).as("sk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(k"),
      s"salting decision shuffles the key column:\n$plan")
    assert(plan.contains("partial"), s"no map-side partial aggregation:\n$plan")
  }

  test("joinAdvisor: broadcast_left branch, empty-side safety, est never undercounts") {
    import spark.implicits._
    val small = (1 to 5).map(i => i.toLong).toDF("k")
    val big = (1 to 500).flatMap(i => Seq.fill(3)(i.toLong)).toDF("k")
    // right exceeds the cutoff, left fits -> broadcast_left
    val r = Scale.joinAdvisor(small, "k", big, "k", broadcastRows = 100).collect()(0)
    assert(r.getAs[String]("recommendation") == "broadcast_left", r.toString)
    assert(r.getAs[Int]("salt_factor") == 1)
    // CMS inner product is one-sided: never below the exact join size
    val exact = 5L * 3L
    assert(r.getAs[Long]("est_join_rows") >= exact)
    // an empty side recommends a (trivial) broadcast and never divides by 0
    val empty = Seq.empty[Long].toDF("k")
    val e = Scale.joinAdvisor(big, "k", empty, "k", broadcastRows = 100).collect()(0)
    assert(e.getAs[Long]("n_right") == 0L &&
      e.getAs[String]("recommendation") == "broadcast_right")
  }

  test("scd2Merge: close+reversion, no-op suppression, inserts, null-safe attrs, idempotence") {
    def hist(rows: (Long, String, String, String)*) =
      rows.toSeq.toDF("k", "seg", "valid_from", "valid_to")
    val current = hist(
      (1L, "A", "2023-01-01", "2024-01-01"),  // pre-closed: must never move
      (1L, "B", "2024-01-01", null),          // live, will change
      (2L, "C", "2024-01-01", null),          // live, no-op update
      (3L, null, "2024-01-01", null),         // live with NULL attr
      (4L, "D", "2024-01-01", null))          // live, no update at all
    val updates = Seq(
      (1L, "B2"), (2L, "C"), (3L, (null: String)), (5L, "E")).toDF("k", "seg")
    val out = Scale.scd2Merge(current, updates, Seq("k"), "2024-06-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, "A", "2023-01-01", "2024-01-01"),   // dead untouched
      (1L, "B", "2024-01-01", "2024-06-01"),   // closed
      (1L, "B2", "2024-06-01", null),          // new version
      (2L, "C", "2024-01-01", null),           // no-op suppressed: SAME row
      (3L, null, "2024-01-01", null),          // null <=> null: no-op
      (4L, "D", "2024-01-01", null),           // unmentioned key kept
      (5L, "E", "2024-06-01", null)), out.toString) // brand-new key
    // idempotence: re-applying the same updates at a later ts changes nothing
    val again = Scale.scd2Merge(
        hist(out.toSeq.map(t => (t._1, t._2, t._3, t._4)): _*),
        updates, Seq("k"), "2024-12-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(again == out, "second merge of identical updates must be a no-op")
    // a null attr changing TO a value is a real change (null-safe compare)
    val flip = Scale.scd2Merge(current, Seq((3L, "NOW")).toDF("k", "seg"), Seq("k"), "2024-06-01")
      .where(col("k") === 3L)
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    assert(flip == Set((null, "2024-06-01"), ("NOW", null)), flip.toString)
    // duplicate update keys fail loud — the guard lives INSIDE the merge
    // plan (raise_error over a window count: one job, no extra eager
    // pass), so it fires when the merge executes
    val ex = intercept[Exception] {
      Scale.scd2Merge(current,
        Seq((1L, "X"), (1L, "Y")).toDF("k", "seg"), Seq("k"), "2024-06-01")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("duplicate keys")), ex.toString)
    // a live row whose key is NULL can never equi-join an update — the
    // presence flags (not key-null checks) must carry it through untouched
    val nullKey = Seq[(java.lang.Long, String, String, String)](
      (null, "NK", "2024-01-01", null), (6L, "F", "2024-01-01", null))
      .toDF("k", "seg", "valid_from", "valid_to")
    val nkOut = Scale.scd2Merge(
        nullKey, Seq((6L, "F2")).toDF("k", "seg"), Seq("k"), "2024-06-01")
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getLong(0): java.lang.Long,
          r.getString(1), r.getString(3))).toSet
    assert(nkOut == Set(
      (null: java.lang.Long, "NK", null),
      (6L: java.lang.Long, "F", "2024-06-01"),
      (6L: java.lang.Long, "F2", null)), nkOut.toString)
  }
}
