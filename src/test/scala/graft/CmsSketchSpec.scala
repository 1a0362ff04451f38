package graft

import org.apache.spark.sql.functions._

import graft.expressions.{CmsSketch, MinhashSigs}
import graft.ops.Profile

/**
 * Count-Min sketch laws ([[graft.expressions.CmsSketch]]):
 *  - the counter matrix equals a sequential reference computation of the
 *    same multiset (bit-for-bit — the merge is elementwise addition, so
 *    the distributed result is a pure function of the input multiset);
 *  - partition layout cannot perturb it (1 vs 7 partitions, identical);
 *  - estimates never undercount, and on a high-collision configuration
 *    (w far below distinct keys) the mean overcount obeys the expected
 *    N/w collision mass per row.
 */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: same hash family, same bucket math. */
  private def reference(items: Seq[String], d: Int, w: Int): Array[Array[Long]] = {
    val m = Array.fill(d, w)(0L)
    items.foreach { s =>
      val h = MinhashSigs.hash32(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until d).foreach(i => m(i)(CmsSketch.bucket(h, i, w)) += 1L)
    }
    m
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame, c: String, d: Int, w: Int) = {
    GraftExtensions.register(spark)
    df.agg(call_function("cms_sketch", col(c), lit(d), lit(w)).as("sk"))
      .collect()(0).getSeq[scala.collection.Seq[Long]](0)
      .map(_.toArray).toArray
  }

  test("sketch content equals the sequential reference and is partition-invariant") {
    val items = (0 until 3000).map(i => s"key_${i % 97}") ++
      (0 until 500).map(i => s"rare_$i")
    val df = items.toDF("k")
    val ref = reference(items, d = 4, w = 64)
    val s1 = sketchOf(df.repartition(1), "k", 4, 64)
    val s7 = sketchOf(df.repartition(7), "k", 4, 64)
    assert(s1.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq, "sketch diverged from reference")
    assert(s7.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq, "sketch is partition-dependent")
    // null inputs are skipped, not counted
    val withNulls = df.unionByName(Seq.fill(50)(null: String).toDF("k"))
    assert(sketchOf(withNulls, "k", 4, 64).map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq,
      "nulls leaked into the counters")
  }

  test("estimates never undercount; collision overcount stays near N/w per row") {
    // adversarial width: 2000 distinct keys into w=32 buckets — every
    // bucket collides heavily, the regime where the min-over-rows earns
    // its keep
    val n = 6000
    val items = (0 until n).map(i => s"u${i % 2000}")
    val df = items.toDF("k")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keys = truth.keys.toSeq.toDF("k")
    val est = Profile.cmsEstimates(df, "k", keys, d = 4, w = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS undercounted $k: ${est(k)} < $t")
    }
    val meanOver = truth.map { case (k, t) => (est(k) - t).toDouble }.sum / truth.size
    // each row's expected collision mass is ~(N - true)/w ≈ 187; min over
    // 4 rows sits well under one row's mean — allow 2× headroom, this is
    // deterministic data so the assertion is stable
    assert(meanOver <= 2.0 * n / 32,
      s"mean overcount $meanOver exceeds 2N/w=${2.0 * n / 32}")
    info(f"mean overcount $meanOver%.1f vs single-row expectation ${n / 32.0}%.1f")
  }

  test("sharded sketches merge to exactly the whole-corpus sketch (no rescan)") {
    GraftExtensions.register(spark)
    val shards = Seq(
      (0 until 500).map(i => s"a${i % 13}"),
      (0 until 300).map(i => s"b${i % 7}"),
      (0 until 200).map(_ => "hot"))
    // per-shard sketch tables (what continuous ingest would persist)...
    val perShard = shards.map(items =>
      items.toDF("k").agg(call_function("cms_sketch", col("k"), lit(3), lit(32)).as("sk")))
      .reduce(_.unionByName(_))
    // ...folded WITHOUT touching any shard's rows again
    val merged = Profile.cmsMergeAll(perShard, "sk")
      .collect()(0).getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq
    // CMS merge is addition: merged == the sketch of the concatenated corpus
    assert(merged == reference(shards.flatten, 3, 32).map(_.toSeq).toSeq,
      "merged shard sketches diverged from the whole-corpus sketch")
  }

  test("per-group sketches: one independent matrix per group key") {
    GraftExtensions.register(spark)
    val df = ((1 to 30).map(i => ("g1", s"v${i % 3}")) ++
      (1 to 20).map(_ => ("g2", "only"))).toDF("g", "k").repartition(6)
    val got = df.groupBy("g")
      .agg(call_function("cms_sketch", col("k"), lit(2), lit(16)).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).map(_.toArray).toArray).toMap
    val refG1 = reference((1 to 30).map(i => s"v${i % 3}"), 2, 16)
    val refG2 = reference(Seq.fill(20)("only"), 2, 16)
    assert(got("g1").map(_.toSeq).toSeq == refG1.map(_.toSeq).toSeq)
    assert(got("g2").map(_.toSeq).toSeq == refG2.map(_.toSeq).toSeq)
  }

  test("HLL shard ledger: merged shard sketches == whole-corpus sketch; estimate near exact") {
    val shards: Seq[Seq[String]] = Seq(
      (0 until 4000).map(i => s"u${i % 900}"),
      (0 until 3000).map(i => s"u${300 + i % 900}"),
      (0 until 1000).map(i => s"v$i"))
    val sketches = shards.map(sh => Profile.hllShardSketch(sh.toDF("k"), "k"))
      .reduce(_ unionByName _)
      .localCheckpoint()
    val merged = Profile.hllMergedEstimate(sketches, "hll")
      .collect()(0).getLong(0)
    // union-then-estimate == sketch-of-union (lossless incremental merge)
    val whole = Profile.hllMergedEstimate(
      Profile.hllShardSketch(shards.flatten.toDF("k"), "k"), "hll")
      .collect()(0).getLong(0)
    assert(merged == whole, s"shard-merged $merged != whole-corpus $whole")
    val exact = shards.flatten.distinct.size.toDouble
    assert(math.abs(merged - exact) / exact < 0.05,
      s"estimate $merged vs exact $exact exceeds 5%")
    // null keys never enter the sketch
    val withNull = Profile.hllMergedEstimate(
      Profile.hllShardSketch(
        (shards.flatten :+ (null: String)).toDF("k"), "k"), "hll")
      .collect()(0).getLong(0)
    assert(withNull == whole)
  }

  test("cmsJoinSize: one-sided error — never below the exact join size, exact when collision-free") {
    val lKeys = (0 until 400).map(i => s"k${i % 11}")
    val rKeys = (0 until 150).map(i => s"k${i % 7}")
    val l = lKeys.toDF("lk")
    val r = rKeys.toDF("rk")
    val lm = lKeys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rm = rKeys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = lm.map { case (k, c) => c * rm.getOrElse(k, 0L) }.sum
    assert(Profile.joinSizeExact(l, "lk", r, "rk").collect()(0).getLong(0) == truth)
    // narrow sketch: collisions inflate but NEVER deflate
    val estNarrow = Profile.cmsJoinSize(l, "lk", r, "rk", d = 4, w = 4)
      .collect()(0).getLong(0)
    assert(estNarrow >= truth, s"inner-product estimate undercut: $estNarrow < $truth")
    // wide sketch over 11 distinct keys: this fixed hash family maps them
    // collision-free at w=4096 (deterministic — md5-affine, fixed keys),
    // so the estimate IS the exact join size
    val estWide = Profile.cmsJoinSize(l, "lk", r, "rk", d = 4, w = 4096)
      .collect()(0).getLong(0)
    assert(estWide == truth, s"collision-free estimate off: $estWide != $truth")
    // disjoint key domains: estimate can only carry collision mass; with a
    // wide sketch it is zero
    val disjoint = Seq("x1", "x2", "x3").toDF("rk")
    assert(Profile.cmsJoinSize(l, "lk", disjoint, "rk", d = 4, w = 4096)
      .collect()(0).getLong(0) == 0L)
    assert(Profile.joinSizeExact(l, "lk", disjoint, "rk").collect()(0).getLong(0) == 0L)
    // nulls never contribute to either side
    val withNulls = (lKeys :+ (null: String)).toDF("lk")
    assert(Profile.cmsJoinSize(withNulls, "lk", r, "rk", d = 4, w = 4096)
      .collect()(0).getLong(0) == truth)
  }

  test("streaming: the sketch aggregates incrementally across micro-batches") {
    GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = ms.toDS().toDF("k")
      .agg(call_function("cms_sketch", col("k"), lit(2), lit(16)).as("sk"))
      .writeStream.format("memory").queryName("cms_stream").outputMode("complete").start()
    def current(): Seq[Seq[Long]] =
      spark.table("cms_stream").collect()(0)
        .getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq
    try {
      ms.addData("a", "b", "a")
      q.processAllAvailable()
      assert(current() == reference(Seq("a", "b", "a"), 2, 16).map(_.toSeq).toSeq)
      ms.addData("b", "c", "b")
      q.processAllAvailable()
      // cumulative: batch-2 counts add into the running counter state
      assert(current() ==
        reference(Seq("a", "b", "a", "b", "c", "b"), 2, 16).map(_.toSeq).toSeq)
    } finally q.stop()
  }
}
