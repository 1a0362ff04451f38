package graft

import org.apache.spark.sql.functions._

import graft.expressions.{CmsSketch, MinhashSigs}
import graft.ops.{Profile, SketchLedger}

/**
 * Persisted sketch ledger ([[graft.ops.SketchLedger]]): per-batch sketch
 * frames appended under the versioned-commit protocol fold to exactly the
 * whole-corpus sketch; crash debris stays invisible; compaction + vacuum
 * preserve the fold while collapsing generations.
 */
class SketchLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def reference(items: Seq[String], d: Int, w: Int): Seq[Seq[Long]] = {
    val m = Array.fill(d, w)(0L)
    items.foreach { s =>
      val h = MinhashSigs.hash32(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until d).foreach(i => m(i)(CmsSketch.bucket(h, i, w)) += 1L)
    }
    m.map(_.toSeq).toSeq
  }

  private def cmsRow(items: Seq[String]) = {
    GraftExtensions.register(spark)
    items.toDF("k").agg(call_function("cms_sketch", col("k"), lit(3), lit(32)).as("sk"))
  }

  private def folded(dir: String): Seq[Seq[Long]] =
    Profile.cmsMergeAll(SketchLedger.read(spark, dir).get, "sk")
      .collect()(0).getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq

  test("appended CMS batches fold to the whole-corpus sketch; debris invisible; compact+vacuum") {
    val dir = tmpDir("sketch_ledger")
    val batches = Seq(
      (0 until 400).map(i => s"a${i % 13}"),
      (0 until 250).map(i => s"b${i % 7}"),
      (0 until 150).map(_ => "hot"))
    assert(SketchLedger.read(spark, dir).isEmpty && SketchLedger.status(spark, dir).isEmpty)
    batches.foreach(b => SketchLedger.append(cmsRow(b), dir))
    assert(SketchLedger.status(spark, dir).contains((3L, 3)))
    val whole = reference(batches.flatten, 3, 32)
    assert(folded(dir) == whole, "ledger fold diverged from the whole-corpus sketch")

    // crash debris: a generation written WITHOUT a commit never surfaces
    cmsRow(Seq.fill(99)("garbage")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/gen=9-deadbeef")
    assert(folded(dir) == whole, "uncommitted generation leaked into the fold")

    // version derives from the READ manifest, never on-disk gen numbers: a
    // high-numbered debris dir must not let an appender bump PAST a
    // concurrent winner's version (it would commit a manifest omitting the
    // winner's frame) — the next append is exactly prior+1 = 4
    val v4 = SketchLedger.append(cmsRow(Seq("tail")), dir)
    assert(v4 == 4L, s"append must commit at prior+1, got $v4")
    val whole2 = reference(batches.flatten :+ "tail", 3, 32)
    assert(folded(dir) == whole2)

    // compact to one generation (the caller's fold re-appended), vacuum
    // reclaims victims AND the debris; the fold is unchanged throughout
    SketchLedger.compact(Profile.cmsMergeAll(SketchLedger.read(spark, dir).get, "sk"), dir)
    assert(SketchLedger.status(spark, dir).map(_._2).contains(1))
    assert(SketchLedger.vacuum(spark, dir) >= 5) // 4 victims + 1 debris dir
    assert(folded(dir) == whole2)

    // the ledger is schema-agnostic: HLL binaries ride the same store
    val hdir = tmpDir("hll_ledger")
    batches.foreach(b => SketchLedger.append(Profile.hllShardSketch(b.toDF("k"), "k"), hdir))
    val est = Profile.hllMergedEstimate(SketchLedger.read(spark, hdir).get, "hll")
      .collect()(0).getLong(0)
    val exact = batches.flatten.distinct.size.toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est $est vs exact $exact")
  }

  test("numeric drift scores from a DD-histogram ledger fold — no corpus rescan") {
    // a reference corpus ingested as three batches, each appending ONLY its
    // DD histogram to the ledger; a later batch is scored against the
    // folded reference without any access to the reference rows — and the
    // score equals Profile.driftNumeric over the raw frames (one bucket
    // math, one drift arithmetic, whatever the storage path)
    val dir = tmpDir("dd_ledger")
    val refBatches = Seq(
      (1 to 40).map(i => 8.0 + (i % 5)),
      (1 to 30).map(i => 9.0 + (i % 3)),
      (1 to 30).map(i => 7.5 + (i % 4)))
    refBatches.foreach { b =>
      SketchLedger.append(Profile.ddHistogram(b.toDF("v"), "v", 0.05), dir)
    }
    val cur = (1 to 50).map(i => 700.0 + (i % 5) * 50).toDF("v")
    val refFold = SketchLedger.read(spark, dir).get
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val viaLedger = Profile.driftNumericFromHistograms(
        refFold.select(col("bucket").as("key"), col("cnt").as("ref_cnt")),
        Profile.ddHistogram(cur, "v", 0.05)
          .select(col("bucket").as("key"), col("cnt").as("cur_cnt")),
        alpha = 0.05)
      .agg(sum("psi")).collect()(0).getDouble(0)
    val direct = Profile.driftNumeric(
        refBatches.flatten.toDF("v"), cur, "v", alpha = 0.05)
      .collect()(0).getAs[Double]("psi")
    assert(viaLedger == direct,
      s"ledger-fold drift $viaLedger != direct $direct")
    assert(viaLedger > 0.25, "magnitude shift must score as drifted")
  }

  test("moment ledger: per-batch frame fold == whole-corpus moments; PCA retrains from the fold") {
    import graft.ops.Similarity
    val dims = 5
    def batch(ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(dims)(d => (math.sin(i * 0.7 + d) * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val batches = Seq(batch(0 until 30), batch(30 until 75), batch(75 until 120))
    val dir = tmpDir("moment_ledger")
    batches.foreach(b => SketchLedger.append(Similarity.momentFrame(b, dims), dir))
    val fold = Similarity.momentFold(SketchLedger.read(spark, dir).get)
    val whole = Similarity.momentMatrix(batches.reduce(_ unionByName _), dims)
    assert(fold.toSeq == whole.toSeq,
      "folded batch moments diverge from the whole-corpus pass")
    // the retrained model is the whole-corpus model, bit for bit
    val viaLedger = Similarity.pcaTrainFromMoments(fold, dims, k = 3)
    val direct = Similarity.pcaTrain(batches.reduce(_ unionByName _), dims, k = 3)
    assert(viaLedger.basis.flatten.toSeq == direct.basis.flatten.toSeq &&
      viaLedger.eigenvalues.toSeq == direct.eigenvalues.toSeq &&
      viaLedger.mean.toSeq == direct.mean.toSeq)
    // mixed-scale frames fail loud
    SketchLedger.append(Similarity.momentFrame(batches.head, dims, scale = 500L), dir)
    intercept[IllegalArgumentException] {
      Similarity.momentFold(SketchLedger.read(spark, dir).get)
    }
  }

  test("NB ledger: per-batch model frames fold to the whole-corpus classifier bit-for-bit") {
    import graft.ops.TextOps
    def batch(rows: (String, String)*) = rows.toSeq.toDF("label", "text")
    val batches = Seq(
      batch(("A", "x x y"), ("B", "z w")),
      batch(("A", "x"), ("C", "v v v")),
      batch(("B", "z z y")))
    val dir = tmpDir("nb_ledger")
    batches.foreach(b => SketchLedger.append(TextOps.nbFrame(b, "label", "text"), dir))
    val folded = TextOps.nbFromFrames(SketchLedger.read(spark, dir).get)
    val whole = TextOps.nbTrain(batches.reduce(_ unionByName _), "label", "text")
    def countSet(m: TextOps.NbModel) =
      m.counts.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def statSet(m: TextOps.NbModel) =
      m.labelStats.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(countSet(folded) == countSet(whole), "folded counts diverge")
    assert(statSet(folded) == statSet(whole), "folded label stats diverge")
    // and the served predictions agree exactly
    val test = Seq((1L, "x y"), (2L, "z"), (3L, "v")).toDF("id", "text")
    def preds(m: TextOps.NbModel) =
      TextOps.nbPredict(test, "id", "text", m).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(preds(folded) == preds(whole))
    // mixed bucket shapes fail loud
    SketchLedger.append(TextOps.nbFrame(batches.head, "label", "text", numBuckets = 64), dir)
    intercept[IllegalArgumentException] {
      TextOps.nbFromFrames(SketchLedger.read(spark, dir).get)
    }
  }
}
