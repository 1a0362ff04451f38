package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * 100× scale stress — one decade past [[BenchScale]]: the round-10 verdict
 * flagged the four worst 10× ratios (minhash 3.26, phash 3.01,
 * clusters_star 2.51, exact_substring 2.54) as "sub-quadratic so far" and
 * asked for the next decade before extrapolating to cluster scale. This
 * main synthesizes a 100-copy decorrelated corpus (same marker-v3
 * construction — per-copy token suffixes, rotated embeddings, shifted
 * keys — so true duplicate structure stays CONSTANT while data grows
 * 100×) and times those four queries at sf0.1 and at 100×, plus the
 * minhash generation/verification split (the round-9 adjudication
 * discipline: verification is ∝ candidates, structural on the planted
 * corpus — the split keeps that claim measured, not assumed).
 *
 * Writes `BENCH_SCALE100X.json`. Correctness at this scale is checked
 * separately by running `Verify` + `tools/check.py` against the synth dir
 * (the flagship and span-dedup oracles — see ROUND11_NOTES).
 *
 * Interpretation note: at sf0.1 a 32-thread JVM is mostly idle, so
 * wall-clock ratios under ~10×/decade mean the operator's WORK grows
 * sub-linearly per row or the cores absorb it; the number that matters is
 * ratio100 / ratio10 staying bounded (no super-linear blowup emerging one
 * decade out).
 */
object BenchScale100 {

  private val stressQueries = Seq(
    "q_dedup_minhash_lsh", "q_mm_phash",
    "q_dedup_clusters_star", "q_dedup_exact_substring",
    // the auto router is what users call — its ratio rides along so the
    // star fallback's number is never read in isolation
    "q_dedup_clusters_auto",
    // round-11 closing ops two decades out: classifier train+serve, the
    // brute hard-negative miner + its triplet capstone, and the two
    // single-exchange controls (epoch generator, fingerprint-count audit)
    "q_text_nb_classify", "q_sim_hard_negatives", "q_pipeline_triplets",
    "q_corpus_epoch_sample", "q_corpus_split_leakage",
    // round-14 operators two decades out (10× covered them in round 14):
    // the registry decontamination gate, the language-id and url-canon
    // kernel controls, and the capped simhash occupancy audit
    "q_contamination_decon", "q_text_langid_ngram", "q_text_url_canon",
    "q_dedup_simhash64_occupancy",
    // round-15: the composed crawl-ingest capstone
    "q_pipeline_crawl",
    // round-15 kernels two decades out (r15 verdict queue item): the
    // video-container metadata walk, the byte-decode ladder, the scored
    // langid twin
    "q_mm_video_meta", "q_text_from_bytes", "q_text_langid_margin",
    // round-16: WARC shard parse, deflate-ratio + image-metadata kernel
    // controls, and the bytes-fed capstone twin
    "q_src_warc", "q_text_deflate", "q_mm_image_meta",
    "q_pipeline_crawl_bytes",
    // round-17: block-structured HTML extraction, the PDF text tier,
    // and the ladder-rung attribution aggregate
    "q_text_html_blocks", "q_src_pdf", "q_text_rungs",
    "q_mm_decode_vp8l", "q_src_media",
    // round-18: the CID/ToUnicode PDF arms and json/rss routes ride
    // q_src_pdf/q_src_media above; new surface is the crawl-fed BM25F
    // (title/body kernels + the weighted-field postings build)
    "q_ret_bm25f_crawl")

  private def releaseResidue(spark: SparkSession, keep: Set[Int]): Unit =
    spark.sparkContext.getPersistentRDDs.foreach {
      case (id, rdd) if !keep.contains(id) => rdd.unpersist(blocking = true)
      case _ => ()
    }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val selected =
      if (args.isEmpty) stressQueries
      else stressQueries.filter(n => args.exists(n.startsWith))
    val fullRun = args.isEmpty
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE100_DIR", s"${sys.props("java.io.tmpdir")}/graft_sf100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 100× corpus: AQE starts reduce stages wide (bounded per-task spill)
      // and coalesces small ones — the BenchScale rationale, one decade on
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    BenchScale.synth(spark, src, dst, copies = 100)

    // plan-shape warm at sf0.001 (codegen/JIT/datasource one-time costs)
    val warm = "/root/testdata/sf0.001"
    val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    for (name <- selected) {
      try SparkEntry.queries(name)(spark, warm)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally releaseResidue(spark, keep)
    }
    // warm once at BOTH measured scales: store-backed queries must not
    // bill their one-time /tmp store build to a measured line (the
    // BenchScale round-15 lesson — a cold corpus turned phash_indexed's
    // 1.45x serving ratio into 49x of build time); the explicit
    // cold/rerun economics for the indexed family stay measured below
    for (dir <- Seq(src, dst); name <- selected) {
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally releaseResidue(spark, keep)
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val perQuery = selected.map { name =>
      val fn = SparkEntry.queries(name)
      val t1 = time(fn(spark, src).write.format("noop").mode("overwrite").save())
      releaseResidue(spark, keep)
      val t100 = time(fn(spark, dst).write.format("noop").mode("overwrite").save())
      releaseResidue(spark, keep)
      println(s"[scale100x] $name sf0.1=${num(t1)}s sf10=${num(t100)}s ratio=${num(t100 / t1)}")
      s""""$name":{"sf01":${num(t1)},"sf10":${num(t100)},"ratio100":${num(t100 / t1)}}"""
    }

    if (!fullRun) { spark.stop(); return }

    // Indexed RERUN economics (round-12 verdict items 1-2): the build-once
    // stores measured as a deployment reruns them — first call pays the
    // one-time ingest (decode / sign+band: "cold"), the second serves from
    // the committed artifacts ("rerun"). The number that kills the 58×
    // phash outlier is rerun_ratio100 — the warm rerun's growth across two
    // decades, which should sit in sketch territory because serve-time
    // work is fingerprint-column-sized, never payload/token-sized.
    // NOTE (r15): the both-scales warm pass above already built these
    // stores, so "cold" here is cold only on a fresh /tmp — the line that
    // matters, rerun_ratio100, is unaffected either way.
    val indexed = Seq("q_mm_phash_indexed", "q_dedup_minhash_inc").map { name =>
      val fn = SparkEntry.queries(name)
      def run(dir: String): Double = {
        val t = time(fn(spark, dir).write.format("noop").mode("overwrite").save())
        releaseResidue(spark, keep)
        t
      }
      val cold1 = run(src)
      val rerun1 = run(src)
      val cold100 = run(dst)
      val rerun100 = run(dst)
      println(s"[scale100x] $name cold=${num(cold1)}/${num(cold100)}s " +
        s"rerun=${num(rerun1)}/${num(rerun100)}s rerunRatio=${num(rerun100 / rerun1)}")
      s""""$name":{"cold_sf01":${num(cold1)},"rerun_sf01":${num(rerun1)},""" +
        s""""cold_sf10":${num(cold100)},"rerun_sf10":${num(rerun100)},""" +
        s""""rerun_ratio100":${num(rerun100 / rerun1)}}"""
    }

    // the store's OWN rerun economics, isolated from Jaccard verification
    // (which is ∝ candidate mass — structural on the planted corpus and
    // identical for indexed and one-shot paths): candidate generation
    // from stored band rows, the stage the index exists to make cheap
    val candIndexed = {
      def run(dir: String): Double = {
        val mhDir = graft.queries.LlmQueries.minhashIndexDirFor(spark, dir)
        val t = time(graft.ops.MinhashIndex
          .candidatePairsIndexed(spark, mhDir, maxOccupancy = 64)
          .write.format("noop").mode("overwrite").save())
        releaseResidue(spark, keep)
        t
      }
      run(src); run(dst) // warm both memos
      val c1 = run(src)
      val c100 = run(dst)
      println(s"[scale100x] minhash_cand_indexed rerun=${num(c1)}/${num(c100)}s " +
        s"ratio=${num(c100 / c1)}")
      s""""minhash_cand_indexed":{"rerun_sf01":${num(c1)},"rerun_sf10":${num(c100)},""" +
        s""""rerun_ratio100":${num(c100 / c1)}}"""
    }

    // minhash adjudication split at 100×: generation (posting-list shuffle)
    // vs verification (∝ candidates — every doc is planted into a pair on
    // this corpus, so candidate mass is structurally ~linear in corpus)
    def minhashSplit(dir: String): String = {
      val docs = Quality.docsWithNearDups(spark, dir)
      val bands = graft.ops.Dedup.lshBands(
        graft.ops.Dedup.minhashSignaturesNative(docs, "doc_id", "text", 16, 3), 16, 8)
      var cand: DataFrame = null
      val tGen = time {
        cand = graft.ops.Dedup.candidatePairs(bands, maxOccupancy = 64).localCheckpoint()
      }
      val nCand = cand.count()
      val tVer = time {
        graft.ops.Dedup.verifyJaccard(cand, docs, "doc_id", "text", 3, minJaccard = 0.35)
          .where(col("jaccard") >= 0.35)
          .write.format("noop").mode("overwrite").save()
      }
      releaseResidue(spark, keep)
      s"""{"gen_sec":${num(tGen)},"verify_sec":${num(tVer)},"candidates":$nCand}"""
    }
    val split100 = minhashSplit(dst)

    val json =
      s"""{"copies":100,"src":"$src","synth":"$dst",""" +
        s""""queries":{${perQuery.mkString(",")}},""" +
        s""""indexed_reruns":{${indexed.mkString(",")},$candIndexed},""" +
        s""""minhash_split_sf10":$split100}"""
    println(json)
    Files.writeString(Paths.get("BENCH_SCALE100X.json"), json + "\n")
    spark.stop()
  }
}
