package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, TextOps}

/** DSIR importance weighting, CCNet perplexity bucketing, and token-budget
  * sampling: hand-computed values, ordering laws, and scale-shape plan pins. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dsirLogWeights: target-like documents outweigh off-target ones, exact values") {
    // "good" and "bad" land in distinct hash buckets (194 vs 152 of 256)
    val raw = Seq((1L, "good"), (2L, "bad")).toDF("doc_id", "text")
    val target = raw.where($"doc_id" === 1L)
    val out = Corpus.dsirLogWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    // target: ct(good)=1, tt=1; raw: cr(good)=cr(bad)=1, tr=2; B=256
    val w1 = math.log(2.0 / 257) - math.log(2.0 / 258)
    val w2 = math.log(1.0 / 257) - math.log(2.0 / 258)
    assert(math.abs(out(0).getDouble(2) - w1) < 1e-4)
    assert(math.abs(out(1).getDouble(2) - w2) < 1e-4)
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("dsirLogWeights: at equal length, more target-like → higher; dsirSelect top-m") {
    // equal-length docs isolate the per-token ratio (with a tiny target
    // corpus the smoothing term penalizes LONGER docs of any content, so
    // cross-length comparisons are not a law — see the ct+1 / tt+B form)
    val raw = Seq(
      (1L, "good good"), (2L, "good bad"), (3L, "bad bad")).toDF("doc_id", "text")
    val target = Seq((9L, "good good")).toDF("doc_id", "text")
    val w = Corpus.dsirLogWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L) && w(2L) > w(3L))
    val sel = Corpus.dsirSelect(raw, target, "doc_id", "text", m = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 2L))
  }

  test("perplexityBuckets: tertile labels partition the corpus, ordered by ppl") {
    // doc i = token w_i repeated i times → ppl_i = (T+V+1)/(i+1), all
    // distinct, so the tertiles are exactly 10/10/10
    val docs = (1L to 30L)
      .map(i => (i, (("w" + i + " ") * i.toInt).trim))
      .toDF("doc_id", "text")
    val out = TextOps.perplexityBuckets(docs, "doc_id", "text").collect()
    assert(out.length == 30)
    val byBucket = out.groupBy(_.getString(3)).map { case (k, v) =>
      k -> v.map(_.getDouble(2))
    }
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // every head ppl <= every middle ppl <= every tail ppl
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    assert(byBucket.values.forall(_.length == 10))
  }

  test("sampleToTokenBudget: budget respected, selection is the hash-order prefix") {
    val docs = (1L to 50L).map(i => (i, i.toString, 1 + (i % 7))).toDF("doc_id", "text", "n")
    val budget = 60L
    val sel = Corpus.sampleToTokenBudget(docs, "doc_id", col("n"), budget)
      .collect().map(_.getLong(0)).toSet
    // reference: same salted hash, same (bucket, hash, id) global order
    val ordered = docs.select(
        col("doc_id"), col("n"),
        TextOps.hash32(concat(lit("budget::"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(2) % 64, r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2, t._3))
    var cum = 0L
    val expect = scala.collection.mutable.Set[Long]()
    ordered.foreach { case (_, _, id, n) =>
      cum += n
      if (cum <= budget) expect += id
    }
    assert(sel == expect.toSet)
    assert(sel.nonEmpty && sel.size < 50)
  }

  test("sampleToTokenBudget: monotone in budget (smaller budget ⊆ larger)") {
    val docs = (1L to 40L).map(i => (i, 2L + i % 5)).toDF("doc_id", "n")
    val small = Corpus.sampleToTokenBudget(docs, "doc_id", col("n"), 30L)
      .collect().map(_.getLong(0)).toSet
    val large = Corpus.sampleToTokenBudget(docs, "doc_id", col("n"), 90L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && small.size < large.size)
  }

  test("diverseSample: min(cellSize, perCell) per cell, deterministic draw") {
    GraftExtensions.register(spark)
    val e = graft.queries.Tpch.read(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = graft.ops.Similarity.trainCentroids(e, 4, 2)
    val assigned = graft.ops.Similarity.ivfAssign(e, cents)
      .groupBy("cell").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val sample = graft.ops.Similarity.diverseSample(e, cents, perCell = 5)
    val perCell = sample.groupBy("cell").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(perCell.keySet == assigned.keySet)
    perCell.foreach { case (cell, n) =>
      assert(n == math.min(assigned(cell), 5L), s"cell $cell: $n")
    }
    val again = graft.ops.Similarity.diverseSample(e, cents, perCell = 5)
    assert(sample.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }

  test("plan shape: token-budget sampling never range-partitions the corpus") {
    val docs = (1L to 40L).map(i => (i, 2L)).toDF("doc_id", "n")
    val p = Corpus.sampleToTokenBudget(docs, "doc_id", col("n"), 30L)
      .queryExecution.executedPlan.toString
    // a global ORDER BY would show up as a range-partitioning exchange over
    // the corpus; the decomposed plan only hash-partitions (bucket windows)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("training-export sharding: every doc exactly once, deterministic, one file per shard, no global sort") {
    import graft.ops.Corpus
    val docs = (1L to 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Corpus.withTrainingShard(docs, "doc_id", nShards = 8, salt = "s")
    val rows = a.select("doc_id", "shard", "ord").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.map(_._1).distinct.length == 500, "a doc was dropped or duplicated")
    assert(rows.map(_._2).distinct.sorted.toSeq == (0 to 7), "shards not fully used")
    // ords are contiguous 1..|shard| within each shard
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"shard $s ord gap")
    }
    // pure function of (ids, salt): a rerun reproduces the layout exactly
    val b = Corpus.withTrainingShard(docs, "doc_id", nShards = 8, salt = "s")
      .select("doc_id", "shard", "ord").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSet == b.toSet, "sharding is not deterministic")
    // the export decorrelates ingest order: within a shard, consecutive
    // ord must not be consecutive doc_ids everywhere (a sorted passthrough)
    val shard0 = rows.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.sliding(2).exists(p => p.length == 2 && p(1) != p(0) + 1),
      "shard order mirrors ingest order — no shuffle happened")

    // writer: hive layout, ONE file per shard directory
    val out = tmpDir("train_shards")
    Corpus.writeTrainingShards(docs, "doc_id", nShards = 8, out, salt = "s")
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).toSeq
    assert(shardDirs.size == 8, s"expected 8 shard dirs, got ${shardDirs.size}")
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files, want 1")
    }
    assert(spark.read.parquet(out).count() == 500)
  }

  test("temperatureRates: T=1 identity, T>1 flattens (head downsampled, tail kept whole)") {
    import graft.ops.Corpus
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1150).map(i => (i.toLong, "mid")) ++
      (2001 to 2050).map(i => (i.toLong, "small"))).toDF("id", "g")
    // T=1: 1/T-1 = 0 -> every rate is exactly 1.0 (natural mix untouched)
    val t1 = Corpus.temperatureRates(df, "g", 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(t1.values.forall(_ == 1.0), s"T=1 must keep everything: $t1")
    // T=2: rate ∝ 1/sqrt(p) normalized — smallest group keeps 1.0, head
    // is downsampled hardest, ordering strictly by group size
    val t2 = Corpus.temperatureRates(df, "g", 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(t2("small") == 1.0 && t2("big") < t2("mid") && t2("mid") < 1.0, s"$t2")
    // expected big rate: sqrt(p_small/p_big) = sqrt(50/800) = 0.25
    assert(t2("big") == 0.25, s"big rate ${t2("big")} != 0.25")
    // the applied sample is a subset and respects per-group determinism
    val kept = Corpus.sampleByTemperature(df, "id", "g", 2.0)
    assert(kept.count() < df.count())
    val again = Corpus.sampleByTemperature(df, "id", "g", 2.0)
      .select("id").as[Long].collect().toSet
    assert(kept.select("id").as[Long].collect().toSet == again)
    assert(kept.where($"g" === "small").count() == 50, "rate-1.0 group must keep all rows")
  }

  test("epochRates/sampleWithRepetition: T=1 identity, upsample-only mass law, cap") {
    import graft.ops.Corpus
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1150).map(i => (i.toLong, "mid")) ++
      (2001 to 2050).map(i => (i.toLong, "small"))).toDF("id", "g")
    // T=1: every group trains exactly once — output IS the input, epoch 0
    val t1 = Corpus.sampleWithRepetition(df, "id", "g", 1.0)
    assert(t1.count() == 1000 && t1.where($"epoch" =!= 0L).count() == 0)
    // T=2: f ∝ 1/sqrt(p) normalized so the HEAD trains once; small hits
    // sqrt(800/50) = 4.0 exactly at the default cap, mid = sqrt(800/150)
    val e2 = Corpus.epochRates(df, "g", 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(e2("big") == 1.0 && e2("small") == 4.0, s"$e2")
    assert(math.abs(e2("mid") - 2.309401) < 1e-6, s"mid ${e2("mid")}")
    // cap: maxEpochs=2 clamps small
    val cap = Corpus.epochRates(df, "g", 2.0, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(cap("small") == 2.0, s"$cap")
    // applied: head kept exactly once, no row of any group dropped, and
    // per-group mass lands in [n·floor(f), n·ceil(f)]
    val rep = Corpus.sampleWithRepetition(df, "id", "g", 2.0)
    assert(rep.where($"g" === "big").count() == 800)
    assert(rep.select("id").distinct().count() == 1000, "upsample-only: no row dropped")
    val midN = rep.where($"g" === "mid").count()
    assert(midN >= 300 && midN <= 450, s"mid mass $midN outside [2n, 3n]")
    assert(rep.where($"g" === "small").count() == 200, "integer factor 4 = exact 4 copies")
    // copies are distinguished (id, epoch) — no duplicate training keys
    assert(rep.select("id", "epoch").distinct().count() == rep.count())
    // reserved-column discipline
    intercept[IllegalArgumentException] {
      Corpus.sampleWithRepetition(df.withColumn("epoch", lit(1)), "id", "g", 2.0)
    }
  }

  test("withInterleaveOrder: every prefix is group-balanced until a group exhausts") {
    import graft.ops.Corpus
    val df = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1001 to 1030).map(i => (i.toLong, "mid")) ++
      (2001 to 2010).map(i => (i.toLong, "small"))).toDF("id", "g")
    val ordered = Corpus.withInterleaveOrder(df, "id", "g")
      .orderBy("ord", "g", "id")
      .select("g").as[String].collect()
    // while all 3 groups live (first 30 ranks): every 3-row window has one of each
    for (k <- Seq(1, 5, 10)) {
      val prefix = ordered.take(k * 3)
      assert(prefix.count(_ == "big") == k && prefix.count(_ == "mid") == k &&
        prefix.count(_ == "small") == k, s"prefix ${k * 3} unbalanced")
    }
    // after small (10) exhausts, big and mid stay balanced until mid (30) runs out
    val after = ordered.drop(30).take(40) // ranks 10..29 of big+mid
    assert(after.count(_ == "big") == 20 && after.count(_ == "mid") == 20)
    // deterministic and reserved-column guarded
    assert(Corpus.withInterleaveOrder(df, "id", "g")
      .orderBy("ord", "g", "id").select("id").as[Long].collect().toSeq ==
      Corpus.withInterleaveOrder(df, "id", "g")
        .orderBy("ord", "g", "id").select("id").as[Long].collect().toSeq)
    intercept[IllegalArgumentException] {
      Corpus.withInterleaveOrder(df.withColumn("ord", lit(1)), "id", "g")
    }
  }

  test("splitLeakageAudit: silent on unique content, counts cross-split dup mass exactly") {
    import graft.ops.Corpus
    val unique = (1 to 200).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
    assert(Corpus.splitLeakageAudit(unique, "id", "text").count() == 0)
    // 60 ids sharing ONE text land in all three splits; expected leaked
    // pairs per split pair = the product of per-split membership counts
    val dup = (1 to 60).map(i => (i.toLong, "same text")).toDF("id", "text")
    val bySplit = Corpus.withSplit(dup, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Corpus.splitLeakageAudit(dup, "id", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for {
      (a, b) <- Seq(("test", "train"), ("test", "validation"), ("train", "validation"))
      if bySplit.getOrElse(a, 0L) > 0 && bySplit.getOrElse(b, 0L) > 0
    } assert(out((a, b)) == ((1L, bySplit(a) * bySplit(b))),
      s"($a,$b): ${out.get((a, b))} vs expected ${bySplit(a) * bySplit(b)}")
    // normalization: whitespace/case variants of the same content leak too
    val variant = Seq((1L, "Same  Text"), (100L, "same text")).toDF("id", "text")
    val vs = Corpus.withSplit(variant, "id").select("split").distinct().count()
    if (vs == 2) assert(Corpus.splitLeakageAudit(variant, "id", "text").count() == 1)
  }
}
