package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.ops.FinOps

/**
 * Algebraic property tests (SURVEY §5 item 4), ScalaCheck-generated data
 * under a fixed seed, evaluated in one Spark batch per property (per-sample
 * Spark jobs would be prohibitively slow).
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed = rng.Seed(42L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  private val txGen = for {
    user <- Gen.chooseNum(1, 8)
    month <- Gen.chooseNum(1, 12)
    cat <- Gen.oneOf("a", "b", "c")
    cents <- Gen.chooseNum(1L, 1000000L)
  } yield (user.toString, f"2024$month%02d", cat, cents / 100.0)

  private def txDf(rows: Seq[(String, String, String, Double)]) =
    rows.zipWithIndex.map { case ((u, ym, c, amt), i) => (u, ym, i.toString, c, amt) }
      .toDF("userId", "yearMonth", "id", "category", "amount0")
      .select($"userId", $"yearMonth", $"id",
        to_date(concat($"yearMonth", lit("15")), "yyyyMMdd").as("date"),
        lit("v").as("vendor"), $"category",
        $"amount0".cast("decimal(12,2)").as("amount"),
        lit("USD").as("currency"), lit(true).as("recurring"),
        lit("t").as("txType"), lit("US-CA").as("location"), lit("d").as("description"))

  test("property: category totals partition the per-user total (A5 vs A3·count)") {
    val df = txDf(sample(txGen, 300)).cache()
    val byCat = FinOps.spendingByCategory(df, Seq("userId"))
      .groupBy("userId").agg(round(sum($"total"), 2).as("cat_sum"))
    val direct = df.groupBy("userId")
      .agg(sum(FinOps.money($"amount")).cast("double").as("total"))
    val joined = byCat.join(direct, "userId")
      .where(round($"cat_sum", 2) =!= round($"total", 2))
    assert(joined.isEmpty)
  }

  test("property: prevYearMonth is the inverse of +1 month for arbitrary months") {
    val yms = sample(for {
      y <- Gen.chooseNum(1990, 2030); m <- Gen.chooseNum(1, 12)
    } yield f"$y$m%02d", 200).distinct
    val df = yms.toDF("ym")
      .withColumn("next", date_format(add_months(to_date(concat($"ym", lit("01")), "yyyyMMdd"), 1), "yyyyMM"))
      .withColumn("back", FinOps.prevYearMonth($"next"))
    assert(df.where($"back" =!= $"ym").isEmpty)
  }

  test("property: top-k is a subset of the input and dominates every non-member") {
    val df = txDf(sample(txGen, 200)).cache()
    val top = FinOps.topHighValue(df, 3)
    // every top row exists in the input
    assert(top.select("userId", "id").exceptAll(df.select("userId", "id")).isEmpty)
    // no non-member strictly exceeds a member (per user)
    val maxNon = df.join(top.select("userId", "id"), Seq("userId", "id"), "left_anti")
      .groupBy("userId").agg(max($"amount".cast("double")).as("best_rest"))
    val minTop = top.groupBy("userId").agg(min($"amount".cast("double")).as("worst_top"), count(lit(1)).as("k"))
    val bad = minTop.where($"k" === 3).join(maxNon, "userId")
      .where($"best_rest" > $"worst_top")
    assert(bad.isEmpty)
  }

  test("property: monthly spending is invariant under union order (J4 commutativity)") {
    val rows = sample(txGen, 300)
    val (l, r) = rows.splitAt(rows.size / 2)
    val a = txDf(l); val b = txDf(r)
    val ab = FinOps.monthlySpending(a.unionByName(b))
    val ba = FinOps.monthlySpending(b.unionByName(a))
    assert(ab.exceptAll(ba).isEmpty && ba.exceptAll(ab).isEmpty)
  }

  test("property: PII redaction is idempotent and removes every detectable match") {
    val piiGen = for {
      base <- Gen.oneOf("lorem ipsum", "data over words", "x y z")
      pii <- Gen.oneOf(
        "a.user+tag@mail-host.example.org", "555-867-5309", "10.20.30.40",
        "987-65-4321", "4111 1111 1111 1111", "nothing here")
    } yield s"$base $pii end"
    val df = sample(piiGen, 100).zipWithIndex.map(_.swap).toDF("id", "text")
    val once = df.select($"id", graft.ops.Pii.redact($"text").as("r"))
    // idempotent: replacement tokens never re-match any pattern
    val twice = once.select($"id", graft.ops.Pii.redact($"r").as("r2"), $"r")
    assert(twice.where($"r" =!= $"r2").isEmpty)
    // complete: redacted text carries no detectable PII
    assert(once.where(graft.ops.Pii.hasPii($"r")).isEmpty)
  }

  test("property: pct_normalize kernel == replace chain on adversarial escape fuzz") {
    // alphabet dense in escape-boundary cases: '%', hex both cases, a
    // non-hex letter, and multibyte payload
    val chars = Gen.oneOf('%', 'a', 'b', 'f', 'A', 'F', '2', '7', 'g', 'Z', '/', 'é')
    val sGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val df = sample(sGen, 400).zipWithIndex.map(_.swap).toDF("id", "u")
    val out = df.select(
      graft.ops.TextOps.pctNormalizeUrl($"u").as("k"),
      graft.ops.TextOps.pctNormalizeUrlChain($"u").as("c"))
    assert(out.where($"k" =!= $"c").isEmpty,
      out.where($"k" =!= $"c").collect().take(3).mkString(", "))
  }

  test("property: html_unescape equals an independent regex-based reference decoder") {
    // independent reference: one regex alternation over the same decode
    // set, built from different machinery than the kernel's manual scan
    val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")
    def safe(code: Int): Option[String] = code match {
      case c if c >= 32 && c <= 126 => Some(c.toChar.toString)
      case 160 => Some(" ")
      case 169 | 171 | 174 | 176 | 183 | 187 | 215 | 247 => Some(code.toChar.toString)
      case c if (c >= 8211 && c <= 8212) || (c >= 8216 && c <= 8218) ||
        (c >= 8220 && c <= 8222) || c == 8226 || c == 8230 ||
        c == 8242 || c == 8243 || c == 8364 || c == 8482 => Some(code.toChar.toString)
      case _ => None
    }
    val rx = "&(?:(amp|lt|gt|quot|apos|nbsp);|#([0-9]{1,7});|#[xX]([0-9a-fA-F]{1,6});)".r
    def ref(s: String): String = rx.replaceAllIn(s, m => {
      val rep =
        if (m.group(1) != null) Some(named(m.group(1)))
        else if (m.group(2) != null) safe(m.group(2).toInt)
        else safe(Integer.parseInt(m.group(3), 16))
      java.util.regex.Matcher.quoteReplacement(rep.getOrElse(m.matched))
    })
    val chars = Gen.oneOf('&', '#', ';', 'x', 'X', 'a', 'm', 'p', 'l', 't',
      '3', '9', '8', '2', '1', '7', 'q', ' ')
    val sGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val fuzz = sample(sGen, 400)
    val df = fuzz.zipWithIndex.map(_.swap).toDF("id", "h")
      .select($"id", $"h", call_function("html_unescape", $"h").as("k"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    val bad = df.filter { case (h, k) => k != ref(h) }
    assert(bad.isEmpty, bad.take(3).map { case (h, k) =>
      s"'$h': kernel '$k' != ref '${ref(h)}'" }.mkString(", "))
    // regex reference is left-to-right non-overlapping like the kernel, so
    // double-encoded plants agree too
    assert(ref("&amp;lt;") == "&lt;" && ref("&amp;#39;") == "&#39;")
  }

  test("property: idn_ascii is idempotent; pure-ASCII hosts are exactly lowercased") {
    val hostGen = for {
      labels <- Gen.chooseNum(1, 3)
      parts <- Gen.listOfN(labels, Gen.oneOf(
        "Example", "BÜCHER", "münchen", "xn--bcher-kva", "a1", "東京", "COM", "de", "jp"))
    } yield parts.mkString(".")
    val hosts = sample(hostGen, 200)
    val out = hosts.zipWithIndex.map(_.swap).toDF("id", "h")
      .select($"h",
        graft.ops.TextOps.idnAsciiHost($"h").as("once"),
        graft.ops.TextOps.idnAsciiHost(
          graft.ops.TextOps.idnAsciiHost($"h")).as("twice"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val nonIdem = out.filter { case (_, a, b) => a != b }
    assert(nonIdem.isEmpty, nonIdem.take(3).mkString(", "))
    out.filter(_._1.forall(_ < 128.toChar)).foreach { case (h, a, _) =>
      assert(a == h.toLowerCase(java.util.Locale.ROOT), s"$h -> $a")
    }
  }

  test("property: lang_id_ngram is total over the profile langs + und; " +
    "empty-normalized text is always und") {
    val langs = graft.model.LangProfiles.profiles.map(_._1).toSet + "und"
    val sGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'e', 'т', 'の', '好', ' ', '\t')).map(_.mkString))
    val rows = sample(sGen, 300).zipWithIndex.map(_.swap).toDF("id", "t")
      .select($"t", graft.ops.TextOps.langIdNgram($"t").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (t, p) =>
      val trimmed = t.trim
      if (trimmed.isEmpty) assert(p == "und", s"'$t' -> $p")
      // non-empty random char soup may legitimately REJECT to und (the
      // per-language cutoffs exist for exactly this input class); the
      // property is totality, not acceptance
      else assert(langs.contains(p), s"'$t' -> $p not a profile lang or und")
    }
  }

  test("property: sequence packing partitions the corpus; seqs grow with id; only the last doc overflows") {
    val docGen = for { toks <- Gen.chooseNum(1, 700) } yield toks
    val rows = sample(docGen, 400).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "n")
    val packed = graft.ops.Corpus
      .packSequences(df, "doc_id", $"n", budget = 1000L, nBuckets = 4).cache()
    assert(packed.count() == 400) // exact partition, nothing dropped/duplicated
    // within a bucket, seq is nondecreasing in id order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("doc_id")
    assert(packed.withColumn("prev", lag($"seq", 1).over(w))
      .where($"prev".isNotNull && $"seq" < $"prev").isEmpty)
    // a sequence exceeds its budget only through its LAST document (overflow
    // contract): total minus the last doc's tokens is always under budget
    val bad = packed.groupBy("bucket", "seq")
      .agg(sum($"n").as("total"), max_by($"n", $"doc_id").as("last_n"))
      .where($"total" - $"last_n" >= 1000L)
    assert(bad.isEmpty)
  }

  test("property: weighted mixing selects a subset, monotone in rate") {
    val rows = (0L until 500L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val lo = graft.ops.Corpus.sampleByGroup(rows, "doc_id", "source", Map("src0" -> 0.2), 0.1)
    val hi = graft.ops.Corpus.sampleByGroup(rows, "doc_id", "source", Map("src0" -> 0.6), 0.3)
    assert(lo.exceptAll(rows).isEmpty) // subset of the corpus
    assert(lo.exceptAll(hi).isEmpty)   // raising every rate only adds documents
  }

  test("property: chunking covers every token, chunk sizes are exact, overlap is exact") {
    // Random (doc length, chunk size, overlap) triples; token i is named
    // "ti" so coverage is checkable from the reassembled chunk texts.
    val cfgGen = for {
      n <- Gen.chooseNum(1, 120)
      chunk <- Gen.chooseNum(1, 40)
      overlap <- Gen.chooseNum(0, chunk - 1)
    } yield (n, chunk, overlap)
    sample(cfgGen, 30).zipWithIndex.foreach { case ((n, chunk, overlap), i) =>
      val text = (0 until n).map("t" + _).mkString(" ")
      val out = graft.ops.TextOps
        .chunkDocuments(Seq((i.toLong, text)).toDF("doc_id", "text"), "doc_id", "text", chunk, overlap)
        .orderBy("chunk_no").collect()
      val chunks = out.map(_.getString(2).split(" ").toSeq)
      // every token appears in at least one chunk, in order
      assert(chunks.flatten.toSet == (0 until n).map("t" + _).toSet,
        s"n=$n chunk=$chunk overlap=$overlap lost tokens")
      // every chunk except the last is exactly `chunk` tokens, and chunk j
      // starts exactly at token j·stride
      chunks.dropRight(1).foreach(c => assert(c.size == chunk))
      chunks.zipWithIndex.foreach { case (c, j) =>
        assert(c.head == "t" + (j * (chunk - overlap)),
          s"n=$n chunk=$chunk overlap=$overlap: chunk $j starts at ${c.head}")
      }
    }
  }

  test("property: LSH posting-list pairs equal the reference bucket pairing (capped + uncapped, dup-tolerant)") {
    // Random (band, band_key, id) rows with DELIBERATE duplicates — a
    // duplicated input row must never become a self-pair, and the occupancy
    // cap must count distinct documents. Reference computed in Scala.
    val rowGen = for {
      band <- Gen.chooseNum(0, 3)
      key <- Gen.chooseNum(0L, 5L)
      id <- Gen.chooseNum(1L, 40L)
    } yield (band, key, id)
    val rows = sample(rowGen, 400) // 96 buckets × 400 rows → dense + duplicated
    val bands = rows.toDF("band", "band_key", "id")
    def reference(cap: Int): Set[(Long, Long)] =
      rows.distinct.groupBy(r => (r._1, r._2)).values
        .map(_.map(_._3).distinct.sorted)
        .filter(ids => ids.size > 1 && ids.size <= cap)
        .flatMap(ids => ids.combinations(2).map(p => (p(0), p(1))))
        .toSet
    for (cap <- Seq(Int.MaxValue, 4)) {
      val got = graft.ops.Dedup.candidatePairs(bands, maxOccupancy = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == reference(cap), s"cap=$cap")
      assert(got.forall { case (a, b) => a < b }, s"cap=$cap emitted unordered or self pair")
    }
  }

  test("property: simhash band pairing equals brute-force Hamming <= 3") {
    // Sketches drawn as <=3-bit flips of a small base pool, so true
    // near-pairs are dense; 16-bit banding is pigeonhole-exact at Hamming
    // <= 3, so the blocked result must equal the full quadratic scan.
    val base = sample(Gen.chooseNum(Long.MinValue, Long.MaxValue), 12)
    val skGen = for {
      b <- Gen.oneOf(base)
      nFlips <- Gen.chooseNum(0, 4) // the 4-flip tail stays out of range
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 63))
    } yield flips.distinct.foldLeft(b)((acc, bit) => acc ^ (1L << bit))
    val sks = sample(skGen, 150).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val truth = (for {
      (a, i) <- sks.zipWithIndex; (b, j) <- sks.zipWithIndex if i < j
      h = java.lang.Long.bitCount(a._2 ^ b._2) if h <= 3
    } yield (math.min(a._1, b._1), math.max(a._1, b._1), h)).toSet
    val got = graft.ops.Dedup
      .simhashNearDuplicates64(sks.toDF("id", "simhash"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == truth)
  }

  test("property: editDistancePairs equals brute-force levenshtein for d=1 and d=2") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // small alphabet + short strings → dense distance structure, both
    // blocking paths (deletion neighborhoods at d=1, gram prefixes at
    // d=2) exercised against the same ground truth
    val strGen = for {
      n <- Gen.chooseNum(0, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val strs = sample(strGen, 120).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val truth = (for {
        (i, a) <- strs; (j, b) <- strs
        if i < j && lev(a, b) <= d
      } yield (i, j, lev(a, b))).toSet
      val got = graft.ops.Dedup.editDistancePairs(df, "id", "s", maxDist = d)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == truth,
        s"d=$d: missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
    }
  }

  test("property: phraseSearch counts equal brute-force sliding-window counts") {
    val docGen = for {
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    val docs = sample(docGen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for (phrase <- Seq("a", "a b", "a a", "b c a")) {
      val pt = phrase.split(" ").toSeq
      val truth = docs.flatMap { case (id, t) =>
        val toks = t.split(" ", -1).toSeq
        val n = toks.sliding(pt.size).count(_ == pt)
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      val got = graft.ops.Retrieval.phraseSearch(df, "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"phrase '$phrase': got $got want $truth")
    }
  }

  test("property: cmsJoinSize never undercounts the exact size on random multisets") {
    import graft.ops.Profile
    val keyGen = Gen.chooseNum(0, 40).map(i => s"k$i")
    for ((nl, nr, w) <- Seq((300, 200, 8), (500, 100, 64), (100, 100, 512))) {
      val ls = sample(keyGen, nl)
      val rs = sample(keyGen, nr)
      val lm = ls.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rm = rs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val truth = lm.map { case (k, c) => c * rm.getOrElse(k, 0L) }.sum
      val exact = Profile.joinSizeExact(ls.toDF("k"), "k", rs.toDF("k"), "k")
        .collect()(0).getLong(0)
      assert(exact == truth)
      val est = Profile.cmsJoinSize(ls.toDF("k"), "k", rs.toDF("k"), "k", d = 4, w = w)
        .collect()(0).getLong(0)
      assert(est >= truth, s"w=$w undercut: $est < $truth")
    }
  }

  test("property: countAnomalies equals the brute-force integer z-test over random series") {
    import graft.ops.Events
    val evGen = for {
      key <- Gen.oneOf("a", "b", "c")
      h <- Gen.chooseNum(0, 19) // 20 hourly buckets
      burst <- Gen.chooseNum(1, 3)
    } yield (key, h, burst)
    val base = 1704067200L
    val rows = sample(evGen, 400).flatMap { case (k, h, n) =>
      Seq.fill(n)((k, new java.sql.Timestamp((base + h * 3600L) * 1000)))
    }
    val got = Events.countAnomalies(rows.toDF("k", "ts"), "k", "ts", 3600L, k = 2L)
      .select("key", "bucket").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // brute force: dense per-key series over the key's own span
    val truth = rows.groupBy(_._1).flatMap { case (key, evs) =>
      val counts = evs.groupBy(e => base + ((e._2.getTime / 1000 - base) / 3600) * 3600)
        .view.mapValues(_.size.toLong).toMap
      val lo = counts.keys.min; val hi = counts.keys.max
      val dense = (lo to hi by 3600L).map(b => b -> counts.getOrElse(b, 0L))
      val n = dense.size.toLong
      val s = dense.map(_._2).sum
      val q = dense.map(x => x._2 * x._2).sum
      dense.collect { case (b, x) if {
        val dev = n * x - s; dev * dev > 4L * (n * q - s * s)
      } => (key, b) }
    }.toSet
    assert(got == truth, s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }

  test("property: asOfJoinWithin equals brute-force latest-prior-within-TTL") {
    import graft.ops.Events
    val base = 1704067200L
    val evGen = for {
      user <- Gen.chooseNum(1, 5)
      sec <- Gen.chooseNum(0, 5000)
    } yield (user.toLong, sec.toLong)
    val lefts = sample(evGen, 80).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, new java.sql.Timestamp((base + t) * 1000)) }
    val rights = sample(evGen, 120).zipWithIndex
      .map { case ((u, t), i) => (1000L + i, u, new java.sql.Timestamp((base + t) * 1000)) }
    val l = lefts.toDF("event_id", "user_id", "ts")
    val r = rights.map { case (id, u, ts) => (u, ts, id) }.toDF("user_id", "ts", "rid")
    val ttl = 600L
    val got = Events.asOfJoinWithin(l, r, "user_id", "ts", ttl,
        rightPayload = Seq("rid"), rightTiebreak = Seq("rid"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    val truth = lefts.map { case (id, u, t) =>
      val cands = rights.filter(x => x._2 == u && !x._3.after(t))
      // latest prior; ts ties break on the LARGEST rid (the carry takes
      // the last row in (ts, tiebreak asc) order)
      val best = cands.sortBy(x => (x._3.getTime, x._1)).lastOption
      id -> best.filter(b => t.getTime - b._3.getTime <= ttl * 1000).map(_._1)
    }.toMap
    assert(got == truth,
      s"diff=${truth.collect { case (k, v) if got.get(k).flatten != v => (k, v, got.get(k)) }.take(5)}")
  }

  test("property: packedExamples partitions the corpus with budget-bounded pack starts") {
    import graft.ops.Corpus
    val docGen = for { n <- Gen.chooseNum(1, 30) } yield n
    val docs = sample(docGen, 150).zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }
    val df = docs.toDF("doc_id", "n")
    val got = Corpus.packedExamples(df, "doc_id", col("n"), budget = 64L, nBuckets = 4)
      .collect()
    val members = got.flatMap(_.getString(4).split(",").map(_.toLong))
    assert(members.length == docs.size && members.toSet == docs.map(_._1).toSet,
      "every doc must land in exactly one pack")
    // budget semantics: within a pack, every member's START offset is
    // under budget (the last doc may overflow past it, never start past it)
    got.foreach { r =>
      val lens = r.getString(5).split(",").map(_.toLong)
      val starts = lens.scanLeft(0L)(_ + _).dropRight(1)
      assert(starts.forall(_ < 64L), s"pack starts past budget: ${r.toString}")
    }
  }

  test("property: ddQuantiles stay within alpha relative error on random positive data") {
    import graft.ops.Profile
    val vGen = Gen.chooseNum(1, 5000000).map(_ / 100.0) // 0.01 .. 50000, 5 decades
    for (alpha <- Seq(0.01, 0.05)) {
      val vals = sample(vGen, 3000)
      val hist = Profile.ddHistogram(vals.toDF("x"), "x", alpha)
      val got = Profile.ddQuantiles(hist, alpha, Seq(0.25, 0.5, 0.75, 0.99))
        .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
      val sorted = vals.sorted
      got.foreach { case (p, est) =>
        val truth = sorted(math.floor(p * (vals.size - 1)).toInt)
        assert(math.abs(est / truth - 1) <= alpha + 1e-6,
          s"alpha=$alpha p=$p est=$est truth=$truth")
      }
    }
  }

  test("property: drift sums are non-negative, JSD <= ln 2, and symmetric in JSD") {
    import graft.ops.Profile
    val keyGen = Gen.oneOf("a", "b", "c", "d", "e")
    val xs = sample(keyGen, 200).toDF("k")
    val ys = sample(Gen.oneOf("c", "d", "e", "f"), 150).toDF("k")
    val f = Profile.drift(xs, ys, "k").collect()(0)
    val g = Profile.drift(ys, xs, "k").collect()(0)
    assert(f.getAs[Double]("psi") >= 0 && g.getAs[Double]("psi") >= 0)
    assert(f.getAs[Double]("jsd") >= 0 && f.getAs[Double]("jsd") <= math.log(2) + 1e-12)
    assert(math.abs(f.getAs[Double]("jsd") - g.getAs[Double]("jsd")) < 1e-12,
      "JSD must be symmetric")
  }

  test("property: lex-index tombstone delete equals a fresh build over the remaining corpus") {
    import graft.ops.Retrieval
    // random small corpora over a tiny vocabulary (guaranteed term
    // collisions, so df/N/avgdl adjustments have teeth) and random delete
    // sets, including ids not in the corpus
    val vocab = Seq("a", "b", "c", "d", "e")
    val docGen = for {
      len <- Gen.chooseNum(0, 6)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val queries = Seq((0L, "a c"), (1L, "b d e")).toDF("qid", "qtext")
    def ranked(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("qid", "rank").collect().toSeq.map(_.toSeq)
    for (trial <- 0 until 3) {
      val texts = sample(docGen, 20)
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
        .toDF("doc_id", "text")
      val delIds = sample(Gen.chooseNum(1L, 25L), 6).distinct // some absent
      val dir = tmpDir(s"prop_lexdel_$trial")
      Retrieval.writeLexIndex(docs, dir)
      Retrieval.deleteFromLexIndex(delIds.toDF("doc_id"), dir)
      val served = ranked(Retrieval.bm25TopKIndexed(
        Retrieval.readLexIndex(spark, dir), queries, k = 20))
      val rebuilt = ranked(Retrieval.bm25(
        docs.where(!$"doc_id".isin(delIds: _*)), "doc_id", "text", queries, k = 20))
      assert(served == rebuilt,
        s"trial $trial: delete diverged from rebuild (dels=$delIds)\n$served\nvs\n$rebuilt")
      // purge preserves serving exactly
      Retrieval.purgeLexTombstones(spark, dir)
      assert(ranked(Retrieval.bm25TopKIndexed(
        Retrieval.readLexIndex(spark, dir), queries, k = 20)) == rebuilt,
        s"trial $trial: purge changed serving")
    }
  }

  test("property: epoch repetition mass lands in [n·floor(f), n·ceil(f)], head exact, no row dropped") {
    import graft.ops.Corpus
    for (trial <- 0 until 3) {
      val sizes = Gen.listOfN(4, Gen.chooseNum(20, 300))
        .pureApply(Gen.Parameters.default, rng.Seed(trial + 7L))
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => ((g * 10000 + i).toLong, s"g$g")) }
      val df = rows.toDF("id", "g")
      val t = 1.0 + trial // T = 1, 2, 3
      val rates = Corpus.epochRates(df, "g", t)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val out = Corpus.sampleWithRepetition(df, "id", "g", t)
      val counts = out.groupBy("g").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = sizes.zipWithIndex.map { case (s, g) => s"g$g" -> s.toLong }.toMap
      for ((g, f) <- rates) {
        val (lo, hi) = (n(g) * math.floor(f).toLong, n(g) * math.ceil(f).toLong)
        assert(counts(g) >= lo && counts(g) <= hi,
          s"trial $trial T=$t $g: ${counts(g)} outside [$lo, $hi] at f=$f")
      }
      // unique-largest group trains exactly once; no id ever dropped
      val maxN = n.values.max
      if (n.values.count(_ == maxN) == 1) {
        val head = n.maxBy(_._2)._1
        assert(rates(head) == 1.0 && counts(head) == maxN, s"head $head: ${rates(head)}/${counts(head)}")
      }
      assert(out.select("id").distinct().count() == rows.length.toLong)
      assert(out.select("id", "epoch").distinct().count() == out.count())
    }
  }

  test("property: hard negatives equal the brute ranking minus positives (unguarded)") {
    import graft.ops.Similarity
    for (trial <- 0 until 3) {
      val s = rng.Seed(trial + 13L)
      val comps = Gen.listOfN(15 * 4, Gen.chooseNum(-100, 100))
        .pureApply(Gen.Parameters.default, s)
      val corpus = comps.grouped(4).zipWithIndex.map { case (c, i) =>
        ((i + 1).toLong, c.map(_ / 100.0f).toArray) }.toSeq.toDF("vec_id", "embedding")
      val queries = Seq((0L, Array(0.9f, 0.1f, -0.3f, 0.5f)),
        (1L, Array(-0.2f, 0.8f, 0.4f, -0.6f))).toDF("qid", "qvec")
      val posIds = Gen.listOfN(8, Gen.zip(Gen.chooseNum(0L, 1L), Gen.chooseNum(1L, 15L)))
        .pureApply(Gen.Parameters.default, s).distinct
      val positives = posIds.toDF("qid", "vec_id")
      // independent expectation: full brute ranking, positives removed, re-ranked
      val full = Similarity.bruteForceTopK(corpus, queries, 15)
        .select("qid", "vec_id", "dot").orderBy("qid", "dot", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy { case (q, v, d) => (q, -d, v) }
      val expected = full.groupBy(_._1).view.mapValues(
          _.filterNot { case (q, v, _) => posIds.contains((q, v)) }
            .take(4).zipWithIndex
            .map { case ((q, v, d), i) => (q, i + 1, v, d) })
        .values.flatten.toSeq.sortBy(t => (t._1, t._2))
      val got = Similarity.hardNegatives(corpus, queries, positives, 4)
        .select("qid", "rank", "vec_id", "dot").orderBy("qid", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expected, s"trial $trial:\n$got\nvs\n$expected")
    }
  }

  test("property: NB count-frame fold equals whole-corpus training on random batch splits") {
    import graft.ops.TextOps
    val vocab = Seq("u", "v", "w", "x", "y")
    for (trial <- 0 until 3) {
      val s = rng.Seed(trial + 29L)
      val docGen = for {
        lbl <- Gen.oneOf("A", "B", "C")
        len <- Gen.chooseNum(1, 5)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield (lbl, ws.mkString(" "))
      val rows = Gen.listOfN(30, docGen).pureApply(Gen.Parameters.default, s)
      val cut = Gen.listOfN(30, Gen.chooseNum(0, 2)).pureApply(Gen.Parameters.default, s)
      val batches = (0 to 2).map(b =>
        rows.zip(cut).collect { case (r, c) if c == b => r })
        .filter(_.nonEmpty).map(_.toDF("label", "text"))
      val folded = TextOps.nbFromFrames(
        batches.map(TextOps.nbFrame(_, "label", "text", numBuckets = 1024)).reduce(_ unionByName _))
      val whole = TextOps.nbTrain(rows.toDF("label", "text"), "label", "text", numBuckets = 1024)
      val test = Seq((1L, "u x"), (2L, "y y w"), (3L, "zzz")).toDF("id", "text")
      def preds(m: TextOps.NbModel) =
        TextOps.nbPredict(test, "id", "text", m).orderBy("id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(preds(folded) == preds(whole), s"trial $trial diverged")
    }
  }

  test("property: paragraph dedup conservation laws (keep-first exactly-once, remove-all = unique lines)") {
    import graft.ops.Dedup
    // random docs over a small line alphabet so cross-doc duplication is dense
    val lineGen = Gen.chooseNum(0, 11).map(k => s"line$k")
    val docGen = for {
      n <- Gen.chooseNum(1, 6)
      ls <- Gen.listOfN(n, lineGen)
    } yield ls.mkString("\n")
    val docs = sample(docGen, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val inputLines = docs.flatMap { case (id, t) =>
      t.split("\n", -1).zipWithIndex.map { case (l, p) => (id, p, l) } }
    def outLines(keepFirst: Boolean): Seq[(Long, String)] =
      Dedup.paragraphDedup(df, "doc_id", "text", keepFirst = keepFirst)
        .collect().flatMap { r =>
          val t = r.getString(1)
          if (t.isEmpty) Seq.empty
          else t.split("\n", -1).toSeq.map(l => (r.getLong(0), l))
        }.toSeq
    // keep-first: every distinct line VALUE survives exactly once, at its
    // (id, pos)-first location
    val kf = outLines(keepFirst = true)
    val distinctVals = inputLines.map(_._3).distinct.toSet
    assert(kf.map(_._2).toSet == distinctVals)
    assert(kf.size == distinctVals.size, "keep-first emitted a value twice")
    val firstHome = inputLines.groupBy(_._3).map { case (l, occ) =>
      l -> occ.map(o => (o._1, o._2)).min }
    kf.foreach { case (id, l) => assert(firstHome(l)._1 == id, s"'$l' survived off-home") }
    // remove-all: exactly the globally-unique line values survive, in place
    val ra = outLines(keepFirst = false)
    val uniqueVals = inputLines.groupBy(_._3).filter(_._2.size == 1).keySet
    assert(ra.map(_._2).toSet == uniqueVals && ra.size == uniqueVals.size)
    // and remove-all's survivors are a subset of keep-first's values
    assert(ra.map(_._2).toSet.subsetOf(kf.map(_._2).toSet))
  }

  test("property: binary sign codes — hamming(a,a)=0, symmetry, equals the scalar bit count") {
    import graft.ops.Similarity
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f))
    val vecs = sample(vecGen, 40).zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val sigs = Similarity.binaryEncodeFrame(df, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).head).toMap
    // engine packing equals the scalar reference rule
    vecs.foreach { case (id, v) =>
      val ref = v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0f) acc | (1L << i) else acc }
      assert(sigs(id) == ref, s"vec $id packed wrong")
    }
    // hamming laws via the column function over a self-join sample
    val a = sigs(0L); val refSelf = java.lang.Long.bitCount(a ^ a)
    assert(refSelf == 0)
    for (i <- 1L until 10L) {
      val hAb = java.lang.Long.bitCount(sigs(0L) ^ sigs(i))
      val hBa = java.lang.Long.bitCount(sigs(i) ^ sigs(0L))
      assert(hAb == hBa)
    }
    val engine = df.where($"vec_id" < 10)
      .select($"vec_id",
        Similarity.hammingDist(
          Similarity.binaryEncode($"embedding", 64),
          array((0 until 1).map(_ => lit(sigs(0L))): _*), 64).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 10L).foreach { i =>
      assert(engine(i) == java.lang.Long.bitCount(sigs(i) ^ sigs(0L)))
    }
  }
}
