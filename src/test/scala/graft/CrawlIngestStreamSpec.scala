package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup, TextOps}
import graft.sources.Warc
import graft.streaming.CrawlIngestStream

/**
 * Streamed crawl capstone ≡ batch capstone: the same planted corpus run
 * (a) through the batch operator chain in one pass and (b) through
 * [[CrawlIngestStream]] in ordered shards + [[CrawlIngestStream.exportMix]],
 * must produce identical rows — plus per-stage ledger accounting.
 */
class CrawlIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  // 90 docs: spam shards (blocklisted apex), sharded site.com domains
  // (capped at 3 per registrable domain), per-doc text with planted
  // boilerplate lines (within-doc repeat + corpus-wide promo line), a
  // garbage-text family the language gate must reject, and a
  // dup-bigram family the QUALITY gate must reject. Under the CCNet
  // order the gates see the POST-DEDUP text, so the quality-fail body
  // must (a) embed its doc id — an id-free repeated line would be
  // corpus-deduped away before the gate ever sees it — and (b) repeat a
  // NATURAL sentence: rich char-grams classify en at normalized
  // distance 115–158 vs the 270 cutoff (measured with
  // tools/calibrate_langid.py, which replays the classifier exactly;
  // a terse "cat sat on the mat" loop measures 314 → und, and the
  // rejection would land on the LANG ledger line instead) while 80% of
  // its word bigrams are duplicates, failing exactly the
  // maxDupBigramFrac = 0.6 rung.
  private def inputs: Seq[(Long, String, String)] =
    (1L to 90L).map { i =>
      val url =
        if (i % 9 == 0) s"https://a$i.spam.example.com/p/$i"
        else s"https://w${i % 4}.site${i % 5}.com/p/$i"
      val body =
        if (i % 11 == 7) "zzqx vvkq wpph jjfy qqzz xkwj ppfv zzyx kqvw"
        else if (i % 13 == 5)
          Seq.fill(6)(
            s"the children of house $i walk to the school in the morning " +
              "and they read many books with the teacher").mkString(" ")
        else
          s"the house number $i stands near the river and the people walk " +
            s"with their dogs in the evening when the weather is good in " +
            s"district ${i % 7}"
      val text = Seq(
        "recommended for you",
        body,
        "recommended for you", // within-doc repeat
        s"unique footer line $i").mkString("\n")
      (i, url, text)
    }

  private val rules = TextOps.CurationRules(
    minTokens = 4, maxTopTokenFrac = 0.6, maxDupBigramFrac = 0.6)

  /** The batch capstone chain (q_pipeline_crawl's shape, CCNet stage
    * order: dedup before the gates) over `df`. */
  private def batchChain(df: DataFrame, suite: Option[DataFrame]): DataFrame = {
    val blocked = Seq("spam.example.com").toDF("host")
    val domained = Corpus.filterBlockedUrls(
        df, "url", blocked, matchRegistrable = true)
      .withColumn("domain",
        coalesce(
          TextOps.registrableDomain(
            TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))),
          TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))))
    val capped = Corpus.capPerGroup(domained, "domain", 3, col("doc_id").asc)
    val within = Dedup.paragraphDedupWithinDoc(capped, "doc_id", "text")
    val deduped = Dedup.paragraphDedup(within, "doc_id", "text")
      .join(capped.select("doc_id", "domain"), Seq("doc_id"))
    val langed = deduped
      .withColumn("lang", TextOps.langIdNgram(col("text")))
      .where(col("lang") =!= "und")
    val keep = TextOps.curationGate(langed, "doc_id", "text", rules)
      .where(col("keep")).select("doc_id")
    val gated = langed.join(keep, Seq("doc_id"))
    val deconed = suite.fold(gated) { s =>
      gated.withColumn("_fp", TextOps.fingerprint(col("text")))
        .join(broadcast(s), Seq("_fp"), "left_anti").drop("_fp")
    }
    Corpus.sampleByTemperature(deconed, "doc_id", "lang", temperature = 2.0)
      .select("doc_id", "lang", "domain", "text")
  }

  test("ordered shards through the stream + export-time mix == the batch " +
    "capstone in one pass; the ledger accounts for every stage") {
    graft.GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    val df = inputs.toDF("doc_id", "url", "text")

    // the benchmark suite: fingerprints of every 17th SURVIVOR's cleaned
    // text (the %97-arm shape) — an external registry input for both paths
    val preSuite = batchChain(df, suite = None)
    val suite = preSuite.where(col("doc_id") % 17 === 0)
      .select(TextOps.fingerprint(col("text")).as("_fp")).distinct()
      .localCheckpoint()
    val want = batchChain(df, Some(suite))
      .as[(Long, String, String, String)].collect().toSet

    val lineStore = tmpDir("crawl_stream_lines")
    val table = tmpDir("crawl_stream_table")
    val cfg = CrawlIngestStream.Config(
      blockedHosts = Seq("spam.example.com"), domainCap = 3L,
      rules = rules, lineStoreDir = lineStore, tablePath = table,
      suiteFps = Some(suite.withColumnRenamed("_fp", "fp")
        .select(col("fp").as("_fp"))),
      // inputs are block-structured text already
      extract = CrawlIngestStream.Extract.Plain)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[CrawlIngestStream.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val q = CrawlIngestStream.start(
      ms.toDS().toDF("doc_id", "url", "text"),
      "doc_id", "url", "text", cfg)(reports += _)
    try {
      // three ordered shards — the id order the batch cap tie-breaks on
      ms.addData(inputs.slice(0, 30)); q.processAllAvailable()
      ms.addData(inputs.slice(30, 60)); q.processAllAvailable()
      ms.addData(inputs.slice(60, 90)); q.processAllAvailable()
    } finally q.stop()

    val got = CrawlIngestStream.exportMix(spark, table, "doc_id", 2.0)
      .select("doc_id", "lang", "domain", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(got == want,
      s"stream+export must equal batch: only-stream=${got -- want} " +
        s"only-batch=${want -- got}")

    // ledger sanity: stages only ever shrink the batch, and the stated
    // rejections actually happened (CCNet order: dedup precedes gates)
    assert(reports.size == 3)
    for (r <- reports) {
      assert(r.nIn - r.nRefused >= r.nUnblocked && r.nUnblocked >= r.nAdmitted &&
        r.nAdmitted >= r.nLang && r.nLang >= r.nQuality &&
        r.nQuality >= r.nClean && r.nEmptied <= r.nAdmitted, r.toString)
    }
    assert(reports.map(_.nIn).sum == 90L)
    assert(reports.map(_.nRefused).sum == 0L, "html strings never refuse")
    assert(reports.map(r => r.nIn - r.nRefused - r.nUnblocked).sum == 10L,
      "the %9 spam shards block (spam.example.com apex)")
    assert(reports.map(r => r.nLang - r.nQuality).sum > 0,
      "the dup-bigram family fails the quality gate")
    assert(reports.map(r => r.nAdmitted - r.nLang).sum > 0,
      "the garbage family rejects to und")
  }

  test("end-to-end from WARC bytes on disk: readStream shards -> declared " +
    "charset decode -> the capstone stream == the batch chain over the " +
    "same decoded text; the ISO-8859-2 doc survives losslessly") {
    graft.GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    // one extra doc in a charset only the Content-Type header can pick
    // (ISO-8859-2 decodes every byte — sniffing cannot choose it), on its
    // own registrable domain so the eTLD+1 cap admits it
    val plBody = "dzieci idą rano do szkoły i czytają książki z " +
      "nauczycielem w mieście a potem wracają do domu na obiad z rodzicami"
    val plText = Seq("recommended for you", plBody,
      "recommended for you", "unique footer line 91").mkString("\n")
    val all = inputs :+ ((91L, "https://news.krakow-example.pl/artykul/91", plText))

    // author REAL WARC response records (the same framing synth_warc
    // emits): HTTP envelope with the charset declared per doc
    def record(id: Long, url: String, text: String): Array[Byte] = {
      val cs = if (id == 91L) "ISO-8859-2" else "UTF-8"
      val body = text.getBytes(java.nio.charset.Charset.forName(cs))
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
        s"charset=$cs\r\n\r\n").getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val shardDir = tmpDir("warc_e2e_shards")
    val slices = Seq("s1.warc" -> all.slice(0, 30),
      "s2.warc" -> all.slice(30, 60), "s3.warc" -> all.slice(60, 91))
    val t0 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(shardDir)).toMillis
    for (((name, slice), k) <- slices.zipWithIndex) {
      val out = new java.io.ByteArrayOutputStream()
      slice.foreach { case (i, u, t) => out.write(record(i, u, t)) }
      val p = java.nio.file.Paths.get(shardDir, name)
      java.nio.file.Files.write(p, out.toByteArray)
      // ordered discovery: the file source processes oldest-first, and
      // the cap stage's batch/stream parity depends on id-ordered arrival
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + k * 2000L))
    }

    import org.apache.spark.sql.functions.regexp_extract
    val recs = Warc.readStream(spark, shardDir, maxFilesPerTrigger = 1)
      .where(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "(\\d+)$", 1).cast("long").as("doc_id"),
        col("url"),
        TextOps.textFromBytesDeclared(col("content"), col("mime")).as("text"))

    val lineStore = tmpDir("warc_e2e_lines")
    val table = tmpDir("warc_e2e_table")
    val cfg = CrawlIngestStream.Config(
      blockedHosts = Seq("spam.example.com"), domainCap = 3L,
      rules = rules, lineStoreDir = lineStore, tablePath = table,
      suiteFps = None, extract = CrawlIngestStream.Extract.Plain)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[CrawlIngestStream.BatchReport]
    val q = CrawlIngestStream.start(
      recs, "doc_id", "url", "text", cfg)(reports += _)
    try q.processAllAvailable() finally q.stop()

    val want = batchChain(all.toDF("doc_id", "url", "text"), suite = None)
      .as[(Long, String, String, String)].collect().toSet
    val got = CrawlIngestStream.exportMix(spark, table, "doc_id", 2.0)
      .select("doc_id", "lang", "domain", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(got == want,
      s"WARC bytes -> stream must equal the batch chain: " +
        s"only-stream=${got -- want} only-batch=${want -- got}")
    // the decode rung did real work: the Polish doc survives, labeled pl,
    // and its body line (ż/ó/ł/ę intact) rode the chain losslessly — the
    // boilerplate frame is gone by then (paragraph tiers cut it)
    assert(want.exists(r => r._1 == 91L && r._2 == "pl" && r._4.contains(plBody)),
      s"fixture: the Polish doc must survive the batch chain: $want")
    assert(reports.map(_.nIn).sum == 91L)
  }

  test("mixed-media WARC shards through attachRecords: HTML and PDF " +
    "records route by mime into ONE corpus, a corrupt PDF drops at " +
    "extraction, and the paragraph tier dedups across media") {
    graft.GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    def record(id: Long, url: String, mime: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    // ids 1-8 html pages with a shared promo div; 9/10 PDFs carrying
    // English prose + a SHARED footer line — cross-media dedup food;
    // 11 a corrupt PDF that must drop at extraction. The prose is the
    // calibration-proven en sentence shape (a terser fixture measured
    // und at 301 vs the 269 en cutoff).
    def pdfBytes(i: Long): Array[Byte] = {
      val content = s"BT /F1 12 Tf 72 720 Td (the children walk to the " +
        s"school in the morning and read document $i) Tj 0 -14 Td " +
        "(shared footer line) Tj ET"
      (s"%PDF-1.4\n1 0 obj << /Length ${content.length} >>\nstream\n" +
        content + "\nendstream endobj\ntrailer << /Size 2 >>\n%%EOF")
        .getBytes("ISO-8859-1")
    }
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 1L to 8L) {
      val html = (s"<html><head><title>page $i guide</title></head><body><nav>menu</nav>" +
        s"<div>hot deals today</div><p>the house number $i stands near " +
        "the river and the people walk with their dogs in the evening" +
        "</p></body></html>").getBytes("UTF-8")
      out.write(record(i, s"https://w${i % 3}.site${i % 4}.com/p/$i",
        "text/html; charset=UTF-8", html))
    }
    for (i <- 9L to 10L)
      out.write(record(i, s"https://docs.site$i.com/d/$i", "application/pdf",
        pdfBytes(i)))
    out.write(record(11L, "https://docs.site11.com/d/11", "application/pdf",
      graft.expressions.PdfKernels.synthPdf(7L))) // corrupt -> NULL
    // the other two text carriers (r18): a JSON api payload whose
    // string VALUES are the text (keys/braces must never reach the
    // corpus) — sharing the pdf footer line so the cross-media dedup
    // claim covers three media — and an RSS feed whose body ships
    // inside CDATA
    out.write(record(12L, "https://api.site12.com/d/12",
      "application/json; charset=UTF-8",
      ("{\"title\": \"json record twelve\", \"body\": \"the children walk " +
        "to the school in the morning and read books with the teacher\", " +
        "\"note\": \"shared footer line\"}").getBytes("UTF-8")))
    out.write(record(13L, "https://feeds.site13.com/d/13",
      "application/rss+xml",
      ("<rss><channel><title>daily news feed</title><item>" +
        "<title>morning post</title><description><![CDATA[<p>the children " +
        "read the books in the evening and the teacher walks home</p>]]>" +
        "</description></item></channel></rss>").getBytes("UTF-8")))
    val dir = tmpDir("warc_media")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s.warc"),
      out.toByteArray)

    val recs = Warc.readStream(spark, dir)
      .where(col("warc_type") === "response")
      .select(
        regexp_extract(col("url"), "(\\d+)$", 1).cast("long").as("doc_id"),
        col("url"), col("content"), col("mime"))
    val cfg = CrawlIngestStream.Config(
      blockedHosts = Nil, domainCap = 100L,
      rules = TextOps.CurationRules(minTokens = 2),
      lineStoreDir = tmpDir("warc_media_lines"),
      tablePath = tmpDir("warc_media_table"), suiteFps = None)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[CrawlIngestStream.BatchReport]
    val q = CrawlIngestStream.startRecords(
      recs, "doc_id", "url", "content", "mime", cfg)(reports += _)
    try q.processAllAvailable() finally q.stop()

    val got = graft.ops.ManifestStore
      .currentFrame(spark, cfg.tablePath, "lang").get
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // the corrupt PDF never reaches the corpus — but the ledger COUNTS
    // the refusal (r18): extraction blind-spot mass is data, not a
    // silent pre-filter
    assert(!got.contains(11L), s"corrupt pdf must not ingest: ${got.keySet}")
    assert(reports.map(_.nIn).sum == 13L, s"$reports")
    assert(reports.map(_.nRefused).sum == 1L,
      s"the corrupt pdf is a COUNTED refusal: $reports")
    // html route: nav gone, promo line kept-first in doc 1 only
    assert(got(3L).contains("the house number 3") &&
      !got(3L).contains("menu"), s"${got.get(3L)}")
    val withPromo = got.filter(_._2.contains("hot deals today")).keySet
    assert(withPromo == Set(1L), s"promo keep-first: $withPromo")
    // pdf route: both docs survive; the shared footer line deduped
    // ACROSS MEDIA by the same paragraph tier the html docs use
    assert(got(9L).contains("read document 9"), s"${got.get(9L)}")
    // three-media keep-first: the footer line lives in pdf 9, pdf 10,
    // AND json 12 — only the first keeps it
    assert(got(9L).contains("shared footer line") &&
      !got(10L).contains("shared footer line") &&
      !got(12L).contains("shared footer line"),
      s"cross-media paragraph keep-first: ${got(9L)} / ${got(10L)} / ${got(12L)}")
    // json route: values only — no brace/quote/key noise in the corpus
    assert(got(12L).contains("the children walk to the school") &&
      !got(12L).contains("\"") && !got(12L).contains("{"),
      s"${got.get(12L)}")
    // rss route: CDATA body extracted through the html law
    assert(got(13L).contains("the children read the books in the evening") &&
      !got(13L).contains("CDATA") && !got(13L).contains("<p>"),
      s"${got.get(13L)}")
    // the title rung (r18): html docs carry their <title> into the
    // corpus table (html_to_text rightly drops head, so this column is
    // the ONLY path); PDFs have no HTML title -> NULL. And the field
    // feeds BM25F's weighted title straight off the table: 'guide'
    // lives only in titles, so exactly the 8 html docs rank.
    val titled = graft.ops.ManifestStore
      .currentFrame(spark, cfg.tablePath, "lang").get
      .select("doc_id", "title", "text")
    val tmap = titled.select("doc_id", "title")
      .as[(Long, Option[String])].collect().toMap
    assert(tmap(3L).contains("page 3 guide"), s"$tmap")
    assert(tmap(9L).isEmpty, s"pdf has no html title: $tmap")
    // feed title: RSS <channel><title> is the first title before any
    // body — exactly what a feed's document title is; JSON has none
    assert(tmap(13L).contains("daily news feed"), s"$tmap")
    assert(tmap(12L).isEmpty, s"json has no markup title: $tmap")
    val ranked = graft.ops.Retrieval.bm25F(titled, "doc_id",
      Seq(("title", 2.0), ("text", 1.0)),
      Seq((0L, "guide")).toDF("qid", "qtext"), k = 20)
    assert(ranked.count() == 8L,
      "title-only term ranks exactly the html docs")
  }

  test("raw-HTML feed under Extract.Blocks: the nav menu never reaches the " +
    "corpus, and the repeated promo line IS removed by the paragraph tier — " +
    "the stage the flat strip silently disabled") {
    graft.GraftExtensions.register(spark)
    implicit val ctx = spark.sqlContext
    // raw pages: chrome nav (dropped at extraction), a promo div line
    // REPEATED across every page (corpus-wide keep-first food — under
    // the old flat strip this line fused into the body and the
    // paragraph tier could not touch it), per-doc prose, a footer div
    val pages = (1L to 20L).map { i =>
      val html =
        s"""<html><head><title>p$i</title><style>.x{}</style></head><body>
           |<nav>site menu home about</nav>
           |<div>subscribe to our newsletter today</div>
           |<p>the house number $i stands near the river and the people
           | walk with their dogs in the evening when the weather is good
           | in district ${i % 7}</p>
           |<script>var x = 1 < 2;</script>
           |<div>written by staff $i</div>
           |</body></html>""".stripMargin
      (i, s"https://w${i % 3}.site${i % 4}.com/p/$i", html)
    }
    val lineStore = tmpDir("crawl_html_lines")
    val table = tmpDir("crawl_html_table")
    val cfg = CrawlIngestStream.Config(
      blockedHosts = Nil, domainCap = 100L,
      rules = TextOps.CurationRules(minTokens = 4),
      lineStoreDir = lineStore, tablePath = table,
      suiteFps = None, extract = CrawlIngestStream.Extract.Blocks)
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[CrawlIngestStream.BatchReport]
    val ms = MemoryStream[(Long, String, String)]
    val q = CrawlIngestStream.start(
      ms.toDS().toDF("doc_id", "url", "html"),
      "doc_id", "url", "html", cfg)(reports += _)
    try {
      ms.addData(pages.slice(0, 10)); q.processAllAvailable()
      ms.addData(pages.slice(10, 20)); q.processAllAvailable()
    } finally q.stop()

    val got = graft.ops.ManifestStore
      .currentFrame(spark, table, "lang").get
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.size == 20, s"all prose docs survive: ${got.keySet}")
    // extraction dropped the chrome subtrees on every page
    assert(!got.values.exists(_.contains("site menu")), "nav is chrome")
    assert(!got.values.exists(_.contains("var x")), "script is code")
    // the PARAGRAPH TIER did real work on raw HTML: exactly ONE page
    // (the first) keeps the promo line; every later page lost it to
    // corpus-wide keep-first — under stripHtml this line fused into a
    // single-line doc and survived everywhere
    val withPromo = got.filter(_._2.contains("subscribe to our newsletter"))
    assert(withPromo.keySet == Set(1L),
      s"keep-first leaves the promo line only in doc 1: ${withPromo.keySet}")
    // per-doc prose and footers stayed, as distinct lines
    assert(got(7L).contains("the house number 7") &&
      got(7L).contains("written by staff 7") && got(7L).contains("\n"))
    // and the flat strip demonstrably CANNOT do this: same pages, Flat
    // mode, fresh stores — every doc keeps the promo text fused in-line
    val cfgFlat = cfg.copy(
      lineStoreDir = tmpDir("crawl_flat_lines"),
      tablePath = tmpDir("crawl_flat_table"),
      extract = CrawlIngestStream.Extract.Flat)
    val ms2 = MemoryStream[(Long, String, String)]
    val q2 = CrawlIngestStream.start(
      ms2.toDS().toDF("doc_id", "url", "html"),
      "doc_id", "url", "html", cfgFlat)(_ => ())
    try { ms2.addData(pages); q2.processAllAvailable() } finally q2.stop()
    val flat = graft.ops.ManifestStore
      .currentFrame(spark, cfgFlat.tablePath, "lang").get
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(flat.values.forall(_.contains("subscribe to our newsletter")),
      "flat strip: the promo text rides every doc — the tier no-ops")
  }
}
