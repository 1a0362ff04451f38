package graft

import java.nio.file.{Files, Paths}

import graft.expressions.WarcKernels
import graft.sources.Warc

/**
 * WARC shard ingest: batch/stream parity, gzip member framing, HTTP
 * envelope + de-chunking, the _corrupt sentinel contract, and the
 * ingest-health ledger (the JsonlStreamSpec shape for crawl bytes).
 */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, name: String, ids: Seq[Long]): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    ids.foreach(id => out.write(WarcKernels.synthWarc(id)))
    Files.write(Paths.get(dir, name), out.toByteArray)
  }

  test("batch read: plain and gzip-member shards parse identically; " +
    "chunked bodies de-chunk; the HTTP envelope is stripped") {
    graft.GraftExtensions.register(spark)
    val dir = tmpDir("warc_batch")
    writeShard(dir, "even.warc", Seq(0L, 2L, 4L))      // plain framing
    writeShard(dir, "odd.warc.gz", Seq(1L, 3L, 5L))    // member-per-record
    val rows = Warc.read(spark, dir)
      .select("path", "rec_no", "warc_type", "url", "status", "content")
      .collect()
    assert(rows.length == 18, "3 ids x 3 records x 2 shards")
    val responses = rows.filter(_.getString(2) == "response")
    assert(responses.length == 6)
    for (r <- responses) {
      val url = r.getString(3)
      val id = url.substring(url.lastIndexOf('/') + 1).toLong
      val wantStatus = (id % 3) match { case 0 => 200; case 1 => 404; case _ => 503 }
      assert(r.getInt(4) == wantStatus, s"id=$id")
      val body = new String(r.getAs[Array[Byte]](5),
        if (id % 5 == 1) "windows-1252"
        else if (id % 5 == 2) "ISO-8859-2"
        else "UTF-8")
      val want =
        if (id % 5 == 1) s"café page $id"
        else if (id % 5 == 2) s"zażółć gęślą jaźń strona $id"
        else s"<html><body><p>synth page $id</p></body></html>"
      assert(body == want, s"id=$id (chunked arm must de-chunk)")
    }
    // warcinfo/request records pass through with raw blocks
    assert(rows.count(_.getString(2) == "warcinfo") == 6)
    assert(rows.count(_.getString(2) == "request") == 6)
  }

  test("corrupt tail surfaces as the _corrupt sentinel; earlier records " +
    "survive; the ledger counts it") {
    graft.GraftExtensions.register(spark)
    val dir = tmpDir("warc_corrupt")
    writeShard(dir, "bad.warc", Seq(6L))   // id%7=6 -> truncated tail
    writeShard(dir, "ok.warc", Seq(8L))
    val recs = Warc.read(spark, dir)
    val ledger = Warc.ingestStats(recs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1.substring(r._1.lastIndexOf('/') + 1) ->
        ((r._2, r._3, r._4))).toMap
    assert(ledger("bad.warc") == ((4L, 1L, 1L)), s"$ledger")
    assert(ledger("ok.warc") == ((3L, 1L, 0L)), s"$ledger")
    // garbage bytes → exactly one sentinel, nothing lost silently
    Files.write(Paths.get(dir, "noise.warc"),
      "this is not a warc at all".getBytes("UTF-8"))
    val noise = Warc.read(spark, dir)
      .where($"path".endsWith("noise.warc"))
      .select("warc_type").as[String].collect().toSeq
    assert(noise == Seq("_corrupt"))
  }

  test("hostile inputs degrade to the _corrupt sentinel (r17): a lying " +
    "multi-GiB Content-Length never allocates, and a shard decompressing " +
    "past the per-shard cap stops the walk") {
    graft.GraftExtensions.register(spark)
    val dir = tmpDir("warc_hostile")
    // record 8 is well-formed; the next record DECLARES ~2 GiB — the
    // old readFully allocated that up front (executor OOM risk from one
    // untrusted header); now the declaration only caps the read and the
    // oversized claim degrades to the sentinel, earlier records kept
    val good = WarcKernels.synthWarc(8L)
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 2147483000\r\n\r\nshort").getBytes("ISO-8859-1")
    Files.write(Paths.get(dir, "lying.warc"), good ++ lying)
    val types = Warc.read(spark, dir)
      .where($"path".endsWith("lying.warc"))
      .select("warc_type").as[String].collect().toSeq
    assert(types.count(_ == "_corrupt") == 1 && types.contains("response"),
      s"earlier records survive, the lying record is one sentinel: $types")
    // per-shard decompressed cap: under a tiny test cap, a shard larger
    // than the cap stops with the sentinel instead of materializing
    val dir2 = tmpDir("warc_shardcap")
    val big = new java.io.ByteArrayOutputStream()
    // ids as EVEN multiples of 7: the id%7=6 arm is a deliberately
    // truncated record and odd ids emit gzip members — one shard is one
    // framing, and either would stop the walk on its own
    (0 until 50).foreach(i => big.write(WarcKernels.synthWarc(i * 14L)))
    Files.write(Paths.get(dir2, "big.warc"), big.toByteArray)
    System.setProperty("graft.warc.maxShardBytes", "4096")
    try {
      val rows = Warc.read(spark, dir2).select("warc_type")
        .as[String].collect().toSeq
      assert(rows.count(_ == "_corrupt") == 1, s"one sentinel: $rows")
      assert(rows.size < 150, "the walk stopped early under the cap")
      assert(rows.exists(_ != "_corrupt"), "records before the cap survive")
    } finally System.clearProperty("graft.warc.maxShardBytes")
    // with the default cap the same shard parses completely
    val full = Warc.read(spark, dir2).select("warc_type")
      .as[String].collect().toSeq
    assert(!full.contains("_corrupt") && full.size >= 150)
  }

  test("WARC -> PDF -> corpus (r17): application/pdf records route to the " +
    "pdf_text tier by mime, HTML records to the declared-charset decode, " +
    "and the extracted lines ride the paragraph tier") {
    graft.GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextOps}
    // author real WARC response records: ids 1/9 carry a synth PDF
    // (arm 1: Flate stream, two lines), id 8 a CID-font PDF (arm 8:
    // Type0 + ToUnicode CMap — its 'beta' line must dedup against the
    // simple-font twins'), id 7 a corrupt PDF (arm 7 -> NULL), the rest
    // plain HTML — one shard, mixed media, the real crawl shape
    def pdfRecord(id: Long, body: Array[Byte], mime: String): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.com/d/$id\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val out = new java.io.ByteArrayOutputStream()
    for (id <- 1L to 9L) {
      val (body, mime) =
        if (id == 1L || id == 9L)
          (graft.expressions.PdfKernels.synthPdf(id * 10 + 1), "application/pdf")
        else if (id == 8L)
          (graft.expressions.PdfKernels.synthPdf(8L), "application/pdf")
        else if (id == 7L)
          (graft.expressions.PdfKernels.synthPdf(7L), "application/pdf")
        else
          (s"<html><body><nav>menu</nav><p>page $id</p></body></html>"
            .getBytes("UTF-8"), "text/html; charset=UTF-8")
      out.write(pdfRecord(id, body, mime))
    }
    val dir = tmpDir("warc_pdf")
    Files.write(Paths.get(dir, "mixed.warc"), out.toByteArray)
    val recs = Warc.read(spark, dir)
      .where($"warc_type" === "response")
      .select(
        regexp_extract($"url", "(\\d+)$", 1).cast("long").as("doc_id"),
        $"mime", $"content")
      .withColumn("text",
        when($"mime".startsWith("application/pdf"),
          TextOps.pdfText($"content"))
          .otherwise(TextOps.htmlToText(
            TextOps.textFromBytesDeclared($"content", $"mime"))))
    val got = recs.select("doc_id", "text")
      .as[(Long, Option[String])].collect().toMap
    // PDF arm 1: two extracted lines, closed form
    assert(got(1L).contains("alpha 11\nbeta"), s"${got(1L)}")
    assert(got(9L).contains("alpha 91\nbeta"), s"${got(9L)}")
    // CID-font PDF: 2-byte codes through its ToUnicode CMap
    assert(got(8L).contains("cid ff 8\nbeta"), s"${got(8L)}")
    // corrupt PDF refuses (NULL), never a mojibake guess
    assert(got(7L).isEmpty, s"${got(7L)}")
    // HTML route: nav dropped, prose kept
    assert(got(2L).contains("page 2"))
    // the extracted lines are REAL lines: the paragraph tier dedups the
    // shared 'beta' line across the three PDFs (keep-first) — including
    // the CID-encoded one, whose bytes share NOTHING with the
    // simple-font twins until the CMap decodes them
    val paraed = Dedup.paragraphDedup(
      recs.where($"text".isNotNull).select($"doc_id", $"text"),
      "doc_id", "text")
    val texts = paraed.as[(Long, String)].collect().toMap
    assert(texts(1L).contains("beta") && !texts(8L).contains("beta") &&
      !texts(9L).contains("beta"),
      s"keep-first leaves beta only in doc 1: $texts")
  }

  test("streaming twin: shards ingest incrementally and the live ledger " +
    "converges to the batch ledger; throttle bounds the backfill") {
    graft.GraftExtensions.register(spark)
    val dir = tmpDir("warc_stream")
    writeShard(dir, "s1.warc", Seq(10L))
    writeShard(dir, "s2.warc.gz", Seq(11L))
    val q = Warc.ingestStats(Warc.readStream(spark, dir, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("warc_ledger")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_ledger").count() == 2)
      assert(q.lastProgress.batchId >= 1, "1 file/trigger -> >= 2 batches")
      // late shard — both ids even (plain framing): one shard is one
      // framing, exactly like real *.warc vs *.warc.gz layouts
      writeShard(dir, "s3.warc", Seq(12L, 14L))
      q.processAllAvailable()
      val live = spark.table("warc_ledger")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1.substring(r._1.lastIndexOf('/') + 1) ->
          ((r._2, r._3, r._4, r._5))).toMap
      val batch = Warc.ingestStats(Warc.read(spark, dir))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1.substring(r._1.lastIndexOf('/') + 1) ->
          ((r._2, r._3, r._4, r._5))).toMap
      assert(live == batch, "one ingest contract, two execution modes")
      assert(live("s3.warc")._1 == 6L)
    } finally q.stop()
  }
}
