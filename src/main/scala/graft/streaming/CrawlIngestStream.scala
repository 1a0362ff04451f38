package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.ops.{Corpus, Dedup, ManifestStore, TextOps}

/**
 * The CRAWL-INGEST CAPSTONE streamed — the full `q_pipeline_crawl` front
 * end as one continuous configuration, every stage the SAME spec- and
 * oracle-verified operator its batch form uses, in the same order:
 *
 *  1. HTML→text extraction + URL hygiene (per-row, stateless):
 *     block-structured `html_to_text` by default (the paragraph tiers
 *     below operate on its line units), canonicalize → host →
 *     registrable domain.
 *  2. BLOCKLIST ([[Corpus.filterBlockedUrls]], registrable-domain match):
 *     static list, anti-join per batch.
 *  3. eTLD+1 CAP ([[RateLimitStream.CmsRateLimiter]] keyed on the
 *     registrable domain): the batch capstone's `capPerGroup(domain, N)`
 *     becomes a cross-batch admission cap — the SAME first-N-per-domain
 *     set when shards arrive in id order, and the only stage whose
 *     batch/stream equivalence depends on arrival order (stated
 *     honestly: a shuffled replay admits a different-but-equally-capped
 *     subset; the CMS matrix is the only state).
 *  4. WITHIN-DOC line dedup ([[Dedup.paragraphDedupWithinDoc]], per-row)
 *     then CORPUS-WIDE keep-first paragraph dedup against the persisted
 *     line-hash store ([[Dedup.paragraphDedupIncrementalIndexed]] — the
 *     ParagraphIngestStream stage inlined; the corpus is never
 *     rescanned). Dedup runs BEFORE the gates — the CCNet stage order
 *     (r17): the promo/footer chrome a block extractor surfaces as
 *     real lines pollutes n-gram language-ID, and keep-first dedup is
 *     exactly the stage that strips it.
 *  5. LANGUAGE GATE (`lang_id_ngram` ≠ 'und') and QUALITY GATE
 *     ([[TextOps.curationGate]] under caller rules) — per-row kernels
 *     over the deduplicated text.
 *  6. DECONTAMINATION: exact-fingerprint anti-join against a static
 *     benchmark-suite fingerprint frame (`fp` column) — the capstone's
 *     %97-suite arm with the suite as the external registry input it is
 *     in production.
 *  7. UPSERT ([[ManifestStore.upsert]]) into the lang-partitioned
 *     corpus table — atomic visibility, crash debris invisible.
 *
 * TEMPERATURE MIX IS NOT A STAGE: the batch capstone's final
 * `sampleByTemperature` needs the GLOBAL language distribution, which an
 * ingest stream cannot know mid-flight — mixing is an export-time
 * decision over the accumulated table ([[exportMix]]), and streamed
 * ingest + export-time mix reproduces the batch capstone bit-for-bit
 * (CrawlIngestStreamSpec pins it over ordered shards).
 *
 * Per batch one ledger row: `(batchId, nIn, nRefused, nUnblocked,
 * nAdmitted, nEmptied, nLang, nQuality, nClean)` — each adjacent
 * difference is one stage's rejection count (nRefused counts docs whose
 * EXTRACTION refused — corrupt/encrypted/unknowable PDFs, non-JSON
 * under a json mime — the honest-tier blind-spot mass, visible in the
 * ledger instead of silently pre-filtered; nEmptied counts docs whose
 * text the dedup tiers emptied, BEFORE the gates), the per-stage
 * accounting a crawl operator reads before trusting the feed.
 */
object CrawlIngestStream {

  final case class BatchReport(
      batchId: Long, nIn: Long, nRefused: Long, nUnblocked: Long,
      nAdmitted: Long, nEmptied: Long, nLang: Long, nQuality: Long,
      nClean: Long)

  /** How stage 1 turns the payload column into text. */
  sealed trait Extract
  object Extract {
    /** Block-structured `html_to_text` — the default: line units for
      * the paragraph tiers. */
    case object Blocks extends Extract
    /** Legacy flat strip ([[TextOps.stripHtml]]): one line per doc —
      * the paragraph tiers degrade to within-doc no-ops. */
    case object Flat extends Extract
    /** Payload is already extracted text — pass through. */
    case object Plain extends Extract
  }

  /** Static configuration of the chain. `blockedHosts` follows
    * [[Corpus.filterBlockedUrls]]'s registrable-match contract;
    * `suiteFps` is a `(fp)` frame of benchmark fingerprints (None
    * disables decontamination). */
  final case class Config(
      blockedHosts: Seq[String],
      domainCap: Long,
      rules: TextOps.CurationRules,
      lineStoreDir: String,
      tablePath: String,
      suiteFps: Option[DataFrame] = None,
      extract: Extract = Extract.Blocks)

  /** Wire the chain over a streaming frame carrying `idCol`, `urlCol`
    * and `htmlCol` (raw payload — already decoded text also works; the
    * strip is a no-op on tag-free text). `titleCol` (optional) is a
    * per-doc document-title column carried UNTOUCHED through every
    * stage into the corpus table — the retrieval tier's BM25F weighted
    * title field, fed from the crawl side (html_title upstream). When
    * absent the table schema is unchanged. */
  def attach(
      docs: DataFrame, idCol: String, urlCol: String, htmlCol: String,
      cfg: Config, titleCol: Option[String] = None)(
      onReport: BatchReport => Unit): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = cfg.blockedHosts.toDF("host")
    val limiter = new RateLimitStream.CmsRateLimiter("domain", idCol, cfg.domainCap)
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val pinned = batch.localCheckpoint()
      var framed: DataFrame = null
      var admitted: DataFrame = null
      var cleaned: DataFrame = null
      try {
        val nIn = pinned.count()
        // 1. extraction + URL hygiene (one per-row projection):
        // block-structured by default — the paragraph tiers below
        // operate on html_to_text's line units. CHECKPOINTED: the
        // extraction kernels (pdf object walk, json parse, html walk)
        // run ONCE per batch — downstream counts and stages replay the
        // materialized rows, not the kernels
        framed = pinned.select(
          col(idCol) +: col(urlCol).as("url") +:
          (cfg.extract match {
            case Extract.Blocks => TextOps.htmlToText(col(htmlCol))
            case Extract.Flat => TextOps.stripHtml(col(htmlCol))
            case Extract.Plain => col(htmlCol)
          }).as("text") +:
          titleCol.map(t => col(t).as("title")).toSeq: _*)
          .localCheckpoint()
        // 1b. extraction REFUSALS (null text — the honest tiers refuse
        // what they cannot decode soundly) leave here, but COUNTED:
        // the ledger shows the blind-spot mass per batch
        val extractedOk = framed.where(col("text").isNotNull)
        val nRefused = nIn - extractedOk.count()
        // 2. blocklist, then the registrable-domain key the cap uses
        val domained = Corpus.filterBlockedUrls(
            extractedOk, "url", blocked, matchRegistrable = true)
          .withColumn("domain",
            coalesce(
              TextOps.registrableDomain(
                TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))),
              TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))))
        val nUnblocked = domained.count()
        // 3. cross-batch eTLD+1 cap
        admitted = limiter.admit(domained).localCheckpoint()
        val nAdmitted = admitted.count()
        var nEmptied = 0L
        var nLang = 0L
        var nQuality = 0L
        var nClean = 0L
        if (nAdmitted > 0) {
          // 4. within-doc, then corpus-wide keep-first vs the store —
          // BEFORE the gates (CCNet order): dedup strips the chrome
          // lines that would otherwise pollute language-ID
          val within = Dedup.paragraphDedupWithinDoc(admitted, idCol, "text")
          val para =
            if (Dedup.lineStoreCommitted(spark, cfg.lineStoreDir))
              Dedup.paragraphDedupIncrementalIndexed(
                within, cfg.lineStoreDir, idCol, "text")
            else {
              val c = Dedup.paragraphDedup(within, idCol, "text")
                .localCheckpoint()
              Dedup.writeLineHashes(within, cfg.lineStoreDir, "text")
              c
            }
          val paraed = para
            .join(admitted.select(
              col(idCol) +: col("domain") +:
              titleCol.map(_ => col("title")).toSeq: _*), Seq(idCol))
          nEmptied = paraed.where(col("text") === "").count()
          // 5. language + quality gates over the deduplicated text
          val langed = paraed
            .withColumn("lang", TextOps.langIdNgram(col("text")))
            .where(col("lang") =!= "und")
          nLang = langed.count()
          val keep = TextOps.curationGate(langed, idCol, "text", cfg.rules)
            .where(col("keep")).select(idCol)
          val gated = langed.join(keep, Seq(idCol))
          nQuality = gated.count()
          // 6. decontamination against the static suite
          val deconed = cfg.suiteFps.fold(gated) { suite =>
            gated
              .withColumn("_fp", TextOps.fingerprint(col("text")))
              .join(broadcast(suite), Seq("_fp"), "left_anti")
              .drop("_fp")
          }
          cleaned = deconed.localCheckpoint()
          nClean = cleaned.count()
          // 7. lang-partitioned corpus table (title rides when fed)
          if (nClean > 0)
            ManifestStore.upsert(
              cleaned.select(
                col(idCol) +: col("lang") +: col("domain") +:
                titleCol.map(_ => col("title")).toSeq :+ col("text"): _*),
              cfg.tablePath, "lang", Seq("lang", idCol), spark)
        }
        onReport(BatchReport(
          id, nIn, nRefused, nUnblocked, nAdmitted, nEmptied, nLang,
          nQuality, nClean))
      } finally {
        if (cleaned != null) DriftStream.release(cleaned)
        if (admitted != null) DriftStream.release(admitted)
        if (framed != null) DriftStream.release(framed)
        DriftStream.release(pinned)
      }
    }
  }

  /** [[attach]] + start. */
  def start(
      docs: DataFrame, idCol: String, urlCol: String, htmlCol: String,
      cfg: Config)(onReport: BatchReport => Unit): StreamingQuery =
    attach(docs, idCol, urlCol, htmlCol, cfg)(onReport).start()

  /** Wire the chain over RAW RECORDS `(idCol, urlCol, contentCol:
    * binary, mimeCol)` — the [[graft.sources.Warc.readStream]] shape
    * with no hand-written projection between source and chain:
    * mime-routed extraction ([[TextOps.extractText]] — pdf_text for
    * `application/pdf`, declared-charset decode + block HTML extraction
    * for the rest) runs here, records whose extraction REFUSED
    * (corrupt/encrypted PDF → NULL) drop before the chain, and the
    * pipeline continues under `Extract.Plain` (the text is already
    * block-structured — exactly the mode the paragraph tiers need). */
  def attachRecords(
      recs: DataFrame, idCol: String, urlCol: String,
      contentCol: String, mimeCol: String,
      cfg: Config)(onReport: BatchReport => Unit): DataStreamWriter[Row] = {
    // document title for the retrieval tier: html_title over the same
    // declared-charset decode the HTML route extracts from (Spark's
    // subexpression elimination shares the decode within the
    // projection); PDFs have no HTML title — NULL
    val isPdf =
      lower(coalesce(col(mimeCol), lit(""))).startsWith("application/pdf")
    val extracted = recs.select(
        col(idCol), col(urlCol),
        TextOps.extractText(col(contentCol), col(mimeCol)).as("_xtext"),
        when(!isPdf, TextOps.htmlTitle(
          TextOps.textFromBytesDeclared(col(contentCol), col(mimeCol))))
          .as("_title"))
    // refused extractions (null _xtext) flow INTO the chain so the
    // ledger counts them (nRefused) before they leave at stage 1b
    attach(extracted, idCol, urlCol, "_xtext",
      cfg.copy(extract = Extract.Plain), titleCol = Some("_title"))(onReport)
  }

  /** [[attachRecords]] + start. */
  def startRecords(
      recs: DataFrame, idCol: String, urlCol: String,
      contentCol: String, mimeCol: String,
      cfg: Config)(onReport: BatchReport => Unit): StreamingQuery =
    attachRecords(recs, idCol, urlCol, contentCol, mimeCol, cfg)(onReport)
      .start()

  /** Export-time temperature mix over the ACCUMULATED table — the batch
    * capstone's final stage, run when a training export is cut rather
    * than per micro-batch (the mix rates need the global language
    * distribution). Streamed ingest + this call ≡ the batch capstone
    * over the same corpus. */
  def exportMix(
      spark: org.apache.spark.sql.SparkSession, tablePath: String,
      idCol: String, temperature: Double): DataFrame = {
    val table = ManifestStore.currentFrame(spark, tablePath, "lang")
      .getOrElse(throw new IllegalStateException(
        s"no committed corpus table under $tablePath"))
    Corpus.sampleByTemperature(table, idCol, "lang", temperature)
  }
}
