package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale document pipelines: tokenization,
 * shingling, hashing, quality scoring, language identification and
 * fingerprinting. Everything is built from codegen'd built-in expressions
 * (split / transform / aggregate / md5 / conv) — no UDFs, so the whole column
 * pipeline stays inside whole-stage codegen and scales linearly with no
 * per-row JVM⇄interpreter boundary.
 *
 * Determinism note: every hash is derived from `md5` (stable across engines,
 * JVMs and locales), never from JVM `hashCode`/xxhash seeds that another
 * engine could not reproduce.
 */
object TextOps {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: letter runs, digit runs, and single
    * punctuation marks (the pre-tokenization split every BPE vocabulary
    * starts from). ASCII-only char classes so the regex behaves identically
    * across engines. */
  val SubwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def subwordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(SubwordPattern), lit(0))

  /** Subword token count — the cheap proxy for "how many BPE tokens will
    * this document cost" used when budgeting a training corpus. */
  def subwordCount(text: Column): Column = size(subwordTokens(text))

  /**
   * Word n-gram shingles (default 3). Input with fewer than `n` tokens yields
   * an empty array (guarded — `sequence` would otherwise throw on a negative
   * range).
   *
   * PERF: pass an already-projected tokens COLUMN (an attribute) via
   * [[wordShinglesFromTokens]] on hot paths — handing this a raw `text`
   * expression makes every `element_at` re-evaluate the split inside the
   * (interpreted) lambda, ~n·tokens splits per row. [[explodedShingles]]
   * does the projection correctly.
   */
  def wordShingles(text: Column, n: Int = 3): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Shingles from a pre-computed tokens array column. */
  def wordShinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j)): _*)))

  /**
   * Distinct word shingles, exploded: `(extra..., id, sh)` rows. Tokens are
   * materialized into their own projection first so the shingle lambda
   * references an attribute, not a re-evaluated split (the projection
   * boundary survives CollapseProject because the reference is non-cheap and
   * multiply-used).
   */
  def explodedShingles(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3, extraCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val extra = extraCols.map(col)
    df.select((extra :+ col(idCol).as("id") :+ tokens(col(textCol)).as("_toks")): _*)
      .select((extra :+ col("id") :+
        explode(array_distinct(wordShinglesFromTokens(col("_toks"), n))).as("sh")): _*)
  }

  /** Stable 32-bit unsigned hash of a string: first 8 hex digits of md5,
    * as a long in [0, 2^32). */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Content fingerprint: md5 of the case/whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /**
   * URL canonicalization — the crawl-side dedup key (two fetches of one
   * resource under cosmetic URL variants must collapse BEFORE content
   * dedup ever runs): lowercases scheme and host, drops the default port
   * (`:80` for http, `:443` for https), drops the fragment, strips
   * tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`), sorts the
   * surviving query parameters byte-wise (param order is not semantic),
   * drops a lone trailing slash from non-root paths, and omits `?` when
   * no parameters survive. Regexp extraction + array HOFs, every pattern
   * RE2-compatible for oracle replay; the two codec steps are one-pass
   * native kernels. Requires [[graft.GraftExtensions.register]].
   *
   * Percent-encoding: the STANDARDS-DEFINED always-safe subset (RFC 3986
   * §2.3 unreserved characters + §6.2.2.1 hex-case normalization) is
   * applied first by [[pctNormalizeUrl]] — `%41`→`A`, `%7e`→`~`, and
   * remaining escapes' hex uppercased (`%3a`→`%3A`) — while RESERVED
   * escapes stay encoded (`%2F` is not a path separator; decoding it
   * would merge distinct resources).
   *
   * IDN hosts: the extracted host is ASCII-compat-encoded
   * ([[idnAsciiHost]] — in-JDK `java.net.IDN`, RFC 3490), so a unicode
   * host and its punycode twin (`bücher.de` / `xn--bcher-kva.de`) share
   * one canonical key feeding [[urlHost]] / [[registrableDomain]] —
   * domain caps and blocklists stop being evadable by the encoding
   * choice. This is also standards-defined equivalence, never a wrong
   * merge. Non-UTF-8 byte sequences stay out of scope.
   */
  def canonicalizeUrl(url: Column): Column = {
    val u = pctNormalizeUrl(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = idnAsciiHost(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    val port = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*(:[0-9]+)", 1)
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val keptPort = when(
      (scheme === "http" && port === ":80") ||
        (scheme === "https" && port === ":443") || port === "",
      lit("")).otherwise(port)
    val cleanPath = when(path.rlike("^.+/$") && path =!= "/",
      regexp_replace(path, "/$", "")).otherwise(path)
    val params = when(query === "", array().cast("array<string>"))
      .otherwise(array_sort(filter(split(query, "&"), p =>
        !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="))))
    concat(
      scheme, lit("://"), host, keptPort, cleanPath,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** RFC 3986 unreserved-character decodes `(escape, char)` in UPPERCASE-
    * hex spelling — ALPHA / DIGIT / `-._~`, the characters whose encoded
    * and bare forms are equivalent BY DEFINITION (§2.3), so decoding can
    * never merge distinct resources. One table drives both the Column
    * chain and the oracle SQL ([[pctNormalizeSql]]); applied AFTER the
    * hex-case fold, so only uppercase spellings need entries. `%25` is
    * absent by construction ('%' is reserved) — no decode can create a
    * new escape, making the sequential replace chain order-safe on
    * well-formed input (malformed bare-'%' text gets a deterministic
    * best-effort both engines replay identically). */
  private[graft] val pctUnreservedDecodes: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(c => (f"%%${c.toInt}%02X", c.toString))

  /** Safe-subset percent-encoding normalization of a URL string: escape
    * hex folded to uppercase, the unreserved set decoded, reserved
    * escapes surviving encoded. Whole-URL-safe: no unreserved decode can
    * produce a delimiter, so parsing after is unchanged. ONE codegen'd
    * string pass ([[graft.expressions.UrlKernels.PctNormalize]]) — the
    * replace-chain form this replaced ([[pctNormalizeUrlChain]], kept as
    * the DuckDB-replayable oracle rendering and spec-pinned bit-identical)
    * cost 78 passes over every URL, which at 100 TB of URLs was the whole
    * canonicalization budget. Requires
    * [[graft.GraftExtensions.register]]. */
  def pctNormalizeUrl(url: Column): Column =
    call_function("pct_normalize", url)

  /** The sequential replace-chain rendering of [[pctNormalizeUrl]] —
    * 12 RE2 hex-fold replaces then the 66 unreserved decodes, the form
    * [[pctNormalizeSql]] renders for the DuckDB oracle from the same
    * table. Kept for the kernel-equivalence spec; product code uses the
    * one-pass kernel. */
  private[graft] def pctNormalizeUrlChain(url: Column): Column = {
    val up1 = "abcdef".foldLeft(url)((c, h) =>
      regexp_replace(c, s"%$h([0-9A-Fa-f])", s"%${h.toUpper}" + "$1"))
    val up2 = "abcdef".foldLeft(up1)((c, h) =>
      regexp_replace(c, s"%([0-9A-F])$h", "%$1" + h.toUpper))
    pctUnreservedDecodes.foldLeft(up2) { case (c, (esc, ch)) =>
      replace(c, lit(esc), lit(ch))
    }
  }

  /** The [[pctNormalizeUrl]] chain rendered as DuckDB SQL around `inner`
    * — same fold order, `\1` backrefs, explicit 'g' flags (DuckDB
    * replaces first-match by default where Spark replaces all). */
  private[graft] def pctNormalizeSql(inner: String): String = {
    val up1 = "abcdef".foldLeft(inner)((s, h) =>
      s"regexp_replace($s, '%$h([0-9A-Fa-f])', '%${h.toUpper}\\1', 'g')")
    val up2 = "abcdef".foldLeft(up1)((s, h) =>
      s"regexp_replace($s, '%([0-9A-F])$h', '%\\1${h.toUpper}', 'g')")
    pctUnreservedDecodes.foldLeft(up2) { case (s, (esc, ch)) =>
      val lit = if (ch == "'") "''" else ch
      s"replace($s, '$esc', '$lit')"
    }
  }

  /** HOSTNAME of a CANONICAL url ([[canonicalizeUrl]] output — scheme and
    * host already lowercased): the authority up to the first `/ ? # :`.
    * This is the per-host grouping key for crawl-politeness caps
    * ([[Corpus.capPerGroup]]) and domain-mix stats — one codegen'd
    * regexp, '' when the input is not a URL, null on null. Stated
    * plainly: this is the FULL hostname, not the registrable eTLD+1
    * domain — a host-keyed cap on it is evadable by subdomain sharding
    * (`a1.spam.com`, `a2.spam.com`, …); key on [[registrableDomain]] of
    * this host when that evasion matters. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)

  /** Registrable eTLD+1 domain of a hostname — the subdomain-sharding-
    * proof grouping key for crawl caps and blocklists: `a1.spam.co.uk` /
    * `a2.spam.co.uk` both collapse to `spam.co.uk`, while
    * `alice.github.io` / `bob.github.io` stay DISTINCT (the hosting
    * suffix is public, each tenant its own site — the judgment a naive
    * last-two-labels key gets wrong in both directions). Exact PSL
    * algorithm (longest rule, wildcards, exceptions, implicit `*`
    * fallback) over the bundled [[graft.model.PublicSuffix]] snapshot as
    * a native codegen'd kernel ([[graft.expressions.UrlKernels]] — O(1)
    * static-set probes per label, zero shuffle); null when the host has
    * no registrable domain (empty/malformed, is itself a public suffix,
    * or an IPv4 literal). Requires [[graft.GraftExtensions.register]]. */
  def registrableDomain(host: Column): Column =
    call_function("registrable_domain", host)

  /** Lowercased ASCII-compatible (punycode) form of a hostname
    * ([[graft.expressions.UrlKernels.IdnAscii]] — in-JDK `java.net.IDN`,
    * zero dependencies): unicode and punycode spellings of one host
    * collapse to one key; hosts IDNA rejects fall back to lowercase.
    * Already applied inside [[canonicalizeUrl]]; exposed for callers
    * normalizing bare hosts (blocklist entries, log joins). Requires
    * [[graft.GraftExtensions.register]]. */
  def idnAsciiHost(host: Column): Column =
    call_function("idn_ascii", host)

  /**
   * HTML → text extraction (the CCNet/RefinedWeb ingest stage before any
   * quality or dedup pass): drops `<script>`/`<style>` blocks WITH their
   * content (code is not prose), strips every remaining tag, decodes
   * entities, and collapses whitespace runs. Block/tag strip and the
   * collapse are RE2 regexp chains (DuckDB-replayable verbatim); the
   * entity decode is the one-pass [[graft.expressions.HtmlKernels]]
   * kernel — six named entities PLUS bounded numeric character
   * references (`&#x27;`, `&#8217;`, `&#160;`, … — printable ASCII +
   * common punctuation; anything else survives verbatim), which real
   * crawl HTML is full of and which a named-only decoder would leave as
   * literal text poisoning dedup keys downstream. Single-pass decoding
   * keeps the `&amp;`-last law: `&amp;lt;` yields the literal `&lt;`
   * the author wrote, never `<`. The oracle replays the planted entity
   * spellings from the shared decode expectations; the kernel matrix is
   * unit-pinned in LlmOpsSpec. Malformed markup degrades gracefully: an
   * unclosed tag strips to its `>` or survives as text, never throws.
   * Requires [[graft.GraftExtensions.register]].
   */
  /** Byte-level ingest decode ([[graft.expressions.ByteKernels]]): strict
    * UTF-8, Windows-1252 fallback (sloppy variant — the five undefined
    * bytes decode to their C1 controls), and up to two rounds of
    * UTF-8-as-cp1252 mojibake repair (the ftfy dominant case) — the rung
    * BEFORE [[stripHtml]]/`text_normalize` when the source hands you raw
    * crawl bytes instead of trusted strings. One codegen'd pass; null in,
    * null out. Requires [[graft.GraftExtensions.register]]. */
  def textFromBytes(bytes: Column): Column =
    call_function("text_from_bytes", bytes)

  /** Exit-rung label of [[textFromBytes]]'s ladder (`empty`/`utf16`/
    * `utf8`/`utf8_repair`/a ladder charset name/`cp1252`) — the
    * decode-cost attribution a crawl operator groups by before trusting
    * (or tuning) the ladder. Requires
    * [[graft.GraftExtensions.register]]. */
  def textFromBytesRung(bytes: Column): Column =
    call_function("text_from_bytes_rung", bytes)

  /** [[textFromBytes]] honoring a DECLARED charset (an HTTP/HTML
    * Content-Type value or a bare charset name — e.g. the `mime` column
    * a [[graft.sources.Warc]] read surfaces): BOM > valid UTF-8 >
    * strict declared decode > the sniffing ladder. A declaration
    * reaches charsets sniffing never can (ISO-8859-2 decodes every
    * byte, so only the header picks it), and BOM-less UTF-16 becomes
    * decodable when declared. A null/absent declaration coalesces to
    * '' ≡ undeclared. Requires [[graft.GraftExtensions.register]]. */
  def textFromBytesDeclared(bytes: Column, declared: Column): Column =
    call_function("text_from_bytes_decl", bytes,
      coalesce(declared, lit("")))

  /** BLOCK-STRUCTURED HTML→text ([[graft.expressions.HtmlKernels.HtmlToText]]):
    * drops `script/style/head/nav/footer/aside` subtrees, emits a newline
    * at block-tag boundaries, decodes entities, collapses whitespace PER
    * LINE. This is the crawl-chain extraction rung — unlike [[stripHtml]]
    * (which collapses newlines too), its output keeps the line structure
    * the paragraph-dedup and boilerplate-removal tiers operate on, so
    * those stages do real work on raw-HTML feeds. Requires
    * [[graft.GraftExtensions.register]]. */
  def htmlToText(html: Column): Column =
    call_function("html_to_text", html)

  /** Document TITLE from raw HTML ([[graft.expressions.HtmlKernels.HtmlTitle]]):
    * first `<title>` before any `<body>`, entity-decoded, one collapsed
    * line; NULL when absent. The crawl-side feeder for the retrieval
    * tier's weighted title field ([[Retrieval]] BM25F) — [[htmlToText]]
    * rightly drops the whole `head` subtree, so without this kernel a
    * crawl corpus can never populate that field. Requires
    * [[graft.GraftExtensions.register]]. */
  def htmlTitle(html: Column): Column = call_function("html_title", html)

  /** PDF→text honest tier ([[graft.expressions.PdfKernels]]): Flate/raw
    * content streams, BT/ET text operators, WinAnsi string decode,
    * html_to_text's per-line collapse. NULL for non-PDF or encrypted
    * bytes; '' for a structurally valid but text-free document (a
    * scanned-image PDF). Requires [[graft.GraftExtensions.register]]. */
  def pdfText(bytes: Column): Column = call_function("pdf_text", bytes)

  /** JSON string-value harvest ([[graft.expressions.JsonKernels]]):
    * every string VALUE of one strictly-parsed document as its own
    * block line; NULL for malformed input, '' for valid-but-text-free.
    * Requires [[graft.GraftExtensions.register]]. */
  def jsonText(json: Column): Column = call_function("json_text", json)

  /** XML/RSS/Atom feed extraction ([[graft.expressions.HtmlKernels.XmlText]]):
    * the block law under the feed element vocabulary, CDATA content
    * through the html law. Requires [[graft.GraftExtensions.register]]. */
  def xmlText(xml: Column): Column = call_function("xml_text", xml)

  /** MIME-ROUTED crawl extraction (r17; json/xml rungs r18) — the one
    * rung between a WARC record `(content, mime)` and the crawl chain's
    * text column:
    *   - `application/pdf` → [[pdfText]] (NULL for encrypted/corrupt/
    *     unknowable — the caller's health ledger sees the refusal);
    *   - json mimes (`application/json`, `text/json`, `…+json`) →
    *     declared-charset byte decode then [[jsonText]] (string-value
    *     harvest; NULL for payloads that are not actually JSON);
    *   - xml/feed mimes (`text/xml`, `application/xml`, `…+xml` — RSS
    *     and Atom ship as `application/rss+xml`/`application/atom+xml`)
    *     → decode then [[xmlText]] (feed block law, CDATA handled) —
    *     EXCEPT `application/xhtml+xml`, which is an ordinary WEB PAGE
    *     serving mime, not a feed: it keeps the html route so its
    *     head/nav/footer chrome is dropped like any other page's;
    *   - everything else → decode then block-structured HTML extraction
    *     ([[htmlToText]] — a tag-free text/plain payload passes through
    *     with only the per-line collapse).
    * Every route emits the SAME line law, so the paragraph tiers
    * downstream treat HTML, PDF, JSON, and feed documents identically.
    * Requires [[graft.GraftExtensions.register]]. */
  def extractText(content: Column, mime: Column): Column = {
    val m = lower(coalesce(mime, lit("")))
    val mediaType = trim(substring_index(m, ";", 1))
    when(m.startsWith("application/pdf"), pdfText(content))
      .when(
        mediaType.isin("application/json", "text/json") ||
          mediaType.endsWith("+json"),
        jsonText(textFromBytesDeclared(content, mime)))
      .when(
        (mediaType.isin("text/xml", "application/xml") ||
          mediaType.endsWith("+xml")) &&
          mediaType =!= "application/xhtml+xml",
        xmlText(textFromBytesDeclared(content, mime)))
      .otherwise(htmlToText(textFromBytesDeclared(content, mime)))
  }

  /** FLAT strip — all whitespace (newlines included) collapses to single
    * spaces, so the output is one line. Right for short snippets and for
    * feeds whose line structure is meaningless; for the crawl chain use
    * [[htmlToText]], which preserves block boundaries for the paragraph
    * tiers. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    trim(regexp_replace(
      call_function("html_unescape", noTags), "\\s+", " "))
  }

  /** Rolling-hash document fingerprint: the minimum 32-bit hash over the
    * document's word shingles (winnowing's min-sampling step with a single
    * global window) — robust to local edits, cheap to compare at scale.
    *
    * NOTE: array lambdas are interpreted (no codegen); for corpus-scale use
    * prefer [[fingerprints]], which computes the same value via
    * explode + grouped min and stays fully codegen'd (measured ~8× faster). */
  def minShingleHash(text: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(text, n), s => hash32(s)))

  /**
   * Learns a BPE merge table from the corpus ([[Bpe]] semantics): one
   * distributed pass builds the word-frequency table — the working set of
   * every real tokenizer trainer, VOCABULARY-sized (≈10^5–10^6 rows) and
   * corpus-size-independent, which is why a 100 TB corpus still trains in
   * memory — then the merge loop runs driver-side over it. The collect is
   * guarded by `maxVocab`: a vocabulary above the cap fails loudly instead
   * of silently flooding the driver (same pattern as the upsert key-cap).
   */
  def learnBpeMerges(
      df: org.apache.spark.sql.DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1000000): Seq[(String, String)] = {
    // persisted: the guard count and the collect would otherwise each run
    // the full corpus tokenize+aggregate — the expensive step — once
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    try {
      val n = wc.count()
      require(n <= maxVocab,
        s"distinct-word vocabulary ($n) exceeds maxVocab=$maxVocab; " +
          "pre-filter the corpus or raise the cap")
      Bpe.learn(wc.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
    } finally wc.unpersist()
  }

  /** Per-document BPE subword sequence via the
    * [[graft.expressions.BpeEncode]] kernel — a pure per-row function
    * (zero shuffles) closing over a learned merge table. Requires
    * [[graft.GraftExtensions.registerBpe]] with the same merges first
    * (the merge table binds at registration; it is not SQL-literal). */
  def bpeEncode(tokens: Column): Column =
    call_function("bpe_encode", tokens)

  /**
   * Boilerplate line removal (the CCNet/RefinedWeb line-dedup pass):
   * documents split into `\n` lines; a line occurring in at least
   * `minDocFrac` of the documents sharing `groupCol` (site, source,
   * domain) is boilerplate — navigation, footers, cookie banners — and is
   * dropped from EVERY document of that group; the text is reassembled in
   * original line order. Matching is exact (no normalization — normalize
   * upstream if needed). Returns `(id, text)`, one row per input
   * document; a document whose every line is boilerplate keeps an empty
   * string.
   *
   * Scale shape: per-(group, line) doc-frequency is one hash-partitioned
   * aggregation; the boilerplate set (lines above the threshold) is tiny
   * relative to the corpus, so the anti-join broadcasts under AQE;
   * reassembly is a grouped collect whose state is bounded by document
   * size. No all-pairs anything, no driver collects.
   *
   * CACHE LIFETIME: the exploded lines are persisted (they feed both the
   * frequency aggregation and the reassembly) and stay cached until the
   * returned plan is garbage-collected and the ContextCleaner reclaims the
   * blocks — a long-lived session calling this per shard should act on
   * (write/collect) each result promptly rather than holding many plans.
   */
  def removeBoilerplate(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      groupCol: String, minDocFrac: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(minDocFrac > 0, "a zero threshold would drop every line of every document")
    // cached: referenced by both the boilerplate aggregation and the
    // reassembly anti-join — without it the corpus is split+exploded twice
    // (lazy persist; recomputable on executor loss; ContextCleaner-reclaimed)
    val lines = df.select(
      col(idCol).as("id"), col(groupCol).as("grp"),
      posexplode(split(col(textCol), "\n")).as(Seq("p", "line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grpDocs = df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(idCol)).as("grp_docs"))
    val boiler = lines.groupBy("grp", "line")
      .agg(countDistinct(col("id")).as("line_docs"))
      .join(grpDocs, "grp")
      .where(col("line_docs").cast("double") >= col("grp_docs") * minDocFrac)
      .select("grp", "line")
    val rebuilt = lines
      .join(boiler, Seq("grp", "line"), "left_anti")
      .groupBy("id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("p"), col("line")))),
          s => s.getField("line")),
        "\n").as("text"))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .na.fill("", Seq("text"))
  }

  /**
   * Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS
   * algorithm): hash every word `n`-shingle in position order, slide a
   * window of `w` consecutive hashes, keep each window's minimum; the
   * DISTINCT minima are the document's fingerprints — `(id, fp)` rows.
   *
   * The winnowing guarantee: any shared token run of length ≥ n + w - 1
   * contributes at least one shared fingerprint, which turns the
   * fingerprint equi-join into a partial-overlap/containment detector
   * (prefix copies, quotations, template reuse) that whole-document
   * Jaccard or MinHash misses — see [[Dedup.containment]]. Documents with
   * fewer than `n + w - 1` tokens degrade to their single global min
   * hash; documents with fewer than `n` tokens emit nothing.
   *
   * Aggregate formulation (posexplode + sliding window over id) — the
   * oracle-parity reference; it shuffles every shingle by document.
   * [[winnowNative]] computes the identical set per row with zero
   * shuffles — prefer it at corpus scale.
   */
  def winnow(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byId = Window.partitionBy("id")
    val sliding = Window.partitionBy("id").orderBy("p").rowsBetween(Window.currentRow, w - 1)
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
      .select(col("id"), posexplode(wordShinglesFromTokens(col("_toks"), n)).as(Seq("p", "sh")))
      .select(col("id"), col("p"), hash32(col("sh")).as("h"))
      .withColumn("m", count(lit(1)).over(byId))
      .withColumn("fp", min(col("h")).over(sliding))
      // complete windows only (0-based starts 0..m-w); a short document
      // (m < w) keeps its single degenerate window at p = 0
      .where(col("p") <= greatest(lit(0L), col("m") - w))
      .select("id", "fp").distinct()
  }

  /** [[winnow]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.WinnowFps]]) — same fingerprint set,
    * zero shuffles; the kernel emits each document's minima already
    * distinct, so the explode needs no dedup. Requires
    * [[graft.GraftExtensions.register]]. */
  def winnowNative(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): org.apache.spark.sql.DataFrame =
    df.select(
      col(idCol).as("id"),
      explode(call_function("winnow_fps", tokens(col(textCol)), lit(n), lit(w))).as("fp"))

  /**
   * Corpus fingerprints: `(id, fp, min_shingle_hash)` — normalized-content
   * md5 plus the min-shingle rolling hash, computed with codegen-friendly
   * explode/aggregate instead of per-element lambda interpretation.
   */
  def fingerprints(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"))
    val msh = explodedShingles(df, idCol, textCol, n)
      .groupBy("id")
      .agg(min(hash32(col("sh"))).as("min_shingle_hash"))
    base.join(msh, Seq("id"), "left")
  }

  /** [[fingerprints]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.MinShingleHash]]) — one projection,
    * no explode/shuffle/join; <n-token docs get a null min hash exactly
    * like the aggregate path's left join. Requires
    * [[graft.GraftExtensions.register]]. */
  def fingerprintsNative(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(
      col(idCol).as("id"),
      fingerprint(col(textCol)).as("fp"),
      call_function("min_shingle_hash", tokens(col(textCol)), lit(n))
        .as("min_shingle_hash"))

  /** [[repetitionSignals]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.RepetitionStats]]) — zero shuffles
    * instead of two grouped aggregates. Null-text documents are filtered
    * to match the aggregate path, whose `explode` drops them entirely
    * (the kernel would otherwise emit a null-field row for them).
    * Requires [[graft.GraftExtensions.register]]. */
  def repetitionSignalsNative(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.where(col(textCol).isNotNull)
      .select(
        col(idCol).as("id"),
        call_function("repetition_stats", tokens(col(textCol))).as("_r"))
      .select(
        col("id"),
        col("_r.n_tokens").as("n_tokens"),
        col("_r.top_token_frac").as("top_token_frac"),
        col("_r.dup_2gram_frac").as("dup_2gram_frac"))

  /** Number of tokens of `text` that appear in `words`. Prefer
    * [[markerHitsFromTokens]] with a materialized tokens column on hot paths
    * (same split-duplication pitfall as [[wordShingles]]). */
  def markerHits(text: Column, words: Seq[String]): Column =
    markerHitsFromTokens(tokens(text), words)

  def markerHitsFromTokens(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isin(words: _*)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Public knowledge (most-frequent function words). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /**
   * Language-ID heuristic: count stopword hits per candidate language, pick
   * the argmax (ties → language code ascending), `und` when no marker hits.
   * A real pipeline would use character n-gram profiles; the operator shape
   * (per-language score columns → greatest/argmax) is the same.
   */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** [[langId]] over a materialized tokens column (hot-path variant). */
  def langIdFromTokens(ts: Column): Column = {
    val scored = langMarkers.map { case (lang, words) =>
      struct(markerHitsFromTokens(ts, words).as("hits"), lit(lang).as("lang"))
    }
    // argmax by (hits desc, lang asc): array_max over (hits, reverse-lex lang)
    // is wrong for strings, so sort structs by (-hits, lang) and take the head.
    val best = element_at(
      array_sort(
        array(scored: _*),
        (l, r) =>
          when(l.getField("hits") > r.getField("hits"), -1)
            .when(l.getField("hits") < r.getField("hits"), 1)
            .when(l.getField("lang") < r.getField("lang"), -1)
            .when(l.getField("lang") > r.getField("lang"), 1)
            .otherwise(0)),
      1)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /**
   * Corpus-wide top-k word n-grams by occurrence count (ties → gram
   * ascending) — the vocabulary/statistics extraction pass of LM corpus
   * prep. One explode + one grouped count (map-side partial) + a global
   * top-k (`TakeOrdered`, never a full sort of the gram table).
   */
  def topNgrams(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int = 2, k: Int = 20): org.apache.spark.sql.DataFrame =
    df.select(tokens(col(textCol)).as("_toks"))
      .select(explode(wordShinglesFromTokens(col("_toks"), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)

  /**
   * Corpus-wide collocations by pointwise mutual information: adjacent
   * token pairs occurring at least `minCount` times, ranked by
   * `pmi = ln( P(w1 w2) / (P(w1)·P(w2)) )` — the classic measure of "these
   * two words co-occur far more than chance", surfacing multi-word
   * entities and frozen phrases that frequency ranking ([[topNgrams]])
   * buries under stopword pairs. `P(w1 w2)` is the pair's share of all
   * adjacent pairs; `P(w)` a token's share of all tokens.
   *
   * Shape at scale: the corpus is tokenized exactly TWICE — once into the
   * vocabulary-sized unigram count table, once into the bigram-vocabulary
   * pair count table — and both are materialized (`localCheckpoint`, the
   * [[graft.ops.Events.retention]] discipline) because each feeds two
   * consumers (its broadcast total and the join/filter); without the cut
   * Spark re-runs the corpus scan for every consumer. The pair table is
   * cut to `pair_cnt ≥ minCount` BEFORE any join, joins the unigram table
   * twice (AQE broadcasts it), the totals ride in as one-row broadcast
   * cross joins, and the top-k is a `TakeOrdered`, never a global sort.
   *
   * The PMI value is rounded to 6 dp INSIDE the operator and ties break on
   * `(w1, w2)`: the ranking must be reproducible across engines, and a
   * 1-ulp `ln` discrepancy (libm is not bit-standardized) on unrounded
   * scores could otherwise reorder the cut boundary.
   */
  def pmiCollocations(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 5, k: Int = 20): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k > 0, s"k must be positive, got $k")
    val toks = df.where(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("_toks"))
    val uni = toks.select(explode(col("_toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val uniTot = uni.agg(sum("cnt").cast("double").as("_u"))
    val pairsAll = toks.select(explode(
        when(size(col("_toks")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(col("_toks")) - 1),
            i => struct(
              element_at(col("_toks"), i).as("w1"),
              element_at(col("_toks"), i + 1).as("w2"))))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_cnt"))
      .localCheckpoint()
    // total adjacent pairs = Σ pair_cnt over the UNfiltered table — read
    // from the materialized counts, never a third corpus pass
    val pairTot = pairsAll.agg(sum("pair_cnt").cast("double").as("_b"))
    val pairs = pairsAll.where(col("pair_cnt") >= minCount)
    val u1 = uni.select(col("t").as("w1"), col("cnt").as("_c1"))
    val u2 = uni.select(col("t").as("w2"), col("cnt").as("_c2"))
    pairs.join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(uniTot)).crossJoin(broadcast(pairTot))
      .select(
        col("w1"), col("w2"), col("pair_cnt"),
        round(
          log((col("pair_cnt").cast("double") / col("_b")) /
            ((col("_c1").cast("double") / col("_u")) *
              (col("_c2").cast("double") / col("_u")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /**
   * Document frequency: for each token, the number of DISTINCT documents
   * containing it — the substrate of IDF weighting and stopword discovery.
   * Top-k by `(df desc, token asc)`. The IDF itself (`ln(N/df)`) is left to
   * the caller: transcendental functions are not bit-identical across
   * engines, integer document counts are.
   */
  def docFrequency(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int = 20): org.apache.spark.sql.DataFrame =
    df.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)

  /**
   * Per-document distinctive keywords: each document's `k` tokens ranked
   * rarest-in-the-corpus first (document frequency asc), then most frequent
   * locally (term frequency desc), then lexicographically — TF-IDF's
   * ordering WITHOUT the logarithm, so every ranking key is an integer and
   * the result is bit-identical on any engine (transcendental functions are
   * not; see [[docFrequency]]). Stopwords fall out naturally: their df is
   * the corpus size, ranking them last.
   *
   * One tokenize pass feeds both aggregates; the token-keyed df table joins
   * back on the token key (vocabulary-sized — AQE broadcasts it when small)
   * and the final top-k is a doc-partitioned `WindowGroupLimit`, never a
   * global sort.
   */
  def distinctiveTokens(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy("token").agg(count_distinct(col("id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("df").asc, col("tf").desc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id").as(idCol), col("token"), col("tf"), col("df"), col("rank"))
  }

  /**
   * Vocabulary coverage: learns the corpus's top-`vocabSize` tokens (by
   * total term count, ties broken lexicographically) and scores every
   * document's out-of-vocabulary rate against it —
   * `(id, n_tokens, n_oov, oov_frac)`. A high OOV fraction marks boilerplate
   * codes, exotic scripts, or mojibake that a fixed tokenizer vocabulary
   * would shred into bytes; it is the standard cheap proxy for "how well
   * will the tokenizer compress this document".
   *
   * Shape at scale: one tokenize+aggregate pass learns the vocabulary
   * (token-count table, partial-aggregated; `TakeOrdered` for the top-k —
   * never a full sort), which is vocabulary-sized and BROADCAST back over a
   * second tokenize pass — the corpus is scanned twice but never shuffled
   * by token for scoring, and per-doc counts aggregate on the id key.
   * All counts are integers; the single float division per document is
   * exact on both engines.
   */
  def vocabCoverage(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.where(col(textCol).isNotNull)
        .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val vocab = toks(df)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token"), lit(1L).as("_in_vocab"))
    toks(df)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** [[langId]] via the native per-row kernel
    * ([[graft.expressions.DocKernels.LangId]]) — same argmax, no
    * interpreted per-language filter lambdas or sort comparator. Requires
    * [[graft.GraftExtensions.register]]. */
  def langIdNative(tokens: Column): Column = call_function("lang_id", tokens)

  /** Character-n-gram language ID (Cavnar–Trenkle rank profiles over the
    * bundled [[graft.model.LangProfiles]] snapshot — every snapshot
    * language, including ru/ja/ar/zh/ko/hi/uk/el/he/th/bg, the non-Latin coverage [[langId]]'s
    * stopword-marker tier lacks; that tier stays available as the cheap
    * 5-language fallback). One codegen'd pass per document
    * ([[graft.expressions.DocKernels.LangIdNgram]] — deterministic
    * integer rank distances); `und` for trigram-less text AND for
    * documents whose best distance fails the per-language rejection
    * cutoff — open-domain crawl data is mostly languages no profile
    * knows, and an honest unknown beats a confident wrong label in a
    * curation gate. Profiles + cutoffs regenerate from
    * `tools/gen_lang_profiles.py` (seed corpus and cutoff calibration
    * documented there — swap in larger seeds for production-grade
    * accuracy, the algorithm is unchanged). Requires
    * [[graft.GraftExtensions.register]]. */
  def langIdNgram(text: Column): Column = call_function("lang_id_ngram", text)

  /** Scored twin of [[langIdNgram]]: struct `(lang, best_lang, best_dist,
    * second_dist, max_dist)` — post-rejection label plus the raw argmin
    * and exact integer distances, so calibration (e.g.
    * `1 - best_dist/max_dist` confidence against a label column through
    * [[Profile.calibrationReport]]) and margin auditing need no second
    * classification pass. Requires [[graft.GraftExtensions.register]]. */
  def langIdNgramScored(text: Column): Column =
    call_function("lang_id_ngram_scored", text)

  /** Stopwords used by the quality score (union of the English markers). */
  val qualityStopwords: Seq[String] = langMarkers.head._2

  /**
   * Repetition signals (the Gopher-rules style filters for generated/spammy
   * text): `(id, n_tokens, top_token_frac, dup_2gram_frac)` where
   * `top_token_frac` is the most frequent token's share of the document and
   * `dup_2gram_frac` the fraction of word bigrams that are repeats
   * (`1 - distinct/total`). Documents with fewer than 2 tokens get a null
   * `dup_2gram_frac`.
   *
   * Shape: explode + two grouped aggregates — fully codegen'd, partial
   * aggregation map-side, no windows, no lambdas on the hot path.
   */
  def repetitionSignals(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
    val top = toks.select(col("id"), explode(col("_toks")).as("tok"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("_n"), max(col("c")).as("_top"))
      .select(
        col("id"),
        col("_n").cast("long").as("n_tokens"),
        (col("_top").cast("double") / col("_n")).as("top_token_frac"))
    val grams = toks
      .select(col("id"), explode(wordShinglesFromTokens(col("_toks"), 2)).as("g"))
      .groupBy("id")
      .agg(count(lit(1)).as("_total"), countDistinct(col("g")).as("_dist"))
      .select(
        col("id"),
        ((col("_total") - col("_dist")).cast("double") / col("_total")).as("dup_2gram_frac"))
    top.join(grams, Seq("id"), "left")
  }

  /**
   * Document quality signals: length, token count, average word length,
   * stopword ratio — the standard cheap filters for pretraining corpora.
   * All divisions are single double ops (deterministic); callers threshold
   * on the components.
   */
  def qualitySignals(text: Column): Seq[Column] = qualitySignalsFromTokens(text, tokens(text))

  /** [[qualitySignals]] over a materialized tokens column (hot-path variant). */
  def qualitySignalsFromTokens(text: Column, ts: Column): Seq[Column] =
    Seq(
      length(text).as("n_chars"),
      size(ts).as("n_tokens"),
      avgWordLen(text, ts).as("avg_word_len"),
      stopwordRatio(ts).as("stopword_ratio"))

  /** Mean word length given single-space-separated tokens: chars minus
    * separators, per token. Shared by [[qualitySignalsFromTokens]] and
    * [[curationGate]] so the two can never desynchronize. */
  private[ops] def avgWordLen(text: Column, ts: Column): Column =
    (length(text) - (size(ts) - 1)).cast("double") / size(ts)

  /** Fraction of tokens that are quality stopwords (same sharing contract
    * as [[avgWordLen]]). */
  private[ops] def stopwordRatio(ts: Column): Column =
    markerHitsFromTokens(ts, qualityStopwords).cast("double") / size(ts)

  /** Deflate compression ratio of the text's UTF-8 bytes — the
    * C4/Gopher long-range-redundancy signal the token-level repetition
    * stats cannot see ([[graft.expressions.ZipKernels]]: level 6, raw
    * stream, deterministic; empty → 1.0). Threshold with margin — gate
    * on "< 0.25", not an exact count. Requires
    * [[graft.GraftExtensions.register]]. */
  def deflateRatio(text: Column): Column = call_function("deflate_ratio", text)

  /** Thresholds for [[curationGate]]. Defaults are permissive; set only the
    * rules a corpus needs. `allowedLangs = Nil` disables the language rule;
    * `minDeflateRatio = 0` disables the long-range-redundancy rule. */
  final case class CurationRules(
      minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
      minAvgWordLen: Double = 0.0, maxAvgWordLen: Double = Double.MaxValue,
      minStopwordRatio: Double = 0.0,
      maxTopTokenFrac: Double = 1.0, maxDupBigramFrac: Double = 1.0,
      allowedLangs: Seq[String] = Nil,
      minDeflateRatio: Double = 0.0)

  /**
   * Composite curation gate — the full cheap-filter stack (length, word
   * shape, stopword density, repetition, optional language) evaluated in
   * ONE per-document pass, emitting `(id, keep, reasons)` where `reasons`
   * is the comma-joined list of every failed rule in fixed order (empty
   * when kept). Keeping ALL failure reasons (not just the first) is what
   * makes corpus-curation dashboards actionable: "35% dropped for
   * repetition, 12% for length" needs every verdict.
   *
   * Zero shuffles: tokens are materialized once per row, repetition stats
   * come from the `repetition_stats` kernel (requires
   * [[graft.GraftExtensions.register]]), and the reason string is a
   * codegen'd `concat_ws` over per-rule `when`s — no interpreted lambdas,
   * no joins between signal passes. Null-text rows are dropped (matching
   * the `*Native` convention).
   */
  def curationGate(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      rules: CurationRules): org.apache.spark.sql.DataFrame = {
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("_text"), tokens(col(textCol)).as("_toks"))
      .withColumn("_r", call_function("repetition_stats", col("_toks")))
    val nToks = size(col("_toks"))
    val wordLen = avgWordLen(col("_text"), col("_toks"))
    val stopRatio = stopwordRatio(col("_toks"))
    val checks: Seq[(String, Column)] = Seq(
      "too_few_tokens" -> (nToks < rules.minTokens),
      "too_many_tokens" -> (nToks > rules.maxTokens),
      "avg_word_len" ->
        (wordLen < rules.minAvgWordLen || wordLen > rules.maxAvgWordLen),
      "stopword_ratio" -> (stopRatio < rules.minStopwordRatio),
      "top_token_frac" -> (col("_r.top_token_frac") > rules.maxTopTokenFrac),
      "dup_2gram_frac" ->
        (coalesce(col("_r.dup_2gram_frac"), lit(0.0)) > rules.maxDupBigramFrac)) ++
      (if (rules.allowedLangs.nonEmpty)
        Seq("lang" -> !langIdFromTokens(col("_toks")).isin(rules.allowedLangs: _*))
      else Nil) ++
      // page-scale boilerplate compresses to almost nothing while its
      // token stats look normal — the deflate rung only pays when set
      (if (rules.minDeflateRatio > 0.0)
        Seq("deflate_ratio" ->
          (deflateRatio(col("_text")) < rules.minDeflateRatio))
      else Nil)
    // concat_ws skips nulls → the reason list is exactly the failed rules
    val reasons = concat_ws(",",
      checks.map { case (name, cond) => when(cond, lit(name)) }: _*)
    base
      .withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
      .select(col(idCol), col("keep"), col("reasons"))
  }

  /**
   * Context-window chunking: splits each document into overlapping
   * fixed-token-budget chunks — the step every training pipeline runs
   * between curation and packing, because documents longer than the model's
   * context must be cut and a cut mid-thought loses the boundary tokens
   * unless consecutive chunks overlap.
   *
   * Chunk i covers tokens `[i·stride, i·stride + chunkTokens)` with
   * `stride = chunkTokens − overlap`; the last chunk starts at the final
   * stride position that still holds unseen tokens, so every token appears
   * in ≥ 1 chunk and no two chunks are identical. A document shorter than
   * `chunkTokens` yields itself as chunk 0. Null-text documents drop (same
   * convention as the other tokenizing ops).
   *
   * Output: `(idCol, chunk_no, chunk_text, n_tokens)` — `chunk_no` is
   * 0-based and dense. Purely per-document: one projection + one explode,
   * NO shuffle (plan: Scan → Project → Generate), so it streams at scan
   * speed over 100 TB.
   */
  def chunkDocuments(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val ts = tokens(col(textCol))
    // number of chunks = 1 + ceil(max(0, n - chunkTokens) / stride)
    val n = size(ts)
    val nChunks = lit(1) +
      ceil((greatest(n - chunkTokens, lit(0))).cast("double") / stride).cast("int")
    df.where(col(textCol).isNotNull)
      .select(col(idCol), ts.as("_ts"), nChunks.as("_nc"))
      .select(col(idCol), col("_ts"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_no"))
      .select(
        col(idCol),
        col("chunk_no"),
        array_join(slice(col("_ts"), col("chunk_no") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(size(col("_ts")) - col("chunk_no") * stride, lit(chunkTokens))
          .as("n_tokens"))
  }

  /**
   * Per-document perplexity under an add-one-smoothed unigram language model
   * learned from `lmCorpus` — the classic CCNet-style quality signal
   * (documents far from the training distribution score high). With the LM
   * trained on clean text and scored over a crawl, high-perplexity documents
   * are gibberish/boilerplate candidates; `lmCorpus` defaults to `df` itself
   * (self-scored corpus profiling).
   *
   * Model: p(tok) = (count(tok) + 1) / (T + V + 1) where T = total LM
   * tokens, V = distinct LM tokens; unseen tokens take count 0. Output per
   * document: token count, average negative log-likelihood (nats, rounded
   * to 4 dp), and perplexity exp(avgNll) (rounded to 2 dp). Rounding makes
   * the doubles stable across engines and aggregation orders (ln/exp are
   * within-ulp across libms; partial-sum order perturbs ~1e-14 relative —
   * both far below the rounding grain).
   *
   * Scale shape: the LM is a token-level two-stage aggregate; scoring is an
   * equi-join on token (AQE broadcasts when the vocabulary is small) plus
   * one per-doc aggregate. The (T, V) totals ride a broadcast cross-join of
   * a one-row frame — no scalar ever collects to the driver. Docs with null
   * text have no tokens and drop from the output (same convention as
   * [[vocabCoverage]]).
   */
  def unigramPerplexity(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      lmCorpus: org.apache.spark.sql.DataFrame = null): org.apache.spark.sql.DataFrame = {
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.where(col(textCol).isNotNull)
        .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val lm = toks(Option(lmCorpus).getOrElse(df))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = lm.agg(
      sum(col("cnt")).as("_t"), count(lit(1)).as("_v"))
    toks(df)
      .join(lm, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_lp",
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("_t") + col("_v") + lit(1L)).cast("double")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(col("_lp")), 4).as("avg_nll"),
        round(exp(-avg(col("_lp"))), 2).as("ppl"))
  }

  /**
   * Per-document Shannon entropy of the token distribution (nats, rounded
   * to 4 dp): H = −Σ (c/n)·ln(c/n) over the document's own token counts.
   * The distribution-wide repetitiveness signal — a doc stuck on a few
   * tokens scores near 0, diverse text near ln(n_distinct) — complementing
   * [[repetitionSignals]]' top-token/bigram point measures. One exploded
   * two-stage aggregate per corpus pass, per-doc math on exact integer
   * counts.
   */
  def tokenEntropy(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("_c")).as("n_tokens"),
        sum(col("_c").cast("double") * log(col("_c").cast("double"))).as("_sclogc"))
      // H = ln(n) − (Σ c·ln c)/n; 4-dp rounding absorbs partial-sum order
      // and within-ulp libm differences (same analysis as the perplexity ops)
      .select(
        col(idCol),
        col("n_tokens"),
        round(log(col("n_tokens").cast("double")) - col("_sclogc") / col("n_tokens"), 4)
          .as("entropy"))

  /**
   * CCNet-style perplexity bucketing: scores every document with the
   * add-one unigram LM ([[unigramPerplexity]]) and labels it `head` /
   * `middle` / `tail` by the corpus-level perplexity tertiles — the
   * published recipe (Wenzek et al. 2020) keeps `head` (closest to the LM's
   * training distribution), samples `middle`, and drops `tail`.
   *
   * The tertile edges are exact interpolated percentiles computed by ONE
   * tiny global aggregate broadcast back over the scored frame (the
   * [[graft.ops.Corpus.filterByQuantileRange]] shape) — the corpus is never
   * globally sorted. Cut points use `<=` on the 2-dp-rounded ppl, so the
   * labeling is reproducible across engines.
   */
  def perplexityBuckets(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      lo: Double = 1.0 / 3, hi: Double = 2.0 / 3,
      lmCorpus: org.apache.spark.sql.DataFrame = null): org.apache.spark.sql.DataFrame = {
    require(0 < lo && lo < hi && hi < 1, s"need 0 < lo < hi < 1, got [$lo, $hi]")
    val ppl = unigramPerplexity(df, idCol, textCol, lmCorpus)
    val edges = ppl.agg(
      expr(s"percentile(ppl, $lo)").as("_q_lo"),
      expr(s"percentile(ppl, $hi)").as("_q_hi"))
    ppl.join(broadcast(edges))
      .select(col(idCol), col("n_tokens"), col("ppl"),
        when(col("ppl") <= col("_q_lo"), "head")
          .when(col("ppl") <= col("_q_hi"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /**
   * Per-document perplexity under an add-one-smoothed BIGRAM language model
   * — one LM order up from [[unigramPerplexity]], the strongest n-gram
   * signal expressible with exact cross-engine parity. The first token is
   * scored by the unigram model, every later token by its conditional:
   * p(w|u) = (c(u w) + 1) / (c(u) + V + 1), unseen counts 0.
   *
   * Scale shape: bigrams ride the existing 2-shingle machinery (per-row
   * lambda, no shuffle to FORM them); the LM is two token/shingle-level
   * two-stage aggregates; scoring is two equi-joins (AQE broadcasts small
   * vocabularies) plus one per-doc aggregate. Totals broadcast as a one-row
   * cross join — no collect. Same output schema and rounding as the
   * unigram form.
   */
  def bigramPerplexity(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      lmCorpus: org.apache.spark.sql.DataFrame = null): org.apache.spark.sql.DataFrame = {
    val lmDf = Option(lmCorpus).getOrElse(df)
    def withToks(d: org.apache.spark.sql.DataFrame) =
      d.where(col(textCol).isNotNull)
        .select(col(idCol), tokens(col(textCol)).as("_ts"))
    val uni = withToks(lmDf)
      .select(explode(col("_ts")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("_c1"))
    val totals = uni.agg(sum(col("_c1")).as("_t"), count(lit(1)).as("_v"))
    val biCnt = withToks(lmDf)
      .select(explode(wordShinglesFromTokens(col("_ts"), 2)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("_c2"))

    val t = withToks(df)
    val first = t
      .select(col(idCol), element_at(col("_ts"), 1).as("token"))
      .join(uni, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        log((coalesce(col("_c1"), lit(0L)) + lit(1L)).cast("double") /
          (col("_t") + col("_v") + lit(1L)).cast("double")).as("_lp"))
    val rest = t
      .select(col(idCol), explode(wordShinglesFromTokens(col("_ts"), 2)).as("sh"))
      // tokens are space-split, so the shingle's first space is exact
      .withColumn("token", substring_index(col("sh"), " ", 1))
      .join(biCnt, Seq("sh"), "left")
      .join(uni, Seq("token"), "left") // c1 of the CONDITIONING token
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        log((coalesce(col("_c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("_c1"), lit(0L)) + col("_v") + lit(1L)).cast("double")).as("_lp"))
    first.unionByName(rest)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(col("_lp")), 4).as("avg_nll"),
        round(exp(-avg(col("_lp"))), 2).as("ppl"))
  }

  // ---------------------------------------------------------------------
  // Trainable hashed Naive Bayes — the learned domain/quality classifier
  // stage of the curation stack (CCNet trains a fastText LM/classifier to
  // score crawl text against a target corpus; multinomial NB over hashed
  // token features is the same shape trainable in two aggregate passes
  // with no gradient loop). Features are HASHED into a fixed bucket space
  // (md5-derived, engine-replayable), so the model size is bounded by
  // labels × numBuckets regardless of corpus vocabulary — the 100 TB
  // contract — and smoothing uses the constant bucket count as the vocab
  // term, keeping scores independent of discovery order.
  // ---------------------------------------------------------------------

  /** Hashed feature bucket of a token (own `nb::` domain — independent of
    * the sampling/split hash families, see [[graft.ops.Corpus.hashBucket]]). */
  def nbBucket(token: Column, numBuckets: Int): Column =
    hash32(concat(lit("nb::"), token)) % numBuckets

  /** A trained NB model: `counts` = (label, bucket, cnt) hashed-token
    * counts (≤ labels × numBuckets rows by construction); `labelStats` =
    * (label, n_docs, n_tokens) for priors and smoothing denominators. */
  case class NbModel(counts: org.apache.spark.sql.DataFrame,
                     labelStats: org.apache.spark.sql.DataFrame,
                     numBuckets: Int)

  /**
   * Trains multinomial NB from labeled `(labelCol, textCol)` rows: one
   * exploded aggregate for per-(label, bucket) token counts, one row-level
   * aggregate for per-label doc/token totals. Null labels/text are
   * excluded. Both model frames are plain DataFrames — persist them with
   * any sink and serve with [[nbPredict]].
   */
  def nbTrain(
      df: org.apache.spark.sql.DataFrame, labelCol: String, textCol: String,
      numBuckets: Int = 1 << 18): NbModel = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val base = df.where(col(labelCol).isNotNull && col(textCol).isNotNull)
    val counts = base
      .select(col(labelCol).as("label"), explode(tokens(col(textCol))).as("token"))
      .select(col("label"), nbBucket(col("token"), numBuckets).as("bucket"))
      .groupBy("label", "bucket").agg(count(lit(1)).as("cnt"))
    val stats = base.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .join(counts.groupBy("label").agg(sum(col("cnt")).as("n_tokens")),
        Seq("label"), "left")
      .na.fill(0L, Seq("n_tokens"))
    NbModel(counts, stats, numBuckets)
  }

  /**
   * Per-batch NB model frame for a [[SketchLedger]] — NB's sufficient
   * statistics are pure counts, so the model folds by ADDITION exactly
   * like the moments ledger: train on each ingested batch, append the
   * frame, and [[nbFromFrames]] over the ledger read equals
   * [[nbTrain]] on the whole corpus bit for bit, with no batch ever
   * rescanned. Token rows carry `(label, bucket, cnt, docs=0)`; one
   * `bucket = -1` row per label carries the doc count; `buckets` rides
   * every row so a mixed-shape fold fails loud (the moment-frame
   * dims/scale discipline).
   */
  def nbFrame(
      df: org.apache.spark.sql.DataFrame, labelCol: String, textCol: String,
      numBuckets: Int = 1 << 18): org.apache.spark.sql.DataFrame = {
    val m = nbTrain(df, labelCol, textCol, numBuckets)
    m.counts.select(col("label"), col("bucket"), col("cnt"), lit(0L).as("docs"))
      .unionByName(m.labelStats.select(col("label"), lit(-1L).as("bucket"),
        lit(0L).as("cnt"), col("n_docs").as("docs")))
      .withColumn("buckets", lit(numBuckets))
  }

  /** Rebuilds the [[NbModel]] from unioned ledger frames (see
    * [[nbFrame]]): one additive fold, then the two model frames split
    * back out. The incremental-retrain entry point. */
  def nbFromFrames(frames: org.apache.spark.sql.DataFrame): NbModel = {
    val bs = frames.select(col("buckets")).distinct().collect().map(_.getInt(0))
    require(bs.length == 1,
      s"mixed bucket counts in NB ledger: ${bs.sorted.mkString(", ")}")
    val folded = frames.groupBy("label", "bucket")
      .agg(sum(col("cnt")).as("cnt"), sum(col("docs")).as("docs"))
    val counts = folded.where(col("bucket") >= 0).select("label", "bucket", "cnt")
    val stats = folded.groupBy("label").agg(
      sum(col("docs")).as("n_docs"),
      sum(when(col("bucket") >= 0, col("cnt")).otherwise(0L)).as("n_tokens"))
    NbModel(counts, stats, bs(0))
  }

  /**
   * Predicts the max-posterior label per document:
   * `score(d, l) = Σ_matched ln(cnt+1) − n_d · ln(n_tokens_l + B) +
   * ln(n_docs_l / N)` — the add-one multinomial log-posterior rearranged so
   * unmatched buckets (ln(0+1) = 0) never need a row, which keeps the
   * token-side join INNER on bucket and the per-(doc, label) frame at
   * matched size. Scores are rounded to 4 dp before the argmax (absorbs
   * partial-sum order and within-ulp libm differences, the
   * [[unigramPerplexity]] analysis); ties break on label ascending.
   * Returns `(idCol, pred, score)`.
   */
  def nbPredict(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      model: NbModel): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("label").asc)
    nbScores(df, idCol, textCol, model)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col(idCol), col("label").as("pred"), col("score"))
  }

  /** The full per-(document, label) posterior-score frame behind
    * [[nbPredict]] — `(idCol, label, score)`, scores 4-dp-rounded exactly
    * as the argmax sees them. Exposed for margin/calibration analysis. */
  def nbScores(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      model: NbModel): org.apache.spark.sql.DataFrame = {
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("token"))
      .select(col("_id"), nbBucket(col("token"), model.numBuckets).as("bucket"))
    val docLen = toks.groupBy("_id").agg(count(lit(1)).as("_n"))
    val matched = toks.join(model.counts, Seq("bucket"))
      .groupBy("_id", "label")
      .agg(sum(log(col("cnt").cast("double") + lit(1.0))).as("_m"))
    val totalDocs = model.labelStats.agg(sum(col("n_docs")).as("_nd"))
    docLen
      .crossJoin(broadcast(model.labelStats))
      .join(matched, Seq("_id", "label"), "left")
      .crossJoin(broadcast(totalDocs))
      .select(col("_id").as(idCol), col("label"),
        round(
          coalesce(col("_m"), lit(0.0))
            - col("_n").cast("double") *
              log(col("n_tokens").cast("double") + lit(model.numBuckets.toDouble))
            + log(col("n_docs").cast("double") / col("_nd").cast("double")),
          4).as("score"))
  }

  /**
   * Margin-based reliability report for the NB classifier: held-out
   * documents bucketed by the TOP-vs-RUNNER-UP score margin (the
   * confidence proxy that stays engine-exact — a subtraction of already-
   * 4-dp-rounded doubles, where a softmax's `exp` would hang correctness
   * on libm rounding), with per-bucket volume and accuracy. The curation
   * question it answers: above which confidence band can the classifier's
   * label gate documents unreviewed? `bucket = least(floor(margin), cap)`;
   * a document with a single-label model (no runner-up) lands in the top
   * bucket by the shared least-ignores-null rule. Returns
   * `(bucket, n, n_correct)`.
   */
  def nbMarginReliability(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      labelCol: String, model: NbModel, cap: Int = 9): org.apache.spark.sql.DataFrame = {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("label").asc)
    val tops = nbScores(df, idCol, textCol, model)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") <= 2)
      .groupBy(idCol)
      .agg(
        max(when(col("_rn") === 1, col("score"))).as("_s1"),
        max(when(col("_rn") === 1, col("label"))).as("pred"),
        max(when(col("_rn") === 2, col("score"))).as("_s2"))
    tops
      .join(df.select(col(idCol), col(labelCol).as("_truth")), Seq(idCol))
      .select(
        least(floor(col("_s1") - col("_s2")), lit(cap.toLong)).as("bucket"),
        when(col("pred") === col("_truth"), 1L).otherwise(0L).as("_ok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("_ok")).as("n_correct"))
  }
}
