package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{AudioKernels, DocKernels, ImageKernels, MinhashSigs, QuantizedArgBest, QuantizedDot}

/**
 * Session extensions for the graft engine: registers the native expressions
 * ([[graft.expressions.QuantizedDot]], [[graft.expressions.MinhashSigs]],
 * and the per-document kernels in [[graft.expressions.DocKernels]]).
 *
 * Install either at build time —
 * `SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `--conf spark.sql.extensions=graft.GraftExtensions` — or at runtime on an
 * existing session with [[GraftExtensions.register]] (idempotent), which is
 * what the driver-contract query entry points do.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  /** A wrong-arity SQL call must surface as a descriptive error, not an
    * IndexOutOfBoundsException from a positional `c(i)` access. */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    c => {
      if (c.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${c.length}")
      build(c)
    }

  private val functions: Seq[
      (String, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)] = Seq(
    ("quantized_dot", QuantizedDot.info,
      arity("quantized_dot", 2)(c => QuantizedDot(c(0), c(1)))),
    ("quantized_argbest", QuantizedArgBest.info,
      arity("quantized_argbest", 3)(c => QuantizedArgBest(c(0), c(1), c(2)))),
    ("quantized_residual", graft.expressions.QuantizedResidual.residualInfo,
      arity("quantized_residual", 3)(c =>
        graft.expressions.QuantizedResidualExpr(c(0), c(1), c(2)))),
    ("quantized_argbest_res", graft.expressions.QuantizedResidual.argBestResInfo,
      arity("quantized_argbest_res", 4)(c =>
        graft.expressions.QuantizedArgBestRes(c(0), c(1), c(2), c(3)))),
    ("zorder_key", graft.expressions.ZOrder.info,
      arity("zorder_key", 4)(c => graft.expressions.ZOrderKey(c(0), c(1), c(2), c(3)))),
    ("freq_items", graft.expressions.FreqSketch.info,
      arity("freq_items", 2)(c => graft.expressions.FreqSketch.FreqItems(
        c(0), intLit(c(1), "freq_items", "k")))),
    ("cms_sketch", graft.expressions.CmsSketch.info,
      arity("cms_sketch", 3)(c => graft.expressions.CmsSketch.Cms(
        c(0),
        intLit(c(1), "cms_sketch", "d"),
        intLit(c(2), "cms_sketch", "w")))),
    ("moment_matrix", graft.expressions.MomentMatrix.info,
      arity("moment_matrix", 3)(c => graft.expressions.MomentMatrix.MomentAgg(
        c(0),
        intLit(c(1), "moment_matrix", "dims"),
        intLit(c(2), "moment_matrix", "scale").toLong))),
    ("pca_project", graft.expressions.PcaProject.info,
      arity("pca_project", 4)(c => graft.expressions.PcaProjectExpr(
        c(0), c(1), c(2), c(3)))),
    ("vec_sum", graft.expressions.MomentMatrix.vecSumInfo,
      arity("vec_sum", 3)(c => graft.expressions.MomentMatrix.VecSumAgg(
        c(0),
        intLit(c(1), "vec_sum", "dims"),
        intLit(c(2), "vec_sum", "scale").toLong))),
    ("synth_image", ImageKernels.synthInfo,
      arity("synth_image", 1)(c => ImageKernels.SynthImage(c(0)))),
    ("image_decode", ImageKernels.decodeInfo,
      arity("image_decode", 1)(c => ImageKernels.ImageDecode(c(0)))),
    ("image_ahash", ImageKernels.aHashInfo,
      arity("image_ahash", 1)(c => ImageKernels.ImageAHash(c(0)))),
    ("image_resize", ImageKernels.resizeInfo,
      arity("image_resize", 3)(c => ImageKernels.ImageResize(
        c(0),
        intLit(c(1), "image_resize", "tw"),
        intLit(c(2), "image_resize", "th")))),
    ("synth_wav", AudioKernels.synthInfo,
      arity("synth_wav", 1)(c => AudioKernels.SynthWav(c(0)))),
    ("audio_decode", AudioKernels.decodeInfo,
      arity("audio_decode", 1)(c => AudioKernels.AudioDecode(c(0)))),
    ("audio_fingerprint", AudioKernels.fingerprintInfo,
      arity("audio_fingerprint", 1)(c => AudioKernels.AudioFingerprint(c(0)))),
    ("minhash_sigs", MinhashSigs.info,
      arity("minhash_sigs", 3)(c => MinhashSigs(
        c(0),
        intLit(c(1), "minhash_sigs", "numHashes"),
        intLit(c(2), "minhash_sigs", "shingle")))),
    ("simhash32", DocKernels.simhashInfo,
      arity("simhash32", 1)(c => DocKernels.Simhash32(c(0)))),
    ("simhash64", DocKernels.simhash64Info,
      arity("simhash64", 1)(c => DocKernels.Simhash64(c(0)))),
    ("min_shingle_hash", DocKernels.minShingleInfo,
      arity("min_shingle_hash", 2)(c => DocKernels.MinShingleHash(
        c(0), intLit(c(1), "min_shingle_hash", "n")))),
    ("span_win_hashes", DocKernels.spanWinInfo,
      arity("span_win_hashes", 2)(c => DocKernels.SpanWinHashes(
        c(0), intLit(c(1), "span_win_hashes", "n")))),
    ("winnow_fps", DocKernels.winnowInfo,
      arity("winnow_fps", 3)(c => DocKernels.WinnowFps(
        c(0),
        intLit(c(1), "winnow_fps", "n"),
        intLit(c(2), "winnow_fps", "w")))),
    ("repetition_stats", DocKernels.repetitionInfo,
      arity("repetition_stats", 1)(c => DocKernels.RepetitionStats(c(0)))),
    ("lang_id", DocKernels.langIdInfo,
      arity("lang_id", 1)(c => DocKernels.LangId(c(0)))),
    ("lang_id_ngram", DocKernels.langIdNgramInfo,
      arity("lang_id_ngram", 1)(c => DocKernels.LangIdNgram(c(0)))),
    ("lang_id_ngram_scored", DocKernels.langIdNgramScoredInfo,
      arity("lang_id_ngram_scored", 1)(c => DocKernels.LangIdNgramScored(c(0)))),
    ("text_from_bytes", graft.expressions.ByteKernels.textFromBytesInfo,
      arity("text_from_bytes", 1)(c =>
        graft.expressions.ByteKernels.TextFromBytes(c(0)))),
    ("text_from_bytes_decl", graft.expressions.ByteKernels.textFromBytesDeclInfo,
      arity("text_from_bytes_decl", 2)(c =>
        graft.expressions.ByteKernels.TextFromBytesDecl(c(0), c(1)))),
    ("deflate_ratio", graft.expressions.ZipKernels.deflateRatioInfo,
      arity("deflate_ratio", 1)(c =>
        graft.expressions.ZipKernels.DeflateRatio(c(0)))),
    ("warc_records", graft.expressions.WarcKernels.warcRecordsInfo,
      arity("warc_records", 1)(c =>
        graft.expressions.WarcKernels.WarcRecords(c(0)))),
    ("synth_warc", graft.expressions.WarcKernels.synthWarcInfo,
      arity("synth_warc", 1)(c =>
        graft.expressions.WarcKernels.SynthWarc(c(0)))),
    ("image_meta", graft.expressions.ImageKernels.metaInfo,
      arity("image_meta", 1)(c =>
        graft.expressions.ImageKernels.ImageMeta(c(0)))),
    ("synth_webp", graft.expressions.ImageKernels.synthWebpInfo,
      arity("synth_webp", 1)(c =>
        graft.expressions.ImageKernels.SynthWebp(c(0)))),
    ("synth_webp_l", graft.expressions.Vp8lKernels.synthWebpLInfo,
      arity("synth_webp_l", 1)(c =>
        graft.expressions.Vp8lKernels.SynthWebpL(c(0)))),
    ("synth_avif", graft.expressions.ImageKernels.synthAvifInfo,
      arity("synth_avif", 1)(c =>
        graft.expressions.ImageKernels.SynthAvif(c(0)))),
    ("video_meta", graft.expressions.VideoKernels.videoMetaInfo,
      arity("video_meta", 1)(c =>
        graft.expressions.VideoKernels.VideoMeta(c(0)))),
    ("synth_mp4", graft.expressions.VideoKernels.synthInfo,
      arity("synth_mp4", 1)(c =>
        graft.expressions.VideoKernels.SynthMp4(c(0)))),
    ("registrable_domain", graft.expressions.UrlKernels.registrableInfo,
      arity("registrable_domain", 1)(c =>
        graft.expressions.UrlKernels.RegistrableDomain(c(0)))),
    ("pct_normalize", graft.expressions.UrlKernels.pctNormalizeInfo,
      arity("pct_normalize", 1)(c =>
        graft.expressions.UrlKernels.PctNormalize(c(0)))),
    ("html_unescape", graft.expressions.HtmlKernels.unescapeInfo,
      arity("html_unescape", 1)(c =>
        graft.expressions.HtmlKernels.HtmlUnescape(c(0)))),
    ("html_to_text", graft.expressions.HtmlKernels.toTextInfo,
      arity("html_to_text", 1)(c =>
        graft.expressions.HtmlKernels.HtmlToText(c(0)))),
    ("html_title", graft.expressions.HtmlKernels.titleInfo,
      arity("html_title", 1)(c =>
        graft.expressions.HtmlKernels.HtmlTitle(c(0)))),
    ("xml_text", graft.expressions.HtmlKernels.xmlTextInfo,
      arity("xml_text", 1)(c =>
        graft.expressions.HtmlKernels.XmlText(c(0)))),
    ("json_text", graft.expressions.JsonKernels.jsonTextInfo,
      arity("json_text", 1)(c =>
        graft.expressions.JsonKernels.JsonText(c(0)))),
    ("text_from_bytes_rung", graft.expressions.ByteKernels.textFromBytesRungInfo,
      arity("text_from_bytes_rung", 1)(c =>
        graft.expressions.ByteKernels.TextFromBytesRung(c(0)))),
    ("pdf_text", graft.expressions.PdfKernels.pdfTextInfo,
      arity("pdf_text", 1)(c =>
        graft.expressions.PdfKernels.PdfText(c(0)))),
    ("synth_pdf", graft.expressions.PdfKernels.synthPdfInfo,
      arity("synth_pdf", 1)(c =>
        graft.expressions.PdfKernels.SynthPdf(c(0)))),
    ("idn_ascii", graft.expressions.UrlKernels.idnAsciiInfo,
      arity("idn_ascii", 1)(c =>
        graft.expressions.UrlKernels.IdnAscii(c(0)))),
    ("text_normalize", DocKernels.normalizeInfo,
      arity("text_normalize", 1)(c => DocKernels.TextNormalize(c(0)))),
    ("pii_pseudonymize", graft.expressions.PiiKernels.pseudonymizeInfo,
      arity("pii_pseudonymize", 1)(c => graft.expressions.Pseudonymize(c(0)))),
    // Bridges to Spark's native Bloom-filter expressions (the pair
    // InjectRuntimeFilter plans internally, exposed as callable functions so
    // operators can build the sketch-prefilter shape explicitly):
    // bloom_build(xxhash64(v), estItems, numBits) aggregates a serialized
    // sketch; bloom_probe(sketchBinary, xxhash64(v)) is the codegen'd
    // membership predicate.
    ("bloom_build",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_build"),
      arity("bloom_build", 3)(c =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c(0), c(1), c(2)))),
    ("bloom_probe",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_probe"),
      arity("bloom_probe", 2)(c =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1)))))

  // -------------------------------------------------------------------------
  // TABLE-valued functions — the curation tier's SQL surface (round-12
  // verdict item 5): the hot whole-operator entry points, callable from a
  // plain `spark.sql("SELECT ... FROM graft_dedup_exact('docs', ...)")`
  // with no Scala in sight. Each builder resolves its table-name literals
  // through `SparkSession.active.table` (temp views, catalog tables — the
  // [[graft.GraftCatalog]] views compose directly) and returns the SAME
  // DataFrame plan the Scala API builds, so SQL and Scala callers get
  // identical semantics AND identical physical plans. Only pure-plan
  // operators are exposed (no operator that checkpoints or collects at
  // build time belongs in an analysis-time builder).
  // -------------------------------------------------------------------------

  private def strLit(e: Expression, fn: String, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _: org.apache.spark.sql.types.StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got $other")
  }

  private def numLit(e: Expression, fn: String, what: String): Double = e match {
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a numeric literal, got $other")
  }

  private def tvfArity(fn: String, n: Int)(
      build: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    c => {
      if (c.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${c.length}")
      build(c)
    }

  private def tvfInfo(name: String, usage: String) =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def tableOf(name: String) = SparkSession.active.table(name)

  private val tableFunctions: Seq[
      (String, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_dedup_exact", tvfInfo("graft_dedup_exact",
      "_FUNC_(table, id_col, text_col) - exact content dedup: one row per " +
        "distinct text (by md5), smallest id wins."),
      tvfArity("graft_dedup_exact", 3) { c =>
        graft.ops.Dedup.exactByContent(
          tableOf(strLit(c(0), "graft_dedup_exact", "table")),
          strLit(c(1), "graft_dedup_exact", "id_col"),
          strLit(c(2), "graft_dedup_exact", "text_col"))
          .queryExecution.logical
      }),
    ("graft_sample", tvfInfo("graft_sample",
      "_FUNC_(table, id_col, rate, salt) - deterministic hash sample at " +
        "`rate` (nested across rates for a fixed salt)."),
      tvfArity("graft_sample", 4) { c =>
        graft.ops.Corpus.sampleDeterministic(
          tableOf(strLit(c(0), "graft_sample", "table")),
          strLit(c(1), "graft_sample", "id_col"),
          numLit(c(2), "graft_sample", "rate"),
          strLit(c(3), "graft_sample", "salt"))
          .queryExecution.logical
      }),
    ("graft_split", tvfInfo("graft_split",
      "_FUNC_(table, id_col, train, validation, salt) - attaches the " +
        "deterministic train/validation/test `split` label column."),
      tvfArity("graft_split", 5) { c =>
        graft.ops.Corpus.withSplit(
          tableOf(strLit(c(0), "graft_split", "table")),
          strLit(c(1), "graft_split", "id_col"),
          numLit(c(2), "graft_split", "train"),
          numLit(c(3), "graft_split", "validation"),
          strLit(c(4), "graft_split", "salt"))
          .queryExecution.logical
      }),
    ("graft_cap_per_group", tvfInfo("graft_cap_per_group",
      "_FUNC_(table, group_col, n, order_col) - keeps the first `n` rows " +
        "per group under ascending `order_col` (WindowGroupLimit plan)."),
      tvfArity("graft_cap_per_group", 4) { c =>
        graft.ops.Corpus.capPerGroup(
          tableOf(strLit(c(0), "graft_cap_per_group", "table")),
          strLit(c(1), "graft_cap_per_group", "group_col"),
          intLit(c(2), "graft_cap_per_group", "n"),
          org.apache.spark.sql.functions.col(
            strLit(c(3), "graft_cap_per_group", "order_col")).asc)
          .queryExecution.logical
      }),
    ("graft_bm25_topk", tvfInfo("graft_bm25_topk",
      "_FUNC_(docs_table, id_col, text_col, queries_table, k) - BM25 " +
        "top-k ranking; queries_table must carry (qid, qtext)."),
      tvfArity("graft_bm25_topk", 5) { c =>
        graft.ops.Retrieval.bm25(
          tableOf(strLit(c(0), "graft_bm25_topk", "docs_table")),
          strLit(c(1), "graft_bm25_topk", "id_col"),
          strLit(c(2), "graft_bm25_topk", "text_col"),
          tableOf(strLit(c(3), "graft_bm25_topk", "queries_table")),
          intLit(c(4), "graft_bm25_topk", "k"))
          .queryExecution.logical
      }),
    ("graft_minhash_pairs", tvfInfo("graft_minhash_pairs",
      "_FUNC_(index_dir, max_occupancy) - candidate near-duplicate pairs " +
        "served from a persisted MinHash-LSH index (never re-signs the " +
        "corpus); equals one-shot banding over the accumulated corpus."),
      tvfArity("graft_minhash_pairs", 2) { c =>
        graft.ops.MinhashIndex.candidatePairsIndexed(
          SparkSession.active,
          strLit(c(0), "graft_minhash_pairs", "index_dir"),
          intLit(c(1), "graft_minhash_pairs", "max_occupancy"))
          .queryExecution.logical
      }),
    ("graft_mm_neardups", tvfInfo("graft_mm_neardups",
      "_FUNC_(store_dir, modality, max_hamming) - media near-duplicate " +
        "pairs served from a decode-once feature store (zero payload " +
        "reads); modality 'image' or 'audio'."),
      tvfArity("graft_mm_neardups", 3) { c =>
        val store = strLit(c(0), "graft_mm_neardups", "store_dir")
        val hamming = intLit(c(2), "graft_mm_neardups", "max_hamming")
        (strLit(c(1), "graft_mm_neardups", "modality") match {
          case "image" => graft.ops.Multimodal
            .imageNearDuplicatesIndexed(SparkSession.active, store, hamming)
          case "audio" => graft.ops.Multimodal
            .audioNearDuplicatesIndexed(SparkSession.active, store, hamming)
          case other => throw new IllegalArgumentException(
            s"graft_mm_neardups: modality must be 'image' or 'audio', got '$other'")
        }).queryExecution.logical
      }),
    ("graft_paragraph_dedup", tvfInfo("graft_paragraph_dedup",
      "_FUNC_(table, id_col, text_col, mode) - corpus-wide line dedup " +
        "(CCNet): mode 'keep_first' keeps the first occurrence of every " +
        "duplicated line, 'remove_all' strips every occurrence."),
      tvfArity("graft_paragraph_dedup", 4) { c =>
        val keepFirst = strLit(c(3), "graft_paragraph_dedup", "mode") match {
          case "keep_first" => true
          case "remove_all" => false
          case other => throw new IllegalArgumentException(
            s"graft_paragraph_dedup: mode must be 'keep_first' or " +
              s"'remove_all', got '$other'")
        }
        graft.ops.Dedup.paragraphDedup(
          tableOf(strLit(c(0), "graft_paragraph_dedup", "table")),
          strLit(c(1), "graft_paragraph_dedup", "id_col"),
          strLit(c(2), "graft_paragraph_dedup", "text_col"),
          keepFirst = keepFirst)
          .queryExecution.logical
      }),
    ("graft_binary_topk", tvfInfo("graft_binary_topk",
      "_FUNC_(table, id_col, vec_col, queries_table, k, shortlist, dims) - " +
        "binary-quantized ANN: hamming shortlist over packed sign bits, " +
        "exact-dot re-rank to top-k; queries_table must carry (qid, qvec)."),
      tvfArity("graft_binary_topk", 7) { c =>
        graft.ops.Similarity.binaryTopKRerank(
          tableOf(strLit(c(0), "graft_binary_topk", "table")),
          tableOf(strLit(c(3), "graft_binary_topk", "queries_table")),
          intLit(c(4), "graft_binary_topk", "k"),
          intLit(c(5), "graft_binary_topk", "shortlist"),
          intLit(c(6), "graft_binary_topk", "dims"),
          strLit(c(1), "graft_binary_topk", "id_col"),
          strLit(c(2), "graft_binary_topk", "vec_col"))
          .queryExecution.logical
      }),
    ("graft_url_filter", tvfInfo("graft_url_filter",
      "_FUNC_(table, url_col, blocked_table, path_pattern) - crawl URL " +
        "blocklist: drops rows whose host is in blocked_table(host) or " +
        "whose path matches the RE2 pattern ('' disables the path rule)."),
      tvfArity("graft_url_filter", 4) { c =>
        val pat = strLit(c(3), "graft_url_filter", "path_pattern")
        graft.ops.Corpus.filterBlockedUrls(
          tableOf(strLit(c(0), "graft_url_filter", "table")),
          strLit(c(1), "graft_url_filter", "url_col"),
          tableOf(strLit(c(2), "graft_url_filter", "blocked_table")),
          if (pat.isEmpty) None else Some(pat))
          .queryExecution.logical
      }),
    ("graft_decontaminate", tvfInfo("graft_decontaminate",
      "_FUNC_(table, id_col, text_col, registry_dir, threshold) - the " +
        "eval-registry decontamination gate: rows minus every document " +
        "that exact-matches or contains >= threshold of any registered " +
        "benchmark doc (all suites)."),
      tvfArity("graft_decontaminate", 5) { c =>
        graft.ops.EvalRegistry.decontaminateIndexed(
          tableOf(strLit(c(0), "graft_decontaminate", "table")),
          strLit(c(3), "graft_decontaminate", "registry_dir"),
          strLit(c(1), "graft_decontaminate", "id_col"),
          strLit(c(2), "graft_decontaminate", "text_col"),
          numLit(c(4), "graft_decontaminate", "threshold"))
          .queryExecution.logical
      }),
    ("graft_memorization", tvfInfo("graft_memorization",
      "_FUNC_(table, id_col, text_col, n) - per-document memorization-risk " +
        "profile: tokens covered by corpus-duplicated n-windows and the " +
        "longest contiguous covered run."),
      tvfArity("graft_memorization", 4) { c =>
        graft.ops.Dedup.memorizationProfile(
          tableOf(strLit(c(0), "graft_memorization", "table")),
          strLit(c(1), "graft_memorization", "id_col"),
          strLit(c(2), "graft_memorization", "text_col"),
          intLit(c(3), "graft_memorization", "n"))
          .queryExecution.logical
      }),
    ("graft_quality", tvfInfo("graft_quality",
      "_FUNC_(table, id_col, text_col) - per-document quality signals " +
        "(length/punct/stopword/repetition) joined to the id column."),
      tvfArity("graft_quality", 3) { c =>
        val t = tableOf(strLit(c(0), "graft_quality", "table"))
        val id = strLit(c(1), "graft_quality", "id_col")
        val text = strLit(c(2), "graft_quality", "text_col")
        t.select(
          org.apache.spark.sql.functions.col(id) +:
            graft.ops.TextOps.qualitySignals(
              org.apache.spark.sql.functions.col(text)): _*)
          .queryExecution.logical
      }),
    ("graft_drift", tvfInfo("graft_drift",
      "_FUNC_(ref_table, cur_table, key_col) - categorical drift of " +
        "cur vs ref over key_col: per-key shares with per-key PSI and " +
        "Jensen-Shannon contributions (sum them for the headline scores)."),
      tvfArity("graft_drift", 3) { c =>
        graft.ops.Profile.driftByKey(
          tableOf(strLit(c(0), "graft_drift", "ref_table")),
          tableOf(strLit(c(1), "graft_drift", "cur_table")),
          strLit(c(2), "graft_drift", "key_col"))
          .queryExecution.logical
      }),
    ("graft_nb_reliability", tvfInfo("graft_nb_reliability",
      "_FUNC_(train_table, heldout_table, id_col, text_col, label_col) - " +
        "NB margin-reliability report: trains on train_table, buckets " +
        "held-out docs by top-vs-runner-up score margin, returns " +
        "(bucket, n, n_correct) - the gate-unreviewed-above-which-band table."),
      tvfArity("graft_nb_reliability", 5) { c =>
        val text = strLit(c(3), "graft_nb_reliability", "text_col")
        val label = strLit(c(4), "graft_nb_reliability", "label_col")
        graft.ops.TextOps.nbMarginReliability(
          tableOf(strLit(c(1), "graft_nb_reliability", "heldout_table")),
          strLit(c(2), "graft_nb_reliability", "id_col"), text, label,
          graft.ops.TextOps.nbTrain(
            tableOf(strLit(c(0), "graft_nb_reliability", "train_table")),
            label, text))
          .queryExecution.logical
      }),
    ("graft_card_diff", tvfInfo("graft_card_diff",
      "_FUNC_(table_a, table_b) - dataset-card diff between two corpus " +
        "snapshots: one (metric, v_a, v_b, delta) row per headline metric " +
        "(volume, null mass, cardinalities, token/char mass, distinct texts)."),
      tvfArity("graft_card_diff", 2) { c =>
        graft.ops.Corpus.datasetCardDiff(
          tableOf(strLit(c(0), "graft_card_diff", "table_a")),
          tableOf(strLit(c(1), "graft_card_diff", "table_b")))
          .queryExecution.logical
      }))

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    tableFunctions.foreach { case (name, _, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Binds `bpe_encode(tokens)` on the session to a LEARNED merge table
    * ([[graft.ops.TextOps.learnBpeMerges]]) — the table is expression
    * state, not a SQL literal, so it is captured at registration time;
    * re-register to swap vocabularies. */
  def registerBpe(spark: SparkSession, merges: Seq[(String, String)]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode",
      arity("bpe_encode", 1)(c => graft.expressions.BpeEncode(c(0), merges)),
      "scala_udf")
}
