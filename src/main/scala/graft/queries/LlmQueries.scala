package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.GraftExtensions
import graft.ops.{Corpus, Dedup, EvalRegistry, ManifestStore, MinhashIndex, Multimodal, Pii, Retrieval, Similarity, TextOps}
import graft.sources.{Jsonl, Warc}

/**
 * Driver-contract queries for the LLM-training-data operators (dedup,
 * similarity search, text analysis, multimodal plumbing) over the
 * `documents` / `embeddings` test tables.
 *
 * The synthetic corpus contains no natural near-duplicates (max pairwise
 * 3-shingle Jaccard ≈ 0.03, max pairwise cosine ≈ 0.44), so the near-dup
 * queries union the corpus with a deterministic mutation of itself
 * (documents: first two tokens dropped, id+1000000; embeddings: identical
 * copy, id+1000000). The pipelines must then recover exactly the planted
 * pairs — a far stronger check than an empty result.
 */
object LlmQueries {

  private type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tpch.read(s, dir, "documents")

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tpch.read(s, dir, "embeddings")

  /** Build-once memo for the persisted ANN index (the build-once/query-many
    * serving shape): trains + encodes only if no committed index exists
    * under the layout-versioned scratch dir for this scale factor, then
    * loads it. Bench's warm-up pass pays the one-time build, so the
    * measured `q_sim_ivfpq_persisted` line is query-only latency — exactly
    * the number a 100 TB serving deployment cares about. */
  private def persistedIndex(s: SparkSession, dir: String): Similarity.AnnIndex = {
    // The memo key carries the layout version, EVERY build parameter, and a
    // corpus fingerprint (count + max vec_id): a regenerated test corpus or
    // changed knob lands on a fresh path and rebuilds, so a stale committed
    // index can never serve old data/quantizers to the shared oracle.
    val e = emb(s, dir)
    val fp = e.agg(count(lit(1)), max(col("vec_id"))).collect()(0)
    val (dims, m, coarseK, pqK, iters) = (64, 4, 8, 16, 2)
    // v5: the index carries `label` as an attribute column (filtered-ANN
    // serving) — pure pass-through, identical unfiltered ranking
    val indexDir =
      s"${sys.props("java.io.tmpdir")}/graft_ann_index_v5/" +
        s"${new java.io.File(dir).getName}_d${dims}_m${m}_c${coarseK}_k${pqK}_i${iters}" +
        s"_n${fp.getLong(0)}_x${fp.getLong(1)}"
    if (!Similarity.indexCommitted(indexDir)) {
      graft.GraftExtensions.register(s)
      Similarity.buildIndex(e, indexDir, dims, m, coarseK, pqK, iters,
        attrCols = Seq("label"))
    }
    Similarity.readIndex(s, indexDir)
  }

  /** Build-once memo for the TOMBSTONE-DELETED ANN index: same quantizers
    * and corpus as [[persistedIndex]] (trained BEFORE the delete — the
    * takedown arrives after the build, as in production), then every
    * `vec_id % 7 == 2` vector deleted via
    * [[Similarity.deleteFromIndex]]. Serving must equal the same ADC
    * ranking with those candidates excluded — the oracle replays training
    * on the full corpus and filters only the candidate set, exactly the
    * operator's anti-join semantics. Separate memo path: deletion mutates
    * index state, and [[persistedIndex]]'s dir is shared. */
  private def persistedDeletedIndex(s: SparkSession, dir: String): Similarity.AnnIndex = {
    val e = emb(s, dir)
    val fp = e.agg(count(lit(1)), max(col("vec_id"))).collect()(0)
    val (dims, m, coarseK, pqK, iters) = (64, 4, 8, 16, 2)
    val indexDir =
      s"${sys.props("java.io.tmpdir")}/graft_ann_index_del_v1/" +
        s"${new java.io.File(dir).getName}_d${dims}_m${m}_c${coarseK}_k${pqK}_i${iters}" +
        s"_n${fp.getLong(0)}_x${fp.getLong(1)}"
    if (!Similarity.indexCommitted(indexDir)) {
      graft.GraftExtensions.register(s)
      Similarity.buildIndex(e, indexDir, dims, m, coarseK, pqK, iters)
      Similarity.deleteFromIndex(
        e.where(col("vec_id") % 7 === 2).select("vec_id"), indexDir)
    }
    Similarity.readIndex(s, indexDir)
  }

  /**
   * Shared store-memo discipline (ONE point of truth for every build-once
   * scratch artifact): a layout-versioned root (bump it when the layout
   * changes), the corpus fingerprint key (row count + max id — the driver
   * regenerates testdata wholesale, so any corpus change moves the key
   * and a stale store can never serve), and a guard on the READER's own
   * predicate so a crash mid-build rebuilds instead of serving a
   * half-store forever. The two ANN memos keep their own key builder —
   * their paths additionally carry every quantizer knob.
   */
  /** Shared by q_contamination_report and its store-served twin — the
    * registry must roll up identically to the direct form. */
  private lazy val contaminationReportOracleSql: String =
    s"""WITH ev AS (SELECT doc_id + 5000000 AS doc_id,
         |         array_to_string(list_slice(string_split(text, ' '),
         |           (len(string_split(text, ' ')) // 4) + 1,
         |           (len(string_split(text, ' ')) // 4) + ((len(string_split(text, ' ')) + 1) // 2)), ' ') AS text
         |       FROM documents WHERE doc_id % 5 = 0),
         |${winnowCte("documents", "c")},
         |${winnowCte("ev", "e")},
         |en AS (SELECT id, count(*) AS n_eval FROM efps GROUP BY id),
         |shared AS (SELECT c.id AS corpus_id, e.id AS eval_id, count(*) AS shared
         |           FROM cfps c JOIN efps e ON e.fp = c.fp GROUP BY c.id, e.id),
         |sc AS (SELECT s.eval_id, CAST(s.shared AS DOUBLE) / en.n_eval AS containment
         |       FROM shared s JOIN en ON en.id = s.eval_id),
         |r AS (SELECT ev.doc_id AS eval_id,
         |             round(max(COALESCE(sc.containment, 0.0)), 6) AS max_containment,
         |             CAST(sum(CASE WHEN sc.containment >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         |               AS n_contaminating
         |      FROM ev LEFT JOIN sc ON sc.eval_id = ev.doc_id
         |      GROUP BY ev.doc_id)
         |SELECT eval_id, max_containment, n_contaminating,
         |       n_contaminating > 0 AS contaminated
         |FROM r ORDER BY eval_id""".stripMargin

  private def storeMemo(
      fpFrame: DataFrame, idCol: String, dir: String, root: String)(
      committed: String => Boolean)(build: String => Unit): String = {
    val fp = fpFrame.agg(count(lit(1)), max(col(idCol))).collect()(0)
    val path = s"${sys.props("java.io.tmpdir")}/$root/" +
      s"${new java.io.File(dir).getName}_n${fp.getLong(0)}_x${fp.getLong(1)}"
    if (!committed(path)) build(path)
    path
  }

  /** Deterministic JSONL dump of the documents table (memoized under /tmp
    * per corpus fingerprint): one JSON object per line, and every 97th
    * doc's line truncated by one character — chopping the closing brace
    * plants the real-world failure mode (a truncated crawl shard) in
    * closed form, so the DuckDB oracle predicts exactly which rows ingest
    * as corrupt without parsing any JSON itself. */
  private def jsonlDump(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_jsonl_v1")(p =>
      ManifestStore.fs(s, p)
        .exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) { path =>
      docs(s, dir).select(
          col("doc_id"),
          to_json(struct(
            col("doc_id"), col("lang"), col("source"), col("n_chars"),
            col("text"))).as("l"))
        .select(
          when(col("doc_id") % 97 === 0,
            expr("substr(l, 1, length(l) - 1)")).otherwise(col("l"))
            .as("value"))
        .write.mode("overwrite").text(path)
    }

  /** Build-once memo for the persisted lexical (BM25) index — same
    * layout-versioned, corpus-fingerprinted scratch path discipline as
    * [[persistedIndex]]: bench's warm-up pays the one-time build, the
    * measured line is serving-only latency. */
  private def lexIndexDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_lex_index_v1")(
      Retrieval.lexIndexCommitted)(Retrieval.writeLexIndex(docs(s, dir), _))

  /** Build-once memo for the TOMBSTONE-DELETED lexical index: the full
    * corpus is indexed, then every `doc_id % 7 == 3` document is deleted
    * through [[Retrieval.deleteFromLexIndex]] — serving must equal BM25
    * over the corpus minus those docs (df, N and avgdl all adjusted), the
    * rebuild-parity contract under the driver's oracle gate. A separate
    * memo path from [[lexIndexDir]]: deletion mutates index state. */
  private def lexIndexDeletedDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_lex_index_del_v1")(
      Retrieval.lexIndexCommitted) { path =>
      val d = docs(s, dir)
      Retrieval.writeLexIndex(d, path)
      Retrieval.deleteFromLexIndex(
        d.where(col("doc_id") % 7 === 3).select("doc_id"), path)
    }

  /** Build-once memo for the persisted INCREMENTAL minhash index over
    * [[docsWithNearDups]]: built from the even-id half, the odd-id half
    * appended via [[MinhashIndex.appendToMinhashIndex]] (signing only that
    * batch) — so the measured serving line reads stored band rows and
    * never re-signs the corpus, the exact rerun economics the one-shot
    * `q_dedup_minhash_lsh` lacks. Same layout-versioned, corpus-
    * fingerprinted scratch discipline as [[persistedIndex]]. */
  /** Public handle on the memo for the scale-stress harness. */
  def minhashIndexDirFor(s: SparkSession, dir: String): String =
    minhashIndexDir(s, dir)

  private def minhashIndexDir(s: SparkSession, dir: String): String =
    // guard on the READER's predicate — a committed verified-pair
    // generation, not just a band store — so a crash between the band
    // commits and the verdict commit rebuilds instead of silently serving
    // the verify-everything path forever
    storeMemo(docs(s, dir), "doc_id", dir, "graft_mh_index_v2")(
      MinhashIndex.verifiedPairsCommitted(s, _)) { path =>
      val all = docsWithNearDups(s, dir)
      MinhashIndex.writeMinhashIndex(
        all.where(col("doc_id") % 2 === 0), path,
        numHashes = 16, bands = 8, shingle = 3)
      MinhashIndex.appendToMinhashIndex(
        all.where(col("doc_id") % 2 === 1), path, maxOccupancy = 64)
      // one full verification pass at build time commits every candidate's
      // disposition (vmeta pinned to the serving queries' (3, 0.35)) — the
      // measured q_dedup_minhash_inc / q_pipeline_neardup_curate lines then
      // read stored verdicts and shingle nothing
      MinhashIndex.nearDuplicatesIndexed(
        all, path, "doc_id", "text", shingle = 3, threshold = 0.35,
        maxOccupancy = 64, persistVerdicts = true).count()
    }

  /** Build-once memo for the two-version card-diff store: the even-id
    * half of [[docs]] upserted as version 1, the odd half appended as
    * version 2 — both snapshots stay addressable (nothing vacuumed), so
    * `q_corpus_card_diff` diffs them through time travel. Guarded on the
    * reader's predicate (two committed versions), so a crash mid-build
    * rebuilds instead of serving a one-version store. */
  /** Build-once eval-suite fingerprint registry: suite "main" = the
    * contamination plant's middle spans (shared with
    * q_contamination_report), suite "exact" = verbatim copies of every
    * 25th doc. Guarded on the reader's predicate (committed meta). */
  private def evalRegistryDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_evalreg_v1")(
      EvalRegistry.evalRegistryCommitted(s, _)) { path =>
      val d = docs(s, dir)
      val toks = split(col("text"), " ")
      val start = (size(toks) / lit(4)).cast("int") + 1
      val len = ((size(toks) + 1) / lit(2)).cast("int")
      EvalRegistry.writeEvalRegistry(
        d.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 5000000L).as("doc_id"),
            array_join(slice(toks, start, len), " ").as("text")),
        path, "doc_id", "text", "main")
      EvalRegistry.appendToEvalRegistry(
        d.where(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"), col("text")),
        path, "doc_id", "text", "exact")
    }

  private def cardStoreDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_card_store_v1")(
      ManifestStore.versions(s, _).size >= 2) { path =>
      val keyed = docs(s, dir)
        .withColumn("dp", pmod(col("doc_id"), lit(16)).cast("string"))
      ManifestStore.upsert(
        keyed.where(col("doc_id") % 2 === 0), path, "dp", Seq("dp", "doc_id"), s)
      ManifestStore.upsert(
        keyed.where(col("doc_id") % 2 === 1), path, "dp", Seq("dp", "doc_id"), s)
    }

  /** Build-once memo for the DECODE-ONCE multimodal feature store: every
    * planted image and WAV is decoded exactly once at store build
    * ([[Multimodal.writeFeatureStore]] — fingerprints + full decode stats,
    * payloads dropped), and the `_indexed` queries serve from the
    * committed feature table, so their measured rerun cost is a
    * fingerprint-column scan with ZERO payload decodes — the fix for the
    * 58× rerun outlier the one-shot `q_mm_phash` carries by design. */
  private def mmFeatureStoreDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_mm_features_v1")(
      ManifestStore.readManifest(s, _).isDefined) { path =>
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val images = Multimodal.asAsset(
        col("doc_id"), lit("image"),
        call_function("synth_image", col("doc_id")), col("source"))(d)
      val audio = Multimodal.asAsset(
        col("doc_id"), lit("audio"),
        call_function("synth_wav", col("doc_id")), col("source"))(d)
      Multimodal.writeFeatureStore(images.unionByName(audio), path)
    }

  /** Build-once memo for the persisted window-count store: the even-id
    * half of [[docsWithNearDups]] ingested as `(h, c)` counts (n = 10),
    * so `q_dedup_substring_inc_indexed` reads the committed skeleton and
    * never re-tokenizes the store-side corpus. */
  private def spanStoreDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_span_store_v1")(
      Dedup.spanStoreCommitted(s, _))(
      Dedup.writeWindowCounts(
        docsWithNearDups(s, dir).where(col("doc_id") % 2 === 0),
        _, "doc_id", "text", n = 10))

  /** Once-per-(sf, corpus-fingerprint) bootstrap of the persisted
    * binary-code store over the embeddings table (dims=64 pinned in the
    * meta), so `q_sim_binary_indexed` serves from the committed codes. */
  private def binStoreDir(s: SparkSession, dir: String): String =
    storeMemo(emb(s, dir), "vec_id", dir, "graft_bin_store_v1")(
      Similarity.binaryCodesCommitted(s, _))(
      Similarity.writeBinaryCodes(emb(s, dir), _, dims = 64))

  /** The multi-line plant shared by the paragraph-dedup family: a global
    * banner, the doc's own (suffix-uniqued) body, and a mod-7 shared
    * footer — the oracle replays the identical construction. */
  private def plantedParagraphs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"),
        concat_ws("\n",
          lit("subscribe to our newsletter today"),
          concat(col("text"), lit(" #"), col("doc_id").cast("string")),
          concat(lit("copyright "), (col("doc_id") % 7).cast("string"))).as("text"))

  /** Once-per-(sf, corpus-fingerprint) bootstrap of the persisted
    * line-hash store: the even half of [[plantedParagraphs]] committed as
    * distinct hashes, so `q_dedup_paragraph_inc_indexed` reads the
    * committed store and never rescans the store-side corpus. */
  private def paraStoreDir(s: SparkSession, dir: String): String =
    storeMemo(docs(s, dir), "doc_id", dir, "graft_para_store_v2")(
      Dedup.lineStoreCommitted(s, _))(
      Dedup.writeLineHashes(
        plantedParagraphs(s, dir).where(col("doc_id") % 2 === 0), _, "text"))

  /** documents ∪ near-dup mutation (drop first 2 tokens, id+1000000). */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val toks = split(col("text"), " ")
    val mutated = d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(toks, lit(3), greatest(lit(0), size(toks) - 2)), " ").as("text"),
      col("lang"), col("source"), col("n_chars"))
    d.select("doc_id", "text", "lang", "source", "n_chars").unionByName(mutated)
  }

  /** embeddings ∪ identical copy with id+1000000. */
  private def embWithDups(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    e.unionByName(e.select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"), col("label")))
  }

  /** The synthetic corpus carries no PII, so the PII query plants
    * deterministic doc_id-derived PII into 4 of every 5 documents (email /
    * phone+IP / SSN / card) — the detector must then find exactly what was
    * planted. The identical construction lives in the DuckDB oracle. */
  private def docsWithPii(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn(
      "text",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" call 555-123-4567 or visit 10.0.0."),
            (col("doc_id") % 200).cast("string")))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" ssn 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .when(col("doc_id") % 5 === 3,
          concat(col("text"), lit(" card 4111 1111 1111 1111 used")))
        .otherwise(col("text")))

  // Shared oracle fragments -------------------------------------------------

  /** Four deterministic per-doc URL spellings of one logical resource —
    * the shared plant of q_text_url_canon and q_corpus_domain_cap (the
    * oracle replays it as a CASE over doc_id % 4). */
  private def plantedUrl: Column =
    when(col("doc_id") % 4 === 0,
      concat(lit("HTTPS://Site"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/page/"), (col("doc_id") % 50).cast("string"),
        lit("/?utm_source=tw&b=2&a=1#sec")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
          lit(".com/page/"), (col("doc_id") % 50).cast("string"), lit("?a=1&b=2")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("HTTP://Site"), (col("doc_id") % 7).cast("string"),
          lit(".com:80/page/"), (col("doc_id") % 50).cast("string"),
          lit("/index.html?gclid=xyz")))
      .otherwise(
        concat(lit("http://site"), (col("doc_id") % 7).cast("string"),
          lit(".com:8080/page/"), (col("doc_id") % 50).cast("string"), lit("#frag")))

  /** [[plantedUrl]] extended with percent-encoding gauntlets (its own
    * plant so the raw-URL consumers q_corpus_domain_cap/url_filter keep
    * their inputs): unreserved escapes that MUST decode-and-collapse
    * (`%61`→a in path and param names, `%7E`→~), a reserved escape that
    * MUST survive encoded with its hex uppercased (`%2f`→`%2F`,
    * `%3a`→`%3A`). */
  /** Held-out sentences (distinct from the profile seeds) planted into
    * every fifth doc by q_text_langid_ngram, rotating through the 30
    * profile languages PLUS three rejection plants — Swahili and
    * Lithuanian (languages no bundled profile knows) and a
    * keyboard-mash garbage line — that must classify as 'und' through
    * the per-language cutoff, so the oracle replays the REJECTION arm of
    * the algorithm, not just the argmin. (The round-15 fi/sv/vi/el
    * rejection plants became real labels when round 16 widened the
    * snapshot to 30 languages.) The same literals interpolate
    * into the oracle's CASE plant. Lowercase, BMP-only, apostrophe-free
    * (SQL hygiene). */
  private val langPlants: Seq[String] = Seq(
    "the children walk to the school in the morning and they read books with the teacher",
    "los niños caminan a la escuela por la mañana y leen libros con el maestro en la ciudad",
    "les enfants marchent vers la maison le matin et ils lisent des livres avec le professeur dans la ville",
    "die kinder gehen am morgen in die schule und sie lesen bücher mit dem lehrer in der stadt",
    "as crianças caminham para a escola de manhã e leem livros com o professor na cidade",
    "i bambini camminano verso la scuola al mattino e leggono libri con il maestro nella città",
    "дети идут в школу утром и читают книги с учителем в городе каждый день недели",
    "يذهب الأطفال إلى المدرسة في الصباح ويقرؤون الكتب مع المعلم في المدينة كل يوم",
    "子供たちは朝に学校へ歩いて行き、先生と一緒に本を読みます。毎日街の中で遊びます。",
    "孩子们早上走路去学校，他们和老师一起读书。每天在城市里玩耍。",
    "아이들은 아침에 학교에 걸어가서 선생님과 함께 책을 읽습니다",
    "बच्चे सुबह स्कूल जाते हैं और शहर में शिक्षक के साथ किताबें पढ़ते हैं",
    "çocuklar sabah okula yürüyorlar ve şehirde öğretmenle birlikte kitap okuyorlar",
    "de kinderen lopen s ochtends naar school en lezen boeken met de leraar in de stad",
    "dzieci idą rano do szkoły i czytają książki z nauczycielem w mieście",
    "anak anak berjalan ke sekolah pada pagi hari dan membaca buku dengan guru di kota",
    "a gyerekek reggel iskolába sétálnak és a tanárral együtt könyveket olvasnak a városban",
    "lapset kävelevät kouluun aamulla ja lukevat kirjoja opettajan kanssa kaupungissa",
    "barnen går till skolan på morgonen och läser böcker med läraren i staden",
    "những đứa trẻ đi bộ đến trường vào buổi sáng và đọc sách với giáo viên trong thành phố",
    "τα παιδιά περπατούν στο σχολείο το πρωί και διαβάζουν βιβλία με τον δάσκαλο στην πόλη",
    "qzxv wkjt pffq zzzy xxkw 12345 98765 !!!",
    "børnene går i skole om morgenen og de læser bøger med læreren inde i byen",
    "barna går til skolen om morgenen og leser bøker sammen med læreren sin i byen",
    "děti chodí ráno do školy a čtou si knihy s učitelem ve městě",
    "copiii merg dimineața la școală și citesc cărți cu profesorul în oraș",
    "діти йдуть вранці до школи і читають книжки з учителем у місті",
    "เด็กเดินไปโรงเรียนในตอนเช้าและอ่านหนังสือกับครูในเมือง",
    "הילדים הולכים לבית הספר בבוקר וקוראים ספרים עם המורה בעיר",
    "börnin ganga í skólann á morgnana og lesa bækur með kennaranum í bænum",
    "децата вървят сутрин към училището и четат книги с учителя в града",
    "watoto wanatembea kwenda shule asubuhi na kusoma vitabu na mwalimu mjini",
    "vaikai ryte eina į mokyklą ir skaito knygas su mokytoju mieste",
    // batch 3 (the sw/lt lines above graduated from rejection plants to
    // real labels when the snapshot widened to 40 languages)
    "els nens caminen cap a l escola al matí i llegeixen llibres amb el mestre",
    "djeca ujutro hodaju u školu i čitaju knjige s učiteljem u gradu",
    "деца ујутру пешаче у школу и читају књиге са учитељем у граду",
    "deti ráno kráčajú do školy a čítajú knihy s učiteľom v meste",
    "otroci zjutraj hodijo v šolo in berejo knjige z učiteljem v mestu",
    "bērni no rīta iet uz skolu un lasa grāmatas ar skolotāju pilsētā",
    "lapsed kõnnivad hommikul kooli ja loevad koos õpetajaga raamatuid",
    "بچه ها صبح پیاده به مدرسه می روند و با معلم در شهر کتاب می خوانند",
    // batch 4 (r17): Indic + SEA — seven unique scripts plus the
    // measured cousins mr (Devanagari vs hi) and ur (Arabic script vs
    // ar/fa) and tl; ms deliberately excluded (the id macrolanguage
    // limit measured in tools/gen_lang_profiles.py)
    "শিশুরা সকালে হেঁটে স্কুলে যায় এবং শহরে শিক্ষকের সাথে বই পড়ে",
    "குழந்தைகள் காலையில் பள்ளிக்கு நடந்து செல்கிறார்கள் நகரத்தில் ஆசிரியருடன் புத்தகங்கள் படிக்கிறார்கள்",
    "పిల్లలు ఉదయం బడికి నడిచి వెళతారు నగరంలో ఉపాధ్యాయుడితో పుస్తకాలు చదువుతారు",
    "കുട്ടികൾ രാവിലെ സ്കൂളിലേക്ക് നടന്നു പോകുന്നു നഗരത്തിൽ അധ്യാപകനോടൊപ്പം പുസ്തകങ്ങൾ വായിക്കുന്നു",
    "मुले सकाळी चालत शाळेत जातात आणि शहरात शिक्षकांसोबत पुस्तके वाचतात",
    "બાળકો સવારે ચાલીને શાળાએ જાય છે અને શહેરમાં શિક્ષક સાથે પુસ્તકો વાંચે છે",
    "ಮಕ್ಕಳು ಬೆಳಿಗ್ಗೆ ಶಾಲೆಗೆ ನಡೆದು ಹೋಗುತ್ತಾರೆ ನಗರದಲ್ಲಿ ಶಿಕ್ಷಕರೊಂದಿಗೆ ಪುಸ್ತಕಗಳನ್ನು ಓದುತ್ತಾರೆ",
    "ਬੱਚੇ ਸਵੇਰੇ ਤੁਰ ਕੇ ਸਕੂਲ ਜਾਂਦੇ ਹਨ ਅਤੇ ਸ਼ਹਿਰ ਵਿੱਚ ਅਧਿਆਪਕ ਨਾਲ ਕਿਤਾਬਾਂ ਪੜ੍ਹਦੇ ਹਨ",
    "بچے صبح پیدل اسکول جاتے ہیں اور شہر میں استاد کے ساتھ کتابیں پڑھتے ہیں",
    "ang mga bata ay naglalakad papunta sa paaralan sa umaga at nagbabasa ng mga libro kasama ang guro sa lungsod",
    // batch 5 (r17): Georgian and Armenian GRADUATE from the rejection
    // set (unique scripts — the sw/lt/et/ca batch-3 move again);
    // Nepali is the measured Devanagari cousin of hi/mr, separated by
    // its हरू plurals and छन्/गर्छ verb grams
    "ბავშვები დილით სკოლაში მიდიან და კითხულობენ წიგნებს მასწავლებელთან ერთად",
    "երեխաները առավոտյան դպրոց են գնում և գրքեր են կարդում ուսուցչի հետ",
    "बालबालिका बिहान हिँडेर विद्यालय जान्छन् र सहरमा शिक्षकसँग किताबहरू पढ्छन्",
    // batch 6 (r18): am km lo si my — the former rejection stressors
    // graduate with their unique scripts (Ethiopic, Khmer, Lao,
    // Sinhala, Myanmar), the batch-3/4/5 move again
    "ልጆቹ ጠዋት ወደ ትምህርት ቤት ይሄዳሉ እና በከተማው ውስጥ ከመምህሩ ጋር መጽሐፍትን ያነባሉ",
    "ក្មេងៗដើរទៅសាលារៀននៅពេលព្រឹក ហើយអានសៀវភៅជាមួយគ្រូនៅក្នុងទីក្រុង",
    "ເດັກນ້ອຍຍ່າງໄປໂຮງຮຽນໃນຕອນເຊົ້າ ແລະອ່ານປຶ້ມກັບຄູໃນເມືອງ",
    "ළමයි උදේට පයින් පාසලට යනවා සහ නගරයේ ගුරුවරයා එක්ක පොත් කියවනවා",
    "ကလေးများသည် မနက်ပိုင်းတွင် ကျောင်းသို့ လမ်းလျှောက်သွားပြီး မြို့ထဲတွင် ဆရာနှင့်အတူ စာအုပ်များ ဖတ်ကြသည်",
    // fresh out-of-profile rejection plants: unseen Latin (Basque) and
    // an unseen script (Tibetan — Khmer graduated in batch 6)
    "haurrak goizean eskolara oinez joaten dira eta liburuak irakurtzen dituzte irakaslearekin",
    "བྱིས་པ་ཚོ་ཞོགས་པར་སློབ་གྲྭར་འགྲོ་ནས་དགེ་རྒན་དང་མཉམ་དུ་དཔེ་ཆ་ཀློག་གི་ཡོད")

  /** Expected label per [[langPlants]] index — the ground truth the
    * calibration query scores against (the garbage line and the
    * trailing Basque/Georgian plants are out-of-profile and must
    * reject to 'und'). */
  private val langPlantExpected: Seq[String] = Seq(
    "en", "es", "fr", "de", "pt", "it", "ru", "ar", "ja", "zh",
    "ko", "hi", "tr", "nl", "pl", "id", "hu",
    "fi", "sv", "vi", "el", "und",
    "da", "no", "cs", "ro", "uk", "th", "he", "is", "bg",
    "sw", "lt",
    "ca", "hr", "sr", "sk", "sl", "lv", "et", "fa",
    "bn", "ta", "te", "ml", "mr", "gu", "kn", "pa", "ur", "tl",
    "ka", "hy", "ne",
    "am", "km", "lo", "si", "my",
    "und", "und")

  /** Byte framing per [[langPlants]] index for q_pipeline_crawl_bytes:
    * script-native legacy charsets where the text_from_bytes decode
    * ladder supports them (the language gate must pick each from its
    * bytes), windows-1252 where the plant is representable (the Latin
    * legacy arm), UTF-16LE with BOM otherwise (el/he/th and the
    * non-cp1252 Latin diacritics) — every framing decodes back to the
    * exact plant string, so the capstone output is byte-identical to
    * the text-fed variant's. */
  private lazy val langPlantBytes: Seq[Array[Byte]] = {
    import java.nio.charset.Charset
    val native = Map("ja" -> "Shift_JIS", "zh" -> "GB18030",
      "ko" -> "EUC-KR", "ru" -> "windows-1251", "uk" -> "windows-1251",
      "bg" -> "windows-1251", "sr" -> "windows-1251",
      // r17 single-byte script + Latin rungs (every plant verified to
      // round-trip its charset; fa/ro are NOT encodable in theirs —
      // U+06CC Farsi yeh, U+021B comma-below — and keep UTF-16)
      "el" -> "windows-1253", "he" -> "windows-1255",
      "ar" -> "windows-1256", "th" -> "x-windows-874",
      "tr" -> "ISO-8859-9", "pl" -> "windows-1250",
      "cs" -> "ISO-8859-2", "sk" -> "windows-1250",
      "sl" -> "ISO-8859-2", "hr" -> "windows-1250",
      "hu" -> "ISO-8859-2")
    langPlants.zip(langPlantExpected).map { case (t, lang) =>
      native.get(lang) match {
        case Some(n) => t.getBytes(Charset.forName(n))
        case None =>
          val cp1252 = Charset.forName("windows-1252")
          if (cp1252.newEncoder().canEncode(t)) t.getBytes(cp1252)
          else Array[Byte](0xff.toByte, 0xfe.toByte) ++
            t.getBytes(Charset.forName("UTF-16LE"))
      }
    }
  }

  /** The 24-arm planted byte corpus shared by q_text_from_bytes and
    * q_text_rungs — one framing per doc_id % 24; every arm's expected
    * decode AND exit rung are closed-form by construction. */
  private def plantedBytes24: Column =
    when(col("doc_id") % 24 === 0, encode(col("text"), "UTF-8"))
        .when(col("doc_id") % 24 === 1,
          unhex(lit("636166E92064E96AE020767520393525206E61EF7665")))
        .when(col("doc_id") % 24 === 2,
          unhex(lit("636166C383C2A92064C383C2A96AC383C2A020767520393525206E61C383C2AF7665")))
        .when(col("doc_id") % 24 === 3,
          unhex(lit("636166C383C692C382C2A92064C383C692C382C2A96AC383C692C382C2A020767520393525206E61C383C692C382C2AF7665")))
        .when(col("doc_id") % 24 === 4, unhex(lit("FFFEFA")))
        .when(col("doc_id") % 24 === 5, encode(lit(""), "UTF-8"))
        .when(col("doc_id") % 24 === 6,
          unhex(lit("8E718B9F82BD82BF82CD92A982C98A778D5A82D695E082A282C48D7382AB82DC82B7814290E690B682C688EA8F8F82C9967B82F093C782DD82DC82B78142")))
        .when(col("doc_id") % 24 === 7,
          unhex(lit("BBD2B6A1A4BFA4C1A4CFC4ABA4CBB3D8B9BBA4D8CAE2A4A4A4C6B9D4A4ADA4DEA4B9A1A3C0E8C0B8A4C8B0ECBDEFA4CBCBDCA4F2C6C9A4DFA4DEA4B9A1A3")))
        .when(col("doc_id") % 24 === 8,
          unhex(lit("BEC6C0CCB5E9C0BA20BEC6C4A7BFA120C7D0B1B3BFA120B0C9BEEEB0A1BCAD20BCB1BBFDB4D4B0FA20C7D4B2B220C3A5C0BB20C0D0BDC0B4CFB4D9")))
        .when(col("doc_id") % 24 === 9,
          unhex(lit("BAA2D7D3C3C7D4E7C9CFD7DFC2B7C8A5D1A7D0A3CBFBC3C7BACDC0CFCAA6D2BBC6F0B6C1CAE9C3BFCCECD4DAB3C7CAD0C0EFCDE6")))
        .when(col("doc_id") % 24 === 10,
          unhex(lit("ABC4A46CADCCA6ADA457A8ABB8F4A568BEC7AED5A54CADCCA94DA6D1AE76A440B05FC5AAAED1A843A4D1A662ABB0A5ABB8CCAAB1")))
        .when(col("doc_id") % 24 === 11,
          unhex(lit("E4B3F2E820E9E4F3F2FC20E2F0E0EDF6B320E4EE20F8EAEEEBE820B320F7E8F2E0FEF2FC20EAEDE8E6EAE820E720F3F7E8F2E5EBE5EC20F320ECB3F1F2B3")))
        .when(col("doc_id") % 24 === 12,
          unhex(lit("FFFE630061006600E9002000B403BF03BA03B903BC03AE032000420435043A0441044204")))
        .when(col("doc_id") % 24 === 13,
          unhex(lit("FEFF00630061006600E9002003B403BF03BA03B903BC03AE002004420435043A04410442")))
        // the rest of the single-byte Cyrillic family (r16): KOI8-R
        // Russian and ISO-8859-5 Bulgarian — both decode EVERY byte
        // under cp1251 too, so only the language gate separates the
        // mappings (cross-decodes measure 513-836 normalized distance
        // vs 160-255 for the true mapping)
        .when(col("doc_id") % 24 === 14,
          unhex(lit("C4C5D4C920C9C4D5D420D720DBCBCFCCD520D5D4D2CFCD20C920DEC9D4C1C0D420CBCEC9C7C920D320D5DEC9D4C5CCC5CD20D720C7CFD2CFC4C5")))
        .when(col("doc_id") % 24 === 15,
          unhex(lit("D4D5E6D0E2D020D2EAE0D2EFE220E1E3E2E0D8DD20DAEADC20E3E7D8DBD8E9D5E2DE20D820E7D5E2D0E220DADDD8D3D820E120E3E7D8E2D5DBEF20D220D3E0D0D4D0")))
        // r17 single-byte script rungs
        .when(col("doc_id") % 24 === 16, // windows-1253 Greek
          unhex(lit("F4E120F0E1E9E4E9DC20F0E5F1F0E1F4EFFDED20F3F4EF20F3F7EFEBE5DFEF20F4EF20F0F1F9DF20EAE1E920E4E9E1E2DCE6EFF5ED20E2E9E2EBDFE120ECE520F4EFED20E4DCF3EAE1EBEF20F3F4E7ED20F0FCEBE7")))
        .when(col("doc_id") % 24 === 17, // windows-1255 Hebrew
          unhex(lit("E4E9ECE3E9ED20E4E5ECEBE9ED20ECE1E9FA20E4F1F4F820E1E1E5F7F820E5F7E5F8E0E9ED20F1F4F8E9ED20F2ED20E4EEE5F8E420E1F2E9F8")))
        .when(col("doc_id") % 24 === 18, // windows-1256 Arabic
          unhex(lit("EDD0E5C820C7E1C3D8DDC7E120C5E1EC20C7E1E3CFD1D3C920DDED20C7E1D5C8C7CD20E6EDDED1C4E6E420C7E1DFCAC820E3DA20C7E1E3DAE1E320DDED20C7E1E3CFEDE4C920DFE120EDE6E3")))
        .when(col("doc_id") % 24 === 19, // windows-874 Thai
          unhex(lit("E0B4E7A1E0B4D4B9E4BBE2C3A7E0C3D5C2B9E3B9B5CDB9E0AAE9D2E1C5D0CDE8D2B9CBB9D1A7CAD7CDA1D1BAA4C3D9E3B9E0C1D7CDA7")))
        // r17 Latin rungs — these pages also READ as their language
        // under cp1252 (wrong glyphs); distance must pick the truth
        .when(col("doc_id") % 24 === 20, // ISO-8859-9 Turkish
          unhex(lit("E76F63756B6C6172207361626168206F6B756C612079FC72FC796F726C617220766520FE65686972646520F6F07265746D656E6C65206269726C696B7465206B69746170206F6B75796F726C6172")))
        .when(col("doc_id") % 24 === 21, // windows-1250 Polish
          unhex(lit("647A69656369206964B92072616E6F20646F20737A6B6FB379206920637A7974616AB9206B7369B9BF6B69207A206E6175637A796369656C656D2077206D69659C636965")))
        .when(col("doc_id") % 24 === 22, // ISO-8859-2 Czech
          unhex(lit("64EC74692063686F64ED2072E16E6F20646F20B96B6F6C79206120E8746F75207369206B6E69687920732075E86974656C656D207665206DEC7374EC")))
        .otherwise( // ISO-8859-2 Hungarian
          unhex(lit("612067796572656B656B2072656767656C2069736B6F6CE162612073E974E16C6E616B20E97320612074616EE17272616C20656779FC7474206BF66E7976656B6574206F6C7661736E616B20612076E1726F7362616E")))

  /** The crawl-ingest capstone chain over a caller-supplied payload
    * column `t0` (the planted text for q_pipeline_crawl, its
    * text_from_bytes decode for q_pipeline_crawl_bytes) — ONE composed
    * plan in the CCNet stage order: HTML wrap → block-structured
    * extraction (html_to_text) → URL hygiene (canonicalize →
    * registrable-domain blocklist → eTLD+1 cap) → within-doc line
    * dedup → corpus-wide paragraph dedup → language-ID rejection gate
    * → quality gate → exact-fingerprint decontamination → temperature
    * mix by detected language. */
  private def crawlCapstone(s: SparkSession, dir: String, t0: Column): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    // RAW page markup (r17): chrome the block extractor must DROP whole
    // (head/style/title, the nav menu, the script with a stray '<'),
    // block structure it must KEEP as lines (h1 / p / div boundaries), a
    // repeated promo div (within-doc dedup food), a copyright div shared
    // across docs (corpus-wide keep-first food), and the entity gauntlet
    // arm. html_to_text — not stripHtml — is the extraction rung: its
    // per-line collapse preserves exactly the line units the paragraph
    // tiers below operate on, so those stages do real work on raw HTML.
    val html = concat(
      lit("<html><head><style>p{color:red}</style><title>Site</title>" +
        "</head><body><nav>site menu home about</nav><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><div>recommended for you</div><p>"), t0,
      lit("</p><div>recommended for you</div>" +
        "<script>var x = 1 < 2;</script>"),
      when(col("doc_id") % 3 === 0,
        lit("<p>A &amp; B &lt;tag&gt; &#8217;s &nbsp;end</p>"))
        .otherwise(lit("")),
      lit("<div>copyright "), (col("doc_id") % 7).cast("string"),
      lit("</div></body></html>"))
    val framed = d.select(col("doc_id"), plantedShardUrl.as("url"),
      TextOps.htmlToText(html).as("text"))
    // registrable-domain blocklist: the spam apex collapses every shard;
    // one github tenant drops alone (private suffix keeps siblings)
    val blocked = Seq("spam.co.uk", "www.u7.github.io").toDF("host")
    val unblocked = Corpus.filterBlockedUrls(
      framed, "url", blocked, matchRegistrable = true)
    val domained = unblocked.withColumn("domain",
      coalesce(
        TextOps.registrableDomain(
          TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))),
        TextOps.urlHost(TextOps.canonicalizeUrl(col("url")))))
    val capped = Corpus.capPerGroup(domained, "domain", 10, col("doc_id").asc)
    // CCNet stage order (r17): line-level dedup BEFORE language-ID.
    // The promo/copyright chrome the extractor surfaces as real lines
    // would otherwise pollute classification — measured with the
    // calibration replay: with the boilerplate lines attached, every
    // non-Latin plant rejects to 'und'; after keep-first dedup strips
    // them, classification sees `Doc N` + the plant, the exact r16
    // gate behavior. (This is CCNet's published motivation for
    // deduplicating paragraphs before fastText LID.)
    val within = Dedup.paragraphDedupWithinDoc(capped, "doc_id", "text")
    val deduped = Dedup.paragraphDedup(within, "doc_id", "text")
      .join(capped.select("doc_id", "domain"), Seq("doc_id"))
    val langed = deduped
      .withColumn("lang", TextOps.langIdNgram(col("text")))
      .where(col("lang") =!= "und")
    val gate = TextOps.curationGate(langed, "doc_id", "text",
      TextOps.CurationRules(
        minTokens = 8, maxTopTokenFrac = 0.5, maxDupBigramFrac = 0.5))
    val gated = langed.join(gate.where(col("keep")).select("doc_id"), Seq("doc_id"))
    // decontamination: the %97 docs ARE the benchmark; any surviving doc
    // whose cleaned text fingerprint matches a suite member drops
    val suite = gated.where(col("doc_id") % 97 === 0)
      .select(TextOps.fingerprint(col("text")).as("_fp")).distinct()
    val decon = gated
      .withColumn("_fp", TextOps.fingerprint(col("text")))
      .join(broadcast(suite), Seq("_fp"), "left_anti")
      .drop("_fp")
    Corpus.sampleByTemperature(decon, "doc_id", "lang", temperature = 2.0)
      .select("doc_id", "lang", "domain", "text")
      .orderBy("doc_id")
  }

  /** Shared oracle for q_pipeline_crawl and q_pipeline_crawl_bytes
    * (the byte framings decode losslessly, so one CTE chain replays
    * both): plants, the closed-form extracted line list (html_to_text's
    * behavior on the generated markup is pinned arm-by-arm in
    * q_text_html_blocks), PSL walk, dedup tiers, lang gate, quality,
    * decontamination, temperature mix — the CCNet stage order. */
  private lazy val pipelineCrawlOracle: String =
      s"""WITH psl AS (SELECT * FROM ${graft.model.PublicSuffix.oracleValuesSql}),
         |lp AS (SELECT * FROM ${graft.model.LangProfiles.oracleValuesSql}),
         |lc AS (SELECT * FROM ${graft.model.LangProfiles.cutoffValuesSql}),
         |langs AS (SELECT DISTINCT lang FROM lp),
         |u AS (SELECT doc_id,
         |    CASE WHEN doc_id % 6 <= 1 THEN 'https://a' || CAST(doc_id % 97 AS VARCHAR)
         |           || '.spam.co.uk/p/' || CAST(doc_id AS VARCHAR)
         |         WHEN doc_id % 6 = 2 THEN 'https://u' || CAST(doc_id % 40 AS VARCHAR)
         |           || '.github.io/x'
         |         WHEN doc_id % 6 = 3 THEN 'https://sub.shop' || CAST(doc_id % 5 AS VARCHAR)
         |           || '.ck/x'
         |         WHEN doc_id % 6 = 4 THEN 'http://www.ck/x'
         |         ELSE 'https://w' || CAST(doc_id % 8 AS VARCHAR)
         |           || '.site' || CAST(doc_id % 7 AS VARCHAR) || '.com/x'
         |    END AS url FROM documents),
         |pt AS (SELECT doc_id, ${langPlantCase("text")} AS t0 FROM documents),
         |txt AS (SELECT doc_id,
         |    'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
         |    'recommended for you' || chr(10) || t0 || chr(10) ||
         |    'recommended for you' || chr(10) ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN 'A & B <tag> ’s end' || chr(10) ELSE '' END ||
         |    'copyright ' || CAST(doc_id % 7 AS VARCHAR) AS text FROM pt),
         |ul AS (SELECT doc_id,
         |         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
         |         string_split(lower(regexp_extract(url,
         |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)), '.') AS ls
         |       FROM u),
         |uc AS (SELECT doc_id, host, ls, len(ls) AS n,
         |         unnest(generate_series(1, len(ls))) AS i FROM ul),
         |ucs AS (SELECT doc_id, ls, n, i,
         |          array_to_string(ls[i:], '.') AS suffix,
         |          CASE WHEN i < n THEN array_to_string(ls[i+1:], '.') END AS parent
         |        FROM uc),
         |um AS (SELECT ucs.doc_id, ucs.i,
         |         CASE WHEN x.rule IS NOT NULL THEN ucs.i + 1
         |              WHEN r.rule IS NOT NULL THEN ucs.i
         |              WHEN w.rule IS NOT NULL THEN ucs.i END AS ps
         |       FROM ucs
         |       LEFT JOIN psl x ON x.kind = 'x' AND x.rule = ucs.suffix
         |       LEFT JOIN psl r ON r.kind = 'r' AND r.rule = ucs.suffix
         |       LEFT JOIN psl w ON w.kind = 'w' AND w.rule = ucs.parent),
         |upick AS (SELECT doc_id, min(CASE WHEN ps IS NOT NULL THEN i END) AS mi
         |          FROM um GROUP BY doc_id),
         |ureg AS (SELECT l.doc_id, l.host,
         |           coalesce(
         |             CASE WHEN coalesce(m.ps, len(l.ls)) >= 2
         |                  THEN array_to_string(l.ls[coalesce(m.ps, len(l.ls)) - 1:], '.')
         |             END, l.host) AS domain
         |         FROM ul l JOIN upick p ON p.doc_id = l.doc_id
         |         LEFT JOIN um m ON m.doc_id = l.doc_id AND m.i = p.mi),
         |ub AS (SELECT doc_id, domain FROM ureg
         |       WHERE domain NOT IN ('spam.co.uk', 'u7.github.io')),
         |ucap AS (SELECT doc_id, domain FROM (
         |           SELECT doc_id, domain,
         |                  row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
         |           FROM ub) WHERE rn <= 10),
         |base AS MATERIALIZED (SELECT c.doc_id, c.domain, t.text FROM ucap c
         |         JOIN txt t ON t.doc_id = c.doc_id),
         |wl AS (SELECT doc_id, i, line FROM (
         |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         |         generate_subscripts(string_split(text, chr(10)), 1) AS i
         |  FROM base)),
         |wk AS (SELECT doc_id, i, line FROM (
         |  SELECT doc_id, i, line,
         |         row_number() OVER (PARTITION BY doc_id, line ORDER BY i) AS rn
         |  FROM wl) WHERE rn = 1),
         |wr AS MATERIALIZED (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
         |       FROM wk GROUP BY doc_id),
         |pl2 AS (SELECT doc_id, i - 1 AS pos, line FROM (
         |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         |         generate_subscripts(string_split(text, chr(10)), 1) AS i
         |  FROM wr)),
         |pk2 AS (SELECT doc_id, pos, line FROM (
         |  SELECT doc_id, pos, line,
         |         row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
         |  FROM pl2) WHERE rn = 1),
         |pr2 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
         |        FROM pk2 GROUP BY doc_id),
         |paraed AS MATERIALIZED (SELECT w.doc_id, b.domain, coalesce(p.text, '') AS text
         |           FROM wr w
         |           JOIN base b ON b.doc_id = w.doc_id
         |           LEFT JOIN pr2 p ON p.doc_id = w.doc_id),
         |lgsrc AS (SELECT doc_id, text AS txt FROM paraed),
         |${langidClassifyCtes("lg", "lgsrc")},
         |langed AS (SELECT b.doc_id, b.domain, b.text,
         |    CASE WHEN lb.lang IS NULL THEN 'und'
         |         WHEN lb.dist * 1000 > lgdm.m * ${graft.model.LangProfiles.profileSize} * c.cut THEN 'und'
         |         ELSE lb.lang END AS lang
         |  FROM paraed b
         |  LEFT JOIN lgbest lb ON lb.doc_id = b.doc_id AND lb.rn = 1
         |  LEFT JOIN lgdm ON lgdm.doc_id = b.doc_id
         |  LEFT JOIN lc c ON c.lang = lb.lang),
         |lkept AS MATERIALIZED (SELECT * FROM langed WHERE lang <> 'und'),
         |qt AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM lkept),
         |qcnt AS (SELECT doc_id, tok, count(*) AS c
         |         FROM (SELECT doc_id, unnest(ts) AS tok FROM qt) GROUP BY doc_id, tok),
         |qrep AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS ttf
         |         FROM qcnt GROUP BY doc_id),
         |qg AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
         |       FROM (SELECT doc_id, ts,
         |               unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i FROM qt)),
         |qd AS (SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS DOUBLE) / count(*) AS dbf
         |       FROM qg GROUP BY doc_id),
         |qr AS (SELECT qt.doc_id,
         |         concat_ws(',',
         |           CASE WHEN len(qt.ts) < 8 THEN 'too_few_tokens' END,
         |           CASE WHEN qrep.ttf > 0.5 THEN 'top_token_frac' END,
         |           CASE WHEN coalesce(qd.dbf, 0.0) > 0.5 THEN 'dup_2gram_frac' END) AS reasons
         |       FROM qt JOIN qrep ON qrep.doc_id = qt.doc_id
         |       LEFT JOIN qd ON qd.doc_id = qt.doc_id),
         |qkept AS MATERIALIZED (SELECT l.doc_id, l.lang, l.domain, l.text
         |          FROM lkept l JOIN qr ON qr.doc_id = l.doc_id
         |          WHERE qr.reasons = ''),
         |suite AS (SELECT DISTINCT
         |            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |          FROM qkept WHERE doc_id % 97 = 0),
         |dec AS MATERIALIZED (SELECT p.doc_id, p.lang, p.domain, p.text FROM qkept p
         |        LEFT JOIN suite s
         |          ON s.fp = md5(regexp_replace(lower(trim(p.text)), '\\s+', ' ', 'g'))
         |        WHERE s.fp IS NULL),
         |tgrp AS (SELECT lang, count(*) AS n_rows FROM dec GROUP BY lang),
         |ttot AS (SELECT SUM(n_rows) AS tn FROM tgrp),
         |traw AS (SELECT lang,
         |           pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
         |         FROM tgrp CROSS JOIN ttot),
         |tmx AS (SELECT MAX(w) AS mw FROM traw),
         |trates AS (SELECT lang,
         |             CAST(round(round(w / mw, 6) * 10000) AS BIGINT) AS thr
         |           FROM traw CROSS JOIN tmx),
         |mixed AS (SELECT dec.* FROM dec JOIN trates rt ON rt.lang = dec.lang
         |          WHERE ('0x' || substr(md5('sample::' || CAST(dec.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < rt.thr)
         |SELECT doc_id, lang, domain, text FROM mixed
         |ORDER BY doc_id""".stripMargin

  /** The lang-id plant as a CASE over doc_id (every fifth doc replaced by
    * a [[langPlants]] entry in rotation). */
  private def langPlantCase(textExpr: String): String = {
    val plantArms = langPlants.zipWithIndex.map { case (t, i) =>
      s"      WHEN $i THEN '$t'"
    }.mkString("\n")
    s"""CASE WHEN doc_id % 5 = 0 THEN
       |    CASE CAST((doc_id // 5) % ${langPlants.size} AS INT)
       |$plantArms
       |    END
       |  ELSE $textExpr END""".stripMargin
  }

  /** Classifier CTE chain over `src` (a relation exposing doc_id, txt),
    * prefixed so multiple classifications can coexist in one oracle:
    * normalize, codepoint 1–3-grams, rank-64 doc profile, out-of-place
    * distance vs the rank-512 `lp` profile relation (absent penalty =
    * profileSize), per-doc gram count `<p>dm`, distances ranked by
    * (dist asc, lang asc) in `<p>best`. Requires `lp` and `langs` CTEs
    * in scope. */
  private def langidClassifyCtes(p: String, src: String): String =
    s"""${p}norm AS (SELECT doc_id,
       |           ' ' || trim(regexp_replace(lower(txt), '\\s+', ' ', 'g')) || ' ' AS t
       |         FROM $src),
       |${p}tg AS (SELECT doc_id, substring(t, s.i, ll.l) AS g
       |       FROM ${p}norm, range(1, 4) ll(l),
       |            UNNEST(generate_series(1, len(t))) s(i)
       |       WHERE len(t) >= 3 AND s.i + ll.l - 1 <= len(t)),
       |${p}tc AS (SELECT doc_id, g, count(*) AS c FROM ${p}tg GROUP BY doc_id, g),
       |${p}dr AS MATERIALIZED (SELECT doc_id, g, r FROM (
       |         SELECT doc_id, g,
       |                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS r
       |         FROM ${p}tc) WHERE r <= ${graft.model.LangProfiles.rankSize}),
       |${p}dm AS (SELECT doc_id, count(*) AS m FROM ${p}dr GROUP BY doc_id),
       |${p}dist AS (SELECT d.doc_id, l.lang,
       |           SUM(CASE WHEN pr.r IS NULL THEN ${graft.model.LangProfiles.profileSize}
       |               ELSE abs(d.r - pr.r) END) AS dist
       |         FROM ${p}dr d CROSS JOIN langs l
       |         LEFT JOIN lp pr ON pr.lang = l.lang AND pr.g = d.g
       |         GROUP BY d.doc_id, l.lang),
       |${p}best AS (SELECT doc_id, lang, dist,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, lang ASC) AS rn
       |         FROM ${p}dist)""".stripMargin

  /** Shared CTE chain for the two standalone lang-id oracles: profile +
    * cutoff relations, the plant, and the unprefixed classifier chain. */
  private def langidCtes: String =
    s"""lp AS (SELECT * FROM ${graft.model.LangProfiles.oracleValuesSql}),
       |lc AS (SELECT * FROM ${graft.model.LangProfiles.cutoffValuesSql}),
       |langs AS (SELECT DISTINCT lang FROM lp),
       |pl AS (SELECT doc_id, ${langPlantCase("text")} AS txt FROM documents),
       |${langidClassifyCtes("", "pl")}""".stripMargin

  private def plantedPctUrl: Column =
    when(col("doc_id") % 4 === 0,
      concat(lit("HTTPS://Site"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/page/"), (col("doc_id") % 50).cast("string"),
        lit("/?utm_source=tw&b=2&a=1#sec")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
          lit(".com/p%61ge/"), (col("doc_id") % 50).cast("string"),
          lit("?%61=1&b=2")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("HTTP://Site"), (col("doc_id") % 7).cast("string"),
          lit(".com:80/page/"), (col("doc_id") % 50).cast("string"),
          lit("/index.html?gclid=xyz&x=%2fv%3a7")))
      .otherwise(
        concat(lit("http://site"), (col("doc_id") % 7).cast("string"),
          lit(".com:8080/p%61ge/%7E"), (col("doc_id") % 50).cast("string"),
          lit("#frag")))

  /** Adversarial URL plant for the eTLD+1 cap: subdomain shards of one
    * spam site under a multi-label public suffix (must COLLAPSE), hosting-
    * platform tenants (must stay DISTINCT — the suffix is public), a
    * wildcard-rule host, an exception-rule host, and ordinary sharded
    * `.com` subdomains (the implicit-`*` fallback). The oracle replays it
    * as a CASE over doc_id % 6. */
  private def plantedShardUrl: Column =
    when(col("doc_id") % 6 <= 1,
      concat(lit("https://a"), (col("doc_id") % 97).cast("string"),
        lit(".spam.co.uk/p/"), col("doc_id").cast("string")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://u"), (col("doc_id") % 40).cast("string"),
          lit(".github.io/x")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("https://sub.shop"), (col("doc_id") % 5).cast("string"),
          lit(".ck/x")))
      .when(col("doc_id") % 6 === 4, lit("http://www.ck/x"))
      .otherwise(
        concat(lit("https://w"), (col("doc_id") % 8).cast("string"),
          lit(".site"), (col("doc_id") % 7).cast("string"), lit(".com/x")))

  private val mutCte =
    """alldocs AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         array_to_string(string_split(text, ' ')[3:], ' ') AS text,
      |         lang, source, n_chars
      |  FROM documents)""".stripMargin

  /** Distinct word-3-shingles per doc over `src` (must expose doc_id, text). */
  private def shingleCte(src: String): String =
    s"""sh AS (
       |  SELECT id, unnest(shs) AS sh FROM (
       |    SELECT doc_id AS id,
       |           list_distinct(list_transform(range(1, len(s) - 1),
       |             i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS shs
       |    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM $src)
       |    WHERE len(s) >= 3))""".stripMargin

  /** Span-dedup window hashes over a `toks(doc_id, t)` CTE: the term-by-
    * term replay of the engine's ROLLING double-polynomial kernel
    * ([[graft.expressions.DocKernels.SpanWinHashes]]) — per-token
    * md5-derived 32-bit hash mod 2³¹−1, two polynomial sums against a
    * LITERAL power table (bases 131/137, powers precomputed here in Scala
    * so the SQL needs no recursion), packed `h1·2³¹ + h2`. Term-wise mod
    * keeps every intermediate under 2⁶²; the mod-sum equals the engine's
    * rolling accumulation exactly. Ends in `win(doc_id, p, h)`. */
  private def spanWinCte(n: Int): String = {
    val M = 2147483647L
    def pows(b: Long): IndexedSeq[Long] =
      Iterator.iterate(1L)(v => v * b % M).take(n).toIndexedSeq
    val p1 = pows(131L)
    val p2 = pows(137L)
    val rows = (0 until n)
      .map(j => s"($j, ${p1(n - 1 - j)}, ${p2(n - 1 - j)})").mkString(", ")
    s"""wpos AS (SELECT doc_id, unnest(generate_series(1, len(t) - ${n - 1})) AS p
       |         FROM toks WHERE len(t) >= $n),
       |thm AS (SELECT doc_id, generate_subscripts(t, 1) AS tp,
       |          (('0x' || substr(md5(unnest(t)), 1, 8))::BIGINT) % $M AS hm
       |        FROM toks),
       |pw(j, v1, v2) AS (SELECT * FROM (VALUES $rows)),
       |win AS (SELECT a.doc_id, a.p,
       |          (SUM((b.hm * pw.v1) % $M) % $M) * 2147483648
       |          + (SUM((b.hm * pw.v2) % $M) % $M) AS h
       |        FROM wpos a
       |        CROSS JOIN pw
       |        JOIN thm b ON b.doc_id = a.doc_id AND b.tp = a.p + pw.j
       |        GROUP BY a.doc_id, a.p)""".stripMargin
  }

  /** Winnowing fingerprints (n=3-shingles, w=4 windows) over `src` (must
    * expose doc_id, text): CTE chain ending in `${tag}fps(id, fp)` —
    * positional shingle hashes, sliding-window min, complete windows only
    * (short docs keep their single degenerate window at p=1). `tag`
    * disambiguates when two corpora are winnowed in one oracle. */
  private def winnowCte(src: String, tag: String = ""): String =
    s"""w${tag}toks AS (SELECT doc_id AS id, string_split(text, ' ') AS s FROM $src),
       |w${tag}shp AS (SELECT id, unnest(generate_series(1, len(s) - 2)) AS p, s, len(s) - 2 AS m
       |         FROM w${tag}toks WHERE len(s) >= 3),
       |w${tag}sh AS (SELECT id, p, m,
       |          ('0x' || substr(md5(s[p] || ' ' || s[p+1] || ' ' || s[p+2]), 1, 8))::BIGINT AS h
       |        FROM w${tag}shp),
       |w${tag}win AS (SELECT id, p, m,
       |           MIN(h) OVER (PARTITION BY id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |         FROM w${tag}sh),
       |${tag}fps AS (SELECT DISTINCT id, fp FROM w${tag}win WHERE p <= GREATEST(1, m - 3))""".stripMargin

  /** One unrolled Lloyd iteration: score vs `c{i-1}` → argmax cell →
    * component means as REAL (`f$i`) → re-quantized centroids (`c$i`). */
  private def kmeansIterCte(i: Int, prev: String): String =
    s"""a$i AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
       |        FROM comp c JOIN $prev ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
       |m$i AS (SELECT vec_id, cid FROM (
       |          SELECT vec_id, cid,
       |                 row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
       |          FROM a$i) WHERE rn = 1),
       |s$i AS (SELECT m.cid, c.d, SUM(c.q) AS sx, COUNT(*) AS cnt
       |        FROM m$i m JOIN comp c ON c.vec_id = m.vec_id GROUP BY m.cid, c.d),
       |f$i AS (SELECT cid, d, CAST((CAST(sx AS DOUBLE) / cnt) / 1e6 AS REAL) AS c FROM s$i),
       |c$i AS (SELECT cid, d, CAST(floor(CAST(c AS DOUBLE) * 1e6) AS BIGINT) AS q FROM f$i)""".stripMargin

  /** The k-means chain alone (expects a `comp` CTE in scope) — composable
    * with other chains that share the same quantized components. */
  private def kmeansChain(k: Int): String =
    s"""seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
       |c0 AS (SELECT s.cid, c.d, c.q FROM seed s JOIN comp c ON c.vec_id = s.vec_id),
       |${kmeansIterCte(1, "c0")},
       |${kmeansIterCte(2, "c1")}""".stripMargin

  /** [[kmeansChain]] with the cell count DERIVED in SQL — the identical
    * `max(32, ⌈√N⌉)` rule as [[graft.ops.Similarity.semanticCellCount]],
    * so the oracle's quantizer scales with the corpus exactly as the
    * Spark side's does. */
  private def kmeansChainAutoK: String =
    s"""seed AS (SELECT vec_id, rn - 1 AS cid FROM (
       |           SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings)
       |         WHERE rn <= (SELECT GREATEST(32, CAST(ceil(sqrt(count(*))) AS INT))
       |                      FROM embeddings)),
       |c0 AS (SELECT s.cid, c.d, c.q FROM seed s JOIN comp c ON c.vec_id = s.vec_id),
       |${kmeansIterCte(1, "c0")},
       |${kmeansIterCte(2, "c1")}""".stripMargin

  private def kmeansCtesAutoK: String =
    s"""${compCte("comp", "embeddings")},
       |$kmeansChainAutoK""".stripMargin

  /** Two deterministic Lloyd iterations over `embeddings` seeded with the
    * `k` lowest-id vectors — CTE chain ending in `f2` (REAL centroid
    * components) and `c2` (re-quantized for downstream scoring); mirrors
    * [[graft.ops.Similarity.trainCentroids]] exactly. */
  private def kmeansCtes(k: Int): String =
    s"""${compCte("comp", "embeddings")},
       |${kmeansChain(k)}""".stripMargin

  /** One L2 Lloyd iteration over every PQ subspace at once: `sub` rides as
    * a column, and the `ON ct.d = c.d` join confines every dot to its own
    * subspace because a codebook row only has `d` values inside its
    * subspace's range. Assignment is argmin (c·c − 2·x·c) with cid
    * tie-break — exact integers, mirrors
    * [[graft.ops.Similarity.trainCentroidsL2]]. */
  private def pqIterCte(i: Int, prev: String, sd: Int, src: String = "comp"): String =
    s"""qcc$i AS (SELECT sub, cid, SUM(q * q) AS cc FROM $prev GROUP BY sub, cid),
       |qxc$i AS (SELECT c.vec_id, ct.sub, ct.cid, SUM(c.q * ct.q) AS xc
       |          FROM $src c JOIN $prev ct ON ct.d = c.d
       |          GROUP BY c.vec_id, ct.sub, ct.cid),
       |qpm$i AS (SELECT vec_id, sub, cid FROM (
       |            SELECT x.vec_id, x.sub, x.cid,
       |                   row_number() OVER (PARTITION BY x.vec_id, x.sub
       |                     ORDER BY cc.cc - 2 * x.xc ASC, x.cid ASC) AS rn
       |            FROM qxc$i x JOIN qcc$i cc ON cc.sub = x.sub AND cc.cid = x.cid)
       |          WHERE rn = 1),
       |qps$i AS (SELECT m.sub, m.cid, c.d, SUM(c.q) AS sx, COUNT(*) AS cnt
       |          FROM qpm$i m JOIN $src c
       |            ON c.vec_id = m.vec_id AND CAST((c.d - 1) // $sd AS INT) = m.sub
       |          GROUP BY m.sub, m.cid, c.d),
       |qpf$i AS (SELECT sub, cid, d, CAST((CAST(sx AS DOUBLE) / cnt) / 1e6 AS REAL) AS c
       |          FROM qps$i),
       |qpc$i AS (SELECT sub, cid, d, CAST(floor(CAST(c AS DOUBLE) * 1e6) AS BIGINT) AS q
       |          FROM qpf$i)""".stripMargin

  /** The PQ chain alone (expects the `src` components CTE in scope —
    * `comp` for raw-vector training, a residual CTE for residual PQ). */
  private def pqChain(k: Int, sd: Int, src: String = "comp"): String =
    s"""qseed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
       |qpc0 AS (SELECT CAST((c.d - 1) // $sd AS INT) AS sub, s.cid, c.d, c.q
       |         FROM qseed s JOIN $src c ON c.vec_id = s.vec_id),
       |${pqIterCte(1, "qpc0", sd, src)},
       |${pqIterCte(2, "qpc1", sd, src)}""".stripMargin

  /** PQ codebooks after two L2 Lloyd iterations (k codes per subspace of
    * `sd` dims), seeded per subspace with the k lowest-id vectors' slices —
    * CTE chain ending in `qpc2`. */
  private def pqCtes(k: Int, sd: Int): String =
    s"""${compCte("comp", "embeddings")},
       |${pqChain(k, sd)}""".stripMargin

  /** PQ encode + per-query LUT over `qpc2` codebooks (expects `comp` and
    * the [[pqChain]] in scope): `enc(vec_id, sub, code)` and
    * `lut(qid, sub, code, pd)` for queries `vec_id < 3`. */
  private val pqEncodeLutCtes: String =
    """ecc AS (SELECT sub, cid, SUM(q * q) AS cc FROM qpc2 GROUP BY sub, cid),
      |exc AS (SELECT c.vec_id, ct.sub, ct.cid, SUM(c.q * ct.q) AS xc
      |        FROM comp c JOIN qpc2 ct ON ct.d = c.d
      |        GROUP BY c.vec_id, ct.sub, ct.cid),
      |enc AS (SELECT vec_id, sub, cid AS code FROM (
      |          SELECT x.vec_id, x.sub, x.cid,
      |                 row_number() OVER (PARTITION BY x.vec_id, x.sub
      |                   ORDER BY cc.cc - 2 * x.xc ASC, x.cid ASC) AS rn
      |          FROM exc x JOIN ecc cc ON cc.sub = x.sub AND cc.cid = x.cid)
      |        WHERE rn = 1),
      |lut AS (SELECT x.vec_id AS qid, x.sub, x.cid AS code, cc.cc - 2 * x.xc AS pd
      |        FROM exc x JOIN ecc cc ON cc.sub = x.sub AND cc.cid = x.cid
      |        WHERE x.vec_id < 3)""".stripMargin

  /** Full RESIDUAL IVF-PQ oracle (train coarse → residualize → train
    * residual codebooks → encode → probe → per-cell residual-LUT ADC
    * top-k), mirroring [[graft.ops.Similarity.ivfPqTopK]]. Shared VERBATIM
    * by `q_sim_ivfpq` (in-query training) and `q_sim_ivfpq_persisted`
    * (serving from the persisted index): the index round-trips the
    * identical trained values, so both paths must produce the identical
    * ranking. Residuals are integer-domain (q_x − q_c), and each LUT entry
    * is the FULL per-subspace squared distance over the query's residual
    * against its probed cell, so summed ADC ranks exactly across cells. */
  /** CTE chain ending in `adc(qid, vec_id, adc)` — the shared core of the
    * three IVF-PQ oracles (plain, persisted, re-rank). */
  private lazy val ivfPqAdcCtes: String =
    s"""${compCte("comp", "embeddings")},
       |${kmeansChain(8)},
       |cent AS (SELECT cid, d, q FROM c2),
       |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
       |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
       |acell AS (SELECT vec_id, cid AS cell FROM (
       |            SELECT vec_id, cid,
       |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
       |            FROM adot) WHERE rn = 1),
       |rcomp AS (SELECT c.vec_id, c.d, c.q - ct.q AS q
       |          FROM comp c
       |          JOIN acell a ON a.vec_id = c.vec_id
       |          JOIN cent ct ON ct.cid = a.cell AND ct.d = c.d),
       |${pqChain(16, 16, "rcomp")},
       |ecc AS (SELECT sub, cid, SUM(q * q) AS cc FROM qpc2 GROUP BY sub, cid),
       |exc AS (SELECT c.vec_id, ct.sub, ct.cid, SUM(c.q * ct.q) AS xc
       |        FROM rcomp c JOIN qpc2 ct ON ct.d = c.d
       |        GROUP BY c.vec_id, ct.sub, ct.cid),
       |enc AS (SELECT vec_id, sub, cid AS code FROM (
       |          SELECT x.vec_id, x.sub, x.cid,
       |                 row_number() OVER (PARTITION BY x.vec_id, x.sub
       |                   ORDER BY cc.cc - 2 * x.xc ASC, x.cid ASC) AS rn
       |          FROM exc x JOIN ecc cc ON cc.sub = x.sub AND cc.cid = x.cid)
       |        WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM (
       |             SELECT vec_id, cid,
       |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
       |             FROM adot WHERE vec_id < 3) WHERE rn <= 2),
       |rq AS (SELECT qp.qid, qp.cell, c.d, c.q - ct.q AS q
       |       FROM qprobe qp
       |       JOIN comp c ON c.vec_id = qp.qid
       |       JOIN cent ct ON ct.cid = qp.cell AND ct.d = c.d),
       |lutr AS (SELECT r.qid, r.cell, cb.sub, cb.cid AS code,
       |           SUM((r.q - cb.q) * (r.q - cb.q)) AS pd
       |         FROM rq r JOIN qpc2 cb ON cb.d = r.d
       |         GROUP BY r.qid, r.cell, cb.sub, cb.cid),
       |cand AS (SELECT qp.qid, qp.cell, a.vec_id
       |         FROM qprobe qp JOIN acell a ON a.cell = qp.cell),
       |adc AS (SELECT cd.qid, cd.vec_id, CAST(SUM(l.pd) AS BIGINT) AS adc
       |        FROM cand cd
       |        JOIN enc e ON e.vec_id = cd.vec_id
       |        JOIN lutr l ON l.qid = cd.qid AND l.cell = cd.cell
       |         AND l.sub = e.sub AND l.code = e.code
       |        GROUP BY cd.qid, cd.vec_id)""".stripMargin

  private lazy val ivfPqOracleSql: String =
    s"""WITH $ivfPqAdcCtes
       |SELECT qid, rank, vec_id, adc FROM (
       |  SELECT qid, vec_id, adc,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS INT) AS rank
       |  FROM adc) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Re-rank oracle: ADC shortlist (top 32 per query by adc asc, vec_id
    * tie-break), then EXACT integer-dot re-scoring of just that shortlist
    * — mirrors [[graft.ops.Similarity.ivfPqTopKIndexedRerank]] (shortlist
    * containment is what lifts recall; the final ranking is by exact dot
    * desc with vec_id tie-break, the [[bruteForceTopK]] contract). */
  private lazy val ivfPqRerankOracleSql: String =
    s"""WITH $ivfPqAdcCtes,
       |sl AS (SELECT qid, vec_id FROM (
       |         SELECT qid, vec_id,
       |                row_number() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS srn
       |         FROM adc) WHERE srn <= 32),
       |ex AS (SELECT s.qid, s.vec_id, CAST(SUM(cq.q * cc.q) AS BIGINT) AS dot
       |       FROM sl s
       |       JOIN comp cq ON cq.vec_id = s.qid
       |       JOIN comp cc ON cc.vec_id = s.vec_id AND cc.d = cq.d
       |       GROUP BY s.qid, s.vec_id)
       |SELECT qid, rank, vec_id, dot FROM (
       |  SELECT qid, vec_id, dot,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
       |  FROM ex) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Jaccard verification of `cand(id_a, id_b)` against `sh`. */
  private val jaccardSql =
    """sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
      |inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
      |          FROM cand c
      |          JOIN sh sa ON sa.id = c.id_a
      |          JOIN sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
      |          GROUP BY c.id_a, c.id_b),
      |jac AS (SELECT c.id_a, c.id_b,
      |          CAST(COALESCE(i.inter, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.inter, 0)) AS jaccard
      |        FROM cand c
      |        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      |        JOIN sizes na ON na.id = c.id_a
      |        JOIN sizes nb ON nb.id = c.id_b)""".stripMargin

  /**
   * Shared oracle for both connected-components queries
   * (`q_dedup_clusters` / `q_dedup_clusters_star`): blocked-Jaccard pairs,
   * then the transitive closure as a recursive CTE, labeling each doc with
   * its component minimum.
   */
  /** CTE chain ending in `reach(id, r)` — blocked-Jaccard pairs over the
    * mutated corpus, then the transitive closure (shared by the clustering
    * and canonical-survivor oracles). */
  private lazy val clusterReachCtes =
    s"""$mutCte,
       |${shingleCte("alldocs")},
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM alldocs a JOIN alldocs b
       |           ON a.lang = b.lang AND a.source = b.source
       |          AND floor(a.n_chars / 100) = floor(b.n_chars / 100)
       |          AND a.doc_id < b.doc_id),
       |$jaccardSql,
       |p AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.35),
       |e AS (SELECT id_a AS src, id_b AS dst FROM p
       |      UNION SELECT id_b AS src, id_a AS dst FROM p),
       |reach(id, r) AS (
       |  SELECT DISTINCT src, src FROM e
       |  UNION
       |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst)""".stripMargin

  private lazy val clustersOracleSql =
    s"""WITH RECURSIVE $clusterReachCtes
       |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** RM3 two-pass replay (shared by the direct and indexed serving
    * paths - the index round-trips identical postings/df/stats). */
  private lazy val rm3OracleSql =
    s"""WITH ${bm25Ctes(
           "SELECT doc_id AS qid, array_to_string(string_split(text, ' ')[1:4], ' ') AS qtext " +
             "FROM documents WHERE doc_id < 3")},
         |fb AS (SELECT qid, doc_id, score FROM bmranked WHERE rank <= 5),
         |brel AS (SELECT f.qid, p.token,
         |           round(SUM(CAST(p.tf AS DOUBLE) / p.dl * f.score), 6) AS rel
         |         FROM fb f JOIN bp p ON p.doc_id = f.doc_id
         |         GROUP BY f.qid, p.token),
         |btsel AS (SELECT qid, token, rel FROM (
         |            SELECT qid, token, rel,
         |              row_number() OVER (PARTITION BY qid ORDER BY rel DESC, token ASC) AS trn
         |            FROM brel) WHERE trn <= 10),
         |bexpw AS (SELECT qid, token,
         |            rel / SUM(rel) OVER (PARTITION BY qid) AS w_exp FROM btsel),
         |borigw AS (SELECT qid, token,
         |             CAST(1.0 AS DOUBLE) / COUNT(*) OVER (PARTITION BY qid) AS w_orig
         |           FROM bqt),
         |bwts AS (SELECT COALESCE(o.qid, e.qid) AS qid,
         |           COALESCE(o.token, e.token) AS token,
         |           round(0.5 * COALESCE(o.w_orig, 0) + 0.5 * COALESCE(e.w_exp, 0), 6) AS w
         |         FROM borigw o FULL OUTER JOIN bexpw e
         |           ON e.qid = o.qid AND e.token = o.token),
         |bsc2 AS (SELECT t.qid, p.doc_id,
         |           t.w * (ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
         |           * (CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
         |           / (CAST(p.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
         |               + 0.75 * CAST(p.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE)
         |                 / CAST(s.total_tokens AS DOUBLE)))) AS sc
         |         FROM bp p JOIN bdf f USING (token) JOIN bwts t USING (token)
         |         CROSS JOIN bstat s),
         |bagg2 AS (SELECT qid, doc_id, round(sum(sc), 4) AS score
         |          FROM bsc2 GROUP BY qid, doc_id)
         |SELECT qid, rank, doc_id, score FROM (
         |  SELECT qid, doc_id, score,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         |  FROM bagg2) WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** Canonical-survivor oracle: component labels from the closure, the
    * per-cluster survivor by (n_chars DESC, doc_id ASC), non-members pass. */
  private lazy val keepBestOracleSql =
    s"""WITH RECURSIVE $clusterReachCtes,
       |lab AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
       |surv AS (SELECT doc_id FROM (
       |           SELECT l.doc_id,
       |                  row_number() OVER (PARTITION BY l.cluster
       |                    ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn
       |           FROM lab l JOIN alldocs d ON d.doc_id = l.doc_id) WHERE rn = 1)
       |SELECT d.doc_id, d.n_chars FROM alldocs d
       |LEFT JOIN lab l ON l.doc_id = d.doc_id
       |WHERE l.doc_id IS NULL OR d.doc_id IN (SELECT surv.doc_id FROM surv)
       |ORDER BY d.doc_id""".stripMargin

  /** Quantized components (vec_id, d, q) over embedding relation `src`. */
  /** Hashed-NB CTE chain: trains on the `doc_id % 10 < 8` slice (lang as
    * the label, 2¹⁸ md5 buckets), scores the held-out slice — replays
    * [[graft.ops.TextOps.nbTrain]]/`nbPredict` exactly (same rearranged
    * add-one posterior, same 4-dp round-then-argmax, label-asc ties).
    * Yields `nbpred(doc_id, pred, score)`. */
  private def nbCtes: String =
    """train AS (SELECT lang AS label, text FROM documents WHERE doc_id % 10 < 8),
      |tt AS (SELECT label,
      |         ('0x' || substr(md5('nb::' || token), 1, 8))::BIGINT % 262144 AS bucket
      |       FROM (SELECT label, unnest(string_split(text, ' ')) AS token FROM train)),
      |counts AS (SELECT label, bucket, count(*) AS cnt FROM tt GROUP BY label, bucket),
      |stats AS (SELECT t.label, t.nd, COALESCE(c.nt, 0) AS nt
      |          FROM (SELECT label, count(*) AS nd FROM train GROUP BY label) t
      |          LEFT JOIN (SELECT label, sum(cnt) AS nt FROM counts GROUP BY label) c
      |            USING (label)),
      |tot AS (SELECT SUM(nd) AS n FROM stats),
      |test AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
      |dt AS (SELECT doc_id,
      |         ('0x' || substr(md5('nb::' || token), 1, 8))::BIGINT % 262144 AS bucket
      |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM test)),
      |dlen AS (SELECT doc_id, count(*) AS dn FROM dt GROUP BY doc_id),
      |matched AS (SELECT d.doc_id, c.label, SUM(ln(CAST(c.cnt AS DOUBLE) + 1.0)) AS m
      |            FROM dt d JOIN counts c ON c.bucket = d.bucket
      |            GROUP BY d.doc_id, c.label),
      |sc AS (SELECT l.doc_id, s.label,
      |         round(COALESCE(m.m, 0.0)
      |               - CAST(l.dn AS DOUBLE) * ln(CAST(s.nt AS DOUBLE) + 262144.0)
      |               + ln(CAST(s.nd AS DOUBLE) / CAST(t.n AS DOUBLE)), 4) AS score
      |       FROM dlen l CROSS JOIN stats s CROSS JOIN tot t
      |       LEFT JOIN matched m ON m.doc_id = l.doc_id AND m.label = s.label),
      |nbpred AS (SELECT doc_id, pred, score FROM (
      |  SELECT doc_id, label AS pred, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
      |  FROM sc) WHERE rn = 1)""".stripMargin

  /** Sign-bit binary codes `bsig(vec_id, word, w)` — replays
    * [[graft.ops.Similarity.binaryEncode]] exactly: bit `(i−1) mod 64` of
    * word `(i−1)/64` set iff the raw float component is `> 0` (bit 63
    * spelled as the min-BIGINT literal — DuckDB rejects `1 << 63` as a
    * signed overflow, but the two's-complement value is the same word). */
  private def binSigCte: String =
    s"""bsig AS (
       |  SELECT vec_id, ((i-1)//64) AS word,
       |         bit_or(CASE WHEN v > 0 THEN
       |                  (CASE WHEN (i-1)%64 = 63 THEN (-9223372036854775807 - 1)::BIGINT
       |                        ELSE (1::BIGINT << ((i-1) % 64)) END)
       |                ELSE 0::BIGINT END) AS w
       |  FROM (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)
       |  GROUP BY vec_id, word)""".stripMargin

  private def compCte(name: String, src: String): String =
    s"""$name AS (
       |  SELECT vec_id, d, CAST(floor(x * 1e6) AS BIGINT) AS q
       |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS d, unnest(embedding) AS x
       |        FROM $src))""".stripMargin

  /** BM25 CTE chain over `documents` for a `(qid, qtext)` relation `qsrc`:
    * replays [[graft.ops.Retrieval]] exactly — same postings build (dl rides
    * the explode), same Lucene idf, same left-associated double arithmetic,
    * same 4-dp round-then-rank. Yields `bmranked(qid, doc_id, score, rank)`. */
  private def bm25Ctes(qsrc: String, docsSrc: String = "documents"): String =
    s"""bq AS ($qsrc),
       |bqt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS token FROM bq),
       |bp AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
       |       FROM (SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |               unnest(string_split(text, ' ')) AS token
       |             FROM $docsSrc WHERE text IS NOT NULL)
       |       GROUP BY doc_id, token),
       |bstat AS (SELECT count(*) AS n_docs,
       |            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
       |          FROM $docsSrc WHERE text IS NOT NULL),
       |bdf AS (SELECT token, count(*) AS df FROM bp GROUP BY token),
       |bsc AS (SELECT t.qid, p.doc_id,
       |          ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
       |          * (CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
       |          / (CAST(p.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
       |              + 0.75 * CAST(p.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE)
       |                / CAST(s.total_tokens AS DOUBLE))) AS sc
       |        FROM bp p JOIN bdf f USING (token) JOIN bqt t USING (token) CROSS JOIN bstat s),
       |bagg AS (SELECT qid, doc_id, round(sum(sc), 4) AS score FROM bsc GROUP BY qid, doc_id),
       |bmranked AS (SELECT qid, doc_id, score,
       |               CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INT) AS rank
       |             FROM bagg)""".stripMargin

  /** Unrolled MMR greedy over CTEs `mcand(qid, doc_id, rel)` and
    * `msims(qid, ia, ib, dot)`: k selection rounds, each picking the
    * remaining candidate maximizing `λ·rel − (1−λ)·max_{sel} sim` with
    * λ = 0.5 (halves of exact integers — exact doubles on both engines),
    * ties → ascending doc id. Yields `selall<k>(qid, doc_id, rank, mmr)` —
    * the same replay-the-whole-trace oracle style as the k-means CTEs. */
  private def mmrCtes(k: Int): String = {
    val steps = (2 to k).map { n =>
      s"""rem$n AS (SELECT c.* FROM mcand c
         |  LEFT JOIN selall${n - 1} s ON s.qid = c.qid AND s.doc_id = c.doc_id
         |  WHERE s.doc_id IS NULL),
         |sc$n AS (SELECT r.qid, r.doc_id,
         |    0.5 * CAST(r.rel AS DOUBLE) - 0.5 * CAST(max(si.dot) AS DOUBLE) AS mmr
         |  FROM rem$n r
         |  JOIN msims si ON si.qid = r.qid AND si.ia = r.doc_id
         |  JOIN selall${n - 1} s ON s.qid = si.qid AND s.doc_id = si.ib
         |  GROUP BY r.qid, r.doc_id, r.rel),
         |pick$n AS (SELECT qid, doc_id, mmr FROM (
         |    SELECT qid, doc_id, mmr,
         |      row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, doc_id ASC) AS rn
         |    FROM sc$n) WHERE rn = 1),
         |selall$n AS (SELECT * FROM selall${n - 1}
         |  UNION ALL SELECT qid, doc_id, $n AS rank, mmr FROM pick$n)""".stripMargin
    }.mkString(",\n")
    s"""pick1 AS (SELECT qid, doc_id, 0.5 * CAST(rel AS DOUBLE) AS mmr FROM (
       |    SELECT qid, doc_id, rel,
       |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id ASC) AS rn
       |    FROM mcand) WHERE rn = 1),
       |selall1 AS (SELECT qid, doc_id, 1 AS rank, mmr FROM pick1),
       |$steps""".stripMargin
  }

  // -------------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // Exact phrase search ("a a the" — the duplicated-term slot case):
    // positional intersection by implied phrase start, one corpus pass
    "q_ret_phrase" -> ((s, dir) =>
      Retrieval.phraseSearch(docs(s, dir), "doc_id", "text", "a a the")
        .orderBy("doc_id")),

    // Canonical normalization (NFC + lowercase + whitespace collapse) over
    // text with PLANTED unicode: a composed é, a DEcomposed e+U+0301, an
    // uppercase Ü and a tab — without real NFC the two Cafés normalize to
    // different bytes and the hash mismatches
    "q_text_normalize" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir).select(col("doc_id"),
          call_function("text_normalize",
            concat(col("text"),
              lit("  Café Café ÜBER	mix  "))).as("norm"))
        .orderBy("doc_id")
    }),

    // PMI collocations: adjacent-pair association strength over the corpus
    // (min pair count 5, top 30 by rounded-PMI with (w1, w2) tie-break)
    "q_text_collocations" -> ((s, dir) =>
      TextOps.pmiCollocations(docs(s, dir), "text", minCount = 5, k = 30)),

    // Deterministic weighted sampling (Efraimidis-Spirakis A-ES): 25 docs
    // drawn with inclusion probability proportional to length — the
    // quality-weighted subsample, reproducible from (id, salt) alone
    "q_corpus_weighted_sample" -> ((s, dir) =>
      Corpus.sampleWeighted(
          docs(s, dir).select("doc_id", "n_chars"), "doc_id", "n_chars", k = 25)
        .orderBy("doc_id")),

    // Fuzzy (edit-distance) duplicate pairs over customer names — prefix-
    // filtered q-gram candidates, banded-DP verify; the oracle is the
    // direct quadratic levenshtein join, so every planted AND natural
    // within-distance pair must surface with its exact distance
    "q_dedup_fuzzy" -> ((s, dir) =>
      Dedup.editDistancePairs(
          Tpch.read(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1, q = 3)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")),

    // Exact dedup: corpus unioned with itself → one survivor per content hash
    "q_dedup_exact" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.exactByContent(d.unionByName(d), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // One-pass dataset card: the header block of a dataset release —
    // volume, null mass, label cardinalities, token/char mass, exact
    // duplicate rate — as a single aggregate over one corpus scan
    // (count-distincts expand map-side; no per-signal rescans)
    "q_corpus_card" -> ((s, dir) => Corpus.datasetCard(docs(s, dir))),

    // Continuous-accounting fold law on its ORACLE-EXACT surface: three
    // per-batch card frames (mod-3 corpus slices) folded must equal the
    // one-shot card over the whole table on every exact field. The HLL
    // distinct-text estimate is deliberately dropped here (not DuckDB-
    // replayable once the sketch leaves its sparse regime) — its
    // exactness-in-sparse-regime and compaction laws live in
    // PersistenceSpec's ledger test.
    "q_corpus_card_ledger" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.cardFold(
        (0 to 2).map(k => Corpus.cardFrame(d.where(col("doc_id") % 3 === k)))
          .reduce(_.unionByName(_)))
        .drop("n_distinct_texts")
    }),

    // Dataset-card DIFF across committed STORE VERSIONS — the release
    // gate for an append-only corpus: a two-version manifest store (v1 =
    // even ids, v2 = +odd ids) read back through time travel (frameAt),
    // each snapshot carded in one aggregate, deltas per metric. The
    // oracle replays the version contents by their defining predicate
    // (even vs all) over the raw table — any store-side loss, dup, or
    // time-travel error breaks a metric row.
    "q_corpus_card_diff" -> ((s, dir) => {
      val store = cardStoreDir(s, dir)
      val vs = ManifestStore.versions(s, store)
      val at = (v: Long) => ManifestStore.frameAt(s, store, "dp", v)
        .getOrElse(throw new IllegalStateException(s"no card store snapshot at $v"))
      Corpus.datasetCardDiff(at(vs.head), at(vs.last)).orderBy("metric")
    }),

    // CCNet-style paragraph dedup (keep-first): every doc gets a shared
    // banner line, its own unique body line, and a mod-7 shared footer —
    // the duplicated lines must collapse to their single first occurrence
    // under the (doc_id, position) order, bodies ride through untouched
    "q_dedup_paragraph" -> ((s, dir) =>
      Dedup.paragraphDedup(plantedParagraphs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Remove-all variant: a line that appears ANYWHERE else in the corpus
    // is dropped from every document — only the unique body lines survive
    "q_dedup_paragraph_all" -> ((s, dir) =>
      Dedup.paragraphDedup(plantedParagraphs(s, dir), "doc_id", "text",
          keepFirst = false)
        .orderBy("doc_id")),

    // WITHIN-doc line dedup (the Gopher repetition repair): each doc gets
    // a repeated intro and a doubled footer — repeats collapse inside the
    // doc; the footer value shared ACROSS docs keeps one copy per doc
    // (that's the corpus-wide operator's job). Zero-shuffle projection.
    "q_dedup_paragraph_within" -> ((s, dir) => {
      val src = docs(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            concat(lit("intro "), col("doc_id").cast("string")),
            col("text"),
            concat(lit("intro "), col("doc_id").cast("string")),
            lit("shared footer"),
            lit("shared footer")).as("text"))
      Dedup.paragraphDedupWithinDoc(src, "doc_id", "text").orderBy("doc_id")
    }),

    // Incremental paragraph dedup — the continuous-crawl form: even
    // doc_ids are the accumulated corpus (held only as distinct line
    // hashes — never rescanned), odd doc_ids are the arriving batch. A
    // batch line survives iff unseen in the store AND first within the
    // batch; the oracle replays both rules.
    "q_dedup_paragraph_inc" -> ((s, dir) => {
      val all = plantedParagraphs(s, dir)
      Dedup.paragraphDedupIncremental(
          all.where(col("doc_id") % 2 =!= 0),
          Dedup.seenLineHashes(all.where(col("doc_id") % 2 === 0), "text"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // The SAME incremental paragraph dedup served from the PERSISTED
    // line-hash store (bootstrapped once from the even half under the
    // manifest protocol). Shares q_dedup_paragraph_inc's oracle verbatim:
    // the store must hold exactly what seenLineHashes computes.
    "q_dedup_paragraph_inc_indexed" -> ((s, dir) => {
      val all = plantedParagraphs(s, dir)
      Dedup.paragraphDedupIncremental(
          all.where(col("doc_id") % 2 =!= 0),
          Dedup.readLineHashes(s, paraStoreDir(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Incremental (snapshot-over-snapshot) dedup: a new batch against the
    // accumulated corpus's fingerprint store — the daily-crawl shape where
    // the corpus is never rescanned
    "q_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val seen = d.where(col("doc_id") % 2 === 0)
      val batch = d.where(col("doc_id") % 2 === 1)
        .unionByName(seen.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 7000000L)) // replayed content
      Dedup.exactIncremental(batch, Dedup.seenFingerprints(seen, "text"), "doc_id", "text")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // Content-level snapshot diff: v2 (doc_id >= 200) vs v1 (doc_id < 300)
    // — added / removed / retained by normalized fingerprint
    "q_dedup_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.snapshotDiff(
          d.where(col("doc_id") < 300), d.where(col("doc_id") >= 200),
          "doc_id", "text")
        // status breaks the tie between the (at most two) null-fp rows a
        // null-text doc would produce — fp alone is not a total order then
        .orderBy("fp", "status")
    }),

    // MinHash + LSH banding + Jaccard verification on planted near-dups
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      GraftExtensions.register(s)
      Dedup.nearDuplicates(
          docsWithNearDups(s, dir), "doc_id", "text",
          numHashes = 16, bands = 8, shingle = 3, threshold = 0.35,
          nativeSignatures = true, // per-row kernel: shingles never shuffle
          // band-bucket occupancy cap: bounds fixed-band LSH's linear
          // bucket growth (the 3.3×-at-10× line in BENCH_SCALE10X); the
          // oracle applies the identical cap, and at ≤ sf0.1 it never
          // binds (max occupancy ~41)
          maxOccupancy = 64)
        .orderBy("id_a", "id_b")
    }),

    // The SAME near-dup detection served from the PERSISTED INCREMENTAL
    // minhash index (built from the even-id half, odd half appended —
    // only that batch was ever signed): candidate pairs come from stored
    // band rows, the corpus is re-read only to Jaccard-verify the
    // candidates. Shares q_dedup_minhash_lsh's oracle chain verbatim —
    // the incremental index must collide identically to one-shot banding.
    "q_dedup_minhash_inc" -> ((s, dir) => {
      GraftExtensions.register(s)
      MinhashIndex.nearDuplicatesIndexed(
          docsWithNearDups(s, dir), minhashIndexDir(s, dir),
          "doc_id", "text", shingle = 3, threshold = 0.35, maxOccupancy = 64)
        .orderBy("id_a", "id_b")
    }),

    // Blocked pairwise n-gram Jaccard ((lang, source, length-bucket) blocking,
    // no LSH — candidate cost ∝ block sizes, never all-pairs)
    "q_dedup_jaccard_blocked" -> ((s, dir) => {
      val d = docsWithNearDups(s, dir)
        .withColumn("len_bucket", floor(col("n_chars") / 100))
      Dedup.blockedNearDuplicates(
          d, "doc_id", "text",
          blockCols = Seq("lang", "source", "len_bucket"),
          shingle = 3, threshold = 0.35)
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dup pairs: byte-band blocking (exact for Hamming ≤ 3)
    // over a deterministic tenth of the corpus ∪ planted identical copies
    // (the synthetic word salad crowds 32-bit sketches, so the full corpus
    // would emit 100k+ pairs at sf0.1 — the subset keeps outputs bounded
    // while exercising the full pipeline)
    "q_dedup_simhash_pairs" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir).where(col("doc_id") % 10 === 0)
      val dd = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashNearDuplicates(Dedup.simhashNative(dd, "doc_id", "text"))
        .orderBy("id_a", "id_b")
    }),

    // Duplicate clusters: blocked-Jaccard pairs → connected components,
    // each doc labeled with its cluster's minimum id
    "q_dedup_clusters" -> ((s, dir) => {
      val d = docsWithNearDups(s, dir)
        .withColumn("len_bucket", floor(col("n_chars") / 100))
      val pairs = Dedup.blockedNearDuplicates(
        d, "doc_id", "text",
        blockCols = Seq("lang", "source", "len_bucket"),
        shingle = 3, threshold = 0.35)
      Dedup.clusters(pairs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Same component labels via large-star/small-star contraction — the
    // O(log n)-round whole-corpus path; must agree with the propagation
    // form (and the recursive-CTE oracle) label for label
    "q_dedup_clusters_star" -> ((s, dir) => {
      val d = docsWithNearDups(s, dir)
        .withColumn("len_bucket", floor(col("n_chars") / 100))
      val pairs = Dedup.blockedNearDuplicates(
        d, "doc_id", "text",
        blockCols = Seq("lang", "source", "len_bucket"),
        shingle = 3, threshold = 0.35)
      Dedup.clustersContract(pairs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Strategy auto-selection on an adversarially DEEP pair graph:
    // consecutive-id chains within 100-id buckets (diameter ~99 ≫ the
    // 4-round propagation budget), so the query converges only via the
    // contraction fallback — the path dropDuplicateClusters now defaults to.
    // Pair generation is one equi-join (no shingles): the line measures the
    // clustering strategies, not candidate generation.
    "q_dedup_clusters_auto" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id")
      val pairs = d.select(col("doc_id").as("id_a"))
        .withColumn("id_b", col("id_a") + 1)
        .join(d.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
        .where(floor(col("id_a") / 100) === floor(col("id_b") / 100))
        .select("id_a", "id_b")
      Dedup.clustersAuto(pairs, propagationRounds = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Quality-aware canonical survivor: same blocked-Jaccard clusters as
    // q_dedup_clusters, but the survivor is the LONGEST member (n_chars
    // desc, doc_id asc tie-break) instead of the arbitrary min id — the
    // production "keep the best copy" policy. Non-members pass through.
    "q_dedup_keep_best" -> ((s, dir) => {
      val d = docsWithNearDups(s, dir)
        .withColumn("len_bucket", floor(col("n_chars") / 100))
      val pairs = Dedup.blockedNearDuplicates(
        d, "doc_id", "text",
        blockCols = Seq("lang", "source", "len_bucket"),
        shingle = 3, threshold = 0.35)
      Dedup.keepBestInClusters(d, pairs, "doc_id", col("n_chars"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // COMPOSED near-dup curation capstone over the PERSISTED index: the
    // whole production takedown loop as one flow — candidate pairs served
    // from the incremental minhash store (no re-signing), Jaccard-verified
    // ≥ 0.35 against the corpus, transitively clustered, and the LONGEST
    // member of each cluster survives (keep-best policy). One oracle CTE
    // chain replays every stage: banding, verification, the recursive
    // closure, and the survivor window.
    "q_pipeline_neardup_curate" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docsWithNearDups(s, dir)
      val pairs = MinhashIndex.nearDuplicatesIndexed(
          d, minhashIndexDir(s, dir),
          "doc_id", "text", shingle = 3, threshold = 0.35, maxOccupancy = 64)
        .select("id_a", "id_b")
      Dedup.keepBestInClusters(d, pairs, "doc_id", col("n_chars"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: exact-fingerprint overlap between the
    // corpus and a planted eval set (every 10th doc, re-id'd)
    "q_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      Dedup.crossContamination(d, evalSet, "doc_id", "text")
        .orderBy("corpus_id", "eval_id")
    }),

    // PCA moment matrix: the ONE corpus pass behind distributed PCA —
    // exact integer count / per-dim sums / upper-triangle cross products
    // from the partial-aggregatable moment_matrix kernel, flat layout
    // [n, s_0.., p_ij..] (idx arithmetic replayed by the oracle). The
    // eigensolve riding on these moments is driver-side d×d and
    // deterministic (PcaSpec pins it); the moments are the distributed
    // surface, so they carry the oracle.
    "q_embed_pca_moments" -> ((s, dir) => {
      GraftExtensions.register(s)
      emb(s, dir)
        .agg(call_function("moment_matrix",
          col("embedding"), lit(64), lit(1000)).as("m"))
        .select(posexplode(col("m")).as(Seq("idx", "p")))
        .orderBy("idx")
    }),

    // Group-wise mean pooling (chunk -> document embedding): exact integer
    // vec_sum partials, one exchange of d+1 longs per (group, partition),
    // mean = sums / (n * scale) in one double division per dim
    "q_embed_mean_pool" -> ((s, dir) => {
      GraftExtensions.register(s)
      Similarity.meanPool(emb(s, dir), "label", dims = 64)
        .select(col("label"), col("n"),
          posexplode(col("mean")).as(Seq("d", "mean")))
        .orderBy("label", "d")
    }),

    // SemDeDup-style semantic dedup pairs: k-means cells bound the pair
    // search (equi-join on cell), exact quantized cosine verifies. The
    // quantizer is trained on the base corpus and the dedup runs over the
    // base ∪ planted id-shifted copies (the synthetic embeddings have no
    // organic near-dups — max in-cell cosine 0.51); identical copies land
    // in their original's cell, so the operator must recover every plant.
    "q_embed_semdedup" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir).select("vec_id", "embedding")
      // Cell count DERIVED from the corpus (max(32, ⌈√N⌉) — the √N rule
      // with a measured factor behind it: fixed k=32 ran 4.18× at 10× data
      // in BENCH_SCALE10X; the oracle derives the identical k in SQL).
      Similarity.semanticNearDuplicates(
        embWithDups(s, dir).select("vec_id", "embedding"),
        Similarity.autoCentroids(e), threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    // Decontamination with the Bloom pre-filter applied to the corpus side
    // BEFORE the join shuffle (the 100 TB shape: corpus scan → sketch probe
    // → only matches+false-positives reach the exchange). Same exact result
    // as q_contamination — the join removes the false positives.
    "q_contamination_bloom" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      Dedup.crossContaminationBloom(d, evalSet, "doc_id", "text")
        .orderBy("corpus_id", "eval_id")
    }),

    // SimHash sketches (32-bit, token-count weighted)
    "q_dedup_simhash" -> ((s, dir) => {
      GraftExtensions.register(s)
      Dedup.simhashNative(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // SimHash sketches, 64-bit (md5 split-halves layout) — the corpus-scale
    // sketch behind 16-bit-band blocking
    "q_dedup_simhash64" -> ((s, dir) => {
      GraftExtensions.register(s)
      Dedup.simhashNative64(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // 64-bit SimHash near-dup pairs over the FULL corpus ∪ planted identical
    // copies: 16-bit bands (65536 keys each) keep whole-corpus blocking
    // sparse — the scale shape the 32-bit byte-banded variant needs
    // subsetting for (see q_dedup_simhash_pairs)
    "q_dedup_simhash64_pairs" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val dd = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashNearDuplicates64(Dedup.simhashNative64(dd, "doc_id", "text"))
        .orderBy("id_a", "id_b")
    }),

    // Occupancy audit for the simhash stop-bucket cap, at a cap tight
    // enough (8) that the dup'd corpus actually trips it — the drop is
    // measured, never silent (the lshOccupancyStats discipline)
    "q_dedup_simhash64_occupancy" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val dd = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashOccupancyStats(
        Dedup.simhashNative64(dd, "doc_id", "text"),
        bandBits = 16, maxOccupancy = 8)
    }),

    // NEAR-DUP split leakage: simhash64 near-identical pairs straddling
    // the train/val/test cut (re-keyed union contamination) — the leak
    // exact dedup doesn't catch, counted per split pair
    "q_corpus_split_leakage_neardup" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val dd = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val pairs = Dedup.simhashNearDuplicates64(
        Dedup.simhashNative64(dd, "doc_id", "text"))
      Corpus.splitLeakageFromPairs(
          pairs, Corpus.withSplit(dd, "doc_id"))
        .orderBy("split_a", "split_b")
    }),

    // Leakage-SAFE split: the same duplicated corpus and pair generator
    // as the audit query, but assignment runs on the cluster
    // representative — the cross-split leak count must be ZERO by
    // construction (the oracle recomputes pairs, closure, representative
    // hash, and the leak count independently)
    "q_corpus_split_safe" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val dd = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // the pair lineage (banded self-join + verify) is the dominant cost
      // and feeds BOTH the closure and the audit — materialize it once
      val pairs = Dedup.simhashNearDuplicates64(
        Dedup.simhashNative64(dd, "doc_id", "text")).localCheckpoint()
      val labeled = Corpus.withSplitLeakageSafe(dd, "doc_id", pairs)
      val leaked = Corpus.splitLeakageFromPairs(pairs, labeled)
        .agg(coalesce(sum(col("leaked_pairs")), lit(0L)).as("_leaked"))
      labeled.groupBy("split").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(leaked))
        .select(col("split"), col("n_docs"), col("_leaked").as("leaked_pairs"))
        .orderBy("split")
    }),

    // Crawl URL blocklist: two blocked hosts + a path drop pattern over
    // the planted URL variants — the fetch-side exclusion stage
    "q_corpus_url_filter" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id"), plantedUrl.as("url"))
      val blocked = Seq("site2.com", "site5.com").toDF("host")
      Corpus.filterBlockedUrls(d, "url", blocked,
          dropPathPattern = Some("/page/13"))
        .orderBy("doc_id")
    }),

    // Overlap-tier decontamination: eval docs are planted MIDDLE spans of
    // corpus docs (tokens n/4+1 .. n/4+⌈n/2⌉, id+5000000) — contained
    // text that exact-fingerprint contamination (q_contamination) and
    // whole-doc Jaccard both miss; winnowed-fp containment recovers it
    "q_contamination_overlap" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val toks = split(col("text"), " ")
      val start = (size(toks) / lit(4)).cast("int") + 1
      val len = ((size(toks) + 1) / lit(2)).cast("int")
      val evalSet = d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          array_join(slice(toks, start, len), " ").as("text"))
      Dedup.overlapContamination(d, evalSet, "doc_id", "text", 0.8)
        .orderBy("corpus_id", "eval_id")
    }),

    // Per-eval-doc contamination REPORT over the same plant: every eval
    // doc emits a row — max corpus containment (6 dp), gate count at 0.8,
    // and the verdict — including the CLEAN docs a pair feed omits and
    // the below-gate middle band it filters away
    "q_contamination_report" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val toks = split(col("text"), " ")
      val start = (size(toks) / lit(4)).cast("int") + 1
      val len = ((size(toks) + 1) / lit(2)).cast("int")
      val evalSet = d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          array_join(slice(toks, start, len), " ").as("text"))
      Dedup.contaminationReport(d, evalSet, "doc_id", "text", 0.8)
        .orderBy("eval_id")
    }),

    // The SAME report served from the persisted eval-suite fingerprint
    // registry (suite-scoped to "main" — the "exact" suite's partitions
    // prune at the scan): the store must roll up identically to the
    // direct form, so the oracle is q_contamination_report's verbatim.
    // Eval TEXT is read only at registry build; every serve is
    // fingerprints-vs-fingerprints.
    "q_contamination_report_indexed" -> ((s, dir) => {
      GraftExtensions.register(s)
      EvalRegistry.contaminationReportIndexed(
          docs(s, dir), evalRegistryDir(s, dir), "doc_id", "text",
          threshold = 0.8, suite = Some("main"))
        .select("eval_id", "max_containment", "n_contaminating", "contaminated")
        .orderBy("eval_id")
    }),

    // The one-call decontamination GATE across BOTH registered suites and
    // BOTH tiers: corpus minus (exact fingerprint matches ∪ winnowed
    // containment ≥ 0.8) — the per-batch anti-join an ingest pipeline
    // runs against a registry it never saw the eval text of
    "q_contamination_decon" -> ((s, dir) => {
      GraftExtensions.register(s)
      EvalRegistry.decontaminateIndexed(
          docs(s, dir), evalRegistryDir(s, dir), "doc_id", "text",
          threshold = 0.8)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Winnowing fingerprints (min hash per 4-window of 3-shingles) — the
    // MOSS fingerprint set, computed by the zero-shuffle per-row kernel
    "q_text_winnow" -> ((s, dir) => {
      GraftExtensions.register(s)
      TextOps.winnowNative(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "fp")
    }),

    // Containment detection: full corpus ∪ planted first-half copies
    // (id+1000000). The half-doc shares ~all its fingerprints with its
    // source, so containment ≈ 1.0 — while its Jaccard is only ~0.5,
    // below every near-dup threshold: this is the overlap class MinHash
    // misses by construction
    "q_dedup_containment" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val toks = split(col("text"), " ")
      val dd = d.select("doc_id", "text").unionByName(
        d.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          array_join(
            slice(toks, lit(1), ceil(size(toks) / lit(2.0)).cast("int")), " ").as("text")))
      Dedup.containment(TextOps.winnowNative(dd, "doc_id", "text"), 0.5)
        .orderBy("id_a", "id_b")
    }),

    // Exact-substring (span) dedup, Lee et al. 2021 ExactSubstr: every
    // 10-token window occurring more than once in the corpus (the planted
    // mutants share all windows past their first 2 tokens with their
    // source) is cut from every document; text rebuilt from survivors.
    // The whole chain — window hashes, duplication counts, covered
    // positions, rebuild — is replayed by the oracle, so the cleaned
    // strings must match byte-for-byte
    "q_dedup_exact_substring" -> ((s, dir) => {
      Dedup.exactSubstringDedup(docsWithNearDups(s, dir), "doc_id", "text", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Memorization-risk profile: per doc, tokens covered by duplicated
    // 10-windows and the longest contiguous covered run — the triage view
    // ranked before choosing cut-vs-drop; oracle recomputes the covered
    // position set and its gaps-and-islands run lengths independently
    "q_dedup_memorization" -> ((s, dir) => {
      Dedup.memorizationProfile(docsWithNearDups(s, dir), "doc_id", "text", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Keep-one span dedup: per duplicated window the (doc, position)-first
    // occurrence survives, all others cut — the oracle replays the
    // survivor tie-break with the same row_number-over-(id, p) rule
    "q_dedup_exact_substring_keepfirst" -> ((s, dir) => {
      Dedup.exactSubstringDedupKeepFirst(docsWithNearDups(s, dir), "doc_id", "text", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Incremental span dedup — the continuous-ingest form: even doc_ids
    // are the ingested store (held only as (h, c) window counts — never
    // re-tokenized), odd doc_ids are the arriving batch; a batch window
    // duplicated against store ∪ batch is cut. The oracle replays the
    // union's duplication counts and rebuilds the batch documents only —
    // pinning incremental ≡ batch-over-union restricted to the batch.
    "q_dedup_exact_substring_inc" -> ((s, dir) => {
      val all = docsWithNearDups(s, dir)
      val seen = Dedup.substringWindowCounts(
        all.where(col("doc_id") % 2 === 0), "doc_id", "text", n = 10)
      Dedup.exactSubstringDedupIncremental(
        all.where(col("doc_id") % 2 =!= 0), seen, "doc_id", "text", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // The SAME incremental span dedup served from the PERSISTED window-
    // count store (bootstrapped once from the even half — the (h, c)
    // skeleton under the manifest protocol; the corpus is never
    // re-tokenized at serve time). Shares q_dedup_exact_substring_inc's
    // oracle verbatim: the store must hold exactly what the direct
    // counts pass computes.
    "q_dedup_substring_inc_indexed" -> ((s, dir) => {
      val all = docsWithNearDups(s, dir)
      Dedup.exactSubstringDedupIncremental(
        all.where(col("doc_id") % 2 =!= 0),
        Dedup.readWindowCounts(s, spanStoreDir(s, dir)),
        "doc_id", "text", n = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // URL canonicalization: four planted variants per doc — uppercase
    // scheme/host + default port + tracking params + unsorted query +
    // trailing slash + fragment — where variants 0 and 1 MUST collapse to
    // the same canonical key (the crawl-dedup property), 2 drops its
    // default port and gclid, 3 keeps its non-default port and loses only
    // the fragment. The oracle replays every extraction and rule.
    "q_text_url_canon" -> ((s, dir) => {
      GraftExtensions.register(s) // pct_normalize kernel
      val d = docs(s, dir)
      d.select(col("doc_id"), TextOps.canonicalizeUrl(plantedPctUrl).as("canon_url"))
        .orderBy("doc_id")
    }),

    // IDN host normalization: consecutive doc pairs plant the SAME url
    // under the unicode spelling (even ids, mixed case) and its punycode
    // twin (odd ids) across three host families (latin-1 umlaut, hyphened
    // label, CJK) — canonicalization must collapse each pair to ONE key
    // (the encoding-choice evasion closed by the idn_ascii kernel). The
    // oracle is the independent closed form of the expected canonical
    // url, punycode twins written literally.
    "q_text_url_idn" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val k = floor(col("doc_id") / 2)
      val fam = k % 3
      val uni = when(fam === 0, "BÜcher.De").when(fam === 1, "münchen.de")
        .otherwise("東京.jp")
      val puny = when(fam === 0, "xn--bcher-kva.de")
        .when(fam === 1, "xn--mnchen-3ya.de").otherwise("xn--1lqs71d.jp")
      val host = when(col("doc_id") % 2 === 0, uni).otherwise(puny)
      val url = concat(lit("HTTPS://"), host, lit("/p/"),
        (k % 50).cast("string"), lit("?b=2&a=1#frag"))
      d.select(col("doc_id"), TextOps.canonicalizeUrl(url).as("canon_url"))
        .orderBy("doc_id")
    }),

    // Per-domain document cap — the crawl-diversity quota every web-corpus
    // recipe applies so no single site dominates the mix: canonical URL →
    // registrable host → at most 30 docs per host under the (doc_id)
    // order. WindowGroupLimit keeps each map task's local top-30 before
    // the exchange, so the shuffle carries O(hosts × 30) rows per task.
    "q_corpus_domain_cap" -> ((s, dir) => {
      GraftExtensions.register(s) // pct_normalize kernel
      val d = docs(s, dir)
      val framed = d.select(col("doc_id"),
        TextOps.urlHost(TextOps.canonicalizeUrl(plantedUrl)).as("host"))
      Corpus.capPerGroup(framed, "host", 30, col("doc_id").asc)
        .orderBy("doc_id")
    }),

    // eTLD+1 per-domain cap — the subdomain-sharding-proof quota: the
    // grouping key is the REGISTRABLE domain (exact PSL algorithm over the
    // bundled snapshot, native kernel), so 97 shards of spam.co.uk
    // collapse to one capped domain while github.io tenants stay distinct
    // sites; wildcard (*.ck) and exception (!www.ck) rules exercised by
    // plant. The oracle replays the suffix walk against the SAME snapshot
    // (interpolated VALUES) — longest rule via min matching start index.
    "q_corpus_etld_cap" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val framed = d.select(col("doc_id"),
        TextOps.registrableDomain(
          TextOps.urlHost(TextOps.canonicalizeUrl(plantedShardUrl))).as("domain"))
      Corpus.capPerGroup(framed, "domain", 30, col("doc_id").asc)
        .orderBy("doc_id")
    }),

    // HTML -> text extraction (the ingest stage before any quality/dedup
    // pass): every doc wrapped in planted markup — style/script blocks
    // (with a stray '<' inside the script), heading, attributes; every
    // third doc a named-entity gauntlet and every doc_id % 3 == 1 a
    // NUMERIC-reference gauntlet (hex both cases, leading zeros, common
    // punctuation, out-of-range verbatim, double-encoding survival).
    // stripHtml must drop code blocks WITH content, strip tags, decode
    // entities single-pass (the &amp;-last law), and collapse whitespace;
    // the oracle replays the regex chain and the planted spellings.
    "q_text_html_strip" -> ((s, dir) => {
      GraftExtensions.register(s) // html_unescape kernel
      val d = docs(s, dir)
      d.select(
          col("doc_id"),
          TextOps.stripHtml(concat(
            lit("<html><head><style>p{color:red}</style></head>" +
              "<body><h1 class=\"t\">Doc "),
            col("doc_id").cast("string"),
            lit("</h1><p>"), col("text"),
            lit("</p><script type=\"text/javascript\">var x = 1 < 2;</script>"),
            when(col("doc_id") % 3 === 0,
              lit("<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end</p>"))
              .otherwise(lit("")),
            when(col("doc_id") % 3 === 1,
              lit("<p>n1&#x27;h&#X27; c&#8217;s d&#8212;e &#160;sp " +
                "&#65;&#097;&#x4D; dots&#8230; raw&#999999; " +
                "dbl&amp;#8217; q&apos;end</p>"))
              .otherwise(lit("")),
            lit("</body></html>"))).as("text_clean"))
        .orderBy("doc_id")
    }),

    // BLOCK-STRUCTURED HTML -> text (the crawl-chain extraction rung,
    // r17): unlike stripHtml's global whitespace collapse, html_to_text
    // keeps block boundaries as newlines so the paragraph-dedup and
    // boilerplate tiers see real lines. Eight closed-form planted arms:
    // heading+paragraphs, a full chrome page (head/nav/script/aside/
    // footer all dropped whole), the entity gauntlet with <br>, list +
    // table rows, nested same-tag nav + the unclosed-<head>-ends-at-
    // <body> law, quoted-attribute '>' + comment + doctype, per-line
    // whitespace collapse with an empty block dropped, and a
    // chrome-only page that must yield ''. The oracle pins each arm's
    // exact line list as literals.
    "q_text_html_blocks" -> ((s, dir) => {
      GraftExtensions.register(s)
      val n = col("doc_id").cast("string")
      val html = when(col("doc_id") % 8 === 0, concat(
          lit("<h1>Doc "), n, lit("</h1><p>alpha "), n, lit("</p><p>beta</p>")))
        .when(col("doc_id") % 8 === 1, concat(
          lit("<html><head><title>t</title><style>p{color:red}</style></head>" +
            "<body><nav>home about contact</nav><p>only prose "), n,
          lit("</p><script>if (1 < 2) { x(); }</script>" +
            "<aside>related</aside><footer>copyright corp</footer></body></html>")))
        .when(col("doc_id") % 8 === 2, concat(
          lit("<p>A &amp; B &lt;tag&gt; &#8217;s &nbsp;end</p>second "), n,
          lit("<br>third")))
        .when(col("doc_id") % 8 === 3, concat(
          lit("<ul><li>one</li><li>two "), n,
          lit("</li></ul><table><tr><td>a</td><td>b</td></tr></table>")))
        .when(col("doc_id") % 8 === 4, concat(
          lit("<head><title>t</title><body><nav>o <nav>i</nav> c</nav><p>kept "),
          n, lit("</p>")))
        .when(col("doc_id") % 8 === 5, concat(
          lit("<!DOCTYPE html><!-- note --><p title=\"a > b\">attr "), n,
          lit("</p>")))
        .when(col("doc_id") % 8 === 6, concat(
          lit("<div>  a\t b  </div><div>   </div><div>c "), n, lit("</div>")))
        .otherwise(lit("<nav>only chrome</nav>"))
      docs(s, dir)
        .select(col("doc_id"), TextOps.htmlToText(html).as("text_block"))
        .orderBy("doc_id")
    }),

    // WARC shard ingest over planted shards: synth_warc(doc_id) builds a
    // closed-form shard (warcinfo + HTTP response + request; gzip
    // member-per-record framing at odd ids, plain at even; a CHUNKED
    // transfer body at id%5=0 that must de-chunk, a windows-1252 body at
    // id%5=1, a declared-ISO-8859-2 Polish body at id%5=2 — a charset
    // only the Content-Type header can pick, since ISO-8859-2 decodes
    // every byte — and a truncated tail record at id%7=6 that must
    // surface as the _corrupt sentinel) — then the real reader path
    // explodes it and the body rides text_from_bytes_decl(content, mime),
    // exactly the crawl-capstone front end. The oracle recomputes every
    // field from the id closed form.
    "q_src_warc" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id"),
          posexplode(Warc.records(call_function("synth_warc", col("doc_id"))))
            .as(Seq("rec_no", "rec")))
        .select(col("doc_id"), col("rec_no"),
          col("rec.warc_type").as("warc_type"), col("rec.url").as("url"),
          col("rec.ts").as("ts"), col("rec.mime").as("mime"),
          col("rec.status").as("status"),
          // the DECLARED form: the id%5=2 arm is ISO-8859-2 Polish,
          // which decodes under five different single-byte charsets —
          // only the Content-Type header picks the right one
          TextOps.textFromBytesDeclared(col("rec.content"), col("rec.mime"))
            .as("body_text"))
        .orderBy("doc_id", "rec_no")
    }),

    // PDF text tier over planted documents (r17, CID arms r18):
    // synth_pdf(doc_id) builds a real single-page PDF (catalog/pages/
    // page, computed xref) whose content stream rotates through the
    // extraction arms — raw and FlateDecode streams, TJ kern-to-space,
    // hex strings, the literal escape gauntlet, WinAnsi high bytes, the
    // ' operator, a composite (Type0/CID) font whose 2-byte codes
    // decode through a Flate-compressed ToUnicode CMap — plus an
    // ENCRYPTED arm, a CORRUPT arm, and a CID-without-ToUnicode arm
    // that must yield NULL (the honest-tier refusal law). The oracle
    // recomputes every arm's expected text from the id closed form.
    "q_src_pdf" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id"),
          TextOps.pdfText(call_function("synth_pdf", col("doc_id")))
            .as("pdf_body"))
        .orderBy("doc_id")
    }),

    // MIME-ROUTED media extraction (r17; json/xml arms r18): the one
    // rung between a WARC record (content, mime) and the crawl chain —
    // application/pdf routes to the pdf_text tier (a corrupt PDF stays
    // NULL, visible to the health ledger), json mimes to the strict
    // string-value harvest (a json-labeled payload that is NOT json
    // refuses), xml/feed mimes to the feed block law (CDATA-embedded
    // HTML extracted), everything else to declared-charset decode +
    // block HTML extraction — all emitting the same line law. Nine
    // closed-form arms: UTF-8 html (chrome dropped, blocks kept),
    // declared-ISO-8859-2 Polish html (a charset only the header can
    // pick), two real PDFs (raw and Flate arms of synth_pdf), a corrupt
    // PDF (NULL), a text/plain passthrough whose line structure
    // survives, a JSON document (values harvested in order, keys and
    // numbers silent, \u-escapes decoded), an RSS feed (field-per-line
    // + CDATA body; link/guid/pubDate/enclosure METADATA dropped — the
    // oracle's expected text proves the URLs and timestamps never
    // reach the corpus), and a broken-JSON arm (NULL).
    "q_src_media" -> ((s, dir) => {
      GraftExtensions.register(s)
      val n = col("doc_id").cast("string")
      val arm = col("doc_id") % 9
      val content = when(arm === 0, encode(concat(
          lit("<html><head><title>t</title></head><body><nav>site menu</nav>" +
            "<h1>Doc "), n, lit("</h1><p>crawl page "), n,
          lit("</p><script>1 < 2</script></body></html>")), "UTF-8"))
        .when(arm === 1, concat(
          unhex(lit("3C703E7A61BFF3B3E62067EAB66CB1206A61BCF1207374726F6E6120")),
          encode(n, "UTF-8"), unhex(lit("3C2F703E"))))
        .when(arm === 2, call_function("synth_pdf", col("doc_id") * 10))
        .when(arm === 3, call_function("synth_pdf", col("doc_id") * 10 + 1))
        .when(arm === 4, call_function("synth_pdf", col("doc_id") * 10 + 7))
        .when(arm === 6, encode(concat(
          lit("{\"title\": \"json doc "), n,
          lit("\", \"tags\": [\"alpha\", \"beta "), n,
          lit("\"], \"meta\": {\"note\": \"nested\\u0020value\"}, " +
            "\"n\": 42, \"ok\": true}")),
          "UTF-8"))
        .when(arm === 7, encode(concat(
          lit("<?xml version=\"1.0\"?><rss><channel><title>feed "), n,
          lit("</title><link>https://ex.com/feed</link>" +
            "<item><title>item one</title><guid>https://ex.com/p?id="), n,
          lit("</guid><pubDate>Mon, 01 Jan 2026</pubDate>" +
            "<enclosure url=\"https://ex.com/a.mp3\"/><description>" +
            "<![CDATA[<p>cdata body "), n,
          lit("</p>]]></description></item><item><title>second post" +
            "</title><description>&lt;p&gt;escaped body "), n,
          lit("&lt;/p&gt;</description></item></channel></rss>")), "UTF-8"))
        .when(arm === 8, encode(concat(
          lit("""{"broken": """), n), "UTF-8")) // unterminated object
        .otherwise(encode(concat(
          lit("plain text record "), n, lit("\nsecond line")), "UTF-8"))
      val mime = when(arm === 0, lit("text/html; charset=UTF-8"))
        .when(arm === 1, lit("text/html; charset=ISO-8859-2"))
        .when(arm.isin(2, 3, 4), lit("application/pdf"))
        .when(arm === 6, lit("application/json; charset=UTF-8"))
        .when(arm === 7, lit("application/rss+xml"))
        .when(arm === 8, lit("application/json"))
        .otherwise(lit("text/plain; charset=UTF-8"))
      docs(s, dir)
        .select(col("doc_id"), mime.as("mime"),
          TextOps.extractText(content, mime).as("text_out"))
        .orderBy("doc_id")
    }),

    // MEDIA-REFUSAL CARD (r18): the accounting row that turns the
    // honest tiers' documented blind spots into DATA — per media type,
    // how many documents and bytes the extraction/decode tiers REFUSED
    // (corrupt PDFs, non-JSON under a json mime, VP8-LOSSY WebP pixels
    // — the dominant crawl WebP framing, permanently out of the
    // pure-JDK tier). Five planted arms with closed-form byte masses;
    // ok = the tier's own output (NULL ≡ refused, the engine-wide law).
    "q_src_refusal_card" -> ((s, dir) => {
      GraftExtensions.register(s)
      val n = col("doc_id").cast("string")
      val arm = col("doc_id") % 5
      val content = when(arm === 0, encode(concat(
          lit("<html><body><p>page "), n, lit("</p></body></html>")), "UTF-8"))
        .when(arm === 1, call_function("synth_pdf", col("doc_id") * 10 + 7))
        .when(arm === 2, encode(concat(lit("{\"x\": "), n), "UTF-8"))
        .when(arm === 3, call_function("synth_webp", col("doc_id") * 21))
        .otherwise(encode(concat(lit("plain note "), n), "UTF-8"))
      val mime = when(arm === 0, lit("text/html; charset=UTF-8"))
        .when(arm === 1, lit("application/pdf"))
        .when(arm === 2, lit("application/json"))
        .when(arm === 3, lit("image/webp"))
        .otherwise(lit("text/plain"))
      val ok = when(mime.startsWith("image/"),
          when(Multimodal.decodeImage(content).isNotNull, lit("decoded")))
        .otherwise(TextOps.extractText(content, mime))
      Corpus.mediaRefusalCard(
          docs(s, dir).select(col("doc_id"), mime.as("mime"),
            content.as("content"), ok.as("ok")),
          "mime", "content", "ok")
        .orderBy("media_type")
    }),

    // Byte-level ingest decode over planted byte fixtures: plain UTF-8
    // (identity on the ASCII docs text), legacy Windows-1252 bytes, one
    // and two rounds of UTF-8-as-cp1252 mojibake, undecodable garbage
    // (cp1252 fallback — note FF FE FA is ODD length, so the UTF-16 BOM
    // tier correctly passes on it), empty input, and the round-16
    // legacy-multibyte tier: Shift_JIS + EUC-JP Japanese (the SAME
    // sentence in both framings — the gate must pick each charset from
    // its bytes), EUC-KR Korean, GB18030 simplified vs Big5 traditional
    // Chinese (structurally ambiguous — only the language gate
    // separates them), windows-1251 Ukrainian (exercising the
    // multi-language cp1251 set beyond the obvious ru), UTF-16
    // LE/BE with BOMs, (r16) the rest of the single-byte Cyrillic
    // family: KOI8-R Russian and ISO-8859-5 Bulgarian, and (r17) the
    // remaining single-byte script rungs — windows-1253 Greek,
    // windows-1255 Hebrew, windows-1256 Arabic, windows-874 Thai —
    // plus the LATIN rungs, where lowest-distance-wins does the work
    // first-accept cannot: a windows-1250 Polish page ALSO classifies
    // 'pl' under cp1252 (237 normalized, under the cutoff) with ¹/
    // wrong-glyph accents, and the true decode must beat it. Arms:
    // ISO-8859-9 Turkish, windows-1250 Polish, ISO-8859-2 Czech and
    // Hungarian. The expected strings are closed-form by
    // construction — the oracle pins them as literals on the same
    // doc_id families.
    "q_text_from_bytes" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id"), TextOps.textFromBytes(plantedBytes24).as("text_out"))
        .orderBy("doc_id")
    }),

    // Ladder-cost OBSERVABILITY (r17, verdict #7): where does each row
    // EXIT the decode ladder? Grouped rung counts over the same 24-arm
    // byte corpus — per-row decode-cost attribution as an oracle-checked
    // record instead of a rerun (the ladder keeps growing rungs; this is
    // the line that says which rungs a corpus actually pays for). The
    // oracle pins each arm's closed-form exit: note arm 16 (cp1253
    // Greek) exits at iso-8859-7 — the two charsets decode that plant
    // identically and ties break in ladder order — and the Turkish pair
    // collapses the same way.
    "q_text_rungs" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(TextOps.textFromBytesRung(plantedBytes24).as("rung"))
        .groupBy("rung").agg(count(lit(1)).as("n_docs"))
        .orderBy("rung")
    }),

    // Boilerplate line removal: every doc gets a planted per-source
    // boilerplate line (appears in 100% of its source's docs → dropped)
    // plus a doc-unique footer (kept) — the output must strip exactly the
    // shared line from every document
    "q_text_boilerplate" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"), col("source"),
        concat(
          col("text"), lit("\nsubscribe to "), col("source"), lit(" newsletter\ndoc-"),
          col("doc_id").cast("string"), lit(" footer")).as("text"))
      TextOps.removeBoilerplate(d, "doc_id", "text", "source", 0.5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Real BPE: merges learned from THIS corpus (vocabulary-sized driver
    // loop over distributed word counts), then per-doc greedy rank
    // encoding via the zero-shuffle kernel. The DuckDB oracle replays the
    // same algorithm with the learning loop unrolled as SQL stages (see
    // the oracleSql entry); the algorithm is also unit-verified against
    // the classic Sennrich hand example in LlmOpsSpec.
    "q_text_bpe" -> ((s, dir) => {
      val d = docs(s, dir)
      GraftExtensions.registerBpe(s, TextOps.learnBpeMerges(d, "text", 64))
      d.select(
          col("doc_id"),
          size(TextOps.bpeEncode(TextOps.tokens(col("text")))).as("n_bpe"),
          size(TextOps.tokens(col("text"))).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens + BPE-ish subword segments
    "q_text_tokens" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    // Deflate compression-ratio signal (C4/Gopher long-range redundancy)
    // over planted payloads with wide-margin expected buckets: a
    // repeated boilerplate line (ratio far below 0.25), chained-md5 hex
    // (mid-entropy, safely inside [0.25, 0.9)), and a 9-char unique
    // string (deflate's block-framing floor pushes the ratio past 0.9).
    // Buckets, not raw counts: exact deflate output may drift a few
    // bytes across zlib builds; the operator contract is "threshold
    // with margin" and the oracle pins exactly that.
    "q_text_deflate" -> ((s, dir) => {
      GraftExtensions.register(s)
      val payload = when(col("doc_id") % 3 === 0,
          repeat(lit("all work and no play makes jack a dull boy "),
            (col("doc_id") % 5 + 20).cast("int")))
        .when(col("doc_id") % 3 === 1,
          concat((0 until 16).map(i =>
            md5(concat(lit("df:"), (col("doc_id") + i).cast("string")))): _*))
        .otherwise(
          substring(md5(concat(lit("dfs:"), col("doc_id").cast("string"))), 1, 9))
      val r = TextOps.deflateRatio(payload)
      docs(s, dir)
        .select(col("doc_id"),
          when(r < 0.25, "redundant").when(r < 0.9, "mixed")
            .otherwise("incompressible").as("bucket"))
        .orderBy("doc_id")
    }),

    // The deflate rung inside the composite curation gate: every 11th
    // doc's text is replaced by pure repeated boilerplate — token-level
    // stats look ordinary (distinct-ish words, no dominant token), only
    // the compression ratio exposes it. All other rules stay at their
    // permissive defaults, so the planted docs fail EXACTLY the
    // deflate_ratio rule and everything else keeps.
    "q_text_curation_deflate" -> ((s, dir) => {
      GraftExtensions.register(s)
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          repeat(lit("home products pricing about contact careers blog "), 30))
          .otherwise(col("text")).as("text"))
      TextOps.curationGate(planted, "doc_id", "text",
          TextOps.CurationRules(minDeflateRatio = 0.1))
        .orderBy("doc_id")
    }),

    // Quality signals (length / word stats / stopword ratio)
    "q_text_quality" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("_toks", TextOps.tokens(col("text")))
        .select(col("doc_id") +: TextOps.qualitySignalsFromTokens(col("text"), col("_toks")): _*)
        .orderBy("doc_id")),

    // Language-ID heuristic (stopword profiles, deterministic tie-break)
    "q_text_langid" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          TextOps.langIdNative(TextOps.tokens(col("text"))).as("predicted"))
        .orderBy("doc_id")
    }),

    // Cavnar–Trenkle character 1–3-gram language ID over the bundled
    // bundled profile snapshot: every fifth doc's text is replaced by
    // a held-out plant rotating through the snapshot languages (incl. the
    // non-Latin ru/ar/ja/zh/ko/hi/uk/el/he/th/bg the stopword tier cannot
    // see) plus three REJECTION plants (sw/lt/garbage) that must come
    // back 'und'
    // through the per-language distance cutoffs. The oracle replays the
    // FULL algorithm — normalization, codepoint 1–3-grams, rank-64 doc
    // profile (count desc, binary gram order), out-of-place distance vs
    // the interpolated rank-512 profile relation (absent penalty 512),
    // argmin with lang-asc tie-break, the cutoff rejection, 'und' for
    // empty-normalized docs.
    "q_text_langid_ngram" -> ((s, dir) => {
      GraftExtensions.register(s)
      val planted = when(col("doc_id") % 5 === 0,
        element_at(array(langPlants.map(lit): _*),
          ((col("doc_id") / 5).cast("long") % langPlants.size + 1).cast("int")))
        .otherwise(col("text"))
      docs(s, dir)
        .select(col("doc_id"), TextOps.langIdNgram(planted).as("predicted"))
        .orderBy("doc_id")
    }),

    // Scored twin: same plants, the struct expands to the post-rejection
    // label, raw argmin label, and exact integer distances (best, second,
    // max) — the margin/confidence surface a calibration pass consumes.
    "q_text_langid_margin" -> ((s, dir) => {
      GraftExtensions.register(s)
      val planted = when(col("doc_id") % 5 === 0,
        element_at(array(langPlants.map(lit): _*),
          ((col("doc_id") / 5).cast("long") % langPlants.size + 1).cast("int")))
        .otherwise(col("text"))
      docs(s, dir)
        .select(col("doc_id"), TextOps.langIdNgramScored(planted).as("s"))
        .select(col("doc_id"), col("s.lang").as("lang"),
          col("s.best_lang").as("best_lang"),
          col("s.best_dist").as("best_dist"),
          col("s.second_dist").as("second_dist"),
          col("s.max_dist").as("max_dist"))
        .orderBy("doc_id")
    }),

    // The margin surface FEEDING calibration: over the planted docs (the
    // rows with ground truth), confidence = 1 - best_dist/max_dist and
    // label = (post-rejection prediction == expected), bucketed by the
    // same reliability-report operator every probability-scored gate
    // uses — the curve an operator reads before trusting the language
    // gate's cutoffs on new data
    "q_text_langid_calibration" -> ((s, dir) => {
      GraftExtensions.register(s)
      val idx = ((col("doc_id") / 5).cast("long") % langPlants.size + 1).cast("int")
      val planted = element_at(array(langPlants.map(lit): _*), idx)
      val expected = element_at(array(langPlantExpected.map(lit): _*), idx)
      val scored = docs(s, dir).where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), expected.as("want"),
          TextOps.langIdNgramScored(planted).as("s"))
        .select(
          (lit(1.0) - col("s.best_dist").cast("double") / col("s.max_dist"))
            .as("score"),
          (col("s.lang") === col("want")).as("label"))
      graft.ops.Profile.calibrationReport(scored, "score", "label", bins = 10)
        .orderBy("bucket")
    }),

    // Content fingerprints: normalized md5 + min-shingle rolling hash
    "q_text_fingerprint" -> ((s, dir) => {
      GraftExtensions.register(s)
      TextOps.fingerprintsNative(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Brute-force exact top-k cosine (integer-quantized dot products)
    "q_sim_topk_brute" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(e, queries, 5)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // Contrastive training-set capstone: positives (self-labeled brute
    // top-2) × guarded hard negatives (top-2 under the 0.95 fnFrac band)
    // → (qid, pos, neg, margin) triplets, the DPR training-pair export,
    // composed as ONE chained plan
    "q_pipeline_triplets" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val pos = Similarity.bruteForceTopK(e, queries, 2)
        .select(col("qid"), col("vec_id").as("pos_id"), col("dot").as("pos_dot"))
      val neg = Similarity.hardNegatives(
          e, queries, pos.select(col("qid"), col("pos_id").as("vec_id")),
          2, fnFrac = Some(0.95))
        .select(col("qid"), col("vec_id").as("neg_id"), col("dot").as("neg_dot"))
      pos.join(neg, Seq("qid"))
        .select(col("qid"), col("pos_id"), col("neg_id"),
          col("pos_dot"), col("neg_dot"),
          (col("pos_dot") - col("neg_dot")).as("margin"))
        .orderBy("qid", "pos_id", "neg_id")
    }),

    // Hard-negative mining for contrastive training: per query the top-5
    // non-positive corpus vectors (positives = the self-labeled brute
    // top-2), with the RocketQA false-negative guard dropping unlabeled
    // candidates scoring above 0.95x the best labeled positive
    "q_sim_hard_negatives" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val positives = Similarity.bruteForceTopK(e, queries, 2)
        .select("qid", "vec_id")
      Similarity.hardNegatives(e, queries, positives, 5, fnFrac = Some(0.95))
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // Cluster-stratified diverse sampling: exactly 20 vectors per k-means
    // cell, drawn by salted hash — density-skew-free coverage of the
    // embedding space
    "q_corpus_diverse_sample" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val cents = Similarity.trainCentroids(e, 8, 2)
      Similarity.diverseSample(e, cents, perCell = 20)
        .select(col("vec_id"), col("cell").cast("int").as("cell"))
        .orderBy("vec_id")
    }),

    // SQ8 scalar quantization: per-dimension 8-bit codes against corpus
    // [min,max] bounds, asymmetric integer scoring (255× the dequantized
    // dot) — the 4×-compression tier between raw vectors and PQ
    "q_sim_sq8" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val bounds = Similarity.sqTrainBounds(e)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.sqTopK(Similarity.sqEncode(e, bounds), bounds, queries, 5)
        .orderBy("qid", "rank")
    }),

    // Binary (1-bit sign) quantization scan: Hamming-ranked top-5 over
    // packed 64-bit sign codes — the 32× compression floor of the
    // quantization ladder (raw → SQ8 → PQ → binary); at d=64 the scan
    // reads ONE long per corpus vector
    "q_sim_binary" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.binaryTopK(Similarity.binaryEncodeFrame(e, 64), queries, 5, 64)
        .orderBy("qid", "rank")
    }),

    // The SAME binary scan served from the PERSISTED code store (dims
    // pinned in versioned meta; one long per stored vector read) — shares
    // q_sim_binary's oracle verbatim: the store must hold exactly what
    // binaryEncodeFrame computes
    "q_sim_binary_indexed" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.binaryTopKIndexed(s, binStoreDir(s, dir), queries, 5)
        .orderBy("qid", "rank")
    }),

    // Binary scan + exact re-rank: Hamming shortlist of 50 per query,
    // exact integer-dot re-rank to top-5 — the production BQ serving
    // shape (cheap bit scan retrieves, raw vectors re-rank a broadcast
    // shortlist)
    "q_sim_binary_rerank" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.binaryTopKRerank(e, queries, 5, 50, 64)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // K-means-trained IVF centroids: 2 deterministic Lloyd iterations over
    // integer-quantized components — bit-identical on any engine or
    // partitioning, so the TRAINED centroids themselves are oracle-checked
    // (random-init k-means never could be)
    "q_sim_kmeans" -> ((s, dir) => {
      GraftExtensions.register(s)
      Similarity.trainCentroids(emb(s, dir), 8, 2)
        .select(col("cid").cast("int").as("cid"), posexplode(col("cvec")).as(Seq("d0", "c")))
        .select(col("cid"), (col("d0") + 1).cast("int").as("d"), col("c"))
        .orderBy("cid", "d")
    }),

    // The full trained-ANN pipeline: k-means centroids (2 Lloyd
    // iterations) feeding multi-cell IVF probing — train → assign →
    // probe, end-to-end oracle-checked
    "q_sim_ivf_trained" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val cents = Similarity.trainCentroids(e, 8, 2)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(e, cents, queries, 5, nprobe = 2)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // Semantic decontamination: eval embeddings (every 10th, re-id'd)
    // matched against the corpus by cell-bounded exact cosine — the
    // paraphrase-leak tier fingerprint decontamination misses
    "q_contamination_semantic" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir).select("vec_id", "embedding")
      val evalSet = e.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      Similarity.semanticContamination(
        e, evalSet, Similarity.autoCentroids(e), threshold = 0.95)
        .orderBy("corpus_id", "eval_id")
    }),

    // IVF-PQ: coarse cells shard the corpus, queries ADC-scan only their
    // nprobe best cells' compact codes — the standard production ANN
    // composition, both knobs (cells, nprobe) exercised. RESIDUAL form
    // (codes quantize x − cell centroid, the Jégou variant): measured
    // recall lift at the same code budget, exact integers end to end.
    "q_sim_ivfpq" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val coarse = Similarity.trainCentroids(e, 8, 2)
      val cb = Similarity.pqTrainCodebooksResidual(
        e, coarse, dims = 64, m = 4, k = 16, iters = 2)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopK(e, coarse, cb, queries, 5, nprobe = 2, dims = 64, m = 4)
        .select("qid", "rank", "vec_id", "adc")
        .orderBy("qid", "rank")
    }),

    // Serving from a PERSISTED index: quantizers trained and corpus encoded
    // once (memoized build under /tmp, paid by Bench's warm-up), every
    // execution here only loads coarse/codebooks/codes and serves — probe
    // cells become a literal partition filter on the hive-partitioned codes
    // table. Same ranking contract as q_sim_ivfpq (shared oracle).
    "q_sim_ivfpq_persisted" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val idx = persistedIndex(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopKIndexed(idx, queries, 5, nprobe = 2)
        .select("qid", "rank", "vec_id", "adc")
        .orderBy("qid", "rank")
    }),

    // FILTERED ANN serving: the same persisted index, restricted to
    // label = 2 candidates via the attribute predicate pushed into the
    // codes scan (pre-filter semantics — every returned row satisfies the
    // predicate, ranked by the same ADC contract). The oracle replays the
    // unfiltered ADC and filters candidates by label — identical by
    // construction since ADC is per-candidate.
    "q_sim_ivfpq_filtered" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val idx = persistedIndex(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopKIndexed(idx, queries, 5, nprobe = 2,
          filter = Some(col("label") === 2))
        .select("qid", "rank", "vec_id", "adc")
        .orderBy("qid", "rank")
    }),

    // Tombstone-deleted ANN serving: the committed index minus the
    // vec_id % 7 == 2 takedown set — quantizers trained on the FULL
    // corpus (the delete arrived after the build), candidates anti-joined;
    // the oracle replays full training and filters only candidates
    "q_sim_ivfpq_deleted" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val idx = persistedDeletedIndex(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopKIndexed(idx, queries, 5, nprobe = 2)
        .select("qid", "rank", "vec_id", "adc")
        .orderBy("qid", "rank")
    }),

    // Serving with the exact re-rank stage: the ADC scan only has to get
    // the true neighbors INTO a 32-candidate shortlist; the final ranking
    // exact-scores that shortlist against the raw vectors persisted per
    // cell — recall at the exact nprobe ceiling, cost ∝ shortlist
    "q_sim_ivfpq_rerank" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val idx = persistedIndex(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfPqTopKIndexedRerank(idx, queries, 5, nprobe = 2, shortlist = 32)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // Product quantization end-to-end: 4 subspaces × 16 L2-trained codes,
    // corpus compressed to (vec_id, sub, code), queries answered by ADC
    // lookup-table scan over the codes — the compact-code ANN scale path
    "q_sim_pq" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val cb = Similarity.pqTrainCodebooks(e, dims = 64, m = 4, k = 16, iters = 2)
      val codes = Similarity.pqEncode(e, cb, dims = 64, m = 4)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.pqAdcTopK(codes, cb, queries, 5, dims = 64, m = 4)
        .select("qid", "rank", "vec_id", "adc")
        .orderBy("qid", "rank")
    }),

    // IVF: coarse-quantize to the 8 leading vectors, probe the query's cell
    "q_sim_ivf" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(e, centroids, queries, 5)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // IVF with multi-cell probing: each query searches its 2 best cells —
    // the recall knob every real IVF deployment turns
    "q_sim_ivf_nprobe" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(e, centroids, queries, 5, nprobe = 2)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // Redundant (top-2) assignment at the same nprobe: the recall lever's
    // exact-scoring form under the oracle gate — the SQL replays top-2
    // cell assignment, the probe, candidate dedup, and exact-dot ranking
    "q_sim_ivf_multi" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val centroids = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopKMulti(e, centroids, queries, 5, nprobe = 2, assignR = 2)
        .select("qid", "rank", "vec_id", "dot")
        .orderBy("qid", "rank")
    }),

    // SRP-LSH bucketed near-duplicate vectors on planted exact dups
    "q_embed_neardup" -> ((s, dir) => {
      GraftExtensions.register(s)
      Similarity.srpNearDuplicates(embWithDups(s, dir), nBits = 8, dims = 64, threshold = 0.99)
        .orderBy("id_a", "id_b")
    }),

    // Deterministic 10% corpus sample (hash-bucketed, reproducible anywhere)
    "q_corpus_sample" -> ((s, dir) =>
      graft.ops.Corpus.sampleDeterministic(docs(s, dir), "doc_id", 0.10)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // Temperature mixture rates (T=2 flattens toward uniform): per-lang
    // share and the downsample-only keep rate p^(1/T-1)/max
    "q_corpus_temperature" -> ((s, dir) =>
      graft.ops.Corpus.temperatureRates(docs(s, dir), "lang", temperature = 2.0)
        .orderBy("lang")),

    // ...and the applied mix: per-lang kept counts under the same
    // hash-bucket filter (deterministic, incremental-stable)
    "q_corpus_temperature_sample" -> ((s, dir) =>
      graft.ops.Corpus.sampleByTemperature(
          docs(s, dir), "doc_id", "lang", temperature = 2.0)
        .groupBy("lang").agg(count(lit(1)).as("kept"))
        .orderBy("lang")),

    // Epoch UPSAMPLING rates (T=2, cap 4): the repetition complement of
    // the temperature mix — largest lang trains exactly once, tail langs
    // repeat up to maxEpochs
    "q_corpus_epochs" -> ((s, dir) =>
      graft.ops.Corpus.epochRates(docs(s, dir), "lang", temperature = 2.0)
        .orderBy("lang")),

    // ...and the applied repetition: per-(lang, epoch) output counts —
    // each full epoch carries the whole group, the final partial epoch
    // the hash-selected fractional share
    "q_corpus_epoch_sample" -> ((s, dir) =>
      graft.ops.Corpus.sampleWithRepetition(
          docs(s, dir), "doc_id", "lang", temperature = 2.0)
        .groupBy("lang", "epoch").agg(count(lit(1)).as("docs"))
        .orderBy("lang", "epoch")),

    // Deterministic train/val/test split + per-split token budgets
    "q_corpus_split" -> ((s, dir) =>
      graft.ops.Corpus.withSplit(docs(s, dir), "doc_id")
        .groupBy("split")
        .agg(
          count(lit(1)).as("docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("tokens"))
        .orderBy("split")),

    // Domain-weighted mix: keep 50% of src0, 25% of src1, 5% of the rest
    "q_corpus_mix" -> ((s, dir) =>
      Corpus.sampleByGroup(docs(s, dir), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.05)
        .groupBy("source")
        .agg(count(lit(1)).as("docs"))
        .orderBy("source")),

    // Deterministic training-order shuffle: stable salted-hash order column
    "q_corpus_shuffle" -> ((s, dir) =>
      Corpus.withShuffleOrder(docs(s, dir), "doc_id")
        .select("doc_id", "ord")
        .orderBy("ord", "doc_id")),

    // Stratified round-robin interleave: rank r of every lang precedes
    // rank r+1 of any lang — stable per-batch source mix
    "q_corpus_interleave" -> ((s, dir) =>
      Corpus.withInterleaveOrder(docs(s, dir), "doc_id", "lang")
        .select("doc_id", "lang", "ord")
        .orderBy("ord", "lang", "doc_id")),

    // Exact one-pass correlation matrix over three length/diversity
    // signals — the redundant-feature audit before pruning score columns
    "q_profile_corr" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("n_chars").cast("double").as("n_chars"),
        size(split(col("text"), " ")).cast("double").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("double").as("n_distinct"))
      graft.ops.Profile.correlations(d, Seq("n_chars", "n_tokens", "n_distinct"))
        .orderBy("col_a", "col_b")
    }),

    // Composite curation gate: all failed quality rules per doc, one pass
    "q_text_curation" -> ((s, dir) => {
      GraftExtensions.register(s)
      TextOps.curationGate(docs(s, dir), "doc_id", "text",
          TextOps.CurationRules(
            minTokens = 30, maxTopTokenFrac = 0.12, maxDupBigramFrac = 0.2))
        .orderBy("doc_id")
    }),

    // COMPOSED batch curation capstone: quality gate -> exact dedup ->
    // temperature mix (T=2, by lang) -> token budget — each stage the
    // same spec-verified operator as its standalone query, chained, and
    // the WHOLE flow replayed bit-exact by one oracle CTE chain. This is
    // the "run the full curation pass" shape a corpus owner actually
    // executes; every stage stays set-based so the composition is one
    // plan, no intermediate materialization.
    "q_pipeline_curate" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val gate = TextOps.curationGate(d, "doc_id", "text",
        TextOps.CurationRules(
          minTokens = 30, maxTopTokenFrac = 0.12, maxDupBigramFrac = 0.2))
      val gated = d.join(gate.where(col("keep")).select("doc_id"), Seq("doc_id"))
      val deduped = Dedup.exactByContent(gated, "doc_id", "text")
      val mixed = Corpus.sampleByTemperature(
        deduped, "doc_id", "lang", temperature = 2.0)
      Corpus.sampleToTokenBudget(
          mixed.select("doc_id", "text", "lang", "source", "n_chars"),
          "doc_id", size(split(col("text"), " ")), budget = 8000L)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // COMPOSED crawl-ingest capstone — the FRONT end a crawl corpus runs
    // before any of the batch-curation flows: HTML strip → URL hygiene
    // (canonicalize → registrable-domain blocklist → eTLD+1 cap) →
    // language-ID gate (rejection plants and unclassifiable docs drop as
    // 'und') → quality gate → within-doc line dedup → corpus-wide
    // paragraph dedup → exact-fingerprint decontamination (benchmark
    // suite drawn from the corpus itself: the %97 docs) → temperature
    // mix by DETECTED language. Every stage is the same spec-verified
    // operator as its standalone query, chained as ONE plan; the whole
    // flow replays bit-exact in one oracle CTE chain. Plants: the PSL
    // URL families (%6), the 21 lang plants incl. rejection plants (%5),
    // a uniform HTML wrap with an entity family (%3), boilerplate lines
    // around every doc, and the %97 benchmark membership.
    "q_pipeline_crawl" -> ((s, dir) => {
      GraftExtensions.register(s)
      val t0 = when(col("doc_id") % 5 === 0,
        element_at(array(langPlants.map(lit): _*),
          ((col("doc_id") / 5).cast("long") % langPlants.size + 1).cast("int")))
        .otherwise(col("text"))
      crawlCapstone(s, dir, t0)
    }),

    // The SAME capstone fed BYTES instead of text: every payload rides
    // through text_from_bytes first — script-native legacy charsets
    // where the decode ladder supports them (ja→Shift_JIS, zh→GB18030,
    // ko→EUC-KR, ru/uk/bg→windows-1251), windows-1252 where the plant
    // is representable (the Latin legacy arm), UTF-16LE+BOM for the
    // rest (el/he/th/pl/cs/…), UTF-8 for the ordinary docs. Each
    // framing decodes back to the EXACT plant string, so the oracle is
    // bit-identical to q_pipeline_crawl's — the corpus-level proof that
    // byte ingest composes losslessly with the whole curation front end.
    "q_pipeline_crawl_bytes" -> ((s, dir) => {
      GraftExtensions.register(s)
      val idx = ((col("doc_id") / 5).cast("long") % langPlants.size + 1).cast("int")
      val bytes = when(col("doc_id") % 5 === 0,
        element_at(array(langPlantBytes.map(lit(_)): _*), idx))
        .otherwise(encode(col("text"), "UTF-8"))
      crawlCapstone(s, dir, TextOps.textFromBytes(bytes))
    }),

    // Per-source quota cap: keep each source's 10 longest documents
    // (quality-ranked cap, not an unbiased draw)
    // Training-export sharding: deterministic global shuffle into 8
    // shards — shard assignment AND within-shard order are salted id
    // hashes, so the oracle replays the whole export layout bit-for-bit
    "q_corpus_shard" -> ((s, dir) =>
      Corpus.withTrainingShard(
          docs(s, dir).select("doc_id", "source"), "doc_id", nShards = 8, salt = "x")
        .select("doc_id", "source", "shard", "ord")
        .orderBy("doc_id")),

    "q_corpus_cap" -> ((s, dir) =>
      Corpus.capPerGroup(docs(s, dir), "source", n = 10,
          col("n_chars").desc, col("doc_id").asc)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // Exact-count per-group sampling: precisely 3 docs per source
    "q_corpus_sample_exact" -> ((s, dir) =>
      Corpus.sampleExactPerGroup(docs(s, dir), "doc_id", "source", n = 3)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Length-outlier trim: keep the middle 50% of the corpus by n_chars
    "q_corpus_quantile_trim" -> ((s, dir) =>
      Corpus.filterByQuantileRange(docs(s, dir), "n_chars", 0.25, 0.75)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // Token-budget sequence packing: 8 parallel buckets, 512-token sequences
    "q_corpus_pack" -> ((s, dir) =>
      Corpus.packSequences(
          docs(s, dir), "doc_id", TextOps.tokenCount(col("text")), budget = 512L,
          nBuckets = 8)
        .select("doc_id", "bucket", "seq")
        .orderBy("doc_id")),

    // Training-example assembly: each (bucket, seq) pack as one row with
    // id-ordered member/boundary CSVs — what a trainer consumes
    "q_corpus_pack_examples" -> ((s, dir) =>
      Corpus.packedExamples(
          docs(s, dir), "doc_id", TextOps.tokenCount(col("text")), budget = 512L,
          nBuckets = 8)
        .orderBy("bucket", "seq")),

    // PII detection + redaction over deterministically planted PII
    "q_pii_scan" -> ((s, dir) =>
      docsWithPii(s, dir)
        .select(
          (col("doc_id") +: Pii.counts(col("text")) :+
            Pii.redact(col("text")).as("redacted")): _*)
        .orderBy("doc_id")),

    // Stable pseudonymization: every PII match → <KIND:md5-hash8>, same
    // value → same token (linkable, unlike constant redaction)
    "q_pii_pseudonymize" -> ((s, dir) => {
      GraftExtensions.register(s)
      docsWithPii(s, dir)
        .select(col("doc_id"), Pii.pseudonymize(col("text")).as("pseudonymized"))
        .orderBy("doc_id")
    }),

    // Corpus-wide vocabulary stats: top-20 bigrams with deterministic ties
    "q_text_top_ngrams" -> ((s, dir) =>
      TextOps.topNgrams(docs(s, dir), "text", n = 2, k = 20)),

    // Document frequency: tokens by number of distinct docs containing them
    "q_text_docfreq" -> ((s, dir) =>
      TextOps.docFrequency(docs(s, dir), "text", k = 20)),

    // Vocabulary coverage: per-doc OOV rate against the learned top-300
    // token vocabulary (broadcast back over the corpus)
    "q_text_vocab_oov" -> ((s, dir) =>
      TextOps.vocabCoverage(docs(s, dir), "doc_id", "text", vocabSize = 300)
        .orderBy("doc_id")),

    // Per-doc perplexity under a self-trained add-one unigram LM — the
    // CCNet-style distribution-distance quality signal
    "q_text_perplexity" -> ((s, dir) =>
      TextOps.unigramPerplexity(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Per-doc token-distribution Shannon entropy — the distribution-wide
    // repetitiveness signal
    "q_text_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Bigram-LM perplexity: first token unigram-scored, the rest
    // conditionally — one LM order up, same exact-parity construction
    "q_text_perplexity2" -> ((s, dir) =>
      TextOps.bigramPerplexity(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Context-window chunking: 32-token chunks, 8-token overlap — the
    // curation → packing bridge; pure per-doc explode, no shuffle
    "q_text_chunk" -> ((s, dir) =>
      TextOps.chunkDocuments(docs(s, dir), "doc_id", "text",
        chunkTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_no")),

    // Distinctive keywords: each doc's 3 rarest-then-most-frequent tokens
    // (integer-ranked TF-IDF ordering, no logarithms)
    "q_text_keywords" -> ((s, dir) =>
      TextOps.distinctiveTokens(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    // Gopher-style repetition signals (top-token share, duplicate bigrams)
    "q_text_repetition" -> ((s, dir) => {
      GraftExtensions.register(s)
      TextOps.repetitionSignalsNative(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Multimodal frame fan-out: one asset row → N "frame" rows (posexplode),
    // the exact shape a real video frame extractor produces
    "q_mm_frames" -> ((s, dir) => {
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("video"), col("text"), col("source"))(docs(s, dir))
      Multimodal.sampleFrames(assets, stride = 64, frameBytes = 16)
        .select(col("asset_id"), col("frame_no"), md5(col("frame_payload")).as("frame_md5"))
        .orderBy("asset_id", "frame_no")
    }),

    // REAL image decode: deterministic PNGs planted per doc_id (solid color
    // with a black x=0 stripe), decoded by the in-JDK javax.imageio kernel
    // to exact pixel sums — the oracle recomputes every statistic in closed
    // form from the generation parameters, so a decoder that only read
    // metadata (or mis-read pixels) hash-fails
    // REAL resize: every planted image block-averaged down to 4×4 and
    // RE-DECODED — the oracle recomputes all 16 output pixels (floored
    // integer block means, black-column handling) from the closed form,
    // so a resize that mis-tiled, float-rounded, or read metadata only
    // would mismatch
    "q_mm_resize" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("image"),
        call_function("synth_image", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"),
          Multimodal.decodeImage(Multimodal.resizeImage(col("content"), 4, 4)).as("f"))
        .select(col("asset_id"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.n_px").as("n_px"), col("f.sum_r").as("sum_r"),
          col("f.sum_g").as("sum_g"), col("f.sum_b").as("sum_b"))
        .orderBy("asset_id")
    }),

    // Perceptual hash (aHash64) of every planted image: 8×8 block-average
    // luminance vs global mean, bits compared CROSS-MULTIPLIED — the
    // oracle recomputes all 64 bits from the planted geometry closed form,
    // so a kernel that mis-tiled cells or divided in floats would mismatch
    "q_mm_phash" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("image"),
        call_function("synth_image", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"), Multimodal.imageAHash(col("content")).as("phash"))
        .orderBy("asset_id")
    }),

    // Energy-profile audio fingerprint of every planted WAV: 64 windows
    // (frame w-assignment i·64/F, integer division) vs mean frame energy,
    // cross-multiplied — the oracle recomputes each of the ~320 samples
    // per track from the generation closed form and replays all 64 bits
    "q_mm_audio_fp" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("audio"),
        call_function("synth_wav", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"), Multimodal.audioFingerprint(col("content")).as("afp"))
        .orderBy("asset_id")
    }),

    // The SAME perceptual hashes served from the DECODE-ONCE feature
    // store: payload bytes were decoded exactly once at store build; this
    // query reads the committed fingerprint column — the rerun-economics
    // path. Oracle shared with q_mm_phash verbatim (the store must hold
    // exactly what the decode path computes).
    "q_mm_phash_indexed" -> ((s, dir) => {
      Multimodal.readFeatureStore(s, mmFeatureStoreDir(s, dir))
        .where(col("modality") === "image")
        .select(col("asset_id"), col("simhash").as("phash"))
        .orderBy("asset_id")
    }),

    // Image near-duplicate PAIRS served from the feature store: the
    // banded pair search runs over the persisted 64-bit hashes (zero
    // payload reads). The planted geometry makes the phash bits a pure
    // function of (id%8, id%5) — the luminance L cancels from the bit
    // rule — so only 40 distinct bit patterns exist and pair mass is
    // quadratic in the corpus; a deterministic tenth keeps outputs
    // bounded (the q_dedup_simhash_pairs subset discipline) while the
    // oracle replays hash bits, 16-bit banding, and the hamming cut.
    "q_mm_neardup_indexed" -> ((s, dir) => {
      Dedup.simhashNearDuplicates64(
          Multimodal.readFeatureStore(s, mmFeatureStoreDir(s, dir))
            .where(col("modality") === "image" && col("asset_id") % 10 === 0 &&
              col("simhash").isNotNull)
            .select(col("asset_id").as("id"), col("simhash")),
          maxHamming = 3,
          // production-shaped stop-bucket cap, mirrored in the oracle: the
          // synthetic near-uniform images are one giant hamming cluster by
          // construction (the blank-image degenerate case), so uncapped
          // output is quadratic in corpus size — the 28x/decade line in
          // BENCH_SCALE10X r13. At sf0.01 (the correctness gate) the 50
          // asset buckets stay under the cap; at 10x the degenerate family
          // drops whole, exactly the engine's documented treatment.
          maxOccupancy = 64)
        .withColumnRenamed("id_a", "asset_a").withColumnRenamed("id_b", "asset_b")
        .orderBy("asset_a", "asset_b")
    }),

    // Audio twin of q_mm_phash_indexed — oracle shared with q_mm_audio_fp.
    "q_mm_audio_fp_indexed" -> ((s, dir) => {
      Multimodal.readFeatureStore(s, mmFeatureStoreDir(s, dir))
        .where(col("modality") === "audio")
        .select(col("asset_id"), col("simhash").as("afp"))
        .orderBy("asset_id")
    }),

    "q_mm_decode" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("image"),
        call_function("synth_image", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"), Multimodal.decodeImage(col("content")).as("f"))
        .select(
          col("asset_id"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.n_px").as("n_px"),
          col("f.sum_r").as("sum_r"), col("f.sum_g").as("sum_g"),
          col("f.sum_b").as("sum_b"))
        .orderBy("asset_id")
    }),

    // VP8L (lossless WebP) PIXEL decode (r17): synth_webp_l plants a
    // real lossless-WebP per doc_id whose seven encoder arms exercise
    // every decoder component — plain literals, subtract-green, LZ77
    // backreferences over striped rows (near plane codes AND the far
    // code 97, so a wrong 2D-distance map shifts which stripe is
    // copied and fails the sum), the color cache, a sub-byte
    // bundled palette, the predictor transform, and a full
    // code-length-coded prefix code — and whose pixels are closed-form
    // in the id, so the oracle recomputes exact per-channel sums the
    // way q_mm_decode does for PNG. This is the tier that makes
    // perceptual dedup see WebP (javax.imageio cannot).
    "q_mm_decode_vp8l" -> ((s, dir) => {
      GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id").as("asset_id"),
          Multimodal.decodeImage(
            call_function("synth_webp_l", col("doc_id"))).as("f"))
        .select(col("asset_id"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.n_px").as("n_px"),
          col("f.sum_r").as("sum_r"), col("f.sum_g").as("sum_g"),
          col("f.sum_b").as("sum_b"))
        .orderBy("asset_id")
    }),

    // REAL video container metadata: deterministic MP4s planted per doc_id
    // (every box parameter closed-form in the id — v0/v1 mvhd layouts,
    // 64-bit largesize headers, 1-3 tracks, a corrupt family), parsed by
    // the pure-JDK ISO-BMFF kernel; the oracle recomputes duration/track/
    // codec/dims from the generation formulas, so a parser that misreads
    // any box offset hash-fails
    // Header-only image metadata over planted fixtures: WebP headers
    // (rotating VP8/VP8L/VP8X framings with a truncated-shell corrupt
    // arm at id%7=6 — the format javax.imageio cannot decode, where the
    // metadata tier is the ONLY tier), real synth PNGs whose IHDR
    // geometry is closed-form in the id, and AVIF/HEIC (ISO-BMFF
    // ftyp/meta/iprp/ipco/ispe walk with auxC alpha and a
    // size-past-EOF corrupt meta arm — the other two dominant crawl
    // formats with no in-JDK decoder). The oracle recomputes every
    // field from the generation parameters; corrupt → NULL.
    "q_mm_image_meta" -> ((s, dir) => {
      GraftExtensions.register(s)
      val content = when(col("doc_id") % 4 < 2,
        call_function("synth_webp", col("doc_id")))
        .when(col("doc_id") % 4 === 2,
          call_function("synth_image", col("doc_id")))
        .otherwise(call_function("synth_avif", col("doc_id")))
      docs(s, dir)
        .select(col("doc_id").as("asset_id"),
          Multimodal.imageMeta(content).as("m"))
        .select(col("asset_id"),
          col("m.format").as("format"), col("m.width").as("width"),
          col("m.height").as("height"),
          // INT, not BOOLEAN: a nullable bool's None/NaN representation
          // diverges between the engines' dataframe bridges
          col("m.has_alpha").cast("int").as("has_alpha"))
        .orderBy("asset_id")
    }),

    "q_mm_video_meta" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("video"),
        call_function("synth_mp4", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"), Multimodal.videoMeta(col("content")).as("f"))
        .select(
          col("asset_id"),
          col("f.duration_ms").as("duration_ms"),
          col("f.n_tracks").as("n_tracks"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.codecs").as("codecs"))
        .orderBy("asset_id")
    }),

    // REAL audio decode: deterministic 16-bit PCM WAVs planted per doc_id
    // (sample(ch,i) closed-form in the id), decoded by the in-JDK
    // javax.sound.sampled kernel to exact per-channel sample sums — the
    // oracle recomputes every statistic from the generation parameters, so
    // a decoder that only read the WAV header (or mis-read samples)
    // hash-fails
    "q_mm_audio" -> ((s, dir) => {
      GraftExtensions.register(s)
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("audio"),
        call_function("synth_wav", col("doc_id")), col("source"))(docs(s, dir))
      assets
        .select(col("asset_id"), Multimodal.decodeAudio(col("content")).as("f"))
        .select(
          col("asset_id"),
          col("f.sample_rate").as("sample_rate"),
          col("f.channels").as("channels"),
          col("f.n_frames").as("n_frames"),
          col("f.sum_c0").as("sum_c0"), col("f.sumsq_c0").as("sumsq_c0"),
          col("f.sum_c1").as("sum_c1"), col("f.sumsq_c1").as("sumsq_c1"))
        .orderBy("asset_id")
    }),

    // Schema'd JSONL ingest with a corrupt-record ledger: the documents
    // table dumped as JSONL (memoized; 1-in-97 lines truncated at the
    // closing brace), read back with an EXPLICIT schema in PERMISSIVE
    // mode — inference is banned at 100 TB — and summarized into the
    // per-lang ingest-health ledger. A corrupt line parses no lang, so it
    // lands whole in the null group; the oracle predicts the entire
    // ledger in closed form from the truncation rule.
    "q_jsonl_ingest" -> ((s, dir) => {
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("source", StringType).add("n_chars", LongType)
      Jsonl.ingestStats(
          Jsonl.read(s, jsonlDump(s, dir), schema), "lang", col("n_chars"))
        .withColumnRenamed("mass", "sum_chars")
        .orderBy("lang")
    }),

    // ORC roundtrip: documents mirrored through Spark's built-in ORC
    // datasource (write once, _SUCCESS-guarded) and read back — schema
    // and values incl. nulls must survive the format byte-exactly; the
    // oracle reads the original parquet, so any ORC fidelity loss fails
    // the hash
    "q_src_orc" -> ((s, dir) => {
      val d = docs(s, dir)
      // orcMirror is itself _SUCCESS-guarded, so the memo guard is a
      // constant-true: the helper only contributes the fingerprint key
      val path = storeMemo(d, "doc_id", dir, "graft_orc_v1")(_ => true)(_ => ())
      graft.sources.Columnar.orcMirror(s, d, path)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // Multimodal plumbing: documents as binary assets → stub feature extract
    "q_mm_features" -> ((s, dir) => {
      val assets = Multimodal.asAsset(
        col("doc_id"), lit("image"), col("text"), col("source"))(docs(s, dir))
      Multimodal.extractFeatures(assets)
        .select(
          col("asset_id"), col("modality"), col("source"), col("n_bytes"),
          col("features.digest").as("digest"),
          col("features.width").as("width"),
          col("features.height").as("height"))
        .orderBy("asset_id")
    }),

    // BM25 lexical retrieval: three fixed keyword queries (one with the
    // corpus's only rare term "dup", one with an out-of-vocabulary term that
    // must contribute nothing) against the one-shuffle postings index
    "q_ret_bm25" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        (0L, "spark dup"), (1L, "hash join merge"),
        (2L, "window sort dup quantum")).toDF("qid", "qtext")
      Retrieval.bm25(docs(s, dir), "doc_id", "text", queries, k = 10)
        .orderBy("qid", "rank")
    }),

    // BM25F multi-field ranking: title (first 5 tokens, boost 2) + body
    // (rest, boost 1) — weighted tf summed into ONE saturation curve
    // with weighted length normalization, df over any-field presence
    "q_ret_bm25f" -> ((s, dir) => {
      import s.implicits._
      val fielded = docs(s, dir).select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("title"),
        array_join(slice(split(col("text"), " "), 6, 1000000), " ").as("body"))
      val queries = Seq(
        (0L, "spark dup"), (1L, "hash join merge"),
        (2L, "window sort")).toDF("qid", "qtext")
      Retrieval.bm25F(fielded, "doc_id",
          Seq(("title", 2.0), ("body", 1.0)), queries, k = 10)
        .orderBy("qid", "rank")
    }),

    // BM25F fed from RAW HTML BYTES end-to-end (r18): each doc is
    // planted as a real page — first 5 tokens in <head><title>, the
    // rest in <body><p> — and the fields come out of the bytes through
    // the crawl-side kernels: html_title (the head field html_to_text
    // rightly drops) and html_to_text (the body). The fielded frame is
    // definitionally identical to q_ret_bm25f's split, so the oracle
    // replays the same closed-form BM25F — proving the title rung
    // closes the crawl→retrieval gap (a title-only term match ranks
    // via the 2× title weight).
    "q_ret_bm25f_crawl" -> ((s, dir) => {
      import s.implicits._
      GraftExtensions.register(s)
      val html = concat(
        lit("<html><head><meta charset=\"utf-8\">" +
          "<script>var t = \"<title>not me</title>\";</script><title> "),
        array_join(slice(split(col("text"), " "), 1, 5), " "),
        lit(" </title></head><body><nav>site chrome</nav><p>"),
        array_join(slice(split(col("text"), " "), 6, 1000000), " "),
        lit("</p></body></html>"))
      val fielded = docs(s, dir).select(col("doc_id"),
        TextOps.htmlTitle(html).as("title"),
        TextOps.htmlToText(html).as("body"))
      val queries = Seq(
        (0L, "spark dup"), (1L, "hash join merge"),
        (2L, "window sort")).toDF("qid", "qtext")
      Retrieval.bm25F(fielded, "doc_id",
          Seq(("title", 2.0), ("body", 1.0)), queries, k = 10)
        .orderBy("qid", "rank")
    }),

    // Phrase-constrained BM25: only documents containing "a a the"
    // contiguously are ranked, but idf/avgdl stay full-corpus — the
    // filter-vs-scoring split, both halves replayed in the oracle
    "q_ret_phrase_bm25" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "table value"), (1L, "spark window")).toDF("qid", "qtext")
      Retrieval.bm25Phrase(docs(s, dir), "doc_id", "text", queries, "a a the", k = 10)
        .orderBy("qid", "rank")
    }),

    // Hybrid retrieval: BM25 keyword ranking fused with exact-cosine vector
    // ranking by reciprocal rank fusion — query text is the first 4 tokens
    // of each query document, the query vector its embedding (doc_id ≡
    // vec_id in the test corpus)
    "q_ret_hybrid_rrf" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val textQueries = d.where(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      val vecQueries = emb(s, dir).where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val lex = Retrieval.bm25(d, "doc_id", "text", textQueries, k = 10)
      val vec = Similarity.bruteForceTopK(emb(s, dir), vecQueries, 10)
        .select(col("qid"), col("rank"), col("vec_id").as("doc_id"))
      Retrieval.rrfFuse(Seq(lex.select("qid", "rank", "doc_id"), vec), k = 10)
        .orderBy("qid", "rank")
    }),

    // RM3 pseudo-relevance feedback: BM25 pass-1 top-5 feedback docs,
    // relevance-model term weights, top-10 expansion terms interpolated
    // 0.5/0.5 with the uniform original query, weighted BM25 pass-2
    "q_ret_bm25_rm3" -> ((s, dir) => {
      val d = docs(s, dir)
      val textQueries = d.where(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      Retrieval.bm25Rm3(d, "doc_id", "text", textQueries,
          k = 10, fbDocs = 5, fbTerms = 10, origWeight = 0.5)
        .orderBy("qid", "rank")
    }),

    // Ranking evaluation: BM25 top-10 against a deterministic synthetic
    // qrels set ((doc_id + qid) % 17 == 0 relevant, graded 1..3) —
    // nDCG/MRR/precision/recall per query, every frame queries-sided
    "q_ret_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val textQueries = d.where(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      val qrels = textQueries.select("qid")
        .crossJoin(d.select("doc_id"))
        .where((col("doc_id") + col("qid")) % 17 === 0)
        .select(col("qid"), col("doc_id"),
          ((col("doc_id") + col("qid")) % 3 + 1).cast("int").as("grade"))
      val results = Retrieval.bm25(d, "doc_id", "text", textQueries, k = 10)
      Retrieval.evalRanking(results, qrels, k = 10).orderBy("qid")
    }),

    // The same RM3 expansion served from the PERSISTED lexical index —
    // identical ranking (the index round-trips postings/df/stats), pass-2
    // recovers token pruning via the collected expanded-term literal
    "q_ret_bm25_rm3_indexed" -> ((s, dir) => {
      val d = docs(s, dir)
      val textQueries = d.where(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      Retrieval.bm25Rm3Indexed(
          Retrieval.readLexIndex(s, lexIndexDir(s, dir)), textQueries,
          k = 10, fbDocs = 5, fbTerms = 10, origWeight = 0.5)
        .orderBy("qid", "rank")
    }),

    // Calibrated hybrid: the same lexical + vector lists fused by weighted
    // min-max-normalized scores (0.7 lexical / 0.3 vector) — keeps score
    // magnitude where RRF keeps only rank
    "q_ret_hybrid_norm" -> ((s, dir) => {
      GraftExtensions.register(s)
      val d = docs(s, dir)
      val textQueries = d.where(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      val vecQueries = emb(s, dir).where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val lex = Retrieval.bm25(d, "doc_id", "text", textQueries, k = 10)
        .select(col("qid"), col("doc_id"), col("score"))
      val vec = Similarity.bruteForceTopK(emb(s, dir), vecQueries, 10)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("dot").cast("double").as("score"))
      Retrieval.fuseNormalized(Seq((lex, 0.7), (vec, 0.3)), k = 10)
        .orderBy("qid", "rank")
    }),

    // DSIR importance weights: every document scored by hashed-unigram
    // log-likelihood ratio against the English subset as the target
    // distribution — documents distributionally closest to the target get
    // the highest weights
    "q_corpus_dsir" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.dsirLogWeights(d, d.where(col("lang") === "en"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // CCNet perplexity bucketing: head/middle/tail by the corpus-level
    // perplexity tertiles (exact interpolated percentiles as broadcast
    // one-row edges)
    "q_text_ppl_buckets" -> ((s, dir) =>
      TextOps.perplexityBuckets(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Trained hashed-NB domain classifier: fit on the 80% doc_id%10<8
    // slice (lang as the label), score the held-out 20% — max-posterior
    // label from hashed add-one multinomial counts
    "q_text_nb_classify" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = TextOps.nbTrain(
        d.where(col("doc_id") % 10 < 8), "lang", "text")
      TextOps.nbPredict(
          d.where(col("doc_id") % 10 >= 8), "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    // ...and its held-out confusion matrix: truth × predicted label
    // counts — the measurement layer for the trained classifier
    "q_text_nb_confusion" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = TextOps.nbTrain(
        d.where(col("doc_id") % 10 < 8), "lang", "text")
      TextOps.nbPredict(
          d.where(col("doc_id") % 10 >= 8), "doc_id", "text", model)
        .join(d.select(col("doc_id"), col("lang").as("truth")), Seq("doc_id"))
        .groupBy("truth", "pred").agg(count(lit(1)).as("n"))
        .orderBy("truth", "pred")
    }),

    // ...and its margin-based reliability report: held-out docs bucketed
    // by the top-vs-runner-up score margin (engine-exact confidence proxy
    // — a softmax's exp would hang the hash on libm rounding), per-bucket
    // volume and accuracy — the "gate unreviewed above which band?" table
    "q_text_nb_reliability" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = TextOps.nbTrain(
        d.where(col("doc_id") % 10 < 8), "lang", "text")
      TextOps.nbMarginReliability(
          d.where(col("doc_id") % 10 >= 8), "doc_id", "text", "lang", model)
        .orderBy("bucket")
    }),

    // Cross-split duplicate-contamination audit: content duplicated under
    // NEW ids (the benchmark-leak scenario) lands on both sides of the
    // hash split — per split pair, spanning dup groups and leaked pairs
    "q_corpus_split_leakage" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val contaminated = d.unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Corpus.splitLeakageAudit(contaminated, "doc_id", "text")
        .orderBy("split_a", "split_b")
    }),

    // Token-budget sampling: the hash-shuffled prefix of the corpus whose
    // cumulative token count fits a 15000-token budget — decomposed as
    // bucket prefix sums + partitioned windows, never a global sort
    "q_corpus_token_budget" -> ((s, dir) =>
      Corpus.sampleToTokenBudget(
          docs(s, dir).select("doc_id", "text", "lang", "source", "n_chars"),
          "doc_id", size(split(col("text"), " ")), budget = 15000L)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // Serving-time BM25 over the PERSISTED lexical index (manifest-committed
    // segments, token-range-clustered postings, literal term filter for
    // file skipping) — must rank identically to the direct q_ret_bm25, so
    // the two queries share one oracle
    "q_ret_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        (0L, "spark dup"), (1L, "hash join merge"),
        (2L, "window sort dup quantum")).toDF("qid", "qtext")
      Retrieval.bm25TopKIndexed(
          Retrieval.readLexIndex(s, lexIndexDir(s, dir)), queries, k = 10)
        .orderBy("qid", "rank")
    }),

    // Tombstone-deleted BM25 serving: the committed index minus the
    // doc_id % 7 == 3 takedown set — the oracle scores BM25 over the
    // REMAINING corpus only, so a hash match proves df/N/avgdl all
    // adjusted, not just that deleted docs stopped being retrievable
    "q_ret_bm25_deleted" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        (0L, "spark dup"), (1L, "hash join merge"),
        (2L, "window sort dup quantum")).toDF("qid", "qtext")
      Retrieval.bm25TopKIndexed(
          Retrieval.readLexIndex(s, lexIndexDeletedDir(s, dir)), queries, k = 10)
        .orderBy("qid", "rank")
    }),

    // MMR diversity re-ranking: each query's brute-force top-15 shortlist
    // greedily re-ranked to top-5 by relevance-minus-redundancy — the
    // oracle replays all 5 greedy selection rounds as unrolled CTEs
    "q_ret_mmr" -> ((s, dir) => {
      GraftExtensions.register(s)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cand = Similarity.bruteForceTopK(e, queries, 15)
        .select(col("qid"), col("vec_id").as("doc_id"), col("dot").as("rel"))
        .join(e.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      Similarity.mmrRerank(cand, k = 5).orderBy("qid", "rank")
    })
  )

  /** Shared by `q_ret_bm25` (direct) and `q_ret_bm25_indexed` (persisted
    * segments): the index is a physical layout, not a semantics change. */
  /** BM25F weighted-fields replay over the first-5/rest token split —
    * shared by q_ret_bm25f (fields sliced from `text`) and
    * q_ret_bm25f_crawl (the SAME fields extracted from planted HTML
    * bytes via html_title/html_to_text): one oracle pinning both IS the
    * end-to-end claim. */
  private lazy val bm25fWeightedFieldsOracle: String =
    """WITH fd AS (SELECT doc_id,
      |       array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS title,
      |       array_to_string(list_slice(string_split(text, ' '), 6, 1000000), ' ') AS body
      |     FROM documents),
      |fq AS (SELECT * FROM (VALUES (0, 'spark dup'), (1, 'hash join merge'),
      |                             (2, 'window sort')) AS v(qid, qtext)),
      |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS token FROM fq),
      |tok AS (SELECT doc_id, unnest(string_split(title, ' ')) AS token, 2.0 AS w
      |        FROM fd WHERE title IS NOT NULL
      |        UNION ALL
      |        SELECT doc_id, unnest(string_split(body, ' ')) AS token, 1.0 AS w
      |        FROM fd WHERE body IS NOT NULL),
      |fp AS (SELECT doc_id, token, sum(w) AS wtf FROM tok GROUP BY doc_id, token),
      |fwdl AS (SELECT doc_id, sum(wtf) AS wdl FROM fp GROUP BY doc_id),
      |fstat AS (SELECT count(*) AS n_docs, sum(wdl) AS total_wdl FROM fwdl),
      |fdf AS (SELECT token, count(*) AS df FROM fp GROUP BY token),
      |fsc AS (SELECT t.qid, p.doc_id,
      |          ln(1.0 + (CAST(s.n_docs AS DOUBLE) - f.df + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
      |          * (p.wtf * (1.2 + 1.0))
      |          / (p.wtf + 1.2 * ((1.0 - 0.75)
      |              + 0.75 * l.wdl * CAST(s.n_docs AS DOUBLE) / s.total_wdl)) AS sc
      |        FROM fp p JOIN fdf f USING (token) JOIN qt t USING (token)
      |        JOIN fwdl l USING (doc_id) CROSS JOIN fstat s),
      |fagg AS (SELECT qid, doc_id, round(sum(sc), 4) AS score FROM fsc GROUP BY qid, doc_id)
      |SELECT qid, rank, doc_id, score FROM (
      |  SELECT qid, doc_id, score,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      |  FROM fagg) WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  private lazy val bm25FixedQueriesOracle: String =
    s"""WITH ${bm25Ctes(
         "SELECT * FROM (VALUES (0, 'spark dup'), (1, 'hash join merge'), " +
           "(2, 'window sort dup quantum')) AS v(qid, qtext)")}
       |SELECT CAST(qid AS BIGINT) AS qid, rank, doc_id, score
       |FROM bmranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------------------------

  val oracleSql: Map[String, String] = Map(
    // ground truth by brute force: the prefix filter is a pure candidate-
    // generation optimization and must be invisible in the result
    "q_dedup_fuzzy" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b ON b.c_custkey > a.c_custkey
        |WHERE a.c_name IS NOT NULL AND b.c_name IS NOT NULL
        |  AND abs(length(a.c_name) - length(b.c_name)) <= 1
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // the same slot-fanout algorithm in SQL: every occurrence of a phrase
    // term votes for each start it could witness; a start with all three
    // distinct slots present is a hit
    "q_ret_phrase" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |              WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, g.i AS p, l[g.i] AS t
        |        FROM toks, UNNEST(generate_series(1, len(l))) g(i)),
        |ph AS (SELECT * FROM (VALUES (0, 'a'), (1, 'a'), (2, 'the')) v(j, t)),
        |fan AS (SELECT pos.doc_id, pos.p - ph.j AS base, ph.j
        |        FROM pos JOIN ph ON ph.t = pos.t),
        |hit AS (SELECT doc_id, base FROM fan GROUP BY doc_id, base
        |        HAVING count(DISTINCT j) = 3)
        |SELECT doc_id, count(*) AS n_occurrences FROM hit
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    lower(nfc_normalize(text || '  Café Café ÜBER	mix  ')),
        |    '\s+', ' ', 'g')) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // unigram + adjacent-pair counts replayed, PMI with the same
    // floating-op association order as the operator, rounded before ranking
    "q_text_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents
        |              WHERE text IS NOT NULL),
        |uni AS (SELECT t, count(*) AS cnt
        |        FROM (SELECT unnest(l) AS t FROM toks) GROUP BY t),
        |ut AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS u FROM uni),
        |bt AS (SELECT CAST(SUM(greatest(len(l) - 1, 0)) AS DOUBLE) AS b FROM toks),
        |pr AS (SELECT l[i] AS w1, l[i + 1] AS w2
        |       FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS g(i)),
        |pairs AS (SELECT w1, w2, count(*) AS pair_cnt FROM pr
        |          GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT p.w1, p.w2, p.pair_cnt,
        |       round(ln((CAST(p.pair_cnt AS DOUBLE) / bt.b)
        |                / ((CAST(u1.cnt AS DOUBLE) / ut.u)
        |                   * (CAST(u2.cnt AS DOUBLE) / ut.u))), 6) AS pmi
        |FROM pairs p
        |JOIN uni u1 ON u1.t = p.w1
        |JOIN uni u2 ON u2.t = p.w2, ut, bt
        |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin,

    // same salted-hash uniform, same ln/divide order, same 8-dp rounding
    // and id tie-break as Corpus.sampleWeighted
    "q_corpus_weighted_sample" ->
      """WITH w AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('wsample::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0),
        |p AS (SELECT doc_id, n_chars,
        |    round(ln((CAST(h AS DOUBLE) + 0.5) / 4294967296.0)
        |          / CAST(n_chars AS DOUBLE), 8) AS priority
        |  FROM w),
        |top AS (SELECT * FROM p ORDER BY priority DESC, doc_id ASC LIMIT 25)
        |SELECT doc_id, n_chars, priority FROM top ORDER BY doc_id""".stripMargin,

    // closed-form ledger from the 1-in-97 truncation rule: truncated lines
    // ingest as corrupt (null lang group), everything else parses intact
    "q_jsonl_ingest" ->
      """SELECT lang, count(*) AS n_rows,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(0 AS BIGINT) AS n_corrupt
        |FROM documents WHERE doc_id % 97 <> 0 GROUP BY lang
        |UNION ALL
        |SELECT CAST(NULL AS VARCHAR), count(*), CAST(NULL AS BIGINT), count(*)
        |FROM documents WHERE doc_id % 97 = 0
        |ORDER BY lang NULLS FIRST""".stripMargin,

    // oracle reads the ORIGINAL parquet — any ORC roundtrip fidelity loss
    // (types, nulls, text bytes) fails the hash
    "q_src_orc" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_corpus_card" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(sum(CASE WHEN text IS NOT NULL
        |                     THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
        |FROM documents""".stripMargin,

    // fold law: fold-of-parts == whole, so the oracle is the one-shot card
    // over the full table (minus the sketch-estimated distinct column)
    "q_corpus_card_ledger" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(sum(CASE WHEN text IS NOT NULL
        |                     THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents""".stripMargin,

    // card-diff oracle: the store's two versions are defined by predicate
    // (v1 = even ids, v2 = all), so each snapshot's card replays over the
    // raw table and the diff is pure column arithmetic per metric row
    "q_corpus_card_diff" ->
      """WITH ca AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(sum(CASE WHEN text IS NOT NULL
        |                       THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS total_tokens,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
        |  FROM documents WHERE doc_id % 2 = 0),
        |cb AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(sum(CASE WHEN text IS NOT NULL
        |                       THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS total_tokens,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
        |  FROM documents),
        |m AS (
        |  SELECT 'n_docs' AS metric, ca.n_docs AS v_a, cb.n_docs AS v_b FROM ca, cb
        |  UNION ALL SELECT 'n_null_text', ca.n_null_text, cb.n_null_text FROM ca, cb
        |  UNION ALL SELECT 'n_langs', ca.n_langs, cb.n_langs FROM ca, cb
        |  UNION ALL SELECT 'n_sources', ca.n_sources, cb.n_sources FROM ca, cb
        |  UNION ALL SELECT 'total_tokens', ca.total_tokens, cb.total_tokens FROM ca, cb
        |  UNION ALL SELECT 'total_chars', ca.total_chars, cb.total_chars FROM ca, cb
        |  UNION ALL SELECT 'n_distinct_texts', ca.n_distinct_texts, cb.n_distinct_texts FROM ca, cb)
        |SELECT metric, v_a, v_b, v_b - v_a AS delta FROM m ORDER BY metric""".stripMargin,

    "q_dedup_paragraph" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         'subscribe to our newsletter today' || chr(10) ||
        |         text || ' #' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         'copyright ' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id, i - 1 AS pos, line FROM (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM src)),
        |kept AS (SELECT doc_id, pos, line FROM (
        |  SELECT doc_id, pos, line,
        |         row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM lines) WHERE rn = 1),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |        FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(r.text, '') AS text
        |FROM src s LEFT JOIN reb r ON r.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q_dedup_paragraph_all" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         'subscribe to our newsletter today' || chr(10) ||
        |         text || ' #' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         'copyright ' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id, i - 1 AS pos, line FROM (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM src)),
        |kept AS (SELECT doc_id, pos, line FROM (
        |  SELECT doc_id, pos, line,
        |         count(*) OVER (PARTITION BY md5(line)) AS n
        |  FROM lines) WHERE n = 1),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |        FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(r.text, '') AS text
        |FROM src s LEFT JOIN reb r ON r.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    // within-doc dedup oracle: repeats collapse per (doc_id, line) under
    // the position order — other docs never considered
    "q_dedup_paragraph_within" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         'intro ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         text || chr(10) ||
        |         'intro ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         'shared footer' || chr(10) || 'shared footer' AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id, i, line FROM (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM src)),
        |kept AS (SELECT doc_id, i, line FROM (
        |  SELECT doc_id, i, line,
        |         row_number() OVER (PARTITION BY doc_id, line ORDER BY i) AS rn
        |  FROM lines) WHERE rn = 1)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // incremental paragraph dedup oracle: seen = distinct line hashes of
    // the even half; a batch (odd) line survives iff unseen AND first
    // within the batch under (doc_id, pos)
    "q_dedup_paragraph_inc" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         'subscribe to our newsletter today' || chr(10) ||
        |         text || ' #' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         'copyright ' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id, i - 1 AS pos, line FROM (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM src)),
        |seen AS (SELECT DISTINCT md5(line) AS h FROM lines WHERE doc_id % 2 = 0),
        |fresh AS (SELECT b.doc_id, b.pos, b.line
        |          FROM (SELECT * FROM lines WHERE doc_id % 2 <> 0) b
        |          ANTI JOIN seen s ON md5(b.line) = s.h),
        |kept AS (SELECT doc_id, pos, line FROM (
        |  SELECT doc_id, pos, line,
        |         row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM fresh) WHERE rn = 1),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |        FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(r.text, '') AS text
        |FROM src s LEFT JOIN reb r ON r.doc_id = s.doc_id
        |WHERE s.doc_id % 2 <> 0
        |ORDER BY s.doc_id""".stripMargin,

    // served from the persisted line-hash store — must equal the direct
    // seenLineHashes pass bit-for-bit, so the oracle is
    // q_dedup_paragraph_inc's verbatim
    "q_dedup_paragraph_inc_indexed" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         'subscribe to our newsletter today' || chr(10) ||
        |         text || ' #' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |         'copyright ' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id, i - 1 AS pos, line FROM (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS i
        |  FROM src)),
        |seen AS (SELECT DISTINCT md5(line) AS h FROM lines WHERE doc_id % 2 = 0),
        |fresh AS (SELECT b.doc_id, b.pos, b.line
        |          FROM (SELECT * FROM lines WHERE doc_id % 2 <> 0) b
        |          ANTI JOIN seen s ON md5(b.line) = s.h),
        |kept AS (SELECT doc_id, pos, line FROM (
        |  SELECT doc_id, pos, line,
        |         row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM fresh) WHERE rn = 1),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |        FROM kept GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(r.text, '') AS text
        |FROM src s LEFT JOIN reb r ON r.doc_id = s.doc_id
        |WHERE s.doc_id % 2 <> 0
        |ORDER BY s.doc_id""".stripMargin,

    "q_dedup_snapshot_diff" ->
      """WITH f AS (SELECT doc_id,
        |             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |           FROM documents),
        |v1 AS (SELECT fp, min(doc_id) AS id_v1 FROM f WHERE doc_id < 300 GROUP BY fp),
        |v2 AS (SELECT fp, min(doc_id) AS id_v2 FROM f WHERE doc_id >= 200 GROUP BY fp)
        |SELECT coalesce(v1.fp, v2.fp) AS fp, v1.id_v1, v2.id_v2,
        |       CASE WHEN v1.fp IS NULL THEN 'added'
        |            WHEN v2.fp IS NULL THEN 'removed'
        |            ELSE 'retained' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.fp = v2.fp
        |ORDER BY fp, status""".stripMargin,

    "q_dedup_incremental" ->
      """WITH fp AS (SELECT doc_id, source,
        |              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |            FROM documents),
        |seen AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
        |batch AS (SELECT doc_id, source, f FROM fp WHERE doc_id % 2 = 1
        |          UNION ALL
        |          SELECT doc_id + 7000000, source, f FROM fp
        |          WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
        |nw AS (SELECT b.* FROM batch b ANTI JOIN seen s ON b.f = s.f)
        |SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
        |  FROM nw)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash_lsh" ->
      s"""WITH $mutCte,
         |${shingleCte("alldocs")},
         |h AS (SELECT id, sh, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (SELECT id, i, min((h * (2*i + 1) + (98765*i + 12345)) % 2147483647) AS mh
         |       FROM h, range(16) t(i) GROUP BY id, i),
         |bands AS (SELECT id, i // 2 AS band,
         |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
         |          FROM mh GROUP BY id, i // 2),
         |occ AS (SELECT band, band_key FROM bands
         |        GROUP BY band, band_key HAVING count(*) <= 64),
         |bcap AS (SELECT b.id, b.band, b.band_key FROM bands b
         |         JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM bcap a JOIN bcap b
         |           ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |$jaccardSql
         |SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    // The incremental index must collide EXACTLY like one-shot banding
    // over the accumulated corpus (serving re-applies the occupancy cap to
    // current totals), so the oracle chain is q_dedup_minhash_lsh's
    // verbatim — the incremental construction is what's under test.
    "q_dedup_minhash_inc" ->
      s"""WITH $mutCte,
         |${shingleCte("alldocs")},
         |h AS (SELECT id, sh, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (SELECT id, i, min((h * (2*i + 1) + (98765*i + 12345)) % 2147483647) AS mh
         |       FROM h, range(16) t(i) GROUP BY id, i),
         |bands AS (SELECT id, i // 2 AS band,
         |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
         |          FROM mh GROUP BY id, i // 2),
         |occ AS (SELECT band, band_key FROM bands
         |        GROUP BY band, band_key HAVING count(*) <= 64),
         |bcap AS (SELECT b.id, b.band, b.band_key FROM bands b
         |         JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM bcap a JOIN bcap b
         |           ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |$jaccardSql
         |SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_jaccard_blocked" ->
      s"""WITH $mutCte,
         |${shingleCte("alldocs")},
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM alldocs a JOIN alldocs b
         |           ON a.lang = b.lang AND a.source = b.source
         |          AND floor(a.n_chars / 100) = floor(b.n_chars / 100)
         |          AND a.doc_id < b.doc_id),
         |$jaccardSql
         |SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_simhash_pairs" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |dd AS (SELECT doc_id, text FROM base
        |       UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base),
        |tok AS (SELECT id, tok, count(*) AS cnt
        |        FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM dd)
        |        GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
        |votes AS (SELECT id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(32) t(j) GROUP BY id, j),
        |sk AS (SELECT id,
        |         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        |       FROM votes GROUP BY id),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(8 * j AS INT)) & 255 AS band_key
        |           FROM sk, range(4) r(j)),
        |occ AS (SELECT band, band_key FROM banded
        |        GROUP BY band, band_key HAVING count(*) <= 1024),
        |bnd AS (SELECT b.id, b.simhash, b.band, b.band_key FROM banded b
        |        JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |      FROM bnd a JOIN bnd b
        |        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_clusters" -> clustersOracleSql,

    // Contraction variant computes the identical label set, so it shares
    // the recursive-closure oracle verbatim.
    "q_dedup_clusters_star" -> clustersOracleSql,

    "q_dedup_keep_best" -> keepBestOracleSql,

    // The persisted-index curation capstone: minhash banding (the
    // q_dedup_minhash_lsh chain — the store must collide identically),
    // Jaccard verification, recursive-closure clustering, and the
    // keep-best survivor window, all in one replay.
    "q_pipeline_neardup_curate" ->
      s"""WITH RECURSIVE $mutCte,
         |${shingleCte("alldocs")},
         |h AS (SELECT id, sh, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
         |mh AS (SELECT id, i, min((h * (2*i + 1) + (98765*i + 12345)) % 2147483647) AS mh
         |       FROM h, range(16) t(i) GROUP BY id, i),
         |bands AS (SELECT id, i // 2 AS band,
         |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
         |          FROM mh GROUP BY id, i // 2),
         |occ AS (SELECT band, band_key FROM bands
         |        GROUP BY band, band_key HAVING count(*) <= 64),
         |bcap AS (SELECT b.id, b.band, b.band_key FROM bands b
         |         JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM bcap a JOIN bcap b
         |           ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |$jaccardSql,
         |p AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.35),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b AS src, id_a AS dst FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
         |surv AS (SELECT doc_id FROM (
         |           SELECT l.doc_id,
         |                  row_number() OVER (PARTITION BY l.cluster
         |                    ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn
         |           FROM lab l JOIN alldocs d ON d.doc_id = l.doc_id) WHERE rn = 1)
         |SELECT d.doc_id, d.n_chars FROM alldocs d
         |LEFT JOIN lab l ON l.doc_id = d.doc_id
         |WHERE l.doc_id IS NULL OR d.doc_id IN (SELECT surv.doc_id FROM surv)
         |ORDER BY d.doc_id""".stripMargin,

    // Auto-selection runs on consecutive-id chain pairs (deep topology);
    // the closure oracle is the same recursive-CTE shape over those pairs.
    "q_dedup_clusters_auto" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE floor(a.doc_id / 100) = floor(b.doc_id / 100)),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b AS src, id_a AS dst FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst)
        |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH fp AS (SELECT doc_id,
        |              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |            FROM documents),
        |ev AS (SELECT doc_id + 5000000 AS eval_id, f FROM fp WHERE doc_id % 10 = 0)
        |SELECT fp.doc_id AS corpus_id, ev.eval_id
        |FROM fp JOIN ev ON fp.f = ev.f
        |ORDER BY corpus_id, eval_id""".stripMargin,

    // The Bloom pre-filter is a plan-level optimization; the result is
    // exactly the exact-contamination join (false positives are removed by
    // the verifying equi-join), so the oracle is the same SQL.
    "q_contamination_bloom" ->
      """WITH fp AS (SELECT doc_id,
        |              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |            FROM documents),
        |ev AS (SELECT doc_id + 5000000 AS eval_id, f FROM fp WHERE doc_id % 10 = 0)
        |SELECT fp.doc_id AS corpus_id, ev.eval_id
        |FROM fp JOIN ev ON fp.f = ev.f
        |ORDER BY corpus_id, eval_id""".stripMargin,

    "q_dedup_simhash" ->
      """WITH tok AS (SELECT id, tok, count(*) AS cnt
        |             FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |             GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
        |votes AS (SELECT id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(32) t(j) GROUP BY id, j)
        |SELECT id AS doc_id,
        |       CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        |FROM votes GROUP BY id ORDER BY doc_id""".stripMargin,

    // 64-bit sketch: the hash is two unsigned 32-bit halves (md5 hex chars
    // 1-8 / 9-16); the sketch halves recombine in HUGEINT with a signed
    // correction because 1::BIGINT << 63 overflows DuckDB's checked shift.
    "q_dedup_simhash64" ->
      """WITH tok AS (SELECT id, tok, count(*) AS cnt
        |             FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |             GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
        |              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi FROM tok),
        |votes AS (SELECT id, j,
        |            SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j ELSE hi >> (j - 32) END) & 1) = 1
        |                THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(64) t(j) GROUP BY id, j),
        |halves AS (SELECT id,
        |             SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo_sk,
        |             SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi_sk
        |           FROM votes GROUP BY id)
        |SELECT id AS doc_id,
        |       CAST(lo_sk + hi_sk * 4294967296
        |            - CASE WHEN hi_sk >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END
        |            AS BIGINT) AS simhash
        |FROM halves ORDER BY doc_id""".stripMargin,

    // leakage-safe split oracle: the same simhash chain, then the
    // transitive closure, representative-hashed split, and an
    // independently-recomputed leak count (must be zero)
    "q_corpus_split_safe" ->
      """WITH RECURSIVE dd AS (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |tok AS (SELECT id, tok, count(*) AS cnt
        |        FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM dd)
        |        GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
        |              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi FROM tok),
        |votes AS (SELECT id, j,
        |            SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j ELSE hi >> (j - 32) END) & 1) = 1
        |                THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(64) t(j) GROUP BY id, j),
        |halves AS (SELECT id,
        |             SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo_sk,
        |             SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi_sk
        |           FROM votes GROUP BY id),
        |sk AS (SELECT id,
        |         CAST(lo_sk + hi_sk * 4294967296
        |              - CASE WHEN hi_sk >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END
        |              AS BIGINT) AS simhash
        |       FROM halves),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(16 * j AS INT)) & 65535 AS band_key
        |           FROM sk, range(4) r(j)),
        |occ AS (SELECT band, band_key FROM banded
        |        GROUP BY band, band_key HAVING count(*) <= 1024),
        |bnd AS (SELECT b.id, b.simhash, b.band, b.band_key FROM banded b
        |        JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |      FROM bnd a JOIN bnd b
        |        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        |      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b AS src, id_a AS dst FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
        |lab AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
        |rep AS (SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS rep
        |        FROM dd d LEFT JOIN lab l ON l.id = d.doc_id),
        |sp AS (SELECT doc_id,
        |         CASE WHEN b < 8000 THEN 'train'
        |              WHEN b < 9000 THEN 'validation'
        |              ELSE 'test' END AS split
        |       FROM (SELECT doc_id,
        |               ('0x' || substr(md5('split::' || CAST(rep AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
        |             FROM rep)),
        |leak AS (SELECT count(*) AS leaked FROM p
        |         JOIN sp sa ON sa.doc_id = p.id_a
        |         JOIN sp sb ON sb.doc_id = p.id_b
        |         WHERE sa.split <> sb.split)
        |SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(max(l.leaked) AS BIGINT) AS leaked_pairs
        |FROM sp s CROSS JOIN leak l GROUP BY s.split ORDER BY s.split""".stripMargin,

    // blocklist filter oracle: same host/path anchored extraction, NOT IN
    // blocklist, NOT path-pattern
    "q_corpus_url_filter" ->
      """WITH u AS (SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.COM:443/page/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '/?utm_source=tw&b=2&a=1#sec'
        |      WHEN 1 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com/page/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2'
        |      WHEN 2 THEN 'HTTP://Site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com:80/page/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '/index.html?gclid=xyz'
        |      ELSE 'http://site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com:8080/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
        |    END AS url FROM documents),
        |f AS (SELECT doc_id, url,
        |        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
        |        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
        |      FROM u)
        |SELECT doc_id, url FROM f
        |WHERE host NOT IN ('site2.com', 'site5.com')
        |  AND NOT regexp_matches(path, '/page/13')
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_split_leakage_neardup" ->
      """WITH dd AS (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |tok AS (SELECT id, tok, count(*) AS cnt
        |        FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM dd)
        |        GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
        |              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi FROM tok),
        |votes AS (SELECT id, j,
        |            SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j ELSE hi >> (j - 32) END) & 1) = 1
        |                THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(64) t(j) GROUP BY id, j),
        |halves AS (SELECT id,
        |             SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo_sk,
        |             SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi_sk
        |           FROM votes GROUP BY id),
        |sk AS (SELECT id,
        |         CAST(lo_sk + hi_sk * 4294967296
        |              - CASE WHEN hi_sk >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END
        |              AS BIGINT) AS simhash
        |       FROM halves),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(16 * j AS INT)) & 65535 AS band_key
        |           FROM sk, range(4) r(j)),
        |occ AS (SELECT band, band_key FROM banded
        |        GROUP BY band, band_key HAVING count(*) <= 1024),
        |bnd AS (SELECT b.id, b.simhash, b.band, b.band_key FROM banded b
        |        JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |      FROM bnd a JOIN bnd b
        |        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        |      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        |sp AS (SELECT doc_id,
        |         CASE WHEN b < 8000 THEN 'train'
        |              WHEN b < 9000 THEN 'validation'
        |              ELSE 'test' END AS split
        |       FROM (SELECT doc_id,
        |               ('0x' || substr(md5('split::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
        |             FROM dd)),
        |lk AS (SELECT least(a.split, b.split) AS split_a, greatest(a.split, b.split) AS split_b
        |       FROM p JOIN sp a ON a.doc_id = p.id_a JOIN sp b ON b.doc_id = p.id_b
        |       WHERE a.split <> b.split)
        |SELECT split_a, split_b, count(*) AS leaked_pairs
        |FROM lk GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,

    "q_dedup_simhash64_pairs" ->
      """WITH dd AS (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |tok AS (SELECT id, tok, count(*) AS cnt
        |        FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM dd)
        |        GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
        |              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi FROM tok),
        |votes AS (SELECT id, j,
        |            SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j ELSE hi >> (j - 32) END) & 1) = 1
        |                THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(64) t(j) GROUP BY id, j),
        |halves AS (SELECT id,
        |             SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo_sk,
        |             SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi_sk
        |           FROM votes GROUP BY id),
        |sk AS (SELECT id,
        |         CAST(lo_sk + hi_sk * 4294967296
        |              - CASE WHEN hi_sk >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END
        |              AS BIGINT) AS simhash
        |       FROM halves),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(16 * j AS INT)) & 65535 AS band_key
        |           FROM sk, range(4) r(j)),
        |occ AS (SELECT band, band_key FROM banded
        |        GROUP BY band, band_key HAVING count(*) <= 1024),
        |bnd AS (SELECT b.id, b.simhash, b.band, b.band_key FROM banded b
        |        JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |      FROM bnd a JOIN bnd b
        |        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // same sketch + banding chain, aggregated to the one-row drop audit
    // at cap 8 (tight enough that the dup'd corpus trips it)
    "q_dedup_simhash64_occupancy" ->
      """WITH dd AS (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |tok AS (SELECT id, tok, count(*) AS cnt
        |        FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM dd)
        |        GROUP BY id, tok),
        |th AS (SELECT id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
        |              ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi FROM tok),
        |votes AS (SELECT id, j,
        |            SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> j ELSE hi >> (j - 32) END) & 1) = 1
        |                THEN cnt ELSE -cnt END) AS v
        |          FROM th, range(64) t(j) GROUP BY id, j),
        |halves AS (SELECT id,
        |             SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo_sk,
        |             SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi_sk
        |           FROM votes GROUP BY id),
        |sk AS (SELECT id,
        |         CAST(lo_sk + hi_sk * 4294967296
        |              - CASE WHEN hi_sk >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END
        |              AS BIGINT) AS simhash
        |       FROM halves),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(16 * j AS INT)) & 65535 AS band_key
        |           FROM sk, range(4) r(j)),
        |o AS (SELECT band, band_key, count(*) AS n FROM banded GROUP BY band, band_key)
        |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(CASE WHEN n > 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_buckets,
        |       CAST(sum(CASE WHEN n > 8 THEN n ELSE 0 END) AS BIGINT) AS dropped_rows,
        |       CAST(sum(CASE WHEN n > 8 THEN (n * (n - 1)) // 2 ELSE 0 END) AS BIGINT) AS dropped_pair_mass,
        |       CAST(max(n) AS BIGINT) AS max_occupancy
        |FROM o""".stripMargin,

    "q_text_winnow" ->
      s"""WITH ${winnowCte("documents")}
         |SELECT id AS doc_id, fp FROM fps ORDER BY doc_id, fp""".stripMargin,

    "q_contamination_overlap" ->
      s"""WITH ev AS (SELECT doc_id + 5000000 AS doc_id,
         |         array_to_string(list_slice(string_split(text, ' '),
         |           (len(string_split(text, ' ')) // 4) + 1,
         |           (len(string_split(text, ' ')) // 4) + ((len(string_split(text, ' ')) + 1) // 2)), ' ') AS text
         |       FROM documents WHERE doc_id % 5 = 0),
         |${winnowCte("documents", "c")},
         |${winnowCte("ev", "e")},
         |en AS (SELECT id, count(*) AS n_eval FROM efps GROUP BY id),
         |shared AS (SELECT c.id AS corpus_id, e.id AS eval_id, count(*) AS shared
         |           FROM cfps c JOIN efps e ON e.fp = c.fp GROUP BY c.id, e.id),
         |sc AS (SELECT s.corpus_id, s.eval_id, CAST(s.shared AS DOUBLE) / en.n_eval AS containment
         |       FROM shared s JOIN en ON en.id = s.eval_id)
         |SELECT corpus_id, eval_id, containment FROM sc WHERE containment >= 0.8
         |ORDER BY corpus_id, eval_id""".stripMargin,

    // report oracle: the same winnow/containment chain UNFILTERED, then a
    // per-eval-doc rollup over a LEFT JOIN from the full eval set so clean
    // (and fingerprint-less) docs emit zero rows too
    "q_contamination_report" -> contaminationReportOracleSql,

    // the store-served rollup must equal the direct form row for row
    "q_contamination_report_indexed" -> contaminationReportOracleSql,

    // gate oracle: both suites' fingerprints recomputed from the plants,
    // exact tier (normalized-md5 equality) UNION overlap tier (winnowed
    // containment >= 0.8), anti-joined against the corpus
    "q_contamination_decon" ->
      s"""WITH ev AS (SELECT doc_id + 5000000 AS doc_id,
         |         array_to_string(list_slice(string_split(text, ' '),
         |           (len(string_split(text, ' ')) // 4) + 1,
         |           (len(string_split(text, ' ')) // 4) + ((len(string_split(text, ' ')) + 1) // 2)), ' ') AS text
         |       FROM documents WHERE doc_id % 5 = 0),
         |cx AS (SELECT doc_id + 6000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0),
         |evall AS (SELECT * FROM ev UNION ALL SELECT * FROM cx),
         |cfp AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |        FROM documents),
         |efp AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |        FROM evall),
         |exact_flag AS (SELECT DISTINCT c.doc_id FROM cfp c JOIN efp e ON e.f = c.f),
         |${winnowCte("documents", "c")},
         |${winnowCte("evall", "e")},
         |en AS (SELECT id, count(*) AS n_eval FROM efps GROUP BY id),
         |shared AS (SELECT c.id AS corpus_id, e.id AS eval_id, count(*) AS shared
         |           FROM cfps c JOIN efps e ON e.fp = c.fp GROUP BY c.id, e.id),
         |ov_flag AS (SELECT DISTINCT s.corpus_id AS doc_id
         |            FROM shared s JOIN en ON en.id = s.eval_id
         |            WHERE CAST(s.shared AS DOUBLE) / en.n_eval >= 0.8),
         |flag AS (SELECT doc_id FROM exact_flag UNION SELECT doc_id FROM ov_flag)
         |SELECT d.doc_id, d.n_chars FROM documents d
         |ANTI JOIN flag f ON f.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_containment" ->
      s"""WITH dd AS (SELECT doc_id, text FROM documents
         |       UNION ALL SELECT doc_id + 1000000 AS doc_id,
         |         array_to_string(list_slice(string_split(text, ' '), 1,
         |           CAST(ceil(len(string_split(text, ' ')) / 2.0) AS INT)), ' ') AS text
         |       FROM documents),
         |${winnowCte("dd")},
         |cnt AS (SELECT id, count(*) AS n FROM fps GROUP BY id),
         |shared AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
         |           FROM fps a JOIN fps b ON a.fp = b.fp AND a.id < b.id
         |           GROUP BY a.id, b.id),
         |sc AS (SELECT s.id_a, s.id_b, CAST(s.shared AS DOUBLE) / LEAST(ca.n, cb.n) AS containment
         |       FROM shared s JOIN cnt ca ON ca.id = s.id_a JOIN cnt cb ON cb.id = s.id_b)
         |SELECT id_a, id_b, containment FROM sc WHERE containment >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // span dedup oracle: full replay — window md5 hashes, global
    // duplication counts, covered positions, survivor rebuild
    "q_dedup_exact_substring" ->
      s"""WITH $mutCte,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM alldocs),
         |${spanWinCte(10)},
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
         |cut AS (SELECT DISTINCT doc_id, pos FROM (
         |          SELECT w.doc_id, unnest(generate_series(w.p, w.p + 9)) AS pos
         |          FROM win w JOIN dup USING (h))),
         |tok AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM toks),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |         LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |         WHERE c.pos IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |               count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT a.doc_id, a.text_clean, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       CAST(a.n_kept AS BIGINT) AS n_kept
         |FROM agg a JOIN toks t ON t.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // memorization profile oracle: covered positions recomputed the
    // independent way (explode every duplicated window's positions,
    // DISTINCT), then run lengths via the classic pos − row_number
    // gaps-and-islands — cross-checking the engine's start-island algebra
    "q_dedup_memorization" ->
      s"""WITH $mutCte,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t
         |         FROM alldocs WHERE text IS NOT NULL),
         |${spanWinCte(10)},
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
         |cut AS (SELECT DISTINCT doc_id, pos FROM (
         |          SELECT w.doc_id, unnest(generate_series(w.p, w.p + 9)) AS pos
         |          FROM win w JOIN dup USING (h))),
         |isl AS (SELECT doc_id, pos,
         |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |        FROM cut),
         |runs AS (SELECT doc_id, count(*) AS l FROM isl GROUP BY doc_id, g),
         |agg AS (SELECT doc_id, CAST(max(l) AS BIGINT) AS max_dup_span,
         |               CAST(sum(l) AS BIGINT) AS dup_tokens
         |        FROM runs GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       coalesce(a.max_dup_span, 0) AS max_dup_span,
         |       coalesce(a.dup_tokens, 0) AS dup_tokens
         |FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // keep-one span dedup oracle: same window/dup machinery; the cut set
    // is every duplicated occurrence EXCEPT the row_number-1 survivor
    // under the deterministic (doc_id, p) order within each hash
    "q_dedup_exact_substring_keepfirst" ->
      s"""WITH $mutCte,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM alldocs),
         |${spanWinCte(10)},
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
         |losers AS (SELECT doc_id, p FROM (
         |             SELECT w.doc_id, w.p,
         |                    row_number() OVER (PARTITION BY w.h
         |                                       ORDER BY w.doc_id, w.p) AS rn
         |             FROM win w JOIN dup USING (h))
         |           WHERE rn > 1),
         |cut AS (SELECT DISTINCT doc_id, pos FROM (
         |          SELECT doc_id, unnest(generate_series(p, p + 9)) AS pos
         |          FROM losers)),
         |tok AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok FROM toks),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |         LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |         WHERE c.pos IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |               count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT a.doc_id, a.text_clean, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       CAST(a.n_kept AS BIGINT) AS n_kept
         |FROM agg a JOIN toks t ON t.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // incremental span dedup oracle: duplication counted over the FULL
    // union (store windows + batch windows — exactly c_seen + c_batch),
    // cut and rebuild restricted to the batch (odd doc_ids)
    "q_dedup_exact_substring_inc" ->
      s"""WITH $mutCte,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM alldocs),
         |${spanWinCte(10)},
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
         |cut AS (SELECT DISTINCT doc_id, pos FROM (
         |          SELECT w.doc_id, unnest(generate_series(w.p, w.p + 9)) AS pos
         |          FROM win w JOIN dup USING (h) WHERE w.doc_id % 2 <> 0)),
         |tok AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
         |        FROM toks WHERE doc_id % 2 <> 0),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |         LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |         WHERE c.pos IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |               count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT a.doc_id, a.text_clean, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       CAST(a.n_kept AS BIGINT) AS n_kept
         |FROM agg a JOIN toks t ON t.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // Served from the persisted window-count store — must equal the
    // direct counts pass bit-for-bit, so the oracle chain is
    // q_dedup_exact_substring_inc's verbatim.
    "q_dedup_substring_inc_indexed" ->
      s"""WITH $mutCte,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM alldocs),
         |${spanWinCte(10)},
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
         |cut AS (SELECT DISTINCT doc_id, pos FROM (
         |          SELECT w.doc_id, unnest(generate_series(w.p, w.p + 9)) AS pos
         |          FROM win w JOIN dup USING (h) WHERE w.doc_id % 2 <> 0)),
         |tok AS (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
         |        FROM toks WHERE doc_id % 2 <> 0),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
         |         LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |         WHERE c.pos IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |               count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT a.doc_id, a.text_clean, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       CAST(a.n_kept AS BIGINT) AS n_kept
         |FROM agg a JOIN toks t ON t.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // independent closed form: both spellings of a twin pair map to the
    // literal punycode canonical url (host families keyed on doc_id//2)
    "q_text_url_idn" ->
      """SELECT doc_id,
        |  'https://' ||
        |  CASE CAST((doc_id // 2) % 3 AS INT)
        |    WHEN 0 THEN 'xn--bcher-kva.de'
        |    WHEN 1 THEN 'xn--mnchen-3ya.de'
        |    ELSE 'xn--1lqs71d.jp' END
        |  || '/p/' || CAST((doc_id // 2) % 50 AS VARCHAR) || '?a=1&b=2' AS canon_url
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_url_canon" ->
      (s"""WITH u0 AS (SELECT doc_id,
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN 'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR)
         |        || '.COM:443/page/' || CAST(doc_id % 50 AS VARCHAR)
         |        || '/?utm_source=tw&b=2&a=1#sec'
         |      WHEN 1 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
         |        || '.com/p%61ge/' || CAST(doc_id % 50 AS VARCHAR) || '?%61=1&b=2'
         |      WHEN 2 THEN 'HTTP://Site' || CAST(doc_id % 7 AS VARCHAR)
         |        || '.com:80/page/' || CAST(doc_id % 50 AS VARCHAR)
         |        || '/index.html?gclid=xyz&x=%2fv%3a7'
         |      ELSE 'http://site' || CAST(doc_id % 7 AS VARCHAR)
         |        || '.com:8080/p%61ge/%7E' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
         |    END AS url FROM documents),
         |u AS (SELECT doc_id, ${TextOps.pctNormalizeSql("url")} AS url FROM u0),
         |parts AS (SELECT doc_id,""".stripMargin + """
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*(:[0-9]+)', 1) AS port,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |rules AS (SELECT doc_id, scheme, host,
        |    CASE WHEN (scheme = 'http' AND port = ':80')
        |           OR (scheme = 'https' AND port = ':443') OR port = ''
        |         THEN '' ELSE port END AS kport,
        |    CASE WHEN regexp_matches(path, '^.+/$') AND path <> '/'
        |         THEN regexp_replace(path, '/$', '') ELSE path END AS cpath,
        |    CASE WHEN query = '' THEN []
        |         ELSE list_sort(list_filter(string_split(query, '&'),
        |                p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')))
        |    END AS params
        |  FROM parts)
        |SELECT doc_id,
        |  scheme || '://' || host || kport || cpath ||
        |  CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END
        |    AS canon_url
        |FROM rules ORDER BY doc_id""".stripMargin),

    // domain cap oracle: same URL plant, host extracted + lowercased the
    // independent way (canonicalizeUrl lowercases the host it extracts, so
    // host-of-canonical == lower(host-of-raw)), then the row_number quota
    "q_corpus_domain_cap" ->
      """WITH u AS (SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.COM:443/page/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '/?utm_source=tw&b=2&a=1#sec'
        |      WHEN 1 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com/page/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2'
        |      WHEN 2 THEN 'HTTP://Site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com:80/page/' || CAST(doc_id % 50 AS VARCHAR)
        |        || '/index.html?gclid=xyz'
        |      ELSE 'http://site' || CAST(doc_id % 7 AS VARCHAR)
        |        || '.com:8080/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
        |    END AS url FROM documents),
        |hosts AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host
        |  FROM u)
        |SELECT doc_id, host FROM (
        |  SELECT doc_id, host,
        |         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
        |  FROM hosts) WHERE rn <= 30 ORDER BY doc_id""".stripMargin,

    // eTLD+1 cap oracle: same URL plant, then the FULL PSL walk replayed in
    // SQL against the identical bundled snapshot — candidate suffixes per
    // start index, exception > normal > wildcard priority at the smallest
    // (longest-suffix) matching index, implicit-'*' fallback to the last
    // label, registrable = public suffix + one label — then the quota.
    "q_corpus_etld_cap" ->
      s"""WITH psl AS (SELECT * FROM ${graft.model.PublicSuffix.oracleValuesSql}),
         |u AS (SELECT doc_id,
         |    CASE WHEN doc_id % 6 <= 1 THEN 'https://a' || CAST(doc_id % 97 AS VARCHAR)
         |           || '.spam.co.uk/p/' || CAST(doc_id AS VARCHAR)
         |         WHEN doc_id % 6 = 2 THEN 'https://u' || CAST(doc_id % 40 AS VARCHAR)
         |           || '.github.io/x'
         |         WHEN doc_id % 6 = 3 THEN 'https://sub.shop' || CAST(doc_id % 5 AS VARCHAR)
         |           || '.ck/x'
         |         WHEN doc_id % 6 = 4 THEN 'http://www.ck/x'
         |         ELSE 'https://w' || CAST(doc_id % 8 AS VARCHAR)
         |           || '.site' || CAST(doc_id % 7 AS VARCHAR) || '.com/x'
         |    END AS url FROM documents),
         |l AS (SELECT doc_id,
         |        string_split(lower(regexp_extract(url,
         |          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)), '.') AS ls
         |      FROM u),
         |c AS (SELECT doc_id, ls, len(ls) AS n,
         |        unnest(generate_series(1, len(ls))) AS i FROM l),
         |cs AS (SELECT doc_id, ls, n, i,
         |        array_to_string(ls[i:], '.') AS suffix,
         |        CASE WHEN i < n THEN array_to_string(ls[i+1:], '.') END AS parent
         |      FROM c),
         |m AS (SELECT cs.doc_id, cs.i,
         |        CASE WHEN x.rule IS NOT NULL THEN cs.i + 1
         |             WHEN r.rule IS NOT NULL THEN cs.i
         |             WHEN w.rule IS NOT NULL THEN cs.i END AS ps
         |      FROM cs
         |      LEFT JOIN psl x ON x.kind = 'x' AND x.rule = cs.suffix
         |      LEFT JOIN psl r ON r.kind = 'r' AND r.rule = cs.suffix
         |      LEFT JOIN psl w ON w.kind = 'w' AND w.rule = cs.parent),
         |pick AS (SELECT doc_id, min(CASE WHEN ps IS NOT NULL THEN i END) AS mi
         |         FROM m GROUP BY doc_id),
         |reg AS (SELECT l.doc_id,
         |          CASE WHEN coalesce(m.ps, len(l.ls)) >= 2
         |               THEN array_to_string(l.ls[coalesce(m.ps, len(l.ls)) - 1:], '.')
         |          END AS domain
         |        FROM l JOIN pick p ON p.doc_id = l.doc_id
         |        LEFT JOIN m ON m.doc_id = l.doc_id AND m.i = p.mi)
         |SELECT doc_id, domain FROM (
         |  SELECT doc_id, domain,
         |         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
         |  FROM reg) WHERE rn <= 30 ORDER BY doc_id""".stripMargin,

    // numeric-reference replaces run FIRST (each planted numeric spelling
    // needs '&' directly before '#', so none can match inside the
    // '&amp;#8217;' double-encoding plant); the named chain keeps its
    // &amp;-last order, which then exposes the literal '&#8217;' exactly
    // as the single-pass kernel does
    "q_text_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><style>p{color:red}</style></head><body><h1 class="t">Doc '
        |    || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
        |    || '</p><script type="text/javascript">var x = 1 < 2;</script>'
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN '<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end</p>'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 3 = 1
        |            THEN '<p>n1&#x27;h&#X27; c&#8217;s d&#8212;e &#160;sp &#65;&#097;&#x4D; dots&#8230; raw&#999999; dbl&amp;#8217; q&apos;end</p>'
        |            ELSE '' END
        |    || '</body></html>' AS html FROM documents),
        |s1 AS (SELECT doc_id,
        |         regexp_replace(html,
        |           '(?is)<(script|style)\b[^>]*>.*?</(script|style)\s*>', ' ', 'g') AS t
        |       FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s1),
        |sn AS (SELECT doc_id,
        |         replace(replace(replace(replace(replace(replace(replace(replace(replace(t,
        |           '&#x27;', ''''), '&#X27;', ''''), '&#8217;', '’'),
        |           '&#8212;', '—'), '&#160;', ' '), '&#65;', 'A'),
        |           '&#097;', 'a'), '&#x4D;', 'M'), '&#8230;', '…') AS t
        |       FROM s2),
        |s3 AS (SELECT doc_id,
        |         replace(replace(replace(replace(replace(replace(replace(t,
        |           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |           '&quot;', '"'), '&apos;', ''''), '&#39;', ''''), '&amp;', '&') AS t
        |       FROM sn)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text_clean
        |FROM s3 ORDER BY doc_id""".stripMargin,

    "q_src_warc" ->
      """WITH ids AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS arm,
        |    'https://w' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/p/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
        |      || 'T00:00:00Z' AS ts,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 200 WHEN 1 THEN 404
        |      ELSE 503 END AS status
        |  FROM documents),
        |recs AS (
        |  SELECT doc_id, 0 AS rec_no, 'warcinfo' AS warc_type,
        |         CAST(NULL AS VARCHAR) AS url, ts,
        |         'application/warc-fields' AS mime,
        |         CAST(NULL AS INT) AS status,
        |         'software: graft-synth' AS body_text
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 1, 'response', url, ts,
        |         CASE WHEN arm = 1 THEN 'text/html; charset=windows-1252'
        |              WHEN arm = 2 THEN 'text/html; charset=ISO-8859-2'
        |              ELSE 'text/html; charset=UTF-8' END,
        |         status,
        |         CASE WHEN arm = 1 THEN 'café page ' || CAST(doc_id AS VARCHAR)
        |              WHEN arm = 2 THEN 'zażółć gęślą jaźń strona '
        |                || CAST(doc_id AS VARCHAR)
        |              ELSE '<html><body><p>synth page '
        |                || CAST(doc_id AS VARCHAR) || '</p></body></html>' END
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 2, 'request', url, ts,
        |         'application/http;msgtype=request', CAST(NULL AS INT),
        |         'GET /p/' || CAST(doc_id AS VARCHAR) || ' HTTP/1.1'
        |           || chr(13) || chr(10) || chr(13) || chr(10)
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 3, '_corrupt', CAST(NULL AS VARCHAR),
        |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |         CAST(NULL AS INT), CAST(NULL AS VARCHAR)
        |  FROM ids WHERE doc_id % 7 = 6)
        |SELECT * FROM recs ORDER BY doc_id, rec_no""".stripMargin,

    "q_src_media" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 9 AS INT)
        |    WHEN 0 THEN 'text/html; charset=UTF-8'
        |    WHEN 1 THEN 'text/html; charset=ISO-8859-2'
        |    WHEN 5 THEN 'text/plain; charset=UTF-8'
        |    WHEN 6 THEN 'application/json; charset=UTF-8'
        |    WHEN 7 THEN 'application/rss+xml'
        |    WHEN 8 THEN 'application/json'
        |    ELSE 'application/pdf' END AS mime,
        |  CASE CAST(doc_id % 9 AS INT)
        |    WHEN 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
        |      || 'crawl page ' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'zażółć gęślą jaźń strona ' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN 'Hello PDF ' || CAST(doc_id * 10 AS VARCHAR)
        |    WHEN 3 THEN 'alpha ' || CAST(doc_id * 10 + 1 AS VARCHAR)
        |      || chr(10) || 'beta'
        |    WHEN 4 THEN NULL
        |    WHEN 5 THEN 'plain text record ' || CAST(doc_id AS VARCHAR)
        |      || chr(10) || 'second line'
        |    WHEN 6 THEN 'json doc ' || CAST(doc_id AS VARCHAR) || chr(10)
        |      || 'alpha' || chr(10) || 'beta ' || CAST(doc_id AS VARCHAR)
        |      || chr(10) || 'nested value'
        |    WHEN 7 THEN 'feed ' || CAST(doc_id AS VARCHAR) || chr(10)
        |      || 'item one' || chr(10) || 'cdata body ' || CAST(doc_id AS VARCHAR)
        |      || chr(10) || 'second post' || chr(10)
        |      || 'escaped body ' || CAST(doc_id AS VARCHAR)
        |    ELSE NULL END AS text_out
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Byte masses per arm: html 38+len(id), corrupt pdf '%PD'+str(id*10
    // +7)+'garbage' = 10+len, broken json 6+len, VP8-lossy webp shell a
    // CONSTANT 30 (RIFF+size+WEBP+tag+len+10-byte payload), plain 11+
    // len. Refusals: pdf/json/webp arms entirely; html/plain never.
    "q_src_refusal_card" ->
      """WITH a AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS arm,
        |  length(CAST(doc_id AS VARCHAR)) AS dl,
        |  length(CAST(doc_id * 10 + 7 AS VARCHAR)) AS dl7 FROM documents),
        |r AS (SELECT
        |  CASE arm WHEN 0 THEN 'text/html' WHEN 1 THEN 'application/pdf'
        |       WHEN 2 THEN 'application/json' WHEN 3 THEN 'image/webp'
        |       ELSE 'text/plain' END AS media_type,
        |  CAST(CASE arm WHEN 0 THEN 38 + dl WHEN 1 THEN 10 + dl7
        |       WHEN 2 THEN 6 + dl WHEN 3 THEN 30 ELSE 11 + dl END
        |    AS BIGINT) AS bytes,
        |  CASE WHEN arm IN (1, 2, 3) THEN 1 ELSE 0 END AS refused
        |  FROM a)
        |SELECT media_type,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(refused) AS BIGINT) AS n_refused,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN refused = 1 THEN bytes ELSE 0 END) AS BIGINT)
        |    AS refused_bytes,
        |  round(sum(refused) * 100.0 / count(*), 4) AS refused_pct
        |FROM r GROUP BY media_type ORDER BY media_type""".stripMargin,

    // Arms 6/7 (encrypted, corrupt) and 9 (CID font with NO ToUnicode —
    // glyph indices are unknowable) refuse with NULL; arm 8 decodes
    // 2-byte CID codes through a Flate-compressed ToUnicode CMap
    // (bfrange offset 0xE0 + bfchar space/ligature entries).
    "q_src_pdf" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 10 AS INT)
        |    WHEN 0 THEN 'Hello PDF ' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'alpha ' || CAST(doc_id AS VARCHAR) || chr(10) || 'beta'
        |    WHEN 2 THEN 'This is TJ ' || CAST(doc_id AS VARCHAR) || chr(10) || 'Hello'
        |    WHEN 3 THEN 'paren ( ) octal A backslash \ tab here '
        |      || CAST(doc_id AS VARCHAR)
        |    WHEN 4 THEN 'café déjà vu'
        |    WHEN 5 THEN 'first line' || chr(10) || 'second ' || CAST(doc_id AS VARCHAR)
        |    WHEN 8 THEN 'cid ff ' || CAST(doc_id AS VARCHAR) || chr(10) || 'beta'
        |    ELSE NULL END AS pdf_body
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_from_bytes" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 24 AS INT)
        |    WHEN 0 THEN text
        |    WHEN 1 THEN 'café déjà vu 95% naïve'
        |    WHEN 2 THEN 'café déjà vu 95% naïve'
        |    WHEN 3 THEN 'café déjà vu 95% naïve'
        |    WHEN 4 THEN 'ÿþú'
        |    WHEN 5 THEN ''
        |    WHEN 6 THEN '子供たちは朝に学校へ歩いて行きます。先生と一緒に本を読みます。'
        |    WHEN 7 THEN '子供たちは朝に学校へ歩いて行きます。先生と一緒に本を読みます。'
        |    WHEN 8 THEN '아이들은 아침에 학교에 걸어가서 선생님과 함께 책을 읽습니다'
        |    WHEN 9 THEN '孩子们早上走路去学校他们和老师一起读书每天在城市里玩'
        |    WHEN 10 THEN '孩子們早上走路去學校他們和老師一起讀書每天在城市裡玩'
        |    WHEN 11 THEN 'діти йдуть вранці до школи і читають книжки з учителем у місті'
        |    WHEN 12 THEN 'café δοκιμή текст'
        |    WHEN 13 THEN 'café δοκιμή текст'
        |    WHEN 14 THEN 'дети идут в школу утром и читают книги с учителем в городе'
        |    WHEN 15 THEN 'децата вървят сутрин към училището и четат книги с учителя в града'
        |    WHEN 16 THEN 'τα παιδιά περπατούν στο σχολείο το πρωί και διαβάζουν βιβλία με τον δάσκαλο στην πόλη'
        |    WHEN 17 THEN 'הילדים הולכים לבית הספר בבוקר וקוראים ספרים עם המורה בעיר'
        |    WHEN 18 THEN 'يذهب الأطفال إلى المدرسة في الصباح ويقرؤون الكتب مع المعلم في المدينة كل يوم'
        |    WHEN 19 THEN 'เด็กเดินไปโรงเรียนในตอนเช้าและอ่านหนังสือกับครูในเมือง'
        |    WHEN 20 THEN 'çocuklar sabah okula yürüyorlar ve şehirde öğretmenle birlikte kitap okuyorlar'
        |    WHEN 21 THEN 'dzieci idą rano do szkoły i czytają książki z nauczycielem w mieście'
        |    WHEN 22 THEN 'děti chodí ráno do školy a čtou si knihy s učitelem ve městě'
        |    ELSE 'a gyerekek reggel iskolába sétálnak és a tanárral együtt könyveket olvasnak a városban' END AS text_out
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_rungs" ->
      """WITH r AS (SELECT
        |  CASE CAST(doc_id % 24 AS INT)
        |    WHEN 0 THEN 'utf8' WHEN 1 THEN 'cp1252' WHEN 2 THEN 'utf8_repair'
        |    WHEN 3 THEN 'utf8_repair' WHEN 4 THEN 'cp1252' WHEN 5 THEN 'empty'
        |    WHEN 6 THEN 'shift_jis' WHEN 7 THEN 'euc-jp' WHEN 8 THEN 'euc-kr'
        |    WHEN 9 THEN 'gb18030' WHEN 10 THEN 'big5' WHEN 11 THEN 'windows-1251'
        |    WHEN 12 THEN 'utf16' WHEN 13 THEN 'utf16' WHEN 14 THEN 'koi8-r'
        |    WHEN 15 THEN 'iso-8859-5' WHEN 16 THEN 'iso-8859-7'
        |    WHEN 17 THEN 'windows-1255' WHEN 18 THEN 'windows-1256'
        |    WHEN 19 THEN 'x-windows-874' WHEN 20 THEN 'iso-8859-9'
        |    WHEN 21 THEN 'windows-1250' ELSE 'iso-8859-2' END AS rung
        |FROM documents)
        |SELECT rung, count(*) AS n_docs FROM r GROUP BY rung
        |ORDER BY rung""".stripMargin,

    "q_text_html_blocks" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 8 AS INT)
        |    WHEN 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
        |      || 'alpha ' || CAST(doc_id AS VARCHAR) || chr(10) || 'beta'
        |    WHEN 1 THEN 'only prose ' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN 'A & B <tag> ’s end' || chr(10)
        |      || 'second ' || CAST(doc_id AS VARCHAR) || chr(10) || 'third'
        |    WHEN 3 THEN 'one' || chr(10) || 'two ' || CAST(doc_id AS VARCHAR)
        |      || chr(10) || 'a b'
        |    WHEN 4 THEN 'kept ' || CAST(doc_id AS VARCHAR)
        |    WHEN 5 THEN 'attr ' || CAST(doc_id AS VARCHAR)
        |    WHEN 6 THEN 'a b' || chr(10) || 'c ' || CAST(doc_id AS VARCHAR)
        |    ELSE '' END AS text_block
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_deflate" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN 'redundant'
        |    WHEN 1 THEN 'mixed'
        |    ELSE 'incompressible' END AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_curation_deflate" ->
      """SELECT doc_id,
        |  doc_id % 11 <> 0 AS keep,
        |  CASE WHEN doc_id % 11 = 0 THEN 'deflate_ratio' ELSE '' END AS reasons
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_boilerplate" ->
      """WITH dd AS (SELECT doc_id, source,
        |         text || chr(10) || 'subscribe to ' || source || ' newsletter'
        |              || chr(10) || 'doc-' || CAST(doc_id AS VARCHAR) || ' footer' AS text
        |       FROM documents),
        |lines AS (SELECT doc_id, source,
        |            unnest(string_split(text, chr(10))) AS ln,
        |            unnest(generate_series(1, len(string_split(text, chr(10))))) AS p
        |          FROM dd),
        |grp AS (SELECT source, count(DISTINCT doc_id) AS grp_docs FROM dd GROUP BY source),
        |lf AS (SELECT source, ln, count(DISTINCT doc_id) AS line_docs
        |       FROM lines GROUP BY source, ln),
        |bp AS (SELECT l.source, l.ln FROM lf l JOIN grp g ON g.source = l.source
        |       WHERE CAST(l.line_docs AS DOUBLE) >= g.grp_docs * 0.5),
        |kept AS (SELECT li.doc_id, li.p, li.ln FROM lines li
        |         LEFT JOIN bp ON bp.source = li.source AND bp.ln = li.ln
        |         WHERE bp.ln IS NULL),
        |reb AS (SELECT doc_id, string_agg(ln, chr(10) ORDER BY p) AS text
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.text, '') AS text
        |FROM dd d LEFT JOIN reb r ON r.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Full BPE replay in SQL — the learning loop unrolled (the same
    // unrolled-iteration idiom as the kmeans oracle). Every word is held as
    // DOUBLE-spaced symbols ("  a  b  "): one replace() of ' a  b ' with
    // ' ab ' is then exactly one left-to-right non-overlapping BPE merge
    // pass, because each match consumes only ONE of the two separator
    // spaces on each side — under single spacing, back-to-back occurrences
    // ("a a a a" with merge (a,a)) would lose their shared boundary space
    // and stop merging after the first pair. Learning stage i recounts
    // adjacent pairs, picks argmax with the (count desc, pair asc)
    // tie-break of Bpe.learn, and applies the merge (a LEFT JOIN keeps
    // stages past vocabulary exhaustion as no-ops, mirroring early stop).
    // Encoding then applies the 64 learned merges ONCE EACH in rank order,
    // which equals Bpe.encode's repeated lowest-rank-first loop: learned
    // merge lists are bottom-up (any pair involving a compound symbol
    // ranks strictly after the merge that created the compound), so a
    // later merge can never resurrect an earlier one. w/b CTEs are
    // MATERIALIZED — each is referenced twice, and inlining would nest the
    // lineage exponentially.
    "q_text_bpe" -> {
      val numMerges = 64
      val learn = (1 to numMerges).map { i =>
        val prev = s"w${i - 1}"
        s"""p$i AS (SELECT t[j] AS a, t[j + 1] AS b, SUM(cnt) AS c
           |        FROM (SELECT t, unnest(range(1, len(t))) AS j, cnt
           |              FROM (SELECT string_split(trim(s), '  ') AS t, cnt FROM $prev))
           |        GROUP BY a, b),
           |b$i AS MATERIALIZED (SELECT a, b FROM p$i ORDER BY c DESC, a ASC, b ASC LIMIT 1),
           |w$i AS MATERIALIZED (
           |  SELECT CASE WHEN m.a IS NULL THEN s
           |              ELSE replace(s, ' ' || m.a || '  ' || m.b || ' ',
           |                              ' ' || m.a || m.b || ' ') END AS s, cnt
           |  FROM $prev LEFT JOIN b$i m ON TRUE)""".stripMargin
      }.mkString(",\n")
      val enc = (1 to numMerges).map { i =>
        s"""e$i AS (
           |  SELECT doc_id, CASE WHEN m.a IS NULL THEN s
           |              ELSE replace(s, ' ' || m.a || '  ' || m.b || ' ',
           |                              ' ' || m.a || m.b || ' ') END AS s
           |  FROM e${i - 1} LEFT JOIN b$i m ON TRUE)""".stripMargin
      }.mkString(",\n")
      s"""WITH w0 AS MATERIALIZED (
         |  SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s, cnt
         |  FROM (SELECT w, count(*) AS cnt
         |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |        GROUP BY w)),
         |$learn,
         |e0 AS (
         |  SELECT doc_id, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
         |$enc,
         |np AS (SELECT doc_id, SUM(len(string_split(trim(s), '  '))) AS n_bpe
         |       FROM e$numMerges GROUP BY doc_id)
         |SELECT d.doc_id, CAST(p.n_bpe AS INT) AS n_bpe,
         |       CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
         |FROM documents d JOIN np p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_text_quality" -> {
      val stop = TextOps.qualityStopwords.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS avg_word_len,
         |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_text_langid" -> {
      // per-language hit counts, argmax with (hits desc, lang asc): langs are
      // tested in ascending order with >= against all others
      val langs = TextOps.langMarkers.sortBy(_._1)
      val hitCols = langs.map { case (lang, words) =>
        val set = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ($set))) AS BIGINT) AS h_$lang"
      }.mkString(",\n  ")
      val codes = langs.map(_._1)
      val caseArm = codes.map { c =>
        val others = codes.filterNot(_ == c).map(o => s"h_$c >= h_$o").mkString(" AND ")
        s"WHEN $others THEN '$c'"
      }.mkString("\n    ")
      val anyHit = codes.map(c => s"h_$c").mkString(", ")
      s"""WITH scored AS (SELECT doc_id, lang,
         |  $hitCols
         |FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest($anyHit) = 0 THEN 'und'
         |    $caseArm
         |  END AS predicted
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    // full-algorithm replay: plant, normalize (lower, \s+ -> ' ', trim,
    // pad), codepoint 1–3-grams, per-doc rank-64 profile (count desc,
    // g asc = binary order), out-of-place distance vs the interpolated
    // rank-512 profile snapshot (absent gram = penalty 512), argmin with
    // lang-asc tie-break, then the per-language cutoff rejection
    // (dist*1000 > m*512*cut => 'und')
    "q_text_langid_ngram" -> {
      s"""WITH $langidCtes
         |SELECT d.doc_id,
         |  CASE WHEN b.lang IS NULL THEN 'und'
         |       WHEN b.dist * 1000 > dm.m * ${graft.model.LangProfiles.profileSize} * c.cut THEN 'und'
         |       ELSE b.lang END AS predicted
         |FROM documents d
         |LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
         |LEFT JOIN dm ON dm.doc_id = d.doc_id
         |LEFT JOIN lc c ON c.lang = b.lang
         |ORDER BY d.doc_id""".stripMargin
    },

    // scored twin: the same CTEs pivoted to rn<=2 — post-rejection label,
    // raw argmin label, best/second/max integer distances
    "q_text_langid_margin" -> {
      s"""WITH $langidCtes,
         |b2 AS (SELECT doc_id, dist AS dist2 FROM best WHERE rn = 2)
         |SELECT d.doc_id,
         |  CASE WHEN b.lang IS NULL THEN 'und'
         |       WHEN b.dist * 1000 > dm.m * ${graft.model.LangProfiles.profileSize} * c.cut THEN 'und'
         |       ELSE b.lang END AS lang,
         |  COALESCE(b.lang, 'und') AS best_lang,
         |  CAST(COALESCE(b.dist, 0) AS BIGINT) AS best_dist,
         |  CAST(COALESCE(b2.dist2, 0) AS BIGINT) AS second_dist,
         |  CAST(COALESCE(dm.m * ${graft.model.LangProfiles.profileSize}, 0) AS BIGINT) AS max_dist
         |FROM documents d
         |LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
         |LEFT JOIN b2 ON b2.doc_id = d.doc_id
         |LEFT JOIN dm ON dm.doc_id = d.doc_id
         |LEFT JOIN lc c ON c.lang = b.lang
         |ORDER BY d.doc_id""".stripMargin
    },

    // calibration over the planted rows: the classifier CTEs restricted to
    // doc_id%5=0, confidence/label computed from the same distances, then
    // the decile report's exact integer math
    "q_text_langid_calibration" -> {
      val wantArms = langPlantExpected.zipWithIndex.map { case (l, i) =>
        s"      WHEN $i THEN '$l'"
      }.mkString("\n")
      s"""WITH $langidCtes,
         |pd AS (SELECT doc_id,
         |  CASE CAST((doc_id // 5) % ${langPlants.size} AS INT)
         |$wantArms
         |  END AS want FROM documents WHERE doc_id % 5 = 0),
         |sc AS (SELECT pd.doc_id, pd.want,
         |         1.0 - CAST(b.dist AS DOUBLE) / (dm.m * ${graft.model.LangProfiles.profileSize}) AS score,
         |         CASE WHEN b.lang IS NULL THEN 'und'
         |              WHEN b.dist * 1000 > dm.m * ${graft.model.LangProfiles.profileSize} * c.cut THEN 'und'
         |              ELSE b.lang END AS predicted
         |       FROM pd
         |       LEFT JOIN best b ON b.doc_id = pd.doc_id AND b.rn = 1
         |       LEFT JOIN dm ON dm.doc_id = pd.doc_id
         |       LEFT JOIN lc c ON c.lang = b.lang),
         |bkt AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
         |               CAST(round(score * 10000) AS BIGINT) AS s4,
         |               CASE WHEN predicted = want THEN 1 ELSE 0 END AS pos
         |        FROM sc WHERE score IS NOT NULL)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(pos) AS BIGINT) AS n_pos,
         |       round(sum(s4) / (count(*) * 10000.0), 6) AS mean_score
         |FROM bkt GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q_text_fingerprint" ->
      s"""WITH ${shingleCte("documents")},
         |msh AS (SELECT id, min(('0x' || substr(md5(sh), 1, 8))::BIGINT) AS m FROM sh GROUP BY id)
         |SELECT d.doc_id,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |  m.m AS min_shingle_hash
         |FROM documents d LEFT JOIN msh m ON m.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_sim_topk_brute" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |dots AS (SELECT q.vec_id AS qid, c.vec_id, CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |         FROM qcomp q JOIN comp c ON c.d = q.d
         |         GROUP BY q.vec_id, c.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM dots
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_pipeline_triplets" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |dots AS (SELECT q.vec_id AS qid, c.vec_id, CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |         FROM qcomp q JOIN comp c ON c.d = q.d
         |         GROUP BY q.vec_id, c.vec_id),
         |pos AS (SELECT qid, vec_id AS pos_id, dot AS pos_dot FROM (
         |          SELECT qid, vec_id, dot,
         |                 row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rn
         |          FROM dots) WHERE rn <= 2),
         |pmax AS (SELECT qid, MAX(pos_dot) AS pm FROM pos GROUP BY qid),
         |cand AS (SELECT d.qid, d.vec_id, d.dot FROM dots d
         |         LEFT JOIN pos p ON p.qid = d.qid AND p.pos_id = d.vec_id
         |         WHERE p.pos_id IS NULL),
         |filt AS (SELECT c.qid, c.vec_id, c.dot FROM cand c JOIN pmax m ON m.qid = c.qid
         |         WHERE CAST(c.dot AS DOUBLE) <= 0.95 * CAST(m.pm AS DOUBLE)),
         |neg AS (SELECT qid, vec_id AS neg_id, dot AS neg_dot FROM (
         |          SELECT qid, vec_id, dot,
         |                 row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rn
         |          FROM filt) WHERE rn <= 2)
         |SELECT p.qid, p.pos_id, n.neg_id, p.pos_dot, n.neg_dot,
         |       p.pos_dot - n.neg_dot AS margin
         |FROM pos p JOIN neg n ON n.qid = p.qid
         |ORDER BY p.qid, p.pos_id, n.neg_id""".stripMargin,

    "q_sim_hard_negatives" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |dots AS (SELECT q.vec_id AS qid, c.vec_id, CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |         FROM qcomp q JOIN comp c ON c.d = q.d
         |         GROUP BY q.vec_id, c.vec_id),
         |pos AS (SELECT qid, vec_id FROM (
         |          SELECT qid, vec_id,
         |                 row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rn
         |          FROM dots) WHERE rn <= 2),
         |pmax AS (SELECT d.qid, MAX(d.dot) AS pm
         |         FROM dots d JOIN pos p ON p.qid = d.qid AND p.vec_id = d.vec_id
         |         GROUP BY d.qid),
         |cand AS (SELECT d.qid, d.vec_id, d.dot FROM dots d
         |         LEFT JOIN pos p ON p.qid = d.qid AND p.vec_id = d.vec_id
         |         WHERE p.vec_id IS NULL),
         |filt AS (SELECT c.qid, c.vec_id, c.dot FROM cand c JOIN pmax m ON m.qid = c.qid
         |         WHERE CAST(c.dot AS DOUBLE) <= 0.95 * CAST(m.pm AS DOUBLE))
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM filt
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_corpus_diverse_sample" ->
      s"""WITH ${kmeansCtes(8)},
         |cent AS (SELECT cid, d, q FROM c2),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn = 1),
         |ranked AS (SELECT vec_id, cell,
         |             row_number() OVER (PARTITION BY cell ORDER BY
         |               ('0x' || substr(md5('exact::' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 10000,
         |               vec_id) AS rn
         |           FROM acell)
         |SELECT vec_id, CAST(cell AS INT) AS cell FROM ranked
         |WHERE rn <= 20 ORDER BY vec_id""".stripMargin,

    "q_sim_sq8" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |sqb AS (SELECT d, min(q) AS mn, max(q) AS mx FROM comp GROUP BY d),
         |sqc AS (SELECT c.vec_id, c.d,
         |          CASE WHEN b.mx = b.mn THEN 0
         |               ELSE CAST(floor(CAST(c.q - b.mn AS DOUBLE) * 255.0
         |                                / CAST(b.mx - b.mn AS DOUBLE)) AS BIGINT)
         |          END AS code, b.mn, b.mx
         |        FROM comp c JOIN sqb b USING (d)),
         |sqsc AS (SELECT q.vec_id AS qid, c.vec_id,
         |           CAST(SUM(q.q * (255 * c.mn + c.code * (c.mx - c.mn))) AS BIGINT) AS sdot
         |         FROM qcomp q JOIN sqc c ON c.d = q.d
         |         GROUP BY q.vec_id, c.vec_id)
         |SELECT qid, rank, vec_id, sdot FROM (
         |  SELECT qid, vec_id, sdot,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sdot DESC, vec_id ASC) AS INT) AS rank
         |  FROM sqsc) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_sim_binary" ->
      s"""WITH $binSigCte,
         |ham AS (SELECT q.vec_id AS qid, c.vec_id,
         |          CAST(SUM(bit_count(xor(q.w, c.w))) AS INT) AS ham
         |        FROM bsig q JOIN bsig c ON c.word = q.word
         |        WHERE q.vec_id < 3
         |        GROUP BY q.vec_id, c.vec_id)
         |SELECT qid, rank, vec_id, ham FROM (
         |  SELECT qid, vec_id, ham,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY ham ASC, vec_id ASC) AS INT) AS rank
         |  FROM ham) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // served from the persisted code store — must equal binaryEncodeFrame
    // bit-for-bit, so the oracle is q_sim_binary's verbatim
    "q_sim_binary_indexed" ->
      s"""WITH $binSigCte,
         |ham AS (SELECT q.vec_id AS qid, c.vec_id,
         |          CAST(SUM(bit_count(xor(q.w, c.w))) AS INT) AS ham
         |        FROM bsig q JOIN bsig c ON c.word = q.word
         |        WHERE q.vec_id < 3
         |        GROUP BY q.vec_id, c.vec_id)
         |SELECT qid, rank, vec_id, ham FROM (
         |  SELECT qid, vec_id, ham,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY ham ASC, vec_id ASC) AS INT) AS rank
         |  FROM ham) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_sim_binary_rerank" ->
      s"""WITH $binSigCte,
         |ham AS (SELECT q.vec_id AS qid, c.vec_id,
         |          CAST(SUM(bit_count(xor(q.w, c.w))) AS INT) AS ham
         |        FROM bsig q JOIN bsig c ON c.word = q.word
         |        WHERE q.vec_id < 3
         |        GROUP BY q.vec_id, c.vec_id),
         |sl AS (SELECT qid, vec_id FROM (
         |         SELECT qid, vec_id,
         |                row_number() OVER (PARTITION BY qid ORDER BY ham ASC, vec_id ASC) AS rn
         |         FROM ham) WHERE rn <= 50),
         |${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |dots AS (SELECT q.vec_id AS qid, c.vec_id, CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |         FROM qcomp q JOIN comp c ON c.d = q.d
         |         GROUP BY q.vec_id, c.vec_id),
         |scored AS (SELECT s.qid, s.vec_id, d.dot
         |           FROM sl s JOIN dots d ON d.qid = s.qid AND d.vec_id = s.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_sim_kmeans" ->
      s"""WITH ${kmeansCtes(8)}
         |SELECT CAST(cid AS INT) AS cid, CAST(d AS INT) AS d, c FROM f2 ORDER BY cid, d""".stripMargin,

    "q_sim_pq" ->
      s"""WITH ${pqCtes(16, 16)},
         |$pqEncodeLutCtes,
         |adc AS (SELECT l.qid, e.vec_id, CAST(SUM(l.pd) AS BIGINT) AS adc
         |        FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
         |        GROUP BY l.qid, e.vec_id)
         |SELECT qid, rank, vec_id, adc FROM (
         |  SELECT qid, vec_id, adc,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS INT) AS rank
         |  FROM adc) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_contamination_semantic" ->
      s"""WITH $kmeansCtesAutoK,
         |ev AS (SELECT vec_id + 5000000 AS vec_id, embedding
         |       FROM embeddings WHERE vec_id % 10 = 0),
         |${compCte("compe", "ev")},
         |cent AS (SELECT cid, d, q FROM c2),
         |adc_c AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |          FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |cell_c AS (SELECT vec_id AS corpus_id, cid AS cell FROM (
         |             SELECT vec_id, cid,
         |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |             FROM adc_c) WHERE rn = 1),
         |adc_e AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |          FROM compe c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |cell_e AS (SELECT vec_id AS eval_id, cid AS cell FROM (
         |             SELECT vec_id, cid,
         |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |             FROM adc_e) WHERE rn = 1),
         |cand AS (SELECT cc.corpus_id, ce.eval_id
         |         FROM cell_c cc JOIN cell_e ce ON ce.cell = cc.cell),
         |pd AS (SELECT cd.corpus_id, cd.eval_id, SUM(ca.q * cb.q) AS dot
         |       FROM cand cd
         |       JOIN comp ca ON ca.vec_id = cd.corpus_id
         |       JOIN compe cb ON cb.vec_id = cd.eval_id AND cb.d = ca.d
         |       GROUP BY cd.corpus_id, cd.eval_id),
         |nc AS (SELECT vec_id, SUM(q * q) AS n2 FROM comp GROUP BY vec_id),
         |ne AS (SELECT vec_id, SUM(q * q) AS n2 FROM compe GROUP BY vec_id),
         |cosv AS (SELECT p.corpus_id, p.eval_id,
         |           CAST(p.dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
         |         FROM pd p
         |         JOIN nc a ON a.vec_id = p.corpus_id
         |         JOIN ne b ON b.vec_id = p.eval_id)
         |SELECT corpus_id, eval_id, cos FROM cosv
         |WHERE cos >= 0.95 ORDER BY corpus_id, eval_id""".stripMargin,

    "q_sim_ivfpq" -> ivfPqOracleSql,

    // The persisted index round-trips the identical trained quantizers and
    // codes (parquet floats/ints are exact), so serving from it must
    // reproduce q_sim_ivfpq's ranking verbatim — shared oracle.
    "q_sim_ivfpq_persisted" -> ivfPqOracleSql,

    // full-corpus training, candidate set minus the takedown ids — the
    // operator's serve-time anti-join, replayed as one candidate filter
    "q_sim_ivfpq_deleted" ->
      s"""WITH $ivfPqAdcCtes
         |SELECT qid, rank, vec_id, adc FROM (
         |  SELECT qid, vec_id, adc,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY adc ASC, vec_id ASC) AS INT) AS rank
         |  FROM adc WHERE vec_id % 7 <> 2)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Filtered ANN: candidates restricted by attribute BEFORE the top-k
    // cut — ADC values are per-candidate, so filtering the adc relation
    // equals filtering the codes scan (what the operator pushes down)
    "q_sim_ivfpq_filtered" ->
      s"""WITH $ivfPqAdcCtes,
         |fadc AS (SELECT a.qid, a.vec_id, a.adc FROM adc a
         |         JOIN embeddings em ON em.vec_id = a.vec_id
         |         WHERE em.label = 2)
         |SELECT qid, rank, vec_id, adc FROM (
         |  SELECT qid, vec_id, adc,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY adc ASC, vec_id ASC) AS INT) AS rank
         |  FROM fadc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q_sim_ivfpq_rerank" -> ivfPqRerankOracleSql,

    "q_embed_mean_pool" ->
      """WITH c3 AS (SELECT label, CAST(d - 1 AS INT) AS d,
        |              CAST(floor(x * 1e3) AS BIGINT) AS q
        |            FROM (SELECT label, generate_subscripts(embedding, 1) AS d,
        |                         unnest(embedding) AS x
        |                  FROM embeddings)),
        |nl AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |       FROM embeddings GROUP BY label)
        |SELECT c.label, nl.n, c.d,
        |       CAST(SUM(c.q) AS DOUBLE) / CAST(nl.n * 1000 AS DOUBLE) AS mean
        |FROM c3 c JOIN nl ON nl.label = c.label
        |GROUP BY c.label, nl.n, c.d
        |ORDER BY c.label, c.d""".stripMargin,

    // Exact moment-matrix replay: q = floor(x * 1e3), flat index
    // idx(n)=0, idx(s_i)=1+i, idx(p_ij)=1+64+i*64-i(i-1)/2+(j-i), i<=j
    "q_embed_pca_moments" ->
      """WITH c3 AS (SELECT vec_id, d - 1 AS d,
        |              CAST(floor(x * 1e3) AS BIGINT) AS q
        |            FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
        |                         unnest(embedding) AS x
        |                  FROM embeddings)),
        |xp AS (SELECT CAST(1 + 64 + a.d * 64 - a.d * (a.d - 1) / 2 + (b.d - a.d) AS INT) AS idx,
        |              CAST(SUM(a.q * b.q) AS BIGINT) AS p
        |       FROM c3 a JOIN c3 b ON b.vec_id = a.vec_id AND b.d >= a.d
        |       GROUP BY a.d, b.d),
        |sm AS (SELECT CAST(1 + d AS INT) AS idx, CAST(SUM(q) AS BIGINT) AS p
        |       FROM c3 GROUP BY d),
        |ct AS (SELECT CAST(0 AS INT) AS idx, CAST(count(*) AS BIGINT) AS p
        |       FROM embeddings)
        |SELECT idx, p FROM (SELECT * FROM ct UNION ALL SELECT * FROM sm
        |                    UNION ALL SELECT * FROM xp)
        |ORDER BY idx""".stripMargin,

    "q_embed_semdedup" ->
      s"""WITH $kmeansCtesAutoK,
         |allv AS (SELECT vec_id, embedding FROM embeddings
         |         UNION ALL
         |         SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
         |${compCte("compall", "allv")},
         |cent AS (SELECT cid, d, q FROM c2),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM compall c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn = 1),
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM acell a JOIN acell b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |pd AS (SELECT c.id_a, c.id_b, SUM(ca.q * cb.q) AS dot
         |       FROM cand c
         |       JOIN compall ca ON ca.vec_id = c.id_a
         |       JOIN compall cb ON cb.vec_id = c.id_b AND cb.d = ca.d
         |       GROUP BY c.id_a, c.id_b),
         |norm AS (SELECT vec_id, SUM(q * q) AS n2 FROM compall GROUP BY vec_id),
         |cosv AS (SELECT p.id_a, p.id_b,
         |           CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
         |         FROM pd p
         |         JOIN norm na ON na.vec_id = p.id_a
         |         JOIN norm nb ON nb.vec_id = p.id_b)
         |SELECT id_a, id_b, cos FROM cosv WHERE cos >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    "q_sim_ivf_trained" ->
      s"""WITH ${kmeansCtes(8)},
         |cent AS (SELECT cid, d, q FROM c2),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn = 1),
         |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM (
         |             SELECT vec_id, cid,
         |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |             FROM adot WHERE vec_id < 3) WHERE rn <= 2),
         |cand AS (SELECT qp.qid, a.vec_id FROM qprobe qp JOIN acell a ON a.cell = qp.cell),
         |dots AS (SELECT c.qid, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN comp ca ON ca.vec_id = c.qid
         |         JOIN comp cb ON cb.vec_id = c.vec_id AND cb.d = ca.d
         |         GROUP BY c.qid, c.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM dots
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_sim_ivf" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |cent AS (SELECT vec_id AS cid, d, q FROM comp WHERE vec_id < 8),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn = 1),
         |qcell AS (SELECT vec_id AS qid, cell FROM acell WHERE vec_id < 3),
         |cand AS (SELECT qc.qid, a.vec_id FROM qcell qc JOIN acell a ON a.cell = qc.cell),
         |dots AS (SELECT c.qid, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN comp ca ON ca.vec_id = c.qid
         |         JOIN comp cb ON cb.vec_id = c.vec_id AND cb.d = ca.d
         |         GROUP BY c.qid, c.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM dots
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_sim_ivf_nprobe" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |cent AS (SELECT vec_id AS cid, d, q FROM comp WHERE vec_id < 8),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn = 1),
         |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM (
         |             SELECT vec_id, cid,
         |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |             FROM adot WHERE vec_id < 3) WHERE rn <= 2),
         |cand AS (SELECT qp.qid, a.vec_id FROM qprobe qp JOIN acell a ON a.cell = qp.cell),
         |dots AS (SELECT c.qid, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN comp ca ON ca.vec_id = c.qid
         |         JOIN comp cb ON cb.vec_id = c.vec_id AND cb.d = ca.d
         |         GROUP BY c.qid, c.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM dots
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // same replay with rn <= 2 in the assignment (each vector in its TOP-2
    // cells) and a DISTINCT candidate set (a vector reachable through both
    // probed cells must occupy one rank)
    "q_sim_ivf_multi" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |cent AS (SELECT vec_id AS cid, d, q FROM comp WHERE vec_id < 8),
         |adot AS (SELECT c.vec_id, ct.cid, SUM(c.q * ct.q) AS cdot
         |         FROM comp c JOIN cent ct ON ct.d = c.d GROUP BY c.vec_id, ct.cid),
         |acell AS (SELECT vec_id, cid AS cell FROM (
         |            SELECT vec_id, cid,
         |                   row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |            FROM adot) WHERE rn <= 2),
         |qprobe AS (SELECT vec_id AS qid, cid AS cell FROM (
         |             SELECT vec_id, cid,
         |                    row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid ASC) AS rn
         |             FROM adot WHERE vec_id < 3) WHERE rn <= 2),
         |cand AS (SELECT DISTINCT qp.qid, a.vec_id
         |         FROM qprobe qp JOIN acell a ON a.cell = qp.cell),
         |dots AS (SELECT c.qid, c.vec_id, CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
         |         FROM cand c
         |         JOIN comp ca ON ca.vec_id = c.qid
         |         JOIN comp cb ON cb.vec_id = c.vec_id AND cb.d = ca.d
         |         GROUP BY c.qid, c.vec_id)
         |SELECT qid, rank, vec_id, dot FROM (
         |  SELECT qid, vec_id, dot,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS INT) AS rank
         |  FROM dots
         |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH allv AS (SELECT * FROM embeddings
         |              UNION ALL
         |              SELECT vec_id + 1000000 AS vec_id, embedding, label FROM embeddings),
         |${compCte("comp", "allv")},
         |bits AS (SELECT vec_id, j,
         |           SUM(q * (((1103515245 * (j * 64 + (d - 1)) + 12345) % 65536) - 32768)) AS dot
         |         FROM comp, range(8) t(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id,
         |          SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
         |        FROM bits GROUP BY vec_id),
         |norm AS (SELECT vec_id, SUM(q * q) AS n2 FROM comp GROUP BY vec_id),
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pd AS (SELECT c.id_a, c.id_b, SUM(ca.q * cb.q) AS dot
         |       FROM cand c
         |       JOIN comp ca ON ca.vec_id = c.id_a
         |       JOIN comp cb ON cb.vec_id = c.id_b AND cb.d = ca.d
         |       GROUP BY c.id_a, c.id_b),
         |cosv AS (SELECT p.id_a, p.id_b,
         |           CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
         |         FROM pd p
         |         JOIN norm na ON na.vec_id = p.id_a
         |         JOIN norm nb ON nb.vec_id = p.id_b)
         |SELECT id_a, id_b, cos FROM cosv WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin,

    "q_corpus_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE ('0x' || substr(md5('sample::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_temperature" ->
      """WITH grp AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(n_rows) AS tn FROM grp),
        |raw AS (SELECT lang, n_rows,
        |          CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE) AS share,
        |          pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
        |        FROM grp CROSS JOIN tot),
        |mx AS (SELECT MAX(w) AS mw FROM raw)
        |SELECT lang, n_rows, round(share, 6) AS share, round(w / mw, 6) AS rate
        |FROM raw CROSS JOIN mx ORDER BY lang""".stripMargin,

    "q_corpus_temperature_sample" ->
      """WITH grp AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(n_rows) AS tn FROM grp),
        |raw AS (SELECT lang,
        |          pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
        |        FROM grp CROSS JOIN tot),
        |mx AS (SELECT MAX(w) AS mw FROM raw),
        |rates AS (SELECT lang,
        |            CAST(round(round(w / mw, 6) * 10000) AS BIGINT) AS thr
        |          FROM raw CROSS JOIN mx)
        |SELECT d.lang, count(*) AS kept
        |FROM documents d JOIN rates r ON r.lang = d.lang
        |WHERE ('0x' || substr(md5('sample::' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < r.thr
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q_corpus_epochs" ->
      """WITH grp AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(n_rows) AS tn FROM grp),
        |raw AS (SELECT lang, n_rows,
        |          CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE) AS share,
        |          pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
        |        FROM grp CROSS JOIN tot),
        |mn AS (SELECT MIN(w) AS mw FROM raw)
        |SELECT lang, n_rows, round(share, 6) AS share,
        |       least(round(w / mw, 6), 4.0) AS epochs
        |FROM raw CROSS JOIN mn ORDER BY lang""".stripMargin,

    "q_corpus_epoch_sample" ->
      """WITH grp AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(n_rows) AS tn FROM grp),
        |raw AS (SELECT lang,
        |          pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
        |        FROM grp CROSS JOIN tot),
        |mn AS (SELECT MIN(w) AS mw FROM raw),
        |er AS (SELECT lang, least(round(w / mw, 6), 4.0) AS e FROM raw CROSS JOIN mn),
        |rates AS (SELECT lang, CAST(floor(e) AS BIGINT) AS f,
        |                 CAST(round((e - floor(e)) * 10000) AS BIGINT) AS thr
        |          FROM er),
        |sel AS (SELECT d.lang,
        |          r.f + CASE WHEN ('0x' || substr(md5('epoch::' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < r.thr
        |                THEN 1 ELSE 0 END AS copies
        |        FROM documents d JOIN rates r USING (lang))
        |SELECT lang, epoch, count(*) AS docs
        |FROM (SELECT lang, unnest(range(copies)) AS epoch FROM sel)
        |GROUP BY lang, epoch ORDER BY lang, epoch""".stripMargin,

    "q_corpus_split" ->
      """SELECT split, count(*) AS docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |FROM (SELECT text,
        |        CASE WHEN b < 8000 THEN 'train'
        |             WHEN b < 9000 THEN 'validation'
        |             ELSE 'test' END AS split
        |      FROM (SELECT text,
        |              ('0x' || substr(md5('split::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
        |            FROM documents))
        |GROUP BY split ORDER BY split""".stripMargin,

    "q_corpus_mix" ->
      """SELECT source, count(*) AS docs FROM documents
        |WHERE ('0x' || substr(md5('sample::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 <
        |      (CASE WHEN source = 'src0' THEN 5000
        |             WHEN source = 'src1' THEN 2500
        |             ELSE 500 END)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_corpus_shuffle" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('shuffle::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ord
        |FROM documents ORDER BY ord, doc_id""".stripMargin,

    "q_corpus_interleave" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY
        |    ('0x' || substr(md5('ileave::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        |    doc_id) - 1 AS BIGINT) AS ord
        |FROM documents ORDER BY ord, lang, doc_id""".stripMargin,

    "q_profile_corr" ->
      """WITH q AS (SELECT
        |    CAST(floor(CAST(n_chars AS DOUBLE) * 1000) AS BIGINT) AS qa,
        |    CAST(floor(CAST(len(string_split(text, ' ')) AS DOUBLE) * 1000) AS BIGINT) AS qb,
        |    CAST(floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) * 1000) AS BIGINT) AS qc
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |        SUM(qa) AS sa, SUM(qb) AS sb, SUM(qc) AS sc,
        |        SUM(qa*qa) AS paa, SUM(qa*qb) AS pab, SUM(qa*qc) AS pac,
        |        SUM(qb*qb) AS pbb, SUM(qb*qc) AS pbc, SUM(qc*qc) AS pcc
        |      FROM q)
        |SELECT 'n_chars' AS col_a, 'n_tokens' AS col_b, n,
        |  round((CAST(n AS DOUBLE) * CAST(pab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(paa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(pbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 4) AS corr
        |FROM m
        |UNION ALL
        |SELECT 'n_chars', 'n_distinct', n,
        |  round((CAST(n AS DOUBLE) * CAST(pac AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sc AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(paa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(pcc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 4)
        |FROM m
        |UNION ALL
        |SELECT 'n_tokens', 'n_distinct', n,
        |  round((CAST(n AS DOUBLE) * CAST(pbc AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(pbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(pcc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 4)
        |FROM m
        |ORDER BY col_a, col_b""".stripMargin,

    "q_text_curation" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS c
        |        FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY doc_id, tok),
        |rep AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS ttf
        |        FROM cnt GROUP BY doc_id),
        |g AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
        |      FROM (SELECT doc_id, ts,
        |              unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i FROM t)),
        |d AS (SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS DOUBLE) / count(*) AS dbf
        |      FROM g GROUP BY doc_id),
        |r AS (SELECT t.doc_id,
        |        concat_ws(',',
        |          CASE WHEN len(t.ts) < 30 THEN 'too_few_tokens' END,
        |          CASE WHEN rep.ttf > 0.12 THEN 'top_token_frac' END,
        |          CASE WHEN coalesce(d.dbf, 0.0) > 0.2 THEN 'dup_2gram_frac' END) AS reasons
        |      FROM t JOIN rep ON rep.doc_id = t.doc_id
        |      LEFT JOIN d ON d.doc_id = t.doc_id)
        |SELECT doc_id, reasons = '' AS keep, reasons FROM r ORDER BY doc_id""".stripMargin,

    // Composed curation replay: gate CTEs verbatim, then min-id-per-md5
    // dedup, temperature rates computed ON THE DEDUPED SURVIVORS (stage
    // inputs chain, exactly like the operator composition), hash mix
    // filter, and the hash-order token-budget prefix
    "q_pipeline_curate" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS c
        |        FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY doc_id, tok),
        |rep AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS ttf
        |        FROM cnt GROUP BY doc_id),
        |g AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
        |      FROM (SELECT doc_id, ts,
        |              unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i FROM t)),
        |d AS (SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS DOUBLE) / count(*) AS dbf
        |      FROM g GROUP BY doc_id),
        |r AS (SELECT t.doc_id,
        |        concat_ws(',',
        |          CASE WHEN len(t.ts) < 30 THEN 'too_few_tokens' END,
        |          CASE WHEN rep.ttf > 0.12 THEN 'top_token_frac' END,
        |          CASE WHEN coalesce(d.dbf, 0.0) > 0.2 THEN 'dup_2gram_frac' END) AS reasons
        |      FROM t JOIN rep ON rep.doc_id = t.doc_id
        |      LEFT JOIN d ON d.doc_id = t.doc_id),
        |kept AS (SELECT dd.doc_id, dd.text, dd.lang, dd.source, dd.n_chars
        |         FROM documents dd JOIN r ON r.doc_id = dd.doc_id
        |         WHERE r.reasons = ''),
        |ded AS (SELECT doc_id, text, lang, source, n_chars FROM (
        |          SELECT *, row_number() OVER (PARTITION BY md5(text)
        |                                       ORDER BY doc_id) AS rn
        |          FROM kept) WHERE rn = 1),
        |grp AS (SELECT lang, count(*) AS n_rows FROM ded GROUP BY lang),
        |tot AS (SELECT SUM(n_rows) AS tn FROM grp),
        |raw AS (SELECT lang,
        |          pow(CAST(n_rows AS DOUBLE) / CAST(tn AS DOUBLE), 1.0/2.0 - 1.0) AS w
        |        FROM grp CROSS JOIN tot),
        |mx AS (SELECT MAX(w) AS mw FROM raw),
        |rates AS (SELECT lang,
        |            CAST(round(round(w / mw, 6) * 10000) AS BIGINT) AS thr
        |          FROM raw CROSS JOIN mx),
        |mixed AS (SELECT ded.* FROM ded JOIN rates rt ON rt.lang = ded.lang
        |          WHERE ('0x' || substr(md5('sample::' || CAST(ded.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < rt.thr),
        |bk AS (SELECT doc_id, lang, source, n_chars,
        |         ('0x' || substr(md5('budget::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h,
        |         len(string_split(text, ' ')) AS tk
        |       FROM mixed),
        |bc AS (SELECT *, sum(tk) OVER (ORDER BY h % 64, h, doc_id
        |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM bk)
        |SELECT doc_id, lang, source, n_chars FROM bc WHERE cum <= 8000
        |ORDER BY doc_id""".stripMargin,

    // crawl-ingest capstone oracle: ONE CTE chain replaying every stage —
    // plants (URL %6 families, lang plants %5, HTML wrap + entity %3),
    // strip (script/style, tags, entities with &amp; last, ws collapse),
    // PSL registrable-domain walk + blocklist + cap 10, the full lang-id
    // classification + rejection gate, quality rules, within-doc line
    // dedup, corpus-wide keep-first paragraph dedup, %97-suite exact
    // decontamination, temperature mix T=2 by detected language
    "q_pipeline_crawl" -> pipelineCrawlOracle,

    // the bytes variant decodes every framing back to the exact
    // plant text, so its oracle is IDENTICAL
    "q_pipeline_crawl_bytes" -> pipelineCrawlOracle,

    "q_corpus_shard" ->
      """SELECT doc_id, source, shard, CAST(ord AS INT) AS ord FROM (
        |  SELECT doc_id, source, shard,
        |         row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS ord
        |  FROM (SELECT doc_id, source,
        |          CAST(('0x' || substr(md5('shard:x:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |          ('0x' || substr(md5('shardord:x:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "q_corpus_sample_exact" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY ('0x' || substr(md5('exact::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000,
        |                    doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3 ORDER BY doc_id""".stripMargin,

    "q_corpus_quantile_trim" ->
      """WITH q AS (SELECT quantile_cont(n_chars, 0.25) AS lo,
        |                  quantile_cont(n_chars, 0.75) AS hi FROM documents)
        |SELECT doc_id, n_chars FROM documents, q
        |WHERE n_chars >= lo AND n_chars <= hi
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_pack" ->
      """WITH b AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |             CAST(('0x' || substr(md5('pack::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS bucket
        |           FROM documents),
        |c AS (SELECT doc_id, bucket, toks,
        |             SUM(toks) OVER (PARTITION BY bucket ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM b)
        |SELECT doc_id, bucket, CAST((cum - toks) // 512 AS BIGINT) AS seq
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_corpus_pack_examples" ->
      """WITH b AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |             CAST(('0x' || substr(md5('pack::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS bucket
        |           FROM documents),
        |c AS (SELECT doc_id, bucket, toks,
        |             SUM(toks) OVER (PARTITION BY bucket ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM b),
        |p AS (SELECT doc_id, bucket, toks, CAST((cum - toks) // 512 AS BIGINT) AS seq
        |      FROM c)
        |SELECT bucket, seq,
        |       CAST(count(*) AS INT) AS n_docs,
        |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
        |       string_agg(CAST(toks AS VARCHAR), ',' ORDER BY doc_id) AS part_lens
        |FROM p GROUP BY bucket, seq ORDER BY bucket, seq""".stripMargin,

    "q_pii_scan" -> {
      val cnt = Pii.patterns.map { case (k, re, _) =>
        s"CAST(len(regexp_extract_all(text, '$re')) AS INT) AS n_$k"
      }.mkString(",\n|  ")
      val red = Pii.patterns.foldLeft("text") { case (acc, (_, re, tok)) =>
        s"regexp_replace($acc, '$re', '$tok', 'g')"
      }
      s"""WITH ptxt AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |       WHEN doc_id % 5 = 1 THEN text || ' call 555-123-4567 or visit 10.0.0.' || CAST(doc_id % 200 AS VARCHAR)
         |       WHEN doc_id % 5 = 2 THEN text || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |       WHEN doc_id % 5 = 3 THEN text || ' card 4111 1111 1111 1111 used'
         |       ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  $cnt,
         |  $red AS redacted
         |FROM ptxt ORDER BY doc_id""".stripMargin
    },

    "q_pii_pseudonymize" -> {
      // each planted doc carries AT MOST ONE match per kind, so the oracle
      // can rebuild the kernel's per-match token from the row's first match
      // (regexp_extract + md5); the coalesce keeps a no-match row's unused
      // replacement string non-NULL
      val steps = Pii.patterns.zipWithIndex.map { case ((k, re, _), i) =>
        val src = if (i == 0) "ptxt" else s"s$i"
        val kind = k.toUpperCase(java.util.Locale.ROOT) // match the kernel's locale-free kinds
        s"""s${i + 1} AS (SELECT doc_id, regexp_replace(text, '$re',
           |  '<$kind:' || substr(md5(coalesce(nullif(regexp_extract(text, '$re'), ''), 'x')), 1, 8) || '>',
           |  'g') AS text FROM $src)""".stripMargin
      }.mkString(",\n")
      s"""WITH ptxt AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |       WHEN doc_id % 5 = 1 THEN text || ' call 555-123-4567 or visit 10.0.0.' || CAST(doc_id % 200 AS VARCHAR)
         |       WHEN doc_id % 5 = 2 THEN text || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |       WHEN doc_id % 5 = 3 THEN text || ' card 4111 1111 1111 1111 used'
         |       ELSE text END AS text
         |  FROM documents),
         |$steps
         |SELECT doc_id, text AS pseudonymized
         |FROM s${Pii.patterns.length} ORDER BY doc_id""".stripMargin
    },

    "q_text_top_ngrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT ts[i] || ' ' || ts[i + 1] AS gram
        |      FROM (SELECT ts, unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i
        |            FROM t))
        |SELECT gram, count(*) AS cnt FROM g
        |GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20""".stripMargin,

    "q_text_docfreq" ->
      """SELECT token, count(*) AS df
        |FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token FROM documents)
        |GROUP BY token ORDER BY df DESC, token ASC LIMIT 20""".stripMargin,

    "q_text_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY doc_id, token),
        |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token),
        |r AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
        |        CAST(row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY dfq.df ASC, tf.tf DESC, tf.token ASC) AS INT) AS rank
        |      FROM tf JOIN dfq USING (token))
        |SELECT doc_id, token, tf, df, rank FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_text_vocab_oov" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |v AS (SELECT token FROM (SELECT token, count(*) AS cnt FROM t GROUP BY token
        |      ORDER BY cnt DESC, token ASC LIMIT 300)),
        |j AS (SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM t LEFT JOIN v ON v.token = t.token)
        |SELECT doc_id, count(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
        |       CAST(SUM(oov) AS DOUBLE) / count(*) AS oov_frac
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_entropy" ->
      """WITH c AS (SELECT doc_id, token, count(*) AS c
        |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |                 FROM documents)
        |           GROUP BY doc_id, token),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclogc
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |       round(ln(CAST(n_tokens AS DOUBLE)) - sclogc / n_tokens, 4) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,

    "q_text_perplexity2" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |u AS (SELECT doc_id, unnest(ts) AS token FROM t),
        |uni AS (SELECT token, count(*) AS c FROM u GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS v FROM uni),
        |bg AS (SELECT doc_id, ts[i] AS prev, ts[i + 1] AS cur
        |       FROM (SELECT doc_id, ts,
        |               unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i
        |             FROM t)),
        |bic AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
        |lp1 AS (SELECT t.doc_id,
        |          ln(CAST(uni.c + 1 AS DOUBLE) / CAST(tot.tt + tot.v + 1 AS DOUBLE)) AS lp
        |        FROM t JOIN uni ON uni.token = ts[1] CROSS JOIN tot),
        |lpb AS (SELECT b.doc_id,
        |          ln(CAST(bic.c2 + 1 AS DOUBLE) / CAST(up.c + tot.v + 1 AS DOUBLE)) AS lp
        |        FROM bg b
        |        JOIN bic ON bic.prev = b.prev AND bic.cur = b.cur
        |        JOIN uni up ON up.token = b.prev
        |        CROSS JOIN tot),
        |lps AS (SELECT * FROM lp1 UNION ALL SELECT * FROM lpb)
        |SELECT doc_id, count(*) AS n_tokens, round(-avg(lp), 4) AS avg_nll,
        |       round(exp(-avg(lp)), 2) AS ppl
        |FROM lps GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |c AS (SELECT doc_id, ts,
        |        1 + CAST(ceil(greatest(len(ts) - 32, 0) / 24.0) AS INT) AS nc FROM t),
        |e AS (SELECT doc_id, ts, unnest(generate_series(0, nc - 1)) AS chunk_no FROM c)
        |SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
        |       array_to_string(ts[chunk_no * 24 + 1 : chunk_no * 24 + 32], ' ') AS chunk_text,
        |       CAST(least(len(ts) - chunk_no * 24, 32) AS INT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin,

    "q_text_perplexity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |lm AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt, count(*) AS v FROM lm),
        |sc AS (SELECT t.doc_id,
        |         ln(CAST(lm.cnt + 1 AS DOUBLE) / CAST(tot.tt + tot.v + 1 AS DOUBLE)) AS lp
        |       FROM t JOIN lm USING (token) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(-avg(lp), 4) AS avg_nll,
        |       round(exp(-avg(lp)), 2) AS ppl
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS c
        |        FROM (SELECT doc_id, unnest(ts) AS tok FROM t) GROUP BY doc_id, tok),
        |top AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_token_frac
        |        FROM cnt GROUP BY doc_id),
        |g AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
        |      FROM (SELECT doc_id, ts,
        |              unnest(generate_series(1, CAST(len(ts) AS BIGINT) - 1)) AS i
        |            FROM t)),
        |d AS (SELECT doc_id, count(*) AS total, count(DISTINCT g) AS dist FROM g GROUP BY doc_id)
        |SELECT top.doc_id, top.n_tokens, top.top_token_frac,
        |  CAST(d.total - d.dist AS DOUBLE) / d.total AS dup_2gram_frac
        |FROM top LEFT JOIN d ON top.doc_id = d.doc_id
        |ORDER BY top.doc_id""".stripMargin,

    "q_mm_frames" ->
      """SELECT asset_id, CAST(i - 1 AS INT) AS frame_no,
        |  md5(substr(text, CAST((i - 1) * 64 + 1 AS INT), 16)) AS frame_md5
        |FROM (SELECT doc_id AS asset_id, text,
        |        unnest(range(1, greatest(1, length(text) // 64) + 1)) AS i
        |      FROM documents)
        |ORDER BY asset_id, frame_no""".stripMargin,

    // Planted geometry/color are closed-form in doc_id (see ImageKernels
    // .synthPng): w = 8 + id%8, h = 8 + id%5, color (id%256, id*7%256,
    // id*13%256), x=0 column black → sum_c = c * (w-1) * h.
    // per-sample closed-form replay: sample(ch,i) = ((id·31 + ch·17 +
    // i·7919) mod 65536) − 32768; window by i·64//F; bit by the
    // cross-multiplied energy comparison (bit 63 as min-long)
    "q_mm_audio_fp" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 2 AS nch, 256 + doc_id % 128 AS F
        |           FROM documents),
        |fr AS (SELECT doc_id, nch, F, g.i AS i
        |       FROM p, UNNEST(generate_series(0, F - 1)) g(i)),
        |sq AS (SELECT doc_id, F, (i * 64) // F AS w,
        |         (((doc_id * 31 + i * 7919) % 65536) - 32768)
        |           * (((doc_id * 31 + i * 7919) % 65536) - 32768)
        |         + CASE WHEN nch = 2 THEN
        |             (((doc_id * 31 + 17 + i * 7919) % 65536) - 32768)
        |               * (((doc_id * 31 + 17 + i * 7919) % 65536) - 32768)
        |           ELSE 0 END AS e
        |       FROM fr),
        |win AS (SELECT doc_id, F, w, SUM(e) AS ew, count(*) AS fw
        |        FROM sq GROUP BY doc_id, F, w),
        |tot AS (SELECT doc_id, SUM(ew) AS et FROM win GROUP BY doc_id),
        |bits AS (SELECT win.doc_id,
        |           CASE WHEN win.ew * win.F >= tot.et * win.fw
        |                THEN CASE WHEN win.w = 63 THEN -9223372036854775808
        |                          ELSE (CAST(1 AS BIGINT) << CAST(win.w AS INT)) END
        |                ELSE 0 END AS bv
        |         FROM win JOIN tot ON tot.doc_id = win.doc_id)
        |SELECT doc_id AS asset_id, bit_or(bv) AS afp
        |FROM bits GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    // Store-served image near-dup pairs: phash bits from the planted
    // closed form (q_mm_phash's CTE), then 4×16-bit banding + hamming ≤ 3
    // (q_dedup_simhash64_pairs' pair machinery over the perceptual hash).
    "q_mm_neardup_indexed" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |                  (doc_id % 256) + ((doc_id * 7) % 256) + ((doc_id * 13) % 256) AS L
        |           FROM documents WHERE doc_id % 10 = 0),
        |cells AS (SELECT doc_id, w, h, L, cy.i AS cy, cx.i AS cx,
        |                 (cx.i * w) // 8 AS x0, ((cx.i + 1) * w) // 8 AS x1,
        |                 (cy.i * h) // 8 AS y0, ((cy.i + 1) * h) // 8 AS y1
        |          FROM p, range(8) cy(i), range(8) cx(i)),
        |bits AS (SELECT doc_id,
        |           CASE WHEN (L * ((x1 - x0) * (y1 - y0)
        |                           - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END)) * (w * h)
        |                     >= (L * (w * h - h)) * ((x1 - x0) * (y1 - y0))
        |                THEN CASE WHEN cy * 8 + cx = 63 THEN -9223372036854775808
        |                          ELSE (CAST(1 AS BIGINT) << CAST(cy * 8 + cx AS INT)) END
        |                ELSE 0 END AS bv
        |         FROM cells),
        |sk AS (SELECT doc_id AS id, bit_or(bv) AS simhash FROM bits GROUP BY doc_id),
        |banded AS (SELECT id, simhash, j AS band, (simhash >> CAST(16 * j AS INT)) & 65535 AS band_key
        |           FROM sk, range(4) r(j)),
        |occ AS (SELECT band, band_key FROM banded
        |        GROUP BY band, band_key HAVING count(*) <= 64),
        |bnd AS (SELECT b.id, b.simhash, b.band, b.band_key FROM banded b
        |        JOIN occ o ON o.band = b.band AND o.band_key = b.band_key),
        |pr AS (SELECT DISTINCT a.id AS asset_a, b.id AS asset_b,
        |              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |       FROM bnd a JOIN bnd b
        |         ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id)
        |SELECT asset_a, asset_b, hamming FROM pr WHERE hamming <= 3
        |ORDER BY asset_a, asset_b""".stripMargin,

    // Served from the decode-once feature store — oracle chain is
    // q_mm_audio_fp's verbatim.
    "q_mm_audio_fp_indexed" ->
      """WITH p AS (SELECT doc_id, 1 + doc_id % 2 AS nch, 256 + doc_id % 128 AS F
        |           FROM documents),
        |fr AS (SELECT doc_id, nch, F, g.i AS i
        |       FROM p, UNNEST(generate_series(0, F - 1)) g(i)),
        |sq AS (SELECT doc_id, F, (i * 64) // F AS w,
        |         (((doc_id * 31 + i * 7919) % 65536) - 32768)
        |           * (((doc_id * 31 + i * 7919) % 65536) - 32768)
        |         + CASE WHEN nch = 2 THEN
        |             (((doc_id * 31 + 17 + i * 7919) % 65536) - 32768)
        |               * (((doc_id * 31 + 17 + i * 7919) % 65536) - 32768)
        |           ELSE 0 END AS e
        |       FROM fr),
        |win AS (SELECT doc_id, F, w, SUM(e) AS ew, count(*) AS fw
        |        FROM sq GROUP BY doc_id, F, w),
        |tot AS (SELECT doc_id, SUM(ew) AS et FROM win GROUP BY doc_id),
        |bits AS (SELECT win.doc_id,
        |           CASE WHEN win.ew * win.F >= tot.et * win.fw
        |                THEN CASE WHEN win.w = 63 THEN -9223372036854775808
        |                          ELSE (CAST(1 AS BIGINT) << CAST(win.w AS INT)) END
        |                ELSE 0 END AS bv
        |         FROM win JOIN tot ON tot.doc_id = win.doc_id)
        |SELECT doc_id AS asset_id, bit_or(bv) AS afp
        |FROM bits GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    "q_mm_resize" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |                  doc_id % 256 AS r, (doc_id * 7) % 256 AS g,
        |                  (doc_id * 13) % 256 AS b
        |           FROM documents),
        |cells AS (SELECT doc_id, r, g, b, cx.i AS cx,
        |                 (cx.i * w) // 4 AS x0, ((cx.i + 1) * w) // 4 AS x1,
        |                 (cy.i * h) // 4 AS y0, ((cy.i + 1) * h) // 4 AS y1
        |          FROM p, range(4) cy(i), range(4) cx(i)),
        |outs AS (SELECT doc_id,
        |           (r * ((x1 - x0) * (y1 - y0)
        |                 - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END))
        |             // ((x1 - x0) * (y1 - y0)) AS pr,
        |           (g * ((x1 - x0) * (y1 - y0)
        |                 - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END))
        |             // ((x1 - x0) * (y1 - y0)) AS pg,
        |           (b * ((x1 - x0) * (y1 - y0)
        |                 - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END))
        |             // ((x1 - x0) * (y1 - y0)) AS pb
        |         FROM cells)
        |SELECT doc_id AS asset_id,
        |       CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
        |       CAST(16 AS BIGINT) AS n_px,
        |       CAST(SUM(pr) AS BIGINT) AS sum_r,
        |       CAST(SUM(pg) AS BIGINT) AS sum_g,
        |       CAST(SUM(pb) AS BIGINT) AS sum_b
        |FROM outs GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    // full 64-bit replay from the planted closed form: per cell, luminance
    // sum = L·(cell_px − black_column_share), bit = cross-multiplied
    // mean comparison, hash assembled with bit_or (bit 63 as min-long —
    // DuckDB's << refuses the sign bit)
    "q_mm_phash" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |                  (doc_id % 256) + ((doc_id * 7) % 256) + ((doc_id * 13) % 256) AS L
        |           FROM documents),
        |cells AS (SELECT doc_id, w, h, L, cy.i AS cy, cx.i AS cx,
        |                 (cx.i * w) // 8 AS x0, ((cx.i + 1) * w) // 8 AS x1,
        |                 (cy.i * h) // 8 AS y0, ((cy.i + 1) * h) // 8 AS y1
        |          FROM p, range(8) cy(i), range(8) cx(i)),
        |bits AS (SELECT doc_id,
        |           CASE WHEN (L * ((x1 - x0) * (y1 - y0)
        |                           - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END)) * (w * h)
        |                     >= (L * (w * h - h)) * ((x1 - x0) * (y1 - y0))
        |                THEN CASE WHEN cy * 8 + cx = 63 THEN -9223372036854775808
        |                          ELSE (CAST(1 AS BIGINT) << CAST(cy * 8 + cx AS INT)) END
        |                ELSE 0 END AS bv
        |         FROM cells)
        |SELECT doc_id AS asset_id, bit_or(bv) AS phash
        |FROM bits GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    // Served from the decode-once feature store — must equal the decode
    // path bit-for-bit, so the oracle chain is q_mm_phash's verbatim.
    "q_mm_phash_indexed" ->
      """WITH p AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |                  (doc_id % 256) + ((doc_id * 7) % 256) + ((doc_id * 13) % 256) AS L
        |           FROM documents),
        |cells AS (SELECT doc_id, w, h, L, cy.i AS cy, cx.i AS cx,
        |                 (cx.i * w) // 8 AS x0, ((cx.i + 1) * w) // 8 AS x1,
        |                 (cy.i * h) // 8 AS y0, ((cy.i + 1) * h) // 8 AS y1
        |          FROM p, range(8) cy(i), range(8) cx(i)),
        |bits AS (SELECT doc_id,
        |           CASE WHEN (L * ((x1 - x0) * (y1 - y0)
        |                           - CASE WHEN cx = 0 THEN (y1 - y0) ELSE 0 END)) * (w * h)
        |                     >= (L * (w * h - h)) * ((x1 - x0) * (y1 - y0))
        |                THEN CASE WHEN cy * 8 + cx = 63 THEN -9223372036854775808
        |                          ELSE (CAST(1 AS BIGINT) << CAST(cy * 8 + cx AS INT)) END
        |                ELSE 0 END AS bv
        |         FROM cells)
        |SELECT doc_id AS asset_id, bit_or(bv) AS phash
        |FROM bits GROUP BY doc_id ORDER BY asset_id""".stripMargin,

    "q_mm_decode" ->
      """SELECT doc_id AS asset_id,
        |  CAST(8 + doc_id % 8 AS INT) AS width,
        |  CAST(8 + doc_id % 5 AS INT) AS height,
        |  CAST((8 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS n_px,
        |  CAST((doc_id % 256) * (7 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS sum_r,
        |  CAST(((doc_id * 7) % 256) * (7 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS sum_g,
        |  CAST(((doc_id * 13) % 256) * (7 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS sum_b
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Arm 2 (the LZ77 arm) stripes greens g/(g+128) by row and copies
    // the last row from row h-2 through plane codes 97/(0,2)/(0,1), so
    // its green sum is the stripe count law: nGa rows of g where
    // nGa = h/2+1 (h even) or (h-1)/2 (h odd), the rest (g+128)%256.
    "q_mm_decode_vp8l" ->
      """WITH geo AS (SELECT doc_id,
        |  CAST(9 + doc_id % 8 AS INT) AS w, CAST(8 + doc_id % 5 AS INT) AS h,
        |  doc_id % 256 AS r, (doc_id * 7) % 256 AS g, (doc_id * 13) % 256 AS b,
        |  CAST(doc_id % 7 AS INT) AS arm FROM documents),
        |geo2 AS (SELECT *,
        |  CASE WHEN h % 2 = 0 THEN h // 2 + 1 ELSE (h - 1) // 2 END AS n_ga
        |  FROM geo)
        |SELECT doc_id AS asset_id, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(CASE WHEN arm IN (2, 3, 5) THEN w * h * r
        |            ELSE (w - 1) * h * r END AS BIGINT) AS sum_r,
        |  CAST(CASE WHEN arm IN (3, 5) THEN w * h * g
        |            WHEN arm = 2 THEN w * (n_ga * g + (h - n_ga) * ((g + 128) % 256))
        |            WHEN arm = 6 THEN (w - 1) * (h + h // 2)
        |            ELSE (w - 1) * h * g END AS BIGINT) AS sum_g,
        |  CAST(CASE WHEN arm IN (2, 3, 5) THEN w * h * b
        |            ELSE (w - 1) * h * b END AS BIGINT) AS sum_b
        |FROM geo2 ORDER BY asset_id""".stripMargin,

    // Planted MP4 parameters are closed-form in doc_id (see VideoKernels
    // .synthMp4): timescale 1000+(id%9)*100, ticks 48000+(id*7)%100000,
    // duration_ms = ticks*1000 // timescale, 1+id%3 tracks, video codec by
    // id%3, dims 320+(id%16)*40 x 240+(id%9)*40, id%7==6 corrupt -> NULLs
    "q_mm_image_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 4 < 2
        |       THEN CASE WHEN doc_id % 7 = 6 THEN NULL ELSE 'webp' END
        |       WHEN doc_id % 4 = 2 THEN 'png'
        |       WHEN doc_id % 7 = 6 THEN NULL
        |       WHEN doc_id % 5 = 0 THEN 'heic' ELSE 'avif' END AS format,
        |  CASE WHEN doc_id % 4 < 2
        |       THEN CASE WHEN doc_id % 7 = 6 THEN NULL
        |            ELSE CAST(16 + doc_id % 32 AS INT) END
        |       WHEN doc_id % 4 = 2 THEN CAST(8 + doc_id % 8 AS INT)
        |       WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(24 + doc_id % 40 AS INT) END AS width,
        |  CASE WHEN doc_id % 4 < 2
        |       THEN CASE WHEN doc_id % 7 = 6 THEN NULL
        |            ELSE CAST(16 + doc_id % 16 AS INT) END
        |       WHEN doc_id % 4 = 2 THEN CAST(8 + doc_id % 5 AS INT)
        |       WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(24 + doc_id % 24 AS INT) END AS height,
        |  CASE WHEN doc_id % 4 < 2
        |       THEN CASE WHEN doc_id % 7 = 6 THEN NULL
        |            ELSE CAST(doc_id % 3 <> 0 AND doc_id % 2 = 1 AS INT) END
        |       WHEN doc_id % 4 = 2 THEN 0
        |       WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(doc_id % 2 = 1 AS INT) END AS has_alpha
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q_mm_video_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST((48000 + (doc_id * 7) % 100000) * 1000
        |                 // (1000 + (doc_id % 9) * 100) AS BIGINT) END AS duration_ms,
        |  CASE WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(1 + doc_id % 3 AS INT) END AS n_tracks,
        |  CASE WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(320 + (doc_id % 16) * 40 AS INT) END AS width,
        |  CASE WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CAST(240 + (doc_id % 9) * 40 AS INT) END AS height,
        |  CASE WHEN doc_id % 7 = 6 THEN NULL
        |       ELSE CASE CAST(doc_id % 3 AS INT)
        |              WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1,mp4a'
        |              ELSE 'av01,mp4a,tx3g' END END AS codecs
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Planted WAV parameters are closed-form in doc_id (see AudioKernels
    // .synthWav): rate 8000, channels = 1 + id%2, frames = 256 + id%128,
    // sample(ch,i) = ((id*31 + ch*17 + i*7919) % 65536) - 32768 — the sums
    // are recomputed sample-by-sample here, never read from the payload.
    "q_mm_audio" ->
      """WITH p AS (SELECT doc_id,
        |             CAST(1 + doc_id % 2 AS INT) AS channels,
        |             CAST(256 + doc_id % 128 AS BIGINT) AS n
        |           FROM documents),
        |i AS (SELECT unnest(range(0, 384)) AS i),
        |ch AS (SELECT unnest([0, 1]) AS ch),
        |smp AS (SELECT p.doc_id, ch.ch,
        |          ((p.doc_id * 31 + ch.ch * 17 + i.i * 7919) % 65536) - 32768 AS v
        |        FROM p CROSS JOIN i CROSS JOIN ch
        |        WHERE i.i < p.n AND ch.ch < p.channels),
        |agg AS (SELECT doc_id, ch,
        |          CAST(SUM(v) AS BIGINT) AS sm, CAST(SUM(v * v) AS BIGINT) AS sq
        |        FROM smp GROUP BY doc_id, ch)
        |SELECT p.doc_id AS asset_id,
        |  8000 AS sample_rate, p.channels, p.n AS n_frames,
        |  MAX(CASE WHEN a.ch = 0 THEN a.sm END) AS sum_c0,
        |  MAX(CASE WHEN a.ch = 0 THEN a.sq END) AS sumsq_c0,
        |  COALESCE(MAX(CASE WHEN a.ch = 1 THEN a.sm END), 0) AS sum_c1,
        |  COALESCE(MAX(CASE WHEN a.ch = 1 THEN a.sq END), 0) AS sumsq_c1
        |FROM p JOIN agg a ON a.doc_id = p.doc_id
        |GROUP BY p.doc_id, p.channels, p.n
        |ORDER BY asset_id""".stripMargin,

    "q_mm_features" ->
      """SELECT doc_id AS asset_id, 'image' AS modality, source,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  (ascii(substr(text, 1, 1)) + 1) * 16 AS width,
        |  (ascii(substr(text, 2, 1)) + 1) * 16 AS height
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q_ret_bm25" -> bm25FixedQueriesOracle,

    "q_ret_bm25f" -> bm25fWeightedFieldsOracle,

    // identical replay: the crawl variant's title/body come out of
    // planted HTML bytes via html_title/html_to_text, and are
    // DEFINITIONALLY the same first-5/rest token split — one oracle
    // pins both, which is exactly the end-to-end claim
    "q_ret_bm25f_crawl" -> bm25fWeightedFieldsOracle,

    // BM25 scores from the FULL corpus; the phrase hit set filters the
    // scored docs; ranks recomputed within the filtered set
    "q_ret_phrase_bm25" ->
      s"""WITH ${bm25Ctes(
           "SELECT * FROM (VALUES (0, 'table value'), (1, 'spark window')) AS v(qid, qtext)")},
        |ptoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |          WHERE text IS NOT NULL),
        |ppos AS (SELECT doc_id, g.i AS p, l[g.i] AS t
        |         FROM ptoks, UNNEST(generate_series(1, len(l))) g(i)),
        |pph AS (SELECT * FROM (VALUES (0, 'a'), (1, 'a'), (2, 'the')) v(j, t)),
        |pfan AS (SELECT ppos.doc_id, ppos.p - pph.j AS base, pph.j
        |         FROM ppos JOIN pph ON pph.t = ppos.t),
        |phit AS (SELECT DISTINCT doc_id FROM (
        |           SELECT doc_id, base FROM pfan GROUP BY doc_id, base
        |           HAVING count(DISTINCT j) = 3)),
        |fagg AS (SELECT a.* FROM bagg a JOIN phit USING (doc_id)),
        |franked AS (SELECT qid, doc_id, score,
        |              CAST(row_number() OVER (PARTITION BY qid
        |                   ORDER BY score DESC, doc_id ASC) AS INT) AS rank
        |            FROM fagg)
        |SELECT CAST(qid AS BIGINT) AS qid, rank, doc_id, score
        |FROM franked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // the persisted-index path must serve IDENTICAL rankings — one oracle
    "q_ret_bm25_indexed" -> bm25FixedQueriesOracle,

    "q_ret_bm25_deleted" ->
      s"""WITH ${bm25Ctes(
           "SELECT * FROM (VALUES (0, 'spark dup'), (1, 'hash join merge'), " +
             "(2, 'window sort dup quantum')) AS v(qid, qtext)",
           "(SELECT * FROM documents WHERE doc_id % 7 <> 3)")}
         |SELECT CAST(qid AS BIGINT) AS qid, rank, doc_id, score
         |FROM bmranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "q_ret_hybrid_rrf" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |vdots AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |            CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |          FROM qcomp q JOIN comp c ON c.d = q.d
         |          GROUP BY q.vec_id, c.vec_id),
         |vtop AS (SELECT qid, doc_id, rank FROM (
         |           SELECT qid, doc_id,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, doc_id ASC) AS INT) AS rank
         |           FROM vdots) WHERE rank <= 10),
         |${bm25Ctes(
           "SELECT doc_id AS qid, array_to_string(string_split(text, ' ')[1:4], ' ') AS qtext " +
             "FROM documents WHERE doc_id < 3")},
         |btop AS (SELECT qid, doc_id, rank FROM bmranked WHERE rank <= 10),
         |contrib AS (SELECT qid, doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM btop
         |            UNION ALL
         |            SELECT qid, doc_id, CAST(1 AS DOUBLE) / (60 + rank) FROM vtop),
         |fused AS (SELECT qid, doc_id, round(sum(c), 6) AS rrf
         |          FROM contrib GROUP BY qid, doc_id)
         |SELECT qid, rank, doc_id, rrf FROM (
         |  SELECT qid, doc_id, rrf,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
         |  FROM fused) WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // RM3 replay: pass-1 bmranked -> feedback top-5 -> relevance-model
    // term weights (round 6) -> top-10 terms (rel desc, token asc) ->
    // normalized + 0.5/0.5 interpolation with uniform originals (round 6)
    // -> weighted second scoring pass (round 4, rank desc, doc_id asc)
    "q_ret_bm25_rm3" -> rm3OracleSql,

    // Ranking-eval replay: same synthetic qrels arithmetic, DCG/IDCG with
    // (2^g - 1)/log2(rank+1) gains, MRR as max reciprocal relevant rank
    "q_ret_eval" ->
      s"""WITH ${bm25Ctes(
           "SELECT doc_id AS qid, array_to_string(string_split(text, ' ')[1:4], ' ') AS qtext " +
             "FROM documents WHERE doc_id < 3")},
         |qr AS (SELECT q.qid, d.doc_id,
         |         CAST((d.doc_id + q.qid) % 3 + 1 AS INT) AS grade
         |       FROM (SELECT DISTINCT qid FROM bq) q CROSS JOIN documents d
         |       WHERE (d.doc_id + q.qid) % 17 = 0),
         |res AS (SELECT qid, rank, doc_id FROM bmranked WHERE rank <= 10),
         |egr AS (SELECT r.qid, r.rank, COALESCE(qr.grade, 0) AS g
         |        FROM res r LEFT JOIN qr ON qr.qid = r.qid AND qr.doc_id = r.doc_id),
         |edcg AS (SELECT qid,
         |           round(SUM((pow(2.0, g) - 1.0) / log2(rank + 1)), 6) AS dcg,
         |           round(MAX(CASE WHEN g > 0 THEN 1.0 / rank ELSE 0.0 END), 6) AS mrr,
         |           SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS n_rel_ret
         |         FROM egr GROUP BY qid),
         |eideal AS (SELECT qid,
         |             round(SUM((pow(2.0, grade) - 1.0) / log2(irank + 1)), 6) AS idcg
         |           FROM (SELECT qid, grade, doc_id,
         |                   row_number() OVER (PARTITION BY qid
         |                     ORDER BY grade DESC, doc_id ASC) AS irank
         |                 FROM qr WHERE grade > 0)
         |           WHERE irank <= 10 GROUP BY qid),
         |enrel AS (SELECT qid, count(*) AS n_rel FROM qr WHERE grade > 0 GROUP BY qid)
         |SELECT d.qid,
         |       round(CASE WHEN i.idcg IS NULL OR i.idcg = 0 THEN 0.0
         |             ELSE d.dcg / i.idcg END, 6) AS ndcg,
         |       d.mrr,
         |       round(CAST(d.n_rel_ret AS DOUBLE) / 10, 6) AS prec,
         |       round(CASE WHEN n.n_rel IS NULL THEN 0.0
         |             ELSE CAST(d.n_rel_ret AS DOUBLE) / n.n_rel END, 6) AS recall
         |FROM edcg d
         |LEFT JOIN eideal i ON i.qid = d.qid
         |LEFT JOIN enrel n ON n.qid = d.qid
         |ORDER BY d.qid""".stripMargin,

    // Indexed RM3 serves the identical ranking from the persisted lexical
    // index (same corpus, same weights) - shared oracle, verbatim.
    "q_ret_bm25_rm3_indexed" -> rm3OracleSql,

    // Min-max-normalized weighted fusion over the same two lists: per
    // (query, list) scores rescale to [0,1] (constant list -> 1.0), fuse
    // as 0.7*lex + 0.3*vec, round 6dp, rank desc with doc_id tie-break
    "q_ret_hybrid_norm" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |vdots AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |            CAST(SUM(q.q * c.q) AS BIGINT) AS dot
         |          FROM qcomp q JOIN comp c ON c.d = q.d
         |          GROUP BY q.vec_id, c.vec_id),
         |vtop AS (SELECT qid, doc_id, CAST(dot AS DOUBLE) AS score FROM (
         |           SELECT qid, doc_id, dot,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, doc_id ASC) AS INT) AS rank
         |           FROM vdots) WHERE rank <= 10),
         |${bm25Ctes(
           "SELECT doc_id AS qid, array_to_string(string_split(text, ' ')[1:4], ' ') AS qtext " +
             "FROM documents WHERE doc_id < 3")},
         |btop AS (SELECT qid, doc_id, score FROM bmranked WHERE rank <= 10),
         |bnorm AS (SELECT qid, doc_id,
         |            CAST(0.7 AS DOUBLE) * (CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
         |              ELSE (score - mn) / (mx - mn) END) AS c
         |          FROM (SELECT qid, doc_id, score,
         |                  MIN(score) OVER (PARTITION BY qid) AS mn,
         |                  MAX(score) OVER (PARTITION BY qid) AS mx FROM btop)),
         |vnorm AS (SELECT qid, doc_id,
         |            CAST(0.3 AS DOUBLE) * (CASE WHEN mx = mn THEN CAST(1.0 AS DOUBLE)
         |              ELSE (score - mn) / (mx - mn) END) AS c
         |          FROM (SELECT qid, doc_id, score,
         |                  MIN(score) OVER (PARTITION BY qid) AS mn,
         |                  MAX(score) OVER (PARTITION BY qid) AS mx FROM vtop)),
         |nfused AS (SELECT qid, doc_id, round(sum(c), 6) AS fused
         |           FROM (SELECT * FROM bnorm UNION ALL SELECT * FROM vnorm)
         |           GROUP BY qid, doc_id)
         |SELECT qid, rank, doc_id, fused FROM (
         |  SELECT qid, doc_id, fused,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY fused DESC, doc_id ASC) AS INT) AS rank
         |  FROM nfused) WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "q_corpus_dsir" ->
      """WITH tb AS (SELECT doc_id, lang,
        |              CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS INT) AS b
        |            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |                  FROM documents WHERE text IS NOT NULL)),
        |tcnt AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
        |rcnt AS (SELECT b, count(*) AS cr FROM tb GROUP BY b),
        |model AS (SELECT COALESCE(t.b, r.b) AS b,
        |            COALESCE(t.ct, 0) AS ct, COALESCE(r.cr, 0) AS cr
        |          FROM tcnt t FULL JOIN rcnt r ON r.b = t.b),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
        |        FROM model),
        |lp AS (SELECT tb.doc_id,
        |         ln(CAST(m.ct + 1 AS DOUBLE) / CAST(tot.tt + 256 AS DOUBLE))
        |         - ln(CAST(m.cr + 1 AS DOUBLE) / CAST(tot.tr + 256 AS DOUBLE)) AS lp
        |       FROM tb JOIN model m USING (b) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens, round(sum(lp), 4) AS logw
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_ppl_buckets" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |lm AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt, count(*) AS v FROM lm),
         |sc AS (SELECT t.doc_id,
         |         ln(CAST(lm.cnt + 1 AS DOUBLE) / CAST(tot.tt + tot.v + 1 AS DOUBLE)) AS lp
         |       FROM t JOIN lm USING (token) CROSS JOIN tot),
         |p AS (SELECT doc_id, count(*) AS n_tokens, round(exp(-avg(lp)), 2) AS ppl
         |      FROM sc GROUP BY doc_id),
         |q AS (SELECT quantile_cont(ppl, ${1.0 / 3}) AS qlo,
         |             quantile_cont(ppl, ${2.0 / 3}) AS qhi FROM p)
         |SELECT doc_id, n_tokens, ppl,
         |       CASE WHEN ppl <= qlo THEN 'head'
         |            WHEN ppl <= qhi THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM p CROSS JOIN q ORDER BY doc_id""".stripMargin,

    "q_text_nb_classify" ->
      s"""WITH $nbCtes
         |SELECT doc_id, pred, score FROM nbpred ORDER BY doc_id""".stripMargin,

    "q_text_nb_confusion" ->
      s"""WITH $nbCtes
         |SELECT d.lang AS truth, p.pred, count(*) AS n
         |FROM nbpred p JOIN documents d USING (doc_id)
         |GROUP BY d.lang, p.pred ORDER BY truth, pred""".stripMargin,

    // margin-reliability oracle: the full score frame's top-2 per doc,
    // bucket = least(floor(s1 - s2), 9) — exact subtraction of 4-dp
    // scores, both engines' least() ignore a null runner-up
    "q_text_nb_reliability" ->
      s"""WITH $nbCtes,
         |r2 AS (SELECT doc_id, label, score,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, label ASC) AS rn
         |       FROM sc),
         |tops AS (SELECT doc_id,
         |           max(CASE WHEN rn = 1 THEN score END) AS s1,
         |           max(CASE WHEN rn = 1 THEN label END) AS pred,
         |           max(CASE WHEN rn = 2 THEN score END) AS s2
         |         FROM r2 WHERE rn <= 2 GROUP BY doc_id),
         |j AS (SELECT least(CAST(floor(t.s1 - t.s2) AS BIGINT), 9) AS bucket,
         |             CASE WHEN t.pred = d.lang THEN 1 ELSE 0 END AS ok
         |      FROM tops t JOIN documents d USING (doc_id))
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(ok) AS BIGINT) AS n_correct
         |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_corpus_split_leakage" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents
        |               UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |sp AS (SELECT text,
        |         CASE WHEN b < 8000 THEN 'train'
        |              WHEN b < 9000 THEN 'validation'
        |              ELSE 'test' END AS split
        |       FROM (SELECT text,
        |               ('0x' || substr(md5('split::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
        |             FROM docs2 WHERE text IS NOT NULL)),
        |c AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |             split, count(*) AS n
        |      FROM sp GROUP BY fp, split)
        |SELECT a.split AS split_a, b.split AS split_b, count(*) AS dup_groups,
        |       CAST(SUM(a.n * b.n) AS BIGINT) AS leaked_pairs
        |FROM c a JOIN c b ON a.fp = b.fp AND a.split < b.split
        |GROUP BY a.split, b.split ORDER BY split_a, split_b""".stripMargin,

    "q_corpus_token_budget" ->
      """WITH k AS (SELECT doc_id, lang, source, n_chars,
        |             ('0x' || substr(md5('budget::' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h,
        |             len(string_split(text, ' ')) AS tk
        |           FROM documents),
        |c AS (SELECT *, sum(tk) OVER (ORDER BY h % 64, h, doc_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM k)
        |SELECT doc_id, lang, source, n_chars FROM c WHERE cum <= 15000
        |ORDER BY doc_id""".stripMargin,

    "q_ret_mmr" ->
      s"""WITH ${compCte("comp", "embeddings")},
         |${compCte("qcomp", "(SELECT * FROM embeddings WHERE vec_id < 3)")},
         |mdots AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |            CAST(SUM(q.q * c.q) AS BIGINT) AS rel
         |          FROM qcomp q JOIN comp c ON c.d = q.d
         |          GROUP BY q.vec_id, c.vec_id),
         |mcand AS (SELECT qid, doc_id, rel FROM (
         |            SELECT qid, doc_id, rel,
         |              row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id ASC) AS rn
         |            FROM mdots) WHERE rn <= 15),
         |msims AS (SELECT a.qid, a.doc_id AS ia, b.doc_id AS ib,
         |            CAST(SUM(ca.q * cb.q) AS BIGINT) AS dot
         |          FROM mcand a
         |          JOIN mcand b ON b.qid = a.qid AND b.doc_id <> a.doc_id
         |          JOIN comp ca ON ca.vec_id = a.doc_id
         |          JOIN comp cb ON cb.vec_id = b.doc_id AND cb.d = ca.d
         |          GROUP BY a.qid, a.doc_id, b.doc_id),
         |${mmrCtes(5)}
         |SELECT qid, rank, doc_id, mmr FROM selall5 ORDER BY qid, rank""".stripMargin
  )
}
