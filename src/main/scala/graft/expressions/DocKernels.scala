package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document codegen'd kernels for operations that are pure functions of a
 * single document's token array. Their aggregate formulations (explode →
 * shuffle by doc id → grouped combine) push every token/shingle of the
 * corpus through exchanges that compute nothing a single pass over the row
 * couldn't — these kernels keep the whole map phase embarrassingly parallel.
 * Each is value-identical to its aggregate counterpart (equivalence specs in
 * `LlmOpsSpec`) and to the DuckDB oracles.
 */
object DocKernels {

  private def tokenCheck(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string> tokens, got ${other.simpleString}")
  }

  /** `simhash32(tokens)` — 32-bit count-weighted SimHash sketch
    * ([[graft.ops.Dedup.simhash]] semantics): every token occurrence votes
    * ±1 per bit of its md5-derived 32-bit hash; the sketch keeps the signs. */
  case class Simhash32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.simhash(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.simhash($a);")
    override protected def withNewChildInternal(newChild: Expression): Simhash32 =
      copy(child = newChild)
  }

  /** `simhash64(tokens)` — 64-bit count-weighted SimHash sketch
    * ([[graft.ops.Dedup.simhash64]] semantics): like [[Simhash32]] but the
    * votes cover the first 8 md5 digest bytes ([[MinhashSigs.hash64]]
    * layout). Twice the signal bits makes random sketch collisions
    * negligible and enables 16-bit-band blocking
    * ([[graft.ops.Dedup.simhashNearDuplicates64]]) — the corpus-scale
    * variant of the 32-bit sketch. */
  case class Simhash64(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.simhash64(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.simhash64($a);")
    override protected def withNewChildInternal(newChild: Expression): Simhash64 =
      copy(child = newChild)
  }

  /** `min_shingle_hash(tokens, n)` — minimum md5-derived 32-bit hash over
    * the document's word `n`-shingles ([[graft.ops.TextOps.minShingleHash]]
    * semantics); null when the document has fewer than `n` tokens. */
  case class MinShingleHash(child: Expression, shingle: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (shingle <= 0)
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires shingle > 0")
      else tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "min_shingle_hash"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.minShingle(a.asInstanceOf[ArrayData], shingle) // may be null
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val boxed = ctx.freshName("boxed")
        s"""
           |Object $boxed = graft.expressions.DocKernels.minShingle($a, $shingle);
           |if ($boxed == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
           |}
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): MinShingleHash =
      copy(child = newChild)
  }

  /** `winnow_fps(tokens, n, w)` — distinct winnowing fingerprints
    * ([[graft.ops.TextOps.winnow]] semantics): the minimum md5-derived
    * 32-bit hash of each sliding window of `w` consecutive word
    * `n`-shingles, deduplicated and sorted ascending. Documents with fewer
    * than `n + w - 1` tokens degrade to their single global min; documents
    * with fewer than `n` tokens yield an empty array. */
  case class WinnowFps(child: Expression, shingle: Int, window: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (shingle <= 0 || window <= 0)
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires shingle > 0 and window > 0")
      else tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fps"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.winnow(a.asInstanceOf[ArrayData], shingle, window)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.winnow($a, $shingle, $window);")
    override protected def withNewChildInternal(newChild: Expression): WinnowFps =
      copy(child = newChild)
  }

  /** `span_win_hashes(tokens, n)` — polynomial ROLLING hash of every
    * n-token window, the O(tokens) replacement for md5-ing each joined
    * window string (O(tokens·n) bytes hashed — the round-11 verdict's CPU
    * constant on span dedup): per token ONE md5-derived 32-bit hash
    * ([[MinhashSigs.hash32]], the engine standard) reduced mod 2³¹−1,
    * then two independent degree-(n−1) polynomial hashes (bases 131/137,
    * modulus 2³¹−1) maintained by rolling update; the emitted value packs
    * them as `h1·2³¹ + h2` (~62 collision bits — stronger than the 32-bit
    * md5 prefix it replaces). Every step is exact integer arithmetic a
    * SQL oracle replays term-by-term (`Σ hm·B^{n−1−j} mod M` against a
    * literal power table — see the span-dedup oracles). Element `i`
    * (0-based) is the window starting at token `i+1`; fewer than `n`
    * tokens yields an empty array; a null token element hashes as the
    * empty string. */
  case class SpanWinHashes(child: Expression, n: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (n <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName requires n > 0")
      else tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "span_win_hashes"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.spanWinHashes(a.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.spanWinHashes($a, $n);")
    override protected def withNewChildInternal(newChild: Expression): SpanWinHashes =
      copy(child = newChild)
  }

  /** `repetition_stats(tokens)` — `(n_tokens, top_token_frac,
    * dup_2gram_frac)` ([[graft.ops.TextOps.repetitionSignals]] semantics);
    * `dup_2gram_frac` is null for documents with fewer than 2 tokens. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("top_token_frac", DoubleType, nullable = false),
      StructField("dup_2gram_frac", DoubleType, nullable = true)))
    override def prettyName: String = "repetition_stats"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.repetition(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.repetition($a);")
    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
  }

  /** `lang_id(tokens)` — stopword-profile language ID
    * ([[graft.ops.TextOps.langIdFromTokens]] semantics): most marker hits
    * wins, ties break to the ascending language code, zero hits ⇒ "und".
    * The composed form pays one interpreted `filter` lambda per candidate
    * language plus an interpreted `array_sort` comparator per row. */
  case class LangId(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      tokenCheck(child.dataType, prettyName)
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.langId(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.langId($a);")
    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
  }

  // ---- static kernels (invoked from generated code and from eval) ---------

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Long](32)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = MinhashSigs.hash32(tokens.getUTF8String(t))
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = MinhashSigs.hash64(tokens.getUTF8String(t))
        var j = 0
        while (j < 64) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  def minShingle(tokens: ArrayData, shingle: Int): java.lang.Long = {
    val n = tokens.numElements()
    if (n < shingle) return null
    var min = Long.MaxValue
    val sb = new java.lang.StringBuilder
    var start = 0
    while (start <= n - shingle) {
      val h = MinhashSigs.shingleHash(tokens, start, shingle, sb)
      if (h < min) min = h
      start += 1
    }
    java.lang.Long.valueOf(min)
  }

  def winnow(tokens: ArrayData, shingle: Int, window: Int): ArrayData = {
    val m = tokens.numElements() - shingle + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val sb = new java.lang.StringBuilder
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = MinhashSigs.shingleHash(tokens, i, shingle, sb); i += 1 }
    val fps = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque: O(m) sliding-window minimum
    val dq = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < m) {
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(p)) dq.pollLast()
      dq.addLast(p)
      if (dq.peekFirst() <= p - window) dq.pollFirst()
      // record each COMPLETE window's min (windows ending at p >= window-1);
      // short documents (m < window) record their single global min at the
      // final position
      if (p >= window - 1 || p == m - 1) fps.add(hs(dq.peekFirst()))
      p += 1
    }
    val out = new Array[Long](fps.size())
    val it = fps.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Polynomial rolling-hash window hashes ([[SpanWinHashes]]). Constants
    * are part of the oracle contract: M = 2³¹−1, bases 131/137, combined
    * value `h1·2³¹ + h2`. */
  def spanWinHashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val M = 2147483647L
    val B1 = 131L
    val B2 = 137L
    val hm = new Array[Long](m)
    var i = 0
    while (i < m) {
      hm(i) =
        (if (tokens.isNullAt(i)) MinhashSigs.hash32Bytes(Array.emptyByteArray)
         else MinhashSigs.hash32(tokens.getUTF8String(i))) % M
      i += 1
    }
    // B^(n-1) mod M — the coefficient the outgoing token leaves with
    var pw1 = 1L; var pw2 = 1L
    i = 0
    while (i < n - 1) { pw1 = pw1 * B1 % M; pw2 = pw2 * B2 % M; i += 1 }
    val out = new Array[Long](m - n + 1)
    var a1 = 0L; var a2 = 0L
    i = 0
    while (i < n) { a1 = (a1 * B1 + hm(i)) % M; a2 = (a2 * B2 + hm(i)) % M; i += 1 }
    out(0) = (a1 << 31) + a2
    var p = 1
    while (p <= m - n) {
      // evict hm(p-1)·B^(n-1), shift, admit hm(p+n-1): all products stay
      // under 2⁶² (M² and M·B1), exact in a long
      a1 = ((a1 - hm(p - 1) * pw1 % M + M) % M * B1 + hm(p + n - 1)) % M
      a2 = ((a2 - hm(p - 1) * pw2 % M + M) % M * B2 + hm(p + n - 1)) % M
      out(p) = (a1 << 31) + a2
      p += 1
    }
    new GenericArrayData(out)
  }

  def repetition(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val counts = new java.util.HashMap[String, Integer]()
    var t = 0
    var nTok = 0L
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t).toString
        val c = counts.get(s)
        counts.put(s, if (c == null) 1 else c + 1)
        nTok += 1
      }
      t += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().longValue(); if (c > top) top = c }
    val grams = new java.util.HashSet[String]()
    var total = 0L
    var i = 0
    while (i < n - 1) {
      if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1)) {
        grams.add(tokens.getUTF8String(i).toString + " " + tokens.getUTF8String(i + 1).toString)
        total += 1
      }
      i += 1
    }
    val row = new GenericInternalRow(3)
    row.setLong(0, nTok)
    row.setDouble(1, if (nTok > 0) top.toDouble / nTok else 0d)
    if (total > 0) row.setDouble(2, (total - grams.size).toDouble / total)
    else row.setNullAt(2)
    row
  }

  // Marker table materialized once from the single source of truth in
  // TextOps.langMarkers (ascending language order = the tie-break order).
  private lazy val langTable: Array[(org.apache.spark.unsafe.types.UTF8String, java.util.HashSet[String])] =
    graft.ops.TextOps.langMarkers.sortBy(_._1).map { case (lang, words) =>
      val set = new java.util.HashSet[String]()
      words.foreach(set.add)
      (org.apache.spark.unsafe.types.UTF8String.fromString(lang), set)
    }.toArray

  private val und = org.apache.spark.unsafe.types.UTF8String.fromString("und")

  def langId(tokens: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val hits = new Array[Int](langTable.length)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t).toString
        var l = 0
        while (l < langTable.length) {
          if (langTable(l)._2.contains(s)) hits(l) += 1
          l += 1
        }
      }
      t += 1
    }
    var best = 0
    var l = 1
    while (l < langTable.length) {
      if (hits(l) > hits(best)) best = l // strict > keeps the asc-code tie-break
      l += 1
    }
    if (hits(best) == 0) und else langTable(best)._1
  }

  val simhashInfo: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash32].getName, null, "simhash32",
    "_FUNC_(tokens) - 32-bit count-weighted SimHash sketch of a token array.",
    "", "", "", "", "", "", "built-in")
  val simhash64Info: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash64].getName, null, "simhash64",
    "_FUNC_(tokens) - 64-bit count-weighted SimHash sketch of a token array.",
    "", "", "", "", "", "", "built-in")
  val minShingleInfo: ExpressionInfo = new ExpressionInfo(
    classOf[MinShingleHash].getName, null, "min_shingle_hash",
    "_FUNC_(tokens, n) - minimum 32-bit hash over the word n-shingles.",
    "", "", "", "", "", "", "built-in")
  val winnowInfo: ExpressionInfo = new ExpressionInfo(
    classOf[WinnowFps].getName, null, "winnow_fps",
    "_FUNC_(tokens, n, w) - distinct winnowing fingerprints (min hash per w-window of n-shingles).",
    "", "", "", "", "", "", "built-in")
  val repetitionInfo: ExpressionInfo = new ExpressionInfo(
    classOf[RepetitionStats].getName, null, "repetition_stats",
    "_FUNC_(tokens) - (n_tokens, top_token_frac, dup_2gram_frac) of a token array.",
    "", "", "", "", "", "", "built-in")
  val langIdInfo: ExpressionInfo = new ExpressionInfo(
    classOf[LangId].getName, null, "lang_id",
    "_FUNC_(tokens) - stopword-profile language code ('und' without hits).",
    "", "", "", "", "", "", "built-in")

  /** `lang_id_ngram(text)` — Cavnar–Trenkle character 1–3-gram language
    * identification over the bundled [[graft.model.LangProfiles]]
    * snapshot (snapshot-sized — see LangProfiles.langs — incl. the non-Latin
    * ru/ja/ar/zh/ko/hi/uk/el/he/th/bg the stopword-marker tier lacks). Gram sizes MIX in one ranked list
    * (the classic C&T formulation): unigram/bigram glue is what
    * separates isolating scripts — zh trigrams are too sparse at small
    * profile sizes, and a zh document far from the seeds would lose an
    * all-penalty tie to ja under trigrams-only (measured; the held-out
    * accuracy spec pins the fix). Normalization is pinned for oracle
    * replay: lowercase, whitespace runs → one space, trim, pad one space
    * each side; grams by CODEPOINT (DuckDB substring semantics); doc
    * profile = top-[[graft.model.LangProfiles.rankSize]] grams by
    * (count desc, UTF-8 byte order asc — DuckDB VARCHAR order);
    * out-of-place distance against the rank-
    * [[graft.model.LangProfiles.profileSize]] language profiles with
    * absent-gram penalty = profileSize (C&T's asymmetric shape: long
    * language profiles, short doc profiles); argmin with
    * language-code-ascending tie-break. REJECTION: the winner is kept
    * only if its distance clears the per-language cutoff
    * ([[graft.model.LangProfiles.cutoffs]], integer math) — otherwise
    * `und`, because open-domain crawl text is mostly languages no
    * bundled profile knows and a confident wrong label poisons every
    * downstream curation gate. `und` also for empty-normalized text.
    * Deterministic — no floats, no locale-contextual cases in the
    * profile scripts. */
  case class LangIdNgram(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id_ngram"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.langIdNgram(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.expressions.DocKernels.langIdNgram($a)")
    override protected def withNewChildInternal(newChild: Expression): LangIdNgram =
      copy(child = newChild)
  }

  /** `lang_id_ngram_scored(text)` — the scored twin of [[LangIdNgram]]:
    * `(lang, best_lang, best_dist, second_dist, max_dist)` where `lang`
    * is the post-rejection label (`und` allowed), `best_lang` the raw
    * argmin, and the integer distances let calibration/auditing derive
    * exact confidences (`1 - best_dist/max_dist`) and margins
    * (`(second_dist - best_dist)/max_dist`) downstream — e.g. feeding
    * [[graft.ops.Profile.calibrationReport]] — without the kernel
    * baking in a float. Same one codegen'd pass; the second-best
    * distance rides the argmin loop for free. */
  case class LangIdNgramScored(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${other.simpleString}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("best_lang", StringType, nullable = false),
      StructField("best_dist", LongType, nullable = false),
      StructField("second_dist", LongType, nullable = false),
      StructField("max_dist", LongType, nullable = false)))
    override def prettyName: String = "lang_id_ngram_scored"
    override protected def nullSafeEval(a: Any): Any =
      DocKernels.langIdNgramScored(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.langIdNgramScored($a);")
    override protected def withNewChildInternal(newChild: Expression): LangIdNgramScored =
      copy(child = newChild)
  }

  private val UndLang = UTF8String.fromString("und")

  // language codes ascending = the argmin tie-break order. (The doc
  // profile's secondary tie-break is the grams' UTF-8 BYTE order —
  // DuckDB's VARCHAR sort order, so the oracle replays it exactly; it
  // is realized below as the packed-long natural order, which equals
  // UTF-8 order because UTF-8 preserves code-point order positionally.)
  private lazy val ngramLangs: Array[String] =
    graft.model.LangProfiles.profiles.map(_._1).sorted.toArray

  // rejection cutoffs x1000, aligned with ngramLangs' language order
  private lazy val ngramCutoffs: Array[Int] =
    ngramLangs.map(lang => graft.model.LangProfiles.cutoffs(lang))

  /** Grams are 1-3 code points, so they pack into one positive long -
    * `(cp1+1) << 42 | (cp2+1) << 21 | (cp3+1)`, absent positions 0 -
    * whose NATURAL ORDER equals the gram strings' UTF-8 byte order
    * (UTF-8 preserves code-point order positionally, and the 0 of an
    * absent position sorts a shorter gram before its extensions exactly
    * like the shorter byte string). The packing kills the per-gram
    * String allocation + hashing that dominated the classifier (r17,
    * A/B-backed). */
  private def packGram(cps: Array[Int], at: Int, n: Int): Long = {
    var v = (cps(at) + 1).toLong << 42
    if (n > 1) v |= (cps(at + 1) + 1).toLong << 21
    if (n > 2) v |= (cps(at + 2) + 1).toLong
    v
  }

  private def packGramString(g: String): Long = {
    val cps = g.codePoints().toArray
    packGram(cps, 0, cps.length)
  }

  /** ONE gram -> per-language rank table for the whole snapshot
    * (rank 0 = absent): the distance loop inverts from
    * `langs x docGrams` string-map probes (53 x 64 per call) to
    * `docGrams` long-map probes (64 per call) + pure array
    * arithmetic. */
  private lazy val gramRanks: java.util.HashMap[java.lang.Long, Array[Short]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Short]](
      ngramLangs.length * graft.model.LangProfiles.profileSize * 2)
    var p = 0
    while (p < ngramLangs.length) {
      val grams = graft.model.LangProfiles.profiles
        .find(_._1 == ngramLangs(p)).get._2
      var r = 0
      while (r < grams.length) {
        val key = java.lang.Long.valueOf(packGramString(grams(r)))
        var a = m.get(key)
        if (a == null) { a = new Array[Short](ngramLangs.length); m.put(key, a) }
        a(p) = (r + 1).toShort
        r += 1
      }
      p += 1
    }
    m
  }

  /** Shared classifier core: [bestIdx, bestDist, secondDist, m], or null
    * when the normalized text is too short to classify. */
  private def classifyNgram(text: UTF8String): Array[Long] = {
    val lowered = text.toString.toLowerCase(java.util.Locale.ROOT)
    // collapse \s runs (the Java/RE2-shared ASCII set) to one space + trim
    val sb = new java.lang.StringBuilder(lowered.length + 2)
    sb.append(' ')
    var i = 0
    var lastSpace = true
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (ws) { if (!lastSpace) { sb.append(' '); lastSpace = true } }
      else { sb.append(c); lastSpace = false }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    val padded = sb.toString
    if (padded.length <= 2) return null // nothing but whitespace
    val cps = padded.codePoints().toArray
    if (cps.length < 3) return null
    // all 1/2/3-grams as packed longs; sort + run-length = the count map
    val total = 3 * cps.length - 3
    val grams = new Array[Long](total)
    var w = 0
    var n = 1
    while (n <= 3) {
      i = 0
      while (i <= cps.length - n) {
        grams(w) = packGram(cps, i, n)
        w += 1
        i += 1
      }
      n += 1
    }
    java.util.Arrays.sort(grams)
    var d = 0
    val gramsD = new Array[Long](total)
    val countsD = new Array[Int](total)
    i = 0
    while (i < total) {
      var j = i + 1
      while (j < total && grams(j) == grams(i)) j += 1
      gramsD(d) = grams(i)
      countsD(d) = j - i
      d += 1
      i = j
    }
    val k = graft.model.LangProfiles.rankSize
    val pk = graft.model.LangProfiles.profileSize.toLong
    // top-k by (count desc, gram asc): gramsD is gram-ascending by
    // construction, so a STABLE sort on count desc keeps the tie order
    // (index asc == gram asc)
    val order = new Array[Integer](d)
    i = 0
    while (i < d) { order(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = countsD(b.intValue) - countsD(a.intValue)
        if (c != 0) c else a.intValue - b.intValue
      }
    })
    val m = math.min(k, d)
    val nLangs = ngramLangs.length
    val dists = new Array[Long](nLangs)
    var j = 0
    while (j < m) {
      val ranks = gramRanks.get(java.lang.Long.valueOf(gramsD(order(j).intValue)))
      var p = 0
      if (ranks == null) {
        while (p < nLangs) { dists(p) += pk; p += 1 }
      } else {
        while (p < nLangs) {
          val r = ranks(p)
          dists(p) += (if (r == 0) pk else math.abs((j + 1) - r).toLong)
          p += 1
        }
      }
      j += 1
    }
    var bestIdx = -1
    var bestDist = Long.MaxValue
    var secondDist = Long.MaxValue
    var p = 0
    while (p < nLangs) {                          // ties: first (lang asc) wins
      val dist = dists(p)
      if (dist < bestDist) {
        secondDist = bestDist; bestDist = dist; bestIdx = p
      } else if (dist < secondDist) secondDist = dist
      p += 1
    }
    Array(bestIdx.toLong, bestDist, secondDist, m.toLong)
  }

  /** Per-language acceptance: dist*1000 <= m*profileSize*cutoff(lang). */
  private def ngramAccepted(bestIdx: Int, bestDist: Long, m: Long): Boolean =
    bestDist * 1000L <=
      m * graft.model.LangProfiles.profileSize * ngramCutoffs(bestIdx)

  def langIdNgram(text: UTF8String): UTF8String = {
    if (text == null) return null
    val r = classifyNgram(text)
    if (r == null) return UndLang
    val bestIdx = r(0).toInt
    if (ngramAccepted(bestIdx, r(1), r(3))) {
      UTF8String.fromString(ngramLangs(bestIdx))
    } else UndLang
  }

  /** Scored twin for calibration/auditing: (lang, best_lang, best_dist,
    * second_dist, max_dist) — `lang` is post-rejection ('und' allowed),
    * `best_lang` the raw argmin, and the three integer distances let a
    * caller derive any confidence/margin measure exactly (e.g.
    * 1 - best_dist/max_dist, or (second-best)/max_dist margin) without
    * the kernel baking in a float. */
  def langIdNgramScored(text: UTF8String): InternalRow = {
    if (text == null) return null
    val r = classifyNgram(text)
    if (r == null) {
      return InternalRow(UndLang, UndLang, 0L, 0L, 0L)
    }
    val bestIdx = r(0).toInt
    val bestLang = UTF8String.fromString(ngramLangs(bestIdx))
    val lang =
      if (ngramAccepted(bestIdx, r(1), r(3))) bestLang else UndLang
    InternalRow(lang, bestLang, r(1), r(2),
      r(3) * graft.model.LangProfiles.profileSize)
  }


  /** Charset-detection gate ([[ByteKernels.textFromBytes]]): post-
    * rejection label and normalized distance (x1000, floored — the same
    * integer the cutoff comparison uses) of a capped prefix of `s`. A
    * legacy-charset candidate decode is accepted only when it READS as
    * a language that charset encodes, per this classifier — byte-level
    * validity alone cannot separate the structurally-ambiguous pairs
    * (EUC-JP vs GB2312 share the EUC frame AND the kana rows; Big5 vs
    * GBK overlap on most two-byte space). The codepoint cap bounds
    * per-candidate scoring cost on the rare non-UTF-8 path; 512 is far
    * beyond what Cavnar–Trenkle needs. ("und", 1000) for text too short
    * to classify. */
  def langGateLabel(s: String, capCodePoints: Int): (String, Int) = {
    val nCps = s.codePointCount(0, s.length)
    val capped =
      if (nCps <= capCodePoints) s
      else s.substring(0, s.offsetByCodePoints(0, capCodePoints))
    val r = classifyNgram(UTF8String.fromString(capped))
    if (r == null) return ("und", 1000)
    val bestIdx = r(0).toInt
    val norm = (r(1) * 1000L /
      (r(3) * graft.model.LangProfiles.profileSize.toLong)).toInt
    if (ngramAccepted(bestIdx, r(1), r(3))) (ngramLangs(bestIdx), norm)
    else ("und", norm)
  }

  val langIdNgramInfo: ExpressionInfo = new ExpressionInfo(
    classOf[LangIdNgram].getName, null, "lang_id_ngram",
    "_FUNC_(text) - Cavnar-Trenkle character 1-3-gram language code over the bundled profile snapshot; 'und' for empty text or when the best distance fails the per-language rejection cutoff.",
    "", "", "", "", "", "", "built-in")
  val langIdNgramScoredInfo: ExpressionInfo = new ExpressionInfo(
    classOf[LangIdNgramScored].getName, null, "lang_id_ngram_scored",
    "_FUNC_(text) - (lang, best_lang, best_dist, second_dist, max_dist) scored twin of lang_id_ngram for calibration and margin auditing.",
    "", "", "", "", "", "", "built-in")

  /**
   * Canonical text normalization for dedup/fingerprint keys: Unicode NFC
   * (composed/decomposed spellings of the same grapheme — "Café" vs
   * "Cafe" + combining acute — become one byte sequence), then ROOT-locale
   * lowercasing, then ASCII-whitespace-run collapse and trim. Exactly the
   * preprocessing exact-dedup needs so visually identical strings can't
   * escape each other's content hash. The lower/NFC pieces match DuckDB's
   * `lower(nfc_normalize(…))` on the common plane (spec + oracle pin the
   * planted cases); locale-contextual corners (final sigma, Turkish dots)
   * are inherently library-specific — don't build contracts on them.
   */
  def normalizeText(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      nfc.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim)
  }

  /** `text_normalize(str)` — NFC + lowercase + whitespace collapse. */
  case class TextNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_normalize requires string, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "text_normalize"
    override protected def nullSafeEval(a: Any): Any =
      normalizeText(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.expressions.DocKernels.normalizeText($a);")
    override protected def withNewChildInternal(newChild: Expression): TextNormalize =
      copy(child = newChild)
  }

  val normalizeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TextNormalize].getName, null, "text_normalize",
    "_FUNC_(str) - Unicode NFC + ROOT lowercase + whitespace-run collapse + trim.",
    "", "", "", "", "", "", "built-in")

  val spanWinInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SpanWinHashes].getName, null, "span_win_hashes",
    "_FUNC_(tokens, n) - rolling polynomial hash of every n-token window: " +
      "per-token md5-derived 32-bit hash mod 2^31-1, double polynomial " +
      "(bases 131/137) packed as h1*2^31 + h2; element i is the window " +
      "starting at token i+1.",
    "", "", "", "", "", "", "built-in")
}
