package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * Measured accuracy floors for the Cavnar–Trenkle trigram language ID
 * over held-out synthetic sentences (word pools disjoint from the
 * profile seeds and from the oracle plants): 50 sentences per language,
 * each 8 everyday words in deterministic rotation. Distinct-script
 * languages must be perfect; the Latin family must clear a floor pinned
 * from the measured value (the es/pt pair is the known hard case for
 * 40-gram profiles — the floor states what the shipped snapshot actually
 * delivers, not an aspiration). Under trigram-only rank-40 profiles,
 * zh measured 0.10 here (its trigrams are too sparse in a small profile,
 * and a zh doc far from the seeds lost the all-penalty tie to ja) — the
 * mixed 1–3-gram rank-64 profiles lift every language to 1.00 on this
 * fixture, which is why the operator mixes gram sizes.
 */
class LangIdAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val pools: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "with", "from", "house", "water", "children",
      "morning", "street", "people", "good", "small", "they", "have"),
    "es" -> Seq("los", "las", "una", "con", "para", "casa", "agua", "niños",
      "calle", "gente", "bueno", "pequeño", "ellos", "tienen"),
    "fr" -> Seq("les", "des", "une", "avec", "pour", "maison", "eau",
      "enfants", "rue", "gens", "bon", "petit", "ils", "ont"),
    "de" -> Seq("die", "und", "mit", "von", "haus", "wasser", "kinder",
      "morgen", "straße", "leute", "gut", "klein", "sie", "haben"),
    "pt" -> Seq("os", "as", "uma", "com", "para", "casa", "água", "crianças",
      "rua", "pessoas", "bom", "pequeno", "eles", "têm"),
    "it" -> Seq("gli", "che", "il", "è", "più", "perché", "sono", "molto",
      "bambini", "strada", "buono", "piccolo", "loro", "hanno"),
    "ru" -> Seq("дом", "вода", "дети", "утро", "улица", "люди", "хорошо",
      "маленький", "они", "есть", "и", "с"),
    "ar" -> Seq("البيت", "الماء", "الأطفال", "الصباح", "الشارع", "الناس",
      "جيد", "صغير", "هم", "لديهم", "و", "مع"),
    "ja" -> Seq("いえは", "みずを", "こどもが", "あさに", "みちで", "ひとびとの",
      "よいです", "ちいさい", "あります", "いきます"),
    "zh" -> Seq("房子的", "水和", "孩子们", "早上在", "街道上", "人们是",
      "很好的", "小小的", "他们有", "我们的"))

  test("held-out accuracy floors: distinct scripts perfect, Latin family " +
    "clears the measured floor") {
    val rows = for {
      (lang, pool) <- pools
      j <- 0 until 50
      // CJK text is unspaced in the wild — joining with spaces would
      // plant space-adjacent trigrams no profile carries
      sep = if (lang == "ja" || lang == "zh") "" else " "
    } yield (lang, (0 until 8).map(k => pool((j * 7 + k * 3) % pool.size)).mkString(sep))
    val out = rows.toDF("lang", "text")
      .select($"lang", TextOps.langIdNgram($"text").as("p"))
      .groupBy("lang")
      .agg((sum(when($"p" === $"lang", 1).otherwise(0)) / count(lit(1))).as("acc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    info(out.toSeq.sortBy(_._1).map { case (l, a) => f"$l=$a%.2f" }.mkString(" "))
    for (l <- Seq("ru", "ar", "ja", "zh"))
      assert(out(l) == 1.0, s"$l: ${out(l)} — distinct script must be perfect")
    // the whole Latin family — including the es/pt/it romance cluster
    // that shares function words — measured 1.00 on this fixture with the
    // mixed 1–3-gram profiles; floor at 0.9 to absorb profile regeneration
    for (l <- Seq("en", "fr", "de", "es", "pt", "it"))
      assert(out(l) >= 0.9, s"$l: ${out(l)}")
  }
}
