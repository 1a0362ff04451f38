package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * Measured accuracy + rejection floors for the Cavnar–Trenkle n-gram
 * language ID over held-out fixtures (word pools and prose disjoint from
 * the profile seeds and from the oracle plants).
 *
 * Three fixture families:
 *  - word bags: 50 sentences per language (17 languages), each 8 everyday words in
 *    deterministic rotation — short-doc stress; these are ALSO the
 *    calibration set for the per-language rejection cutoffs
 *    (tools/gen_lang_profiles.py CUTOFFS = max observed + 0.05), so
 *    acceptance here pins that the shipped cutoffs match the shipped
 *    profiles — a regenerated snapshot whose cutoffs drifted from its
 *    profiles fails loudly.
 *  - prose: composed full sentences per language (the realistic case);
 *    must classify exactly, never 'und'.
 *  - rejection plants: languages NO profile knows — unseen scripts
 *    (el/th/he: near-max distance, any cutoff rejects) and unseen Latin
 *    (fi/sv/vi/sw: the hard case — they sit between the Latin profiles)
 *    — plus keyboard-mash/number/punctuation garbage. All must reject
 *    to 'und'.
 *
 * History: trigram-only rank-40 profiles measured zh=0.10 (sparse
 * trigrams lose an all-penalty tie to ja) — fixed by mixing 1–3-grams.
 * A single global rejection threshold measured as impossible: in-profile
 * CJK sits at 0.6–0.8 normalized distance while unseen-Latin impostors
 * sit at 0.4–0.6 against Latin profiles — hence PER-LANGUAGE cutoffs.
 * Indonesian false-accepted against it/tr (0.40–0.44), and Hungarian
 * 0.41 against tr once the seed corpora doubled, until each became its
 * own profile: the fix for a typological cousin is to ADD it, not to
 * tighten cutoffs that would start rejecting real text.
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
      "很好的", "小小的", "他们有", "我们的"),
    "ko" -> Seq("집은", "물을", "아이들이", "아침에", "거리에서", "사람들의",
      "좋아요", "작은", "있습니다", "갑니다"),
    "hi" -> Seq("घर", "पानी", "बच्चे", "सुबह", "सड़क", "लोग", "अच्छा",
      "छोटा", "वे", "उनके", "और", "के", "साथ"),
    "tr" -> Seq("evde", "suyu", "çocuklar", "sabahleyin", "sokakta",
      "insanların", "iyidir", "küçük", "onlar", "vardır", "ile", "bir"),
    "nl" -> Seq("het", "een", "met", "van", "huis", "water", "kinderen",
      "ochtend", "straat", "mensen", "goed", "klein", "zij", "hebben"),
    "pl" -> Seq("oni", "mają", "woda", "dzieci", "rano", "ulica", "ludzie",
      "dobry", "mały", "jest", "oraz", "przy", "domu"),
    "id" -> Seq("mereka", "dengan", "untuk", "anak", "pagi", "jalan",
      "orang", "baik", "kecil", "mempunyai", "dan", "yang", "di", "ke"),
    "hu" -> Seq("ők", "vannak", "víz", "gyerekek", "reggel", "utca",
      "emberek", "jó", "kicsi", "ház", "és", "vagy", "most", "ebben"))

  private val prose: Seq[(String, String)] = Seq(
    "en" -> "the students finished their homework before dinner and watched a movie together",
    "es" -> "los estudiantes terminaron sus deberes antes de la cena y vieron una película juntos",
    "fr" -> "les étudiants ont fini leurs devoirs avant le dîner et ont regardé un film ensemble",
    "de" -> "die schüler beendeten ihre hausaufgaben vor dem abendessen und sahen zusammen einen film",
    "pt" -> "as crianças não estão na escola porque hoje é um feriado nacional",
    "it" -> "la nostra squadra ha vinto la partita ieri sera e tutti erano molto felici",
    "ru" -> "наша команда выиграла игру вчера вечером и все были очень рады",
    "ar" -> "فاز فريقنا بالمباراة مساء أمس وكان الجميع سعداء جدا",
    "ja" -> "学生たちは夕食の前に宿題を終えて、一緒に映画を見ました。",
    "zh" -> "学生们在晚饭前完成了作业，然后一起看了电影。",
    "ko" -> "학생들은 저녁 식사 전에 숙제를 끝내고 함께 영화를 봤습니다",
    "hi" -> "हमारी टीम ने कल शाम खेल जीता और सब बहुत खुश थे",
    "tr" -> "öğrenciler akşam yemeğinden önce ödevlerini bitirdiler ve birlikte film izlediler",
    "nl" -> "ons team heeft gisteravond de wedstrijd gewonnen en iedereen was erg blij",
    "pl" -> "nasza drużyna wygrała wczoraj wieczorem mecz i wszyscy byli bardzo szczęśliwi",
    "id" -> "pagi hari kami pergi ke pasar dan membeli roti susu dan telur untuk anak anak",
    "hu" -> "reggel elmentünk a piacra és kenyeret tejet és tojást vettünk a gyerekeknek")

  private val rejectPlants: Seq[(String, String)] = Seq(
    "fi" -> "talo on lähellä jokea ja ihmiset kävelevät koiriensa kanssa illalla",
    "fi" -> "aamulla menimme torille ja ostimme leipää maitoa ja munia lapsille",
    "fi" -> "paljonko kello on nyt ja milloin tulet takaisin meidän taloomme huomenna",
    "sv" -> "huset ligger nära floden och människorna promenerar med sina hundar på kvällen",
    "sv" -> "på morgonen gick vi till torget och köpte bröd mjölk och ägg till barnen",
    "sv" -> "hur mycket är klockan nu och när kommer du tillbaka till vårt hus imorgon",
    "vi" -> "ngôi nhà ở gần con sông và mọi người đi dạo với chó của họ vào buổi tối",
    "vi" -> "buổi sáng chúng tôi đi chợ và mua bánh mì sữa và trứng cho các con",
    "vi" -> "bây giờ là mấy giờ và khi nào bạn sẽ quay lại nhà chúng tôi vào ngày mai",
    "sw" -> "nyumba iko karibu na mto na watu hutembea na mbwa wao jioni",
    "sw" -> "asubuhi tulikwenda sokoni na kununua mkate maziwa na mayai kwa watoto",
    "sw" -> "sasa ni saa ngapi na utarudi lini nyumbani kwetu kesho",
    "el" -> "το σπίτι είναι κοντά στο ποτάμι και οι άνθρωποι περπατούν με τα σκυλιά τους το βράδυ",
    "el" -> "το πρωί πήγαμε στην αγορά και αγοράσαμε ψωμί γάλα και αυγά για τα παιδιά",
    "th" -> "บ้านอยู่ใกล้แม่น้ำและผู้คนเดินเล่นกับสุนัขของพวกเขาในตอนเย็น",
    "th" -> "ตอนเช้าเราไปตลาดและซื้อขนมปังนมและไข่ให้เด็กๆ",
    "he" -> "הבית נמצא ליד הנהר ואנשים הולכים עם הכלבים שלהם בערב",
    "he" -> "בבוקר הלכנו לשוק וקנינו לחם חלב וביצים לילדים")

  private val garbage: Seq[String] = Seq(
    "xqzv wkjq pfft zzzz qqq xxkj vvwp", "1234 5678 9012 3456",
    ">>> ??? !!! ### $$$ %%% ^^^", "aaaa bbbb cccc dddd eeee ffff",
    "zxcvbnm asdfghjkl qwertyuiop")

  test("held-out word bags: every language perfect, nothing rejected — " +
    "cutoffs match profiles") {
    val rows = for {
      (lang, pool) <- pools
      j <- 0 until 50
      // CJK text is unspaced in the wild — joining with spaces would
      // plant space-adjacent grams no profile carries
      sep = if (lang == "ja" || lang == "zh") "" else " "
    } yield (lang, (0 until 8).map(k => pool((j * 7 + k * 3) % pool.size)).mkString(sep))
    val out = rows.toDF("lang", "text")
      .select($"lang", TextOps.langIdNgram($"text").as("p"))
      .groupBy("lang")
      .agg((sum(when($"p" === $"lang", 1).otherwise(0)) / count(lit(1))).as("acc"),
        sum(when($"p" === "und", 1).otherwise(0)).as("rejected"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    info(out.toSeq.sortBy(_._1).map { case (l, (a, _)) => f"$l=$a%.2f" }.mkString(" "))
    // distinct scripts have no in-family confusion surface — must be 1.0
    for (l <- Seq("ru", "ar", "ja", "zh", "ko", "hi"))
      assert(out(l)._1 == 1.0, s"$l: ${out(l)._1} — distinct script must be perfect")
    // the whole Latin family — including the es/pt/it romance cluster and
    // the new tr/nl/pl/id — measured 1.00 on this fixture with the
    // asymmetric 64/512 profiles; floor at 0.9 absorbs regeneration
    for (l <- Seq("en", "fr", "de", "es", "pt", "it", "tr", "nl", "pl", "id", "hu"))
      assert(out(l)._1 >= 0.9, s"$l: ${out(l)._1}")
    // rejection must not eat the calibration fixture itself
    for ((l, (_, rej)) <- out) assert(rej == 0L, s"$l rejected $rej word bags")
  }

  test("held-out prose classifies exactly and is never rejected") {
    val out = prose.toDF("lang", "text")
      .select($"lang", TextOps.langIdNgram($"text").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    for ((want, got) <- out) assert(got == want, s"prose $want -> $got")
  }

  test("out-of-profile languages reject to 'und': unseen scripts perfectly, " +
    "unseen Latin at the measured 100%") {
    val out = rejectPlants.toDF("lang", "text")
      .select($"lang", TextOps.langIdNgram($"text").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = out.groupBy(_._1).view.mapValues(v =>
      v.count(_._2 == "und").toDouble / v.size).toMap
    info(byLang.toSeq.sortBy(_._1).map { case (l, a) => f"$l=$a%.2f" }.mkString(" "))
    // unseen scripts: every gram misses every profile — any cutoff rejects
    for (l <- Seq("el", "th", "he"))
      assert(byLang(l) == 1.0, s"$l: ${byLang(l)} — unseen script must always reject")
    // unseen Latin measured 1.00 at this snapshot; floor at 0.9 absorbs
    // profile regeneration (these sit between the Latin profiles — the
    // genuinely hard rejection case per-language cutoffs exist for)
    for (l <- Seq("fi", "sv", "vi", "sw"))
      assert(byLang(l) >= 0.9, s"$l: ${byLang(l)}")
  }

  test("garbage (keyboard mash, digits, punctuation) always rejects") {
    val out = garbage.toDF("text")
      .select(TextOps.langIdNgram($"text").as("p"))
      .as[String].collect()
    assert(out.forall(_ == "und"), s"garbage must reject: ${out.mkString(",")}")
  }

  test("scored twin agrees with the label kernel and its distances are " +
    "consistent") {
    val texts = prose.map(_._2) ++ garbage ++ rejectPlants.map(_._2)
    val rows = texts.toDF("text")
      .select(TextOps.langIdNgram($"text").as("p"),
        TextOps.langIdNgramScored($"text").as("s"))
      .select($"p", $"s.lang", $"s.best_lang", $"s.best_dist",
        $"s.second_dist", $"s.max_dist")
      .collect()
    for (r <- rows) {
      assert(r.getString(0) == r.getString(1), "labels must agree")
      val (best, second, max) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(best <= second, s"best $best > second $second")
      assert(best <= max, s"best $best > max $max")
      // the raw argmin is a real language even when rejected
      assert(r.getString(2) != "und" || max == 0L)
    }
  }
}
