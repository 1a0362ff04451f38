#!/usr/bin/env python3
"""Regenerate model/LangProfiles.scala — Cavnar–Trenkle character 1–3-gram
rank profiles for the n-gram language identifier
(graft.expressions.DocKernels lang_id_ngram).

Method (public knowledge): Cavnar & Trenkle, "N-Gram-Based Text
Categorization" (1994) — per-language profiles are the top-K character
n-grams of seed text ranked by frequency; classification is the
out-of-place rank distance. This snapshot mixes 1-, 2- and 3-grams in
ONE ranked list (the classic C&T formulation — unigram/bigram glue is
what separates ISOLATING scripts: zh trigrams are too sparse at small
profile sizes, and a zh document far from the seeds would otherwise
lose an all-penalty tie to ja; K = 64, tie-break: UTF-8 byte order
ascending), over text normalized exactly the
way the kernel and the DuckDB oracle normalize documents: lowercase,
whitespace runs collapsed to one space, trimmed, then padded with one
leading and one trailing space.

Seed text per language is embedded below: Article 1 of the Universal
Declaration of Human Rights (a United Nations document in the public
domain; translations from the UN's own collection) plus one short
everyday-vocabulary sentence per language to widen stopword/function-word
trigram coverage. Apostrophes are folded to spaces so profile grams never
need SQL escaping. Profiles built from a few hundred characters are
deliberately small — enough to separate scripts trivially and
stopword-heavy Latin languages reliably; for production-grade accuracy
regenerate from larger seed corpora (any public text), the algorithm and
layout are unchanged.

Usage: python3 tools/gen_lang_profiles.py > src/main/scala/graft/model/LangProfiles.scala
"""
import re
import sys

K = 64

SEEDS = {
    "en": [
        "All human beings are born free and equal in dignity and rights. "
        "They are endowed with reason and conscience and should act towards "
        "one another in a spirit of brotherhood.",
        "the house is near the river and the people walk with their dogs in "
        "the evening when the weather is good",
    ],
    "es": [
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros.",
        "la casa está cerca del río y la gente camina con sus perros por la "
        "tarde cuando hace buen tiempo en la ciudad",
    ],
    "fr": [
        "Tous les êtres humains naissent libres et égaux en dignité et en "
        "droits. Ils sont doués de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternité.",
        "la maison est près de la rivière et les gens marchent avec leurs "
        "chiens le soir quand le temps est beau dans la ville",
    ],
    "de": [
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren. "
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im "
        "Geist der Brüderlichkeit begegnen.",
        "das haus ist in der nähe des flusses und die menschen gehen am "
        "abend mit ihren hunden wenn das wetter gut ist",
    ],
    "pt": [
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razão e de consciência, devem agir uns para "
        "com os outros em espírito de fraternidade.",
        "a casa fica perto do rio e as pessoas caminham com os seus cães à "
        "tarde quando o tempo está bom na cidade",
    ],
    "it": [
        "Tutti gli esseri umani nascono liberi ed eguali in dignità e "
        "diritti. Essi sono dotati di ragione e di coscienza e devono agire "
        "gli uni verso gli altri in spirito di fratellanza.",
        "la casa è vicino al fiume e la gente cammina con i suoi cani la "
        "sera quando il tempo è bello nella città",
    ],
    "ru": [
        "Все люди рождаются свободными и равными в своем достоинстве и "
        "правах. Они наделены разумом и совестью и должны поступать в "
        "отношении друг друга в духе братства.",
        "дом стоит у реки и люди гуляют со своими собаками вечером когда "
        "погода хорошая в городе",
    ],
    "ar": [
        "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق. وقد وهبوا عقلا "
        "وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء.",
        "البيت قريب من النهر والناس يمشون مع كلابهم في المساء عندما يكون "
        "الطقس جميلا في المدينة",
    ],
    "ja": [
        "すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とについて平等である。"
        "人間は、理性と良心とを授けられており、互いに同胞の精神をもって行動しなければならない。",
        "家は川の近くにあります。人々は夕方に犬と一緒に歩きます。天気がいいときは町でよく遊びます。",
    ],
    "zh": [
        "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以兄弟关系的精神相对待。",
        "房子在河边，人们晚上带着狗散步。天气好的时候，大家在城市里玩。",
    ],
}


def normalize(s: str) -> str:
    # mirror the kernel/oracle: apostrophes folded (profile hygiene),
    # lowercase, \s runs -> ' ', trim, pad
    s = s.replace("'", " ").replace("’", " ")
    s = re.sub(r"\s+", " ", s.lower()).strip()
    return f" {s} " if s else ""


def profile(texts: list[str]) -> list[str]:
    counts: dict[str, int] = {}
    for t in texts:
        cps = list(normalize(t))  # python str iterates codepoints, like the kernel
        for n in (1, 2, 3):
            for i in range(len(cps) - n + 1):
                g = "".join(cps[i:i + n])
                counts[g] = counts.get(g, 0) + 1
    ranked = sorted(counts.items(),
                    key=lambda kv: (-kv[1], kv[0].encode("utf-8")))
    return [g for g, _ in ranked[:K]]


def main() -> int:
    print("package graft.model\n")
    print("/** GENERATED by tools/gen_lang_profiles.py — Cavnar–Trenkle")
    print(" * character 1-3-gram rank profiles (top-64, rank order) from the")
    print(" * public-domain seed text embedded in the tool. Regenerate rather")
    print(" * than editing; see the tool's docstring for method + seeds. */")
    print("object LangProfiles {\n")
    print("  /** Profile length; also the out-of-place penalty for a document")
    print("    * gram absent from a language profile. */")
    print("  val rankSize: Int = %d\n" % K)
    print("  /** (language, grams in rank order 1..rankSize). */")
    print("  val profiles: Seq[(String, Seq[String])] = Seq(")
    entries = []
    for lang in sorted(SEEDS):
        grams = profile(SEEDS[lang])
        lits = ", ".join('"' + g.replace("\\", "\\\\").replace('"', '\\"') + '"'
                         for g in grams)
        entries.append(f'    "{lang}" -> Seq({lits})')
    print(",\n".join(entries) + ")\n")
    print("""  /** The snapshot as a DuckDB-inlinable relation `(lang, g, r)`. */
  def oracleValuesSql: String = {
    val vs = for {
      (lang, grams) <- profiles
      (g, i) <- grams.zipWithIndex
    } yield s"('$lang','${g.replace("'", "''")}',${i + 1})"
    vs.mkString("(VALUES ", ", ", ") lp(lang, g, r)")
  }
}""")
    for lang in sorted(SEEDS):
        print(f"// {lang}: {len(profile(SEEDS[lang]))} grams", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
