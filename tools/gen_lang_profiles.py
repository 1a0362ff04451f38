#!/usr/bin/env python3
"""Regenerate model/LangProfiles.scala — Cavnar–Trenkle character 1–3-gram
rank profiles for the n-gram language identifier
(graft.expressions.DocKernels lang_id_ngram).

Method (public knowledge): Cavnar & Trenkle, "N-Gram-Based Text
Categorization" (1994) — per-language profiles are the top-P character
n-grams of seed text ranked by frequency; a document is classified by
the out-of-place rank distance of ITS top-D grams against each profile
(the classic C&T shape is asymmetric: long language profiles, short
document profiles — D=64, P=768 here; absent-gram penalty = P;
tie-break everywhere: UTF-8 byte order ascending). Gram sizes MIX 1-,
2- and 3-grams in ONE ranked list — unigram/bigram glue is what
separates ISOLATING scripts: zh trigrams are too sparse at small
profile sizes, and a zh document far from the seeds would otherwise
lose an all-penalty tie to ja. Text normalizes exactly the way the
kernel and the DuckDB oracle normalize documents: lowercase,
whitespace runs collapsed to one space, trimmed, then padded with one
leading and one trailing space.

Seed text per language is embedded below: Article 1 of the Universal
Declaration of Human Rights (a United Nations document in the public
domain; translations from the UN's own collection) plus several
everyday-vocabulary sentences per language (original text written for
this tool — market/time/family/question/work themes chosen to
concentrate function words, the grams that discriminate Latin-script
languages). Apostrophes are folded to spaces so profile grams never
need SQL escaping. For even higher accuracy regenerate from larger
seed corpora (any public text); the algorithm and layout are
unchanged.

The snapshot also carries PER-LANGUAGE rejection cutoffs: the best
language's distance, normalized by the worst case (every doc gram
absent = m·P), must stay at or below cutoff(lang)/1000 or the document
is labeled 'und' — open-domain crawl text is mostly languages NO
bundled profile knows, and a confident wrong label is worse than an
honest unknown. Cutoffs are per-language because the normalized
distance scale is script-dependent (CJK documents legitimately sit at
0.6-0.8 against their own profile — their gram space is huge — while
Latin in-language text sits at 0.2-0.5). Each cutoff = the max
distance observed over that language's held-out calibration fixtures
(word-bag rotations + composed prose + oracle plants, replayed by
tools/calibrate_langid.py and pinned by LangIdAccuracySpec) + 0.05
margin. Measured outcome at this snapshot (30 languages, P=768): 0
in-profile misclassifications or rejections across 1500 word bags + 30
prose + 30 plants; all out-of-profile plants (sw lt et ca ka hy) and
6/6 garbage plants reject to 'und'. Honest limit: an unseen language
typologically close to a bundled one may still false-accept —
Indonesian scored 0.40-0.44 against it/tr, Hungarian 0.41 against tr,
Icelandic 0.41-0.44 against no, and Bulgarian 0.32 against ru, each
fixed by ADDING the language as its own profile (a handful of seed
sentences in this file); the growth path for any future cousin (e.g.
Faroese near no/is, Macedonian near bg) is the same.

Usage: python3 tools/gen_lang_profiles.py > src/main/scala/graft/model/LangProfiles.scala
"""
import re
import sys

D = 64    # document profile length (top-D doc grams compared)
P = 768   # language profile length; also the absent-gram penalty

# Per-language rejection cutoffs x1000 (see module docstring). A doc
# classified as lang L is accepted iff bestDist*1000 <= m*P*CUTOFFS[L].
# Calibrated by tools/calibrate_langid.py (max held-out fixture distance
# + 0.05 margin); re-run it after ANY seed change.
CUTOFFS = {
    # Re-pinned at the batch-3 (round 16, 40-language) snapshot: every
    # value = tools/calibrate_langid.py held-out fixture max + 0.05.
    # History: batch 2 added sv fi da no cs ro uk el he th vi + the
    # measured cousins is (0.41-0.44 vs no) and bg (0.32 vs ru); batch 3
    # graduates sw lt et ca from the rejection set and adds hr sr sk sl
    # lv fa — each cousin added rather than thresholds tightened (the
    # r14/15 id/hu growth path).
    "ar": 469, "bg": 324, "ca": 245, "cs": 448, "da": 298, "de": 213,
    "el": 313, "en": 269, "es": 298, "et": 320, "fa": 367, "fi": 276,
    "fr": 281, "he": 424, "hi": 448, "hr": 315, "hu": 529, "id": 268,
    "is": 405, "it": 324, "ja": 759, "ko": 729, "lt": 291, "lv": 318,
    "nl": 288, "no": 450, "pl": 423, "pt": 332, "ro": 326, "ru": 411,
    "sk": 351, "sl": 358, "sr": 375, "sv": 234, "sw": 263, "th": 508,
    "tr": 447, "uk": 387, "vi": 341, "zh": 856,
    # batch 4 (r17, calibrated at the 50-language snapshot): Indic + SEA
    "bn": 290, "ta": 316, "te": 365, "ml": 364, "mr": 386,
    "gu": 395, "kn": 384, "pa": 442, "ur": 415, "tl": 195,
    # batch 5 (r17, calibrated at the 53-language snapshot)
    "ka": 422, "hy": 417, "ne": 385,
    # batch 6 (r18, calibrated at the 58-language snapshot): the five
    # unique-script graduates — Ethiopic, Khmer, Lao, Sinhala, Myanmar.
    # The new unseen-script stressors (Tibetan, Thaana Dhivehi) reject
    # at 0.984 normalized — no shared script grams anywhere.
    "am": 570, "km": 448, "lo": 440, "si": 364, "my": 314,
}

SEEDS = {
    "en": [
        "All human beings are born free and equal in dignity and rights. "
        "They are endowed with reason and conscience and should act towards "
        "one another in a spirit of brotherhood.",
        "the house is near the river and the people walk with their dogs in "
        "the evening when the weather is good",
        "we went to the market in the morning and bought bread milk and "
        "eggs for the children",
        "what time is it now and when will you come back to our house "
        "tomorrow",
        "she said that the book was on the table but i could not find it "
        "anywhere in the room",
            "my brother works in the city every day and comes home late at night",
        "the weather was cold yesterday so we stayed at home and read books",
        "there are many old trees in the garden behind the school",
            "we traveled by train to the coast last summer and stayed in a small hotel by the sea",
        "could you please tell me where the nearest station is and how much a ticket costs",
        "my sister is learning to cook and tonight she made soup with vegetables from the garden",
        "the doctor told him to rest for a few days and drink plenty of water",
        "there were about two hundred people at the meeting and many of them asked questions",
        "i would like to buy three kilos of apples and half a kilo of cheese please",
        "the forest behind the village is full of birds in the spring",
        "in my opinion the new library is much better than the old one because it is open every day",
    ],
    "es": [
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros.",
        "la casa está cerca del río y la gente camina con sus perros por la "
        "tarde cuando hace buen tiempo en la ciudad",
        "fuimos al mercado por la mañana y compramos pan leche y huevos "
        "para los niños",
        "qué hora es ahora y cuándo vas a volver a nuestra casa mañana",
        "ella dijo que el libro estaba sobre la mesa pero no pude "
        "encontrarlo en ninguna parte",
            "mi hermano trabaja en la ciudad todos los días y vuelve a casa tarde por la noche",
        "ayer hacía frío así que nos quedamos en casa y leímos libros",
        "hay muchos árboles viejos en el jardín detrás de la escuela",
            "viajamos en tren a la costa el verano pasado y nos quedamos en un pequeño hotel junto al mar",
        "podría decirme dónde está la estación más cercana y cuánto cuesta un billete",
        "mi hermana está aprendiendo a cocinar y esta noche hizo sopa con verduras del huerto",
        "el médico le dijo que descansara unos días y bebiera mucha agua",
        "había unas doscientas personas en la reunión y muchas de ellas hicieron preguntas",
        "quisiera comprar tres kilos de manzanas y medio kilo de queso por favor",
        "el bosque detrás del pueblo está lleno de pájaros en primavera",
        "en mi opinión la nueva biblioteca es mucho mejor que la antigua porque abre todos los días",
    ],
    "fr": [
        "Tous les êtres humains naissent libres et égaux en dignité et en "
        "droits. Ils sont doués de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternité.",
        "la maison est près de la rivière et les gens marchent avec leurs "
        "chiens le soir quand le temps est beau dans la ville",
        "nous sommes allés au marché le matin et nous avons acheté du pain "
        "du lait et des œufs pour les enfants",
        "quelle heure est il maintenant et quand vas tu revenir à notre "
        "maison demain",
        "elle a dit que le livre était sur la table mais je ne pouvais pas "
        "le trouver dans la chambre",
            "mon frère travaille dans la ville tous les jours et rentre tard le soir",
        "hier il faisait froid alors nous sommes restés à la maison et nous avons lu des livres",
        "il y a beaucoup de vieux arbres dans le jardin derrière l école",
            "nous avons voyagé en train jusqu à la côte l été dernier et nous avons dormi dans un petit hôtel au bord de la mer",
        "pourriez vous me dire où se trouve la gare la plus proche et combien coûte un billet",
        "ma sœur apprend à cuisiner et ce soir elle a fait une soupe avec des légumes du jardin",
        "le médecin lui a dit de se reposer quelques jours et de boire beaucoup d eau",
        "il y avait environ deux cents personnes à la réunion et beaucoup ont posé des questions",
        "je voudrais acheter trois kilos de pommes et un demi kilo de fromage s il vous plaît",
        "la forêt derrière le village est pleine d oiseaux au printemps",
        "à mon avis la nouvelle bibliothèque est bien meilleure que l ancienne parce qu elle est ouverte tous les jours",
    ],
    "de": [
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren. "
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im "
        "Geist der Brüderlichkeit begegnen.",
        "das haus ist in der nähe des flusses und die menschen gehen am "
        "abend mit ihren hunden wenn das wetter gut ist",
        "wir gingen am morgen auf den markt und kauften brot milch und "
        "eier für die kinder",
        "wie spät ist es jetzt und wann kommst du morgen zu unserem haus "
        "zurück",
        "sie sagte dass das buch auf dem tisch war aber ich konnte es "
        "nirgendwo finden",
            "mein bruder arbeitet jeden tag in der stadt und kommt spät nach hause",
        "gestern war es kalt also blieben wir zu hause und lasen bücher",
        "es gibt viele alte bäume im garten hinter der schule",
            "wir sind letzten sommer mit dem zug an die küste gefahren und haben in einem kleinen hotel am meer gewohnt",
        "können sie mir bitte sagen wo der nächste bahnhof ist und wie viel eine fahrkarte kostet",
        "meine schwester lernt kochen und heute abend hat sie eine suppe mit gemüse aus dem garten gemacht",
        "der arzt sagte ihm er solle sich ein paar tage ausruhen und viel wasser trinken",
        "bei der versammlung waren ungefähr zweihundert leute und viele von ihnen stellten fragen",
        "ich möchte bitte drei kilo äpfel und ein halbes kilo käse kaufen",
        "der wald hinter dem dorf ist im frühling voller vögel",
        "meiner meinung nach ist die neue bibliothek viel besser als die alte weil sie jeden tag geöffnet ist",
    ],
    "pt": [
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razão e de consciência, devem agir uns para "
        "com os outros em espírito de fraternidade.",
        "a casa fica perto do rio e as pessoas caminham com os seus cães à "
        "tarde quando o tempo está bom na cidade",
        "fomos ao mercado de manhã e compramos pão leite e ovos para as "
        "crianças",
        "que horas são agora e quando você vai voltar para a nossa casa "
        "amanhã",
        "ela disse que o livro estava sobre a mesa mas eu não consegui "
        "encontrá lo em lugar nenhum",
            "meu irmão trabalha na cidade todos os dias e volta para casa tarde da noite",
        "ontem estava frio então ficamos em casa e lemos livros",
        "há muitas árvores velhas no jardim atrás da escola",
            "viajamos de comboio até à costa no verão passado e ficámos num pequeno hotel à beira mar",
        "pode dizer me onde fica a estação mais próxima e quanto custa um bilhete",
        "a minha irmã está a aprender a cozinhar e esta noite fez uma sopa com legumes da horta",
        "o médico disse lhe para descansar alguns dias e beber muita água",
        "havia cerca de duzentas pessoas na reunião e muitas delas fizeram perguntas",
        "queria comprar três quilos de maçãs e meio quilo de queijo por favor",
        "a floresta atrás da aldeia está cheia de pássaros na primavera",
        "na minha opinião a biblioteca nova é muito melhor do que a antiga porque está aberta todos os dias",
    ],
    "it": [
        "Tutti gli esseri umani nascono liberi ed eguali in dignità e "
        "diritti. Essi sono dotati di ragione e di coscienza e devono agire "
        "gli uni verso gli altri in spirito di fratellanza.",
        "la casa è vicino al fiume e la gente cammina con i suoi cani la "
        "sera quando il tempo è bello nella città",
        "siamo andati al mercato la mattina e abbiamo comprato pane latte "
        "e uova per i bambini",
        "che ora è adesso e quando tornerai a casa nostra domani",
        "lei ha detto che il libro era sul tavolo ma non sono riuscito a "
        "trovarlo da nessuna parte",
            "mio fratello lavora in città ogni giorno e torna a casa tardi la sera",
        "ieri faceva freddo così siamo rimasti a casa e abbiamo letto dei libri",
        "ci sono molti alberi vecchi nel giardino dietro la scuola",
            "l estate scorsa abbiamo viaggiato in treno fino alla costa e siamo stati in un piccolo albergo sul mare",
        "può dirmi dove si trova la stazione più vicina e quanto costa un biglietto",
        "mia sorella sta imparando a cucinare e stasera ha fatto una zuppa con le verdure dell orto",
        "il dottore gli ha detto di riposare qualche giorno e di bere molta acqua",
        "alla riunione c erano circa duecento persone e molte di loro hanno fatto domande",
        "vorrei comprare tre chili di mele e mezzo chilo di formaggio per favore",
        "il bosco dietro il paese è pieno di uccelli in primavera",
        "secondo me la nuova biblioteca è molto meglio della vecchia perché è aperta tutti i giorni",
    ],
    "ru": [
        "Все люди рождаются свободными и равными в своем достоинстве и "
        "правах. Они наделены разумом и совестью и должны поступать в "
        "отношении друг друга в духе братства.",
        "дом стоит у реки и люди гуляют со своими собаками вечером когда "
        "погода хорошая в городе",
        "утром мы пошли на рынок и купили хлеб молоко и яйца для детей",
        "который час сейчас и когда ты вернёшься к нам домой завтра",
        "она сказала что книга была на столе но я не смог её нигде найти",
            "мой брат работает в городе каждый день и поздно возвращается домой",
        "вчера было холодно поэтому мы остались дома и читали книги",
        "в саду за школой растёт много старых деревьев",
            "прошлым летом мы ехали на поезде к морю и жили в маленькой гостинице на берегу",
        "скажите пожалуйста где находится ближайшая станция и сколько стоит билет",
        "моя сестра учится готовить и сегодня вечером она сварила суп с овощами из огорода",
        "врач сказал ему отдохнуть несколько дней и пить больше воды",
        "на собрании было около двухсот человек и многие из них задавали вопросы",
        "я хотел бы купить три килограмма яблок и полкило сыра пожалуйста",
        "лес за деревней весной полон птиц",
        "по моему мнению новая библиотека гораздо лучше старой потому что она открыта каждый день",
    ],
    "ar": [
        "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق. وقد وهبوا عقلا "
        "وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء.",
        "البيت قريب من النهر والناس يمشون مع كلابهم في المساء عندما يكون "
        "الطقس جميلا في المدينة",
        "ذهبنا إلى السوق في الصباح واشترينا الخبز والحليب والبيض للأطفال",
        "كم الساعة الآن ومتى ستعود إلى بيتنا غدا",
        "قالت إن الكتاب كان على الطاولة لكنني لم أستطع أن أجده في أي مكان",
            "أخي يعمل في المدينة كل يوم ويعود إلى البيت متأخرا في الليل",
        "كان الطقس باردا أمس فبقينا في البيت وقرأنا الكتب",
        "هناك أشجار قديمة كثيرة في الحديقة خلف المدرسة",
            "سافرنا بالقطار إلى الساحل في الصيف الماضي وأقمنا في فندق صغير قرب البحر",
        "هل يمكنك أن تخبرني أين أقرب محطة وكم تكلف التذكرة",
        "أختي تتعلم الطبخ وهذا المساء أعدت حساء بالخضار من الحديقة",
        "قال الطبيب له أن يستريح بضعة أيام ويشرب كثيرا من الماء",
        "كان في الاجتماع نحو مئتي شخص وطرح كثير منهم أسئلة",
        "أريد أن أشتري ثلاثة كيلوغرامات من التفاح ونصف كيلو من الجبن من فضلك",
        "الغابة خلف القرية مليئة بالطيور في الربيع",
        "في رأيي المكتبة الجديدة أفضل بكثير من القديمة لأنها مفتوحة كل يوم",
    ],
    "ja": [
        "すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とについて平等である。"
        "人間は、理性と良心とを授けられており、互いに同胞の精神をもって行動しなければならない。",
        "家は川の近くにあります。人々は夕方に犬と一緒に歩きます。天気がいいときは町でよく遊びます。",
        "朝、市場に行って、子供たちのためにパンと牛乳と卵を買いました。",
        "今何時ですか。明日いつ私たちの家に戻ってきますか。",
        "彼女は本がテーブルの上にあると言いましたが、どこにも見つかりませんでした。",
            "兄は毎日町で働いていて、夜遅く家に帰ってきます。",
        "昨日は寒かったので、家にいて本を読みました。",
        "学校の後ろの庭にはたくさんの古い木があります。",
            "電車で駅まで行って、それから歩いて会社に行きます。",
        "私の母は毎週日曜日に美味しい料理を作ってくれます。",
        "日本の夏はとても暑いですが、冬は雪がたくさん降ります。",
            "去年の夏、電車で海岸まで旅行して、海の近くの小さなホテルに泊まりました。",
        "すみません、一番近い駅はどこですか。切符はいくらですか。",
        "妹は料理を習っていて、今晩は庭の野菜でスープを作りました。",
        "医者は彼に数日間休んで、水をたくさん飲むように言いました。",
        "会議にはおよそ二百人が集まり、多くの人が質問をしました。",
        "りんごを三キロとチーズを半キロください。",
        "村の後ろの森は春になると鳥でいっぱいです。",
        "私の意見では、新しい図書館は毎日開いているので、古いものよりずっと良いと思います。",
    ],
    "zh": [
        "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以兄弟关系的精神相对待。",
        "房子在河边，人们晚上带着狗散步。天气好的时候，大家在城市里玩。",
        "早上我们去市场买了面包、牛奶和鸡蛋给孩子们。",
        "现在几点了？你明天什么时候回我们家？",
        "她说书在桌子上，但是我到处都找不到。",
            "哥哥每天在城里工作，晚上很晚才回家。",
        "昨天很冷，所以我们留在家里看书。",
        "学校后面的花园里有很多老树。",
            "我每天坐地铁去上班，路上大约需要半个小时。",
        "我妈妈每个星期天都会做很好吃的菜。",
        "夏天天气很热，冬天下很多雪。",
            "去年夏天我们坐火车去海边旅行，住在海边的一家小旅馆里。",
        "请问最近的车站在哪里，一张票多少钱？",
        "妹妹正在学做饭，今晚她用园子里的蔬菜做了汤。",
        "医生让他休息几天，多喝水。",
        "会议上大约有两百人，很多人提了问题。",
        "我想买三公斤苹果和半公斤奶酪，谢谢。",
        "村子后面的森林春天到处都是鸟。",
        "我认为新图书馆比旧的好得多，因为它每天都开门。",
    ],
    "ko": [
        "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다. "
        "인간은 천부적으로 이성과 양심을 부여받았으며 서로 형제애의 정신으로 "
        "행동하여야 한다.",
        "집은 강 근처에 있고 사람들은 저녁에 개와 함께 걷습니다",
        "아침에 우리는 시장에 가서 아이들을 위해 빵과 우유와 계란을 샀습니다",
        "지금 몇 시입니까 내일 언제 우리 집에 돌아올 것입니까",
        "그녀는 책이 테이블 위에 있다고 말했지만 나는 그것을 찾을 수 없었습니다",
            "형은 매일 도시에서 일하고 밤 늦게 집에 돌아옵니다",
        "어제는 추웠기 때문에 우리는 집에 있으면서 책을 읽었습니다",
        "학교 뒤 정원에는 오래된 나무가 많이 있습니다",
            "지하철을 타고 회사에 가는데 삼십 분 정도 걸립니다",
        "어머니는 일요일마다 맛있는 음식을 만들어 주십니다",
        "여름에는 날씨가 덥고 겨울에는 눈이 많이 옵니다",
            "작년 여름에 우리는 기차를 타고 바닷가로 여행을 가서 바다 근처의 작은 호텔에 묵었습니다",
        "실례지만 가장 가까운 역이 어디에 있는지 그리고 표가 얼마인지 알려 주시겠습니까",
        "여동생은 요리를 배우고 있는데 오늘 저녁에는 정원의 채소로 수프를 만들었습니다",
        "의사는 그에게 며칠 쉬고 물을 많이 마시라고 말했습니다",
        "회의에는 약 이백 명이 모였고 많은 사람들이 질문을 했습니다",
        "사과 삼 킬로와 치즈 반 킬로를 사고 싶습니다",
        "마을 뒤의 숲은 봄에 새들로 가득합니다",
        "제 생각에는 새 도서관이 매일 열기 때문에 옛날 것보다 훨씬 좋습니다",
    ],
    "hi": [
        "सभी मनुष्यों को गौरव और अधिकारों के मामले में जन्मजात स्वतन्त्रता और "
        "समानता प्राप्त है। उन्हें बुद्धि और अन्तरात्मा की देन प्राप्त है और "
        "परस्पर उन्हें भाईचारे के भाव से बर्ताव करना चाहिए।",
        "घर नदी के पास है और लोग शाम को अपने कुत्तों के साथ चलते हैं",
        "सुबह हम बाजार गए और बच्चों के लिए रोटी दूध और अंडे खरीदे",
        "अभी क्या समय हुआ है और तुम कल हमारे घर कब वापस आओगे",
        "उसने कहा कि किताब मेज पर थी लेकिन मुझे वह कहीं नहीं मिली",
            "मेरा भाई हर दिन शहर में काम करता है और रात को देर से घर आता है",
        "कल ठंड थी इसलिए हम घर पर रहे और किताबें पढ़ीं",
        "स्कूल के पीछे बगीचे में बहुत सारे पुराने पेड़ हैं",
            "पिछली गर्मियों में हम रेलगाड़ी से समुद्र के किनारे गए और समुद्र के पास एक छोटे होटल में रहे",
        "क्या आप मुझे बता सकते हैं कि सबसे पास का स्टेशन कहाँ है और टिकट कितने का है",
        "मेरी बहन खाना बनाना सीख रही है और आज शाम उसने बगीचे की सब्जियों से सूप बनाया",
        "डॉक्टर ने उससे कहा कि कुछ दिन आराम करो और खूब पानी पियो",
        "बैठक में लगभग दो सौ लोग थे और उनमें से कई ने सवाल पूछे",
        "मुझे तीन किलो सेब और आधा किलो पनीर चाहिए",
        "गाँव के पीछे का जंगल वसंत में पक्षियों से भरा होता है",
        "मेरी राय में नई लाइब्रेरी पुरानी से बहुत अच्छी है क्योंकि वह हर दिन खुली रहती है",
    ],
    "tr": [
        "Bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar. "
        "Akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik "
        "zihniyeti ile hareket etmelidirler.",
        "ev nehrin yakınında ve insanlar akşam köpekleriyle yürüyorlar",
        "sabah pazara gittik ve çocuklar için ekmek süt ve yumurta aldık",
        "şimdi saat kaç ve yarın bizim eve ne zaman geri döneceksin",
        "kitabın masanın üzerinde olduğunu söyledi ama onu hiçbir yerde "
        "bulamadım",
            "kardeşim her gün şehirde çalışıyor ve gece eve geç dönüyor",
        "dün hava soğuktu bu yüzden evde kaldık ve kitap okuduk",
        "okulun arkasındaki bahçede birçok yaşlı ağaç var",
            "geçen yaz trenle sahile gittik ve denizin yakınında küçük bir otelde kaldık",
        "en yakın istasyonun nerede olduğunu ve biletin ne kadar olduğunu söyleyebilir misiniz",
        "kız kardeşim yemek yapmayı öğreniyor ve bu akşam bahçedeki sebzelerle çorba yaptı",
        "doktor ona birkaç gün dinlenmesini ve bol su içmesini söyledi",
        "toplantıda yaklaşık iki yüz kişi vardı ve birçoğu soru sordu",
        "üç kilo elma ve yarım kilo peynir almak istiyorum lütfen",
        "köyün arkasındaki orman ilkbaharda kuşlarla dolu",
        "bence yeni kütüphane eskisinden çok daha iyi çünkü her gün açık",
    ],
    "nl": [
        "Alle mensen worden vrij en gelijk in waardigheid en rechten "
        "geboren. Zij zijn begiftigd met verstand en geweten, en behoren "
        "zich jegens elkander in een geest van broederschap te gedragen.",
        "het huis staat bij de rivier en de mensen lopen s avonds met hun "
        "honden als het weer goed is",
        "s ochtends gingen we naar de markt en kochten brood melk en "
        "eieren voor de kinderen",
        "hoe laat is het nu en wanneer kom je morgen terug naar ons huis",
        "ze zei dat het boek op de tafel lag maar ik kon het nergens "
        "vinden",
            "mijn broer werkt elke dag in de stad en komt s avonds laat thuis",
        "gisteren was het koud dus bleven we thuis en lazen we boeken",
        "er staan veel oude bomen in de tuin achter de school",
            "vorige zomer reisden we met de trein naar de kust en verbleven we in een klein hotel aan zee",
        "kunt u mij vertellen waar het dichtstbijzijnde station is en hoeveel een kaartje kost",
        "mijn zus leert koken en vanavond maakte ze soep met groenten uit de tuin",
        "de dokter zei dat hij een paar dagen moest rusten en veel water moest drinken",
        "er waren ongeveer tweehonderd mensen op de vergadering en velen van hen stelden vragen",
        "ik wil graag drie kilo appels en een half kilo kaas kopen alstublieft",
        "het bos achter het dorp zit in de lente vol vogels",
        "naar mijn mening is de nieuwe bibliotheek veel beter dan de oude omdat ze elke dag open is",
    ],
    "pl": [
        "Wszyscy ludzie rodzą się wolni i równi pod względem swej godności "
        "i swych praw. Są oni obdarzeni rozumem i sumieniem i powinni "
        "postępować wobec innych w duchu braterstwa.",
        "dom stoi nad rzeką a ludzie wieczorem chodzą ze swoimi psami",
        "rano poszliśmy na targ i kupiliśmy chleb mleko i jajka dla dzieci",
        "która jest teraz godzina i kiedy jutro wrócisz do naszego domu",
        "powiedziała że książka była na stole ale nigdzie nie mogłem jej "
        "znaleźć",
            "mój brat pracuje codziennie w mieście i wraca do domu późno w nocy",
        "wczoraj było zimno więc zostaliśmy w domu i czytaliśmy książki",
        "za szkołą w ogrodzie rośnie wiele starych drzew",
            "zeszłego lata pojechaliśmy pociągiem nad morze i zatrzymaliśmy się w małym hotelu nad brzegiem",
        "czy może mi pan powiedzieć gdzie jest najbliższa stacja i ile kosztuje bilet",
        "moja siostra uczy się gotować i dziś wieczorem zrobiła zupę z warzyw z ogrodu",
        "lekarz powiedział mu żeby odpoczął kilka dni i pił dużo wody",
        "na zebraniu było około dwustu osób i wiele z nich zadawało pytania",
        "chciałbym kupić trzy kilogramy jabłek i pół kilograma sera proszę",
        "las za wsią wiosną jest pełen ptaków",
        "moim zdaniem nowa biblioteka jest o wiele lepsza od starej bo jest otwarta codziennie",
    ],

    "id": [
        "Semua orang dilahirkan merdeka dan mempunyai martabat dan hak hak "
        "yang sama. Mereka dikaruniai akal dan hati nurani dan hendaknya "
        "bergaul satu sama lain dalam semangat persaudaraan.",
        "rumah kami tidak jauh dari pasar dan setiap pagi kami membeli "
        "sayur dan buah di sana",
        "berapa harga buku ini dan di mana saya bisa membayar",
        "dia berkata bahwa kunci itu ada di dalam tas tetapi saya tidak "
        "dapat menemukannya",
        "kakak saya bekerja di kota setiap hari dan pulang ke rumah larut "
        "malam",
        "kemarin cuaca sangat dingin jadi kami tinggal di rumah dan "
        "membaca buku",
            "musim panas lalu kami naik kereta ke pantai dan menginap di hotel kecil dekat laut",
        "bisakah anda memberi tahu saya di mana stasiun terdekat dan berapa harga tiketnya",
        "adik perempuan saya sedang belajar memasak dan malam ini dia membuat sup dengan sayuran dari kebun",
        "dokter menyuruhnya beristirahat beberapa hari dan minum banyak air",
        "ada sekitar dua ratus orang di rapat itu dan banyak dari mereka mengajukan pertanyaan",
        "saya ingin membeli tiga kilo apel dan setengah kilo keju",
        "hutan di belakang desa penuh dengan burung pada musim semi",
        "menurut saya perpustakaan baru jauh lebih baik daripada yang lama karena buka setiap hari",
    ],

    "hu": [
        "Minden emberi lény szabadon születik és egyenlő méltósága és joga "
        "van. Az emberek ésszel és lelkiismerettel bírván egymással szemben "
        "testvéri szellemben kell hogy viseltessenek.",
        "délelőtt bevásároltunk a boltban sajtot gyümölcsöt és zöldséget "
        "vettünk",
        "a gyerekek az iskolában tanulnak és délután a kertben játszanak",
        "mondd meg kérlek hány órakor indul a vonat és mennyibe kerül a "
        "jegy",
        "tegnap este hideg volt ezért otthon maradtunk és könyvet olvastunk",
        "a bátyám minden nap a városban dolgozik és késő este ér haza",
        "az orvos azt mondta neki hogy pihenjen néhány napot és igyon sok "
        "vizet",
        "a falu mögötti erdő tavasszal tele van madarakkal",
        "szerintem az új könyvtár sokkal jobb mint a régi mert minden nap "
        "nyitva van",
    ],

    # ---- batch 2 (round 16): next crawl-frequency tier -------------------
    "sv": [
        "Alla människor är födda fria och lika i värde och rättigheter. De "
        "har utrustats med förnuft och samvete och bör handla gentemot "
        "varandra i en anda av gemenskap.",
        "huset ligger nära floden och människorna går ut med sina hundar "
        "på kvällen när vädret är bra",
        "på morgonen gick vi till torget och köpte bröd mjölk och ägg "
        "till barnen",
        "vad är klockan nu och när kommer du tillbaka till vårt hus imorgon",
        "hon sa att boken låg på bordet men jag kunde inte hitta den "
        "någonstans i rummet",
        "min bror arbetar i staden varje dag och kommer hem sent på kvällen",
        "igår var det kallt så vi stannade hemma och läste böcker",
        "det finns många gamla träd i trädgården bakom skolan",
        "förra sommaren åkte vi tåg till kusten och bodde på ett litet "
        "hotell vid havet",
        "kan du säga mig var närmaste station ligger och hur mycket en "
        "biljett kostar",
        "min syster lär sig laga mat och ikväll gjorde hon soppa med "
        "grönsaker från trädgården",
        "läkaren sa åt honom att vila några dagar och dricka mycket vatten",
        "det var ungefär tvåhundra personer på mötet och många av dem "
        "ställde frågor",
        "jag skulle vilja köpa tre kilo äpplen och ett halvt kilo ost tack",
        "skogen bakom byn är full av fåglar på våren",
        "enligt min mening är det nya biblioteket mycket bättre än det "
        "gamla eftersom det är öppet varje dag",
    ],
    "fi": [
        "Kaikki ihmiset syntyvät vapaina ja tasavertaisina arvoltaan ja "
        "oikeuksiltaan. Heille on annettu järki ja omatunto ja heidän on "
        "toimittava toisiaan kohtaan veljeyden hengessä.",
        "talo on lähellä jokea ja ihmiset kävelevät koiriensa kanssa "
        "illalla kun sää on hyvä",
        "aamulla menimme torille ja ostimme leipää maitoa ja munia "
        "lapsille",
        "paljonko kello on nyt ja milloin tulet takaisin meidän taloomme "
        "huomenna",
        "hän sanoi että kirja oli pöydällä mutta en löytänyt sitä mistään "
        "huoneesta",
        "veljeni työskentelee kaupungissa joka päivä ja tulee kotiin "
        "myöhään illalla",
        "eilen oli kylmä joten jäimme kotiin ja luimme kirjoja",
        "koulun takana olevassa puutarhassa on paljon vanhoja puita",
        "viime kesänä matkustimme junalla rannikolle ja asuimme pienessä "
        "hotellissa meren rannalla",
        "voitko kertoa minulle missä lähin asema on ja paljonko lippu "
        "maksaa",
        "siskoni opettelee laittamaan ruokaa ja tänä iltana hän teki "
        "keittoa puutarhan vihanneksista",
        "lääkäri käski hänen levätä muutaman päivän ja juoda paljon vettä",
        "kokouksessa oli noin kaksisataa ihmistä ja monet heistä esittivät "
        "kysymyksiä",
        "haluaisin ostaa kolme kiloa omenoita ja puoli kiloa juustoa "
        "kiitos",
        "kylän takana oleva metsä on keväällä täynnä lintuja",
        "minun mielestäni uusi kirjasto on paljon parempi kuin vanha koska "
        "se on auki joka päivä",
    ],
    "da": [
        "Alle mennesker er født frie og lige i værdighed og rettigheder. De "
        "er udstyret med fornuft og samvittighed og de bør handle mod "
        "hverandre i en broderskabets ånd.",
        "huset ligger tæt ved floden og folk går tur med deres hunde om "
        "aftenen når vejret er godt",
        "om morgenen gik vi på markedet og købte brød mælk og æg til "
        "børnene",
        "hvad er klokken nu og hvornår kommer du tilbage til vores hus i "
        "morgen",
        "hun sagde at bogen lå på bordet men jeg kunne ikke finde den "
        "nogen steder i værelset",
        "min bror arbejder i byen hver dag og kommer sent hjem om aftenen",
        "i går var det koldt så vi blev hjemme og læste bøger",
        "der er mange gamle træer i haven bag skolen",
        "sidste sommer rejste vi med tog til kysten og boede på et lille "
        "hotel ved havet",
        "kan du fortælle mig hvor den nærmeste station ligger og hvor "
        "meget en billet koster",
        "min søster er ved at lære at lave mad og i aften lavede hun suppe "
        "med grøntsager fra haven",
        "lægen sagde til ham at han skulle hvile sig nogle dage og drikke "
        "rigeligt vand",
        "der var omkring to hundrede mennesker til mødet og mange af dem "
        "stillede spørgsmål",
        "jeg vil gerne købe tre kilo æbler og et halvt kilo ost tak",
        "skoven bag landsbyen er fuld af fugle om foråret",
        "efter min mening er det nye bibliotek meget bedre end det gamle "
        "fordi det er åbent hver dag",
    ],
    "no": [
        "Alle mennesker er født frie og med samme menneskeverd og "
        "menneskerettigheter. De er utstyrt med fornuft og samvittighet og "
        "bør handle mot hverandre i brorskapets ånd.",
        "huset ligger nær elva og folk går tur med hundene sine om kvelden "
        "når været er fint",
        "om morgenen gikk vi på torget og kjøpte brød melk og egg til "
        "barna",
        "hva er klokka nå og når kommer du tilbake til huset vårt i morgen",
        "hun sa at boka lå på bordet men jeg kunne ikke finne den noe sted "
        "i rommet",
        "broren min jobber i byen hver dag og kommer sent hjem om kvelden",
        "i går var det kaldt så vi ble hjemme og leste bøker",
        "det er mange gamle trær i hagen bak skolen",
        "i fjor sommer reiste vi med tog til kysten og bodde på et lite "
        "hotell ved sjøen",
        "kan du fortelle meg hvor den nærmeste stasjonen ligger og hvor "
        "mye en billett koster",
        "søstera mi lærer å lage mat og i kveld lagde hun suppe med "
        "grønnsaker fra hagen",
        "legen sa til ham at han måtte hvile noen dager og drikke mye vann",
        "det var omtrent to hundre mennesker på møtet og mange av dem "
        "stilte spørsmål",
        "jeg vil gjerne kjøpe tre kilo epler og en halv kilo ost takk",
        "skogen bak landsbyen er full av fugler om våren",
        "etter min mening er det nye biblioteket mye bedre enn det gamle "
        "fordi det er åpent hver dag",
    ],
    "cs": [
        "Všichni lidé rodí se svobodní a sobě rovní co do důstojnosti a "
        "práv. Jsou nadáni rozumem a svědomím a mají spolu jednat v duchu "
        "bratrství.",
        "dům stojí blízko řeky a lidé večer chodí se svými psy na "
        "procházku když je hezké počasí",
        "ráno jsme šli na trh a koupili jsme chléb mléko a vejce pro děti",
        "kolik je teď hodin a kdy se zítra vrátíš k nám domů",
        "řekla že kniha byla na stole ale nikde jsem ji nemohl najít",
        "můj bratr pracuje každý den ve městě a vrací se domů pozdě večer",
        "včera bylo chladno tak jsme zůstali doma a četli jsme knihy",
        "na zahradě za školou roste mnoho starých stromů",
        "loni v létě jsme jeli vlakem k moři a bydleli jsme v malém hotelu "
        "na pobřeží",
        "můžete mi říct kde je nejbližší nádraží a kolik stojí jízdenka",
        "moje sestra se učí vařit a dnes večer uvařila polévku se "
        "zeleninou ze zahrady",
        "lékař mu řekl aby si několik dní odpočinul a pil hodně vody",
        "na schůzi bylo asi dvě stě lidí a mnozí z nich kladli otázky",
        "chtěl bych koupit tři kila jablek a půl kila sýra prosím",
        "les za vesnicí je na jaře plný ptáků",
        "podle mého názoru je nová knihovna mnohem lepší než ta stará "
        "protože je otevřená každý den",
    ],
    "ro": [
        "Toate ființele umane se nasc libere și egale în demnitate și în "
        "drepturi. Ele sunt înzestrate cu rațiune și conștiință și trebuie "
        "să se comporte unele față de altele în spiritul fraternității.",
        "casa este aproape de râu și oamenii se plimbă seara cu câinii lor "
        "când vremea este frumoasă",
        "dimineața am mers la piață și am cumpărat pâine lapte și ouă "
        "pentru copii",
        "cât este ceasul acum și când te întorci mâine la casa noastră",
        "ea a spus că era cartea pe masă dar nu am putut să o găsesc "
        "nicăieri în cameră",
        "fratele meu lucrează în oraș în fiecare zi și se întoarce acasă "
        "târziu seara",
        "ieri a fost frig așa că am rămas acasă și am citit cărți",
        "în grădina din spatele școlii sunt mulți copaci bătrâni",
        "vara trecută am călătorit cu trenul până la mare și am stat la un "
        "hotel mic lângă țărm",
        "puteți să îmi spuneți unde este cea mai apropiată gară și cât "
        "costă un bilet",
        "sora mea învață să gătească și în seara asta a făcut o supă cu "
        "legume din grădină",
        "doctorul i a spus să se odihnească câteva zile și să bea multă "
        "apă",
        "la ședință au fost cam două sute de oameni și mulți dintre ei au "
        "pus întrebări",
        "aș vrea să cumpăr trei kilograme de mere și o jumătate de "
        "kilogram de brânză vă rog",
        "pădurea din spatele satului este plină de păsări primăvara",
        "după părerea mea biblioteca nouă este mult mai bună decât cea "
        "veche pentru că este deschisă în fiecare zi",
    ],
    "uk": [
        "Всі люди народжуються вільними і рівними у своїй гідності та "
        "правах. Вони наділені розумом і совістю і повинні діяти у "
        "відношенні один до одного в дусі братерства.",
        "будинок стоїть біля річки і люди ввечері гуляють зі своїми "
        "собаками коли погода гарна",
        "вранці ми пішли на ринок і купили хліб молоко та яйця для дітей",
        "котра зараз година і коли ти завтра повернешся до нашого дому",
        "вона сказала що книжка була на столі але я ніде не міг її знайти",
        "мій брат щодня працює в місті і пізно повертається додому",
        "вчора було холодно тому ми залишилися вдома і читали книжки",
        "у саду за школою росте багато старих дерев",
        "минулого літа ми їхали потягом до моря і жили в маленькому "
        "готелі на березі",
        "скажіть будь ласка де найближча станція і скільки коштує квиток",
        "моя сестра вчиться готувати і сьогодні ввечері вона зварила суп "
        "з овочами з городу",
        "лікар сказав йому відпочити кілька днів і пити багато води",
        "на зборах було близько двохсот людей і багато з них ставили "
        "запитання",
        "я хотів би купити три кілограми яблук і півкіло сиру будь ласка",
        "ліс за селом навесні повний птахів",
        "на мою думку нова бібліотека набагато краща за стару бо вона "
        "відчинена щодня",
    ],
    "el": [
        "Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια "
        "και τα δικαιώματα. Είναι προικισμένοι με λογική και συνείδηση και "
        "οφείλουν να συμπεριφέρονται μεταξύ τους με πνεύμα αδελφοσύνης.",
        "το σπίτι είναι κοντά στο ποτάμι και οι άνθρωποι περπατούν το "
        "βράδυ με τα σκυλιά τους όταν ο καιρός είναι καλός",
        "το πρωί πήγαμε στην αγορά και αγοράσαμε ψωμί γάλα και αυγά για "
        "τα παιδιά",
        "τι ώρα είναι τώρα και πότε θα γυρίσεις αύριο στο σπίτι μας",
        "είπε ότι το βιβλίο ήταν πάνω στο τραπέζι αλλά δεν μπορούσα να το "
        "βρω πουθενά στο δωμάτιο",
        "ο αδερφός μου δουλεύει στην πόλη κάθε μέρα και γυρίζει σπίτι "
        "αργά το βράδυ",
        "χθες έκανε κρύο οπότε μείναμε στο σπίτι και διαβάσαμε βιβλία",
        "στον κήπο πίσω από το σχολείο υπάρχουν πολλά παλιά δέντρα",
        "το περασμένο καλοκαίρι ταξιδέψαμε με το τρένο στην ακτή και "
        "μείναμε σε ένα μικρό ξενοδοχείο δίπλα στη θάλασσα",
        "μπορείτε να μου πείτε πού είναι ο πιο κοντινός σταθμός και πόσο "
        "κοστίζει ένα εισιτήριο",
        "η αδερφή μου μαθαίνει να μαγειρεύει και απόψε έφτιαξε σούπα με "
        "λαχανικά από τον κήπο",
        "ο γιατρός του είπε να ξεκουραστεί μερικές μέρες και να πίνει "
        "πολύ νερό",
        "στη συνάντηση ήταν περίπου διακόσια άτομα και πολλοί από αυτούς "
        "έκαναν ερωτήσεις",
        "θα ήθελα να αγοράσω τρία κιλά μήλα και μισό κιλό τυρί παρακαλώ",
        "το δάσος πίσω από το χωριό είναι γεμάτο πουλιά την άνοιξη",
        "κατά τη γνώμη μου η καινούργια βιβλιοθήκη είναι πολύ καλύτερη "
        "από την παλιά επειδή είναι ανοιχτή κάθε μέρα",
    ],
    "he": [
        "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם. כולם חוננו "
        "בתבונה ובמצפון לפיכך חובה עליהם לנהוג איש ברעהו ברוח של אחווה.",
        "הבית נמצא ליד הנהר ואנשים מטיילים בערב עם הכלבים שלהם כאשר מזג "
        "האוויר טוב",
        "בבוקר הלכנו לשוק וקנינו לחם חלב וביצים לילדים",
        "מה השעה עכשיו ומתי תחזור מחר לבית שלנו",
        "היא אמרה שהספר היה על השולחן אבל לא מצאתי אותו בשום מקום בחדר",
        "אחי עובד בעיר כל יום וחוזר הביתה מאוחר בלילה",
        "אתמול היה קר אז נשארנו בבית וקראנו ספרים",
        "בגינה מאחורי בית הספר יש הרבה עצים זקנים",
        "בקיץ שעבר נסענו ברכבת לחוף הים וגרנו במלון קטן ליד הים",
        "אתה יכול להגיד לי איפה התחנה הקרובה ביותר וכמה עולה כרטיס",
        "אחותי לומדת לבשל והערב היא הכינה מרק עם ירקות מהגינה",
        "הרופא אמר לו לנוח כמה ימים ולשתות הרבה מים",
        "בפגישה היו בערך מאתיים אנשים ורבים מהם שאלו שאלות",
        "אני רוצה לקנות שלושה קילו תפוחים וחצי קילו גבינה בבקשה",
        "היער מאחורי הכפר מלא ציפורים באביב",
        "לדעתי הספרייה החדשה הרבה יותר טובה מהישנה כי היא פתוחה כל יום",
    ],
    "th": [
        "มนุษย์ทั้งหลายเกิดมามีอิสระและเสมอภาคกันในศักดิ์ศรีและสิทธิ "
        "ต่างมีเหตุผลและมโนธรรม และควรปฏิบัติต่อกันด้วยจิตวิญญาณแห่งภราดรภาพ",
        "บ้านอยู่ใกล้แม่น้ำและผู้คนพาสุนัขไปเดินเล่นในตอนเย็นเมื่ออากาศดี",
        "ตอนเช้าเราไปตลาดและซื้อขนมปังนมและไข่ให้เด็ก",
        "ตอนนี้กี่โมงแล้วและพรุ่งนี้คุณจะกลับมาบ้านเราเมื่อไหร่",
        "เธอบอกว่าหนังสืออยู่บนโต๊ะแต่ฉันหาไม่เจอที่ไหนเลยในห้อง",
        "พี่ชายของฉันทำงานในเมืองทุกวันและกลับบ้านดึกตอนกลางคืน",
        "เมื่อวานอากาศหนาวเราจึงอยู่บ้านและอ่านหนังสือ",
        "ในสวนหลังโรงเรียนมีต้นไม้เก่าแก่มากมาย",
        "ฤดูร้อนที่แล้วเรานั่งรถไฟไปชายทะเลและพักที่โรงแรมเล็กริมทะเล",
        "ช่วยบอกฉันหน่อยได้ไหมว่าสถานีที่ใกล้ที่สุดอยู่ที่ไหนและตั๋วราคาเท่าไหร่",
        "น้องสาวของฉันกำลังเรียนทำอาหารและเย็นนี้เธอทำซุปด้วยผักจากสวน",
        "หมอบอกให้เขาพักผ่อนสองสามวันและดื่มน้ำมาก",
        "ในการประชุมมีคนประมาณสองร้อยคนและหลายคนถามคำถาม",
        "ฉันอยากซื้อแอปเปิ้ลสามกิโลและชีสครึ่งกิโล",
        "ป่าหลังหมู่บ้านเต็มไปด้วยนกในฤดูใบไม้ผลิ",
        "ในความคิดของฉันห้องสมุดใหม่ดีกว่าห้องสมุดเก่ามากเพราะเปิดทุกวัน",
    ],
    "vi": [
        "Tất cả mọi người sinh ra đều được tự do và bình đẳng về nhân phẩm "
        "và quyền lợi. Mọi con người đều được tạo hóa ban cho lý trí và "
        "lương tâm và cần phải đối xử với nhau trong tình anh em.",
        "ngôi nhà ở gần con sông và mọi người dắt chó đi dạo vào buổi tối "
        "khi thời tiết đẹp",
        "buổi sáng chúng tôi đi chợ và mua bánh mì sữa và trứng cho các "
        "con",
        "bây giờ là mấy giờ và ngày mai khi nào bạn sẽ quay lại nhà chúng "
        "tôi",
        "cô ấy nói rằng cuốn sách ở trên bàn nhưng tôi không tìm thấy nó "
        "ở đâu trong phòng",
        "anh trai tôi làm việc trong thành phố mỗi ngày và về nhà muộn "
        "vào ban đêm",
        "hôm qua trời lạnh nên chúng tôi ở nhà và đọc sách",
        "trong khu vườn sau trường học có nhiều cây cổ thụ",
        "mùa hè năm ngoái chúng tôi đi tàu đến bờ biển và ở trong một "
        "khách sạn nhỏ gần biển",
        "bạn có thể cho tôi biết nhà ga gần nhất ở đâu và vé giá bao "
        "nhiêu không",
        "em gái tôi đang học nấu ăn và tối nay cô ấy nấu súp với rau từ "
        "vườn",
        "bác sĩ bảo anh ấy nghỉ ngơi vài ngày và uống nhiều nước",
        "có khoảng hai trăm người trong cuộc họp và nhiều người đã đặt "
        "câu hỏi",
        "tôi muốn mua ba cân táo và nửa cân phô mai",
        "khu rừng sau làng đầy chim vào mùa xuân",
        "theo tôi thư viện mới tốt hơn nhiều so với thư viện cũ vì nó mở "
        "cửa mỗi ngày",
    ],
    "is": [
        "Allir menn eru bornir frjálsir og jafnir öðrum að virðingu og "
        "réttindum. Menn eru gæddir vitsmunum og samvisku og ber að "
        "breyta bróðurlega hverjum við annan.",
        "á morgnana förum við á markaðinn og kaupum brauð mjólk og egg "
        "handa börnunum",
        "hvað er klukkan núna og hvenær kemur þú aftur heim til okkar á "
        "morgun",
        "hún sagði að bókin væri á borðinu en ég fann hana hvergi í "
        "herberginu",
        "bróðir minn vinnur í bænum á hverjum degi og kemur seint heim á "
        "kvöldin",
        "í gær var kalt svo við vorum heima og lásum bækur",
        "það eru mörg gömul tré í garðinum bak við skólann",
        "síðasta sumar ferðuðumst við með lest að ströndinni og gistum á "
        "litlu hóteli við sjóinn",
        "getur þú sagt mér hvar næsta stöð er og hvað miði kostar",
        "systir mín er að læra að elda og í kvöld bjó hún til súpu með "
        "grænmeti úr garðinum",
        "læknirinn sagði honum að hvíla sig í nokkra daga og drekka mikið "
        "vatn",
        "á fundinum voru um tvö hundruð manns og margir þeirra spurðu "
        "spurninga",
        "ég ætla að kaupa þrjú kíló af eplum og hálft kíló af osti takk",
        "skógurinn bak við þorpið er fullur af fuglum á vorin",
        "að mínu mati er nýja bókasafnið miklu betra en það gamla því það "
        "er opið alla daga",
    ],
    "bg": [
        "Всички хора се раждат свободни и равни по достойнство и права. "
        "Те са надарени с разум и съвест и следва да се отнасят помежду "
        "си в дух на братство.",
        "къщата е близо до реката и хората се разхождат вечер с кучетата "
        "си когато времето е хубаво",
        "сутринта отидохме на пазара и купихме хляб мляко и яйца за "
        "децата",
        "колко е часът сега и кога ще се върнеш утре в нашата къща",
        "тя каза че книгата беше на масата но не можах да я намеря "
        "никъде в стаята",
        "брат ми работи в града всеки ден и се прибира късно вечер",
        "вчера беше студено затова останахме вкъщи и четохме книги",
        "в градината зад училището има много стари дървета",
        "миналото лято пътувахме с влак до брега и отседнахме в малък "
        "хотел край морето",
        "можете ли да ми кажете къде е най близката гара и колко струва "
        "билетът",
        "сестра ми се учи да готви и тази вечер направи супа със "
        "зеленчуци от градината",
        "лекарят му каза да си почине няколко дни и да пие много вода",
        "на събранието имаше около двеста души и мнозина от тях задаваха "
        "въпроси",
        "искам да купя три килограма ябълки и половин килограм сирене "
        "моля",
        "гората зад селото е пълна с птици през пролетта",
        "според мен новата библиотека е много по добра от старата защото "
        "е отворена всеки ден",
    ],
    # batch 3 (round 16): Romance/Slavic/Baltic/Finnic cousins of existing
    # profiles plus Persian and Swahili; sw/lt/et/ca graduate from the
    # rejection fixtures to real labels (the measured add-don't-tighten
    # growth path).
    "ca": [
        "Tots els éssers humans neixen lliures i iguals en dignitat i en "
        "drets. Són dotats de raó i de consciència, i han de comportar-se "
        "fraternalment els uns amb els altres.",
        "la casa és a prop del riu i la gent passeja amb els seus gossos "
        "al vespre quan fa bon temps",
        "al matí vam anar al mercat i vam comprar pa llet i ous per als nens",
        "quina hora és ara i quan tornaràs a casa nostra demà",
        "ella va dir que el llibre era sobre la taula però no el vaig poder "
        "trobar enlloc",
        "el meu germà treballa a la ciutat cada dia i torna a casa tard a la nit",
        "ahir feia fred així que ens vam quedar a casa i vam llegir llibres",
        "hi ha molts arbres vells al jardí darrere de l escola",
        "l estiu passat vam viatjar en tren fins a la costa i ens vam "
        "allotjar en un petit hotel vora el mar",
        "em podria dir on és l estació més propera i quant costa un bitllet",
        "la meva germana està aprenent a cuinar i aquesta nit ha fet sopa "
        "amb verdures de l hort",
        "el metge li va dir que descansés uns dies i begués molta aigua",
        "hi havia unes dues centes persones a la reunió i moltes van fer preguntes",
        "voldria comprar tres quilos de pomes i mig quilo de formatge si us plau",
        "el bosc darrere del poble és ple d ocells a la primavera",
        "al meu parer la nova biblioteca és molt millor que la vella "
        "perquè obre cada dia",
    ],
    "hr": [
        "Sva ljudska bića rađaju se slobodna i jednaka u dostojanstvu i "
        "pravima. Ona su obdarena razumom i sviješću i trebaju jedna prema "
        "drugima postupati u duhu bratstva.",
        "kuća je blizu rijeke i ljudi navečer šeću sa svojim psima kad je "
        "vrijeme lijepo",
        "ujutro smo otišli na tržnicu i kupili kruh mlijeko i jaja za djecu",
        "koliko je sada sati i kada ćeš se sutra vratiti u našu kuću",
        "rekla je da je knjiga na stolu ali nisam je mogao nigdje pronaći",
        "moj brat radi u gradu svaki dan i kasno se vraća kući",
        "jučer je bilo hladno pa smo ostali kod kuće i čitali knjige",
        "u vrtu iza škole ima mnogo starih stabala",
        "prošloga ljeta putovali smo vlakom na obalu i odsjeli u malom "
        "hotelu uz more",
        "možete li mi reći gdje je najbliža postaja i koliko košta karta",
        "moja sestra uči kuhati i večeras je skuhala juhu od povrća iz vrta",
        "liječnik mu je rekao da se odmara nekoliko dana i pije puno vode",
        "na sastanku je bilo oko dvjesto ljudi i mnogi su postavljali pitanja",
        "htio bih kupiti tri kile jabuka i pola kile sira molim",
        "šuma iza sela puna je ptica u proljeće",
        "po mom mišljenju nova knjižnica je puno bolja od stare jer je "
        "otvorena svaki dan",
    ],
    "sr": [
        "Сва људска бића рађају се слободна и једнака у достојанству и "
        "правима. Она су обдарена разумом и свешћу и треба једни према "
        "другима да поступају у духу братства.",
        "кућа је близу реке и људи увече шетају са својим псима када је "
        "време лепо",
        "ујутру смо отишли на пијацу и купили хлеб млеко и јаја за децу",
        "колико је сада сати и када ћеш се сутра вратити у нашу кућу",
        "рекла је да је књига на столу али нисам могао нигде да је нађем",
        "мој брат ради у граду сваки дан и касно се враћа кући",
        "јуче је било хладно па смо остали код куће и читали књиге",
        "у башти иза школе има много старог дрвећа",
        "прошлог лета путовали смо возом на обалу и одсели у малом хотелу "
        "поред мора",
        "можете ли да ми кажете где је најближа станица и колико кошта карта",
        "моја сестра учи да кува и вечерас је скувала супу од поврћа из баште",
        "лекар му је рекао да се одмара неколико дана и да пије доста воде",
        "на састанку је било око двеста људи и многи су постављали питања",
        "хтео бих да купим три киле јабука и пола киле сира молим",
        "шума иза села пуна је птица у пролеће",
        "по мом мишљењу нова библиотека је много боља од старе јер је "
        "отворена сваког дана",
    ],
    "sk": [
        "Všetci ľudia sa rodia slobodní a rovní v dôstojnosti aj právach. "
        "Sú obdarení rozumom a svedomím a majú sa k sebe správať v duchu "
        "bratstva.",
        "dom je blízko rieky a ľudia sa večer prechádzajú so svojimi psami "
        "keď je pekné počasie",
        "ráno sme išli na trh a kúpili sme chlieb mlieko a vajcia pre deti",
        "koľko je teraz hodín a kedy sa zajtra vrátiš do nášho domu",
        "povedala že kniha bola na stole ale nikde som ju nemohol nájsť",
        "môj brat pracuje v meste každý deň a domov sa vracia neskoro v noci",
        "včera bolo chladno tak sme zostali doma a čítali sme knihy",
        "v záhrade za školou je veľa starých stromov",
        "minulé leto sme cestovali vlakom na pobrežie a bývali sme v malom "
        "hoteli pri mori",
        "môžete mi povedať kde je najbližšia stanica a koľko stojí lístok",
        "moja sestra sa učí variť a dnes večer uvarila polievku zo zeleniny "
        "zo záhrady",
        "lekár mu povedal aby niekoľko dní odpočíval a pil veľa vody",
        "na stretnutí bolo okolo dvesto ľudí a mnohí kládli otázky",
        "chcel by som kúpiť tri kilá jabĺk a pol kila syra prosím",
        "les za dedinou je na jar plný vtákov",
        "podľa môjho názoru je nová knižnica oveľa lepšia ako stará lebo "
        "je otvorená každý deň",
    ],
    "sl": [
        "Vsi ljudje se rodijo svobodni in imajo enako dostojanstvo in "
        "enake pravice. Obdarjeni so z razumom in vestjo in bi morali "
        "ravnati drug z drugim kakor bratje.",
        "hiša je blizu reke in ljudje se zvečer sprehajajo s svojimi psi "
        "ko je vreme lepo",
        "zjutraj smo šli na tržnico in kupili kruh mleko in jajca za otroke",
        "koliko je zdaj ura in kdaj se boš jutri vrnil v našo hišo",
        "rekla je da je knjiga na mizi vendar je nisem mogel nikjer najti",
        "moj brat dela v mestu vsak dan in se pozno vrača domov",
        "včeraj je bilo hladno zato smo ostali doma in brali knjige",
        "na vrtu za šolo je veliko starih dreves",
        "lani poleti smo potovali z vlakom na obalo in stanovali v majhnem "
        "hotelu ob morju",
        "mi lahko poveste kje je najbližja postaja in koliko stane vozovnica",
        "moja sestra se uči kuhati in je nocoj skuhala juho iz zelenjave z vrta",
        "zdravnik mu je rekel naj nekaj dni počiva in pije veliko vode",
        "na sestanku je bilo okoli dvesto ljudi in mnogi so postavljali "
        "vprašanja",
        "rad bi kupil tri kilograme jabolk in pol kilograma sira prosim",
        "gozd za vasjo je spomladi poln ptic",
        "po mojem mnenju je nova knjižnica veliko boljša od stare ker je "
        "odprta vsak dan",
    ],
    "lt": [
        "Visi žmonės gimsta laisvi ir lygūs savo orumu ir teisėmis. Jiems "
        "suteiktas protas ir sąžinė ir jie turi elgtis vienas kito "
        "atžvilgiu kaip broliai.",
        "namas yra netoli upės ir žmonės vakare vaikšto su savo šunimis "
        "kai oras geras",
        "ryte nuėjome į turgų ir nupirkome duonos pieno ir kiaušinių vaikams",
        "kiek dabar valandų ir kada rytoj grįši į mūsų namus",
        "ji sakė kad knyga buvo ant stalo bet niekur negalėjau jos rasti",
        "mano brolis kasdien dirba mieste ir vėlai grįžta namo",
        "vakar buvo šalta todėl likome namuose ir skaitėme knygas",
        "sode už mokyklos auga daug senų medžių",
        "praėjusią vasarą traukiniu keliavome į pajūrį ir apsistojome "
        "mažame viešbutyje prie jūros",
        "gal galite pasakyti kur yra artimiausia stotis ir kiek kainuoja "
        "bilietas",
        "mano sesuo mokosi gaminti ir šį vakarą išvirė sriubą iš daržovių "
        "iš sodo",
        "gydytojas jam liepė kelias dienas ilsėtis ir gerti daug vandens",
        "susirinkime buvo apie du šimtus žmonių ir daugelis uždavinėjo "
        "klausimus",
        "norėčiau nupirkti tris kilogramus obuolių ir pusę kilogramo sūrio "
        "prašau",
        "miškas už kaimo pavasarį pilnas paukščių",
        "mano nuomone nauja biblioteka daug geresnė už senąją nes dirba "
        "kiekvieną dieną",
    ],
    "lv": [
        "Visi cilvēki piedzimst brīvi un vienlīdzīgi savā cieņā un "
        "tiesībās. Viņi ir apveltīti ar saprātu un sirdsapziņu un viņiem "
        "citam pret citu jāizturas brālības garā.",
        "māja atrodas netālu no upes un cilvēki vakarā pastaigājas ar "
        "saviem suņiem kad laiks ir labs",
        "no rīta mēs aizgājām uz tirgu un nopirkām maizi pienu un olas "
        "bērniem",
        "cik tagad ir pulkstenis un kad tu rīt atgriezīsies mūsu mājā",
        "viņa teica ka grāmata bija uz galda bet es nekur nevarēju to atrast",
        "mans brālis katru dienu strādā pilsētā un vēlu atgriežas mājās",
        "vakar bija auksts tāpēc mēs palikām mājās un lasījām grāmatas",
        "dārzā aiz skolas aug daudz vecu koku",
        "pagājušajā vasarā mēs braucām ar vilcienu uz jūrmalu un "
        "apmetāmies mazā viesnīcā pie jūras",
        "vai varat pateikt kur ir tuvākā stacija un cik maksā biļete",
        "mana māsa mācās gatavot ēst un šovakar izvārīja zupu no dārzeņiem "
        "no dārza",
        "ārsts viņam teica dažas dienas atpūsties un dzert daudz ūdens",
        "sapulcē bija apmēram divsimt cilvēku un daudzi uzdeva jautājumus",
        "es vēlētos nopirkt trīs kilogramus ābolu un pus kilogramu siera "
        "lūdzu",
        "mežs aiz ciema pavasarī ir pilns putnu",
        "manuprāt jaunā bibliotēka ir daudz labāka par veco jo tā ir "
        "atvērta katru dienu",
    ],
    "et": [
        "Kõik inimesed sünnivad vabadena ja võrdsetena oma väärikuselt ja "
        "õigustelt. Neile on antud mõistus ja südametunnistus ja nende "
        "suhtumist üksteisesse peab kandma vendluse vaim.",
        "maja on jõe lähedal ja inimesed jalutavad õhtul oma koertega kui "
        "ilm on ilus",
        "hommikul läksime turule ja ostsime lastele leiba piima ja mune",
        "mis kell praegu on ja millal sa homme meie majja tagasi tuled",
        "ta ütles et raamat oli laual aga ma ei leidnud seda kuskilt",
        "mu vend töötab iga päev linnas ja tuleb hilja õhtul koju",
        "eile oli külm seega jäime koju ja lugesime raamatuid",
        "aias kooli taga kasvab palju vanu puid",
        "eelmisel suvel sõitsime rongiga rannikule ja peatusime väikeses "
        "hotellis mere ääres",
        "kas te oskate öelda kus on lähim jaam ja kui palju pilet maksab",
        "mu õde õpib süüa tegema ja täna õhtul keetis ta aiast saadud "
        "köögiviljadest suppi",
        "arst ütles talle et ta puhkaks mõne päeva ja jooks palju vett",
        "koosolekul oli umbes kakssada inimest ja paljud esitasid küsimusi",
        "ma sooviksin osta kolm kilo õunu ja pool kilo juustu palun",
        "mets küla taga on kevadel linde täis",
        "minu arvates on uus raamatukogu palju parem kui vana sest see on "
        "avatud iga päev",
    ],
    "fa": [
        "تمام افراد بشر آزاد به دنیا می آیند و از لحاظ حیثیت و حقوق با هم "
        "برابرند. همه دارای عقل و وجدان هستند و باید نسبت به یکدیگر با "
        "روح برادری رفتار کنند.",
        "خانه نزدیک رودخانه است و مردم عصرها با سگ های خود قدم می زنند "
        "وقتی هوا خوب است",
        "صبح به بازار رفتیم و برای بچه ها نان شیر و تخم مرغ خریدیم",
        "الان ساعت چند است و فردا کی به خانه ما برمی گردی",
        "او گفت که کتاب روی میز بود اما من نتوانستم آن را هیچ جا پیدا کنم",
        "برادر من هر روز در شهر کار می کند و شب دیر به خانه می آید",
        "دیروز هوا سرد بود پس در خانه ماندیم و کتاب خواندیم",
        "در باغ پشت مدرسه درختان کهنسال زیادی هست",
        "تابستان گذشته با قطار به ساحل سفر کردیم و در هتل کوچکی کنار "
        "دریا ماندیم",
        "می توانید بگویید نزدیک ترین ایستگاه کجاست و بلیت چقدر است",
        "خواهرم آشپزی یاد می گیرد و امشب با سبزیجات باغ سوپ درست کرد",
        "پزشک به او گفت چند روز استراحت کند و آب زیاد بنوشد",
        "حدود دویست نفر در جلسه بودند و بسیاری از آنها سوال پرسیدند",
        "می خواهم سه کیلو سیب و نیم کیلو پنیر بخرم لطفا",
        "جنگل پشت روستا در بهار پر از پرندگان است",
        "به نظر من کتابخانه جدید خیلی بهتر از قدیمی است چون هر روز باز است",
    ],
    "sw": [
        "Watu wote wamezaliwa huru hadhi na haki zao ni sawa. Wote "
        "wamejaliwa akili na dhamiri hivyo yapasa watendeane kindugu.",
        "nyumba iko karibu na mto na watu hutembea na mbwa wao jioni "
        "wakati hali ya hewa ni nzuri",
        "asubuhi tulikwenda sokoni na kununua mkate maziwa na mayai kwa "
        "watoto",
        "sasa ni saa ngapi na utarudi lini nyumbani kwetu kesho",
        "alisema kwamba kitabu kilikuwa mezani lakini sikuweza kukipata "
        "popote",
        "kaka yangu anafanya kazi mjini kila siku na anarudi nyumbani "
        "usiku sana",
        "jana kulikuwa na baridi kwa hiyo tulibaki nyumbani na kusoma "
        "vitabu",
        "kuna miti mingi ya zamani katika bustani nyuma ya shule",
        "msimu wa joto uliopita tulisafiri kwa treni hadi pwani na kukaa "
        "katika hoteli ndogo kando ya bahari",
        "tafadhali unaweza kuniambia kituo cha karibu kiko wapi na tikiti "
        "inagharimu kiasi gani",
        "dada yangu anajifunza kupika na usiku huu alipika supu ya mboga "
        "kutoka bustanini",
        "daktari alimwambia apumzike kwa siku chache na anywe maji mengi",
        "kulikuwa na watu kama mia mbili kwenye mkutano na wengi waliuliza "
        "maswali",
        "ningependa kununua kilo tatu za tufaha na nusu kilo ya jibini "
        "tafadhali",
        "msitu nyuma ya kijiji umejaa ndege wakati wa masika",
        "kwa maoni yangu maktaba mpya ni bora zaidi kuliko ile ya zamani "
        "kwa sababu hufunguliwa kila siku",
    ],
    # batch 4 (r17): Indic + SEA — bn ta te ml mr gu kn pa ur tl.
    # Seven carry their own Unicode script (Bengali, Tamil, Telugu,
    # Malayalam, Gujarati, Kannada, Gurmukhi) so the gram space itself
    # separates them; the measured cousins are mr (shares Devanagari
    # with hi, separated by आहे/आणि-class function grams), ur (shares
    # Arabic script with ar/fa, separated by ے/ٹ/ہے grams), and tl
    # (Latin, but ang/mga/ng function words are unmistakable).
    # MALAY (ms) IS DELIBERATELY EXCLUDED — the measured honest limit:
    # an ms profile close enough to accept real Malay STEALS the id
    # fixtures (the bag "mereka anak orang mempunyai di dengan pagi
    # baik", the id prose, and the id oracle plant all flipped to ms at
    # distance 88-144 — every word in them is both languages). ms/id is
    # a macrolanguage pair; char-gram rank profiles cannot separate it
    # the way they separated hu/is/bg cousins. A production system
    # labels the pair jointly (fastText reports id for both); callers
    # needing the split must use a token-level lexicon tier.
    "bn": [
        "সমস্ত মানুষ স্বাধীনভাবে সমান মর্যাদা এবং অধিকার নিয়ে জন্মগ্রহণ করে তাদের বিবেক এবং বুদ্ধি আছে",
        "বাড়িটি নদীর কাছে এবং সন্ধ্যায় মানুষ তাদের কুকুর নিয়ে হাঁটে",
        "আমরা সকালে বাজারে গিয়ে শিশুদের জন্য রুটি দুধ আর ডিম কিনলাম",
        "এখন কটা বাজে আর তুমি কাল আমাদের বাড়িতে কখন ফিরে আসবে",
        "সে বলল বইটি টেবিলের উপর ছিল কিন্তু আমি কোথাও খুঁজে পাইনি",
        "আমার ভাই প্রতিদিন শহরে কাজ করে এবং রাতে দেরি করে বাড়ি ফেরে",
        "গতকাল আবহাওয়া ঠান্ডা ছিল তাই আমরা বাড়িতে থেকে বই পড়লাম",
        "স্কুলের পিছনের বাগানে অনেক পুরনো গাছ আছে",
        "দয়া করে বলুন নিকটতম স্টেশন কোথায় এবং টিকিটের দাম কত",
        "আমার বোন রান্না শিখছে এবং আজ সবজি দিয়ে স্যুপ বানিয়েছে",
        "ডাক্তার তাকে কয়েক দিন বিশ্রাম নিতে এবং প্রচুর পানি পান করতে বললেন",
        "আমি তিন কেজি আপেল আর আধা কেজি পনির কিনতে চাই",
    ],
    "ta": [
        "மனிதப் பிறவியினர் சகலரும் சுதந்திரமாகவே பிறக்கின்றனர் அவர்கள் மதிப்பிலும் உரிமைகளிலும் சமமானவர்கள்",
        "வீடு ஆற்றின் அருகில் உள்ளது மாலையில் மக்கள் தங்கள் நாய்களுடன் நடக்கிறார்கள்",
        "காலையில் சந்தைக்கு சென்று குழந்தைகளுக்கு ரொட்டி பால் முட்டை வாங்கினோம்",
        "இப்போது மணி என்ன நாளை எப்போது எங்கள் வீட்டிற்கு திரும்பி வருவாய்",
        "புத்தகம் மேசையின் மேல் இருந்தது என்று அவள் சொன்னாள் ஆனால் எனக்கு கிடைக்கவில்லை",
        "என் அண்ணன் தினமும் நகரத்தில் வேலை செய்கிறான் இரவு தாமதமாக வீட்டிற்கு வருகிறான்",
        "நேற்று குளிராக இருந்தது எனவே நாங்கள் வீட்டில் இருந்து புத்தகங்கள் படித்தோம்",
        "பள்ளியின் பின்னால் உள்ள தோட்டத்தில் பல பழைய மரங்கள் உள்ளன",
        "அருகிலுள்ள நிலையம் எங்கே என்றும் டிக்கெட் விலை எவ்வளவு என்றும் சொல்லுங்கள்",
        "என் தங்கை சமைக்க கற்றுக்கொள்கிறாள் இன்று காய்கறிகளுடன் சூப் செய்தாள்",
        "சில நாட்கள் ஓய்வு எடுக்கவும் நிறைய தண்ணீர் குடிக்கவும் மருத்துவர் சொன்னார்",
        "மூன்று கிலோ ஆப்பிளும் அரை கிலோ பாலாடைக்கட்டியும் வாங்க விரும்புகிறேன்",
    ],
    "te": [
        "మానవులందరూ స్వతంత్రులుగా జన్మించారు గౌరవంలో హక్కులలో సమానులు",
        "ఇల్లు నది దగ్గర ఉంది సాయంత్రం ప్రజలు తమ కుక్కలతో నడుస్తారు",
        "ఉదయం మేము బజారుకు వెళ్లి పిల్లల కోసం రొట్టె పాలు గుడ్లు కొన్నాము",
        "ఇప్పుడు సమయం ఎంత రేపు మా ఇంటికి ఎప్పుడు తిరిగి వస్తావు",
        "పుస్తకం బల్ల మీద ఉందని ఆమె చెప్పింది కానీ నాకు ఎక్కడా దొరకలేదు",
        "మా అన్నయ్య ప్రతిరోజు నగరంలో పని చేస్తాడు రాత్రి ఆలస్యంగా ఇంటికి వస్తాడు",
        "నిన్న చలిగా ఉంది అందుకే మేము ఇంట్లో ఉండి పుస్తకాలు చదివాము",
        "బడి వెనుక తోటలో చాలా పాత చెట్లు ఉన్నాయి",
        "దగ్గరి స్టేషన్ ఎక్కడ ఉందో టికెట్ ధర ఎంతో చెప్పండి",
        "మా చెల్లెలు వంట నేర్చుకుంటోంది ఈరోజు కూరగాయలతో సూప్ చేసింది",
        "కొన్ని రోజులు విశ్రాంతి తీసుకోమని ఎక్కువ నీళ్లు తాగమని వైద్యుడు చెప్పాడు",
        "మూడు కిలోల ఆపిల్ పండ్లు అర కిలో జున్ను కొనాలనుకుంటున్నాను",
    ],
    "ml": [
        "മനുഷ്യരെല്ലാവരും തുല്യാവകാശങ്ങളോടും അന്തസ്സോടും സ്വാതന്ത്ര്യത്തോടുംകൂടി ജനിച്ചവരാണ്",
        "വീട് നദിയുടെ അടുത്താണ് വൈകുന്നേരം ആളുകൾ നായ്ക്കളുമായി നടക്കുന്നു",
        "രാവിലെ ഞങ്ങൾ ചന്തയിൽ പോയി കുട്ടികൾക്ക് റൊട്ടിയും പാലും മുട്ടയും വാങ്ങി",
        "ഇപ്പോൾ സമയം എത്രയായി നാളെ എപ്പോൾ ഞങ്ങളുടെ വീട്ടിലേക്ക് തിരിച്ചു വരും",
        "പുസ്തകം മേശപ്പുറത്തായിരുന്നു എന്ന് അവൾ പറഞ്ഞു പക്ഷേ എനിക്ക് കണ്ടെത്താനായില്ല",
        "എന്റെ സഹോദരൻ എല്ലാ ദിവസവും നഗരത്തിൽ ജോലി ചെയ്യുന്നു രാത്രി വൈകി വീട്ടിൽ വരുന്നു",
        "ഇന്നലെ തണുപ്പായിരുന്നു അതിനാൽ ഞങ്ങൾ വീട്ടിലിരുന്ന് പുസ്തകങ്ങൾ വായിച്ചു",
        "സ്കൂളിന് പിന്നിലെ തോട്ടത്തിൽ ധാരാളം പഴയ മരങ്ങളുണ്ട്",
        "അടുത്തുള്ള സ്റ്റേഷൻ എവിടെയാണെന്നും ടിക്കറ്റിന് എത്ര വിലയാണെന്നും പറയാമോ",
        "എന്റെ സഹോദരി പാചകം പഠിക്കുന്നു ഇന്ന് പച്ചക്കറികൾ കൊണ്ട് സൂപ്പ് ഉണ്ടാക്കി",
        "കുറച്ച് ദിവസം വിശ്രമിക്കാനും ധാരാളം വെള്ളം കുടിക്കാനും ഡോക്ടർ പറഞ്ഞു",
        "മൂന്ന് കിലോ ആപ്പിളും അര കിലോ പാൽക്കട്ടിയും വാങ്ങാൻ ആഗ്രഹിക്കുന്നു",
    ],
    "mr": [
        "सर्व मानवी व्यक्ती जन्मतः स्वतंत्र आहेत व त्यांना समान प्रतिष्ठा व समान अधिकार आहेत",
        "घर नदीच्या जवळ आहे आणि संध्याकाळी लोक आपल्या कुत्र्यांसोबत फिरायला जातात",
        "आम्ही सकाळी बाजारात गेलो आणि मुलांसाठी पाव दूध आणि अंडी विकत घेतली",
        "आता किती वाजले आहेत आणि तू उद्या आमच्या घरी कधी परत येशील",
        "तिने सांगितले की पुस्तक टेबलावर होते पण मला ते कुठेही सापडले नाही",
        "माझा भाऊ दररोज शहरात काम करतो आणि रात्री उशिरा घरी येतो",
        "काल थंडी होती म्हणून आम्ही घरीच राहिलो आणि पुस्तके वाचली",
        "शाळेच्या मागच्या बागेत खूप जुनी झाडे आहेत",
        "जवळचे स्थानक कुठे आहे आणि तिकिटाची किंमत किती आहे ते सांगाल का",
        "माझी बहीण स्वयंपाक शिकत आहे आणि आज तिने भाज्यांचे सूप केले",
        "डॉक्टरांनी त्याला काही दिवस विश्रांती घ्यायला आणि भरपूर पाणी प्यायला सांगितले",
        "मला तीन किलो सफरचंद आणि अर्धा किलो पनीर विकत घ्यायचे आहे",
    ],
    "gu": [
        "પ્રતિષ્ઠા અને અધિકારોની દૃષ્ટિએ સર્વ માનવો જન્મથી સ્વતંત્ર અને સમાન હોય છે",
        "ઘર નદીની નજીક છે અને સાંજે લોકો પોતાના કૂતરા સાથે ચાલે છે",
        "અમે સવારે બજારમાં ગયા અને બાળકો માટે રોટલી દૂધ અને ઈંડા ખરીદ્યા",
        "અત્યારે કેટલા વાગ્યા છે અને તું કાલે અમારા ઘરે ક્યારે પાછો આવીશ",
        "તેણે કહ્યું કે પુસ્તક ટેબલ પર હતું પણ મને ક્યાંય મળ્યું નહીં",
        "મારો ભાઈ દરરોજ શહેરમાં કામ કરે છે અને રાત્રે મોડો ઘરે આવે છે",
        "ગઈકાલે ઠંડી હતી એટલે અમે ઘરે રહ્યા અને પુસ્તકો વાંચ્યાં",
        "શાળાની પાછળના બગીચામાં ઘણાં જૂનાં વૃક્ષો છે",
        "નજીકનું સ્ટેશન ક્યાં છે અને ટિકિટની કિંમત કેટલી છે તે કહેશો",
        "મારી બહેન રસોઈ શીખી રહી છે અને આજે શાકભાજીનો સૂપ બનાવ્યો",
        "ડૉક્ટરે તેને થોડા દિવસ આરામ કરવા અને પુષ્કળ પાણી પીવા કહ્યું",
        "મારે ત્રણ કિલો સફરજન અને અડધો કિલો પનીર ખરીદવું છે",
    ],
    "kn": [
        "ಎಲ್ಲಾ ಮಾನವರು ಸ್ವತಂತ್ರರಾಗಿ ಹುಟ್ಟಿದ್ದಾರೆ ಘನತೆ ಮತ್ತು ಹಕ್ಕುಗಳಲ್ಲಿ ಸಮಾನರು",
        "ಮನೆ ನದಿಯ ಹತ್ತಿರ ಇದೆ ಸಂಜೆ ಜನರು ತಮ್ಮ ನಾಯಿಗಳೊಂದಿಗೆ ನಡೆಯುತ್ತಾರೆ",
        "ಬೆಳಿಗ್ಗೆ ನಾವು ಮಾರುಕಟ್ಟೆಗೆ ಹೋಗಿ ಮಕ್ಕಳಿಗೆ ರೊಟ್ಟಿ ಹಾಲು ಮೊಟ್ಟೆ ಖರೀದಿಸಿದೆವು",
        "ಈಗ ಎಷ್ಟು ಗಂಟೆ ನಾಳೆ ನಮ್ಮ ಮನೆಗೆ ಯಾವಾಗ ಹಿಂತಿರುಗಿ ಬರುತ್ತೀಯ",
        "ಪುಸ್ತಕ ಮೇಜಿನ ಮೇಲೆ ಇತ್ತು ಎಂದು ಅವಳು ಹೇಳಿದಳು ಆದರೆ ನನಗೆ ಎಲ್ಲಿಯೂ ಸಿಗಲಿಲ್ಲ",
        "ನನ್ನ ಅಣ್ಣ ಪ್ರತಿದಿನ ನಗರದಲ್ಲಿ ಕೆಲಸ ಮಾಡುತ್ತಾನೆ ರಾತ್ರಿ ತಡವಾಗಿ ಮನೆಗೆ ಬರುತ್ತಾನೆ",
        "ನಿನ್ನೆ ಚಳಿ ಇತ್ತು ಆದ್ದರಿಂದ ನಾವು ಮನೆಯಲ್ಲಿ ಇದ್ದು ಪುಸ್ತಕಗಳನ್ನು ಓದಿದೆವು",
        "ಶಾಲೆಯ ಹಿಂದಿನ ತೋಟದಲ್ಲಿ ಅನೇಕ ಹಳೆಯ ಮರಗಳಿವೆ",
        "ಹತ್ತಿರದ ನಿಲ್ದಾಣ ಎಲ್ಲಿದೆ ಮತ್ತು ಟಿಕೆಟ್ ಬೆಲೆ ಎಷ್ಟು ಹೇಳುವಿರಾ",
        "ನನ್ನ ತಂಗಿ ಅಡುಗೆ ಕಲಿಯುತ್ತಿದ್ದಾಳೆ ಇಂದು ತರಕಾರಿಗಳೊಂದಿಗೆ ಸೂಪ್ ಮಾಡಿದಳು",
        "ಕೆಲವು ದಿನ ವಿಶ್ರಾಂತಿ ಪಡೆಯಲು ಮತ್ತು ಹೆಚ್ಚು ನೀರು ಕುಡಿಯಲು ವೈದ್ಯರು ಹೇಳಿದರು",
        "ಮೂರು ಕಿಲೋ ಸೇಬು ಮತ್ತು ಅರ್ಧ ಕಿಲೋ ಚೀಸ್ ಖರೀದಿಸಲು ಬಯಸುತ್ತೇನೆ",
    ],
    "pa": [
        "ਸਾਰੇ ਮਨੁੱਖ ਆਜ਼ਾਦ ਜੰਮਦੇ ਹਨ ਅਤੇ ਇੱਜ਼ਤ ਅਤੇ ਹੱਕਾਂ ਵਿੱਚ ਬਰਾਬਰ ਹੁੰਦੇ ਹਨ",
        "ਘਰ ਦਰਿਆ ਦੇ ਨੇੜੇ ਹੈ ਅਤੇ ਸ਼ਾਮ ਨੂੰ ਲੋਕ ਆਪਣੇ ਕੁੱਤਿਆਂ ਨਾਲ ਤੁਰਦੇ ਹਨ",
        "ਅਸੀਂ ਸਵੇਰੇ ਬਾਜ਼ਾਰ ਗਏ ਅਤੇ ਬੱਚਿਆਂ ਲਈ ਰੋਟੀ ਦੁੱਧ ਅਤੇ ਅੰਡੇ ਖਰੀਦੇ",
        "ਹੁਣ ਕੀ ਵਜਿਆ ਹੈ ਅਤੇ ਤੂੰ ਕੱਲ੍ਹ ਸਾਡੇ ਘਰ ਕਦੋਂ ਵਾਪਸ ਆਵੇਂਗਾ",
        "ਉਸਨੇ ਕਿਹਾ ਕਿ ਕਿਤਾਬ ਮੇਜ਼ ਉੱਤੇ ਸੀ ਪਰ ਮੈਨੂੰ ਕਿਤੇ ਨਹੀਂ ਮਿਲੀ",
        "ਮੇਰਾ ਭਰਾ ਹਰ ਰੋਜ਼ ਸ਼ਹਿਰ ਵਿੱਚ ਕੰਮ ਕਰਦਾ ਹੈ ਅਤੇ ਰਾਤ ਨੂੰ ਦੇਰ ਨਾਲ ਘਰ ਆਉਂਦਾ ਹੈ",
        "ਕੱਲ੍ਹ ਠੰਢ ਸੀ ਇਸ ਲਈ ਅਸੀਂ ਘਰ ਰਹੇ ਅਤੇ ਕਿਤਾਬਾਂ ਪੜ੍ਹੀਆਂ",
        "ਸਕੂਲ ਦੇ ਪਿੱਛੇ ਬਾਗ ਵਿੱਚ ਬਹੁਤ ਪੁਰਾਣੇ ਰੁੱਖ ਹਨ",
        "ਕਿਰਪਾ ਕਰਕੇ ਦੱਸੋ ਨੇੜਲਾ ਸਟੇਸ਼ਨ ਕਿੱਥੇ ਹੈ ਅਤੇ ਟਿਕਟ ਦੀ ਕੀਮਤ ਕਿੰਨੀ ਹੈ",
        "ਮੇਰੀ ਭੈਣ ਖਾਣਾ ਬਣਾਉਣਾ ਸਿੱਖ ਰਹੀ ਹੈ ਅਤੇ ਅੱਜ ਸਬਜ਼ੀਆਂ ਨਾਲ ਸੂਪ ਬਣਾਇਆ",
        "ਡਾਕਟਰ ਨੇ ਉਸਨੂੰ ਕੁਝ ਦਿਨ ਆਰਾਮ ਕਰਨ ਅਤੇ ਬਹੁਤ ਪਾਣੀ ਪੀਣ ਲਈ ਕਿਹਾ",
        "ਮੈਂ ਤਿੰਨ ਕਿਲੋ ਸੇਬ ਅਤੇ ਅੱਧਾ ਕਿਲੋ ਪਨੀਰ ਖਰੀਦਣਾ ਚਾਹੁੰਦਾ ਹਾਂ",
    ],
    "ur": [
        "تمام انسان آزاد پیدا ہوئے ہیں اور عزت اور حقوق میں برابر ہیں",
        "گھر دریا کے قریب ہے اور شام کو لوگ اپنے کتوں کے ساتھ چلتے ہیں",
        "ہم صبح بازار گئے اور بچوں کے لیے روٹی دودھ اور انڈے خریدے",
        "ابھی کیا وقت ہوا ہے اور تم کل ہمارے گھر کب واپس آؤ گے",
        "اس نے کہا کہ کتاب میز پر تھی لیکن مجھے کہیں نہیں ملی",
        "میرا بھائی ہر روز شہر میں کام کرتا ہے اور رات کو دیر سے گھر آتا ہے",
        "کل سردی تھی اس لیے ہم گھر پر رہے اور کتابیں پڑھیں",
        "اسکول کے پیچھے باغ میں بہت پرانے درخت ہیں",
        "براہ کرم بتائیں قریبی اسٹیشن کہاں ہے اور ٹکٹ کی قیمت کتنی ہے",
        "میری بہن کھانا پکانا سیکھ رہی ہے اور آج سبزیوں کا سوپ بنایا",
        "ڈاکٹر نے اسے کچھ دن آرام کرنے اور زیادہ پانی پینے کو کہا",
        "میں تین کلو سیب اور آدھا کلو پنیر خریدنا چاہتا ہوں",
    ],
    "tl": [
        "ang lahat ng tao ay isinilang na malaya at pantay pantay sa karangalan at mga karapatan",
        "ang bahay ay malapit sa ilog at sa gabi ay naglalakad ang mga tao kasama ang kanilang mga aso",
        "pumunta kami sa palengke kaninang umaga at bumili ng tinapay gatas at itlog para sa mga bata",
        "anong oras na ngayon at kailan ka babalik sa aming bahay bukas",
        "sinabi niya na ang libro ay nasa ibabaw ng mesa pero hindi ko ito mahanap kahit saan",
        "ang kapatid kong lalaki ay nagtatrabaho sa lungsod araw araw at umuuwi nang gabi na",
        "malamig ang panahon kahapon kaya nanatili kami sa bahay at nagbasa ng mga libro",
        "maraming lumang puno sa hardin sa likod ng paaralan",
        "maaari mo bang sabihin kung nasaan ang pinakamalapit na istasyon at magkano ang tiket",
        "ang aking kapatid na babae ay nag aaral magluto at gumawa ngayon ng sopas na may gulay",
        "sinabi ng doktor na magpahinga siya ng ilang araw at uminom ng maraming tubig",
        "gusto kong bumili ng tatlong kilo ng mansanas at kalahating kilo ng keso",
    ],
    # batch 5 (r17, post-queue): ka hy ne — Georgian and Armenian
    # graduate from the rejection fixtures (their scripts are unique, the
    # sw/lt/et/ca batch-3 move again); Nepali is the measured Devanagari
    # cousin of hi/mr, separated by its हरू plurals and छ/छन्/गर्छ
    # verb forms.
    "ka": [
        "ყველა ადამიანი იბადება თავისუფალი და თანასწორი თავისი ღირსებითა და უფლებებით",
        "სახლი მდინარის ახლოს არის და საღამოს ხალხი თავიანთ ძაღლებთან ერთად სეირნობს",
        "დილით ბაზარში წავედით და ბავშვებისთვის პური რძე და კვერცხი ვიყიდეთ",
        "ახლა რომელი საათია და ხვალ როდის დაბრუნდები ჩვენს სახლში",
        "მან თქვა რომ წიგნი მაგიდაზე იყო მაგრამ ვერსად ვიპოვე",
        "ჩემი ძმა ყოველდღე ქალაქში მუშაობს და ღამით გვიან ბრუნდება სახლში",
        "გუშინ ციოდა ამიტომ სახლში დავრჩით და წიგნებს ვკითხულობდით",
        "სკოლის უკან ბაღში ბევრი ძველი ხეა",
        "გთხოვთ მითხრათ სად არის უახლოესი სადგური და რა ღირს ბილეთი",
        "ჩემი და სწავლობს საჭმლის მომზადებას და დღეს ბოსტნეულის წვნიანი მოამზადა",
        "ექიმმა უთხრა რამდენიმე დღე დაესვენა და ბევრი წყალი დაელია",
        "მინდა ვიყიდო სამი კილო ვაშლი და ნახევარი კილო ყველი",
    ],
    "hy": [
        "բոլոր մարդիկ ծնվում են ազատ և հավասար իրենց արժանապատվությամբ և իրավունքներով",
        "տունը գետի մոտ է և երեկոյան մարդիկ քայլում են իրենց շների հետ",
        "առավոտյան գնացինք շուկա և երեխաների համար հաց կաթ և ձու գնեցինք",
        "հիմա ժամը քանիսն է և վաղը երբ կվերադառնաս մեր տուն",
        "նա ասաց որ գիրքը սեղանի վրա էր բայց ես ոչ մի տեղ չգտա",
        "իմ եղբայրը ամեն օր քաղաքում աշխատում է և գիշերը ուշ է տուն գալիս",
        "երեկ ցուրտ էր այդ պատճառով մենք տանը մնացինք և գրքեր կարդացինք",
        "դպրոցի հետևում գտնվող այգում շատ հին ծառեր կան",
        "խնդրում եմ ասեք որտեղ է մոտակա կայարանը և որքան արժե տոմսը",
        "քույրս սովորում է ճաշ պատրաստել և այսօր բանջարեղենով ապուր պատրաստեց",
        "բժիշկը նրան ասաց մի քանի օր հանգստանալ և շատ ջուր խմել",
        "ուզում եմ գնել երեք կիլո խնձոր և կես կիլո պանիր",
    ],
    "ne": [
        "सबै मानिसहरू स्वतन्त्र र समान मर्यादा तथा अधिकार लिएर जन्मेका हुन्छन्",
        "घर नदीको नजिक छ र साँझमा मानिसहरू आफ्ना कुकुरहरूसँग हिँड्छन्",
        "हामी बिहान बजार गयौं र बालबालिकाका लागि रोटी दूध र अण्डा किन्यौं",
        "अहिले कति बज्यो र तिमी भोलि हाम्रो घर कहिले फर्किन्छौ",
        "उनले भनिन् किताब टेबलमा थियो तर मैले कतै भेटिनँ",
        "मेरो दाइ हरेक दिन सहरमा काम गर्छन् र राति ढिलो घर फर्कन्छन्",
        "हिजो जाडो थियो त्यसैले हामी घरमै बस्यौं र किताबहरू पढ्यौं",
        "विद्यालयको पछाडिको बगैंचामा धेरै पुराना रूखहरू छन्",
        "कृपया भन्नुहोस् नजिकको स्टेसन कहाँ छ र टिकटको मूल्य कति हो",
        "मेरी बहिनी खाना पकाउन सिक्दै छिन् र आज तरकारीको सुप बनाइन्",
        "डाक्टरले उनलाई केही दिन आराम गर्न र धेरै पानी पिउन भने",
        "म तीन किलो स्याउ र आधा किलो पनिर किन्न चाहन्छु",
    ],
    # batch 6 (r18): am km lo si my — the five rejection-stressor /
    # real-crawl languages with UNIQUE scripts (Ethiopic, Khmer, Lao,
    # Sinhala, Myanmar), the cheapest adds per the batch-3/4/5 pattern:
    # no cousin in the snapshot shares a single script gram, so the
    # gate's correctness rides the script mass. am/km graduate from the
    # rejection fixtures; the new unseen-script stressors are Tibetan
    # and Dhivehi (Thaana).
    "am": [
        "ሁሉም ሰዎች በክብርና በመብት እኩል ሆነው በነጻነት ይወለዳሉ",
        "ቤቱ ከወንዙ አጠገብ ነው እና ሰዎች ማታ ከውሾቻቸው ጋር ይራመዳሉ",
        "ጠዋት ወደ ገበያ ሄድን እና ለልጆቹ ዳቦ ወተት እና እንቁላል ገዛን",
        "አሁን ስንት ሰዓት ነው እና ነገ ወደ ቤታችን መቼ ትመለሳለህ",
        "መጽሐፉ ጠረጴዛው ላይ ነበር አለች ግን የትም ማግኘት አልቻልኩም",
        "ወንድሜ በየቀኑ በከተማ ይሠራል እና ማታ ዘግይቶ ወደ ቤት ይመጣል",
        "ትናንት ብርድ ነበር ስለዚህ ቤት ቆየን እና መጽሐፍትን አነበብን",
        "ከትምህርት ቤቱ ጀርባ ባለው የአትክልት ስፍራ ብዙ አሮጌ ዛፎች አሉ",
        "እባክህ የቅርቡ ጣቢያ የት እንደሆነ እና ትኬቱ ስንት እንደሚያወጣ ንገረኝ",
        "እህቴ ምግብ ማብሰል እየተማረች ነው እና ዛሬ የአትክልት ሾርባ ሠራች",
        "ሐኪሙ ለጥቂት ቀናት እንዲያርፍ እና ብዙ ውሃ እንዲጠጣ ነገረው",
        "ሦስት ኪሎ ፖም እና ግማሽ ኪሎ አይብ መግዛት እፈልጋለሁ",
    ],
    "km": [
        "មនុស្សទាំងអស់កើតមកមានសេរីភាព និងស្មើភាពគ្នាក្នុងសេចក្តីថ្លៃថ្នូរនិងសិទ្ធិ",
        "ផ្ទះនៅជិតទន្លេ ហើយនៅពេលល្ងាចមនុស្សដើរលេងជាមួយឆ្កែរបស់ពួកគេ",
        "ពេលព្រឹកយើងទៅផ្សារ ហើយទិញនំប៉័ង ទឹកដោះគោ និងស៊ុតសម្រាប់កុមារ",
        "ឥឡូវនេះម៉ោងប៉ុន្មាន ហើយថ្ងៃស្អែកអ្នកនឹងត្រឡប់មកផ្ទះយើងនៅពេលណា",
        "នាងបាននិយាយថាសៀវភៅនៅលើតុ ប៉ុន្តែខ្ញុំរកមិនឃើញនៅកន្លែងណាទេ",
        "បងប្រុសរបស់ខ្ញុំធ្វើការនៅទីក្រុងរាល់ថ្ងៃ ហើយត្រឡប់មកផ្ទះយប់ជ្រៅ",
        "ម្សិលមិញអាកាសធាតុត្រជាក់ ដូច្នេះយើងនៅផ្ទះ ហើយអានសៀវភៅ",
        "មានដើមឈើចាស់ៗជាច្រើននៅក្នុងសួនខាងក្រោយសាលារៀន",
        "សូមប្រាប់ខ្ញុំថាស្ថានីយ៍ជិតបំផុតនៅឯណា ហើយសំបុត្រតម្លៃប៉ុន្មាន",
        "បងស្រីរបស់ខ្ញុំកំពុងរៀនធ្វើម្ហូប ហើយថ្ងៃនេះនាងធ្វើស៊ុបបន្លែ",
        "វេជ្ជបណ្ឌិតបានប្រាប់គាត់ឱ្យសម្រាកពីរបីថ្ងៃ ហើយផឹកទឹកឱ្យបានច្រើន",
        "ខ្ញុំចង់ទិញផ្លែប៉ោមបីគីឡូ និងឈីសកន្លះគីឡូ",
    ],
    "lo": [
        "ຄົນທຸກຄົນເກີດມາມີອິດສະລະພາບ ແລະສະເໝີພາບໃນກຽດສັກສີແລະສິດທິ",
        "ເຮືອນຢູ່ໃກ້ແມ່ນ້ຳ ແລະຕອນແລງຜູ້ຄົນຍ່າງຫຼິ້ນກັບໝາຂອງເຂົາເຈົ້າ",
        "ຕອນເຊົ້າພວກເຮົາໄປຕະຫຼາດ ແລະຊື້ເຂົ້າຈີ່ ນົມ ແລະໄຂ່ໃຫ້ເດັກນ້ອຍ",
        "ດຽວນີ້ຈັກໂມງແລ້ວ ແລະມື້ອື່ນເຈົ້າຈະກັບມາເຮືອນເຮົາເວລາໃດ",
        "ລາວເວົ້າວ່າປຶ້ມຢູ່ເທິງໂຕະ ແຕ່ຂ້ອຍຊອກບໍ່ເຫັນຢູ່ໃສເລີຍ",
        "ອ້າຍຂອງຂ້ອຍເຮັດວຽກຢູ່ໃນເມືອງທຸກມື້ ແລະກັບເຮືອນຊ້າໃນຕອນກາງຄືນ",
        "ມື້ວານອາກາດໜາວ ສະນັ້ນພວກເຮົາຢູ່ເຮືອນ ແລະອ່ານປຶ້ມ",
        "ມີຕົ້ນໄມ້ເກົ່າຫຼາຍຕົ້ນຢູ່ໃນສວນຫຼັງໂຮງຮຽນ",
        "ກະລຸນາບອກຂ້ອຍວ່າສະຖານີທີ່ໃກ້ທີ່ສຸດຢູ່ໃສ ແລະປີ້ລາຄາເທົ່າໃດ",
        "ເອື້ອຍຂອງຂ້ອຍກຳລັງຮຽນແຕ່ງກິນ ແລະມື້ນີ້ລາວເຮັດແກງຜັກ",
        "ທ່ານໝໍບອກໃຫ້ລາວພັກຜ່ອນສອງສາມມື້ ແລະດື່ມນ້ຳຫຼາຍໆ",
        "ຂ້ອຍຢາກຊື້ໝາກໂປມສາມກິໂລ ແລະເນີຍແຂງເຄິ່ງກິໂລ",
    ],
    "si": [
        "සියලු මිනිසුන් උපතින්ම නිදහස් වන අතර ගරුත්වයෙන් හා අයිතිවාසිකම්වලින් සමාන වේ",
        "ගෙදර ගඟ අසල පිහිටා ඇති අතර සවස මිනිසුන් ඔවුන්ගේ බල්ලන් සමඟ ඇවිදිති",
        "උදේ අපි වෙළඳපොළට ගොස් ළමයින්ට පාන් කිරි සහ බිත්තර මිලදී ගත්තෙමු",
        "දැන් වෙලාව කීයද සහ හෙට ඔබ අපේ ගෙදරට එන්නේ කවදාද",
        "පොත මේසය උඩ තිබුණා කියා ඇය කීවා නමුත් මට කොහේවත් හොයාගන්න බැරි වුණා",
        "මගේ සහෝදරයා හැමදාම නගරයේ වැඩ කරන අතර රෑ පරක්කු වී ගෙදර එයි",
        "ඊයේ සීතල නිසා අපි ගෙදර නැවතී පොත් කියෙව්වෙමු",
        "පාසල පිටුපස වත්තේ පරණ ගස් ගොඩක් තිබේ",
        "කරුණාකර ළඟම දුම්රිය ස්ථානය කොහෙද සහ ටිකට් එකක මිල කීයද කියන්න",
        "මගේ සහෝදරිය උයන්න ඉගෙන ගන්නවා අද ඇය එළවළු සුප් එකක් හැදුවා",
        "වෛද්‍යවරයා ඔහුට දින කිහිපයක් විවේක ගන්නත් වතුර ගොඩක් බොන්නත් කීවා",
        "මට ඇපල් කිලෝ තුනක් සහ චීස් කිලෝ භාගයක් ගන්න ඕනේ",
    ],
    "my": [
        "လူတိုင်းသည် လွတ်လပ်၍ ဂုဏ်သိက္ခာနှင့် အခွင့်အရေးတို့၌ တန်းတူညီမျှ မွေးဖွားလာကြသည်",
        "အိမ်သည် မြစ်အနီးတွင် ရှိပြီး ညနေပိုင်းတွင် လူများသည် ခွေးများနှင့်အတူ လမ်းလျှောက်ကြသည်",
        "မနက်ပိုင်းတွင် ကျွန်ုပ်တို့ ဈေးသို့သွားပြီး ကလေးများအတွက် ပေါင်မုန့် နို့နှင့် ကြက်ဥများ ဝယ်ခဲ့သည်",
        "အခု ဘယ်နှနာရီရှိပြီလဲ မနက်ဖြန် ကျွန်ုပ်တို့အိမ်သို့ ဘယ်အချိန် ပြန်လာမလဲ",
        "စာအုပ်သည် စားပွဲပေါ်တွင် ရှိသည်ဟု သူမပြောသော်လည်း ကျွန်ုပ် ဘယ်နေရာမှာမှ ရှာမတွေ့ပါ",
        "ကျွန်ုပ်၏အစ်ကိုသည် နေ့တိုင်း မြို့ထဲတွင် အလုပ်လုပ်ပြီး ညဉ့်နက်မှ အိမ်ပြန်သည်",
        "မနေ့က ရာသီဥတုအေးသောကြောင့် ကျွန်ုပ်တို့ အိမ်မှာနေပြီး စာအုပ်များ ဖတ်ခဲ့သည်",
        "ကျောင်းနောက်ဘက် ဥယျာဉ်ထဲတွင် သစ်ပင်အိုများစွာ ရှိသည်",
        "အနီးဆုံးဘူတာရုံ ဘယ်မှာရှိသလဲ လက်မှတ်တစ်စောင် ဘယ်လောက်ကျသလဲ ပြောပြပေးပါ",
        "ကျွန်ုပ်၏ညီမသည် ချက်ပြုတ်သင်နေပြီး ယနေ့ ဟင်းသီးဟင်းရွက်စွပ်ပြုတ် ချက်ခဲ့သည်",
        "ဆရာဝန်က သူ့အား ရက်အနည်းငယ် အနားယူရန်နှင့် ရေများများသောက်ရန် ပြောသည်",
        "ပန်းသီး သုံးကီလိုနှင့် ဒိန်ခဲ တစ်ဝက်ကီလို ဝယ်ချင်သည်",
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
    return [g for g, _ in ranked[:P]]


def main() -> int:
    print("package graft.model\n")
    print("/** GENERATED by tools/gen_lang_profiles.py — Cavnar–Trenkle")
    print(" * character 1-3-gram rank profiles (language profiles top-512,")
    print(" * document profiles top-64) + per-language rejection cutoffs,")
    print(" * from the public-domain seed text embedded in the tool.")
    print(" * Regenerate rather than editing; see the tool's docstring for")
    print(" * method, seeds, and cutoff calibration. */")
    print("object LangProfiles {\n")
    print("  /** Document profile length: a document is represented by its")
    print("    * top-rankSize grams (count desc, UTF-8 byte order asc). */")
    print("  val rankSize: Int = %d\n" % D)
    print("  /** Language profile length; also the out-of-place penalty for a")
    print("    * document gram absent from a language profile. */")
    print("  val profileSize: Int = %d\n" % P)
    print("  /** Per-language rejection cutoffs x1000: a doc classified as L is")
    print("    * accepted iff bestDist*1000 <= m*profileSize*cutoffs(L), else")
    print("    * 'und'. Integer math so the kernel and the DuckDB oracle replay")
    print("    * the same comparison exactly. Per-language because normalized")
    print("    * distance is script-dependent (CJK sits high against its own")
    print("    * profile, Latin low); each = held-out fixture max + 0.05. */")
    cut_lits = ", ".join(f'"{lang}" -> {CUTOFFS[lang]}' for lang in sorted(SEEDS))
    print("  val cutoffs: Map[String, Int] = Map(\n    %s)\n" % cut_lits)
    print("  /** One method per language keeps every initializer far below the")
    print("    * JVM 64KB method-bytecode cap (a single 8k-literal Seq would")
    print("    * not). */")
    for lang in sorted(SEEDS):
        grams = profile(SEEDS[lang])
        lits = ", ".join('"' + g.replace("\\", "\\\\").replace('"', '\\"') + '"'
                         for g in grams)
        print(f"  private def {lang}Profile: Seq[String] = Seq({lits})\n")
    print("  /** (language, grams in rank order 1..profileSize). */")
    print("  val profiles: Seq[(String, Seq[String])] = Seq(")
    entries = [f'    "{lang}" -> {lang}Profile' for lang in sorted(SEEDS)]
    print(",\n".join(entries) + ")\n")
    print("""  /** The snapshot as a DuckDB-inlinable relation `(lang, g, r)`. */
  def oracleValuesSql: String = {
    val vs = for {
      (lang, grams) <- profiles
      (g, i) <- grams.zipWithIndex
    } yield s"('$lang','${g.replace("'", "''")}',${i + 1})"
    vs.mkString("(VALUES ", ", ", ") lp(lang, g, r)")
  }

  /** The cutoffs as a DuckDB-inlinable relation `(lang, cut)`. */
  def cutoffValuesSql: String =
    cutoffs.toSeq.sortBy(_._1).map { case (l, c) => s"('$l',$c)" }
      .mkString("(VALUES ", ", ", ") lc(lang, cut)")
}""")
    for lang in sorted(SEEDS):
        print(f"// {lang}: {len(profile(SEEDS[lang]))} grams, cutoff "
              f"{CUTOFFS[lang]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
