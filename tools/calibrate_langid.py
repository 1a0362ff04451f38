#!/usr/bin/env python3
"""Calibrate the per-language rejection cutoffs for gen_lang_profiles.py
and measure held-out accuracy/confusion BEFORE regenerating the Scala
snapshot.

Replicates graft.expressions.DocKernels.classifyNgram exactly:
normalize (lowercase, \\s runs -> ' ', trim, pad), codepoint 1-3-grams,
rank-D doc profile (count desc, UTF-8 byte order asc), out-of-place
distance vs the rank-P language profiles (absent penalty P), argmin with
language-ascending tie-break; a winner L is accepted iff
bestDist*1000 <= m*P*cutoff(L).

Fixture families mirror LangIdAccuracySpec (keep the two in sync):
 - word bags: 50 x 8-word rotations per language from the spec pools
 - prose: one composed sentence per language
 - oracle plants: the LlmQueries langPlants sentences
 - rejection plants: languages NO profile covers — must reject

Output: per-language max in-language normalized distance (the cutoff
floor), suggested cutoff (max + 0.05), misclassification table, and
whether every rejection plant rejects under the suggested cutoffs.

Usage: python3 tools/calibrate_langid.py
"""
import sys

from gen_lang_profiles import SEEDS, P, D, profile, normalize, CUTOFFS

# ---- held-out fixtures (MIRROR LangIdAccuracySpec) -----------------------

POOLS = {
    "en": ["the", "and", "with", "from", "house", "water", "children",
           "morning", "street", "people", "good", "small", "they", "have"],
    "es": ["los", "las", "una", "con", "para", "casa", "agua", "niños",
           "calle", "gente", "bueno", "pequeño", "ellos", "tienen"],
    "fr": ["les", "des", "une", "avec", "pour", "maison", "eau",
           "enfants", "rue", "gens", "bon", "petit", "ils", "ont"],
    "de": ["die", "und", "mit", "von", "haus", "wasser", "kinder",
           "morgen", "straße", "leute", "gut", "klein", "sie", "haben"],
    "pt": ["os", "as", "uma", "com", "para", "casa", "água", "crianças",
           "rua", "pessoas", "bom", "pequeno", "eles", "têm"],
    "it": ["gli", "che", "il", "è", "più", "perché", "sono", "molto",
           "bambini", "strada", "buono", "piccolo", "loro", "hanno"],
    "ru": ["дом", "вода", "дети", "утро", "улица", "люди", "хорошо",
           "маленький", "они", "есть", "и", "с"],
    "ar": ["البيت", "الماء", "الأطفال", "الصباح", "الشارع", "الناس",
           "جيد", "صغير", "هم", "لديهم", "و", "مع"],
    "ja": ["いえは", "みずを", "こどもが", "あさに", "みちで", "ひとびとの",
           "よいです", "ちいさい", "あります", "いきます"],
    "zh": ["房子的", "水和", "孩子们", "早上在", "街道上", "人们是",
           "很好的", "小小的", "他们有", "我们的"],
    "ko": ["집은", "물을", "아이들이", "아침에", "거리에서", "사람들의",
           "좋아요", "작은", "있습니다", "갑니다"],
    "hi": ["घर", "पानी", "बच्चे", "सुबह", "सड़क", "लोग", "अच्छा",
           "छोटा", "वे", "उनके", "और", "के", "साथ"],
    "tr": ["evde", "suyu", "çocuklar", "sabahleyin", "sokakta",
           "insanların", "iyidir", "küçük", "onlar", "vardır", "ile", "bir"],
    "nl": ["het", "een", "met", "van", "huis", "water", "kinderen",
           "ochtend", "straat", "mensen", "goed", "klein", "zij", "hebben"],
    "pl": ["oni", "mają", "woda", "dzieci", "rano", "ulica", "ludzie",
           "dobry", "mały", "jest", "oraz", "przy", "domu"],
    "id": ["mereka", "dengan", "untuk", "anak", "pagi", "jalan",
           "orang", "baik", "kecil", "mempunyai", "dan", "yang", "di", "ke"],
    "hu": ["ők", "vannak", "víz", "gyerekek", "reggel", "utca",
           "emberek", "jó", "kicsi", "ház", "és", "vagy", "most", "ebben"],
    # batch 2
    "sv": ["huset", "vattnet", "barnen", "morgonen", "gatan", "människor",
           "bra", "liten", "och", "från", "inte", "vad", "mycket", "även"],
    "fi": ["talo", "vesi", "lapset", "aamulla", "katu", "ihmiset",
           "hyvä", "pieni", "ovat", "kanssa", "mutta", "myös", "että",
           "kaupungissa"],
    "da": ["børnene", "gaden", "sproget", "drengen", "pigen", "hvornår",
           "halvfjerds", "køkkenet", "bogen", "æblet", "øjeblik",
           "syvende", "meget", "tyve"],
    "no": ["barna", "gata", "språket", "gutten", "jenta", "sytti",
           "kjøkkenet", "boka", "eplet", "øyeblikk", "sjuende", "veldig",
           "tjue", "vannet"],
    "cs": ["dům", "voda", "děti", "ráno", "ulice", "lidé", "dobře",
           "malý", "oni", "mají", "který", "hodně", "město", "škola"],
    "ro": ["casa", "apa", "copiii", "dimineața", "strada", "oamenii",
           "bun", "mic", "ei", "au", "și", "pentru", "unde", "față"],
    "uk": ["будинок", "вода", "діти", "вранці", "вулиця", "люди",
           "добре", "маленький", "вони", "мають", "його", "вже",
           "місто", "який"],
    "el": ["σπίτι", "νερό", "παιδιά", "πρωί", "δρόμος", "άνθρωποι",
           "καλά", "μικρός", "αυτοί", "έχουν", "και", "με", "για", "πού"],
    "he": ["הבית", "המים", "הילדים", "הבוקר", "הרחוב", "האנשים", "טוב",
           "קטן", "הם", "יש", "ועם", "אל", "שלהם", "היום"],
    "th": ["บ้าน", "น้ำ", "เด็ก", "ตอนเช้า", "ถนน", "ผู้คน", "ดี",
           "เล็ก", "พวกเขา", "มี", "และ", "กับ", "ใน", "ที่"],
    "vi": ["ngôi nhà", "nước", "trẻ em", "buổi sáng", "đường phố",
           "mọi người", "tốt", "nhỏ", "họ", "có", "và", "với", "của", "ở"],
    "is": ["húsið", "vatnið", "börnin", "morgnana", "gatan", "fólkið",
           "góður", "lítill", "þeir", "með", "ekki", "hvenær", "þetta",
           "því"],
    "bg": ["къщата", "водата", "децата", "сутринта", "улицата", "хората",
           "добре", "малък", "те", "имат", "във", "къде", "много",
           "защото"],
    # batch 3
    "ca": ["els", "una", "amb", "per", "casa", "aigua", "nens", "matí",
           "carrer", "gent", "bo", "petit", "tenen", "molt"],
    "hr": ["kuća", "voda", "djeca", "ujutro", "ulica", "ljudi", "dobro",
           "mali", "oni", "imaju", "grad", "škola", "vrijeme", "jako"],
    "sr": ["кућа", "вода", "деца", "ујутру", "улица", "људи", "добро",
           "мали", "они", "имају", "град", "школа", "време", "веома"],
    "sk": ["dom", "voda", "deti", "ráno", "ulica", "ľudia", "dobre",
           "malý", "oni", "majú", "mesto", "škola", "veľa", "keď"],
    "sl": ["hiša", "voda", "otroci", "zjutraj", "ulica", "ljudje",
           "dobro", "majhen", "oni", "imajo", "mesto", "šola", "veliko",
           "zdaj"],
    "lt": ["namas", "vanduo", "vaikai", "rytas", "gatvė", "žmonės",
           "gerai", "mažas", "jie", "turi", "miestas", "mokykla", "daug",
           "dabar"],
    "lv": ["māja", "ūdens", "bērni", "rīts", "iela", "cilvēki", "labi",
           "mazs", "viņi", "viņiem", "pilsēta", "skola", "daudz",
           "tagad"],
    "et": ["maja", "vesi", "lapsed", "hommik", "tänav", "inimesed",
           "hästi", "väike", "nemad", "neil", "linn", "kool", "palju",
           "praegu"],
    "fa": ["خانه", "آب", "بچه", "صبح", "خیابان", "مردم", "خوب", "کوچک",
           "آنها", "دارند", "شهر", "مدرسه", "خیلی", "حالا"],
    "sw": ["nyumba", "maji", "watoto", "asubuhi", "barabara", "watu",
           "nzuri", "ndogo", "wao", "wana", "mji", "shule", "sana",
           "sasa"],
    # batch 4
    "bn": ["বাড়ি", "পানি", "শিশুরা", "সকালে", "রাস্তা", "মানুষ", "ভালো",
           "ছোট", "তারা", "আছে", "এবং", "শহর", "স্কুল", "এখন"],
    "ta": ["வீடு", "தண்ணீர்", "குழந்தைகள்", "காலையில்", "தெரு", "மக்கள்",
           "நல்ல", "சிறிய", "அவர்கள்", "உள்ளது", "மற்றும்", "நகரம்",
           "பள்ளி", "இப்போது"],
    "te": ["ఇల్లు", "నీరు", "పిల్లలు", "ఉదయం", "వీధి", "ప్రజలు", "మంచి",
           "చిన్న", "వారు", "ఉంది", "మరియు", "నగరం", "బడి", "ఇప్పుడు"],
    "ml": ["വീട്", "വെള്ളം", "കുട്ടികൾ", "രാവിലെ", "തെരുവ്", "ആളുകൾ",
           "നല്ല", "ചെറിയ", "അവർ", "ഉണ്ട്", "ഒപ്പം", "നഗരം", "സ്കൂൾ",
           "ഇപ്പോൾ"],
    "mr": ["पाणी", "मुले", "सकाळी", "रस्ता", "लोक", "चांगले", "लहान",
           "त्यांनी", "आहेत", "आणि", "शहरात", "शाळा", "आता", "झाडे"],
    "gu": ["ઘર", "પાણી", "બાળકો", "સવારે", "શેરી", "લોકો", "સારું",
           "નાનું", "તેઓ", "છે", "અને", "શહેર", "શાળા", "હવે"],
    "kn": ["ಮನೆ", "ನೀರು", "ಮಕ್ಕಳು", "ಬೆಳಿಗ್ಗೆ", "ಬೀದಿ", "ಜನರು",
           "ಒಳ್ಳೆಯ", "ಚಿಕ್ಕ", "ಅವರು", "ಇದೆ", "ಮತ್ತು", "ನಗರ", "ಶಾಲೆ",
           "ಈಗ"],
    "pa": ["ਘਰ", "ਪਾਣੀ", "ਬੱਚੇ", "ਸਵੇਰੇ", "ਗਲੀ", "ਲੋਕ", "ਚੰਗਾ", "ਛੋਟਾ",
           "ਉਹ", "ਹਨ", "ਅਤੇ", "ਸ਼ਹਿਰ", "ਸਕੂਲ", "ਹੁਣ"],
    "ur": ["گھر", "پانی", "بچے", "صبح", "گلی", "لوگ", "اچھا", "چھوٹا",
           "وہ", "ہیں", "اور", "شہر", "اسکول", "اب"],
    "tl": ["bahay", "tubig", "bata", "umaga", "kalye", "tao", "mabuti",
           "maliit", "sila", "mayroon", "ang", "lungsod", "paaralan",
           "ngayon"],
    # batch 5
    "ka": ["სახლი", "წყალი", "ბავშვები", "დილით", "ქუჩა", "ხალხი",
           "კარგი", "პატარა", "ისინი", "აქვთ", "და", "ქალაქი", "სკოლა",
           "ახლა"],
    "hy": ["տուն", "ջուր", "երեխաներ", "առավոտյան", "փողոց", "մարդիկ",
           "լավ", "փոքր", "նրանք", "ունեն", "և", "քաղաք", "դպրոց",
           "հիմա"],
    # ne vs hi/mr share Devanagari — the bag words carry the ne-distinct
    # हरू plurals and छन्/गर्छन् verb forms (the sk-needed-ľ/keď rule)
    "ne": ["घरहरू", "पानी", "बालबालिका", "बिहान", "सडक", "मानिसहरू",
           "राम्रो", "सानो", "उनीहरू", "छन्", "गर्छन्", "सहरमा",
           "विद्यालय", "अहिले"],
    # batch 6: five unique scripts — any in-script bag should classify
    "am": ["ቤቱ", "ውሃ", "ልጆች", "ጠዋት", "መንገድ", "ሰዎች", "ጥሩ",
           "ትንሽ", "እነሱ", "አላቸው", "እና", "ጋር", "ከተማ", "ትምህርት"],
    "km": ["ផ្ទះ", "ទឹក", "កុមារ", "ពេលព្រឹក", "ផ្លូវ", "មនុស្ស",
           "ល្អ", "តូច", "ពួកគេ", "មាន", "និង", "ជាមួយ", "ទីក្រុង",
           "សាលា"],
    "lo": ["ເຮືອນ", "ນ້ຳ", "ເດັກນ້ອຍ", "ຕອນເຊົ້າ", "ຖະໜົນ", "ຜູ້ຄົນ",
           "ດີ", "ນ້ອຍ", "ເຂົາເຈົ້າ", "ມີ", "ແລະ", "ກັບ", "ເມືອງ",
           "ໂຮງຮຽນ"],
    "si": ["ගෙදර", "වතුර", "ළමයි", "උදේ", "පාර", "මිනිසුන්", "හොඳ",
           "පොඩි", "ඔවුන්", "තියෙනවා", "සහ", "එක්ක", "නගරය", "පාසල"],
    "my": ["အိမ်", "ရေ", "ကလေးများ", "မနက်", "လမ်း", "လူများ",
           "ကောင်း", "သေးငယ်", "သူတို့", "ရှိသည်", "နှင့်", "အတူ",
           "မြို့", "ကျောင်း"],
}

# unspaced scripts: word bags join without separators (matches the spec)
NO_SPACE = {"ja", "zh", "th"}

PROSE = {
    "en": "the students finished their homework before dinner and watched a movie together",
    "es": "los estudiantes terminaron sus deberes antes de la cena y vieron una película juntos",
    "fr": "les étudiants ont fini leurs devoirs avant le dîner et ont regardé un film ensemble",
    "de": "die schüler beendeten ihre hausaufgaben vor dem abendessen und sahen zusammen einen film",
    "pt": "as crianças não estão na escola porque hoje é um feriado nacional",
    "it": "la nostra squadra ha vinto la partita ieri sera e tutti erano molto felici",
    "ru": "наша команда выиграла игру вчера вечером и все были очень рады",
    "ar": "فاز فريقنا بالمباراة مساء أمس وكان الجميع سعداء جدا",
    "ja": "学生たちは夕食の前に宿題を終えて、一緒に映画を見ました。",
    "zh": "学生们在晚饭前完成了作业，然后一起看了电影。",
    "ko": "학생들은 저녁 식사 전에 숙제를 끝내고 함께 영화를 봤습니다",
    "hi": "हमारी टीम ने कल शाम खेल जीता और सब बहुत खुश थे",
    "tr": "öğrenciler akşam yemeğinden önce ödevlerini bitirdiler ve birlikte film izlediler",
    "nl": "ons team heeft gisteravond de wedstrijd gewonnen en iedereen was erg blij",
    "pl": "nasza drużyna wygrała wczoraj wieczorem mecz i wszyscy byli bardzo szczęśliwi",
    "id": "pagi hari kami pergi ke pasar dan membeli roti susu dan telur untuk anak anak",
    "hu": "reggel elmentünk a piacra és kenyeret tejet és tojást vettünk a gyerekeknek",
    # batch 2
    "sv": "vårt lag vann matchen igår kväll och alla var mycket glada",
    "fi": "joukkueemme voitti pelin eilen illalla ja kaikki olivat hyvin iloisia",
    "da": "vores hold vandt kampen i går aftes og alle var meget glade",
    "no": "laget vårt vant kampen i går kveld og alle var veldig glade",
    "cs": "náš tým včera večer vyhrál zápas a všichni byli velmi šťastní",
    "ro": "echipa noastră a câștigat meciul aseară și toată lumea a fost foarte fericită",
    "uk": "студенти закінчили домашнє завдання перед вечерею і разом подивилися фільм",
    "el": "οι μαθητές τελείωσαν τα μαθήματά τους πριν από το δείπνο και είδαν μια ταινία μαζί",
    "he": "התלמידים סיימו את שיעורי הבית לפני ארוחת הערב וצפו יחד בסרט",
    "th": "นักเรียนทำการบ้านเสร็จก่อนอาหารเย็นและดูหนังด้วยกัน",
    "vi": "các học sinh làm xong bài tập về nhà trước bữa tối và cùng nhau xem phim",
    "is": "nemendurnir kláruðu heimavinnuna fyrir kvöldmat og horfðu saman á kvikmynd",
    "bg": "учениците завършиха домашната си работа преди вечеря и гледаха филм заедно",
    # batch 3
    "ca": "el nostre equip va guanyar el partit ahir a la nit i tothom estava molt content",
    "hr": "naša momčad je sinoć pobijedila u utakmici i svi su bili jako sretni",
    "sr": "наш тим је синоћ победио у утакмици и сви су били веома срећни",
    "sk": "nový učiteľ hovorí veľmi pomaly a žiaci mu dobre rozumejú aj keď je hodina dlhá",
    "sl": "naša ekipa je sinoči zmagala na tekmi in vsi so bili zelo veseli",
    "lt": "mūsų komanda vakar vakare laimėjo rungtynes ir visi buvo labai laimingi",
    "lv": "mūsu komanda vakar vakarā uzvarēja spēlē un visi bija ļoti priecīgi",
    "et": "meie võistkond võitis eile õhtul mängu ja kõik olid väga rõõmsad",
    "fa": "تیم ما دیشب بازی را برد و همه خیلی خوشحال بودند",
    "sw": "timu yetu ilishinda mchezo jana usiku na wote walifurahi sana",
    # batch 4
    "bn": "আমাদের দল গতকাল সন্ধ্যায় খেলায় জিতেছে এবং সবাই খুব খুশি ছিল",
    "ta": "எங்கள் அணி நேற்று இரவு போட்டியில் வென்றது எல்லோரும் மிகவும் மகிழ்ச்சியாக இருந்தனர்",
    "te": "మా జట్టు నిన్న రాత్రి ఆట గెలిచింది అందరూ చాలా సంతోషంగా ఉన్నారు",
    "ml": "ഞങ്ങളുടെ ടീം ഇന്നലെ രാത്രി കളി ജയിച്ചു എല്ലാവരും വളരെ സന്തോഷത്തിലായിരുന്നു",
    "mr": "आमच्या संघाने काल रात्री सामना जिंकला आणि सगळे खूप आनंदी होते",
    "gu": "અમારી ટીમે ગઈકાલે રાત્રે રમત જીતી અને બધા ખૂબ ખુશ હતા",
    "kn": "ನಮ್ಮ ತಂಡ ನಿನ್ನೆ ರಾತ್ರಿ ಪಂದ್ಯ ಗೆದ್ದಿತು ಎಲ್ಲರೂ ತುಂಬಾ ಸಂತೋಷವಾಗಿದ್ದರು",
    "pa": "ਸਾਡੀ ਟੀਮ ਨੇ ਕੱਲ੍ਹ ਰਾਤ ਮੈਚ ਜਿੱਤਿਆ ਅਤੇ ਸਾਰੇ ਬਹੁਤ ਖੁਸ਼ ਸਨ",
    "ur": "ہماری ٹیم نے کل رات میچ جیتا اور سب بہت خوش تھے",
    "tl": "nanalo ang aming koponan sa laro kagabi at lahat ay napakasaya",
    # batch 5
    "ka": "ჩვენმა გუნდმა გუშინ საღამოს თამაში მოიგო და ყველა ძალიან ბედნიერი იყო",
    "hy": "մեր թիմը երեկ երեկոյան հաղթեց խաղը և բոլորը շատ ուրախ էին",
    "ne": "हाम्रो टोलीले हिजो राति खेल जित्यो र सबै धेरै खुसी थिए",
    # batch 6
    "am": "ቡድናችን ትናንት ማታ ጨዋታውን አሸነፈ እና ሁሉም በጣም ደስተኞች ነበሩ",
    "km": "ក្រុមរបស់យើងឈ្នះការប្រកួតកាលពីយប់មិញ ហើយគ្រប់គ្នាសប្បាយចិត្តណាស់",
    "lo": "ທີມຂອງພວກເຮົາຊະນະການແຂ່ງຂັນເມື່ອຄືນນີ້ ແລະທຸກຄົນດີໃຈຫຼາຍ",
    "si": "අපේ කණ්ඩායම ඊයේ රෑ තරගය දිනුවා සහ හැමෝම ගොඩක් සතුටු වුණා",
    "my": "ကျွန်ုပ်တို့အသင်းသည် မနေ့ညက ပွဲကို အနိုင်ရခဲ့ပြီး အားလုံး အလွန်ပျော်ရွှင်ကြသည်",
}

# LlmQueries.langPlants — the oracle plants (with batch-2 ground truth)
ORACLE_PLANTS = {
    "en": "the children walk to the school in the morning and they read books with the teacher",
    "es": "los niños caminan a la escuela por la mañana y leen libros con el maestro en la ciudad",
    "fr": "les enfants marchent vers la maison le matin et ils lisent des livres avec le professeur dans la ville",
    "de": "die kinder gehen am morgen in die schule und sie lesen bücher mit dem lehrer in der stadt",
    "pt": "as crianças caminham para a escola de manhã e leem livros com o professor na cidade",
    "it": "i bambini camminano verso la scuola al mattino e leggono libri con il maestro nella città",
    "ru": "дети идут в школу утром и читают книги с учителем в городе каждый день недели",
    "ar": "يذهب الأطفال إلى المدرسة في الصباح ويقرؤون الكتب مع المعلم في المدينة كل يوم",
    "ja": "子供たちは朝に学校へ歩いて行き、先生と一緒に本を読みます。毎日街の中で遊びます。",
    "zh": "孩子们早上走路去学校，他们和老师一起读书。每天在城市里玩耍。",
    "ko": "아이들은 아침에 학교에 걸어가서 선생님과 함께 책을 읽습니다",
    "hi": "बच्चे सुबह स्कूल जाते हैं और शहर में शिक्षक के साथ किताबें पढ़ते हैं",
    "tr": "çocuklar sabah okula yürüyorlar ve şehirde öğretmenle birlikte kitap okuyorlar",
    "nl": "de kinderen lopen s ochtends naar school en lezen boeken met de leraar in de stad",
    "pl": "dzieci idą rano do szkoły i czytają książki z nauczycielem w mieście",
    "id": "anak anak berjalan ke sekolah pada pagi hari dan membaca buku dengan guru di kota",
    "hu": "a gyerekek reggel iskolába sétálnak és a tanárral együtt könyveket olvasnak a városban",
    "fi": "lapset kävelevät kouluun aamulla ja lukevat kirjoja opettajan kanssa kaupungissa",
    "sv": "barnen går till skolan på morgonen och läser böcker med läraren i staden",
    "vi": "những đứa trẻ đi bộ đến trường vào buổi sáng và đọc sách với giáo viên trong thành phố",
    "el": "τα παιδιά περπατούν στο σχολείο το πρωί και διαβάζουν βιβλία με τον δάσκαλο στην πόλη",
    "da": "børnene går i skole om morgenen og de læser bøger med læreren inde i byen",
    "no": "barna går til skolen om morgenen og leser bøker sammen med læreren sin i byen",
    "cs": "děti chodí ráno do školy a čtou si knihy s učitelem ve městě",
    "ro": "copiii merg dimineața la școală și citesc cărți cu profesorul în oraș",
    "uk": "діти йдуть вранці до школи і читають книжки з учителем у місті",
    "th": "เด็กเดินไปโรงเรียนในตอนเช้าและอ่านหนังสือกับครูในเมือง",
    "he": "הילדים הולכים לבית הספר בבוקר וקוראים ספרים עם המורה בעיר",
    "is": "börnin ganga í skólann á morgnana og lesa bækur með kennaranum í bænum",
    "bg": "децата вървят сутрин към училището и четат книги с учителя в града",
    # batch 3
    "ca": "els nens caminen cap a l escola al matí i llegeixen llibres amb el mestre",
    "hr": "djeca ujutro hodaju u školu i čitaju knjige s učiteljem u gradu",
    "sr": "деца ујутру пешаче у школу и читају књиге са учитељем у граду",
    "sk": "deti ráno kráčajú do školy a čítajú knihy s učiteľom v meste",
    "sl": "otroci zjutraj hodijo v šolo in berejo knjige z učiteljem v mestu",
    "lt": "vaikai ryte eina į mokyklą ir skaito knygas su mokytoju mieste",
    "lv": "bērni no rīta iet uz skolu un lasa grāmatas ar skolotāju pilsētā",
    "et": "lapsed kõnnivad hommikul kooli ja loevad koos õpetajaga raamatuid",
    "fa": "بچه ها صبح پیاده به مدرسه می روند و با معلم در شهر کتاب می خوانند",
    "sw": "watoto wanatembea kwenda shule asubuhi na kusoma vitabu na mwalimu mjini",
    # batch 4
    "bn": "শিশুরা সকালে হেঁটে স্কুলে যায় এবং শহরে শিক্ষকের সাথে বই পড়ে",
    "ta": "குழந்தைகள் காலையில் பள்ளிக்கு நடந்து செல்கிறார்கள் நகரத்தில் ஆசிரியருடன் புத்தகங்கள் படிக்கிறார்கள்",
    "te": "పిల్లలు ఉదయం బడికి నడిచి వెళతారు నగరంలో ఉపాధ్యాయుడితో పుస్తకాలు చదువుతారు",
    "ml": "കുട്ടികൾ രാവിലെ സ്കൂളിലേക്ക് നടന്നു പോകുന്നു നഗരത്തിൽ അധ്യാപകനോടൊപ്പം പുസ്തകങ്ങൾ വായിക്കുന്നു",
    "mr": "मुले सकाळी चालत शाळेत जातात आणि शहरात शिक्षकांसोबत पुस्तके वाचतात",
    "gu": "બાળકો સવારે ચાલીને શાળાએ જાય છે અને શહેરમાં શિક્ષક સાથે પુસ્તકો વાંચે છે",
    "kn": "ಮಕ್ಕಳು ಬೆಳಿಗ್ಗೆ ಶಾಲೆಗೆ ನಡೆದು ಹೋಗುತ್ತಾರೆ ನಗರದಲ್ಲಿ ಶಿಕ್ಷಕರೊಂದಿಗೆ ಪುಸ್ತಕಗಳನ್ನು ಓದುತ್ತಾರೆ",
    "pa": "ਬੱਚੇ ਸਵੇਰੇ ਤੁਰ ਕੇ ਸਕੂਲ ਜਾਂਦੇ ਹਨ ਅਤੇ ਸ਼ਹਿਰ ਵਿੱਚ ਅਧਿਆਪਕ ਨਾਲ ਕਿਤਾਬਾਂ ਪੜ੍ਹਦੇ ਹਨ",
    "ur": "بچے صبح پیدل اسکول جاتے ہیں اور شہر میں استاد کے ساتھ کتابیں پڑھتے ہیں",
    "tl": "ang mga bata ay naglalakad papunta sa paaralan sa umaga at nagbabasa ng mga libro kasama ang guro sa lungsod",
    # batch 5
    "ka": "ბავშვები დილით სკოლაში მიდიან და კითხულობენ წიგნებს მასწავლებელთან ერთად",
    "hy": "երեխաները առավոտյան դպրոց են գնում և գրքեր են կարդում ուսուցչի հետ",
    "ne": "बालबालिका बिहान हिँडेर विद्यालय जान्छन् र सहरमा शिक्षकसँग किताबहरू पढ्छन्",
    # batch 6
    "am": "ልጆቹ ጠዋት ወደ ትምህርት ቤት ይሄዳሉ እና በከተማው ውስጥ ከመምህሩ ጋር መጽሐፍትን ያነባሉ",
    "km": "ក្មេងៗដើរទៅសាលារៀននៅពេលព្រឹក ហើយអានសៀវភៅជាមួយគ្រូនៅក្នុងទីក្រុង",
    "lo": "ເດັກນ້ອຍຍ່າງໄປໂຮງຮຽນໃນຕອນເຊົ້າ ແລະອ່ານປຶ້ມກັບຄູໃນເມືອງ",
    "si": "ළමයි උදේට පයින් පාසලට යනවා සහ නගරයේ ගුරුවරයා එක්ක පොත් කියවනවා",
    "my": "ကလေးများသည် မနက်ပိုင်းတွင် ကျောင်းသို့ လမ်းလျှောက်သွားပြီး မြို့ထဲတွင် ဆရာနှင့်အတူ စာအုပ်များ ဖတ်ကြသည်",
}

# languages NO profile covers — candidates for the rejection fixtures;
# each sentence must reject to 'und' under the suggested cutoffs
REJECT_PLANTS = [
    # batch 3 graduated sw/lt/et/ca to real labels; the rejection set is
    # two unseen scripts plus three unseen-Latin stressors
    ("eu", "haurrak goizean eskolara oinez joaten dira eta liburuak irakurtzen dituzte irakaslearekin"),
    ("eu", "etxea ibaiaren ondoan dago eta jendea arratsaldean paseatzen da bere txakurrekin"),
    ("sq", "fëmijët ecin në shkollë në mëngjes dhe lexojnë libra me mësuesin në qytet"),
    ("sq", "shtëpia është afër lumit dhe njerëzit ecin me qentë e tyre në mbrëmje"),
    ("ga", "siúlann na páistí ar scoil ar maidin agus léann siad leabhair leis an múinteoir"),
    # am/km graduated to real labels in batch 6 (with lo/si/my); the
    # unseen-script stressors are now Tibetan and Dhivehi (Thaana)
    ("bo", "བྱིས་པ་ཚོ་ཞོགས་པར་སློབ་གྲྭར་འགྲོ་ནས་དགེ་རྒན་དང་མཉམ་དུ་དཔེ་ཆ་ཀློག་གི་ཡོད"),
    ("dv", "ކުދިން ހެނދުނު ސްކޫލަށް ހިނގާފައި ގޮސް މުދައްރިސާއެކު ފޮތް ކިޔަނީ"),
]

GARBAGE = [
    "xqzv wkjq pfft zzzz qqq xxkj vvwp", "1234 5678 9012 3456",
    ">>> ??? !!! ### $$$ %%% ^^^", "aaaa bbbb cccc dddd eeee ffff",
    "zxcvbnm asdfghjkl qwertyuiop",
    "qzxv wkjt pffq zzzy xxkw 12345 98765 !!!",
]

# ---- classifier replica ---------------------------------------------------


def kernel_normalize(s: str) -> str:
    """The KERNEL normalization (no apostrophe folding — that is profile
    hygiene in the gen tool only)."""
    out = []
    last_space = True
    for c in s.lower():
        if c in " \t\n\x0b\f\r":
            if not last_space:
                out.append(" ")
                last_space = True
        else:
            out.append(c)
            last_space = False
    t = "".join(out).strip()
    return f" {t} " if t else ""


def doc_profile(text: str):
    t = kernel_normalize(text)
    if len(t) <= 2:
        return []
    cps = list(t)
    if len(cps) < 3:
        return []
    counts = {}
    for n in (1, 2, 3):
        for i in range(len(cps) - n + 1):
            g = "".join(cps[i:i + n])
            counts[g] = counts.get(g, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0].encode("utf-8")))
    return [g for g, _ in ranked[:D]]


def classify(text: str, profiles, cutoffs=None):
    """Returns (label, best_lang, best_norm_x1000) — label is 'und' when
    rejected (cutoffs given) or unclassifiable."""
    dp = doc_profile(text)
    if not dp:
        return "und", "und", None
    m = len(dp)
    best_lang, best_dist = None, None
    for lang in sorted(profiles):
        rank = profiles[lang]
        dist = 0
        for r0, g in enumerate(dp, start=1):
            pr = rank.get(g)
            dist += P if pr is None else abs(r0 - pr)
        if best_dist is None or dist < best_dist:
            best_lang, best_dist = lang, dist
    norm_x1000 = best_dist * 1000 // (m * P)  # floor, like integer compare
    label = best_lang
    if cutoffs is not None and best_dist * 1000 > m * P * cutoffs[best_lang]:
        label = "und"
    return label, best_lang, (best_dist * 1000 / (m * P))


def main() -> int:
    profiles = {}
    for lang, seeds in SEEDS.items():
        grams = profile(seeds)
        profiles[lang] = {g: i + 1 for i, g in enumerate(grams)}

    in_lang_max = {lang: 0.0 for lang in SEEDS}
    confusions = []

    def record(lang, text, kind):
        label, best, nd = classify(text, profiles)
        if best != lang:
            confusions.append((kind, lang, best, round(nd, 3), text[:50]))
        else:
            in_lang_max[lang] = max(in_lang_max[lang], nd / 1000.0)

    for lang, pool in POOLS.items():
        sep = "" if lang in NO_SPACE else " "
        for j in range(50):
            bag = sep.join(pool[(j * 7 + k * 3) % len(pool)] for k in range(8))
            record(lang, bag, "bag")
    for lang, text in PROSE.items():
        record(lang, text, "prose")
    for lang, text in ORACLE_PLANTS.items():
        record(lang, text, "plant")

    print("== in-language max normalized distance (cutoff floor) ==")
    suggested = {}
    for lang in sorted(SEEDS):
        cut = int(round(in_lang_max[lang] * 1000)) + 50
        suggested[lang] = cut
        print(f"  {lang}: max={in_lang_max[lang]:.3f} -> cutoff {cut}")

    print("\n== misclassifications (want -> got) ==")
    if not confusions:
        print("  none")
    for kind, want, got, nd, snip in confusions:
        print(f"  [{kind}] {want} -> {got} (dist {nd}) :: {snip}")

    print("\n== rejection plants under suggested cutoffs ==")
    bad = 0
    for lang, text in REJECT_PLANTS:
        label, best, nd = classify(text, profiles, suggested)
        ok = label == "und"
        bad += 0 if ok else 1
        mark = "ok " if ok else "FAIL"
        print(f"  {mark} [{lang}] best={best} dist={nd/1000:.3f} "
              f"cut={suggested[best]/1000:.3f} :: {text[:40]}")
    for text in GARBAGE:
        label, best, nd = classify(text, profiles, suggested)
        ok = label == "und"
        bad += 0 if ok else 1
        mark = "ok " if ok else "FAIL"
        nds = "n/a" if nd is None else f"{nd/1000:.3f}"
        print(f"  {mark} [garbage] best={best} dist={nds}")

    print("\n== suggested CUTOFFS dict ==")
    items = ", ".join(f'"{k}": {suggested[k]}' for k in sorted(suggested))
    print("{" + items + "}")

    # the SHIPPED cutoffs must (a) sit at or above every measured
    # in-language floor (else real text rejects) and (b) still reject
    # every rejection plant (else looser-than-suggested values leak)
    print("\n== shipped CUTOFFS validation ==")
    shipped_bad = 0
    for lang in sorted(SEEDS):
        floor = int(round(in_lang_max[lang] * 1000))
        if CUTOFFS.get(lang, -1) < floor:
            shipped_bad += 1
            print(f"  FAIL {lang}: shipped {CUTOFFS.get(lang)} < floor {floor}")
    for lang, text in REJECT_PLANTS:
        label, best, nd = classify(text, profiles, CUTOFFS)
        if label != "und":
            shipped_bad += 1
            print(f"  FAIL reject [{lang}] accepted as {label} under shipped")
    for text in GARBAGE:
        label, best, nd = classify(text, profiles, CUTOFFS)
        if label != "und":
            shipped_bad += 1
            print(f"  FAIL garbage accepted as {label} under shipped")
    if not shipped_bad:
        print("  ok — every shipped cutoff >= floor, all plants reject")
    return 1 if (confusions or bad or shipped_bad) else 0


if __name__ == "__main__":
    sys.exit(main())
