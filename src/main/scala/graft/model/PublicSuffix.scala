package graft.model

/**
 * Bundled PUBLIC-SUFFIX snapshot — the data dimension behind registrable-
 * domain (eTLD+1) extraction ([[graft.expressions.UrlKernels]]), shipped
 * the same way as [[Iso3166]]: data as code, no runtime fetch.
 *
 * Provenance, stated honestly: this is a SNAPSHOT SUBSET of the Mozilla
 * Public Suffix List (publicsuffix.org — public, MPL-2.0), hand-curated to
 * the high-traffic multi-label rules: the major ccTLD second-level
 * families, the PSL's wildcard/exception constructs, and the most common
 * private-section hosting suffixes. It is NOT the full ~9k-rule list; a
 * production deployment should regenerate `rules`/`wildcards`/`exceptions`
 * from the upstream file (the format maps 1:1 — plain lines, `*.` lines
 * with the parent stored here, `!` lines stored without the bang);
 * `tools/gen_public_suffix.py` emits this whole object from a downloaded
 * copy of the list.
 *
 * Coverage asymmetry that makes a subset safe-by-default: the PSL
 * algorithm's fallback rule `*` makes every UNKNOWN single-label TLD a
 * public suffix on its own, so `x.y.<anything>` resolves to `y.<anything>`
 * without any rule — single-label rules (com, net, org, every ICANN gTLD)
 * never need listing. A missing MULTI-label rule degrades to grouping one
 * level too coarse (e.g. an unlisted `co.xx` groups all of `*.co.xx`
 * together) — too-coarse capping/blocking, never a crash and never a
 * too-fine evasion hole for the listed families.
 */
object PublicSuffix {

  /** All 47 Japanese prefectures — each `<pref>.jp` is a public suffix. */
  private val JpPrefectures: Seq[String] = Seq(
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki", "nagano",
    "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa", "osaka",
    "saga", "saitama", "shiga", "shimane", "shizuoka", "tochigi",
    "tokushima", "tokyo", "tottori", "toyama", "wakayama", "yamagata",
    "yamaguchi", "yamanashi")

  /** US state/territory codes — `<st>.us` and `k12.<st>.us` are public
    * suffixes (the locality scheme). */
  private val UsStates: Seq[String] = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** Chinese province/municipality codes — `<prov>.cn` second-levels. */
  private val CnProvinces: Seq[String] = Seq(
    "ah", "bj", "cq", "fj", "gd", "gs", "gx", "gz", "ha", "hb", "he",
    "hi", "hl", "hn", "jl", "js", "jx", "ln", "nm", "nx", "qh", "sc",
    "sd", "sh", "sn", "sx", "tj", "xj", "xz", "yn", "zj")

  /** South Korean metropolitan cities + provinces — `<x>.kr`. */
  private val KrRegions: Seq[String] = Seq(
    "busan", "chungbuk", "chungnam", "daegu", "daejeon", "gangwon",
    "gwangju", "gyeongbuk", "gyeonggi", "gyeongnam", "incheon", "jeju",
    "jeonbuk", "jeonnam", "seoul", "ulsan")

  /** Normal multi-label rules (the `co.uk` class). */
  val rules: Set[String] = Set(
    // United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // Japan — organizational (prefectures generated below, designated
    // cities are wildcards)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp", "ne.jp",
    "or.jp",
    // Australia — organizational + state/territory second-levels
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    // Brazil — the common professional/sectoral second-levels
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    "adv.br", "art.br", "blog.br", "eco.br", "eng.br", "med.br",
    "mus.br", "nom.br", "not.br", "pro.br", "rec.br", "srv.br",
    "tur.br", "tv.br", "vet.br", "wiki.br",
    // China — organizational (provinces generated below)
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    // India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    // New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    // South Korea — organizational (regions generated below)
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    // Taiwan
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    // Hong Kong / Singapore / Malaysia / Philippines / Vietnam /
    // Indonesia / Thailand
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    // Mexico / Argentina / Turkey / Israel
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar", "tur.ar",
    "av.tr", "bel.tr", "com.tr", "dr.tr", "edu.tr", "gen.tr", "gov.tr",
    "k12.tr", "mil.tr", "net.tr", "org.tr", "pol.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    // Ukraine / Russia / Poland
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua", "kiev.ua",
    "kyiv.ua",
    "com.ru", "msk.ru", "net.ru", "org.ru", "pp.ru", "spb.ru",
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl", "wroc.pl",
    "krakow.pl", "poznan.pl", "lodz.pl", "gda.pl",
    // France / Spain / Portugal / Greece / Italy
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt",
    "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "edu.it", "gov.it",
    // Canada (provinces + federal)
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
    // Ukraine — more regional city second-levels
    "odessa.ua", "lviv.ua", "kharkiv.ua", "kharkov.ua", "donetsk.ua",
    "dnipropetrovsk.ua", "zaporizhzhe.ua", "crimea.ua",
    // PSL private section — common hosting suffixes where each tenant is
    // its own registrable domain
    "blogspot.com", "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.de", "blogspot.fr", "blogspot.in", "blogspot.jp",
    "blogspot.mx",
    "github.io", "githubusercontent.com", "gitlab.io",
    "herokuapp.com", "appspot.com", "web.app", "firebaseapp.com",
    "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "azurewebsites.net", "s3.amazonaws.com", "cloudfront.net",
    "wordpress.com", "ngrok.io", "onrender.com", "fly.dev",
    "readthedocs.io", "neocities.org", "glitch.me", "surge.sh",
    "repl.co") ++
    JpPrefectures.map(_ + ".jp") ++
    UsStates.flatMap(st => Seq(s"$st.us", s"k12.$st.us")) ++
    CnProvinces.map(_ + ".cn") ++
    KrRegions.map(_ + ".kr")

  /** Wildcard rules (`*.x` in PSL syntax), stored as the PARENT `x`: any
    * single label under the parent is a public suffix. */
  val wildcards: Set[String] = Set(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg", "ye",
    // Japanese designated cities: *.city.jp with carve-outs below
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp",
    // AWS private-section wildcards: every EC2 public hostname is its own
    // registrable domain (ec2-….compute(-1).amazonaws.com)
    "compute.amazonaws.com", "compute-1.amazonaws.com")

  /** Exception rules (`!x` in PSL syntax), stored WITHOUT the bang: the
    * host is NOT a public suffix despite a wildcard match — its public
    * suffix is the rule minus its leftmost label. */
  val exceptions: Set[String] = Set(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** The snapshot as a DuckDB-inlinable relation `(rule, kind)` with kinds
    * `r` (normal), `w` (wildcard parent), `x` (exception) — interpolated
    * into oracle SQL so engine and oracle replay the SAME snapshot. */
  def oracleValuesSql: String = {
    val vs =
      rules.toSeq.sorted.map(r => s"('$r','r')") ++
        wildcards.toSeq.sorted.map(w => s"('$w','w')") ++
        exceptions.toSeq.sorted.map(x => s"('$x','x')")
    vs.mkString("(VALUES ", ", ", ") psl(rule, kind)")
  }
}
