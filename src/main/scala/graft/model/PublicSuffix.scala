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

  /** Normal multi-label rules (the `co.uk` class). */
  val rules: Set[String] = Set(
    // United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // Japan — organizational + prefectures (cities are wildcards below)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp", "ne.jp",
    "or.jp", "hokkaido.jp", "tokyo.jp", "osaka.jp", "kyoto.jp", "aichi.jp",
    "kanagawa.jp", "saitama.jp", "chiba.jp", "hyogo.jp", "fukuoka.jp",
    "shizuoka.jp", "hiroshima.jp", "miyagi.jp", "nagano.jp", "niigata.jp",
    "okinawa.jp", "nara.jp", "gifu.jp", "gunma.jp", "tochigi.jp",
    "ibaraki.jp", "mie.jp", "kumamoto.jp", "kagoshima.jp", "yamaguchi.jp",
    // Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // Brazil
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    // China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "bj.cn", "sh.cn", "gd.cn", "zj.cn", "js.cn",
    // India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    // New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    // South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    "busan.kr",
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
    // United States (state second-levels)
    "ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
    "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
    "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
    "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us",
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
    "repl.co")

  /** Wildcard rules (`*.x` in PSL syntax), stored as the PARENT `x`: any
    * single label under the parent is a public suffix. */
  val wildcards: Set[String] = Set(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg", "ye",
    // Japanese designated cities: *.city.jp with carve-outs below
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp")

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
