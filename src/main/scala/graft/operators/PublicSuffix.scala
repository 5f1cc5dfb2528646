package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-suffix-aware registered-domain extraction — the fix for the
  * two-label heuristic's ccSLD failure mode: under
  * [[Urls.registeredDomain]], `shop.example.co.uk` keys as `co.uk`,
  * silently merging every .co.uk site into ONE blocklist/cap/rollup
  * key (a domain cap would throttle all of British retail as "one
  * domain"). The public-suffix list is the published answer: the
  * registered (registrable) domain is the public suffix plus one more
  * label.
  *
  * OFFLINE SNAPSHOT, not the full list: [[Suffixes2]]/[[Suffixes3]]
  * carry the most common multi-label rules of the PSL's ICANN section
  * (UK/JP/AU/BR/KR/IN/… ccSLD families, US k12/lib, AU state-edu).
  * Single-label TLDs need no entry (the PSL default rule `*` — any
  * unlisted TLD is a suffix, so the registered domain is the last two
  * labels, exactly the two-label heuristic). Wildcard (`*.ck`) and
  * exception (`!www.ck`) rules are OUT OF SCOPE for the snapshot —
  * a production deployment swaps the full periodically-refreshed PSL
  * file into these two sets; the matching logic below is unchanged by
  * a bigger set.
  *
  * Scale shape: pure column expression — the suffix sets compile into
  * Catalyst `InSet` literals (O(1) hash probes inside whole-stage
  * codegen), so extraction is MAP-ONLY on the scan; nothing joins,
  * nothing broadcasts, nothing shuffles. The DuckDB oracle shares
  * these exact Seqs (the SQL IN lists are generated from them).
  */
object PublicSuffix {

  /** Two-label public suffixes (registered domain = last THREE labels). */
  val Suffixes2: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk", "ac.uk",
    "gov.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "eco.br", "emp.br",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "nic.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    // Mexico / Argentina / Colombia
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "mil.co", "nom.co",
    // South Africa / Kenya / Nigeria / Egypt
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng", "i.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    // Singapore / Hong Kong / Taiwan / Malaysia / Indonesia / Thailand
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "game.tw",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "my.id", "biz.id", "desa.id", "ponpes.id",
    "co.th", "in.th", "ac.th", "go.th", "net.th", "or.th", "mi.th",
    // Turkey / Israel / Saudi Arabia / Pakistan / Philippines / Vietnam
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr", "gen.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "idf.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
    "web.pk", "gok.pk", "gob.pk", "gkp.pk", "gos.pk",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // Ukraine / Poland-style SLDs
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl",
    // Chile / Venezuela / Peru / Ecuador / Uruguay
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "info.ve", "web.ve",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "fin.ec", "med.ec",
    "pro.ec", "info.ec", "k12.ec", "mil.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    // Greece / Portugal / Spain-adjacent
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "nome.pt",
    // Russia-adjacent common SLDs (ICANN section)
    "com.ru", "net.ru", "org.ru", "gov.ru", "edu.ru", "int.ru", "mil.ru",
    "ac.ru", "msk.ru", "spb.ru",
    // US state namespaces (<state>.us; their k12/lib/cc sub-namespaces
    // are the 3-label entries below)
    "ca.us", "ny.us", "tx.us", "fl.us", "il.us", "pa.us", "oh.us",
    "mi.us", "ga.us", "nc.us", "wa.us", "ma.us", "va.us", "az.us",
    "nj.us", "dc.us", "co.us", "or.us", "mn.us", "wi.us")

  /** Three-label public suffixes (registered domain = last FOUR labels). */
  val Suffixes3: Seq[String] = Seq(
    // US locality/k12/lib namespaces (k12.<state>.us etc.)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.pa.us", "k12.oh.us", "k12.mi.us", "k12.ga.us", "k12.nc.us",
    "k12.wa.us", "k12.ma.us", "k12.va.us", "k12.az.us", "k12.nj.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us",
    "lib.ca.us", "lib.ny.us", "lib.tx.us", "lib.fl.us", "lib.wa.us",
    // Australian state education namespaces
    "nsw.edu.au", "vic.edu.au", "qld.edu.au", "sa.edu.au", "wa.edu.au",
    "tas.edu.au", "act.edu.au", "nt.edu.au",
    // Japanese prefecture-style geographic suffixes (plain PSL rules)
    "city.yokohama.jp", "city.osaka.jp", "city.nagoya.jp",
    "city.sapporo.jp", "city.kobe.jp", "city.kyoto.jp",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.sendai.jp")

  /** PSL-aware registered domain of `url`'s host, '' when the host has
    * no registrable part (bare TLD, host IS a public suffix, malformed,
    * bracketed IPv6). Longest-suffix-wins: a 3-label rule beats a
    * 2-label rule beats the default single-label rule.
    */
  def registeredDomain(url: Column): Column =
    registeredDomainOfHost(Urls.hostOf(url))

  /** Same, over an already-extracted lowercase host column. */
  def registeredDomainOfHost(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // last-k labels via element_at(-i) (NULL-safe out of range) —
    // every use is guarded by an `n` bound so concat_ws can never
    // silently shorten a window into a false suffix match
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    val s3 = lastK(3)
    val s2 = lastK(2)
    when(host === "" || host.isNull, lit(""))
      .when(n >= 4 && s3.isin(Suffixes3: _*), lastK(4))
      .when(n === 3 && s3.isin(Suffixes3: _*), lit("")) // host IS a suffix
      .when(n >= 3 && s2.isin(Suffixes2: _*), s3)
      .when(n === 2 && s2.isin(Suffixes2: _*), lit("")) // host IS a suffix
      .when(n >= 2, s2) // PSL default rule: unlisted TLD = one label
      .otherwise(lit(""))
  }
}
