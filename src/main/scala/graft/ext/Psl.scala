package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-suffix-list-backed registrable domain — the exact-policy upgrade
  * over [[Url.registrableDomain]]'s ccSLD regex approximation (VERDICT r11
  * item 1: the regex form lumps every `*.github.io` site into one "domain",
  * so domain caps and blocklists mis-group platform-hosted sites).
  *
  * The rule set is a SNAPSHOT SUBSET of the public Mozilla PSL
  * (publicsuffix.org, MPL-2.0 data) carried as code constants — the
  * dominant ICANN ccSLD registries plus the major private-section hosting
  * suffixes — in the three PSL rule kinds:
  *   - plain  (`co.uk`): the suffix itself is public;
  *   - wildcard (`*.ck` stored as its base `ck`): ANY single label under
  *     the base is public;
  *   - exception (`!www.ck` stored as `www.ck`): overrides a covering
  *     wildcard — the public suffix is the exception minus its leftmost
  *     label.
  * Resolution follows the PSL algorithm: exception rules win, then the
  * match with the most labels; no match falls to the implicit `*` rule
  * (the bare TLD is public). The registrable domain is the public suffix
  * plus one label; a host that IS a public suffix (or has no dot) passes
  * through unchanged, same stance as the regex form. Callers with the full
  * 9k-rule PSL file pass their own `rules` — the implementation is
  * size-independent (membership probes become Catalyst `InSet`, O(1) hash
  * lookups, via `isInCollection`).
  *
  * Everything is pure column expressions — per-label-count anchored
  * `regexp_extract`s plus InSet probes and one `when` chain — so the
  * operator is zero-shuffle at any corpus size and stays inside
  * whole-stage codegen (the small-regex-count lesson from
  * [[Url.registrableDomain]]'s scaladoc: no split/element_at fan-out).
  */
object Psl {

  /** Parsed rule sets: `plain` suffixes, wildcard `bases` (the `*.` is
    * stripped), `exceptions` (the `!` is stripped). */
  final case class Rules(plain: Set[String], bases: Set[String],
                         exceptions: Set[String]) {
    private def labels(s: String): Int = s.count(_ == '.') + 1
    /** Longest EFFECTIVE match length any rule can produce (wildcards
      * match one label more than their base). */
    val maxLen: Int =
      ((plain.map(labels) ++ bases.map(labels(_) + 1) ++
        exceptions.map(labels)) + 1).max
  }

  /** Parse the standard publicsuffix.org FILE format into a rule list
    * [[registrableDomain]] accepts: `//` comment lines and blanks are
    * dropped, rules are whitespace-trimmed and lowercased (the PSL spec
    * says rules match case-insensitively; this engine matches lowercase
    * hosts against lowercase rules). Feed it
    * `Files.readAllLines("public_suffix_list.dat")` for exact coverage:
    * {{{ Psl.registrableDomain(host, Psl.parseFileLines(lines)) }}} */
  def parseFileLines(lines: Seq[String]): Seq[String] = {
    // IDN rules appear in the file in UNICODE form (466 of ~9.5k in the
    // 2025 list) while crawl hosts arrive PUNYCODED (xn--): emit each such
    // rule in BOTH forms — ASCII via the JDK's IDN.toASCII so punycoded
    // hosts match, and the raw unicode form for callers matching
    // un-encoded hosts. ASCII rules pass through once. The `!`/`*.`
    // markers are stripped before encoding and re-attached (IDN.toASCII
    // rejects them as labels).
    def punycoded(rule: String): Option[String] = {
      val (prefix, body) =
        if (rule.startsWith("!")) ("!", rule.substring(1))
        else if (rule.startsWith("*.")) ("*.", rule.substring(2))
        else ("", rule)
      scala.util.Try(java.net.IDN.toASCII(body)).toOption
        .map(a => prefix + a.toLowerCase).filter(_ != rule)
    }
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase)
      .flatMap(r => r +: punycoded(r).toSeq)
  }

  def parse(rules: Seq[String]): Rules = Rules(
    plain = rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")).toSet,
    bases = rules.filter(_.startsWith("*.")).map(_.stripPrefix("*.")).toSet,
    exceptions = rules.filter(_.startsWith("!")).map(_.stripPrefix("!")).toSet)

  /** Last `k` dot-separated labels of `host`; empty string when the host
    * has fewer than `k` labels (the anchored group can't match). */
  private def lastK(host: Column, k: Int): Column =
    regexp_extract(host, s"((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)

  private def inSet(c: Column, s: Set[String]): Column =
    if (s.isEmpty) lit(false) else c.isInCollection(s.toSeq.sorted)

  /** Registrable domain of a HOST column under the PSL `rules` (default:
    * [[Snapshot]]). NULL host -> NULL; dotless or public-suffix-only hosts
    * pass through. Matching is case-SENSITIVE against lowercase rules —
    * feed hosts derived from [[Url.canonicalKey]] (already lowercased) or
    * lowercase upstream; the DuckDB oracle twin shares this contract. */
  def registrableDomain(host: Column, rules: Seq[String] = Snapshot): Column = {
    val r = parse(rules)
    val exts: Map[Int, Column] =
      (1 to (r.maxLen + 1)).map(k => k -> lastK(host, k)).toMap
    // Rule sets PARTITIONED BY LABEL COUNT: exts(l) extracts exactly l
    // labels, so probing it against rules of any other length can never
    // match — with the full ~9.5k-rule PSL the unpartitioned form repeated
    // ALL rules in every probe (~56k literals across 6 levels, the
    // analysis/codegen blow-up the round-12 advice flagged); partitioned,
    // each rule appears in exactly ONE probe set. Result-identical.
    def ofLen(s: Set[String], l: Int): Set[String] =
      s.filter(_.count(_ == '.') + 1 == l)
    // Public-suffix length in labels: exceptions first (PSL precedence),
    // then descending effective match length; implicit `*` default is 1.
    val byPrecedence: Seq[(Column, Int)] =
      (r.maxLen to 1 by -1).flatMap { l =>
        Seq.empty[(Column, Int)] ++
          (if (l >= 2) Seq((inSet(exts(l), ofLen(r.exceptions, l)), l - 1)) else Nil)
      } ++
      (r.maxLen to 1 by -1).flatMap { l =>
        Seq((inSet(exts(l), ofLen(r.plain, l)), l)) ++
          // a wildcard only MATCHES hosts with at least base+1 labels (the
          // `*` consumes a real label — publicsuffix.org algorithm): the
          // exts(l) =!= "" guard skips hosts that merely EQUAL the base.
          // Found by the full-file property sweep (round 13): with rule
          // `*.nodebalancer.linode.com`, host nodebalancer.linode.com must
          // resolve via the `com` rule to linode.com, not pass through.
          (if (l >= 2)
            Seq((inSet(exts(l - 1), ofLen(r.bases, l - 1)) && exts(l) =!= "", l))
          else Nil)
      }
    val psLen = byPrecedence.foldRight(lit(1)) { case ((cond, len), acc) =>
      when(cond, lit(len)).otherwise(acc)
    }
    // registrable = last (psLen + 1) labels; "" extract (host too short —
    // the host IS the public suffix) falls through to the host itself.
    val picked = (1 to r.maxLen).map { l =>
      when(psLen === l && exts(l + 1) =!= "", exts(l + 1))
    }
    coalesce(picked :+ host: _*)
  }

  /** The snapshot rule set: ICANN ccSLD registries (the high-traffic
    * two-level country registries plus representative 3-label `us`/`jp`
    * structure) and the major private-section platform suffixes. A subset
    * by construction — pass the full publicsuffix.org list to
    * [[registrableDomain]] for exact coverage. */
  val Snapshot: Seq[String] = Seq(
    // --- ICANN: United Kingdom / Ireland
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk", "me.uk",
    "nhs.uk", "plc.uk", "sch.uk",
    // --- Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz",
    // --- Japan (incl. the wildcard city registries with their exceptions)
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "lg.jp", "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp", "!city.kawasaki.jp",
    "!city.kitakyushu.jp", "!city.kobe.jp", "!city.nagoya.jp",
    "!city.sapporo.jp", "!city.sendai.jp", "!city.yokohama.jp",
    // --- Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "blog.br", "app.br",
    "art.br", "eco.br",
    // --- India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // --- China / Taiwan / Hong Kong
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    // --- Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr", "busan.kr",
    // --- Latin America
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "cl", "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    // --- Africa / Middle East
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "name.ng", "sch.ng",
    "com.gh", "org.gh", "gov.gh", "edu.gh", "mil.gh",
    "co.tz", "ac.tz", "go.tz", "or.tz", "ne.tz", "sc.tz",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "mil.eg",
    "name.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "k12.il",
    "idf.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "gen.tr",
    "web.tr", "av.tr", "dr.tr", "pol.tr", "bel.tr", "k12.tr", "bbs.tr",
    // --- Southeast Asia
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "go.id", "mil.id",
    "ac.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk",
    // --- Eastern Europe / Russia / Ukraine
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua", "kiev.ua",
    "kyiv.ua",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
    "waw.pl", "mil.pl",
    // --- Western Europe ccSLDs
    "gouv.fr", "asso.fr", "com.fr", "nom.fr", "tm.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt",
    "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "gov.it", "edu.it",
    // --- Canada (provincial)
    "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    // --- United States (state locality structure, incl. 3-label rules)
    "ca.us", "ny.us", "tx.us", "fl.us", "wa.us", "ma.us", "il.us", "pa.us",
    "oh.us", "mi.us",
    "k12.ca.us", "cc.ca.us", "lib.ca.us", "k12.ny.us", "cc.ny.us",
    "lib.ny.us", "k12.tx.us", "cc.tx.us", "lib.tx.us",
    // --- Full-wildcard ccTLDs with exceptions (the PSL's canonical cases)
    "*.ck", "!www.ck", "*.er", "*.fk", "*.np", "*.kh", "*.mm", "*.bn",
    // --- Private section: platform / hosting suffixes
    "github.io", "githubusercontent.com", "gitlab.io", "pages.dev",
    "blogspot.com", "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.de", "blogspot.fr", "blogspot.in", "blogspot.jp",
    "blogspot.mx", "blogspot.it", "blogspot.nl", "blogspot.es",
    "wordpress.com", "herokuapp.com", "appspot.com", "cloudfront.net",
    "s3.amazonaws.com", "elb.amazonaws.com", "azurewebsites.net",
    "cloudapp.net", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "glitch.me", "repl.co", "onrender.com", "fly.dev",
    "surge.sh", "neocities.org", "readthedocs.io", "gitbook.io",
    "hashnode.dev", "fastly.net", "ngrok.io", "workers.dev")
}
