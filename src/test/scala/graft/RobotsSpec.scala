package graft

import org.apache.spark.sql.functions._
import graft.ext.Robots

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val Txt =
    "User-agent: evil\nDisallow: /\n\n" +
      "USER-AGENT: *\n" +
      "Disallow: /p\n" +
      "Allow: /p/ok\n" +
      "Disallow:\n" +          // empty path: no restriction, dropped
      "  allow : /p/okx\n" +   // whitespace + case tolerance
      "\nUser-agent: other\nDisallow: /q\n"

  test("starSection + rules: star group only, case/space tolerant, empty dropped") {
    val r = Seq(("h.com", Txt)).toDF("host", "txt")
    val got = Robots.rules(r, "host", "txt")
      .collect().map(x => (x.getString(1), x.getString(2))).toSeq
    // the evil group's "Disallow: /" and the other group's /q must NOT leak
    assert(got === Seq(("disallow", "/p"), ("allow", "/p/ok"), ("allow", "/p/okx")))
    // no star group at all -> zero rules -> allow-all
    assert(Robots.rules(Seq(("h.com", "User-agent: evil\nDisallow: /\n"))
      .toDF("host", "txt"), "host", "txt").count() === 0L)
  }

  test("decide: longest match wins, allow wins ties, missing robots allows") {
    val robots = Seq(
      ("h.com", Txt),
      ("tie.com", "User-agent: *\nDisallow: /a\nAllow: /a\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://h.com/p/3"),        // /p disallow
      (2L, "https://h.com/p/ok/x"),     // /p/ok allow beats /p
      (3L, "https://h.com/p/okx9"),     // /p/okx (longest) allow
      (4L, "https://h.com/q/1"),        // no hit -> allowed
      (5L, "https://norobots.org/any"), // host absent -> allowed
      (6L, "https://tie.com/a/z"),      // equal length: allow wins
      (7L, "HTTP://WWW.H.com:80/p/4"))  // canonicalization reaches matching
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(got === Seq(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> true, 6L -> true, 7L -> false))
  }

  test("decide: RFC 9309 wildcards — * spans, trailing $ anchors, specials stay literal") {
    val robots = Seq(
      ("w.com", "User-agent: *\nDisallow: /p\nAllow: /p/*x=1$\n"),
      ("d.com", "User-agent: *\nDisallow: /*.pdf$\n"),
      ("l.com", "User-agent: *\nDisallow: /a$b\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://w.com/p/5?x=1"),    // ends x=1: wildcard allow rescues
      (2L, "https://w.com/p/5?x=12"),   // $ anchor: x=12 is not x=1-at-end
      (3L, "https://d.com/f/doc.pdf"),  // /*.pdf$ denies
      (4L, "https://d.com/f/doc.pdfx"), // not at end -> allowed
      (5L, "https://d.com/f/docxpdf"),  // '.' is literal, no dot -> allowed
      (6L, "https://l.com/a$b/c"),      // interior $ is literal (prefix rule)
      (7L, "https://l.com/ab/c"))       // no match -> allowed
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(got === Seq(1L -> true, 2L -> false, 3L -> false, 4L -> true,
      5L -> true, 6L -> false, 7L -> true))
  }

  test("decide: mixed-case rule paths fold to the lowercased URL side") {
    // the documented deviation from RFC 9309 case-sensitivity: canonicalKey
    // lowercases the URL, so an unfolded 'Disallow: /Admin' would silently
    // never match — the gate failing OPEN, the unsafe direction
    val robots = Seq(("c.com", "User-agent: *\nDisallow: /Admin\n"))
      .toDF("host", "txt")
    val urls = Seq((1L, "https://c.com/admin/x"), (2L, "https://c.com/public"))
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(false, true))
  }

  test("decide: a urls frame already carrying a 'host' column is untouched") {
    // crawl tables commonly have a host column; the join key must use the
    // reserved __robots_* names, never collide with (or drop) user columns
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "txt")
    val urls = Seq((1L, "https://h.com/p/1", "h.com"), (2L, "https://h.com/q", "h.com"))
      .toDF("doc_id", "url", "host")
    val out = Robots.decide(urls, "url", robots, "host", "txt")
    assert(out.columns.toSeq === Seq("doc_id", "url", "host", "allowed"))
    val got = out.orderBy("doc_id").collect()
      .map(r => (r.getString(2), r.getBoolean(3))).toSeq
    assert(got === Seq("h.com" -> false, "h.com" -> true))
  }

  test("decide: agent group selection — own token wins, star fallback, no decoy capture") {
    val txt = "User-agent: graftbot-pro\nDisallow: /\n" +
      "User-agent: graftbot\nDisallow: /secret\n" +
      "User-agent: *\nDisallow: /\n"
    val robots = Seq(("h.com", txt),
      ("star.com", "User-agent: *\nDisallow: /q\n")).toDF("host", "txt")
    val urls = Seq(
      (1L, "https://h.com/secret/x"),  // graftbot's own rule
      (2L, "https://h.com/open"),      // star's deny-all must NOT apply
      (3L, "https://star.com/q/1"),    // no graftbot group -> star fallback
      (4L, "https://star.com/r"))      // fallback group, no match
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt",
        agent = "graftbot")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(false, true, false, true))
    // the decoy group: agent 'graftbot-pro' selects ITS deny-all, and a
    // token that is a PREFIX of a published group must not capture it
    val pro = Robots.decide(urls.filter(col("doc_id") === 2L), "url",
        robots, "host", "txt", agent = "graftbot-pro")
      .collect().map(_.getBoolean(2)).toSeq
    assert(pro === Seq(false))
  }

  test("agentSection: multi-token groups attribute to EVERY listed token") {
    // RFC 9309 group-of-lines: consecutive User-agent lines (blank lines
    // between them included — the RFC parses significant lines only) share
    // one rule block. Pre-r15 the earlier tokens captured an empty body and
    // fell through to the star group — fail-open when star is permissive.
    val robots = Seq(
      ("m.com", "User-agent: graftbot\nUser-agent: evil\nDisallow: /m\n" +
        "User-agent: *\nAllow: /\n"),
      ("b.com", "User-agent: graftbot\n\nUser-agent: *\nDisallow: /b\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://m.com/m/x"),  // first token of the pair: /m denies
      (2L, "https://m.com/ok"),   // outside the shared rule: allowed
      (3L, "https://b.com/b/1"),  // blank-line-joined group: star's /b binds
      (4L, "https://b.com/c"))    // no rule hit
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt",
        agent = "graftbot")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(false, true, false, true))
    // the LAST token of the pair keeps working too
    val evil = Robots.decide(urls.filter(col("doc_id") === 1L), "url",
        robots, "host", "txt", agent = "evil")
      .collect().map(_.getBoolean(2)).toSeq
    assert(evil === Seq(false))
  }

  test("agentSection: a matched-but-EMPTY group means allow-all, not star") {
    // RFC 9309: a group that names the agent but publishes no rules allows
    // everything for it; only a file with NO group for the token falls back
    // to star. Pre-r15 the empty body fell through to star's deny-all.
    val robots = Seq(
      ("eof.com", "User-agent: *\nDisallow: /\nUser-agent: graftbot"),
      ("mid.com", "User-agent: graftbot\nUser-agent: *\nDisallow: /\n"),
      ("none.com", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://eof.com/x"),   // empty own group at EOF: allowed
      (2L, "https://mid.com/x"),   // graftbot+star share deny-all: denied
      (3L, "https://none.com/x"))  // no own group at all: star deny-all
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt",
        agent = "graftbot")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(true, false, false))
  }

  test("comments: EOL comment on a User-agent line, comment lines inside a group") {
    // RFC 9309 permits '#' comments anywhere; a strict line terminator
    // made a commented 'User-agent: *' line match NOTHING — the whole
    // group vanished and the host failed OPEN (r15 review finding)
    val robots = Seq(
      ("c1.com", "User-agent: * # all crawlers\nDisallow: /\n"),
      ("c2.com", "User-agent: graftbot\n# our bot\nUser-agent: evil\nDisallow: /m\n" +
        "User-agent: *\nAllow: /\n"),
      ("c3.com", "User-agent: graftbot # the good one\nDisallow: /g\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://c1.com/x"),   // commented star line: deny-all must bind
      (2L, "https://c2.com/m/1"), // comment between the group's tokens
      (3L, "https://c3.com/g/1")) // commented own-agent line
      .toDF("doc_id", "url")
    val star = Robots.decide(urls.filter(col("doc_id") === 1L), "url",
        robots, "host", "txt")
      .collect().map(_.getBoolean(2)).toSeq
    assert(star === Seq(false))
    val bot = Robots.decide(urls.filter(col("doc_id") =!= 1L), "url",
        robots, "host", "txt", agent = "graftbot")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(bot === Seq(false, false))
    // crawlDelay reads the same group selection: commented star line
    val cd = Robots.crawlDelay(Seq(
        ("d.com", "User-agent: * # hi\nCrawl-delay: 3\n")).toDF("host", "txt"),
        "host", "txt")
      .collect().head.getDouble(1)
    assert(cd === 3.0)
  }

  test("starSection: star inside a multi-token group still owns the block") {
    val robots = Seq(
      ("s.com", "User-agent: *\nUser-agent: other\nDisallow: /s\n"))
      .toDF("host", "txt")
    val urls = Seq((1L, "https://s.com/s/1"), (2L, "https://s.com/t"))
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(false, true))
  }

  test("decide: root URLs match — deny-all denies the homepage (fail-closed)") {
    // canonicalKey strips the trailing '/', so the homepage key has no
    // '/...' tail; before r14 the extracted path was '' and NO rule — not
    // even 'Disallow: /' — could match it: the gate failed OPEN on the
    // single most common deny form. Empty paths now fold to '/'.
    val robots = Seq(
      ("deny.com", "User-agent: *\nDisallow: /\n"),
      ("wild.com", "User-agent: *\nDisallow: /*\n"))
      .toDF("host", "txt")
    val urls = Seq(
      (1L, "https://deny.com/"),        // bare root
      (2L, "https://deny.com"),         // no slash at all
      (3L, "https://deny.com/?x=1"),    // query-only root
      (4L, "https://wild.com/"))        // wildcard deny-all on the root
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    assert(got === Seq(false, false, false, false))
  }

  test("crawlDelay: group-scoped, first wins, fractional, NULL when absent") {
    val robots = Seq(
      ("a.com", "User-agent: evil\nCrawl-delay: 99\nUser-agent: *\ncrawl-delay: 2.5\nCrawl-delay: 7\n"),
      ("b.com", "User-agent: *\nDisallow: /x\n"),
      ("c.com", "User-agent: graftbot\nCrawl-delay: 4\nUser-agent: *\nCrawl-delay: 10\n"))
      .toDF("host", "txt")
    val star = Robots.crawlDelay(robots, "host", "txt")
      .orderBy("host").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(star === Seq(
      ("a.com", Some(2.5)),  // evil group's 99 must not leak; first wins
      ("b.com", None),
      ("c.com", Some(10.0))))
    val bot = Robots.crawlDelay(robots, "host", "txt", agent = "graftbot")
      .filter(col("host") === "c.com").collect().head.getDouble(1)
    assert(bot === 4.0)
  }

  test("decide: query string is part of the matched path (documented)") {
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /p/3\n"))
      .toDF("host", "txt")
    val urls = Seq((1L, "https://h.com/p/3?x=1"), (2L, "https://h.com/p/30"))
      .toDF("doc_id", "url")
    val got = Robots.decide(urls, "url", robots, "host", "txt")
      .orderBy("doc_id").collect().map(_.getBoolean(2)).toSeq
    // /p/3&x=1 and /p/30 both PREFIX-match /p/3 — prefix semantics, spec'd
    assert(got === Seq(false, false))
  }

  test("sitemapUrls: file-wide (group-scoped readers drop rows), casing, trim") {
    val txt =
      "User-agent: *\nDisallow: /x\nSitemap: https://a.com/sitemap.xml\n" +
        "  SiteMap:https://cdn.example.org/sm/1.xml # index\n" +
        "User-agent: evil\nDisallow: /\n" +
        "sitemap: https://a.com/in-group.xml\n"
    val robots = Seq(("a.com", txt), ("b.com", "User-agent: *\nAllow: /\n"))
      .toDF("host", "txt")
    val got = Robots.sitemapUrls(robots, "host", "txt")
      .orderBy("host", "sm_pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // the directive INSIDE the evil group still surfaces (file-wide field);
    // positions are file order; comments cut; indentation/casing tolerated
    assert(got === Seq(
      ("a.com", 1L, "https://a.com/sitemap.xml"),
      ("a.com", 2L, "https://cdn.example.org/sm/1.xml"),
      ("a.com", 3L, "https://a.com/in-group.xml")))
  }
}
