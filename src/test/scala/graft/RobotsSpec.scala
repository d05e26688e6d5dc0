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
}
