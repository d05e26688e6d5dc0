package graft

import org.apache.spark.sql.functions._
import graft.ext.Url

class UrlSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Url.canonicalKey(col("url")).as("k"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalKey: scheme/www/port/fragment/tracking/slash/case variants collapse") {
    val variants = Seq(
      "https://www.Example.COM/a/b?utm_source=x&id=5#frag",
      "http://example.com:80/a/b?id=5",
      "HTTPS://EXAMPLE.COM:443/a/b?utm_campaign=y&id=5&fbclid=zzz",
      "https://example.com/a/b?id=5#other")
    assert(canon(variants: _*).distinct === Seq("example.com/a/b&id=5"))
    // trailing slash and empty-query residue
    assert(canon("https://example.com/a/") === Seq("example.com/a"))
    assert(canon("https://example.com/?utm_source=x") === Seq("example.com"))
    // a kept param before a stripped one keeps its position
    assert(canon("http://example.com/p?id=1&gclid=g&q=2") ===
      Seq("example.com/p&id=1&q=2"))
    // ref is stripped, but a prefix like 'refresh' is NOT ([^&]* is bounded
    // by the = after the exact name set)
    assert(canon("http://example.com/p?ref=abc") === Seq("example.com/p"))
    assert(canon("http://example.com/p?refresh=1") === Seq("example.com/p&refresh=1"))
    // port strip is anchored to the AUTHORITY: a path segment or query
    // value ending in :443/:80 must NOT collapse into the portless key
    assert(canon("http://example.com/video:443/x") === Seq("example.com/video:443/x"))
    assert(canon("http://example.com/p?t=12:80") === Seq("example.com/p&t=12:80"))
    // non-default ports stay in the key (different origin, different page)
    assert(canon("http://example.com:8080/x") === Seq("example.com:8080/x"))
  }

  test("domain policy ignores ports: alternate-port serving cannot evade it") {
    val rows = Seq(
      "http://example.com:8080/spam",
      "http://example.com/spam",
      "https://example.com:443/ok")
      .toDF("url")
      .select(
        Url.hostOf(Url.canonicalKey(col("url"))).as("h"),
        Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url")))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.forall(_._1 == "example.com"), rows.toString)
    assert(rows.forall(_._2 == "example.com"), rows.toString)
    // and the blocklist catches the alt-port URL
    val docs = Seq((1L, "http://example.com:8080/spam"), (2L, "http://other.org/x"))
      .toDF("doc_id", "url")
    val kept = Url.blocklistFilter(docs, "url", Seq("example.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L))
  }

  test("hostOf / registrableDomain: plain, deep, ccSLD, short hosts") {
    val rows = Seq(
      "https://a.b.example.com/x",
      "https://example.com/x",
      "https://www.example.co.uk/x?utm_source=s",
      "https://deep.sub.example.co.uk/x",
      "https://localhost/x",
      "https://example.org")
      .toDF("url")
      .select(
        Url.hostOf(Url.canonicalKey(col("url"))).as("h"),
        Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url")))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      ("a.b.example.com", "example.com"),
      ("example.com", "example.com"),
      ("example.co.uk", "example.co.uk"),
      ("deep.sub.example.co.uk", "example.co.uk"),
      ("localhost", "localhost"),
      ("example.org", "example.org")))
  }

  test("urlDedupKeep keeps the lowest id per key; fixture really collides") {
    val docs = Url.attachUrls(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "source")
    val marked = Url.urlDedupKeep(docs, "url", "doc_id")
      .select("doc_id", "url_key", "keep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // ground truth: lowest id per key
    val keeper = marked.groupBy(_._2).map { case (k, rs) => k -> rs.map(_._1).min }
    marked.foreach { case (id, k, keep) =>
      assert((keep == 1) === (id == keeper(k)), s"doc $id key $k")
    }
    // the synthesized corpus must actually exercise collapsing
    val groups = Url.urlDupGroups(docs, "url", "doc_id").collect()
    assert(groups.nonEmpty, "fixture produced no URL collisions")
    assert(groups.forall(_.getLong(2) > 1))
  }

  test("domainCapKeep caps per registrable domain; salted route identical") {
    val docs = Url.attachUrls(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "source")
    val plain = Url.domainCapKeep(docs, "url", "doc_id", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byDomain = docs
      .select(col("doc_id"),
        Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url")))).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = byDomain.groupBy(_._2).values
      .flatMap(_.map(_._1).sorted.take(5)).toSet
    assert(plain === expected)
    val salted = Url.domainCapKeep(docs, "url", "doc_id", cap = 5, salts = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted === plain)
  }

  test("blocklistFilter drops exactly the blocked domains") {
    val docs = Url.attachUrls(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "source")
    val withD = docs.select(col("doc_id"),
      Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url")))).as("d"))
    val domains = withD.select("d").distinct().collect().map(_.getString(0)).sorted
    assert(domains.length > 1, "need >1 domain to block one")
    val blocked = Seq(domains.head)
    val kept = Url.blocklistFilter(docs, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = withD.filter(!col("d").isin(blocked: _*))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expected)
    assert(kept.size < withD.count())
  }
}
