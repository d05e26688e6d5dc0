package graft

import org.apache.spark.sql.functions._
import graft.ext.Crawl

class CrawlSpec extends SparkTestBase {
  import spark.implicits._

  // a discovered frontier (discoveredFromLinks shape), a robots table that
  // bans one URL, and a domain-rank table missing one domain entirely
  private def frontier = Seq(
    ("big.com/a", "https://big.com/a", 1L, 5L),
    ("big.com/b", "https://big.com/b", 1L, 4L),
    ("big.com/c", "https://big.com/c", 1L, 3L), // cut by the per-domain cap
    ("big.com/d", "https://big.com/d", 1L, 9L), // robots-denied
    ("small.org/x", "https://small.org/x", 2L, 1L),
    ("new.net/y", "https://new.net/y", 3L, 2L)) // unranked domain
    .toDF("link_key", "link", "first_src", "n_refs")

  private def robots =
    Seq(("big.com", "User-agent: *\nDisallow: /d\n")).toDF("host", "txt")

  private def ranks =
    Seq(("big.com", 900L), ("small.org", 500L)).toDF("node", "rank_fp")

  test("frontierOrder: denied dropped, cap enforced, rank ordered, unranked -> 0") {
    val q = Crawl.frontierOrder(frontier, robots, "host", "txt", ranks, cap = 2)
      .select("domain", "queue_pos", "link_key", "domain_rank_fp")
      .orderBy(col("domain_rank_fp").desc, col("domain"), col("queue_pos"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(q === Seq(
      // big.com/d had the highest in-degree but robots bans it; /c is the
      // cap victim; within-domain order = n_refs desc
      ("big.com", 1, "big.com/a", 900L),
      ("big.com", 2, "big.com/b", 900L),
      ("small.org", 1, "small.org/x", 500L),
      ("new.net", 1, "new.net/y", 0L)))
  }

  test("frontierOrder: k takes the global head by (rank, domain, pos)") {
    val q = Crawl.frontierOrder(frontier, robots, "host", "txt", ranks,
        cap = 2, k = 3)
      .select("link_key").collect().map(_.getString(0)).toSeq
    assert(q === Seq("big.com/a", "big.com/b", "small.org/x"))
  }

  test("frontierOrder: Crawl-delay consumed — floor(window/delay) per host, quota before cap") {
    // s1.big.com publishes delay 5 (window 10 -> quota 2: /c is cut),
    // s2.big.com publishes none (domain cap only), slow.org's delay 60
    // exceeds the window (quota 0: the host fetches nothing this batch)
    val fr = Seq(
      ("s1.big.com/a", "https://s1.big.com/a", 1L, 9L),
      ("s1.big.com/b", "https://s1.big.com/b", 1L, 8L),
      ("s1.big.com/c", "https://s1.big.com/c", 1L, 7L),
      ("s2.big.com/x", "https://s2.big.com/x", 1L, 6L),
      ("slow.org/p", "https://slow.org/p", 2L, 5L),
      ("slow.org/q", "https://slow.org/q", 2L, 4L))
      .toDF("link_key", "link", "first_src", "n_refs")
    val rb = Seq(
      ("s1.big.com", "User-agent: *\nCrawl-delay: 5\n"),
      ("slow.org", "User-agent: *\nCrawl-delay: 60\n"))
      .toDF("host", "txt")
    val got = Crawl.frontierOrder(fr, rb, "host", "txt", ranks, cap = 10,
        windowSec = 10.0)
      .select("domain", "queue_pos", "link_key", "host_pos")
      .orderBy("domain", "queue_pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq
    assert(got === Seq(
      ("big.com", 1, "s1.big.com/a", 1),
      ("big.com", 2, "s1.big.com/b", 2),
      ("big.com", 3, "s2.big.com/x", 1)))
    // quota runs BEFORE the cap: the quota victim frees no slot it held,
    // and queue_pos stays contiguous over the survivors
    val capped = Crawl.frontierOrder(fr, rb, "host", "txt", ranks, cap = 2,
        windowSec = 10.0)
      .select("link_key").orderBy("link_key").collect()
      .map(_.getString(0)).toSeq
    assert(capped === Seq("s1.big.com/a", "s1.big.com/b"))
  }

  test("frontierOrder quota plan: still one frontier-side exchange") {
    // the quota route's two windows (per-(domain,host) numbering, then the
    // per-domain cap) must BOTH hang off the one explicit domain
    // repartition — host refines domain, so the (domain,host) clustering
    // is satisfied by the domain hash and the quota window costs a sort,
    // not a second frontier shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Crawl.frontierOrder(frontier, robots, "host", "txt", ranks,
        cap = 2, windowSec = 10.0).queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"), p.take(2000))
      val hashEx = p.linesIterator
        .count(_.trim.startsWith("Exchange hashpartitioning"))
      // 1 = the tiny rules-side fold (host); 2 = the frontier's explicit
      // domain repartition shared by both windows
      assert(hashEx <= 2, s"$hashEx hash exchanges:\n${p.take(2500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("frontierOrder: anchor n_sources breaks n_refs ties, absent keys 0, default schema unchanged") {
    // big.com/a and /b tie on n_refs(4); the anchor signal says /b is
    // linked by 3 distinct sources vs /a's 1 — the blend must put /b first
    // where the key-ascending default put /a first. /c has no anchor row
    // (n_sources 0).
    val fr = Seq(
      ("big.com/a", "https://big.com/a", 1L, 4L),
      ("big.com/b", "https://big.com/b", 1L, 4L),
      ("big.com/c", "https://big.com/c", 1L, 3L))
      .toDF("link_key", "link", "first_src", "n_refs")
    val aq = Seq(("big.com/a", 1L), ("big.com/b", 3L))
      .toDF("link_key", "n_sources")
    val blended = Crawl.frontierOrder(fr, robots, "host", "txt", ranks,
        cap = 3, anchorQuality = aq)
      .select("queue_pos", "link_key", "n_sources")
      .orderBy("queue_pos").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(blended === Seq(
      (1, "big.com/b", 3L), (2, "big.com/a", 1L), (3, "big.com/c", 0L)))
    // default (null) route: order falls back to key-ascending on the tie
    // and the output schema carries NO n_sources column — byte-identical
    // to the pre-blend contract (existing gate hashes depend on it)
    val plain = Crawl.frontierOrder(fr, robots, "host", "txt", ranks, cap = 3)
    assert(!plain.columns.contains("n_sources"))
    assert(plain.select("link_key").orderBy("queue_pos")
      .collect().map(_.getString(0)).toSeq
      === Seq("big.com/a", "big.com/b", "big.com/c"))
  }

  test("frontierOrder anchor blend in the quota route orders host_pos too") {
    // same host, delay 5, window 10 -> quota 2: WHICH two survive is now
    // decided by the blend — the quota must cut the anchor-poor tie-loser
    val fr = Seq(
      ("s1.big.com/a", "https://s1.big.com/a", 1L, 4L),
      ("s1.big.com/b", "https://s1.big.com/b", 1L, 4L),
      ("s1.big.com/c", "https://s1.big.com/c", 1L, 4L))
      .toDF("link_key", "link", "first_src", "n_refs")
    val rb = Seq(("s1.big.com", "User-agent: *\nCrawl-delay: 5\n"))
      .toDF("host", "txt")
    val aq = Seq(("s1.big.com/b", 5L), ("s1.big.com/c", 2L))
      .toDF("link_key", "n_sources")
    val got = Crawl.frontierOrder(fr, rb, "host", "txt", ranks, cap = 10,
        windowSec = 10.0, anchorQuality = aq)
      .select("link_key").orderBy("queue_pos").collect()
      .map(_.getString(0)).toSeq
    assert(got === Seq("s1.big.com/b", "s1.big.com/c"))
  }

  test("resolveRedirects: chains resolve in log rounds, hops exact, cycles deterministic") {
    val pairs = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), // 5-chain
      ("x", "y"),                                                 // 1 hop
      ("p", "q"), ("q", "p"))                                     // 2-cycle
      .toDF("src", "dst")
    val got = Crawl.resolveRedirects(pairs, "src", "dst", doublings = 3)
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got === Seq(
      ("a", "f", 5L, true),  // full chain: 5 hops within the 8-hop budget
      ("b", "f", 4L, true),
      ("c", "f", 3L, true),
      ("d", "f", 2L, true),
      ("e", "f", 1L, true),
      // 2-cycle after 3 doublings: 8 mod 2 = 0 -> each points at itself,
      // hops 8, unresolved (the target is still a redirect source)
      ("p", "p", 8L, false),
      ("q", "q", 8L, false),
      ("x", "y", 1L, true)))
    // doublings=0 = the raw one-hop map
    val raw = Crawl.resolveRedirects(pairs, "src", "dst", doublings = 0)
      .filter(col("url") === "a").collect().head
    assert(raw.getString(1) === "b" && raw.getLong(2) === 1L && !raw.getBoolean(3))
    // materialize=true (the production lineage truncation) is bit-identical
    val mat = Crawl.resolveRedirects(pairs, "src", "dst", doublings = 3,
        materialize = true)
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(mat === got)
  }

  test("resolveRedirects plan: equi-joins only, no cartesian, one join per doubling") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pairs = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
      val p = Crawl.resolveRedirects(pairs, "src", "dst", doublings = 3)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
      // 3 doubling self-joins + the final resolved-flag join = 4 joins; a
      // 5th would mean a doubling round snuck in an extra probe
      val joins = "Join".r.findAllIn(p).size
      assert(joins <= 8, s"$joins join operators (4 expected, counted loosely):\n${p.take(2500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("frontierOrder plan: broadcast sides only — one frontier-side exchange") {
    // the whole design: robots rules and the rank table fold to broadcast
    // slivers, so the corpus-sized frontier pays exactly ONE hash exchange
    // (the domain partition the cap window needs). A SortMergeJoin here
    // would mean a corpus shuffle crept into the eligibility or rank join.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Crawl.frontierOrder(frontier, robots, "host", "txt", ranks,
        cap = 2).queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"), p.take(2000))
      val hashEx = p.linesIterator
        .count(_.trim.startsWith("Exchange hashpartitioning"))
      // 1 = the tiny rules-side fold (host); 2 = the frontier's domain window
      assert(hashEx <= 2, s"$hashEx hash exchanges:\n${p.take(2500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
