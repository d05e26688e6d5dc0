package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end scale probe for the COMPOSED crawl loop — the full pipeline a
  * fetch batch feeds, as one receipt (the FUNNEL probe's pattern, applied
  * to the crawl side): synthesize N fetched pages, then
  *
  *   1. extract+resolve the outlink edge list ([[graft.ext.Url.outlinks]],
  *      parquet-materialized — it is a pipeline product),
  *   2. discover the new frontier ([[graft.ext.Url.discoveredFromLinks]] —
  *      Bloom-compressed fetched side),
  *   3. evaluate robots.txt politeness over the frontier
  *      ([[graft.ext.Robots.decide]] — per-host rule arrays, broadcast),
  *   4. rank domains ([[graft.ext.LinkGraph.domainRank]] — fixed-point
  *      integer iteration over the weighted edge compaction),
  *   5. order the fetch queue ([[graft.ext.Crawl.frontierOrder]] —
  *      rank-joined, per-domain-capped).
  *
  * Prints per-stage wall seconds and kept-fractions as one JSON line
  * (ScaleProbe contract). The robots fixture is the x_frontier_order
  * gate's: digit-derived rules with a wildcard rescue, ~3/4 of hosts
  * publishing rules.
  *
  * Usage: java -cp ... graft.CrawlProbe [nRows] [cap]
  */
object CrawlProbe {
  def main(args: Array[String]): Unit = {
    // era constant first (before Spark's threads) — every probe
    // receipt carries it so cross-session rungs are era-checkable
    val eraField = Era.jsonField()
    System.err.println(s"[probe] $eraField")
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cap = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Crawl, LinkGraph, Robots, Url}
    import graft.fixtures.Fixtures

    val scratch = Scratch.dir("graft-crawlprobe")
    def mat(df: org.apache.spark.sql.DataFrame, name: String) =
      Scratch.materialize(df, scratch, name)
    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val docs = mat(Fixtures.attachLinksHtml(
      Fixtures.attachUrls(
        spark.range(n).toDF("doc_id")
          .withColumn("source", concat(lit("s"),
            pmod(xxhash64(col("doc_id"), lit(11L)), lit(40L)))),
        "doc_id", "source"),
      "doc_id", "url"), "docs")

    var links: org.apache.spark.sql.DataFrame = null
    val (tLinks, nEdges) = time {
      links = mat(Url.outlinks(docs, "doc_id", "url", "html"), "links")
      links.count()
    }
    var frontier: org.apache.spark.sql.DataFrame = null
    val (tFrontier, nFrontier) = time {
      frontier = mat(Url.discoveredFromLinks(links,
        docs.select(Url.canonicalKey(col("url"))), expectedItems = n), "frontier")
      frontier.count()
    }
    // robots over the frontier's own hosts (the gate fixture: a wildcard
    // rescue + a digit-keyed ban, ~3/4 of hosts publish rules)
    val hosts = frontier.select(Url.hostOf(col("link_key")).as("host"))
      .distinct().filter(pmod(length(col("host")), lit(4)) =!= 0)
    val dig = regexp_extract(col("host"), "-([0-9]+)\\.", 1).cast("int")
    val robots = hosts.withColumn("txt", concat(
      lit("User-agent: *\nDisallow: /A/\nAllow: /a/*x="),
      (dig % 5).cast("string"),
      lit("$\nDisallow: /r/"), (dig % 11).cast("string"), lit("\n")))
    val (tRobots, nAllowed) = time {
      Robots.decide(frontier, "link", robots, "host", "txt")
        .filter(col("allowed")).count()
    }
    var rank: org.apache.spark.sql.DataFrame = null
    val (tRank, nDomains) = time {
      rank = mat(LinkGraph.domainRank(links, materialize = true), "rank")
      rank.count()
    }
    val (tOrder, nQueue) = time {
      Crawl.frontierOrder(frontier, robots, "host", "txt", rank, cap = cap)
        .count()
    }

    println(f"""{"probe":"crawl_e2e",${eraField},"n_rows":$n,"cap":$cap,""" +
      f""""outlinks_sec":$tLinks%.3f,"n_edges":$nEdges,""" +
      f""""frontier_sec":$tFrontier%.3f,"n_frontier":$nFrontier,""" +
      f""""frontier_frac_of_edges":${nFrontier.toDouble / nEdges}%.4f,""" +
      f""""robots_sec":$tRobots%.3f,"n_allowed":$nAllowed,""" +
      f""""allowed_frac":${nAllowed.toDouble / nFrontier}%.4f,""" +
      f""""rank_sec":$tRank%.3f,"n_domains":$nDomains,""" +
      f""""order_sec":$tOrder%.3f,"n_queue":$nQueue,""" +
      f""""queue_frac_of_allowed":${nQueue.toDouble / nAllowed}%.4f}""")
    spark.stop()
  }
}
