package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the crawl-loop family (outlinks → frontier discovery →
  * URL rank): synthesize N fetched pages (the gate fixture's url + links
  * html at probe scale — ~8 fetchable anchors per page, so the edge list is
  * ~8N rows) and time each stage. One JSON line, ScaleProbe contract.
  *
  * Usage: java -cp ... graft.LinkProbe [nRows] [iterations]
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    // era constant first (before Spark's threads) — every probe
    // receipt carries it so cross-session rungs are era-checkable
    val eraField = Era.jsonField()
    System.err.println(s"[probe] $eraField")
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{LinkGraph, Url}
    import graft.fixtures.Fixtures

    // parquet-materialize, not localCheckpoint: a checkpoint pins the
    // DESERIALIZED table in executor storage, and at the 30 M rung the
    // page table (html column) + 240 M-edge list exceed any heap this box
    // can give a single JVM (two kernel-OOM kills at 96 g, round 13). A
    // parquet round-trip streams through compressed columnar files: heap
    // cost is batch-sized, disk is the capacity limit, and downstream
    // scans column-prune (the rank iteration never re-reads html).
    val scratch = Scratch.dir("graft-linkprobe")
    def mat(df: org.apache.spark.sql.DataFrame, name: String) =
      Scratch.materialize(df, scratch, name)
    val docs = mat(Fixtures.attachLinksHtml(
      Fixtures.attachUrls(
        spark.range(n).toDF("doc_id")
          .withColumn("source", concat(lit("s"),
            pmod(xxhash64(col("doc_id"), lit(11L)), lit(40L)))),
        "doc_id", "source"),
      "doc_id", "url"), "docs")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // production composition: the edge list is a pipeline PRODUCT —
    // extracted once, materialized, then consumed by the frontier and the
    // rank iteration (the resolve regex chain over html is the dominant
    // cost; a lazy composition re-runs it per consumer and per pagerank
    // iteration — 3.4x at this rung, see PLANS.md)
    var links: org.apache.spark.sql.DataFrame = null
    val (tLinks, (nEdges, nKeys)) = time {
      links = mat(Url.outlinks(docs, "doc_id", "url", "html"), "links")
      val r = links.agg(count(lit(1)), approx_count_distinct("link_key")).first()
      (r.getLong(0), r.getLong(1))
    }
    val (tFrontier, nNew) = time {
      Url.discoveredFromLinks(links,
          docs.select(Url.canonicalKey(col("url"))), expectedItems = n)
        .agg(count(lit(1))).first().getLong(0)
    }
    val (tRank, (nNodes, maxRank)) = time {
      val r = LinkGraph.pageRank(links, "src_key", "link_key",
          iterations = iters, materialize = true)
        .agg(count(lit(1)), max("rank_fp")).first()
      (r.getLong(0), r.getLong(1))
    }

    println(f"""{"probe":"links",${eraField},"n_rows":$n,"outlinks_sec":$tLinks%.3f,""" +
      f""""n_edges":$nEdges,"approx_link_keys":$nKeys,""" +
      f""""frontier_sec":$tFrontier%.3f,"n_new":$nNew,""" +
      f""""pagerank_iters":$iters,"pagerank_sec":$tRank%.3f,""" +
      f""""n_nodes":$nNodes,"max_rank_fp":$maxRank}""")
    spark.stop()
  }
}
