package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Blocklist SHAPE probe — the measurement behind
  * [[graft.ext.Url.blocklistFilter]] shipping ONE route (broadcast LEFT
  * ANTI join) instead of a size-routed InSet literal: on a 10 M-row corpus
  * the derived-domain chain (8 regexes) costs ~4x more evaluated inside a
  * Filter condition than as a Project pass, SWAMPING any list-size effect —
  *   filter-inline-coalesce  ~19 s   (chain once, inside Filter)
  *   project-filter-drop     ~15 s   (pushdown re-inlines into the Filter)
  *   project-nocollapse      ~5 s    (chain once, materialized Project)
  *   plain-domain-count      ~16 s   (Project + pushed-down IsNotNull:
  *                                    the chain again lands in a Filter)
  * The join shape keeps the chain in a Project by construction (no filter
  * to push through it) and probes a broadcast hash relation — 4.2-4.9 s at
  * 1k, 10k, 30k and 100k entries alike (URLPROBE_r12 receipts).
  *
  * Usage: java -cp ... graft.BlProbe [nRows]
  */
object BlProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Url
    import graft.fixtures.Fixtures
    val docs = Fixtures.attachUrls(
      spark.range(n).toDF("doc_id").withColumn("source",
        concat(lit("s"), pmod(xxhash64(col("doc_id"), lit(11L)), lit(40L)))),
      "doc_id", "source").localCheckpoint()
    val blocked = (0 until 1000).map(i => s"b$i.example") ++ Seq("s0-0.com")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"""{"probe":"bl_shape","variant":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"kept":$r}""")
    }
    val domain = Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url"))))
    time("filter-inline-coalesce") {
      docs.filter(coalesce(!domain.isInCollection(blocked), lit(true))).count()
    }
    time("project-filter-drop") {
      docs.withColumn("__d", domain)
        .filter(coalesce(!col("__d").isInCollection(blocked), lit(true)))
        .drop("__d").count()
    }
    time("project-nocollapse") {
      val d2 = docs.withColumn("__d", domain).localCheckpoint()
      d2.filter(coalesce(!col("__d").isInCollection(blocked), lit(true))).count()
    }
    time("plain-domain-count") {
      docs.select(domain.as("__d")).filter(col("__d").isNotNull).count()
    }
    time("anti-join (the shipped route)") {
      Url.blocklistFilter(docs, "url", blocked).count()
    }
    spark.stop()
  }
}
