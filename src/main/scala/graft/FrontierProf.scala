package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of [[graft.ext.Url.discoveredFromLinks]] at probe
  * scale — written for the r15 question "why does the frontier stage read
  * ~25x the 1 M wall at 10x data": times (a) the link-key groupBy alone,
  * (b) the fetched-side canonicalKey scan alone, (c) the Bloom build alone,
  * (d) the full composed frontier, on the same materialized links table
  * CrawlProbe uses. One JSON line per run.
  *
  * Usage: java -cp ... graft.FrontierProf [nRows]
  */
object FrontierProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Dedup, Url}
    import graft.fixtures.Fixtures

    val scratch = Scratch.dir("graft-frontierprof")
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
    val links = mat(Url.outlinks(docs, "doc_id", "url", "html"), "links")

    val (tGroup, nGroups) = time {
      links.groupBy("link_key")
        .agg(min("link").as("link"), min("src_id").as("first_src"),
          count(lit(1)).as("n_refs"))
        .count()
    }
    System.err.println(f"[prof] group $tGroup%.1f s groups=$nGroups")
    val (tKeys, nKeys) = time {
      docs.select(Url.canonicalKey(col("url")).as("k")).filter(col("k").isNotNull).count()
    }
    System.err.println(f"[prof] fetched-keys $tKeys%.1f s n=$nKeys")
    val (tBloom, _) = time {
      import spark.implicits._
      val rdd0 = docs.select(Url.canonicalKey(col("url")).as("k"))
        .filter(col("k").isNotNull).as[String].rdd
      val width = math.max(1, math.min(rdd0.getNumPartitions, 16))
      rdd0.coalesce(width).treeAggregate(
        org.apache.spark.util.sketch.BloomFilter.create(n, 0.01))(
        (f, s) => { f.putString(s); f }, (a, b) => a.mergeInPlace(b))
      ()
    }
    System.err.println(f"[prof] bloom-build $tBloom%.1f s")
    val (tFull, nNew) = time {
      Url.discoveredFromLinks(links,
        docs.select(Url.canonicalKey(col("url"))), expectedItems = n).count()
    }
    System.err.println(f"[prof] full $tFull%.1f s new=$nNew")
    println(f"""{"probe":"frontier_prof","n_rows":$n,"group_sec":$tGroup%.3f,""" +
      f""""n_groups":$nGroups,"keys_sec":$tKeys%.3f,"bloom_sec":$tBloom%.3f,""" +
      f""""full_sec":$tFull%.3f,"n_new":$nNew}""")
    spark.stop()
  }
}
