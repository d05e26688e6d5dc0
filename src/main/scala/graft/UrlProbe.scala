package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the URL curation family: synthesize N id-residue URLs
  * (the [[graft.fixtures.Fixtures.attachUrls]] shapes at probe scale — host
  * collisions, ccSLD TLDs, tracking params all present) and time
  * canonicalize+domain (zero-shuffle expression chain), URL-exact dedup
  * (one shuffle on the key) and the domain cap (window / salted). One JSON
  * line, ScaleProbe contract.
  *
  * Usage: java -cp ... graft.UrlProbe [nRows]
  */
object UrlProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Url
    import graft.fixtures.Fixtures

    val docs = Fixtures.attachUrls(
      spark.range(n).toDF("doc_id")
        .withColumn("source", concat(lit("s"),
          pmod(xxhash64(col("doc_id"), lit(11L)), lit(40L)))),
      "doc_id", "source").localCheckpoint()

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val (tCanon, nDomains) = time {
      docs.select(
          Url.registrableDomain(Url.hostOf(Url.canonicalKey(col("url")))).as("d"))
        .agg(countDistinct("d")).first().getLong(0)
    }
    val (tDedup, kept) = time {
      Url.urlDedupKeep(docs, "url", "doc_id")
        .agg(sum("keep")).first().getLong(0)
    }
    val (tCap, capped) = time {
      Url.domainCapKeep(docs, "url", "doc_id", cap = 10000)
        .agg(count(lit(1))).first().getLong(0)
    }

    // Large-blocklist receipt (VERDICT r11 item 3): an args-sized list
    // (default 10^5 entries) — most entries miss (synthetic never-matching
    // domains), a handful hit the fixture's real domains — through the
    // shipped broadcast anti-join route (the only route, by BlProbe
    // measurement: the InSet-literal Filter form costs 4-8x at EVERY list
    // size because the domain chain lands in a Filter condition).
    val blSize = args.lift(1).map(_.toInt).getOrElse(100000)
    val blocked: Seq[String] =
      (0 until blSize).map(i => s"blocked$i.example") ++
        Seq("s0-0.com", "s1-1.com", "s2-2.org")
    val (tBlJoin, keptJoin) = time {
      Url.blocklistFilter(docs, "url", blocked)
        .agg(count(lit(1))).first().getLong(0)
    }

    println(f"""{"probe":"url","n_rows":$n,"canon_domain_sec":$tCanon%.3f,""" +
      f""""n_domains":$nDomains,"url_dedup_sec":$tDedup%.3f,"kept":$kept,""" +
      f""""domain_cap_sec":$tCap%.3f,"capped":$capped,""" +
      f""""blocklist_entries":${blocked.length},""" +
      f""""blocklist_antijoin_sec":$tBlJoin%.3f,"blocklist_kept":$keptJoin}""")
    spark.stop()
  }
}
