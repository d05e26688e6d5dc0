package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level receipts for the near-dup stage of the curation funnel —
  * the 68 % term of FUNNEL_r12_10m (211.4 s of ~310 s at 10 M docs).
  * Same discipline as the round-12 winnow restructure (PLANS.md): time
  * signature build / banding / candidate distinct / verify joins /
  * pointer-jump clustering / keeper join SEPARATELY (localCheckpoint
  * between stages so each wall-time is its own cost), then remove the
  * plumbing terms the receipts expose.
  *
  * The corpus is FunnelProbe's synthesis run through its url-dedup +
  * exact-dedup + paragraph-dedup stages, so the near-dup input here is
  * bit-identical in shape to the funnel's stage-3 input at the same n.
  *
  * Usage: java -cp ... graft.NearDupProf [nRows]
  * Prints one JSON line per stage plus a total (ScaleProbe contract).
  */
object NearDupProf {
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
    import graft.ext.{Dedup, TextFns, Url}

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // ---- FunnelProbe corpus synthesis (identical shape — see FunnelProbe)
    def letters(c: org.apache.spark.sql.Column) =
      translate(c.cast("string"), "0123456789", "abcdefghij")
    val tmpl = pmod(xxhash64(col("doc_id"), lit(3L)), lit(n / 6 + 1))
    val vary = pmod(xxhash64(col("doc_id"), lit(5L)), lit(3L))
    def word(i: Int) =
      if (i == 7) concat(lit("v"), letters(tmpl * 3 + vary))
      else concat(lit(s"w$i"), letters(tmpl))
    val isShort = pmod(xxhash64(col("doc_id"), lit(13L)), lit(5L)) === 0
    val longText = concat_ws(" ", (0 until 18).map(word): _*)
    val shortText = concat_ws(" ", (0 until 5).map(word): _*)
    val ukey = col("doc_id") -
      when(col("doc_id") % 4 === 3, 1L).otherwise(0L)
    val url = concat(
      when(col("doc_id") % 3 === 0, "HTTPS://WWW.").when(col("doc_id") % 3 === 1, "https://")
        .otherwise("http://"),
      lit("site"), letters(ukey % 200000), lit(".com/p/"), letters(ukey),
      when(col("doc_id") % 2 === 0, "?utm_source=feed").otherwise(""))
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("source",
        when(pmod(xxhash64(col("doc_id"), lit(7L)), lit(4L)) === 0, lit("mega"))
          .otherwise(concat(lit("s"),
            pmod(xxhash64(col("doc_id"), lit(11L)), lit(40L)))))
      .withColumn("html", concat(
        lit("<html><head><script>track(1<2);</script></head><body>" +
          "<p>subscribe to our newsletter</p><p>"),
        when(isShort, shortText).otherwise(longText),
        lit("</p><div>footer variant "), (col("doc_id") % 3).cast("string"),
        lit("</div></body></html>")))
      .withColumn("url", url)
      .localCheckpoint()
    docs.count()

    val extracted = docs.select(col("doc_id"), col("source"), col("url"),
      TextFns.stripHtml(col("html")).as("text")).localCheckpoint()
    val afterUrl = Url.urlDedupKeep(extracted, "url", "doc_id")
      .filter(col("keep") === 1)
      .select("doc_id", "source", "url", "text").localCheckpoint()
    val keep = afterUrl.groupBy(md5(col("text")).as("__h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val afterExact0 = afterUrl.join(keep, Seq("doc_id")).localCheckpoint()
    val afterExact = afterExact0
      .join(Dedup.paragraphDedup(afterExact0, "doc_id", "text",
          delim = "\n", maxDocs = 3)
        .select(col("doc_id"), col("cleaned")), Seq("doc_id"))
      .drop("text").withColumnRenamed("cleaned", "text")
      .localCheckpoint()
    val nIn = afterExact.count()
    println(s"""{"probe":"neardup_prof","stage":"input","n_rows":$nIn}""")

    // ---- near-dup: the REAL operator (round-13 fused one-pass form),
    // materialized — pairs in one stage receipt, then cluster + keep.
    // (The pre-restructure per-substage receipts that motivated the fuse
    // are in bench_history/NEARDUPPROF_r13_1m.json / NEARDUPAB_r13_1m.json.)
    val threshold = 0.6
    val (tPairs, pairs) = time {
      Dedup.nearDupPairs(afterExact, "text", "doc_id", threshold = threshold,
        materialize = true).select("a_id", "b_id").localCheckpoint()
    }
    val nPairs = pairs.count()
    println(f"""{"probe":"neardup_prof","stage":"pairs","sec":$tPairs%.3f,"rows":$nPairs}""")

    val (tClust, clustersAndRounds) = time {
      val (c, r) = Dedup.dedupClustersWithRounds(pairs)
      (c.localCheckpoint(), r)
    }
    val nClust = clustersAndRounds._1.count()
    println(f"""{"probe":"neardup_prof","stage":"cluster","sec":$tClust%.3f,"rows":$nClust,"rounds":${clustersAndRounds._2}}""")

    val (tKeep, nOut) = time {
      val clusters = clustersAndRounds._1
        .select(col("id").as("doc_id"), col("cid"))
      afterExact.join(clusters, Seq("doc_id"), "left")
        .filter(col("cid").isNull || col("cid") === col("doc_id"))
        .drop("cid").count()
    }
    println(f"""{"probe":"neardup_prof","stage":"keep","sec":$tKeep%.3f,"rows":$nOut}""")

    val total = tPairs + tClust + tKeep
    println(f"""{"probe":"neardup_prof","stage":"total","sec":$total%.3f,"n_in":$nIn,"n_out":$nOut}""")
    spark.stop()
  }
}
