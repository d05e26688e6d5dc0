package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B experiments for the near-dup stage terms NearDupProf exposed
  * (sig 24% / verify 39% / cluster 20% at the 1 M rung). Each variant is
  * result-identical by construction; the winner gets folded back into
  * Dedup.nearDupPairs and re-gated. Scratch harness — receipts land in
  * PLANS.md, the code path itself is throwaway.
  */
object NearDupAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val which = args.drop(1).headOption.getOrElse("all")
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

    // FunnelProbe corpus through exact+paragraph dedup (same as NearDupProf)
    def letters(c: Column) =
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
      .withColumn("html", concat(
        lit("<html><head><script>track(1<2);</script></head><body>" +
          "<p>subscribe to our newsletter</p><p>"),
        when(isShort, shortText).otherwise(longText),
        lit("</p><div>footer variant "), (col("doc_id") % 3).cast("string"),
        lit("</div></body></html>")))
      .withColumn("url", url)
      .localCheckpoint()
    docs.count()
    val extracted = docs.select(col("doc_id"), col("url"),
      TextFns.stripHtml(col("html")).as("text")).localCheckpoint()
    val afterUrl = Url.urlDedupKeep(extracted, "url", "doc_id")
      .filter(col("keep") === 1).select("doc_id", "url", "text").localCheckpoint()
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
    println(s"""{"probe":"neardup_ab","n_in":$nIn}""")

    val numHashes = 8; val bandSize = 2; val shingleK = 3
    val threshold = 0.6

    // ---------- SIG variants ----------
    if (which == "all" || which == "sig") {
      // A: current — countDistinct inside the agg (Expand doubles rows)
      val (tA, rA) = time {
        Dedup.minhashSig(afterExact, "text", "doc_id", numHashes, shingleK,
          withSetSize = true).localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"sig_countDistinct","sec":$tA%.3f,"rows":$rA}""")

      // B: per-row distinct — size(array_distinct) in the projection, explode
      // the DISTINCT shingles (min is idempotent -> identical h0..h7; __nset
      // identical up to md5 collisions, same assumption as A)
      val (tB, rB) = time {
        val withShingles = afterExact
          .select(col("doc_id"), split(col("text"), " ").as("__ws"))
          .select(col("doc_id"),
            array_distinct(Dedup.shinglesOfWords(col("__ws"), shingleK)).as("__ds"))
          .select(col("doc_id"), size(col("__ds")).as("__nset0"),
            explode(col("__ds")).as("s"))
        val halves = withShingles
          .select(col("doc_id"), col("__nset0"), md5(col("s")).as("__m"))
          .select(col("doc_id"), col("__nset0"),
            conv(substring(col("__m"), 1, 14), 16, 10).cast("long").as("__a"),
            conv(substring(col("__m"), 15, 14), 16, 10).cast("long").as("__b"))
        val aggs = (0 until numHashes).map(i =>
          min(col("__a") + lit(i.toLong) * col("__b")).as(s"h$i")) :+
          first(col("__nset0")).cast("int").as("__nset")
        halves.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
          .localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"sig_rowDistinct","sec":$tB%.3f,"rows":$rB}""")
    }

    // ---------- VERIFY variants ----------
    if (which == "all" || which == "verify") {
      val sig = Dedup.minhashSig(afterExact, "text", "doc_id", numHashes,
        shingleK, withSetSize = true).localCheckpoint()
      val cands = Dedup.candidatePairs(
        Dedup.lshBands(sig, "doc_id", numHashes, bandSize, carry = Seq("__nset")),
        "doc_id", Dedup.DefaultMaxBucket,
        sizeCol = Some("__nset"), sizeRatioMin = threshold).localCheckpoint()
      cands.count()

      def hashedSet = afterExact
        .select(col("doc_id"), split(col("text"), " ").as("__ws"))
        .select(col("doc_id"), array_sort(transform(
          array_distinct(Dedup.shinglesOfWords(col("__ws"), shingleK)),
          s => xxhash64(s))).as("sset"))
      val inter = graft.functions.GraftExpressions
        .sorted_intersect_count_long(col("sa"), col("sb")).cast("double")

      // A: current — two joins over the same lazy sets subplan (ReuseExchange)
      val (tA, rA) = time {
        cands
          .join(hashedSet.select(col("doc_id").as("a_id"), col("sset").as("sa")), Seq("a_id"))
          .join(hashedSet.select(col("doc_id").as("b_id"), col("sset").as("sb")), Seq("b_id"))
          .withColumn("jaccard", inter / (size(col("sa")) + size(col("sb")) - inter))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"verify_reuse","sec":$tA%.3f,"rows":$rA}""")

      // B: checkpoint the sets once, then two joins on materialized rows
      val (tB, rB) = time {
        val sets = hashedSet.localCheckpoint()
        cands
          .join(sets.select(col("doc_id").as("a_id"), col("sset").as("sa")), Seq("a_id"))
          .join(sets.select(col("doc_id").as("b_id"), col("sset").as("sb")), Seq("b_id"))
          .withColumn("jaccard", inter / (size(col("sa")) + size(col("sb")) - inter))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"verify_ckpt","sec":$tB%.3f,"rows":$rB}""")

      // C: checkpointed sets + shuffle_hash hints (kill the SMJ sorts)
      val (tC, rC) = time {
        val sets = hashedSet.localCheckpoint()
        cands
          .join(sets.select(col("doc_id").as("a_id"), col("sset").as("sa"))
            .hint("shuffle_hash"), Seq("a_id"))
          .join(sets.select(col("doc_id").as("b_id"), col("sset").as("sb"))
            .hint("shuffle_hash"), Seq("b_id"))
          .withColumn("jaccard", inter / (size(col("sa")) + size(col("sb")) - inter))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"verify_ckpt_hash","sec":$tC%.3f,"rows":$rC}""")

      // D: lazy sets + shuffle_hash hints (no checkpoint — does ReuseExchange
      // still fire under the hint?)
      val (tD, rD) = time {
        cands
          .join(hashedSet.select(col("doc_id").as("a_id"), col("sset").as("sa"))
            .hint("shuffle_hash"), Seq("a_id"))
          .join(hashedSet.select(col("doc_id").as("b_id"), col("sset").as("sb"))
            .hint("shuffle_hash"), Seq("b_id"))
          .withColumn("jaccard", inter / (size(col("sa")) + size(col("sb")) - inter))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"verify_lazy_hash","sec":$tD%.3f,"rows":$rD}""")
    }

    // ---------- WHOLE-STAGE variants (sig -> verified pairs) ----------
    // The cross-stage win candidate: ONE explode+agg produces the minhash
    // sig AND the sorted xxhash64 verify set (collect_list rides the same
    // shuffle; pre-distinct kills the countDistinct Expand), so the corpus
    // is shingled ONCE and the verify joins probe the agg's own hash
    // partitioning instead of re-shingling a second scan.
    if (which == "all" || which == "fused") {
      val inter = graft.functions.GraftExpressions
        .sorted_intersect_count_long(col("sa"), col("sb")).cast("double")

      def fusedSigSets: DataFrame = {
        val withShingles = afterExact
          .select(col("doc_id"), split(col("text"), " ").as("__ws"))
          .select(col("doc_id"),
            explode(array_distinct(Dedup.shinglesOfWords(col("__ws"), shingleK))).as("s"))
        val halves = withShingles
          .select(col("doc_id"), md5(col("s")).as("__m"), xxhash64(col("s")).as("__x"))
          .select(col("doc_id"),
            conv(substring(col("__m"), 1, 14), 16, 10).cast("long").as("__a"),
            conv(substring(col("__m"), 15, 14), 16, 10).cast("long").as("__b"),
            col("__x"))
        val aggs = (0 until numHashes).map(i =>
          min(col("__a") + lit(i.toLong) * col("__b")).as(s"h$i")) ++ Seq(
          count(lit(1)).cast("int").as("__nset"),
          sort_array(collect_list(col("__x"))).as("sset"))
        halves.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      }

      def run(sigSets: DataFrame): Long = {
        val cands = Dedup.candidatePairs(
          Dedup.lshBands(sigSets.drop("sset"), "doc_id", numHashes, bandSize,
            carry = Seq("__nset")),
          "doc_id", Dedup.DefaultMaxBucket,
          sizeCol = Some("__nset"), sizeRatioMin = threshold)
        val sets = sigSets.select(col("doc_id"), col("sset"))
        cands
          .join(sets.select(col("doc_id").as("a_id"), col("sset").as("sa")), Seq("a_id"))
          .join(sets.select(col("doc_id").as("b_id"), col("sset").as("sb")), Seq("b_id"))
          .withColumn("jaccard", inter / (size(col("sa")) + size(col("sb")) - inter))
          .filter(col("jaccard") >= threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }

      // A: current full path (nearDupPairs as shipped)
      val (tA, rA) = time {
        Dedup.nearDupPairs(afterExact, "text", "doc_id", threshold = threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"stage_current","sec":$tA%.3f,"rows":$rA}""")

      // B: fused one-pass, lazy (ReuseExchange carries the shared shuffle)
      val (tB, rB) = time { run(fusedSigSets) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_lazy","sec":$tB%.3f,"rows":$rB}""")

      // C: fused one-pass, sig+sets checkpointed once
      val (tC, rC) = time { run(fusedSigSets.localCheckpoint()) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_ckpt","sec":$tC%.3f,"rows":$rC}""")

      // D: fused one-pass, finalized agg materialized via an explicit
      // repartition(id) exchange shared by all three consumers — no
      // persistent RDD (the no-leak spec), still one finalization
      val (tD, rD) = time { run(fusedSigSets.repartition(col("doc_id"))) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_repart","sec":$tD%.3f,"rows":$rD}""")

      // A2/B2/C2: interleaved repeats (host-noise discipline)
      val (tA2, rA2) = time {
        Dedup.nearDupPairs(afterExact, "text", "doc_id", threshold = threshold)
          .select("a_id", "b_id").localCheckpoint().count()
      }
      println(f"""{"probe":"neardup_ab","variant":"stage_current2","sec":$tA2%.3f,"rows":$rA2}""")
      val (tB2, rB2) = time { run(fusedSigSets) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_lazy2","sec":$tB2%.3f,"rows":$rB2}""")
      val (tC2, rC2) = time { run(fusedSigSets.localCheckpoint()) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_ckpt2","sec":$tC2%.3f,"rows":$rC2}""")
      val (tD2, rD2) = time { run(fusedSigSets.repartition(col("doc_id"))) }
      println(f"""{"probe":"neardup_ab","variant":"stage_fused_repart2","sec":$tD2%.3f,"rows":$rD2}""")
    }

    // ---------- CLUSTER variants ----------
    if (which == "all" || which == "cluster") {
      val pairs = Dedup.nearDupPairs(afterExact, "text", "doc_id",
        threshold = threshold).select("a_id", "b_id").localCheckpoint()
      pairs.count()
      val (tA, rA) = time {
        val (c, rounds) = Dedup.dedupClustersWithRounds(pairs)
        val n = c.count(); (n, rounds)
      }
      println(f"""{"probe":"neardup_ab","variant":"cluster_current","sec":$tA%.3f,"rows":${rA._1},"rounds":${rA._2}}""")
    }

    spark.stop()
  }
}
