package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling, TextFns}

/** Empirical scale probe for the LLM-pipeline operator stack: synthesize an
  * N-document corpus (100–1000× the shipped fixtures) and time the headline
  * dedup/text operators on it, printing one JSON line per run.
  *
  * Why it exists: the 100 TB design claims (LSH candidates are Σ bucket²
  * not n², cluster cost scales with the pair graph, sampling/packing are
  * one-pass) should be MEASURED, not argued. This is the local stand-in for
  * a cluster soak test; PLANS.md records the resulting scaling table.
  *
  * Corpus synthesis: each of the sf base docs is copied `N/|base|` times.
  * Copy 0 keeps the original text (preserving the base corpus's own
  * near-dup structure); copies >= 1 re-order words by md5(word ⊕ base ⊕
  * copy) — a PER-DOCUMENT key, so reordered copies share no shingle runs
  * with anything (a common sort key would manufacture cross-doc runs out
  * of overlapping vocabulary and melt LSH into a dense pair clique — the
  * first version of this probe did exactly that). Word multisets survive,
  * so token statistics stay realistic.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.ScaleProbe [nDocs]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("base_id"), col("text"), col("lang"))
    val nBase = base.count()
    val copies = math.max(1L, n / nBase)

    val dir = java.nio.file.Files.createTempDirectory("graft_scale_docs").toString
    val synth = base
      .join(spark.range(copies).toDF("k")) // cross: |base| × copies
      .select(
        (col("base_id") * copies + col("k")).as("doc_id"),
        expr("CASE WHEN k = 0 THEN text ELSE concat_ws(' ', transform(" +
          "array_sort(transform(split(text, ' '), " +
          "w -> struct(md5(concat(w, CAST(k AS STRING), '|', " +
          "CAST(base_id AS STRING))) AS h, w AS w))), " +
          "s -> s.w)) END").as("text"),
        col("lang"))
      .repartition(cpus.toInt)
    synth.write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val nDocs = docs.count()

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // per-op progress to stderr: a multi-hour stall is attributable to a
    // NAMED op without a thread dump (learned the hard way this round)
    val results = new scala.collection.mutable.LinkedHashMap[String, (Double, Long)] {
      override def addOne(kv: (String, (Double, Long))): this.type = {
        System.err.println(f"[probe] ${kv._1} ${kv._2._1}%.2f s rows=${kv._2._2}")
        super.addOne(kv)
      }
    }

    // SPARK_GRAFT_PROBE_SKIP=cap,prefix skips named expensive blocks so a
    // targeted question (e.g. segment-dedup growth at 200 k) doesn't pay the
    // multi-minute cap-recall enumeration / prefix-join worst case.
    val skip: Set[String] = sys.env.get("SPARK_GRAFT_PROBE_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

    val (tExact, rExact) = time {
      Dedup.exactDedup(docs, "text", "doc_id").count()
    }
    results += "exact_dedup" -> ((tExact, rExact))

    val (tSig, rSig) = time {
      Dedup.minhashSig(docs, "text", "doc_id").count()
    }
    results += "minhash_sig" -> ((tSig, rSig))

    // Stage-level diagnostics: candidate volume is THE LSH health metric
    // (Σ min(bucket, cap)²); a candidate blow-up shows here before the
    // verify pays it. The first 50 k run of this probe measured 83M
    // candidates (4068 true pairs) from boilerplate-shingle buckets of 11 k
    // docs — that finding produced Dedup.DefaultMaxBucket.
    val (tCand, candN) = time {
      val sig = Dedup.minhashSig(docs, "text", "doc_id")
      Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id"), "doc_id").count()
    }
    results += "lsh_candidates" -> ((tCand, candN))

    // Bucket-size health: the largest bucket and how many band rows the
    // degenerate-bucket cap excludes (0 on healthy corpora).
    val (tBkt, bktStats) = time {
      val sizes = Dedup.lshBands(Dedup.minhashSig(docs, "text", "doc_id"), "doc_id")
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      val r = sizes.agg(max("n").as("max_bucket"),
        sum(when(col("n") > Dedup.DefaultMaxBucket, col("n")).otherwise(0L)).as("dropped"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    results += "max_bucket" -> ((tBkt, bktStats._1))
    results += "band_rows_dropped" -> ((0.0, bktStats._2))

    if (!skip("neardup")) {
      val (tPairs, pairsN) = time {
        Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.2)
          .select("a_id", "b_id").count()
      }
      results += "near_dup_pairs" -> ((tPairs, pairsN))
    }

    // ---- segment dedup: does the frequent set stay broadcast-sized? ----
    // The op's 100 TB viability rests on |frequent| (segments in > maxDocs
    // distinct docs — the boilerplate) growing with the BOILERPLATE, not the
    // corpus: reordered copies contribute no repeated segments, duplicated
    // docs repeat existing ones. Record its cardinality next to the
    // end-to-end time and dropped-occurrence volume.
    val (tSegFreq, segFreqN) = time {
      Dedup.frequentSegments(
        Dedup.segmentsOf(docs, "doc_id", "text", 4), maxDocs = 1).count()
    }
    results += "segment_frequent" -> ((tSegFreq, segFreqN))
    val (tSeg, segDropped) = time {
      Dedup.segmentDedup(docs, "doc_id", "text")
        .agg(sum("n_dropped")).collect()(0).getLong(0)
    }
    results += "segment_dedup_dropped" -> ((tSeg, segDropped))

    // ---- containment join: does the asymmetric index stay bounded? ----
    // The contained side prefixes to its rarest grams, but the container
    // side indexes EVERY capped gram — candidate volume is Σ over prefix
    // tokens of df(token), bounded by the frequency cap. Measured so the
    // asymmetry's real cost (vs the symmetric prefix join) is on record.
    if (!skip("containment")) {
      val (tCont, contN) = time {
        Dedup.containmentPairs(docs, "text", "doc_id", threshold = 0.5).count()
      }
      results += "containment_pairs" -> ((tCont, contN))
    }

    // ---- cap recall: what does DefaultMaxBucket actually cost, per J? ----
    // True near-dup pairs lost to the cap are pairs that (a) co-bucket ONLY
    // in over-cap buckets (an anti-join vs the capped candidate set credits
    // pairs still reachable via a healthy band), (b) survive the lossless
    // size-ratio prefilter, and (c) verify at J >= 0.2. The dropped pair set
    // is quadratic in degenerate-bucket size, so the sample rate is fixed UP
    // FRONT from the cheap Σ sz·(sz−1)/2 bound over over-cap buckets, and the
    // deterministic md5(a|b) predicate is pushed BELOW the distinct (pair
    // membership is a pure pair function, so it commutes) — the full dropped
    // set is never materialized. Losses are reported per J bin against the
    // kept pairs' bins: banded LSH at (b=4, r=2) has its S-curve midpoint at
    // t* = (1/b)^(1/r) ≈ 0.5, so the bins show whether the cap costs recall
    // in the J range where the banding itself promises any. Lost pairs with
    // identical text are counted separately: exact dedup catches those
    // regardless of LSH, so they are not really lost.
    if (!skip("cap")) {
    val CapThreshold = 0.2
    val SampleCap = 2000000L
    def jBin(j: Column): Column =
      when(j >= 0.7, "j70plus").when(j >= 0.5, "j50_70")
        .when(j >= 0.35, "j35_50").otherwise("j20_35")
    // xxhash64, not md5: the sample predicate runs on every enumerated pair
    // slot of the over-cap join (billions at 200 k docs) and is probe-
    // internal — deterministic is all it needs to be
    val pairKey = (a: Column, b: Column) => pmod(xxhash64(a, b), lit(1000L))
    val (tRecall, recallOut) = time {
      val sig = Dedup.minhashSig(docs, "text", "doc_id", withSetSize = true)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
      val sized = Dedup.lshBands(sig, "doc_id", carry = Seq("__nset"))
        .withColumn("__bsz", count(lit(1)).over(w))
        .localCheckpoint()
      val overBound = sized.filter(col("__bsz") > Dedup.DefaultMaxBucket)
        .select("band", "bucket", "__bsz").distinct()
        .agg(coalesce(sum(col("__bsz") * (col("__bsz") - 1) / 2), lit(0L))
          .cast("long"))
        .collect()(0).getLong(0)
      val permille =
        if (overBound <= SampleCap) 1000L
        else math.max(1L, SampleCap * 1000L / overBound)
      def pairsOf(bandRows: DataFrame, samplePermille: Long): DataFrame = {
        def side(tag: String) = bandRows.select(
          col("doc_id").as(s"${tag}_id"), col("__nset").as(s"__n$tag"),
          col("band"), col("bucket")).hint("shuffle_hash")
        val joined = side("a").join(side("b"), Seq("band", "bucket"))
          .filter(col("a_id") < col("b_id"))
          .filter(least(col("__na"), col("__nb")).cast("double") >=
            lit(CapThreshold) * greatest(col("__na"), col("__nb")))
        val sampled = if (samplePermille >= 1000L) joined
          else joined.filter(pairKey(col("a_id"), col("b_id")) < lit(samplePermille))
        sampled.select("a_id", "b_id").distinct()
      }
      val kept = pairsOf(sized.filter(col("__bsz") <= Dedup.DefaultMaxBucket), 1000L)
      val lostSampled = pairsOf(sized.filter(col("__bsz") > Dedup.DefaultMaxBucket), permille)
        .join(kept, Seq("a_id", "b_id"), "left_anti")
      val sets = graft.ext.Par.ensure(docs.select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("__ws"), md5(col("text")).as("__th"))
        .select(col("doc_id"),
          array_distinct(Dedup.shinglesOfWords(col("__ws"), 3)).as("sset"), col("__th"))
      val lostHist = lostSampled
        .join(sets.select(col("doc_id").as("a_id"), col("sset").as("sa"),
          col("__th").as("ha")), Seq("a_id"))
        .join(sets.select(col("doc_id").as("b_id"), col("sset").as("sb"),
          col("__th").as("hb")), Seq("b_id"))
        .withColumn("__j", Dedup.jaccard(col("sa"), col("sb")))
        .filter(col("__j") >= CapThreshold)
        .groupBy(jBin(col("__j")).as("bin"))
        .agg(count(lit(1)).as("n"), sum((col("ha") === col("hb")).cast("long")).as("ex"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      (overBound, permille, lostHist)
    }
    val (overBound, permille, lostHist) = recallOut
    // kept verified pairs per J bin (one more nearDupPairs run, with J kept)
    val keptHist = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = CapThreshold)
      .groupBy(jBin(col("jaccard")).as("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    results += "cap_overcap_pair_bound" -> ((tRecall, overBound))
    results += "cap_sample_permille" -> ((0.0, permille))
    val bins = Seq("j20_35", "j35_50", "j50_70", "j70plus")
    // scaled estimates; exact-text losses (always J=1 -> j70plus) excluded
    // from the lost side of every recall, since exactDedup catches them
    val exactReachable = lostHist.values.map(_._2).sum * 1000L / permille
    val lostEst = bins.map { b =>
      val raw = lostHist.get(b).map(_._1).getOrElse(0L) -
        (if (b == "j70plus") lostHist.get(b).map(_._2).getOrElse(0L) else 0L)
      b -> raw * 1000L / permille
    }.toMap
    bins.foreach { b =>
      results += s"cap_lost_$b" -> ((0.0, lostEst(b)))
      results += s"cap_kept_$b" -> ((0.0, keptHist.getOrElse(b, 0L)))
    }
    results += "cap_lost_exact_reachable" -> ((0.0, exactReachable))
    def recallPermille(fromBin: Int): Long = {
      val k = bins.drop(fromBin).map(b => keptHist.getOrElse(b, 0L)).sum
      val l = bins.drop(fromBin).map(lostEst).sum
      if (k + l <= 0L) 1000L else math.round(k * 1000.0 / (k + l))
    }
    results += "cap_recall_permille" -> ((0.0, recallPermille(0)))
    results += "cap_recall_j50plus_permille" -> ((0.0, recallPermille(2)))
    results += "cap_recall_j70plus_permille" -> ((0.0, recallPermille(3)))
    } // skip("cap")

    // The lossless marginal-threshold path: prefix-filter set-similarity
    // join at the same J >= 0.2. Contrast rows: capped LSH keeps ~21 % of
    // true pairs here (cap_recall_permille); the prefix join is lossless
    // modulo its OWN cap — shingles whose global frequency exceeds
    // DefaultMaxBucket leave candidate generation, and on this dense
    // synthetic corpus that bites (reported, not hidden: pairs found vs the
    // kept+lost estimate above tells the recall story).
    if (!skip("prefix")) {
    val (tPrefix, prefixN) = time {
      Dedup.prefixJoinPairs(docs, "text", "doc_id", threshold = 0.2).count()
    }
    results += "prefix_join_pairs" -> ((tPrefix, prefixN))
    } // skip("prefix")

    // ---- winnowing: prints are scan-bound (zero shuffles); the pair join
    // cost tracks Σ df(print)² over the ≤ maxToken print index, at ~2/(w+1)
    // the density of the full gram index — measured here so the top-2 bench
    // entries (x_winnow_fp / x_winnow_pairs) have ladder numbers, not just
    // sf0.1 points.
    if (!skip("winnow")) {
      val (tWfp, wfpN) = time {
        graft.ext.Par.ensure(docs.select("doc_id", "text"))
          .select(col("doc_id"), split(col("text"), " ").as("__ws"))
          .select(explode(TextFns.winnowedPrints(col("__ws"), 3, 4)).as("p"))
          .count()
      }
      results += "winnow_prints" -> ((tWfp, wfpN))
      val (tWp, wpN) = time {
        Dedup.winnowPairs(docs, "text", "doc_id").count()
      }
      results += "winnow_pairs" -> ((tWp, wpN))
    }

    // ---- duplicate spans: the window-frequency agg shuffles ~one row per
    // corpus TOKEN (the heaviest per-token shuffle in the stack) — measured
    // so its growth constant is on record next to the segment/winnow rows.
    if (!skip("span")) {
      val (tSpan, spanN) = time {
        Dedup.duplicateSpanStats(docs, "doc_id", "text")
          .agg(sum("n_dup_windows")).collect()(0).getLong(0)
      }
      results += "span_dup_windows" -> ((tSpan, spanN))
    }

    // ---- bulk BPE: one scan, zero shuffles; cost ∝ corpus chars ----
    if (!skip("bpe")) {
      val (tBpe, bpeN) = time {
        graft.ext.Bpe.tokenizeBulkNative(docs, "doc_id", "text",
            graft.ext.Bpe.DemoMerges)
          .agg(sum(size(col("tokens")))).collect()(0).getLong(0)
      }
      results += "bpe_tokens" -> ((tBpe, bpeN))
    }

    if (!skip("neardup")) {
    val (tClust, rClust) = time {
      // pairs materialized first so this times the cluster rounds, not a
      // recompute of the LSH pipeline
      val pairs = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.2)
        .select("a_id", "b_id").localCheckpoint()
      val (labels, rounds) = Dedup.dedupClustersWithRounds(pairs)
      (labels.count(), rounds)
    }
    results += "pairs_plus_clusters" -> ((tClust, rClust._1))
    results += "cluster_rounds" -> ((0.0, rClust._2.toLong))
    } // skip("neardup")

    if (!skip("store")) {
    // The production refresh path: half the corpus is the "existing" side,
    // persisted once as the partitioned band store (the ingest-time
    // artifact); the other half probes it as the refresh batch. Store build
    // and probe are timed separately — the build amortizes across refreshes.
    val half = nDocs / 2
    val storeDir = java.nio.file.Files.createTempDirectory("graft_scale_store").toString
    val (tStore, _) = time {
      Dedup.writeBands(
        Dedup.lshBands(
          Dedup.minhashSig(docs.filter(col("doc_id") < half), "text", "doc_id"),
          "doc_id"),
        storeDir)
    }
    results += "band_store_build" -> ((tStore, half))
    val (tIncr, rIncr) = time {
      Dedup.incrementalNearDupsFromBands(
        docs.filter(col("doc_id") >= half),
        spark.read.parquet(storeDir),
        docs.filter(col("doc_id") < half),
        "text", "doc_id", threshold = 0.2).count()
    }
    results += "incr_probe" -> ((tIncr, rIncr))
    // Bloom-accelerated incremental EXACT dedup on the same refresh split:
    // filter build (treeAggregate over the corpus half) timed apart from
    // the probe, mirroring the band store's build/probe split.
    val (tBloom, rBloom) = time {
      Dedup.bloomNewDocs(
        docs.filter(col("doc_id") >= half),
        docs.filter(col("doc_id") < half),
        "text", "doc_id", fpp = 0.01, expectedItems = half).count()
    }
    results += "bloom_new_docs" -> ((tBloom, rBloom))
    } // skip("store")

    val (tTok, rTok) = time {
      graft.ext.Par.ensure(docs.select("text"))
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20).count()
    }
    results += "token_topk" -> ((tTok, rTok))

    val (tFunnel, rFunnel) = time {
      val staged = graft.ext.Par.ensure(docs.select("doc_id", "text", "lang"))
        .withColumn("__ws", split(col("text"), " "))
        .withColumn("fp",
          array_min(transform(Dedup.shinglesOfWords(col("__ws"), 3), x => md5(x))))
        .withColumn("q",
          round(TextFns.qualityScoreOfWords(col("text"), col("__ws")), 6) >= 0.5)
        .withColumn("smp", Sampling.hashPct(col("doc_id")) < 60)
      staged.agg(
        count(lit(1)).as("n_total"),
        countDistinct(when(col("q") && col("smp"), col("fp"))).as("n_unique"))
        .collect()(0).getLong(0)
    }
    results += "curation_funnel" -> ((tFunnel, rFunnel))

    // Opt-in (SPARK_GRAFT_SCALE_STREAM=1): the ONLINE near-dup path — the
    // synthetic corpus replayed through StreamingNearDup's per-row-signature
    // band stream + (band,bucket)-keyed state as a real multi-batch file
    // stream. Comparable to lsh_candidates (same banding, same corpus), but
    // paid incrementally per micro-batch with bounded state instead of one
    // batch join. Reported rows = DISTINCT candidate pairs emitted.
    if (sys.env.get("SPARK_GRAFT_SCALE_STREAM").contains("1")) {
      val (tStream, rStream) = time {
        graft.streaming.StreamingNearDup
          .candidatesFileRun(spark, dir, chunks = 8)
          .select("a_id", "b_id").distinct().count()
      }
      results += "stream_neardup_pairs" -> ((tStream, rStream))
    }

    val qs = results.map { case (k, (t, rows)) =>
      "\"" + k + "\":{\"sec\":" + f"$t%.2f" + ",\"rows\":" + rows + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","n_docs":$nDocs,"copies":$copies,"ops":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
