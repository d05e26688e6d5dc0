package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Adversarial-skew probe for the banded self-join family — the documented
  * 100 TB risk of `candidatePairs` (and the prefix join's bucket cousin) is
  * a DEGENERATE bucket distribution, not corpus size. [[ScaleProbe]]'s
  * synthesis is deliberately skew-free (per-document reorder keys); this
  * probe builds the opposite: corpora where a constant fraction of all
  * documents collides into the SAME buckets, and measures that the caps
  * turn the would-be n² into bounded work while the rest of the corpus is
  * still processed.
  *
  * Two adversaries, composable (both at once = the realistic worst case):
  *  - `clique p`: fraction p of the corpus is byte-identical copies of ONE
  *    base document → every LSH band has a bucket of size p·n; the exact
  *    route (not LSH) must own these. Uncapped candidate volume would be
  *    (p·n)²/2 per band.
  *  - `boiler p`: fraction p of the corpus carries the same 24-word
  *    boilerplate prefix (distinct tails) → the boilerplate shingles'
  *    document frequency is p·n, flooding the prefix join's gram index and
  *    the segment-dedup frequency table. Uncapped, every boilerplate gram
  *    would contribute (p·n)²/2 candidate slots.
  *
  * Measured per run (one JSON line, recorded in bench_history/):
  * max bucket size, capped LSH candidate volume vs the uncapped bound,
  * near-dup end-to-end, connected-components rounds on the clique graph
  * (pointer jumping must stay O(log clique), never O(clique)), prefix-join
  * candidates + time (gram cap), segment-dedup frequent-set size +
  * dropped-occurrence volume, and exact dedup (which is what actually
  * de-duplicates the clique).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.SkewProbe \
  *          [nDocs] [cliqueFrac] [boilerFrac]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val cliqueFrac = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val boilerFrac = args.lift(2).map(_.toDouble).getOrElse(0.2)
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
      .select(col("doc_id").as("base_id"), col("text"))
    val nBase = base.count()
    val copies = math.max(1L, n / nBase)
    val cliqueText = base.orderBy("base_id").select("text").head.getString(0)
    val boiler = (1 to 24).map(i => s"boilerplate$i").mkString(" ")

    // clique docs: byte-identical text. boiler docs: shared 24-word prefix,
    // then a per-document reordered tail (same policy as ScaleProbe — no
    // accidental cross-doc runs beyond the planted boilerplate).
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_docs").toString
    base
      .join(spark.range(copies).toDF("k"))
      .select((col("base_id") * copies + col("k")).as("doc_id"),
        expr("CASE WHEN k = 0 THEN text ELSE concat_ws(' ', transform(" +
          "array_sort(transform(split(text, ' '), " +
          "w -> struct(md5(concat(w, CAST(k AS STRING), '|', " +
          "CAST(base_id AS STRING))) AS h, w AS w))), " +
          "s -> s.w)) END").as("text"))
      .withColumn("__u", pmod(xxhash64(col("doc_id")), lit(1000L)))
      .select(col("doc_id"),
        when(col("__u") < lit((cliqueFrac * 1000).toLong), lit(cliqueText))
          .when(col("__u") < lit(((cliqueFrac + boilerFrac) * 1000).toLong),
            concat_ws(" ", lit(boiler), col("text")))
          .otherwise(col("text")).as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val nDocs = docs.count()

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]

    // ---- LSH: bucket shape + capped candidate volume vs uncapped bound --
    val (tBkt, bkt) = time {
      val sizes = Dedup.lshBands(Dedup.minhashSig(docs, "text", "doc_id"), "doc_id")
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val r = sizes.agg(max("n"),
        sum(when(col("n") > Dedup.DefaultMaxBucket,
          col("n") * (col("n") - 1) / 2).otherwise(0L)).cast("long"),
        sum(when(col("n") <= Dedup.DefaultMaxBucket,
          col("n") * (col("n") - 1) / 2).otherwise(0L)).cast("long")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    results += "max_bucket" -> ((tBkt, bkt._1))
    results += "uncapped_overcap_pair_bound" -> ((0.0, bkt._2))
    results += "capped_pair_bound" -> ((0.0, bkt._3))
    val (tCand, candN) = time {
      Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhashSig(docs, "text", "doc_id"), "doc_id"),
        "doc_id").count()
    }
    results += "lsh_candidates" -> ((tCand, candN))

    // ---- exact dedup owns the clique ----
    val (tExact, rExact) = time { Dedup.exactDedup(docs, "text", "doc_id").count() }
    results += "exact_dedup_groups" -> ((tExact, rExact))

    // ---- end-to-end near-dup + clustering over the skewed graph ----
    val (tNd, ndN) = time {
      Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.2)
        .select("a_id", "b_id").count()
    }
    results += "near_dup_pairs" -> ((tNd, ndN))
    // the clique's pair graph comes from the EXACT route: fingerprint
    // groups → star edges to the keeper, unioned with the LSH pairs; CC
    // rounds must stay logarithmic in the largest component
    val (tCc, cc) = time {
      val fps = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val keeper = fps.groupBy("h").agg(min("doc_id").as("keep_id"))
      val star = fps.join(keeper, Seq("h"))
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("keep_id").as("a_id"), col("doc_id").as("b_id"))
      val lsh = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.2)
        .select("a_id", "b_id")
      val (labels, rounds) = Dedup.dedupClustersWithRounds(star.union(lsh))
      (labels.count(), rounds)
    }
    results += "cc_labeled_docs" -> ((tCc, cc._1))
    results += "cc_rounds" -> ((0.0, cc._2.toLong))

    // ---- prefix join under gram-frequency flooding ----
    val (tPrefix, prefixN) = time {
      Dedup.prefixJoinPairs(docs, "text", "doc_id", threshold = 0.2).count()
    }
    results += "prefix_join_pairs" -> ((tPrefix, prefixN))

    // ---- the production mitigation: exact-dedup FIRST, then pair-join --
    // The clique collapses to one representative, so its grams' document
    // frequency falls back under the cap and the prefix join sees them
    // again. (The boilerplate flood is NOT fixed by this — its grams stay
    // at df = p·n across DISTINCT docs; that's what the maxToken budget
    // knob is for, and the recall loss is the documented, reported cost.)
    val (tMit, mitN) = time {
      val keepers = docs.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"))
      val ddocs = docs.join(keepers, Seq("doc_id"), "left_semi")
      Dedup.prefixJoinPairs(ddocs, "text", "doc_id", threshold = 0.2).count()
    }
    results += "prefix_pairs_after_exact_dedup" -> ((tMit, mitN))

    // ---- segment dedup: frequent set must track the BOILERPLATE ----
    val (tSegF, segF) = time {
      Dedup.frequentSegments(
        Dedup.segmentsOf(docs, "doc_id", "text", 4), maxDocs = 1).count()
    }
    results += "segment_frequent" -> ((tSegF, segF))
    val (tSeg, segDropped) = time {
      Dedup.segmentDedup(docs, "doc_id", "text")
        .agg(sum("n_dropped")).collect()(0).getLong(0)
    }
    results += "segment_dedup_dropped" -> ((tSeg, segDropped))

    // ---- mega-source capping: single-window vs the salted two-phase ----
    // A source holding ~50% of the corpus is the documented skew edge of
    // sourceCapKeep/tokenBudgetKeep (one window task owns half the scan).
    // Same docs, a planted source column: half the corpus lands in "mega",
    // the rest spreads over 32 small sources. The salted routes must return
    // IDENTICAL results (checksummed here; hash-gated at sf0.01) while the
    // wall clock flattens from one-task-bound to parallel.
    val srcDocs = docs.withColumn("source",
      when(pmod(xxhash64(col("doc_id"), lit(7L)), lit(2L)) === 0, lit("mega"))
        .otherwise(concat(lit("s"),
          pmod(xxhash64(col("doc_id"), lit(11L)), lit(32L)))))
      .localCheckpoint()
    val (tCapPlain, capPlain) = time {
      val r = graft.ext.Sampling.sourceCapKeep(srcDocs, "doc_id", "source", 1000)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (tCapSalted, capSalted) = time {
      val r = graft.ext.Sampling.sourceCapKeep(srcDocs, "doc_id", "source", 1000,
          salts = 64)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(capPlain == capSalted,
      s"salted cap diverged: $capPlain vs $capSalted")
    results += "source_cap_plain" -> ((tCapPlain, capPlain._1))
    results += "source_cap_salted64" -> ((tCapSalted, capSalted._1))
    val (tBudPlain, budPlain) = time {
      val r = graft.ext.Sampling.tokenBudgetKeep(
          srcDocs, "doc_id", "source", "text", 100000L)
        .agg(sum("cum_tokens"), sum("keep")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (tBudSalted, budSalted) = time {
      val r = graft.ext.Sampling.tokenBudgetKeep(
          srcDocs, "doc_id", "source", "text", 100000L, rangeBuckets = 256)
        .agg(sum("cum_tokens"), sum("keep")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(budPlain == budSalted,
      s"bucketed budget diverged: $budPlain vs $budSalted")
    results += "token_budget_plain" -> ((tBudPlain, budPlain._2))
    results += "token_budget_bucketed256" -> ((tBudSalted, budSalted._2))

    val json = results.map { case (k, (t, v)) =>
      f""""$k":{"sec":$t%.3f,"n":$v}"""
    }.mkString(", ")
    println(s"""{"probe":"skew","n_docs":$nDocs,"clique_frac":$cliqueFrac,""" +
      s""""boiler_frac":$boilerFrac,"max_bucket_cap":${Dedup.DefaultMaxBucket},""" +
      s""" $json}""")
  }
}
