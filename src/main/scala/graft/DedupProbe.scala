package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scale rung for the DEDUP family on the parquet materialization primitive
  * — the receipt the r14 verdict asked for (item 1): the family's
  * corpus-scale intermediates (fused sig+verify sets, per-round cluster
  * labels, gram frequency / id-set tables) moved from `localCheckpoint` to
  * size-routed parquet this round, and the claim that the parquet route
  * carries the next ladder rung must be MEASURED, exactly like the r14
  * 30 M link rung that retired the checkpoint for the link family.
  *
  * Corpus synthesis (twinned): each base doc is copied `N/|base|` times;
  * copies 2j and 2j+1 share a per-twin-group word suffix, so every doc has
  * EXACTLY ONE verbatim twin (N/2 true pairs — the pair graph is
  * corpus-scale, which is what makes the cluster stage a real test: the
  * label table is all N nodes) and twin GROUPS share no vocabulary at all. Disjoint group vocabularies
  * are deliberate: this rung measures the MATERIALIZATION MACHINERY's
  * throughput with exactly predictable outputs (n_pairs = N/2, labels = N,
  * rounds = 2) and a by-construction corpus-scale gram vocabulary (~52
  * distinct shingles per group × N/2 groups); a shared-vocabulary variant
  * (the 300 k shakedown of this probe) manufactures quadratic-in-copies
  * candidate noise in the minShared=2 winnow join that no real corpus
  * exhibits at this density — recall-under-noise receipts live in
  * ScaleProbe's cap/recall blocks, not here. Stages, each timed separately
  * over materialized inputs:
  *
  *   neardup  — nearDupPairs(materialize = true): the fused one-pass
  *              sig+sets table takes the PARQUET route (the corpus measures
  *              big), then banding + size-ratio prefilter + long-merge
  *              verify; count of verified pairs (expect ≈ N/2).
  *   clusters — dedupClustersWithRounds over the materialized pair set:
  *              N-node label tables per round on the parquet route
  *              (measured edge count ≥ ClusterMatMinRows).
  *   prefix   — prefixJoinPairs at J ≥ 0.2: buildIdSets' gram-frequency +
  *              id-set tables on the parquet route (vocabulary here is
  *              corpus-scale by construction). Skippable: its token-join
  *              candidate volume (Σ df²) dominates the rung's wall.
  *   winnow   — winnowPairs: the print-frequency table's parquet route.
  *
  * SPARK_GRAFT_PROBE_SKIP=prefix,winnow skips named stages (ScaleProbe
  * contract). One JSON line on stdout.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.DedupProbe [nDocs]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    // era constant first (before Spark's threads) — every probe
    // receipt carries it so cross-session rungs are era-checkable
    val eraField = Era.jsonField()
    System.err.println(s"[probe] $eraField")
    val n = args.headOption.map(_.toLong).getOrElse(30000000L)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // spill-aware shuffle sizing (the 100 TB stance, measured at this
      // rung): a fixed 32-partition shuffle puts 800 MB+ of the 10 M
      // corpus's 26 GB sig shuffle on each reduce task — the first 10 M
      // run read 28x the 1 M wall from exactly that. A high INITIAL count
      // lets AQE coalesce each stage to its own right size (~64 MB
      // advisory chunks), which is what a real cluster's thousands of
      // shuffle partitions give for free.
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skip: Set[String] = sys.env.get("SPARK_GRAFT_PROBE_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("base_id"), col("text"))
    val nBase = base.count()
    val copies = math.max(2L, n / nBase)

    val scratch = Scratch.dir("graft-dedupprobe")
    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def log(name: String, sec: Double, rows: Long): Unit =
      System.err.println(f"[probe] $name $sec%.2f s rows=$rows")

    // per-twin-group word suffix: copies 2j/2j+1 share the group id g, so
    // they are verbatim equal; every other pair of docs shares zero
    // vocabulary (no reorder needed — disjoint suffixes already make the
    // groups' shingle universes disjoint, and skipping the md5 sort keeps
    // synthesis I/O-bound instead of dominating the rung)
    val (tSynth, nDocs) = time {
      val g = s"CAST(base_id * $copies + k DIV 2 AS STRING)"
      // the RANGE side drives partitioning (parallel by construction) and
      // the 5 k-row base broadcasts — the reversed join generated all N
      // rows on the base parquet's ONE input task (measured: a single
      // 220 s-CPU task at the 10 M rung while 31 cores idled)
      spark.range(copies).toDF("k")
        .repartition(cpus.toInt * 8)
        .join(broadcast(base))
        .select((col("base_id") * copies + col("k")).as("doc_id"),
          expr("concat_ws(' ', transform(split(text, ' '), " +
            s"w -> concat(w, '_', $g)))").as("text"))
        .write.parquet(s"$scratch/docs")
      spark.read.parquet(s"$scratch/docs").count()
    }
    log("synth", tSynth, nDocs)
    val docs = spark.read.parquet(s"$scratch/docs")

    // headline: the fused sig+sets table on the parquet route, end-to-end
    // to verified pairs, materialized for the cluster stage
    val (tPairs, nPairs) = time {
      Dedup.nearDupPairs(docs, "text", "doc_id", materialize = true)
        .select("a_id", "b_id")
        .write.parquet(s"$scratch/pairs")
      spark.read.parquet(s"$scratch/pairs").count()
    }
    log("neardup_pairs", tPairs, nPairs)

    val (tClust, clustOut) = time {
      val (labels, rounds) = Dedup.dedupClustersWithRounds(
        spark.read.parquet(s"$scratch/pairs"))
      (labels.count(), rounds)
    }
    log("clusters", tClust, clustOut._1)

    var tPrefix = -1.0; var nPrefix = -1L
    if (!skip("prefix")) {
      val r = time {
        Dedup.prefixJoinPairs(docs, "text", "doc_id", threshold = 0.2).count()
      }
      tPrefix = r._1; nPrefix = r._2
      log("prefix_pairs", tPrefix, nPrefix)
    }
    var tWinnow = -1.0; var nWinnow = -1L
    if (!skip("winnow")) {
      val r = time { Dedup.winnowPairs(docs, "text", "doc_id").count() }
      tWinnow = r._1; nWinnow = r._2
      log("winnow_pairs", tWinnow, nWinnow)
    }

    println(f"""{"probe":"dedup",${eraField},"n_docs":$nDocs,"synth_sec":$tSynth%.3f,""" +
      f""""neardup_sec":$tPairs%.3f,"n_pairs":$nPairs,""" +
      f""""clusters_sec":$tClust%.3f,"n_labels":${clustOut._1},""" +
      f""""cluster_rounds":${clustOut._2},""" +
      f""""prefix_sec":$tPrefix%.3f,"n_prefix_pairs":$nPrefix,""" +
      f""""winnow_sec":$tWinnow%.3f,"n_winnow_pairs":$nWinnow}""")
    spark.stop()
  }
}
