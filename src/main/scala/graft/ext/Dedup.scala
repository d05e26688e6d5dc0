package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object Par {
  /** Heavy per-row compute (md5 fan-out, shingling) must not run on the
    * scan's partitioning: a small parquet file is a single task no matter
    * how many cores exist. Round-robin up to the session's parallelism when
    * the input has fewer partitions; a no-op on big inputs at cluster scale. */
  def ensure(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

/** Large-scale training-data deduplication operators (SURVEY §7 north-star).
  *
  * Scale stance (the 100 TB design point):
  *  - exact dedup is a hash-groupBy (one shuffle on the content hash), never
  *    an all-pairs comparison;
  *  - near-dup is MinHash + banded LSH: candidate pairs come from an EQUI-join
  *    on (band, bucket) — shuffle-partitionable, no quadratic blow-up; the
  *    expensive verify (true Jaccard) runs only on candidates.
  *
  * Hashes are md5-based (not Spark-internal xxhash) so results are portable
  * and independently checkable (the DuckDB oracle reproduces them bit-for-bit).
  */
object Dedup {

  /** k-word shingles from a PRE-MATERIALIZED words column (a bound attribute,
    * not an inline `split(...)`). Passing an unmaterialized expression here
    * re-evaluates it once per shingle position inside the lambda — O(n²)
    * regex splits per row, measured 100× slower at sf0.1. */
  def shinglesOfWords(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", slice(ws, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", ws)))

  /** Convenience form over raw text — correctness-equivalent, but quadratic
    * in words (see shinglesOfWords); hot paths must materialize words first. */
  def wordShingles(text: Column, k: Int): Column =
    shinglesOfWords(split(text, " "), k)

  /** Exact dedup: group by content hash, keep the smallest id.
    * One shuffle on the 128-bit hash; streams at any scale. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** MinHash signature from ONE md5 per shingle: the 128-bit digest splits
    * into two 56-bit halves (a, b) and permutation i is the universal hash
    * a + i*b (the double-hashing construction of Kirsch–Mitzenmacher 2006,
    * standard in minwise-sketch libraries). md5 is the dominant per-shingle
    * cost at scale — this is numHashes× fewer digests than hashing with
    * numHashes seeds, and a long min beats a hex-string min. 56-bit halves
    * keep a + i*b < 2^60 for i < 16: no BIGINT overflow on either engine
    * (Spark ANSI and DuckDB both throw on overflow), and the DuckDB oracle
    * reproduces the values bit-for-bit via hex parsing. */
  def minhashSig(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 8, shingleK: Int = 3): DataFrame = {
    require(numHashes <= 16, "56-bit halves guarantee no overflow only for i < 16")
    val withShingles = Par.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), explode(shinglesOfWords(col("__ws"), shingleK)).as("s"))
    val halves = withShingles
      .select(col(idCol), md5(col("s")).as("__m"))
      .select(col(idCol),
        conv(substring(col("__m"), 1, 14), 16, 10).cast("long").as("__a"),
        conv(substring(col("__m"), 15, 14), 16, 10).cast("long").as("__b"))
    val aggs = (0 until numHashes).map(i =>
      min(col("__a") + lit(i.toLong) * col("__b")).as(s"h$i"))
    halves.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: group the signature into bands of `bandSize` hashes; a band's
    * bucket key is the md5 of its member hashes joined with '|' (unambiguous
    * for variable-length decimal renderings). Output one row per
    * (id, band, bucket) — the join key for candidate generation. */
  def lshBands(sig: DataFrame, idCol: String, numHashes: Int = 8,
               bandSize: Int = 2): DataFrame = {
    val bandCols = (0 until numHashes by bandSize).map { b =>
      md5(concat_ws("|",
        (b until math.min(b + bandSize, numHashes)).map(i => col(s"h$i").cast("string")): _*))
    }
    sig.select(col(idCol), posexplode(array(bandCols: _*)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bucket"))
  }

  /** Candidate near-dup pairs: equi-join on (band, bucket), a < b, distinct.
    * THE scale property: cost is Σ bucket² per band, not n². The shuffle_hash
    * hint matters twice: broadcasting a corpus-sized band set would OOM at
    * scale, and with both sides shuffling the IDENTICAL upstream subplan
    * (scan → shingles → signature → bands) the exchange is computed once
    * and reused instead of once per join side. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("a_id"), col("band"), col("bucket")).hint("shuffle_hash")
    val b = bands.select(col(idCol).as("b_id"), col("band"), col("bucket")).hint("shuffle_hash")
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** n-gram Jaccard similarity between two (already distinct) shingle sets. */
  def jaccard(aSet: Column, bSet: Column): Column = {
    val inter = size(array_intersect(aSet, bSet)).cast("double")
    val union = size(array_union(aSet, bSet))
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** End-to-end MinHash-LSH near-dup dedup: candidates from banding, verified
    * by true shingle Jaccard ≥ threshold. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 8, bandSize: Int = 2, shingleK: Int = 3,
                   threshold: Double = 0.7): DataFrame = {
    val sig = minhashSig(df, textCol, idCol, numHashes, shingleK)
    val cands = candidatePairs(lshBands(sig, idCol, numHashes, bandSize), idCol)
    // Probed twice (a-side and b-side) by the verify joins, but NOT cached:
    // both probes shuffle the identical subplan hashed by the id, so Spark's
    // ReuseExchange computes the shingle sets once and reuses the shuffle
    // files for the second join (DedupSpec asserts the ReusedExchange node).
    // A .cache() here would leak executor storage across invocations — the
    // caller never gets a handle to unpersist.
    val sets = Par.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), array_distinct(shinglesOfWords(col("__ws"), shingleK)).as("sset"))
    cands
      .join(sets.select(col(idCol).as("a_id"), col("sset").as("sa")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("sset").as("sb")), Seq("b_id"))
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Persist a band table for incremental probing, partitioned by band so a
    * probe of one band prunes the rest at planning time. At 100 TB this is
    * the corpus signature store: written once at ingest, appended as the
    * corpus grows, orders of magnitude smaller than the text. */
  def writeBands(bands: DataFrame, path: String): Unit =
    bands.write.mode("append").partitionBy("band").parquet(path)

  /** Corpus-refresh dedup: band ONLY the new batch and probe it against the
    * existing corpus' band table (read from `writeBands` output in prod —
    * passed as a DataFrame here). The expensive side of the join is the new
    * batch, not the corpus: cost is |new| signatures + one equi-join against
    * the persisted bands + verify on candidates — never a re-LSH of the
    * whole corpus. Returns (new_id, old_id, jaccard >= threshold). */
  def incrementalNearDups(newDf: DataFrame, oldDf: DataFrame,
                          textCol: String, idCol: String,
                          numHashes: Int = 8, bandSize: Int = 2,
                          shingleK: Int = 3, threshold: Double = 0.7): DataFrame = {
    val newBands = lshBands(minhashSig(newDf, textCol, idCol, numHashes, shingleK),
      idCol, numHashes, bandSize)
    val oldBands = lshBands(minhashSig(oldDf, textCol, idCol, numHashes, shingleK),
      idCol, numHashes, bandSize)
    val cands = newBands
      .select(col(idCol).as("new_id"), col("band"), col("bucket")).hint("shuffle_hash")
      .join(oldBands.select(col(idCol).as("old_id"), col("band"), col("bucket"))
        .hint("shuffle_hash"), Seq("band", "bucket"))
      .select("new_id", "old_id").distinct()
    def setsOf(df: DataFrame) = Par.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), array_distinct(shinglesOfWords(col("__ws"), shingleK)).as("sset"))
    cands
      .join(setsOf(newDf).select(col(idCol).as("new_id"), col("sset").as("sa")), Seq("new_id"))
      .join(setsOf(oldDf).select(col(idCol).as("old_id"), col("sset").as("sb")), Seq("old_id"))
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "old_id", "jaccard")
  }

  /** Near-dup CLUSTERS from the pair graph: connected components by
    * min-label propagation (the GraphX/small-star idea as plain DataFrame
    * joins). Each node starts labeled with itself; every round it takes the
    * min label among itself and its neighbors; fixpoint after at most
    * graph-diameter rounds — near-dup clusters are small, so single digits
    * in practice, `maxIters` is a backstop not a budget. Each round is one
    * join + one agg (shuffles on node id); `localCheckpoint` truncates the
    * growing lineage so round N doesn't replan rounds 1..N-1. Returns
    * (id, cluster_id = min reachable id): keep-one-per-cluster is then a
    * filter on id == cluster_id. */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Materialize the pair set BEFORE the symmetric union: both union
    // branches read the checkpointed rows instead of each re-running the
    // (potentially expensive — e.g. full near-dup) upstream pipeline.
    val p = pairs.localCheckpoint()
    val edges = p.select(col("a_id").as("s"), col("b_id").as("t"))
      .union(p.select(col("b_id").as("s"), col("a_id").as("t")))
      .localCheckpoint()
    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("cid", col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("t") === labels("id"))
        .groupBy(col("s")).agg(min("cid").as("ncid"))
      val next = labels.join(neighborMin, labels("id") === neighborMin("s"), "left")
        .select(col("id"),
          least(col("cid"), coalesce(col("ncid"), col("cid"))).as("cid"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.cid") =!= col("o.cid")).isEmpty
      labels = next
      iter += 1
    }
    labels
  }

  /** 16-bit SimHash from a PRE-MATERIALIZED array of md5(word) hex strings.
    * Bit p is the majority vote of the top bit of hex digit p (digit >= 8),
    * weighted ±1 per token. Static per-position expressions; the hash array
    * is computed once per row by the caller's projection. */
  def simhash16FromHashes(wordHashes: Column): Column = {
    val high = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    (1 to 16).map { p =>
      val vote = aggregate(
        transform(wordHashes, h =>
          when(substring(h, p, 1).isin(high.map(x => x: Any): _*), lit(1))
            .otherwise(lit(-1))),
        lit(0), (acc, v) => acc + v)
      when(vote >= 0, lit(1L << (p - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Convenience over raw words — recomputes md5s per bit position (16×);
    * hot paths should materialize `transform(words, md5)` first. */
  def simhash16(words: Column): Column =
    simhash16FromHashes(transform(words, w => md5(w)))

  /** Hamming distance between two small signatures (for simhash pairing). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
