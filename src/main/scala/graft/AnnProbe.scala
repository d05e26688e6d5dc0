package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Empirical scale probe for the similarity/ANN stack: synthesize an
  * N-vector corpus (50–500× the shipped embeddings) and measure the three
  * costs that define the 100 TB story — brute-force exact top-k (the
  * baseline every ANN must beat), the one-off IVF index build, and the
  * partition-pruned indexed probe — plus recall@k of the probe against the
  * exact answer (speed that loses the neighbors is worthless).
  *
  * Synthesis: each base vector is copied `N/|base|` times; copy 0 keeps the
  * original values, copies >= 1 add deterministic per-(vector, copy,
  * dimension) jitter of ±1% of the component scale — local neighborhoods
  * stay intact (copies of v are v's near-neighbors), which is exactly the
  * clustered topology IVF exploits and the worst case for its list-boundary
  * recall.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.AnnProbe [nVecs] [nLists]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nLists = args.lift(1).map(_.toInt).getOrElse(32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val nBase = base.count()
    val copies = math.max(1L, n / nBase)

    val dir = java.nio.file.Files.createTempDirectory("graft_ann_vecs").toString
    base.join(spark.range(copies).toDF("k"))
      .select(
        (col("vec_id") * copies + col("k")).as("vec_id"),
        expr("CASE WHEN k = 0 THEN embedding ELSE " +
          "transform(embedding, (x, i) -> CAST(x + " +
          "(pmod(hash(vec_id, k, i), 1000) - 500) / 50000.0 AS FLOAT)) END")
          .as("embedding"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = vecs.count()

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val q = vecs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))

    // exact baseline: one scan, per-partition top-k via the orderBy+limit
    // plan (TakeOrderedAndProject — partial top-k per partition, k rows to
    // the driver per partition)
    val (tBrute, bruteIds) = time {
      vecs.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), Similarity.cosine(col("embedding"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(k)
        .collect().map(_.getLong(0)).toSeq
    }

    // one-off artifact costs: centroid training (bounded sample) + the
    // write-time partitioned index
    val (tTrain, cents) = time { Similarity.centroidsFor(spark, dir, nLists = nLists) }
    val (tBuild, idxPath) = time { Similarity.indexPathFor(spark, dir, cents) }

    // per-query cost: driver-side centroid argmin -> literal IN over the
    // partition column -> pruned scan
    val (tProbe, probeIds) = time {
      Similarity.ivfTopKIndexed(spark, idxPath, "vec_id", "embedding", q, k,
        cents, nProbe = 2)
        .collect().map(_.getLong(0)).toSeq
    }
    val recall = probeIds.count(bruteIds.contains).toDouble / k

    // the recall/cost dial: doubling the probed lists
    val (tProbe4, probe4Ids) = time {
      Similarity.ivfTopKIndexed(spark, idxPath, "vec_id", "embedding", q, k,
        cents, nProbe = 4)
        .collect().map(_.getLong(0)).toSeq
    }
    val recall4 = probe4Ids.count(bruteIds.contains).toDouble / k

    // how much of the corpus the pruned probe actually reads
    val listSizes = spark.read.parquet(idxPath).groupBy("list").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val qv = q.head.getSeq[Float](0).toArray.map(_.toDouble)
    val probeLists = cents.zipWithIndex.map { case (c, i) =>
      (c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(identity).take(2).map(_._2)
    val scanFrac = probeLists.map(l => listSizes.getOrElse(l, 0L)).sum.toDouble / nVecs

    // INCREMENTAL MAINTENANCE rung: the daily-ingest shape — 90% of the
    // corpus is the existing index, the latest 10% wave is APPENDED
    // (assign + per-list file append, O(delta)) instead of rebuilding
    // (O(corpus)). The probe answer over the appended index must equal the
    // full index's — otherwise the saved build time bought a wrong index.
    val appPath = java.nio.file.Files
      .createTempDirectory("graft_ann_app").toString
    val isDelta = pmod(col("vec_id"), lit(10)) === 9
    val (tBaseWave, _) = time {
      Similarity.ivfWriteIndex(vecs.filter(col("vec_id") =!= 0 && !isDelta),
        "vec_id", "embedding", cents, appPath)
    }
    val (tAppend, _) = time {
      Similarity.ivfAppendIndex(vecs.filter(col("vec_id") =!= 0 && isDelta),
        "vec_id", "embedding", cents, appPath)
    }
    val (tAppProbe, appIds) = time {
      Similarity.ivfTopKIndexed(spark, appPath, "vec_id", "embedding", q, k,
        cents, nProbe = 2)
        .collect().map(_.getLong(0)).toSeq
    }
    val appendMatches = appIds == probeIds

    // BATCH mode: 64 query vectors through ONE pruned scan + equi-join
    // (ivfTopKIndexedBatch) vs 64 sequential single-query probes — the
    // production amortization claim, measured.
    val nBatch = 64
    val qBatch = vecs.filter(col("vec_id") < nBatch)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val (tBatch, batchRows) = time {
      Similarity.ivfTopKIndexedBatch(spark, idxPath, "vec_id", "embedding",
        qBatch, k, cents, nProbe = 2).count()
    }

    // sign-LSH ladder at 8 planes: single-probe, Hamming-1, Hamming-2 —
    // recall vs the exact brute top-k and the probe-cost trend (expected
    // scan fractions 1/256, 9/256, 37/256)
    val dim = qv.length
    val corpus = vecs.filter(col("vec_id") =!= 0)
    def lshRun(maxH: Int): (Double, Double) = {
      val (t, ids) = time {
        if (maxH == 0)
          Similarity.annTopK(corpus, "vec_id", "embedding", q, k, 8, dim)
            .collect().map(_.getLong(0)).toSeq
        else
          Similarity.annTopKMultiProbe(corpus, "vec_id", "embedding", q, k, 8,
            dim, maxHamming = maxH)
            .collect().map(_.getLong(0)).toSeq
      }
      (t, ids.count(bruteIds.contains).toDouble / k)
    }
    val (tLsh0, rLsh0) = lshRun(0)
    val (tLsh1, rLsh1) = lshRun(1)
    val (tLsh2, rLsh2) = lshRun(2)

    // PQ rung: one-off codebook train + write-time encode (the ingest
    // cost), then the compressed-domain ADC query — scan reads 8 bytes/row
    // instead of 256 — with exact re-rank of the top-50. Recall vs brute on
    // jittered-copy topology (near-dups of the query share its codes, the
    // favorable case; the sf0.001 spec measures the clusterless worst case).
    val (tPqTrain, cbs) = time { Similarity.pqCodebooksFor(spark, dir) }
    val codedPath = s"$dir/pq_codes.parquet"
    val (tPqEncode, _) = time {
      Similarity.pqWriteCodes(corpus, "vec_id", "embedding", cbs, codedPath)
    }
    val coded = spark.read.parquet(codedPath)
    val (tPq, pqIds) = time {
      Similarity.pqTopKCoded(coded, corpus, "vec_id", "embedding", q, k, cbs,
        rerank = 50).collect().map(_.getLong(0)).toSeq
    }
    val rPq = pqIds.count(bruteIds.contains).toDouble / k

    // the rerank dial under duplication: a duplicate cluster spans 1-2 code
    // cells with NO intra-cluster ADC signal (cells size to inter-cluster
    // distances), so recall requires rerank >= duplicate multiplicity —
    // here 2x the copy count, still ~0.1% of the corpus reranked exactly
    val dupRerank = (2 * copies).toInt.max(50)
    val (tPqD, pqDIds) = time {
      Similarity.pqTopKCoded(coded, corpus, "vec_id", "embedding", q, k, cbs,
        rerank = dupRerank).collect().map(_.getLong(0)).toSeq
    }
    val rPqD = pqDIds.count(bruteIds.contains).toDouble / k

    // residual IVF-PQ rung (the FAISS coarse+fine shape): codes quantize the
    // within-list residual, the query probes pruned partitions, and the
    // tie-inclusive rerank keeps whole ADC-tied cells — the duplicate-cluster
    // regime this corpus maximizes (copies of a vector share a code word).
    val (tRTrain, resCbs) = time {
      Similarity.pqResidualCodebooksFor(spark, dir, cents)
    }
    val (tRBuild, resIdx) = time {
      Similarity.ivfPqIndexPathFor(spark, dir, cents, resCbs)
    }
    val (tRQuery, resIds) = time {
      Similarity.ivfPqTopK(spark, resIdx, "vec_id", "embedding", q, k,
        cents, resCbs, nProbe = 2, rerank = 50)
        .collect().map(_.getLong(0)).toSeq
    }
    val rRes = resIds.count(bruteIds.contains).toDouble / k
    val (tRQueryD, resDIds) = time {
      Similarity.ivfPqTopK(spark, resIdx, "vec_id", "embedding", q, k,
        cents, resCbs, nProbe = 2, rerank = dupRerank)
        .collect().map(_.getLong(0)).toSeq
    }
    val rResD = resDIds.count(bruteIds.contains).toDouble / k

    // SQ8 rung (r12): write-time codes, dequantized-domain cut + exact
    // re-rank; recall under duplication needs the same rerank dial as PQ
    val sq8Path = s"$dir/sq8_codes.parquet"
    val (tSq8Build, _) = time {
      Similarity.sq8WriteCodes(corpus, "vec_id", "embedding", sq8Path)
    }
    val sq8Codes = spark.read.parquet(sq8Path)
    val (tSq8, sq8Ids) = time {
      Similarity.sq8TopKCoded(sq8Codes, corpus, "vec_id", "embedding", q, k,
          rerank = 50)
        .collect().map(_.getLong(0)).toSeq
    }
    val rSq8 = sq8Ids.count(bruteIds.contains).toDouble / k
    val (tSq8D, sq8DIds) = time {
      Similarity.sq8TopKCoded(sq8Codes, corpus, "vec_id", "embedding", q, k,
          rerank = dupRerank)
        .collect().map(_.getLong(0)).toSeq
    }
    val rSq8D = sq8DIds.count(bruteIds.contains).toDouble / k

    println(s"""{"metric":"ann_probe","n_vecs":$nVecs,"n_lists":$nLists,"k":$k,""" +
      s""""brute_sec":${f"$tBrute%.2f"},"train_sec":${f"$tTrain%.2f"},""" +
      s""""build_sec":${f"$tBuild%.2f"},"probe_sec":${f"$tProbe%.2f"},""" +
      s""""recall_at_k":$recall,"probe4_sec":${f"$tProbe4%.2f"},""" +
      s""""recall4_at_k":$recall4,"scan_fraction":${f"$scanFrac%.4f"},""" +
      s""""append_base_sec":${f"$tBaseWave%.2f"},"append_delta_sec":${f"$tAppend%.2f"},""" +
      s""""append_probe_sec":${f"$tAppProbe%.2f"},"append_matches_full":$appendMatches,""" +
      s""""batch_n":$nBatch,"batch_rows":$batchRows,"batch_sec":${f"$tBatch%.2f"},""" +
      s""""batch_per_query_sec":${f"${tBatch / nBatch}%.4f"},""" +
      s""""lsh_sec":${f"$tLsh0%.2f"},"lsh_recall":$rLsh0,""" +
      s""""lsh_h1_sec":${f"$tLsh1%.2f"},"lsh_h1_recall":$rLsh1,""" +
      s""""lsh_h2_sec":${f"$tLsh2%.2f"},"lsh_h2_recall":$rLsh2,""" +
      s""""pq_train_sec":${f"$tPqTrain%.2f"},"pq_encode_sec":${f"$tPqEncode%.2f"},""" +
      s""""pq_query_sec":${f"$tPq%.2f"},"pq_recall":$rPq,""" +
      s""""pq_dup_rerank":$dupRerank,"pq_dup_query_sec":${f"$tPqD%.2f"},""" +
      s""""pq_dup_recall":$rPqD,""" +
      s""""ivfpq_train_sec":${f"$tRTrain%.2f"},"ivfpq_build_sec":${f"$tRBuild%.2f"},""" +
      s""""ivfpq_query_sec":${f"$tRQuery%.2f"},"ivfpq_recall":$rRes,""" +
      s""""ivfpq_dup_query_sec":${f"$tRQueryD%.2f"},"ivfpq_dup_recall":$rResD,""" +
      s""""sq8_build_sec":${f"$tSq8Build%.2f"},"sq8_query_sec":${f"$tSq8%.2f"},""" +
      s""""sq8_recall":$rSq8,"sq8_dup_query_sec":${f"$tSq8D%.2f"},""" +
      s""""sq8_dup_recall":$rSq8D,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
