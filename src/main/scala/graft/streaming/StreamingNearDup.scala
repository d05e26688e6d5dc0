package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ext.Dedup

/** Streaming NEAR-duplicate candidate detection (LLM-pipeline extension):
  * MinHash-LSH as documents arrive, instead of a periodic batch pass over
  * everything ingested so far. Completes the streaming dedup family —
  * [[StreamingDedup]] catches byte-identical re-posts online; this catches
  * the near-identical ones (boilerplate edits, templated mirror pages)
  * within the same bounded-state contract.
  *
  * Architecture (the part that makes this a SINGLE stateful operator):
  * the batch pipeline computes signatures with explode + groupBy-min
  * ([[Dedup.minhashSig]]) — a streaming AGGREGATION, which Spark forbids
  * upstream of `flatMapGroupsWithState`. Here the signature is instead a
  * PER-ROW fold: the k-shingle array, its md5 56-bit halves, and the 8
  * permutation minima are higher-order-function expressions over one row's
  * own text (`array_min(transform(...))`), so the whole
  * shingle→sig→band derivation is stateless, stays in whole-stage codegen,
  * and shuffles exactly ONCE — into the state store, keyed by
  * (band, bucket), the same key the batch candidate join shuffles on.
  * The hash family, shingling ([[Dedup.shinglesOfWords]]) and banding
  * ([[Dedup.lshBands]] — called verbatim on the per-row signature columns)
  * are the batch operators' own, so stream and batch agree bucket-for-bucket
  * by construction (spec-pinned, and hash-checked end-to-end by the
  * `x_stream_neardup_eq` CORRECTNESS gate against the DuckDB banding twin).
  *
  * Scale stance: state per (band, bucket) is the member-id list, capped at
  * `maxBucket` ids — never proportional to corpus size — and expires
  * `stateTtl` past the watermark like every state here. Sharding is the
  * state store's hash partitioning on the bucket key: adding executors
  * scales candidate matching linearly, exactly like the batch LSH shuffle.
  *
  * Cap semantics (documented divergence, inherent to online processing):
  * the batch cap drops an over-`maxBucket` bucket RETROACTIVELY — all its
  * pairs, including the first 1000's. A stream cannot retract emitted
  * pairs, so the online cap SATURATES instead: once a bucket holds
  * `maxBucket` members, later arrivals neither match nor register there
  * (they stay eligible through their other bands — same recall argument as
  * the batch cap, [[Dedup.DefaultMaxBucket]]). Both caps are inert at gate
  * scale (largest real sf0.1 bucket: 16), so the equivalence gate is exact;
  * the saturation behavior is spec-tested explicitly.
  */
object StreamingNearDup {

  /** One (document × band) arrival: the stateless front half's output. */
  final case class BandRow(doc_id: Long, band: Int, bucket: String,
                           event_time: Timestamp)

  /** One candidate pair: `a_id` arrived before `b_id` in this band's
    * bucket. Cross-band duplicates are expected (a true near-dup pair
    * collides in several bands) — downstream takes DISTINCT (a_id, b_id),
    * exactly like the batch candidate join. */
  final case class Cand(a_id: Long, b_id: Long, band: Int, bucket: String)

  /** Bucket state: member doc_ids in arrival order, size ≤ maxBucket. */
  final case class BucketMembers(members: List[Long])

  /** Per-row MinHash signature columns h0..h{numHashes-1} — the zero-shuffle
    * twin of [[Dedup.minhashSig]] (identical hash family: one md5 per
    * shingle split into two 56-bit halves, permutation i = ha + i·hb,
    * signature component = min over the document's shingles). Chained
    * projections keep each array a bound attribute so lambda bodies never
    * re-derive their input per element (the shinglesOfWords contract). */
  def perRowSig(docs: DataFrame, textCol: String, idCol: String,
                carry: Seq[String] = Nil,
                numHashes: Int = 8, shingleK: Int = 3): DataFrame = {
    require(numHashes <= 16, "56-bit halves guarantee no overflow only for i < 16")
    val keep = (idCol +: carry).map(col)
    docs
      .select(keep :+ split(col(textCol), " ").as("__ws"): _*)
      .select(keep :+ Dedup.shinglesOfWords(col("__ws"), shingleK).as("__sh"): _*)
      .select(keep :+ transform(col("__sh"), s => md5(s)).as("__ms"): _*)
      .select(keep :+ transform(col("__ms"), m => struct(
        conv(substring(m, 1, 14), 16, 10).cast("long").as("a"),
        conv(substring(m, 15, 14), 16, 10).cast("long").as("b"))).as("__ab"): _*)
      .select(keep ++ (0 until numHashes).map(i =>
        array_min(transform(col("__ab"),
          x => x.getField("a") + lit(i.toLong) * x.getField("b"))).as(s"h$i")): _*)
  }

  /** Stateless front half: per-row signature → LSH band rows, one row per
    * (doc, band). Works on batch AND streaming DataFrames — nothing here
    * aggregates. */
  def bandRows(docs: DataFrame, textCol: String, idCol: String,
               timeCol: String, numHashes: Int = 8, bandSize: Int = 2,
               shingleK: Int = 3): DataFrame =
    Dedup.lshBands(
      perRowSig(docs, textCol, idCol, carry = Seq(timeCol),
        numHashes = numHashes, shingleK = shingleK),
      idCol, numHashes, bandSize, carry = Seq(timeCol))

  /** Stateful back half: group band rows by (band, bucket); each arrival
    * emits one [[Cand]] per already-registered member, then registers
    * (saturating at `maxBucket`, re-deliveries of a registered id are
    * no-ops — the at-least-once guard). Arrival order within a micro-batch
    * is (event_time, doc_id) — shuffle iterator order is not guaranteed.
    * `lateness` IS the event-time watermark (applied here, on the state
    * op's own input — callers must not pre-watermark, or they'd silently
    * configure a different tolerance than the one they passed). */
  def candidateStream(bands: Dataset[BandRow], lateness: String,
                      stateTtlMs: Long,
                      maxBucket: Int = Dedup.DefaultMaxBucket): Dataset[Cand] = {
    val spark = bands.sparkSession
    import spark.implicits._
    val ttlMs = stateTtlMs
    val marked = bands.withWatermark("event_time", lateness)

    def update(key: (Int, String), rows: Iterator[BandRow],
               state: GroupState[BucketMembers]): Iterator[Cand] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toSeq.sortBy(r => (r.event_time.getTime, r.doc_id))
        // members in REVERSE arrival order (list prepend); emission order of
        // pairs is irrelevant — downstream is a DISTINCT set. The persisted
        // state stays the plain List (stable encoder); membership and size
        // are tracked in a LOCAL Set/counter built once per invocation, so
        // the per-arrival registered-id check is O(1) instead of an O(cap)
        // list scan (O(cap²) per bucket lifetime at the default cap 1000).
        var members = state.getOption.map(_.members).getOrElse(Nil)
        var seen = members.toSet
        var size = seen.size
        val out = Seq.newBuilder[Cand]
        sorted.foreach { r =>
          if (size < maxBucket && !seen.contains(r.doc_id)) {
            members.foreach(m => out += Cand(m, r.doc_id, key._1, key._2))
            members = r.doc_id :: members
            seen += r.doc_id
            size += 1
          }
        }
        state.update(BucketMembers(members))
        val maxEvent = sorted.last.event_time.getTime
        state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs(), maxEvent) + ttlMs)
        out.result().iterator
      }
    }

    marked
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** File-stream harness for the batch-equivalence CORRECTNESS gate
    * (x_stream_neardup_eq): replay a documents parquet directory through
    * bandRows → candidateStream as a REAL multi-batch stream — the
    * [[StreamingDedup.firstSeenWinsFileRun]] staging pattern (doc_id-range
    * chunks fed one per micro-batch via FS rename, parquet sink, no driver
    * collect on either side). With in-order arrival, generous lateness/TTL
    * and the cap inert, each bucket's emitted pairs are exactly its
    * { (a, b) : a < b } set — the batch candidate join's — so DISTINCT
    * (a_id, b_id) equals the DuckDB banding twin's candidate set. */
  def candidatesFileRun(spark: org.apache.spark.sql.SparkSession,
                        docsParquetDir: String, chunks: Int = 4,
                        lateness: String = "10 minutes",
                        stateTtlMs: Long = 7L * 86400000L,
                        maxBucket: Int = Dedup.DefaultMaxBucket,
                        arrivalOrder: Seq[Int] = Seq.empty,
                        filesPerTrigger: Int = 1): DataFrame = {
    import org.apache.hadoop.fs.Path
    val tEnter0 = System.nanoTime()
    def prof(tag: String, t0: Long): Unit =
      if (sys.env.contains("GRAFT_STREAM_PROF"))
        System.err.println(f"[neardup-prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val stage = graft.Scratch.dir("graft_neardup_stage")
    val inDir = s"$stage/in"
    val outDir = s"$stage/out"; val ckpt = s"$stage/ckpt"

    // chunk staging is SHARED across the four replay gates (same frame,
    // same range partitioning — StreamStage builds it once per JVM)
    val parts = StreamStage.stagedParts(spark, docsParquetDir, chunks)
    prof("staged", tEnter0)
    val fs = new Path(stage).getFileSystem(spark.sessionState.newHadoopConf())
    // `arrivalOrder` (a chunk permutation — the firstSeenWinsFileRun knob)
    // injects out-of-order arrival: pairs then orient by ARRIVAL (a_id =
    // whoever a bucket registered first), so the UNORDERED pair set stays
    // the batch one while a_id/b_id may swap — the invariant the
    // out-of-order spec pins. The default in-order feed keeps a_id < b_id,
    // which is what the hash-exact gate relies on.
    val order = if (arrivalOrder.nonEmpty) arrivalOrder else parts.indices.toSeq
    require(order.sorted == parts.indices.toSeq,
      s"arrivalOrder must be a permutation of 0 until ${parts.length}, got $order")
    fs.mkdirs(new Path(inDir))

    // Cloned session, 16 state partitions (r14, up from 4: the stateful op
    // was running 4 threads on a 32-core profile; 16 keeps the per-batch
    // delta-file count modest while quadrupling state parallelism), no
    // no-data micro-batches — the firstSeenWinsFileRun rationale (eviction
    // timing is spec territory, not gate).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import ss.implicits._
    // filesPerTrigger groups staged chunks into fewer, larger micro-batches
    // (r13 verdict item 5): the dominant replay cost is the PER-MICRO-BATCH
    // constant — each batch re-plans the (large) signature expression tree
    // and pays offset/commit/state-store bookkeeping (~0.8-0.9 s/batch at
    // sf1, measured with GRAFT_STREAM_PROF, vs ~0.65 s of actual data
    // compute for a 12.5k-doc chunk). Within a micro-batch the state op
    // sorts arrivals by (event_time, doc_id), so grouping IN-ORDER chunks
    // never changes registration order (hash-identical output); for
    // PERMUTED feeds the cross-boundary inversions survive and the gate's
    // least/greatest normalization makes the output set chunking-proof.
    val inStream = ss.readStream
      .schema("doc_id LONG, text STRING, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(inDir)
      // A staged chunk file arrives as ONE input partition, and the per-row
      // signature (one md5 per shingle) is a narrow map — without this it
      // runs single-threaded per micro-batch and dominates the gate
      // (measured 17 s of the sf1 run). One tiny shuffle of raw text spreads
      // it across the cores; the (band, bucket) state shuffle downstream is
      // unchanged (still the session's 16 state partitions).
      .repartition(spark.sparkContext.defaultParallelism)
    val tBand0 = System.nanoTime()
    val bandStream = bandRows(inStream, "text", "doc_id", "event_time")
      .as[BandRow]
    prof("plan-build", tBand0)
    val tSetup0 = System.nanoTime()
    val q = candidateStream(bandStream, lateness, stateTtlMs, maxBucket)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    prof("start", tSetup0)
    try {
      order.zipWithIndex.grouped(filesPerTrigger).zipWithIndex.foreach {
        case (group, b) =>
          val t0 = System.nanoTime()
          group.foreach { case (part, i) => StreamStage.feed(spark, parts(part), inDir, i) }
          q.processAllAvailable()
          prof(s"batch $b (${group.size} files)", t0)
      }
    } finally {
      val tStop0 = System.nanoTime()
      q.stop()
      prof("stop", tStop0)
    }
    val tRead0 = System.nanoTime()
    val res = spark.read.parquet(outDir)
    prof("readback", tRead0)
    res
  }
}
