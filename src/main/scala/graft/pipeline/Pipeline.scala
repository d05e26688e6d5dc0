package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.ingest.{FlatTables, Flatten}
import graft.plans.{Intervals, Iv}
import graft.schema.Schemas
import graft.store.Store

/** Batch ingest pipeline (SURVEY §2.10/§3.1): the reference's orchestrator +
  * worker processes collapsed into one driver program over DataFrames.
  * Process/queue plumbing becomes Spark task scheduling; the work_queue /
  * index_state / failed_blocks tables survive as audit/state Parquet tables
  * read through `Store.latest` (FINAL semantics).
  *
  * Reference dataflow: orchestrator.js:373-385 (resume), 574-636 (seeding),
  * 93-240 (claim→split→dispatch→finalize), 393-430 (completeness/reconcile),
  * worker.js:335-380 (failure backoff).
  */
final case class PipelineConfig(
    warehouse: String,
    component: String = "main_indexer",
    startHeight: Long = 1L,
    assignRange: Long = 1000L,
    numWorkers: Int = 10,
    backfillMode: Boolean = false,
    backfillWindow: Long = 50000L,
    maxRetries: Int = 10,
    // injected clock for deterministic tests (epoch seconds)
    now: () => Long = () => System.currentTimeMillis() / 1000,
    // FINAL-by-default for state-table reads (VERDICT r9 item 8 trial →
    // r10 green → flipped): readTable of work_queue / index_state /
    // failed_blocks returns the latest-per-key view — ClickHouse's
    // `final = 1` stance for exactly the tables with update semantics.
    // Raw-append readers (requeue-loop detection, file-layout audits)
    // opt out EXPLICITLY via readTableRaw, never by flipping this off.
    autoFinal: Boolean = true)

class Pipeline(spark: SparkSession, cfg: PipelineConfig) {

  private def path(table: String) = s"${cfg.warehouse}/$table"

  /** Existence goes through the Hadoop FileSystem API (like Store.compact /
    * tableStats), so a warehouse on s3a://, hdfs://, or any non-local scheme
    * resolves correctly — a java.io.File check would report every remote
    * table as missing, silently resetting resume heights and re-seeding the
    * whole queue on a cluster deployment. */
  private def tableExists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** State tables with genuine update semantics — the set `autoFinal`
    * applies to. `blocks` is ALSO registry-versioned (for the FINAL hint /
    * compaction), but its pipeline reads are observational — gap detection
    * counts arrivals, max-height over appends equals max over FINAL — and
    * injecting a window over the largest fact table on every internal read
    * would buy nothing, so it stays raw here. */
  private val autoFinalTables = Set("work_queue", "index_state", "failed_blocks")

  /** Read a state/analytic table. With `cfg.autoFinal` (the default), reads
    * of the versioned STATE tables return the latest-per-key view — the same
    * window plan `Store.latest` / the FINAL hint build, so hinted, explicit
    * and default reads are plan-identical. Append-audit readers use
    * [[readTableRaw]]. */
  def readTable(table: String): DataFrame = {
    val raw = readTableRaw(table)
    if (cfg.autoFinal && autoFinalTables.contains(table)) {
      val spec = Store.versionedTables(table)
      Store.latest(raw, spec.keys, spec.ver, spec.tieBreak)
    } else raw
  }

  /** Raw-append read: every inserted row, superseded versions included,
    * empty-but-typed when not yet written. The explicit opt-out for call
    * sites whose SEMANTICS are the insert log (requeue-loop detection counts
    * re-inserts; file-layout audits count appends) and for internal reads
    * that wrap their own latest() view.
    *
    * The existence probe lives INSIDE Store.withReadRetry (a miss throws and
    * is retried): a concurrent Store.compact publish has a millisecond
    * window where the directory is mid-swap, and a single miss must NOT
    * read as "empty table" — that would silently reset resume heights and
    * re-seed the whole queue. A genuinely-absent table exhausts the (short)
    * retry and yields the typed empty frame; the ~100 ms worst case only
    * happens on the cold-start path. If the table was EVER seen to exist
    * during the retries, exhaustion rethrows instead of returning the empty
    * frame — a compact mid-swap outlasting the backoff is a loud failure,
    * never a silent resume-height reset. */
  def readTableRaw(table: String): DataFrame = {
    @volatile var everExisted = false
    try Store.withReadRetry(attempts = 4, backoffMs = 30) {
      if (!tableExists(table))
        throw new java.io.FileNotFoundException(path(table))
      everExisted = true
      spark.read.parquet(path(table))
    } catch {
      case e: java.io.FileNotFoundException =>
        if (everExisted) throw new java.io.IOException(
          s"table $table existed during read retries but reads kept failing " +
            "(concurrent compact outlasted the backoff?) — refusing to " +
            "return an empty frame", e)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schemaOf(table))
    }
  }

  private def schemaOf(table: String) = table match {
    case "blocks" => Schemas.blocks
    case "index_state" => Schemas.indexState
    case "work_queue" => Schemas.workQueue
    case "failed_blocks" => Schemas.failedBlocks
    case other => throw new IllegalArgumentException(other)
  }

  private def nowTs = timestamp_seconds(lit(cfg.now()))

  /** Process-monotonic micro-stamp: epoch micros from the injected seconds
    * clock, forced strictly increasing by a per-WAREHOUSE last-issued
    * register (max(last+1, clock-derived) — no per-instance counter, no
    * modulo wrap). Version columns built from this are strictly monotonic
    * even when two state transitions land in the same wall-clock second,
    * across all Pipeline instances writing the same store — ClickHouse
    * ReplacingMergeTree resolves equal versions by insert order, but parquet
    * appends have none, so the version itself must carry the order
    * (Store.latest ties are otherwise nondeterministic). Keyed by warehouse,
    * not JVM-global: unrelated pipelines (with their own injected clocks)
    * must not drag each other's stamps forward. */
  private def nextMicros(): Long = Pipeline.nextMicros(cfg.warehouse, cfg.now())

  // ------------------------------------------------------------- ingest ----

  /** Flatten one envelope batch and append all 10 tables, height-bucketed and
    * sorted for min/max pruning. The envelope Dataset is cached once — every
    * table is a lineage off it (SURVEY §2.9).
    *
    * A16: the blocks write carries `observe()` metrics named "graft_ingest"
    * (processed_blocks / total_txs / empty_blocks — the reference worker's
    * streaming counters, worker.js:64-68,495-501), retrievable via a
    * QueryExecutionListener without a second pass over the data. */
  def ingest(envelopes: DataFrame): FlatTables = {
    val env = envelopes.cache()
    try {
      val tables = Flatten(env)
      tables.all.foreach { case (name, df) =>
        val toWrite =
          if (name == "blocks")
            df.observe("graft_ingest",
              count(lit(1)).as("processed_blocks"),
              coalesce(sum("txs_results_count"), lit(0L)).as("total_txs"),
              count(when(col("txs_results_count") === 0, 1)).as("empty_blocks"))
          else df
        val withBucket = toWrite.withColumn("height_bucket", Fns.heightBucket(col("height")))
        Store.writeTable(withBucket, path(name),
          partitionCols = Seq("height_bucket"),
          sortCols = Seq("height"),
          bloomCols = Store.bloomColsFor.getOrElse(name, Nil))
      }
      tables
    } finally { env.unpersist(); () }
  }

  // -------------------------------------------------------------- state ----

  /** A2 resume point: GREATEST(recorded index_state height, observed
    * MAX(blocks.height)), defaulting to startHeight-1 (orchestrator.js:373-385). */
  def lastIndexedHeight(): Long = {
    val recorded = Store.latest(readTableRaw("index_state"), Seq("index_name"), "updated_at")
      .filter(col("index_name") === cfg.component)
      .agg(coalesce(max("last_processed_height"), lit(cfg.startHeight - 1)))
      .collect()(0).getLong(0)
    val observed = readTable("blocks")
      .agg(coalesce(max("height"), lit(cfg.startHeight - 1)))
      .collect()(0).getLong(0)
    math.max(recorded, observed)
  }

  /** Advance index_state by appending a fresh row (upsert-by-insert). */
  def advanceIndexState(height: Long): Unit = {
    import spark.implicits._
    val row = Seq((cfg.component, height)).toDF("index_name", "last_processed_height")
      .withColumn("updated_at", timestamp_micros(lit(nextMicros())))
    row.write.mode("append").parquet(path("index_state"))
  }

  /** Latest view of the work queue (FINAL). */
  def workQueue(): DataFrame =
    Store.latest(readTableRaw("work_queue"), Seq("id"), "updated_at")

  /** Seed work items for [from, to], subtracting already-queued
    * pending/processing ranges (J4; orchestrator.js:574-636). */
  def seedWorkQueue(from: Long, to: Long): Seq[Iv] = Pipeline.seedLock.synchronized {
    if (to < from) return Seq.empty
    import spark.implicits._
    val queued = workQueue()
      .filter(col("status").isin("pending", "processing"))
      .filter(Intervals.overlaps(lit(from), lit(to), col("start_height"), col("end_height")))
      .select("start_height", "end_height")
      .collect().map(r => Iv(r.getLong(0), r.getLong(1))).toSeq
    val items = Intervals.planWorkItems(from, to, cfg.assignRange, queued)
    if (items.nonEmpty) {
      // ids continue from max(existing)+1 under Pipeline.seedLock: the
      // read-modify-write over the appended table is serialized JVM-wide,
      // so concurrent in-process seeders can't mint colliding ids. (Multi-
      // process seeders would need a coordinator-issued range, like the
      // reference's DB sequence — documented single-driver invariant.)
      val base = 1L + readTableRaw("work_queue")
        .agg(coalesce(max("id"), lit(0L))).head.getLong(0)
      val stamp = timestamp_micros(lit(nextMicros()))
      val rows = items.zipWithIndex.map { case (iv, i) =>
        (base + i, iv.start, iv.end, "pending", null: String, null: String)
      }.toDF("id", "start_height", "end_height", "status", "worker_id", "error_message")
        .withColumn("created_at", stamp)
        .withColumn("updated_at", stamp)
      rows.write.mode("append").parquet(path("work_queue"))
    }
    items
  }

  /** P1 claim: lowest-id pending item within the forward-priority window and
    * optional target cap (orchestrator.js:126-150). */
  def claimNext(syncTarget: Option[Long] = None): Option[(Long, Iv)] = {
    var q = workQueue().filter(col("status") === "pending")
    if (!cfg.backfillMode) {
      val minAllowed = math.max(cfg.startHeight, maxBlockHeight() - cfg.backfillWindow)
      q = q.filter(col("start_height") >= minAllowed)
    }
    syncTarget.foreach(t => q = q.filter(col("end_height") <= t))
    q.orderBy("id").limit(1).collect().headOption
      .map(r => (r.getAs[Long]("id"), Iv(r.getAs[Long]("start_height"), r.getAs[Long]("end_height"))))
  }

  /** Status transition = fresh full row (latest FULL row wins, no column
    * merge). Without `range` the replacing row zeroes start/end exactly like
    * the reference's partial insert (clickhouse_queries.js:173-185) — callers
    * that know the range pass it so downstream reads (reconcile) keep it. */
  def updateWorkStatus(id: Long, status: String, error: String = null,
                       range: Option[Iv] = None): Unit = {
    import spark.implicits._
    val (s, e) = range.map(iv => (iv.start, iv.end)).getOrElse((0L, 0L))
    val stamp = timestamp_micros(lit(nextMicros()))
    Seq((id, s, e, status, null: String, error))
      .toDF("id", "start_height", "end_height", "status", "worker_id", "error_message")
      .withColumn("created_at", stamp)
      .withColumn("updated_at", stamp)
      .write.mode("append").parquet(path("work_queue"))
  }

  def maxBlockHeight(): Long =
    readTable("blocks").agg(coalesce(max("height"), lit(0L))).collect()(0).getLong(0)

  // ------------------------------------------------------------ verify -----

  /** J3 gap detection over the ingested blocks (orchestrator.js:393-405).
    * spark.range is the scale path: the series is generated distributed. */
  def findGaps(start: Long, end: Long): DataFrame = {
    import spark.implicits._
    spark.range(start, end + 1).toDF("height")
      .join(readTable("blocks").select("height").distinct(), Seq("height"), "left_anti")
  }

  def isRangeComplete(start: Long, end: Long): Boolean =
    findGaps(start, end).limit(1).count() == 0

  /** Reconcile lingering 'processing' items whose range is fully ingested
    * (orchestrator.js:408-430). Returns number fixed. */
  def reconcile(limit: Int = 50): Int = {
    val items = workQueue().filter(col("status") === "processing")
      .orderBy("id").limit(limit)
      .select("id", "start_height", "end_height").collect()
    var fixed = 0
    items.foreach { r =>
      if (isRangeComplete(r.getLong(1), r.getLong(2))) {
        updateWorkStatus(r.getLong(0), "done", "[auto_mark_done_reconcile]")
        fixed += 1
      }
    }
    fixed
  }

  // ------------------------------------------------------------ failure ----

  /** Record a block failure with exponential backoff; permanent after
    * maxRetries (worker.js:335-380). Single-height convenience over the
    * batched form. */
  def recordFailedBlock(height: Long, errorType: String, errorMessage: String,
                        workerId: String = "driver"): Unit = {
    import spark.implicits._
    recordFailedBlocks(Seq(height).toDF("height"), errorType, errorMessage, workerId)
  }

  /** Batched failure records: ONE latest() read joins prior retry counts for
    * every height, ONE append writes all failure rows (coalesced to a single
    * file — state appends are tiny). A failed 1 000-height work item is one
    * Spark job, not ~2 000 (the per-height loop did a full read + a
    * single-row write per height). `heights` must have a long `height` col. */
  def recordFailedBlocks(heights: DataFrame, errorType: String,
                         errorMessage: String,
                         workerId: String = "driver"): Unit = {
    val prior = Store.latest(readTableRaw("failed_blocks"), Seq("block_height"),
        "last_retry_at", tieBreak = Seq("id"))
      .select(col("block_height").as("height"),
        col("retry_count").as("__prior_retry"))
    val ts = nextMicros()
    val rows = heights.select(col("height").cast("long").as("height"))
      .join(prior, Seq("height"), "left")
      .withColumn("retry_count",
        coalesce(col("__prior_retry") + 1, lit(0)).cast("int"))
      .select(
        col("height").as("block_height"),
        (lit(ts) + col("height")).as("id"), // unique per batch (heights distinct)
        lit(errorType).as("error_type"),
        lit(errorMessage).as("error_message"),
        lit(workerId).as("worker_id"),
        col("retry_count"),
        lit(cfg.maxRetries).as("max_retries"),
        when(col("retry_count") >= cfg.maxRetries, "failed_permanently")
          .otherwise("pending").as("status"),
        timestamp_micros(
          lit(ts) + Fns.blockRetryDelaySeconds(col("retry_count")) * 1000000L)
          .as("next_retry_at"),
        timestamp_micros(lit(ts)).as("last_retry_at"))
    rows.coalesce(1).write.mode("append").parquet(path("failed_blocks"))
  }

  /** P7: blocks eligible for retry now. */
  def retryEligible(): DataFrame =
    Store.latest(readTableRaw("failed_blocks"), Seq("block_height"), "last_retry_at",
        tieBreak = Seq("id"))
      .filter(col("status") === "pending" &&
        col("retry_count") < col("max_retries") &&
        col("next_retry_at") <= timestamp_seconds(lit(cfg.now())))

  /** §3.3 retry pass (scripts/retry_failed.js:96-216 semantics): take the
    * top-`batch` eligible failures by (next_retry_at, last_retry_at) (O3),
    * refetch + re-ingest their heights, then mark recovered heights done
    * (upsert-by-insert; the reference's batched DELETE) and push the backoff
    * forward for heights still missing. Returns (recovered, stillFailed). */
  def retryFailedBlocks(fetch: Seq[Long] => DataFrame, batch: Int = 800): (Long, Long) = {
    val eligible = retryEligible()
      .orderBy(col("next_retry_at").asc, col("last_retry_at").asc)
      .limit(batch)
      .select("block_height").collect().map(_.getLong(0)).toSeq
    if (eligible.isEmpty) return (0L, 0L)
    ingest(fetch(eligible))
    import spark.implicits._
    val present = readTable("blocks").select("height").distinct()
      .join(eligible.toDF("height"), Seq("height"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    // both outcomes are batched: one append of 'recovered' rows (the FINAL
    // view drops them from the retry set — the reference DELETEs; our delete
    // is the view) and one recordFailedBlocks for the still-missing set
    if (present.nonEmpty) {
      val ts = nextMicros()
      present.toSeq.sorted
        .map(h => (h, ts + h, "resolved", "", "driver", 0, cfg.maxRetries, "recovered"))
        .toDF("block_height", "id", "error_type", "error_message", "worker_id",
          "retry_count", "max_retries", "status")
        .withColumn("next_retry_at", timestamp_micros(lit(ts)))
        .withColumn("last_retry_at", timestamp_micros(lit(ts)))
        .coalesce(1).write.mode("append").parquet(path("failed_blocks"))
    }
    val missing = eligible.filterNot(present)
    if (missing.nonEmpty)
      recordFailedBlocks(missing.toDF("height"), "retry_failed",
        "still missing after retry")
    (present.size.toLong, (eligible.size - present.size).toLong)
  }

  // -------------------------------------------------------------- drive ----

  /** One driver-loop iteration: seed → claim → fetch+ingest → verify →
    * finalize → advance offset. `fetch` maps a height interval to an envelope
    * DataFrame (RpcSource.fetchEnvelopes in prod, fixtures in tests).
    * Returns the claimed interval, if any. */
  def runOnce(tip: Long, fetch: Iv => DataFrame): Option[Iv] = {
    val last = lastIndexedHeight()
    val target = math.min(last + cfg.assignRange * cfg.numWorkers, tip)
    seedWorkQueue(last + 1, target)
    claimNext(Some(tip)).map { case (id, iv) =>
      updateWorkStatus(id, "processing", range = Some(iv))
      try {
        ingest(fetch(iv))
        if (isRangeComplete(iv.start, iv.end)) {
          updateWorkStatus(id, "done", range = Some(iv))
          advanceIndexState(maxBlockHeight())
        } else {
          updateWorkStatus(id, "failed", "[incomplete_range]", Some(iv))
          recordFailedBlocks(findGaps(iv.start, iv.end),
            "missing", "gap after ingest")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          updateWorkStatus(id, "failed", String.valueOf(e.getMessage), Some(iv))
          recordFailedBlocks(spark.range(iv.start, iv.end + 1).toDF("height"),
            "ingest_error", String.valueOf(e.getMessage))
      }
      iv
    }
  }
}

object Pipeline {
  /** Last-issued micro-stamp per warehouse. `updateAndGet(max(last+1,
    * computed))` can never go backwards or repeat for one store, even across
    * Pipeline instances or >1e6 stamps within one injected-clock second (the
    * stamp then runs ahead of the clock instead of wrapping). */
  private val lastIssuedMicros =
    scala.collection.concurrent.TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]
  private[pipeline] def nextMicros(warehouse: String, nowSeconds: Long): Long =
    lastIssuedMicros
      .getOrElseUpdate(warehouse, new java.util.concurrent.atomic.AtomicLong(Long.MinValue))
      .updateAndGet(last => math.max(last + 1, nowSeconds * 1000000L))

  /** Serializes work-queue seeding across Pipeline instances in this JVM —
    * seedWorkQueue's max(id)+1 is a read-modify-write over an appended table.
    * Multi-PROCESS seeders remain out of scope by design: the reference gets
    * its ids from a Postgres sequence (a central coordinator); our
    * single-driver deployment model keeps one seeder per warehouse. */
  private[pipeline] val seedLock = new Object
}
