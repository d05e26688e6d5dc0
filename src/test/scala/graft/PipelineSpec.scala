package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Pipeline, PipelineConfig}
import graft.plans.Iv
import graft.schema.Schemas
import graft.sources.{RpcClient, RpcConfig, RpcSource}

/** End-to-end driver-loop semantics (SURVEY §2.10/§3.1) over fixture
  * envelopes: resume, seeding with overlap subtraction, claim, ingest, gap
  * verify, reconcile, failure backoff — all against a temp warehouse. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private var clock = 1000000L
  private def mkPipeline(): Pipeline = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    new Pipeline(spark, PipelineConfig(
      warehouse = dir, startHeight = 1, assignRange = 10, numWorkers = 2,
      backfillMode = true, now = () => { clock += 1; clock }))
  }

  private def envelopes(heights: Seq[Long]): DataFrame = {
    val json = heights.map(h =>
      s"""{"height":$h,"time":"2025-06-01T12:00:0${h % 10}Z","app_hash":"AH$h",
         |"txs":["dGVzdA=="],
         |"txs_results":[{"code":0,"gas_wanted":"10","gas_used":"5","data":"","log":"",
         | "events":[{"type":"message","attributes":[{"key":"action","value":"/a.b.MsgC","index":true}]}]}],
         |"finalize_block_events":[]}""".stripMargin.replaceAll("\n", ""))
    spark.read.schema(Schemas.envelope).json(json.toDS)
  }

  test("runOnce: seeds, claims lowest-id item, ingests, marks done, advances offset") {
    val p = mkPipeline()
    val claimed = p.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
    assert(claimed === Some(Iv(1, 10)))
    assert(p.maxBlockHeight() === 10L)
    assert(p.lastIndexedHeight() === 10L)
    val wq = p.workQueue().orderBy("id").collect()
    // target caps at last + assignRange*numWorkers = 20: [1,10] done, [11,20] pending
    assert(wq.length === 2)
    assert(wq(0).getAs[String]("status") === "done")
    assert(wq.count(_.getAs[String]("status") === "pending") === 1)
    // second iteration picks the next range without re-seeding overlaps
    val second = p.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
    assert(second === Some(Iv(11, 20)))
    assert(p.lastIndexedHeight() === 20L)
  }

  test("autoFinal session mode: full pipeline cycle green; unhinted state reads get implicit FINAL") {
    // VERDICT r9 item 8: the ClickHouse `final = 1` analogue flipped ON for
    // a whole pipeline run. Internal reads already go through Store.latest;
    // the rule's latest-over-latest wrap is idempotent, and raw audit reads
    // of versioned tables now resolve to the FINAL view — asserted below on
    // the work queue (the state table with the hottest transition traffic).
    spark.conf.set(graft.plans.AutoFinalResolution.ConfKey, "true")
    try {
      val p = mkPipeline()
      val claimed = p.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
      assert(claimed === Some(Iv(1, 10)))
      assert(p.maxBlockHeight() === 10L)
      assert(p.lastIndexedHeight() === 10L)
      val second = p.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
      assert(second === Some(Iv(11, 20)))
      assert(p.lastIndexedHeight() === 20L)
      // an UNHINTED raw read of the versioned work queue resolves to the
      // latest view: injected Window in the analyzed plan, one row per id,
      // and row-identical to the explicit Store.latest read
      val wq = p.readTable("work_queue")
      assert(wq.queryExecution.analyzed.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty, "autoFinal must inject the latest-view window")
      assert(wq.count() === wq.select("id").distinct().count())
      val auto = wq.orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("status")))
      val explicit = p.workQueue().orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("status")))
      assert(auto.toSeq === explicit.toSeq)
      assert(auto.count(_._2 == "done") === 2)
    } finally spark.conf.unset(graft.plans.AutoFinalResolution.ConfKey)
  }

  test("readTable is FINAL by default for state tables; readTableRaw keeps appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh_af").toString
    def mk(auto: Boolean) = new Pipeline(spark, PipelineConfig(
      warehouse = dir, startHeight = 1, assignRange = 10, numWorkers = 2,
      backfillMode = true, now = () => { clock += 1; clock }, autoFinal = auto))
    val p = mk(auto = true)
    p.runOnce(tip = 10, fetch = iv => envelopes(iv.start to iv.end))
    // the claim→processing→done transitions appended multiple versions of
    // the one queue item: FINAL collapses them, raw keeps the insert log
    val fin = p.readTable("work_queue")
    val raw = p.readTableRaw("work_queue")
    assert(raw.count() > fin.count(), "superseded versions only in raw")
    assert(fin.count() === fin.select("id").distinct().count())
    // default read row-identical to the explicit latest view
    assert(fin.orderBy("id", "updated_at").collect().toSeq ===
      p.workQueue().orderBy("id", "updated_at").collect().toSeq)
    // blocks stays raw under the default (observational fact reads)
    assert(p.readTable("blocks").queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "blocks reads must not grow a window")
    // autoFinal = false restores raw readTable for the same warehouse
    val pOff = mk(auto = false)
    assert(pOff.readTable("work_queue").count() === raw.count())
  }

  test("failed ingest: incomplete range -> failed status + failed_blocks with backoff") {
    val p = mkPipeline()
    // fetch drops height 3 -> gap
    val claimed = p.runOnce(tip = 10,
      fetch = iv => envelopes((iv.start to iv.end).filter(_ != 3)))
    assert(claimed === Some(Iv(1, 10)))
    val wq = p.workQueue().orderBy("id").collect()
    assert(wq(0).getAs[String]("status") === "failed")
    val failed = p.retryEligible().collect()
    assert(failed.length === 0) // backoff: next_retry_at is 5 min out
    val recorded = p.readTable("failed_blocks").collect()
    assert(recorded.length === 1 && recorded(0).getAs[Long]("block_height") === 3L)
    // escalating retries raise the backoff and eventually go permanent
    (1 to 10).foreach(_ => p.recordFailedBlock(3, "missing", "still missing"))
    val last = graft.store.Store.latest(
      p.readTable("failed_blocks"), Seq("block_height"), "last_retry_at").collect()(0)
    assert(last.getAs[String]("status") === "failed_permanently")
    assert(last.getAs[Int]("retry_count") === 10)
  }

  test("failure path is batched: one append (one file) for a many-height failure") {
    val p = mkPipeline()
    // fetch throws -> the whole 10-height range fails in one catch
    val claimed = p.runOnce(tip = 10,
      fetch = _ => throw new RuntimeException("rpc down"))
    assert(claimed === Some(Iv(1, 10)))
    val fbDir = new java.io.File(p.readTable("failed_blocks")
      .inputFiles.head.replaceFirst("file:", "")).getParentFile
    val files = fbDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1,
      s"expected ONE coalesced failure append, got ${files.length} files")
    val recorded = p.readTable("failed_blocks").orderBy("block_height").collect()
    assert(recorded.length === 10)
    assert(recorded.map(_.getAs[Long]("block_height")).toSeq === (1L to 10L))
    assert(recorded.forall(_.getAs[Int]("retry_count") === 0))
    // a second batched failure increments every retry_count via ONE more file
    p.recordFailedBlocks(spark.range(1, 11).toDF("height"), "missing", "again")
    val after = graft.store.Store.latest(
      p.readTable("failed_blocks"), Seq("block_height"), "last_retry_at",
      tieBreak = Seq("id")).collect()
    assert(after.length === 10 && after.forall(_.getAs[Int]("retry_count") === 1))
    assert(fbDir.listFiles().count(_.getName.endsWith(".parquet")) === 2)
  }

  test("same-second transitions keep a deterministic FINAL order (monotonic micro-stamps)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh_tie").toString
    // FROZEN clock: every transition lands in the same wall-clock second —
    // the reference resolves this via insert order; we must via the version
    val p = new Pipeline(spark, PipelineConfig(
      warehouse = dir, startHeight = 1, assignRange = 10, backfillMode = true,
      now = () => 7777L))
    val items = p.seedWorkQueue(1, 10)
    assert(items === Seq(Iv(1, 10)))
    val Some((id, iv)) = p.claimNext(None)
    p.updateWorkStatus(id, "processing", range = Some(iv))
    p.updateWorkStatus(id, "done", range = Some(iv))
    // latest must be 'done' even though all rows share the same second
    assert(p.workQueue().collect().map(_.getAs[String]("status")).toSeq === Seq("done"))
    // failed_blocks: record + recover in the same second -> recovered wins
    p.recordFailedBlock(5, "missing", "gap")
    p.ingest(envelopes(Seq(5L)))
    p.retryEligible() // (not yet eligible; just exercising the read)
    // seeding twice in the same second must not collide ids
    val more = p.seedWorkQueue(11, 30)
    assert(more === Seq(Iv(11, 20), Iv(21, 30)))
    val ids = p.readTable("work_queue").select("id").distinct().collect().map(_.getLong(0))
    assert(ids.length >= 3, s"distinct ids expected, got ${ids.toSeq.sorted}")
    val pending = p.workQueue().filter(col("status") === "pending").collect()
    assert(pending.map(r => Iv(r.getAs[Long]("start_height"), r.getAs[Long]("end_height"))).toSet
      === Set(Iv(11, 20), Iv(21, 30)))
  }

  test("seedWorkQueue subtracts queued overlaps (J4 end-to-end)") {
    val p = mkPipeline()
    val first = p.seedWorkQueue(1, 30)
    assert(first === Seq(Iv(1, 10), Iv(11, 20), Iv(21, 30)))
    val again = p.seedWorkQueue(1, 35)
    assert(again === Seq(Iv(31, 35))) // only the uncovered tail
  }

  test("reconcile: processing item whose range is complete flips to done") {
    val p = mkPipeline()
    p.seedWorkQueue(1, 10)
    val Some((id, iv)) = p.claimNext(None)
    p.updateWorkStatus(id, "processing", range = Some(iv))
    p.ingest(envelopes(iv.start to iv.end))
    assert(p.workQueue().filter(col("status") === "processing").count() === 1)
    assert(p.reconcile() === 1)
    assert(p.workQueue().filter(col("status") === "done").count() === 1)
  }

  test("ingest writes height-bucketed tables readable via the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val p = new Pipeline(spark, PipelineConfig(
      warehouse = dir, backfillMode = true, now = () => { clock += 1; clock }))
    p.ingest(envelopes(Seq(1L, 100001L)))
    assert(p.readTable("blocks").count() === 2)
    // physical layout: one directory per height bucket
    val buckets = new java.io.File(s"$dir/blocks").listFiles()
      .map(_.getName).filter(_.startsWith("height_bucket=")).toSet
    assert(buckets === Set("height_bucket=0", "height_bucket=1"))
    // derived type tables landed too
    assert(spark.read.parquet(s"$dir/type_message").count() === 2)
    assert(spark.read.parquet(s"$dir/type_message_attrs").count() === 2)
  }

  test("claimNext: forward-priority window skips old ranges unless backfilling") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh3").toString
    val p = new Pipeline(spark, PipelineConfig(
      warehouse = dir, startHeight = 1, assignRange = 10,
      backfillMode = false, backfillWindow = 100,
      now = () => { clock += 1; clock }))
    // blocks are at height 500; window = [400, inf)
    p.ingest(envelopes(Seq(500L)))
    p.seedWorkQueue(1, 10)     // old range, below window
    p.seedWorkQueue(450, 459)  // inside window
    val claimed = p.claimNext(None)
    assert(claimed.map(_._2) === Some(Iv(450, 459))) // old range skipped
    // same queue in backfill mode claims the oldest range
    val pb = new Pipeline(spark, PipelineConfig(
      warehouse = dir, startHeight = 1, assignRange = 10,
      backfillMode = true, now = () => { clock += 1; clock }))
    assert(pb.claimNext(None).map(_._2) === Some(Iv(1, 10)))
  }

  test("RpcClient: rotation + retry, tip discovery, fetchEnvelopes end-to-end") {
    var calls = Vector.empty[(String, String)]
    val transport: (String, String) => String = (url, pth) => {
      calls = calls :+ ((url, pth))
      if (url == "http://bad") throw new RuntimeException("boom")
      if (pth == "/status")
        """{"result":{"sync_info":{"latest_block_height":"42"}}}"""
      else if (pth.startsWith("/block_results"))
        """{"result":{"txs_results":[],"finalize_block_events":[]}}"""
      else
        """{"result":{"block":{"header":{"time":"2025-06-01T12:00:00Z","app_hash":"AH"},"data":{"txs":[]}}}}"""
    }
    val client = new RpcClient(
      RpcConfig(Seq("http://bad", "http://good"), retriesPerEndpoint = 2, sleeper = _ => ()),
      transport)
    assert(client.latestHeight() === 42L)
    // rotation happened: bad tried twice then good succeeded
    assert(calls.take(3).map(_._1) === Vector("http://bad", "http://bad", "http://good"))
    val env = RpcSource.fetchEnvelopes(spark, client, 1, 3, parallelism = 2)
    val rows = env.orderBy("height").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.forall(_.getAs[String]("app_hash") === "AH"))
  }

  test("version stamps: strictly monotonic across Pipeline instances under a frozen clock") {
    // Two instances sharing a warehouse, clock frozen at one second: a
    // per-instance counter would stamp all three writes second*1e6 + 0 and
    // the FINAL view's tie-break would be nondeterministic; the JVM-wide
    // last-issued register orders them by write order.
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val frozen = () => 7777777L
    val p1 = new Pipeline(spark, PipelineConfig(warehouse = dir, now = frozen))
    val p2 = new Pipeline(spark, PipelineConfig(warehouse = dir, now = frozen))
    p1.advanceIndexState(10L)
    p2.advanceIndexState(20L)
    p1.advanceIndexState(30L)
    assert(p1.lastIndexedHeight() === 30L)
    val stamps = spark.read.parquet(s"$dir/index_state")
      .select(unix_micros(col("updated_at")).as("us"), col("last_processed_height"))
      .orderBy("us").collect()
    assert(stamps.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    assert(stamps.map(_.getLong(0)).distinct.length === 3, "stamps must be unique")
  }

  test("warehouse on a non-file: URI scheme: resume + seed survive (Hadoop FS table IO)") {
    // mockfs:// resolves through the Hadoop FileSystem API only — a
    // java.io.File existence check against the URI string is always false,
    // which used to reset resume heights and re-seed everything on any
    // non-local warehouse (the s3a/hdfs deployment landmine).
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_wh_mock").toString
    val wh = s"mockfs://$dir"
    val p = new Pipeline(spark, PipelineConfig(
      warehouse = wh, startHeight = 1, assignRange = 10, numWorkers = 2,
      backfillMode = true, now = () => { clock += 1; clock }))
    assert(p.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
      === Some(Iv(1, 10)))
    assert(p.lastIndexedHeight() === 10L)
    // a FRESH instance over the same remote-scheme warehouse resumes (no
    // height reset) and does not re-seed the already-queued range
    val p2 = new Pipeline(spark, PipelineConfig(
      warehouse = wh, startHeight = 1, assignRange = 10, numWorkers = 2,
      backfillMode = true, now = () => { clock += 1; clock }))
    assert(p2.lastIndexedHeight() === 10L)
    assert(p2.runOnce(tip = 25, fetch = iv => envelopes(iv.start to iv.end))
      === Some(Iv(11, 20)))
    val statuses = p2.workQueue().orderBy("id").collect()
      .map(r => (r.getAs[Long]("start_height"), r.getAs[String]("status")))
    assert(statuses.count(_._2 == "done") === 2)
    assert(statuses.map(_._1).distinct.length === statuses.length,
      "re-seeding duplicated work items")
  }
}

/** RawLocalFileSystem re-registered under a non-file scheme: mockfs:// paths
  * hit the local disk, but ONLY through the Hadoop FileSystem API — exactly
  * what a java.io.File-based existence check cannot see. */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
