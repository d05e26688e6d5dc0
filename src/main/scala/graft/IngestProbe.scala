package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical INGEST scale probe: run the real pipeline path (flatten → 10
  * partitioned table writes → 3 MV delta appends) over 10–25× the bench's
  * 2 000-block batch, split into resume-cycle-sized batches like production
  * ingest, and measure
  *
  *   - per-batch cost as the warehouse accumulates files (flat per-block
  *     cost is the claim: each batch writes only its own partitions,
  *     appends never rewrite existing files);
  *   - the file-count trajectory of the hottest table (txs) and what one
  *     [[graft.store.Store.compact]] pass does to it (many small appended
  *     files → few sorted files per height bucket) and costs;
  *   - blocks/min over the whole run, comparable to BENCH's ingest number.
  *
  * Usage: java -cp ... graft.IngestProbe [totalBlocks] [batches]
  * Prints one JSON line (same contract as ScaleProbe/AnnProbe).
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("graft_ingest_probe").toString
    val batchSize = total / batches

    def fileCount(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }

    // contiguous height ranges per batch — the resume-cycle shape: each batch
    // lands in (mostly) its own height_bucket partitions, so appends never
    // touch earlier batches' files
    val batchSecs = (0 until batches).map { b =>
      val lo = b.toLong * batchSize + 1
      val env = syntheticEnvelopes(spark, lo, lo + batchSize - 1)
      val t0 = System.nanoTime()
      graft.streaming.StreamingIngest.ingestBatch(wh, env)
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ingest-probe] batch $b [$lo..${lo + batchSize - 1}] $sec%.2f s")
      sec
    }

    val txFilesBefore = fileCount(s"$wh/txs")
    val t0c = System.nanoTime()
    graft.store.Store.compact(spark, s"$wh/txs", Seq("height", "tx_index"), None,
      partitionCols = Seq("height_bucket"), sortCols = Seq("height"))
    val compactSec = (System.nanoTime() - t0c) / 1e9
    val txFilesAfter = fileCount(s"$wh/txs")
    val txRows = spark.read.parquet(s"$wh/txs").count()

    val totalSec = batchSecs.sum
    val sorted = batchSecs.sorted
    val median = sorted(batches / 2)
    println(
      s"""{"metric":"ingest_probe","total_blocks":$total,"batches":$batches,""" +
        s""""batch_blocks":$batchSize,"total_sec":${f"$totalSec%.2f"},""" +
        s""""blocks_per_min":${f"${total * 60.0 / totalSec}%.0f"},""" +
        s""""batch_first_sec":${f"${batchSecs.head}%.2f"},""" +
        s""""batch_median_sec":${f"$median%.2f"},""" +
        s""""batch_last_sec":${f"${batchSecs.last}%.2f"},""" +
        s""""tx_rows":$txRows,"tx_files_before_compact":$txFilesBefore,""" +
        s""""tx_files_after_compact":$txFilesAfter,""" +
        s""""compact_sec":${f"$compactSec%.2f"}}""")
    spark.stop()
  }

  /** Same envelope shape as Bench.syntheticEnvelopes (5 txs × 2 events × 2
    * attrs per block), parameterized by a height range so batches stack into
    * one warehouse like resume cycles do. */
  private[graft] def syntheticEnvelopes(spark: SparkSession, fromHeight: Long,
                                        toHeight: Long) =
    spark.range(fromHeight, toHeight + 1).select(
      col("id").as("height"),
      date_format(
        timestamp_seconds(lit(1748736000L) + col("id") % 86400), // 2025-06-01 +
        "yyyy-MM-dd'T'HH:mm:ss'Z'").as("time"),
      md5(col("id").cast("string")).as("app_hash"),
      transform(sequence(lit(1), lit(5)),
        i => base64(concat(col("id").cast("string"), lit("|tx"), i).cast("binary")))
        .as("txs"),
      transform(sequence(lit(1), lit(5)), i => struct(
        (i % 4).cast("int").as("code"),
        (col("id") % 1000 + 100).cast("string").as("gas_wanted"),
        (col("id") % 900 + 90).cast("string").as("gas_used"),
        base64(concat(lit("d"), i).cast("binary")).as("data"),
        lit("ok").as("log"),
        transform(sequence(lit(1), lit(2)), e => struct(
          when(e % 2 === 0, "message").otherwise("wasm").as("type"),
          transform(sequence(lit(1), lit(2)), a => struct(
            concat(lit("k"), a).as("key"),
            concat(col("id").cast("string"), lit("-"), i, lit("-"), e).as("value"),
            lit(true).as("index"))).as("attributes"))).as("events"))).as("txs_results"),
      lit(null).cast(graft.schema.Schemas.envelope("finalize_block_events").dataType)
        .as("finalize_block_events"))
}
