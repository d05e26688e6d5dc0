package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Fns
import graft.ingest.Flatten
import graft.queries.Mvs
import graft.schema.Schemas
import graft.store.Store

/** Structured-Streaming ingest (SURVEY §2.10): the reference's 10-second
  * polling loop becomes a file-source stream of envelope JSON with a
  * processing-time trigger; offset tracking/resume is the stream checkpoint
  * (replacing index_state for the streaming path); per-batch flatten + append
  * reuses the exact batch lineages; the three MVs are maintained
  * incrementally by appending partial aggregates per micro-batch
  * (insert-time MV trigger semantics — readers finish with group-by-sum via
  * `Mvs.readMv`).
  */
object StreamingIngest {

  /** Start the ingest stream over a directory that receives envelope JSON
    * files (one object per line). Writes the 10 analytic tables plus the
    * three MV partial tables under `warehouse`. */
  def start(spark: SparkSession, inputDir: String, warehouse: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    var reader = spark.readStream.schema(Schemas.envelope)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val env = reader.json(inputDir)

    env.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(warehouse, batch)
      }
      .start()
  }

  /** Event-time windowed block-rate aggregation with a watermark: counts
    * blocks and txs per tumbling window of block time, tolerating
    * `lateness` of out-of-order arrival (the streaming analogue of the
    * reference's BACKFILL_WINDOW forward-priority rule). Append mode: a
    * window emits once its watermark passes — exactly-once per window. */
  def windowedBlockStats(spark: SparkSession, inputDir: String,
                         window: String = "1 minute",
                         lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions.{window => windowFn}
    val env = spark.readStream.schema(Schemas.envelope).json(inputDir)
    env
      .withColumn("block_time", col("time").cast("timestamp"))
      .withWatermark("block_time", lateness)
      .groupBy(windowFn(col("block_time"), window))
      .agg(
        count(lit(1)).as("blocks"),
        coalesce(sum(size(col("txs"))), lit(0L)).as("txs"))
  }

  /** One micro-batch: flatten once (cached), append all tables bucketed by
    * height, append MV partial aggregates for the affected dates. */
  def ingestBatch(warehouse: String, envelopes: DataFrame): Unit = {
    val env = envelopes.cache()
    try {
      val tables = Flatten(env)
      tables.all.foreach { case (name, df) =>
        Store.writeTable(
          df.withColumn("height_bucket", Fns.heightBucket(col("height"))),
          s"$warehouse/$name",
          partitionCols = Seq("height_bucket"),
          sortCols = Seq("height"),
          bloomCols = Store.bloomColsFor.getOrElse(name, Nil))
      }
      val blocks = tables.blocks.cache()
      try {
        Mvs.dailyBlockStatsDelta(blocks)
          .write.mode("append").parquet(s"$warehouse/mv_daily_block_stats")
        Mvs.dailyTxStatsDelta(tables.txs, blocks)
          .write.mode("append").parquet(s"$warehouse/mv_daily_tx_stats")
        Mvs.eventTypeStatsDelta(tables.txEvents, blocks)
          .write.mode("append").parquet(s"$warehouse/mv_event_type_stats")
      } finally { blocks.unpersist(); () }
    } finally { env.unpersist(); () }
  }
}
