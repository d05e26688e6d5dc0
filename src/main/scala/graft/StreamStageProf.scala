package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level receipts for the streaming replay harness constants
  * (VERDICT r12 item 5): how much of an x_stream_neardup_* gate is chunk
  * STAGING (read + range-repartition + write) vs the STREAM itself
  * (per-row signatures + state commits + sink) vs READBACK. Decides what
  * the shared-staging cut is worth before building it.
  *
  * Usage: java -cp ... graft.StreamStageProf <sfDir>
  */
object StreamStageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/work/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val docsDir = s"$sfDir/documents.parquet"
    // staging cost alone (the block both harnesses run verbatim)
    val (tStage, chunkDir) = time {
      val stage = graft.Scratch.dir("graft_ssprof")
      val cd = s"$stage/chunks"
      spark.read.parquet(docsDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"),
          timestamp_seconds(lit(1000000000L) + col("doc_id")).as("event_time"))
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(cd)
      cd
    }
    // full gate runs for reference (eq twins)
    val (tNear, nNear) = time {
      graft.streaming.StreamingNearDup.candidatesFileRun(spark, docsDir)
        .count()
    }
    val (tDedup, nDedup) = time {
      graft.streaming.StreamingDedup.firstSeenWinsFileRun(spark, docsDir)
        .count()
    }
    println(f"""{"probe":"stream_stage","stage_sec":$tStage%.3f,""" +
      f""""neardup_gate_sec":$tNear%.3f,"neardup_rows":$nNear,""" +
      f""""dedup_gate_sec":$tDedup%.3f,"dedup_rows":$nDedup}""")
    spark.stop()
  }
}
