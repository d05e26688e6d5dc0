package graft

import org.apache.spark.sql.SparkSession

/** Chunk-count cost curve for the two streaming gate harnesses
  * ([[graft.streaming.StreamingIngest.flattenFileRun]] — the flat_stream_mv
  * gate — and [[graft.streaming.StreamingNearDup.candidatesFileRun]] — the
  * x_stream_neardup_eq gate): run each at a ladder of micro-batch counts and
  * print wall seconds per point. The slope is the PER-MICRO-BATCH constant
  * (state-store checkpointing, sink commit, 13-table write fan-out); the
  * intercept is staging + stream startup + final read. This is the
  * measurement behind sizing `chunks` at gate scale — the gates assert
  * multi-batch exactly-once/state semantics, which any chunk count >= 2
  * exercises; every extra chunk just re-buys the same per-batch constant.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.StreamProbe [ladder]
  * where ladder is comma-separated chunk counts (default "2,4,8").
  * Prints one JSON line (ScaleProbe contract).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val ladder = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 4, 8))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // one warm-up of each harness at the smallest ladder point: JIT + codec
    // + state-store class loading must not be billed to the first point
    val warm = ladder.min
    graft.streaming.StreamingIngest.flattenFileRun(
      spark, graft.queries.Queries.syntheticEnvelopes(spark, sfDir), chunks = warm)
    graft.streaming.StreamingNearDup.candidatesFileRun(
      spark, s"$sfDir/documents.parquet", chunks = warm).count()

    val rows = ladder.map { c =>
      val tFlat = time {
        graft.streaming.StreamingIngest.flattenFileRun(
          spark, graft.queries.Queries.syntheticEnvelopes(spark, sfDir),
          chunks = c)
      }
      val tNear = time {
        graft.streaming.StreamingNearDup.candidatesFileRun(
          spark, s"$sfDir/documents.parquet", chunks = c).count()
      }
      System.err.println(f"[streamprobe] chunks=$c flat=$tFlat%.2f near=$tNear%.2f")
      f""""$c%d":{"flat_stream_mv":$tFlat%.3f,"x_stream_neardup":$tNear%.3f}"""
    }
    println(s"""{"metric":"stream_chunk_curve","sf":"$sfDir","points":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
