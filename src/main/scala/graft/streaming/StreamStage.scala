package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared chunk staging for the file-stream replay harnesses
  * ([[StreamingDedup.firstSeenWinsFileRun]] /
  * [[StreamingNearDup.candidatesFileRun]]).
  *
  * All four replay CORRECTNESS gates (dedup/neardup × in-order/permuted)
  * stage the IDENTICAL frame — (doc_id, text, event_time) doc_id-range
  * chunks of the same documents table — so staging is built ONCE per
  * (dir, chunks) per JVM and each run COPIES the part files into its own
  * input dir (the old per-run staging re-ran the read + range shuffle +
  * write four times, ~2.5-5 s each at sf1 — VERDICT r12 item 5; the ooo
  * twins differ from eq only in ARRIVAL ORDER, which the copy loop
  * controls, never the bytes). Copy, not rename: the master files must
  * survive for the next gate.
  */
object StreamStage {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** The staged doc_id-range chunk part files for (docsParquetDir, chunks),
    * in doc_id order. Built on first use per JVM. */
  def stagedParts(spark: SparkSession, docsParquetDir: String,
                  chunks: Int): Seq[Path] = {
    val key = s"$docsParquetDir#$chunks"
    cache.computeIfAbsent(key, _ => {
      val stage = graft.Scratch.dir("graft_stream_chunks")
      val chunkDir = s"$stage/chunks"
      spark.read.parquet(docsParquetDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"),
          timestamp_seconds(lit(1000000000L) + col("doc_id")).as("event_time"))
        .repartitionByRange(chunks, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(chunkDir)
      val fs = new Path(stage).getFileSystem(spark.sessionState.newHadoopConf())
      // part-file name order == range-partition order == doc_id order
      fs.listStatus(new Path(chunkDir)).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .sortBy(_.getName)
        .map(_.toString)
    }).toSeq.map(new Path(_))
  }

  /** Copy master chunk `part` into `inDir` as the `i`-th arrival —
    * ATOMICALLY: the copy lands on a sibling tmp path first and RENAMES
    * into the watched dir, because the continuously polling file source
    * could otherwise list a half-written file with no parquet footer and
    * kill the query. The master is kept (the next gate reuses it). */
  def feed(spark: SparkSession, part: Path, inDir: String, i: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = part.getFileSystem(conf)
    val dest = new Path(inDir, f"chunk-$i%05d.parquet")
    val tmp = new Path(new Path(inDir).getParent, s"feedtmp-${dest.getName}")
    FileUtil.copy(fs, part, fs, tmp, false, conf)
    fs.rename(tmp, dest)
    ()
  }
}
