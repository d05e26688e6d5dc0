package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` content plus a typed
  * metadata struct, with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing here — schema, batch shape, partition-parallel
  * mapPartitions decode, expression-based sampling — is real and tested. The
  * codec itself is STUBBED (this container ships no image/audio libraries):
  * `decodeFeatures` derives a deterministic fake feature vector (a normalized
  * 16-bin byte histogram) where a real deployment would call the decoder.
  * Swapping in a real codec changes only the marked function body.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", metaSchema)))

  /** Attach a fake media column pair derived from a text column: content =
    * UTF-8 bytes, metadata deterministic from the id. Stands in for reading
    * real (bytes, metadata) pairs from a lakehouse table. */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        when(col(idCol) % 2 === 0, "png").otherwise("wav").as("format"),
        (col(idCol) % 64 + 16).cast("int").as("width"),
        (col(idCol) % 48 + 16).cast("int").as("height"),
        (col(idCol) * 40L).as("duration_ms")).as("meta"))

  private val NumBins = 16

  /** ---- STUB DECODE ----
    * Real impl: decode `content` with an image/audio codec and emit model
    * features. Fake: a normalized byte histogram — deterministic, preserves
    * the real batch shape (one iterator pass per partition, primitive-array
    * feature output). */
  def decodeBytesToFeatures(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](NumBins)
    if (content != null && content.nonEmpty) {
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xff) / NumBins) += 1f
        i += 1
      }
      var j = 0
      while (j < NumBins) { hist(j) /= content.length; j += 1 }
    }
    hist
  }

  /** Partition-parallel decode: media rows -> (doc_id, features, n_bytes).
    * mapPartitions keeps per-partition codec state (a real decoder would be
    * initialized once per partition, not per row). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "content").mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        Row(r.getLong(0), decodeBytesToFeatures(bytes).toSeq,
          if (bytes == null) 0L else bytes.length.toLong)
      }
    }(encoder)
  }

  /** Frame sampling as a pure expression: n evenly spaced single-byte
    * "frames" from the content (substr on binary; no decode needed). */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media.select(
      col("doc_id"),
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("content"),
          (i * greatest(length(col("content")), lit(1)) / n + 1).cast("int"), lit(1)))
        .as("frames"))

  /** Resize stub: clamp metadata dimensions (the real op would transform
    * pixels; the metadata contract is what downstream operators consume). */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format"),
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.duration_ms")))
}
