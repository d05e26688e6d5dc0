package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` (SURVEY §2.11
  * north-star): per group, keeps the element-wise minimum of `numHashes`
  * seeded md5 hashes of the input shingles. The buffer is a fixed-size
  * array — constant memory per group, merge-associative, so Spark computes
  * it with map-side partial aggregation (the same physical shape as the
  * expression-based `Dedup.minhashSig`, with which its output agrees).
  *
  * Usable as a DataFrame UDAF via `functions.udaf(new MinHashAgg(k))` or
  * on `KeyValueGroupedDataset.agg(new MinHashAgg(k).toColumn)`. */
class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[String], Array[String]] {

  override def zero: Array[String] = Array.fill(numHashes)(null)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var i = 0
    while (i < numHashes) {
      val h = md5hex(s"$i|$shingle")
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
