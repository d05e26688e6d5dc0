package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` (SURVEY §2.11
  * north-star): per group, keeps the element-wise minimum of `numHashes`
  * universal hashes a + i*b derived from ONE md5 per shingle (the same
  * double-hashing scheme as the expression-based `Dedup.minhashSig`, with
  * which its output agrees — see TypedSpec). The buffer is a fixed-size
  * array — constant memory per group, merge-associative, so Spark computes
  * it with map-side partial aggregation.
  *
  * Usable as a DataFrame UDAF via `functions.udaf(new MinHashAgg(k))` or
  * on `KeyValueGroupedDataset.agg(new MinHashAgg(k).toColumn)`. */
class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  require(numHashes <= 16, "56-bit halves guarantee no overflow only for i < 16")

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val m = md5hex(shingle)
    val a = java.lang.Long.parseLong(m.substring(0, 14), 16)
    val b = java.lang.Long.parseLong(m.substring(14, 28), 16)
    var i = 0
    while (i < numHashes) {
      val h = a + i * b
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
