package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq((0L, "hello world"), (1L, ""), (2L, "abc"))
    .toDF("doc_id", "text")
  private lazy val media = Multimodal.attachFakeMedia(docs, "doc_id", "text")

  test("media schema: binary content + typed metadata struct") {
    assert(media.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height", "duration_ms"))
  }

  test("decodeFeatures: normalized histogram, empty content safe") {
    val got = Multimodal.decodeFeatures(media).orderBy("doc_id").collect()
    assert(got.length === 3)
    val f0 = got(0).getSeq[Float](1)
    assert(f0.length === 16)
    assert(math.abs(f0.sum - 1.0) < 1e-5) // normalized
    assert(got(0).getAs[Long]("n_bytes") === 11L)
    val f1 = got(1).getSeq[Float](1)
    assert(f1.sum === 0f) // empty content -> zero histogram, no crash
    assert(got(1).getAs[Long]("n_bytes") === 0L)
  }

  test("decode is deterministic (fake codec)") {
    val a = Multimodal.decodeFeatures(media).orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = Multimodal.decodeFeatures(media).orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(a.toSeq.map(_.toSeq) === b.toSeq.map(_.toSeq))
  }

  test("frameSample: n frames from content") {
    val got = Multimodal.frameSample(media.filter(col("doc_id") === 0), 4)
      .collect()(0).getSeq[Array[Byte]](1)
    assert(got.length === 4)
  }

  test("resizeMeta clamps dimensions, keeps format") {
    val got = Multimodal.resizeMeta(media, 20, 20).select("meta.*").collect()
    assert(got.forall(r => r.getAs[Int]("width") <= 20 && r.getAs[Int]("height") <= 20))
    assert(got.map(_.getAs[String]("format")).toSet === Set("png", "wav"))
  }
}
