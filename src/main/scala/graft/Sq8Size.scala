package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Sq8Size {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val em = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8sz").toString
    em.select(col("vec_id"), col("embedding")).write.parquet(s"$dir/raw")
    graft.ext.Similarity.sq8WriteCodes(em, "vec_id", "embedding", s"$dir/sq8")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val r = bytes(s"$dir/raw"); val s = bytes(s"$dir/sq8")
    println(f"""{"probe":"sq8_size","n":${em.count()},"raw_bytes":$r,"sq8_bytes":$s,"ratio":${r.toDouble / s}%.2f}""")
    spark.stop()
  }
}
