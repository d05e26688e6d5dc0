package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time breakdown of the winnowPairs PROBE route at
  * sf1 — the measurement harness behind the r12 x_winnow_pairs tuning
  * (VERDICT r11 item 6). Replicates the operator's pipeline stages with a
  * barrier (count/collect) after each so the per-stage cost is visible;
  * the operator itself keeps its lazy/stage-shared shape.
  *
  * Usage: java -cp ... graft.WinnowProf [sfDir]
  */
object WinnowProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/work/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.{Dedup, Par, TextFns}

    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"""{"probe":"winnow_prof","stage":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }

    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = time("count")(df.count())
    val cap = Dedup.maxTokenFor(nDocs)

    val pr = Par.ensure(df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"),
        explode(TextFns.winnowedPrints(col("__ws"), 3, 4)).as("p"))
    val freq = time("freq-build+ckpt") {
      val f = pr.groupBy("p").agg(count(lit(1)).as("__f")).localCheckpoint()
      f
    }
    val capped = freq.filter(col("__f") <= cap)
    val (postings, sumF2) = time("stats-agg") {
      val st = capped.agg(
        coalesce(sum(col("__f")), lit(0L)),
        coalesce(sum(col("__f") * col("__f")), lit(0L))).first()
      (st.getLong(0), st.getLong(1))
    }
    println(s"""{"probe":"winnow_prof","postings":$postings,"sum_f2":$sumF2,"ratio":${sumF2 / math.max(1L, postings)},"cap":$cap}""")

    val tok = time("tok-join+ckpt") {
      pr.join(broadcast(freq), Seq("p")).filter(col("__f") <= cap)
        .localCheckpoint()
    }
    val dict = time("dict-distinct+zip") {
      val rdd = tok.select(col("p")).distinct().rdd.zipWithIndex
        .map { case (r, i) => org.apache.spark.sql.Row(r.getLong(0), i) }
      val d = spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__tid",
          org.apache.spark.sql.types.LongType, nullable = false))))
      d.localCheckpoint()
    }
    val docsP = time("docsP-join+groupBy+ckpt") {
      tok.join(broadcast(dict), Seq("p"))
        .groupBy(col("doc_id"))
        .agg(collect_list(col("__tid")).as("__ct"))
        .select(col("doc_id"), size(col("__ct")).as("__n"), col("__ct"),
          expr("CAST(array() AS ARRAY<BIGINT>)").as("__ut"))
        .localCheckpoint()
    }
    time("probe-use-agg") {
      docsP.agg(coalesce(sum(size(col("__ct"))), lit(0L)),
        coalesce(max(col("__n")), lit(0))).first()
    }
    // the CSR build + partition-local probe is private; approximate its
    // cost as "everything else" by running the full operator last
    time("full-operator") {
      Dedup.winnowPairs(df, "text", "doc_id").count()
    }
    spark.stop()
  }
}
