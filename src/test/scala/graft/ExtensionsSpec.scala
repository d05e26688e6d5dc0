package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions
import graft.plans.GraftExtensions
import graft.store.Store

/** Native expressions + the height→bucket pruning rule. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("format_readable_size: native expression, codegen-compatible") {
    val got = Seq(512L, 1536L, 1073741824L).toDF("b")
      .select(GraftExpressions.format_readable_size(col("b")))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("512 B", "1.50 KiB", "1.00 GiB"))
  }

  test("maybe_b64_decode: native expression matches the reference heuristic") {
    val got = Seq("aGVsbG8=", "hello", null).toDF("s")
      .select(GraftExpressions.maybe_b64_decode(col("s")))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("hello", "hello", null))
  }

  test("SQL registration: callable from spark.sql") {
    GraftExpressions.register(spark)
    val got = spark.sql(
      "SELECT format_readable_size(2048), maybe_b64_decode('dGVzdA==')").collect()(0)
    assert(got.getString(0) === "2.00 KiB")
    assert(got.getString(1) === "test")
  }

  test("HeightBucketPruning: height filter derives partition filters on the scan") {
    GraftExtensions.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val df = (0L until 500000L by 1000L).toDF("height")
      .withColumn("payload", col("height") * 2)
      .withColumn("height_bucket", graft.functions.Fns.heightBucket(col("height")))
    Store.writeTable(df, s"$dir/t", Seq("height_bucket"), Seq("height"))

    val q = spark.read.parquet(s"$dir/t")
      .filter(col("height") >= 150000L && col("height") < 250000L)
    val physical = q.queryExecution.executedPlan.toString

    // the derived bucket bounds must appear as PartitionFilters on the scan
    assert(physical.contains("PartitionFilters"), physical.take(2000))
    val pf = physical.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("height_bucket"), pf)
    // and results are identical to the unpruned computation
    val got = q.select(sum("payload")).collect()(0).getLong(0)
    val expected = (0L until 500000L by 1000L)
      .filter(h => h >= 150000L && h < 250000L).map(_ * 2).sum
    assert(got === expected)
  }

  test("HeightBucketPruning: no-op when bucket predicate already present or no literal") {
    GraftExtensions.install(spark)
    val df = Seq((1L, 0L), (200000L, 2L)).toDF("height", "height_bucket")
    // already has bucket predicate -> unchanged result, no duplicate derivation
    val q1 = df.filter(col("height") >= 1L && col("height_bucket") === 0L)
    assert(q1.count() === 1)
    // join-style non-literal comparison -> no derivation, still correct
    val q2 = df.filter(col("height") >= col("height_bucket"))
    assert(q2.count() === 2)
  }

  test("native kernels: interpreted eval matches the codegen'd column path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // NormalizeText
    val nt = graft.functions.NormalizeText(Literal("a  b́  "))
    assert(nt.eval(null).asInstanceOf[UTF8String].toString ===
      graft.functions.Fns.normalizeTextStr("a  b́  "))
    // SimHash16 over a words literal
    val wordsLit = Literal.create(Seq("lower", "stow"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val sh = graft.functions.SimHash16(wordsLit)
    val viaCol = Seq(Seq("lower", "stow")).toDF("ws")
      .select(graft.functions.GraftExpressions.simhash16(col("ws")))
      .collect()(0).getLong(0)
    assert(sh.eval(null).asInstanceOf[Long] === viaCol)
    // PqEncode on a real codebook + vector
    val cbs = Array.tabulate(2, 4, 2)((s, c, d) => (s + c * 2 + d).toDouble)
    val vec = Literal.create(Seq(1.0f, 2.0f, 3.0f, 4.0f),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val pq = graft.functions.PqEncode(vec,
      cbs.map(_.map(_.toSeq).toSeq).toSeq)
    val interp = pq.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    val viaCol2 = Seq(Seq(1.0f, 2.0f, 3.0f, 4.0f)).toDF("v")
      .select(graft.functions.GraftExpressions.pq_encode(col("v"), cbs))
      .collect()(0).getSeq[Int](0)
    assert(interp === viaCol2)
  }

  test("FINAL hint: rewrites to latest-per-key, equal to Store.latest, SQL surface works") {
    // blocks-shaped frame: (height, created_at) spec from the registry
    val df = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), // height 1: v200 wins
      (2L, 50L, "c")).toDF("height", "created_at", "payload")
    val viaHint = df.hint("FINAL").orderBy("height")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val viaApi = Store.latest(df, Seq("height"), "created_at").orderBy("height")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(viaHint.toSeq === viaApi.toSeq)
    assert(viaHint.toSeq === Seq((1L, 200L, "b"), (2L, 50L, "c")))
    // SQL surface: the ClickHouse-FINAL analogue as a hint
    df.createOrReplaceTempView("final_hint_t")
    // the hint goes on the table read (innermost select) — above a
    // projection the version column may already be pruned away
    val viaSql = spark.sql(
      "SELECT height, payload FROM (SELECT /*+ FINAL */ * FROM final_hint_t) " +
        "ORDER BY height")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.toSeq === Seq((1L, "b"), (2L, "c")))
    // unknown schema fails loudly, never silently reads raw
    val bad = Seq((1L, "x")).toDF("some_id", "v")
    val e = intercept[Exception](bad.hint("FINAL").collect())
    assert(e.getMessage.contains("FINAL hint"))
    // ambiguous schema (blocks + work_queue specs both present) fails loudly
    val amb = Seq((1L, 2L, 3L, 4L)).toDF("height", "created_at", "id", "updated_at")
    val e2 = intercept[Exception](amb.hint("FINAL").collect())
    assert(e2.getMessage.contains("ambiguous"))
  }

  test("FINAL hint: version ties broken by the registry tie-break (failed_blocks id)") {
    // failed_blocks shape: two rows share (block_height, last_retry_at);
    // the spec's tieBreak Seq("id") must pick the max id deterministically,
    // exactly like the explicit Store.latest(tieBreak = Seq("id")) read.
    val df = Seq(
      (10L, 500L, 1L, "first"), (10L, 500L, 2L, "second"),
      (11L, 400L, 3L, "only")).toDF("block_height", "last_retry_at", "id", "err")
    val viaHint = df.hint("FINAL").orderBy("block_height")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val viaApi = Store.latest(df, Seq("block_height"), "last_retry_at",
        tieBreak = Seq("id")).orderBy("block_height")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(viaHint.toSeq === viaApi.toSeq)
    assert(viaHint.toSeq === Seq((10L, 2L, "second"), (11L, 3L, "only")))
  }

  test("FINAL hint: a projection that pruned the tie-break column still resolves") {
    // failed_blocks minus `id`: keys+ver identify the versioned read; the
    // absent tie-break must degrade (order by ver only), not throw — a
    // caller that pruned the tie-break accepted its nondeterminism.
    val df = Seq(
      (10L, 500L, "a"), (11L, 400L, "b"))
      .toDF("block_height", "last_retry_at", "err")
    val got = df.hint("FINAL").orderBy("block_height")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq === Seq((10L, "a"), (11L, "b")))
  }

  test("autoFinal conf: unhinted reads of versioned schemas rewrite to latest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_autofinal").toString
    Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("height", "created_at", "payload").write.mode("overwrite").parquet(dir)
    // off (default): raw append rows visible
    assert(spark.read.parquet(dir).count() === 3L)
    spark.conf.set(graft.plans.AutoFinalResolution.ConfKey, "true")
    try {
      val auto = spark.read.parquet(dir)
      // the latest-view window is injected for the unhinted read
      assert(auto.queryExecution.analyzed.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty)
      val got = auto.orderBy("height").collect()
        .map(r => (r.getLong(0), r.getString(2)))
      assert(got.toSeq === Seq((1L, "b"), (2L, "c")))
      // ambiguous / unknown schemas are skipped silently in auto mode
      val amb = Seq((1L, 2L, 3L, 4L)).toDF("height", "created_at", "id", "updated_at")
      assert(amb.count() === 1L)
      assert(Seq((1L, "x")).toDF("some_id", "v").count() === 1L)
    } finally spark.conf.unset(graft.plans.AutoFinalResolution.ConfKey)
    assert(spark.read.parquet(dir).count() === 3L)
  }

  test("sorted kernels: nullable output survives non-nullable inputs under strict codegen") {
    // sort_array(collect_list(..)) yields nullable=false array columns; the
    // kernels' null branch (null SLOT -> null) must still compile — declare
    // nullable=true and run with codegen fallback disabled so a generated-
    // code compile error fails the test instead of silently interpreting.
    val nl = org.apache.spark.sql.catalyst.expressions.Literal(null)
    val exprs = Seq(
      graft.functions.SortedIntersectCount(nl, nl),
      graft.functions.SortedIntersectCountLong(nl, nl),
      graft.functions.SortedContains(nl, nl),
      graft.functions.SortedContainsLong(nl, nl))
    exprs.foreach(e => assert(e.nullable, e.prettyName))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val grouped = Seq((1, 10L), (1, 20L), (2, 10L), (2, 30L)).toDF("g", "v")
        .groupBy("g").agg(sort_array(collect_list(col("v"))).as("vs"))
      val joined = grouped.as("a").crossJoin(grouped.as("b"))
        .select(
          GraftExpressions.sorted_intersect_count_long(col("a.vs"), col("b.vs")).as("c"),
          GraftExpressions.sorted_contains_long(col("a.vs"), lit(10L)).as("m"))
        .orderBy(col("c"))
      val rows = joined.collect()
      assert(rows.length === 4)
      assert(rows.map(_.getInt(0)).toSeq === Seq(1, 1, 2, 2))
      assert(rows.forall(_.getBoolean(1)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
