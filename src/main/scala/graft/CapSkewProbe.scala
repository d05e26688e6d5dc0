package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mega-source skew probe for the capping family (VERDICT r10 item 4):
  * synthesize a corpus where ONE source holds 50% of all rows and measure
  * [[graft.ext.Sampling.sourceCapKeep]] / `tokenBudgetKeep` single-window
  * vs their scale routes (salted two-phase top-k / md5-prefix-bucket
  * prefix scan). The single-window plans put the mega-source through ONE
  * sort task — fine at gate scale, serialized at this probe's scale — while
  * the scale routes spread it over salts/buckets tasks. Results are
  * REQUIRED equal (count + id/token checksums); the gates pin hash-exact
  * equality at sf0.01 separately.
  *
  * [[SkewProbe]] carries a small capping section inside its banded-join
  * adversary corpus; this probe is the pure-capping rung where the corpus
  * is big enough (default 10 M rows) for the window-task serialization to
  * dominate the measurement.
  *
  * Usage: java -cp ... graft.CapSkewProbe [nRows] [cap] [budget]
  * Prints one JSON line (ScaleProbe contract).
  */
object CapSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cap = args.lift(1).map(_.toInt).getOrElse(100000)
    val budget = args.lift(2).map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 50% of rows in "mega", the rest across 32 small sources; text length
    // varies 1..8 words so token budgets exercise uneven running sums.
    // localCheckpoint: both routes read the same materialized input, so the
    // synthesis cost is off the timings.
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("source",
        when(pmod(xxhash64(col("doc_id"), lit(7L)), lit(2L)) === 0, lit("mega"))
          .otherwise(concat(lit("s"),
            pmod(xxhash64(col("doc_id"), lit(11L)), lit(32L)))))
      .withColumn("text",
        concat_ws(" ", transform(
          sequence(lit(1), (pmod(xxhash64(col("doc_id"), lit(13L)), lit(8L)) + 1)
            .cast("int")),
          i => concat(lit("w"), i))))
      .localCheckpoint()

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    import graft.ext.Sampling

    val (tCapPlain, capPlain) = time {
      val r = Sampling.sourceCapKeep(docs, "doc_id", "source", cap)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (tCapSalted, capSalted) = time {
      val r = Sampling.sourceCapKeep(docs, "doc_id", "source", cap, salts = 64)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(capPlain == capSalted, s"cap diverged: $capPlain vs $capSalted")

    val (tBudPlain, budPlain) = time {
      val r = Sampling.tokenBudgetKeep(docs, "doc_id", "source", "text", budget)
        .agg(sum("cum_tokens"), sum("keep")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (tBudBuck, budBuck) = time {
      val r = Sampling.tokenBudgetKeep(docs, "doc_id", "source", "text", budget,
          rangeBuckets = 256)
        .agg(sum("cum_tokens"), sum("keep")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(budPlain == budBuck, s"budget diverged: $budPlain vs $budBuck")

    // AUTO routes (r12): the measured-skew decision must flip to the scale
    // route on this corpus (the mega-source holds ~n/2 rows, far past the
    // default threshold) and must NOT flip when the threshold is raised
    // above the mega-source — results equal the plain route either way.
    val (maxN, total) = Sampling.maxSourceRows(docs, "source")
    val flipped = maxN > Sampling.AutoSkewRowThreshold
    require(n < 4000000L || flipped,
      s"expected the default threshold to flip at n=$n (maxN=$maxN)")
    val (tCapAuto, capAuto) = time {
      val r = Sampling.sourceCapAuto(docs, "doc_id", "source", cap)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(capAuto == capPlain, s"cap auto diverged: $capAuto vs $capPlain")
    val (tCapAutoHi, capAutoHi) = time {
      val r = Sampling.sourceCapAuto(docs, "doc_id", "source", cap,
          skewRowThreshold = Long.MaxValue)
        .agg(count(lit(1)), sum("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(capAutoHi == capPlain, s"cap auto(hi) diverged: $capAutoHi")
    val (tBudAuto, budAuto) = time {
      val r = Sampling.tokenBudgetAuto(docs, "doc_id", "source", "text", budget)
        .agg(sum("cum_tokens"), sum("keep")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(budAuto == budPlain, s"budget auto diverged: $budAuto vs $budPlain")

    println(f"""{"probe":"cap_skew","n_rows":$n,"cap":$cap,"budget":$budget,""" +
      f""""source_cap_plain_sec":$tCapPlain%.3f,""" +
      f""""source_cap_salted64_sec":$tCapSalted%.3f,""" +
      f""""token_budget_plain_sec":$tBudPlain%.3f,""" +
      f""""token_budget_bucketed256_sec":$tBudBuck%.3f,""" +
      f""""max_source_rows":$maxN,"total_rows":$total,""" +
      f""""auto_flipped":$flipped,"source_cap_auto_sec":$tCapAuto%.3f,""" +
      f""""source_cap_auto_plainpick_sec":$tCapAutoHi%.3f,""" +
      f""""token_budget_auto_sec":$tBudAuto%.3f,""" +
      f""""kept_docs":${capPlain._1},"kept_tokens_docs":${budPlain._2}}""")
    spark.stop()
  }
}
