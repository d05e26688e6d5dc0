package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-PSL scale receipt (VERDICT r12 item 2): feed the real ~9.5k-rule
  * publicsuffix.org file (Debian `publicsuffix` package) through
  * `Psl.parseFileLines` → `registrableDomain` and measure, at probe scale
  * (default 10 M hosts):
  *   - plan BUILD+ANALYZE time with the full rule set (the round-12 advice
  *     scenario: multi-thousand-literal In expressions — defused by the
  *     per-label-count rule partitioning, so each rule lands in exactly one
  *     InSet);
  *   - execution wall-time, full file vs the ~300-rule Snapshot, on the
  *     same host column (the size-independence claim, now measured);
  *   - whether the plan stays whole-stage-codegen'd (compact plan prefix).
  *
  * Host mix: ccSLD two-level registries, platform suffixes (github.io),
  * wildcard city registries with exceptions, punycoded IDN, bare TLDs,
  * deep subdomain chains — every rule kind fires.
  *
  * Usage: java -cp ... graft.PslProbe [nRows]
  */
object PslProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Psl

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    import scala.jdk.CollectionConverters._
    val pslPath = java.nio.file.Paths.get(
      "/usr/share/publicsuffix/public_suffix_list.dat")
    require(java.nio.file.Files.exists(pslPath), "no system PSL file")
    val fileRules = Psl.parseFileLines(
      java.nio.file.Files.readAllLines(pslPath).asScala.toSeq)

    val mod = pmod(xxhash64(col("id")), lit(8L))
    val site = concat(lit("site"), pmod(xxhash64(col("id"), lit(2L)), lit(500000L)))
    val host =
      when(mod === 0, concat(site, lit(".co.uk")))
        .when(mod === 1, concat(site, lit(".com.au")))
        .when(mod === 2, concat(lit("user"), site, lit(".github.io")))
        .when(mod === 3, concat(site, lit(".isehara.kanagawa.jp"))) // deep ccSLD
        .when(mod === 4, concat(lit("deep.sub."), site, lit(".com")))
        .when(mod === 5, concat(site, lit(".xn--55qx5d.cn"))) // IDN punycode
        .when(mod === 6, concat(site, lit(".kawasaki.jp"))) // wildcard registry
        .otherwise(concat(lit("www."), site, lit(".org")))
    val hosts = spark.range(n).select(host.as("h")).localCheckpoint()
    hosts.count()

    // plan build+analyze: force analysis without running a job
    val (tBuildFull, dfFull) = time {
      val d = hosts.select(Psl.registrableDomain(col("h"), fileRules).as("d"))
      d.queryExecution.executedPlan // forces analyze + optimize + plan
      d
    }
    val codegen = dfFull.queryExecution.executedPlan.toString.contains("*(")

    val (tFull, nFull) = time {
      dfFull.filter(col("d") =!= "").count()
    }
    val (tSnap, nSnap) = time {
      hosts.select(Psl.registrableDomain(col("h")).as("d"))
        .filter(col("d") =!= "").count()
    }
    // second interleaved pair (host-noise discipline)
    val (tFull2, _) = time {
      hosts.select(Psl.registrableDomain(col("h"), fileRules).as("d"))
        .filter(col("d") =!= "").count()
    }
    val (tSnap2, _) = time {
      hosts.select(Psl.registrableDomain(col("h")).as("d"))
        .filter(col("d") =!= "").count()
    }

    println(f"""{"probe":"psl","n_rows":$n,"n_rules":${fileRules.size},""" +
      f""""plan_build_full_sec":$tBuildFull%.3f,"codegen":$codegen,""" +
      f""""full_sec":$tFull%.3f,"snapshot_sec":$tSnap%.3f,""" +
      f""""full_sec2":$tFull2%.3f,"snapshot_sec2":$tSnap2%.3f,""" +
      f""""rows_full":$nFull,"rows_snapshot":$nSnap}""")
    spark.stop()
  }
}
