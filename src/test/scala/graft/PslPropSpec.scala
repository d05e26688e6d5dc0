package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ext.Psl

/** Property pinning of [[Psl.registrableDomain]] against an INDEPENDENT
  * driver-side implementation of the publicsuffix.org algorithm (written
  * from the spec text, not from the column code): random hosts are
  * assembled from snapshot suffixes, wildcard bases, exception rules and
  * random labels, resolved both ways, and required equal. Also pins the
  * structural invariants every resolution must satisfy: the result is a
  * dot-suffix of the host, and its label count is min(nLabels(host),
  * psLen + 1).
  */
class PslPropSpec extends SparkTestBase {
  import spark.implicits._

  // --- reference resolver: the PSL algorithm, straight from the spec ---
  private val rules = Psl.parse(Psl.Snapshot)
  private def labels(h: String): List[String] = h.split('.').toList

  /** Public-suffix label count per publicsuffix.org: all rules that match
    * (rule labels are a suffix of host labels; wildcard matches one extra
    * arbitrary label), exceptions first, else most labels, else 1. */
  private def refPsLen(host: String, r: Psl.Rules = rules): Int = {
    val hl = labels(host)
    def suffixMatch(rule: String): Boolean = {
      val rl = labels(rule)
      hl.length >= rl.length && hl.takeRight(rl.length) == rl
    }
    val exc = r.exceptions.filter(suffixMatch)
    if (exc.nonEmpty) exc.map(e => labels(e).length - 1).max
    else {
      val plain = r.plain.filter(suffixMatch).map(x => labels(x).length)
      val wild = r.bases.filter { b =>
        val bl = labels(b)
        hl.length >= bl.length + 1 && hl.takeRight(bl.length) == bl
      }.map(b => labels(b).length + 1)
      (plain ++ wild + 1).max
    }
  }

  private def refDomain(host: String, r: Psl.Rules = rules): String = {
    val hl = labels(host)
    val ps = refPsLen(host, r)
    if (hl.length > ps) hl.takeRight(ps + 1).mkString(".") else host
  }

  // --- host generator: random labels around snapshot rules, so every rule
  // kind and depth actually occurs ---
  private val label: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val hostGen: Gen[String] = {
    val anchors = Gen.oneOf(
      Gen.oneOf(rules.plain.toSeq),
      Gen.oneOf(rules.bases.toSeq),
      Gen.oneOf(rules.exceptions.toSeq),
      label) // unanchored: the implicit * default
    for {
      anchor <- anchors
      depth <- Gen.chooseNum(0, 3)
      pre <- Gen.listOfN(depth, label)
    } yield (pre :+ anchor).mkString(".")
  }

  test("column form == spec-text reference on generated hosts (plus invariants)") {
    val hosts = Gen.listOfN(600, hostGen).sample.get.distinct
    val got = hosts.toDF("h")
      .select(col("h"), Psl.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h =>
      val expected = refDomain(h)
      assert(got(h) === expected, s"host $h")
      // structural invariants
      assert(h == got(h) || h.endsWith("." + got(h)), s"not a suffix: $h -> ${got(h)}")
      assert(labels(got(h)).length ==
        math.min(labels(h).length, refPsLen(h) + 1), s"label count: $h")
    }
  }

  test("reference resolver sanity on the canonical PSL examples") {
    // the worked examples from the publicsuffix.org algorithm page's rule
    // kinds, restricted to rules present in the snapshot
    assert(refDomain("foo.com") === "foo.com")
    assert(refDomain("a.b.foo.com") === "foo.com")
    assert(refDomain("baz.co.uk") === "baz.co.uk")
    assert(refDomain("a.baz.co.uk") === "baz.co.uk")
    assert(refDomain("x.ck") === "x.ck") // *.ck: x.ck IS a public suffix
    assert(refDomain("a.x.ck") === "a.x.ck")
    assert(refDomain("www.ck") === "www.ck") // !www.ck
    assert(refDomain("sub.www.ck") === "www.ck")
  }

  /** The real publicsuffix.org file as shipped on this machine (Debian
    * `publicsuffix` package, MPL-2.0 public data) — the full-scale rule
    * set the round-12 advice asked to pin. */
  private val realPslPath =
    java.nio.file.Paths.get("/usr/share/publicsuffix/public_suffix_list.dat")

  test("full ~9.5k-rule PSL file: plan builds fast, stays codegen'd, resolves correctly") {
    assume(java.nio.file.Files.exists(realPslPath), "no system PSL file")
    import scala.jdk.CollectionConverters._
    val fileRules = Psl.parseFileLines(
      java.nio.file.Files.readAllLines(realPslPath).asScala.toSeq)
    assert(fileRules.size > 9000, s"parsed only ${fileRules.size} rules")
    val full = Psl.parse(fileRules)

    // plan-build cost pin: building + analyzing + executing the projection
    // with ALL rules must not blow up in the analyzer/optimizer (the round-12
    // advice scenario: multi-thousand-literal In expressions per probe —
    // defused by the per-label-count rule partitioning)
    val hosts = Seq(
      "a.b.example.co.uk", "deep.sub.example.com", "example.com",
      "site.github.io", "a.x.ck", "www.ck", "sub.www.ck",
      "host.example.kawasaki.jp", "city.kawasaki.jp", "x.city.kawasaki.jp",
      "foo.xn--55qx5d.cn", // 公司.cn in punycode — must match via IDN encoding
      "nohost", "a.unknowntld")
    val t0 = System.nanoTime()
    val df = hosts.toDF("h")
      .select(col("h"), Psl.registrableDomain(col("h"), fileRules).as("d"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val buildAndRunSec = (System.nanoTime() - t0) / 1e9
    assert(buildAndRunSec < 30.0, f"full-PSL plan build+run took $buildAndRunSec%.1f s")

    // correctness vs the spec-text reference resolver under the SAME rules
    hosts.foreach(h => assert(got(h) === refDomain(h, full), s"host $h"))
    // and a few absolute anchors so the reference can't mask a shared bug
    assert(got("a.b.example.co.uk") === "example.co.uk")
    assert(got("site.github.io") === "site.github.io") // private-section rule
    assert(got("foo.xn--55qx5d.cn") === "foo.xn--55qx5d.cn")
    assert(got("x.city.kawasaki.jp") === "city.kawasaki.jp") // !city exception

    // codegen gate: the whole projection must sit inside WholeStageCodegen
    // with NO fallback (janino's 64KB method bound is the documented risk);
    // fallback=false turns a silent interpreted fallback into a test failure
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val wide = spark.range(10000)
        .select(concat(lit("h"), col("id"), lit(".example.co.uk")).as("h"))
        .select(Psl.registrableDomain(col("h"), fileRules).as("d"))
      // co.uk is the public suffix, so every hN.example.co.uk host
      // registers as example.co.uk
      assert(wide.filter(col("d") === "example.co.uk").count() === 10000L)
      // compact plan strings render WholeStageCodegen as a '*(n)' prefix
      val plan = wide.queryExecution.executedPlan.toString
      assert(plan.contains("*("), plan.take(800))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("full-PSL property sweep: column form == spec reference on file-anchored hosts") {
    assume(java.nio.file.Files.exists(realPslPath), "no system PSL file")
    import scala.jdk.CollectionConverters._
    val fileRules = Psl.parseFileLines(
      java.nio.file.Files.readAllLines(realPslPath).asScala.toSeq)
    // ASCII-only anchors: the column form matches lowercase ASCII hosts
    // (unicode rules are carried punycoded by parseFileLines)
    val full = Psl.parse(fileRules.filter(_.forall(c => c < 128)))
    val anchors = Gen.oneOf(
      Gen.oneOf(full.plain.toSeq), Gen.oneOf(full.bases.toSeq),
      Gen.oneOf(full.exceptions.toSeq), label)
    val gen = for {
      anchor <- anchors
      depth <- Gen.chooseNum(0, 3)
      pre <- Gen.listOfN(depth, label)
    } yield (pre :+ anchor).mkString(".")
    val hosts = Gen.listOfN(400, gen).sample.get.distinct
    val got = hosts.toDF("h")
      .select(col("h"), Psl.registrableDomain(col("h"),
        fileRules.filter(_.forall(c => c < 128))).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach(h => assert(got(h) === refDomain(h, full), s"host $h"))
  }
}
