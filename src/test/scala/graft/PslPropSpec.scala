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
  private def refPsLen(host: String): Int = {
    val hl = labels(host)
    def suffixMatch(rule: String): Boolean = {
      val rl = labels(rule)
      hl.length >= rl.length && hl.takeRight(rl.length) == rl
    }
    val exc = rules.exceptions.filter(suffixMatch)
    if (exc.nonEmpty) exc.map(e => labels(e).length - 1).max
    else {
      val plain = rules.plain.filter(suffixMatch).map(r => labels(r).length)
      val wild = rules.bases.filter { b =>
        val bl = labels(b)
        hl.length >= bl.length + 1 && hl.takeRight(bl.length) == bl
      }.map(b => labels(b).length + 1)
      (plain ++ wild + 1).max
    }
  }

  private def refDomain(host: String): String = {
    val hl = labels(host)
    val ps = refPsLen(host)
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
}
