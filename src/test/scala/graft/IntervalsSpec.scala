package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Intervals, Iv}

/** J4 interval subtraction + splitRange: example-based + ScalaCheck
  * properties (disjointness, coverage, no overlap with subtracted). */
class IntervalsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("subtract: middle overlap splits candidate in two") {
    assert(Intervals.subtract(Iv(1, 100), Seq(Iv(40, 60))) ===
      Seq(Iv(1, 39), Iv(61, 100)))
  }

  test("subtract: full cover yields nothing, disjoint yields candidate") {
    assert(Intervals.subtract(Iv(10, 20), Seq(Iv(1, 100))) === Seq.empty)
    assert(Intervals.subtract(Iv(10, 20), Seq(Iv(30, 40))) === Seq(Iv(10, 20)))
  }

  test("subtract: edge-touching overlaps") {
    assert(Intervals.subtract(Iv(10, 20), Seq(Iv(1, 10))) === Seq(Iv(11, 20)))
    assert(Intervals.subtract(Iv(10, 20), Seq(Iv(20, 25))) === Seq(Iv(10, 19)))
  }

  test("splitRange: sizes differ by at most 1, earlier parts larger") {
    val parts = Intervals.splitRange(1, 10, 3)
    assert(parts === Seq(Iv(1, 4), Iv(5, 7), Iv(8, 10)))
    assert(Intervals.splitRange(5, 5, 4) === Seq(Iv(5, 5)))
  }

  private val ivGen: Gen[Iv] = for {
    s <- Gen.chooseNum(0L, 1000L)
    len <- Gen.chooseNum(0L, 100L)
  } yield Iv(s, s + len)

  test("property: subtraction result is disjoint, inside candidate, and " +
    "covers exactly candidate minus existing") {
    check(Prop.forAll(ivGen, Gen.listOfN(8, ivGen)) { (cand: Iv, existing: List[Iv]) =>
      val segs = Intervals.subtract(cand, existing)
      val within = segs.forall(s => s.start >= cand.start && s.end <= cand.end)
      val disjointSorted = segs.sliding(2).forall {
        case Seq(a, b) => a.end < b.start
        case _ => true
      }
      val noOverlap = segs.forall(s => existing.forall(e => !Intervals.overlaps(s, e)))
      // coverage: a height of the candidate is in the result iff it is not
      // covered by any existing interval
      val coverage = (cand.start to cand.end).forall { h =>
        val inSeg = segs.exists(s => h >= s.start && h <= s.end)
        val inExisting = existing.exists(e => h >= e.start && h <= e.end)
        inSeg == !inExisting
      }
      within && disjointSorted && noOverlap && coverage
    })
  }

  test("property: splitRange covers [s,e] exactly, contiguously") {
    check(Prop.forAll(Gen.chooseNum(0L, 10000L), Gen.chooseNum(0L, 500L),
      Gen.chooseNum(1, 40)) { (s: Long, len: Long, n: Int) =>
      val e = s + len
      val parts = Intervals.splitRange(s, e, n)
      val contiguous = parts.head.start == s && parts.last.end == e &&
        parts.sliding(2).forall {
          case Seq(a, b) => b.start == a.end + 1
          case _ => true
        }
      val sizeBound = parts.map(_.size).max - parts.map(_.size).min <= 1
      contiguous && sizeBound && parts.length == math.min(n.toLong, len + 1)
    })
  }

  test("planWorkItems: carves range and respects queued work") {
    val items = Intervals.planWorkItems(1, 2500, 1000, Seq(Iv(500, 1500)))
    // [1,1000]-queued -> [1,499]; [1001,2000]-queued -> [1501,2000]; [2001,2500]
    assert(items === Seq(Iv(1, 499), Iv(1501, 2000), Iv(2001, 2500)))
    val all = items.flatMap(i => i.start to i.end).toSet
    assert(!all.exists(h => h >= 500 && h <= 1500))
  }
}
