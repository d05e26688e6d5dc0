package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOf, Sessions}

/** Known-vector semantics for the event-time operators: as-of ordering
  * (equal-ts right-before-left, tie-break, tolerance nulling) and gap
  * sessionization boundaries. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val right = Seq(
    (1L, 10L, "a", 1L),
    (1L, 10L, "b", 2L), // equal (key, ts): largest tie must win
    (1L, 15L, "c", 3L)).toDF("k", "ts", "v", "rid")

  test("asofJoin: <= match, equal-ts right wins with largest tie, no-match is null") {
    val left = Seq((100L, 1L, 9L), (101L, 1L, 10L), (102L, 1L, 20L), (103L, 2L, 5L))
      .toDF("id", "k", "ts")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts",
        pick = Seq("v"), tie = Some("rid"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("asof_v"),
        Option(r.getAs[Any]("asof_ts")).map(_.asInstanceOf[Long])))
    assert(got(0) === ((100L, null, None)))       // nothing at-or-before 9
    assert(got(1) === ((101L, "b", Some(10L))))   // equal ts matches; tie 2 > 1
    assert(got(2) === ((102L, "c", Some(15L))))   // latest at-or-before 20
    assert(got(3) === ((103L, null, None)))       // key with no right rows
  }

  test("asofJoin: tolerance nulls out too-old matches, keeps fresh ones") {
    val left = Seq((1L, 1L, 16L), (2L, 1L, 30L)).toDF("id", "k", "ts")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts",
        pick = Seq("v"), tie = Some("rid"), tolerance = Some(lit(5L)))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("asof_v")))
    assert(got(0) === ((1L, "c")))  // age 1 <= 5
    assert(got(1) === ((2L, null))) // age 15 > 5 -> gated to null
  }

  test("asofJoin: all left columns survive, left row count preserved") {
    val left = Seq((100L, 1L, 20L, "x")).toDF("id", "k", "ts", "payload")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", pick = Seq("v"))
    assert(got.columns.toSeq === Seq("id", "k", "ts", "payload", "asof_ts", "asof_v"))
    assert(got.count() === 1)
  }

  test("sessions: gap > maxGap starts a new session; summary rolls up per session") {
    val ev = Seq(
      (1L, 1L, 0L, 10.0), (2L, 1L, 50L, 20.0), (3L, 1L, 120L, 30.0), // gaps < 100
      (4L, 1L, 400L, 40.0), (5L, 1L, 405L, 50.0),  // gap 280 -> session 2
      (6L, 2L, 0L, 5.0))                           // another user
      .toDF("event_id", "user_id", "ts", "value")
    val assigned = Sessions.assign(ev, "user_id", "ts", maxGap = 100L, tie = "event_id")
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_id")))
    assert(assigned === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 1L)))

    val got = Sessions.summary(ev, "user_id", "ts", maxGap = 100L, tie = "event_id",
        extra = Seq(sum(round(col("value") * 100).cast("long")).as("cents")))
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"),
        r.getAs[Long]("n_events"), r.getAs[Long]("cents")))
    assert(got === Array(
      (1L, 1L, 0L, 120L, 3L, 6000L),
      (1L, 2L, 400L, 405L, 2L, 9000L),
      (2L, 1L, 0L, 0L, 1L, 500L)))
  }

  test("asofJoin property: equals the naive range-join + argmax on random data") {
    import org.scalacheck.{Gen, Prop}
    val rowGen = for {
      k <- Gen.chooseNum(1L, 4L)
      ts <- Gen.chooseNum(0L, 40L) // small domain forces equal-ts collisions
    } yield (k, ts)
    val p = Prop.forAll(
      Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("id", "k", "ts")
      val right = rs.zipWithIndex.map { case ((k, ts), i) =>
        (k, ts, s"v$i", i.toLong) }.toDF("k", "ts", "v", "rid")
      val got = AsOf.asofJoin(left, right, Seq("k"), "ts",
          pick = Seq("v"), tie = Some("rid"))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[String]("asof_v"))).toMap
      // naive oracle: per left row, the max-(ts, rid) right row with ts <= l.ts
      val naive = ls.zipWithIndex.map { case ((k, ts), i) =>
        val cands = rs.zipWithIndex.filter { case ((rk, rts), _) => rk == k && rts <= ts }
        i.toLong -> cands.sortBy { case ((_, rts), ri) => (rts, ri) }.lastOption
          .map { case (_, ri) => s"v$ri" }
      }.toMap
      got == naive
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("sessions: equal-ts events order by tie column (stable boundaries)") {
    val ev = Seq((10L, 1L, 100L), (11L, 1L, 100L), (12L, 1L, 250L))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.assign(ev, "user_id", "ts", maxGap = 100L, tie = "event_id")
      .orderBy("event_id").collect().map(_.getAs[Long]("session_id"))
    // two equal-ts events share session 1 (gap 0); the 150-gap opens session 2
    assert(got.toSeq === Seq(1L, 1L, 2L))
  }
}
