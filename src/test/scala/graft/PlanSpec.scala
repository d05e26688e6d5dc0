package graft

import graft.queries.{ExtQueries, Queries}

/** Plan-hygiene gate (VERDICT r1 item 10): the most expensive queries must
  * have the plans we'd want at 100 TB — broadcasts on dim joins, pushed
  * filters, no accidental cartesian products, codegen in the hot path. */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val q = (Queries.inventory ++ ExtQueries.inventory)
      .find(_._1 == name).get._2
    q(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("j5_broadcast_dict: dimension join is a broadcast hash join") {
    val p = plan("j5_broadcast_dict")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("j1_fact_dim_join: equi join, no cartesian/nested-loop") {
    val p = plan("j1_fact_dim_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("a7_mv2 (flagship): no cartesian, single agg over the join") {
    val p = plan("a7_mv2_daily_tx_stats")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"))
  }

  test("s4_point_lookup: key filter is pushed to the parquet scan") {
    val p = plan("s4_point_lookup")
    assert(p.contains("PushedFilters") &&
      p.replaceAll("\\s", "").contains("EqualTo(l_orderkey,1)"), p.take(3000))
  }

  test("column pruning: 2-col projection reads a 2-col schema") {
    val p = plan("f8_height_bucket")
    // ReadSchema should mention only o_orderkey (bucket derives from it)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("o_orderkey") && !read.contains("o_totalprice"), read)
  }

  test("x_lsh_pairs: candidate generation is an equi join on (band,bucket)") {
    val p = plan("x_lsh_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Join") || p.contains("join"))
  }

  test("a15_latest_per_key: one shuffle for the window, no global sort") {
    val p = plan("a15_latest_per_key")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
  }

  test("p3_time_window: scalar max is broadcast, not shuffled into the scan") {
    val p = plan("p3_time_window")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("whole-stage codegen active in flagship plan") {
    // AQE wraps the plan pre-execution; disable it for this one inspection so
    // the WholeStageCodegen spans are visible in the physical plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("a7_mv2_daily_tx_stats")
      // codegen stages print as `*(N) Operator` in SparkPlan.toString
      assert(p.contains("*(") && p.contains("BroadcastHashJoin"), p.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
