package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (100 TB design point): AQE's skew-join handles
  * sort-merge cases at runtime; these explicit salting shapes cover the
  * cases AQE can't — skewed broadcast-probe keys and hot-key aggregations.
  */
object Skew {

  /** Position-based salt: spreads even byte-identical duplicate rows (a
    * whole-row hash would send every copy of a hot row to one reducer). The
    * salt value never reaches the result — it only chooses placement — so
    * its per-execution nature is safe. */
  private def saltOf(n: Int): Column =
    pmod(monotonically_increasing_id(), lit(n.toLong)).cast("int")

  /** Salted equi-join for a skewed LEFT side against a small-ish RIGHT side:
    * left rows get a salt in [0, saltFactor); the right side is replicated
    * once per salt value. The shuffle key becomes (key, salt), so a hot key
    * spreads over `saltFactor` reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val l = left.withColumn("__salt", saltOf(saltFactor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: partial-aggregate on
    * (keys, salt), then final-aggregate on keys. `partialAggs` must be
    * decomposable (sum/count/min/max); the caller supplies both phases. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(saltFactor >= 1)
    val salted = df.withColumn("__salt", saltOf(saltFactor))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
