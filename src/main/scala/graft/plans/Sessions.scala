package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a new session starts when
  * the gap to the previous event of the same key exceeds `maxGap`.
  *
  * Classic two-window formulation — `lag` to flag boundaries, running `sum`
  * of flags to number sessions — over ONE hash partition on the key. Both
  * windows share the same (key, order) spec, so Catalyst plans a single
  * Exchange + sort and evaluates them in one Window operator pass; the
  * downstream per-session aggregate reuses the same partitioning (no second
  * shuffle at cluster scale beyond the hash on (key, session_id), which AQE
  * coalesces into the existing layout for the common case).
  *
  * `tsCol` is any monotone numeric (here: the events table's raw nanosecond
  * longs — exact integer arithmetic, no timestamp rounding hazards).
  */
object Sessions {

  /** Annotate each row with `session_id` (1-based, per key, in ts order). */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
             maxGap: Long, tie: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tie))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull || col(tsCol) - prev > maxGap, 1).otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, and a caller-supplied exact
    * aggregate (integer-cents style for hash-stable money sums). */
  def summary(events: DataFrame, keyCol: String, tsCol: String,
              maxGap: Long, tie: String, extra: Seq[Column]): DataFrame =
    assign(events, keyCol, tsCol, maxGap, tie)
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("start_ts"),
        (Seq(max(col(tsCol)).as("end_ts"), count(lit(1)).as("n_events")) ++ extra): _*)
}
