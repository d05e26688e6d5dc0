package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key and `right.ts <= left.ts` (optionally within a tolerance window).
  *
  * The reference engine has no as-of operator (its point lookups are exact
  * equi-joins, `/root/reference/src/database/clickhouse_queries.js`), but any
  * event-attribution workload over the `events` stream needs one, and naive
  * formulations are the classic scale trap:
  *
  *   - correlated subquery / per-row lookup → O(left) point queries;
  *   - range join `l.ts >= r.ts` + argmax → O(left × right-per-key) blowup
  *     before the window trims it.
  *
  * This implementation is the single-shuffle union trick: tag right rows 0
  * and left rows 1, union them, and take a running `last(right_payload,
  * ignoreNulls)` over (key) ordered by (ts, tag, tie). Each partition is one
  * linear merge scan — the same work a sort-merge as-of does in kdb/DuckDB —
  * and the only exchange is the hash partition on the key, identical to what
  * any join on `key` would pay. No row ever fans out.
  *
  * Ordering semantics: right-before-left at equal ts gives `<=`; among right
  * rows with equal (key, ts) the largest `tie` wins (pass a unique column for
  * full determinism).
  */
object AsOf {

  /** Left as-of join.
    *
    * @param left      probe side; all its columns survive
    * @param right     quote side
    * @param keys      equality keys present on both sides
    * @param tsCol     ordering column present on both sides (numeric or
    *                  timestamp; compared with plain `<=`)
    * @param pick      right-side payload columns, emitted as `asof_<name>`
    * @param tie       right-side tiebreak column for equal (key, ts) rows
    * @param tolerance max allowed `left.ts - right.ts` (same units as tsCol);
    *                  matches older than that are nulled out
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, pick: Seq[String], tie: Option[String] = None,
               tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(
      (col(tsCol).as("__rts") +: pick.map(col) :+
        tie.map(col).getOrElse(lit(0L)).as("__tie")): _*)

    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__tag"),
        payload.as("__r")) ++ leftCols.map(c => lit(null).as(s"__l_$c")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__r.__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val inWindow = tolerance match {
      case Some(tol) => col("__m").isNotNull && (col("__ts") - col("__m.__rts") <= tol)
      case None      => col("__m").isNotNull
    }
    val gated = matched.withColumn("__m", when(inWindow, col("__m")))

    gated.select(
      leftCols.map(c => col(s"__l_$c").as(c)) ++
        (s"__m.__rts" +: pick.map(p => s"__m.$p")).zip("asof_ts" +: pick.map(p => s"asof_$p"))
          .map { case (src, dst) => col(src).as(dst) }: _*)
  }
}
