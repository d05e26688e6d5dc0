package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Height→bucket predicate derivation (SURVEY §4 optional polish #2).
  *
  * The physical layout partitions every analytic table by
  * `height_bucket = floor(height / 100000)` (ref models.js:117
  * `intDiv(height, 100000)`). Queries filter on raw `height`; without help
  * the scan reads every bucket directory. This rule derives the implied
  * `height_bucket` bounds from top-level height conjuncts so
  * FileSourceStrategy classifies them as partition filters — directory
  * pruning for free, the Spark analogue of ClickHouse partition pruning.
  *
  * Conservative by construction: only top-level AND-ed comparisons with
  * literals, only when the relation exposes both `height` and
  * `height_bucket`, and never when a bucket predicate is already present.
  */
object HeightBucketPruning extends Rule[LogicalPlan] {

  private val BucketSize = 100000L

  private def bucketOf(h: Long): Long = math.floorDiv(h, BucketSize)

  /** Literal matching the bucket attribute's type (partition-column discovery
    * may infer INT); skip derivation when the value wouldn't fit. */
  private def bucketLit(v: Long, bucket: Attribute): Option[Literal] =
    bucket.dataType match {
      case LongType => Some(Literal(v))
      case org.apache.spark.sql.types.IntegerType if v.isValidInt => Some(Literal(v.toInt))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def isHeight(e: Expression, height: Attribute): Boolean = e match {
    case a: Attribute => a.exprId == height.exprId
    case _ => false
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** Derive bucket bounds implied by one height conjunct. */
  private def derive(c: Expression, height: Attribute,
                     bucket: Attribute): Seq[Expression] = {
    def lit(x: Long) = bucketLit(bucketOf(x), bucket)
    c match {
      case EqualTo(h, v) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(EqualTo(bucket, _))).toSeq
      case EqualTo(v, h) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(EqualTo(bucket, _))).toSeq
      case GreaterThanOrEqual(h, v) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(GreaterThanOrEqual(bucket, _))).toSeq
      case GreaterThan(h, v) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(GreaterThanOrEqual(bucket, _))).toSeq
      case LessThanOrEqual(h, v) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(LessThanOrEqual(bucket, _))).toSeq
      case LessThan(h, v) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(LessThanOrEqual(bucket, _))).toSeq
      // reversed operand order
      case GreaterThanOrEqual(v, h) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(LessThanOrEqual(bucket, _))).toSeq
      case LessThanOrEqual(v, h) if isHeight(h, height) =>
        longLit(v).flatMap(x => lit(x).map(GreaterThanOrEqual(bucket, _))).toSeq
      case _ => Seq.empty
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val heightOpt = child.output.find(a => a.name == "height" && a.dataType == LongType)
      val bucketOpt = child.output.find(a => a.name == "height_bucket")
      (heightOpt, bucketOpt) match {
        case (Some(height), Some(bucket))
            if !cond.references.contains(bucket) =>
          val derived = splitConjuncts(cond).flatMap(derive(_, height, bucket)).distinct
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And(_, _)), child)
        case _ => f
      }
  }
}

/** Session-extension registration: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => HeightBucketPruning)
  }
}

object GraftExtensions {
  /** Install into an already-running session (tests, REPL). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(HeightBucketPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HeightBucketPruning
}
