package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule planning pure range joins as bucketed equi-joins —
  * the whole-plan-automatic form of [[graft.ops.RangeJoin.bucketed]].
  *
  * A join whose ONLY condition is an interval containment
  * (`probe.v >= r.lo AND probe.v < r.hi`, any >=/>/</<= pair bounding
  * one probe expression between two interval-side expressions) gives
  * Spark no equi-key, so it plans as BroadcastNestedLoopJoin — O(|L|x|R|)
  * comparisons and a broadcast that falls over when neither side is
  * small. With a bucket width W configured
  * (`spark.graft.rangeJoin.bucketWidth`), this rule rewrites the logical
  * join: the interval side explodes each [lo, hi] into the W-quantized
  * bucket ids it covers, the probe side computes its value's bucket, and
  * the join becomes a hash-partitionable EQUI join on bucket id with the
  * original range predicate kept as a residual. Each probe row meets
  * only the intervals sharing its bucket — O(1) candidates per row for
  * band-like interval sets — and the plan shuffles instead of
  * broadcasting a nested loop.
  *
  * Users write the natural `BETWEEN`-style join; the rule picks the
  * scale-safe physical shape, the way Databricks' range-join hint or a
  * Trino spatial-partitioned join does — declared plan, optimizer-chosen
  * execution.
  *
  * Correctness notes:
  *  - The upper bucket is `floor(hi / W)` even for a strict `<` bound:
  *    at worst one extra candidate bucket whose rows the residual
  *    predicate discards — never a missed pair (an epsilon subtraction
  *    could skip the bucket containing values in `(hi - eps, hi)`).
  *  - Null probe values / null bounds produce a null bucket or an empty
  *    sequence, dropping the row exactly as the three-valued range
  *    predicate does in the original inner join.
  *  - Idempotent at the optimizer fixed point: the rewritten join's
  *    condition contains a bucket equality, so the only-range-conjuncts
  *    guard no longer matches it.
  *
  * Width choice is the operator's contract (as with any range-join
  * accelerator): W of the typical interval length → ~2 buckets per
  * interval; pathological W (interval_span / W huge) explodes the
  * interval side and [[Sequence]]'s length guard aborts loudly rather
  * than silently degrading.
  */
case class BucketedRangeJoin(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import BucketedRangeJoin._

  private def widthOpt: Option[Double] =
    spark.conf.getOption(WidthKey).flatMap(s => Try(s.toDouble).toOption).filter(_ > 0)

  /** probe value bounded below (by `lo`) and above (by `hi`). */
  private case class RangeCond(v: Expression, lo: Expression, hi: Expression)

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  /** Decompose one comparison into (bounded expr, bound expr, isLower)
    * with the bounded expr coming from `probe` and the bound from
    * `interval`.
    */
  private def asBound(c: Expression, probe: LogicalPlan, interval: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] = {
    def sides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && a.references.subsetOf(probe.outputSet) &&
        b.references.nonEmpty && b.references.subsetOf(interval.outputSet) &&
        numeric(a) && numeric(b) && a.deterministic && b.deterministic
    c match {
      case GreaterThanOrEqual(a, b) if sides(a, b) => Some((a, b, true))
      case GreaterThan(a, b) if sides(a, b) => Some((a, b, true))
      case LessThanOrEqual(b, a) if sides(a, b) => Some((a, b, true))
      case LessThan(b, a) if sides(a, b) => Some((a, b, true))
      case LessThanOrEqual(a, b) if sides(a, b) => Some((a, b, false))
      case LessThan(a, b) if sides(a, b) => Some((a, b, false))
      case GreaterThanOrEqual(b, a) if sides(a, b) => Some((a, b, false))
      case GreaterThan(b, a) if sides(a, b) => Some((a, b, false))
      case _ => None
    }
  }

  /** The condition is EXACTLY a lower and an upper bound on one probe
    * expression — the no-equi-key join this rule exists for.
    */
  private def matchRange(cond: Expression, probe: LogicalPlan, interval: LogicalPlan)
      : Option[RangeCond] =
    splitConjunctivePredicates(cond) match {
      case Seq(c1, c2) =>
        for {
          (v1, b1, low1) <- asBound(c1, probe, interval)
          (v2, b2, low2) <- asBound(c2, probe, interval)
          if low1 != low2 && v1.semanticEquals(v2)
        } yield if (low1) RangeCond(v1, b1, b2) else RangeCond(v1, b2, b1)
      case _ => None
    }

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  private def rewrite(j: Join, probe: LogicalPlan, interval: LogicalPlan,
                      rc: RangeCond, w: Double): LogicalPlan = {
    val probeBucket = Alias(bucketOf(rc.v, w), "_graft_bucket")()
    val probeSide = Project(probe.output :+ probeBucket, probe)
    val bucketAttr = AttributeReference("_graft_bucket_r", LongType)()
    // Sequence is TimeZoneAwareExpression: it is unresolved until the
    // zone is filled in, and the analyzer (ResolveTimeZone) has already
    // run by optimization time — set it explicitly.
    val seq = Sequence(bucketOf(rc.lo, w), bucketOf(rc.hi, w), None,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    val intervalSide =
      Generate(Explode(seq), Nil, outer = false, None, Seq(bucketAttr), interval)
    val cond = And(EqualTo(probeBucket.toAttribute, bucketAttr), j.condition.get)
    // restore the original join's output (sides in their original order,
    // helper columns dropped)
    val (l, r) =
      if (probe eq j.left) (probeSide, intervalSide) else (intervalSide, probeSide)
    Project(j.output, Join(l, r, Inner, Some(cond), j.hint))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = widthOpt match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), _) =>
          matchRange(cond, left, right)
            .map(rc => rewrite(j, left, right, rc, w))
            .orElse(matchRange(cond, right, left)
              .map(rc => rewrite(j, right, left, rc, w)))
            .getOrElse(j)
      }
  }
}

object BucketedRangeJoin {
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  /** Runtime installation into an existing session (mirrors
    * [[WidenNarrowScans.install]]); cluster deployments get it from
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[BucketedRangeJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BucketedRangeJoin(spark)
}
