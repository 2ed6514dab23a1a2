package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite (aggregate navigation): an `Aggregate`
  * whose grouping and measures are all answerable from a REGISTERED
  * summary table is rewritten to a projection over that summary — the
  * classic warehouse optimization (Calcite/OLAP "aggregate
  * navigation"), and the third custom `Rule[LogicalPlan]` next to
  * [[WidenNarrowScans]] and [[BucketedRangeJoin]]. At 100 TB this is
  * the difference between answering a dashboard query from a
  * |groups|-row summary and re-scanning the fact table.
  *
  * Soundness model:
  *  - a summary is registered AT THE GRANULARITY of the rewrite (one
  *    row per group value), so measures map column-for-column — no
  *    re-aggregation and therefore no algebraic-vs-holistic pitfalls;
  *  - supported measures are COUNT(*) and SUM/MIN/MAX of a raw column
  *    (no DISTINCT, no FILTER clauses — anything else disqualifies the
  *    whole aggregate and the fact scan runs as written);
  *  - summaries key on the SOURCE path and are registered next to a
  *    content-fingerprinted materialization
  *    ([[graft.ops.Scale.ensureLineitemSummary]]), so a corpus
  *    regeneration re-materializes rather than serving stale rows;
  *  - the replacement projection preserves the original output
  *    attribute ids, so parent operators resolve unchanged.
  *
  * Opt-in (`spark.graft.summaryRewrite.enabled=true`), like the other
  * graft rules: correctness never depends on it — the rewritten plan
  * must (and q240's oracle proves it does) return bit-identical rows.
  */
case class SummaryRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import SummaryRewrite._

  private def enabled: Boolean =
    spark.conf.getOption(EnabledKey).contains("true")

  /** The single file-relation root under attribute-only projections, if
    * the subtree is exactly that shape.
    */
  private def sourceOf(plan: LogicalPlan): Option[String] = plan match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) => sourceOf(c)
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          Some(fs.location.rootPaths.head.toString)
        case _ => None
      }
    case _ => None
  }

  private def measureOf(ae: AggregateExpression): Option[Measure] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => Some(CountStar)
      case s: Sum => s.child match {
        case a: AttributeReference => Some(SumCol(a.name))
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference => Some(MinCol(a.name))
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference => Some(MaxCol(a.name))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), resultExprs, child, _) =>
        (for {
          src <- sourceOf(child)
          entry <- Option(registry.get(src))
          if g.name == entry.groupCol
          rewritten <- rewrite(entry, g, resultExprs)
        } yield rewritten).getOrElse(agg)
    }

  private def rewrite(entry: Summary, g: AttributeReference,
      resultExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    val rel = spark.read.parquet(entry.summaryPath).queryExecution.analyzed
    def summaryAttr(name: String): Option[AttributeReference] =
      rel.output.collectFirst { case a: AttributeReference if a.name == name => a }
    val mapped: Seq[Option[NamedExpression]] = resultExprs.map {
      case a: AttributeReference if a.exprId == g.exprId =>
        summaryAttr(entry.groupCol).map(sa =>
          Alias(sa, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        for {
          m <- measureOf(ae)
          colName <- entry.measures.get(m)
          sa <- summaryAttr(colName)
          // paranoia: the summary column must carry the exact result
          // type the aggregate would have produced
          if sa.dataType == ae.dataType
        } yield Alias(sa, name)(exprId = al.exprId)
      case _ => None
    }
    if (mapped.forall(_.isDefined)) Some(Project(mapped.map(_.get), rel))
    else None
  }
}

object SummaryRewrite {
  val EnabledKey = "spark.graft.summaryRewrite.enabled"

  sealed trait Measure
  case object CountStar extends Measure
  case class SumCol(name: String) extends Measure
  case class MinCol(name: String) extends Measure
  case class MaxCol(name: String) extends Measure

  /** One registered summary: where it lives, its grain, and which
    * summary column answers which measure.
    */
  case class Summary(summaryPath: String, groupCol: String,
      measures: Map[Measure, String])

  /** source root path → summary (process-wide, like the rule registry
    * any session-attached MV catalog would consult).
    */
  private[plans] val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Summary]

  def register(sourcePath: String, summary: Summary): Unit =
    registry.put(sourcePath, summary): Unit

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SummaryRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewrite(spark)
  }
}
