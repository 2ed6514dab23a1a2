package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Repartition, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule generalizing [[graft.Tables.fanOut]]: when a
  * compute-bound operator (aggregate, window) sits directly on a file
  * source whose layout cannot feed the cluster — fewer files than
  * `defaultParallelism`, e.g. a single unsplittable one-row-group
  * parquet file — inject one round-robin exchange so the operator runs
  * at full task width instead of the scan's. On a production layout
  * (files >= cores) the guard never fires, so the rule is a no-op
  * exactly where the extra shuffle would be pure cost.
  *
  * Opt-in (`spark.graft.widenNarrowScans.enabled=true`): the hand-placed
  * `fanOut` calls in the query registry choose better distribution keys
  * than round-robin and stay the default; this rule is the
  * whole-plan-automatic form, and the demonstration of the
  * `Rule[LogicalPlan]` + `SparkSessionExtensions` extension surface
  * (SURVEY §4.3's ladder step (c)).
  *
  * Idempotent by construction: the injected [[Repartition]] breaks the
  * (Project|Filter)*→relation chain the guard matches, so the optimizer
  * reaching a fixed point fires it at most once per operator.
  */
case class WidenNarrowScans(spark: SparkSession) extends Rule[LogicalPlan] {

  private def width: Int = spark.sparkContext.defaultParallelism

  private def enabled: Boolean =
    spark.conf.getOption(WidenNarrowScans.EnabledKey).contains("true")

  /** A pure column-level chain over a file relation with fewer files
    * than the cluster has slots. Anything else (joins, existing
    * exchanges, non-file sources, streaming) is left alone.
    */
  private def narrowChain(plan: LogicalPlan): Boolean = plan match {
    case Project(_, c) => narrowChain(c)
    case Filter(_, c) => narrowChain(c)
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length < width
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case a: Aggregate if narrowChain(a.child) =>
        a.withNewChildren(Seq(Repartition(width, shuffle = true, a.child)))
      case w: Window if narrowChain(w.child) =>
        w.withNewChildren(Seq(Repartition(width, shuffle = true, w.child)))
    }
}

object WidenNarrowScans {
  val EnabledKey = "spark.graft.widenNarrowScans.enabled"

  /** Runtime installation into an existing session (the
    * `experimental.extraOptimizations` hook) — the same
    * existing-session path [[graft.functions.GraftFunctions.register]]
    * uses for expressions; cluster deployments use
    * `spark.sql.extensions=graft.functions.GraftExtensions` instead.
    */
  def install(spark: SparkSession): Unit = {
    val rule = WidenNarrowScans(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[WidenNarrowScans]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
