package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring for graft's native expressions — the
  * deployment path for clusters:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (Driver-created sessions that cannot set the conf use
  * [[GraftFunctions.register]], which installs the same builders into an
  * existing session at runtime.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductI64].getName, "dot_i64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductI64(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordNgrams(exprs.head, exprs(1))))
    // opt-in narrow-scan widening (spark.graft.widenNarrowScans.enabled)
    ext.injectOptimizerRule(graft.plans.WidenNarrowScans(_))
    // opt-in bucketed range-join rewrite (spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(graft.plans.BucketedRangeJoin(_))
    // native as-of join physical planning (graft.plans.GraftAsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.GraftAsOfJoinStrategy)
  }
}
