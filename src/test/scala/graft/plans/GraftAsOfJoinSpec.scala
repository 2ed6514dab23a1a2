package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The native as-of operator: plans as [[GraftAsOfJoinExec]] (no
  * cartesian/BNLJ anywhere), matches the composed window-form
  * [[graft.ops.AsOf.asofJoin]] on real data, and honors the contract's
  * edges — inclusive equal timestamps, null keys/times never matching,
  * inner drop of unmatched rows, self-join attribute hygiene.
  */
class GraftAsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(ts(100))), // matches a@100 (inclusive)
      (2L, Some("a"), Some(ts(150))), // matches a@100 (no newer at-or-before)
      (3L, Some("a"), Some(ts(250))), // matches a@200
      (4L, Some("b"), Some(ts(99))),  // before every b row -> dropped
      (5L, Some("b"), Some(ts(500))), // matches b@300
      (6L, Some("c"), Some(ts(100))), // no c rows on the right -> dropped
      (7L, None, Some(ts(100))),      // null key -> dropped
      (8L, Some("a"), None)           // null time -> dropped
    ).toDF("id", "k", "t")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      (Some("a"), Some(ts(100)), 10L),
      (Some("a"), Some(ts(200)), 20L),
      (Some("b"), Some(ts(300)), 30L),
      (None, Some(ts(50)), 40L),      // null key: matches nothing
      (Some("a"), None, 50L)          // null time: matches nothing
    ).toDF("rk", "rt", "v")
  }

  private def native(l: DataFrame, r: DataFrame): DataFrame =
    GraftAsOfJoin.asofJoin(l, r, "k", "rk", "t", "rt")

  test("merge pass matches the hand-computed contract incl. null/edge rows") {
    val got = native(leftDf, rightDf)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 20L), (5L, 30L)))
  }

  test("plans as GraftAsOfJoinExec with no cartesian or nested loop") {
    val df = native(leftDf, rightDf)
    // stringify (AQE wraps the tree in AdaptiveSparkPlanExec, which hides
    // the inner plan from collect*)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("GraftAsOfJoin"), s"no native exec in:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("matches the composed window form on the events table (self-join source)") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val nat = GraftAsOfJoin
      .asofJoin(purchases, signups, "user_id", "s_user", "ts", "s_ts")
      .select(col("event_id"), col("s_ts").as("signup_ts"))
    val composedSignups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val composed = graft.ops.AsOf
      .asofJoin(purchases, composedSignups, "user_id", "ts", "ts", "signup_ts")
      .select(col("event_id"), col("signup_ts_asof").as("signup_ts"))
    val n = nat.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val c = composed.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(n.nonEmpty && n === c)
  }

  test("empty right side yields empty inner result") {
    assert(native(leftDf, rightDf.where(lit(false))).count() === 0L)
  }

  test("pre-partitioned-and-sorted children join without an extra exchange") {
    // repartition+sortWithinPartitions gives each child exactly the
    // required distribution/ordering: EnsureRequirements must add NO
    // exchange on top (the bucketed-table scenario at 100 TB)
    val l = leftDf.repartition(4, col("k")).sortWithinPartitions("k", "t")
    val r = rightDf.repartition(4, col("rk")).sortWithinPartitions("rk", "rt")
    val df = native(l, r)
    val got = df.select("id", "v").collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 20L), (5L, 30L)))
    // Count real shuffle nodes in the executed tree (descending through
    // AQE wrappers/stages), not substrings of the rendered plan —
    // ReusedExchange or format drift must not flip the assertion.
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(shuffles).sum
    }
    val exec = df.queryExecution.executedPlan
    assert(shuffles(exec) === 2, s"unexpected exchanges:\n$exec") // the 2 repartitions only
  }
}
