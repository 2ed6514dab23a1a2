package graft.ops

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SubquerySpec extends SparkSpec {

  test("q128 plans the null-aware anti join, never a nested loop") {
    val df = SubqueryQueries.notInNullAware(spark, sf)
    val naaj = df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b
    }
    assert(naaj.nonEmpty, df.queryExecution.sparkPlan.toString)
  }

  test("q128 equals the plain anti join when the list has no runtime nulls") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
      .where(col("o_totalprice") > 350000).select(col("o_custkey"))
    val expect = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_quiet"), min("c_custkey").as("min_key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = SubqueryQueries.notInNullAware(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === expect)
  }

  test("NOT IN three-valued logic: one null in the list annihilates all probes") {
    val n = spark.sql(
      """SELECT x FROM VALUES (1), (2) AS t(x)
        |WHERE x NOT IN (SELECT y FROM VALUES (1), (CAST(NULL AS INT)) AS u(y))
        |""".stripMargin).count()
    assert(n === 0L)
  }

  test("q132 equals independently composed semi + anti joins") {
    val su = Tables.supplier(spark, sf)
    val na = Tables.nation(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val has49 = li.where(col("l_quantity") >= 49 && col("l_discount") > 0.099)
      .select(col("l_suppkey"))
    val deep = li.where(col("l_quantity") === 50 && col("l_discount") > 0.099 &&
        year(col("l_shipdate")) === 1997)
      .select(col("l_suppkey").as("d_suppkey"))
    val expect = su
      .join(has49, su("s_suppkey") === has49("l_suppkey"), "left_semi")
      .join(deep, su("s_suppkey") === deep("d_suppkey"), "left_anti")
      .join(na, su("s_nationkey") === na("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"), min("s_suppkey").as("min_supp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = SubqueryQueries.existsCorrelated(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === expect)
  }

  test("q129 navigation functions match first-principles formulas") {
    // recompute every navigation column from row_number alone (the
    // ordering is unique, so rank == row_number and cume_dist == rn/n)
    val w = Window.partitionBy("o_orderpriority").orderBy(col("cents"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(full))
      .withColumn("second_val", max(when(col("rn") === 2, col("cents"))).over(full))
    val expect = base
      .withColumn("pr_ppm", floor(
        (col("rn") - 1).cast("double") / (col("cnt") - 1).cast("double") * 1000000)
        .cast("long"))
      .withColumn("cd_ppm", floor(
        col("rn").cast("double") / col("cnt").cast("double") * 1000000).cast("long"))
      .withColumn("second_cents", when(col("rn") >= 2, col("second_val")))
      .withColumn("prev_cents", lag(col("cents"), 1, -1L).over(w))
      .withColumn("next_cents", lead(col("cents"), 1, -1L).over(w))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("pr_ppm").as("sum_pr_ppm"),
        sum("cd_ppm").as("sum_cd_ppm"), sum("second_cents").as("sum_second"),
        sum("prev_cents").as("sum_prev"), sum("next_cents").as("sum_next"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val got = SubqueryQueries.windowNavigation(spark, sf)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.nonEmpty && got === expect)
  }
}
