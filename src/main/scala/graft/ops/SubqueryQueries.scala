package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Subquery and navigation-window surfaces that round out the SQL layer:
  * null-aware `NOT IN` (a genuinely different join algorithm from
  * `LEFT ANTI`), correlated `EXISTS` / `NOT EXISTS`, and the navigation
  * window functions (`percent_rank`, `cume_dist`, `nth_value`,
  * `lead`/`lag` with defaults).
  *
  * Like the rest of `graft.ops` these generalize the reference's single
  * map→shuffle→reduce pipeline (`MapReduceFramework.cpp:191-202`) into
  * declarative plans Catalyst can rewrite: predicate subqueries become
  * semi/anti joins (RewritePredicateSubquery), never per-row re-scans.
  */
object SubqueryQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Register `df` under a collision-free view name, run `f`, then drop
    * the view. `spark.sql` analyzes eagerly, so the returned DataFrame
    * stays valid after the drop; unique names keep concurrent queries
    * in one session from clobbering each other (ADVICE r6).
    */
  private def withViews[A](s: SparkSession, dfs: (String, DataFrame)*)(
      f: Map[String, String] => A): A = {
    val names = dfs.map { case (base, df) =>
      val v = base + "_" + java.util.UUID.randomUUID().toString.replace("-", "")
      df.createOrReplaceTempView(v)
      base -> v
    }.toMap
    try f(names) finally names.values.foreach(s.catalog.dropTempView)
  }

  /** Null-aware `NOT IN` anti join. `NOT IN (subquery)` is NOT the same
    * operator as `LEFT ANTI` (q08): three-valued logic means one NULL in
    * the subquery result annihilates every probe row, so the join must
    * track "did the build side contain a null" — Spark's
    * null-aware anti join, planned as a broadcast hash join with
    * `isNullAwareAntiJoin=true` when the list is a single nullable key.
    *
    * `nullif(o_custkey, -1)` makes the list column statically nullable
    * (forcing the null-aware plan) while never being null at runtime, so
    * the result stays non-degenerate and exactly checkable.
    *
    * Scale shape: the subquery collapses to a distinct key list far
    * smaller than the probe side — exactly the broadcast regime the
    * null-aware algorithm requires. A build side too big to broadcast
    * would mean rewriting the query (anti join on a coalesced key),
    * which is a semantics decision, not a planner fallback.
    */
  def notInNullAware: Q = (s, d) =>
    withViews(s,
      "customer" -> Tables.customer(s, d),
      "orders" -> Tables.orders(s, d)) { v =>
      s.sql(
        s"""SELECT c_mktsegment, count(*) AS n_quiet, min(c_custkey) AS min_key
           |FROM ${v("customer")}
           |WHERE c_custkey NOT IN (
           |  SELECT nullif(o_custkey, -1) FROM ${v("orders")}
           |  WHERE o_totalprice > 350000)
           |GROUP BY c_mktsegment""".stripMargin)
    }

  /** Correlated `EXISTS` / `NOT EXISTS` with extra predicates: nations
    * counted by suppliers that shipped at least one max-quantity
    * deep-discount item but never such an item at full quantity in
    * 1997. Catalyst rewrites both
    * predicates into one semi and one anti join against `lineitem` —
    * two shuffles on `l_suppkey`, no per-supplier re-scan (the naive
    * correlated evaluation would be O(|supplier|·|lineitem|)).
    */
  def existsCorrelated: Q = (s, d) =>
    withViews(s,
      "supplier" -> Tables.supplier(s, d),
      "nation" -> Tables.nation(s, d),
      "lineitem" -> Tables.lineitem(s, d)) { v =>
      s.sql(
        s"""SELECT n_name, count(*) AS n_suppliers, min(s_suppkey) AS min_supp
           |FROM ${v("supplier")} s JOIN ${v("nation")} n ON s_nationkey = n_nationkey
           |WHERE EXISTS (
           |    SELECT 1 FROM ${v("lineitem")} l
           |    WHERE l.l_suppkey = s.s_suppkey
           |      AND l.l_quantity >= 49 AND l.l_discount > 0.099)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM ${v("lineitem")} l
           |    WHERE l.l_suppkey = s.s_suppkey
           |      AND l.l_quantity = 50 AND l.l_discount > 0.099
           |      AND year(l.l_shipdate) = 1997)
           |GROUP BY n_name""".stripMargin)
    }

  /** Navigation window functions over one shared (partition, order):
    * `percent_rank` / `cume_dist` (emitted as exact parts-per-million —
    * `floor` of a deterministic IEEE division of exact integers is
    * bit-identical across engines, unlike any float aggregate),
    * `nth_value(…, 2)` over an explicit ROWS frame, and `lead`/`lag`
    * with non-null defaults. Rolled up per partition so the oracle
    * compares a handful of exact longs instead of a megarow dump.
    *
    * Scale shape: ONE hash exchange on `o_orderpriority` and ONE sort
    * serve all five window functions (same spec), then the rollup is
    * partition-local. Low-cardinality partition keys are the known risk
    * at 100 TB — real deployments window by customer/day-grain keys;
    * the mechanics are identical.
    */
  def windowNavigation: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("cents"), col("o_orderkey"))
    val rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("pr_ppm", floor(percent_rank().over(w) * 1000000).cast("long"))
      .withColumn("cd_ppm", floor(cume_dist().over(w) * 1000000).cast("long"))
      .withColumn("second_cents", nth_value(col("cents"), 2).over(rows))
      .withColumn("prev_cents", lag(col("cents"), 1, -1L).over(w))
      .withColumn("next_cents", lead(col("cents"), 1, -1L).over(w))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum("pr_ppm").as("sum_pr_ppm"),
        sum("cd_ppm").as("sum_cd_ppm"),
        sum("second_cents").as("sum_second"),
        sum("prev_cents").as("sum_prev"),
        sum("next_cents").as("sum_next"))
  }

  val queries: Map[String, Q] = Map(
    "q128_notin_nullaware" -> notInNullAware,
    "q129_window_navigation" -> windowNavigation,
    "q132_exists_correlated" -> existsCorrelated)

  val oracles: Map[String, String] = Map(
    "q128_notin_nullaware" ->
      """SELECT c_mktsegment, count(*) AS n_quiet, min(c_custkey) AS min_key
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 350000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q132_exists_correlated" ->
      """SELECT n_name, count(*) AS n_suppliers, min(s_suppkey) AS min_supp
        |FROM supplier s JOIN nation n ON s_nationkey = n_nationkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey
        |      AND l.l_quantity >= 49 AND l.l_discount > 0.099)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_suppkey = s.s_suppkey
        |      AND l.l_quantity = 50 AND l.l_discount > 0.099
        |      AND year(l.l_shipdate) = 1997)
        |GROUP BY n_name""".stripMargin,
    // identical ppm flooring: both engines divide the same exact integers
    // as doubles, scale by 1e6, floor — bit-identical, then summed as
    // BIGINT (never a float aggregate)
    "q129_window_navigation" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_orderkey
        |  FROM orders),
        |x AS (
        |  SELECT o_orderpriority, cents,
        |    CAST(floor(percent_rank() OVER win * 1000000) AS BIGINT) AS pr_ppm,
        |    CAST(floor(cume_dist() OVER win * 1000000) AS BIGINT) AS cd_ppm,
        |    nth_value(cents, 2) OVER (
        |      PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_cents,
        |    coalesce(lag(cents, 1) OVER win, -1) AS prev_cents,
        |    coalesce(lead(cents, 1) OVER win, -1) AS next_cents
        |  FROM w
        |  WINDOW win AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey))
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(pr_ppm) AS BIGINT) AS sum_pr_ppm,
        |  CAST(sum(cd_ppm) AS BIGINT) AS sum_cd_ppm,
        |  CAST(sum(second_cents) AS BIGINT) AS sum_second,
        |  CAST(sum(prev_cents) AS BIGINT) AS sum_prev,
        |  CAST(sum(next_cents) AS BIGINT) AS sum_next
        |FROM x GROUP BY o_orderpriority""".stripMargin)
}
