package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mr.MapReduce

/** Layer B — the relational operator suite the MapReduce model implies
  * (SURVEY.md §2.3): scans, filter/project, joins (equi/broadcast/semi/
  * anti/outer), aggregation, distinct, rollup, windows, sort/limit/top-k,
  * set ops, scalar functions. Declarative Column code throughout so
  * Catalyst gets pushdown/pruning/join-selection; every query has a
  * DuckDB oracle in [[oracles]].
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  import org.apache.spark.sql.Column

  /** Hash-stable money sum: summing doubles is order-dependent (Spark's
    * partial aggregation and DuckDB's accumulate in different orders), so
    * an oracle hash-compare on `sum(double)` is flaky in the low bits.
    * Summing after an exact cast to decimal is associative and engine-
    * independent; the final cast back to double is then deterministic.
    * Oracle mirror: `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Deterministic per-row money expression: snap an arithmetic double to
    * its exact decimal value (both engines compute the same IEEE product,
    * so the same decimal comes back out).
    */
  private def dval(c: Column, scale: Int = 4): Column =
    c.cast(s"decimal(18,$scale)").cast("double")

  /** Flagship: the reference sample client's character count
    * (`Sample Client/SampleClient.cpp:32-66`) as a declarative plan:
    * explode + groupBy/count gets automatic partial aggregation — the
    * map-side combine the sample client hand-rolls.
    */
  def charCountDf: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("ch")
      .agg(count(lit(1)).as("cnt"))

  /** Same workload through the faithful typed MapReduce API (Layer A),
    * including the per-record histogram map-side combine of
    * `SampleClient.cpp:34-50` and whole-group summing reduce of
    * `SampleClient.cpp:52-65`.
    */
  def charCountMr: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select("text").as[String]
    MapReduce.run(docs) { text =>
      text.groupBy(identity).iterator.map { case (c, cs) => (c.toString, cs.length.toLong) }
    } { (ch, counts) => Iterator.single((ch, counts.sum)) }
      .toDF("ch", "cnt")
  }

  /** Same workload through [[MapReduce.runAggregate]] — Layer A's
    * algebraic fast path: the reduce is declared as a commutative merge,
    * so Spark applies partial (map-side) aggregation before the shuffle,
    * which the reference's full flatMapGroups contract (q02) cannot.
    * Registered with q01's oracle so the upgrade is itself
    * correctness-gated and benched against both siblings.
    */
  def charCountMrFast: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select("text").as[String]
    MapReduce.runAggregate(docs) { text =>
      text.groupBy(identity).iterator.map { case (c, cs) => (c.toString, cs.length.toLong) }
    } { _ + _ }
      .toDF("ch", "cnt")
  }

  /** TPC-H Q1-style pricing summary: filter pushdown + hash aggregate. */
  def aggPricing: Q = (s, d) =>
    // fanOut: the wide decimal partial-aggregate is compute-bound; on the
    // single-file test corpus it would otherwise run in one task
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Filter + project with arithmetic (map emitting 0 or 1 pairs). */
  def filterProject: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        dval(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

  /** 3-way equi join (customer ⋈ orders ⋈ lineitem) + aggregate. */
  def joinRevenueBySegment: Q = (s, d) => {
    // project each input to its join/aggregate columns BEFORE the joins
    // (guide §2.3 "project before the exchange", r18): with the wide
    // unprojected inputs the planner's size estimates inverted the
    // build side — it BROADCAST the fanned-out 600k-row lineitem scan
    // and streamed the 150k customer⋈orders side (before-plan in
    // plans/r18). Narrow inputs put the build on the (orderkey,
    // segment) side, and lineitem streams straight into the partial
    // aggregate.
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(s, d).select("o_custkey", "o_orderkey")
    // pre-aggregate revenue per ORDER before the join (guide §2.3
    // "aggregate before you shuffle", r18): the per-order aggregate
    // reuses the fanOut repartition's l_orderkey partitioning (no new
    // exchange), and the join then moves one row per order instead of
    // one per line item — which also puts the broadcast back on the
    // small side (the unaggregated shape broadcast the 600k-row
    // lineitem scan and streamed the 150k customer⋈orders side).
    // Decimal sums are exact, so summing per-order decimal subtotals
    // and casting the total to double is bit-identical to dsum over
    // the raw rows.
    val l = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val lAgg = l.groupBy("l_orderkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev"), count(lit(1)).as("cnt"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(lAgg, o("o_orderkey") === col("l_orderkey"))
      .groupBy("c_mktsegment")
      .agg(sum("rev").cast("double").as("revenue"),
        sum("cnt").as("n_items"))
  }

  /** Broadcast join against the small dims (nation, region). */
  def joinBroadcastRegion: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = broadcast(Tables.nation(s, d))
    val r = broadcast(Tables.region(s, d))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"),
        (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
  }

  /** Left-semi join: orders having a high-quantity lineitem. */
  def joinSemi: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).where(col("l_quantity") > 45)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus")
  }

  /** Left-anti join: customers with no orders. */
  def joinAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Left-outer join + null-aware aggregate. */
  def joinOuterOrderCounts: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
  }

  /** Global sort + limit (planned as TakeOrderedAndProject — top-k without
    * a global sort, the scale-correct plan).
    */
  def sortTopOrders: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** Distinct (the shuffle dedup of `MapReduceFramework.cpp:109-110`). */
  def distinctFlags: Q = (s, d) =>
    Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()

  /** Exact count-distinct per group. */
  def countDistinctSupp: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))

  /** Set operations: nations having customers vs. suppliers. */
  def setOps: Q = (s, d) => {
    val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
    val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
    val both = c.intersect(su).select(lit("both").as("tag"), col("nk"))
    val custOnly = c.except(su).select(lit("cust_only").as("tag"), col("nk"))
    val all = c.union(su).distinct().select(lit("any").as("tag"), col("nk"))
    both.union(custOnly).union(all)
  }

  /** Ranking window: top-3 lineitems per return flag. */
  def windowRank: Q = (s, d) => {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    // fanOut: the partial WindowGroupLimit sorts BEFORE the window
    // exchange — on a one-task scan that sort would be serial
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("l_returnflag", "rn", "l_orderkey", "l_linenumber")
  }

  /** Tied ranking semantics: top-3 part SIZES per brand keeping ALL
    * tied parts — `dense_rank` (no gaps) next to `rank` (gaps after
    * ties) over the same sort, the two tie policies q14's `row_number`
    * deliberately avoids. Sizes repeat heavily within a brand, so the
    * tie paths are live at every sf and `rk_gap > rk_dense` is
    * observable wherever a tie precedes.
    *
    * Scale shape: identical to q14 — partial WindowGroupLimit prunes
    * to each brand's top sizes before the window exchange.
    */
  def windowRankTies: Q = (s, d) => {
    val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
    Tables.fanOut(Tables.part(s, d), col("p_partkey"))
      .withColumn("rk_dense", dense_rank().over(w))
      .withColumn("rk_gap", rank().over(w))
      .where(col("rk_dense") <= 3)
      .select("p_brand", "p_partkey", "p_size", "rk_dense", "rk_gap")
  }

  /** Analytic window: running total + lag over each customer's orders. */
  def windowRunning: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"),
      lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"))
  }

  /** Rollup with grouping id. */
  def rollupFlags: Q = (s, d) =>
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))

  /** Cube over orders. */
  def cubeOrders: Q = (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))

  /** String scalar functions. */
  def scalarString: Q = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 5)).as("up5"),
      length(col("p_name")).as("name_len"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      lower(reverse(col("p_brand"))).as("rev_brand"))

  /** Date scalar functions + aggregate by calendar bucket. */
  def scalarDate: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))

  /** Math scalar functions. */
  def scalarMath: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        floor(col("l_tax") * 100).as("tax_pct_floor"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        abs(col("l_quantity") - 25).as("qty_dev"))

  /** JSON extraction from the events.props string column. */
  def jsonEvents: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        (sum("k").cast("double") / count(col("k"))).as("avg_k"),
        max("k").as("max_k"))

  /** Word explode + count (map emitting N pairs). */
  def wordCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Batch-mode tumbling window over events (same semantics the streaming
    * layer uses with readStream + watermark).
    */
  def eventsTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_value"))

  /** Non-equi (range) join: each order joined to the count of more
    * expensive orders placed the same day — a theta join Catalyst plans
    * without a cross product thanks to the equi component on the date.
    *
    * SCALE NOTE: this is the registered theta-join demonstrator, but the
    * join form grows O(Σ per-day²) with rows per day — at 100 TB use
    * [[joinNonEquiWindow]] (q74), which computes the same answer with a
    * single per-day sort.
    */
  def joinNonEqui: Q = (s, d) => {
    val a = Tables.orders(s, d).select(col("o_orderkey").as("a_key"),
      col("o_orderdate").as("a_date"), col("o_totalprice").as("a_price"))
    val b = Tables.orders(s, d).select(col("o_orderdate").as("b_date"),
      col("o_totalprice").as("b_price"))
    a.join(b, a("a_date") === b("b_date") && b("b_price") > a("a_price"), "left")
      .groupBy("a_key")
      .agg(count(col("b_price")).as("n_pricier_same_day"))
  }

  /** The scale form of [[joinNonEqui]]: `rank() - 1` over a per-day
    * descending-price window IS the count of strictly pricier same-day
    * orders (rank assigns ties their minimum position). One sort per
    * day-partition instead of a per-day quadratic self-join; shares
    * q24's exact oracle.
    */
  def joinNonEquiWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderdate")).orderBy(col("o_totalprice").desc)
    Tables.orders(s, d)
      .select(col("o_orderkey").as("a_key"),
        (rank().over(w) - 1).cast("long").as("n_pricier_same_day"))
  }

  val queries: Map[String, Q] = Map(
    "q01_charcount_df" -> charCountDf,
    "q02_charcount_mr" -> charCountMr,
    "q03_agg_pricing" -> aggPricing,
    "q04_filter_project" -> filterProject,
    "q05_join_segment_revenue" -> joinRevenueBySegment,
    "q06_join_broadcast_region" -> joinBroadcastRegion,
    "q07_join_semi" -> joinSemi,
    "q08_join_anti" -> joinAnti,
    "q09_join_outer_counts" -> joinOuterOrderCounts,
    "q10_sort_topk" -> sortTopOrders,
    "q11_distinct_flags" -> distinctFlags,
    "q12_count_distinct" -> countDistinctSupp,
    "q13_setops" -> setOps,
    "q14_window_rank" -> windowRank,
    "q219_window_rank_ties" -> windowRankTies,
    "q15_window_running" -> windowRunning,
    "q16_rollup_flags" -> rollupFlags,
    "q17_cube_orders" -> cubeOrders,
    "q18_scalar_string" -> scalarString,
    "q19_scalar_date" -> scalarDate,
    "q20_scalar_math" -> scalarMath,
    "q21_json_events" -> jsonEvents,
    "q22_word_count" -> wordCount,
    "q23_events_tumbling" -> eventsTumbling,
    "q24_join_nonequi" -> joinNonEqui,
    "q74_nonequi_window" -> joinNonEquiWindow,
    "q57_charcount_mr_fast" -> charCountMrFast)

  val oracles: Map[String, String] = Map(
    "q01_charcount_df" ->
      """SELECT ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        |WHERE ch <> '' GROUP BY ch""".stripMargin,
    "q02_charcount_mr" ->
      """SELECT ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        |WHERE ch <> '' GROUP BY ch""".stripMargin,
    "q57_charcount_mr_fast" ->
      """SELECT ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        |WHERE ch <> '' GROUP BY ch""".stripMargin,
    "q03_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q04_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 24""".stripMargin,
    "q05_join_segment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q06_join_broadcast_region" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q07_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin,
    "q08_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q09_join_outer_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q10_sort_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q11_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q12_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q13_setops" ->
      """WITH c AS (SELECT CAST(c_nationkey AS INT) AS nk FROM customer),
        |     s AS (SELECT CAST(s_nationkey AS INT) AS nk FROM supplier)
        |SELECT 'both' AS tag, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        |UNION ALL
        |SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        |UNION ALL
        |SELECT 'any' AS tag, nk FROM (SELECT DISTINCT nk FROM (SELECT nk FROM c UNION ALL SELECT nk FROM s))""".stripMargin,
    "q14_window_rank" ->
      """SELECT l_returnflag, CAST(rn AS INT) AS rn, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin,
    "q219_window_rank_ties" ->
      """SELECT p_brand, p_partkey, p_size,
        |  CAST(rk_dense AS INT) AS rk_dense, CAST(rk_gap AS INT) AS rk_gap
        |FROM (
        |  SELECT p_brand, p_partkey, p_size,
        |    dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)
        |      AS rk_dense,
        |    rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rk_gap
        |  FROM part) WHERE rk_dense <= 3""".stripMargin,
    "q15_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
        |FROM orders""".stripMargin,
    "q16_rollup_flags" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q17_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q18_scalar_string" ->
      """SELECT p_partkey, upper(substr(p_name, 1, 5)) AS up5,
        |  length(p_name) AS name_len,
        |  concat(p_brand, '-', p_type) AS brand_type,
        |  lower(reverse(p_brand)) AS rev_brand
        |FROM part""".stripMargin,
    "q19_scalar_date" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q20_scalar_math" ->
      """SELECT l_orderkey, round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  l_orderkey % 7 AS mod7,
        |  abs(l_quantity - 25) AS qty_dev
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,
    "q21_json_events" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
        |    / count(json_extract_string(props, '$.k')) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q22_word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "q23_events_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q24_join_nonequi" ->
      """SELECT a.o_orderkey AS a_key, count(b.o_totalprice) AS n_pricier_same_day
        |FROM orders a LEFT JOIN orders b
        |  ON a.o_orderdate = b.o_orderdate AND b.o_totalprice > a.o_totalprice
        |GROUP BY a.o_orderkey""".stripMargin,
    // q74 computes the same answer as q24 at one sort — same exact oracle
    "q74_nonequi_window" ->
      """SELECT a.o_orderkey AS a_key, count(b.o_totalprice) AS n_pricier_same_day
        |FROM orders a LEFT JOIN orders b
        |  ON a.o_orderdate = b.o_orderdate AND b.o_totalprice > a.o_totalprice
        |GROUP BY a.o_orderkey""".stripMargin)
}
