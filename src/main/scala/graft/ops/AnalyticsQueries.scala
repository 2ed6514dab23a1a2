package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Product-analytics and warehouse-maintenance operators over the event
  * stream and star schema: step funnels, cohort retention, Pareto
  * (skyline) frontier, MERGE-style CDC apply, bitmap activity masks, an
  * inverted index, and a blocked edit-distance similarity join.
  *
  * These extend the reference's single map→shuffle→reduce pipeline
  * (`MapReduceFramework.cpp:191-202`) the same way the rest of
  * `graft.ops` does: each is a declarative Catalyst plan whose shuffles
  * are keyed aggregations/joins (scale-safe at 100 TB), and each is
  * oracle-gated against DuckDB with exact integer/decimal arithmetic —
  * no float aggregate ever crosses the engine boundary un-cast.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Ordered 3-step funnel with per-step 24 h conversion deadlines:
    * first `view`, then the first `click` strictly after it (within
    * 24 h), then the first `purchase` strictly after that click (within
    * 24 h). Output: users surviving each stage.
    *
    * Shape at scale: three hash aggregations on `user_id` plus two
    * user-keyed equi joins — every operator is partitioned by the same
    * key, so AQE plans one exchange per side and nothing quadratic. The
    * per-stage min-timestamp join beats a per-user event-list collect
    * (the naive sessionize-then-scan form) because only one timestamp
    * per user crosses each stage boundary.
    */
  def funnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    def stage(tpe: String): DataFrame = ev.where(col("event_type") === tpe)
    val v = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val ck = stage("click").join(v, "user_id")
      .where(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = stage("purchase").join(ck, "user_id")
      .where(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def level(ord: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"), col("n_users"))
    level(1, "view", v).unionAll(level(2, "click", ck)).unionAll(level(3, "purchase", p))
  }

  /** Weekly cohort retention: cohort = ISO week of a user's first
    * `signup` event; activity = distinct weeks with a `purchase`.
    * Output: (cohort_week, week_offset) → retained users.
    *
    * Scale shape: one user-keyed aggregation for cohorts, one
    * (user, week) distinct, one user-keyed join — all co-partitioned on
    * `user_id`, then a tiny (weeks × weeks) final aggregate.
    */
  def retention: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t0"))
      .select(col("user_id"), date_trunc("week", col("t0")).cast("date").as("cohort_week"))
    val active = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("act_week"))
      .distinct()
    cohort.join(active, "user_id")
      .where(col("act_week") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        expr("CAST(datediff(act_week, cohort_week) div 7 AS INT)").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Pareto (skyline) frontier over parts: minimize `p_retailprice`,
    * maximize `p_size`. A part is dominated iff some part is no more
    * expensive and no smaller, with at least one strict.
    *
    * The naive form is the O(n²) NOT EXISTS self-join (that stays as the
    * oracle). The plan here is linear: aggregate to one row per distinct
    * price (max size), one ordered pass computes the running max size of
    * all strictly-cheaper prices, and the tiny price-level frontier
    * table joins back to parts. The single-partition window runs over
    * |distinct prices| rows — domain-bounded and orders of magnitude
    * smaller than the table; at 100 TB the same two-pass trick nests
    * (per-partition frontier, then frontier-of-frontiers) but the
    * price-level aggregate already fits every realistic domain.
    */
  def paretoFrontier: Q = (s, d) => {
    val p = Tables.part(s, d).select("p_partkey", "p_retailprice", "p_size")
    val byPrice = p.groupBy("p_retailprice").agg(max("p_size").as("msize"))
    val w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byPrice.withColumn("m_lt", max("msize").over(w))
    p.join(broadcast(frontier), "p_retailprice")
      .where(!(coalesce(col("m_lt") >= col("p_size"), lit(false)) ||
        col("msize") > col("p_size")))
      .select("p_partkey", "p_retailprice", "p_size")
  }

  /** MERGE-style CDC apply: the change feed is the latest urgent order
    * per customer (deterministic latest: order date then key, exactly
    * the q67 compaction pattern); status `F` means delete, anything else
    * upserts the balance to that order's total price; customers without
    * a change pass through unchanged. Full-outer join keeps the insert
    * leg live even though this corpus has no orphan changes.
    *
    * Scale shape: window-compact the change feed (keyed shuffle), one
    * full-outer equi join on the customer key — the standard distributed
    * MERGE plan (Delta/Iceberg execute exactly this join under the
    * hood).
    */
  def mergeApply: Q = (s, d) => {
    val rk = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT")
      .withColumn("rk", row_number().over(rk)).where(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderstatus").as("op_status"),
        col("o_totalprice").as("new_bal"))
    val cust = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
    cust.join(changes, col("c_custkey") === col("o_custkey"), "full_outer")
      .where(col("o_custkey").isNull || col("op_status") =!= "F")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("op_status").isNull, lit("kept"))
          .when(col("c_custkey").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"),
        when(col("op_status").isNotNull, col("new_bal"))
          .otherwise(col("c_acctbal")).as("balance"))
  }

  /** Per-user monthly activity bitmap: bit i set ⟺ active on day i+1,
    * via `bit_or(1 << (day-1))` — the roaring-bitmap-style presence
    * encoding at its integer-exact core. `n_days` pops the mask. One
    * hash aggregation; 8 bytes of state per (user, month) regardless of
    * event volume.
    */
  def activityBitmap: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), month(col("ts")).as("m"))
      .agg(bit_or(expr("shiftleft(1L, dayofmonth(ts) - 1)")).as("mask"))
      .withColumn("n_days", bit_count(col("mask")))

  /** Inverted index over the documents table: term → document frequency
    * + sorted posting list. `array_distinct` inside the per-document
    * split keeps the explode emission at one (doc, term) per distinct
    * term before the shuffle — the map-side dedup that makes the
    * posting-list build linear in corpus token count. The posting list
    * ships as a sorted comma-joined STRING, not an array — the q65 rule:
    * array output columns crash the driver's pandas sort (unhashable
    * ndarray), so every registered query's final schema is flat.
    */
  def invertedIndex: Q = (s, d) =>
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(filter(split(col("text"), " "), w => w =!= ""))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))

  /** Blocked edit-distance similarity join: document pairs whose 80-char
    * prefixes are within Levenshtein distance 8, candidate-blocked on
    * the 12-char prefix (equi join — near-duplicate docs share their
    * opening, so the block has high recall at a tiny candidate count;
    * the sf0.01 corpus yields 86 candidate pairs for 500 docs). The
    * quadratic distance computation only ever runs inside a block —
    * the same blocking discipline as the MinHash band join (q42).
    */
  def editDistanceJoin: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 80).as("prefix"),
        substring(col("text"), 1, 12).as("blk"))
    val a = docs.select(col("doc_id").as("a_id"), col("prefix").as("a_txt"), col("blk"))
    val b = docs.select(col("doc_id").as("b_id"), col("prefix").as("b_txt"), col("blk"))
    a.join(b, "blk")
      .where(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_txt"), col("b_txt")))
      .where(col("dist") <= 8)
      .select("a_id", "b_id", "dist")
  }

  /** Decimal-exact moment sum: the only float-crossing-engines rule
    * (NOTES.md "Determinism rules") applied to products — both factors
    * decimal-cast BEFORE multiplying so the sum is exact, then one cast
    * to double at the end.
    */
  private def dmom(e: String): Column = expr(s"CAST(sum($e) AS DOUBLE)")

  private val qd = "CAST(l_quantity AS DECIMAL(18,2))"
  private val pd = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val dd = "CAST(l_discount AS DECIMAL(18,4))"

  /** The Pearson-correlation formula over exact moments. The SAME text
    * runs through Spark SQL and DuckDB (both evaluate the identical
    * IEEE-double expression tree over identical exact inputs, so even
    * the hash compare agrees — sqrt and the 4 arithmetic ops are all
    * correctly rounded).
    */
  private def corrFormula(sx: String, sy: String, sxy: String,
                          sxx: String, syy: String): String =
    s"(n * $sxy - $sx * $sy) / (sqrt(n * $sxx - $sx * $sx) * sqrt(n * $syy - $sy * $sy))"

  /** Pairwise correlation matrix of (quantity, extendedprice, discount)
    * per return flag, from ONE pass of exact decimal moments — the
    * map-side-combinable form of `corr()` (Spark's own `corr` aggregates
    * in streaming double arithmetic whose result depends on partition
    * order; the moment form is partition-order-independent, which is
    * what makes it reproducible on ANY cluster size — the property the
    * oracle hash-check enforces).
    */
  def corrMatrix: Q = (s, d) => {
    // 9 wide-decimal moment aggregates: compute-bound — fan the
    // single-file scan out to task width first
    val m = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dmom(qd).as("sx"), dmom(pd).as("sy"), dmom(dd).as("sz"),
      dmom(s"$qd * $pd").as("sxy"), dmom(s"$qd * $dd").as("sxz"),
      dmom(s"$pd * $dd").as("syz"),
      dmom(s"$qd * $qd").as("sxx"), dmom(s"$pd * $pd").as("syy"),
      dmom(s"$dd * $dd").as("szz"))
    m.selectExpr("l_returnflag",
      s"""stack(3,
         | 'quantity', 'extendedprice', ${corrFormula("sx", "sy", "sxy", "sxx", "syy")},
         | 'quantity', 'discount', ${corrFormula("sx", "sz", "sxz", "sxx", "szz")},
         | 'extendedprice', 'discount', ${corrFormula("sy", "sz", "syz", "syy", "szz")}
         |) AS (var_x, var_y, corr)""".stripMargin)
  }

  /** Per-group least-squares line extendedprice ~ quantity — the
    * distributed `regr_slope`/`regr_intercept` from the same exact
    * moments as [[corrMatrix]], one aggregation pass.
    */
  def regression: Q = (s, d) =>
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dmom(qd).as("sx"), dmom(pd).as("sy"),
      dmom(s"$qd * $pd").as("sxy"), dmom(s"$qd * $qd").as("sxx"))
      .selectExpr("l_returnflag",
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope",
        "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept")

  /** Equi-depth decile assignment (`ntile`) of customers by balance with
    * a unique tie-break, rolled up to per-tile stats.
    *
    * `ntile(10) OVER (ORDER BY ...)` plans a single-partition window —
    * the whole table through one task, dead at 100 TB. This computes the
    * identical tiles distributed: `repartitionByRange` on the ordering
    * key (Spark's sampled range exchange — the same machinery a global
    * sort uses), per-partition row counts (one tiny job; the range
    * shuffle files are reused, not recomputed), then each task assigns
    * exact global ranks from its partition's offset and the closed-form
    * ntile arithmetic (first `n mod k` tiles get `ceil(n/k)` rows). The
    * only driver-side state is one count per partition. Output is
    * independent of where the sampled range bounds fall because the
    * ordering key is made unique by the `c_custkey` tie-break.
    */
  def ntileDeciles: Q = (s, d) => {
    val k = 10
    val ranged = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        col("c_acctbal"), col("c_custkey"))
      .sortWithinPartitions("c_acctbal", "c_custkey")
    // Two jobs consume the ranged RDD (partition sizes, then tiling);
    // without a checkpoint the second job re-runs the range exchange +
    // sort from the scan. localCheckpoint (the q88 pattern) truncates
    // the lineage so the sort runs exactly once — at 100 TB that's the
    // difference between one and two global sorts. Bench unpersists
    // checkpointed blocks after each query, so nothing leaks.
    val rows = ranged.rdd.localCheckpoint()
    val sizes = rows.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val n = offsets.last
    val (q, rem) = (n / k, n % k)
    val tiled = rows.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row =>
        r += 1
        // rank r (1-based) -> ntile: tiles 1..rem hold q+1 rows, rest q.
        // q == 0 keeps the else-branch unreachable (rem*(q+1) == n).
        val tile =
          if (r <= rem * (q + 1)) (r - 1) / (q + 1) + 1
          else rem + (r - rem * (q + 1) - 1) / q + 1
        Row.fromSeq(row.toSeq :+ tile.toInt)
      }
    }
    s.createDataFrame(tiled, ranged.schema.add("tile", IntegerType))
      .groupBy("tile")
      .agg(count(lit(1)).as("n"),
        min("c_custkey").as("min_key"), max("c_custkey").as("max_key"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").as("sum_bal"))
  }

  /** Higher-order array functions over per-order quantity arrays:
    * `aggregate` (fold) for sum and sum-of-squares, `transform` +
    * `array_max` for the scaled max — the codegen'd lambda surface
    * (`functions.aggregate`/`transform`, no UDFs). Quantities are
    * integral by construction, so the folds are exact int64. The oracle
    * computes the same values with plain SQL aggregates — HOF folds
    * over a collected array must equal the relational aggregation.
    */
  def higherOrderFns: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(expr("CAST(l_quantity AS BIGINT)"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).as("n_items"),
        expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("total_qty"),
        expr("aggregate(qs, 0L, (acc, x) -> acc + x * x)").as("sum_sq"),
        expr("array_max(transform(qs, x -> x * 2))").as("max_doubled"))

  /** Calendar gap-fill with forward fill: a generated day spine per user
    * (`sequence` + explode — the dimension comes from the data's own
    * min/max, no driver-side state), left-joined to per-day event
    * counts, nulls forward-filled by `last(_, ignoreNulls)` over the
    * per-user ordered window; leading gaps surface as 0. The spine
    * explode is linear in users × days and co-partitioned with the
    * counts on `user_id`.
    */
  def gapFill: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("ts").cast("date").as("day"))
    // The calendar bounds are ONE row (a distributed min/max agg); fetch
    // them and inline as literals rather than joining them on. The
    // 1-row-to-driver transfer is the same sanctioned shape as the IVF
    // centroid fetch, and it keeps the spine build join-free (a
    // crossJoin here plans as BroadcastNestedLoopJoin, which the
    // suite-wide plan lint rightly rejects everywhere else).
    val bounds = ev.agg(min("day").as("lo"), max("day").as("hi")).head()
    val (lo, hi) = (bounds.getDate(0), bounds.getDate(1))
    val spine = ev.select("user_id").distinct()
      .select(col("user_id"),
        explode(expr(s"sequence(DATE'$lo', DATE'$hi', interval 1 day)")).as("day"))
    val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(last("n", ignoreNulls = true).over(w), lit(0L)).as("filled"))
  }

  /** `max_by`/`min_by` keyed on a unique ordering column (the order key)
    * — the deterministic arg-extremum aggregate (DuckDB `arg_max`).
    * Unique keys make the result well-defined on both engines; ties on
    * a non-unique ordering column are unspecified in BOTH engines,
    * which is exactly why the registered form keys on the primary key.
    */
  def argExtremum: Q = (s, d) =>
    Tables.orders(s, d).groupBy("o_custkey").agg(
      max_by(col("o_orderstatus"), col("o_orderkey")).as("last_status"),
      min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
      max("o_orderkey").as("last_key"),
      min("o_orderkey").as("first_key"))

  /** Time-series downsampling to OHLC candles: per (event_type, day)
    * the first (open), highest, lowest, and last (close) value — the
    * canonical resample step for metrics/financial pipelines. First and
    * last need a TOTAL order: `(ts, event_id)` with the unique id as
    * tiebreak (the corpora carry cross-user same-microsecond events, so
    * ts alone would be engine-dependent). One hash exchange on
    * `(event_type, day)` + one sort serve the ranking windows AND the
    * final aggregate; values are exact cents.
    *
    * At 100 TB, daily candles over a keyed stream are the append-only
    * incremental case: each new day touches only its own partition, and
    * the aggregate's partials merge (max/min/first-by-rank), so the
    * backfill and the nightly increment run the same plan (q130's
    * partial-merge mechanic).
    */
  /** q263: calendar GAP-FILL with forward-fill — the dense-spine
    * transform every reporting layer needs on top of q136's sparse
    * daily series: days with no observations still get a row, carrying
    * the last observed daily close forward (`last(..., ignoreNulls)`
    * over the per-key day order — Spark's forward-fill idiom), with an
    * `is_observed` flag separating carried from real values. The
    * series is PER-ACCOUNT (a deterministic user subset): accounts
    * don't transact every day, so the sparsity the operator exists for
    * is scale-INVARIANT — more corpus means more accounts, not denser
    * per-account days (a per-type series saturates by sf0.01 and the
    * fill never fires). The spine is |accounts| × |days| (`sequence`
    * over the inlined global day span — the sanctioned q118 scalar
    * shape), so the join and window run over spine-sized rows, never
    * event-scale; leading days before an account's first observation
    * are dropped (nothing to carry). Exact integers end to end:
    * epoch-day via `div`, cents, and a deterministic per-day close by
    * the (t_us, event_id) total order q136 established.
    */
  def calendarFill: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("user_id") % 97 === 0)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        unix_micros(col("ts")).as("t_us"), col("event_id"),
        (coalesce(col("value").cast("decimal(18,2)"), lit(0)) * 100)
          .cast("long").as("cents"))
    val daily = ev.groupBy("user_id", "day")
      .agg(max(struct(col("t_us"), col("event_id"), col("cents")))
        .getField("cents").as("obs_cents"))
    val mm = ev.agg(min("day"), max("day")).head()
    // an empty subset has null min/max: the oracle returns zero rows, so
    // mirror that instead of a MatchError on the scalar destructure
    if (mm.isNullAt(0))
      ev.select(col("user_id"), col("day"),
        col("cents").as("close_cents"), lit(1).as("is_observed"))
        .where(lit(false))
    else {
      val (d0, d1) = (mm.getLong(0), mm.getLong(1))
      val spine = ev.select("user_id").distinct()
        .withColumn("day", explode(sequence(lit(d0), lit(d1))))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("close_cents", last("obs_cents", ignoreNulls = true).over(w))
        .where(col("close_cents").isNotNull)
        .select(col("user_id"), col("day"), col("close_cents"),
          col("obs_cents").isNotNull.cast("int").as("is_observed"))
    }
  }

  def ohlc: Q = (s, d) => {
    val w = Window.partitionBy("event_type", "day")
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(full))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        max(when(col("rn") === 1, col("cents"))).as("open"),
        max("cents").as("high"),
        min("cents").as("low"),
        max(when(col("rn") === col("cnt"), col("cents"))).as("close"))
  }

  /** Mergeable distinct-count sketches — THE 100 TB mechanic for
    * distinct users: exact distincts don't merge (q12's shuffle carries
    * every key), but Datasketches HLL partials do. Per (event_type, day)
    * sketches union-merge per event_type, and the merged estimate must
    * equal the directly-built sketch's estimate bit-for-bit (same
    * lgConfigK, associative merge — pinned in AnalyticsSpec along with
    * a ±5% error bound vs the exact count carried alongside).
    *
    * This is q130's partial-merge pattern applied to a non-algebraic
    * aggregate via sketching: daily sketches persist, any date-range
    * distinct-user query is a union of partials — no re-scan. DuckDB
    * has no Datasketches HLL, so the raw estimates can't be oracled;
    * the registered driver form is [[hllMergeDailyChecked]].
    */
  def hllMergeDaily: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val direct = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est_direct"),
        countDistinct(col("user_id")).as("exact"))
    merged.join(direct, "event_type")
  }

  /** Driver-audited form of [[hllMergeDaily]]: the two sketch CONTRACTS
    * as exact oracle booleans — (a) the union of daily partials equals
    * the directly-built sketch (associativity: same lgConfigK, same
    * multiset), (b) the estimate lands within 5% of the exact distinct
    * (lgK=14 → rsd ~0.8%, so 5% ≈ 6σ). DuckDB asserts both as literal
    * TRUE next to its own exact count; any sketch regression flips a
    * bit and the driver hash goes red.
    */
  def hllMergeDailyChecked: Q = (s, d) =>
    hllMergeDaily(s, d).select(col("event_type"), col("exact"),
      (col("est_merged") === col("est_direct")).as("merge_associative"),
      (abs(col("est_merged") - col("exact")) <= col("exact") * lit(0.05))
        .as("est_within_5pct"))

  /** Count-Min sketch frequency estimates — the mergeable FREQUENCY
    * member of the sketch family next to HLL (distinct, q137), KLL
    * (quantiles, q178), theta (set ops, q180) and approx-top-k (q79):
    * a depth×width (4×1024) grid of counters answering "how often did
    * key k appear?" within ε·N (ε ≈ e/width) from kilobytes of state,
    * independent of key cardinality. Expressed RELATIONALLY — the
    * Spark-first form: the sketch IS the bounded (r, c) → count cell
    * table, built by ONE hash aggregation (map-side partials are
    * ≤ depth·width cells each, and cell tables merge by summing —
    * exactly what the final aggregation does, so the sketch is
    * mergeable across partitions/days for free); a probe's estimate is
    * the MIN over its depth cells — an equi-join on (r, c) against the
    * ≤ 4096-row (auto-broadcast) cell table plus a depth-row group-min
    * per key. Every operator codegens; the 100 TB shape is one scan +
    * one 4096-key shuffle. Hashes are deterministic (xxhash64 with the
    * row index mixed in), estimates one-sided: est ≥ true always,
    * because every occurrence of k lands in all `depth` of k's cells.
    */
  private val cmsDepth = 4
  private val cmsWidth = 1024

  private def cmsHashed(df: DataFrame, key: String): DataFrame =
    df.select(col(key), explode(expr(s"sequence(0, ${cmsDepth - 1})")).as("r"))
      .withColumn("c", pmod(xxhash64(col("r"), col(key)), lit(cmsWidth)))

  /** The sketch build + bounded-anchor probe (production form, benched):
    * part-key frequencies estimated for the deterministic q58-style
    * anchor set (l_partkey % 97 = 0 AND < 100000 → ≤ 1031 probes at any
    * scale). Inner join suffices: a probed key that occurs has all its
    * cells present.
    */
  def cmsFrequency: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select("l_partkey")
    val cells = cmsHashed(li, "l_partkey")
      .groupBy("r", "c").agg(count(lit(1)).as("n"))
    val probes = li
      .where(col("l_partkey") % 97 === 0 && col("l_partkey") < 100000)
      .distinct()
    cmsHashed(probes, "l_partkey")
      .join(cells, Seq("r", "c"))
      .groupBy("l_partkey").agg(min("n").as("est_n"))
  }

  /** Driver-audited form of [[cmsFrequency]] (registered): per probe
    * key, the exact count plus the two CMS contracts as oracle
    * booleans — (a) one-sidedness, est ≥ exact (deterministic, by
    * construction); (b) the ε·N error bound, est − exact ≤ e·N/width
    * (the textbook Markov bound; holds per row-hash with prob 1−1/e,
    * and the min over 4 seeded rows clears it with wide margin on this
    * corpus — verified at every shipped sf). DuckDB recomputes the
    * exact counts and asserts both booleans literal TRUE.
    */
  def cmsFrequencyChecked: Q = (s, d) => {
    val streamN = Tables.lineitem(s, d).count()
    val epsBound = (2718L * streamN) / (1000L * cmsWidth)
    val exact = Tables.lineitem(s, d)
      .where(col("l_partkey") % 97 === 0 && col("l_partkey") < 100000)
      .groupBy("l_partkey").agg(count(lit(1)).as("exact_n"))
    cmsFrequency(s, d).join(exact, Seq("l_partkey"))
      .select(col("l_partkey"), col("exact_n"),
        (col("est_n") >= col("exact_n")).as("ge_ok"),
        (col("est_n") - col("exact_n") <= lit(epsBound)).as("le_ok"))
  }

  /** Share-of-total (ratio-to-report): each priority's revenue as an
    * exact ppm share of the grand total. The unpartitioned window runs
    * AFTER the aggregation, over group-count rows — the safe place for
    * a global window (a per-row global window would be the classic
    * single-task trap; here the aggregate reduced the table first).
    */
  def shareOfTotal: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"))
      .withColumn("share_ppm",
        expr("cents_sum * 1000000 div sum(cents_sum) OVER ()"))

  /** Deterministic mode: the most frequent return flag per line status,
    * ties broken by the smaller flag value (built-in `mode()` leaves
    * ties unspecified on BOTH engines, so the registered form derives
    * it from counts + a total-order rank — same two-aggregation shape,
    * fully reproducible).
    */
  def modeDeterministic: Q = (s, d) => {
    val w = Window.partitionBy("l_linestatus")
      .orderBy(col("cnt").desc, col("l_returnflag").asc)
    Tables.lineitem(s, d)
      .groupBy("l_linestatus", "l_returnflag")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("l_linestatus"), col("l_returnflag").as("mode_flag"), col("cnt"))
  }

  /** Period-over-period deltas — the reporting primitive behind every
    * "up X% MoM" number: monthly revenue per priority, each month's
    * absolute and exact-ppm change vs the prior month (`lag` over the
    * month series; first month stays null on both engines). Aggregate
    * first, window after — the lag runs over month-count rows.
    */
  def periodOverPeriod: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority").orderBy("month")
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .withColumn("prev_cents", lag("cents", 1).over(w))
      .select(col("o_orderpriority"), col("month"), col("cents"),
        (col("cents") - col("prev_cents")).as("delta_cents"),
        expr("(cents - prev_cents) * 1000000 div prev_cents").as("change_ppm"))
  }

  /** Linear interpolation resample — q118's gap fill carries the LAST
    * observation forward; this carries the TREND: each user's missing
    * days between their first and last active day get
    * `prev + (next − prev) · (day − prev_day) div (next_day − prev_day)`
    * in exact integer cents (both engines truncate integer division
    * toward zero — negative slopes included, same guarantee q149
    * leans on). The bracketing observations come from two one-pass
    * IGNORE NULLS windows over the per-user spine (no self-join per
    * gap); the spine itself is per-user `sequence(min_day, max_day)`
    * exploded after the aggregate, so endpoints are always observed and
    * every gap is bracketed. The daily observation is max(cents) — the
    * interpolation mechanics, not the pick, are the operator.
    */
  def interpolate: Q = (s, d) => {
    val obs = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("user_id", "day").agg(max("cents").as("v"))
    val spine = obs.groupBy("user_id")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val back = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(obs, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("v"),
        last("v", ignoreNulls = true).over(back).as("pv"),
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(back).as("pd"),
        first("v", ignoreNulls = true).over(fwd).as("nv"),
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(fwd).as("nd"))
      .select(col("user_id"), col("day"), col("v").isNotNull.as("is_obs"),
        when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + expr(
            "((nv - pv) * datediff(day, pd)) div datediff(nd, pd)"))
          .as("cents"))
  }

  /** RFM segmentation — the classic customer scoring: recency (days
    * since last order), frequency (order count) and monetary (lifetime
    * cents), each binned 1–5 by its EXACT quintile breakpoints
    * (`percentile`, the same bit-for-bit `quantile_cont` parity q64
    * pins). The thresholds are ONE aggregate row fetched and inlined as
    * literals (the sanctioned q118/IVF shape — a crossJoin would plan
    * the BroadcastNestedLoopJoin the suite lint rejects), so scoring is
    * a scan-local projection: no window, no global sort — at 100 TB the
    * only shuffles are the per-customer aggregate and the one-row
    * threshold pass. Bins are value-based (ties share a bin), direction
    * uniform (1 = low), segment = r·100 + f·10 + m.
    */
  def rfm: Q = (s, d) => {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    val maxD = Tables.orders(s, d)
      .agg(max(col("o_orderdate").cast("date")).cast("string")).head().getString(0)
    val cust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(datediff(lit(maxD).cast("date"), max(col("o_orderdate").cast("date")))
        .cast("long").as("recency"),
        count(lit(1)).as("freq"), sum(cents).as("monetary"))
    val qs = "array(0.2, 0.4, 0.6, 0.8)"
    val t = cust.selectExpr(s"percentile(recency, $qs) AS tr",
        s"percentile(freq, $qs) AS tf", s"percentile(monetary, $qs) AS tm")
      .head()
    def bin(c: String, th: Seq[Double]) =
      th.map(x => when(col(c) > lit(x), 1).otherwise(0)).reduce(_ + _) + lit(1)
    def ths(i: Int) = t.getSeq[Double](i)
    cust.select(col("o_custkey"), col("recency"), col("freq"), col("monetary"),
        bin("recency", ths(0)).as("r_bin"), bin("freq", ths(1)).as("f_bin"),
        bin("monetary", ths(2)).as("m_bin"))
      .withColumn("segment",
        col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
  }

  /** Market-basket co-occurrence mining — the association-rule primitive
    * (support / confidence / lift) over order baskets: which brand pairs
    * ship together more often than chance. Baskets are the distinct
    * (order, brand) pairs; candidate pairs come from a basket self-join
    * keyed on the order key, so the expansion is bounded by the square
    * of the basket width (~4 brands/order here), never by the table.
    * The 2.2%-of-orders support floor (inside the observed support range
    * at every sf, so the pruning is LIVE — it drops roughly the bottom
    * half of pairs, never none and never all) prunes noise pairs BEFORE
    * the stats joins. All three scores are exact ppm integers: lift's
    * `n_pair · N · 10⁶` peaks ≈ 2e16 at sf0.1 — inside BIGINT; a 100 TB
    * corpus widens that one product to DECIMAL(38,0), same plan. The
    * brand-count join sides are brand-cardinality-sized (tiny —
    * broadcast). N (orders with a basket) is one aggregate row inlined
    * as a literal, the sanctioned q118 shape.
    *
    * The basket relation itself — the distinct (order, brand)
    * "transactions table" every association miner materializes before
    * mining — is a fingerprint-keyed derived artifact
    * ([[ensureBaskets]], warmed by `Scale.warmDerived`): built once by
    * the lineitem ⋈ part join + distinct, then probed by this query for
    * BOTH the pair expansion and the N count. Before the
    * materialization the live query executed that join + distinct three
    * times (the N count action, and both sides of the self-join);
    * measured 2.73 s → 1.14 s at sf0.1 (the residual is the pair
    * expansion + the N count, both over the artifact). N derived from
    * the artifact
    * keeps the q159 invariant: an orphan l_partkey shrinks N exactly as
    * it shrinks the baskets.
    */
  private val basketsLock = new Object

  def ensureBaskets(s: SparkSession, d: String): String =
    Tables.ensureParquetArtifact(basketsLock,
      s"${Tables.scratchDir}/graft-baskets-${Tables.datasetTag(d, "lineitem", "part")}") {
      Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
        .join(Tables.part(s, d).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")).distinct()
        // layout pinned independent of the building JVM
        .repartition(8, col("l_orderkey"))
    }

  def basketPairs: Q = (s, d) => {
    val baskets = s.read.parquet(ensureBaskets(s, d))
    // N = orders with a basket = orders with ≥1 PART-RESOLVING lineitem
    // = exactly the artifact's distinct order keys
    val nOrders = baskets.select("l_orderkey").distinct().count()
    val counts = baskets.groupBy("p_brand").agg(count(lit(1)).as("n_item"))
    val pairs = baskets.toDF("l_orderkey", "b1")
      .join(baskets.toDF("l_orderkey", "b2"), "l_orderkey")
      .where(col("b1") < col("b2"))
      .groupBy("b1", "b2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") * lit(1000000L) >= lit(nOrders) * lit(22000L))
    pairs
      .join(broadcast(counts.select(col("p_brand").as("b1"), col("n_item").as("n_b1"))), "b1")
      .join(broadcast(counts.select(col("p_brand").as("b2"), col("n_item").as("n_b2"))), "b2")
      .select(col("b1"), col("b2"), col("n_pair"), col("n_b1"), col("n_b2"),
        expr(s"n_pair * 1000000L div ${nOrders}L").as("support_ppm"),
        expr("n_pair * 1000000L div n_b1").as("confidence_ppm"),
        expr(s"n_pair * ${nOrders}L * 1000000L div (n_b1 * n_b2)").as("lift_ppm"))
  }

  /** Time-weighted average (TWAP) over each user's irregular event
    * series: each observation holds until the next one, so the mean is
    * `Σ vᵢ·Δtᵢ div Σ Δtᵢ` — NOT the row mean, which over-weights bursts.
    * Exact integers end to end: cents × whole-second holds (`unix
    * micros div 10⁶` — both engines floor non-negative epochs the same
    * way); the order is made total by the (ts, event_id) tie-break the
    * q136 OHLC oracle established. One window sort per user for the
    * `lead`, one aggregation — both partitioned on `user_id`, nothing
    * global. Same-second-only users (zero span) are excluded on both
    * sides rather than divided by zero.
    */
  def twap: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("t", expr("unix_micros(ts) div 1000000L"))
      .withColumn("dt", lead("t", 1).over(w) - col("t"))
      .where(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_holds"), sum("dt").as("span_secs"),
        sum(expr("cents * dt")).as("weighted_cents_secs"))
      .where(col("span_secs") > 0)
      .withColumn("twap_cents",
        expr("weighted_cents_secs div span_secs"))
  }

  /** Chi-squared test of independence between customer segment and
    * order priority — the categorical-correlation audit a feature
    * pipeline runs before trusting a crosstab. Per-cell contribution
    * `(O−E)²/E` with `E = rowTot·colTot/N` is computed WITHOUT floats:
    * multiply through by `N` → `(O·N − rt·ct)² · 10⁶ div (rt·ct·N)` in
    * DECIMAL(38,0) (the squared term peaks ~1e22 at sf0.1 — beyond
    * BIGINT, inside 38 digits), so both engines agree bit-for-bit; the
    * statistic is the sum of the 25 contributions. Row/column/grand
    * totals come from windows over the CELL table (cardinality =
    * |segments|·|priorities|), the safe place for unpartitioned windows
    * — the raw join never sees a window.
    */
  def chiSquare: Q = (s, d) => {
    val cells = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
      .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    cells
      .withColumn("rt", sum("o").over(Window.partitionBy("c_mktsegment")))
      .withColumn("ct", sum("o").over(Window.partitionBy("o_orderpriority")))
      .withColumn("n", sum("o").over(Window.partitionBy()))
      .withColumn("contrib_ppm", expr(
        """((cast(o as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)
          | * (cast(o as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)
          | * 1000000) div (cast(rt as decimal(38,0)) * ct * n)""".stripMargin))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("o"),
        col("rt"), col("ct"), col("contrib_ppm"))
  }

  /** EWMA-style trailing smoother with binary weights — the time-series
    * denoiser: each event's smoothed value is the weight-2^(7−k) average
    * of its last ≤8 observations (`wₖ = 2⁷⁻ᵏ` ≈ the α=½ EWMA truncated
    * at 8 taps). Binary weights keep it EXACT in int64 — the float
    * `α(1−α)ᵏ` recursion can never hash-match across engines, this
    * does: `Σ vₖ·2⁷⁻ᵏ div Σ 2⁷⁻ᵏ` over the taps that exist (series
    * heads use the weights present, no padding bias). All 7 lags share
    * ONE window sort per user; output is per-event, co-partitioned with
    * the source.
    */
  def ewmaSmooth: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val base = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val lagged = (1 until 8).foldLeft(base) { (df, k) =>
      df.withColumn(s"v$k", lag(col("cents"), k).over(w))
    }
    def wt(k: Int): Long = 1L << (7 - k)
    val num = (1 until 8)
      .map(k => expr(s"coalesce(v$k, 0L) * ${wt(k)}L"))
      .foldLeft(expr(s"cents * ${wt(0)}L"))(_ + _)
    val den = (1 until 8)
      .map(k => expr(s"if(v$k is null, 0L, ${wt(k)}L)"))
      .foldLeft(expr(s"${wt(0)}L"))(_ + _)
    lagged.withColumn("num", num).withColumn("den", den)
      .select(col("user_id"), col("ts"), col("event_id"), col("cents"),
        expr("num div den").as("ewma_cents"))
  }

  /** Exact weighted median (robust central tendency): per return flag,
    * the lower weighted median of extended price in cents, weighted by
    * quantity — the smallest value v where the cumulative weight of all
    * values ≤ v reaches half the total weight. Unlike the float
    * `percentile(col, 0.5, weight)` this is integer-exact on both
    * engines (2·cumw ≥ tot avoids any division at all).
    *
    * Scale shape: the table first collapses to one row per DISTINCT
    * (group, value) (one keyed shuffle), then [[cumWeights]] computes
    * the running weight with the two-level distributed prefix sum —
    * wide in-bucket windows + a tiny bucket-offset pass — so NO task
    * ever sorts a whole group (a plain cumulative window would run one
    * task per return flag at every scale).
    */
  /** Distributed cumulative weights — the two-level prefix-sum that
    * keeps a running total PARALLEL: a naive
    * `sum() OVER (PARTITION BY group ORDER BY value)` sorts each
    * group in ONE task (3 tasks total here, one per return flag — the
    * single-partition-window trap at any scale). Instead: (1) in-bucket
    * running sums run wide, partitioned by (group, value div 2¹⁶);
    * (2) bucket totals prefix-sum on the |groups|·|buckets| table
    * (hundreds of rows — trivially small); (3) the per-value running
    * total is bucket-offset + in-bucket cumulative, reassembled via a
    * broadcast join. Input `per`: one row per distinct (group, value)
    * with weight `w`; output adds `cumw` (inclusive running weight) and
    * `tot` (group total).
    */
  /** [[cumWeights]] variant that ALSO returns the eagerly-checkpointed
    * distinct-(group, value) base it builds internally (r18): consumers
    * whose final aggregate is a pure function of the DISTRIBUTION —
    * q172's clamped mean, q176's outlier counts — aggregate that
    * checkpointed base directly (weighted by `w`) instead of re-scanning
    * the fact table a second or third time. Unlike the r17 reverted
    * attempt, no window re-derivation is involved: the base carries no
    * cumulative columns, so the saved row-scale pass is a pure win.
    */
  private[ops] def cumWeightsWithBase(per: DataFrame, grp: String,
      bucketWidth: Long = 65536L): (DataFrame, DataFrame) = {
    // `withB` (distinct-(group, value)-sized) feeds BOTH the bucket
    // aggregate and the final reassembly join below — an eager
    // checkpoint executes the upstream distinct aggregate once instead
    // of once per consumer (q269's lineage lesson). Measured 5-pass
    // A/B: q167 2.40 → 1.87 s (its per relation is a wide lineitem
    // distinct); neutral on small per relations (q176 2.78 vs 2.76 —
    // checkpoint overhead ≈ the rescan it saves), so the net across
    // the 14 call sites is positive. Checkpointing the RAW projected
    // scans one level up measured WORSE (q176 2.49 → 2.85 — the q126
    // cache-vs-rereference finding again): only the post-aggregate,
    // multiply-consumed relation is worth materializing.
    val withB = per.withColumn("bucket", expr(s"cents div $bucketWidth"))
      .localCheckpoint(true)
    val bkt = withB.groupBy(grp, "bucket").agg(sum("w").as("bw"))
    val prevB = Window.partitionBy(grp).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bkt
      .withColumn("offset", coalesce(sum("bw").over(prevB), lit(0L)))
      .withColumn("tot", sum("bw").over(Window.partitionBy(grp)))
      .select(col(grp), col("bucket"), col("offset"), col("tot"))
    val inB = Window.partitionBy(grp, "bucket").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val assembled = withB
      .withColumn("incum", sum("w").over(inB))
      .join(broadcast(offsets), Seq(grp, "bucket"))
      .withColumn("cumw", col("offset") + col("incum"))
    (assembled, withB)
  }

  private[ops] def cumWeights(per: DataFrame, grp: String,
      bucketWidth: Long = 65536L): DataFrame =
    cumWeightsWithBase(per, grp, bucketWidth)._1

  /** POINT quantiles from the two-level prefix sum WITHOUT the
    * distribution-wide window (r18, guide §2.5): a lower-discrete
    * quantile — the smallest value whose cumulative weight satisfies
    * `cumw·a ≥ tot·b` — lives in the single bucket per group where the
    * end-of-bucket cumulative first crosses the threshold (earlier
    * buckets cannot qualify; later buckets hold only larger values).
    * So the in-bucket running sum runs over the TARGET buckets' rows
    * only (distribution/|buckets| rows) instead of exchanging, sorting
    * and windowing the whole distinct-value distribution — which for
    * near-unique values (prices, deviations) is fact-sized. Thresholds
    * are (tag, a, b) triples; returns ((grp, tag, cents, tot) — one
    * row per group × threshold — and the checkpointed distribution
    * base for consumers that also aggregate over it). Identical values
    * to filtering [[cumWeights]]: cumw inside the target bucket is
    * offset + the same in-bucket running sum, and the bucket's last
    * row always crosses, so the per-group min is never lost.
    */
  private[ops] def quantilePoints(per: DataFrame, grp: String,
      bucketWidth: Long, thresholds: Seq[(String, Long, Long)])
      : (DataFrame, DataFrame) = {
    val withB = per.withColumn("bucket", expr(s"cents div $bucketWidth"))
      .localCheckpoint(true)
    val bkt = withB.groupBy(grp, "bucket").agg(sum("w").as("bw"))
    val prevB = Window.partitionBy(grp).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bkt
      .withColumn("offset", coalesce(sum("bw").over(prevB), lit(0L)))
      .withColumn("tot", sum("bw").over(Window.partitionBy(grp)))
    // all thresholds ride ONE pass over the tiny offsets table (an
    // explode, not a union — a union branch per threshold re-ran the
    // bucket aggregate per branch)
    val thArr = array(thresholds.map { case (tag, a, b) =>
      struct(lit(tag).as("tag"), lit(a).as("a"), lit(b).as("b")) }: _*)
    val tgt = offsets
      .select(col(grp), col("bucket"), col("offset"), col("tot"),
        col("bw"), explode(thArr).as("th"))
      .where((col("offset") + col("bw")) * col("th.a") >=
        col("tot") * col("th.b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(grp), col("th.tag")).orderBy("bucket")))
      .where(col("rn") === 1)
      .select(col(grp), col("bucket"), col("offset"), col("tot"),
        col("th.tag").as("tag"), col("th.a").as("a"), col("th.b").as("b"))
    val inB = Window.partitionBy(grp, "tag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val res = withB.join(broadcast(tgt), Seq(grp, "bucket"))
      .withColumn("cumw", col("offset") + sum("w").over(inB))
      .where(col("cumw") * col("a") >= col("tot") * col("b"))
      .groupBy(col(grp), col("tag"))
      .agg(min("cents").as("cents"), max("tot").as("tot"))
    (res, withB)
  }

  def weightedMedian: Q = (s, d) => {
    val per = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        col("l_quantity").cast("decimal(18,2)").cast("long").as("qty"))
      .groupBy("l_returnflag", "cents").agg(sum("qty").as("w"))
    // r18: the median is one POINT quantile — the distribution-wide
    // window (exchange + sort of the near-unique price distribution)
    // collapses to the target bucket's rows via [[quantilePoints]]
    quantilePoints(per, "l_returnflag", 65536L, Seq(("med", 2L, 1L)))._1
      .select(col("l_returnflag"), col("cents").as("wmedian_cents"),
        col("tot").as("total_weight"))
  }

  /** Winsorized mean (outlier-robust mean): per return flag, clamp
    * extended-price cents to the [p05, p95] discrete quantiles, then the
    * exact integer mean of the clamped values. The quantile is the
    * LOWER discrete quantile — smallest value whose cumulative count
    * reaches ⌈q·n⌉ — computed with the same cumulative-count window on
    * both engines (no float interpolation anywhere, so the clamped sum
    * is bit-exact).
    *
    * Scale shape: quantiles come from the same two-level distributed
    * prefix sum as q167 ([[cumWeights]] — no single-task group sort);
    * the resulting |groups|-row bounds table broadcast-joins back to
    * the fact scan, and the clamped mean is one partial+final hash
    * aggregate over it.
    */
  def winsorizedMean: Q = (s, d) => {
    val base = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"))
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val per = base.groupBy("l_returnflag", "cents")
      .agg(count(lit(1)).as("w"))
    // r18 (VERDICT item 5): the clamped mean is a pure function of the
    // (flag, cents, w) DISTRIBUTION, which cumWeights already
    // checkpoints — so the final aggregate runs over that in-memory
    // base (Σ clamp(v)·w) instead of a third row-scale pass (scan +
    // fanOut exchange + broadcast join over the fact table). The r17
    // attempt that lost (2.91 → 3.07) re-derived the WINDOWED
    // cumWeights output per consumer; the checkpointed base carries no
    // windows, so only the saved scan remains. Bit-identical: n = Σw,
    // winsor_sum = Σ clamp(cents)·w over exactly the same rows.
    val (qp, perChk) = quantilePoints(per, "l_returnflag", 65536L,
      Seq(("p05", 100L, 5L), ("p95", 100L, 95L)))
    val bounds = qp
      .groupBy("l_returnflag")
      .agg(
        max(when(col("tag") === "p05", col("cents"))).as("p05_cents"),
        max(when(col("tag") === "p95", col("cents"))).as("p95_cents"))
    perChk.join(broadcast(bounds), "l_returnflag")
      .withColumn("clamped",
        greatest(least(col("cents"), col("p95_cents")), col("p05_cents")))
      .groupBy("l_returnflag")
      .agg(sum("w").as("n"),
        max("p05_cents").as("p05_cents"), max("p95_cents").as("p95_cents"),
        sum(col("clamped") * col("w")).as("winsor_sum_cents"))
      .withColumn("winsor_mean_cents",
        expr("winsor_sum_cents div n"))
  }

  /** MAD robust outliers: flag values whose absolute deviation from the
    * per-type median exceeds 3× the median absolute deviation — the
    * robust sibling of q121's 2σ z-score (one far outlier inflates a
    * stddev until it hides every other outlier; the median/MAD pair is
    * breakdown-resistant). Both medians are the LOWER median, so the
    * whole chain is integer-exact.
    *
    * Scale shape: two [[cumWeights]] cascades (each: keyed distinct
    * aggregate + wide two-level prefix sum), each reduced to a
    * |types|-row table that broadcast-joins back to the fact scan —
    * the raw log is scanned twice, never sorted whole.
    */
  def madOutliers: Q = (s, d) => {
    val b = Tables.fanOut(Tables.events(s, d), col("event_id"))
      .where(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // r18 (VERDICT item 5): the whole median→MAD→outlier-count chain is
    // a pure function of the (type, cents, w) DISTRIBUTION, which the
    // median cumWeights checkpoints — so the event log is scanned ONCE
    // (this groupBy), and both the deviation distribution (group the
    // value distribution by |cents − med|, summing weights — identical
    // to grouping the raw rows) and the final counts (n = Σw,
    // n_outliers = Σ w·[dv > 3·mad]) derive from checkpointed
    // distribution tables. The r17 attempt that lost (2.34 → 2.61)
    // re-derived the WINDOWED cumWeights output per consumer; the
    // checkpointed base carries no windows.
    val (medQp, perChk) = quantilePoints(
      b.groupBy("event_type", "cents").agg(count(lit(1)).as("w")),
      "event_type", 4096L, Seq(("med", 2L, 1L)))
    val med = medQp.select(col("event_type"), col("cents").as("med_cents"))
    val dev = perChk.join(broadcast(med), "event_type")
      .groupBy(col("event_type"),
        abs(col("cents") - col("med_cents")).as("cents"))
      .agg(sum("w").as("w"))
    val (madQp, devChk) = quantilePoints(dev, "event_type", 4096L,
      Seq(("med", 2L, 1L)))
    val mad = madQp.select(col("event_type"), col("cents").as("mad_cents"))
    devChk.join(broadcast(mad), "event_type")
      .join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(sum("w").as("n"),
        sum(when(col("cents") > col("mad_cents") * 3, col("w"))
          .otherwise(0L)).as("n_outliers"),
        max("med_cents").as("med_cents"), max("mad_cents").as("mad_cents"))
  }

  /** Cohort LTV curve: per signup-week cohort, weekly purchase revenue
    * and its running total by week offset — the lifetime-value ramp
    * (q107's retention counts upgraded to exact revenue cents).
    *
    * Scale shape: one user-keyed aggregate for cohorts, one user-keyed
    * join + (cohort, offset) aggregate for revenue cells; the running
    * total then cumulates over the CELL table (|cohorts|·|weeks| rows —
    * the safe place for a cumulative window, no prefix-sum machinery
    * needed because the window input is aggregate-sized).
    */
  def ltvCurve: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t0"))
      .select(col("user_id"),
        date_trunc("week", col("t0")).cast("date").as("cohort_week"))
    val cells = ev.where(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .where(col("ts") >= col("cohort_week").cast("timestamp"))
      .groupBy(col("cohort_week"),
        expr("cast(datediff(date_trunc('week', ts), cohort_week) div 7 as bigint)")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("rev_cents"))
    cells.withColumn("cum_rev_cents",
      sum("rev_cents").over(Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Mergeable quantile sketches (KLL, k=200): per-day sketches of the
    * event values union-merge to the global per-type quantile summary —
    * q137's HLL daily-merge pattern, for percentiles. This is the
    * 100 TB incremental path q64/q73 point at: yesterday's sketches
    * never get recomputed, today's partition adds one bounded-size
    * sketch, and the merge is a few-KB reduce. Rows-only (KLL
    * compaction is randomized); rank-error tolerance and the
    * merge-vs-direct agreement are pinned in AnalyticsSpec.
    *
    * The sketch aggregates are native `TypedImperativeAggregate`s
    * ([[graft.functions.KllBuildSketch]]/[[graft.functions.KllMergeSketch]]
    * — live heap sketch between rows, serialize only at shuffle
    * boundaries); estimate extraction is a driver-side UDF over the
    * |types| result blobs (cold path by construction).
    */
  def kllQuantiles: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val ev = Tables.fanOut(Tables.events(s, d), col("event_id"))
      .where(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val daily = ev.groupBy("event_type", "day")
      .agg(expr("kll_build(cents, 200)").as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(expr("kll_merge(sk, 200)").as("msk"),
        count(lit(1)).as("n_days"))
    val direct = ev.groupBy("event_type")
      .agg(expr("kll_build(cents, 200)").as("dsk"), count(lit(1)).as("n"))
    val ranks = Array(0.25, 0.5, 0.75, 0.9, 0.99)
    // comma-joined string, not Array[Long]: array output columns crash
    // the driver's pandas sort (q65 rule — flat final schemas only)
    val quantiles = udf { (blob: Array[Byte]) =>
      val sk = org.apache.datasketches.kll.KllLongsSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(blob))
      ranks.map(r => sk.getQuantile(r)).mkString(",")
    }
    merged.join(direct, "event_type")
      .select(col("event_type"), col("n"), col("n_days"),
        quantiles(col("msk")).as("merged_q"),
        quantiles(col("dsk")).as("direct_q"))
  }

  /** Driver-audited form of [[kllQuantiles]]: a RANK check per estimate
    * (q73's trick). Each of the five quantiles from BOTH the merged and
    * the directly-built sketch is graded by counting rows ≤ the
    * returned value against its target rank ±5% (the AnalyticsSpec
    * bound; KLL k=200 guarantees ~1.65% single-sided) — one filtered
    * re-aggregation against the broadcast 5·|types|-row estimate table,
    * no exact sort anywhere. DuckDB recomputes the exact row/day counts
    * and asserts the two audit booleans as literal TRUE.
    */
  def kllQuantilesChecked: Q = (s, d) => {
    val sk = kllQuantiles(s, d)
    // re-align the flat comma-joined estimates with their target ranks
    val z = sk.select(col("event_type"), col("n"), col("n_days"),
        posexplode(expr(
          """zip_with(split(merged_q, ','), split(direct_q, ','),
            |  (m, dd) -> struct(cast(m as bigint) as mq, cast(dd as bigint) as dq))"""
            .stripMargin)).as(Seq("pos", "p")))
      .select(col("event_type"), col("n"), col("n_days"), col("pos"),
        col("p.mq").as("mq"), col("p.dq").as("dq"),
        element_at(expr("array(25L, 50L, 75L, 90L, 99L)"), col("pos") + 1)
          .as("r100"))
    val ev = Tables.events(s, d).where(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    ev.join(broadcast(z), "event_type")
      .groupBy("event_type", "pos")
      .agg(max("n").as("n"), max("n_days").as("n_days"), max("r100").as("r100"),
        sum(when(col("cents") <= col("mq"), 1L).otherwise(0L)).as("le_m"),
        sum(when(col("cents") <= col("dq"), 1L).otherwise(0L)).as("le_d"))
      .groupBy("event_type")
      .agg(max("n").as("n"), max("n_days").as("n_days"),
        min(col("le_m") * 100 >= (col("r100") - 5) * col("n") &&
          col("le_m") * 100 <= (col("r100") + 5) * col("n"))
          .as("merged_ranks_ok"),
        min(col("le_d") * 100 >= (col("r100") - 5) * col("n") &&
          col("le_d") * 100 <= (col("r100") + 5) * col("n"))
          .as("direct_ranks_ok"))
  }

  /** Audience overlap via theta sketches: |users(A) ∩ users(B)| for
    * every event-type pair — the set-ALGEBRA question HLL (q137) cannot
    * answer (HLL unions only; theta sketches intersect). One bounded
    * sketch per type replaces the exact distinct-intersection join; at
    * 100 TB the sketch aggregation is one keyed shuffle of KB-sized
    * state, and the pair algebra runs on |types| collected blobs driver
    * -side (cold path — the same aggregate-sized-collect rule as q54's
    * centroids). The exact intersection rides along as an equi
    * self-join on user for the error pin; accuracy pinned in
    * AnalyticsSpec, and the registered driver form is
    * [[audienceOverlapChecked]].
    */
  def audienceOverlap: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    // high-value audiences (value ≥ 150): every user touches every
    // event type in this corpus, so the UNFILTERED pairwise overlap is
    // degenerately |users|; the value gate keeps each audience a proper,
    // varying subset at every sf (27–43 of 150 users at sf0.01)
    val ev = Tables.fanOut(Tables.events(s, d), col("event_id"))
      .where(col("value") >= 150)
      .select("event_type", "user_id")
    val blobs = ev.groupBy("event_type")
      .agg(expr("theta_build(user_id)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    val est = (for {
      (ta, ba) <- blobs; (tb, bb) <- blobs if ta < tb
    } yield (ta, tb, math.round(
      graft.functions.ThetaSketchAgg.intersectEstimate(ba, bb))))
      .toSeq.toDF("type_a", "type_b", "est_overlap")
    val ut = ev.distinct()
    val exact = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    // est drives the join (ADVICE r08): the sketch table carries EVERY
    // type pair, the exact join only pairs with overlap >= 1 — an inner
    // join would silently drop a theta false positive on a truly
    // disjoint pair instead of grading it, so left-join exact on and
    // coalesce its count to 0
    est.join(broadcast(exact), Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"),
        col("est_overlap"))
  }

  /** Driver-audited form of [[audienceOverlap]]: theta-sketch set
    * algebra graded against the exact intersection. Below the sketch's
    * k=4096 capacity theta stores the raw hash set, so estimates are
    * exact here; the audit bound still allows max(2, 5%) slack so the
    * bit keeps meaning once a bigger corpus pushes the sketch into
    * estimation mode. The estimate side DRIVES the row set, so a
    * truly-disjoint pair is graded too (a theta false positive there
    * must land within the ±2 absolute slack or flip the bit) instead
    * of vanishing from an inner join. DuckDB recomputes the exact
    * overlap for every type pair (coalesced to 0) and asserts the
    * bound as literal TRUE.
    */
  def audienceOverlapChecked: Q = (s, d) =>
    audienceOverlap(s, d).select(col("type_a"), col("type_b"),
      col("exact_overlap"),
      (abs(col("est_overlap") - col("exact_overlap")) <=
        greatest(lit(2.0), col("exact_overlap") * lit(0.05)))
        .as("theta_within_5pct"))

  /** Equi-depth (equi-height) histogram — the optimizer-statistics /
    * data-profiling sibling of q77's equi-WIDTH histogram: 10 bins of
    * (near-)equal row count over order totals, boundaries at the exact
    * lower-discrete deciles. Equi-depth is what cost-based optimizers
    * store (ANALYZE ... FOR COLUMNS) because equal-width bins collapse
    * under skew.
    *
    * Scale shape: decile boundaries come from [[cumWeights]] (wide
    * two-level prefix sum), reduce to NINE values fetched driver-side
    * and inlined as literals (the q118 shape — no one-row cross join,
    * no BNLJ); binning is then a scan-local projection + one hash
    * aggregate. Ties go to the lower bin (`>` against each boundary)
    * identically on both engines.
    */
  def equidepthHistogram: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val per = base.withColumn("g", lit("all"))
      .groupBy("g", "cents").agg(count(lit(1)).as("w"))
    // r18: the nine decile edges are POINT quantiles — quantilePoints
    // windows only the nine target buckets instead of sorting the whole
    // near-unique price distribution (same 9-scalar collect shape)
    val qp = quantilePoints(per, "g", 65536L,
      (1 to 9).map(i => (s"b$i", 10L, i.toLong)))._1
    val bm = qp.collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val bs = (1 to 9).map(i => bm(s"b$i"))
    val binExpr = bs.map(b => s"(case when cents > ${b}L then 1 else 0 end)")
      .mkString(" + ")
    base
      .withColumn("bin", expr(s"cast($binExpr as bigint)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), min("cents").as("min_cents"),
        max("cents").as("max_cents"), sum("cents").as("sum_cents"))
  }

  /** Hierarchical contribution shares: revenue by (region, nation) with
    * each nation's exact-ppm share of its region and each region's
    * share of the total — the drill-down contribution report OLAP
    * frontends build on rollups, with the shares computed at the right
    * level instead of leaving ratio math to the client.
    *
    * Scale shape: the 4-way star join broadcasts the dims; the three
    * aggregation levels (nation, region, grand) are grouping-set-sized
    * tables, and the share joins touch only those — all window-free,
    * every division integer.
    */
  def rollupShares: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val byNation = rev.groupBy("region", "nation")
      .agg(sum("cents").as("rev_cents"))
    val byRegion = byNation.groupBy("region")
      .agg(sum("rev_cents").as("region_cents"))
    val total = byRegion.agg(sum("region_cents").as("total_cents"))
      .head().getLong(0)
    byNation.join(broadcast(byRegion), "region")
      .select(col("region"), col("nation"), col("rev_cents"),
        expr("rev_cents * 1000000L div region_cents")
          .as("share_of_region_ppm"),
        expr(s"region_cents * 1000000L div ${total}L")
          .as("region_share_ppm"))
  }

  /** Embedding drift audit: per source, the L1 distance (in ppm of a
    * quantized unit) between the source's mean embedding and the corpus
    * mean — the vector-space sibling of q174's histogram TVD (is one
    * ingest source drifting away from the corpus centroid?). Everything
    * stays integer-exact: vectors quantize through the q45 family's
    * `round(x·10⁴)`; each dimension's mean difference is the
    * common-denominator quotient `|s_src·n_corp − s_corp·n_src|·10⁶ div
    * (n_src·n_corp)` — abs BEFORE the integer division, so floor (DuckDB
    * `//`) and truncate (Spark `div`) agree, and the per-dim value is
    * ≤ 2·10¹⁰, so the 64-dim sum sits comfortably in BIGINT on both
    * engines (no HUGEINT/DECIMAL output — driver hash is type-sensitive).
    *
    * Scale shape: posexplode to (doc, dim, val) rows — 64× the vector
    * count, embarrassingly parallel — then one (source, dim) aggregate;
    * the drift math runs on |sources|·64 rows.
    */
  def embeddingDrift: Q = (s, d) => {
    val dims = Tables.embeddings(s, d)
      .join(Tables.documents(s, d).select("doc_id", "source"),
        col("vec_id") === col("doc_id"))
      .select(col("source"),
        posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))")))
      .toDF("source", "dim", "qv")
    val bySrc = dims.groupBy("source", "dim")
      .agg(sum("qv").as("s_src"), count(lit(1)).as("n_src"))
    val corpus = dims.groupBy("dim")
      .agg(sum("qv").as("s_corp"), count(lit(1)).as("n_corp"))
    bySrc.join(broadcast(corpus), "dim")
      .withColumn("adiff_ppm", expr(
        "abs(s_src * n_corp - s_corp * n_src) * 1000000L div (n_src * n_corp)"))
      .groupBy("source")
      .agg(max("n_src").as("n_docs"),
        sum("adiff_ppm").as("drift_l1_ppm"))
  }

  /** Funnel time-to-convert distribution: for each funnel transition
    * (view→click, click→purchase under q106's 24 h deadlines), the
    * latency distribution — count, min, lower-median, lower-p90, max in
    * whole seconds. The "how fast do users move" question next to
    * q106's "how many survive"; exact integers end to end (lower
    * discrete quantiles, never interpolation).
    *
    * Scale shape: q106's per-stage min-timestamp joins (user-keyed),
    * then quantiles of the per-user latencies via [[cumWeights]] — the
    * wide prefix sum, not a per-transition single-task sort.
    */
  def funnelLatency: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    def stage(tpe: String): DataFrame = ev.where(col("event_type") === tpe)
    val v = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val ck = stage("click").join(v, "user_id")
      .where(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t2"), max("t1").as("t1"))
    val p = stage("purchase").join(ck.select("user_id", "t2"), "user_id")
      .where(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
      .join(ck.select("user_id", "t2"), "user_id")
    val lat = ck.select(lit("view_to_click").as("transition"),
        expr("(unix_micros(t2) - unix_micros(t1)) div 1000000L").as("secs"))
      .unionByName(p.select(lit("click_to_purchase").as("transition"),
        expr("(unix_micros(t3) - unix_micros(t2)) div 1000000L").as("secs")))
    val per = lat.groupBy(col("transition"), col("secs").as("cents"))
      .agg(count(lit(1)).as("w"))
    cumWeights(per, "transition", 4096L)
      .groupBy("transition")
      .agg(max("tot").as("n_users"),
        min("cents").as("min_secs"),
        min(when(col("cumw") * 2 >= col("tot"), col("cents"))).as("med_secs"),
        min(when(col("cumw") * 10 >= col("tot") * 9, col("cents"))).as("p90_secs"),
        max("cents").as("max_secs"))
  }

  /** Mann–Whitney U rank-sum test (the nonparametric two-sample
    * location test): does the `1-URGENT` order-price distribution
    * stochastically dominate `5-LOW`? All statistics are exact
    * integers: prices cross the engine boundary as DECIMAL-cast cents,
    * and tied ranks — normally fractional averages — are carried
    * DOUBLED (2·avg-rank = 2·(cum−w) + w + 1 is always an integer), so
    * `ra_x2`/`u_a_x2`/`u_b_x2` hash-match bit-for-bit where a float
    * rank sum could not.
    *
    * Scale shape: the fact table collapses to one row per DISTINCT
    * price (one keyed shuffle), and the global rank comes from
    * [[cumWeights]]'s two-level distributed prefix sum — in-bucket
    * windows run wide and only the ~|cents|/2¹⁶ bucket-total table is
    * ever prefix-summed in one task. A plain `rank() OVER (ORDER BY
    * price)` would global-sort the table through ONE task at any scale.
    */
  def mannWhitney: Q = (s, d) => {
    val base = Tables.fanOut(Tables.orders(s, d), col("o_orderkey"))
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("is_a"))
    val per = base.groupBy("cents")
      .agg(sum("is_a").as("na"), sum(lit(1L) - col("is_a")).as("nb"),
        count(lit(1)).as("w"))
      .withColumn("grp", lit("all"))
    cumWeights(per, "grp")
      .withColumn("r2",
        lit(2L) * (col("cumw") - col("w")) + col("w") + lit(1L))
      .agg(sum("na").as("n_a"), sum("nb").as("n_b"),
        sum(col("na") * col("r2")).as("ra_x2"))
      .withColumn("u_a_x2",
        col("ra_x2") - col("n_a") * (col("n_a") + lit(1L)))
      .withColumn("u_b_x2",
        lit(2L) * col("n_a") * col("n_b") - col("u_a_x2"))
  }

  /** Benford first-digit audit: the distribution of leading digits of
    * order totals (in exact cents) vs Benford's-law expectation — the
    * classic fabricated-data / corrupted-ingest screen. The expected
    * ppm per digit (⌊log₁₀(1+1/d)·10⁶⌋) is a 9-row literal table
    * inlined IDENTICALLY on both engines, so no transcendental function
    * ever crosses the engine boundary; observed shares are exact
    * integer ppm.
    *
    * Scale shape: one partial+final hash aggregate to 9 rows; the share
    * window and expectation join run on the 9-row table. The leading
    * digit comes from the integer's decimal string — total-order exact
    * on both engines (no float log10).
    */
  def benford: Q = (s, d) => {
    import s.implicits._
    val exp = Seq(1L -> 301029L, 2L -> 176091L, 3L -> 124938L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66946L, 7L -> 57991L,
      8L -> 51152L, 9L -> 45757L).toDF("digit", "exp_ppm")
    Tables.orders(s, d)
      .select(substring(
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("obs_ppm", expr(
        "n * 1000000L div sum(n) over ()"))
      .join(broadcast(exp), Seq("digit"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** Gini coefficient of customer spend per market segment — the
    * standard inequality/concentration measure, in exact ppm (0 =
    * perfectly equal, →1e6 as one customer approaches everything).
    * Over values sorted ascending with ranks i=1..n:
    * `G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)`. Tied values contribute
    * identically whatever their order inside the tie, so the rank sum
    * of a distinct value's block is closed-form —
    * `w·(cumw−w) + w·(w+1)/2` — and Σi·xᵢ needs only the cumulative
    * weight, never a per-row rank.
    *
    * Scale shape: per-customer spend is one orders aggregation; the
    * distribution then collapses to distinct (segment, cents) rows and
    * [[cumWeights]] supplies `cumw` via the two-level distributed
    * prefix sum — no single-task per-group sort anywhere (the naive
    * `row_number()` form the oracle uses runs one task per segment at
    * any scale). Final products run in DECIMAL(38,0): Σi·x·1e6 clears
    * int64 at warehouse scale.
    */
  def gini: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("cents"))
    val per = spend
      .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("cents"))
      .agg(count(lit(1)).as("w"))
    cumWeights(per, "c_mktsegment")
      .withColumn("ranksum", expr("w * (cumw - w) + (w * (w + 1)) div 2"))
      .groupBy("c_mktsegment")
      .agg(max("tot").as("n"),
        sum(expr("cents * w")).as("spend_cents"),
        // the rank-weighted sum clears int64 at warehouse scale
        sum(expr("cast(cents as decimal(38,0)) * ranksum")).as("sum_ix"))
      .withColumn("gini_ppm", expr(
        """(2 * sum_ix - (n + 1) * cast(spend_cents as decimal(38,0)))
          | * 1000000 div (cast(n as decimal(38,0)) * spend_cents)""".stripMargin))
      .select(col("c_mktsegment"), col("n"), col("spend_cents"), col("gini_ppm"))
  }

  /** ABC (Pareto) classification: brands ranked by revenue, classified
    * by cumulative revenue share — A carries the first 70%, B to 90%,
    * C the tail. The running share is exact ppm (DECIMAL(38,0)
    * numerator — total-cents·1e6 clears int64 already at sf1).
    *
    * Scale shape: the fact scan collapses to one |brands|-row
    * aggregate (broadcast part-dim join feeds it), and the
    * unpartitioned cumulative window runs over THAT aggregate — 25
    * rows here, bounded by brand cardinality at any data scale, so the
    * single-task global sort is safe by construction (same rule as
    * q142/q165: windows over aggregate-sized tables only).
    */
  def abcClasses: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(sum("cents").as("cents"))
    val ord = Window.orderBy(col("cents").desc, col("p_brand").asc)
    rev
      .withColumn("cum_cents",
        sum("cents").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total",
        sum("cents").over(ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("cum_ppm",
        expr("cast(cum_cents as decimal(38,0)) * 1000000 div total"))
      .withColumn("abc_class",
        when(col("cum_ppm") <= 700000, "A")
          .when(col("cum_ppm") <= 900000, "B").otherwise("C"))
      .select(col("p_brand"), col("cents"), col("cum_ppm"), col("abc_class"))
  }

  /** Herfindahl–Hirschman index per region: supplier revenue shares in
    * exact ppm, HHI = Σ shareᵢ² scaled back to ppm (1e6 = monopoly;
    * shares truncate identically on both engines before squaring, so
    * the sum is bit-exact). The antitrust-screening concentration
    * number next to q200's Gini.
    *
    * Scale shape: the fact table collapses to per-supplier totals in
    * one keyed aggregation; everything after runs on supplier-count
    * rows — region totals via a tiny re-aggregation broadcast back,
    * no window over the fact scan, no join wider than the dim tables.
    */
  def hhi: Q = (s, d) => {
    val dims = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(Tables.nation(s, d).select("n_nationkey", "n_regionkey"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).select("r_regionkey", "r_name"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    val per = Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("l_suppkey").agg(sum("cents").as("cents"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
    val rtot = per.groupBy("r_name")
      .agg(sum("cents").as("rtot"), count(lit(1)).as("n_suppliers"))
    per.join(broadcast(rtot), "r_name")
      .withColumn("share_ppm",
        expr("cast(cents as decimal(38,0)) * 1000000 div rtot"))
      .groupBy("r_name")
      .agg(max("n_suppliers").as("n_suppliers"),
        // decimal product: Σ share² over many suppliers clears int64
        expr("sum(cast(share_ppm as decimal(38,0)) * share_ppm) div 1000000")
          .as("hhi_ppm"))
  }

  /** Quantile normalization across sources: each document's length is
    * replaced by the GLOBAL distribution's value at the same quantile
    * position it holds within its own source — the cross-source
    * feature-alignment transform (microarray normalization, score
    * calibration between graders, mixing corpora whose length profiles
    * drift). Deciles keep it exact: a doc's source decile is the
    * lower-discrete decile of its length within the source; its
    * normalized value is the global lower-discrete decile boundary of
    * that decile (decile 10 → the global max).
    *
    * Scale shape: per-source decile assignment comes from
    * [[cumWeights]] over distinct (source, len) rows — domain-bounded
    * like q167, no per-row rank — joined back co-keyed on
    * (source, len). The ten global boundaries reduce driver-side and
    * inline as literals (the q182/q118 shape), so the rewrite is a
    * scan-local CASE projection: no one-row cross join, no BNLJ.
    */
  def quantileNorm: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("cents"))
    // global decile boundaries: b1..b9 lower-discrete, b10 = max
    val gper = base.withColumn("g", lit("all"))
      .groupBy("g", "cents").agg(count(lit(1)).as("w"))
    val gBoundCols = (1 to 9).map(i =>
      min(when(col("cumw") * 10 >= col("tot") * i, col("cents"))).as(s"b$i")) :+
      max(col("cents")).as("b10")
    val gb = cumWeights(gper, "g")
      .groupBy("g").agg(gBoundCols.head, gBoundCols.tail: _*)
      .head()
    val bs = (1 to 10).map(i => gb.getLong(i))
    // per-source decile of each distinct length
    val decExpr = (1 to 9)
      .map(i => s"(case when cumw * 10 > tot * $i then 1 else 0 end)")
      .mkString("1 + ", " + ", "")
    val dec = cumWeights(
      base.groupBy("source", "cents").agg(count(lit(1)).as("w")), "source")
      .withColumn("src_decile", expr(s"cast($decExpr as bigint)"))
      .select("source", "cents", "src_decile")
    val normExpr = (1 to 10)
      .map(i => s"when src_decile = $i then ${bs(i - 1)}L")
      .mkString("case ", " ", " end")
    base.join(dec, Seq("source", "cents"))
      .select(col("doc_id"), col("source"), col("cents").as("len"),
        col("src_decile"), expr(normExpr).as("norm_len"))
  }

  /** Decile lift chart (gains table): rank users by an activity score,
    * cut into score deciles (top decile first), and report each
    * decile's responder rate plus CUMULATIVE lift over the base rate —
    * the standard offline evaluation of a targeting model, in exact
    * ppm. Score = total event count; responder = user with ≥1
    * purchase. Lift_ppm of the top-k deciles =
    * (cum_responders·total_users·1e6) div (cum_users·total_responders).
    *
    * Scale shape: one user-keyed aggregation, then the score
    * distribution collapses to distinct score values and [[cumWeights]]
    * (on the NEGATED score — the helper orders ascending) assigns
    * lower-discrete deciles without any per-row rank; the cumulative
    * windows run over the 10-row decile table. Ties share a decile on
    * both engines by construction.
    */
  def liftChart: Q = (s, d) => {
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("resp"))
    val dist = users.groupBy("score")
      .agg(count(lit(1)).as("w"), sum("resp").as("r"))
      .withColumn("g", lit("all"))
      .withColumn("cents", -col("score")) // helper sorts ascending
    val decExpr = (1 to 9)
      .map(i => s"(case when cumw * 10 > tot * $i then 1 else 0 end)")
      .mkString("1 + ", " + ", "")
    val byDecile = cumWeights(dist, "g")
      .withColumn("decile", expr(s"cast($decExpr as bigint)"))
      .groupBy("decile")
      .agg(sum("w").as("n_users"), sum("r").as("responders"))
    val ord = Window.orderBy("decile")
    byDecile
      .withColumn("cum_users",
        sum("n_users").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_resp",
        sum("responders").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot_users",
        sum("n_users").over(ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("tot_resp",
        sum("responders").over(ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("decile"), col("n_users"), col("responders"),
        expr("responders * 1000000 div n_users").as("resp_ppm"),
        // decimal: cum_resp·tot_users·1e6 clears int64 at warehouse scale
        expr("""(cast(cum_resp as decimal(38,0)) * tot_users * 1000000)
               | div (cast(cum_users as decimal(38,0)) * tot_resp)""".stripMargin)
          .as("cum_lift_ppm"))
  }

  /** Order-fulfilment SLA report: days from order date to the order's
    * LAST line-item ship date (the order is only done when its slowest
    * line ships), summarized per priority as min / median / p90 / max
    * whole days with lower-discrete quantiles — the operations-SLA
    * sibling of q187's funnel latency, on the star schema instead of
    * the event stream.
    *
    * Scale shape: one order-keyed aggregation rolls line items up to
    * orders; the latency distribution collapses to distinct
    * (priority, days) rows and [[cumWeights]] supplies the cumulative
    * counts via the two-level distributed prefix sum — no single-task
    * per-priority sort.
    *
    * Corpus note: the synthetic generator draws ship dates
    * independently of order dates, so SIGNED day deltas (including
    * negatives) are expected here; the quantile mechanics are
    * sign-indifferent and the report reads normally on causally
    * ordered data.
    */
  def fulfilmentLatency: Q = (s, d) => {
    val shipped = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(max(col("l_shipdate").cast("date")).as("shipped"))
    val lat = Tables.orders(s, d)
      .join(shipped, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        expr("cast(datediff(shipped, cast(o_orderdate as date)) as bigint)")
          .as("cents"))
    val per = lat.groupBy("o_orderpriority", "cents")
      .agg(count(lit(1)).as("w"))
    cumWeights(per, "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(max("tot").as("n_orders"),
        min("cents").as("min_days"),
        min(when(col("cumw") * 2 >= col("tot"), col("cents"))).as("med_days"),
        min(when(col("cumw") * 10 >= col("tot") * 9, col("cents")))
          .as("p90_days"),
        max("cents").as("max_days"))
  }

  /** Maximum drawdown of the daily-revenue series per month: the
    * largest peak-to-current decline (running max of daily revenue
    * minus the day's revenue), in exact cents — the
    * volatility/risk-style metric finance dashboards put next to the
    * q149 deltas. Running max is order-dependent, so it exercises the
    * cumulative-extremum window q15/q142's running SUMS cannot.
    *
    * Scale shape: the fact table collapses to one row per day first;
    * both windows (running max, and the month partition for the final
    * aggregate) run over the |days| table and share one sort.
    */
  def revenueDrawdown: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderdate").cast("date").as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("month", "day").agg(sum("c").as("cents"))
    val w = Window.partitionBy("month").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("peak", max("cents").over(w))
      .withColumn("dd", col("peak") - col("cents"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_days"), max("peak").as("peak_cents"),
        max("dd").as("max_drawdown_cents"))
  }

  /** Rolling z-score anomaly detection on the daily revenue series —
    * the pipeline-health monitor next to q222's drawdown: a day is
    * anomalous when its revenue deviates more than 3σ from its own
    * trailing 30-day baseline (current day excluded; the first 30 days
    * carry no verdict). Entirely INTEGER arithmetic: with x the day's
    * revenue (quantized to thousands of dollars), s1/s2 the trailing
    * window's sum and sum-of-squares, `z² > 9` rewrites exactly as
    * `(30x − s1)² > 9·(30·s2 − s1²)` — no division, no sqrt, no
    * floats, so the oracle replays bit-for-bit and quadratic terms fit
    * int64 with orders of headroom (rev_k ≈ 2.3e4 at sf0.1 →
    * (30·rev_k)² ≈ 5e11; even 1000× data stays < 2⁶³).
    *
    * Scale shape: the fact table collapses to ONE row per day first
    * (hash aggregate — the only pass over row-scale data); the rolling
    * window then runs over the bounded daily series (|days| is
    * calendar-bounded regardless of fact rows — a few thousand rows at
    * ANY corpus size), where a global-ordered frame is the correct
    * plan, not a scale hazard.
    */
  def anomalyDays: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(expr(
        "cast(sum(cast(o_totalprice as decimal(18,2)) * 100) as bigint) div 100000")
        .as("rev_k"))
    val win = Window.orderBy("day").rowsBetween(-30, -1)
    daily.select(col("day"), col("rev_k"),
        count(lit(1)).over(win).as("n"),
        sum("rev_k").over(win).as("s1"),
        sum(expr("rev_k * rev_k")).over(win).as("s2"))
      .where(col("n") === 30 &&
        expr("(30*rev_k - s1)*(30*rev_k - s1) > 9*(30*s2 - s1*s1)"))
      .select(col("day"), col("rev_k"),
        expr("s1 div 30").as("baseline_avg_k"),
        expr("30*rev_k > s1").as("is_high"))
  }

  /** Peak concurrency per day: each event opens a 5-minute activity
    * interval; the sweep-line (+1 at open, −1 at close, running net)
    * gives the number of simultaneously-active intervals at every
    * boundary, reported as the daily maximum — the load-planning
    * number behind capacity dashboards, exact.
    *
    * Scale shape: the sweep's running net IS a prefix sum, so it runs
    * through [[cumWeights]] with SIGNED weights (+1/−1 endpoint deltas
    * merged per distinct timestamp) — the two-level distributed form,
    * no single global sort task. The sweep is global (cross-midnight
    * intervals carry), and the |endpoints| table then aggregates to
    * per-day maxima. Simultaneous opens/closes at one microsecond
    * merge into one net delta on both engines, so boundary semantics
    * can never diverge.
    */
  def peakConcurrency: Q = (s, d) => {
    val ttl = 300L * 1000000L
    val ev = Tables.events(s, d).select(unix_micros(col("ts")).as("t"))
    val ends = ev.select((col("t") + ttl).as("cents"), lit(-1L).as("delta"))
    val per = ev.select(col("t").as("cents"), lit(1L).as("delta"))
      .unionAll(ends)
      .groupBy("cents").agg(sum("delta").as("w"))
      .withColumn("g", lit("all"))
    // bucket width 2³³ µs (~2.4 h), not the price-cents default 2¹⁶:
    // boundaries are EPOCH MICROSECONDS, where 65536 µs buckets
    // degenerate to ~one bucket per distinct boundary — the
    // bucket-offset "tiny table" becomes |boundaries|-sized, prefix-
    // summed in ONE task and broadcast whole (the exact single-task
    // trap cumWeights exists to avoid). 2³³ keeps the offset table
    // calendar-bounded (a 30-day corpus → ~300 buckets; a year →
    // ~3700) at any event volume. cumw is width-independent, so the
    // result is bit-identical.
    cumWeights(per, "g", 1L << 33)
      .withColumn("day", expr("cents div 86400000000L"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_boundaries"),
        max("cumw").as("peak_concurrency"))
  }

  val queries: Map[String, Q] = Map(
    "q223_peak_concurrency" -> peakConcurrency,
    "q222_revenue_drawdown" -> revenueDrawdown,
    "q228_anomaly_days" -> anomalyDays,
    "q221_fulfilment_latency" -> fulfilmentLatency,
    "q210_lift_chart" -> liftChart,
    "q205_quantile_norm" -> quantileNorm,
    "q200_gini" -> gini,
    "q201_abc_classes" -> abcClasses,
    "q202_hhi" -> hhi,
    "q195_mann_whitney" -> mannWhitney,
    "q196_benford" -> benford,
    "q180_audience_overlap" -> audienceOverlapChecked,
    "q182_equidepth_histogram" -> equidepthHistogram,
    "q184_rollup_shares" -> rollupShares,
    "q185_embedding_drift" -> embeddingDrift,
    "q187_funnel_latency" -> funnelLatency,
    "q167_weighted_median" -> weightedMedian,
    "q172_winsorized_mean" -> winsorizedMean,
    "q176_mad_outliers" -> madOutliers,
    "q177_ltv_curve" -> ltvCurve,
    "q178_kll_quantiles" -> kllQuantilesChecked,
    "q159_basket_pairs" -> basketPairs,
    "q160_twap" -> twap,
    "q161_chi_square" -> chiSquare,
    "q162_ewma" -> ewmaSmooth,
    "q155_rfm" -> rfm,
    "q153_interpolate" -> interpolate,
    "q149_period_over_period" -> periodOverPeriod,
    "q142_share_of_total" -> shareOfTotal,
    "q143_mode" -> modeDeterministic,
    "q136_ohlc" -> ohlc,
    "q263_calendar_fill" -> calendarFill,
    "q137_hll_merge" -> hllMergeDailyChecked,
    "q231_cms_frequency" -> cmsFrequencyChecked,
    "q114_corr_matrix" -> corrMatrix,
    "q115_regression" -> regression,
    "q116_ntile" -> ntileDeciles,
    "q117_higher_order" -> higherOrderFns,
    "q118_gap_fill" -> gapFill,
    "q119_arg_extremum" -> argExtremum,
    "q106_funnel" -> funnel,
    "q107_retention" -> retention,
    "q108_pareto" -> paretoFrontier,
    "q109_merge_apply" -> mergeApply,
    "q110_activity_bitmap" -> activityBitmap,
    "q111_inverted_index" -> invertedIndex,
    "q112_editdist_join" -> editDistanceJoin)

  /** DuckDB side of [[corrMatrix]]'s moments CTE (identical decimal
    * casts; DuckDB spells the double sums the same way).
    */
  private val momentsCte =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sz,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxz,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS syz,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS szz
      |  FROM lineitem GROUP BY l_returnflag)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    // sketch-audit oracles (q137, q178, q180): DuckDB has no
    // Datasketches, so it recomputes the EXACT reference columns and
    // asserts the accuracy booleans as literal TRUE — the Spark side
    // computes them for real, so a sketch regression flips a bit and
    // the driver hash goes red (see the *Checked scaladocs)
    "q137_hll_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact,
        |  TRUE AS merge_associative, TRUE AS est_within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "q231_cms_frequency" ->
      """SELECT l_partkey, count(*) AS exact_n,
        |  TRUE AS ge_ok, TRUE AS le_ok
        |FROM lineitem
        |WHERE l_partkey % 97 = 0 AND l_partkey < 100000
        |GROUP BY 1""".stripMargin,
    "q178_kll_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  TRUE AS merged_ranks_ok, TRUE AS direct_ranks_ok
        |FROM events WHERE value IS NOT NULL GROUP BY 1""".stripMargin,
    "q180_audience_overlap" ->
      """WITH hv AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |  WHERE value >= 150),
        |t AS (SELECT DISTINCT event_type FROM hv),
        |ov AS (SELECT a.event_type ta, b.event_type tb, count(*) c
        |       FROM hv a JOIN hv b
        |         ON a.user_id = b.user_id AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT t1.event_type AS type_a, t2.event_type AS type_b,
        |  CAST(coalesce(ov.c, 0) AS BIGINT) AS exact_overlap,
        |  TRUE AS theta_within_5pct
        |FROM t t1 JOIN t t2 ON t1.event_type < t2.event_type
        |LEFT JOIN ov ON ov.ta = t1.event_type AND ov.tb = t2.event_type""".stripMargin,
    // naive global cumulative sweep — same merged endpoint deltas
    "q223_peak_concurrency" ->
      """WITH ep AS (
        |  SELECT epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT epoch_us(ts) + 300000000, -1 FROM events),
        |per AS (SELECT t, CAST(sum(delta) AS BIGINT) AS w FROM ep GROUP BY t),
        |c AS (SELECT t,
        |        sum(w) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        |      FROM per)
        |SELECT t // 86400000000 AS day, count(*) AS n_boundaries,
        |  CAST(max(cumw) AS BIGINT) AS peak_concurrency
        |FROM c GROUP BY 1""".stripMargin,
    "q228_anomaly_days" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      // 100000 AS rev_k
        |  FROM orders GROUP BY 1),
        |w AS (SELECT day, rev_k,
        |    count(*) OVER win AS n,
        |    CAST(sum(rev_k) OVER win AS BIGINT) AS s1,
        |    CAST(sum(rev_k * rev_k) OVER win AS BIGINT) AS s2
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT day, rev_k, s1 // 30 AS baseline_avg_k,
        |  30 * rev_k > s1 AS is_high
        |FROM w
        |WHERE n = 30
        |  AND (30*rev_k - s1)*(30*rev_k - s1) > 9*(30*s2 - s1*s1)""".stripMargin,
    "q222_revenue_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |x AS (
        |  SELECT month, cents,
        |    max(cents) OVER (PARTITION BY month ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily)
        |SELECT month, count(*) AS n_days, max(peak) AS peak_cents,
        |  max(peak - cents) AS max_drawdown_cents
        |FROM x GROUP BY month""".stripMargin,
    "q221_fulfilment_latency" ->
      """WITH sh AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS shipped
        |            FROM lineitem GROUP BY 1),
        |lat AS (SELECT o_orderpriority,
        |          CAST(date_diff('day', CAST(o_orderdate AS DATE), shipped)
        |            AS BIGINT) AS v
        |        FROM orders JOIN sh ON o_orderkey = l_orderkey),
        |per AS (SELECT o_orderpriority, v, count(*) AS w FROM lat GROUP BY 1, 2),
        |c AS (SELECT o_orderpriority, v, w,
        |        sum(w) OVER (PARTITION BY o_orderpriority ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |        sum(w) OVER (PARTITION BY o_orderpriority) AS tot
        |      FROM per)
        |SELECT o_orderpriority, CAST(max(tot) AS BIGINT) AS n_orders,
        |  min(v) AS min_days,
        |  min(CASE WHEN cumw * 2 >= tot THEN v END) AS med_days,
        |  min(CASE WHEN cumw * 10 >= tot * 9 THEN v END) AS p90_days,
        |  max(v) AS max_days
        |FROM c GROUP BY 1""".stripMargin,
    "q210_lift_chart" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT score, count(*) AS w, CAST(sum(resp) AS BIGINT) AS r
        |  FROM u GROUP BY score),
        |c AS (
        |  SELECT score, w, r,
        |    sum(w) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER () AS tot
        |  FROM s),
        |dd AS (
        |  SELECT r, w,
        |    CAST(1 + (CASE WHEN cumw*10 > tot*1 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*2 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*3 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*4 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*5 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*6 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*7 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*8 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*9 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS decile
        |  FROM c),
        |g AS (SELECT decile, CAST(sum(w) AS BIGINT) AS n_users,
        |        CAST(sum(r) AS BIGINT) AS responders FROM dd GROUP BY decile)
        |SELECT decile, n_users, responders,
        |  CAST(responders * 1000000 // n_users AS BIGINT) AS resp_ppm,
        |  CAST((CAST(sum(responders) OVER wd AS HUGEINT)
        |        * CAST(sum(n_users) OVER () AS HUGEINT) * 1000000)
        |    // (CAST(sum(n_users) OVER wd AS HUGEINT)
        |        * CAST(sum(responders) OVER () AS HUGEINT)) AS BIGINT)
        |    AS cum_lift_ppm
        |FROM g
        |WINDOW wd AS (ORDER BY decile
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    // naive window form: RANGE frame counts ties inclusively, matching
    // cumWeights over distinct values; boundary join mirrors the
    // inlined literals
    "q205_quantile_norm" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS len
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, len,
        |    count(*) OVER (PARTITION BY source ORDER BY len
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    count(*) OVER (PARTITION BY source) AS tot
        |  FROM d),
        |g AS (
        |  SELECT len,
        |    count(*) OVER (ORDER BY len
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum,
        |    count(*) OVER () AS gtot
        |  FROM d),
        |gb AS (
        |  SELECT i, min(len) AS b
        |  FROM g CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS i)
        |  WHERE gcum * 10 >= gtot * i GROUP BY i
        |  UNION ALL SELECT 10, max(len) FROM d),
        |dd AS (
        |  SELECT doc_id, source, len,
        |    CAST(1 + (CASE WHEN cumw*10 > tot*1 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*2 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*3 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*4 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*5 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*6 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*7 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*8 THEN 1 ELSE 0 END)
        |           + (CASE WHEN cumw*10 > tot*9 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS src_decile
        |  FROM s)
        |SELECT doc_id, source, len, src_decile, b AS norm_len
        |FROM dd JOIN gb ON gb.i = dd.src_decile""".stripMargin,
    // naive row_number Gini — same integers as the closed-form tie-block
    // rank sums the Spark side derives from cumWeights
    "q200_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, o_custkey) AS i
        |  FROM spend JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS spend_cents,
        |  CAST((2 * sum(CAST(i AS HUGEINT) * cents)
        |      - (count(*) + 1) * CAST(sum(cents) AS HUGEINT)) * 1000000
        |    // (CAST(count(*) AS HUGEINT) * CAST(sum(cents) AS HUGEINT)) AS BIGINT) AS gini_ppm
        |FROM r GROUP BY c_mktsegment""".stripMargin,
    "q201_abc_classes" ->
      """WITH rev AS (
        |  SELECT p_brand,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand)
        |SELECT p_brand, cents,
        |  CAST(CAST(sum(cents) OVER w AS HUGEINT) * 1000000
        |    // CAST(sum(cents) OVER () AS HUGEINT) AS BIGINT) AS cum_ppm,
        |  CASE WHEN CAST(sum(cents) OVER w AS HUGEINT) * 1000000
        |           // CAST(sum(cents) OVER () AS HUGEINT) <= 700000 THEN 'A'
        |       WHEN CAST(sum(cents) OVER w AS HUGEINT) * 1000000
        |           // CAST(sum(cents) OVER () AS HUGEINT) <= 900000 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM rev
        |WINDOW w AS (ORDER BY cents DESC, p_brand
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q202_hhi" ->
      """WITH per AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_suppkey),
        |j AS (
        |  SELECT r_name, cents FROM per
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |t AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS rtot,
        |        count(*) AS n_suppliers FROM j GROUP BY r_name),
        |sh AS (SELECT j.r_name,
        |         CAST(CAST(cents AS HUGEINT) * 1000000 // rtot AS BIGINT) AS share_ppm,
        |         n_suppliers
        |       FROM j JOIN t ON j.r_name = t.r_name)
        |SELECT r_name, max(n_suppliers) AS n_suppliers,
        |  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
        |FROM sh GROUP BY r_name""".stripMargin,
    // the two-level distributed rank must equal the plain global
    // cumulative window; doubled ranks keep tie-averages integral
    "q195_mann_whitney" ->
      """WITH f AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |per AS (
        |  SELECT cents, CAST(sum(is_a) AS BIGINT) AS na,
        |    CAST(sum(1 - is_a) AS BIGINT) AS nb, count(*) AS w
        |  FROM f GROUP BY cents),
        |r AS (
        |  SELECT na, nb,
        |    2 * (sum(w) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w)
        |      + w + 1 AS r2
        |  FROM per),
        |t AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    CAST(sum(na * r2) AS BIGINT) AS ra_x2
        |  FROM r)
        |SELECT n_a, n_b, ra_x2,
        |  ra_x2 - n_a * (n_a + 1) AS u_a_x2,
        |  2 * n_a * n_b - (ra_x2 - n_a * (n_a + 1)) AS u_b_x2
        |FROM t""".stripMargin,
    "q196_benford" ->
      """WITH exp(digit, exp_ppm) AS (VALUES
        |  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
        |  (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
        |obs AS (
        |  SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT obs.digit, obs.n,
        |  CAST(obs.n * 1000000 // sum(obs.n) OVER () AS BIGINT) AS obs_ppm,
        |  CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
        |  CAST(abs(obs.n * 1000000 // sum(obs.n) OVER () - exp.exp_ppm)
        |    AS BIGINT) AS dev_ppm
        |FROM obs JOIN exp ON obs.digit = exp.digit""".stripMargin,
    "q187_funnel_latency" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |ck AS (
        |  SELECT e.user_id, min(e.ts) AS t2, max(v.t1) AS t1
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND e.ts <= v.t1 + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN ck USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > ck.t2
        |    AND e.ts <= ck.t2 + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |lat AS (
        |  SELECT 'view_to_click' AS transition,
        |    (epoch_us(t2) - epoch_us(t1)) // 1000000 AS secs FROM ck
        |  UNION ALL
        |  SELECT 'click_to_purchase',
        |    (epoch_us(p.t3) - epoch_us(ck.t2)) // 1000000
        |  FROM p JOIN ck USING (user_id)),
        |per AS (SELECT transition, secs, count(*) AS w FROM lat GROUP BY 1, 2),
        |cum AS (
        |  SELECT transition, secs,
        |    sum(w) OVER (PARTITION BY transition ORDER BY secs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY transition) AS tot
        |  FROM per)
        |SELECT transition, CAST(max(tot) AS BIGINT) AS n_users,
        |  min(secs) AS min_secs,
        |  min(CASE WHEN cumw * 2 >= tot THEN secs END) AS med_secs,
        |  min(CASE WHEN cumw * 10 >= tot * 9 THEN secs END) AS p90_secs,
        |  max(secs) AS max_secs
        |FROM cum GROUP BY transition""".stripMargin,
    "q184_rollup_shares" ->
      """WITH rev AS (
        |  SELECT r_name AS region, n_name AS nation,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |by_nation AS (
        |  SELECT region, nation, sum(cents) AS rev_cents
        |  FROM rev GROUP BY 1, 2),
        |by_region AS (
        |  SELECT region, sum(rev_cents) AS region_cents
        |  FROM by_nation GROUP BY 1),
        |total AS (SELECT sum(region_cents) AS total_cents FROM by_region)
        |SELECT region, nation, CAST(rev_cents AS BIGINT) AS rev_cents,
        |  CAST(rev_cents * 1000000 // region_cents AS BIGINT)
        |    AS share_of_region_ppm,
        |  CAST(region_cents * 1000000 // (SELECT total_cents FROM total)
        |    AS BIGINT) AS region_share_ppm
        |FROM by_nation JOIN by_region USING (region)""".stripMargin,
    "q185_embedding_drift" ->
      """WITH raw AS (
        |  SELECT d.source,
        |    unnest(generate_series(1, len(e.embedding))) AS dimx,
        |    unnest(list_transform(e.embedding,
        |      v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))) AS qv
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |x AS (SELECT source, dimx - 1 AS dim, qv FROM raw),
        |by_src AS (
        |  SELECT source, dim, sum(qv) AS s_src, count(*) AS n_src
        |  FROM x GROUP BY 1, 2),
        |corp AS (
        |  SELECT dim, sum(qv) AS s_corp, count(*) AS n_corp
        |  FROM x GROUP BY 1),
        |diffs AS (
        |  SELECT source, n_src,
        |    CAST(abs(CAST(s_src AS BIGINT) * n_corp
        |        - CAST(s_corp AS BIGINT) * n_src) * 1000000
        |      // (n_src * n_corp) AS BIGINT) AS adiff_ppm
        |  FROM by_src JOIN corp USING (dim))
        |SELECT source, CAST(max(n_src) AS BIGINT) AS n_docs,
        |  CAST(sum(adiff_ppm) AS BIGINT) AS drift_l1_ppm
        |FROM diffs GROUP BY source""".stripMargin,
    "q182_equidepth_histogram" ->
      """WITH base AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders),
        |per AS (SELECT cents, count(*) AS w FROM base GROUP BY 1),
        |cum AS (
        |  SELECT cents,
        |    sum(w) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER () AS tot
        |  FROM per),
        |b AS (
        |  SELECT
        |    min(CASE WHEN cumw * 10 >= tot * 1 THEN cents END) AS b1,
        |    min(CASE WHEN cumw * 10 >= tot * 2 THEN cents END) AS b2,
        |    min(CASE WHEN cumw * 10 >= tot * 3 THEN cents END) AS b3,
        |    min(CASE WHEN cumw * 10 >= tot * 4 THEN cents END) AS b4,
        |    min(CASE WHEN cumw * 10 >= tot * 5 THEN cents END) AS b5,
        |    min(CASE WHEN cumw * 10 >= tot * 6 THEN cents END) AS b6,
        |    min(CASE WHEN cumw * 10 >= tot * 7 THEN cents END) AS b7,
        |    min(CASE WHEN cumw * 10 >= tot * 8 THEN cents END) AS b8,
        |    min(CASE WHEN cumw * 10 >= tot * 9 THEN cents END) AS b9
        |  FROM cum)
        |SELECT CAST((CASE WHEN cents > b1 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b2 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b3 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b4 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b5 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b6 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b7 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b8 THEN 1 ELSE 0 END)
        |  + (CASE WHEN cents > b9 THEN 1 ELSE 0 END) AS BIGINT) AS bin,
        |  count(*) AS n_rows, min(cents) AS min_cents,
        |  max(cents) AS max_cents, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM base CROSS JOIN b
        |GROUP BY 1""".stripMargin,
    "q176_mad_outliers" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |per AS (SELECT event_type, cents, count(*) AS w FROM b GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, cents,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY event_type) AS tot
        |  FROM per),
        |med AS (
        |  SELECT event_type, min(cents) AS med_cents
        |  FROM cum WHERE cumw * 2 >= tot GROUP BY event_type),
        |dev AS (
        |  SELECT b.event_type, b.cents, abs(b.cents - med_cents) AS dv,
        |    med_cents
        |  FROM b JOIN med USING (event_type)),
        |dper AS (SELECT event_type, dv, count(*) AS w FROM dev GROUP BY 1, 2),
        |dcum AS (
        |  SELECT event_type, dv,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY dv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY event_type) AS tot
        |  FROM dper),
        |mad AS (
        |  SELECT event_type, min(dv) AS mad_cents
        |  FROM dcum WHERE cumw * 2 >= tot GROUP BY event_type)
        |SELECT dev.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN dv > mad_cents * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  max(dev.med_cents) AS med_cents, max(mad.mad_cents) AS mad_cents
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY dev.event_type""".stripMargin,
    "q177_ltv_curve" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |cells AS (
        |  SELECT c.cohort_week,
        |    CAST(date_diff('day', c.cohort_week,
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
        |      AS week_offset,
        |    count(*) AS n_purchases,
        |    sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev_cents
        |  FROM events e JOIN cohort c USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts >= CAST(c.cohort_week AS TIMESTAMP)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_purchases,
        |  CAST(rev_cents AS BIGINT) AS rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_rev_cents
        |FROM cells""".stripMargin,
    "q167_weighted_median" ->
      """WITH per AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, cents,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM per)
        |SELECT l_returnflag, min(cents) AS wmedian_cents,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM cum WHERE cumw * 2 >= tot
        |GROUP BY l_returnflag""".stripMargin,
    "q172_winsorized_mean" ->
      """WITH base AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |per AS (
        |  SELECT l_returnflag, cents, count(*) AS c
        |  FROM base GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, cents,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM per),
        |bounds AS (
        |  SELECT l_returnflag,
        |    min(CASE WHEN cumn * 100 >= n * 5 THEN cents END) AS p05_cents,
        |    min(CASE WHEN cumn * 100 >= n * 95 THEN cents END) AS p95_cents
        |  FROM cum GROUP BY l_returnflag)
        |SELECT b.l_returnflag, count(*) AS n,
        |  max(p05_cents) AS p05_cents, max(p95_cents) AS p95_cents,
        |  CAST(sum(greatest(least(b.cents, p95_cents), p05_cents))
        |    AS BIGINT) AS winsor_sum_cents,
        |  CAST(sum(greatest(least(b.cents, p95_cents), p05_cents)) // count(*)
        |    AS BIGINT) AS winsor_mean_cents
        |FROM base b JOIN bounds USING (l_returnflag)
        |GROUP BY b.l_returnflag""".stripMargin,
    "q159_basket_pairs" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
        |cnt AS (SELECT p_brand, count(*) AS n_item FROM baskets GROUP BY 1),
        |pairs AS (
        |  SELECT a.p_brand AS b1, b.p_brand AS b2, count(*) AS n_pair
        |  FROM baskets a JOIN baskets b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2)
        |SELECT b1, b2, n_pair, c1.n_item AS n_b1, c2.n_item AS n_b2,
        |  n_pair * 1000000 // (SELECT n_orders FROM n) AS support_ppm,
        |  n_pair * 1000000 // c1.n_item AS confidence_ppm,
        |  n_pair * (SELECT n_orders FROM n) * 1000000
        |    // (c1.n_item * c2.n_item) AS lift_ppm
        |FROM pairs
        |JOIN cnt c1 ON b1 = c1.p_brand
        |JOIN cnt c2 ON b2 = c2.p_brand
        |WHERE n_pair * 1000000 >= (SELECT n_orders FROM n) * 22000""".stripMargin,
    "q160_twap" ->
      """WITH holds AS (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(ts) // 1000000 AS t,
        |    lead(epoch_us(ts) // 1000000, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)
        |      - epoch_us(ts) // 1000000 AS dt
        |  FROM events)
        |SELECT user_id, count(*) AS n_holds,
        |  CAST(sum(dt) AS BIGINT) AS span_secs,
        |  CAST(sum(cents * dt) AS BIGINT) AS weighted_cents_secs,
        |  CAST(sum(cents * dt) // sum(dt) AS BIGINT) AS twap_cents
        |FROM holds WHERE dt IS NOT NULL
        |GROUP BY user_id HAVING sum(dt) > 0""".stripMargin,
    "q161_chi_square" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, o_orderpriority, o,
        |  CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS rt,
        |  CAST(sum(o) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS ct,
        |  CAST(((CAST(o AS HUGEINT) * sum(o) OVER ()
        |      - CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS HUGEINT)
        |        * sum(o) OVER (PARTITION BY o_orderpriority))
        |    * (CAST(o AS HUGEINT) * sum(o) OVER ()
        |      - CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS HUGEINT)
        |        * sum(o) OVER (PARTITION BY o_orderpriority))
        |    * 1000000)
        |   // (CAST(sum(o) OVER (PARTITION BY c_mktsegment) AS HUGEINT)
        |      * sum(o) OVER (PARTITION BY o_orderpriority)
        |      * sum(o) OVER ()) AS BIGINT) AS contrib_ppm
        |FROM cells""".stripMargin,
    "q162_ewma" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |lagged AS (
        |  SELECT user_id, ts, event_id, cents,
        |    lag(cents, 1) OVER w AS v1, lag(cents, 2) OVER w AS v2,
        |    lag(cents, 3) OVER w AS v3, lag(cents, 4) OVER w AS v4,
        |    lag(cents, 5) OVER w AS v5, lag(cents, 6) OVER w AS v6,
        |    lag(cents, 7) OVER w AS v7
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, ts, event_id, cents,
        |  (cents * 128 + coalesce(v1, 0) * 64 + coalesce(v2, 0) * 32
        |   + coalesce(v3, 0) * 16 + coalesce(v4, 0) * 8 + coalesce(v5, 0) * 4
        |   + coalesce(v6, 0) * 2 + coalesce(v7, 0) * 1)
        |  // (128 + CASE WHEN v1 IS NULL THEN 0 ELSE 64 END
        |   + CASE WHEN v2 IS NULL THEN 0 ELSE 32 END
        |   + CASE WHEN v3 IS NULL THEN 0 ELSE 16 END
        |   + CASE WHEN v4 IS NULL THEN 0 ELSE 8 END
        |   + CASE WHEN v5 IS NULL THEN 0 ELSE 4 END
        |   + CASE WHEN v6 IS NULL THEN 0 ELSE 2 END
        |   + CASE WHEN v7 IS NULL THEN 0 ELSE 1 END) AS ewma_cents
        |FROM lagged""".stripMargin,
    "q155_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |      (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS BIGINT)
        |      AS recency,
        |    count(*) AS freq,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |t AS (
        |  SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS tr,
        |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS tf,
        |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS tm
        |  FROM cust),
        |b AS (
        |  SELECT o_custkey, recency, freq, monetary,
        |    CAST(1 + CAST(recency > tr[1] AS INT) + CAST(recency > tr[2] AS INT)
        |      + CAST(recency > tr[3] AS INT) + CAST(recency > tr[4] AS INT)
        |      AS INT) AS r_bin,
        |    CAST(1 + CAST(freq > tf[1] AS INT) + CAST(freq > tf[2] AS INT)
        |      + CAST(freq > tf[3] AS INT) + CAST(freq > tf[4] AS INT)
        |      AS INT) AS f_bin,
        |    CAST(1 + CAST(monetary > tm[1] AS INT) + CAST(monetary > tm[2] AS INT)
        |      + CAST(monetary > tm[3] AS INT) + CAST(monetary > tm[4] AS INT)
        |      AS INT) AS m_bin
        |  FROM cust CROSS JOIN t)
        |SELECT *, CAST(r_bin * 100 + f_bin * 10 + m_bin AS INT) AS segment
        |FROM b""".stripMargin,
    "q153_interpolate" ->
      """WITH obs AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(day), max(day),
        |    INTERVAL 1 DAY)) :: DATE AS day
        |  FROM obs GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.day, o.v,
        |    last_value(o.v IGNORE NULLS) OVER back AS pv,
        |    last_value(CASE WHEN o.v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER back AS pd,
        |    first_value(o.v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN o.v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER fwd AS nd
        |  FROM spine s LEFT JOIN obs o USING (user_id, day)
        |  WINDOW back AS (PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fwd AS (PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, v IS NOT NULL AS is_obs,
        |  CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + ((nv - pv) * date_diff('day', pd, day))
        |      // date_diff('day', pd, nd) END AS cents
        |FROM j""".stripMargin,
    "q149_period_over_period" ->
      """WITH m AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, month, cents,
        |  cents - lag(cents, 1) OVER w AS delta_cents,
        |  (cents - lag(cents, 1) OVER w) * 1000000 // lag(cents, 1) OVER w AS change_ppm
        |FROM m
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)""".stripMargin,
    "q142_share_of_total" ->
      """WITH a AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents_sum
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n, cents_sum,
        |  cents_sum * 1000000 // CAST(sum(cents_sum) OVER () AS BIGINT) AS share_ppm
        |FROM a""".stripMargin,
    "q143_mode" ->
      """SELECT l_linestatus, l_returnflag AS mode_flag, cnt FROM (
        |  SELECT l_linestatus, l_returnflag, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_linestatus
        |                       ORDER BY count(*) DESC, l_returnflag ASC) AS rk
        |  FROM lineitem GROUP BY l_linestatus, l_returnflag)
        |WHERE rk = 1""".stripMargin,
    // dense spine + IGNORE NULLS forward fill, replayed relationally;
    // per-day close by the same (t_us, event_id) total order as q136
    "q263_calendar_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    epoch_us(ts) AS t_us, event_id,
        |    CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)
        |      AS cents
        |  FROM events WHERE user_id % 97 = 0),
        |daily AS (
        |  SELECT user_id, day, cents AS obs_cents FROM (
        |    SELECT user_id, day, cents,
        |      row_number() OVER (PARTITION BY user_id, day
        |        ORDER BY t_us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (
        |  SELECT t.user_id, gs.day
        |  FROM (SELECT DISTINCT user_id FROM e) t,
        |       (SELECT unnest(generate_series(d0, d1)) AS day FROM span) gs),
        |f AS (
        |  SELECT s.user_id, s.day, d.obs_cents,
        |    last_value(d.obs_cents IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_cents
        |  FROM spine s LEFT JOIN daily d
        |    ON s.user_id = d.user_id AND s.day = d.day)
        |SELECT user_id, CAST(day AS BIGINT) AS day,
        |  CAST(close_cents AS BIGINT) AS close_cents,
        |  CASE WHEN obs_cents IS NOT NULL THEN 1 ELSE 0 END AS is_observed
        |FROM f WHERE close_cents IS NOT NULL""".stripMargin,
    // identical micros ordering on both engines (Spark reads the nanos
    // column truncated to micros; the oracle truncates explicitly), with
    // event_id as the total-order tiebreak
    "q136_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, CAST(date_trunc('microseconds', ts) AS DATE) AS day,
        |    date_trunc('microseconds', ts) AS uts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |x AS (
        |  SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY uts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type, day) AS cnt
        |  FROM e)
        |SELECT event_type, day, count(*) AS n,
        |  max(CASE WHEN rn = 1 THEN cents END) AS open,
        |  max(cents) AS high, min(cents) AS low,
        |  max(CASE WHEN rn = cnt THEN cents END) AS close
        |FROM x GROUP BY event_type, day""".stripMargin,
    "q114_corr_matrix" -> (momentsCte +
      s"""SELECT l_returnflag, 'quantity' AS var_x, 'extendedprice' AS var_y,
         |  ${corrFormula("sx", "sy", "sxy", "sxx", "syy")} AS corr FROM m
         |UNION ALL
         |SELECT l_returnflag, 'quantity', 'discount',
         |  ${corrFormula("sx", "sz", "sxz", "sxx", "szz")} FROM m
         |UNION ALL
         |SELECT l_returnflag, 'extendedprice', 'discount',
         |  ${corrFormula("sy", "sz", "syz", "syy", "szz")} FROM m""".stripMargin),
    "q115_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
        |FROM m""".stripMargin,
    "q116_ntile" ->
      """SELECT tile, count(*) AS n, min(c_custkey) AS min_key, max(c_custkey) AS max_key,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM (SELECT c_custkey, c_acctbal,
        |        CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS tile
        |      FROM customer)
        |GROUP BY tile""".stripMargin,
    "q117_higher_order" ->
      """SELECT l_orderkey, CAST(count(*) AS INT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_sq,
        |  max(CAST(l_quantity AS BIGINT) * 2) AS max_doubled
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q118_gap_fill" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
        |spine AS (
        |  SELECT u.user_id, CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM events) u, b),
        |daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        |          FROM events GROUP BY 1, 2)
        |SELECT user_id, day,
        |  coalesce(last_value(n IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS filled
        |FROM spine LEFT JOIN daily USING (user_id, day)""".stripMargin,
    "q119_arg_extremum" ->
      """SELECT o_custkey,
        |  arg_max(o_orderstatus, o_orderkey) AS last_status,
        |  arg_min(o_orderstatus, o_orderkey) AS first_status,
        |  max(o_orderkey) AS last_key, min(o_orderkey) AS first_key
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q106_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type='view' GROUP BY user_id),
        |ck AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id=v.user_id
        |       WHERE e.event_type='click' AND e.ts > v.t1
        |         AND e.ts <= v.t1 + INTERVAL 24 HOURS GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN ck ON e.user_id=ck.user_id
        |      WHERE e.event_type='purchase' AND e.ts > ck.t2
        |        AND e.ts <= ck.t2 + INTERVAL 24 HOURS GROUP BY e.user_id)
        |SELECT 1 AS stage_ord, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM ck
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p""".stripMargin,
    "q107_retention" ->
      """WITH cohort AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |                FROM events WHERE event_type='signup' GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
        |        FROM events WHERE event_type='purchase')
        |SELECT cohort_week,
        |  CAST(CAST(date_diff('day', cohort_week, act_week) AS BIGINT) // 7 AS INT) AS week_offset,
        |  count(*) AS n_users
        |FROM cohort JOIN act USING (user_id)
        |WHERE act_week >= cohort_week GROUP BY 1, 2""".stripMargin,
    "q108_pareto" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,
    "q109_merge_apply" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |chg AS (SELECT o_custkey, o_orderstatus AS op_status, o_totalprice AS new_bal
        |        FROM latest WHERE rk = 1)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  CASE WHEN op_status IS NULL THEN 'kept'
        |       WHEN c_custkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action,
        |  CASE WHEN op_status IS NOT NULL THEN new_bal ELSE c_acctbal END AS balance
        |FROM customer FULL OUTER JOIN chg ON c_custkey = o_custkey
        |WHERE o_custkey IS NULL OR op_status <> 'F'""".stripMargin,
    "q110_activity_bitmap" ->
      """SELECT user_id, CAST(month(ts) AS INT) AS m,
        |  bit_or(1::BIGINT << (dayofmonth(ts) - 1)) AS mask,
        |  CAST(bit_count(bit_or(1::BIGINT << (dayofmonth(ts) - 1))) AS INT) AS n_days
        |FROM events GROUP BY user_id, month(ts)""".stripMargin,
    "q111_inverted_index" ->
      """WITH terms AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
        |  FROM documents)
        |SELECT term, count(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM terms GROUP BY term""".stripMargin,
    "q112_editdist_join" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(levenshtein(substr(a.text,1,80), substr(b.text,1,80)) AS INT) AS dist
        |FROM documents a JOIN documents b
        |  ON substr(a.text,1,12) = substr(b.text,1,12) AND a.doc_id < b.doc_id
        |WHERE levenshtein(substr(a.text,1,80), substr(b.text,1,80)) <= 8""".stripMargin)
}
