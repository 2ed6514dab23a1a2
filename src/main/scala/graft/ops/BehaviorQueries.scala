package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral / time-series operators over the event log, plus a
  * one-pass data profiler: gaps-and-islands sessionization, exact
  * integer-arithmetic outlier detection, Markov transition counts, a
  * rolling 7-day distinct-user window, and per-column profiling.
  *
  * Like the rest of `graft.ops` these generalize the reference's one
  * map→shuffle→reduce pipeline (`MapReduceFramework.cpp:191-202`) into
  * declarative Catalyst plans: every shuffle is a keyed aggregation,
  * window, or equi join (no cartesian/BNLJ anywhere — PlanAuditSpec
  * lints this), and every oracle crosses the engine boundary in exact
  * integer/decimal arithmetic or engine-identical timestamp micros.
  */
object BehaviorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Gaps-and-islands sessionization: a new session starts when a user
    * is idle > 30 minutes. Output: per (user, session ordinal) event
    * count, bounds, and exact microsecond duration.
    *
    * Scale shape: ONE hash exchange on `user_id` feeds both the lag
    * window and the running-sum window (same partitioning + ordering, so
    * Catalyst plans a single sort), and the final group-by is
    * partition-local after the window — per-user state never leaves its
    * partition. The streaming sibling is q25's session window; this is
    * the batch/backfill form. Skewed power users are bounded by their
    * own event counts, not the corpus (no per-user collect).
    */
  def sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select("user_id", "ts", "event_id")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"))
      .withColumn("duration_us",
        unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
  }

  /** Daily session-quality report over [[sessionize]]'s 30-minute
    * sessions: per session-start day, session count, bounce share
    * (single-event sessions, the metric every web-analytics dashboard
    * leads with) in exact ppm, mean events per session, and mean
    * duration in whole seconds — integer division on both engines.
    *
    * Scale shape: q120's one-exchange sessionization feeds a
    * |days|-row aggregate; nothing touches the raw log twice.
    */
  def sessionQuality: Q = (s, d) => {
    sessionize(s, d)
      .select(col("start_ts").cast("date").as("day"),
        col("n_events"), col("duration_us"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("bounces"),
        sum("n_events").as("events"),
        sum("duration_us").as("dur_us"))
      .select(col("day"), col("n_sessions"), col("bounces"),
        expr("bounces * 1000000 div n_sessions").as("bounce_ppm"),
        expr("events div n_sessions").as("mean_events"),
        expr("(dur_us div n_sessions) div 1000000").as("mean_dur_secs"))
  }

  /** Exact z-score outlier detection without a single float: flag
    * events whose value sits more than 2 population standard deviations
    * from their event-type mean, counted per type.
    *
    * `z > 2  ⇔  (x·n − S)² > 4·(n·Q − S²)` with x = cents, S = Σx,
    * Q = Σx² — the float inequality cleared of divisions and square
    * roots, so both engines evaluate it in exact wide-integer
    * arithmetic (Spark DECIMAL(38,0), DuckDB HUGEINT) and the oracle is
    * bit-exact, unlike any stddev()-based formulation.
    *
    * Scale shape: one partial+final aggregate for the per-type moments
    * (a handful of rows), broadcast back over the events scan — a
    * single pass over the fact table plus a broadcast, no self-join.
    */
  def anomaly: Q = (s, d) => {
    val base = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("decimal(38,0)").as("x"))
    val stats = base.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("s"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("q"))
    val dev = col("x") * col("n") - col("s")
    base.join(broadcast(stats), "event_type")
      .where(dev * dev > lit(4) * (col("n") * col("q") - col("s") * col("s")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_outliers"), max(col("x").cast("long")).as("max_cents"))
  }

  /** First-order Markov transitions between consecutive event types per
    * user: count each (prev → next) bigram and its probability in exact
    * parts-per-million (integer division, so the oracle hash-matches —
    * a float ratio would not).
    *
    * Scale shape: the lag window shuffles once on `user_id`; the bigram
    * count is a map-side-combinable aggregate on a tiny key space
    * (|types|²), and the per-prev totals join back as a broadcast.
    */
  def transitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cnt = Tables.events(s, d)
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("prev_type").agg(sum("n").as("total"))
    cnt.join(broadcast(tot), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(n * 1000000) div total").as("ppm"))
  }

  /** Rolling 7-day distinct users per active day — the exact form of
    * the classic "L7" engagement metric. Distinct windowed counts have
    * no incremental window form (distinct doesn't subtract), so the
    * scalable exact plan is contribute-and-aggregate: each (user, day)
    * fact contributes to the 7 target days it can influence via
    * `explode(sequence(...))`, then one hash aggregation per target day
    * counts distinct users. A bounded 7× fan-out of a deduplicated
    * user-day table (already ≪ the event table) beats a range
    * self-join (quadratic in active days) and needs no window state;
    * the 100 TB approximate sibling would swap countDistinct for HLL
    * sketch-merge (q34's mechanic). The equi join against the distinct
    * active-day set drops target days with no activity.
    */
  def rollingDistinct: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val days = ud.select(col("day").as("target_day")).distinct()
    ud.select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("target_day"))
      .join(days, "target_day")
      .groupBy("target_day")
      .agg(countDistinct("user_id").as("u7"))
  }

  /** The sketch sibling [[rollingDistinct]]'s scaladoc promises: rolling
    * 7-day distinct users via mergeable HLL sketches. Each day
    * aggregates ONCE into a sketch; the rolling union then ships
    * 7·|days| sketch blobs instead of 7·|user-days| rows — at 100 TB
    * that is the difference between re-shuffling the user stream per
    * window position and merging kilobyte partials (q130/q137's
    * partial-merge economics applied to a frame). Same
    * contribute-and-aggregate shape as the exact form, so target days
    * with no activity drop out identically.
    *
    * DuckDB has no Datasketches HLL, so the raw estimate can't be
    * oracled; BehaviorSpec pins it against the exact q123 within 5%,
    * and the registered driver form is [[rollingDistinctSketchChecked]].
    */
  def rollingDistinctSketch: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .groupBy("day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    daily.select(col("sk"),
        explode(expr("sequence(day, date_add(day, 6))")).as("target_day"))
      .join(daily.select(col("day").as("target_day")), "target_day")
      .groupBy("target_day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("u7_est"))
  }

  /** Driver-audited form of [[rollingDistinctSketch]]: the sketch
    * estimate graded per day against the exact [[rollingDistinct]]
    * (both run — the audit is the BehaviorSpec 5% pin, driver-visible).
    * lgK=14 → rsd ~0.8%, so the 5% bound sits ~6σ out; DuckDB
    * recomputes the exact rolling distinct and asserts the bound as
    * literal TRUE. An equi join on the day column — both sides are
    * |active days| aggregate-sized.
    */
  def rollingDistinctSketchChecked: Q = (s, d) =>
    rollingDistinct(s, d)
      .join(rollingDistinctSketch(s, d), "target_day")
      .select(col("target_day"), col("u7").as("u7_exact"),
        (abs(col("u7_est") - col("u7")) <= col("u7") * lit(0.05))
          .as("est_within_5pct"))

  /** One-pass per-column profiler over `orders`: row count, non-null
    * count, exact distinct count, and min/max rendered to strings with
    * per-type care (dates via DATE cast, money via DECIMAL(18,2) — the
    * two representations both engines print identically; raw
    * double/timestamp renderings would not hash-match).
    *
    * Scale shape: ONE scan. The six exact distinct aggregates share it
    * via Expand (6× row multiplication before partial aggregation) —
    * the standard Spark plan for multi-distinct, still one pass over
    * the fact table; the approximate sibling at 100 TB swaps in HLL
    * (q34). The `stack` unpivot runs on the single aggregated row.
    */
  def profile: Q = (s, d) => {
    // 6 count-distincts in one aggregate would plan a single Expand —
    // a 7× row multiplier INSIDE the scan stage feeding one giant
    // partial aggregate. Restructured (r18, VERDICT item 4) as a UNION
    // of per-column two-level aggregates: each column first collapses
    // to its distinct values WITH their row counts (one partial+final
    // hash aggregate — the same exchange volume the Expand plan paid
    // for that column's gid slice, without the 7× multiply), then a
    // tiny value-table aggregate derives (n_rows, non-null, distinct,
    // min, max) exactly. Each branch plans its OWN column-pruned scan
    // (ReadSchema = o_orderkey + that branch's column — verified in
    // plans/r18) — six narrow scans beat one wide scan multiplied 7×
    // by Expand: TimeQ-min 1.84 → 0.90 s same-window at sf0.1.
    val o = Tables.fanOut(Tables.orders(s, d), col("o_orderkey"))
    def colStats(name: String, c: org.apache.spark.sql.Column) =
      o.groupBy(c.as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum("cnt"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("v").isNotNull, col("cnt"))), lit(0L))
            .as("n_nonnull"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_repr"),
          max(col("v")).cast("string").as("max_repr"))
        .select(col("n_rows"), lit(name).as("col_name"),
          col("n_nonnull"), col("n_distinct"), col("min_repr"),
          col("max_repr"))
    Seq(
      colStats("o_orderkey", col("o_orderkey")),
      colStats("o_custkey", col("o_custkey")),
      colStats("o_orderstatus", col("o_orderstatus")),
      colStats("o_totalprice", col("o_totalprice").cast("decimal(18,2)")),
      colStats("o_orderdate", col("o_orderdate").cast("date")),
      colStats("o_orderpriority", col("o_orderpriority")))
      .reduce(_.unionAll(_))
  }

  /** Event-path pattern matching — MATCH_RECOGNIZE-lite: each user's
    * full history collapses to one ordered `type>type>…` path string
    * (one aggregate; the sort is per-group over collected structs, no
    * window pass), and sequence questions become regexes over it:
    * did the journey START with signup, did an error burst (3+ in a
    * row) occur, did a purchase recover right after an error. The
    * path column doubles as the audit trail. At 100 TB the per-user
    * path is bounded by per-user history (hundreds of events), not
    * corpus size, and the aggregate is the same one shuffle as any
    * groupBy — patterns that only need counts should still use q106's
    * funnel (no string materialization).
    */
  def eventPaths: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        array_join(
          expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
          ">").as("path"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"), col("path"),
        col("path").rlike("^signup").as("starts_signup"),
        col("path").rlike("error>error>error").as("error_burst"),
        col("path").rlike("purchase>error>purchase").as("recovered"))

  /** Interval union (merge-overlapping-intervals): each event opens a
    * 30-minute activity interval; overlapping/adjacent intervals per user
    * merge into maximal "activity blocks". Output: per (user, block)
    * event count and exact microsecond bounds/coverage — the canonical
    * coverage-time primitive (uptime, ad exposure, session stitching
    * with fixed TTL).
    *
    * Classic islands via running max of interval ends: a row starts a
    * new block iff its start exceeds the max end of ALL previous
    * intervals (not just the immediately preceding one — intervals can
    * nest, so `lag(e)` alone is wrong). Scale shape: one hash exchange
    * on `user_id` feeds both windows (same partitioning + ordering = one
    * sort), and the final group-by is partition-local. A merged block is
    * contiguous by construction, so coverage = max(end) − min(start).
    */
  def intervalMerge: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"))
      .withColumn("e_us", col("s_us") + lit(1800L * 1000000L))
      .withColumn("max_prev_e",
        max("e_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_block",
        when(col("max_prev_e").isNull || col("s_us") > col("max_prev_e"), 1L)
          .otherwise(0L))
      .withColumn("block_seq",
        sum("new_block").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "block_seq")
      .agg(count(lit(1)).as("n_events"),
        min("s_us").as("start_us"), max("e_us").as("end_us"))
      .withColumn("coverage_us", col("end_us") - col("start_us"))
  }

  /** Top-20 three-step journey patterns: the most frequent consecutive
    * (event, next, next-next) type trigrams across all user histories —
    * the n-gram generalization of q122's Markov transitions, and the
    * shape a sequence-model pipeline mines for prompt/path templates.
    *
    * Scale shape: two `lead`s share ONE per-user sort (identical window
    * spec), the trigram count is a 125-key hash aggregate (|types|³
    * bounded, corpus-size independent), and top-20 plans as
    * TakeOrderedAndProject — nothing global-sorts the event table.
    * Deterministic tie-break: count desc, then the path itself.
    */
  def journeyTrigrams: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent `view`/`click` touchpoint within a 7-day lookback, or
    * `direct` when none qualifies — the conversion-credit operator every
    * marketing warehouse runs nightly. `last(..., ignoreNulls)` over the
    * preceding-rows frame carries the latest touch's timestamp AND type
    * from the SAME row (both columns null-gate on one condition), so no
    * self-join against the touch stream is needed.
    *
    * Scale shape: one user-keyed sort feeds both carry columns, then a
    * filter — the whole operator is a single window pass over the event
    * log, per-user state bounded by history length.
    */
  def lastTouchAttribution: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchTs = when(col("event_type").isin("view", "click"), col("t_us"))
    val touchTp = when(col("event_type").isin("view", "click"), col("event_type"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("touch_us", last(touchTs, ignoreNulls = true).over(w))
      .withColumn("touch_type", last(touchTp, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("attributed",
        col("touch_us").isNotNull &&
          col("t_us") - col("touch_us") <= lit(604800000000L))
      .select(col("event_id"), col("user_id"),
        when(col("attributed"), col("touch_type")).otherwise("direct")
          .as("credit"),
        when(col("attributed"),
          expr("(t_us - touch_us) div 1000000L")).as("latency_secs"))
  }

  /** Attribution-model comparison: every purchase credited under BOTH
    * first-touch and last-touch (7-day lookback) in one pass, then the
    * 2-D credit matrix (counts + revenue cents per (first, last) pair,
    * `direct` when no touch qualifies) — the query a marketing team
    * runs before switching models, showing exactly how much credit
    * moves. Both models share one RANGE frame
    * `[t−7d, t]` over the user's stream, so their `direct` sets
    * coincide by construction; within the window `first()` and
    * `last(ignoreNulls)` pick the two ends.
    *
    * Determinism: the RANGE frame orders by `t_us` alone (SQL allows
    * one ordering expression for RANGE); the corpus has no same-user
    * same-microsecond pairs at any sf (verified — the q67 rule), so
    * peer order can never differ between engines.
    *
    * Scale shape: ONE user-keyed sort serves all four carry columns;
    * the credit matrix is a ≤9-row aggregate on top.
    */
  def attributionCompare: Q = (s, d) => {
    val lookbackUs = 604800000000L
    val w = Window.partitionBy("user_id").orderBy("t_us")
      .rangeBetween(-lookbackUs, 0)
    val touchTp = when(col("event_type").isin("view", "click"), col("event_type"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        coalesce((col("value").cast("decimal(18,2)") * 100).cast("long"), lit(0L))
          .as("cents"))
      .withColumn("first_touch", first(touchTp, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touchTp, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        coalesce(col("first_touch"), lit("direct")).as("first_credit"),
        coalesce(col("last_touch"), lit("direct")).as("last_credit"),
        col("cents"))
      .groupBy("first_credit", "last_credit")
      .agg(count(lit(1)).as("n_purchases"), sum("cents").as("revenue_cents"))
  }

  /** Distribution drift (total variation distance): splits the event
    * log into two calendar epochs (day-of-month ≤ 15 vs rest) and
    * reports, per event type, TVD = Σ|p₁−p₂|/2 over 20-unit value
    * buckets — the exact-integer drift gate an ML monitoring pipeline
    * runs between training and serving windows (PSI needs a log, which
    * no integer arithmetic can cross engines; TVD is the float-free
    * member of the same family). Shares are exact ppm by construction.
    *
    * Scale shape: one hash aggregation to (type, epoch, bin) cells,
    * then windows/joins over the CELL table (|types|·|bins|·2 rows) —
    * the raw log is touched exactly once.
    */
  def driftTvd: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_type"),
        when(dayofmonth(col("ts")) <= 15, 0).otherwise(1).as("epoch"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint) div 2000")
          .as("bin"))
      .groupBy("event_type", "epoch", "bin").agg(count(lit(1)).as("n"))
      .withColumn("tot",
        sum("n").over(Window.partitionBy("event_type", "epoch")))
      .withColumn("ppm", expr("(n * 1000000L) div tot"))
    cells
      .groupBy("event_type", "bin")
      .agg(sum(when(col("epoch") === 0, col("ppm")).otherwise(0L)).as("p0"),
        sum(when(col("epoch") === 1, col("ppm")).otherwise(0L)).as("p1"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_bins"),
        expr("sum(abs(p0 - p1)) div 2").as("tvd_ppm"))
  }

  /** Calendar activity heatmap: the (day-of-week × hour) grid every ops
    * dashboard opens with — events, distinct users, and exact purchase
    * revenue per cell. Day-of-week is pinned to Spark's 1=Sunday…7
    * convention (DuckDB's `dayofweek` is 0-based — the oracle shifts).
    *
    * Scale shape: one hash aggregation to a ≤168-cell grid; the
    * distinct-user count is the only rollup-heavy part and it shuffles
    * on the same grid key.
    */
  def activityHeatmap: Q = (s, d) =>
    Tables.events(s, d)
      .select(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"),
        col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("dow", "hr")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).as("purchase_cents"))

  /** FIFO event matching (ordered reconciliation): each user's k-th
    * `click` pairs with their k-th `purchase` — the rank-equality join
    * that implements first-in-first-out matching (trade/fill
    * reconciliation, request/response pairing) WITHOUT any iterative
    * queue simulation: `row_number` per (user, type) on both sides,
    * then an equi join on (user, k). Signed lag stays in raw
    * microseconds — summing before any division means
    * truncation-vs-floor on negative lags never arises.
    *
    * Scale shape: the two rank windows and the join all key on
    * `user_id` — one exchange feeds everything; per-user work is
    * bounded by that user's history.
    */
  def fifoMatch: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("t_us", "event_id")
    val ranked = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("k", row_number().over(w))
    val clicks = ranked.where(col("event_type") === "click")
      .select(col("user_id"), col("k"), col("t_us").as("click_us"))
    val buys = ranked.where(col("event_type") === "purchase")
      .select(col("user_id"), col("k"), col("t_us").as("buy_us"))
    val matched = clicks.join(buys, Seq("user_id", "k"))
    matched.groupBy("user_id")
      .agg(count(lit(1)).as("n_matched"),
        sum(col("buy_us") - col("click_us")).as("sum_lag_us"),
        sum(when(col("buy_us") >= col("click_us"), 1L).otherwise(0L))
          .as("n_in_order"))
  }

  /** DAU/MAU stickiness per calendar month — the engagement ratio
    * product teams track: average daily active users over monthly
    * active users, in exact ppm (`Σdau·1e6 div (n_days·mau)` — the
    * integer form of avg(DAU)/MAU; no float division crosses the
    * engine boundary). Days are observed activity days, so a month
    * with quiet days reports the average over its active days only.
    *
    * Scale shape: one distinct over (user, day) — a keyed aggregate on
    * the event stream — then everything else runs on day- and
    * month-cardinality rows. No windows, no joins wider than
    * |months| rows.
    */
  def stickiness: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast("date").as("month"),
        col("ts").cast("date").as("day"))
      .distinct()
    val dau = daily.groupBy("month", "day").agg(count(lit(1)).as("dau"))
    val mdau = dau.groupBy("month")
      .agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
    val mau = daily.select("user_id", "month").distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    mdau.join(mau, "month")
      .withColumn("stickiness_ppm",
        expr("sum_dau * 1000000 div (n_days * mau)"))
  }

  /** New-vs-returning weekly actives: each active week a user is
    * either new (this is their first-ever active week) or returning.
    * The growth-accounting split behind every WAU chart.
    *
    * Scale shape: distinct (user, week) activity + a user-keyed min
    * aggregate, joined back co-partitioned on `user_id` — both sides
    * hash to the same exchange, then a |weeks|-row final aggregate.
    */
  def newVsReturning: Q = (s, d) => {
    val weeks = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val first = weeks.groupBy("user_id").agg(min("week").as("first_week"))
    weeks.join(first, "user_id")
      .groupBy("week")
      .agg(
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("week") > col("first_week"), 1L).otherwise(0L))
          .as("returning_users"),
        count(lit(1)).as("active_users"))
  }

  /** Join-key skew diagnostic: per event type, the log2-bucketed
    * frequency histogram of per-user event counts — how many keys
    * carry 1 row, 2–3, 4–7, … — plus each bucket's row mass. This is
    * the planning query behind every salting/AQE-skew decision (q59/
    * q131 APPLY the mitigation; this measures whether it's needed and
    * how hot the head is). `length(bin(freq)) - 1` is floor(log2) in
    * pure integer arithmetic on both engines — no float log.
    *
    * Scale shape: one keyed aggregation to (type, user) counts, then a
    * second hash aggregate to |types|·|buckets| rows. Nothing else.
    */
  def keySkewHistogram: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("freq"))
      .withColumn("bucket", expr("cast(length(bin(freq)) - 1 as int)"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_keys"), sum("freq").as("n_rows"),
        min("freq").as("min_freq"), max("freq").as("max_freq"))
  }

  /** Incremental sessionization: sessionize each time epoch
    * independently, then merge ONLY the epoch-boundary seams — and get
    * bit-identical results to re-sessionizing all history. This is the
    * incremental-view-maintenance answer for a non-algebraic windowed
    * operator (q130 did it for algebraic aggregates): yesterday's
    * sessions are never recomputed; a nightly run sessionizes the new
    * epoch and re-islands the per-user session INTERVALS, of which
    * only the boundary pair can fuse. 6-hour idle gap (visit blocks);
    * epochs split at 2024-01-16T00:00Z.
    *
    * Correctness: per-user sessions are disjoint, time-ordered
    * intervals, and the epoch split is a time cut — so `lag(e_us)` IS
    * the running max (the q166 nesting hazard can't arise) and one
    * islands pass over session intervals reproduces the full
    * computation exactly. Counts sum across fused parts.
    *
    * Scale shape: each epoch's sessionize is q120's one-exchange plan
    * over that epoch only; the merge pass runs over session-count
    * rows, not events. The oracle sessionizes all history in one pass.
    */
  def incrementalSessions: Q = (s, d) => {
    val gapUs = 6L * 3600L * 1000000L
    val boundaryUs = 1705363200000000L // 2024-01-16T00:00:00Z
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
    def sessionize(df: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      df.withColumn("prev", lag("t_us", 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("t_us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("blk", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "blk")
        .agg(count(lit(1)).as("n_events"),
          min("t_us").as("s_us"), max("t_us").as("e_us"))
    }
    val parts = sessionize(ev.where(col("t_us") < boundaryUs))
      .unionAll(sessionize(ev.where(col("t_us") >= boundaryUs)))
    val w2 = Window.partitionBy("user_id").orderBy("s_us")
    parts
      .withColumn("prev_e", lag("e_us", 1).over(w2))
      .withColumn("brk",
        when(col("prev_e").isNull || col("s_us") - col("prev_e") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(w2.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(sum("n_events").as("n_events"),
        min("s_us").as("s_us"), max("e_us").as("e_us"))
      .withColumn("dur_us", col("e_us") - col("s_us"))
  }

  val queries: Map[String, Q] = Map(
    "q215_session_quality" -> sessionQuality,
    "q211_attribution_compare" -> attributionCompare,
    "q207_key_skew" -> keySkewHistogram,
    "q208_incremental_sessions" -> incrementalSessions,
    "q203_stickiness" -> stickiness,
    "q204_new_returning" -> newVsReturning,
    "q206_rolling_sketch" -> rollingDistinctSketchChecked,
    "q188_fifo_match" -> fifoMatch,
    "q154_event_paths" -> eventPaths,
    "q166_interval_merge" -> intervalMerge,
    "q171_journey_trigrams" -> journeyTrigrams,
    "q173_attribution" -> lastTouchAttribution,
    "q174_drift_tvd" -> driftTvd,
    "q186_activity_heatmap" -> activityHeatmap,
    "q120_sessionize" -> sessionize,
    "q121_anomaly" -> anomaly,
    "q122_transitions" -> transitions,
    "q123_rolling_distinct" -> rollingDistinct,
    "q124_profile" -> profile)

  val oracles: Map[String, String] = Map(
    // sketch-audit oracle (q206): exact rolling distinct recomputed by
    // DuckDB (q123's SQL), accuracy boolean asserted as literal TRUE
    "q206_rolling_sketch" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS target_day FROM ud),
        |x AS (
        |  SELECT ud.user_id,
        |    CAST(unnest(generate_series(CAST(ud.day AS TIMESTAMP),
        |                                CAST(ud.day AS TIMESTAMP) + INTERVAL 6 DAY,
        |                                INTERVAL 1 DAY)) AS DATE) AS target_day
        |  FROM ud)
        |SELECT x.target_day, count(DISTINCT x.user_id) AS u7_exact,
        |  TRUE AS est_within_5pct
        |FROM x JOIN days USING (target_day)
        |GROUP BY 1""".stripMargin,
    "q215_session_quality" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(CASE WHEN prev_ts IS NULL
        |                    OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM g),
        |ses AS (
        |  SELECT CAST(min(ts) AS DATE) AS day, count(*) AS n_events,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM s GROUP BY user_id, session_seq),
        |agg AS (
        |  SELECT day, count(*) AS n_sessions,
        |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bounces,
        |    CAST(sum(n_events) AS BIGINT) AS events,
        |    CAST(sum(dur_us) AS BIGINT) AS dur_us
        |  FROM ses GROUP BY day)
        |SELECT day, n_sessions, bounces,
        |  CAST(bounces * 1000000 // n_sessions AS BIGINT) AS bounce_ppm,
        |  CAST(events // n_sessions AS BIGINT) AS mean_events,
        |  CAST((dur_us // n_sessions) // 1000000 AS BIGINT) AS mean_dur_secs
        |FROM agg""".stripMargin,
    "q211_attribution_compare" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t_us,
        |    coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0)
        |      AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_type, cents,
        |    first_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (wp RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (wp RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |      AS last_touch
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us))
        |SELECT coalesce(first_touch, 'direct') AS first_credit,
        |  coalesce(last_touch, 'direct') AS last_credit,
        |  count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin,
    "q207_key_skew" ->
      """WITH f AS (
        |  SELECT event_type, user_id, count(*) AS freq
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(length(bin(freq)) - 1 AS INT) AS bucket,
        |  count(*) AS n_keys, CAST(sum(freq) AS BIGINT) AS n_rows,
        |  min(freq) AS min_freq, max(freq) AS max_freq
        |FROM f GROUP BY 1, 2""".stripMargin,
    // the oracle sessionizes ALL history in one pass — the registered
    // epoch-split-and-merge plan must reproduce it bit-identically
    "q208_incremental_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
        |x AS (
        |  SELECT user_id, t_us, event_id,
        |    CASE WHEN lag(t_us) OVER w IS NULL
        |           OR t_us - lag(t_us) OVER w > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |b AS (
        |  SELECT user_id, t_us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM x)
        |SELECT user_id, sid, count(*) AS n_events,
        |  min(t_us) AS s_us, max(t_us) AS e_us,
        |  max(t_us) - min(t_us) AS dur_us
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q203_stickiness" ->
      """WITH daily AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('month', ts) AS DATE) AS month,
        |    CAST(ts AS DATE) AS day
        |  FROM events),
        |dau AS (SELECT month, day, count(*) AS dau FROM daily GROUP BY 1, 2),
        |m AS (SELECT month, count(*) AS n_days,
        |        CAST(sum(dau) AS BIGINT) AS sum_dau FROM dau GROUP BY month),
        |mau AS (SELECT month, count(*) AS mau
        |        FROM (SELECT DISTINCT user_id,
        |                CAST(date_trunc('month', ts) AS DATE) AS month
        |              FROM events) GROUP BY month)
        |SELECT m.month, n_days, sum_dau, mau,
        |  CAST(sum_dau * 1000000 // (n_days * mau) AS BIGINT) AS stickiness_ppm
        |FROM m JOIN mau USING (month)""".stripMargin,
    "q204_new_returning" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS first_week
        |      FROM weeks GROUP BY user_id)
        |SELECT week,
        |  CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN week > first_week THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users,
        |  count(*) AS active_users
        |FROM weeks JOIN f USING (user_id) GROUP BY week""".stripMargin,
    "q188_fifo_match" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t_us,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS k
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT user_id, k, t_us AS click_us FROM ranked
        |      WHERE event_type = 'click'),
        |b AS (SELECT user_id, k, t_us AS buy_us FROM ranked
        |      WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n_matched,
        |  CAST(sum(buy_us - click_us) AS BIGINT) AS sum_lag_us,
        |  CAST(sum(CASE WHEN buy_us >= click_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_in_order
        |FROM c JOIN b USING (user_id, k)
        |GROUP BY user_id""".stripMargin,
    "q186_activity_heatmap" ->
      """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(hour(ts) AS INT) AS hr,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS purchase_cents
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q173_attribution" ->
      """WITH w AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_us,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_type
        |  FROM events)
        |SELECT event_id, user_id,
        |  CASE WHEN touch_us IS NOT NULL
        |         AND t_us - touch_us <= 604800000000 THEN touch_type
        |       ELSE 'direct' END AS credit,
        |  CASE WHEN touch_us IS NOT NULL
        |         AND t_us - touch_us <= 604800000000
        |       THEN (t_us - touch_us) // 1000000 END AS latency_secs
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "q174_drift_tvd" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS epoch,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 2000 AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT event_type, epoch, bin, count(*) AS n
        |  FROM b GROUP BY 1, 2, 3),
        |p AS (
        |  SELECT event_type, bin, epoch,
        |    (n * 1000000) // sum(n) OVER (PARTITION BY event_type, epoch)
        |      AS ppm
        |  FROM c),
        |pv AS (
        |  SELECT event_type, bin,
        |    sum(CASE WHEN epoch = 0 THEN ppm ELSE 0 END) AS p0,
        |    sum(CASE WHEN epoch = 1 THEN ppm ELSE 0 END) AS p1
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_bins,
        |  CAST(sum(abs(p0 - p1)) // 2 AS BIGINT) AS tvd_ppm
        |FROM pv GROUP BY event_type""".stripMargin,
    "q166_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + 1800000000 AS e_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, s_us, e_us,
        |    max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_e
        |  FROM iv),
        |b AS (
        |  SELECT user_id, s_us, e_us,
        |    sum(CASE WHEN max_prev_e IS NULL OR s_us > max_prev_e
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS block_seq
        |  FROM m)
        |SELECT user_id, CAST(block_seq AS BIGINT) AS block_seq,
        |  count(*) AS n_events, min(s_us) AS start_us, max(e_us) AS end_us,
        |  max(e_us) - min(s_us) AS coverage_us
        |FROM b GROUP BY user_id, block_seq""".stripMargin,
    "q171_journey_trigrams" ->
      """WITH t AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n
        |FROM t WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3
        |LIMIT 20""".stripMargin,
    "q154_event_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        |    count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events, path,
        |  regexp_matches(path, '^signup') AS starts_signup,
        |  regexp_matches(path, 'error>error>error') AS error_burst,
        |  regexp_matches(path, 'purchase>error>purchase') AS recovered
        |FROM p""".stripMargin,
    "q120_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(CASE WHEN prev_ts IS NULL
        |                    OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    "q121_anomaly" ->
      """WITH b AS (
        |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS q
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, count(*) AS n_outliers, CAST(max(b.x) AS BIGINT) AS max_cents
        |FROM b JOIN st USING (event_type)
        |WHERE (b.x * st.n - st.s) * (b.x * st.n - st.s) > 4 * (st.n * st.q - st.s * st.s)
        |GROUP BY b.event_type""".stripMargin,
    "q122_transitions" ->
      """WITH bi AS (
        |  SELECT prev_type, event_type AS next_type FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL),
        |cnt AS (SELECT prev_type, next_type, count(*) AS n FROM bi GROUP BY 1, 2),
        |tot AS (SELECT prev_type, sum(n) AS total FROM cnt GROUP BY 1)
        |SELECT cnt.prev_type, cnt.next_type, cnt.n,
        |  (cnt.n * 1000000) // CAST(tot.total AS BIGINT) AS ppm
        |FROM cnt JOIN tot USING (prev_type)""".stripMargin,
    "q123_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS target_day FROM ud),
        |x AS (
        |  SELECT ud.user_id,
        |    CAST(unnest(generate_series(CAST(ud.day AS TIMESTAMP),
        |                                CAST(ud.day AS TIMESTAMP) + INTERVAL 6 DAY,
        |                                INTERVAL 1 DAY)) AS DATE) AS target_day
        |  FROM ud)
        |SELECT x.target_day, count(DISTINCT x.user_id) AS u7
        |FROM x JOIN days USING (target_day)
        |GROUP BY 1""".stripMargin,
    "q124_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |    CAST(min(o_orderkey) AS VARCHAR) AS mn1, CAST(max(o_orderkey) AS VARCHAR) AS mx1,
        |    count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn2, CAST(max(o_custkey) AS VARCHAR) AS mx2,
        |    count(o_orderstatus) AS nn3, count(DISTINCT o_orderstatus) AS nd3,
        |    min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
        |    count(o_totalprice) AS nn4,
        |    count(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS nd4,
        |    CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS mn4,
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS mx4,
        |    count(o_orderdate) AS nn5, count(DISTINCT CAST(o_orderdate AS DATE)) AS nd5,
        |    CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mn5,
        |    CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mx5,
        |    count(o_orderpriority) AS nn6, count(DISTINCT o_orderpriority) AS nd6,
        |    min(o_orderpriority) AS mn6, max(o_orderpriority) AS mx6
        |  FROM orders)
        |SELECT n_rows, 'o_orderkey' AS col_name, nn1 AS n_nonnull, nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr FROM a
        |UNION ALL SELECT n_rows, 'o_custkey', nn2, nd2, mn2, mx2 FROM a
        |UNION ALL SELECT n_rows, 'o_orderstatus', nn3, nd3, mn3, mx3 FROM a
        |UNION ALL SELECT n_rows, 'o_totalprice', nn4, nd4, mn4, mx4 FROM a
        |UNION ALL SELECT n_rows, 'o_orderdate', nn5, nd5, mn5, mx5 FROM a
        |UNION ALL SELECT n_rows, 'o_orderpriority', nn6, nd6, mn6, mx6 FROM a""".stripMargin)
}
