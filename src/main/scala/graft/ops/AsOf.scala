package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (most-recent-at-or-before) join — an operator Spark lacks
  * natively, composed from built-ins per the preference order in the
  * build brief: union-tag both sides, one window pass per key ordered by
  * time (right rows sorting before left rows at equal timestamps makes
  * the match inclusive), then `last(value, ignoreNulls)` carries the
  * latest right-side value forward to each left row.
  *
  * Scale shape: a single hash-partitioned shuffle on the key + one sort —
  * the same cost as the sort-merge join an engine with a native as-of
  * operator would run; no range explosion, no per-row subqueries.
  */
object AsOf {
  type Q = (SparkSession, String) => DataFrame

  /** Join each left row to the latest right row with the same `key` and
    * `rightTime <= leftTime`, appending right's `valueCol` as
    * `<valueCol>_asof`. Inner semantics: left rows with no prior right
    * row are dropped. The carried match is a struct wrapping the value,
    * so a right row whose value IS null still matches (and yields null)
    * rather than falling through to an older non-null row. If several
    * right rows share one (key, time), which one matches is unspecified
    * (mirroring the reference's unordered-output stance); pre-dedup the
    * right side for full determinism.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, valueCol: String): DataFrame = {
    val payloadT = org.apache.spark.sql.types.StructType(left.schema.fields)
    val vT = right.schema(valueCol).dataType
    val wrapT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vT)))
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(0).as("_r"),
      lit(null).cast(wrapT).as("_v"), struct(left.columns.toIndexedSeq.map(col): _*).as("_p"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(1).as("_r"),
      struct(col(valueCol).as("v")).as("_v"), lit(null).cast(payloadT).as("_p"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_r").desc) // right first at equal time → inclusive
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_match", last(col("_v"), ignoreNulls = true).over(w))
      .where(col("_r") === 0 && col("_match").isNotNull)
      .select(col("_p.*"), col("_match.v").as(s"${valueCol}_asof"))
  }

  /** Forward as-of join — the time-mirrored sibling of [[asofJoin]]:
    * each left row matches the EARLIEST right row with the same `key`
    * and `rightTime >= leftTime` (inclusive). Same single-shuffle
    * union-tag design, with the window frame flipped to
    * `(currentRow, unboundedFollowing)` and left rows sorting before
    * right rows at equal timestamps so the at-time match is inclusive.
    * Inner semantics: left rows with no following right row are dropped.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String, valueCol: String): DataFrame = {
    val payloadT = org.apache.spark.sql.types.StructType(left.schema.fields)
    val vT = right.schema(valueCol).dataType
    val wrapT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vT)))
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(0).as("_r"),
      lit(null).cast(wrapT).as("_v"), struct(left.columns.toIndexedSeq.map(col): _*).as("_p"))
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(1).as("_r"),
      struct(col(valueCol).as("v")).as("_v"), lit(null).cast(payloadT).as("_p"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_r").asc) // left first at equal time → inclusive
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.union(r)
      .withColumn("_match", first(col("_v"), ignoreNulls = true).over(w))
      .where(col("_r") === 0 && col("_match").isNotNull)
      .select(col("_p.*"), col("_match.v").as(s"${valueCol}_next"))
  }

  /** q192: each click joined to the user's NEXT purchase at-or-after it
    * — time-to-next-conversion, the canonical forward-as-of question.
    * Times cross the engine boundary as epoch MICROSECONDS on both sides
    * (Spark truncates the parquet nanos at load; the oracle projects
    * `epoch_us` before its ASOF join) so sub-microsecond ordering can
    * never split the engines.
    */
  def clickToNextPurchase: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val buys = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        unix_micros(col("ts")).as("buy_us"))
    asofJoinForward(clicks, buys, "user_id", "t_us", "t_us", "buy_us")
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("buy_us_next").as("buy_us"),
        (col("buy_us_next") - col("t_us")).as("wait_us"))
  }

  /** q38: each purchase event joined to the user's most recent signup
    * at-or-before it (oracle: DuckDB's native ASOF JOIN).
    */
  def purchaseAfterSignup: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    asofJoin(purchases, signups, "user_id", "ts", "ts", "signup_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("signup_ts_asof").as("signup_ts"))
  }

  /** q100: q38 answered by the NATIVE as-of operator —
    * [[graft.plans.GraftAsOfJoin]]'s logical node + injected strategy +
    * single-merge-pass physical exec — against the same DuckDB ASOF
    * oracle, so the custom-operator tier is correctness-gated, not just
    * spec-pinned.
    */
  def purchaseAfterSignupNative: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    graft.plans.GraftAsOfJoin
      .asofJoin(purchases, signups, "user_id", "s_user", "ts", "s_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("s_ts").as("signup_ts"))
  }

  /** q209: NEAREST-event join — each click matched to the user's
    * purchase closest in time in EITHER direction, completing the as-of
    * family (q38 backward, q192 forward): the sensor-alignment /
    * "which transaction does this click belong to" primitive.
    * Semantics: the backward candidate is at-or-before (a same-micro
    * purchase counts as lag 0 before), the forward candidate strictly
    * after; the smaller |lag| wins and the backward side wins exact
    * cross-direction ties. Output lag is SIGNED raw micros (negative =
    * purchase preceded the click) — no division, so trunc-vs-floor on
    * negatives never arises (q188's rule).
    *
    * Scale shape: ONE user-keyed exchange + sort over the union of the
    * two event streams serves all four window reads (both directions ×
    * (time, id)); no self-join, no per-pair expansion — the same
    * one-sort economics as the window as-of, now bidirectional.
    */
  def nearestPurchase: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("r"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("r").asc, col("event_id").asc)
    val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
    def buyCol(c: Column): Column = when(col("r") === 0, c)
    ev
      .withColumn("pt", last(buyCol(col("t")), ignoreNulls = true).over(prevW))
      .withColumn("pid", last(buyCol(col("event_id")), ignoreNulls = true).over(prevW))
      .withColumn("nt", first(buyCol(col("t")), ignoreNulls = true).over(nextW))
      .withColumn("nid", first(buyCol(col("event_id")), ignoreNulls = true).over(nextW))
      .where(col("r") === 1 && (col("pt").isNotNull || col("nt").isNotNull))
      .withColumn("take_prev",
        col("nt").isNull || (col("pt").isNotNull &&
          col("t") - col("pt") <= col("nt") - col("t")))
      .select(col("user_id"), col("event_id"), col("t").as("t_click_us"),
        when(col("take_prev"), col("pid")).otherwise(col("nid")).as("buy_event_id"),
        (when(col("take_prev"), col("pt")).otherwise(col("nt")) - col("t"))
          .as("lag_us"),
        when(col("take_prev"), lit("before")).otherwise(lit("after"))
          .as("direction"))
  }

  val queries: Map[String, Q] = Map(
    "q38_asof_join" -> purchaseAfterSignup,
    "q100_asof_native" -> purchaseAfterSignupNative,
    "q192_asof_forward" -> clickToNextPurchase,
    "q209_nearest_event" -> nearestPurchase)

  private val asofOracle =
    """SELECT a.event_id, a.user_id, a.ts, b.ts AS signup_ts
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') a
      |ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') b
      |  ON a.user_id = b.user_id AND a.ts >= b.ts""".stripMargin

  val oracles: Map[String, String] = Map(
    "q38_asof_join" -> asofOracle,
    "q100_asof_native" -> asofOracle,
    // DuckDB's ASOF generalizes to the forward direction: `a.t <= b.t`
    // picks the smallest b.t at-or-after each left time
    "q192_asof_forward" ->
      """SELECT a.event_id, a.user_id, a.t_us, b.t_us AS buy_us,
        |  b.t_us - a.t_us AS wait_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
        |      WHERE event_type = 'click') a
        |ASOF JOIN (SELECT user_id, epoch_us(ts) AS t_us FROM events
        |           WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND a.t_us <= b.t_us""".stripMargin,
    // the same union-sort windows, purchases ordered before clicks at
    // equal (t) via r so at-or-before/strictly-after splits identically
    "q209_nearest_event" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS r
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT user_id, event_id, t, r,
        |    last_value(CASE WHEN r = 0 THEN t END IGNORE NULLS)
        |      OVER (wp ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    last_value(CASE WHEN r = 0 THEN event_id END IGNORE NULLS)
        |      OVER (wp ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
        |    first_value(CASE WHEN r = 0 THEN t END IGNORE NULLS)
        |      OVER (wp ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
        |    first_value(CASE WHEN r = 0 THEN event_id END IGNORE NULLS)
        |      OVER (wp ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nid
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY t, r, event_id))
        |SELECT user_id, event_id, t AS t_click_us,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL AND t - pt <= nt - t)
        |    THEN pid ELSE nid END AS buy_event_id,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL AND t - pt <= nt - t)
        |    THEN pt - t ELSE nt - t END AS lag_us,
        |  CASE WHEN nt IS NULL OR (pt IS NOT NULL AND t - pt <= nt - t)
        |    THEN 'before' ELSE 'after' END AS direction
        |FROM w
        |WHERE r = 1 AND (pt IS NOT NULL OR nt IS NOT NULL)""".stripMargin)
}
