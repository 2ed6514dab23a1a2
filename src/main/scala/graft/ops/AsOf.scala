package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, Q] = Map(
    "q38_asof_join" -> purchaseAfterSignup,
    "q100_asof_native" -> purchaseAfterSignupNative,
    "q192_asof_forward" -> clickToNextPurchase)

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
        |  ON a.user_id = b.user_id AND a.t_us <= b.t_us""".stripMargin)
}
