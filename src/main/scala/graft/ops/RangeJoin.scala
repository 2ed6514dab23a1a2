package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval-containment) join via bucketed-equi prefilter — the
  * scale form of `l JOIN r ON l.v >= r.lo AND l.v < r.hi` (SURVEY.md
  * §2.3 "range via bucketed equi-key prefilter").
  *
  * A naive theta join is a nested-loop over |left| x |right|. Instead:
  * quantize the value domain into fixed-width buckets, explode each
  * right-side interval into the buckets it covers, and join on the
  * bucket id as an EQUI key with the range predicate left as a residual.
  * The join becomes hash/sort-merge partitionable on the bucket id, and
  * each left row meets only the intervals sharing its bucket — O(1)
  * fan-out per row for non-overlapping bands, instead of |right|.
  */
object RangeJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Join `left` to interval table `right` (`lo` inclusive, `hi`
    * exclusive) on `leftVal` ∈ [lo, hi) using `bucketWidth` quantization.
    */
  def bucketed(left: DataFrame, leftVal: String,
               right: DataFrame, lo: String, hi: String,
               bucketWidth: Double): DataFrame = {
    val buckets = right.withColumn("_bucket", explode(expr(
      s"sequence(cast(floor($lo / $bucketWidth) as bigint), " +
        s"cast(floor(($hi - 1e-9) / $bucketWidth) as bigint))")))
    val probe = left.withColumn("_bucket",
      floor(col(leftVal) / bucketWidth).cast("bigint"))
    probe.join(buckets, Seq("_bucket"))
      .where(col(leftVal) >= col(lo) && col(leftVal) < col(hi))
      .drop("_bucket")
  }

  /** Price bands over lineitem (10 x 20k bands, 5k buckets → each band
    * explodes into 4 bucket rows). Oracle: the plain BETWEEN join.
    */
  val bands: Seq[(String, Double, Double)] =
    (0 until 10).map(i => (f"band_$i%02d", i * 20000.0, (i + 1) * 20000.0))

  def priceBands: Q = (s, d) => {
    import s.implicits._
    val bandDf = bands.toDF("band_name", "lo", "hi")
    bucketed(Tables.lineitem(s, d), "l_extendedprice", bandDf, "lo", "hi", 5000.0)
      .groupBy("band_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
  }

  /** Same bands, but written as the NATURAL range join — no manual
    * bucketing in the query. The [[graft.plans.BucketedRangeJoin]]
    * optimizer rule (width 5000, matching [[priceBands]]'s manual
    * quantization) rewrites it to the bucketed equi form at plan time;
    * BucketedRangeJoinSpec pins that no nested-loop join survives. Same
    * oracle as q55: declared form and hand-bucketed form must agree
    * exactly.
    */
  def priceBandsAuto: Q = (s, d) => {
    import s.implicits._
    graft.plans.BucketedRangeJoin.install(s)
    s.conf.set(graft.plans.BucketedRangeJoin.WidthKey, "5000")
    val bandDf = bands.toDF("band_name", "lo", "hi")
    Tables.lineitem(s, d)
      .join(bandDf, col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
  }

  /** Merged activity sessions for one event type: each event opens a
    * 5-minute interval; overlapping intervals per (user, type) merge
    * into maximal blocks (q166's running-max islands, tighter TTL).
    * Output: one `[s_us, e_us]` interval row per session.
    */
  private def sessions(s: SparkSession, d: String, tpe: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    Tables.events(s, d).where(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"))
      .withColumn("e_us", col("s_us") + lit(300L * 1000000L))
      .withColumn("max_prev_e",
        max("e_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("max_prev_e").isNull || col("s_us") > col("max_prev_e"), 1L)
          .otherwise(0L))
      .withColumn("blk",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "blk")
      .agg(min("s_us").as("s_us"), max("e_us").as("e_us"))
      .select("user_id", "s_us", "e_us")
  }

  /** q194: interval × interval OVERLAP join with BOTH sides large — the
    * generalization of q55's point-in-range join that neither an equi
    * join nor the BETWEEN rewrite covers: all (view-session,
    * purchase-session) pairs whose time intervals intersect, aggregated
    * to concurrent-activity stats per day. The canonical form of
    * "which browsing bursts coincided with buying bursts", ad-exposure
    * overlap, and conflict detection.
    *
    * Scale shape (the published partition-overlap-join design): the
    * time axis is cut into 1-hour cells; each interval explodes into
    * the cells it covers (bounded by interval length — merged 5-min
    * sessions stay minutes long), candidates come from the cell EQUI
    * join, and a pair is counted exactly once WITHOUT a distinct: only
    * in the cell containing the overlap start (`greatest(a.s, b.s)`).
    * A naive theta join is |A|×|B| nested-loop; this is one keyed
    * shuffle per side. The exact overlap predicate runs as a residual
    * filter, so the cell width is pure performance tuning — the answer
    * never changes.
    */
  def intervalOverlap: Q = (s, d) => {
    val cellW = 3600L * 1000000L
    def cells(df: DataFrame, p: String): DataFrame = df
      .select(col("user_id").as(s"${p}_user"),
        col("s_us").as(s"${p}_s"), col("e_us").as(s"${p}_e"))
      .withColumn("cell", explode(expr(
        s"sequence(${p}_s div ${cellW}L, ${p}_e div ${cellW}L)")))
    cells(sessions(s, d, "view"), "a")
      .join(cells(sessions(s, d, "purchase"), "b"), Seq("cell"))
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .where(col("cell") ===
        expr(s"greatest(a_s, b_s) div ${cellW}L"))
      .select(
        expr("greatest(a_s, b_s) div 86400000000L").as("day"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("ov_us"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_pairs"), sum("ov_us").as("overlap_us"))
  }

  val queries: Map[String, Q] = Map(
    "q55_range_join" -> priceBands,
    "q86_range_join_rule" -> priceBandsAuto,
    "q194_interval_overlap" -> intervalOverlap)

  private def bandsOracle: String = {
    val values = bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    s"""WITH bands(band_name, lo, hi) AS (VALUES $values)
       |SELECT band_name, count(*) AS cnt,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM lineitem JOIN bands
       |  ON l_extendedprice >= lo AND l_extendedprice < hi
       |GROUP BY band_name""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q55_range_join" -> bandsOracle,
    "q86_range_join_rule" -> bandsOracle,
    // the cell-bucketed plan must equal the naive inequality join; the
    // oracle keeps the theta form (DuckDB plans it as an IEJoin)
    "q194_interval_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS s_us
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |m AS (
        |  SELECT user_id, event_type, event_id, s_us,
        |    s_us + 300000000 AS e_us,
        |    CASE WHEN s_us > coalesce(max(s_us + 300000000) OVER (
        |        PARTITION BY user_id, event_type ORDER BY s_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (
        |  SELECT user_id, event_type, s_us, e_us,
        |    sum(brk) OVER (PARTITION BY user_id, event_type
        |      ORDER BY s_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk
        |  FROM m),
        |ses AS (
        |  SELECT user_id, event_type, blk,
        |    min(s_us) AS s_us, max(e_us) AS e_us
        |  FROM g GROUP BY user_id, event_type, blk)
        |SELECT greatest(a.s_us, b.s_us) // 86400000000 AS day,
        |  count(*) AS n_pairs,
        |  CAST(sum(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))
        |    AS BIGINT) AS overlap_us
        |FROM (SELECT * FROM ses WHERE event_type = 'view') a
        |JOIN (SELECT * FROM ses WHERE event_type = 'purchase') b
        |  ON a.s_us <= b.e_us AND b.s_us <= a.e_us
        |GROUP BY 1""".stripMargin)
}
