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

  val queries: Map[String, Q] = Map(
    "q55_range_join" -> priceBands,
    "q86_range_join_rule" -> priceBandsAuto)

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
    "q86_range_join_rule" -> bandsOracle)
}
