package graft.ops

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** `Dataset.observe` — metrics piggybacked on a production query (row
  * counts, quality aggregates) without a second pass over the data: the
  * observability surface a pipeline uses to publish per-batch stats
  * alongside its output.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe reports exact pipeline metrics without a second scan") {
    val obs = Observation("lineitem_audit")
    val df = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"),
        sum(col("l_discount").isNull.cast("long")).as("null_discounts"))
      .where(col("l_quantity") > 25) // metrics observe the PRE-filter rows
    val filtered = df.count()
    val m = obs.get
    val expectedRows = Tables.lineitem(spark, sf).count()
    val expectedQty = Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(m("rows_seen") === expectedRows)
    assert(m("total_qty") === expectedQty)
    assert(m("null_discounts") === 0L)
    assert(filtered < expectedRows) // the filter actually filtered
  }
}
