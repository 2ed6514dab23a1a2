package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive theta join and plans as a hash join") {
    import spark.implicits._
    val bandDf = RangeJoin.bands.toDF("band_name", "lo", "hi")
    val viaBuckets = RangeJoin.priceBands(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val naive = Tables.lineitem(spark, sf)
      .join(bandDf, col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band_name").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBuckets === naive)
    // the whole point: the join runs on the bucket equi-key, not as a
    // nested loop over the range predicate
    val plan = RangeJoin.priceBands(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"expected equi join:\n$plan")
  }

  test("a value on a band boundary lands in exactly one band (hi exclusive)") {
    import spark.implicits._
    val left = Seq(20000.0, 19999.99, 0.0).toDF("v")
    val bandDf = RangeJoin.bands.toDF("band_name", "lo", "hi")
    val out = RangeJoin.bucketed(left, "v", bandDf, "lo", "hi", 5000.0)
      .select("v", "band_name").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(out === Set((20000.0, "band_01"), (19999.99, "band_00"), (0.0, "band_00")))
  }
}
