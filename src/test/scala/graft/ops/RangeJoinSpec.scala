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

  test("interval overlap equals a brute pairwise scan over merged sessions") {
    val got = RangeJoin.intervalOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute replay: merge 5-min sessions per (user, type) on the driver,
    // then all-pairs overlap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) as t")
      .where(col("event_type").isin("view", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def sessions(tpe: String): Seq[(Long, Long)] =
      ev.filter(_._3 == tpe).groupBy(_._1).values.flatMap { rows =>
        val sorted = rows.sortBy(r => (r._4, r._2))
        val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for ((_, _, _, t) <- sorted) {
          val e = t + 300000000L
          if (blocks.nonEmpty && t <= blocks.last._2)
            blocks(blocks.length - 1) = (blocks.last._1, math.max(blocks.last._2, e))
          else blocks += ((t, e))
        }
        blocks
      }.toSeq
    val pairs = for {
      (as, ae) <- sessions("view")
      (bs, be) <- sessions("purchase")
      if as <= be && bs <= ae
    } yield (math.max(as, bs) / 86400000000L,
      math.min(ae, be) - math.max(as, bs))
    val want = pairs.groupBy(_._1)
      .map { case (d, ps) => (d, ps.size.toLong, ps.map(_._2).sum) }.toSet
    assert(got.nonEmpty && got === want)
    val plan = RangeJoin.intervalOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
