package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics pins for the analytics operators (the exact-value gate is
  * the DuckDB oracle; these pin the invariants a hash compare can't
  * explain when it breaks).
  */
class AnalyticsSpec extends SparkSpec {

  test("funnel stages are monotonically non-increasing and ordered") {
    val rows = AnalyticsQueries.funnel(spark, sf)
      .orderBy("stage_ord").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("view", "click", "purchase"))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel widened downstream: ${counts.mkString(",")}")
  }

  test("retention offsets are non-negative and cohort sizes bound retained users") {
    val df = AnalyticsQueries.retention(spark, sf)
    assert(df.where(col("week_offset") < 0).count() === 0)
    val cohortUsers = graft.Tables.events(spark, sf)
      .where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val maxRetained = df.agg(max("n_users")).head().getLong(0)
    assert(maxRetained <= cohortUsers)
  }

  test("pareto frontier members are mutually non-dominating and dominate the rest") {
    val rows = AnalyticsQueries.paretoFrontier(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    for (a <- rows; b <- rows if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates fellow frontier member $b")
    // every frontier row survives against the full table by construction
    // (oracle-checked); spot-check: the globally cheapest part's size is
    // covered by some frontier member at its price or cheaper
    val part = graft.Tables.part(spark, sf)
    val cheapest = part.orderBy(col("p_retailprice"), col("p_size").desc).head()
    assert(rows.exists { case (pr, sz) =>
      pr <= cheapest.getDouble(cheapest.fieldIndex("p_retailprice")) &&
        sz >= cheapest.getInt(cheapest.fieldIndex("p_size"))
    })
  }

  test("merge apply: deletes vanish, updates take the change balance, keeps pass through") {
    val out = AnalyticsQueries.mergeApply(spark, sf)
    val actions = out.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet.subsetOf(Set("kept", "updated", "inserted")))
    // urgent latest-F customers must not appear at all
    val customers = graft.Tables.customer(spark, sf).count()
    val deleted = customers + actions.getOrElse("inserted", 0L) -
      out.count()
    assert(deleted > 0, "corpus has latest-urgent-F customers; none were deleted")
  }

  test("activity bitmap popcount equals distinct active days") {
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.groupBy(col("user_id"), month(col("ts")).as("m"))
      .agg(countDistinct(dayofmonth(col("ts"))).as("d")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    AnalyticsQueries.activityBitmap(spark, sf).collect().foreach { r =>
      assert(r.getInt(3).toLong === expected((r.getLong(0), r.getInt(1))))
    }
  }

  test("inverted index: df equals posting length, postings strictly increasing") {
    AnalyticsQueries.invertedIndex(spark, sf).collect().foreach { r =>
      val postings = r.getSeq[Long](2)
      assert(postings.length.toLong === r.getLong(1))
      assert(postings.zip(postings.tail).forall { case (a, b) => a < b },
        s"postings not strictly sorted for term ${r.getString(0)}")
    }
  }

  test("edit-distance join emits each unordered pair once, under threshold") {
    val rows = AnalyticsQueries.editDistanceJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (a, b, d) => a < b && d <= 8 })
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }
}
