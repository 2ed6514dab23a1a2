package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed range-join rewrite: a natural BETWEEN join must plan as
  * an equi join on bucket ids (no nested loop), return exactly the
  * nested-loop baseline's rows — boundaries included — and leave every
  * other join untouched.
  */
class BucketedRangeJoinSpec extends SparkSpec {

  private def withRule[A](width: Option[String])(body: => A): A = {
    BucketedRangeJoin.install(spark)
    width.foreach(w => spark.conf.set(BucketedRangeJoin.WidthKey, w))
    try body
    finally spark.conf.unset(BucketedRangeJoin.WidthKey)
  }

  /** values hammer the quantization edges: exactly on bucket multiples,
    * just under an interval's exclusive hi, negative, and far outside
    * every interval.
    */
  private def probeDf: DataFrame = {
    import spark.implicits._
    Seq(-10.0, -0.001, 0.0, 9.999999999, 10.0, 10.000001, 19.999999999,
      20.0, 25.0, 29.999999999, 30.0, 49.999999999, 50.0, 99.0)
      .zipWithIndex.map(_.swap).toDF("id", "v")
  }

  private def intervalDf: DataFrame = {
    import spark.implicits._
    // [lo, hi) bands: aligned, unaligned, sub-bucket-width, negative
    Seq(("a", 0.0, 20.0), ("b", 10.0, 30.0), ("c", 25.0, 27.5),
      ("d", -15.0, 0.0), ("e", 49.0, 50.0))
      .toDF("name", "lo", "hi")
  }

  private def joined(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "v", "name")

  private def rows(df: DataFrame): Set[(Int, Double, String)] =
    df.collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet

  test("rewrites a pure range join to an equi join with identical rows") {
    val baseline = rows(joined(probeDf, intervalDf)) // no width set -> BNLJ
    assert(baseline.nonEmpty)
    withRule(Some("7.0")) { // width deliberately unaligned with the bands
      val df = joined(probeDf, intervalDf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join did not rewrite:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"no equi join in rewritten plan:\n$plan")
      assert(rows(df) === baseline)
    }
  }

  test("probe side on the right rewrites too") {
    val baseline = rows(joined(probeDf, intervalDf))
    withRule(Some("10.0")) {
      val df = intervalDf.join(probeDf,
          col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "v", "name")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"mirror form missed:\n$plan")
      assert(rows(df) === baseline)
    }
  }

  test("no width configured -> rule is a no-op and the BNLJ remains") {
    withRule(None) {
      val plan = joined(probeDf, intervalDf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("equi joins and 3-conjunct conditions are left alone") {
    withRule(Some("10.0")) {
      import spark.implicits._
      val l = Seq((1, 5.0), (2, 15.0)).toDF("k", "v")
      val r = Seq((1, 0.0, 10.0), (2, 10.0, 20.0)).toDF("k", "lo", "hi")
      val equiPlus = l.join(r,
        l("k") === r("k") && col("v") >= col("lo") && col("v") < col("hi"))
      val plan = equiPlus.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_bucket"), s"equi+range join was rewritten:\n$plan")
      assert(equiPlus.count() === 2)
    }
  }

  test("integer and decimal probe types bucket correctly") {
    import spark.implicits._
    val l = Seq((1, 5), (2, 10), (3, 19), (4, 20), (5, 35)).toDF("id", "v")
    val r = Seq(("x", 0, 20), ("y", 20, 40)).toDF("name", "lo", "hi")
    val baseline = l.join(r, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "name").collect().map(x => (x.getInt(0), x.getString(1))).toSet
    withRule(Some("6.0")) {
      val df = l.join(r, col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "name")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.collect().map(x => (x.getInt(0), x.getString(1))).toSet === baseline)
      // decimal probe against int interval bounds
      val ld = l.select(col("id"), col("v").cast("decimal(10,2)").as("v"))
      val dfd = ld.join(r, col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "name")
      assert(dfd.collect().map(x => (x.getInt(0), x.getString(1))).toSet === baseline)
    }
  }

  test("inclusive upper bounds keep boundary rows") {
    val incl = (l: DataFrame, r: DataFrame) =>
      l.join(r, col("v") >= col("lo") && col("v") <= col("hi"))
        .select("id", "v", "name")
    val baseline = rows(incl(probeDf, intervalDf))
    withRule(Some("20.0")) {
      val df = incl(probeDf, intervalDf)
      assert(rows(df) === baseline)
      // hi = 20.0 inclusive sits exactly on a bucket multiple: v = 20.0
      // must survive the rewrite (upper bucket floor(hi/W), no epsilon)
      assert(rows(df).exists { case (_, v, n) => v == 20.0 && n == "b" })
    }
  }
}
