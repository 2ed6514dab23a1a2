package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The materialized-view rewrite's contract: a qualifying aggregate
  * scans ONLY the summary, every non-qualifying shape is left alone,
  * and on/off answers are identical (the oracle proves exactness
  * against DuckDB; these pin the plan-level behavior a hash can't).
  */
class SummaryRewriteSpec extends SparkSpec {

  private def enable(): Unit = {
    graft.ops.Scale.ensureLineitemSummary(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
  }

  private def naturalAgg = Tables.lineitem(spark, sf)
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
      min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))

  test("qualifying aggregate scans the summary, not the fact table") {
    enable()
    try {
      val plan = naturalAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"),
        "rewritten plan still scans the fact table")
      // answers identical with the rule off
      val on = naturalAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = naturalAgg.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("non-qualifying shapes are left on the fact table") {
    enable()
    try {
      def factScan(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("lineitem.parquet")
      // different grouping column
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))))
      // a filter between aggregate and scan changes the grain
      assert(factScan(Tables.lineitem(spark, sf)
        .where(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
      // a measure the summary does not carry
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(sum("l_partkey").as("sp"))))
      // DISTINCT disqualifies even a carried column
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("nd"))))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }
}
