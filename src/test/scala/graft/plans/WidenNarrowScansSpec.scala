package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class WidenNarrowScansSpec extends SparkSpec {

  private def agg = Tables.lineitem(spark, sf)
    .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))

  private def withRule[A](enabled: Boolean)(body: => A): A = {
    WidenNarrowScans.install(spark)
    // exclusive enablement: q240's MV rewrite (left enabled
    // session-wide once its query runs) would answer this spec's
    // count-by-flag from the summary — a strictly better plan with no
    // scan left to widen
    withOnlyGraftRule(
      if (enabled) Some(WidenNarrowScans.EnabledKey) else None)(body)
  }

  test("widens an aggregate over a single-file scan and preserves the answer") {
    val plain = agg.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    withRule(enabled = true) {
      val df = agg
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Repartition"), optimized)
      val widened = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(widened === plain)
    }
  }

  test("does nothing when disabled") {
    withRule(enabled = false) {
      assert(!agg.queryExecution.optimizedPlan.toString.contains("Repartition"))
    }
  }

  test("does not fire on a source that already fills the cluster") {
    val path = s"${Tables.scratchDir}/widen-many-files"
    Tables.lineitem(spark, sf).select("l_returnflag")
      .repartition(spark.sparkContext.defaultParallelism + 1)
      .write.mode("overwrite").parquet(path)
    withRule(enabled = true) {
      val df = spark.read.parquet(path)
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("Repartition"))
    }
  }
}
