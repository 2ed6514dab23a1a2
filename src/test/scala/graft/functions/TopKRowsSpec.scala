package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKRowsSpec extends SparkSpec {

  test("topk_rows equals the window formulation under forced partial merges") {
    GraftFunctions.register(spark)
    val li = graft.Tables.lineitem(spark, sf).repartition(16) // many partials per group
    val viaAgg = li.groupBy("l_returnflag")
      .agg(expr("topk_rows(l_extendedprice, l_orderkey, l_linenumber, 5)").as("top"))
      .select(col("l_returnflag"), explode(col("top")).as("t"))
      .select(col("l_returnflag"), col("t.rn"), col("t.l_orderkey"), col("t.l_linenumber"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val viaWindow = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("l_returnflag"), col("rn"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("topk_rows with k larger than the group returns the whole group ranked") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val tiny = Seq((1.0, 10L, 1), (3.0, 11L, 2), (2.0, 12L, 3)).toDF("p", "o", "l")
    val out = tiny.agg(expr("topk_rows(p, o, l, 10)").as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.rn"), col("t.l_orderkey")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toList
    assert(out === List((1, 11L), (2, 12L), (3, 10L)))
  }
}
