package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductI64Spec extends SparkSpec {

  test("dot_i64 matches the HOF formulation (codegen and interpreted paths)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(1)
    val data = Seq.fill(100)((Seq.fill(64)(rnd.nextInt(2000).toLong - 1000),
      Seq.fill(64)(rnd.nextInt(2000).toLong - 1000)))
    val df = spark.createDataset(data).toDF("a", "b")
    val both = df.select(
      expr("dot_i64(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("dot_i64 handles unequal lengths (min) and nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    assert(df.select(expr("dot_i64(a, b)")).head.getLong(0) === 14L)
    val withNull = df.select(expr("dot_i64(a, CAST(NULL AS ARRAY<BIGINT>))"))
    assert(withNull.head.isNullAt(0))
  }
}
