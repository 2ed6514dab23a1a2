package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordNgramsSpec extends SparkSpec {

  test("word_ngrams matches the SQL transform+explode form on edge cases") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a"),            // shorter than any n>1: no rows
      (3L, ""),             // splits to [""]: one 1-gram, no 2-grams
      (4L, "x y"),
      (5L, null.asInstanceOf[String])) // null text -> null array -> no rows
      .toDF("id", "text")
      .withColumn("ws", split(col("text"), " "))
    for (n <- Seq(1, 2, 3)) {
      val gen = docs.select(col("id"), expr(s"word_ngrams(ws, $n)"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val sql = docs.select(col("id"), explode(expr(
          s"""CASE WHEN ws IS NULL OR size(ws) < $n THEN array()
             |ELSE transform(sequence(1, size(ws) - $n + 1),
             |  i -> array_join(slice(ws, i, $n), ' ')) END""".stripMargin)))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(gen === sql, s"n=$n")
      if (n == 2) assert(gen.contains((1L, "a b")) && gen.contains((1L, "c d")))
    }
  }

  test("word_ngrams plans through Generate like explode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
      .select(expr("word_ngrams(split(text, ' '), 2)"))
    assert(df.queryExecution.executedPlan.toString.contains("Generate"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a b", "b c"))
  }
}
