package graft.functions

import org.apache.spark.sql.SparkSession

/** Runtime registration of graft's native Catalyst expressions into a
  * session's function registry, so query code can call them through the
  * public `expr("dot_i64(...)")` surface (works on any session, including
  * the driver-created ones — no SparkSessionExtensions wiring needed).
  */
object GraftFunctions {
  /** Idempotent: createOrReplace semantics. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_i64", exprs => DotProductI64(exprs.head, exprs(1)), "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_rows", exprs =>
        TopKRows(exprs(0), exprs(1), exprs(2),
          exprs(3).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgrams(exprs.head, exprs(1)), "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_build", exprs =>
        KllBuildSketch(exprs.head,
          exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_build", exprs =>
        ThetaBuildSketch(exprs.head).toAggregateExpression(), "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_merge", exprs =>
        KllMergeSketch(exprs.head,
          exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    // Spark ships Bloom-filter build/probe expressions for its automatic
    // runtime-filter rewrite but keeps them out of the public function
    // registry; surfacing them lets queries hand-build the classic
    // bloom-semi-join pushdown (build over the small filtered dim, probe
    // in the fact scan BEFORE the shuffle). Input must be xxhash64 longs.
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head).toAggregateExpression(),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
  }
}
