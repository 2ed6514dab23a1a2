package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom V2 source must read every line exactly once at ANY split
  * count (byte-range boundaries fall mid-line, on newlines, and on line
  * starts), prune columns, and produce the partition layout asked of it.
  */
class DocLinesSpec extends SparkSpec {

  private def tsv: String = graft.ops.ExtraQueries.docsTsv(spark, sf)

  private def read(parts: Int): DataFrame =
    spark.read.format("graft.sources.DocLinesSource")
      .option("path", tsv)
      .option("partitions", parts.toString)
      .load()

  test("every split count yields exactly the parquet corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val total = docs.count()
    for (parts <- Seq(1, 3, 7, 64)) {
      val src = read(parts)
      assert(src.count() === total, s"row count at $parts splits")
      // full content equality: inner join on doc_id with equal text must
      // cover the whole corpus (any boundary loss/dup breaks the count)
      val matched = src.as("s")
        .join(docs.as("d"), col("s.doc_id") === col("d.doc_id") &&
          col("s.text") === col("d.text"))
        .count()
      assert(matched === total, s"content mismatch at $parts splits")
    }
  }

  test("requested split count reaches the scan") {
    assert(read(7).rdd.getNumPartitions === 7)
    assert(read(1).rdd.getNumPartitions === 1)
  }

  test("doc_id filters are pushed to the reader and results stay exact") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val expected = docs.where(col("doc_id") >= 10 && col("doc_id") < 25).count()
    val filtered = read(5).where(col("doc_id") >= 10 && col("doc_id") < 25)
    // the scan advertises the pushed predicates...
    val scanDesc = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("PushedFilters") && scanDesc.contains("doc_id"), scanDesc)
    // ...and row-level results are exact (Spark re-checks residuals)
    assert(filtered.count() === expected && expected > 0)
    // text-only projection with an id filter: pruning + pushdown compose
    val texts = read(5).where(col("doc_id") === 10).select("text")
    assert(texts.collect().length === 1)
  }

  test("column pruning is pushed into the reader") {
    val leaf = read(4).select("text").queryExecution.executedPlan
      .collectLeaves().head
    assert(leaf.output.map(_.name) === Seq("text"), leaf.toString)
    val leaf2 = read(4).select("doc_id").queryExecution.executedPlan
      .collectLeaves().head
    assert(leaf2.output.map(_.name) === Seq("doc_id"), leaf2.toString)
  }
}
