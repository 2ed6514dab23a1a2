package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SnapshotSpec extends SparkSpec {

  test("q130 incremental partial-merge equals the direct full aggregate") {
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = SnapshotQueries.incrementalAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === direct)
  }

  test("q134 classifies exactly the constructed mutations") {
    val keys = Tables.orders(spark, sf).select(col("o_orderkey").as("k"))
    def n(c: org.apache.spark.sql.Column): Long = keys.where(c).count()
    val removed = n(col("k") % 97 === 0)
    val added = n(col("k") % 101 === 0)
    val changed = n(col("k") % 5 === 0 && col("k") % 97 =!= 0)
    val unchanged = keys.count() - removed - changed
    val got = SnapshotQueries.snapshotDiff(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) === removed)
    assert(got.getOrElse("added", 0L) === added)
    assert(got.getOrElse("changed", 0L) === changed)
    assert(got.getOrElse("unchanged", 0L) === unchanged)
    // every classification non-degenerate at every sf (97/101/5 all hit)
    assert(Seq("removed", "added", "changed", "unchanged").forall(got.contains))
  }

  test("q135 mergeSchema read loses no rows and null-fills the legacy epoch") {
    val o = Tables.orders(spark, sf)
    val total = o.count()
    val legacy = o.where(coalesce(year(col("o_orderdate")) <= 1996, lit(false))).count()
    val rows = SnapshotQueries.schemaEvolution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("LEGACY")._1 === legacy) // missing column → null → LEGACY bucket
    assert(rows.values.map(_._1).sum === total) // union of epochs is lossless
    assert(rows.keySet.size > 1) // the evolved epoch contributes real groups
  }
}
