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

  private def tmpDir(tag: String): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), tag).toFile
    f
  }

  test("v2 sink roundtrip: written table reads back row-for-row") {
    val dir = tmpDir("doclines-w1-")
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    src.repartition(3)
      .write.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).mode("append").save()
    // commit published visible parts + _SUCCESS, no temps left behind
    val names = dir.listFiles().map(_.getName).sorted
    assert(names.contains("_SUCCESS") && names.count(_.endsWith(".tsv")) === 3)
    assert(!names.exists(_.endsWith(".tmp")), names.mkString(","))
    val back = spark.read.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).option("partitions", "7").load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === src.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // append ADDS: a second commit's parts land NEXT TO the first
    // commit's (per-commit name tags — fixed part-N names would rename
    // onto and destroy the earlier data)
    src.where(col("doc_id") % 2 === 0).repartition(2)
      .write.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).mode("append").save()
    assert(dir.listFiles().count(_.getName.endsWith(".tsv")) === 5)
    assert(spark.read.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).load().count() ===
      src.count() + src.where(col("doc_id") % 2 === 0).count())
    // overwrite truncates: half the table replaces everything
    src.where(col("doc_id") % 2 === 0).repartition(2)
      .write.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).mode("overwrite").save()
    val after = spark.read.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).load().count()
    assert(after === src.where(col("doc_id") % 2 === 0).count())
  }

  test("v2 sink commit protocol: losing attempts invisible, aborts leave nothing") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def row(id: Long, text: String) =
      InternalRow(id, UTF8String.fromString(text))
    val dir = tmpDir("doclines-w2-")
    val bw = new DocLinesBatchWrite(dir.toString, truncate = false)
    // the factory must come FROM the BatchWrite: temp names carry the
    // job's tag, and commit/abort sweep only their own job's temps
    val factory = bw.createBatchWriterFactory(null)
    // partition 0: two speculative attempts; only task 11 commits
    val w0a = factory.createWriter(0, 10L)
    w0a.write(row(1L, "loser attempt"))
    val w0b = factory.createWriter(0, 11L)
    w0b.write(row(1L, "winner attempt"))
    val m0 = w0b.commit()
    w0a.abort() // driver told the loser to abort
    // partition 1: plain single attempt
    val w1 = factory.createWriter(1, 12L)
    w1.write(row(2L, "two"))
    val m1 = w1.commit()
    bw.commit(Array(m0, m1))
    val back = spark.read.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((1L, "winner attempt"), (2L, "two")))
    assert(!dir.listFiles().map(_.getName).exists(_.endsWith(".tmp")))
    // a fully aborted job leaves no temps either
    val dir2 = tmpDir("doclines-w3-")
    val bw2 = new DocLinesBatchWrite(dir2.toString, truncate = false)
    val f2 = bw2.createBatchWriterFactory(null)
    val wa = f2.createWriter(0, 1L)
    wa.write(row(9L, "doomed"))
    wa.commit()
    bw2.abort(Array.empty)
    assert(!dir2.listFiles().map(_.getName).exists(_.endsWith(".tmp")))
    assert(dir2.listFiles().forall(f => !f.getName.endsWith(".tsv")))
  }

  test("v2 sink: concurrent jobs on one table never sweep each other's temps") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def row(id: Long, text: String) =
      InternalRow(id, UTF8String.fromString(text))
    val dir = tmpDir("doclines-w4-")
    // job A and job B both appending to the same table, interleaved:
    // B aborts while A's temp is still in flight — A's commit must
    // still find its temp (the per-job tag scopes every sweep)
    val jobA = new DocLinesBatchWrite(dir.toString, truncate = false)
    val jobB = new DocLinesBatchWrite(dir.toString, truncate = false)
    val wA = jobA.createBatchWriterFactory(null).createWriter(0, 1L)
    wA.write(row(1L, "from job A"))
    val mA = wA.commit() // task-committed: temp exists, not yet published
    val wB = jobB.createBatchWriterFactory(null).createWriter(0, 2L)
    wB.write(row(2L, "from job B"))
    wB.commit()
    jobB.abort(Array.empty) // must delete only B's temps
    jobA.commit(Array(mA)) // would throw NoSuchFileException pre-fix
    val back = spark.read.format("graft.sources.DocLinesSource")
      .option("path", dir.toString).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((1L, "from job A")))
    assert(!dir.listFiles().map(_.getName).exists(_.endsWith(".tmp")))
  }

  test("vacuumTemps reclaims only stale orphan temps, never data or fresh temps") {
    val dir = tmpDir("doclines-vac-")
    def put(name: String, ageMs: Long = 0): java.io.File = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, Array[Byte](1))
      if (ageMs > 0) assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      f
    }
    val fresh = put(".part-aaaa-0-1.tsv.tmp") // live writer's in-flight temp
    val stale = put(".part-bbbb-0-2.tsv.tmp", 2L * 60 * 60 * 1000) // crashed job's orphan
    val data = put("part-cccc-00000.tsv", 2L * 60 * 60 * 1000) // committed data, old
    assert(DocLinesMaintenance.vacuumTemps(dir.toString) === 1)
    assert(fresh.exists && !stale.exists && data.exists)
  }

  test("count(*) and limit push into the reader; filtered paths stay exact") {
    val path = graft.ops.ExtraQueries.docsTsv(spark, sf)
    def read = spark.read.format("graft.sources.DocLinesSource")
      .option("path", path).option("partitions", "7").load()
    val expected = Tables.documents(spark, sf).count()
    // aggregate pushdown: the scan emits partial counts, no columns
    val agg = read.agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)]"), plan.take(1500))
    assert(agg.collect()(0).getLong(0) === expected)
    // a residual filter blocks the push (a count over rows the engine
    // still has to re-check cannot be delegated) — falls back to the
    // row scan and stays exact
    val filtered = read.where(col("doc_id") < 100).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("PushedAggregation"))
    assert(filtered.collect()(0).getLong(0) ===
      Tables.documents(spark, sf).where(col("doc_id") < 100).count())
    // limit pushdown: per-split early exit, global limit still applied
    val lim = read.limit(5)
    assert(lim.queryExecution.executedPlan.toString.contains("PushedLimit: 5"))
    assert(lim.collect().length === 5)
  }

  test("runtime join filters reach the scan and gate the reader") {
    // the planner injects the dynamic filter on the doclines probe side
    val plan = graft.ops.ExtraQueries.customSourceRuntimeFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(doc_id"), plan.take(2000))
    // protocol level: an In filter delivered via SupportsRuntimeFiltering
    // drops non-matching lines inside the reader
    val path = graft.ops.ExtraQueries.docsTsv(spark, sf)
    val scan = new DocLinesScan(path, 3, DocLines.Schema, Array.empty)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id",
        Array[Any](java.lang.Long.valueOf(3L), java.lang.Long.valueOf(7L)))))
    val factory = scan.createReaderFactory()
    val ids = scan.planInputPartitions().flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      while (r.next()) buf += r.get().getLong(0)
      r.close()
      buf
    }
    assert(ids.sorted.toSeq === Seq(3L, 7L))
  }

  test("v2 sink rejects text that would break line framing") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmpDir("doclines-w4-")
    val w = new DocLinesWriterFactory(dir.toString, "testtag").createWriter(0, 1L)
    intercept[IllegalArgumentException] {
      w.write(InternalRow(1L, UTF8String.fromString("has\ttab")))
    }
    intercept[IllegalArgumentException] {
      w.write(InternalRow(1L, UTF8String.fromString("has\nnewline")))
    }
    w.abort()
  }
}
