package graft.sources

import java.io.{BufferedInputStream, FileInputStream}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the `doc_id \t text` line format — the
  * bring-your-own-input surface (the reference's client-owned InputVec,
  * `MapReduceClient.h:28-43`, re-expressed as a first-class Spark
  * source):
  *
  * {{{
  *   spark.read.format("graft.sources.DocLinesSource")
  *     .option("path", "/data/docs.tsv")
  *     .option("partitions", "64")
  *     .load()
  * }}}
  *
  * Scale mechanics, the part a naive file reader gets wrong:
  *  - **Byte-range splits with Hadoop text semantics.** The file splits
  *    into N ranges at arbitrary byte offsets; a record belongs to the
  *    split containing its FIRST byte, so each reader discards the
  *    partial line it lands in (unless at offset 0) and reads through
  *    the line that straddles its end. Every line is read exactly once,
  *    with no coordination between readers — the same contract that
  *    lets 1000 executors scan one 100 TB file.
  *  - **Column pruning pushdown** ([[SupportsPushDownRequiredColumns]]):
  *    `select(text)` never materializes doc_id and vice versa — the
  *    pruned schema reaches the reader, which parses only what the
  *    query needs.
  *
  * Deliberate simplification: paths resolve through `java.io` (local
  * filesystem), where a production connector would go through the
  * Hadoop `FileSystem` API for HDFS/object stores. The split planning,
  * line-ownership protocol, and pushdown plumbing — the parts that make
  * a connector correct at scale — are exactly what that swap preserves.
  */
class DocLinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocLines.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new DocLinesTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object DocLines {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

class DocLinesTable(properties: Map[String, String]) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft.sources.DocLinesSource requires option 'path'"))

  override def name(): String = s"doclines(`$path`)"
  override def schema(): StructType = DocLines.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocLinesScanBuilder(path,
      Option(options.get("partitions")).map(_.toInt)
        .getOrElse(properties.get("partitions").map(_.toInt).getOrElse(8)))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val got = info.schema()
    require(got.fieldNames.sameElements(DocLines.Schema.fieldNames) &&
      got.fields.map(_.dataType).sameElements(DocLines.Schema.fields.map(_.dataType)),
      s"doclines sink writes (doc_id BIGINT, text STRING); got ${got.simpleString}")
    new DocLinesWriteBuilder(path)
  }
}

class DocLinesScanBuilder(path: String, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = DocLines.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept doc_id comparisons for READER-side evaluation (each split
    * drops non-matching lines before materializing the text column) but
    * return every filter as a residual so Spark re-checks — the same
    * belt-and-braces contract the parquet source uses for row-group
    * filters: pushdown is a performance promise, never a correctness
    * dependency.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(DocLinesFilters.supported)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** PER-SPLIT limit: each reader stops after `n` surviving lines, so a
    * `LIMIT 10` over a 100 TB table reads ~10 lines per split instead
    * of the whole file. Partially pushed — Spark still applies the
    * global limit over the ≤ n·splits survivors.
    */
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed: Boolean = true

  /** COUNT(*) pushdown (ungrouped): the reader COUNTS surviving lines
    * without ever materializing columns — splitting on tabs, building
    * UTF8 strings and rows for a count is pure waste. Partial push
    * (`supportCompletePushDown` = false): each split emits one partial
    * count and Spark's final aggregation sums them — the same
    * partial/final split every distributed COUNT uses. Pushed doc_id
    * filters still gate each line (count-with-filter stays correct),
    * which is why only filter-complete plans qualify: if Spark kept a
    * residual filter it could not re-check, we must decline.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val onlyCountStar = aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar] &&
      limit < 0
    if (onlyCountStar) countPushed = true
    countPushed
  }

  override def build(): Scan =
    if (countPushed) new DocLinesCountScan(path, partitions, pushed)
    else new DocLinesScan(path, partitions, required, pushed, limit)
}

/** doc_id predicate evaluation shared by the builder's support check and
  * the reader's line gate.
  */
object DocLinesFilters {
  import org.apache.spark.sql.sources._

  def supported(f: Filter): Boolean = f match {
    case EqualTo("doc_id", _: java.lang.Number) => true
    case GreaterThan("doc_id", _: java.lang.Number) => true
    case GreaterThanOrEqual("doc_id", _: java.lang.Number) => true
    case LessThan("doc_id", _: java.lang.Number) => true
    case LessThanOrEqual("doc_id", _: java.lang.Number) => true
    case In("doc_id", vs) => vs.forall(_.isInstanceOf[java.lang.Number])
    case _ => false
  }

  def accept(f: Filter, id: Long): Boolean = f match {
    case EqualTo("doc_id", v: java.lang.Number) => id == v.longValue()
    case GreaterThan("doc_id", v: java.lang.Number) => id > v.longValue()
    case GreaterThanOrEqual("doc_id", v: java.lang.Number) => id >= v.longValue()
    case LessThan("doc_id", v: java.lang.Number) => id < v.longValue()
    case LessThanOrEqual("doc_id", v: java.lang.Number) => id <= v.longValue()
    case In("doc_id", vs) => vs.exists {
      case v: java.lang.Number => v.longValue() == id
      case _ => false
    }
    case _ => true // unknown filters pass; Spark re-checks everything
  }
}

/** One byte range of the file; [[start]] inclusive, [[end]] exclusive. */
case class DocLinesPartition(path: String, start: Long, end: Long) extends InputPartition

class DocLinesScan(path: String, partitions: Int, required: StructType,
                   filters: Array[org.apache.spark.sql.sources.Filter],
                   limit: Int = -1)
    extends Scan with Batch with SupportsRuntimeFiltering {
  /** Join-time filters ([[SupportsRuntimeFiltering]]): when this scan
    * probes a join whose build side is selective, Spark hands the scan
    * the build side's doc_id set at RUNTIME (the DSv2 dynamic-pruning
    * surface — what lakehouse formats use to skip files by join key).
    * The ids land in the same reader-side gate as the statically pushed
    * filters, so probe-side lines that cannot match are dropped before
    * the text column ever materializes. Correctness never depends on
    * it: the reader gate is a subset-filter and Spark re-checks the
    * join predicate anyway.
    */
  private var runtime: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  override def filter(rf: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtime = rf.filter(DocLinesFilters.supported)

  private def allFilters = filters ++ runtime

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"doclines $path, ${partitions} splits, schema=${required.simpleString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    // a directory is a multi-file table (what the write path produces):
    // the split budget spreads over the committed part files by size,
    // each file split by the same byte-range protocol
    val f = new java.io.File(path)
    val files: Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq
          .filter(x => x.getName.startsWith("part-") && x.getName.endsWith(".tsv"))
          .sortBy(_.getName)).getOrElse(Seq.empty)
      else Seq(f)
    val total = files.map(_.length()).sum
    val n = math.max(1, partitions)
    val step = math.max(1L, (total + n - 1) / n)
    files.flatMap { file =>
      val len = file.length()
      (0L until len by step)
        .map(s => DocLinesPartition(file.getAbsolutePath, s, math.min(s + step, len)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocLinesReaderFactory(required.fieldNames, allFilters, limit)
}

/** The COUNT(*)-pushed scan: one partial-count row per split, columns
  * never materialized; Spark's final aggregation sums the partials
  * (`supportCompletePushDown` stays false on the builder).
  */
class DocLinesCountScan(path: String, partitions: Int,
                        filters: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  private val delegate = new DocLinesScan(path, partitions, DocLines.Schema, filters)
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"doclines $path, ${partitions} splits, PushedAggregation: [COUNT(*)], " +
      s"PushedFilters: [${filters.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    delegate.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    new DocLinesCountReaderFactory(filters)
}

class DocLinesCountReaderFactory(filters: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocLinesPartition]
    new PartitionReader[InternalRow] {
      // reuse the line reader with the doc_id-only projection (the
      // cheapest legal parse: filters may still need the id); drain it
      // and emit ONE partial-count row
      private val inner =
        new DocLinesReader(p, if (filters.nonEmpty) Array("doc_id") else Array.empty, filters)
      private var emitted = false
      private var n = 0L
      override def next(): Boolean = {
        if (emitted) return false
        while (inner.next()) n += 1
        emitted = true
        true
      }
      override def get(): InternalRow = InternalRow(n)
      override def close(): Unit = inner.close()
    }
  }
}

class DocLinesReaderFactory(fields: Array[String],
                            filters: Array[org.apache.spark.sql.sources.Filter],
                            limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocLinesPartition]
    new DocLinesReader(p, fields, filters, limit)
  }
}

/** Streams one split. Reads are single-pass and buffered; memory is one
  * line at a time regardless of split size.
  */
class DocLinesReader(p: DocLinesPartition, fields: Array[String],
                     filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                     limit: Int = -1)
    extends PartitionReader[InternalRow] {
  private var produced = 0L

  // compile the pushed filters ONCE per reader: an In set — which the
  // runtime-filter path can make arbitrarily large (the whole build
  // side's key set) — becomes a hashed Set lookup instead of a boxed
  // linear scan per input line
  private val gates: Array[Long => Boolean] = filters.map {
    case org.apache.spark.sql.sources.In("doc_id", vs) =>
      val set = vs.collect { case v: java.lang.Number => v.longValue() }.toSet
      (id: Long) => set.contains(id)
    case f => (id: Long) => DocLinesFilters.accept(f, id)
  }
  private val in = new BufferedInputStream(new FileInputStream(p.path), 1 << 16)
  private var pos: Long = 0
  private var row: InternalRow = _
  // land at the split start; if mid-file, the partial line we find
  // belongs to the previous split — skip through its newline
  skipTo(p.start)
  if (p.start > 0) readLine()

  private def skipTo(target: Long): Unit =
    while (pos < target) {
      val skipped = in.skip(target - pos)
      if (skipped <= 0) { if (in.read() < 0) return else pos += 1 }
      else pos += skipped
    }

  /** next line's bytes (without the newline), or null at EOF; tracks
    * [[pos]] past the line's terminator.
    */
  private def readLine(): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(256)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') { buf.write(c); pos += 1; c = in.read() }
    if (c == '\n') pos += 1
    buf.toByteArray
  }

  private val needsId = filters.nonEmpty || fields.contains("doc_id")

  override def next(): Boolean = {
    // pushed per-split limit: stop early once this split produced its
    // quota (Spark's global limit handles the rest)
    if (limit >= 0 && produced >= limit) return false
    // Hadoop LineRecordReader ownership: this split reads every line
    // whose first byte is <= end — INCLUDING one starting exactly at
    // `end` — because the next reader always discards the line it lands
    // in (its skip runs through the first newline at-or-after `end`).
    // `>= end` here would lose exactly those boundary lines.
    while (pos <= p.end) {
      val line = readLine()
      if (line == null) return false
      val tab = line.indexOf('\t'.toByte)
      val id =
        if (needsId)
          new String(line, 0, if (tab < 0) line.length else tab, "UTF-8").toLong
        else 0L
      // pushed filters gate the line BEFORE the text column exists
      if (gates.forall(_(id))) {
        val values: Array[Any] = fields.map {
          case "doc_id" => id
          case "text" =>
            if (tab < 0) UTF8String.EMPTY_UTF8
            else UTF8String.fromBytes(line, tab + 1, line.length - tab - 1)
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        row = InternalRow.fromSeq(values.toSeq)
        produced += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** The V2 WRITE path: the standard two-phase commit protocol a
  * distributed sink needs —
  *
  *  1. every task writer streams its partition to a HIDDEN temp file
  *     (`.part-<partition>-<task>.tsv.tmp` — unique per task ATTEMPT,
  *     so speculative/retried attempts can never clobber each other,
  *     and hidden so no reader lists it);
  *  2. a task's `commit()` seals its temp and reports it in the
  *     [[DocLinesCommitMessage]]; `abort()` deletes it;
  *  3. the driver's `BatchWrite.commit` PUBLISHES exactly the reported
  *     temps (atomic per-file rename to visible `part-NNNNN.tsv`
  *     names), sweeps any stray temps from losing attempts, and drops
  *     a `_SUCCESS` marker; `BatchWrite.abort` deletes everything.
  *
  * Readers only ever list `part-*.tsv`, so a half-finished or aborted
  * write is invisible — the same visibility contract as the upsert
  * sink's CURRENT pointer ([[graft.streaming.Streams.mergeIntoSnapshot]]).
  * `SupportsTruncate` maps `mode("overwrite")` onto "clear the visible
  * part files inside the commit", so overwrite is atomic-per-file too.
  * Local `java.io` renames stand in for a production object-store
  * commit (manifest/commit-service), as on the read side.
  */
class DocLinesWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new DocLinesBatchWrite(path, doTruncate)
    }
}

case class DocLinesCommitMessage(tempName: String, partitionId: Int, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class DocLinesBatchWrite(path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // per-JOB tag, minted once on the driver and carried in every temp
  // name this job's writers create: two concurrent batch writes to the
  // same table must never sweep each other's in-flight temps (an
  // untagged sweep deleted the other job's files and its commit then
  // threw NoSuchFileException on the rename)
  private val jobTag = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new DocLinesWriterFactory(path, jobTag)
  }

  // STRICTLY this job's temps: age alone cannot distinguish a crashed
  // job's orphan from a live-but-slow writer (a >1 h straggler task is
  // routine on a busy cluster), so commit/abort never touch foreign
  // temps — orphans from hard-crashed jobs are reclaimed by the
  // explicit [[DocLinesMaintenance.vacuumTemps]] pass an operator runs
  // when no writers are active, like every table format's vacuum
  private def sweepOwnTemps(dir: java.io.File): Unit =
    Option(dir.listFiles()).foreach(_.filter(f =>
      f.getName.startsWith(s".part-$jobTag-") && f.getName.endsWith(".tsv.tmp"))
      .foreach(_.delete()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    if (truncate)
      Option(dir.listFiles()).foreach(_.filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".tsv"))
        .foreach(_.delete()))
    // published names carry a per-COMMIT tag: a second append to the
    // same table must add its parts next to the existing ones, never
    // rename onto them (fixed part-N names + REPLACE_EXISTING would
    // silently destroy the previous commit's data)
    val commitTag = java.util.UUID.randomUUID().toString.take(8)
    val committed = messages.map(_.asInstanceOf[DocLinesCommitMessage])
    committed.sortBy(_.partitionId).zipWithIndex.foreach { case (m, i) =>
      val tmp = new java.io.File(dir, m.tempName)
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(dir, f"part-$commitTag-$i%05d.tsv").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // losing speculative attempts reported nothing: sweep their temps —
    // but only THIS job's (matching our tag)
    sweepOwnTemps(dir)
    java.nio.file.Files.write(new java.io.File(dir, "_SUCCESS").toPath,
      Array.empty[Byte]): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepOwnTemps(new java.io.File(path))
}

class DocLinesWriterFactory(path: String, jobTag: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new DocLinesWriter(path, jobTag, partitionId, taskId)
}

class DocLinesWriter(path: String, jobTag: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tempName = s".part-$jobTag-$partitionId-$taskId.tsv.tmp"
  private val out = new java.io.BufferedOutputStream(
    new java.io.FileOutputStream(new java.io.File(path, tempName)), 1 << 16)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val bytes = record.getUTF8String(1).getBytes
    // framing constraint of the line format — fail the TASK (which
    // aborts + retries + eventually fails the job) rather than corrupt
    // the file: a tab would shift the column split, a newline would
    // forge a record boundary. One pass over the UTF-8 bytes (0x09 and
    // 0x0A are self-representing), no String materialization.
    var i = 0
    while (i < bytes.length) {
      require(bytes(i) != '\t' && bytes(i) != '\n',
        s"doclines sink: text of doc_id ${record.getLong(0)} contains tab/newline")
      i += 1
    }
    out.write(record.getLong(0).toString.getBytes("UTF-8"))
    out.write('\t')
    out.write(bytes)
    out.write('\n')
    rows += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    DocLinesCommitMessage(tempName, partitionId, rows)
  }

  override def abort(): Unit = {
    out.close()
    new java.io.File(path, tempName).delete(): Unit
  }

  override def close(): Unit = ()
}

/** Out-of-band maintenance for doclines tables — the operations that
  * need "no writers active" as a precondition and therefore cannot
  * live inside any single job's commit path.
  */
object DocLinesMaintenance {
  /** Reclaim orphaned temp files left by hard-crashed jobs (a JVM that
    * died before its commit/abort ran). Deletes `.part-*.tsv.tmp`
    * entries older than `olderThanMs`, regardless of job tag — which
    * is exactly why this is NOT called from commit/abort: age cannot
    * distinguish a crashed job's orphan from a live slow writer, so
    * the caller asserts quiescence (same contract as every table
    * format's vacuum). Returns the number of files removed.
    */
  def vacuumTemps(path: String, olderThanMs: Long = 60L * 60 * 1000): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith(".part-") &&
        f.getName.endsWith(".tsv.tmp") && f.lastModified < cutoff)
      .count(_.delete())
  }
}
