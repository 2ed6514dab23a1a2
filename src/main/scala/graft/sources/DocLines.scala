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

class DocLinesTable(properties: Map[String, String]) extends Table with SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft.sources.DocLinesSource requires option 'path'"))

  override def name(): String = s"doclines(`$path`)"
  override def schema(): StructType = DocLines.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocLinesScanBuilder(path,
      Option(options.get("partitions")).map(_.toInt)
        .getOrElse(properties.get("partitions").map(_.toInt).getOrElse(8)))
}

class DocLinesScanBuilder(path: String, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DocLines.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new DocLinesScan(path, partitions, required)
}

/** One byte range of the file; [[start]] inclusive, [[end]] exclusive. */
case class DocLinesPartition(path: String, start: Long, end: Long) extends InputPartition

class DocLinesScan(path: String, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"doclines $path, ${partitions} splits, schema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val len = new java.io.File(path).length()
    val n = math.max(1, partitions)
    val step = math.max(1L, (len + n - 1) / n)
    (0L until len by step)
      .map(s => DocLinesPartition(path, s, math.min(s + step, len)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocLinesReaderFactory(required.fieldNames)
}

class DocLinesReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocLinesPartition]
    new DocLinesReader(p, fields)
  }
}

/** Streams one split. Reads are single-pass and buffered; memory is one
  * line at a time regardless of split size.
  */
class DocLinesReader(p: DocLinesPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
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

  override def next(): Boolean = {
    // Hadoop LineRecordReader ownership: this split reads every line
    // whose first byte is <= end — INCLUDING one starting exactly at
    // `end` — because the next reader always discards the line it lands
    // in (its skip runs through the first newline at-or-after `end`).
    // `>= end` here would lose exactly those boundary lines.
    if (pos > p.end) return false
    val line = readLine()
    if (line == null) return false
    val tab = line.indexOf('\t'.toByte)
    val values: Array[Any] = fields.map {
      case "doc_id" =>
        new String(line, 0, if (tab < 0) line.length else tab, "UTF-8").toLong
      case "text" =>
        if (tab < 0) UTF8String.EMPTY_UTF8
        else UTF8String.fromBytes(line, tab + 1, line.length - tab - 1)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    row = InternalRow.fromSeq(values.toSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
