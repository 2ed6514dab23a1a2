package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

/** The Kafka-shaped source's contract, end to end: offset-range
  * delivery, in-flight appends picked up by later micro-batches, and
  * exactly-once resume from the checkpoint across a query restart.
  */
class EventLogSourceSpec extends SparkSpec {

  private def append(dir: java.nio.file.Path, p: Int, lines: String*): Unit =
    Files.write(dir.resolve(s"p$p.log"),
      lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def readLog(dir: java.nio.file.Path) =
    spark.readStream.format("graft.sources.EventLogSource")
      .option("path", dir.toString).load()

  private def collected(table: String): Set[(String, Int, Long, String, String)] =
    spark.table(table).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getString(4)))
      .toSet

  test("partitioned log delivers offset ranges, appends, and resumes exactly once") {
    val dir = Files.createTempDirectory("graft-topic1-")
    val ckpt = Files.createTempDirectory("graft-topic1-ckpt-")
    val out = Files.createTempDirectory("graft-topic1-out-")
    val topic = dir.getFileName.toString
    append(dir, 0, "k0\tv0", "k1\tv1", "k2\tv2")
    append(dir, 1, "ka\tva", "novalue-key-missing")

    // parquet sink: the memory sink refuses checkpoint recovery, and the
    // restart leg below is the point of the test
    def start() = readLog(dir).writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    def sunk(): Set[(String, Int, Long, String, String)] =
      spark.read.schema(EventLog.Schema).parquet(out.toString).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3), r.getString(4)))
        .toSet

    val q1 = start()
    try {
      q1.processAllAvailable()
      val first = sunk()
      assert(first === Set(
        (topic, 0, 0L, "k0", "v0"), (topic, 0, 1L, "k1", "v1"),
        (topic, 0, 2L, "k2", "v2"), (topic, 1, 0L, "ka", "va"),
        (topic, 1, 1L, null, "novalue-key-missing")))

      // records appended while the query runs land in a LATER batch,
      // with offsets continuing where the partition left off
      append(dir, 0, "k3\tv3")
      append(dir, 1, "kb\tvb")
      q1.processAllAvailable()
      val second = sunk()
      assert(second -- first === Set(
        (topic, 0, 3L, "k3", "v3"), (topic, 1, 2L, "kb", "vb")))
      assert(second.size === 7, "append delivered more than once")
    } finally q1.stop()

    // restart against the SAME checkpoint: the source must resume from
    // the committed offsets — exactly the one record appended after the
    // stop arrives, nothing is replayed
    append(dir, 0, "k4\tv4")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val all = sunk()
      assert(all.size === 8, s"expected 8 exactly-once records, got ${all.size}")
      assert(all.contains((topic, 0, 4L, "k4", "v4")))
    } finally q2.stop()
  }

  test("maxRecordsPerTrigger drains the backlog in bounded micro-batches") {
    val dir = Files.createTempDirectory("graft-topic3-")
    append(dir, 0, (0 until 5).map(i => s"k$i\tv$i"): _*)
    append(dir, 1, (0 until 5).map(i => s"j$i\tw$i"): _*)
    val q = spark.readStream.format("graft.sources.EventLogSource")
      .option("path", dir.toString)
      .option("maxRecordsPerTrigger", "3")
      .load()
      .writeStream.format("memory")
      .queryName("eventlog_sink_d").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = collected("eventlog_sink_d")
      assert(rows.size === 10, s"expected all 10 records, got ${rows.size}")
      assert(rows.map(r => (r._2, r._3)).size === 10, "duplicate (partition, offset)")
      // the 10-record backlog must have arrived in >= 4 batches of <= 3
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"backlog drained in ${batches.length} batches, admission control inert")
      batches.foreach(p => assert(p.numInputRows <= 3,
        s"batch exceeded the 3-record limit: ${p.numInputRows}"))
    } finally q.stop()
  }

  test("half-written records stay invisible until their newline commits") {
    val dir = Files.createTempDirectory("graft-topic2-")
    append(dir, 0, "k0\tv0")
    // a torn append: bytes present, no terminator yet
    Files.write(dir.resolve("p0.log"), "k1\tpart".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    assert(EventLog.recordCount(dir.resolve("p0.log").toFile) === 1L)
    val q = readLog(dir).writeStream.format("memory")
      .queryName("eventlog_sink_c").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(collected("eventlog_sink_c").map(_._3) === Set(0L))
      // the terminator lands -> the record becomes visible, torn bytes
      // and completion read back as ONE record
      Files.write(dir.resolve("p0.log"), "ial\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(collected("eventlog_sink_c") ===
        Set((dir.getFileName.toString, 0, 0L, "k0", "v0"),
          (dir.getFileName.toString, 0, 1L, "k1", "partial")))
    } finally q.stop()
  }

  test("log -> MERGE snapshot pipeline stays exactly-once across a restart") {
    // the two custom streaming pieces composed: the Kafka-shaped source
    // feeds the upsert sink's keyed snapshot; over-delivery anywhere
    // would be VISIBLE (the additive merge inflates n_events), so the
    // final snapshot equaling the per-key log totals IS the
    // exactly-once proof — source offsets, checkpoint resume, and the
    // sink's idempotence markers all in one path
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory(
      Paths.get(graft.Tables.scratchDir), "graft-topic-ups-")
    val ckpt = Files.createTempDirectory(
      Paths.get(graft.Tables.scratchDir), "graft-topic-ups-ckpt-")
    val table = Files.createTempDirectory(
      Paths.get(graft.Tables.scratchDir), "graft-topic-ups-tbl-")
    // key = user id, value = cents; offsets serve as event time
    append(dir, 0, "1\t10", "2\t20")
    append(dir, 1, "1\t5")
    def start() = readLog(dir).writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val delta = b.toDF().select(
          col("key").cast("long").as("user_id"),
          (col("partition").cast("long") * 1000000 + col("offset"))
            .as("event_id"),
          col("offset").as("t_us"),
          col("value").as("event_type"),
          col("value").cast("long").as("cents"))
        graft.streaming.Streams.mergeIntoSnapshot(spark, table, delta, id)
      }
      .start()
    def snap(): Map[Long, (Long, Long)] =
      graft.streaming.Streams.currentSnapshot(spark, table).get.collect()
        .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(snap() === Map(1L -> ((2L, 15L)), 2L -> ((1L, 20L))))
    } finally q1.stop()
    // records appended while the query is DOWN; the restarted query must
    // resume from the checkpointed offsets — not re-merge the old ones
    append(dir, 0, "2\t7")
    append(dir, 1, "3\t1")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(snap() === Map(
        1L -> ((2L, 15L)), 2L -> ((2L, 27L)), 3L -> ((1L, 1L))))
    } finally q2.stop()
    Seq(dir, ckpt, table).foreach(p => graft.Tables.deleteRecursively(p.toFile))
  }
}
