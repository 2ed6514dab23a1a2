package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.store.ManifestStore

class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "complete"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("stream progress adapter reaches the reference poll-loop terminal state") {
    val stream = Streams.readEventsStream(spark, sf)
    val q = Streams.tumbling(stream).writeStream
      .format("memory")
      .queryName("progress_sink")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    val prog = StreamProgress.attach(spark, q)
    val observed = scala.collection.mutable.ArrayBuffer.empty[graft.mr.JobState]
    try {
      while (q.isActive) { observed += prog.state; Thread.sleep(2) }
      q.awaitTermination()
      // caught up after a finite AvailableNow replay: the adapter must
      // report the sample client's poll-loop exit state (REDUCE, 100)
      assert(prog.state === graft.mr.JobState(graft.mr.JobStage.Reduce, 100f))
      // anything observed mid-run is a valid machine state
      observed.foreach(s => assert(s.percentage >= 0f && s.percentage <= 100f))
    } finally {
      prog.close()
      q.stop()
    }
  }

  test("stream progress history is event-driven — recorded even with zero polling") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Int]
    val agg = ms.toDF().groupBy((col("value") % 10).as("k")).count()
    val q = agg.writeStream
      .format("memory").queryName("poll_free_sink").outputMode("complete").start()
    val prog = StreamProgress.attach(spark, q)
    try {
      // two micro-batches, and `state` is never polled while they run:
      // the machine's transitions must be recorded all the same, because
      // they are driven by bus events, not by the poller
      ms.addData(1 to 100: _*); q.processAllAvailable()
      ms.addData(101 to 200: _*); q.processAllAvailable()
      val h = prog.history
      assert(h.exists(_.stage == graft.mr.JobStage.Map))
      assert(h.exists(_.stage == graft.mr.JobStage.Reduce))
      // the second batch re-armed the machine internally (one Undefined
      // marker per boundary) — the listener never left the bus
      assert(h.count(_ == graft.mr.JobState(graft.mr.JobStage.Undefined, 0f)) >= 1)
      assert(prog.state === graft.mr.JobState(graft.mr.JobStage.Reduce, 100f))
    } finally {
      prog.close()
      q.stop()
    }
  }

  test("file-replayed tumbling windows equal the batch computation") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.tumbling(stream), "tumbling_sink")
    val streamed = spark.table("tumbling_sink").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Streams.tumbling(Tables.events(spark, sf)).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("file-replayed session windows equal the batch computation") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.sessions(stream), "session_sink")
    val streamed = spark.table("session_sink").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Streams.sessionsBatch(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops duplicate event ids; stream-stream join matches batch") {
    // dedup: replay the file twice worth of duplicates via union is not
    // possible on a file source, so drive it with the single replay and
    // an in-batch duplicate check instead
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.dedupStream(stream).select("event_id"), "dedup_sink", "append")
    val ids = spark.table("dedup_sink").collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length)
    assert(ids.length === Tables.events(spark, sf).select("event_id").distinct().count())

    val joined = Streams.purchaseSignupJoin(stream)
    runToMemory(joined, "ssjoin_sink", "append")
    val streamed = spark.table("ssjoin_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    val batch = Streams.purchaseSignupJoin(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("chained stateful operators: stream-stream join into windowed agg") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.joinThenWindow(stream), "chain_sink", "append")
    val streamed = spark.table("chain_sink").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getTimestamp(2))).toSet
    val batchRows = Streams.joinThenWindow(Tables.events(spark, sf)).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getTimestamp(2)))
    val batch = batchRows.toSet
    // append mode only finalizes windows the terminal watermark passed:
    // streamed ⊆ batch, and every window a full watermark-delay older
    // than the newest purchase must have been emitted
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    val maxTs = batchRows.map(_._1.getTime).max
    val mustHave = batch.filter(_._1.getTime + 2 * 3600 * 1000L <= maxTs)
    assert(mustHave.subsetOf(streamed),
      s"finalized windows missing: ${(mustHave -- streamed).take(3)}")
  }

  test("left-semi stream-stream join: qualified purchases only, no duplicates") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.purchaseSignupSemi(stream), "sssemi_sink", "append")
    val streamedRows = spark.table("sssemi_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val streamed = streamedRows.toSet
    // one emission per qualified purchase even with several matches
    assert(streamedRows.length === streamed.size)
    val batch = Streams.purchaseSignupSemi(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSet
    // streamed ⊆ batch always; purchases old enough that the terminal
    // watermark closed their join window must all be present
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    val ev = Tables.events(spark, sf).groupBy("event_type")
      .agg(org.apache.spark.sql.functions.max("ts").as("m")).collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    val wmTerminal = math.min(ev("purchase"), ev("signup")) - 3600 * 1000L
    val mustHave = batch.filter(_._3.getTime + 2 * 3600 * 1000L < wmTerminal)
    assert(mustHave.subsetOf(streamed),
      s"closed-window purchases missing: ${(mustHave -- streamed).take(3)}")
  }

  test("left-outer stream-stream join: matches emit eagerly, nulls after the watermark") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.purchaseSignupLeftOuter(stream), "ssouter_sink", "append")
    val streamed = spark.table("ssouter_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
    val batchRows = Streams.purchaseSignupLeftOuter(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
    val batch = batchRows.toSet
    // matched rows emit as soon as both sides arrive — all of them land
    assert(streamed.filter(_._4.isDefined) === batch.filter(_._4.isDefined))
    // null rows emit only once the watermark proves no signup can match:
    // streamed ⊆ batch, and every purchase older than (terminal watermark
    // − join range) must have its outer row
    val streamedNulls = streamed.filter(_._4.isEmpty)
    assert(streamedNulls.subsetOf(batch.filter(_._4.isEmpty)))
    // terminal watermark = min over the two inputs of (max event time −
    // 1 h delay); an outer row is provably emittable once that watermark
    // clears p_ts + 2 h (the join range) — purchases can outrun signups,
    // so the purchase-side max alone overstates the watermark
    val ev = Tables.events(spark, sf).groupBy("event_type")
      .agg(org.apache.spark.sql.functions.max("ts").as("m")).collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    val wmTerminal = math.min(ev("purchase"), ev("signup")) - 3600 * 1000L
    val mustHave = batch.filter(r =>
      r._4.isEmpty && r._3.getTime + 2 * 3600 * 1000L < wmTerminal)
    assert(mustHave.subsetOf(streamedNulls),
      s"${mustHave.size} overdue outer rows, ${(mustHave -- streamedNulls).size} missing")
    assert(streamedNulls.nonEmpty, "corpus has purchases with no preceding signup")
  }

  test("full-outer stream-stream join emits both unmatched directions") {
    val stream = Streams.readEventsStream(spark, sf)
    runToMemory(Streams.purchaseSignupFullOuter(stream), "ssfull_sink", "append")
    val streamed = spark.table("ssfull_sink").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(4)))).toSet
    val batch = Streams.purchaseSignupFullOuter(Tables.events(spark, sf)).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(4)))).toSet
    // matched pairs all land; unmatched rows are watermark-gated, so
    // streamed ⊆ batch with BOTH null directions represented
    val matched = (s: Set[(Option[Long], Option[Long], Option[java.sql.Timestamp], Option[java.sql.Timestamp])]) =>
      s.filter(r => r._1.isDefined && r._2.isDefined)
    assert(matched(streamed) === matched(batch))
    assert(streamed.subsetOf(batch))
    assert(streamed.exists(r => r._1.isDefined && r._2.isEmpty),
      "no purchase-side outer rows emitted")
    assert(streamed.exists(r => r._1.isEmpty && r._2.isDefined),
      "no signup-side outer rows emitted")
  }

  test("stream-static enrichment join equals the batch computation") {
    val stream = Streams.readEventsStream(spark, sf)
    val dim = Tables.customer(spark, sf)
    runToMemory(Streams.enrichWithSegment(stream, dim), "enrich_sink", "append")
    val streamed = spark.table("enrich_sink").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batchRows = Streams.enrichWithSegment(Tables.events(spark, sf), dim).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = batchRows.toSet
    // append finalizes only watermark-passed windows: streamed ⊆ batch,
    // and every window older than (max ts - 1h delay - 1h width) must
    // have been emitted
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    val maxTs = batchRows.map(_._1.getTime).max
    val mustHave = batch.filter(_._1.getTime + 2 * 3600 * 1000L <= maxTs)
    assert(mustHave.subsetOf(streamed),
      s"finalized windows missing: ${(mustHave -- streamed).take(3)}")
  }

  test("parquet sink with checkpoint delivers exactly once across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-")
    try {
      val out = s"$dir/data"
      val ckpt = s"$dir/ckpt"
      val stream = Streams.readEventsStream(spark, sf).select("event_id", "event_type", "value")
      Streams.toParquetSink(stream, out, ckpt).awaitTermination()
      val n1 = spark.read.parquet(out).count()
      assert(n1 === Tables.events(spark, sf).count())
      // restart against the same checkpoint: nothing new to process, no dupes
      Streams.toParquetSink(
        Streams.readEventsStream(spark, sf).select("event_id", "event_type", "value"),
        out, ckpt).awaitTermination()
      assert(spark.read.parquet(out).count() === n1)
    } finally graft.Tables.deleteRecursively(dir.toFile)
  }

  /** ADVICE r08: the NANOS branch of [[Streams.readEventsStream]]
    * (LongType schema under `nanosAsLong` + integer-div to micros) went
    * untested once the corpus regenerated to TIMESTAMP(MICROS). Spark
    * cannot WRITE nanos timestamps, so the fixture goes through
    * parquet-mr directly: a tiny events-shaped file whose `ts` is
    * annotated TIMESTAMP(NANOS, isAdjustedToUTC=false), with sub-micro
    * residue to prove the truncation semantics.
    */
  test("file stream source honors TIMESTAMP(NANOS) parquet via the nanosAsLong branch") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}

    val dir = java.nio.file.Files.createTempDirectory("graft-nanos-fixture").toFile
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(
        false, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter.builder(
        new HPath(new java.io.File(dir, "events.parquet").getPath))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    val baseNanos = 1704067200L * 1000000000L // 2024-01-01 00:00:00 UTC
    val nanos = (0 until 6).map(i => baseNanos + i * 600L * 1000000000L + 1234L)
    nanos.zipWithIndex.foreach { case (ns, i) =>
      val g = gf.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", ns)
      g.add("user_id", (i % 2).toLong)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    }
    writer.close()
    val stream = Streams.readEventsStream(spark, dir.getPath)
    runToMemory(stream.select("event_id", "ts"), "nanos_sink", mode = "append")
    val got = spark.table("nanos_sink").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(got.size === 6)
    nanos.zipWithIndex.foreach { case (ns, i) =>
      val ts = got(i.toLong)
      val gotMicros = ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
      assert(gotMicros === ns / 1000L,
        s"event $i: expected ${ns / 1000L} micros, got $gotMicros")
    }
    // and the tumbling transform runs on the normalized column
    runToMemory(Streams.tumbling(stream), "nanos_tumbling_sink")
    assert(spark.table("nanos_tumbling_sink").collect().map(_.getLong(2)).sum === 6L)
  }

  test("rate source streams synthetic rows through the tumbling transform") {
    import org.apache.spark.sql.functions._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .select(col("timestamp").as("ts"), (col("value") % 5).as("user_id"),
        lit("view").as("event_type"), col("value").cast("double").as("value"))
    // drive the REAL windowed transform with a live (non-replay) source
    val agg = Streams.tumbling(rate)
    val q = agg.writeStream.format("memory").queryName("rate_sink")
      .outputMode("complete").start()
    try {
      var waited = 0
      while (spark.table("rate_sink").isEmpty && waited < 30000) {
        Thread.sleep(200); waited += 200
      }
      assert(!spark.table("rate_sink").isEmpty)
      val r = spark.table("rate_sink").collect().head
      assert(r.getString(1) === "view") // (ws, event_type, cnt, sum_value)
    } finally q.stop()
  }

  /** Sustained-load stress: a high-rate live source pushed through TWO
    * chained stateful operators (watermarked dedup, then the windowed
    * aggregation) for several seconds of micro-batches. Pins the
    * contracts that only show under volume: (a) exactly-once dedup
    * state — every id emitted once despite each arriving twice across
    * batch boundaries; (b) the sink's row accounting equals the
    * source's own progress accounting (no silently dropped batches);
    * (c) multiple micro-batches actually ran (it stressed the state
    * store across commits, not one batch).
    */
  test("rate-source stress: chained stateful ops stay exact across micro-batches") {
    import org.apache.spark.sql.functions._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "20000").option("numPartitions", "4").load()
      // value is a monotone long: value/2 makes every event_id arrive
      // exactly twice (consecutively, so pairs can straddle batches)
      .select((col("value") / 2).cast("long").as("event_id"),
        col("timestamp").as("ts"), (col("value") % 7).as("user_id"),
        lit("view").as("event_type"), col("value").cast("double").as("value"))
    val deduped = Streams.dedupStream(rate)
      .select("event_id", "ts", "event_type", "value")
    val q = deduped.writeStream.format("memory").queryName("stress_sink")
      .outputMode("append").start()
    try {
      var waited = 0
      // run until a real volume has flowed through several commits
      while ((spark.table("stress_sink").count() < 20000 ||
        q.recentProgress.length < 3) && waited < 60000) {
        Thread.sleep(250); waited += 250
      }
      val ids = spark.table("stress_sink").select("event_id").collect()
        .map(_.getLong(0))
      assert(ids.length >= 20000, s"only ${ids.length} rows flowed")
      // exactly-once across batch boundaries: no id emitted twice
      assert(ids.length === ids.distinct.length,
        s"dedup state leaked: ${ids.length - ids.distinct.length} dup emissions")
      assert(q.recentProgress.length >= 3, "stress ran in fewer than 3 micro-batches")
      // accounting: k emitted ids require >= 2k-1 processed arrivals
      // (value/2 pairs arrive consecutively). Only checkable when
      // recentProgress still covers every batch (it caps at 100).
      if (q.recentProgress.length < 100) {
        val input = q.recentProgress.map(_.numInputRows).sum
        assert(input >= ids.length * 2L - 1,
          s"progress accounts $input input rows for ${ids.length} unique ids")
      }
      assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val df = ms.toDF().toDF("ts", "value")
    val agg = df
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window($"ts", "10 minutes").as("w"))
      .count()
      .select($"w.start".as("ws"), $"count")
    val q = agg.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // batch 1: events at 00:01 and 00:05 — window [00:00,00:10) open
    ms.addData((t(1), 1.0), (t(5), 1.0))
    q.processAllAvailable()
    // batch 2: event at 00:35 pushes watermark to 00:25 → [00:00,00:10) finalizes
    ms.addData((t(35), 1.0))
    q.processAllAvailable()
    // batch 3: LATE event at 00:02 (before watermark) must be dropped
    ms.addData((t(2), 1.0))
    q.processAllAvailable()
    // batch 4: push watermark past everything so remaining windows emit
    ms.addData((t(120), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_sink").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the late 00:02 event was NOT added to the finalized first window
    assert(rows("2024-01-01 00:00:00.0") === 2L)
    assert(rows("2024-01-01 00:30:00.0") === 1L)
  }

  test("flatMapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Streams.Ev]
    val q = Streams.runningTotals(ms.toDS()).writeStream
      .format("memory").queryName("totals_sink").outputMode("update").start()
    def ev(u: Long, min: Int, v: Double) =
      Streams.Ev(u, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), v)
    ms.addData(ev(1, 1, 10.0), ev(1, 2, 5.0), ev(2, 3, 7.0))
    q.processAllAvailable()
    ms.addData(ev(1, 4, 2.5))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("totals_sink").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
    // user 1: 3 events totaling 17.5 after the second batch; user 2: 1 event
    assert(last(1L) === ((3L, 17.5)))
    assert(last(2L) === ((1L, 7.0)))
  }

  test("update mode re-emits only changed windows; last emission equals batch recompute") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Streams.Ev]
    val q = Streams.windowedCountsUpdate(ms.toDS()).writeStream
      .format("memory").queryName("upd_sink").outputMode("update").start()
    def ev(min: Int, v: Double) =
      Streams.Ev(1L, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), v)
    def snapshot(): Seq[(Timestamp, Long, Double)] =
      spark.table("upd_sink").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch 1: windows 00:00 and 00:10
    ms.addData(ev(1, 10.0), ev(2, 5.0), ev(11, 7.0))
    q.processAllAvailable()
    val b1 = snapshot()
    // batch 2: touches ONLY window 00:10 (update) and opens 00:20
    ms.addData(ev(12, 3.0), ev(21, 1.0))
    q.processAllAvailable()
    q.stop()
    val b2 = snapshot().diff(b1)
    def w(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    assert(b1.toSet === Set((w(0), 2L, 15.0), (w(10), 1L, 7.0)))
    // the unchanged 00:00 window is NOT re-emitted in batch 2
    assert(b2.toSet === Set((w(10), 2L, 10.0), (w(20), 1L, 1.0)))
    // last emission per window == full batch recompute; counts monotone
    val last = (b1 ++ b2).groupBy(_._1).map { case (k, rs) => k -> rs.last }
    assert(last(w(0))._2 === 2L && last(w(10))._2 === 2L && last(w(20))._2 === 1L)
    assert(b1.find(_._1 === w(10)).get._2 < b2.find(_._1 === w(10)).get._2)
  }

  test("transformWithState ValueState carries totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Streams.Ev]
      val q = Streams.runningTotalsTws(ms.toDS()).writeStream
        .format("memory").queryName("totals_tws_sink").outputMode("update").start()
      def ev(u: Long, min: Int, v: Double) =
        Streams.Ev(u, Timestamp.valueOf(f"2024-01-01 00:$min%02d:00"), v)
      ms.addData(ev(1, 1, 10.0), ev(1, 2, 5.0), ev(2, 3, 7.0))
      q.processAllAvailable()
      ms.addData(ev(1, 4, 2.5))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("totals_tws_sink").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      // batch 1 emitted (1 -> 2 events/15.0) BEFORE batch 2's state carry
      assert(rows.contains((1L, (2L, 15.0))))
      val last = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(last(1L) === ((3L, 17.5))) // state survived the batch boundary
      assert(last(2L) === ((1L, 7.0)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time timers close idle sessions at the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Streams.Ev]
      val q = Streams.sessionsTws(ms.toDS()).writeStream
        .format("memory").queryName("sessions_tws_sink").outputMode("append").start()
      def ev(u: Long, hm: String, v: Double = 1.0) =
        Streams.Ev(u, Timestamp.valueOf(s"2024-01-01 $hm:00"), v)
      // batch 1: one session for user 1 (00:00, 00:05)
      ms.addData(ev(1, "00:00"), ev(1, "00:05"))
      q.processAllAvailable()
      // batch 2: event past the 10-min gap -> closes session 1 INLINE and
      // opens (01:00)
      ms.addData(ev(1, "01:00"))
      q.processAllAvailable()
      // batches 3-4: another user's events march the watermark past
      // 01:10, so user 1's idle session can only close via its TIMER
      ms.addData(ev(2, "02:00"))
      q.processAllAvailable()
      ms.addData(ev(2, "02:30"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("sessions_tws_sink").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
        .toSet
      // gap-closed in-batch
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0", 2L)))
      // timer-closed at the watermark (no later event for user 1 exists)
      assert(rows.contains((1L, "2024-01-01 01:00:00.0", "2024-01-01 01:00:00.0", 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dropDuplicatesWithinWatermark drops in-horizon dups, re-admits after expiry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Streams.Ev]
    val deduped = ms.toDS()
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream
      .format("memory").queryName("ddww_sink").outputMode("append").start()
    def ev(u: Long, hm: String) =
      Streams.Ev(u, Timestamp.valueOf(s"2024-01-01 $hm:00"), 1.0)
    // batch 1: user 1 first-seen, then an in-horizon duplicate; user 2
    // advances the max event time
    ms.addData(ev(1, "00:00"), ev(1, "00:10"), ev(2, "00:10"))
    q.processAllAvailable()
    // batch 2: push the watermark to 01:30 (> 00:00 + 30min), expiring
    // user 1's dedup state; user 2's own state still covers this event
    // (watermark during batch 2 is still 23:40 of the prior day)
    ms.addData(ev(2, "02:00"))
    q.processAllAvailable()
    // batch 3: user 1 re-sent AFTER its state expired — must re-admit
    // (the bounded-state trade-off plain dropDuplicates never makes)
    ms.addData(ev(1, "02:30"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ddww_sink").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(rows === Set(
      (1L, "2024-01-01 00:00:00.0"),
      (2L, "2024-01-01 00:10:00.0"),
      (1L, "2024-01-01 02:30:00.0")))
  }

  test("upsert sink: merge branches, idempotent re-delivery, snapshot versioning") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-upsert-spec-")
    def batch(rows: (Long, Long, Long, String, Long)*) =
      spark.createDataFrame(rows).toDF(
        "user_id", "event_id", "t_us", "event_type", "cents")
    def snap() = Streams.currentSnapshot(spark, root).get.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .toMap
    // batch 0: two users inserted
    Streams.mergeIntoSnapshot(spark, root,
      batch((1L, 10L, 1000L, "view", 5L), (2L, 11L, 2000L, "click", 7L)), 0L)
    assert(snap() === Map(
      1L -> (1000L, 10L, "view", 1L, 5L), 2L -> (2000L, 11L, "click", 1L, 7L)))
    // batch 1: user 1 updated (newer event wins, aggregates add),
    // user 3 inserted, user 2 untouched — all three merge branches
    Streams.mergeIntoSnapshot(spark, root,
      batch((1L, 12L, 3000L, "purchase", 20L), (3L, 13L, 500L, "view", 1L)), 1L)
    val afterB1 = snap()
    assert(afterB1 === Map(
      1L -> (3000L, 12L, "purchase", 2L, 25L),
      2L -> (2000L, 11L, "click", 1L, 7L),
      3L -> (500L, 13L, "view", 1L, 1L)))
    // an OLDER event for user 1 must not displace the current state,
    // but its aggregates still count
    Streams.mergeIntoSnapshot(spark, root,
      batch((1L, 9L, 100L, "view", 3L)), 2L)
    assert(snap()(1L) === (3000L, 12L, "purchase", 3L, 28L))
    // at-least-once re-delivery of an applied batch id is a NO-OP
    val afterB2 = snap()
    Streams.mergeIntoSnapshot(spark, root,
      batch((1L, 12L, 3000L, "purchase", 20L), (3L, 13L, 500L, "view", 1L)), 1L)
    assert(snap() === afterB2, "re-delivered batch must not double-apply")
    // crash window: a version dir written but NOT committed (the flip
    // never happened) must be invisible — the re-run merges against the
    // last COMMITTED state and overwrites the torn dir
    java.nio.file.Files.createDirectories(root.resolve("v3"))
    java.nio.file.Files.write(root.resolve("v3").resolve("torn.parquet"),
      Array[Byte](1, 2, 3))
    assert(snap() === afterB2, "torn uncommitted version leaked into reads")
    Streams.mergeIntoSnapshot(spark, root, batch((2L, 14L, 9000L, "view", 2L)), 3L)
    assert(snap()(2L) === (9000L, 14L, "view", 2L, 9L))
    // versioning + RETENTION: every commit is its own snapshot dir,
    // published as a one-line put-if-absent manifest (the pointer-store
    // protocol — NO CURRENT file anywhere, r16's port of the last two
    // LWW flips), and GC keeps exactly the current + predecessor
    // manifests and their dirs (crash recovery + one-back time travel)
    // — older versions are removed, so a long-running stream's disk
    // footprint is bounded at two snapshots
    assert(!java.nio.file.Files.exists(root.resolve("CURRENT")),
      "no CURRENT file may exist in the unified protocol")
    assert(graft.store.ManifestStore.pointerCurrent(root).contains("v3"))
    val onDisk = Option(root.toFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("v\\d+")).toSet
    assert(onDisk === Set("v2", "v3"),
      s"retention must keep exactly current + predecessor, got $onDisk")
    // TIME TRAVEL one version back: the retained predecessor reads
    // as-of ITS commit — running totals are monotone and the last
    // version IS the CURRENT table
    def totals(v: String): (Long, Long) = {
      val r = spark.read.parquet(root.resolve(v).toString)
        .agg(sum("n_events"), sum("total_cents")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (t2, t3) = (totals("v2"), totals("v3"))
    assert(t2 === ((5L, 36L)) && t3 === ((6L, 38L)))
    val cur = Streams.currentSnapshot(spark, root).get
      .agg(sum("n_events"), sum("total_cents")).collect()(0)
    assert(t3 === ((cur.getLong(0), cur.getLong(1))))
    graft.Tables.deleteRecursively(root.toFile)
  }

  test("q293 stream-shingle erasure: overlay probe == q264, store never rewritten") {
    import org.apache.spark.sql.functions._
    val res = Streams.queries("q293_erased_stream_shingle")(spark, sf)
    val got = res.collect().map(_.toString).sorted.toSeq
    // bit-equal to the batch index's overlay probe (q264): the stream
    // store carries the batch index's content, so the same forget set
    // must produce the same surviving pair set
    val q264 = graft.dedup.DedupQueries
      .queries("q264_erasure_dedup_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q264 && got.nonEmpty)
    // no tombstoned id survives on either side of a pair
    res.collect().foreach { r =>
      assert(r.getLong(0) % 7 != 1 && r.getLong(1) % 7 != 1,
        s"erased doc survived: $r") }
    // tombstone overlay, store not rewritten: broadcast anti-join on
    // the manifest store's scan; erased docs pruned at the batch scan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    assert(plan.contains("graft-shingle-stream-idx2"), plan.take(1500))
    // erased text is never re-read: the batch side's documents scan
    // carries the pushed surviving-docs predicate
    assert("\\(doc_id#\\d+L? % 7\\)".r.findFirstIn(plan).isDefined,
      "surviving filter did not reach the documents scan\n" + plan.take(1500))
  }

  test("q295 folded stream-shingle store: manifest folded to one base, probe == q291") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureFoldedShingleStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    // foldAfter=2: batch 2's commit absorbed the three deltas into one
    // base — the manifest length reset is the whole point
    assert(ManifestStore.manifestMembers(table, 2L) === Seq("base-v2"))
    // the folded store is bit-equal to q291's multi-delta resolve
    val folded = ManifestStore.manifestSnapshot(spark, table).get
      .collect().map(_.toString).sorted.toSeq
    val unfolded = ManifestStore.manifestSnapshot(spark,
        Streams.ensureShingleStreamIndex(spark, sf)).get
      .collect().map(_.toString).sorted.toSeq
    assert(folded === unfolded && folded.nonEmpty)
    // probe == q291's probe == q214's output, and the read plan unions
    // nothing: one base dir only
    val got = Streams.queries("q295_folded_stream_shingle")(spark, sf)
    val gotRows = got.collect().map(_.toString).sorted.toSeq
    val q291 = Streams.queries("q291_stream_shingle_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(gotRows === q291 && gotRows.nonEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft-shingle-stream-fold"), plan.take(1500))
    assert(!plan.contains("delta-v"),
      "folded probe must read the base only\n" + plan.take(1500))
  }

  test("q304 folded stream-IVF store: manifest folded to one base, store == q292's") {
    val table = Streams.ensureFoldedIvfStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    // the composed store folds BOTH relations behind one flip
    assert(ManifestStore.manifestMembers(table, 2L) ===
      Seq("assigned:base-v2-assigned", "drift:base-v2-drift"))
    // the folded assignment store is bit-equal to q292's resolve
    val folded = ManifestStore.manifestSnapshotRel(spark, table, "assigned")
      .get.collect().map(_.toString).sorted.toSeq
    val unfolded = ManifestStore.manifestSnapshotRel(spark,
        Streams.ensureIvfStreamIndex(spark, sf), "assigned").get
      .collect().map(_.toString).sorted.toSeq
    assert(folded === unfolded && folded.nonEmpty)
    // the fold preserved the drift artifact: the folded store's
    // accumulated drift equals the unfolded store's (integer sums)
    assert(graft.sim.SimQueries.driftPpmFromContribs(
        ManifestStore.manifestSnapshotRel(spark, table, "drift").get) ===
      graft.sim.SimQueries.driftPpmFromContribs(
        ManifestStore.manifestSnapshotRel(spark,
          Streams.ensureIvfStreamIndex(spark, sf), "drift").get))
    // the probe reads the folded store only — no delta dir in the plan
    val raw = Streams.foldedStreamIvfProbe(spark, sf)
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-stream-fold"), plan.take(1500))
    assert(!plan.contains("delta-v"),
      "folded probe must read the base only\n" + plan.take(1500))
    // audited output agrees with q292's (identical store content)
    val got = raw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q292 = Streams.streamMaintainedIvfProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === q292 && got.nonEmpty)
  }

  test("q308 folded session store: one base, window-free read, snapshot == q286's") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureFoldedSessionStreamSnapshot(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    assert(ManifestStore.manifestMembers(table, 2L) === Seq("base-v2"))
    // the folded store resolves bit-equal to the unfolded LWW resolve
    val folded = ManifestStore.manifestSnapshot(spark, table,
        upsertKey = Some("user_id")).get
    val unfolded = ManifestStore.manifestSnapshot(spark,
        Streams.ensureSessionStreamSnapshot(spark, sf),
        upsertKey = Some("user_id")).get
    assert(folded.collect().map(_.toString).sorted.toSeq ===
      unfolded.collect().map(_.toString).sorted.toSeq)
    // the read-side payoff: a single-member upsert store skips the
    // merge-on-read window entirely — no __mf_seq arbitration in the
    // resolve plan (the outer sid rank is q286's own window, so pin
    // the marker's absence, not "no Window node")
    val plan = folded.queryExecution.executedPlan.toString
    assert(!plan.contains("__mf_seq"),
      "folded upsert read still arbitrates\n" + plan.take(1500))
    // the registered probe lands exactly on q286's output
    val got = Streams.queries("q308_folded_stream_sessions")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q286 = Streams.queries("q286_stream_sessions_incremental")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q286 && got.nonEmpty)
  }

  test("stream-maintained MV: q244 scans the committed snapshot, not the source") {
    val plan = Streams.streamMaintainedMv(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-upsert-snap2"),
      "q244 must be answered from the stream-maintained snapshot\n" + plan.take(1200))
    assert(!plan.contains("graft-upsert-src2"),
      "q244's rewritten plan must not scan the staged source")
    spark.conf.set(graft.plans.SummaryRewrite.EnabledKey, "false")
  }

  test("time travel: q245 reads the retained predecessor of CURRENT") {
    val table = Streams.ensureUpsertSnapshot(spark, sf)
    val cur = Streams.committedVersion(table).get
    assert(cur === 2L, "3 staged buckets must commit as batches 0..2")
    val plan = Streams.snapshotTimeTravel(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"v${cur - 1}") && !plan.contains(s"v$cur"),
      plan.take(1200))
    // and the predecessor really is the state after batches 0 and 1:
    // its user set must be a subset of CURRENT's, its totals no larger
    val prev = Streams.snapshotTimeTravel(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    val curN = Streams.currentSnapshot(spark, table).get
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(prev < curN)
  }

  test("CDC delete stream: retraction batch subtracts exactly, version history pinned") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureCdcStreamSummary(spark, sf)
    // 4 staged buckets commit as batches 0..3 (3 = the retraction)
    assert(Streams.committedVersion(table).contains(3L))
    def seg(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = seg(Streams.streamCdcDeleteMv(spark, sf))
    // final state == the surviving-corpus join recompute
    val joined = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    def agg(df: org.apache.spark.sql.DataFrame) = seg(
      df.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum")))
    val surviving = agg(joined.where(pmod(col("o_custkey"), lit(13)) =!= 0))
    assert(got === surviving && got.nonEmpty)
    // v2 (pre-retraction, batches 0..2 = ALL inserts) is the full join
    val v2 = seg(spark.read.parquet(table.resolve("v2").toString)
      .select("c_mktsegment", "n", "key_checksum"))
    assert(v2 === agg(joined))
    // the retraction genuinely bit in every segment, and no group
    // zeroed out (liveness of both classes)
    got.foreach { case (s2, (n, _)) =>
      assert(n > 0 && n < v2(s2)._1, s"segment $s2: $n vs ${v2(s2)._1}")
    }
  }

  test("stream sessions: seam-merge replay equals one-shot session_window, fusions live") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureSessionStreamSnapshot(spark, sf)
    // 3 time-cut buckets commit as batches 0..2 under the MANIFEST
    // protocol; manifest-v1 retained as predecessor
    assert(ManifestStore.committedManifest(table).contains(2L))
    assert(table.resolve("manifest-v1").toFile.exists(), "predecessor not retained")
    // O(batch) commit pin: each delta dir holds ONLY the re-merged
    // sessions of that batch's TOUCHED users — delta-v1's user set is
    // exactly the users active in epoch 1, and its rows are the exact
    // two-epoch sessionization of those users (never history's)
    val cut1 = Streams.SessionFeedCut1Us
    val cut2 = Streams.SessionFeedCut2Us
    val epoch1Users = Tables.events(spark, sf)
      .where(unix_micros(col("ts")) >= cut1 && unix_micros(col("ts")) < cut2)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val d1 = spark.read.parquet(table.resolve("delta-v1").toString)
    val d1Users = d1.select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(d1Users === epoch1Users,
      "delta-v1 must carry exactly the batch-touched users")
    val d1Rows = d1.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val twoEpochTouched = Tables.events(spark, sf)
      .where(unix_micros(col("ts")) < cut2 &&
        col("user_id").isin(epoch1Users.toSeq.map(Long.box): _*))
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
        unix_micros(col("mx")).as("e_us"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(d1Rows === twoEpochTouched,
      "delta-v1 must be the touched users' exact two-epoch sessionization")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val got = key(Streams.streamIncrementalSessions(spark, sf))
    assert(got.nonEmpty)
    // the maintained store == a ONE-SHOT session_window over all history
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("s_us")
    val oneShot = key(Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
        unix_micros(col("mx")).as("e_us"), col("n_events"))
      .withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us")))
    assert(got === oneShot)
    // the seams genuinely fused: some final session spans a batch cut
    // (starts before it, ends at-or-after it) — without this the merge
    // path is untested at this sf
    val cuts = Seq(Streams.SessionFeedCut1Us, Streams.SessionFeedCut2Us)
    assert(got.values.exists { case (_, s, e, _) =>
      cuts.exists(c => s < c && e >= c) },
      "no session spans a batch cut — seam fusion untested")
    // and the PRE-merge state differed: manifest-v1 (batches 0..1)
    // resolves — through the retained predecessor manifest — to a valid
    // sessionization of the first two epochs (one-back time travel)
    val v1 = key(ManifestStore.manifestSnapshotAt(spark, table, 1L, Some("user_id"))
      .withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us")))
    val twoEpochs = key(Tables.events(spark, sf)
      .where(unix_micros(col("ts")) < lit(Streams.SessionFeedCut2Us))
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
        unix_micros(col("mx")).as("e_us"), col("n_events"))
      .withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us")))
    assert(v1 === twoEpochs, "v1 is not the exact two-epoch sessionization")
  }

  test("q290 session-store erasure: overlay drops exactly the forget users, no rewrite") {
    import org.apache.spark.sql.functions._
    val res = Streams.queries("q290_erased_stream_sessions")(spark, sf)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    // the forget set is live: the committed store held erased users
    val table = Streams.ensureSessionStreamSnapshot(spark, sf)
    val storeUsers = ManifestStore.manifestSnapshot(spark, table, Some("user_id")).get
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(storeUsers.exists(_ % 13 == 0), "no erased user at this sf")
    got.keys.foreach { case (u, _) =>
      assert(u % 13 != 0, s"erased user $u survived") }
    // erasure == the one-shot sessionization of the SURVIVING users —
    // per-user sessions are independent, so the overlay is exact
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("s_us")
    val oneShot = Tables.events(spark, sf)
      .where(col("user_id") % 13 =!= 0)
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
        unix_micros(col("mx")).as("e_us"), col("n_events"))
      .withColumn("sid", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(4)) ->
        (r.getLong(3), r.getLong(1), r.getLong(2),
          r.getLong(2) - r.getLong(1))).toMap
    assert(got === oneShot)
    // tombstone overlay, store not rewritten: broadcast anti-join in plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    assert(plan.contains("graft-sess-stream-snap"), plan.take(1500))
  }

  test("q291 stream-maintained shingle index: store == batch index, probe == q214, v1 time travel") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureShingleStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    // the commit wrote manifests, not rewritten stores: CURRENT's
    // manifest lists the three per-batch delta dirs, oldest first
    assert(ManifestStore.manifestMembers(table, 2L) ===
      Seq("delta-v0", "delta-v1", "delta-v2"))
    // O(batch) commit pin: delta-v1 holds EXACTLY bucket 1's postings
    // (doc_id % 3 == 1), never history's — the write amplification the
    // manifest protocol exists to kill
    val d1 = spark.read.parquet(table.resolve("delta-v1").toString)
    val d1Docs = d1.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(d1Docs.nonEmpty && d1Docs.forall(_ % 3 == 1),
      "delta-v1 must carry only bucket-1 docs")
    val bucket1Postings = graft.dedup.DedupQueries.shingles(
        Tables.documents(spark, sf).where(col("doc_id") % 3 === 1)).count()
    assert(d1.count() === bucket1Postings,
      "delta-v1 row count must equal the batch's postings, not history's")
    val store = ManifestStore.manifestSnapshot(spark, table).get
    // the stream-built store carries exactly the batch-built index:
    // hashed postings joined with per-doc sizes
    val idx = graft.dedup.DedupQueries.ensureShingleIndex(spark, sf)
    val want = spark.read.parquet(s"$idx/hpostings")
      .join(spark.read.parquet(s"$idx/sizes"), "doc_id")
      .select("doc_id", "h", "n")
      .collect().map(_.toString).sorted.toSeq
    assert(store.select("doc_id", "h", "n").collect()
      .map(_.toString).sorted.toSeq === want)
    // manifest-v1 = buckets 0+1 = docs with doc_id % 3 != 2
    val v1Docs = ManifestStore.manifestSnapshotAt(spark, table, 1L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(v1Docs.nonEmpty && v1Docs.forall(_ % 3 != 2))
    // probe == the batch-index probe (q214's plan output), bit-equal
    val got = Streams.queries("q291_stream_shingle_index")(spark, sf)
    val gotRows = got.collect().map(_.toString).sorted.toSeq
    val q214 = graft.dedup.DedupQueries.queries("q214_incremental_dedup")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(gotRows === q214 && gotRows.nonEmpty)
    // the probe reads the committed store, never re-shingles history
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft-shingle-stream-idx"), plan.take(1500))
    assert("\\(doc_id#\\d+L? % 3\\) = 0".r.findFirstIn(plan).isDefined,
      "batch filter did not reach the documents scan")
  }

  test("q292 stream-maintained IVF: store == one-shot assignment, v1 time travel, pinned recall") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureIvfStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    // composed commit path (r17): each batch lands {assigned, drift}
    // behind ONE flip — six lines, batch relations adjacent
    assert(ManifestStore.manifestMembers(table, 2L) ===
      (0 to 2).flatMap(i => Seq(s"assigned:delta-v$i-assigned",
        s"drift:delta-v$i-drift")))
    // O(batch) commit pin: delta-v1 holds exactly bucket 1's
    // assignments (vec_id % 3 == 1), never history's
    val d1 = spark.read.parquet(table.resolve("delta-v1-assigned").toString)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bucket1 = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 3 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(d1 === bucket1 && d1.nonEmpty,
      "delta-v1 must carry exactly bucket 1's vectors")
    // the stream-built store carries exactly the one-shot assignment of
    // the FULL corpus at the stored (never retrained) centroids
    val cs = graft.sim.SimQueries.storedCentroidsOf(spark,
      graft.sim.SimQueries.ensureIvfIndex(spark, sf))
    val store = ManifestStore.manifestSnapshotRel(spark, table, "assigned").get
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = graft.sim.SimQueries.assignToCells(
        Tables.embeddings(spark, sf).select("vec_id", "embedding"), cs)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(store === want && store.nonEmpty)
    // manifest-v1 = buckets 0+1 = vectors with vec_id % 3 != 2
    val v1 = ManifestStore.manifestSnapshotRelAt(spark, table, "assigned", 1L)
      .get.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(v1.nonEmpty && v1.forall(_ % 3 != 2))
    // the raw probe: pinned recall vs brute, BNLJ-free plan
    val probe = Streams.queries("q292_stream_ivf_index")(spark, sf)
    val raw = Streams.streamMaintainedIvfProbe(spark, sf)
    val got = raw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.sim.SimQueries.queries("q45_knn_brute")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"stream ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-stream-idx"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    // the audited registered form carries a TRUE recall bit
    assert(probe.collect().head.getBoolean(2), "audit recall bit is false")
  }

  test("q325 drift loop: accumulated artifact exact, shipped serves stream, drifted 3rd batch retrains") {
    import org.apache.spark.sql.functions._
    // ── shipped corpus: the ingest-maintained accumulated drift must
    // equal the one-shot measurement EXACTLY (integer contributions
    // are associative), sit under the threshold, and serve the stream
    // store at the fixed codebook ──
    val root = Streams.ensureDriftLoopIvfStream(spark, sf)
    val table = root.resolve("table")
    assert(ManifestStore.committedManifest(table).contains(2L))
    // atomicity: every commit carries BOTH relations behind one flip
    val members = ManifestStore.manifestMembers(table, 2L)
    assert(members.size === 6 && (0 to 2).forall(i =>
      members.contains(s"assigned:delta-v$i-assigned") &&
        members.contains(s"drift:delta-v$i-drift")), members.toString)
    val stored = new String(java.nio.file.Files.readAllBytes(
      root.resolve("DRIFT")), "UTF-8").trim.toLong
    val oneShot = graft.sim.SimQueries.codebookDriftPpmOf(
      Tables.embeddings(spark, sf))
    assert(stored === oneShot,
      "accumulated per-batch contributions must equal the one-shot measurement bit-for-bit")
    assert(stored < graft.sim.SimQueries.DriftRetrainThresholdPpm)
    assert(ManifestStore.pointerCurrent(root).contains("stream"))
    assert(!java.nio.file.Files.exists(root.resolve("v2")),
      "no-retrain branch must not have trained anything")
    assert(!java.nio.file.Files.exists(root.resolve("CURRENT")),
      "no CURRENT file may exist in the unified protocol")
    // probe plan: the stream store's members, nothing of a retrained
    // version; audited registered form carries a TRUE recall bit
    val raw = Streams.driftLoopStreamIvfProbe(spark, sf)
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-stream-idx2") && !plan.contains("/v2/"),
      plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    assert(Streams.queries("q325_drift_loop_stream_ivf")(spark, sf)
      .collect().head.getBoolean(2), "audit recall bit is false")

    // ── drifted feed through the SAME commit + maintenance entries:
    // two same-distribution batches stay under the threshold, the
    // drifted THIRD batch crosses it, and maintenance retrains ──
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-driftloop-")
    try {
      val tableT = tmp.resolve("table")
      java.nio.file.Files.createDirectories(tableT)
      val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      val shifted = emb.select(col("vec_id"),
        when(col("vec_id") % 3 === 0,
            expr("transform(embedding, x -> x + CAST(0.05 AS FLOAT))"))
          .otherwise(col("embedding")).as("embedding"))
      val cs = graft.sim.SimQueries.storedCentroidsOf(spark,
        graft.sim.SimQueries.ensureIvfIndex(spark, sf))
      // batch order 1, 2, then the SHIFTED bucket 0 — the drift
      // arrives third
      Streams.driftLoopCommit(tableT,
        shifted.where(col("vec_id") % 3 === 1), 0L, cs)
      Streams.driftLoopCommit(tableT,
        shifted.where(col("vec_id") % 3 === 2), 1L, cs)
      val d2 = graft.sim.SimQueries.driftPpmFromContribs(
        ManifestStore.manifestSnapshotRel(spark, tableT, "drift").get)
      assert(d2 < graft.sim.SimQueries.DriftRetrainThresholdPpm,
        s"two same-distribution batches must stay under the trigger, got $d2")
      Streams.driftLoopCommit(tableT,
        shifted.where(col("vec_id") % 3 === 0), 2L, cs)
      val dAll = Streams.driftLoopMaintain(spark, tmp, shifted)
      info(s"accumulated drifted-feed drift = $dAll (2-batch prefix $d2)")
      assert(dAll >= graft.sim.SimQueries.DriftRetrainThresholdPpm,
        "the drifted third batch must push the accumulated artifact past the trigger")
      // exactness again, now on the drifted corpus
      assert(dAll === graft.sim.SimQueries.codebookDriftPpmOf(shifted))
      assert(ManifestStore.pointerCurrent(tmp).contains("v2"))
      assert(spark.read.parquet(tmp.resolve("v2").resolve("assigned").toString)
        .count() === emb.count(),
        "the retrained version must cover the full drifted corpus")
    } finally graft.Tables.deleteRecursively(tmp.toFile)
  }

  test("q296 stream-IVF erasure: no erased id either side, pinned recall, overlay in plan") {
    import org.apache.spark.sql.functions._
    val raw = Streams.erasedStreamIvfProbe(spark, sf)
    val got = raw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    got.foreach { case (q, n) =>
      assert(q % 7 != 1 && n % 7 != 1, s"erased vec in q296 output: ($q, $n)") }
    // pinned recall vs the surviving-corpus brute (its query side is
    // already the anchored vec_id % 100 set)
    val brute = graft.sim.SimQueries.knnBruteSurviving(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"erased stream ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    // tombstone overlay on the manifest store, never a rewrite; BNLJ-free
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    assert(plan.contains("graft-ivf-stream-idx2"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    // the audited registered form carries a TRUE recall bit
    assert(Streams.queries("q296_erased_stream_ivf")(spark, sf)
      .collect().head.getBoolean(2), "audit recall bit is false")
  }

  test("q297 manifest time travel: predecessor probe == buckets-0+1 recompute") {
    import org.apache.spark.sql.functions._
    val res = Streams.queries("q297_time_travel_stream_shingle")(spark, sf)
    val got = res.collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty, "no pair within the first two buckets at this sf")
    // every pair side is a doc the v1 prefix has seen (bucket 0 or 1)
    res.collect().foreach { r =>
      assert(r.getLong(0) % 3 != 2 && r.getLong(1) % 3 != 2,
        s"bucket-2 doc leaked into the v1 probe: $r") }
    // independent recompute from the BATCH index restricted to the
    // prefix's docs — the answer the previous commit must have served
    val idx = graft.dedup.DedupQueries.ensureShingleIndex(spark, sf)
    val want = graft.dedup.DedupQueries.ingestProbePairs(
        graft.dedup.DedupQueries.shingles(
            Tables.documents(spark, sf).where(col("doc_id") % 3 === 0))
          .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h")),
        spark.read.parquet(s"$idx/hpostings")
          .where(col("doc_id") % 3 =!= 2)
          .select(col("doc_id").as("oid"), col("h")),
        spark.read.parquet(s"$idx/sizes").where(col("doc_id") % 3 =!= 2))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
    // the probe reads the stream store's retained predecessor members
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-shingle-stream-idx2"), plan.take(1500))
    assert(!plan.contains("delta-v2"),
      "the v1 probe must not read batch 2's delta\n" + plan.take(1500))
  }

  test("q298 changelog: reads only the new delta, counts exact, refuses across a fold") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureShingleStreamIndex(spark, sf)
    val res = Streams.queries("q298_stream_store_changes")(spark, sf)
    // exact: the changelog is bucket 2's per-doc distinct-shingle counts
    val want = graft.dedup.DedupQueries.shingles(
        Tables.documents(spark, sf).where(col("doc_id") % 3 === 2))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .collect().map(_.toString).sorted.toSeq
    val got = res.collect().map(_.toString).sorted.toSeq
    assert(got === want && got.nonEmpty)
    // O(changes) pin: the incremental read opens delta-v2's files and
    // NOTHING else — tailing a store must never rescan it
    val changed = ManifestStore.manifestChanges(spark, table, 1L, 2L)
    val inputFiles = changed.inputFiles.toSeq
    assert(inputFiles.nonEmpty && inputFiles.forall(_.contains("delta-v2")),
      s"changelog read beyond delta-v2: $inputFiles")
    // denormalized n agrees with the changelog's own row count per doc
    val mismatch = ManifestStore.manifestChanges(spark, table, 1L, 2L)
      .groupBy("doc_id").agg(count(lit(1)).as("c"), max("n").as("n"),
        min("n").as("n2"))
      .where(col("c") =!= col("n") || col("n") =!= col("n2")).count()
    assert(mismatch === 0L)
    // a fold rewrites members; the incremental contract ends there and
    // the helper must refuse, not serve the folded base as "changes"
    val folded = Streams.ensureFoldedShingleStreamIndex(spark, sf)
    assert(ManifestStore.manifestMembers(folded, 2L) === Seq("base-v2"))
    val ex = intercept[IllegalArgumentException] {
      ManifestStore.manifestChanges(spark, folded, 1L, 2L)
    }
    assert(ex.getMessage.contains("fold"))
  }

  test("q302 upsert changelog: post-images of exactly the touched users, delta-only read") {
    import org.apache.spark.sql.functions._
    val res = Streams.queries("q302_session_store_changelog")(spark, sf)
    val got = res.collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    // the change set is exactly the users with an epoch-3 event
    val changedUsers = res.select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val epoch3Users = Tables.events(spark, sf)
      .where(unix_micros(col("ts")) >= Streams.SessionFeedCut2Us)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(changedUsers === epoch3Users)
    // post-images are complete: the changelog rows equal the committed
    // store's rows for those users (replace-wholesale semantics)
    val want = Streams.queries("q286_stream_sessions_incremental")(spark, sf)
      .where(col("user_id").isin(epoch3Users.toSeq.map(x => x: Any): _*))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
    // the read opens only the newest delta — tailing never rescans
    val table = Streams.ensureSessionStreamSnapshot(spark, sf)
    val files = ManifestStore.manifestChanges(spark, table, 1L, 2L).inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("delta-v2")), files.toString)
  }

  test("q299 contended commit: real collision, rebase loses nothing, winner's manifest intact") {
    val table = Streams.ensureContendedShingleIndex(spark, sf)
    // the recorded race: c0 bootstrapped v0 clean, A won v1 clean, B
    // collided once (a real link(2) EEXIST) and landed v2 on rebase
    val race = new String(java.nio.file.Files.readAllBytes(
      table.getParent.resolve("RACE")), "UTF-8")
    assert(race === "c0=0:0;A=1:0;B=2:1", race)
    // A's published manifest was never rewritten by B's rebase
    assert(ManifestStore.manifestMembers(table, 1L) === Seq("delta-c0", "delta-cA"))
    // the table = highest manifest: all three deltas, precedence order
    assert(ManifestStore.committedManifest(table).contains(2L))
    assert(ManifestStore.manifestMembers(table, 2L) ===
      Seq("delta-c0", "delta-cA", "delta-cB"))
    // nothing lost: the resolved store serves the probe bit-equal to
    // the single-writer stream store's (== q214's batch index)
    val got = Streams.queries("q299_contended_commit")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q291 = Streams.queries("q291_stream_shingle_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q291 && got.nonEmpty)
  }

  test("q300 ingest-time decontamination: store == q84 sweep, O(batch) deltas, no text re-read") {
    import org.apache.spark.sql.functions._
    val table = Streams.ensureDecontamStream(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    val res = Streams.queries("q300_stream_decontaminate")(spark, sf)
    val got = res.collect().map(_.toString).sorted.toSeq
    val q84 = graft.text.TextQueries.queries("q84_decontaminate")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q84 && got.nonEmpty)
    // O(batch) commit pin: delta-v1 carries only bucket-1 verdicts, and
    // exactly the batch recompute's rows
    val d1 = spark.read.parquet(table.resolve("delta-v1").toString)
    val d1Docs = d1.select("doc_id").collect().map(_.getLong(0))
    assert(d1Docs.nonEmpty && d1Docs.forall(_ % 3 == 1))
    val bench = graft.text.TextQueries.fourGrams(
        Tables.documents(spark, sf).where(col("doc_id") % 97 === 0))
      .select("gram").distinct()
    val wantD1 = graft.text.TextQueries.flagContaminated(
        graft.text.TextQueries.fourGrams(
          Tables.documents(spark, sf).where(pmod(col("doc_id"), lit(3)) === 1)),
        bench)
      .collect().map(_.toString).sorted.toSeq
    assert(d1.collect().map(_.toString).sorted.toSeq === wantD1)
    // the registered read serves verdicts from the store; the corpus
    // text is never re-read at probe time
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-decontam-stream"), plan.take(1500))
    assert(!plan.contains("documents.parquet"),
      "probe re-read the corpus\n" + plan.take(1500))
  }

  test("upsert replay equals the one-shot batch recompute") {
    import org.apache.spark.sql.functions._
    val got = Streams.upsertReplay(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .toMap
    val exp = Streams.upsertDelta(
      graft.Tables.events(spark, sf).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"), col("event_type"),
        (coalesce(col("value").cast("decimal(18,2)"), lit(0)) * 100)
          .cast("long").as("cents"))).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty && got === exp)
  }
}
