package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Tables
import graft.store.ManifestStore.{commitDelta, commitDeltaMulti, commitPointer, committedManifest, manifestSnapshot, manifestSnapshotAt, manifestSnapshotRel, manifestSnapshotTouched, manifestChanges, manifestMembers, pointerCurrent, retainedPredecessor, commitContended}

/** Structured Streaming layer over the `events` table.
  *
  * The reference is batch-only (`MapReduceFramework.cpp:191-202` runs one
  * job to completion); this module is the capability extension the task
  * calls for: file-source replay → watermarked windowed aggregation →
  * sinks, with `flatMapGroupsWithState` as the incremental analog of the
  * reference's whole-group reduce (`MapReduceClient.h:61-64` — all values
  * of one key at once, here arriving batch by batch with state carrying
  * the group between batches).
  *
  * Every transform is defined on a plain DataFrame so the SAME code runs
  * in batch (oracle-checkable, `SparkEntry.queries`) and on a stream
  * (tested via file replay + MemoryStream in StreamingSpec).
  */
object Streams {
  type Q = (SparkSession, String) => DataFrame

  /** events schema for the streaming file source (file sources need an
    * explicit schema), parameterized on the `ts` physical layout. The
    * corpus has shipped `ts` both as parquet TIMESTAMP(NANOS) (reads as
    * LongType under `nanosAsLong`) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TIMESTAMP_NTZ, and it regenerates between
    * rounds — so the stream does NOT hardcode one layout: a one-off
    * batch read of the staged file decides ([[readEventsStream]]),
    * exactly mirroring `Tables.events`' branch.
    */
  def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** File-source replay of the events table as a stream. The source is a
    * single parquet file but file stream sources monitor directories, so
    * stage a per-table temp directory containing a symlink to it.
    */
  def readEventsStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, "events.parquet").toAbsolutePath
    val staged = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-events-${math.abs(src.toString.hashCode)}")
    Files.createDirectories(staged)
    val link = staged.resolve("events.parquet")
    if (!Files.exists(link)) Files.createSymbolicLink(link, src)
    // derive the ts layout from the staged parquet itself (a metadata
    // -only batch read), then normalize the same way Tables.events does:
    // NANOS → nanosAsLong + integer-division to micros; NTZ → cast to
    // the session-zone TimestampType (UTC session, instant unchanged)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = s.read.parquet(staged.toString).schema("ts").dataType
    val raw = s.readStream
      .schema(eventsRawSchema(tsType))
      .parquet(staged.toString)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling 1-hour windows with a 1-hour watermark: count + exact sum
    * per (window, event_type).
    */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding windows: 1 hour every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Session windows: 30-minute gap per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"), col("user_id"),
        col("cnt"), col("sum_value"))

  /** Batch form of [[sessions]] on the events table — oracle-checked via
    * the classic gaps-and-islands SQL (watermark is a no-op in batch,
    * omitted).
    */
  def sessionsBatch: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"), col("user_id"),
        col("cnt"), col("sum_value"))

  /** Batch form of [[sliding]]. DuckDB oracle: a sliding window is the
    * union of the 4 quarter-hour-offset tumbling bucketings that cover
    * each event.
    */
  def slidingBatch: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Streaming exact dedup: watermarked dropDuplicates on the record id —
    * duplicate events arriving within the watermark horizon are dropped,
    * state for ids older than the watermark is reclaimed. The streaming
    * form of `q40_dedup_exact` for an at-least-once ingest pipeline.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Stream-stream interval join: each purchase joined to signups of the
    * same user within the preceding 2 hours. Both sides watermarked so
    * join state is bounded — the streaming analog of the as-of/range
    * join family.
    */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("s_ts"))
  }

  /** CHAINED stateful operators — a stream-stream interval join feeding
    * a downstream tumbling-window aggregation, two stateful operators in
    * one streaming plan (supported in append mode since the multiple-
    * stateful-operator work in Spark 3.5; the join's watermark
    * propagates to the window operator). This is the shape of a real
    * attribution pipeline: correlate purchases to recent signups, then
    * roll the correlated pairs up per hour — all incremental, state
    * bounded by the watermarks at BOTH stages. Batch form registered as
    * q101 with an exact oracle; StreamingSpec replays the same transform
    * as a stream.
    */
  def joinThenWindow(events: DataFrame): DataFrame =
    purchaseSignupJoin(events)
      .groupBy(window(col("p_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), max(col("s_ts")).as("last_signup"))
      .select(col("w.start").as("ws"), col("n_pairs"), col("last_signup"))

  def joinThenWindowBatch: Q = (s, d) => joinThenWindow(Tables.events(s, d))

  /** Stream-static dimension enrichment: the event stream equi-joined to
    * a STATIC dim table (customer), then rolled up per (hour window,
    * market segment). The static side is planned per micro-batch as an
    * ordinary batch relation — Spark broadcasts it under the usual
    * threshold, and it never holds join state (only the windowed agg
    * keeps state, bounded by the watermark). This is the third join
    * regime the streaming surface needs next to stream-stream (q69/q101)
    * and stateless transforms: the canonical fact-stream × dim-table
    * enrichment every event pipeline starts with.
    */
  def enrichWithSegment(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("c_mktsegment"), col("cnt"), col("sum_value"))

  def enrichBatch: Q = (s, d) =>
    enrichWithSegment(Tables.events(s, d), Tables.customer(s, d))

  /** Checkpointed parquet file sink: append the stream under `path`;
    * the checkpoint makes restarts resume from the last committed offset
    * instead of reprocessing (pinned by the restart test in
    * StreamingSpec). Delivery is exactly-once for readers that honor the
    * sink's `_spark_metadata` commit log (Spark itself does); external
    * readers that list part files directly can observe uncommitted files
    * after a mid-batch crash.
    */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Windowed counts intended for UPDATE output mode: each micro-batch
    * re-emits ONLY the windows it changed, with the window's new
    * cumulative aggregate — the mode a live dashboard sink consumes
    * (append would wait for the watermark to close each window;
    * complete would re-emit every window every batch). The spec pins
    * the contract: counts per window are monotone across emissions,
    * unchanged windows are NOT re-emitted, and the last emission per
    * window equals the batch recompute.
    */
  def windowedCountsUpdate(events: Dataset[Ev]): DataFrame =
    events.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("cnt"), col("sum_value"))

  /** Incremental whole-group reduce: per-user running totals carried in
    * GroupState across micro-batches — the streaming port of the
    * reference's reduce-sees-all-values contract.
    */
  def runningTotals(events: Dataset[Ev]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          evs.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** [[runningTotals]] rebuilt on `transformWithState` (Spark 4's
    * arbitrary-state API): per-user totals in a named `ValueState`
    * inside a [[org.apache.spark.sql.streaming.StatefulProcessor]] —
    * the successor surface to `flatMapGroupsWithState` with typed state
    * variables, timers, and TTL. State here is one `UserTotals` per
    * key, no TTL, no timers; semantics must be byte-identical to the
    * GroupState form (both replays share q71's batch oracle).
    */
  class TotalsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(key, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserTotals(key, n, tot)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningTotalsTws(events: Dataset[Ev]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class SessionOut(user_id: Long, start: java.sql.Timestamp,
                              end: java.sql.Timestamp, n_events: Long)
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Timer-driven sessionization on `transformWithState` — the surface
    * [[runningTotalsTws]] doesn't reach: EVENT-TIME TIMERS. A session
    * closes two ways: a later event for the same key arrives past the
    * gap (closed inline, in-batch), or no event ever comes — which only
    * the watermark can prove. The processor registers a timer at
    * `last + gap` after every batch; when the watermark crosses it,
    * [[handleExpiredTimer]] emits the session and clears state — the
    * idle-timeout every session-window engine needs, here as an explicit
    * timer instead of `GroupStateTimeout.EventTimeTimeout`. Gap is 10
    * minutes; timestamps are epoch millis inside the state.
    */
  class SessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    private val GapMs = 10 * 60 * 1000L
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    private def out(key: Long, st: SessionState): SessionOut =
      SessionOut(key, new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last), st.n)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = if (session.exists()) session.get() else null
      sorted.foreach { e =>
        val t = e.ts.getTime
        st =
          if (st == null) SessionState(t, t, 1L)
          else if (t < st.last + GapMs) SessionState(st.start, math.max(st.last, t), st.n + 1)
          else { closed += out(key, st); SessionState(t, t, 1L) } // gap: close inline
      }
      if (st != null) {
        session.update(st)
        // re-arm the idle timeout at the session's current horizon
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(st.last + GapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val st = session.get()
        // the watermark has passed last + gap: nothing can extend this
        // session any more — emit and drop the state
        session.clear()
        Iterator.single(out(key, st))
      } else Iterator.empty
  }

  /** Sessionize an event stream with [[SessionProcessor]] (requires a
    * watermark on `ts` — event-time timers fire off the watermark).
    */
  def sessionsTws(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 second")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Oracle gate for [[runningTotals]] (the `flatMapGroupsWithState`
    * surface): replay the events table through the REAL streaming
    * operator with `Trigger.AvailableNow`, land every update in a
    * parquet sink via `foreachBatch` (no driver collect — the scale
    * shape), and reduce to the final state per user: update-mode
    * emissions are cumulative, so the final state is the row with the
    * largest `n_events` (strictly increasing — a key only emits when it
    * received data). That final state must equal a plain batch
    * groupBy/agg, which is the DuckDB oracle.
    *
    * Exactness: the stream accumulates `value` in arrival order as
    * doubles; inputs are 2-decimal values, so the accumulated error is
    * ~1e-12 and the final total is canonicalized through
    * `decimal(18,2)` on both engines (the determinism pattern used
    * throughout).
    */
  def statefulTotalsReplay: Q = (s, d) =>
    replayToFinalTotals(s, d)(runningTotals)

  /** q89: the same replay through [[runningTotalsTws]].
    * `transformWithState` requires the RocksDB state store provider;
    * set it for this query's run and restore the previous provider
    * after (each replay uses a fresh checkpoint, so provider switches
    * never cross a checkpoint's lifetime).
    */
  def statefulTotalsTwsReplay: Q = (s, d) => {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try replayToFinalTotals(s, d)(runningTotalsTws)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private def replayToFinalTotals(s: SparkSession, d: String)(
      xform: Dataset[Ev] => Dataset[UserTotals]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // unique per process AND per call (createTempDirectory), so two JVMs
    // replaying the same dataset can never share — and so corrupt — a
    // checkpoint or append-mode sink; the directory is deleted below once
    // the result is materialized
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-stateful-")
    try {
    val (sink, ckpt) = (base.resolve("sink").toString, base.resolve("ckpt").toString)
    val evs = readEventsStream(s, d)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val q = xform(evs).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[UserTotals], _: Long) =>
        batch.write.mode("append").parquet(sink): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    s.read.parquet(sink)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("n_events"),
        col("total_value").cast("decimal(18,2)").cast("double").as("total_value"))
      // sever the lineage from the temp files (eager, distributed — the
      // per-user final states are tiny next to the replayed stream), so
      // the run directory can be removed before the caller consumes it
      .localCheckpoint(true)
    } finally graft.Tables.deleteRecursively(base.toFile)
  }

  /** Per-batch keyed delta for the upsert sink: the batch reduced to
    * one row per user — the latest event (max (t_us, event_id) total
    * order, carrying its type) plus additive running aggregates. Both
    * halves merge associatively across batches: `last` by struct max,
    * counts/sums by addition — so batch arrival order cannot change
    * the final snapshot.
    */
  def upsertDelta(batch: DataFrame): DataFrame =
    batch.groupBy("user_id").agg(
      max(struct(col("t_us"), col("event_id"), col("event_type"))).as("last"),
      count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
      .select(col("user_id"), col("last.t_us").as("last_us"),
        col("last.event_id").as("last_id"),
        col("last.event_type").as("last_type"),
        col("n_events"), col("total_cents"))

  /** Streaming MERGE/upsert sink — the CDC APPLY path `foreachBatch`
    * exists for: each micro-batch's keyed delta ([[upsertDelta]])
    * merges into a keyed snapshot table with (a) last-writer-wins by
    * the (t_us, event_id) total order for the current-state columns,
    * (b) additive merge for the running aggregates, (c) an IDEMPOTENCE
    * guard — foreachBatch delivery is at-least-once, so a re-delivered
    * batch id must be a no-op (derived from the committed version:
    * batch ids are monotonic, so id ≤ committed ⇒ already applied —
    * crash-safe because the manifest link is the one commit instant),
    * and (d) SNAPSHOT VERSIONING — each merge writes a new version dir
    * and publishes it as a one-line put-if-absent manifest
    * ([[commitVersion]]), so a concurrent reader never sees a
    * half-written table; after the commit, versions older than the
    * immediate predecessor are GC'd (bounded disk for a long-running
    * stream; the predecessor stays for crash recovery and one-back
    * time travel).
    * Sandbox stand-in for a lakehouse
    * `MERGE INTO` + snapshot commit: at 100 TB the same foreachBatch
    * body calls the table format's MERGE (partition/file-scoped
    * rewrite; the manifest is its transaction log). The keyed snapshot
    * here is |users|-sized — aggregate-scale, so even the full rewrite
    * per batch is bounded.
    */
  def mergeIntoSnapshot(s: SparkSession, root: java.nio.file.Path,
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    // Idempotence derives from the COMMIT POINT itself: batch ids are
    // monotonic, the highest manifest names the last committed version,
    // and the put-if-absent manifest link IS the single commit instant
    // — so a re-delivered batch id ≤ the committed one is a no-op, and
    // a crash anywhere before the link leaves the previous manifest as
    // the maximum (the re-run then merges against the CORRECT prior
    // state and overwrites the torn version dir). A separate
    // applied-marker file written after the commit would reopen a crash
    // window between the two writes — double-applying the batch against
    // its own output.
    if (committedVersion(root).exists(_ >= batchId)) return
    val delta = upsertDelta(batch)
    val merged = currentSnapshot(s, root) match {
      case None => delta
      case Some(c) =>
        def pack(df: DataFrame, tag: String): DataFrame = df.select(
          col("user_id"),
          struct(col("last_us"), col("last_id"), col("last_type")).as(s"l_$tag"),
          col("n_events").as(s"n_$tag"), col("total_cents").as(s"c_$tag"))
        pack(c, "cur").join(pack(delta, "new"), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            when(col("l_cur").isNull, col("l_new"))
              .when(col("l_new").isNull, col("l_cur"))
              .when(col("l_new") > col("l_cur"), col("l_new"))
              .otherwise(col("l_cur")).as("l"),
            (coalesce(col("n_cur"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
              .as("n_events"),
            (coalesce(col("c_cur"), lit(0L)) + coalesce(col("c_new"), lit(0L)))
              .as("total_cents"))
          .select(col("user_id"), col("l.last_us").as("last_us"),
            col("l.last_id").as("last_id"), col("l.last_type").as("last_type"),
            col("n_events"), col("total_cents"))
    }
    commitVersion(root, merged, batchId)
  }

  /** The shared COMMIT tail of every versioned snapshot sink: write the
    * merged state as `v{batchId}`, then publish that dir through the
    * manifest protocol's POINTER-store form
    * ([[graft.store.ManifestStore.commitPointer]]) — a one-line numbered
    * manifest, put-if-absent, recovery = max; NO CURRENT file (ported
    * in r16: these grain-sized MV stores and the IVF retrain pointer
    * were the last two last-writer-wins flips in the engine, and the
    * unified protocol's argument — two writers can never regress the
    * table — applies to them the same as to the data-sized stores).
    *
    * Retention: a long-running stream writes a full version dir per
    * micro-batch, so without GC disk grows without bound. commitPointer's
    * retain=2 keeps the current + predecessor manifests and reclaims
    * the version dirs only dropped manifests referenced — the
    * predecessor stays for crash recovery (a torn NEXT version
    * re-merges against it) and for time-travel reads one version back
    * (q245's contract).
    * READER CONTRACT: deletion is immediate at commit, so a read that
    * resolved a version must complete within ONE further commit cycle
    * (resolve v, survive the commit that demotes v to predecessor, die
    * at the next) — fine for this single-process replay, where every
    * reader resolves through the manifest at plan time and finishes
    * before the next trigger. If concurrent long scans ever share the
    * store, widen `retain` to a grace window or ref-count leases.
    */
  private def commitVersion(root: java.nio.file.Path, merged: DataFrame,
      batchId: Long): Unit = {
    merged.write.mode("overwrite").parquet(root.resolve(s"v$batchId").toString)
    graft.store.ManifestStore.commitPointer(root, s"v$batchId")
  }

  /** The committed version id the pointer store's manifest names, if any. */
  def committedVersion(root: java.nio.file.Path): Option[Long] =
    graft.store.ManifestStore.pointerCurrent(root)
      .map(_.stripPrefix("v").toLong)

  /** The snapshot the current pointer manifest names, if any commit
    * happened.
    */
  def currentSnapshot(s: SparkSession, root: java.nio.file.Path): Option[DataFrame] =
    committedVersion(root).map(v => s.read.parquet(root.resolve(s"v$v").toString))

  /** q233: the upsert sink replayed as a real multi-batch stream. The
    * source stages the events feed as 3 files and admits one file per
    * trigger, so AvailableNow delivers 3 micro-batches and BOTH merge
    * branches run (insert for first-seen users, update for returning
    * ones). The final snapshot must equal the one-shot batch recompute
    * — that is the oracle; associativity of [[upsertDelta]] makes it
    * hold for any file-to-batch assignment.
    */
  /** One-time, idempotent staging of the events feed as a 3-file
    * projected copy (content-fingerprint keyed, warmed by
    * `Scale.warmDerived`) — the replay's stand-in for "the upstream
    * log already exists"; per-run temp dirs hold only the checkpoint
    * and the snapshot table.
    *
    * The file-to-batch assignment is DETERMINISTIC: file `i` holds
    * exactly the events with `event_id % 3 == i`, and the three files
    * carry fixed, strictly increasing modification times, so the file
    * stream source (which orders unseen files by mtime) always
    * delivers bucket 0, then 1, then 2 — batch `i` IS bucket `i`.
    * q233's final-snapshot oracle never needed this (the merge is
    * associative), but q245's time-travel oracle reads the snapshot
    * as of batch 1 and must know which events that includes.
    */
  private val upsertSrcLock = new Object

  /** Stage each batch DataFrame as ONE parquet file `bucket-i.parquet`
    * under `dir` with fixed, strictly increasing mtimes, then stamp
    * `_SUCCESS` — the shared determinism contract of every replayed
    * feed: batch i IS bucket i (the file stream source orders
    * micro-batches by mtime). Fixed absolute stamps 60 s apart survive
    * any fs granularity and any rebuild; a filesystem that refuses the
    * stamp MUST fail the build loudly (q245's oracle contract rides on
    * this ordering), never deliver batches in creation order. Shared
    * by the events upsert feed, the orders join feed, the lineitem
    * chain feed, and the signed-CDC feed.
    */
  private def stageBuckets(dir: java.io.File, batches: Seq[DataFrame]): Unit = {
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-feed-stage-")
      try {
        b.repartition(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file staged for bucket $i"))
        val dest = new java.io.File(dir, f"bucket-$i.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(1700000000000L + i * 60000L),
          s"could not pin mtime of $dest — bucket/batch order would be undefined")
      } finally graft.Tables.deleteRecursively(tmp.toFile)
    }
    java.nio.file.Files.write(new java.io.File(dir, "_SUCCESS").toPath,
      Array.empty[Byte]): Unit
  }

  def ensureUpsertSource(s: SparkSession, d: String): String = upsertSrcLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-upsert-src2-${graft.Tables.datasetTag(d, "events")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"), col("event_type"),
        (coalesce(col("value").cast("decimal(18,2)"), lit(0)) * 100)
          .cast("long").as("cents"))
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("event_id"), lit(3)) === i)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the staged feed into a
    * versioned snapshot store — the table q244 (stream-maintained MV)
    * and q245 (time travel) read. Unlike [[upsertReplay]]'s per-run
    * temp root, this store persists across queries: after the replay,
    * CURRENT names v2 (all three batches) and the retention policy has
    * kept exactly v1 as the time-travel predecessor. A DONE marker
    * (written after `awaitTermination`) gates re-use, so a crashed
    * half-replay rebuilds from scratch instead of serving a prefix.
    */
  private val upsertSnapLock = new Object

  def ensureUpsertSnapshot(s: SparkSession, d: String): java.nio.file.Path = upsertSnapLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-upsert-snap2-${graft.Tables.datasetTag(d, "events")}")
    if (!Files.exists(root.resolve("DONE"))) {
      // replay with the MV rewrite held OFF (the Scale.withRewriteOff
      // discipline): every snapshot merge query aggregates shapes a
      // registered summary could answer, and a refresh served from its
      // own (stale) snapshot would commit wrong versions silently
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val src = ensureUpsertSource(s, d)
        val schema = s.read.parquet(src).schema
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(src)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            mergeIntoSnapshot(s, table, b.toDF(), id)
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q244: the streaming upsert snapshot AS a registered materialized
    * view — the MV rewrite answers a batch aggregate over the staged
    * source from the stream-maintained snapshot, resolved through the
    * CURRENT pointer at rewrite time. The snapshot is a user-grain
    * summary by construction (n_events = COUNT(*), total_cents =
    * SUM(cents)), so the registration is exact, and version visibility
    * rides the sink's own commit protocol: the rule can only ever see
    * the committed version the pointer names (torn or superseded
    * versions are unreachable; pinned in SummaryRewriteSpec). The
    * oracle recomputes the aggregate from the raw events the rewritten
    * plan never scans.
    */
  def streamMaintainedMv: Q = (s, d) => {
    val table = ensureUpsertSnapshot(s, d)
    val src = ensureUpsertSource(s, d)
    import graft.plans.SummaryRewrite._
    register(graft.ops.Scale.sourcePathOf(s.read.parquet(src)), Summary(
      SummaryLocation.PointerStore(table.toString), Seq("user_id"),
      Map(CountStar -> "n_events", SumCol("cents") -> "total_cents"),
      graft.ops.Scale.freshnessProbe(d, "events")))
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    s.read.parquet(src).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
  }

  /** One-time staged ORDERS feed for the stream-maintained JOIN-MV:
    * the orders table projected to (o_orderkey, o_custkey) and staged
    * as 3 files with bucket `i` = `o_orderkey % 3` under fixed,
    * strictly increasing mtimes — batch `i` IS bucket `i`, exactly
    * [[ensureUpsertSource]]'s determinism contract on a second feed.
    */
  private val ordersFeedLock = new Object

  def ensureOrdersFeed(s: SparkSession, d: String): String = ordersFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-orders-feed-${graft.Tables.datasetTag(d, "orders")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("o_orderkey"), lit(3)) === i)))
    }
    path
  }

  /** Merge delta partials ADDITIVELY into the current snapshot — the
    * single merge semantics all additive stream-maintained summaries
    * share (q261 join-MV, q266 chain-MV, q268 signed-CDC — whose
    * negative deltas ride the same addition — q288 snowflake, q289
    * composite). ONE definition with the batch-IVM merges: delegates to
    * `Scale.additiveMergeOn` so the two refresh families cannot drift.
    */
  private def additiveMerge(cur: DataFrame, delta: DataFrame,
      grain: Seq[String], measures: Seq[String]): DataFrame =
    graft.ops.Scale.additiveMergeOn(cur, delta, grain, measures)

  /** One-time, idempotent DURABLE replay of the orders feed into a
    * versioned SEGMENT-grain snapshot: each micro-batch joins the
    * static customer dimension (the stream-static enrichment q113
    * pins), aggregates to (c_mktsegment, n, key_checksum) partials,
    * and merges them ADDITIVELY into the snapshot behind the shared
    * commit protocol ([[commitVersion]]: atomic pointer flip,
    * idempotent by committed-id, predecessor retained). This is the
    * stream-side maintenance of q250's join-MV: the summary stays
    * fresh per batch without ever re-joining history — per batch the
    * work is |batch| ⋈ dimension plus a |segments|-row merge.
    */
  private val segStreamLock = new Object

  def ensureSegmentStreamSummary(s: SparkSession, d: String): java.nio.file.Path = segStreamLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-seg-stream-snap-${graft.Tables.datasetTag(d, "orders", "customer")}")
    if (!Files.exists(root.resolve("DONE"))) {
      // replay with the MV rewrite held OFF (the Scale.withRewriteOff
      // discipline): the per-batch delta — customer ⋈ batch, grouped
      // by segment — is exactly the shape q261 registers for this
      // source pair, and a refresh served from its own (stale)
      // snapshot would commit wrong versions silently. The micro-batch
      // session is cloned at stream start, so the conf set here is the
      // one the batch plans see.
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureOrdersFeed(s, d)
        val schema = s.read.parquet(feed).schema
        val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedVersion(table).exists(_ >= id)) {
              val delta = b.toDF()
                .join(cust, col("o_custkey") === col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"))
              val merged = currentSnapshot(s, table) match {
                case None => delta
                case Some(c) =>
                  additiveMerge(c, delta, Seq("c_mktsegment"), Seq("n", "key_checksum"))
              }
              commitVersion(table, merged, id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q261: the STREAM-MAINTAINED JOIN-MV — q244's CURRENT-pointer MV
    * composed with q250's join registry: a batch aggregate over the
    * customer ⋈ orders-feed inner equi-join is answered from the
    * segment snapshot the stream maintains, resolved through the
    * CURRENT pointer at rewrite time (only the committed version is
    * ever visible — the sink's own commit protocol is the MV's
    * visibility contract). The rewritten plan scans the |segments|-row
    * snapshot and joins NOTHING; the oracle recomputes the join from
    * customer and orders (the feed carries every orders row). At
    * 100 TB this is THE freshness answer for star-schema dashboards:
    * the order stream keeps the summary current per micro-batch, and
    * every dashboard query collapses to a snapshot lookup.
    */
  def streamMaintainedJoinMv: Q = (s, d) => {
    val table = ensureSegmentStreamSummary(s, d)
    val feed = ensureOrdersFeed(s, d)
    import graft.plans.SummaryRewrite._
    registerJoin(
      graft.ops.Scale.sourcePathOf(Tables.customer(s, d)),
      graft.ops.Scale.sourcePathOf(s.read.parquet(feed)),
      JoinSummary("c_custkey", "o_custkey",
        SummaryLocation.PointerStore(table.toString), Seq("c_mktsegment"),
        Map(CountStar -> "n", SumCol("o_orderkey") -> "key_checksum"),
        graft.ops.Scale.freshnessProbe(d, "orders", "customer")))
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.customer(s, d)
      .join(s.read.parquet(feed), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"))
  }

  /** One-time staged LINEITEM feed for the stream-maintained CHAIN-MV:
    * lineitem projected to (l_orderkey, l_partkey) and staged as 3
    * files with bucket `i` = `l_orderkey % 3` under fixed, strictly
    * increasing mtimes — the [[ensureOrdersFeed]] determinism contract
    * on the fact side of the 3-table chain.
    */
  private val lineitemFeedLock = new Object

  def ensureLineitemFeed(s: SparkSession, d: String): String = lineitemFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-li-feed-${graft.Tables.datasetTag(d, "lineitem")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("l_orderkey"), lit(3)) === i)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the lineitem feed into a
    * versioned SEGMENT-grain chain snapshot: each micro-batch joins the
    * static orders bridge and customer dimension (batch ⋈ O ⋈ C — the
    * per-batch work of stream-maintaining a star CHAIN), aggregates to
    * (c_mktsegment, n, key_checksum, sum_part, cnt_part) partials, and
    * merges them ADDITIVELY into the snapshot behind the shared commit
    * protocol. Per batch the cost is |batch| probing two key-partitioned
    * dimensions plus a |segments|-row merge — history is never re-joined.
    */
  private val chainStreamLock = new Object

  def ensureChainStreamSummary(s: SparkSession, d: String): java.nio.file.Path = chainStreamLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-chain-stream-snap-${graft.Tables.datasetTag(d, "lineitem", "orders", "customer")}")
    if (!Files.exists(root.resolve("DONE"))) {
      // rewrite held OFF during replay: the per-batch delta aggregate is
      // exactly the chain shape q266 registers, and a refresh served
      // from its own stale snapshot would commit wrong versions
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureLineitemFeed(s, d)
        val schema = s.read.parquet(feed).schema
        val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedVersion(table).exists(_ >= id)) {
              val delta = b.toDF()
                .join(ord, col("l_orderkey") === col("o_orderkey"))
                .join(cust, col("o_custkey") === col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
                  sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
              val merged = currentSnapshot(s, table) match {
                case None => delta
                case Some(c) => additiveMerge(c, delta, Seq("c_mktsegment"),
                  Seq("n", "key_checksum", "sum_part", "cnt_part"))
              }
              commitVersion(table, merged, id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q266: the STREAM-MAINTAINED CHAIN-MV — the last cell of the
    * {single-table, join, chain} × {full, incremental, delete-bearing,
    * stream-maintained} MV matrix: a batch aggregate over the 3-table
    * star chain (lineitem-feed ⋈ orders ⋈ customer) is answered from
    * the segment snapshot the lineitem STREAM maintains, resolved
    * through the CURRENT pointer at rewrite time. AVG rides the
    * snapshot's SUM/COUNT(col) pair through the chain registry, so the
    * rewritten plan scans the |segments|-row snapshot and joins
    * NOTHING; the oracle recomputes the full 3-way join from base
    * tables the plan never touches. At 100 TB: the fact stream keeps a
    * star-chain dashboard current per micro-batch, and the dashboard
    * query collapses to a snapshot lookup — the freshest possible
    * answer at the cheapest possible read.
    */
  def streamMaintainedChainMv: Q = (s, d) => {
    val table = ensureChainStreamSummary(s, d)
    val feed = ensureLineitemFeed(s, d)
    // the Sum/Count pair below lets AVG ride this summary: the same
    // 2^53 guard every batch-path AVG-enabling registration runs
    // (marker cached in the snapshot table dir)
    graft.ops.Scale.assertAvgRewriteSafe(
      s.read.parquet(feed)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey")),
      table.toString, "l_partkey")
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(graft.ops.Scale.sourcePathOf(s.read.parquet(feed)),
        graft.ops.Scale.sourcePathOf(Tables.orders(s, d)),
        graft.ops.Scale.sourcePathOf(Tables.customer(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")),
        SummaryLocation.PointerStore(table.toString), Seq("c_mktsegment"),
        Map(CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("l_partkey") -> "sum_part", CountCol("l_partkey") -> "cnt_part"),
        graft.ops.Scale.freshnessProbe(d, "lineitem", "orders", "customer")))
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    s.read.parquet(feed)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  /** One-time, idempotent DURABLE replay of the lineitem feed into a
    * versioned SNOWFLAKE-grain snapshot: each micro-batch joins BOTH
    * static dimensions off the fact batch (batch ⋈ orders on the order
    * key AND batch ⋈ part on the part key — the q276 shape, hop 2 keyed
    * off the fact side), aggregates to ((o_orderpriority, p_type), n,
    * key_checksum, sum_size) partials, and merges them ADDITIVELY into
    * the snapshot behind the shared commit protocol. The first
    * multi-column-grain stream merge (the merge itself is grain-width
    * agnostic). Per batch: |batch| probing two key-partitioned dims
    * plus a |grain|-row merge — history never re-joined.
    */
  private val snowStreamLock = new Object

  def ensureSnowflakeStreamSummary(s: SparkSession, d: String): java.nio.file.Path = snowStreamLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-snow-stream-snap-${graft.Tables.datasetTag(d, "lineitem", "orders", "part")}")
    if (!Files.exists(root.resolve("DONE"))) {
      // rewrite held OFF during replay: the per-batch delta aggregate is
      // exactly the snowflake shape q288 registers
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureLineitemFeed(s, d)
        val schema = s.read.parquet(feed).schema
        val ord = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        val prt = Tables.part(s, d).select("p_partkey", "p_type", "p_size")
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedVersion(table).exists(_ >= id)) {
              val delta = b.toDF()
                .join(ord, col("l_orderkey") === col("o_orderkey"))
                .join(prt, col("l_partkey") === col("p_partkey"))
                .groupBy("o_orderpriority", "p_type")
                .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
                  sum("p_size").as("sum_size"))
              val merged = currentSnapshot(s, table) match {
                case None => delta
                case Some(c) => additiveMerge(c, delta,
                  Seq("o_orderpriority", "p_type"),
                  Seq("n", "key_checksum", "sum_size"))
              }
              commitVersion(table, merged, id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q288: the STREAM-MAINTAINED SNOWFLAKE-MV — the stream cell for the
    * two-dims-off-one-fact shape round 12 added (q276 full, q283/q284
    * refreshes): a batch aggregate over fact-feed ⋈ orders ⋈ part,
    * grain spanning both dimensions, answered from the snapshot the
    * fact STREAM maintains through the CURRENT pointer. Completes the
    * snowflake column of the MV matrix {full, incremental,
    * delete-bearing, stream-maintained}; the oracle recomputes the
    * 3-way join from base tables the rewritten plan never touches.
    */
  def streamMaintainedSnowflakeMv: Q = (s, d) => {
    val table = ensureSnowflakeStreamSummary(s, d)
    val feed = ensureLineitemFeed(s, d)
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(graft.ops.Scale.sourcePathOf(s.read.parquet(feed)),
        graft.ops.Scale.sourcePathOf(Tables.orders(s, d)),
        graft.ops.Scale.sourcePathOf(Tables.part(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("l_partkey", "p_partkey")),
        SummaryLocation.PointerStore(table.toString),
        Seq("o_orderpriority", "p_type"),
        Map(CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("p_size") -> "sum_size"),
        graft.ops.Scale.freshnessProbe(d, "lineitem", "orders", "part")))
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    s.read.parquet(feed)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy("o_orderpriority", "p_type")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("p_size").as("sum_size"))
  }

  /** One-time staged WIDE lineitem feed for the stream-maintained
    * COMPOSITE-key MV: both composite key columns plus the grain
    * columns (the 2-column [[ensureLineitemFeed]] cannot carry the
    * (partkey, suppkey) bridge probe), 3 buckets by l_orderkey % 3
    * under the fixed increasing-mtime contract.
    */
  private val compositeFeedLock = new Object

  def ensureCompositeFeed(s: SparkSession, d: String): String = compositeFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-li-cfeed-${graft.Tables.datasetTag(d, "lineitem")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.lineitem(s, d).select("l_orderkey", "l_partkey",
        "l_suppkey", "l_returnflag", "l_linestatus")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("l_orderkey"), lit(3)) === i)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the wide lineitem feed into
    * a versioned COMPOSITE-grain snapshot: each micro-batch probes the
    * materialized (partkey, suppkey) bridge on BOTH key columns and
    * merges ((l_returnflag, l_linestatus), n, key_checksum, sum_pscnt)
    * partials additively behind the shared commit protocol.
    */
  private val compStreamLock = new Object

  def ensureCompositeStreamSummary(s: SparkSession, d: String): java.nio.file.Path = compStreamLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-comp-stream-snap-${graft.Tables.datasetTag(d, "lineitem")}")
    if (!Files.exists(root.resolve("DONE"))) {
      // rewrite held OFF during replay: the per-batch delta is exactly
      // the composite shape q289 registers
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureCompositeFeed(s, d)
        val bridge = s.read.parquet(graft.ops.Scale.ensurePartsuppBridge(s, d))
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedVersion(table).exists(_ >= id)) {
              val delta = b.toDF()
                .join(bridge, col("l_partkey") === col("ps_partkey") &&
                  col("l_suppkey") === col("ps_suppkey"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
                  sum("ps_cnt").as("sum_pscnt"))
              val merged = currentSnapshot(s, table) match {
                case None => delta
                case Some(c) => additiveMerge(c, delta,
                  Seq("l_returnflag", "l_linestatus"),
                  Seq("n", "key_checksum", "sum_pscnt"))
              }
              commitVersion(table, merged, id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q289: the STREAM-MAINTAINED COMPOSITE-KEY MV — the LAST open cell
    * of the MV maintenance matrix: all five registered shapes
    * (single-table, join, chain, composite, snowflake) now carry all
    * four maintenance modes (full, incremental, delete-bearing,
    * stream-maintained). A batch aggregate over feed ⋈ bridge on the
    * two-column key set is answered from the snapshot the fact stream
    * maintains, resolved through the CURRENT pointer by the composite
    * registry's pair-SET matcher; oracle recomputes the bridge and the
    * join from lineitem.
    */
  def streamMaintainedCompositeMv: Q = (s, d) => {
    val table = ensureCompositeStreamSummary(s, d)
    val feed = ensureCompositeFeed(s, d)
    val bridge = graft.ops.Scale.ensurePartsuppBridge(s, d)
    import graft.plans.SummaryRewrite._
    registerCompositeJoin(
      graft.ops.Scale.sourcePathOf(s.read.parquet(feed)),
      graft.ops.Scale.sourcePathOf(s.read.parquet(bridge)),
      CompositeJoinSummary(Seq(("l_partkey", "ps_partkey"), ("l_suppkey", "ps_suppkey")),
        SummaryLocation.PointerStore(table.toString),
        Seq("l_returnflag", "l_linestatus"),
        Map(CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("ps_cnt") -> "sum_pscnt"),
        graft.ops.Scale.freshnessProbe(d, "lineitem")))
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    s.read.parquet(feed)
      .join(s.read.parquet(bridge),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("ps_cnt").as("sum_pscnt"))
  }

  /** One-time staged signed-CDC ORDERS feed for the delete-bearing
    * stream MV: buckets 0–2 are the insert stream (orders row, op=+1,
    * bucket i = o_orderkey % 3), bucket 3 is the RETRACTION batch — an
    * erasure request (op=−1) for every order of the forget-set
    * customers (o_custkey % 13 == 0, the q218 request-queue shape) —
    * staged last under the fixed increasing-mtime contract so batch 3
    * is the retraction micro-batch.
    */
  private val ordersCdcFeedLock = new Object

  def ensureOrdersCdcFeed(s: SparkSession, d: String): String = ordersCdcFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-orders-cdc-feed-${graft.Tables.datasetTag(d, "orders")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("o_orderkey"), lit(3)) === i)
          .withColumn("op", lit(1L))) :+
        projected.where(pmod(col("o_custkey"), lit(13)) === 0)
          .withColumn("op", lit(-1L)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the signed feed into the
    * versioned segment snapshot: per micro-batch, op-WEIGHTED partials
    * (`sum(op)`, `sum(op·key)`) merge additively into the snapshot —
    * the retraction batch simply arrives with negative weights and the
    * SAME merge subtracts it; zeroed groups drop at the merge, exactly
    * the q255/q262 delete semantics riding the streaming commit
    * protocol. All maintained measures are additive on this grain, so
    * no repair scan exists anywhere.
    */
  private val cdcStreamLock = new Object

  def ensureCdcStreamSummary(s: SparkSession, d: String): java.nio.file.Path = cdcStreamLock.synchronized {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(
      s"${graft.Tables.scratchDir}/graft-cdc-stream-snap-${graft.Tables.datasetTag(d, "orders", "customer")}")
    if (!Files.exists(root.resolve("DONE"))) {
      graft.ops.Scale.withRewriteOff(s) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureOrdersCdcFeed(s, d)
        val schema = s.read.parquet(feed).schema
        val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedVersion(table).exists(_ >= id)) {
              val delta = b.toDF()
                .join(cust, col("o_custkey") === col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(sum("op").as("n"),
                  sum(col("op") * col("o_orderkey")).as("key_checksum"))
              val merged = (currentSnapshot(s, table) match {
                case None => delta
                case Some(c) =>
                  additiveMerge(c, delta, Seq("c_mktsegment"), Seq("n", "key_checksum"))
              }).where(col("n") =!= 0L)
              commitVersion(table, merged, id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q268: the DELETE-BEARING stream-maintained MV — streaming erasure:
    * the retraction micro-batch (op=−1 rows for every order of the
    * q218-shaped forget-set, o_custkey % 13 == 0) flows through the
    * SAME op-weighted merge as the inserts, and the committed snapshot
    * lands exactly on the surviving-corpus recompute (the oracle joins
    * orders WHERE o_custkey % 13 <> 0 to customer). Completes the MV
    * maintenance matrix's last axis: batch IVM handles deletes
    * (q255/q259/q262) and the stream path now does too — an erasure
    * request is just a negatively-signed micro-batch, which is exactly
    * how production CDC (Debezium op=d, Flink retract streams)
    * delivers it. The spec pins the version history: v2 (pre-
    * retraction) equals the insert-only aggregate, v3 the surviving
    * one.
    */
  def streamCdcDeleteMv: Q = (s, d) => {
    val table = ensureCdcStreamSummary(s, d)
    currentSnapshot(s, table)
      .getOrElse(sys.error("no committed CDC snapshot"))
      .select("c_mktsegment", "n", "key_checksum")
  }

  /** q245: snapshot TIME TRAVEL as a registered, oracle-gated query —
    * read the retained predecessor version (v1) while CURRENT names v2.
    * Because batch `i` is exactly bucket `i` (see
    * [[ensureUpsertSource]]), "the table as of batch 1" has a precise
    * relational definition the oracle recomputes from raw events:
    * the upsert state over events with `event_id % 3 IN (0, 1)`.
    */
  def snapshotTimeTravel: Q = (s, d) => {
    val table = ensureUpsertSnapshot(s, d)
    val prev = graft.store.ManifestStore.pointerPredecessor(table)
      .getOrElse(sys.error("no predecessor version retained"))
    s.read.parquet(table.resolve(prev).toString)
      .select("user_id", "last_us", "last_id", "last_type",
        "n_events", "total_cents")
  }

  /** One-time staged EVENTS feed for the stream-maintained session
    * store: (user_id, event_id, ts) staged as 3 files cut at FIXED
    * timestamps (2024-01-11 / 2024-01-21 UTC — the corpus spans
    * January, so all three cuts are live at every sf) under strictly
    * increasing mtimes. Unlike the other feeds' key-mod buckets, the
    * cut MUST be a time cut: incremental sessionization's correctness
    * argument (q208's) requires every event of batch i to precede every
    * event of batch i+1 per user, so only the epoch-boundary session
    * pair can ever fuse.
    */
  private val sessFeedLock = new Object

  /** The session feed's two epoch cuts (Jan 11 / Jan 21 UTC, micros) —
    * named so every consumer (the staging split, the q302 changelog
    * oracle, StreamingSpec's epoch assertions) provably shares ONE
    * boundary: a drifting literal would silently re-scope what "batch
    * 2's touched users" means.
    */
  private[graft] val SessionFeedCut1Us = 1704931200000000L
  private[graft] val SessionFeedCut2Us = 1705795200000000L

  def ensureSessionFeed(s: SparkSession, d: String): String = sessFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-sess-feed-${graft.Tables.datasetTag(d, "events")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts"))
      val t = unix_micros(col("ts"))
      stageBuckets(dir, Seq(ev.where(t < SessionFeedCut1Us),
        ev.where(t >= SessionFeedCut1Us && t < SessionFeedCut2Us),
        ev.where(t >= SessionFeedCut2Us)))
    }
    path
  }

  /** The q286 seam-merge: union committed per-user session intervals
    * with a batch's new sessions and re-island. Since r14 the input is
    * DELTA-SCOPED — only the sessions of users PRESENT in the batch
    * reach this pass ([[manifestSnapshotTouched]] semi-joins every
    * store member on the batch's user set before the resolve), because
    * sessions are per-user disjoint: an untouched user's sessions
    * cannot change, the same argument q290's erasure already relies
    * on. Cost is O(batch + touched users' sessions), never
    * O(store log store). Fusion uses session_window's OWN boundary
    * semantics (break at gap ≥ 6 h, merge strictly inside — Spark's
    * session_window merges an event while ts < session end = last +
    * gap), so the maintained store lands bit-equal to a one-shot
    * session_window over all history.
    */
  private def seamMergeSessions(parts: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("s_us")
    parts
      .withColumn("prev_e", lag("e_us", 1).over(w))
      .withColumn("brk",
        when(col("prev_e").isNull || col("s_us") - col("prev_e") >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("g", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "g")
      .agg(sum("n_events").as("n_events"),
        min("s_us").as("s_us"), max("e_us").as("e_us"))
      .select("user_id", "s_us", "e_us", "n_events")
  }

  /** One-time, idempotent DURABLE replay of the events feed into a
    * SESSION store — q208's incremental sessionization as a STREAM:
    * each micro-batch is sessionized with `session_window` (6-hour
    * gap), the committed sessions of ONLY the batch-touched users are
    * read back ([[manifestSnapshotTouched]] — per-user disjointness
    * makes every other user's sessions provably unchanged), the
    * seam-merge re-islands that union, and the result commits as a
    * per-batch DELTA behind the manifest protocol ([[commitDelta]],
    * upsert on user_id: the newest delta containing a user carries
    * that user's complete session set). This is the stream-side
    * maintenance of a NON-algebraic windowed operator — the gap the
    * additive merges (q261/q266/q268) cannot cover: a session is not a
    * sum, the merge is the q208 islands pass over session INTERVALS.
    * Per batch the work AND the write are O(batch + touched users'
    * sessions); history events are never re-sessionized and untouched
    * users' sessions are never re-read or re-written.
    */
  private val sessStreamLock = new Object

  def ensureSessionStreamSnapshot(s: SparkSession, d: String): java.nio.file.Path =
    sessStreamLock.synchronized {
      sessionStreamReplay(s, d,
        s"graft-sess-stream-snap2-${graft.Tables.datasetTag(d, "events")}",
        foldAfter = 8)
    }

  /** The q308 store: the session replay with `foldAfter = 2` — the LSM
    * absorb step on the UPSERT store: batch 2's commit resolves the
    * members (merge-on-read, newest-member-wins per user) ONCE and
    * writes the result as a single base, after which every read skips
    * the LWW window entirely ([[resolveMembers]]' single-member fast
    * path) — the read-side payoff the fold buys on an upsert store,
    * beyond the member-count bound it buys on append stores.
    */
  private val foldedSessStreamLock = new Object

  def ensureFoldedSessionStreamSnapshot(s: SparkSession, d: String): java.nio.file.Path =
    foldedSessStreamLock.synchronized {
      sessionStreamReplay(s, d,
        s"graft-sess-stream-fold-${graft.Tables.datasetTag(d, "events")}",
        foldAfter = 2)
    }

  /** Shared replay body of the two session stream stores. */
  private[graft] def sessionStreamReplay(s: SparkSession, d: String, dirName: String,
      foldAfter: Int): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"${graft.Tables.scratchDir}/$dirName")
    if (!Files.exists(root.resolve("DONE"))) {
      if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
      val table = root.resolve("table")
      Files.createDirectories(table)
      val feed = ensureSessionFeed(s, d)
      val schema = s.read.parquet(feed).schema
      val gapUs = 6L * 3600L * 1000000L
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          if (!committedManifest(table).exists(_ >= id)) {
            val batchSess = b.toDF()
              .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
              .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
              .select(col("user_id"), unix_micros(col("w.start")).as("s_us"),
                unix_micros(col("mx")).as("e_us"), col("n_events"))
            val touched = batchSess.select("user_id").distinct()
            val delta = manifestSnapshotTouched(s, table, "user_id", touched) match {
              case None => batchSess
              case Some(prior) => seamMergeSessions(
                prior.unionByName(batchSess.select(prior.columns.map(col): _*)),
                gapUs)
            }
            commitDelta(table, delta, id, upsertKey = Some("user_id"),
              foldAfter = foldAfter)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q286: STREAM-maintained incremental sessionization served from
    * the committed session store — the last non-algebraic stream-MV
    * gap: the one-shot answer (sessionize ALL history, q208's product
    * under session_window's gap semantics) read as a manifest-resolved
    * snapshot lookup, maintained per micro-batch at O(batch + touched
    * users' sessions) write AND compute cost. Session
    * ids are minted at read time (row_number over s_us — after
    * fusion every surviving session is ≥ gap from its neighbor, so
    * the rank IS q208's running-break sum); the oracle re-sessionizes
    * every event in one pass. StreamingSpec pins the replay: 3
    * committed versions, seam fusions occurred, final state bit-equal
    * to the one-shot batch session_window.
    */
  def streamIncrementalSessions: Q = (s, d) => {
    val table = ensureSessionStreamSnapshot(s, d)
    val snap = manifestSnapshot(s, table, upsertKey = Some("user_id"))
      .getOrElse(sys.error("no committed session snapshot"))
    val w = Window.partitionBy("user_id").orderBy("s_us")
    snap.withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us"))
  }

  /** q308: the q286 probe served from the FOLDED session store — the
    * LSM absorb step on the UPSERT store: the fold resolved the
    * newest-member-wins merge ONCE at commit time, so every subsequent
    * read is a plain single-dir scan with NO merge-on-read window —
    * q295/q304 prove the fold on append stores (member-count bound);
    * this proves the stronger upsert payoff (per-read compute
    * deleted). Identical output to q286 — its gaps-and-islands oracle
    * verbatim; StreamingSpec pins the [base-v2] manifest, bit-equality
    * with the unfolded store's resolve, and the window-free read plan.
    */
  def foldedStreamSessions: Q = (s, d) => {
    val table = ensureFoldedSessionStreamSnapshot(s, d)
    val snap = manifestSnapshot(s, table, upsertKey = Some("user_id"))
      .getOrElse(sys.error("no committed session snapshot"))
    val w = Window.partitionBy("user_id").orderBy("s_us")
    snap.withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us"))
  }

  /** q290: ERASURE on the stream-maintained session store — the DELETE
    * cell for the non-algebraic MV q286 added: a right-to-erasure batch
    * of USER ids (user_id % 13 == 0, the q218/q268 forget-set shape on
    * the session store's subject key) applies to the committed store as
    * a broadcast-anti-join tombstone overlay. Sessions are per-user
    * disjoint intervals, so user-level erasure needs NO re-sessionizing
    * at all — the overlay drops whole partitions of the store, which is
    * exactly why production session stores key erasure by subject. The
    * store is never rewritten (O(|forget set|)); the result is proven
    * equal to a one-shot sessionization of the surviving users' events
    * (the oracle) and the plan touches events only for the
    * user_id-projected forget list, never the erased users' rows.
    */
  def erasedStreamSessions: Q = (s, d) => {
    val table = ensureSessionStreamSnapshot(s, d)
    val snap = manifestSnapshot(s, table, upsertKey = Some("user_id"))
      .getOrElse(sys.error("no committed session snapshot"))
    val tomb = broadcast(sessionTombstones(s, d))
    val w = Window.partitionBy("user_id").orderBy("s_us")
    snap.join(tomb, Seq("user_id"), "left_anti")
      .withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us"))
  }

  /** One-time staged DOCUMENTS feed for the stream-maintained shingle
    * index: (doc_id, text) in 3 buckets by doc_id % 3 under the fixed
    * increasing-mtime contract — the corpus arriving as a stream.
    */
  private val docsFeedLock = new Object

  def ensureDocsFeed(s: SparkSession, d: String): String = docsFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-docs-feed-${graft.Tables.datasetTag(d, "documents")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.documents(s, d).select("doc_id", "text")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("doc_id"), lit(3)) === i)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the documents feed into a
    * SHINGLE-INDEX store — a stream-maintained SECONDARY INDEX, not an
    * aggregate MV: each micro-batch is shingled once (per-batch work
    * only — history text is never re-shingled) and its hashed postings
    * APPEND to the committed store behind the manifest protocol
    * ([[commitDelta]]): the commit writes the batch's postings as one
    * immutable delta dir and a manifest line — history is neither
    * re-read nor re-written (buckets partition the doc space, so the
    * read-side resolve is a pure union: the per-key idempotence the
    * aggregate merges need from coalesce-addition comes free from
    * disjointness here). The store denormalizes the per-doc
    * distinct-shingle count onto each posting row ((doc_id, h, n)) so
    * postings AND sizes commit in ONE atomic pointer flip — two
    * separately-flipped relations could serve a torn index between
    * flips; at 100 TB the +8 bytes/posting buys crash-consistent reads
    * with no cross-table commit coordination.
    */
  private val shingleStreamLock = new Object

  def ensureShingleStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    shingleStreamLock.synchronized {
      shingleStreamReplay(s, d,
        s"graft-shingle-stream-idx2-${graft.Tables.datasetTag(d, "documents")}",
        foldAfter = 8)
    }

  /** The q295 store: [[ensureShingleStreamIndex]]'s replay with
    * `foldAfter = 2`, so batch 2's commit crosses the threshold and
    * FOLDS the three deltas into one fresh base — the LSM absorb step
    * running inside the commit path. After the fold the manifest lists
    * exactly one base dir, reads union nothing, and the next commit's
    * GC drops the folded-away deltas (the predecessor manifest keeps
    * them readable until then). Kept as a SEPARATE artifact from q291's
    * store so the multi-member read path stays exercised there.
    */
  private val foldedShingleStreamLock = new Object

  def ensureFoldedShingleStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    foldedShingleStreamLock.synchronized {
      shingleStreamReplay(s, d,
        s"graft-shingle-stream-fold-${graft.Tables.datasetTag(d, "documents")}",
        foldAfter = 2)
    }

  /** One batch's contribution to the shingle store: hashed postings
    * with the per-doc distinct-shingle count denormalized on
    * ((doc_id, h, n)) — the delta every committer (the stream replay,
    * q299's concurrent batch writers) writes. Within-doc compute only,
    * so it is exact on any corpus subset.
    */
  private[graft] def shinglePostings(docs: DataFrame): DataFrame = {
    val sh = graft.dedup.DedupQueries.shingles(docs)
    sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(sh, "doc_id")
      .select(col("doc_id"), xxhash64(col("s")).as("h"), col("n"))
  }

  /** Shared replay body of the shingle stream stores. */
  private[graft] def shingleStreamReplay(s: SparkSession, d: String, dirName: String,
      foldAfter: Int, retain: Int = 2): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"${graft.Tables.scratchDir}/$dirName")
    if (!Files.exists(root.resolve("DONE"))) {
      if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
      val table = root.resolve("table")
      Files.createDirectories(table)
      val feed = ensureDocsFeed(s, d)
      val schema = s.read.parquet(feed).schema
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          if (!committedManifest(table).exists(_ >= id)) {
            commitDelta(table, shinglePostings(b.toDF()), id,
              foldAfter = foldAfter, retain = retain)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q291: the q214 nightly dedup probe served from the
    * STREAM-MAINTAINED shingle index — the stream cell for the
    * persisted-index families (the MV matrix's stream column applied to
    * a secondary index): the corpus arrived as 3 micro-batches, each
    * shingled exactly once into the committed store, and the probe
    * (batch shingles ⋈ stored postings on the 8-byte hash, stored
    * per-doc sizes as the Jaccard denominator) lands exactly where
    * q214's batch-built index lands — q214's oracle verbatim. The spec
    * pins store == batch index content, v1 == buckets-0+1 postings, and
    * the snapshot-only probe plan.
    */
  def streamMaintainedShingleProbe: Q = (s, d) => {
    val table = ensureShingleStreamIndex(s, d)
    shingleStoreProbe(s, d, manifestSnapshot(s, table)
      .getOrElse(sys.error("no committed shingle-index snapshot")),
      storeCoversBatch = true)
  }

  /** q297: TIME-TRAVEL probe of the manifest store — the q245 read
    * contract for manifest commits, registered rather than spec-only:
    * the retained PREDECESSOR manifest (v1 = buckets 0+1) resolves to a
    * complete, consistent index prefix — every doc is shingled whole
    * within its own batch, so per-doc posting sets and sizes are exact
    * for every doc the prefix has seen — and the nightly probe against
    * it answers "what would the previous commit have said": exactly the
    * pair set over the first two buckets' corpus. Retention keeps the
    * predecessor's member dirs alive until the next commit, so the read
    * needs no locks — immutable dirs + an immutable manifest ARE the
    * consistency mechanism. Exact oracle: q214's, filtered to both pair
    * sides outside the unseen bucket 2.
    */
  def timeTravelStreamShingleProbe: Q = (s, d) => {
    val table = ensureShingleStreamIndex(s, d)
    val cur = committedManifest(table)
      .getOrElse(sys.error("no committed shingle-index snapshot"))
    val pred = retainedPredecessor(table, cur)
      .getOrElse(sys.error("no predecessor manifest retained"))
    // the prefix STILL covers the batch: the probe batch is bucket 0
    // (doc_id % 3 === 0) and every retained prefix contains bucket 0,
    // so the orientation-filter fast path stays sound here
    shingleStoreProbe(s, d, manifestSnapshotAt(s, table, pred),
      storeCoversBatch = true)
  }

  /** q295: the q214 probe served from the FOLDED stream shingle store —
    * proof the LSM absorb step inside [[commitDelta]] preserves index
    * semantics: identical batch, identical pair set, q214's oracle
    * verbatim (same as q291's), but the store side is ONE base dir —
    * the manifest folded at batch 2, so no multi-member union remains
    * in the read. StreamingSpec pins the manifest shape ([base-v2]
    * only), bit-equality of the folded store with q291's multi-delta
    * resolve, and the single-member read plan.
    */
  def foldedStreamShingleProbe: Q = (s, d) => {
    val table = ensureFoldedShingleStreamIndex(s, d)
    shingleStoreProbe(s, d, manifestSnapshot(s, table)
      .getOrElse(sys.error("no committed shingle-index snapshot")),
      storeCoversBatch = true)
  }

  /** The shared q291/q295/q297 probe: batch shingles against a resolved
    * stream-store snapshot (CURRENT or a retained predecessor), q214's
    * plan shape.
    */
  /** `carriedSizes = true` (r18) switches to the carried-sizes probe
    * ([[graft.dedup.DedupQueries.ingestProbePairsCarried]]): the store
    * is resolved ONCE (n rides the posting rows through the h-join)
    * instead of twice (postings + a sizes distinct that re-runs the
    * whole member resolve). Only worth it when the resolve is
    * expensive — delete-segment anti-joins (q324) — and implies
    * coverage; plain member-union stores (q291/q295/q299/q323, the
    * travel prefixes) measured FASTER on the sizes-distinct form
    * (q299: 1.30 vs 1.71 warm), so they keep it.
    */
  private[graft] def shingleStoreProbe(s: SparkSession, d: String,
      store: DataFrame, storeCoversBatch: Boolean = false,
      carriedSizes: Boolean = false): DataFrame = {
    val batchSh = graft.dedup.DedupQueries.shingles(
        Tables.documents(s, d).where(col("doc_id") % 3 === 0))
      .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h"))
    if (carriedSizes)
      graft.dedup.DedupQueries.ingestProbePairsCarried(batchSh,
        store.select(col("doc_id").as("oid"), col("h"), col("n")))
    else
      graft.dedup.DedupQueries.ingestProbePairs(batchSh,
        store.select(col("doc_id").as("oid"), col("h")),
        store.select(col("doc_id"), col("n")).distinct(),
        storeCoversBatch = storeCoversBatch)
  }

  /** q293: ERASURE on the stream-maintained shingle store — the erase
    * cell the STREAM member of the shingle family was missing (the
    * batch index got it in q264; until now a forget-set on the
    * streaming index forced a rebuild): the aggregate-sized tombstone
    * list (q264's exact forget set, shared by construction) broadcasts
    * into LEFT ANTI joins on the store's postings AND sizes, and the
    * nightly probe runs against the overlaid index. The store is never
    * rewritten — erasure costs O(|tombstones|) at plan time — and no
    * erased text is ever re-read: the batch side prunes erased docs at
    * the documents scan, the store side is index files only. The
    * output lands exactly on q264's (the surviving-corpus recompute
    * oracle) because the stream store carries the batch index's
    * content, which StreamingSpec pins.
    */
  def erasedStreamShingleProbe: Q = (s, d) => {
    val table = ensureShingleStreamIndex(s, d)
    val store = manifestSnapshot(s, table)
      .getOrElse(sys.error("no committed shingle-index snapshot"))
    val tomb = broadcast(graft.dedup.DedupQueries.erasureTombstones(s, d))
    val surviving = store.join(tomb, Seq("doc_id"), "left_anti")
    // carried sizes (r18): the tombstone-overlaid resolve runs once,
    // not twice — measured 1.30 → 0.95 s warm at sf0.1
    graft.dedup.DedupQueries.ingestProbePairsCarried(
      graft.dedup.DedupQueries.survivingBatchShingles(s, d),
      surviving.select(col("doc_id").as("oid"), col("h"), col("n")))
  }

  /** q298: INCREMENTAL READ (changelog) of the manifest store — what a
    * downstream consumer that already processed the predecessor commit
    * reads to catch up to CURRENT: exactly the delta dirs the newer
    * manifest lists beyond the older one ([[manifestChanges]]), here
    * batch 2's postings and nothing else. This is the consumption half
    * of the append-commit protocol (commit writes O(batch); tailing
    * reads O(changes)) — without it every dependent artifact (a
    * training shard, a derived index) would rescan the store per
    * commit. Reported per changed doc: its distinct-shingle count (the
    * denormalized `n` is one value per doc, so count(rows) == n — the
    * spec pins that, and the DuckDB oracle recomputes the same counts
    * from the changed docs' text). StreamingSpec additionally pins the
    * PLAN: the changelog's input files all live under delta-v2 — the
    * base deltas are never opened — and the fold-crossing refusal.
    */
  def streamStoreChanges: Q = (s, d) => {
    val table = ensureShingleStreamIndex(s, d)
    val cur = committedManifest(table)
      .getOrElse(sys.error("no committed shingle-index snapshot"))
    val pred = retainedPredecessor(table, cur)
      .getOrElse(sys.error("no predecessor manifest retained"))
    manifestChanges(s, table, pred, cur)
      .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
  }

  /** q302: CHANGELOG of the UPSERT manifest store — q298's incremental
    * read on the session store, where a delta is not an append but a
    * PER-KEY REPLACEMENT: the newest member containing a user carries
    * that user's complete session set, so the delta dirs beyond the
    * consumer's last-seen manifest are exactly the POST-IMAGES of every
    * changed key (what a production change-data-feed serves). A
    * consumer holding the predecessor's sessions applies the changelog
    * by replacing those users wholesale — no diffing, no rescan,
    * O(changed users' sessions). Here the change set between v1 and
    * CURRENT is batch 2's touched users (everyone with an event at or
    * after the second epoch cut), which the oracle states
    * independently: a full-history re-sessionization restricted to
    * users having an epoch-3 event. The sid rank is minted over the
    * changelog itself — replacement images are complete per user, so
    * ranks match the store's.
    */
  def sessionStoreChangelog: Q = (s, d) => {
    val table = ensureSessionStreamSnapshot(s, d)
    val cur = committedManifest(table)
      .getOrElse(sys.error("no committed session snapshot"))
    val pred = retainedPredecessor(table, cur)
      .getOrElse(sys.error("no predecessor manifest retained"))
    val changed = manifestChanges(s, table, pred, cur)
    val w = Window.partitionBy("user_id").orderBy("s_us")
    changed.withColumn("sid", row_number().over(w).cast("long"))
      .select(col("user_id"), col("sid"), col("n_events"),
        col("s_us"), col("e_us"), (col("e_us") - col("s_us")).as("dur_us"))
  }

  /** The q299 store: TWO writers ingest CONCURRENTLY into one shingle
    * store under the contended commit protocol ([[commitContended]] —
    * Delta-log-style put-if-absent on the next numbered manifest). The
    * interleave is deterministic by construction: both writers capture
    * their read snapshot at version 0, writer A publishes first and
    * wins manifest-v1, writer B's attempt at v1 collides (a REAL
    * `link(2)` EEXIST, not a simulated flag), rebases onto A's members,
    * and lands manifest-v2. The recorded collision counts (`RACE` file)
    * let the spec pin that the race actually happened — A committed
    * clean, B retried exactly once — and that A's published manifest
    * was never rewritten by B's rebase.
    */
  private val contendedLock = new Object

  def ensureContendedShingleIndex(s: SparkSession, d: String): java.nio.file.Path =
    contendedLock.synchronized {
      import java.nio.file.{Files, Paths}
      val root = Paths.get(
        s"${graft.Tables.scratchDir}/graft-shingle-contended-${graft.Tables.datasetTag(d, "documents")}")
      if (!Files.exists(root.resolve("DONE"))) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val docs = Tables.documents(s, d).select("doc_id", "text")
        def bucket(i: Int) =
          shinglePostings(docs.where(pmod(col("doc_id"), lit(3)) === i))
        // bootstrap commit: the table exists before the race
        bucket(0).write.mode("overwrite")
          .parquet(table.resolve("delta-c0").toString)
        val (v0, a0) = commitContended(table, "delta-c0", None, Nil)
        // both writers open their transaction against v0...
        val readV = committedManifest(table)
        val readM = readV.map(manifestMembers(table, _)).getOrElse(Nil)
        bucket(1).write.mode("overwrite")
          .parquet(table.resolve("delta-cA").toString)
        bucket(2).write.mode("overwrite")
          .parquet(table.resolve("delta-cB").toString)
        // ...A publishes first (wins v1); B holds the now-stale snapshot,
        // collides at v1, rebases, lands v2
        val (vA, aA) = commitContended(table, "delta-cA", readV, readM)
        val (vB, aB) = commitContended(table, "delta-cB", readV, readM)
        Files.write(root.resolve("RACE"),
          s"c0=$v0:$a0;A=$vA:$aA;B=$vB:$aB".getBytes("UTF-8"))
        Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
      }
      root.resolve("table")
    }

  /** q299: the nightly probe served from the CONTENDED store — after
    * the two-writer race resolves, the highest manifest must denote the
    * complete corpus index (all three buckets, each committed exactly
    * once, B's rebase having lost nothing), so the probe lands exactly
    * where q291's single-writer store and q214's batch index land:
    * q214's oracle verbatim.
    */
  def contendedCommitProbe: Q = (s, d) => {
    val table = ensureContendedShingleIndex(s, d)
    shingleStoreProbe(s, d, manifestSnapshot(s, table)
      .getOrElse(sys.error("no committed contended snapshot")),
      storeCoversBatch = true)
  }

  /** The q300 store: benchmark DECONTAMINATION AT INGEST — the hygiene
    * filters run where the data lands, not as an after-the-fact sweep
    * over the landed corpus (which at 100 TB re-reads everything ever
    * ingested). The benchmark gram set is static and external (eval
    * suites are fixed artifacts), materialized ONCE next to the store;
    * each micro-batch computes its own docs' 4-grams — within-doc
    * compute, so per-batch flagging is exact — broadcast-joins the
    * benchmark set, and commits the batch's verdicts as an append delta
    * behind the manifest protocol. History text is never re-read; the
    * per-batch write is the batch's flagged docs only.
    */
  private val decontamStreamLock = new Object

  def ensureDecontamStream(s: SparkSession, d: String): java.nio.file.Path =
    decontamStreamLock.synchronized {
      import java.nio.file.{Files, Paths}
      val root = Paths.get(
        s"${graft.Tables.scratchDir}/graft-decontam-stream-${graft.Tables.datasetTag(d, "documents")}")
      if (!Files.exists(root.resolve("DONE"))) {
        if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = ensureDocsFeed(s, d)
        // the static benchmark gram set, built once before the stream
        graft.text.TextQueries.fourGrams(
            graft.Tables.fanOut(Tables.documents(s, d), col("doc_id"))
              .where(col("doc_id") % 97 === 0))
          .select("gram").distinct()
          .write.mode("overwrite").parquet(root.resolve("benchset").toString)
        val bench = s.read.parquet(root.resolve("benchset").toString)
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            if (!committedManifest(table).exists(_ >= id)) {
              val grams = graft.text.TextQueries.fourGrams(
                graft.Tables.fanOut(b.toDF(), col("doc_id")))
              commitDelta(table,
                graft.text.TextQueries.flagContaminated(grams, bench), id)
            }
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
      }
      root.resolve("table")
    }

  /** q300: the decontamination verdicts accumulated by the INGEST-TIME
    * stream — the streaming cell of the pipeline-hygiene family (q84 is
    * the batch sweep): because contamination is a within-doc property
    * against a static benchmark set, flagging each micro-batch
    * independently and appending the verdicts must land exactly on
    * q84's one-shot corpus sweep — q84's oracle verbatim.
    */
  def streamDecontaminate: Q = (s, d) => {
    val table = ensureDecontamStream(s, d)
    manifestSnapshot(s, table)
      .getOrElse(sys.error("no committed decontamination snapshot"))
      .select("doc_id", "n_contaminated_grams", "is_benchmark")
  }

  /** One-time staged EMBEDDINGS feed for the stream-maintained IVF
    * index: (vec_id, embedding) in 3 buckets by vec_id % 3 under the
    * fixed increasing-mtime contract — vectors arriving as a stream.
    */
  private val embFeedLock = new Object

  def ensureEmbeddingsFeed(s: SparkSession, d: String): String = embFeedLock.synchronized {
    val path =
      s"${graft.Tables.scratchDir}/graft-emb-feed-${graft.Tables.datasetTag(d, "embeddings")}"
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      if (dir.exists()) graft.Tables.deleteRecursively(dir)
      dir.mkdirs()
      val projected = Tables.embeddings(s, d).select("vec_id", "embedding")
      stageBuckets(dir, (0 until 3).map(i =>
        projected.where(pmod(col("vec_id"), lit(3)) === i)))
    }
    path
  }

  /** One-time, idempotent DURABLE replay of the embeddings feed into a
    * versioned IVF-ASSIGNMENT store — the ANN family's stream cell,
    * q291's pattern on the vector index: centroids come from the
    * persisted offline-trained index (read ONCE before the stream
    * starts — streaming ingest NEVER retrains, exactly how production
    * vector stores ingest), each micro-batch assigns its vectors to the
    * fixed centroids in one executor-side pass, and the (vec_id, cell)
    * assignments APPEND behind the manifest protocol — as the
    * `assigned` relation of a MULTI-RELATION commit whose sibling
    * `drift` relation carries the batch's additive drift contribution
    * (r17: the composed commit path, [[driftLoopCommit]]): history is
    * neither re-read nor re-written (buckets partition the vector
    * space, so the read-side resolve is a pure union), and the store's
    * own ingest maintains the retrain statistic q325 decides on.
    */
  private val ivfStreamLock = new Object

  def ensureIvfStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    ivfStreamLock.synchronized {
      ivfStreamReplay(s, d,
        s"graft-ivf-stream-idx2-${graft.Tables.datasetTag(d, "embeddings")}",
        foldAfter = 8)
    }

  /** The q304 store: the IVF assignment replay with `foldAfter = 2` —
    * q295's LSM absorb step on the SECOND data-sized append store:
    * batch 2's commit crosses the threshold and folds the three
    * assignment deltas into one fresh base before the manifest flip.
    * Kept separate from q292's store so the multi-member read path
    * stays exercised there.
    */
  private val foldedIvfStreamLock = new Object

  def ensureFoldedIvfStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    foldedIvfStreamLock.synchronized {
      ivfStreamReplay(s, d,
        s"graft-ivf-stream-fold-${graft.Tables.datasetTag(d, "embeddings")}",
        foldAfter = 2)
    }

  /** Shared replay body of the IVF stream stores — COMPOSED (r17, the
    * r16 verdict's #6): every replica's micro-batch commits
    * {assignments, drift contribution} behind ONE multi-relation flip
    * ([[driftLoopCommit]]) and the replay ends with the accumulated-
    * drift MAINTENANCE step ([[driftLoopMaintain]]: sum the drift
    * relation — 64 dims × #batches rows, never the corpus — and commit
    * the serving pointer), so ONE store family carries
    * {ingest, erase (q296), fold (q304), erasure fold (q312),
    * drift-retrain (q325)} together instead of the drift loop living
    * on its own replica. The lifecycle cells now compose: the erase
    * overlay and the fold operate on the same store whose commit path
    * maintains the retrain statistic.
    */
  private[graft] def ivfStreamReplay(s: SparkSession, d: String, dirName: String,
      foldAfter: Int): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"${graft.Tables.scratchDir}/$dirName")
    if (!Files.exists(root.resolve("DONE"))) {
      if (Files.exists(root)) graft.Tables.deleteRecursively(root.toFile)
      val table = root.resolve("table")
      Files.createDirectories(table)
      val feed = ensureEmbeddingsFeed(s, d)
      val cs = graft.sim.SimQueries.storedCentroidsOf(s,
        graft.sim.SimQueries.ensureIvfIndex(s, d))
      val schema = s.read.parquet(feed).schema
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          driftLoopCommit(table, b.toDF(), id, cs, foldAfter = foldAfter)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      driftLoopMaintain(s, root, Tables.embeddings(s, d)): Unit
      Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
    }
    root.resolve("table")
  }

  /** q292: the IVF probe served from the STREAM-MAINTAINED assignment
    * store — the ANN index maintained per micro-batch at fixed
    * centroids, probed by the standard anchored query set with exact
    * cosine rerank. Registered as the audited form (graded against the
    * full-corpus brute top-5); SimSpec pins store == a one-shot
    * assignment of the full corpus, v1 == buckets-0+1, and the recall
    * floor at nprobe 10.
    */
  def streamMaintainedIvfProbe: Q = (s, d) => {
    val table = ensureIvfStreamIndex(s, d)
    val store = manifestSnapshotRel(s, table, "assigned")
      .getOrElse(sys.error("no committed IVF assignment relation"))
    graft.sim.SimQueries.ivfProbeFromStore(s, d, store)
  }

  /** Driver-audited form of [[streamMaintainedIvfProbe]]. */
  def streamMaintainedIvfChecked: Q = (s, d) =>
    graft.sim.SimQueries.streamIvfChecked(streamMaintainedIvfProbe(s, d), s, d)

  /** q304: the q292 probe served from the FOLDED stream IVF store —
    * the fold cell for the assignment index (q295's proof on the other
    * data-sized append store): identical anchored queries, identical
    * audit, but the store side is ONE folded base dir. StreamingSpec
    * pins the manifest shape ([base-v2] only) and bit-equality of the
    * folded store with q292's multi-delta resolve.
    */
  def foldedStreamIvfProbe: Q = (s, d) => {
    val table = ensureFoldedIvfStreamIndex(s, d)
    val store = manifestSnapshotRel(s, table, "assigned")
      .getOrElse(sys.error("no committed IVF assignment relation"))
    graft.sim.SimQueries.ivfProbeFromStore(s, d, store)
  }

  /** Driver-audited form of [[foldedStreamIvfProbe]]. */
  def foldedStreamIvfChecked: Q = (s, d) =>
    graft.sim.SimQueries.streamIvfChecked(foldedStreamIvfProbe(s, d), s, d)

  /** q296: ERASURE on the stream-maintained IVF store — the erase cell
    * that completes the stream stores' symmetry (sessions q290,
    * shingles q293, vectors here): q279's forget set broadcasts into a
    * LEFT ANTI overlay on the manifest-resolved assignment store, the
    * surviving anchored queries probe at the fixed stored centroids
    * (erasure never retrains), and the store is never rewritten —
    * O(|tombstones|) at plan time. Registered as the audited form:
    * graded against the surviving-corpus brute top-5 restricted to the
    * surviving anchored queries.
    */
  def erasedStreamIvfProbe: Q = (s, d) => {
    val table = ensureIvfStreamIndex(s, d)
    val store = manifestSnapshotRel(s, table, "assigned")
      .getOrElse(sys.error("no committed IVF assignment relation"))
    graft.sim.SimQueries.ivfErasedProbeFromStore(s, d, store)
  }

  /** Driver-audited form of [[erasedStreamIvfProbe]]. */
  def erasedStreamIvfChecked: Q = (s, d) =>
    graft.sim.SimQueries.streamIvfErasedChecked(erasedStreamIvfProbe(s, d), s, d)

  /** The q325 store IS the shared q292 stream store (r17 — the r16
    * verdict's #6): its replay commits {assigned, drift} per batch and
    * its commit path ends in the drift maintenance, so the drift loop
    * no longer lives on a replica of its own — q292's ingest, q296's
    * erasure overlay, and q325's retrain decision all operate on ONE
    * store. This accessor returns the store ROOT (the table dir's
    * parent), where the DRIFT artifact and the serving-pointer
    * manifests live.
    */
  def ensureDriftLoopIvfStream(s: SparkSession, d: String): java.nio.file.Path =
    ensureIvfStreamIndex(s, d).getParent

  /** One micro-batch of the drift loop: assignments + the batch's drift
    * contribution (per-dim quantized integer sums,
    * [[graft.sim.SimQueries.driftContrib]] — associative, so the
    * accumulated artifact equals the one-shot measurement EXACTLY),
    * ONE atomic multi-relation commit — assignments can never advance
    * without their stats rows, so a torn artifact can never feed a
    * retrain decision. q316 measures drift once at build time;
    * production re-measures per ingest (the r15 verdict's item 3), and
    * every IVF stream replica now does: this IS their commit path.
    * StreamingSpec drives this same entry with a constructed drifted
    * feed.
    */
  private[graft] def driftLoopCommit(table: java.nio.file.Path,
      batch: DataFrame, id: Long, cs: Array[Array[Double]],
      foldAfter: Int = 8): Unit =
    if (!committedManifest(table).exists(_ >= id)) {
      commitDeltaMulti(table, Map(
        "assigned" -> graft.sim.SimQueries.assignToCells(batch, cs),
        "drift" -> graft.sim.SimQueries.driftContrib(batch)), id,
        foldAfter = foldAfter)
    }

  /** The drift loop's MAINTENANCE step: sum the committed drift
    * relation (64 dims × #batches rows — never the corpus), persist
    * the accumulated scalar as the DRIFT artifact, and commit the
    * serving pointer through the put-if-absent pointer store:
    * `stream` (serve the stream store at the fixed codebook) under
    * the threshold, or a freshly trained `v2` over it (q294's offline
    * body). Returns the accumulated drift.
    */
  private[graft] def driftLoopMaintain(s: SparkSession,
      root: java.nio.file.Path, corpus: DataFrame): Long = {
    val acc = manifestSnapshotRel(s, root.resolve("table"), "drift")
      .getOrElse(sys.error("no committed drift relation"))
    val drift = graft.sim.SimQueries.driftPpmFromContribs(acc)
    graft.Tables.atomicWrite(root, "DRIFT", drift.toString)
    if (drift >= graft.sim.SimQueries.DriftRetrainThresholdPpm) {
      graft.sim.SimQueries.trainAndWriteVersion(s,
        root.resolve("v2").toString, corpus)
      commitPointer(root, "v2")
    } else commitPointer(root, "stream")
    drift
  }

  /** q325: the anchored probe served through the drift loop's pointer —
    * whichever side the INGEST-MAINTAINED accumulated drift selected.
    * The shipped corpora sit under the threshold (the ingested third is
    * same-distribution, so accumulated drift == q316's measured noise,
    * exactly), so this serves the stream store at the fixed codebook;
    * StreamingSpec drives a drifted 3-batch feed through the SAME
    * commit + maintenance entries and pins the retrain branch
    * (accumulated == one-shot measurement bit-for-bit, pointer on v2,
    * v2-only probe plan). Registered as the audited form.
    */
  def driftLoopStreamIvfProbe: Q = (s, d) => {
    val root = ensureDriftLoopIvfStream(s, d)
    pointerCurrent(root) match {
      case Some("stream") =>
        val store = manifestSnapshotRel(s, root.resolve("table"), "assigned")
          .getOrElse(sys.error("no committed IVF assignment relation"))
        graft.sim.SimQueries.ivfProbeFromStore(s, d, store)
      case Some(v) =>
        graft.sim.SimQueries.ivfProbeFromVersionDir(s, d,
          root.resolve(v).toString)
      case None => sys.error("no committed serving pointer")
    }
  }

  /** Driver-audited form of [[driftLoopStreamIvfProbe]]. */
  def driftLoopStreamIvfChecked: Q = (s, d) =>
    graft.sim.SimQueries.streamIvfChecked(driftLoopStreamIvfProbe(s, d), s, d)

  def upsertReplay: Q = (s, d) => {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory(
      Paths.get(graft.Tables.scratchDir), "graft-upsert-")
    try {
      val src = ensureUpsertSource(s, d)
      val schema = s.read.parquet(src).schema
      val table = base.resolve("table")
      Files.createDirectories(table)
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          mergeIntoSnapshot(s, table, b.toDF(), id)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      currentSnapshot(s, table).get.localCheckpoint(true)
    } finally graft.Tables.deleteRecursively(base.toFile)
  }

  /** Batch-oracle forms of the remaining stream transforms — the same
    * watermark + dropDuplicates / interval-join shapes StreamingSpec
    * replays as streams (watermarks are no-ops in batch), so the oracle
    * gate covers the streaming operators' semantics, not just their
    * windowed-agg siblings. The dedup aggregates AFTER deduplication:
    * which duplicate survives is engine-dependent, but the count of
    * survivors per group is exact.
    */
  def dedupBatch: Q = (s, d) =>
    Tables.events(s, d)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))

  def intervalJoinBatch: Q = (s, d) => purchaseSignupJoin(Tables.events(s, d))

  /** `dropDuplicatesWithinWatermark` — streaming dedup with BOUNDED
    * state, the operator q68's plain `dropDuplicates` cannot be at
    * 100 TB/day: plain streaming dedup keeps state for every key ever
    * seen, while within-watermark dedup expires a key's state once the
    * watermark passes it, trading "exactly once ever" for "exactly once
    * within the dedup horizon" — the contract at-least-once sources
    * (producer retries, client re-sends) actually need, with state
    * proportional to the horizon instead of all of history.
    *
    * The operator refuses batch execution outright, so the oracle gate
    * replays it as a REAL stream (q71's harness shape: foreachBatch →
    * parquet, no driver collect). The staged source is one file, so
    * `AvailableNow` runs ONE micro-batch; the watermark is 0 throughout
    * a first batch, no state expires mid-batch, and the replay equals
    * exact dedup — deterministically, independent of event spacing.
    * The multi-batch semantics (in-horizon duplicate dropped,
    * post-expiry re-send surviving) are pinned in StreamingSpec where
    * the batch boundaries are controlled.
    */
  def dedupWithinWatermarkReplay: Q = (s, d) => {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-ddww-")
    try {
    val (sink, ckpt) = (base.resolve("sink").toString, base.resolve("ckpt").toString)
    val q = readEventsStream(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(sink): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .localCheckpoint(true) // sever lineage so the temp sink can go
    } finally graft.Tables.deleteRecursively(base.toFile)
  }

  /** LEFT OUTER stream-stream interval join — q69's shape with outer
    * semantics: every purchase emits, signup columns null when no
    * signup landed in the preceding 2 hours. In streaming this is a
    * genuinely different operator regime from the inner join: the null
    * rows can only be emitted once the watermark passes the join range
    * (the row is provably unmatched), so results trail the watermark —
    * StreamingSpec replays this transform as a stream and checks both
    * the matched and the late-emitted null rows against this batch
    * form. State stays bounded by the same two watermarks as q69.
    */
  def purchaseSignupLeftOuter(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"),
        "left_outer")
      .select(col("p_id"), col("user_id"), col("p_ts"), col("s_ts"))
  }

  def intervalJoinOuterBatch: Q = (s, d) =>
    purchaseSignupLeftOuter(Tables.events(s, d))

  /** FULL OUTER stream-stream interval join — completes q69/q127's join
    * triple: matched pairs emit eagerly; a purchase with no in-range
    * signup emits null signup columns once the watermark proves none
    * can arrive; a signup whose 2-hour forward window closes with no
    * purchase emits null purchase columns the same way. Both unmatched
    * directions are watermark-gated, so state stays bounded on both
    * sides — the regime a reconciliation pipeline (every record from
    * EITHER feed must surface) runs in.
    */
  def purchaseSignupFullOuter(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"),
        "full_outer")
      .select(col("p_id"), col("user_id"), col("p_ts"), col("s_user"), col("s_ts"))
  }

  def intervalJoinFullOuterBatch: Q = (s, d) =>
    purchaseSignupFullOuter(Tables.events(s, d))

  /** LEFT SEMI stream-stream interval join — q69's predicate as a
    * FILTER: a purchase emits (once, with no signup columns) iff a
    * same-user signup landed in its 2-hour lookback. Completes the
    * inner/left/full/semi join matrix. Same bounded two-watermark state
    * as q69, but multiple matching signups never duplicate the purchase
    * — the "qualified events only" feed an activation pipeline
    * consumes without a downstream dedup.
    */
  def purchaseSignupSemi(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"),
        "left_semi")
      .select(col("p_id"), col("user_id"), col("p_ts"))
  }

  def intervalJoinSemiBatch: Q = (s, d) =>
    purchaseSignupSemi(Tables.events(s, d))

  /** Stand-in for the session-store erasure request queue: the q290
    * forget-set shape (user_id % 13 == 0) as an aggregate-sized id
    * list, shared by the overlay probe (q290) and the erasure FOLD
    * (q311) so both provably apply the same forget set.
    */
  private[graft] def sessionTombstones(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("user_id") % 13 === 0).select(col("user_id")).distinct()

  val queries: Map[String, Q] = Map(
    "q157_interval_join_semi" -> intervalJoinSemiBatch,
    "q25_session_window" -> sessionsBatch,
    "q26_sliding_window" -> slidingBatch,
    "q68_stream_dedup" -> dedupBatch,
    "q69_interval_join" -> intervalJoinBatch,
    "q127_interval_join_outer" -> intervalJoinOuterBatch,
    "q133_dedup_within_watermark" -> dedupWithinWatermarkReplay,
    "q140_interval_join_full" -> intervalJoinFullOuterBatch,
    "q71_stateful_totals" -> statefulTotalsReplay,
    "q233_stream_upsert" -> upsertReplay,
    "q244_stream_mv" -> streamMaintainedMv,
    "q261_stream_join_mv" -> streamMaintainedJoinMv,
    "q266_stream_chain_mv" -> streamMaintainedChainMv,
    "q268_stream_cdc_delete_mv" -> streamCdcDeleteMv,
    "q286_stream_sessions_incremental" -> streamIncrementalSessions,
    "q288_stream_snowflake_mv" -> streamMaintainedSnowflakeMv,
    "q289_stream_composite_mv" -> streamMaintainedCompositeMv,
    "q290_erased_stream_sessions" -> erasedStreamSessions,
    "q291_stream_shingle_index" -> streamMaintainedShingleProbe,
    "q292_stream_ivf_index" -> streamMaintainedIvfChecked,
    "q293_erased_stream_shingle" -> erasedStreamShingleProbe,
    "q295_folded_stream_shingle" -> foldedStreamShingleProbe,
    "q296_erased_stream_ivf" -> erasedStreamIvfChecked,
    "q297_time_travel_stream_shingle" -> timeTravelStreamShingleProbe,
    "q298_stream_store_changes" -> streamStoreChanges,
    "q299_contended_commit" -> contendedCommitProbe,
    "q300_stream_decontaminate" -> streamDecontaminate,
    "q302_session_store_changelog" -> sessionStoreChangelog,
    "q304_folded_stream_ivf" -> foldedStreamIvfChecked,
    "q308_folded_stream_sessions" -> foldedStreamSessions,
    "q325_drift_loop_stream_ivf" -> driftLoopStreamIvfChecked,
    "q245_snapshot_time_travel" -> snapshotTimeTravel,
    "q89_stateful_totals_tws" -> statefulTotalsTwsReplay,
    "q101_join_then_window" -> joinThenWindowBatch,
    "q113_stream_static_enrich" -> enrichBatch)

  // final flatMapGroupsWithState / transformWithState state after a full
  // replay == batch agg (q71 and q89 must agree with it AND each other)
  private val totalsOracle =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |    AS total_value
      |FROM events GROUP BY user_id""".stripMargin

  /** The one-shot all-history sessionization — q286's oracle, shared
    * with q308 (the folded store serves the identical snapshot).
    */
  private val sessionStoreOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
      |x AS (
      |  SELECT user_id, t_us, event_id,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w >= 21600000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      |b AS (
      |  SELECT user_id, t_us,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM x)
      |SELECT user_id, sid, count(*) AS n_events,
      |  min(t_us) AS s_us, max(t_us) AS e_us,
      |  max(t_us) - min(t_us) AS dur_us
      |FROM b GROUP BY 1, 2""".stripMargin

  /** q290's oracle — a one-shot sessionization of the SURVIVING users'
    * events; shared verbatim by q311 (the erasure-folded store serves
    * the identical answer with the overlay folded away).
    */
  private[graft] val erasedSessionOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
      |  WHERE user_id % 13 <> 0),
      |x AS (
      |  SELECT user_id, t_us, event_id,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w >= 21600000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      |b AS (
      |  SELECT user_id, t_us,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM x)
      |SELECT user_id, sid, count(*) AS n_events,
      |  min(t_us) AS s_us, max(t_us) AS e_us,
      |  max(t_us) - min(t_us) AS dur_us
      |FROM b GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    // the stream-maintained session store must land exactly on a
    // one-shot sessionization of ALL history under session_window's
    // boundary semantics (break at gap >= 6h — Spark merges an event
    // while ts < last + gap); sid = rank by session start (post-fusion
    // sessions are >= gap apart, so rank == the running-break sum)
    "q286_stream_sessions_incremental" -> sessionStoreOracle,
    // ANN-audit oracle (the q54/q277 pattern): DuckDB recomputes the
    // exact anchored query-set size, recall boolean asserted TRUE —
    // the Spark side computes it for real against knnBrute
    "q292_stream_ivf_index" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // the drift-loop store serves the same anchored query set through
    // whichever branch the accumulated artifact selected — same audit
    // shape as q292 (the shipped corpora take the no-retrain branch)
    "q325_drift_loop_stream_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // the probe from the stream-maintained index must land exactly
    // where q214's batch-built index lands: q214's oracle VERBATIM
    "q291_stream_shingle_index" ->
      graft.dedup.DedupQueries.oracles("q214_incremental_dedup"),
    // erasure on the stream store must land exactly where q264's
    // batch-index overlay lands: the surviving-corpus recompute oracle
    // VERBATIM (the stream store carries the batch index's content)
    "q293_erased_stream_shingle" ->
      graft.dedup.DedupQueries.oracles("q264_erasure_dedup_index"),
    // the folded store serves the identical probe: q214's oracle again
    "q295_folded_stream_shingle" ->
      graft.dedup.DedupQueries.oracles("q214_incremental_dedup"),
    // erasure on the stream IVF store: same audit shape as q279, on the
    // full-corpus anchored query set (surviving members only)
    "q296_erased_stream_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings
        |WHERE vec_id % 100 = 0 AND vec_id % 7 <> 1
        |  AND vec_id < 100000""".stripMargin,
    // the changelog between the retained predecessor and CURRENT is
    // batch 2's postings and nothing else: DuckDB recomputes the
    // changed docs' (doc_id % 3 = 2) distinct-shingle counts from text
    "q298_stream_store_changes" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') ws FROM documents
        |  WHERE doc_id % 3 = 2),
        |sh AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM words WHERE len(ws) >= 3),
        |dsh AS (SELECT DISTINCT doc_id, s FROM sh)
        |SELECT doc_id, count(*) AS n_shingles FROM dsh GROUP BY 1""".stripMargin,
    // after the two-writer race resolves, the contended store denotes
    // the complete corpus index: q214's oracle verbatim (q291's shape)
    "q299_contended_commit" ->
      graft.dedup.DedupQueries.oracles("q214_incremental_dedup"),
    // ingest-time flagging must land exactly on the one-shot corpus
    // sweep: q84's oracle verbatim
    "q300_stream_decontaminate" ->
      graft.text.TextQueries.oracles("q84_decontaminate"),
    // the folded session store serves the identical snapshot: q286's
    // gaps-and-islands oracle verbatim
    "q308_folded_stream_sessions" -> sessionStoreOracle,
    // the folded assignment store serves the identical audited probe:
    // q292's oracle shape (full-corpus anchored query set)
    "q304_folded_stream_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // the upsert changelog is the post-image of every key batch 2
    // replaced: full-history sessionization (q286's oracle body)
    // restricted to users with an event at or after the second epoch
    // cut (2024-01-21 UTC — the staged feed's c2)
    "q302_session_store_changelog" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
        |  WHERE user_id IN (
        |    SELECT DISTINCT user_id FROM events
        |    WHERE epoch_us(ts) >= $SessionFeedCut2Us)),
        |x AS (
        |  SELECT user_id, t_us, event_id,
        |    CASE WHEN lag(t_us) OVER w IS NULL
        |           OR t_us - lag(t_us) OVER w >= 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |b AS (
        |  SELECT user_id, t_us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM x)
        |SELECT user_id, sid, count(*) AS n_events,
        |  min(t_us) AS s_us, max(t_us) AS e_us,
        |  max(t_us) - min(t_us) AS dur_us
        |FROM b GROUP BY 1, 2""".stripMargin,
    // the predecessor-manifest probe answers over the first two
    // buckets' corpus: q214's oracle with both pair sides outside the
    // unseen bucket 2
    "q297_time_travel_stream_shingle" ->
      s"""SELECT * FROM (
         |${graft.dedup.DedupQueries.oracles("q214_incremental_dedup")}
         |) WHERE a_id % 3 <> 2 AND b_id % 3 <> 2""".stripMargin,
    // session-store erasure must land exactly on a one-shot
    // sessionization of the SURVIVING users' events (q286's oracle
    // with the forget set removed at the scan)
    "q290_erased_stream_sessions" -> erasedSessionOracle,
    // the stream-maintained composite snapshot must equal the full
    // bridge-join recompute (the feed carries every lineitem row)
    "q289_stream_composite_mv" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    count(*) AS ps_cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(ps_cnt) AS BIGINT) AS sum_pscnt
        |FROM lineitem JOIN ps
        |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |GROUP BY 1, 2""".stripMargin,
    // the stream-maintained snowflake snapshot must equal the full
    // 3-way recompute (the feed carries every lineitem row)
    "q288_stream_snowflake_mv" ->
      """SELECT o_orderpriority, p_type, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    // the stream-maintained join summary must equal the full join
    // recompute (the feed carries every orders row; the rewritten plan
    // reads only the committed snapshot version)
    "q261_stream_join_mv" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    // the delete-bearing stream snapshot must equal the
    // surviving-corpus join recompute: inserts minus the op=-1
    // retraction batch == orders of non-forget-set customers
    "q268_stream_cdc_delete_mv" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_custkey % 13 <> 0
        |GROUP BY 1""".stripMargin,
    // the stream-maintained CHAIN summary must equal the full 3-way
    // recompute (the feed carries every lineitem row; the rewritten
    // plan reads only the committed snapshot version)
    "q266_stream_chain_mv" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(l_partkey) AS avg_part
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // the rewritten aggregate must equal the recompute from raw events
    // (the rewritten plan reads only the committed snapshot version)
    "q244_stream_mv" ->
      """WITH e AS (SELECT user_id,
        |    CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)
        |      AS cents
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY 1""".stripMargin,
    // the predecessor version == upsert state over batches 0 and 1 ==
    // events with event_id % 3 in (0, 1) (batch i is bucket i by the
    // staged files' fixed mtimes)
    "q245_snapshot_time_travel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type,
        |    CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)
        |      AS cents
        |  FROM events WHERE event_id % 3 IN (0, 1)),
        |l AS (SELECT user_id, t_us, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY t_us DESC, event_id DESC) AS rn
        |  FROM e),
        |a AS (SELECT user_id, count(*) AS n_events,
        |    CAST(sum(cents) AS BIGINT) AS total_cents
        |  FROM e GROUP BY 1)
        |SELECT a.user_id, l.t_us AS last_us, l.event_id AS last_id,
        |  l.event_type AS last_type, a.n_events, a.total_cents
        |FROM a JOIN l ON l.user_id = a.user_id AND l.rn = 1""".stripMargin,
    "q157_interval_join_semi" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts
        |FROM events p
        |WHERE p.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events s
        |  WHERE s.event_type = 'signup' AND s.user_id = p.user_id
        |    AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 2 HOUR)""".stripMargin,
    // gaps-and-islands: a session breaks when the gap is >= 30 minutes
    // (Spark merges an event only while ts < previous-event ts + gap);
    // session end = last ts + gap
    "q25_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM o)
        |SELECT min(ts) AS ws, max(ts) + INTERVAL 30 MINUTE AS we, user_id,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, grp""".stripMargin,
    // each event falls into the 4 sliding windows whose starts are the
    // 15-min buckets in (ts - 1h, ts]
    "q26_sliding_window" ->
      """SELECT ws, event_type, count(*) AS cnt
        |FROM (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '15 minutes', ts) - INTERVAL (k * 15) MINUTE AS ws,
        |    ts
        |  FROM events, (SELECT unnest(range(0, 4)) AS k))
        |WHERE ts >= ws AND ts < ws + INTERVAL 60 MINUTE
        |GROUP BY ws, event_type""".stripMargin,
    "q68_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    // batch form of within-watermark dedup IS exact dedup (watermarks
    // are no-ops in batch) — the bounded-state semantics are pinned by
    // StreamingSpec's replay
    "q133_dedup_within_watermark" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    // the engine's data model is microsecond timestamps (Tables.events
    // truncates the parquet nanos on load) — mirror that in the oracle so
    // both engines evaluate the interval bounds on identical values
    "q69_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             date_trunc('microseconds', ts) AS ts FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase'),
        |s AS (SELECT user_id AS s_user, ts AS s_ts
        |      FROM e WHERE event_type = 'signup')
        |SELECT p_id, user_id, p_ts, s_ts
        |FROM p JOIN s ON user_id = s_user
        |  AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 2 HOUR""".stripMargin,
    // q69 with outer semantics: unmatched purchases keep null signup
    "q127_interval_join_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             date_trunc('microseconds', ts) AS ts FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase'),
        |s AS (SELECT user_id AS s_user, ts AS s_ts
        |      FROM e WHERE event_type = 'signup')
        |SELECT p_id, user_id, p_ts, s_ts
        |FROM p LEFT JOIN s ON user_id = s_user
        |  AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 2 HOUR""".stripMargin,
    // q127 with FULL semantics: signups with no purchase in their
    // forward window surface too (null purchase columns)
    "q140_interval_join_full" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             date_trunc('microseconds', ts) AS ts FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase'),
        |s AS (SELECT user_id AS s_user, ts AS s_ts
        |      FROM e WHERE event_type = 'signup')
        |SELECT p_id, user_id, p_ts, s_user, s_ts
        |FROM p FULL OUTER JOIN s ON user_id = s_user
        |  AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 2 HOUR""".stripMargin,
    "q71_stateful_totals" -> totalsOracle,
    // the upsert snapshot == one-shot batch recompute: latest event by
    // the (t_us, event_id) total order + additive running aggregates
    "q233_stream_upsert" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type,
        |    CAST(COALESCE(CAST(value AS DECIMAL(18,2)), 0) * 100 AS BIGINT)
        |      AS cents
        |  FROM events),
        |l AS (SELECT user_id, t_us, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY t_us DESC, event_id DESC) AS rn
        |  FROM e),
        |a AS (SELECT user_id, count(*) AS n_events,
        |    CAST(sum(cents) AS BIGINT) AS total_cents
        |  FROM e GROUP BY 1)
        |SELECT a.user_id, l.t_us AS last_us, l.event_id AS last_id,
        |  l.event_type AS last_type, a.n_events, a.total_cents
        |FROM a JOIN l ON l.user_id = a.user_id AND l.rn = 1""".stripMargin,
    "q89_stateful_totals_tws" -> totalsOracle,
    // q69's join rolled up per epoch-aligned hour (Spark's 1h window
    // start == date_trunc('hour')); micros truncation as in q69
    "q101_join_then_window" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             date_trunc('microseconds', ts) AS ts FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase'),
        |s AS (SELECT user_id AS s_user, ts AS s_ts
        |      FROM e WHERE event_type = 'signup'),
        |j AS (SELECT p_ts, s_ts
        |      FROM p JOIN s ON user_id = s_user
        |        AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 2 HOUR)
        |SELECT date_trunc('hour', p_ts) AS ws, count(*) AS n_pairs,
        |  max(s_ts) AS last_signup
        |FROM j GROUP BY 1""".stripMargin,
    "q113_stream_static_enrich" ->
      """SELECT date_trunc('hour', ts) AS ws, c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin)
}
