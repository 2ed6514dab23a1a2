package graft.store

import graft.{SparkSpec, Tables}
import graft.streaming.Streams

/** Pins for the registered store-lifecycle queries (q310–q323) — moved
  * here with the queries when they left `streaming.Streams` (round 15).
  */
class StoreQueriesSpec extends SparkSpec {

  test("q310/q311/q312 erasure folds: bit-equal to overlay probes, purged bases, overlay-free plans") {
    import org.apache.spark.sql.functions._
    // ── shingles: folded probe == q293's overlay probe, store is ONE
    // purged base, no anti-join anywhere in the probe plan ──
    val r310 = StoreQueries.queries("q310_erasure_folded_shingle")(spark, sf)
    val got310 = r310.collect().map(_.toString).sorted.toSeq
    val got293 = Streams.queries("q293_erased_stream_shingle")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got310 === got293 && got310.nonEmpty)
    val ts = StoreQueries.ensureErasureFoldedShingleStreamIndex(spark, sf)
    val curS = ManifestStore.committedManifest(ts).get
    assert(ManifestStore.manifestMembers(ts, curS) === Seq(s"base-e$curS"))
    // zero tombstoned rows in the folded FILES, not just the read
    assert(spark.read.parquet(ts.resolve(s"base-e$curS").toString)
      .where(col("doc_id") % 7 === 1).count() === 0L,
      "erased docs' postings must be physically gone")
    assert(!r310.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "folded probe must plan no tombstone overlay")

    // ── sessions (upsert store): folded result == q290's overlay
    // result; the fold leaves ONE purged base, so the read also skips
    // the merge-on-read LWW window (single-member fast path) ──
    val r311 = StoreQueries.queries("q311_erasure_folded_sessions")(spark, sf)
    val got311 = r311.collect().map(_.toString).sorted.toSeq
    val got290 = Streams.queries("q290_erased_stream_sessions")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got311 === got290 && got311.nonEmpty)
    val tu = StoreQueries.ensureErasureFoldedSessionStore(spark, sf)
    val curU = ManifestStore.committedManifest(tu).get
    assert(ManifestStore.manifestMembers(tu, curU) === Seq(s"base-e$curU"))
    assert(spark.read.parquet(tu.resolve(s"base-e$curU").toString)
      .where(col("user_id") % 13 === 0).count() === 0L,
      "erased users' sessions must be physically gone")
    assert(!r311.queryExecution.executedPlan.toString.contains("LeftAnti"))
    // the only Window left is the read-time sid rank — the resolve
    // itself is a plain single-dir scan (no __mf_seq arbitration)
    assert(!r311.queryExecution.executedPlan.toString.contains("__mf_seq"),
      "folded upsert read must not plan the merge-on-read window")

    // ── vectors: the assigned relation folds to one purged base, the
    // drift relation's aggregate rows carry over unchanged (rel-scoped
    // erasure on the composed store), probe overlay-free, audit TRUE ──
    val ti = StoreQueries.ensureErasureFoldedIvfStreamIndex(spark, sf)
    val curI = ManifestStore.committedManifest(ti).get
    val membersI = ManifestStore.manifestMembers(ti, curI)
    assert(membersI.filter(_.startsWith("assigned:")) ===
      Seq(s"assigned:base-e$curI-assigned"), membersI.toString)
    assert(membersI.count(_.startsWith("drift:")) === 3,
      "the drift relation must survive the erasure flip unchanged: " + membersI)
    assert(spark.read.parquet(ti.resolve(s"base-e$curI-assigned").toString)
      .where(col("vec_id") % 7 === 1).count() === 0L,
      "erased vectors' assignments must be physically gone")
    val probe312 = StoreQueries.erasureFoldedStreamIvfProbe(spark, sf)
    assert(!probe312.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "folded IVF probe must plan no tombstone overlay")
    assert(StoreQueries.queries("q312_erasure_folded_ivf")(spark, sf)
      .collect().head.getBoolean(2), "audit recall bit is false")
  }

  test("q315 retention depth 3: full ledger on disk, depth-2 travel resolves bucket 0") {
    import org.apache.spark.sql.functions._
    val t = StoreQueries.ensureRetainedShingleStreamIndex(spark, sf)
    // keep-last-3 retained every manifest of the 3-batch replay
    (0L to 2L).foreach { v =>
      assert(java.nio.file.Files.exists(t.resolve(s"manifest-v$v")),
        s"manifest-v$v must be retained under retain=3") }
    assert(ManifestStore.committedManifest(t).contains(2L))
    // depth-2 travel: v0 = bucket 0 postings only, complete per doc
    val v0 = ManifestStore.manifestSnapshotAt(spark, t, 0L)
    val v0Docs = v0.select("doc_id").distinct()
      .collect().map(_.getLong(0))
    assert(v0Docs.nonEmpty && v0Docs.forall(_ % 3 == 0),
      "v0 must hold exactly the first bucket's docs")
    // and the registered probe answers non-trivially over it
    assert(StoreQueries.queries("q315_deep_time_travel_shingle")(spark, sf)
      .collect().nonEmpty)
  }

  test("q322 range-pruned scan: only the overlapping member opens, residual exact, empty window empty") {
    import org.apache.spark.sql.functions._
    val t = StoreQueries.ensureEventLogStore(spark, sf)
    val pruned = ManifestStore.manifestSnapshotRanged(spark, t,
      "t_us", Streams.SessionFeedCut1Us, Streams.SessionFeedCut2Us - 1).get
    // data skipping: the window intersects exactly batch 1's range
    val files = pruned.inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("delta-v1")), files.toString)
    // stats prune, the residual filters: equal to the full-scan answer
    val want = ManifestStore.manifestSnapshot(spark, t).get
      .where(col("t_us") >= Streams.SessionFeedCut1Us &&
        col("t_us") <= Streams.SessionFeedCut2Us - 1)
      .collect().map(_.toString).sorted.toSeq
    assert(pruned.collect().map(_.toString).sorted.toSeq === want)
    // a window beyond every member's range reads nothing and is empty
    assert(ManifestStore.manifestSnapshotRanged(spark, t,
      "t_us", Long.MaxValue - 10, Long.MaxValue).get.count() === 0L)
  }

  test("q323 WAP ledger: audit saw main at v1, publish fast-forwarded, branch gone, probe == q291") {
    val t = StoreQueries.ensureWapShingleIndex(spark, sf)
    val audit = new String(java.nio.file.Files.readAllBytes(
      t.getParent.resolve("AUDIT")), "UTF-8")
    assert(audit === "bad=0;main_during_stage=v1", audit)
    assert(ManifestStore.committedManifest(t).contains(2L))
    assert(ManifestStore.manifestMembers(t, 2L) ===
      Seq("delta-v0", "delta-v1", "delta-wap-v2"))
    assert(Option(t.toFile.listFiles()).toSeq.flatten
      .forall(!_.getName.startsWith("manifest-wap-")),
      "branch manifests must be dropped at publish")
    val got = StoreQueries.queries("q323_wap_publish")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q291 = Streams.queries("q291_stream_shingle_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q291 && got.nonEmpty)
  }

  test("q317 diff across rewrite: incremental refuses, fallback states exactly the erased rows") {
    import org.apache.spark.sql.functions._
    val res = StoreQueries.queries("q317_store_diff_rewrite")(spark, sf)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // nothing added by an erasure (the audit column rides every row)
    assert(rows.forall(_.getLong(5) === 0L), "erasure must add no rows")
    // the removed set is exactly the store complement: pre-fold store
    // (q286's answer) minus the surviving store (q290's answer)
    val all = Streams.queries("q286_stream_sessions_incremental")(spark, sf)
      .select("user_id", "sid", "n_events", "s_us", "e_us")
      .collect().map(_.toString).toSet
    val surviving = Streams.queries("q290_erased_stream_sessions")(spark, sf)
      .select("user_id", "sid", "n_events", "s_us", "e_us")
      .collect().map(_.toString).toSet
    val removed = res.select("user_id", "sid", "n_events", "s_us", "e_us")
      .collect().map(_.toString).toSet
    assert(removed === (all -- surviving),
      "diff must equal the pre-fold store minus the surviving store")
  }

  test("q318/q319/q320: delete-file probe == overlay probe, evolved travel, vacuum invariance") {
    import org.apache.spark.sql.functions._
    // q318: no tombstone logic in the probe, yet the answer equals the
    // overlay form's — the committed delete member does the work
    val got318 = StoreQueries.queries("q318_delete_file_commit")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got293 = Streams.queries("q293_erased_stream_shingle")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got318 === got293 && got318.nonEmpty)
    val td = StoreQueries.ensureDeleteFileShingleStreamIndex(spark, sf)
    assert(ManifestStore.manifestMembers(td,
      ManifestStore.committedManifest(td).get).last === "~del-v3")
    // erased docs' postings are STILL in the delta files (logical
    // delete — physical erasure is the fold's job, q310)
    assert(spark.read.parquet(td.resolve("delta-v1").toString)
      .where(col("doc_id") % 7 === 1).count() > 0L)
    // q319: the travelled pre-evolution read does not carry the column
    val te = StoreQueries.ensureEvolvedDocStatsStore(spark, sf)
    assert(ManifestStore.manifestSnapshotAt(spark, te, 1L).columns.toSeq ===
      Seq("doc_id", "n_words"))
    assert(StoreQueries.queries("q319_schema_evolution_store")(spark, sf)
      .columns.toSeq === Seq("doc_id", "n_words", "n_chars"))
    // q320: the planted orphan is gone, the committed deltas are not
    val tv = StoreQueries.ensureVacuumedDocStatsStore(spark, sf)
    assert(!java.nio.file.Files.exists(tv.resolve("delta-v99")))
    (0 to 2).foreach(i =>
      assert(java.nio.file.Files.exists(tv.resolve(s"delta-v$i"))))
  }

  test("q324 re-ingest after delete: ordered ledger, resolve == never-erased index, probe == q291") {
    import org.apache.spark.sql.functions._
    // the probe lands exactly where the never-erased stream index
    // lands: delete-then-identical-reinsert must be a round trip
    val r324 = StoreQueries.queries("q324_reinsert_after_delete")(spark, sf)
    val got324 = r324.collect().map(_.toString).sorted.toSeq
    val got291 = Streams.queries("q291_stream_shingle_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got324 === got291 && got324.nonEmpty,
      "the returning docs' probe must equal the never-erased probe")
    // the ledger: three replay deltas, THEN the delete, THEN the
    // re-ingest — the order the sequence scoping rides on
    val t = StoreQueries.ensureReinsertShingleStreamIndex(spark, sf)
    val members = ManifestStore.manifestMembers(t,
      ManifestStore.committedManifest(t).get)
    assert(members ===
      Seq("delta-v0", "delta-v1", "delta-v2", "~del-v3", "delta-v4"),
      members.toString)
    // the resolve serves the re-ingested docs' postings, bit-equal to
    // the never-erased store's resolve
    val snap = ManifestStore.manifestSnapshot(spark, t).get
    assert(snap.where(col("doc_id") % 7 === 1).count() > 0L,
      "re-ingested postings must serve through the delete member")
    val full = ManifestStore.manifestSnapshot(spark,
      Streams.ensureShingleStreamIndex(spark, sf)).get
    assert(snap.collect().map(_.toString).sorted.toSeq ===
      full.collect().map(_.toString).sorted.toSeq)
  }

  test("q326 ranged upsert read: only low-third members open, LWW serves the re-merge over the stale batch") {
    val r = StoreQueries.queries("q326_range_pruned_upsert")(spark, sf)
    val rows = r.collect().map(_.toString).sorted.toSeq
    assert(rows.nonEmpty)
    val files = r.inputFiles.toSeq
    assert(files.exists(_.contains("delta-v0")) &&
      files.exists(_.contains("delta-v3")),
      "both low-third members must open: " + files.toString)
    assert(files.forall(f => !f.contains("delta-v1") && !f.contains("delta-v2")),
      "out-of-range members must be pruned: " + files.toString)
    // LWW is observable: the stale batch-0 rows genuinely differ from
    // the batch-3 re-merge (low-third users have post-cut events), and
    // the served rows are batch 3's
    val t = StoreQueries.ensureUserRangeSessionStore(spark, sf)
    val v0 = spark.read.parquet(t.resolve("delta-v0").toString)
      .collect().map(_.toString).toSet
    val v3 = spark.read.parquet(t.resolve("delta-v3").toString)
      .collect().map(_.toString).toSet
    assert(v0 !== v3,
      "the re-merge must supersede genuinely stale rows for LWW to matter")
    val served = ManifestStore.manifestSnapshotRanged(spark, t, "user_id",
        0L, Long.MaxValue, upsertKey = Some("user_id")).get
      .select("user_id", "n_events", "s_us", "e_us")
      .collect().map(_.toString).toSet
    assert((v3 -- served).isEmpty, "every re-merged row must serve")
    assert(served.intersect(v0 -- v3).isEmpty, "stale rows leaked through LWW")
  }

  test("q327 rel-scoped pruning: ev opens delta-v1-ev only, day opens delta-v1-day only, rollup agrees") {
    import org.apache.spark.sql.functions._
    val t = StoreQueries.ensureMultiRelEventStore(spark, sf)
    val ev = ManifestStore.manifestSnapshotRelRanged(spark, t, "ev", "t_us",
      Streams.SessionFeedCut1Us, Streams.SessionFeedCut2Us - 1).get
    val fEv = ev.inputFiles.toSeq
    assert(fEv.nonEmpty && fEv.forall(_.contains("delta-v1-ev")),
      "ev relation must prune to the epoch-2 member: " + fEv.toString)
    val day = ManifestStore.manifestSnapshotRelRanged(spark, t, "day", "day_us",
      Streams.SessionFeedCut1Us, Streams.SessionFeedCut2Us - 86400000000L).get
    val fDay = day.inputFiles.toSeq
    assert(fDay.nonEmpty && fDay.forall(_.contains("delta-v1-day")),
      "day relation must prune to the epoch-2 member: " + fDay.toString)
    // the independent rollup relation re-derives the event count
    val r = StoreQueries.queries("q327_range_pruned_multirel")(spark, sf)
      .collect()(0)
    assert(r.getLong(0) === r.getLong(4),
      "day-rollup cross-check must equal the ev count (day-tiled window)")
  }

  test("q328 time retention ledger: two manifests expired, superseded deltas reclaimed, travel aged out") {
    val t = StoreQueries.ensureAgedDocStatsStore(spark, sf)
    val manifests = Option(t.toFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("manifest-v\\d+")).toSet
    assert(manifests === Set("manifest-v2"),
      s"age GC must leave only the newest manifest, got $manifests")
    // the fold-superseded deltas died with their manifests
    val deltas = Option(t.toFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("delta-v\\d+")).toSet
    assert(deltas === Set.empty[String], deltas.toString)
    assert(java.nio.file.Files.exists(t.resolve("base-v2")))
    // depth-1 travel is gone — aged out where q315's count-retained
    // store still serves it
    intercept[java.nio.file.NoSuchFileException] {
      ManifestStore.manifestSnapshotAt(spark, t, 1L)
    }
    // the current read is complete (the base carries everything)
    val n = StoreQueries.queries("q328_time_retention")(spark, sf).count()
    assert(n === graft.Tables.documents(spark, sf).count())
  }

  test("q332 consumer: mode ledger exact, superseded MVs GC'd, crash-replay lands the same state, no CURRENT") {
    val root = StoreQueries.ensureConsumedEventMv(spark, sf)
    assert(new String(java.nio.file.Files.readAllBytes(
      root.resolve("MODES")), "UTF-8").trim === "full,incr,diff,noop")
    val co = root.resolve("consumer")
    assert(ManifestStore.pointerCurrent(co).contains("mv-3"))
    assert(!java.nio.file.Files.exists(co.resolve("CURRENT")))
    // the cursor's retention reclaims superseded MV versions: the
    // bootstrap MV is gone, the predecessor stays for crash recovery
    assert(!java.nio.file.Files.exists(co.resolve("mv-0")),
      "superseded MV versions must be GC'd by the pointer store")
    assert(java.nio.file.Files.exists(co.resolve("mv-2")))
    def mv3 = spark.read.parquet(co.resolve("mv-3").toString)
      .collect().map(_.toString).sorted.toSeq
    val before = mv3
    // crash drill: the crash landed between the MV write and the
    // cursor commit — kill the newest cursor manifest and replay; the
    // round recomputes from the CURSOR's state (mv-2, not the torn
    // dir) and lands bit-identically
    val newest = Option(co.toFile.listFiles()).toSeq.flatten
      .filter(_.getName.matches("manifest-v\\d+"))
      .maxBy(_.getName.stripPrefix("manifest-v").toLong)
    assert(newest.delete())
    assert(ManifestStore.pointerCurrent(co).contains("mv-2"))
    assert(StoreQueries.consumeRound(spark, root.resolve("upstream"), co)
      === "diff", "the replayed round must retake the fold-crossing fallback")
    assert(ManifestStore.pointerCurrent(co).contains("mv-3"))
    assert(mv3 === before, "crash replay must land the identical MV state")
    assert(StoreQueries.consumeRound(spark, root.resolve("upstream"), co)
      === "noop")
  }

  test("q333 multi-rel WAP ledger: audit saw main at v1, publish moved both relations at v2, no branch left") {
    val t = StoreQueries.ensureWapMultiRelEventStore(spark, sf)
    val audit = new String(java.nio.file.Files.readAllBytes(
      t.getParent.resolve("AUDIT")), "UTF-8").trim
    assert(audit.contains("bad=0") && audit.endsWith("main_during_stage=v1"),
      audit)
    // the staged rollup re-derived the staged event count (recorded)
    val ev = audit.split(";").find(_.startsWith("ev=")).get.stripPrefix("ev=")
    val day = audit.split(";").find(_.startsWith("day=")).get.stripPrefix("day=")
    assert(ev === day && ev.toLong > 0L)
    // the publish landed at fork+1 = v2 with BOTH staged relations'
    // lines appended after main's four, and no branch manifest remains
    assert(ManifestStore.committedManifest(t).contains(2L))
    val members = ManifestStore.manifestMembers(t, 2L)
    assert(members.size === 6 && members.takeRight(2) ===
      Seq("day:delta-wap-v2-day", "ev:delta-wap-v2-ev"), members.toString)
    assert(Option(t.toFile.listFiles()).toSeq.flatten
      .count(_.getName.startsWith("manifest-wap")) === 0)
  }

  test("q334 partial compaction ledger: mixed [base-c, delta] members, O(prefix) base, probe == q291") {
    import org.apache.spark.sql.functions._
    val t = StoreQueries.ensureCompactedShingleStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(t).contains(3L))
    assert(ManifestStore.manifestMembers(t, 3L) ===
      Seq("base-c3", "delta-v2"),
      "compaction must keep the newer delta as a live member")
    // bounded write amplification: the base holds exactly the absorbed
    // prefix's rows (buckets 0+1), never the suffix's
    val base = spark.read.parquet(t.resolve("base-c3").toString)
    val baseDocs = base.select("doc_id").distinct().collect().map(_.getLong(0))
    assert(baseDocs.nonEmpty && baseDocs.forall(_ % 3 != 2),
      "the compacted base must not absorb the kept delta's rows")
    assert(base.count() ===
      spark.read.parquet(t.resolve("delta-v0").toString).count() +
        spark.read.parquet(t.resolve("delta-v1").toString).count())
    // a compaction is a pure rewrite: the probe == q291's uncompacted
    val got = StoreQueries.queries("q334_partial_compaction")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q291 = Streams.queries("q291_stream_shingle_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q291 && got.nonEmpty)
  }

  test("q335 consumer across compaction: ledger pins incr, unconsumed-prefix compaction refuses typed") {
    val root = StoreQueries.ensureCompactionConsumedMv(spark, sf)
    assert(new String(java.nio.file.Files.readAllBytes(
      root.resolve("MODES")), "UTF-8").trim === "full,incr,incr,noop",
      "the compaction-crossing round must stay INCREMENTAL")
    val up = root.resolve("upstream")
    // upstream ledger: v2 is the compaction, v3 the post-compaction
    // delta — the consumer's v1->v3 walk crossed v2 for free
    assert(ManifestStore.manifestMembers(up, 2L) === Seq("base-c2"))
    assert(ManifestStore.manifestMembers(up, 3L) ===
      Seq("base-c2", "delta-v3"))
    // the refusal side: a cursor that had NOT consumed delta-v1 when
    // the compaction absorbed it refuses — with the dedicated type
    val ex = intercept[ManifestStore.RewriteRefusedException] {
      ManifestStore.manifestChanges(spark, up, 0L, 3L)
    }
    assert(ex.getMessage.contains("compaction"), ex.getMessage)
    // and the MV equals the upstream resolve aggregated directly
    val cur = ManifestStore.pointerCurrent(root.resolve("consumer")).get
    val mv = spark.read.parquet(
        root.resolve("consumer").resolve(cur).toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ManifestStore.manifestSnapshot(spark, up).get
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mv === want && mv.nonEmpty)
  }

  test("q336 positional delete ledger: data members intact, tombstones committed, rows subtracted") {
    import org.apache.spark.sql.functions._
    val t = StoreQueries.ensurePosDeleteDocStore(spark, sf)
    assert(ManifestStore.manifestMembers(t, 3L) ===
      Seq("delta-v0", "delta-v1", "delta-v2", "~posdel-v3"),
      "the DELETE must not rewrite any data member")
    // the committed tombstones are (file, start, end) ranges, nonempty
    val ranges = spark.read.parquet(t.resolve("posdel-v3").toString)
    assert(ranges.columns.toSeq === Seq("file", "start", "end"))
    assert(ranges.count() > 0)
    // the resolve subtracts exactly the predicate's rows
    val got = StoreQueries.queries("q336_pos_delete_where")(spark, sf)
    assert(got.where(col("n_words") % 7 === 0).count() === 0L)
    assert(got.collect().forall(_.getBoolean(2)), "member audit bit false")
    val full = graft.Tables.documents(spark, sf).count()
    assert(got.count() < full && got.count() > 0)
  }

  test("q337 version hint: recorded at publish, all four discovery paths agree, hint restored") {
    val r = StoreQueries.queries("q337_version_hint")(spark, sf)
    assert(r.collect().forall(_.getBoolean(2)),
      "a hint state changed the discovered version")
    val t = StoreQueries.ensureHintedDocStatsStore(spark, sf)
    assert(new String(java.nio.file.Files.readAllBytes(
      t.resolve("_version_hint")), "UTF-8").trim === "2",
      "the probe must leave the hint restored")
  }

  test("q338 incremental WAP ledger: per-batch audits nonempty, publish at fork+1 moved all six lines") {
    val t = StoreQueries.ensureIncrementalWapEventStore(spark, sf)
    val audit = new String(java.nio.file.Files.readAllBytes(
      t.getParent.resolve("AUDIT")), "UTF-8").trim
    assert(audit.endsWith("main_during_stage=v0"), audit)
    val ev1 = audit.split(";").find(_.startsWith("ev1=")).get
      .stripPrefix("ev1=").toLong
    val ev2 = audit.split(";").find(_.startsWith("ev2=")).get
      .stripPrefix("ev2=").toLong
    assert(ev1 > 0 && ev2 > 0, audit)
    assert(ManifestStore.committedManifest(t).contains(1L),
      "the publish must land at fork+1")
    assert(ManifestStore.manifestMembers(t, 1L) === Seq(
      "day:delta-v0-day", "ev:delta-v0-ev",
      "day:delta-wap-v1-day", "ev:delta-wap-v1-ev",
      "day:delta-wap-v2-day", "ev:delta-wap-v2-ev"))
    assert(Option(t.toFile.listFiles()).toSeq.flatten
      .forall(!_.getName.startsWith("manifest-wap-")),
      "branch manifests must be dropped at publish")
  }

  test("q339 IVF changelog: reads only the newest assignment delta, drift relation never enters the plan") {
    val r = StoreQueries.queries("q339_ivf_assign_changelog")(spark, sf)
    val files = r.inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("delta-v2-assigned")),
      s"the incremental read must open exactly the new assignment delta: $files")
    // O(changes) == the newest ingest bucket, 1:1 with its vectors
    val row = r.collect().head
    val want = Tables.embeddings(spark, sf)
      .where(org.apache.spark.sql.functions.col("vec_id") % 3 === 2)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("vec_id"))
      .collect().head
    assert(row.getLong(0) === want.getLong(0))
    assert(row.getLong(1) === want.getLong(1))
  }

  test("q331 as-of-timestamp: header-recorded instants resolve, pre-history resolves nothing, mtime irrelevant") {
    val t = StoreQueries.ensureTimestampedDocStatsStore(spark, sf)
    // commit times are the manifests' own #ts: headers — strictly
    // monotone, so each version's recorded instant resolves exactly it
    val ts = (0 to 2).map(v => ManifestStore.manifestTimestamp(t, v.toLong))
    assert(ts === ts.sorted && ts.distinct.size === 3, ts.toString)
    // an instant between the second and third commits resolves v1
    assert(ManifestStore.manifestVersionAsOf(t, ts(2) - 1L).contains(1L))
    // exact boundary: AS OF a commit's own instant includes it
    assert(ManifestStore.manifestVersionAsOf(t, ts(1)).contains(1L))
    // pre-history: nothing existed — None, never "the oldest state"
    assert(ManifestStore.manifestVersionAsOf(t, ts(0) - 1L).isEmpty)
    // far future resolves the current version
    assert(ManifestStore.manifestVersionAsOf(t, Long.MaxValue).contains(2L))
    // the time axis survives mtime mangling — the r16 weak flag: the
    // carrier is manifest content, never filesystem metadata
    Option(t.toFile.listFiles()).toSeq.flatten
      .filter(_.getName.matches("manifest-v\\d+"))
      .foreach(f => assert(f.setLastModified(1000L)))
    assert(ManifestStore.manifestVersionAsOf(t, ts(1)).contains(1L))
    // the travelled read carries buckets 0+1 only
    val users = StoreQueries.queries("q331_as_of_timestamp")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(users.nonEmpty && users.forall(_ % 3 != 2))
  }

  test("q329 fork-guard ledger: abort recorded, final main = both main deltas + re-staged branch, branches gone") {
    val t = StoreQueries.ensureForkGuardedWapStore(spark, sf)
    assert(new String(java.nio.file.Files.readAllBytes(
      t.getParent.resolve("AUDIT")), "UTF-8").trim
      === "first_publish_aborted=true")
    val members = ManifestStore.manifestMembers(t,
      ManifestStore.committedManifest(t).get)
    assert(members === Seq("delta-v0", "delta-v2", "delta-stage2-v3"),
      members.toString)
    assert(Option(t.toFile.listFiles()).toSeq.flatten
      .count(_.getName.startsWith("manifest-stage")) === 0,
      "no branch manifest may survive the publish/abandon")
    val n = StoreQueries.queries("q329_wap_fork_guard")(spark, sf).count()
    assert(n === graft.Tables.documents(spark, sf).count())
  }
}
