package graft.store

import graft.SparkSpec

/** Protocol-level pins for [[ManifestStore]] — the commit/fold/GC/
  * erasure/contention machinery, tested on tiny synthetic stores (the
  * query-level stores are pinned in StreamingSpec/MultimodalSpec).
  * Moved here from StreamingSpec when the protocol moved out of
  * Streams (round 15).
  */
class ManifestStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def dirs(root: java.nio.file.Path, pat: String) =
    Option(root.toFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches(pat)).toSet

  private def b(kv: (Long, Long)*) = spark.createDataFrame(kv).toDF("k", "v")

  private def tmpStore() = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-manifest-spec-")

  test("manifest protocol: O(batch) commits, LWW resolve, fold at threshold, GC, idempotence, crash") {
    // ── append store ──
    val ap = tmpStore()
    ManifestStore.commitDelta(ap, b((1L, 10L)), 0L)
    ManifestStore.commitDelta(ap, b((2L, 20L)), 1L)
    ManifestStore.commitDelta(ap, b((3L, 30L)), 2L)
    assert(ManifestStore.committedManifest(ap).contains(2L))
    assert(ManifestStore.manifestMembers(ap, 2L) ===
      Seq("delta-v0", "delta-v1", "delta-v2"))
    assert(rows(ManifestStore.manifestSnapshot(spark, ap).get) ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // unified protocol: the table IS the highest numbered manifest —
    // there is no CURRENT pointer anywhere (last-writer-wins flips are
    // what made the old protocol unsafe under concurrency)
    assert(!java.nio.file.Files.exists(ap.resolve("CURRENT")),
      "no CURRENT file may exist in the unified protocol")
    // each commit wrote O(batch): the delta dir holds only its batch
    assert(rows(spark.read.parquet(ap.resolve("delta-v1").toString)) ===
      Set((2L, 20L)))
    // retention: manifests older than the predecessor are GC'd, but
    // every delta both retained manifests reference stays readable
    assert(dirs(ap, "manifest-v\\d+") === Set("manifest-v1", "manifest-v2"))
    assert(rows(ManifestStore.manifestSnapshotAt(spark, ap, 1L)) ===
      Set((1L, 10L), (2L, 20L)), "one-back time travel")
    // idempotent re-delivery: an applied batch id is a NO-OP
    ManifestStore.commitDelta(ap, b((9L, 99L)), 1L)
    assert(rows(ManifestStore.manifestSnapshot(spark, ap).get) ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // crash window: a delta dir written but never committed (no
    // manifest names it) is invisible, and the re-run overwrites it
    b((8L, 80L)).write.mode("overwrite").parquet(ap.resolve("delta-v3").toString)
    assert(rows(ManifestStore.manifestSnapshot(spark, ap).get) ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)), "torn delta leaked into reads")
    ManifestStore.commitDelta(ap, b((4L, 40L)), 3L)
    assert(rows(ManifestStore.manifestSnapshot(spark, ap).get) ===
      Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    graft.Tables.deleteRecursively(ap.toFile)

    // ── upsert (merge-on-read) store: newest member wins per key ──
    val up = tmpStore()
    ManifestStore.commitDelta(up, b((1L, 10L), (2L, 20L)), 0L, upsertKey = Some("k"))
    ManifestStore.commitDelta(up, b((1L, 11L), (3L, 30L)), 1L, upsertKey = Some("k"))
    assert(rows(ManifestStore.manifestSnapshot(spark, up, Some("k")).get) ===
      Set((1L, 11L), (2L, 20L), (3L, 30L)),
      "newest delta must shadow older rows of the same key")
    assert(rows(ManifestStore.manifestSnapshotAt(spark, up, 0L, Some("k"))) ===
      Set((1L, 10L), (2L, 20L)))
    graft.Tables.deleteRecursively(up.toFile)

    // ── fold at threshold: the LSM absorb step ──
    val fd = tmpStore()
    ManifestStore.commitDelta(fd, b((1L, 10L)), 0L, foldAfter = 2)
    ManifestStore.commitDelta(fd, b((2L, 20L)), 1L, foldAfter = 2)
    val preFold = rows(ManifestStore.manifestSnapshot(spark, fd).get) + ((3L, 30L))
    ManifestStore.commitDelta(fd, b((3L, 30L)), 2L, foldAfter = 2)
    // the third commit crossed the threshold: manifest resets to ONE base
    assert(ManifestStore.manifestMembers(fd, 2L) === Seq("base-v2"))
    assert(rows(ManifestStore.manifestSnapshot(spark, fd).get) === preFold,
      "post-fold store must be bit-equal to the pre-fold resolve")
    // predecessor manifest still resolves through the retained deltas
    assert(rows(ManifestStore.manifestSnapshotAt(spark, fd, 1L)) ===
      Set((1L, 10L), (2L, 20L)))
    // the NEXT commit's GC drops the folded-away deltas: nothing the
    // two retained manifests reference needs them any more
    ManifestStore.commitDelta(fd, b((4L, 40L)), 3L, foldAfter = 2)
    assert(dirs(fd, "delta-v\\d+") === Set("delta-v3"),
      "folded-away deltas must be GC'd once unreferenced")
    assert(rows(ManifestStore.manifestSnapshot(spark, fd).get) ===
      preFold + ((4L, 40L)))
    graft.Tables.deleteRecursively(fd.toFile)
  }

  test("retention depth N=3: depth-2 travel reads green, GC drops only versions below the window") {
    val rt = tmpStore()
    (0 to 3).foreach(i =>
      ManifestStore.commitDelta(rt, b((i.toLong, i.toLong * 10)), i.toLong, retain = 3))
    // keep-last-3: v1, v2, v3 retained; only v0 dropped
    assert(dirs(rt, "manifest-v\\d+") ===
      Set("manifest-v1", "manifest-v2", "manifest-v3"))
    // a depth-2 travel read (two versions behind current) resolves
    assert(rows(ManifestStore.manifestSnapshotAt(spark, rt, 1L)) ===
      Set((0L, 0L), (1L, 10L)))
    // no dir loss: v1's members are all referenced by retained manifests
    assert(dirs(rt, "delta-v\\d+") ===
      Set("delta-v0", "delta-v1", "delta-v2", "delta-v3"))
    // a depth-2 changelog read also works inside the window
    val added = ManifestStore.manifestChanges(spark, rt, 1L, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(added === Set((2L, 20L), (3L, 30L)))
    graft.Tables.deleteRecursively(rt.toFile)
  }

  test("production commit path under 4-thread concurrency: dense versions, every batch lands exactly once") {
    // The r14 q299 race spec drove commitContended; the production
    // single-writer path (commitDelta) committed via a last-writer-wins
    // CURRENT flip its own doc-comment warned about. Unified protocol:
    // commitDelta publishes through the SAME put-if-absent primitive,
    // so genuinely concurrent committers with distinct batches must
    // serialize into dense versions with no lost update — pinned here
    // under real threads and real link(2) arbitration, winner order
    // nondeterministic.
    val root = tmpStore()
    try {
      val n = 4
      val threads = (0 until n).map { i =>
        new Thread(() => {
          ManifestStore.commitDelta(root, b((i.toLong, i.toLong * 10)), i.toLong)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      // versions dense 0..3, each arbitrated exactly once
      assert(ManifestStore.committedManifest(root).contains((n - 1).toLong))
      // newest manifest carries every batch's delta exactly once (order
      // is commit order — schedule-dependent, so only the set is pinned)
      val members = ManifestStore.manifestMembers(root, (n - 1).toLong)
      assert(members.size === n, members.toString)
      assert(members.toSet === (0 until n).map(i => s"delta-v$i").toSet)
      val got = rows(ManifestStore.manifestSnapshot(spark, root).get)
      assert(got === (0 until n).map(i => (i.toLong, i.toLong * 10)).toSet)
      // replayed batch after the race: still a no-op
      ManifestStore.commitDelta(root, b((99L, 99L)), 1L)
      assert(rows(ManifestStore.manifestSnapshot(spark, root).get) === got)
      assert(!java.nio.file.Files.exists(root.resolve("CURRENT")))
    } finally graft.Tables.deleteRecursively(root.toFile)
  }

  test("multi-relation commits under 4-thread concurrency: dense versions, all relations land un-torn") {
    // the single-relation production race is pinned above; this drives
    // commitDeltaMulti — where a lost update would not just drop rows
    // but TEAR the index (one relation advanced without its siblings)
    val root = tmpStore()
    try {
      val n = 4
      val threads = (0 until n).map { i =>
        new Thread(() => {
          ManifestStore.commitDeltaMulti(root, Map(
            "left" -> b((i.toLong, i.toLong)),
            "right" -> b((i.toLong, i.toLong + 1))), i.toLong)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(ManifestStore.committedManifest(root).contains((n - 1).toLong))
      val members = ManifestStore.manifestMembers(root, (n - 1).toLong)
      assert(members.size === 2 * n, members.toString)
      // every batch's TWO relation lines are adjacent — a commit is all
      // of a batch's relations or none of them, under any schedule
      val tags = members.map(_.split(':')(1))
      (0 until n).foreach { i =>
        val at = tags.indexOf(s"delta-v$i-left")
        assert(at >= 0 && at + 1 < tags.size &&
          tags(at + 1) === s"delta-v$i-right",
          s"batch $i's relations tore apart: $members")
      }
      val left = rows(ManifestStore.manifestSnapshotRel(spark, root, "left").get)
      val right = rows(ManifestStore.manifestSnapshotRel(spark, root, "right").get)
      assert(left === (0 until n).map(i => (i.toLong, i.toLong)).toSet)
      assert(right === (0 until n).map(i => (i.toLong, i.toLong + 1)).toSet)
    } finally graft.Tables.deleteRecursively(root.toFile)
  }

  test("contended commit under real concurrency: dense versions, every delta lands exactly once") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    // q299 pins one DETERMINISTIC interleave; this drives the same
    // protocol with four genuinely concurrent committers (real threads,
    // real link(2) races — nondeterministic winner order). The pinned
    // invariants are the ones the protocol must hold under ANY
    // schedule: versions dense (every manifest number arbitrated
    // exactly once), every delta in the final member set exactly once
    // (no lost update), and the resolved store complete. Collision
    // COUNTS are schedule-dependent, so they are deliberately not
    // asserted. Deltas are written serially BEFORE the race (the
    // shared local session is not the thing under test); only the
    // commit protocol — pure file ops, no Spark calls — runs
    // concurrently.
    val root = Files.createTempDirectory(
      Paths.get(graft.Tables.scratchDir), "graft-contend-spec-")
    try {
      val n = 4
      (0 to n).foreach { i =>
        Seq((i.toLong, i.toLong)).toDF("k", "v").write.mode("overwrite")
          .parquet(root.resolve(s"delta-c$i").toString)
      }
      ManifestStore.commitContended(root, "delta-c0", None, Nil)
      val readV = ManifestStore.committedManifest(root)
      val readM = readV.map(ManifestStore.manifestMembers(root, _)).getOrElse(Nil)
      // all four committers hold the SAME (stale after the first win)
      // read snapshot — maximum contention
      val threads = (1 to n).map { i =>
        new Thread(() => {
          ManifestStore.commitContended(root, s"delta-c$i", readV, readM): Unit
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(ManifestStore.committedManifest(root).contains(n.toLong))
      (0 to n).foreach { v =>
        assert(Files.exists(root.resolve(s"manifest-v$v")), s"gap at v$v") }
      val members = ManifestStore.manifestMembers(root, n.toLong)
      assert(members.size === n + 1, members.toString)
      assert(members.toSet === (0 to n).map(i => s"delta-c$i").toSet)
      val got = ManifestStore.manifestSnapshot(spark, root).get
        .collect().map(_.getLong(0)).toSet
      assert(got === (0 to n).map(_.toLong).toSet)
    } finally graft.Tables.deleteRecursively(root.toFile)
  }

  test("erasure fold: tombstones physically purged, single-member read, changelog refuses across it") {
    import org.apache.spark.sql.functions.col
    val ef = tmpStore()
    ManifestStore.commitDelta(ef, b((1L, 10L), (2L, 20L)), 0L)
    ManifestStore.commitDelta(ef, b((3L, 30L), (4L, 40L)), 1L)
    val forget = b((2L, 0L), (3L, 0L)).select("k")
    ManifestStore.eraseFold(ef, forget, Seq("k"))
    // one fresh purged base is the whole store
    assert(ManifestStore.committedManifest(ef).contains(2L))
    assert(ManifestStore.manifestMembers(ef, 2L) === Seq("base-e2"))
    assert(rows(ManifestStore.manifestSnapshot(spark, ef).get) ===
      Set((1L, 10L), (4L, 40L)))
    // zero tombstoned rows in the folded FILES, not just the read: scan
    // the base dir raw
    assert(rows(spark.read.parquet(ef.resolve("base-e2").toString)) ===
      Set((1L, 10L), (4L, 40L)))
    // the read plans NO anti-join — the fold deleted the per-probe overlay
    val plan = ManifestStore.manifestSnapshot(spark, ef).get
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), plan)
    // a changelog read across the erasure fold must refuse loudly
    // (checked while v1 is still retained — before the next commit's GC)
    val ex = intercept[IllegalArgumentException] {
      ManifestStore.manifestChanges(spark, ef, 1L, 2L)
    }
    assert(ex.getMessage.contains("fold"))
    // the store keeps committing normally on top of the purged base
    ManifestStore.commitDelta(ef, b((5L, 50L)), 3L)
    assert(rows(ManifestStore.manifestSnapshot(spark, ef).get) ===
      Set((1L, 10L), (4L, 40L), (5L, 50L)))
    graft.Tables.deleteRecursively(ef.toFile)

    // ── upsert store: the fold also deletes the merge-on-read window ──
    val uf = tmpStore()
    ManifestStore.commitDelta(uf, b((1L, 10L), (2L, 20L)), 0L, upsertKey = Some("k"))
    ManifestStore.commitDelta(uf, b((1L, 11L), (3L, 30L)), 1L, upsertKey = Some("k"))
    ManifestStore.eraseFold(uf, b((3L, 0L)).select("k"), Seq("k"), upsertKey = Some("k"))
    assert(rows(ManifestStore.manifestSnapshot(spark, uf, Some("k")).get) ===
      Set((1L, 11L), (2L, 20L)))
    val uplan = ManifestStore.manifestSnapshot(spark, uf, Some("k")).get
      .queryExecution.executedPlan.toString
    assert(!uplan.contains("LeftAnti") && !uplan.contains("Window"),
      s"folded upsert read must plan neither overlay nor LWW window: $uplan")
    graft.Tables.deleteRecursively(uf.toFile)
  }

  test("delete-file commits: resolve subtracts, changelog refuses, fold absorbs, vacuum is age-gated") {
    import org.apache.spark.sql.functions.col
    val st = tmpStore()
    ManifestStore.commitDelta(st, b((1L, 10L), (2L, 20L)), 0L)
    ManifestStore.commitDelta(st, b((3L, 30L), (4L, 40L)), 1L)
    // equality-delete commit: keys 2 and 3 logically gone everywhere
    ManifestStore.commitDeleteFile(st, b((2L, 0L), (3L, 0L)).select("k"), 2L)
    assert(ManifestStore.manifestMembers(st, 2L) ===
      Seq("delta-v0", "delta-v1", "~del-v2"))
    assert(rows(ManifestStore.manifestSnapshot(spark, st).get) ===
      Set((1L, 10L), (4L, 40L)))
    // merge-on-read: the deleted rows are PHYSICALLY still in the delta
    assert(rows(spark.read.parquet(st.resolve("delta-v0").toString))
      .contains((2L, 20L)), "delete files are logical until a fold")
    // a replayed delete commit is a no-op
    ManifestStore.commitDeleteFile(st, b((4L, 0L)).select("k"), 2L)
    assert(rows(ManifestStore.manifestSnapshot(spark, st).get) ===
      Set((1L, 10L), (4L, 40L)))
    // append-only changelog refuses across the delete commit
    val ex = intercept[IllegalArgumentException] {
      ManifestStore.manifestChanges(spark, st, 1L, 2L)
    }
    assert(ex.getMessage.contains("delete commit"))
    // the NEXT commit that folds absorbs the delete: purged base, no
    // delete member, deleted keys physically absent from the new files
    ManifestStore.commitDelta(st, b((5L, 50L)), 3L, foldAfter = 3)
    assert(ManifestStore.manifestMembers(st, 3L) === Seq("base-v3"))
    assert(rows(spark.read.parquet(st.resolve("base-v3").toString)) ===
      Set((1L, 10L), (4L, 40L), (5L, 50L)))
    graft.Tables.deleteRecursively(st.toFile)

    // ── vacuum: only OLD unreferenced dirs die; referenced and young
    // ones survive, and no retained read changes ──
    val vt = tmpStore()
    ManifestStore.commitDelta(vt, b((1L, 10L)), 0L)
    val before = rows(ManifestStore.manifestSnapshot(spark, vt).get)
    b((7L, 70L)).write.mode("overwrite").parquet(vt.resolve("delta-v98").toString)
    b((8L, 80L)).write.mode("overwrite").parquet(vt.resolve("delta-v99").toString)
    vt.resolve("delta-v98").toFile.setLastModified(1000L)
    val now = System.currentTimeMillis()
    assert(ManifestStore.vacuumOrphans(vt, 3600L * 1000, now) === 1)
    assert(!java.nio.file.Files.exists(vt.resolve("delta-v98")),
      "old orphan must be vacuumed")
    assert(java.nio.file.Files.exists(vt.resolve("delta-v99")),
      "a young orphan may be an in-flight commit and must survive")
    assert(java.nio.file.Files.exists(vt.resolve("delta-v0")),
      "referenced dirs are never vacuum candidates")
    assert(rows(ManifestStore.manifestSnapshot(spark, vt).get) === before)
    graft.Tables.deleteRecursively(vt.toFile)
  }

  test("schema evolution: widened commits resolve by name, old rows null, travel reads the old shape") {
    import org.apache.spark.sql.functions.col
    val ev = tmpStore()
    ManifestStore.commitDelta(ev, b((1L, 10L)), 0L)
    // batch 1 widens the schema with column `w`
    ManifestStore.commitDelta(ev,
      b((2L, 20L)).withColumn("w", col("v") * 2), 1L)
    val snap = ManifestStore.manifestSnapshot(spark, ev).get
    assert(snap.columns.toSeq === Seq("k", "v", "w"))
    val got = snap.collect().map(r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got === Set((1L, 10L, -1L), (2L, 20L, 40L)),
      "pre-evolution rows must surface the new column as null")
    // time travel to the pre-evolution version reads the OLD shape
    assert(ManifestStore.manifestSnapshotAt(spark, ev, 0L).columns.toSeq ===
      Seq("k", "v"))
    graft.Tables.deleteRecursively(ev.toFile)
  }

  test("multi-relation commits: fold bounds members per relation, GC reclaims, one-flip erasure fold") {
    import org.apache.spark.sql.functions.col
    def m(kv: (Long, Long)*) = Map(
      "left" -> b(kv: _*),
      "right" -> b(kv.map { case (k, v) => (k, v + 1) }: _*))
    val mr = tmpStore()
    ManifestStore.commitDeltaMulti(mr, m((1L, 10L)), 0L, foldAfter = 2)
    ManifestStore.commitDeltaMulti(mr, m((2L, 20L)), 1L, foldAfter = 2)
    // no fold yet: 2 members per relation, appended lines
    assert(ManifestStore.manifestMembers(mr, 1L).size === 4)
    val pre = rows(ManifestStore.manifestSnapshotRel(spark, mr, "left").get)
    // third commit crosses foldAfter=2: EVERY relation folds to one
    // fresh base behind ONE manifest
    ManifestStore.commitDeltaMulti(mr, m((3L, 30L)), 2L, foldAfter = 2)
    assert(ManifestStore.manifestMembers(mr, 2L).toSet ===
      Set("left:base-v2-left", "right:base-v2-right"))
    assert(rows(ManifestStore.manifestSnapshotRel(spark, mr, "left").get) ===
      pre + ((3L, 30L)), "post-fold relation must equal the pre-fold resolve")
    assert(rows(ManifestStore.manifestSnapshotRel(spark, mr, "right").get) ===
      Set((1L, 11L), (2L, 21L), (3L, 31L)))
    // changelog across the fold refuses loudly per relation (checked
    // while v1 is still retained — before the next commit's GC)
    val ex = intercept[IllegalArgumentException] {
      ManifestStore.manifestChangesRel(spark, mr, "left", 1L, 2L)
    }
    assert(ex.getMessage.contains("rewrite"))
    // bounded-member pin: after the fold no relation unions more than
    // foldAfter dirs, ever
    ManifestStore.commitDeltaMulti(mr, m((4L, 40L)), 3L, foldAfter = 2)
    val members3 = ManifestStore.manifestMembers(mr, 3L)
    Seq("left", "right").foreach { rel =>
      assert(members3.count(_.startsWith(s"$rel:")) <= 2, members3.toString)
    }
    // GC: the fold-superseded deltas die once no retained manifest
    // references them (manifests v2,v3 retained; v0,v1 dropped)
    assert(dirs(mr, "manifest-v\\d+") === Set("manifest-v2", "manifest-v3"))
    assert(dirs(mr, "delta-v\\d+-left") === Set("delta-v3-left"),
      dirs(mr, "delta-v\\d+-left").toString)
    // time travel to the predecessor still resolves ALL relations at
    // one version (the fold manifest)
    assert(rows(ManifestStore.manifestSnapshotRelAt(spark, mr, "right", 2L).get) ===
      Set((1L, 11L), (2L, 21L), (3L, 31L)))
    // rel-scoped ERASURE FOLD: purge `left` on k, carry `right` over
    // unchanged, one flip
    ManifestStore.eraseFoldRel(mr, "left", b((2L, 0L)).select("k"), Seq("k"))
    val after = ManifestStore.manifestMembers(mr,
      ManifestStore.committedManifest(mr).get)
    assert(after.exists(_.startsWith("left:base-e")), after.toString)
    assert(after.count(_.startsWith("right:")) === 2, after.toString)
    assert(rows(ManifestStore.manifestSnapshotRel(spark, mr, "left").get) ===
      Set((1L, 10L), (3L, 30L), (4L, 40L)))
    assert(rows(ManifestStore.manifestSnapshotRel(spark, mr, "right").get) ===
      Set((1L, 11L), (2L, 21L), (3L, 31L), (4L, 41L)),
      "untouched relations must survive the erasure flip unchanged")
    // the purged relation's raw base files carry zero tombstoned rows
    val baseDir = after.find(_.startsWith("left:base-e")).get.stripPrefix("left:")
    assert(!rows(spark.read.parquet(mr.resolve(baseDir).toString))
      .exists(_._1 == 2L))
    graft.Tables.deleteRecursively(mr.toFile)
  }
}
