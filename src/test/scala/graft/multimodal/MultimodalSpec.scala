package graft.multimodal

import graft.SparkSpec
import graft.store.ManifestStore

class MultimodalSpec extends SparkSpec {

  test("batched stub decode: histogram normalized, frame count = ceil(bytes/64)") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.n_frames === ((f.n_bytes + 63) / 64).toInt)
    }
  }

  test("stub decode is deterministic across runs") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    assert(a.map(_.histogram.toSeq).toSeq === b.map(_.histogram.toSeq).toSeq)
  }

  test("resize stub keeps every k-th byte") {
    val bytes = Array.tabulate(10)(_.toByte)
    assert(Multimodal.StubCodec.resize(bytes, 3).toSeq === Seq[Byte](0, 3, 6, 9))
  }

  test("frame dedup surfaces only duplicated frames, keeper is the earliest") {
    val frames = Multimodal.frameSample(spark, sf).collect()
      .map(r => (r.getString(2), r.getLong(0) * 4294967296L + r.getInt(1)))
    val byHash = frames.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Multimodal.frameDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty, "corpus must contain duplicated frames")
    rows.foreach { case (h, n, keeper) =>
      assert(n === byHash(h).length.toLong && n > 1)
      assert(keeper === byHash(h).min)
    }
    // completeness: every hash with >1 occurrence is reported
    assert(rows.length === byHash.count(_._2.length > 1))
  }

  test("q243 perceptual near-dup: banded join == brute force, BNLJ-free plan") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.frameNearDup(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "near-dup must bucket, never all-pairs\n" + plan.take(1200))
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.nonEmpty, "corpus must contain perceptual near-dup frames")
    got.foreach { case (_, _, h) => assert(h >= 1 && h <= 3) }
    // brute-force ground truth over every distinct full frame: the
    // 4x15-bit pigeonhole is EXACT for Hamming <= 3 (a pair differing
    // in <= 3 bits cannot differ in all 4 bands), so the banded join
    // must reproduce the all-pairs result bit-for-bit
    val fb = Multimodal.StubCodec.FrameBytes
    val frames = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        (0 until text.length / fb).map(k =>
          (text.substring(k * fb, (k + 1) * fb), id * 4294967296L + k))
      }
      .groupBy(_._1).map { case (f, ks) => (ks.map(_._2).min, f) }.toArray
    val sigs = frames.map { case (k, f) =>
      (k, Multimodal.frameSignature(f)) }.sortBy(_._1)
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield (math.min(sigs(i)._1, sigs(j)._1),
      math.max(sigs(i)._1, sigs(j)._1), h)).toSet
    assert(got === brute)
  }

  /** Local brute replay of the shot pipeline: per media, full frames in
    * timeline order, signature per frame, cut where consecutive
    * signatures differ by >= ShotCutBits, running-sum shot ids. Returns
    * (media_id, per-frame (frame_id, frame, sig, shot_id) timeline).
    */
  private def bruteShots(): Map[Long, Seq[(Int, String, Long, Long)]] = {
    import org.apache.spark.sql.functions._
    val fb = Multimodal.StubCodec.FrameBytes
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val frames = (0 until text.length / fb).map(k =>
          (k, text.substring(k * fb, (k + 1) * fb)))
        var shot = 0L
        var prev = 0L
        val timeline = frames.zipWithIndex.map { case ((k, f), idx) =>
          val sig = Multimodal.frameSignature(f)
          if (idx > 0 && java.lang.Long.bitCount(sig ^ prev) >=
            Multimodal.ShotCutBits) shot += 1
          prev = sig
          (k, f, sig, shot)
        }
        id -> timeline
      }.toMap
  }

  test("q253 shot segmentation equals a local brute replay, BNLJ-free plan") {
    val res = Multimodal.shotSegmentation(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expected = bruteShots().collect {
      case (id, tl) if tl.nonEmpty =>
        val lens = tl.groupBy(_._4).values.map(_.size.toLong)
        id -> (tl.size.toLong, lens.size.toLong, lens.max)
    }
    assert(got === expected)
    // both boundaries and continuations must occur, or the threshold
    // is degenerate at this sf
    assert(got.values.exists(_._2 > 1L), "no media with >1 shot")
    assert(got.values.exists(v => v._1 > v._2), "no multi-frame shot")
  }

  test("q254 keyframe: exactly one row per q253 shot, medoid pick exact") {
    val res = Multimodal.keyframePerShot(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getString(3)))
      .toMap
    val shots = bruteShots()
    val nShots = shots.values.map(_.map(_._4).distinct.size).sum
    assert(got.size === nShots, "one keyframe per (media, shot)")
    // medoid: per shot, the frame minimizing summed Hamming distance to
    // the shot's frames (self contributes 0), earliest frame_id on ties
    shots.foreach { case (id, tl) =>
      tl.groupBy(_._4).foreach { case (shotId, frames) =>
        val best = frames.map { case (k, f, sig, _) =>
          val cost = frames.map(o =>
            java.lang.Long.bitCount(sig ^ o._3).toLong).sum
          (cost, k, f)
        }.minBy(t => (t._1, t._2))
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(best._3.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got((id, shotId)) === ((best._2, md)),
          s"medoid mismatch at media $id shot $shotId")
      }
    }
  }

  test("q260 shot near-dup equals a local brute all-pairs replay, BNLJ-free") {
    val res = Multimodal.shotNearDup(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    // local ground truth: medoid signature per (media, shot), then
    // all cross-media pairs within Hamming 3 (the 4x15 pigeonhole is
    // exhaustive for <= 3, so banded must equal brute)
    val kf: Map[(Long, Long), Long] = bruteShots().flatMap { case (id, tl) =>
      tl.groupBy(_._4).map { case (shotId, frames) =>
        val best = frames.map { case (k, _, sig, _) =>
          (frames.map(o => java.lang.Long.bitCount(sig ^ o._3).toLong).sum,
            k, sig)
        }.minBy(t => (t._1, t._2))
        (id, shotId) -> best._3
      }
    }
    val keys = kf.keys.toSeq.sorted
    val expected = (for {
      i <- keys.indices.iterator
      j <- (i + 1) until keys.length
      a = keys(i); b = keys(j)
      if a._1 != b._1
      h = java.lang.Long.bitCount(kf(a) ^ kf(b))
      if h <= 3
    } yield (a._1, a._2, b._1, b._2, h)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "corpus must contain cross-media shot reuse")
  }

  test("q257 silence segments equal a local brute replay; both classes live") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.silenceSegments(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    val (hop, wlen) = (Multimodal.AudioHop, Multimodal.AudioWin)
    val expected = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val wins = (0 to math.max((text.length - wlen) / hop, 0))
          .map(k => text.substring(k * hop,
            math.min(k * hop + wlen, text.length)))
          .filter(_.length == wlen)
        if (wins.isEmpty) None
        else {
          val silent = wins.map(w =>
            Multimodal.audioEnergy(w) < Multimodal.SilenceEnergy)
          // islands of consecutive silent windows
          val segs = silent.foldLeft(List.empty[Int]) {
            case (acc, false) => 0 :: acc
            case (Nil, true) => List(1)
            case (h :: t, true) => (h + 1) :: t
          }.filter(_ > 0)
          Some(id -> (wins.size.toLong, silent.count(identity).toLong,
            segs.size.toLong, (if (segs.isEmpty) 0 else segs.max).toLong))
        }
      }.toMap
    assert(got === expected)
    // the threshold must be LIVE at this sf: silent and loud windows,
    // multi-window segments, and silence-free media all occur
    assert(got.values.exists(_._2 > 0L), "no silent windows")
    assert(got.values.exists(v => v._2 < v._1), "no loud windows")
    assert(got.values.exists(_._4 > 1L), "no multi-window silence segment")
  }

  test("q267 audio constellation equals a local brute replay; offsets align, BNLJ-free") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.audioConstellation(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.nonEmpty, "no aligned pairs at this sf")
    val (hop, wlen) = (Multimodal.AudioHop, Multimodal.AudioWin)
    // local replay: windows -> energies -> top-K peaks -> landmarks
    val peaks = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val wins = (0 to math.max((text.length - wlen) / hop, 0))
          .map(k => (k, text.substring(k * hop,
            math.min(k * hop + wlen, text.length))))
          .filter(_._2.length == wlen)
        wins.map { case (k, w) => (id, k, Multimodal.audioEnergy(w)) }
          .sortBy { case (_, k, e) => (-e, k) }
          .take(Multimodal.PeakTopK)
      }
    val landmarks: Seq[(Long, Int, Long)] =
      peaks.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        ps.toSeq.flatMap { case (_, t1, e1) =>
          ps.toSeq.collect {
            case (_, t2, e2)
                if t2 - t1 >= 1 && t2 - t1 <= Multimodal.FanOutWins =>
              (id, t1, (e1 / 100) * 40000000L + (e2 / 100) * 16L + (t2 - t1))
          }
        }
      }
    val want = landmarks.flatMap { case (ma, ta, ha) =>
      landmarks.collect { case (mb, tb, hb) if ha == hb && ma < mb =>
        ((ma, mb, (ta - tb).toLong), 1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 >= Multimodal.MinVotes).toMap
    assert(got === want)
    // the vote evidence is non-degenerate: the threshold prunes real
    // candidates and surviving votes spread beyond the minimum
    assert(got.values.exists(_ > Multimodal.MinVotes), "all pairs at the floor")
  }

  test("q270 incremental ingest equals the full q249 recompute filtered to the batch; probe-only plan") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.queries("q270_incremental_media_near_dup")(spark, sf)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the full recompute, filtered to pairs with a batch endpoint —
    // class keys relabel bijectively between the paths, media pairs
    // and evidence counts are invariant under the relabeling
    val want = Multimodal.mediaNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .filter { case ((a, b), _) => a % 3 == 0 || b % 3 == 0 }.toMap
    assert(got === want)
    assert(got.nonEmpty, "no batch-touching media pair at this sf")
    // both ingest classes live: batch-vs-corpus AND within-batch
    assert(got.keys.exists { case (a, b) => a % 3 != 0 || b % 3 != 0 },
      "no batch-vs-old pair")
    assert(got.keys.exists { case (a, b) => a % 3 == 0 && b % 3 == 0 },
      "no within-batch pair")
    // probe-only economics: the batch is STAGED once (an eager
    // checkpoint of the single pruned documents scan), so the served
    // plan reads the staged batch + the stored index and touches
    // documents.parquet ZERO times; old classes/occurrences/pairs come
    // from the index, no BNLJ anywhere
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-old-frame-index"), plan.take(1500))
    assert("documents\\.parquet".r.findAllIn(plan).isEmpty,
      "served plan must read the staged batch, not re-scan documents")
    // and the one-time staging scan is the PRUNED batch scan
    val stagePlan = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 3 === 0)
      .queryExecution.executedPlan.toString
    assert("\\(doc_id#\\d+L? % 3\\) = 0".r.findFirstIn(stagePlan).isDefined,
      "batch filter did not reach the documents scan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q275 compacted frame index: bit-equal to a full rebuild, roll-up == q249, index-only plan") {
    import org.apache.spark.sql.functions._
    val idx = Multimodal.ensureCompactedFrameIndex(spark, sf)
    // the compaction gold standard: folding the overlay + canonical
    // relabel must produce EXACTLY what a from-scratch build over the
    // full corpus produces — nothing lost, nothing invented, keeper
    // keys included (an ingest hit keeps its OLD key in the overlay;
    // the compactor must swap in the full-corpus minimum)
    val rebuild = java.nio.file.Files.createTempDirectory("frameidx").toString
    Multimodal.buildFrameIndex(spark,
      graft.Tables.documents(spark, sf)
        .select(col("doc_id").as("media_id"), col("text")), rebuild)
    Seq("classes", "occ", "pairs").foreach { t =>
      val got = spark.read.parquet(s"$idx/$t").collect()
        .map(_.toString).sorted.toSeq
      val want = spark.read.parquet(s"$rebuild/$t").collect()
        .map(_.toString).sorted.toSeq
      assert(got === want, s"compacted $t diverges from the full rebuild")
      assert(got.nonEmpty, s"compacted $t is empty")
    }
    // the relabel was LIVE: at least one overlay key differed from its
    // canonical form (a hit class whose batch copy has the smaller key)
    val oldIdx = Multimodal.ensureOldFrameIndex(spark, sf)
    val oldKeepers = spark.read.parquet(s"$oldIdx/classes")
      .select("keeper").collect().map(_.getLong(0)).toSet
    val canonKeepers = spark.read.parquet(s"$idx/classes")
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert((oldKeepers -- canonKeepers).nonEmpty,
      "no keeper was relabeled — the canonical-relabel path is untested at this sf")
    // the roll-up from the compacted index == q249, and its plan reads
    // ONLY index files: no documents scan, no signing, no BNLJ
    val res = Multimodal.queries("q275_compacted_media_rollup")(spark, sf)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Multimodal.mediaNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want && got.nonEmpty, "compacted roll-up diverges from q249")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-compact-frame-index"), plan.take(1500))
    assert("documents\\.parquet".r.findAllIn(plan).isEmpty,
      "compacted roll-up must not scan the corpus")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    graft.Tables.deleteRecursively(new java.io.File(rebuild))
  }

  test("q278 media-index erasure: tombstone overlay == surviving-corpus rebuild, no erased text read") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.queries("q278_erased_media_rollup")(spark, sf)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "no surviving media pair at this sf")
    // the forget set is live and no erased media survives in the output
    val erased = Multimodal.mediaTombstones(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(erased.nonEmpty, "forget set empty at this sf")
    got.keys.foreach { case (a, b) =>
      assert(!erased(a) && !erased(b), s"erased media in q278 output: ($a, $b)") }
    // ground truth: a from-scratch index build over the SURVIVING corpus,
    // rolled up with the same scoring — the overlay must land exactly
    // there (class keys relabel bijectively; media pairs are invariant)
    val rebuild = java.nio.file.Files.createTempDirectory("frameidx278").toString
    Multimodal.buildFrameIndex(spark,
      graft.Tables.documents(spark, sf)
        .where(col("doc_id") % 7 =!= 1)
        .select(col("doc_id").as("media_id"), col("text")), rebuild)
    val occ = spark.read.parquet(s"$rebuild/occ").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = spark.read.parquet(s"$rebuild/pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val classes = spark.read.parquet(s"$rebuild/classes").collect()
      .map(_.getAs[Long]("keeper")).toSet
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) } ++
      classes.map(k => (k, k))
    val byKeeper = occ.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val want = sym.toSeq.flatMap { case (ka, kb) =>
      for {
        ma <- byKeeper.getOrElse(ka, Set.empty[Long])
        mb <- byKeeper.getOrElse(kb, Set.empty[Long])
        if ma < mb
      } yield ((ma, mb), (math.min(ka, kb), math.max(ka, kb)))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(got === want)
    // plan: compacted index + broadcast tombstone anti-join; documents
    // is touched ONLY for the doc_id-projected forget list — no text
    // column (erased content is never re-read), no BNLJ
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-compact-frame-index"), plan.take(1500))
    assert(plan.contains("LeftAnti"), "q278 must overlay tombstones")
    assert(!plan.contains("text"),
      "q278 must not read media content — erasure compliance")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    graft.Tables.deleteRecursively(new java.io.File(rebuild))
  }

  test("q287 tombstone-folded index: probe bit-equal to q278, classes live, pure index-read plan") {
    val res = Multimodal.queries("q287_erasure_compacted_rollup")(spark, sf)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the fold preserves the probe EXACTLY: dropped classes/pairs had
    // zero surviving occurrences, so the folded roll-up == the overlay
    val overlay = Multimodal.queries("q278_erased_media_rollup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === overlay && got.nonEmpty)
    // folded files carry no erased media and no dead class anywhere
    val idx = Multimodal.ensureErasureCompactedFrameIndex(spark, sf)
    val erased = Multimodal.mediaTombstones(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val occ = spark.read.parquet(s"$idx/occ").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    occ.foreach { case (m, _) =>
      assert(!erased(m), s"erased media $m survived the fold") }
    val liveKeepers = occ.map(_._2).toSet
    val classKeepers = spark.read.parquet(s"$idx/classes")
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert(classKeepers === liveKeepers,
      "folded classes diverge from the occurrence-live keeper set")
    spark.read.parquet(s"$idx/pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).foreach { case (a, b) =>
        assert(liveKeepers(a) && liveKeepers(b), s"dead-class pair ($a, $b)") }
    // and the fold genuinely dropped something (dead classes exist at
    // this sf — the forget set owned sole-occurrence content)
    val preKeepers = spark.read.parquet(
        s"${Multimodal.ensureCompactedFrameIndex(spark, sf)}/classes")
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert((preKeepers -- classKeepers).nonEmpty,
      "no dead class at this sf — the fold path is untested")
    // pure index reads: no anti-join, no documents scan at all
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-erased-frame-index"), plan.take(1500))
    assert(!plan.contains("LeftAnti"), "fold must delete the overlay cost")
    assert(!plan.contains("documents"), "folded probe must be index-only")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q305 stream frame index: one-flip multi-relation commits, O(batch) deltas, roll-up == q249") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams
    val table = Multimodal.ensureFrameStreamIndex(spark, sf)
    assert(ManifestStore.committedManifest(table).contains(2L))
    // one manifest names ALL THREE relations' deltas per batch — the
    // single-flip multi-relation commit (no occ/pairs tear possible)
    val members = ManifestStore.manifestMembers(table, 2L)
    assert(members.size === 9, members.toString)
    for (b <- 0 to 2; rel <- Seq("classes", "occ", "pairs"))
      assert(members.contains(s"$rel:delta-v$b-$rel"), members.toString)
    // O(batch) commit: batch 1's occ delta carries only bucket-1 media
    val occ1 = spark.read.parquet(table.resolve("delta-v1-occ").toString)
      .select("media_id").distinct().collect().map(_.getLong(0))
    assert(occ1.nonEmpty && occ1.forall(_ % 3 == 1))
    // hits are never re-signed: class deltas are frame-disjoint across
    // batches (repeated content unified with its stored class instead)
    val f0 = spark.read.parquet(table.resolve("delta-v0-classes").toString)
      .select("frame").collect().map(_.getString(0)).toSet
    val f1 = spark.read.parquet(table.resolve("delta-v1-classes").toString)
      .select("frame").collect().map(_.getString(0)).toSet
    assert(f0.nonEmpty && f1.nonEmpty && f0.intersect(f1).isEmpty)
    // every near-dup class pair lands exactly once across all deltas
    val pairs = ManifestStore.manifestSnapshotRel(spark, table, "pairs").get
      .collect().map(_.toString)
    assert(pairs.length === pairs.distinct.length)
    // the roll-up from the stream store is exactly q249's
    val got = Multimodal.queries("q305_stream_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q249 = Multimodal.queries("q249_media_near_dup")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q249 && got.nonEmpty)
  }

  test("q306/q307 stream-frame erasure + changelog: overlay == q278, delta-only read") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams
    // erasure: no erased media either side, output == q278's overlay
    val res = Multimodal.queries("q306_erased_stream_frame_index")(spark, sf)
    val got = res.collect().map(_.toString).sorted.toSeq
    res.collect().foreach { r =>
      assert(r.getLong(0) % 7 != 1 && r.getLong(1) % 7 != 1,
        s"erased media leaked: $r") }
    val q278 = Multimodal.queries("q278_erased_media_rollup")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === q278 && got.nonEmpty)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    assert(plan.contains("graft-frame-stream-idx"), plan.take(1500))
    // changelog: the occ-scoped incremental read opens ONLY batch 2's
    // occ delta — no classes, no pairs, no earlier batches
    val table = Multimodal.ensureFrameStreamIndex(spark, sf)
    val files = ManifestStore.manifestChangesRel(spark, table, "occ", 1L, 2L)
      .inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("delta-v2-occ")),
      files.toString)
    val chg = Multimodal.queries("q307_frame_store_changelog")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(chg.nonEmpty && chg.forall(_._1 % 3 == 2))
  }

  test("q313/q314 frame-store folds: per-relation bases behind one flip, purged occ, roll-ups bit-equal") {
    import org.apache.spark.sql.functions._
    // ── q314: the FOLDED store (foldAfter=2 → batch 2's commit folds
    // all three relations) serves q305's roll-up bit-for-bit ──
    val got314 = Multimodal.queries("q314_folded_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got305 = Multimodal.queries("q305_stream_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got314 === got305 && got314.nonEmpty)
    val tf = Multimodal.ensureFoldedFrameStreamIndex(spark, sf)
    val curF = ManifestStore.committedManifest(tf).get
    val mf = ManifestStore.manifestMembers(tf, curF)
    assert(mf.size === 3 && mf.forall(_.contains(":base-v")), mf.toString)
    Seq("classes", "occ", "pairs").foreach { rel =>
      assert(mf.count(_.startsWith(s"$rel:")) === 1,
        s"relation $rel must resolve from exactly one folded base: $mf") }

    // ── q313: the ERASURE-FOLDED store — occ purged once, classes and
    // pairs carried over, roll-up == q306's overlay roll-up ──
    val got313 = Multimodal.queries("q313_erasure_folded_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got306 = Multimodal.queries("q306_erased_stream_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got313 === got306 && got313.nonEmpty)
    val te = Multimodal.ensureErasureFoldedFrameStreamIndex(spark, sf)
    val curE = ManifestStore.committedManifest(te).get
    val me = ManifestStore.manifestMembers(te, curE)
    val occBase = me.find(_.startsWith("occ:base-e"))
      .getOrElse(fail(s"occ must resolve from a purged base: $me"))
      .stripPrefix("occ:")
    assert(me.count(_.startsWith("classes:")) === 3 &&
      me.count(_.startsWith("pairs:")) === 3,
      s"untouched relations must carry their delta members over: $me")
    // zero tombstoned media in the purged occ FILES
    assert(spark.read.parquet(te.resolve(occBase).toString)
      .where(col("media_id") % 7 === 1).count() === 0L,
      "erased media's occurrences must be physically gone")
    // and the roll-up plans no tombstone overlay
    val plan = Multimodal.queries("q313_erasure_folded_frame_index")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), plan.take(1500))
  }

  test("q330 rel delete-file commit: roll-up == q306, ~occ ledger line, erased rows physically present") {
    import org.apache.spark.sql.functions._
    // the probe carries NO tombstone logic, yet lands on q306's
    // surviving-corpus answer — the committed `~occ:` member does the
    // work below every consumer
    val got330 = Multimodal.queries("q330_delete_file_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got306 = Multimodal.queries("q306_erased_stream_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got330 === got306 && got330.nonEmpty)
    val t = Multimodal.ensureDeleteFileFrameStreamIndex(spark, sf)
    val members = ManifestStore.manifestMembers(t,
      ManifestStore.committedManifest(t).get)
    assert(members.last === "~occ:del-v3-occ", members.toString)
    assert(members.count(_.startsWith("classes:")) === 3 &&
      members.count(_.startsWith("pairs:")) === 3,
      s"sibling relations must be untouched by the delete commit: $members")
    // merge-on-read: the erased media's occ rows are STILL in the
    // delta files (logical delete — physical erasure is the fold's
    // job, q313), but the RESOLVE subtracts them
    val rawErased = (0 to 2).map(i => spark.read
        .parquet(t.resolve(s"delta-v$i-occ").toString)
        .where(col("media_id") % 7 === 1).count()).sum
    assert(rawErased > 0L, "delete files are logical until a fold")
    assert(ManifestStore.manifestSnapshotRel(spark, t, "occ").get
      .where(col("media_id") % 7 === 1).count() === 0L)
  }

  test("q321 content-GC erasure: no erased media, no orphan classes, no dangling pairs, roll-up == q306") {
    import org.apache.spark.sql.functions._
    val got321 = Multimodal.queries("q321_content_erased_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got306 = Multimodal.queries("q306_erased_stream_frame_index")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got321 === got306 && got321.nonEmpty)
    val t = Multimodal.ensureContentErasedFrameStreamIndex(spark, sf)
    val cur = ManifestStore.committedManifest(t).get
    val members = ManifestStore.manifestMembers(t, cur)
    assert(members.size === 3 && members.forall(_.contains(":base-e")),
      members.toString)
    def base(rel: String) = spark.read.parquet(t.resolve(
      members.find(_.startsWith(s"$rel:")).get.stripPrefix(s"$rel:")).toString)
    // (a) zero tombstoned media in the occurrence files
    assert(base("occ").where(col("media_id") % 7 === 1).count() === 0L)
    // (b) every surviving class has a surviving occurrence — content
    // that lived only in erased media is GONE from the files
    assert(base("classes").join(base("occ").select("keeper").distinct(),
      Seq("keeper"), "left_anti").count() === 0L,
      "orphaned class content survived the content GC")
    // (c) no pair references a dropped class
    val keepers = base("classes").select("keeper")
    assert(base("pairs").join(keepers.withColumnRenamed("keeper", "keeper_a"),
      Seq("keeper_a"), "left_anti").count() === 0L)
    assert(base("pairs").join(keepers.withColumnRenamed("keeper", "keeper_b"),
      Seq("keeper_b"), "left_anti").count() === 0L)
  }

  test("q309 multi-relation time travel: consistent prefix, no bucket-2 media, delta-v2-free plan") {
    import graft.streaming.Streams
    val res = Multimodal.queries("q309_time_travel_frame_store")(spark, sf)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // the travelled read answers over buckets 0+1 only
    rows.foreach { r =>
      assert(r.getLong(0) % 3 != 2 && r.getLong(1) % 3 != 2,
        s"bucket-2 media leaked into the v1 read: $r") }
    // all three relations come from the SAME manifest: nothing of
    // batch 2's deltas enters the plan, for any relation
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-frame-stream-idx"), plan.take(1500))
    assert(!plan.contains("delta-v2"),
      "v1 read touched batch 2's delta\n" + plan.take(1500))
    // prefix completeness: v1's occ is exactly the buckets-0+1 media
    val table = Multimodal.ensureFrameStreamIndex(spark, sf)
    val v1Media = ManifestStore.manifestSnapshotRelAt(spark, table, "occ", 1L).get
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet
    assert(v1Media.nonEmpty && v1Media.forall(_ % 3 != 2))
  }

  test("q249 media near-dup: scores equal a local recompute, BNLJ-free plan") {
    import org.apache.spark.sql.functions._
    val res = Multimodal.mediaNearDup(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // local ground truth: contents per media, near/exact evidence pairs,
    // score = distinct unordered evidence content-pairs spanning the two
    val fb = Multimodal.StubCodec.FrameBytes
    val occRows = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        (0 until text.length / fb).map(k =>
          (text.substring(k * fb, (k + 1) * fb), id, id * 4294967296L + k))
      }
    val keeperOf = occRows.groupBy(_._1).map { case (f, ks) =>
      f -> ks.map(_._3).min }
    val contentsByMedia = occRows.groupBy(_._2).map { case (m, rs) =>
      m -> rs.map(r => keeperOf(r._1)).toSet }
    val sigOf = occRows.groupBy(r => keeperOf(r._1)).map { case (k, rs) =>
      k -> Multimodal.frameSignature(rs.head._1) }
    val ks = sigOf.keys.toArray.sorted
    val near = (for {
      i <- ks.indices.iterator
      j <- (i + 1) until ks.length
      if java.lang.Long.bitCount(sigOf(ks(i)) ^ sigOf(ks(j))) <= 3
    } yield (ks(i), ks(j))).toSet
    val medias = contentsByMedia.keys.toSeq.sorted
    val expected = (for {
      i <- medias.indices.iterator
      j <- (i + 1) until medias.length
      (a, b) = (medias(i), medias(j))
      ca = contentsByMedia(a); cb = contentsByMedia(b)
      evidence = ca.intersect(cb).map(k => (k, k)) ++
        near.filter { case (x, y) =>
          (ca(x) && cb(y)) || (ca(y) && cb(x)) }
      if evidence.size >= 2
    } yield (a, b) -> evidence.size.toLong).toMap
    assert(got === expected)
  }
}
