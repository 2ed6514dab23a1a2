package graft.sim

import graft.{SparkSpec, Tables}

class SimSpec extends SparkSpec {

  test("brute-force knn returns 5 ranked neighbors per query, qcos in [-1,1]") {
    val rows = SimQueries.knnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === 5)
      assert(rs.map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      rs.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    }
  }

  test("ivf knn (nprobe=8 of 16 cells) achieves pinned recall vs brute force") {
    val brute = SimQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimQueries.knnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    info(f"ivf recall@5 = $recall%.2f")
    // deterministic: seeded init + fixed Lloyd rounds on a fixed corpus
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
  }

  test("incremental ivf ingest: pinned recall vs full brute on batch queries, index probed not rebuilt") {
    import org.apache.spark.sql.functions._
    val brute = SimQueries.knnBrute(spark, sf)
      .where(col("q_id") % 3 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val res = SimQueries.incrementalIvf(spark, sf)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "no batch query at this sf")
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"incremental ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    // probe-only economics: old assignments come from the persisted
    // index, and no centroid retraining appears anywhere in the plan —
    // the embeddings scans left are the batch assign + the two rerank
    // embedding fetches
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-index"), plan.take(1500))
    // the RAW ingest (the bench form) is all equi joins — the BNLJ in
    // the registered audit form is knnBrute's sanctioned reference shape
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    // every query is a batch member and every answer rank set is full
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.keys.forall(q => q % 3 == 0 && q % 100 == 0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5)) }
  }

  test("ivf erasure overlay + compaction: tombstones gone, probes bit-equal, pinned recall") {
    import org.apache.spark.sql.functions._
    // reference: surviving-corpus brute top-5 on surviving batch queries
    val brute = SimQueries.knnBruteSurviving(spark, sf)
      .where(col("q_id") % 3 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "no surviving batch query at this sf")
    val erased = SimQueries.ivfTombstones(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(erased.nonEmpty, "forget set empty at this sf")
    // q279: overlay probe — erased ids can never surface, recall holds
    val overlay = SimQueries.erasureIvf(spark, sf)
    val got279 = overlay.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got279.foreach { case (q, n, _) =>
      assert(!erased(q) && !erased(n), s"erased id in q279 output: ($q, $n)") }
    val pairs279 = got279.map { case (q, n, _) => (q, n) }
    val recall = brute.count(pairs279.contains).toDouble / brute.size
    info(f"erasure ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    // overlay plan: stored index + broadcast tombstone anti-join, no BNLJ
    val plan279 = overlay.queryExecution.executedPlan.toString
    assert(plan279.contains("graft-ivf-index"), plan279.take(1500))
    assert(plan279.contains("LeftAnti"), "q279 must overlay tombstones")
    assert(!plan279.contains("BroadcastNestedLoopJoin") &&
      !plan279.contains("CartesianProduct"), plan279.take(1200))
    // the compacted index carries ZERO tombstoned (or non-surviving) rows
    // and exactly the overlay's assignment set
    val idx = SimQueries.ensureCompactedIvfIndex(spark, sf)
    val assigned = spark.read.parquet(s"$idx/assigned").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(assigned.nonEmpty)
    assigned.foreach { case (v, _) =>
      assert(v % 7 != 1, s"tombstoned vec $v survived compaction") }
    // centroids copied verbatim — compaction never retrains
    val oldIdx = SimQueries.ensureIvfIndex(spark, sf)
    assert(spark.read.parquet(s"$idx/centroids").collect().map(_.toString).sorted.toSeq ===
      spark.read.parquet(s"$oldIdx/centroids").collect().map(_.toString).sorted.toSeq)
    // q280: the compacted probe is BIT-EQUAL to the overlay probe and
    // its plan has no anti-join and no batch re-assignment left
    val compacted = SimQueries.compactedIvf(spark, sf)
    val got280 = compacted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got280 === got279, "compacted probe diverges from overlay probe")
    val plan280 = compacted.queryExecution.executedPlan.toString
    assert(plan280.contains("graft-ivf-compact"), plan280.take(1500))
    assert(!plan280.contains("LeftAnti"),
      "compacted probe must not re-apply tombstones")
    assert(!plan280.contains("BroadcastNestedLoopJoin") &&
      !plan280.contains("CartesianProduct"), plan280.take(1200))
  }

  test("ivf retrain-and-swap: pointer flipped, v1 intact, codebook moved, pinned recall") {
    import org.apache.spark.sql.functions._
    val idx = SimQueries.ensureRetrainedIvfIndex(spark, sf)
    // swap visibility: CURRENT names v2, and v1 is the shipped index
    // verbatim — a reader resolving before the flip would have served
    // exactly what production serves today
    assert(SimQueries.retrainCurrent(idx) === "v2")
    val oldIdx = SimQueries.ensureIvfIndex(spark, sf)
    assert(spark.read.parquet(s"$idx/v1/centroids").collect()
        .map(_.toString).sorted.toSeq ===
      spark.read.parquet(s"$oldIdx/centroids").collect()
        .map(_.toString).sorted.toSeq, "v1 codebook is not the shipped one")
    assert(spark.read.parquet(s"$idx/v1/assigned").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet ===
      spark.read.parquet(s"$oldIdx/assigned").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet,
      "v1 assignments are not the shipped ones")
    // the retrain genuinely moved the codebook (it sees the drifted,
    // grown corpus; v1 was trained on the old population only)
    val c1 = spark.read.parquet(s"$idx/v1/centroids").collect()
      .map(_.toString).sorted.toSeq
    val c2 = spark.read.parquet(s"$idx/v2/centroids").collect()
      .map(_.toString).sorted.toSeq
    assert(c1 !== c2, "retrain did not move the centroids")
    // v2 assignments cover the FULL grown corpus, one row per vector
    val n = Tables.embeddings(spark, sf).count()
    assert(spark.read.parquet(s"$idx/v2/assigned").count() === n)
    // raw probe: pinned recall vs full-corpus brute, BNLJ-free, and the
    // plan reads v2 only — nothing of v1 leaks through the pointer
    val raw = SimQueries.retrainedIvf(spark, sf)
    val got = raw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimQueries.queries("q45_knn_brute")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"retrained ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-retrain") && plan.contains("v2"),
      plan.take(1500))
    assert(!plan.contains("/v1/"), "swapped-away v1 leaked into the probe")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    // audited registered form carries a TRUE recall bit
    assert(SimQueries.queries("q294_retrained_ivf")(spark, sf)
      .collect().head.getBoolean(2), "audit recall bit is false")
  }

  test("q316 drift-aware retrain: measured trigger, no-retrain serves v1 untrained, drifted fixture swaps to v2") {
    import org.apache.spark.sql.functions._
    // ── shipped corpus: drift under threshold → the NO-RETRAIN branch ──
    val idx = SimQueries.ensureDriftAwareIvfIndex(spark, sf)
    val drift = SimQueries.storedDriftPpm(idx)
    info(s"measured drift = $drift (threshold ${SimQueries.DriftRetrainThresholdPpm})")
    assert(drift < SimQueries.DriftRetrainThresholdPpm,
      "shipped corpus must sit under the retrain trigger")
    assert(SimQueries.retrainCurrent(idx) === "v1")
    assert(!new java.io.File(s"$idx/v2").exists(),
      "no-retrain branch must not have trained anything")
    // v1 IS the unswapped serving state: the shipped codebook verbatim,
    // assignments = shipped ∪ ingested third (one row per grown vector)
    val oldIdx = SimQueries.ensureIvfIndex(spark, sf)
    assert(spark.read.parquet(s"$idx/v1/centroids").collect()
        .map(_.toString).sorted.toSeq ===
      spark.read.parquet(s"$oldIdx/centroids").collect()
        .map(_.toString).sorted.toSeq,
      "no-retrain branch must serve the shipped codebook bit-for-bit")
    val n = Tables.embeddings(spark, sf).count()
    assert(spark.read.parquet(s"$idx/v1/assigned").count() === n)
    // probe through the pointer: pinned recall, v1-only plan, audit TRUE
    val raw = SimQueries.driftAwareIvf(spark, sf)
    val got = raw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimQueries.queries("q45_knn_brute")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"drift-aware ivf recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("graft-ivf-driftaware") && plan.contains("/v1/"),
      plan.take(1500))
    assert(!plan.contains("/v2/"), "no-retrain probe must read v1 only")
    assert(SimQueries.queries("q316_drift_aware_retrain")(spark, sf)
      .collect().head.getBoolean(2), "audit recall bit is false")

    // ── drifted fixture: ingested third shifted +5% of a unit per dim
    // → trigger fires, q294's retrain-and-swap runs, pointer lands on
    // a freshly trained v2 covering the full fixture corpus ──
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Tables.scratchDir), "graft-driftfix-")
    try {
      val shifted = Tables.embeddings(spark, sf).select(col("vec_id"),
        when(col("vec_id") % 3 === 0,
            expr("transform(embedding, x -> x + CAST(0.05 AS FLOAT))"))
          .otherwise(col("embedding")).as("embedding"))
      val d2 = SimQueries.buildDriftAwareIndex(spark, tmp.toString, oldIdx, shifted)
      info(s"fixture drift = $d2")
      assert(d2 >= SimQueries.DriftRetrainThresholdPpm,
        "constructed drift must clear the trigger")
      assert(SimQueries.retrainCurrent(tmp.toString) === "v2")
      assert(spark.read.parquet(s"${tmp.toString}/v2/assigned").count() === n)
      // the retrain genuinely moved the codebook toward the drifted data
      assert(spark.read.parquet(s"${tmp.toString}/v1/centroids").collect()
          .map(_.toString).sorted.toSeq !==
        spark.read.parquet(s"${tmp.toString}/v2/centroids").collect()
          .map(_.toString).sorted.toSeq)
    } finally graft.Tables.deleteRecursively(tmp.toFile)
  }

  test("ANN audit oracles: corpus density makes the 5-per-query eval-pair count exact") {
    import org.apache.spark.sql.functions._
    // the DuckDB oracles for every knnAudit-gated query compute
    // n_queries as a plain count of anchored ids and n_eval_pairs as
    // 5 × that — exact ONLY if every anchored query has >= 5 eligible
    // neighbors, i.e. the (surviving) corpus holds >= 6 vectors. Pin
    // the density for the tightest population (the erasure probes'
    // surviving corpus) at the spec sf; corpora only grow with sf, so
    // the shipped sfs inherit the bound.
    val surviving = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 7 =!= 1).count()
    assert(surviving >= 6,
      s"surviving corpus too thin ($surviving) for the x5 oracle arithmetic")
    // and every anchored population is non-empty (a zero-query audit
    // would hash-match trivially)
    assert(Tables.embeddings(spark, sf)
      .where(col("vec_id") % 100 === 0).count() > 0)
  }

  test("lsh embedding pairs: subset of exact pairs (no false positives), pinned recall") {
    val exact = SimQueries.embeddingPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimQueries.embeddingPairsLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // rerank is exact, so every emitted pair must also be an exact pair
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    info(f"lsh pair recall@cos0.25 = $recall%.2f (Hamming-1 multi-probe; see scaladoc)")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
  }

  test("lsh pair/knn plans never fall back to a nested-loop or cartesian join") {
    Seq(SimQueries.embeddingPairsLsh(spark, sf), SimQueries.knnLsh(spark, sf))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
        assert(!plan.contains("CartesianProduct"), plan)
      }
  }

  test("lsh knn candidates achieve nontrivial recall vs brute force") {
    val brute = SimQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimQueries.knnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    info(f"lsh recall@5 = $recall%.2f (Hamming-1 multi-probed candidates, ranked by true cosine)")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
  }

  test("semdedup drops are exact duplicates with >= 0.9 recall of the exact set") {
    val sem = SimQueries.semDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(sem.length.toLong === total) // one verdict per vector
    val semDropped = sem.filter(_._2).map(_._1).toSet
    val exactDropped = SimQueries.embeddingPairs(spark, sf).collect()
      .map(_.getLong(1)).toSet
    // precision 1.0 by construction: every drop is backed by an exact
    // same-cell cosine comparison
    assert(semDropped.subsetOf(exactDropped),
      s"false drops: ${(semDropped -- exactDropped).take(5)}")
    val recall = (semDropped & exactDropped).size.toDouble / exactDropped.size
    info(f"semdedup drop recall = $recall%.2f (k=8 cells, dual assignment)")
    assert(recall >= 0.9, f"recall $recall%.2f below floor")
  }

  test("ivf-pq knn (8x32 codes, ADC + exact rerank) achieves pinned recall vs brute force") {
    val brute = SimQueries.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimQueries.knnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(pq.contains).toDouble / brute.size
    info(f"ivf-pq recall@5 = $recall%.2f (nprobe=10, ADC top-200 reranked exactly)")
    // deterministic: hashed-id init + fixed Lloyd rounds on a fixed
    // corpus. Knobs swept at sf0.1 (Scratch sweep, r09): nprobe is the
    // binding constraint, not the ADC cut — 0.88/0.92/0.86 measured at
    // sf0.001/0.01/0.1 with nprobe=10, rerank=200
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    val pqAudit = SimQueries.knnPqChecked(spark, sf).collect().head
    assert(pqAudit.getLong(0) > 0 && pqAudit.getBoolean(2), s"pq audit red: $pqAudit")
  }

  test("filtered knn: label-homogeneous, pinned recall vs the filtered brute, BNLJ-free") {
    import org.apache.spark.sql.functions._
    val labels = graft.Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val brute = SimQueries.knnBruteFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    // the exact reference honors the predicate
    brute.foreach { case (q, n) => assert(labels(q) === labels(n)) }
    val got = SimQueries.knnLshFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // prefiltering: every returned neighbor satisfies the predicate
    got.foreach { case (q, n) =>
      assert(labels(q) === labels(n), s"cross-label neighbor ($q, $n)")
    }
    val recall = brute.count(got.contains).toDouble / brute.size
    info(f"filtered knn recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"recall $recall%.2f below floor")
    // approximate core stays a bucket equi-join
    val plan = SimQueries.knnLshFiltered(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    val audit = SimQueries.knnLshFilteredChecked(spark, sf).collect().head
    assert(audit.getLong(0) > 0 && audit.getBoolean(2),
      s"filtered knn audit red: $audit")
  }

  test("registered ANN audit forms render their recall/precision pins as TRUE bits") {
    val lsh = SimQueries.knnLshChecked(spark, sf).collect().head
    assert(lsh.getLong(0) > 0 && lsh.getBoolean(2), s"knnLsh audit red: $lsh")
    val ivf = SimQueries.knnIvfChecked(spark, sf).collect().head
    assert(ivf.getBoolean(2), s"knnIvf audit red: $ivf")
    val pairs = SimQueries.embeddingPairsLshChecked(spark, sf).collect().head
    assert(pairs.getLong(0) > 0 && pairs.getBoolean(1), s"pair audit red: $pairs")
    val sem = SimQueries.semDedupChecked(spark, sf).collect().head
    assert(sem.getLong(1) > 0 && sem.getBoolean(2) && sem.getBoolean(3),
      s"semdedup audit red: $sem")
  }

  test("hybrid search: lexical gate feeds the vector rerank, both live") {
    val rows = SimQueries.hybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.map(_._4).sorted.toSeq === (1 to 10))
    assert(!rows.exists(_._1 == 0L)) // the query doc never retrieves itself
    // ranked by cosine (the SECOND stage), descending with id tie-break
    val byRank = rows.sortBy(_._4)
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    case _ => }
    // lexical gate: every hit shares a term with the query doc
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
      .toMap
    val q = docs(0L)
    rows.foreach { case (id, bm, _, _) =>
      assert((docs(id) & q).nonEmpty && bm > 0, s"doc $id passed without overlap")
    }
    // the rerank REORDERS: cosine order differs from bm25 order
    assert(byRank.map(_._2).toSeq != byRank.map(_._2).sortBy(-(_: Long)).toSeq)
  }

  test("rrf fusion: scores recompute from the leg ranks, ordering consistent") {
    val rows = SimQueries.rrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._5).sorted.toSeq === (1L to 10L))
    assert(!rows.exists(_._1 == 0L)) // query doc never retrieves itself
    rows.foreach { case (id, lex, vec, rrf, _) =>
      val expect =
        (if (lex > 0) 1000000L / (60L + lex) else 0L) +
          (if (vec > 0) 1000000L / (60L + vec) else 0L)
      assert(rrf === expect, s"doc $id rrf score drifted from its ranks")
      assert(lex > 0 || vec > 0, s"doc $id fused from no ranking")
      assert(lex <= 50 && vec <= 50)
    }
    // fused order: rrf desc with doc_id tie-break
    val byRank = rows.sortBy(_._5)
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
    // consensus wins: docs ranked by BOTH systems are live in the top-10
    assert(rows.exists(r => r._2 > 0 && r._3 > 0))
  }

  test("semantic decontamination equals a brute max-sim replay; both classes live") {
    val got = SimQueries.semanticDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val all = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint)) as qv")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def nrm(a: Array[Long]): Double = math.sqrt(dot(a, a).toDouble)
    val bench = all.filter(_._1 % 100 == 0)
    val corpus = all.filter(_._1 % 100 != 0)
    val want = corpus.flatMap { case (id, v) =>
      val scored = bench.map { case (bid, bv) =>
        (dot(v, bv).toDouble / (nrm(v) * nrm(bv)), bid)
      }
      val (ms, mb) = scored.minBy { case (s2, b) => (-s2, b) }
      if (ms >= 0.35) Some(id -> (mb, ms)) else None
    }.toMap
    assert(got === want)
    assert(got.nonEmpty, "no contaminated docs at the 0.35 threshold")
    assert(got.size < corpus.length, "threshold flags the whole corpus")
  }

  test("lsh decontam: no false flags, pinned recall vs the exact form, BNLJ-free plan") {
    val exact = SimQueries.semanticDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lsh = SimQueries.semanticDecontamLsh(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    // exact rerank → every LSH flag is a true flag
    assert(lsh.keySet.subsetOf(exact.keySet),
      s"false flags: ${(lsh.keySet -- exact.keySet).take(5)}")
    // the candidate max can only undershoot the global max
    lsh.foreach { case (id, s2) => assert(s2 <= exact(id) + 1e-12) }
    val recall = exact.keySet.count(lsh.contains).toDouble / exact.size
    info(f"lsh decontam flag recall = $recall%.2f (16x6-bit tables, Hamming-1 probes)")
    assert(recall >= 0.85, f"recall $recall%.2f below floor")
    val plan = SimQueries.semanticDecontamLsh(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("decontam audit form renders its precision/recall pins as TRUE bits") {
    val r = SimQueries.semanticDecontamChecked(spark, sf).collect().head
    assert(r.getLong(0) > 0, s"no anchors: $r")
    assert(r.getBoolean(2) && r.getBoolean(3), s"decontam audit red: $r")
  }

  test("mmr rerank: rank 1 is argmax relevance, set is distinct, diversification is live") {
    val rows = SimQueries.mmrRerank(spark, sf).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 5)
    assert(rows.map(_._2).distinct.length === 5, "selected docs are distinct")
    assert(rows.map(_._1).toSeq === (1 to 5), "ranks are 1..5")
    // rank 1 is the plain relevance argmax
    assert(rows.head._3 === rows.map(_._3).max)
    // the greedy must diverge from plain top-5-by-relevance somewhere:
    // either a non-top-5 doc is selected or the order is not rel-desc
    val relOrdered = rows.map(_._3).toSeq
    assert((relOrdered != relOrdered.sorted.reverse) ||
      (rows.map(_._2).toSet != rows.sortBy(-_._3).map(_._2).toSet),
      "MMR degenerated to plain top-k (no diversification observed)")
  }
}
