package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for a training-data pipeline, in increasing
  * scale-sophistication:
  *
  *  - exact: hash group-by on normalized text — one shuffle.
  *  - n-gram Jaccard: exact pairwise similarity via a shingle inverted
  *    index (self-join on shingle). Exact, but the self-join is
  *    O(candidate pairs) — the correctness baseline.
  *  - MinHash + LSH: signature → band buckets → candidates → exact
  *    verify. The 100 TB path: no all-pairs work; cost is O(n · k) for
  *    signatures plus O(candidates) for verification, and every step is a
  *    narrow shuffle on small keys.
  *  - SimHash: 64-bit sketch + 8x8-bit chunk pigeonhole for hamming ≤ 7.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Word 3-gram shingles per doc (distinct), mirroring the oracle's
    * `range(1, len-1)` 1-based construction: docs with < 3 words produce
    * no shingles.
    */
  private[graft] def shingles(docs: DataFrame): DataFrame =
    // fanOut: shingling is per-document compute — on the single-file
    // test corpus the scan alone would pin it to one task
    graft.Tables.fanOut(docs, col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 3 THEN
          |  transform(sequence(1, size(ws) - 2),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2)))
          |ELSE array() END""".stripMargin)).as("s"))
      .distinct()

  /** Exact Jaccard over a shingle inverted index: pairs sharing >= 1
    * shingle, J = |A∩B| / (|A|+|B|-|A∩B|), thresholded at 0.5.
    */
  private def jaccardPairs(dsh: DataFrame, threshold: Double): DataFrame = {
    val sizes = dsh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = dsh.select(col("doc_id").as("a_id"), col("s"))
    val b = dsh.select(col("doc_id").as("b_id"), col("s"))
    val inter = a.join(b, a("s") === b("s") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Exact dedup: group identical normalized text, keep the smallest
    * doc_id. Pure hash aggregation — one shuffle, scales linearly.
    */
  def exact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Corpus-size bound for the exact pairwise baseline — see the same
    * gate on the embedding side ([[graft.sim.SimQueries]]): the inverted
    * -index self-join is O(Σ df²), a correctness oracle, not a scale
    * path.
    */
  private[dedup] val MaxExactJaccardDocs = 100000L

  /** Exact n-gram Jaccard near-dup pairs (correctness baseline,
    * size-gated and excluded from the bench path; the registered scale
    * sibling is [[minhashLsh]], q42).
    */
  def ngramJaccard: Q = (s, d) => {
    val n = Tables.documents(s, d).count()
    require(n <= MaxExactJaccardDocs,
      s"ngramJaccard is the exact pairwise baseline; corpus has $n > " +
        s"$MaxExactJaccardDocs docs — use q42_dedup_minhash at scale")
    jaccardPairs(shingles(Tables.documents(s, d)), 0.5)
  }

  /** Prefix-filtering exact set-similarity join (AllPairs/PPJoin family):
    * the EXACT scale path for Jaccard near-dup pairs — same answer as
    * [[ngramJaccard]] (it shares q41's oracle verbatim), none of q42's
    * probabilistic miss, and none of q41's O(Σ df²) inverted-index blowup.
    *
    * Each doc's shingles are ordered by global document frequency
    * (rarest first, shingle text as tie-break — one total order shared by
    * every doc); for Jaccard τ = 0.5 only the first
    * `n - ceil(τ·n) + 1 = n div 2 + 1` shingles (the PREFIX) can witness
    * a qualifying pair: if J(A,B) ≥ τ, the smallest common shingle in
    * that order provably lands inside both prefixes. Candidates are the
    * equi join on prefix shingles only (plus the |A| ≤ |B|/τ size
    * filter), then exact verification via `array_intersect` on the full
    * per-doc shingle sets.
    *
    * Scale shape: the candidate join touches the RAREST half of each
    * doc's shingles — exactly the ones with small df — so the Σ df²
    * explosion of the naive inverted index (dominated by the most common
    * shingles) is gone, while the result stays bit-identical. This is the
    * published AllPairs/PPJoin design (Bayardo et al., WWW'07) expressed
    * as two keyed shuffles + one window; no LSH tuning, no recall knob.
    */
  def prefixJaccard: Q = (s, d) => prefixJaccardOf(Tables.documents(s, d))

  /** [[prefixJaccard]] over an arbitrary documents frame — lets the
    * incremental path (q235) build its stored old-corpus pair set from
    * a PRUNED scan (the filter reaches the source, the signBucketsOf
    * rationale).
    */
  private def prefixJaccardOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shingle strings are hashed to 64 bits at the source (q42's verify
    // trick) and NEVER shuffled as text: df-rank ties break on the hash
    // (any shared total order works), and the exact verify intersects
    // hash arrays — 8 bytes/shingle through every exchange
    val dsh = shingles(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val dfreq = dsh.groupBy("h").agg(count(lit(1)).as("df"))
    val ranked = dsh.join(dfreq, "h")
      .withColumn("i", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    // the full per-doc sets reuse ranked's doc_id partitioning (the
    // window already shuffled+sorted by doc_id — the aggregate is
    // partition-local, no extra exchange, no second shingle pass)
    val sets = ranked.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("sh"), max("n").as("n"))
    val prefix = ranked.where(col("i") <= col("n") / 2 + 1)
    // POSITIONAL filter (the PPJoin tightening over plain AllPairs,
    // r18 — guide §3 "reduce the big side before shuffling it"): a
    // candidate row matching at prefix positions (ia, ib) bounds the
    // overlap by 1 + min(na − ia, nb − ib) (every common shingle other
    // than this one sits AFTER position ia in A and ib in B under the
    // shared total order), and J ≥ 0.5 needs overlap·3 ≥ na + nb. For
    // a qualifying pair the row of its FIRST common shingle always
    // passes (there the bound is exact and ≥ the true overlap), so the
    // filter drops no qualifying pair — it only thins the candidate
    // stream entering the distinct + verify stages (measured at sf0.1:
    // candidate rows 328,852 → 131,507; distinct pairs reaching the
    // array_intersect verification 309,983 → 124,839).
    val cand = prefix.select(col("doc_id").as("a_id"), col("h"),
        col("n").as("na"), col("i").as("ia"))
      .join(prefix.select(col("doc_id").as("b_id"), col("h"),
        col("n").as("nb"), col("i").as("ib")), "h")
      .where(col("a_id") < col("b_id") &&
        col("na") * 2 >= col("nb") && col("nb") * 2 >= col("na") &&
        (least(col("na") - col("ia"), col("nb") - col("ib")) + 1) * 3 >=
          col("na") + col("nb"))
      .select("a_id", "b_id").distinct()
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("sha"),
        col("n").as("na")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("shb"),
        col("n").as("nb")), "b_id")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= 0.5)
  }

  /** One-time, idempotent materialization of the corpus shingle index —
    * the persisted state an incremental dedup pipeline maintains between
    * ingests: the (doc_id, shingle) postings plus the per-doc distinct
    * shingle counts the Jaccard denominator needs. Keyed by the corpus
    * content fingerprint (`Tables.datasetTag`) so different datasets/sfs
    * never serve each other's data and a regeneration invalidates; split
    * out of [[incrementalDedup]] (and warmed by `Scale.warmDerived`) so
    * the probe query's plan shows the production economics: the ingest
    * job READS the index, it does not re-shingle the corpus. At 100 TB
    * the index would additionally be bucketed by shingle hash (the
    * `Scale.bucketedJoin` mechanics) so nightly probes skip the
    * index-side shuffle too.
    */
  private val shingleIdxLock = new Object

  def ensureShingleIndex(s: SparkSession, d: String): String = shingleIdxLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-shingle-index-${Tables.datasetTag(d, "documents")}"
    if (!new java.io.File(s"$path/postings", "_SUCCESS").exists() ||
        !new java.io.File(s"$path/hpostings", "_SUCCESS").exists() ||
        !new java.io.File(s"$path/sizes", "_SUCCESS").exists()) {
      // layout pinned independent of the building JVM (the edge-list
      // lesson: a low-parallelism builder would cap every later probe
      // scan at its own width)
      shingles(Tables.documents(s, d))
        .repartition(32, col("s"))
        .write.mode("overwrite").parquet(s"$path/postings")
      // hashed postings: the PROBE side of the nightly ingest joins on
      // 8-byte hashes instead of shingle strings (the q190 trick — the
      // 64-bit collision risk is the sanctioned one, and the oracle
      // verifies the final pair set); string postings stay for
      // consumers that need the text
      s.read.parquet(s"$path/postings")
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
        .repartition(32, col("h"))
        .write.mode("overwrite").parquet(s"$path/hpostings")
      s.read.parquet(s"$path/postings")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(s"$path/sizes")
    }
    path
  }

  /** Incremental dedup ingest: near-dup pairs (exact Jaccard ≥ 0.5)
    * that involve a NEW document (ingest batch = doc_id % 3 == 0 —
    * live both ways at every sf), classified `new_old` (duplicate of
    * something already in the corpus → drop the new copy) vs `new_new`
    * (duplicates within the batch → keep one). This is the nightly
    * form of q41/q42: the old×old quadrant is NEVER recomputed, and
    * the corpus side is the PERSISTED inverted index
    * ([[ensureShingleIndex]]) — the probe job shingles only the batch
    * (one pruned documents scan) and equi-joins the stored postings,
    * exactly the plan a production nightly run executes. DedupSpec
    * pins the shape: one documents.parquet scan, index paths in the
    * plan.
    *
    * Scale shape: batch-shingles equi-join the corpus index on the
    * shingle key; (least, greatest, shingle) distinct canonicalizes
    * direction so within-batch pairs count once; sizes come from the
    * index's stored per-doc counts. Work is O(batch shingles · df)
    * instead of the full corpus quadrant — the q130/q181
    * partial-maintenance economics applied to dedup.
    */
  def incrementalDedup: Q = (s, d) => {
    val idx = ensureShingleIndex(s, d)
    val newSh = shingles(Tables.documents(s, d).where(col("doc_id") % 3 === 0))
      .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h"))
    val allSh = s.read.parquet(s"$idx/hpostings")
      .select(col("doc_id").as("oid"), col("h"))
    ingestProbePairs(newSh, allSh, s.read.parquet(s"$idx/sizes"),
      storeCoversBatch = true)
  }

  /** The shared nightly-probe shape (q214/q264/q272): batch shingles
    * equi-join the index postings on the 8-byte hash, direction is
    * canonicalized to (least, greatest), stored sizes supply the
    * Jaccard denominator.
    *
    * Orientation dedup (r17): a within-batch pair surfaces from the
    * h-join TWICE — (nid=a, oid=b) and (nid=b, oid=a) — whenever both
    * docs sit in batch AND store, which is why the original shape paid
    * a full `.distinct()` exchange over every candidate row before
    * counting. When the store COVERS the batch (every store except the
    * time-travel prefixes), "the mirrored row exists" reduces to
    * `oid % 3 === 0` (oid is a batch doc — the same predicate `kind`
    * already bakes in; erased ids are absent from both sides by
    * construction), so a map-side filter keeps exactly one orientation
    * and the distinct exchange disappears: (a_id, b_id, h) is unique
    * after the filter because each side's (doc, h) rows are distinct.
    * Measured 0.5–0.7 s per probe at sf0.1 across the ~14 queries
    * sharing this shape. Every registered caller satisfies coverage —
    * including the time-travel prefixes, because the probe batch IS
    * bucket 0 and every retained prefix contains bucket 0 — but the
    * guard stays explicit: a store that does NOT cover its batch
    * (pairs with a single orientation) must pass
    * `storeCoversBatch = false` to keep the distinct-based
    * canonicalization, or within-batch pairs double-count. The default
    * is therefore the SAFE path (r18, VERDICT item 7): the fast path is
    * opt-in — every covering caller asserts coverage at its own call
    * site by passing `storeCoversBatch = true`, so a future
    * non-covering store cannot silently double-count.
    */
  private[graft] def ingestProbePairs(batchSh: DataFrame, allSh: DataFrame,
      sizes: DataFrame, storeCoversBatch: Boolean = false): DataFrame = {
    val joined = batchSh.join(allSh, Seq("h"))
      .where(col("nid") =!= col("oid"))
    val canon =
      if (storeCoversBatch)
        joined.where(col("oid") % 3 =!= 0 || col("nid") < col("oid"))
          .select(least(col("nid"), col("oid")).as("a_id"),
            greatest(col("nid"), col("oid")).as("b_id"), col("h"))
      else
        joined
          .select(least(col("nid"), col("oid")).as("a_id"),
            greatest(col("nid"), col("oid")).as("b_id"), col("h"))
          .distinct()
    val inter = canon.groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"),
        when(col("a_id") % 3 === 0 && col("b_id") % 3 === 0, "new_new")
          .otherwise("new_old").as("kind"))
      .where(col("jac") >= 0.5)
  }

  /** CARRIED-SIZES probe (r18, guide §2.4): the [[ingestProbePairs]]
    * shape for stores that COVER the batch and carry the per-doc size
    * `n` on every posting row (the `shinglePostings` layout every
    * stream/WAP/contended store commits). The old shape derived the
    * Jaccard denominators from `store.select(doc_id, n).distinct()` —
    * which RE-RESOLVES the entire store (members + delete anti-joins)
    * a second time per probe (measured 0.85 s warm on q324's
    * delete-segmented store at sf0.1). Instead the store side carries
    * `n` through the h-join (+8 bytes/row) and the batch side derives
    * its own sizes from the batch shingles — identical values by
    * construction: the store's `n` for a batch doc IS the count of its
    * distinct string shingles, which is exactly `count(*)` of the
    * batch's (doc, h) rows (the hash is applied AFTER the string
    * distinct). The orientation filter guarantees one orientation per
    * pair, so na/nb are constant within each pair group and ride the
    * aggregate as `max`. Same output, bit for bit: pair set, jac, kind.
    */
  private[graft] def ingestProbePairsCarried(batchSh: DataFrame,
      allShN: DataFrame): DataFrame = {
    val bn = batchSh.groupBy("nid").agg(count(lit(1)).as("bn"))
    val joined = batchSh.join(broadcast(bn), "nid")
      .join(allShN, Seq("h"))
      .where(col("nid") =!= col("oid") &&
        (col("oid") % 3 =!= 0 || col("nid") < col("oid")))
    joined
      .select(least(col("nid"), col("oid")).as("a_id"),
        greatest(col("nid"), col("oid")).as("b_id"),
        when(col("nid") < col("oid"), col("bn")).otherwise(col("n")).as("na"),
        when(col("nid") < col("oid"), col("n")).otherwise(col("bn")).as("nb"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("c"), max("na").as("na"), max("nb").as("nb"))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"),
        when(col("a_id") % 3 === 0 && col("b_id") % 3 === 0, "new_new")
          .otherwise("new_old").as("kind"))
      .where(col("jac") >= 0.5)
  }

  /** Erasure-compliant dedup-index maintenance — the DELETE cell of the
    * dedup family's maintenance matrix (q214 is the insert-only ingest;
    * q255/q259/q262 are the IVM delete cells): a right-to-erasure batch
    * (doc_id % 7 == 1 — the q218 request-queue shape on the documents
    * subject key) is applied to the PERSISTED shingle index
    * ([[ensureShingleIndex]]) as a TOMBSTONE overlay, and the nightly
    * ingest probe (q214's plan) runs against the maintained index. The
    * output is the surviving pair set — bit-for-bit what a full
    * re-shingle of the surviving corpus would produce, which is exactly
    * what the oracle computes (the q214 oracle over `documents WHERE
    * doc_id % 7 <> 1`).
    *
    * Scale shape: erasure costs O(|tombstones|) at write time — the
    * index is NOT rewritten; the aggregate-sized tombstone list
    * broadcasts into a LEFT ANTI join on the probe's index side, and a
    * periodic compaction job (outside this query, amortized) folds
    * tombstones into the postings the way log-structured stores merge
    * delete markers. The batch side prunes erased docs AT THE SCAN
    * (pushed predicate), so no erased text is ever re-read — the
    * compliance property erasure audits check. DedupSpec pins the
    * broadcast anti-join, the index probe, that no erased id survives,
    * and equality with the surviving-corpus brute recompute.
    */
  def erasureDedupIndex: Q = (s, d) => {
    val idx = ensureShingleIndex(s, d)
    val tombstones = broadcast(erasureTombstones(s, d))
    val allSh = s.read.parquet(s"$idx/hpostings")
      .join(tombstones, Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("oid"), col("h"))
    ingestProbePairs(survivingBatchShingles(s, d), allSh,
      s.read.parquet(s"$idx/sizes"), storeCoversBatch = true)
  }

  /** The surviving ingest batch's hashed shingles — ONE definition so
    * q264 (overlay probe) and q272 (compacted probe) prove equivalence
    * over the IDENTICAL batch by construction, not by parallel edits.
    */
  private[graft] def survivingBatchShingles(s: SparkSession, d: String): DataFrame =
    shingles(Tables.documents(s, d)
      .where(col("doc_id") % 3 === 0 && col("doc_id") % 7 =!= 1))
      .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h"))

  /** Stand-in for the erasure request queue: an aggregate-sized id list
    * (production reads the queue table; the ids are what matters).
    * Shared by the q264 overlay probe and the q272 compactor so the two
    * forms provably apply the SAME forget set.
    */
  private[graft] def erasureTombstones(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).where(col("doc_id") % 7 === 1)
      .select(col("doc_id"))

  /** One-time, idempotent COMPACTION of the tombstone-overlaid shingle
    * index — the maintenance step that closes the q214→q264 lifecycle:
    * fold the accumulated tombstone overlay into the postings (the way
    * a log-structured store merges delete markers at compaction), so
    * the rewritten base carries ZERO tombstones and every later probe
    * drops the per-query anti-join. The rewrite reads ONLY index files
    * (hpostings + sizes — never the corpus text, so no erased content
    * is ever re-read: the same compliance property q264's pruned scan
    * pins), costs one index-linear pass amortized across all later
    * probes (the q151 compaction-planner economics applied to the dedup
    * index), and pins its layout like every derived artifact.
    */
  private val compactIdxLock = new Object

  def ensureCompactedShingleIndex(s: SparkSession, d: String): String =
    compactIdxLock.synchronized {
      val idx = ensureShingleIndex(s, d)
      val path =
        s"${Tables.scratchDir}/graft-shingle-compact-${Tables.datasetTag(d, "documents")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        val root = new java.io.File(path)
        if (root.exists()) Tables.deleteRecursively(root)
        val tomb = broadcast(erasureTombstones(s, d))
        s.read.parquet(s"$idx/hpostings")
          .join(tomb, Seq("doc_id"), "left_anti")
          .repartition(32, col("h"))
          .write.mode("overwrite").parquet(s"$path/hpostings")
        s.read.parquet(s"$idx/sizes")
          .join(tomb, Seq("doc_id"), "left_anti")
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").parquet(s"$path/sizes")
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** q272: the q264 nightly probe served from the COMPACTED index —
    * proof that compaction preserves probe semantics while deleting the
    * probe-time overlay cost. Identical batch, identical pair set,
    * identical oracle (the full surviving-corpus recompute); but the
    * plan reads the compacted postings with NO anti-join anywhere — the
    * tombstones were folded once at compaction time instead of being
    * re-applied by every probe forever. DedupSpec pins bit-equality
    * with q264's overlay probe, that no tombstoned id survives in the
    * compacted files, and the anti-join-free single-scan plan.
    */
  def compactedDedupProbe: Q = (s, d) => {
    val idx = ensureCompactedShingleIndex(s, d)
    val allSh = s.read.parquet(s"$idx/hpostings")
      .select(col("doc_id").as("oid"), col("h"))
    ingestProbePairs(survivingBatchShingles(s, d), allSh,
      s.read.parquet(s"$idx/sizes"), storeCoversBatch = true)
  }

  /** One-time, idempotent materialization of the OLD-corpus
    * (doc_id % 3 != 0) cluster map — the prior state q235's incremental
    * update consumes, warmed by `Scale.warmDerived` like the shingle
    * index it sits next to. Edges come from the EXACT prefix-filter
    * join (q190's machinery) restricted to old docs via a pruned scan,
    * so the stored clusters sit on the same exact-Jaccard edge family
    * as the full-recompute oracle.
    */
  /** One-time, idempotent materialization of the ingest batch's
    * verified pair set (q214's full output) — the nightly probe job
    * lands its pairs in a table once, and downstream consumers (q235's
    * cluster update today) read the |pairs|-sized parquet instead of
    * re-probing the index. q214 stays the LIVE probe job, like q190
    * beside [[ensureNearDupPairs]].
    */
  private val ingestPairsLock = new Object

  def ensureIngestPairs(s: SparkSession, d: String): String =
    Tables.ensureParquetArtifact(ingestPairsLock,
      s"${Tables.scratchDir}/graft-ingest-pairs-${Tables.datasetTag(d, "documents")}") {
      incrementalDedup(s, d).repartition(1)
    }

  private val oldClustersLock = new Object

  def ensureOldClusters(s: SparkSession, d: String): String = oldClustersLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-old-clusters-${Tables.datasetTag(d, "documents")}"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val old = Tables.documents(s, d).where(col("doc_id") % 3 =!= 0)
      propagate(old.select(col("doc_id")),
        prefixJaccardOf(old).select(col("a_id"), col("b_id")))
        .repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Incremental connected components — the q214 economics applied to
    * q88: an ingest batch (doc_id % 3 == 0) updates the STORED cluster
    * map ([[ensureOldClusters]]) instead of re-running label
    * propagation over the corpus. The batch's exact near-dup pairs
    * come from [[incrementalDedup]]'s index probe (old×old never
    * recomputed); each old endpoint is CONTRACTED to its stored
    * cluster label (one doc-keyed join), and propagation runs only on
    * the delta graph of batch docs + touched cluster representatives —
    * ingest-sized, not corpus-sized. Because a stored label is the MIN
    * doc id of its old component, the delta component's min over
    * {batch ids, touched labels} equals the full recompute's global
    * min, so the merged map is IDENTICAL to rerunning q88 on the whole
    * corpus — which is exactly what the oracle does (q88's recursive
    * CTE verbatim). Old clusters can only merge through new docs, so
    * contraction loses nothing.
    */
  def incrementalClusters: Q = (s, d) => {
    val oldMap = s.read.parquet(ensureOldClusters(s, d)) // (doc_id, label)
    // the batch pair set PROBES q214's materialized output
    // ([[ensureIngestPairs]]) instead of re-running the index probe
    val batchPairs = s.read.parquet(ensureIngestPairs(s, d))
      .select(col("a_id"), col("b_id"))
    val m = oldMap.select(col("doc_id").as("m_id"), col("label").as("m_lbl"))
    val contracted = batchPairs
      .join(m.select(col("m_id").as("a_id"), col("m_lbl").as("la")), Seq("a_id"), "left")
      .join(m.select(col("m_id").as("b_id"), col("m_lbl").as("lb")), Seq("b_id"), "left")
      .select(coalesce(col("la"), col("a_id")).as("u"),
        coalesce(col("lb"), col("b_id")).as("v"))
      .where(col("u") =!= col("v"))
      .localCheckpoint()
    val newDocs = Tables.documents(s, d)
      .where(col("doc_id") % 3 === 0).select(col("doc_id"))
    val nodes = newDocs
      .union(contracted.select(col("u").as("doc_id")))
      .union(contracted.select(col("v").as("doc_id")))
      .distinct()
    val delta = propagate(nodes, contracted)
      .select(col("doc_id").as("node"), col("label").as("new_lbl"))
    val oldFinal = oldMap.join(delta, oldMap("label") === delta("node"), "left")
      .select(oldMap("doc_id"),
        coalesce(col("new_lbl"), oldMap("label")).as("label"))
    val newFinal = newDocs.join(delta, newDocs("doc_id") === delta("node"), "left")
      .select(newDocs("doc_id"),
        coalesce(col("new_lbl"), newDocs("doc_id")).as("label"))
    clusterStats(oldFinal.union(newFinal))
  }

  /** The verbatim-window width shared by the whole substring-dedup
    * family (q225 pairs, q226 spans, q232 exposure, q236 removal) AND
    * mirrored in their DuckDB oracles — change it in one place and
    * re-derive all four oracles together.
    */
  private val SubstringW = 15

  /** Exact substring duplication (Lee et al. 2022, arXiv:2107.06499,
    * "Deduplicating Training Data Makes Language Models Better"): doc
    * pairs sharing at least one EXACT 15-token window, with the count
    * of shared distinct windows — the signal that catches verbatim
    * boilerplate/quotation reuse that whole-document Jaccard (q41/q190)
    * dilutes away: two long documents sharing one copied paragraph can
    * sit at J ≈ 0.05 and still poison a training set with a memorized
    * span.
    *
    * Scale shape: each doc explodes into its rolling 15-token windows,
    * hashed to 8 bytes AT THE SOURCE (`xxhash64` inside the transform
    * lambda — window text never shuffles) and deduped per doc; pairs
    * are one equi-join on the hash + one count aggregate. Unlike
    * single-shingle inverted indexes, 15-token windows are almost
    * always df ≤ 2 (only true verbatim reuse repeats a span that long),
    * so Σ df² stays near-linear; at 100 TB a df cap on the window table
    * (drop windows with df above a boilerplate bound before the join —
    * licence headers, templates) bounds the worst case explicitly.
    * Oracle joins the window STRINGS — the hash join must agree exactly
    * (64-bit collisions are the q190-sanctioned risk).
    */
  def substringDedup: Q = (s, d) => {
    val W = SubstringW
    val wins = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .where(size(col("ws")) >= W)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"""transform(sequence(1, size(ws) - ${W - 1}),
           |  i -> xxhash64(array_join(slice(ws, i, $W), ' ')))""".stripMargin)))
        .as("h"))
    wins.select(col("doc_id").as("a_id"), col("h"))
      .join(wins.select(col("doc_id").as("b_id"), col("h")), "h")
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  /** Per-document memorization-risk exposure — the DOC-level rollup of
    * [[substringDedup]]'s window machinery: for every doc (≥ 15
    * tokens), how many of its distinct 15-token windows appear
    * verbatim in at least one OTHER document, as a count and an exact
    * ppm share. This is the per-example score a curation pipeline
    * thresholds on (Lee et al. 2022 measure exactly this exposure);
    * the pair view (q225) says WHO shares, this says HOW MUCH of each
    * doc is shared — a doc that is 80% verbatim reuse is a removal
    * candidate even if each counterpart pair looks small.
    *
    * Scale shape: windows hash to 8 bytes at the source (text never
    * shuffles), ONE hash aggregation computes per-window document
    * frequency, one equi-join on the hash carries df back to the
    * window stream, one doc-keyed aggregation rolls up — all linear,
    * no pair materialization at all (strictly cheaper than q225: this
    * form never pays Σ df²).
    */
  def memorizationRisk: Q = (s, d) => {
    val W = SubstringW
    val wins = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .where(size(col("ws")) >= W)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"""transform(sequence(1, size(ws) - ${W - 1}),
           |  i -> xxhash64(array_join(slice(ws, i, $W), ' ')))""".stripMargin)))
        .as("h"))
    val docFreq = wins.groupBy("h").agg(count(lit(1)).as("df"))
    wins.join(docFreq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared_windows"))
      .withColumn("shared_ppm",
        expr("n_shared_windows * 1000000 div n_windows"))
  }

  /** Span-REMOVAL manifest — the step q225/q232 exist for (Lee et al.
    * remove the duplicated span, not the document): for every doc, the
    * merged token intervals covered by 15-token windows that appear
    * verbatim in another document, i.e. exactly what a surgical dedup
    * pass cuts. Window occurrences keep their POSITIONS (a span can
    * recur within one doc); overlapping [pos, pos+14] intervals merge
    * via the gaps-and-islands running-max (the q166 interval-union
    * machinery, per doc). Output: spans, tokens cut, and the exact ppm
    * of the doc they cover.
    *
    * Scale shape: same df aggregation + hash join as [[memorizationRisk]]
    * (window text hashes at the source); the island window partitions
    * by doc_id over ONLY the shared-window positions — bounded by how
    * much of each doc is duplicated, never doc length × corpus.
    */
  def spanRemoval: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val W = SubstringW
    val wins = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .where(size(col("ws")) >= W)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        explode(expr(
          s"""transform(sequence(1, size(ws) - ${W - 1}),
             |  i -> struct(i AS pos, xxhash64(array_join(slice(ws, i, $W), ' ')) AS h))"""
            .stripMargin)).as("u"))
      .select(col("doc_id"), col("n_tokens"),
        col("u.pos").as("pos"), col("u.h").as("h"))
    val docFreq = wins.select(col("doc_id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
    val shared = wins.join(docFreq.where(col("df") >= 2), "h")
      .select("doc_id", "n_tokens", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val islands = shared
      .withColumn("prev_end", max(col("pos") + (W - 1))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum("brk").over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(max("n_tokens").as("n_tokens"),
        min("pos").as("s"), (max("pos") + (W - 1)).as("e"))
    islands.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("tokens_cut"),
        max("n_tokens").as("n_tokens"))
      .withColumn("cut_ppm", expr("tokens_cut * 1000000 div n_tokens"))
  }

  /** Shared-span LOCALIZATION — [[substringDedup]] graduated from "these
    * docs share a window" to "this is the longest verbatim run": for
    * every pair sharing ≥ 1 exact 15-token window, the length in tokens
    * of their longest common substring plus the total window-match
    * count. The span length is what a curation pipeline actually cuts
    * on (a 15-token echo is quotation; a 200-token run is a licence
    * block or a mirrored article).
    *
    * The trick is all relational — no per-pair DP: a common substring
    * of M ≥ 15 tokens is EXACTLY a run of M-14 consecutive window
    * matches along one diagonal (pa - pb constant), so longest-common-
    * substring reduces to gaps-and-islands over the match table: group
    * runs by (pair, diagonal, pa - row_number), then
    * `max(run) + 14`. One windowed rank over the matches (already
    * keyed by pair) and one aggregate — the q208 island machinery
    * pointed at plagiarism spans. DedupSpec proves the reduction by
    * recomputing true LCS with quadratic DP per flagged pair.
    */
  def substringSpans: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val W = SubstringW
    val wins = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .where(size(col("ws")) >= W)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(ws) - ${W - 1}),
           |  i -> xxhash64(array_join(slice(ws, i, $W), ' ')))""".stripMargin))
        .as(Seq("pos", "h")))
    val m = wins.select(col("doc_id").as("a_id"), col("pos").as("pa"), col("h"))
      .join(wins.select(col("doc_id").as("b_id"), col("pos").as("pb"), col("h")), "h")
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "pa", "pb")
    val wDiag = Window.partitionBy(col("a_id"), col("b_id"), col("pa") - col("pb"))
      .orderBy("pa")
    m.withColumn("grp", col("pa") - row_number().over(wDiag))
      .groupBy(col("a_id"), col("b_id"),
        (col("pa") - col("pb")).as("diag"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy("a_id", "b_id")
      .agg((max("len") + lit(W - 1)).cast("long").as("max_span_tokens"),
        sum("len").as("n_window_matches"))
  }

  /** One-time, idempotent materialization of the VERIFIED exact
    * near-dup pair set — q190's full output (a_id, b_id, jac ≥ 0.5) as
    * a fingerprint-keyed derived artifact, the [[ensureShingleIndex]]
    * economics applied to the pair set itself: the prefix-filter +
    * exact-verify job runs once per corpus and every downstream
    * consumer (q217's near-dup gate, q43's audit reference; retention
    * or reporting passes tomorrow) reads the |pairs|-sized parquet
    * instead of re-running the join. q190 itself stays the live
    * computation — it IS the build job being measured.
    */
  private val nearDupLock = new Object

  def ensureNearDupPairs(s: SparkSession, d: String): String =
    Tables.ensureParquetArtifact(nearDupLock,
      s"${Tables.scratchDir}/graft-neardup-pairs-${Tables.datasetTag(d, "documents")}") {
      prefixJaccard(s, d).repartition(1)
    }

  /** Data-refinery manifest: the composed keep/drop decision for every
    * training-corpus document with its FIRST failing gate as the
    * reason, in fixed priority order — `near_dup` (larger side of an
    * exact-verified Jaccard ≥ 0.5 pair, via the scale-safe prefix-
    * filtering join), `contaminated` (shares a 4-gram with the
    * benchmark probe set — q84's rule), `low_quality` (< 30 tokens),
    * else `kept`. This is the q62 pipeline graduated to a per-document
    * audit manifest: the artifact a curation run actually ships, with
    * every drop attributable. (Exact-dup is NOT a gate: this corpus
    * has no byte-identical pairs below sf0.1, and J=1 pairs land in
    * `near_dup` anyway.)
    *
    * Scale shape: each gate is an existing scale-shaped operator
    * (q190's two keyed shuffles; q84's broadcast probe join; a
    * projection); the manifest assembles them with two left joins on
    * `doc_id`. All four reasons are live at every sf.
    */
  def refinery: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    // the near-dup gate PROBES the materialized pair artifact
    // ([[ensureNearDupPairs]]) instead of re-running the q190 join —
    // isolation-measured 4.08 s → the artifact probe leaves only the
    // contamination gate's gram scan in this plan
    val nearDup = s.read.parquet(ensureNearDupPairs(s, d))
      .select(col("b_id").as("doc_id")).distinct()
      .withColumn("nd", lit(1))
    val fdocs = Tables.fanOut(docs, col("doc_id"))
    // one shared 4-gram definition; the benchmark probe set
    // (doc_id % 97 == 0) and the corpus side slice it with pushed
    // filters. Deliberately NOT cached: materializing the full
    // (doc, distinct-gram) table costs more than the narrow re-scan it
    // saves (re-measured after the r09 bench/audit split: 3.84 s
    // uncached vs 6.00 s cached, 3-pass min at sf0.1) — the gram
    // explosion is scan-bound, and each branch prunes to its own doc
    // subset at the source.
    val allGrams = fdocs
      .withColumn("ws", filter(split(col("text"), " "), w => w =!= ""))
      .where(size(col("ws")) >= 4)
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, size(ws) - 3),
          |  i -> array_join(slice(ws, i, 4), ' '))""".stripMargin))).as("gram"))
    val bench = allGrams.where(col("doc_id") % 97 === 0)
      .select("gram").distinct()
    val contaminated = allGrams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("gram"))
      .select("doc_id").distinct()
      .withColumn("ct", lit(1))
    docs.where(col("doc_id") % 97 =!= 0)
      .withColumn("n_tokens",
        size(filter(split(col("text"), " "), w => w =!= "")))
      .join(nearDup, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("nd") === 1, "near_dup")
          .when(col("ct") === 1, "contaminated")
          .when(col("n_tokens") < 30, "low_quality")
          .otherwise("kept").as("reason"))
  }

  /** splitmix64 finalizer: full-avalanche 64-bit mix, the per-seed hash
    * family h_j(s) = mix(fnv64(s) ^ c_j).
    */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a word-3-gram (the three words + joining spaces),
    * finished with splitmix64 for full avalanche. Collisions across the
    * corpus's distinct shingles are ~n²/2⁶⁵ — irrelevant next to the LSH
    * miss probability.
    */
  @inline private def shingleHash(ws: Array[String], i: Int): Long = {
    var h = 0xCBF29CE484222325L
    @inline def mixStr(s: String): Unit = {
      var j = 0
      while (j < s.length) { h = (h ^ s.charAt(j)) * 0x100000001B3L; j += 1 }
    }
    mixStr(ws(i)); h = (h ^ ' ') * 0x100000001B3L
    mixStr(ws(i + 1)); h = (h ^ ' ') * 0x100000001B3L
    mixStr(ws(i + 2))
    mix64(h)
  }

  private val NumHashes = 48
  private val RowsPerBand = 3
  private val NumBands = NumHashes / RowsPerBand
  private val SeedConsts: Array[Long] = {
    val rnd = new scala.util.Random(7L)
    Array.fill(NumHashes)(rnd.nextLong())
  }

  /** Per-doc signature pass: tokenize, build the distinct shingle-hash
    * set, take k minhashes and fold them into band keys — all inside one
    * narrow `mapPartitions` (no shuffle). Emits
    * `(doc_id, shingle-hash array, band-key array)`; docs with < 3 words
    * get empty arrays and so never reach a bucket.
    */
  private def docSignatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val ws = text.split(' ')
          val set = new java.util.HashSet[Long]()
          var i = 0
          while (i + 2 < ws.length) { set.add(shingleHash(ws, i)); i += 1 }
          val sh = new Array[Long](set.size)
          val si = set.iterator()
          var n = 0
          while (si.hasNext) { sh(n) = si.next(); n += 1 }
          val bands =
            if (n == 0) Array.empty[Long]
            else {
              val mins = Array.fill(NumHashes)(Long.MaxValue)
              var p = 0
              while (p < n) {
                val h = sh(p)
                var j = 0
                while (j < NumHashes) {
                  val x = mix64(h ^ SeedConsts(j))
                  if (x < mins(j)) mins(j) = x
                  j += 1
                }
                p += 1
              }
              Array.tabulate(NumBands) { b =>
                var bkey = 0L
                var r = 0
                while (r < RowsPerBand) { bkey = mix64(bkey ^ mins(b * RowsPerBand + r)); r += 1 }
                bkey
              }
            }
          (id, sh, bands)
        }
      }
      .toDF("doc_id", "sh", "bands")
  }

  /** MinHash + banded LSH + exact verification.
    *
    * k=48 minhashes as 16 bands x 3 rows: at the corpus's J=0.8 oracle
    * floor a band matches w.p. 0.8³ = 0.512, so a qualifying pair is
    * missed only w.p. (1-0.512)¹⁶ ≈ 1.0e-5 (and ≈ 2.6e-8 at J=0.9);
    * verification is exact, so false positives are impossible. Random
    * pairs (J ≈ 0.02) become candidates w.p. ~16·J³ ≈ 1e-4 — a cubic
    * floor, versus the quadratic one r=2 had.
    *
    * Scale shape (the 100 TB path):
    *  - signatures are computed map-side per document — nothing the size
    *    of the (doc, shingle) relation is ever shuffled; only 16 band
    *    rows per doc move.
    *  - candidates come from an equi-join on (band, key) — never
    *    all-pairs.
    *  - verification joins candidate pairs back to the per-doc shingle
    *    arrays (equi-joins on doc id) and intersects two ~doc-sized
    *    arrays per candidate.
    *  - exact-duplicate-heavy corpora: m identical texts form J=1 pairs
    *    among themselves, so the OUTPUT is Ω(m²) by definition and the
    *    candidate join pays the same order (×bands, deduped by the
    *    distinct). At 100 TB, collapse identical texts first ([[exact]],
    *    q40) and run near-dup over the distinct texts.
    */
  def minhashLsh: Q = (s, d) => {
    val sigs = docSignatures(s, d)
    val buckets = sigs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bkey")))
    val l = buckets.select(col("doc_id").as("a_id"), col("band"), col("bkey"))
    val r = buckets.select(col("doc_id").as("b_id"), col("band"), col("bkey"))
    val cands = l.join(r, Seq("band", "bkey")).where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    // exact verification restricted to candidates: |A∩B| via
    // array_intersect of the (already-distinct) shingle-hash arrays
    val sigA = sigs.select(col("doc_id").as("a_id"), col("sh").as("sa"), size(col("sh")).as("na"))
    val sigB = sigs.select(col("doc_id").as("b_id"), col("sh").as("sb"), size(col("sh")).as("nb"))
    cands
      .join(sigA, Seq("a_id"))
      .join(sigB, Seq("b_id"))
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= 0.5)
  }

  /** SimHash near-dup: 64-bit sketch over shingle hashes; pairs with
    * hamming distance <= 7 found via the 8x8-bit chunk pigeonhole
    * (hamming <= 7 ⇒ at least one 8-bit chunk identical), so the join is
    * on chunk equality, never all-pairs. (Unrelated docs sit at hamming
    * ~32, the corpus's injected near-dups at 1-5 — wide separation.)
    */
  def simhash: Q = (s, d) => {
    import s.implicits._
    // ONE narrow pass computes each doc's sketch from its text: shingle
    // set, 64-bit shingle hashes, and the +1/-1 bit votes never leave
    // the task — the only thing shuffled afterwards is (doc_id, sketch),
    // one row per DOC, not per shingle (the q42 MinHash lesson applied).
    // Docs with no 3-shingle (< 3 words) emit nothing, as before.
    val sim = graft.Tables
      .fanOut(Tables.documents(s, d).select(col("doc_id"), col("text")), col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val ws = text.split(' ')
          if (ws.length < 3) Iterator.empty
          else {
            val seen = new java.util.HashSet[Long]()
            val counts = new Array[Int](64)
            var i = 0
            while (i + 2 < ws.length) {
              val h = shingleHash(ws, i)
              if (seen.add(h)) {
                var j = 0
                while (j < 64) {
                  if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
                  j += 1
                }
              }
              i += 1
            }
            var sh = 0L
            var j = 0
            while (j < 64) { if (counts(j) >= 0) sh |= (1L << j); j += 1 }
            Iterator.single((id, sh))
          }
        }
      }
      .toDF("doc_id", "sh")
    val chunks = sim.select(col("doc_id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 7), k -> struct(k AS k, shiftright(sh, k * 8) & 255 AS cv))")).as("ch"))
      .select(col("doc_id"), col("sh"), col("ch.k").as("k"), col("ch.cv").as("cv"))
    val a = chunks.select(col("doc_id").as("a_id"), col("sh").as("sha"), col("k"), col("cv"))
    val b = chunks.select(col("doc_id").as("b_id"), col("sh").as("shb"), col("k"), col("cv"))
    a.join(b, Seq("k", "cv")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 7)
  }

  /** Driver-audited form of [[simhash]]: the sketch graded against the
    * EXACT Jaccard pair set from [[prefixJaccard]] (q190 — scale-safe
    * AllPairs, itself exactly oracled). SimHash thresholds a different
    * similarity than Jaccard — short docs have noisy sketch bits — so
    * perfect agreement is not the contract; the audit pins recall
    * ≥ 0.8 of the exact J ≥ 0.5 pairs and a false-positive ratio
    * ≤ 0.2 of the found set (DedupSpec's bounds, driver-visible).
    * DuckDB recomputes the exact pair count and asserts both booleans
    * as literal TRUE; a sketch regression flips a bit → hash red.
    */
  def simhashChecked: Q = (s, d) => {
    val found = simhash(s, d).select(col("a_id"), col("b_id"), lit(1).as("fd"))
    val exact = s.read.parquet(ensureNearDupPairs(s, d))
      .select(col("a_id"), col("b_id"), lit(1).as("ex"))
    exact.join(found, Seq("a_id", "b_id"), "full_outer")
      .agg(sum("ex").cast("long").as("n_exact_pairs"),
        (sum(when(col("ex") === 1 && col("fd") === 1, 1L).otherwise(0L)) * 10 >=
          sum(coalesce(col("ex"), lit(0))) * 8).as("recall_ge_080"),
        (sum(when(col("fd") === 1 && col("ex").isNull, 1L).otherwise(0L)) * 5 <=
          sum(coalesce(col("fd"), lit(0)))).as("fp_ratio_le_020"))
  }

  /** Duplicate CLUSTERS from near-dup pairs — the step pair-dedup is
    * for: transitive closure of the q42 edge set, so "A≈B, B≈C" keeps
    * one document of {A,B,C}, not two. Distributed min-label
    * propagation (the standard large-scale connected-components loop,
    * cf. GraphX label propagation): every doc starts labeled with its
    * own id; each round pulls the min label across its edges; converges
    * in O(component diameter) rounds — near-dup clusters are shallow,
    * so 2-3 rounds in practice. Each round is one equi-join shuffle;
    * the driver sees only the changed-label count; lineage is cut per
    * round with an eager localCheckpoint. Output: every doc with its
    * cluster id (= min doc_id in the component), the cluster size, and
    * the keep/drop verdict a dedup pass consumes.
    *
    * Oracle: DuckDB recursive-CTE reachability over the exact Jaccard
    * edge set (same edges as q41/q42's shared oracle), min reachable id
    * per doc.
    */
  def dupClusters: Q = (s, d) => {
    val pairs = minhashLsh(s, d).select(col("a_id"), col("b_id"))
    clusterStats(propagate(
      Tables.documents(s, d).select(col("doc_id")), pairs))
  }

  /** Min-label propagation over an arbitrary node set + undirected pair
    * list — [[dupClusters]]'s loop factored out so the incremental path
    * (q235) can run it on a contracted delta graph. Returns
    * (doc_id, label) with label = min node id in the component.
    *
    * Per-round `localCheckpoint` is kept for BOTH callers: a
    * no-checkpoint variant for the tiny delta loop was measured SLOWER
    * (3.5 → 4.3 s at sf0.1 — each round's convergence count and the
    * final consumer re-derived the growing join lineage), so unlike
    * the single-plan q126 case, an iterated-with-actions loop does
    * want its per-round cut.
    */
  private def propagate(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val p = pairs.localCheckpoint()
    val edges = p.union(p.select(p.columns(1), p.columns(0)))
      .toDF("src", "dst")
    var labels = nodes
      .select(col("doc_id"), col("doc_id").as("label")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val lbl = labels.select(col("doc_id").as("n"), col("label").as("l"))
      val nbMin = edges.join(lbl, col("dst") === col("n"))
        .groupBy(col("src")).agg(min("l").as("nb_min"))
      // change detection rides the update join (shrank flag), so each
      // round is ONE join + one count over the checkpointed result — no
      // second old-vs-new join
      val nextRaw = labels.join(nbMin, labels("doc_id") === nbMin("src"), "left")
        .select(labels("doc_id"),
          least(col("label"), coalesce(col("nb_min"), col("label"))).as("label"),
          (col("nb_min") < col("label")).as("shrank"))
      val next = nextRaw.localCheckpoint()
      changed = next.where(col("shrank")).count()
      labels = next.select("doc_id", "label")
      rounds += 1
    }
    labels
  }

  /** (doc_id, label) → the q88 output shape: cluster id, size, keeper. */
  private def clusterStats(labels: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
  }

  /** Cross-source contamination matrix: [[minhashLsh]]'s verified
    * near-dup pairs rolled up per unordered source pair — which corpus
    * sources share (near-)duplicate documents, the provenance question
    * behind source weighting (q90) and decontamination (q84). Two
    * doc-id-keyed joins attach sources to the pair stream; the rollup
    * key space is |sources|². The exact checksum makes the oracle pin
    * the PAIRS, not just the counts.
    */
  def sourceOverlap: Q = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    minhashLsh(s, d).select(col("a_id"), col("b_id"))
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), Seq("b_id"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_id") + col("b_id")).as("pair_checksum"))
  }

  /** Split-leakage audit — the evaluation-integrity question: how many
    * verified near-dup pairs STRADDLE the q145 train/val/test split?
    * A test doc with a near-duplicate in train inflates eval scores
    * exactly like benchmark contamination (q84), but from WITHIN the
    * corpus; the fix is splitting by q88's cluster id instead of raw
    * doc id. The count per unordered split pair (with a checksum
    * pinning membership) quantifies the leak; same md5-threshold split
    * rule as q145, same pair stream as q42.
    */
  def splitLeakage: Q = (s, d) => {
    val split = Tables.documents(s, d).select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string")), 1, 4) < "cccc", "train")
        .when(substring(md5(col("doc_id").cast("string")), 1, 4) < "e666", "val")
        .otherwise("test").as("split"))
    minhashLsh(s, d).select(col("a_id"), col("b_id"))
      .join(split.select(col("doc_id").as("a_id"), col("split").as("pa")), Seq("a_id"))
      .join(split.select(col("doc_id").as("b_id"), col("split").as("pb")), Seq("b_id"))
      .groupBy(least(col("pa"), col("pb")).as("split_a"),
        greatest(col("pa"), col("pb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_id") + col("b_id")).as("pair_checksum"))
  }

  /** One-time, idempotent materialization of the duplicate-cluster map
    * ([[dupClusters]]'s output: doc_id → cluster_id, cluster_size) —
    * the persisted state a dedup pipeline maintains next to the
    * shingle index: connected components are recomputed when the
    * corpus changes (the fingerprint key invalidates on regeneration),
    * while downstream consumers (split assignment q229, canonical
    * selection q230) PROBE the stored map instead of re-running label
    * propagation per query. q88 itself stays the live propagation —
    * it is the iterative-operator measurement; these are its readers.
    */
  private val clustersLock = new Object

  def ensureClusters(s: SparkSession, d: String): String = clustersLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-dup-clusters-${Tables.datasetTag(d, "documents")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      dupClusters(s, d).repartition(8, col("doc_id"))
        .write.mode("overwrite").parquet(path)
    path
  }

  /** Cluster-aware train/val/test split — the FIX q147's leakage audit
    * motivates: assign the md5-threshold split (q145's rule and
    * cut-points) to the q88 CLUSTER id instead of the raw doc id, so
    * every near-dup cluster lands whole in one split and no verified
    * near-dup pair can straddle a split boundary BY CONSTRUCTION
    * (DedupSpec pins the straddle count at literal zero). Same manifest
    * shape as q145 (per source×split doc/char counts + membership
    * checksum), so the two are directly comparable; the split-share
    * drift between them is the size-biased cluster effect (big
    * clusters move together).
    *
    * Scale shape: probes the MATERIALIZED cluster map
    * ([[ensureClusters]] — label propagation runs once per corpus
    * version, not once per consumer), one doc-keyed equi-join to
    * attach source/chars, split assignment scan-local, one hash
    * aggregation. Nothing quadratic, no new shuffle key.
    */
  def clusterSplit: Q = (s, d) => {
    val cl = s.read.parquet(ensureClusters(s, d)).select("doc_id", "cluster_id")
    Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      .join(cl, Seq("doc_id"))
      .withColumn("h", substring(md5(col("cluster_id").cast("string")), 1, 4))
      .withColumn("split",
        when(col("h") < "cccc", "train")
          .when(col("h") < "e666", "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        sum("doc_id").as("id_checksum"))
  }

  /** Quality-ranked canonical selection per duplicate cluster — the
    * keep/drop verdict production dedup actually ships: q88 keeps the
    * MIN-id doc (the label-propagation fixed point), but a data
    * refinery keeps the highest-QUALITY representative; here the
    * longest doc (n_chars desc, doc_id asc tie-break — deterministic
    * total order). Output restricted to multi-doc clusters, i.e. the
    * rows where the verdict differs from "keep everything".
    *
    * Scale shape: probes the materialized cluster map
    * ([[ensureClusters]]) pruned to multi-doc clusters at the scan;
    * the ranking window partitions by cluster_id over ONLY those rows
    * — partition sizes are near-dup cluster sizes (shallow and small
    * by construction; an exact-dup-heavy corpus collapses via q40
    * first, the minhashLsh scaladoc's rule), so no single-task window
    * over row-scale data.
    */
  def clusterCanonical: Q = (s, d) => {
    val cl = s.read.parquet(ensureClusters(s, d))
      .where(col("cluster_size") > 1)
      .select("doc_id", "cluster_id", "cluster_size")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id"))
    cl.join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .select(col("cluster_id"), col("doc_id"), col("n_chars"),
        col("cluster_size"), (col("rk") === 1).as("is_canonical"))
  }

  val queries: Map[String, Q] = Map(
    "q144_source_overlap" -> sourceOverlap,
    "q147_split_leakage" -> splitLeakage,
    "q229_cluster_split" -> clusterSplit,
    "q230_cluster_canonical" -> clusterCanonical,
    "q40_dedup_exact" -> exact,
    "q41_dedup_jaccard" -> ngramJaccard,
    "q190_prefix_jaccard" -> prefixJaccard,
    "q214_incremental_dedup" -> incrementalDedup,
    "q264_erasure_dedup_index" -> erasureDedupIndex,
    "q272_compacted_dedup_probe" -> compactedDedupProbe,
    "q217_refinery" -> refinery,
    "q42_dedup_minhash" -> minhashLsh,
    "q43_dedup_simhash" -> simhashChecked,
    "q225_substring_dedup" -> substringDedup,
    "q232_memorization_risk" -> memorizationRisk,
    "q235_incremental_clusters" -> incrementalClusters,
    "q236_span_removal" -> spanRemoval,
    "q226_substring_spans" -> substringSpans,
    "q88_dup_clusters" -> dupClusters)

  private val survivingProbeOracle =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') ws
      |              FROM documents WHERE doc_id % 7 <> 1),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM words),
      |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
      |sizes AS (SELECT doc_id, count(*) n FROM dsh GROUP BY 1),
      |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
      |          FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT a_id, b_id, CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jac,
      |  CASE WHEN a_id % 3 = 0 AND b_id % 3 = 0 THEN 'new_new'
      |       ELSE 'new_old' END AS kind
      |FROM inter
      |JOIN sizes na ON na.doc_id = a_id
      |JOIN sizes nb ON nb.doc_id = b_id
      |WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5
      |  AND (a_id % 3 = 0 OR b_id % 3 = 0)""".stripMargin

  private val jaccardOracle =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM words),
      |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
      |sizes AS (SELECT doc_id, count(*) n FROM dsh GROUP BY 1),
      |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
      |          FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT a_id, b_id, CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jac
      |FROM inter
      |JOIN sizes na ON na.doc_id = a_id
      |JOIN sizes nb ON nb.doc_id = b_id
      |WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5""".stripMargin

  /** Shared DuckDB backbone for the cluster-level oracles (q88, q229,
    * q230): exact Jaccard edge set → recursive reachability →
    * connected components as `comp(doc_id, cluster_id)`.
    */
  private val clusterCte =
    """WITH RECURSIVE
      |words AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM words),
      |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
      |sizes AS (SELECT doc_id, count(*) n FROM dsh GROUP BY 1),
      |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
      |          FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a_id, b_id FROM inter
      |  JOIN sizes na ON na.doc_id = a_id
      |  JOIN sizes nb ON nb.doc_id = b_id
      |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
      |          UNION ALL SELECT b_id, a_id FROM pairs),
      |reach(src, dst) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)""".stripMargin

  /** q42 shares q41's oracle: LSH misses a qualifying pair only with
    * probability (1 - J³)¹⁶ — ~1.0e-5 per pair at the corpus's J=0.8
    * floor (sf0.1), ~2.6e-8 at the sf0.01 floor of J=0.9 — and the
    * hash family is seeded, so a given corpus either always matches or
    * never does; both shipped sfs are verified green. Verification is
    * exact, so false positives are impossible.
    */
  val oracles: Map[String, String] = Map(
    // exact: DuckDB joins the window STRINGS where Spark joins their
    // 64-bit hashes — agreement is the no-collision guarantee
    "q225_substring_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws) - 13),
        |      i -> array_to_string(ws[i:i+14], ' '))) AS win
        |  FROM t WHERE len(ws) >= 15),
        |d AS (SELECT DISTINCT doc_id, win FROM w)
        |SELECT a.doc_id a_id, b.doc_id b_id,
        |  count(*) AS n_shared_windows
        |FROM d a JOIN d b ON a.win = b.win AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    // doc-level rollup of the same window relation: df per window
    // string, exposure count + exact ppm per doc (both engines
    // truncate the nonnegative integer division identically)
    "q232_memorization_risk" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws) - 13),
        |      i -> array_to_string(ws[i:i+14], ' '))) AS win
        |  FROM t WHERE len(ws) >= 15),
        |d AS (SELECT DISTINCT doc_id, win FROM w),
        |df AS (SELECT win, count(*) AS df FROM d GROUP BY 1)
        |SELECT d.doc_id, count(*) AS n_windows,
        |  count(*) FILTER (df.df >= 2) AS n_shared_windows,
        |  CAST(count(*) FILTER (df.df >= 2) * 1000000 // count(*)
        |    AS BIGINT) AS shared_ppm
        |FROM d JOIN df ON d.win = df.win
        |GROUP BY 1""".stripMargin,
    // the removal manifest: shared-window positions merged to islands
    // per doc (overlap rule pos <= prev_end, identical on both engines);
    // nonneg integer division truncates identically
    "q236_span_removal" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |w0 AS (SELECT doc_id, len(ws) AS n_tokens,
        |    unnest(list_transform(range(1, len(ws) - 13),
        |      i -> {'pos': i, 'win': array_to_string(ws[i:i+14], ' ')})) AS u
        |  FROM t WHERE len(ws) >= 15),
        |w AS (SELECT doc_id, n_tokens, u.pos AS pos, u.win AS win FROM w0),
        |df AS (SELECT win, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |shared AS (SELECT w.doc_id, w.n_tokens, w.pos
        |  FROM w JOIN df ON w.win = df.win WHERE df.df >= 2),
        |o AS (SELECT doc_id, n_tokens, pos,
        |    CASE WHEN pos > coalesce(max(pos + 14) OVER (
        |        PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM shared),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM o),
        |isl AS (SELECT doc_id, grp, max(n_tokens) AS n_tokens,
        |    min(pos) AS s, max(pos) + 14 AS e
        |  FROM g GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(e - s + 1) AS BIGINT) AS tokens_cut,
        |  CAST(max(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(e - s + 1) * 1000000 // max(n_tokens) AS BIGINT) AS cut_ppm
        |FROM isl GROUP BY 1""".stripMargin,
    // exact: the gaps-and-islands LCS reduction replayed relationally
    // (positions via struct unnest; 1-based there vs 0-based posexplode
    // is diag/grp-invariant)
    "q226_substring_spans" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') ws
        |  FROM documents),
        |w0 AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws) - 13),
        |      i -> {'pos': i, 'win': array_to_string(ws[i:i+14], ' ')})) AS u
        |  FROM t WHERE len(ws) >= 15),
        |w AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM w0),
        |m AS (SELECT a.doc_id a_id, b.doc_id b_id, a.pos pa, b.pos pb
        |      FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id),
        |r AS (SELECT a_id, b_id, pa, pb,
        |        pa - row_number() OVER (
        |          PARTITION BY a_id, b_id, pa - pb ORDER BY pa) AS grp
        |      FROM m),
        |runs AS (SELECT a_id, b_id, count(*) AS len
        |         FROM r GROUP BY a_id, b_id, pa - pb, grp)
        |SELECT a_id, b_id,
        |  CAST(max(len) + 14 AS BIGINT) AS max_span_tokens,
        |  CAST(sum(len) AS BIGINT) AS n_window_matches
        |FROM runs GROUP BY 1, 2""".stripMargin,
    // sketch-audit oracle (q43): exact J >= 0.5 pair count recomputed
    // by DuckDB (q41's SQL), recall/precision bits asserted as literal
    // TRUE (see simhashChecked)
    "q43_dedup_simhash" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
         |  TRUE AS recall_ge_080, TRUE AS fp_ratio_le_020
         |FROM (
         |$jaccardOracle
         |) t""".stripMargin,
    // the pair stream crossed with q145's split rule
    "q147_split_leakage" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM words),
        |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM dsh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |          FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM inter
        |  JOIN sizes na ON na.doc_id = a_id
        |  JOIN sizes nb ON nb.doc_id = b_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT least(sa.split, sb.split) AS split_a,
        |  greatest(sa.split, sb.split) AS split_b,
        |  count(*) AS n_pairs,
        |  CAST(sum(a_id + b_id) AS BIGINT) AS pair_checksum
        |FROM pairs
        |JOIN sp sa ON sa.doc_id = a_id
        |JOIN sp sb ON sb.doc_id = b_id
        |GROUP BY 1, 2""".stripMargin,
    // jaccardOracle's pair stream rolled up per unordered source pair
    // (same LSH-completeness argument as q42 — see the q42 note)
    "q144_source_overlap" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM words),
        |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
        |sizes AS (SELECT doc_id, count(*) n FROM dsh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |          FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM inter
        |  JOIN sizes na ON na.doc_id = a_id
        |  JOIN sizes nb ON nb.doc_id = b_id
        |  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
        |src AS (SELECT doc_id, source FROM documents)
        |SELECT least(sa.source, sb.source) AS source_a,
        |  greatest(sa.source, sb.source) AS source_b,
        |  count(*) AS n_pairs,
        |  CAST(sum(a_id + b_id) AS BIGINT) AS pair_checksum
        |FROM pairs
        |JOIN src sa ON sa.doc_id = a_id
        |JOIN src sb ON sb.doc_id = b_id
        |GROUP BY 1, 2""".stripMargin,
    "q40_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q41_dedup_jaccard" -> jaccardOracle,
    // exact by construction (prefix filtering is lossless at τ = 0.5):
    // shares the brute-force oracle verbatim
    "q190_prefix_jaccard" -> jaccardOracle,
    // each gate replayed from its proven oracle fragment, assembled
    // with the same first-failing-gate priority
    "q217_refinery" ->
      """WITH jw AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        |jsh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM jw),
        |jdsh AS (SELECT DISTINCT doc_id, s FROM jsh),
        |jsz AS (SELECT doc_id, count(*) n FROM jdsh GROUP BY 1),
        |jint AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |         FROM jdsh a JOIN jdsh b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |nd AS (SELECT DISTINCT b_id AS doc_id
        |       FROM jint JOIN jsz na ON a_id = na.doc_id
        |                 JOIN jsz nb ON b_id = nb.doc_id
        |       WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5),
        |w2 AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') ws
        |       FROM documents),
        |grams AS (SELECT doc_id,
        |            unnest(list_distinct(list_transform(range(1, len(ws) - 2),
        |              i -> list_aggregate(ws[i:i+3], 'string_agg', ' ')))) AS gram
        |          FROM w2 WHERE len(ws) >= 4),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
        |ct AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (gram)
        |       WHERE g.doc_id % 97 <> 0),
        |tk AS (SELECT doc_id, source,
        |         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n
        |       FROM documents)
        |SELECT tk.doc_id, tk.source,
        |  CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
        |       WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
        |       WHEN tk.n < 30 THEN 'low_quality'
        |       ELSE 'kept' END AS reason
        |FROM tk
        |LEFT JOIN nd ON tk.doc_id = nd.doc_id
        |LEFT JOIN ct ON tk.doc_id = ct.doc_id
        |WHERE tk.doc_id % 97 <> 0""".stripMargin,
    // the full pair set filtered to pairs touching the ingest batch —
    // what the incremental plan computes without the old×old quadrant
    "q214_incremental_dedup" ->
      s"""SELECT a_id, b_id, jac,
         |  CASE WHEN a_id % 3 = 0 AND b_id % 3 = 0 THEN 'new_new'
         |       ELSE 'new_old' END AS kind
         |FROM ($jaccardOracle)
         |WHERE a_id % 3 = 0 OR b_id % 3 = 0""".stripMargin,
    // the q214 oracle over the SURVIVING corpus — a full re-shingle of
    // `documents WHERE doc_id % 7 <> 1` is the answer the maintained
    // (tombstoned) index must reproduce
    "q264_erasure_dedup_index" -> survivingProbeOracle,
    // same truth for the COMPACTED index: folding the tombstones into
    // the base must not change one probe bit
    "q272_compacted_dedup_probe" -> survivingProbeOracle,
    "q42_dedup_minhash" -> jaccardOracle,
    "q88_dup_clusters" ->
      s"""$clusterCte
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  (doc_id = cluster_id) AS is_keeper
        |FROM comp""".stripMargin,
    // the incremental merge must equal the FULL recompute — the oracle
    // IS q88's recursive CTE over the whole corpus, verbatim
    "q235_incremental_clusters" ->
      s"""$clusterCte
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  (doc_id = cluster_id) AS is_keeper
        |FROM comp""".stripMargin,
    // q145's split rule applied to the q88 cluster id — the manifest
    // shape (and cut-points) of q145, the cluster closure of q88
    "q229_cluster_split" ->
      s"""$clusterCte
        |SELECT dd.source,
        |  CASE WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(dd.n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(dd.doc_id) AS BIGINT) AS id_checksum
        |FROM comp c JOIN documents dd ON dd.doc_id = c.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "q230_cluster_canonical" ->
      s"""$clusterCte,
        |sized AS (
        |  SELECT doc_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |  FROM comp),
        |ranked AS (
        |  SELECT s.cluster_id, s.doc_id, d.n_chars, s.cluster_size,
        |    row_number() OVER (PARTITION BY s.cluster_id
        |      ORDER BY d.n_chars DESC, s.doc_id) AS rk
        |  FROM sized s JOIN documents d ON d.doc_id = s.doc_id
        |  WHERE s.cluster_size > 1)
        |SELECT cluster_id, doc_id, n_chars, cluster_size,
        |  (rk = 1) AS is_canonical
        |FROM ranked""".stripMargin)
}
