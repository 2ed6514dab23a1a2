package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the embeddings table (`embedding array<float>`).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) query set against all
  *    vectors — the exact baseline, O(|Q| · n).
  *  - hyperplane LSH: sign-sketch each vector against fixed random
  *    hyperplanes, bucket, and only rank within buckets — the 100 TB
  *    path (candidate generation is a narrow equi-join on bucket keys).
  *
  * Similarity for oracle-checked queries is cosine over int-quantized
  * vectors (q = 1e4): integer dot products are exact and
  * engine-independent, so results hash-match DuckDB bit-for-bit, and
  * quantization is itself the standard ANN scale technique (int8/int16
  * vectors). True float cosine is available via [[cosineCol]] for
  * the non-oracle paths.
  */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Quantize `embedding` to bigint (x -> round(x * 10^4)) and attach the
    * squared norm.
    */
  private def quantized(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))").as("qv"))
      .withColumn("nrm", expr("aggregate(qv, 0L, (a, x) -> a + x * x)"))

  /** Exact quantized cosine between two quantized vectors + norms.
    * The dot product is graft's codegen expression (`dot_i64`), not the
    * interpreted zip_with/aggregate HOF pair — semantically identical
    * (int64 math), ~60x faster on all-pairs joins.
    */
  private def qcos(qa: String, na: String, qb: String, nb: String) =
    expr(s"dot_i64($qa, $qb)")
      .cast("double") / (sqrt(col(na).cast("double")) * sqrt(col(nb).cast("double")))

  /** True float cosine (no oracle — float accumulation differs across
    * engines) for tests and the LSH path.
    */
  def cosineCol(a: String, b: String) = {
    val dot = expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)")
    val na = expr(s"aggregate($a, 0D, (acc, v) -> acc + cast(v as double) * v)")
    val nb = expr(s"aggregate($b, 0D, (acc, v) -> acc + cast(v as double) * v)")
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force top-5 neighbors for the query set (vec_id % 100 == 0).
    * The query side is tiny → broadcast nested-loop join; ranking via
    * per-query window.
    */
  def knnBrute: Q = (s, d) => knnBruteOf(s, Tables.embeddings(s, d))

  /** The brute top-5 over an arbitrary embedding corpus — ONE
    * quantize/broadcast/score/rank definition shared by the full-corpus
    * reference (q45 and every ANN audit) and the surviving-corpus
    * erasure reference ([[knnBruteSurviving]]), so a tie-break or
    * quantization change can never diverge the two.
    */
  private def knnBruteOf(s: SparkSession, corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val base = quantized(corpus)
    val queries = broadcast(base.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"), col("nrm").as("qnrm")))
    val cands = base.select(col("vec_id").as("n_id"), col("qv"), col("nrm"))
    val scored = queries.join(cands, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        qcos("qqv", "qnrm", "qv", "nrm").as("qcos"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "qcos")
  }

  /** Deterministic random hyperplanes: `tables` sketch tables of
    * `bits` planes each (seeded, so plans are reproducible across runs).
    */
  private[sim] def planes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Hyperplane-LSH approximate top-5: 16 tables x 6-bit sign sketches
    * (64 buckets/table — sized so a few-thousand-vector corpus yields
    * tens of candidates per query; at larger n, raise `bits` ~log2(n)
    * to keep bucket occupancy constant) with Hamming-1 multi-probe on
    * the query side ([[withProbes]]). Rank only within probed buckets.
    * Output schema matches knnBrute (no oracle — approximate by design;
    * recall pinned >= 0.8@5 in SimSpec).
    */
  /** Sign-sketch every vector against `nTables` x `bits` fixed random
    * hyperplanes: one bucket-key row per (vector, table). Per-row
    * imperative math in mapPartitions (planes ride the task closure, one
    * copy per executor), not an interpreted per-row HOF.
    */
  /** Sketch width shared by [[signBuckets]] and [[withProbes]]: the probe
    * expansion flips exactly the bits the bucket key has, so the two must
    * always agree — a single constant, not two defaults that can drift.
    */
  private val lshBits = 6

  private def signBuckets(s: SparkSession, d: String,
                          dim: Int = 64, nTables: Int = 16, bits: Int = lshBits): DataFrame =
    signBucketsOf(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      dim, nTables, bits)

  /** [[signBuckets]] over an arbitrary (vec_id, embedding) frame — lets a
    * caller sketch a PRE-FILTERED side (e.g. q213's benchmark subset) so
    * the filter reaches the parquet scan instead of sketching the whole
    * corpus and discarding 99% of the rows afterwards (a Dataset
    * mapPartitions is a filter barrier — Catalyst cannot push a predicate
    * below it).
    */
  private def signBucketsOf(embIn: DataFrame,
                            dim: Int = 64, nTables: Int = 16, bits: Int = lshBits): DataFrame = {
    val s = embIn.sparkSession
    import s.implicits._
    val ps = planes(dim, nTables, bits)
    val emb = embIn.select(col("vec_id"), col("embedding"))
    emb.as[(Long, Array[Float])].mapPartitions { it =>
      it.flatMap { case (id, e) =>
        val nd = math.min(dim, e.length)
        Iterator.tabulate(nTables) { t =>
          var key = 0L
          var j = 0
          while (j < bits) {
            var acc = 0.0
            var i = 0
            while (i < nd) { acc += ps(t)(j)(i) * e(i); i += 1 }
            if (acc >= 0) key |= (1L << j)
            j += 1
          }
          (id, t, key)
        }
      }
    }.toDF("vec_id", "t", "bkey")
  }

  /** Multi-probe expansion: for each (vector, table, bucket) row emit the
    * bucket itself plus its `bits` Hamming-1 neighbors (one sign bit
    * flipped). Two sketches within Hamming distance 1 then share a probe
    * key, lifting the per-table hit rate from p^bits to
    * p^bits + bits * p^(bits-1) * (1-p) — on this corpus's ~77° top-5
    * boundary (p ≈ 0.57) that is 0.04 → 0.20 per table, ~0.97 over 16
    * tables, at a fixed 1+bits fan-out (7x here) with no all-pairs join.
    */
  private def withProbes(buckets: DataFrame, bits: Int = lshBits): DataFrame =
    buckets.select(col("vec_id"), col("t"),
      explode(array(col("bkey") +:
        (0 until bits).map(j => col("bkey").bitwiseXOR(lit(1L << j))): _*))
        .as("bkey"))

  def knnLsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val buckets = signBuckets(s, d)
    val queries = withProbes(buckets.where(col("vec_id") % 100 === 0))
      .select(col("vec_id").as("q_id"), col("t"), col("bkey"))
    val cands = queries.join(buckets, Seq("t", "bkey"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    // fetch embeddings only for the (small) candidate set, then rank
    val scored = cands
      .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(emb.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosineCol("qe", "ne").as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Shared ANN audit: grade an approximate top-5 against [[knnBrute]]
    * — the driver-visible form of SimSpec's recall pin. The approximate
    * index runs in FULL (candidate generation + rerank, the actual
    * workload); its (q_id, n_id) set is then left-joined onto the
    * exact brute top-5 and reduced to one row: the query-set size and
    * pair count (both recomputed exactly by the DuckDB oracle) plus a
    * recall ≥ 0.75 boolean the oracle asserts as literal TRUE (SimSpec
    * keeps the tighter 0.8 pin; the driver floor leaves headroom for
    * corpus regeneration). An ANN regression flips the bit → hash red.
    *
    * The brute reference is ANCHORED (q_id < 100000, the q58/q94
    * bound): the audit's exact side stays a ≤ 1000-query broadcast
    * probe — linear in the corpus — at any scale, instead of growing
    * quadratically with the 1%-of-corpus query set (ADVICE r08). The
    * cap is a no-op on current testdata (max vec_id 2000) so the
    * graded pair set is unchanged; the filter reaches the brute plan's
    * query-side scan, so the capped reference never scores the
    * uncapped queries.
    */
  private def knnAudit(approx: DataFrame, brute: DataFrame): DataFrame =
    brute.where(col("q_id") < 100000)
      .select(col("q_id"), col("n_id"))
      .join(approx.select(col("q_id"), col("n_id"), lit(1).as("fd")),
        Seq("q_id", "n_id"), "left")
      .agg(countDistinct(col("q_id")).as("n_queries"),
        count(lit(1)).as("n_eval_pairs"),
        (coalesce(sum(col("fd")), lit(0L)) * 4 >= count(lit(1)) * 3)
          .as("recall_ge_075"))

  /** Driver-audited form of [[knnLsh]] (see [[knnAudit]]). */
  def knnLshChecked: Q = (s, d) => knnAudit(knnLsh(s, d), knnBrute(s, d))

  /** Exact same-label top-5 — the reference for [[knnLshFiltered]]:
    * [[knnBrute]] with the label predicate. Note the plan: the label
    * equality makes this a broadcast HASH join (never a nested loop) —
    * predicate selectivity already divides the pairwise work, which is
    * exactly why filtered search grades against its own filtered
    * reference rather than the unfiltered q45 baseline.
    */
  def knnBruteFiltered: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val lbl = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val base = quantized(Tables.embeddings(s, d)).join(lbl, Seq("vec_id"))
    val queries = broadcast(base.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
        col("nrm").as("qnrm"), col("label")))
    val cands = base.select(col("vec_id").as("n_id"), col("qv"),
      col("nrm"), col("label"))
    val scored = queries.join(cands, Seq("label"))
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        qcos("qqv", "qnrm", "qv", "nrm").as("qcos"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "qcos")
  }

  /** Filtered (predicated) approximate kNN — the vector-database
    * "filtered search" problem: top-5 cosine neighbors among vectors
    * satisfying a metadata predicate, here the query's own label (the
    * same-class-nearest-neighbor query behind per-class curation and
    * label-conditioned retrieval). PREFILTERING, not postfiltering:
    * the label rides the LSH bucket equi-join key, so candidate
    * generation never surfaces-then-discards wrong-label candidates —
    * postfiltering an unfiltered top-k decimates recall when the
    * predicate is selective (a 10-label corpus keeps ~1/10 of an
    * unfiltered candidate list). Same hyperplane sketches and
    * Hamming-1 multi-probe as [[knnLsh]]; rerank is the exact float
    * cosine over the candidate set. Recall vs [[knnBruteFiltered]]
    * pinned in SimSpec and driver-audited via [[knnAudit]].
    */
  def knnLshFiltered: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val lbl = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val buckets = signBuckets(s, d).join(lbl, Seq("vec_id"))
    val queries = withProbes(buckets.where(col("vec_id") % 100 === 0))
      .join(lbl, Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("t"), col("bkey"), col("label"))
    val cands = queries.join(buckets, Seq("t", "bkey", "label"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val scored = cands
      .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(emb.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosineCol("qe", "ne").as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Driver-audited form of [[knnLshFiltered]] vs the exact same-label
    * reference (see [[knnAudit]]).
    */
  def knnLshFilteredChecked: Q = (s, d) =>
    knnAudit(knnLshFiltered(s, d), knnBruteFiltered(s, d))

  /** IVF coarse quantizer: k-means-lite centroids trained distributed
    * (assignment in executor-side loops, means via one aggregation per
    * iteration; only the k x dim centroid table — a few KB — ever touches
    * the driver, exactly like MLlib's k-means). Deterministic init from
    * hashed vec_ids.
    */
  private[sim] def ivfCentroids(emb: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                                k: Int, dim: Int, iters: Int): Array[Array[Double]] = {
    import emb.sparkSession.implicits._
    def meansOf(assigned: org.apache.spark.sql.Dataset[(Int, Array[Float])]): Array[Array[Double]] = {
      val sums = assigned.mapPartitions { it =>
        val acc = scala.collection.mutable.Map.empty[Int, (Array[Double], Long)]
        it.foreach { case (cell, e) =>
          val (s, _) = acc.getOrElseUpdate(cell, (new Array[Double](dim), 0L))
          var i = 0
          val nd = math.min(dim, e.length)
          while (i < nd) { s(i) += e(i); i += 1 }
          acc(cell) = (s, acc(cell)._2 + 1)
        }
        acc.iterator.map { case (c, (s, n)) => (c, s, n) }
      }.toDF("cell", "sum", "n")
        .groupBy("cell")
        .agg(expr("aggregate(collect_list(sum), " +
          s"array_repeat(0D, $dim), (a, x) -> zip_with(a, x, (p, q) -> p + q))").as("sum"),
          org.apache.spark.sql.functions.sum("n").as("n"))
        .collect()
      val out = Array.fill(k)(new Array[Double](dim))
      sums.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Double](1)
        val n = r.getLong(2).toDouble
        var i = 0
        while (i < dim) { out(cell)(i) = s(i) / n; i += 1 }
      }
      out
    }
    // init: cells = hash-partition of vec_ids (deterministic)
    var centroids = meansOf(emb.map { case (id, e) =>
      ((math.abs(mix64ForIvf(id)) % k).toInt, e)
    })
    (1 to iters).foreach { _ =>
      val c = centroids
      centroids = meansOf(emb.map { case (id, e) => (nearestCell(c, e), e) })
    }
    centroids
  }

  @inline private[sim] def mix64ForIvf(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Nearest centroid by cosine (centroid norms recomputed per call —
    * k is tiny).
    */
  private[sim] def nearestCell(cs: Array[Array[Double]], e: Array[Float]): Int = {
    var best = 0
    var bestSim = Double.MinValue
    var c = 0
    while (c < cs.length) {
      var dot = 0.0; var nc = 0.0; var ne = 0.0
      var i = 0
      val nd = math.min(cs(c).length, e.length)
      while (i < nd) { dot += cs(c)(i) * e(i); nc += cs(c)(i) * cs(c)(i); ne += e(i).toDouble * e(i); i += 1 }
      val sim = if (nc == 0 || ne == 0) -2.0 else dot / math.sqrt(nc * ne)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** IVF approximate top-5: assign every vector to its nearest of k
    * centroids, probe the `nprobe` nearest cells per query, rank only
    * within probed cells. The index build is one pass + `iters` k-means
    * rounds; query cost is |probed cells| instead of n. (No oracle —
    * approximate; recall pinned in SimSpec.)
    */
  /** Centroid memo: an IVF index is BUILT ONCE and served to every
    * query — rebuilding k-means per query would misrepresent how an ANN
    * index is used (the same once-per-corpus treatment the bucketed
    * tables get in `Scale`). Keyed by corpus fingerprint + shape; the training
    * itself stays distributed ([[ivfCentroids]]); only the k x dim
    * centroid table (a few KB) is held.
    */
  private val centroidMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int), Array[Array[Double]]]()

  private def centroidsFor(s: SparkSession, d: String, k: Int, dim: Int,
                           iters: Int): Array[Array[Double]] =
    // keyed by content fingerprint, not path: an in-JVM corpus
    // regeneration at the same dir must invalidate the in-memory index
    // exactly like it invalidates the on-disk derived artifacts
    centroidMemo.computeIfAbsent((Tables.datasetTag(d, "embeddings"), k, dim, iters), { _ =>
      import s.implicits._
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
      ivfCentroids(emb, k, dim, iters)
    })

  def knnIvf: Q = (s, d) => {
    import s.implicits._
    val k = 16
    val nprobe = 8
    val dim = 64
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val cs = centroidsFor(s, d, k, dim, iters = 3)
    val assigned = emb.map { case (id, e) => (id, nearestCell(cs, e)) }.toDF("vec_id", "cell")
    val embDf = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(_._1 % 100 == 0).flatMap { case (id, e) =>
      // nprobe nearest cells for this query
      val sims = cs.indices.map { c =>
        (c, { var dot = 0.0; var nc = 0.0; var ne = 0.0; var i = 0
              while (i < dim && i < e.length) { dot += cs(c)(i) * e(i); nc += cs(c)(i) * cs(c)(i); ne += e(i).toDouble * e(i); i += 1 }
              if (nc == 0 || ne == 0) -2.0 else dot / math.sqrt(nc * ne) })
      }.sortBy { case (c, sim) => (-sim, c) }.take(nprobe)
      sims.iterator.map { case (c, _) => (id, c) }
    }.toDF("q_id", "cell")
    val cands = queries.join(assigned, Seq("cell"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val scored = cands
      .join(embDf.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(embDf.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosineCol("qe", "ne").as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Driver-audited form of [[knnIvf]] (see [[knnAudit]]). */
  def knnIvfChecked: Q = (s, d) => knnAudit(knnIvf(s, d), knnBrute(s, d))

  /** One-time, idempotent materialization of the PERSISTED IVF index —
    * the ANN-family sibling of the q214 shingle index and the q270
    * frame index: centroids trained on the OLD corpus (vec_id % 3 != 0,
    * the offline training run a production vector store amortizes) plus
    * the old vectors' cell assignments. Content-fingerprint keyed,
    * layout pinned, DONE-gated. The ingest (q277) READS this; it never
    * retrains or reassigns old vectors.
    */
  private val ivfIdxLock = new Object

  def ensureIvfIndex(s: SparkSession, d: String): String = ivfIdxLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-ivf-index-${Tables.datasetTag(d, "embeddings")}"
    val done = new java.io.File(path, "DONE")
    if (!done.exists()) {
      val root = new java.io.File(path)
      if (root.exists()) Tables.deleteRecursively(root)
      import s.implicits._
      val old = Tables.embeddings(s, d).where(col("vec_id") % 3 =!= 0)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val cs = ivfCentroids(old, 16, 64, iters = 3)
      cs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        .toDF("cell", "vals")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/centroids")
      old.map { case (id, e) => (id, nearestCell(cs, e)) }
        .toDF("vec_id", "cell")
        .repartition(8, col("cell"))
        .write.mode("overwrite").parquet(s"$path/assigned")
      java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
    }
    path
  }

  /** q277: INCREMENTAL IVF ingest — the q214/q270 probe-only economics
    * applied to the ANN index, closing the last index family that
    * still rebuilt per corpus: an ingest batch (vec_id % 3 == 0) is
    * assigned to the STORED centroids (no retraining — the offline
    * k-means is the amortized step, exactly how production vector
    * stores ingest), old assignments come from the index parquet
    * (never recomputed), and the batch's queries probe nprobe cells of
    * the UNION index with an exact cosine rerank. Work is
    * O(batch · k + candidates), not corpus-sized. Registered as the
    * audited form ([[knnAudit]] against the full-corpus brute top-5
    * restricted to batch queries); [[Bench]] times the raw ingest.
    */
  /** Read the persisted k×dim centroid matrix: aggregate-sized, the
    * sanctioned scalar collect (same shape as the in-JVM memo the live
    * q54 uses). Shared by the ingest (q277), erasure (q279), and
    * compaction (q280) probes — one definition so "fixed centroids,
    * never retrained" holds by construction across the lifecycle.
    */
  private def storedCentroids(s: SparkSession, idxPath: String): Array[Array[Double]] =
    s.read.parquet(s"$idxPath/centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** The shared IVF probe (q277/q279/q280): each query probes its
    * `nprobe` nearest stored cells, candidates come from the given
    * assignment relation via the cell equi-join, exact cosine rerank to
    * top-5. nprobe 10 of 16 (q224's setting, one step deeper than
    * q54's 8): centroids fit the OLD corpus only, so batch queries land
    * slightly off-center — nprobe 8 measured recall exactly 0.80 at
    * sf0.001 (zero margin over the spec pin, the q224 lesson); 10
    * measures 1.00/1.00/0.886 at sf0.001/0.01/0.1 for q277.
    */
  private def ivfProbe(s: SparkSession, d: String, cs: Array[Array[Double]],
      allAssigned: DataFrame,
      queryVecs: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      nprobe: Int = 10): DataFrame = {
    import s.implicits._
    val embDf = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val queries = queryVecs.flatMap { case (id, e) =>
      nearestCells(cs, e, nprobe).iterator.map(c => (id, c))
    }.toDF("q_id", "cell")
    val cands = queries.join(allAssigned, Seq("cell"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val scored = cands
      .join(embDf.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(embDf.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosineCol("qe", "ne").as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "sim")
  }

  def incrementalIvf: Q = (s, d) => {
    import s.implicits._
    val idx = ensureIvfIndex(s, d)
    val cs = storedCentroids(s, idx)
    val batch = Tables.embeddings(s, d).where(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val bAssigned = batch.map { case (id, e) => (id, nearestCell(cs, e)) }
      .toDF("vec_id", "cell")
    val allAssigned = s.read.parquet(s"$idx/assigned").unionByName(bAssigned)
    ivfProbe(s, d, cs, allAssigned, batch.filter(_._1 % 100 == 0))
  }

  /** Driver-audited form of [[incrementalIvf]]: graded against the
    * full-corpus brute top-5 restricted to the batch's queries — the
    * ingest's correct answer is "new queries against EVERYTHING".
    */
  def incrementalIvfChecked: Q = (s, d) =>
    knnAudit(incrementalIvf(s, d), knnBrute(s, d).where(col("q_id") % 3 === 0))

  /** Stand-in for the vector erasure request queue — the q264/q278
    * forget-set shape (subject key % 7 == 1) on the vector id. An
    * aggregate-sized id list from a vec_id-only pruned scan; shared by
    * the q279 overlay probe and the q280 compactor so both provably
    * apply the same forget set.
    */
  private[graft] def ivfTombstones(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).where(col("vec_id") % 7 === 1)
      .select(col("vec_id"))

  /** The surviving ingest batch (vec_id % 3 == 0 minus the forget set)
    * — ONE definition so q279 (overlay) and q280 (compacted) probe the
    * identical batch by construction.
    */
  private[sim] def survivingBatch(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.embeddings(s, d)
      .where(col("vec_id") % 3 === 0 && col("vec_id") % 7 =!= 1)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
  }

  /** q279: ERASURE-compliant maintenance of the persisted IVF index —
    * the DELETE cell of the ANN index family's lifecycle matrix (q277
    * is the insert-only ingest; q264/q278 are the same cell for the
    * shingle and frame indexes): a right-to-erasure batch of vector ids
    * is applied to the stored cell assignments as a TOMBSTONE overlay —
    * the aggregate-sized forget set broadcasts into a LEFT ANTI join on
    * the assignment scan — and the ingest probe (q277's plan) runs
    * against the maintained index at FIXED centroids (erasure never
    * retrains: production vector stores drop postings, not codebooks).
    * Erased vectors can no longer surface as candidates (they are out
    * of the assignment relation) and the probe equals one served by an
    * index built over the surviving corpus at the same centroids, which
    * SimSpec pins via q280's compacted sibling. Registered as the
    * audited form: graded against the surviving-corpus brute top-5
    * restricted to the surviving batch queries.
    */
  def erasureIvf: Q = (s, d) => {
    val idx = ensureIvfIndex(s, d)
    val cs = storedCentroids(s, idx)
    val batch = survivingBatch(s, d)
    val bAssigned = {
      import s.implicits._
      batch.map { case (id, e) => (id, nearestCell(cs, e)) }
        .toDF("vec_id", "cell")
    }
    val tomb = broadcast(ivfTombstones(s, d))
    val allAssigned = s.read.parquet(s"$idx/assigned")
      .join(tomb, Seq("vec_id"), "left_anti")
      .unionByName(bAssigned)
    // nprobe 12 (vs q277's 10): erasure thins exactly the well-covered
    // cells, so the true neighbor sits in an unprobed cell more often —
    // 10 measured 0.833 at sf0.1 (one flipped pair from the 0.8 spec
    // pin, the q224 zero-margin smell); 12 buys the margin back at a
    // bounded +20% candidate cost
    ivfProbe(s, d, cs, allAssigned, batch.filter(_._1 % 100 == 0),
      nprobe = 12)
  }

  /** [[knnBrute]] restricted to the surviving corpus — the exact
    * reference for the erasure/compaction probes: after a forget set is
    * applied, the RIGHT answer excludes erased vectors from both the
    * query and the neighbor side.
    */
  private[graft] def knnBruteSurviving(s: SparkSession, d: String): DataFrame =
    knnBruteOf(s, Tables.embeddings(s, d).where(col("vec_id") % 7 =!= 1))

  /** Driver-audited form of [[erasureIvf]]: graded against the
    * surviving-corpus brute top-5 restricted to the surviving batch
    * queries — post-erasure, the correct answer is "surviving queries
    * against everything that survives".
    */
  def erasureIvfChecked: Q = (s, d) =>
    knnAudit(erasureIvf(s, d),
      knnBruteSurviving(s, d).where(col("q_id") % 3 === 0))

  /** One-time, idempotent COMPACTION of the tombstone-overlaid IVF
    * index — the q272/q275 lifecycle step for the ANN family: fold the
    * accumulated tombstones AND q277's ingest batch into the stored
    * assignments (one assignment-linear pass over index files plus one
    * batch assignment — the corpus embeddings of OLD vectors are never
    * re-read, and erased vectors never re-assigned), at FIXED centroids
    * copied verbatim (compaction never retrains). Every later probe
    * drops the per-query anti-join and the per-query batch assignment.
    * Layout pinned, DONE-gated, content-fingerprint keyed.
    */
  private val compactIvfLock = new Object

  def ensureCompactedIvfIndex(s: SparkSession, d: String): String =
    compactIvfLock.synchronized {
      val idx = ensureIvfIndex(s, d)
      val path =
        s"${Tables.scratchDir}/graft-ivf-compact-${Tables.datasetTag(d, "embeddings")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        val root = new java.io.File(path)
        if (root.exists()) Tables.deleteRecursively(root)
        import s.implicits._
        s.read.parquet(s"$idx/centroids")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/centroids")
        val cs = storedCentroids(s, idx)
        val bAssigned = survivingBatch(s, d)
          .map { case (id, e) => (id, nearestCell(cs, e)) }
          .toDF("vec_id", "cell")
        val tomb = broadcast(ivfTombstones(s, d))
        s.read.parquet(s"$idx/assigned")
          .join(tomb, Seq("vec_id"), "left_anti")
          .unionByName(bAssigned)
          .repartition(8, col("cell"))
          .write.mode("overwrite").parquet(s"$path/assigned")
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** q280: the q279 probe served from the COMPACTED IVF index — proof
    * that compaction preserves probe semantics while deleting the
    * probe-time overlay cost: identical surviving batch queries,
    * identical top-5 (SimSpec pins bit-equality with q279's overlay
    * probe), but the assignment side is ONE stored scan — no anti-join,
    * no batch re-assignment anywhere in the plan. Same audited form and
    * oracle as q279.
    */
  def compactedIvf: Q = (s, d) => {
    val idx = ensureCompactedIvfIndex(s, d)
    val cs = storedCentroids(s, idx)
    ivfProbe(s, d, cs, s.read.parquet(s"$idx/assigned"),
      survivingBatch(s, d).filter(_._1 % 100 == 0), nprobe = 12)
  }

  /** Driver-audited form of [[compactedIvf]] — same reference as q279. */
  def compactedIvfChecked: Q = (s, d) =>
    knnAudit(compactedIvf(s, d),
      knnBruteSurviving(s, d).where(col("q_id") % 3 === 0))

  /** One-time, idempotent RETRAIN-AND-SWAP of the IVF index — the
    * lifecycle cell q277/q279/q280/q292 deliberately never exercise:
    * ingest, erasure, compaction and stream-maintenance all hold
    * centroids FIXED (correctly — the online path never retrains), so
    * under distribution drift recall decays with no bound. Production
    * vector stores close that loop with a versioned OFFLINE retrain:
    * train fresh centroids over the GROWN corpus (the old training
    * population plus q277's ingested batch — the drifted distribution),
    * re-assign EVERY vector in one linear pass at the new codebook,
    * write codebook + assignments as a new index VERSION next to the
    * serving one, and swap a pointer: readers resolve v1 until the
    * single atomic-rename instant and v2 after, never a torn mix of
    * old centroids with new assignments. v1 is the shipped index
    * verbatim (copied, not rebuilt — the swap must move away from
    * exactly what production was serving, which is what makes the
    * spec's before/after visibility pin meaningful). Cost: one k-means
    * over the corpus (the amortized offline step) plus one assignment
    * pass — never a probe-path cost; at 100 TB this is the nightly
    * index-rebuild job, while ingest/erase/compact remain the cheap
    * online maintenance.
    */
  private val retrainIvfLock = new Object

  def ensureRetrainedIvfIndex(s: SparkSession, d: String): String =
    retrainIvfLock.synchronized {
      val idx = ensureIvfIndex(s, d)
      val path =
        s"${Tables.scratchDir}/graft-ivf-retrain-${Tables.datasetTag(d, "embeddings")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        val root = new java.io.File(path)
        if (root.exists()) Tables.deleteRecursively(root)
        import s.implicits._
        // v1 = the serving index, copied verbatim, pointer on it first
        s.read.parquet(s"$idx/centroids").repartition(1)
          .write.mode("overwrite").parquet(s"$path/v1/centroids")
        s.read.parquet(s"$idx/assigned").repartition(8, col("cell"))
          .write.mode("overwrite").parquet(s"$path/v1/assigned")
        flipPointer(path, "v1")
        // offline retrain over the grown corpus + one-pass re-assign
        val grown = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        val cs2 = ivfCentroids(grown, 16, 64, iters = 3)
        cs2.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("cell", "vals")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/v2/centroids")
        grown.map { case (id, e) => (id, nearestCell(cs2, e)) }
          .toDF("vec_id", "cell")
          .repartition(8, col("cell"))
          .write.mode("overwrite").parquet(s"$path/v2/assigned")
        flipPointer(path, "v2") // the swap instant
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** Commit `target` as the retrain dir's current version through the
    * manifest protocol's pointer-store form (one-line put-if-absent
    * numbered manifests, recovery = max, NO CURRENT file) — ported in
    * r16 from the last-writer-wins CURRENT flip: a stale flip could
    * only ever serve a complete older snapshot here (retrain is
    * offline, single-writer), but the unified protocol removes even
    * that window, and the 4-thread race spec now covers this path too.
    */
  private def flipPointer(path: String, target: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(root)
    graft.store.ManifestStore.commitPointer(root, target)
  }

  /** The version dir the retrain store's manifest names. */
  private[graft] def retrainCurrent(path: String): String =
    graft.store.ManifestStore.pointerCurrent(java.nio.file.Paths.get(path))
      .getOrElse(sys.error(s"no committed retrain version under $path"))

  /** q294: the anchored-query probe served from the RETRAINED index —
    * resolved through the pointer, so the plan reads v2's codebook and
    * v2's assignments and nothing of v1. nprobe 10 of 16, not q54's 8:
    * at nprobe 8 the retrained probe measured 0.84/0.84/0.78 at
    * sf0.001/0.01/0.1 — 1–3 pairs of margin over the audit floor, the
    * q224 zero-margin smell; 10 measures 0.88/0.92/0.90 (≥ 2-pair
    * headroom over the 0.8 spec floor at every sf, ≥ 3 over the 0.75
    * audit floor) for a bounded +25% candidate cost.
    */
  def retrainedIvf: Q = (s, d) => {
    import s.implicits._
    val idx = ensureRetrainedIvfIndex(s, d)
    val cur = retrainCurrent(idx)
    val cs = storedCentroids(s, s"$idx/$cur")
    val queries = Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, s.read.parquet(s"$idx/$cur/assigned"), queries,
      nprobe = 10)
  }

  /** Driver-audited form of [[retrainedIvf]]: graded against the
    * full-corpus brute top-5 — after a retrain the index serves the
    * whole grown corpus to the standard anchored query set.
    */
  def retrainedIvfChecked: Q = (s, d) =>
    knnAudit(retrainedIvf(s, d), knnBrute(s, d))

  /** Integer-exact codebook drift: the L1 ppm distance (q185's
    * quantized common-denominator math, summed over the 64 dims)
    * between the GROWN corpus's mean embedding and the mean of the
    * population the serving codebook was trained on (vec_id % 3 != 0 —
    * [[ensureIvfIndex]]'s training set). This is the "has the
    * distribution moved since we trained" scalar a production vector
    * store tracks next to its index; deterministic per corpus, exact
    * in BIGINT on both engines.
    */
  private[graft] def codebookDriftPpm(s: SparkSession, d: String): Long =
    codebookDriftPpmOf(Tables.embeddings(s, d))

  /** [[codebookDriftPpm]] over an explicit (vec_id, embedding) corpus —
    * the spec drives both trigger branches with constructed
    * populations through this entry.
    */
  private[graft] def codebookDriftPpmOf(emb: DataFrame): Long =
    driftPpmFromContribs(driftContrib(emb))

  /** One corpus slice's ADDITIVE drift contribution: per dim, the
    * quantized value sum and row count over the slice (`s_g`/`n_g`)
    * and over its training-population part (`vec_id % 3 != 0`,
    * `s_t`/`n_t`). Integer sums are associative, so per-batch
    * contributions committed as store members accumulate to EXACTLY
    * the one-shot measurement — the property that lets a streaming
    * ingest maintain the drift artifact incrementally (q325) instead
    * of rescanning the corpus per decision.
    */
  private[graft] def driftContrib(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), posexplode(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))")))
      .toDF("vec_id", "dim", "qv")
      .groupBy("dim")
      .agg(sum("qv").as("s_g"), count(lit(1)).as("n_g"),
        sum(when(col("vec_id") % 3 =!= 0, col("qv"))).as("s_t"),
        count(when(col("vec_id") % 3 =!= 0, lit(1))).as("n_t"))

  /** [[codebookDriftPpm]]'s integer-exact L1 formula over accumulated
    * per-dim contributions (one or many [[driftContrib]] slices summed
    * by dim): |mean_grown − mean_trained| per dim in millionths of a
    * quantization step, via the common-denominator cross-product —
    * never a float.
    */
  private[graft] def driftPpmFromContribs(contribs: DataFrame): Long =
    contribs.groupBy("dim")
      .agg(sum("s_g").as("s_g"), sum("n_g").as("n_g"),
        sum("s_t").as("s_t"), sum("n_t").as("n_t"))
      .select(expr(
        "abs(s_g * n_t - s_t * n_g) * 1000000L div (n_g * n_t)").as("adiff"))
      .agg(coalesce(sum(col("adiff")), lit(0L))).collect()(0).getLong(0)

  /** Retrain trigger, in [[codebookDriftPpm]]'s units (millionths of a
    * quantization step, summed L1 over the 64 dims — one full
    * quantization step of mean movement in ONE dim reads 10⁶). The
    * shipped corpora's ingested third is drawn from the same
    * distribution as the training population, so their measured drift
    * is sampling noise: 2.32e9 / 1.91e9 / 0.99e9 at sf0.001/0.01/0.1
    * (measured, decreasing with corpus size). The threshold sits at
    * 5e9 — ≥2.2× above the largest measured noise — and SimSpec's
    * drifted fixture (the ingested third shifted +5% of a unit per
    * dim, which moves the GROWN mean δ/3 ≈ 167 quantization steps per
    * dim ≈ 1.07e10) clears it 2.1× — both branches decided with
    * margin, the q224 zero-margin discipline applied to a trigger.
    */
  private[graft] val DriftRetrainThresholdPpm = 5000000000L

  /** One-time, idempotent DRIFT-AWARE retrain — the decision loop the
    * unconditional q294 cell deliberately lacks (its "What's missing"
    * sibling in the r14 verdict): the engine already measures drift
    * (q185) and already consumes its own stats at plan time
    * (q274/q285); here index MAINTENANCE consumes a measured stat. The
    * serving state (v1) is the grown corpus served WITHOUT retraining —
    * the q277 ingest economics: stored codebook + every vector assigned
    * at the fixed centroids. The build measures [[codebookDriftPpm]]
    * over the grown corpus, persists it as the DRIFT artifact next to
    * the store (the audit trail a production job would emit), and runs
    * q294's retrain-and-swap to v2 IFF drift ≥
    * [[DriftRetrainThresholdPpm]] — otherwise the pointer stays on v1
    * and NO training pass runs. Cost of the no-retrain branch: one
    * corpus-linear drift aggregate (64·|corpus| integer rows) — the
    * price of knowing a nightly k-means was unnecessary.
    */
  private val driftIvfLock = new Object

  def ensureDriftAwareIvfIndex(s: SparkSession, d: String): String =
    driftIvfLock.synchronized {
      val idx = ensureIvfIndex(s, d)
      val path =
        s"${Tables.scratchDir}/graft-ivf-driftaware-${Tables.datasetTag(d, "embeddings")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        buildDriftAwareIndex(s, path, idx, Tables.embeddings(s, d))
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** The drift-aware build body over an explicit grown corpus (the
    * spec drives the retrain branch with a constructed drifted
    * population through this entry; production passes the real
    * embeddings table). Returns the measured drift.
    */
  private[graft] def buildDriftAwareIndex(s: SparkSession, path: String,
      idx: String, grownEmb: DataFrame): Long = {
    val root = new java.io.File(path)
    if (root.exists()) Tables.deleteRecursively(root)
    import s.implicits._
    // v1 = the grown corpus at the FIXED serving codebook (q277's
    // ingest shape, persisted): stored assignments + the ingested
    // third assigned at the stored centroids
    s.read.parquet(s"$idx/centroids").repartition(1)
      .write.mode("overwrite").parquet(s"$path/v1/centroids")
    val cs = storedCentroids(s, idx)
    val grownAssigned = s.read.parquet(s"$idx/assigned")
      .unionByName(assignToCells(
        grownEmb.where(col("vec_id") % 3 === 0), cs))
    grownAssigned.repartition(8, col("cell"))
      .write.mode("overwrite").parquet(s"$path/v1/assigned")
    flipPointer(path, "v1")
    // the drift artifact: measured once, persisted, then CONSUMED
    val drift = codebookDriftPpmOf(grownEmb)
    graft.Tables.atomicWrite(java.nio.file.Paths.get(path), "DRIFT",
      drift.toString)
    if (drift >= DriftRetrainThresholdPpm) {
      // q294's offline retrain-and-swap, now under a data trigger
      trainAndWriteVersion(s, s"$path/v2", grownEmb)
      flipPointer(path, "v2")
    }
    drift
  }

  /** q294's offline retrain body, reusable by every drift consumer
    * (the batch drift store q316 and the stream drift loop q325): one
    * k-means over the grown corpus, one linear re-assign pass, written
    * as a complete index version dir — never visible until a pointer
    * commit names it.
    */
  private[graft] def trainAndWriteVersion(s: SparkSession, dir: String,
      grownEmb: DataFrame): Unit = {
    import s.implicits._
    val grown = grownEmb
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val cs2 = ivfCentroids(grown, 16, 64, iters = 3)
    cs2.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "vals")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    grown.map { case (id, e) => (id, nearestCell(cs2, e)) }
      .toDF("vec_id", "cell")
      .repartition(8, col("cell"))
      .write.mode("overwrite").parquet(s"$dir/assigned")
  }

  /** The persisted drift measurement of a drift-aware index dir. */
  private[graft] def storedDriftPpm(path: String): Long =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path).resolve("DRIFT")), "UTF-8").trim.toLong

  /** q316: the anchored probe served through the drift-aware pointer —
    * whichever version the MEASURED drift selected (the shipped
    * corpora sit under the threshold, so this serves v1: the
    * no-retrain branch, bit-equal to probing the unswapped index —
    * SimSpec pins that equality AND drives the retrain branch with a
    * constructed drifted population). nprobe 10 = q294's setting, so
    * the two branches are probe-for-probe comparable.
    */
  def driftAwareIvf: Q = (s, d) => {
    import s.implicits._
    val idx = ensureDriftAwareIvfIndex(s, d)
    val cur = retrainCurrent(idx)
    val cs = storedCentroids(s, s"$idx/$cur")
    val queries = Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, s.read.parquet(s"$idx/$cur/assigned"), queries,
      nprobe = 10)
  }

  /** Driver-audited form of [[driftAwareIvf]] — the full-corpus brute
    * top-5 reference (both branches serve the whole grown corpus).
    */
  def driftAwareIvfChecked: Q = (s, d) =>
    knnAudit(driftAwareIvf(s, d), knnBrute(s, d))

  /** [[storedCentroids]] for the streaming module (q292's replay reads
    * the persisted codebook once before the stream starts).
    */
  private[graft] def storedCentroidsOf(s: SparkSession, idxPath: String): Array[Array[Double]] =
    storedCentroids(s, idxPath)

  /** Assign a (vec_id, embedding) relation to its nearest fixed
    * centroids — the per-micro-batch work of the stream-maintained IVF
    * store (q292): one executor-side pass, no retraining.
    */
  private[graft] def assignToCells(emb: DataFrame,
      cs: Array[Array[Double]]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, e) => (id, nearestCell(cs, e)) }
      .toDF("vec_id", "cell")
  }

  /** The standard anchored-query IVF probe over an EXTERNAL assignment
    * relation (q292's committed stream store): stored centroids drive
    * the nprobe-cell fan-out, candidates come from the given store,
    * exact cosine rerank — [[ivfProbe]] with the full-corpus anchored
    * query set.
    */
  private[graft] def ivfProbeFromStore(s: SparkSession, d: String,
      store: DataFrame): DataFrame = {
    import s.implicits._
    val cs = storedCentroids(s, ensureIvfIndex(s, d))
    val queries = Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, store.select("vec_id", "cell"), queries)
  }

  /** Driver-audited form of the q292 stream-store probe — graded
    * against the full-corpus brute top-5 (the store covers the whole
    * corpus once the replay drains).
    */
  def streamIvfChecked(probe: DataFrame, s: SparkSession, d: String): DataFrame =
    knnAudit(probe, knnBrute(s, d))

  /** The standard anchored probe against a self-contained index VERSION
    * dir (centroids + assigned — the retrain layout): what a drift
    * consumer serves after its pointer swaps to a retrained version
    * (q316's v2 branch, q325's stream drift loop). nprobe 10 = q294's
    * setting, so the branches stay probe-for-probe comparable.
    */
  private[graft] def ivfProbeFromVersionDir(s: SparkSession, d: String,
      dir: String): DataFrame = {
    import s.implicits._
    val cs = storedCentroids(s, dir)
    val queries = Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, s.read.parquet(s"$dir/assigned"), queries, nprobe = 10)
  }

  /** The q296 probe: q279's erasure semantics applied to the
    * STREAM-maintained assignment store — the forget set broadcasts
    * into a LEFT ANTI overlay on the external (manifest-resolved)
    * assignment relation, and the SURVIVING anchored queries probe the
    * overlaid store at the stored, never-retrained centroids with exact
    * cosine rerank. Erased vectors can neither ask nor answer: they are
    * out of the query set by the scan predicate and out of the
    * candidate set by the overlay. nprobe 12 — q279's setting, for
    * q279's reason (erasure thins exactly the well-covered cells; 10
    * measured one flipped pair from the floor at sf0.1 there); measured
    * here 0.95/0.95/0.92 at sf0.001/0.01/0.1 — ≥ 3 pairs of headroom
    * over the 0.8 spec floor at every sf.
    */
  private[graft] def ivfErasedProbeFromStore(s: SparkSession, d: String,
      store: DataFrame): DataFrame = {
    import s.implicits._
    val cs = storedCentroids(s, ensureIvfIndex(s, d))
    val surviving = store.select("vec_id", "cell")
      .join(broadcast(ivfTombstones(s, d)), Seq("vec_id"), "left_anti")
    val queries = Tables.embeddings(s, d)
      .where(col("vec_id") % 100 === 0 && col("vec_id") % 7 =!= 1)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, surviving, queries, nprobe = 12)
  }

  /** The q312 probe: the q296 erased probe's semantics on an
    * ERASURE-FOLDED store — the assignment relation was purged at the
    * fold, so NO anti-join overlay appears here: surviving anchored
    * queries straight against the store at the fixed stored centroids,
    * exact cosine rerank, nprobe 12 (q296's setting — same thinned
    * cells, same reason).
    */
  private[graft] def ivfSurvivorProbeFromStore(s: SparkSession, d: String,
      store: DataFrame): DataFrame = {
    import s.implicits._
    val cs = storedCentroids(s, ensureIvfIndex(s, d))
    val queries = Tables.embeddings(s, d)
      .where(col("vec_id") % 100 === 0 && col("vec_id") % 7 =!= 1)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    ivfProbe(s, d, cs, store.select("vec_id", "cell"), queries, nprobe = 12)
  }

  /** Driver-audited form of the q296 stream-store erasure probe —
    * graded against the surviving-corpus brute top-5 restricted to the
    * surviving anchored queries (q279's reference shape on the
    * full-corpus anchored set).
    */
  def streamIvfErasedChecked(probe: DataFrame, s: SparkSession, d: String): DataFrame =
    // knnBruteSurviving's query side is already the anchored set
    // (vec_id % 100 == 0 inside knnBruteOf) — no further narrowing,
    // unlike q279's batch-query (% 3) restriction
    knnAudit(probe, knnBruteSurviving(s, d))

  /** Corpus-size bound above which the exact all-pairs baseline refuses
    * to run: it is the correctness oracle for small corpora, not a scale
    * path, and the gate makes that contract explicit instead of silently
    * planning a 100 TB cartesian. (Parquet `count()` is metadata-only —
    * the gate costs no scan.)
    */
  private[sim] val MaxExactPairVectors = 100000L

  /** Embedding near-dup candidates: all pairs with quantized cosine above
    * a (corpus-calibrated) threshold. Exact all-pairs — the correctness
    * oracle baseline, size-gated and excluded from the bench path; the
    * registered scale sibling is [[embeddingPairsLsh]] (q58).
    */
  def embeddingPairs: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val n = Tables.embeddings(s, d).count()
    require(n <= MaxExactPairVectors,
      s"embeddingPairs is the exact all-pairs baseline (O(n²)); corpus has $n > " +
        s"$MaxExactPairVectors vectors — use q58_embedding_pairs_lsh at scale")
    val base = quantized(Tables.embeddings(s, d))
    val a = base.select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("b_id"), col("qv").as("qb"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), qcos("qa", "na", "qb", "nb").as("qcos"))
      .where(col("qcos") >= 0.25)
  }

  /** Scale-path variant of [[embeddingPairs]]: candidate pairs from the
    * hyperplane-LSH bucket equi-join (vectors whose sign sketches agree
    * within Hamming distance 1 in >= 1 of 16 tables — Hamming-1
    * multi-probe on ONE join side suffices, since a one-bit mismatch is
    * repaired by flipping that bit on side a), exact `dot_i64`
    * quantized-cosine rerank, same 0.25 threshold and output schema.
    * No all-pairs join anywhere; fan-out is a fixed 7x on one side.
    *
    * Recall (pinned >= 0.8 in SimSpec, no oracle): a 0.25 cosine
    * threshold is a LOW bar — boundary pairs sit at ~75.5° where one
    * hyperplane agrees w.p. only 0.58, so exact 16x6-bit bucketing
    * caught them w.p. ~0.47. Hamming-1 probing lifts the per-table hit
    * rate to p^6 + 6p^5(1-p) ≈ 0.21 → ~0.97 over 16 tables at the
    * boundary (higher for everything above it). Dense low-threshold
    * similarity joins are inherently Ω(output)≈Ω(n²) if exact — at
    * 100 TB one raises the threshold, nTables, or probe radius; the
    * knobs are explicit here.
    */
  /** Pairs-path sketch width: one bit wider than the kNN tables. The
    * pair join pays for bucket occupancy on BOTH sides (candidates ~
    * occupancy x probe rows), so halving occupancy roughly halves the
    * candidate set — measured 2x faster at sf0.1 with pair recall 0.93
    * (pinned >= 0.8); the kNN path keeps 6 bits for its 1.00@5 recall.
    * Passed to BOTH signBuckets and withProbes so key and probe space
    * can never diverge.
    */
  private val pairLshBits = 7

  def embeddingPairsLsh: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val buckets = signBuckets(s, d, bits = pairLshBits)
    val l = withProbes(buckets, pairLshBits)
      .select(col("vec_id").as("a_id"), col("t"), col("bkey"))
    val r = buckets.select(col("vec_id").as("b_id"), col("t"), col("bkey"))
    val cands = l.join(r, Seq("t", "bkey")).where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val base = quantized(Tables.embeddings(s, d))
    cands
      .join(base.select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nrm").as("na")), Seq("a_id"))
      .join(base.select(col("vec_id").as("b_id"), col("qv").as("qb"), col("nrm").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), qcos("qa", "na", "qb", "nb").as("qcos"))
      .where(col("qcos") >= 0.25)
  }

  /** Driver-audited form of [[embeddingPairsLsh]]: ANCHORED recall —
    * the scale-correct way to grade a similarity join without the
    * O(n²) exact set. A bounded, deterministic anchor sample
    * (`vec_id % 10 == 0 AND vec_id < 10000`, ≤ 1000 vectors at any
    * corpus size) gets its EXACT qualifying pairs from one broadcast
    * probe (anchors × corpus — linear, the q45 shape); the full LSH
    * pair join then must cover ≥ 75% of them (measured 0.93 overall;
    * SimSpec keeps the tighter pins). DuckDB recomputes the exact
    * anchor-pair count with the same integer-quantized cosine and
    * asserts the recall boolean as literal TRUE.
    */
  def embeddingPairsLshChecked: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val base = quantized(Tables.embeddings(s, d))
    val anchors = broadcast(base
      .where(col("vec_id") % 10 === 0 && col("vec_id") < 10000)
      .select(col("vec_id").as("x_id"), col("qv").as("qx"), col("nrm").as("nx")))
    val exactPairs = anchors
      .join(base.select(col("vec_id").as("y_id"), col("qv").as("qy"),
        col("nrm").as("ny")), col("x_id") =!= col("y_id"))
      .where(qcos("qx", "nx", "qy", "ny") >= 0.25)
      .select(least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"))
      .distinct()
    val lsh = embeddingPairsLsh(s, d)
      .select(col("a_id"), col("b_id"), lit(1).as("fd"))
    exactPairs.join(lsh, Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_anchor_pairs"),
        (coalesce(sum(col("fd")), lit(0L)) * 4 >= count(lit(1)) * 3)
          .as("anchor_recall_ge_075"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * scoped to k-means clusters — the third member of the embedding
    * dedup family next to the exact baseline (q44) and the LSH pair
    * path (q58). Vectors are assigned to [[ivfCentroids]] cells; the
    * pairwise cosine check runs only WITHIN a cell (the quadratic cost
    * shrinks by ~k for balanced cells — the paper's trick for
    * billion-scale corpora); a vector is dropped when a same-cell
    * vector with a smaller id sits above the threshold. Every drop is
    * backed by an exact quantized-cosine comparison, so precision is
    * 1.0 by construction; recall against the cluster-blind exact pair
    * set is pinned in SimSpec (cross-cell duplicate pairs are the only
    * misses — the paper's accepted trade).
    *
    * Rows-only: the cell assignment is k-means output, not expressible
    * in the DuckDB oracle dialect.
    *
    * Knobs, tuned against the exact pair set at this corpus's dense
    * τ=0.25 (91% of vectors have a duplicate): k=8 cells with
    * DUAL-CELL assignment (each vector lives in its 2 nearest cells —
    * the overlap catches pairs straddling a cell boundary, the main
    * loss mode of hard partitioning). Measured drop-recall: 0.96 dual
    * vs 0.78 hard at k=8; 0.90 dual at k=16. Pair candidates cost
    * ~(2²/k)·n² for balanced cells — the k-fold quadratic shrink the
    * paper trades recall for, with the overlap factor explicit.
    */
  def semDedup: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val k = 8
    val nAssign = 2
    val dim = 64
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val cs = centroidsFor(s, d, k, dim, iters = 3)
    val assigned = emb.flatMap { case (id, e) =>
      nearestCells(cs, e, nAssign).map(c => (id, c))
    }.toDF("vec_id", "cell")
    val base = quantized(Tables.embeddings(s, d))
    val withCell = base.select("vec_id").join(assigned, "vec_id")
    val a = withCell.select(col("cell"), col("vec_id").as("a_id"))
    val b = withCell.select(col("cell"), col("vec_id").as("b_id"))
    // same-cell id-ordered candidates, deduped across the 2 assignments
    // BEFORE the exact rerank pays for them
    val cands = a.join(b, Seq("cell")).where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val dropped = cands
      .join(base.select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nrm").as("na")), Seq("a_id"))
      .join(base.select(col("vec_id").as("b_id"), col("qv").as("qb"), col("nrm").as("nb")), Seq("b_id"))
      .where(qcos("qa", "na", "qb", "nb") >= 0.25)
      .select(col("b_id").as("vec_id")).distinct()
      .withColumn("d", lit(true))
    // primary cell in the report; drop verdicts already account for both
    val primary = emb.map { case (id, e) => (id, nearestCell(cs, e)) }
      .toDF("vec_id", "cell")
    primary
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("d"), lit(false)).as("is_dropped"))
  }

  /** Driver-audited form of [[semDedup]], anchored like
    * [[embeddingPairsLshChecked]]: for the bounded anchor sample the
    * EXACT drop verdict ("has a smaller-id partner at qcos ≥ 0.25") is
    * one broadcast probe; the audit pins (a) precision — every
    * anchored semdedup drop is backed by a true partner (1.0 by
    * construction: drops come from an exact same-cell comparison) —
    * and (b) anchored drop recall ≥ 0.85 (cross-cell pairs are the
    * only loss mode; measured 0.96 with dual-cell assignment, SimSpec
    * pins 0.9). DuckDB recomputes the anchor count and the exact
    * number of anchor duplicates, and asserts both booleans TRUE.
    */
  def semDedupChecked: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val base = quantized(Tables.embeddings(s, d))
    val anchors = broadcast(base
      .where(col("vec_id") % 10 === 0 && col("vec_id") < 10000)
      .select(col("vec_id").as("x_id"), col("qv").as("qx"), col("nrm").as("nx")))
    // exact verdict per anchor: any SMALLER-id partner above threshold
    // (the threshold lives IN the join condition so anchors with no
    // qualifying partner keep their null row instead of vanishing)
    val exact = anchors
      .join(base.select(col("vec_id").as("y_id"), col("qv").as("qy"),
        col("nrm").as("ny")),
        col("y_id") < col("x_id") && qcos("qx", "nx", "qy", "ny") >= 0.25,
        "left")
      .groupBy("x_id")
      .agg(max(col("y_id").isNotNull).as("exact_dup"))
    val sem = semDedup(s, d)
      .select(col("vec_id").as("x_id"), col("is_dropped"))
    exact.join(sem, Seq("x_id"))
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("exact_dup"), 1L).otherwise(0L)).as("n_anchor_dups"),
        min(!col("is_dropped") || col("exact_dup")).as("drops_are_true_dups"),
        (sum(when(col("exact_dup") && col("is_dropped"), 1L).otherwise(0L)) * 100 >=
          sum(when(col("exact_dup"), 1L).otherwise(0L)) * 85)
          .as("anchor_recall_ge_085"))
  }

  /** Unit-normalize an embedding (zero vectors stay zero): on the unit
    * sphere cosine ordering == dot ordering, which is what lets the PQ
    * asymmetric-distance lookup approximate cosine with plain partial
    * dot products.
    */
  @inline private def unit(e: Array[Float], dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    val nd = math.min(dim, e.length)
    while (i < nd) { n2 += e(i).toDouble * e(i); i += 1 }
    if (n2 > 0) {
      val inv = 1.0 / math.sqrt(n2)
      i = 0
      while (i < nd) { v(i) = e(i) * inv; i += 1 }
    }
    v
  }

  /** Product-quantization codebooks: `m` subspaces of `subDim` dims,
    * `k` centroids each, trained by per-subspace L2 k-means over the
    * UNIT-normalized corpus — every subspace trains in the SAME pass
    * (one mapPartitions emits (subspace, cell) partial sums; one
    * aggregation per Lloyd round), so the build is `iters + 1` linear
    * scans regardless of m. Deterministic: hashed-id init, smaller-cell
    * tie-breaks, empty cells keep their previous centroid. Only the
    * m × k × subDim codebook (a few KB) ever reaches the driver — the
    * same contract as [[ivfCentroids]].
    */
  private[sim] def pqCodebooks(emb: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                               m: Int, subDim: Int, k: Int,
                               iters: Int): Array[Array[Array[Double]]] = {
    import emb.sparkSession.implicits._
    val dim = m * subDim
    var cb: Array[Array[Array[Double]]] = null
    (0 to iters).foreach { _ =>
      val cur = cb
      val sums = emb.mapPartitions { it =>
        val acc = scala.collection.mutable.Map
          .empty[(Int, Int), (Array[Double], Long)]
        it.foreach { case (id, e) =>
          val v = unit(e, dim)
          var j = 0
          while (j < m) {
            val cell =
              if (cur == null) (math.abs(mix64ForIvf(id * 131 + j)) % k).toInt
              else nearestSubCell(cur(j), v, j * subDim, subDim)
            val (s0, _) = acc.getOrElseUpdate((j, cell),
              (new Array[Double](subDim), 0L))
            var i = 0
            while (i < subDim) { s0(i) += v(j * subDim + i); i += 1 }
            acc((j, cell)) = (s0, acc((j, cell))._2 + 1)
            j += 1
          }
        }
        acc.iterator.map { case ((j, c), (s0, n)) => (j, c, s0, n) }
      }.toDF("j", "cell", "sum", "n")
        .groupBy("j", "cell")
        .agg(expr("aggregate(collect_list(sum), " +
          s"array_repeat(0D, $subDim), (a, x) -> zip_with(a, x, (p, q) -> p + q))").as("sum"),
          org.apache.spark.sql.functions.sum("n").as("n"))
        .collect()
      val next = Array.tabulate(m, k) { (j, c) =>
        if (cb == null) new Array[Double](subDim) else cb(j)(c)
      }
      sums.foreach { r =>
        val j = r.getInt(0); val c = r.getInt(1)
        val s0 = r.getSeq[Double](2); val n = r.getLong(3).toDouble
        next(j)(c) = Array.tabulate(subDim)(i => s0(i) / n)
      }
      cb = next
    }
    cb
  }

  /** Nearest sub-centroid by L2 over one subspace slice (ties → smaller
    * cell index).
    */
  @inline private[sim] def nearestSubCell(cs: Array[Array[Double]],
                                          v: Array[Double], off: Int,
                                          subDim: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d2 = 0.0
      var i = 0
      while (i < subDim) {
        val diff = cs(c)(i) - v(off + i)
        d2 += diff * diff
        i += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  private val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int, Int), Array[Array[Array[Double]]]]()

  private def pqCodebooksFor(s: SparkSession, d: String, m: Int, subDim: Int,
                             k: Int, iters: Int): Array[Array[Array[Double]]] =
    // fingerprint key for the same regeneration-staleness reason as
    // centroidMemo above
    pqMemo.computeIfAbsent((Tables.datasetTag(d, "embeddings"), m, subDim, k, iters), { _ =>
      import s.implicits._
      pqCodebooks(Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])], m, subDim, k, iters)
    })

  /** IVF-PQ approximate top-5 — the FAISS-style memory-bound ANN scale
    * path next to LSH (q46) and plain IVF (q54): every vector is stored
    * as ONE byte per subspace (8 codes here vs 256 floats), so at
    * 100 TB the searched index is ~1/128th the raw embedding bytes and
    * the per-candidate distance is `m` table lookups instead of a
    * 64-dim dot product.
    *
    * Index: coarse quantizer = the q54 IVF centroids (hard cell
    * assignment bounds the searched candidates); payload = 8×32 PQ
    * codes of the unit-normalized vector ([[pqCodebooks]]). Query:
    * probe the 10 nearest cells; each query row carries its 8×32
    * asymmetric-distance lookup table (partial dots of the query's
    * unit sub-vectors against every sub-centroid — 256 doubles), so
    * the candidate score is a codegen'd HOF fold of `m` element_at
    * lookups; the ADC top-200 then pays an exact float-cosine rerank
    * (the q46 trick) and emits the top-5 in knnBrute's schema.
    * Candidates appear once (hard cell assignment), so there is no
    * distinct anywhere; the cell join broadcasts the tiny probe side.
    * Recall vs brute pinned in SimSpec; driver-audited by
    * [[knnPqChecked]].
    */
  def knnPq: Q = knnPqTuned()

  /** [[knnPq]] with the knobs exposed for recall/cost sweeps (Scratch)
    * and spec experiments; the public operator pins the shipped tuning.
    */
  private[graft] def knnPqTuned(m: Int = 8, subDim: Int = 8, k: Int = 32,
                                nprobe: Int = 10, rerank: Int = 200): Q = (s, d) => {
    import s.implicits._
    val dim = m * subDim
    val coarseK = 16
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val coarse = centroidsFor(s, d, coarseK, dim, iters = 3)
    val cb = pqCodebooksFor(s, d, m, subDim, k, iters = 3)
    val assigned = emb.map { case (id, e) =>
      val v = unit(e, dim)
      val codes = Array.tabulate(m)(j => nearestSubCell(cb(j), v, j * subDim, subDim))
      (id, nearestCell(coarse, e), codes)
    }.toDF("vec_id", "cell", "codes")
    val queries = emb.filter(_._1 % 100 == 0).flatMap { case (id, e) =>
      val v = unit(e, dim)
      val lut = new Array[Double](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          var acc = 0.0
          var i = 0
          while (i < subDim) { acc += cb(j)(c)(i) * v(j * subDim + i); i += 1 }
          lut(j * k + c) = acc
          c += 1
        }
        j += 1
      }
      nearestCells(coarse, e, nprobe).map(c => (id, c, lut))
    }.toDF("q_id", "cell", "lut")
    val scored = broadcast(queries).join(assigned, Seq("cell"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr(s"aggregate(sequence(0, ${m - 1}), 0D, " +
          s"(acc, j) -> acc + element_at(lut, j * $k + element_at(codes, j + 1) + 1))")
          .as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id").asc)
    val cands = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= rerank)
      .select("q_id", "n_id")
    val embDf = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val reranked = cands
      .join(embDf.select(col("vec_id").as("q_id"), col("embedding").as("qe")), Seq("q_id"))
      .join(embDf.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), cosineCol("qe", "ne").as("sim"))
    val w2 = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    reranked.withColumn("rank", row_number().over(w2)).where(col("rank") <= 5)
      .select("q_id", "n_id", "rank", "sim")
  }

  /** Driver-audited form of [[knnPq]] (see [[knnAudit]]). */
  def knnPqChecked: Q = (s, d) => knnAudit(knnPq(s, d), knnBrute(s, d))

  /** The `m` nearest centroids by cosine (deterministic tie-break on
    * cell index) — [[nearestCell]] generalized for overlap assignment.
    */
  private def nearestCells(cs: Array[Array[Double]], e: Array[Float], m: Int): Seq[Int] = {
    val sims = cs.indices.map { c =>
      var dot = 0.0; var nc = 0.0; var ne = 0.0; var i = 0
      val nd = math.min(cs(c).length, e.length)
      while (i < nd) { dot += cs(c)(i) * e(i); nc += cs(c)(i) * cs(c)(i); ne += e(i).toDouble * e(i); i += 1 }
      (c, if (nc == 0 || ne == 0) -2.0 else dot / math.sqrt(nc * ne))
    }
    sims.sortBy { case (c, sm) => (-sm, c) }.take(m).map(_._1)
  }

  /** Two-stage hybrid retrieval — the production search shape: a cheap
    * LEXICAL stage (q152's integer-exact BM25, summed over the query
    * document's terms) nominates 50 candidates; an exact VECTOR stage
    * (quantized cosine to the query's embedding, `doc_id = vec_id` by
    * corpus convention) reranks them to a top-10. Query-by-example with
    * doc 0. The query's term set and quantized embedding are single-row
    * fetches inlined as literals (the q118 shape — no one-row cross
    * join, no BNLJ), so at 100 TB the lexical stage is the same
    * shuffles as q152 plus a broadcast IN-filter, and the vector stage
    * touches exactly 50 embedding rows via an equi join. Both scores
    * ride along: `bm25_mil` (integer) and `qcos` (IEEE-identical
    * double from exact int64 dot products, q45's guarantee).
    */
  def hybridSearch: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val qid = 0L
    val qtext = Tables.documents(s, d).where(col("doc_id") === qid)
      .select("text").head().getString(0)
    val qterms = qtext.split(" ").filter(_.nonEmpty).distinct.sorted
    val inList = qterms.map(t => s"'${t}'").mkString(", ")
    val v = "docs_hyb_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .createOrReplaceTempView(v)
    val totals = s.sql(
      s"""SELECT count(*) AS n,
         |  sum(size(filter(split(text, ' '), w -> w != ''))) AS t
         |FROM $v""".stripMargin).head()
    val (n, t) = (totals.getLong(0), totals.getLong(1))
    val cand = s.sql(
      s"""WITH terms AS (
        |  SELECT doc_id, explode(filter(split(text, ' '), w -> w != '')) AS term
        |  FROM $v),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT tf.doc_id,
        |  sum((((1000L * ${n}L) div df.df) * 44 * tf.tf * ${t}L)
        |    div (20 * tf.tf * ${t}L + 6 * ${t}L + 18 * dl.dl * ${n}L))
        |    AS bm25_mil
        |FROM tf
        |JOIN df ON tf.term = df.term
        |JOIN dl ON tf.doc_id = dl.doc_id
        |WHERE tf.term IN ($inList) AND tf.doc_id != $qid
        |GROUP BY tf.doc_id
        |ORDER BY bm25_mil DESC, doc_id
        |LIMIT 50""".stripMargin)
    s.catalog.dropTempView(v)
    // query embedding: one quantized row fetched through the SAME
    // quantized() expression the candidate side uses — bit-identical by
    // construction (a driver-side re-implementation of round() would
    // have to match Spark's BigDecimal semantics by luck)
    val qrow = quantized(Tables.embeddings(s, d))
      .where(col("vec_id") === qid).select("qv", "nrm").head()
    val qv = qrow.getSeq[Long](0)
    val qnrm = qrow.getLong(1)
    val qvLit = qv.mkString("array(", "L, ", "L)")
    val emb = quantized(Tables.embeddings(s, d))
    val w = Window.orderBy(col("qcos").desc, col("doc_id").asc)
    cand.join(emb, cand("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("bm25_mil"),
        (expr(s"dot_i64($qvLit, qv)").cast("double") /
          (sqrt(lit(qnrm).cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("qcos"))
      .orderBy(col("qcos").desc, col("doc_id").asc).limit(10)
      .withColumn("rank", row_number().over(w))
  }

  /** Reciprocal-rank fusion — the OTHER standard hybrid-search
    * combinator next to q156's gate-then-rerank: the lexical (BM25) and
    * vector (exact quantized cosine) systems each nominate an
    * independent top-50 RANKING, and fusion scores candidates by
    * `Σ 1e6 div (60 + rank)` — rank-based, so the two systems'
    * incomparable score scales never need calibration (the reason RRF
    * is the production default). k=60 per Cormack & Clarke; integer
    * division keeps the fused score exact across engines.
    *
    * Scale shape: the lexical leg is q152's aggregation shuffles + a
    * broadcast IN-filter on the query's terms; the vector leg is one
    * broadcast-query scan ranked by TakeOrderedAndProject (q45's
    * shape, one query row); the fusion join touches ≤100 rows. Ranks
    * are deterministic: score desc, doc_id asc on both legs.
    */
  def rrfFusion: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val qid = 0L
    val qtext = Tables.documents(s, d).where(col("doc_id") === qid)
      .select("text").head().getString(0)
    val inList = qtext.split(" ").filter(_.nonEmpty).distinct.sorted
      .map(t => s"'${t}'").mkString(", ")
    val v = "docs_rrf_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .createOrReplaceTempView(v)
    val totals = s.sql(
      s"""SELECT count(*) AS n,
         |  sum(size(filter(split(text, ' '), w -> w != ''))) AS t
         |FROM $v""".stripMargin).head()
    val (n, t) = (totals.getLong(0), totals.getLong(1))
    val lex = s.sql(
      s"""WITH terms AS (
        |  SELECT doc_id, explode(filter(split(text, ' '), w -> w != '')) AS term
        |  FROM $v),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |cand AS (
        |  SELECT tf.doc_id,
        |    sum((((1000L * ${n}L) div df.df) * 44 * tf.tf * ${t}L)
        |      div (20 * tf.tf * ${t}L + 6 * ${t}L + 18 * dl.dl * ${n}L))
        |      AS bm25_mil
        |  FROM tf
        |  JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  WHERE tf.term IN ($inList) AND tf.doc_id != $qid
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, cast(row_number() OVER (
        |    ORDER BY bm25_mil DESC, doc_id ASC) AS BIGINT) AS lex_rank
        |FROM cand ORDER BY lex_rank LIMIT 50""".stripMargin)
    s.catalog.dropTempView(v)
    val qrow = quantized(Tables.embeddings(s, d))
      .where(col("vec_id") === qid).select("qv", "nrm").head()
    val qvLit = qrow.getSeq[Long](0).mkString("array(", "L, ", "L)")
    val qnrm = qrow.getLong(1)
    val vec = quantized(Tables.embeddings(s, d))
      .where(col("vec_id") =!= qid)
      .select(col("vec_id").as("doc_id"),
        (expr(s"dot_i64($qvLit, qv)").cast("double") /
          (sqrt(lit(qnrm).cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("qcos"))
      .orderBy(col("qcos").desc, col("doc_id").asc).limit(50)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("qcos").desc, col("doc_id").asc))
          .cast("long").as("vec_rank"))
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr("1000000L div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000L div (60 + vec_rank)"), lit(0L)))
    fused
      .orderBy(col("rrf_ppm").desc, col("doc_id").asc).limit(10)
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf_ppm").desc, col("doc_id").asc))
          .cast("long"))
  }

  /** MMR (maximal marginal relevance) diversified re-ranking: from the
    * exact-cosine top-20 candidates for the query embedding, greedily
    * select 5 results maximizing `relevance − max-similarity-to-
    * already-selected` (λ = ½ scaled ×2 — rank-equivalent, one
    * subtraction). The standard diversification step after retrieval
    * (RAG context assembly, SERP diversity) next to q156's
    * gate-then-rerank and q170's fusion.
    *
    * Determinism: relevance and pairwise similarity are exact int64
    * dots over quantized vectors converted once to IEEE doubles; both
    * engines then run the identical sqrt/divide/subtract sequence
    * (correctly-rounded IEEE ops — q45's proven rule), and every
    * selection step tie-breaks (score desc, doc_id asc).
    *
    * Scale shape: relevance is one broadcast-query scan ranked by
    * TakeOrderedAndProject (q45's shape); the greedy runs driver-side
    * over the 20-candidate matrix — the q54/q180 aggregate-sized-
    * collect rule, O(k²) doubles on the driver, never the corpus. The
    * DuckDB oracle replays the same greedy as 5 unrolled
    * argmax-with-exclusion CTE steps.
    */
  def mmrRerank: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val qid = 0L
    val emb = quantized(Tables.embeddings(s, d))
    val qrow = emb.where(col("vec_id") === qid).select("qv", "nrm").head()
    val qvLit = qrow.getSeq[Long](0).mkString("array(", "L, ", "L)")
    val qnrm = qrow.getLong(1)
    val cands = emb.where(col("vec_id") =!= qid)
      .select(col("vec_id"), col("qv"), col("nrm"),
        (expr(s"dot_i64($qvLit, qv)").cast("double") /
          (sqrt(lit(qnrm).cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(20)
      .collect()
    val ids = cands.map(_.getLong(0))
    val qvs = cands.map(_.getSeq[Long](1).toArray)
    val nrms = cands.map(_.getLong(2))
    val rels = cands.map(_.getDouble(3))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val sim = Array.tabulate(ids.length, ids.length) { (i, j) =>
      dot(qvs(i), qvs(j)).toDouble /
        (math.sqrt(nrms(i).toDouble) * math.sqrt(nrms(j).toDouble))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (selected.length < 5) {
      val best = ids.indices.filterNot(selected.contains)
        .map { i =>
          val ms = if (selected.isEmpty) 0.0 else selected.map(sim(i)).max
          (rels(i) - ms, ids(i), i)
        }
        .minBy { case (score, id, _) => (-score, id) }._3
      selected += best
    }
    import s.implicits._
    selected.toSeq.zipWithIndex
      .map { case (i, r) => (r + 1, ids(i), rels(i)) }
      .toDF("rank", "doc_id", "rel")
  }

  /** Semantic decontamination, EXACT reference form: flag corpus
    * documents whose embedding is too close (cosine ≥ 0.35) to ANY
    * benchmark-set embedding — the vector sibling of q84's n-gram
    * decontamination, catching paraphrased eval leakage that token
    * overlap misses. Benchmark = the q45 query set (vec_id % 100 == 0);
    * output = flagged doc, its nearest benchmark item (ties → smaller
    * id), and the max similarity.
    *
    * This is the |B|×|corpus| broadcast probe (the sanctioned q45
    * shape) — correct while |B| stays small, quadratic as it grows. The
    * REGISTERED q213 plan is [[semanticDecontamLsh]] (bucketed, no
    * pairwise scan), driver-audited against an anchored slice of this
    * exact form by [[semanticDecontamChecked]]; this function remains
    * the small-|B| exact path and the spec's replay target.
    */
  def semanticDecontam: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val emb = quantized(Tables.embeddings(s, d))
    val bench = broadcast(emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("bench_id"), col("qv").as("bqv"),
        col("nrm").as("bnrm")))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("bench_id").asc)
    corpus.crossJoin(bench)
      .select(col("vec_id"), col("bench_id"),
        (expr("dot_i64(qv, bqv)").cast("double") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("bnrm").cast("double"))))
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1 && col("sim") >= 0.35)
      .select(col("vec_id").as("doc_id"), col("bench_id"),
        col("sim").as("max_sim"))
  }

  /** Semantic decontamination, SCALE form (the registered q213 plan):
    * hyperplane-LSH bucketing replaces the |B|×|corpus| probe. Both
    * sides sketch from PRUNED scans ([[signBucketsOf]] — the benchmark
    * side reads 1% of the table), the benchmark buckets get Hamming-1
    * multi-probes and broadcast into a bucket equi-join, and only the
    * collided (doc, bench) candidates pay an exact `dot_i64` cosine.
    * Per corpus row the work is its bucket collisions, not |B| dots —
    * at 100 TB with a growing benchmark set this is the plan that
    * survives. Precision is 1.0 by construction (the rerank is exact,
    * so a flag implies a true ≥ 0.35 neighbor); recall is the LSH
    * catch rate — at the 0.35 boundary (θ ≈ 69.5°, p ≈ 0.61) a
    * Hamming-1 probed 6-bit table hits w.p. ≈ 0.25, → ≈ 0.99 over 16
    * tables, and higher above the boundary. Approximation caveat: a
    * flagged doc's reported (bench_id, max_sim) is the argmax over
    * CANDIDATES, which can differ from the global argmax when the true
    * nearest benchmark item never collided but another ≥-threshold one
    * did. Plan pinned BNLJ-free in SimSpec; recall/precision
    * driver-audited by [[semanticDecontamChecked]].
    */
  def semanticDecontamLsh: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val benchBuckets = withProbes(signBucketsOf(emb.where(col("vec_id") % 100 === 0)))
      .select(col("vec_id").as("bench_id"), col("t"), col("bkey"))
    val corpusBuckets = signBucketsOf(emb.where(col("vec_id") % 100 =!= 0))
    val cands = corpusBuckets.join(broadcast(benchBuckets), Seq("t", "bkey"))
      .select(col("vec_id"), col("bench_id")).distinct()
    val corpusQ = quantized(Tables.embeddings(s, d).where(col("vec_id") % 100 =!= 0))
    val benchQ = broadcast(
      quantized(Tables.embeddings(s, d).where(col("vec_id") % 100 === 0))
        .select(col("vec_id").as("bench_id"), col("qv").as("bqv"), col("nrm").as("bnrm")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("bench_id").asc)
    cands.join(corpusQ, Seq("vec_id"))
      .join(benchQ, Seq("bench_id"))
      .select(col("vec_id"), col("bench_id"),
        (expr("dot_i64(qv, bqv)").cast("double") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("bnrm").cast("double"))))
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1 && col("sim") >= 0.35)
      .select(col("vec_id").as("doc_id"), col("bench_id"),
        col("sim").as("max_sim"))
  }

  /** Driver-audited form of [[semanticDecontamLsh]], anchored like
    * [[embeddingPairsLshChecked]]: the bounded anchor sample
    * (`vec_id % 10 == 0 AND vec_id < 10000`, benchmark ids excluded —
    * ≤ 900 anchors at any corpus size) gets its EXACT contamination
    * verdict from one anchors × benchmark broadcast probe (linear, the
    * q45 shape); the full LSH plan then must (a) flag only truly
    * contaminated anchors (precision 1.0 by construction — exact
    * rerank) and (b) cover ≥ 75% of the exactly-flagged anchors.
    * DuckDB recomputes the anchor and exact-flag counts with the same
    * integer-quantized cosine and asserts both booleans TRUE; SimSpec
    * keeps tighter pins.
    */
  def semanticDecontamChecked: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val base = quantized(Tables.embeddings(s, d))
    val anchors = base
      .where(col("vec_id") % 10 === 0 && col("vec_id") < 10000 &&
        col("vec_id") % 100 =!= 0)
      .select(col("vec_id").as("x_id"), col("qv").as("qx"), col("nrm").as("nx"))
    val bench = broadcast(base.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("bench_id"), col("qv").as("bqv"),
        col("nrm").as("bnrm")))
    // threshold in the join condition: anchors with no contaminating
    // benchmark neighbor keep their null row instead of vanishing
    val exact = anchors
      .join(bench, qcos("qx", "nx", "bqv", "bnrm") >= 0.35, "left")
      .groupBy("x_id")
      .agg(max(col("bench_id").isNotNull).as("exact_flag"))
    val lsh = semanticDecontamLsh(s, d)
      .select(col("doc_id").as("x_id"), lit(true).as("lsh_flag"))
    exact.join(lsh, Seq("x_id"), "left")
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("exact_flag"), 1L).otherwise(0L)).as("n_anchor_flagged"),
        min(!coalesce(col("lsh_flag"), lit(false)) || col("exact_flag"))
          .as("flags_are_true"),
        (sum(when(col("exact_flag") && coalesce(col("lsh_flag"), lit(false)), 1L)
          .otherwise(0L)) * 4 >=
          sum(when(col("exact_flag"), 1L).otherwise(0L)) * 3)
          .as("anchor_recall_ge_075"))
  }

  val queries: Map[String, Q] = Map(
    "q213_semantic_decontam" -> semanticDecontamChecked,
    "q212_mmr_rerank" -> mmrRerank,
    "q156_hybrid_search" -> hybridSearch,
    "q170_rrf_fusion" -> rrfFusion,
    "q45_knn_brute" -> knnBrute,
    "q46_knn_lsh" -> knnLshChecked,
    "q234_knn_filtered" -> knnLshFilteredChecked,
    "q54_knn_ivf" -> knnIvfChecked,
    "q277_incremental_ivf" -> incrementalIvfChecked,
    "q279_erasure_ivf" -> erasureIvfChecked,
    "q280_compacted_ivf" -> compactedIvfChecked,
    "q294_retrained_ivf" -> retrainedIvfChecked,
    "q316_drift_aware_retrain" -> driftAwareIvfChecked,
    "q224_knn_pq" -> knnPqChecked,
    "q44_embedding_pairs" -> embeddingPairs,
    "q58_embedding_pairs_lsh" -> embeddingPairsLshChecked,
    "q94_semdedup" -> semDedupChecked)

  private val quantCte =
    """WITH q AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) qv
      |  FROM embeddings),
      |n AS (SELECT vec_id, qv,
      |    list_sum(list_transform(qv, x -> x * x)) nrm FROM q)""".stripMargin

  val oracles: Map[String, String] = Map(
    // ANN-audit oracles (q46, q54, q58, q94): DuckDB recomputes the
    // exact query/anchor-set sizes (and, for the pair audits, the exact
    // qualifying-pair counts with the same integer-quantized cosine)
    // and asserts the recall/precision booleans as literal TRUE — the
    // Spark side computes them for real against knnBrute / anchored
    // broadcast probes, so an ANN regression flips a bit → hash red
    "q46_knn_lsh" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // filtered search: every label group holds >= 42 vectors at every
    // shipped sf, so the same-label top-5 is always full — the eval
    // pair count stays 5 per anchored query
    "q234_knn_filtered" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    "q54_knn_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // ingest queries are the BATCH members of the anchored query set
    "q277_incremental_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings
        |WHERE vec_id % 100 = 0 AND vec_id % 3 = 0 AND vec_id < 100000""".stripMargin,
    // erasure/compaction probes grade against the SURVIVING-corpus brute
    // reference restricted to surviving batch queries
    "q279_erasure_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings
        |WHERE vec_id % 100 = 0 AND vec_id % 3 = 0 AND vec_id % 7 <> 1
        |  AND vec_id < 100000""".stripMargin,
    "q280_compacted_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings
        |WHERE vec_id % 100 = 0 AND vec_id % 3 = 0 AND vec_id % 7 <> 1
        |  AND vec_id < 100000""".stripMargin,
    // retrain-and-swap serves the full grown corpus to the standard
    // anchored query set — same audit shape as q54/q292
    "q294_retrained_ivf" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    // the drift-aware probe serves the same anchored set from whichever
    // version the measured drift selected: q294's audit oracle shape
    "q316_drift_aware_retrain" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    "q224_knn_pq" ->
      """SELECT count(*) AS n_queries, count(*) * 5 AS n_eval_pairs,
        |  TRUE AS recall_ge_075
        |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 100000""".stripMargin,
    "q58_embedding_pairs_lsh" ->
      s"""$quantCte,
         |a AS (SELECT vec_id, qv, nrm FROM n
         |      WHERE vec_id % 10 = 0 AND vec_id < 10000),
         |p AS (SELECT DISTINCT least(a.vec_id, b.vec_id) a_id,
         |        greatest(a.vec_id, b.vec_id) b_id
         |      FROM a JOIN n b ON a.vec_id <> b.vec_id
         |      WHERE CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
         |            i -> a.qv[i] * b.qv[i])) AS DOUBLE)
         |          / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))
         |          >= 0.25)
         |SELECT CAST(count(*) AS BIGINT) AS n_anchor_pairs,
         |  TRUE AS anchor_recall_ge_075
         |FROM p""".stripMargin,
    "q94_semdedup" ->
      s"""$quantCte,
         |a AS (SELECT vec_id, qv, nrm FROM n
         |      WHERE vec_id % 10 = 0 AND vec_id < 10000),
         |dup AS (SELECT a.vec_id,
         |          max(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) d
         |        FROM a LEFT JOIN n b
         |          ON b.vec_id < a.vec_id
         |         AND CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
         |               i -> a.qv[i] * b.qv[i])) AS DOUBLE)
         |             / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))
         |             >= 0.25
         |        GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_anchors,
         |  CAST(sum(d) AS BIGINT) AS n_anchor_dups,
         |  TRUE AS drops_are_true_dups, TRUE AS anchor_recall_ge_085
         |FROM dup""".stripMargin,
    // q213 audit oracle: DuckDB recomputes the exact anchored
    // contamination verdicts (same integer-quantized cosine) and
    // asserts the precision/recall booleans as literal TRUE — the
    // Spark side computes them for real against the anchored exact
    // probe, so an LSH regression flips a bit → hash red
    "q213_semantic_decontam" ->
      s"""$quantCte,
         |a AS (SELECT vec_id, qv, nrm FROM n
         |      WHERE vec_id % 10 = 0 AND vec_id < 10000
         |        AND vec_id % 100 <> 0),
         |b AS (SELECT vec_id bench_id, qv bqv, nrm bnrm FROM n
         |      WHERE vec_id % 100 = 0),
         |fl AS (SELECT a.vec_id,
         |         max(CASE WHEN b.bench_id IS NOT NULL THEN 1 ELSE 0 END) f
         |       FROM a LEFT JOIN b
         |         ON CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
         |              i -> a.qv[i] * b.bqv[i])) AS DOUBLE)
         |            / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.bnrm AS DOUBLE)))
         |            >= 0.35
         |       GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_anchors,
         |  CAST(sum(f) AS BIGINT) AS n_anchor_flagged,
         |  TRUE AS flags_are_true, TRUE AS anchor_recall_ge_075
         |FROM fl""".stripMargin,
    // the same greedy, unrolled: each step is argmax(rel − max sim to
    // the selected set) with (score desc, doc_id) tie-break
    "q212_mmr_rerank" ->
      s"""$quantCte,
         |qq AS (SELECT qv qqv, nrm qnrm FROM n WHERE vec_id = 0),
         |cand AS (
         |  SELECT b.vec_id AS doc_id, b.qv, b.nrm,
         |    CAST(list_sum(list_transform(range(1, len(qqv) + 1),
         |        i -> qqv[i] * b.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(qnrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))
         |      AS rel
         |  FROM n b CROSS JOIN qq WHERE b.vec_id <> 0
         |  ORDER BY rel DESC, doc_id LIMIT 20),
         |sim AS (
         |  SELECT a.doc_id ai, b.doc_id bi,
         |    CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
         |        i -> a.qv[i] * b.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) s
         |  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id),
         |s1 AS (SELECT doc_id, rel FROM cand ORDER BY rel DESC, doc_id LIMIT 1),
         |p2 AS (SELECT c.doc_id, c.rel,
         |         (SELECT max(s) FROM sim WHERE sim.ai = c.doc_id
         |            AND sim.bi IN (SELECT doc_id FROM s1)) AS ms
         |       FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM s1)),
         |s2 AS (SELECT doc_id, rel FROM p2 ORDER BY rel - ms DESC, doc_id LIMIT 1),
         |sel2 AS (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2),
         |p3 AS (SELECT c.doc_id, c.rel,
         |         (SELECT max(s) FROM sim WHERE sim.ai = c.doc_id
         |            AND sim.bi IN (SELECT doc_id FROM sel2)) AS ms
         |       FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM sel2)),
         |s3 AS (SELECT doc_id, rel FROM p3 ORDER BY rel - ms DESC, doc_id LIMIT 1),
         |sel3 AS (SELECT doc_id FROM sel2 UNION ALL SELECT doc_id FROM s3),
         |p4 AS (SELECT c.doc_id, c.rel,
         |         (SELECT max(s) FROM sim WHERE sim.ai = c.doc_id
         |            AND sim.bi IN (SELECT doc_id FROM sel3)) AS ms
         |       FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM sel3)),
         |s4 AS (SELECT doc_id, rel FROM p4 ORDER BY rel - ms DESC, doc_id LIMIT 1),
         |sel4 AS (SELECT doc_id FROM sel3 UNION ALL SELECT doc_id FROM s4),
         |p5 AS (SELECT c.doc_id, c.rel,
         |         (SELECT max(s) FROM sim WHERE sim.ai = c.doc_id
         |            AND sim.bi IN (SELECT doc_id FROM sel4)) AS ms
         |       FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM sel4)),
         |s5 AS (SELECT doc_id, rel FROM p5 ORDER BY rel - ms DESC, doc_id LIMIT 1)
         |SELECT CAST(1 AS INT) AS rank, doc_id, rel FROM s1
         |UNION ALL SELECT 2, doc_id, rel FROM s2
         |UNION ALL SELECT 3, doc_id, rel FROM s3
         |UNION ALL SELECT 4, doc_id, rel FROM s4
         |UNION ALL SELECT 5, doc_id, rel FROM s5""".stripMargin,
    "q170_rrf_fusion" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
         |    AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |c AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
         |qt AS (SELECT DISTINCT term FROM terms WHERE doc_id = 0),
         |cand AS (
         |  SELECT tf.doc_id,
         |    CAST(sum((((1000 * c.n) // df.df) * 44 * tf.tf * c.t)
         |      // (20 * tf.tf * c.t + 6 * c.t + 18 * dl.dl * c.n)) AS BIGINT)
         |      AS bm25_mil
         |  FROM tf
         |  JOIN qt ON tf.term = qt.term
         |  JOIN df ON tf.term = df.term
         |  JOIN dl ON tf.doc_id = dl.doc_id
         |  CROSS JOIN c
         |  WHERE tf.doc_id <> 0
         |  GROUP BY tf.doc_id),
         |lex AS (
         |  SELECT doc_id, lex_rank FROM (
         |    SELECT doc_id, row_number() OVER (
         |      ORDER BY bm25_mil DESC, doc_id ASC) AS lex_rank
         |    FROM cand) WHERE lex_rank <= 50),
         |q AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) qv
         |  FROM embeddings),
         |nn AS (SELECT vec_id, qv,
         |    list_sum(list_transform(qv, x -> x * x)) nrm FROM q),
         |q0 AS (SELECT qv AS qqv, nrm AS qnrm FROM nn WHERE vec_id = 0),
         |vscored AS (
         |  SELECT b.vec_id AS doc_id,
         |    CAST(list_sum(list_transform(range(1, len(qqv) + 1), i -> qqv[i] * b.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(qnrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS qcos
         |  FROM nn b CROSS JOIN q0 WHERE b.vec_id <> 0),
         |vec AS (
         |  SELECT doc_id, vec_rank FROM (
         |    SELECT doc_id, row_number() OVER (
         |      ORDER BY qcos DESC, doc_id ASC) AS vec_rank
         |    FROM vscored) WHERE vec_rank <= 50),
         |fused AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    l.lex_rank, v.vec_rank,
         |    coalesce(1000000 // (60 + l.lex_rank), 0)
         |      + coalesce(1000000 // (60 + v.vec_rank), 0) AS rrf_ppm
         |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT doc_id, lex_rank, vec_rank, rrf_ppm,
         |  row_number() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) AS fused_rank
         |FROM fused
         |ORDER BY rrf_ppm DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q156_hybrid_search" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
         |    AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |c AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
         |qt AS (SELECT DISTINCT term FROM terms WHERE doc_id = 0),
         |cand AS (
         |  SELECT tf.doc_id,
         |    CAST(sum((((1000 * c.n) // df.df) * 44 * tf.tf * c.t)
         |      // (20 * tf.tf * c.t + 6 * c.t + 18 * dl.dl * c.n)) AS BIGINT)
         |      AS bm25_mil
         |  FROM tf
         |  JOIN qt ON tf.term = qt.term
         |  JOIN df ON tf.term = df.term
         |  JOIN dl ON tf.doc_id = dl.doc_id
         |  CROSS JOIN c
         |  WHERE tf.doc_id <> 0
         |  GROUP BY tf.doc_id
         |  ORDER BY bm25_mil DESC, tf.doc_id
         |  LIMIT 50),
         |qz AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) qv
         |  FROM embeddings),
         |nn AS (SELECT vec_id, qv,
         |    list_sum(list_transform(qv, x -> x * x)) nrm FROM qz),
         |qn AS (SELECT qv, nrm FROM nn WHERE vec_id = 0),
         |rr AS (
         |  SELECT cand.doc_id, cand.bm25_mil,
         |    CAST(list_sum(list_transform(range(1, len(qn.qv) + 1),
         |        i -> qn.qv[i] * nn.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(qn.nrm AS DOUBLE)) * sqrt(CAST(nn.nrm AS DOUBLE)))
         |      AS qcos
         |  FROM cand JOIN nn ON cand.doc_id = nn.vec_id CROSS JOIN qn)
         |SELECT doc_id, bm25_mil, qcos,
         |  CAST(row_number() OVER (ORDER BY qcos DESC, doc_id) AS INT) AS rank
         |FROM rr
         |ORDER BY qcos DESC, doc_id
         |LIMIT 10""".stripMargin,
    "q45_knn_brute" ->
      s"""$quantCte,
         |qs AS (SELECT vec_id q_id, qv qqv, nrm qnrm FROM n WHERE vec_id % 100 = 0),
         |scored AS (SELECT q_id, b.vec_id n_id,
         |    CAST(list_sum(list_transform(range(1, len(qqv) + 1), i -> qqv[i] * b.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(qnrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) qcos
         |  FROM qs JOIN n b ON q_id <> b.vec_id)
         |SELECT q_id, n_id, CAST(rank AS INT) AS rank, qcos FROM (
         |  SELECT q_id, n_id, qcos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, n_id ASC) rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    "q44_embedding_pairs" ->
      s"""$quantCte
         |SELECT a.vec_id a_id, b.vec_id b_id,
         |  CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
         |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) qcos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
         |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.25""".stripMargin)
}
