package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batch decode / feature-extract / resize / frame-sample.
  *
  * The container has no image/audio codecs, so the byte-level decode is a
  * clearly-marked deterministic stub ([[StubCodec]]) — but everything
  * Spark-side is real and tested: the binary column schema, the typed
  * metadata struct, partition-wise batched iteration (`mapPartitions`,
  * the Scala analog of a vectorized decode UDF), and the frame-sampling
  * explode.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row: opaque payload + typed metadata (the schema a real
    * pipeline would carry for images/audio/video).
    */
  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Decoded features per media item. */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, n_frames: Int, histogram: Array[Double])

  /** Deterministic stand-in for the real codec. A production deployment
    * swaps this object for one backed by an actual decoder (libjpeg /
    * ffmpeg via JNI or a sidecar); the Spark plumbing is unchanged.
    */
  object StubCodec {
    val FrameBytes = 64

    /** STUB "decode": a 16-bin byte histogram (stands in for pixel
      * statistics a real decoder would produce).
      */
    def decode(payload: Array[Byte]): Array[Double] = {
      val bins = new Array[Double](16)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) / 16) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < 16) { bins(j) /= payload.length; j += 1 }
      }
      bins
    }

    /** STUB "resize": keep every k-th byte (stands in for downsampling). */
    def resize(payload: Array[Byte], k: Int): Array[Byte] =
      payload.grouped(k).map(_.head).toArray
  }

  /** Build a media table from the documents table: the text payload as an
    * opaque binary column + metadata struct (real pipelines read
    * image/audio bytes the same way — `binaryFile` source or a parquet
    * binary column).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      length(col("text")).cast("long").as("n_bytes"))

  /** Partition-wise batched decode (the mapPartitions shape a vectorized
    * decode UDF would take): one codec instance per partition, streaming
    * iteration, no per-row setup cost.
    */
  def decodeFeatures(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here (the expensive part a
      // real decoder amortizes across the batch)
      rows.map { r =>
        val hist = StubCodec.decode(r.payload)
        val frames = (r.payload.length + StubCodec.FrameBytes - 1) / StubCodec.FrameBytes
        MediaFeatures(r.media_id, r.payload.length.toLong, frames, hist)
      }
    }
  }

  /** Oracle-checked metadata query over the binary column: byte length
    * and content hashes computed ON THE BINARY Spark-side (the DuckDB
    * oracle hashes the equivalent varchar bytes).
    */
  def blobMeta: Q = (s, d) =>
    mediaTable(s, d).select(
      col("media_id"),
      octet_length(col("payload")).as("n_bytes_m"),
      md5(col("payload")).as("payload_md5"),
      sha2(col("payload"), 256).as("payload_sha256"))

  /** Frame sampling: split each payload into fixed-size frames and emit
    * (media_id, frame_id, frame_md5) — the explode shape video
    * frame-extraction takes, oracle-checked via substring arithmetic.
    */
  def frameSample: Q = (s, d) => {
    val fb = StubCodec.FrameBytes
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), col("text"))
      .withColumn("frame_id",
        explode(sequence(lit(0), ((length(col("text")) - 1) / fb).cast("int"))))
      .select(col("media_id"), col("frame_id"),
        md5(expr(s"substring(text, frame_id * $fb + 1, $fb)").cast("binary")).as("frame_md5"))
  }

  /** Frame-level dedup — the video-pipeline primitive document-level
    * dedup (q40) can't express: identical FRAMES recur across different
    * media items (intros, stills, silence), and storage/training both
    * want one copy. One hash aggregation over [[frameSample]]'s frame
    * stream; the keeper is the smallest (media_id, frame_id) encoded as
    * one orderable key — `media_id·2³² + frame_id`, injective by
    * construction because frame/shot ordinals are 32-bit posexplode
    * positions (the previous ·10⁵ encoding collided for media with
    * ≥ 100 000 frames, silently merging distinct content classes in
    * any durable store carrying the keys). Only duplicated frames
    * surface, so the output is duplicate-sized, not corpus-sized.
    */
  def frameDedup: Q = (s, d) =>
    frameSample(s, d)
      .groupBy("frame_md5")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct("media_id").as("n_media"),
        min(col("media_id") * 4294967296L + col("frame_id")).as("keeper_key"))
      .where(col("n_copies") > 1)

  /** Perceptual 62-bit frame signature — the dHash/SimHash hybrid the
    * near-dup pass buckets on. Features are the frame's 61 overlapping
    * 4-byte windows (local texture, the stub analog of pixel-gradient
    * patches); each window's integer value (base-131 polynomial,
    * < 2^29 — no overflow anywhere) is scrambled by two Knuth
    * multiplicative constants, and the signature takes a SimHash
    * majority vote over the product's HIGH bits (bits 29..59 — the
    * well-mixed end of a multiplicative hash). One byte edit perturbs
    * at most 4 of 61 windows, so near-identical frames land within a
    * few bits; hashing makes the bits near-uniform, so band buckets
    * stay balanced where raw adjacent-compare bits (classic dHash)
    * measured 3 orders of magnitude hotter on text frames.
    *
    * Every operation is plain 64-bit integer arithmetic on values
    * < 2^61, so the DuckDB oracle replays it EXACTLY (list_transform +
    * list_sum over the same windows) — q243's pairs are fully
    * oracle-recomputable, no audit bound needed.
    */
  def frameSignature(frame: String): Long = {
    val C1 = 2654435761L
    val C2 = 2246822519L
    val v1 = new Array[Int](31)
    val v2 = new Array[Int](31)
    var c = 0
    while (c < frame.length) {
      // the no-overflow bound (window value < 2^29) and the DuckDB
      // oracle's character arithmetic both assume ASCII — fail the
      // task loudly on the first non-ASCII frame instead of silently
      // wrapping Scala-side while the oracle errors or diverges
      require(frame.charAt(c) < 128,
        s"frameSignature: non-ASCII char ${frame.charAt(c).toInt} — " +
          "signature parity with the relational oracle is ASCII-only")
      c += 1
    }
    var i = 0
    while (i + 3 < frame.length) {
      val w = ((frame.charAt(i).toLong * 131 + frame.charAt(i + 1)) * 131 +
        frame.charAt(i + 2)) * 131 + frame.charAt(i + 3)
      val p1 = w * C1
      val p2 = w * C2
      var j = 0
      while (j < 31) {
        if (((p1 >> (29 + j)) & 1L) == 1L) v1(j) += 1 else v1(j) -= 1
        if (((p2 >> (29 + j)) & 1L) == 1L) v2(j) += 1 else v2(j) -= 1
        j += 1
      }
      i += 1
    }
    var s = 0L
    var j = 0
    while (j < 31) {
      if (v1(j) >= 0) s |= 1L << j
      if (v2(j) >= 0) s |= 1L << (31 + j)
      j += 1
    }
    s
  }

  /** q243: perceptual frame NEAR-dup — the video-pipeline gap q148's
    * exact-hash dedup leaves open: re-encoded or lightly-edited frames
    * hash differently byte-wise but are perceptually the same. Shape:
    * (1) full 64-byte frames, deduplicated by exact content first
    * (identical frames are q148's job, and skipping them keeps the
    * near-dup output duplicate-sized instead of quadratic in the
    * largest exact-dup group); (2) one [[frameSignature]] per distinct
    * frame — signatures never leave the task, only (keeper, sig) rows
    * shuffle; (3) SimHash pigeonhole: 4 bands x 15 bits — a pair
    * within Hamming 3 differs in at most 3 of the 4 bands, so at
    * least one band matches exactly and the band equi-join has
    * RECALL 1 by construction (not probabilistic); (4) exact Hamming
    * verify (xor + bit_count) on the bucket candidates. Never
    * all-pairs; plan pinned BNLJ-free in MultimodalSpec, banded ==
    * brute-force pinned there too. At 100 TB: signatures are one scan,
    * the join shuffles |distinct frames| x 4 band rows, and hot
    * perceptual buckets (black frames, silence) are bounded by the
    * exact-dedup prepass — identical content collapsed to ONE
    * signature row per frame class.
    */
  def frameNearDup: Q = (s, d) => {
    val (_, classes) = frameClasses(s, d)
    val bands = sigBands(signClasses(s, classes))
    val a = bands.select(col("keeper").as("keeper_a"), col("sig").as("sa"),
      col("k"), col("bv"))
    val b = bands.select(col("keeper").as("keeper_b"), col("sig").as("sb"),
      col("k"), col("bv"))
    a.join(b, Seq("k", "bv")).where(col("keeper_a") < col("keeper_b"))
      .select(col("keeper_a"), col("keeper_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
  }

  /** Full 64-byte frames with their content-class keeper key — the
    * shared prepass of the frame-evidence operators (q243, q249).
    */
  private def frameClasses(s: SparkSession, d: String): (DataFrame, DataFrame) =
    frameClassesOf(Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), col("text")))

  /** The same prepass over an arbitrary media subset — the incremental
    * ingest (q270) frames ONLY its batch.
    */
  private def frameClassesOf(media: DataFrame): (DataFrame, DataFrame) = {
    val fb = StubCodec.FrameBytes
    val frames = media
      .withColumn("frame_id",
        explode(sequence(lit(0), (length(col("text")) / fb).cast("int"))))
      .select(col("media_id"), col("frame_id"),
        expr(s"substring(text, frame_id * $fb + 1, $fb)").as("frame"))
      .where(length(col("frame")) === fb)
    val classes = frames.groupBy("frame")
      .agg(min(col("media_id") * 4294967296L + col("frame_id")).as("keeper"))
    (frames, classes)
  }

  /** One [[frameSignature]] per content class — (keeper, sig) rows. */
  private def signClasses(s: SparkSession, classes: DataFrame): DataFrame = {
    import s.implicits._
    classes.select(col("keeper"), col("frame")).as[(Long, String)]
      .mapPartitions(_.map { case (k, f) => (k, frameSignature(f)) })
      .toDF("keeper", "sig")
  }

  /** The 4×15-bit pigeonhole bands of a (keeper, sig) relation. */
  private def sigBands(sigs: DataFrame): DataFrame =
    sigs.select(col("keeper"), col("sig"),
      explode(expr(
        "transform(sequence(0, 3), k -> struct(k AS k, shiftright(sig, k * 15) & 32767 AS bv))")).as("b"))
      .select(col("keeper"), col("sig"), col("b.k").as("k"), col("b.bv").as("bv"))

  /** One-time, idempotent materialization of the frame-evidence
    * relation q249 probes: the distinct frame content classes and the
    * verified perceptual near-dup pairs (q243's full pipeline). The
    * "index once, probe many" economics of q214 applied to frames —
    * the signature/band/verify work runs once per corpus, and every
    * downstream consumer (media scoring today; retention or dedup
    * passes tomorrow) reads the |classes|+|pairs|-sized parquet
    * instead of re-running the pipeline. Content-fingerprint keyed
    * (corpus regeneration invalidates), layout pinned (the building
    * JVM must not cap later scan parallelism), DONE-marker gated
    * (written after BOTH tables landed — a half-built artifact
    * rebuilds from scratch).
    */
  private val evidenceLock = new Object

  def ensureFrameEvidence(s: SparkSession, d: String): String = evidenceLock.synchronized {
    val path =
      s"${Tables.scratchDir}/graft-frame-evidence-${Tables.datasetTag(d, "documents")}"
    val done = new java.io.File(path, "DONE")
    if (!done.exists()) {
      val root = new java.io.File(path)
      if (root.exists()) Tables.deleteRecursively(root)
      val (_, classes) = frameClasses(s, d)
      classes.repartition(4, col("frame"))
        .write.mode("overwrite").parquet(s"$path/classes")
      frameNearDup(s, d).repartition(1)
        .write.mode("overwrite").parquet(s"$path/pairs")
      java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
    }
    path
  }

  /** q249: MEDIA-level near-dup detection — the decision product the
    * frame evidence exists for: which media PAIRS share enough
    * (exactly-equal or perceptually-near) frame content to be
    * duplicate candidates. Evidence relation = q243's verified
    * near-dup content pairs, symmetrized, plus the identity pair per
    * content class (two media sharing an exact frame). Score(A,B) =
    * number of distinct evidence content-pairs with one side occurring
    * in A and the other in B; pairs scoring ≥ 2 surface (a single
    * shared frame is weak evidence — intros, boilerplate). All
    * equi-joins over content-class keys; occurrence lists are
    * per-media frame-class sets (distinct), so heavy exact-dup groups
    * collapse before the join. Fully oracle-recomputable like q243.
    */
  def mediaNearDup: Q = (s, d) => {
    val ev = ensureFrameEvidence(s, d)
    val classes = s.read.parquet(s"$ev/classes")
    val pairs = s.read.parquet(s"$ev/pairs")
    val (frames, _) = frameClasses(s, d)
    val occ = frames.join(classes, "frame")
      .select(col("media_id"), col("keeper")).distinct()
    mediaPairRollup(occ, pairs, classes.select(col("keeper").as("ka")))
  }

  /** The media-pair scoring shared by q249/q270/q275 — evidence pairs
    * symmetrized plus the identity pair per content class (callers pass
    * the per-class keeper relation their index makes cheapest), joined
    * through per-media occurrence sets, scored by distinct evidence
    * content-pairs; `shared >= 2` surfaces. ONE definition so the floor
    * and the cp encoding cannot drift between the full, incremental,
    * and compacted forms — the invariance the shared oracle relies on.
    */
  private def mediaPairRollup(occ: DataFrame, pairs: DataFrame,
      identityKeepers: DataFrame,
      pairFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val sym = pairs.select(col("keeper_a").as("ka"), col("keeper_b").as("kb"))
      .unionAll(pairs.select(col("keeper_b").as("ka"), col("keeper_a").as("kb")))
      .unionAll(identityKeepers.select(col("ka"), col("ka").as("kb")))
    val joined = occ.select(col("media_id").as("media_a"), col("keeper").as("ka"))
      .join(sym, "ka")
      .join(occ.select(col("media_id").as("media_b"), col("keeper").as("kb")),
        Seq("kb"))
      .where(col("media_a") < col("media_b"))
    pairFilter.fold(joined)(f => joined.where(f))
      .select(col("media_a"), col("media_b"),
        concat_ws(":", least(col("ka"), col("kb")),
          greatest(col("ka"), col("kb"))).as("cp"))
      .groupBy("media_a", "media_b")
      .agg(countDistinct(col("cp")).as("shared"))
      .where(col("shared") >= 2)
  }

  /** One-time, idempotent materialization of the OLD-corpus
    * (media_id % 3 != 0) frame index — the persisted state the
    * incremental ingest (q270) probes, the q214/q235 prior-state
    * pattern applied to the multimodal family: the old content-class
    * map WITH signatures (so probes never re-sign old content), the
    * old per-media class occurrences (so scoring never rescans old
    * media), and the verified old×old near-dup class pairs (never
    * recomputed). Content-fingerprint keyed, layout pinned, DONE-gated
    * like [[ensureFrameEvidence]].
    */
  private val oldFrameIdxLock = new Object

  def ensureOldFrameIndex(s: SparkSession, d: String): String = oldFrameIdxLock.synchronized {
    val path =
      s"${Tables.scratchDir}/graft-old-frame-index-${Tables.datasetTag(d, "documents")}"
    val done = new java.io.File(path, "DONE")
    if (!done.exists()) {
      val root = new java.io.File(path)
      if (root.exists()) Tables.deleteRecursively(root)
      buildFrameIndex(s, Tables.documents(s, d)
        .where(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("media_id"), col("text")), path)
      java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
    }
    path
  }

  /** Build the {classes, occ, pairs} frame index for ANY media relation
    * — the from-scratch builder [[ensureOldFrameIndex]] runs on the old
    * corpus, and the rebuild-equivalence spec runs on the FULL corpus to
    * prove the q275 compaction bit-equal to a fresh build.
    */
  private[multimodal] def buildFrameIndex(s: SparkSession, media: DataFrame,
      path: String): Unit = {
    val (frames, classes) = frameClassesOf(media)
    val sigs = signClasses(s, classes)
    classes.join(sigs, "keeper").select("frame", "keeper", "sig")
      .repartition(4, col("frame"))
      .write.mode("overwrite").parquet(s"$path/classes")
    frames.join(classes, "frame")
      .select(col("media_id"), col("keeper")).distinct()
      .repartition(4, col("keeper"))
      .write.mode("overwrite").parquet(s"$path/occ")
    val bands = sigBands(sigs)
    bands.select(col("keeper").as("keeper_a"), col("sig").as("sa"),
        col("k"), col("bv"))
      .join(bands.select(col("keeper").as("keeper_b"), col("sig").as("sb"),
        col("k"), col("bv")), Seq("k", "bv"))
      .where(col("keeper_a") < col("keeper_b"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select(col("keeper_a"), col("keeper_b"))
      .distinct()
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/pairs")
  }

  /** q270: INCREMENTAL media near-dup ingest — the q214 probe-only
    * economics applied to the multimodal index, closing the one family
    * that still rebuilt its evidence from scratch per corpus: an
    * ingest batch (media_id % 3 == 0) is framed from ONE pruned
    * documents scan; batch classes equi-join the STORED old class map
    * on frame content (a hit unifies with the old class key — exact
    * sharing needs no signature at all); only the MISSES get signed,
    * and only miss-side bands drive the pigeonhole probe against the
    * stored old signatures plus the other misses (old×old pairs come
    * from the index, never recomputed). Occurrences = stored old
    * occurrences ∪ batch occurrences on the unified keys; the q249
    * roll-up then scores media pairs and the ingest product is every
    * pair TOUCHING the batch with ≥ 2 evidence. Class keys relabel
    * bijectively vs the full recompute (a hit keeps its OLD keeper
    * where q249's global min may sit in the batch), and the media-pair
    * output is invariant under that relabeling — which the oracle
    * proves: it is q249's full-recompute SQL filtered to
    * batch-touching pairs. Work is O(batch frames + miss signatures +
    * evidence), not corpus-sized; MultimodalSpec pins the single
    * pruned documents scan, the index probe, and equality with the
    * full q249 output filtered to touching pairs.
    */
  /** The batch-ingest overlay — everything q270's probe derives on top
    * of the stored old index, factored so the q275 compactor folds the
    * SAME relations the live ingest probes (segments are computed once,
    * not re-derived differently per consumer).
    */
  private final case class IngestOverlay(
      oldClasses: DataFrame, oldOcc: DataFrame, oldPairs: DataFrame,
      bClasses: DataFrame, unified: DataFrame, missSigs: DataFrame,
      bOcc: DataFrame, newPairs: DataFrame)

  private def ingestOverlay(s: SparkSession, d: String): IngestOverlay = {
    val idx = ensureOldFrameIndex(s, d)
    val oldClasses = s.read.parquet(s"$idx/classes") // frame, keeper, sig
    val oldOcc = s.read.parquet(s"$idx/occ")         // media_id, keeper
    val oldPairs = s.read.parquet(s"$idx/pairs")     // keeper_a, keeper_b
    // stage the batch ONCE: the pruned documents scan runs a single
    // time (an ingest job lands its batch before probing), and every
    // downstream reference works from the staged batch-frames relation
    // — without this the lazily-shared subtree re-scanned documents 12
    // times in the served plan
    val (bFrames0, _) = frameClassesOf(Tables.documents(s, d)
      .where(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"), col("text")))
    val bFrames = bFrames0.localCheckpoint(true)
    val bClasses = bFrames.groupBy("frame")
      .agg(min(col("media_id") * 4294967296L + col("frame_id")).as("keeper"))
    // unify: a batch class whose content the index already knows keeps
    // the OLD key (and needs no signature); a miss keeps its batch key
    val unified = bClasses.join(
        oldClasses.select(col("frame"), col("keeper").as("old_keeper")),
        Seq("frame"), "left")
      .select(col("frame"),
        coalesce(col("old_keeper"), col("keeper")).as("ckey"),
        col("old_keeper").isNull.as("is_miss"))
    val missSigs = signClasses(s,
      unified.where(col("is_miss")).select(col("ckey").as("keeper"), col("frame")))
      .localCheckpoint(true) // tiny; consumed by both probe sides
    val bOcc = bFrames.join(unified.select(col("frame"), col("ckey")), "frame")
      .select(col("media_id"), col("ckey").as("keeper")).distinct()
    // miss-driven pigeonhole probe against stored old sigs + other misses
    val allBands = sigBands(
      oldClasses.select(col("keeper"), col("sig")).unionByName(missSigs))
    val newPairs = sigBands(missSigs)
      .select(col("keeper").as("km"), col("sig").as("sm"), col("k"), col("bv"))
      .join(allBands.select(col("keeper").as("ko"), col("sig").as("so"),
        col("k"), col("bv")), Seq("k", "bv"))
      .where(col("km") =!= col("ko"))
      .select(least(col("km"), col("ko")).as("keeper_a"),
        greatest(col("km"), col("ko")).as("keeper_b"),
        bit_count(col("sm").bitwiseXOR(col("so"))).cast("int").as("hamming"))
      .where(col("hamming") <= 3)
      .select("keeper_a", "keeper_b")
      .distinct()
    IngestOverlay(oldClasses, oldOcc, oldPairs, bClasses, unified,
      missSigs, bOcc, newPairs)
  }

  def incrementalMediaNearDup: Q = (s, d) => {
    val ov = ingestOverlay(s, d)
    val allOcc = ov.oldOcc.unionByName(ov.bOcc)
    val pairs = ov.oldPairs.select("keeper_a", "keeper_b").unionByName(ov.newPairs)
    mediaPairRollup(allOcc, pairs,
      allOcc.select(col("keeper").as("ka")).distinct(),
      Some(col("media_a") % 3 === 0 || col("media_b") % 3 === 0))
  }

  /** One-time, idempotent DURABLE replay of the media corpus into a
    * STREAM-MAINTAINED frame index — the true stream-ingest cell for
    * the third index family (shingles have q291, vectors q292): each
    * micro-batch of media is framed ONCE, its classes unify against the
    * committed class map on exact frame content (a hit keeps its OLD
    * keeper and is never re-signed — q270's ingest economics per
    * batch), only the misses get signed and band-probed against the
    * stored signatures plus the batch's own misses, and the THREE
    * per-batch deltas — new classes (misses with signatures), batch
    * occurrences, newly verified near-dup class pairs — commit in ONE
    * atomic flip behind [[graft.store.ManifestStore.commitDeltaMulti]]:
    * the multi-relation commit this index is the motivating case for
    * (separately-flipped relations could serve an occ/pairs tear).
    * Every pair lands exactly once: a cross-batch near-dup is
    * discovered when its LATER side arrives as a miss and probes the
    * stored signatures; a same-batch pair canonicalizes through
    * least/greatest + distinct. Work per batch is O(batch frames +
    * miss signatures + evidence) plus index-file reads — history media
    * is never re-framed and hits are never re-signed.
    */
  private val frameStreamLock = new Object

  def ensureFrameStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    frameStreamLock.synchronized {
      frameStreamReplay(s, d,
        s"graft-frame-stream-idx-${Tables.datasetTag(d, "documents")}",
        foldAfter = 8)
    }

  /** Shared replay body of the frame stream stores ([[ensureFrameStreamIndex]],
    * the q314 folded store, the q313 erasure-folded store).
    */
  private def frameStreamReplay(s: SparkSession, d: String, dirName: String,
      foldAfter: Int): java.nio.file.Path = {
      import java.nio.file.{Files, Paths}
      import graft.store.ManifestStore.{commitDeltaMulti, committedManifest, manifestSnapshotRel}
      val root = Paths.get(s"${Tables.scratchDir}/$dirName")
      if (!Files.exists(root.resolve("DONE"))) {
        if (Files.exists(root)) Tables.deleteRecursively(root.toFile)
        val table = root.resolve("table")
        Files.createDirectories(table)
        val feed = graft.streaming.Streams.ensureDocsFeed(s, d)
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            if (!committedManifest(table).exists(_ >= id)) {
              val media = b.toDF()
                .select(col("doc_id").as("media_id"), col("text"))
              val (frames0, _) = frameClassesOf(media)
              val frames = frames0.localCheckpoint(true)
              val bClasses = frames.groupBy("frame")
                .agg(min(col("media_id") * 4294967296L + col("frame_id")).as("keeper"))
              val stored = manifestSnapshotRel(s, table, "classes")
              val unified = stored match {
                case None => bClasses.select(col("frame"),
                  col("keeper").as("ckey"), lit(true).as("is_miss"))
                case Some(sc) => bClasses.join(
                    sc.select(col("frame"), col("keeper").as("old_keeper")),
                    Seq("frame"), "left")
                  .select(col("frame"),
                    coalesce(col("old_keeper"), col("keeper")).as("ckey"),
                    col("old_keeper").isNull.as("is_miss"))
              }
              val missSigs = signClasses(s, unified.where(col("is_miss"))
                  .select(col("ckey").as("keeper"), col("frame")))
                .localCheckpoint(true)
              val bOcc = frames.join(unified.select("frame", "ckey"), "frame")
                .select(col("media_id"), col("ckey").as("keeper")).distinct()
              val storedSigs = stored.map(_.select("keeper", "sig"))
                .getOrElse(missSigs.limit(0))
              val allBands = sigBands(storedSigs.unionByName(missSigs))
              val newPairs = sigBands(missSigs)
                .select(col("keeper").as("km"), col("sig").as("sm"),
                  col("k"), col("bv"))
                .join(allBands.select(col("keeper").as("ko"),
                  col("sig").as("so"), col("k"), col("bv")), Seq("k", "bv"))
                .where(col("km") =!= col("ko"))
                .select(least(col("km"), col("ko")).as("keeper_a"),
                  greatest(col("km"), col("ko")).as("keeper_b"),
                  bit_count(col("sm").bitwiseXOR(col("so"))).cast("int").as("hamming"))
                .where(col("hamming") <= 3)
                .select("keeper_a", "keeper_b")
                .distinct()
              val classesDelta = unified.where(col("is_miss"))
                .select(col("frame"), col("ckey").as("keeper"))
                .join(missSigs, "keeper")
                .select("frame", "keeper", "sig")
              commitDeltaMulti(table, Map("classes" -> classesDelta,
                "occ" -> bOcc, "pairs" -> newPairs), id,
                foldAfter = foldAfter)
            }
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        Files.write(root.resolve("DONE"), Array.empty[Byte]): Unit
      }
      root.resolve("table")
  }

  /** The q314 store: the frame replay with `foldAfter = 2` — batch 2's
    * multi-relation commit crosses the threshold and folds ALL THREE
    * relations into fresh bases behind ONE manifest (the r14 verdict's
    * weak flag closed at query granularity): after the fold the
    * manifest lists exactly one base per relation, so a week of
    * minute-commits can never make a read union O(#batches) dirs.
    */
  private val foldedFrameStreamLock = new Object

  def ensureFoldedFrameStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    foldedFrameStreamLock.synchronized {
      frameStreamReplay(s, d,
        s"graft-frame-stream-fold-${Tables.datasetTag(d, "documents")}",
        foldAfter = 2)
    }

  /** q314: the q249 roll-up served from the FOLDED multi-relation frame
    * store — identical corpus coverage, identical relabeling-invariant
    * roll-up, q249's oracle verbatim; but every relation resolves from
    * ONE folded base dir (MultimodalSpec pins the all-bases manifest
    * shape and bit-equality with q305's multi-delta resolve).
    */
  def foldedStreamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureFoldedFrameStreamIndex(s, d)
    def rel(r: String) = manifestSnapshotRel(s, table, r)
      .getOrElse(sys.error(s"no committed frame-index $r"))
    mediaPairRollup(rel("occ"), rel("pairs").select("keeper_a", "keeper_b"),
      rel("classes").select(col("keeper").as("ka")))
  }

  /** The q313 store: the frame replay plus a REL-SCOPED erasure fold —
    * q306's forget set purged from the occurrence relation ONCE
    * (ManifestStore.eraseFoldRel: one rewritten occ base, classes and
    * pairs carried over untouched, one put-if-absent flip), after which
    * the roll-up plans no anti-join overlay. Content relations are
    * frame-keyed, not subject-keyed, so subject erasure leaves them in
    * place — dead classes contribute nothing to the occurrence-driven
    * roll-up (q278's argument, now applied at rest instead of per
    * read).
    */
  private val efoldFrameStreamLock = new Object

  def ensureErasureFoldedFrameStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    efoldFrameStreamLock.synchronized {
      val table = frameStreamReplay(s, d,
        s"graft-frame-stream-efold-${Tables.datasetTag(d, "documents")}",
        foldAfter = 8)
      val marker = table.getParent.resolve("EFOLD")
      if (!java.nio.file.Files.exists(marker)) {
        graft.store.ManifestStore.eraseFoldRel(table, "occ",
          mediaTombstones(s, d), Seq("media_id"))
        java.nio.file.Files.write(marker, Array.empty[Byte]): Unit
      }
      table
    }

  /** q313: q306's erased roll-up served from the ERASURE-FOLDED frame
    * store — q306's oracle verbatim, no anti-join in the plan, zero
    * erased media rows in any occ file the current manifest references.
    */
  def erasureFoldedStreamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureErasureFoldedFrameStreamIndex(s, d)
    def rel(r: String) = manifestSnapshotRel(s, table, r)
      .getOrElse(sys.error(s"no committed frame-index $r"))
    mediaPairRollup(rel("occ"), rel("pairs").select("keeper_a", "keeper_b"),
      rel("classes").select(col("keeper").as("ka")))
  }

  /** The q321 store: the frame replay plus a CONTENT-LEVEL erasure
    * rewrite — the stronger compliance cell q313 deliberately is not:
    * q313 purges the subject-keyed occurrences and argues dead classes
    * are harmless to the roll-up; but a class whose EVERY occurrence
    * was erased is content that existed only in erased media — its
    * 64-byte frame text and signature are themselves the data the
    * erasure request covers, and they must leave the files. This
    * rewrite drops (a) tombstoned media's occurrences, (b) classes
    * with no surviving occurrence, (c) pairs referencing a dropped
    * class — all three relations behind ONE flip
    * ([[graft.store.ManifestStore.commitRewriteMulti]]), reference-
    * counted content GC exactly as content-addressed stores do it.
    */
  private val contentGcFrameLock = new Object

  def ensureContentErasedFrameStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    contentGcFrameLock.synchronized {
      import graft.store.ManifestStore.{commitRewriteMulti, manifestSnapshotRel}
      val table = frameStreamReplay(s, d,
        s"graft-frame-stream-cgc-${Tables.datasetTag(d, "documents")}",
        foldAfter = 8)
      val marker = table.getParent.resolve("CGC")
      if (!java.nio.file.Files.exists(marker)) {
        def rel(r: String) = manifestSnapshotRel(s, table, r)
          .getOrElse(sys.error(s"no committed frame-index $r"))
        val tomb = broadcast(mediaTombstones(s, d))
        val occ = rel("occ").join(tomb, Seq("media_id"), "left_anti")
        val liveClasses = rel("classes")
          .join(occ.select("keeper").distinct(), Seq("keeper"), "left_semi")
        val livePairs = rel("pairs")
          .join(liveClasses.select(col("keeper").as("keeper_a")),
            Seq("keeper_a"), "left_semi")
          .join(liveClasses.select(col("keeper").as("keeper_b")),
            Seq("keeper_b"), "left_semi")
        commitRewriteMulti(table, Map(
          "occ" -> occ, "classes" -> liveClasses, "pairs" -> livePairs))
        java.nio.file.Files.write(marker, Array.empty[Byte]): Unit
      }
      table
    }

  /** q321: q306's erased roll-up served from the CONTENT-GC'd store —
    * same answer as q306/q313 (the roll-up is occurrence-driven, so
    * removing orphaned classes and pairs changes nothing: q306's
    * oracle verbatim), but now the files themselves carry no erased
    * content: MultimodalSpec pins zero tombstoned occurrences, zero
    * occurrence-less classes, zero dangling pair sides in the raw
    * bases.
    */
  def contentErasedStreamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureContentErasedFrameStreamIndex(s, d)
    def rel(r: String) = manifestSnapshotRel(s, table, r)
      .getOrElse(sys.error(s"no committed frame-index $r"))
    mediaPairRollup(rel("occ"), rel("pairs").select("keeper_a", "keeper_b"),
      rel("classes").select(col("keeper").as("ka")))
  }

  /** q305: the q249 media near-dup roll-up served from the
    * STREAM-MAINTAINED frame index — after the replay drains, the
    * resolved {classes, occ, pairs} cover the whole corpus, keeper
    * keys relabeled first-arrival-wins (a bijection of q249's
    * global-min keys, under which the media-pair roll-up is invariant
    * — q270's argument), so the output is exactly q249's: its oracle
    * verbatim. MultimodalSpec pins O(batch) commit deltas, the
    * single-flip multi-relation manifest shape, that hits are never
    * re-signed, and bit-equality of the roll-up with q249's.
    */
  def streamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureFrameStreamIndex(s, d)
    val classes = manifestSnapshotRel(s, table, "classes")
      .getOrElse(sys.error("no committed frame-index classes"))
    val occ = manifestSnapshotRel(s, table, "occ")
      .getOrElse(sys.error("no committed frame-index occurrences"))
    val pairs = manifestSnapshotRel(s, table, "pairs")
      .getOrElse(sys.error("no committed frame-index pairs"))
    mediaPairRollup(occ, pairs.select("keeper_a", "keeper_b"),
      classes.select(col("keeper").as("ka")))
  }

  /** q306: ERASURE on the STREAM-maintained frame index — the erase
    * cell that completes the symmetry across ALL FOUR stream stores
    * (sessions q290, shingles q293, vectors q296, frames here):
    * q278's forget set broadcasts into a LEFT ANTI overlay on the
    * manifest store's occurrence relation, and the q249 roll-up runs
    * against the overlaid store. The store is never rewritten
    * (O(|tombstones|) at plan time), the roll-up is occurrence-driven
    * so dead classes and pairs contribute nothing, and the output is
    * invariant under the stream store's first-arrival keeper
    * relabeling — it lands exactly on q278's surviving-corpus answer,
    * whose oracle it shares verbatim.
    */
  def erasedStreamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureFrameStreamIndex(s, d)
    val tomb = broadcast(mediaTombstones(s, d))
    val occ = manifestSnapshotRel(s, table, "occ")
      .getOrElse(sys.error("no committed frame-index occurrences"))
      .join(tomb, Seq("media_id"), "left_anti")
    val pairs = manifestSnapshotRel(s, table, "pairs")
      .getOrElse(sys.error("no committed frame-index pairs"))
    val classes = manifestSnapshotRel(s, table, "classes")
      .getOrElse(sys.error("no committed frame-index classes"))
    mediaPairRollup(occ, pairs.select("keeper_a", "keeper_b"),
      classes.select(col("keeper").as("ka")))
  }

  /** The q330 store: the frame replay plus a REL-SCOPED EQUALITY-DELETE
    * commit ([[graft.store.ManifestStore.commitDeleteFileRel]]) of
    * q306's forget set against the occurrence relation — erasure as an
    * O(|deletes|) COMMIT on the multi-relation store, completing the
    * same cost spectrum the single-relation shingle store closed in
    * r15: per-read overlay (q306) / delete-file commit (here) /
    * physical rel fold (q313), all three against the same oracle.
    */
  private val delFileFrameStreamLock = new Object

  def ensureDeleteFileFrameStreamIndex(s: SparkSession, d: String): java.nio.file.Path =
    delFileFrameStreamLock.synchronized {
      val table = frameStreamReplay(s, d,
        s"graft-frame-stream-delf-${Tables.datasetTag(d, "documents")}",
        foldAfter = 8)
      val marker = table.getParent.resolve("DELF")
      if (!java.nio.file.Files.exists(marker)) {
        graft.store.ManifestStore.commitDeleteFileRel(table, "occ",
          mediaTombstones(s, d), 3L)
        java.nio.file.Files.write(marker, Array.empty[Byte]): Unit
      }
      table
    }

  /** q330: the erased roll-up served through a committed REL-SCOPED
    * delete member — the probe carries NO tombstone logic at all
    * (compare q306's explicit anti-join): the occurrence relation's
    * resolve applies the `~occ:` delete member itself, sequence-scoped
    * below every consumer, while classes and pairs resolve untouched.
    * Lands exactly on q306/q313's surviving-corpus oracle; the erased
    * rows stay in the occ delta files until a fold absorbs the member
    * (MultimodalSpec pins ledger, physical presence, and bit-equality
    * with q306).
    */
  def deleteFileStreamMediaNearDup: Q = (s, d) => {
    import graft.store.ManifestStore.manifestSnapshotRel
    val table = ensureDeleteFileFrameStreamIndex(s, d)
    def rel(r: String) = manifestSnapshotRel(s, table, r)
      .getOrElse(sys.error(s"no committed frame-index $r"))
    mediaPairRollup(rel("occ"), rel("pairs").select("keeper_a", "keeper_b"),
      rel("classes").select(col("keeper").as("ka")))
  }

  /** q307: CHANGELOG of the multi-relation frame store — the rel-scoped
    * incremental read (q298/q302's contract on a store whose commits
    * carry several relations): a consumer holding the predecessor
    * manifest catches up by reading ONLY the occurrence delta the newer
    * manifest lists (batch 2's media), O(changes) never O(store).
    * Reported per changed media: its distinct content-class count —
    * which equals its distinct 64-byte frame contents, because the
    * occurrence relation is distinct on (media, class) and every frame
    * content maps to exactly one class key, so the count is relabeling-
    * proof. Exact oracle: DuckDB re-frames the changed docs' text.
    */
  def frameStoreChangelog: Q = (s, d) => {
    import graft.store.ManifestStore.{committedManifest, manifestChangesRel, retainedPredecessor}
    val table = ensureFrameStreamIndex(s, d)
    val cur = committedManifest(table)
      .getOrElse(sys.error("no committed frame-index snapshot"))
    val pred = retainedPredecessor(table, cur)
      .getOrElse(sys.error("no predecessor manifest retained"))
    manifestChangesRel(s, table, "occ", pred, cur)
      .groupBy("media_id").agg(count(lit(1)).as("n_classes"))
  }

  /** q309: TIME TRAVEL on the multi-relation store — the q297 read
    * contract where a version is N relations at once: the predecessor
    * manifest resolves {classes, occ, pairs} AS OF the same commit
    * (one manifest names all three, so the travelled read can never
    * mix a newer occ with an older pairs), and the roll-up over it
    * answers what the previous commit served — the buckets-0+1
    * corpus's near-dup report, relabeling-invariant as ever. Exact
    * oracle: the full roll-up SQL over documents outside bucket 2.
    */
  def timeTravelFrameStore: Q = (s, d) => {
    import graft.store.ManifestStore.{committedManifest, manifestSnapshotRelAt, retainedPredecessor}
    val table = ensureFrameStreamIndex(s, d)
    val cur = committedManifest(table)
      .getOrElse(sys.error("no committed frame-index snapshot"))
    val pred = retainedPredecessor(table, cur)
      .getOrElse(sys.error("no predecessor manifest retained"))
    def rel(r: String) = manifestSnapshotRelAt(s, table, r, pred)
      .getOrElse(sys.error(s"no $r relation at v$pred"))
    mediaPairRollup(rel("occ"), rel("pairs").select("keeper_a", "keeper_b"),
      rel("classes").select(col("keeper").as("ka")))
  }

  /** One-time, idempotent COMPACTION of the incrementally-maintained
    * media frame index — the q272 lifecycle step for the multimodal
    * family: fold the q270 ingest overlay (batch occurrences, miss
    * signatures, new pairs) into the stored old-corpus base and relabel
    * every class key CANONICALLY (the full-corpus minimum
    * media_id·2³²+frame_id — exactly the key a from-scratch rebuild
    * assigns, where an ingest hit keeps its OLD key even when the
    * batch holds the smaller one). The compacted {classes, occ, pairs}
    * are proven BIT-EQUAL to [[buildFrameIndex]] over the full corpus
    * in MultimodalSpec — compaction loses nothing and invents nothing —
    * and the q249 media roll-up served from it (q275) needs no
    * documents scan at all.
    */
  private val compactFrameIdxLock = new Object

  def ensureCompactedFrameIndex(s: SparkSession, d: String): String =
    compactFrameIdxLock.synchronized {
      val path =
        s"${Tables.scratchDir}/graft-compact-frame-index-${Tables.datasetTag(d, "documents")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        val root = new java.io.File(path)
        if (root.exists()) Tables.deleteRecursively(root)
        val ov = ingestOverlay(s, d)
        // per frame content: the pre-compaction key the overlay used
        // (old keeper for old/hit content, batch keeper for misses) and
        // the canonical full-corpus key (least of the two sides' minima)
        val relabel = ov.oldClasses
          .select(col("frame"), col("keeper").as("okey"), col("sig").as("osig"))
          .join(ov.bClasses.select(col("frame"), col("keeper").as("bkey")),
            Seq("frame"), "full_outer")
          .select(col("frame"),
            coalesce(col("okey"), col("bkey")).as("pre"),
            least(col("okey"), col("bkey")).as("canon"),
            col("osig"))
          .localCheckpoint(true) // feeds classes, occ relabel, pair relabel
        relabel
          .join(ov.missSigs.select(col("keeper").as("pre"), col("sig").as("msig")),
            Seq("pre"), "left")
          .select(col("frame"), col("canon").as("keeper"),
            coalesce(col("osig"), col("msig")).as("sig"))
          .repartition(4, col("frame"))
          .write.mode("overwrite").parquet(s"$path/classes")
        val keyMap = relabel.select(col("pre"), col("canon"))
        ov.oldOcc.unionByName(ov.bOcc)
          .join(keyMap, col("keeper") === col("pre"))
          .select(col("media_id"), col("canon").as("keeper"))
          .repartition(4, col("keeper"))
          .write.mode("overwrite").parquet(s"$path/occ")
        ov.oldPairs.select("keeper_a", "keeper_b").unionByName(ov.newPairs)
          .join(keyMap.select(col("pre").as("keeper_a"), col("canon").as("ca")),
            Seq("keeper_a"))
          .join(keyMap.select(col("pre").as("keeper_b"), col("canon").as("cb")),
            Seq("keeper_b"))
          .select(least(col("ca"), col("cb")).as("keeper_a"),
            greatest(col("ca"), col("cb")).as("keeper_b"))
          .distinct()
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/pairs")
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** q275: the q249 media near-dup roll-up served ENTIRELY from the
    * compacted index — no documents scan, no framing, no signing
    * anywhere in the plan (MultimodalSpec pins it): after compaction
    * the corpus-wide duplicate-candidate dashboard is an
    * index-files-only query, which is what the fold buys at 100 TB.
    * Same oracle as q249 (the full relational recompute) — compaction
    * provably changed nothing.
    */
  def compactedMediaRollup: Q = (s, d) => {
    val idx = ensureCompactedFrameIndex(s, d)
    val occ = s.read.parquet(s"$idx/occ")
    val pairs = s.read.parquet(s"$idx/pairs")
    // identity from classes (one row per class, no aggregate needed):
    // the compacted index stores it, so the roll-up is pure file reads
    mediaPairRollup(occ, pairs,
      s.read.parquet(s"$idx/classes").select(col("keeper").as("ka")))
  }

  /** Stand-in for the media erasure request queue — the q264 forget-set
    * shape (subject key % 7 == 1) on the media id. An aggregate-sized
    * id list read with a doc_id-only pruned scan: no erased media's
    * CONTENT is ever touched, which is the compliance property the
    * erasure audit checks. Shared by the q278 overlay roll-up and its
    * spec so both provably apply the same forget set.
    */
  private[multimodal] def mediaTombstones(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).where(col("doc_id") % 7 === 1)
      .select(col("doc_id").as("media_id"))

  /** q278: ERASURE-compliant maintenance of the media frame index — the
    * DELETE cell of the multimodal index family's lifecycle matrix
    * (q270 ingest, q275 compaction; q264 is the same cell for the
    * shingle index): a right-to-erasure batch of media ids is applied
    * to the compacted frame index as a TOMBSTONE overlay — the
    * aggregate-sized forget set broadcasts into a LEFT ANTI join on the
    * stored occurrence relation, and the q249 media roll-up runs
    * against the maintained index. The index is NOT rewritten (erasure
    * costs O(|tombstones|)); erased media's frames are never re-read —
    * the plan touches documents only for the doc_id-projected tombstone
    * list, never the text.
    *
    * Correctness: the roll-up is occurrence-driven, so classes whose
    * only occurrences were erased (and pairs referencing them)
    * contribute nothing once their occ rows are gone; surviving class
    * keys relabel bijectively vs a surviving-corpus rebuild (a class
    * whose keeper media was erased keeps its stale key in the overlay
    * where the rebuild re-mints the surviving minimum) and the media
    * pair output is invariant under that relabeling — which the oracle
    * proves: it is q249's full recompute over `documents WHERE
    * doc_id % 7 <> 1`. MultimodalSpec additionally pins equality with a
    * from-scratch index build over the surviving corpus, that no erased
    * id survives, and the anti-join overlay plan.
    */
  def erasedMediaRollup: Q = (s, d) => {
    val idx = ensureCompactedFrameIndex(s, d)
    val tomb = broadcast(mediaTombstones(s, d))
    val occ = s.read.parquet(s"$idx/occ")
      .join(tomb, Seq("media_id"), "left_anti")
    mediaPairRollup(occ, s.read.parquet(s"$idx/pairs"),
      s.read.parquet(s"$idx/classes").select(col("keeper").as("ka")))
  }

  /** One-time, idempotent TOMBSTONE-FOLD compaction of the media frame
    * index — the erasure→compaction step that completes the media
    * family's lifecycle symmetry with the shingle (q272) and IVF (q280)
    * indexes: q278's forget set folded into the compacted {classes,
    * occ, pairs} once, so every later roll-up drops the per-query
    * anti-join. Reads ONLY index files — the corpus (erased content
    * included) is never re-read: occurrences anti-join the tombstones,
    * classes keep only keys with a surviving occurrence, pairs keep
    * only live endpoints. Class keys stay STALE where the erased media
    * held the minimum (the q272 precedent — occ stores no frame_id, so
    * re-minting the surviving minimum would need a corpus scan, which
    * erasure compliance forbids); the roll-up is provably invariant:
    * dropped classes/pairs contributed zero occurrence rows, so the
    * folded probe is BIT-EQUAL to q278's overlay probe, which
    * MultimodalSpec pins along with zero erased ids, full class
    * liveness, and a pure index-read plan (no anti-join, no documents
    * scan at all — q278 still needs the doc_id-projected forget list;
    * after the fold even that is gone).
    */
  private val erasedFrameIdxLock = new Object

  def ensureErasureCompactedFrameIndex(s: SparkSession, d: String): String =
    erasedFrameIdxLock.synchronized {
      val idx = ensureCompactedFrameIndex(s, d)
      val path =
        s"${Tables.scratchDir}/graft-erased-frame-index-${Tables.datasetTag(d, "documents")}"
      val done = new java.io.File(path, "DONE")
      if (!done.exists()) {
        val root = new java.io.File(path)
        if (root.exists()) Tables.deleteRecursively(root)
        val tomb = broadcast(mediaTombstones(s, d))
        s.read.parquet(s"$idx/occ")
          .join(tomb, Seq("media_id"), "left_anti")
          .repartition(4, col("keeper"))
          .write.mode("overwrite").parquet(s"$path/occ")
        val live = s.read.parquet(s"$path/occ")
          .select(col("keeper")).distinct().localCheckpoint(true)
        s.read.parquet(s"$idx/classes")
          .join(live, Seq("keeper"), "left_semi")
          .repartition(4, col("frame"))
          .write.mode("overwrite").parquet(s"$path/classes")
        s.read.parquet(s"$idx/pairs")
          .join(live.select(col("keeper").as("keeper_a")), Seq("keeper_a"), "left_semi")
          .join(live.select(col("keeper").as("keeper_b")), Seq("keeper_b"), "left_semi")
          .select("keeper_a", "keeper_b")
          .repartition(1)
          .write.mode("overwrite").parquet(s"$path/pairs")
        java.nio.file.Files.write(done.toPath, Array.empty[Byte]): Unit
      }
      path
    }

  /** q287: the q278 erasure roll-up served from the TOMBSTONE-FOLDED
    * index — same oracle (the surviving-corpus full recompute), but the
    * plan is pure index reads: no anti-join, no tombstone list, no
    * documents scan of any kind. The q272→q264 economics applied to the
    * media family's delete cell, closing its ingest→compact→erase→
    * compact lifecycle.
    */
  def erasureCompactedMediaRollup: Q = (s, d) => {
    val idx = ensureErasureCompactedFrameIndex(s, d)
    mediaPairRollup(s.read.parquet(s"$idx/occ"), s.read.parquet(s"$idx/pairs"),
      s.read.parquet(s"$idx/classes").select(col("keeper").as("ka")))
  }

  /** Adjacent frames whose perceptual signatures differ by at least
    * this many of the 62 bits start a new shot. Measured on this corpus:
    * adjacent-frame Hamming distances center on ~19–20 (consecutive
    * frames of one document share vocabulary, so they sit well BELOW
    * the ~31-bit random baseline); 22 splits the distribution so both
    * boundaries and continuations occur at every sf (≈37% boundaries
    * at sf0.001).
    */
  val ShotCutBits = 22

  /** q253: shot segmentation — the video-pipeline operator that turns a
    * frame stream into temporal segments: a new shot starts where the
    * perceptual distance between CONSECUTIVE frames jumps (a cut), and
    * the product is per-media shot structure (how many shots, how long
    * the longest hold is). Complements the near-dup family: q243/q249
    * relate frames ACROSS media; this one segments the timeline WITHIN
    * each media item — the sampler that picks one keyframe per shot
    * (instead of one per N frames) hangs off this output.
    *
    * Shape: one [[frameSignature]] per DISTINCT frame (identical frames
    * — stills, silence — are signed once, q243's prepass economics),
    * joined back to the per-media frame sequence; the lag/cut/segment
    * chain runs in windows partitioned by `media_id` and bounded by
    * per-media frame counts (hundreds at most), never corpus-sized.
    * Everything is 64-bit integer arithmetic (signature, xor,
    * bit_count), so DuckDB replays the whole pipeline EXACTLY — a
    * perceptual operator with an exact relational oracle, like q243.
    */
  /** The per-media SIGNED frame timeline with its shot assignment —
    * the shared core of q253 (segment stats) and q254 (keyframe pick):
    * one [[frameSignature]] per distinct frame (q243's prepass
    * economics), joined back to the frame sequence, then the
    * lag/cut/running-sum chain in windows partitioned by `media_id`
    * (per-media frame counts are hundreds at most — never
    * corpus-sized window state).
    */
  private def shotFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (frames, classes) = frameClasses(s, d)
    val sigs = classes.select(col("frame")).as[String]
      .mapPartitions(_.map(f => (f, frameSignature(f))))
      .toDF("frame", "sig")
    val w = Window.partitionBy("media_id").orderBy("frame_id")
    frames.join(sigs, "frame")
      .select(col("media_id"), col("frame_id"), col("frame"), col("sig"))
      .withColumn("psig", lag("sig", 1).over(w))
      .withColumn("cut",
        when(col("psig").isNull, lit(0L))
          .otherwise((bit_count(col("sig").bitwiseXOR(col("psig")))
            >= ShotCutBits).cast("long")))
      .withColumn("shot_id",
        sum("cut").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("media_id"), col("frame_id"), col("frame"), col("sig"),
        col("shot_id"))
  }

  def shotSegmentation: Q = (s, d) =>
    shotFrames(s, d)
      .groupBy("media_id", "shot_id")
      .agg(count(lit(1)).as("shot_len"))
      .groupBy("media_id")
      .agg(sum("shot_len").as("n_frames"),
        count(lit(1)).as("n_shots"),
        max("shot_len").as("max_shot_len"))

  /** q254: keyframe-per-shot sampling — the training-data product the
    * shot structure exists for: ONE representative frame per
    * (media_id, shot_id), so frame sampling respects temporal
    * structure instead of q48's fixed stride (which over-samples long
    * static holds and can skip short shots entirely). The
    * representative is the shot's MEDOID by perceptual distance: the
    * frame minimizing the summed Hamming distance to every frame of
    * its own shot (the self-pair contributes 0 to every candidate
    * equally), ties broken by earliest frame_id — fully deterministic,
    * all 64-bit integer arithmetic, so the DuckDB oracle replays the
    * pick exactly. The pairwise step self-joins on (media_id,
    * shot_id): |shot|² work per shot with shots bounded by per-media
    * frame counts, an equi-join that shuffles timeline-sized rows —
    * never corpus-quadratic. Output carries frame_md5 so the sampler
    * plugs straight into q148-style downstream exact dedup.
    */
  /** The medoid keyframe row per (media_id, shot_id), with its frame
    * text and signature — q254's pick before the output projection,
    * shared with q260's shot-level near-dup.
    */
  private def keyframes(s: SparkSession, d: String): DataFrame = {
    val sf = shotFrames(s, d)
    val a = sf.select(col("media_id"), col("shot_id"),
      col("frame_id"), col("frame"), col("sig"))
    val b = sf.select(col("media_id"), col("shot_id"),
      col("sig").as("sig_b"))
    val cost = a.join(b, Seq("media_id", "shot_id"))
      .groupBy(col("media_id"), col("shot_id"), col("frame_id"),
        col("frame"), col("sig"))
      .agg(sum(bit_count(col("sig").bitwiseXOR(col("sig_b"))).cast("long"))
        .as("cost"))
    val pick = Window.partitionBy("media_id", "shot_id")
      .orderBy(col("cost"), col("frame_id"))
    cost.withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col("media_id"), col("shot_id"), col("frame_id"),
        col("frame"), col("sig"))
  }

  /** One-time, idempotent materialization of the keyframe relation —
    * the [[ensureFrameEvidence]] economics applied to the shot level:
    * the shot pipeline (signatures → timeline windows → medoid pick)
    * runs once per corpus and both consumers (q254's sampler output,
    * q260's scene-reuse join) probe the |shots|-sized parquet.
    * q253 stays the LIVE build-job exemplar of the pipeline (as q243
    * is for frames and q190 for pairs); content-fingerprint keyed,
    * layout pinned.
    */
  private val keyframesLock = new Object

  def ensureShotKeyframes(s: SparkSession, d: String): String =
    Tables.ensureParquetArtifact(keyframesLock,
      s"${Tables.scratchDir}/graft-shot-keyframes-${Tables.datasetTag(d, "documents")}") {
      keyframes(s, d).repartition(2, col("media_id"))
    }

  def keyframePerShot: Q = (s, d) =>
    s.read.parquet(ensureShotKeyframes(s, d))
      .select(col("media_id"), col("shot_id"), col("frame_id"),
        md5(col("frame").cast("binary")).as("frame_md5"))

  /** q260: shot-level near-dup ACROSS media — scene-reuse detection,
    * the composition the shot family builds toward: two media share a
    * "scene" when their shots' MEDOID keyframes are perceptually near
    * (Hamming ≤ 3 on the 62-bit signature, or identical). Shape is
    * q249's evidence economics applied one level up the hierarchy:
    * keyframe signatures collapse to distinct content CLASSES first
    * (a rebroadcast still lands in one class — hot classes never
    * explode the band join), classes pair via the 4×15-bit pigeonhole
    * + exact verify (recall 1 for Hamming ≤ 3, like q243), and the
    * class pairs (symmetrized, plus the identity per class) join back
    * through the per-shot occurrence list to emit cross-media shot
    * pairs. Output is reuse-evidence-sized: each matched shot pair
    * with its perceptual distance — frames→shots→scenes, all from one
    * signature pass. Fully integer → exact relational oracle.
    */
  def shotNearDup: Q = (s, d) => {
    val kf = s.read.parquet(ensureShotKeyframes(s, d))
      .select("media_id", "shot_id", "sig")
    val cls = kf.groupBy("sig")
      .agg(min(col("media_id") * 4294967296L + col("shot_id")).as("keeper"))
    val bands = cls.select(col("keeper"), col("sig"),
      explode(expr(
        "transform(sequence(0, 3), k -> struct(k AS k, shiftright(sig, k * 15) & 32767 AS bv))")).as("b"))
      .select(col("keeper"), col("sig"), col("b.k").as("k"), col("b.bv").as("bv"))
    val a = bands.select(col("keeper").as("ka"), col("sig").as("sa"),
      col("k"), col("bv"))
    val b2 = bands.select(col("keeper").as("kb"), col("sig").as("sb"),
      col("k"), col("bv"))
    val prs = a.join(b2, Seq("k", "bv")).where(col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
    val sym = prs
      .unionByName(prs.select(col("kb").as("ka"), col("ka").as("kb"),
        col("hamming")))
      .unionByName(cls.select(col("keeper").as("ka"),
        col("keeper").as("kb"), lit(0).as("hamming")))
    val occ = kf.join(cls, "sig")
      .select(col("media_id"), col("shot_id"), col("keeper"))
    occ.select(col("media_id").as("media_a"), col("shot_id").as("shot_a"),
      col("keeper").as("ka"))
      .join(sym, "ka")
      .join(occ.select(col("media_id").as("media_b"),
        col("shot_id").as("shot_b"), col("keeper").as("kb")), Seq("kb"))
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("shot_a"), col("media_b"), col("shot_b"),
        col("hamming"))
  }

  /** Audio-stub frame geometry: 128-sample windows advancing by a
    * 64-sample hop (50% OVERLAP — deliberately different from the
    * video frames' disjoint 64-byte tiling, to pin that the
    * binary-column machinery is not wed to one geometry). A window is
    * "silent" when its energy — Σ (sample − 64)², the squared
    * deviation from the stub codec's zero level — falls below
    * [[SilenceEnergy]] (measured: window energies span ≈207k–255k with
    * the median at ≈233k at every sf, so 230k keeps both classes live).
    */
  val AudioWin = 128
  val AudioHop = 64
  val SilenceEnergy = 230000L

  /** Integer window energy of an audio-stub frame — all 64-bit integer
    * arithmetic (ASCII-gated like [[frameSignature]]), so the DuckDB
    * oracle replays it exactly.
    */
  def audioEnergy(w: String): Long = {
    var e = 0L
    var i = 0
    while (i < w.length) {
      require(w.charAt(i) < 128,
        s"audioEnergy: non-ASCII char ${w.charAt(i).toInt} — energy " +
          "parity with the relational oracle is ASCII-only")
      val d = (w.charAt(i) - 64).toLong
      e += d * d
      i += 1
    }
    e
  }

  /** The overlapping audio-stub window stream for the corpus's
    * audio-mime media (doc_id % 2 — the stub mime dispatch).
    */
  private def audioWindows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("media_id"), col("text"))
      .withColumn("win_id", explode(sequence(lit(0),
        greatest((length(col("text")) - AudioWin) / AudioHop, lit(0)).cast("int"))))
      .select(col("media_id"), col("win_id"),
        expr(s"substring(text, win_id * $AudioHop + 1, $AudioWin)").as("win"))
      .where(length(col("win")) === AudioWin)

  /** q257: silence-segment detection over a SECOND mime type — the
    * audio sibling of q253's video shot segmentation, pinning that the
    * multimodal plumbing (opaque payloads, per-mime frame geometry,
    * distinct-frame feature extraction, per-media windowed
    * segmentation) generalizes beyond the text-frame stub: different
    * mime dispatch (doc_id % 2), different geometry (128-sample
    * windows, 64-sample hop, 50% overlap), different per-frame feature
    * (integer energy vs perceptual signature). Consecutive
    * below-threshold windows merge into silence segments via
    * gaps-and-islands (win_id − row_number per media — q120's island
    * machinery); output is the per-media audio QC row a curation
    * pipeline ships: window/silence counts and the longest silent
    * hold. Energies are computed once per DISTINCT window (q243's
    * prepass economics — stub "audio" repeats windows across media);
    * the windows/islands run per-media, never corpus-sized. All
    * integer arithmetic → exact relational oracle.
    */
  def silenceSegments: Q = (s, d) => {
    import s.implicits._
    val wins = audioWindows(s, d)
    val energies = wins.select(col("win")).distinct().as[String]
      .mapPartitions(_.map(w => (w, audioEnergy(w))))
      .toDF("win", "energy")
    val flagged = wins.join(energies, "win")
      .select(col("media_id"), col("win_id"),
        (col("energy") < SilenceEnergy).cast("int").as("silent"))
    val w = Window.partitionBy("media_id").orderBy("win_id")
    val segs = flagged.where(col("silent") === 1)
      .withColumn("grp", col("win_id") - row_number().over(w))
      .groupBy("media_id", "grp")
      .agg(count(lit(1)).as("seg_len"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_segments"), max("seg_len").as("max_segment_len"))
    flagged.groupBy("media_id")
      .agg(count(lit(1)).as("n_windows"), sum("silent").cast("long").as("n_silent"))
      .join(segs, Seq("media_id"), "left_outer")
      .select(col("media_id"), col("n_windows"), col("n_silent"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_segment_len"), lit(0L)).as("max_segment_len"))
  }

  /** Landmark fan-out window and pair-vote threshold for q267 (measured:
    * votes ≥ 3 keeps 8/2/43 aligned pairs at sf0.001/0.01/0.1 with the
    * max vote at 21, so both the threshold and the vote spread are live
    * at every sf).
    */
  val PeakTopK = 10
  val FanOutWins = 8
  val MinVotes = 3L

  /** q267: audio CONSTELLATION fingerprint matching — the Shazam-style
    * landmark alignment (Wang 2003) over the audio-mime corpus, the
    * third perceptual matcher after q243 (Hamming near-dup) and q260
    * (shot reuse), and a genuinely different capability: it finds media
    * that share audio content AT A CONSISTENT TIME OFFSET, which
    * bag-of-frames similarity cannot express. Per media: the top-K
    * highest-energy windows (energy once per DISTINCT window — q243's
    * prepass economics; deterministic (energy DESC, win_id) rank) are
    * the peaks; each peak pairs with the peaks up to [[FanOutWins]]
    * hops ahead into a landmark hash (quantized energy pair + gap, all
    * 64-bit integer); landmarks equi-join across media and each hit
    * votes for its (pair, time-offset); pairs keep offsets with ≥
    * [[MinVotes]] aligned votes. All integer arithmetic → exact
    * relational oracle.
    *
    * Scale shape: windows → distinct-window energies is one scan + one
    * keyed join; peaks are a per-media top-K window (media-bounded,
    * never corpus-sized); landmarks are |peaks|·fan-out; the cross-media
    * match is ONE equi-join on the landmark hash — the inverted-index
    * probe a production audio-match service runs — followed by an
    * aggregate on (pair, offset). Nothing is ever all-pairs on media,
    * and every join is a hash equi-join (BNLJ-free spec-pinned).
    */
  def audioConstellation: Q = (s, d) => {
    import s.implicits._
    val wins = audioWindows(s, d)
    val energies = wins.select(col("win")).distinct().as[String]
      .mapPartitions(_.map(w => (w, audioEnergy(w))))
      .toDF("win", "e")
    val rw = Window.partitionBy("media_id").orderBy(col("e").desc, col("win_id"))
    val peaks = wins.join(energies, "win")
      .select(col("media_id"), col("win_id"), col("e"))
      .withColumn("r", row_number().over(rw))
      .where(col("r") <= PeakTopK)
      .drop("r")
    val lm = peaks.select(col("media_id"), col("win_id").as("t1"), col("e").as("e1"))
      .join(peaks.select(col("media_id"), col("win_id").as("t2"), col("e").as("e2")),
        Seq("media_id"))
      .where((col("t2") - col("t1")).between(lit(1), lit(FanOutWins)))
      .select(col("media_id"), col("t1").as("t"),
        (expr("e1 div 100") * 40000000L + expr("e2 div 100") * 16L +
          (col("t2") - col("t1"))).as("h"))
    lm.select(col("media_id").as("media_a"), col("t").as("ta"), col("h"))
      .join(lm.select(col("media_id").as("media_b"), col("t").as("tb"), col("h")), Seq("h"))
      .where(col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"),
        (col("ta") - col("tb")).cast("long").as("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .where(col("votes") >= MinVotes)
  }

  val queries: Map[String, Q] = Map(
    "q267_audio_constellation" -> audioConstellation,
    "q47_blob_meta" -> blobMeta,
    "q48_frame_sample" -> frameSample,
    "q148_frame_dedup" -> frameDedup,
    "q243_frame_near_dup" -> frameNearDup,
    "q249_media_near_dup" -> mediaNearDup,
    "q275_compacted_media_rollup" -> compactedMediaRollup,
    "q278_erased_media_rollup" -> erasedMediaRollup,
    "q287_erasure_compacted_rollup" -> erasureCompactedMediaRollup,
    "q305_stream_frame_index" -> streamMediaNearDup,
    "q306_erased_stream_frame_index" -> erasedStreamMediaNearDup,
    "q313_erasure_folded_frame_index" -> erasureFoldedStreamMediaNearDup,
    "q330_delete_file_frame_index" -> deleteFileStreamMediaNearDup,
    "q321_content_erased_frame_index" -> contentErasedStreamMediaNearDup,
    "q314_folded_frame_index" -> foldedStreamMediaNearDup,
    "q307_frame_store_changelog" -> frameStoreChangelog,
    "q309_time_travel_frame_store" -> timeTravelFrameStore,
    "q270_incremental_media_near_dup" -> incrementalMediaNearDup,
    "q253_shot_segmentation" -> shotSegmentation,
    "q254_keyframe_per_shot" -> keyframePerShot,
    "q257_silence_segments" -> silenceSegments,
    "q260_shot_near_dup" -> shotNearDup)

  /** The signature CTE chain shared by every frame-evidence oracle
    * (q243, q249, q253, q254): frames → distinct content classes →
    * per-frame [[frameSignature]] replayed as pure integer SQL. `sg`
    * carries BOTH the frame text (for joining back to the per-media
    * sequence) and the keeper key (for the cross-media pair joins).
    */
  /** [[frameSigCtes]] over a corpus restricted by `w` (a WHERE suffix on
    * the documents scan, "" = full corpus) — the q278 erasure oracle
    * replays the identical pipeline over the surviving corpus only.
    */
  private def frameSigCtesW(w: String): String =
    s"""fr AS (
      |  SELECT media_id, frame_id,
      |    substr(text, frame_id * 64 + 1, 64) AS frame
      |  FROM (SELECT doc_id AS media_id, text,
      |          unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
      |        FROM documents$w)
      |  WHERE length(substr(text, frame_id * 64 + 1, 64)) = 64),
      |d AS (SELECT frame, min(media_id * 4294967296 + frame_id) AS keeper
      |      FROM fr GROUP BY frame),
      |w AS (SELECT frame, keeper,
      |  list_transform(range(1, 62), i ->
      |    ((CAST(ascii(substr(frame, i, 1)) AS BIGINT) * 131
      |      + ascii(substr(frame, i + 1, 1))) * 131
      |      + ascii(substr(frame, i + 2, 1))) * 131
      |      + ascii(substr(frame, i + 3, 1))) AS ws
      |  FROM d),
      |sg AS (SELECT frame, keeper,
      |  list_sum(list_transform(range(0, 31), j ->
      |    CASE WHEN list_sum(list_transform(ws, x ->
      |      CASE WHEN (((x * 2654435761) >> (29 + CAST(j AS INT))) & 1) = 1
      |        THEN 1 ELSE -1 END)) >= 0
      |    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END))
      |  + list_sum(list_transform(range(0, 31), j ->
      |    CASE WHEN list_sum(list_transform(ws, x ->
      |      CASE WHEN (((x * 2246822519) >> (29 + CAST(j AS INT))) & 1) = 1
      |        THEN 1 ELSE -1 END)) >= 0
      |    THEN (CAST(1 AS BIGINT) << (31 + CAST(j AS INT))) ELSE 0 END))
      |  AS sig
      |  FROM w)""".stripMargin

  private val frameSigCtes: String = frameSigCtesW("")

  /** q243's relational replay, shared verbatim by q249's oracle; the
    * corpus-restricted form feeds the q278 erasure oracle.
    */
  private def frameNearDupSqlW(w: String): String =
    s"""WITH ${frameSigCtesW(w)},
      |b AS (SELECT keeper, sig, k, (sig >> (CAST(k AS INT) * 15)) & 32767 AS bv
      |      FROM (SELECT keeper, sig, unnest(range(0, 4)) AS k FROM sg))
      |SELECT DISTINCT a.keeper AS keeper_a, b2.keeper AS keeper_b,
      |  CAST(bit_count(xor(a.sig, b2.sig)) AS INT) AS hamming
      |FROM b a JOIN b b2
      |  ON a.k = b2.k AND a.bv = b2.bv AND a.keeper < b2.keeper
      |WHERE bit_count(xor(a.sig, b2.sig)) <= 3""".stripMargin

  private val frameNearDupSql: String = frameNearDupSqlW("")

  /** q253's per-media signed frame sequence with lag/cut/shot columns —
    * shared by the q253 and q254 oracles.
    */
  private val shotCtes: String =
    s"""$frameSigCtes,
      |seq AS (SELECT f.media_id, f.frame_id, sg.frame, sg.sig
      |        FROM fr f JOIN sg ON f.frame = sg.frame),
      |lg AS (SELECT media_id, frame_id, frame, sig,
      |  lag(sig) OVER (PARTITION BY media_id ORDER BY frame_id) AS psig
      |  FROM seq),
      |ct AS (SELECT media_id, frame_id, frame, sig,
      |  CASE WHEN psig IS NULL THEN 0
      |       WHEN bit_count(xor(sig, psig)) >= $ShotCutBits THEN 1
      |       ELSE 0 END AS cut FROM lg),
      |sh AS (SELECT media_id, frame_id, frame, sig,
      |  sum(cut) OVER (PARTITION BY media_id ORDER BY frame_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot_id
      |  FROM ct)""".stripMargin

  /** q249's full relational recompute — shared verbatim by q275: the
    * roll-up served from the compacted index must land exactly where a
    * from-scratch recompute lands.
    */
  private def mediaRollupOracleW(w: String): String =
    s"""WITH pairs AS (${frameNearDupSqlW(w)}),
      |fr AS (
      |  SELECT media_id, frame_id,
      |    substr(text, frame_id * 64 + 1, 64) AS frame
      |  FROM (SELECT doc_id AS media_id, text,
      |          unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
      |        FROM documents$w)
      |  WHERE length(substr(text, frame_id * 64 + 1, 64)) = 64),
      |d AS (SELECT frame, min(media_id * 4294967296 + frame_id) AS keeper
      |      FROM fr GROUP BY frame),
      |occ AS (SELECT DISTINCT f.media_id, d.keeper
      |        FROM fr f JOIN d ON f.frame = d.frame),
      |sym AS (
      |  SELECT keeper_a AS ka, keeper_b AS kb FROM pairs
      |  UNION ALL SELECT keeper_b, keeper_a FROM pairs
      |  UNION ALL SELECT keeper, keeper FROM d),
      |sc AS (
      |  SELECT a.media_id AS media_a, b.media_id AS media_b,
      |    least(s.ka, s.kb) AS c1, greatest(s.ka, s.kb) AS c2
      |  FROM occ a JOIN sym s ON a.keeper = s.ka
      |  JOIN occ b ON b.keeper = s.kb AND a.media_id < b.media_id)
      |SELECT media_a, media_b,
      |  CAST(count(DISTINCT CAST(c1 AS VARCHAR) || ':' || CAST(c2 AS VARCHAR))
      |    AS BIGINT) AS shared
      |FROM sc GROUP BY 1, 2 HAVING shared >= 2""".stripMargin

  private val mediaRollupOracle: String = mediaRollupOracleW("")

  val oracles: Map[String, String] = Map(
    "q275_compacted_media_rollup" -> mediaRollupOracle,
    // erasure must land exactly where a from-scratch recompute over the
    // SURVIVING corpus lands — class keys relabel bijectively between
    // the overlay and the rebuild, and media pairs are invariant under
    // that relabeling, so the corpus-filtered full recompute is the oracle
    "q278_erased_media_rollup" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    // the tombstone-folded index must serve the identical roll-up —
    // dropped classes/pairs contributed zero occurrence rows
    "q287_erasure_compacted_rollup" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    // the stream-maintained frame index serves the full-corpus roll-up:
    // q249's oracle verbatim (keeper relabeling is a bijection the
    // media-pair output is invariant under)
    "q305_stream_frame_index" -> mediaRollupOracle,
    // erasure on the stream store lands on q278's surviving-corpus
    // answer: the same roll-up oracle over documents sans the forget set
    "q306_erased_stream_frame_index" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    // the erasure-FOLDED store serves q306's answer with the overlay
    // folded away; the FOLDED store serves q305's (q249's) verbatim
    "q313_erasure_folded_frame_index" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    "q321_content_erased_frame_index" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    // the rel-scoped delete-file commit serves the same surviving
    // answer as the overlay and the fold: the spectrum's middle point
    "q330_delete_file_frame_index" -> mediaRollupOracleW(" WHERE doc_id % 7 <> 1"),
    "q314_folded_frame_index" -> mediaRollupOracle,
    // the occ changelog is batch 2's media: per changed media its
    // distinct 64-byte frame contents, re-framed from text by DuckDB
    "q307_frame_store_changelog" ->
      """WITH fr AS (
        |  SELECT media_id, frame_id,
        |    substr(text, frame_id * 64 + 1, 64) AS frame
        |  FROM (SELECT doc_id AS media_id, text,
        |          unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
        |        FROM documents WHERE doc_id % 3 = 2)
        |  WHERE length(substr(text, frame_id * 64 + 1, 64)) = 64)
        |SELECT media_id, count(DISTINCT frame) AS n_classes
        |FROM fr GROUP BY 1""".stripMargin,
    // the predecessor read answers over the first two buckets' corpus:
    // the full roll-up recomputed over documents outside bucket 2
    "q309_time_travel_frame_store" -> mediaRollupOracleW(" WHERE doc_id % 3 <> 2"),
    "q47_blob_meta" ->
      """SELECT doc_id AS media_id, CAST(length(text) AS INT) AS n_bytes_m,
        |  md5(text) AS payload_md5, sha256(text) AS payload_sha256
        |FROM documents""".stripMargin,
    "q48_frame_sample" ->
      """SELECT media_id, CAST(frame_id AS INT) AS frame_id,
        |  md5(substr(text, frame_id * 64 + 1, 64)) AS frame_md5
        |FROM (SELECT doc_id AS media_id, text,
        |        unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
        |      FROM documents)""".stripMargin,
    // the full near-dup pipeline replayed relationally: same windows,
    // same multiplicative-hash SimHash, same 4x15-bit pigeonhole bands,
    // same exact Hamming verify — bit-for-bit the pairs Spark emits
    "q243_frame_near_dup" -> frameNearDupSql,
    // frame evidence rolled up to MEDIA pairs: q243's pairs (symmetrized)
    // plus identity per content class, joined through per-media distinct
    // frame-class occurrence sets, scored by distinct evidence pairs
    "q249_media_near_dup" -> mediaRollupOracle,
    // the incremental ingest must land exactly on the FULL q249
    // recompute filtered to batch-touching pairs — class keys relabel
    // bijectively between the two paths, and media pairs are invariant
    // under that relabeling, so the full-recompute SQL is the oracle
    "q270_incremental_media_near_dup" ->
      (s"""WITH pairs AS ($frameNearDupSql),
        |fr AS (
        |  SELECT media_id, frame_id,
        |    substr(text, frame_id * 64 + 1, 64) AS frame
        |  FROM (SELECT doc_id AS media_id, text,
        |          unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
        |        FROM documents)
        |  WHERE length(substr(text, frame_id * 64 + 1, 64)) = 64),
        |d AS (SELECT frame, min(media_id * 4294967296 + frame_id) AS keeper
        |      FROM fr GROUP BY frame),
        |occ AS (SELECT DISTINCT f.media_id, d.keeper
        |        FROM fr f JOIN d ON f.frame = d.frame),
        |sym AS (
        |  SELECT keeper_a AS ka, keeper_b AS kb FROM pairs
        |  UNION ALL SELECT keeper_b, keeper_a FROM pairs
        |  UNION ALL SELECT keeper, keeper FROM d),
        |sc AS (
        |  SELECT a.media_id AS media_a, b.media_id AS media_b,
        |    least(s.ka, s.kb) AS c1, greatest(s.ka, s.kb) AS c2
        |  FROM occ a JOIN sym s ON a.keeper = s.ka
        |  JOIN occ b ON b.keeper = s.kb AND a.media_id < b.media_id
        |  WHERE a.media_id % 3 = 0 OR b.media_id % 3 = 0)
        |SELECT media_a, media_b,
        |  CAST(count(DISTINCT CAST(c1 AS VARCHAR) || ':' || CAST(c2 AS VARCHAR))
        |    AS BIGINT) AS shared
        |FROM sc GROUP BY 1, 2 HAVING shared >= 2""".stripMargin),
    // the full shot pipeline replayed relationally: same signatures,
    // same lag/cut/running-sum chain, aggregated to per-media shot stats
    "q253_shot_segmentation" ->
      (s"""WITH $shotCtes,
        |sl AS (SELECT media_id, shot_id, count(*) AS shot_len
        |       FROM sh GROUP BY 1, 2)
        |SELECT media_id, CAST(sum(shot_len) AS BIGINT) AS n_frames,
        |  count(*) AS n_shots, CAST(max(shot_len) AS BIGINT) AS max_shot_len
        |FROM sl GROUP BY media_id""".stripMargin),
    // the medoid pick replayed exactly: per-shot pairwise Hamming sums,
    // argmin by (cost, frame_id)
    "q254_keyframe_per_shot" ->
      (s"""WITH $shotCtes,
        |pc AS (SELECT a.media_id, a.shot_id, a.frame_id, a.frame,
        |  sum(bit_count(xor(a.sig, b.sig))) AS cost
        |  FROM sh a JOIN sh b
        |    ON a.media_id = b.media_id AND a.shot_id = b.shot_id
        |  GROUP BY 1, 2, 3, 4),
        |rk AS (SELECT media_id, shot_id, frame_id, frame,
        |  row_number() OVER (PARTITION BY media_id, shot_id
        |    ORDER BY cost, frame_id) AS rn FROM pc)
        |SELECT media_id, CAST(shot_id AS BIGINT) AS shot_id,
        |  CAST(frame_id AS INT) AS frame_id, md5(frame) AS frame_md5
        |FROM rk WHERE rn = 1""".stripMargin),
    // shots → medoid keyframes → class pairs → cross-media shot pairs,
    // every step replayed relationally (shared shot/medoid CTEs)
    "q260_shot_near_dup" ->
      (s"""WITH $shotCtes,
        |pc AS (SELECT a.media_id, a.shot_id, a.frame_id, a.sig,
        |  sum(bit_count(xor(a.sig, b.sig))) AS cost
        |  FROM sh a JOIN sh b
        |    ON a.media_id = b.media_id AND a.shot_id = b.shot_id
        |  GROUP BY 1, 2, 3, 4),
        |kf AS (SELECT media_id, shot_id, sig FROM (
        |  SELECT media_id, shot_id, sig,
        |    row_number() OVER (PARTITION BY media_id, shot_id
        |      ORDER BY cost, frame_id) AS rn FROM pc) WHERE rn = 1),
        |cls AS (SELECT sig, min(media_id * 4294967296 + shot_id) AS keeper
        |        FROM kf GROUP BY sig),
        |bnd AS (SELECT keeper, sig, k,
        |    (sig >> (CAST(k AS INT) * 15)) & 32767 AS bv
        |  FROM (SELECT keeper, sig, unnest(range(0, 4)) AS k FROM cls)),
        |prs AS (SELECT DISTINCT a.keeper AS ka, b2.keeper AS kb,
        |    CAST(bit_count(xor(a.sig, b2.sig)) AS INT) AS hamming
        |  FROM bnd a JOIN bnd b2
        |    ON a.k = b2.k AND a.bv = b2.bv AND a.keeper < b2.keeper
        |  WHERE bit_count(xor(a.sig, b2.sig)) <= 3),
        |sym AS (SELECT ka, kb, hamming FROM prs
        |  UNION ALL SELECT kb, ka, hamming FROM prs
        |  UNION ALL SELECT keeper, keeper, 0 FROM cls),
        |occ AS (SELECT kf.media_id, kf.shot_id, cls.keeper
        |        FROM kf JOIN cls ON kf.sig = cls.sig)
        |SELECT a.media_id AS media_a, CAST(a.shot_id AS BIGINT) AS shot_a,
        |  b.media_id AS media_b, CAST(b.shot_id AS BIGINT) AS shot_b,
        |  CAST(s.hamming AS INT) AS hamming
        |FROM occ a JOIN sym s ON a.keeper = s.ka
        |JOIN occ b ON b.keeper = s.kb
        |WHERE a.media_id < b.media_id""".stripMargin),
    // the constellation pipeline replayed relationally: same windows
    // and energies as q257, deterministic top-K peaks, landmark hashes,
    // cross-media hash join, offset voting — all integer
    "q267_audio_constellation" ->
      (s"""WITH w AS (
        |  SELECT media_id, win_id,
        |    substr(text, win_id * $AudioHop + 1, $AudioWin) AS win
        |  FROM (SELECT doc_id AS media_id, text,
        |          unnest(range(0,
        |            greatest((length(text) - $AudioWin) // $AudioHop + 1, 1)))
        |            AS win_id
        |        FROM documents WHERE doc_id % 2 = 0)
        |  WHERE length(substr(text, win_id * $AudioHop + 1, $AudioWin)) = $AudioWin),
        |e AS (SELECT win,
        |  list_sum(list_transform(range(1, ${AudioWin + 1}), i ->
        |    CAST((ascii(substr(win, i, 1)) - 64)
        |      * (ascii(substr(win, i, 1)) - 64) AS BIGINT))) AS en
        |  FROM (SELECT DISTINCT win FROM w)),
        |f AS (SELECT media_id, win_id, en FROM w JOIN e ON w.win = e.win),
        |rk AS (SELECT media_id, win_id, en,
        |        row_number() OVER (PARTITION BY media_id
        |          ORDER BY en DESC, win_id) AS r
        |       FROM f),
        |peaks AS (SELECT media_id, win_id, en FROM rk WHERE r <= $PeakTopK),
        |lm AS (SELECT a.media_id, a.win_id AS t,
        |        (a.en // 100) * 40000000 + (b.en // 100) * 16
        |          + (b.win_id - a.win_id) AS h
        |       FROM peaks a JOIN peaks b ON a.media_id = b.media_id
        |        AND b.win_id - a.win_id BETWEEN 1 AND $FanOutWins)
        |SELECT x.media_id AS media_a, y.media_id AS media_b,
        |  CAST(x.t - y.t AS BIGINT) AS t_offset, count(*) AS votes
        |FROM lm x JOIN lm y ON x.h = y.h AND x.media_id < y.media_id
        |GROUP BY 1, 2, 3
        |HAVING count(*) >= $MinVotes""".stripMargin),
    // the audio-stub pipeline replayed relationally: same overlapping
    // windows, same integer energies, same islands
    "q257_silence_segments" ->
      (s"""WITH w AS (
        |  SELECT media_id, win_id,
        |    substr(text, win_id * $AudioHop + 1, $AudioWin) AS win
        |  FROM (SELECT doc_id AS media_id, text,
        |          unnest(range(0,
        |            greatest((length(text) - $AudioWin) // $AudioHop + 1, 1)))
        |            AS win_id
        |        FROM documents WHERE doc_id % 2 = 0)
        |  WHERE length(substr(text, win_id * $AudioHop + 1, $AudioWin)) = $AudioWin),
        |e AS (SELECT win,
        |  list_sum(list_transform(range(1, ${AudioWin + 1}), i ->
        |    CAST((ascii(substr(win, i, 1)) - 64)
        |      * (ascii(substr(win, i, 1)) - 64) AS BIGINT))) AS energy
        |  FROM (SELECT DISTINCT win FROM w)),
        |f AS (SELECT media_id, win_id,
        |  CASE WHEN energy < $SilenceEnergy THEN 1 ELSE 0 END AS silent
        |  FROM w JOIN e ON w.win = e.win),
        |seg AS (
        |  SELECT media_id, count(*) AS seg_len
        |  FROM (SELECT media_id, win_id,
        |          win_id - row_number() OVER (PARTITION BY media_id
        |            ORDER BY win_id) AS grp
        |        FROM f WHERE silent = 1)
        |  GROUP BY media_id, grp),
        |sm AS (SELECT media_id, count(*) AS n_segments,
        |         max(seg_len) AS max_segment_len
        |       FROM seg GROUP BY media_id)
        |SELECT f.media_id, count(*) AS n_windows,
        |  CAST(sum(silent) AS BIGINT) AS n_silent,
        |  coalesce(any_value(sm.n_segments), 0) AS n_segments,
        |  CAST(coalesce(any_value(sm.max_segment_len), 0) AS BIGINT)
        |    AS max_segment_len
        |FROM f LEFT JOIN sm ON f.media_id = sm.media_id
        |GROUP BY f.media_id""".stripMargin),
    // q48's frame stream, aggregated per content hash
    "q148_frame_dedup" ->
      """WITH f AS (
        |  SELECT media_id, frame_id,
        |    md5(substr(text, frame_id * 64 + 1, 64)) AS frame_md5
        |  FROM (SELECT doc_id AS media_id, text,
        |          unnest(range(0, (length(text) - 1) // 64 + 1)) AS frame_id
        |        FROM documents))
        |SELECT frame_md5, count(*) AS n_copies,
        |  count(DISTINCT media_id) AS n_media,
        |  CAST(min(media_id * 4294967296 + frame_id) AS BIGINT) AS keeper_key
        |FROM f GROUP BY frame_md5 HAVING count(*) > 1""".stripMargin)
}
