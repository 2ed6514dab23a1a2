package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    * one orderable key. Only duplicated frames surface, so the output
    * is duplicate-sized, not corpus-sized.
    */
  def frameDedup: Q = (s, d) =>
    frameSample(s, d)
      .groupBy("frame_md5")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct("media_id").as("n_media"),
        min(col("media_id") * 100000L + col("frame_id")).as("keeper_key"))
      .where(col("n_copies") > 1)

  val queries: Map[String, Q] = Map(
    "q47_blob_meta" -> blobMeta,
    "q48_frame_sample" -> frameSample,
    "q148_frame_dedup" -> frameDedup)

  val oracles: Map[String, String] = Map(
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
        |  CAST(min(media_id * 100000 + frame_id) AS BIGINT) AS keeper_key
        |FROM f GROUP BY frame_md5 HAVING count(*) > 1""".stripMargin)
}
