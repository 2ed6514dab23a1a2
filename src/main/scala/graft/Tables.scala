package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All queries go through these so that source handling (column pruning,
  * pushdown, the events nanos-timestamp quirk) is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fast local scratch space for derived table copies, stream sinks,
    * and Spark local (shuffle/spill) dirs: tmpfs when the host has one,
    * `java.io.tmpdir` otherwise. On this single-node testbed the virtio
    * disk is the bottleneck — its write stalls showed up as multi-second
    * windows across otherwise CPU-bound bench queries. A real cluster
    * points `spark.local.dir` at executor-local NVMe; this is the same
    * decision scaled to the test host.
    */
  lazy val scratchDir: String = {
    val base =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft"
      else System.getProperty("java.io.tmpdir")
    new java.io.File(base).mkdirs()
    base
  }

  /** Cache key for derived artifacts (bucketed/partitioned copies, the
    * shingle index, the edge list): fingerprints the source parquet's
    * identity AND content (path + per-file length + mtime), so a corpus
    * REGENERATION at the same path — which the driver does between
    * rounds — invalidates every derived copy instead of silently
    * serving stale data. A real lakehouse gets this from table-format
    * snapshot ids; file length+mtime is the local-filesystem stand-in.
    */
  def datasetTag(d: String, tables: String*): String = {
    val sig = tables.sorted.map { t =>
      val f = new java.io.File(s"$d/$t.parquet")
      s"$t:${f.length}:${f.lastModified}"
    }.mkString(s"$d|", "|", "")
    // 64-bit md5 prefix, hex — identifier-safe (saveAsTable suffixes)
    // and collision-proof where a 32-bit String.hashCode would
    // eventually alias two fingerprints onto one cache key (serving a
    // stale artifact is the exact failure this tag exists to prevent)
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  /** The shared shape of every single-directory derived artifact
    * (verified pair sets, keyframes, staged projections): build and
    * write `build` under `path` iff the parquet commit's own _SUCCESS
    * marker is absent, serialized on the caller's `lock`. The caller
    * chooses a content-fingerprinted path ([[datasetTag]]) so corpus
    * regeneration self-invalidates, and pins the layout with its own
    * `repartition` so the building JVM's parallelism never caps later
    * scans. One definition of the _SUCCESS/overwrite/idempotence
    * contract instead of a copy per call site.
    */
  def ensureParquetArtifact(lock: AnyRef, path: String)
      (build: => org.apache.spark.sql.DataFrame): String = lock.synchronized {
    if (!new java.io.File(path, "_SUCCESS").exists())
      build.write.mode("overwrite").parquet(path)
    path
  }

  /** Recursive delete for the scratch temp dirs the replay-style
    * queries create per run (shared by Scale/ExtraQueries/Streams).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Write `content` as `root/name` via temp-file + ATOMIC_MOVE — the
    * ONE pointer/manifest commit primitive every store shares (the
    * versioned CURRENT, the manifest CURRENT and manifest files, the
    * retrain pointer): a crash leaves either the old file or the new
    * one, never a torn write, and a crash-safety change (e.g. fsyncing
    * the parent dir on a real deployment) lands in one place.
    */
  private[graft] def atomicWrite(root: java.nio.file.Path, name: String,
      content: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val tmp = Files.createTempFile(root, s".$name", ".tmp")
    try {
      Files.write(tmp, content.getBytes("UTF-8"))
      Files.move(tmp, root.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
    } catch {
      // disk-full or a refused move must not strand the temp in the
      // store dir (every store shares this primitive, so every store
      // would share the leak)
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
  }

  /** Fan a narrow scan out to the cluster's task width when the file
    * layout cannot: a source of few unsplittable files (the test corpora
    * are single one-row-group parquet files) starts every scan at
    * parallelism ~1 no matter what `maxPartitionBytes` says, serializing
    * whatever heavy operator sits on top. One cheap hash exchange on
    * `key` buys that operator the whole cluster. At production scale —
    * thousands of splittable files — the source is already at least as
    * wide as `defaultParallelism` and this is a no-op by construction,
    * so the helper is safe to leave in 100 TB plans. The explicit
    * partition count keeps AQE from coalescing the small exchange back
    * into one partition.
    *
    * Use it under compute-dominated operators (wide aggregates, sorts,
    * per-row heavy functions); a scan-bound filter/projection gains
    * nothing and should stay exchange-free.
    */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= n) df else df.repartition(n, key)
  }

  /** `events.ts` has shipped in two parquet layouts across corpus
    * generations: TIMESTAMP(NANOS) — which Spark only reads under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, as a nanos-since-epoch
    * long — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
    * reads natively as TIMESTAMP_NTZ. Normalize either to a session-zone
    * `TimestampType` column: the session runs UTC, so the NTZ wall clock
    * and the instant coincide (matching DuckDB's naive-timestamp
    * `epoch_us`), and every downstream `unix_micros`/window/watermark
    * sees one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: double `/` loses precision on epoch-nanos
        // magnitudes (1.7e18 exceeds double's 53-bit mantissa)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
