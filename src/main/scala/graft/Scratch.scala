package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * A/B carried-sizes vs sizes-distinct on every delete/overlay store
  * (q318, q293, q310, q334, q291, q295 controls).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", s"${Tables.scratchDir}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchDir}/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.store.ManifestStore.manifestSnapshot
    import graft.dedup.DedupQueries.{ingestProbePairs, ingestProbePairsCarried, survivingBatchShingles}

    // q318 delete-file commit store; q293 erased overlay; q310 erasure-folded; q334 partial compaction
    val t318 = store.StoreQueries.ensureDeleteFileShingleStreamIndex(spark, sfDir)
    val t291 = streaming.Streams.ensureShingleStreamIndex(spark, sfDir)
    def sSh = survivingBatchShingles(spark, sfDir)
    val tomb = broadcast(graft.dedup.DedupQueries.erasureTombstones(spark, sfDir))

    for (pass <- 1 to 3) {
      val s318 = manifestSnapshot(spark, t318).get
      time(s"p$pass q318 OLD")(
        noop(ingestProbePairs(sSh,
          s318.select(col("doc_id").as("oid"), col("h")),
          s318.select(col("doc_id"), col("n")).distinct(),
          storeCoversBatch = true)))
      time(s"p$pass q318 NEW")(
        noop(ingestProbePairsCarried(sSh,
          s318.select(col("doc_id").as("oid"), col("h"), col("n")))))
      val s291 = manifestSnapshot(spark, t291).get
      val surv = s291.join(tomb, Seq("doc_id"), "left_anti")
      time(s"p$pass q293 OLD")(
        noop(ingestProbePairs(sSh,
          surv.select(col("doc_id").as("oid"), col("h")),
          surv.select(col("doc_id"), col("n")).distinct(),
          storeCoversBatch = true)))
      time(s"p$pass q293 NEW")(
        noop(ingestProbePairsCarried(sSh,
          surv.select(col("doc_id").as("oid"), col("h"), col("n")))))
    }
    val s318 = manifestSnapshot(spark, t318).get
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    println("SCRATCH eq318=" + (rows(ingestProbePairs(sSh,
      s318.select(col("doc_id").as("oid"), col("h")),
      s318.select(col("doc_id"), col("n")).distinct(), storeCoversBatch = true)) ==
      rows(ingestProbePairsCarried(sSh,
        s318.select(col("doc_id").as("oid"), col("h"), col("n"))))))
    spark.stop()
  }
}
