package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * A/B a bucketed hpostings table vs the plain 32-file parquet for the
  * q214 incremental probe's h-join.
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

    val idx = graft.dedup.DedupQueries.ensureShingleIndex(spark, sfDir)
    val tbl = "graft_scratch_hpostings_b"
    if (!spark.catalog.tableExists(tbl)) {
      spark.read.parquet(s"$idx/hpostings")
        .write.bucketBy(32, "h").sortBy("h")
        .mode("overwrite").format("parquet").saveAsTable(tbl)
    }
    def batch = graft.dedup.DedupQueries.shingles(
        Tables.documents(spark, sfDir).where(col("doc_id") % 3 === 0))
      .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h"))
    def probe(all: org.apache.spark.sql.DataFrame) =
      graft.dedup.DedupQueries.ingestProbePairs(batch,
        all.select(col("doc_id").as("oid"), col("h")),
        spark.read.parquet(s"$idx/sizes"), storeCoversBatch = true)
    for (pass <- 1 to 4) {
      time(s"p$pass plain")(noop(probe(spark.read.parquet(s"$idx/hpostings"))))
      time(s"p$pass bucketed")(noop(probe(spark.table(tbl))))
    }
    val a = probe(spark.read.parquet(s"$idx/hpostings")).collect().map(_.toString).sorted.toSeq
    val b = probe(spark.table(tbl)).collect().map(_.toString).sorted.toSeq
    println(s"SCRATCH equal=${a == b} n=${a.size}")
    spark.stop()
  }
}
