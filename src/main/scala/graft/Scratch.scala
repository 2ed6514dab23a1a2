package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * decompose the shared shingle-store probe (q291 family) cost at
  * sf0.1 — which stage pays: batch shingling, store resolve, the
  * h-join + orientation distinct, or the sizes joins.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"${Tables.scratchDir}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchDir}/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val table = streaming.Streams.ensureShingleStreamIndex(spark, sfDir)
    import graft.store.ManifestStore.manifestSnapshot
    def store = manifestSnapshot(spark, table).get
    def batchSh = graft.dedup.DedupQueries
      .shingles(Tables.documents(spark, sfDir)
        .where(col("doc_id") % 3 === 0))
      .select(col("doc_id").as("nid"), xxhash64(col("s")).as("h"))

    for (pass <- 1 to 3) {
      time(s"p$pass A batchSh only")(noop(batchSh))
      time(s"p$pass B store resolve only")(noop(store))
      time(s"p$pass C join+distinct+agg") {
        val allSh = store.select(col("doc_id").as("oid"), col("h"))
        noop(batchSh.join(allSh, Seq("h"))
          .where(col("nid") =!= col("oid"))
          .select(least(col("nid"), col("oid")).as("a_id"),
            greatest(col("nid"), col("oid")).as("b_id"), col("h"))
          .distinct()
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("c")))
      }
      time(s"p$pass C2 join+orientfilter+agg") {
        val allSh = store.select(col("doc_id").as("oid"), col("h"))
        noop(batchSh.join(allSh, Seq("h"))
          .where(col("nid") =!= col("oid") &&
            (col("oid") % 3 =!= 0 || col("nid") < col("oid")))
          .select(least(col("nid"), col("oid")).as("a_id"),
            greatest(col("nid"), col("oid")).as("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("c")))
      }
      time(s"p$pass D full probe") {
        noop(streaming.Streams.shingleStoreProbe(spark, sfDir, store))
      }
    }
    spark.stop()
  }
}
