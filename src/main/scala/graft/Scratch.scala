package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * A/B the bucketed-orientation triangle count (q125 candidate).
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

    import graft.ops.GraphQueries
    val und = spark.table(GraphQueries.ensurePagerankEdges(spark, sfDir))
      .select(col("src"), col("dst"), col("odeg"))
    for (pass <- 1 to 4) {
      // V2: no checkpoint — three map-side passes over the bucketed scan
      time(s"p$pass V2 bucketed-nockpt") {
        val deg = und.groupBy(col("src").as("n")).agg(max("odeg").as("d"))
        val oriented = und
          .join(broadcast(deg.select(col("n").as("dst"), col("d").as("ddeg"))), "dst")
          .where(col("odeg") < col("ddeg") ||
            (col("odeg") === col("ddeg") && col("src") < col("dst")))
          .select("src", "dst")
        val adj = oriented.groupBy("src").agg(collect_list("dst").as("nbrs"))
        noop(oriented
          .join(broadcast(adj.select(col("src").as("au"), col("nbrs").as("nu"))),
            col("src") === col("au"))
          .join(broadcast(adj.select(col("src").as("av"), col("nbrs").as("nv"))),
            col("dst") === col("av"))
          .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
          .agg(sum("t").cast("long").as("n_triangles")))
      }
      // V1: checkpoint oriented once
      time(s"p$pass V1 bucketed-ckpt") {
        val deg = und.groupBy(col("src").as("n")).agg(max("odeg").as("d"))
        val oriented = und
          .join(broadcast(deg.select(col("n").as("dst"), col("d").as("ddeg"))), "dst")
          .where(col("odeg") < col("ddeg") ||
            (col("odeg") === col("ddeg") && col("src") < col("dst")))
          .select("src", "dst")
          .localCheckpoint(true)
        val adj = oriented.groupBy("src").agg(collect_list("dst").as("nbrs"))
        noop(oriented
          .join(broadcast(adj.select(col("src").as("au"), col("nbrs").as("nu"))),
            col("src") === col("au"))
          .join(broadcast(adj.select(col("src").as("av"), col("nbrs").as("nv"))),
            col("dst") === col("av"))
          .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
          .agg(sum("t").cast("long").as("n_triangles")))
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
    }
    // sanity: value must equal the registered q125
    val deg = und.groupBy(col("src").as("n")).agg(max("odeg").as("d"))
    val oriented = und
      .join(broadcast(deg.select(col("n").as("dst"), col("d").as("ddeg"))), "dst")
      .where(col("odeg") < col("ddeg") ||
        (col("odeg") === col("ddeg") && col("src") < col("dst")))
      .select("src", "dst")
    val adj = oriented.groupBy("src").agg(collect_list("dst").as("nbrs"))
    val got = oriented
      .join(broadcast(adj.select(col("src").as("au"), col("nbrs").as("nu"))),
        col("src") === col("au"))
      .join(broadcast(adj.select(col("src").as("av"), col("nbrs").as("nv"))),
        col("dst") === col("av"))
      .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
      .agg(sum("t").cast("long").as("n_triangles")).head().getLong(0)
    val want = GraphQueries.triangles(spark, sfDir).head().getLong(0)
    println(s"SCRATCH q125 got=$got want=$want match=${got == want}")
    spark.stop()
  }
}
