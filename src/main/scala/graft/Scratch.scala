package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * inspect the per-round k-core plan over the bucketed doubled-edge
  * table — is the degree aggregate exchange-free after the broadcast
  * anti-joins?
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
    import graft.ops.GraphQueries
    val und = spark.table(GraphQueries.ensurePagerankEdges(spark, sfDir))
      .select(col("src"), col("dst"))
    val deg0 = und.groupBy(col("src").as("x")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val removed = deg0.where(col("c") < 92).select(col("x"))
    val surv = und
      .join(removed.select(col("x").as("src")), Seq("src"), "left_anti")
      .join(removed.select(col("x").as("dst")), Seq("dst"), "left_anti")
      .groupBy(col("src").as("x")).agg(count(lit(1)).as("c"))
    println("=== round plan ===")
    println(surv.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(4000))
    spark.stop()
  }
}
