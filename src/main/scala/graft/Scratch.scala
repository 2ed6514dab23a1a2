package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use:
  * A/B q05 shapes: projected 3-way join vs pre-aggregated lineitem.
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
    def dval(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

    for (pass <- 1 to 4) {
      time(s"p$pass preagg") {
        val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
        val o = Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey")
        val l = Tables.fanOut(Tables.lineitem(spark, sfDir), col("l_orderkey"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val lAgg = l.groupBy("l_orderkey")
          .agg(sum(dval(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("rev"), count(lit(1)).as("cnt"))
        noop(c.join(o, col("c_custkey") === col("o_custkey"))
          .join(lAgg, col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_mktsegment")
          .agg(sum("rev").as("revenue"), sum("cnt").as("n_items")))
      }
      time(s"p$pass current") {
        noop(SparkEntry.queries("q05_join_segment_revenue")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
