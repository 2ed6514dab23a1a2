package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current use: rsd
  * sweep for q34's approx_count_distinct cost shape at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.fanOut(Tables.lineitem(spark, sfDir), col("l_orderkey"))
    li.count() // warm the scan
    for (pass <- 1 to 2; rsd <- Seq(0.05, 0.02, 0.015, 0.01)) {
      time(s"pass$pass approx rsd=$rsd") {
        li.groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey"), rsd).as("a"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    for (pass <- 1 to 2) {
      time(s"pass$pass exact countDistinct") {
        li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("e"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"pass$pass both (registered q34 shape, rsd=0.015)") {
        li.groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey"), 0.015).as("a"),
            countDistinct(col("l_partkey")).as("e"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
