package graft
import org.apache.spark.sql.SparkSession

/** Perf-iteration tool: time (3 noop-sink runs) and optionally explain
  * the queries named on the command line at SPARK_GRAFT_SF_DIR —
  * single-query drill-down companion to the suite-level [[Bench]] and
  * the plan-dump [[Explain]].
  *
  * `SPARK_GRAFT_EXPLAIN=1` prints each query's formatted physical plan
  * before timing it.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"${Tables.scratchDir}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchDir}/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
