package graft
import org.apache.spark.sql.SparkSession

/** Single-query profiler: bench-regime timing (noop sink, N passes, min)
  * for the named registered queries — the per-query loupe next to
  * [[Bench]]'s full-suite camera. Usage:
  * `runMain graft.TimeQ <sfDir> <passes> <name> [<name>...]`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"${Tables.scratchDir}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchDir}/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // time what Bench times: the production bench form where one is
    // registered, the exact-baseline fallback otherwise
    val picked = names.map(n =>
      n -> SparkEntry.benchQueries.getOrElse(n, SparkEntry.queries(n)))
    val times = (1 to passes).map { _ =>
      picked.map { case (_, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(false))
        t
      }
    }
    picked.zipWithIndex.foreach { case ((n, _), i) =>
      val ts = times.map(_(i))
      println(f"TIMEQ $n min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
