package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * The driver (Verify/Bench) builds its own session; this one is for tests
  * and ad-hoc use. Defaults chosen for the 100 TB design point, scaled to
  * local mode: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), modest shuffle partitions for local[N].
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", s"${Tables.scratchDir}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchDir}/warehouse")
      // events.parquet stores TIMESTAMP(NANOS); Spark reads it as long
      // nanos-since-epoch under this flag (converted in Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(): SparkSession = builder().getOrCreate()
}
