package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: measure an ANN query's recall against its brute reference
  * at a given sf — the pre-registration 3-sf accuracy check every
  * approximate operator runs before its floor is pinned (the q224
  * zero-margin lesson). Usage: runMain graft.tools.RecallCheck <sfDir>
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"${graft.Tables.scratchDir}/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = args.drop(1).headOption.getOrElse("retrained")
    val (label, brute, got) = which match {
      case "erased_stream" =>
        ("erased_stream_ivf",
          // the brute query side is already the anchored set
          graft.sim.SimQueries.knnBruteSurviving(spark, sfDir),
          graft.streaming.Streams.erasedStreamIvfProbe(spark, sfDir))
      case _ =>
        ("retrained_ivf",
          graft.sim.SimQueries.queries("q45_knn_brute")(spark, sfDir),
          graft.sim.SimQueries.retrainedIvf(spark, sfDir))
    }
    val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(b.nonEmpty,
      s"empty brute reference for $label at $sfDir — wrong sfDir or a " +
        "corpus too thin to anchor any query; refusing a NaN recall")
    val g = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = b.count(g.contains)
    println(f"RECALL $label sf=$sfDir pairs=${b.size} hit=$hit " +
      f"recall=${hit.toDouble / b.size}%.4f margin_pairs_over_075=" +
      f"${hit - math.ceil(b.size * 0.75).toInt} margin_pairs_over_080=" +
      f"${hit - math.ceil(b.size * 0.80).toInt}")
    spark.stop()
  }
}
