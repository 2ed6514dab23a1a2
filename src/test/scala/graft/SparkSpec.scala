package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite fast).
  */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"

  /** Run `body` with ONLY the given graft optimizer rule enabled:
    * snapshots every opt-in rule conf, disables the rest, restores
    * after. Rules are session-global and queries may leave them on
    * (q240), so a spec pinning one rule's plan shape must hold the
    * others off — centrally, not by hand-listing keys.
    */
  def withOnlyGraftRule[A](key: Option[String])(body: => A): A = {
    import graft.plans.GraftRules
    val prev = GraftRules.BooleanKeys.map(k => k -> spark.conf.getOption(k))
    GraftRules.BooleanKeys.foreach(k => spark.conf.set(k, key.contains(k).toString))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
