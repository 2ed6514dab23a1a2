package org.apache.spark.scheduler

/** Compile-checked bridge to one `private[spark]` field.
  *
  * `StageInfo.shuffleDepId` (the id of the shuffle dependency a stage
  * WRITES, i.e. "this is a shuffle map stage") is the dependency-level
  * signal graft's progress listener needs to classify map-side vs
  * reduce-side stages without the brittle RDD-name heuristic. It is
  * `private[spark]`, so this single accessor lives in the spark package;
  * being compile-checked it fails loudly on a Spark upgrade instead of
  * silently misclassifying (which string matching would).
  */
object GraftSchedulerAccess {
  def writesShuffle(info: StageInfo): Boolean = info.shuffleDepId.isDefined
}
