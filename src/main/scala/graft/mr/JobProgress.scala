package graft.mr

import org.apache.spark.Success
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** The reference's 4-stage progress machine
  * (`MapReduceFramework.h:8-13`: UNDEFINED → MAP → SHUFFLE → REDUCE with a
  * percentage), reproduced over Spark's listener bus.
  */
object JobStage extends Enumeration {
  val Undefined, Map, Shuffle, Reduce = Value
}

/** Mirror of `JobState { stage_t stage; float percentage; }`
  * (`MapReduceFramework.h:10-13`).
  */
final case class JobState(stage: JobStage.Value, percentage: Float)

/** SparkListener adapter: stages that only produce shuffle output ↔ MAP
  * (`MapReduceFramework.cpp:155-158`), the moment a shuffle-reading stage
  * is submitted ↔ SHUFFLE (`cpp:100-133` runs between map completion and
  * the first reduce call), shuffle-reading stages' task completion ↔
  * REDUCE (`cpp:139-142`). Percentage is successfully-completed/total
  * tasks of the phase — the same monotone contract as the reference's
  * per-row counters (`cpp:85,187`) at task granularity, clamped
  * non-decreasing (AQE may schedule several physical stages per phase)
  * and to [0, 100] (task retries would otherwise overshoot).
  *
  * When `jobGroup` is set, only jobs submitted under that Spark job group
  * are observed — [[MapReduce.submit]] tags each handle's job with a
  * unique group so concurrent jobs (or unrelated session activity) cannot
  * corrupt one another's state machine. With `jobGroup = None` the
  * listener observes everything on the session: single-job usage only.
  */
final class JobProgressListener(jobGroup: Option[String] = None) extends SparkListener {
  @volatile private var current: JobState = JobState(JobStage.Undefined, 0f)
  private val stageTasks = scala.collection.mutable.Map.empty[Int, (Int, Int)] // id -> (done, total)
  private val stageReduceSide = scala.collection.mutable.Map.empty[Int, Boolean]
  private val trackedStages = scala.collection.mutable.Set.empty[Int]

  def state: JobState = current

  /** Never step the machine backwards: stage strictly advances, and the
    * percentage within a stage is clamped non-decreasing and to <= 100.
    */
  private def advance(stage: JobStage.Value, pct0: Float): Unit = {
    val pct = math.min(pct0, 100f)
    if (stage.id > current.stage.id) current = JobState(stage, pct)
    else if (stage.id == current.stage.id && pct > current.percentage)
      current = JobState(stage, pct)
  }

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    val group = Option(e.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    if (jobGroup.isEmpty || jobGroup == group) trackedStages ++= e.stageIds
  }

  private def tracked(stageId: Int): Boolean =
    jobGroup.isEmpty || trackedStages.contains(stageId)

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
    val info = e.stageInfo
    if (!tracked(info.stageId)) return
    // A stage whose RDD chain reads a shuffle is reduce-side; a stage
    // that only produces shuffle output (or scans the source) is map-side.
    val reduceSide = info.rddInfos.exists(_.name.toLowerCase.contains("shuffle"))
    stageTasks(info.stageId) = (0, math.max(info.numTasks, 1))
    stageReduceSide(info.stageId) = reduceSide
    if (reduceSide) advance(JobStage.Shuffle, 100f)
    else advance(JobStage.Map, 0f)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    if (e.reason != Success) return // failed/killed attempts are not progress
    stageTasks.get(e.stageId).foreach { case (done, total) =>
      val d = done + 1
      stageTasks(e.stageId) = (d, total)
      val pct = 100f * d / total
      if (stageReduceSide.getOrElse(e.stageId, false)) advance(JobStage.Reduce, pct)
      else advance(JobStage.Map, pct)
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    if (stageReduceSide.getOrElse(e.stageInfo.stageId, false))
      advance(JobStage.Reduce, 100f)
  }
}

object JobProgress {
  /** Attach a fresh listener to the session's bus; poll `state` while an
    * action runs; `detach` when done. Pass `jobGroup` to scope it to one
    * job group (see [[MapReduce.submit]]).
    */
  def attach(spark: SparkSession, jobGroup: Option[String] = None): JobProgressListener = {
    val l = new JobProgressListener(jobGroup)
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: JobProgressListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
