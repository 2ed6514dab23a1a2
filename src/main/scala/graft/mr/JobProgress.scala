package graft.mr

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
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
  * REDUCE (`cpp:139-142`). Percentage is completed/total tasks of the
  * phase — the same monotone contract as the reference's per-row counters
  * (`cpp:85,187`) at task granularity, clamped non-decreasing because AQE
  * may schedule several physical stages per phase.
  *
  * Usage mirrors `startMapReduceJob`/`getJobState`/`waitForJob`
  * (`MapReduceFramework.h:18-24`): attach, run the blocking action
  * (Spark's `waitForJob` is implicit), poll `state` from any thread,
  * then `detach`.
  */
final class JobProgressListener extends SparkListener {
  @volatile private var current: JobState = JobState(JobStage.Undefined, 0f)
  private val stageTasks = scala.collection.mutable.Map.empty[Int, (Int, Int)] // id -> (done, total)
  private val stageReduceSide = scala.collection.mutable.Map.empty[Int, Boolean]

  def state: JobState = current

  /** Never step the machine backwards: stage strictly advances, and the
    * percentage within a stage is clamped non-decreasing.
    */
  private def advance(stage: JobStage.Value, pct: Float): Unit = {
    if (stage.id > current.stage.id) current = JobState(stage, pct)
    else if (stage.id == current.stage.id && pct > current.percentage)
      current = JobState(stage, pct)
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
    val info = e.stageInfo
    // A stage whose RDD chain reads a shuffle is reduce-side; a stage
    // that only produces shuffle output (or scans the source) is map-side.
    val reduceSide = info.rddInfos.exists(_.name.toLowerCase.contains("shuffle"))
    stageTasks(info.stageId) = (0, math.max(info.numTasks, 1))
    stageReduceSide(info.stageId) = reduceSide
    if (reduceSide) advance(JobStage.Shuffle, 100f)
    else advance(JobStage.Map, 0f)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
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
    * action runs; `detach` when done.
    */
  def attach(spark: SparkSession): JobProgressListener = {
    val l = new JobProgressListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: JobProgressListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
